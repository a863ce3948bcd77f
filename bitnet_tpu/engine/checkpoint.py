"""Decode-state checkpoint / resume.

Rebuild of the reference's inference-state checkpointing
(``bitnet-gpu-hal/src/checkpoint_manager.rs:18-297`` — ``InferenceState``
with KV entries, diffs, file storage) in the orbax spirit the SURVEY
prescribes (§5 "Checkpoint / resume"): a checkpoint is a host snapshot of
(tokens, KV cache, RNG key, stop/sampler state) written as one ``.npz``
plus a JSON manifest with integrity hashes.  Restoring into a fresh engine
resumes generation deterministically at the exact token boundary —
the TPU answer to preemption (the decode loop re-enters with the same
jitted programs; nothing about the compiled step is checkpoint-aware).

Incremental diffs (``CheckpointDiff``) are cheap here by construction:
the KV cache is append-only, so a diff is just the [prev_len, new_len)
slice; ``save_diff``/``apply_diff`` implement exactly that.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from ..errors import InferenceError

SCHEMA_VERSION = "1.0.0"


@dataclasses.dataclass
class DecodeState:
    """Everything needed to resume a generation mid-stream."""

    prompt_ids: list[int]
    generated_ids: list[int]
    rng_key: np.ndarray | None          # jax PRNG key as uint32[2] (or None)
    kv_len: int
    k: np.ndarray                        # [L, kv_len, KV, D] (slot 0)
    v: np.ndarray
    k_scale: np.ndarray | None = None
    v_scale: np.ndarray | None = None

    @property
    def all_ids(self) -> list[int]:
        return self.prompt_ids + self.generated_ids


def capture(engine, prompt_ids: list[int], generated_ids: list[int],
            rng_key=None) -> DecodeState:
    """Snapshot the engine's slot-0 decode state to host memory."""
    if getattr(engine, "windowed", False):
        from ..errors import InferenceError

        raise InferenceError(
            "checkpoint capture requires the dense cache (a ring buffer "
            "holds only the trailing window of KV rows)")
    kv_len = int(engine.cache.lengths[0])
    ks = vs = None
    if engine.cache.k_scale is not None:
        ks = np.asarray(engine.cache.k_scale[:, 0, :kv_len])
        vs = np.asarray(engine.cache.v_scale[:, 0, :kv_len])
    # checkpoint format is the canonical [L, kv_len, KV, D] regardless
    # of the engine's cache layout (engine/cache.py layout seam)
    from .cache import canonical_rows

    ksnap = canonical_rows(np.asarray(engine.cache.k[:, 0, :kv_len]),
                           engine.cfg, engine.cache)
    vsnap = canonical_rows(np.asarray(engine.cache.v[:, 0, :kv_len]),
                           engine.cfg, engine.cache)
    return DecodeState(
        prompt_ids=list(prompt_ids),
        generated_ids=list(generated_ids),
        rng_key=None if rng_key is None else np.asarray(rng_key),
        kv_len=kv_len,
        k=ksnap,
        v=vsnap,
        k_scale=ks,
        v_scale=vs,
    )


# np.savez silently degrades ml_dtypes arrays (bf16/fp8) to raw void —
# np.load then returns un-castable blobs.  Store them as same-width
# integer VIEWS (bit-exact, digest-invariant: .tobytes() is unchanged)
# and record the true dtype in the manifest for the load-side view-back.
_PACK_VIEW = {"bfloat16": np.uint16,
              "float8_e4m3fn": np.uint8, "float8_e5m2": np.uint8}


def _pack_arrays(arrays: dict) -> tuple[dict, dict]:
    packed, dtypes = {}, {}
    for name, a in arrays.items():
        dn = str(a.dtype)
        if dn in _PACK_VIEW:
            packed[name] = np.ascontiguousarray(a).view(_PACK_VIEW[dn])
            dtypes[name] = dn
        else:
            packed[name] = a
    return packed, dtypes


def _unpack_arrays(arrays: dict, dtypes: dict) -> dict:
    if dtypes:
        import ml_dtypes

        named = {"bfloat16": ml_dtypes.bfloat16,
                 "float8_e4m3fn": ml_dtypes.float8_e4m3fn,
                 "float8_e5m2": ml_dtypes.float8_e5m2}
        for name, dn in dtypes.items():
            if name in arrays:
                arrays[name] = arrays[name].view(named[dn])
    return arrays


def _digest(arrays: dict[str, np.ndarray]) -> str:
    h = hashlib.sha256()
    for name in sorted(arrays):
        a = arrays[name]
        if a is None:
            continue
        h.update(name.encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def save(state: DecodeState, path: str) -> dict:
    """Write ``<path>.npz`` + ``<path>.json`` manifest; returns manifest."""
    arrays = {
        "prompt_ids": np.asarray(state.prompt_ids, np.int32),
        "generated_ids": np.asarray(state.generated_ids, np.int32),
        "k": state.k,
        "v": state.v,
    }
    if state.rng_key is not None:
        arrays["rng_key"] = state.rng_key
    if state.k_scale is not None:
        arrays["k_scale"] = state.k_scale
        arrays["v_scale"] = state.v_scale
    arrays, packed_dtypes = _pack_arrays(arrays)
    np.savez(path + ".npz", **arrays)
    manifest = {
        "schema_version": SCHEMA_VERSION,
        "created_unix": time.time(),
        "kv_len": state.kv_len,
        "prompt_tokens": len(state.prompt_ids),
        "generated_tokens": len(state.generated_ids),
        "sha256": _digest(arrays),
        "kv_shape": list(state.k.shape),
        "kv_dtype": str(state.k.dtype),
        "packed_dtypes": packed_dtypes,
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load(path: str, verify: bool = True) -> DecodeState:
    """Read a checkpoint; integrity-check against the manifest."""
    if not os.path.exists(path + ".npz"):
        raise InferenceError(f"checkpoint not found: {path}.npz")
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    manifest = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
        if verify:
            if manifest.get("schema_version") != SCHEMA_VERSION:
                raise InferenceError(
                    f"checkpoint schema {manifest.get('schema_version')} != "
                    f"{SCHEMA_VERSION}")
            got = _digest(arrays)
            if got != manifest.get("sha256"):
                raise InferenceError(
                    "checkpoint integrity failure: sha256 mismatch")
    arrays = _unpack_arrays(arrays, manifest.get("packed_dtypes", {}))
    return DecodeState(
        prompt_ids=[int(t) for t in arrays["prompt_ids"]],
        generated_ids=[int(t) for t in arrays["generated_ids"]],
        rng_key=arrays.get("rng_key"),
        kv_len=int(arrays["k"].shape[1]),
        k=arrays["k"],
        v=arrays["v"],
        k_scale=arrays.get("k_scale"),
        v_scale=arrays.get("v_scale"),
    )


def restore(engine, state: DecodeState) -> None:
    """Load ``state`` into the engine's slot 0 (cache + lengths)."""
    S = engine.engine_cfg.max_seq_len
    if state.kv_len > S:
        raise InferenceError(
            f"checkpoint kv_len {state.kv_len} > engine max_seq_len {S}")
    exp = (engine.cfg.num_layers, engine.cfg.num_kv_heads,
           engine.cfg.head_dim)
    got = (state.k.shape[0], state.k.shape[2], state.k.shape[3])
    if exp != got:
        raise InferenceError(
            f"checkpoint shape {got} does not match model {exp}")
    from .prefix_cache import PrefixSnapshot

    snap = PrefixSnapshot(
        length=state.kv_len, k=state.k, v=state.v,
        k_scale=state.k_scale, v_scale=state.v_scale)
    from .cache import reset_cache

    engine.cache = reset_cache(engine.cache)
    engine._restore_prefix(snap, state.kv_len)


def resume_generation(engine, state: DecodeState, gen_cfg=None):
    """Continue generating from a checkpoint; returns GenerationResult
    covering only the *newly* generated tokens."""
    restore(engine, state)
    # continue the decode loop from the last generated token
    return engine.generate_from_state(
        state.all_ids, already_generated=len(state.generated_ids),
        gen_cfg=gen_cfg)


# -- incremental diffs -------------------------------------------------------
def save_diff(prev: DecodeState, cur: DecodeState, path: str) -> dict:
    """Write only the KV rows and tokens added since ``prev``."""
    if cur.kv_len < prev.kv_len:
        raise InferenceError("diff target is older than the base")
    if cur.prompt_ids != prev.prompt_ids:
        raise InferenceError("diff across different prompts")
    arrays = {
        "base_len": np.asarray([prev.kv_len], np.int32),
        "new_ids": np.asarray(
            cur.generated_ids[len(prev.generated_ids):], np.int32),
        "k": cur.k[:, prev.kv_len:],
        "v": cur.v[:, prev.kv_len:],
    }
    if cur.k_scale is not None:
        arrays["k_scale"] = cur.k_scale[:, prev.kv_len:]
        arrays["v_scale"] = cur.v_scale[:, prev.kv_len:]
    arrays, packed_dtypes = _pack_arrays(arrays)
    np.savez(path + ".npz", **arrays)
    manifest = {"schema_version": SCHEMA_VERSION, "diff": True,
                "base_len": prev.kv_len, "rows": int(arrays["k"].shape[1]),
                "sha256": _digest(arrays),
                "packed_dtypes": packed_dtypes}
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def apply_diff(base: DecodeState, path: str) -> DecodeState:
    with np.load(path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            arrays = _unpack_arrays(arrays,
                                    json.load(f).get("packed_dtypes", {}))
    base_len = int(arrays["base_len"][0])
    if base_len != base.kv_len:
        raise InferenceError(
            f"diff base_len {base_len} != state kv_len {base.kv_len}")
    k = np.concatenate([base.k, arrays["k"]], axis=1)
    v = np.concatenate([base.v, arrays["v"]], axis=1)
    ks = vs = None
    if base.k_scale is not None and "k_scale" in arrays:
        ks = np.concatenate([base.k_scale, arrays["k_scale"]], axis=1)
        vs = np.concatenate([base.v_scale, arrays["v_scale"]], axis=1)
    return DecodeState(
        prompt_ids=base.prompt_ids,
        generated_ids=base.generated_ids + [int(t) for t in arrays["new_ids"]],
        rng_key=base.rng_key,
        kv_len=k.shape[1],
        k=k, v=v, k_scale=ks, v_scale=vs,
    )
