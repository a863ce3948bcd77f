"""Cross-validation harness: per-token logits vs an independent reference.

Rebuild of the reference's crossval stack (``crossval/src/logits_compare.rs
:55-98`` per-position cosine + first-divergence detection,
``src/cpp_bindings.rs:438`` ``eval_bitnet``, ``baselines.json`` recording,
``xtask crossval-per-token`` driver):

Backends:
- ``golden`` — the independent numpy float implementation
  (verify/reference.py) fed the fixture's float weights.  Always
  available; this is the merge gate in a zero-egress environment.
- ``cpp`` — an external bitnet.cpp/llama.cpp build, located via
  ``BITNET_CPP_DIR`` exactly like the reference (xtask main.rs:3146-3218).
  The binary must support ``--logits-dump`` style per-position output
  (we invoke llama-perplexity/llama-eval-callback compatible flags);
  gated: absent binary → skipped, never silently mocked.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import time

import numpy as np

from ..errors import InferenceError
from .reference import cosine_similarity

COSINE_SIMILARITY_THRESHOLD = 0.99   # logits_compare.rs:24


@dataclasses.dataclass
class CrossvalResult:
    prompt_tokens: list[int]
    cosines: list[float]
    min_cosine: float
    first_divergence: int | None     # first position below threshold
    passed: bool
    backend: str
    elapsed_s: float

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def compare_per_token(ours: np.ndarray, theirs: np.ndarray,
                      threshold: float = COSINE_SIMILARITY_THRESHOLD,
                      backend: str = "golden",
                      tokens: list[int] | None = None,
                      elapsed_s: float = 0.0) -> CrossvalResult:
    """Per-position cosine compare (logits_compare.rs:55-98)."""
    if ours.shape != theirs.shape:
        raise InferenceError(
            f"logit shape mismatch: {ours.shape} vs {theirs.shape}")
    cosines = [cosine_similarity(ours[t], theirs[t])
               for t in range(ours.shape[0])]
    first_div = next((i for i, c in enumerate(cosines) if c < threshold),
                     None)
    return CrossvalResult(
        prompt_tokens=list(tokens or []),
        cosines=[round(c, 6) for c in cosines],
        min_cosine=round(min(cosines), 6),
        first_divergence=first_div,
        passed=first_div is None,
        backend=backend,
        elapsed_s=round(elapsed_s, 3),
    )


def crossval_golden(engine, mini_model, token_ids: list[int],
                    threshold: float = COSINE_SIMILARITY_THRESHOLD
                    ) -> CrossvalResult:
    """Engine vs the independent numpy golden model."""
    from .reference import reference_forward

    t0 = time.time()
    ours = engine.eval_ids(token_ids)                    # [T, V]
    theirs = reference_forward(engine.cfg, mini_model.weights, token_ids)
    return compare_per_token(ours, theirs, threshold, "golden", token_ids,
                             time.time() - t0)


def cpp_reference_available() -> str | None:
    """Locate an external C++ reference build (BITNET_CPP_DIR)."""
    d = os.environ.get("BITNET_CPP_DIR")
    if not d:
        return None
    for name in ("llama-eval-callback", "llama-perplexity", "main"):
        p = os.path.join(d, "bin", name)
        if os.path.exists(p):
            return p
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def eval_cpp_logits(gguf_path: str, token_ids: list[int],
                    n_vocab: int) -> np.ndarray:
    """Per-position logits from the external C++ build.

    Uses llama.cpp's eval-callback tooling to dump logits; raises when the
    binary is missing (strict: no silent mock — honest-compute policy).
    """
    binary = cpp_reference_available()
    if binary is None:
        raise InferenceError(
            "no C++ reference build (set BITNET_CPP_DIR to a bitnet.cpp/"
            "llama.cpp build directory)")
    # llama.cpp eval-callback prints tensor dumps; the exact plumbing is
    # build-specific — run and parse a logits dump file.
    out_file = f"/tmp/crossval_logits_{os.getpid()}.bin"
    cmd = [binary, "-m", gguf_path, "--logits-file", out_file,
           "-p", " ".join(str(t) for t in token_ids)]
    r = subprocess.run(cmd, capture_output=True, timeout=600)
    if r.returncode != 0 or not os.path.exists(out_file):
        raise InferenceError(
            f"C++ reference eval failed: {r.stderr[-500:]!r}")
    raw = np.fromfile(out_file, dtype=np.float32)
    os.unlink(out_file)
    T = len(token_ids)
    if raw.size != T * n_vocab:
        raise InferenceError(
            f"C++ logits dump size {raw.size} != {T}x{n_vocab}")
    return raw.reshape(T, n_vocab)


def crossval_cpp(engine, gguf_path: str, token_ids: list[int],
                 threshold: float = COSINE_SIMILARITY_THRESHOLD
                 ) -> CrossvalResult:
    t0 = time.time()
    ours = engine.eval_ids(token_ids)
    theirs = eval_cpp_logits(gguf_path, token_ids, engine.cfg.vocab_size)
    return compare_per_token(ours, theirs, threshold, "cpp", token_ids,
                             time.time() - t0)


# ---------------------------------------------------------------------------
# baselines.json recording (crossval/baselines.json parity)
# ---------------------------------------------------------------------------
def record_baseline(result: CrossvalResult, path: str,
                    extra: dict | None = None) -> dict:
    entry = {
        "timestamp": time.time(),
        "backend": result.backend,
        "min_cosine": result.min_cosine,
        "passed": result.passed,
        "positions": len(result.cosines),
        **(extra or {}),
    }
    data = {"entries": []}
    if os.path.exists(path):
        try:
            with open(path) as f:
                data = json.load(f)
        except json.JSONDecodeError:
            pass
    data.setdefault("entries", []).append(entry)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    return entry
