"""Structured adversarial fuzz loop (`make fuzz`).

The deterministic-pytest corpus (tests/test_fuzz_corpus.py) replays FIXED
seeds; this loop REGENERATES adversarial inputs every run — the round-5
answer to the reference's 63 cargo-fuzz targets + cargo-mutants
(/root/reference/fuzz/fuzz_targets/, mutants.toml:3).

Targets (every public parsing/decoding surface):
  gguf        structure-aware GGUF mutations: bit flips, truncations,
              size-lies (tensor dims / offsets / counts), type confusion
  quant       every block codec (bitnet32, split32, qk256, iq2s, tl1,
              tl2, q8_0, q4_0/1, q5_0/1, q4_k, q6_k) under bit-flip /
              truncate / extend / size-lie payload mutations
  tokenizer   GGUF-vocab + SPM decode of hostile ids/blobs
  template    chat-template render of hostile messages (sandboxed jinja)
  gbnf        grammar compilation of mutated GBNF sources

Contract: every case must either succeed or raise a TYPED error
(bitnet_tpu.errors taxonomy + the narrow value-parsing exceptions).
Any other exception (or a wrong-shape/wrong-dtype "success" from a
codec) is a FINDING: the reproducer is written to the corpus directory
and the run exits nonzero.  The committed corpus
(tests/fuzz_corpus/) is replayed FIRST every run, so past findings are
permanent regression tests.

Usage:
  python tools/fuzz.py [--iterations 200] [--seed N] \
                       [--corpus tests/fuzz_corpus] [--targets a,b,...]
Exit 0 = no findings.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitnet_tpu.errors import BitNetError  # noqa: E402

# exceptions a hostile input may legitimately trigger (same taxonomy as
# tests/test_fuzz_corpus.py OK_ERRORS)
OK_ERRORS = (BitNetError, ValueError, struct.error, UnicodeDecodeError,
             OverflowError, EOFError, KeyError, IndexError, TypeError)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------- mutators
def mutate(rng: np.random.Generator, data: bytes) -> bytes:
    """One structural mutation of a byte payload."""
    buf = bytearray(data)
    kind = rng.integers(0, 5)
    if kind == 0 and buf:                        # bit flips (1-16)
        for _ in range(int(rng.integers(1, 17))):
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= 1 << int(rng.integers(0, 8))
    elif kind == 1 and buf:                      # truncate
        buf = buf[: int(rng.integers(0, len(buf)))]
    elif kind == 2:                              # extend with noise
        buf += rng.integers(0, 256, size=int(rng.integers(1, 257)),
                            dtype=np.uint8).tobytes()
    elif kind == 3 and len(buf) >= 8:            # splice a random window
        i = int(rng.integers(0, len(buf) - 4))
        n = int(rng.integers(1, min(64, len(buf) - i)))
        buf[i:i + n] = rng.integers(0, 256, size=n,
                                    dtype=np.uint8).tobytes()
    elif len(buf) >= 4:                          # 32-bit size-lie
        i = int(rng.integers(0, len(buf) - 3))
        lie = int(rng.choice(np.asarray(
            [0, 1, 2**16, 2**31 - 1, 2**32 - 1, 2**63 % (2**32)])))
        buf[i:i + 4] = struct.pack("<I", lie)
    return bytes(buf)


# ---------------------------------------------------------------- targets
def _fresh_gguf(rng) -> bytes:
    from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf

    quant = ["f32", "qk256", "bitnet32"][int(rng.integers(0, 3))]
    path = f"/tmp/fuzz_base_{os.getpid()}.gguf"
    generate_mini_gguf(path, MiniModelSpec(quant=quant))
    with open(path, "rb") as f:
        return f.read()


def run_gguf(rng, case: bytes) -> None:
    from bitnet_tpu.gguf.reader import GGUFReader

    path = f"/tmp/fuzz_case_{os.getpid()}.gguf"
    with open(path, "wb") as f:
        f.write(case)
    try:
        with GGUFReader(path) as r:
            _ = dict(r.metadata)
            for info in r:
                r.tensor_bytes(info.name)
    except OK_ERRORS:
        pass


def gen_gguf(rng) -> bytes:
    return mutate(rng, _fresh_gguf(rng))


_CODECS = None


def _codecs():
    global _CODECS
    if _CODECS is None:
        from bitnet_tpu import quant as q
        from bitnet_tpu.quant import ggml_classic as gc

        _CODECS = {
            "bitnet32": q.dequantize_bitnet32,
            "qk256": lambda p, n: q.dequantize_qk256(p, n),
            "iq2s": q.dequantize_iq2s,
            "tl1": q.dequantize_tl1,
            "tl2": q.dequantize_tl2,
            "q8_0": gc.dequantize_q8_0,
            "q4_0": gc.dequantize_q4_0,
            "q4_1": gc.dequantize_q4_1,
            "q5_0": gc.dequantize_q5_0,
            "q5_1": gc.dequantize_q5_1,
            "q4_k": gc.dequantize_q4_k,
            "q6_k": gc.dequantize_q6_k,
        }
    return _CODECS


def gen_quant(rng) -> bytes:
    """A (codec, claimed_n, payload) case, serialized."""
    names = sorted(_codecs())
    name = names[int(rng.integers(0, len(names)))]
    n = int(rng.choice(np.asarray([0, 1, 31, 32, 64, 255, 256, 512, 4096])))
    size = int(rng.integers(0, 4 * max(n, 64)))
    payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
    head = json.dumps({"codec": name, "n": n}).encode() + b"\n"
    return head + payload


def run_quant(rng, case: bytes) -> None:
    head, _, payload = case.partition(b"\n")
    meta = json.loads(head)
    fn = _codecs()[meta["codec"]]
    n = meta["n"]
    try:
        out = fn(np.frombuffer(payload, np.uint8), n)
        # a "successful" decode of hostile bytes must still honor the
        # output contract — wrong shapes are silent mis-decodes
        assert out.shape == (n,), (
            f"{meta['codec']}: shape {out.shape} != ({n},)")
        assert out.dtype in (np.float32, np.float16), out.dtype
    except OK_ERRORS:
        pass


def gen_tokenizer(rng) -> bytes:
    ids = rng.integers(-2**31, 2**31 - 1, size=int(rng.integers(0, 64)),
                       dtype=np.int64).astype(np.int32)
    return ids.tobytes()


def run_tokenizer(rng, case: bytes) -> None:
    from bitnet_tpu.tokenizer import load_tokenizer

    global _FUZZ_TOK
    try:
        tok = _FUZZ_TOK
    except NameError:
        base = f"/tmp/fuzz_tok_{os.getpid()}.gguf"
        from bitnet_tpu.gguf.fixtures import MiniModelSpec, generate_mini_gguf
        generate_mini_gguf(base, MiniModelSpec(quant="f32"))
        tok = _FUZZ_TOK = load_tokenizer(base)
    ids = np.frombuffer(case, np.int32).tolist()
    try:
        tok.decode(ids)
        for i in ids[:8]:
            tok.token_to_piece(int(i))
    except OK_ERRORS:
        pass


def gen_template(rng) -> bytes:
    hostiles = ["{{", "}}", "{%", "%}", "<|im_start|>", "<|eot_id|>",
                "\x00", "\ud800" if False else "\\ud800", "a" * 4096,
                "{{ self.__init__.__globals__ }}", "<s>", "[INST]"]
    msgs = []
    for _ in range(int(rng.integers(1, 5))):
        role = ["user", "assistant", "system",
                "tool"][int(rng.integers(0, 4))]
        content = "".join(
            hostiles[int(rng.integers(0, len(hostiles)))]
            for _ in range(int(rng.integers(1, 4))))
        msgs.append({"role": role, "content": content})
    return json.dumps(msgs).encode()


def run_template(rng, case: bytes) -> None:
    from bitnet_tpu.templates import Message, TemplateType, render_chat

    msgs = [Message(m["role"], m["content"]) for m in json.loads(case)]
    types = list(TemplateType)
    t = types[int(rng.integers(0, len(types)))]
    try:
        render_chat(t, msgs)
    except OK_ERRORS:
        pass


def gen_gbnf(rng) -> bytes:
    base = (b'root ::= item+\nitem ::= "a" | "b" [0-9]* | sub\n'
            b'sub ::= "(" item ")"\n')
    return mutate(rng, base)


def run_gbnf(rng, case: bytes) -> None:
    from bitnet_tpu.grammar import Grammar

    try:
        src = case.decode("utf-8", errors="replace")
        Grammar.from_gbnf(src)
    except OK_ERRORS:
        pass


TARGETS = {
    "gguf": (gen_gguf, run_gguf),
    "quant": (gen_quant, run_quant),
    "tokenizer": (gen_tokenizer, run_tokenizer),
    "template": (gen_template, run_template),
    "gbnf": (gen_gbnf, run_gbnf),
}


# ------------------------------------------------------------------ driver
def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=200,
                    help="fresh cases per target")
    ap.add_argument("--seed", type=int, default=None,
                    help="RNG seed (default: time-based — regeneration)")
    ap.add_argument("--corpus", default=os.path.join(
        REPO, "tests", "fuzz_corpus"))
    ap.add_argument("--targets", default=",".join(sorted(TARGETS)))
    ap.add_argument("--save-corpus", type=int, default=0, metavar="N",
                    help="write N generated cases per target into the "
                         "corpus dir (the committed regression replay "
                         "set) before running")
    args = ap.parse_args()

    seed = args.seed if args.seed is not None else time.time_ns() % 2**31
    print(f"# fuzz seed {seed} (reproduce with --seed {seed})",
          flush=True)
    os.makedirs(args.corpus, exist_ok=True)
    findings = 0
    t0 = time.time()

    for name in args.targets.split(","):
        gen, run = TARGETS[name]
        rng = np.random.default_rng(seed ^ hash(name) % 2**31)

        if args.save_corpus:
            ndir = os.path.join(args.corpus, name)
            os.makedirs(ndir, exist_ok=True)
            crng = np.random.default_rng(
                sum(name.encode()))          # stable corpus, any seed
            n_save = (min(args.save_corpus, 5) if name == "gguf"
                      else args.save_corpus)   # GGUF mutants are ~200 KB
            for i in range(n_save):
                with open(os.path.join(ndir, f"seed_{i:03d}.bin"),
                          "wb") as f:
                    f.write(gen(crng))

        # 1. replay the committed corpus (past findings stay fixed)
        ndir = os.path.join(args.corpus, name)
        replayed = 0
        if os.path.isdir(ndir):
            for fn in sorted(os.listdir(ndir)):
                with open(os.path.join(ndir, fn), "rb") as f:
                    case = f.read()
                try:
                    run(rng, case)
                except Exception:
                    findings += 1
                    print(f"FINDING (corpus replay) {name}/{fn}:",
                          flush=True)
                    traceback.print_exc()
                replayed += 1

        # 2. fresh regenerated cases
        fresh_findings = 0
        for i in range(args.iterations):
            case = gen(rng)
            try:
                run(rng, case)
            except Exception:
                findings += 1
                fresh_findings += 1
                os.makedirs(ndir, exist_ok=True)
                repro = os.path.join(
                    ndir, f"finding_{seed}_{i}.bin")
                with open(repro, "wb") as f:
                    f.write(case)
                print(f"FINDING {name} iter {i} → saved {repro}",
                      flush=True)
                traceback.print_exc()
        print(f"# {name}: {replayed} corpus + {args.iterations} fresh, "
              f"{fresh_findings} findings", flush=True)

    dt = time.time() - t0
    print(json.dumps({"fuzz_findings": findings, "seed": seed,
                      "elapsed_s": round(dt, 1)}), flush=True)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
