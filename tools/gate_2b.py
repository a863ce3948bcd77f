"""One-command 2B readiness gate (VERDICT r3 #8) — the rehearsal for the
day real bitnet-b1.58-2B-4T weights arrive.

Pipeline, all through the SHIPPED surfaces (CLI + make), nothing ad hoc:
  1. generate (or reuse) the full-width synthetic 2B GGUF
     (tools/gen_2b_gguf.py — H=2560 F=6912 L=30 20/5 heads 32k vocab);
  2. build the independent C++ golden if missing (make -C native);
  3. `cli run` on the GGUF: load → greedy generate → honest-compute
     receipt (validated strictly);
  4. `cli crossval --backend cppref`: per-position logits cosine + ppl
     parity vs the from-scratch C++ forward
     (reference: crossval/src/logits_compare.rs:55-98);
  5. `cli crossval --backend golden`: same vs the numpy golden.

Emits ONE JSON verdict line and exits nonzero on any failed check.
Target: < 10 min end to end (GGUF generation dominates the first run;
later runs reuse the file).

Usage: python tools/gate_2b.py [--gguf PATH] [--kind qk256|bitnet32]
   or: make gate-2b
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable


def run(cmd: list[str], timeout: int = 600) -> tuple[int, str]:
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return 124, f"timeout after {timeout}s: {' '.join(cmd)}"
    return p.returncode, p.stdout + p.stderr


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gguf", default="/tmp/bitnet2b_gate.gguf")
    ap.add_argument("--kind", default="qk256",
                    choices=["qk256", "bitnet32"])
    ap.add_argument("--tokens", default="2,7,11,5",
                    help="comma token ids for the crossval positions")
    ap.add_argument("--max-new", type=int, default=12)
    ap.add_argument("--with-golden", action="store_true",
                    help="also run the numpy-golden leg (slow at full "
                         "2B width — the C++ bitnet_golden leg is the "
                         "gate; this is a second, redundant check)")
    args = ap.parse_args()

    t0 = time.time()
    checks: dict[str, bool] = {}
    extra: dict = {}

    # 1. model file
    if not os.path.exists(args.gguf):
        rc, out = run([PY, "tools/gen_2b_gguf.py", args.kind, args.gguf],
                      timeout=900)
        checks["gguf_generated"] = rc == 0
        if rc != 0:
            extra["gen_error"] = out[-800:]
    else:
        checks["gguf_generated"] = True

    # 2. native golden binary
    golden = os.path.join(REPO, "native", "build", "bitnet_golden")
    if not os.path.exists(golden):
        rc, out = run(["make", "-C", "native", "build/bitnet_golden"],
                      timeout=600)
        checks["golden_built"] = rc == 0 and os.path.exists(golden)
    else:
        checks["golden_built"] = True

    # 3. CLI load → generate → receipt (strict-validated)
    receipt = "/tmp/gate2b_receipt.json"
    if os.path.exists(receipt):
        os.remove(receipt)
    if checks["gguf_generated"]:
        rc, out = run([
            PY, "-m", "bitnet_tpu.cli", "run", "-m", args.gguf,
            "--prompt", "The", "--max-new-tokens", str(args.max_new),
            "--greedy", "--no-stream", "--max-seq-len", "256",
            "--receipt", receipt,
        ], timeout=1200)
        checks["cli_generate"] = rc == 0
        if rc != 0:
            extra["run_error"] = out[-800:]
        rc, out = run([PY, "-m", "bitnet_tpu.cli", "gate",
                       "--receipt", receipt], timeout=300)
        checks["receipt_valid"] = rc == 0
    else:
        checks["cli_generate"] = checks["receipt_valid"] = False

    # 4. per-position cosine + ppl parity vs the independent C++ golden
    if checks.get("golden_built") and checks["gguf_generated"]:
        rc, out = run([
            PY, "-m", "bitnet_tpu.cli", "crossval", "-m", args.gguf,
            "--tokens", args.tokens, "--backend", "cppref",
            "--max-seq-len", "256",
        ], timeout=1200)
        checks["crossval_cppref"] = rc == 0
        try:
            j = json.loads(out[out.index("{"):out.rindex("}") + 1])
            extra["cppref"] = {k: j.get(k) for k in
                               ("min_cosine", "ppl_ours", "ppl_theirs",
                                "ppl_rel_delta")}
        except Exception:
            extra["cppref_raw"] = out[-400:]
    else:
        checks["crossval_cppref"] = False

    # 5. numpy golden leg (independent of the C++ one; opt-in)
    if args.with_golden and checks["gguf_generated"]:
        rc, out = run([
            PY, "-m", "bitnet_tpu.cli", "crossval", "-m", args.gguf,
            "--tokens", args.tokens, "--backend", "golden",
            "--max-seq-len", "256",
        ], timeout=1200)
        checks["crossval_golden"] = rc == 0
        try:
            j = json.loads(out[out.index("{"):out.rindex("}") + 1])
            extra["golden"] = {"min_cosine": j.get("min_cosine")}
        except Exception:
            extra["golden_raw"] = out[-400:]

    verdict = {
        "gate": "2b-readiness",
        "pass": all(checks.values()),
        "checks": checks,
        "elapsed_s": round(time.time() - t0, 1),
        **extra,
    }
    print(json.dumps(verdict))
    return 0 if verdict["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
