"""Shim: ``python -m bitnet_tpu.server`` / CLI ``serve`` entry point."""

from .serve.server import serve

if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", "-m", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--kv-cache-dtype", default="bf16")
    ap.add_argument("--kernel-path", default="auto")
    ap.add_argument("--num-slots", type=int, default=4)
    a = ap.parse_args()
    serve(a.model, a.host, a.port, a.max_seq_len, a.kv_cache_dtype,
          a.kernel_path, a.num_slots)
