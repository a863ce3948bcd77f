"""Chunked-prefill scheduler tests.

The scheduler's ``chunked_prefill=N`` mode (exceeds the reference, which
prefills whole prompts request-at-a-time, ``batch_engine.rs:52``) must be
token-for-token identical to whole-prompt prefill, must interleave decode
steps of active slots between prompt chunks, and must survive
cancellation / checkpointing mid-prefill.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.models import load_model
from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
from bitnet_tpu.tokenizer import load_tokenizer

ECFG = EngineConfig(max_seq_len=128, compute_dtype="f32")

# long enough for several chunks at C=8
LONG_PROMPT = [(7 * i + 3) % 250 for i in range(41)]
SHORT_PROMPT = [1, 7, 20, 3]


@pytest.fixture(scope="module")
def model(mini_gguf_f32):
    cfg, params, _ = load_model(mini_gguf_f32.path, param_dtype=jnp.float32)
    tok = load_tokenizer(mini_gguf_f32.path)
    return cfg, params, tok


def make_sched(model, **kw):
    cfg, params, tok = model
    kw.setdefault("num_slots", 2)
    return ContinuousBatchingScheduler(cfg, params, tok, ECFG, **kw)


def collect(req, timeout=120):
    toks, reason = [], None
    deadline = time.time() + timeout
    while time.time() < deadline:
        tok, text, done, r = req.out.get(timeout=timeout)
        if tok is not None:
            toks.append(tok)
        if done:
            reason = r
            break
    return toks, reason


def run_one(sched, prompt, gen):
    req = sched.submit(list(prompt), gen)
    toks, reason = collect(req)
    return toks, reason


GENS = [
    pytest.param(GenerationConfig(max_new_tokens=6, greedy=True),
                 id="greedy"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  top_k=5, seed=42), id="sampled"),
    pytest.param(GenerationConfig(max_new_tokens=6, temperature=0.8,
                                  repetition_penalty=1.3, seed=9),
                 id="rep-penalty"),
]


@pytest.mark.parametrize("gen", GENS)
def test_dense_parity(model, gen):
    """Chunked C=8 produces the same tokens as whole-prompt prefill."""
    ref = make_sched(model)
    want, wreason = run_one(ref, LONG_PROMPT, gen)
    ref.shutdown()

    chunked = make_sched(model, chunked_prefill=8)
    got, greason = run_one(chunked, LONG_PROMPT, gen)
    assert chunked.stats.get("prefill_chunks", 0) >= 5
    assert chunked.stats.get("chunked_admissions", 0) == 1
    chunked.shutdown()
    assert got == want
    assert greason == wreason


def test_dense_parity_int8_kv(model):
    """Chunk carries thread KV scales (int8 cache) correctly."""
    cfg, params, tok = model
    ecfg = EngineConfig(max_seq_len=128, compute_dtype="f32",
                        kv_cache_dtype="int8")
    gen = GenerationConfig(max_new_tokens=5, greedy=True)
    ref = ContinuousBatchingScheduler(cfg, params, tok, ecfg, num_slots=2)
    want, _ = run_one(ref, LONG_PROMPT, gen)
    ref.shutdown()
    chunked = ContinuousBatchingScheduler(cfg, params, tok, ecfg,
                                          num_slots=2, chunked_prefill=16)
    got, _ = run_one(chunked, LONG_PROMPT, gen)
    chunked.shutdown()
    assert got == want


def test_paged_parity(model):
    """Paged mode: chunks land in the pre-reserved pages."""
    gen = GenerationConfig(max_new_tokens=6, greedy=True)
    ref = make_sched(model, paged=True, page_size=8)
    want, _ = run_one(ref, LONG_PROMPT, gen)
    ref.shutdown()

    chunked = make_sched(model, paged=True, page_size=8,
                         chunked_prefill=8)
    got, _ = run_one(chunked, LONG_PROMPT, gen)
    assert chunked.stats.get("prefill_chunks", 0) >= 5
    chunked.shutdown()
    assert got == want


def test_paged_fork_parity(model):
    """Forked shared-prefix pages + chunked suffix prefill stay exact."""
    gen = GenerationConfig(max_new_tokens=8, greedy=True)
    second = LONG_PROMPT[:24] + [11, 13, 17, 19, 23, 29, 31, 37, 41]

    ref = make_sched(model, paged=True, page_size=8)
    ra = ref.submit(list(LONG_PROMPT), gen)
    rb = ref.submit(list(second), gen)
    want_a, _ = collect(ra)
    want_b, _ = collect(rb)
    ref.shutdown()

    chunked = make_sched(model, paged=True, page_size=8,
                         chunked_prefill=8)
    ca = chunked.submit(list(LONG_PROMPT), gen)
    cb = chunked.submit(list(second), gen)
    got_a, _ = collect(ca)
    got_b, _ = collect(cb)
    chunked.shutdown()
    assert got_a == want_a
    assert got_b == want_b


def test_decode_interleaves_with_chunks(model):
    """An active stream keeps emitting while a long prompt prefills."""
    sched = make_sched(model, chunked_prefill=8, start_loop=False)
    gen = GenerationConfig(max_new_tokens=40, greedy=True)

    ra = sched.submit(SHORT_PROMPT, gen)
    sched._step()                    # admit + prefill A, emit first token
    assert sched.slots[0].active
    base = len(sched.slots[0].out_ids)

    rb = sched.submit(list(LONG_PROMPT), gen)
    interleaved = 0
    for _ in range(8):
        sched._step()
        if sched.slots[1].prefilling:
            # B still prefilling — A must have advanced in the same step
            interleaved += 1
    # C=8 over 41 tokens = 6 chunks at 2 advances/step → ≥2 mid-prefill
    # steps where A was decoding
    assert interleaved >= 2
    assert len(sched.slots[0].out_ids) > base
    # finish both
    for _ in range(60):
        if not any(s.occupied for s in sched.slots):
            break
        sched._step()
    toks_b, _ = collect(rb, timeout=5)
    assert len(toks_b) == 40
    toks_a, _ = collect(ra, timeout=5)
    assert len(toks_a) == 40

    # parity against a plain scheduler for the same long prompt
    ref = make_sched(model)
    want_b, _ = run_one(ref, LONG_PROMPT, gen)
    ref.shutdown()
    sched.shutdown()
    assert toks_b == want_b


def test_cancel_mid_prefill(model):
    sched = make_sched(model, chunked_prefill=8, start_loop=False)
    gen = GenerationConfig(max_new_tokens=4, greedy=True)
    req = sched.submit(list(LONG_PROMPT), gen)
    sched._step()
    assert sched.slots[0].prefilling
    req.cancel()
    sched._step()
    assert not sched.slots[0].occupied
    toks, reason = collect(req, timeout=5)
    assert toks == []
    assert reason == StopReason.CANCELLED
    # the freed slot is reusable
    r2 = sched.submit(SHORT_PROMPT, gen)
    for _ in range(10):
        sched._step()
    toks2, reason2 = collect(r2, timeout=5)
    assert len(toks2) == 4
    sched.shutdown()


def test_checkpoint_requeues_prefilling_and_pending(model, tmp_path):
    """Mid-prefill and still-queued requests survive preemption as
    fresh queue entries (no tokens were emitted for them yet)."""
    gen = GenerationConfig(max_new_tokens=5, greedy=True)
    sched = make_sched(model, num_slots=1, chunked_prefill=8,
                       start_loop=False)
    r_active = sched.submit(SHORT_PROMPT, gen)
    for _ in range(3):
        sched._step()               # A active and decoding
    assert sched.slots[0].active
    r_pending = sched.submit(list(LONG_PROMPT), gen)
    # no further step: r_pending stays queued
    written = sched.checkpoint_requests(str(tmp_path))
    assert any(p.endswith(".pending.json") for p in written)
    sched.shutdown()

    # fresh scheduler resumes both: the active slot continues, the
    # pending prompt re-enters the queue
    res = make_sched(model, num_slots=2, chunked_prefill=8)
    restored = res.resume_requests(str(tmp_path))
    assert len(restored) == 2
    outs = [collect(r, timeout=60) for r in restored]
    res.shutdown()
    # the requeued long prompt decodes exactly like a clean run
    ref = make_sched(model)
    want, _ = run_one(ref, LONG_PROMPT, gen)
    ref.shutdown()
    long_out = next(o for o, _ in outs if len(o) == 5 and o == want)
    assert long_out == want


def test_prefilling_slot_not_reclaimed(model):
    """_admit must not hand a prefilling slot to another request."""
    sched = make_sched(model, num_slots=1, chunked_prefill=8,
                       start_loop=False)
    gen = GenerationConfig(max_new_tokens=2, greedy=True)
    ra = sched.submit(list(LONG_PROMPT), gen)
    sched._step()
    assert sched.slots[0].prefilling
    rb = sched.submit(SHORT_PROMPT, gen)
    sched._step()
    # B waits for the only slot
    assert sched.slots[0].req is ra
    for _ in range(30):
        sched._step()
        if not any(s.occupied for s in sched.slots) \
                and sched.pending.qsize() == 0:
            break
    ta, _ = collect(ra, timeout=5)
    tb, _ = collect(rb, timeout=5)
    assert len(ta) == 2 and len(tb) == 2
    sched.shutdown()


def test_chunk_floor_validated(model):
    with pytest.raises(Exception):
        make_sched(model, chunked_prefill=4)
