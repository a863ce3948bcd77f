# Developer entry points (reference Makefile parity: test/crossval/bench).

PY ?= python

# full suite = merge gate (~30 min: multi-process gloo, 8-device GSPMD)
test:
	$(PY) -m pytest tests/ -q

# inner loop: everything not marked slow (~8 min on a 1-core host;
# use test-par on multi-core machines)
test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# parallel inner loop (pytest-xdist); each worker gets its own jax
# process so the 8-virtual-device CPU configs don't fight over a mesh
test-par:
	$(PY) -m pytest tests/ -q -m "not slow" -n auto

# randomized suite order (order-dependence hunter); seed printed for
# reproduction, override with BITNET_TEST_SHUFFLE=<seed>
test-shuffled:
	BITNET_TEST_SHUFFLE=$${BITNET_TEST_SHUFFLE:-random} $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

preflight:
	$(PY) -m bitnet_tpu.cli preflight

gate:
	$(PY) -m bitnet_tpu.cli gate --require-native

# full-width 2B readiness rehearsal: synthetic 2B GGUF → CLI load →
# generate+receipt → cosine+ppl crossval vs the C++ AND numpy goldens.
# One JSON verdict line; < 10 min (first run generates the GGUF).
gate-2b:
	$(PY) tools/gate_2b.py

# adversarial fuzz loop (regenerates inputs every run — the committed
# corpus in tests/fuzz_corpus replays first; findings are saved there
# and fail the run).  FUZZ_N=1000 for a longer session.
fuzz:
	JAX_PLATFORMS=cpu $(PY) tools/fuzz.py --iterations $${FUZZ_N:-500}

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

.PHONY: test test-fast bench native preflight gate gate-2b fuzz dryrun clean
