# Developer entry points (reference Makefile parity: test/crossval/bench).

PY ?= python

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_native.py

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

preflight:
	$(PY) -m bitnet_tpu.cli preflight

gate:
	$(PY) -m bitnet_tpu.cli gate --require-native

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

.PHONY: test test-fast bench native preflight gate dryrun clean
