# One-command local parity with .github/workflows/ci.yml.
#
# The test groups mirror the reference's CI matrices
# (reference .github/workflows/develop-test.yml): fast (default subset),
# slow (conformance sweeps), f32 (precision budgets), multiprocess
# (2 real processes through the production multi-host entry point).

PY ?= python

.PHONY: ci test test-slow test-f32 test-mp docs bench

test:
	$(PY) -m pytest tests/ -q

test-slow:
	$(PY) -m pytest tests/ -q -m slow

test-f32:
	$(PY) -m pytest tests/test_f32_conformance.py -q -m ''

test-mp:
	$(PY) -m pytest tests/test_multiprocess.py -q -m ''

ci: test test-slow test-f32 test-mp docs

docs:
	$(PY) scripts/gen_api_docs.py --check

bench:
	$(PY) bench.py
