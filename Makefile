# Build / test / bench entry points (reference Makefile:61-88 parity).
#
#   make native    - build the C++ host runtime (librdt_native.so)
#   make test      - full hermetic suite on a local 8-device CPU mesh
#   make test_fast - fast tier (excludes @pytest.mark.slow; < 5 min)
#   make test_tpu  - compiled-kernel parity on the real chip
#   make bench     - north-star benchmark (one JSON line)
#   make run_no_args / make help - CLI usage (reference run_no_args)
#   make memcheck  - kernels in Pallas interpret mode (compute-sanitizer analogue)
#   make docs      - full API docs into build/docs (Doxygen analogue)
#   make clean

PY ?= python3

.PHONY: all native test test_fast test_tpu bench run_no_args help memcheck docs clean

all: native test

native:
	$(PY) native/build.py

# -n 2 (pytest-xdist): two worker processes.  Besides the ~2x wall-time win,
# this bounds per-process XLA:CPU compilation count — a single long pytest
# process on this host segfaults inside XLA:CPU compile/load after ~150
# compiled executables (jax targets CPU features the host lacks: see the
# "Machine type used for XLA:CPU compilation doesn't match" warnings); every
# test passes in shorter-lived processes.
test:
	$(PY) -m pytest tests/ -q --ignore=tests/test_tpu_hw.py -n 2

# quick iteration signal: skips the long interpret-mode sweeps and sequence
# tests (marked @pytest.mark.slow) while keeping one representative of every
# kernel/parity family; `make test` remains the full pre-commit gate
test_fast:
	$(PY) -m pytest tests/ -q --ignore=tests/test_tpu_hw.py -m "not slow"

test_tpu:
	RDT_TEST_PLATFORM=tpu $(PY) -m pytest tests/test_tpu_hw.py -q

bench:
	$(PY) bench.py

run_no_args:
	$(PY) -m raymarchdenoisercuda_tpu.cli

help:
	$(PY) -m raymarchdenoisercuda_tpu.cli -h

# interpret-mode kernel checks: the Pallas analogue of compute-sanitizer
# (reference Makefile:67-68); runs the interpret-vs-oracle parity tests
memcheck:
	$(PY) -m pytest tests/test_atrous_pallas.py tests/test_box_pallas.py -q

docs:
	$(PY) tools/gendocs.py --out build/docs

clean:
	rm -rf build __pycache__ .pytest_cache native/librdt_native.so
	find . -name "__pycache__" -type d -prune -exec rm -rf {} \; 2>/dev/null || true
