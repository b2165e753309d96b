# Developer gates, mirroring the reference's Makefile (reference Makefile:8-20)

PYTHON ?= python

.PHONY: all lint test test-fast bench native clean

all: lint test

lint:
	# flake8 when installed (CI); syntax gate via compileall otherwise
	@$(PYTHON) -c "import flake8" 2>/dev/null \
	  && $(PYTHON) -m flake8 zkevm_specs_tpu tests bench.py __graft_entry__.py \
	  || $(PYTHON) -m compileall -q zkevm_specs_tpu tests bench.py __graft_entry__.py

mypy:
	$(PYTHON) -m mypy zkevm_specs_tpu

# -n 2 --dist loadscope: two xdist workers (the suite is dominated by
# single-threaded host passes and XLA compiles), modules kept together so
# workers reuse each other's in-process kernel caches; falls back to a
# serial run when pytest-xdist is absent
PYTEST_PAR ?= $(shell $(PYTHON) -c "import xdist" 2>/dev/null \
  && echo "-n 2 --dist loadscope")

test:
	$(PYTHON) -m pytest tests/ -q $(PYTEST_PAR)

test-fast:
	$(PYTHON) -m pytest tests/ -q $(PYTEST_PAR) -m "not slow"

bench:
	JAX_PLATFORMS=cpu BENCH_MODE=evm BENCH_STEPS=1024 BENCH_ITERS=5 $(PYTHON) bench.py

native:
	$(MAKE) -C csrc

clean:
	rm -rf .jax_cache csrc/libzkevm_native.so
