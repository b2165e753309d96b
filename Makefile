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

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow" \
	  --ignore=tests/test_block_jit.py --ignore=tests/test_jit_runner.py \
	  --ignore=tests/test_sharding.py --ignore=tests/test_logup_sharded.py

bench:
	JAX_PLATFORMS=cpu BENCH_MODE=evm BENCH_STEPS=1024 BENCH_ITERS=5 $(PYTHON) bench.py

native:
	$(MAKE) -C csrc

clean:
	rm -rf .jax_cache csrc/libzkevm_native.so
