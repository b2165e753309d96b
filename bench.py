"""Benchmark driver: EVM-circuit constraint evals/s/chip (BASELINE.json
config 3 class — batched gate-polynomial eval with rw/bytecode lookups).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever jax platform the environment provides (the real TPU under
the driver; CPU as fallback).  vs_baseline compares against the committed
self-baseline in bench_baseline.json (the reference publishes no numbers —
BASELINE.md), defaulting to 1.0.
"""
import json
import os
import sys
import time
from pathlib import Path


def main():
    import numpy as np

    t_setup = time.time()
    import jax

    import __graft_entry__ as graft
    from zkevm_specs_tpu.evm import ExecutionState
    from zkevm_specs_tpu.runtime.jit import CompiledGroupVerifier

    n_steps = int(os.environ.get("BENCH_STEPS", "8192"))
    tables, steps, nexts = graft._build_add_workload(n_steps)

    verifier = CompiledGroupVerifier(tables, ExecutionState.ADD, steps, nexts)
    args = verifier.prepare_inputs(steps, nexts)
    args = jax.device_put(args)

    # compile + warmup
    out = verifier(*args)
    out.block_until_ready()
    t_compile = time.time() - t_setup

    # timed runs
    n_iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.time()
    for _ in range(n_iters):
        out = verifier(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / n_iters

    assert not np.asarray(out).any(), "benchmark witness failed verification"

    constraints_per_step = verifier.n_constraints
    evals_per_s = constraints_per_step * n_steps / dt
    steps_per_s = n_steps / dt

    baseline_path = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = 1.0
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        if base.get("value"):
            vs_baseline = evals_per_s / base["value"]

    result = {
        "metric": "evm_constraint_evals_per_s_chip",
        "value": round(evals_per_s, 1),
        "unit": "constraint evals/s",
        "vs_baseline": round(vs_baseline, 3),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "steps_per_s": round(steps_per_s, 1),
                    "constraints_per_step": constraints_per_step,
                    "batch": n_steps,
                    "iter_ms": round(dt * 1e3, 3),
                    "compile_s": round(t_compile, 1),
                    "platform": jax.devices()[0].platform,
                    "device": str(jax.devices()[0]),
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
