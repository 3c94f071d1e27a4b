"""Headline benchmark: scenario throughput in simulated years per second.

Reference baseline: ~1 simulated year/second on a laptop (gfortran -O3;
reference README.md:3, BASELINE.md).  Default workload shape: 96x48 grid,
730 steps/yr, 24 circulation substeps/step, monthly means of 5 variables.

Prints ONE JSON line:
  {"metric": "sim_years_per_sec", "value": N, "unit": "sim-yr/s",
   "vs_baseline": N}
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from greb_tpu.config import GrebConfig, Numerics
    from greb_tpu.model import core
    from greb_tpu.model.driver import GREB

    warm_years = 2
    bench_years = 20

    cfg = GrebConfig(numerics=Numerics(time_flux=1, time_scnr=bench_years))
    model = GREB(cfg, verbose=False)

    # spin-up (also warms the flux-correction compile)
    state_fc, corr = model.flux_correction()

    runner = model._year_scenario(with_outputs=True)
    state = model.initial_state().replace(cap_surf=state_fc.cap_surf)
    co2 = jnp.float32(680.0)

    # warmup: compile + first executions
    for _ in range(warm_years):
        state, monthly, mf = runner(state, model.sfx, corr, co2, model.md)
    jax.block_until_ready(state.ts)

    t0 = time.perf_counter()
    for _ in range(bench_years):
        state, monthly, mf = runner(state, model.sfx, corr, co2, model.md)
    jax.block_until_ready(state.ts)
    dt = time.perf_counter() - t0

    yrs_per_s = bench_years / dt
    gm = float(jnp.mean(mf.ts)) - 273.15
    print(f"# bench: {bench_years} scenario years in {dt:.3f}s on "
          f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}; "
          f"global-mean Ts {gm:.2f} C", file=sys.stderr)

    print(json.dumps({
        "metric": "sim_years_per_sec",
        "value": round(yrs_per_s, 3),
        "unit": "sim-yr/s",
        "vs_baseline": round(yrs_per_s / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
