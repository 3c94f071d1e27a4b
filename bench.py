"""Headline benchmark: scenario throughput in simulated years per second.

Reference baseline: ~1 simulated year/second on a laptop (gfortran -O3;
reference README.md:3, BASELINE.md).  Default workload shape: 96x48 grid,
730 steps/yr, 24 circulation substeps/step, monthly means of 5 variables.

Prints ONE JSON line:
  {"metric": "sim_years_per_sec", "value": N, "unit": "sim-yr/s",
   "vs_baseline": N}

Extra context (mode, per-mode numbers) goes to stderr.

Mode selection (env GREB_BENCH_MODE): "auto" (default) tries the fused
Pallas whole-year kernel and falls back to the unrolled XLA path; "pallas"
or "xla" force one.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _steady_rate(step_year, state, years: int) -> float:
    """step_year(state) -> state; returns steady-state years/sec."""
    import jax
    s = step_year(state)                      # warm: compile + first exec
    jax.block_until_ready(jax.tree.leaves(s)[0])
    t0 = time.perf_counter()
    for _ in range(years):
        s = step_year(s)
    jax.block_until_ready(jax.tree.leaves(s)[0])
    return years / (time.perf_counter() - t0)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from greb_tpu.config import GrebConfig, Numerics
    from greb_tpu.forcing import Corrections
    from greb_tpu.model.driver import GREB

    mode = os.environ.get("GREB_BENCH_MODE", "auto")
    bench_years = int(os.environ.get("GREB_BENCH_YEARS", "20"))
    platform = jax.devices()[0].platform

    num = Numerics(time_flux=1, time_scnr=bench_years)
    co2 = jnp.float32(680.0)

    results = {}

    # --- XLA path (unrolled substeps: faster compile AND run on TPU) -------
    if mode in ("auto", "xla"):
        m = GREB(GrebConfig(numerics=num, unroll_circulation=True),
                 verbose=False)
        state_fc, corr = m.flux_correction()
        runner = m._year_scenario(with_outputs=True)
        state = m.initial_state().replace(cap_surf=state_fc.cap_surf)

        def run_xla(s):
            s2, monthly, mf = runner(s, m.sfx, corr, co2, m.md)
            return s2

        rate = _steady_rate(run_xla, state, bench_years)
        results["xla"] = rate
        print(f"# xla: {rate:.2f} sim-yr/s", file=sys.stderr)

    # --- fused Pallas whole-year kernel ------------------------------------
    if mode in ("auto", "pallas") and platform != "cpu":
        try:
            mp = GREB(GrebConfig(numerics=num, use_pallas=True),
                      verbose=False)
            sfc, corr_p = mp.flux_correction()
            fpack, sw, cpack = mp._pallas_packs()
            corrpack = jnp.stack([corr_p.tf, corr_p.tof, corr_p.qf], axis=1)
            r_p = mp._year_scenario_pallas()

            def run_pl(s):
                s2, monthly, mf = r_p(s, fpack, sw, cpack, corrpack, co2)
                return s2

            state = mp.initial_state().replace(cap_surf=sfc.cap_surf)
            rate = _steady_rate(run_pl, state, bench_years)
            results["pallas"] = rate
            print(f"# pallas: {rate:.2f} sim-yr/s", file=sys.stderr)
        except Exception as e:  # pragma: no cover - fallback path
            print(f"# pallas path failed ({type(e).__name__}: {e}); "
                  f"using xla", file=sys.stderr)

    if not results:
        print("# no benchmark mode ran", file=sys.stderr)
        sys.exit(1)

    best_mode, best = max(results.items(), key=lambda kv: kv[1])
    dev = jax.devices()[0]
    print(f"# best={best_mode} on {dev.platform}:{dev.device_kind}; "
          f"workload: {bench_years}-yr 2xCO2 scenario, 96x48, 730 steps/yr",
          file=sys.stderr)

    print(json.dumps({
        "metric": "sim_years_per_sec",
        "value": round(best, 3),
        "unit": "sim-yr/s",
        "vs_baseline": round(best / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
