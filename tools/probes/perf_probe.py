"""Dev-only latency probe for the fused scenario-year kernel.

Times the kernel with different steps-per-grid-iteration (SB) and substep
unroll settings to locate the per-substep latency floor.  Not part of the
package; run directly on the TPU:  python tools/perf_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.ops.pallas import year_kernel as yk


def rate(run, state, args, years=20):
    s, _ = run(state, *args)
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    for _ in range(years):
        s, _ = run(s, *args)
    jax.block_until_ready(s.ts)
    dt = time.perf_counter() - t0
    return years / dt


def main():
    num = Numerics(time_flux=1, time_scnr=5)
    m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
             verbose=False)
    sfc, corr = m.flux_correction()
    fpack, sw, cpack = m._pallas_packs()
    corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)
    fa = m._pallas_fast_args()
    state0 = m.initial_state().replace(cap_surf=sfc.cap_surf)
    co2 = jnp.float32(680.0)

    for sb in [2, 5, 10]:
        for unroll in [1, 4, 24]:
            t0 = time.perf_counter()
            run_k = yk.build_scenario_year(m.md, m.st, m._sf_np, m.num, m.exp,
                                           fastcirc=m.fastcirc_tables(),
                                           sb=sb, circ_unroll=unroll)
            run = jax.jit(lambda s, *a: run_k(s, *a))
            r = rate(lambda s, *a: run(s, *a),
                     state0, (fpack, sw, cpack, corrpack, co2) + fa)
            dt_c = time.perf_counter() - t0
            print(f"sb={sb:3d} unroll={unroll:3d}: {r:7.2f} yr/s "
                  f"({1e6 / (r * 730):6.2f} us/step) [build+warm {dt_c:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
