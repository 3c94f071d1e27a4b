"""Ablation probe: which parts of the fused year kernel cost what.

Monkeypatches fastcirc2.substep with stripped variants and re-times the
whole Pallas scenario-year kernel.  Dev-only; run on the TPU.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.ops import fastcirc2 as fc2

REAL_SUBSTEP = fc2.substep


def make_variant(which):
    def substep(x, cf, const, plan, extend=fc2.extend_lat_zero):
        Y = x.shape[-2]
        if which == "nothing":
            return x + 1e-7 * x
        rolls = [jnp.roll(x, s, axis=-1) for _, s in fc2._LON_IDX_SHIFT]
        dd = fc2._apply7_rolled(rolls, x, const.zd)
        if which == "zd":
            return x + dd
        dd = fc2._masked_clamp(dd, x, const.band)
        if which == "zd+clamp":
            return x + dd
        dd = fc2._extra_diffusion(x, dd, const, plan)
        if which == "zd+clamp+comp":
            return x + dd
        da = fc2._apply7_rolled(rolls, x, cf.za)
        da = fc2._masked_clamp(da, x, const.band)
        da = fc2._extra_advection(x, da, cf, plan)
        if which == "zd+adv":
            return x + const.wz * dd + da
        xe = extend(x, 2)
        dy = cf.c0m * x
        dy = dy + cf.mc[0] * xe[..., 0:Y, :]
        dy = dy + cf.mc[1] * xe[..., 1:Y + 1, :]
        dy = dy + cf.mc[2] * xe[..., 3:Y + 3, :]
        dy = dy + cf.mc[3] * xe[..., 4:Y + 4, :]
        return x + const.wz * dd + da + dy
    return substep


def bench(label, nsub=24):
    num = Numerics(time_flux=1, time_scnr=5)
    num = num.replace(nsub_crcl=nsub) if hasattr(num, "replace") else num
    m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
             verbose=False)
    co2 = jnp.float32(680.0)
    sfc, corr = m.flux_correction()
    fpack, sw, cpack = m._pallas_packs()
    corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)
    r_p = m._year_scenario_pallas()
    fa = m._pallas_fast_args()
    state = m.initial_state().replace(cap_surf=sfc.cap_surf)

    def run(s):
        s2, _, _ = r_p(s, fpack, sw, cpack, corrpack, co2, *fa)
        return s2

    s = run(state)
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    for _ in range(20):
        s = run(s)
    jax.block_until_ready(s.ts)
    r = 20 / (time.perf_counter() - t0)
    print(f"{label:18s}: {r:7.2f} yr/s ({1e6 / (r * 730):6.2f} us/step)",
          flush=True)


if __name__ == "__main__":
    for which in ["nothing", "zd", "zd+clamp", "zd+clamp+comp", "zd+adv",
                  "full"]:
        fc2.substep = REAL_SUBSTEP if which == "full" else make_variant(which)
        bench(which)
    fc2.substep = REAL_SUBSTEP
