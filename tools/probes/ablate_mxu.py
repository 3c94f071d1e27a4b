"""Where does the MXU ensemble substep's time go? (TPU ablation)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.ops import fastcirc2 as fc2
from greb_tpu.ops import fastcirc as v1

M = int(sys.argv[1]) if len(sys.argv) > 1 else 256
num = Numerics(time_flux=1, time_scnr=1)
m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
plan, (const,) = m._fastcirc_split()
mxu = fc2.build_mxu(const, plan, precision="high")
s0 = m.initial_state()
x0 = jnp.broadcast_to(jnp.stack([s0.ta, s0.q]), (M, 2, 48, 96)) + 0.0
cf = fc2.step_coeffs(m.forcing.uclim[0], m.forcing.vclim[0], const, plan)
za_mat = fc2.adv_matrix(cf.za, mxu)

def variant(name, sub):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, 240, lambda i, xc: sub(xc), x))
    r = f(x0); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(x0); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 240 * 1e6
    print(f"{name:28s} {dt:7.2f} us/substep", flush=True)

Y = 48
def mer(x, xe):
    dy = cf.c0m * x
    dy = dy + cf.mc[0] * xe[..., 0:Y, :]
    dy = dy + cf.mc[1] * xe[..., 1:Y+1, :]
    dy = dy + cf.mc[2] * xe[..., 3:Y+3, :]
    dy = dy + cf.mc[3] * xe[..., 4:Y+4, :]
    return dy

variant("matmul x2 only", lambda x: x + fc2._row_matmul(x, mxu.zd_mat, "high")
        + fc2._row_matmul(x, za_mat, "high"))
variant("matmul x1 only", lambda x: x + fc2._row_matmul(x, mxu.zd_mat, "high"))
variant("mer only", lambda x: x + mer(x, fc2.extend_lat_zero(x, 2)))
variant("matmul x2 + clamps", lambda x: x
        + fc2._masked_clamp(fc2._row_matmul(x, mxu.zd_mat, "high"), x, const.band)
        + fc2._masked_clamp(fc2._row_matmul(x, za_mat, "high"), x, const.band))
variant("matmul x2 + clamps + mer", lambda x: x
        + const.wz * fc2._masked_clamp(fc2._row_matmul(x, mxu.zd_mat, "high"), x, const.band)
        + fc2._masked_clamp(fc2._row_matmul(x, za_mat, "high"), x, const.band)
        + mer(x, fc2.extend_lat_zero(x, 2)))
variant("full mxu_substep", lambda x: fc2.mxu_substep(x, cf, za_mat, const, mxu, plan))
