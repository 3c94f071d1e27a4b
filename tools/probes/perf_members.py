"""Dev benchmark: aggregate ensemble throughput of the member-batched
multi-year kernel at various (M, mb). Run on the TPU."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens
from greb_tpu.ops.pallas import multiyear as my

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
         verbose=False)
fpack, sw, cpack = m._pallas_packs()
co2 = jnp.float32(680.0)

# MXU=bf16_3x|highest switches the SCENARIO kernel's circulation to the
# in-kernel member-batched MXU formulation (fastcirc2.mxu_members_...);
# the flux kernel keeps the VPU fold (time_flux years only)
import os
MXU = os.environ.get("MXU", "")
fc_flux = m.fastcirc_tables()
if MXU:
    from greb_tpu.ops import fastcirc2 as fc2
    plan, const = fc_flux
    fc_scnr = (plan, const, fc2.build_mxu_members(const, plan,
                                                  precision=MXU))
else:
    fc_scnr = fc_flux
from greb_tpu.ops.pallas.year_kernel import _fast_args
fa = _fast_args(fc_flux)
fa_s = _fast_args(fc_scnr)

def bench(M, MB, NY):
    perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 *
               np.linspace(-1, 1, M, dtype=np.float32))}
    pb = ens.perturbed_params(m.params, perturb)
    md_b = ens.ensemble_data(pb, m.forcing, m.sf)
    state_b = ens.ensemble_initial_state(pb, m.forcing, md_b)
    ppack = my.pack_member_params(pb)
    state5 = jnp.stack([state_b.ts, state_b.ta, state_b.to, state_b.q,
                        state_b.cap_surf], axis=0)
    flux_k = jax.jit(my.build_fluxcorr_years(
        m.md, m.st, m._sf_np, m.num, m.exp, n_members=M, mb=MB,
        fastcirc=fc_flux))
    s5, corrpack = flux_k(state5, ppack, fpack, sw, cpack, co2, *fa)
    scnr_k = jax.jit(my.build_scenario_years(
        m.md, m.st, m._sf_np, m.num, m.exp, n_years=NY, n_members=M, mb=MB,
        fastcirc=fc_scnr))
    co2y = jnp.full((NY,), 680.0, jnp.float32)
    args = (ppack, fpack, sw, cpack, corrpack, co2y) + fa_s
    s, mon, _ = scnr_k(s5, *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    reps = max(1, 20 // NY)
    for _ in range(reps):
        s, mon, _ = scnr_k(s, *args)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    r = reps * NY / dt
    print(f"M={M:4d} mb={MB:3d} ny={NY:3d}: {r:8.2f} ens-yr/s, "
          f"{r*M:9.1f} aggregate member-yr/s", flush=True)
    assert np.isfinite(np.asarray(mon)).all()

import os
cfgs = os.environ.get("CFGS", "")
if cfgs:
    triples = [tuple(int(v) for v in c.split(":")) for c in cfgs.split(",")]
else:
    triples = [(1, 1, 10), (4, 4, 10), (8, 8, 10), (16, 16, 5),
               (32, 16, 5), (32, 32, 5), (64, 16, 5), (64, 64, 2),
               (128, 16, 2), (256, 16, 2), (256, 32, 2)]
for (M, MB, NY) in triples:
    try:
        bench(M, MB, NY)
    except Exception as e:
        print(f"M={M} mb={MB}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
