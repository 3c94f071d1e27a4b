import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens
from greb_tpu.ops import fastcirc2 as fc2

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
         verbose=False)
co2 = jnp.float32(680.0)
plan, (const,) = m._fastcirc_split()
mxu = fc2.build_mxu(const, plan)

M = 4
perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 * np.linspace(-1, 1, M, dtype=np.float32))}
pb = ens.perturbed_params(m.params, perturb)
md_v = ens.ensemble_data(pb, m.forcing, m.sf)
md_b = ens.batched_model_data(pb, m.forcing, m.sf)
state_b = ens.ensemble_initial_state(pb, m.forcing, md_v)

flux_v, scnr_v = ens.make_ensemble_runners(m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
sv, corr_v = flux_v(state_b, m.sfx, co2, md_v, (const,))
sv2, mon_v, _ = scnr_v(sv, m.sfx, corr_v, co2, md_v, (const,))

flux_b, scnr_b = ens.make_batched_ensemble_runners(m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
sb, corr_b = flux_b(state_b, m.sfx, co2, md_b, (const, mxu))
print("corr tf:", np.abs(np.asarray(corr_b.tf).transpose(1,0,2,3) - np.asarray(corr_v.tf)).max(), flush=True)
sb2, mon_b, _ = scnr_b(sb, m.sfx, corr_b, co2, md_b, (const, mxu))
print("monthly:", np.abs(np.asarray(mon_b) - np.asarray(mon_v)).max())
print("ts:", np.abs(np.asarray(sb2.ts) - np.asarray(sv2.ts)).max(), flush=True)

# pallas single-run still compiles + runs with HIGHEST in composite dots
sfc, corr = m.flux_correction()
fpack, sw, cpack = m._pallas_packs()
corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)
r_p = m._year_scenario_pallas()
fa = m._pallas_fast_args()
s = m.initial_state().replace(cap_surf=sfc.cap_surf)
s, monthly, _ = r_p(s, fpack, sw, cpack, corrpack, co2, *fa)
jax.block_until_ready(s.ts)
t0 = time.perf_counter()
for _ in range(10):
    s, monthly, _ = r_p(s, fpack, sw, cpack, corrpack, co2, *fa)
jax.block_until_ready(s.ts)
print(f"pallas year: {10/(time.perf_counter()-t0):.2f} yr/s", flush=True)

# mxu throughput with HIGHEST at M=256
for M2 in (256,):
    perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 *
               np.linspace(-1, 1, M2, dtype=np.float32))}
    pb = ens.perturbed_params(m.params, perturb)
    md_b = ens.batched_model_data(pb, m.forcing, m.sf)
    state_b = ens.ensemble_initial_state(pb, m.forcing,
                                         ens.ensemble_data(pb, m.forcing, m.sf))
    s, corr_b = flux_b(state_b, m.sfx, co2, md_b, (const, mxu))
    s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    for _ in range(3):
        s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
    jax.block_until_ready(s.ts)
    r = 3 / (time.perf_counter() - t0)
    print(f"mxu HIGHEST M={M2}: {r:6.2f} ens-yr/s, {r*M2:8.1f} aggregate")
