"""Dev validation: member-batched multiyear Pallas kernel vs vmapped XLA
ensemble path (run on the TPU)."""
import numpy as np
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics, PhysicsParams
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens
from greb_tpu.ops.pallas import multiyear as my

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
         verbose=False)
M, MB, NY = 4, 2, 2
perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 * np.linspace(-1, 1, M, dtype=np.float32))}
pb = ens.perturbed_params(m.params, perturb)
md_b = ens.ensemble_data(pb, m.forcing, m.sf)
state_b = ens.ensemble_initial_state(pb, m.forcing, md_b)
co2 = jnp.float32(680.0)

plan, fcdata = m._fastcirc_split()
flux_v, scnr_v = ens.make_ensemble_runners(m.st, m.num, m.exp, m.month_mat,
                                           fast_plan=plan)
sb_x, corr_b = flux_v(state_b, m.sfx, co2, md_b, fcdata)
s_x = sb_x
monthly_x = []
for _ in range(NY):
    s_x, mon_x, _ = scnr_v(s_x, m.sfx, corr_b, co2, md_b, fcdata)
    monthly_x.append(np.asarray(mon_x))
monthly_x = np.stack(monthly_x, axis=1).reshape(M, NY*12, 5, 48, 96)
print("xla path done", flush=True)

fpack, sw, cpack = m._pallas_packs()
ppack = my.pack_member_params(pb)
state5 = jnp.stack([state_b.ts, state_b.ta, state_b.to, state_b.q,
                    state_b.cap_surf], axis=0)
fa = m._pallas_fast_args()
flux_k = my.build_fluxcorr_years(m.md, m.st, m._sf_np, m.num, m.exp,
                                 n_members=M, mb=MB, fastcirc=m.fastcirc_tables())
s5, corrpack = jax.jit(flux_k)(state5, ppack, fpack, sw, cpack, co2, *fa)
corr_k_tf = np.asarray(corrpack[:, :, 0])
print("corr tf diff:", np.abs(corr_k_tf - np.asarray(corr_b.tf)).max(), flush=True)

scnr_k = my.build_scenario_years(m.md, m.st, m._sf_np, m.num, m.exp,
                                 n_years=NY, n_members=M, mb=MB,
                                 fastcirc=m.fastcirc_tables())
co2y = jnp.full((NY,), 680.0, jnp.float32)
s5f, monthly_k, _ = jax.jit(scnr_k)(s5, ppack, fpack, sw, cpack, corrpack, co2y, *fa)
monthly_k = np.asarray(monthly_k)
print("final ts diff:", np.abs(np.asarray(s5f[0]) - np.asarray(s_x.ts)).max())
for v, name in [(0,"ts"),(1,"ta"),(2,"to"),(3,"q"),(4,"alb")]:
    d = np.abs(monthly_k[:, :, v] - monthly_x[:, :, v]).max()
    print(f"monthly {name}: max abs diff {d:.3e}")
