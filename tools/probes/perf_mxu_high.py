import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens
from greb_tpu.ops import fastcirc2 as fc2

PREC = sys.argv[1]
prec = getattr(jax.lax.Precision, PREC)
# patch ONLY the large MXU einsums
_orig = fc2._row_matmul
fc2._row_matmul = lambda x, mat: jnp.einsum(
    '...fyx,fyxz->...fyz', x, mat, preferred_element_type=jnp.float32,
    precision=prec)

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
co2 = jnp.float32(680.0)
plan, (const,) = m._fastcirc_split()
mxu = fc2.build_mxu(const, plan)
M = 256
perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 *
           np.linspace(-1, 1, M, dtype=np.float32))}
pb = ens.perturbed_params(m.params, perturb)
md_b = ens.batched_model_data(pb, m.forcing, m.sf)
state_b = ens.ensemble_initial_state(pb, m.forcing,
                                     ens.ensemble_data(pb, m.forcing, m.sf))
flux_b, scnr_b = ens.make_batched_ensemble_runners(m.st, m.num, m.exp,
                                                   m.month_mat, fast_plan=plan)
s, corr_b = flux_b(state_b, m.sfx, co2, md_b, (const, mxu))
s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
jax.block_until_ready(s.ts)
t0 = time.perf_counter()
for _ in range(3):
    s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
jax.block_until_ready(s.ts)
r = 3 / (time.perf_counter() - t0)
print(f"{PREC}: mxu M={M} {r:.2f} ens-yr/s {r*M:.0f} aggregate; "
      f"mean ts {np.asarray(mon)[:, :, 0].mean():.6f} "
      f"sample {np.asarray(mon)[0, 0, 0, 0, :3]}")
