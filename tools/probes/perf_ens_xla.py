"""Dev: XLA vmapped ensemble aggregate throughput with the v2 fold."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
co2 = jnp.float32(680.0)
plan, fcdata = m._fastcirc_split()

for M in (64, 256):
    perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 *
               np.linspace(-1, 1, M, dtype=np.float32))}
    pb = ens.perturbed_params(m.params, perturb)
    md_b = ens.ensemble_data(pb, m.forcing, m.sf)
    state_b = ens.ensemble_initial_state(pb, m.forcing, md_b)
    flux_v, scnr_v = ens.make_ensemble_runners(m.st, m.num, m.exp,
                                               m.month_mat, fast_plan=plan)
    state_b, corr_b = flux_v(state_b, m.sfx, co2, md_b, fcdata)
    s, _, _ = scnr_v(state_b, m.sfx, corr_b, co2, md_b, fcdata)
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    for _ in range(3):
        s, _, _ = scnr_v(s, m.sfx, corr_b, co2, md_b, fcdata)
    jax.block_until_ready(s.ts)
    r = 3 / (time.perf_counter() - t0)
    print(f"xla-vmap M={M:4d}: {r:6.2f} ens-yr/s, {r*M:8.1f} aggregate",
          flush=True)
