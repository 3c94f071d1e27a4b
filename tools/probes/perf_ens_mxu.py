"""Dev: validate + benchmark the batched MXU ensemble runner."""
import sys, time
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.parallel import ensemble as ens
from greb_tpu.ops import fastcirc2 as fc2

num = Numerics(time_flux=1, time_scnr=2)
m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
co2 = jnp.float32(680.0)
plan, (const,) = m._fastcirc_split()
mxu = fc2.build_mxu(const, plan)

def make(M):
    perturb = {"ct_sens": np.float32(22.5) * (1.0 + 0.02 *
               np.linspace(-1, 1, M, dtype=np.float32))}
    pb = ens.perturbed_params(m.params, perturb)
    md_b = ens.batched_model_data(pb, m.forcing, m.sf)
    md_v = ens.ensemble_data(pb, m.forcing, m.sf)
    state_b = ens.ensemble_initial_state(pb, m.forcing, md_v)
    return pb, md_b, md_v, state_b

# --- correctness at M=4 vs vmapped path ---
pb, md_b, md_v, state_b = make(4)
flux_v, scnr_v = ens.make_ensemble_runners(m.st, m.num, m.exp, m.month_mat,
                                           fast_plan=plan)
sv, corr_v = flux_v(state_b, m.sfx, co2, md_v, (const,))
sv2, mon_v, _ = scnr_v(sv, m.sfx, corr_v, co2, md_v, (const,))

flux_b, scnr_b = ens.make_batched_ensemble_runners(m.st, m.num, m.exp,
                                                   m.month_mat, fast_plan=plan)
sb, corr_b = flux_b(state_b, m.sfx, co2, md_b, (const, mxu))
sb2, mon_b, _ = scnr_b(sb, m.sfx, corr_b, co2, md_b, (const, mxu))
d_corr = np.abs(np.asarray(corr_b.tf).transpose(1,0,2,3) - np.asarray(corr_v.tf)).max()
d_mon = np.abs(np.asarray(mon_b) - np.asarray(mon_v)).max()
d_ts = np.abs(np.asarray(sb2.ts) - np.asarray(sv2.ts)).max()
print(f"mxu vs vmap: corr {d_corr:.3e}  monthly {d_mon:.3e}  ts {d_ts:.3e}",
      flush=True)

# --- throughput sweep ---
for M in (64, 256, 512, 1024):
    pb, md_b, _, state_b = make(M)
    flux_b, scnr_b = ens.make_batched_ensemble_runners(
        m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
    s, corr_b = flux_b(state_b, m.sfx, co2, md_b, (const, mxu))
    s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s, mon, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, (const, mxu))
    jax.block_until_ready(s.ts)
    r = reps / (time.perf_counter() - t0)
    print(f"mxu-batched M={M:5d}: {r:6.2f} ens-yr/s, {r*M:8.1f} aggregate",
          flush=True)
    assert np.isfinite(np.asarray(mon)).all()
