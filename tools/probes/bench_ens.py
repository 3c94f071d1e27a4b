"""Focused config-3 ensemble throughput sweep (member-yr/s vs M)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.ops import fastcirc2 as fc2
from greb_tpu.parallel import ensemble as ens


def main():
    ms = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1
                           else "256,512,1024").split(",")]
    precision = os.environ.get("PREC", "high")
    mode = os.environ.get("MXU_MODE", "pair")
    num = Numerics(time_flux=1, time_scnr=1)
    co2 = jnp.float32(680.0)
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    mxu = fc2.build_mxu(const, plan, precision=precision, mode=mode)
    flux_b, scnr_b = ens.make_batched_ensemble_runners(
        m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
    # SHARED_CORR=1: one base-params flux correction shared by all members
    # (common spin-up, perturbed scenario physics) — the config that scales
    # past M=256/chip, where per-member 40 MB correction tables exhaust HBM
    shared = bool(int(os.environ.get("SHARED_CORR", "0")))
    corr_shared = None
    if shared:
        _, corr0 = m.flux_correction()
        corr_shared = jax.tree.map(lambda a: a[:, None], corr0)
    for M in ms:
        perturb = {"ct_sens": np.float32(22.5)
                   * (1.0 + 0.02 * np.linspace(-1, 1, M, dtype=np.float32))}
        pb = ens.perturbed_params(m.params, perturb)
        md_b = ens.batched_model_data(pb, m.forcing, m.sf)
        state_b = ens.ensemble_initial_state(
            pb, m.forcing, ens.ensemble_data(pb, m.forcing, m.sf))
        fcdata = (const, mxu)
        if shared:
            corr_b = corr_shared
        else:
            state_b, corr_b = flux_b(state_b, m.sfx, co2, md_b, fcdata)
        s, _, _ = scnr_b(state_b, m.sfx, corr_b, co2, md_b, fcdata)
        jax.block_until_ready(s.ts)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            s, _, _ = scnr_b(s, m.sfx, corr_b, co2, md_b, fcdata)
        jax.block_until_ready(s.ts)
        dt = time.perf_counter() - t0
        agg = reps * M / dt
        print(f"M={M:5d} prec={precision:7s} mode={mode:7s}: {agg:8.1f} member-yr/s "
              f"({dt/reps*1e6/17520:.1f} us/substep)", flush=True)


if __name__ == "__main__":
    main()
