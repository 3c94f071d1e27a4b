"""Pallas whole-year kernel vs the XLA path (interpret mode on CPU).

The fused kernel reuses core.scenario_step / fluxcorr_step verbatim, so any
disagreement beyond f32 reassociation noise is a kernel-plumbing bug
(block indexing, scratch carry, pack order)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.forcing import Corrections
from greb_tpu.model.driver import GREB
from greb_tpu.ops.pallas import year_kernel as yk

# interpret mode executes the kernel op-by-op in python; keep the calendar
# minimal AND the circulation sub-cycle short (dt_crcl=6h -> 2 substeps).
NUM = Numerics(xdim=48, ydim=24, ndays_yr=1, jday_mon=(1,),
               dt_crcl=6 * 3600, time_flux=1, time_scnr=1)


@pytest.fixture(scope="module")
def model():
    return GREB(GrebConfig(numerics=NUM), verbose=False)


def test_scenario_kernel_matches_xla(model):
    m = model
    state = m.initial_state()
    corr = Corrections.zeros(NUM.nstep_yr, NUM.ydim, NUM.xdim)
    co2 = jnp.float32(680.0)

    r_x = m._year_scenario(True)
    sx, mon_x, _ = r_x(state, m.sfx, corr, co2, m.md)

    fpack, sw = yk.pack_forcing(m.sfx)
    cpack = yk.pack_const(m.md)
    corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)
    run = yk.build_scenario_year(m.md, m.st, m._sf_np, NUM, m.exp,
                                 interpret=True)
    sp, outs, asum = run(state, fpack, sw, cpack, corrpack, co2)

    for name in ("ts", "ta", "to", "q", "cap_surf"):
        a = np.asarray(getattr(sx, name))
        b = np.asarray(getattr(sp, name))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-4, err_msg=name)
    mon_p = jnp.einsum('mt,tvyx->mvyx', m.month_mat, outs[:, :5])
    np.testing.assert_allclose(np.asarray(mon_x), np.asarray(mon_p),
                               rtol=2e-6, atol=1e-4)


def test_fluxcorr_kernel_matches_xla(model):
    m = model
    state = m.initial_state()
    co2 = jnp.float32(340.0)

    r_x = m._year_fluxcorr()
    sx, corr_x = r_x(state, m.sfx, co2, m.md)

    fpack, sw = yk.pack_forcing(m.sfx)
    cpack = yk.pack_const(m.md)
    run = yk.build_fluxcorr_year(m.md, m.st, m._sf_np, NUM, m.exp,
                                 interpret=True)
    sp, corrpack = run(state, fpack, sw, cpack, co2)

    np.testing.assert_allclose(np.asarray(sx.ts), np.asarray(sp.ts),
                               rtol=2e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(corr_x.tf),
                               np.asarray(corrpack[:, 0]),
                               rtol=2e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(corr_x.qf),
                               np.asarray(corrpack[:, 2]),
                               rtol=2e-5, atol=1e-7)


def test_multiyear_kernel_matches_per_year_and_unifies_diags(model):
    """The fused MULTI-year kernel (ops/pallas/multiyear.py — previously
    TPU-tool-tested only) vs two calls of the per-year kernel, interpret
    mode: final state equal, in-kernel monthly means match the einsum
    form, and the per-year annual ACCUMULATORS are identical — the
    sums both driver paths now derive console diagnostics from, so the
    paths print the same numbers (VERDICT r3 task 8)."""
    from greb_tpu.ops.pallas import multiyear as my
    from greb_tpu.parallel.ensemble import stack_params

    m = model
    state = m.initial_state()
    corr = Corrections.zeros(NUM.nstep_yr, NUM.ydim, NUM.xdim)
    co2 = jnp.float32(680.0)
    fpack, sw = yk.pack_forcing(m.sfx)
    cpack = yk.pack_const(m.md)
    corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)

    run1 = yk.build_scenario_year(m.md, m.st, m._sf_np, NUM, m.exp,
                                  interpret=True)
    s1, outs1, asum1 = run1(state, fpack, sw, cpack, corrpack, co2)
    s2, outs2, asum2 = run1(s1, fpack, sw, cpack, corrpack, co2)

    runM = my.build_scenario_years(m.md, m.st, m._sf_np, NUM, m.exp,
                                   n_years=2, n_members=1, mb=1,
                                   interpret=True)
    ppack = my.pack_member_params(stack_params([m.params]))
    s5 = jnp.stack([state.ts, state.ta, state.to, state.q,
                    state.cap_surf])[:, None]
    co2y = jnp.full((2,), 680.0, jnp.float32)
    s5f, mon, asumM = runM(s5, ppack, fpack, sw, cpack, corrpack[None],
                           co2y)

    for i, f in enumerate(("ts", "ta", "to", "q", "cap_surf")):
        np.testing.assert_allclose(np.asarray(s5f[i, 0]),
                                   np.asarray(getattr(s2, f)),
                                   rtol=2e-6, atol=1e-4, err_msg=f)
    # annual accumulators: the diag source for BOTH driver paths.  The
    # multi-year kernel streams params via the member pack (f32 caps),
    # which can flip a where-boundary for isolated borderline cells —
    # measured 1 cell in 10368 at 6e-5 relative; the PRINTED quantities
    # (global/point means) agree far tighter, asserted below.
    np.testing.assert_allclose(np.asarray(asumM[0, 0]), np.asarray(asum1),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(asumM[0, 1]), np.asarray(asum2),
                               rtol=1e-4, atol=1e-2)
    for yr, a1 in ((0, asum1), (1, asum2)):
        gm_m = np.asarray(asumM[0, yr, 0]).mean() / NUM.nstep_yr
        gm_1 = np.asarray(a1[0]).mean() / NUM.nstep_yr
        assert abs(gm_m - gm_1) < 1e-5, (yr, gm_m, gm_1)
    # in-kernel monthly accumulation vs the einsum form
    mm = jnp.asarray(m.month_mat)
    mon1 = jnp.einsum('mt,tvyx->mvyx', mm, outs1[:, :5])
    np.testing.assert_allclose(np.asarray(mon[0, :1]), np.asarray(mon1),
                               rtol=2e-6, atol=1e-4)
