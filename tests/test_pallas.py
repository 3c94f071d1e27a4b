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
    sp, outs = run(state, fpack, sw, cpack, corrpack, co2)

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
