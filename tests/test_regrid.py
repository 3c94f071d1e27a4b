"""Refined-grid support: regridding correctness + a refined model year runs
stably (BASELINE config 4)."""
import numpy as np
import pytest

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.io.synthetic import make_synthetic_forcing
from greb_tpu.regrid import regrid_field, regrid_forcing_arrays, regrid_solar

F32 = np.float32


def test_identity_regrid():
    a = np.random.default_rng(0).standard_normal((48, 96)).astype(F32)
    np.testing.assert_array_equal(regrid_field(a, 96, 48), a)


def test_constant_preserved():
    a = np.full((48, 96), 7.5, F32)
    out = regrid_field(a, 384, 192)
    np.testing.assert_allclose(out, 7.5, rtol=1e-6)
    assert out.shape == (192, 384)


def test_linear_gradient_exact_in_lon():
    """A zonal sinusoid is reproduced to 2nd order by bilinear resampling."""
    x = np.arange(96) * (360.0 / 96) + 360.0 / 192
    a = np.tile(np.sin(np.deg2rad(x)), (48, 1)).astype(F32)
    out = regrid_field(a, 192, 48)
    xf = np.arange(192) * (360.0 / 192) + 360.0 / 384
    want = np.tile(np.sin(np.deg2rad(xf)), (48, 1))
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_periodic_lon_seam():
    """Interpolation across the 0/360 seam uses the wrapped neighbour."""
    a = np.zeros((8, 12), F32)
    a[:, 0] = 1.0
    a[:, -1] = 3.0
    out = regrid_field(a, 24, 8)
    # destination cell left of src cell 0 blends src[-1] and src[0]
    assert 1.0 < out[0, 0] < 3.0


def test_nearest_keeps_binary_mask():
    rng = np.random.default_rng(1)
    g = (rng.uniform(size=(48, 96)) > 0.7).astype(F32)
    out = regrid_field(g, 192, 96, nearest=True)
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_regrid_forcing_contract():
    num = Numerics(xdim=192, ydim=96, ndays_yr=4, jday_mon=(2, 2))
    arrs = make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr)
    out = regrid_forcing_arrays(arrs, num)
    assert out["tclim"].shape == (num.nstep_yr, 96, 192)
    assert out["sw_solar"].shape == (num.nstep_yr, 96)
    assert out["z_topo"].min() == F32(-0.1)
    assert set(np.unique(out["glacier"])) <= {0.0, 1.0}
    assert (out["qclim"] > 0).all()


def test_refined_grid_year_runs():
    """A 192x96 model year integrates stably (finite, q>0)."""
    import jax.numpy as jnp
    from greb_tpu.forcing import Corrections, forcing_from_arrays
    from greb_tpu.model.driver import GREB

    num = Numerics(xdim=192, ydim=96, ndays_yr=10, jday_mon=(6, 4),
                   time_flux=1, time_scnr=1)
    arrs = make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr)
    forcing = forcing_from_arrays(regrid_forcing_arrays(arrs, num))
    m = GREB(GrebConfig(numerics=num), forcing=forcing, verbose=False)
    state, corr = m.flux_correction()
    state2, monthly, diags = m.run_scenario(
        corr, years=1, co2_series=np.array([680.0], F32),
        cap_surf=state.cap_surf)
    assert np.isfinite(monthly).all()
    assert float(np.asarray(state2.q).min()) > 0.0
    # polar sub-cycling schedules scale with the grid
    assert m.grid.diff_sched.max_iter > 0
