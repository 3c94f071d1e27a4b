"""vmapped physics-perturbed ensembles (BASELINE config 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.config import Experiment, GrebConfig, Numerics, PhysicsParams
from greb_tpu.forcing import Corrections, forcing_from_arrays
from greb_tpu.grid import month_average_matrix
from greb_tpu.io.synthetic import make_synthetic_forcing
from greb_tpu.model.driver import GREB
from greb_tpu.parallel.ensemble import (ensemble_data, ensemble_initial_state,
                                        make_ensemble_runners,
                                        perturbed_params, stack_params)

F32 = np.float32
NUM = Numerics(xdim=48, ydim=24, ndays_yr=10, jday_mon=(6, 4),
               time_flux=1, time_scnr=1)
N_MEMBERS = 4


@pytest.fixture(scope="module")
def ens():
    m = GREB(GrebConfig(numerics=NUM), verbose=False)
    pp = perturbed_params(PhysicsParams.default(), {
        # spread the sensible-heat coupling across members
        "ct_sens": np.float32(22.5) + np.linspace(-4, 4, N_MEMBERS,
                                                  dtype=F32),
    })
    md = ensemble_data(pp, m.forcing, m.sf)
    state = ensemble_initial_state(pp, m.forcing, md)
    mm = jnp.asarray(month_average_matrix(NUM.jday_mon, NUM.ndt_days))
    flux, scnr = make_ensemble_runners(m.st, NUM, Experiment(), mm)
    return m, pp, md, state, flux, scnr


def test_perturbed_params_shapes():
    pp = perturbed_params(PhysicsParams.default(), {
        "kappa": np.array([7e5, 8e5, 9e5], F32)})
    assert pp.kappa.shape == (3,)
    assert pp.p_emi.shape == (3, 10)
    np.testing.assert_allclose(np.asarray(pp.ct_sens), 22.5)


def test_ensemble_year_runs_and_members_differ(ens):
    m, pp, md, state, flux, scnr = ens
    co2 = jnp.float32(298.0)
    state_fc, corr = flux(state, m.sfx, co2, md)
    state2, monthly, mf = scnr(state_fc, m.sfx, corr, jnp.float32(680.0), md)
    assert monthly.shape == (N_MEMBERS, len(NUM.jday_mon), 5, NUM.ydim,
                             NUM.xdim)
    assert np.isfinite(np.asarray(monthly)).all()
    # members must genuinely differ (different physics)
    ts = np.asarray(mf.ts)
    spread = ts.std(axis=0).max()
    assert spread > 1e-4, spread


def test_member0_matches_single_run(ens):
    """Member with unperturbed params must reproduce the single-model run."""
    m, pp, md, state, flux, scnr = ens
    co2 = jnp.float32(298.0)
    # single-model reference with the same (perturbed) ct_sens as member 1
    params1 = jax.tree.map(lambda a: a[1], pp)
    m1 = GREB(GrebConfig(numerics=NUM), params=params1, forcing=m.forcing,
              verbose=False)
    s1, corr1 = m1.flux_correction(co2=298.0)
    state_fc, corr = flux(state, m.sfx, co2, md)
    np.testing.assert_allclose(np.asarray(state_fc.ts[1]),
                               np.asarray(s1.ts), rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(np.asarray(corr.tf[1]),
                               np.asarray(corr1.tf), rtol=1e-5, atol=2e-2)
