"""Fast (coefficient-folded) circulation vs the strict stencil path.

The fast path regroups the same float32 formulas (reference
src/greb.f90:528-915), so agreement is to float32 rounding, not bit-exact:
per-substep increments match to ~1e-6 relative and whole-year integrations
stay allclose at climate-irrelevant tolerances."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.ops import fastcirc
from greb_tpu.ops import fastcirc2
from greb_tpu.ops import stencils as stc

F32 = np.float32


@pytest.fixture(scope="module", params=[fastcirc, fastcirc2],
                ids=["v1-banded", "v2-uniform"])
def fast(request, setup):
    """(module, plan, const) for both folds — the API is identical, so every
    parity test below runs against each."""
    fc = request.param
    wz_air = np.asarray(setup.derived.wz_air)
    wz_vapor = np.asarray(setup.derived.wz_vapor)
    plan, const = fc.build_const(
        wz_air, wz_vapor, setup.grid, setup.st,
        kappa=float(setup.params.kappa))
    return fc, plan, const


def _cf(setup, fast, ityr):
    fc, plan, const = fast
    return fc.step_coeffs(setup.sfx.u[ityr], setup.sfx.v[ityr], const, plan)


def _strict_circ(setup, x2, ityr, nsub):
    fx = setup.fx(ityr)
    u_m = jnp.maximum(fx.u, 0.0)
    u_p = jnp.minimum(fx.u, 0.0)
    v_m = jnp.maximum(fx.v, 0.0)
    v_p = jnp.minimum(fx.v, 0.0)
    wz2 = jnp.stack([setup.derived.wz_air, setup.derived.wz_vapor])
    return stc.circulation(x2, wz2, u_m, u_p, v_m, v_p, setup.st, setup.sf,
                           setup.params.kappa, nsub=nsub, unroll=True)


def _state_x2(setup):
    s = setup.state0()
    return jnp.stack([s.ta, s.q])


def _assert_fields_close(x2, got, want, rtol, name=""):
    """Compare the UPDATED fields: the folded path regroups float32 sums, so
    x + dx differs by a few ULPs of x (≈3e-5 absolute for Ta≈250 K) — the
    increments themselves agree to that rounding."""
    a = np.asarray(x2 + got)
    b = np.asarray(x2 + want)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=0.0, err_msg=name)


@pytest.mark.parametrize("ityr", [0, 181, 365, 729])
def test_single_substep_matches_strict(setup, fast, ityr):
    fc, plan, const = fast
    x2 = _state_x2(setup)
    cf = _cf(setup, fast, ityr)
    got = fc.substep(x2, cf, const, plan) - x2
    want = _strict_circ(setup, x2, ityr, nsub=1)
    _assert_fields_close(x2, got, want, rtol=2e-6)


@pytest.mark.parametrize("ityr", [0, 365])
def test_full_circulation_matches_strict(setup, fast, ityr):
    fc, plan, const = fast
    x2 = _state_x2(setup)
    cf = _cf(setup, fast, ityr)
    got = fc.circulation(x2, cf, const, plan, nsub=24, unroll=True)
    want = _strict_circ(setup, x2, ityr, nsub=24)
    _assert_fields_close(x2, got, want, rtol=3e-5)


def test_clamp_semantics_near_zero_q(setup, fast):
    """The polar positivity clamps are the only nonlinearity; force them to
    fire by making q tiny at the poles and check both paths agree."""
    fc, plan, const = fast
    s = setup.state0()
    q = np.asarray(s.q).copy()
    q[:3, :] = 1e-9
    q[-3:, :] = 1e-9
    ta = np.asarray(s.ta).copy()
    x2 = jnp.stack([jnp.asarray(ta), jnp.asarray(q)])
    cf = _cf(setup, fast, 400)
    got = fc.circulation(x2, cf, const, plan, nsub=24, unroll=True)
    want = _strict_circ(setup, x2, 400, nsub=24)
    # q stays positive under both
    assert float((np.asarray(x2 + got)[1]).min()) > 0.0
    _assert_fields_close(x2, got, want, rtol=3e-5)


def test_fori_loop_equals_unrolled(setup, fast):
    fc, plan, const = fast
    x2 = _state_x2(setup)
    cf = _cf(setup, fast, 7)
    a = fc.circulation(x2, cf, const, plan, nsub=24, unroll=True)
    b = fc.circulation(x2, cf, const, plan, nsub=24, unroll=False)
    c = fc.circulation(x2, cf, const, plan, nsub=24, unroll=6)
    # XLA may fuse the rolled loop body differently from the unrolled code,
    # so agreement is to rounding, not bit-exact
    _assert_fields_close(x2, a, b, rtol=3e-5)
    _assert_fields_close(x2, a, c, rtol=3e-5)


def test_driver_year_fast_matches_strict(forcing_np):
    """Full model (flux-correction year + scenario year): fast vs strict
    monthly means stay allclose at climate-irrelevant tolerances."""
    from greb_tpu.config import GrebConfig, Numerics
    from greb_tpu.forcing import forcing_from_arrays
    from greb_tpu.model.driver import GREB

    num = Numerics(time_flux=1, time_scnr=1)
    cfgs = {"strict": dict(fast_circulation=False),
            "v1": dict(fast_circulation=True, fastcirc_version=1),
            "v2": dict(fast_circulation=True, fastcirc_version=2)}
    results = {}
    for name, kw in cfgs.items():
        m = GREB(GrebConfig(numerics=num, **kw),
                 forcing=forcing_from_arrays(forcing_np), verbose=False)
        state_fc, corr = m.flux_correction()
        state, monthly, _ = m.run_scenario(corr, cap_surf=state_fc.cap_surf)
        results[name] = (np.asarray(monthly), np.asarray(state.ts))
    m_strict, ts_strict = results["strict"]
    for name in ("v1", "v2"):
        m_fast, ts_fast = results[name]
        # temperatures ~250 K: mK-level agreement after 1460 steps; q ~1e-3
        np.testing.assert_allclose(m_fast[..., :3, :, :],
                                   m_strict[..., :3, :, :],
                                   rtol=0, atol=1e-2, err_msg=name)
        np.testing.assert_allclose(m_fast[..., 3, :, :],
                                   m_strict[..., 3, :, :],
                                   rtol=1e-3, atol=1e-8, err_msg=name)
        np.testing.assert_allclose(m_fast[..., 4, :, :],
                                   m_strict[..., 4, :, :],
                                   rtol=0, atol=2e-4, err_msg=name)  # albedo
        np.testing.assert_allclose(ts_fast, ts_strict, rtol=0, atol=1e-2,
                                   err_msg=name)


@pytest.mark.parametrize("fc", [fastcirc, fastcirc2],
                         ids=["v1-banded", "v2-uniform"])
def test_refined_grid_substep_matches_strict(fc):
    """384x192: every row is 'polar' (dxlat < 2.5e5 m everywhere) and the
    pole rows sub-cycle 1800x — the fast path must handle the hemisphere
    band split, explicit fori segments, and the SVD-truncated (lowrank)
    composite for the huge-n rows."""
    import jax.numpy as jnp
    from greb_tpu.config import Numerics
    from greb_tpu.forcing import build_derived, forcing_from_arrays
    from greb_tpu.grid import make_grid
    from greb_tpu.io.synthetic import make_synthetic_forcing
    from greb_tpu.model import core
    from greb_tpu.regrid import regrid_forcing_arrays
    from greb_tpu.config import PhysicsParams

    num = Numerics(xdim=384, ydim=192, ndays_yr=10, jday_mon=(6, 4),
                   time_flux=1, time_scnr=1)
    arrs = make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr)
    forcing = forcing_from_arrays(regrid_forcing_arrays(arrs, num))
    params = PhysicsParams.default()
    grid = make_grid(num.xdim, num.ydim, num.dt_crcl)
    st, sf_np = stc.make_stencil_arrays(grid)
    sf = jax.tree.map(jnp.asarray, sf_np)
    derived = build_derived(params, forcing)

    if fc is fastcirc:
        # v1 folds advection into shared coefficient planes and cannot
        # express extension-mode sequential zonal splitting — it refuses
        with pytest.raises(ValueError, match="fastcirc_version=2"):
            fc.build_const(np.asarray(derived.wz_air),
                           np.asarray(derived.wz_vapor),
                           grid, st, kappa=float(params.kappa))
        return

    plan, const = fc.build_const(
        np.asarray(derived.wz_air), np.asarray(derived.wz_vapor),
        grid, st, kappa=float(params.kappa))
    assert plan.comp_mode == "packed"    # block-diag adaptive-rank SVD form
    assert plan.comp_kt + plan.comp_kb >= 2
    assert plan.seq_zonal                # extension-mode sequential split

    from greb_tpu.forcing import initial_state
    s0 = initial_state(params, forcing, derived)
    x2 = jnp.stack([s0.ta, s0.q])
    cf = fc.step_coeffs(forcing.uclim[0], forcing.vclim[0], const, plan)
    got = fc.substep(x2, cf, const, plan) - x2

    fx = jax.tree.map(lambda a: a[0], core.step_forcing_from_clim(forcing))
    u_m = jnp.maximum(fx.u, 0.0)
    u_p = jnp.minimum(fx.u, 0.0)
    v_m = jnp.maximum(fx.v, 0.0)
    v_p = jnp.minimum(fx.v, 0.0)
    wz2 = jnp.stack([derived.wz_air, derived.wz_vapor])
    want = stc.circulation(x2, wz2, u_m, u_p, v_m, v_p, st, sf,
                           params.kappa, nsub=1, unroll=True)
    # lowrank rows are SVD-truncated at 3e-7: a touch looser than pure
    # float32 rounding.  The capped extension schedules (grid.py round 3)
    # roughly double the composite powers at this grid, so the truncated
    # factors carry a little more error than under the reference rule.
    _assert_fields_close(x2, got, want, rtol=5e-5)
