"""Stencil tests: diffusion/advection/circulation vs the literal oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.ops import stencils as stc
from tests.conftest import assert_close


def _winds(setup, ityr):
    o = setup.oracle
    return (jnp.asarray(o.uclim_m[ityr]), jnp.asarray(o.uclim_p[ityr]),
            jnp.asarray(o.vclim_m[ityr]), jnp.asarray(o.vclim_p[ityr]))


@pytest.mark.parametrize("field,wzname", [("ta", "wz_air"), ("q", "wz_vapor")])
def test_diffusion(setup, field, wzname):
    o = setup.oracle
    st0 = o.initial_state()
    x = st0[field]
    wz = getattr(o, wzname)
    want = o.diffusion(x, wz)

    pack = stc.make_wz_pack(jnp.asarray(wz), setup.st, stc.extend_lat_zero)
    got = stc.diffusion(jnp.asarray(x), jnp.asarray(wz), pack, setup.st,
                        setup.sf, setup.params.kappa)
    assert_close(got, want, rtol=3e-5, atol=1e-7, name=f"diffusion[{field}]")


@pytest.mark.parametrize("ityr", [0, 400])
@pytest.mark.parametrize("field,wzname", [("ta", "wz_air"), ("q", "wz_vapor")])
def test_advection(setup, ityr, field, wzname):
    o = setup.oracle
    st0 = o.initial_state()
    x = st0[field]
    wz = getattr(o, wzname)
    want = o.advection(x, wz, ityr)

    pack = stc.make_wz_pack(jnp.asarray(wz), setup.st, stc.extend_lat_zero)
    u_m, u_p, v_m, v_p = _winds(setup, ityr)
    got = stc.advection(jnp.asarray(x), pack, u_m, u_p, v_m, v_p,
                        setup.st, setup.sf)
    assert_close(got, want, rtol=3e-5, atol=1e-7, name=f"advection[{field}]")


@pytest.mark.parametrize("field,wzname,is_vap", [("ta", "wz_air", False),
                                                 ("q", "wz_vapor", True)])
def test_circulation_full_step(setup, field, wzname, is_vap):
    """24-substep circulation increment vs the oracle (src/greb.f90:528-553).

    For q the positivity clamp (src/greb.f90:715,907) is a knife-edge: at the
    polar rows where it activates, ulp-level differences flip it and the two
    float32 trajectories separate (the compiled Fortran does the same against
    itself at different optimisation levels).  Per-substep agreement is
    bitwise-tight (see test_advection/test_diffusion); here polar rows are
    checked loosely and the rest strictly."""
    o = setup.oracle
    ityr = 100
    st0 = o.initial_state()
    x = st0[field]
    wz = getattr(o, wzname)
    want = o.circulation(x, wz, is_vap, ityr)

    u_m, u_p, v_m, v_p = _winds(setup, ityr)
    got = np.asarray(stc.circulation(jnp.asarray(x), jnp.asarray(wz), u_m,
                                     u_p, v_m, v_p, setup.st, setup.sf,
                                     setup.params.kappa, setup.num.nsub_crcl))
    polar = np.asarray(setup.grid.polar_rows)
    atol = 1e-6 if is_vap else 1e-3
    assert_close(got[~polar], want[~polar], rtol=2e-4, atol=atol,
                 name=f"circ[{field}] non-polar")
    if is_vap:
        assert np.isfinite(got[polar]).all()
        assert np.abs(got[polar] - want[polar]).max() < 0.01
    else:
        assert_close(got[polar], want[polar], rtol=2e-4, atol=1e-2,
                     name=f"circ[{field}] polar")


def test_circulation_clamp_free_exact(setup):
    """With q scaled so the clamp never fires, all 24 substeps must track the
    oracle tightly on every row, polar sub-cycles included."""
    o = setup.oracle
    ityr = 100
    x = o.initial_state()["q"] + np.float32(0.05)   # keep q >> increments
    wz = o.wz_vapor
    want = o.circulation(x, wz, True, ityr)
    u_m, u_p, v_m, v_p = _winds(setup, ityr)
    got = stc.circulation(jnp.asarray(x), jnp.asarray(wz), u_m, u_p, v_m, v_p,
                          setup.st, setup.sf, setup.params.kappa,
                          setup.num.nsub_crcl)
    assert_close(got, want, rtol=5e-4, atol=2e-7, name="circ clamp-free")


def test_circulation_batched_matches_separate(setup):
    """Batching (Ta, q) along a leading axis must equal separate calls."""
    o = setup.oracle
    ityr = 55
    st0 = o.initial_state()
    u_m, u_p, v_m, v_p = _winds(setup, ityr)
    args = dict(u_m=u_m, u_p=u_p, v_m=v_m, v_p=v_p, st=setup.st, sf=setup.sf,
                kappa=setup.params.kappa, nsub=setup.num.nsub_crcl)
    ta = jnp.asarray(st0["ta"])
    q = jnp.asarray(st0["q"])
    wa = jnp.asarray(o.wz_air)
    wv = jnp.asarray(o.wz_vapor)
    sep_ta = stc.circulation(ta, wa, **args)
    sep_q = stc.circulation(q, wv, **args)
    x2 = jnp.stack([ta, q], axis=-3)
    wz2 = jnp.stack([wa, wv], axis=-3)
    both = stc.circulation(x2, wz2, **args)
    assert_close(both[0], sep_ta, rtol=1e-6, atol=1e-7)
    assert_close(both[1], sep_q, rtol=1e-6, atol=1e-9)


def test_diffusion_zero_field_is_zero(setup):
    z = jnp.zeros((setup.num.ydim, setup.num.xdim), jnp.float32)
    wz = jnp.asarray(setup.oracle.wz_air)
    pack = stc.make_wz_pack(wz, setup.st, stc.extend_lat_zero)
    out = stc.diffusion(z, wz, pack, setup.st, setup.sf, setup.params.kappa)
    assert not np.any(np.asarray(out))


def test_diffusion_conserves_uniform_field_interior(setup):
    """A uniform field with uniform wz has zero zonal diffusion everywhere
    and zero meridional diffusion in the interior."""
    c = jnp.full((setup.num.ydim, setup.num.xdim), 7.0, jnp.float32)
    wz = jnp.ones_like(c)
    pack = stc.make_wz_pack(wz, setup.st, stc.extend_lat_zero)
    out = np.asarray(stc.diffusion(c, wz, pack, setup.st, setup.sf,
                                   setup.params.kappa))
    assert np.abs(out[1:-1]).max() < 1e-4  # pole rows see the zero halo


def test_quirk_flag_changes_polar_advection(setup, forcing_np):
    """The jp2 quirk (src/greb.f90:881) must be reproduced when enabled and
    produce a (slightly) different field when disabled."""
    o = setup.oracle
    ityr = 0
    x = o.initial_state()["ta"]
    wz = o.wz_air
    u_m, u_p, v_m, v_p = _winds(setup, ityr)
    st_noq = stc.StencilStatic(
        xdim=setup.st.xdim, dyy=setup.st.dyy, dt_crcl=setup.st.dt_crcl,
        diff_max_iter=setup.st.diff_max_iter,
        adv_max_iter=setup.st.adv_max_iter, quirk_jp2=False)
    pack_q = stc.make_wz_pack(jnp.asarray(wz), setup.st, stc.extend_lat_zero)
    pack_n = stc.make_wz_pack(jnp.asarray(wz), st_noq, stc.extend_lat_zero)
    with_q = np.asarray(stc.advection(jnp.asarray(x), pack_q, u_m, u_p, v_m,
                                      v_p, setup.st, setup.sf))
    no_q = np.asarray(stc.advection(jnp.asarray(x), pack_n, u_m, u_p, v_m,
                                    v_p, st_noq, setup.sf))
    want = o.advection(x, wz, ityr)
    assert_close(with_q, want, rtol=3e-5, atol=1e-7)
    polar = np.asarray(setup.grid.polar_rows)
    assert np.any(with_q[polar] != no_q[polar])
    # non-polar rows identical
    np.testing.assert_array_equal(with_q[~polar], no_q[~polar])
