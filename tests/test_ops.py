"""Unit tests: pointwise physics ops vs. the literal NumPy oracle."""
import numpy as np
import pytest

from greb_tpu.ops import pointwise as pw
from tests.conftest import assert_close

ITYRS = [0, 181, 364, 729]  # winter/summer/odd steps incl. wraparound


@pytest.mark.parametrize("ityr", ITYRS)
def test_shortwave(setup, ityr):
    st = setup.oracle.initial_state()
    sw_o, alb_o = setup.oracle.sw_radiation(st["ts"], ityr)
    fx = setup.fx(ityr)
    res = pw.shortwave(setup.state0().ts, fx.cld, fx.sw_solar,
                       setup.md.z_topo, setup.md.glacier, setup.params)
    assert_close(res.sw, sw_o, name="sw")
    assert_close(res.albedo, alb_o, name="albedo")


def test_shortwave_albedo_ramp_bounds(setup):
    """Property: albedo within [a_no_ice*(1-a_atm)+a_atm, ...+da_ice]."""
    fx = setup.fx(0)
    p = setup.params
    for t_off in (-40.0, -5.0, 0.0, 30.0):
        ts = setup.state0().ts + np.float32(t_off)
        res = pw.shortwave(ts, fx.cld, fx.sw_solar, setup.md.z_topo,
                           setup.md.glacier, p)
        a = np.asarray(res.albedo)
        lo = float(p.a_no_ice)
        hi = float(p.a_no_ice + p.da_ice)
        amin = lo + np.asarray(fx.cld * p.a_cloud) * (1 - lo)
        amax = hi + np.asarray(fx.cld * p.a_cloud) * (1 - hi)
        assert (a >= amin - 1e-6).all() and (a <= amax + 1e-6).all()


@pytest.mark.parametrize("ityr", ITYRS)
def test_longwave(setup, ityr):
    st = setup.oracle.initial_state()
    co2 = 340.0
    lw_o, up_o, dn_o, em_o = setup.oracle.lw_radiation(
        st["ts"], st["ta"], st["q"], co2, ityr)
    fx = setup.fx(ityr)
    s0 = setup.state0()
    res = pw.longwave(s0.ts, s0.ta, s0.q, np.float32(co2), fx.cld, fx.tclim,
                      fx.qclim, setup.md.z_topo, setup.derived.wz_air,
                      setup.params)
    assert_close(res.lw_surf, lw_o, name="lw_surf")
    assert_close(res.lwair_down, dn_o, name="lwair_down")
    assert_close(res.em, em_o, name="em")


@pytest.mark.parametrize("ityr", ITYRS)
def test_hydrology(setup, ityr):
    st = setup.oracle.initial_state()
    ql_o, qla_o, de_o, dr_o = setup.oracle.hydro(st["ts"], st["q"], ityr)
    fx = setup.fx(ityr)
    s0 = setup.state0()
    res = pw.hydrology(s0.ts, s0.q, fx.u, fx.v, fx.swet, setup.md.z_topo,
                       setup.derived.wz_air, setup.params)
    assert_close(res.q_lat, ql_o, name="q_lat", atol=1e-3)
    assert_close(res.q_lat_air, qla_o, name="q_lat_air", atol=1e-3)
    assert_close(res.dq_eva, de_o, name="dq_eva", atol=1e-12)
    assert_close(res.dq_rain, dr_o, name="dq_rain", atol=1e-12)


@pytest.mark.parametrize("ityr", ITYRS)
def test_seaice(setup, ityr):
    oracle = setup.oracle
    st = oracle.initial_state()
    # perturb Ts so all three ramp branches are exercised
    wav = np.sin(np.linspace(0, 9, st["ts"].size)).astype(np.float32)
    ts = st["ts"] + np.float32(-8.0) * wav.reshape(st["ts"].shape)
    cap_before = oracle.cap_surf.copy()
    oracle.seaice(ts, ityr)
    cap_o = oracle.cap_surf.copy()
    oracle.cap_surf = cap_before.copy()  # restore oracle module state

    fx = setup.fx(ityr)
    cap_j = pw.seaice_capacity(ts, cap_before, fx.mld, setup.md.z_topo,
                               setup.md.glacier, setup.derived, setup.params)
    assert_close(cap_j, cap_o, name="cap_surf")


@pytest.mark.parametrize("ityr", [0, 1, 364, 729])
def test_deep_ocean(setup, ityr):
    st = setup.oracle.initial_state()
    dto_surf_o, dto_deep_o = setup.oracle.deep_ocean(st["ts"], st["to"], ityr)
    fx = setup.fx(ityr)
    s0 = setup.state0()
    res = pw.deep_ocean(s0.ts, s0.to, fx.mld, fx.mld_prev, setup.md.z_topo,
                        np.float32(setup.num.dt), setup.derived, setup.params)
    assert_close(res.dt_ocean, dto_surf_o, name="dt_ocean", atol=1e-7)
    assert_close(res.dto, dto_deep_o, name="dto", atol=1e-7)


def test_sensible(setup):
    s0 = setup.state0()
    st = setup.oracle.initial_state()
    q_o = setup.oracle.p.ct_sens * (st["ta"] - st["ts"])
    assert_close(pw.sensible_heat(s0.ts, s0.ta, setup.params), q_o)
