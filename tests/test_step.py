"""Step-level tests: scenario + flux-correction steps vs the oracle, and
multi-step scan consistency."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.forcing import Corrections, ModelState
from greb_tpu.model import core
from tests.conftest import assert_close

F32 = np.float32


def _state_pair(setup):
    o = setup.oracle
    st_o = o.initial_state()
    st_j = setup.state0()
    return st_o, st_j


def _all_rows(setup):
    """All 48 rows INCLUDED, poles too (VERDICT r2 #8): step-level parity
    vs the oracle holds on the sub-cycled polar rows as well (measured
    single-step max |dTa| ~ 6e-5 K, five-step ~ similar — well inside the
    tolerances); the historical polar mask predated the masked-stencil
    rework and the golden year."""
    return np.ones(setup.grid.ydim, bool)


def test_scenario_step_matches_oracle(setup):
    o = setup.oracle
    st_o, st_j = _state_pair(setup)
    corr_o = o.zero_corrections()
    co2 = 340.0
    ityr = 0
    new_o, _ = o.scenario_step(st_o, co2, ityr, corr_o)
    cap_o = o.cap_surf.copy()

    fx = setup.fx(ityr)
    corr_t = (jnp.zeros_like(st_j.ts),) * 3
    new_j, out = core.scenario_step(st_j, fx, corr_t, jnp.float32(co2),
                                    setup.md, setup.st, setup.num, setup.exp)
    m = _all_rows(setup)
    assert_close(np.asarray(new_j.ts)[m], new_o["ts"][m], rtol=1e-5, atol=2e-3,
                 name="ts")
    assert_close(np.asarray(new_j.ta)[m], new_o["ta"][m], rtol=1e-5, atol=2e-3,
                 name="ta")
    assert_close(new_j.to, new_o["to"], rtol=1e-5, atol=1e-3, name="to")
    assert_close(np.asarray(new_j.q)[m], new_o["q"][m], rtol=1e-4, atol=1e-7,
                 name="q")
    assert_close(np.asarray(new_j.cap_surf)[m], cap_o[m], rtol=1e-5, atol=1.0,
                 name="cap_surf")


def test_fluxcorr_step_matches_oracle(setup):
    o = setup.oracle
    st_o, st_j = _state_pair(setup)
    corr_o = o.zero_corrections()
    co2 = 298.0
    ityr = 0
    new_o = o.fluxcorr_step(st_o, co2, ityr, corr_o)

    fx = setup.fx(ityr)
    new_j, (tf, tof, qf) = core.fluxcorr_step(st_j, fx, jnp.float32(co2),
                                              setup.md, setup.st, setup.num,
                                              setup.exp)
    m = _all_rows(setup)
    # corrected state is pinned to climatology: both must satisfy that
    assert_close(new_j.ts, o.tclim[ityr], rtol=1e-5, atol=1e-3, name="ts pin")
    assert_close(new_j.to, o.toclim, rtol=1e-6, atol=1e-4, name="to pin")
    assert_close(new_j.q, o.qclim[ityr], rtol=1e-4, atol=1e-8, name="q pin")
    assert_close(np.asarray(tf)[m], corr_o["tf"][ityr][m], rtol=2e-4, atol=2.0,
                 name="tf")
    assert_close(np.asarray(tof)[m], corr_o["tof"][ityr][m], rtol=2e-4,
                 atol=1e-4, name="tof")
    assert_close(np.asarray(qf)[m], corr_o["qf"][ityr][m], rtol=2e-3,
                 atol=5e-7, name="qf")
    assert_close(np.asarray(new_j.ta)[m], new_o["ta"][m], rtol=1e-5, atol=2e-3,
                 name="ta")


def test_multistep_fluxcorr_tracks_oracle(setup):
    """5 sequential flux-correction steps stay close to the oracle trajectory
    (this is the mode the reference actually runs from a cold start; an
    uncorrected scenario from climatology is physically unstable — runaway
    ice-albedo feedback — in the reference too)."""
    o = setup.oracle
    st_o, st_j = _state_pair(setup)
    corr_o = o.zero_corrections()
    co2 = 298.0
    nsteps = 5

    for ityr in range(nsteps):
        st_o = o.fluxcorr_step(st_o, co2, ityr, corr_o)
    cap_o = o.cap_surf.copy()

    def body(s, fx):
        return core.fluxcorr_step(s, fx, jnp.float32(co2), setup.md, setup.st,
                                  setup.num, setup.exp)

    sfx5 = jax.tree.map(lambda a: a[:nsteps], setup.sfx)
    st_j, (tf, tof, qf) = jax.lax.scan(body, st_j, sfx5)

    m = _all_rows(setup)
    assert_close(np.asarray(st_j.ts)[m], st_o["ts"][m], rtol=1e-5, atol=2e-3,
                 name="ts 5-step")
    assert_close(np.asarray(st_j.ta)[m], st_o["ta"][m], rtol=1e-5, atol=5e-3,
                 name="ta 5-step")
    assert_close(np.asarray(st_j.to), st_o["to"], rtol=1e-5, atol=1e-3,
                 name="to 5-step")
    assert_close(np.asarray(st_j.cap_surf)[m], cap_o[m], rtol=1e-4, atol=10.0,
                 name="cap 5-step")
    assert_close(np.asarray(tf[-1])[m], corr_o["tf"][nsteps - 1][m],
                 rtol=1e-3, atol=2.0, name="tf 5-step")
    assert_close(np.asarray(qf[-1])[m], corr_o["qf"][nsteps - 1][m],
                 rtol=1e-3, atol=5e-6, name="qf 5-step")


def test_scenario_step_jit_and_vmap(setup):
    """The step must be jittable and vmappable (ensemble axis)."""
    st = setup.state0()
    fx = setup.fx(3)
    corr_t = (jnp.zeros_like(st.ts),) * 3

    f = jax.jit(lambda s, fx, c: core.scenario_step(
        s, fx, corr_t, c, setup.md, setup.st, setup.num, setup.exp))
    new1, _ = f(st, fx, jnp.float32(340.0))

    batched = jax.tree.map(lambda a: jnp.stack([a, a + 0.01]), st)
    vf = jax.vmap(lambda s: core.scenario_step(
        s, fx, corr_t, jnp.float32(340.0), setup.md, setup.st, setup.num,
        setup.exp))
    new2, _ = vf(batched)
    assert new2.ts.shape == (2, setup.num.ydim, setup.num.xdim)
    assert_close(new2.ts[0], new1.ts, rtol=1e-6, atol=1e-6)
