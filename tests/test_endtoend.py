"""End-to-end phase tests on a reduced configuration (48x24 grid, 10-day
year => 20 steps) so CPU CI stays fast.  Physics, phase logic and stencil
forms are identical to the default configuration — only grid size and number
of steps per year change (both are first-class parameters; SURVEY §7.6)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.config import (CO2Params, Diagnostics, Experiment, GrebConfig,
                             Numerics, PhysicsParams)
from greb_tpu.forcing import forcing_from_arrays
from greb_tpu.io.synthetic import make_synthetic_forcing
from greb_tpu.model.driver import GREB

SMALL = Numerics(xdim=48, ydim=24, ndays_yr=10, jday_mon=(6, 4),
                 time_flux=2, time_scnr=3)


@pytest.fixture(scope="module")
def small_forcing():
    return forcing_from_arrays(
        make_synthetic_forcing(SMALL.xdim, SMALL.ydim, SMALL.nstep_yr,
                               SMALL.ndays_yr))


@pytest.fixture(scope="module")
def model(small_forcing):
    cfg = GrebConfig(numerics=SMALL, co2=CO2Params(co2_ppm=(680.0,)),
                     diagnostics=Diagnostics(console=False))
    return GREB(cfg, forcing=small_forcing, verbose=False)


@pytest.fixture(scope="module")
def spinup(model):
    return model.flux_correction()


def test_flux_correction_pins_state(model, spinup):
    state, corr = spinup
    np.testing.assert_allclose(np.asarray(state.ts),
                               np.asarray(model.forcing.tclim[-1]),
                               rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(state.q),
                               np.asarray(model.forcing.qclim[-1]),
                               rtol=1e-3, atol=1e-7)
    assert np.isfinite(np.asarray(corr.tf)).all()
    assert np.isfinite(np.asarray(corr.qf)).all()
    # corrections have sane magnitudes (the compressed 10-day calendar makes
    # per-step climatology jumps ~35x the real ones, so the bound scales)
    assert np.abs(np.asarray(corr.tf)).max() < 1e5       # W/m^2
    assert np.abs(np.asarray(corr.qf)).max() < 0.05      # kg/kg per step


def test_control_scenario_stays_near_climatology(model, spinup):
    """Self-calibration: control run at the flux-correction CO2 stays near
    the forcing climatology (the reference's built-in verification)."""
    state_fc, corr = spinup
    co2 = np.full(4, 298.0, np.float32)
    state, monthly, diags = model.run_scenario(
        corr, years=4, co2_series=co2, cap_surf=state_fc.cap_surf)
    assert monthly.shape == (4, len(SMALL.jday_mon), 5, SMALL.ydim, SMALL.xdim)
    assert np.isfinite(monthly).all()
    t_clim = float(np.mean(np.asarray(model.forcing.tclim)))
    for diag in diags:
        # ~2 K slack: the compressed calendar amplifies the mismatch between
        # the spin-up trajectory and the restart-from-climatology trajectory
        assert abs(float(diag.global_mean_ts) - t_clim) < 2.0


def test_2xco2_warms(model, spinup):
    """Doubling CO2 must warm the planet (greenhouse response sanity)."""
    state_fc, corr = spinup
    co2_ctl = np.full(6, 298.0, np.float32)
    co2_2x = np.full(6, 680.0, np.float32)
    _, _, diag_ctl = model.run_scenario(corr, years=6, co2_series=co2_ctl,
                                        cap_surf=state_fc.cap_surf)
    _, _, diag_2x = model.run_scenario(corr, years=6, co2_series=co2_2x,
                                       cap_surf=state_fc.cap_surf)
    t_ctl = float(diag_ctl[-1].global_mean_ts)
    t_2x = float(diag_2x[-1].global_mean_ts)
    assert t_2x > t_ctl + 0.2, (t_ctl, t_2x)
    assert t_2x < t_ctl + 10.0  # and not absurdly


def test_q_stays_positive(model, spinup):
    state_fc, corr = spinup
    state, monthly, _ = model.run_scenario(
        corr, years=2, co2_series=np.full(2, 680.0, np.float32),
        cap_surf=state_fc.cap_surf)
    assert float(np.asarray(state.q).min()) > 0.0
    # monthly q means positive too
    assert monthly[:, :, 3].min() > 0.0


def test_output_file_roundtrip(model, spinup, tmp_path):
    """Reference-format output stream reads back exactly (binary parity with
    src/greb.f90:978-982 / R read_greb)."""
    from greb_tpu.io.binio import read_output
    state_fc, corr = spinup
    path = str(tmp_path / "scenario")
    _, monthly, _ = model.run_scenario(
        corr, years=2, co2_series=np.full(2, 680.0, np.float32),
        cap_surf=state_fc.cap_surf, output_path=path)
    back = read_output(path, SMALL.xdim, SMALL.ydim)
    want = monthly.reshape(-1, 5, SMALL.ydim, SMALL.xdim)
    np.testing.assert_array_equal(back, want)


def test_full_run_reference_workload(small_forcing, tmp_path):
    """The reference's default workload shape end-to-end via GREB.run():
    flux correction + scenario, output written, console diagnostics."""
    cfg = GrebConfig(
        numerics=SMALL,
        co2=CO2Params(co2_ppm=(680.0,)),
        diagnostics=Diagnostics(output_file=str(tmp_path / "scenario"),
                                console=False))
    m = GREB(cfg, forcing=small_forcing, verbose=False)
    state, corr, monthly, diags = m.run()
    assert monthly.shape[0] == SMALL.time_scnr
    assert os.path.exists(str(tmp_path / "scenario"))
    assert np.isfinite(monthly).all()


def test_legacy_control_file_mixed_layout(small_forcing, tmp_path):
    """The original variant writes 730 TF_correct records to the control
    unit, then the control run REWINDS to record 1 and overwrites the head
    with its monthly means WITHOUT truncating — TF records
    60*time_ctrl+1..730 survive in the tail (greb.original.model.f90:
    204-215, irec=0 reset at :211).  Verify both layers of the mixed
    layout read back (VERDICT r2 missing #2)."""
    from greb_tpu.__main__ import run_legacy
    from greb_tpu.io.binio import read_records

    num = Numerics(xdim=SMALL.xdim, ydim=SMALL.ydim, ndays_yr=10,
                   jday_mon=(6, 4), time_flux=1, time_ctrl=1, time_scnr=1)
    cfg = GrebConfig(numerics=num, co2=CO2Params(co2_ppm=(680.0,)),
                     diagnostics=Diagnostics(console=False),
                     experiment=Experiment(log_exp=10))
    m = GREB(cfg, forcing=small_forcing, verbose=False)
    out = str(tmp_path / "scenario")
    run_legacy(m, out, quiet=True)

    control = str(tmp_path / "control")
    nrec_monthly = len(num.jday_mon) * 5 * num.time_ctrl     # 10 here
    back = read_records(control, (num.ydim, num.xdim))
    # file length is the TF dump's (nstep_yr records), not the shorter
    # monthly stream — the tail survived the rewind
    assert back.shape[0] == num.nstep_yr

    # tail layer: TF_correct records nrec_monthly+1..nstep_yr, bit-exact
    state_fc, corr = m.flux_correction()          # deterministic re-run
    tf = np.asarray(corr.tf)
    np.testing.assert_array_equal(back[nrec_monthly:], tf[nrec_monthly:])

    # head layer: the control run's monthly means, bit-exact
    _, monthly, _ = m.run_scenario(
        corr, years=num.time_ctrl,
        co2_series=np.full(num.time_ctrl, m.exp.co2_ctrl, np.float32),
        state=state_fc)
    want = np.asarray(monthly).reshape(-1, num.ydim, num.xdim)
    np.testing.assert_array_equal(back[:nrec_monthly], want)
    # and the head is genuinely the overwrite, not the dump
    assert not np.array_equal(back[:nrec_monthly], tf[:nrec_monthly])


def test_cli_ensemble_per_member_outputs(small_forcing, tmp_path):
    """--ensemble M: batched perturbed-physics members write per-member
    output streams (the reference's ens_id convention, src/greb.f90:
    1064-1068), members genuinely differ, and the --mxu-precision knob
    selects the circulation matmul precision (VERDICT r3 task 9)."""
    import argparse

    from greb_tpu.__main__ import run_ensemble
    from greb_tpu.io.binio import read_output

    num = Numerics(xdim=SMALL.xdim, ydim=SMALL.ydim, ndays_yr=10,
                   jday_mon=(6, 4), time_flux=1, time_scnr=2)
    cfg = GrebConfig(numerics=num, co2=CO2Params(co2_ppm=(680.0,)),
                     diagnostics=Diagnostics(console=False),
                     fast_circulation=True)
    m = GREB(cfg, forcing=small_forcing, verbose=False)
    out = str(tmp_path / "ens")
    for prec in ("high", "highest"):
        args = argparse.Namespace(ensemble=3, perturb="ct_sens=21.0:24.0",
                                  mxu_precision=prec, quiet=True)
        run_ensemble(m, out, args)
        backs = [read_output(f"{out}_{i:03d}", num.xdim, num.ydim)
                 for i in (1, 2, 3)]
        for b in backs:
            assert b.shape == (num.time_scnr * 2, 5, num.ydim, num.xdim)
            assert np.isfinite(b).all()
        assert not np.array_equal(backs[0], backs[2])    # perturbed members
    # --shared-spinup: one base-params spin-up shared by all members
    # (perturbed-physics-ensemble setup; unlocks M>=512, PERF.md) — members
    # still diverge through their perturbed scenario physics
    args = argparse.Namespace(ensemble=3, perturb="ct_sens=21.0:24.0",
                              mxu_precision="high", quiet=True,
                              shared_spinup=True)
    run_ensemble(m, out, args)
    backs = [read_output(f"{out}_{i:03d}", num.xdim, num.ydim)
             for i in (1, 2, 3)]
    for b in backs:
        assert np.isfinite(b).all()
    assert not np.array_equal(backs[0], backs[2])
    # bad specs fail with guidance, not tracebacks
    with pytest.raises(SystemExit, match="perturb"):
        run_ensemble(m, out, argparse.Namespace(
            ensemble=2, perturb="ct_sens", mxu_precision="high", quiet=True))
    with pytest.raises(SystemExit, match="transport"):
        run_ensemble(m, out, argparse.Namespace(
            ensemble=2, perturb="kappa=7e5:9e5", mxu_precision="high",
            quiet=True))
