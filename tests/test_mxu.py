"""MXU ensemble-path parity (VERDICT r2 weak #5).

The production config-3 path runs the zonal applies as row-batched MXU
matmuls (ops/fastcirc2.build_mxu / mxu_circulation) — the matrices are
exact densifications of the 7-band coefficients, so with precision
"highest" (exact f32) results differ from the VPU fold only by matmul
contraction order, and with the production default "high" (bf16_3x) by a
documented ~2^-21 relative error per apply.  This pins both against the
vmap/VPU runner (itself oracle-anchored by tests/test_step.py and the
golden year) over a FULL 730-step year of flux correction + scenario.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
from greb_tpu.ops import fastcirc2 as fc2
from greb_tpu.parallel import ensemble as ens

CO2 = jnp.float32(680.0)
M = 2


@pytest.fixture(scope="module")
def mxu_setup():
    num = Numerics(time_flux=1, time_scnr=1)       # full 730-step years
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    perturb = {"ct_sens": np.float32(22.5)
               * (1.0 + 0.02 * np.linspace(-1, 1, M, dtype=np.float32))}
    pb = ens.perturbed_params(m.params, perturb)
    state_b = ens.ensemble_initial_state(
        pb, m.forcing, ens.ensemble_data(pb, m.forcing, m.sf))
    # reference: the vmap/VPU-fold ensemble runner
    md_v = ens.ensemble_data(pb, m.forcing, m.sf)
    flux_v, scnr_v = ens.make_ensemble_runners(m.st, m.num, m.exp,
                                               m.month_mat, fast_plan=plan)
    sv, corr_v = flux_v(state_b, m.sfx, CO2, md_v, (const,))
    sv2, mon_v, _ = scnr_v(sv, m.sfx, corr_v, CO2, md_v, (const,))
    md_b = ens.batched_model_data(pb, m.forcing, m.sf)
    return m, plan, const, pb, state_b, md_b, corr_v, sv2, mon_v


def _run_mxu(mxu_setup, precision):
    m, plan, const, pb, state_b, md_b, corr_v, sv2, mon_v = mxu_setup
    mxu = fc2.build_mxu(const, plan, precision=precision)
    flux_b, scnr_b = ens.make_batched_ensemble_runners(
        m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
    sb, corr_b = flux_b(state_b, m.sfx, CO2, md_b, (const, mxu))
    sb2, mon_b, _ = scnr_b(sb, m.sfx, corr_b, CO2, md_b, (const, mxu))
    d_tf = np.abs(np.asarray(corr_b.tf).transpose(1, 0, 2, 3)
                  - np.asarray(corr_v.tf)).max()
    dm = np.abs(np.asarray(mon_b) - np.asarray(mon_v))
    d_mon = dm.max()
    rms_mon = float(np.sqrt((dm.astype(np.float64) ** 2).mean()))
    d_ts = np.abs(np.asarray(sb2.ts) - np.asarray(sv2.ts)).max()
    return d_tf, d_mon, d_ts, rms_mon


def test_mxu_highest_matches_vpu_fold(mxu_setup):
    """Exact-f32 MXU vs VPU fold: differences are matmul contraction order
    only — sub-millikelvin after a full year."""
    d_tf, d_mon, d_ts, _ = _run_mxu(mxu_setup, "highest")
    assert d_ts < 5e-3, d_ts                     # K, end-of-year state
    assert d_mon < 5e-3, d_mon                   # monthly means (mixed units)
    assert d_tf < 5.0, d_tf                      # W/m^2 (cap_surf/dt scale:
    #                                              ~1e4 x the K-scale diff)


def test_mxu_high_error_budget(mxu_setup):
    """Production precision ("high"): the documented error budget vs the
    VPU fold over a full year.  The BULK bound (monthly RMS) is tight on
    every platform; the max-abs bound is platform-aware: on real TPUs HIGH
    runs 3-pass HARDWARE bf16 whose rounding differs from the CPU
    emulation, and a ~2^-21 per-apply perturbation routed through the
    ice-albedo/sea-ice thresholds can flip a knife-edge cell for a month
    (measured 0.17 K max, RMS 3 orders smaller, on v5e — round 5, first
    time this lane ran on real hardware)."""
    import jax
    d_tf, d_mon, d_ts, rms_mon = _run_mxu(mxu_setup, "high")
    assert d_ts < 5e-2, d_ts
    assert rms_mon < 5e-3, rms_mon               # bulk agreement, all platforms
    on_tpu = jax.devices()[0].platform != "cpu"
    assert d_mon < (0.5 if on_tpu else 5e-2), d_mon
    assert d_tf < 50.0, d_tf


def test_mxu_densification_is_exact():
    """The dense row matrices reproduce the banded coefficients exactly:
    applying zd_mat to one-hot vectors recovers zd bit-for-bit, and the
    advection densification (exact one-hot shift tensors) matches
    step_coeffs output."""
    num = Numerics(ndays_yr=10, jday_mon=(6, 4), time_flux=1, time_scnr=1)
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    mxu = fc2.build_mxu(const, plan)
    zd = np.asarray(const.zd)                    # (7, F, Y, X)
    zmat = np.asarray(mxu.zd_mat)                # (F, Y, X, X)
    _, F, Y, X = zd.shape
    from greb_tpu.ops.fastcirc import _LON_IDX_SHIFT
    jout = np.arange(X)
    np.testing.assert_array_equal(zmat[:, :, jout, jout], zd[3])
    for i, s in _LON_IDX_SHIFT:
        np.testing.assert_array_equal(zmat[:, :, (jout - s) % X, jout],
                                      zd[i])
    cf = fc2.step_coeffs(m.forcing.uclim[0], m.forcing.vclim[0], const, plan)
    za_mat = np.asarray(fc2.adv_matrix(cf.za, mxu))
    za = np.asarray(cf.za)
    np.testing.assert_array_equal(za_mat[:, :, jout, jout], za[3])
    for i, s in _LON_IDX_SHIFT:
        np.testing.assert_array_equal(za_mat[:, :, (jout - s) % X, jout],
                                      za[i])


def test_mxu_fused_error_budget(mxu_setup):
    """Fused interior apply (zc = wz*zd + za pre-folded into ONE per-row
    matrix): the coefficient pre-fold rounds before the cancellation-heavy
    stencil sum, so the increment carries ~1e-4 relative error per substep
    — same class as the production bf16_3x budget.  Pinned over a full
    year vs the VPU fold."""
    m, plan, const, pb, state_b, md_b, corr_v, sv2, mon_v = mxu_setup
    mxu = fc2.build_mxu(const, plan, precision="highest", mode="fused")
    flux_b, scnr_b = ens.make_batched_ensemble_runners(
        m.st, m.num, m.exp, m.month_mat, fast_plan=plan)
    sb, corr_b = flux_b(state_b, m.sfx, CO2, md_b, (const, mxu))
    sb2, mon_b, _ = scnr_b(sb, m.sfx, corr_b, CO2, md_b, (const, mxu))
    d_mon = np.abs(np.asarray(mon_b) - np.asarray(mon_v)).max()
    d_ts = np.abs(np.asarray(sb2.ts) - np.asarray(sv2.ts)).max()
    assert d_ts < 1e-1, d_ts
    assert d_mon < 1e-1, d_mon
    assert np.isfinite(np.asarray(sb2.ts)).all()


def test_mxu_fused_single_step_parity():
    """24-substep circulation: fused vs unfused MXU vs VPU fold on a
    member batch — tight bound, one step (no year-scale accumulation)."""
    import jax.numpy as jnp
    num = Numerics(ndays_yr=10, jday_mon=(6, 4), time_flux=1, time_scnr=1)
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    mxu_u = fc2.build_mxu(const, plan, precision="highest")
    mxu_f = fc2.build_mxu(const, plan, precision="highest", mode="fused")
    s0 = m.initial_state()
    x = jnp.stack([jnp.stack([s0.ta + 0.1 * i, s0.q * (1 + 0.01 * i)])
                   for i in range(3)])
    cf = fc2.step_coeffs(m.forcing.uclim[0], m.forcing.vclim[0], const, plan)
    d_u = fc2.mxu_circulation(x, cf, const, mxu_u, plan, nsub=24)
    d_f = fc2.mxu_circulation(x, cf, const, mxu_f, plan, nsub=24)
    d_v = fc2.circulation(x, cf, const, plan, nsub=24)
    # ta increments O(6 K), q increments O(2e-3): bound per field
    assert float(jnp.abs(d_f[:, 0] - d_u[:, 0]).max()) < 5e-3
    assert float(jnp.abs(d_f[:, 0] - d_v[:, 0]).max()) < 5e-3
    assert float(jnp.abs(d_f[:, 1] - d_u[:, 1]).max()) < 5e-6
    assert float(jnp.abs(d_f[:, 1] - d_v[:, 1]).max()) < 5e-6


def test_mxu_stacked_bit_identical():
    """mode="stacked" concatenates the two matrices along the output dim —
    each output column's dot is unchanged, so results are BIT-identical to
    mode="pair" at the same precision."""
    import jax.numpy as jnp
    num = Numerics(ndays_yr=10, jday_mon=(6, 4), time_flux=1, time_scnr=1)
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    mxu_p = fc2.build_mxu(const, plan, precision="highest")
    mxu_s = fc2.build_mxu(const, plan, precision="highest", mode="stacked")
    s0 = m.initial_state()
    x = jnp.stack([jnp.stack([s0.ta + 0.1 * i, s0.q * (1 + 0.01 * i)])
                   for i in range(3)])
    cf = fc2.step_coeffs(m.forcing.uclim[0], m.forcing.vclim[0], const, plan)
    d_p = fc2.mxu_circulation(x, cf, const, mxu_p, plan, nsub=24)
    d_s = fc2.mxu_circulation(x, cf, const, mxu_s, plan, nsub=24)
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_s))


def test_mxu_members_circulation_parity():
    """The in-kernel member-batched formulation (fastcirc2.MxuMembers;
    round-5 member kernel) matches mxu_circulation on the same (MB,2,Y,X)
    batch: "highest" to f32 contraction-order noise, "bf16_3x" within the
    documented HIGH error budget."""
    import jax

    num = Numerics(time_flux=0, time_scnr=0)
    m = GREB(GrebConfig(numerics=num, fast_circulation=True), verbose=False)
    plan, (const,) = m._fastcirc_split()
    rng = np.random.default_rng(7)
    MB, Y, X = 4, num.ydim, num.xdim
    x2 = jnp.asarray(280.0 + 10 * rng.standard_normal((MB, 2, Y, X)),
                     jnp.float32)
    u = jnp.asarray(m.forcing.uclim[0], jnp.float32)
    v = jnp.asarray(m.forcing.vclim[0], jnp.float32)
    cf = fc2.step_coeffs(u, v, const, plan)
    nsub = num.nsub_crcl

    mxu_ref = fc2.build_mxu(const, plan, precision="highest", mode="stacked")
    want = np.asarray(fc2.mxu_circulation(x2, cf, const, mxu_ref, plan,
                                          nsub, unroll=True))
    # bf16_3x tolerance is for RANDOM (maximally rough) fields over 24
    # substeps; real climate fields are far smoother (cf. the full-year
    # "high" budget of 5e-2 in test_mxu_high_error_budget)
    for prec, tol in (("highest", 2e-4), ("bf16_3x", 5e-2)):
        mm = fc2.build_mxu_members(const, plan, precision=prec)
        got = np.asarray(fc2.mxu_members_circulation(
            x2, cf, const, mm, plan, nsub, unroll=True))
        d = np.abs(got - want).max()
        assert d < tol, (prec, d)
