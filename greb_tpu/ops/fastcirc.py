"""Coefficient-folded fast circulation path.

The strict stencil path (ops/stencils.py) evaluates the reference formulas
term-by-term each substep: at 96x48 a year spends ~35k substeps whose cost is
pure VPU issue — ~3000 vector-register ops per substep, dominated by the
masked polar sub-cycle.  But the circulation operator is LINEAR in the
transported field (reference src/greb.f90:556-915): every stencil
(7-point zonal diffusion :617-626, 2-point upwind advection :798-836,
meridional forms :585-590/:756-795, and the polar row stencils
:651-718/:842-906) has coefficients built only from time-constant geometry
(dxlat, kappa, wz) and the per-``ityr`` wind climatology.

This module therefore FOLDS each substep into

    x += sum_s C_s(ityr) * shift(x, s)          (11 shifts: lon +-1..3, lat +-1..2)
       + polar-band fix-up                       (clamped row iterations)

with the C_s precomputed per forcing step (730 tables, ~0.5 GB HBM,
~0.5 MB streamed per step).  The wz topography factor, the 10/4/1 stencil
weights, the /3 and /20 normalizations, the upwind sign splits and the
row-dependent cc coefficients are all baked into C_s, so a substep is
~11 fused multiply-adds over the field instead of ~150 elementwise ops.

Exactness: the folding is an algebraic regrouping of the reference float32
formulas (coefficients are accumulated in float64, cast to float32), so
results match the strict path to float32 rounding — the positivity clamps of
the polar sub-cycles (src/greb.f90:715, :907), which are the ONLY
nonlinearities, are kept exactly: the polar bands still iterate, on
statically-compacted row groups (rows needing k iterations form
prefixes/suffixes of the bands because dxlat shrinks monotonically toward
the poles, so every iteration level is a static slice — Pallas-safe).

Not supported here (falls back to the strict path): legacy experiment
overrides of the transport (Experiment.circulation_off etc.), per-member
perturbation of transport parameters (kappa, z_air, z_vapor, u/v winds)
under vmap, and latitude-sharded execution (the band compaction needs the
full lat extent; sharded runners keep the strict masked form).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..grid import Grid
from . import stencils as stc

F32 = np.float32
F64 = np.float64

# lon shift order used by all packed 7-coefficient arrays
# (index: 0=m3, 1=m2, 2=m1, 3=centre, 4=p1, 5=p2, 6=p3)
_LON_IDX_SHIFT = ((0, 3), (1, 2), (2, 1), (4, -1), (5, -2), (6, -3))


@dataclass(frozen=True)
class FastPlan:
    """Static structure of the fast path (python ints/tuples only)."""
    ydim: int
    xdim: int
    bt: int                      # top polar band rows [0, bt)
    bb: int                      # bottom polar band rows [Y-bb, Y)
    # extra iteration segments after the level-0 band iteration:
    # (rows_from_top_of_band, rows_from_bottom_of_band, n_iterations)
    diff_segs: Tuple[Tuple[int, int, int], ...]
    adv_segs: Tuple[Tuple[int, int, int], ...]
    # diffusion extra iterations as a precomputed composite row operator
    # (one plain 2-D block matmul instead of a chain of clamped iterations);
    # see build_tables.  Falls back to explicit iterations when False.
    diff_composite: bool = True
    # band rows actually iterating beyond level 0 (prefix of the top band /
    # suffix of the bottom band) — the composite operator covers only these
    comp_kt: int = 0
    comp_kb: int = 0

    @property
    def nband(self) -> int:
        return self.bt + self.bb


@struct.dataclass
class FastConst:
    """Time-constant device arrays (stay resident in VMEM in kernels)."""
    pdc: jax.Array      # (7, F, B, X) polar diffusion row-stencil coefficients
    wz_band: jax.Array  # (F, B, X) wz on the bands (outer factor of dtx_diff)
    # composite of the diffusion extra iterations: per-row (X, X) operators
    # P_fk = (I + C_fk)^(time2 - 1) for the comp_kt top-prefix + comp_kb
    # bottom-suffix band rows, shape (F, Kt+Kb, X, X)
    pcomp: jax.Array


@struct.dataclass
class FastCoeffs:
    """Per-step coefficient tables. Leaves carry a leading t axis when
    stacked (the xs of a year scan / streamed blocks of the year kernel)."""
    zc: jax.Array   # (6, F, Y, X) lon-shift coefficients [m3,m2,m1,p1,p2,p3]
    c0: jax.Array   # (F, Y, X)    centre coefficient (all centre terms)
    mc: jax.Array   # (4, F, Y, X) lat-shift coefficients [km2,km1,kp1,kp2]
    pac: jax.Array  # (7, F, B, X) polar advection coefficients (centre at 3)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------
def _segments(time2_band_top: np.ndarray, time2_band_bot: np.ndarray):
    """Extra-iteration segments after the uniform level-0 iteration.

    Rows with time2=k iterate k-1 more times; since time2 is monotone
    non-increasing away from each pole, rows with time2 >= v form a prefix
    of the top band / suffix of the bottom band."""
    vals = sorted(set(np.concatenate([time2_band_top, time2_band_bot]).tolist()))
    segs = []
    prev = 1
    for v in vals:
        if v <= 1:
            continue
        kt = int((time2_band_top >= v).sum())
        kb = int((time2_band_bot >= v).sum())
        # monotonicity guarantee (prefix/suffix form)
        assert (time2_band_top[:kt] >= v).all() and (time2_band_top[kt:] < v).all()
        assert (time2_band_bot[len(time2_band_bot) - kb:] >= v).all()
        segs.append((kt, kb, int(v - prev)))
        prev = v
    return tuple(segs)


def make_plan(grid: Grid) -> FastPlan:
    polar = np.asarray(grid.polar_rows, bool)
    R = grid.ydim
    if polar.any():
        bt = int(np.argmin(polar)) if not polar.all() else R
        bb = int(np.argmin(polar[::-1])) if not polar.all() else 0
        ok = (polar[:bt].all() and polar[R - bb:].all()
              and not polar[bt:R - bb].any())
        if not ok:
            raise ValueError("fast path requires contiguous polar bands")
    else:
        bt = bb = 0
    d2, a2 = grid.diff_sched.time2, grid.adv_sched.time2
    top = slice(0, bt)
    bot = slice(R - bb, R)
    diff_segs = _segments(d2[top], d2[bot]) if bt + bb else ()
    comp_kt = int((d2[top] > 1).sum())
    comp_kb = int((d2[bot] > 1).sum())
    # composite matrices cost (X, G*X) with G = 2*(comp_kt+comp_kb); worth it
    # while the stack fits comfortably in VMEM (16 MB/core)
    comp_bytes = grid.xdim * 2 * (comp_kt + comp_kb) * grid.xdim * 4
    return FastPlan(
        ydim=R, xdim=grid.xdim, bt=bt, bb=bb,
        diff_segs=diff_segs,
        adv_segs=_segments(a2[top], a2[bot]) if bt + bb else (),
        diff_composite=bool(diff_segs) and comp_bytes <= 4 * 2 ** 20,
        comp_kt=comp_kt, comp_kb=comp_kb,
    )


def _np_lon_shifts(a: np.ndarray):
    """dict s -> a rolled so that result[j] = a[j+s] (s>0 looks east).
    Matches stencils.lon_shifts: m1 = roll(+1) = value at j-1."""
    r = lambda s: np.roll(a, s, axis=-1)
    return {"m3": r(3), "m2": r(2), "m1": r(1), "c": a,
            "p1": r(-1), "p2": r(-2), "p3": r(-3)}


def _np_lat_shift(a: np.ndarray, s: int) -> np.ndarray:
    """Zero-halo lat shift: result[..., k, :] = a[..., k+s, :] (0 outside).
    s=-1 gives the value at the row equatorward... strictly: km1 (k-1)."""
    out = np.zeros_like(a)
    if s > 0:
        out[..., :-s, :] = a[..., s:, :]
    elif s < 0:
        out[..., -s:, :] = a[..., :s, :]
    else:
        out = a.copy()
    return out


def build_tables(u: np.ndarray, v: np.ndarray, wz_air: np.ndarray,
                 wz_vapor: np.ndarray, grid: Grid, st: stc.StencilStatic,
                 kappa: float, plan: Optional[FastPlan] = None,
                 include_advection: bool = True,
                 ) -> Tuple[FastPlan, FastConst, FastCoeffs]:
    """Precompute the folded coefficient tables for all forcing steps.

    u, v: (T, Y, X) wind climatologies; wz_*: (Y, X).
    Returns device arrays with a leading T axis on FastCoeffs leaves.
    ``include_advection=False`` zeroes all advective coefficients (legacy
    log_exp 8 vapor-diffusion-only is handled by the caller per-field; the
    modern model never uses it here).
    """
    if plan is None:
        plan = make_plan(grid)
    T = u.shape[0]
    Y, X = plan.ydim, plan.xdim
    wz2 = np.stack([np.asarray(wz_air, F64), np.asarray(wz_vapor, F64)])  # (F,Y,X)
    F = wz2.shape[0]
    u = np.asarray(u, F64)
    v = np.asarray(v, F64)
    u_m = np.maximum(u, 0.0)[:, None]          # (T,1,Y,X)
    u_p = np.minimum(u, 0.0)[:, None]
    v_m = np.maximum(v, 0.0)[:, None]
    v_p = np.minimum(v, 0.0)[:, None]

    w = _np_lon_shifts(wz2)                    # (F,Y,X) each
    col = lambda a: np.asarray(a, F64).reshape(Y, 1)
    dtc = F64(F32(st.dt_crcl))
    kap = F64(F32(kappa))
    dyy = F64(F32(st.dyy))
    polar = np.asarray(grid.polar_rows, bool).reshape(Y, 1)
    mid = (~polar).astype(F64)

    # --- zonal diffusion (mid rows), cc = kappa*dtc/dxlat^2, x outer wz ----
    cc = kap * dtc / col(grid.dxlat.astype(F64) ** 2) / 20.0    # (Y,1)
    ccm = cc * mid
    zdc = np.stack([
        ccm * w["m3"],
        ccm * (3.0 * w["m2"] - w["m3"]),
        ccm * (6.0 * w["m1"] - 3.0 * w["m2"]),
        ccm * (6.0 * w["p1"] - 3.0 * w["p2"]),
        ccm * (3.0 * w["p2"] - w["p3"]),
        ccm * w["p3"],
    ]) * wz2                                                    # (6,F,Y,X)
    zdc0 = ccm * (-6.0 * (w["m1"] + w["p1"])) * wz2             # (F,Y,X)

    # --- meridional diffusion (all rows), outer wz ------------------------
    ccy = kap * dtc / dyy ** 2
    wzm1 = _np_lat_shift(wz2, -1)   # value at row k-1 (0 at pole edge)
    wzm2 = _np_lat_shift(wz2, -2)
    wzp1 = _np_lat_shift(wz2, 1)
    wzp2 = _np_lat_shift(wz2, 2)
    mdc_km1 = ccy * wzm1 * wz2
    mdc_kp1 = ccy * wzp1 * wz2
    mdc0 = -ccy * (wzm1 + wzp1) * wz2

    # --- zonal advection (mid rows), cc = dtc/dxlat/2, NO outer wz --------
    cax = col(np.asarray(grid.ccx_adv, F64)) * mid / 3.0        # (Y,1)
    if include_advection:
        zac = np.stack([
            np.zeros((T, F, Y, X)),                  # m3 unused by upwind2
            cax * (u_m * w["m2"]),
            cax * (u_m * w["m1"]),
            -cax * (u_p * w["p1"]),
            -cax * (u_p * w["p2"]),
            np.zeros((T, F, Y, X)),                  # p3 unused
        ], axis=1)                                               # (T,6,F,Y,X)
        zac0 = cax * (-u_m * (w["m1"] + w["m2"]) + u_p * (w["p1"] + w["p2"]))

        # --- meridional advection (all rows) ------------------------------
        ccy2 = dtc / dyy / 2.0
        rows = np.arange(Y).reshape(Y, 1)
        am = np.where(rows == 1, ccy2, ccy2 / 3.0)
        ap = np.where(rows == Y - 2, ccy2, ccy2 / 3.0)
        mac_km2 = am * (v_m * wzm2)
        mac_km1 = am * (v_m * wzm1)
        mac_kp1 = -ap * (v_p * wzp1)
        mac_kp2 = -ap * (v_p * wzp2)
        mac0 = -am * v_m * (wzm1 + wzm2) + ap * v_p * (wzp1 + wzp2)
    else:
        z = np.zeros((T, F, Y, X))
        zac = np.stack([z] * 6, axis=1)
        zac0 = z
        mac_km2 = mac_km1 = mac_kp1 = mac_kp2 = mac0 = z

    zc = (zdc[None] + zac).astype(F32)                          # (T,6,F,Y,X)
    c0 = (zdc0[None] + zac0 + mdc0[None] + mac0).astype(F32)    # (T,F,Y,X)
    mc = np.stack([
        np.broadcast_to(mdc_km1 * 0.0, (T, F, Y, X)) + mac_km2,
        mdc_km1[None] + mac_km1,
        mdc_kp1[None] + mac_kp1,
        np.broadcast_to(mdc_kp1 * 0.0, (T, F, Y, X)) + mac_kp2,
    ], axis=1).astype(F32)                                      # (T,4,F,Y,X)

    # --- polar bands -------------------------------------------------------
    B = plan.nband
    if B:
        bidx = np.r_[np.arange(plan.bt), np.arange(Y - plan.bb, Y)]
        wb = {k: a[..., bidx, :] for k, a in w.items()}          # (F,B,X)
        # polar diffusion: diff7 with cc2 = kappa*dtdff2/dxlat^2 (constant)
        cc2 = (kap * np.asarray(grid.diff_sched.dtdff2, F64)[bidx].reshape(B, 1)
               / (np.asarray(grid.dxlat, F64)[bidx].reshape(B, 1) ** 2)) / 20.0
        pdc64 = np.stack([
            cc2 * wb["m3"],
            cc2 * (3.0 * wb["m2"] - wb["m3"]),
            cc2 * (6.0 * wb["m1"] - 3.0 * wb["m2"]),
            cc2 * (-6.0 * (wb["m1"] + wb["p1"])),
            cc2 * (6.0 * wb["p1"] - 3.0 * wb["p2"]),
            cc2 * (3.0 * wb["p2"] - wb["p3"]),
            cc2 * wb["p3"],
        ])                                                       # (7,F,B,X)
        pdc = pdc64.astype(F32)

        # composite of the extra diffusion iterations (see FastConst.pcomp):
        # the per-row 7-point operator as an (X, X) matrix, then
        # (I + C)^(time2-1); identity for rows that only run level 0
        if plan.diff_composite:
            n_extra = np.asarray(grid.diff_sched.time2)[bidx] - 1
            ktc, kbc = plan.comp_kt, plan.comp_kb
            rows = ([(f, b) for f in range(F) for b in range(ktc)]
                    + [(f, b) for f in range(F) for b in range(B - kbc, B)])
            jout = np.arange(X)
            pc64 = {}
            for f, b in rows:
                C = np.zeros((X, X))
                C[jout, jout] += pdc64[3, f, b]
                for i, s in _LON_IDX_SHIFT:
                    C[(jout - s) % X, jout] += pdc64[i, f, b]
                pc64[(f, b)] = np.linalg.matrix_power(
                    np.eye(X) + C, int(n_extra[b]))
            K = ktc + kbc
            pcomp = np.zeros((F, K, X, X))
            for f, b in rows:
                k = b if b < ktc else K - (B - b)
                pcomp[f, k] = pc64[(f, b)]
            pcomp = pcomp.astype(F32)
        else:
            pcomp = np.zeros((F, 0, X, X), F32)

        # polar advection: smooth3 with cc = adv ccx2, per-step winds,
        # including the src/greb.f90:881 jp2 quirk column
        ca = np.asarray(grid.adv_sched.ccx2, F64)[bidx].reshape(B, 1) / 20.0
        ub_m = u_m[..., bidx, :]                                 # (T,1,B,X)
        ub_p = u_p[..., bidx, :]
        if st.quirk_jp2:
            qcol = (np.arange(X) == X - 3)                        # Fortran j=xdim-2
            wp2q = np.where(qcol, wb["p1"], wb["p2"])
        else:
            qcol = np.zeros(X, bool)
            wp2q = wb["p2"]
        if include_advection:
            pc_c = ca * (-10.0 * ub_m * wb["m1"] + 10.0 * ub_p * wb["p1"])
            pc_m1 = ca * ub_m * (10.0 * wb["m1"] - 4.0 * wb["m2"])
            pc_m2 = ca * ub_m * (4.0 * wb["m2"] - wb["m3"])
            pc_m3 = ca * ub_m * wb["m3"]
            pc_p1 = ca * ub_p * (-10.0 * wb["p1"] + 4.0 * wp2q)
            pc_p2q = ca * ub_p * (-4.0 * wp2q + wb["p3"])
            pc_p3 = -ca * ub_p * wb["p3"]
            # the p2q term reads the p1 neighbour at the quirk column
            pc_p1 = pc_p1 + np.where(qcol, pc_p2q, 0.0)
            pc_p2 = np.where(qcol, 0.0, pc_p2q)
            pac = np.stack([pc_m3, pc_m2, pc_m1, pc_c, pc_p1, pc_p2, pc_p3],
                           axis=1).astype(F32)                   # (T,7,F,B,X)
        else:
            pac = np.zeros((T, 7, F, B, X), F32)
        wz_band = wz2[:, bidx, :].astype(F32)
    else:
        pdc = np.zeros((7, F, 1, X), F32)
        pac = np.zeros((T, 7, F, 1, X), F32)
        wz_band = np.zeros((F, 1, X), F32)
        pcomp = np.zeros((F, 0, X, X), F32)

    const = FastConst(pdc=jnp.asarray(pdc), wz_band=jnp.asarray(wz_band),
                      pcomp=jnp.asarray(pcomp))
    coeffs = FastCoeffs(zc=jnp.asarray(zc), c0=jnp.asarray(c0),
                        mc=jnp.asarray(mc), pac=jnp.asarray(pac))
    return plan, const, coeffs


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _apply7(t: jax.Array, coef: jax.Array) -> jax.Array:
    """sum_s coef[s]*roll(t, s) over [m3,m2,m1,c,p1,p2,p3]."""
    d = coef[3] * t
    for i, s in _LON_IDX_SHIFT:
        d = d + coef[i] * jnp.roll(t, s, axis=-1)
    return d


def _clamped(d: jax.Array, t: jax.Array) -> jax.Array:
    """Positivity clamp of the polar sub-cycles (src/greb.f90:715, :907)."""
    return jnp.where(d <= -t, -0.9 * t, d)


def _iterate(seg: jax.Array, cseg: jax.Array, iters: int) -> jax.Array:
    for _ in range(iters):
        seg = seg + _clamped(_apply7(seg, cseg), seg)
    return seg


def _apply7_rolled(rolls, t: jax.Array, coef: jax.Array) -> jax.Array:
    """_apply7 with the lon rolls of t precomputed (shared between the
    diffusion and advection band stencils)."""
    d = coef[3] * t
    for (i, _), r in zip(_LON_IDX_SHIFT, rolls):
        d = d + coef[i] * r
    return d


def _band_increment(xb: jax.Array, coef: jax.Array, segs, B: int,
                    rolls=None) -> jax.Array:
    """Level-0 clamped iteration on the whole band + extra segment
    iterations; returns (t_final - xb).  coef is (7,F,B,X) (or any
    broadcastable batch).

    The top/bottom segment slabs iterate SEPARATELY: each is a contiguous
    prefix/suffix static slice; a combined 2-row gather would force a
    strided-sublane relayout on every iteration (measured 20 us/step at
    96x48 — more than the rest of the substep combined)."""
    d0 = (_apply7(xb, coef) if rolls is None
          else _apply7_rolled(rolls, xb, coef))
    d0 = _clamped(d0, xb)
    t1 = xb + d0
    for kt, kb, iters in segs:
        top = _iterate(t1[..., :kt, :], coef[..., :kt, :], iters) if kt else None
        bot = (_iterate(t1[..., B - kb:, :], coef[..., B - kb:, :], iters)
               if kb else None)
        parts = []
        if top is not None:
            parts.append(top)
        mid = t1[..., kt:B - kb, :]
        if mid.shape[-2]:
            parts.append(mid)
        if bot is not None:
            parts.append(bot)
        t1 = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)
    return t1 - xb



def _apply_composite(t1: jax.Array, const: FastConst,
                     plan: FastPlan) -> jax.Array:
    """Apply the precomputed extra-iteration composite to the band.

    Only the comp_kt top / comp_kb bottom band rows change; the rest pass
    through.  Inside Pallas kernels only a plain 2-D dot lowers, so the
    per-row operators are stacked side by side: Z = R (G,X) @ pcat (X,G*X),
    then row g takes diagonal block Z[g, gX:(g+1)X].  The vmapped/XLA path
    (leading batch dims) uses the batched einsum form instead."""
    F, B, X = t1.shape[-3], t1.shape[-2], t1.shape[-1]
    ktc, kbc = plan.comp_kt, plan.comp_kb
    if ktc + kbc == 0:
        return t1
    if t1.ndim > 3:
        sel = jnp.concatenate([t1[..., :ktc, :], t1[..., B - kbc:, :]],
                              axis=-2)
        y = jnp.einsum('...fkx,fkxy->...fky', sel, const.pcomp,
                       preferred_element_type=jnp.float32)
        return jnp.concatenate([y[..., :ktc, :], t1[..., ktc:B - kbc, :],
                                y[..., ktc:, :]], axis=-2)
    K = ktc + kbc
    bands = []
    for f in range(F):
        tf = t1[f]                                   # (B, X)
        parts = []
        for k in range(ktc):
            parts.append(jnp.dot(tf[k:k + 1, :], const.pcomp[f, k],
                                 preferred_element_type=jnp.float32))
        mid = tf[ktc:B - kbc, :]
        if mid.shape[0]:
            parts.append(mid)
        for k in range(kbc):
            parts.append(jnp.dot(tf[B - kbc + k:B - kbc + k + 1, :],
                                 const.pcomp[f, ktc + k],
                                 preferred_element_type=jnp.float32))
        bands.append(jnp.concatenate(parts, axis=0) if len(parts) > 1
                     else parts[0])
    return jnp.stack(bands, axis=0)


def substep(x: jax.Array, cf: FastCoeffs, const: FastConst,
            plan: FastPlan) -> jax.Array:
    """One dt_crcl circulation substep on the (…, F, Y, X) stacked field."""
    Y = plan.ydim
    # linear pass: zonal (mid rows) + meridional (all rows)
    dx = cf.c0 * x
    for i, s in ((0, 3), (1, 2), (2, 1), (3, -1), (4, -2), (5, -3)):
        dx = dx + cf.zc[i] * jnp.roll(x, s, axis=-1)
    pad = [(0, 0)] * (x.ndim - 2) + [(2, 2), (0, 0)]
    xe = jnp.pad(x, pad)
    dx = dx + cf.mc[0] * xe[..., 0:Y, :]        # km2
    dx = dx + cf.mc[1] * xe[..., 1:Y + 1, :]    # km1
    dx = dx + cf.mc[2] * xe[..., 3:Y + 3, :]    # kp1
    dx = dx + cf.mc[3] * xe[..., 4:Y + 4, :]    # kp2

    # polar band fix-up (zonal part on the bands; clamped iterations)
    if plan.nband:
        B, bt, bb = plan.nband, plan.bt, plan.bb
        xb = jnp.concatenate([x[..., :bt, :], x[..., Y - bb:, :]], axis=-2)
        dsegs = () if plan.diff_composite else plan.diff_segs
        dtxd = _band_increment(xb, const.pdc, dsegs, B)
        if plan.diff_composite:
            t1 = xb + dtxd
            t2 = _apply_composite(t1, const, plan)
            t1 = t1 + _clamped(t2 - t1, t1)
            dtxd = t1 - xb
        # NOTE: sharing one set of xb rolls between the two stencils measured
        # SLOWER (72 vs 81 yr/s at 96x48) — materializing the rolls blocks
        # Mosaic from fusing them into the multiply-adds
        dtxa = _band_increment(xb, cf.pac, plan.adv_segs, B)
        bdx = const.wz_band * dtxd + dtxa
        # static-slice concatenation (Pallas-lowerable)
        dx = jnp.concatenate([
            dx[..., :bt, :] + bdx[..., :bt, :],
            dx[..., bt:Y - bb, :],
            dx[..., Y - bb:, :] + bdx[..., bt:, :],
        ], axis=-2)
    return x + dx


def circulation(x: jax.Array, cf: FastCoeffs, const: FastConst,
                plan: FastPlan, nsub: int, unroll=False) -> jax.Array:
    """Sub-cycled circulation increment over one 12-h step (fast path).
    Same contract as stencils.circulation: returns the total increment."""
    step = lambda xc: substep(xc, cf, const, plan)
    if unroll is True:
        xc = x
        for _ in range(nsub):
            xc = step(xc)
    elif isinstance(unroll, int) and 1 < unroll <= nsub and nsub % unroll == 0:
        def block(i, xc):
            for _ in range(unroll):
                xc = step(xc)
            return xc
        xc = jax.lax.fori_loop(0, nsub // unroll, block, x)
    else:
        xc = jax.lax.fori_loop(0, nsub, lambda i, xc: step(xc), x)
    return xc - x
