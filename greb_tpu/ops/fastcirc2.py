"""Uniform coefficient-folded circulation (v2 of ops/fastcirc.py).

The v1 fold (ops/fastcirc.py) treats the polar bands as a SEPARATE compute
path: the band rows are gathered into a (F, B, X) slab and run their own
7-point applies, clamps, and composites.  At 96x48 that band work is ~45
small vector ops per substep — about half the measured substep latency on a
TPU v5e, because each op pays issue overhead regardless of its size.

This module folds the polar-band zonal stencils into the SAME full-field
apply as the interior rows.  The key observations (reference
src/greb.f90:556-915):

* interior and polar zonal diffusion use the SAME 10/4/1 smoothed 7-point
  form; only the per-row coefficient differs (ccx = kappa*dt_crcl/dxlat^2
  interior, ccx2 = kappa*dtdff2/dxlat^2 polar, src/greb.f90:582 vs :654) —
  so one (7, F, Y, X) coefficient stack covers every row;
* interior (2-point upwind /3, :798-836) and polar (10/4/1 smooth3, :842-906)
  zonal advection are both linear in the transported field with reach <= 3,
  so one wind-multiplied (7, F, Y, X) stack covers every row too;
* the positivity clamps (:715, :907) apply only on polar rows — a masked
  `where` on the full-field increment reproduces them exactly;
* the outer wz of dX_diffuse = wz*(dTx+dTy) (:721) multiplies AFTER the
  clamp, so zonal-diffusion coefficients carry NO outer wz (for any row)
  and the substep applies `wz * dd` once.

A substep is then ~35 large vector ops (6 shared lon rolls, two 7-point
applies, two masked clamps, one merged meridional apply, one combine)
instead of ~18 large + ~45 small — and, because every op is a full-field
op with per-row coefficient FIELDS, the identical program runs on a
latitude shard: rolls are lon-local, the meridional pass takes a
caller-supplied halo extension, masks/coefficients shard like the state.

Extra sub-cycle iterations (rows where the CFL count time2 > 1) follow the
v1 strategy: prefix/suffix row slices iterate explicitly, and rows with
huge counts collapse into precomputed dense or SVD-truncated composite
operators (exact modulo the in-iteration clamp, which is checked once
against the composite result — see fastcirc.py docstring).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..grid import Grid
from . import fastcirc as v1
from . import stencils as stc

F32 = np.float32
F64 = np.float64

FastPlan = v1.FastPlan          # same static structure
_LON_IDX_SHIFT = v1._LON_IDX_SHIFT

# zam multiplier index map (x u_m for 0..3, x u_p for 4..7)
_ZA_M3, _ZA_M2, _ZA_M1, _ZA_CM = 0, 1, 2, 3
_ZA_CP, _ZA_P1, _ZA_P2, _ZA_P3 = 4, 5, 6, 7
# mer index map
_MD_KM1, _MD_KP1, _C0_MD = 0, 1, 2
_MAM2, _MAM1, _MAP1, _MAP2, _MA0M, _MA0P = 3, 4, 5, 6, 7, 8


@struct.dataclass
class Fast2Const:
    """Time-constant device arrays of the uniform fold."""
    zd: jax.Array       # (7, F, Y, X) zonal diffusion [m3,m2,m1,c,p1,p2,p3]
    zam: jax.Array      # (8, F, Y, X) zonal advection wind multipliers
    mer: jax.Array      # (9, F, Y, X) meridional constants/multipliers
    wz: jax.Array       # (F, Y, X) outer diffusion weight
    band: jax.Array     # (Y, 1) bool — rows whose zonal increments clamp
    pcomp: jax.Array    # composites, as in v1.FastConst
    pcu: jax.Array
    pcw: jax.Array


@struct.dataclass
class Fast2Coeffs:
    """One step's assembled coefficients (member-independent)."""
    za: jax.Array       # (7, F, Y, X) zonal advection [m3,m2,m1,c,p1,p2,p3]
    mc: jax.Array       # (4, F, Y, X) meridional [km2,km1,kp1,kp2]
    c0m: jax.Array      # (F, Y, X) meridional centre


def step_coeffs(u: jax.Array, v: jax.Array, const: Fast2Const,
                plan: FastPlan) -> Fast2Coeffs:
    """Assemble one forcing step's wind-dependent coefficients
    (sign splits per src/greb.f90:203-216)."""
    u_m = jnp.maximum(u, 0.0)
    u_p = jnp.minimum(u, 0.0)
    v_m = jnp.maximum(v, 0.0)
    v_p = jnp.minimum(v, 0.0)
    a = const.zam
    za = jnp.stack([
        a[_ZA_M3] * u_m,
        a[_ZA_M2] * u_m,
        a[_ZA_M1] * u_m,
        a[_ZA_CM] * u_m + a[_ZA_CP] * u_p,
        a[_ZA_P1] * u_p,
        a[_ZA_P2] * u_p,
        a[_ZA_P3] * u_p,
    ])
    m = const.mer
    mc = jnp.stack([
        m[_MAM2] * v_m,
        m[_MD_KM1] + m[_MAM1] * v_m,
        m[_MD_KP1] + m[_MAP1] * v_p,
        m[_MAP2] * v_p,
    ])
    c0m = m[_C0_MD] + m[_MA0M] * v_m + m[_MA0P] * v_p
    return Fast2Coeffs(za=za, mc=mc, c0m=c0m)


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------
def build_const(wz_air: np.ndarray, wz_vapor: np.ndarray, grid: Grid,
                st: stc.StencilStatic, kappa: float,
                plan: Optional[FastPlan] = None,
                include_advection: bool = True,
                ) -> Tuple[FastPlan, Fast2Const]:
    """Precompute the uniform constant coefficient fields (float64 builds,
    float32 results), algebraically regrouping the reference formulas
    exactly like v1.build_const but WITHOUT a separate band path."""
    if plan is None:
        plan = v1.make_plan(grid)
    Y, X = plan.ydim, plan.xdim
    wz2 = np.stack([np.asarray(wz_air, F64), np.asarray(wz_vapor, F64)])
    F = wz2.shape[0]

    w = v1._np_lon_shifts(wz2)
    col = lambda a: np.asarray(a, F64).reshape(Y, 1)
    dtc = F64(F32(st.dt_crcl))
    kap = F64(F32(kappa))
    dyy = F64(F32(st.dyy))
    polar = np.asarray(grid.polar_rows, bool).reshape(Y, 1)
    adv = 1.0 if include_advection else 0.0

    # --- zonal diffusion: one coefficient per row, no outer wz -------------
    # interior rows: cc = kappa*dt_crcl/dxlat^2 (src/greb.f90:582)
    # polar rows:    cc = kappa*dtdff2/dxlat^2  (:654), per-row static
    cc_in = kap * dtc / col(grid.dxlat.astype(F64) ** 2)
    cc_po = kap * col(grid.diff_sched.dtdff2) / col(grid.dxlat.astype(F64) ** 2)
    ccd = np.where(polar, cc_po, cc_in) / 20.0
    zd = np.stack([
        ccd * w["m3"],
        ccd * (3.0 * w["m2"] - w["m3"]),
        ccd * (6.0 * w["m1"] - 3.0 * w["m2"]),
        ccd * (-6.0 * (w["m1"] + w["p1"])),
        ccd * (6.0 * w["p1"] - 3.0 * w["p2"]),
        ccd * (3.0 * w["p2"] - w["p3"]),
        ccd * w["p3"],
    ])

    # --- zonal advection wind multipliers -----------------------------------
    # interior rows: 2-point upwind /3 (src/greb.f90:798-836)
    cax = col(np.asarray(grid.ccx_adv, F64)) / 3.0 * adv
    # polar rows: 10/4/1 smooth3 /20 with static ccx2 (:842-906) + jp2 quirk
    ca = col(grid.adv_sched.ccx2) / 20.0 * adv
    if st.quirk_jp2:
        qcol = (np.arange(X) == X - 3)              # Fortran j = xdim-2 (:881)
        wp2q = np.where(qcol, w["p1"], w["p2"])
    else:
        qcol = np.zeros(X, bool)
        wp2q = w["p2"]
    pp1 = ca * (-10.0 * w["p1"] + 4.0 * wp2q)
    pp2q = ca * (-4.0 * wp2q + w["p3"])
    zam = np.zeros((8, F, Y, X))
    zam[_ZA_M3] = np.where(polar, ca * w["m3"], 0.0)
    zam[_ZA_M2] = np.where(polar, ca * (4.0 * w["m2"] - w["m3"]), cax * w["m2"])
    zam[_ZA_M1] = np.where(polar, ca * (10.0 * w["m1"] - 4.0 * w["m2"]),
                           cax * w["m1"])
    zam[_ZA_CM] = np.where(polar, -10.0 * ca * w["m1"],
                           -cax * (w["m1"] + w["m2"]))
    zam[_ZA_CP] = np.where(polar, 10.0 * ca * w["p1"],
                           cax * (w["p1"] + w["p2"]))
    zam[_ZA_P1] = np.where(polar, pp1 + np.where(qcol, pp2q, 0.0),
                           -cax * w["p1"])
    zam[_ZA_P2] = np.where(polar, np.where(qcol, 0.0, pp2q), -cax * w["p2"])
    zam[_ZA_P3] = np.where(polar, -ca * w["p3"], 0.0)

    # --- meridional (identical to v1; diffusion parts carry the outer wz) ---
    ccy = kap * dtc / dyy ** 2
    wzm1 = v1._np_lat_shift(wz2, -1)
    wzm2 = v1._np_lat_shift(wz2, -2)
    wzp1 = v1._np_lat_shift(wz2, 1)
    wzp2 = v1._np_lat_shift(wz2, 2)
    ccy2 = dtc / dyy / 2.0 * adv
    rows = np.arange(Y).reshape(Y, 1)
    am = np.where(rows == 1, ccy2, ccy2 / 3.0)
    ap = np.where(rows == Y - 2, ccy2, ccy2 / 3.0)
    mer = np.zeros((9, F, Y, X))
    mer[_MD_KM1] = ccy * wzm1 * wz2
    mer[_MD_KP1] = ccy * wzp1 * wz2
    mer[_C0_MD] = -ccy * (wzm1 + wzp1) * wz2
    mer[_MAM2] = am * wzm2
    mer[_MAM1] = am * wzm1
    mer[_MAP1] = -ap * wzp1
    mer[_MAP2] = -ap * wzp2
    mer[_MA0M] = -am * (wzm1 + wzm2)
    mer[_MA0P] = ap * (wzp1 + wzp2)

    # --- composites of the extra diffusion iterations ------------------------
    B = plan.nband
    if B and plan.diff_composite:
        bidx = np.r_[np.arange(plan.bt), np.arange(Y - plan.bb, Y)]
        pdc64 = zd[:, :, bidx, :]                   # (7, F, B, X)
        n_extra = np.asarray(grid.diff_sched.time2)[bidx] - 1
        pcomp, pcu, pcw = v1.build_composites(pdc64, n_extra, plan, F, B, X)
    else:
        pcomp = np.zeros((F, 1, X, X), F32)
        pcu = np.zeros((F, 1, X, 1), F32)
        pcw = np.zeros((F, 1, 1, X), F32)

    band = np.zeros((Y, 1), bool)
    band[:plan.bt] = True
    if plan.bb:
        band[Y - plan.bb:] = True

    const = Fast2Const(
        zd=jnp.asarray(zd.astype(F32)), zam=jnp.asarray(zam.astype(F32)),
        mer=jnp.asarray(mer.astype(F32)),
        wz=jnp.asarray(wz2.astype(F32)), band=jnp.asarray(band),
        pcomp=jnp.asarray(pcomp), pcu=jnp.asarray(pcu), pcw=jnp.asarray(pcw))
    return plan, const


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _apply7_rolled(rolls, x, coef):
    """sum_s coef[s] * roll(x, s) with the 6 rolls precomputed/shared.

    Balanced-tree accumulation: the substep is latency-bound on this chain
    at small grids (the VPU sits mostly idle at 96x48), so a depth-3 tree
    beats the depth-7 sequential sum."""
    terms = [coef[3] * x] + [coef[i] * r
                             for (i, _), r in zip(_LON_IDX_SHIFT, rolls)]
    while len(terms) > 1:
        nxt = [terms[k] + terms[k + 1] for k in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def _masked_clamp(d, x, band):
    """Positivity clamp on band rows only (src/greb.f90:715, :907):
    where(band & (d <= -x)) d = -0.9*x."""
    return jnp.where(jnp.logical_and(band, d <= -x), F32(-0.9) * x, d)


def _row_dot(t_row: jax.Array, f: int, k: int, const: Fast2Const,
             lowrank: bool) -> jax.Array:
    """(..., X) x composite[f, k] — plain 2-D dots (Mosaic-lowerable)."""
    lead = t_row.shape[:-1]
    flat = t_row.reshape((-1, t_row.shape[-1])) if t_row.ndim != 2 else t_row
    if lowrank:
        z = jnp.dot(flat, const.pcu[f, k], preferred_element_type=jnp.float32)
        out = jnp.dot(z, const.pcw[f, k], preferred_element_type=jnp.float32)
    else:
        out = jnp.dot(flat, const.pcomp[f, k],
                      preferred_element_type=jnp.float32)
    return out.reshape(lead + (out.shape[-1],))


def _extra_diffusion(x, dd, const: Fast2Const, plan: FastPlan):
    """Extra sub-cycle iterations for rows with diffusion time2 > 1: explicit
    prefix/suffix slices (diff_segs, offset past the composite rows) plus
    the composite rows themselves.  Returns the updated full-field dd."""
    Y = plan.ydim
    ktc, kbc = plan.comp_kt, plan.comp_kb
    have_segs = bool(plan.diff_segs)
    if not (have_segs or plan.diff_composite):
        return dd

    def seg_iter(dd, r0, r1, iters):
        """Iterate rows [r0, r1) a further `iters` times, carried through dd."""
        t1 = x[..., r0:r1, :] + dd[..., r0:r1, :]
        t1 = v1._iterate(t1, const.zd[:, :, r0:r1, :], iters)
        return jnp.concatenate(
            [dd[..., :r0, :], t1 - x[..., r0:r1, :], dd[..., r1:, :]],
            axis=-2)

    # explicit segments are CUMULATIVE levels on nested prefixes of
    # [ktc, ...) / suffixes of (..., Y-kbc] (time2 monotone toward each
    # pole; see v1._segments) — apply sequentially, carrying dd
    for kt, kb, iters in plan.diff_segs:
        if kt:
            dd = seg_iter(dd, ktc, ktc + kt, iters)
        if kb:
            dd = seg_iter(dd, Y - kbc - kb, Y - kbc, iters)

    if not plan.diff_composite:
        return dd
    lowrank = plan.comp_mode == "lowrank"
    F = const.wz.shape[-3]

    def comp_rows(r0, n, k0):
        """Apply composites to rows [r0, r0+n); returns the new dd slab."""
        parts = []
        for j in range(n):
            r = r0 + j
            fparts = []
            for f in range(F):
                t1 = x[..., f, r:r + 1, :] + dd[..., f, r:r + 1, :]
                t2 = _row_dot(t1, f, k0 + j, const, lowrank)
                t1 = t1 + v1._clamped(t2 - t1, t1)
                fparts.append(t1 - x[..., f, r:r + 1, :])
            parts.append(jnp.stack(fparts, axis=-3))
        return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]

    slabs = []
    if ktc:
        slabs.append(comp_rows(0, ktc, 0))
    slabs.append(dd[..., ktc:Y - kbc, :])
    if kbc:
        slabs.append(comp_rows(Y - kbc, kbc, ktc))
    return jnp.concatenate(slabs, axis=-2) if len(slabs) > 1 else slabs[0]


def _extra_advection(x, da, cf: Fast2Coeffs, plan: FastPlan):
    """Extra advection sub-cycle iterations (adv_segs; empty at 96x48 —
    every polar row has advective time2 == 1 there)."""
    if not plan.adv_segs:
        return da
    Y = plan.ydim
    new_da = da
    for kt, kb, iters in plan.adv_segs:
        if kt:
            t1 = x[..., :kt, :] + new_da[..., :kt, :]
            t1 = v1._iterate(t1, cf.za[:, :, :kt, :], iters)
            new_da = jnp.concatenate(
                [t1 - x[..., :kt, :], new_da[..., kt:, :]], axis=-2)
        if kb:
            t1 = x[..., Y - kb:, :] + new_da[..., Y - kb:, :]
            t1 = v1._iterate(t1, cf.za[:, :, Y - kb:, :], iters)
            new_da = jnp.concatenate(
                [new_da[..., :Y - kb, :], t1 - x[..., Y - kb:, :]], axis=-2)
    return new_da


def extend_lat_zero(x: jax.Array, width: int) -> jax.Array:
    """Default meridional halo: zeros beyond the poles (one-sided forms)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(width, width), (0, 0)]
    return jnp.pad(x, pad)


def substep(x: jax.Array, cf: Fast2Coeffs, const: Fast2Const, plan: FastPlan,
            extend: Callable = extend_lat_zero) -> jax.Array:
    """One dt_crcl circulation substep on the (..., F, Y, X) stacked field."""
    Y = x.shape[-2]
    rolls = [jnp.roll(x, s, axis=-1) for _, s in _LON_IDX_SHIFT]
    band = const.band

    # zonal diffusion (clamped on band rows), then extra iterations
    dd = _apply7_rolled(rolls, x, const.zd)
    dd = _masked_clamp(dd, x, band)
    dd = _extra_diffusion(x, dd, const, plan)

    # zonal advection (clamped on band rows)
    da = _apply7_rolled(rolls, x, cf.za)
    da = _masked_clamp(da, x, band)
    da = _extra_advection(x, da, cf, plan)

    # meridional diffusion+advection, merged (never clamped)
    xe = extend(x, 2)
    dy = cf.c0m * x
    dy = dy + cf.mc[0] * xe[..., 0:Y, :]        # km2
    dy = dy + cf.mc[1] * xe[..., 1:Y + 1, :]    # km1
    dy = dy + cf.mc[2] * xe[..., 3:Y + 3, :]    # kp1
    dy = dy + cf.mc[3] * xe[..., 4:Y + 4, :]    # kp2

    return x + const.wz * dd + da + dy


def circulation(x: jax.Array, cf: Fast2Coeffs, const: Fast2Const,
                plan: FastPlan, nsub: int, unroll=False,
                extend: Callable = extend_lat_zero) -> jax.Array:
    """Sub-cycled circulation increment over one 12-h step (uniform fold).
    Same contract as stencils.circulation: returns the total increment."""
    step = lambda xc: substep(xc, cf, const, plan, extend)
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
