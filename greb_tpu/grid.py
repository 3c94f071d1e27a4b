"""Grid metrics and static CFL sub-cycling schedules.

All metrics reproduce the reference float32 arithmetic exactly
(reference src/greb.f90:578-582 for diffusion, :749-753 for advection):

    deg   = 2*pi*6.371e6/360          (pi = params.pi = 3.1416)
    lat   = dlat*k - dlat/2 - 90       (k = 1..ydim)
    dxlat = dlon*deg*cos(2*pi/360*lat)
    ccy_diff = kappa*dt_crcl/dyy**2 ;  ccx_diff(k) = kappa*dt_crcl/dxlat(k)**2
    ccy_adv  = dt_crcl/dyy/2        ;  ccx_adv(k)  = dt_crcl/dxlat(k)/2

Rows with ``dxlat <= 2.5e5`` m take the sub-cycled "polar" branch; the
iteration counts are pure functions of the grid + kappa + dt_crcl and are
therefore computed HERE, at trace time, with Fortran integer semantics
(nint = round-half-away-from-zero, integer division truncation;
reference src/greb.f90:651-654 and :838-840).  That removes all
data-dependent control flow from the compiled step — the polar loops
become statically-unrolled (or fori_loop) masked updates.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

F32 = np.float32


def _fortran_nint(x: float) -> int:
    """Fortran NINT: round half away from zero."""
    return int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))


@dataclass(frozen=True)
class PolarSchedule:
    """Static per-row sub-cycling schedule for one stencil op."""
    time2: np.ndarray    # (ydim,) int32 — iterations per row (0 = not sub-cycled)
    dtdff2: np.ndarray   # (ydim,) float32 — per-row sub-step length [s]
    ccx2: np.ndarray     # (ydim,) float32 — per-row coefficient
    max_iter: int        # max(time2)

    def active_mask(self, it: int) -> np.ndarray:
        """(ydim,) bool — rows still iterating at inner iteration ``it``."""
        return (self.time2 > it)


@dataclass(frozen=True)
class Grid:
    xdim: int
    ydim: int
    dlon: float
    dlat: float
    dt_crcl: int
    # float32 metrics (Fortran parity)
    lat: np.ndarray        # (ydim,) latitude of row centres [deg]
    dxlat: np.ndarray      # (ydim,) zonal grid length [m]
    dyy: float             # meridional grid length [m]
    ccy_diff: float
    ccx_diff: np.ndarray   # (ydim,)
    ccy_adv: float
    ccx_adv: np.ndarray    # (ydim,)
    polar_rows: np.ndarray  # (ydim,) bool — dxlat <= 2.5e5 (sub-cycled branch)
    diff_sched: PolarSchedule
    adv_sched: PolarSchedule


def make_grid(xdim: int, ydim: int, dt_crcl: int,
              kappa: float = 8e5, pi: float = 3.1416) -> Grid:
    """Build grid metrics with reference float32 arithmetic.

    kappa and pi must be CONCRETE here (they set static iteration counts);
    perturbing them per-ensemble keeps the base schedule (documented
    deviation — the coefficients themselves still follow the traced values
    inside the ops).
    """
    pi = F32(pi)
    kappa = F32(kappa)
    dlon = F32(360.0) / F32(xdim)
    dlat = F32(180.0) / F32(ydim)
    deg = F32(2.0) * pi * F32(6.371e6) / F32(360.0)
    dyy = dlat * deg
    ilat = np.arange(1, ydim + 1, dtype=F32)
    lat = dlat * ilat - dlat / F32(2.0) - F32(90.0)
    dxlat = dlon * deg * np.cos(F32(2.0) * pi / F32(360.0) * lat, dtype=F32)

    dtc = F32(dt_crcl)
    ccy_diff = kappa * dtc / (dyy * dyy)
    ccx_diff = (kappa * dtc / (dxlat * dxlat)).astype(F32)
    ccy_adv = dtc / dyy / F32(2.0)
    ccx_adv = (dtc / dxlat / F32(2.0)).astype(F32)

    polar = dxlat <= F32(2.5e5)

    # --- diffusion sub-cycle schedule (src/greb.f90:651-654) --------------
    t2d = np.zeros(ydim, np.int32)
    s2d = np.zeros(ydim, F32)
    c2d = np.zeros(ydim, F32)
    for k in range(ydim):
        if not polar[k]:
            continue
        # dd = max(1, nint(dt_crcl/(1.*dxlat**2/kappa)))
        dd = max(1, _fortran_nint(float(dtc / (F32(1.0) * dxlat[k] * dxlat[k] / kappa))))
        dtdff2 = int(dt_crcl) // dd                # Fortran integer division
        if dtdff2 < 1:
            # dd > dt_crcl: the reference would divide by zero here — this
            # is only reachable on grids far finer than it supports (at
            # 768x384 the pole row needs dd ~ 3e4).  Extend with a
            # FRACTIONAL sub-step dt_crcl/dd, which keeps the row CFL
            # number kappa*dtdff2/dxlat^2 ~= 1 (stable for the /20
            # smoothed 7-point form) instead of the divergent 1-s clamp.
            sub = dtc / F32(dd)
            t2d[k] = dd
            s2d[k] = F32(sub)
            c2d[k] = kappa * F32(sub) / (dxlat[k] * dxlat[k])
            continue
        time2 = max(1, _fortran_nint(float(dtc) / float(dtdff2)))
        t2d[k] = time2
        s2d[k] = F32(dtdff2)
        c2d[k] = kappa * F32(dtdff2) / (dxlat[k] * dxlat[k])
    diff_sched = PolarSchedule(time2=t2d, dtdff2=s2d, ccx2=c2d,
                               max_iter=int(t2d.max(initial=0)))

    # --- advection sub-cycle schedule (src/greb.f90:838-840) --------------
    t2a = np.zeros(ydim, np.int32)
    s2a = np.zeros(ydim, F32)
    c2a = np.zeros(ydim, F32)
    for k in range(ydim):
        if not polar[k]:
            continue
        # dd = max(1, nint(dt_crcl/(dxlat/10.0/1.)))
        dd = max(1, _fortran_nint(float(dtc / (dxlat[k] / F32(10.0) / F32(1.0)))))
        dtdff2 = int(dt_crcl) // dd
        if dtdff2 < 1:
            # same fractional-sub-step extension as diffusion (unreachable
            # at the reference's grids; keeps the advective CFL ~= 1)
            sub = dtc / F32(dd)
            t2a[k] = dd
            s2a[k] = F32(sub)
            c2a[k] = F32(sub) / dxlat[k] / F32(2.0)
            continue
        time2 = max(1, _fortran_nint(float(dtc) / float(dtdff2)))
        t2a[k] = time2
        s2a[k] = F32(dtdff2)
        c2a[k] = F32(dtdff2) / dxlat[k] / F32(2.0)
    adv_sched = PolarSchedule(time2=t2a, dtdff2=s2a, ccx2=c2a,
                              max_iter=int(t2a.max(initial=0)))

    return Grid(
        xdim=xdim, ydim=ydim, dlon=float(dlon), dlat=float(dlat),
        dt_crcl=dt_crcl, lat=lat, dxlat=dxlat, dyy=float(dyy),
        ccy_diff=float(ccy_diff), ccx_diff=ccx_diff,
        ccy_adv=float(ccy_adv), ccx_adv=ccx_adv,
        polar_rows=polar, diff_sched=diff_sched, adv_sched=adv_sched,
    )


def month_average_matrix(jday_mon: Tuple[int, ...], ndt_days: int) -> np.ndarray:
    """(12, nstep_yr) float32 matrix M with M[m,t] = 1/steps_in_month(m) for
    steps t falling in month m, else 0.  ``monthly = einsum('mt,t...->m...')``
    reproduces the reference monthly means (src/greb.f90:973-982) as a single
    MXU matmul instead of 60 scalar-triggered flushes."""
    nstep = sum(jday_mon) * ndt_days
    out = np.zeros((len(jday_mon), nstep), F32)
    t = 0
    for m, nd in enumerate(jday_mon):
        n = nd * ndt_days
        out[m, t:t + n] = F32(1.0) / F32(n)
        t += n
    assert t == nstep
    return out
