"""Member-batched multi-year fused Pallas kernels.

Extends the single-year kernel (year_kernel.py) along two axes:

* **years**: grid = (member_blocks, n_years * steps_per_block) — per-year
  host dispatch and pipeline teardown disappear; per-year CO2 comes from a
  prefetched scalar array; forcing/correction streams wrap around via
  ``t % steps_per_year`` index maps; monthly means accumulate IN-KERNEL
  into a revisited output block (keyed by a prefetched month map), so the
  streamed output is 12 fields/yr instead of 730.
* **members**: the whole state carries a leading member axis (MB members
  resident in VMEM at a time; outer grid dimension sweeps member blocks).
  Physics params enter as an (M, P) table and are rebuilt per block as
  (MB, 1, 1) leaves — every pointwise op broadcasts over them.  The
  measured substep cost at 96x48 is LATENCY-bound (the VPU is mostly
  idle), so members ride along nearly free up to MB~16: this is how one
  chip turns 96x48's 4,608 points into full aggregate throughput
  (reference ensembles: one process per member, src/greb.f90:1064-1068).

Transport (circulation) parameters cannot be member-perturbed here — the
folded coefficient tables are shared (see parallel.ensemble
TRANSPORT_PARAM_KEYS); the vmapped XLA path remains the fallback for that.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Experiment, Numerics, PhysicsParams
from ...forcing import Derived, ModelState
from ...grid import month_average_matrix
from ...model import core
from ...ops import stencils as stc
from . import year_kernel as yk

F32 = np.float32

# ppack layout: the 29 scalar PhysicsParams leaves, the 10 p_emi entries,
# then the 3 derived capacities (cap_ocean, cap_land, cap_air)
_SCALAR_FIELDS = tuple(f for f in PhysicsParams.__dataclass_fields__
                       if f != "p_emi")
N_PPACK = len(_SCALAR_FIELDS) + 10 + 3


def pack_member_params(params_b: PhysicsParams) -> jax.Array:
    """Stacked per-member params -> (M, N_PPACK) float32 table."""
    cols = [jnp.asarray(getattr(params_b, f), jnp.float32).reshape(-1)
            for f in _SCALAR_FIELDS]
    m = cols[0].shape[0]
    pe = jnp.asarray(params_b.p_emi, jnp.float32).reshape(m, 10)
    cols += [pe[:, i] for i in range(10)]
    cap_ocean = params_b.cp_ocean * params_b.rho_ocean
    cap_land = params_b.cp_land * params_b.rho_land * params_b.d_land
    cap_air = params_b.cp_air * params_b.rho_air * params_b.d_air
    cols += [jnp.asarray(c, jnp.float32).reshape(-1)
             for c in (cap_ocean, cap_land, cap_air)]
    # (M, 1, P): the member axis is the only blocked one (Mosaic requires
    # non-full blocks to keep the last two dims whole)
    return jnp.stack(cols, axis=1)[:, None, :]


def _params_from_ppack(ppack):
    """(MB, P) block -> PhysicsParams with (MB,1,1) leaves + 3 capacities."""
    n = len(_SCALAR_FIELDS)
    col = lambda i: ppack[:, 0, i].reshape(-1, 1, 1)
    d = {f: col(i) for i, f in enumerate(_SCALAR_FIELDS)}
    d["p_emi"] = tuple(col(n + i) for i in range(10))
    caps = (col(n + 10), col(n + 11), col(n + 12))
    return PhysicsParams(**d), caps


def _month_maps(num: Numerics, sb: int):
    """(mon_map, mstart, wstep): per-time-block month index / month-start
    flag, and the per-step monthly-mean weight (1/steps-in-month)."""
    mm = month_average_matrix(num.jday_mon, num.ndt_days)   # (12, T)
    t_steps = mm.shape[1]
    m_idx = mm.argmax(axis=0).astype(np.int32)              # (T,)
    w = mm.max(axis=0).astype(F32)                          # (T,)
    spy_b = t_steps // sb
    mon_map = m_idx[::sb]
    # month boundaries must align with blocks
    assert (m_idx.reshape(spy_b, sb) == mon_map[:, None]).all(), \
        f"sb={sb} does not align with month boundaries"
    mstart = np.zeros(spy_b, np.int32)
    mstart[0] = 1
    mstart[1:] = (mon_map[1:] != mon_map[:-1]).astype(np.int32)
    return (jnp.asarray(mon_map), jnp.asarray(mstart), jnp.asarray(w))


def month_aligned_sb(num: Numerics, max_sb: int = 2) -> int:
    """Largest steps-per-block <= max_sb dividing every month's step count."""
    steps = [d * num.ndt_days for d in num.jday_mon]
    g = math.gcd(num.nstep_yr, math.gcd(*steps) if len(steps) > 1 else steps[0])
    sb = 1
    for c in range(2, max_sb + 1):
        if g % c == 0:
            sb = c
    return sb


def build_scenario_years(md: core.ModelData, st: stc.StencilStatic,
                         sf_np: stc.StencilFields, num: Numerics,
                         exp: Experiment, n_years: int, n_members: int,
                         mb: int = 1, fastcirc=None, interpret: bool = False,
                         circ_unroll: int = 1, max_sb: int = 2):
    """Returns fn(state5 (5,M,y,x), ppack (M,P), fpack, sw, cpack,
    corrpack (M,t,3,y,x), co2_years (n_years,)) ->
    (final_state (5,M,y,x), monthly (M, n_years*12, 5, y, x)).

    ``max_sb=1`` halves the kernel body (one step per grid iteration) —
    required at refined grids, where the two-step body's scoped-VMEM
    stack exceeds what the chip can give Mosaic."""
    sf_np = yk.strip_itm(sf_np, fastcirc)
    y, x, t_steps = num.ydim, num.xdim, num.nstep_yr
    M = n_members
    assert M % mb == 0, "member count must divide into member blocks"
    SB = month_aligned_sb(num, max_sb=max_sb)
    spy_b = t_steps // SB
    n_tb = n_years * spy_b
    nmon = len(num.jday_mon)
    mon_map, mstart, wstep = _month_maps(num, SB)

    plan = fastcirc[0] if fastcirc is not None else None
    fast_arrays, fast_rebuild = yk._fast_pack(fastcirc)
    n_fast = len(fast_arrays)
    n_diff = sf_np.diff_itm.shape[0]
    n_adv = sf_np.adv_itm.shape[0]
    n_sfp = 7 + n_diff + n_adv
    sfpack = yk.pack_stencil_fields(sf_np)

    d0 = md.derived

    def kernel(co2y_ref, mon_ref, mst_ref, w_ref, state_ref, ppack_ref,
               fpack_ref, sw_ref, cpack_ref, sfp_ref, corr_ref, *rest):
        if fastcirc is not None:
            fc_t = (plan,) + fast_rebuild(rest[:n_fast])
        else:
            fc_t = None
        out_state_ref, mon_out_ref, amean_ref, s_scr = rest[n_fast:]
        tb = pl.program_id(1)

        @pl.when(tb == 0)
        def _():
            s_scr[...] = state_ref[...]

        @pl.when(mst_ref[tb % spy_b] == 1)
        def _():
            mon_out_ref[...] = jnp.zeros(mon_out_ref.shape, mon_out_ref.dtype)

        @pl.when(tb % spy_b == 0)
        def _():
            amean_ref[...] = jnp.zeros(amean_ref.shape, amean_ref.dtype)

        params, (cap_ocean, cap_land, cap_air) = _params_from_ppack(
            ppack_ref[...])
        c = {k: cpack_ref[i] for i, k in enumerate(yk._CONST_FIELDS)}
        derived = Derived(wz_air=c["wz_air"], wz_vapor=c["wz_vapor"],
                          z_ocean=c["z_ocean"], toclim=c["toclim"],
                          cap_ocean=cap_ocean, cap_land=cap_land,
                          cap_air=cap_air)
        sf = yk._unpack_stencil_fields(sfp_ref, n_diff, n_adv)
        mdk = core.ModelData(params=params, derived=derived,
                             z_topo=c["z_topo"], glacier=c["glacier"], sf=sf)
        co2 = co2y_ref[tb // spy_b]
        state = ModelState(ts=s_scr[0], ta=s_scr[1], to=s_scr[2], q=s_scr[3],
                           cap_surf=s_scr[4])
        for i in range(SB):
            fx = yk._read_step_forcing(fpack_ref, sw_ref, i)
            corr_t = (corr_ref[:, i, 0], corr_ref[:, i, 1], corr_ref[:, i, 2])
            state, outs = core.scenario_step(state, fx, corr_t, co2, mdk, st,
                                             num, exp, unroll_circ=circ_unroll,
                                             fastcirc=fc_t)
            f5 = jnp.stack([outs.ts, outs.ta, outs.to, outs.q, outs.albedo],
                           axis=1)                       # (MB, 5, y, x)
            w = w_ref[(tb % spy_b) * SB + i]
            mon_out_ref[:, 0] = mon_out_ref[:, 0] + w * f5
            # annual sums of all 9 console fields, sequential f32 exactly
            # like the per-year kernel (reference src/greb.f90:944-948) —
            # both driver paths print identical diagnostics
            f9 = jnp.stack([getattr(outs, f)
                            for f in core.StepOutputs._fields], axis=1)
            amean_ref[:, 0] = amean_ref[:, 0] + f9
        for i, f in enumerate(("ts", "ta", "to", "q", "cap_surf")):
            s_scr[i] = getattr(state, f)

        @pl.when(tb == n_tb - 1)
        def _():
            out_state_ref[...] = s_scr[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # co2_years, mon_map, mstart, wstep
        grid=(M // mb, n_tb),
        in_specs=[
            pl.BlockSpec((5, mb, y, x),
                         lambda m, t, *s: (0, m, 0, 0)),        # state
            pl.BlockSpec((mb, 1, N_PPACK),
                         lambda m, t, *s: (m, 0, 0)),           # params
            pl.BlockSpec((SB, len(yk._FORCING_FIELDS), y, x),
                         lambda m, t, *s: (t % spy_b, 0, 0, 0)),  # forcing
            pl.BlockSpec((SB, y, 1),
                         lambda m, t, *s: (t % spy_b, 0, 0)),   # sw_solar
            pl.BlockSpec((len(yk._CONST_FIELDS), y, x),
                         lambda m, t, *s: (0, 0, 0)),           # consts
            pl.BlockSpec((n_sfp, y, 1), lambda m, t, *s: (0, 0, 0)),
            pl.BlockSpec((mb, SB, 3, y, x),
                         lambda m, t, *s: (m, t % spy_b, 0, 0, 0)),  # corr
        ] + [pl.BlockSpec(a.shape, (lambda nd: lambda m, t, *s: (0,) * nd)(
            a.ndim)) for a in fast_arrays],
        out_specs=[
            pl.BlockSpec((5, mb, y, x), lambda m, t, *s: (0, m, 0, 0)),
            pl.BlockSpec(
                (mb, 1, 5, y, x),
                lambda m, t, co2y, mon, mst, w: (
                    m, (t // spy_b) * nmon + mon[t % spy_b], 0, 0, 0)),
            pl.BlockSpec((mb, 1, 9, y, x),
                         lambda m, t, *s: (m, t // spy_b, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((5, mb, y, x), jnp.float32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((5, M, y, x), jnp.float32),
            jax.ShapeDtypeStruct((M, n_years * nmon, 5, y, x), jnp.float32),
            jax.ShapeDtypeStruct((M, n_years, 9, y, x), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # see year_kernel: refined-grid substep intermediates
            # exceed the default 16 MiB scoped-vmem stack
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )

    def run(state5, ppack, fpack, sw, cpack, corrpack, co2_years, *fast_args):
        co2_years = jnp.asarray(co2_years, jnp.float32)
        out_state, monthly, asum = call(co2_years, mon_map, mstart, wstep,
                                        state5, ppack, fpack, sw, cpack,
                                        sfpack, corrpack, *fast_args)
        return out_state, monthly, asum

    return run


def build_fluxcorr_years(md: core.ModelData, st: stc.StencilStatic,
                         sf_np: stc.StencilFields, num: Numerics,
                         exp: Experiment, n_members: int, mb: int = 1,
                         fastcirc=None, interpret: bool = False,
                         circ_unroll: int = 1):
    """Member-batched spin-up year: fn(state5 (5,M,y,x), ppack, fpack, sw,
    cpack, co2 scalar) -> (final_state (5,M,y,x), corr (M,t,3,y,x)).
    One call integrates ONE year (the reference re-learns the 730-slot
    tables each spin-up year, so the caller loops time_flux times;
    src/greb.f90:325-362)."""
    sf_np = yk.strip_itm(sf_np, fastcirc)
    y, x, t_steps = num.ydim, num.xdim, num.nstep_yr
    M = n_members
    assert M % mb == 0

    plan = fastcirc[0] if fastcirc is not None else None
    fast_arrays, fast_rebuild = yk._fast_pack(fastcirc)
    n_fast = len(fast_arrays)
    n_diff = sf_np.diff_itm.shape[0]
    n_adv = sf_np.adv_itm.shape[0]
    n_sfp = 7 + n_diff + n_adv
    sfpack = yk.pack_stencil_fields(sf_np)

    def kernel(co2_ref, state_ref, ppack_ref, fpack_ref, sw_ref, cpack_ref,
               sfp_ref, *rest):
        if fastcirc is not None:
            fc_t = (plan,) + fast_rebuild(rest[:n_fast])
        else:
            fc_t = None
        out_state_ref, corr_ref, s_scr = rest[n_fast:]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            s_scr[...] = state_ref[...]

        params, (cap_ocean, cap_land, cap_air) = _params_from_ppack(
            ppack_ref[...])
        c = {k: cpack_ref[i] for i, k in enumerate(yk._CONST_FIELDS)}
        derived = Derived(wz_air=c["wz_air"], wz_vapor=c["wz_vapor"],
                          z_ocean=c["z_ocean"], toclim=c["toclim"],
                          cap_ocean=cap_ocean, cap_land=cap_land,
                          cap_air=cap_air)
        sf = yk._unpack_stencil_fields(sfp_ref, n_diff, n_adv)
        mdk = core.ModelData(params=params, derived=derived,
                             z_topo=c["z_topo"], glacier=c["glacier"], sf=sf)
        fx = yk._read_step_forcing(fpack_ref, sw_ref)
        state = ModelState(ts=s_scr[0], ta=s_scr[1], to=s_scr[2], q=s_scr[3],
                           cap_surf=s_scr[4])
        co2 = co2_ref[0]
        state, (tf, tof, qf) = core.fluxcorr_step(
            state, fx, co2, mdk, st, num, exp, unroll_circ=circ_unroll,
            fastcirc=fc_t)
        for i, f in enumerate(("ts", "ta", "to", "q", "cap_surf")):
            s_scr[i] = getattr(state, f)
        corr_ref[:, 0, 0] = tf
        corr_ref[:, 0, 1] = tof
        corr_ref[:, 0, 2] = qf

        @pl.when(t == t_steps - 1)
        def _():
            out_state_ref[...] = s_scr[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,      # co2 (1,)
        grid=(M // mb, t_steps),
        in_specs=[
            pl.BlockSpec((5, mb, y, x), lambda m, t, *s: (0, m, 0, 0)),
            pl.BlockSpec((mb, 1, N_PPACK), lambda m, t, *s: (m, 0, 0)),
            pl.BlockSpec((1, len(yk._FORCING_FIELDS), y, x),
                         lambda m, t, *s: (t, 0, 0, 0)),
            pl.BlockSpec((1, y, 1), lambda m, t, *s: (t, 0, 0)),
            pl.BlockSpec((len(yk._CONST_FIELDS), y, x),
                         lambda m, t, *s: (0, 0, 0)),
            pl.BlockSpec((n_sfp, y, 1), lambda m, t, *s: (0, 0, 0)),
        ] + [pl.BlockSpec(a.shape, (lambda nd: lambda m, t, *s: (0,) * nd)(
            a.ndim)) for a in fast_arrays],
        out_specs=[
            pl.BlockSpec((5, mb, y, x), lambda m, t, *s: (0, m, 0, 0)),
            pl.BlockSpec((mb, 1, 3, y, x),
                         lambda m, t, *s: (m, t, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((5, mb, y, x), jnp.float32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((5, M, y, x), jnp.float32),
            jax.ShapeDtypeStruct((M, t_steps, 3, y, x), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # see year_kernel: refined-grid substep intermediates
            # exceed the default 16 MiB scoped-vmem stack
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )

    def run(state5, ppack, fpack, sw, cpack, co2, *fast_args):
        co2s = jnp.full((1,), co2, jnp.float32)
        return call(co2s, state5, ppack, fpack, sw, cpack, sfpack,
                    *fast_args)

    return run
