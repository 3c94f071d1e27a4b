"""Whole-year fused Pallas TPU kernel.

The reference integrates 730 sequential 12-h steps per year, each with 24
circulation substeps (src/greb.f90:239-274, 528-553).  At 96x48 the fields
are tiny (18 KB), so an XLA op-by-op execution is dominated by per-kernel
dispatch: every one of the ~35,000 substeps/yr pays multiple kernel launches.

This module fuses an ENTIRE YEAR into one ``pallas_call``:

* grid = (nstep_yr,) — TPU grids execute sequentially on a core, so the
  step-to-step data dependence maps onto grid order, with the prognostic
  state held in a VMEM scratch buffer that persists across grid steps.
* per-step forcing (and correction tables) are streamed HBM->VMEM by the
  Pallas pipeline (automatic double buffering) via block index maps t->(t,.).
* per-step outputs stream back to HBM; monthly means stay one einsum outside
  (MXU), exactly like the XLA path.
* the step math inside the kernel body IS the shared implementation
  (model.core.scenario_step / fluxcorr_step — no duplicated physics).

Constants (physics params, stencil schedules) are baked concrete at kernel
build time; ensembles with traced per-member params use the XLA path
(parallel.ensemble) instead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import Experiment, Numerics, PhysicsParams
from ...forcing import Corrections, Derived, ModelState
from ...model import core
from ...ops import fastcirc as fcirc
from ...ops import fastcirc2 as fcirc2
from ...ops import stencils as stc

F32 = np.float32

# streamed per-step forcing fields, in pack order
_FORCING_FIELDS = ("tclim", "qclim", "swet", "u", "v", "mld", "mld_prev", "cld")
# constant (y, x) fields, in pack order
_CONST_FIELDS = ("z_topo", "glacier", "wz_air", "wz_vapor", "z_ocean", "toclim")
# The scenario kernel streams only the 5 output variables the reference
# writes (Tsurf, Tair, Tocean, q, albedo; src/greb.f90:978-982).  The 4
# console-diagnostic extras (sw, lw_surf, q_lat, q_sens annual means) are
# an XLA-path feature; streaming them measured +0.5 us/step for data the
# reference never outputs.
N_OUT = 5


def concrete_params(params: PhysicsParams) -> PhysicsParams:
    """Physics params with concrete python-float leaves (p_emi as a tuple),
    for baking into the kernel trace."""
    d = {}
    for f in PhysicsParams.__dataclass_fields__:
        v = np.asarray(getattr(params, f))
        d[f] = tuple(float(x) for x in v) if v.ndim == 1 else float(v)
    return PhysicsParams(**d)


def pack_forcing(sfx: core.StepForcing) -> Tuple[jax.Array, jax.Array]:
    """(t, 8, y, x) forcing pack + (t, y, 1) insolation column."""
    fpack = jnp.stack([getattr(sfx, k) for k in _FORCING_FIELDS], axis=1)
    sw = sfx.sw_solar
    if sw.ndim == 2:  # (t, y) -> (t, y, 1)
        sw = sw[..., None]
    return fpack, sw


def pack_const(md: core.ModelData) -> jax.Array:
    d = md.derived
    fields = dict(z_topo=md.z_topo, glacier=md.glacier, wz_air=d.wz_air,
                  wz_vapor=d.wz_vapor, z_ocean=d.z_ocean, toclim=d.toclim)
    return jnp.stack([fields[k] for k in _CONST_FIELDS], axis=0)


def pack_stencil_fields(sf_np: stc.StencilFields) -> jax.Array:
    """All per-row stencil constants as one (K, R, 1) f32 array (Pallas
    kernels cannot capture array constants; bools travel as 0/1)."""
    parts = [sf_np.dxlat2, sf_np.diff_dtdff2, sf_np.adv_ccx2, sf_np.ccx_adv,
             np.asarray(sf_np.polar, F32), np.asarray(sf_np.row_mfull, F32),
             np.asarray(sf_np.row_pfull, F32)]
    parts += [sf_np.diff_itm[i] for i in range(sf_np.diff_itm.shape[0])]
    parts += [sf_np.adv_itm[i] for i in range(sf_np.adv_itm.shape[0])]
    return jnp.asarray(np.stack([np.asarray(a, F32) for a in parts]))


def strip_itm(sf_np: stc.StencilFields, fastcirc) -> stc.StencilFields:
    """Drop the strict path's per-iteration masks when the folded
    circulation is active — the kernel never touches them, and at
    extension grids they are (max_iter, Y, 1) stacks with max_iter in the
    THOUSANDS whose lane-padded VMEM window (x128 on the size-1 last dim)
    alone exceeds the chip's 128 MiB VMEM."""
    if fastcirc is None:
        return sf_np
    y = sf_np.dxlat2.shape[0]
    empty = np.zeros((0, y, 1), F32)
    return stc.StencilFields(
        dxlat2=sf_np.dxlat2, diff_dtdff2=sf_np.diff_dtdff2,
        adv_ccx2=sf_np.adv_ccx2, ccx_adv=sf_np.ccx_adv, polar=sf_np.polar,
        row_mfull=sf_np.row_mfull, row_pfull=sf_np.row_pfull,
        diff_itm=empty, adv_itm=empty)


def _unpack_stencil_fields(sfp_ref, n_diff: int, n_adv: int) -> stc.StencilFields:
    i = 7
    diff_itm = jnp.stack([sfp_ref[i + k] for k in range(n_diff)]) \
        if n_diff else jnp.zeros((1,) + sfp_ref[0].shape, jnp.float32)
    adv_itm = jnp.stack([sfp_ref[i + n_diff + k] for k in range(n_adv)]) \
        if n_adv else jnp.zeros((1,) + sfp_ref[0].shape, jnp.float32)
    return stc.StencilFields(
        dxlat2=sfp_ref[0], diff_dtdff2=sfp_ref[1], adv_ccx2=sfp_ref[2],
        ccx_adv=sfp_ref[3], polar=sfp_ref[4] > 0.5,
        row_mfull=sfp_ref[5] > 0.5, row_pfull=sfp_ref[6] > 0.5,
        diff_itm=diff_itm, adv_itm=adv_itm)


def _kernel_model_data(cpack_ref, sfp_ref, md_template: core.ModelData,
                       n_diff: int, n_adv: int) -> core.ModelData:
    """Rebuild a ModelData whose array leaves live in VMEM."""
    c = {k: cpack_ref[i] for i, k in enumerate(_CONST_FIELDS)}
    params = md_template.params            # already concrete floats
    d0 = md_template.derived
    derived = Derived(wz_air=c["wz_air"], wz_vapor=c["wz_vapor"],
                      z_ocean=c["z_ocean"], toclim=c["toclim"],
                      cap_ocean=d0.cap_ocean, cap_land=d0.cap_land,
                      cap_air=d0.cap_air)
    sf = _unpack_stencil_fields(sfp_ref, n_diff, n_adv)
    return core.ModelData(params=params, derived=derived, z_topo=c["z_topo"],
                          glacier=c["glacier"], sf=sf)


def _read_step_forcing(fpack_ref, sw_ref, t: int = 0) -> core.StepForcing:
    f = {k: fpack_ref[t, i] for i, k in enumerate(_FORCING_FIELDS)}
    return core.StepForcing(tclim=f["tclim"], qclim=f["qclim"], swet=f["swet"],
                            u=f["u"], v=f["v"], mld=f["mld"],
                            mld_prev=f["mld_prev"], cld=f["cld"],
                            sw_solar=sw_ref[t])          # (y, 1) column


def _state_from_scratch(s_ref) -> ModelState:
    return ModelState(ts=s_ref[0], ta=s_ref[1], to=s_ref[2], q=s_ref[3],
                      cap_surf=s_ref[4])


def _state_to_refs(s_ref, out_state_ref, state: ModelState) -> None:
    for i, f in enumerate(("ts", "ta", "to", "q", "cap_surf")):
        v = getattr(state, f)
        s_ref[i] = v
        out_state_ref[i] = v



def _fast_pack(fastcirc):
    """(arrays, rebuild) for either fold's constant pytree: the arrays are
    streamed to VMEM as kernel inputs; ``rebuild(refs)`` reconstructs the
    tail of the fastcirc tuple (everything after the static plan) from the
    corresponding refs inside the kernel, so kernels do
    ``fc_t = (plan,) + rebuild(refs)``.  Bool leaves travel as 0/1 float32.
    An optional third tuple element (fastcirc2.MxuMembers) switches the
    member-batched kernels to the in-kernel MXU circulation."""
    if fastcirc is None:
        return (), None
    plan, const = fastcirc[0], fastcirc[1]
    mm = fastcirc[2] if len(fastcirc) > 2 else None
    if isinstance(const, fcirc2.Fast2Const):
        pmask = (const.pmask if const.pmask is not None
                 else jnp.zeros((1, 1), jnp.float32))
        arrays = (const.zd, const.zam, const.mer, const.wz,
                  const.band.astype(jnp.float32), const.pcomp, const.pcu,
                  const.pcw, pmask)

        def rebuild_const(refs):
            zd, zam, mer, wz, band, pcomp, pcu, pcw, pmask = (
                r[...] for r in refs)
            return fcirc2.Fast2Const(zd=zd, zam=zam, mer=mer, wz=wz,
                                     band=band > 0.5, pcomp=pcomp,
                                     pcu=pcu, pcw=pcw, pmask=pmask)
    else:
        arrays = (const.full, const.band, const.pcomp, const.pcu, const.pcw)

        def rebuild_const(refs):
            full, band, pcomp, pcu, pcw = (r[...] for r in refs)
            return fcirc.FastConst(full=full, band=band, pcomp=pcomp,
                                   pcu=pcu, pcw=pcw)

    if mm is None:
        def rebuild(refs):
            return (rebuild_const(refs),)
        return arrays, rebuild

    n_const = len(arrays)
    arrays = arrays + (mm.zd_mat, mm.shift1h)

    def rebuild(refs):
        const_t = rebuild_const(refs[:n_const])
        zd_mat, shift1h = (r[...] for r in refs[n_const:])
        return (const_t, fcirc2.MxuMembers(zd_mat=zd_mat, shift1h=shift1h,
                                           precision=mm.precision))

    return arrays, rebuild


def _fast_in_specs(fastcirc):
    """Extra BlockSpecs for the fast-circulation CONSTANTS (the per-step
    coefficients are assembled in-kernel from these + the step's winds)."""
    arrays, _ = _fast_pack(fastcirc)
    return [pl.BlockSpec(a.shape, (lambda nd: lambda t: (0,) * nd)(a.ndim))
            for a in arrays]


def _fast_args(fastcirc):
    arrays, _ = _fast_pack(fastcirc)
    return arrays


def default_sb(t_steps: int) -> int:
    """Steps per grid iteration: amortizes the per-grid-step pipeline
    overhead over SB sequential steps.  Tuned on TPU v5e (see bench.py)."""
    for sb in (10, 5, 2):
        if t_steps % sb == 0:
            return sb
    return 1


def build_scenario_year(md: core.ModelData, st: stc.StencilStatic,
                        sf_np: stc.StencilFields, num: Numerics,
                        exp: Experiment, interpret: bool = False,
                        circ_unroll: int = 1, fastcirc=None,
                        sb: int = 0):
    """Returns fn(state, fpack, sw, cpack, corrpack, co2) ->
    (final_state (5,y,x), outs (t, 9, y, x)) running one scenario year in a
    single fused kernel.  With ``fastcirc=(FastPlan, FastConst, FastCoeffs)``
    the circulation uses the coefficient-folded path, with the per-step
    coefficient tables streamed HBM->VMEM by the Pallas pipeline."""
    sf_np = strip_itm(sf_np, fastcirc)
    y, x, t_steps = num.ydim, num.xdim, num.nstep_yr
    SB = sb if sb and t_steps % sb == 0 else default_sb(t_steps)
    md_c = core.ModelData(params=concrete_params(md.params),
                          derived=Derived(
                              wz_air=None, wz_vapor=None, z_ocean=None,
                              toclim=None,
                              cap_ocean=float(np.asarray(md.derived.cap_ocean)),
                              cap_land=float(np.asarray(md.derived.cap_land)),
                              cap_air=float(np.asarray(md.derived.cap_air))),
                          z_topo=None, glacier=None, sf=None)

    n_diff = sf_np.diff_itm.shape[0]
    n_adv = sf_np.adv_itm.shape[0]
    n_sfp = 7 + n_diff + n_adv

    plan = fastcirc[0] if fastcirc is not None else None
    fast_arrays, fast_rebuild = _fast_pack(fastcirc)
    n_fast = len(fast_arrays)

    n_all = len(core.StepOutputs._fields)

    def kernel(co2_ref, state_ref, fpack_ref, sw_ref, cpack_ref, sfp_ref,
               corr_ref, *rest):
        if fastcirc is not None:
            fc_t = (plan,) + fast_rebuild(rest[:n_fast])
        else:
            fc_t = None
        out_state_ref, outs_ref, amean_ref, s_scr = rest[n_fast:]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            s_scr[...] = state_ref[...]
            amean_ref[...] = jnp.zeros(amean_ref.shape, amean_ref.dtype)

        mdk = _kernel_model_data(cpack_ref, sfp_ref, md_c, n_diff, n_adv)
        co2 = co2_ref[0, 0]
        state = _state_from_scratch(s_scr)
        for i in range(SB):
            fx = _read_step_forcing(fpack_ref, sw_ref, i)
            corr_t = (corr_ref[i, 0], corr_ref[i, 1], corr_ref[i, 2])
            state, outs = core.scenario_step(state, fx, corr_t, co2, mdk, st,
                                             num, exp,
                                             unroll_circ=circ_unroll,
                                             fastcirc=fc_t)
            for j, f in enumerate(core.StepOutputs._fields[:N_OUT]):
                outs_ref[i, j] = getattr(outs, f)
            # annual accumulators of ALL 9 console fields, sequential f32
            # sums exactly like the reference's (src/greb.f90:944-948);
            # the multi-year kernel accumulates identically, so both
            # driver paths print the same numbers (VERDICT r3 task 8)
            for j, f in enumerate(core.StepOutputs._fields):
                amean_ref[j] = amean_ref[j] + getattr(outs, f)
        _state_to_refs(s_scr, out_state_ref, state)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(t_steps // SB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # co2 (1,1)
            pl.BlockSpec((5, y, x), lambda t: (0, 0, 0)),          # state
            pl.BlockSpec((SB, len(_FORCING_FIELDS), y, x),
                         lambda t: (t, 0, 0, 0)),                  # forcing
            pl.BlockSpec((SB, y, 1), lambda t: (t, 0, 0)),         # sw_solar
            pl.BlockSpec((len(_CONST_FIELDS), y, x),
                         lambda t: (0, 0, 0)),                     # consts
            pl.BlockSpec((n_sfp, y, 1), lambda t: (0, 0, 0)),      # stencil rows
            pl.BlockSpec((SB, 3, y, x), lambda t: (t, 0, 0, 0)),   # corr
        ] + _fast_in_specs(fastcirc),
        out_specs=[
            pl.BlockSpec((5, y, x), lambda t: (0, 0, 0)),          # final state
            pl.BlockSpec((SB, N_OUT, y, x), lambda t: (t, 0, 0, 0)),  # outs
            pl.BlockSpec((n_all, y, x), lambda t: (0, 0, 0)),      # annual sums
        ],
        scratch_shapes=[pltpu.VMEM((5, y, x), jnp.float32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((5, y, x), jnp.float32),
            jax.ShapeDtypeStruct((t_steps, N_OUT, y, x), jnp.float32),
            jax.ShapeDtypeStruct((n_all, y, x), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # refined grids: the substep intermediates exceed the
            # default 16 MiB scoped-vmem stack (23 MiB at 384x192);
            # the chip has 128 MiB of VMEM (measured; PERF.md)
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )

    sfpack = pack_stencil_fields(sf_np)

    def run(state: ModelState, fpack, sw, cpack, corrpack, co2,
            *fast_args):
        state5 = jnp.stack([state.ts, state.ta, state.to, state.q,
                            state.cap_surf])
        co2s = jnp.full((1, 1), co2, jnp.float32)
        out_state, outs, asum = call(co2s, state5, fpack, sw, cpack, sfpack,
                                     corrpack, *fast_args)
        new_state = ModelState(ts=out_state[0], ta=out_state[1],
                               to=out_state[2], q=out_state[3],
                               cap_surf=out_state[4])
        return new_state, outs, asum

    return run


def build_fluxcorr_year(md: core.ModelData, st: stc.StencilStatic,
                        sf_np: stc.StencilFields, num: Numerics,
                        exp: Experiment, interpret: bool = False,
                        circ_unroll: int = 1, fastcirc=None):
    """Returns fn(state, fpack, sw, cpack, co2) ->
    (final_state (5,y,x), corr (t, 3, y, x)) — one spin-up year fused."""
    sf_np = strip_itm(sf_np, fastcirc)
    y, x, t_steps = num.ydim, num.xdim, num.nstep_yr
    md_c = core.ModelData(params=concrete_params(md.params),
                          derived=Derived(
                              wz_air=None, wz_vapor=None, z_ocean=None,
                              toclim=None,
                              cap_ocean=float(np.asarray(md.derived.cap_ocean)),
                              cap_land=float(np.asarray(md.derived.cap_land)),
                              cap_air=float(np.asarray(md.derived.cap_air))),
                          z_topo=None, glacier=None, sf=None)

    n_diff = sf_np.diff_itm.shape[0]
    n_adv = sf_np.adv_itm.shape[0]
    n_sfp = 7 + n_diff + n_adv

    plan = fastcirc[0] if fastcirc is not None else None
    fast_arrays, fast_rebuild = _fast_pack(fastcirc)
    n_fast = len(fast_arrays)

    def kernel(co2_ref, state_ref, fpack_ref, sw_ref, cpack_ref, sfp_ref,
               *rest):
        if fastcirc is not None:
            fc_t = (plan,) + fast_rebuild(rest[:n_fast])
        else:
            fc_t = None
        out_state_ref, corr_ref, s_scr = rest[n_fast:]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            s_scr[...] = state_ref[...]

        mdk = _kernel_model_data(cpack_ref, sfp_ref, md_c, n_diff, n_adv)
        fx = _read_step_forcing(fpack_ref, sw_ref)
        state = _state_from_scratch(s_scr)
        co2 = co2_ref[0, 0]

        new_state, (tf, tof, qf) = core.fluxcorr_step(
            state, fx, co2, mdk, st, num, exp, unroll_circ=circ_unroll,
            fastcirc=fc_t)
        _state_to_refs(s_scr, out_state_ref, new_state)
        corr_ref[0, 0] = tf
        corr_ref[0, 1] = tof
        corr_ref[0, 2] = qf

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(t_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((5, y, x), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, len(_FORCING_FIELDS), y, x),
                         lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, y, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((len(_CONST_FIELDS), y, x), lambda t: (0, 0, 0)),
            pl.BlockSpec((n_sfp, y, 1), lambda t: (0, 0, 0)),      # stencil rows
        ] + _fast_in_specs(fastcirc),
        out_specs=[
            pl.BlockSpec((5, y, x), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, 3, y, x), lambda t: (t, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((5, y, x), jnp.float32)],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((5, y, x), jnp.float32),
            jax.ShapeDtypeStruct((t_steps, 3, y, x), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # refined grids: the substep intermediates exceed the
            # default 16 MiB scoped-vmem stack (23 MiB at 384x192);
            # the chip has 128 MiB of VMEM (measured; PERF.md)
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )

    sfpack = pack_stencil_fields(sf_np)

    def run(state: ModelState, fpack, sw, cpack, co2, *fast_args):
        state5 = jnp.stack([state.ts, state.ta, state.to, state.q,
                            state.cap_surf])
        co2s = jnp.full((1, 1), co2, jnp.float32)
        out_state, corrpack = call(co2s, state5, fpack, sw, cpack, sfpack,
                                   *fast_args)
        new_state = ModelState(ts=out_state[0], ta=out_state[1],
                               to=out_state[2], q=out_state[3],
                               cap_surf=out_state[4])
        return new_state, corrpack

    return run
