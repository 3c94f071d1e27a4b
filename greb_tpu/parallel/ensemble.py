"""vmapped physics-perturbed ensembles.

The reference supports ensembles only as separate processes writing
``output_file_ens-id`` files (src/greb.f90:153,1064-1068).  TPU-natively, an
ensemble is ``jax.vmap`` of the whole year-runner over a stacked
PhysicsParams pytree (every "constant" is a traced leaf) + stacked state and
correction tables.  Forcing and grid constants stay unbatched (broadcast).

Note: parameters that define the static polar sub-cycling schedule (kappa,
pi — see grid.make_grid) keep the BASE member's schedule for all members;
the coefficients themselves follow each member's values.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PhysicsParams
from ..forcing import ClimForcing, Corrections, build_derived, initial_state
from ..model import core

F32 = np.float32


def stack_params(members: Sequence[PhysicsParams]) -> PhysicsParams:
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *members)


def perturbed_params(base: PhysicsParams, perturb: Dict[str, np.ndarray]
                     ) -> PhysicsParams:
    """Batch ``base`` with per-member values for the keys in ``perturb``
    (each an (n_members,) array); other leaves are broadcast-stacked."""
    n = len(next(iter(perturb.values())))
    members = []
    for i in range(n):
        members.append(base.replace(**{k: np.float32(v[i])
                                       for k, v in perturb.items()}))
    return stack_params(members)


def ensemble_data(params_batched: PhysicsParams, forcing: ClimForcing,
                  sf) -> core.ModelData:
    """Per-member derived constants via vmap(build_derived)."""
    derived = jax.vmap(lambda p: build_derived(p, forcing))(params_batched)
    return core.ModelData(params=params_batched, derived=derived,
                          z_topo=forcing.z_topo, glacier=forcing.glacier,
                          sf=sf)


_MD_AXES = core.ModelData(params=0, derived=0, z_topo=None, glacier=None,
                          sf=None)


def ensemble_initial_state(params_batched: PhysicsParams,
                           forcing: ClimForcing, md: core.ModelData):
    return jax.vmap(lambda p, d: initial_state(p, forcing, d))(
        params_batched, md.derived)


# Params whose perturbation changes the circulation OPERATOR itself — the
# shared fast-circulation coefficient tables are invalid if any of these
# varies across members (kappa scales the stencils; z_air/z_vapor set the
# wz topography weights baked into the coefficients; pi sets grid metrics).
TRANSPORT_PARAM_KEYS = frozenset({"kappa", "z_air", "z_vapor", "pi"})


def fastcirc_shareable(perturb_keys) -> bool:
    """True if one fast-circulation coefficient table can serve all members
    perturbed over ``perturb_keys``."""
    return not (set(perturb_keys) & TRANSPORT_PARAM_KEYS)


def make_ensemble_runners(st, num, exp, month_mat, extend=None,
                          unroll_circ: bool = False, fast_plan=None):
    """Returns jitted (fluxcorr_year, scenario_year) vmapped over members.

    fluxcorr_year(state_B, sfx, co2_scalar, md_B, fcdata=None)
        -> (state_B, corr_B)
    scenario_year(state_B, sfx, corr_B, co2_scalar, md_B, fcdata=None)
        -> (state_B, monthly_B, mean_fields_B)

    ``fcdata = (FastConst,)`` (with the matching static ``fast_plan``)
    enables the coefficient-folded circulation SHARED across members — only
    valid when no transport parameter is perturbed (fastcirc_shareable);
    constants are broadcast, never batched."""
    from ..ops import stencils as stc
    extend = extend or stc.extend_lat_zero

    def _fcirc(fcdata):
        return ((fast_plan,) + tuple(fcdata)) if fcdata is not None else None

    def flux_one(state, sfx, co2, md, fcdata):
        return core.run_year_fluxcorr(state, sfx, co2, md, st, num, exp,
                                      extend, unroll_circ,
                                      fastcirc=_fcirc(fcdata))

    def scnr_one(state, sfx, corr, co2, md, fcdata):
        return core.run_year_scenario(state, sfx, corr, co2, md, st, num,
                                      exp, month_mat, extend, unroll_circ,
                                      fastcirc=_fcirc(fcdata))

    flux_v = jax.jit(jax.vmap(flux_one,
                              in_axes=(0, None, None, _MD_AXES, None)))
    scnr_v = jax.jit(jax.vmap(scnr_one,
                              in_axes=(0, None, 0, None, _MD_AXES, None)))

    def flux_call(state, sfx, co2, md, fcdata=None):
        return flux_v(state, sfx, co2, md, fcdata)

    def scnr_call(state, sfx, corr, co2, md, fcdata=None):
        return scnr_v(state, sfx, corr, co2, md, fcdata)

    return flux_call, scnr_call
