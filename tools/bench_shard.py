"""Sharded-throughput benchmark on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so absolute
numbers are CPU-bound; what this records is that the latitude-sharded FAST
path executes end-to-end and how it scales with shard count on the same
total problem (the collective/halo structure is identical on ICI).

Usage:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N
        python tools/bench_shard.py [n_shards] [XxY]
Prints: one line "shard[N] <rate> sim-yr/s grid=XxY".
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.forcing import Corrections, forcing_from_arrays
from greb_tpu.io.synthetic import make_synthetic_forcing
from greb_tpu.model.driver import GREB
from greb_tpu.ops import fastcirc2 as fc2
from greb_tpu.parallel.sharded import (make_mesh, make_sharded_year_runners,
                                       shard_fastcirc, shard_inputs)


def main():
    n_y = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    gx, gy = ((int(s) for s in sys.argv[2].lower().split("x"))
              if len(sys.argv) > 2 else (192, 96))
    num = Numerics(xdim=gx, ydim=gy, time_flux=1, time_scnr=1)
    if (gx, gy) != (96, 48):
        from greb_tpu.regrid import regrid_forcing_arrays
        arrs = make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr)
        forcing = forcing_from_arrays(regrid_forcing_arrays(arrs, num))
    else:
        forcing = forcing_from_arrays(
            make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr))
    m = GREB(GrebConfig(numerics=num, fast_circulation=True),
             forcing=forcing, verbose=False)
    mesh = make_mesh(n_ens=1, n_y=n_y)
    splan, sconst = fc2.build_sharded(
        np.asarray(m.derived.wz_air), np.asarray(m.derived.wz_vapor),
        m.grid, m.st, kappa=float(m.params.kappa), n_shards=n_y)
    sconst_sh = shard_fastcirc(mesh, sconst)
    flux_sh, scnr_sh = make_sharded_year_runners(mesh, m.st, num, m.exp,
                                                 m.month_mat,
                                                 fast_plan=splan)
    co2 = jnp.float32(680.0)
    corr0 = Corrections.zeros(num.nstep_yr, num.ydim, num.xdim)
    state_s, sfx_s, _, md_s = shard_inputs(mesh, False, m.initial_state(),
                                           m.sfx, corr0, m.md)
    s, corr = flux_sh(state_s, sfx_s, co2, md_s, sconst_sh)
    s, mon, _ = scnr_sh(s, sfx_s, corr, co2, md_s, sconst_sh)
    jax.block_until_ready(s.ts)
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        s, mon, _ = scnr_sh(s, sfx_s, corr, co2, md_s, sconst_sh)
    jax.block_until_ready(s.ts)
    rate = reps / (time.perf_counter() - t0)
    assert np.isfinite(np.asarray(mon)).all()
    print(f"shard[{n_y}] {rate:.3f} sim-yr/s grid={gx}x{gy} "
          f"(virtual CPU mesh)")


if __name__ == "__main__":
    main()
