"""Multi-process worker for tests/test_multiprocess.py.

Each process brings up jax.distributed over localhost (CPU backend, 4
virtual devices per process), builds the SAME deterministic synthetic
model, runs one flux-correction + one scenario year latitude-sharded over
the GLOBAL 8-device mesh (halo ppermutes crossing the process boundary),
and checks its OWN addressable shards against a locally-computed unsharded
reference.  Exit code 0 + final "MP_OK" line = pass.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding  # noqa: E402

from greb_tpu.config import GrebConfig, Numerics  # noqa: E402
from greb_tpu.forcing import Corrections, forcing_from_arrays  # noqa: E402
from greb_tpu.io.synthetic import make_synthetic_forcing  # noqa: E402
from greb_tpu.model.driver import GREB  # noqa: E402
from greb_tpu.ops import fastcirc2 as fc2  # noqa: E402
from greb_tpu.parallel import multihost as mh  # noqa: E402
from greb_tpu.parallel.sharded import (_fastcirc_specs, _specs,  # noqa: E402
                                       make_sharded_year_runners)

CO2 = jnp.float32(680.0)
N_Y = 8
num = Numerics(ndays_yr=10, jday_mon=(6, 4), time_flux=1, time_scnr=1)

forcing = forcing_from_arrays(
    make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr))
m = GREB(GrebConfig(numerics=num, fast_circulation=True), forcing=forcing,
         verbose=False)

# --- local unsharded reference (every process computes the same one) -----
plan, fcdata = m._fastcirc_split()
state0 = m.initial_state()
fl, sc = m._year_fluxcorr(), m._year_scenario()
s_ref, corr_ref = fl(state0, m.sfx, CO2, m.md, fcdata)
_, mon_ref, _ = sc(s_ref, m.sfx, corr_ref, CO2, m.md, fcdata)
mon_ref = np.asarray(mon_ref)

# --- global mesh spanning both processes ----------------------------------
mesh = mh.global_mesh(n_ens=1, n_y=N_Y)
lo, hi = mh.host_local_rows(mesh, num.ydim)
rows = num.ydim // N_Y
assert hi - lo == rows * (N_Y // nproc), (lo, hi)
assert lo == pid * (num.ydim // nproc), (pid, lo)


def put_global(tree, specs):
    """Globally-sharded device_put: every process holds the full host value
    and materializes only its own shards (multi-process-safe, unlike
    jax.device_put to non-addressable devices)."""
    def put(x, sp):
        if x is None:
            return None
        x = np.asarray(x)
        return mh.make_global_array(mesh, sp, x.shape,
                                    lambda idx, x=x: x[idx])
    return jax.tree.map(put, tree, specs, is_leaf=lambda x: x is None)


splan, sconst = fc2.build_sharded(
    np.asarray(m.derived.wz_air), np.asarray(m.derived.wz_vapor),
    m.grid, m.st, kappa=float(m.params.kappa), n_shards=N_Y)
sconst_sh = put_global(sconst, _fastcirc_specs())
flux_sh, scnr_sh = make_sharded_year_runners(mesh, m.st, num, m.exp,
                                             m.month_mat, fast_plan=splan)
s_state, s_sfx, s_corr, s_md, s_monthly, _ = _specs(False)
state_s = put_global(state0, s_state)
sfx_s = put_global(m.sfx, s_sfx)
md_s = put_global(m.md, s_md)

s_sh, corr_sh = flux_sh(state_s, sfx_s, CO2, md_s, sconst_sh)
_, mon_sh, _ = scnr_sh(s_sh, sfx_s, corr_sh, CO2, md_s, sconst_sh)

# --- compare THIS process's shards against the reference rows -------------
checked = 0
for shard in mon_sh.addressable_shards:
    idx = shard.index            # (months, vars, y, x) global slices
    np.testing.assert_allclose(np.asarray(shard.data), mon_ref[idx],
                               rtol=0, atol=2e-2)
    checked += 1
assert checked >= 1
for shard in s_sh.ts.addressable_shards:
    ref = np.asarray(s_ref.ts)[shard.index]
    np.testing.assert_array_equal(np.asarray(shard.data), ref)

jax.distributed.shutdown()
print(f"MP_OK process {pid}: {checked} monthly shards matched "
      f"rows [{lo},{hi})")
