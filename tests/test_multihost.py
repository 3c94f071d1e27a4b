"""Multi-host helpers on the 8-virtual-device CPU mesh (single process, so
process-boundary behavior is exercised structurally; sharded halo exchange
itself is covered by the sharded-runner tests / dryrun_multichip)."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from greb_tpu.io.synthetic import make_synthetic_forcing
from greb_tpu.parallel.multihost import (global_mesh, host_local_rows,
                                         make_global_array,
                                         make_global_forcing)


def test_global_mesh_all_devices():
    mesh = global_mesh(n_ens=2)
    assert mesh.shape["ens"] * mesh.shape["y"] == len(jax.devices())


def test_host_local_rows_cover_grid():
    mesh = global_mesh(n_ens=1)
    lo, hi = host_local_rows(mesh, 48)
    # single process owns everything
    assert (lo, hi) == (0, 48)


def test_make_global_array_sharded():
    mesh = global_mesh(n_ens=1)
    n_y = mesh.shape["y"]
    data = np.arange(48 * 96, dtype=np.float32).reshape(48, 96)
    calls = []

    def fill(idx):
        calls.append(idx)
        return data[idx]

    arr = make_global_array(mesh, P("y", None), data.shape, fill)
    assert arr.shape == (48, 96)
    np.testing.assert_array_equal(np.asarray(arr), data)
    assert len(calls) >= n_y  # one per local shard (dedup may merge)


def test_make_global_forcing_specs():
    mesh = global_mesh(n_ens=1)
    arrs = make_synthetic_forcing(32, 16, 4, 2)
    g = make_global_forcing(mesh, arrs)
    assert g["tclim"].shape == arrs["tclim"].shape
    np.testing.assert_array_equal(np.asarray(g["z_topo"]), arrs["z_topo"])
    np.testing.assert_array_equal(np.asarray(g["sw_solar"]), arrs["sw_solar"])
    # sharding layout: y rows split across the mesh
    shard_rows = {s.index[1].start for s in g["tclim"].addressable_shards
                  if s.index[1].start is not None}
    assert len(shard_rows) == mesh.shape["y"] or mesh.shape["y"] == 1
