"""Figure layer: every plot renders and writes a non-trivial PNG
(matplotlib Agg; mirrors the reference R figures, README.md:26-56)."""
import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from greb_tpu import plots  # noqa: E402


def _fake_monthly(years=3, nlat=48, nlon=96):
    rng = np.random.default_rng(0)
    m = rng.normal(size=(years, 12, 5, nlat, nlon)).astype(np.float32)
    m[:, :, 0] += 288.0          # tsurf [K]
    m[:, :, 4] = np.clip(0.2 + 0.1 * m[:, :, 4], 0, 1)  # albedo
    return m


def test_warming_curve_accepts_kelvin_and_celsius():
    f1 = plots.warming_curve([288.1, 288.5, 289.0])
    f2 = plots.warming_curve([15.0, 15.4, 15.9], years=[2000, 2001, 2002],
                             co2_ppm=680)
    a1 = f1.axes[0].lines[0].get_ydata()
    a2 = f2.axes[0].lines[0].get_ydata()
    np.testing.assert_allclose(a1[0], 288.1 - 273.15, atol=1e-6)
    np.testing.assert_allclose(a2[-1], 15.9, atol=1e-6)


def test_maps_render(tmp_path):
    m = _fake_monthly()
    fig = plots.albedo_map(m[0, 8, 4])
    # arctic-only: latitude range restricted
    ax = fig.axes[0]
    assert ax.get_ylim()[0] >= 55.0
    fig2 = plots.anomaly_map(m[-1, :, 0].mean(0) - m[0, :, 0].mean(0))
    # diverging scale symmetric about zero
    im = fig2.axes[0].collections[0]
    lo, hi = im.get_clim()
    assert lo == -hi
    p = tmp_path / "a.png"
    fig.savefig(p)
    assert p.stat().st_size > 2000


def test_save_all_writes_figure_set(tmp_path, setup):
    m = _fake_monthly()
    paths = plots.save_all(str(tmp_path / "fig"), m, diags=None,
                           forcing=setup.forcing)
    assert len(paths) >= 5
    for p in paths:
        import os
        assert os.path.getsize(p) > 2000


def test_input_field_plots(setup):
    f = plots.land_sea_mask_plot(np.asarray(setup.forcing.z_topo))
    assert f.axes[0].collections
    f2 = plots.wind_quiver(np.asarray(setup.forcing.uclim[0]),
                           np.asarray(setup.forcing.vclim[0]))
    assert f2.axes[0].collections


def test_coastline_overlay(tmp_path):
    """Maps carry the coastline overlay (reference R/functions.R:113-118
    save_ne_coast; here derived from the model's own z_topo land-sea
    boundary since no external datasets exist offline)."""
    import numpy as np
    from greb_tpu import plots
    rng = np.random.default_rng(0)
    z = rng.standard_normal((48, 96)) * 1000.0
    fig = plots.albedo_map(rng.random((48, 96)), z_topo=z)
    # a contour collection was added on top of the pcolormesh
    assert len(fig.axes[0].collections) >= 2
    fig2 = plots.anomaly_map(rng.standard_normal((48, 96)), z_topo=z)
    assert len(fig2.axes[0].collections) >= 2
