"""Probe: the fused multi-year Pallas kernel at 384x192 (config 4).

Round 3 gated Pallas off beyond ~128x256 on a 16 MiB VMEM assumption; the
chip actually has 128 MiB (PERF.md round-4 correction).  This measures
whether the fused kernel (state resident in scratch, forcing/corrections
streamed per substep) compiles and what it delivers at the refined grid.

Usage: python tools/probe384.py [WxH] [n_years]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from greb_tpu.config import GrebConfig, Numerics
    from greb_tpu.forcing import forcing_from_arrays
    from greb_tpu.io.synthetic import make_synthetic_forcing
    from greb_tpu.model.driver import GREB
    from greb_tpu.regrid import regrid_forcing_arrays

    grid = sys.argv[1] if len(sys.argv) > 1 else "384x192"
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    gx, gy = (int(s) for s in grid.lower().split("x"))
    dtc = int(os.environ.get("GREB_DT_CRCL", "1800"))

    num = Numerics(xdim=gx, ydim=gy, dt_crcl=dtc, time_flux=1, time_scnr=ny)
    arrs = make_synthetic_forcing(96, 48, num.nstep_yr, num.ndays_yr)
    forcing = forcing_from_arrays(regrid_forcing_arrays(arrs, num))
    m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True),
             forcing=forcing, verbose=False)
    print(f"# grid {gx}x{gy} dt_crcl={dtc} extension={m.grid.extension_mode} "
          f"diff_max_iter={m.grid.diff_sched.max_iter} "
          f"adv_max_iter={m.grid.adv_sched.max_iter}", flush=True)

    # spin-up on the XLA path (the gate blocks pallas there anyway)
    t0 = time.perf_counter()
    state_fc, corr = m.flux_correction()
    jax.block_until_ready(state_fc.ts)
    print(f"# flux year (XLA): {time.perf_counter()-t0:.1f}s", flush=True)

    # force the multiyear Pallas runner (bypasses _pallas_viable)
    runner = m._multiyear_runner(ny)
    ppack, fpack, sw, cpack, corrpack = m._multiyear_args(corr)
    fa = m._pallas_fast_args()
    co2y = jnp.full((ny,), 680.0, jnp.float32)
    s5 = jnp.stack([state_fc.ts, state_fc.ta, state_fc.to, state_fc.q,
                    state_fc.cap_surf])[:, None]

    t0 = time.perf_counter()
    s5o, monthly, asum = runner(s5, ppack, fpack, sw, cpack, corrpack, co2y,
                                *fa)
    jax.block_until_ready(s5o)
    t_compile = time.perf_counter() - t0
    print(f"# warm (compile+run): {t_compile:.1f}s", flush=True)

    reps = max(1, int(os.environ.get("GREB_PROBE_REPS", "3")))
    t0 = time.perf_counter()
    s5r = s5o
    for _ in range(reps):
        s5r, monthly, asum = runner(s5r, ppack, fpack, sw, cpack, corrpack,
                                    co2y, *fa)
    jax.block_until_ready(s5r)
    dt = time.perf_counter() - t0
    rate = reps * ny / dt
    ts = np.asarray(s5r[0, 0])
    print(f"# Ts range [{ts.min():.1f}, {ts.max():.1f}] K mean {ts.mean():.2f}")
    print(f"pallas-multiyear grid[{grid}]: {rate:.3f} sim-yr/s "
          f"({gx*gy*730*rate/1e6:.0f} M point-steps/s)")


if __name__ == "__main__":
    main()
