"""Generate the config-1 golden-year artifact from the NumPy oracle.

Runs the line-by-line Fortran transliteration (tests/oracle/greb_oracle.py)
for 1 flux-correction year (co2=298) + 1 scenario year (co2=680) on the
default 96x48/730-step grid with the deterministic synthetic forcing, and
stores monthly means + end states in tests/golden/golden_year_96x48.npz.

Regenerate with:  python tools/make_golden.py   (~25 min, pure NumPy)
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np
from greb_tpu.io.synthetic import make_synthetic_forcing
from tests.oracle.greb_oracle import GrebOracle, OracleParams

F32 = np.float32

def month_matrix(nstep=730):
    jday = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    out = np.zeros((12, nstep), F32)
    t = 0
    for m, nd in enumerate(jday):
        n = nd * 2
        out[m, t:t + n] = F32(1.0) / F32(n)
        t += n
    assert t == nstep
    return out

def main():
    f = make_synthetic_forcing(96, 48, 730)
    o = GrebOracle(f, OracleParams())
    st = o.initial_state()
    corr = o.zero_corrections()
    t0 = time.perf_counter()
    for it in range(730):
        st = o.fluxcorr_step(st, F32(298.0), it, corr)
        if it % 73 == 0:
            print(f"fc {it}/730 {time.perf_counter()-t0:.0f}s", flush=True)
    fc_state = {k: v.copy() for k, v in st.items()}
    fc_cap = o.cap_surf.copy()

    mm = month_matrix()
    monthly = np.zeros((12, 5, 48, 96), F32)
    for it in range(730):
        st, t = o.scenario_step(st, F32(680.0), it, corr)
        f5 = np.stack([st["ts"], st["ta"], st["to"], st["q"], t["albedo"]])
        mi = mm[:, it].argmax()
        monthly[mi] += mm[mi, it] * f5
        if it % 73 == 0:
            print(f"scn {it}/730 {time.perf_counter()-t0:.0f}s", flush=True)

    np.savez_compressed(
        "tests/golden/golden_year_96x48.npz",
        monthly=monthly,
        fc_ts=fc_state["ts"], fc_ta=fc_state["ta"], fc_to=fc_state["to"],
        fc_q=fc_state["q"], fc_cap_surf=fc_cap,
        end_ts=st["ts"], end_ta=st["ta"], end_to=st["to"], end_q=st["q"],
        corr_tf_mean=corr["tf"].mean(axis=0),
        corr_qf_mean=corr["qf"].mean(axis=0),
        co2_flux=298.0, co2_scnr=680.0)
    print("written tests/golden/golden_year_96x48.npz",
          time.perf_counter() - t0, "s")

if __name__ == "__main__":
    main()
