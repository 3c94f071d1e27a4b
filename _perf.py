import time, jax, jax.numpy as jnp
from greb_tpu.config import GrebConfig, Numerics
from greb_tpu.model.driver import GREB
co2 = jnp.float32(680.0)
num = Numerics(time_flux=1, time_scnr=10)
m = GREB(GrebConfig(numerics=num, use_pallas=True, fast_circulation=True), verbose=False)
sfc, corr = m.flux_correction()
fpack, sw, cpack = m._pallas_packs()
corrpack = jnp.stack([corr.tf, corr.tof, corr.qf], axis=1)
pr = m._year_scenario_pallas(); fa = m._pallas_fast_args()
fn = lambda s: pr(s, fpack, sw, cpack, corrpack, co2, *fa)[0]
s = fn(sfc); jax.block_until_ready(jax.tree.leaves(s)[0])
t0 = time.perf_counter()
for _ in range(20): s = fn(s)
jax.block_until_ready(jax.tree.leaves(s)[0])
r = 20/(time.perf_counter()-t0)
print(f"{r:.1f} yr/s ({1e6/(r*730):.2f} us/step)")
