"""Test env: force CPU with 8 virtual devices so sharding/halo-exchange tests
run without a TPU pod (must run before any backend is initialised).

Note: this machine's sitecustomize registers an experimental TPU plugin and
overrides ``jax_platforms`` in jax.config directly, so the env var alone is
not enough — we also update the config."""
import os

# GREB_TEST_TPU=1 keeps the real backend so the TPU-only tests
# (tests/test_pallas_refined.py) can run against the chip:
#   GREB_TEST_TPU=1 python -m pytest tests/test_pallas_refined.py
if not os.environ.get("GREB_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
