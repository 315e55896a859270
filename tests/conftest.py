import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware; bench.py runs on the real chip.
#
# NB: this environment's sitecustomize registers the 'axon' TPU plugin and
# sets jax.config.jax_platforms at interpreter start, so the JAX_PLATFORMS
# env var alone is NOT enough — override the config before any backend is
# initialized.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
