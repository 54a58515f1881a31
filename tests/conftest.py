import os

# Tests run on a faked 8-device CPU mesh: the TPU-world equivalent of
# "test multi-node without a cluster". The container's sitecustomize
# registers the axon TPU plugin and forces jax_platforms="axon,cpu", so
# setting the env var alone is not enough — override the config after
# import, before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: first full run is slow, reruns are seconds
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache"
)
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
