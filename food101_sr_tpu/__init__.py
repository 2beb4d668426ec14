"""food101_sr_tpu — TPU-native Food-101 x4 single-image super-resolution framework.

A from-scratch JAX/Flax/optax/Pallas rebuild of the capabilities of the reference
PyTorch project Jaskieeeer/food101-super-resolution (see SURVEY.md). The compute
path is jitted XLA (NHWC convs on the MXU, resize-as-matmul kernels); data
parallelism is expressed with jax.sharding over a device mesh; the input pipeline
degrades HR crops to LR on-device.
"""

__version__ = "0.1.0"

import os as _os

# XLA compiles are expensive (and, through remote-TPU tunnels, can take
# minutes); a persistent on-disk cache makes every CLI/run after the first
# start in seconds. Opt out with FOOD101_SR_DISABLE_COMPILE_CACHE=1; the
# standard JAX_COMPILATION_CACHE_DIR env var overrides the location.
if _os.environ.get("FOOD101_SR_DISABLE_COMPILE_CACHE") != "1":
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
