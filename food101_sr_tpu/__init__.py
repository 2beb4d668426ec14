"""food101_sr_tpu — TPU-native Food-101 x4 single-image super-resolution framework.

A from-scratch JAX/Flax/optax/Pallas rebuild of the capabilities of the reference
PyTorch project Jaskieeeer/food101-super-resolution (see SURVEY.md). The compute
path is jitted XLA (NHWC convs on the MXU, resize-as-matmul kernels); data
parallelism is expressed with jax.sharding over a device mesh; the input pipeline
degrades HR crops to LR on-device.
"""

__version__ = "0.1.0"
