#!/usr/bin/env python
"""Model analysis table: name / params / fp32 size — the TPU-side
replacement for the reference's torchinfo summary
(reference src/analyze_models.py:6-39), implemented as a pytree walk.

Note: the reference tool instantiates AttentionSR at 64 channels while the
registry trains it at 96 (reference src/analyze_models.py:20 vs
src/models.py:225); we report the registry (trained) configuration and the
64-channel variant side by side so both numbers are visible.
"""
import jax
import jax.numpy as jnp

from food101_sr_tpu.models import AttentionSR, Discriminator, get_model, param_count


def analyze_models():
    configs = [
        ("SRCNN", get_model("SRCNN"), (1, 50, 50, 3)),
        ("ResNetSR", get_model("RESNET"), (1, 50, 50, 3)),
        ("AttentionSR (96ch, trained)", get_model("AttentionSR"), (1, 50, 50, 3)),
        ("AttentionSR (64ch variant)",
         AttentionSR(num_channels=64, num_residuals=32), (1, 50, 50, 3)),
        ("RRDB (ESRGAN, beyond-parity)", get_model("RRDB"), (1, 50, 50, 3)),
        ("Discriminator", Discriminator(), (1, 200, 200, 3)),
    ]
    print(f"{'Model Name':<30} | {'Params':<12} | {'Size (MB)':<10}")
    print("-" * 58)
    for name, model, shape in configs:
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros(shape, jnp.float32), train=False)
        n = param_count(variables["params"])
        print(f"{name:<30} | {n:<12,} | {n * 4 / 2**20:<10.2f}")


if __name__ == "__main__":
    analyze_models()
