#!/usr/bin/env python
"""Model graph export — the TPU-side replacement for the reference's
TensorBoard graph tracer (reference src/generate_model_vis.py:6-42).

Instead of a torch graph trace, each model is staged the XLA way: we dump
its jaxpr (the functional IR) and its optimized HLO text to
``runs/all_models_viz/{name}/``. The jaxpr is the architecture graph the
reference visualized; the HLO shows what actually runs on the chip after
fusion — the artifact a TPU engineer inspects.

The reference tool instantiates AttentionSR at 64 channels (reference
src/generate_model_vis.py:14) while training uses 96 (src/models.py:225);
we export the trained configuration and note the variant in
analyze_models.py instead of reproducing the mismatch.
"""
import argparse
import os

import jax
import jax.numpy as jnp

from food101_sr_tpu.models import Discriminator, get_model


def visualize_all_models(out_root="runs/all_models_viz", optimized=True):
    configs = [
        ("SRCNN", get_model("SRCNN"), (1, 50, 50, 3)),
        ("ResNetSR", get_model("RESNET"), (1, 50, 50, 3)),
        ("AttentionSR", get_model("AttentionSR"), (1, 50, 50, 3)),
        ("RRDB", get_model("RRDB"), (1, 50, 50, 3)),
        ("Discriminator", Discriminator(), (1, 200, 200, 3)),
    ]
    for name, model, shape in configs:
        x = jnp.zeros(shape, jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

        def forward(variables, x, model=model):
            return model.apply(variables, x, train=False)

        out_dir = os.path.join(out_root, name)
        os.makedirs(out_dir, exist_ok=True)

        jaxpr = jax.make_jaxpr(forward)(variables, x)
        with open(os.path.join(out_dir, "jaxpr.txt"), "w") as f:
            f.write(jaxpr.pretty_print())

        lowered = jax.jit(forward).lower(variables, x)
        with open(os.path.join(out_dir, "hlo_unoptimized.txt"), "w") as f:
            f.write(lowered.as_text())
        if optimized:
            compiled = lowered.compile()
            with open(os.path.join(out_dir, "hlo_optimized.txt"), "w") as f:
                f.write(compiled.as_text())
            flops = compiled.cost_analysis().get("flops")
            if flops:
                print(f"{name}: {flops/1e9:.2f} GFLOP/forward -> {out_dir}")
                continue
        print(f"{name}: -> {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/all_models_viz")
    p.add_argument("--no-optimized", action="store_true",
                   help="skip the compile step (faster; jaxpr + HLO only)")
    visualize_all_models(p.parse_args().out,
                         optimized=not p.parse_args().no_optimized)
