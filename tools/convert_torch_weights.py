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


def convert_vgg19(out_dir):
    from torchvision.models import vgg19

    net = vgg19(weights="DEFAULT").features[:35].eval()
    arrays = {}
    conv_idx = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()  # OIHW
            arrays[f"conv_{conv_idx}/kernel"] = w.transpose(2, 3, 1, 0)  # HWIO
            arrays[f"conv_{conv_idx}/bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    np.savez(os.path.join(out_dir, "vgg19_features.npz"), **arrays)
    print(f"vgg19: {conv_idx} convs")


def convert_alexnet(out_dir):
    from torchvision.models import alexnet

    net = alexnet(weights="DEFAULT").features.eval()
    arrays = {}
    conv_idx = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            w = layer.weight.detach().numpy()
            arrays[f"conv_{conv_idx}/kernel"] = w.transpose(2, 3, 1, 0)
            arrays[f"conv_{conv_idx}/bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    np.savez(os.path.join(out_dir, "alexnet_features.npz"), **arrays)
    print(f"alexnet: {conv_idx} convs")


def convert_lpips_heads(out_dir):
    import lpips

    net = lpips.LPIPS(net="alex", verbose=False)
    arrays = {}
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrays[f"lin_{i}"] = w.reshape(-1)
    np.savez(os.path.join(out_dir, "lpips_alex_heads.npz"), **arrays)
    print(f"lpips heads: {len(arrays)}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    convert_vgg19(args.out)
    convert_alexnet(args.out)
    convert_lpips_heads(args.out)
