#!/usr/bin/env python
"""Convert a reference trained checkpoint (.pth state_dict) into this
framework's Orbax checkpoint format.

The reference saves plain ``model.state_dict()`` files (reference
src/utils.py:40-46) for SRCNN / ResNetSR / AttentionSR / Discriminator
(reference src/models.py) — 18 of them live in its DVC ``weights/`` store.
This tool lets a reference user bring those trained weights across:

    python tools/convert_sr_checkpoint.py weights/attentionsr_best.pth \
        --out weights/attentionsr_best            # arch auto-detected

The output directory loads everywhere our framework loads checkpoints:
``serve.py --checkpoint``, ``visualize.py``, and ``train.py
--pretrained_weights`` (strict=False-style warm start). Model hyperparams
(width/depth) are inferred from the tensor shapes, so non-registry variants
(e.g. the 64-channel AttentionSR of the reference's analysis tools,
reference src/analyze_models.py:20) convert too.

Layout mapping (torch -> flax):
  conv weight OIHW -> kernel HWIO; Linear weight (out,in) -> kernel (in,out);
  BatchNorm weight/bias/running_* -> params scale/bias + batch_stats mean/var;
  spectral_norm weight_orig/u/v -> params sn.kernel + spectral sn.{u,v}, with
  v re-indexed from torch's flat (cin,kh,kw) matricization to ours (kh,kw,cin).
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

# runnable as `python tools/convert_sr_checkpoint.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(w) -> np.ndarray:          # OIHW -> HWIO
    return _t(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:        # (out,in) -> (in,out)
    return _t(w).T


def strip_module_prefix(sd: dict) -> dict:
    """Undo nn.DataParallel wrapping (reference src/utils.py:42-43)."""
    return { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }


def detect_arch(sd: dict) -> str:
    if "net.0.weight_orig" in sd:
        return "Discriminator"
    if "conv1.weight" in sd and "input_conv.weight" not in sd:
        return "SRCNN"
    if any(k.startswith("res_blocks.0.se.") for k in sd):
        return "AttentionSR"
    if "res_blocks.0.bn1.weight" in sd:
        return "RESNET"
    raise ValueError("unrecognized state_dict: keys do not match any "
                     "reference architecture (src/models.py)")


# ---------------------------------------------------------------------------
# per-architecture converters: state_dict -> {"params": ..., "extra": {...}}
# ---------------------------------------------------------------------------

def convert_srcnn(sd: dict) -> dict:
    params = {
        f"conv{i}": {"conv": {"kernel": _conv(sd[f"conv{i}.weight"]),
                              "bias": _t(sd[f"conv{i}.bias"])}}
        for i in (1, 2, 3)
    }
    return {"params": params, "extra": {}}


def _prelu(sd, key) -> np.ndarray:
    return _t(sd[key]).reshape(())  # reference PReLU is single-parameter


def convert_srnet(sd: dict, attention: bool) -> dict:
    """ResNetSR / AttentionSR (reference src/models.py:104-189)."""
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"res_blocks\.(\d+)\.", k)))
    params: dict = {
        "input_conv": {"conv": {"kernel": _conv(sd["input_conv.weight"]),
                                "bias": _t(sd["input_conv.bias"])}},
        "prelu": {"alpha": _prelu(sd, "prelu.weight")},
        "mid_conv": {"conv": {"kernel": _conv(sd["mid_conv.weight"]),
                              "bias": _t(sd["mid_conv.bias"])}},
        "output_conv": {"conv": {"kernel": _conv(sd["output_conv.weight"]),
                                 "bias": _t(sd["output_conv.bias"])}},
    }
    stats: dict = {}
    for i in range(n_blocks):
        r = f"res_blocks.{i}"
        blk = {
            "conv1": {"conv": {"kernel": _conv(sd[f"{r}.conv1.weight"]),
                               "bias": _t(sd[f"{r}.conv1.bias"])}},
            "conv2": {"conv": {"kernel": _conv(sd[f"{r}.conv2.weight"]),
                               "bias": _t(sd[f"{r}.conv2.bias"])}},
            "prelu": {"alpha": _prelu(sd, f"{r}.prelu.weight")},
        }
        if attention:
            # SE MLP is a Sequential: fc.0 / fc.2 (reference src/models.py:30-35)
            blk["se"] = {"fc1": {"kernel": _linear(sd[f"{r}.se.fc.0.weight"])},
                         "fc2": {"kernel": _linear(sd[f"{r}.se.fc.2.weight"])}}
        else:
            for bn in ("bn1", "bn2"):
                blk[bn] = {"scale": _t(sd[f"{r}.{bn}.weight"]),
                           "bias": _t(sd[f"{r}.{bn}.bias"])}
                stats.setdefault(f"res_{i}", {})[bn] = {
                    "mean": _t(sd[f"{r}.{bn}.running_mean"]),
                    "var": _t(sd[f"{r}.{bn}.running_var"])}
        params[f"res_{i}"] = blk
    if not attention:  # mid-conv BN exists only in ResNetSR (src/models.py:114)
        params["bn_mid"] = {"scale": _t(sd["bn_mid.weight"]),
                            "bias": _t(sd["bn_mid.bias"])}
        stats["bn_mid"] = {"mean": _t(sd["bn_mid.running_mean"]),
                           "var": _t(sd["bn_mid.running_var"])}
    # upsample Sequential indices: 0/3 convs, 2/5 PReLUs (src/models.py:116-123)
    for our, conv_i, prelu_i in (("up_0", 0, 2), ("up_1", 3, 5)):
        params[our] = {
            "conv": {"conv": {"kernel": _conv(sd[f"upsample.{conv_i}.weight"]),
                              "bias": _t(sd[f"upsample.{conv_i}.bias"])}},
            "prelu": {"alpha": _prelu(sd, f"upsample.{prelu_i}.weight")},
        }
    extra = {"batch_stats": stats} if stats else {}
    return {"params": params, "extra": extra}


def convert_discriminator(sd: dict) -> dict:
    """Spectral-norm critic (reference src/models.py:191-217). torch's
    spectral_norm stores weight_orig/weight_u/weight_v per wrapped module;
    the Sequential indices are net.{0,2,5,8} convs, net.{3,6,9} BNs,
    classifier.{2,4} linears."""

    def sn_conv(prefix: str, with_bias: bool):
        w = _t(sd[f"{prefix}.weight_orig"])           # OIHW
        cout, cin, kh, kw = w.shape
        v = _t(sd[f"{prefix}.weight_v"])              # flat (cin, kh, kw)
        v = v.reshape(cin, kh, kw).transpose(1, 2, 0).ravel()  # -> (kh,kw,cin)
        p = {"sn": {"kernel": w.transpose(2, 3, 1, 0)}}
        if with_bias:
            p["bias"] = _t(sd[f"{prefix}.bias"])
        return p, {"sn": {"u": _t(sd[f"{prefix}.weight_u"]), "v": v}}

    def sn_linear(prefix: str):
        p = {"sn": {"kernel": _linear(sd[f"{prefix}.weight_orig"])},
             "bias": _t(sd[f"{prefix}.bias"])}
        s = {"sn": {"u": _t(sd[f"{prefix}.weight_u"]),
                    "v": _t(sd[f"{prefix}.weight_v"])}}
        return p, s

    params: dict = {}
    spectral: dict = {}
    stats: dict = {}
    conv_idx = {"block_0": ("net.0", True), "block_1": ("net.2", False),
                "block_2": ("net.5", False), "block_3": ("net.8", False)}
    for ours, (prefix, with_bias) in conv_idx.items():
        params[ours], spectral[ours] = sn_conv(prefix, with_bias)
    for i, bn_prefix in ((1, "net.3"), (2, "net.6"), (3, "net.9")):
        params[f"bn_{i}"] = {"scale": _t(sd[f"{bn_prefix}.weight"]),
                             "bias": _t(sd[f"{bn_prefix}.bias"])}
        stats[f"bn_{i}"] = {"mean": _t(sd[f"{bn_prefix}.running_mean"]),
                            "var": _t(sd[f"{bn_prefix}.running_var"])}
    params["fc1"], spectral["fc1"] = sn_linear("classifier.2")
    params["fc2"], spectral["fc2"] = sn_linear("classifier.4")
    return {"params": params,
            "extra": {"batch_stats": stats, "spectral": spectral}}


CONVERTERS = {
    "SRCNN": convert_srcnn,
    "RESNET": lambda sd: convert_srnet(sd, attention=False),
    "AttentionSR": lambda sd: convert_srnet(sd, attention=True),
    "Discriminator": convert_discriminator,
}


def convert_state_dict(sd: dict, arch: str | None = None) -> tuple[dict, str]:
    """state_dict -> ({"params", "extra"}, arch). Raises on unconsumed keys
    so silent partial conversions can't happen."""
    sd = strip_module_prefix(sd)
    arch = arch or detect_arch(sd)
    tree = CONVERTERS[arch](sd)

    # Every reference tensor must have been consumed (num_batches_tracked is
    # torch bookkeeping with no inference semantics).
    n_leaves = len(jax_flatten(tree))
    n_src = sum(1 for k in sd if not k.endswith("num_batches_tracked"))
    if n_leaves != n_src:
        raise ValueError(
            f"{arch}: converted {n_leaves} leaves from {n_src} source "
            f"tensors — state_dict does not match the reference layout")
    return tree, arch


def jax_flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("pth", help="reference .pth state_dict file")
    p.add_argument("--out", required=True,
                   help="output Orbax checkpoint directory")
    p.add_argument("--arch", default=None,
                   choices=list(CONVERTERS) + [None],
                   help="override architecture auto-detection")
    a = p.parse_args()

    import torch

    sd = torch.load(a.pth, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    tree, arch = convert_state_dict(sd, a.arch)

    from food101_sr_tpu.training import save_checkpoint

    path = save_checkpoint(tree, a.out)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax_flatten(tree["params"]).values())
    print(f"{arch}: {n_params:,} params -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
