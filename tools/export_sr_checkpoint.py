#!/usr/bin/env python
"""Export one of this framework's checkpoints back to a reference-layout
torch ``.pth`` state_dict.

The inverse of ``convert_sr_checkpoint.py``: lets weights trained here flow
back into the reference PyTorch project (reference src/models.py defines
the layouts; src/utils.py:40-46 is its ``state_dict`` save). Migration is
therefore two-way — a reference user can trial this framework and leave
with their improved weights.

    python tools/export_sr_checkpoint.py weights/attentionsr_run_best \
        --out attentionsr_run_best.pth            # arch auto-detected

Layout mapping (flax -> torch) mirrors the import converter exactly:
  conv kernel HWIO -> OIHW; Dense kernel (in,out) -> (out,in);
  scale/bias + batch_stats mean/var -> BatchNorm weight/bias/running_*
  (+ zero num_batches_tracked so strict loads succeed);
  params sn.kernel + spectral sn.{u,v} -> spectral_norm weight_orig/u/v,
  with v re-flattened from our (kh,kw,cin) order to torch's (cin,kh,kw).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# runnable as `python tools/export_sr_checkpoint.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from food101_sr_tpu.models import detect_architecture as detect_arch  # noqa: E402


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv(kernel) -> np.ndarray:     # HWIO -> OIHW
    return _np(kernel).transpose(3, 2, 0, 1)


def _linear(kernel) -> np.ndarray:   # (in,out) -> (out,in)
    return _np(kernel).T


def _prelu(alpha) -> np.ndarray:
    return _np(alpha).reshape(1)     # torch PReLU(num_parameters=1)


def export_srcnn(params: dict, extra: dict) -> dict:
    return {
        f"conv{i}.{t}": (_conv(params[f"conv{i}"]["conv"]["kernel"])
                         if t == "weight"
                         else _np(params[f"conv{i}"]["conv"]["bias"]))
        for i in (1, 2, 3) for t in ("weight", "bias")
    }


def _bn(sd: dict, torch_prefix: str, p: dict, stats: dict):
    sd[f"{torch_prefix}.weight"] = _np(p["scale"])
    sd[f"{torch_prefix}.bias"] = _np(p["bias"])
    sd[f"{torch_prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{torch_prefix}.running_var"] = _np(stats["var"])
    sd[f"{torch_prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def export_srnet(params: dict, extra: dict) -> dict:
    attention = "se" in params["res_0"]
    stats = extra.get("batch_stats", {})
    sd: dict = {}
    for ours, ref in (("input_conv", "input_conv"), ("mid_conv", "mid_conv"),
                      ("output_conv", "output_conv")):
        sd[f"{ref}.weight"] = _conv(params[ours]["conv"]["kernel"])
        sd[f"{ref}.bias"] = _np(params[ours]["conv"]["bias"])
    sd["prelu.weight"] = _prelu(params["prelu"]["alpha"])

    n_blocks = 1 + max(int(k.split("_")[1]) for k in params
                       if k.startswith("res_"))
    for i in range(n_blocks):
        blk, r = params[f"res_{i}"], f"res_blocks.{i}"
        for c in ("conv1", "conv2"):
            sd[f"{r}.{c}.weight"] = _conv(blk[c]["conv"]["kernel"])
            sd[f"{r}.{c}.bias"] = _np(blk[c]["conv"]["bias"])
        sd[f"{r}.prelu.weight"] = _prelu(blk["prelu"]["alpha"])
        if attention:
            # SE MLP is a Sequential: fc.0 / fc.2 (reference src/models.py:30-35)
            sd[f"{r}.se.fc.0.weight"] = _linear(blk["se"]["fc1"]["kernel"])
            sd[f"{r}.se.fc.2.weight"] = _linear(blk["se"]["fc2"]["kernel"])
        else:
            for bn in ("bn1", "bn2"):
                _bn(sd, f"{r}.{bn}", blk[bn], stats[f"res_{i}"][bn])
    if not attention:  # mid-conv BN exists only in ResNetSR (src/models.py:114)
        _bn(sd, "bn_mid", params["bn_mid"], stats["bn_mid"])

    # Upsample Sequential: [conv, PixelShuffle, PReLU] per x2 stage, so
    # stage s lands at indices 3s (conv) / 3s+2 (PReLU) — the reference's
    # hardcoded 0/3 and 2/5 for x4 (src/models.py:116-123), generalized to
    # however many up_* stages the checkpoint carries (x2/x8 checkpoints
    # export completely instead of KeyErroring on up_1 / silently dropping
    # up_2; note the reference project itself only *loads* the x4 layout).
    n_up = sum(1 for k in params if k.startswith("up_"))
    if n_up == 0:
        raise ValueError("no up_* stages in checkpoint — not a "
                         "ResNetSR/AttentionSR params tree")
    for s in range(n_up):
        blk = params.get(f"up_{s}")
        if blk is None:
            raise ValueError(f"upsample stages not contiguous: up_{s} "
                             f"missing among {n_up} up_* keys")
        sd[f"upsample.{3 * s}.weight"] = _conv(blk["conv"]["conv"]["kernel"])
        sd[f"upsample.{3 * s}.bias"] = _np(blk["conv"]["conv"]["bias"])
        sd[f"upsample.{3 * s + 2}.weight"] = _prelu(blk["prelu"]["alpha"])
    return sd


def export_discriminator(params: dict, extra: dict) -> dict:
    stats = extra["batch_stats"]
    spectral = extra["spectral"]
    sd: dict = {}

    def sn_conv(torch_prefix: str, ours: str, with_bias: bool):
        kernel = _np(params[ours]["sn"]["kernel"])     # HWIO
        kh, kw, cin, cout = kernel.shape
        sd[f"{torch_prefix}.weight_orig"] = kernel.transpose(3, 2, 0, 1)
        sd[f"{torch_prefix}.weight_u"] = _np(spectral[ours]["sn"]["u"])
        v = _np(spectral[ours]["sn"]["v"]).reshape(kh, kw, cin)
        sd[f"{torch_prefix}.weight_v"] = v.transpose(2, 0, 1).ravel()
        if with_bias:
            sd[f"{torch_prefix}.bias"] = _np(params[ours]["bias"])

    # Sequential indices: net.{0,2,5,8} convs, net.{3,6,9} BNs,
    # classifier.{2,4} linears (reference src/models.py:191-217)
    sn_conv("net.0", "block_0", True)
    sn_conv("net.2", "block_1", False)
    sn_conv("net.5", "block_2", False)
    sn_conv("net.8", "block_3", False)
    for i, bn_prefix in ((1, "net.3"), (2, "net.6"), (3, "net.9")):
        _bn(sd, bn_prefix, params[f"bn_{i}"], stats[f"bn_{i}"])
    for ours, prefix in (("fc1", "classifier.2"), ("fc2", "classifier.4")):
        sd[f"{prefix}.weight_orig"] = _linear(params[ours]["sn"]["kernel"])
        sd[f"{prefix}.weight_u"] = _np(spectral[ours]["sn"]["u"])
        sd[f"{prefix}.weight_v"] = _np(spectral[ours]["sn"]["v"])
        sd[f"{prefix}.bias"] = _np(params[ours]["bias"])
    return sd


EXPORTERS = {
    "SRCNN": export_srcnn,
    "RESNET": export_srnet,
    "AttentionSR": export_srnet,
    "Discriminator": export_discriminator,
}


def export_state_dict(tree: dict, arch: str | None = None) -> tuple[dict, str]:
    """{"params", "extra"} -> (reference state_dict, arch)."""
    params, extra = tree["params"], tree.get("extra", {})
    arch = arch or detect_arch(params)
    if arch not in EXPORTERS:
        raise ValueError(
            f"{arch} has no reference counterpart to export to — the .pth "
            "migration targets the reference project's four architectures "
            "(reference src/models.py:219-227)")
    return EXPORTERS[arch](params, extra), arch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="Orbax checkpoint directory "
                                      "(as written by train.py / the "
                                      "import converter)")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--arch", default=None, choices=list(EXPORTERS) + [None],
                   help="override architecture auto-detection")
    a = p.parse_args()

    from food101_sr_tpu.training import load_checkpoint

    tree = load_checkpoint(a.checkpoint)
    sd, arch = export_state_dict(tree, a.arch)

    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, a.out)
    n = sum(int(np.prod(v.shape)) for k, v in sd.items()
            if not k.endswith("num_batches_tracked"))
    print(f"{arch}: {len(sd)} tensors ({n:,} values) -> {a.out}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
