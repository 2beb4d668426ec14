#!/usr/bin/env python
"""Round-trip a TRAINED checkpoint to the reference PyTorch project and
verify identical outputs/metrics through the reference's own model code.

The strongest migration statement available without real Food-101: take a
converged checkpoint (e.g. from tools/run_winners.py), export it with the
production exporter (tools/export_sr_checkpoint.py), load the .pth into
the ACTUAL /root/reference/src/models.py classes with strict=True, and
compare per-image SR outputs + 255-range PSNR (the reference
visualize.py:24-29 metric) on held-out images from the same tree.

    python tools/verify_winner_export.py weights/winner_resnet_best \
        --data_root /tmp/fakefood --num_images 8
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.reference_import import load_reference_models  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("--data_root", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--num_images", type=int, default=8)
    p.add_argument("--crop", type=int, default=200)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--atol", type=float, default=2e-4,
                   help="max |ours - torch| on [0,1] SR outputs")
    args = p.parse_args()

    import jax

    import food101_sr_tpu

    food101_sr_tpu.use_cpu_backend()  # bit-stable f32 comparison
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch

    from food101_sr_tpu.data import Food101Source
    from food101_sr_tpu.data.pipeline import load_sample, prepare_batch
    from food101_sr_tpu.models import detect_architecture, model_for_params
    from food101_sr_tpu.training import load_checkpoint
    from tools.export_sr_checkpoint import export_state_dict
    from visualize import calculate_psnr  # the reference's 255-range PSNR

    tree = load_checkpoint(args.checkpoint)
    params, extra = tree["params"], tree.get("extra", {})
    arch = detect_architecture(params)
    model = model_for_params(params, scale_factor=args.scale)
    variables = {"params": params, **{k: v for k, v in extra.items() if v}}

    # production exporter -> reference model, strict load
    sd, _ = export_state_dict({"params": params, "extra": extra}, arch)
    ref_models = load_reference_models()
    ref = ref_models.get_model(arch, scale_factor=args.scale, device="cpu")
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    ref.eval()
    print(f"{arch}: exported {len(sd)} tensors, strict torch load OK")

    src = Food101Source(args.data_root, args.split)
    rng = np.random.default_rng(0)
    n = min(args.num_images, len(src))

    worst, psnrs_ours, psnrs_ref = 0.0, [], []
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    for i in range(n):
        hr_u8 = load_sample(src, i, args.crop, train=False, rng=rng)
        lr, hr = prepare_batch(jnp.asarray(hr_u8[None]), args.scale)
        ours = np.asarray(fwd(variables, lr))[0]
        with torch.no_grad():
            out_t = ref(torch.from_numpy(
                np.transpose(np.asarray(lr), (0, 3, 1, 2)).copy()))
        theirs = np.transpose(out_t.numpy(), (0, 2, 3, 1))[0]
        diff = float(np.abs(ours - theirs).max())
        worst = max(worst, diff)
        to_u8 = lambda x: np.clip(np.asarray(x) * 255 + 0.5, 0,
                                  255).astype(np.uint8)
        hr_img = to_u8(np.asarray(hr)[0])
        psnrs_ours.append(calculate_psnr(to_u8(ours), hr_img))
        psnrs_ref.append(calculate_psnr(to_u8(theirs), hr_img))

    d_psnr = float(np.abs(np.mean(psnrs_ours) - np.mean(psnrs_ref)))
    print(f"{n} images: max |ours - torch| = {worst:.2e}; "
          f"PSNR ours {np.mean(psnrs_ours):.3f} dB vs reference-loaded "
          f"{np.mean(psnrs_ref):.3f} dB (|delta| {d_psnr:.4f} dB)")
    assert worst < args.atol, f"output mismatch {worst} >= {args.atol}"
    assert d_psnr < 0.05, f"PSNR delta {d_psnr} >= 0.05 dB"
    print("ROUND-TRIP OK: metrics identical through the reference model "
          "(<0.05 dB)")


if __name__ == "__main__":
    main()
