"""CLI-level smoke tests for the comparison/report tool (visualize.py) and
the graph dump tool (generate_model_vis.py) — the counterparts of reference
visualize.py / src/generate_model_vis.py."""
import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_run_comparison_synthetic_report(tmp_path):
    import visualize
    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import save_checkpoint

    model = get_model("SRCNN", scale_factor=4)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 3)), train=False)
    ckpt = save_checkpoint({"params": v["params"], "extra": {}},
                           str(tmp_path / "srcnn"))

    out = tmp_path / "report"
    times = visualize.run_comparison(
        dataset="synthetic", num_examples=2, out_dir=str(out), seed=0,
        weights={"SRCNN": ckpt, "RESNET": str(tmp_path / "nope")})
    # missing checkpoints are tolerated (reference visualize.py:36-43)
    assert set(times) == {"SRCNN"} and len(times["SRCNN"]) == 2

    image_dirs = sorted(out.glob("image_*"))
    assert len(image_dirs) == 2
    for d in image_dirs:
        # same report layout as the reference (ground truth, nearest LR,
        # bicubic baseline, one PNG per model)
        for f in ("ground_truth.png", "input_lr_resized.png", "bicubic.png",
                  "srcnn.png"):
            assert (d / f).exists(), (d, f)
        from PIL import Image

        gt = Image.open(d / "ground_truth.png")
        sr = Image.open(d / "srcnn.png")
        assert sr.size == gt.size


def test_psnr_255_range_closed_form():
    import visualize

    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 10, np.uint8)
    # PSNR = 20 log10(255 / rmse); rmse = 10
    assert abs(visualize.calculate_psnr(a, b) - 20 * np.log10(25.5)) < 1e-6


def test_generate_model_vis_dumps(tmp_path):
    import generate_model_vis

    generate_model_vis.visualize_all_models(str(tmp_path), optimized=False)
    for name in ("SRCNN", "ResNetSR", "AttentionSR", "RRDB",
                 "Discriminator"):
        d = tmp_path / name
        assert (d / "jaxpr.txt").stat().st_size > 0
        hlo = (d / "hlo_unoptimized.txt").read_text()
        assert "module @jit_forward" in hlo  # StableHLO lowering


def test_run_comparison_full_metrics(tmp_path):
    """--metrics adds SSIM/LPIPS/NLPD per image and a summary dict."""
    import visualize
    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import save_checkpoint

    model = get_model("SRCNN", scale_factor=4)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 8, 3)), train=False)
    ckpt = save_checkpoint({"params": v["params"], "extra": {}},
                           str(tmp_path / "srcnn"))
    times, summary = visualize.run_comparison(
        dataset="synthetic", num_examples=2, out_dir=str(tmp_path / "rep"),
        seed=0, weights={"SRCNN": ckpt}, full_metrics=True)
    assert set(summary["SRCNN"]) == {"psnr", "ssim", "lpips", "nlpd"}
    assert 0 < summary["SRCNN"]["ssim"] <= 1
    assert np.isfinite(summary["SRCNN"]["psnr"])
