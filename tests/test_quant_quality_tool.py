"""CLI-level test for tools/quant_quality.py — the committed producer of
runs/quant_quality.json (the f32-vs-int8 quality table in DESIGN.md §2).
Runs the full tool on the CPU backend with a freshly-initialized RESNET
checkpoint and synthetic data: pins the batch assembly contract (fixed
shapes, tail drop, resize-if-small), the per-mode eval, the delta
computation, and the JSON merge behavior."""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from food101_sr_tpu.data import SyntheticSource  # noqa: E402
from food101_sr_tpu.models import get_model  # noqa: E402
from food101_sr_tpu.training import save_checkpoint  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import quant_quality  # noqa: E402


def test_load_eval_batches_fixed_shapes_and_tail_drop():
    src = SyntheticSource(n=5, sizes=((40, 50), (200, 160)), seed=3)
    # crop 64 > the 40px shorter side -> the small image must be upsized
    # first (the dataset contract, reference src/dataset.py:30-32)
    lr_b, hr_b = quant_quality.load_eval_batches(
        src, num_examples=5, crop=64, scale=4, batch=2, seed=0)
    assert hr_b.shape == (2, 2, 64, 64, 3)  # 5 -> 4 (tail dropped), 2x2
    assert lr_b.shape == (2, 2, 16, 16, 3)
    assert hr_b.dtype == np.float32 and hr_b.max() <= 1.0
    # deterministic under the same seed
    lr_c, _ = quant_quality.load_eval_batches(
        src, num_examples=5, crop=64, scale=4, batch=2, seed=0)
    np.testing.assert_array_equal(lr_b, lr_c)


def test_quant_quality_main_end_to_end(tmp_path, monkeypatch, capsys):
    import jax

    model = get_model("RESNET", scale_factor=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 8, 8, 3), np.float32), train=False)
    extra = {k: v for k, v in variables.items() if k != "params"}
    ckpt = tmp_path / "resnet_best"
    save_checkpoint({"params": variables["params"], "extra": extra},
                    str(ckpt))

    out = tmp_path / "qq.json"
    # pre-existing entries must survive the merge
    out.write_text(json.dumps({"older_model": {"f32": 30.0}}))

    monkeypatch.setattr(sys, "argv", [
        "quant_quality.py", "--weights", f"tiny_resnet={ckpt}",
        "--dataset", "synthetic", "--num_examples", "4", "--batch", "2",
        "--crop", "48", "--modes", "f32,int8", "--cpu",
        "--out", str(out)])
    quant_quality.main()

    table = json.loads(out.read_text())
    assert set(table) == {"older_model", "tiny_resnet", "_method"}
    row = table["tiny_resnet"]
    for key in ("f32", "f32_ssim", "int8", "int8_ssim", "delta_db_int8"):
        assert key in row, key
        assert np.isfinite(row[key])
    assert row["delta_db_int8"] == pytest.approx(
        row["f32"] - row["int8"], abs=1e-3)
    # int8 body quantization of an untrained net stays in the same regime
    assert abs(row["delta_db_int8"]) < 3.0
    assert "crop=48" in table["_method"]
    assert "tiny_resnet" in capsys.readouterr().out


def test_quant_quality_rejects_bad_flags(tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", [
        "quant_quality.py", "--weights", "x=missing", "--crop", "50"])
    with pytest.raises(SystemExit):
        quant_quality.main()  # crop not a multiple of scale
    monkeypatch.setattr(sys, "argv", [
        "quant_quality.py", "--weights", "x=missing", "--modes", "f16"])
    with pytest.raises(SystemExit):
        quant_quality.main()  # unknown mode
    monkeypatch.setattr(sys, "argv", [
        "quant_quality.py", "--weights", "nosep", "--dataset", "synthetic"])
    with pytest.raises(SystemExit):
        quant_quality.main()  # NAME=CKPT parse
