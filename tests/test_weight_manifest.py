"""Weight-provisioning turnkey (VERDICT r2 item 5).

The pretrained VGG19/AlexNet/LPIPS weights cannot be produced inside this
hermetic image (no egress, no torchvision/lpips), so the delivery contract
must be airtight: a committed ``weights/MANIFEST.json`` records the exact
array names + shapes the converter must produce, the converter records
content hashes at generation time (``MANIFEST.generated.json``), and
``--verify`` on the TPU host checks presence, loadability, manifest
shapes, and transit integrity. These tests pin all of that offline, plus
the LOUD one-line warning every consumer (perceptual loss, metrics
calculator) emits while the seeded fallback is active.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import convert_torch_weights as cw  # noqa: E402


def _fake_npz_from_manifest(weights_dir: Path, name: str):
    """Write an npz with exactly the manifest's names/shapes (random)."""
    spec = cw.expected_specs()[name]
    rng = np.random.default_rng(0)
    arrays = {k: rng.normal(size=shape).astype(np.float32)
              for k, shape in spec["arrays"].items()}
    np.savez(weights_dir / name, **arrays)
    return arrays


def test_committed_manifest_matches_flax_modules():
    # The committed contract must never drift from the actual Flax nets the
    # loaders validate against (loaders use eval_shape on the modules).
    with open(ROOT / "weights" / "MANIFEST.json") as f:
        committed = json.load(f)["files"]
    specs = cw.expected_specs()
    assert set(committed) == set(specs)
    for name in specs:
        assert committed[name]["arrays"] == {
            k: list(v) for k, v in specs[name]["arrays"].items()
        }, f"{name}: committed MANIFEST.json is stale — re-run "
        "tools/convert_torch_weights.py --write_manifest"
    # vgg19 features[:35] = 16 convs; alexnet features = 5; lpips = 5 heads
    assert sum(k.endswith("kernel")
               for k in specs["vgg19_features.npz"]["arrays"]) == 16
    assert sum(k.endswith("kernel")
               for k in specs["alexnet_features.npz"]["arrays"]) == 5
    assert len(specs["lpips_alex_heads.npz"]["arrays"]) == 5


def test_manifest_check_and_content_hash_roundtrip(tmp_path):
    # A conforming npz passes the shape check; the recorded content hash
    # catches any in-transit corruption.
    (tmp_path / "MANIFEST.json").write_text(json.dumps(
        {"files": cw.expected_specs()}))
    name = "lpips_alex_heads.npz"
    _fake_npz_from_manifest(tmp_path, name)
    assert cw.check_against_manifest(str(tmp_path), name) == []

    digest = cw.content_sha256(str(tmp_path / name))
    (tmp_path / cw.GENERATED).write_text(json.dumps(
        {"files": {name: {"content_sha256": digest}}}))
    assert cw.check_against_manifest(str(tmp_path), name) == []

    # tamper: same shapes, different bytes -> hash check must fire
    arrays = {f"lin_{i}": np.ones((c,), np.float32)
              for i, c in enumerate((64, 192, 384, 256, 256))}
    np.savez(tmp_path / name, **arrays)
    problems = cw.check_against_manifest(str(tmp_path), name)
    assert len(problems) == 1 and "content hash" in problems[0]

    # wrong shapes -> manifest check fires
    np.savez(tmp_path / name, **{"lin_0": np.ones((64,), np.float32)})
    problems = cw.check_against_manifest(str(tmp_path), name)
    assert any("manifest mismatch" in p for p in problems)


def test_verify_cli_green_on_conforming_files(tmp_path):
    # Full --verify run against a complete conforming weights dir: exit 0.
    import subprocess

    (tmp_path / "MANIFEST.json").write_text(json.dumps(
        {"files": cw.expected_specs()}))
    gen = {}
    for name in cw.SOURCES:
        _fake_npz_from_manifest(tmp_path, name)
        gen[name] = {"content_sha256": cw.content_sha256(
            str(tmp_path / name))}
    (tmp_path / cw.GENERATED).write_text(json.dumps({"files": gen}))
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "convert_torch_weights.py"),
         "--verify", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, cwd=str(ROOT))
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("manifest+hash checked") == 3

    # and ABSENT files -> exit 1 (the seeded-fallback state is never green)
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "convert_torch_weights.py"),
         "--verify", "--out", str(tmp_path / "empty")],
        capture_output=True, text=True, timeout=300, cwd=str(ROOT))
    assert r.returncode == 1
    assert "ABSENT" in r.stdout


def test_consumers_warn_loudly_when_fallback_active(tmp_path):
    # Every production consumer of the feature nets must emit the one-line
    # warning when the pretrained files are absent (VERDICT r2 item 5:
    # "assert serve/train log a LOUD one-line warning whenever the seeded
    # fallback is active"). train()'s GAN branch builds PerceptualLoss and
    # the val loop builds MetricsCalculator — these are the two surfaces.
    from food101_sr_tpu.losses.perceptual import PerceptualLoss
    from food101_sr_tpu.metrics import MetricsCalculator

    with pytest.warns(UserWarning, match="Pretrained weights not found"):
        loss = PerceptualLoss(weights_dir=str(tmp_path))
    assert not loss.pretrained

    with pytest.warns(UserWarning) as record:
        calc = MetricsCalculator(weights_dir=str(tmp_path))
    assert not calc.pretrained and not calc.heads_pretrained
    messages = [str(w.message) for w in record]
    assert any("Pretrained weights not found" in m for m in messages)
    assert any("LPIPS head weights not found" in m for m in messages)
