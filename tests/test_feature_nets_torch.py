"""Numerical parity of the frozen feature nets against plain-torch stacks
with SHARED weights (VERDICT round-1 item #1).

The reference's perceptual loss is torchvision ``vgg19(weights='DEFAULT')
.features[:35]`` (reference src/loss.py:19-29) and its LPIPS metric is
``lpips.LPIPS(net='alex')`` (reference src/metrics.py:11,22). Pretrained
weights can't be downloaded in this image, but the *verifiable half* —
that our Flax ``VGG19Features``/``AlexNetFeatures`` layer plans (truncation
point, maxpool placement) and the converter's OIHW->HWIO transposes
(tools/convert_torch_weights.py) are exactly right — doesn't need them:
build the torchvision-layout Sequentials in plain ``torch.nn`` with random
weights, push ONE set of weights through the real conversion path
(``features_to_arrays`` -> .npz -> ``load_feature_params``), and assert
forward parity. A wrong ``[:35]`` cut, misplaced pool, or bad transpose
fails these tests; with them green, provisioning the real .npz files is a
pure data-delivery step.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from food101_sr_tpu.models.feature_nets import (
    LPIPS_SCALE,
    LPIPS_SHIFT,
    LPIPS_TAP_CHANNELS,
    AlexNetFeatures,
    VGG19Features,
    load_feature_params,
)
from tools.convert_torch_weights import features_to_arrays, lpips_heads_to_arrays

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torchvision-layout feature stacks in plain torch.nn
# ---------------------------------------------------------------------------

# torchvision vgg19 config 'E': conv counts per block; 'M' pools between.
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def torch_vgg19_features35() -> tnn.Sequential:
    """``vgg19().features[:35]`` layer-for-layer (conv1_1 .. conv5_4, the
    final ReLU5_4 at Sequential index 35 excluded)."""
    layers = []
    c_in = 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(c_in, v, 3, padding=1), tnn.ReLU(inplace=False)]
            c_in = v
    return tnn.Sequential(*layers[:35]).eval()


def torch_alexnet_features() -> tnn.Sequential:
    """torchvision ``alexnet().features`` layer-for-layer."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    ).eval()


# taps the lpips package reads from alexnet features: relu1..relu5
_ALEX_TAP_IDX = (1, 4, 7, 9, 11)


def _share_weights(tmp_path, net: tnn.Sequential, npz_name: str,
                   module, input_shape):
    """Push the torch net's weights through the REAL conversion path
    (features_to_arrays -> .npz on disk -> load_feature_params) and return
    loaded Flax variables."""
    arrays = features_to_arrays(net)
    np.savez(tmp_path / npz_name, **arrays)
    variables, pretrained = load_feature_params(
        module, npz_name, input_shape, weights_dir=str(tmp_path))
    assert pretrained, "converted npz was not picked up"
    return variables


def _nhwc(x_t: torch.Tensor) -> np.ndarray:
    return x_t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_vgg19_features_forward_parity(tmp_path, rng):
    tnet = torch_vgg19_features35()
    # 16 convs expected through conv5_4
    assert sum(isinstance(m, tnn.Conv2d) for m in tnet) == 16
    module = VGG19Features(precision="highest")
    variables = _share_weights(tmp_path, tnet, "vgg19_features.npz",
                               module, (1, 32, 32, 3))

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tnet(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())))
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    assert got.shape == want.shape  # pool placement / truncation point
    scale = np.abs(want).max() + 1e-8
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)
    # the [:35] cut excludes ReLU5_4: output must go negative somewhere
    assert want.min() < 0 and got.min() < 0


def test_alexnet_features_tap_parity(tmp_path, rng):
    tnet = torch_alexnet_features()
    module = AlexNetFeatures(precision="highest")
    variables = _share_weights(tmp_path, tnet, "alexnet_features.npz",
                               module, (1, 64, 64, 3))

    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    wants = []
    h = xt
    with torch.no_grad():
        for i, layer in enumerate(tnet):
            h = layer(h)
            if i in _ALEX_TAP_IDX:
                wants.append(_nhwc(h))
    gots = [np.asarray(t) for t in module.apply(variables, jnp.asarray(x))]

    assert len(gots) == len(wants) == 5
    for tap, (got, want) in enumerate(zip(gots, wants)):
        assert got.shape == want.shape, f"tap {tap} shape"
        assert want.shape[-1] == LPIPS_TAP_CHANNELS[tap]
        scale = np.abs(want).max() + 1e-8
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-5,
                                   err_msg=f"tap {tap}")


class _FakeNetLin:
    """Stands in for lpips.NetLinLayer: .model[-1] is the 1x1 Conv2d."""

    def __init__(self, conv):
        self.model = [conv]


def _torch_lpips_pipeline(tnet, heads, x, y):
    """Mirror of lpips.LPIPS.forward (net='alex', spatial=False, eval):
    ScalingLayer -> taps -> normalize_tensor(eps=1e-10) -> squared diff ->
    1x1 non-negative heads -> spatial mean -> sum over taps."""
    shift = torch.tensor(LPIPS_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(LPIPS_SCALE).view(1, 3, 1, 1)

    def taps(inp):
        h = (inp - shift) / scale
        out = []
        for i, layer in enumerate(tnet):
            h = layer(h)
            if i in _ALEX_TAP_IDX:
                out.append(h)
        return out

    def unit_norm(t):
        return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

    total = 0.0
    with torch.no_grad():
        for fx, fy, head in zip(taps(x), taps(y), heads):
            d2 = (unit_norm(fx) - unit_norm(fy)) ** 2
            total = total + head(d2).mean(dim=(2, 3))  # [N, 1]
    return total.mean().item()


def test_lpips_distance_full_pipeline_parity(tmp_path, rng):
    """End-to-end LPIPS distance vs a torch pipeline mirroring the lpips
    package, with shared backbone weights AND shared random heads."""
    from food101_sr_tpu.metrics import LPIPSAlex

    tnet = torch_alexnet_features()
    np.savez(tmp_path / "alexnet_features.npz", **features_to_arrays(tnet))

    heads = []
    for c in LPIPS_TAP_CHANNELS:
        conv = tnn.Conv2d(c, 1, 1, bias=False)
        conv.weight.data = torch.from_numpy(
            rng.uniform(0, 0.2, (1, c, 1, 1)).astype(np.float32))
        heads.append(conv)
    np.savez(tmp_path / "lpips_alex_heads.npz",
             **lpips_heads_to_arrays([_FakeNetLin(c) for c in heads]))

    ours = LPIPSAlex(weights_dir=str(tmp_path))
    assert ours.pretrained and ours.heads_pretrained

    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    # metric semantics: inputs rescaled to [-1,1] (reference src/metrics.py:22)
    got = float(ours(jnp.asarray(x) * 2 - 1, jnp.asarray(y) * 2 - 1))
    want = _torch_lpips_pipeline(
        tnet, heads,
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()) * 2 - 1,
        torch.from_numpy(y.transpose(0, 3, 1, 2).copy()) * 2 - 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert got > 0


def test_perceptual_loss_parity(tmp_path, rng):
    """PerceptualLoss == torch MSE over shared-weight VGG19 features[:35]
    (reference src/loss.py:27-29)."""
    from food101_sr_tpu.losses import get_loss_function

    tnet = torch_vgg19_features35()
    np.savez(tmp_path / "vgg19_features.npz", **features_to_arrays(tnet))
    loss = get_loss_function("perceptual", weights_dir=str(tmp_path))
    assert loss.pretrained

    x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    got = float(loss(jnp.asarray(x), jnp.asarray(y)))
    with torch.no_grad():
        fx = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        fy = tnet(torch.from_numpy(y.transpose(0, 3, 1, 2).copy()))
        want = float(F.mse_loss(fx, fy))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-8)


# ---------------------------------------------------------------------------
# npz validation at load (a corrupt/mislabeled provisioned file must fail
# loudly at load, not as an opaque conv error mid-apply)
# ---------------------------------------------------------------------------

def test_load_rejects_wrong_shape_npz(tmp_path):
    arrays = {"conv_0/kernel": np.zeros((3, 3, 3, 64), np.float32),
              "conv_0/bias": np.zeros((64,), np.float32)}  # truncated stack
    np.savez(tmp_path / "vgg19_features.npz", **arrays)
    with pytest.raises(ValueError, match="missing"):
        load_feature_params(VGG19Features(), "vgg19_features.npz",
                            (1, 32, 32, 3), weights_dir=str(tmp_path))


def test_load_rejects_wrong_lpips_heads(tmp_path):
    from food101_sr_tpu.models.feature_nets import load_lpips_heads

    np.savez(tmp_path / "lpips_alex_heads.npz",
             **{f"lin_{i}": np.ones((8,), np.float32) for i in range(5)})
    with pytest.raises(ValueError, match="head shapes"):
        load_lpips_heads(weights_dir=str(tmp_path))


def test_converter_verify_mode(tmp_path):
    """tools/convert_torch_weights.py --verify validates provisioned files
    without torch: absent files report ABSENT (exit 1), valid ones OK."""
    import os
    import subprocess
    import sys as _sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools/convert_torch_weights.py"),
         "--verify", "--out", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 1
    assert "ABSENT" in r.stdout
    # provision a structurally-correct alexnet file (random values) -> OK
    net = torch_alexnet_features()
    np.savez(tmp_path / "alexnet_features.npz", **features_to_arrays(net))
    r2 = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools/convert_torch_weights.py"),
         "--verify", "--out", str(tmp_path)],
        capture_output=True, text=True, cwd=REPO)
    assert "alexnet_features.npz: OK" in r2.stdout
