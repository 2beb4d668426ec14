"""Golden parity tests for the resampling ops — THE fidelity risk (SURVEY §7).

We compare against torch.nn.functional.interpolate (the exact backend of
torchvision tensor Resize used by the reference dataset degradation) and PIL
(used by the reference's resize-if-small path and visualize.py).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from food101_sr_tpu.ops import (
    resize_bicubic_pil,
    resize_bicubic_torch,
    resize_bilinear_torch,
    degrade_bicubic,
    upsample_bicubic,
    pixel_shuffle,
    depthwise_blur,
)


def _rand_nhwc(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, size=(n, h, w, c)).astype(np.float32)


def _torch_resize(x_nhwc, size, mode, antialias):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    out = F.interpolate(t, size=size, mode=mode, align_corners=False, antialias=antialias)
    return out.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("hw,out_hw,antialias", [
    ((200, 200), (50, 50), True),    # the dataset degradation (crop 200, x4)
    ((96, 96), (48, 48), True),      # x2 config
    ((64, 48), (16, 12), True),      # non-square
    ((50, 50), (200, 200), False),   # SRCNN pre-upsample
    ((37, 53), (111, 159), False),   # odd sizes, x3
    ((30, 30), (45, 45), True),      # mild minify/up mix guard
])
def test_bicubic_matches_torch(hw, out_hw, antialias):
    x = _rand_nhwc(2, *hw, 3)
    want = _torch_resize(x, out_hw, "bicubic", antialias)
    got = np.asarray(resize_bicubic_torch(x, *out_hw, antialias=antialias))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw,out_hw,antialias", [
    ((100, 100), (200, 200), False),  # NLPD pyramid upsample
    ((25, 25), (50, 50), False),
    ((64, 64), (32, 32), True),
])
def test_bilinear_matches_torch(hw, out_hw, antialias):
    x = _rand_nhwc(2, *hw, 3)
    want = _torch_resize(x, out_hw, "bilinear", antialias)
    got = np.asarray(resize_bilinear_torch(x, *out_hw, antialias=antialias))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw,out_hw", [
    ((160, 160), (200, 200)),  # resize-if-small enlarge
    ((200, 200), (50, 50)),    # visualize.py PIL LR generation
])
def test_bicubic_matches_pil_float(hw, out_hw):
    # PIL float path ('F' mode) per channel, the highest-precision PIL ref.
    x = _rand_nhwc(1, *hw, 3)[0]
    chans = []
    for ci in range(3):
        im = Image.fromarray(x[:, :, ci], mode="F")
        chans.append(np.asarray(im.resize((out_hw[1], out_hw[0]), resample=Image.BICUBIC)))
    want = np.stack(chans, axis=-1)
    got = np.asarray(resize_bicubic_pil(x, *out_hw))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_degrade_and_upsample_wrappers():
    x = _rand_nhwc(2, 200, 200, 3)
    lr = np.asarray(degrade_bicubic(x, 4))
    assert lr.shape == (2, 50, 50, 3)
    want = _torch_resize(x, (50, 50), "bicubic", True)
    np.testing.assert_allclose(lr, want, atol=2e-5, rtol=1e-5)

    up = np.asarray(upsample_bicubic(lr, 4))
    assert up.shape == (2, 200, 200, 3)
    want_up = _torch_resize(lr, (200, 200), "bicubic", False)
    np.testing.assert_allclose(up, want_up, atol=2e-5, rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    r = 2
    x = _rand_nhwc(2, 5, 7, 16)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.pixel_shuffle(t, r).permute(0, 2, 3, 1).numpy()
    got = np.asarray(pixel_shuffle(x, r))
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


def test_depthwise_blur_matches_torch():
    from food101_sr_tpu.ops.gaussian import gaussian_kernel_2d

    x = _rand_nhwc(2, 20, 20, 3)
    k = gaussian_kernel_2d(5, 1.0)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    kt = torch.from_numpy(np.tile(k[None, None], (3, 1, 1, 1)))
    want = F.conv2d(t, kt, padding=2, groups=3).permute(0, 2, 3, 1).numpy()
    got = np.asarray(depthwise_blur(x, 5, 1.0))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


def test_reference_gaussian_kernel_value_parity():
    """The reference normalizes its kernel, so its pi=3.14159 approximation
    cancels (reference src/loss.py:42-55); verify against that construction."""
    size, sigma = 5, 1.0
    xc = torch.arange(size).repeat(size).view(size, size)
    yc = xc.t()
    grid = torch.stack([xc, yc], dim=-1).float()
    mean = (size - 1) / 2.0
    var = sigma**2
    gk = (1.0 / (2.0 * 3.14159 * var)) * torch.exp(
        -torch.sum((grid - mean) ** 2.0, dim=-1) / (2 * var)
    )
    gk = gk / gk.sum()
    from food101_sr_tpu.ops.gaussian import gaussian_kernel_2d

    np.testing.assert_allclose(gaussian_kernel_2d(5, 1.0), gk.numpy(), atol=1e-7)
