"""Reference-checkpoint converter (tools/convert_sr_checkpoint.py).

Strategy: the torch replicas in test_model_parity_torch are architecture-
exact stand-ins for the reference models; renaming their state_dict keys to
the reference's module names (reference src/models.py) produces a faithful
reference-format .pth state_dict. Convert it, load the result into our Flax
model, and the forwards must match the torch replica — proving a reference
user's trained checkpoints survive the framework switch.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from convert_sr_checkpoint import convert_state_dict, detect_arch

from test_model_parity_torch import (TorchDiscriminator, TorchSRNet,
                                     _fwd_torch)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# replica-name -> reference-name state_dict rewrites
# ---------------------------------------------------------------------------

def _srnet_reference_sd(t: TorchSRNet, attention: bool) -> dict:
    ren = {
        "head.": "input_conv.",
        "head_prelu.": "prelu.",
        "mid.": "mid_conv.",
        "up1.conv.": "upsample.0.",
        "up1.prelu.": "upsample.2.",
        "up2.conv.": "upsample.3.",
        "up2.prelu.": "upsample.5.",
        "tail.": "output_conv.",
    }
    out = {}
    for k, v in t.state_dict().items():
        for old, new in ren.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        else:
            if k.startswith("blocks."):
                k = "res_blocks." + k[len("blocks."):]
                k = k.replace(".se.fc1.", ".se.fc.0.").replace(
                    ".se.fc2.", ".se.fc.2.")
        out[k] = v
    return out


def _discriminator_reference_sd(t: TorchDiscriminator) -> dict:
    ren = {"b0.": "net.0.", "b1.": "net.2.", "bn1.": "net.3.",
           "b2.": "net.5.", "bn2.": "net.6.", "b3.": "net.8.",
           "bn3.": "net.9.", "fc1.": "classifier.2.",
           "fc2.": "classifier.4."}
    out = {}
    for k, v in t.state_dict().items():
        for old, new in ren.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def _apply_ours(model, tree, x_nhwc):
    variables = {"params": tree["params"], **tree["extra"]}
    out = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_convert_attention_sr_forward_parity():
    from food101_sr_tpu.models import AttentionSR

    t = TorchSRNet(32, 4, attention=True).eval()
    sd = _srnet_reference_sd(t, attention=True)
    tree, arch = convert_state_dict(sd)
    assert arch == "AttentionSR"

    x = np.random.default_rng(1).uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    ours = _apply_ours(AttentionSR(scale_factor=4, num_channels=32,
                                   num_residuals=4), tree, x)
    np.testing.assert_allclose(ours, _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


def test_convert_resnet_sr_forward_parity():
    from food101_sr_tpu.models import ResNetSR

    t = TorchSRNet(32, 3, attention=False)
    # non-trivial BN running stats
    for m in t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.5, 1.5)
    t.eval()
    sd = _srnet_reference_sd(t, attention=False)
    tree, arch = convert_state_dict(sd)
    assert arch == "RESNET"

    x = np.random.default_rng(2).uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    ours = _apply_ours(ResNetSR(scale_factor=4, num_channels=32,
                                num_residuals=3), tree, x)
    np.testing.assert_allclose(ours, _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


def test_convert_srcnn_and_dataparallel_prefix(tmp_path):
    """SRCNN conversion + 'module.'-prefixed keys (DataParallel save,
    reference src/utils.py:42-43) + Orbax round-trip + serve-compatible load."""
    import torch.nn as tnn
    import torch.nn.functional as F

    from food101_sr_tpu.models import get_model
    from food101_sr_tpu.training import load_checkpoint, save_checkpoint

    class TorchSRCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 9, padding=4)
            self.conv2 = tnn.Conv2d(64, 64, 1)
            self.conv3 = tnn.Conv2d(64, 3, 5, padding=2)

        def forward(self, x):
            x = F.interpolate(x, scale_factor=4, mode="bicubic",
                              align_corners=False)
            return self.conv3(torch.relu(self.conv2(torch.relu(self.conv1(x)))))

    t = TorchSRCNN().eval()
    sd = {"module." + k: v for k, v in t.state_dict().items()}
    tree, arch = convert_state_dict(sd)
    assert arch == "SRCNN"

    # Orbax round-trip (what the CLI writes / serve.py reads)
    path = save_checkpoint(tree, str(tmp_path / "srcnn_ckpt"))
    loaded = load_checkpoint(path, tree)

    x = np.random.default_rng(3).uniform(0, 1, (2, 10, 10, 3)).astype(np.float32)
    ours = _apply_ours(get_model("SRCNN", scale_factor=4), loaded, x)
    np.testing.assert_allclose(ours, _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


def test_convert_discriminator_forward_parity():
    from food101_sr_tpu.models import Discriminator

    t = TorchDiscriminator(nf=16)
    for m in t.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.data.normal_(0, 0.3)
            m.running_var.data.uniform_(0.5, 1.5)
    t.eval()
    sd = _discriminator_reference_sd(t)
    tree, arch = convert_state_dict(sd)
    assert arch == "Discriminator"

    x = np.random.default_rng(4).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = _apply_ours(Discriminator(nf=16), tree, x)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        ref = t(xt).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_convert_rejects_unknown_layout():
    with pytest.raises(ValueError):
        detect_arch({"something.weight": None})
