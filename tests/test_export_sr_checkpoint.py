"""Reverse checkpoint conversion (ours -> reference .pth layout).

Round-trip property: reference state_dict -> import converter -> export
converter must reproduce every tensor exactly, and the exported dict must
strict-load into a real torch model wrapped the way the reference wraps it
(incl. torch.nn.utils.spectral_norm buffers)."""
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from convert_sr_checkpoint import convert_state_dict
from export_sr_checkpoint import detect_arch, export_state_dict
from test_convert_sr_checkpoint import (_discriminator_reference_sd,
                                        _srnet_reference_sd)
from test_model_parity_torch import TorchDiscriminator, TorchSRNet

torch.manual_seed(0)


def _roundtrip(ref_sd: dict, arch: str):
    tree, detected = convert_state_dict(ref_sd)
    assert detected == arch
    assert detect_arch(tree["params"]) == arch
    out_sd, arch2 = export_state_dict(tree)
    assert arch2 == arch

    assert set(out_sd) == set(ref_sd)
    for k, v in ref_sd.items():
        got = out_sd[k]
        if k.endswith("num_batches_tracked"):
            assert got.dtype == np.int64  # torch bookkeeping, value unused
            continue
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(v.detach().numpy()), err_msg=k)
    return out_sd


def test_roundtrip_attention_sr():
    t = TorchSRNet(16, 3, attention=True).eval()
    ref_sd = _srnet_reference_sd(t, attention=True)
    _roundtrip(ref_sd, "AttentionSR")


def test_roundtrip_resnet_sr_strict_torch_load():
    t = TorchSRNet(12, 2, attention=False).eval()
    ref_sd = _srnet_reference_sd(t, attention=False)
    out_sd = _roundtrip(ref_sd, "RESNET")

    # strict-load the exported dict back into the torch model (undo the
    # reference-name rewrite first) and check forward equivalence
    inv = {v: k for k, v in {
        "head.": "input_conv.", "head_prelu.": "prelu.",
        "mid.": "mid_conv.", "up1.conv.": "upsample.0.",
        "up1.prelu.": "upsample.2.", "up2.conv.": "upsample.3.",
        "up2.prelu.": "upsample.5.", "tail.": "output_conv.",
    }.items()}
    back = {}
    for k, v in out_sd.items():
        for old, new in inv.items():
            if k.startswith(old):
                k = new + k[len(old):]
                break
        else:
            if k.startswith("res_blocks."):
                k = "blocks." + k[len("res_blocks."):]
        back[k] = torch.from_numpy(np.ascontiguousarray(v))
    x = torch.rand(1, 3, 12, 12)
    with torch.no_grad():
        want = t(x)
        t.load_state_dict(back, strict=True)
        got = t(x)
    torch.testing.assert_close(got, want)


def test_roundtrip_discriminator():
    t = TorchDiscriminator(nf=8).eval()
    with torch.no_grad():  # settle the power-iteration u/v buffers
        t(torch.rand(2, 3, 32, 32))
    ref_sd = _discriminator_reference_sd(t)
    _roundtrip(ref_sd, "Discriminator")


def test_roundtrip_srcnn():
    import torch.nn as tnn

    sd = {}
    for name, (cin, cout, k) in {"conv1": (3, 8, 9), "conv2": (8, 6, 1),
                                 "conv3": (6, 3, 5)}.items():
        conv = tnn.Conv2d(cin, cout, k)
        sd[f"{name}.weight"] = conv.weight.detach()
        sd[f"{name}.bias"] = conv.bias.detach()
    _roundtrip(sd, "SRCNN")
