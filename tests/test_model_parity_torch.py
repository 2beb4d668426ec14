"""Full-model numerical parity vs. PyTorch replicas of the reference
architectures (reference src/models.py), with identical weights.

Block-level goldens (test_models.py) pin individual ops; these tests load
ONE set of weights into both the Flax model and a torch replica of the
reference architecture and compare the whole eval-mode forward — the
strongest parity statement short of the original checkpoints (which the
reference never published; BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from food101_sr_tpu.models import AttentionSR, ResNetSR, get_model

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# weight transfer helpers (flax -> torch)
# ---------------------------------------------------------------------------

def _set_conv(tconv: tnn.Conv2d, fp):
    k = np.asarray(fp["conv"]["kernel"])  # HWIO
    tconv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    if "bias" in fp["conv"]:
        tconv.bias.data = torch.from_numpy(np.asarray(fp["conv"]["bias"]).copy())


def _set_prelu(tprelu: tnn.PReLU, fp):
    tprelu.weight.data = torch.tensor([float(np.asarray(fp["alpha"]))])


def _set_linear(tlin: tnn.Linear, kernel):
    tlin.weight.data = torch.from_numpy(np.asarray(kernel).T.copy())


def _set_bn(tbn: tnn.BatchNorm2d, params, stats):
    tbn.weight.data = torch.from_numpy(np.asarray(params["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(stats["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(stats["var"]).copy())


def _fwd_flax(model, variables, x_nhwc):
    out = model.apply(variables, jnp.asarray(x_nhwc), train=False)
    return np.asarray(out)


def _fwd_torch(model, x_nhwc):
    x = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        y = model(x)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# torch replicas of the reference architectures
# ---------------------------------------------------------------------------

class TorchSE(tnn.Module):
    def __init__(self, c, r=16):
        super().__init__()
        self.fc1 = tnn.Linear(c, c // r, bias=False)
        self.fc2 = tnn.Linear(c // r, c, bias=False)

    def forward(self, x):
        s = x.mean(dim=(2, 3))
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s[:, :, None, None]


class TorchAttnBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
        self.prelu = tnn.PReLU()
        self.conv2 = tnn.Conv2d(c, c, 3, padding=1)
        self.se = TorchSE(c)

    def forward(self, x):
        return x + 0.1 * self.se(self.conv2(self.prelu(self.conv1(x))))


class TorchResBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(c)
        self.prelu = tnn.PReLU()
        self.conv2 = tnn.Conv2d(c, c, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(c)

    def forward(self, x):
        r = self.bn2(self.conv2(self.prelu(self.bn1(self.conv1(x)))))
        return x + r


class TorchUp(tnn.Module):
    def __init__(self, c_in, c_out=64, r=2):
        super().__init__()
        self.conv = tnn.Conv2d(c_in, c_out * r * r, 3, padding=1)
        self.ps = tnn.PixelShuffle(r)
        self.prelu = tnn.PReLU()

    def forward(self, x):
        return self.prelu(self.ps(self.conv(x)))


class TorchSRNet(tnn.Module):
    """Shared skeleton: head conv9+PReLU -> blocks -> mid(+bn) -> skip ->
    2 x up -> tail conv9 (reference src/models.py:104-189)."""

    def __init__(self, ch, blocks, attention):
        super().__init__()
        self.head = tnn.Conv2d(3, ch, 9, padding=4)
        self.head_prelu = tnn.PReLU()
        mk = TorchAttnBlock if attention else TorchResBlock
        self.blocks = tnn.ModuleList([mk(ch) for _ in range(blocks)])
        self.mid = tnn.Conv2d(ch, ch, 3, padding=1)
        self.bn_mid = None if attention else tnn.BatchNorm2d(ch)
        self.up1 = TorchUp(ch)
        self.up2 = TorchUp(64)
        self.tail = tnn.Conv2d(64, 3, 9, padding=4)

    def forward(self, x):
        h = self.head_prelu(self.head(x))
        r = h
        for b in self.blocks:
            r = b(r)
        r = self.mid(r)
        if self.bn_mid is not None:
            r = self.bn_mid(r)
        x = h + r
        return self.tail(self.up2(self.up1(x)))


def _load_srnet(tmodel: TorchSRNet, variables, attention: bool):
    p = variables["params"]
    stats = variables.get("batch_stats", {})
    _set_conv(tmodel.head, p["input_conv"])
    _set_prelu(tmodel.head_prelu, p["prelu"])
    for i, b in enumerate(tmodel.blocks):
        fp = p[f"res_{i}"]
        _set_conv(b.conv1, fp["conv1"])
        _set_conv(b.conv2, fp["conv2"])
        _set_prelu(b.prelu, fp["prelu"])
        if attention:
            _set_linear(b.se.fc1, fp["se"]["fc1"]["kernel"])
            _set_linear(b.se.fc2, fp["se"]["fc2"]["kernel"])
        else:
            fs = stats[f"res_{i}"]
            _set_bn(b.bn1, fp["bn1"], fs["bn1"])
            _set_bn(b.bn2, fp["bn2"], fs["bn2"])
    _set_conv(tmodel.mid, p["mid_conv"])
    if tmodel.bn_mid is not None:
        _set_bn(tmodel.bn_mid, p["bn_mid"], stats["bn_mid"])
    for i, up in enumerate((tmodel.up1, tmodel.up2)):
        _set_conv(up.conv, p[f"up_{i}"]["conv"])
        _set_prelu(up.prelu, p[f"up_{i}"]["prelu"])
    _set_conv(tmodel.tail, p["output_conv"])
    tmodel.eval()


def _rand_stats(variables, seed):
    """Randomize BN running stats so parity isn't trivially 0-mean/1-var."""
    rng = np.random.default_rng(seed)

    def rnd(path, leaf):
        name = path[-1].key
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, leaf.shape), jnp.float32)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape), jnp.float32)
        return leaf

    variables = dict(variables)
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        rnd, variables["batch_stats"])
    return variables


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_attention_sr_full_parity():
    model = AttentionSR(scale_factor=4, num_channels=32, num_residuals=4)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 12, 12, 3), jnp.float32), train=False)
    t = TorchSRNet(32, 4, attention=True)
    _load_srnet(t, variables, attention=True)

    x = np.random.default_rng(1).uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd_flax(model, variables, x), _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


def test_resnet_sr_full_parity():
    model = ResNetSR(scale_factor=4, num_channels=32, num_residuals=3)
    variables = model.init({"params": jax.random.PRNGKey(2)},
                           jnp.zeros((1, 12, 12, 3), jnp.float32), train=False)
    variables = _rand_stats(variables, 7)
    t = TorchSRNet(32, 3, attention=False)
    _load_srnet(t, variables, attention=False)

    x = np.random.default_rng(3).uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd_flax(model, variables, x), _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


def test_srcnn_full_parity():
    model = get_model("SRCNN", scale_factor=4)
    variables = model.init({"params": jax.random.PRNGKey(4)},
                           jnp.zeros((1, 10, 10, 3), jnp.float32), train=False)

    class TorchSRCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv2d(3, 64, 9, padding=4)
            self.c2 = tnn.Conv2d(64, 64, 1)
            self.c3 = tnn.Conv2d(64, 3, 5, padding=2)

        def forward(self, x):
            x = F.interpolate(x, scale_factor=4, mode="bicubic",
                              align_corners=False)
            return self.c3(torch.relu(self.c2(torch.relu(self.c1(x)))))

    t = TorchSRCNN()
    p = variables["params"]
    _set_conv(t.c1, p["conv1"])
    _set_conv(t.c2, p["conv2"])
    _set_conv(t.c3, p["conv3"])
    t.eval()

    x = np.random.default_rng(5).uniform(0, 1, (2, 10, 10, 3)).astype(np.float32)
    np.testing.assert_allclose(
        _fwd_flax(model, variables, x), _fwd_torch(t, x), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Discriminator (spectral norm) vs torch.nn.utils.spectral_norm
# ---------------------------------------------------------------------------

class TorchDiscriminator(tnn.Module):
    """Reference critic (reference src/models.py:191-217) using torch's own
    spectral_norm so the test validates our power-iteration semantics
    against torch ground truth, not a re-implementation."""

    def __init__(self, nf=16):
        super().__init__()
        sn = tnn.utils.spectral_norm
        self.b0 = sn(tnn.Conv2d(3, nf, 3, 1, 1))
        self.b1 = sn(tnn.Conv2d(nf, nf * 2, 3, 2, 1, bias=False))
        self.bn1 = tnn.BatchNorm2d(nf * 2)
        self.b2 = sn(tnn.Conv2d(nf * 2, nf * 4, 3, 2, 1, bias=False))
        self.bn2 = tnn.BatchNorm2d(nf * 4)
        self.b3 = sn(tnn.Conv2d(nf * 4, nf * 8, 3, 2, 1, bias=False))
        self.bn3 = tnn.BatchNorm2d(nf * 8)
        self.fc1 = sn(tnn.Linear(nf * 8, 100))
        self.fc2 = sn(tnn.Linear(100, 1))

    def forward(self, x):
        a = lambda t: F.leaky_relu(t, 0.2)
        x = a(self.b0(x))
        x = a(self.bn1(self.b1(x)))
        x = a(self.bn2(self.b2(x)))
        x = a(self.bn3(self.b3(x)))
        x = x.mean(dim=(2, 3))
        return self.fc2(a(self.fc1(x)))


def _set_sn_conv(tconv, fp, fs):
    """Map a flax SNConv {params: {sn/kernel, bias?}, spectral: {sn/{u,v}}}
    onto torch spectral_norm state (weight_orig/weight_u/weight_v)."""
    k = np.asarray(fp["sn"]["kernel"])  # HWIO
    kh, kw, cin, cout = k.shape
    tconv.weight_orig.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    tconv.weight_u.data = torch.from_numpy(np.asarray(fs["sn"]["u"]).copy())
    # flax v is indexed by flat (kh, kw, cin); torch's by flat (cin, kh, kw)
    v = np.asarray(fs["sn"]["v"]).reshape(kh, kw, cin).transpose(2, 0, 1).ravel()
    tconv.weight_v.data = torch.from_numpy(v.copy())
    if hasattr(tconv, "bias") and tconv.bias is not None and "bias" in fp:
        tconv.bias.data = torch.from_numpy(np.asarray(fp["bias"]).copy())


def _set_sn_linear(tlin, fp, fs):
    k = np.asarray(fp["sn"]["kernel"])  # (in, out)
    tlin.weight_orig.data = torch.from_numpy(k.T.copy())
    tlin.weight_u.data = torch.from_numpy(np.asarray(fs["sn"]["u"]).copy())
    tlin.weight_v.data = torch.from_numpy(np.asarray(fs["sn"]["v"]).copy())
    tlin.bias.data = torch.from_numpy(np.asarray(fp["bias"]).copy())


def test_discriminator_full_parity():
    from food101_sr_tpu.models import Discriminator

    model = Discriminator(nf=16)
    variables = model.init({"params": jax.random.PRNGKey(6)},
                           jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    p, sp = variables["params"], variables["spectral"]
    stats = variables["batch_stats"]

    t = TorchDiscriminator(nf=16)
    _set_sn_conv(t.b0, p["block_0"], sp["block_0"])
    for i, (conv, bn) in enumerate(((t.b1, t.bn1), (t.b2, t.bn2),
                                    (t.b3, t.bn3)), start=1):
        _set_sn_conv(conv, p[f"block_{i}"], sp[f"block_{i}"])
        _set_bn(bn, p[f"bn_{i}"], stats[f"bn_{i}"])
    _set_sn_linear(t.fc1, p["fc1"], sp["fc1"])
    _set_sn_linear(t.fc2, p["fc2"], sp["fc2"])
    t.eval()

    x = np.random.default_rng(8).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    out_f = _fwd_flax(model, variables, x)  # (N, 1) logits
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        out_t = t(xt).numpy()
    np.testing.assert_allclose(out_f, out_t, atol=1e-4, rtol=1e-4)
