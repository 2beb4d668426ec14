"""RRDBNet (ESRGAN-family generator, models/rrdb.py) — structure, torch
parity with shared weights, phase-tail exactness, auto-detection, and a
production train-step smoke. Beyond-parity family: no reference counterpart
(reference src/models.py stops at AttentionSR), so the torch mirror here is
built from the ESRGAN block definition, not imported reference code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from food101_sr_tpu.models import (RRDBNet, detect_architecture, get_model,
                                   model_for_params, model_names)

NF, GC, NB = 16, 8, 2  # tiny test instance


def _tiny(scale=4, **kw):
    return RRDBNet(scale_factor=scale, num_channels=NF, growth=GC,
                   num_blocks=NB, **kw)


def _init(model, lr=12, seed=0):
    return model.init({"params": jax.random.PRNGKey(seed)},
                      jnp.zeros((1, lr, lr, 3), jnp.float32), train=False)


# ---------------------------------------------------------------------------
# registry / sizes
# ---------------------------------------------------------------------------

def test_registry_entry_and_canonical_param_count():
    assert "RRDB" in model_names()
    model = get_model("RRDB", scale_factor=4)
    assert (model.num_channels, model.growth, model.num_blocks) == (64, 32, 23)
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k},
                             jnp.zeros((1, 8, 8, 3), jnp.float32),
                             train=False),
        jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    # 64ch/growth-32/23-block ESRGAN body + this framework's ICNR
    # PixelShuffle tail (models/rrdb.py docstring derivation)
    assert n == 16_896_453


def test_registry_accepts_quantize_and_phase_tail():
    m = get_model("RRDB", quantize="int8", phase_tail=True)
    assert m.quantize == "int8" and m.phase_tail


# ---------------------------------------------------------------------------
# torch parity (shared weights)
# ---------------------------------------------------------------------------

class TorchRDB(tnn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        for i in range(4):
            setattr(self, f"conv{i + 1}", tnn.Conv2d(nf + i * gc, gc, 3,
                                                     padding=1))
        self.conv5 = tnn.Conv2d(nf + 4 * gc, nf, 3, padding=1)
        self.act = tnn.LeakyReLU(0.2)

    def forward(self, x):
        feats = [x]
        for i in range(4):
            feats.append(self.act(
                getattr(self, f"conv{i + 1}")(torch.cat(feats, dim=1))))
        return x + 0.2 * self.conv5(torch.cat(feats, dim=1))


class TorchRRDB(tnn.Module):
    def __init__(self, nf, gc):
        super().__init__()
        self.d1, self.d2, self.d3 = (TorchRDB(nf, gc) for _ in range(3))

    def forward(self, x):
        return x + 0.2 * self.d3(self.d2(self.d1(x)))


class TorchRRDBNet(tnn.Module):
    def __init__(self, nf, gc, nb, scale=4):
        super().__init__()
        self.head = tnn.Conv2d(3, nf, 3, padding=1)
        self.body = tnn.Sequential(*[TorchRRDB(nf, gc) for _ in range(nb)])
        self.mid = tnn.Conv2d(nf, nf, 3, padding=1)
        ups, c = [], nf
        while scale > 1:
            ups += [tnn.Conv2d(c, 64 * 4, 3, padding=1), tnn.PixelShuffle(2),
                    tnn.PReLU()]
            c, scale = 64, scale // 2
        self.up = tnn.Sequential(*ups)
        self.tail = tnn.Conv2d(64, 3, 9, padding=4)

    def forward(self, x):
        h = self.head(x)
        h = h + self.mid(self.body(h))
        return self.tail(self.up(h))


def _set_conv(tconv, fp):
    k, b = np.asarray(fp["conv"]["kernel"]), np.asarray(fp["conv"]["bias"])
    tconv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    tconv.bias.data = torch.from_numpy(b.copy())


def test_full_net_torch_parity_shared_weights():
    model = _tiny()
    variables = _init(model)
    p = variables["params"]
    t = TorchRRDBNet(NF, GC, NB)
    _set_conv(t.head, p["input_conv"])
    _set_conv(t.mid, p["mid_conv"])
    for i in range(NB):
        for j in range(3):
            ours = p[f"rrdb_{i}"][f"dense{j + 1}"]
            theirs = getattr(t.body[i], f"d{j + 1}")
            for c in range(5):
                _set_conv(getattr(theirs, f"conv{c + 1}"), ours[f"conv{c + 1}"])
    for s in range(2):
        _set_conv(t.up[3 * s], p[f"up_{s}"]["conv"])
        t.up[3 * s + 2].weight.data = torch.from_numpy(
            np.asarray(p[f"up_{s}"]["prelu"]["alpha"]).reshape(1).copy())
    _set_conv(t.tail, p["output_conv"])

    x = np.random.default_rng(1).uniform(0, 1, (2, 12, 12, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy()))
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# phase tail / scales
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", [2, 3, 4])
def test_phase_tail_exact_same_params(scale):
    model = _tiny(scale=scale)
    variables = _init(model)
    x = jnp.asarray(np.random.default_rng(2)
                    .uniform(0, 1, (2, 12, 12, 3)).astype(np.float32))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 12 * scale, 12 * scale, 3)
    yp = _tiny(scale=scale, phase_tail=True).apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yp),
                               atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# detection / checkpoint auto-inference
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", [3, 4])
def test_detect_and_model_for_params_roundtrip(scale):
    variables = _init(_tiny(scale=scale))
    params = variables["params"]
    assert detect_architecture(params) == "RRDB"
    m = model_for_params(params, scale_factor=999)  # checkpoint overrides
    assert isinstance(m, RRDBNet)
    assert (m.num_channels, m.growth, m.num_blocks) == (NF, GC, NB)
    assert m.scale_factor == scale  # incl. the non-power-of-two x3 stage


def test_model_for_params_infers_x3_scale_for_attention_sr():
    # the per-stage kernel-shape inference (cout = 64*s^2) must resolve
    # non-power-of-two checkpoints for the parity families too
    from food101_sr_tpu.models import AttentionSR

    model = AttentionSR(scale_factor=3, num_channels=16, num_residuals=1)
    variables = _init(model, lr=9, seed=3)
    m = model_for_params(variables["params"])
    assert isinstance(m, AttentionSR) and m.scale_factor == 3


# ---------------------------------------------------------------------------
# production train step
# ---------------------------------------------------------------------------

def test_train_step_smoke():
    from food101_sr_tpu.losses import get_loss_function
    from food101_sr_tpu.training import (SRTrainState, make_adam,
                                         make_train_step)
    from food101_sr_tpu.training.diagnostics import FIRST_LAST

    scale = 4
    model = _tiny(scale=scale)
    variables = _init(model, lr=8)
    state = SRTrainState.create(dict(variables), make_adam(1e-4))
    first, last = FIRST_LAST["RRDB"]
    step = jax.jit(make_train_step(model, get_loss_function("mae"), scale,
                                   first, last))
    hr = jnp.asarray(np.random.default_rng(4).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    state, metrics = step(state, hr)
    l0 = float(metrics["train_loss"])
    assert np.isfinite(l0) and float(metrics["dynamics/grad_norm"]) > 0
    for _ in range(3):
        state, metrics = step(state, hr)
    assert float(metrics["train_loss"]) < l0
