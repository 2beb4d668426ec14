"""Cross-framework TRAINING parity vs the real reference implementation
(VERDICT round-1 item #2): forward parity alone cannot catch a
loss-weighting, BN-momentum, or optimizer-wiring mismatch.

Per CLAUDE.md's numerics rule, raw gradients are compared (never
post-Adam params: Adam's first step is ~lr*sign(g) and amplifies
reduction-order noise on mathematically-zero grads), and multi-step
trajectories use SGD. The torch side is the AUTHORITATIVE code: models
from /root/reference/src/models.py and losses from
/root/reference/src/loss.py (imported with a stubbed torchvision so
NLPDLoss/TVLoss load without the unavailable pretrained-VGG machinery),
stepped exactly as the reference hot loop does
(loss = criterion(model(lr), hr); loss.backward(); optimizer.step() —
reference train.py:117-120). Gradients cross frameworks through the
production exporter's tensor-layout mapping (tools/export_sr_checkpoint),
so every trainable leaf is compared by its reference state_dict name.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from food101_sr_tpu.data.pipeline import prepare_batch
from food101_sr_tpu.losses import get_loss_function
from food101_sr_tpu.models import AttentionSR, ResNetSR, get_model
from food101_sr_tpu.training.state import SRTrainState
from food101_sr_tpu.training.steps import make_train_step
from tools.export_sr_checkpoint import export_state_dict
from tools.reference_import import load_reference_losses, load_reference_models

torch.manual_seed(0)


ref_models = load_reference_models()
ref_loss = load_reference_losses()


def _torch_criterion(name):
    """The reference loss registry entries testable in this image
    (reference src/loss.py:81-92)."""
    if name == "mae":
        return torch.nn.L1Loss()
    if name == "mse":
        return torch.nn.MSELoss()
    if name == "nlpd":
        return ref_loss.NLPDLoss(device="cpu", channels=3)
    raise ValueError(name)


# small non-registry variants keep 20-step CPU trajectories fast; the
# registry-size forward parity lives in test_reference_parity.py
def _small(arch):
    if arch == "SRCNN":
        return (get_model("SRCNN", scale_factor=4),
                ref_models.SRCNN(scale_factor=4, hidden_dim=64))
    if arch == "RESNET":
        return (ResNetSR(scale_factor=4, num_channels=16, num_residuals=2),
                ref_models.ResNetSR(scale_factor=4, num_channels=16,
                                    num_residuals=2))
    return (AttentionSR(scale_factor=4, num_channels=32, num_residuals=3),
            ref_models.AttentionSR(scale_factor=4, num_channels=32,
                                   num_residuals=3))


def _init_and_share(arch, seed=0):
    model, ref = _small(arch)
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)
    tree = {"params": variables["params"],
            "extra": {k: v for k, v in variables.items() if k != "params"}}
    sd, _ = export_state_dict(tree, arch if arch != "AttentionSR" else None)
    ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}, strict=True)
    return model, variables, ref


def _batches(n, batch=2, crop=32, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (batch, crop, crop, 3), dtype=np.uint8)
            for _ in range(n)]


def _torch_pair(hr_u8, scale=4):
    """Identical (lr, hr) float batches on the torch side — degradation
    parity has its own tests (test_data/test_resize); this isolates
    *training* parity."""
    lr, hr = prepare_batch(jnp.asarray(hr_u8), scale)
    to_t = lambda a: torch.from_numpy(
        np.transpose(np.asarray(a), (0, 3, 1, 2)).copy())
    return to_t(lr), to_t(hr)


def _flax_grads(model, variables, hr_u8, loss_fn, scale=4):
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    lr_img, hr = prepare_batch(jnp.asarray(hr_u8), scale)

    def loss_of(p):
        out = model.apply({"params": p, **extra}, lr_img, train=True,
                          mutable=["batch_stats", "spectral"])
        sr = out[0]
        return loss_fn(sr, hr)

    return jax.grad(loss_of)(params), extra


def _grads_as_ref_layout(grads, extra, arch):
    """Map the flax grad pytree to reference state_dict names through the
    production exporter (grads share the params tree structure)."""
    sd, _ = export_state_dict({"params": grads, "extra": extra},
                              arch if arch != "AttentionSR" else None)
    return sd


@pytest.mark.parametrize("arch,loss_name", [
    ("SRCNN", "nlpd"),      # the reference CLI default loss
    ("SRCNN", "mae"),
    ("RESNET", "mse"),      # BN-in-train-mode gradient path
    ("AttentionSR", "mae"), # the AttentionSR sweep winner's loss
])
def test_raw_gradient_parity(arch, loss_name):
    model, variables, ref = _init_and_share(arch)
    ref.train()
    hr_u8 = _batches(1)[0]

    grads, extra = _flax_grads(model, variables, hr_u8,
                               get_loss_function(loss_name))
    sd_grads = _grads_as_ref_layout(grads, extra, arch)

    lr_t, hr_t = _torch_pair(hr_u8)
    criterion = _torch_criterion(loss_name)
    ref.zero_grad()
    criterion(ref(lr_t), hr_t).backward()

    # BN-fed conv biases have MATHEMATICALLY-ZERO gradients (any constant
    # added before BN cancels in the mean-subtraction), so both frameworks
    # produce pure reduction-order noise there — per CLAUDE.md's numerics
    # rule these leaves are asserted near-zero on BOTH sides rather than
    # compared noise-to-noise. In the reference that's res_blocks.*.conv1/
    # conv2.bias and mid_conv.bias (all feed a BatchNorm,
    # reference src/models.py:46-49,113-114).
    import re

    zero_grad = (re.compile(r"(res_blocks\.\d+\.conv[12]|mid_conv)\.bias$")
                 if arch == "RESNET" else re.compile(r"$^"))
    global_scale = max(float(np.abs(p.grad.numpy()).max())
                       for _, p in ref.named_parameters()
                       if p.grad is not None)
    compared = 0
    for name, p in ref.named_parameters():
        if p.grad is None:
            continue
        want = p.grad.numpy()
        got = np.asarray(sd_grads[name]).reshape(want.shape)
        if zero_grad.search(name):
            assert np.abs(want).max() < 1e-3 * global_scale, name
            assert np.abs(got).max() < 1e-3 * global_scale, name
        else:
            scale = np.abs(want).max() + 1e-12
            np.testing.assert_allclose(
                got / scale, want / scale, atol=5e-5,
                err_msg=f"{arch}/{loss_name}: {name}")
        compared += 1
    assert compared == sum(1 for _ in ref.parameters())


@pytest.mark.parametrize("arch,loss_name", [
    ("SRCNN", "nlpd"),
    ("RESNET", "mse"),   # pins BN momentum + running-stat drift over steps
])
def test_sgd_trajectory_and_eval_parity(arch, loss_name):
    """20 shared-batch SGD steps through OUR production train step vs the
    reference loop; per-step loss agreement + eval-mode forward parity at
    the end (the latter catches BN running-average semantics that the
    train-mode losses never read)."""
    n_steps, lr = 20, 1e-3
    model, variables, ref = _init_and_share(arch, seed=1)
    loss_fn = get_loss_function(loss_name)

    from food101_sr_tpu.training.diagnostics import FIRST_LAST

    first, last = FIRST_LAST[arch]
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate))(learning_rate=lr)
    state = SRTrainState.create(dict(variables), tx)
    step = jax.jit(make_train_step(model, loss_fn, 4, first, last))

    ref.train()
    opt = torch.optim.SGD(ref.parameters(), lr=lr)
    criterion = _torch_criterion(loss_name)

    batches = _batches(n_steps, seed=11)
    losses_ours, losses_ref = [], []
    for hr_u8 in batches:
        state, metrics = step(state, jnp.asarray(hr_u8))
        losses_ours.append(float(metrics["train_loss"]))
        lr_t, hr_t = _torch_pair(hr_u8)
        opt.zero_grad()
        loss = criterion(ref(lr_t), hr_t)
        loss.backward()
        opt.step()
        losses_ref.append(float(loss))

    np.testing.assert_allclose(losses_ours, losses_ref, rtol=2e-3,
                               err_msg=f"{arch}/{loss_name} loss trajectory")
    # losses must actually evolve for the comparison to mean anything
    assert abs(losses_ours[-1] - losses_ours[0]) > 1e-7

    # eval-mode forward with the TRAINED params + running stats
    ref.eval()
    hr_u8 = _batches(1, seed=99)[0]
    lr_img, _ = prepare_batch(jnp.asarray(hr_u8), 4)
    ours = np.asarray(model.apply(
        {"params": state.params, **state.extra}, lr_img, train=False))
    lr_t, _ = _torch_pair(hr_u8)
    with torch.no_grad():
        want = np.transpose(ref(lr_t).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, want, atol=5e-4, rtol=1e-3)
