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
# registry-size forward parity lives in test_reference_parity.py.
# ``phase_tail`` builds OUR side with the fused phase-space upsample tail
# (the production train.py default) — the torch side is unchanged, so these
# legs are direct cross-framework evidence for the default, not just
# phase-vs-standard self-consistency (tests/test_phase_tail.py).
def _small(arch, phase_tail=False):
    if arch == "SRCNN":
        assert not phase_tail  # SRCNN has no upsample tail
        return (get_model("SRCNN", scale_factor=4),
                ref_models.SRCNN(scale_factor=4, hidden_dim=64))
    if arch == "RESNET":
        return (ResNetSR(scale_factor=4, num_channels=16, num_residuals=2,
                         phase_tail=phase_tail),
                ref_models.ResNetSR(scale_factor=4, num_channels=16,
                                    num_residuals=2))
    return (AttentionSR(scale_factor=4, num_channels=32, num_residuals=3,
                        phase_tail=phase_tail),
            ref_models.AttentionSR(scale_factor=4, num_channels=32,
                                   num_residuals=3))


def _init_and_share(arch, seed=0, phase_tail=False):
    model, ref = _small(arch, phase_tail)
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


@pytest.mark.parametrize("arch,loss_name,phase_tail", [
    ("SRCNN", "nlpd", False),      # the reference CLI default loss
    ("SRCNN", "mae", False),
    ("RESNET", "mse", False),      # BN-in-train-mode gradient path
    ("AttentionSR", "mae", False), # the AttentionSR sweep winner's loss
    # the production train.py default (phase_tail=True) vs the unchanged
    # torch reference — both tailed archs
    ("RESNET", "mse", True),
    ("AttentionSR", "mae", True),
])
def test_raw_gradient_parity(arch, loss_name, phase_tail):
    model, variables, ref = _init_and_share(arch, phase_tail=phase_tail)
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
                err_msg=f"{arch}/{loss_name}/pt={phase_tail}: {name}")
        compared += 1
    assert compared == sum(1 for _ in ref.parameters())


@pytest.mark.parametrize("arch,loss_name,phase_tail", [
    ("SRCNN", "nlpd", False),
    ("RESNET", "mse", False),  # pins BN momentum + running-stat drift
    # the flagship arch through OUR production train step with the
    # production default tail (phase_tail=True) vs the reference loop —
    # the multi-step cross-framework leg backing train.py's default
    ("AttentionSR", "mae", True),
])
def test_sgd_trajectory_and_eval_parity(arch, loss_name, phase_tail):
    """20 shared-batch SGD steps through OUR production train step vs the
    reference loop; per-step loss agreement + eval-mode forward parity at
    the end (the latter catches BN running-average semantics that the
    train-mode losses never read)."""
    n_steps, lr = 20, 1e-3
    model, variables, ref = _init_and_share(arch, seed=1,
                                            phase_tail=phase_tail)
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


def test_gan_generator_step_parity(tmp_path):
    """One production GAN generator step (make_gan_g_step: composite
    pixel+perceptual+adversarial+TV loss, grad-clip 1.0, train-mode D with
    spectral-norm power iteration threaded through both forwards) vs the
    reference's G update (reference train.py:104-114) with shared G, D,
    and VGG weights. SGD on both sides so the post-step param delta IS the
    clipped gradient (CLAUDE.md numerics rule); pins the loss weights, the
    relativistic adv term's stop-gradient/.detach() placement, the
    D-forward ordering (fake then real), and the clip wiring."""
    import torch.nn.functional as F

    from test_feature_nets_torch import torch_vgg19_features35

    from food101_sr_tpu.models import Discriminator
    from food101_sr_tpu.training.diagnostics import FIRST_LAST
    from food101_sr_tpu.training.steps import make_gan_g_step
    from tools.convert_torch_weights import features_to_arrays

    lr = 1e-3
    g_model, g_vars, g_ref = _init_and_share("SRCNN", seed=2)

    d_model = Discriminator(nf=16)
    d_vars = d_model.init({"params": jax.random.PRNGKey(3)},
                          jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    d_ref = ref_models.Discriminator(nf=16)
    sd, _ = export_state_dict(
        {"params": d_vars["params"],
         "extra": {k: v for k, v in d_vars.items() if k != "params"}},
        "Discriminator")
    d_ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)

    # shared-weight VGG19[:35] perceptual (structure parity has its own
    # tests; here it rides inside the composite loss)
    tvgg = torch_vgg19_features35()
    np.savez(tmp_path / "vgg19_features.npz", **features_to_arrays(tvgg))
    percep = get_loss_function("perceptual", weights_dir=str(tmp_path))
    assert percep.pretrained

    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(1.0), optax.sgd(learning_rate)
        ))(learning_rate=lr)
    g_state = SRTrainState.create(dict(g_vars), tx)
    d_state = SRTrainState.create(dict(d_vars), optax.sgd(lr))
    first, last = FIRST_LAST["SRCNN"]
    g_step = jax.jit(make_gan_g_step(g_model, d_model, percep, 4,
                                     first, last))

    hr_u8 = _batches(1, batch=2, crop=32, seed=7)[0]
    new_g, _, metrics = g_step(g_state, d_state, jnp.asarray(hr_u8))

    # --- the reference's G update, verbatim formulas ---------------------
    g_ref.train()
    d_ref.train()
    opt = torch.optim.SGD(g_ref.parameters(), lr=lr)
    lr_t, hr_t = _torch_pair(hr_u8)
    opt.zero_grad()
    fake = g_ref(lr_t)
    fake_logits = d_ref(fake)
    real_logits = d_ref(hr_t).detach()
    loss_adv = F.binary_cross_entropy_with_logits(
        fake_logits - real_logits.mean(), torch.ones_like(fake_logits))
    loss_pixel = F.l1_loss(fake, hr_t)
    loss_percep = F.mse_loss(tvgg(fake), tvgg(hr_t))
    loss_tv = ref_loss.TVLoss(tv_loss_weight=1)(fake)
    loss = (1e-2 * loss_pixel + 1.0 * loss_percep + 1e-5 * loss_adv
            + 2e-5 * loss_tv)
    loss.backward()
    torch.nn.utils.clip_grad_norm_(g_ref.parameters(), max_norm=1.0)
    opt.step()

    np.testing.assert_allclose(float(metrics["train_loss"]), float(loss),
                               rtol=2e-4, err_msg="composite G loss")
    # post-step G params leaf-by-leaf through the production exporter
    got, _ = export_state_dict(
        {"params": new_g.params,
         "extra": {k: v for k, v in new_g.extra.items()}}, "SRCNN")
    want = g_ref.state_dict()
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), atol=2e-6, rtol=2e-4,
            err_msg=f"post-G-step {k}")


def test_gan_discriminator_step_parity():
    """One production GAN discriminator step (make_gan_d_step: relativistic
    average BCE, 0.9/0.1 label smoothing, real-then-fake forward ordering
    with spectral-norm power iteration threaded through) vs the reference's
    D update (reference train.py:87-101), shared weights, SGD both sides.
    Instance noise is sigma=0 on both sides — its RNG cannot be shared
    across frameworks; the noise helper itself is covered by the D-loss
    formula golden in test_training.py. SRCNN generator: the reference
    computes `fake` through a train-mode G where we use eval-mode — for
    BN-free SRCNN the two are identical, isolating the D math."""
    import torch.nn.functional as F

    from food101_sr_tpu.models import Discriminator
    from food101_sr_tpu.training.steps import make_gan_d_step

    lr = 1e-3
    g_model, g_vars, g_ref = _init_and_share("SRCNN", seed=4)
    d_model = Discriminator(nf=16)
    d_vars = d_model.init({"params": jax.random.PRNGKey(5)},
                          jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    d_ref = ref_models.Discriminator(nf=16)
    sd, _ = export_state_dict(
        {"params": d_vars["params"],
         "extra": {k: v for k, v in d_vars.items() if k != "params"}},
        "Discriminator")
    d_ref.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)

    g_state = SRTrainState.create(dict(g_vars), optax.sgd(lr))
    d_state = SRTrainState.create(
        dict(d_vars),
        optax.inject_hyperparams(
            lambda learning_rate: optax.sgd(learning_rate)
        )(learning_rate=lr))
    d_step = jax.jit(make_gan_d_step(g_model, d_model, 4, noise_sigma=0.0))

    hr_u8 = _batches(1, batch=2, crop=32, seed=13)[0]
    new_d, metrics = d_step(g_state, d_state, jnp.asarray(hr_u8),
                            jax.random.PRNGKey(0))

    d_ref.train()
    opt = torch.optim.SGD(d_ref.parameters(), lr=lr)
    lr_t, hr_t = _torch_pair(hr_u8)
    with torch.no_grad():
        fake = g_ref.eval()(lr_t)
    opt.zero_grad()
    real_logits = d_ref(hr_t)
    fake_logits = d_ref(fake)
    d_loss_real = F.binary_cross_entropy_with_logits(
        real_logits - fake_logits.mean(),
        torch.full_like(real_logits, 0.9))
    d_loss_fake = F.binary_cross_entropy_with_logits(
        fake_logits - real_logits.mean(),
        torch.full_like(fake_logits, 0.1))
    loss = (d_loss_real + d_loss_fake) / 2
    loss.backward()
    opt.step()

    np.testing.assert_allclose(float(metrics["train_loss_D"]),
                               float(loss.detach()), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics["gan_dynamics/prob_real"]),
        float(torch.sigmoid(real_logits).mean()), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics["gan_dynamics/prob_fake"]),
        float(torch.sigmoid(fake_logits).mean()), rtol=2e-4)
    got, _ = export_state_dict(
        {"params": new_d.params, "extra": dict(new_d.extra)}, "Discriminator")
    want = d_ref.state_dict()
    assert set(got) == set(want)
    for k in sorted(want):
        if k.endswith("num_batches_tracked"):
            # torch-only bookkeeping, consumed only under momentum=None
            # (cumulative averaging) which the reference never uses; the
            # exporter emits a constant placeholder for load compatibility
            continue
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), atol=2e-6, rtol=2e-4,
            err_msg=f"post-D-step {k}")
