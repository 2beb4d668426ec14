"""Training runtime tests: schedules, state, jitted steps (loss decreases),
checkpoint round-trip, and the end-to-end CPU slice (BASELINE config #1)."""
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from food101_sr_tpu.models import SRCNN, Discriminator, get_model
from food101_sr_tpu.losses import mse_loss
from food101_sr_tpu.training import (
    EarlyStopping,
    ReduceLROnPlateau,
    SRTrainState,
    load_checkpoint,
    make_adam,
    make_eval_step,
    make_gan_d_step,
    make_gan_g_step,
    make_train_step,
    save_checkpoint,
    warm_start_params,
)


def _batch(n=4, size=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, (n, size, size, 3),
                                             dtype=np.uint8)
    )


def _make_state(model, lr_shape, lr=1e-3, seed=0, clip=None):
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros(lr_shape, jnp.float32), train=False)
    return SRTrainState.create(dict(variables), make_adam(lr, clip))


# --- schedules ---------------------------------------------------------------

def test_reduce_lr_on_plateau_torch_semantics():
    s = ReduceLROnPlateau(1.0, mode="max", factor=0.5, patience=2)
    assert s.step(10.0) == 1.0      # new best
    assert s.step(10.0) == 1.0      # bad 1 (not > best*(1+1e-4))
    assert s.step(10.0) == 1.0      # bad 2
    assert s.step(10.0) == 0.5      # bad 3 > patience -> decay
    assert s.step(20.0) == 0.5      # new best, no further decay
    assert s.step(5.0) == 0.5
    assert s.step(5.0) == 0.5
    assert s.step(5.0) == 0.25


def test_early_stopping():
    e = EarlyStopping(patience=2)
    assert e.update(1.0) is True
    assert e.update(0.5) is False and not e.should_stop
    assert e.update(0.4) is False and e.should_stop


# --- supervised step ---------------------------------------------------------

def test_train_step_decreases_loss_srcnn_x2():
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-3)
    step = jax.jit(make_train_step(model, mse_loss, 2, "conv1", "conv3"))
    hr = _batch(4, 32)
    losses = []
    for _ in range(30):
        state, metrics = step(state, hr)
        losses.append(float(metrics["train_loss"]))
    assert losses[-1] < losses[0] * 0.7
    assert int(state.step) == 30
    for key in ("dynamics/grad_norm", "dynamics/layer_ratio",
                "dynamics/update_ratio"):
        assert np.isfinite(float(metrics[key]))


def test_train_step_resnet_updates_batch_stats():
    model = get_model("RESNET", scale_factor=4)
    state = _make_state(model, (1, 8, 8, 3))
    step = jax.jit(make_train_step(model, mse_loss, 4, "input_conv",
                                   "output_conv"))
    old_bs = jax.tree_util.tree_leaves(state.extra["batch_stats"])
    state, _ = step(state, _batch(2, 32))
    new_bs = jax.tree_util.tree_leaves(state.extra["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old_bs, new_bs))


def test_eval_step_metrics():
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3))
    ev = jax.jit(make_eval_step(model, mse_loss, 2))
    out = ev(state.params, state.extra, _batch(2, 32))
    assert np.isfinite(float(out["psnr"]))
    assert float(out["val_loss"]) > 0


def test_set_learning_rate_no_retrace():
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-3)
    traces = []

    def _counting(state, hr):
        traces.append(1)
        return make_train_step(model, mse_loss, 2, "conv1", "conv3")(state, hr)

    step = jax.jit(_counting)
    hr = _batch(2, 32)
    state, _ = step(state, hr)
    state = state.set_learning_rate(5e-4)
    state, _ = step(state, hr)
    assert len(traces) == 1
    assert float(state.learning_rate) == pytest.approx(5e-4)


# --- GAN steps ---------------------------------------------------------------

def test_gan_steps_run_and_update():
    g_model = get_model("AttentionSR", scale_factor=4)
    # tiny D-compatible config: crop 32
    g_state = _make_state(g_model, (1, 8, 8, 3), lr=1e-4, clip=1.0)
    d_model = Discriminator(nf=16)
    d_vars = d_model.init({"params": jax.random.PRNGKey(5)},
                          jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
    d_state = SRTrainState.create(dict(d_vars), make_adam(1e-5))

    d_step = jax.jit(make_gan_d_step(g_model, d_model, 4))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from food101_sr_tpu.losses import PerceptualLoss
        percep = PerceptualLoss()
    g_step = jax.jit(make_gan_g_step(g_model, d_model, percep, 4,
                                     "input_conv", "output_conv"))

    hr = _batch(2, 32)
    d_state2, dm = d_step(g_state, d_state, hr, jax.random.PRNGKey(0))
    assert np.isfinite(float(dm["train_loss_D"]))
    assert 0.0 <= float(dm["gan_dynamics/prob_real"]) <= 1.0
    # D params changed
    d0 = jax.tree_util.tree_leaves(d_state.params)
    d1 = jax.tree_util.tree_leaves(d_state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(d0, d1))
    # spectral state updated
    s0 = jax.tree_util.tree_leaves(d_state.extra["spectral"])
    s1 = jax.tree_util.tree_leaves(d_state2.extra["spectral"])
    assert any(not np.allclose(a, b) for a, b in zip(s0, s1))

    g_state2, d_state3, gm = g_step(g_state, d_state2, hr)
    assert np.isfinite(float(gm["train_loss"]))
    g0 = jax.tree_util.tree_leaves(g_state.params)
    g1 = jax.tree_util.tree_leaves(g_state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(g0, g1))


# --- checkpointing -----------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3))
    tree = {"params": state.params, "extra": state.extra}
    path = save_checkpoint(tree, os.path.join(tmp_path, "ck"))
    restored = load_checkpoint(path, tree)
    for a, b in zip(jax.tree_util.tree_leaves(tree),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_partial():
    a = {"conv1": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))},
         "conv2": {"kernel": jnp.ones((2, 2))}}
    loaded = {"conv1": {"kernel": jnp.full((3, 3), 7.0),
                        "bias": jnp.zeros((5,))},  # shape mismatch -> skip
              "extra_key": {"kernel": jnp.zeros((1,))}}
    merged = warm_start_params(a, loaded)
    np.testing.assert_array_equal(np.asarray(merged["conv1"]["kernel"]), 7.0 * np.ones((3, 3)))
    assert merged["conv1"]["bias"].shape == (3,)
    assert "extra_key" not in merged
    np.testing.assert_array_equal(np.asarray(merged["conv2"]["kernel"]), np.ones((2, 2)))


# --- end-to-end slice (BASELINE config #1, CPU-runnable) ---------------------

def test_end_to_end_srcnn_x2_synthetic(tmp_path):
    from food101_sr_tpu.training import train

    cfg = {
        "architecture": "SRCNN",
        "dataset": "synthetic",
        # 96 images -> val split 10 >= the 8-device test mesh (smaller and
        # the val loader can't fill one evenly-sharded batch)
        "synthetic_size": 96,
        "crop_size": 96,
        "scale_factor": 2,
        "batch_size": 16,
        "lr": 1e-3,
        "epochs": 3,
        "loss_function": "mse",
        "subset": 1.0,
        "patience": 5,
        "save_name": "srcnn_test",
        "weights_dir": str(tmp_path / "weights"),
        "run_name": "e2e_test",
        "use_wandb": False,
        "log_every": 1,
    }
    final = train(cfg)
    assert set(final) == {"psnr", "ssim", "lpips", "nlpd", "val_psnr"}
    # ~10 steps of SRCNN x2 from scratch: well above a garbage output
    # (threshold calibrated on CPU fp32 numerics, seed 0)
    assert final["psnr"] > 10.0
    assert os.path.isdir(os.path.join(cfg["weights_dir"], "srcnn_test_best"))


def test_train_step_bfloat16_dtype():
    """--dtype bfloat16 path: compute in bf16 (fp32 params), finite loss,
    loss decreases over a few steps."""
    model = get_model("SRCNN", scale_factor=2, dtype=jnp.bfloat16)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-3)
    step = jax.jit(make_train_step(model, mse_loss, 2, "conv1", "conv3"))
    hr = _batch(n=8, size=32)
    losses = []
    for _ in range(6):
        state, m = step(state, hr)
        losses.append(float(m["train_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # params stay fp32 master copies
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_gan_d_loss_formula_matches_torch():
    """Relativistic-average D loss with label smoothing: our optax formula
    vs torch BCEWithLogitsLoss on the same logits (reference train.py:97-99)."""
    import optax
    import torch

    rng = np.random.default_rng(0)
    real = rng.normal(0, 2, (6, 1)).astype(np.float32)
    fake = rng.normal(0, 2, (6, 1)).astype(np.float32)

    rl, fl = jnp.asarray(real), jnp.asarray(fake)
    d_real = jnp.mean(optax.sigmoid_binary_cross_entropy(
        rl - jnp.mean(fl), 0.9 * jnp.ones_like(rl)))
    d_fake = jnp.mean(optax.sigmoid_binary_cross_entropy(
        fl - jnp.mean(rl), 0.1 * jnp.ones_like(fl)))
    ours = float((d_real + d_fake) / 2.0)

    bce = torch.nn.BCEWithLogitsLoss()
    tr, tf = torch.from_numpy(real), torch.from_numpy(fake)
    t_real = bce(tr - tf.mean(), torch.full_like(tr, 0.9))
    t_fake = bce(tf - tr.mean(), torch.full_like(tf, 0.1))
    want = float((t_real + t_fake) / 2.0)
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_nonfinite_step_guard_keeps_state():
    """A batch producing non-finite loss/grads must leave the whole state
    (params, optimizer moments, step counter) untouched and flag it in the
    metrics, instead of poisoning Adam's moments (reference has no failure
    handling at all, SURVEY §5)."""
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-3)

    def exploding_loss(sr, hr):
        # finite for normal images, NaN when the batch is all-zero
        bad = jnp.all(hr == 0.0)
        return jnp.where(bad, jnp.nan, mse_loss(sr, hr))

    step = jax.jit(make_train_step(model, exploding_loss, 2, "conv1", "conv3"))
    good, bad = _batch(2, 32), jnp.zeros((2, 32, 32, 3), jnp.uint8)

    state, m = step(state, good)
    assert float(m["nonfinite_steps"]) == 0.0
    before = jax.tree_util.tree_map(np.asarray, (state.params, state.opt_state,
                                                 state.step))
    state2, m2 = step(state, bad)
    assert float(m2["nonfinite_steps"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, (state2.params, state2.opt_state,
                                                state2.step))
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)
    # training continues normally after the skipped step
    state3, m3 = step(state2, good)
    assert float(m3["nonfinite_steps"]) == 0.0
    assert int(state3.step) == int(state.step) + 1


def test_gan_steps_guard_nonfinite():
    """The GAN G/D steps carry the same guard flags (zero on healthy
    batches)."""
    g_model = SRCNN(scale_factor=2)
    d_model = Discriminator(nf=8)
    g_state = _make_state(g_model, (1, 8, 8, 3), lr=1e-4)
    rng = jax.random.PRNGKey(0)
    d_vars = d_model.init({"params": rng}, jnp.zeros((1, 16, 16, 3)),
                          train=False)
    d_state = SRTrainState.create(dict(d_vars), make_adam(1e-5))

    from food101_sr_tpu.training import make_gan_g_step

    def fake_percep(sr, hr):
        return mse_loss(sr, hr)

    d_step = jax.jit(make_gan_d_step(g_model, d_model, 2))
    g_step = jax.jit(make_gan_g_step(g_model, d_model, fake_percep, 2,
                                     "conv1", "conv3"))
    hr = _batch(2, 16)
    d_state, dm = d_step(g_state, d_state, hr, jax.random.PRNGKey(1))
    assert float(dm["nonfinite_steps_D"]) == 0.0
    g_state, d_state, gm = g_step(g_state, d_state, hr)
    assert float(gm["nonfinite_steps"]) == 0.0


def test_ema_update_closed_form():
    """state.apply_updates(ema_decay=d): ema_{k} = d*ema_{k-1} + (1-d)*p_k."""
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-2)
    state = state.replace(ema_params=jax.tree_util.tree_map(
        jnp.array, state.params))
    step = jax.jit(make_train_step(model, mse_loss, 2, "conv1", "conv3",
                                   ema_decay=0.9))
    hr = _batch(2, 32)
    expect = jax.tree_util.tree_map(np.asarray, state.ema_params)
    for _ in range(3):
        state, _ = step(state, hr)
        expect = jax.tree_util.tree_map(
            lambda e, p: 0.9 * e + 0.1 * np.asarray(p), expect, state.params)
    for e, g in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(g), e, rtol=2e-6, atol=1e-7)


def test_ema_training_end_to_end(tmp_path):
    """--ema trains, checkpoints EMA weights as best, and resumes."""
    from food101_sr_tpu.training import train

    cfg = dict(architecture="SRCNN", batch_size=8, lr=1e-3, epochs=2,
               loss_function="mse", dataset="synthetic", crop_size=32,
               scale_factor=4, subset=1.0, patience=10, ema=0.98,
               save_name="ema_t", weights_dir=str(tmp_path / "w"),
               run_name="ema_t", seed=0, synthetic_size=96)
    final = train(cfg)
    assert np.isfinite(final["psnr"])
    # the saved best checkpoint holds the EMA weights (not the raw params):
    # reloading it and comparing against a fresh run's raw params is
    # indirect; instead assert the rolling checkpoint carries ema_params
    from food101_sr_tpu.training import load_checkpoint

    tree = load_checkpoint(str(tmp_path / "w" / "ema_t_last"))
    assert "ema_params" in tree["g"]
    # resume continues without structure errors
    cfg2 = dict(cfg, epochs=3, resume=str(tmp_path / "w" / "ema_t_last"),
                run_name="ema_t2")
    final2 = train(cfg2)
    assert np.isfinite(final2["psnr"])


def test_nonfinite_counter_is_cumulative():
    model = SRCNN(scale_factor=2)
    state = _make_state(model, (1, 16, 16, 3), lr=1e-3)

    def loss(sr, hr):
        return jnp.where(jnp.all(hr == 0.0), jnp.nan, mse_loss(sr, hr))

    step = jax.jit(make_train_step(model, loss, 2, "conv1", "conv3"))
    good, bad = _batch(2, 32), jnp.zeros((2, 32, 32, 3), jnp.uint8)
    for b in (good, bad, bad, good, bad):
        state, m = step(state, b)
    assert int(m["nonfinite_total"]) == 3 == int(state.skipped)


def test_resume_tolerates_ema_toggle(tmp_path):
    """--resume works across an --ema toggle: missing EMA state is seeded
    from the checkpoint's params instead of dying on an orbax structure
    mismatch."""
    from food101_sr_tpu.training import train

    base = dict(architecture="SRCNN", batch_size=8, lr=1e-3, epochs=1,
                loss_function="mse", dataset="synthetic", crop_size=32,
                scale_factor=4, subset=1.0, patience=10,
                save_name="tog", weights_dir=str(tmp_path / "w"),
                run_name="tog", seed=0, synthetic_size=96)
    train(base)  # no ema
    cfg2 = dict(base, epochs=2, ema=0.99,
                resume=str(tmp_path / "w" / "tog_last"), run_name="tog2")
    final = train(cfg2)
    assert np.isfinite(final["psnr"])
    # and back: ema checkpoint resumed without --ema
    cfg3 = dict(base, epochs=3, resume=str(tmp_path / "w" / "tog_last"),
                run_name="tog3")
    assert np.isfinite(train(cfg3)["psnr"])


def test_zero_epochs_is_eval_only(tmp_path):
    """--epochs 0 with --pretrained_weights = evaluate a checkpoint on the
    test set without training (the reference has no eval-only mode; its
    final-eval block only runs after a full training loop)."""
    from food101_sr_tpu.training import train

    base = dict(architecture="SRCNN", batch_size=8, lr=1e-3, epochs=1,
                loss_function="mse", dataset="synthetic", crop_size=32,
                scale_factor=4, subset=1.0, patience=10,
                save_name="evo", weights_dir=str(tmp_path / "w"),
                run_name="evo", seed=0, synthetic_size=96)
    trained = train(base)
    ev = train(dict(base, epochs=0, run_name="evo_eval", save_name="evo_eval",
                    pretrained_weights=str(tmp_path / "w" / "evo_best")))
    # same weights, same test set -> same metrics
    assert abs(ev["psnr"] - trained["psnr"]) < 1e-4
