"""Gradient accumulation (--grad_accum): k microbatches must reproduce the
unsplit batch's update exactly.

The claim steps.py makes is mathematical, so the test pins it at the
gradient level (CLAUDE.md numerics rule: never compare post-Adam params —
first-step sign amplification turns reduction-order noise into O(lr)
diffs): averaged microbatch grads == big-batch grads leaf-by-leaf, for a
BN-free net (SRCNN) where the equality is exact math, and for a BN net
(ResNetSR) where only the running-stat threading differs by construction.
Loop-level coverage drives train() end-to-end with grad_accum=2 and checks
the error paths (GAN, indivisible batch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from food101_sr_tpu.losses import mae_loss
from food101_sr_tpu.models import get_model
from food101_sr_tpu.training import (
    SRTrainState,
    make_accum_apply,
    make_adam,
    make_grad_step,
    make_train_step,
    train,
)


def _hr_batch(n=8, size=32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, (n, size, size, 3),
                                             dtype=np.uint8))


def _state(model, crop, scale, lr=1e-2, seed=0):
    variables = model.init({"params": jax.random.PRNGKey(seed)},
                           jnp.zeros((1, crop // scale, crop // scale, 3),
                                     jnp.float32), train=False)
    return SRTrainState.create(dict(variables), make_adam(lr))


def _leaves(tree):
    return jax.tree_util.tree_leaves_with_path(tree)


@pytest.mark.parametrize("accum", [2, 4])
def test_accumulated_grads_equal_big_batch(accum):
    """mean-reduced loss => mean of k microbatch grads == big-batch grad."""
    model = get_model("SRCNN", scale_factor=4)  # BN-free: exact equality
    state = _state(model, 32, 4)
    hr = _hr_batch(8, 32)

    gs = jax.jit(make_grad_step(model, mae_loss, 4))
    loss_full, g_full, _ = gs(state.params, state.extra, hr)

    mb = 8 // accum
    extra = state.extra
    gsum = lsum = None
    for i in range(accum):
        li, gi, extra = gs(state.params, extra, hr[i * mb:(i + 1) * mb])
        gsum = gi if gsum is None else optax.tree_utils.tree_add(gsum, gi)
        lsum = li if lsum is None else lsum + li
    g_acc = jax.tree_util.tree_map(lambda g: g / accum, gsum)

    np.testing.assert_allclose(float(lsum) / accum, float(loss_full),
                               rtol=1e-5)  # f32 reduction-order noise
    for (path, a), (_, b) in zip(_leaves(g_acc), _leaves(g_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_accum_apply_matches_fused_step_update():
    """make_accum_apply(k) on k summed microbatch grads lands on the same
    post-update params as the fused train_step on the unsplit batch, to
    reduction-noise tolerance (SGD-free check is the gradient test above;
    here the SAME averaged grads go through the SAME Adam, so the only
    difference is float reduction order)."""
    model = get_model("SRCNN", scale_factor=4)
    hr = _hr_batch(8, 32)
    first, last = "conv1", "conv3"  # FIRST_LAST["SRCNN"]

    fused = jax.jit(make_train_step(model, mae_loss, 4, first, last))
    s_fused, m_fused = fused(_state(model, 32, 4), hr)

    gs = jax.jit(make_grad_step(model, mae_loss, 4))
    state = _state(model, 32, 4)
    extra, gsum, lsum = state.extra, None, None
    for i in range(2):
        li, gi, extra = gs(state.params, extra, hr[i * 4:(i + 1) * 4])
        gsum = gi if gsum is None else optax.tree_utils.tree_add(gsum, gi)
        lsum = li if lsum is None else lsum + li
    apply_fn = jax.jit(make_accum_apply(2, first, last))
    s_acc, m_acc = apply_fn(state, gsum, extra, lsum)

    assert int(s_acc.step) == int(s_fused.step) == 1
    np.testing.assert_allclose(float(m_acc["train_loss"]),
                               float(m_fused["train_loss"]), rtol=1e-5)
    for (path, a), (_, b) in zip(_leaves(s_acc.params),
                                 _leaves(s_fused.params)):
        # post-Adam params: sign(g)-scaled, so tolerance is in lr units
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=0,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_accum_threads_batch_stats():
    """BN nets: the mutable collections thread sequentially through the
    group, so after one group the running stats must have advanced (and
    the grad equality still holds — BN normalizes per-microbatch in train
    mode, which is the documented sequential-microbatch semantics)."""
    model = get_model("RESNET", scale_factor=4)
    state = _state(model, 32, 4)
    hr = _hr_batch(4, 32)
    gs = jax.jit(make_grad_step(model, mae_loss, 4))
    _, _, e1 = gs(state.params, state.extra, hr[:2])
    _, _, e2 = gs(state.params, e1, hr[2:])
    before = jax.tree_util.tree_leaves(state.extra["batch_stats"])
    after = jax.tree_util.tree_leaves(e2["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(before, after))


def test_nonfinite_microbatch_skips_whole_group():
    """One NaN microbatch must poison the summed grads and skip the whole
    logical update (all-or-nothing, same as the fused step's guard)."""
    model = get_model("SRCNN", scale_factor=4)
    state = _state(model, 32, 4)
    hr = _hr_batch(8, 32)
    gs = jax.jit(make_grad_step(model, mae_loss, 4))
    l1, g1, e1 = gs(state.params, state.extra, hr[:4])
    bad = jax.tree_util.tree_map(lambda g: g * jnp.nan, g1)
    gsum = optax.tree_utils.tree_add(g1, bad)
    apply_fn = jax.jit(make_accum_apply(2, "conv1", "conv3"))
    new_state, metrics = apply_fn(state, gsum, e1, l1 + l1)
    assert int(new_state.skipped) == 1
    assert float(metrics["nonfinite_steps"]) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# --- loop integration --------------------------------------------------------

def test_train_loop_grad_accum_end_to_end(tmp_path):
    final = train(config={
        "architecture": "SRCNN", "dataset": "synthetic",
        "synthetic_size": 96, "crop_size": 32, "batch_size": 16,
        "grad_accum": 2, "epochs": 2, "loss_function": "mse",
        "lr": 1e-3, "weights_dir": str(tmp_path), "use_wandb": False,
        "save_name": "accum_e2e", "log_every": 1,
    })
    assert np.isfinite(final["psnr"]) and final["psnr"] > 0
    assert np.isfinite(final["val_psnr"])


def test_train_loop_grad_accum_rejects_gan(tmp_path):
    with pytest.raises(ValueError, match="supervised"):
        train(config={
            "architecture": "SRCNN", "dataset": "synthetic",
            "synthetic_size": 96, "crop_size": 32, "batch_size": 16,
            "grad_accum": 2, "epochs": 1, "loss_function": "gan",
            "weights_dir": str(tmp_path), "use_wandb": False,
        })


def test_train_loop_grad_accum_rejects_zero_update_epochs(tmp_path):
    """An epoch with fewer microbatches than the accumulation factor would
    never fire an optimizer update (every batch hits the mid-group continue)
    yet still 'succeed' — the loop must refuse up front."""
    with pytest.raises(ValueError, match="no update"):
        train(config={
            "architecture": "SRCNN", "dataset": "synthetic",
            "synthetic_size": 96, "crop_size": 32, "batch_size": 128,
            "grad_accum": 16, "epochs": 1, "loss_function": "mse",
            "weights_dir": str(tmp_path), "use_wandb": False,
        })


def test_train_loop_grad_accum_rejects_indivisible_batch(tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        train(config={
            "architecture": "SRCNN", "dataset": "synthetic",
            "synthetic_size": 96, "crop_size": 32, "batch_size": 9,
            "grad_accum": 2, "epochs": 1, "loss_function": "mse",
            "weights_dir": str(tmp_path), "use_wandb": False,
        })
