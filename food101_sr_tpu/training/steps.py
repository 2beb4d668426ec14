"""Jitted train/eval step factories.

Each factory closes over static configuration (model, loss, scale) and
returns a function safe to ``jax.jit`` with donated state. The degradation
(uint8 HR -> (lr, hr) floats) happens *inside* the step so XLA fuses
normalize+resize with the first conv's input pipeline; only uint8 crops
cross the host/device boundary.

Mirrors the reference's step semantics (reference train.py:83-142 non-GAN,
train.py:86-114 GAN) including diagnostics keys, relativistic D loss with
label smoothing and instance noise, the composite G loss weights, and the
D-every-5-batches cadence (the cadence itself is host-side: the epoch loop
simply calls d_step on every 5th batch).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..data.pipeline import prepare_batch
from ..losses import mae_loss, tv_loss
from ..metrics.metrics import psnr
from .diagnostics import grad_norm, layer_grad_ratio, update_ratio
from .state import SRTrainState

MUTABLE = ["batch_stats", "spectral"]


def _apply_train(model, params, extra, x):
    out, updates = model.apply(
        {"params": params, **extra}, x, train=True, mutable=MUTABLE
    )
    new_extra = {**extra, **updates}
    return out, new_extra


def select_state(ok, new_state, old_state, count: bool = True):
    """In-graph failure guard: keep ``new_state`` only when ``ok``.

    The reference has no failure handling at all (SURVEY §5: no try/except
    around training); here one non-finite batch (inf loss from an fp
    overflow, NaN grads from a degenerate crop) would otherwise poison
    Adam's moments and every later step. An XLA select keeps the whole
    state — params, optimizer moments, extra collections, step counter —
    untouched for skipped steps, with no host sync in the hot loop. The
    state's cumulative ``skipped`` counter increments on every skip, so
    the true count is exact regardless of the host's logging cadence.
    """
    sel = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, old_state)
    if count and getattr(old_state, "skipped", None) is not None:
        sel = sel.replace(
            skipped=old_state.skipped + (1 - ok.astype(jnp.int32)))
    return sel


def _finite_guard(loss, gnorm):
    """ok when the loss and the global grad norm are finite (the norm is
    NaN/inf iff any grad leaf is, and overflows for absurdly large but
    technically finite grads — which deserve a skip too)."""
    return jnp.isfinite(loss) & jnp.isfinite(gnorm)


def _finalize_update(state: SRTrainState, grads, new_extra, loss,
                     first_path: str, last_path: str,
                     ema_decay: float | None):
    """Shared tail of every supervised update: dynamics diagnostics
    (reference src/utils.py:5-38 keys), non-finite guard, guarded Adam
    apply (+ optional params EMA)."""
    lr_val = state.learning_rate
    gnorm = grad_norm(grads)
    ok = _finite_guard(loss, gnorm)
    metrics = {
        "train_loss": loss,
        "dynamics/grad_norm": gnorm,
        "dynamics/layer_ratio": layer_grad_ratio(grads, first_path, last_path),
        "dynamics/update_ratio": update_ratio(state.params, grads, lr_val),
        "nonfinite_steps": 1.0 - ok.astype(jnp.float32),
    }
    new_state = select_state(
        ok, state.apply_updates(grads, new_extra, ema_decay=ema_decay),
        state)
    metrics["nonfinite_total"] = new_state.skipped
    return new_state, metrics


def make_train_step(model, loss_fn: Callable, scale: int,
                    first_path: str, last_path: str,
                    ema_decay: float | None = None):
    """Supervised (non-GAN) step: loss + grads + Adam update + in-graph
    dynamics diagnostics + non-finite step guard (+ optional params EMA)."""

    def train_step(state: SRTrainState, hr_u8: jnp.ndarray):
        lr_img, hr = prepare_batch(hr_u8, scale)

        def loss_of(params):
            sr, new_extra = _apply_train(model, params, state.extra, lr_img)
            return loss_fn(sr, hr), new_extra

        (loss, new_extra), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        return _finalize_update(state, grads, new_extra, loss,
                                first_path, last_path, ema_decay)

    return train_step


# ---------------------------------------------------------------------------
# Gradient accumulation (--grad_accum k): the logical batch stays
# cfg.batch_size, but each update is computed from k sequential microbatches
# of batch_size/k — an HBM knob, not a math change. The loader's sample
# order and augmentation RNG are keyed on GLOBAL epoch position
# (data/pipeline.py:229-233), so k microbatches see bit-identical samples
# to the unsplit batch, and all our losses are batch means, so the averaged
# microbatch gradients equal the big-batch gradient exactly (tested to
# float tolerance in tests/test_grad_accum.py). Mutable collections (BN
# stats, spectral u/v) thread sequentially through the group. The reference
# has no accumulation (plain backward/step, reference train.py:117-120);
# this exists so reference batch sizes still fit when crop sizes grow.
# ---------------------------------------------------------------------------

def make_grad_step(model, loss_fn: Callable, scale: int):
    """Gradient-only microbatch step: loss + grads at the CURRENT params,
    threading the mutable collections; no optimizer update (the accumulated
    group is applied once by ``make_accum_apply``)."""

    def grad_step(params, extra, hr_u8: jnp.ndarray):
        lr_img, hr = prepare_batch(hr_u8, scale)

        def loss_of(p):
            sr, new_extra = _apply_train(model, p, extra, lr_img)
            return loss_fn(sr, hr), new_extra

        (loss, new_extra), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params
        )
        return loss, grads, new_extra

    return grad_step


def make_accum_apply(accum: int, first_path: str, last_path: str,
                     ema_decay: float | None = None):
    """Apply one optimizer update from ``accum`` summed microbatch grads.

    Averaging happens here (sum/accum) so the accumulator stays a plain
    running sum. The non-finite guard sees the averaged grads: one NaN
    microbatch poisons the sum, so the whole logical step is skipped and
    the state (params, moments, extra, EMA) stays untouched — the same
    all-or-nothing semantics as the fused step."""
    inv = 1.0 / float(accum)

    def apply_step(state: SRTrainState, grads_sum, new_extra, loss_sum):
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads_sum)
        return _finalize_update(state, grads, new_extra, loss_sum * inv,
                                first_path, last_path, ema_decay)

    return apply_step


def make_eval_step(model, loss_fn: Callable, scale: int):
    """Validation step: batch PSNR (on clamped images, as the reference's
    MetricsCalculator does) + raw val loss (reference train.py:144-162)."""

    def eval_step(params, extra, hr_u8):
        lr_img, hr = prepare_batch(hr_u8, scale)
        sr = model.apply({"params": params, **extra}, lr_img, train=False)
        sr_c = jnp.clip(sr, 0.0, 1.0)
        return {
            "psnr": psnr(sr_c, jnp.clip(hr, 0.0, 1.0)),
            "val_loss": loss_fn(sr, hr),
        }

    return eval_step


def make_forward(model):
    def forward(params, extra, lr_img):
        return model.apply({"params": params, **extra}, lr_img, train=False)

    return forward


# ---------------------------------------------------------------------------
# GAN branch (reference train.py:86-114)
# ---------------------------------------------------------------------------

def add_noise(rng, img, sigma: float = 0.15):
    """Instance noise (reference add_noise, train.py:17-19)."""
    if sigma <= 0:
        return img
    return img + sigma * jax.random.normal(rng, img.shape, img.dtype)


def make_gan_d_step(g_model, d_model, scale: int, noise_sigma: float = 0.2):
    """Discriminator step: relativistic average BCE with label smoothing
    0.9/0.1 and instance noise on both inputs (reference train.py:87-101).

    Deliberate deviation: ``fake`` comes from an eval-mode G forward. The
    reference's train-mode ``model(lr_imgs).detach()`` also mutates G's BN
    running stats as a side effect of the D step; here the D step leaves G
    untouched (only the G step advances G state), which keeps the two
    steps independent and the BN update count equal to the G update count."""

    def d_step(g_state: SRTrainState, d_state: SRTrainState,
               hr_u8: jnp.ndarray, rng: jax.Array):
        lr_img, hr = prepare_batch(hr_u8, scale)
        rng_r, rng_f = jax.random.split(rng)
        fake = g_model.apply(g_state.variables(), lr_img, train=False)
        fake = jax.lax.stop_gradient(fake)
        noisy_real = add_noise(rng_r, hr, noise_sigma)
        noisy_fake = add_noise(rng_f, fake, noise_sigma)

        def loss_of(d_params):
            real_logits, ex1 = _apply_train(d_model, d_params, d_state.extra,
                                            noisy_real)
            fake_logits, ex2 = _apply_train(d_model, d_params, ex1, noisy_fake)
            d_loss_real = jnp.mean(optax.sigmoid_binary_cross_entropy(
                real_logits - jnp.mean(fake_logits), 0.9 * jnp.ones_like(real_logits)))
            d_loss_fake = jnp.mean(optax.sigmoid_binary_cross_entropy(
                fake_logits - jnp.mean(real_logits), 0.1 * jnp.ones_like(fake_logits)))
            loss = (d_loss_real + d_loss_fake) / 2.0
            aux = (ex2,
                   jnp.mean(jax.nn.sigmoid(real_logits)),
                   jnp.mean(jax.nn.sigmoid(fake_logits)))
            return loss, aux

        (loss, (new_extra, prob_real, prob_fake)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(d_state.params)
        ok = _finite_guard(loss, grad_norm(grads))
        new_d = select_state(ok, d_state.apply_updates(grads, new_extra),
                             d_state)
        metrics = {
            "train_loss_D": loss,
            "gan_dynamics/prob_real": prob_real,
            "gan_dynamics/prob_fake": prob_fake,
            "nonfinite_steps_D": 1.0 - ok.astype(jnp.float32),
            "nonfinite_total_D": new_d.skipped,
        }
        return new_d, metrics

    return d_step


def make_gan_g_step(g_model, d_model, perceptual_fn, scale: int,
                    first_path: str, last_path: str,
                    w_pixel: float = 1e-2, w_percep: float = 1.0,
                    w_adv: float = 1e-5, w_tv: float = 2e-5,
                    ema_decay: float | None = None):
    """Generator step: composite pixel+perceptual+adversarial+TV loss with
    the reference's exact weights (reference train.py:104-114). The
    discriminator's BN/spectral state is threaded through (torch mutates D
    running stats during the G forward passes too)."""

    def g_step(g_state: SRTrainState, d_state: SRTrainState, hr_u8: jnp.ndarray):
        lr_img, hr = prepare_batch(hr_u8, scale)

        def loss_of(g_params):
            sr, g_extra = _apply_train(g_model, g_params, g_state.extra, lr_img)
            fake_logits, d_ex1 = _apply_train(d_model, d_state.params,
                                              d_state.extra, sr)
            real_logits, d_ex2 = _apply_train(d_model, d_state.params, d_ex1, hr)
            real_logits = jax.lax.stop_gradient(real_logits)
            loss_adv = jnp.mean(optax.sigmoid_binary_cross_entropy(
                fake_logits - jnp.mean(real_logits),
                jnp.ones_like(fake_logits)))
            loss_pixel = mae_loss(sr, hr)
            loss = (w_pixel * loss_pixel + w_percep * perceptual_fn(sr, hr)
                    + w_adv * loss_adv + w_tv * tv_loss(sr))
            return loss, (g_extra, d_ex2)

        (loss, (g_extra, d_extra)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(g_state.params)
        lr_val = g_state.learning_rate
        gnorm = grad_norm(grads)
        ok = _finite_guard(loss, gnorm)
        metrics = {
            "train_loss": loss,
            "dynamics/grad_norm": gnorm,
            "dynamics/layer_ratio": layer_grad_ratio(grads, first_path, last_path),
            "dynamics/update_ratio": update_ratio(g_state.params, grads, lr_val),
            "nonfinite_steps": 1.0 - ok.astype(jnp.float32),
        }
        new_g = select_state(
            ok, g_state.apply_updates(grads, g_extra, ema_decay=ema_decay),
            g_state)
        metrics["nonfinite_total"] = new_g.skipped
        # D only threads its extra collections here; a G-side skip should
        # not tick D's own skip counter
        new_d = select_state(ok, d_state.replace(extra=d_extra), d_state,
                             count=False)
        return new_g, new_d, metrics

    return g_step
