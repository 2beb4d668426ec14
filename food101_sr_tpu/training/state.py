"""Train state pytrees and optimizer construction."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class SRTrainState(struct.PyTreeNode):
    """Generator (or discriminator) train state.

    ``extra`` holds non-param variable collections (batch_stats, spectral)
    so the same state type serves BN-free SRCNN/AttentionSR, BN-ful
    ResNetSR, and the spectral-norm discriminator.
    """

    step: jnp.ndarray
    params: Any
    extra: Any  # dict of extra variable collections
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Optional EMA of params (beyond-parity: evaluated/checkpointed instead
    # of the raw params when training runs with --ema). None = disabled.
    ema_params: Any = None
    # Cumulative count of updates skipped by the non-finite guard
    # (steps.select_state) — kept in-state so it's exact without any
    # per-step host sync; surfaced as the nonfinite_total metric.
    skipped: Any = None

    @property
    def learning_rate(self):
        return self.opt_state.hyperparams["learning_rate"]

    def variables(self):
        return {"params": self.params, **self.extra}

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation,
               ema: bool = False):
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            extra=extra,
            opt_state=tx.init(params),
            tx=tx,
            ema_params=jax.tree_util.tree_map(jnp.array, params) if ema
            else None,
            skipped=jnp.zeros((), jnp.int32),
        )

    def apply_updates(self, grads, new_extra=None, ema_decay=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None and ema_decay is not None:
            d = jnp.float32(ema_decay)
            ema = jax.tree_util.tree_map(
                lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype),
                ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            extra=self.extra if new_extra is None else new_extra,
            opt_state=new_opt,
            ema_params=ema,
        )

    def set_learning_rate(self, lr: float):
        """Plateau decay path: mutate the injected hyperparam (an optax state
        array) — no retrace of the jitted step."""
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32
        )
        return self


def make_adam(lr: float, clip_norm: float | None = None) -> optax.GradientTransformation:
    """Adam(betas=(0.5, 0.999)) as the reference configures it
    (reference train.py:55), with optional global-norm clipping (the GAN
    generator clips at 1.0, reference train.py:113). Wrapped in
    inject_hyperparams so ReduceLROnPlateau can decay lr in-place."""

    def factory(learning_rate):
        adam = optax.adam(learning_rate, b1=0.5, b2=0.999)
        if clip_norm is not None:
            return optax.chain(optax.clip_by_global_norm(clip_norm), adam)
        return adam

    return optax.inject_hyperparams(factory)(learning_rate=lr)
