"""Training-dynamics diagnostics computed *inside* the jitted step.

Mirrors the reference's probes and W&B key names (reference
src/utils.py:5-38, logged at train.py:122-142) but as pytree reductions in
the graph — the reference's versions are per-parameter ``.item()`` loops
that force a device sync per tensor per log step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def grad_norm(grads) -> jnp.ndarray:
    """Global L2 grad norm (reference get_gradient_norm, src/utils.py:5-11)."""
    return _global_norm(grads)


def weight_norm(params) -> jnp.ndarray:
    """Global L2 weight norm (reference get_weight_norm, src/utils.py:13-19)."""
    return _global_norm(params)


def layer_grad_ratio(grads, first_path: str, last_path: str) -> jnp.ndarray:
    """Vanishing-gradient probe: first-layer / last-layer grad norm
    (reference get_layer_grad_ratio, src/utils.py:21-27). ``first_path`` /
    ``last_path`` name top-level modules of the grads tree (e.g.
    'input_conv' / 'output_conv')."""
    first = _global_norm(grads[first_path])
    last = _global_norm(grads[last_path])
    return first / (last + 1e-8)


def update_ratio(params, grads, lr) -> jnp.ndarray:
    """Relative update size ||lr*g|| / ||w||
    (reference get_update_ratio, src/utils.py:28-38)."""
    pn = _global_norm(params)
    un = _global_norm(grads) * lr
    return jnp.where(pn == 0, 0.0, un / pn)


# First/last top-level param-module names per architecture, mirroring
# the reference's "first parameter tensor / last parameter tensor" probe
# (torch parameters() registration order: input conv first, output conv last).
FIRST_LAST = {
    "SRCNN": ("conv1", "conv3"),
    "RESNET": ("input_conv", "output_conv"),
    "AttentionSR": ("input_conv", "output_conv"),
    "RRDB": ("input_conv", "output_conv"),
}
