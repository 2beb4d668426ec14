"""Frozen feature networks: VGG19 (perceptual loss) and AlexNet (LPIPS).

The reference uses torchvision's pretrained VGG19 ``features[:35]`` — i.e.
through conv5_4, *without* its ReLU — as the perceptual-loss embedding
(reference src/loss.py:19-29), and the ``lpips`` package's AlexNet variant as
a metric (reference src/metrics.py:11,22). Both are inference-only; here they
are plain Flax conv stacks (NHWC, MXU-friendly) whose ImageNet weights are
loaded from an ``.npz`` produced once by ``tools/convert_torch_weights.py``
in any environment that has torchvision/lpips installed.

If no weight file is available (e.g. a hermetic TPU pod with no artifact
store), the nets fall back to a *fixed-seed* He init with a loud warning:
random VGG features are still a usable (if weaker) perceptual embedding, and
determinism keeps results reproducible until real weights are provisioned.
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG19 config 'E' conv plan up to conv5_4 (torchvision Sequential indices
# 0..34). Tuples: (features, n_convs_in_block).
_VGG19_BLOCKS: Sequence[tuple[int, int]] = (
    (64, 2), (128, 2), (256, 4), (512, 4), (512, 4),
)

DEFAULT_WEIGHTS_DIR = os.environ.get("FOOD101_SR_WEIGHTS", "weights")


class VGG19Features(nn.Module):
    """VGG19 features through conv5_4 (no final ReLU), matching
    ``torchvision vgg19(weights='DEFAULT').features[:35]``.

    Expects NHWC float input; like the reference, no ImageNet mean/std
    normalization is applied to the [0,1] inputs (reference src/loss.py:28
    feeds raw SR/HR tensors).

    ``precision``: "highest" for metric-grade torch parity (LPIPS); None
    (TPU-default bf16 passes) when used as a training-loss embedding,
    where it is ~3x cheaper and gradient-equivalent in practice.
    """

    dtype: Any = None
    precision: Any = "highest"

    @nn.compact
    def __call__(self, x):
        conv_idx = 0
        n_blocks = len(_VGG19_BLOCKS)
        for bi, (feat, n_convs) in enumerate(_VGG19_BLOCKS):
            for ci in range(n_convs):
                x = nn.Conv(
                    feat, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=self.precision,
                    name=f"conv_{conv_idx}",
                )(x)
                conv_idx += 1
                is_last = bi == n_blocks - 1 and ci == n_convs - 1
                if not is_last:  # features[:35] stops before ReLU5_4
                    x = nn.relu(x)
            if bi < n_blocks - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


# AlexNet feature taps used by LPIPS: relu1..relu5.
class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk returning the five ReLU taps
    LPIPS uses."""

    dtype: Any = None
    precision: Any = "highest"

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, precision=self.precision, name="conv_0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype, precision=self.precision,
                    name="conv_1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=self.precision,
                    name="conv_2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=self.precision,
                    name="conv_3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, precision=self.precision,
                    name="conv_4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def _npz_to_params(npz) -> dict:
    """Rebuild a nested params dict from flat ``conv_0/kernel``-style keys."""
    params: dict = {}
    for key in npz.files:
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(npz[key])
    return params


def load_feature_params(
    module: nn.Module,
    npz_name: str,
    input_shape: tuple,
    weights_dir: str | None = None,
    seed: int = 1234,
):
    """Load converted pretrained params from ``{weights_dir}/{npz_name}`` or
    fall back to a deterministic He init (with a warning)."""
    weights_dir = weights_dir or DEFAULT_WEIGHTS_DIR
    path = os.path.join(weights_dir, npz_name)
    if os.path.exists(path):
        with np.load(path) as npz:
            params = _npz_to_params(npz)
        # Validate structure + shapes against the module BEFORE first use:
        # a truncated or mislabeled npz would otherwise surface as an opaque
        # conv-shape error deep inside apply (or worse, broadcast silently).
        # eval_shape traces init without computing, so this is ~free.
        expected = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0),
                                jnp.zeros(input_shape, jnp.float32))
        )["params"]
        exp_flat = {"/".join(str(k.key) for k in p): v.shape for p, v in
                    jax.tree_util.tree_flatten_with_path(expected)[0]}
        got_flat = {"/".join(str(k.key) for k in p): v.shape for p, v in
                    jax.tree_util.tree_flatten_with_path(params)[0]}
        if exp_flat != got_flat:
            missing = sorted(set(exp_flat) - set(got_flat))
            extra = sorted(set(got_flat) - set(exp_flat))
            bad = {k: (got_flat[k], exp_flat[k]) for k in exp_flat
                   if k in got_flat and got_flat[k] != exp_flat[k]}
            raise ValueError(
                f"{path} does not match {type(module).__name__}: "
                f"missing={missing} unexpected={extra} "
                f"shape mismatches (got, want)={bad}. Re-run "
                f"tools/convert_torch_weights.py to regenerate it.")
        return {"params": params}, True
    warnings.warn(
        f"Pretrained weights not found at {path}; falling back to a "
        f"fixed-seed random init. Run tools/convert_torch_weights.py in an "
        f"environment with torchvision/lpips to produce them.",
        stacklevel=2,
    )
    dummy = jnp.zeros(input_shape, jnp.float32)
    variables = module.init(jax.random.PRNGKey(seed), dummy)
    return variables, False


# LPIPS input normalization constants (from the lpips package's
# ScalingLayer; inputs are expected in [-1, 1]).
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# LPIPS linear-head channel widths per tap.
LPIPS_TAP_CHANNELS = (64, 192, 384, 256, 256)


def load_lpips_heads(weights_dir: str | None = None, seed: int = 4321):
    """Per-tap 1x1 non-negative linear head weights, shape ``[C_i]`` each.

    Falls back to uniform averaging (all-ones / C) when the converted
    ``lpips_alex_heads.npz`` is absent — degenerating to a 'cosine-distance
    LPIPS' that is still a valid perceptual metric.
    """
    weights_dir = weights_dir or DEFAULT_WEIGHTS_DIR
    path = os.path.join(weights_dir, "lpips_alex_heads.npz")
    if os.path.exists(path):
        with np.load(path) as npz:
            missing = [f"lin_{i}" for i in range(5) if f"lin_{i}" not in npz]
            if missing:
                raise ValueError(f"{path}: missing head arrays {missing}; "
                                 f"re-run tools/convert_torch_weights.py")
            heads = [jnp.asarray(npz[f"lin_{i}"]) for i in range(5)]
        shapes = tuple(h.shape for h in heads)
        want = tuple((c,) for c in LPIPS_TAP_CHANNELS)
        if shapes != want:
            raise ValueError(f"{path}: head shapes {shapes} != {want}; "
                             f"re-run tools/convert_torch_weights.py")
        return heads, True
    warnings.warn(
        f"LPIPS head weights not found at {path}; using uniform heads.",
        stacklevel=2,
    )
    return [jnp.ones((c,), jnp.float32) / c for c in LPIPS_TAP_CHANNELS], False
