"""Model registry — name -> Flax module with per-arch hyperparams baked in,
mirroring the reference's ``get_model`` names and sizes exactly
(reference src/models.py:219-227): SRCNN hidden 64; RESNET 16 blocks/64 ch;
AttentionSR 32 blocks/96 ch.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from .attention_sr import AttentionSR
from .discriminator import Discriminator
from .rrdb import RRDBNet
from .srcnn import SRCNN
from .resnet_sr import ResNetSR

_REGISTRY = {
    "SRCNN": lambda scale, dtype, remat, quantize, phase_tail: SRCNN(
        scale_factor=scale, hidden_dim=64, dtype=dtype
    ),
    "RESNET": lambda scale, dtype, remat, quantize, phase_tail: ResNetSR(
        scale_factor=scale, num_residuals=16, num_channels=64, dtype=dtype,
        remat=remat, quantize=quantize, phase_tail=phase_tail,
    ),
    "AttentionSR": lambda scale, dtype, remat, quantize, phase_tail:
    AttentionSR(
        scale_factor=scale, num_residuals=32, num_channels=96, dtype=dtype,
        remat=remat, quantize=quantize, phase_tail=phase_tail,
    ),
    # Beyond-parity family (no reference counterpart): the ESRGAN generator
    # at its published scale — 64 ch, growth 32, 23 RRDBs (models/rrdb.py).
    "RRDB": lambda scale, dtype, remat, quantize, phase_tail: RRDBNet(
        scale_factor=scale, num_channels=64, growth=32, num_blocks=23,
        dtype=dtype, remat=remat, quantize=quantize, phase_tail=phase_tail,
    ),
}


def get_model(name: str, scale_factor: int = 4, dtype: Any = None,
              remat: bool = False, quantize: str = "",
              phase_tail: bool = False) -> nn.Module:
    """``remat=True`` rematerializes residual blocks in the backward pass
    (jax.checkpoint), trading ~20% step time (measured on v5e at batch
    128-512, crop 200) for O(depth) less activation HBM. At the reference
    training geometry activations already fit, so the default is off; use
    it for larger crops/channel counts. Gradients are bit-equivalent
    (tested). SRCNN has no block stack; the flag is a no-op there.

    ``quantize="int8"`` (or ``"int8_dot"`` for the im2col lowering) runs
    the ResNetSR/AttentionSR BODY convs in dynamic int8 for inference
    (ops/quantize.py); same float params. ``quantize="qat"`` is the
    trainable twin: the body convs run in float on fake-quantized weights
    and activations (straight-through estimator), so fine-tuning with it
    pulls the float checkpoint onto the int8 grid that the ``int8``
    serving path uses. SRCNN has no body stack (3 convs at HR resolution,
    all quality-critical), so the flag is rejected there rather than
    silently ignored.

    ``phase_tail=True`` runs the ResNetSR/AttentionSR upsample tail fused
    in pixel-shuffle phase space at LR resolution (exact math, same params
    and checkpoints — measured +21% AttentionSR x4 inference on v5e;
    ops/subpixel_conv.phase_conv2d). SRCNN pre-upsamples (no tail), so the
    flag is a no-op there."""
    if name not in _REGISTRY:
        raise ValueError(f"Unknown architecture: {name}")
    if quantize and name == "SRCNN":
        raise ValueError("quantize: SRCNN has no quantizable body stack")
    if quantize not in ("", "int8", "int8_dot", "qat"):
        raise ValueError(f"Unknown quantize mode: {quantize!r}")
    return _REGISTRY[name](scale_factor, dtype, remat, quantize, phase_tail)


def model_names():
    return list(_REGISTRY)


def detect_architecture(params) -> str:
    """Architecture name from a params pytree's structure (checkpoints
    store no metadata — like the reference's bare ``state_dict`` files,
    reference src/utils.py:40-46, the tensors themselves are the schema)."""
    if "block_0" in params:
        return "Discriminator"
    if "conv1" in params and "input_conv" not in params:
        return "SRCNN"
    if "rrdb_0" in params:
        return "RRDB"
    if "se" in params.get("res_0", {}):
        return "AttentionSR"
    if "bn1" in params.get("res_0", {}):
        return "RESNET"
    raise ValueError("unrecognized checkpoint: params do not match any "
                     "known architecture")


def model_for_params(params, scale_factor: int = 4, dtype: Any = None,
                     remat: bool = False, quantize: str = "",
                     phase_tail: bool = False) -> nn.Module:
    """Construct the module matching a loaded checkpoint, inferring
    width/depth from tensor shapes — so non-registry variants (e.g. the
    reference analysis tools' 64-channel AttentionSR,
    reference src/analyze_models.py:20) load without flags.

    For the post-upsampling nets (ResNetSR/AttentionSR/RRDBNet) the
    checkpoint's up_* stages determine the scale and OVERRIDE
    ``scale_factor`` — a mismatch would otherwise silently serve the wrong
    scale (flax ignores unused params) or crash on a missing stage. Each
    stage's factor comes from its conv kernel shape (cout = 64·s², the
    UpsampleBlock invariant), so non-power-of-two checkpoints (x3, x6, ...)
    resolve correctly too. SRCNN's params are scale-independent (bicubic
    pre-upsample), so ``scale_factor`` is taken as given there.
    """
    arch = detect_architecture(params)
    if quantize and arch not in ("RESNET", "AttentionSR", "RRDB"):
        raise ValueError(f"quantize: {arch} has no quantizable body stack")
    if quantize not in ("", "int8", "int8_dot", "qat"):
        raise ValueError(f"Unknown quantize mode: {quantize!r}")
    if arch == "SRCNN":
        return SRCNN(scale_factor=scale_factor,
                     hidden_dim=params["conv2"]["conv"]["kernel"].shape[-1],
                     dtype=dtype)
    if arch == "Discriminator":
        return Discriminator(nf=params["block_0"]["sn"]["kernel"].shape[-1],
                             dtype=dtype)
    n_up = sum(1 for k in params if k.startswith("up_"))
    scale = 1
    for i in range(n_up):
        cout = params[f"up_{i}"]["conv"]["conv"]["kernel"].shape[-1]
        s = round((cout / 64) ** 0.5)
        if cout != 64 * s * s:
            # not an assert: under ``python -O`` an assert would vanish and a
            # malformed checkpoint would silently yield the wrong scale
            raise ValueError(
                f"up_{i}: kernel cout {cout} is not 64*s^2 for any integer "
                f"s — malformed or unsupported upsample-stage checkpoint")
        scale *= s
    nf = params["input_conv"]["conv"]["kernel"].shape[-1]
    if arch == "RRDB":
        return RRDBNet(
            scale_factor=scale, num_channels=nf,
            growth=params["rrdb_0"]["dense1"]["conv1"]["conv"]["kernel"]
            .shape[-1],
            num_blocks=1 + max(int(k.split("_")[1]) for k in params
                               if k.startswith("rrdb_")),
            dtype=dtype, remat=remat, quantize=quantize,
            phase_tail=phase_tail,
        )
    cls = AttentionSR if arch == "AttentionSR" else ResNetSR
    return cls(
        scale_factor=scale,
        num_channels=nf,
        num_residuals=1 + max(int(k.split("_")[1]) for k in params
                              if k.startswith("res_")),
        dtype=dtype, remat=remat, quantize=quantize, phase_tail=phase_tail,
    )


def param_count(params) -> int:
    """Total trainable parameter count of a params pytree (the TPU-side
    replacement for the reference's torchinfo tables,
    src/analyze_models.py:6-39)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
