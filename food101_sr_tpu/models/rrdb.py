"""RRDBNet — ESRGAN-style Residual-in-Residual Dense Block generator.

A beyond-parity model family (the reference, src/models.py, stops at the
SRResNet-style ResNetSR and the channel-attention AttentionSR): RRDB is the
canonical next step on the same axis — the ESRGAN generator (Wang et al.,
ECCV 2018 workshops) that replaced SRGAN's BN residual blocks with
BN-free residual-in-residual dense blocks. It slots into this framework's
GAN branch (relativistic discriminator, perceptual loss — the reference's
train.py:86-114 recipe is itself the SRGAN/ESRGAN training scheme).

TPU-native design choices, deliberately shared with ResNetSR/AttentionSR
instead of transliterating the original torch layout:

* NHWC convs on the MXU; the five dense convs of each block feed a single
  growing concat axis, which XLA fuses into the conv inputs (channel
  concat is free at the operand level — no materialized copies).
* The upsample tail is this framework's PixelShuffle tail (ICNR-initialized
  conv stages from ``scale_stages``, any integer scale >= 2) rather than
  ESRGAN's nearest-neighbor-upsample+conv: checkerboard-free at init,
  exactly phase-fusable (``phase_tail=True`` runs the whole tail at LR
  resolution in pixel-shuffle phase space — the measured +21% serving
  path of DESIGN.md §2 applies unchanged), and shares ``output_conv``
  naming so diagnostics/serving/auto-detection work without special cases.
* ``quantize``/``remat`` thread through the body exactly like the other
  post-upsampling nets: dynamic-int8 or QAT body convs, full-precision
  head/tail, per-block rematerialization.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv, UpsampleBlock, kaiming_normal, scale_stages


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def scaled_kaiming(scale: float = 0.1):
    """Kaiming-normal scaled by ``scale`` — ESRGAN's published init for the
    dense-block convs (MSRA x 0.1, Wang et al. §4: "smaller initialization
    ... residual architecture is easier to train when the initial parameter
    variance becomes smaller").

    Measured necessity, not lore: with plain kaiming the 23-block net's
    init-time output magnitude is ~90x the [0,1] input scale (the dense
    ladders multiply variance through 345 convs even with 0.2 residual
    scaling — chip measurement in runs/rrdb_erf.json), and a 40-epoch
    L1 run stalled at val MAE 1.2 / PSNR 6.5 after 3 epochs just crawling
    the output scale down. With the 0.1 scaling init-time outputs start
    near zero + global skip, like ResNetSR/AttentionSR."""
    base = kaiming_normal("fan_in")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class _ConvParams(nn.Module):
    """Owns ``kernel``/``bias`` under the same names ``nn.Conv``/``Conv``
    use, so the split dense layout below reads the EXACT param tree the
    concat layout's Conv modules create (``conv{k}/conv/{kernel,bias}``) —
    checkpoints, converters, and ``detect_architecture`` are layout-blind."""

    shape: tuple
    kernel_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return kernel, bias


class _ConvScope(nn.Module):
    """One extra module level (named ``conv``) to mirror Conv->_RawConv."""

    shape: tuple
    kernel_init: Any

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, self.kernel_init, name="conv")()


def _conv3(x, kernel, dtype):
    return jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResidualDenseBlock(nn.Module):
    """5-conv dense block: conv_k sees [x, c1..c_{k-1}] on the channel axis;
    convs 1-4 emit ``growth`` channels through LeakyReLU(0.2), conv5 projects
    back to ``channels``; residual scaled by ``res_scale`` (ESRGAN's 0.2).

    Two mathematically identical compute layouts (same params either way):

    * ``concat`` — the textbook form: each conv contracts over the growing
      ``[x, c1..c_{k-1}]`` concat. On TPU this starves the MXU's 128 output
      lanes (growth-32 GEMMs fill 32/128) and hands the backward one giant
      concatenate fusion that crashed the tunnel compiler at batch >= 64
      (round-4 VERDICT weak #1).
    * ``split`` — conv-over-concat rewritten per SOURCE by linearity:
      ``conv(cat(f_s), W) = sum_s conv(f_s, W[seg_s])``, with each source's
      per-destination kernel slices re-concatenated (a tiny weight-side
      gather) into ONE wide kernel ``K_s = cat_{d>=s} W_d[seg_s]``. Each
      GEMM then presents 192/160/128/96/64 output lanes instead of
      32/32/32/32/64, and NO activation concat exists in either pass.
      Kernel slicing/concat is ~1 MB per block per step — noise next to the
      conv FLOPs. Forward/gradient parity with ``concat`` is pinned by
      tests/test_models.py (same params, same math, re-associated sums).

    Quantized paths (int8/QAT) keep the concat layout: per-conv activation
    quantization scales are defined on the concatenated inputs, and the
    fine-tune batch sizes never hit the fusion/lane problems.
    """

    channels: int
    growth: int = 32
    res_scale: float = 0.2
    dtype: Any = None
    quantize: str = ""
    layout: str = "concat"

    @nn.compact
    def __call__(self, x):
        ki = scaled_kaiming(0.1)
        if self.layout == "split" and not self.quantize:
            return self._split(x, ki)
        feats = [x]
        for i in range(4):
            c = Conv(self.growth, 3, dtype=self.dtype, quantize=self.quantize,
                     kernel_init=ki,
                     name=f"conv{i + 1}")(jnp.concatenate(feats, axis=-1))
            feats.append(_lrelu(c))
        out = Conv(self.channels, 3, dtype=self.dtype, quantize=self.quantize,
                   kernel_init=ki,
                   name="conv5")(jnp.concatenate(feats, axis=-1))
        return x + out * jnp.asarray(self.res_scale, out.dtype)

    def _split(self, x, ki):
        C, G = self.channels, self.growth
        widths = [G, G, G, G, C]          # conv_{d+1} output width
        kernels, biases = [], []
        for d in range(5):
            k, b = _ConvScope((3, 3, C + G * d, widths[d]), ki,
                              name=f"conv{d + 1}")()
            kernels.append(k)
            biases.append(b)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)

        # source s occupies channels [off_s, off_s+len_s) of conv_d's input
        # concat for every d >= s; its wide kernel stacks those slices.
        seg_off = [0, C, C + G, C + 2 * G, C + 3 * G]
        seg_len = [C, G, G, G, G]

        def wide_kernel(s):
            return jnp.concatenate(
                [kernels[d][:, :, seg_off[s]:seg_off[s] + seg_len[s], :]
                 for d in range(s, 5)], axis=-1)

        def dest_slices(p, s):
            """Split source-s conv output into per-destination contributions
            (destinations s..4, widths widths[s:])."""
            outs, off = [], 0
            for d in range(s, 5):
                outs.append(p[..., off:off + widths[d]])
                off += widths[d]
            return outs

        p0 = _conv3(xc, wide_kernel(0), dtype)
        acc = dest_slices(p0, 0)          # acc[d] = running preact of conv_{d+1}
        for s in range(1, 5):
            c = _lrelu(acc[s - 1] + biases[s - 1].astype(dtype))
            ps = dest_slices(_conv3(c, wide_kernel(s), dtype), s)
            for j, d in enumerate(range(s, 5)):
                acc[d] = acc[d] + ps[j]
        out = acc[4] + biases[4].astype(dtype)
        return x + out * jnp.asarray(self.res_scale, out.dtype)


class RRDB(nn.Module):
    """Residual-in-residual: three dense blocks, outer residual scaled 0.2."""

    channels: int
    growth: int = 32
    res_scale: float = 0.2
    dtype: Any = None
    quantize: str = ""
    layout: str = "concat"

    @nn.compact
    def __call__(self, x):
        r = x
        for i in range(3):
            r = ResidualDenseBlock(
                self.channels, self.growth, self.res_scale,
                dtype=self.dtype, quantize=self.quantize,
                layout=self.layout, name=f"dense{i + 1}",
            )(r)
        return x + r * jnp.asarray(self.res_scale, r.dtype)


class RRDBNet(nn.Module):
    """conv3 head (no activation, ESRGAN-style) -> N RRDBs -> conv3 ->
    global skip -> PixelShuffle tail -> conv9 ``output_conv``.

    Canonical size (registry name ``RRDB``): 64 channels, growth 32,
    23 blocks — 16,896,453 params, the published ESRGAN generator scale
    (the small delta vs the original's 16.70M is the tail: this framework's
    ICNR PixelShuffle stages + k=9 ``output_conv`` instead of ESRGAN's
    nearest-upsample convs + k=3 HR convs).
    """

    scale_factor: int = 4
    num_channels: int = 64
    growth: int = 32
    num_blocks: int = 23
    dtype: Any = None
    remat: bool = False
    quantize: str = ""
    phase_tail: bool = False
    # "auto" | "concat" | "split" — dense-block compute layout (see
    # ResidualDenseBlock). "auto" resolves per pass from the v5e A/B
    # (runs/rrdb_mfu_ab.json, tools/rrdb_mfu_ab.py, round 5): SPLIT for
    # differentiated passes — 195 vs 178 img/s at train batch 32, and it
    # unblocks batch >= 64 entirely (the concat backward's giant
    # concatenate fusion crashed the tunnel compiler; split at batch 128
    # reaches 390 img/s / 56% MFU, 2.2x the round-4 record) — and CONCAT
    # for inference, where there is no backward and XLA's concat handling
    # wins (1169 vs 1039 img/s at batch 256). Quantized bodies always
    # take concat (per-conv activation scales are defined on the concat).
    dense_layout: str = "auto"

    def resolved_layout(self, train: bool = False) -> str:
        if self.quantize or self.dense_layout == "concat":
            return "concat"
        if self.dense_layout == "split":
            return "split"
        if self.dense_layout == "auto":
            return "split" if train else "concat"
        raise ValueError(f"Unknown dense_layout: {self.dense_layout!r}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        layout = self.resolved_layout(train)
        initial = Conv(self.num_channels, 3, dtype=self.dtype,
                       name="input_conv")(x)
        block_cls = nn.remat(RRDB) if self.remat else RRDB
        r = initial
        for i in range(self.num_blocks):
            r = block_cls(self.num_channels, self.growth, dtype=self.dtype,
                          quantize=self.quantize, layout=layout,
                          name=f"rrdb_{i}")(r)
        # Near-zero trunk projection at init. Even with the 0.1-scaled RDB
        # convs, the trunk grows structurally: RDB(y) ~= y at init, so each
        # RRDB outputs ~1.2x its input and the 23-block trunk is ~1.2^23 ~=
        # 66x `initial` (measured: std 0.97 -> 53.8 over the stack). The
        # published net absorbs that over ~1M iterations; this framework's
        # short convergence runs need the same start-near-identity property
        # ResNetSR/AttentionSR get from their global skip + ICNR tails — so
        # the trunk enters through a 0.01-scaled projection and the net
        # begins as `initial + tail` with O(1) outputs. Init-only: the
        # forward math and checkpoint layout are unchanged (torch-mirror
        # parity tests share weights), and Adam's per-leaf RMS
        # normalization keeps body learning at full rate from step 1.
        r = Conv(self.num_channels, 3, dtype=self.dtype,
                 quantize=self.quantize, kernel_init=scaled_kaiming(0.01),
                 name="mid_conv")(r)
        x = initial + r
        stages = scale_stages(self.scale_factor)
        if self.phase_tail:
            from ..ops.subpixel_conv import grouped_out_map

            r_acc, in_map = 1, None
            for i, s in enumerate(stages):
                x = UpsampleBlock(out_channels=64, scale=s, dtype=self.dtype,
                                  phase_in=r_acc, phase_in_map=in_map,
                                  name=f"up_{i}")(x)
                in_map = (grouped_out_map(64 * s * s, r_acc, s=s)
                          if r_acc > 1 else None)
                r_acc *= s
            return Conv(3, 9, dtype=self.dtype,
                        subpixel_r=self.scale_factor, phase_in=r_acc,
                        phase_in_map=in_map, name="output_conv")(x)
        for i, s in enumerate(stages):
            x = UpsampleBlock(out_channels=64, scale=s, dtype=self.dtype,
                              name=f"up_{i}")(x)
        return Conv(3, 9, dtype=self.dtype, subpixel_r=self.scale_factor,
                    name="output_conv")(x)
