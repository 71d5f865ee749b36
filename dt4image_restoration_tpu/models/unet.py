"""Residual U-Net plug-in denoiser (the PnP prior), in Flax/NHWC.

Behavioral parity with /root/reference/evaluation/noise.py:
  * encoder 32/64/128/256/512 via 2x2 max-pool (noise.py:19-29,104-108)
  * decoder via 2x bilinear upsample with align_corners=True, pad-to-match,
    skip concat ``[skip, upsampled]`` (noise.py:32-61,109-112)
  * 3-layer 3x3 conv blocks with LeakyReLU(0.2) (noise.py:88-98)
  * 1x1 output conv, residual add of the *image* channel (noise.py:130-133)
  * denoiser wrapper concatenates a constant sigma noise-map channel and
    clamps the output to [0,1] (noise.py:155-164)

TPU-first design choices: NHWC layout (XLA's preferred conv layout on TPU),
bilinear upsampling expressed as MXU matmuls (ops/image.py), f32 params with
optional bf16 compute.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import jax

from dt4image_restoration_tpu.ops.image import (
    bilinear_upsample_2x, depth_to_space, pack_conv_bias, pack_conv_weights,
    repad_cells, space_to_depth, space_to_depth_shifted)
from dt4image_restoration_tpu.ops.pallas import conv_block as pallas_conv
from dt4image_restoration_tpu.ops.winograd import winograd_conv3x3_same


class _ConvParams(nn.Module):
    """Parameter-layout twin of ``nn.Conv(features, (3, 3))``: declares the
    same HWIO kernel + bias (same names, shapes, initializers) but returns
    the raw weights so the packed paths can transform them. Checkpoints are
    interchangeable between packed and direct execution."""
    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class ConvBlock(nn.Module):
    """num_layer x [3x3 conv (pad 1) + LeakyReLU(0.2)].

    ``packed`` selects a space-to-depth channel-packed execution for the
    MXU-lane-starved high-resolution stages (ops/image.py; measured 2.2x
    on the 128^2 32-channel block): 'dense' = SAME 3x3 cell conv per
    layer, 'shift' = VALID 2x2 cell conv with in-domain repad between
    layers, 'pallas' = the whole block as ONE Pallas kernel in the dense
    cell domain with all inter-layer intermediates in VMEM, row-tiled to
    the VMEM budget (ops/pallas/conv_block.py), 'winograd' = each layer
    via F(2x2,3x3) MXU GEMMs — 2.25x fewer multiplies, the math lever at
    the compute-ceiling knee (ops/winograd.py). Mathematically exact up
    to float reassociation; falls back to direct when the spatial dims
    are odd (pad-to-match layouts)."""
    features: int
    num_layer: int = 3
    dtype: Any = jnp.float32
    packed: Any = None  # None | 'dense' | 'shift' | 'pallas' | 'winograd'

    @nn.compact
    def __call__(self, x):
        packed = self.packed
        if packed and (x.shape[-3] % 2 or x.shape[-2] % 2
                       or x.shape[-3] < 2 or x.shape[-2] < 2):
            # Odd spatial dims can't tile 2x2 cells; <2 covers the
            # degenerate 0-sized levels a deep pyramid on tiny inputs
            # produces (e.g. 10 -> 5 -> 2 -> 1 -> 0).
            packed = None
        if packed == "winograd":
            cin = x.shape[-1]
            y = jnp.asarray(x, self.dtype)
            for i in range(self.num_layer):
                k, b = _ConvParams(self.features, name=f"conv{i}")(cin)
                y = winograd_conv3x3_same(y, jnp.asarray(k, self.dtype),
                                          jnp.asarray(b, self.dtype))
                y = jax.nn.leaky_relu(y, negative_slope=0.2)
                cin = self.features
            return y
        if packed == "pallas":
            cin = x.shape[-1]
            ks, bs = [], []
            for i in range(self.num_layer):
                k, bias = _ConvParams(self.features, name=f"conv{i}")(cin)
                ks.append(k)
                bs.append(bias)
                cin = self.features
            return pallas_conv.fused_conv_block(
                jnp.asarray(x, self.dtype),
                [jnp.asarray(k, self.dtype) for k in ks],
                [jnp.asarray(bias, self.dtype) for bias in bs])
        if not packed:
            for i in range(self.num_layer):
                x = nn.Conv(self.features, (3, 3), padding=1,
                            dtype=self.dtype, name=f"conv{i}")(x)
                x = jax.nn.leaky_relu(x, negative_slope=0.2)
            return x

        weights = []
        cin = x.shape[-1]
        for i in range(self.num_layer):
            k, b = _ConvParams(self.features, name=f"conv{i}")(cin)
            weights.append((jnp.asarray(k, self.dtype),
                            jnp.asarray(b, self.dtype)))
            cin = self.features

        x = jnp.asarray(x, self.dtype)
        y = (space_to_depth(x) if packed == "dense"
             else space_to_depth_shifted(x))
        pad = "SAME" if packed == "dense" else "VALID"
        for i, (k, b) in enumerate(weights):
            if packed == "shift" and i > 0:
                y = repad_cells(y)
            y = jax.lax.conv_general_dilated(
                y, pack_conv_weights(k, packed), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.nn.leaky_relu(y + pack_conv_bias(b),
                                  negative_slope=0.2)
        return depth_to_space(y)


def _pad_to_match(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pad x1 spatially so it matches x2, splitting the difference left/right
    like the reference decoder (noise.py:49-53). No-op for power-of-two
    inputs such as the 128x128 CSMRI slices."""
    dy = x2.shape[-3] - x1.shape[-3]
    dx = x2.shape[-2] - x1.shape[-2]
    if dy == 0 and dx == 0:
        return x1
    return jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                        (dx // 2, dx - dx // 2), (0, 0)))


class UNet(nn.Module):
    """2-in (image + noise map) / 1-out residual U-Net on NHWC tensors.

    ``packed=True`` runs the two 128^2 stages (inc, up4) with space-to-
    depth channel packing — the measured winners from
    benchmarks/conv_probe.py: 'dense' on inc (2.22x f32 / 1.22x bf16),
    'shift' on up4 (1.22x, f32 only — bf16 loses there so up4 stays
    direct under bf16). The 64^2+ stages already run at 60-70 TF/s and
    are left direct. ``packed="pallas"`` runs BOTH 128^2 stages (inc,
    up4) as fused single-kernel Pallas blocks (ops/pallas/conv_block.py,
    row-tiled to the VMEM budget). Same parameter tree in every mode.
    """
    out_channels: int = 1
    base_channels: int = 32
    dtype: Any = jnp.float32
    # False | True | 'pallas' | 'winograd' | 'winograd_deep'
    packed: Any = False

    # The >=4*base_channels blocks: contraction (Cin) and output lanes
    # (Cout) both >=128, so their Winograd channel GEMMs fill the MXU and
    # the 2.25x MAC cut applies at the device's true matmul rate; the
    # shallow blocks' K<128 GEMMs are lane-starved and stay direct under
    # 'winograd_deep'.
    _DEEP_WINO_BLOCKS = ("down2", "down3", "down4", "up1", "up2")

    def _block_packed(self, name):
        p = self.packed
        if p == "winograd":
            # Every 3x3 block: the conv FLOPs are spread nearly evenly
            # across the 9 stages (H^2*C^2 is level-invariant down the U),
            # so the whole-net MAC-reduction lever hits all of them.
            return "winograd"
        if p == "winograd_deep":
            return "winograd" if name in self._DEEP_WINO_BLOCKS else None
        if name == "inc":
            return "pallas" if p == "pallas" else "dense" if p else None
        if name == "up4":
            if p == "pallas":
                return "pallas"
            return "shift" if (p and self.dtype == jnp.float32) else None
        return None

    @nn.compact
    def __call__(self, x):
        noisy = x
        c = self.base_channels
        bp = self._block_packed
        x1 = ConvBlock(c, dtype=self.dtype, packed=bp("inc"),
                       name="inc")(x)
        x2 = ConvBlock(2 * c, dtype=self.dtype, packed=bp("down1"),
                       name="down1")(
            nn.max_pool(x1, (2, 2), strides=(2, 2)))
        x3 = ConvBlock(4 * c, dtype=self.dtype, packed=bp("down2"),
                       name="down2")(
            nn.max_pool(x2, (2, 2), strides=(2, 2)))
        x4 = ConvBlock(8 * c, dtype=self.dtype, packed=bp("down3"),
                       name="down3")(
            nn.max_pool(x3, (2, 2), strides=(2, 2)))
        x5 = ConvBlock(16 * c, dtype=self.dtype, packed=bp("down4"),
                       name="down4")(
            nn.max_pool(x4, (2, 2), strides=(2, 2)))

        def up(a, skip, feats, name, packed=None):
            a = bilinear_upsample_2x(a)
            a = _pad_to_match(a, skip)
            a = jnp.concatenate([skip, a], axis=-1)
            return ConvBlock(feats, dtype=self.dtype, packed=packed,
                             name=name)(a)

        y = up(x5, x4, 8 * c, "up1", packed=bp("up1"))
        y = up(y, x3, 4 * c, "up2", packed=bp("up2"))
        y = up(y, x2, 2 * c, "up3", packed=bp("up3"))
        y = up(y, x1, c, "up4", packed=bp("up4"))
        residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="outc")(y)
        return noisy[..., :self.out_channels] + residual


class UNetDenoiser(nn.Module):
    """Frozen plug-in prior: adds the sigma noise-map channel and clamps.

    Input ``x`` is NHWC (B, H, W, 1); ``sigma`` is scalar or (B,).
    ``packed`` enables the space-to-depth shallow-stage execution (see
    :class:`UNet`); ``packed="pallas"`` uses the fused single-kernel
    Pallas block on inc.
    """
    dtype: Any = jnp.float32
    packed: Any = False

    @nn.compact
    def __call__(self, x, sigma):
        sigma = jnp.broadcast_to(
            jnp.asarray(sigma, x.dtype).reshape(-1, 1, 1, 1),
            x.shape[:-1] + (1,))
        out = UNet(dtype=self.dtype, packed=self.packed, name="net")(
            jnp.concatenate([x, sigma], axis=-1))
        return jnp.clip(out, 0.0, 1.0)
