"""Image resampling and layout utilities.

``bilinear_upsample_2x`` reproduces ``torch.nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (the U-Net decoder path,
/root/reference/evaluation/noise.py:39) but is expressed as two small dense
matmuls so the interpolation runs on the TPU MXU instead of a gather:
``y = A_h @ x @ A_w^T`` with static per-size interpolation matrices.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix (float32).

    align_corners=True:  src = i * (in-1)/(out-1)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to >= 0
    (PyTorch ``F.interpolate`` semantics.)
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1)
        else:
            src = max((i + 0.5) * in_size / out_size - 0.5, 0.0)
        lo = min(int(np.floor(src)), in_size - 1)
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) NHWC images via two MXU matmuls."""
    h, w = img.shape[-3], img.shape[-2]
    a = jnp.asarray(_interp_matrix(h, out_h, align_corners))
    b = jnp.asarray(_interp_matrix(w, out_w, align_corners))
    out = jnp.einsum("ih,...hwc->...iwc", a, img,
                     preferred_element_type=img.dtype)
    out = jnp.einsum("jw,...iwc->...ijc", b, out,
                     preferred_element_type=img.dtype)
    return out


def bilinear_upsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True on NHWC images."""
    h, w = img.shape[-3], img.shape[-2]
    return resize_bilinear(img, 2 * h, 2 * w, align_corners=True)


def complex2channel(x: jnp.ndarray) -> jnp.ndarray:
    """(N, C, H, W, 2) real/imag pairs -> (N, 2C, H, W) channels
    (reference: env.py:14-19)."""
    n, c, h, w, _ = x.shape
    return jnp.transpose(x, (0, 1, 4, 2, 3)).reshape(n, 2 * c, h, w)


def greyscale_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """(1, H, W) greyscale -> (3, H, W) by padding two zero channels
    (reference: env.py:21-26 — note the reference pads zeros rather than
    repeating the channel, despite its comment)."""
    zeros = jnp.zeros((2,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([x, zeros], axis=0)


# --- space-to-depth channel packing for shallow convs ---------------------
#
# The U-Net's 128x128 stages run 32-channel 3x3 convs that occupy only 32
# of the MXU's 128 lanes (~12 TF/s measured vs 62-70 TF/s for the 64x64
# stages; benchmarks/conv_probe.py). Packing 2x2 pixel cells into channels
# (space-to-depth) quadruples lane occupancy at the cost of structurally-
# zero MACs. Two exact rewrites of a SAME 3x3 conv:
#
#   * dense:  plain s2d cells; conv becomes SAME 3x3 over cells with
#     (4Cin -> 4Cout) weights (25% dense -> 4x MACs). No repacking needed
#     between chained convs. Measured 2.22x on the inc block (f32).
#   * shift:  pad-shifted s2d cells; conv becomes VALID 2x2 with
#     (4Cin -> 4Cout) weights (56% dense -> 16/9 MACs). Chaining requires
#     an in-domain repad (channel shuffle of 4 shifted cell views).
#     Measured 1.22x on the up4 block (f32).
#
# Channel order within a cell is (sy, sx, c) major-to-minor everywhere.


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C) plain 2x2 cell packing."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def space_to_depth_shifted(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2+1, W/2+1, 4C): cells of the (1,1)-pad-
    shifted image, so a SAME 3x3 pixel conv becomes a VALID 2x2 cell
    conv."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = x.reshape(b, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (h + 2) // 2, (w + 2) // 2, 4 * c)


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    b, hc, wc, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, hc, wc, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hc * 2, wc * 2, c)


def repad_cells(y: jnp.ndarray) -> jnp.ndarray:
    """Plain cells -> pad-shifted cells without leaving the s2d domain:
    a channel shuffle of four shifted cell views (the chaining step
    between VALID 2x2 cell convs)."""
    c = y.shape[-1] // 4
    tl = jnp.pad(y[:, :, :, 3 * c:4 * c],          # A(i-1,j-1) sub (1,1)
                 ((0, 0), (1, 0), (1, 0), (0, 0)))
    tr = jnp.pad(y[:, :, :, 2 * c:3 * c],          # A(i-1,j)   sub (1,0)
                 ((0, 0), (1, 0), (0, 1), (0, 0)))
    bl = jnp.pad(y[:, :, :, 1 * c:2 * c],          # A(i,j-1)   sub (0,1)
                 ((0, 0), (0, 1), (1, 0), (0, 0)))
    br = jnp.pad(y[:, :, :, 0 * c:1 * c],          # A(i,j)     sub (0,0)
                 ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([tl, tr, bl, br], axis=-1)


def pack_conv_weights(w: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Transform (3, 3, Cin, Cout) SAME-conv weights into the cell-domain
    equivalent: ``mode='dense'`` -> (3, 3, 4Cin, 4Cout) SAME weights on
    plain cells; ``mode='shift'`` -> (2, 2, 4Cin, 4Cout) VALID weights on
    pad-shifted cells. Pure jnp (differentiable, jit-hoistable); packed
    output channel blocks are (oy, ox) major so depth_to_space unpacks
    them."""
    _, _, cin, cout = w.shape
    if mode == "dense":
        k, delta, base = 3, -1, 1   # pixel offset u = oy + ky - 1
    elif mode == "shift":
        k, delta, base = 2, 0, 0    # pad-shifted: u = oy + ky
    else:
        raise ValueError(f"unknown packing mode {mode!r}")
    w2 = jnp.zeros((k, k, 4 * cin, 4 * cout), w.dtype)
    for oy in range(2):
        for ox in range(2):
            for ky in range(3):
                for kx in range(3):
                    cy, sy = divmod(oy + ky + delta, 2)
                    cx, sx = divmod(ox + kx + delta, 2)
                    w2 = w2.at[cy + base, cx + base,
                               (sy * 2 + sx) * cin:
                               (sy * 2 + sx + 1) * cin,
                               (oy * 2 + ox) * cout:
                               (oy * 2 + ox + 1) * cout].set(w[ky, kx])
    return w2


def pack_conv_bias(b: jnp.ndarray) -> jnp.ndarray:
    """Bias for a packed conv: one copy per (oy, ox) output block."""
    return jnp.concatenate([b, b, b, b])
