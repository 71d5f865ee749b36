"""Winograd F(2x2, 3x3) convolution as MXU batched GEMMs.

The ADMM knee is U-Net conv compute at the chip's measured matmul rate
(benchmarks/RESULTS.md round-4 attribution: 95.5% of the step, 66.5 TF/s
vs the 64 TF/s microbenchmark ceiling) — so the only remaining lever is
MATH: fewer multiplies for the same conv. Winograd F(2x2,3x3) computes
each 2x2 output tile with 16 multiplies instead of 36 (2.25x MAC
reduction): transform 4x4 input tiles and the 3x3 filters into 16
"positions", contract channels with 16 independent (rows, Cin)x(Cin,
Cout) GEMMs — which XLA maps straight onto the MXU — and inverse-
transform back to 2x2 outputs. The transforms are cheap adds/halves
(VPU); the channel contractions carry all the FLOPs.

Numerics: algebraically identical to direct convolution; floating-point
reassociation differs (the well-known Winograd tap regrouping), so
outputs match direct conv to ~1e-6 rel in f32 — inside the same
adopt-or-reject PSNR band bench.py applies to every execution variant.
bf16 inputs contract with f32 accumulation (preferred_element_type),
like the direct path's TPU convs.

Reference surface: the 3x3 ConvBlocks at
/root/reference/evaluation/noise.py:88-98 (the only conv shape in the
U-Net besides the 1x1 output head).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015).
_BT = np.array([[1., 0., -1., 0.],
                [0., 1., 1., 0.],
                [0., -1., 1., 0.],
                [0., 1., 0., -1.]], np.float32)
_G = np.array([[1., 0., 0.],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0., 0., 1.]], np.float32)
_AT = np.array([[1., 1., 1., 0.],
                [0., 1., -1., -1.]], np.float32)


def winograd_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3, 3, Cin, Cout) -> transformed (4, 4, Cin, Cout).

    U = G g G^T applied per (Cin, Cout) tap plane. Kept separate so
    callers running many convs with frozen weights (the PnP denoiser)
    could pre-transform once; under jit XLA constant-folds it anyway.
    """
    g = _G.astype(kernel.dtype)
    return jnp.einsum("ai,bj,ijco->abco", g, g, kernel)


def winograd_conv3x3_same(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 stride-1 SAME convolution of NHWC ``x`` with HWIO ``kernel``
    via Winograd F(2x2,3x3). Requires even H and W (callers fall back to
    direct conv otherwise — same guard as the packed execution modes).

    Output dtype follows ``x``; channel contractions accumulate in f32.
    """
    n, h, w, cin = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"winograd_conv3x3_same needs even H, W; got "
                         f"{(h, w)}")
    dt = x.dtype
    bt = jnp.asarray(_BT, dt)
    at = jnp.asarray(_AT, dt)
    u = winograd_weights(kernel.astype(dt))

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nh, nw = h // 2, w // 2
    # d[a, b][:, i, j] = xp[:, 2i+a, 2j+b] — the 16 strided views that
    # assemble every overlapping 4x4 tile without gathers.
    rows = [xp[:, a::2][:, :nh] for a in range(4)]
    d = jnp.stack([jnp.stack([r[:, :, b::2][:, :, :nw] for b in range(4)],
                             axis=0) for r in rows], axis=0)
    # V = B^T d B over the two tile dims: (4, 4, N, nh, nw, Cin).
    v = jnp.einsum("ad,be,denhwc->abnhwc", bt, bt, d)
    # 16 channel-contraction GEMMs — the MXU work (f32 accumulation).
    m = jnp.einsum("abnhwc,abco->abnhwo", v, u,
                   preferred_element_type=jnp.float32).astype(dt)
    # Y = A^T M A: (N, nh, nw, 2, 2, Cout) -> (N, H, W, Cout).
    y = jnp.einsum("pa,qb,abnhwo->nhpwqo", at, at, m)
    y = y.reshape(n, h, w, -1)
    if bias is not None:
        y = y + bias.astype(dt)
    return y
