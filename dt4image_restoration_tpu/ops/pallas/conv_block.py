"""Pallas TPU kernel: whole ConvBlock (N x [3x3 SAME conv + bias +
LeakyReLU]) fused into ONE kernel in the space-to-depth cell domain.

The reference U-Net's high-resolution blocks (noise.py:88-98 — 3 chained
3x3/32-channel convs at 128^2) fill only 32 of the MXU's 128 output
lanes and round-trip every intermediate through HBM. This kernel:

  * runs in the s2d-dense cell domain (ops/image.py): 4x channel packing
    lifts the matmul N dim to 128 lanes (the same exact rewrite the
    shipped XLA `packed='dense'` path uses, so A/Bs are apples-to-apples);
  * expresses each packed SAME 3x3 cell conv as 9 tap matmuls
    (rows*cells, 4Cin) @ (4Cin, 4Cout) accumulated in f32 on the MXU,
    reading taps as shifted slices of VMEM-resident buffers;
  * keeps EVERY inter-layer intermediate in VMEM — the chained layers
    never touch HBM between convs (XLA materializes each conv result);
  * tiles over cell ROWS with layered halos so the per-tile working set
    fits VMEM at any channel width: a tile of TH output rows consumes
    TH + 2*num_layers input rows (each conv is VALID in the row
    direction against a zero-pre-padded input; intermediate rows that
    fall outside the image are masked to zero to preserve SAME-conv
    boundary semantics), and the input window is DMA'd from HBM.

Grid = (image, row-tile); the tile height auto-shrinks until the
working set fits the VMEM budget. Forward-only (the denoiser is a
frozen prior — reference noise.py:139-153 loads it eval-only; training
never differentiates through it).

Adoption is measured adopt-or-reject on the real TPU
(benchmarks/conv_probe.py, `increal_*`/`up4real_*` entries); correctness
is pinned cross-path in tests/test_pallas.py (interpret mode on CPU),
including across tile boundaries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dt4image_restoration_tpu.ops.image import (
    depth_to_space, pack_conv_bias, pack_conv_weights, space_to_depth)

# Per-tile VMEM working-set target. Conservative vs the ~16 MB/core
# budget: the pipelined out block and the f32 accumulator live on top.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _pick_tile(h2: int, w2p: int, k0: int, n: int, num_layers: int,
               itemsize: int) -> int:
    """Largest divisor of h2 whose tile working set fits the budget:
    input window + two ping-pong intermediates + packed weights + the
    f32 tap accumulator. ``w2p`` is the sublane-padded column extent."""
    w_bytes = 9 * (k0 * n + max(0, num_layers - 1) * n * n) * itemsize
    w2 = w2p - 2
    best = None
    for th in range(1, h2 + 1):
        if h2 % th:
            continue
        rows_in = th + 2 * num_layers
        est = (rows_in * w2p * k0 * itemsize
               + 2 * (rows_in - 2) * w2p * n * itemsize
               + (rows_in - 2) * w2 * n * 4   # f32 accumulator
               + 2 * th * w2 * n * itemsize   # pipelined out block
               + w_bytes)
        if est <= _VMEM_BUDGET_BYTES:
            best = th
    return best if best is not None else 1


def _make_kernel(num_layers: int, th: int, h2: int, w2: int, n: int,
                 negative_slope: float):
    def kernel(*refs):
        x_hbm = refs[0]
        w_refs = refs[1:1 + num_layers]
        b_refs = refs[1 + num_layers:1 + 2 * num_layers]
        o_ref = refs[1 + 2 * num_layers]
        scratch = refs[2 + 2 * num_layers:]
        s_in, inters, sem = scratch[0], scratch[1:-1], scratch[-1]

        b_i = pl.program_id(0)
        t_i = pl.program_id(1)
        rows_in = th + 2 * num_layers

        # Input window for this tile: rows [t_i*TH, t_i*TH + TH + 2L) of
        # the row/col zero-pre-padded packed input (always in bounds).
        cp = pltpu.make_async_copy(
            x_hbm.at[b_i, pl.ds(t_i * th, rows_in)], s_in, sem)
        cp.start()
        cp.wait()

        src = s_in
        for layer in range(num_layers):
            rows_out = rows_in - 2
            w_ref, b_ref = w_refs[layer], b_refs[layer]
            acc = jnp.zeros((rows_out * w2, n), jnp.float32)
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                v = src[dy:dy + rows_out, dx:dx + w2, :].reshape(
                    rows_out * w2, -1)
                acc += jnp.dot(v, w_ref[tap],
                               preferred_element_type=jnp.float32)
            y = acc + b_ref[:].astype(jnp.float32)
            y = jnp.where(y >= 0, y, negative_slope * y)
            y = y.astype(o_ref.dtype).reshape(rows_out, w2, n)
            if layer == num_layers - 1:
                o_ref[0] = y
            else:
                # Halo rows outside the image were computed from the
                # zero pre-padding, giving leaky(bias) != 0 — mask them
                # back to zero (SAME-conv boundary semantics for the
                # next layer).
                halo = num_layers - 1 - layer
                g = (t_i * th - halo + jax.lax.broadcasted_iota(
                    jnp.int32, (rows_out, 1, 1), 0))
                y = jnp.where((g >= 0) & (g < h2), y,
                              jnp.zeros_like(y))
                dst = inters[layer % 2]
                dst[0:rows_out, 1:w2 + 1, :] = y
                dst[0:rows_out, 0:1, :] = jnp.zeros(
                    (rows_out, 1, n), o_ref.dtype)
                dst[0:rows_out, w2 + 1:w2 + 2, :] = jnp.zeros(
                    (rows_out, 1, n), o_ref.dtype)
                src = dst
            rows_in = rows_out

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("negative_slope", "row_tile",
                                    "interpret"))
def fused_conv_block(x: jnp.ndarray, weights, biases,
                     negative_slope: float = 0.2,
                     row_tile: int | None = None,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Fused N-layer [3x3 SAME conv + bias + LeakyReLU] block.

    Args:
      x: (B, H, W, Cin) NHWC, H and W even.
      weights: sequence of (3, 3, Ci, F) HWIO kernels — the SAME parameter
        tree as the direct/XLA-packed paths (checkpoint-interchangeable);
        every layer must produce the same feature count F.
      biases: matching sequence of (F,) biases.
      negative_slope: LeakyReLU slope (reference noise.py:92 uses 0.2).
      row_tile: cell rows per tile (must divide H/2); default auto-sizes
        to the VMEM budget.
      interpret: interpreter mode; defaults to auto (True off-TPU).

    Returns:
      (B, H, W, F), same dtype as ``x`` (accumulation is f32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    weights, biases = list(weights), list(biases)
    num_layers = len(weights)
    b, h, w, cin = x.shape
    feats = weights[0].shape[-1]
    if h % 2 or w % 2:
        raise ValueError(f"even spatial dims required, got {h}x{w}")
    for i, wk in enumerate(weights):
        expect_cin = cin if i == 0 else feats
        if wk.shape != (3, 3, expect_cin, feats):
            raise ValueError(f"layer {i}: want (3,3,{expect_cin},{feats}) "
                             f"got {wk.shape}")

    h2, w2, n, k0 = h // 2, w // 2, 4 * feats, 4 * cin
    # Mosaic requires the minor (lane) dim of every VMEM buffer the tap
    # slices touch to be lane-aligned: a sub-128 trailing dim compiles to a
    # strided memref slice that dies with a Mosaic internal error on real
    # hardware (BENCH_r03: `memref<1x38x66x8xf32` for the increal block's
    # k0 = 8). Pad the packed channel dims up to multiples of 128 — free on
    # the MXU, which contracts K = 128 per pass regardless; the pad lanes
    # carry zeros end to end (zero weights/bias, LeakyReLU(0) = 0).
    np_ = -(-n // 128) * 128
    k0p = -(-k0 // 128) * 128
    dt = x.dtype
    itemsize = jnp.dtype(dt).itemsize
    # The manual HBM->VMEM window copy needs a sublane-aligned column
    # extent: a 66-col f32 DMA hangs the device (round-4 isolation probe;
    # aligned DMAs and offset VMEM reads are both fine). Round the padded
    # column extent up to the sublane tile (8 rows of 4 bytes).
    sub = max(1, 32 // itemsize)
    w2p = -(-(w2 + 2) // sub) * sub
    th = row_tile if row_tile else _pick_tile(
        h2, w2p, k0p, np_, num_layers, itemsize)
    if h2 % th:
        raise ValueError(f"row_tile {th} must divide H/2 = {h2}")
    rows_in = th + 2 * num_layers

    xp = space_to_depth(x)
    # Pre-pad: L zero cell-rows top/bottom (row-direction VALID halo
    # source), 1 zero cell-col left + (w2p - w2 - 1) right (column SAME
    # padding plus the sublane alignment; taps never read past col w2+2),
    # and the channel pad to the lane multiple.
    xp = jnp.pad(xp, ((0, 0), (num_layers, num_layers),
                      (1, w2p - w2 - 1), (0, k0p - k0)))

    def pad_w(wp, rows):
        return jnp.pad(wp, ((0, 0), (0, rows - wp.shape[1]),
                            (0, np_ - n)))

    wps = [pad_w(pack_conv_weights(jnp.asarray(wk, dt), "dense").reshape(
        9, -1, n), k0p if i == 0 else np_) for i, wk in enumerate(weights)]
    bps = [jnp.pad(pack_conv_bias(jnp.asarray(bk, dt)).reshape(1, n),
                   ((0, 0), (0, np_ - n))) for bk in biases]

    scratch = [pltpu.VMEM((rows_in, w2p, k0p), dt)]
    scratch += [pltpu.VMEM((rows_in - 2, w2p, np_), dt)] * (
        2 if num_layers > 1 else 0)
    scratch += [pltpu.SemaphoreType.DMA(())]

    out = pl.pallas_call(
        _make_kernel(num_layers, th, h2, w2, np_, negative_slope),
        grid=(b, h2 // th),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(wp.shape, lambda i, j: (0, 0, 0),
                            memory_space=pltpu.VMEM) for wp in wps]
            + [pl.BlockSpec((1, np_), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM) for _ in bps]),
        out_specs=pl.BlockSpec((1, th, w2, np_), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, np_), dt),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xp, *wps, *bps)
    return depth_to_space(out[..., :n])
