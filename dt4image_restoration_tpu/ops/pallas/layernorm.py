"""Pallas TPU kernel: fused LayerNorm over the embedding axis.

One VMEM pass per row block: mean, variance, normalize, affine — matching
torch.nn.LayerNorm semantics (eps inside the sqrt, eps=1e-5 like the
reference transformer's norms).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    o_ref[:] = (centered * inv * scale_ref[:] + bias_ref[:]
                ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_rows", "interpret"))
def layernorm_pallas(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     eps: float = 1e-5, block_rows: int = 128,
                     interpret: bool | None = None) -> jnp.ndarray:
    """LayerNorm over the last axis.

    Args:
      x: (..., E) input; normalized over E.
      scale, bias: (E,) affine parameters.
      interpret: interpreter mode; defaults to auto (True off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    e = orig_shape[-1]
    n = x.size // e
    x2 = x.reshape(n, e)
    rows = min(block_rows, n)

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(pl.cdiv(n, rows),),
        in_specs=[
            pl.BlockSpec((rows, e), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((e,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, e), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, e), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(orig_shape)
