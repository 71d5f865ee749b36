"""Pallas TPU kernel: fused causal attention for short decode sequences.

The Decision Transformer attends over <= 18 tokens with head_dim 32
(decision_transformer.py:55-70). One kernel instance computes a whole
(batch, head) slice — QK^T, causal mask, softmax, PV — entirely in VMEM, so
the (T, T) score matrix never touches HBM. A flash-style streaming kernel
would be pointless at this sequence length; the win is fusion.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (T, D)
    k = k_ref[0]
    v = v_ref[0]
    t = q.shape[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    s = jnp.where(col <= row, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Causal softmax attention.

    Args:
      q, k, v: (B, H, T, D) float32.
      interpret: interpreter mode; defaults to auto (True off-TPU).
    Returns:
      (B, H, T, D) attention output.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)

    spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)
