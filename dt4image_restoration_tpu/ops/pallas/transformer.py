"""Pallas TPU kernel: the Decision Transformer's full decode stack —
all n_blocks pre-LN blocks plus the final LayerNorm — in ONE kernel.

At 18-token sequences the XLA path launches ~60 small ops per forward; here
the whole stack runs out of VMEM: every weight (~1M params, ~4 MB f32) and
every intermediate lives on-chip, one kernel launch per forward. Replicates
the reference block semantics exactly (no residual around the MLP,
decision_transformer.py:99-102; LayerNorm eps 1e-5; exact-erf GELU).

Weights are packed once per parameter tree with :func:`pack_dt_weights`
(stacked along a leading block axis) so the kernel takes 14 refs instead of
~60.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LN_EPS = 1e-5


def pack_dt_weights(params: Dict, n_blocks: int) -> Dict[str, jnp.ndarray]:
    """Stack per-block DT weights along a leading block axis."""
    def stack(fn):
        return jnp.stack([fn(params[f"block{i}"]) for i in range(n_blocks)])

    return {
        "ln1_s": stack(lambda b: b["ln1"]["scale"]),
        "ln1_b": stack(lambda b: b["ln1"]["bias"]),
        "qkv_w": stack(lambda b: b["attn"]["qkv_proj"]["kernel"]),
        "qkv_b": stack(lambda b: b["attn"]["qkv_proj"]["bias"]),
        "o_w": stack(lambda b: b["attn"]["o_proj"]["kernel"]),
        "o_b": stack(lambda b: b["attn"]["o_proj"]["bias"]),
        "ln2_s": stack(lambda b: b["ln2"]["scale"]),
        "ln2_b": stack(lambda b: b["ln2"]["bias"]),
        "fc_w": stack(lambda b: b["fc"]["kernel"]),
        "fc_b": stack(lambda b: b["fc"]["bias"]),
        "proj_w": stack(lambda b: b["fc_proj"]["kernel"]),
        "proj_b": stack(lambda b: b["fc_proj"]["bias"]),
        "lnf_s": params["layer_n"]["scale"],
        "lnf_b": params["layer_n"]["bias"],
    }


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs error
    1.5e-7 — below f32 GELU noise). Mosaic has no erf lowering."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _kernel(x_ref, ln1_s, ln1_b, qkv_w, qkv_b, o_w, o_b, ln2_s, ln2_b,
            fc_w, fc_b, proj_w, proj_b, lnf_s, lnf_b, o_ref, *,
            n_blocks: int, n_heads: int, t: int):
    """Whole-batch decode in one program: the projections run as single
    (B*T, .) MXU matmuls; attention loops over the (batch, head) pairs with
    everything resident in VMEM."""
    x = x_ref[:].astype(jnp.float32)  # (B*T, E)
    bt, e = x.shape
    d = e // n_heads
    scale = 1.0 / (d ** 0.5)
    # Block-diagonal causal mask over the flattened batch: attention stays
    # within a sequence AND causal inside it. One (B*T, B*T) MXU matmul per
    # head beats B*H tiny (T, T) dots at these sizes.
    row = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 1)
    mask = (row // t == col // t) & (col % t <= row % t)

    for i in range(n_blocks):
        h = _layernorm(x, ln1_s[i], ln1_b[i])
        qkv = jnp.dot(h, qkv_w[i], preferred_element_type=jnp.float32) \
            + qkv_b[i]
        heads_out = []
        for hd in range(n_heads):
            q = qkv[:, hd * d:(hd + 1) * d]
            k = qkv[:, e + hd * d:e + (hd + 1) * d]
            v = qkv[:, 2 * e + hd * d:2 * e + (hd + 1) * d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, NEG_INF)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            heads_out.append(
                jnp.dot(p, v, preferred_element_type=jnp.float32))
        att = jnp.concatenate(heads_out, axis=-1)
        x = x + jnp.dot(att, o_w[i],
                        preferred_element_type=jnp.float32) + o_b[i]
        # NOTE: the MLP output REPLACES the stream (reference quirk,
        # decision_transformer.py:99-102).
        h = _layernorm(x, ln2_s[i], ln2_b[i])
        h = jnp.dot(h, fc_w[i], preferred_element_type=jnp.float32) \
            + fc_b[i]
        h = 0.5 * h * (1.0 + _erf(h / np.sqrt(2.0)))  # exact-erf GELU
        x = jnp.dot(h, proj_w[i], preferred_element_type=jnp.float32) \
            + proj_b[i]

    o_ref[:] = _layernorm(x, lnf_s[:], lnf_b[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_blocks", "n_heads", "interpret"))
def fused_dt_decode(tokens: jnp.ndarray, packed: Dict[str, jnp.ndarray],
                    n_blocks: int = 5, n_heads: int = 4,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Run the full block stack + final LN on (B, T, E) token embeddings."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, e = tokens.shape

    full = lambda shape: pl.BlockSpec(
        shape, lambda: (0,) * len(shape), memory_space=pltpu.VMEM)
    w = packed
    in_specs = [full((b * t, e))] + [full(w[k].shape) for k in (
        "ln1_s", "ln1_b", "qkv_w", "qkv_b", "o_w", "o_b", "ln2_s",
        "ln2_b", "fc_w", "fc_b", "proj_w", "proj_b", "lnf_s", "lnf_b")]

    out = pl.pallas_call(
        functools.partial(_kernel, n_blocks=n_blocks, n_heads=n_heads, t=t),
        in_specs=in_specs,
        out_specs=full((b * t, e)),
        out_shape=jax.ShapeDtypeStruct((b * t, e), tokens.dtype),
        interpret=interpret,
    )(tokens.reshape(b * t, e), *(w[k] for k in (
        "ln1_s", "ln1_b", "qkv_w", "qkv_b", "o_w", "o_b", "ln2_s",
        "ln2_b", "fc_w", "fc_b", "proj_w", "proj_b", "lnf_s", "lnf_b")))
    return out.reshape(b, t, e)
