"""Decision Transformer over interleaved (RTG, state, action) tokens, in Flax.

Behavioral parity with /root/reference/transformer/decision_transformer.py:
  * conv state encoder for 128x128 observations (:128-132)
  * learned time embedding repeat-interleaved across the 3 (or 2) token
    streams; learned task embedding added to state embeddings (:221-231)
  * pre-LN causal attention with residual, but **no residual around the MLP**
    (:99-102) — a reference quirk that published checkpoints were trained
    with, so it is replicated bit-for-bit
  * action head (sigmoid) read at state positions, RTG head read at action
    positions (:248-251); two-token inference mode when ``actions is None``
    (:233-237)
  * per-key action rescale whose key order differs by mode — flex:
    (mu, sigma_d, T), norm: (T, sigma_d, mu); sigma_d scale 70/255 (:147-154)

TPU-first design choices: the token interleave is a stack+reshape (one XLA
transpose) instead of strided scatter-assignment; attention over the 18-token
sequence stays a single fused dot-product chain (with an optional Pallas
fused kernel); everything is shape-static so the whole forward jits into one
program.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from dt4image_restoration_tpu.config import ModelConfig

SIGMA_D_SCALE = 70.0 / 255.0

# Column order of the raw 3-dim action head output, per mode
# (decision_transformer.py:147-154). The tuple maps column index -> key.
ACTION_KEYS = {
    "flex": ("mu", "sigma_d", "T"),
    "norm": ("T", "sigma_d", "mu"),
}


class DTOutput(struct.PyTreeNode):
    """All head outputs of one forward pass (callers select what they need,
    mirroring the reference's eval_rtg/eval_actions return flags :257-263).
    A pytree, so it can cross jit boundaries directly."""
    pred_actions: jnp.ndarray          # (B, T, 3) rescaled actions
    pred_rtg: Optional[jnp.ndarray]    # (B, T, 1); None in two-token mode
    action_dict: Dict[str, jnp.ndarray]  # key -> (B, T, 1)


def _normal_init(std: float = 0.02):
    return nn.initializers.normal(stddev=std)


def _compute_dtype(cfg: ModelConfig):
    # Compute dtype for matmul/conv layers (params stay float32) -- the JAX
    # analogue of the reference's bf16 autocast (main.py:37-40).
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class LayerNorm(nn.Module):
    """LayerNorm with torch semantics (eps=1e-5) and an optional fused
    Pallas kernel. Param names match nn.LayerNorm so converted checkpoints
    load unchanged."""
    epsilon: float = 1e-5
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        e = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (e,))
        bias = self.param("bias", nn.initializers.zeros, (e,))
        x = x.astype(jnp.float32)  # norms run in f32 (autocast semantics)
        if self.use_pallas:
            from dt4image_restoration_tpu.ops.pallas import layernorm_pallas
            return layernorm_pallas(x, scale, bias, eps=self.epsilon)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class Attention(nn.Module):
    """Causal multi-head attention (fused QKV) for short decode sequences."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        b, t, e = x.shape
        h = cfg.n_heads
        qkv = nn.Dense(3 * e, kernel_init=_normal_init(),
                       bias_init=nn.initializers.zeros,
                       dtype=_compute_dtype(cfg), name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, e // h).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, e // h).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, e // h).transpose(0, 2, 1, 3)

        if cfg.use_pallas and deterministic:
            from dt4image_restoration_tpu.ops.pallas import (
                fused_causal_attention)
            y = fused_causal_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32)).astype(x.dtype)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                             preferred_element_type=jnp.float32)
            att = att / jnp.sqrt(jnp.asarray(e // h, att.dtype))
            causal = jnp.tril(jnp.ones((t, t), bool))
            att = jnp.where(causal, att, -jnp.inf)
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            att = nn.Dropout(cfg.dropout)(att, deterministic=deterministic)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, e)
        y = nn.Dense(e, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     dtype=_compute_dtype(cfg), name="o_proj")(y)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)


class Block(nn.Module):
    """Pre-LN block. NOTE: residual around attention only — the MLP output
    *replaces* the stream (reference quirk, decision_transformer.py:99-102)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        x = x + Attention(cfg, name="attn")(
            LayerNorm(use_pallas=cfg.use_pallas, name="ln1")(x),
            deterministic)
        h = LayerNorm(use_pallas=cfg.use_pallas, name="ln2")(x)
        h = nn.Dense(4 * cfg.embed_dim, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     dtype=_compute_dtype(cfg), name="fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.embed_dim, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     dtype=_compute_dtype(cfg), name="fc_proj")(h)
        return nn.Dropout(cfg.dropout)(h, deterministic=deterministic)


class StateEncoder(nn.Module):
    """Conv stack for 128x128 observations -> embed_dim (NHWC layout)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, states):
        cfg = self.cfg
        b, t, _ = states.shape
        s = cfg.image_size
        x = states.reshape(b * t, s, s, 1)
        x = nn.Conv(8, (8, 8), strides=(4, 4), padding="VALID",
                    kernel_init=_normal_init(),
                    dtype=_compute_dtype(cfg), name="conv0")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(16, (4, 4), strides=(2, 2), padding="VALID",
                    kernel_init=_normal_init(),
                    dtype=_compute_dtype(cfg), name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.Conv(16, (3, 3), strides=(1, 1), padding="VALID",
                    kernel_init=_normal_init(),
                    dtype=_compute_dtype(cfg), name="conv2")(x)
        x = jax.nn.relu(x)
        x = x.reshape(b * t, -1)
        x = nn.Dense(cfg.embed_dim, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     dtype=_compute_dtype(cfg), name="dense")(x)
        x = jnp.tanh(x)
        return x.reshape(b, t, cfg.embed_dim)


class DecisionTransformer(nn.Module):
    """GPT over interleaved (RTG, state, action) token streams."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, rtg, states, timesteps, task, actions=None,
                 deterministic: bool = True,
                 state_embeddings=None) -> DTOutput:
        """Forward pass.

        Args:
          rtg: (B, T, 1) returns-to-go.
          states: (B, T, image_size**2) flattened observations.
          timesteps: (B, T) or (B, T, 1) integer timesteps.
          task: (B, T) integer task tokens.
          actions: (B, T, action_dim) or None for two-token (RTG, state) mode.
          deterministic: disables dropout (inference).
          state_embeddings: optional (B, T, E) precomputed state-encoder
            outputs — autoregressive decoding encodes each observation once
            and caches it instead of re-encoding the whole window every
            step; ``states`` is ignored when given.
        """
        cfg = self.cfg
        b, t = states.shape[:2]

        rtg_emb = jnp.tanh(
            nn.Dense(cfg.embed_dim, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     name="embed_return")(rtg))
        if state_embeddings is None:
            state_emb = StateEncoder(cfg, name="state_encoder")(states)
        else:
            # Params must still be materialized for checkpoint-shape
            # stability even when the cached path skips the encoder.
            if self.is_initializing():
                StateEncoder(cfg, name="state_encoder")(
                    jnp.zeros((1, 1, cfg.image_size ** 2)))
            state_emb = state_embeddings

        timesteps = jnp.asarray(timesteps).reshape(b, -1).astype(jnp.int32)
        time_emb = nn.Embed(cfg.max_timestep, cfg.embed_dim,
                            embedding_init=_normal_init(),
                            name="time_embed")(timesteps)
        task_emb = nn.Embed(cfg.n_embeds, cfg.embed_dim,
                            embedding_init=_normal_init(),
                            name="task_embed")(task)
        state_emb = state_emb + task_emb

        if actions is not None:
            act_emb = jnp.tanh(
                nn.Dense(cfg.embed_dim, kernel_init=_normal_init(),
                         bias_init=nn.initializers.zeros,
                         name="embed_action")(actions))
            streams = (rtg_emb, state_emb, act_emb)
        else:
            streams = (rtg_emb, state_emb)
        n_streams = len(streams)

        # Interleave [rtg, state, (action)] per timestep: (B, T, S, E) ->
        # (B, S*T, E). One transpose instead of the reference's strided
        # scatter (decision_transformer.py:227-237).
        tokens = jnp.stack(streams, axis=2).reshape(
            b, n_streams * t, cfg.embed_dim)
        time_interleaved = jnp.repeat(time_emb, n_streams, axis=1)

        x = nn.Dropout(cfg.embd_dropout)(
            tokens + time_interleaved, deterministic=deterministic)
        for i in range(cfg.n_blocks):
            x = Block(cfg, name=f"block{i}")(x, deterministic)
        x = LayerNorm(use_pallas=cfg.use_pallas, name="layer_n")(x)

        # Heads read stream-specific positions: actions at state tokens,
        # RTG at action tokens (decision_transformer.py:248-251).
        x = x.reshape(b, t, n_streams, cfg.embed_dim)
        raw_actions = jax.nn.sigmoid(
            nn.Dense(cfg.action_dim, kernel_init=_normal_init(),
                     bias_init=nn.initializers.zeros,
                     name="predict_action")(x[:, :, 1])
        ).astype(jnp.float32)
        pred_rtg = None
        if actions is not None:
            pred_rtg = nn.Dense(1, kernel_init=_normal_init(),
                                bias_init=nn.initializers.zeros,
                                name="predict_rtg")(x[:, :, 2]
                                                    ).astype(jnp.float32)

        pred_actions, action_dict = transform_actions(raw_actions, cfg.mode)
        return DTOutput(pred_actions=pred_actions, pred_rtg=pred_rtg,
                        action_dict=action_dict)


def transform_actions(raw: jnp.ndarray, mode: str
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-key scale/shift of the sigmoid action output
    (decision_transformer.py:266-275). Only sigma_d is scaled (70/255);
    the concatenated output keeps the head's column order."""
    keys = ACTION_KEYS[mode]
    cols = jnp.split(raw, raw.shape[-1], axis=-1)
    action_dict = {}
    for i, key in enumerate(keys):
        scale = SIGMA_D_SCALE if key == "sigma_d" else 1.0
        action_dict[key] = cols[i] * scale
    out = jnp.concatenate([action_dict[k] for k in keys], axis=-1)
    return out, action_dict


def make_dt_apply(cfg: ModelConfig, train: bool = False):
    """Bind a DecisionTransformer into a pure apply function.

    Inference signature: ``(params, rtg, states, timesteps, task, actions)``.
    Training signature adds a trailing dropout rng and enables dropout.
    """
    model = DecisionTransformer(cfg)

    if train:
        def apply_train(params, rtg, states, timesteps, task, actions,
                        dropout_rng):
            return model.apply({"params": params}, rtg, states, timesteps,
                               task, actions, deterministic=False,
                               rngs={"dropout": dropout_rng})
        return apply_train

    def apply_eval(params, rtg, states, timesteps, task, actions):
        return model.apply({"params": params}, rtg, states, timesteps,
                           task, actions)
    return apply_eval


def make_dt_embed_apply(cfg: ModelConfig):
    """Inference apply over precomputed state embeddings:
    ``(params, rtg, state_embs (B, T, E), timesteps, task, actions)``."""
    model = DecisionTransformer(cfg)

    def apply_embed(params, rtg, state_embs, timesteps, task, actions):
        b, t, _ = state_embs.shape
        dummy = jnp.zeros((b, t, 0))
        return model.apply({"params": params}, rtg, dummy, timesteps,
                           task, actions, state_embeddings=state_embs)
    return apply_embed


def make_fused_dt_apply(cfg: ModelConfig):
    """Handwritten inference decode path: embeddings and heads in plain
    jnp, the ENTIRE transformer stack (all blocks + final LN) in one Pallas
    kernel (ops/pallas/transformer.py) — one launch instead of ~60 ops at
    18-token decode sizes. Output-equivalent to ``make_dt_apply`` (tested);
    inference-only (no dropout)."""
    from dt4image_restoration_tpu.ops.pallas.transformer import (
        fused_dt_decode, pack_dt_weights)
    encoder = StateEncoder(cfg)

    def dense(p, x):
        return x @ p["kernel"] + p["bias"]

    def apply_fn(params, rtg, states, timesteps, task, actions=None,
                 state_embeddings=None):
        b, t = states.shape[:2]
        rtg_emb = jnp.tanh(dense(params["embed_return"], rtg))
        if state_embeddings is None:
            state_emb = encoder.apply(
                {"params": params["state_encoder"]}, states)
        else:
            state_emb = state_embeddings
        timesteps = jnp.asarray(timesteps).reshape(b, -1).astype(jnp.int32)
        time_emb = params["time_embed"]["embedding"][timesteps]
        state_emb = state_emb + params["task_embed"]["embedding"][task]

        if actions is not None:
            act_emb = jnp.tanh(dense(params["embed_action"], actions))
            streams = (rtg_emb, state_emb, act_emb)
        else:
            streams = (rtg_emb, state_emb)
        n_streams = len(streams)
        tokens = jnp.stack(streams, axis=2).reshape(
            b, n_streams * t, cfg.embed_dim)
        tokens = tokens + jnp.repeat(time_emb, n_streams, axis=1)

        x = fused_dt_decode(tokens, pack_dt_weights(params, cfg.n_blocks),
                            n_blocks=cfg.n_blocks, n_heads=cfg.n_heads)

        x = x.reshape(b, t, n_streams, cfg.embed_dim)
        raw_actions = jax.nn.sigmoid(
            dense(params["predict_action"], x[:, :, 1])
        ).astype(jnp.float32)
        pred_rtg = None
        if actions is not None:
            pred_rtg = dense(params["predict_rtg"],
                             x[:, :, 2]).astype(jnp.float32)
        pred_actions, action_dict = transform_actions(raw_actions, cfg.mode)
        return DTOutput(pred_actions=pred_actions, pred_rtg=pred_rtg,
                        action_dict=action_dict)

    return apply_fn


def make_state_encode(cfg: ModelConfig):
    """Standalone state-encoder apply: ``(params, states (B, S)) ->
    (B, E)`` using the DT's ``state_encoder`` sub-tree."""
    enc = StateEncoder(cfg)

    def encode(params, states):
        out = enc.apply({"params": params["state_encoder"]},
                        states[:, None, :])
        return out[:, 0]
    return encode


def init_dt_params(cfg: ModelConfig, seed: int = 0):
    """Initialize DT parameters (weight init N(0, 0.02), zero biases,
    unit LayerNorm — decision_transformer.py:157-164)."""
    model = DecisionTransformer(cfg)
    t = cfg.context_length
    s = cfg.image_size
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng},
        jnp.zeros((1, t, 1)), jnp.zeros((1, t, s * s)),
        jnp.zeros((1, t), jnp.int32), jnp.zeros((1, t), jnp.int32),
        jnp.zeros((1, t, cfg.action_dim)))
    return variables["params"]
