"""ARNIQA no-reference image-quality scorer (the MCTS rollout value model).

The reference downloads ARNIQA from torch.hub at env construction
(/root/reference/evaluation/env.py:36-40) — a ResNet-50 encoder whose
features at full and half scale are concatenated and fed to a linear
regressor trained on KADID-10k, with ``scale_score=True`` mapping the MOS
range onto [0, 1].

This module provides:
  * ``ResNet50`` / ``ARNIQA`` — Flax (NHWC) implementations;
  * ``convert_arniqa_state_dict`` — torch->Flax weight converter for a
    downloaded hub checkpoint (torchvision ResNet naming);
  * ``make_value_fn`` — the env.py:42-54 scoring wrapper (antialiased
    half-scale downsample, greyscale->'RGB' zero-padding; the reference
    feeds raw unnormalized images straight into the hub model —
    env.py:42-54 applies no ImageNet normalization);
  * ``proxy_value_fn`` — a deterministic no-reference fallback used when
    the hub weights are unavailable (this container has no network
    egress). The substitution only affects MCTS node *ranking*; greedy/flex
    modes never touch it. Documented parity waiver: SURVEY.md §7 risk (b).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


KADID_RANGE = (1.0, 5.0)  # MOS range used by scale_score


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32  # compute dtype (params stay float32) — the
    # AMP policy mirroring the reference's autocast around ARNIQA (env.py:52)

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn2")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(4 * self.features, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype, name="ds_conv")(x)
            residual = nn.BatchNorm(use_running_average=True,
                                    dtype=self.dtype,
                                    name="ds_bn")(residual)
        return jax.nn.relu(y + residual)


class ResNet50(nn.Module):
    """torchvision-layout ResNet-50 feature extractor (global-pool output,
    2048-dim)."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1")(x)
        x = jax.nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = 64 * (2 ** stage)
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(feats, strides=strides,
                               downsample=block == 0, dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(x)
        # Pool in float32: the 2048-dim feature norm drives the regressor.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class ARNIQA(nn.Module):
    """Encoder on full + half scale, concat, linear regressor."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray, img_ds: jnp.ndarray,
                 scale_score: bool = True):
        encoder = ResNet50(dtype=self.dtype, name="encoder")
        f = jnp.concatenate([encoder(img), encoder(img_ds)], axis=-1)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True),
                            1e-12)
        score = nn.Dense(1, name="regressor")(f)[:, 0]
        if scale_score:
            lo, hi = KADID_RANGE
            score = (score - lo) / (hi - lo)
        return score


def _bn(sd, prefix):
    # np.array (copy): np.asarray would alias torch storage (see
    # utils/checkpoint.py _np).
    return {"scale": np.array(sd[prefix + ".weight"]),
            "bias": np.array(sd[prefix + ".bias"])}, \
           {"mean": np.array(sd[prefix + ".running_mean"]),
            "var": np.array(sd[prefix + ".running_var"])}


def convert_arniqa_state_dict(state_dict: Mapping[str, Any],
                              encoder_prefix: str = "encoder.model.",
                              regressor_key: str = "regressor"
                              ) -> Dict[str, Any]:
    """Convert a downloaded ARNIQA hub checkpoint (torchvision ResNet-50
    naming under ``encoder_prefix``) to Flax params + batch_stats.

    STRICT like the DT/U-Net converters (utils/checkpoint.py): raises
    ``ValueError`` on unconsumed keys so naming drift in a real hub file
    fails loudly instead of silently mis-loading; missing keys raise
    ``KeyError``. Tolerated-and-ignored: BatchNorm ``num_batches_tracked``
    counters and the torchvision classification head ``fc.*`` (ARNIQA
    takes pooled features; the head is unused, env.py:36-40)."""
    def t(v):
        v = np.array(v)  # copy — np.asarray would alias torch storage
        return v.transpose(2, 3, 1, 0) if v.ndim == 4 else v

    consumed = set()
    _raw_sd = {k.removeprefix(encoder_prefix): v
               for k, v in state_dict.items()
               if k.startswith(encoder_prefix)}

    class _Tracking(dict):
        # Only __getitem__ marks keys consumed; `in` membership tests
        # (inherited) deliberately do not.
        def __getitem__(self, k):
            consumed.add(encoder_prefix + k)
            return dict.__getitem__(self, k)

    sd = _Tracking(_raw_sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_p: Dict[str, Any] = {"conv1": {"kernel": t(sd["conv1.weight"])}}
    enc_s: Dict[str, Any] = {}
    p, s = _bn(sd, "bn1")
    enc_p["bn1"], enc_s["bn1"] = p, s
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for block in range(n_blocks):
            tp = f"layer{stage + 1}.{block}."
            name = f"layer{stage + 1}_{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {"kernel": t(sd[tp + f"conv{i}.weight"])}
                pp, ss = _bn(sd, tp + f"bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = pp, ss
            if tp + "downsample.0.weight" in sd:
                bp["ds_conv"] = {"kernel": t(sd[tp + "downsample.0.weight"])}
                pp, ss = _bn(sd, tp + "downsample.1")
                bp["ds_bn"], bs["ds_bn"] = pp, ss
            enc_p[name], enc_s[name] = bp, bs
    params["encoder"] = enc_p
    stats["encoder"] = enc_s

    reg_w = np.array(state_dict[regressor_key + ".weight"]).reshape(1, -1)
    reg_b = np.array(
        state_dict.get(regressor_key + ".bias", np.zeros(1))).reshape(-1)
    params["regressor"] = {"kernel": reg_w.T, "bias": reg_b}

    consumed.update({regressor_key + ".weight", regressor_key + ".bias"})
    leftover = sorted(
        k for k in state_dict
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and not k.startswith(encoder_prefix + "fc."))
    if leftover:
        raise ValueError(f"unconsumed ARNIQA checkpoint keys: {leftover}")
    return {"params": params, "batch_stats": stats}


def _half_scale(nhwc: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """The reference's half-resolution input uses torchvision
    ``transforms.Resize`` (env.py:48), which ANTIALIASES on tensors in
    current torchvision (>= 0.17 default; older releases defaulted
    antialias=False on tensors — PARITY.md D13) —
    ``jax.image.resize(antialias=True)`` matches it to ~1e-7 (tested);
    the plain align_corners bilinear the U-Net upsample uses differs by
    up to ~0.3 here and would shift scores on real checkpoints."""
    b = nhwc.shape[0]
    return jax.image.resize(
        nhwc, (b, image_size // 2, image_size // 2, nhwc.shape[-1]),
        method="bilinear", antialias=True)


def make_value_fn(variables: Dict[str, Any],
                  image_size: int = 128,
                  dtype: Any = jnp.float32
                  ) -> Callable[[np.ndarray], float]:
    """The env.py:42-54 ARNIQA scoring wrapper: greyscale image (1, H, W) ->
    zero-padded 'RGB' at full + half scale -> score. ``dtype=jnp.bfloat16``
    mirrors the reference's autocast around ARNIQA (env.py:52)."""
    model = ARNIQA(dtype=dtype)

    @jax.jit
    def score(x):  # x: (1, H, W) float in [0, 1]
        rgb = jnp.concatenate(
            [x, jnp.zeros_like(x), jnp.zeros_like(x)])  # (3, H, W)
        nhwc = jnp.transpose(rgb, (1, 2, 0))[None]
        half = _half_scale(nhwc, image_size)
        return model.apply(variables, nhwc, half, scale_score=True)[0]

    return lambda x: float(score(jnp.asarray(x, jnp.float32)))


def make_value_fn_jax(variables: Dict[str, Any],
                      image_size: int = 128,
                      dtype: Any = jnp.float32
                      ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Batched jittable twin of :func:`make_value_fn` for the device-
    resident tree search (inference/mcts_device.py): (B, H, W) images in
    [0, 1] -> (B,) scores, traceable inside a larger program."""
    model = ARNIQA(dtype=dtype)

    def score(x):  # (B, H, W)
        nhwc = jnp.stack(
            [x, jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)
        half = _half_scale(nhwc, image_size)
        return model.apply(variables, nhwc, half, scale_score=True)

    return score


def proxy_value_fn_jax(x: jnp.ndarray) -> jnp.ndarray:
    """Batched jittable twin of :func:`proxy_value_fn`: (B, H, W) -> (B,).

    Same formula on the same float32 inputs; values can differ from the
    numpy version at reduction-order epsilon (numpy pairwise sums /
    float64 percentile interpolation vs XLA float32), which is within the
    search's documented sensitivity class."""
    img = jnp.asarray(x, jnp.float32)
    gy = jnp.gradient(img, axis=1)
    gx = jnp.gradient(img, axis=2)
    grad_mag = jnp.sqrt(gx ** 2 + gy ** 2)
    lap = (jnp.abs(jnp.diff(img, 2, axis=1)).mean(axis=(1, 2))
           + jnp.abs(jnp.diff(img, 2, axis=2)).mean(axis=(1, 2)))
    b = img.shape[0]
    edge = jnp.percentile(grad_mag.reshape(b, -1), 95.0, axis=1)
    return edge - 5.0 * lap


def proxy_value_fn(x: np.ndarray) -> float:
    """Deterministic no-reference quality proxy: rewards piecewise-smooth
    images with strong edges, penalizes high-frequency noise. Used in place
    of ARNIQA when the hub weights are not available (zero-egress build)."""
    img = np.asarray(x, np.float32).reshape(x.shape[-2], x.shape[-1])
    gy, gx = np.gradient(img)
    grad_mag = np.sqrt(gx ** 2 + gy ** 2)
    lap = (np.abs(np.diff(img, 2, axis=0)).mean()
           + np.abs(np.diff(img, 2, axis=1)).mean())
    edge_strength = float(np.percentile(grad_mag, 95))
    noise = float(lap)
    return edge_strength - 5.0 * noise
