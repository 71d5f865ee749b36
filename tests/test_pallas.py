"""Pallas kernel correctness tests (interpreter mode on CPU; the same
kernels compile for TPU — benchmarked in benchmarks/pallas_bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.ops import kspace_consistency
from dt4image_restoration_tpu.ops.pallas import (
    fused_causal_attention, kspace_consistency_pallas, layernorm_pallas)


def test_kspace_kernel_matches_xla(rng):
    b, h, w = 3, 128, 128
    z = rng.standard_normal((b, 1, h, w, 2)).astype(np.float32)
    y0 = rng.standard_normal((b, 1, h, w, 2)).astype(np.float32)
    mask = rng.uniform(size=(b, 1, h, w)) < 0.3
    mu = rng.uniform(0.1, 2.0, (b,)).astype(np.float32)

    out = kspace_consistency_pallas(
        jnp.asarray(z), jnp.asarray(y0), jnp.asarray(mask),
        jnp.asarray(mu), interpret=True)

    zc = z[..., 0] + 1j * z[..., 1]
    y0c = y0[..., 0] + 1j * y0[..., 1]
    ref = np.asarray(kspace_consistency(
        jnp.asarray(zc), jnp.asarray(y0c), jnp.asarray(mask),
        jnp.asarray(mu)[:, None, None, None]))
    got = np.asarray(out)
    np.testing.assert_allclose(got[..., 0], ref.real, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[..., 1], ref.imag, rtol=1e-5, atol=1e-6)


def test_attention_kernel_matches_xla(rng):
    b, h, t, d = 2, 4, 18, 32
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)

    out = fused_causal_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), interpret=True)

    att = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    mask = np.tril(np.ones((t, t), bool))
    att = np.where(mask, att, -np.inf)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", att, v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n", [18, 126, 300])
def test_layernorm_kernel_matches_torch(rng, n):
    import torch
    import torch.nn.functional as F
    e = 128
    x = rng.standard_normal((n, e)).astype(np.float32)
    scale = (1 + 0.1 * rng.standard_normal(e)).astype(np.float32)
    bias = (0.1 * rng.standard_normal(e)).astype(np.float32)

    out = layernorm_pallas(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), interpret=True)
    ref = F.layer_norm(torch.from_numpy(x), (e,),
                       torch.from_numpy(scale), torch.from_numpy(bias),
                       eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_fused_dt_decode_matches_flax(rng):
    """The single-kernel transformer stack must equal the Flax forward for
    both token modes."""
    import jax
    from dt4image_restoration_tpu.config import ModelConfig
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply, make_fused_dt_apply)

    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm")
    params = init_dt_params(cfg, seed=0)
    ref_apply = make_dt_apply(cfg)
    fused_apply = make_fused_dt_apply(cfg)

    b, t = 2, 6
    args = (
        jnp.asarray(rng.uniform(0, 1, (b, t, 1)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (b, t, 128 * 128)), jnp.float32),
        jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :, None],
                         (b, t, 1)),
        jnp.asarray(rng.integers(0, 9, (b, t)), jnp.int32),
    )
    actions = jnp.asarray(rng.uniform(0, 1, (b, t, 3)), jnp.float32)

    ref = ref_apply(params, *args, actions)
    got = fused_apply(params, *args, actions)
    np.testing.assert_allclose(np.asarray(got.pred_actions),
                               np.asarray(ref.pred_actions),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.pred_rtg),
                               np.asarray(ref.pred_rtg),
                               rtol=1e-4, atol=1e-4)

    ref2 = ref_apply(params, *args, None)
    got2 = fused_apply(params, *args, None)
    assert got2.pred_rtg is None
    np.testing.assert_allclose(np.asarray(got2.pred_actions),
                               np.asarray(ref2.pred_actions),
                               rtol=1e-4, atol=1e-5)


def test_layernorm_kernel_3d_shape(rng):
    x = rng.standard_normal((4, 18, 128)).astype(np.float32)
    scale = np.ones(128, np.float32)
    bias = np.zeros(128, np.float32)
    out = layernorm_pallas(jnp.asarray(x), jnp.asarray(scale),
                           jnp.asarray(bias), interpret=True)
    assert out.shape == (4, 18, 128)
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0, atol=1e-5)
