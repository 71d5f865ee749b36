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


def _direct_block(x, weights, biases, slope=0.2):
    for w, b in zip(weights, biases):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jax.nn.leaky_relu(x, negative_slope=slope)
    return x


def _block_params(rng, cin, feats, num_layer):
    ws, bs = [], []
    for _ in range(num_layer):
        ws.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, feats)) * 0.1, jnp.float32))
        bs.append(jnp.asarray(
            rng.standard_normal((feats,)) * 0.1, jnp.float32))
        cin = feats
    return ws, bs


@pytest.mark.parametrize("shape,cin,feats,layers",
                         [((2, 16, 12, 2), 2, 8, 3),   # inc-shaped
                          ((1, 8, 8, 4), 4, 16, 1),    # single layer
                          ((3, 10, 24, 16), 16, 8, 2)])
def test_fused_conv_block_matches_direct(rng, shape, cin, feats, layers):
    """The whole-block Pallas kernel (s2d cell domain, VMEM-resident
    intermediates) equals the chained XLA SAME convs + LeakyReLU
    (reference block semantics, noise.py:88-98)."""
    from dt4image_restoration_tpu.ops.pallas import fused_conv_block
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ws, bs = _block_params(rng, cin, feats, layers)
    ref = _direct_block(x, ws, bs)
    got = fused_conv_block(x, ws, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_conv_block_bf16(rng):
    """bf16 compute path: f32 accumulation keeps it within bf16 rounding
    of the direct bf16 block."""
    from dt4image_restoration_tpu.ops.pallas import fused_conv_block
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 2)), jnp.bfloat16)
    ws, bs = _block_params(rng, 2, 8, 3)
    ref = _direct_block(jnp.asarray(x, jnp.float32), ws, bs)
    got = fused_conv_block(
        x, [jnp.asarray(w, jnp.bfloat16) for w in ws],
        [jnp.asarray(b, jnp.bfloat16) for b in bs], interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.1, atol=0.05)


def test_fused_conv_block_row_tiling(rng):
    """Row tiles with layered halos are exact across tile boundaries
    (rt=2 on H/2=8 -> 4 tiles, every inter-tile seam exercised), and
    wide decoder-style inputs (Cin=64 -> packed 256) are supported."""
    from dt4image_restoration_tpu.ops.pallas import fused_conv_block
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 64)), jnp.float32)
    ws, bs = _block_params(rng, 64, 8, 3)
    ref = _direct_block(x, ws, bs)
    for rt in (2, 4, 8):
        got = fused_conv_block(x, ws, bs, row_tile=rt, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="must divide"):
        fused_conv_block(x, ws, bs, row_tile=3, interpret=True)


def test_convblock_pallas_mode_same_params_and_output(rng):
    """ConvBlock(packed='pallas') shares the checkpoint tree with the
    direct path bit-for-bit and matches its output; unsupported inputs
    (odd dims, wide channels) fall back transparently."""
    from dt4image_restoration_tpu.models.unet import ConvBlock
    direct = ConvBlock(8, dtype=jnp.float32)
    pall = ConvBlock(8, dtype=jnp.float32, packed="pallas")
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 2)), jnp.float32)
    params = direct.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        pall.init(jax.random.PRNGKey(0), x))
    np.testing.assert_allclose(
        np.asarray(pall.apply(params, x)),
        np.asarray(direct.apply(params, x)), rtol=2e-5, atol=2e-5)
    # Fallback: odd spatial dims -> direct execution, same result.
    xf = jnp.asarray(rng.standard_normal((1, 9, 9, 2)), jnp.float32)
    p = direct.init(jax.random.PRNGKey(1), xf)
    np.testing.assert_allclose(
        np.asarray(pall.apply(p, xf)),
        np.asarray(direct.apply(p, xf)), rtol=1e-6, atol=1e-6)
    # Wide decoder-style channels run the kernel (row-tiled), not a
    # fallback, and still match.
    wide_d = ConvBlock(8, dtype=jnp.float32)
    wide_p = ConvBlock(8, dtype=jnp.float32, packed="pallas")
    xw = jnp.asarray(rng.standard_normal((1, 8, 8, 64)), jnp.float32)
    pw = wide_d.init(jax.random.PRNGKey(1), xw)
    np.testing.assert_allclose(
        np.asarray(wide_p.apply(pw, xw)),
        np.asarray(wide_d.apply(pw, xw)), rtol=2e-5, atol=2e-5)


def test_unet_pallas_packed_parity(rng):
    """UNet(packed='pallas') — fused Pallas inc + the measured XLA policy
    elsewhere — equals the direct UNet on the same checkpoint."""
    from dt4image_restoration_tpu.models.unet import UNetDenoiser
    x = jnp.asarray(rng.uniform(0, 1, (1, 48, 48, 1)), jnp.float32)
    sigma = jnp.asarray([0.06], jnp.float32)
    direct = UNetDenoiser()
    pall = UNetDenoiser(packed="pallas")
    params = direct.init(jax.random.PRNGKey(0), x, sigma)
    ref = direct.apply(params, x, sigma)
    got = pall.apply(params, x, sigma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_pallas_probe_failure_degrades_cli_to_s2d(monkeypatch, tmp_path,
                                                  capsys):
    """The production CLI surface must not crash mid-directory when the
    fused kernel fails on real hardware (VERDICT r3 item 3): a load-time
    probe compile catches the failure and degrades to the XLA 's2d' path
    with a loud warning naming the error."""
    from dt4image_restoration_tpu.ops.pallas import conv_block as pc
    from dt4image_restoration_tpu.utils import loaders

    def boom(*a, **k):
        raise RuntimeError("Mosaic internal error (injected)")

    monkeypatch.setattr(pc, "fused_conv_block", boom)
    denoise = loaders.load_denoiser(str(tmp_path / "missing.pt"),
                                    packed="pallas", probe_hw=48)
    err = capsys.readouterr().err
    assert "failed its probe compile" in err
    assert "Mosaic internal error (injected)" in err
    assert "s2d" in err
    # The returned denoiser runs on the fallback path (would raise if it
    # still routed through the broken kernel).
    out = denoise(jnp.zeros((1, 48, 48, 1)), jnp.zeros((1,)))
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_probe_green_keeps_pallas(tmp_path, capsys):
    """A green probe keeps the fused path: no degradation warning."""
    from dt4image_restoration_tpu.utils import loaders
    denoise = loaders.load_denoiser(str(tmp_path / "missing.pt"),
                                    packed="pallas", probe_hw=48)
    err = capsys.readouterr().err
    assert "failed its probe compile" not in err
    out = denoise(jnp.zeros((1, 48, 48, 1)), jnp.zeros((1,)))
    assert np.isfinite(np.asarray(out)).all()
