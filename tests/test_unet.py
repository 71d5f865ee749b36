"""Parity tests: Flax U-Net denoiser + torch->JAX converter vs a
torch-functional execution of the reference architecture
(/root/reference/evaluation/noise.py). Random weights are generated in the
reference checkpoint's key naming, converted with our converter, and both
sides must agree to float tolerance."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from dt4image_restoration_tpu.models import UNetDenoiser
from dt4image_restoration_tpu.utils.checkpoint import convert_unet_state_dict

CHANNELS = [32, 64, 128, 256, 512]


def make_unet_state_dict(gen: torch.Generator) -> dict:
    """Random weights with the reference UNet's state_dict key layout."""
    sd = {}

    def add_block(prefix, c_in, c_out):
        chans = [c_in, c_out, c_out, c_out]
        for i in range(3):
            sd[f"{prefix}.conv-{i}.conv2d.weight"] = 0.1 * torch.randn(
                chans[i + 1], chans[i], 3, 3, generator=gen)
            sd[f"{prefix}.conv-{i}.conv2d.bias"] = 0.1 * torch.randn(
                chans[i + 1], generator=gen)

    add_block("inc.conv", 2, 32)
    for k in range(1, 5):
        add_block(f"down{k}.mpconv.1", CHANNELS[k - 1], CHANNELS[k])
    for k in range(1, 5):
        c_skip = CHANNELS[4 - k]
        c_up = CHANNELS[5 - k]
        add_block(f"up{k}.conv", c_skip + c_up, c_skip)
    sd["outc.conv.weight"] = 0.1 * torch.randn(1, 32, 1, 1, generator=gen)
    sd["outc.conv.bias"] = 0.1 * torch.randn(1, generator=gen)
    return sd


def torch_unet_forward(sd: dict, x: torch.Tensor) -> torch.Tensor:
    """Reference forward recomputed with torch.nn.functional ops
    (noise.py:119-133 data flow)."""

    def block(prefix, t):
        for i in range(3):
            t = F.conv2d(t, sd[f"{prefix}.conv-{i}.conv2d.weight"],
                         sd[f"{prefix}.conv-{i}.conv2d.bias"], padding=1)
            t = F.leaky_relu(t, 0.2)
        return t

    def up(prefix, t, skip):
        t = F.interpolate(t, scale_factor=2, mode="bilinear",
                          align_corners=True)
        dy = skip.shape[2] - t.shape[2]
        dx = skip.shape[3] - t.shape[3]
        t = F.pad(t, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        return block(prefix, torch.cat([skip, t], dim=1))

    x1 = block("inc.conv", x)
    x2 = block("down1.mpconv.1", F.max_pool2d(x1, 2))
    x3 = block("down2.mpconv.1", F.max_pool2d(x2, 2))
    x4 = block("down3.mpconv.1", F.max_pool2d(x3, 2))
    x5 = block("down4.mpconv.1", F.max_pool2d(x4, 2))
    y = up("up1.conv", x5, x4)
    y = up("up2.conv", y, x3)
    y = up("up3.conv", y, x2)
    y = up("up4.conv", y, x1)
    residual = F.conv2d(y, sd["outc.conv.weight"], sd["outc.conv.bias"])
    return x[:, :1] + residual


def torch_denoiser(sd, img, sigma):
    n, c, h, w = img.shape
    noise_map = torch.ones(n, 1, h, w) * sigma
    out = torch_unet_forward(sd, torch.cat([img, noise_map], dim=1))
    return torch.clamp(out, 0, 1)


@pytest.mark.parametrize("size", [48, 128])
def test_denoiser_parity(size):
    gen = torch.Generator().manual_seed(0)
    sd = make_unet_state_dict(gen)
    img = torch.rand(2, 1, size, size, generator=gen)
    sigma = 15.0 / 255.0

    ref = torch_denoiser(sd, img, sigma).numpy()

    params = convert_unet_state_dict(sd)
    x_nhwc = jnp.asarray(img.numpy().transpose(0, 2, 3, 1))
    ours = UNetDenoiser().apply(
        {"params": params}, x_nhwc, jnp.full((2,), sigma))
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(ours_nchw, ref, rtol=1e-3, atol=2e-4)


def test_denoiser_pad_to_match_odd_size():
    """Odd sizes exercise the decoder pad-to-match path (noise.py:49-53)."""
    gen = torch.Generator().manual_seed(1)
    sd = make_unet_state_dict(gen)
    img = torch.rand(1, 1, 50, 50, generator=gen)
    ref = torch_denoiser(sd, img, 0.1).numpy()
    params = convert_unet_state_dict(sd)
    ours = UNetDenoiser().apply(
        {"params": params},
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), jnp.asarray([0.1]))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=2e-4)


def test_denoiser_packed_matches_direct_f32():
    """Space-to-depth packed execution of the 128^2 stages (ops/image.py
    s2d rewrites; measured 2.2x on `inc`) is mathematically exact vs the
    direct convs — same parameter tree, identical output up to float
    reassociation."""
    gen = torch.Generator().manual_seed(3)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    img = jnp.asarray(torch.rand(2, 1, 128, 128, generator=gen)
                      .numpy().transpose(0, 2, 3, 1))
    direct = UNetDenoiser().apply(
        {"params": params}, img, jnp.full((2,), 0.06))
    packed = UNetDenoiser(packed=True).apply(
        {"params": params}, img, jnp.full((2,), 0.06))
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_denoiser_packed_bf16_no_quality_loss():
    """Under bfloat16 the packed reassociation must not amplify rounding:
    packed-bf16 stays at least as close to the f32 reference output as
    direct-bf16 is (elementwise comparison is meaningless — bf16 rounding
    of random-weight activations swings across the output clamp)."""
    gen = torch.Generator().manual_seed(3)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    img = jnp.asarray(torch.rand(2, 1, 128, 128, generator=gen)
                      .numpy().transpose(0, 2, 3, 1))
    sig = jnp.full((2,), 0.06)
    f32 = np.asarray(
        UNetDenoiser().apply({"params": params}, img, sig), np.float32)
    d16 = np.asarray(UNetDenoiser(dtype=jnp.bfloat16).apply(
        {"params": params}, img, sig), np.float32)
    p16 = np.asarray(UNetDenoiser(dtype=jnp.bfloat16, packed=True).apply(
        {"params": params}, img, sig), np.float32)
    err_direct = float(np.mean(np.abs(d16 - f32)))
    err_packed = float(np.mean(np.abs(p16 - f32)))
    assert err_packed <= 1.5 * err_direct + 1e-4, (err_packed, err_direct)


def test_denoiser_packed_odd_size_falls_back():
    """Odd spatial dims can't form 2x2 cells; packed mode must silently
    fall back to direct convs and still match the torch reference."""
    gen = torch.Generator().manual_seed(4)
    sd = make_unet_state_dict(gen)
    img = torch.rand(1, 1, 49, 49, generator=gen)
    ref = torch_denoiser(sd, img, 0.1).numpy()
    params = convert_unet_state_dict(sd)
    ours = UNetDenoiser(packed=True).apply(
        {"params": params},
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), jnp.asarray([0.1]))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=2e-4)


def test_denoiser_output_clamped():
    gen = torch.Generator().manual_seed(2)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    out = UNetDenoiser().apply(
        {"params": params}, jnp.ones((1, 32, 32, 1)) * 5.0, jnp.asarray([0.5]))
    assert float(jnp.min(out)) >= 0.0
    assert float(jnp.max(out)) <= 1.0


def test_winograd_conv_matches_lax_conv(rng):
    """ops/winograd.py F(2x2,3x3) vs lax direct conv: float-reassociation
    only (~1e-6 rel), across channel shapes including non-square inputs;
    odd spatial dims are a hard error at the op level (the ConvBlock
    fallback guard owns that case)."""
    from jax import lax
    from dt4image_restoration_tpu.ops.winograd import winograd_conv3x3_same

    for (n, h, w, ci, co) in [(2, 8, 8, 3, 5), (1, 16, 12, 32, 32),
                              (3, 4, 6, 2, 32)]:
        x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)),
                        jnp.float32) * 0.1
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        ref = lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = winograd_conv3x3_same(x, k, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="even"):
        winograd_conv3x3_same(jnp.zeros((1, 5, 4, 2)),
                              jnp.zeros((3, 3, 2, 4)))


def test_denoiser_winograd_matches_direct():
    """packed='winograd' runs every 3x3 block via Winograd on the SAME
    parameter tree and must match direct execution through the full
    residual U-Net (reassociation only)."""
    gen = torch.Generator().manual_seed(7)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    img = jnp.asarray(torch.rand(2, 1, 64, 64, generator=gen).numpy()
                      .transpose(0, 2, 3, 1))
    sig = jnp.asarray([0.1, 0.05])
    direct = UNetDenoiser().apply({"params": params}, img, sig)
    wino = UNetDenoiser(packed="winograd").apply({"params": params},
                                                 img, sig)
    np.testing.assert_allclose(np.asarray(wino), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_denoiser_winograd_odd_size_falls_back():
    """Odd spatial dims fall back to direct per block — at 31x31 every
    level of the pyramid is odd (31 -> 15 -> 7 -> 3 -> 1), so the output
    must be EXACTLY the direct path's."""
    gen = torch.Generator().manual_seed(9)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    img = jnp.asarray(torch.rand(1, 1, 31, 31, generator=gen).numpy()
                      .transpose(0, 2, 3, 1))
    direct = UNetDenoiser().apply({"params": params}, img,
                                  jnp.asarray([0.1]))
    wino = UNetDenoiser(packed="winograd").apply({"params": params}, img,
                                                 jnp.asarray([0.1]))
    np.testing.assert_array_equal(np.asarray(wino), np.asarray(direct))


def test_denoiser_winograd_deep_matches_direct():
    """packed='winograd_deep' applies Winograd only to the >=128-channel
    blocks (down2..down4, up1..up2 — where the channel GEMMs fill the
    MXU's 128 contraction lanes) and runs the shallow blocks direct; the
    full residual U-Net output must match direct execution to
    reassociation tolerance on the same parameter tree."""
    gen = torch.Generator().manual_seed(11)
    sd = make_unet_state_dict(gen)
    params = convert_unet_state_dict(sd)
    img = jnp.asarray(torch.rand(2, 1, 64, 64, generator=gen).numpy()
                      .transpose(0, 2, 3, 1))
    sig = jnp.asarray([0.1, 0.05])
    direct = UNetDenoiser().apply({"params": params}, img, sig)
    deep = UNetDenoiser(packed="winograd_deep").apply({"params": params},
                                                      img, sig)
    np.testing.assert_allclose(np.asarray(deep), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)
    # And the shallow blocks really are direct: at 10x10 the deep levels
    # (10 -> 5) go odd immediately, so winograd_deep must be EXACTLY
    # direct there while full 'winograd' is not (inc still even).
    img_s = jnp.asarray(torch.rand(1, 1, 10, 10, generator=gen).numpy()
                        .transpose(0, 2, 3, 1))
    d_s = UNetDenoiser().apply({"params": params}, img_s,
                               jnp.asarray([0.1]))
    deep_s = UNetDenoiser(packed="winograd_deep").apply(
        {"params": params}, img_s, jnp.asarray([0.1]))
    np.testing.assert_array_equal(np.asarray(deep_s), np.asarray(d_s))
