"""ARNIQA tests: Flax ResNet-50 parity vs a torch-functional execution of
the torchvision ResNet-50 layout, converter round-trip, scoring wrapper,
proxy fallback sanity. (torchvision is not in this image, so the reference
forward is restated with torch.nn.functional ops over a synthetic
hub-layout state dict.)"""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.models.arniqa import (
    ARNIQA, ResNet50, convert_arniqa_state_dict, make_value_fn,
    proxy_value_fn)
from dt4image_restoration_tpu.utils.torch_reference import (
    RESNET50_STAGES as STAGES, random_arniqa_state_dict,
    random_resnet50_state_dict)


def _torch_resnet50_features(sd, x):
    """torchvision ResNet-50 forward restated functionally (eval mode)."""
    def bn(name, t):
        return F.batch_norm(t, sd[name + ".running_mean"],
                            sd[name + ".running_var"],
                            sd[name + ".weight"], sd[name + ".bias"],
                            training=False)

    def bottleneck(prefix, t, stride, has_ds):
        identity = t
        y = F.relu(bn(prefix + "bn1",
                      F.conv2d(t, sd[prefix + "conv1.weight"])))
        y = F.relu(bn(prefix + "bn2",
                      F.conv2d(y, sd[prefix + "conv2.weight"],
                               stride=stride, padding=1)))
        y = bn(prefix + "bn3", F.conv2d(y, sd[prefix + "conv3.weight"]))
        if has_ds:
            identity = bn(prefix + "downsample.1",
                          F.conv2d(t, sd[prefix + "downsample.0.weight"],
                                   stride=stride))
        return F.relu(y + identity)

    x = F.relu(bn("bn1", F.conv2d(x, sd["conv1.weight"], stride=2,
                                  padding=3)))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    for stage, n_blocks in enumerate(STAGES):
        for block in range(n_blocks):
            stride = 2 if stage > 0 and block == 0 else 1
            x = bottleneck(f"layer{stage + 1}.{block}.", x, stride,
                           block == 0)
    return F.adaptive_avg_pool2d(x, 1).flatten(1)


@pytest.fixture(scope="module")
def hub_like_state_dict():
    # Same seed -> random_arniqa_state_dict's encoder weights equal the
    # unprefixed ResNet-50 dict the torch restatement consumes.
    return random_resnet50_state_dict(0), random_arniqa_state_dict(0)


def test_resnet50_parity(hub_like_state_dict):
    sd, full = hub_like_state_dict
    gen = torch.Generator().manual_seed(1)
    x = torch.rand(1, 3, 64, 64, generator=gen)
    feats = _torch_resnet50_features(sd, x)

    variables = convert_arniqa_state_dict(full)
    enc_vars = {"params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"]}
    ours = ResNet50().apply(enc_vars,
                            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), feats.numpy(),
                               rtol=5e-3, atol=5e-4)


def test_arniqa_score_scalar(hub_like_state_dict):
    _, full = hub_like_state_dict
    variables = convert_arniqa_state_dict(full)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    half = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    score = ARNIQA().apply(variables, img, half, scale_score=True)
    assert score.shape == (1,)
    raw = ARNIQA().apply(variables, img, half, scale_score=False)
    np.testing.assert_allclose(np.asarray(score),
                               (np.asarray(raw) - 1.0) / 4.0, rtol=1e-4,
                               atol=1e-6)


def test_value_fn_wrapper(hub_like_state_dict):
    _, full = hub_like_state_dict
    variables = convert_arniqa_state_dict(full)
    fn = make_value_fn(variables)
    x = np.random.default_rng(0).uniform(0, 1, (1, 128, 128)).astype(
        np.float32)
    s = fn(x)
    assert isinstance(s, float) and np.isfinite(s)


def test_value_fn_bf16_close_to_f32(hub_like_state_dict):
    """bf16 scoring (the reference's autocast around ARNIQA, env.py:52)
    stays close to f32 — ranking-level agreement is what MCTS needs."""
    import jax.numpy as jnp
    _, full = hub_like_state_dict
    variables = convert_arniqa_state_dict(full)
    f32 = make_value_fn(variables)
    bf16 = make_value_fn(variables, dtype=jnp.bfloat16)
    x = np.random.default_rng(0).uniform(0, 1, (1, 128, 128)).astype(
        np.float32)
    a, b = f32(x), bf16(x)
    assert np.isfinite(b)
    assert abs(a - b) < 0.05 * max(1.0, abs(a))


def test_proxy_value_prefers_clean_over_noisy():
    from dt4image_restoration_tpu.data import shepp_logan
    clean = shepp_logan(128)[None]
    noisy = np.clip(
        clean + np.random.default_rng(0).normal(0, 0.15, clean.shape), 0, 1
    ).astype(np.float32)
    assert proxy_value_fn(clean) > proxy_value_fn(noisy)


def test_value_fn_jax_matches_host_wrapper(hub_like_state_dict):
    """The batched jit twin used by the device-resident search
    (make_value_fn_jax) must score like the per-image host wrapper."""
    from dt4image_restoration_tpu.models.arniqa import make_value_fn_jax
    _, full = hub_like_state_dict
    variables = convert_arniqa_state_dict(full)
    host = make_value_fn(variables)
    batched = make_value_fn_jax(variables)
    xs = np.random.default_rng(2).uniform(0, 1, (3, 128, 128)).astype(
        np.float32)
    got = np.asarray(batched(jnp.asarray(xs)))
    want = [host(x[None]) for x in xs]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_proxy_value_fn_jax_matches_numpy():
    from dt4image_restoration_tpu.data import shepp_logan
    from dt4image_restoration_tpu.models.arniqa import proxy_value_fn_jax
    clean = shepp_logan(128)[None]
    noisy = np.clip(
        clean + np.random.default_rng(0).normal(0, 0.15, clean.shape), 0, 1
    ).astype(np.float32)
    xs = np.concatenate([clean, noisy])
    got = np.asarray(proxy_value_fn_jax(jnp.asarray(xs)))
    want = [proxy_value_fn(x) for x in xs]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got[0] > got[1]  # same clean-over-noisy preference


def test_arniqa_converter_strict_on_unconsumed_keys():
    """Naming drift in a real hub checkpoint must fail loudly (same
    contract as the DT/U-Net converters); BN counters and the unused
    torchvision fc head are tolerated."""
    full = random_arniqa_state_dict(0)
    # Tolerated extras: fc head + BN bookkeeping.
    ok = dict(full)
    ok["encoder.model.fc.weight"] = torch.zeros(1000, 2048)
    ok["encoder.model.layer1.0.bn1.num_batches_tracked"] = torch.zeros(())
    convert_arniqa_state_dict(ok)  # must not raise

    bad = dict(full)
    bad["encoder.model.layer1.0.conv1_renamed.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_arniqa_state_dict(bad)

    missing = dict(full)
    del missing["encoder.model.layer2.1.bn2.weight"]
    with pytest.raises(KeyError):
        convert_arniqa_state_dict(missing)


def test_half_scale_matches_torch_antialiased_resize():
    """The ARNIQA half-resolution input must match torchvision
    transforms.Resize semantics — antialiased bilinear on tensors
    (reference env.py:48) — NOT the U-Net's align_corners bilinear."""
    from dt4image_restoration_tpu.models.arniqa import _half_scale
    x = np.random.default_rng(3).uniform(
        0, 1, (2, 128, 128, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(64, 64), mode="bilinear",
                         antialias=True).permute(0, 2, 3, 1).numpy()
    got = np.asarray(_half_scale(jnp.asarray(x), 128))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
