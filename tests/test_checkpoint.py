"""Checkpoint I/O tests: orbax round-trip, torch .pt loading through the
converters, and the train->save->restore->eval flow (SURVEY.md §4 item 7)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from dt4image_restoration_tpu.config import ModelConfig
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, make_dt_apply)
from dt4image_restoration_tpu.utils.checkpoint import (
    load_dt_checkpoint, load_unet_checkpoint, restore_checkpoint,
    save_checkpoint)


def test_orbax_roundtrip(tmp_path):
    cfg = ModelConfig(block_size=18, n_embeds=9)
    params = init_dt_params(cfg, seed=0)
    path = tmp_path / "ckpt" / "model_0"
    save_checkpoint(str(path), jax.device_get(params))
    restored = restore_checkpoint(str(path), like=jax.device_get(params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_orbax_restore_without_template(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4, np.int32)}}
    path = tmp_path / "t"
    save_checkpoint(str(path), tree)
    out = restore_checkpoint(str(path))
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])


def test_load_dt_pt_checkpoint_roundtrip(tmp_path):
    """A torch-saved DT state dict loads and produces a working forward."""
    from tests.test_dt import make_dt_state_dict
    gen = torch.Generator().manual_seed(3)
    sd = make_dt_state_dict(gen)
    pt = tmp_path / "model_experiment_2.pt"
    torch.save(sd, pt)

    params = load_dt_checkpoint(str(pt))
    cfg = ModelConfig(block_size=18, n_embeds=9)
    out = make_dt_apply(cfg)(
        params, jnp.zeros((1, 6, 1)), jnp.zeros((1, 6, 128 * 128)),
        jnp.zeros((1, 6, 1), jnp.int32), jnp.zeros((1, 6), jnp.int32),
        jnp.zeros((1, 6, 3)))
    assert out.pred_actions.shape == (1, 6, 3)


def test_load_dt_pt_checkpoint_with_wrapper_prefixes(tmp_path):
    """DDP ('module.') and torch.compile ('_orig_mod.') prefixes are
    stripped (the reference saves through both wrappers, train.py:53,60)."""
    from tests.test_dt import make_dt_state_dict
    gen = torch.Generator().manual_seed(4)
    sd = {"_orig_mod." + k: v for k, v in make_dt_state_dict(gen).items()}
    pt = tmp_path / "compiled.pt"
    torch.save(sd, pt)
    params = load_dt_checkpoint(str(pt))
    assert "time_embed" in params


def test_load_unet_pt_checkpoint(tmp_path):
    from tests.test_unet import make_unet_state_dict
    gen = torch.Generator().manual_seed(5)
    sd = make_unet_state_dict(gen)
    pt = tmp_path / "unet-nm.pt"
    torch.save(sd, pt)
    params = load_unet_checkpoint(str(pt))
    assert params["net"]["outc"]["kernel"].shape == (1, 1, 32, 1)


# --- converter strictness: first contact with the real published files
# must fail loudly on any naming drift, never silently mis-load -----------

def _dt_sd():
    from tests.test_dt import make_dt_state_dict
    return make_dt_state_dict(torch.Generator().manual_seed(0))


def _unet_sd():
    from tests.test_unet import make_unet_state_dict
    return make_unet_state_dict(torch.Generator().manual_seed(0))


def test_dt_converter_rejects_extra_key():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)
    sd = _dt_sd()
    sd["mystery.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_dt_state_dict(sd)


def test_dt_converter_rejects_missing_key():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)
    sd = _dt_sd()
    del sd["predict_rtg.weight"]
    with pytest.raises(ValueError, match="missing key: predict_rtg.weight"):
        convert_dt_state_dict(sd)


def test_dt_converter_rejects_renamed_key():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)
    sd = _dt_sd()
    sd["transformer.0.c_att.qkv.weight"] = sd.pop(
        "transformer.0.c_att.qkv_proj.weight")
    with pytest.raises(ValueError, match="missing key"):
        convert_dt_state_dict(sd)


def test_dt_converter_tolerates_masking_buffers():
    """torch registers the causal tril mask as a buffer in every attention
    block (decision_transformer.py:44-48); real state dicts include it."""
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)
    sd = _dt_sd()
    for i in range(5):
        sd[f"transformer.{i}.c_att.masking"] = torch.tril(
            torch.ones(1, 1, 18, 18))
    params = convert_dt_state_dict(sd)
    assert "block4" in params


def test_unet_converter_rejects_extra_key():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    sd = _unet_sd()
    sd["stray.tensor"] = torch.zeros(2)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_unet_state_dict(sd)


def test_unet_converter_rejects_missing_bias():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    sd = _unet_sd()
    del sd["inc.conv.conv-0.conv2d.bias"]
    with pytest.raises(ValueError, match="missing bias"):
        convert_unet_state_dict(sd)


def test_unet_converter_rejects_missing_block():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    sd = {k: v for k, v in _unet_sd().items() if not k.startswith("down4.")}
    with pytest.raises(ValueError, match="missing blocks.*down4"):
        convert_unet_state_dict(sd)


def test_unet_converter_rejects_renamed_key():
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    sd = _unet_sd()
    sd["inc.conv.block-0.conv2d.weight"] = sd.pop(
        "inc.conv.conv-0.conv2d.weight")
    sd["inc.conv.block-0.conv2d.bias"] = sd.pop(
        "inc.conv.conv-0.conv2d.bias")
    with pytest.raises(ValueError, match="unrecognized"):
        convert_unet_state_dict(sd)


# ---------------------------------------------------------------------------
# Inverse converters (JAX -> torch export, utils/checkpoint.py)
# ---------------------------------------------------------------------------

def test_export_unet_is_exact_inverse():
    """export_unet_state_dict is the exact inverse of the importer in BOTH
    directions: identical key set and bit-identical values on a
    reference-layout state dict, and params -> sd -> params is the
    identity."""
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict, export_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)
    sd = random_unet_state_dict(7)
    params = convert_unet_state_dict(sd)
    back = export_unet_state_dict(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k],
                                      np.asarray(sd[k], np.float32), err_msg=k)
    params2 = convert_unet_state_dict(back)
    jax.tree.map(np.testing.assert_array_equal, params, params2)


def test_export_dt_is_exact_inverse_with_masking():
    """DT export reproduces the reference layout bit-identically, including
    the (1, 1, B, B) tril 'masking' buffers torch registers per attention
    block (decision_transformer.py:44-48) so load_state_dict(strict=True)
    accepts it; the importer round-trips the export."""
    from tests.test_dt import make_dt_state_dict
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict, export_dt_state_dict)
    gen = torch.Generator().manual_seed(11)
    sd = make_dt_state_dict(gen)
    params = convert_dt_state_dict(sd)
    back = export_dt_state_dict(params, block_size=18)

    masks = {k for k in back if k.endswith("c_att.masking")}
    assert masks == {f"transformer.{i}.c_att.masking" for i in range(5)}
    for k in masks:
        np.testing.assert_array_equal(
            back[k],
            np.tril(np.ones((18, 18), np.float32)).reshape(1, 1, 18, 18))
    assert set(back) - masks == set(sd)
    for k in sd:
        np.testing.assert_array_equal(
            back[k], np.asarray(sd[k].numpy(), np.float32), err_msg=k)

    params2 = convert_dt_state_dict(back)
    jax.tree.map(np.testing.assert_array_equal, params, params2)


def test_export_dt_from_native_init_roundtrip():
    """Natively initialized Flax params survive export -> import exactly
    (the fine-tune-here-then-run-in-the-reference path)."""
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict, export_dt_state_dict)
    cfg = ModelConfig(block_size=18, n_embeds=9)
    params = jax.device_get(init_dt_params(cfg, seed=5))
    back = convert_dt_state_dict(export_dt_state_dict(params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        params, back)


def test_export_checkpoint_cli(tmp_path):
    """tools/export_checkpoint.py: orbax params dir -> torch .pt that the
    strict importer loads back to the identical tree."""
    import tools.export_checkpoint as exporter
    from dt4image_restoration_tpu.utils.checkpoint import load_dt_checkpoint
    cfg = ModelConfig(block_size=18, n_embeds=9)
    params = jax.device_get(init_dt_params(cfg, seed=9))
    src = tmp_path / "model_3"
    save_checkpoint(str(src), params)
    out = tmp_path / "export.pt"
    rc = exporter.main(["--model", "dt", "--in", str(src),
                        "--out", str(out), "--block_size", "18"])
    assert rc == 0
    back = load_dt_checkpoint(str(out))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        params, back)
