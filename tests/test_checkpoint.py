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
