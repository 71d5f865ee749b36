"""Training tests: LR schedule parity, weight-decay mask split, masked loss
semantics, loss decrease on synthetic data, and shard_map-vs-single-device
gradient equivalence on the virtual 8-device CPU mesh (SURVEY.md §4 item 6)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dt4image_restoration_tpu.config import ModelConfig, TrainerConfig
from dt4image_restoration_tpu.models.decision_transformer import (
    init_dt_params, make_dt_apply)
from dt4image_restoration_tpu.training import (
    TrainState, make_lr_schedule, make_mesh, make_optimizer,
    make_shard_map_train_step, make_train_step, masked_mse_loss, shard_batch)
from dt4image_restoration_tpu.training.sharding import (
    make_shard_map_train_step, shard_params)
from dt4image_restoration_tpu.training.trainer import _decay_mask, loss_fn

CFG = ModelConfig(block_size=18, n_embeds=9, mode="norm", dropout=0.0,
                  embd_dropout=0.0)


def _batch(rng, b=8, t=6):
    return {
        "states": rng.uniform(0, 1, (b, t, 128 * 128)).astype(np.float32),
        "actions": rng.uniform(0, 1, (b, t, 3)).astype(np.float32),
        "rtg": rng.uniform(0, 1, (b, t, 1)).astype(np.float32),
        "traj_masks": np.concatenate(
            [np.ones((b, t - 2, 1)), np.zeros((b, 2, 1))],
            axis=1).astype(np.float32),
        "timesteps": np.broadcast_to(
            np.arange(t, dtype=np.int32)[None, :, None], (b, t, 1)).copy(),
        "task": rng.integers(0, 9, (b, t)).astype(np.int32),
    }


def test_lr_schedule_matches_reference():
    """train.py:106-119: step/warmup then cosine with 0.1 floor."""
    cfg = TrainerConfig(warmup_steps=10, learning_rate=3e-4)
    sched = make_lr_schedule(cfg, max_steps=100)
    np.testing.assert_allclose(float(sched(5)), 3e-4 * 5 / 10, rtol=1e-6)
    np.testing.assert_allclose(
        float(sched(50)), 3e-4 * max(0.1, 0.5 * (1 + math.cos(math.pi * 0.5))),
        rtol=1e-5)
    np.testing.assert_allclose(float(sched(99)), 3e-4 * 0.1, rtol=1e-5)


def test_decay_mask_split():
    params = init_dt_params(CFG, seed=0)
    mask = _decay_mask(params)
    assert mask["predict_rtg"]["kernel"] is True
    assert mask["predict_rtg"]["bias"] is False
    assert mask["time_embed"]["embedding"] is False
    assert mask["task_embed"]["embedding"] is False
    assert mask["layer_n"]["scale"] is False
    assert mask["block0"]["attn"]["qkv_proj"]["kernel"] is True
    assert mask["state_encoder"]["conv0"]["kernel"] is True


def test_masked_mse_matches_boolean_select(rng):
    preds = jnp.asarray(rng.standard_normal((4, 6, 4)), jnp.float32)
    targets = jnp.asarray(rng.standard_normal((4, 6, 4)), jnp.float32)
    masks = jnp.asarray(
        (rng.uniform(size=(4, 6, 1)) > 0.3).astype(np.float32))
    ours = float(masked_mse_loss(preds, targets, masks))
    sel = np.broadcast_to(np.asarray(masks), preds.shape) > 0
    ref = float(np.mean((np.asarray(preds)[sel] - np.asarray(targets)[sel])
                        ** 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


@pytest.fixture(scope="module")
def setup():
    params = init_dt_params(CFG, seed=0)
    tcfg = TrainerConfig(warmup_steps=2, learning_rate=1e-3)
    optimizer = make_optimizer(tcfg, max_steps=50, params=params)
    return params, optimizer


def test_loss_decreases(setup):
    params, optimizer = setup
    apply_train = make_dt_apply(CFG, train=True)
    step = make_train_step(apply_train, optimizer)
    params = jax.tree.map(jnp.copy, params)  # step donates its input state
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        state, loss = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert min(losses[-5:]) < losses[0] * 0.8, losses


def test_shard_map_grads_match_single_device(setup):
    """DP shard_map psum-reduced update == single-device update."""
    params, optimizer = setup
    apply_train = make_dt_apply(CFG, train=True)
    mesh = make_mesh(n_data=8, n_model=1)

    state0 = TrainState(params=params, opt_state=optimizer.init(params),
                        step=jnp.zeros((), jnp.int32))
    rng = np.random.default_rng(1)
    host_batch = _batch(rng, b=8)
    key = jax.random.PRNGKey(7)

    single = make_train_step(apply_train, optimizer)
    s1, l1 = single(jax.tree.map(jnp.copy, state0),
                    {k: jnp.asarray(v) for k, v in host_batch.items()}, key)

    sharded_step = make_shard_map_train_step(apply_train, optimizer, mesh)
    with mesh:
        s2, l2 = sharded_step(jax.tree.map(jnp.copy, state0),
                              shard_batch(host_batch, mesh), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        s1.params, s2.params)


def test_tensor_parallel_forward_matches_replicated(setup):
    """TP-sharded params (model axis) produce the same forward output."""
    params, _ = setup
    apply_eval = make_dt_apply(CFG)
    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(2)
    b = _batch(rng, b=4)
    args = (jnp.asarray(b["rtg"]), jnp.asarray(b["states"]),
            jnp.asarray(b["timesteps"]), jnp.asarray(b["task"]),
            jnp.asarray(b["actions"]))

    ref = apply_eval(params, *args).pred_actions
    with mesh:
        tp_params = shard_params(params, mesh, tensor_parallel=True)
        out = jax.jit(lambda p: apply_eval(p, *args).pred_actions)(tp_params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-6)


def test_train_gradients_match_torch_reference(rng):
    """Cross-framework pin of the training path: the masked-MSE loss and
    its FULL backward pass through the DT (conv stem, blocks incl. the
    no-MLP-residual quirk, heads, sigma_d action scaling) must match a
    torch-autograd restatement of the reference's _run_batch loss
    (train.py:83-94) on converted weights and an identical batch."""
    import torch
    from tests.test_dt import make_dt_state_dict, torch_dt_forward
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)

    gen = torch.Generator().manual_seed(3)
    sd = {k: v.detach().clone().requires_grad_(True)
          for k, v in make_dt_state_dict(gen).items()}
    # jnp.array COPY: converted numpy leaves share memory with the torch
    # tensors (no in-place mutation happens here, but don't rely on it).
    params = jax.tree.map(jnp.array, convert_dt_state_dict(
        {k: v.detach() for k, v in sd.items()}))

    b = _batch(rng, b=2, t=6)

    # --- torch reference loss + backward --------------------------------
    pa, pr = torch_dt_forward(
        sd, torch.from_numpy(b["rtg"]), torch.from_numpy(b["states"]),
        torch.from_numpy(b["timesteps"]), torch.from_numpy(b["task"]).long(),
        torch.from_numpy(b["actions"]), mode="norm")
    preds = torch.cat([pa, pr], dim=-1)
    targets = torch.cat([torch.from_numpy(b["actions"]),
                         torch.from_numpy(b["rtg"])], dim=-1)
    sel = torch.from_numpy(b["traj_masks"]).broadcast_to(preds.shape) > 0
    ref_loss = ((preds[sel] - targets[sel]) ** 2).mean()
    ref_loss.backward()
    ref_grads = convert_dt_state_dict(
        {k: v.grad.detach() for k, v in sd.items()})

    # --- jax loss + grad -------------------------------------------------
    apply_train = make_dt_apply(CFG, train=True)
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(apply_train, p, {k: jnp.asarray(v)
                                           for k, v in b.items()},
                          jax.random.PRNGKey(0)))(params)

    np.testing.assert_allclose(float(loss), float(ref_loss.detach()),
                               rtol=1e-5)
    flat_ref = jax.tree.leaves_with_path(ref_grads)
    flat_got = dict(jax.tree.leaves_with_path(grads))
    assert len(flat_ref) == len(flat_got) > 30
    for path, ref in flat_ref:
        got = np.asarray(flat_got[path])
        scale = max(1e-6, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            got, np.asarray(ref), rtol=5e-3, atol=5e-4 * scale,
            err_msg=str(path))


def test_optimizer_step_matches_torch_reference():
    """One full update cross-framework on IDENTICAL gradients: grad-norm
    clip 1.0 + AdamW (betas (0.9, 0.95), decoupled weight decay 0.1
    applied only to the configure_optimizers decay set — kernels but not
    biases/LN/embeddings, decision_transformer.py:166-209) must produce
    the same new parameters as torch.optim.AdamW with the reference's
    param groups and clip_grad_norm_.

    The same synthetic gradients feed both sides deliberately: at step 1
    Adam's update is ~ -lr*sign(g), so comparing after independent
    backwards would amplify epsilon-level gradient sign flips into full-lr
    param divergence (the backward itself is pinned separately in
    test_train_gradients_match_torch_reference)."""
    import torch
    from tests.test_dt import make_dt_state_dict
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict)

    LR = 1e-3
    gen = torch.Generator().manual_seed(4)
    sd = {k: v.detach().clone().requires_grad_(True)
          for k, v in make_dt_state_dict(gen).items()}
    # COPY to device arrays BEFORE opt.step(): converted numpy leaves
    # share memory with the torch tensors (np.asarray is zero-copy, and so
    # is jnp.asarray on CPU), and the in-place AdamW update would silently
    # mutate them (caught the hard way) — jnp.array forces the copy.
    params = jax.tree.map(jnp.array, convert_dt_state_dict(
        {k: v.detach() for k, v in sd.items()}))
    # Synthetic gradients with norm > 1 so the clip actually engages.
    ggen = torch.Generator().manual_seed(5)
    torch_grads = {k: 0.3 * torch.randn(v.shape, generator=ggen)
                   for k, v in sd.items()}
    for k, v in sd.items():
        v.grad = torch_grads[k].clone()

    # --- torch: clip + grouped AdamW -------------------------------------
    gnorm = torch.nn.utils.clip_grad_norm_(list(sd.values()), 1.0)
    assert float(gnorm) > 1.0  # the clip path is exercised
    # configure_optimizers' split: weights of Linear/Conv decay; biases,
    # LayerNorm params, and embedding tables don't.
    decay, no_decay = [], []
    for k, v in sd.items():
        is_w = k.endswith(".weight") and v.ndim >= 2 \
            and "embed.weight" not in k
        (decay if is_w else no_decay).append(v)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": 0.1},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.95))
    opt.step()
    ref_new = convert_dt_state_dict(
        {k: v.detach() for k, v in sd.items()})

    # --- jax: the make_optimizer structure at fixed LR, same grads ------
    import optax
    from dt4image_restoration_tpu.training.trainer import _decay_mask
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=LR, b1=0.9, b2=0.95, weight_decay=0.1,
                    mask=_decay_mask(params)))
    grads = jax.tree.map(
        jnp.asarray, convert_dt_state_dict(
            {k: v.numpy() for k, v in torch_grads.items()}))
    updates, _ = optimizer.update(grads, optimizer.init(params), params)
    new = optax.apply_updates(params, updates)

    flat_ref = dict(jax.tree.leaves_with_path(ref_new))
    for path, got in jax.tree.leaves_with_path(new):
        ref = np.asarray(flat_ref[path])
        np.testing.assert_allclose(
            np.asarray(got), ref, rtol=2e-4,
            atol=1e-5 * max(1e-3, float(np.abs(ref).max())),
            err_msg=str(path))
