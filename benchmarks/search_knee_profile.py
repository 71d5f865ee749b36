"""Attribution of the device-search batch-scaling plateau (VERDICT r4 #6):
why is search throughput flat from B=64 to B=128 trees?

Times the whole-search program and each component of one PUCB iteration
(inference/mcts_device.py body) with the same slope method knee_profile.py
uses (two loop lengths; the slope survives the tunnel RTT and dispatch
jitter):

  * full      — per-iteration slope of the WHOLE jitted search
                (`DeviceMCTS._search_all` at iterations LO vs HI)
  * policy    — the expansion policy step alone (2 DT forwards worth),
                B lanes, threaded through a fori_loop
  * expand    — the (K+1)-slot batched env step alone: `admm_step` with
                the shipped U-Net at (K+1)*B lanes — the search runs its
                conv workload at SIX TIMES the tree batch
  * rollout   — the greedy value rollout alone at B lanes (early-exit;
                with random weights episodes stop quickly, matching the
                regime every bench in RESULTS.md measures)
  * iter      — the shared `search_iter` body (policy+expand+rollout as
                one fused program, no tree bookkeeping)
  * bookkeeping = full - iter: selection while_loop, node-snapshot
                gather, child scatters, bank update, max-backprop

The hypothesis this tests: the plateau is the same U-Net conv compute
ceiling as the ADMM knee (RESULTS.md round-4) reached EARLY — the
expansion runs convs at effective batch 6B, so tree-B=16 already puts
~96 slices through the conv stack per step and B>=64 is past the ~128
conv-batch knee. If expand+rollout dominate `full` and their per-lane
cost at 6B matches knee_profile's per-slice U-Net cost at the same
effective batch, the plateau is device MFU, not search bookkeeping.

Run on TPU:  python benchmarks/search_knee_profile.py
             SEARCH_BATCHES=16,64,128 to override the sweep.
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BATCHES = tuple(int(b) for b in os.environ.get(
    "SEARCH_BATCHES", "16,64,128").split(","))
ITER_LO, ITER_HI = 4, 12     # whole-search slope points (search iterations)
LOOP_LO, LOOP_HI = 4, 12     # component fori_loop slope points
MAX_TIMESTEPS = 30
IMAGE_SIZE = 128
REPS = 3


def _slope(wall, lo, hi):
    return (wall(hi) - wall(lo)) / (hi - lo)


def _timed(fetch_fn, reps=REPS):
    fetch_fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch_fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.env.pnp import admm_step, reset_from_mat
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    results = {"device": str(jax.devices()[0].device_kind),
               "tpu_unreachable": tpu_unreachable,
               "iter_points": [ITER_LO, ITER_HI],
               "max_timesteps": MAX_TIMESTEPS}

    den_params = convert_unet_state_dict(random_unet_state_dict(0))
    den_model = UNetDenoiser()

    def denoise(img, sigma):
        return den_model.apply({"params": den_params}, img, sigma)

    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                      image_size=IMAGE_SIZE)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        dt_params = jax.device_get(init_dt_params(cfg, seed=0))
    dt_apply = make_dt_apply(cfg)

    def record(i):
        mat = dict(make_mat_record(size=IMAGE_SIZE, seed=i))
        mat["x0"] = np.clip(mat["x0"], 0, None)
        return ((None, np.full((1, 1), 0.6, np.float32), None,
                 np.asarray([2], np.int32)), mat)

    def scalar_fetch(x):
        return float(np.asarray(jnp.sum(
            jax.tree.leaves(x)[0].astype(jnp.float32))))

    for B in BATCHES:
        tag = f"b{B}"
        recs = [record(i) for i in range(B)]
        mats = {k: np.concatenate([np.asarray(r[1][k]) for r in recs])
                for k in ("x0", "y0", "mask", "gt")}
        env0 = reset_from_mat(mats)
        rtg0 = jnp.full((B,), 0.6, jnp.float32)
        task = jnp.full((B,), 2, jnp.int32)

        # --- whole-search slope over iteration count ----------------------
        def search_time(n_iters):
            m = DeviceMCTS(
                dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                model_cfg=cfg, value_fn=lambda x: 0.0,
                cfg=MCTSConfig(iterations=n_iters,
                               max_timesteps=MAX_TIMESTEPS))
            K = m.cfg.n_children
            z_all = jnp.asarray(np.stack(
                [np.random.default_rng(s).standard_normal((n_iters, 2 * K))
                 for s in range(B)], axis=1).astype(np.float32))
            root_bufs = m._seed_bufs(
                env0.x_real.reshape(B, -1), rtg0, task)

            def fetch():
                out = m._search_all(m.dt_params, root_bufs, env0, rtg0,
                                    z_all)
                return float(np.asarray(out[0][0]))
            return _timed(fetch)

        t_lo, t_hi = search_time(ITER_LO), search_time(ITER_HI)
        full_ms = 1e3 * (t_hi - t_lo) / (ITER_HI - ITER_LO)
        results[f"full_iter_ms_{tag}"] = round(full_ms, 3)
        print(f"[search-knee] {tag} full: {full_ms:.2f} ms/iter",
              file=sys.stderr, flush=True)

        # --- shared search_iter body (policy+expand+rollout, no tree) -----
        m = DeviceMCTS(dt_apply=dt_apply, dt_params=dt_params,
                       denoise=denoise, model_cfg=cfg,
                       value_fn=lambda x: 0.0,
                       cfg=MCTSConfig(iterations=ITER_HI,
                                      max_timesteps=MAX_TIMESTEPS))
        K = m.cfg.n_children
        root_bufs = m._seed_bufs(env0.x_real.reshape(B, -1), rtg0, task)
        z_sig = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, K)), jnp.float32)
        z_mu = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, K)), jnp.float32)
        t0_vec = jnp.zeros((B,), jnp.int32)

        def iter_body(c, _):
            bufs, env, prtg = c
            (_, pred_rtg, _, stepped, new_bufs, final_x, _
             ) = m._search_iter_fn(m.dt_params, bufs, t0_vec, env, prtg,
                                   z_sig, z_mu)
            slot0 = jax.tree.map(
                lambda x: x.reshape((B, K + 1) + x.shape[1:])[:, 0],
                stepped)
            return (new_bufs, slot0, pred_rtg), jnp.sum(final_x)

        def iter_wall(n):
            # length is a static arg of the scan -> jit per n (2 compiles).
            fn = jax.jit(lambda b, e, p: jax.lax.scan(
                iter_body, (b, e, p), None, length=n)[1][-1])
            return _timed(lambda: float(np.asarray(
                fn(root_bufs, env0, rtg0))))

        iter_ms = 1e3 * _slope(iter_wall, LOOP_LO, LOOP_HI)
        results[f"iter_ms_{tag}"] = round(iter_ms, 3)

        # --- policy step alone --------------------------------------------
        from dt4image_restoration_tpu.inference.evaluator import (
            make_policy_step)
        policy_fn = make_policy_step(dt_apply, cfg)

        def policy_body(c, _):
            bufs = c
            _, _, pred_rtg, bufs_upd = policy_fn(dt_params, bufs, t0_vec)
            return bufs_upd, jnp.sum(pred_rtg)

        def policy_wall(n):
            fn = jax.jit(lambda b: jax.lax.scan(
                policy_body, b, None, length=n)[1][-1])
            return _timed(lambda: float(np.asarray(fn(root_bufs))))

        policy_ms = 1e3 * _slope(policy_wall, LOOP_LO, LOOP_HI)
        results[f"policy_ms_{tag}"] = round(policy_ms, 3)

        # --- (K+1)-slot expansion env step alone --------------------------
        tiled = jax.tree.map(lambda x: jnp.repeat(x, K + 1, axis=0), env0)
        exp_action = {"T": jnp.zeros(((K + 1) * B,), jnp.float32),
                      "sigma_d": jnp.full(((K + 1) * B,), 0.06),
                      "mu": jnp.full(((K + 1) * B,), 0.3)}

        def expand_body(c, _):
            env = c
            new = admm_step(denoise, env, exp_action)
            return new.replace(done=jnp.zeros_like(new.done)), \
                jnp.sum(new.x)

        def expand_wall(n):
            fn = jax.jit(lambda e: jax.lax.scan(
                expand_body, e, None, length=n)[1][-1])
            return _timed(lambda: float(np.asarray(fn(tiled))))

        expand_ms = 1e3 * _slope(expand_wall, LOOP_LO, LOOP_HI)
        results[f"expand_ms_{tag}"] = round(expand_ms, 3)
        results[f"expand_lanes_{tag}"] = (K + 1) * B

        # --- greedy value rollout alone -----------------------------------
        from dt4image_restoration_tpu.inference.evaluator import (
            greedy_rollout)
        adict0 = {"T": jnp.zeros((B,)), "sigma_d": jnp.full((B,), 0.06),
                  "mu": jnp.full((B,), 0.3)}

        def rollout_body(c, _):
            env, prtg = c
            final, _, ep, _ = greedy_rollout(
                dt_apply, denoise, cfg, dt_params, env, root_bufs,
                adict0, prtg, MAX_TIMESTEPS, t0_vec)
            # Feed the terminal image back as the next x so the loop
            # carries a real dependence (anti-hoisting).
            return (env.replace(x=final.x), prtg + 1e-6), jnp.sum(final.x)

        def rollout_wall(n):
            fn = jax.jit(lambda e, p: jax.lax.scan(
                rollout_body, (e, p), None, length=n)[1][-1])
            return _timed(lambda: float(np.asarray(fn(env0, rtg0))))

        rollout_ms = 1e3 * _slope(rollout_wall, LOOP_LO, LOOP_HI)
        results[f"rollout_ms_{tag}"] = round(rollout_ms, 3)

        book_ms = full_ms - iter_ms
        results[f"bookkeeping_ms_{tag}"] = round(book_ms, 3)
        results[f"component_sum_ms_{tag}"] = round(
            policy_ms + expand_ms + rollout_ms, 3)
        # Implied full-30-iteration search wall per image at this B.
        results[f"s_per_image_implied_{tag}"] = round(
            full_ms * 30 / 1e3 / B, 4)
        print(f"[search-knee] {tag} iter={iter_ms:.2f} "
              f"policy={policy_ms:.2f} expand={expand_ms:.2f} "
              f"rollout={rollout_ms:.2f} book={book_ms:.2f} ms",
              file=sys.stderr, flush=True)

    print(json.dumps({"metric": "search_knee_attribution", **results}))


if __name__ == "__main__":
    main()
