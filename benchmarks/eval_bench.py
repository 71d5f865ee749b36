"""Extended benchmarks for the DT-driven inference configs
(BASELINE.json configs 2-4): greedy eval, flex decode, MCTS — on synthetic
CSMRI data with converter-shaped random weights (published checkpoints are
download-gated; weights do not change the compute cost).

Run on TPU:  python benchmarks/eval_bench.py
Prints one JSON line with per-config throughput.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_IMAGES = 7        # the reference's per-directory reporting unit
MAX_T = 30
SEARCH_ITERS = 30
IMAGE_SIZE = 128
TREE_BATCHES = (16, 32)
EVAL_BATCHES = (16, 32, 64, 128)
KNEE_BATCHES = (64, 128)  # node-dtype sweep past the f32 knee


def main() -> None:
    import jax

    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    _, tpu_unreachable = ensure_live_backend()

    from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
    from dt4image_restoration_tpu.data import make_mat_record
    from dt4image_restoration_tpu.inference import Evaluator
    from dt4image_restoration_tpu.inference.mcts import MCTS
    from dt4image_restoration_tpu.models import UNetDenoiser
    from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_unet_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    results = {"platform": jax.devices()[0].platform,
               "tpu_unreachable": tpu_unreachable}

    t_start = time.perf_counter()

    def _mark(section):
        # Live stderr progress: a mid-run tunnel hang is otherwise
        # indistinguishable from a long compile (2026-08-20 lesson).
        dt = time.perf_counter() - t_start
        print(f"[eval-bench] {section} ({dt:.0f}s)",
              file=sys.stderr, flush=True)

    den_params = convert_unet_state_dict(random_unet_state_dict(0))
    den_model = UNetDenoiser()
    denoise = lambda img, sig: den_model.apply({"params": den_params}, img,
                                               sig)

    def records(n):
        out = []
        for i in range(n):
            mat = dict(make_mat_record(size=IMAGE_SIZE, seed=i))
            # Dataset semantics: policy state from the UNCLIPPED x0, env
            # record clipped (datasets.py parity).
            states = mat["x0"][..., 0].reshape(1, -1).astype(np.float32)
            mat["x0"] = np.clip(mat["x0"], 0, None)
            out.append(((states, np.full((1, 1), 0.6, np.float32),
                         np.zeros(3, np.float32),
                         np.asarray([2], np.int32)), mat))
        return out

    _mark("greedy eval")
    # --- config 2: greedy DT eval (7-image batch like the reference's
    # reporting unit, eval.py:137-143) ------------------------------------
    cfg = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                      image_size=IMAGE_SIZE)
    dt_params = init_dt_params(cfg, seed=0)
    dt_apply = make_dt_apply(cfg)
    ev = Evaluator(dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                   cfg=cfg, max_timesteps=MAX_T)
    recs = records(N_IMAGES)
    ev.evaluate_records(recs)  # compile
    t0 = time.perf_counter()
    m = ev.evaluate_records(recs)
    dt_wall = time.perf_counter() - t0
    results["greedy_eval_7img_s"] = round(dt_wall, 3)
    results["greedy_eval_images_per_sec"] = round(N_IMAGES / dt_wall, 2)
    results["greedy_eval_mean_episode_len"] = float(
        np.mean(m["episode_len"]))

    _mark("flex decode")
    # --- config 3: flex decode (same program, flex head mapping) ---------
    cfg_f = ModelConfig(block_size=18, n_embeds=6, mode="flex",
                        image_size=IMAGE_SIZE)
    ev_f = Evaluator(dt_apply=make_dt_apply(cfg_f),
                     dt_params=init_dt_params(cfg_f, seed=0),
                     denoise=denoise, cfg=cfg_f, max_timesteps=MAX_T,
                     eval_type="flex")
    recs_f = records(N_IMAGES)
    ev_f.evaluate_records(recs_f)
    t0 = time.perf_counter()
    ev_f.evaluate_records(recs_f)
    results["flex_eval_7img_s"] = round(time.perf_counter() - t0, 3)

    _mark("host MCTS")
    # --- config 4: MCTS (30 search iterations) ---------------------------
    from dt4image_restoration_tpu.inference.mcts import BatchedMCTS
    mcts = MCTS(dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                model_cfg=cfg, cfg=MCTSConfig(iterations=SEARCH_ITERS),
                value_fn=proxy_value_fn)
    rec = records(1)[0]
    mcts.run(rec, seed=0)  # compile
    t0 = time.perf_counter()
    mcts.run(rec, seed=1)
    results["mcts_30iter_s"] = round(time.perf_counter() - t0, 3)

    _mark("batched host MCTS")
    # Lockstep trees: a whole directory's images in one batched search.
    bm = BatchedMCTS(dt_apply=dt_apply, dt_params=dt_params,
                     denoise=denoise, model_cfg=cfg,
                     cfg=MCTSConfig(iterations=SEARCH_ITERS),
                     value_fn=proxy_value_fn)
    recs7 = records(N_IMAGES)
    bm.run_batch(recs7)  # compile (new batch shape)
    t0 = time.perf_counter()
    bm.run_batch(recs7, seeds=list(range(N_IMAGES)))
    wall = time.perf_counter() - t0
    results["mcts_batched_7img_s"] = round(wall, 3)
    results["mcts_batched_s_per_image"] = round(wall / N_IMAGES, 3)

    # Device-resident tree: the WHOLE 30-iteration search for all 7 images
    _mark("device MCTS")
    # is ONE XLA program (inference/mcts_device.py).
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
    dm = DeviceMCTS(dt_apply=dt_apply, dt_params=dt_params,
                    denoise=denoise, model_cfg=cfg,
                    cfg=MCTSConfig(iterations=SEARCH_ITERS),
                    value_fn=proxy_value_fn)
    dm.run_batch(recs7)  # compile
    t0 = time.perf_counter()
    dm.run_batch(recs7, seeds=list(range(N_IMAGES)))
    wall = time.perf_counter() - t0
    results["mcts_device_7img_s"] = round(wall, 3)
    results["mcts_device_s_per_image"] = round(wall / N_IMAGES, 3)

    # Tree-batch scaling (memory: ~125 MB/tree of node states + buffers).
    for b in TREE_BATCHES:
        recs_b = records(b)
        dm.run_batch(recs_b)  # compile (new batch shape)
        t0 = time.perf_counter()
        dm.run_batch(recs_b, seeds=list(range(b)))
        results[f"mcts_device_s_per_image_b{b}"] = round(
            (time.perf_counter() - t0) / b, 3)

    _mark("device MCTS + ARNIQA")
    # Device search with the full ARNIQA scorer (ResNet-50 x2 scales)
    # embedded in the program — the production value model (random weights;
    # compute cost is weight-independent).
    from dt4image_restoration_tpu.models.arniqa import (
        convert_arniqa_state_dict, make_value_fn_jax)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_arniqa_state_dict)
    sd = random_arniqa_state_dict(0)
    am = DeviceMCTS(dt_apply=dt_apply, dt_params=dt_params,
                    denoise=denoise, model_cfg=cfg,
                    cfg=MCTSConfig(iterations=SEARCH_ITERS),
                    value_fn=proxy_value_fn,
                    value_fn_jax=make_value_fn_jax(
                        convert_arniqa_state_dict(sd)))
    am.run_batch(recs7)  # compile
    t0 = time.perf_counter()
    am.run_batch(recs7, seeds=list(range(N_IMAGES)))
    results["mcts_device_arniqa_s_per_image"] = round(
        (time.perf_counter() - t0) / N_IMAGES, 3)

    _mark("full-30 episodes")
    # Full-length episodes — the trained-policy regime. Random weights stop
    # at t~2 (T > 0.5 fires early), flattering the numbers above; pin the
    # stop head low (sigmoid(-8) ~ 0: column 0 = T in norm mode,
    # decision_transformer.py _transform_actions) so every episode runs all
    # 30 steps, and remeasure on the SAME compiled programs (only weights
    # change).
    full_params = jax.tree.map(np.array, dt_params)
    full_params["predict_action"]["kernel"][:, 0] = 0.0
    full_params["predict_action"]["bias"][0] = -8.0

    ev.dt_params = full_params
    m = ev.evaluate_records(recs)  # warm (same program)
    t0 = time.perf_counter()
    m = ev.evaluate_records(recs)
    results["greedy_eval_full30_7img_s"] = round(
        time.perf_counter() - t0, 3)
    results["greedy_eval_full30_mean_episode_len"] = float(
        np.mean(m["episode_len"]))

    _mark("guided-eval batch scaling")
    # Guided-eval batch scaling at full episode length (the honest
    # throughput ceiling for the DT-guided path; the Evaluator passes
    # params per call, so the swap is fully effective).
    for b in EVAL_BATCHES:
        recs_b = records(b)
        ev.evaluate_records(recs_b)  # compile (new batch shape)
        t0 = time.perf_counter()
        ev.evaluate_records(recs_b)
        results[f"greedy_eval_full30_images_per_sec_b{b}"] = round(
            b / (time.perf_counter() - t0), 2)

    _mark("device MCTS full-30")
    # A fresh instance (not a dt_params swap): MCTS buffer-seeding programs
    # bake the construction-time weights (see mcts.py _seed_bufs note).
    dm_full = DeviceMCTS(dt_apply=dt_apply, dt_params=full_params,
                         denoise=denoise, model_cfg=cfg,
                         cfg=MCTSConfig(iterations=SEARCH_ITERS),
                         value_fn=proxy_value_fn)
    dm_full.run_batch(recs7)  # compile
    t0 = time.perf_counter()
    r_f32 = dm_full.run_batch(recs7, seeds=list(range(N_IMAGES)), verbose=False)
    results["mcts_device_full30_s_per_image"] = round(
        (time.perf_counter() - t0) / N_IMAGES, 3)

    _mark("bf16 quality deltas")
    # bf16 guided-path QUALITY — the reference's autocast surface applied
    # to inference (main.py:37-40, env.py:52): identical full-30 weights,
    # bfloat16 compute in the DT and the U-Net prior; report the PSNR
    # delta vs the f32 runs above (throughput for bf16 is in bench.py).
    import jax.numpy as jnp
    cfg16 = ModelConfig(block_size=18, n_embeds=9, mode="norm",
                        dtype="bfloat16", image_size=IMAGE_SIZE)
    den16 = UNetDenoiser(dtype=jnp.bfloat16)

    def denoise16(img, sig):
        return den16.apply({"params": den_params}, img, sig)

    ev16 = Evaluator(dt_apply=make_dt_apply(cfg16), dt_params=full_params,
                     denoise=denoise16, cfg=cfg16, max_timesteps=MAX_T)
    m16 = ev16.evaluate_records(recs)
    results["greedy_eval_full30_bf16_psnr_delta_db"] = round(
        float(np.mean(m16["reward"]) - np.mean(m["reward"])), 4)

    dm16 = DeviceMCTS(dt_apply=make_dt_apply(cfg16), dt_params=full_params,
                      denoise=denoise16, model_cfg=cfg16,
                      cfg=MCTSConfig(iterations=SEARCH_ITERS),
                      value_fn=proxy_value_fn)
    r_16 = dm16.run_batch(recs7, seeds=list(range(N_IMAGES)), verbose=False)
    results["mcts_device_full30_bf16_psnr_delta_db"] = round(
        float(np.mean(r_16) - np.mean(r_f32)), 4)

    # bf16 NODE STORAGE (node_dtype='bfloat16'): halves the search's
    # dominant HBM cost (per-node x/z/u, ~59 MB/tree f32), lifting the
    # batch ceiling past the f32 knee (B=64 in round 2). Compute stays
    # f32; report quality delta at B=7 and the extended knee sweep, plus
    # device peak memory per variant where the backend exposes it.
    def peak_mb():
        stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
        return (round(stats["peak_bytes_in_use"] / 2**20)
                if stats and "peak_bytes_in_use" in stats else None)

    dmn_full = DeviceMCTS(dt_apply=dt_apply, dt_params=full_params,
                          denoise=denoise, model_cfg=cfg,
                          cfg=MCTSConfig(iterations=SEARCH_ITERS),
                          value_fn=proxy_value_fn, node_dtype="bfloat16")
    r_n16 = dmn_full.run_batch(recs7, seeds=list(range(N_IMAGES)), verbose=False)
    results["mcts_device_full30_nodebf16_psnr_delta_db"] = round(
        float(np.mean(r_n16) - np.mean(r_f32)), 4)

    _mark("node-dtype knee sweep")
    # Knee sweep in the same regime as the b16/32 rows above (random
    # weights, early-stop episodes): f32 nodes vs bf16 nodes at B=64/128.
    dmn = DeviceMCTS(dt_apply=dt_apply, dt_params=dt_params,
                     denoise=denoise, model_cfg=cfg,
                     cfg=MCTSConfig(iterations=SEARCH_ITERS),
                     value_fn=proxy_value_fn, node_dtype="bfloat16")
    for tag, searcher in (("f32", dm), ("nodebf16", dmn)):
        for b in KNEE_BATCHES:
            recs_b = records(b)
            try:
                searcher.run_batch(recs_b, verbose=False)  # compile
                t0 = time.perf_counter()
                searcher.run_batch(recs_b, seeds=list(range(b)),
                                   verbose=False)
                results[f"mcts_device_{tag}_s_per_image_b{b}"] = round(
                    (time.perf_counter() - t0) / b, 3)
            except Exception as e:  # OOM at this batch: record and stop
                results[f"mcts_device_{tag}_s_per_image_b{b}"] = (
                    f"failed: {type(e).__name__}")
                break
        if (pm := peak_mb()) is not None:
            # peak_bytes_in_use is a PROCESS-LIFETIME high-water mark, so
            # per-variant attribution is only valid for the first sweep;
            # later variants report the cumulative max (named as such).
            key = (f"device_peak_mb_after_{tag}_sweep" if tag == "f32"
                   else "device_peak_mb_cumulative")
            results[key] = pm

    print(json.dumps(results))


if __name__ == "__main__":
    main()
