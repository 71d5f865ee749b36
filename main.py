"""CLI for the TPU-native DT4Image_Restoration framework.

Command surface mirrors the reference (/root/reference/main.py:133-155 and
scripts.sh):

    python main.py --block_size 18 train --batch_size 48 --save_every 1 \
        --max_epochs 5 [--ddp] [--compile]
    python main.py --block_size 18 --n_embeds 9 eval --rtg 10 --max_timesteps 30
    python main.py --block_size 18 --n_embeds 6 flex --max_timesteps 30
    python main.py --block_size 18 --n_embeds 9 mcts --rtg 5 --max_timesteps 30

``--ddp`` and ``--compile`` are accepted for CLI parity but are no-ops: every
step is already jit-compiled and sharded over the ICI mesh (the JAX
equivalents are always on). Checkpoint/data path defaults match the
reference layout (checkpoints/model_experiment_{1,2}.pt,
evaluation/pretrained/unet-nm.pt, evaluation/image_dir/vanilla/...);
published PyTorch checkpoints are converted on load.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

logging.basicConfig(filename="outputs.log", level=logging.DEBUG,
                    format="%(asctime)s - %(name)s - %(levelname)s - "
                           "%(message)s")
# The reference's DEBUG root level (main.py:16-18) predates jax: at DEBUG,
# jax's internal loggers (compiler, dispatch, cache-key) emit ~MB per run
# into outputs.log/stderr — enough to fill a 64 KB subprocess pipe and
# deadlock multi-process rendezvous. Our own loggers stay at DEBUG.
for _noisy in ("jax", "absl", "orbax"):
    logging.getLogger(_noisy).setLevel(logging.WARNING)
logger = logging.getLogger("dt4ir_tpu")

from dt4image_restoration_tpu.config import EVAL_DIR_TOKENS  # noqa: E402

EVAL_DIRS_9 = [f"evaluation/image_dir/vanilla/{t}/" for t in
               EVAL_DIR_TOKENS]
EVAL_DIRS_6 = EVAL_DIRS_9[:6]
FLEX_RTGS = [1.5, 3, 3.5, 4, 4.5]  # main.py:198


# Checkpoint loaders live in the package (shared with tools/); the CLI
# names remain as thin aliases.
from dt4image_restoration_tpu.utils.loaders import (  # noqa: E402
    load_denoiser as _load_denoiser, load_dt as _load_dt)


def cmd_train(args) -> None:
    import jax
    import jax.numpy as jnp
    from dt4image_restoration_tpu.config import (
        ModelConfig, TrainerConfig, tasks_for_experiment)
    from dt4image_restoration_tpu.data.datasets import TrainingDataset
    from dt4image_restoration_tpu.models.decision_transformer import (
        init_dt_params, make_dt_apply)
    from dt4image_restoration_tpu.training import (
        TrainState, Trainer, make_mesh, make_optimizer, make_train_step,
        make_watch_grad_fn, shard_batch)

    tasks, (min_rtg, max_rtg) = tasks_for_experiment(args.training_type)
    cfg = ModelConfig(block_size=args.block_size, n_embeds=len(tasks),
                      mode="flex" if args.training_type == "flexible"
                      else "norm", dtype=args.dtype)
    tcfg = TrainerConfig(batch_size=args.batch_size,
                         max_epochs=args.max_epochs,
                         save_every=args.save_every,
                         checkpoint_dir=args.checkpoint_dir,
                         # wandb like the reference (train.py:136-138) but
                         # gated on the env var instead of a hardcoded key.
                         log_wandb=bool(os.environ.get("WANDB_API_KEY")))

    dataset = TrainingDataset(
        block_size=cfg.context_length, data_dir=args.data_dir,
        action_dim=cfg.action_dim, state_file_path=args.state_file,
        tasks=tasks, min_rtg=min_rtg, max_rtg=max_rtg,
        preload=args.preload_data)
    # batch_size is PER PROCESS (the reference's per-GPU batch under DDP);
    # the global batch is batch_size * process_count.
    n_proc = jax.process_count()
    steps_per_epoch = max((len(dataset) // n_proc) // tcfg.batch_size, 1)
    max_steps = steps_per_epoch * tcfg.max_epochs

    params = init_dt_params(cfg, seed=tcfg.seed)
    optimizer = make_optimizer(tcfg, max_steps, params)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32))
    # Data-parallel over as many devices as the global batch divides into
    # evenly (all processes' devices — jax.devices() is global).
    import math
    n_data = math.gcd(tcfg.batch_size * n_proc, len(jax.devices()))
    mesh = make_mesh(n_data=n_data, n_model=1)
    step_fn = make_train_step(make_dt_apply(cfg, train=True), optimizer)

    os.makedirs(tcfg.checkpoint_dir, exist_ok=True)
    trainer = Trainer(
        train_step=step_fn, state=state, config=tcfg,
        batches=lambda epoch: dataset.batches(
            tcfg.batch_size, seed=tcfg.seed + epoch,
            shard_index=jax.process_index(), num_shards=n_proc),
        shard=lambda b: shard_batch(b, mesh),
        checkpoint_dir=tcfg.checkpoint_dir,
        resume_from=args.resume,
        async_save=args.async_save,
        keep_last=args.keep_last,
        # wandb.watch(model) equivalent (reference train.py:138); only
        # called on watch steps when wandb is active.
        watch_grad_fn=make_watch_grad_fn(make_dt_apply(cfg, train=True)))
    with mesh:
        trainer.train()
    print("Training complete; last losses:", trainer.last_losses)


def _eval_mesh():
    """Shard eval image batches over all local devices when more than one
    is attached (SURVEY.md parallelism checklist item b)."""
    import jax
    if len(jax.devices()) <= 1:
        return None
    from dt4image_restoration_tpu.training import make_mesh
    return make_mesh(n_data=len(jax.devices()), n_model=1)


def _make_evaluator(args, mode: str, ckpt: str, rtg_target, eval_type):
    from dt4image_restoration_tpu.config import ModelConfig
    from dt4image_restoration_tpu.inference import Evaluator
    rtg_target = float(rtg_target)  # validate before any model loading
    cfg = ModelConfig(block_size=args.block_size, n_embeds=args.n_embeds,
                      mode=mode, dtype=args.dtype)
    dt_apply, dt_params = _load_dt(cfg, ckpt)
    denoise = _load_denoiser(args.denoiser_ckpt, args.dtype,
                             getattr(args, "unet_packed", "none"))
    return Evaluator(dt_apply=dt_apply, dt_params=dt_params,
                     denoise=denoise, cfg=cfg,
                     max_timesteps=args.max_timesteps or 30,
                     rtg_target=float(rtg_target), eval_type=eval_type,
                     mesh=_eval_mesh())


def _existing_dirs(dirs):
    """Filter to directories that exist AND contain .mat records; warn
    about the skipped ones and fail loudly (like the reference,
    main.py:205) when NONE qualify — a silent 0-image evaluation or a
    deflated average (empty dirs contribute nothing to the total but
    would widen the divisor) would be worse than the crash."""
    import glob
    existing = [d for d in dirs
                if os.path.isdir(d) and glob.glob(os.path.join(d, "*.mat"))]
    for d in dirs:
        if d not in existing:
            print(f"WARNING: skipping missing/empty eval directory {d!r}",
                  file=sys.stderr)
    if not existing:
        raise FileNotFoundError(
            f"none of the evaluation directories exist (with .mat "
            f"records): {dirs}")
    return existing


def _default_dirs(args, base_dirs):
    """Explicit --data_dirs win; otherwise the reference's default dir
    list, optionally re-rooted by --data_root (where tools/make_dataset.py
    --eval writes the same layout)."""
    if args.data_dirs:
        return args.data_dirs
    root = getattr(args, "data_root", None) or "."
    return [os.path.join(root, d) for d in base_dirs]


def cmd_eval(args) -> None:
    evaluator = _make_evaluator(args, "norm", args.checkpoint, args.rtg,
                                "norm")
    evaluator.run(_existing_dirs(_default_dirs(args, EVAL_DIRS_9)))


def cmd_flex(args) -> None:
    from dt4image_restoration_tpu.config import ModelConfig
    from dt4image_restoration_tpu.inference import Evaluator
    dirs = _existing_dirs(_default_dirs(args, EVAL_DIRS_6))
    # Load the model/denoiser once; the 5 RTG-target evaluators share one
    # compiled program (reference reloads per target, main.py:200-203).
    cfg = ModelConfig(block_size=args.block_size, n_embeds=args.n_embeds,
                      mode="flex", dtype=args.dtype)
    dt_apply, dt_params = _load_dt(cfg, args.checkpoint)
    denoise = _load_denoiser(args.denoiser_ckpt, args.dtype,
                             getattr(args, "unet_packed", "none"))
    for rtg in FLEX_RTGS:
        evaluator = Evaluator(
            dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
            cfg=cfg, max_timesteps=args.max_timesteps or 30,
            rtg_target=float(rtg), eval_type="flex", mesh=_eval_mesh())
        print(f"Test for reward increment: {rtg}\n")
        # Average over the directories actually evaluated (a partial
        # layout must not deflate the average; the reference would crash
        # on the first missing dir instead, main.py:205).
        total = evaluator.run(dirs)
        print(f"\nAverage increment: {total / len(dirs)}\n")


def cmd_mcts(args) -> None:
    from dt4image_restoration_tpu.config import MCTSConfig, ModelConfig
    from dt4image_restoration_tpu.data.datasets import EvaluationDataset
    from dt4image_restoration_tpu.inference.mcts import MCTS, BatchedMCTS
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS

    rtg_target = float(args.rtg)  # validate before any model loading

    cfg = ModelConfig(block_size=args.block_size, n_embeds=args.n_embeds,
                      mode="norm", dtype=args.dtype)
    dt_apply, dt_params = _load_dt(cfg, args.checkpoint)
    denoise = _load_denoiser(args.denoiser_ckpt, args.dtype,
                             getattr(args, "unet_packed", "none"))

    value_fn_jax = None
    if args.arniqa_ckpt and os.path.exists(args.arniqa_ckpt):
        import jax.numpy as jnp
        import torch
        from dt4image_restoration_tpu.models.arniqa import (
            convert_arniqa_state_dict, make_value_fn, make_value_fn_jax)
        variables = convert_arniqa_state_dict(
            torch.load(args.arniqa_ckpt, map_location="cpu"))
        # The reference's autocast ctx also wraps ARNIQA scoring (env.py:52).
        vdtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        value_fn = make_value_fn(variables, dtype=vdtype)
        value_fn_jax = make_value_fn_jax(variables, dtype=vdtype)
    else:
        from dt4image_restoration_tpu.models.arniqa import proxy_value_fn
        print("WARNING: no ARNIQA checkpoint; using the documented no-ref "
              "proxy scorer", file=sys.stderr)
        value_fn = proxy_value_fn

    backend = "sequential" if args.sequential else args.tree_backend
    search_cfg = MCTSConfig(max_timesteps=args.max_timesteps or 30,
                            seed=args.seed)
    common = dict(dt_apply=dt_apply, dt_params=dt_params, denoise=denoise,
                  model_cfg=cfg, cfg=search_cfg, value_fn=value_fn)
    if backend == "sequential":
        mcts = MCTS(**common)
    elif backend == "host":
        mcts = BatchedMCTS(mesh=_eval_mesh(), **common)
    else:  # 'device': the whole search is one XLA program per directory
        mcts = DeviceMCTS(mesh=_eval_mesh(), value_fn_jax=value_fn_jax,
                          node_dtype=args.node_dtype, **common)
    dirs = _existing_dirs(_default_dirs(args, EVAL_DIRS_9))
    total = 0.0
    if args.sequential:
        for path in dirs:
            ds = EvaluationDataset(path, rtg_target=rtg_target,
                                   kind="optimal")
            for i in range(len(ds)):
                total += mcts.run(ds[i], seed=args.seed + i)
    else:
        # All directories' trees advance in lockstep, chunked at the
        # measured throughput knee (benchmarks/RESULTS.md: ~B=16) so every
        # chunk shares one compiled program shape and one dispatch.
        records = []
        for path in dirs:
            ds = EvaluationDataset(path, rtg_target=rtg_target,
                                   kind="optimal")
            records += [(ds[i], args.seed + i) for i in range(len(ds))]
        b = args.search_batch
        import jax
        if isinstance(mcts, DeviceMCTS) and mcts.mesh is not None \
                and jax.process_count() > 1:
            # Pod: the device backend shards the (record, seed) list
            # across processes (disjoint work — the inference analogue of
            # cmd_train's shard_index/num_shards) and reassembles the
            # global rewards, so every process prints the
            # single-process-identical per-tree lines. Host-tree backends
            # fall through to the plain loop, whose run_batch raises the
            # use-the-device-backend guidance error on pods.
            rewards = mcts.run_global_batches(
                [r for r, _ in records], [s for _, s in records],
                batch_size=b)
            for v in rewards:
                print("MCTS Reward: ", float(v))
            total = float(sum(rewards))
        else:
            for off in range(0, len(records), b):
                chunk = records[off:off + b]
                total += sum(mcts.run_batch([r for r, _ in chunk],
                                            seeds=[s for _, s in chunk]))
    print("Total MCTS reward:", total)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Decision Transformer for PnP-ADMM CSMRI")
    p.add_argument("--block_size", type=int, required=True)
    p.add_argument("--n_embeds", type=int, default=9)
    p.add_argument("--platform", default="default",
                   choices=["default", "cpu"],
                   help="'default' uses the configured jax backend (TPU "
                        "under the driver) after a bounded health probe — "
                        "a dead axon tunnel makes jax.devices() HANG, so "
                        "the CLI fails fast with guidance instead; 'cpu' "
                        "switches to the CPU backend explicitly (there is "
                        "deliberately NO silent fallback on this "
                        "production surface)")
    sub = p.add_subparsers(dest="mode", required=True)

    t = sub.add_parser("train")
    t.add_argument("--batch_size", type=int, required=True)
    t.add_argument("--ddp", action="store_true",
                   help="accepted for parity; sharding is always on")
    t.add_argument("--compile", action="store_true",
                   help="accepted for parity; jit is always on")
    t.add_argument("--save_every", type=int, required=True)
    t.add_argument("--max_epochs", type=int, required=True)
    t.add_argument("--training_type", default="optimal",
                   choices=["optimal", "flexible"])
    t.add_argument("--data_dir", default="dataset/data/new_json_folder")
    t.add_argument("--state_file", default="dataset/data/data_1_410.h5")
    t.add_argument("--checkpoint_dir", default="checkpoints")
    t.add_argument("--resume", default=None,
                   help="path of a state_latest checkpoint to resume from")
    t.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype (bfloat16 = the reference's autocast)")
    t.add_argument("--keep_last", type=int, default=None,
                   help="retain only the newest N model_<epoch> "
                        "checkpoints (default: keep all, like the "
                        "reference); state_latest is never removed")
    t.add_argument("--async_save", action="store_true",
                   help="epoch checkpoints on a background writer (the "
                        "loop never stalls on checkpoint IO; preemption "
                        "saves stay synchronous)")
    t.add_argument("--preload_data", action="store_true",
                   help="cache parsed trajectories + uint8 states once and "
                        "assemble batch states with the native C++ gather "
                        "(bit-exact; removes per-item json/h5py cost)")

    for name, ckpt in (("eval", "checkpoints/model_experiment_2.pt"),
                       ("mcts", "checkpoints/model_experiment_2.pt"),
                       ("flex", "checkpoints/model_experiment_1.pt")):
        s = sub.add_parser(name)
        if name != "flex":
            s.add_argument("--rtg", required=True)
        s.add_argument("--max_timesteps", type=int, default=30)
        s.add_argument("--checkpoint", default=ckpt)
        s.add_argument("--denoiser_ckpt",
                       default="evaluation/pretrained/unet-nm.pt")
        s.add_argument("--data_dirs", nargs="*", default=None)
        s.add_argument("--data_root", default=None,
                       help="re-root the DEFAULT eval dir list (the nine "
                            "evaluation/image_dir/vanilla/{A}_{S} dirs) "
                            "under this path — e.g. the --out of "
                            "tools/make_dataset.py --eval; ignored when "
                            "--data_dirs is given")
        s.add_argument("--dtype", default="float32",
                       choices=["float32", "bfloat16"],
                       help="compute dtype for the DT, denoiser, and "
                            "value model (the reference's autocast policy, "
                            "main.py:37-40, env.py:52)")
        s.add_argument("--unet_packed", default="none",
                       choices=["none", "s2d", "pallas", "winograd",
                                "winograd_deep"],
                       help="U-Net execution: 'none' = exact direct convs; "
                            "'s2d' = space-to-depth packed 128^2 stages "
                            "(XLA); 'pallas' = fused whole-block kernels "
                            "on them; 'winograd' = every 3x3 block as "
                            "F(2x2,3x3) MXU GEMMs (2.25x fewer multiplies); "
                            "'winograd_deep' = Winograd on the "
                            ">=128-channel blocks only. Same checkpoint "
                            "tree; exact up to float reassociation "
                            "(PARITY.md D14, benchmarks/conv_probe.py)")
        if name == "mcts":
            s.add_argument("--seed", type=int, default=0)
            s.add_argument("--arniqa_ckpt", default=None)
            s.add_argument("--sequential", action="store_true",
                           help="search one image at a time instead of "
                                "batching a directory's trees on device")
            s.add_argument("--search_batch", type=int, default=16,
                           help="trees searched per device dispatch "
                                "(throughput still improving at 64, "
                                "memory-safe default 16; RESULTS.md)")
            s.add_argument("--tree_backend", default="device",
                           choices=["device", "host"],
                           help="'device' (default): the whole PUCB search "
                                "runs as one XLA program (fixed-size node "
                                "arrays, lax.scan); 'host': tree logic on "
                                "host, one fused dispatch per iteration")
            s.add_argument("--node_dtype", default="float32",
                           choices=["float32", "bfloat16"],
                           help="device-backend storage dtype for per-node "
                                "env snapshots (x/z/u); bfloat16 halves "
                                "the search's dominant HBM cost, raising "
                                "the --search_batch ceiling (RESULTS.md)")
    return p


def _ensure_backend(platform: str) -> None:
    """Guard the CLI's first device touch. When the axon tunnel is down,
    ``jax.devices()`` HANGS instead of erroring (CLAUDE.md) — probe the
    backend in a bounded subprocess and fail fast with guidance rather
    than silently falling back (this is the production surface; benches
    fall back instead, utils/tpu_probe.py). Skipped when the environment
    already forces CPU (tests' conftest, JAX_PLATFORMS=cpu)."""
    from dt4image_restoration_tpu.utils import tpu_probe
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
        return
    if tpu_probe._env_forces_cpu():
        # JAX_PLATFORMS=cpu in the env alone does NOT switch backends
        # here — sitecustomize pre-imports jax pinned to the tunnel
        # (CLAUDE.md) — so honor the env's intent explicitly, exactly
        # like ensure_live_backend's forced path. Without this the run
        # would silently stay on the TPU (and hang during an outage).
        import jax
        jax.config.update("jax_platforms", "cpu")
        return
    # Fail ONLY when the probe itself dies (the outage signature); a
    # healthy non-TPU default backend (plain CPU/GPU machine) answers the
    # probe and runs normally.
    if tpu_probe.probe_backend() is None:
        raise SystemExit(
            "ERROR: the default accelerator backend is unreachable "
            "(axon tunnel outage? jax.devices() would hang forever). "
            "Retry once the tunnel is back, or rerun with --platform cpu "
            "to use the CPU backend explicitly.")


def main(argv=None) -> None:
    # Persistent XLA compile cache: the CLI's programs are few and large
    # (whole-rollout scans, the device search), so repeat invocations are
    # recompile-dominated (15-50 s) without it. Respects an existing
    # JAX_COMPILATION_CACHE_DIR; opt out with DT4IR_NO_COMPILE_CACHE=1.
    if not os.environ.get("DT4IR_NO_COMPILE_CACHE"):
        from dt4image_restoration_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
    args = build_parser().parse_args(argv)
    _ensure_backend(args.platform)
    from dt4image_restoration_tpu.training.sharding import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()
    {"train": cmd_train, "eval": cmd_eval, "flex": cmd_flex,
     "mcts": cmd_mcts}[args.mode](args)


if __name__ == "__main__":
    main()
