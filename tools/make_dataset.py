#!/usr/bin/env python
"""Generate out-of-the-box training + evaluation data.

The reference's trajectory dataset is email-gated and its eval `.mat` sets
are download-gated (reference README.md:9-39), so a fresh checkout cannot
run any mode without external files. This records a scripted-expert corpus
in the reference's exact on-disk layouts (data/expert.py), after which the
full train -> eval -> export loop runs end-to-end:

    python tools/make_dataset.py --out data_synth --n_traj 128 --eval
    python main.py --block_size 18 --n_embeds 9 train \
        --training_type optimal --batch_size 16 --max_epochs 5 \
        --data_dir data_synth/trajs --state_file data_synth/states.h5 \
        --checkpoint_dir ckpts
    python main.py --block_size 18 --n_embeds 9 eval --rtg 10 \
        --checkpoint ckpts/model_5 --denoiser_ckpt unet-nm.pt \
        --data_dirs data_synth/evaluation/image_dir/vanilla/4_15

Prints one JSON line with paths + the expert's mean PSNR increment (the
target a policy trained on the corpus should recover —
benchmarks/policy_learning_demo.py pins that it does at +5 dB).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="output root directory")
    p.add_argument("--n_traj", type=int, default=64)
    p.add_argument("--ep_len", type=int, default=8)
    p.add_argument("--experiment", default="optimal",
                   choices=["optimal", "flex"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--denoiser_ckpt", default="/nonexistent.pt",
                   help="unet-nm.pt or orbax dir; missing -> random-weight "
                        "prior (the corpus is still trainable — the env "
                        "physics, not the prior quality, drives learning)")
    p.add_argument("--eval", action="store_true",
                   help="also write the nine evaluation/image_dir/vanilla/"
                        "{A}_{S}/ eval dirs the CLI modes scan by default")
    p.add_argument("--per_dir", type=int, default=7,
                   help="eval images per dir (the evaluator averages the "
                        "first 7)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    ensure_live_backend(argv=["--cpu"] if args.cpu else [])

    from dt4image_restoration_tpu.data.expert import (
        make_eval_dirs, record_expert_corpus)
    from dt4image_restoration_tpu.utils import loaders

    os.makedirs(args.out, exist_ok=True)
    denoise = loaders.load_denoiser(args.denoiser_ckpt)
    stats = record_expert_corpus(
        args.out, denoise, n_traj=args.n_traj, ep_len=args.ep_len,
        experiment=args.experiment, seed=args.seed,
        progress=lambda m: print(m, file=sys.stderr))
    if args.eval:
        stats["eval_dirs"] = make_eval_dirs(
            args.out, per_dir=args.per_dir, seed=args.seed)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
