"""Real-checkpoint parity validation: one command that proves (or refutes)
the ±0.05 dB north star on first contact with the published weights.

The reference ships three download-gated files (README.md:9-39):
``checkpoints/model_experiment_2.pt`` (optimal / norm mode),
``checkpoints/model_experiment_1.pt`` (flexible mode), and
``evaluation/pretrained/unet-nm.pt`` (main.py:178,201; noise.py:139-153).
The moment they land, run:

    python tools/validate_parity.py \
        --dt checkpoints/model_experiment_2.pt \
        --dt_flex checkpoints/model_experiment_1.pt \
        --unet evaluation/pretrained/unet-nm.pt \
        [--arniqa <state_dict.pt>] \
        --dirs evaluation/image_dir/vanilla/4_15 ...

For every requested mode (eval / flex / mcts) each image is restored by
BOTH frameworks — the torch oracle restating the reference inference
semantics (utils/torch_oracle.py, the same oracles the parity tests pin
against) and our fused JAX programs on strictly-converted weights — and
the per-directory mean PSNR delta is tabulated against the tolerance.
Exit code 0 iff every row passes.

``--selftest`` runs the whole harness end-to-end on converter-shaped
random weights + synthetic CSMRI fixtures (CI uses this; no downloads
needed).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _load_checkpoints(args):
    import torch
    from dt4image_restoration_tpu.utils.checkpoint import (
        convert_dt_state_dict, convert_unet_state_dict)
    dt_sd = torch.load(args.dt, map_location="cpu")
    unet_sd = torch.load(args.unet, map_location="cpu")
    out = {
        "dt_sd": dt_sd, "dt_params": convert_dt_state_dict(dt_sd),
        "unet_sd": unet_sd, "unet_params": convert_unet_state_dict(unet_sd),
        "dt_flex_sd": None, "dt_flex_params": None,
        "value_fn": None, "value_fn_jax": None,
    }
    if args.dt_flex:
        sd = torch.load(args.dt_flex, map_location="cpu")
        out["dt_flex_sd"] = sd
        out["dt_flex_params"] = convert_dt_state_dict(sd)
    if args.arniqa:
        from dt4image_restoration_tpu.models.arniqa import (
            convert_arniqa_state_dict, make_value_fn, make_value_fn_jax)
        variables = convert_arniqa_state_dict(
            torch.load(args.arniqa, map_location="cpu"))
        out["value_fn"] = make_value_fn(variables)
        out["value_fn_jax"] = make_value_fn_jax(variables)
    else:
        from dt4image_restoration_tpu.models.arniqa import (
            proxy_value_fn, proxy_value_fn_jax)
        out["value_fn"] = proxy_value_fn
        out["value_fn_jax"] = proxy_value_fn_jax
    return out


def _records_and_mats(path, rtg_target, kind, limit):
    """Dataset-shaped records for the JAX side + RAW mats for the torch
    oracle (the oracle does its own env clip and reads the unclipped x0
    for the policy observation, like EvaluationDataset)."""
    from scipy.io import loadmat
    from dt4image_restoration_tpu.data.datasets import EvaluationDataset
    ds = EvaluationDataset(path, rtg_target=rtg_target, kind=kind)
    n = min(len(ds), limit)
    records = [ds[i] for i in range(n)]
    raw = [loadmat(os.path.join(path, ds.fns[i])) for i in range(n)]
    return records, raw


def _make_dt_apply(params, mode, n_embeds, block_size=18):
    import jax
    from dt4image_restoration_tpu.config import ModelConfig
    from dt4image_restoration_tpu.models import DecisionTransformer
    cfg = ModelConfig(block_size=block_size, n_embeds=n_embeds, mode=mode)
    model = DecisionTransformer(cfg)

    def dt_apply(p, rtg, s, ts, task, actions):
        return model.apply({"params": p}, rtg, s, ts, task, actions)

    return cfg, dt_apply


def _make_denoise(unet_params):
    from dt4image_restoration_tpu.models import UNetDenoiser
    model = UNetDenoiser()

    def denoise(img, sig):
        return model.apply({"params": unet_params}, img, sig)

    return denoise


def _greedy_rows(ckpts, dirs, rtg_target, mode, n_embeds, args):
    """One table row per directory: mean PSNR from the torch oracle
    episodes vs our batched fused rollout."""
    from dt4image_restoration_tpu.inference import Evaluator
    from dt4image_restoration_tpu.utils.torch_oracle import (
        torch_eval_episode, torch_psnr)
    dt_sd = ckpts["dt_flex_sd"] if mode == "flex" else ckpts["dt_sd"]
    dt_params = ckpts["dt_flex_params"] if mode == "flex" \
        else ckpts["dt_params"]
    cfg, dt_apply = _make_dt_apply(dt_params, mode, n_embeds)
    evaluator = Evaluator(
        dt_apply=dt_apply, dt_params=dt_params,
        denoise=_make_denoise(ckpts["unet_params"]), cfg=cfg,
        max_timesteps=args.max_timesteps, rtg_target=rtg_target,
        eval_type=mode, report_every=args.limit)

    rows = []
    for path in dirs:
        records, raw = _records_and_mats(
            path, rtg_target, "flex" if mode == "flex" else "optimal",
            args.limit)
        if not records:
            continue
        ref = []
        for rec, mat in zip(records, raw):
            x, _ = torch_eval_episode(
                dt_sd, ckpts["unet_sd"], mat, float(rec[0][1].reshape(-1)[0]),
                int(rec[0][3].reshape(-1)[0]),
                max_timesteps=args.max_timesteps, mode=mode)
            ref.append(torch_psnr(x, mat["gt"]))
        m = evaluator.evaluate_records(records)
        label = mode if mode != "flex" else f"flex(rtg={rtg_target})"
        rows.append(_row(label, path, len(records),
                         float(np.mean(ref)), float(np.mean(m["reward"])),
                         args.tolerance))
    return rows


def _mcts_rows(ckpts, dirs, rtg_target, args):
    from dt4image_restoration_tpu.config import MCTSConfig
    from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS
    from dt4image_restoration_tpu.utils.torch_oracle import torch_run_mcts
    cfg, dt_apply = _make_dt_apply(ckpts["dt_params"], "norm", 9)
    mcts = DeviceMCTS(
        dt_apply=dt_apply, dt_params=ckpts["dt_params"],
        denoise=_make_denoise(ckpts["unet_params"]), model_cfg=cfg,
        cfg=MCTSConfig(iterations=args.iterations,
                       max_timesteps=args.max_timesteps, seed=args.seed),
        value_fn=ckpts["value_fn"], value_fn_jax=ckpts["value_fn_jax"])

    rows = []
    for path in dirs:
        records, raw = _records_and_mats(path, rtg_target, "optimal",
                                         args.limit)
        if not records:
            continue
        ref = [torch_run_mcts(
            ckpts["dt_sd"], ckpts["unet_sd"], mat,
            float(rec[0][1].reshape(-1)[0]), int(rec[0][3].reshape(-1)[0]),
            seed=args.seed + i, iterations=args.iterations,
            max_timesteps=args.max_timesteps,
            value_fn=ckpts["value_fn"])[0]
            for i, (rec, mat) in enumerate(zip(records, raw))]
        ours = mcts.run_batch(records,
                              seeds=[args.seed + i
                                     for i in range(len(records))],
                              verbose=False)
        rows.append(_row("mcts", path, len(records), float(np.mean(ref)),
                         float(np.mean(ours)), args.tolerance))
    return rows


def _row(mode, path, n, ref_db, jax_db, tol):
    delta = jax_db - ref_db
    return {"mode": mode, "dir": path, "n": n,
            "torch_db": round(ref_db, 4), "jax_db": round(jax_db, 4),
            "delta_db": round(delta, 4),
            "pass": bool(abs(delta) <= tol)}


def validate(args) -> dict:
    ckpts = _load_checkpoints(args)
    rows = []
    if "eval" in args.modes:
        rows += _greedy_rows(ckpts, args.dirs, args.rtg, "norm", 9, args)
    if "flex" in args.modes:
        if ckpts["dt_flex_params"] is None:
            print("NOTE: flex mode skipped (--dt_flex not given)",
                  file=sys.stderr)
        else:
            for rtg in args.flex_rtgs:
                rows += _greedy_rows(ckpts, args.dirs, float(rtg), "flex",
                                     6, args)
    if "mcts" in args.modes:
        rows += _mcts_rows(ckpts, args.dirs, args.rtg, args)

    header = (f"{'mode':<16} {'dir':<40} {'n':>3} {'torch dB':>9} "
              f"{'jax dB':>9} {'Δ dB':>8}  status")
    print(header)
    print("-" * len(header))
    for r in rows:
        print(f"{r['mode']:<16} {r['dir'][-40:]:<40} {r['n']:>3} "
              f"{r['torch_db']:>9.4f} {r['jax_db']:>9.4f} "
              f"{r['delta_db']:>8.4f}  "
              f"{'PASS' if r['pass'] else 'FAIL'}")
    ok = bool(rows) and all(r["pass"] for r in rows)
    print(f"\nOverall: {'PASS' if ok else 'FAIL'} "
          f"(tolerance ±{args.tolerance} dB, {len(rows)} rows)")
    report = {"ok": ok, "tolerance_db": args.tolerance, "rows": rows}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    return report


def _selftest(args) -> dict:
    """End-to-end harness check on converter-shaped random weights +
    synthetic fixtures — proves the pipeline is ready for the real files."""
    import torch
    from scipy.io import savemat
    from dt4image_restoration_tpu.data.synthetic import make_mat_record
    from dt4image_restoration_tpu.utils.torch_oracle import (
        make_dt_state_dict)
    from dt4image_restoration_tpu.utils.torch_reference import (
        random_unet_state_dict)

    tmpdir = tempfile.TemporaryDirectory(
        prefix="validate_parity_selftest_")
    tmp = tmpdir.name
    gen = torch.Generator().manual_seed(0)
    dt_sd = make_dt_state_dict(gen, n_embeds=9)
    # Mid-length episodes so the window switch is exercised (probed in
    # tests/test_e2e_parity.py).
    dt_sd["predict_action.0.bias"][0] -= 0.5
    dt_flex_sd = make_dt_state_dict(torch.Generator().manual_seed(1),
                                    n_embeds=6)
    dt_flex_sd["predict_action.0.bias"][2] -= 0.5
    torch.save(dt_sd, os.path.join(tmp, "model_experiment_2.pt"))
    torch.save(dt_flex_sd, os.path.join(tmp, "model_experiment_1.pt"))
    torch.save(random_unet_state_dict(seed=0),
               os.path.join(tmp, "unet-nm.pt"))
    d = os.path.join(tmp, "4_15")
    os.makedirs(d)
    for i in range(args.limit):
        savemat(os.path.join(d, f"img_4_15_s{i}.mat"),
                make_mat_record(seed=i))

    args.dt = os.path.join(tmp, "model_experiment_2.pt")
    args.dt_flex = os.path.join(tmp, "model_experiment_1.pt")
    args.unet = os.path.join(tmp, "unet-nm.pt")
    args.dirs = [d]
    with tmpdir:  # fixtures removed on exit (CI runs this repeatedly)
        return validate(args)


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dt", help="model_experiment_2.pt (norm: eval+mcts)")
    p.add_argument("--dt_flex", default=None,
                   help="model_experiment_1.pt (flex mode)")
    p.add_argument("--unet", help="unet-nm.pt")
    p.add_argument("--arniqa", default=None,
                   help="ARNIQA hub state dict (else: documented proxy "
                        "scorer on BOTH sides)")
    p.add_argument("--dirs", nargs="+", default=None,
                   help="evaluation .mat directories")
    p.add_argument("--modes", nargs="+", default=["eval", "flex", "mcts"],
                   choices=["eval", "flex", "mcts"])
    p.add_argument("--rtg", type=float, default=10.0,
                   help="RTG target for eval/mcts (reference scripts.sh)")
    p.add_argument("--flex_rtgs", nargs="+", type=float,
                   default=[1.5, 3, 3.5, 4, 4.5])
    p.add_argument("--limit", type=int, default=7,
                   help="images per directory (the reference reports the "
                        "first 7, eval.py:137-143)")
    p.add_argument("--max_timesteps", type=int, default=30)
    p.add_argument("--iterations", type=int, default=30,
                   help="MCTS search iterations (mcts.py:231)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tolerance", type=float, default=0.05,
                   help="pass threshold in dB (BASELINE north star)")
    p.add_argument("--json_out", default=None)
    p.add_argument("--selftest", action="store_true",
                   help="run on generated random weights + synthetic "
                        "fixtures (CI path; ignores --dt/--unet/--dirs)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # Parity deltas are backend-portable: fall back to CPU (with a stderr
    # note) instead of hanging when the tunnel is down, so the first-
    # contact validation run always completes (utils/tpu_probe.py).
    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    ensure_live_backend(argv=[])
    if args.selftest:
        report = _selftest(args)
    else:
        missing = [k for k in ("dt", "unet", "dirs")
                   if getattr(args, k) in (None, [])]
        if missing:
            build_parser().error(
                f"--{', --'.join(missing)} required (or use --selftest)")
        report = validate(args)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
