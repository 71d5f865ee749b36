#!/usr/bin/env python
"""Export a native (orbax) checkpoint back to the reference's torch ``.pt``
layout — the inverse of the import converters in ``utils/checkpoint.py``.

A model trained or fine-tuned in this framework round-trips into the
reference codebase: the DT export loads into the reference
``DecisionTransformer`` with ``load_state_dict(strict=True)`` (masking
buffers included via ``--block_size``, decision_transformer.py:44-48), and
the U-Net export into its ``UNet`` (noise.py:101-137).

    python tools/export_checkpoint.py --model dt   --in ckpts/model_40 \
        --out model_export.pt --block_size 18
    python tools/export_checkpoint.py --model unet --in ckpts/unet_ft \
        --out unet_export.pt

``--in`` accepts an orbax checkpoint dir of bare params (the trainer's
``model_{epoch}``) or of a full TrainState (``state_latest`` — the params
leaf is extracted).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", required=True, choices=["dt", "unet"])
    p.add_argument("--in", dest="src", required=True,
                   help="orbax checkpoint dir (bare params or TrainState)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--block_size", type=int, default=None,
                   help="emit per-block causal 'masking' buffers of this "
                        "size so the reference DT accepts the export with "
                        "strict=True (reference runs use 18)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # Pure host work (orbax restore -> numpy transpose -> torch.save):
    # pin the CPU backend so a dead TPU tunnel can never hang the
    # restore's device touch (utils/tpu_probe.py).
    from dt4image_restoration_tpu.utils.tpu_probe import ensure_live_backend
    ensure_live_backend(argv=["--cpu"])
    from dt4image_restoration_tpu.utils.checkpoint import (
        export_dt_state_dict, export_unet_state_dict, restore_checkpoint,
        save_torch_checkpoint)

    tree = restore_checkpoint(args.src)
    if isinstance(tree, dict) and "params" in tree:  # full TrainState
        tree = tree["params"]

    if args.model == "dt":
        sd = export_dt_state_dict(tree, block_size=args.block_size)
    else:
        sd = export_unet_state_dict(tree)
    save_torch_checkpoint(args.out, sd)
    print(f"wrote {len(sd)} tensors to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
