"""Checkpoint I/O: orbax for native checkpoints + converters from the
reference's published PyTorch checkpoints.

The published weights (``unet-nm.pt`` for the denoiser, noise.py:139-153;
``model_experiment_{1,2}.pt`` for the DT, main.py:178,201) are required for
PSNR parity, since the training data is email-gated (README.md:11). The
converters map torch ``state_dict`` key/layout conventions (NCHW/OIHW,
flattened C-major) onto our NHWC/HWIO Flax trees.

Loading ``.pt`` files uses torch only if installed; converted params are
plain numpy pytrees, so the rest of the framework never imports torch.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor -> np.ndarray (works for already-numpy values too)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO."""
    return np.transpose(_np(w), (2, 3, 1, 0))


def _linear_kernel(w) -> np.ndarray:
    """torch (out, in) linear weight -> flax (in, out)."""
    return np.transpose(_np(w), (1, 0))


# ---------------------------------------------------------------------------
# U-Net denoiser
# ---------------------------------------------------------------------------

def convert_unet_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert the reference UNet ``state_dict`` (``unet-nm.pt``) to our
    ``UNetDenoiser`` Flax params.

    Torch key layout (reference noise.py module structure):
      inc.conv.conv-{i}.conv2d.{weight,bias}
      down{k}.mpconv.1.conv-{i}.conv2d.{weight,bias}
      up{k}.conv.conv-{i}.conv2d.{weight,bias}
      outc.conv.{weight,bias}
    A leading ``net.`` prefix (full UNetDenoiser2D dicts) is accepted.
    """
    sd = {k.removeprefix("net."): v for k, v in state_dict.items()}
    net: Dict[str, Any] = {}

    def put(block: str, conv: str, w, b):
        net.setdefault(block, {})[conv] = {
            "kernel": _conv_kernel(w), "bias": _np(b)}

    for key, w in sd.items():
        if not key.endswith(".weight"):
            continue
        b = sd[key[:-len(".weight")] + ".bias"]
        if key.startswith("outc."):
            put("outc_parent", "outc", w, b)  # placeholder, fixed below
            continue
        m = re.match(
            r"(inc|down\d|up\d)\.(?:conv|mpconv\.1)\.conv-(\d)\.conv2d\.weight",
            key)
        if m is None:
            raise ValueError(f"unrecognized UNet checkpoint key: {key}")
        put(m.group(1), f"conv{m.group(2)}", w, b)

    outc = net.pop("outc_parent")["outc"]
    net["outc"] = outc
    return {"net": net}


def load_unet_checkpoint(path: str) -> Dict[str, Any]:
    """Load ``unet-nm.pt`` and convert to Flax params."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return convert_unet_state_dict(sd)


# ---------------------------------------------------------------------------
# Decision Transformer
# ---------------------------------------------------------------------------

def convert_dt_state_dict(state_dict: Mapping[str, Any],
                          state_conv_hw: int = 12,
                          state_conv_ch: int = 16) -> Dict[str, Any]:
    """Convert a reference DecisionTransformer ``state_dict``
    (``model_experiment_{1,2}.pt``) to our Flax params.

    Torch layout (decision_transformer.py:106-154):
      time_embed.weight / task_embed.weight           embeddings
      embed_action.0.* / embed_return.0.*             Linear(+Tanh)
      state_encoder.{0,2,4}.*                         convs, .7 = Linear(2304,E)
      transformer.{i}.{ln1,ln2}.* , .c_att.{qkv_proj,o_proj}.* ,
        .mlp.{fc,fc_proj}.*
      layer_n.* , predict_action.0.* , predict_rtg.*

    The state-encoder Linear consumes a torch C-major flatten of a
    (C, H, W) = (16, 12, 12) activation; our NHWC flatten is (H, W, C), so
    that kernel's input axis is permuted accordingly.
    """
    sd = dict(state_dict)
    p: Dict[str, Any] = {}

    p["time_embed"] = {"embedding": _np(sd["time_embed.weight"])}
    p["task_embed"] = {"embedding": _np(sd["task_embed.weight"])}
    p["embed_action"] = {"kernel": _linear_kernel(sd["embed_action.0.weight"]),
                         "bias": _np(sd["embed_action.0.bias"])}
    p["embed_return"] = {"kernel": _linear_kernel(sd["embed_return.0.weight"]),
                         "bias": _np(sd["embed_return.0.bias"])}

    enc = {}
    for i, torch_idx in enumerate((0, 2, 4)):
        enc[f"conv{i}"] = {
            "kernel": _conv_kernel(sd[f"state_encoder.{torch_idx}.weight"]),
            "bias": _np(sd[f"state_encoder.{torch_idx}.bias"])}
    # Permute the flatten-order-sensitive Linear: torch input index is
    # c*H*W + h*W + w; ours is h*W*C + w*C + c.
    w = _linear_kernel(sd["state_encoder.7.weight"])  # (2304, E)
    hw, ch = state_conv_hw, state_conv_ch
    w = w.reshape(ch, hw, hw, -1).transpose(1, 2, 0, 3).reshape(
        hw * hw * ch, -1)
    enc["dense"] = {"kernel": w, "bias": _np(sd["state_encoder.7.bias"])}
    p["state_encoder"] = enc

    n_blocks = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"transformer\.(\d+)\.", k)))
    for i in range(n_blocks):
        t = f"transformer.{i}."
        p[f"block{i}"] = {
            "ln1": {"scale": _np(sd[t + "ln1.weight"]),
                    "bias": _np(sd[t + "ln1.bias"])},
            "ln2": {"scale": _np(sd[t + "ln2.weight"]),
                    "bias": _np(sd[t + "ln2.bias"])},
            "attn": {
                "qkv_proj": {
                    "kernel": _linear_kernel(sd[t + "c_att.qkv_proj.weight"]),
                    "bias": _np(sd[t + "c_att.qkv_proj.bias"])},
                "o_proj": {
                    "kernel": _linear_kernel(sd[t + "c_att.o_proj.weight"]),
                    "bias": _np(sd[t + "c_att.o_proj.bias"])},
            },
            "fc": {"kernel": _linear_kernel(sd[t + "mlp.fc.weight"]),
                   "bias": _np(sd[t + "mlp.fc.bias"])},
            "fc_proj": {"kernel": _linear_kernel(sd[t + "mlp.fc_proj.weight"]),
                        "bias": _np(sd[t + "mlp.fc_proj.bias"])},
        }

    p["layer_n"] = {"scale": _np(sd["layer_n.weight"]),
                    "bias": _np(sd["layer_n.bias"])}
    p["predict_action"] = {
        "kernel": _linear_kernel(sd["predict_action.0.weight"]),
        "bias": _np(sd["predict_action.0.bias"])}
    p["predict_rtg"] = {"kernel": _linear_kernel(sd["predict_rtg.weight"]),
                        "bias": _np(sd["predict_rtg.bias"])}
    return p


def load_dt_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference DT ``.pt`` checkpoint and convert to Flax params."""
    import torch
    sd = torch.load(path, map_location="cpu")
    # torch.compile / DDP wrappers prefix parameter names.
    sd = {k.removeprefix("module.").removeprefix("_orig_mod."): v
          for k, v in sd.items()}
    return convert_dt_state_dict(sd)


# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, pytree: Any) -> None:
    """Save a pytree checkpoint with orbax (process 0 writes under pjit,
    replacing the reference's rank-0 guard, train.py:143-152)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), pytree, force=True)


def restore_checkpoint(path: str, like: Any = None) -> Any:
    """Restore an orbax checkpoint saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(os.path.abspath(path))
        return ckptr.restore(os.path.abspath(path), target=like)
