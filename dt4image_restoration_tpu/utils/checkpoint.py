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
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor -> np.ndarray COPY (works for already-numpy values
    too). The copy is load-bearing: ``tensor.numpy()``/``np.asarray`` are
    zero-copy views of torch storage, so an in-place mutation of the
    source model (e.g. an optimizer step) would silently change the
    converted params."""
    if isinstance(t, np.ndarray):
        return np.array(t)
    return np.array(t.detach().cpu().numpy())


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

    STRICT: raises ``ValueError`` on unrecognized, unconsumed, or missing
    keys, so naming drift in a published checkpoint fails loudly instead of
    silently mis-loading (first contact with the real files happens outside
    this environment — the download is gated).
    """
    sd = {k.removeprefix("net."): v for k, v in state_dict.items()}
    net: Dict[str, Any] = {}
    consumed = set()

    def put(block: str, conv: str, w, b):
        net.setdefault(block, {})[conv] = {
            "kernel": _conv_kernel(w), "bias": _np(b)}

    for key, w in sd.items():
        if not key.endswith(".weight"):
            continue
        bias_key = key[:-len(".weight")] + ".bias"
        if bias_key not in sd:
            raise ValueError(f"UNet checkpoint missing bias for: {key}")
        b = sd[bias_key]
        if key == "outc.conv.weight":
            put("outc_parent", "outc", w, b)  # placeholder, fixed below
            consumed.update((key, bias_key))
            continue
        m = re.match(
            r"(inc|down\d|up\d)\.(?:conv|mpconv\.1)\.conv-(\d)\.conv2d\.weight",
            key)
        if m is None:
            raise ValueError(f"unrecognized UNet checkpoint key: {key}")
        put(m.group(1), f"conv{m.group(2)}", w, b)
        consumed.update((key, bias_key))

    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(f"unconsumed UNet checkpoint keys: {leftover}")
    if "outc_parent" not in net:
        raise ValueError("UNet checkpoint missing outc.conv.{weight,bias}")
    expected = {"inc", "down1", "down2", "down3", "down4",
                "up1", "up2", "up3", "up4", "outc_parent"}
    missing = sorted(expected - set(net))
    if missing:
        raise ValueError(f"UNet checkpoint missing blocks: {missing}")

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

    STRICT: raises ``ValueError`` on missing keys and on unconsumed keys
    (tolerating only the causal-mask ``masking`` buffers torch registers in
    each attention block, decision_transformer.py:44-48), so naming drift
    in a published checkpoint fails loudly instead of silently mis-loading.
    """
    sd = dict(state_dict)
    consumed = set()

    def take(key: str):
        if key not in sd:
            raise ValueError(f"DT checkpoint missing key: {key}")
        consumed.add(key)
        return sd[key]

    p: Dict[str, Any] = {}

    p["time_embed"] = {"embedding": _np(take("time_embed.weight"))}
    p["task_embed"] = {"embedding": _np(take("task_embed.weight"))}
    p["embed_action"] = {
        "kernel": _linear_kernel(take("embed_action.0.weight")),
        "bias": _np(take("embed_action.0.bias"))}
    p["embed_return"] = {
        "kernel": _linear_kernel(take("embed_return.0.weight")),
        "bias": _np(take("embed_return.0.bias"))}

    enc = {}
    for i, torch_idx in enumerate((0, 2, 4)):
        enc[f"conv{i}"] = {
            "kernel": _conv_kernel(take(f"state_encoder.{torch_idx}.weight")),
            "bias": _np(take(f"state_encoder.{torch_idx}.bias"))}
    # Permute the flatten-order-sensitive Linear: torch input index is
    # c*H*W + h*W + w; ours is h*W*C + w*C + c.
    w = _linear_kernel(take("state_encoder.7.weight"))  # (2304, E)
    hw, ch = state_conv_hw, state_conv_ch
    w = w.reshape(ch, hw, hw, -1).transpose(1, 2, 0, 3).reshape(
        hw * hw * ch, -1)
    enc["dense"] = {"kernel": w, "bias": _np(take("state_encoder.7.bias"))}
    p["state_encoder"] = enc

    block_ids = {int(m.group(1)) for k in sd
                 if (m := re.match(r"transformer\.(\d+)\.", k))}
    if not block_ids:
        raise ValueError("DT checkpoint has no transformer.* blocks")
    n_blocks = 1 + max(block_ids)
    for i in range(n_blocks):
        t = f"transformer.{i}."
        p[f"block{i}"] = {
            "ln1": {"scale": _np(take(t + "ln1.weight")),
                    "bias": _np(take(t + "ln1.bias"))},
            "ln2": {"scale": _np(take(t + "ln2.weight")),
                    "bias": _np(take(t + "ln2.bias"))},
            "attn": {
                "qkv_proj": {
                    "kernel": _linear_kernel(take(t + "c_att.qkv_proj.weight")),
                    "bias": _np(take(t + "c_att.qkv_proj.bias"))},
                "o_proj": {
                    "kernel": _linear_kernel(take(t + "c_att.o_proj.weight")),
                    "bias": _np(take(t + "c_att.o_proj.bias"))},
            },
            "fc": {"kernel": _linear_kernel(take(t + "mlp.fc.weight")),
                   "bias": _np(take(t + "mlp.fc.bias"))},
            "fc_proj": {"kernel": _linear_kernel(take(t + "mlp.fc_proj.weight")),
                        "bias": _np(take(t + "mlp.fc_proj.bias"))},
        }

    p["layer_n"] = {"scale": _np(take("layer_n.weight")),
                    "bias": _np(take("layer_n.bias"))}
    p["predict_action"] = {
        "kernel": _linear_kernel(take("predict_action.0.weight")),
        "bias": _np(take("predict_action.0.bias"))}
    p["predict_rtg"] = {"kernel": _linear_kernel(take("predict_rtg.weight")),
                        "bias": _np(take("predict_rtg.bias"))}

    leftover = sorted(
        k for k in set(sd) - consumed
        if not re.fullmatch(r"transformer\.\d+\.c_att\.masking", k))
    if leftover:
        raise ValueError(f"unconsumed DT checkpoint keys: {leftover}")
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
# Inverse converters: Flax params -> reference torch state_dicts
# ---------------------------------------------------------------------------
# Exact inverses of convert_{unet,dt}_state_dict for round-tripping: a model
# trained/fine-tuned here can be exported back into the reference's torch
# layout (NCHW/OIHW, C-major flatten, its exact key names) and loaded by the
# reference code with load_state_dict(strict=True). Values are float32 numpy
# arrays; save_torch_checkpoint wraps them as tensors.

def _conv_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax HWIO conv kernel -> torch OIHW."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))


def _linear_kernel_inv(k: np.ndarray) -> np.ndarray:
    """flax (in, out) linear kernel -> torch (out, in)."""
    return np.ascontiguousarray(np.transpose(np.asarray(k), (1, 0)))


def export_unet_state_dict(params: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`convert_unet_state_dict`: ``UNetDenoiser`` Flax
    params -> the reference UNet's torch ``state_dict`` key layout
    (noise.py:88-137 module structure: ``inc.conv.conv-{i}.conv2d.*``,
    ``down{k}.mpconv.1.conv-{i}.conv2d.*``, ``up{k}.conv.conv-{i}.conv2d.*``,
    ``outc.conv.*``).

    ``convert_unet_state_dict(export_unet_state_dict(p)) == p`` exactly
    (pinned in tests/test_checkpoint.py).
    """
    net = params["net"]
    sd: Dict[str, Any] = {}

    def put(prefix: str, block: Mapping[str, Any]):
        for conv_name, leaf in sorted(block.items()):
            i = conv_name.removeprefix("conv")
            sd[f"{prefix}.conv-{i}.conv2d.weight"] = _conv_kernel_inv(
                leaf["kernel"])
            sd[f"{prefix}.conv-{i}.conv2d.bias"] = np.asarray(leaf["bias"])

    for name, block in net.items():
        if name == "inc":
            put("inc.conv", block)
        elif name.startswith("down"):
            put(f"{name}.mpconv.1", block)
        elif name.startswith("up"):
            put(f"{name}.conv", block)
        elif name == "outc":
            sd["outc.conv.weight"] = _conv_kernel_inv(block["kernel"])
            sd["outc.conv.bias"] = np.asarray(block["bias"])
        else:
            raise ValueError(f"unrecognized UNet param block: {name}")
    return sd


def export_dt_state_dict(params: Mapping[str, Any],
                         block_size: Optional[int] = None,
                         state_conv_hw: int = 12,
                         state_conv_ch: int = 16) -> Dict[str, Any]:
    """Inverse of :func:`convert_dt_state_dict`: our Flax DT params -> the
    reference DecisionTransformer ``state_dict`` (decision_transformer.py:
    106-164 naming), including the un-permute of the flatten-order-sensitive
    ``state_encoder.7`` kernel back to torch's C-major flatten.

    When ``block_size`` is given, the causal-mask ``masking`` buffers torch
    registers in each attention block (decision_transformer.py:44-48,
    ``tril(ones(B, B)).view(1, 1, B, B)``) are emitted too, so the reference
    model accepts the export with ``load_state_dict(strict=True)``.

    ``convert_dt_state_dict(export_dt_state_dict(p)) == p`` exactly
    (pinned in tests/test_checkpoint.py).
    """
    sd: Dict[str, Any] = {}

    def lin(name: str, leaf: Mapping[str, Any]):
        sd[name + ".weight"] = _linear_kernel_inv(leaf["kernel"])
        sd[name + ".bias"] = np.asarray(leaf["bias"])

    sd["time_embed.weight"] = np.asarray(params["time_embed"]["embedding"])
    sd["task_embed.weight"] = np.asarray(params["task_embed"]["embedding"])
    lin("embed_action.0", params["embed_action"])
    lin("embed_return.0", params["embed_return"])

    enc = params["state_encoder"]
    for i, torch_idx in enumerate((0, 2, 4)):
        sd[f"state_encoder.{torch_idx}.weight"] = _conv_kernel_inv(
            enc[f"conv{i}"]["kernel"])
        sd[f"state_encoder.{torch_idx}.bias"] = np.asarray(
            enc[f"conv{i}"]["bias"])
    # Un-permute the flatten-order-sensitive Linear (convert_dt_state_dict
    # maps torch input index c*H*W + h*W + w onto ours h*W*C + w*C + c;
    # invert that before transposing back to torch (out, in)).
    hw, ch = state_conv_hw, state_conv_ch
    w = np.asarray(enc["dense"]["kernel"])           # (hw*hw*ch, E) ours
    w = w.reshape(hw, hw, ch, -1).transpose(2, 0, 1, 3).reshape(
        ch * hw * hw, -1)                            # (ch*hw*hw, E) torch-in
    sd["state_encoder.7.weight"] = _linear_kernel_inv(w)
    sd["state_encoder.7.bias"] = np.asarray(enc["dense"]["bias"])

    block_ids = sorted(int(m.group(1)) for k in params
                       if (m := re.fullmatch(r"block(\d+)", k)))
    if not block_ids:
        raise ValueError("DT params have no block{i} transformer blocks")
    for i in block_ids:
        blk, t = params[f"block{i}"], f"transformer.{i}."
        for ln in ("ln1", "ln2"):
            sd[t + ln + ".weight"] = np.asarray(blk[ln]["scale"])
            sd[t + ln + ".bias"] = np.asarray(blk[ln]["bias"])
        lin(t + "c_att.qkv_proj", blk["attn"]["qkv_proj"])
        lin(t + "c_att.o_proj", blk["attn"]["o_proj"])
        lin(t + "mlp.fc", blk["fc"])
        lin(t + "mlp.fc_proj", blk["fc_proj"])
        if block_size is not None:
            sd[t + "c_att.masking"] = np.tril(
                np.ones((block_size, block_size), np.float32)).reshape(
                    1, 1, block_size, block_size)

    sd["layer_n.weight"] = np.asarray(params["layer_n"]["scale"])
    sd["layer_n.bias"] = np.asarray(params["layer_n"]["bias"])
    lin("predict_action.0", params["predict_action"])
    lin("predict_rtg", params["predict_rtg"])
    return sd


def save_torch_checkpoint(path: str, state_dict: Mapping[str, Any]) -> None:
    """Write an exported state_dict as a torch ``.pt`` file (float32
    tensors), loadable by the reference's ``torch.load`` +
    ``load_state_dict`` (main.py:178-183, noise.py:139-153)."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32))) for k, v in state_dict.items()}, path)


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


class AsyncCheckpointSaver:
    """Non-blocking :func:`save_checkpoint`: serialization + disk write
    happen on ONE background worker so the training loop never stalls on
    checkpoint IO (the reference's ``torch.save`` blocks the epoch loop,
    train.py:122-152). Pass HOST pytrees (``jax.device_get`` first — the
    cheap sync point); the single worker serializes overlapping saves to
    the same path in submission order. Call :meth:`wait` before restoring
    a just-saved path or exiting the process; a worker exception surfaces
    there (and is re-raised rather than silently losing a checkpoint)."""

    def __init__(self) -> None:
        import concurrent.futures as cf
        self._ex = cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt_saver")
        self._futures: list = []

    def submit(self, path: str, pytree: Any):
        """Queue a save; returns the Future (already tracked for wait)."""
        fut = self._ex.submit(save_checkpoint, path, pytree)
        self._futures.append(fut)
        return fut

    def defer(self, fn, *args):
        """Queue an arbitrary callable BEHIND every save submitted so far
        (same single worker) — e.g. retention GC that must only run once
        the epoch's checkpoints are durable."""
        fut = self._ex.submit(fn, *args)
        self._futures.append(fut)
        return fut

    def wait(self) -> None:
        """Block until every submitted save is durable; re-raises the
        first worker failure."""
        futs, self._futures = self._futures, []
        for f in futs:
            f.result()

    def close(self) -> None:
        self.wait()
        self._ex.shutdown()
