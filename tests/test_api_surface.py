"""The public API surface documented in docs/API.md exists — a doc-rot
guard: renaming or dropping any documented name must fail here so the
reference doc is updated with it."""
import importlib

import pytest

DOCUMENTED = {
    "dt4image_restoration_tpu.ops": [
        "fft2c", "ifft2c", "psnr", "ssim", "kspace_consistency",
        "spi_inverse", "bilinear_upsample_2x", "complex2channel",
        "greyscale_to_rgb", "resize_bilinear"],
    "dt4image_restoration_tpu.ops.image": [
        "space_to_depth", "depth_to_space", "pack_conv_weights",
        "pack_conv_bias"],
    "dt4image_restoration_tpu.ops.pallas": [
        "kspace_consistency_pallas", "fused_causal_attention",
        "layernorm_pallas", "fused_conv_block"],
    "dt4image_restoration_tpu.models": [
        "UNet", "UNetDenoiser", "UNetDenoiser2D", "DecisionTransformer",
        "DTOutput"],
    "dt4image_restoration_tpu.models.decision_transformer": [
        "make_dt_apply", "make_fused_dt_apply", "make_state_encode",
        "make_dt_embed_apply"],
    "dt4image_restoration_tpu.models.arniqa": [
        "ARNIQA", "convert_arniqa_state_dict", "proxy_value_fn_jax"],
    "dt4image_restoration_tpu.env": [
        "CSMRIState", "PnPEnv", "admm_step", "compute_reward",
        "fixed_param_rollout", "get_policy_ob", "reset_from_mat"],
    "dt4image_restoration_tpu.inference": [
        "Evaluator", "EvalBuffers", "greedy_rollout",
        "initial_policy_setup", "make_policy_step", "MCTS", "BatchedMCTS",
        "DeviceMCTS", "Node", "run_mcts"],
    "dt4image_restoration_tpu.training": [
        "Trainer", "TrainState", "make_optimizer", "make_lr_schedule",
        "masked_mse_loss", "make_watch_grad_fn", "make_mesh",
        "make_shard_map_train_step", "make_train_step", "shard_batch",
        "shard_params"],
    "dt4image_restoration_tpu.training.sharding": [
        "shard_eval_inputs", "gather_eval_outputs", "local_output_offset",
        "padded_per_process", "maybe_initialize_distributed",
        "background_batches", "prefetch_to_device", "sync_processes"],
    "dt4image_restoration_tpu.data": [
        "TrainingDataset", "EvaluationDataset", "EvaluationFlexibleDataset",
        "EvaluationOptimalDataset", "extract_task", "make_mat_record",
        "shepp_logan", "radial_mask"],
    "dt4image_restoration_tpu.data.expert": [
        "scripted_expert_action", "rollout_expert", "record_expert_corpus",
        "make_eval_dirs", "task_physics"],
    "dt4image_restoration_tpu.utils.checkpoint": [
        "load_unet_checkpoint", "load_dt_checkpoint",
        "convert_unet_state_dict", "convert_dt_state_dict",
        "export_unet_state_dict", "export_dt_state_dict",
        "save_torch_checkpoint",
        "save_checkpoint", "restore_checkpoint", "AsyncCheckpointSaver"],
    "dt4image_restoration_tpu.utils.compile_cache": [
        "enable_persistent_cache"],
    "dt4image_restoration_tpu.utils.profiling": [
        "trace_if_enabled", "annotate", "StepTimer"],
    "dt4image_restoration_tpu.utils.tpu_probe": [
        "probe_backend", "tpu_reachable", "ensure_live_backend"],
    "dt4image_restoration_tpu.utils.loaders": [
        "load_denoiser", "load_dt"],
    "dt4image_restoration_tpu.serving": [
        "RestorationService", "RestorationRequest", "RestorationResult",
        "ServiceOverloaded"],
    "dt4image_restoration_tpu.config": [
        "ModelConfig", "DenoiserConfig", "EnvConfig", "TrainerConfig",
        "EvalConfig", "MCTSConfig", "MeshConfig", "Config", "FLEX_TASKS",
        "OPTIMAL_TASKS", "FLEX_RTG_RANGE", "OPTIMAL_RTG_RANGE"],
}


@pytest.mark.parametrize("module", sorted(DOCUMENTED))
def test_documented_names_exist(module):
    m = importlib.import_module(module)
    missing = [n for n in DOCUMENTED[module] if not hasattr(m, n)]
    assert not missing, (
        f"{module} lost documented names {missing} — update docs/API.md "
        f"alongside the rename")


def _documented_signatures():
    """Parse docs/API.md table rows whose FIRST cell documents a call
    signature — ``| `name(arg, kw=..., ...)` ...`` — and resolve each
    name against the DOCUMENTED modules. Yields
    (doc_line, callable, [documented arg names])."""
    import os
    import re

    md = open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "API.md")).read()
    resolved = {}
    for module, names in DOCUMENTED.items():
        m = importlib.import_module(module)
        for n in names:
            resolved.setdefault(n, getattr(m, n))
    for line in md.splitlines():
        if not line.startswith("| `"):
            continue
        first_cell = line.split(" | ", 1)[0]
        for name, args in re.findall(r"([A-Za-z_][\w.]*)\(([^)]*)\)",
                                     first_cell):
            obj = resolved.get(name.rsplit(".", 1)[-1])
            if obj is None:
                continue
            tokens = []
            for tok in args.split(","):
                tok = tok.strip().split("=", 1)[0].strip()
                if re.fullmatch(r"[A-Za-z_]\w*", tok):
                    tokens.append(tok)
            if tokens:
                yield line, obj, tokens


def test_documented_signatures_match():
    """Signature-level doc-rot guard: every argument name documented in
    an API.md signature cell must be a real parameter of that callable,
    and the documented names must appear in the signature's order
    (docs may OMIT parameters — `...` — but never misname or reorder
    them, which would break a user's positional call)."""
    import inspect

    rows = list(_documented_signatures())
    assert len(rows) >= 15, "API.md signature rows went missing"
    problems = []
    for line, obj, tokens in rows:
        try:
            params = list(inspect.signature(obj).parameters)
        except (TypeError, ValueError):
            continue
        unknown = [t for t in tokens if t not in params]
        if unknown:
            problems.append(f"{line!r}: args {unknown} are not "
                            f"parameters of {obj} {params}")
            continue
        order = [params.index(t) for t in tokens]
        if order != sorted(order):
            problems.append(f"{line!r}: documented order {tokens} != "
                            f"signature order {params}")
    assert not problems, "docs/API.md signature rot:\n" + "\n".join(problems)
