"""Configuration tree for the framework.

Replaces the reference's scattered kwargs-bag configs
(`/root/reference/train.py:25-30`, `/root/reference/transformer/
decision_transformer.py:279-291`) and its mutated global ``train_dict``
(`/root/reference/main.py:28-35`) with one typed dataclass tree.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

# Task vocabularies + RTG min-max normalisation ranges for the two published
# experiments (reference: /root/reference/main.py:90-101,
# /root/reference/dataset/datasets.py:136-140,172-176).
FLEX_TASKS: Tuple[str, ...] = (
    "rtg_1.5", "rtg_3", "rtg_3.5", "rtg_4", "rtg_4.5", "rtg_5")
FLEX_RTG_RANGE: Tuple[float, float] = (-1.8, 5.0)

OPTIMAL_TASKS: Tuple[str, ...] = (
    "2x_5", "2x_10", "2x_15", "4x_5", "4x_10", "4x_15", "8x_5", "8x_10",
    "8x_15")
OPTIMAL_RTG_RANGE: Tuple[float, float] = (-1.08, 16.6)

# The nine default eval-set directory names ({acceleration}_{noise}),
# in the reference CLI's order (reference main.py:225-227). Consumed by
# both main.py's default dir list and data.expert.make_eval_dirs so the
# generated tree and the CLI default can never diverge.
EVAL_DIR_TOKENS: Tuple[str, ...] = (
    "4_15", "4_10", "4_5", "8_15", "8_10", "8_5", "2_15", "2_10", "2_5")

IMAGE_SIZE = 128  # CSMRI slice resolution (reference: env.py:64)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Decision Transformer hyperparameters.

    Defaults mirror /root/reference/transformer/decision_transformer.py:279-291.
    ``block_size`` counts *tokens* (3 per timestep), so the published
    ``--block_size 18`` gives a context of 6 timesteps.
    """
    block_size: int = 18
    n_embeds: int = 9            # task vocabulary size (6 flex / 9 optimal)
    embed_dim: int = 128
    n_heads: int = 4
    n_blocks: int = 5
    action_dim: int = 3
    max_timestep: int = 30
    dropout: float = 0.1
    embd_dropout: float = 0.1
    mode: str = "norm"           # 'norm' (optimal) or 'flex'
    image_size: int = IMAGE_SIZE
    dtype: str = "float32"       # compute dtype ('float32' or 'bfloat16')
    use_pallas: bool = False     # fused Pallas attention/layernorm kernels

    @property
    def context_length(self) -> int:
        return self.block_size // 3


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    """U-Net plug-in prior (reference: /root/reference/evaluation/noise.py)."""
    in_channels: int = 2          # image + sigma noise map
    out_channels: int = 1
    base_channels: int = 32       # 32/64/128/256/512 pyramid
    depth: int = 4
    dtype: str = "float32"
    use_pallas: bool = False


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """PnP-ADMM environment (reference: /root/reference/evaluation/env.py)."""
    max_episode_step: int = 30
    image_size: int = IMAGE_SIZE
    done_threshold: float = 0.5   # episode stops when action T > 0.5


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Training hyperparameters (reference: /root/reference/main.py:28-35,
    /root/reference/train.py:66,106-119)."""
    learning_rate: float = 3e-4
    betas: Tuple[float, float] = (0.9, 0.95)
    weight_decay: float = 0.1
    grad_norm_clipping: float = 1.0
    batch_size: int = 48
    max_epochs: int = 5
    warmup_steps: int = 1250
    lr_floor_mult: float = 0.1    # cosine decay floored at 0.1x base LR
    save_every: int = 1           # checkpoint cadence (epochs)
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    log_wandb: bool = False       # reference hardcodes an API key; we gate on
                                  # WANDB_API_KEY env var instead (train.py:136)
    watch_every: int = 1000       # wandb.watch(model) equivalent
                                  # (train.py:138): param + grad histograms
                                  # every N steps; 0 disables


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Greedy evaluator (reference: /root/reference/evaluation/eval.py)."""
    max_timesteps: int = 30
    rtg_target: float = 10.0
    eval_type: str = "norm"       # 'norm' or 'flex'
    report_every: int = 7         # print/return after this many images


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """PUCB tree search (reference: /root/reference/evaluation/mcts.py).

    The reference's ``c_base``/``c`` selection constants feed only a dead
    ``beta`` computation (mcts.py:74-77) and are not carried here.
    """
    iterations: int = 30
    n_children: int = 5
    sigma_d_std: float = 0.2
    mu_std: float = 0.001
    max_timesteps: int = 30
    context_length: int = 6
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The model is ~1.3M params over 18-token sequences,
    so data parallelism is the primary axis (SURVEY.md section on parallelism);
    a model axis is supported for tensor-parallel MLP/attention sharding."""
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    denoiser: DenoiserConfig = dataclasses.field(default_factory=DenoiserConfig)
    env: EnvConfig = dataclasses.field(default_factory=EnvConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mcts: MCTSConfig = dataclasses.field(default_factory=MCTSConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


# Familiar alias for users migrating from the reference
# (decision_transformer.py:279-291).
DecisionTransformerConfig = ModelConfig


def tasks_for_experiment(training_type: str) -> Tuple[Tuple[str, ...], Tuple[float, float]]:
    """Task vocab + RTG range per experiment.

    The reference selects these via an ``args.training_type`` flag that was
    never added to argparse (/root/reference/main.py:90 — latent bug); we
    implement the evidently-intended explicit selection.
    """
    if training_type in ("flexible", "flex"):
        return FLEX_TASKS, FLEX_RTG_RANGE
    return OPTIMAL_TASKS, OPTIMAL_RTG_RANGE
