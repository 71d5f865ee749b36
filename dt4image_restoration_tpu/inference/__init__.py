from dt4image_restoration_tpu.inference.evaluator import (
    Evaluator,
    EvalBuffers,
    greedy_rollout,
    initial_policy_setup,
    make_policy_step,
)
from dt4image_restoration_tpu.inference.mcts import (
    MCTS,
    BatchedMCTS,
    Node,
    run_mcts,
)
from dt4image_restoration_tpu.inference.mcts_device import DeviceMCTS

__all__ = ["Evaluator", "EvalBuffers", "greedy_rollout",
           "initial_policy_setup", "make_policy_step",
           "MCTS", "BatchedMCTS", "DeviceMCTS", "Node", "run_mcts"]
