from dt4image_restoration_tpu.inference.evaluator import (
    Evaluator,
    EvalBuffers,
    greedy_rollout,
    initial_policy_setup,
    make_policy_step,
)

__all__ = ["Evaluator", "EvalBuffers", "greedy_rollout",
           "initial_policy_setup", "make_policy_step"]
