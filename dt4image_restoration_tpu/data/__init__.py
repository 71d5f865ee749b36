from dt4image_restoration_tpu.data.synthetic import (
    make_mat_record,
    radial_mask,
    shepp_logan,
)
from dt4image_restoration_tpu.data.datasets import (
    EvaluationDataset,
    EvaluationFlexibleDataset,
    EvaluationOptimalDataset,
    TrainingDataset,
    extract_task,
)

__all__ = ["make_mat_record", "radial_mask", "shepp_logan",
           "EvaluationDataset", "EvaluationFlexibleDataset",
           "EvaluationOptimalDataset", "TrainingDataset", "extract_task"]
