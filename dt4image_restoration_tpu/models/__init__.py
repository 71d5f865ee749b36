from dt4image_restoration_tpu.models.unet import UNet, UNetDenoiser
from dt4image_restoration_tpu.models.decision_transformer import (
    DecisionTransformer,
    DTOutput,
)

__all__ = ["UNet", "UNetDenoiser", "DecisionTransformer", "DTOutput"]
