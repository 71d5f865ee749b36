from dt4image_restoration_tpu.models.unet import UNet, UNetDenoiser
from dt4image_restoration_tpu.models.decision_transformer import (
    DecisionTransformer,
    DTOutput,
)

# Reference-familiar alias (noise.py:139).
UNetDenoiser2D = UNetDenoiser

__all__ = ["UNet", "UNetDenoiser", "UNetDenoiser2D", "DecisionTransformer",
           "DTOutput"]
