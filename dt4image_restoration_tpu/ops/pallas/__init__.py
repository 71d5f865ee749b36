from dt4image_restoration_tpu.ops.pallas.kspace import (
    kspace_consistency_pallas,
)
from dt4image_restoration_tpu.ops.pallas.attention import (
    fused_causal_attention,
)
from dt4image_restoration_tpu.ops.pallas.layernorm import layernorm_pallas
from dt4image_restoration_tpu.ops.pallas.conv_block import fused_conv_block

__all__ = ["kspace_consistency_pallas", "fused_causal_attention",
           "layernorm_pallas", "fused_conv_block"]
