from .common import (FoldedBN, fused_inference,
                     fused_inference_active, host_space_to_depth2,
                     pallas_conv, pallas_conv_active, quant_calibrate,
                     quant_int8, s2d_packed_input, s2d_stride2)
from .model import ArchCfg, YoloNet, build_arch, feat_shapes, STRIDES

__all__ = ["ArchCfg", "YoloNet", "build_arch", "feat_shapes", "STRIDES",
           "FoldedBN", "fused_inference", "fused_inference_active",
           "host_space_to_depth2", "pallas_conv", "pallas_conv_active",
           "quant_calibrate", "quant_int8", "s2d_packed_input",
           "s2d_stride2"]
