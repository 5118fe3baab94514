from .model import ArchCfg, YoloNet, build_arch, feat_shapes, STRIDES

__all__ = ["ArchCfg", "YoloNet", "build_arch", "feat_shapes", "STRIDES"]
