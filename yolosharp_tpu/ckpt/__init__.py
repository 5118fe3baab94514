from .binio import load_bin, save_bin
from .mapping import (LoadReport, clone_one2one, flatten, head_index,
                      skip_patterns_for_nc_mismatch, state_dict_to_variables,
                      unflatten, variables_to_state_dict)
from .pickle_pt import load_pt
from .safetensors_io import load_safetensors, save_safetensors


def load_state_dict_file(path: str):
    """Auto-detect checkpoint format by extension/magic and load it."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    if path.endswith((".pt", ".pth")):
        return load_pt(path)
    return load_bin(path)


def convert_checkpoint(src: str, dst: str, dtype=None):
    """Convert any supported checkpoint into a YoloSharp-format .bin
    (the Tools.TransModelFromSafetensors/LoadTensorFromPT equivalent,
    Utils/Tools.cs:16-117)."""
    import numpy as np

    sd = load_state_dict_file(src)
    if dtype is not None:
        sd = {k: np.asarray(v).astype(dtype) for k, v in sd.items()}
    save_bin(dst, sd)
    return len(sd)


__all__ = [
    "load_bin", "save_bin", "load_pt", "load_safetensors", "save_safetensors",
    "load_state_dict_file", "LoadReport", "clone_one2one", "flatten",
    "head_index", "skip_patterns_for_nc_mismatch", "state_dict_to_variables",
    "unflatten", "variables_to_state_dict",
]
