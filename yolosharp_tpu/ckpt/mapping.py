"""State-dict <-> flax-variables mapping.

Our parameter tree intentionally mirrors Ultralytics/YoloSharp names (see
nn/model.py), so the map is a mechanical rename + layout transpose:

  torch "model.3.conv.weight" (OIHW)  <->  params["3"]["conv"]["kernel"] (HWIO)
  torch "...bn.weight/bias"           <->  params[...]["bn"]["scale"/"bias"]
  torch "...bn.running_mean/var"      <->  batch_stats[...]["bn"]["mean"/"var"]
  torch "...linear.weight" (out,in)   <->  params[...]["linear.weight"] (in,out)

Also implements the reference's checkpoint-load semantics
(Models/YoloBaseTaskModel.cs:27-114): skip-nc-mismatched head layers,
one2one head cloning for End2End, and the save-side one2one exclusion +
synthetic DFL/num_batches_tracked emission for byte-level .bin interop.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def flatten(tree, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[".".join(prefix + (k,))] = v
    return out


def unflatten(flat: Dict[str, np.ndarray], template) -> dict:
    """Rebuild a nested dict with the template's structure from dotted keys."""

    def build(sub, prefix):
        out = {}
        for k, v in sub.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out[k] = build(v, p)
            else:
                out[k] = flat[".".join(p)]
        return out

    return build(template, ())


_TRANSPOSE_CT = ("upsample", "conv_transpose")  # torch (cin,cout,kh,kw)


def _to_flax(torch_key: str, arr: np.ndarray, param_keys: set,
             stats_keys: set) -> Optional[Tuple[str, str, np.ndarray]]:
    """Map one torch state-dict entry to (collection, flax_key, array)."""
    key = torch_key
    if key.startswith("model."):
        key = key[len("model."):]
    if key.endswith("num_batches_tracked") or ".dfl." in key:
        return None
    parts = key.rsplit(".", 1)
    stem, leaf = parts[0], parts[1]
    parent = stem.rsplit(".", 1)[-1]

    if leaf == "running_mean":
        return ("batch_stats", f"{stem}.mean", arr.astype(np.float32))
    if leaf == "running_var":
        return ("batch_stats", f"{stem}.var", arr.astype(np.float32))
    if leaf == "weight":
        if f"{stem}.scale" in param_keys:  # BatchNorm gamma
            return ("params", f"{stem}.scale", arr.astype(np.float32))
        if f"{stem}.kernel" in param_keys:
            if arr.ndim == 4:
                perm = (2, 3, 0, 1) if parent in _TRANSPOSE_CT else (2, 3, 1, 0)
                return ("params", f"{stem}.kernel",
                        np.transpose(arr, perm).astype(np.float32))
            if arr.ndim == 2:
                return ("params", f"{stem}.kernel",
                        arr.T.astype(np.float32))
        if key in param_keys:  # e.g. "N.linear.weight", ma.in_proj_weight
            if arr.ndim == 2:
                return ("params", key, arr.T.astype(np.float32))
            return ("params", key, arr.astype(np.float32))
        return ("params", f"{stem}.kernel",
                np.transpose(arr, (2, 3, 1, 0)).astype(np.float32)
                if arr.ndim == 4 else arr.astype(np.float32))
    if leaf == "bias":
        if f"{stem}.bias" in param_keys:
            return ("params", f"{stem}.bias", arr.astype(np.float32))
        return ("params", key, arr.astype(np.float32))
    # plain parameters: gamma, lambd, kappa, ...
    return ("params", key, arr.astype(np.float32))


class LoadReport:
    def __init__(self):
        self.loaded = []
        self.skipped = []
        self.missing = []
        self.unexpected = []

    def __repr__(self):
        return (f"LoadReport(loaded={len(self.loaded)}, "
                f"skipped={len(self.skipped)}, missing={len(self.missing)}, "
                f"unexpected={len(self.unexpected)})")


def head_index(params: dict) -> int:
    """Layer index of the task head (largest numeric top-level name)."""
    return max(int(k) for k in params.keys() if k.isdigit())


def state_dict_to_variables(state_dict: Dict[str, np.ndarray], variables,
                            skip_patterns: Tuple[str, ...] = (),
                            strict_shapes: bool = True):
    """Merge a torch-named state dict into a flax variables template.

    Returns (new_variables, LoadReport). skip_patterns are regexes applied to
    the ORIGINAL torch keys (reference semantics, YoloBaseTaskModel.cs:41-98).
    """
    params_flat = flatten(variables["params"])
    stats_flat = flatten(variables.get("batch_stats", {}))
    param_keys, stats_keys = set(params_flat), set(stats_flat)
    report = LoadReport()
    compiled = [re.compile(p) for p in skip_patterns]

    for tkey, arr in state_dict.items():
        if any(c.search(tkey) for c in compiled):
            report.skipped.append(tkey)
            continue
        mapped = _to_flax(tkey, np.asarray(arr), param_keys, stats_keys)
        if mapped is None:
            continue
        coll, fkey, value = mapped
        target = params_flat if coll == "params" else stats_flat
        keys = param_keys if coll == "params" else stats_keys
        if fkey not in keys:
            report.unexpected.append(tkey)
            continue
        if tuple(target[fkey].shape) != tuple(value.shape):
            if strict_shapes:
                raise ValueError(
                    f"shape mismatch for {tkey}: ckpt {value.shape} vs "
                    f"model {target[fkey].shape}")
            report.unexpected.append(tkey)
            continue
        target[fkey] = value
        report.loaded.append(fkey)

    loaded = set(report.loaded)
    report.missing = [k for k in param_keys | stats_keys if k not in loaded]

    new_vars = dict(variables)
    new_vars["params"] = unflatten(params_flat, variables["params"])
    if "batch_stats" in variables:
        new_vars["batch_stats"] = unflatten(stats_flat,
                                            variables["batch_stats"])
    return new_vars, report


def clone_one2one(variables) -> dict:
    """Copy one2many head branches into their one2one twins.

    Mirrors One2one_Init (YoloBaseTaskModel.cs:452-459, Head.cs:152-167):
    after loading a non-E2E checkpoint into an E2E model, the one2one_cv*
    towers start as exact copies of cv*.
    """
    out = {}
    for coll, tree in variables.items():
        flat = flatten(tree)
        for key in list(flat):
            m = re.search(r"\.(one2one_(cv\d))\.", key)
            if m:
                src = key.replace(m.group(1), m.group(2))
                if src in flat:
                    flat[key] = flat[src]
        out[coll] = unflatten(flat, tree)
    return out


def skip_patterns_for_nc_mismatch(task: str, head_idx: int,
                                  state_dict: Dict[str, np.ndarray],
                                  nc: int, nk: Optional[int] = None
                                  ) -> Tuple[str, ...]:
    """Reference skipNcNotEqualLayers semantics (YoloBaseTaskModel.cs:41-98)."""
    pats = []
    if task == "classify":
        pat = rf"model\.{head_idx}\.linear"
        keys = [k for k in state_dict if re.search(pat + r".+bias", k)
                or re.search(pat + r"\.bias", k)]
        if keys and state_dict[keys[-1]].shape[0] != nc:
            pats.append(pat)
        return tuple(pats)
    pat_cv3 = rf"model\.{head_idx}\.cv3"
    keys = [k for k in state_dict if re.search(pat_cv3 + r".+bias", k)]
    if keys and state_dict[keys[-1]].shape[0] != nc:
        pats.append(pat_cv3)
    if task == "pose" and nk is not None:
        pat_cv4 = rf"model\.{head_idx}\.cv4"
        keys4 = [k for k in state_dict if re.search(pat_cv4 + r".+bias", k)]
        if keys4 and state_dict[keys4[-1]].shape[0] != nk:
            pats.append(pat_cv4)
    return tuple(pats)


def variables_to_state_dict(variables, reg_max: int = 16,
                            include_one2one: bool = False,
                            dtype=np.float32) -> Dict[str, np.ndarray]:
    """Export flax variables as a torch-named state dict for .bin saving.

    Emits synthetic `dfl.conv.weight` (the fixed arange projection) and
    `num_batches_tracked` buffers so the tensor COUNT matches what the C#
    reference expects on load (it falls back to random weights on count
    mismatch, YoloBaseTaskModel.cs:32-35). one2one branches are excluded by
    default, as in SaveWeight (YoloBaseTaskModel.cs:474-480).
    """
    params_flat = flatten(variables["params"])
    stats_flat = flatten(variables.get("batch_stats", {}))
    head_idx = head_index(variables["params"])
    out: Dict[str, np.ndarray] = {}

    def put(key, val):
        out["model." + key] = np.asarray(val).astype(dtype)

    for key, val in params_flat.items():
        if not include_one2one and "one2one" in key:
            continue
        stem, leaf = key.rsplit(".", 1)
        parent = stem.rsplit(".", 1)[-1]
        val = np.asarray(val)
        if leaf == "scale":
            put(f"{stem}.weight", val)
        elif leaf == "kernel":
            if val.ndim == 4:
                perm = (2, 3, 0, 1) if parent in _TRANSPOSE_CT else (3, 2, 0, 1)
                put(f"{stem}.weight", np.transpose(val, perm))
            else:
                put(f"{stem}.weight", val.T)
        elif leaf == "weight" and val.ndim == 2:
            # torch-named linear weights stored (in, out) -> save (out, in)
            put(key, val.T)
        else:
            put(key, val)
    for key, val in stats_flat.items():
        if not include_one2one and "one2one" in key:
            continue
        stem, leaf = key.rsplit(".", 1)
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        put(f"{stem}.{name}", val)
        put(f"{stem}.num_batches_tracked",
            np.zeros((), dtype=np.int64))
    # fixed DFL projection conv (Block.cs DFL ctor, Modules/Block.cs:26-33)
    if any(k.startswith(f"{head_idx}.cv2.") for k in params_flat):
        put(f"{head_idx}.dfl.conv.weight",
            np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1))
    return out
