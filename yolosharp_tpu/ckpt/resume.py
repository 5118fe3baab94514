"""Full training-state checkpointing (params + BN stats + optimizer moments
+ step/epoch), enabling exact resume-from-interrupt.

The reference checkpoints model weights only — "Optimizer/scheduler/epoch
state is not checkpointed" (SURVEY.md §5); restarting meant a cold
LoadModel("last.bin"). Here the complete TrainState pytree is serialized
leaf-by-leaf (structure recovered from a template), so training continues
bit-for-bit where it stopped.

Two interchangeable backends (`restore_train_state` auto-detects):
  - npz (default): one portable file, leaf-by-leaf.
  - orbax (`Config.resume_format="orbax"`): a checkpoint DIRECTORY via
    orbax.checkpoint — the TPU-native format: arrays are written with
    their shardings (each host writes its shards in a multi-host mesh)
    and restored to the template's placement, so resume scales to
    multi-chip training without gathering state to one host.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def save_train_state(path: str, state, extra: Optional[Dict] = None) -> None:
    """Serialize a TrainState (minus the static tx) + metadata to one file."""
    leaves = jax.tree_util.tree_leaves(
        {"step": state.step, "params": state.params,
         "batch_stats": state.batch_stats, "opt_state": state.opt_state,
         "loss_scale": state.loss_scale, "grow_count": state.grow_count})
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, __meta__=json.dumps(extra or {}), **arrays)


def _state_tree(state) -> Dict:
    return {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "loss_scale": state.loss_scale, "grow_count": state.grow_count}


def save_train_state_orbax(path: str, state,
                           extra: Optional[Dict] = None) -> None:
    """Serialize the TrainState as an orbax checkpoint directory.

    Arrays are saved WITH their shardings — on a data-parallel mesh the
    replicated state writes once, and a future model-sharded state would
    write one shard per host. `extra` ints (e.g. epoch) ride along in the
    tree so restore needs no side files.
    """
    import orbax.checkpoint as ocp

    tree = {"state": _state_tree(state),
            "extra": {"epoch": np.full((), (extra or {}).get("epoch", 0),
                               np.int64)}}
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_train_state_orbax(path: str, template_state) -> Tuple[Any, Dict]:
    import orbax.checkpoint as ocp

    template = {"state": _state_tree(template_state),
                "extra": {"epoch": np.zeros((), np.int64)}}
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    st = restored["state"]
    new_state = template_state.replace(
        step=st["step"], params=st["params"],
        batch_stats=st["batch_stats"], opt_state=st["opt_state"],
        loss_scale=st["loss_scale"], grow_count=st["grow_count"])
    return new_state, {"epoch": int(restored["extra"]["epoch"])}


def restore_train_state(path: str, template_state) -> Tuple[Any, Dict]:
    """Restore into the structure of template_state (same model/optimizer).
    Auto-detects the backend: an orbax checkpoint is a directory, the npz
    backend a single file."""
    if os.path.isdir(path):
        return restore_train_state_orbax(path, template_state)
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    tree = {"step": template_state.step, "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "loss_scale": template_state.loss_scale,
            "grow_count": template_state.grow_count}
    treedef = jax.tree_util.tree_structure(tree)
    n = treedef.num_leaves
    n_file = sum(1 for k in data.files if k.startswith("leaf_"))
    if n_file == n - 2:
        # pre-loss-scale checkpoint: restore the old subset, keep the
        # template's scale fields
        old = {k: tree[k] for k in ("step", "params", "batch_stats",
                                    "opt_state")}
        treedef = jax.tree_util.tree_structure(old)
        leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
        restored = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        leaves = [data[f"leaf_{i}"] for i in range(n)]
        restored = jax.tree_util.tree_unflatten(treedef, leaves)
    new_state = template_state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        **({"loss_scale": restored["loss_scale"],
            "grow_count": restored["grow_count"]}
           if "loss_scale" in restored else {}))
    return new_state, meta
