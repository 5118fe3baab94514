"""Full training-state checkpointing (params + BN stats + optimizer moments
+ step/epoch), enabling exact resume-from-interrupt.

The reference checkpoints model weights only — "Optimizer/scheduler/epoch
state is not checkpointed" (SURVEY.md §5); restarting meant a cold
LoadModel("last.bin"). Here the complete TrainState pytree is serialized
leaf-by-leaf (structure recovered from a template), so training continues
bit-for-bit where it stopped.
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


def restore_train_state(path: str, template_state) -> Tuple[Any, Dict]:
    """Restore into the structure of template_state (same model/optimizer)."""
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
