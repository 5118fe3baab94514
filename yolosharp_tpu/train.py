"""Training machinery: optimizer groups, LR schedules (warm-up + LambdaLR /
OneCycle), jitted data-parallel train step, train state.

Functional parity targets: Models/YoloBaseTaskModel.cs:116-356 (Train /
TrainEpoch: AdamW three param groups with lr_fit = 0.002*5/(4+nc), per-step
warm-up interpolation with bias start 0.1, per-epoch LambdaLR/OneCycle),
Utils/Amp.cs (bf16 compute with fp32 master params is the native TPU policy,
so the explicit fp16 loss-scaling machinery reduces to a dtype cast).

NOTE on param groups: the reference builds overlapping LINQ groups
(bias/weight/bn, YoloBaseTaskModel.cs:144-153) which double-register BN
params; we use the standard disjoint split (conv/linear kernels with weight
decay; BN scales and all biases without), which is what the copied
Ultralytics recipe intends.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .parallel.mesh import batch_sharding, replicated


def lr_fit(nc: int) -> float:
    """lr0 fit equation (YoloBaseTaskModel.cs:142)."""
    return round(0.002 * 5 / (4 + nc), 6)


def linear_lambda(y1: float, y2: float, steps: int) -> Callable[[float], float]:
    """LrLambda (YoloBaseTaskModel.cs:504-512)."""

    def fn(epoch):
        x = epoch / steps
        return max(1 - x, 0) * (y1 - y2) + y2

    return fn


def one_cycle(y1: float, y2: float, steps: int) -> Callable[[float], float]:
    """OneCycle cosine (YoloBaseTaskModel.cs:492-502)."""

    def fn(epoch):
        factor = max((1 - math.cos(epoch * math.pi / steps)) / 2, 0)
        return factor * (y2 - y1) + y1

    return fn


def make_lr_schedule(*, nc: int, epochs: int, steps_per_epoch: int,
                     warmup_epochs: int = 3, warmup_bias_lr: float = 0.1,
                     use_cos_lr: bool = False, lrf: float = 0.01,
                     bias_group: bool = False) -> Callable:
    """Per-step LR: warm-up interp into the per-epoch lambda schedule.

    Mirrors TrainEpoch's warm-up (YoloBaseTaskModel.cs:306-319): during
    ni <= nw the LR ramps linearly from (0.1 for the bias group, else 0) to
    lr0 * lambda(epoch); afterwards the LambdaLR value applies.
    """
    lr0 = lr_fit(nc)
    nb = steps_per_epoch
    nw = max(warmup_epochs * nb, 100)
    lam = (one_cycle(1.0, lrf, epochs) if use_cos_lr
           else linear_lambda(1.0, lrf, epochs))

    def sched(step):
        # step is a traced int; all math stays jit-friendly
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / nb) + 1.0
        i = step - (epoch - 1.0) * nb
        ni = i + nb * epoch
        # post-warmup LR: LambdaLR has stepped (epoch-1) times
        if use_cos_lr:
            factor = jnp.maximum(
                (1 - jnp.cos((epoch - 1) * math.pi / epochs)) / 2, 0)
            lam_now = factor * (lrf - 1.0) + 1.0
            lam_tgt_f = jnp.maximum(
                (1 - jnp.cos(epoch * math.pi / epochs)) / 2, 0)
            lam_tgt = lam_tgt_f * (lrf - 1.0) + 1.0
        else:
            lam_now = jnp.maximum(1 - (epoch - 1) / epochs, 0) * (1 - lrf) + lrf
            lam_tgt = jnp.maximum(1 - epoch / epochs, 0) * (1 - lrf) + lrf
        base = lr0 * lam_now
        start = warmup_bias_lr if bias_group else 0.0
        tgt = lr0 * lam_tgt
        warm = start + jnp.clip(ni / nw, 0.0, 1.0) * (tgt - start)
        return jnp.where(ni <= nw, warm, base)

    return sched


def param_group(path: Tuple[str, ...]) -> str:
    """bias | bn | weight group per leaf (disjoint; see module docstring)."""
    leaf = path[-1]
    if leaf == "bias":
        return "bias"
    if leaf == "scale":
        return "bn"
    return "weight"


def make_optimizer(*, nc: int, epochs: int, steps_per_epoch: int,
                   warmup_epochs: int = 3, warmup_bias_lr: float = 0.1,
                   use_cos_lr: bool = False, lrf: float = 0.01,
                   weight_decay: float = 5e-4) -> optax.GradientTransformation:
    common = dict(nc=nc, epochs=epochs, steps_per_epoch=steps_per_epoch,
                  warmup_epochs=warmup_epochs, warmup_bias_lr=warmup_bias_lr,
                  use_cos_lr=use_cos_lr, lrf=lrf)

    def adamw(sched, wd):
        return optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)

    tx = optax.multi_transform(
        {"bias": adamw(make_lr_schedule(bias_group=True, **common), 0.0),
         "bn": adamw(make_lr_schedule(**common), 0.0),
         "weight": adamw(make_lr_schedule(**common), weight_decay)},
        param_labels=lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: param_group(
                tuple(p.key for p in path)), params))
    return tx


def normalize_images(images, compute_dtype):
    """uint8 batches are normalized on device (keeps host->HBM traffic 4x
    smaller); float batches are assumed pre-normalized."""
    if images.dtype == jnp.uint8:
        return images.astype(compute_dtype) / 255.0
    return images.astype(compute_dtype)


def resolve_batch_images(batch: Dict, compute_dtype, packed: bool = False,
                         separable: bool = False):
    """Produce (images, batch) for the step: either the host-prepared
    `images` tensor, or the device-rendered augmentation (one fused
    gather/sample program, data/device_augment.py) when the loader shipped
    an `aug_pool` plan. Segmentation masks render on device too.

    packed=True renders the canvas 2x2 space-to-depth packed (free: the
    gather's coordinate constants are enumerated in packed order) for the
    stem's s2d_packed_input train-mode rewrite. Host-prepared batches pack
    via one in-graph space_to_depth2 on the UINT8 tensor — a (B,H,W,3)
    byte transpose (4x cheaper than post-normalize; ~15 us at b4-640) that
    buys the whole packed train region for the host path too (letterbox
    trainings and the close-mosaic tail; round-5 measurement in
    BASELINE.md)."""
    if "aug_pool" not in batch:
        images = batch["images"]
        if packed and images.ndim == 4 and images.shape[-1] == 3 \
                and images.shape[1] % 2 == 0 and images.shape[2] % 2 == 0:
            from .nn.common import space_to_depth2

            images = space_to_depth2(images)
        return normalize_images(images, compute_dtype), batch
    from .data.device_augment import (mosaic_perspective_images,
                                      mosaic_perspective_masks)

    s = batch["aug_pool"].shape[1]
    arrays = (batch["aug_src_idx"], batch["aug_rects"], batch["aug_pads"],
              batch["aug_minv"], batch["aug_persp"], batch["aug_flips"],
              batch["aug_hsv"])
    images = mosaic_perspective_images(batch["aug_pool"], arrays, s,
                                       packed=packed, separable=separable)
    images = images.astype(compute_dtype) / 255.0
    if "aug_mask_pool" in batch:
        ratio = s // batch["aug_mask_pool"].shape[1]
        marrays = (batch["aug_src_idx"], batch["aug_rects"],
                   batch["aug_pads"], batch["aug_minv"], batch["aug_persp"],
                   batch["aug_flips"], batch["aug_mask_lut"])
        masks = mosaic_perspective_masks(batch["aug_mask_pool"], marrays,
                                         s, ratio)
        batch = {**batch, "masks": masks}
    return images, batch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # fp16 dynamic loss scale (Amp.cs:17-48); fixed 1.0 under bf16/fp32
    loss_scale: jnp.ndarray
    grow_count: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables, tx, init_scale: float = 1.0):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   loss_scale=jnp.asarray(init_scale, jnp.float32),
                   grow_count=jnp.zeros((), jnp.int32), tx=tx)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_train_step(net, loss_fn, *, compute_dtype=jnp.float32,
                    mesh=None, donate: bool = True,
                    skip_nonfinite: bool = True,
                    dynamic_loss_scale: bool = False,
                    scale_growth_interval: int = 2000,
                    max_loss_scale: float = 65536.0,
                    fsdp: bool = False,
                    packed_stem: bool = False,
                    separable_render: bool = False,
                    packed_depth: int = 0,
                    compiler_options: Dict = None,
                    remat: bool = False):
    """Build the jitted data-parallel train step.

    loss_fn(preds, batch, **loss_kwargs) -> (scalar_loss, items).
    When a mesh is given, batch args are sharded on the data axis and the
    state is replicated — XLA derives the gradient psum over ICI.

    fsdp=True (requires mesh) switches to ZeRO-style sharded state: the
    caller commits the TrainState with `parallel.fsdp.fsdp_shard_state`
    and the jit inherits those shardings — XLA all-gathers each layer's
    params on use and reduce-scatters its grads, all over ICI. Output
    state keeps the input shardings by GSPMD propagation.

    skip_nonfinite mirrors the reference AMP's inf/NaN-gradient step
    skipping (Utils/Amp.cs:350-361): if any gradient is non-finite, the
    optimizer state and params keep their previous values (branch-free
    select, no host sync).

    dynamic_loss_scale adds the reference fp16 AMP semantics
    (Amp.cs:94-135): backward on loss * scale, grads unscaled before the
    optimizer, scale halved (min 1) on a non-finite step and doubled
    (capped) after scale_growth_interval consecutive finite steps.
    bf16/fp32 training leaves it off — TPU bf16 needs no scaling. Create
    the TrainState with init_scale=65536.0 when enabling.

    packed_depth (requires packed_stem, i.e. the device-rendered packed
    canvas) extends the s2d-packed region into TRAIN-mode forwards:
    1 = the stem emits packed and conv1 consumes (deep), 2 = conv1 also
    emits packed and the layer-2 CSP block runs on the packed grid
    (deeper). Real BatchNorm over the exposed parity axis — stats and
    gradients exactly match the plain path (nn/common.py
    packed_batch_norm; oracle test in tests/test_fuse.py).
    """

    def step_fn(state: TrainState, batch: Dict, loss_kwargs: Dict):
        images, batch = resolve_batch_images(batch, compute_dtype,
                                             packed=packed_stem,
                                             separable=separable_render)
        scale = (state.loss_scale if dynamic_loss_scale
                 else jnp.asarray(1.0, jnp.float32))

        def fwd(params, images):
            import contextlib

            from .nn.common import s2d_packed_input

            variables = {"params": params, "batch_stats": state.batch_stats}
            ctx = (s2d_packed_input(deep=packed_depth >= 1,
                                    deeper=max(0, packed_depth - 1),
                                    allow_train=packed_depth >= 1)
                   if packed_stem else contextlib.nullcontext())
            with ctx:
                return net.apply(variables, images, True,
                                 mutable=["batch_stats"])

        if remat:
            # recompute the forward in backward instead of saving every
            # activation: trades ~1 extra forward of MXU FLOPs for the
            # saved-activation HBM writes + layout copies (a measured win
            # only on layout-bound programs - see BASELINE.md round 5)
            fwd = jax.checkpoint(fwd)

        def loss_of(params):
            preds, updates = fwd(params, images)
            loss, items = loss_fn(preds, batch, **loss_kwargs)
            return loss * scale, (items, updates["batch_stats"])

        grad_fn = jax.value_and_grad(loss_of, has_aux=True)
        (loss, (items, new_stats)), grads = grad_fn(state.params)
        loss = loss / scale
        if dynamic_loss_scale:
            grads = jax.tree_util.tree_map(
                lambda g: (g.astype(jnp.float32) / scale).astype(g.dtype),
                grads)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_scale, new_grow = state.loss_scale, state.grow_count
        if skip_nonfinite or dynamic_loss_scale:
            finite = jnp.all(jnp.asarray(
                [jnp.isfinite(g).all() for g in
                 jax.tree_util.tree_leaves(grads)]))

            def sel(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(finite, n, o), new, old)

            new_params = sel(new_params, state.params)
            new_opt = sel(new_opt, state.opt_state)
            if dynamic_loss_scale:
                grown = new_grow + 1
                do_grow = grown >= scale_growth_interval
                new_scale = jnp.where(
                    finite,
                    jnp.where(do_grow,
                              jnp.minimum(scale * 2.0, max_loss_scale),
                              scale),
                    jnp.maximum(scale * 0.5, 1.0))
                new_grow = jnp.where(finite & ~do_grow, grown, 0)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt,
                                  loss_scale=new_scale, grow_count=new_grow)
        return new_state, loss, items

    # per-program XLA overrides (e.g. Config.xla_train_tuning for the
    # m/x-size 640px family steps); None = compiler defaults
    copts = {"compiler_options": dict(compiler_options)} \
        if compiler_options else {}
    if mesh is not None and fsdp:
        # shardings are inherited from the committed arguments (state via
        # fsdp_shard_state, batch via shard_batch); outputs follow GSPMD
        # propagation so new_state stays FSDP-sharded across steps
        return jax.jit(step_fn, donate_argnums=(0,) if donate else (),
                       **copts)
    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(rep, bsh, None),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0,) if donate else (),
            static_argnames=(),
            **copts,
        )
    return jax.jit(step_fn, donate_argnums=(0,) if donate else (), **copts)


def make_eval_step(net, loss_fn, decode_fn, *, compute_dtype=jnp.float32,
                   mesh=None):
    """Jitted eval: loss items + decoded inference tensor for metrics."""

    def step_fn(variables, batch, loss_kwargs: Dict):
        images = normalize_images(batch["images"], compute_dtype)
        preds = net.apply(variables, images, False)
        _, items = loss_fn(preds, batch, **loss_kwargs)
        inference = decode_fn(preds)
        return items, inference

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(step_fn, in_shardings=(rep, bsh, None),
                       out_shardings=(rep, None))
    return jax.jit(step_fn)
