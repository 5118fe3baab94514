"""Task orchestration: Detector / Segmenter / Obber / PoseDetector /
Classifier + the YoloTask facade (train loop, validation, prediction,
checkpoint load/save).

Functional parity targets: Models/YoloTask.cs:10-107, YoloBaseTaskModel.cs
(Train/TrainEpoch/LoadModel/SaveWeight), Models/{Detector,Segmenter,Obber,
PoseDetector,Classifier}.cs. Differences by design:
 - train/eval are single jitted device programs (no per-batch host syncs);
 - results come back as one bulk transfer (the reference reads scalars in a
   loop, Detector.cs:50-69);
 - data parallelism over a jax.sharding.Mesh when >1 device is visible.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compile import predict_jit
from .ckpt import (clone_one2one, load_state_dict_file, save_bin,
                   skip_patterns_for_nc_mismatch, state_dict_to_variables,
                   variables_to_state_dict)
from .config import Config
from .data import ClassificationDataset, DataLoader, YoloDataset
from .loss import (classification_loss, detection_loss, e2e_gain_schedule,
                   e2e_wrap, obb_loss, pose_loss, segmentation_loss)
from .nn import ArchCfg, YoloNet
from .ops import box_iou, kpt_iou, mask_iou, batch_probiou
from .ops.masks import process_mask
from .ops.nms import non_max_suppression
from .parallel.mesh import create_mesh, shard_batch
from .predict import (decode_inference, decode_inference_topk,
                      e2e_postprocess, pad_to_multiple)
from .train import TrainState, make_optimizer, make_train_step
from .types import KeyPoint, TaskType, YoloResult
from .utils.metrics import ap_per_class, match_predictions, summarize
from .utils.training import EarlyStopping, TrainLogger

OKS_SIGMA = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72, .62,
                      .62, 1.07, 1.07, .87, .87, .89, .89], np.float32) / 10.0

_TASK_MAP = {
    TaskType.detect: "detect", TaskType.segment: "segment",
    TaskType.obb: "obb", TaskType.pose: "pose", TaskType.classify: "classify",
}


class BaseTask:
    task: TaskType = TaskType.detect
    loss_names: Tuple[str, ...] = ("box_loss", "cls_loss", "dfl_loss")
    metric_names: Tuple[str, ...] = ("precision(B)", "recall(B)", "mAP50(B)",
                                     "mAP50-95(B)")
    val_conf: float = 0.1

    def __init__(self, config: Config):
        self.config = config
        end2end = config.end2end and self.task != TaskType.classify
        self.arch = ArchCfg(
            version=config.yolo_type.value, size=config.yolo_size.value,
            task=_TASK_MAP[self.task], nc=config.number_class,
            kpt_num=config.keypoint_num, kpt_dim=config.keypoint_dim,
            end2end=end2end)
        self.net = YoloNet(self.arch)
        self.variables = None
        self._predict_cache: Dict = {}

    # ------------------------------------------------------------- setup
    def _ensure_variables(self):
        if self.variables is None:
            x = jnp.zeros((1, 128, 128, 3), jnp.float32)
            self.variables = self.net.init(jax.random.PRNGKey(0), x, False)
            if self.task != TaskType.classify:
                from .ckpt.fuse import bias_init

                # NB: the prior formula uses the 640 constant regardless
                # of configured imgsz (Head.cs:135)
                self.variables = bias_init(self.variables,
                                           self.config.number_class)
        return self.variables

    def _predict_variables(self):
        """Variables used by predict: BN-folded (cached per source tree)
        when Config.fuse_inference, raw otherwise; int8 calibration stats
        attach as the "quant_stats" collection when present."""
        v = self._ensure_variables()
        if not self.config.fuse_inference:
            return v
        if getattr(self, "_fused_src", None) is not v:
            from .ckpt.fuse import fold_bn

            # fold_bn returns host numpy; pin the folded tree on device so
            # repeated predicts don't re-upload the parameters every call
            fused = fold_bn(v)
            if getattr(self, "_quant_stats", None) is not None:
                fused = {**fused, "quant_stats": self._quant_stats}
            self._fused_vars = jax.device_put(fused)
            self._fused_src = v
        return self._fused_vars

    def _sharded_predict_inputs(self, batch: np.ndarray, variables,
                                mesh):
        """Place a uint8 canvas batch on a data-parallel mesh: rows
        sharded over the data axis, parameters replicated (cached per
        (mesh, variables) pair), so ONE predict program runs across all
        chips — the serving scale-out the single-device reference cannot
        express (Types/YoloTypes.cs:49-53 enumerates one device). Pads
        the batch with repeated rows to a data-axis multiple; callers
        slice results back to the original count."""
        from .parallel.mesh import DATA_AXIS, batch_sharding

        dp = mesh.shape[DATA_AXIS]
        pad = (-batch.shape[0]) % dp
        if pad:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], pad, axis=0)])
        return (jax.device_put(batch, batch_sharding(mesh)),
                self._replicated_vars(mesh, variables))

    def _replicated_vars(self, mesh, variables):
        """Parameters replicated over the mesh, cached per (mesh,
        variables) pair so repeated predict calls don't re-place them."""
        from .parallel.mesh import replicate_tree

        key = (id(mesh), id(variables))
        if getattr(self, "_mesh_vars_key", None) != key:
            self._mesh_vars = replicate_tree(variables, mesh)
            self._mesh_vars_key = key
        return self._mesh_vars

    def _apply_eval(self, variables, images, skip_one2many: bool = False,
                    packed: bool = False):
        """Eval-mode forward honouring Config.fuse_inference (call only
        with variables from _predict_variables when fusing).

        skip_one2many: E2E NMS-free predict consumes only the one2one
        branch (Head.cs:117-127); passing True removes the one2many
        towers from the traced graph entirely.

        packed: images arrive HOST space-to-depth packed (B, H/2, W/2, 12)
        — the stem runs as the exact stride-1 repacked conv
        (nn/common.py s2d_packed_input; requires fuse_inference). With
        Config.host_s2d_deep (default) the stem also EMITS its output
        packed and conv1 consumes it — both early convs run with full MXU
        lanes, still zero in-graph transposes (measured +15% paired on
        v5e, v8s-640 b32). With Config.host_s2d_deeper (default, v8
        family) the packed region extends through the layer-2 C2f
        (measured +16.6% more: 2207 img/s / 32.1% MFU same run)."""
        if self.config.fuse_inference:
            from .nn import fused_inference, pallas_conv
            from .nn.common import (quant_int8, s2d_packed_input,
                                    s2d_stride2)

            # the Pallas small-channel conv kernel only pays off (and is
            # only tuned) on real TPU hardware
            use_pallas = (self.config.pallas_conv
                          and jax.default_backend() == "tpu")
            use_int8 = (self.config.int8_predict
                        and getattr(self, "_quant_stats", None) is not None)
            # deeper-region eligibility: layer 2 (and 4, at depth 2) must
            # be a packed-rewritable CSP block — C2f (v8), C3 (v5u), or
            # C3k2 (v11/v12; plain bottlenecks at n/s, _PackedC3k inner
            # blocks at m/l/x) — all four families, every size
            eligible = self.arch.version in ("v8", "v5u", "v11", "v12")
            deeper = (int(self.config.host_s2d_deeper)
                      if (packed and self.config.host_s2d_deep and eligible)
                      else 0)
            from .nn.common import head_fuse

            with fused_inference(), pallas_conv(use_pallas), \
                    s2d_stride2(self.config.s2d_max_cin), \
                    quant_int8(use_int8), s2d_packed_input(
                        packed, deep=packed and self.config.host_s2d_deep,
                        deeper=deeper), \
                    head_fuse(self.config.head_tower_fuse):
                return self.net.apply(variables, images, False,
                                      skip_one2many=skip_one2many)
        assert not packed, "host_s2d requires Config.fuse_inference"
        return self.net.apply(variables, images, False,
                              skip_one2many=skip_one2many)

    def calibrate_int8(self, images=None, n_images: int = 16,
                       batch_size: int = 8):
        """Post-training int8 activation calibration (Config.int8_predict).

        Runs eval forwards through the exact fused predict graph with the
        "quant_stats" collection mutable, recording each eligible conv's
        input absmax (running max over batches). `images`: iterable of
        file paths or HxWx3 uint8 arrays; None samples up to `n_images`
        images found under Config.root_path. After calibration, predict
        runs dense ConvBN convs as symmetric int8 (nn/common.py
        int8_conv) when Config.int8_predict is set.

        Reference surface: the predict chain Models/Detector.cs:27-72 —
        the reference has no quantized path; this is the TPU-native perf
        lever (v5e int8 MXU ~= 2x bf16 peak).
        """
        import cv2

        cfg = self.config
        if images is None:
            import glob

            found = []
            for ext in ("jpg", "jpeg", "png", "bmp"):
                found += glob.glob(os.path.join(cfg.root_path or ".", "**",
                                                f"*.{ext}"), recursive=True)
            if not found:
                raise FileNotFoundError(
                    f"calibrate_int8: no images under {cfg.root_path!r}; "
                    f"pass images= explicitly")
            images = sorted(found)[:n_images]
        arrs = []
        for im in list(images)[:n_images]:
            if isinstance(im, (str, os.PathLike)):
                im = cv2.imread(str(im))
            im = cv2.resize(np.asarray(im), (cfg.image_size, cfg.image_size))
            arrs.append(np.asarray(im, np.float32) / 255.0)
        if not arrs:
            raise ValueError("calibrate_int8: empty image list")

        from .nn.common import fused_inference, quant_calibrate, s2d_stride2

        # calibration must run without existing stats attached (else the
        # int8 path would already engage); use a stat-free fused tree
        prev_stats = getattr(self, "_quant_stats", None)
        self._quant_stats = None
        self._fused_src = None
        variables = self._predict_variables()

        @jax.jit
        def cal_fn(v, img):
            with fused_inference(), s2d_stride2(cfg.s2d_max_cin), \
                    quant_calibrate():
                return self.net.apply(v, img, False,
                                      mutable=["quant_stats"])

        stats = prev_stats  # running max continues across calibrations
        for i in range(0, len(arrs), batch_size):
            chunk = np.stack(arrs[i:i + batch_size])
            _, updates = cal_fn(variables, jnp.asarray(chunk))
            new = jax.device_get(updates["quant_stats"])
            stats = new if stats is None else jax.tree_util.tree_map(
                np.maximum, stats, new)
        self._quant_stats = stats
        self._fused_src = None       # rebuild fused tree with stats
        self._predict_cache.clear()  # retrace predict fns
        n = len(jax.tree_util.tree_leaves(stats))
        print(f"int8 calibration: {n} convs calibrated over "
              f"{len(arrs)} images")
        return stats

    def save_calibration(self, path: str):
        """Persist int8 calibration stats (flat npz) for deploy-time use."""
        from .ckpt.mapping import flatten

        stats = getattr(self, "_quant_stats", None)
        if stats is None:
            raise ValueError("no calibration stats: run calibrate_int8 first")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **{k: np.asarray(v)
                          for k, v in flatten(stats).items()})

    def load_calibration(self, path: str):
        """Load int8 calibration stats saved by save_calibration."""
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        # rebuild the tree structure by calibrating shape: unflatten needs
        # a reference tree; reconstruct nested dicts from dotted keys
        tree: Dict = {}
        for key, v in flat.items():
            node = tree
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        self._quant_stats = tree
        self._fused_src = None
        self._predict_cache.clear()
        return tree

    # ---------------------------------------------------------- checkpoint
    def load_model(self, path: str, skip_nc_not_equal_layers: bool = False):
        """LoadModel semantics (YoloBaseTaskModel.cs:27-114)."""
        variables = self._ensure_variables()
        sd = load_state_dict_file(path)
        skip: Tuple[str, ...] = ()
        if skip_nc_not_equal_layers:
            from .ckpt.mapping import head_index

            hidx = head_index(variables["params"])
            skip = skip_patterns_for_nc_mismatch(
                self.arch.task, hidx, sd, self.config.number_class,
                self.config.keypoint_num * self.config.keypoint_dim)
        new_vars, report = state_dict_to_variables(sd, variables,
                                                   skip_patterns=skip,
                                                   strict_shapes=False)
        if self.arch.end2end:
            new_vars = clone_one2one(new_vars)
        if report.skipped and self.task != TaskType.classify:
            from .ckpt.fuse import bias_init

            new_vars = bias_init(new_vars, self.config.number_class)
        self.variables = new_vars
        self._predict_cache.clear()
        print(f"Model loaded: {report}")
        return report

    def save_weight(self, path: str, dtype=np.float32):
        """SaveWeight: LEB128 .bin, one2one excluded (YoloBaseTaskModel.cs:470)."""
        sd = variables_to_state_dict(self._ensure_variables(),
                                    reg_max=self.arch.reg_max, dtype=dtype)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_bin(path, sd)

    # -------------------------------------------------------------- losses
    def _loss_fns(self):
        raise NotImplementedError

    def _loss_kwargs(self, epoch: int) -> Dict:
        if self.arch.end2end and self.task != TaskType.detect:
            o2m, o2o = e2e_gain_schedule(epoch - 1, self.config.epochs)
            return {"o2m_gain": o2m, "o2o_gain": o2o}
        return {}

    # ---------------------------------------------------------------- mesh
    def _make_mesh(self, batch_size: int):
        """Data-parallel mesh over the largest device count that divides the
        batch (never a silent single-device fallback: using fewer chips than
        available is reported, and a non-divisible batch uses the largest
        divisor instead of dropping to one device)."""
        cache = getattr(self, "_mesh_cache", None)
        if cache is None:
            cache = self._mesh_cache = {}
        if batch_size in cache:
            return cache[batch_size]
        devices = jax.devices()
        n_dev = len(devices)
        d = max((k for k in range(1, n_dev + 1) if batch_size % k == 0),
                default=1)
        if d <= 1:
            cache[batch_size] = None
            if n_dev > 1:
                print(f"WARNING: batch_size={batch_size} shares no divisor "
                      f"with the {n_dev} visible devices; training runs "
                      f"single-device. Pick a batch size divisible by "
                      f"{n_dev} to use all chips.")
            return None
        if d < n_dev:
            print(f"WARNING: batch_size={batch_size} is not divisible by "
                  f"{n_dev} devices; using a {d}-device data mesh. Pick a "
                  f"batch size divisible by {n_dev} to use all chips.")
        # reuse an existing equivalent mesh (same device count) so jitted
        # programs cached against it stay valid
        for m in cache.values():
            if m is not None and len(m.devices.flat) == d:
                cache[batch_size] = m
                return m
        cache[batch_size] = create_mesh(devices=devices[:d])
        return cache[batch_size]

    # --------------------------------------------------------------- train
    def _make_datasets(self):
        tr = YoloDataset(self.config, is_val=False)
        va = YoloDataset(self.config, is_val=True)
        return tr, va

    def train(self, resume_from: Optional[str] = None):
        cfg = self.config
        print("Start Training:")
        print(cfg.describe())
        out_dir = cfg.output_path or os.path.join(
            "result", self.task.value, datetime.now().strftime("%y%m%d%H%M%S"))
        cfg.output_path = out_dir
        logger = TrainLogger(out_dir, self._log_headers())
        logger.write_config(cfg)

        train_ds, val_ds = self._make_datasets()
        if len(train_ds) == 0 or len(val_ds) == 0:
            raise FileNotFoundError(f"No data found in {cfg.root_path}")
        max_labels = cfg.max_labels or train_ds.max_label_count
        train_dl = DataLoader(train_ds, cfg.batch_size, shuffle=True,
                              workers=cfg.workers, max_labels=max_labels)
        val_dl = DataLoader(val_ds, cfg.batch_size, shuffle=False,
                            workers=cfg.workers, max_labels=max_labels)
        nb = len(train_dl)

        tx = make_optimizer(nc=cfg.number_class, epochs=cfg.epochs,
                            steps_per_epoch=nb,
                            warmup_epochs=cfg.warm_up_epochs,
                            warmup_bias_lr=cfg.warm_up_bias_lr,
                            use_cos_lr=cfg.use_cos_lr, lrf=cfg.lrf)
        state = TrainState.create(
            self._ensure_variables(), tx,
            init_scale=65536.0 if cfg.true_fp16 else 1.0)
        start_epoch = 1
        if resume_from:
            from .ckpt.resume import restore_train_state

            state, meta = restore_train_state(resume_from, state)
            start_epoch = int(meta.get("epoch", 0)) + 1
            print(f"Resumed full train state from {resume_from} "
                  f"(continuing at epoch {start_epoch}).")

        mesh = self._make_mesh(cfg.batch_size)
        if cfg.occupancy_hint:
            from .utils.training import occupancy_hint

            n_dev = len(mesh.devices.flat) if mesh is not None else 1
            hint = occupancy_hint(cfg.batch_size // n_dev, cfg.image_size)
            if hint:
                print(hint)
        if mesh is not None:
            # device-augmented mosaic partners must stay within each
            # data-parallel shard (no cross-device tile gathers)
            train_dl.partner_group = (cfg.batch_size
                                      // len(mesh.devices.flat))
        train_loss_fn, _ = self._loss_fns()
        use_fsdp = bool(cfg.fsdp and mesh is not None)
        if use_fsdp:
            from .parallel.fsdp import fsdp_shard_state, sharded_param_bytes

            state = fsdp_shard_state(state, mesh)
            print(f"FSDP: train state sharded over "
                  f"{len(mesh.devices.flat)} devices "
                  f"(~{sharded_param_bytes(state, mesh) / 2**20:.1f} "
                  f"MiB/device).")
        # axis-aligned warps (the reference's default hyps) render through
        # dense interpolation matmuls instead of gathers — exact semantics
        sep_render = (cfg.separable_render and cfg.degrees == 0
                      and cfg.shear == 0 and cfg.perspective == 0)
        # packed TRAIN region depth (Config.train_packed_depth): depth 2
        # needs a packed-rewritable layer-2 CSP block, same eligibility
        # as the predict-side host_s2d_deeper gate (_forward) — all four
        # families at every size (m/l/x C3k inner blocks via _PackedC3k).
        # Host-prepared batches (letterbox / close-mosaic tail) pack via
        # one in-graph uint8 space_to_depth2 (resolve_batch_images)
        deeper_ok = self.arch.version in ("v8", "v5u", "v11", "v12")
        packed_depth = (min(cfg.train_packed_depth, 1 if not deeper_ok
                            else cfg.train_packed_depth)
                        if cfg.train_packed_render else 0)
        step_fn = make_train_step(self.net, train_loss_fn,
                                  compute_dtype=cfg.compute_dtype, mesh=mesh,
                                  dynamic_loss_scale=cfg.true_fp16,
                                  fsdp=use_fsdp,
                                  packed_stem=cfg.train_packed_render,
                                  separable_render=sep_render,
                                  packed_depth=packed_depth)

        stopper = EarlyStopping(cfg.patience)
        best_fitness = -float("inf")
        weights_dir = os.path.join(out_dir, "weights")
        os.makedirs(weights_dir, exist_ok=True)

        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.time()
            train_ds.close_mosaic(epoch > cfg.close_mosaic)
            loss_kwargs = self._loss_kwargs(epoch)
            items_sum = None
            nbatch = 0
            from .data.loader import device_prefetch

            put = ((lambda b: shard_batch(b, mesh)) if mesh
                   else (lambda b: jax.device_put(b)))
            stream = device_prefetch(train_dl, put, depth=2)
            try:
                from tqdm import tqdm

                pbar = tqdm(stream, total=nb,
                            desc=f"epoch {epoch}/{cfg.epochs}", leave=False)
            except ImportError:
                pbar = stream
            profiling = False
            for jb in pbar:
                if (cfg.profile_dir and epoch == start_epoch
                        and nbatch == 1):
                    # steps 2-5: step 1 pays compile; stop below
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                state, loss, items = step_fn(state, jb, loss_kwargs)
                items_sum = items if items_sum is None else items_sum + items
                nbatch += 1
                if profiling and nbatch >= 5:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"profiler trace written to {cfg.profile_dir}")
            if profiling:  # short epoch: close the trace cleanly
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
            # reference semantics: loss_detach items are per-batch means,
            # accumulated over batches and divided by dataset size in the log
            # (TrainEpoch:329-334 + WriteLog:229-232)
            train_items = (np.asarray(items_sum) if items_sum is not None
                           else np.zeros(len(self.loss_names)))
            self.variables = state.variables

            val_items, metrics = self.val(val_dl, epoch)
            fitness = -float(np.sum(val_items))

            if fitness > best_fitness:
                best_fitness = fitness
                self.save_weight(os.path.join(weights_dir, "best.bin"))
            if stopper.should_stop(fitness, epoch):
                break
            self.save_weight(os.path.join(weights_dir, "last.bin"))
            if cfg.resume_format == "orbax":
                from .ckpt.resume import save_train_state_orbax

                save_train_state_orbax(
                    os.path.join(weights_dir, "last_state.orbax"),
                    state, {"epoch": epoch})
            else:
                from .ckpt.resume import save_train_state

                save_train_state(
                    os.path.join(weights_dir, "last_state.npz"),
                    state, {"epoch": epoch})
            dt = time.time() - t0
            loss_str = " ".join(f"{n}={v / max(len(train_ds), 1):.3f}"
                                for n, v in zip(self.loss_names, train_items))
            met_str = " ".join(f"{v:.3f}" for v in metrics)
            print(f"epoch {epoch}/{cfg.epochs} {dt:.1f}s {loss_str} "
                  f"| val metrics: {met_str}")
            logger.log_epoch(epoch, dt, list(train_items), list(val_items),
                             list(metrics), len(train_ds), len(val_ds))
        logger.draw_curves()
        print("Train Done.")
        return state

    def _log_headers(self) -> str:
        train_cols = ", ".join(f"train/{n}" for n in self.loss_names)
        val_cols = ", ".join(f"val/{n}" for n in self.loss_names)
        met_cols = ", ".join(f"metrics/{n}" for n in self.metric_names)
        return (f"Epoch, Time, {train_cols}, {val_cols}, {met_cols}, "
                f"train/loss, val/loss")

    # ----------------------------------------------------------------- val
    def _get_eval_step(self):
        if not hasattr(self, "_eval_step"):
            cfg = self.config
            _, eval_loss_fn = self._loss_fns()

            def eval_step(variables, batch, loss_kwargs):
                from .train import normalize_images

                images = normalize_images(batch["images"], cfg.compute_dtype)
                preds = self.net.apply(variables, images, False)
                _, items = eval_loss_fn(preds, batch, **loss_kwargs)
                decoded = self._decode_for_val(preds)
                return items, decoded

            mesh = self._make_mesh(cfg.batch_size)
            if mesh is not None:
                # validation is sharded like training: batch split on the
                # data axis, params replicated, loss items psum'd by XLA
                from .parallel.mesh import batch_sharding, replicated

                self._eval_step = jax.jit(
                    eval_step,
                    in_shardings=(replicated(mesh), batch_sharding(mesh),
                                  None),
                    out_shardings=(replicated(mesh), batch_sharding(mesh)))
            else:
                self._eval_step = jax.jit(eval_step)
        return self._eval_step

    def val(self, val_dl: DataLoader, epoch: int = 0):
        variables = self._ensure_variables()
        loss_kwargs = self._loss_kwargs(epoch)
        eval_step = self._get_eval_step()

        acc = self._new_val_accumulator()
        items_sum = None
        count = 0
        from .data.loader import device_prefetch

        mesh = self._make_mesh(self.config.batch_size)
        put = ((lambda b: (b, shard_batch(b, mesh))) if mesh is not None
               else (lambda b: (b, jax.device_put(b))))
        for batch, jb in device_prefetch(val_dl, put, depth=2):
            items, decoded = eval_step(variables, jb, loss_kwargs)
            items_sum = items if items_sum is None else items_sum + items
            self._accumulate_val(acc, batch, jax.device_get(decoded))
            count += batch["images"].shape[0]
        val_items = (np.asarray(items_sum) if items_sum is not None
                     else np.zeros(len(self.loss_names)))
        metrics = self._finalize_val(acc, count)
        return val_items, metrics

    # hooks implemented per task
    def _decode_for_val(self, preds):
        raise NotImplementedError

    def _new_val_accumulator(self):
        return {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}

    def _accumulate_val(self, acc, batch, decoded):
        raise NotImplementedError

    def _finalize_val(self, acc, count):
        if not acc["tp"]:
            return [0.0, 0.0, 0.0, 0.0]
        tp = np.concatenate(acc["tp"])
        conf = np.concatenate(acc["conf"])
        pred_cls = np.concatenate(acc["pred_cls"])
        target_cls = np.concatenate(acc["target_cls"])
        res = ap_per_class(tp, conf, pred_cls, target_cls)
        p, r, m50, m5095 = summarize(res)
        print(f"{'All':>10}{count:>10}{len(target_cls):>10}"
              f"{p:>10.3f}{r:>10.3f}{m50:>10.3f}{m5095:>10.3f}")
        return [p, r, m50, m5095]

    # ------------------------------------------------------------- predict
    def image_predict(self, image: np.ndarray,
                      predict_threshold: Optional[float] = None,
                      iou_threshold: Optional[float] = None
                      ) -> List[YoloResult]:
        raise NotImplementedError


def _warn_if_truncated(nms_out, state: Optional[Dict] = None):
    """Surface NMS candidate-pool truncation (never silent; see
    Config.nms_pre_topk). With a per-stream `state` dict the warning
    prints once per stream (dense streams would otherwise spam it per
    batch); the stream's end prints a count summary."""
    trunc = np.asarray(getattr(nms_out, "truncated", False))
    if not trunc.any():
        return
    if state is not None:
        state["truncated_batches"] = state.get("truncated_batches", 0) + 1
        if state["truncated_batches"] > 1:
            return
        suffix = " (warning once per stream)"
    else:
        suffix = ""
    print("WARNING: above-threshold NMS candidates exceeded "
          "Config.nms_pre_topk; low-score boxes may be missing. "
          f"Raise nms_pre_topk or set it to None for exact NMS.{suffix}")


def _nms_decoded(decoded, batch, *, nc, conf, iou, rotated=False,
                 end2end=False, max_det=300):
    """Shared on-device NMS/e2e-select used by the val paths."""
    if end2end:
        return decoded  # already (B, max_det, 6+extra)
    return non_max_suppression(decoded, conf, iou, nc=nc, rotated=rotated,
                               max_det=max_det)


class Detector(BaseTask):
    task = TaskType.detect

    def _loss_fns(self):
        nc = self.config.number_class
        if self.arch.end2end:
            fn = e2e_wrap(partial(detection_loss, nc=nc, tal_topk=10),
                          partial(detection_loss, nc=nc, tal_topk=1))
        else:
            base = partial(detection_loss, nc=nc)

            def fn(preds, batch, **kw):
                return base(preds["one2many"], batch)
        return fn, fn

    def _decode_branch(self, preds):
        branch = preds["one2one"] if self.arch.end2end else preds["one2many"]
        dec = decode_inference(branch, nc=self.config.number_class,
                               end2end=self.arch.end2end)
        if self.arch.end2end:
            dec = e2e_postprocess(dec.swapaxes(-1, -2),
                                  nc=self.config.number_class)
        return dec

    def _decode_branch_topk(self, preds, conf, k):
        """Select-then-decode for the non-e2e predict path (exact; see
        predict.decode_inference_topk). Subclasses override to pass their
        extra head shapes."""
        return decode_inference_topk(preds["one2many"],
                                     nc=self.config.number_class,
                                     conf_thres=conf, k=k)

    def _decode_for_val(self, preds):
        dec = self._decode_branch(preds)
        if self.arch.end2end:
            return dec
        return non_max_suppression(dec, self.val_conf, 0.7,
                                   nc=self.config.number_class)

    def _accumulate_val(self, acc, batch, decoded):
        h, w = batch["images"].shape[1:3]
        scale = np.array([w, h, w, h], np.float32)
        for i in range(batch["images"].shape[0]):
            if self.arch.end2end:
                rows = decoded[i]
                keep = rows[:, 4] > self.val_conf
                boxes, scores, classes = (rows[keep, :4], rows[keep, 4],
                                          rows[keep, 5].astype(int))
            else:
                valid = np.asarray(decoded.valid[i])
                boxes = np.asarray(decoded.boxes[i])[valid]
                scores = np.asarray(decoded.scores[i])[valid]
                classes = np.asarray(decoded.classes[i])[valid]
            gmask = batch["mask_gt"][i]
            gcls = batch["cls"][i][gmask].astype(float)
            gxywh = batch["bboxes"][i][gmask][:, :4] * scale
            gxyxy = np.concatenate([gxywh[:, :2] - gxywh[:, 2:] / 2,
                                    gxywh[:, :2] + gxywh[:, 2:] / 2], -1)
            iou = np.asarray(box_iou(jnp.asarray(gxyxy), jnp.asarray(boxes))) \
                if len(boxes) and len(gxyxy) else np.zeros((len(gxyxy),
                                                            len(boxes)))
            tp = match_predictions(classes.astype(float), gcls, iou)
            acc["tp"].append(tp)
            acc["conf"].append(scores)
            acc["pred_cls"].append(classes.astype(float))
            acc["target_cls"].append(gcls)

    def _use_host_s2d(self) -> bool:
        """Host-packed s2d input eligibility for the batched serving paths
        (see Config.host_s2d; None = auto by host core count). All four
        stems fold (v8/v11/v12 3x3/s2, v5u 6x6/s2/p2); the Pallas conv
        router must not see the packed stem (it would declare a
        12-channel kernel param)."""
        want = self.config.host_s2d
        if want is None:
            want = (os.cpu_count() or 1) >= 4
        return (want and self.config.fuse_inference
                and not self.config.pallas_conv)

    def _predict_fn(self, shape, packed: bool = False):
        if shape not in self._predict_cache:
            nc = self.config.number_class

            def fn(variables, img, conf, iou):
                img = img.astype(jnp.float32) / 255.0
                preds = self._apply_eval(
                    variables, img, skip_one2many=self.arch.end2end,
                    packed=packed)
                if self.arch.end2end:
                    return self._decode_branch(preds)
                if self.config.nms_pre_topk:
                    # select-then-decode: exact, decodes only K anchors
                    dec, trunc = self._decode_branch_topk(
                        preds, conf, self.config.nms_pre_topk)
                    out = non_max_suppression(dec, conf, iou, nc=nc)
                    return out._replace(truncated=out.truncated | trunc)
                dec = self._decode_branch(preds)
                return non_max_suppression(dec, conf, iou, nc=nc)

            self._predict_cache[shape] = predict_jit(
                fn, tune=self.config.xla_predict_tuning and not packed)
        return self._predict_cache[shape]

    def image_predict(self, image, predict_threshold=None,
                      iou_threshold=None) -> List[YoloResult]:
        conf = (self.config.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (self.config.iou_threshold if iou_threshold is None
               else iou_threshold)
        variables = self._predict_variables()
        img = np.asarray(image, np.uint8)[None]
        # pad on host in uint8 and ship uint8: 4x less tunnel
        # traffic than f32; the jitted fn normalizes on device
        ph, pw = (-img.shape[1]) % 32, (-img.shape[2]) % 32
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         constant_values=114)
        fn = self._predict_fn(img.shape)
        out = jax.device_get(fn(variables, jnp.asarray(img),
                                conf if not self.arch.end2end else 0.0, iou))
        if not self.arch.end2end:
            _warn_if_truncated(out)
        results = []
        if self.arch.end2end:
            rows = out[0]
            for x1, y1, x2, y2, score, cls in rows[:, :6]:
                if score <= conf:
                    continue
                results.append(self._result_from_box(x1, y1, x2, y2,
                                                     score, cls))
        else:
            for i in range(int(out.valid[0].sum())):
                x1, y1, x2, y2 = out.boxes[0][i]
                results.append(self._result_from_box(
                    x1, y1, x2, y2, out.scores[0][i], out.classes[0][i]))
        return results

    def batch_predict(self, images, predict_threshold=None,
                      iou_threshold=None, mesh=None
                      ) -> List[List[YoloResult]]:
        """Batched inference: N images -> N result lists in ONE device
        program (the TPU-native serving path; the reference predicts one
        image at a time, Detector.cs:27-72). Mixed sizes are padded to a
        common 32-multiple canvas with the reference's 114 fill; box
        coordinates are in that canvas's pixels, like image_predict.
        Supported for detect/segment/obb/pose (Classifier overrides).

        mesh: optional jax.sharding.Mesh (parallel.create_mesh) — the
        batch is sharded over the data axis and the same program runs
        data-parallel across every chip in the mesh."""
        conf = (self.config.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (self.config.iou_threshold if iou_threshold is None
               else iou_threshold)
        variables = self._predict_variables()
        arrs = [np.asarray(im, np.uint8) for im in images]
        H = max(a.shape[0] for a in arrs)
        W = max(a.shape[1] for a in arrs)
        H, W = -(-H // 32) * 32, -(-W // 32) * 32
        # uint8 transport; the jitted fn normalizes on device
        batch = np.full((len(arrs), H, W, 3), 114, np.uint8)
        for i, a in enumerate(arrs):
            batch[i, :a.shape[0], :a.shape[1]] = a
        packed = self._use_host_s2d()
        if packed:
            from .native import s2d_pack_u8
            batch = s2d_pack_u8(batch)
        if mesh is not None:
            jb, variables = self._sharded_predict_inputs(
                batch, variables, mesh)
        else:
            jb = jnp.asarray(batch)
        fn = self._predict_fn(jb.shape, packed=packed)
        out = jax.device_get(fn(variables, jb,
                                conf if not self.arch.end2end else 0.0, iou))
        nms = self._nms_of(out)
        if nms is not None:
            _warn_if_truncated(nms)
        return [self._batch_results(out, i, conf, (H, W), a.shape[:2])
                for i, a in enumerate(arrs)]

    def _nms_of(self, out):
        """The NMSOutput inside a predict-fn result (None when e2e)."""
        return None if self.arch.end2end else out

    def _batch_results(self, out, i, conf, hw, orig_shape
                       ) -> List[YoloResult]:
        """Unpack image i of a predict-fn output into YoloResults
        (canvas coordinates). Overridden per family."""
        rows: List[YoloResult] = []
        if self.arch.end2end:
            for x1, y1, x2, y2, score, cls in out[i][:, :6]:
                if score > conf:
                    rows.append(self._result_from_box(x1, y1, x2, y2,
                                                      score, cls))
        else:
            for j in range(int(out.valid[i].sum())):
                x1, y1, x2, y2 = out.boxes[i][j]
                rows.append(self._result_from_box(
                    x1, y1, x2, y2, out.scores[i][j], out.classes[i][j]))
        return rows

    def predict_stream(self, images, batch_size: int = 16,
                       imgsz: Optional[int] = None,
                       predict_threshold=None, iou_threshold=None,
                       workers: int = 4, mesh=None):
        """Pipelined streaming inference: a generator over an iterable of
        raw BGR uint8 images that yields one ``List[YoloResult]`` per
        image, in order, with boxes/masks/keypoints in ORIGINAL image
        coordinates (supported for detect/segment/obb/pose).

        The serving path the reference cannot express (it predicts one
        image per call with host NMS, Detector.cs:27-72): here the host
        LetterBoxes images into fixed-shape uint8 batches on a worker
        thread pool (cv2 releases the GIL), a transfer thread overlaps
        ``device_put`` with compute, and the device runs one jitted
        program per batch while the previous batch's results are fetched
        and unpacked — steady-state throughput is max(host, transfer,
        device) instead of their sum. The final partial batch is padded
        with repeats and the padding discarded.
        """
        conf = (self.config.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (self.config.iou_threshold if iou_threshold is None
               else iou_threshold)
        variables = self._predict_variables()
        s = imgsz or self.config.image_size
        s = -(-s // 32) * 32
        sharding = None
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS, batch_sharding
            # keep every shard equally sized: round the batch up to a
            # data-axis multiple (padding rows are repeats, discarded
            # by the meta-driven unpack)
            dp = mesh.shape[DATA_AXIS]
            batch_size = -(-batch_size // dp) * dp
            sharding = batch_sharding(mesh)
            variables = self._replicated_vars(mesh, variables)
        packed = self._use_host_s2d()
        fn = self._predict_fn((batch_size, s // 2, s // 2, 12) if packed
                              else (batch_size, s, s, 3), packed=packed)

        from concurrent.futures import ThreadPoolExecutor

        from .data.augment import _resize_pad
        from .data.loader import device_prefetch

        def pack_one(im):
            im = np.asarray(im, np.uint8)
            ih, iw = im.shape[:2]
            pl, pu, out = _resize_pad(im, s, s, s, s, 114)
            return out, (min(s / iw, s / ih), pl, pu, ih, iw)

        def host_batches():
            with ThreadPoolExecutor(max(1, workers)) as pool:
                packed, metas = [], []
                for out, meta in pool.map(pack_one, images):
                    packed.append(out)
                    metas.append(meta)
                    if len(packed) == batch_size:
                        yield np.stack(packed), metas
                        packed, metas = [], []
                if packed:
                    n = len(packed)
                    packed += [packed[-1]] * (batch_size - n)
                    yield np.stack(packed), metas

        def put(item):
            batch, metas = item
            if packed:
                # ctypes releases the GIL: the native pack runs on this
                # transfer thread overlapped with host prep + device compute
                from .native import s2d_pack_u8
                batch = s2d_pack_u8(batch)
            if sharding is not None:
                return jax.device_put(batch, sharding), metas
            return jnp.asarray(batch), metas

        # depth-2 pipeline: dispatch batch N, then fetch batch N-1 while
        # N computes on device
        pending = []
        tstate: Dict = {}
        e2e = self.arch.end2end
        for jb, metas in device_prefetch(host_batches(), put, depth=2):
            pending.append((fn(variables, jb, conf if not e2e else 0.0,
                               iou), metas))
            if len(pending) >= 2:
                yield from self._unpack_stream(pending.pop(0), conf, tstate)
        while pending:
            yield from self._unpack_stream(pending.pop(0), conf, tstate)
        if tstate.get("truncated_batches", 0) > 1:
            print(f"NOTE: NMS candidate truncation occurred in "
                  f"{tstate['truncated_batches']} batches of this stream.")

    def _unpack_stream(self, item, conf, tstate: Optional[Dict] = None):
        out, metas = item
        out = jax.device_get(out)
        nms = self._nms_of(out)
        if nms is not None:
            _warn_if_truncated(nms, tstate)
        for i, meta in enumerate(metas):
            yield self._stream_results(out, i, conf, meta)

    def _xyxy_candidates(self, out, i, conf):
        """Valid (boxes xyxy, scores, classes, extras) float arrays for
        image i of a predict-fn output (detect-layout families)."""
        if self.arch.end2end:
            rows = out[i]
            keep = rows[:, 4] > conf
            return (rows[keep, :4], rows[keep, 4],
                    rows[keep, 5].astype(int), rows[keep, 6:])
        valid = np.asarray(out.valid[i])
        return (np.asarray(out.boxes[i])[valid],
                np.asarray(out.scores[i])[valid],
                np.asarray(out.classes[i])[valid],
                np.asarray(out.extras[i])[valid])

    def _stream_results(self, out, i, conf, meta) -> List[YoloResult]:
        """Unpack image i into YoloResults mapped back through the
        letterbox to ORIGINAL image coordinates. Overridden per family."""
        ratio, pl, pu, ih, iw = meta
        boxes, scores, classes, _ = self._xyxy_candidates(out, i, conf)
        rows: List[YoloResult] = []
        for (x1, y1, x2, y2), score, cls in zip(boxes, scores, classes):
            # undo the LetterBox: canvas -> original pixels
            x1 = np.clip((x1 - pl) / ratio, 0, iw)
            x2 = np.clip((x2 - pl) / ratio, 0, iw)
            y1 = np.clip((y1 - pu) / ratio, 0, ih)
            y2 = np.clip((y2 - pu) / ratio, 0, ih)
            rows.append(self._result_from_box(x1, y1, x2, y2, score, cls))
        return rows

    @staticmethod
    def _result_from_box(x1, y1, x2, y2, score, cls) -> YoloResult:
        # integer truncation mirrors Detector.cs:52-68
        x, y = int(x1), int(y1)
        w, h = int(x2) - x, int(y2) - y
        return YoloResult(class_id=int(cls), score=float(score),
                          center_x=x + w // 2, center_y=y + h // 2,
                          width=w, height=h)


class Segmenter(Detector):
    task = TaskType.segment
    loss_names = ("box_loss", "seg_loss", "cls_loss", "dfl_loss", "semseg")
    val_conf = 0.01

    def _loss_fns(self):
        nc = self.config.number_class
        if self.arch.end2end:
            fn = e2e_wrap(
                partial(segmentation_loss, nc=nc, tal_topk=10),
                partial(segmentation_loss, nc=nc, tal_topk=7, tal_topk2=1))
        else:
            base = partial(segmentation_loss, nc=nc)

            def fn(preds, batch, **kw):
                return base(preds["one2many"], batch)
        return fn, fn

    def _decode_for_val(self, preds):
        branch = preds["one2one"] if self.arch.end2end else preds["one2many"]
        dec = decode_inference(branch, nc=self.config.number_class,
                               end2end=self.arch.end2end)
        proto = branch["proto"]
        if self.arch.end2end:
            sel = e2e_postprocess(dec.swapaxes(-1, -2),
                                  nc=self.config.number_class, extra=32)
            return {"rows": sel, "proto": proto}
        nms = non_max_suppression(dec, self.val_conf, 0.7,
                                  nc=self.config.number_class)
        return {"nms": nms, "proto": proto}

    def _new_val_accumulator(self):
        acc = super()._new_val_accumulator()
        acc["tp_m"] = []
        return acc

    def _accumulate_val(self, acc, batch, decoded):
        h, w = batch["images"].shape[1:3]
        scale = np.array([w, h, w, h], np.float32)
        proto = decoded["proto"]          # (B, mh, mw, nm)
        for i in range(batch["images"].shape[0]):
            if self.arch.end2end:
                rows = decoded["rows"][i]
                keep = rows[:, 4] > self.val_conf
                boxes, scores = rows[keep, :4], rows[keep, 4]
                classes = rows[keep, 5].astype(int)
                coeffs = rows[keep, 6:]
            else:
                nms = decoded["nms"]
                valid = np.asarray(nms.valid[i])
                boxes = np.asarray(nms.boxes[i])[valid]
                scores = np.asarray(nms.scores[i])[valid]
                classes = np.asarray(nms.classes[i])[valid]
                coeffs = np.asarray(nms.extras[i])[valid]
            gmask = batch["mask_gt"][i]
            gcls = batch["cls"][i][gmask].astype(float)
            gxywh = batch["bboxes"][i][gmask][:, :4] * scale
            gxyxy = np.concatenate([gxywh[:, :2] - gxywh[:, 2:] / 2,
                                    gxywh[:, :2] + gxywh[:, 2:] / 2], -1)
            if len(boxes) and len(gxyxy):
                iou = np.asarray(box_iou(jnp.asarray(gxyxy),
                                         jnp.asarray(boxes)))
                pmask = np.asarray(process_mask(
                    jnp.asarray(proto[i]).transpose(2, 0, 1),
                    jnp.asarray(coeffs), jnp.asarray(boxes), (h, w)))
                gm = batch["masks"][i]
                nl = len(gcls)
                gt_masks = (gm[None] == np.arange(1, nl + 1)[:, None, None])
                if gt_masks.shape[1:] != pmask.shape[1:]:
                    import cv2

                    gt_masks = np.stack([
                        cv2.resize(m.astype(np.uint8), pmask.shape[1:][::-1],
                                   interpolation=cv2.INTER_NEAREST)
                        for m in gt_masks]) if nl else np.zeros(
                            (0,) + pmask.shape[1:])
                miou = np.asarray(mask_iou(
                    jnp.asarray(gt_masks.reshape(nl, -1).astype(np.float32)),
                    jnp.asarray(pmask.reshape(len(boxes), -1)
                                .astype(np.float32))))
            else:
                iou = np.zeros((len(gxyxy), len(boxes)))
                miou = np.zeros((len(gxyxy), len(boxes)))
            acc["tp"].append(match_predictions(classes.astype(float), gcls,
                                               iou))
            acc["tp_m"].append(match_predictions(classes.astype(float), gcls,
                                                 miou))
            acc["conf"].append(scores)
            acc["pred_cls"].append(classes.astype(float))
            acc["target_cls"].append(gcls)

    metric_names = ("precision(B)", "recall(B)", "mAP50(B)", "mAP50-95(B)",
                    "precision(M)", "recall(M)", "mAP50(M)", "mAP50-95(M)")

    def _finalize_val(self, acc, count):
        if not acc["tp"]:
            return [0.0] * 8
        conf = np.concatenate(acc["conf"])
        pred_cls = np.concatenate(acc["pred_cls"])
        target_cls = np.concatenate(acc["target_cls"])
        box = summarize(ap_per_class(np.concatenate(acc["tp"]), conf,
                                     pred_cls, target_cls))
        msk = summarize(ap_per_class(np.concatenate(acc["tp_m"]), conf,
                                     pred_cls, target_cls))
        print(f"{'All':>10}{count:>10}{len(target_cls):>10} "
              f"Box P/R/mAP50/mAP50-95: "
              f"{box[0]:.3f}/{box[1]:.3f}/{box[2]:.3f}/{box[3]:.3f} "
              f"Mask: {msk[0]:.3f}/{msk[1]:.3f}/{msk[2]:.3f}/{msk[3]:.3f}")
        return list(box) + list(msk)

    def _predict_fn(self, shape, packed: bool = False):
        """Per-shape jitted predict (NMS at the *caller's* conf/iou, matching
        Segmenter.cs:45); conf/iou are traced so threshold changes never
        recompile."""
        if shape not in self._predict_cache:
            nc = self.config.number_class

            def fn(variables, x, conf, iou):
                x = x.astype(jnp.float32) / 255.0
                preds = self._apply_eval(
                    variables, x, skip_one2many=self.arch.end2end,
                    packed=packed)
                branch = (preds["one2one"] if self.arch.end2end
                          else preds["one2many"])
                proto = branch["proto"]
                if self.arch.end2end:
                    dec = decode_inference(branch, nc=nc, end2end=True)
                    rows = e2e_postprocess(dec.swapaxes(-1, -2), nc=nc,
                                           extra=32)
                    return {"rows": rows, "proto": proto}
                if self.config.nms_pre_topk:
                    dec, trunc = decode_inference_topk(
                        branch, nc=nc, conf_thres=conf,
                        k=self.config.nms_pre_topk)
                    out = non_max_suppression(dec, conf, iou, nc=nc)
                    return {"nms": out._replace(
                        truncated=out.truncated | trunc), "proto": proto}
                dec = decode_inference(branch, nc=nc)
                return {"nms": non_max_suppression(dec, conf, iou, nc=nc),
                        "proto": proto}

            self._predict_cache[shape] = predict_jit(
                fn, tune=self.config.xla_predict_tuning and not packed)
        return self._predict_cache[shape]

    def _nms_of(self, out):
        return None if self.arch.end2end else out["nms"]

    def _batch_results(self, out, i, conf, hw, orig_shape
                       ) -> List[YoloResult]:
        h, w = hw
        oh, ow = orig_shape
        proto = out["proto"][i]
        if self.arch.end2end:
            rows = out["rows"][i]
            keep = rows[:, 4] > conf
            boxes, scores = rows[keep, :4], rows[keep, 4]
            classes, coeffs = rows[keep, 5].astype(int), rows[keep, 6:]
        else:
            nms = out["nms"]
            valid = np.asarray(nms.valid[i])
            boxes = np.asarray(nms.boxes[i])[valid]
            scores = np.asarray(nms.scores[i])[valid]
            classes = np.asarray(nms.classes[i])[valid]
            coeffs = np.asarray(nms.extras[i])[valid]
        if len(boxes):
            masks = np.asarray(process_mask(
                jnp.asarray(proto).transpose(2, 0, 1), jnp.asarray(coeffs),
                jnp.asarray(boxes), (h, w), upsample=True))
        results: List[YoloResult] = []
        for j in range(len(boxes)):
            x1, y1, x2, y2 = boxes[j]
            r = Detector._result_from_box(x1, y1, x2, y2, scores[j],
                                          classes[j])
            r.mask = masks[j][:oh, :ow]
            results.append(r)
        return results

    def _stream_results(self, out, i, conf, meta) -> List[YoloResult]:
        import cv2

        ratio, pl, pu, ih, iw = meta
        if self.arch.end2end:
            rows = out["rows"]
            cand = self._xyxy_candidates(rows, i, conf)
        else:
            cand = self._xyxy_candidates(out["nms"], i, conf)
        boxes, scores, classes, coeffs = cand
        s = out["proto"][i].shape[0] * 4  # proto is canvas/4
        results: List[YoloResult] = []
        if len(boxes):
            masks = np.asarray(process_mask(
                jnp.asarray(out["proto"][i]).transpose(2, 0, 1),
                jnp.asarray(coeffs), jnp.asarray(boxes), (s, s),
                upsample=True))
        nw, nh = int(iw * ratio), int(ih * ratio)
        for j in range(len(boxes)):
            x1, y1, x2, y2 = boxes[j]
            x1 = np.clip((x1 - pl) / ratio, 0, iw)
            x2 = np.clip((x2 - pl) / ratio, 0, iw)
            y1 = np.clip((y1 - pu) / ratio, 0, ih)
            y2 = np.clip((y2 - pu) / ratio, 0, ih)
            r = Detector._result_from_box(x1, y1, x2, y2, scores[j],
                                          classes[j])
            # undo the LetterBox on the mask: crop the content region,
            # resize back to the original image's pixels
            m = masks[j][pu:pu + nh, pl:pl + nw].astype(np.float32)
            r.mask = cv2.resize(m, (iw, ih),
                                interpolation=cv2.INTER_LINEAR)
            results.append(r)
        return results

    def image_predict(self, image, predict_threshold=None,
                      iou_threshold=None) -> List[YoloResult]:
        conf = (self.config.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (self.config.iou_threshold if iou_threshold is None
               else iou_threshold)
        variables = self._predict_variables()
        oh, ow = image.shape[:2]
        img = np.asarray(image, np.uint8)[None]
        # pad on host in uint8 and ship uint8: 4x less tunnel
        # traffic than f32; the jitted fn normalizes on device
        ph, pw = (-img.shape[1]) % 32, (-img.shape[2]) % 32
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         constant_values=114)

        fn = self._predict_fn(img.shape)
        decoded = jax.device_get(fn(variables, jnp.asarray(img), conf, iou))
        nms = self._nms_of(decoded)
        if nms is not None:
            _warn_if_truncated(nms)
        h, w = img.shape[1:3]
        return self._batch_results(decoded, 0, conf, (h, w), (oh, ow))


class Obber(Detector):
    task = TaskType.obb
    loss_names = ("box_loss", "cls_loss", "dfl_loss", "angle_loss")
    val_conf = 0.01

    def _loss_fns(self):
        nc = self.config.number_class
        if self.arch.end2end:
            fn = e2e_wrap(partial(obb_loss, nc=nc, tal_topk=10),
                          partial(obb_loss, nc=nc, tal_topk=7, tal_topk2=1))
        else:
            base = partial(obb_loss, nc=nc)

            def fn(preds, batch, **kw):
                return base(preds["one2many"], batch)
        return fn, fn

    def _decode_for_val(self, preds):
        branch = preds["one2one"] if self.arch.end2end else preds["one2many"]
        dec = decode_inference(branch, nc=self.config.number_class,
                               end2end=self.arch.end2end)
        if self.arch.end2end:
            return e2e_postprocess(dec.swapaxes(-1, -2),
                                   nc=self.config.number_class, extra=1)
        return non_max_suppression(dec, self.val_conf, 0.7,
                                   nc=self.config.number_class, rotated=True)

    def _accumulate_val(self, acc, batch, decoded):
        h, w = batch["images"].shape[1:3]
        for i in range(batch["images"].shape[0]):
            if self.arch.end2end:
                rows = decoded[i]
                keep = rows[:, 4] > self.val_conf
                # e2e rows: x,y,w,h(center-form rbox), score, cls, angle
                rbox = np.concatenate([rows[keep, :4], rows[keep, 6:7]], -1)
                scores, classes = rows[keep, 4], rows[keep, 5].astype(int)
            else:
                valid = np.asarray(decoded.valid[i])
                rbox = np.asarray(decoded.boxes[i])[valid]  # (n, 5) xywhr
                scores = np.asarray(decoded.scores[i])[valid]
                classes = np.asarray(decoded.classes[i])[valid]
            gmask = batch["mask_gt"][i]
            gcls = batch["cls"][i][gmask].astype(float)
            gb = batch["bboxes"][i][gmask]
            grbox = np.concatenate(
                [gb[:, :4] * [w, h, w, h], gb[:, 4:5]], -1)
            if len(rbox) and len(grbox):
                iou = np.asarray(batch_probiou(jnp.asarray(grbox),
                                               jnp.asarray(rbox)))
            else:
                iou = np.zeros((len(grbox), len(rbox)))
            acc["tp"].append(match_predictions(classes.astype(float), gcls,
                                               iou))
            acc["conf"].append(scores)
            acc["pred_cls"].append(classes.astype(float))
            acc["target_cls"].append(gcls)

    def _predict_fn(self, shape, packed: bool = False):
        if shape not in self._predict_cache:
            nc = self.config.number_class

            def fn(variables, x, conf, iou):
                x = x.astype(jnp.float32) / 255.0
                preds = self._apply_eval(
                    variables, x, skip_one2many=self.arch.end2end,
                    packed=packed)
                branch = (preds["one2one"] if self.arch.end2end
                          else preds["one2many"])
                if self.arch.end2end:
                    dec = decode_inference(branch, nc=nc, end2end=True)
                    return e2e_postprocess(dec.swapaxes(-1, -2), nc=nc,
                                           extra=1)
                if self.config.nms_pre_topk:
                    dec, trunc = decode_inference_topk(
                        branch, nc=nc, conf_thres=conf,
                        k=self.config.nms_pre_topk)
                    out = non_max_suppression(dec, conf, iou, nc=nc,
                                              rotated=True)
                    return out._replace(truncated=out.truncated | trunc)
                dec = decode_inference(branch, nc=nc)
                return non_max_suppression(dec, conf, iou, nc=nc,
                                           rotated=True)

            self._predict_cache[shape] = predict_jit(
                fn, tune=self.config.xla_predict_tuning and not packed)
        return self._predict_cache[shape]

    def _batch_results(self, out, i, conf, hw, orig_shape
                       ) -> List[YoloResult]:
        results: List[YoloResult] = []
        if self.arch.end2end:
            for row in out[i]:
                if row[4] <= conf:
                    continue
                results.append(YoloResult(
                    class_id=int(row[5]), score=float(row[4]),
                    center_x=int(row[0]), center_y=int(row[1]),
                    width=int(row[2]), height=int(row[3]),
                    radian=float(row[6])))
        else:
            for j in range(int(out.valid[i].sum())):
                cx, cy, bw, bh, r = out.boxes[i][j]
                results.append(YoloResult(
                    class_id=int(out.classes[i][j]),
                    score=float(out.scores[i][j]), center_x=int(cx),
                    center_y=int(cy), width=int(bw), height=int(bh),
                    radian=float(r)))
        return results

    def _stream_results(self, out, i, conf, meta) -> List[YoloResult]:
        ratio, pl, pu, ih, iw = meta
        if self.arch.end2end:
            rows = out[i]
            keep = rows[:, 4] > conf
            rboxes = np.concatenate([rows[keep, :4], rows[keep, 6:7]], -1)
            scores, classes = rows[keep, 4], rows[keep, 5].astype(int)
        else:
            valid = np.asarray(out.valid[i])
            rboxes = np.asarray(out.boxes[i])[valid]     # (n, 5) xywhr
            scores = np.asarray(out.scores[i])[valid]
            classes = np.asarray(out.classes[i])[valid]
        results: List[YoloResult] = []
        for (cx, cy, bw, bh, r), score, cls in zip(rboxes, scores, classes):
            # rotated boxes scale uniformly under the letterbox inverse;
            # the angle is invariant
            results.append(YoloResult(
                class_id=int(cls), score=float(score),
                center_x=int((cx - pl) / ratio),
                center_y=int((cy - pu) / ratio),
                width=int(bw / ratio), height=int(bh / ratio),
                radian=float(r)))
        return results

    def image_predict(self, image, predict_threshold=None,
                      iou_threshold=None) -> List[YoloResult]:
        conf = (self.config.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (self.config.iou_threshold if iou_threshold is None
               else iou_threshold)
        variables = self._predict_variables()
        img = np.asarray(image, np.uint8)[None]
        # pad on host in uint8 and ship uint8: 4x less tunnel
        # traffic than f32; the jitted fn normalizes on device
        ph, pw = (-img.shape[1]) % 32, (-img.shape[2]) % 32
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         constant_values=114)

        fn = self._predict_fn(img.shape)
        out = jax.device_get(fn(variables, jnp.asarray(img), conf, iou))
        nms = self._nms_of(out)
        if nms is not None:
            _warn_if_truncated(nms)
        return self._batch_results(out, 0, conf, img.shape[1:3],
                                   image.shape[:2])


class PoseDetector(Detector):
    task = TaskType.pose
    loss_names = ("box_loss", "pose_loss", "kobj_loss", "cls_loss",
                  "dfl_loss")
    val_conf = 0.01
    metric_names = ("precision(B)", "recall(B)", "mAP50(B)", "mAP50-95(B)",
                    "precision(P)", "recall(P)", "mAP50(P)", "mAP50-95(P)")

    def _loss_fns(self):
        cfg = self.config
        kw = dict(nc=cfg.number_class, kpt_num=cfg.keypoint_num,
                  kpt_dim=cfg.keypoint_dim)
        if self.arch.end2end:
            fn = e2e_wrap(partial(pose_loss, tal_topk=10, **kw),
                          partial(pose_loss, tal_topk=7, tal_topk2=1, **kw))
        else:
            base = partial(pose_loss, **kw)

            def fn(preds, batch, **kwargs):
                return base(preds["one2many"], batch)
        return fn, fn

    def _decode_branch(self, preds):
        # overrides Detector's: keypoint extras must ride through the E2E
        # top-k select, and the decode honours configured kpt shapes
        cfg = self.config
        branch = preds["one2one"] if self.arch.end2end else preds["one2many"]
        dec = decode_inference(branch, nc=cfg.number_class,
                               end2end=self.arch.end2end,
                               kpt_num=cfg.keypoint_num,
                               kpt_dim=cfg.keypoint_dim)
        if self.arch.end2end:
            dec = e2e_postprocess(dec.swapaxes(-1, -2), nc=cfg.number_class,
                                  extra=cfg.keypoint_num * cfg.keypoint_dim)
        return dec

    def _decode_branch_topk(self, preds, conf, k):
        cfg = self.config
        return decode_inference_topk(preds["one2many"], nc=cfg.number_class,
                                     conf_thres=conf, k=k,
                                     kpt_num=cfg.keypoint_num,
                                     kpt_dim=cfg.keypoint_dim)

    def _batch_results(self, out, i, conf, hw, orig_shape
                       ) -> List[YoloResult]:
        K, kd = self.config.keypoint_num, self.config.keypoint_dim
        if self.arch.end2end:
            rows = out[i]
            keep = rows[:, 4] > conf
            boxes, scores = rows[keep, :4], rows[keep, 4]
            classes, kpts = rows[keep, 5].astype(int), rows[keep, 6:]
        else:
            valid = np.asarray(out.valid[i])
            boxes = np.asarray(out.boxes[i])[valid]
            scores = np.asarray(out.scores[i])[valid]
            classes = np.asarray(out.classes[i])[valid]
            kpts = np.asarray(out.extras[i])[valid]
        results: List[YoloResult] = []
        for j in range(len(boxes)):
            r = Detector._result_from_box(*boxes[j], scores[j], classes[j])
            pts = kpts[j].reshape(K, kd)
            r.keypoints = [KeyPoint(float(p[0]), float(p[1]),
                                    float(p[2]) if kd == 3 else 1.0)
                           for p in pts]
            results.append(r)
        return results

    def _stream_results(self, out, i, conf, meta) -> List[YoloResult]:
        ratio, pl, pu, ih, iw = meta
        K, kd = self.config.keypoint_num, self.config.keypoint_dim
        boxes, scores, classes, kpts = self._xyxy_candidates(out, i, conf)
        results: List[YoloResult] = []
        for j in range(len(boxes)):
            x1, y1, x2, y2 = boxes[j]
            x1 = np.clip((x1 - pl) / ratio, 0, iw)
            x2 = np.clip((x2 - pl) / ratio, 0, iw)
            y1 = np.clip((y1 - pu) / ratio, 0, ih)
            y2 = np.clip((y2 - pu) / ratio, 0, ih)
            r = Detector._result_from_box(x1, y1, x2, y2, scores[j],
                                          classes[j])
            pts = kpts[j].reshape(K, kd)
            r.keypoints = [
                KeyPoint(float(np.clip((p[0] - pl) / ratio, 0, iw)),
                         float(np.clip((p[1] - pu) / ratio, 0, ih)),
                         float(p[2]) if kd == 3 else 1.0)
                for p in pts]
            results.append(r)
        return results

    def _decode_for_val(self, preds):
        dec = self._decode_branch(preds)
        if self.arch.end2end:
            return dec
        return non_max_suppression(dec, self.val_conf, 0.7,
                                   nc=self.config.number_class)

    def _new_val_accumulator(self):
        acc = super()._new_val_accumulator()
        acc["tp_p"] = []
        return acc

    def _accumulate_val(self, acc, batch, decoded):
        cfg = self.config
        h, w = batch["images"].shape[1:3]
        scale = np.array([w, h, w, h], np.float32)
        K, kd = cfg.keypoint_num, cfg.keypoint_dim
        sigmas = OKS_SIGMA if K == 17 else np.ones(K, np.float32) / K
        for i in range(batch["images"].shape[0]):
            if self.arch.end2end:
                rows = decoded[i]
                keep = rows[:, 4] > self.val_conf
                boxes, scores = rows[keep, :4], rows[keep, 4]
                classes = rows[keep, 5].astype(int)
                kpts = rows[keep, 6:].reshape(-1, K, kd)
            else:
                valid = np.asarray(decoded.valid[i])
                boxes = np.asarray(decoded.boxes[i])[valid]
                scores = np.asarray(decoded.scores[i])[valid]
                classes = np.asarray(decoded.classes[i])[valid]
                kpts = np.asarray(decoded.extras[i])[valid].reshape(-1, K, kd)
            gmask = batch["mask_gt"][i]
            gcls = batch["cls"][i][gmask].astype(float)
            gxywh = batch["bboxes"][i][gmask][:, :4] * scale
            gxyxy = np.concatenate([gxywh[:, :2] - gxywh[:, 2:] / 2,
                                    gxywh[:, :2] + gxywh[:, 2:] / 2], -1)
            gkpt = batch["keypoints"][i][gmask].copy()
            if gkpt.shape[-1] == 2:
                gkpt = np.concatenate(
                    [gkpt, np.ones(gkpt.shape[:-1] + (1,), np.float32)], -1)
            gkpt[..., 0] *= w
            gkpt[..., 1] *= h
            if len(boxes) and len(gxyxy):
                iou = np.asarray(box_iou(jnp.asarray(gxyxy),
                                         jnp.asarray(boxes)))
                area = (gxywh[:, 2] * gxywh[:, 3]) * 0.53
                piou = np.asarray(kpt_iou(jnp.asarray(gkpt),
                                          jnp.asarray(kpts),
                                          jnp.asarray(area),
                                          jnp.asarray(sigmas)))
            else:
                iou = np.zeros((len(gxyxy), len(boxes)))
                piou = np.zeros((len(gxyxy), len(boxes)))
            acc["tp"].append(match_predictions(classes.astype(float), gcls,
                                               iou))
            acc["tp_p"].append(match_predictions(classes.astype(float), gcls,
                                                 piou))
            acc["conf"].append(scores)
            acc["pred_cls"].append(classes.astype(float))
            acc["target_cls"].append(gcls)

    def _finalize_val(self, acc, count):
        if not acc["tp"]:
            return [0.0] * 8
        conf = np.concatenate(acc["conf"])
        pred_cls = np.concatenate(acc["pred_cls"])
        target_cls = np.concatenate(acc["target_cls"])
        box = summarize(ap_per_class(np.concatenate(acc["tp"]), conf,
                                     pred_cls, target_cls))
        kpt = summarize(ap_per_class(np.concatenate(acc["tp_p"]), conf,
                                     pred_cls, target_cls))
        print(f"{'All':>10}{count:>10}{len(target_cls):>10} "
              f"Box: {box[2]:.3f}/{box[3]:.3f} Pose: {kpt[2]:.3f}/{kpt[3]:.3f}")
        return list(box) + list(kpt)

    def image_predict(self, image, predict_threshold=None,
                      iou_threshold=None) -> List[YoloResult]:
        cfg = self.config
        conf = (cfg.predict_threshold if predict_threshold is None
                else predict_threshold)
        iou = (cfg.iou_threshold if iou_threshold is None else iou_threshold)
        variables = self._predict_variables()
        img = np.asarray(image, np.uint8)[None]
        # pad on host in uint8 and ship uint8: 4x less tunnel
        # traffic than f32; the jitted fn normalizes on device
        ph, pw = (-img.shape[1]) % 32, (-img.shape[2]) % 32
        if ph or pw:
            img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                         constant_values=114)

        fn = self._predict_fn(img.shape)
        out = jax.device_get(fn(variables, jnp.asarray(img), conf, iou))
        nms = self._nms_of(out)
        if nms is not None:
            _warn_if_truncated(nms)
        return self._batch_results(out, 0, conf, img.shape[1:3],
                                   image.shape[:2])


class Classifier(BaseTask):
    task = TaskType.classify
    loss_names = ("cls_loss",)
    metric_names = ("top1", "top5")

    def _loss_fns(self):
        def fn(preds, batch, **kw):
            return classification_loss(preds, batch)
        return fn, fn

    def _make_datasets(self):
        return (ClassificationDataset(self.config, is_val=False),
                ClassificationDataset(self.config, is_val=True))

    def _decode_for_val(self, preds):
        return jax.nn.softmax(preds["cls"].astype(jnp.float32), -1)

    def _new_val_accumulator(self):
        return {"top1": 0, "top5": 0, "n": 0}

    def _accumulate_val(self, acc, batch, decoded):
        probs = np.asarray(decoded)
        labels = np.asarray(batch["cls"]).reshape(-1)
        top5 = np.argsort(-probs, -1)[:, :5]
        acc["top1"] += int((top5[:, 0] == labels).sum())
        acc["top5"] += int((top5 == labels[:, None]).any(-1).sum())
        acc["n"] += len(labels)

    def _finalize_val(self, acc, count):
        n = max(acc["n"], 1)
        top1, top5 = acc["top1"] / n, acc["top5"] / n
        print(f"{'All':>10}{count:>10}{top1:>10.3f}{top5:>10.3f}")
        return [top1, top5]

    def _predict_fn(self, shape):
        if shape not in self._predict_cache:

            def fn(variables, x):
                preds = self._apply_eval(variables, x / 255.0)
                return jax.nn.softmax(preds["cls"].astype(jnp.float32), -1)

            self._predict_cache[shape] = predict_jit(
                fn, tune=self.config.xla_predict_tuning)
        return self._predict_cache[shape]

    def image_predict(self, image, predict_threshold=None,
                      iou_threshold=None) -> List[YoloResult]:
        variables = self._predict_variables()
        import cv2

        s = self.config.image_size
        # uint8 transport; the jitted fn divides by 255 on device
        img = cv2.resize(np.asarray(image), (s, s)).astype(np.uint8)[None]
        fn = self._predict_fn(img.shape)
        probs = np.asarray(jax.device_get(fn(variables, jnp.asarray(img))))[0]
        order = np.argsort(-probs)
        return [YoloResult(class_id=int(i), score=float(probs[i]))
                for i in order[:5]]

    def batch_predict(self, images, predict_threshold=None,
                      iou_threshold=None, mesh=None
                      ) -> List[List[YoloResult]]:
        """Batched classification: N images -> N top-5 lists in one
        device program (the reference classifies one image per call,
        Classifier.cs). mesh: optional data-parallel Mesh."""
        import cv2

        variables = self._predict_variables()
        s = self.config.image_size
        batch = np.stack([cv2.resize(np.asarray(im), (s, s)).astype(np.uint8)
                          for im in images])
        if mesh is not None:
            jb, variables = self._sharded_predict_inputs(
                batch, variables, mesh)
        else:
            jb = jnp.asarray(batch)
        fn = self._predict_fn(jb.shape)
        probs = np.asarray(jax.device_get(fn(variables, jb)))[:len(images)]
        out: List[List[YoloResult]] = []
        for p in probs:
            order = np.argsort(-p)
            out.append([YoloResult(class_id=int(i), score=float(p[i]))
                        for i in order[:5]])
        return out

    def predict_stream(self, images, batch_size: int = 16,
                       imgsz: Optional[int] = None,
                       predict_threshold=None, iou_threshold=None,
                       workers: int = 4, mesh=None):
        """Pipelined streaming classification: yields one top-5
        ``List[YoloResult]`` per input image, in order. Preprocessing is
        the val-time eval pipeline (resize shorter side to imgsz, center
        crop — dataset.py ClassificationDataset.get), run on a host
        worker pool; batches stream through a depth-2 device pipeline
        like the detect families (the reference classifies one image per
        call, Models/Classifier.cs:28-59)."""
        import cv2

        variables = self._predict_variables()
        s = imgsz or self.config.image_size
        sharding = None
        if mesh is not None:
            from .parallel.mesh import DATA_AXIS, batch_sharding

            dp = mesh.shape[DATA_AXIS]
            batch_size = -(-batch_size // dp) * dp
            sharding = batch_sharding(mesh)
            variables = self._replicated_vars(mesh, variables)
        fn = self._predict_fn((batch_size, s, s, 3))

        from concurrent.futures import ThreadPoolExecutor

        from .data.loader import device_prefetch

        def prep_one(im):
            im = np.asarray(im, np.uint8)
            h, w = im.shape[:2]
            r = s / min(h, w)
            im = cv2.resize(im, (max(s, int(w * r)), max(s, int(h * r))))
            h, w = im.shape[:2]
            top, left = (h - s) // 2, (w - s) // 2
            return im[top:top + s, left:left + s]

        def host_batches():
            with ThreadPoolExecutor(max(1, workers)) as pool:
                buf = []
                for out in pool.map(prep_one, images):
                    buf.append(out)
                    if len(buf) == batch_size:
                        yield np.stack(buf), batch_size
                        buf = []
                if buf:
                    n = len(buf)
                    buf += [buf[-1]] * (batch_size - n)
                    yield np.stack(buf), n

        def put(item):
            batch, n = item
            if sharding is not None:
                return jax.device_put(batch, sharding), n
            return jnp.asarray(batch), n

        def unpack(item):
            out, n = item
            probs = np.asarray(jax.device_get(out))[:n]
            for p in probs:
                order = np.argsort(-p)
                yield [YoloResult(class_id=int(i), score=float(p[i]))
                       for i in order[:5]]

        pending = []
        for jb, n in device_prefetch(host_batches(), put, depth=2):
            pending.append((fn(variables, jb), n))
            if len(pending) >= 2:
                yield from unpack(pending.pop(0))
        while pending:
            yield from unpack(pending.pop(0))


_TASKS = {TaskType.detect: Detector, TaskType.segment: Segmenter,
          TaskType.obb: Obber, TaskType.pose: PoseDetector,
          TaskType.classify: Classifier}


class YoloTask:
    """Public facade (Models/YoloTask.cs:10-107)."""

    def __init__(self, config: Config):
        self.config = config
        self.task = _TASKS[config.task_type](config)

    def load_model(self, path: str, skip_nc_not_equal_layers: bool = False):
        return self.task.load_model(path, skip_nc_not_equal_layers)

    def save_weight(self, path: str):
        return self.task.save_weight(path)

    def train(self, resume_from: Optional[str] = None):
        return self.task.train(resume_from=resume_from)

    def image_predict(self, image, predict_threshold: Optional[float] = None,
                      iou_threshold: Optional[float] = None):
        if isinstance(image, str):
            import cv2

            image = cv2.cvtColor(cv2.imread(image, cv2.IMREAD_COLOR),
                                 cv2.COLOR_BGR2RGB)
        return self.task.image_predict(image, predict_threshold,
                                       iou_threshold)

    def calibrate_int8(self, images=None, n_images: int = 16,
                       batch_size: int = 8):
        return self.task.calibrate_int8(images, n_images=n_images,
                                        batch_size=batch_size)

    def save_calibration(self, path: str):
        return self.task.save_calibration(path)

    def load_calibration(self, path: str):
        return self.task.load_calibration(path)

    def batch_predict(self, images, predict_threshold: Optional[float] = None,
                      iou_threshold: Optional[float] = None, mesh=None):
        """Batched inference for every task family: one device program
        for N images (results per image match image_predict). Pass a
        mesh (parallel.create_mesh) to run it data-parallel across
        chips."""
        return self.task.batch_predict(images, predict_threshold,
                                       iou_threshold, mesh=mesh)

    def predict_stream(self, images, batch_size: int = 16,
                       imgsz: Optional[int] = None,
                       predict_threshold: Optional[float] = None,
                       iou_threshold: Optional[float] = None,
                       workers: int = 4, mesh=None):
        """Pipelined streaming inference (all five task families):
        yields one List[YoloResult] per input image — original-image
        coordinates for detect/segment/obb/pose, top-5 class scores for
        classify; host preprocessing pool + transfer thread + depth-2
        device pipeline, optionally data-parallel over a mesh."""
        return self.task.predict_stream(
            images, batch_size=batch_size, imgsz=imgsz,
            predict_threshold=predict_threshold,
            iou_threshold=iou_threshold, workers=workers, mesh=mesh)
