"""Training/prediction configuration.

Parity target: Data/Config.cs:10-355 (~45 hyperparameters, same defaults).
TPU-specific additions at the bottom (max_labels padding, mesh axes, compute
dtype policy).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

from .types import (AutoAugmentType, ImageProcessType, ScalarType, TaskType,
                    YoloSize, YoloType)


@dataclasses.dataclass
class Config:
    root_path: str = "Assets/DataSets/coco128"
    train_data_path: str = "train.txt"
    val_data_path: str = "val.txt"
    output_path: str = ""

    image_size: int = 640
    batch_size: int = 16
    number_class: int = 80
    epochs: int = 100
    predict_threshold: float = 0.3
    iou_threshold: float = 0.7
    # parity field: the reference declares LearningRate (Config.cs:65) but
    # its only consumer is a commented-out SGD (YoloBaseTaskModel.cs:140);
    # the active AdamW lr is always lr_fit = 0.002*5/(4+nc). Kept so configs
    # port 1:1.
    learning_rate: float = 1e-4
    use_cos_lr: bool = False
    lrf: float = 0.01
    workers: int = min((os.cpu_count() or 8) // 2, 4)

    yolo_type: YoloType = YoloType.v8
    yolo_size: YoloSize = YoloSize.n
    task_type: TaskType = TaskType.detect
    # reference default is Float16 (Config.cs:105); on TPU that maps to
    # bfloat16 compute with fp32 params
    scalar_type: ScalarType = ScalarType.float16
    image_process_type: ImageProcessType = ImageProcessType.mosaic

    patience: int = 50
    keypoint_num: int = 17
    keypoint_dim: int = 3

    hsv_v: float = 0.4
    hsv_s: float = 0.7
    hsv_h: float = 0.015
    mask_ratio: int = 4
    mosaic: float = 1.0
    # parity field: the reference validates MosaicCount in {4, 9} but its
    # Mosaic always runs _mosaic4 (Augment.cs:148-150); only 4 is real.
    mosaic_count: int = 4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flip_lr: float = 0.5
    flip_ud: float = 0.0

    classify_ratio_max: float = 4.0 / 3
    classify_ratio_min: float = 0.75
    classify_scale_max: float = 1.0
    classify_scale_min: float = 0.08
    erasing: float = 0.4
    auto_augment: AutoAugmentType = AutoAugmentType.autoaugment

    warm_up_epochs: int = 3
    warm_up_bias_lr: float = 0.1
    close_mosaic: int = 0
    end2end: bool = True

    # ---- TPU-native additions (no reference counterpart) ----
    # Static candidate cap fed to predict-time NMS. The reference keeps up
    # to max_nms=30000 dynamic candidates (Utils/Ops.cs:242); on TPU the
    # pool must be a static shape. 2048 is exact whenever fewer than 2048
    # anchors clear predict_threshold (always true for trained models at
    # conf >= 0.25); NMSOutput.truncated flags the exceptions and the task
    # layer warns. None = all anchors (exact reference semantics, slower).
    # Validation always runs un-capped.
    nms_pre_topk: Optional[int] = 2048
    # Fold BatchNorm into conv kernels for predict (the reference's fuse(),
    # Convs.cs:58-61). Numerically equivalent (fp32 fold); ~40% faster
    # forward on TPU because eval-BN's per-channel affine otherwise breaks
    # XLA's conv layout chain with full-tensor copies.
    fuse_inference: bool = True
    # Route eligible 3x3/s1 convs to the Pallas im2col kernel during
    # fused-inference predict on TPU (kernels/conv3x3.py). Standalone the
    # kernel is 2.4x faster than XLA on the pathological channel-reducing
    # high-res convs, but in-graph the pallas_call boundary (pad + junk-
    # column slice + lost producer fusion) costs the win back: v8s-640 b32
    # measured 1534 img/s routed vs 1566 unrouted. Off by default; a knob
    # for other model/hardware mixes.
    pallas_conv: bool = False
    # Space-to-depth rewrite of small-channel stride-2 3x3 convs during
    # fused-inference predict: exactly equivalent stride-1 2x2 conv over
    # the 2x2 space-to-depth input (nn/common.py s2d_stride2). Value = max
    # input channels eligible (3 = stem only, 0 = off). The stem's
    # 3-channel stride-2 conv is XLA's worst layout case (32/128 lanes);
    # rewritten it runs at 4x the input channels and half the resolution.
    # MEASURED a net ~7% loss on v5e (v8s-640 b32: 1451 img/s s2d3 /
    # 1462 s2d16 vs 1565 off — the s2d transpose relayout costs more than
    # the stem saves under this XLA), so off by default; kept as a knob
    # for other model/hardware mixes (exactness is unit+model tested).
    s2d_max_cin: int = 0
    # int8 post-training-quantized predict (v5e int8 MXU ~= 2x bf16 peak).
    # Requires a calibration pass first: YoloTask.calibrate_int8() records
    # per-conv activation absmax through the fused predict graph; predict
    # then runs dense ConvBN convs as symmetric int8 (per-channel weight
    # scales, int32 accumulation — nn/common.py int8_conv). Head final
    # convs and decode stay float. Off by default pending per-model
    # numerics validation (bench.py records box parity vs the bf16 path).
    int8_predict: bool = False
    # Render train augmentations (mosaic+perspective+flips+HSV) on device
    # as one jitted program (data/device_augment.py) instead of per-sample
    # host cv2. Labels keep the exact host math. Falls back to the host
    # path automatically when mosaic is off/probabilistic or for val.
    device_augment: bool = True
    # Dataset-wide mosaic partner sampling for the device-augment path
    # (the reference's distribution, YoloDataset.cs:65): ship this many
    # extra dataset-wide images per data-parallel shard group and draw
    # partners from the enlarged pool. 0 (default) = batch-local partners
    # (a uniform within-epoch sample; avoids the extra host->HBM image
    # traffic). The host path (device_augment=False) is always
    # dataset-wide.
    mosaic_partner_pool: int = 0
    # FSDP/ZeRO-style training-state sharding over the data mesh
    # (parallel/fsdp.py): parameters + optimizer moments are sharded
    # per-leaf along the largest divisible axis; XLA all-gathers each
    # layer's params on use and reduce-scatters its grads over ICI (GSPMD
    # annotations, no hand-written collectives). Off by default — every
    # supported model (v12x ~110M params) fits one chip replicated, so DP
    # is the parity configuration; fsdp=True is the memory/scale-out axis
    # (the reference has no distributed training at all, SURVEY.md §2).
    fsdp: bool = False
    # True fp16 compute with the reference's dynamic loss scaling
    # (Amp.cs:3-176: init 65536, /2 on non-finite, x2 every 2000 good
    # steps). Off by default: ScalarType.float16 maps to bf16 on TPU,
    # which needs no scaling. Parity shim for exact fp16 AMP semantics.
    true_fp16: bool = False
    # Host-packed space-to-depth input for the BATCHED serving paths
    # (batch_predict / predict_stream): the host packs the uint8 canvas
    # 2x2-to-depth (native C++ ys_s2d_pack_u8, ~16 ms/640px-b32 on one
    # idle core — pipelined behind device compute in predict_stream) and
    # the stem runs as the exact stride-1 repacked conv with NO in-graph
    # transpose (nn/common.py s2d_packed_input; covers the 3x3/s2 stem of
    # v8/v11/v12 and v5u's 6x6/s2/p2). Measured +2.8..3.6% device
    # throughput paired on v5e (the in-graph variant s2d_max_cin was a 7%
    # LOSS — the transpose was the cost). image_predict stays unpacked
    # (single-image latency: the pack costs more than the stem saves).
    # None = auto: enabled when the host has >= 4 cores (on a starved
    # host the pack contends with the JAX runtime — measured 136 ms/batch
    # in-process on a 1-core host vs 16 ms standalone — and would erase
    # the ~0.6 ms/batch device win in any host-bound pipeline).
    host_s2d: Optional[bool] = None
    # Deep packing on top of host_s2d: the stem also EMITS its output
    # space-to-depth packed (a second pure weights transform,
    # nn/common.py repack_s2d_kernel_deep) and conv1 consumes the packed
    # tensor as the exact 2x2 stride-1 repacked conv — BOTH early convs
    # then run with >=4x the channels (full MXU lanes instead of the
    # measured 32/128-lane pathology) and there is still no in-graph
    # transpose anywhere. Measured +15% device throughput paired on v5e
    # (v8s-640 b32: 1935 vs 1682 img/s same run). Applies whenever the
    # packed path is active; exact for all four stems.
    host_s2d_deep: bool = True
    # Deeper packing on top of deep (v8 family only): conv1 ALSO emits
    # packed (stride-2 packed->packed) and the layer-2 C2f runs entirely
    # on the packed grid — its 1x1 convs as parity-diagonal packed 1x1s
    # and its 3x3/s1 bottleneck convs as 3-tap packed convs (4x dense
    # FLOPs for 4x MXU lanes on convs XLA was measured running at ~4.5%
    # MFU); layer 3 consumes FLOP-neutrally. Exact (tests/test_fuse.py).
    # Measured +16.6% paired on top of deep on v5e (v8s-640 b32:
    # 2207 vs 1894 img/s same run — 32.1% MFU). Auto-ignored for
    # non-v8 architectures (layer 2 must be a C2f).
    host_s2d_deeper: bool = True
    # Head-tower first-conv fusion (legacy heads, fused inference only):
    # each level's cv2.i.0 and cv3.i.0 read the same feature map — run
    # them as ONE (c2+c3)-channel 3x3 and split (exact: output-axis
    # kernel concat; tests/test_fuse.py::test_head_fuse_matches_plain
    # _fused). Round-4 occupancy arithmetic called it a wash; round-5
    # MEASURED it properly: one-shot bench runs disagreed (+2.6 / -0.6 /
    # +0.2 / -1.7%), and the decisive 6-pair interleaved probe
    # (scripts/perf_headfuse_probe.py) reads -2.5..+0.2%, losing 5/6
    # pairs (mean -1.1%) — the concat re-tiles both tower inputs for no
    # lane gain at these widths. Default OFF; kernel + exactness test
    # kept as the record. No-op for non-legacy (v11/v12) cls towers,
    # whose DWConv first stage can't concat-fuse.
    head_tower_fuse: bool = False
    # TRAIN-side packing for the device-augment path: the mosaic render's
    # coordinate grid is a compile-time constant, so the canvas is emitted
    # 2x2 space-to-depth packed at ZERO cost (the gather writes the packed
    # layout directly — data/device_augment.py packed=True) and the stem
    # trains as the exact repacked 2x2 conv (BN stats and grads exact;
    # oracle test in test_device_augment.py). Measured +0.7..2.1% step
    # throughput in 3/3 pairs on v5e (v8n-320 b16). No effect on
    # host-prepared (non-device-augment) batches.
    train_packed_render: bool = True
    # Depth of the s2d-packed TRAIN region (requires train_packed_render
    # and the device-augment path): 0 = stem-only repacked conv (above),
    # 1 = the stem EMITS packed and conv1 consumes (deep), 2 = conv1 also
    # emits packed and the layer-2 CSP block (C2f/C3/C3k2-plain) runs
    # entirely on the packed grid (deeper). Real BatchNorm over the
    # exposed parity axis — stats/grads exactly match the plain path
    # (nn/common.py packed_batch_norm; oracle test in test_fuse.py).
    # Default 2 = measured winner on v5e (scripts/perf_train_tuning.py
    # v8n-320 b16, 4/4 pairs: depth 2 = 7.0-7.8 ms/step vs depth 1 =
    # 8.6-9.1 vs depth 0 = 10.3-10.9 vs gather render = 19.5; see
    # BASELINE.md round-4 rows). Auto-gated per arch in tasks.py like
    # host_s2d_deeper (depth 2 needs a packed-rewritable layer-2 CSP
    # block; ineligible arches clamp to 1).
    train_packed_depth: int = 2
    # Separable device-augment render: when the warp is axis-aligned
    # (degrees == shear == perspective == 0 — the reference's default
    # hyps), the whole mosaic+scale+translate+flip bilinear sample is
    # computed as dense per-tile 1-D interpolation MATMULS (MXU work)
    # instead of XLA gathers (data/device_augment.py _render_separable;
    # exact same semantics, f32 summation order only). The gather render
    # was measured as the single largest train-step sink (~9 ms of a
    # 19 ms v8n-320 b16 step). Auto-ignored when any of the three hyps
    # is nonzero.
    separable_render: bool = True
    # TPU compiler tuning for the jitted predict programs: latency-hiding
    # scheduler + 64 MiB scoped VMEM. Measured +1.2-2.4% paired on v5e
    # for UNPACKED predict programs but consistently negative stacked on
    # the host_s2d packed program (+0.75% vs packed-alone +3.0%,
    # scripts/perf_experiments_r3.py shootout) — so it is applied only to
    # unpacked predict jits. A no-op on non-TPU backends.
    xla_predict_tuning: bool = True
    # When set, capture a jax.profiler trace (viewable in TensorBoard /
    # xprof) of train steps 2-5 of the first epoch into this directory.
    # The reference has no profiler at all (SURVEY §5); this is the
    # TPU-native observability hook.
    profile_dir: Optional[str] = None
    # Full-train-state checkpoint backend written each epoch next to
    # last.bin: "npz" (one portable file) or "orbax" (directory; arrays
    # written with their shardings — the TPU-native multi-host format).
    # YoloTask.train(resume_from=...) auto-detects either on restore.
    resume_format: str = "npz"
    # Validation rectangle-shape buckets: the reference pads each val
    # batch to its own aspect-sorted max shape at zero cost
    # (Data/YoloDataset.cs:339-363); on TPU every distinct batch shape is
    # a separate compile of the jitted eval step. Quantize the per-batch
    # rectangle shapes to at most this many buckets (contiguous in aspect
    # order, minimum total padded area by DP; each image still fits — the
    # bucket shape dominates its batches) so an arbitrary-size val set
    # compiles O(buckets) eval programs instead of O(batches). 0 = exact
    # per-batch shapes (reference behavior, one compile per shape).
    # PARITY CAVEAT: bucketed batches carry extra 114-border padding (the
    # bucket max shape vs the batch's own max), so default val metrics can
    # drift slightly from reference-protocol numbers; set 0 when comparing
    # mAP side-by-side against the reference.
    val_shape_buckets: int = 4
    # Print a one-line advisory at train start when the per-chip batch
    # underfills the chip (measured v5e occupancy: b16->b64 is 1.8x
    # device throughput at v8n-320 — utils/training.py occupancy_hint).
    occupancy_hint: bool = True
    max_labels: Optional[int] = None   # per-image gt padding (None = auto)
    mesh_shape: Optional[Tuple[int, ...]] = None  # data-parallel mesh (auto)
    cache_images: bool = True          # eager RAM cache like the reference

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        if self.scalar_type == ScalarType.float32:
            return jnp.float32
        if self.true_fp16:
            return jnp.float16
        # fp16 requested -> bf16 (native on TPU, no loss-scaling needed)
        return jnp.bfloat16

    @property
    def kpt_shape(self) -> Tuple[int, int]:
        return (self.keypoint_num, self.keypoint_dim)

    def describe(self) -> str:
        return "\n".join(f"{f.name}: {getattr(self, f.name)}"
                         for f in dataclasses.fields(self))
