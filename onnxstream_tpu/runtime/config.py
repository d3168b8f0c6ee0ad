"""Session configuration.

Mirrors the reference Model's ~20 public option flags (src/onnxstream.h:944-968
and the string-keyed model_set_option surface, src/exports.cpp:276-301), plus
TPU-native knobs (compute dtype incl. bfloat16, HBM segment budget, flash
attention, sharding mesh).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Set

import numpy as np


@dataclasses.dataclass
class SessionConfig:
    # --- reference-parity flags -------------------------------------------
    support_dynamic_shapes: bool = False  # onnxstream.h:949
    # use_fp16_arithmetic in the reference; on TPU "float16" | "bfloat16" | "float32".
    compute_dtype: str = "float32"
    force_fp16_storage: bool = False  # demote resident fp32 weights (onnxstream.cpp:3764)
    force_uint8_storage_set: Set[str] = dataclasses.field(default_factory=set)
    use_uint8_qdq: bool = False  # quantize pushed intermediates (onnxstream.cpp:3022)
    # per-output-channel (scale, zp) when force-quantizing 2-D weights —
    # beyond-reference quality mode (the reference quantizes per tensor);
    # consumed by the w8_matmul kernel's per-channel epilogue
    uint8_per_channel: bool = False
    use_uint8_arithmetic: bool = False  # W8A8 ops (Pallas path)
    fuse_ops_in_attention: bool = True  # AttentionFusedOps recognizer (onnxstream.cpp:3576)
    attention_fused_ops_parts: int = 2  # accepted for parity; blockwise flash makes it moot
    use_scaled_dp_attn_op: bool = False  # LLM SDPA recognizers (onnxstream.cpp:3635)
    use_ops_cache: bool = True  # jit executable cache (always beneficial on XLA)
    use_next_op_cache: bool = True  # parse cache (the Graph is parsed once regardless)
    use_nchw_convs: bool = False  # layout is XLA's concern on TPU; accepted for parity
    # channel-last graph rewrite (runtime/layout.py). Default OFF: measured
    # on v5e, XLA's own layout assignment handles the NCHW graph as well as
    # the explicit rewrite (the logical transposes are already free), while
    # GroupNorm statistics become major-dim reductions in channel-last form
    # and run ~8x slower (0.76 -> 6.27 ms/step on the SD1.5 UNet). Kept as a
    # tested option for converted graphs without norm-heavy conv stacks.
    use_nhwc_layout: bool = False
    ops_printf: bool = False  # per-op log (onnxstream.cpp:3759)
    ops_times_printf: bool = False  # cumulative per-op-type ms (onnxstream.cpp:8199)
    range_data_calibrate: bool = False  # record activation ranges (onnxstream.cpp:2983)
    extra_outputs: List[str] = dataclasses.field(default_factory=list)
    weights_exclusion_set: Set[str] = dataclasses.field(default_factory=set)
    requires_upcast: Optional[Callable[[str, str], bool]] = None  # (op_type, op_name) -> bool

    # --- TPU-native knobs ---------------------------------------------------
    use_flash_attention: bool = True
    # absorb the head-split Reshape+Transpose around recognized attention into
    # ostpu.sdpa (packed Q/K/V): ~6 fewer graph ops per attention and no
    # explicit head transposes. Measured perf-neutral on the SD1.5 UNet —
    # XLA lowers the projection dot + head split into a head-axis convolution
    # either way, at ~0.6 ms/step total (docs/tpu_notes.md)
    fuse_attention_heads: bool = True
    # collapse the converter's GroupNorm decomposition (+SiLU) into one
    # ostpu.gn_silu op, backed on TPU by a one-HBM-pass Pallas kernel
    # (kernels/gn_silu.py): one grid step per batch row, stats + folded
    # affine + silu computed on the VMEM-resident slab. Default OFF: on a
    # real v5e the fused SD1.5 UNet step measured 21.0-21.5 ms vs 11.9 ms
    # decomposed — the opaque custom call severs XLA's fusion of the
    # norm chain into the neighboring convolutions, costing far more than
    # the one saved HBM pass (docs/tpu_notes.md A/B). Kept as a tested
    # option for memory-bound standalone-norm workloads.
    fuse_groupnorm: bool = False
    # compile with compiler-chosen (AUTO) weight layouts and upload weights
    # directly in that layout — otherwise XLA re-lays-out ~every weight on
    # every step (measured 665 async copies = 1.2 GB/step on the SD1.5 UNet)
    auto_weight_layouts: bool = True
    # run small-spatial / tiny-K convs as im2col + one MXU dot. Default OFF:
    # XLA's direct NCHW convolution for 8x8 outputs is ~10% MFU, but the
    # explicit patch-extraction (slice-stack-transpose) costs even more on
    # v5e — measured +4 ms/step on the SD1.5 UNet (11.6 -> 15.7). Kept as a
    # tested option; the tradeoff may differ for conv-heavy small-spatial
    # models where the patches fuse away.
    use_dot_convs: bool = False
    # run 3x3/stride-1 convs as three row-shifted MXU dots over a
    # column-im2col (HW, 3C) matrix (ops/standard.py _conv_rowdot): exact
    # conv FLOPs, contiguous row-shift slices. XLA's own conv emitters on
    # these shapes schedule space-to-batch / dot->conv forms that execute
    # ~3x the algorithmic FLOPs at ~12% effective MFU (docs/tpu_notes.md).
    use_rowdot_convs: bool = False
    # run small-spatial (HW <= 1024) lane-aligned 3x3 convs as im2col + the
    # opaque Pallas MXU matmul (kernels/matmul.py). Unlike use_dot_convs /
    # use_rowdot_convs — which LOST because XLA rewrites source-level
    # reshape(dot(im2col)) back into its own ~10% MFU conv schedule — the
    # Pallas call cannot be rewritten. Measured A/B on the SD1.5 UNet step
    # (tools/ab_unet.py, 2026-08-19): LOSES, 13.2 vs 12.26 ms same hour —
    # the opaque call drops the conv-adjacent elementwise fusions and the
    # XLA-side im2col concat is 9x activation HBM traffic. Default OFF;
    # kept for odd-shape models where XLA's conv schedule is pathological.
    use_pallas_smallconv: bool = False
    # fuse GroupNorm -> affine -> SiLU -> Conv3x3(s1 p1 g1) chains into the
    # one-HBM-pass Pallas kernel (kernels/gn_conv.py). Unlike fuse_groupnorm
    # (which LOST: the standalone norm kernel evicts the elementwise chain
    # from XLA's conv fusions) this absorbs the conv itself, so nothing is
    # left to un-fuse and the taps are formed in VMEM (no im2col HBM blowup).
    # Default set by the measured UNet-step A/B (tools/ab_unet.py,
    # docs/tpu_notes.md).
    fuse_gn_conv: bool = False
    # packed flash attention with a non-lane-aligned head dim (SD1.5 d=40):
    # route through the head-major UNPADDED kernel instead of zero-padding
    # each head to 128 lanes (the pad materializes 3.2x-sized HBM copies of
    # Q/K/V). Default set by the measured UNet-step A/B
    # (tools/ab_unet.py --nopad-packed, docs/tpu_notes.md).
    flash_packed_nopad: bool = False
    # flash-attention kernel tile sizes, 0 = kernel defaults (512, 1024).
    # Sweepable per model family (tools/ab_sdxl.py): tile shape matters most
    # on the SDXL step's 4096-token d=64 self-attention, where the score
    # matrix is largest relative to VMEM.
    flash_block_m: int = 0
    flash_block_n: int = 0
    # test-only: run Pallas kernel dispatches in interpret mode so the
    # session-level routing is exercisable on the CPU test backend
    pallas_interpret: bool = False
    # run MatMuls whose uint8 weight has NO calibrated range through the
    # weight-only Pallas kernel (kernels/qmatmul.w8_matmul): the u8 blocks
    # dequantize in VMEM inside the K loop, so HBM sees 1 byte/weight and no
    # float copy of the weight ever materializes. This is the TPU-native form
    # of the reference's dequantize-on-load (src/onnxstream.cpp:2885-2909).
    # NOTE: at batch-1 decode the in-loop VPU dequant costs more than the
    # halved HBM reads save (measured TinyLlama: 230 tok/s vs 290 bf16); the
    # fast int8 decode path is int8_symmetric_storage + use_w8a8_dyn_matmul.
    use_w8_matmul: bool = True
    # store force-quantized 2-D weights as SYMMETRIC per-channel int8
    # (zero point 0) instead of asymmetric uint8, enabling the MXU-native
    # s8 x s8 -> s32 matmul below
    int8_symmetric_storage: bool = False
    # run MatMuls whose weight is symmetric s8 through the dynamic-activation
    # int8 kernel (kernels/qmatmul.w8a8_dyn_matmul): activations quantize
    # per-row to s8 on the fly and the dot runs in the MXU's native int8
    # mode — no per-element weight conversion at all, so bandwidth-bound
    # decode pays exactly half the bf16 HBM traffic
    use_w8a8_dyn_matmul: bool = True
    # extra XLA TPU backend options for every segment compile (forwarded as
    # jit(compiler_options=...)); tools/flag_sweep.py A/Bs candidates — see
    # docs/tpu_notes.md for the measured sweep
    compiler_options: Optional[Dict[str, str]] = None
    hbm_budget_bytes: int = 0  # 0 = single segment (no weight streaming cap)
    donate_weights: bool = True  # donate streamed weight buffers to the computation
    strict_shapes: bool = True  # enforce model.txt declared shapes (check_output_shape)
    embed_const_limit: int = 1 << 21  # fold-results larger than this become run-time args
    device: Optional[object] = None  # jax.Device to run on (default: first)
    mesh: Optional[object] = None  # jax.sharding.Mesh for multi-chip execution
    sharding_rules: Optional[object] = None  # parallel.sharding rules when mesh is set
    # graph inputs whose axis 1 is a KV-head axis to shard over the mesh's
    # "tp" axis (the LLM bucketed KV cache, (1, kv_heads, P, head_dim)); set
    # by LlamaPipeline(mesh=...) so each device holds the K/V of its own
    # attention heads (parallel.sharding.kv_head_sharding)
    tp_kv_head_inputs: frozenset = frozenset()
    # pipeline-parallel segment placement: with hbm_budget_bytes > 0, segments
    # are pinned to these devices in contiguous blocks (weights resident per stage,
    # boundary activations hop over ICI) — fits models larger than one chip's
    # HBM without host streaming
    pp_devices: Optional[list] = None
    # share HBM-resident weights across Sessions/executors (the LLM prefill
    # and decode-bucket graphs reuse one upload); keyed by weight name
    shared_device_weight_cache: Optional[dict] = None
    shared_cache_min_bytes: int = 1 << 20  # only weights this big are shared
    # perf-harness mode: big float weights (and symmetric-s8 force-quantized
    # weights) are GENERATED ON DEVICE at fetch time instead of fetched from
    # the provider and uploaded — dense timing is value-independent, and on
    # the tunneled dev chip a multi-GB upload costs minutes (the reason three
    # rounds of bench never captured a TinyLlama number). Composes with
    # GraphBuilder(lazy_weights=True) so the host never materializes the
    # arrays either. NOT for accuracy runs.
    synthetic_device_weights: bool = False
    # smallest weight (in ELEMENTS) eligible for device synthesis; smaller
    # tensors stay real (they may steer control structure). Perf harnesses
    # drop this to synthesize everything float/quantized (tools/ab_unet.py
    # W8A8 mode)
    synthetic_min_elements: int = 1 << 18

    # quantization calibration data: op_name -> (min, max)
    range_data: Dict[str, tuple] = dataclasses.field(default_factory=dict)

    @property
    def np_compute_dtype(self):
        if self.compute_dtype == "float32":
            return np.dtype(np.float32)
        if self.compute_dtype == "float16":
            return np.dtype(np.float16)
        if self.compute_dtype == "bfloat16":
            import ml_dtypes

            return np.dtype(ml_dtypes.bfloat16)
        raise ValueError(f"unsupported compute_dtype {self.compute_dtype!r}")

    # --- reference model_set_option surface (src/exports.cpp:276-301) -------
    def set_option(self, name: str, value: bool) -> None:
        mapping = {
            "use_fp16_arithmetic": lambda v: setattr(self, "compute_dtype", "float16" if v else "float32"),
            "use_bf16_arithmetic": lambda v: setattr(self, "compute_dtype", "bfloat16" if v else "float32"),
            "use_uint8_qdq": lambda v: setattr(self, "use_uint8_qdq", v),
            "use_uint8_arithmetic": lambda v: setattr(self, "use_uint8_arithmetic", v),
            "fuse_ops_in_attention": lambda v: setattr(self, "fuse_ops_in_attention", v),
            "force_fp16_storage": lambda v: setattr(self, "force_fp16_storage", v),
            "support_dynamic_shapes": lambda v: setattr(self, "support_dynamic_shapes", v),
            "use_ops_cache": lambda v: setattr(self, "use_ops_cache", v),
            "use_scaled_dp_attn_op": lambda v: setattr(self, "use_scaled_dp_attn_op", v),
            "use_next_op_cache": lambda v: setattr(self, "use_next_op_cache", v),
            "ops_printf": lambda v: setattr(self, "ops_printf", v),
            "ops_times_printf": lambda v: setattr(self, "ops_times_printf", v),
            "use_nchw_convs": lambda v: setattr(self, "use_nchw_convs", v),
            "use_nhwc_layout": lambda v: setattr(self, "use_nhwc_layout", v),
            "use_flash_attention": lambda v: setattr(self, "use_flash_attention", v),
            "flash_packed_nopad": lambda v: setattr(self, "flash_packed_nopad", v),
            "fuse_attention_heads": lambda v: setattr(self, "fuse_attention_heads", v),
            "fuse_groupnorm": lambda v: setattr(self, "fuse_groupnorm", v),
            "fuse_gn_conv": lambda v: setattr(self, "fuse_gn_conv", v),
            "use_w8_matmul": lambda v: setattr(self, "use_w8_matmul", v),
            "use_pallas_smallconv": lambda v: setattr(self, "use_pallas_smallconv", v),
            "int8_symmetric_storage": lambda v: setattr(self, "int8_symmetric_storage", v),
            "use_w8a8_dyn_matmul": lambda v: setattr(self, "use_w8a8_dyn_matmul", v),
        }
        if name not in mapping:
            raise ValueError(f"unknown option {name!r}")
        mapping[name](bool(value))
