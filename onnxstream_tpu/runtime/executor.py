"""Segmented XLA executor.

Where the reference interprets one op at a time against XNNPACK
(src/onnxstream.cpp:3550-8269), this executor compiles the planned device ops
into XLA computations and streams weights to HBM:

  * the device ops are partitioned into **segments** — contiguous runs whose
    streamed weights fit `config.hbm_budget_bytes` (0 = one segment). This is
    the XLA-native form of OnnxStream's defining feature: inference RAM/HBM
    bounded by the budget, not the model size;
  * each segment is jitted once per input-shape bucket and cached (subsuming
    the reference's packed-operator ops cache, src/onnxstream.cpp:665-725);
  * weights for segment k+1 are fetched (through the WeightsProvider chain,
    converted once to the upload dtype) and `jax.device_put` begins the
    host->HBM DMA while segment k is still executing — the DiskPrefetch
    overlap (src/onnxstream.h:356-664) extended one hop further, to the chip;
  * streamed weight buffers are donated so XLA recycles their HBM.

`run_eager` is the reference-style per-op interpreter (no jit): it powers
ops_printf / ops_times debugging and quantization calibration, and serves as
the correctness oracle in tests.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

# Streamed segments donate the whole weights list (one argnum); XLA aliases
# the big buffers and rightly skips the small ones it can't — that partial
# donation is the intended policy, so the per-compile warning about the
# skipped buffers is pure noise (it dumps hundreds of shapes per segment).
warnings.filterwarnings("ignore", message="Some donated buffers were not usable")

from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import Graph, OpNode
from onnxstream_tpu.ops import Ctx, get_impl
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.planner import Plan, WeightArg
from onnxstream_tpu.runtime.quantization import (
    RangeData,
    quantize_weight_percentile,
    quantize_weight_percentile_per_channel,
    quantize_weight_symmetric_per_channel,
    range_to_scale,
)
from onnxstream_tpu.runtime.weights import WeightsProvider


def _is_float_dtype(dt) -> bool:
    return np.issubdtype(dt, np.floating) or str(dt) in ("bfloat16", "float16")


def upload_bytes(w: "WeightArg") -> int:
    n = 1
    for d in w.shape:
        n *= d
    return n * np.dtype(w.upload_dtype).itemsize


@dataclasses.dataclass
class Segment:
    op_indices: List[int]
    weight_args: List[WeightArg]
    in_names: List[str]
    out_names: List[str]
    weight_bytes: int


def build_segments(plan: Plan, fetch_names: Sequence[str]) -> List[Segment]:
    graph, config = plan.graph, plan.config
    budget = config.hbm_budget_bytes

    device_ops = [i for i, m in enumerate(plan.op_modes) if m == "device"]
    arg_by_name = {w.name: w for w in plan.arg_weights}

    def op_weight_names(i):
        return [t.name for t in graph.ops[i].inputs if t.is_weight and t.name in arg_by_name]

    # a weight used by several ops is fetched once per segment that needs it
    # (the common case — first use — matches the provider's stream order;
    # cross-segment reuse falls back to the provider's out-of-order path)
    segments: List[Segment] = []
    cur_ops: List[int] = []
    cur_w: List[WeightArg] = []
    cur_names: set = set()
    cur_bytes = 0

    def flush():
        nonlocal cur_ops, cur_w, cur_names, cur_bytes
        if cur_ops:
            segments.append(Segment(cur_ops, cur_w, [], [], cur_bytes))
        cur_ops, cur_w, cur_names, cur_bytes = [], [], set(), 0

    for i in device_ops:
        new_names = [n for n in op_weight_names(i) if n not in cur_names]
        wbytes = sum(upload_bytes(arg_by_name[n]) for n in new_names)
        if budget > 0 and cur_ops and cur_bytes + wbytes > budget:
            flush()
            new_names = op_weight_names(i)
            wbytes = sum(upload_bytes(arg_by_name[n]) for n in new_names)
        cur_ops.append(i)
        for n in new_names:
            if n not in cur_names:
                cur_names.add(n)
                cur_w.append(arg_by_name[n])
        cur_bytes += wbytes
    flush()

    # boundary activations: producer segment of each device tensor
    producer_seg: Dict[str, int] = {}
    for si, seg in enumerate(segments):
        for oi in seg.op_indices:
            for t in graph.ops[oi].outputs:
                if t.name:
                    producer_seg[t.name] = si
    fetched = set(fetch_names)
    needed_out: Dict[int, set] = {si: set() for si in range(len(segments))}
    needed_in: Dict[int, set] = {si: set() for si in range(len(segments))}
    for si, seg in enumerate(segments):
        for oi in seg.op_indices:
            for t in graph.ops[oi].inputs:
                if t.is_weight or not t.name:
                    continue
                if t.name in plan.static_env:
                    continue
                p = producer_seg.get(t.name)
                if p is None:  # graph input
                    needed_in[si].add(t.name)
                elif p != si:
                    needed_out[p].add(t.name)
                    needed_in[si].add(t.name)
    for name in fetched:
        p = producer_seg.get(name)
        if p is not None:
            needed_out[p].add(name)
    for si, seg in enumerate(segments):
        seg.in_names = sorted(needed_in[si])
        seg.out_names = sorted(needed_out[si])
    return segments


SYNTH_SCALE = 0.02  # N(0, SYNTH_SCALE) float weights; s8 scale derives from it


def _synth_generate(specs, out_shardings=None, seed: int = 0):
    """ONE jitted jax.random program generating every synthetic weight in
    `specs` = [(shape, np_dtype, kind)], kind in {'normal','s8','u8'}.
    Shared by synthesize_segment_weights (explicit harness path) and
    _synthesize_missing (config-driven path) so the two can never drift —
    with AUTO-layout Formats folded in as out_shardings, generation AND
    relayout are one program (a per-weight device_put relayout loop is ~400
    serialized control-channel RPCs over the tunneled chip)."""

    def _gen(key0):
        outs = []
        for i, (shp, dt, kind) in enumerate(specs):
            k = jax.random.fold_in(key0, i)
            if kind == "s8":
                outs.append(jax.random.randint(k, shp, -127, 128, jnp.int8))
            elif kind == "u8":
                outs.append(
                    jax.random.randint(k, shp, 0, 256, jnp.int32).astype(jnp.uint8)
                )
            else:
                outs.append(
                    (SYNTH_SCALE * jax.random.normal(k, shp, jnp.float32)).astype(dt)
                )
        return outs

    if not specs:
        return []
    jit_kw = {}
    if out_shardings is not None:
        jit_kw["out_shardings"] = out_shardings
    return jax.jit(_gen, **jit_kw)(jax.random.key(seed))


def _stamp_s8_quant(w: "WeightArg") -> None:
    """Quant params for a device-synthesized s8 weight: a flat per-channel
    scale — decode math only needs the dtypes and shapes to be real."""
    w.quant = (np.full((w.shape[-1],), SYNTH_SCALE / 127.0, np.float32), 0.0)
    w.symmetric = True


class Executor:
    def __init__(self, plan: Plan, provider: WeightsProvider):
        self.plan = plan
        self.graph = plan.graph
        self.config = plan.config
        self.provider = provider
        self.segments = build_segments(plan, plan.fetch_names)
        self._jitted: List[Any] = [None] * len(self.segments)
        self._seg_arg_avals: Dict[int, tuple] = {}  # si -> (weights, acts) avals
        self._weight_formats_cache: Dict[int, Any] = {}  # si -> [Format] | None
        self._device_weight_cache: Dict = (
            plan.config.shared_device_weight_cache
            if plan.config.shared_device_weight_cache is not None
            else {}
        )
        self._private_weight_cache: Dict = {}
        # name -> WeightArg, built once: _eval_op/_eval_qlinear and the W8
        # selectors run per op per trace (and per step in run_eager), where
        # a linear scan of ~1000 arg_weights each is O(ops x weights)
        self._arg_weight_by_name: Dict[str, Any] = {
            w.name: w for w in plan.arg_weights}
        self.range_data = RangeData()
        self.ops_times: Dict[str, float] = {}
        provider.on_init(plan.stream_entries())
        self._first_run_done = False
        # tensor name -> producing op name: a W8A8 op quantizes its input
        # activation with the PRODUCER's calibrated output range — the same
        # statistic the reference attaches at push time (percentile quant of
        # that very tensor, src/onnxstream.cpp:3022-3034), made static so the
        # scales are compile-time constants
        self._producer_op: Dict[str, str] = {}
        # intermediate refcounts (reference m_intermediate_refs, 3499-3511)
        refs: Dict[str, int] = {}
        for op in self.graph.ops:
            for t in op.outputs:
                if t.name:
                    self._producer_op[t.name] = op.name
            for t in op.inputs:
                if t.name and not t.is_weight:
                    refs[t.name] = refs.get(t.name, 0) + 1
        # reference QDQ skip rule (src/onnxstream.cpp:3009-3020): a pushed
        # tensor consumed by the IMMEDIATELY next op with refcount 1 skips
        # quantization
        self._qdq_skip: set = set()
        for i, op in enumerate(self.graph.ops[:-1]):
            if len(op.outputs) == 1 and op.outputs[0].name:
                name = op.outputs[0].name
                nxt = self.graph.ops[i + 1]
                if refs.get(name, 0) == 1 and any(
                    t.name == name for t in nxt.inputs if not t.is_weight
                ):
                    self._qdq_skip.add(name)
        # multi-chip: when a mesh is configured, weights get TP shardings and
        # activations DP/SP shardings; the jitted segments are unchanged — XLA
        # propagates the shardings and inserts ICI collectives
        self._weight_shardings: Dict[str, Any] = {}
        if self.config.mesh is not None:
            from onnxstream_tpu.parallel.sharding import shard_weights

            shardings = shard_weights(self.config.mesh, [w.shape for w in plan.arg_weights])
            self._weight_shardings = {w.name: s for w, s in zip(plan.arg_weights, shardings)}

    # ------------------------------------------------------------------ utils
    @property
    def _device(self):
        if self.config.device is not None:
            return self.config.device
        return jax.devices()[0]

    def _seg_device(self, si: int):
        """Pipeline-parallel placement: segment si's stage device.

        Segments are assigned to stages in CONTIGUOUS blocks (stage =
        si * n_stages // n_segments), so a linear graph's boundary
        activations hop devices exactly n_stages - 1 times — round-robin
        placement would hop on every segment boundary and interleave each
        stage's resident weights."""
        pp = self.config.pp_devices
        if pp:
            n_seg = max(len(self.segments), 1)
            stage = min(si * len(pp) // n_seg, len(pp) - 1)
            return pp[stage]
        return self._device

    def _resolve_static(self, name: str):
        if name in self.plan.static_env:
            return self.plan.static_env[name]
        if name in self.plan.static_weights:
            return self.plan.static_weights[name]
        raise KeyError(name)

    def _maybe_force_quant(self, w: WeightArg, arr: np.ndarray) -> np.ndarray:
        """force_uint8_storage_set: percentile-quantize a float weight at
        fetch time; the (scale, zp) land on the WeightArg so the device read
        dequantizes (reference storage demotion, src/onnxstream.cpp:3764-3808,
        SDXL-on-lowmem config src/sd.cpp:1658-1669)."""
        if (
            w.name in self.config.force_uint8_storage_set
            and w.file_dtype.is_float
            and arr.dtype not in (np.dtype(np.uint8), np.dtype(np.int8))
        ):
            a32 = np.asarray(arr, np.float32)
            if w.symmetric:
                # symmetric per-channel s8: the storage form of the dynamic
                # int8 decode matmul (zero point 0 by construction)
                qarr, scale = quantize_weight_symmetric_per_channel(a32)
                w.quant = (scale, 0.0)
                return qarr
            if self.config.uint8_per_channel and a32.ndim == 2:
                qarr, scale, zero = quantize_weight_percentile_per_channel(a32)
            else:
                qarr, scale, zero = quantize_weight_percentile(a32)
            w.quant = (scale, zero)
            return qarr
        return arr

    def _host_weight(self, w: WeightArg) -> np.ndarray:
        """Provider fetch in file layout, then the WeightArg's upload-time
        relayout (WEIGHT_TRANSFORMS — e.g. the (O,C,3,3)->(9,O,C) tap-major
        form the fused gn+silu+conv kernel consumes)."""
        arr = self.provider.get(w.name, w.file_dtype, w.file_shape or w.shape)
        if w.transform:
            from onnxstream_tpu.runtime.planner import WEIGHT_TRANSFORMS

            arr = WEIGHT_TRANSFORMS[w.transform](arr)
        return arr

    def synthesize_segment_weights(self, seg: Segment, si: int = 0,
                                   min_bytes: int = 1 << 20,
                                   seed: int = 0) -> List[jax.Array]:
        """Perf-harness variant of _fetch_segment_weights: big float weights
        are GENERATED ON DEVICE (one jitted jax.random program) instead of
        uploaded. On the tunneled dev chip the host link is a ~3-50 MB/s
        WAN, so a synthetic 1.7 GB model costs ~1-10 min of pure upload per
        process; dense bf16/f32 compute time is value-independent, so for
        timing-only runs (bench.py) device-side N(0, 0.02) weights measure
        the same program in seconds. Small and non-float weights (masks,
        index tables, embedding tables, quantized weights) still come from
        the provider — they can steer control structure and must be real.
        NOT for accuracy runs: outputs are numerically meaningless."""
        formats = self._weight_formats(si)
        # element-count gate: min_bytes is expressed in f32-source bytes (the
        # host cost being avoided), so a 1-byte/element u8/s8 weight gates at
        # the same element count as its float form (see _synth_kind)
        min_elements = max(1, min_bytes // 4)
        big: List[int] = []
        kinds: Dict[int, str] = {}
        for wi, w in enumerate(seg.weight_args):
            kind = self._synth_kind(w, min_elements=min_elements)
            if kind is not None:
                big.append(wi)
                kinds[wi] = kind
        big_set = set(big)
        specs = [(seg.weight_args[wi].shape,
                  np.dtype(seg.weight_args[wi].upload_dtype), kinds[wi])
                 for wi in big]
        outs = [formats[wi] if formats is not None
                else self._weight_shardings.get(seg.weight_args[wi].name)
                for wi in big]
        gen = _synth_generate(
            specs,
            # mesh sessions: synthesized weights must land TP-sharded, same
            # as the real-fetch path's device_put destinations; a None list
            # keeps the unconstrained fast path
            out_shardings=outs if (big and any(o is not None for o in outs)) else None,
            seed=seed,
        )
        gen_by_wi = dict(zip(big, gen))
        for wi in big:
            if kinds[wi] == "s8":
                _stamp_s8_quant(seg.weight_args[wi])
        # small/non-float weights: host-convert individually (quant flags,
        # provider writeback), then ship in ONE batched device_put
        small_wis, small_arrs, small_dsts = [], [], []
        for wi, w in enumerate(seg.weight_args):
            if wi in big_set:
                continue
            arr = self._maybe_force_quant(w, self._host_weight(w))
            target = np.dtype(w.upload_dtype)
            if arr.dtype != target and w.quant is None:
                arr = arr.astype(target)
                if w.transform is None:
                    self.provider.update(w.name, arr)
            fmt = formats[wi] if formats is not None else None
            dst = fmt if fmt is not None else self._weight_shardings.get(
                w.name, self._device)
            small_wis.append(wi)
            small_arrs.append(arr)
            small_dsts.append(dst)
        small_dev = jax.device_put(small_arrs, small_dsts) if small_arrs else []
        by_wi = dict(gen_by_wi)
        by_wi.update(zip(small_wis, small_dev))
        return [by_wi[wi] for wi in range(len(seg.weight_args))]

    def _synth_kind(self, w: WeightArg, min_elements: Optional[int] = None) -> Optional[str]:
        """What kind of device-side generation (if any) can stand in for this
        weight under synthetic_device_weights: 'normal' for big plain float
        weights, 's8' for big symmetric force-quantized 2-D weights (the int8
        decode storage form). Everything else — small tensors, index tables,
        masks, pre-quantized uint8, transformed uploads — must be real.

        The size gate is on ELEMENT count (default 256K ~ 1 MB of f32): the
        cost being avoided is host materialization + upload of the f32
        source, so an s8-stored weight (1 byte/element on device) gates the
        same as its float form."""
        nelem = int(np.prod(w.shape)) if w.shape else 1
        if min_elements is None:
            min_elements = self.config.synthetic_min_elements
        if nelem < min_elements or w.transform is not None:
            return None
        dt = np.dtype(w.upload_dtype)
        # NOT dt.kind == "f": ml_dtypes' bfloat16 reports kind 'V', which
        # silently disabled synthesis for every bf16 model on the real chip
        if w.quant is None and _is_float_dtype(dt) and w.file_dtype.is_float:
            return "normal"
        if (w.symmetric and dt == np.dtype(np.int8)
                and w.name in self.config.force_uint8_storage_set):
            return "s8"
        if (w.quant is not None and not w.symmetric
                and dt == np.dtype(np.uint8) and w.file_dtype == DType.uint8):
            # IR-quantized uint8 weight (text `uint8[scale,zp]` spec): the
            # (scale, zp) are already on the WeightArg from the parse
            return "u8"
        return None

    def _synthesize_missing(self, seg: Segment, formats, resident: bool,
                            shared_key) -> Dict[str, jax.Array]:
        """synthetic_device_weights pre-pass for _fetch_segment_weights:
        device-generate every cache-missing synthesizable weight of this
        segment in ONE jitted program (per-array host->device round trips are
        ~0.5 s of control-channel RPC each over the tunneled chip), insert
        resident results into the same caches the fetch path uses, and return
        {name: device_array}. The LLM bench path: the host never materializes
        the multi-GB arrays at all (GraphBuilder lazy_weights)."""
        plan_items = []
        for wi, w in enumerate(seg.weight_args):
            fmt = formats[wi] if formats is not None else None
            key = shared_key(w, fmt)
            hit = (self._device_weight_cache.get(key) if key is not None
                   else self._private_weight_cache.get(w.name))
            if hit is not None:
                continue
            kind = self._synth_kind(w)
            if kind is not None:
                plan_items.append((wi, w, fmt, key, kind))
        if not plan_items:
            return {}
        specs = [(tuple(w.shape), np.dtype(w.upload_dtype), kind)
                 for _, w, _, _, kind in plan_items]
        outs = [fmt if fmt is not None else self._weight_shardings.get(w.name)
                for _, w, fmt, _, _ in plan_items]
        gen = _synth_generate(
            specs,
            # mesh (TP) sessions must shard synthesized weights exactly as
            # the real-fetch miss path does (its device_put dst falls back to
            # _weight_shardings); otherwise multi-GB weights commit to the
            # default device and the segment jit sees incompatible devices
            out_shardings=outs if any(o is not None for o in outs) else None,
        )
        out_by_name: Dict[str, jax.Array] = {}
        for (wi, w, fmt, key, kind), dev in zip(plan_items, gen):
            if kind == "s8":
                _stamp_s8_quant(w)
            if resident:
                if key is not None:
                    self._device_weight_cache[key] = (dev, w.quant, w.symmetric)
                else:
                    self._private_weight_cache[w.name] = (dev, w.quant, w.symmetric)
            out_by_name[w.name] = dev
        return out_by_name

    def _fetch_segment_weights(self, seg: Segment, si: int = 0,
                               with_formats: bool = True) -> List[jax.Array]:
        """with_formats=False: upload in DEFAULT layouts. Callers that feed
        the weights into their OWN jitted programs (the pipelines' on-device
        scan loops) must use this — committed AUTO-layout arrays constrain
        that other program's parameter layouts and XLA re-lays them out
        inside the loop (measured 3.7x on the SDXL on-device scan)."""
        device = self._seg_device(si)
        # The cross-session shared cache only holds BIG weights, keyed by
        # (name, shape, dtype): builder-aux constants (masks, index tables)
        # can reuse a name across shape buckets with different contents —
        # the shape in the key prevents serving one bucket's constant to
        # another; model weights are identical everywhere. Small weights
        # stay in this executor's private cache.
        shared = self.config.shared_device_weight_cache is not None
        min_bytes = self.config.shared_cache_min_bytes
        formats = self._weight_formats(si) if with_formats else None

        def shared_key(w: WeightArg, fmt):
            if shared and upload_bytes(w) >= min_bytes:
                # the layout is part of the identity: two programs may want
                # the same weight in different physical layouts
                lk = str(getattr(fmt, "layout", None)) if fmt is not None else ""
                return (w.name, w.shape, str(np.dtype(w.upload_dtype)), lk)
            return None

        resident = self.config.hbm_budget_bytes == 0 or self.config.pp_devices
        synth: Dict[str, jax.Array] = {}
        if self.config.synthetic_device_weights and not self.config.pp_devices:
            synth = self._synthesize_missing(seg, formats, resident, shared_key)
        out: List[Optional[jax.Array]] = [None] * len(seg.weight_args)
        miss: List[tuple] = []
        for wi, w in enumerate(seg.weight_args):
            fmt = formats[wi] if formats is not None else None
            key = shared_key(w, fmt)
            hit = (self._device_weight_cache.get(key) if key is not None
                   else self._private_weight_cache.get(w.name))
            if hit is None and w.name in synth:
                out[wi] = synth[w.name]
                continue
            if hit is not None:
                dev, quant, symmetric = hit
                # a shared hit must carry its quantization params to THIS
                # executor's WeightArg (force_uint8 placeholder fill-in)
                if quant is not None:
                    w.quant = quant
                    w.symmetric = symmetric
                if self.config.pp_devices:
                    # a weight shared by segments on DIFFERENT pp stages
                    # (e.g. tied embeddings) was cached on the first stage's
                    # device: hop it device-to-device — the provider may have
                    # already released the host copy, and the jit would
                    # otherwise see an incompatible-devices input
                    dv = getattr(dev, "device", None)
                    if dv is not None and dv != device:
                        dev = jax.device_put(dev, device)
                out[wi] = dev
                continue
            miss.append((wi, w, fmt, key))
        # ONE batched device_put for every cache-missing weight: a per-weight
        # put is a serialized control-channel RPC each (~0.5 s over the
        # tunneled chip — segment 0 of the SD1.5 UNet has ~230 weights, so the
        # per-weight loop spent 10x the raw transfer time in stalls; measured
        # 3.2 vs 33 MB/s, BENCH r4 dry run). The batch also keeps streaming
        # in-flight bytes bounded by construction: one segment is the unit.
        arrs, dsts = [], []
        for wi, w, fmt, key in miss:
            arr = self._maybe_force_quant(w, self._host_weight(w))
            target = np.dtype(w.upload_dtype)
            if arr.dtype != target and w.quant is None:
                arr = arr.astype(target)
                if w.transform is None and not self.config.pp_devices:
                    # transformed arrays are upload views; the provider keeps
                    # the file layout (reference WeightsProvider::update)
                    self.provider.update(w.name, arr)
            if self.config.pp_devices:
                dst = device
            else:
                dst = fmt if fmt is not None else self._weight_shardings.get(
                    w.name, self._device)
            arrs.append(arr)
            dsts.append(dst)
        devs = jax.device_put(arrs, dsts) if arrs else []
        for (wi, w, fmt, key), dev in zip(miss, devs):
            out[wi] = dev
            if resident:
                # resident weights: no streaming budget, or pp stages own
                # their segment's weights permanently
                if key is not None:
                    self._device_weight_cache[key] = (dev, w.quant, w.symmetric)
                else:
                    self._private_weight_cache[w.name] = (dev, w.quant, w.symmetric)
                # release the host copy through the provider (reference
                # exclusion-set + WeightsProvider::remove once a packed
                # operator owns the weight, src/onnxstream.cpp:4561-4567,
                # 2693); weights_exclusion_set opts a name out
                if w.name not in self.config.weights_exclusion_set:
                    self.provider.remove(w.name)
        return out

    # --------------------------------------------------------------- op eval
    def _qlinear_mode(self, op: OpNode) -> Optional[str]:
        """W8A8 path selector: uint8 weight + calibrated range for this op
        (reference static-W8A8 MatMul src/onnxstream.cpp:5790-5795 and qu8
        Conv 4631-4689)."""
        if not (
            self.config.use_uint8_arithmetic
            and len(op.inputs) >= 2
            and op.inputs[1].is_weight
            and op.inputs[1].dtype == DType.uint8
            and op.name in self.config.range_data
        ):
            return None
        if op.op_type == "MatMul":
            return "matmul"
        if op.op_type == "Conv" and op.attr_int("group", 1) == 1:
            return "conv"
        return None

    def _activation_qparams(self, op: OpNode):
        """(scale, zero) to quantize op's input activation: the producer op's
        calibrated range when known (the statistic the reference computes at
        push time), else a range recorded under the tensor's own name (graph
        inputs, observed during calibration), else this op's own range."""
        tname = op.inputs[0].name
        name = self._producer_op.get(tname)
        if name is None or name not in self.config.range_data:
            name = tname if tname in self.config.range_data else op.name
        lo, hi = self.config.range_data[name]
        return range_to_scale(lo, hi)

    def _eval_qlinear(self, mode: str, op: OpNode, env, weights_env):
        """Quantize the input activation, run the W8A8 Pallas kernel (int math
        on the MXU, zero-point corrections and dequantization fused in the
        epilogue), return the float result. Output requantization to the op's
        calibrated range is left to the QDQ stage (_maybe_qdq) so the plain
        u8-arithmetic mode keeps full float interchange precision."""
        from onnxstream_tpu.kernels.qmatmul import qmatmul, quantize_activation
        from onnxstream_tpu.kernels.qconv import qconv

        cdt = self.config.np_compute_dtype
        a = env[op.inputs[0].name]
        w_raw = weights_env[op.inputs[1].name]
        w = self._arg_weight_by_name[op.inputs[1].name]
        w_scale, w_zero = w.quant
        a_scale, a_zero = self._activation_qparams(op)
        interpret = jax.default_backend() != "tpu"
        if mode == "matmul":
            a_q = quantize_activation(a.astype(jnp.float32), a_scale, a_zero)
            out = qmatmul(
                a_q, w_raw, a_scale, a_zero, w_scale, w_zero,
                out_dtype=cdt, interpret=interpret,
            )
            return [out.astype(cdt)]
        # conv: bias (if any) is a float weight, excluded from quantization by
        # the converter (onnx2txt Conv-bias exclusion); attrs mirror ops.standard._conv
        bias = None
        if len(op.inputs) > 2 and op.inputs[2].name:
            bname = op.inputs[2].name
            bias = (
                self.plan.static_weights[bname]
                if bname in self.plan.static_weights
                else weights_env[bname]
            )
        conv1d = a.ndim == 3
        if conv1d:
            a = a[..., None]
        n_spatial = 2
        strides = list(op.attr_ints("strides", [1] * n_spatial))
        dilations = list(op.attr_ints("dilations", [1] * n_spatial))
        pads = list(op.attr_ints("pads", [0] * (2 * n_spatial)))
        if conv1d:
            strides = strides + [1] if len(strides) < 2 else strides
            dilations = dilations + [1] if len(dilations) < 2 else dilations
            if len(pads) == 2:
                pads = [pads[0], 0, pads[1], 0]
        a_q = quantize_activation(a.astype(jnp.float32), a_scale, a_zero)
        out = qconv(
            a_q, w_raw, a_scale, a_zero, w_scale, w_zero, bias=bias,
            strides=strides, pads=pads, dilations=dilations,
            out_dtype=cdt, interpret=interpret,
        )
        if conv1d:
            out = out[..., 0]
        return [out.astype(cdt)]

    def _qdq_range(self, op: OpNode, out_name: str, x):
        """(scale, zero) for QDQ of a pushed tensor. Softmax gets XNNPACK's
        fixed qu8 softmax output quantization (scale 1/256, zp 0 — reference
        src/onnxstream.cpp:5862); a calibrated range is static and free; the
        fallback estimates the reference's 0.1% percentiles in-graph on a
        bounded subsample (the reference computes them on the full tensor at
        push time, src/onnxstream.cpp:3022-3034 -> 2223-2386)."""
        if op.op_type == "Softmax":
            return 1.0 / 256.0, 0.0
        if op.name in self.config.range_data:
            lo, hi = self.config.range_data[op.name]
            return range_to_scale(lo, hi)
        xf = x.astype(jnp.float32).reshape(-1)
        n = xf.size
        if n > (1 << 20):  # bounded sort: strided subsample
            stride = n // (1 << 20)
            xf = xf[:: stride]
            n = xf.size
        xs = jnp.sort(xf)
        k = int(n * 0.001)
        lo = jnp.minimum(xs[k], 0.0)  # range_to_scale forces 0 into the range
        hi = jnp.maximum(xs[n - 1 - k], 0.0)
        scale = (hi - lo) / 255.0
        scale = jnp.where(scale <= 0, 1.0, scale)
        zero = jnp.clip(jnp.round(-lo / scale), 0, 255)
        return scale, zero

    def _maybe_qdq(self, op: OpNode, outs: List[Any]) -> List[Any]:
        """use_uint8_qdq: quantize-dequantize each pushed float intermediate
        (reference push_tensor, src/onnxstream.cpp:3022-3034). Single-use
        tensors consumed by the immediately following op are skipped, as in
        the reference (3009-3020). Fetched outputs are never degraded
        (the reference converts outputs back to fp32 at end of run)."""
        if not self.config.use_uint8_qdq:
            return outs
        fetched = set(self.plan.fetch_names)
        res = []
        for spec, o in zip(op.outputs, outs):
            if (
                spec.name
                and spec.name not in self._qdq_skip
                and spec.name not in fetched
                and _is_float_dtype(o.dtype)
            ):
                scale, zero = self._qdq_range(op, spec.name, o)
                q = jnp.clip(
                    jnp.round(o.astype(jnp.float32) / scale) + zero, 0, 255
                ).astype(jnp.uint8)
                o = ((q.astype(jnp.float32) - zero) * scale).astype(o.dtype)
            res.append(o)
        res.extend(outs[len(res):])
        return res

    def _w8_weight(self, op: OpNode) -> Optional[WeightArg]:
        """Weight-only-quantized MatMul selector: uint8 2-D weight WITHOUT a
        calibrated range (the reference dequantizes such weights on load,
        src/onnxstream.cpp:2885-2909; here the dequant fuses into the MXU
        K-loop so the float copy never exists — kernels/qmatmul.w8_matmul)."""
        if not (
            self.config.use_w8_matmul
            and op.op_type == "MatMul"
            and len(op.inputs) == 2
            and op.inputs[1].is_weight
            and op.inputs[1].name
            and op.inputs[1].name not in self.plan.static_weights
        ):
            return None
        if self.config.requires_upcast is not None and self.config.requires_upcast(op.op_type, op.name):
            return None
        w = self._arg_weight_by_name.get(op.inputs[1].name)
        if w is None or w.quant is None or len(w.shape) != 2 or w.symmetric:
            return None
        return w

    def _dyn_s8_weight(self, op: OpNode) -> Optional[WeightArg]:
        """Dynamic-activation int8 MatMul selector: symmetric per-channel s8
        weight (int8_symmetric_storage) + use_w8a8_dyn_matmul. Activations
        quantize per-row to s8 on the fly and the dot runs in the MXU's
        native s8 x s8 -> s32 mode (kernels/qmatmul.w8a8_dyn_matmul) — the
        TPU-native form of the reference's weight-storage discipline
        (src/onnxstream.cpp:2885-2909) for bandwidth-bound decode."""
        if not (
            self.config.use_w8a8_dyn_matmul
            and op.op_type == "MatMul"
            and len(op.inputs) == 2
            and op.inputs[1].is_weight
            and op.inputs[1].name
            and op.inputs[1].name not in self.plan.static_weights
        ):
            return None
        if self.config.requires_upcast is not None and self.config.requires_upcast(op.op_type, op.name):
            return None
        w = self._arg_weight_by_name.get(op.inputs[1].name)
        if w is None or not w.symmetric or w.quant is None or len(w.shape) != 2:
            return None
        return w

    def _eval_op(self, op: OpNode, env: Dict[str, Any], weights_env: Dict[str, Any]):
        qmode = self._qlinear_mode(op)
        if qmode is not None:
            return self._eval_qlinear(qmode, op, env, weights_env)
        s8 = self._dyn_s8_weight(op)
        if s8 is not None:
            from onnxstream_tpu.kernels.qmatmul import w8a8_dyn_matmul_xla

            cdt = self.config.np_compute_dtype
            aname = op.inputs[0].name
            a = jnp.asarray(self.plan.static_env.get(aname, env.get(aname)))
            if _is_float_dtype(a.dtype) and a.dtype != cdt:
                a = a.astype(cdt)
            scale, _zero = s8.quant
            # the XLA-native form measures faster than the Pallas block grid
            # at every decode/prefill shape (see kernels/qmatmul.py docstring)
            out = w8a8_dyn_matmul_xla(a, weights_env[s8.name], scale, out_dtype=cdt)
            return [out]
        w8 = self._w8_weight(op)
        if w8 is not None:
            from onnxstream_tpu.kernels.qmatmul import w8_matmul

            cdt = self.config.np_compute_dtype
            aname = op.inputs[0].name
            a = jnp.asarray(self.plan.static_env.get(aname, env.get(aname)))
            if _is_float_dtype(a.dtype) and a.dtype != cdt:
                a = a.astype(cdt)
            scale, zp = w8.quant
            out = w8_matmul(
                a, weights_env[w8.name], scale, zp, out_dtype=cdt,
                interpret=jax.default_backend() != "tpu",
            )
            return [out]
        impl = get_impl(op.op_type)
        cdt = self.config.np_compute_dtype
        ins: List[Any] = []
        for t in op.inputs:
            if not t.name:
                ins.append(None)
            elif t.is_weight:
                if t.name in self.plan.static_weights:
                    ins.append(self.plan.static_weights[t.name])
                else:
                    v = weights_env[t.name]
                    w = self._arg_weight_by_name[t.name]
                    if w.quant is not None:
                        scale, zp = w.quant
                        v = ((v.astype(jnp.float32) - zp) * scale).astype(cdt)
                    elif w.file_dtype.is_float and v.dtype != cdt:
                        v = v.astype(cdt)
                    ins.append(v)
            elif t.name in self.plan.static_env:
                ins.append(self.plan.static_env[t.name])
            else:
                ins.append(env[t.name])

        upcast = self.config.requires_upcast is not None and self.config.requires_upcast(op.op_type, op.name)
        if upcast:
            ins = [
                v.astype(jnp.float32) if v is not None and not isinstance(v, np.ndarray) and _is_float_dtype(v.dtype) else v
                for v in ins
            ]
        ctx = Ctx(jnp, "device", self.config, op.name)
        outs = impl.fn(ctx, op, ins)
        if upcast:
            outs = [o.astype(cdt) if _is_float_dtype(o.dtype) else o for o in outs]
        return outs

    # ------------------------------------------------------------- compiled
    def _segment_fn(self, si: int) -> Callable:
        seg = self.segments[si]
        graph = self.graph

        def fn(weights: List[Any], acts: Dict[str, Any]):
            cdt = self.config.np_compute_dtype
            env = {}
            for k, v in acts.items():
                if _is_float_dtype(v.dtype) and v.dtype != cdt:
                    v = v.astype(cdt)
                env[k] = v
            weights_env = {w.name: v for w, v in zip(seg.weight_args, weights)}
            for oi in seg.op_indices:
                op = graph.ops[oi]
                outs = self._maybe_qdq(op, self._eval_op(op, env, weights_env))
                for spec, val in zip(op.outputs, outs):
                    if spec.name:
                        env[spec.name] = val
            return {n: env[n] for n in seg.out_names}

        return fn

    def _derive_seg_avals(self, si: int):
        """Reconstruct segment si's jit argument avals from the plan (same
        construction as run(): all graph inputs flow through segment 0, and
        each segment additionally takes its boundary in_names)."""
        seg = self.segments[si]
        w_avals = [
            jax.ShapeDtypeStruct(w.shape, np.dtype(w.upload_dtype)) for w in seg.weight_args
        ]
        acts: Dict[str, Any] = {}
        if si == 0:
            acts.update(self.plan.input_avals)
        for n in seg.in_names:
            a = self.plan.avals.get(n) or self.plan.input_avals.get(n)
            if a is None:
                return None
            acts[n] = a
        return (w_avals, acts)

    def memory_analysis(self, si: int = 0):
        """XLA's buffer-assignment peak for segment si. This is the
        compiler's exact accounting — it works where device memory_stats()
        does not (e.g. over the axon tunnel). May trigger one AOT compile of
        the same HLO; enable the JAX persistent compilation cache to make it
        free. Prefers the exact arg avals recorded by run(); derives them
        from the plan when the segment has not run through Executor.run
        (e.g. bench drives the compiled fn directly)."""
        avals = self._seg_arg_avals.get(si) or self._derive_seg_avals(si)
        if avals is None or self._jitted[si] is None:
            return None
        try:
            comp = self._jitted[si].lower(*avals).compile()
            ma = comp.memory_analysis()
            return {
                "peak_bytes": int(ma.peak_memory_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "output_bytes": int(ma.output_size_in_bytes),
                "weight_bytes": sum(upload_bytes(w) for w in self.segments[si].weight_args),
            }
        except Exception:
            return None

    def hbm_accounting(self):
        """Peak-HBM estimate for this executor's execution mode.

        Resident (budget 0): one segment holds all weights — its XLA peak is
        the whole story. Streamed: the live set is segment k's program peak
        plus segment k+1's weights arriving via the double buffer."""
        per_seg = [self.memory_analysis(si) for si in range(len(self.segments))]
        if any(m is None for m in per_seg):
            return None
        if len(per_seg) == 1:
            return {"peak_bytes": per_seg[0]["peak_bytes"], "mode": "resident",
                    "weight_bytes": per_seg[0]["weight_bytes"]}
        peak = 0
        for si, m in enumerate(per_seg):
            nxt = per_seg[si + 1]["weight_bytes"] if si + 1 < len(per_seg) else 0
            peak = max(peak, m["peak_bytes"] + nxt)
        return {"peak_bytes": peak, "mode": "streamed",
                "weight_bytes": sum(m["weight_bytes"] for m in per_seg),
                "segments": len(per_seg)}

    def _donate(self, si: int):
        # donation only pays off for large streamed buffers — and is only
        # SAFE when this call exclusively owns the weight buffers: freshly
        # uploaded, retained by no cache. PP mode keeps per-stage resident
        # weights, and a shared cache can serve buffers owned by a sibling
        # executor; donating either deletes a cached jax.Array and the next
        # run dies with "Array has been deleted".
        return (
            (0,)
            if (
                self.config.donate_weights
                and self.config.hbm_budget_bytes > 0
                and not self.config.pp_devices
                and self.config.shared_device_weight_cache is None
                and self.segments[si].weight_bytes > (1 << 24)
            )
            else ()
        )

    def _auto_layout_eligible(self) -> bool:
        """Compiler-chosen weight layouts: without them, XLA inserts an async
        relayout copy of nearly every weight parameter on EVERY step (measured
        665 copy-starts/step = ~1.2 GB of HBM copy traffic on the SD1.5 UNet).
        Compiling with AUTO weight layouts and uploading weights already in
        the chosen layout makes the relayout a one-time host-upload cost."""
        import os

        return (
            self.config.auto_weight_layouts
            and self.config.mesh is None
            and not self.config.pp_devices
            # streaming mode re-uploads weights EVERY step, so "relayout once
            # at upload" amortizes over nothing — a Format-destination
            # device_put just moves the relayout into the host->HBM transfer
            # path (measured 4x under the raw link rate, BENCH r4 streamed
            # child) and costs a discovery compile per segment. Default
            # layouts let the transfer run at link rate; any relayout XLA
            # still wants is a device-side HBM copy, cheap next to the link.
            and self.config.hbm_budget_bytes == 0
            and (
                jax.default_backend() == "tpu"
                # CPU layouts are trivial, but tests exercise the path with it
                or os.environ.get("OSTPU_FORCE_AUTO_LAYOUTS") == "1"
            )
        )

    def _compiled(self, si: int):
        if self._jitted[si] is None:
            kw = {}
            if self.config.compiler_options:
                kw["compiler_options"] = dict(self.config.compiler_options)
            self._jitted[si] = jax.jit(
                self._segment_fn(si), donate_argnums=self._donate(si), **kw
            )
        return self._jitted[si]

    def _weight_formats(self, si: int):
        """Per-weight upload Formats for segment si (None when ineligible or
        the avals cannot be derived). One AUTO-layout AOT compile from the
        plan's avals discovers the layouts the compiler wants its weight
        parameters in; weights are then uploaded already in that layout, and
        the (plain) jit call honors the committed layouts — so the per-step
        relayout copies disappear. The discovery compile is cached by the JAX
        persistent compilation cache."""
        if not self._auto_layout_eligible():
            return None
        if si in self._weight_formats_cache:
            return self._weight_formats_cache[si]
        avals = self._seg_arg_avals.get(si) or self._derive_seg_avals(si)
        fmts = None
        if avals is not None:
            try:
                from jax._src.layout import AutoLayout, Format

                auto = Format(AutoLayout())
                sd = jax.sharding.SingleDeviceSharding(self._seg_device(si))
                spec = ([auto] * len(self.segments[si].weight_args), sd)
                kw = {}
                if self.config.compiler_options:
                    kw["compiler_options"] = dict(self.config.compiler_options)
                comp = (
                    jax.jit(self._segment_fn(si), donate_argnums=self._donate(si),
                            in_shardings=spec, **kw)
                    .lower(*avals)
                    .compile()
                )
                fmts = list(comp.input_formats[0][0])
            except Exception:
                fmts = None
        self._weight_formats_cache[si] = fmts
        return fmts

    # ------------------------------------------------------------------ runs
    def _prepare_inputs(self, inputs: Dict[str, np.ndarray]) -> Dict[str, Any]:
        mesh = self.config.mesh
        if mesh is not None:
            from onnxstream_tpu.parallel.sharding import (
                activation_sharding, kv_head_sharding)

        prepared = {}
        for k, aval in self.plan.input_avals.items():
            if k not in inputs:
                raise KeyError(f"missing graph input {k!r}")
            v = inputs[k]
            if isinstance(v, jax.Array):
                prepared[k] = v.astype(aval.dtype) if v.dtype != aval.dtype else v
                continue
            v = np.asarray(v)
            if v.dtype != aval.dtype:
                v = v.astype(aval.dtype)
            if mesh is None:
                dst = self._device
            elif k in self.config.tp_kv_head_inputs:
                dst = kv_head_sharding(mesh, v.shape)
            else:
                dst = activation_sharding(mesh, v.shape)
            prepared[k] = jax.device_put(v, dst)
        return prepared

    def run(self, inputs: Dict[str, np.ndarray], device_outputs: bool = False) -> Dict[str, np.ndarray]:
        """Compiled segmented run. Returns float outputs as float32
        (reference converts outputs to fp32 at end of run,
        src/onnxstream.cpp:8217-8263). With device_outputs=True, results stay
        as device arrays in their compute dtypes (KV-cache feedback path)."""
        if self._first_run_done:
            self.provider.on_restart()
        acts: Dict[str, Any] = self._prepare_inputs(inputs)
        results: Dict[str, Any] = {}

        # double-buffer: fetch segment 0 weights, then while segment k runs,
        # fetch k+1 (device_put is async; the provider thread reads ahead).
        next_weights = self._fetch_segment_weights(self.segments[0], 0) if self.segments else []
        for si, seg in enumerate(self.segments):
            weights = next_weights
            seg_in = {n: (acts[n] if n in acts else results[n]) for n in seg.in_names}
            # all graph inputs flow through the first segment's env too
            if si == 0:
                seg_in = {**acts, **seg_in}
            if self.config.pp_devices:
                # hop boundary activations onto this segment's stage device
                dev = self._seg_device(si)
                seg_in = {k: jax.device_put(v, dev) for k, v in seg_in.items()}
            if si not in self._seg_arg_avals:
                aval = lambda v: jax.ShapeDtypeStruct(np.shape(v), v.dtype)
                self._seg_arg_avals[si] = (
                    [aval(w) for w in weights],
                    {k: aval(v) for k, v in seg_in.items()},
                )
            fut = self._compiled(si)(weights, seg_in)
            if si + 1 < len(self.segments):
                next_weights = self._fetch_segment_weights(self.segments[si + 1], si + 1)
            results.update(fut)

        self._first_run_done = True
        if device_outputs:
            out_d: Dict[str, Any] = {}
            for name in self.plan.fetch_names:
                out_d[name] = results.get(name, None)
                if out_d[name] is None:
                    out_d[name] = self._resolve_static(name)
            return out_d
        out: Dict[str, np.ndarray] = {}
        for name in self.plan.fetch_names:
            if name in results:
                v = np.asarray(results[name])
            else:
                v = np.asarray(self._resolve_static(name))
            if _is_float_dtype(v.dtype) and v.dtype != np.float32:
                v = v.astype(np.float32)
            elif np.issubdtype(v.dtype, np.signedinteger) and v.dtype != np.int64:
                v = v.astype(np.int64)  # wire integer dtype is int64
            out[name] = v
        return out

    def run_eager(
        self,
        inputs: Dict[str, np.ndarray],
        observer: Optional[Callable[[OpNode, List[Any]], None]] = None,
    ) -> Dict[str, np.ndarray]:
        """Per-op interpreter (no jit): debugging, calibration, test oracle.

        Implements ops_printf (reference src/onnxstream.cpp:3759-3762),
        ops_times_printf (8199-8214) and range calibration (2983-3004).
        """
        if self._first_run_done:
            self.provider.on_restart()
        cdt = self.config.np_compute_dtype
        env: Dict[str, Any] = {}
        for k, aval in self.plan.input_avals.items():
            v = np.asarray(inputs[k])
            if v.dtype != aval.dtype:
                v = v.astype(aval.dtype)
            if self.config.range_data_calibrate and _is_float_dtype(v.dtype):
                # graph-input ranges recorded under the tensor name: W8A8 ops
                # whose input has no producer quantize with this range
                self.range_data.observe(k, v.astype(np.float32))
            env[k] = jnp.asarray(v)

        weights_env: Dict[str, Any] = {}
        for w in self.plan.arg_weights:
            arr = self._maybe_force_quant(w, self._host_weight(w))
            weights_env[w.name] = jnp.asarray(
                arr if w.quant is not None else arr.astype(w.upload_dtype)
            )

        for oi, op in enumerate(self.graph.ops):
            if self.plan.op_modes[oi] != "device":
                continue
            if self.config.ops_printf:
                print(f"#{oi}) {op.op_type} ({op.name})")
            t0 = time.perf_counter() if self.config.ops_times_printf else 0.0
            outs = self._eval_op(op, env, weights_env)
            if self.config.range_data_calibrate:
                # calibration observes pre-QDQ values (reference push_tensor
                # records ranges before conversion, src/onnxstream.cpp:2983)
                for o in outs:
                    if _is_float_dtype(o.dtype):
                        self.range_data.observe(op.name, np.asarray(o, dtype=np.float32))
            outs = self._maybe_qdq(op, outs)
            if self.config.ops_times_printf:
                jax.block_until_ready(outs)
                self.ops_times[op.op_type] = self.ops_times.get(op.op_type, 0.0) + (
                    time.perf_counter() - t0
                ) * 1e3
            if observer is not None:
                observer(op, outs)
            for spec, val in zip(op.outputs, outs):
                if spec.name:
                    env[spec.name] = val

        self._first_run_done = True
        out = {}
        for name in self.plan.fetch_names:
            v = np.asarray(env[name]) if name in env else np.asarray(self._resolve_static(name))
            if _is_float_dtype(v.dtype) and v.dtype != np.float32:
                v = v.astype(np.float32)
            elif np.issubdtype(v.dtype, np.signedinteger) and v.dtype != np.int64:
                v = v.astype(np.int64)
            out[name] = v
        if self.config.ops_times_printf and self.ops_times:
            for t, ms in sorted(self.ops_times.items(), key=lambda kv: -kv[1]):
                print(f"{t}: {ms:.1f} ms")
        return out
