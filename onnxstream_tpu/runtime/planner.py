"""Graph planner: host/device partial evaluation.

The reference is an eager interpreter, so int64 shape math, Python-side
constants and float compute all execute the same way (src/onnxstream.cpp
run loop, 3550-8269). XLA instead wants one statically-shaped computation.
The planner walks the parsed Graph once per input-shape bucket and decides,
per op:

  * ``host``  — every input is statically known and the op is foldable: run it
    now with numpy; the result lives in ``static_env`` (shape/index math,
    int64 weights, mask construction, ...);
  * ``device`` — staged into the XLA program; output shapes/dtypes come from
    ``jax.eval_shape`` over the jnp implementation, and are verified against
    the shapes recorded in model.txt (the reference's check_output_shape,
    src/onnxstream.cpp:3070-3089, executed at plan time instead of run time).

Ops that demand a static operand (Reshape shapes, Resize scales, Slice
bounds, ...) raise StaticRequired; the planner reacts by loading that weight
eagerly and pinning it host-side, so it never becomes a device argument.

Weights that stay dynamic become ordered streaming arguments: the plan records
(name, upload dtype, quantization) per argument, in first-use order — the same
order the reference announces to WeightsProvider::on_init
(src/onnxstream.cpp:3499-3548).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import Graph, OpNode, TensorSpec
from onnxstream_tpu.ops import Ctx, StaticRequired, get_impl
from onnxstream_tpu.runtime.config import SessionConfig


class PlanError(Exception):
    pass


@dataclasses.dataclass
class WeightArg:
    name: str
    file_dtype: DType
    upload_dtype: Any  # np dtype for the device argument
    shape: Tuple[int, ...]
    quant: Optional[Tuple[float, int]] = None  # (scale, zero_point) if uint8
    # symmetric per-channel s8 storage (zero point 0, scale (N,) vector):
    # the operand form of the dynamic int8 decode matmul
    symmetric: bool = False
    # host-side relayout at upload (fusion recognizers set these through the
    # TensorSpec): `shape` above is the transformed device-argument shape,
    # `file_shape` what the provider stores, `transform` the name of the
    # WEIGHT_TRANSFORMS entry applied in between.
    transform: Optional[str] = None
    file_shape: Optional[Tuple[int, ...]] = None


def _t9oc(a: np.ndarray) -> np.ndarray:
    """(O, C, kh, kw) ONNX conv weight -> (kh*kw, O, C) tap-major form for the
    fused gn+silu+conv Pallas kernel (kernels/gn_conv.py): slicing a VMEM
    block of (O, C, 3, 3) tap-wise would tile the trailing (3, 3) dims at
    Mosaic's (8, 128) granularity — a ~100x padding blowup — so the relayout
    happens once on the host at upload."""
    o, c, kh, kw = a.shape
    return np.ascontiguousarray(a.transpose(2, 3, 0, 1).reshape(kh * kw, o, c))


# name -> host relayout fn; applied by the executor between provider.get and
# device_put (and mirrored by run_eager). Transformed weights skip provider
# writeback — the provider keeps the file layout.
WEIGHT_TRANSFORMS = {"t9oc": _t9oc}


@dataclasses.dataclass
class Plan:
    graph: Graph
    config: SessionConfig
    input_avals: Dict[str, jax.ShapeDtypeStruct]
    static_env: Dict[str, np.ndarray]
    static_weights: Dict[str, np.ndarray]
    arg_weights: List[WeightArg]
    op_modes: List[str]  # 'host' | 'device'
    avals: Dict[str, jax.ShapeDtypeStruct]  # device tensor avals (by name)
    fetch_names: List[str]
    # graph inputs pinned as host constants because an op demanded them
    # statically (the browser-protocol Slice/Split argument tensors,
    # reference examples/YOLOv8n_wasm/index.html:559-564); the session
    # re-plans when their VALUES change
    pinned_inputs: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def stream_entries(self):
        """(name, dtype, shape) in stream order, for WeightsProvider.on_init."""
        return [(w.name, w.file_dtype, w.shape) for w in self.arg_weights]


def _upload_dtype(spec: TensorSpec, config: SessionConfig):
    """Pick the dtype a weight is uploaded to HBM in.

    Float weights travel in the compute dtype (converted once on the host —
    half the PCIe/HBM traffic at bf16, mirroring the reference's convert-on-
    load under use_fp16_arithmetic, src/onnxstream.cpp:2885-2909). uint8 stays
    uint8 and is dequantized on device. force_fp16_storage demotes storage
    even under float32 compute (reference onnxstream.cpp:3764-3808).
    """
    if spec.dtype == DType.uint8:
        return np.dtype(np.uint8)
    if spec.name in config.force_uint8_storage_set and spec.dtype.is_float:
        if config.int8_symmetric_storage and len(spec.shape) == 2:
            # symmetric per-channel s8 residency: the storage form for the
            # MXU-native s8 x s8 dynamic-activation matmul
            # (kernels/qmatmul.w8a8_dyn_matmul)
            return np.dtype(np.int8)
        # forced uint8 residency (reference force_uint8_storage demotion,
        # src/onnxstream.cpp:3764-3808): quantized at first fetch, dequantized
        # on device read
        return np.dtype(np.uint8)
    if spec.dtype == DType.int64:
        return np.dtype(np.int64)
    if spec.dtype.is_float:
        if config.force_fp16_storage and config.compute_dtype == "float32":
            return np.dtype(np.float16)
        return config.np_compute_dtype
    return spec.dtype.np


class _Planner:
    def __init__(self, graph: Graph, config: SessionConfig, input_avals, weight_loader,
                 input_values=None):
        self.graph = graph
        self.config = config
        # float graph inputs are converted to the compute dtype at entry, and
        # int64 inputs to int32 (device integers are 32-bit; the executor
        # applies the same casts at run time)
        cdt = config.np_compute_dtype

        def _in_dtype(dt):
            if np.issubdtype(dt, np.floating) or str(dt) in ("bfloat16", "float16"):
                return cdt
            if dt == np.int64:
                return np.dtype(np.int32)
            return dt

        self.input_avals = {
            k: jax.ShapeDtypeStruct(v.shape, _in_dtype(v.dtype)) for k, v in input_avals.items()
        }
        self.load_weight = weight_loader  # (name, DType, shape) -> np.ndarray
        self.static_env: Dict[str, np.ndarray] = {}
        self.static_weights: Dict[str, np.ndarray] = {}
        self.arg_weights: List[WeightArg] = []
        self._arg_set: Dict[str, WeightArg] = {}
        self.avals: Dict[str, jax.ShapeDtypeStruct] = {}
        self.op_modes: List[str] = []
        self.input_values = input_values or {}
        self.pinned_inputs: Dict[str, np.ndarray] = {}

    # -- value resolution ----------------------------------------------------
    def _resolve(self, spec: TensorSpec):
        """Return ('none',None) | ('static',np) | ('sym',aval) | ('weight',spec)."""
        if not spec.name:
            return ("none", None)
        if spec.is_weight:
            if spec.name in self.static_weights:
                return ("static", self.static_weights[spec.name])
            if spec.name in self._arg_set:
                w = self._arg_set[spec.name]
                dt = self.config.np_compute_dtype if (w.quant or w.file_dtype.is_float) else w.upload_dtype
                return ("sym", jax.ShapeDtypeStruct(w.shape, dt))
            # undecided weight: int64 weights are shape math -> always static
            if spec.dtype == DType.int64:
                self._pin_static_weight(spec)
                return ("static", self.static_weights[spec.name])
            return ("weight", spec)
        if spec.name in self.static_env:
            return ("static", self.static_env[spec.name])
        if spec.name in self.avals:
            return ("sym", self.avals[spec.name])
        if spec.name in self.input_avals:
            return ("sym", self.input_avals[spec.name])
        raise PlanError(f"tensor {spec.name!r} consumed before being produced")

    def _pin_static_weight(self, spec: TensorSpec) -> None:
        arr = self.load_weight(spec.name, spec.dtype, spec.shape)
        if spec.dtype == DType.uint8:
            arr = ((arr.astype(np.float32) - spec.zero_point) * spec.scale).astype(np.float32)
        self.static_weights[spec.name] = arr

    def _promote_weight_to_arg(self, spec: TensorSpec) -> WeightArg:
        w = self._arg_set.get(spec.name)
        if w is None:
            quant = (spec.scale, spec.zero_point) if spec.dtype == DType.uint8 else None
            symmetric = False
            if quant is None and spec.name in self.config.force_uint8_storage_set and spec.dtype.is_float:
                quant = (0.0, 0)  # placeholder; real scale/zp set at first fetch
                symmetric = self.config.int8_symmetric_storage and len(spec.shape) == 2
            w = WeightArg(
                name=spec.name,
                file_dtype=spec.dtype,
                upload_dtype=_upload_dtype(spec, self.config),
                shape=spec.shape,
                quant=quant,
                symmetric=symmetric,
                transform=spec.transform,
                file_shape=spec.file_shape,
            )
            self._arg_set[spec.name] = w
            self.arg_weights.append(w)
        return w

    # -- per-op planning -------------------------------------------------------
    def plan_op(self, op: OpNode) -> None:
        impl = get_impl(op.op_type)
        resolved = [self._resolve(t) for t in op.inputs]

        # Shape folds from metadata even over device tensors.
        if op.op_type == "Shape":
            kind, val = resolved[0]
            if kind == "static":
                shape = np.shape(val)
            elif kind == "sym":
                shape = val.shape
            elif kind == "weight":
                shape = op.inputs[0].shape
            else:
                raise PlanError(f"{op.name}: Shape of missing input")
            from onnxstream_tpu.ops.standard import _shape_slice

            # same opset-15 start/end window as the op impl
            out = np.asarray(_shape_slice(tuple(shape), op), dtype=np.int64)
            self._finish_host(op, [out])
            return

        # Host folding: all inputs static (undecided weights block folding
        # unless the op itself later demands them static).
        if impl.host and all(k in ("static", "none") for k, _ in resolved):
            ins = [v for _, v in resolved]
            ctx = Ctx(np, "host", self.config, op.name)
            try:
                outs = impl.fn(ctx, op, ins)
            except StaticRequired as e:
                raise PlanError(f"{op.name}: host fold failed: {e}") from e
            self._finish_host(op, [np.asarray(o) for o in outs])
            return

        # Device op. Undecided weights default to args; StaticRequired demotes
        # them to host constants and retries.
        for _attempt in range(len(op.inputs) + 1):
            ins: List[Any] = []
            sym_slots: List[int] = []
            sym_avals: List[jax.ShapeDtypeStruct] = []
            kinds = [self._resolve(t) for t in op.inputs]
            for i, (kind, val) in enumerate(kinds):
                if kind == "none":
                    ins.append(None)
                elif kind == "static":
                    ins.append(val)
                elif kind == "sym":
                    ins.append(None)  # placeholder, filled by eval_shape args
                    sym_slots.append(i)
                    sym_avals.append(val)
                elif kind == "weight":
                    spec = op.inputs[i]
                    aval = jax.ShapeDtypeStruct(
                        spec.shape,
                        self.config.np_compute_dtype if spec.dtype.is_float or spec.dtype == DType.uint8
                        else spec.dtype.np,
                    )
                    ins.append(None)
                    sym_slots.append(i)
                    sym_avals.append(aval)

            def run(*sym_vals):
                local = list(ins)
                for slot, v in zip(sym_slots, sym_vals):
                    local[slot] = v
                ctx = Ctx(jnp, "device", self.config, op.name)
                return impl.fn(ctx, op, local)

            try:
                out_avals = jax.eval_shape(run, *sym_avals)
                break
            except StaticRequired as e:
                spec = op.inputs[e.index]
                if spec.is_weight and spec.name not in self.static_weights:
                    self._pin_static_weight(spec)
                    continue
                if (spec.name in self.input_avals and spec.name in self.input_values
                        and spec.name not in self.static_env):
                    # a pushed tensor used as a static op argument: pin its
                    # current value; the session keys the compiled executor
                    # on it and re-plans if the client pushes a new value
                    val = np.asarray(self.input_values[spec.name])
                    self.static_env[spec.name] = val
                    self.pinned_inputs[spec.name] = val
                    continue
                raise PlanError(
                    f"{op.name} ({op.op_type}): input {e.index} ({spec.name!r}) must be "
                    f"statically known but is a runtime tensor — this graph needs "
                    f"dynamic-shape bucketing"
                ) from e
        else:
            raise PlanError(f"{op.name}: could not satisfy static input requirements")

        # commit: promote undecided weights used dynamically to args
        for i, (kind, _) in enumerate(kinds):
            if kind == "weight":
                self._promote_weight_to_arg(op.inputs[i])

        self.op_modes.append("device")
        outs = list(out_avals) if isinstance(out_avals, (list, tuple)) else [out_avals]
        self._check_and_store(op, outs, device=True)

    def _finish_host(self, op: OpNode, outs: List[np.ndarray]) -> None:
        self.op_modes.append("host")
        self._check_and_store(op, outs, device=False)

    def _check_and_store(self, op: OpNode, outs, device: bool) -> None:
        if len(outs) != len(op.outputs):
            raise PlanError(f"{op.name}: impl produced {len(outs)} outputs, expected {len(op.outputs)}")
        for spec, out in zip(op.outputs, outs):
            got = tuple(int(d) for d in out.shape)
            want = spec.shape
            if self.config.strict_shapes and want and not spec.has_dynamic_dims and got != want:
                raise PlanError(
                    f"{op.name} ({op.op_type}): output {spec.name!r} shape {got} != "
                    f"declared {want} (check_output_shape)"
                )
            if device:
                self.avals[spec.name] = jax.ShapeDtypeStruct(got, out.dtype)
            else:
                self.static_env[spec.name] = out

    def plan(self, fetch_names: Sequence[str]) -> Plan:
        for op in self.graph.ops:
            try:
                self.plan_op(op)
            except PlanError:
                raise
            except Exception as e:
                raise PlanError(f"{op.name} ({op.op_type}): {type(e).__name__}: {e}") from e
        return Plan(
            graph=self.graph,
            config=self.config,
            input_avals=self.input_avals,
            static_env=self.static_env,
            static_weights=self.static_weights,
            arg_weights=self.arg_weights,
            op_modes=self.op_modes,
            avals=self.avals,
            fetch_names=list(fetch_names),
            pinned_inputs=self.pinned_inputs,
        )


def plan_graph(
    graph: Graph,
    config: SessionConfig,
    input_avals: Dict[str, jax.ShapeDtypeStruct],
    weight_loader,
    fetch_names: Optional[Sequence[str]] = None,
    input_values: Optional[Dict[str, np.ndarray]] = None,
) -> Plan:
    if fetch_names is None:
        fetch_names = graph.output_names() + [n for n in config.extra_outputs if n not in graph.output_names()]
    else:
        fetch_names = list(fetch_names)
    return _Planner(graph, config, input_avals, weight_loader, input_values).plan(fetch_names)
