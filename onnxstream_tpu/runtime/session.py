"""Session — the user-facing model runtime.

API parity with the reference ``onnxstream::Model`` (src/onnxstream.h:913-1040)
and the C ABI surface (src/exports.cpp): read_file/read_string, add_tensor,
run, get_tensor, extra outputs, weights-name collection, option flags.

One Session owns one parsed Graph and compiles one Plan + Executor per
input-shape bucket: pushing tensors with new shapes (the reference's
support_dynamic_shapes mode, used by the LLM KV cache) triggers a fresh plan,
while repeated shapes hit the cached compiled executables — the XLA-native
replacement for dynamic shapes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax

from onnxstream_tpu.dtypes import DType
from onnxstream_tpu.ir import Graph, parse_model_txt
from onnxstream_tpu.ops import registered_ops
from onnxstream_tpu.runtime.config import SessionConfig
from onnxstream_tpu.runtime.executor import Executor
from onnxstream_tpu.runtime.fusion import fuse_attention
from onnxstream_tpu.runtime.planner import plan_graph
from onnxstream_tpu.runtime.weights import (
    CollectNamesWeightsProvider,
    WeightsProvider,
    make_provider,
)


class Session:
    def __init__(
        self,
        config: Optional[SessionConfig] = None,
        weights_provider: Optional[WeightsProvider] = None,
        weights_provider_name: str = "ram+prefetch",
    ):
        self.config = config or SessionConfig()
        self._provider = weights_provider
        self._provider_name = weights_provider_name
        self.graph: Optional[Graph] = None
        self._raw_graph: Optional[Graph] = None
        self._weights_dir = ""
        self.tensors: Dict[str, np.ndarray] = {}
        self._executors: Dict[Tuple, Executor] = {}
        self._last_outputs: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------ load
    def read_file(self, path: str) -> None:
        with open(path) as f:
            text = f.read()
        self._weights_dir = os.path.dirname(os.path.abspath(path)) + os.sep
        self._load(text)

    def read_string(self, text: str, weights_dir: str = "") -> None:
        if weights_dir:
            self._weights_dir = weights_dir.rstrip(os.sep) + os.sep
        self._load(text)

    def _load(self, text: str) -> None:
        self._raw_graph = parse_model_txt(text, allow_dynamic=self.config.support_dynamic_shapes)
        self._rebuild_graph()

    def _rebuild_graph(self) -> None:
        """Graph-level rewrites from the raw parse: attention fusion, then the
        channel-last layout pass (runtime/layout.py). Re-run whenever options
        or extra outputs change — both passes read the config."""
        from onnxstream_tpu.runtime.layout import rewrite_nhwc

        from onnxstream_tpu.runtime.fusion import fuse_gn_conv, fuse_groupnorm

        self.graph = fuse_attention(self._raw_graph, self.config, self._loader)
        # conv-absorbing gn fusion first: chains it claims must not be
        # collapsed into standalone gn_silu ops (which lose on v5e)
        self.graph = fuse_gn_conv(self.graph, self.config, self._loader)
        self.graph = fuse_groupnorm(self.graph, self.config, self._loader)
        self.graph = rewrite_nhwc(self.graph, self.config,
                                  keep_names=self.config.extra_outputs)
        self._executors.clear()

    @property
    def provider(self) -> WeightsProvider:
        if self._provider is None:
            self._provider = make_provider(self._provider_name, self._weights_dir)
        return self._provider

    def _loader(self, name: str, dtype: DType, shape):
        """Direct weight load used by the planner for static pins (int64 shape
        math, Resize scales...). Goes through the provider so Ram caches and
        WASM-style preloaded weights are honored."""
        return self.provider.get(name, dtype, shape)

    # --------------------------------------------------------------- tensors
    def add_tensor(self, name: str, data) -> None:
        try:
            import jax

            if isinstance(data, jax.Array):
                self.tensors[name] = data  # device-resident (KV-cache feedback)
                return
        except Exception:
            pass
        self.tensors[name] = np.asarray(data)

    def clear_tensors(self) -> None:
        self.tensors.clear()

    def set_option(self, name: str, value: bool) -> None:
        """String-keyed option setter (the bindings' model_set_option surface).
        Fusion-gating options apply at graph-rewrite time, so the graph is
        re-fused from the raw parse and compiled executors are dropped."""
        self.config.set_option(name, value)
        if self._raw_graph is not None:
            self._rebuild_graph()
        self._executors.clear()

    def add_extra_output(self, name: str) -> None:
        if name not in self.config.extra_outputs:
            self.config.extra_outputs.append(name)
        if self._raw_graph is not None:
            self._rebuild_graph()
        self._executors.clear()

    def get_tensor(self, name: str) -> np.ndarray:
        if name in self._last_outputs:
            return self._last_outputs[name]
        if name in self.tensors:
            return self.tensors[name]
        raise KeyError(f"tensor {name!r} not found (run() first?)")

    def get_all_tensor_names(self) -> List[str]:
        return list(self._last_outputs) + [k for k in self.tensors if k not in self._last_outputs]

    def get_weights_names(self) -> str:
        """Manifest `type:name|...` (reference model_get_weights_names,
        src/exports.cpp:111-148). Pure graph metadata — no loads."""
        assert self.graph is not None, "read a model first"
        c = CollectNamesWeightsProvider()
        c.on_init([(t.name, t.dtype, t.shape) for t in self.graph.weights.values()])
        return c.manifest()

    # ------------------------------------------------------------------- run
    def _bucket_key(self) -> Tuple:
        assert self.graph is not None
        items = []
        for name in sorted(self.graph.inputs):
            if name not in self.tensors:
                raise KeyError(f"graph input {name!r} has not been pushed (add_tensor)")
            v = self.tensors[name]
            items.append((name, tuple(v.shape), str(v.dtype)))
        return tuple(items)

    def _executor(self) -> Executor:
        skey = self._bucket_key()
        # an executor matches if its shape bucket AND the values of any inputs
        # its plan pinned statically (Slice/Split argument tensors pushed by
        # the client, reference YOLOv8n_wasm/index.html:559-564) both match
        for (k, _pins), ex in self._executors.items():
            if k != skey:
                continue
            if all(
                n in self.tensors and np.array_equal(np.asarray(self.tensors[n]), v)
                for n, v in ex.plan.pinned_inputs.items()
            ):
                return ex
        input_avals = {}
        for name, shape, dtype in skey:
            input_avals[name] = jax.ShapeDtypeStruct(shape, np.dtype(dtype))
        values = {
            name: np.asarray(v)
            for name, v in self.tensors.items()
            if isinstance(v, np.ndarray)
        }
        plan = plan_graph(self.graph, self.config, input_avals, self._loader,
                          input_values=values)
        ex = Executor(plan, self.provider)
        pins = tuple(sorted((n, v.tobytes()) for n, v in plan.pinned_inputs.items()))
        self._executors[(skey, pins)] = ex
        return ex

    def run(self, eager: bool = False, device_outputs: bool = False) -> Dict[str, np.ndarray]:
        ex = self._executor()
        inputs = {name: self.tensors[name] for name in self.graph.inputs}
        if eager or self.config.ops_printf or self.config.ops_times_printf or self.config.range_data_calibrate:
            outs = ex.run_eager(inputs)
        else:
            outs = ex.run(inputs, device_outputs=device_outputs)
        self._last_outputs = outs
        return outs

    # ------------------------------------------------------------- telemetry
    def hbm_stats(self) -> Dict[str, int]:
        """Peak/current HBM use — the TPU analog of the reference's peak-RSS
        report (src/sd.cpp:3309-3326).

        Prefers the device allocator's live stats; where those are
        unavailable (e.g. the tunneled axon backend returns None), falls
        back to XLA's buffer-assignment accounting per compiled segment
        (Executor.hbm_accounting) — the compiler's exact peak for the
        program, plus the double-buffered next-segment weights in streaming
        mode."""
        dev = self.config.device or jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            return {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
        out: Dict[str, int] = {}
        for ex in self._executors.values():
            acc = ex.hbm_accounting()
            if acc is None:
                continue
            out["peak_bytes_in_use"] = max(out.get("peak_bytes_in_use", 0), acc["peak_bytes"])
            out["weight_bytes"] = max(out.get("weight_bytes", 0), acc["weight_bytes"])
            out["accounting"] = "xla_buffer_assignment"
        return out

    def close(self) -> None:
        if self._provider is not None:
            self._provider.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def supported_ops() -> List[str]:
    return registered_ops()
