"""Attention fusion: graph-level pattern recognizers.

Rewrites the reference's two fused-attention patterns into the internal
``ostpu.sdpa`` op (see onnxstream_tpu/ops/attention.py):

  * AttentionFusedOps — MatMul [+ Mul(scale)] + Softmax(last axis) + MatMul
    (reference recognizer src/onnxstream.cpp:3576-3633), enabled by
    ``fuse_ops_in_attention``;
  * ScaledDotProductAttention — Transpose + MatMul + Div + Add + Softmax +
    MatMul and Transpose + Mul + Mul + MatMul + Add + Softmax + MatMul
    (src/onnxstream.cpp:3643-3755), enabled by ``use_scaled_dp_attn_op``.

One generic backward walk from each Softmax covers all three shapes: peel an
optional additive mask and scalar Div/Mul scalings, require a MatMul producing
the logits, absorb a last-two-axes Transpose on the K side, and require a
single consuming MatMul for the probabilities. All interior tensors must have
refcount 1 (they disappear), mirroring the reference's m_intermediate_refs
checks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from onnxstream_tpu.ir import Graph, OpNode, TensorSpec
from onnxstream_tpu.runtime.config import SessionConfig


class _Rewriter:
    def __init__(self, graph: Graph, config: SessionConfig, weight_loader=None):
        self.graph = graph
        self.config = config
        self.load = weight_loader
        self.producer: Dict[str, int] = {}
        self.consumers: Dict[str, List[int]] = {}
        for i, op in enumerate(graph.ops):
            for t in op.outputs:
                if t.name:
                    self.producer[t.name] = i
            for t in op.inputs:
                if t.name and not t.is_weight:
                    self.consumers.setdefault(t.name, []).append(i)

    def _only_consumer(self, name: str) -> Optional[int]:
        c = self.consumers.get(name, [])
        return c[0] if len(c) == 1 else None

    def _scalar(self, spec: TensorSpec) -> Optional[float]:
        if spec.is_weight and spec.nelem == 1 and self.load is not None:
            try:
                arr = self.load(spec.name, spec.dtype, spec.shape)
            except Exception:
                return None
            if spec.dtype.value == "uint8":
                arr = (arr.astype(np.float32) - spec.zero_point) * spec.scale
            return float(np.asarray(arr, dtype=np.float32).reshape(-1)[0])
        return None

    def try_fuse_at(self, si: int) -> Optional[Tuple[List[int], OpNode]]:
        ops = self.graph.ops
        softmax = ops[si]
        if softmax.op_type != "Softmax":
            return None
        axis = softmax.attr_int("axis", -1)
        rank = len(softmax.inputs[0].shape) or len(softmax.outputs[0].shape)
        if axis not in (-1, rank - 1):
            return None

        removed = [si]
        # forward: single consuming MatMul(probs, V)
        ci = self._only_consumer(softmax.outputs[0].name)
        if ci is None:
            return None
        consumer = ops[ci]
        if consumer.op_type != "MatMul" or consumer.inputs[0].name != softmax.outputs[0].name:
            return None
        v_spec = consumer.inputs[1]
        removed.append(ci)

        # backward: peel mask add and scalar scalings down to the QK MatMul
        scale = 1.0
        mask_spec: Optional[TensorSpec] = None
        cur = softmax.inputs[0]

        def prod(spec):
            i = self.producer.get(spec.name)
            return ops[i] if i is not None else None

        node = prod(cur)
        for _ in range(4):
            if node is None:
                return None
            if node.op_type == "Add" and mask_spec is None:
                a, b = node.inputs
                # the logits side is the one produced by a MatMul/Div/Mul chain
                side = None
                for cand, other in ((a, b), (b, a)):
                    p = prod(cand)
                    if p is not None and p.op_type in ("MatMul", "Div", "Mul"):
                        side, mask_spec = cand, other
                        break
                if side is None:
                    return None
                if self._only_consumer(side.name) is None:
                    return None
                removed.append(self.producer[node.outputs[0].name])
                cur = side
                node = prod(cur)
                continue
            if node.op_type == "Div":
                s = self._scalar(node.inputs[1])
                if s is None or s == 0.0:
                    return None
                scale /= s
                if self._only_consumer(node.inputs[0].name) is None:
                    return None
                removed.append(self.producer[node.outputs[0].name])
                cur = node.inputs[0]
                node = prod(cur)
                continue
            if node.op_type == "Mul":
                s = self._scalar(node.inputs[1])
                other = node.inputs[0]
                if s is None:
                    s = self._scalar(node.inputs[0])
                    other = node.inputs[1]
                if s is None:
                    return None
                scale *= s
                if self._only_consumer(other.name) is None:
                    return None
                removed.append(self.producer[node.outputs[0].name])
                cur = other
                node = prod(cur)
                continue
            break
        if node is None or node.op_type != "MatMul":
            return None
        qk = node
        qk_idx = self.producer[qk.outputs[0].name]
        if self._only_consumer(qk.outputs[0].name) is None:
            return None
        removed.append(qk_idx)

        q_spec, kt_spec = qk.inputs
        k_transposed = 1
        k_spec = kt_spec

        # peel per-side scalar Muls (SDPA pattern 2: Q*s1, K*s2) and the K transpose
        def peel_side(spec):
            nonlocal scale
            p = prod(spec)
            while p is not None and p.op_type == "Mul":
                s = self._scalar(p.inputs[1])
                other = p.inputs[0]
                if s is None:
                    s = self._scalar(p.inputs[0])
                    other = p.inputs[1]
                if s is None:
                    break
                # the Mul's output must feed only this attention chain
                if len(self.consumers.get(p.outputs[0].name, [])) != 1:
                    break
                scale *= s
                removed.append(self.producer[p.outputs[0].name])
                spec = other
                p = prod(spec)
            return spec, p

        q_spec, _ = peel_side(q_spec)
        kt_spec, k_prod = peel_side(kt_spec)
        k_spec = kt_spec
        if k_prod is not None and k_prod.op_type == "Transpose":
            perm = k_prod.attr_ints("perm")
            r = len(k_prod.inputs[0].shape)
            swap_last_two = perm is not None and r >= 2 and list(perm) == list(range(r - 2)) + [r - 1, r - 2]
            if swap_last_two and len(self.consumers.get(kt_spec.name, [])) == 1:
                removed.append(self.producer[kt_spec.name])
                k_spec = k_prod.inputs[0]
                k_transposed = 0

        if scale == 1.0:
            # AttentionFusedOps without explicit scale uses plain product;
            # encode scale=1 explicitly so sdpa doesn't apply 1/sqrt(d).
            scale_attr = "1.0"
        else:
            scale_attr = f"{scale:.17g}"

        inputs = [q_spec, k_spec, v_spec]
        if mask_spec is not None:
            inputs.append(mask_spec)
        fused = OpNode(
            name=consumer.name + "_sdpa",
            op_type="ostpu.sdpa",
            inputs=inputs,
            outputs=list(consumer.outputs),
            attrs={"scale": scale_attr, "k_transposed": str(k_transposed), "causal": "0"},
        )
        return sorted(set(removed)), fused


def fuse_attention(graph: Graph, config: SessionConfig, weight_loader=None) -> Graph:
    """Apply the SDPA recognizers. Returns a new Graph (or the original if no
    pattern matched)."""
    if not (config.fuse_ops_in_attention or config.use_scaled_dp_attn_op):
        return graph
    rewriter = _Rewriter(graph, config, weight_loader)
    plans = []
    claimed = set()
    for i, op in enumerate(graph.ops):
        if op.op_type != "Softmax":
            continue
        result = rewriter.try_fuse_at(i)
        if result is None:
            continue
        removed, fused = result
        if claimed & set(removed):
            continue
        claimed.update(removed)
        plans.append((removed, fused))
    if not plans:
        return graph

    replace_at = {removed[-1]: fused for removed, fused in plans}
    drop = set()
    for removed, _ in plans:
        drop.update(removed)
    new_ops: List[OpNode] = []
    for i, op in enumerate(graph.ops):
        if i in replace_at:
            new_ops.append(replace_at[i])
        elif i in drop:
            continue
        else:
            new_ops.append(op)
    return Graph(ops=new_ops)
