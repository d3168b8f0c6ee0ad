"""Sharding rules and sharded execution over a jax.sharding.Mesh.

Strategy (scaling-book recipe: pick a mesh, annotate shardings, let XLA insert
the collectives):

  * **dp** axis: batch dimension of activations (data parallel);
  * **tp** axis: weight matrices shard on their output/feature dimension —
    2-D (din, dout) weights as P(None, "tp"), conv OIHW kernels as P("tp") on
    the output-channel axis when divisible — XLA inserts all-gather/
    reduce-scatter over ICI as needed.

Because the executor's segment functions are pure (weights list + activations
dict -> outputs dict), sharded inference and training reuse the exact same
traced computation; only in_shardings change.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _check_devices(n: int) -> list:
    """Return the first n devices or raise a clear, actionable error."""
    devs = jax.devices()
    if n > len(devs):
        raise ValueError(
            f"make_mesh: requested {n} devices, but the {jax.default_backend()!r} "
            f"backend exposes only {len(devs)}. For a virtual multi-device CPU "
            f"mesh set XLA_FLAGS=--xla_force_host_platform_device_count={n} and "
            f"JAX_PLATFORMS=cpu before JAX initializes its backend."
        )
    return devs[:n]


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None,
              sp: int = 1) -> Mesh:
    """dp x tp mesh, optionally with a sequence-parallel axis (dp, tp, sp).
    sp shards the sequence/spatial dim of activations; weights replicate over
    it, so XLA all-gathers K/V over ICI where attention needs the full
    sequence (the scaling-book sequence-parallel recipe)."""
    n = n_devices or len(jax.devices())
    if sp > 1:
        rest, rem = divmod(n, sp)
        if rem:
            raise ValueError(f"make_mesh: sp={sp} does not divide n_devices={n}")
        if tp is None and dp is not None:
            tp, rem = divmod(rest, dp)
            if rem:
                raise ValueError(
                    f"make_mesh: dp={dp} does not divide n_devices/sp={rest}")
        elif tp is None:
            tp = 1
            for cand in (8, 4, 2, 1):
                if rest % cand == 0:
                    tp = cand
                    break
        dp = dp if dp is not None else rest // tp
        if dp * tp * sp != n:
            raise ValueError(
                f"make_mesh: dp*tp*sp = {dp}*{tp}*{sp} != n_devices = {n}")
        devs = _check_devices(n)
        arr = np.array(devs).reshape(dp, tp, sp)
        return Mesh(arr, ("dp", "tp", "sp"))
    if dp is None and tp is None:
        # favor tensor parallelism within a host (ICI), data parallel on top
        tp = 1
        for cand in (8, 4, 2, 1):
            if n % cand == 0:
                tp = cand
                break
        dp = n // tp
    elif dp is None:
        dp, rem = divmod(n, tp)
        if rem:
            raise ValueError(f"make_mesh: tp={tp} does not divide n_devices={n}")
    elif tp is None:
        tp, rem = divmod(n, dp)
        if rem:
            raise ValueError(f"make_mesh: dp={dp} does not divide n_devices={n}")
    if dp * tp != n:
        raise ValueError(f"make_mesh: dp*tp = {dp}*{tp} != n_devices = {n}")
    devs = _check_devices(n)
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_weight_spec(shape: Sequence[int], tp: int) -> P:
    """Pick a PartitionSpec for one weight tensor: shard the feature/output
    axis over "tp" when divisible, otherwise replicate."""
    shape = tuple(shape)
    if len(shape) == 2 and shape[1] % tp == 0 and shape[1] >= tp * 8:
        return P(None, "tp")
    if len(shape) == 4 and shape[0] % tp == 0 and shape[0] >= tp * 8:
        return P("tp", None, None, None)
    if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= tp * 128:
        return P("tp")
    return P()


def shard_weights(mesh: Mesh, shapes: Sequence[Sequence[int]]) -> List[NamedSharding]:
    tp = mesh.shape["tp"]
    return [NamedSharding(mesh, shard_weight_spec(s, tp)) for s in shapes]


def kv_head_sharding(mesh: Mesh, shape: Sequence[int]) -> NamedSharding:
    """Bucketed LLM KV cache (B, kv_heads, P, head_dim): shard the HEAD axis
    over "tp" so each device holds the K/V of exactly the heads whose q/k/v
    projection columns it owns (shard_weight_spec splits (din, H*hd) weights
    on the output axis, i.e. contiguous head blocks). The in-graph ScatterND
    cache write at `cache_len` then lands shard-locally and GQA's head-group
    expansion never crosses a device. Replicates when kv_heads % tp != 0."""
    tp = mesh.shape.get("tp", 1)
    if len(shape) == 4 and tp > 1 and shape[1] % tp == 0:
        return NamedSharding(mesh, P(None, "tp", None, None))
    return NamedSharding(mesh, P())


def activation_sharding(mesh: Mesh, shape: Sequence[int]) -> NamedSharding:
    """Batch-dim data parallelism + optional sequence parallelism: dim 0 over
    "dp" and dim 1 (sequence/spatial) over "sp" when divisible."""
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    spec: List = [None] * len(shape)
    if len(shape) >= 1 and shape[0] % dp == 0 and shape[0] > 0 and dp > 1:
        spec[0] = "dp"
    if len(shape) >= 3 and sp > 1 and shape[1] % sp == 0 and shape[1] >= sp * 8:
        spec[1] = "sp"
    return NamedSharding(mesh, P(*spec))


@dataclasses.dataclass
class TrainStep:
    """A jitted, mesh-sharded training step over an executor's computation."""

    fn: Any  # (weights_list, acts) -> loss, jitted with shardings
    weight_shardings: List[NamedSharding]
    mesh: Mesh


def make_train_step(executor, output_name: str, mesh: Mesh, learning_rate: float = 1e-4):
    """Build a sharded training step for a single-segment executor.

    loss = MSE(model(weights, acts)[output_name], target). Weights are
    TP-sharded, the batch is DP-sharded; optax adamw state is sharded like the
    weights. Returns (step_fn, init_state_fn).

    The reference has no training at all — this exists for the multi-chip
    scaling path (fine-tuning / LoRA-style workflows on the same graphs).
    """
    import optax

    assert len(executor.segments) == 1, "training uses single-segment plans"
    seg_fn = executor._segment_fn(0)
    opt = optax.adamw(learning_rate)

    def loss_fn(weights, acts, target):
        out = seg_fn(weights, acts)[output_name]
        return jnp.mean(jnp.square(out.astype(jnp.float32) - target.astype(jnp.float32)))

    def step(weights, opt_state, acts, target):
        loss, grads = jax.value_and_grad(loss_fn)(weights, acts, target)
        updates, opt_state = opt.update(grads, opt_state, weights)
        weights = optax.apply_updates(weights, updates)
        return weights, opt_state, loss

    w_shardings = shard_weights(mesh, [w.shape for w in executor.plan.arg_weights])

    def init(weights_np):
        weights = [
            jax.device_put(w.astype(np.float32), s) for w, s in zip(weights_np, w_shardings)
        ]
        opt_state = opt.init(weights)
        return weights, opt_state

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, init, w_shardings
