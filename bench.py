"""Headline benchmark: SD1.5 UNet denoising step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus the
framework's defining-feature numbers as extra keys:

  * peak_hbm_mb      — XLA buffer-assignment peak for the resident run
                       (BASELINE.md north star: ms/step + peak HBM MB; the
                       reference's analog is 0.133 GB peak RSS, README.md:134)
  * streamed         — {step_ms, peak_hbm_mb, hbm_budget_mb, host_to_hbm_gbps}
                       for a run with hbm_budget_bytes ~ 1/4 of the weight
                       bytes: every step re-streams the full ~1.7 GB of bf16
                       weights host->HBM through the double buffer while
                       segments execute (OnnxStream's defining feature mapped
                       to TPU), so step time ~ max(compute, weight DMA) and
                       peak HBM is bounded by budget + double buffer, not by
                       the 860M-param model size.

Measurement methodology (docs/tpu_notes.md): on the tunneled chip,
``block_until_ready`` returns at local staging — only a device->host
readback forces real completion — and the tunnel itself is a ~10-50 MB/s
WAN. Therefore:

  * the resident loop forces its warmup with a readback (one-time program
    load + the 1.7 GB weight upload land outside the timed region), then
    times n chained device-resident steps ended by one forcing readback
    (~40 ms, amortized to <0.5 ms/step at n=100);
  * the streamed measurement (inherently link-bound here) runs IN-PROCESS
    after the headline (a fresh subprocess would re-pay the tunnel's
    30-167 s first-transfer handshake) and self-calibrates against the raw
    link rate so the result reads as "the double-buffer pipeline saturates
    the available host link", which is the design claim.

Baseline (BASELINE.md): the reference runs the SD1.5 UNet fp16 in 18.2 s per
step (best of 3, i7-8750H AVX2 + SSD streaming, README.md:134). The metric
here is the same model forward (860M params, 64x64 latents, 77-token
context), built in the framework's text IR, planned/compiled by the session
runtime, bf16 compute with Pallas flash attention, on one TPU v5e chip.
vs_baseline = reference_ms / our_ms (higher is better).
"""

import json
import os
import sys
import time

import numpy as np

# Repo-local persistent compile cache: /tmp does NOT survive to the next
# driver run, but the workspace does — a warm cache turns the ~200 s
# headline compile into a program load and leaves the children nearly the
# whole wall budget (one shared definition: utils/compile_cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _setup_cache():
    from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache

    setup_repo_compile_cache()


BASELINE_UNET_MS = 18200.0


def _build_session(hbm_budget_bytes: int = 0, batch: int = 1):
    try:
        _setup_cache()
    except Exception:
        pass

    from onnxstream_tpu.models.sd.unet import build_unet, SD15
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    # lazy: the 3.4 GB synthetic checkpoint is never host-generated unless
    # something actually reads it (the streamed child pre-materializes its
    # prefix; the resident headline synthesizes on device). batch is baked
    # into the graph's declared shapes (the planner shape-checks every line).
    g = build_unet(SD15, batch=batch, lazy_weights=True)
    config = SessionConfig(
        compute_dtype="bfloat16",
        fuse_ops_in_attention=True,
        use_flash_attention=True,
        hbm_budget_bytes=hbm_budget_bytes,
    )
    s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    rng = np.random.RandomState(0)
    inputs = {
        "sample": rng.rand(batch, 4, 64, 64).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(batch, 77, 768).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)
    return g, s, inputs


def _time_unet_session(s, inputs, n_iter: int = 100):
    """Warmup (forced by a readback) + n chained device-resident steps.

    Returns (step_ms, out_probe). Big float weights are device-synthesized
    unless OSTPU_BENCH_UPLOAD=1 (see main). Stage marks on stderr: setup
    wall time swings 77-400 s across tunnel hours with the SAME warm cache
    (2026-08-19 observations), so each record must say where its setup went
    (plan vs synthesis vs program load/compile vs warmup forcing)."""
    import jax

    t0 = time.time()

    def _m(stage):
        print(f"# unet {stage} t+{time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    ex = s._executor()
    seg = ex.segments[0]
    _m("planned")
    out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
    if os.environ.get("OSTPU_BENCH_UPLOAD", "") == "1":
        weights = ex._fetch_segment_weights(seg)
    else:
        weights = ex.synthesize_segment_weights(seg)
    _m("weights dispatched")
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    cf = ex._compiled(0)
    _m("program ready")
    r = cf(weights, acts)
    a = dict(acts)
    a["sample"] = r[out_name]  # feedback signature (sample in compute dtype)
    r = cf(weights, a)
    out_probe = np.asarray(r[out_name], np.float32)  # forcing readback
    _m("warmup forced")
    t0 = time.time()
    for _ in range(n_iter):
        r = cf(weights, a)
        a["sample"] = r[out_name]
    np.asarray(r[out_name])
    return (time.time() - t0) / n_iter * 1e3, out_probe


def _batch_measure(batch: int = 4, n_iter: int = 50) -> dict:
    """UNet step at batch N: the throughput story (reference batch replay,
    src/onnxstream.cpp:3817-3847). imgs/s counts CFG pairs as 2 images."""
    _, s, inputs = _build_session(batch=batch)
    dt_ms, _ = _time_unet_session(s, inputs, n_iter=n_iter)
    s.close()
    return {
        "batch": batch,
        "step_ms": round(dt_ms, 2),
        "imgs_per_s": round(batch / (dt_ms / 1e3), 1),
    }


def streamed_child() -> None:
    """CLI entry (`bench.py --streamed-child`): standalone streamed run."""
    print(json.dumps(_streamed_measure(
        float(os.environ.get("OSTPU_STREAM_BUDGET_S", "240")))))


def _streamed_measure(wall_budget: float) -> dict:
    """Bounded-HBM streaming measurement; returns the result dict.

    Budget-sized proof (the full 1.64 GB restream cannot fit a slow-link
    driver hour): stream the FIRST ~OSTPU_STREAM_CAP_MB of the UNet's segment
    chain through the double buffer while the segments execute, then
    calibrate the raw link rate by re-transferring the same arrays with no
    compute. The design claim — pipeline rate ~ link rate, peak HBM bounded
    by budget + next segment's weights, not by the 860M-param model — holds
    per segment, so a prefix carries it. On a real TPU host (PCIe ~15 GB/s)
    the same pipeline streams the full 1.7 GB in ~0.1 s/step; here the link
    is a ~10-50 MB/s tunneled WAN (docs/tpu_notes.md), hence the ratio is the
    result, not the absolute rate. Reference contract being demonstrated:
    DiskPrefetch's ordered bounded read-ahead (src/onnxstream.h:356-664) with
    HBM as the sink.
    """
    import jax

    from onnxstream_tpu.runtime.executor import upload_bytes

    t0 = time.time()

    def _mark(stage):
        print(f"# streamed {stage} t+{time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    # Size the budget from the graph weights directly (bf16 upload = half the
    # f32 host bytes) — building a resident twin session just to read its
    # plan cost ~60-90 s of single-CPU work per run. 1/8 of the weights per
    # segment (~205 MB): small enough that a 2-3 segment prefix both fits a
    # slow-link hour AND exercises the actual double buffer (k=1 degenerates
    # to a plain upload), with peak HBM bounded by ~2 segment budgets instead
    # of the 1779 MB resident footprint.
    from onnxstream_tpu.models.sd.unet import build_unet, SD15

    approx_bytes = sum(
        w.nbytes // 2 for w in build_unet(SD15, lazy_weights=True).weights.values()
    )
    budget = approx_bytes // 8
    g2, s2, inputs = _build_session(hbm_budget_bytes=budget)
    ex = s2._executor()
    segs = ex.segments
    seg_bytes = [sum(upload_bytes(w) for w in s.weight_args) for s in segs]

    # probe the link rate (one ~16 MB transfer) and size the prefix so the
    # child's two passes (timed stream + raw-link calibration) fit its wall
    # budget; the parent passes what's left of the bench budget in
    # OSTPU_STREAM_BUDGET_S. The cap env stays as a hard upper bound.
    # tiny warmup put first: the first transfer of the process pays the
    # one-time backend/tunnel handshake, which would swamp the probe
    np.asarray(jax.device_put(np.zeros((256,), np.float32))[:1])
    probe = np.zeros((1 << 19,), np.float32)  # 2 MB: cheap even at 0.1 MB/s
    tp = time.time()
    np.asarray(jax.device_put(probe)[:1])
    dt = time.time() - tp
    if dt < 0.5:  # fast hour: refine with a 16 MB probe (RTT swamps 2 MB)
        probe = np.zeros((1 << 22,), np.float32)
        tp = time.time()
        np.asarray(jax.device_put(probe)[:1])
        dt = time.time() - tp
    # 0.65 derate for SIZING: a one-shot probe rides TCP burst buffers and
    # over-reads the sustained rate (measured 62 burst vs 18.5 sustained
    # MB/s on 2026-08-19); undersizing the prefix is recoverable, a
    # watchdog-killed overshoot is not
    link_bps = 0.65 * probe.nbytes / max(dt, 1e-9)
    spent = time.time() - t0
    # 2.2x: timed pass + calibration pass + 10% slack; ~30 s reserved for
    # compile (persistent cache) + setup tail
    transfer_budget = max(wall_budget - spent - 30.0, 30.0) / 2.2
    cap = min(
        int(float(os.environ.get("OSTPU_STREAM_CAP_MB", "640")) * (1 << 20)),
        int(transfer_budget * link_bps),
    )
    # the proof needs >= 2 segments (k=1 degenerates to a plain upload); if
    # this hour's link can't move 2 segments twice inside the budget, skip
    # rather than hang the whole bench (0.1 MB/s hours exist — linkrate log)
    if sum(seg_bytes[:2]) > cap * 1.3:
        s2.close()
        return {"skipped": f"link too slow ({link_bps / 1e6:.1f} MB/s for "
                           f"{sum(seg_bytes[:2]) >> 20} MB min prefix)"}
    k, acc = 0, 0
    while k < len(segs) and (k < 2 or acc + seg_bytes[k] <= cap):
        acc += seg_bytes[k]
        k += 1
    _mark(
        f"session built, link ~{link_bps / 1e6:.0f} MB/s, prefix {k}/{len(segs)} "
        f"segments, {acc / (1 << 20):.0f} MB"
    )

    # warmup = COMPILE only (AOT from the plan's avals): no weight bytes move
    # until the timed pass, so the child's link traffic is 2 x prefix (one
    # measured streaming pass + one raw-link calibration pass)
    for si in range(k):
        avals = ex._seg_arg_avals.get(si) or ex._derive_seg_avals(si)
        ex._compiled(si).lower(*avals).compile()
        _mark(f"compiled segment {si + 1}/{k}")
    # pre-materialize + pre-convert the prefix weights on the host so the
    # timed pass measures the transfer pipeline, not lazy randn generation
    # or the one-time f32->bf16 convert-and-writeback
    for si in range(k):
        for w in segs[si].weight_args:
            arr = ex._maybe_force_quant(w, ex._host_weight(w))
            target = np.dtype(w.upload_dtype)
            if arr.dtype != target and w.quant is None and w.transform is None:
                ex.provider.update(w.name, arr.astype(target))
    _mark("prefix weights materialized")
    setup_s = time.time() - t0

    def run_prefix():
        """Mirror Executor.run's double-buffer loop over segments [0, k).

        Returns (fill_s, steady_s): segment 0's weights CANNOT overlap with
        anything (pipeline fill — the analog of DiskPrefetch's initial
        read-ahead before the first op runs, reference onnxstream.h:431-601),
        so the steady-state window starts once they are resident; the design
        claim 'pipeline rate ~ link rate' is about the steady window."""
        acts = ex._prepare_inputs(inputs)
        results = {}
        tf = time.time()
        nxt = ex._fetch_segment_weights(segs[0], 0)
        # force REAL arrival of segment 0: on the tunneled backend
        # block_until_ready returns at local staging (docs/tpu_notes.md) —
        # only a device->host readback proves the bytes crossed the link;
        # transfers are FIFO so reading one element of the LAST weight
        # forces the whole segment (same trick as the calibration pass)
        last_w = nxt[-1]
        np.asarray(last_w[(0,) * last_w.ndim])
        t1 = time.time()
        for si in range(k):
            weights = nxt
            seg_in = {n: (acts[n] if n in acts else results[n]) for n in segs[si].in_names}
            if si == 0:
                seg_in = {**acts, **seg_in}
            fut = ex._compiled(si)(weights, seg_in)
            if si + 1 < k:
                nxt = ex._fetch_segment_weights(segs[si + 1], si + 1)
            results.update(fut)
        name = segs[k - 1].out_names[0]
        np.asarray(results[name][(0,) * results[name].ndim])  # force the chain
        return t1 - tf, time.time() - t1

    fill_s, stream_s = run_prefix()
    steady_bytes = acc - seg_bytes[0]
    stream_gbps = steady_bytes / stream_s / 1e9

    # raw-link calibration AFTER the timed pass: transfer the SAME arrays
    # (segments 1..k-1, the steady window's bytes) again with no compute —
    # identical transfer pattern (the tunnel's rate depends on array sizes),
    # so pipeline rate / raw rate isolates the double buffer's overhead over
    # whatever link exists.
    t0 = time.time()
    last, sent = None, 0
    for si in range(1, k):
        for w in segs[si].weight_args:
            arr = ex.provider.get(w.name, w.file_dtype, w.file_shape or w.shape)
            if arr.dtype != np.dtype(w.upload_dtype) and w.quant is None:
                arr = arr.astype(w.upload_dtype)
            last = jax.device_put(arr)
            sent += arr.nbytes
    np.asarray(last[(0,) * last.ndim])  # FIFO: forces the whole calibration
    link_gbps = sent / (time.time() - t0) / 1e9

    # peak HBM over the prefix chain: segment si's XLA buffer-assignment peak
    # plus segment si+1's weights arriving through the double buffer
    peak = 0
    for si in range(k):
        m = ex.memory_analysis(si)
        if m is None:
            continue
        nxt_b = seg_bytes[si + 1] if si + 1 < k else 0
        peak = max(peak, m["peak_bytes"] + nxt_b)

    s2.close()
    return {
        "stream_mb": round(steady_bytes / (1 << 20), 1),
        "stream_s": round(stream_s, 1),
        "fill_s": round(fill_s, 1),
        "fill_mb": round(seg_bytes[0] / (1 << 20), 1),
        "stream_gbps": round(stream_gbps, 4),
        "raw_link_gbps": round(link_gbps, 4),
        "utilization": round(stream_gbps / max(link_gbps, 1e-9), 3),
        "peak_hbm_mb": round(peak / (1 << 20), 1),
        "hbm_budget_mb": round(budget / (1 << 20), 1),
        "segments_streamed": k,
        "segments_total": len(segs),
        "total_weight_mb": round(sum(seg_bytes) / (1 << 20), 1),
        "setup_s": round(setup_s, 0),
    }


def main() -> None:
    if "--streamed-child" in sys.argv:
        streamed_child()
        return

    # One strict wall budget for the WHOLE bench process (headline + optional
    # children). The headline JSON is printed the moment the resident
    # measurement finishes — round 2 shipped rc=124/parsed:null because the
    # old structure printed nothing until two 1800 s children returned.
    t_start = time.time()
    total_budget_s = float(os.environ.get("OSTPU_BENCH_TOTAL_S", "540"))

    t_setup = time.time()

    def _mark(stage):
        print(f"# bench {stage} t+{time.time() - t_start:.0f}s", file=sys.stderr, flush=True)

    import jax

    _mark("jax imported")
    g, s, inputs = _build_session()
    _mark("session built")
    from onnxstream_tpu.models.sd.unet import param_count

    # warmup: dispatch, then FORCE with a readback so one-time costs (program
    # load, deferred 1.7 GB weight upload) land here, not in the timed region.
    # The bench model's weights are synthetic (BASELINE.md/README label), so
    # the big float tensors are generated ON DEVICE: dense bf16 step time is
    # value-independent and the tunneled host link (~3-50 MB/s WAN) turns a
    # 1.7 GB upload into 1-10 min of setup — round 2's rc=124 was exactly
    # that. OSTPU_BENCH_UPLOAD=1 restores the full host-upload path.
    # Warmup forced by a readback; then chained device-resident steps
    # (out_sample feeds the next step's sample, like a real diffusion loop).
    dt_ms, out_probe = _time_unet_session(s, inputs, n_iter=100)
    setup_s = time.time() - t_setup
    _mark("warmup+steady done")

    # peak HBM (XLA buffer-assignment accounting; allocator memory_stats is
    # unavailable over the tunnel). Pure compiler introspection, no transfers.
    stats = s.hbm_stats()
    peak_hbm_mb = round(stats.get("peak_bytes_in_use", 0) / (1 << 20), 1)

    result = {
        "metric": "sd15_unet_step_ms",
        "value": round(dt_ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_UNET_MS / dt_ms, 1),
        "peak_hbm_mb": peak_hbm_mb,
        # self-describing weights mode: synthetic-device (default; dense bf16
        # timing is value-independent) vs uploaded (OSTPU_BENCH_UPLOAD=1)
        "weights": "uploaded" if os.environ.get("OSTPU_BENCH_UPLOAD", "") == "1"
        else "synthetic-device",
    }
    # GUARANTEED headline emission: this line is the driver-captured result
    # even if every optional child below is skipped or killed.
    print(json.dumps(result), flush=True)
    print(
        f"# setup {setup_s:.0f}s, params {param_count(g)/1e6:.0f}M, ops {len(g.ops)}, "
        f"backend {jax.default_backend()}, out max|x|={float(np.abs(out_probe).max()):.3f}",
        file=sys.stderr,
        flush=True,
    )
    # release the resident UNet's HBM (1.7 GB of weights + programs) before
    # the children run: drop every device reference and collect
    s.close()
    del s, g
    import gc

    gc.collect()

    def _remaining() -> float:
        return total_budget_s - (time.time() - t_start)

    def _inproc(fn, *args, deadline_margin: float = 25.0):
        """Run a measurement IN-PROCESS. A fresh subprocess pays the axon
        tunnel's first-transfer handshake again (measured 30-167 s — more
        than either child's real work); this process already paid it during
        the headline warmup. Exceptions degrade to an error dict so the
        enriched line always prints. A SIGALRM watchdog pinned to the
        OVERALL bench deadline (minus margin for the remaining children's
        skip paths + the final print) bounds a child that stalls inside a
        blocked transfer on a dead-link hour — an in-process child has no
        subprocess timeout, and blowing the driver's wall budget turns the
        whole bench into rc=124 (round 2's failure mode)."""
        import signal

        budget = _remaining() - deadline_margin
        if budget <= 5:
            return {"skipped": "budget"}

        def _on_alarm(signum, frame):
            raise TimeoutError(f"child watchdog after {budget:.0f}s")

        prev = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(int(budget))
        try:
            return fn(*args)
        except TimeoutError as e:
            return {"skipped": str(e)}
        except Exception as e:
            return {"error": f"{type(e).__name__}: {e}"[:400]}
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)

    # Optional enrichment children, each individually skippable, sharing the
    # remaining budget. Order by EXPECTED COST, cheapest-guaranteed first:
    # the TinyLlama child is ~70 s warm (device-synthesized weights +
    # persistent compile cache, measured in-bench 2026-08-19), so it always
    # lands; the streamed child then takes everything left (its segment
    # programs are pre-warmed in .cache/jax_bench, its own link-rate probe
    # self-skips dead hours, and the watchdog pins it to the deadline); the
    # batch child is the least essential (the throughput story is recorded
    # in docs/tpu_notes.md + README from the same-hour sweep) and takes
    # leftovers only.
    if _remaining() > 90:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from measure import llm_bench_result

        llm = _inproc(llm_bench_result)
        _mark("tinyllama child done")
    else:
        llm = {"skipped": "budget"}
    if _remaining() > 150:
        streamed = _inproc(_streamed_measure, _remaining() - 30.0)
        _mark("streamed child done")
    else:
        streamed = {"skipped": "budget"}
    if _remaining() > 100:
        batch = _inproc(_batch_measure, 4)
        _mark("batch child done")
    else:
        batch = {"skipped": "budget"}

    # Enriched re-print: same headline keys plus the children, so a driver
    # parsing either the first or the last JSON line gets a valid result.
    result.update(tinyllama=llm, streamed=streamed, batch=batch)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
