"""Headline benchmark: SD1.5 UNet denoising step on one TPU chip.

Prints JSON lines on stdout, each superseding the previous (the driver
parses the LAST parseable line); `{"metric", "value", "unit",
"vs_baseline"}` plus the framework's defining-feature numbers as extra keys:

  * peak_hbm_mb      — XLA buffer-assignment peak for the resident run
                       (BASELINE.md north star: ms/step + peak HBM MB; the
                       reference's analog is 0.133 GB peak RSS, README.md:134)
  * link_mbps        — this hour's measured host->device link rate (the
                       tunneled chip swings 0.1-60 MB/s hour to hour), so
                       every record self-explains its conditions
  * tinyllama / streamed / yolo / whisper / sdxl / batch — enrichment children
                       (the yolo child runs the REAL reference-checkout
                       fp32 weights — the one real-checkpoint number this
                       environment can produce)

EMISSION IS UNCONDITIONAL. Rounds 2 and 4 were lost to rc=124 with zero
output: the first forced device execution can block indefinitely inside a
native PJRT call on a dead tunnel hour, where neither Python timeouts nor
SIGALRM handlers can run (a signal handler only executes between
bytecodes; a thread stuck in a native transfer never returns to the
interpreter — regression-proved in tests/test_watchdog_native.py).
Therefore:

  * a provisional JSON line is printed BEFORE any device work, so even a
    hard kill leaves a parseable record;
  * a watchdog THREAD armed at total_budget - margin prints the best-known
    result (headline if measured, else `skipped: stalled at <stage>`, plus
    whatever children completed, the stage marks, and the link rate) and
    `os._exit(0)`s — this works regardless of where the main thread is
    blocked;
  * ALL device work runs in a killable CHILD process (`--device-child`)
    under a device-free SUPERVISOR (the default entry): the supervisor
    relays the child's JSON/marks, and when the child wedges in the early
    link stages (handshake/probe — where every observed dead hour stalls)
    it kills the child and RETRIES with a fresh process while budget
    remains. The link's state flips at sub-hour granularity (observed
    alive -> dead within a minute, and dead -> alive mid-budget), so an
    hour that STARTS dead can still capture the headline. On a live hour
    the supervisor costs nothing: one process does all the device work,
    no extra handshake;
  * the headline region is also exception-guarded: a RAISING device call
    (backend init refused, transfer error) degrades to an error record with
    rc=0 rather than rc=1 with only the provisional line;
  * `OSTPU_FAULT_STALL=<stage>` / `OSTPU_FAULT_RAISE=<stage>` inject a
    never-returning native block / an exception at that stage mark, and
    `OSTPU_FAULT_STALL_UNTIL=<stage>:<path>` blocks at the stage only until
    the sentinel file exists (a recovering link); tests/test_bench_emission.py
    asserts rc=0 + parseable output under all four injections.

Measurement methodology (docs/tpu_notes.md): on the tunneled chip,
``block_until_ready`` returns at local staging — only a device->host
readback forces real completion — and the tunnel itself is a ~10-50 MB/s
WAN. Therefore:

  * the link rate is probed FIRST (2 MB, refined with 16 MB on fast hours);
  * the resident loop forces its warmup with a readback (one-time program
    load lands outside the timed region), then times n chained
    device-resident steps ended by one forcing readback (~40 ms, amortized
    to <0.5 ms/step at n=100);
  * enrichment children run IN-PROCESS (a fresh subprocess would re-pay the
    tunnel's 30-167 s first-transfer handshake), ordered by link
    sensitivity: on a fast hour the streamed child goes first (it needs
    the link), otherwise the device-synthesized children (TinyLlama,
    whisper) go first and the streamed child self-skips if the hour can't
    carry its minimum prefix.

Baseline (BASELINE.md): the reference runs the SD1.5 UNet fp16 in 18.2 s per
step (best of 3, i7-8750H AVX2 + SSD streaming, README.md:134). The metric
here is the same model forward (860M params, 64x64 latents, 77-token
context), built in the framework's text IR, planned/compiled by the session
runtime, bf16 compute with Pallas flash attention, on one TPU v5e chip.
vs_baseline = reference_ms / our_ms (higher is better).
"""

import ctypes
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# Repo-local persistent compile cache: /tmp does NOT survive to the next
# driver run, but .cache/jax_bench left in the workspace does — a warm cache
# turns the ~200 s headline compile into a program load and leaves the
# children nearly the whole wall budget (one shared definition:
# utils/compile_cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _setup_cache():
    from onnxstream_tpu.utils.compile_cache import setup_repo_compile_cache

    setup_repo_compile_cache()


BASELINE_UNET_MS = 18200.0

_TINY = os.environ.get("OSTPU_BENCH_TINY", "") == "1"

# Best-known state, shared with the watchdog thread. Plain dict + GIL-atomic
# assignments; the watchdog only reads.
_STATE = {
    "t_start": time.time(),
    "stage": "start",
    "marks": [],
    "link_mbps": None,
    "result": None,    # headline dict once measured
    "children": {},    # child name -> result dict, added as each completes
    "done": False,
}


def _maybe_fault(stage: str) -> None:
    """Fault injection for the emission-guarantee test: block INSIDE a native
    call. poll(2) with no fds never returns to the interpreter (re-entered on
    EINTR), so neither Python-level timeouts nor SIGALRM handlers can fire —
    the exact shape of a stalled PJRT transfer on a dead tunnel hour. Only
    the watchdog thread's os._exit can end the process."""
    if os.environ.get("OSTPU_FAULT_STALL", "") == stage:
        print(f"# bench FAULT INJECTED at stage '{stage}'", file=sys.stderr, flush=True)
        libc = ctypes.CDLL(None, use_errno=True)
        while True:
            libc.poll(None, 0, 3_600_000)
    fu = os.environ.get("OSTPU_FAULT_STALL_UNTIL", "")
    if fu:
        st, _, path = fu.partition(":")
        if st == stage and not os.path.exists(path):
            # recovery simulation: this ATTEMPT is dead (the block never
            # re-checks the file); a fresh supervisor retry checks again
            print(f"# bench FAULT INJECTED (until {path}) at stage '{stage}'",
                  file=sys.stderr, flush=True)
            libc = ctypes.CDLL(None, use_errno=True)
            while True:
                libc.poll(None, 0, 3_600_000)
    if os.environ.get("OSTPU_FAULT_RAISE", "") == stage:
        # the RAISE failure shape: PJRT init refused / transfer error — the
        # headline try/except must degrade to an error record, rc=0
        raise RuntimeError(f"fault injected: raise at stage '{stage}'")


def _mark(stage: str) -> None:
    t = time.time() - _STATE["t_start"]
    _STATE["stage"] = stage
    _STATE["marks"].append(f"{stage} t+{t:.0f}s")
    print(f"# bench {stage} t+{t:.0f}s", file=sys.stderr, flush=True)
    _maybe_fault(stage)


def _best_known() -> dict:
    """Compose the most informative parseable record from current state."""
    r = _STATE["result"]
    if r is None:
        r = {
            "metric": "sd15_unet_step_ms",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "skipped": f"stalled at {_STATE['stage']}",
        }
    out = dict(r)
    if _STATE["link_mbps"] is not None:
        out["link_mbps"] = _STATE["link_mbps"]
    out.update(_STATE["children"])
    return out


def _arm_watchdog(deadline: float) -> threading.Thread:
    """The unconditional-emission guard. A daemon THREAD (not SIGALRM: a
    Python signal handler runs only between bytecodes, so a main thread
    blocked inside a native PJRT transfer never sees it —
    tests/test_watchdog_native.py proves this with a C-level block). At the
    deadline it prints the best-known JSON and hard-exits 0; os._exit
    terminates the process even while other threads sit in native calls."""

    def _run():
        while not _STATE["done"]:
            now = time.time()
            if now >= deadline:
                out = _best_known()
                out["watchdog"] = (
                    f"fired at stage '{_STATE['stage']}' "
                    f"t+{now - _STATE['t_start']:.0f}s"
                )
                out["marks"] = _STATE["marks"][-10:]
                print(json.dumps(out), flush=True)
                sys.stderr.flush()
                os._exit(0)
            time.sleep(min(1.0, max(deadline - now, 0.05)))

    th = threading.Thread(target=_run, daemon=True, name="bench-watchdog")
    th.start()
    return th


def _probe_link() -> float:
    """Measure this hour's host->device rate FIRST, before any heavy device
    work, so every record (including a stalled one) carries link_mbps. The
    tiny warmup put pays the one-time backend/tunnel handshake (30-167 s
    measured), which would otherwise swamp the probe."""
    import jax

    _mark("link handshake")
    np.asarray(jax.device_put(np.zeros((256,), np.float32))[:1])
    _mark("link probe")
    probe = np.zeros((1 << 19,), np.float32)  # 2 MB: cheap even at 0.1 MB/s
    tp = time.time()
    np.asarray(jax.device_put(probe)[:1])
    dt = time.time() - tp
    if dt < 0.5 and not _TINY:  # fast hour: refine (RTT swamps 2 MB)
        probe = np.zeros((1 << 22,), np.float32)
        tp = time.time()
        np.asarray(jax.device_put(probe)[:1])
        dt = time.time() - tp
    mbps = probe.nbytes / max(dt, 1e-9) / 1e6
    _STATE["link_mbps"] = round(mbps, 2)
    _mark(f"link ~{mbps:.1f} MB/s")
    return mbps


def _build_session(hbm_budget_bytes: int = 0, batch: int = 1):
    try:
        _setup_cache()
    except Exception:
        pass

    from onnxstream_tpu.models.sd.unet import build_unet, SD15, TINY
    from onnxstream_tpu.runtime.config import SessionConfig
    from onnxstream_tpu.runtime.session import Session
    from onnxstream_tpu.runtime.weights import DictWeightsProvider

    cfg = TINY if _TINY else SD15
    # lazy: the 3.4 GB synthetic checkpoint is never host-generated unless
    # something actually reads it (the streamed child pre-materializes its
    # prefix; the resident headline synthesizes on device). batch is baked
    # into the graph's declared shapes (the planner shape-checks every line).
    g = build_unet(cfg, batch=batch, lazy_weights=True)
    config = SessionConfig(
        compute_dtype="bfloat16",
        fuse_ops_in_attention=True,
        use_flash_attention=True,
        hbm_budget_bytes=hbm_budget_bytes,
    )
    s = Session(config=config, weights_provider=DictWeightsProvider(g.weights))
    s.read_string(g.to_text())
    rng = np.random.RandomState(0)
    ss = cfg.sample_size
    inputs = {
        "sample": rng.rand(batch, cfg.in_channels, ss, ss).astype(np.float32),
        "timestep": np.array([500.0], np.float32),
        "encoder_hidden_states": rng.rand(
            batch, cfg.context_len, cfg.cross_attention_dim
        ).astype(np.float32),
    }
    for k, v in inputs.items():
        s.add_tensor(k, v)
    return g, s, inputs


def _time_unet_session(s, inputs, n_iter: int = 100):
    """Warmup (forced by a readback) + n chained device-resident steps.

    Returns (step_ms, out_probe). Big float weights are device-synthesized
    unless OSTPU_BENCH_UPLOAD=1 (see main). Stage marks flow through the
    global _mark so a stall inside any stage is identified in the emitted
    record: setup wall time swings 77-400 s across tunnel hours with the
    SAME warm cache (2026-08-19 observations), and round 4 hung INSIDE the
    first forced execution (after 'program ready') on a dead hour."""
    import jax

    ex = s._executor()
    seg = ex.segments[0]
    _mark("unet planned")
    out_name = "out_sample" if "out_sample" in seg.out_names else seg.out_names[0]
    if os.environ.get("OSTPU_BENCH_UPLOAD", "") == "1":
        weights = ex._fetch_segment_weights(seg)
    else:
        weights = ex.synthesize_segment_weights(seg)
    _mark("unet weights dispatched")
    acts = {k: jax.device_put(np.asarray(v, np.float32)) for k, v in inputs.items()}
    cf = ex._compiled(0)
    _mark("unet program ready")
    r = cf(weights, acts)
    a = dict(acts)
    a["sample"] = r[out_name]  # feedback signature (sample in compute dtype)
    r = cf(weights, a)
    out_probe = np.asarray(r[out_name], np.float32)  # forcing readback
    _mark("unet warmup forced")
    t0 = time.time()
    for _ in range(n_iter):
        r = cf(weights, a)
        a["sample"] = r[out_name]
    np.asarray(r[out_name])
    return (time.time() - t0) / n_iter * 1e3, out_probe


def _batch_measure(batch: int = 4, n_iter: int = 50) -> dict:
    """UNet step at batch N: the throughput story (reference batch replay,
    src/onnxstream.cpp:3817-3847). imgs_per_s counts each batch item once
    (plain forwards; no CFG pairing in this harness — a CFG pipeline at the
    same batch does half as many image-steps per second)."""
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
    import jax

    # honor JAX_PLATFORMS for CPU smokes (sitecustomize pre-registers the
    # axon plugin; env var alone is too late — same pattern as device_main)
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        jax.config.update("jax_platforms", plat)
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

    def _smark(stage):
        _mark(f"streamed {stage}")

    # Size the budget from the graph weights directly (bf16 upload = half the
    # f32 host bytes) — building a resident twin session just to read its
    # plan cost ~60-90 s of single-CPU work per run. 1/8 of the weights per
    # segment (~205 MB): small enough that a 2-3 segment prefix both fits a
    # slow-link hour AND exercises the actual double buffer (k=1 degenerates
    # to a plain upload), with peak HBM bounded by ~2 segment budgets instead
    # of the 1779 MB resident footprint.
    from onnxstream_tpu.models.sd.unet import build_unet, SD15, TINY

    approx_bytes = sum(
        w.nbytes // 2
        for w in build_unet(TINY if _TINY else SD15,
                            lazy_weights=True).weights.values()
    )
    budget = max(approx_bytes // 8, 1)
    g2, s2, inputs = _build_session(hbm_budget_bytes=budget)
    ex = s2._executor()
    segs = ex.segments
    seg_bytes = [sum(upload_bytes(w) for w in s.weight_args) for s in segs]

    # probe the link rate (one ~16 MB transfer) and size the prefix so the
    # child's two passes (timed stream + raw-link calibration) fit its wall
    # budget; the parent passes what's left of the bench budget. The cap env
    # stays as a hard upper bound.
    # in-process (bench child): _probe_link already measured this hour —
    # re-probing would burn 16 MB of link for a number we have. Standalone
    # (--streamed-child): probe here, paying the handshake first.
    if _STATE["link_mbps"] is not None:
        probe_mbps = float(_STATE["link_mbps"])
    else:
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
        probe_mbps = probe.nbytes / max(dt, 1e-9) / 1e6
    # 0.65 derate for SIZING: a one-shot probe rides TCP burst buffers and
    # over-reads the sustained rate (measured 62 burst vs 18.5 sustained
    # MB/s on 2026-08-19); undersizing the prefix is recoverable, a
    # watchdog-killed overshoot is not
    link_bps = 0.65 * probe_mbps * 1e6
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
    if k < 2:
        # a single-segment plan cannot exercise the double buffer (and the
        # calibration loop below would have nothing to force)
        s2.close()
        return {"skipped": f"plan has {len(segs)} segment(s); streaming "
                           "needs >= 2"}
    _smark(
        f"session built, link ~{link_bps / 1e6:.0f} MB/s, prefix {k}/{len(segs)} "
        f"segments, {acc / (1 << 20):.0f} MB"
    )

    # warmup = COMPILE only (AOT from the plan's avals): no weight bytes move
    # until the timed pass, so the child's link traffic is 2 x prefix (one
    # measured streaming pass + one raw-link calibration pass)
    for si in range(k):
        avals = ex._seg_arg_avals.get(si) or ex._derive_seg_avals(si)
        ex._compiled(si).lower(*avals).compile()
        _smark(f"compiled segment {si + 1}/{k}")
    # pre-materialize + pre-convert the prefix weights on the host so the
    # timed pass measures the transfer pipeline, not lazy randn generation
    # or the one-time f32->bf16 convert-and-writeback
    for si in range(k):
        for w in segs[si].weight_args:
            arr = ex._maybe_force_quant(w, ex._host_weight(w))
            target = np.dtype(w.upload_dtype)
            if arr.dtype != target and w.quant is None and w.transform is None:
                ex.provider.update(w.name, arr.astype(target))
    _smark("prefix weights materialized")
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


def device_main() -> None:
    """The device-touching benchmark (`--device-child`): headline +
    enrichment children, self-watchdogged. Run under supervisor_main, which
    can kill and respawn this process when it wedges in the early link
    stages — everything here assumes it may be killed at any moment, hence
    the provisional line and the superseding-JSON-lines protocol."""
    # One strict wall budget for the WHOLE bench process (headline +
    # children), enforced by the watchdog thread below. Rounds 2 and 4
    # shipped rc=124/parsed:null because emission waited on device work that
    # never returned; now a parseable line exists from t+0 and the watchdog
    # bounds everything else.
    _STATE["t_start"] = t_start = time.time()
    total_budget_s = float(os.environ.get("OSTPU_BENCH_TOTAL_S", "540"))
    margin_s = float(os.environ.get("OSTPU_BENCH_WATCHDOG_MARGIN_S", "25"))

    # provisional record: even a kill -9 after this point leaves a parseable
    # line explaining where the process was
    print(json.dumps({
        "metric": "sd15_unet_step_ms",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "provisional": "bench started; superseded by later lines",
    }), flush=True)

    if os.environ.get("OSTPU_BENCH_NO_WATCHDOG", "") != "1":
        _arm_watchdog(t_start + total_budget_s - margin_s)

    # Headline, exception-guarded: the watchdog covers the STALL failure
    # shape (blocked native call), this try covers the RAISE shape (PJRT
    # init refused, device_put error on a dead tunnel hour). Either way the
    # process must end rc=0 with a parsed JSON line — a raising headline
    # degrades to an error record and the children still get their chance
    # (each independently guarded by _inproc).
    try:
        import jax

        # Honor JAX_PLATFORMS even though this environment's sitecustomize
        # imports jax and registers the axon plugin before bench.py runs (env
        # var alone is too late — same pattern as tests/conftest.py; backend
        # not yet initialized here, so the config update still wins). The
        # emission CI test runs bench.py with JAX_PLATFORMS=cpu and must NOT
        # land on the real chip.
        plat = os.environ.get("JAX_PLATFORMS", "")
        if plat:
            jax.config.update("jax_platforms", plat)

        _mark(f"jax imported ({jax.default_backend()})")
        _probe_link()

        g, s, inputs = _build_session()
        _mark("session built")
        from onnxstream_tpu.models.sd.unet import param_count

        # warmup: dispatch, then FORCE with a readback so one-time costs
        # (program load, deferred weight upload) land here, not in the timed
        # region. The bench model's weights are synthetic (BASELINE.md/README
        # label), so the big float tensors are generated ON DEVICE: dense
        # bf16 step time is value-independent and the tunneled host link
        # (~3-50 MB/s WAN) turns a 1.7 GB upload into 1-10 min of setup —
        # round 2's rc=124 was exactly that. OSTPU_BENCH_UPLOAD=1 restores
        # the full host-upload path. Warmup forced by a readback; then
        # chained device-resident steps (out_sample feeds the next step's
        # sample, like a real diffusion loop).
        dt_ms, out_probe = _time_unet_session(s, inputs, n_iter=10 if _TINY else 100)
        setup_s = time.time() - t_start
        _mark("warmup+steady done")

        # peak HBM (XLA buffer-assignment accounting; allocator memory_stats
        # is unavailable over the tunnel). Pure compiler introspection, no
        # transfers.
        stats = s.hbm_stats()
        peak_hbm_mb = round(stats.get("peak_bytes_in_use", 0) / (1 << 20), 1)

        result = {
            "metric": "sd15_unet_step_ms",
            "value": round(dt_ms, 2),
            "unit": "ms",
            "vs_baseline": round(BASELINE_UNET_MS / dt_ms, 1),
            "peak_hbm_mb": peak_hbm_mb,
            "link_mbps": _STATE["link_mbps"],
            # self-describing weights mode: synthetic-device (default; dense
            # bf16 timing is value-independent) vs uploaded
            # (OSTPU_BENCH_UPLOAD=1)
            "weights": "uploaded" if os.environ.get("OSTPU_BENCH_UPLOAD", "") == "1"
            else "synthetic-device",
        }
        if _TINY:
            result["tiny"] = True
        _STATE["result"] = result
        # headline emission: from here on the driver has a real number even
        # if every child below stalls (the watchdog re-prints it enriched).
        print(json.dumps(result), flush=True)
        print(
            f"# setup {setup_s:.0f}s, params {param_count(g)/1e6:.0f}M, ops {len(g.ops)}, "
            f"backend {jax.default_backend()}, out max|x|={float(np.abs(out_probe).max()):.3f}",
            file=sys.stderr,
            flush=True,
        )
        # release the resident UNet's HBM (1.7 GB of weights + programs)
        # before the children run: drop every device reference and collect
        s.close()
        del s, g
        import gc

        gc.collect()
    except Exception as e:
        import traceback

        traceback.print_exc(file=sys.stderr)
        result = {
            "metric": "sd15_unet_step_ms",
            "value": None,
            "unit": "ms",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:400],
            "error_stage": _STATE["stage"],
            "marks": _STATE["marks"][-10:],
        }
        if _STATE["link_mbps"] is not None:
            result["link_mbps"] = _STATE["link_mbps"]
        _STATE["result"] = result
        print(json.dumps(result), flush=True)

    link_mbps = _STATE["link_mbps"]

    if _TINY:
        # tiny mode exists for the emission CI test: the children measure
        # full-size models and have their own coverage
        final = _best_known()
        final["children"] = "skipped (tiny mode)"
        print(json.dumps(final), flush=True)
        _STATE["done"] = True
        return

    def _remaining() -> float:
        return total_budget_s - (time.time() - t_start)

    def _inproc(fn, *args, deadline_margin: float = 25.0):
        """Run a measurement IN-PROCESS. A fresh subprocess pays the axon
        tunnel's first-transfer handshake again (measured 30-167 s — more
        than either child's real work); this process already paid it during
        the link probe. Exceptions degrade to an error dict so the enriched
        line always prints. The SIGALRM alarm bounds a child that stalls in
        PYTHON-level work (loops, host math — it fired in round 3's
        tinyllama child); a child blocked inside a NATIVE transfer call
        cannot be interrupted by any signal handler (a handler runs only
        between bytecodes — tests/test_watchdog_native.py) and is bounded
        by the process watchdog thread instead, which prints the best-known
        enriched record and exits 0."""
        import signal

        budget = _remaining() - deadline_margin
        if budget <= 5:
            return {"skipped": "budget"}

        state = {"finished": False}

        def _on_alarm(signum, frame):
            # no-op once fn returned: the alarm can otherwise fire in the
            # window between completion and alarm(0), discarding a finished
            # measurement (or escaping from the finally block)
            if not state["finished"]:
                raise TimeoutError(f"child soft-deadline after {budget:.0f}s")

        prev = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(int(budget))
        try:
            r = fn(*args)
            state["finished"] = True
            return r
        except TimeoutError as e:
            return {"skipped": str(e)}
        except Exception as e:
            return {"error": f"{type(e).__name__}: {e}"[:400]}
        finally:
            state["finished"] = True
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)

    # Optional enrichment children, each individually skippable, sharing the
    # remaining budget, each recorded in _STATE the moment it completes (so
    # a watchdog line carries every finished child). Order by link
    # sensitivity (VERDICT r4 #2): the streamed child is the only one that
    # moves real weight bytes across the link — on a fast hour it goes first
    # (before the hour turns), otherwise the device-synthesized children
    # (TinyLlama ~70 s warm, whisper ~60-90 s warm) bank their numbers first
    # and the streamed child self-skips if the link can't carry its minimum
    # 2-segment prefix.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
    try:
        from measure import (llm_bench_result, sdxl_bench_result,
                             whisper_bench_result, yolo_bench_result)
    except Exception as e:  # headline already printed; degrade, don't die
        note = {"error": f"measure import failed: {type(e).__name__}: {e}"[:300]}
        _STATE["children"] = {k: note for k in
                              ("tinyllama", "whisper", "yolo", "sdxl")}
        print(json.dumps(_best_known()), flush=True)
        _STATE["done"] = True
        return

    fast_link = link_mbps is not None and link_mbps >= 8.0

    def child_llm():
        if _remaining() > 90:
            _STATE["children"]["tinyllama"] = _inproc(llm_bench_result)
        else:
            _STATE["children"]["tinyllama"] = {"skipped": "budget"}
        _mark("tinyllama child done")

    def child_streamed():
        if _remaining() > 150:
            _STATE["children"]["streamed"] = _inproc(
                _streamed_measure, _remaining() - 30.0)
        else:
            _STATE["children"]["streamed"] = {"skipped": "budget"}
        _mark("streamed child done")

    def child_whisper():
        if _remaining() > 80:
            _STATE["children"]["whisper"] = _inproc(whisper_bench_result)
        else:
            _STATE["children"]["whisper"] = {"skipped": "budget"}
        _mark("whisper child done")

    def child_yolo():
        # the one REAL-checkpoint number available: the reference checkout's
        # actual YOLOv8n fp32 weights (~12 MB upload, cheap even on slow
        # hours; self-skips if the checkout is absent)
        if _remaining() > 50:
            _STATE["children"]["yolo"] = _inproc(yolo_bench_result)
        else:
            _STATE["children"]["yolo"] = {"skipped": "budget"}
        _mark("yolo child done")

    def child_sdxl():
        # the reference's flagship capability claim (SDXL on a Pi Zero 2):
        # the same step here is one jitted program with flash attention at
        # 16k/4k-token sequences; ~50-100 s warm (device-synth weights)
        if _remaining() > 120:
            _STATE["children"]["sdxl"] = _inproc(sdxl_bench_result)
        else:
            _STATE["children"]["sdxl"] = {"skipped": "budget"}
        _mark("sdxl child done")

    def child_batch():
        if _remaining() > 100:
            _STATE["children"]["batch"] = _inproc(_batch_measure, 4)
        else:
            _STATE["children"]["batch"] = {"skipped": "budget"}
        _mark("batch child done")

    if fast_link:
        order = [child_streamed, child_llm, child_yolo, child_whisper,
                 child_sdxl, child_batch]
    else:
        order = [child_llm, child_streamed, child_yolo, child_whisper,
                 child_sdxl, child_batch]
    for child in order:
        child()

    # Enriched re-print: same headline keys plus the children; the driver
    # parses the LAST JSON line, so this (or the watchdog's line) is the
    # record.
    print(json.dumps(_best_known()), flush=True)
    _STATE["done"] = True


def supervisor_main() -> None:
    """Device-free supervisor (the default `python bench.py` entry).

    Spawns device_main as a killable subprocess, relays its stdout (JSON
    lines) and stderr (stage marks) verbatim, and enforces ONE extra policy
    the child cannot enforce on itself: a per-stage deadline on the early
    link stages ("link handshake", "link probe"), where every observed dead
    hour stalls. A thread blocked inside a native PJRT transfer cannot be
    interrupted in-process (tests/test_watchdog_native.py), but a CHILD
    PROCESS can be SIGKILLed — and since the tunnel's state flips at
    sub-hour granularity (observed alive->dead within a minute, 2026-08-20),
    a fresh attempt after a kill can land on a recovered link and still
    capture the headline. Past the link stages, stalls are the child's own
    watchdog's job (stage durations there legitimately reach 180-400 s on
    slow-but-live hours — a supervisor deadline would kill good runs).

    The parent does NO device work, so its own watchdog (armed at the total
    budget) always fires; rc is 0 on every path and the last stdout line is
    always parseable."""
    t0 = time.time()
    total_s = float(os.environ.get("OSTPU_BENCH_TOTAL_S", "540"))
    stage_deadline_s = float(os.environ.get("OSTPU_BENCH_LINK_STAGE_S", "210"))
    retry_min_s = float(os.environ.get("OSTPU_BENCH_RETRY_MIN_S", "240"))

    st = {
        "last_json": None,   # last parseable line the child printed
        "stage": "spawn",
        "stage_t": time.time(),
        "attempts": 0,
        "kills": [],
        "done": False,
    }

    print(json.dumps({
        "metric": "sd15_unet_step_ms",
        "value": None,
        "unit": "ms",
        "vs_baseline": None,
        "provisional": "bench supervisor started; superseded by later lines",
    }), flush=True)

    def _emit_final(note: str) -> None:
        out = dict(st["last_json"] or {
            "metric": "sd15_unet_step_ms", "value": None, "unit": "ms",
            "vs_baseline": None,
        })
        if (out.get("value") is None and "skipped" not in out
                and "error" not in out):
            # the child never got past its provisional line: name the stage
            out["skipped"] = f"stalled at {st['stage']}"
            out.pop("provisional", None)
        out["supervisor"] = note
        print(json.dumps(out), flush=True)

    def _watchdog():
        while not st["done"]:
            if time.time() - t0 >= total_s - 5:
                _emit_final(
                    f"parent watchdog at t+{time.time() - t0:.0f}s, "
                    f"attempts={st['attempts']}, kills={st['kills']}")
                sys.stdout.flush()
                sys.stderr.flush()
                os._exit(0)
            time.sleep(0.5)

    if os.environ.get("OSTPU_BENCH_NO_WATCHDOG", "") != "1":
        threading.Thread(target=_watchdog, daemon=True,
                         name="bench-supervisor-watchdog").start()

    # every stage from spawn through the probe is "early": a stall there is
    # a dead link/backend (jax import itself is bounded CPU work; backend
    # INIT can block on the tunnel before any link mark prints)
    link_stages = ("child spawned", "jax imported", "link handshake",
                   "link probe")
    me = os.path.abspath(__file__)
    while True:
        st["attempts"] += 1
        remaining = total_s - (time.time() - t0)
        env = dict(os.environ)
        # the child self-watchdogs inside the budget the parent gives it
        env["OSTPU_BENCH_TOTAL_S"] = str(max(30.0, remaining - 10.0))
        proc = subprocess.Popen(
            [sys.executable, me, "--device-child"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, bufsize=1,
        )
        st["stage"] = "child spawned"
        st["stage_t"] = time.time()

        def _pump_out(p=proc):
            for line in p.stdout:
                line = line.rstrip("\n")
                if line.startswith("{"):
                    try:
                        st["last_json"] = json.loads(line)
                    except Exception:
                        pass
                print(line, flush=True)

        def _pump_err(p=proc):
            import re

            # only true stage marks ("# bench <stage> t+NNs") move the stage
            # tracker; other "# bench" diagnostics must not reset the clock
            mark_re = re.compile(r"^# bench (.+) t\+\d+s$")
            for line in p.stderr:
                line = line.rstrip("\n")
                m = mark_re.match(line)
                if m:
                    st["stage"] = m.group(1)
                    st["stage_t"] = time.time()
                print(line, file=sys.stderr, flush=True)

        to = threading.Thread(target=_pump_out, daemon=True)
        te = threading.Thread(target=_pump_err, daemon=True)
        to.start()
        te.start()

        killed = False
        while proc.poll() is None:
            time.sleep(0.25)
            in_link = any(st["stage"].startswith(s) for s in link_stages)
            stage_age = time.time() - st["stage_t"]
            budget_left = total_s - (time.time() - t0)
            if in_link and stage_age > stage_deadline_s and budget_left > retry_min_s:
                proc.kill()
                killed = True
                break
        to.join(5)
        te.join(5)
        if not killed:
            # the child exited on its own: its final line is the record
            st["done"] = True
            lj = st["last_json"] or {}
            if proc.returncode != 0:
                _emit_final(f"child exited rc={proc.returncode}")
            elif "provisional" in lj or not lj:
                # rc=0 but nothing beyond the provisional line ever printed —
                # still guarantee a self-explaining last line
                _emit_final(
                    f"child exited rc=0 without a record at stage '{st['stage']}'")
            elif st["kills"]:
                # note the earlier retries on the child's final record
                _emit_final(
                    f"child done after {st['attempts']} attempts "
                    f"(kills={st['kills']})")
            return
        st["kills"].append(
            f"attempt {st['attempts']} stalled {stage_deadline_s:.0f}s "
            f"at '{st['stage']}' (killed t+{time.time() - t0:.0f}s)")
        print(f"# supervisor: {st['kills'][-1]}; retrying",
              file=sys.stderr, flush=True)


def main() -> None:
    if "--streamed-child" in sys.argv:
        streamed_child()
        return
    if "--device-child" in sys.argv:
        device_main()
        return
    supervisor_main()


if __name__ == "__main__":
    main()
