"""Emission-guarantee CI for bench.py (VERDICT r4 next-round #1).

Round 4's driver artifact was rc=124/parsed:null: the headline's first
forced device execution blocked inside a native transfer and nothing had a
deadline on it. The restructured bench.py must yield rc=0 plus a parseable
JSON line on EVERY hour — proved here by injecting a never-returning native
stall (OSTPU_FAULT_STALL) at the exact stage round 4 died and asserting the
watchdog thread still produced a clean, parseable exit.

Runs the real `python bench.py` in a subprocess on the CPU backend with the
tiny UNet config (OSTPU_BENCH_TINY=1) so the test fits the fast tier.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env: dict, timeout: float):
    env = dict(os.environ)
    env.pop("OSTPU_TPU_TESTS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["OSTPU_BENCH_TINY"] = "1"
    env.update(extra_env)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, capture_output=True, text=True, timeout=timeout, env=env,
    )
    dt = time.time() - t0
    parsed = [json.loads(ln) for ln in r.stdout.splitlines() if ln.startswith("{")]
    return r, parsed, dt


def test_injected_native_stall_still_yields_rc0_and_json():
    """Fault injection at 'unet program ready' — the stage whose successor
    (the first forced execution) hung round 4. The injected block re-enters
    poll(2) on EINTR, so no signal-based guard can end it; only the watchdog
    thread's os._exit(0) can, and it must emit the best-known record first."""
    budget = 40.0
    r, parsed, dt = _run_bench(
        {
            "OSTPU_FAULT_STALL": "unet program ready",
            "OSTPU_BENCH_TOTAL_S": str(budget),
            "OSTPU_BENCH_WATCHDOG_MARGIN_S": "5",
        },
        timeout=240,
    )
    assert r.returncode == 0, f"rc={r.returncode}, stderr tail: {r.stderr[-800:]}"
    assert parsed, f"no JSON line; stdout={r.stdout!r}"
    last = parsed[-1]
    assert last["metric"] == "sd15_unet_step_ms"
    # the stall happened before any measurement, so value must be honest-null
    # with the stalled stage named, and the watchdog must self-identify
    assert last["value"] is None
    assert "stalled at" in last.get("skipped", ""), last
    assert "watchdog" in last, last
    assert "marks" in last and last["marks"], last
    # the watchdog, not the driver-side timeout, ended the process: total
    # wall is bounded by the budget (+ slack for interpreter startup/compile)
    assert dt < budget + 60, f"bench lived {dt:.0f}s past its {budget:.0f}s budget"


def test_injected_raise_still_yields_rc0_and_error_record():
    """Fault injection of the RAISE failure shape (PJRT init refused /
    transfer error instead of a block): the headline try/except must degrade
    to an error record — rc=0, value honest-null, the raising stage named —
    rather than rc=1 with only the provisional line. Children then run and
    are expected to finish (CPU backend is healthy here); the final line must
    still be the enriched record carrying the headline's error."""
    r, parsed, _ = _run_bench(
        {
            "OSTPU_FAULT_RAISE": "session built",
            "OSTPU_BENCH_TOTAL_S": "120",
            "OSTPU_BENCH_WATCHDOG_MARGIN_S": "5",
        },
        timeout=300,
    )
    assert r.returncode == 0, f"rc={r.returncode}, stderr tail: {r.stderr[-800:]}"
    assert parsed, f"no JSON line; stdout={r.stdout!r}"
    last = parsed[-1]
    assert last["metric"] == "sd15_unet_step_ms"
    assert last["value"] is None
    assert "fault injected" in last.get("error", ""), last
    assert last.get("error_stage") == "session built", last
    assert "link_mbps" in last, last


def test_supervisor_kills_and_retries_dead_link():
    """A permanently dead link: the child wedges at 'link handshake' (an
    uninterruptible native block), the supervisor kills it on the link-stage
    deadline and retries with fresh processes while budget remains, and the
    run still ends rc=0 with a record naming the stalled stage and the
    supervisor's attempts."""
    r, parsed, dt = _run_bench(
        {
            "OSTPU_FAULT_STALL": "link handshake",
            "OSTPU_BENCH_LINK_STAGE_S": "3",
            "OSTPU_BENCH_RETRY_MIN_S": "40",
            "OSTPU_BENCH_TOTAL_S": "75",
            "OSTPU_BENCH_WATCHDOG_MARGIN_S": "5",
        },
        timeout=300,
    )
    assert r.returncode == 0, f"rc={r.returncode}, stderr tail: {r.stderr[-800:]}"
    last = parsed[-1]
    assert last["value"] is None
    assert "stalled at link" in last.get("skipped", ""), last
    assert "supervisor" in last or "watchdog" in last, last
    assert "supervisor: attempt" in r.stderr, r.stderr[-800:]
    assert dt < 75 + 60, f"lived {dt:.0f}s past the budget"


def test_supervisor_retry_catches_mid_budget_recovery(tmp_path):
    """The link state flips at sub-hour granularity; an hour that STARTS
    dead must not be forfeited. Attempt 1 wedges at the handshake and is
    killed; by attempt 2 the (simulated) link has recovered, the tiny
    headline completes normally, and the final record carries both the real
    value and the supervisor's kill history."""
    import threading

    sentinel = tmp_path / "link-recovered"

    def _recover():
        time.sleep(8.0)  # after attempt 1 reaches the handshake stage
        sentinel.write_text("up")

    th = threading.Thread(target=_recover, daemon=True)
    th.start()
    r, parsed, _ = _run_bench(
        {
            "OSTPU_FAULT_STALL_UNTIL": f"link handshake:{sentinel}",
            "OSTPU_BENCH_LINK_STAGE_S": "3",
            "OSTPU_BENCH_RETRY_MIN_S": "30",
            "OSTPU_BENCH_TOTAL_S": "420",
        },
        timeout=480,
    )
    th.join()
    assert r.returncode == 0, f"rc={r.returncode}, stderr tail: {r.stderr[-800:]}"
    last = parsed[-1]
    assert isinstance(last["value"], (int, float)) and last["value"] > 0, last
    assert "attempts" in last.get("supervisor", ""), last
    assert "supervisor: attempt" in r.stderr, r.stderr[-800:]


def test_clean_tiny_run_emits_headline():
    """No fault: the tiny headline must complete with a real value, the link
    probe must be recorded, and children must be explicitly skipped (tiny
    mode), all with rc=0."""
    r, parsed, _ = _run_bench({"OSTPU_BENCH_TOTAL_S": "420"}, timeout=480)
    assert r.returncode == 0, f"rc={r.returncode}, stderr tail: {r.stderr[-800:]}"
    assert parsed
    first, last = parsed[0], parsed[-1]
    # provisional line first (pre-device insurance), real value last
    assert first["value"] is None and "provisional" in first
    assert isinstance(last["value"], (int, float)) and last["value"] > 0
    assert last["vs_baseline"] > 0
    assert "link_mbps" in last and last["link_mbps"] > 0
    assert last["children"] == "skipped (tiny mode)"
    assert last.get("tiny") is True
