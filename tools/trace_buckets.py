"""Summarize a jax.profiler trace directory into per-op device-time buckets.

Companion to tools/profile_scan.py / profile_unet.py --trace: reads the
perfetto JSON the profiler writes (vm.trace.json.gz), keeps only events on
the TPU lane, and prints total device ms per op name — the table format the
scoreboard conclusions in docs/tpu_notes.md are quoted in.

Usage: python tools/trace_buckets.py /tmp/scan_trace [--top N]
"""

import collections
import glob
import gzip
import json
import os
import sys


def summarize(trace_dir: str, top: int = 25) -> list:
    files = glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                                   "*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    d = json.load(gzip.open(sorted(files)[-1]))
    evs = d.get("traceEvents", [])
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e.get("pid"), ""):
            nm = e.get("name", "")
            tot[nm] += e["dur"]
            cnt[nm] += 1
    rows = [(us / 1e3, cnt[nm], nm) for nm, us in tot.most_common(top)]
    return rows


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scan_trace"
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 25
    for ms, n, nm in summarize(trace_dir, top):
        print(f"{ms:9.2f} ms  x{n:5d}  {nm[:70]}")


if __name__ == "__main__":
    main()
