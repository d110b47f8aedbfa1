"""Device profiling helpers.

The reference only has wall-clock timers (utils/time_report.py) and an
optional cProfile mode (dflex/util.py ScopedTimer). On TPU the useful tool
is an XLA device trace: ``trace()`` wraps ``jax.profiler`` and
``summarize_trace()`` aggregates per-op device time from the written trace —
the workflow that drove the optimizations in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/diffrl_trace"):
    """Record an XLA device trace around a block of (blocking) device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 25):
    """Aggregate (duration, count) per op name from a recorded trace."""
    paths = glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    dur = collections.Counter()
    cnt = collections.Counter()
    with gzip.open(sorted(paths)[-1]) as f:
        for e in json.load(f).get("traceEvents", []):
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "")
                dur[name] += e["dur"]
                cnt[name] += 1
    rows = [(d / 1000.0, cnt[n], n) for n, d in dur.most_common(top)]
    for ms, c, n in rows:
        print(f"{ms:10.1f} ms  x{c:<6} {n[:100]}")
    return rows
