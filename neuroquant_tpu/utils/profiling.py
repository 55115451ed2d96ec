"""Profiling helpers — the TPU-native replacement for the reference's manual
wall-clock timers (SURVEY §5: per-frame decode time via cuda.synchronize,
scale-init/alpha-init/cached-data/epoch timers).

`profile_trace` wraps a region in a jax.profiler trace (works through the
tunneled axon backend; parse with `summarize_trace` or load in TensorBoard).
`Timer` reproduces the reference's logged counters.
"""

from __future__ import annotations

import contextlib
import logging
import time


class Timer:
    """Wall-clock timer logging like the reference's counters."""

    def __init__(self, label: str, log_fn=logging.info):
        self.label = label
        self.log_fn = log_fn

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        self.log_fn("{}: {}".format(self.label, self.elapsed))
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace of the enclosed region (device + host timelines)."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
    logging.info("profiler trace written to %s", log_dir)


def summarize_trace(log_dir: str, top_k: int = 20) -> list:
    """Parse the newest trace in log_dir into [(ms_total, op_group), ...].

    Groups HLO ops by base name (copy/fusion/convolution/...), the quickest
    way to see whether a step is compute- or data-movement-bound.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in t["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    skip = re.compile(r"^(jit_|\d+$)")
    groups = collections.Counter()
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pids.get(e["pid"], ""):
            continue
        if skip.match(e["name"]):
            continue
        groups[re.sub(r"\.\d+", "", e["name"])] += e.get("dur", 0)
    return [(d / 1000.0, n) for n, d in groups.most_common(top_k)]
