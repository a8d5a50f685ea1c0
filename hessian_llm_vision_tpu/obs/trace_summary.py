"""Summarize a jax.profiler trace without TensorBoard.

The reference's only profiling was wall-clock prints (SURVEY.md §5);
``obs.timing.profile_trace`` captures real device timelines, and this
reads them back headlessly — the loop for "profile, find the hot op,
fix, re-profile" on machines with no TensorBoard UI.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Optional, Tuple


def find_trace_file(logdir: str) -> Optional[str]:
    """Newest ``*.trace.json.gz`` under a profile_trace logdir."""
    hits = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    )
    return hits[-1] if hits else None


def summarize_trace(
    path_or_logdir: str, top: int = 20, device_only: bool = True
) -> List[Tuple[str, float, float]]:
    """Aggregate op durations: returns [(name, total_ms, pct), ...].

    ``device_only=True`` keeps events from device (TPU/GPU) process rows,
    dropping host-side Python/compile noise.
    """
    path = (
        path_or_logdir
        if path_or_logdir.endswith(".gz")
        else find_trace_file(path_or_logdir)
    )
    if path is None:
        raise FileNotFoundError(f"no trace under {path_or_logdir!r}")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    pid_names: Dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "?")

    def keep(e) -> bool:
        if e.get("ph") != "X" or "dur" not in e:
            return False
        if not device_only:
            return True
        name = pid_names.get(e.get("pid"), "")
        return "TPU" in name.upper() or "GPU" in name.upper() or "device" in name

    agg = collections.Counter()
    for e in events:
        if keep(e):
            agg[e.get("name", "?")] += e["dur"]
    total = sum(agg.values()) or 1
    return [
        (name, dur / 1e3, 100.0 * dur / total)
        for name, dur in agg.most_common(top)
    ]


def print_trace_summary(path_or_logdir: str, top: int = 20) -> None:
    rows = summarize_trace(path_or_logdir, top=top)
    for name, ms, pct in rows:
        print(f"{ms:10.2f} ms  {pct:5.1f}%  {name[:90]}")
