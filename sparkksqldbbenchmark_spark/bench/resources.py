"""A11 — process resource sampling during a benchmark run.

Reference parity: BenchmarkRunner.scala:96-146 samples process CPU and
memory gauges on a fixed cadence while the benchmark runs and reports
running averages alongside the latency metrics. Here the sampled tree is
the Python driver plus every descendant process (the Spark JVM and any
Python workers), read from /proc — no third-party dependency.

The sampling thread only reads /proc and appends floats; all math lives
in pure functions (cpu_percent, summarize) so the arithmetic is unit-
testable without a running benchmark.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field


def _children_map() -> dict[int, list[int]]:
    ppid_children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])  # field 4; 2 fields consumed by pid/comm
        except (OSError, IndexError, ValueError):
            continue
        ppid_children.setdefault(ppid, []).append(int(entry))
    return ppid_children


def process_tree(root_pid: int) -> list[int]:
    """root_pid plus all descendant pids (JVM, Python workers)."""
    kids = _children_map()
    out, stack = [], [root_pid]
    while stack:
        pid = stack.pop()
        out.append(pid)
        stack.extend(kids.get(pid, []))
    return out


def read_tree_counters(pids: list[int]) -> tuple[int, int]:
    """(total cpu ticks utime+stime, total RSS kB) over the pid set.
    Processes that exit between listing and reading are skipped."""
    ticks = 0
    rss_kb = 0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ticks += int(parts[11]) + int(parts[12])  # utime, stime
            with open(f"/proc/{pid}/statm") as f:
                rss_kb += int(f.read().split()[1]) * (
                    os.sysconf("SC_PAGE_SIZE") // 1024
                )
        except (OSError, IndexError, ValueError):
            continue
    return ticks, rss_kb


def cpu_percent(
    ticks0: int, ticks1: int, t0: float, t1: float, clk_tck: int
) -> float:
    """CPU busy percent of one core over the interval (can exceed 100 on
    a multi-core tree, like `top`)."""
    wall = t1 - t0
    if wall <= 0:
        return 0.0
    return (ticks1 - ticks0) / clk_tck / wall * 100.0


def summarize(cpu_pcts: list[float], rss_mbs: list[float]) -> dict:
    """Running-average + peak summary, the reference's reporting shape
    (BenchmarkRunner.scala:131-146: averaged gauges over the run)."""
    if not cpu_pcts:
        return {
            "cpu_avg_pct": 0.0,
            "cpu_peak_pct": 0.0,
            "rss_avg_mb": 0.0,
            "rss_peak_mb": 0.0,
            "samples": 0,
        }
    return {
        "cpu_avg_pct": round(sum(cpu_pcts) / len(cpu_pcts), 1),
        "cpu_peak_pct": round(max(cpu_pcts), 1),
        "rss_avg_mb": round(sum(rss_mbs) / len(rss_mbs), 1),
        "rss_peak_mb": round(max(rss_mbs), 1),
        "samples": len(cpu_pcts),
    }


@dataclass
class ResourceSampler:
    """Background /proc sampler over this process's tree.

    Usage::

        s = ResourceSampler(interval=0.5)
        s.start()
        ... run benchmark ...
        summary = s.stop()   # {"cpu_avg_pct": ..., "rss_avg_mb": ...}
    """

    interval: float = 0.5
    _cpu: list[float] = field(default_factory=list)
    _rss: list[float] = field(default_factory=list)
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def start(self) -> "ResourceSampler":
        clk = os.sysconf("SC_CLK_TCK")
        root = os.getpid()

        def loop() -> None:
            pids = process_tree(root)
            ticks0, _ = read_tree_counters(pids)
            t0 = time.monotonic()
            while not self._stop.wait(self.interval):
                pids = process_tree(root)  # workers come and go
                ticks1, rss_kb = read_tree_counters(pids)
                t1 = time.monotonic()
                self._cpu.append(cpu_percent(ticks0, ticks1, t0, t1, clk))
                self._rss.append(rss_kb / 1024.0)
                ticks0, t0 = ticks1, t1

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> dict:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        return summarize(self._cpu, self._rss)
