#!/usr/bin/env python3
"""Parse Spark event logs into a per-stage wall/CPU table for scaling diagnosis.

Usage: python scripts/stage_profile.py /tmp/fts-events/<app-log> [...]

Accepts single-file event logs and v2 rolling log directories. For each
completed stage prints: stage id, task count, wall time (completion -
submission), summed executor run time, and summed GC time. Comparing two
app logs (1-executor vs 4-executor run of scripts/cluster_job.py) shows
which stages fail to scale: a stage whose wall time is the same at both
levels is serial or constant-overhead; one whose wall shrinks 4x is
perfectly parallel.
"""

from __future__ import annotations

import json
import os
import sys


def _lines(path: str):
    # v2 rolling event logs are a directory of events_* part files
    paths = [path]
    if os.path.isdir(path):
        paths = sorted(
            os.path.join(path, p) for p in os.listdir(path) if p.startswith("events_")
        )
    for p in paths:
        if p.endswith(".zstd"):
            import subprocess

            out = subprocess.run(["zstd", "-dc", p], capture_output=True, text=True)
            yield from out.stdout.splitlines()
        else:
            with open(p, errors="replace") as f:
                yield from f


def profile(path: str) -> list[dict]:
    stages: dict[tuple[int, int], dict] = {}
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerStageCompleted":
            info = ev["Stage Info"]
            key = (info["Stage ID"], info["Stage Attempt ID"])
            sub = info.get("Submission Time")
            com = info.get("Completion Time")
            stages.setdefault(key, {"run_ms": 0, "tasks": 0, "gc_ms": 0, "deser_ms": 0})
            stages[key].update(
                name=info["Stage Name"].split("\n")[0][:60],
                wall_ms=(com - sub) if sub and com else None,
            )
        elif kind == "SparkListenerTaskEnd":
            key = (ev["Stage ID"], ev["Stage Attempt ID"])
            s = stages.setdefault(key, {"run_ms": 0, "tasks": 0, "gc_ms": 0, "deser_ms": 0})
            m = ev.get("Task Metrics") or {}
            s["run_ms"] += m.get("Executor Run Time", 0)
            s["gc_ms"] += m.get("JVM GC Time", 0)
            s["deser_ms"] += m.get("Executor Deserialize Time", 0)
            s["tasks"] += 1
    return [{"stage": sid, "attempt": att, **s} for (sid, att), s in sorted(stages.items())]


def main() -> None:
    for path in sys.argv[1:]:
        print(f"== {path}")
        rows = profile(path)
        total_wall = sum(r.get("wall_ms") or 0 for r in rows)
        print(f"{'stage':>5} {'tasks':>5} {'wall_s':>8} {'cpu_s':>8} {'gc_s':>6}  name")
        for r in rows:
            if (r.get("wall_ms") or 0) < 200:
                continue
            print(
                f"{r['stage']:>5} {r['tasks']:>5} {(r.get('wall_ms') or 0) / 1e3:>8.1f} "
                f"{r['run_ms'] / 1e3:>8.1f} {r['gc_ms'] / 1e3:>6.1f}  {r.get('name', '?')}"
            )
        print(f"total stage wall: {total_wall / 1e3:.1f}s over {len(rows)} stages")


if __name__ == "__main__":
    main()
