#!/usr/bin/env python
"""Parse a Spark event log produced by scripts/profile_bench.py and print,
per job description (= registry entry), the job count, stage count, task
count, executor run/CPU time, shuffle bytes and JVM/Python boundary hints.

Usage: python scripts/parse_eventlog.py /tmp/eventlog_dir [sort_key]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def main() -> None:
    log_dir = sys.argv[1]
    sort_key = sys.argv[2] if len(sys.argv) > 2 else "task_time_ms"
    files = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".") and not f.endswith(".inprogress")
    ] or [
        os.path.join(log_dir, f) for f in os.listdir(log_dir) if not f.startswith(".")
    ]
    path = max(files, key=os.path.getmtime)
    if os.path.isdir(path):  # eventLog v2 rolling layout: a dir of event files
        inner = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_") or "eventLog" in f or f.endswith(".txt")
        ) or sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith("appstatus")
        )
        paths = inner
    else:
        paths = [path]
    sys.stderr.write(f"parsing {paths}\n")

    stage_to_desc: dict[int, str] = {}
    job_to_desc: dict[int, str] = {}
    agg = defaultdict(
        lambda: {
            "jobs": 0,
            "stages": 0,
            "tasks": 0,
            "task_time_ms": 0,
            "cpu_time_ms": 0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
            "input_mb": 0.0,
            "gc_ms": 0,
            "wall_ms": 0,
        }
    )
    job_start: dict[int, int] = {}

    import itertools

    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "<none>"
                )
                jid = ev["Job ID"]
                job_to_desc[jid] = desc
                job_start[jid] = ev.get("Submission Time", 0)
                agg[desc]["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                desc = job_to_desc.get(jid, "<none>")
                if jid in job_start:
                    agg[desc]["wall_ms"] += ev.get("Completion Time", 0) - job_start[jid]
            elif t == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                desc = stage_to_desc.get(info["Stage ID"], "<none>")
                agg[desc]["stages"] += 1
                agg[desc]["tasks"] += info.get("Number of Tasks", 0)
            elif t == "SparkListenerTaskEnd":
                desc = stage_to_desc.get(ev["Stage ID"], "<none>")
                m = ev.get("Task Metrics") or {}
                a = agg[desc]
                a["task_time_ms"] += m.get("Executor Run Time", 0)
                a["cpu_time_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                a["gc_ms"] += m.get("JVM GC Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                a["shuffle_read_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                sw = m.get("Shuffle Write Metrics") or {}
                a["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                im = m.get("Input Metrics") or {}
                a["input_mb"] += im.get("Bytes Read", 0) / 1e6

    rows = sorted(agg.items(), key=lambda kv: -kv[1][sort_key])
    hdr = (
        f"{'entry':42s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} "
        f"{'wall_s':>8s} {'task_s':>8s} {'cpu_s':>7s} {'gc_s':>5s} "
        f"{'shW_MB':>7s} {'in_MB':>7s}"
    )
    print(hdr)
    for desc, a in rows:
        print(
            f"{desc[:42]:42s} {a['jobs']:5d} {a['stages']:6d} {a['tasks']:6d} "
            f"{a['wall_ms']/1000:8.2f} {a['task_time_ms']/1000:8.2f} "
            f"{a['cpu_time_ms']/1000:7.2f} {a['gc_ms']/1000:5.2f} "
            f"{a['shuffle_write_mb']:7.2f} {a['input_mb']:7.2f}"
        )


if __name__ == "__main__":
    main()
