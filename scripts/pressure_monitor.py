#!/usr/bin/env python
"""Box-pressure sampler for bench forensics (VERDICT r8 #7 / r9 #7).

Samples /proc/pressure/{cpu,io,memory} (PSI), /proc/loadavg and
/proc/stat steal time every --interval seconds into a JSONL file, and
— when CPU PSI some/avg10 crosses --jstack-threshold while a JVM is up
— captures one jstack of the highest-CPU java process (first trigger
only, so the capture is of the degraded moment, not a flood).

Usage (alongside a bench run):
  python scripts/pressure_monitor.py --out /tmp/pressure.jsonl &
  MON=$!; python bench.py; kill $MON

The round-8/9 question this answers: the degraded bench phases (up to
2.3x the quiet band, zero JVM errors, uniform per-query inflation)
were INFERRED to be VM steal — the PSI series plus steal counters
either confirm that (high steal, low io/memory pressure) or point at
the real contender (io pressure -> page cache, memory pressure ->
GC/THP, cpu some with low steal -> a co-tenant process on the box).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def read_psi(kind: str) -> dict[str, float]:
    out: dict[str, float] = {}
    try:
        with open(f"/proc/pressure/{kind}") as fh:
            for line in fh:
                parts = line.split()
                scope = parts[0]  # some | full
                for kv in parts[1:]:
                    k, v = kv.split("=")
                    if k in ("avg10", "avg60"):
                        out[f"{scope}_{k}"] = float(v)
    except OSError:
        pass
    return out


def read_steal() -> int | None:
    """Cumulative steal jiffies from /proc/stat (field 8 of the cpu
    line) — the direct hypervisor-steal counter PSI cannot see."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        return int(f[8]) if len(f) > 8 else None
    except (OSError, ValueError, IndexError):
        return None


def top_java_pid() -> int | None:
    try:
        out = subprocess.run(
            ["ps", "-C", "java", "-o", "pid=,pcpu=", "--sort=-pcpu"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.split()
        return int(out[0]) if out else None
    except (OSError, ValueError, subprocess.TimeoutExpired):
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--interval", type=float, default=2.0)
    ap.add_argument("--jstack-threshold", type=float, default=25.0,
                    help="CPU PSI some/avg10 %% that triggers one jstack")
    ap.add_argument("--jstack-out", default=None)
    args = ap.parse_args()

    jstack_done = False
    with open(args.out, "w") as fh:
        while True:
            row = {
                "t": time.time(),
                "loadavg": os.getloadavg(),
                "cpu": read_psi("cpu"),
                "io": read_psi("io"),
                "memory": read_psi("memory"),
                "steal_jiffies": read_steal(),
            }
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            if (
                not jstack_done
                and args.jstack_out
                and row["cpu"].get("some_avg10", 0.0) >= args.jstack_threshold
            ):
                pid = top_java_pid()
                if pid:
                    try:
                        dump = subprocess.run(
                            ["jstack", str(pid)],
                            capture_output=True,
                            text=True,
                            timeout=30,
                        ).stdout
                        with open(args.jstack_out, "w") as jf:
                            jf.write(dump)
                        jstack_done = True
                    except (OSError, subprocess.TimeoutExpired):
                        pass
            time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    sys.exit(main())
