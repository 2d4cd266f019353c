"""Keep the quality supervisor from killing a legitimately long compile.

The supervisor (supervise_quality.py) watches file mtimes for progress and
kills the bench child after --stall-s of silence.  A FRESH program's cold
compile through the tunnel (the expansion evaluator especially) is 8-10
minutes of total file silence, which exceeds the 720 s threshold — but a
compile burns host CPU continuously, while the failure mode the stall
detector exists for (a tunnel-transport hang losing an in-flight op) shows
ZERO child CPU.  So: while the bench child's cumulative CPU time is still
increasing, refresh the supervisor's progress signal by utime()-ing its log
file; the moment the child goes CPU-idle, stop — the supervisor's normal
stall clock takes over.

Usage:
    python benchmarks/compile_heartbeat.py --log /tmp/qscale_supervised.log \
        [--until-ts <unix ts>] [--interval 60]

Run it in the background alongside the supervisor.  It re-discovers the
current ``bench.py --phase quality`` child each cycle, so it survives
supervisor relaunches.
"""

import argparse
import os
import time


def _find_bench_pid() -> int:
    """Newest live process whose cmdline is `python .../bench.py --phase
    quality` (scans /proc directly — no pgrep, no shell)."""
    best_pid, best_start = 0, -1.0
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as fh:
                argv = fh.read().split(b"\0")
            if not any(a.endswith(b"bench.py") for a in argv):
                continue
            if b"quality" not in argv:
                continue
            start = os.path.getmtime(f"/proc/{entry}")
            if start > best_start:
                best_pid, best_start = int(entry), start
        except OSError:
            continue
    return best_pid


def _cpu_jiffies(pid: int) -> int:
    """utime+stime of pid from /proc/<pid>/stat (0 when gone)."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            # comm can contain spaces/parens; split after the closing paren
            rest = fh.read().rsplit(")", 1)[1].split()
        return int(rest[11]) + int(rest[12])  # fields 14+15, 0-indexed here
    except (OSError, IndexError, ValueError):
        return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True,
                    help="supervisor progress file to utime() while the "
                         "child is CPU-active")
    ap.add_argument("--interval", type=float, default=60.0)
    ap.add_argument("--until-ts", type=float, default=0.0,
                    help="stop at this unix time (0 = run until killed)")
    args = ap.parse_args()

    last = {}  # pid -> jiffies
    while not args.until_ts or time.time() < args.until_ts:
        pid = _find_bench_pid()
        if pid:
            now = _cpu_jiffies(pid)
            prev = last.get(pid)
            last = {pid: now}
            if prev is not None and now > prev:
                try:
                    os.utime(args.log, None)
                    print(f"[heartbeat] pid {pid} cpu-active "
                          f"(+{now - prev} jiffies) — touched {args.log}",
                          flush=True)
                except OSError:
                    pass
        else:
            last = {}
        time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
