"""Supervised runner for the bench quality phase on a tunneled TPU.

The dev tunnel's transport can drop a connection mid-run; the PJRT client
then reconnects but the in-flight op's completion is lost and the process
blocks forever (observed twice on 2026-08-19: once inside a checkpoint
save, once at a plain training step — zero CPU, no socket or a fresh
reconnected socket, metrics log frozen).  Training itself is
epoch-resumable (TrainLoop + orbax best/preempt checkpoints), so the robust
shape is external: launch ``bench.py --phase quality``, watch for progress
(child stdout/stderr growth, the workdir metric log, checkpoint dir
mtimes), kill on stall, relaunch — the child resumes from the last saved
epoch and, near the deadline, degrades to evaluating the best checkpoint
as-is (bench.py's budget guard).

Usage:
    python benchmarks/supervise_quality.py --deadline-ts <unix ts> \
        [--stall-s 720] [--out /tmp/qscale.json] [--log /tmp/qscale.log]

Scale comes from the persistent q_scale.json manifest plus any
GDR_BENCH_Q_* env vars already exported, exactly like a direct phase run.
"""

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.environ.get(
    "GDR_BENCH_STATE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "gdr_bench_state"))


def _full_scale_glob(*parts: str) -> list:
    """Paths under every full-scale quality workdir (q[0-9]*_* — the
    semantic-key q6 prefix and the legacy source-hash q5 — except *_tiny*)."""
    out = []
    for wd in glob.glob(os.path.join(STATE, "q[0-9]*_*")):
        if "_tiny" in os.path.basename(wd):
            continue
        out += glob.glob(os.path.join(wd, *parts))
    return out


def newest_progress_ts(out_path: str, log_path: str) -> float:
    """Newest mtime across everything the child updates while healthy."""
    # tiny-mode exclusion: concurrent CPU-smoke runs share the state dir and
    # their mtimes must not mask a stall of the supervised full-scale child
    # (any non-tiny preset — base, small, ... — is the supervised run's)
    paths = [out_path, log_path]
    paths += _full_scale_glob("train.metrics.jsonl")
    paths += _full_scale_glob("ckpt*", "*")
    ts = 0.0
    for p in paths:
        try:
            ts = max(ts, os.path.getmtime(p))
        except OSError:
            pass
    return ts


def _has_resumable_ckpt(since: float = 0.0) -> bool:
    """True when any quality workdir holds a FINALIZED orbax step dir
    (an entry not suffixed ``-tmp``) written at/after ``since`` — i.e. a
    kill would resume THIS supervised run, not restart it from zero.
    ``since`` guards against stale checkpoints from a different operating
    point (e.g. an abandoned 334k workdir while supervising a 50k run):
    counting those once shrank the stall threshold to the with-checkpoint
    value and killed the run mid-compile, losing the whole prep."""
    for step_dir in _full_scale_glob("ckpt*", "*"):
        if os.path.isdir(step_dir) and \
                not step_dir.endswith("-tmp") and os.listdir(step_dir):
            try:
                if os.path.getmtime(step_dir) >= since:
                    return True
            except OSError:
                pass
    return False


def _cpu_jiffies(pid: int) -> int:
    """utime+stime of pid from /proc/<pid>/stat (0 when gone)."""
    try:
        with open(f"/proc/{pid}/stat") as fh:
            rest = fh.read().rsplit(")", 1)[1].split()
        return int(rest[11]) + int(rest[12])
    except (OSError, IndexError, ValueError):
        return 0


def last_json_line(path: str) -> dict:
    out: dict = {}
    try:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out.update(json.loads(line))
                    except ValueError:
                        pass
    except OSError:
        pass
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-ts", type=float, required=True,
                    help="absolute unix deadline for the WHOLE supervised "
                         "run (passed to each child as its phase deadline)")
    ap.add_argument("--stall-s", type=float, default=720.0,
                    help="kill the child after this long with no progress "
                         "signal.  Must exceed the longest LEGITIMATE "
                         "silent window: a fresh program's cold compile "
                         "through the tunnel (observed ~8 min for the "
                         "expansion/decfuse evaluators — 420 s killed two "
                         "such compiles mid-flight, and a killed compile "
                         "never reaches the persistent cache)")
    ap.add_argument("--stall-s-no-ckpt", type=float, default=960.0,
                    help="stall threshold while NO resumable checkpoint "
                         "exists yet: a kill then restarts training from "
                         "zero, while observed tunnel outages self-recover "
                         "in ~12 min — waiting dominates killing")
    ap.add_argument("--out", default="/tmp/qscale_supervised.json")
    ap.add_argument("--log", default="/tmp/qscale_supervised.log")
    args = ap.parse_args()
    t_start = time.time()

    attempt = 0
    while time.time() < args.deadline_ts - 120:
        attempt += 1
        # tunnel preflight: during an outage (observed: full minutes with
        # even `jax.devices()` hanging) don't burn an attempt + stall
        # window per relaunch — wait for the device to answer first
        while time.time() < args.deadline_ts - 120:
            try:
                probe = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; jax.devices(); "
                     "import jax.numpy as jnp; "
                     "print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))"],
                    capture_output=True, timeout=90, env=os.environ)
                if probe.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            print("[supervisor] tunnel probe failed — waiting 60s",
                  flush=True)
            time.sleep(60)
        env = {**os.environ,
               "GDR_BENCH_DEADLINE_TS": str(args.deadline_ts)}
        out_f = open(args.out, "a")
        log_f = open(args.log, "a")
        log_f.write(f"\n=== attempt {attempt} at {time.ctime()} ===\n")
        log_f.flush()
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--phase", "quality"],
            stdout=out_f, stderr=log_f, env=env, cwd=REPO)
        stalled = False
        # A cold compile through the tunnel is 8-10 min of FILE silence but
        # burns host CPU continuously; the tunnel-hang failure mode this
        # stall detector exists for shows ZERO child CPU.  Count CPU
        # activity as progress so long compiles survive (720 s killed two
        # expansion-evaluator compiles mid-flight on 2026-08-20, each kill
        # also dropping the latest orbax steps).
        #
        # "Activity" needs a RATE floor: a child blocked on a dead tunnel
        # still trickles ~2 jiffies per 20 s (PJRT client polling threads),
        # and any-increment detection reset the clock forever — a hung
        # child was kept alive through a full outage on 2026-08-20.  A
        # compile burns ~100% of the single core (~2000 jiffies/20 s);
        # MIN_ACTIVE_JIFFIES=50 (2.5% CPU) separates the two regimes.
        MIN_ACTIVE_JIFFIES = 50
        prev_jiffies = _cpu_jiffies(proc.pid)
        last_cpu_active = time.time()
        while proc.poll() is None:
            time.sleep(20)
            jiffies = _cpu_jiffies(proc.pid)
            if jiffies - prev_jiffies >= MIN_ACTIVE_JIFFIES:
                last_cpu_active = time.time()
            prev_jiffies = jiffies
            idle = time.time() - max(newest_progress_ts(args.out, args.log),
                                     last_cpu_active)
            stall_s = (args.stall_s if _has_resumable_ckpt(since=t_start)
                       else args.stall_s_no_ckpt)
            if idle > stall_s:
                print(f"[supervisor] attempt {attempt}: no progress for "
                      f"{idle:.0f}s — killing pid {proc.pid}", flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=30)
                stalled = True
                break
            if time.time() > args.deadline_ts + 300:
                print("[supervisor] hard deadline overrun — killing",
                      flush=True)
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=30)
                stalled = True
                break
        out_f.close()
        log_f.close()
        summary = last_json_line(args.out)
        if not stalled and proc.returncode == 0 and \
                "quality_recall10" in summary:
            print(f"[supervisor] done after {attempt} attempt(s): "
                  f"{json.dumps(summary)}", flush=True)
            return 0
        print(f"[supervisor] attempt {attempt} ended (rc={proc.returncode}, "
              f"stalled={stalled}); fields so far: {len(summary)} — "
              f"{'relaunching' if time.time() < args.deadline_ts - 120 else 'out of time'}",
              flush=True)
        time.sleep(10)
    print(f"[supervisor] deadline reached; best summary: "
          f"{json.dumps(last_json_line(args.out))}", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
