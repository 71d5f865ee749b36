"""Probe-gated TPU measurement queue — run a list of benches to completion
across tunnel outages.

The axon TPU tunnel goes down for hours and FLAPS (CLAUDE.md): a dead
backend HANGS the first device touch instead of erroring, and a bench
blocked mid-run on a device fetch resumes where it left off when the
tunnel recovers. The operational consequences, learned round 5 and
encoded here:

  * gate each bench on a probe that EXECUTES a jitted program in a
    bounded subprocess (enumeration alone passes on a half-dead backend
    — the BENCH_r04 signature);
  * bound each bench with a generous wall-clock ``timeout`` and do NOT
    kill apparently-stalled runs — blocked fetches resume on tunnel
    recovery, and killing wastes runs that would have finished;
  * on failure/timeout, re-probe and retry the bench from scratch on a
    later pass; sleep out down-windows between passes;
  * a bench "landed" when its stdout's last line parses as JSON
    (every bench in benchmarks/ prints one JSON line);
  * never run host-heavy work (test suites) concurrently on a small
    host — a concurrent pytest run inflated serving latencies 6-30x and
    inverted an A/B (RESULTS.md round-5). A ``--pause-file`` suspends
    the queue while present so suites can be serialized against it.

Usage:
    python tools/measure.py --out /tmp/measurements \
        "serving:1500:python benchmarks/serving_bench.py" \
        "bench:2700:env BENCH_KNEE_DEADLINE_S=1800 python bench.py"

Each spec is ``name:timeout_s:command``. Results land in
``<out>/<name>.json`` (+ ``.err`` stderr log, ``.done`` marker);
completed benches are skipped on re-invocation, so the tool is
restartable. Exit code 0 when every bench has landed.

Reference surface: the measurement loop at
/root/reference/evaluation/eval.py:110-143 (this tool is the
operational harness our benchmarks/ scripts run under in this
environment; the reference assumes an always-up local GPU).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_SRC = (
    "import jax; jax.config.update('jax_platforms','');"
    "import jax.numpy as jnp; import numpy as np;"
    "float(np.asarray(jax.jit(lambda a: a + 1)(jnp.ones(()))))"
)


def probe(timeout_s: float = 150.0) -> bool:
    """True iff the default backend EXECUTES a program within the budget.

    Runs in a subprocess because a dead tunnel hangs (uninterruptible
    from inside the process) and a wedged backend must not poison this
    orchestrator."""
    try:
        return subprocess.run(
            [sys.executable, "-c", PROBE_SRC], timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def run_bench(name: str, timeout_s: float, cmd: str, out_dir: str) -> bool:
    """One attempt at one bench; True iff a parseable JSON line landed."""
    out_p = os.path.join(out_dir, f"{name}.json")
    err_p = os.path.join(out_dir, f"{name}.err")
    with open(out_p, "w") as out_f, open(err_p, "w") as err_f:
        try:
            rc = subprocess.run(
                cmd, shell=True, timeout=timeout_s,
                stdout=out_f, stderr=err_f).returncode
        except subprocess.TimeoutExpired:
            print(f"[measure] {name}: timeout after {timeout_s:.0f}s",
                  file=sys.stderr)
            return False
    if rc != 0:
        tail = open(err_p).read()[-300:]
        print(f"[measure] {name}: rc={rc}; stderr tail: {tail!r}",
              file=sys.stderr)
        return False
    try:
        lines = [ln for ln in open(out_p).read().strip().splitlines()
                 if ln.strip()]
        json.loads(lines[-1])
    except (IndexError, ValueError):
        print(f"[measure] {name}: rc=0 but no parseable JSON line",
              file=sys.stderr)
        return False
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Run benches to completion across TPU tunnel outages")
    ap.add_argument("specs", nargs="+",
                    help="name:timeout_s:command (command may contain ':')")
    ap.add_argument("--out", default="measurements",
                    help="output directory (json/err/done per bench)")
    ap.add_argument("--probe-timeout", type=float, default=150.0)
    ap.add_argument("--down-sleep", type=float, default=480.0,
                    help="seconds to sleep when the probe fails")
    ap.add_argument("--pause-file", default=None,
                    help="suspend while this path exists (serialize "
                         "host-heavy work against measurement)")
    ap.add_argument("--max-wall", type=float, default=float("inf"),
                    help="give up (rc 1) after this many seconds")
    args = ap.parse_args(argv)

    queue = []
    for spec in args.specs:
        name, tmo, cmd = spec.split(":", 2)
        queue.append((name, float(tmo), cmd))
    os.makedirs(args.out, exist_ok=True)

    t0 = time.monotonic()
    while True:
        if args.pause_file and os.path.exists(args.pause_file):
            time.sleep(60)
            continue
        pending = [q for q in queue if not os.path.exists(
            os.path.join(args.out, f"{q[0]}.done"))]
        if not pending:
            print("[measure] all benches landed", file=sys.stderr)
            return 0
        if time.monotonic() - t0 > args.max_wall:
            print(f"[measure] giving up; still pending: "
                  f"{[q[0] for q in pending]}", file=sys.stderr)
            return 1
        for name, tmo, cmd in pending:
            if args.pause_file and os.path.exists(args.pause_file):
                break
            if not probe(args.probe_timeout):
                print(f"[measure] tunnel down; sleeping "
                      f"{args.down_sleep:.0f}s", file=sys.stderr)
                time.sleep(min(args.down_sleep,
                               max(1.0, args.max_wall
                                   - (time.monotonic() - t0))))
                break
            print(f"[measure] running {name}: {cmd}", file=sys.stderr)
            if run_bench(name, tmo, cmd, args.out):
                open(os.path.join(args.out, f"{name}.done"), "w").write("")
                print(f"[measure] {name} landed", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
