"""Resilient training driver for flaky remote-TPU links.

The axon tunnel can wedge for 40-60 minutes (see CLAUDE.md); a wedged compile
or execute call hangs forever rather than raising, so a plain training run
can silently stall. This driver supervises ``gluefactory_tpu.train``:

  - launches the trainer in its own process group;
  - watches the experiment's ``metrics.jsonl`` mtime — no progress for
    ``--stall_timeout`` seconds kills the exact process group (never
    pattern-kills) and restarts with ``--restore``;
  - retries crashed runs with exponential backoff up to ``--max_restarts``;
  - exits 0 when the trainer reports a clean finish.

Usage: python -m gluefactory_tpu.scripts.resilient_train <experiment>
          --conf <yaml> [--stall_timeout 900] [dotlist...]
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from gluefactory_tpu.settings import TRAINING_PATH  # noqa: E402


def has_checkpoint(exp_dir: Path) -> bool:
    return any(exp_dir.glob("checkpoint_*.ckpt"))


def progress_mtime(exp_dir: Path) -> float:
    f = exp_dir / "metrics.jsonl"
    try:
        return f.stat().st_mtime
    except FileNotFoundError:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment")
    ap.add_argument("--conf", required=True)
    ap.add_argument("--stall_timeout", type=float, default=900.0)
    ap.add_argument("--startup_grace", type=float, default=1800.0,
                    help="allow long first compiles before stall-checking")
    ap.add_argument("--max_restarts", type=int, default=40)
    ap.add_argument("dotlist", nargs="*")
    args = ap.parse_args()

    exp_dir = TRAINING_PATH / args.experiment
    restarts = 0
    backoff = 30.0
    while restarts <= args.max_restarts:
        cmd = [
            sys.executable, "-m", "gluefactory_tpu.train", args.experiment,
            "--conf", args.conf, "--no_log_capture", *args.dotlist,
        ]
        if has_checkpoint(exp_dir):
            cmd.append("--restore")
        print(f"[resilient] launch (restart {restarts}): {' '.join(cmd)}", flush=True)
        t_start = time.time()
        exp_dir.mkdir(parents=True, exist_ok=True)
        logf = open(exp_dir / "driver_log.txt", "a")
        proc = subprocess.Popen(
            cmd, start_new_session=True,
            stdout=logf or subprocess.DEVNULL, stderr=subprocess.STDOUT,
        )
        stalled = False
        while True:
            try:
                rc = proc.wait(timeout=30)
                break
            except subprocess.TimeoutExpired:
                pass
            age = time.time() - max(progress_mtime(exp_dir), t_start)
            grace = args.startup_grace if time.time() - t_start < args.startup_grace \
                else args.stall_timeout
            if age > grace:
                print(f"[resilient] stalled {age:.0f}s; killing pg {proc.pid}",
                      flush=True)
                try:
                    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass
                rc = proc.wait()
                stalled = True
                break
        if logf:
            logf.close()
        if rc == 0 and not stalled:
            print("[resilient] finished cleanly", flush=True)
            return 0
        restarts += 1
        wait = min(backoff * (1.5 ** min(restarts, 8)), 600.0)
        print(f"[resilient] rc={rc} stalled={stalled}; retry in {wait:.0f}s",
              flush=True)
        time.sleep(wait)
    print("[resilient] giving up", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
