"""Multi-host training launcher — the TPU-pod equivalent of the reference's
per-GPU process spawning (reference train.py:699-701 torch.multiprocessing
.spawn + jpl_scripts/ SLURM cluster launchers).

Two modes:

- ``--local N``: spawn N worker processes ON THIS HOST, each owning
  ``--devices_per_host`` virtual CPU devices, joined by ``jax.distributed``
  into one global mesh. This simulates an N-host TPU pod for development
  and CI: the full train CLI runs under it unchanged, with per-host loader
  shards and cross-host gradient psums exercised for real (same mechanics
  as tests/test_multihost.py, but driving ``gluefactory_tpu.train``).

- ``--coordinator host:port --num_hosts N --host_id K``: run ONE worker on
  this machine, for a real multi-host launch (one invocation per TPU host,
  e.g. from `gcloud compute tpus tpu-vm ssh --worker=all`). On real TPU
  hosts jax.distributed auto-detects devices; no virtual-device flags are
  set.

Everything after ``--`` is passed verbatim to ``gluefactory_tpu.train``:

    python -m gluefactory_tpu.scripts.launch_multihost --local 2 -- \
        exp_mh --conf gluefactory_tpu/configs/superpoint+lightglue_homography.yaml \
        data.train_batch_size=8 train.epochs=1
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_env(coordinator: str, num_hosts: int, host_id: int,
               devices_per_host: int | None) -> dict:
    env = dict(os.environ)
    env["JAX_COORDINATOR_ADDRESS"] = coordinator
    env["JAX_NUM_PROCESSES"] = str(num_hosts)
    env["JAX_PROCESS_ID"] = str(host_id)
    if devices_per_host:  # local simulation on virtual CPU devices
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_host}"
        ).strip()
        env["GFTPU_PLATFORM"] = "cpu"
        # the axon sitecustomize would re-pin the process to the TPU tunnel
        env["PYTHONPATH"] = str(REPO)
    return env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", type=int, default=0,
                    help="spawn N simulated hosts on this machine")
    ap.add_argument("--devices_per_host", type=int, default=4,
                    help="virtual CPU devices per simulated host")
    ap.add_argument("--coordinator", default=None, help="host:port")
    ap.add_argument("--num_hosts", type=int, default=None)
    ap.add_argument("--host_id", type=int, default=None)
    argv = sys.argv[1:]
    if "--" not in argv:
        ap.error("separate train args with `--`")
    split = argv.index("--")
    args = ap.parse_args(argv[:split])
    train_args = argv[split + 1:]

    cmd = [sys.executable, "-m", "gluefactory_tpu.train", *train_args]

    if args.local:
        coordinator = f"127.0.0.1:{free_port()}"
        procs = []
        for pid in range(args.local):
            env = worker_env(coordinator, args.local, pid,
                             args.devices_per_host)
            procs.append(subprocess.Popen(cmd, env=env, cwd=REPO))
        rcs = [p.wait() for p in procs]
        sys.exit(max(rcs))

    if not (args.coordinator and args.num_hosts is not None
            and args.host_id is not None):
        ap.error("need --local N, or --coordinator/--num_hosts/--host_id")
    env = worker_env(args.coordinator, args.num_hosts, args.host_id, None)
    sys.exit(subprocess.call(cmd, env=env, cwd=REPO))


if __name__ == "__main__":
    main()
