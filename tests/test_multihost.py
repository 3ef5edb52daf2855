"""True multi-process (multi-host) collectives test (SURVEY.md §2.10 /
reference NCCL-DDP equivalence): two OS processes, each owning 4 virtual
CPU devices, joined by jax.distributed into one 8-device global mesh.

Exercises `parallel.mesh.maybe_init_distributed` + a sharded psum across
the process boundary — the path every single-process test misses. Run by
spawning subprocesses (the current process already holds a single-process
JAX backend)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])

from gluefactory_tpu.parallel.mesh import maybe_init_distributed, get_mesh

os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[1]
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
assert jax.process_count() == int(sys.argv[2]), jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # global devices
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = get_mesh()  # all 8 global devices on the data axis
pid = jax.process_index()

# per-host shard: each process contributes its own process_index + 1
local = jnp.full((4, 2), float(pid + 1))
global_shape = (8, 2)
arrs = [jax.device_put(local[i : i + 1], d)
        for i, d in enumerate(jax.local_devices())]
x = jax.make_array_from_single_device_arrays(
    global_shape, NamedSharding(mesh, P("data")), arrs)

@jax.jit
def total(v):
    return jnp.sum(v)

# sum over the GLOBAL array: 4 rows of 1s + 4 rows of 2s, 2 cols = 24
out = float(total(x))
assert abs(out - 24.0) < 1e-6, out
print(f"OK process {pid}: global sum {out}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, "2", str(i), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"OK process {i}" in out, out[-2000:]


TINY_MH_CONF = """
data:
  name: homographies
  synthetic: true
  synthetic_size: 16
  synthetic_source_size: [160, 120]
  image_size: 64
  train_batch_size: 4
  val_batch_size: 4
  num_workers: 2
  val_size: 4
model:
  name: two_view_pipeline
  extractor:
    name: extractors.superpoint
    max_num_keypoints: 32
    detection_threshold: 0.0
    channels: [8, 8, 16]
    descriptor_dim: 16
  matcher:
    name: matchers.lightglue
    input_dim: 16
    descriptor_dim: 32
    n_layers: 1
    num_heads: 2
  ground_truth:
    name: matchers.homography_matcher
  run_gt_in_forward: true
train:
  seed: 0
  epochs: 1
  lr: 1.0e-4
  log_every_iter: 2
  eval_every_iter: 4
  num_steps_per_epoch: 4
"""


def test_multihost_launcher_cli(tmp_path):
    """scripts/launch_multihost drives the FULL train CLI across 2 simulated
    hosts (jpl_scripts-launcher equivalence): per-host loader shards, synced
    gradients, and checkpoints written by process 0 only."""
    conf = tmp_path / "tiny.yaml"
    conf.write_text(TINY_MH_CONF)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["GFTPU_TRAINING_PATH"] = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, "-m", "gluefactory_tpu.scripts.launch_multihost",
         "--local", "2", "--devices_per_host", "2", "--",
         "mh_cli", "--conf", str(conf), "--no_log_capture"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    exp = tmp_path / "out" / "mh_cli"
    ckpts = list(exp.glob("checkpoint_*.ckpt"))
    assert ckpts, f"no checkpoints in {exp}"
