"""Model FPS / latency harness
(reference: gluefactory/eval/timing_measurement.py:36-129 + utils/benchmark.py).

Measures end-to-end pair throughput of any pipeline config on the ambient
accelerator with forced execution (on-device checksum — through remote
tunnels `block_until_ready` alone does not guarantee execution; see bench.py).

CLI: ``python -m gluefactory_tpu.eval.timing_measurement --conf <cfg>
[model.k=v ...] [--batch 8 --size 512 --iters 10]``"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models import build_model
from .io import parse_config_path


def measure_pipeline(model, batch: int, size: int, iters: int = 10, warmup: int = 3,
                     key=None) -> dict:
    rng = np.random.default_rng(0)

    def make_data(seed):
        g = np.random.default_rng(seed)
        return {
            "view0": {
                "image": jnp.asarray(g.uniform(0, 1, (batch, size, size, 3)), jnp.float32),
                "image_size": jnp.full((batch, 2), float(size)),
            },
            "view1": {
                "image": jnp.asarray(g.uniform(0, 1, (batch, size, size, 3)), jnp.float32),
                "image_size": jnp.full((batch, 2), float(size)),
            },
        }

    data0 = make_data(0)
    params = model.init(jax.random.key(0), data0)

    @jax.jit
    def fwd_sum(params, data):
        pred = model.apply(params, data)
        out = jnp.zeros(())
        for k in ("matching_scores0", "keypoints0", "keypoint_scores0", "heatmap"):
            if k in pred:
                out = out + jnp.sum(pred[k].astype(jnp.float32))
        return out

    datas = [jax.device_put(make_data(i + 1)) for i in range(warmup + iters)]
    for i in range(warmup):
        float(fwd_sum(params, datas[i]))
    t0 = time.perf_counter()
    outs = [fwd_sum(params, datas[warmup + i]) for i in range(iters)]
    _ = [float(x) for x in outs]
    dt = time.perf_counter() - t0
    return {
        "pairs_per_s": batch * iters / dt,
        "ms_per_pair": dt / (batch * iters) * 1000,
        "backend": jax.default_backend(),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, required=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_intermixed_args()
    conf = Config.load(parse_config_path(args.conf))
    conf = conf.merge(Config.from_cli(args.dotlist))
    model = build_model(conf.model.name, conf.model)
    out = measure_pipeline(model, args.batch, args.size, args.iters)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
