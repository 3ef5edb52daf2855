"""Benchmark: matched pairs/s/chip of the flagship SuperPoint+LightGlue
two-view pipeline (1024 keypoints, 9 matcher layers, 512x512 images).

Prints ONE JSON line at the very end:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N, ...}

Outage-proofing (the axon TPU tunnel wedges for 40-60 min at a time):
  - the backend probe retries with backoff for up to GFTPU_BENCH_BUDGET
    seconds (default 3600) instead of giving up after one window;
  - each measurement variant runs in its OWN subprocess with a timeout, so a
    wedged graph can never hang the whole bench — the parent always prints
    its JSON line from whatever variants succeeded;
  - the attempt log (probe timings, per-variant status) is embedded in the
    JSON for the record.

Variants: f32 XLA attention (headline, always), bf16 (attempted, timeout
guarded), Pallas fused attention (only when GFTPU_BENCH_PALLAS=1 or running
with direct TPU access — a hung Mosaic remote-compile can wedge the shared
tunnel for other processes, see CLAUDE.md).

Baseline: the reference stack (SuperPoint+LightGlue, torch, FlashAttention)
reports ~55 fps end-to-end pair throughput on an RTX 3090 at 1024 keypoints
(LightGlue paper Table 5 / README timing class); vs_baseline = ours / 55.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_PAIRS_PER_S = 55.0
BATCH = 8
IMAGE_SIZE = 512
WARMUP = 3
ITERS = 10


def _probe_once(timeout_s: float) -> bool:
    """Trivial matmul in a daemon thread — a wedged tunnel never returns."""
    import threading

    ok = {"done": False}

    def probe():
        import jax.numpy as jnp

        float((jnp.ones((64, 64)) @ jnp.ones((64, 64))).sum())
        ok["done"] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok["done"]


def run_variant(variant: str) -> float:
    """Measure one configuration; returns pairs/s. Runs inside a worker
    subprocess (see __main__)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_conf
    from gluefactory_tpu.models import build_model

    if variant == "matcher_only":
        return _run_matcher_only()

    conf = _flagship_conf(tiny=False)
    if variant == "bf16":
        conf["extractor"]["dtype"] = "bf16"
        conf["matcher"]["dtype"] = "bf16"
    if variant == "pallas":
        os.environ["GFTPU_FORCE_PALLAS"] = "1"
    model = build_model("two_view_pipeline", conf)

    @jax.jit
    def fwd_sum(params, seed):
        # Inputs are generated ON DEVICE from the seed: every call is unique
        # (no cache can serve it) and nothing rides the host link.
        key = jax.random.key(seed)
        k0, k1 = jax.random.split(key)
        size = jnp.full((BATCH, 2), float(IMAGE_SIZE), jnp.float32)
        data = {
            "view0": {
                "image": jax.random.uniform(k0, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)),
                "image_size": size,
            },
            "view1": {
                "image": jax.random.uniform(k1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 3)),
                "image_size": size,
            },
        }
        pred = model.apply(params, data)
        # On-device checksum of the key outputs: forces the whole graph to
        # execute and keeps the host transfer to one scalar. (Through remote
        # tunnels, block_until_ready alone does NOT guarantee execution.)
        return (
            jnp.sum(pred["matching_scores0"])
            + jnp.sum(pred["keypoints0"])
            + jnp.sum(pred["keypoints1"])
        )

    from __graft_entry__ import _synthetic_batch

    data = _synthetic_batch(BATCH, IMAGE_SIZE, with_h=False)
    params = model.init(jax.random.key(0), data)
    for i in range(WARMUP):
        float(fwd_sum(params, i))
    t0 = time.perf_counter()
    outs = [fwd_sum(params, WARMUP + i) for i in range(ITERS)]
    checks = [float(x) for x in outs]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(c) for c in checks)
    return BATCH * ITERS / dt


def _run_matcher_only() -> float:
    """LightGlue 9L @ 1024 kp on pre-extracted descriptors — the matcher
    kernel's serving throughput (cached-feature / feature-store regime)."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.models import build_model

    model = build_model("matchers.lightglue", {
        "checkpointed": False, "save_layer_outputs": False})
    n = 1024

    @jax.jit
    def fwd_sum(params, seed):
        key = jax.random.key(seed)
        ks = jax.random.split(key, 4)
        d0 = jax.random.normal(ks[0], (BATCH, n, 256))
        d1 = jax.random.normal(ks[1], (BATCH, n, 256))
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
        data = {
            "keypoints0": jax.random.uniform(
                ks[2], (BATCH, n, 2), maxval=float(IMAGE_SIZE)),
            "keypoints1": jax.random.uniform(
                ks[3], (BATCH, n, 2), maxval=float(IMAGE_SIZE)),
            "descriptors0": d0, "descriptors1": d1,
            "view0": {"image_size": jnp.full((BATCH, 2), float(IMAGE_SIZE))},
            "view1": {"image_size": jnp.full((BATCH, 2), float(IMAGE_SIZE))},
        }
        pred = model.apply(params, data)
        return jnp.sum(pred["matching_scores0"])

    import numpy as np

    params_key = jax.random.key(0)
    # init needs one concrete batch (same structure as inside fwd_sum)
    k = jax.random.key(123)
    ks = jax.random.split(k, 4)
    d0 = jax.random.normal(ks[0], (BATCH, n, 256))
    data = {
        "keypoints0": jax.random.uniform(ks[2], (BATCH, n, 2),
                                         maxval=float(IMAGE_SIZE)),
        "keypoints1": jax.random.uniform(ks[3], (BATCH, n, 2),
                                         maxval=float(IMAGE_SIZE)),
        "descriptors0": d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True),
        "descriptors1": d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True),
        "view0": {"image_size": jnp.full((BATCH, 2), float(IMAGE_SIZE))},
        "view1": {"image_size": jnp.full((BATCH, 2), float(IMAGE_SIZE))},
    }
    model_params = model.init(params_key, data)
    for i in range(WARMUP):
        float(fwd_sum(model_params, i))
    t0 = time.perf_counter()
    checks = [float(fwd_sum(model_params, WARMUP + i)) for i in range(ITERS)]
    dt = time.perf_counter() - t0
    assert all(np.isfinite(c) for c in checks)
    return BATCH * ITERS / dt


def _worker_main(variant: str):
    val = run_variant(variant)
    print(json.dumps({"worker_pairs_per_s": val}))


def _spawn_variant(variant: str, timeout_s: float) -> tuple[float | None, str]:
    """Run a variant in a subprocess; returns (pairs/s | None, status)."""
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--worker", variant],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=str(Path(__file__).parent),
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout>{timeout_s:.0f}s"
    if proc.returncode != 0:
        tail = (proc.stderr or "")[-300:].replace("\n", " | ")
        return None, f"rc={proc.returncode}: {tail}"
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["worker_pairs_per_s"]), "ok"
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
    return None, "no-output"


def main():
    budget = float(os.environ.get("GFTPU_BENCH_BUDGET", 3600))
    t_start = time.monotonic()
    attempts = []
    # --- probe loop: outlast tunnel outages --------------------------------
    reachable = False
    wait = 0.0
    while time.monotonic() - t_start < budget * 0.7:
        t0 = time.monotonic()
        ok = _probe_once(timeout_s=120.0)
        attempts.append(
            {"t": round(time.monotonic() - t_start, 1),
             "probe": "ok" if ok else "hung"}
        )
        if ok:
            reachable = True
            break
        wait = min(max(60.0, wait * 1.7), 420.0)
        time.sleep(wait)
    if not reachable:
        print(json.dumps({
            "metric": "sp+lightglue_pair_throughput_backend_unreachable",
            "value": 0.0, "unit": "pairs/s", "vs_baseline": 0.0,
            "attempts": attempts,
        }))
        os._exit(0)

    import jax

    backend = jax.default_backend()
    variants: dict[str, dict] = {}
    # --- headline: f32 XLA, retried across outages -------------------------
    for attempt in range(4):
        remaining = budget - (time.monotonic() - t_start)
        if remaining < 300:
            break
        val, status = _spawn_variant("f32", min(1500.0, remaining))
        attempts.append({"t": round(time.monotonic() - t_start, 1),
                         "variant": "f32", "status": status})
        if val is not None:
            variants["f32_xla"] = {"pairs_per_s": round(val, 2)}
            break
        time.sleep(90.0 * (attempt + 1))
    # --- extra variants (best-effort, never jeopardize the headline) -------
    extra = ["matcher_only", "bf16"]
    if os.environ.get("GFTPU_BENCH_PALLAS") == "1" or (
        backend == "tpu" and not os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
    ):
        extra.append("pallas")
    for variant in extra:
        remaining = budget - (time.monotonic() - t_start)
        if remaining < 400 or "f32_xla" not in variants:
            break
        val, status = _spawn_variant(variant, min(900.0, remaining - 60))
        attempts.append({"t": round(time.monotonic() - t_start, 1),
                         "variant": variant, "status": status})
        if val is not None:
            variants[variant] = {"pairs_per_s": round(val, 2)}

    if not variants:
        print(json.dumps({
            "metric": f"sp+lightglue_pair_throughput_{backend}_failed",
            "value": 0.0, "unit": "pairs/s", "vs_baseline": 0.0,
            "attempts": attempts,
        }))
        os._exit(0)
    pipeline_variants = {k: v for k, v in variants.items()
                         if k != "matcher_only"}
    best_name, best = max(
        pipeline_variants.items(), key=lambda kv: kv[1]["pairs_per_s"])
    val = best["pairs_per_s"]
    print(json.dumps({
        "metric": f"sp+lightglue_pair_throughput_{backend}_{best_name}",
        "value": val,
        "unit": "pairs/s",
        "vs_baseline": round(val / BASELINE_PAIRS_PER_S, 3),
        "variants": variants,
        "attempts": attempts,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        _worker_main(sys.argv[2])
    else:
        main()
