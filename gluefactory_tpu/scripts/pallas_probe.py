"""One guarded attempt to execute a Pallas/Mosaic kernel on the real TPU.

The axon remote-compile tunnel (PALLAS_AXON_REMOTE_COMPILE=1) has hung every
Mosaic compile so far and a hung compile can wedge the tunnel for every
process for ~30 min (CLAUDE.md round-1..3). This probe exists to re-test
that blockage CHEAPLY at safe moments (between training jobs):

  - runs in a SUBPROCESS with a hard timeout (default 240 s) so the parent
    never hangs;
  - tries the smallest possible kernel first (one VMEM add), then the real
    fused attention kernel only if the small one executed;
  - writes a JSON verdict to outputs/results/pallas_probe.json either way —
    a driver-visible record of whether the flagship kernel path is usable.

Usage: python -m gluefactory_tpu.scripts.pallas_probe [--timeout 240]
       (run it with NOTHING else using the tunnel: a wedge stalls others)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path


def _worker(which: str) -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if which == "tiny":
        def kernel(x_ref, y_ref, o_ref):
            o_ref[...] = x_ref[...] + y_ref[...]

        x = jnp.ones((256, 256), jnp.float32)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))
        out = f(x, x)
        print(json.dumps({"ok": True, "checksum": float(out.sum())}))
        return
    # full fused attention kernel on realistic LightGlue shapes
    os.environ["GFTPU_FORCE_PALLAS"] = "1"
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    

    q = jax.random.normal(jax.random.key(0), (8, 4, 1024, 64))
    from gluefactory_tpu.ops.attention import attention_pallas, attention_xla
    out = attention_pallas(q, q, q)
    ref = attention_xla(q, q, q)
    import numpy as _np
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-2, err
    print(json.dumps({"ok": True, "checksum": float(out.sum())}))


def probe(which: str, timeout: float) -> dict:
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--worker", which],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"which": which, "status": "hung", "seconds": round(timeout, 1)}
    dt = round(time.time() - t0, 1)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            return {"which": which, "status": "EXECUTED", "seconds": dt, **rec}
        except json.JSONDecodeError:
            continue
    return {"which": which, "status": f"rc={proc.returncode}", "seconds": dt,
            "stderr": (proc.stderr or "")[-300:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--worker", default=None)
    args = ap.parse_args()
    if args.worker:
        _worker(args.worker)
        return
    results = {"env_remote_compile":
               os.environ.get("PALLAS_AXON_REMOTE_COMPILE")}
    results["tiny"] = probe("tiny", args.timeout)
    if results["tiny"]["status"] == "EXECUTED":
        results["attention"] = probe("attention", args.timeout * 2)
    out = Path("outputs/results/pallas_probe.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
