"""Batch benchmark runner — the TPU-native equivalent of the reference's
`jpl_scripts/run_benchmarks.sh` (a SLURM loop over eval configs): run a list
of (benchmark, model-card, tag) jobs and aggregate every `summaries.json`
into one combined JSON + markdown table.

Spec YAML — a list of jobs:

    - benchmark: hpatches            # eval module: gluefactory_tpu.eval.<b>
      conf: gluefactory_tpu/configs/superpoint+lightglue.yaml
      tag: sp_lg_final
      dotlist: [checkpoint=lg_tpu_stage2]   # extra CLI args, optional
      overwrite: true                       # optional (default false)

Each job runs in its OWN subprocess (isolation: a wedged backend or a crash
in one benchmark never kills the sweep; the per-job timeout applies). Set
GFTPU_PLATFORM=cpu in the environment to sweep on the host CPU while a TPU
training occupies the accelerator.

CLI: python -m gluefactory_tpu.scripts.run_benchmarks --spec jobs.yaml
        [--out outputs/results/sweep.md] [--timeout 3600]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from gluefactory_tpu.settings import EVAL_PATH  # noqa: E402


def run_job(job: dict, timeout: float) -> dict:
    bench = job["benchmark"]
    tag = job["tag"]
    cmd = [sys.executable, "-m", f"gluefactory_tpu.eval.{bench}",
           "--tag", tag]
    if job.get("conf"):
        cmd += ["--conf", str(job["conf"])]
    if job.get("overwrite"):
        cmd += ["--overwrite"]
    cmd += [str(d) for d in job.get("dotlist", [])]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
        status = "ok" if proc.returncode == 0 else f"exit {proc.returncode}"
        tail = proc.stderr[-2000:] if proc.returncode else ""
    except subprocess.TimeoutExpired:
        status, tail = "timeout", ""
    rec = {"benchmark": bench, "tag": tag, "status": status,
           "seconds": round(time.time() - t0, 1)}
    if tail:
        rec["stderr_tail"] = tail
    summ = EVAL_PATH / bench / tag / "summaries.json"
    if summ.exists():
        rec["summaries"] = json.loads(summ.read_text())
    return rec


def to_markdown(records: list[dict]) -> str:
    lines = ["| benchmark | tag | status | headline |", "|---|---|---|---|"]
    for r in records:
        s = r.get("summaries", {})
        # pick a few headline keys, benchmark-agnostic
        keys = [k for k in s if any(t in k for t in
                ("mAA", "AUC", "ransac@", "rel_pose", "AP", "prec"))][:4]
        head = ", ".join(f"{k}={s[k]}" for k in keys) or "-"
        lines.append(f"| {r['benchmark']} | {r['tag']} | {r['status']} "
                     f"({r['seconds']}s) | {head} |")
    return "\n".join(lines)


def main():
    import yaml

    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", required=True)
    ap.add_argument("--out", default=None, help="markdown table path")
    ap.add_argument("--timeout", type=float, default=3600.0)
    args = ap.parse_args()

    jobs = yaml.safe_load(Path(args.spec).read_text())
    records = []
    for job in jobs:
        print(f"[run_benchmarks] {job['benchmark']}/{job['tag']} ...",
              flush=True)
        rec = run_job(job, args.timeout)
        print(f"[run_benchmarks]   -> {rec['status']} ({rec['seconds']}s)",
              flush=True)
        records.append(rec)

    combined = EVAL_PATH / "sweep_results.json"
    combined.parent.mkdir(parents=True, exist_ok=True)
    combined.write_text(json.dumps(records, indent=1))
    md = to_markdown(records)
    print(md)
    if args.out:
        Path(args.out).write_text(md + "\n")
    # nonzero exit if anything failed, so cluster schedulers notice
    sys.exit(0 if all(r["status"] == "ok" for r in records) else 1)


if __name__ == "__main__":
    main()
