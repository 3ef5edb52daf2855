"""Training loop (reference: gluefactory/train.py:43-703).

TPU-first re-design (SURVEY.md §2.10, §5.8):
  - ONE jitted train step — forward, loss, grad, clip, optimizer update —
    compiled over a ``Mesh(devices, ("data",))``; the batch is sharded over
    the ``data`` axis, params are replicated, and the gradient all-reduce is
    inserted by XLA from the sharding annotations. This replaces the
    reference's DDP process-per-GPU + NCCL allreduce (train.py:239-308).
  - Multi-host: `jax.distributed.initialize()` when JAX_COORDINATOR is set;
    each process loads its own shard of the epoch (per-host input pipeline ≙
    DistributedSampler, reference base_dataset.py:166-169).
  - NaN guard: non-finite loss or grad-norm skips the step inside jit with
    lax.cond — no cross-rank vote needed since data-parallel grads are
    already averaged (reference train.py:440-475 is host-side).
  - ``conf.model.<component>.trainable: false`` freezes that param subtree
    through an optax mask (reference base_model.py:88-90 freezes nn.Modules).
  - Checkpointing keeps the reference semantics (best-key, keep-last-K,
    restore-merge; utils/experiments.py).

CLI: ``python -m gluefactory_tpu.train <experiment> --conf path.yaml
[dot.key=value ...] [--restore] [--overfit] [--print_arch]``
"""

from __future__ import annotations

import argparse
import signal
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from . import logger
from .core.config import Config
from .datasets import get_dataset
from .models import build_model
from .settings import TRAINING_PATH
from .utils.experiments import load_experiment, save_experiment
from .utils.tools import AverageMetric, MedianMetric, set_seed

default_train_conf = {
    "seed": 0,  # reference train.py:45 ('???' + random default)
    "epochs": 1,
    "optimizer": "adam",  # adam | adamw | sgd | rmsprop
    "opt_regexp": None,  # train only params matching this regexp (train.py:127)
    "optimizer_options": {},
    "lr": 1e-4,
    "lr_schedule": {"type": None, "start": 0, "exp_div_10": 0, "on_epoch": False,
                    "factor": 1.0},
    "lr_scaling": [],
    "eval_every_iter": 1000,
    "save_every_iter": 5000,
    "log_every_iter": 200,
    "log_grad_every_iter": None,
    "keep_last_checkpoints": 5,
    "load_experiment": None,
    "clip_grad": 1.0,
    "best_key": "loss/total",
    # 'min' (losses) or 'max' (benchmark metrics like bench/<name>/<k>_mAA)
    "best_mode": "min",
    "dataset_callback_fn": None,
    "dataset_callback_on_val": False,
    "overfit": False,
    "num_steps_per_epoch": None,  # cap steps (useful for synthetic data)
    "mixed_precision": None,  # null | "bf16" (activations cast in-model)
    "log_dir": None,
    # in-training benchmarks (reference train.py:375-392): list of
    # {name: hpatches|megadepth1500|..., conf: {...}} run at each epoch end
    "run_benchmarks": [],
    "benchmark_every_epoch": 1,  # cadence of the end-of-epoch bench hook
}

default_conf = {
    "data": {"name": None},
    "model": {"name": None},
    "train": default_train_conf,
}


# ---------------------------------------------------------------------------
# Optimizer construction
# ---------------------------------------------------------------------------


def make_lr_schedule(conf: Config):
    """factor/exp schedules (reference get_lr_scheduler, train.py:146-164).
    The 'plateau' type returns the base LR here; the runtime reduction is
    applied through an injected hyperparameter (see PlateauController)."""
    base_lr = float(conf.lr)
    sched = conf.lr_schedule
    kind = sched.get("type")

    def fn(step):
        lr = base_lr
        if kind == "exp":
            start = float(sched.get("start", 0))
            div10 = float(sched.get("exp_div_10", 1e9))
            gamma = jnp.where(step >= start, 10 ** (-(step - start) / max(div10, 1.0)), 1.0)
            lr = base_lr * gamma
        elif kind == "factor":
            start = float(sched.get("start", 0))
            factor = float(sched.get("factor", 1.0))
            lr = jnp.where(step >= start, base_lr * factor, base_lr)
        return lr

    return fn


class PlateauController:
    """ReduceLROnPlateau (reference train.py:146-164 allows any torch
    scheduler incl. plateau): watches the validation best-key and scales an
    LR multiplier down by ``factor`` after ``patience`` non-improving evals.
    The multiplier is applied through optax.inject_hyperparams, so no
    recompilation happens when it changes."""

    def __init__(self, sched: Config):
        self.enabled = sched.get("type") == "plateau"
        self.factor = float(sched.get("factor", 0.5))
        self.patience = int(sched.get("patience", 3))
        self.min_scale = float(sched.get("min_scale", 1e-3))
        self.best = None
        self.bad = 0
        self.scale = 1.0

    def update(self, metric: float) -> bool:
        """Returns True when the scale changed."""
        if not self.enabled or not np.isfinite(metric):
            return False
        if self.best is None or metric < self.best - 1e-12:
            self.best = metric
            self.bad = 0
            return False
        self.bad += 1
        if self.bad >= self.patience and self.scale > self.min_scale:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.bad = 0
            logger.info("Plateau: scaling LR by %.3g -> x%.3g", self.factor, self.scale)
            return True
        return False


def set_lr_scale(opt_state, scale: float):
    """Replace the injected 'lr_scale' hyperparameter leaf in the optimizer
    state pytree (no recompilation: the jitted step reads it as data)."""

    def repl(path, leaf):
        for p in path:
            if getattr(p, "key", None) == "lr_scale":
                return jnp.asarray(scale, jnp.float32)
        return leaf

    return jax.tree_util.tree_map_with_path(repl, opt_state)


def trainable_mask(params: dict, model_conf: Config) -> dict:
    """Freeze param subtrees whose component conf sets trainable=False
    (reference base_model.py:88-90)."""
    frozen_roots = set()
    for comp, sub in model_conf.items():
        if isinstance(sub, Config) and sub.get("trainable") is False:
            frozen_roots.add(comp)
    flat = traverse_util.flatten_dict(params)
    mask = {
        k: not any(part in frozen_roots for part in k[:2]) for k in flat
    }
    return traverse_util.unflatten_dict(mask)


def lr_scaling_masks(params: dict, lr_scaling) -> list[tuple[float, dict]]:
    """Per-group LR scaling (reference pack_lr_parameters, train.py:166-186):
    ``lr_scaling: [[scale, [substr, ...]], ...]`` scales updates of params
    whose flattened path contains any of the substrings."""
    out = []
    flat = traverse_util.flatten_dict(params)
    for entry in list(lr_scaling or []):
        scale, patterns = float(entry[0]), [str(p) for p in entry[1]]
        mask = {
            k: any(pat in "/".join(map(str, k)) for pat in patterns) for k in flat
        }
        n = sum(mask.values())
        if n:
            logger.info("LR scaling x%.3g for %d params matching %s",
                        scale, n, patterns)
            out.append((scale, traverse_util.unflatten_dict(mask)))
    return out


def make_optimizer(conf: Config, params: dict, model_conf: Config):
    opts = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
    }
    schedule = make_lr_schedule(conf)
    opt = opts[conf.optimizer](learning_rate=schedule, **conf.optimizer_options.to_dict()
                               if isinstance(conf.optimizer_options, Config)
                               else conf.optimizer_options)
    chain = [optax.clip_by_global_norm(float(conf.clip_grad))] if conf.clip_grad else []
    chain.append(opt)
    # per-group LR scaling (reference train.py:166-186)
    for scale, mask in lr_scaling_masks(params, conf.get("lr_scaling")):
        chain.append(optax.masked(optax.scale(scale), mask))
    # runtime plateau multiplier, injected so updates need no recompile
    chain.append(
        optax.inject_hyperparams(lambda lr_scale: optax.scale(lr_scale))(
            lr_scale=1.0
        )
    )
    tx = optax.chain(*chain)
    mask = trainable_mask(params, model_conf)
    flat_mask = traverse_util.flatten_dict(mask)
    if not all(flat_mask.values()):
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            traverse_util.unflatten_dict(
                {k: "train" if v else "freeze" for k, v in flat_mask.items()}
            ),
        )
    return tx, schedule


# ---------------------------------------------------------------------------
# Sharded train step
# ---------------------------------------------------------------------------


def make_train_step(model, tx, mesh: jax.sharding.Mesh, make_batch=None):
    """Build the jitted data-parallel train step. Batch arrays are sharded on
    their leading axis over ``data``; params/opt_state replicated.

    With ``make_batch`` (a device data engine, e.g.
    datasets/homographies_ondevice.py), the step signature becomes
    ``(params, opt_state, pool, seed)`` and the whole data pipeline — pool
    gather, homography warp, augmentation, GT — runs inside the same jit as
    forward/backward; per-step host traffic is one scalar seed."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))

    def shard_data_tree(data, batch_size):
        def constrain(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == batch_size:
                return jax.lax.with_sharding_constraint(x, data_sharded)
            return x

        return jax.tree.map(constrain, data)

    def loss_fn(params, data):
        pred = model.apply(params, data)
        losses, metrics = model.apply(params, pred, data, method=model.loss)
        return jnp.mean(losses["total"]), (losses, metrics)

    def step(params, opt_state, data):
        (loss, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data
        )
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        def do_update(_):
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        def skip(_):
            return params, opt_state

        new_params, new_opt_state = jax.lax.cond(finite, do_update, skip, None)
        scalars = {f"loss/{k}": jnp.mean(v) for k, v in losses.items()}
        scalars.update({f"metric/{k}": jnp.mean(v) for k, v in metrics.items()})
        scalars["grad_norm"] = grad_norm
        # per-component gradient norms (≙ reference grad histograms/norms,
        # train.py:510-522; scalars are cheap enough to emit every step)
        for comp, sub in grads.get("params", grads).items():
            scalars[f"grad_norm/{comp}"] = optax.global_norm(sub)
        scalars["skipped"] = (~finite).astype(jnp.float32)
        return new_params, new_opt_state, scalars

    def shard_batch(batch):
        def put(x):
            if isinstance(x, (np.ndarray, jnp.ndarray)) and getattr(x, "ndim", 0) > 0:
                return jax.device_put(x, data_sharded)
            return x

        return jax.tree.map(put, batch, is_leaf=lambda x: isinstance(x, np.ndarray))

    if make_batch is None:
        jitted = jax.jit(
            step,
            in_shardings=(repl, repl, data_sharded),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
        return jitted, shard_batch, repl

    def engine_step(params, opt_state, pool, seed):
        data = make_batch(pool, jax.random.key(seed), "train")
        # image_size exists for every engine variant; single-view engines
        # (synthetic_shapes_ondevice) serve it at the top level, pair
        # engines under view0
        size = data["view0"]["image_size"] if "view0" in data \
            else data["image_size"]
        data = shard_data_tree(data, size.shape[0])
        return step(params, opt_state, data)

    jitted = jax.jit(
        engine_step,
        in_shardings=(repl, repl, repl, None),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    return jitted, shard_batch, repl


def filter_batch(batch):
    """Drop non-array entries (names, strings) before feeding the jit step."""
    if isinstance(batch, dict):
        out = {}
        for k, v in batch.items():
            fv = filter_batch(v)
            if fv is not None:
                out[k] = fv
        return out
    if isinstance(batch, (np.ndarray, jnp.ndarray, jax.Array, int, float, np.generic)):
        return batch
    if hasattr(batch, "R") or hasattr(batch, "f"):  # Pose/Camera pytrees
        return batch
    return None


# ---------------------------------------------------------------------------
# Validation
# ---------------------------------------------------------------------------


PR_BINS = 32


def _pr_counts(pred: dict, data: dict):
    """Histogram matcher confidence by correctness for PR curves
    (≙ reference add_pr_curve, train.py:551-557): returns
    {correct, incorrect: (PR_BINS,), num_pos: ()} or None."""
    scores = pred.get("matching_scores0")
    m0 = pred.get("matches0")
    gt = pred.get("gt_matches0", data.get("gt_matches0"))
    if scores is None or m0 is None or gt is None:
        return None
    matched = m0 >= 0
    correct = matched & (m0 == gt)
    incorrect = matched & ~correct & (gt > -2)
    edges = jnp.linspace(0.0, 1.0, PR_BINS + 1)
    sc = jnp.clip(scores, 0.0, 1.0).reshape(-1)

    def hist(mask):
        w = mask.reshape(-1).astype(jnp.float32)
        return jnp.histogram(sc, bins=edges, weights=w)[0]

    return {
        "correct": hist(correct),
        "incorrect": hist(incorrect),
        "num_pos": jnp.sum(gt >= 0),
    }


def make_eval_forward(model, make_batch=None):
    """Build the jitted validation forward ONCE (re-jitting per call retraces
    the full graph — costly through remote-compile tunnels)."""
    if make_batch is None:

        @jax.jit
        def jit_forward(params, data):
            pred = model.apply(params, data)
            losses, metrics = model.apply(params, pred, data, method=model.loss)
            return losses, metrics, _pr_counts(pred, data)

        return jit_forward

    @jax.jit
    def jit_forward_engine(params, pool, seed):
        data = make_batch(pool, jax.random.key(seed), "val")
        pred = model.apply(params, data)
        losses, metrics = model.apply(params, pred, data, method=model.loss)
        return losses, metrics, _pr_counts(pred, data)

    return jit_forward_engine


def do_evaluation(model, params, loader, jit_forward=None, pool=None,
                  writer=None, step: int = 0):
    """(reference train.py:82-124); accumulates PR-curve counts and emits
    them to tensorboard + an average-precision scalar when available."""
    results: dict[str, AverageMetric | MedianMetric] = defaultdict(AverageMetric)
    pr = None

    if jit_forward is None:
        jit_forward = make_eval_forward(model)

    for batch in loader:
        if pool is not None:
            losses, metrics, pr_i = jit_forward(params, pool, batch["seed"])
        else:
            data = filter_batch(batch)
            losses, metrics, pr_i = jit_forward(params, data)
        for k, v in losses.items():
            results[f"loss/{k}"].update(np.asarray(v))
        for k, v in metrics.items():
            results[f"metric/{k}"].update(np.asarray(v))
        if pr_i is not None:
            pr_i = jax.tree.map(np.asarray, pr_i)
            if pr is None:
                pr = pr_i
            else:
                pr = {k: pr[k] + pr_i[k] for k in pr}
    out = {k: m.compute() for k, m in results.items()}
    if pr is not None and pr["num_pos"] > 0:
        # PR over descending confidence thresholds from the binned counts
        tp = np.cumsum(pr["correct"][::-1])[::-1]
        fp = np.cumsum(pr["incorrect"][::-1])[::-1]
        prec = tp / np.maximum(tp + fp, 1)
        rec = tp / max(float(pr["num_pos"]), 1.0)
        # AP: trapezoid over recall (bins ordered by increasing threshold)
        order = np.argsort(rec)
        trapz = getattr(np, "trapezoid", np.trapz)
        out["match_AP"] = float(trapz(prec[order], rec[order]))
        if writer is not None and writer.tb is not None:
            writer.tb.add_pr_curve_raw(
                "val/matches",
                true_positive_counts=tp, false_positive_counts=fp,
                true_negative_counts=np.zeros_like(tp),
                false_negative_counts=np.maximum(
                    float(pr["num_pos"]) - tp, 0
                ),
                precision=prec, recall=np.clip(rec, 0, 1),
                global_step=step, num_thresholds=len(tp),
            )
    return out


# ---------------------------------------------------------------------------
# Main loop
# ---------------------------------------------------------------------------


class JSONLWriter:
    """Minimal metrics sink: JSONL file (+tensorboard if available)."""

    def __init__(self, log_dir: Path):
        import json

        self._json = json
        log_dir.mkdir(parents=True, exist_ok=True)
        self.f = open(log_dir / "metrics.jsonl", "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(str(log_dir))
        except Exception:
            pass

    def write(self, tag_values: dict, step: int):
        rec = {"step": step, **{k: float(v) for k, v in tag_values.items()}}
        self.f.write(self._json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in tag_values.items():
                self.tb.add_scalar(k, float(v), step)


def training(conf: Config, output_dir: Path, args=None):
    """(reference train.py:188-634)"""
    from .parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    conf.save(output_dir / "config.yaml")
    # code snapshot for reproducibility (reference train.py:689-692)
    if jax.process_index() == 0 and not (output_dir / "code_snapshot").exists():
        import shutil

        try:
            shutil.copytree(
                Path(__file__).parent, output_dir / "code_snapshot",
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
            )
        except OSError:
            pass
    profile = args is not None and getattr(args, "profile", False)
    if profile:
        # (≙ torch.profiler schedule, reference train.py:361-369)
        jax.profiler.start_trace(str(output_dir / "profile"))

    key = set_seed(int(conf.train.seed))
    writer = JSONLWriter(output_dir)

    n_proc = jax.process_count()
    devices = jax.devices()
    dataset = get_dataset(conf.data.name)(conf.data)
    # The per-process batch must divide over the data axis; use the largest
    # device count that divides it (normally all devices).
    per_proc_batch = dataset.batch_size("train")
    n_use = len(devices)
    while n_use > 1 and per_proc_batch % n_use != 0:
        n_use -= 1
    mesh = jax.sharding.Mesh(np.array(devices[:n_use]), ("data",))
    logger.info("Training on %d/%d devices (%d processes), mesh=%s",
                n_use, len(devices), n_proc, mesh)
    model = build_model(conf.model.name, conf.model)

    # init / restore -------------------------------------------------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    engine = bool(getattr(dataset, "device_engine", False))
    pool = val_pool = None
    init_batch = None
    train_loader = dataset.get_data_loader(
        "train", shard=jax.process_index(), num_shards=n_proc
    )
    val_loader = dataset.get_data_loader("val", shard=jax.process_index(), num_shards=n_proc)
    if engine:
        repl0 = NamedSharding(mesh, P())
        pool = jax.device_put(dataset.build_pool("train"), repl0)
        val_pool = jax.device_put(dataset.build_pool("val"), repl0)
        init_batch = jax.jit(dataset.make_batch, static_argnames="split")(
            pool, jax.random.key(0), split="train"
        )
    else:
        for b in train_loader:
            init_batch = filter_batch(b)
            break
        assert init_batch is not None, "empty training loader"
    params = model.init(key, init_batch, method=model.forward_and_loss)
    size = sum(x.size for x in jax.tree.leaves(params))
    logger.info("Model parameters: %.2fM", size / 1e6)

    epoch0, iteration = 0, 0
    best_eval = None
    if conf.train.load_experiment:
        from .utils.experiments import restore_from_flat_dict

        blob, _ = load_experiment(conf.train.load_experiment, best=False)
        params = restore_from_flat_dict(params, blob["state"]["params"])
        logger.info("Loaded params from experiment %s", conf.train.load_experiment)

    tx, schedule = make_optimizer(conf.train, params, conf.model)
    opt_state = tx.init(params)
    if args is not None and getattr(args, "restore", False):
        from .utils.experiments import restore_from_flat_dict

        blob, _ = load_experiment(output_dir.name, best=False)
        params = restore_from_flat_dict(params, blob["state"]["params"])
        opt_state = restore_from_flat_dict(opt_state, blob["state"]["opt_state"])
        epoch0 = blob["epoch"] + 1
        iteration = blob["iteration"]
        logger.info("Restored at epoch %d iter %d", epoch0, iteration)

    plateau = PlateauController(conf.train.lr_schedule)
    if (conf.train.lr_schedule.get("type") == "plateau"
            and str(conf.train.best_key).startswith("bench/")):
        # bench/* metrics only exist at epoch end; the per-iteration val eval
        # never contains them so the plateau controller would see NaN forever
        # (and it assumes lower-is-better, conflicting with best_mode=max).
        logger.warning(
            "lr_schedule.type=plateau with a bench best_key (%s): plateau LR "
            "scheduling watches per-iteration val metrics and will be a no-op "
            "for bench/* keys — use a factor/exp schedule instead.",
            conf.train.best_key,
        )
    # Per-bench model overlays are static: build them ONCE (a fresh Module
    # per epoch defeats XLA's in-process jit cache — multi-minute recompiles
    # through the remote-compile tunnel) and fail fast on overlays that
    # change the param tree (e.g. n_layers) BEFORE paid training time.
    bench_models: dict[str, object] = {}
    if conf.train.run_benchmarks and jax.process_index() == 0:
        for bench in list(conf.train.run_benchmarks):
            bname = bench["name"] if isinstance(bench, dict) else bench.name
            overlay = bench.get("model") if hasattr(bench, "get") else None
            if not overlay:
                bench_models[bname] = model
                continue
            mconf = Config(conf.model).merge(overlay)
            bmodel = build_model(mconf.name, mconf)
            overlay_shapes = jax.eval_shape(
                lambda m=bmodel: m.init(jax.random.key(0), init_batch)
            )
            live_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
            for path, leaf in jax.tree_util.tree_flatten_with_path(overlay_shapes)[0]:
                live = live_flat.get(path)
                if live is None or tuple(live.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"run_benchmarks[{bname}].model overlay changes the "
                        f"param tree at {jax.tree_util.keystr(path)}: live "
                        f"{None if live is None else live.shape} vs overlay "
                        f"{leaf.shape}. Overlays must keep params compatible "
                        "(kp counts, thresholds, gt off — not layer shapes)."
                    )
            bench_models[bname] = bmodel
    train_step, shard_batch, repl_sharding = make_train_step(
        model, tx, mesh, make_batch=dataset.make_batch if engine else None
    )
    eval_forward = make_eval_forward(model, dataset.make_batch if engine else None)
    params = jax.device_put(params, repl_sharding)
    opt_state = jax.device_put(opt_state, repl_sharding)

    # graceful SIGINT (reference train.py:289-297)
    stop = {"flag": False}

    def sigint_handler(signum, frame):
        if stop["flag"]:
            raise KeyboardInterrupt
        logger.info("SIGINT: will stop after this iteration (^C again to kill).")
        stop["flag"] = True

    old_handler = signal.signal(signal.SIGINT, sigint_handler)

    losses_running: dict[str, AverageMetric] = defaultdict(AverageMetric)
    t_last = time.perf_counter()
    samples_since = 0
    try:
        for epoch in range(epoch0, int(conf.train.epochs)):
            train_loader.set_epoch(epoch)
            if conf.train.overfit:
                loader = dataset.get_overfit_loader("train")
            else:
                loader = train_loader
            steps_in_epoch = 0
            for batch in loader:
                if engine:
                    params, opt_state, scalars = train_step(
                        params, opt_state, pool, batch["seed"]
                    )
                else:
                    data = shard_batch(filter_batch(batch))
                    params, opt_state, scalars = train_step(params, opt_state, data)
                iteration += 1
                samples_since += dataset.batch_size("train")
                for k, v in scalars.items():
                    losses_running[k].update(np.asarray(v))
                if iteration % int(conf.train.log_every_iter) == 0:
                    vals = {k: m.compute() for k, m in losses_running.items()}
                    vals["lr"] = float(schedule(iteration))
                    dt = time.perf_counter() - t_last
                    vals["samples_per_sec"] = samples_since / max(dt, 1e-6)
                    writer.write(vals, iteration)
                    logger.info(
                        "[E %d | it %d] loss %.4f | %.1f samples/s",
                        epoch, iteration, vals.get("loss/total", float("nan")),
                        vals["samples_per_sec"],
                    )
                    losses_running.clear()
                    t_last = time.perf_counter()
                    samples_since = 0
                if iteration % int(conf.train.eval_every_iter) == 0 or stop["flag"]:
                    eval_results = do_evaluation(
                        model, params, val_loader, eval_forward, pool=val_pool,
                        writer=writer, step=iteration,
                    )
                    if plateau.update(
                        float(eval_results.get(conf.train.best_key, np.nan))
                    ):
                        opt_state = jax.device_put(
                            set_lr_scale(opt_state, plateau.scale), repl_sharding
                        )
                    writer.write({f"val/{k}": v for k, v in eval_results.items()
                                  if np.isscalar(v) or getattr(v, 'ndim', 1) == 0}, iteration)
                    logger.info("[Validation] %s",
                                {k: round(float(v), 4) for k, v in eval_results.items()
                                 if np.isscalar(v)})
                    best_eval = save_experiment(
                        output_dir,
                        {"params": jax.tree.map(np.asarray, params),
                         "opt_state": jax.tree.map(
                             lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                             opt_state)},
                        conf, epoch, iteration,
                        eval_results=eval_results, best_eval=best_eval,
                        cp_name=f"checkpoint_{epoch}_{iteration}"
                        + ("_interrupted" if stop["flag"] else "") + ".ckpt",
                        keep_last=int(conf.train.keep_last_checkpoints),
                    )
                if stop["flag"]:
                    logger.info("Stopped by SIGINT at iter %d", iteration)
                    return params
                steps_in_epoch += 1
                cap = conf.train.num_steps_per_epoch
                if cap is not None and steps_in_epoch >= int(cap):
                    break
            # end-of-epoch benchmarks on the live params (rank 0). Their
            # summaries feed checkpoint selection: with e.g.
            # train.best_key=bench/hpatches/H_error_ransac_mAA and
            # train.best_mode=max, checkpoint_best tracks REAL eval quality
            # instead of engine-val loss (which round-3 showed is
            # anti-correlated for matcher retrains). Bench-driven best_key
            # is single-host: rank>0 sees no bench metrics and never updates
            # its local best_eval, which only matters for logging.
            bench_results = {}
            bench_due = (epoch + 1) % max(
                int(conf.train.benchmark_every_epoch), 1) == 0
            if conf.train.run_benchmarks and bench_due and jax.process_index() == 0:
                from .eval import run_benchmark

                for bench in list(conf.train.run_benchmarks):
                    bname = bench["name"] if isinstance(bench, dict) else bench.name
                    bconf = bench.get("conf", {}) if hasattr(bench, "get") else {}
                    # per-bench model-conf overlay: run the benchmark at the
                    # EVAL operating point (e.g. 1024 kp, no GT in forward)
                    # with the live params. The round-4 stage-5 run showed
                    # the raw training conf (512 kp, pinned ransac_th)
                    # compresses the selection metric to near-noise; params
                    # are conf-independent so the same tree drops into the
                    # eval-shaped model (prebuilt once, validated above).
                    bmodel = bench_models.get(bname, model)
                    try:
                        s, _ = run_benchmark(
                            bname, bconf, output_dir / "benchmarks" / bname / f"e{epoch}",
                            model=bmodel, params=params,
                        )
                        bench_results.update(
                            {f"bench/{bname}/{k}": v for k, v in s.items()
                             if isinstance(v, (int, float))})
                        writer.write(bench_results, iteration)
                    except FileNotFoundError as e:  # benchmark data absent
                        logger.warning("benchmark %s skipped (no data): %s",
                                       bname, e)
                    except Exception:
                        logger.exception("benchmark %s FAILED", bname)
                        raise
            eval_results = do_evaluation(
                model, params, val_loader, eval_forward, pool=val_pool,
                writer=writer, step=iteration,
            )
            eval_results.update(bench_results)
            best_eval = save_experiment(
                output_dir,
                {"params": jax.tree.map(np.asarray, params),
                 "opt_state": jax.tree.map(
                     lambda x: np.asarray(x) if hasattr(x, "shape") else x, opt_state)},
                conf, epoch, iteration,
                eval_results=eval_results, best_eval=best_eval,
                keep_last=int(conf.train.keep_last_checkpoints),
            )
    finally:
        signal.signal(signal.SIGINT, old_handler)
        if profile:
            jax.profiler.stop_trace()
            logger.info("Wrote profiler trace to %s", output_dir / "profile")
    logger.info("Finished training at epoch %d iter %d", int(conf.train.epochs), iteration)
    return params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment")
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--restore", action="store_true")
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--no_log_capture", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_args()

    conf = Config(default_conf)
    if args.conf:
        conf = conf.merge(Config.load(args.conf))
    conf = conf.merge(Config.from_cli(args.dotlist))
    if args.overfit:
        conf["train.overfit"] = True
    conf.freeze()
    output_dir = TRAINING_PATH / args.experiment
    if args.no_log_capture or jax.process_index() != 0:
        training(conf, output_dir, args)
    else:
        from .utils.stdout_capturing import capture_outputs

        output_dir.mkdir(parents=True, exist_ok=True)
        with capture_outputs(output_dir / "log.txt"):
            training(conf, output_dir, args)


if __name__ == "__main__":
    main()
