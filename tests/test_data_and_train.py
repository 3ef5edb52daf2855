import numpy as np
import jax
import pytest

from gluefactory_tpu.core.config import Config
from gluefactory_tpu.datasets import get_dataset
from gluefactory_tpu.datasets.base_dataset import collate


TINY_DATA = {
    "name": "homographies",
    "synthetic": True,
    "synthetic_size": 16,
    "synthetic_source_size": [160, 120],
    "image_size": 64,
    "train_batch_size": 2,
    "val_batch_size": 2,
    "num_workers": 2,
    "val_size": 4,
}


def test_homography_dataset_shapes_and_gt():
    ds = get_dataset("homographies")(TINY_DATA)
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    assert batch["view0"]["image"].shape == (2, 64, 64, 3)
    assert batch["view1"]["image"].shape == (2, 64, 64, 3)
    assert batch["H_0to1"].shape == (2, 3, 3)
    assert np.isfinite(batch["H_0to1"]).all()
    img = batch["view0"]["image"]
    assert 0.0 <= img.min() and img.max() <= 1.0 and img.std() > 0.01


def test_loader_determinism_and_sharding():
    ds = get_dataset("homographies")(TINY_DATA)
    b1 = next(iter(ds.get_data_loader("train", epoch=0)))
    b2 = next(iter(ds.get_data_loader("train", epoch=0)))
    np.testing.assert_array_equal(b1["view0"]["image"], b2["view0"]["image"])
    b3 = next(iter(ds.get_data_loader("train", epoch=1)))
    assert not np.array_equal(b1["view0"]["image"], b3["view0"]["image"])
    # sharding: two shards cover disjoint items of the same epoch
    l0 = ds.get_data_loader("train", shard=0, num_shards=2, epoch=0)
    l1 = ds.get_data_loader("train", shard=1, num_shards=2, epoch=0)
    i0 = [b["idx"] for b in l0]
    i1 = [b["idx"] for b in l1]
    s0 = set(np.concatenate(i0).tolist())
    s1 = set(np.concatenate(i1).tolist())
    assert len(s0 & s1) == 0
    assert len(l0) == len(l1)


def test_collate_nested():
    samples = [
        {"a": np.zeros((3,)), "b": {"c": 1.0}, "name": "x"},
        {"a": np.ones((3,)), "b": {"c": 2.0}, "name": "y"},
    ]
    out = collate(samples)
    assert out["a"].shape == (2, 3)
    assert out["b"]["c"].shape == (2,)
    assert out["name"] == ["x", "y"]


TINY_MODEL = {
    "name": "two_view_pipeline",
    "extractor": {
        "name": "extractors.superpoint",
        "max_num_keypoints": 48,
        "detection_threshold": 0.0,
        "channels": [8, 8, 16, 16, 32, 32, 32, 32],
        "head_channels": 32,
        "descriptor_dim": 32,
        "trainable": False,
    },
    "matcher": {
        "name": "matchers.lightglue",
        "input_dim": 32,
        "descriptor_dim": 32,
        "n_layers": 2,
        "num_heads": 2,
        "checkpointed": False,
        "flash": False,
    },
    "ground_truth": {"name": "matchers.homography_matcher"},
    "run_gt_in_forward": True,
}


@pytest.mark.slow
def test_training_smoke(tmp_path):
    """End-to-end: synthetic data -> pipeline -> sharded train step -> ckpt."""
    from gluefactory_tpu.train import default_conf, training

    conf = Config(default_conf).merge(
        {
            "data": TINY_DATA,
            "model": TINY_MODEL,
            "train": {
                "seed": 0,
                "epochs": 1,
                "lr": 1e-4,
                "log_every_iter": 2,
                "eval_every_iter": 4,
                "num_steps_per_epoch": 4,
                "keep_last_checkpoints": 2,
            },
        }
    )
    conf.freeze()
    params = training(conf, tmp_path / "exp")
    leaves = jax.tree.leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    ckpts = list((tmp_path / "exp").glob("checkpoint_*.ckpt"))
    assert len(ckpts) >= 1
    metrics_file = tmp_path / "exp" / "metrics.jsonl"
    assert metrics_file.exists() and metrics_file.read_text().strip()
    # restore roundtrip
    from gluefactory_tpu.utils.experiments import load_experiment

    blob, conf2 = load_experiment(ckpts[-1])
    assert "params" in blob["state"]
    assert conf2.model.name == "two_view_pipeline"


@pytest.mark.slow
def test_training_benchmark_hook_with_model_overlay(tmp_path):
    """run_benchmarks hook end-to-end: per-epoch hpatches benchmark on the
    live params, with a per-bench MODEL overlay rebuilding the pipeline at
    an eval operating point (more keypoints, no GT in forward) — the
    round-4 stage-5 lesson: scoring checkpoints at the raw training conf
    (few kp, pinned ransac_th) compresses the selection metric to noise.
    Asserts bench metrics land in metrics.jsonl and checkpoint_best tracks
    the bench best_key."""
    import json

    import cv2

    from gluefactory_tpu.train import default_conf, training

    seq = tmp_path / "hp" / "v_tiny"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(7)
    img = (rng.uniform(0, 255, (96, 128)) // 64 * 80).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)  # .ppm needs 3 channels
    for i in range(1, 7):
        cv2.imwrite(str(seq / f"{i}.ppm"), img)
        if i > 1:
            np.savetxt(seq / f"H_1_{i}", np.eye(3))
    conf = Config(default_conf).merge(
        {
            "data": TINY_DATA,
            "model": TINY_MODEL,
            "train": {
                "seed": 0,
                "epochs": 1,
                "lr": 1e-4,
                "log_every_iter": 2,
                "eval_every_iter": 4,
                "num_steps_per_epoch": 2,
                "best_key": "bench/hpatches/H_error_ransac_mAA",
                "best_mode": "max",
                "run_benchmarks": [
                    {
                        "name": "hpatches",
                        "conf": {
                            "data": {
                                "data_dir": str(tmp_path / "hp"),
                                "preprocessing": {"resize": 96},
                                "num_workers": 0,
                            },
                            "eval": {"num_hypotheses": 64},
                        },
                        "model": {
                            "extractor": {"max_num_keypoints": 64},
                            # a 2-step-trained random matcher scores ~1e-6 —
                            # the default filter_threshold drops everything
                            "matcher": {"filter_threshold": 0.0},
                            "ground_truth": {"name": None},
                            "run_gt_in_forward": False,
                        },
                    }
                ],
            },
        }
    )
    conf.freeze()
    training(conf, tmp_path / "exp")
    lines = [json.loads(l) for l in
             (tmp_path / "exp" / "metrics.jsonl").read_text().splitlines()]
    bench = [d for d in lines if "bench/hpatches/H_error_ransac_mAA" in d]
    assert bench, "bench metrics never logged"
    assert np.isfinite(bench[-1]["bench/hpatches/H_error_ransac_mAA"])
    # the overlay applied: eval ran at 64 kp, not the training conf's 48
    assert bench[-1]["bench/hpatches/mnum_keypoints"] == 64.0
    # the overlaid matcher (filter_threshold 0) produces matches — a random
    # 2-layer matcher's few mutual survivors, not zero (r4 red-test root
    # cause: default threshold drops all ~1e-6 random scores)
    assert bench[-1]["bench/hpatches/mnum_matches"] > 0.0
    assert (tmp_path / "exp" / "checkpoint_best.ckpt").exists()


@pytest.mark.slow
def test_finetune_from_experiment(tmp_path, monkeypatch):
    """train -> checkpoint -> fine-tune via train.load_experiment end-to-end
    (the restore path that wedged on the TPU tunnel must be sound on CPU)."""
    import gluefactory_tpu.utils.experiments as exp_mod
    from gluefactory_tpu.train import default_conf, training

    monkeypatch.setattr(exp_mod, "TRAINING_PATH", tmp_path)
    base = Config(default_conf).merge(
        {
            "data": TINY_DATA,
            "model": TINY_MODEL,
            "train": {"seed": 0, "epochs": 1, "num_steps_per_epoch": 2,
                      "log_every_iter": 2, "eval_every_iter": 100},
        }
    )
    base.freeze()
    training(base, tmp_path / "expA")
    ft = Config(default_conf).merge(
        {
            "data": TINY_DATA,
            "model": TINY_MODEL,
            "train": {"seed": 1, "epochs": 1, "num_steps_per_epoch": 2,
                      "log_every_iter": 2, "eval_every_iter": 100,
                      "load_experiment": "expA"},
        }
    )
    ft.freeze()
    params = training(ft, tmp_path / "expB")
    import jax

    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params))


def test_lr_scaling_and_plateau():
    import jax.numpy as jnp
    import optax
    from gluefactory_tpu.core.config import Config as C
    from gluefactory_tpu.train import (
        PlateauController,
        lr_scaling_masks,
        make_optimizer,
        set_lr_scale,
    )

    params = {
        "params": {
            "backbone": {"conv0": {"kernel": jnp.ones((2, 2))}},
            "head": {"dense": {"kernel": jnp.ones((2, 2))}},
        }
    }
    masks = lr_scaling_masks(params, [[0.1, ["backbone"]]])
    assert len(masks) == 1 and masks[0][0] == 0.1
    tconf = C(
        {"optimizer": "sgd", "optimizer_options": {}, "lr": 1.0,
         "lr_schedule": {"type": None}, "clip_grad": None,
         "lr_scaling": [[0.1, ["backbone"]]]}
    )
    tx, _ = make_optimizer(tconf, params, C({}))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, state = tx.update(grads, state, params)
    flat = {"/".join(k): v for k, v in
            __import__("flax").traverse_util.flatten_dict(upd).items()}
    bb = [v for k, v in flat.items() if "backbone" in k][0]
    hd = [v for k, v in flat.items() if "head" in k][0]
    # backbone updates scaled 0.1x relative to head
    np.testing.assert_allclose(np.asarray(bb), 0.1 * np.asarray(hd), rtol=1e-6)
    # plateau: runtime LR multiplier through the injected hyperparam
    state2 = set_lr_scale(state, 0.5)
    upd2, _ = tx.update(grads, state2, params)
    flat2 = {"/".join(k): v for k, v in
             __import__("flax").traverse_util.flatten_dict(upd2).items()}
    hd2 = [v for k, v in flat2.items() if "head" in k][0]
    np.testing.assert_allclose(np.asarray(hd2), 0.5 * np.asarray(hd), rtol=1e-6)
    pc = PlateauController(C({"type": "plateau", "patience": 2, "factor": 0.5}))
    assert not pc.update(1.0) and not pc.update(1.1)
    assert pc.update(1.2) and pc.scale == 0.5  # two bad evals -> reduce
