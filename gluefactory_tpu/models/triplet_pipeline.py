"""Three-view pipeline (reference: gluefactory/models/triplet_pipeline.py:23-99).

Extracts all three views once, then runs the matcher on the three pairs
(0-1, 0-2, 1-2). Following the reference's ``batch_triplets`` mode, the three
pairs are STACKED into one 3B batch for a single matcher invocation — on TPU
this triples matcher batch utilization instead of looping."""

from __future__ import annotations

from typing import ClassVar

import jax.numpy as jnp

from .two_view_pipeline import TwoViewPipeline


def stack_pairs(x01, x02, x12):
    return jnp.concatenate([x01, x02, x12], axis=0)


def jax_take(v, start, stop, axis):
    sl = [slice(None)] * v.ndim
    sl[axis] = slice(start, stop)
    return v[tuple(sl)]


class TripletPipeline(TwoViewPipeline):
    default_conf: ClassVar[dict] = {"batch_triplets": True}
    required_data_keys: ClassVar[list] = ["view0", "view1", "view2"]

    def _forward(self, data: dict) -> dict:
        pred0 = self.extract_view(data, "0")
        pred1 = self.extract_view(data, "1")
        pred2 = self.extract_view(data, "2")
        pred = {
            **{k + "0": v for k, v in pred0.items()},
            **{k + "1": v for k, v in pred1.items()},
            **{k + "2": v for k, v in pred2.items()},
        }
        if self.matcher is None:
            return pred
        keys = set(pred0.keys())

        def pair_data(a, b, suffix_map):
            d = {
                **{k + "0": pred[f"{k}{a}"] for k in keys},
                **{k + "1": pred[f"{k}{b}"] for k in keys},
            }
            d["view0"] = data[f"view{a}"]
            d["view1"] = data[f"view{b}"]
            if f"T_{a}to{b}" in data:
                d["T_0to1"] = data[f"T_{a}to{b}"]
            if f"H_{a}to{b}" in data:
                d["H_0to1"] = data[f"H_{a}to{b}"]
            return d

        pairs = [pair_data("0", "1", None), pair_data("0", "2", None), pair_data("1", "2", None)]
        if self.conf.batch_triplets:
            # one stacked matcher call over 3B pairs
            import jax

            def cat_tree(*xs):
                return jax.tree.map(lambda *ys: jnp.concatenate(ys, axis=0), *xs)

            stacked = {}
            for k in pairs[0]:
                if k.startswith("view"):
                    stacked[k] = {
                        kk: cat_tree(pairs[0][k][kk], pairs[1][k][kk], pairs[2][k][kk])
                        for kk in pairs[0][k]
                        if hasattr(pairs[0][k][kk], "shape")
                        or hasattr(pairs[0][k][kk], "f")  # Camera pytree
                        or isinstance(pairs[0][k][kk], dict)  # cache dict
                    }
                elif hasattr(pairs[0][k], "shape") or hasattr(pairs[0][k], "R"):
                    stacked[k] = cat_tree(pairs[0][k], pairs[1][k], pairs[2][k])
            m = self.matcher(stacked)
            b = data["view0"]["image"].shape[0] if "image" in data["view0"] else (
                pred["keypoints0"].shape[0]
            )
            for k, v in m.items():
                # desc_layers* stack the LAYER dim first: batch is axis 1
                ax = 1 if k.startswith("desc_layers") else 0
                pred[f"{k}_0to1"] = jax_take(v, 0, b, ax)
                pred[f"{k}_0to2"] = jax_take(v, b, 2 * b, ax)
                pred[f"{k}_1to2"] = jax_take(v, 2 * b, 3 * b, ax)
        else:
            for name, pd in zip(("0to1", "0to2", "1to2"), pairs):
                m = self.matcher(pd)
                for k, v in m.items():
                    pred[f"{k}_{name}"] = v
        return pred

    def loss(self, pred: dict, data: dict):
        """Average the two-view loss over the three pairs
        (reference triplet_pipeline.py:74-99)."""
        losses = {}
        metrics = {}
        total = 0
        for name in ("0to1", "0to2", "1to2"):
            pair_pred = {
                k[: -len(f"_{name}")]: v for k, v in pred.items() if k.endswith(f"_{name}")
            }
            a, b = name[0], name[-1]
            pair_pred.update(
                {k[:-1] + "0": v for k, v in pred.items() if k.endswith(a) and "_" not in k}
            )
            pair_pred.update(
                {k[:-1] + "1": v for k, v in pred.items() if k.endswith(b) and "_" not in k}
            )
            pair_data = {**data}
            pair_data["view0"] = data[f"view{a}"]
            pair_data["view1"] = data[f"view{b}"]
            if f"H_{name}" in data:
                pair_data["H_0to1"] = data[f"H_{name}"]
            if f"T_{name}" in data:
                pair_data["T_0to1"] = data[f"T_{name}"]
            if self.ground_truth is not None:
                gt = self.ground_truth({**pair_data, **pair_pred})
                pair_pred.update({f"gt_{k}" if not k.startswith("gt_") else k: v
                                  for k, v in gt.items()})
            try:
                l, m = self.matcher.loss(pair_pred, {**pair_pred, **pair_data})
            except NotImplementedError:
                continue
            total = total + l["total"]
            for k, v in l.items():
                losses[f"{k}_{name}"] = v
            for k, v in m.items():
                metrics[f"{k}_{name}"] = v
        losses["total"] = total / 3.0
        return losses, metrics


__main_model__ = TripletPipeline
