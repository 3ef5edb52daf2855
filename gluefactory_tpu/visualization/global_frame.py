"""Interactive cross-experiment result browser (reference:
gluefactory/visualization/global_frame.py — per-pair metric scatter across
experiments; clicking a point opens a TwoViewFrame on that pair).

Keyboard/mouse (backend-agnostic, no matplotlib toolmanager):
  - click a scatter point: open the pair viewer (left button = color images,
    middle = depth, right = color+depth)
  - hover: connect the same pair across experiments
  - ``x`` / ``shift+x``: cycle the x metric, ``y`` / ``shift+y``: the y metric
  - ``d``: toggle diff-to-first-experiment mode
  - in a child frame: ``left``/``right`` move to the previous/next pair
    (``shift+`` keeps the current window open), ``delete`` closes it
"""

from __future__ import annotations

import functools
import traceback

import matplotlib.pyplot as plt
import numpy as np

from ..datasets.base_dataset import collate
from ..models.cache_loader import CacheLoader


class GlobalFrame:
    default_conf = {
        "x": None,
        "y": None,
        "diff": False,
        "child": {},
    }

    def __init__(self, conf, results, loader, predictions, title=None,
                 child_frame=None):
        self.conf = dict(self.default_conf, **(dict(conf) if conf else {}))
        self.results = results
        self.loader = loader
        self.predictions = dict(predictions)
        self.child_frame = child_frame
        self.names = list(results)
        self.childs = []
        self.lines = []
        self.scatters = {}

        metrics = set()
        for res in results.values():
            metrics.update(k for k in res if k != "names")
        self.metrics = sorted(metrics)
        if self.conf["x"] not in self.metrics:
            self.conf["x"] = self.metrics[0]
        if self.conf["y"] not in self.metrics:
            self.conf["y"] = self.metrics[min(1, len(self.metrics) - 1)]

        self.fig, self.axes = plt.subplots(figsize=(9, 7))
        if title is not None and self.fig.canvas.manager is not None:
            try:
                self.fig.canvas.manager.set_window_title(str(title))
            except AttributeError:  # pragma: no cover
                pass
        self.fig.canvas.mpl_connect("pick_event", self._on_pick)
        self.fig.canvas.mpl_connect("motion_notify_event", self._on_hover)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self.draw()

    # ------------------------------------------------------------------- draw
    def _metric(self, name: str, key: str) -> np.ndarray:
        vals = np.asarray(self.results[name][key])
        if vals.dtype.kind in "SU":  # categorical (e.g. scene names)
            return vals.astype(str)
        return vals.astype(float)

    def draw(self):
        self.scatters = {}
        self.lines = []
        ax = self.axes
        ax.clear()
        kx, ky = self.conf["x"], self.conf["y"]
        ax.set_xlabel(kx + (" (diff to %s)" % self.names[0]
                            if self.conf["diff"] else ""))
        ax.set_ylabel(ky)
        ax.set_title("click a point to open the pair; x/y/d keys re-plot")

        x0 = self._metric(self.names[0], kx)
        y0 = self._metric(self.names[0], ky)
        x_cat = x0.dtype.kind in "SU"
        y_cat = y0.dtype.kind in "SU"
        refx = 0.0 if (x_cat or not self.conf["diff"]) else np.nan_to_num(x0)
        refy = 0.0 if (y_cat or not self.conf["diff"]) else np.nan_to_num(y0)

        for name in self.names:
            x = self._metric(name, kx)
            y = self._metric(name, ky)
            if x_cat:  # stable integer coding in first-experiment order
                _, x = np.unique(x, return_inverse=True)
            else:
                x = np.nan_to_num(x) - refx
            if y_cat:
                _, y = np.unique(y, return_inverse=True)
            else:
                y = np.nan_to_num(y) - refy
            (s,) = ax.plot(x, y, "o", markersize=3, label=name, picker=True,
                           pickradius=5)
            self.scatters[name] = s
            if x_cat and not y_cat:
                # per-category mean step curve (reference global_frame.py:128)
                xu, xinv, xcnt = np.unique(x, return_inverse=True,
                                           return_counts=True)
                ax.step(xu, np.bincount(xinv, weights=y) / xcnt, where="mid",
                        color=s.get_color(), alpha=0.8)
            if not x_cat:
                ax.axvline(x.mean(), c=s.get_color(), alpha=0.4, zorder=0)
            if not y_cat:
                ax.axhline(y.mean(), c=s.get_color(), alpha=0.4, zorder=0)
        ax.legend()
        self.fig.canvas.draw_idle()

    # ------------------------------------------------------------------ child
    def spawn_child(self, model_name: str, ind: int, event=1):
        for line in self.lines:
            line.remove()
        self.lines = []
        sx = self.scatters[model_name]
        xs, ys = np.asarray(sx.get_xdata()), np.asarray(sx.get_ydata())
        for other in self.names:
            so = self.scatters[other]
            (ln,) = self.axes.plot(
                [xs[ind], np.asarray(so.get_xdata())[ind]],
                [ys[ind], np.asarray(so.get_ydata())[ind]], "r",
            )
            self.lines.append(ln)
        self.fig.canvas.draw_idle()
        if self.child_frame is None:
            return None

        data = collate([self.loader._get_one(ind)])
        preds = {
            name: CacheLoader({"path": str(pfile)})(data)
            for name, pfile in self.predictions.items()
        }
        summaries_i = {
            name: {
                k: np.asarray(v)[ind]
                for k, v in res.items()
                if k != "names" and np.ndim(v) >= 1 and ind < len(v)
            }
            for name, res in self.results.items()
        }
        pair_name = data.get("name", [f"pair {ind}"])[0]
        frame = self.child_frame(
            self.conf["child"], data, preds, title=pair_name, event=event,
            summaries=summaries_i,
        )
        frame.fig.canvas.mpl_connect(
            "key_press_event",
            functools.partial(self._on_child_key, frame=frame, ind=ind,
                              event=event),
        )
        self.childs.append(frame)
        if hasattr(frame.fig, "show"):
            try:
                frame.fig.show()
            except Exception:  # pragma: no cover - headless backends
                pass
        return frame

    # ----------------------------------------------------------------- events
    def _on_pick(self, handle):
        try:
            button = getattr(handle.mouseevent.button, "value", 1)
            self.spawn_child(handle.artist.get_label(), int(handle.ind[0]),
                             event=int(button))
        except Exception:  # pragma: no cover - keep the UI alive
            traceback.print_exc()

    def _on_hover(self, event):
        if event.inaxes != self.axes:
            return
        for s in self.scatters.values():
            cont, info = s.contains(event)
            if not cont:
                continue
            ind = info["ind"][0]
            for line in self.lines:
                line.remove()
            self.lines = []
            xd, yd = np.asarray(s.get_xdata()), np.asarray(s.get_ydata())
            for other in self.names:
                so = self.scatters[other]
                (ln,) = self.axes.plot(
                    [xd[ind], np.asarray(so.get_xdata())[ind]],
                    [yd[ind], np.asarray(so.get_ydata())[ind]],
                    "black", zorder=0, alpha=0.5,
                )
                self.lines.append(ln)
            self.fig.canvas.draw_idle()
            break

    def _cycle(self, axis: str, step: int):
        cur = self.metrics.index(self.conf[axis])
        self.conf[axis] = self.metrics[(cur + step) % len(self.metrics)]
        self.draw()

    def _on_key(self, event):
        # matplotlib reports shift+letter as the capital letter
        key = event.key or ""
        reverse = "shift" in key or key.isupper()
        if key in ("x", "X", "shift+x"):
            self._cycle("x", -1 if reverse else 1)
        elif key in ("y", "Y", "shift+y"):
            self._cycle("y", -1 if reverse else 1)
        elif key in ("d", "D"):
            self.conf["diff"] = not self.conf["diff"]
            self.draw()

    def _on_child_key(self, key_event, frame, ind, event):
        key = key_event.key or ""
        if key == "delete":
            plt.close(frame.fig)
            if frame in self.childs:
                self.childs.remove(frame)
        elif key in ("left", "right", "shift+left", "shift+right"):
            if not key.startswith("shift+"):
                plt.close(frame.fig)
                if frame in self.childs:
                    self.childs.remove(frame)
            step = 1 if key.endswith("right") else -1
            n = len(self.loader.dataset)
            self.spawn_child(self.names[0], (ind + step) % n, event=event)
