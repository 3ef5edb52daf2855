"""Interactive two-view pair inspector (reference:
gluefactory/visualization/two_view_frame.py — one row of image pairs per
experiment, switchable overlay tools, toggleable per-pair summary text).

Keyboard-driven (works on any matplotlib backend, no toolmanager):
  - ``r`` / ``shift+r``: cycle forward/backward through the available tools
  - ``1``..``9``: jump to the n-th available tool
  - ``t``: toggle the per-experiment summary overlay
Navigation across pairs (left/right/delete) is bound by the parent
:class:`~gluefactory_tpu.visualization.global_frame.GlobalFrame`.
"""

from __future__ import annotations

import numpy as np

from . import viz2d
from .tools import PLOT_TOOLS, _images, _unbatch


def _fmt_summary(summary: dict) -> str:
    parts = []
    for k, v in summary.items():
        try:
            parts.append(f"{k}: {float(v):.4g}")
        except (TypeError, ValueError):
            parts.append(f"{k}: {v}")
    return "\n".join(parts)


class TwoViewFrame:
    default_conf = {
        "default": "matches",
        "summary_visible": False,
    }

    plot_tools = PLOT_TOOLS
    # mouse button that spawned us -> base image layer (reference
    # two_view_frame.py:30 event_to_image)
    event_to_image = [None, "color", "depth", "color+depth"]

    def __init__(self, conf, data, preds, title=None, event=1, summaries=None):
        self.conf = dict(self.default_conf, **(dict(conf) if conf else {}))
        self.data = data
        self.preds = preds
        self.names = list(preds.keys())
        self.plot = self.event_to_image[event if event in (1, 2, 3) else 1]
        self.summaries = summaries
        self.handle = None

        keys = None
        for pred in preds.values():
            keys = set(pred) if keys is None else keys & set(pred)
        keys = (keys or set()) | set(data.keys())
        self.options = [
            name
            for name, tool in self.plot_tools.items()
            if set(tool.required_keys).issubset(keys)
        ]

        self.fig, self.axes, self.summary_arts = self._init_frame()
        self._static_texts = {
            t for row in self.axes for ax in row for t in ax.texts
        }
        self._static_images = {
            im for row in self.axes for ax in row for im in ax.images
        }
        if title is not None and self.fig.canvas.manager is not None:
            try:
                self.fig.canvas.manager.set_window_title(str(title))
            except AttributeError:  # pragma: no cover - backend-dependent
                pass
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self.fig.canvas.mpl_connect("pick_event", self._on_pick)

        if self.conf["default"] not in self.options and self.options:
            self.conf["default"] = self.options[0]
        if self.options:
            self.draw(self.conf["default"])

    # ------------------------------------------------------------------ frame
    def _base_images(self):
        imgs = _images(self.data)
        if self.plot == "depth" and "depth" in self.data.get("view0", {}):
            imgs = [
                np.squeeze(_unbatch(self.data["view0"]["depth"])),
                np.squeeze(_unbatch(self.data["view1"]["depth"])),
            ]
        return imgs

    def _init_frame(self):
        imgs = self._base_images()
        grid = [list(imgs) for _ in self.names]
        fig, axes = viz2d.plot_image_grid(grid)
        for i, name in enumerate(self.names):
            viz2d.add_text(axes[i][0], name, fs=12)
        if (
            self.plot == "color+depth"
            and self.data.get("view0", {}).get("depth") is not None
        ):
            for row in axes:
                for vid, ax in zip(("0", "1"), row):
                    depth = np.squeeze(_unbatch(self.data[f"view{vid}"]["depth"]))
                    viz2d.plot_heatmap(ax, depth, alpha=0.5, cmap="Spectral")
        summary_arts = []
        if self.summaries is not None:
            for i, name in enumerate(self.names):
                summary_arts.append(
                    viz2d.add_text(
                        axes[i][0],
                        _fmt_summary(self.summaries.get(name, {})),
                        pos=(0.01, 0.01),
                        fs=8,
                        va="bottom",
                        backgroundcolor=(0, 0, 0, 0.5),
                        visible=self.conf["summary_visible"],
                    )
                )
        return fig, axes, summary_arts

    # ------------------------------------------------------------------ tools
    def draw(self, name: str):
        """Clear overlays and apply the tool ``name``."""
        self.clear()
        self.conf["default"] = name
        self.handle = self.plot_tools[name](self.fig, self.axes, self.data,
                                           self.preds)
        self.fig.canvas.draw_idle()
        return self.handle

    def clear(self):
        if self.handle is not None and hasattr(self.handle, "clear"):
            self.handle.clear()
        self.handle = None
        for row in self.axes:
            for ax in row:
                for art in list(ax.lines) + list(ax.collections):
                    art.remove()
                # keep the base image + static texts (labels / summaries)
                for txt in list(ax.texts):
                    if txt not in self._static_texts:
                        txt.remove()
                for im in list(ax.images):  # heatmap overlays
                    if im not in self._static_images:
                        im.remove()
        for art in list(self.fig.artists):  # cross-axes match segments
            art.remove()

    # ----------------------------------------------------------------- events
    def _on_key(self, event):
        # matplotlib reports shift+letter as the capital letter
        raw = event.key or ""
        key = raw.lower()
        if key in ("r", "shift+r") and self.options:
            cur = self.options.index(self.conf["default"])
            step = -1 if ("shift" in raw or raw == "R") else 1
            self.draw(self.options[(cur + step) % len(self.options)])
        elif key == "t":
            self.set_summary_visible(not self.conf["summary_visible"])
        elif key.isdigit() and 0 < int(key) <= len(self.options):
            self.draw(self.options[int(key) - 1])

    def _on_pick(self, event):
        art = event.artist
        if hasattr(art, "get_arrowstyle"):  # highlight a picked match segment
            select = art.get_arrowstyle().arrow == "-"
            art.set_arrowstyle("<|-|>" if select else "-")
            if select:
                art.set_zorder(1)
        if hasattr(self.handle, "click_artist"):
            self.handle.click_artist(event)
        self.fig.canvas.draw_idle()

    def set_summary_visible(self, visible: bool):
        self.conf["summary_visible"] = bool(visible)
        for art in self.summary_arts:
            art.set_visible(visible)
        self.fig.canvas.draw_idle()
