"""Model framework (reference: gluefactory/models/base_model.py:13-157).

Models are flax.linen Modules whose single constructor argument is a frozen
`Config`. The reference's metaclass-based ``default_conf`` accumulation over
the class hierarchy (base_model.py:13-22) is reproduced by walking the MRO in
``collect_default_conf``; configs are frozen (struct) after merging.

Contract (kept from the reference so configs/benchmarks translate 1:1):
  - ``model(data) -> pred``: dict of batched arrays in, dict out;
  - ``model.loss(pred, data) -> (losses, metrics)``: both dicts of (B,)
    arrays with a ``total`` entry in losses;
  - ``required_data_keys`` are checked on every call;
  - ``conf.trainable = False`` marks the sub-model's parameters as frozen —
    enforced by the trainer through an optax mask over the param tree path
    (JAX params are immutable, so "freezing" is an optimizer property here).
"""

from __future__ import annotations

from typing import Any, ClassVar

import flax.linen as nn

from ..core.config import Config
from ..core.registry import resolve_component


class BaseModel(nn.Module):
    conf: Config

    default_conf: ClassVar[dict] = {
        "name": None,
        "trainable": True,
        "timeit": False,
    }
    required_data_keys: ClassVar[list] = []

    @classmethod
    def collect_default_conf(cls) -> Config:
        merged: dict = {}
        for klass in reversed(cls.__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged = Config(merged).merge(dc).to_dict()
        return Config(merged)

    @classmethod
    def from_conf(cls, conf: Config | dict | None = None) -> "BaseModel":
        final = cls.collect_default_conf().merge(conf or {})
        final.freeze()
        return cls(conf=final)

    def __call__(self, data: dict) -> dict:
        for key in self.required_data_keys:
            if key not in data:
                raise KeyError(
                    f"{type(self).__name__} requires data key {key!r}; got {list(data)}"
                )
        return self._forward(data)

    def _forward(self, data: dict) -> dict:
        raise NotImplementedError

    def loss(self, pred: dict, data: dict) -> tuple[dict, dict]:
        raise NotImplementedError

    def forward_and_loss(self, data: dict):
        """Forward + loss in one trace — use as ``method=`` for ``init`` so
        loss-only submodules (e.g. deep-supervision heads) get parameters."""
        pred = self(data)
        try:
            return pred, self.loss(pred, data)
        except (NotImplementedError, KeyError):
            # loss not defined, or GT keys absent at init time — forward-only
            return pred, None

    def metrics(self, pred: dict, data: dict) -> dict:
        return {}


def get_model(name: str) -> type[BaseModel]:
    """Resolve a model class by short or fully-qualified name
    (reference models/__init__.py:7-30): tries ``models.<name>``,
    ``models.extractors.<name>``, ``models.matchers.<name>``,
    ``models.lines.<name>``, then ``name`` as a module path; a module may
    export ``__main_model__``."""
    return resolve_component(
        name,
        package="gluefactory_tpu.models",
        prefixes=("extractors", "matchers", "lines"),
        base_class=BaseModel,
        attr="__main_model__",
    )


def build_model(name: str, conf: Config | dict | None = None) -> BaseModel:
    return get_model(name).from_conf(conf)


def make_submodel(conf: Config | dict | Any) -> BaseModel:
    """Instantiate a sub-model from a conf dict holding a ``name`` key —
    the composite-pipeline idiom (reference two_view_pipeline.py:44-60)."""
    if isinstance(conf, dict):
        conf = Config(conf)
    return build_model(conf.name, conf)
