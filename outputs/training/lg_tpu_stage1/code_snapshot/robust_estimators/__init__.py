"""Robust estimator registry (reference: gluefactory/robust_estimators/__init__.py:6-15)."""

from ..core.registry import resolve_component
from .base_estimator import BaseEstimator


def load_estimator(type_: str, name: str) -> type[BaseEstimator]:
    return resolve_component(
        f"{type_}.{name}",
        package="gluefactory_tpu.robust_estimators",
        prefixes=(),
        base_class=BaseEstimator,
        attr="__main_estimator__",
    )
