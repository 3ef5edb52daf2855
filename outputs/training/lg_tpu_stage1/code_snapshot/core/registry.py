"""Component location by import path (reference: gluefactory/models/__init__.py:7-30,
gluefactory/utils/tools.py:193-226).

Components (models, datasets, estimators) are addressed by string names like
``"matchers.lightglue"`` or any fully-qualified module path. A module can mark
its main class with ``__main_model__`` / ``__main_dataset__``; otherwise the
unique subclass of the expected base defined in that module is used.
"""

from __future__ import annotations

import importlib
import inspect


def import_from_path(path: str):
    return importlib.import_module(path)


def get_class(mod_path: str, base_class: type, attr: str | None = None) -> type:
    """Resolve the component class defined in ``mod_path``.

    Precedence: explicit ``attr`` module attribute (e.g. ``__main_model__``),
    then the unique strict subclass of ``base_class`` defined *in* the module.
    """
    mod = importlib.import_module(mod_path)
    if attr is not None and hasattr(mod, attr):
        return getattr(mod, attr)
    classes = [
        c
        for _, c in inspect.getmembers(mod, inspect.isclass)
        if issubclass(c, base_class) and c is not base_class and c.__module__ == mod_path
    ]
    if len(classes) == 1:
        return classes[0]
    if len(classes) > 1:
        # Prefer the one not subclassed by any other candidate (most derived).
        leaves = [c for c in classes if not any(issubclass(o, c) and o is not c for o in classes)]
        if len(leaves) == 1:
            return leaves[0]
        raise ImportError(f"Ambiguous classes in module {mod_path}: {classes}")
    raise ImportError(f"No subclass of {base_class.__name__} found in {mod_path}")


def resolve_component(name: str, package: str, prefixes: tuple[str, ...], base_class: type,
                      attr: str | None = None) -> type:
    """Try ``package.name``, then ``package.<prefix>.name``, then ``name`` as a
    fully-qualified path."""
    candidates = [f"{package}.{name}"]
    candidates += [f"{package}.{p}.{name}" for p in prefixes]
    candidates.append(name)
    errors = []
    for cand in candidates:
        try:
            return get_class(cand, base_class, attr=attr)
        except ImportError as e:
            errors.append(f"{cand}: {e}")
    raise ImportError("Could not resolve component "
                      f"{name!r}. Tried:\n  " + "\n  ".join(errors))
