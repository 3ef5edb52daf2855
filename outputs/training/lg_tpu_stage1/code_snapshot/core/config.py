"""Hierarchical configuration with deep-merge, dot access, and freezing.

A dependency-free stand-in for the reference's OmegaConf usage
(reference: gluefactory/models/base_model.py:13-22,65-90 and train.py:43-78):
  - ``Config`` wraps a nested dict with attribute access,
  - ``merge`` deep-merges overrides over defaults,
  - ``"???"`` (MISSING) marks mandatory values; reading one raises,
  - ``freeze()`` makes the config read-only and "struct": assigning an unknown
    key raises, which catches typos in experiment configs,
  - YAML and CLI-dotlist loading for experiment scripts.

Configs are plain data (hashable once frozen), so they can be used as static
arguments to jitted functions without retracing surprises.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml

MISSING = "???"


class MissingValueError(KeyError):
    pass


def _wrap(value: Any, parent: "Config") -> Any:
    if isinstance(value, Config):
        cfg = Config(value.to_dict())
        cfg._frozen = parent._frozen
        return cfg
    if isinstance(value, Mapping):
        cfg = Config(value)
        cfg._frozen = parent._frozen
        return cfg
    if isinstance(value, (list, tuple)):
        return [
            _wrap(v, parent) if isinstance(v, (Mapping, list, tuple)) else v for v in value
        ]
    return value


class Config:
    """Nested dict with attribute access, deep merge, and struct freezing."""

    __slots__ = ("_data", "_frozen")

    def __init__(self, data: Mapping | None = None, **kwargs):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_frozen", False)
        if data is not None:
            if isinstance(data, Config):
                data = data.to_dict()
            for k, v in data.items():
                self._data[k] = _wrap(v, self)
        for k, v in kwargs.items():
            self._data[k] = _wrap(v, self)

    # -- access ------------------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            value = self._data[key]
        except KeyError:
            raise AttributeError(f"Config has no key {key!r}; keys: {list(self._data)}")
        if isinstance(value, str) and value == MISSING:
            raise MissingValueError(f"Mandatory config key {key!r} is not set")
        return value

    def __getitem__(self, key: str) -> Any:
        if "." in key:
            head, rest = key.split(".", 1)
            return self.__getattr__(head)[rest]
        return self.__getattr__(key)

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except (AttributeError, KeyError):
            return default

    def __setattr__(self, key: str, value: Any):
        if key.startswith("_"):
            object.__setattr__(self, key, value)
            return
        if self._frozen:
            if key not in self._data:
                raise KeyError(f"Config is frozen (struct); unknown key {key!r}")
            raise RuntimeError(f"Config is frozen; cannot set {key!r}")
        self._data[key] = _wrap(value, self)

    def __setitem__(self, key: str, value: Any):
        if "." in key:
            head, rest = key.split(".", 1)
            if head not in self._data or not isinstance(self._data[head], Config):
                if self._frozen:
                    raise KeyError(f"Config is frozen; unknown key {head!r}")
                self._data[head] = Config()
            self._data[head][rest] = value
        else:
            self.__setattr__(key, value)

    def __contains__(self, key: str) -> bool:
        if "." in key:
            head, rest = key.split(".", 1)
            sub = self._data.get(head)
            return isinstance(sub, Config) and rest in sub
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def __len__(self) -> int:
        return len(self._data)

    # -- merge / freeze ----------------------------------------------------
    def merge(self, *others: Mapping | None) -> "Config":
        """Return a new Config: ``others`` override ``self`` (deep merge)."""
        out = self.to_dict()
        for other in others:
            if other is None:
                continue
            if isinstance(other, Config):
                other = other.to_dict()
            _deep_merge(out, other)
        return Config(out)

    def freeze(self) -> "Config":
        object.__setattr__(self, "_frozen", True)
        for v in self._data.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    @property
    def frozen(self) -> bool:
        return self._frozen

    def check_no_missing(self, prefix: str = ""):
        for k, v in self._data.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, Config):
                v.check_no_missing(path)
            elif isinstance(v, str) and v == MISSING:
                raise MissingValueError(f"Mandatory config key {path!r} is not set")

    # -- io ----------------------------------------------------------------
    def to_dict(self) -> dict:
        out = {}
        for k, v in self._data.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, Config) else copy.deepcopy(x) for x in v]
            else:
                out[k] = copy.deepcopy(v)
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def save(self, path: str | Path):
        Path(path).write_text(self.to_yaml())

    @classmethod
    def load(cls, path: str | Path) -> "Config":
        data = yaml.safe_load(Path(path).read_text())
        return cls(data or {})

    @classmethod
    def from_cli(cls, dotlist: list[str]) -> "Config":
        """Parse ``key.sub=value`` CLI overrides (values parsed as YAML)."""
        cfg = cls()
        for item in dotlist:
            if "=" not in item:
                raise ValueError(f"CLI override must be key=value, got {item!r}")
            key, value = item.split("=", 1)
            cfg[key.strip()] = yaml.safe_load(value)
        return cfg

    def __repr__(self) -> str:
        return f"Config({self.to_dict()})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, Mapping):
            return self.to_dict() == dict(other)
        return NotImplemented

    def __hash__(self):
        return hash(_hashable(self.to_dict()))

    def __deepcopy__(self, memo):
        return Config(self.to_dict())


def _deep_merge(base: dict, override: Mapping):
    for k, v in override.items():
        if isinstance(v, Config):
            v = v.to_dict()
        if k in base and isinstance(base[k], dict) and isinstance(v, Mapping):
            _deep_merge(base[k], v)
        else:
            base[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v


def _hashable(obj: Any):
    if isinstance(obj, dict):
        return tuple(sorted((k, _hashable(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_hashable(v) for v in obj)
    return obj
