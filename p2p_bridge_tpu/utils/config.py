"""Hierarchical config system.

TPU-native re-implementation of the reference's OmegaConf+argparse stack
(reference: utils/args.py:14-143). Provides the same user surface:

  * YAML config files with nested keys,
  * attribute-style access (``cfg.model.PVD.channels``),
  * ``key in cfg`` membership tests and ``cfg.get(key, default)``,
  * free-form ``--a.b.c value`` dot-overrides from leftover argv
    (reference: utils/args.py:78-96),
  * round-trip save of the merged config as ``opt.yaml`` next to
    checkpoints (reference: train.py:210-217).

No OmegaConf dependency — a small dict wrapper keeps the whole config
plain-Python (and therefore hashable-free / jit-safe when read at trace
time as static values).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Iterator, List, Optional

import yaml

_MISSING = object()


def _parse_scalar(text: str) -> Any:
    """Parse a CLI string the way YAML would (int/float/bool/null/list)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


class Config:
    """A nested, attribute-accessible configuration node."""

    __slots__ = ("_data",)

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if data:
            for key, value in data.items():
                self._data[str(key)] = self._wrap(value)

    # -- construction ------------------------------------------------
    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path, "r") as handle:
            data = yaml.safe_load(handle) or {}
        if not isinstance(data, dict):
            raise ValueError(f"Top-level YAML in {path} must be a mapping")
        return cls(data)

    # -- mapping protocol ---------------------------------------------
    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        raise AttributeError(f"Config has no key {name!r}")

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = self._wrap(value)

    def __getitem__(self, name: str) -> Any:
        return self._data[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._data[name] = self._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, name: str, default: Any = None) -> Any:
        return self._data.get(name, default)

    # -- nested access -------------------------------------------------
    def select(self, dotted: str, default: Any = _MISSING) -> Any:
        """Fetch ``a.b.c`` style nested key."""
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, Config) and part in node:
                node = node[part]
            else:
                if default is _MISSING:
                    raise KeyError(dotted)
                return default
        return node

    def set_dotted(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            child = node.get(part)
            if not isinstance(child, Config):
                child = Config()
                node[part] = child
            node = child
        node[parts[-1]] = value

    # -- merge / io ------------------------------------------------------
    def merge(self, other: "Config | Dict[str, Any]") -> "Config":
        """Deep-merge ``other`` on top of ``self`` (other wins). Returns self."""
        if isinstance(other, Config):
            other = other.to_dict()
        for key, value in other.items():
            existing = self._data.get(key)
            if isinstance(existing, Config) and isinstance(value, dict):
                existing.merge(value)
            else:
                self._data[key] = self._wrap(value)
        return self

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(value: Any) -> Any:
            if isinstance(value, Config):
                return value.to_dict()
            if isinstance(value, list):
                return [unwrap(v) for v in value]
            return value

        return {k: unwrap(v) for k, v in self._data.items()}

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def save(self, path: str) -> None:
        with open(path, "w") as handle:
            yaml.safe_dump(self.to_dict(), handle, sort_keys=False)


def apply_dot_overrides(cfg: Config, argv: List[str]) -> List[str]:
    """Consume ``--a.b.c value`` pairs from argv, mirroring the reference's
    free-form override loop (utils/args.py:78-96). Returns unconsumed args."""
    leftover: List[str] = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if "=" in tok:  # --a.b=v and bare a.b=v forms
            key, value = tok.lstrip("-").split("=", 1)
            cfg.set_dotted(key, _parse_scalar(value))
            i += 1
        elif tok.startswith("--") and i + 1 < len(argv):
            key = tok[2:]
            value = argv[i + 1]
            cfg.set_dotted(key, _parse_scalar(value))
            i += 2
        else:
            leftover.append(tok)
            i += 1
    if leftover:
        # a silently-dropped override can cost a whole training run —
        # make it loud
        import logging

        logging.getLogger("p2pb").warning(
            "Unrecognized CLI tokens (ignored): %s", leftover
        )
    return leftover
