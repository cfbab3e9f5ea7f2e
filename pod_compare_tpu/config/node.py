"""Hierarchical, freezable config node with YAML ``_BASE_`` inheritance.

First-party replacement for the yacs ``CfgNode`` the reference builds on
(reference: src/core/setup.py:79-133 adds keys; configs use ``_BASE_``
inheritance, e.g. src/configs/BDD-Detection/retinanet/retinanet_R_50_FPN_1x.yaml:1).
Supports the reference's two-file merge UX: a training config defines the
model, an inference config overlays the fusion method (setup.py:163-166).
"""

import copy
import os
from typing import Any, Dict

import yaml

_FROZEN = "__frozen__"
BASE_KEY = "_BASE_"


class ConfigNode(dict):
    """Attribute-access dict; nested dicts become ConfigNodes; freezable."""

    def __init__(self, init: Dict[str, Any] = None):
        super().__init__()
        object.__setattr__(self, _FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = self._convert(v)

    @classmethod
    def _convert(cls, v):
        if isinstance(v, dict) and not isinstance(v, ConfigNode):
            return cls(v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __setitem__(self, name, value):
        if object.__getattribute__(self, _FROZEN):
            raise AttributeError(f"Cannot set '{name}': config is frozen")
        super().__setitem__(name, self._convert(value))

    def freeze(self):
        object.__setattr__(self, _FROZEN, True)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.freeze()
        return self

    def defrost(self):
        object.__setattr__(self, _FROZEN, False)
        for v in self.values():
            if isinstance(v, ConfigNode):
                v.defrost()
        return self

    def is_frozen(self) -> bool:
        return object.__getattribute__(self, _FROZEN)

    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        out = ConfigNode()
        memo[id(self)] = out
        for k, v in self.items():
            dict.__setitem__(out, k, copy.deepcopy(v, memo))
        return out

    # ---------------------------------------------------------------- merge
    def merge_from_other(self, other: "ConfigNode", allow_new: bool = False):
        """Recursively merge `other` into self.

        Unknown keys raise unless ``allow_new`` — catching config typos the
        same way yacs does for the reference.
        """
        for k, v in other.items():
            if k == BASE_KEY:
                continue
            if k not in self:
                if not allow_new:
                    raise KeyError(f"Non-existent config key: {k}")
                self[k] = v
            elif isinstance(self[k], ConfigNode) and isinstance(v, (dict, ConfigNode)):
                self[k].merge_from_other(ConfigNode._convert(v), allow_new=allow_new)
            else:
                self[k] = _coerce(v, self[k], k)
        return self

    def merge_from_file(self, path: str, allow_new: bool = False):
        loaded = load_yaml_with_base(path)
        return self.merge_from_other(loaded, allow_new=allow_new)

    def merge_from_list(self, opts):
        """Merge from a flat ``[KEY, VALUE, KEY, VALUE...]`` list (CLI opts)."""
        assert len(opts) % 2 == 0, f"Override list has odd length: {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"Non-existent config key: {key}")
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"Non-existent config key: {key}")
            if isinstance(value, str):
                value = _parse_literal(value)
            node[leaf] = _coerce(value, node[leaf], key)
        return self

    def to_dict(self) -> Dict[str, Any]:
        return {
            k: (v.to_dict() if isinstance(v, ConfigNode) else v)
            for k, v in self.items()
        }

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), default_flow_style=None, sort_keys=True)


def _parse_literal(s: str):
    """Parse a CLI string into a Python literal when possible."""
    import ast

    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def _coerce(new, old, key):
    """Allow compatible-type replacement (list<->tuple, int<->float).

    Strings are literal-evaluated when the existing value is not a string —
    matching yacs, so YAML values like ``STEPS: (60000, 80000)`` become
    tuples as they do in the reference's configs.
    """
    if isinstance(new, str) and not isinstance(old, str):
        new = _parse_literal(new)
    if old is None or new is None:
        return new
    if isinstance(new, type(old)):
        return new
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    if isinstance(old, list) and isinstance(new, tuple):
        return list(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, bool) != isinstance(new, bool):
        raise TypeError(f"Type mismatch for key {key}: {type(old)} vs {type(new)}")
    if isinstance(old, (int, float)) and isinstance(new, (int, float)):
        return new
    raise TypeError(f"Type mismatch for key {key}: {type(old)} vs {type(new)}")


def load_yaml_with_base(path: str) -> ConfigNode:
    """Load a YAML file, recursively resolving ``_BASE_`` inheritance."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    cfg = ConfigNode(raw)
    if BASE_KEY in raw:
        base_path = raw[BASE_KEY]
        if not os.path.isabs(base_path):
            base_path = os.path.join(os.path.dirname(path), base_path)
        base = load_yaml_with_base(base_path)
        base.merge_from_other(cfg, allow_new=True)
        return base
    return cfg
