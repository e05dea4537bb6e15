"""Configuration system.

Equivalent of the host framework's `Framework.Configurable` two-tier config
(reference usage: Trainer.py:16-67, Model.py:540-542, Renderer.py:45-49, and
the YAML round-trip in fastergs_garden.yaml): classes declare defaults via a
decorator; a YAML file overrides them; nested parameter lists supported;
callback activation windows can reference config values by dotted string
names (Trainer.py:117,144 — e.g. 'FILTER_3D.USE').
"""

from __future__ import annotations

import copy
from typing import Any


class ConfigParameterList:
    """Nested attribute bag (host Framework.ConfigParameterList)."""

    def __init__(self, **kwargs: Any) -> None:
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __repr__(self) -> str:
        return f'ConfigParameterList({vars(self)})'

    def to_dict(self) -> dict:
        out = {}
        for k, v in vars(self).items():
            out[k] = v.to_dict() if isinstance(v, ConfigParameterList) else v
        return out

    @classmethod
    def from_dict(cls, d: dict) -> 'ConfigParameterList':
        node = cls()
        for k, v in d.items():
            setattr(node, k, cls.from_dict(v) if isinstance(v, dict) else v)
        return node

    def merge(self, other: dict) -> None:
        """Recursively overrides values from a plain dict."""
        for k, v in other.items():
            current = getattr(self, k, None)
            if isinstance(current, ConfigParameterList) and isinstance(v, dict):
                current.merge(v)
            else:
                setattr(self, k, v)

    def resolve(self, dotted: str) -> Any:
        """Resolves 'FILTER_3D.USE'-style dotted names."""
        node: Any = self
        for part in dotted.split('.'):
            node = getattr(node, part)
        return node


class Configurable:
    """Mixin: classes call `configure(**defaults)` as a decorator; instances
    get a deep copy of the defaults as attributes, overridable via kwargs."""

    _config_defaults: dict = {}

    @staticmethod
    def configure(**defaults: Any):
        def decorator(cls):
            cls._config_defaults = defaults
            return cls
        return decorator

    def apply_config(self, overrides: dict | None = None) -> None:
        for k, v in self._config_defaults.items():
            setattr(self, k, copy.deepcopy(v))
        if overrides:
            for k, v in overrides.items():
                current = getattr(self, k, None)
                if isinstance(current, ConfigParameterList) and isinstance(v, dict):
                    current.merge(v)
                else:
                    setattr(self, k, v)

    def resolve_config(self, name_or_value: Any) -> Any:
        """Callback windows reference config attributes by string name
        (reference: Trainer.py:117 etc.)."""
        if isinstance(name_or_value, str):
            node: Any = self
            for part in name_or_value.split('.'):
                node = getattr(node, part)
            return node
        return name_or_value


def load_yaml_config(path: str) -> ConfigParameterList:
    import yaml
    with open(path) as f:
        data = yaml.safe_load(f)
    return ConfigParameterList.from_dict(data or {})


def save_yaml_config(config: ConfigParameterList, path: str) -> None:
    import yaml
    with open(path, 'w') as f:
        yaml.safe_dump(config.to_dict(), f, sort_keys=False)
