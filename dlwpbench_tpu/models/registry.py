"""Model registry: explicit name -> class mapping.

Replaces the reference's `eval(cfg.model.type)` instantiation
(`scripts/train.py:54`, `scripts/evaluate.py:140`) with a registry, keeping
the same config `type` strings so reference configs translate 1:1.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_model_class(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model type {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def build_model(model_cfg: dict):
    """Instantiate a model from a config dict with a `type` key.

    Non-constructor keys that the reference carries in model configs
    (e.g. `name`) are passed through if the class declares them.
    """
    cfg = dict(model_cfg)
    cls = get_model_class(cfg.pop("type"))
    fields = getattr(cls, "__dataclass_fields__", {})
    kwargs = {k: v for k, v in cfg.items() if k in fields}
    return cls(**kwargs)


def registered_models() -> list[str]:
    return sorted(_REGISTRY)
