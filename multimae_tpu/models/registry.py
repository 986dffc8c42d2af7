"""Model registry + builder.

Same API shape as the reference's `@register_model` / `create_model`
(reference: utils/registry.py:26-51, utils/model_builder.py:29-76), kept
minimal: a global name -> factory table.
"""

from __future__ import annotations

import sys
from typing import Any, Callable, Dict

_ENTRYPOINTS: Dict[str, Callable[..., Any]] = {}


def register_model(fn: Callable[..., Any]) -> Callable[..., Any]:
    name = fn.__name__
    _ENTRYPOINTS[name] = fn
    module = sys.modules.get(fn.__module__)
    if module is not None and hasattr(module, "__all__"):
        if name not in module.__all__:
            module.__all__.append(name)
    return fn


def model_entrypoint(name: str) -> Callable[..., Any]:
    if name not in _ENTRYPOINTS:
        raise RuntimeError(f"Unknown model: {name}. Known: {sorted(_ENTRYPOINTS)}")
    return _ENTRYPOINTS[name]


def list_models() -> list[str]:
    return sorted(_ENTRYPOINTS)


def is_model(name: str) -> bool:
    return name in _ENTRYPOINTS


def create_model(name: str, **kwargs: Any) -> Any:
    """Instantiate a registered model configuration by name."""
    return model_entrypoint(name)(**kwargs)
