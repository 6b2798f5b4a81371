"""Reflection instantiation + small helpers
(reference: allrank/utils/python_utils.py:5-20, allrank/utils/config_utils.py:8-24)."""

from __future__ import annotations

import importlib
from contextlib import contextmanager
from typing import Any, List

from allrank_tpu.config import NameArgsConfig


def instantiate_class(full_name: str, **kwargs):
    """Import `pkg.mod.Class` by dotted path and construct it with kwargs.

    Class paths rooted at the reference package (``allrank.``) are remapped to
    ``allrank_tpu.`` so existing click-model configs carry over unchanged."""
    if full_name.startswith("allrank."):
        full_name = "allrank_tpu." + full_name[len("allrank."):]
    module_name, class_name = full_name.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, class_name)(**kwargs)


def instantiate_from_recursive_name_args(name_args: NameArgsConfig):
    """Build arbitrary object trees from nested {"name": fqcn, "args": {...}}
    (used for click-model configs)."""

    def instantiate_if_name_args(o: Any):
        if isinstance(o, NameArgsConfig):
            return instantiate_from_recursive_name_args(o)
        if isinstance(o, dict) and set(o.keys()) == {"name", "args"}:
            return instantiate_from_recursive_name_args(NameArgsConfig(**o))
        return o

    instantiated_args = {
        k: instantiate_if_name_args(v) for k, v in (name_args.args or {}).items()
    }
    return instantiate_class(name_args.name, **instantiated_args)


def all_equal(values: List[Any]) -> bool:
    return len(set(values)) == 1


@contextmanager
def dummy_context_mgr():
    """No-op context manager (reference: allrank/utils/python_utils.py:11-13)."""
    yield None
