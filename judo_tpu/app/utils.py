"""Dynamic task/optimizer registration from config dicts.

Reference: judo/app/utils.py:11-44 — classes named by dotted import path in
launch config are imported and registered.
"""

from __future__ import annotations

import importlib
from typing import Any, Mapping


def import_from_string(path: str) -> Any:
    module_name, _, attr = path.rpartition(".")
    if not module_name:
        raise ValueError(f"'{path}' is not a dotted import path")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def register_tasks_from_cfg(cfg: Mapping[str, Any]) -> None:
    """cfg maps task name -> {"task": dotted_path, "config": dotted_path}."""
    from judo_tpu.tasks import register_task

    for name, entry in cfg.items():
        task_cls = import_from_string(entry["task"]) if isinstance(entry, Mapping) else import_from_string(entry)
        config_cls = (
            import_from_string(entry["config"])
            if isinstance(entry, Mapping) and "config" in entry
            else getattr(task_cls, "config_t")
        )
        register_task(name, task_cls, config_cls)


def register_optimizers_from_cfg(cfg: Mapping[str, Any]) -> None:
    """cfg maps optimizer name -> {"optimizer": dotted_path, "config": dotted_path}."""
    from judo_tpu.optimizers import register_optimizer

    for name, entry in cfg.items():
        opt_cls = (
            import_from_string(entry["optimizer"]) if isinstance(entry, Mapping) else import_from_string(entry)
        )
        config_cls = (
            import_from_string(entry["config"])
            if isinstance(entry, Mapping) and "config" in entry
            else getattr(opt_cls, "__orig_bases__", None) and None
        )
        if config_cls is None:
            raise ValueError(f"optimizer registration for '{name}' requires a 'config' entry")
        register_optimizer(name, opt_cls, config_cls)
