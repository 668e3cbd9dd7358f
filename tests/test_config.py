"""Override-registry semantics tests (reference: tests/test_config.py there)."""

import dataclasses
import warnings

import numpy as np
import pytest

from judo_tpu.config import OverridableConfig, set_config_overrides


@dataclasses.dataclass
class DemoConfig(OverridableConfig):
    a: float = 1.0
    b: int = 2
    arr: np.ndarray = dataclasses.field(default_factory=lambda: np.array([1.0, 2.0]))


def test_set_override_applies_registered_values():
    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    cfg = DemoConfig()
    cfg.set_override("taskx")
    assert cfg.a == 5.0
    assert cfg.b == 2


def test_set_override_resets_unlisted_fields():
    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    cfg = DemoConfig(b=99)
    cfg.set_override("taskx")
    assert cfg.b == 2  # reset to default
    cfg2 = DemoConfig(b=99)
    cfg2.set_override("taskx", reset_to_defaults=False)
    assert cfg2.b == 99


def test_default_factory_reset():
    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    cfg = DemoConfig()
    cfg.arr = np.array([9.0])
    cfg.set_override("taskx")
    np.testing.assert_array_equal(cfg.arr, np.array([1.0, 2.0]))


def test_unknown_key_resets_everything():
    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    cfg = DemoConfig(a=7.0)
    cfg.set_override("other_task")
    assert cfg.a == 1.0


def test_unknown_field_warns():
    with pytest.warns(UserWarning):
        set_config_overrides("taskx", DemoConfig, {"nope": 1})
    cfg = DemoConfig()
    cfg.set_override("taskx")  # should not raise


def test_instances_independent():
    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    c1, c2 = DemoConfig(), DemoConfig()
    c1.set_override("taskx")
    assert c2.a == 1.0


def test_subclass_inherits_base_overrides():
    @dataclasses.dataclass
    class SubConfig(DemoConfig):
        c: float = 3.0

    set_config_overrides("taskx", DemoConfig, {"a": 5.0})
    set_config_overrides("taskx", SubConfig, {"c": 8.0})
    cfg = SubConfig()
    cfg.set_override("taskx")
    assert cfg.a == 5.0 and cfg.c == 8.0


def test_non_dataclass_rejected():
    with pytest.raises(ValueError):
        set_config_overrides("taskx", object, {"a": 1})


def test_switching_keys():
    set_config_overrides("t1", DemoConfig, {"a": 10.0})
    set_config_overrides("t2", DemoConfig, {"a": 20.0, "b": 7})
    cfg = DemoConfig()
    cfg.set_override("t1")
    assert (cfg.a, cfg.b) == (10.0, 2)
    cfg.set_override("t2")
    assert (cfg.a, cfg.b) == (20.0, 7)
    cfg.set_override("t1")
    assert (cfg.a, cfg.b) == (10.0, 2)


def test_no_warning_on_known_fields():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        set_config_overrides("taskx", DemoConfig, {"a": 2.0, "b": 3})
