import pytest

from gluefactory_tpu.core.config import MISSING, Config, MissingValueError


def test_basic_access():
    c = Config({"a": 1, "b": {"c": 2}})
    assert c.a == 1
    assert c.b.c == 2
    assert c["b.c"] == 2
    assert c.get("b.d", 7) == 7


def test_merge_overrides():
    base = Config({"a": 1, "b": {"c": 2, "d": 3}})
    out = base.merge({"b": {"c": 5}}, {"e": 9})
    assert out.b.c == 5 and out.b.d == 3 and out.a == 1 and out.e == 9
    # base untouched
    assert base.b.c == 2


def test_missing():
    c = Config({"a": MISSING})
    with pytest.raises(MissingValueError):
        _ = c.a
    with pytest.raises(MissingValueError):
        c.check_no_missing()


def test_freeze_struct():
    c = Config({"a": 1, "b": {"c": 2}})
    c.freeze()
    with pytest.raises(RuntimeError):
        c.a = 3
    with pytest.raises(KeyError):
        c.unknown = 1
    with pytest.raises(KeyError):
        c.b.unknown = 1


def test_cli_dotlist():
    c = Config.from_cli(["model.name=lightglue", "model.dim=256", "flag=true"])
    assert c.model.name == "lightglue"
    assert c.model.dim == 256
    assert c.flag is True


def test_yaml_roundtrip(tmp_path):
    c = Config({"a": 1, "b": {"c": [1, 2, 3]}})
    p = tmp_path / "c.yaml"
    c.save(p)
    c2 = Config.load(p)
    assert c == c2
