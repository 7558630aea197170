from playaid_core_tpu.adict import Dict


def test_missing_access_returns_empty_falsy_dict():
    d = Dict()
    child = d.missing_key
    assert isinstance(child, Dict)
    assert not child
    # No read side effects.
    assert "missing_key" not in d


def test_assignment_materialises_chain():
    d = Dict()
    d.a.b.c = 1
    assert d == {"a": {"b": {"c": 1}}}


def test_add_on_empty_supports_counters():
    d = Dict()
    d.counts["Jab"] += 1
    d.counts["Jab"] += 2
    assert d.counts["Jab"] == 3


def test_or_zero_pattern():
    d = Dict()
    assert (d.counts["Jab"] or 0) == 0


def test_to_dict_roundtrip():
    d = Dict()
    d.a.b = [Dict({"x": 1}), 2]
    plain = d.to_dict()
    assert plain == {"a": {"b": [{"x": 1}, 2]}}
    assert type(plain["a"]) is dict


def test_init_from_nested_dict():
    d = Dict({"a": {"b": 1}})
    assert d.a.b == 1
    assert isinstance(d.a, Dict)
