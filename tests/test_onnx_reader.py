"""Round-trip tests for the dependency-free ONNX protobuf reader."""

import numpy as np
import pytest

from supertonic_tpu.assets.onnx_reader import (
    encode_model,
    encode_node,
    encode_tensor,
    parse_model,
)
from supertonic_tpu.assets.convert import (
    MappingRule,
    apply_mapping,
    t_conv,
    t_linear,
)


def _model_bytes():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([1, -2, 3], dtype=np.int64)
    node = encode_node("MatMul", ["x", "w"], ["y"], name="mm",
                       attrs={"alpha": 1.5, "transB": 1, "axes": [0, 2]})
    return encode_model("g", [node], [encode_tensor("w", w),
                                      encode_tensor("b", b)]), w, b


def test_roundtrip_tensors():
    data, w, b = _model_bytes()
    g = parse_model(data)
    assert g.name == "g"
    np.testing.assert_array_equal(g.initializers["w"].data, w)
    assert g.initializers["w"].data.dtype == np.float32
    np.testing.assert_array_equal(g.initializers["b"].data, b)
    assert g.initializers["b"].data.dtype == np.int64


def test_roundtrip_node_and_attrs():
    data, *_ = _model_bytes()
    g = parse_model(data)
    (n,) = g.nodes
    assert n.op_type == "MatMul"
    assert n.inputs == ["x", "w"]
    assert n.outputs == ["y"]
    assert n.attrs["alpha"] == pytest.approx(1.5)
    assert n.attrs["transB"] == 1
    assert n.attrs["axes"] == [0, 2]


def test_negative_int64_dims_and_values():
    t = encode_tensor("neg", np.array([-5, 7], dtype=np.int64))
    g = parse_model(encode_model("g", [], [t]))
    np.testing.assert_array_equal(g.initializers["neg"].data, [-5, 7])


def test_float16_raw_data():
    arr = np.array([0.5, -1.25], dtype=np.float16)
    g = parse_model(encode_model("g", [], [encode_tensor("h", arr)]))
    np.testing.assert_array_equal(g.initializers["h"].data, arr)


def test_mapping_rules():
    inits = {
        "blocks.0.ffn.weight": np.zeros((64, 32), np.float32),
        "pre.conv.weight": np.zeros((16, 8, 5), np.float32),
        "mystery": np.zeros(3, np.float32),
    }
    rules = [
        MappingRule(r"blocks\.(\d+)\.ffn\.weight", r"blocks/\1/ffn/w", t_linear),
        MappingRule(r"pre\.conv\.weight", r"pre/w", t_conv),
    ]
    flat, unmapped = apply_mapping(inits, rules)
    assert flat["blocks/0/ffn/w"].shape == (32, 64)
    assert flat["pre/w"].shape == (5, 8, 16)
    assert unmapped == ["mystery"]


def test_validate_against_skeleton(tiny_config):
    from supertonic_tpu.assets.convert import validate_against_skeleton

    ok = {"vocoder/pre/b": np.zeros(tiny_config.vocoder.dim, np.float32)}
    assert validate_against_skeleton(ok, tiny_config) == {}
    bad = {"vocoder/pre/b": np.zeros(7, np.float32)}
    assert "vocoder/pre/b" in validate_against_skeleton(bad, tiny_config)
    ghost = {"nope/w": np.zeros(3, np.float32)}
    assert "nope/w" in validate_against_skeleton(ghost, tiny_config)
