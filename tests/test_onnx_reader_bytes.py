"""Writer-independent ONNX reader tests: hand-assembled protobuf bytes.

Every other onnx_reader/onnx_exec test builds its fixtures with the repo's
own ``encode_*`` writer, so a bug mirrored in both encoder and decoder would
be invisible. These fixtures are literal wire bytes derived field-by-field
from the onnx.proto3 spec (field numbers cited inline), exercising exactly
the encodings real exporters emit that the in-repo writer never does:
typed ``float_data``/``int32_data`` tensors (the writer always uses
``raw_data``) and unpacked repeated attribute ints.
"""

import struct

import numpy as np

from supertonic_tpu.assets.onnx_exec import OnnxExecutor
from supertonic_tpu.assets.onnx_reader import parse_model, parse_tensor


def _ld(tag_byte: bytes, payload: bytes) -> bytes:
    """length-delimited field: tag ++ varint(len) ++ payload."""
    n = len(payload)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return tag_byte + bytes(out) + payload


def _hand_model() -> bytes:
    """ModelProto for  y = Add(x, w)  with initializer w = [1.5, -2.0] f32.

    Field numbers (onnx.proto3): ModelProto.ir_version=1, .graph=7,
    .opset_import=8; GraphProto.node=1, .name=2, .initializer=5, .input=11,
    .output=12; NodeProto.input=1, .output=2, .name=3, .op_type=4;
    TensorProto.dims=1, .data_type=2, .name=8, .raw_data=9;
    ValueInfoProto.name=1, .type=2; TypeProto.tensor_type=1;
    TypeProto.Tensor.elem_type=1, .shape=2; TensorShapeProto.dim=1;
    Dimension.dim_value=1.
    """
    # NodeProto: input "x", input "w", output "y", name "n0", op_type "Add"
    node = (b"\x0a\x01x"        # 1:LD "x"     (tag 0x0a = field 1, wire 2)
            b"\x0a\x01w"        # 1:LD "w"
            b"\x12\x01y"        # 2:LD "y"
            b"\x1a\x02n0"       # 3:LD "n0"
            b"\x22\x03Add")     # 4:LD "Add"

    # TensorProto: dims=[2], data_type=1 (FLOAT), name "w", raw_data
    tensor = (b"\x08\x02"       # 1:varint dims = 2
              b"\x10\x01"       # 2:varint data_type = FLOAT
              b"\x42\x01w"      # 8:LD name = "w"
              + _ld(b"\x4a", struct.pack("<2f", 1.5, -2.0)))  # 9:LD raw_data

    def value_info(name: bytes) -> bytes:
        dim = b"\x08\x02"                      # Dimension.dim_value = 2
        shape = _ld(b"\x0a", dim)              # TensorShapeProto.dim
        tt = b"\x08\x01" + _ld(b"\x12", shape)  # elem_type=FLOAT, shape
        tp = _ld(b"\x0a", tt)                  # TypeProto.tensor_type
        return _ld(b"\x0a", name) + _ld(b"\x12", tp)

    graph = (_ld(b"\x0a", node)            # GraphProto.node
             + b"\x12\x01g"                # GraphProto.name = "g"
             + _ld(b"\x2a", tensor)        # GraphProto.initializer
             + _ld(b"\x5a", value_info(b"x"))   # GraphProto.input
             + _ld(b"\x62", value_info(b"y")))  # GraphProto.output

    opset = b"\x10\x11"                    # OperatorSetId.version = 17
    return (b"\x08\x08"                    # ModelProto.ir_version = 8
            + _ld(b"\x3a", graph)          # ModelProto.graph
            + _ld(b"\x42", opset))         # ModelProto.opset_import


def test_hand_assembled_model_parses():
    g = parse_model(_hand_model())
    assert g.name == "g"
    (n,) = g.nodes
    assert n.op_type == "Add"
    assert n.inputs == ["x", "w"]
    assert n.outputs == ["y"]
    np.testing.assert_array_equal(
        g.initializers["w"].data, np.array([1.5, -2.0], np.float32))
    assert [vi.name for vi in g.inputs] == ["x"]
    assert g.inputs[0].elem_type == 1 and g.inputs[0].shape == (2,)
    assert [vi.name for vi in g.outputs] == ["y"]


def test_hand_assembled_model_executes():
    ex = OnnxExecutor(parse_model(_hand_model()))
    x = np.array([10.0, 20.0], np.float32)
    (y,) = ex.run(None, {"x": x})
    np.testing.assert_allclose(y, [11.5, 18.0])


def test_tensor_typed_float_data():
    # TensorProto.float_data (field 4, packed) — the in-repo writer never
    # emits typed data, only raw_data.
    payload = struct.pack("<3f", 0.5, -1.0, 2.25)
    t = (b"\x08\x03"            # dims = 3
         b"\x10\x01"            # data_type = FLOAT
         b"\x42\x01v"           # name = "v"
         + _ld(b"\x22", payload))  # 4:LD packed float_data
    parsed = parse_tensor(t)
    assert parsed.name == "v"
    np.testing.assert_array_equal(
        parsed.data, np.array([0.5, -1.0, 2.25], np.float32))


def test_tensor_int32_data_negative():
    # TensorProto.int32_data (field 5, packed): negative int32 values are
    # 64-bit two's-complement varints and must be sign-extended.
    neg1 = b"\xff" * 9 + b"\x01"   # varint(2**64 - 1) == -1
    t = (b"\x08\x02"            # dims = 2
         b"\x10\x06"            # data_type = INT32
         b"\x42\x01n"           # name = "n"
         + _ld(b"\x2a", neg1 + b"\x02"))  # 5:LD packed int32_data [-1, 2]
    parsed = parse_tensor(t)
    assert parsed.data.dtype == np.int32
    np.testing.assert_array_equal(parsed.data, np.array([-1, 2], np.int32))


def test_tensor_int32_data_unpacked_negative():
    # Same field emitted unpacked (one varint per tag) — legal protobuf.
    neg2 = b"\xfe" + b"\xff" * 8 + b"\x01"  # varint(2**64 - 2) == -2
    t = (b"\x08\x01" b"\x10\x06" b"\x42\x01n"
         + b"\x28" + neg2)      # 5:varint (unpacked) int32_data = -2
    np.testing.assert_array_equal(
        parse_tensor(t).data, np.array([-2], np.int32))


def test_tensor_float16_typed_data():
    # float16 typed data rides int32_data as raw bit patterns.
    bits = np.array([0.5, -1.25], np.float16).view(np.uint16)

    # varint-encode the two uint16 bit patterns by hand
    def varint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)
    payload = varint(int(bits[0])) + varint(int(bits[1]))
    t = (b"\x08\x02" b"\x10\x0a" b"\x42\x01h"   # dims=2, FLOAT16, name "h"
         + _ld(b"\x2a", payload))
    np.testing.assert_array_equal(
        parse_tensor(t).data, np.array([0.5, -1.25], np.float16))


def _kv(key: bytes, value: bytes) -> bytes:
    # StringStringEntryProto: key=1, value=2
    return _ld(b"\x0a", key) + _ld(b"\x12", value)


def _external_tensor(name: bytes, loc: bytes, offset: int | None = None,
                     length: int | None = None) -> bytes:
    # float32 [3] tensor whose payload lives in an external sidecar file
    # (TensorProto.external_data = field 13, tag 0x6a)
    t = b"\x08\x03" b"\x10\x01" + _ld(b"\x42", name)
    t += _ld(b"\x6a", _kv(b"location", loc))
    if offset is not None:
        t += _ld(b"\x6a", _kv(b"offset", str(offset).encode()))
    if length is not None:
        t += _ld(b"\x6a", _kv(b"length", str(length).encode()))
    return t


def _model_with_initializer(tensor: bytes) -> bytes:
    graph = b"\x12\x01g" + _ld(b"\x2a", tensor)
    return b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")


def test_external_data_resolved(tmp_path):
    payload = np.array([1.0, -2.0, 3.5], np.float32)
    (tmp_path / "weights.bin").write_bytes(b"\x00" * 4 + payload.tobytes())
    model = _model_with_initializer(
        _external_tensor(b"w", b"weights.bin", offset=4, length=12))
    g = parse_model(model, base_dir=str(tmp_path))
    t = g.initializers["w"]
    assert t.external is None
    np.testing.assert_array_equal(t.data, payload)


def test_external_data_without_base_dir_raises(tmp_path):
    model = _model_with_initializer(_external_tensor(b"w", b"weights.bin"))
    try:
        parse_model(model)
    except ValueError as e:
        assert "external" in str(e)
    else:
        raise AssertionError("zero placeholder served silently")


def test_external_data_path_escape_rejected(tmp_path):
    model = _model_with_initializer(
        _external_tensor(b"w", b"../escape.bin"))
    try:
        parse_model(model, base_dir=str(tmp_path))
    except ValueError as e:
        assert "unsafe" in str(e)
    else:
        raise AssertionError("path escape accepted")


def test_external_data_length_mismatch_rejected(tmp_path):
    (tmp_path / "weights.bin").write_bytes(b"\x00" * 12)
    model = _model_with_initializer(
        _external_tensor(b"w", b"weights.bin", length=8))  # expect 12
    try:
        parse_model(model, base_dir=str(tmp_path))
    except ValueError as e:
        assert "length" in str(e)
    else:
        raise AssertionError("length mismatch accepted")


def test_external_data_short_file_rejected(tmp_path):
    (tmp_path / "weights.bin").write_bytes(b"\x00" * 8)  # need 12
    model = _model_with_initializer(
        _external_tensor(b"w", b"weights.bin"))
    try:
        parse_model(model, base_dir=str(tmp_path))
    except ValueError as e:
        assert "too short" in str(e)
    else:
        raise AssertionError("truncated sidecar accepted")


def test_external_data_executes_via_load_onnx(tmp_path):
    # Full path: y = Add(x, w) where w's payload lives in a sidecar file,
    # loaded through load_onnx (which supplies base_dir) and executed.
    payload = np.array([1.5, -2.0], np.float32)
    (tmp_path / "w.bin").write_bytes(payload.tobytes())
    node = (b"\x0a\x01x" b"\x0a\x01w" b"\x12\x01y" b"\x1a\x02n0"
            b"\x22\x03Add")
    tensor = (b"\x08\x02" b"\x10\x01" b"\x42\x01w"
              + _ld(b"\x6a", _kv(b"location", b"w.bin")))

    def value_info(name: bytes) -> bytes:
        tt = b"\x08\x01" + _ld(b"\x12", _ld(b"\x0a", b"\x08\x02"))
        return _ld(b"\x0a", name) + _ld(b"\x12", _ld(b"\x0a", tt))

    graph = (_ld(b"\x0a", node) + b"\x12\x01g" + _ld(b"\x2a", tensor)
             + _ld(b"\x5a", value_info(b"x"))
             + _ld(b"\x62", value_info(b"y")))
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
    (tmp_path / "m.onnx").write_bytes(model)

    from supertonic_tpu.assets.onnx_reader import load_onnx
    ex = OnnxExecutor(load_onnx(str(tmp_path / "m.onnx")))
    (y,) = ex.run(None, {"x": np.array([10.0, 20.0], np.float32)})
    np.testing.assert_allclose(y, [11.5, 18.0])


def test_unpacked_repeated_attribute_ints():
    # AttributeProto.ints (field 8) emitted unpacked: perm = [1, 0] for a
    # Transpose node, executed end-to-end.
    attr = (b"\x0a\x04perm"     # AttributeProto.name = "perm"
            b"\x40\x01"         # 8:varint ints = 1   (tag 0x40)
            b"\x40\x00")        # 8:varint ints = 0
    node = (b"\x0a\x01x" b"\x12\x01y" b"\x1a\x02n0"
            b"\x22\x09Transpose"
            + _ld(b"\x2a", attr))  # NodeProto.attribute (field 5)

    def value_info(name: bytes, d0: int, d1: int) -> bytes:
        dims = bytes([0x0a, 2, 0x08, d0]) + bytes([0x0a, 2, 0x08, d1])
        tt = b"\x08\x01" + _ld(b"\x12", dims)
        return _ld(b"\x0a", name) + _ld(b"\x12", _ld(b"\x0a", tt))

    graph = (_ld(b"\x0a", node) + b"\x12\x01g"
             + _ld(b"\x5a", value_info(b"x", 2, 3))
             + _ld(b"\x62", value_info(b"y", 3, 2)))
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")

    g = parse_model(model)
    assert g.nodes[0].attrs["perm"] == [1, 0]
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    (y,) = OnnxExecutor(g).run(None, {"x": x})
    np.testing.assert_array_equal(y, x.T)


def test_bfloat16_raw_and_typed_data():
    import ml_dtypes

    vals = np.array([0.5, -1.25, 3.0], ml_dtypes.bfloat16)
    # raw_data form
    t = (b"\x08\x03" b"\x10\x10" b"\x42\x01b"  # dims=3, BFLOAT16(16), name
         + _ld(b"\x4a", vals.tobytes()))
    np.testing.assert_array_equal(parse_tensor(t).data, vals)

    # typed form: bit patterns in int32_data
    def varint(v: int) -> bytes:
        out = bytearray()
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                return bytes(out)

    bits = vals.view(np.uint16)
    payload = b"".join(varint(int(x)) for x in bits)
    t = b"\x08\x03" b"\x10\x10" b"\x42\x01b" + _ld(b"\x2a", payload)
    np.testing.assert_array_equal(parse_tensor(t).data, vals)


def test_unknown_data_type_raises():
    t = b"\x08\x01" b"\x10\x63" b"\x42\x01u" + _ld(b"\x4a", b"\x00" * 4)
    try:
        parse_tensor(t)
    except ValueError as e:
        assert "data_type" in str(e)
    else:
        raise AssertionError("unknown dtype decoded silently")


def test_external_data_in_constant_attribute(tmp_path):
    """onnx.external_data_helper(convert_attribute=True) externalizes
    Constant-node 'value' tensors too — they must resolve, not serve the
    zero placeholder."""
    payload = np.array([4.0, 5.0], np.float32)
    (tmp_path / "c.bin").write_bytes(payload.tobytes())
    # Constant node whose 'value' tensor (dims=[2], FLOAT) is external
    tensor = (b"\x08\x02" b"\x10\x01" + _ld(b"\x42", b"cv")
              + _ld(b"\x6a", _kv(b"location", b"c.bin")))
    attr = _ld(b"\x0a", b"value") + _ld(b"\x2a", tensor)  # AttributeProto.t=5
    node = (b"\x12\x01y" b"\x1a\x02n0" b"\x22\x08Constant"
            + _ld(b"\x2a", attr))  # NodeProto.attribute

    def value_info(name: bytes) -> bytes:
        tt = b"\x08\x01" + _ld(b"\x12", _ld(b"\x0a", b"\x08\x02"))
        return _ld(b"\x0a", name) + _ld(b"\x12", _ld(b"\x0a", tt))

    graph = (_ld(b"\x0a", node) + b"\x12\x01g"
             + _ld(b"\x62", value_info(b"y")))
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
    (tmp_path / "m.onnx").write_bytes(model)

    from supertonic_tpu.assets.onnx_reader import load_onnx
    g = load_onnx(str(tmp_path / "m.onnx"))
    t = g.nodes[0].attrs["value"]
    assert t.external is None
    np.testing.assert_array_equal(t.data, payload)
    (y,) = OnnxExecutor(g).run(None, {})
    np.testing.assert_array_equal(y, payload)


def test_uint64_typed_data():
    # TensorProto.uint64_data (field 11, packed): values above int64 range
    big = 2 ** 63 + 5

    def varint(v: int) -> bytes:
        out = bytearray()
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                return bytes(out)

    payload = varint(big) + varint(7)
    t = (b"\x08\x02" b"\x10\x0d" b"\x42\x01u"   # dims=2, UINT64(13)
         + _ld(b"\x5a", payload))               # 11:LD packed uint64_data
    parsed = parse_tensor(t)
    assert parsed.data.dtype == np.uint64
    np.testing.assert_array_equal(
        parsed.data, np.array([big, 7], np.uint64))


def test_repeated_string_attribute():
    # AttributeProto.strings (field 9, repeated bytes)
    attr = (_ld(b"\x0a", b"activations")
            + _ld(b"\x4a", b"Sigmoid") + _ld(b"\x4a", b"Tanh"))
    node = (b"\x12\x01y" b"\x1a\x02n0" b"\x22\x08Identity"
            + _ld(b"\x2a", attr))
    graph = _ld(b"\x0a", node) + b"\x12\x01g"
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
    g = parse_model(model)
    assert g.nodes[0].attrs["activations"] == ["Sigmoid", "Tanh"]


def test_zero_valued_scalar_attributes():
    """proto3 omits zero scalars on the wire: a present attribute with
    type=INT and no i field IS 0 (e.g. Gather axis=0 in every real
    embedding lookup). The in-repo writer emits zeros explicitly, so only
    hand bytes can test this."""
    # AttributeProto: name="axis", type=INT(2)  (field 20, tag 0xa0 0x01)
    attr = _ld(b"\x0a", b"axis") + b"\xa0\x01\x02"
    node = (b"\x0a\x01w" b"\x0a\x01i" b"\x12\x01y" b"\x1a\x02n0"
            b"\x22\x06Gather" + _ld(b"\x2a", attr))
    graph = _ld(b"\x0a", node) + b"\x12\x01g"
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
    g = parse_model(model)
    assert g.nodes[0].attrs["axis"] == 0

    # FLOAT(1) and STRING(3) types default likewise
    for type_byte, want in ((b"\x01", 0.0), (b"\x03", "")):
        attr = _ld(b"\x0a", b"alpha") + b"\xa0\x01" + type_byte
        node = (b"\x0a\x01x" b"\x12\x01y" b"\x1a\x02n0" b"\x22\x04Relu"
                + _ld(b"\x2a", attr))
        graph = _ld(b"\x0a", node) + b"\x12\x01g"
        model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
        assert parse_model(model).nodes[0].attrs["alpha"] == want


def test_zero_axis_gather_executes():
    """End to end: Gather with the omitted-zero axis attribute must gather
    along axis 0, not crash on axis=None."""
    table = np.arange(12, dtype=np.float32).reshape(4, 3)
    attr = _ld(b"\x0a", b"axis") + b"\xa0\x01\x02"   # type=INT, i omitted
    tensor = (b"\x08\x04\x08\x03" b"\x10\x01" b"\x42\x01w"
              + _ld(b"\x4a", table.tobytes()))

    def value_info(name: bytes, dims, elem=1) -> bytes:
        d = b"".join(bytes([0x0a, 2, 0x08, v]) for v in dims)
        tt = bytes([0x08, elem]) + _ld(b"\x12", d)
        return _ld(b"\x0a", name) + _ld(b"\x12", _ld(b"\x0a", tt))

    node = (b"\x0a\x01w" b"\x0a\x01i" b"\x12\x01y" b"\x1a\x02n0"
            b"\x22\x06Gather" + _ld(b"\x2a", attr))
    graph = (_ld(b"\x0a", node) + b"\x12\x01g" + _ld(b"\x2a", tensor)
             + _ld(b"\x5a", value_info(b"i", (2,), elem=7))
             + _ld(b"\x62", value_info(b"y", (2, 3))))
    model = b"\x08\x08" + _ld(b"\x3a", graph) + _ld(b"\x42", b"\x10\x11")
    ex = OnnxExecutor(parse_model(model))
    (y,) = ex.run(None, {"i": np.array([2, 0], np.int64)})
    np.testing.assert_array_equal(y, table[[2, 0]])
