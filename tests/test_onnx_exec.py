"""Generic ONNX-graph executor tests.

Synthetic multi-op graphs are written with the round-trip writer
(onnx_reader.encode_*), executed by the JAX interpreter, and checked against
numpy/torch ground truth — torch being the same framework that exported the
reference graphs (SURVEY.md §0), so its Conv/ConvTranspose/Resize semantics
ARE the oracle for those ops.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from supertonic_tpu.assets import onnx_reader as R
from supertonic_tpu.assets.onnx_exec import OnnxExecutor, UnsupportedOp

F32, I64 = np.float32, np.int64


def build(nodes, inits=None, inputs=(), outputs=(), **exec_kw):
    """nodes: (op, ins, outs[, attrs]); inputs/outputs: (name, dtype, shape);
    inits: {name: array}. Returns an executor (extra kwargs forwarded)."""
    node_bufs = []
    for i, spec in enumerate(nodes):
        op, ins, outs = spec[0], spec[1], spec[2]
        attrs = spec[3] if len(spec) > 3 else None
        node_bufs.append(R.encode_node(op, list(ins), list(outs),
                                       name=f"n{i}", attrs=attrs))
    init_bufs = [R.encode_tensor(k, np.asarray(v))
                 for k, v in (inits or {}).items()]
    in_vis = [R.encode_value_info(n, dt, sh) for n, dt, sh in inputs]
    out_vis = [R.encode_value_info(n, dt, sh) for n, dt, sh in outputs]
    data = R.encode_model("g", node_bufs, init_bufs, in_vis, out_vis)
    return OnnxExecutor(R.parse_model(data), **exec_kw)


def run1(ex, **feeds):
    return ex.run(None, feeds)[0]


# ---------------------------------------------------------------------------
# elementwise / composition
# ---------------------------------------------------------------------------

def test_elementwise_chain(rng):
    x = rng.standard_normal((2, 5)).astype(F32)
    w = rng.standard_normal((2, 5)).astype(F32)
    ex = build(
        [("Add", ["x", "w"], ["a"]),
         ("Mul", ["a", "a"], ["b"]),
         ("Sigmoid", ["b"], ["c"]),
         ("Sub", ["c", "x"], ["y"])],
        inits={"w": w},
        inputs=[("x", F32, (2, 5))],
        outputs=[("y", F32, (2, 5))],
    )
    got = run1(ex, x=x)
    s = 1 / (1 + np.exp(-((x + w) ** 2)))
    np.testing.assert_allclose(got, s - x, rtol=1e-6, atol=1e-6)


def test_unary_ops(rng):
    x = rng.standard_normal((3, 4)).astype(F32)
    for op_name, ref in [
        ("Relu", lambda v: np.maximum(v, 0)),
        ("Tanh", np.tanh),
        ("Exp", np.exp),
        ("Abs", np.abs),
        ("Neg", lambda v: -v),
        ("Floor", np.floor),
        ("Ceil", np.ceil),
        ("Sqrt", lambda v: np.sqrt(np.abs(v))),
    ]:
        xin = np.abs(x) if op_name == "Sqrt" else x
        ex = build([(op_name, ["x"], ["y"])],
                   inputs=[("x", F32, (3, 4))], outputs=[("y", F32, (3, 4))])
        np.testing.assert_allclose(run1(ex, x=xin), ref(xin),
                                   rtol=1e-5, atol=1e-6)


def test_erf_gelu(rng):
    import math

    x = rng.standard_normal((4, 8)).astype(F32)
    ex = build([("Erf", ["x"], ["y"])],
               inputs=[("x", F32, (4, 8))], outputs=[("y", F32, (4, 8))])
    ref = np.vectorize(math.erf)(x.astype(np.float64))
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-5, atol=1e-6)

    ex = build([("Gelu", ["x"], ["y"])],
               inputs=[("x", F32, (4, 8))], outputs=[("y", F32, (4, 8))])
    ref = x * 0.5 * (1 + np.vectorize(math.erf)(x / np.sqrt(2)))
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)


def test_clip_leakyrelu_prelu(rng):
    x = rng.standard_normal((3, 5)).astype(F32)
    ex = build([("Clip", ["x", "lo", "hi"], ["y"])],
               inits={"lo": np.float32(-0.5), "hi": np.float32(0.5)},
               inputs=[("x", F32, (3, 5))], outputs=[("y", F32, (3, 5))])
    np.testing.assert_allclose(run1(ex, x=x), np.clip(x, -0.5, 0.5))

    ex = build([("LeakyRelu", ["x"], ["y"], {"alpha": 0.1})],
               inputs=[("x", F32, (3, 5))], outputs=[("y", F32, (3, 5))])
    np.testing.assert_allclose(run1(ex, x=x), np.where(x >= 0, x, 0.1 * x),
                               rtol=1e-6)

    slope = rng.standard_normal((5,)).astype(F32)
    ex = build([("PRelu", ["x", "s"], ["y"])], inits={"s": slope},
               inputs=[("x", F32, (3, 5))], outputs=[("y", F32, (3, 5))])
    np.testing.assert_allclose(run1(ex, x=x), np.where(x >= 0, x, slope * x),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# matmul / gemm / einsum / softmax
# ---------------------------------------------------------------------------

def test_matmul_gemm(rng):
    a = rng.standard_normal((4, 6)).astype(F32)
    b = rng.standard_normal((6, 3)).astype(F32)
    c = rng.standard_normal((3,)).astype(F32)
    ex = build([("MatMul", ["a", "b"], ["y"])], inits={"b": b},
               inputs=[("a", F32, (4, 6))], outputs=[("y", F32, (4, 3))])
    np.testing.assert_allclose(run1(ex, a=a), a @ b, rtol=1e-5, atol=1e-5)

    ex = build(
        [("Gemm", ["a", "bt", "c"], ["y"],
          {"alpha": 2.0, "beta": 0.5, "transB": 1})],
        inits={"bt": np.ascontiguousarray(b.T), "c": c},
        inputs=[("a", F32, (4, 6))], outputs=[("y", F32, (4, 3))],
    )
    np.testing.assert_allclose(run1(ex, a=a), 2.0 * (a @ b) + 0.5 * c,
                               rtol=1e-5, atol=1e-5)


def test_einsum_softmax(rng):
    q = rng.standard_normal((2, 3, 4)).astype(F32)
    k = rng.standard_normal((2, 5, 4)).astype(F32)
    ex = build(
        [("Einsum", ["q", "k"], ["s"], {"equation": "bld,bmd->blm"}),
         ("Softmax", ["s"], ["p"], {"axis": -1})],
        inputs=[("q", F32, (2, 3, 4)), ("k", F32, (2, 5, 4))],
        outputs=[("p", F32, (2, 3, 5))],
    )
    s = np.einsum("bld,bmd->blm", q, k)
    e = np.exp(s - s.max(-1, keepdims=True))
    np.testing.assert_allclose(run1(ex, q=q, k=k), e / e.sum(-1, keepdims=True),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def test_layernorm_op_and_decomposition(rng):
    x = rng.standard_normal((2, 7, 16)).astype(F32)
    g = rng.standard_normal((16,)).astype(F32)
    b = rng.standard_normal((16,)).astype(F32)

    def ref_ln(v):
        mu = v.mean(-1, keepdims=True)
        var = ((v - mu) ** 2).mean(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * g + b

    ex = build([("LayerNormalization", ["x", "g", "b"], ["y"],
                 {"axis": -1, "epsilon": 1e-5})],
               inits={"g": g, "b": b},
               inputs=[("x", F32, (2, 7, 16))],
               outputs=[("y", F32, (2, 7, 16))])
    np.testing.assert_allclose(run1(ex, x=x), ref_ln(x), rtol=1e-4, atol=1e-5)

    # the decomposed export form: ReduceMean/Sub/Pow/ReduceMean/Add/Sqrt/Div
    ex = build(
        [("ReduceMean", ["x"], ["mu"], {"axes": [-1], "keepdims": 1}),
         ("Sub", ["x", "mu"], ["xm"]),
         ("Pow", ["xm", "two"], ["sq"]),
         ("ReduceMean", ["sq"], ["var"], {"axes": [-1], "keepdims": 1}),
         ("Add", ["var", "eps"], ["ve"]),
         ("Sqrt", ["ve"], ["sd"]),
         ("Div", ["xm", "sd"], ["xn"]),
         ("Mul", ["xn", "g"], ["xg"]),
         ("Add", ["xg", "b"], ["y"])],
        inits={"two": np.float32(2.0), "eps": np.float32(1e-5),
               "g": g, "b": b},
        inputs=[("x", F32, (2, 7, 16))], outputs=[("y", F32, (2, 7, 16))],
    )
    np.testing.assert_allclose(run1(ex, x=x), ref_ln(x), rtol=1e-4, atol=1e-5)


def test_instance_batch_group_norm(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 6, 9)).astype(F32)
    g = rng.standard_normal((6,)).astype(F32)
    b = rng.standard_normal((6,)).astype(F32)
    xt, gt, bt = map(torch.from_numpy, (x, g, b))

    ex = build([("InstanceNormalization", ["x", "g", "b"], ["y"],
                 {"epsilon": 1e-5})],
               inits={"g": g, "b": b},
               inputs=[("x", F32, (2, 6, 9))], outputs=[("y", F32, (2, 6, 9))])
    ref = tF.instance_norm(xt, weight=gt, bias=bt, eps=1e-5).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)

    mean = rng.standard_normal((6,)).astype(F32)
    var = rng.random((6,)).astype(F32) + 0.5
    ex = build([("BatchNormalization", ["x", "g", "b", "m", "v"], ["y"],
                 {"epsilon": 1e-5})],
               inits={"g": g, "b": b, "m": mean, "v": var},
               inputs=[("x", F32, (2, 6, 9))], outputs=[("y", F32, (2, 6, 9))])
    ref = tF.batch_norm(xt, torch.from_numpy(mean), torch.from_numpy(var),
                        gt, bt, training=False, eps=1e-5).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)

    ex = build([("GroupNormalization", ["x", "g", "b"], ["y"],
                 {"epsilon": 1e-5, "num_groups": 3})],
               inits={"g": g, "b": b},
               inputs=[("x", F32, (2, 6, 9))], outputs=[("y", F32, (2, 6, 9))])
    ref = tF.group_norm(xt, 3, weight=gt, bias=bt, eps=1e-5).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# static shape-math pipelines (the load-bearing capability)
# ---------------------------------------------------------------------------

def test_shape_gather_concat_reshape(rng):
    # flatten last two dims via runtime-computed shape, as torch exports do
    x = rng.standard_normal((3, 4, 5)).astype(F32)
    ex = build(
        [("Shape", ["x"], ["sh"]),
         ("Gather", ["sh", "zero"], ["b"], {"axis": 0}),
         ("Concat", ["b1", "minus1"], ["tgt"], {"axis": 0}),
         ("Unsqueeze", ["b", "ax0"], ["b1"]),
         ("Reshape", ["x", "tgt"], ["y"])],
        inits={"zero": np.asarray(0, I64), "minus1": np.asarray([-1], I64),
               "ax0": np.asarray([0], I64)},
        inputs=[("x", F32, (3, 4, 5))], outputs=[("y", F32, (3, 20))],
    )
    np.testing.assert_allclose(run1(ex, x=x), x.reshape(3, 20))


def test_expand_range_constantofshape(rng):
    x = rng.standard_normal((2, 1, 4)).astype(F32)
    ex = build(
        [("Shape", ["x"], ["sh"]),
         ("ConstantOfShape", ["tgt"], ["z"],
          {"value": np.asarray([1.5], F32)}),
         ("Expand", ["x", "tgt"], ["xe"]),
         ("Add", ["xe", "z"], ["y"])],
        inits={"tgt": np.asarray([2, 3, 4], I64)},
        inputs=[("x", F32, (2, 1, 4))], outputs=[("y", F32, (2, 3, 4))],
    )
    np.testing.assert_allclose(run1(ex, x=x),
                               np.broadcast_to(x, (2, 3, 4)) + 1.5)

    ex = build([("Range", ["s", "l", "d"], ["y"])],
               inits={"s": np.asarray(2, I64), "l": np.asarray(11, I64),
                      "d": np.asarray(3, I64)},
               outputs=[("y", I64, (3,))])
    np.testing.assert_allclose(ex.run(None, {})[0], np.arange(2, 11, 3))


def test_slice_variants(rng):
    x = rng.standard_normal((4, 6, 8)).astype(F32)
    ex = build(
        [("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        inits={"st": np.asarray([1, 0], I64), "en": np.asarray([3, 6], I64),
               "ax": np.asarray([0, 2], I64), "sp": np.asarray([1, 2], I64)},
        inputs=[("x", F32, (4, 6, 8))], outputs=[("y", F32, (2, 6, 3))],
    )
    np.testing.assert_allclose(run1(ex, x=x), x[1:3, :, 0:6:2])

    # reverse: starts=-1, ends=INT_MIN, steps=-1
    ex = build(
        [("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        inits={"st": np.asarray([-1], I64),
               "en": np.asarray([np.iinfo(np.int64).min], I64),
               "ax": np.asarray([1], I64), "sp": np.asarray([-1], I64)},
        inputs=[("x", F32, (4, 6, 8))], outputs=[("y", F32, (4, 6, 8))],
    )
    np.testing.assert_allclose(run1(ex, x=x), x[:, ::-1])

    # huge end clamps to dim (torch uses INT_MAX for "to the end")
    ex = build(
        [("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        inits={"st": np.asarray([2], I64),
               "en": np.asarray([np.iinfo(np.int64).max], I64),
               "ax": np.asarray([2], I64), "sp": np.asarray([1], I64)},
        inputs=[("x", F32, (4, 6, 8))], outputs=[("y", F32, (4, 6, 6))],
    )
    np.testing.assert_allclose(run1(ex, x=x), x[:, :, 2:])


def test_split_pad_tile_where(rng):
    x = rng.standard_normal((2, 10)).astype(F32)
    ex = build([("Split", ["x"], ["a", "b", "c"], {"axis": 1})],
               inputs=[("x", F32, (2, 10))],
               outputs=[("a", F32, (2, 4)), ("b", F32, (2, 4)),
                        ("c", F32, (2, 2))])
    a, b, c = ex.run(None, {"x": x})
    np.testing.assert_allclose(a, x[:, :4])
    np.testing.assert_allclose(b, x[:, 4:8])
    np.testing.assert_allclose(c, x[:, 8:])

    ex = build([("Pad", ["x", "p"], ["y"], {"mode": "constant"})],
               inits={"p": np.asarray([0, 2, 1, 3], I64)},
               inputs=[("x", F32, (2, 10))], outputs=[("y", F32, (3, 15))])
    np.testing.assert_allclose(run1(ex, x=x),
                               np.pad(x, [(0, 1), (2, 3)]))

    ex = build([("Pad", ["x", "p"], ["y"], {"mode": "reflect"})],
               inits={"p": np.asarray([0, 2, 0, 2], I64)},
               inputs=[("x", F32, (2, 10))], outputs=[("y", F32, (2, 14))])
    np.testing.assert_allclose(run1(ex, x=x),
                               np.pad(x, [(0, 0), (2, 2)], mode="reflect"))

    ex = build([("Tile", ["x", "r"], ["y"])],
               inits={"r": np.asarray([2, 1], I64)},
               inputs=[("x", F32, (2, 10))], outputs=[("y", F32, (4, 10))])
    np.testing.assert_allclose(run1(ex, x=x), np.tile(x, (2, 1)))

    ex = build(
        [("Greater", ["x", "zero"], ["m"]),
         ("Where", ["m", "x", "zero"], ["y"])],
        inits={"zero": np.float32(0)},
        inputs=[("x", F32, (2, 10))], outputs=[("y", F32, (2, 10))],
    )
    np.testing.assert_allclose(run1(ex, x=x), np.maximum(x, 0))


def test_gather_dynamic_and_elements(rng):
    table = rng.standard_normal((50, 8)).astype(F32)
    ids = np.asarray([[3, 0, 49], [7, 7, 1]], I64)
    ex = build([("Gather", ["t", "ids"], ["y"], {"axis": 0})],
               inits={"t": table},
               inputs=[("ids", I64, (2, 3))], outputs=[("y", F32, (2, 3, 8))])
    np.testing.assert_allclose(run1(ex, ids=ids), table[ids])

    x = rng.standard_normal((3, 5)).astype(F32)
    idx = np.asarray([[0, 1, 2, 1, 0]] * 3, I64)
    ex = build([("GatherElements", ["x", "i"], ["y"], {"axis": 0})],
               inits={"i": idx},
               inputs=[("x", F32, (3, 5))], outputs=[("y", F32, (3, 5))])
    np.testing.assert_allclose(run1(ex, x=x),
                               np.take_along_axis(x, idx, axis=0))


def test_reduce_axes_as_input(rng):
    x = rng.standard_normal((2, 3, 4)).astype(F32)
    ex = build([("ReduceSum", ["x", "ax"], ["y"], {"keepdims": 0})],
               inits={"ax": np.asarray([1], I64)},
               inputs=[("x", F32, (2, 3, 4))], outputs=[("y", F32, (2, 4))])
    np.testing.assert_allclose(run1(ex, x=x), x.sum(1), rtol=1e-5, atol=1e-6)

    ex = build([("ReduceMax", ["x"], ["y"], {"axes": [0, 2], "keepdims": 1})],
               inputs=[("x", F32, (2, 3, 4))], outputs=[("y", F32, (1, 3, 1))])
    np.testing.assert_allclose(run1(ex, x=x), x.max((0, 2), keepdims=True))


def test_cast_argmax_cumsum_trilu(rng):
    x = rng.standard_normal((3, 6)).astype(F32)
    ex = build([("Cast", ["x"], ["y"], {"to": 6})],  # int32
               inputs=[("x", F32, (3, 6))], outputs=[("y", np.int32, (3, 6))])
    np.testing.assert_array_equal(run1(ex, x=x), x.astype(np.int32))

    ex = build([("ArgMax", ["x"], ["y"], {"axis": 1, "keepdims": 0})],
               inputs=[("x", F32, (3, 6))], outputs=[("y", I64, (3,))])
    np.testing.assert_array_equal(run1(ex, x=x), x.argmax(1))

    ex = build([("CumSum", ["x", "ax"], ["y"])],
               inits={"ax": np.asarray(1, I64)},
               inputs=[("x", F32, (3, 6))], outputs=[("y", F32, (3, 6))])
    np.testing.assert_allclose(run1(ex, x=x), np.cumsum(x, 1), rtol=1e-5)

    sq = rng.standard_normal((4, 4)).astype(F32)
    ex = build([("Trilu", ["x"], ["y"], {"upper": 0})],
               inputs=[("x", F32, (4, 4))], outputs=[("y", F32, (4, 4))])
    np.testing.assert_allclose(run1(ex, x=sq), np.tril(sq))


# ---------------------------------------------------------------------------
# conv / convtranspose / resize / pooling vs torch ground truth
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "stride,pad,dil,group",
    [(1, 0, 1, 1), (2, 3, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2)],
)
def test_conv1d_vs_torch(rng, stride, pad, dil, group):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 4, 20)).astype(F32)
    w = rng.standard_normal((6, 4 // group, 5)).astype(F32)
    b = rng.standard_normal((6,)).astype(F32)
    ref = tF.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride=stride, padding=pad,
                    dilation=dil, groups=group).numpy()
    ex = build(
        [("Conv", ["x", "w", "b"], ["y"],
          {"strides": [stride], "pads": [pad, pad], "dilations": [dil],
           "group": group, "kernel_shape": [5]})],
        inits={"w": w, "b": b},
        inputs=[("x", F32, (2, 4, 20))], outputs=[("y", F32, ref.shape)],
    )
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-4)


def test_conv2d_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((1, 3, 12, 10)).astype(F32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(F32)
    ref = tF.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    stride=(2, 1), padding=(1, 2)).numpy()
    ex = build(
        [("Conv", ["x", "w"], ["y"],
          {"strides": [2, 1], "pads": [1, 2, 1, 2]})],
        inits={"w": w},
        inputs=[("x", F32, (1, 3, 12, 10))], outputs=[("y", F32, ref.shape)],
    )
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "stride,pad,outpad,group",
    [(1, 0, 0, 1), (4, 2, 0, 1), (2, 1, 1, 1), (2, 0, 0, 2)],
)
def test_convtranspose1d_vs_torch(rng, stride, pad, outpad, group):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 4, 11)).astype(F32)
    w = rng.standard_normal((4, 6 // group, 8)).astype(F32)
    b = rng.standard_normal((6,)).astype(F32)
    ref = tF.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, output_padding=outpad, groups=group,
    ).numpy()
    ex = build(
        [("ConvTranspose", ["x", "w", "b"], ["y"],
          {"strides": [stride], "pads": [pad, pad],
           "output_padding": [outpad], "group": group})],
        inits={"w": w, "b": b},
        inputs=[("x", F32, (2, 4, 11))], outputs=[("y", F32, ref.shape)],
    )
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-4)


def test_convtranspose2d_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((1, 3, 7, 5)).astype(F32)
    w = rng.standard_normal((3, 4, 4, 4)).astype(F32)
    ref = tF.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              stride=(2, 2), padding=(1, 1)).numpy()
    ex = build(
        [("ConvTranspose", ["x", "w"], ["y"],
          {"strides": [2, 2], "pads": [1, 1, 1, 1]})],
        inits={"w": w},
        inputs=[("x", F32, (1, 3, 7, 5))], outputs=[("y", F32, ref.shape)],
    )
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-4)


def test_resize_nearest_and_linear(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 6)).astype(F32)
    # integer nearest upsample (torch Upsample export: asymmetric+floor)
    ex = build(
        [("Resize", ["x", "", "sc"], ["y"],
          {"mode": "nearest", "coordinate_transformation_mode": "asymmetric",
           "nearest_mode": "floor"})],
        inits={"sc": np.asarray([1.0, 1.0, 3.0], F32)},
        inputs=[("x", F32, (2, 3, 6))], outputs=[("y", F32, (2, 3, 18))],
    )
    ref = tF.interpolate(torch.from_numpy(x), scale_factor=3,
                         mode="nearest").numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref)

    # linear half_pixel == torch align_corners=False
    ex = build(
        [("Resize", ["x", "", "sc"], ["y"],
          {"mode": "linear",
           "coordinate_transformation_mode": "half_pixel"})],
        inits={"sc": np.asarray([1.0, 1.0, 2.0], F32)},
        inputs=[("x", F32, (2, 3, 6))], outputs=[("y", F32, (2, 3, 12))],
    )
    ref = tF.interpolate(torch.from_numpy(x), scale_factor=2, mode="linear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)


def test_pooling_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 16)).astype(F32)
    xt = torch.from_numpy(x)

    ex = build([("MaxPool", ["x"], ["y"],
                 {"kernel_shape": [4], "strides": [2], "pads": [0, 0]})],
               inputs=[("x", F32, (2, 3, 16))], outputs=[("y", F32, (2, 3, 7))])
    ref = tF.max_pool1d(xt, 4, 2).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-5)

    ex = build([("AveragePool", ["x"], ["y"],
                 {"kernel_shape": [4], "strides": [2], "pads": [1, 1]})],
               inputs=[("x", F32, (2, 3, 16))], outputs=[("y", F32, (2, 3, 8))])
    ref = tF.avg_pool1d(xt, 4, 2, padding=1, count_include_pad=False).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-5, atol=1e-6)

    ex = build([("GlobalAveragePool", ["x"], ["y"])],
               inputs=[("x", F32, (2, 3, 16))], outputs=[("y", F32, (2, 3, 1))])
    np.testing.assert_allclose(run1(ex, x=x), x.mean(-1, keepdims=True),
                               rtol=1e-5, atol=1e-6)


def test_conv_auto_pad_vs_torch(rng):
    # auto_pad SAME_UPPER/SAME_LOWER/VALID (TF-exported graphs use these;
    # torch exports always use explicit pads). Torch reference: pad
    # asymmetrically by hand, then conv with padding=0.
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 15)).astype(F32)
    w = rng.standard_normal((4, 3, 3)).astype(F32)
    xt, wt = torch.from_numpy(x), torch.from_numpy(w)
    s, k = 2, 3
    out = -(-15 // s)
    total = max(0, (out - 1) * s + k - 15)
    lo, hi = total // 2, total - total // 2

    for mode, pads in (("SAME_UPPER", (lo, hi)), ("SAME_LOWER", (hi, lo)),
                       ("VALID", (0, 0))):
        ex = build([("Conv", ["x", "w"], ["y"],
                     {"kernel_shape": [k], "strides": [s],
                      "auto_pad": mode})],
                   inits={"w": w}, inputs=[("x", F32, (2, 3, 15))],
                   outputs=[("y", F32, (2, 4, "O"))])
        ref = tF.conv1d(tF.pad(xt, pads), wt, stride=s).numpy()
        np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5,
                                   err_msg=mode)


def test_pool_auto_pad_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 15)).astype(F32)
    xt = torch.from_numpy(x)
    s, k = 2, 3
    out = -(-15 // s)
    total = max(0, (out - 1) * s + k - 15)
    lo, hi = total // 2, total - total // 2

    ex = build([("MaxPool", ["x"], ["y"],
                 {"kernel_shape": [k], "strides": [s],
                  "auto_pad": "SAME_UPPER"})],
               inputs=[("x", F32, (2, 3, 15))],
               outputs=[("y", F32, (2, 3, out))])
    ref = tF.max_pool1d(tF.pad(xt, (lo, hi), value=-torch.inf), k, s).numpy()
    got = run1(ex, x=x)
    assert got.shape == ref.shape == (2, 3, out)
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # AveragePool SAME excludes the pad cells from the divisor
    # (count_include_pad=0 default): sum-pool over zero-padded input divided
    # by a count-pool of ones
    ex = build([("AveragePool", ["x"], ["y"],
                 {"kernel_shape": [k], "strides": [s],
                  "auto_pad": "SAME_UPPER"})],
               inputs=[("x", F32, (2, 3, 15))],
               outputs=[("y", F32, (2, 3, out))])
    sums = tF.avg_pool1d(tF.pad(xt, (lo, hi)), k, s,
                         count_include_pad=True) * k
    counts = tF.avg_pool1d(tF.pad(torch.ones_like(xt), (lo, hi)), k, s,
                           count_include_pad=True) * k
    np.testing.assert_allclose(run1(ex, x=x), (sums / counts).numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# executor mechanics
# ---------------------------------------------------------------------------

def test_attention_block_composite(rng):
    """A full scaled-dot-product attention subgraph, the shape the vector
    estimator's cross-attention will take (SURVEY.md §2.2)."""
    B, L, M, D = 2, 5, 7, 8
    q = rng.standard_normal((B, L, D)).astype(F32)
    k = rng.standard_normal((B, M, D)).astype(F32)
    v = rng.standard_normal((B, M, D)).astype(F32)
    mask = np.ones((B, 1, M), F32)
    mask[0, 0, 5:] = 0
    ex = build(
        [("Transpose", ["k"], ["kt"], {"perm": [0, 2, 1]}),
         ("MatMul", ["q", "kt"], ["qk"]),
         ("Div", ["qk", "scale"], ["qks"]),
         ("Sub", ["one", "mask"], ["inv"]),
         ("Mul", ["inv", "neg"], ["bias"]),
         ("Add", ["qks", "bias"], ["logits"]),
         ("Softmax", ["logits"], ["p"], {"axis": -1}),
         ("MatMul", ["p", "v"], ["y"])],
        inits={"scale": np.float32(np.sqrt(D)), "one": np.float32(1),
               "neg": np.float32(-1e9)},
        inputs=[("q", F32, (B, L, D)), ("k", F32, (B, M, D)),
                ("v", F32, (B, M, D)), ("mask", F32, (B, 1, M))],
        outputs=[("y", F32, (B, L, D))],
    )
    got = run1(ex, q=q, k=k, v=v, mask=mask)
    logits = q @ k.transpose(0, 2, 1) / np.sqrt(D) - (1 - mask) * 1e9
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, p @ v, rtol=1e-4, atol=1e-5)


def test_gathernd_scatternd(rng):
    data = rng.standard_normal((4, 5, 6)).astype(F32)
    idx = np.asarray([[0, 1], [3, 4], [2, 0]], I64)
    ex = build([("GatherND", ["d", "i"], ["y"])], inits={"i": idx},
               inputs=[("d", F32, (4, 5, 6))], outputs=[("y", F32, (3, 6))])
    np.testing.assert_allclose(run1(ex, d=data),
                               data[idx[:, 0], idx[:, 1]])

    upd = rng.standard_normal((3, 6)).astype(F32)
    ex = build([("ScatterND", ["d", "i", "u"], ["y"])],
               inits={"i": idx, "u": upd},
               inputs=[("d", F32, (4, 5, 6))], outputs=[("y", F32, (4, 5, 6))])
    ref = data.copy()
    for r in range(3):
        ref[idx[r, 0], idx[r, 1]] = upd[r]
    np.testing.assert_allclose(run1(ex, d=data), ref)


def test_topk(rng):
    x = rng.standard_normal((3, 10)).astype(F32)
    ex = build([("TopK", ["x", "k"], ["v", "i"], {"axis": -1})],
               inits={"k": np.asarray([4], I64)},
               inputs=[("x", F32, (3, 10))],
               outputs=[("v", F32, (3, 4)), ("i", np.int32, (3, 4))])
    v, i = ex.run(None, {"x": x})
    ref = np.sort(x, axis=-1)[:, ::-1][:, :4]
    np.testing.assert_allclose(v, ref, rtol=1e-6)
    np.testing.assert_allclose(np.take_along_axis(x, i.astype(np.int64), -1),
                               ref, rtol=1e-6)


def test_if_static_condition(rng):
    """If with a shape-derived (static) condition executes one branch; the
    branch subgraph captures outer values by name."""
    x = rng.standard_normal((3, 8)).astype(F32)

    def branch(mul_const):
        nodes = [R.encode_node("Mul", ["x", "c"], ["out"], name="bn")]
        inits = [R.encode_tensor("c", np.float32(mul_const))]
        outs = [R.encode_value_info("out", F32, (3, 8))]
        return R.SubgraphAttr(R.encode_graph("b", nodes, inits, [], outs))

    for dim, expect in ((8, 2.0), (4, 3.0)):
        xin = x[:, :dim]
        ex = build(
            [("Shape", ["x"], ["sh"], None),
             ("Gather", ["sh", "one"], ["d1"], {"axis": 0}),
             ("Equal", ["d1", "eight"], ["is8"], None),
             ("If", ["is8"], ["y"],
              {"then_branch": branch(2.0), "else_branch": branch(3.0)})],
            inits={"one": np.asarray(1, I64), "eight": np.asarray(8, I64)},
            inputs=[("x", F32, (3, dim))], outputs=[("y", F32, (3, dim))],
        )
        np.testing.assert_allclose(run1(ex, x=xin), xin * expect, rtol=1e-6)


def test_unsupported_op_raises(rng):
    ex = build([("NonMaxSuppression", ["x"], ["y"])],
               inputs=[("x", F32, (2, 2))], outputs=[("y", F32, (2, 2))])
    with pytest.raises(UnsupportedOp):
        ex.run(None, {"x": np.zeros((2, 2), F32)})


def test_out_of_order_nodes_toposorted(rng):
    x = rng.standard_normal((2, 3)).astype(F32)
    ex = build(
        [("Mul", ["a", "a"], ["y"]),     # uses 'a' before it is produced
         ("Add", ["x", "x"], ["a"])],
        inputs=[("x", F32, (2, 3))], outputs=[("y", F32, (2, 3))],
    )
    np.testing.assert_allclose(run1(ex, x=x), (2 * x) ** 2, rtol=1e-6)


def test_run_output_name_selection(rng):
    x = rng.standard_normal((2, 3)).astype(F32)
    ex = build(
        [("Add", ["x", "x"], ["a"]), ("Mul", ["x", "x"], ["b"])],
        inputs=[("x", F32, (2, 3))],
        outputs=[("a", F32, (2, 3)), ("b", F32, (2, 3))],
    )
    only_b = ex.run(["b"], {"x": x})
    np.testing.assert_allclose(only_b[0], x * x, rtol=1e-6)
    a_then_b = ex.run(None, {"x": x})
    np.testing.assert_allclose(a_then_b[0], 2 * x, rtol=1e-6)


def test_gathernd_negative_indices(rng):
    data = rng.standard_normal((4, 5)).astype(F32)
    idx = np.asarray([[-1, -2], [0, -1]], I64)  # wrap from the end
    ex = build([("GatherND", ["d", "i"], ["y"])], inits={"i": idx},
               inputs=[("d", F32, (4, 5))], outputs=[("y", F32, (2,))])
    np.testing.assert_allclose(run1(ex, d=data),
                               np.asarray([data[-1, -2], data[0, -1]]))


def test_loop_static_trip_count(rng):
    """Loop unrolled at trace time: running sum carried across iterations,
    per-iteration scan output stacked."""
    x = rng.standard_normal((3,)).astype(F32)

    body_nodes = [
        R.encode_node("Add", ["acc_in", "x"], ["acc_out"], name="b0"),
        R.encode_node("Identity", ["true_c"], ["cond_out"], name="b1"),
        R.encode_node("Mul", ["acc_out", "two"], ["scan0"], name="b2"),
    ]
    body_inits = [R.encode_tensor("true_c", np.asarray(True)),
                  R.encode_tensor("two", np.float32(2.0))]
    body_ins = [R.encode_value_info("it", I64, ()),
                R.encode_value_info("cond_in", np.bool_, ()),
                R.encode_value_info("acc_in", F32, (3,))]
    body_outs = [R.encode_value_info("cond_out", np.bool_, ()),
                 R.encode_value_info("acc_out", F32, (3,)),
                 R.encode_value_info("scan0", F32, (3,))]
    body = R.SubgraphAttr(R.encode_graph("body", body_nodes, body_inits,
                                         body_ins, body_outs))

    ex = build(
        [("Loop", ["m", "go", "acc0"], ["acc", "scan"], {"body": body})],
        inits={"m": np.asarray(4, I64), "go": np.asarray(True),
               "acc0": np.zeros(3, F32)},
        inputs=[("x", F32, (3,))],
        outputs=[("acc", F32, (3,)), ("scan", F32, (4, 3))],
    )
    acc, scan = ex.run(None, {"x": x})
    np.testing.assert_allclose(acc, 4 * x, rtol=1e-6)
    ref_scan = np.stack([2 * (i + 1) * x for i in range(4)])
    np.testing.assert_allclose(scan, ref_scan, rtol=1e-6)


# ---------------------------------------------------------------------------
# round-2c op additions (coverage insurance for the real graphs)
# ---------------------------------------------------------------------------

def _one(op_name, x, attrs=None, extra_inits=None, n_out=1):
    outs = [f"y{i}" for i in range(n_out)]
    ex = build(
        [(op_name, ["x"] + list(extra_inits or {}), outs, attrs)],
        inits=extra_inits,
        inputs=[("x", F32, x.shape)],
        outputs=[(o, F32, x.shape) for o in outs],
    )
    r = ex.run(None, {"x": x})
    return r[0] if n_out == 1 else r


def test_activations_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = (rng.standard_normal((3, 17)) * 2).astype(F32)
    t = torch.from_numpy(x)
    cases = [
        ("Selu", None, tF.selu(t)),
        ("Celu", {"alpha": 1.3}, tF.celu(t, alpha=1.3)),
        ("Mish", None, tF.mish(t)),
        ("HardSwish", None, tF.hardswish(t)),
        ("Softsign", None, tF.softsign(t)),
        ("ThresholdedRelu", {"alpha": 0.7},
         torch.where(t > 0.7, t, torch.zeros_like(t))),
        ("Shrink", {"lambd": 0.5, "bias": 0.1},
         torch.where(t < -0.5, t + 0.1,
                     torch.where(t > 0.5, t - 0.1, torch.zeros_like(t)))),
        ("Sinh", None, torch.sinh(t)),
        ("Cosh", None, torch.cosh(t)),
        ("Atan", None, torch.atan(t)),
        ("Asinh", None, torch.asinh(t)),
    ]
    for name, attrs, want in cases:
        got = _one(name, x, attrs)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-6,
                                   err_msg=name)


def test_extended_reductions(rng):
    x = np.abs(rng.standard_normal((2, 4, 5))).astype(F32) + 0.1
    for name, want in [
        ("ReduceL1", np.abs(x).sum(1, keepdims=True)),
        ("ReduceSumSquare", (x ** 2).sum(1, keepdims=True)),
        ("ReduceLogSum", np.log(x.sum(1, keepdims=True))),
        ("ReduceLogSumExp", np.log(np.exp(x).sum(1, keepdims=True))),
    ]:
        got = _one(name, x, {"axes": [1]})
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=name)


def test_cumsum_exclusive_reverse(rng):
    x = rng.standard_normal((3, 6)).astype(F32)
    ax = np.asarray(1, I64)
    for excl in (0, 1):
        for rev in (0, 1):
            ex = build(
                [("CumSum", ["x", "ax"], ["y"],
                  {"exclusive": excl, "reverse": rev})],
                inits={"ax": ax},
                inputs=[("x", F32, x.shape)], outputs=[("y", F32, x.shape)],
            )
            got = run1(ex, x=x)
            base = x[:, ::-1] if rev else x
            want = np.cumsum(base, axis=1)
            if excl:
                want = np.concatenate(
                    [np.zeros((3, 1), F32), want[:, :-1]], axis=1)
            if rev:
                want = want[:, ::-1]
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6,
                                       err_msg=f"excl={excl} rev={rev}")


def test_topk_smallest(rng):
    x = rng.standard_normal((4, 9)).astype(F32)
    ex = build(
        [("TopK", ["x", "k"], ["v", "i"], {"axis": -1, "largest": 0})],
        inits={"k": np.asarray([3], I64)},
        inputs=[("x", F32, x.shape)],
        outputs=[("v", F32, (4, 3)), ("i", np.int32, (4, 3))],
    )
    v, i = ex.run(None, {"x": x})
    want = np.sort(x, axis=1)[:, :3]
    np.testing.assert_allclose(v, want, rtol=1e-6)
    np.testing.assert_allclose(np.take_along_axis(x, i.astype(np.int64), 1),
                               want, rtol=1e-6)


def test_scatter_elements_vs_torch(rng):
    import torch

    x = rng.standard_normal((4, 6)).astype(F32)
    idx = rng.integers(0, 6, size=(4, 3)).astype(I64)
    upd = rng.standard_normal((4, 3)).astype(F32)
    for red in ("none", "add", "mul"):
        ex = build(
            [("ScatterElements", ["x", "idx", "upd"], ["y"],
              {"axis": 1, "reduction": red})],
            inits={"idx": idx, "upd": upd},
            inputs=[("x", F32, x.shape)], outputs=[("y", F32, x.shape)],
        )
        got = run1(ex, x=x)
        t = torch.from_numpy(x.copy())
        if red == "none":
            want = t.scatter(1, torch.from_numpy(idx), torch.from_numpy(upd))
        else:
            want = t.scatter_reduce(
                1, torch.from_numpy(idx), torch.from_numpy(upd),
                {"add": "sum", "mul": "prod"}[red])
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6,
                                   err_msg=red)


def test_gathernd_batch_dims(rng):
    x = rng.standard_normal((3, 5, 7)).astype(F32)
    idx = rng.integers(-5, 5, size=(3, 4, 1)).astype(I64)
    ex = build(
        [("GatherND", ["x", "idx"], ["y"], {"batch_dims": 1})],
        inits={"idx": idx},
        inputs=[("x", F32, x.shape)], outputs=[("y", F32, (3, 4, 7))],
    )
    got = run1(ex, x=x)
    want = np.stack([x[b][idx[b, :, 0]] for b in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_lp_and_mvn_normalization(rng):
    x = rng.standard_normal((2, 3, 4, 5)).astype(F32)
    got = _one("LpNormalization", x, {"axis": 1, "p": 2})
    want = x / np.sqrt((x ** 2).sum(1, keepdims=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got = _one("MeanVarianceNormalization", x, {"axes": [0, 2, 3]})
    m = x.mean((0, 2, 3), keepdims=True)
    v = (x ** 2).mean((0, 2, 3), keepdims=True) - m ** 2
    np.testing.assert_allclose(got, (x - m) / np.sqrt(v + 1e-9),
                               rtol=1e-4, atol=1e-5)


def test_pool_ceil_mode_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 13)).astype(F32)
    t = torch.from_numpy(x)
    for kernel, stride, pad in [(3, 2, 0), (4, 3, 1), (2, 2, 1)]:
        attrs = {"kernel_shape": [kernel], "strides": [stride],
                 "pads": [pad, pad], "ceil_mode": 1}
        got = _one("MaxPool", x, attrs)
        want = tF.max_pool1d(t, kernel, stride, pad, ceil_mode=True).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"max k{kernel}s{stride}p{pad}")
        for cip in (0, 1):
            attrs_avg = dict(attrs, count_include_pad=cip)
            got = _one("AveragePool", x, attrs_avg)
            want = tF.avg_pool1d(t, kernel, stride, pad, ceil_mode=True,
                                 count_include_pad=bool(cip)).numpy()
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-6,
                err_msg=f"avg k{kernel}s{stride}p{pad}cip{cip}")


def test_resize_coordinate_modes_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((2, 3, 11)).astype(F32)
    t = torch.from_numpy(x)

    def run_resize(scales, mode, coord, nearest="round_prefer_floor"):
        ex = build(
            [("Resize", ["x", "", "s"], ["y"],
              {"mode": mode, "coordinate_transformation_mode": coord,
               "nearest_mode": nearest})],
            inits={"s": np.asarray(scales, F32)},
            inputs=[("x", F32, x.shape)], outputs=[("y", F32, ("B", "C", "W"))],
        )
        return run1(ex, x=x)

    # linear + align_corners == torch interpolate(align_corners=True).
    # atol 5e-6: the persistent XLA compile cache is shared across
    # heterogeneous CPU hosts, and a program compiled elsewhere may pick
    # different FMA contractions (~2e-6 wobble on the lerp)
    got = run_resize([1, 1, 2.5], "linear", "align_corners")
    want = tF.interpolate(t, scale_factor=2.5, mode="linear",
                          align_corners=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-6)

    # linear + half_pixel == torch interpolate(align_corners=False)
    got = run_resize([1, 1, 3.0], "linear", "half_pixel")
    want = tF.interpolate(t, scale_factor=3.0, mode="linear",
                          align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-6)

    # nearest + asymmetric + floor: ONNX-spec indices are floor(i / scale)
    # (torch's runtime nearest uses floor(i * in / out), a known
    # torch-vs-ONNX divergence — ORT follows the spec, so must we)
    got = run_resize([1, 1, 1.7], "nearest", "asymmetric", "floor")
    # f32 coordinate math, like the executor (and ORT's float compute):
    # 17/1.7 rounds differently in f32 vs f64 exactly at integer boundaries
    src = np.arange(int(11 * 1.7), dtype=np.float32) / np.float32(1.7)
    idx = np.floor(src).astype(int)
    np.testing.assert_allclose(got, x[:, :, idx], rtol=1e-6)

    # downscale linear half_pixel (area-unweighted linear, ONNX semantics):
    # spot-check against manual gather-lerp
    got = run_resize([1, 1, 0.5], "linear", "half_pixel")
    src = (np.arange(5) + 0.5) / 0.5 - 0.5
    lo = np.clip(np.floor(src), 0, 10).astype(int)
    hi = np.clip(lo + 1, 0, 10)
    w = np.clip(src - lo, 0.0, 1.0)
    want = x[:, :, lo] * (1 - w) + x[:, :, hi] * w
    np.testing.assert_allclose(got, want.astype(F32), rtol=1e-5, atol=5e-6)


def test_static_vs_traced_path_fuzz(rng):
    """Every static_ok op has TWO implementations (numpy partial-eval at
    trace time vs traced jnp) — random op chains must produce identical
    results whether inputs arrive as initializers (all-static evaluation)
    or as runtime feeds (traced). Catches np/jnp semantic drift."""
    unary = [("Abs", None), ("Neg", None), ("Floor", None), ("Ceil", None)]
    binary = [("Add", None), ("Sub", None), ("Mul", None),
              ("Min", None), ("Max", None)]
    for trial in range(25):
        r = np.random.default_rng(trial)
        n_nodes = int(r.integers(3, 10))
        vals = {"x0": r.standard_normal((4, 6)).astype(F32) * 3,
                "x1": r.standard_normal((4, 6)).astype(F32) * 3}
        names = ["x0", "x1"]
        nodes = []
        for i in range(n_nodes):
            out = f"v{i}"
            kind = r.integers(0, 4)
            if kind == 0:
                op_name, attrs = unary[r.integers(0, len(unary))]
                nodes.append((op_name, [str(r.choice(names))], [out], attrs))
            elif kind == 1:
                op_name, attrs = binary[r.integers(0, len(binary))]
                nodes.append((op_name,
                              [str(r.choice(names)), str(r.choice(names))],
                              [out], attrs))
            elif kind == 2:  # Where over a comparison
                a, b = str(r.choice(names)), str(r.choice(names))
                nodes.append(("Greater", [a, b], [f"c{i}"], None))
                nodes.append(("Where", [f"c{i}", a, b], [out], None))
            else:  # transpose round-trip (layout ops stay shape-stable)
                nodes.append(("Transpose", [str(r.choice(names))], [f"t{i}"],
                              {"perm": [1, 0]}))
                nodes.append(("Transpose", [f"t{i}"], [out],
                              {"perm": [1, 0]}))
            names.append(out)
        final = names[-1]

        ex_traced = build(
            nodes, inits={},
            inputs=[("x0", F32, (4, 6)), ("x1", F32, (4, 6))],
            outputs=[(final, F32, (4, 6))],
        )
        got_traced = run1(ex_traced, x0=vals["x0"], x1=vals["x1"])

        ex_static = build(
            nodes, inits={"x0": vals["x0"], "x1": vals["x1"]},
            inputs=[], outputs=[(final, F32, (4, 6))],
        )
        got_static = ex_static.run(None, {})[0]
        # tight allclose, not bit-equal: XLA contracts mul+add chains into
        # FMAs (e.g. a - b*a), shifting float results by ~1 ULP vs numpy's
        # per-op rounding; semantic drift (wrong op/broadcast/rounding
        # RULE) is orders of magnitude larger and still caught
        np.testing.assert_allclose(
            np.asarray(got_traced), np.asarray(got_static),
            rtol=2e-6, atol=1e-5,
            err_msg=f"trial {trial}: static/traced drift in {nodes}")


def test_resize_nearest_repeat_combos_exact(rng):
    """Integer-scale nearest: element repeat is index-exact ONLY for
    (asymmetric, floor) and (half_pixel, round_prefer_floor); the other
    combos must go through the exact per-axis gather (e.g. half_pixel+floor
    at scale 2 is [0,0,0,1,1,2,2,3], NOT a repeat)."""
    x = rng.standard_normal((1, 2, 4)).astype(F32)

    def run_resize(coord, nearest):
        ex = build(
            [("Resize", ["x", "", "s"], ["y"],
              {"mode": "nearest", "coordinate_transformation_mode": coord,
               "nearest_mode": nearest})],
            inits={"s": np.asarray([1, 1, 2.0], F32)},
            inputs=[("x", F32, x.shape)], outputs=[("y", F32, ("B", "C", "W"))],
        )
        return np.asarray(run1(ex, x=x))

    def spec_idx(coord, nearest):
        src = (np.arange(8, dtype=np.float32) + 0.5) / 2 - 0.5 \
            if coord == "half_pixel" else np.arange(8, dtype=np.float32) / 2
        if nearest == "floor":
            idx = np.floor(src)
        else:  # round_prefer_floor
            idx = np.ceil(src - 0.5)
        return np.clip(idx, 0, 3).astype(int)

    for coord in ("asymmetric", "half_pixel"):
        for nearest in ("floor", "round_prefer_floor"):
            got = run_resize(coord, nearest)
            want = x[:, :, spec_idx(coord, nearest)]
            np.testing.assert_array_equal(
                got, want, err_msg=f"{coord}/{nearest}")


def test_resize_same_dim_nonunit_scale_resamples(rng):
    """floor(in*scale) == in does NOT mean identity: scale=1.2 on dim 3
    keeps the length but the spec still resamples (indices [0,0,1])."""
    x = rng.standard_normal((1, 2, 3)).astype(F32)
    ex = build(
        [("Resize", ["x", "", "s"], ["y"],
          {"mode": "nearest", "coordinate_transformation_mode": "asymmetric",
           "nearest_mode": "floor"})],
        inits={"s": np.asarray([1, 1, 1.2], F32)},
        inputs=[("x", F32, x.shape)], outputs=[("y", F32, ("B", "C", "W"))],
    )
    got = np.asarray(run1(ex, x=x))
    src = np.arange(3, dtype=np.float32) / np.float32(1.2)
    want = x[:, :, np.floor(src).astype(int)]
    np.testing.assert_array_equal(got, want)


def test_pad_negative_crops(rng):
    # ONNX negative pads crop; mixed crop+pad on different dims
    x = rng.standard_normal((2, 5, 6)).astype(F32)
    ex = build([("Pad", ["x", "p"], ["y"])],
               inits={"p": np.array([0, -1, 2, 0, -2, -1], I64)},
               inputs=[("x", F32, (2, 5, 6))],
               outputs=[("y", F32, (2, 2, 7))])
    got = run1(ex, x=x)
    ref = np.pad(x[:, 1:-2, :-1], [(0, 0), (0, 0), (2, 0)])
    np.testing.assert_array_equal(got, ref)


def test_spacetodepth_roundtrips_depthtospace(rng):
    x = rng.standard_normal((2, 12, 4, 6)).astype(F32)
    ex = build([("DepthToSpace", ["x"], ["u"], {"blocksize": 2}),
                ("SpaceToDepth", ["u"], ["y"], {"blocksize": 2})],
               inputs=[("x", F32, (2, 12, 4, 6))],
               outputs=[("y", F32, (2, 12, 4, 6))])
    np.testing.assert_array_equal(run1(ex, x=x), x)

    # torch reference: pixel_unshuffle == SpaceToDepth (CRD-equivalent
    # channel order for the DCR inverse above differs; check against the
    # direct formula instead)
    ex = build([("SpaceToDepth", ["x"], ["y"], {"blocksize": 2})],
               inputs=[("x", F32, (2, 12, 4, 6))],
               outputs=[("y", F32, (2, 48, 2, 3))])
    n, c, h, w = x.shape
    ref = (x.reshape(n, c, h // 2, 2, w // 2, 2)
            .transpose(0, 3, 5, 1, 2, 4).reshape(n, c * 4, h // 2, w // 2))
    np.testing.assert_array_equal(run1(ex, x=x), ref)


def test_upsample_alias_vs_torch(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((1, 3, 5, 7)).astype(F32)
    # opset-9 form: scales as input
    ex = build([("Upsample", ["x", "s"], ["y"], {"mode": "nearest"})],
               inits={"s": np.array([1, 1, 2, 2], F32)},
               inputs=[("x", F32, (1, 3, 5, 7))],
               outputs=[("y", F32, (1, 3, 10, 14))])
    ref = tF.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_array_equal(run1(ex, x=x), ref)

    # opset-7 form: scales as attribute, linear mode
    ex = build([("Upsample", ["x"], ["y"],
                 {"mode": "linear", "scales": [1.0, 1.0, 2.0, 2.0]})],
               inputs=[("x", F32, (1, 3, 5, 7))],
               outputs=[("y", F32, (1, 3, 10, 14))])
    ref = tF.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="bilinear", align_corners=False).numpy()
    got = run1(ex, x=x)
    assert got.shape == ref.shape


# ---------------------------------------------------------------------------
# recurrent ops vs torch (ONNX gate packing differs from torch's — the
# remapping below IS the thing under test)
# ---------------------------------------------------------------------------

def _torch_gru_to_onnx(gru, layer=""):
    """torch packs GRU gates r,z,n; ONNX packs z,r,h. B = [Wb*3, Rb*3]."""
    import torch

    def remap(m):  # [3H, ...] r,z,n -> z,r,n
        h = m.shape[0] // 3
        return torch.cat([m[h:2 * h], m[:h], m[2 * h:]], dim=0)

    w = remap(getattr(gru, f"weight_ih_l0{layer}")).detach().numpy()
    r = remap(getattr(gru, f"weight_hh_l0{layer}")).detach().numpy()
    b = np.concatenate([
        remap(getattr(gru, f"bias_ih_l0{layer}")).detach().numpy(),
        remap(getattr(gru, f"bias_hh_l0{layer}")).detach().numpy()])
    return w, r, b


def _torch_lstm_to_onnx(lstm, layer=""):
    """torch packs LSTM gates i,f,g,o; ONNX packs i,o,f,c."""
    import torch

    def remap(m):
        h = m.shape[0] // 4
        i, f, g, o = m[:h], m[h:2 * h], m[2 * h:3 * h], m[3 * h:]
        return torch.cat([i, o, f, g], dim=0)

    w = remap(getattr(lstm, f"weight_ih_l0{layer}")).detach().numpy()
    r = remap(getattr(lstm, f"weight_hh_l0{layer}")).detach().numpy()
    b = np.concatenate([
        remap(getattr(lstm, f"bias_ih_l0{layer}")).detach().numpy(),
        remap(getattr(lstm, f"bias_hh_l0{layer}")).detach().numpy()])
    return w, r, b


def test_gru_vs_torch(rng):
    import torch

    t_len, batch, d_in, hidden = 6, 3, 4, 5
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    torch.manual_seed(0)
    gru = torch.nn.GRU(d_in, hidden)
    w, r, b = _torch_gru_to_onnx(gru)
    # torch GRU applies the reset gate AFTER the hidden linear -> lbr=1
    ex = build([("GRU", ["x", "w", "r", "b"], ["y", "yh"],
                 {"hidden_size": hidden, "linear_before_reset": 1})],
               inits={"w": w[None], "r": r[None], "b": b[None]},
               inputs=[("x", F32, (t_len, batch, d_in))],
               outputs=[("y", F32, (t_len, 1, batch, hidden)),
                        ("yh", F32, (1, batch, hidden))])
    y, yh = ex.run(None, {"x": x})
    with torch.no_grad():
        ref_y, ref_h = gru(torch.from_numpy(x))
    np.testing.assert_allclose(y[:, 0], ref_y.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, ref_h.numpy(), rtol=1e-4, atol=1e-5)


def test_gru_bidirectional_vs_torch(rng):
    import torch

    t_len, batch, d_in, hidden = 5, 2, 3, 4
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    torch.manual_seed(1)
    gru = torch.nn.GRU(d_in, hidden, bidirectional=True)
    wf, rf, bf = _torch_gru_to_onnx(gru)
    wr, rr, br = _torch_gru_to_onnx(gru, "_reverse")
    ex = build([("GRU", ["x", "w", "r", "b"], ["y", "yh"],
                 {"hidden_size": hidden, "linear_before_reset": 1,
                  "direction": "bidirectional"})],
               inits={"w": np.stack([wf, wr]), "r": np.stack([rf, rr]),
                      "b": np.stack([bf, br])},
               inputs=[("x", F32, (t_len, batch, d_in))],
               outputs=[("y", F32, (t_len, 2, batch, hidden)),
                        ("yh", F32, (2, batch, hidden))])
    y, yh = ex.run(None, {"x": x})
    with torch.no_grad():
        ref_y, ref_h = gru(torch.from_numpy(x))
    np.testing.assert_allclose(y[:, 0], ref_y[..., :hidden].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y[:, 1], ref_y[..., hidden:].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, ref_h.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_vs_torch(rng):
    import torch

    t_len, batch, d_in, hidden = 7, 2, 3, 4
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    h0 = rng.standard_normal((1, batch, hidden)).astype(F32)
    c0 = rng.standard_normal((1, batch, hidden)).astype(F32)
    torch.manual_seed(2)
    lstm = torch.nn.LSTM(d_in, hidden)
    w, r, b = _torch_lstm_to_onnx(lstm)
    ex = build([("LSTM", ["x", "w", "r", "b", "", "h0", "c0"],
                 ["y", "yh", "yc"], {"hidden_size": hidden})],
               inits={"w": w[None], "r": r[None], "b": b[None],
                      "h0": h0, "c0": c0},
               inputs=[("x", F32, (t_len, batch, d_in))],
               outputs=[("y", F32, (t_len, 1, batch, hidden)),
                        ("yh", F32, (1, batch, hidden)),
                        ("yc", F32, (1, batch, hidden))])
    y, yh, yc = ex.run(None, {"x": x})
    with torch.no_grad():
        ref_y, (ref_h, ref_c) = lstm(
            torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(y[:, 0], ref_y.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh, ref_h.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yc, ref_c.numpy(), rtol=1e-4, atol=1e-5)


def test_gru_sequence_lens(rng):
    # ORT semantics: Y rows past a sequence's length are zero, Y_h holds the
    # last valid step's state
    t_len, batch, d_in, hidden = 6, 3, 4, 5
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    lens = np.array([6, 3, 1], np.int32)
    w = (rng.standard_normal((1, 3 * hidden, d_in)) * 0.4).astype(F32)
    r = (rng.standard_normal((1, 3 * hidden, hidden)) * 0.4).astype(F32)
    ex = build([("GRU", ["x", "w", "r", "", "lens"], ["y", "yh"],
                 {"hidden_size": hidden})],
               inits={"w": w, "r": r, "lens": lens},
               inputs=[("x", F32, (t_len, batch, d_in))],
               outputs=[("y", F32, (t_len, 1, batch, hidden)),
                        ("yh", F32, (1, batch, hidden))])
    y, yh = ex.run(None, {"x": x})

    # full-length reference run, then mask/hold manually
    ex_full = build([("GRU", ["x", "w", "r"], ["y", "yh"],
                      {"hidden_size": hidden})],
                    inits={"w": w, "r": r},
                    inputs=[("x", F32, (t_len, batch, d_in))],
                    outputs=[("y", F32, (t_len, 1, batch, hidden)),
                             ("yh", F32, (1, batch, hidden))])
    y_full, _ = ex_full.run(None, {"x": x})
    for bi, ln in enumerate(lens):
        np.testing.assert_allclose(y[:ln, 0, bi], y_full[:ln, 0, bi],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(y[ln:, 0, bi], 0.0)
        np.testing.assert_allclose(yh[0, bi], y_full[ln - 1, 0, bi],
                                   rtol=1e-5, atol=1e-6)


def test_rnn_vs_manual(rng):
    t_len, batch, d_in, hidden = 4, 2, 3, 4
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    w = (rng.standard_normal((1, hidden, d_in)) * 0.5).astype(F32)
    r = (rng.standard_normal((1, hidden, hidden)) * 0.5).astype(F32)
    b = (rng.standard_normal((1, 2 * hidden)) * 0.5).astype(F32)
    ex = build([("RNN", ["x", "w", "r", "b"], ["y", "yh"],
                 {"hidden_size": hidden})],
               inits={"w": w, "r": r, "b": b},
               inputs=[("x", F32, (t_len, batch, d_in))],
               outputs=[("y", F32, (t_len, 1, batch, hidden)),
                        ("yh", F32, (1, batch, hidden))])
    y, yh = ex.run(None, {"x": x})
    h = np.zeros((batch, hidden), np.float32)
    for t in range(t_len):
        h = np.tanh(x[t] @ w[0].T + h @ r[0].T + b[0, :hidden]
                    + b[0, hidden:])
        np.testing.assert_allclose(y[t, 0], h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yh[0], h, rtol=1e-4, atol=1e-5)


def test_scan_cumsum_and_reverse(rng):
    """Scan: running-sum state over axis 0, one scan output; plus a second
    run with reversed input/output directions."""
    x = rng.standard_normal((5, 3)).astype(F32)

    body_nodes = [
        R.encode_node("Add", ["s_in", "xe"], ["s_out"], name="b0"),
        R.encode_node("Identity", ["s_out"], ["y_e"], name="b1"),
    ]
    body_ins = [R.encode_value_info("s_in", F32, (3,)),
                R.encode_value_info("xe", F32, (3,))]
    body_outs = [R.encode_value_info("s_out", F32, (3,)),
                 R.encode_value_info("y_e", F32, (3,))]
    body = R.SubgraphAttr(R.encode_graph("body", body_nodes, [],
                                         body_ins, body_outs))

    ex = build(
        [("Scan", ["s0", "x"], ["s_fin", "y"],
          {"body": body, "num_scan_inputs": 1})],
        inits={"s0": np.zeros(3, F32)},
        inputs=[("x", F32, (5, 3))],
        outputs=[("s_fin", F32, (3,)), ("y", F32, (5, 3))],
    )
    s_fin, y = ex.run(None, {"x": x})
    ref = np.cumsum(x, axis=0)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_fin, x.sum(0), rtol=1e-5, atol=1e-6)

    # reverse input direction + reverse output direction = suffix sums in
    # original order
    ex = build(
        [("Scan", ["s0", "x"], ["s_fin", "y"],
          {"body": body, "num_scan_inputs": 1,
           "scan_input_directions": [1], "scan_output_directions": [1]})],
        inits={"s0": np.zeros(3, F32)},
        inputs=[("x", F32, (5, 3))],
        outputs=[("s_fin", F32, (3,)), ("y", F32, (5, 3))],
    )
    s_fin, y = ex.run(None, {"x": x})
    ref = np.cumsum(x[::-1], axis=0)[::-1]
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_scan_axis1_two_inputs(rng):
    """Scan along axis 1 with TWO scan inputs and a non-zero output axis."""
    a = rng.standard_normal((2, 4)).astype(F32)
    b = rng.standard_normal((2, 4)).astype(F32)

    body_nodes = [
        R.encode_node("Mul", ["ae", "be"], ["prod"], name="b0"),
        R.encode_node("Add", ["s_in", "prod"], ["s_out"], name="b1"),
        R.encode_node("Identity", ["prod"], ["y_e"], name="b2"),
    ]
    body_ins = [R.encode_value_info("s_in", F32, (2,)),
                R.encode_value_info("ae", F32, (2,)),
                R.encode_value_info("be", F32, (2,))]
    body_outs = [R.encode_value_info("s_out", F32, (2,)),
                 R.encode_value_info("y_e", F32, (2,))]
    body = R.SubgraphAttr(R.encode_graph("body", body_nodes, [],
                                         body_ins, body_outs))

    ex = build(
        [("Scan", ["s0", "a", "b"], ["s_fin", "y"],
          {"body": body, "num_scan_inputs": 2,
           "scan_input_axes": [1, 1], "scan_output_axes": [1]})],
        inits={"s0": np.zeros(2, F32)},
        inputs=[("a", F32, (2, 4)), ("b", F32, (2, 4))],
        outputs=[("s_fin", F32, (2,)), ("y", F32, (2, 4))],
    )
    s_fin, y = ex.run(None, {"a": a, "b": b})
    np.testing.assert_allclose(y, a * b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_fin, (a * b).sum(1), rtol=1e-5, atol=1e-6)


def test_quantize_dequantize_linear(rng):
    x = (rng.standard_normal((3, 4)) * 3).astype(F32)
    scale = np.float32(0.05)
    zp = np.uint8(128)
    ex = build([("QuantizeLinear", ["x", "s", "z"], ["q"]),
                ("DequantizeLinear", ["q", "s", "z"], ["y"])],
               inits={"s": scale, "z": zp},
               inputs=[("x", F32, (3, 4))], outputs=[("y", F32, (3, 4))])
    y = run1(ex, x=x)
    q_ref = np.clip(np.round(x / scale) + 128, 0, 255)
    np.testing.assert_allclose(y, (q_ref - 128) * scale, rtol=1e-5, atol=1e-6)

    # int8 per-axis (channel) scales, no explicit zero point on dequantize
    w = (rng.standard_normal((4, 2)) * 2).astype(F32)
    ws = np.array([0.1, 0.02], F32)
    wq = np.clip(np.round(w / ws), -128, 127).astype(np.int8)
    ex = build([("DequantizeLinear", ["wq", "ws"], ["wf"], {"axis": 1}),
                ("MatMul", ["x", "wf"], ["y"])],
               inits={"wq": wq, "ws": ws},
               inputs=[("x", F32, (3, 4))], outputs=[("y", F32, (3, 2))])
    y = run1(ex, x=x)
    np.testing.assert_allclose(y, x @ (wq.astype(np.float32) * ws),
                               rtol=1e-4, atol=1e-5)


def test_qdq_saturation_and_default_uint8(rng):
    x = np.array([[-100.0, 0.0, 100.0]], F32)
    ex = build([("QuantizeLinear", ["x", "s"], ["q"])],
               inits={"s": np.float32(1.0)},
               inputs=[("x", F32, (1, 3))],
               outputs=[("q", np.uint8, (1, 3))])
    q = run1(ex, x=x)
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q, [[0, 0, 100]])


def test_dynamic_quantized_matmul(rng):
    """The ORT dynamic-quantization pattern: DynamicQuantizeLinear ->
    MatMulInteger -> dequantize via scales. End-to-end vs f32 matmul."""
    x = rng.standard_normal((3, 8)).astype(F32)
    w = (rng.standard_normal((8, 4)) * 0.5).astype(F32)
    ws = np.float32(0.01)
    wq = np.clip(np.round(w / ws), -128, 127).astype(np.int8)

    ex = build(
        [("DynamicQuantizeLinear", ["x"], ["xq", "xs", "xz"]),
         ("MatMulInteger", ["xq", "wq", "xz"], ["yi"]),
         ("Cast", ["yi"], ["yf"], {"to": 1}),
         ("Mul", ["xs", "ws"], ["s2"]),
         ("Mul", ["yf", "s2"], ["y"])],
        inits={"wq": wq, "ws": ws},
        inputs=[("x", F32, (3, 8))], outputs=[("y", F32, (3, 4))],
    )
    y = run1(ex, x=x)
    ref = x @ (wq.astype(np.float32) * ws)
    # quantization error bound: |x| <= ~4, scale ~ 8/255
    np.testing.assert_allclose(y, ref, atol=0.15)


def test_matmulinteger_per_row_zero_point():
    a = np.array([[1, 2], [3, 4]], np.uint8)
    b = np.array([[1, 0], [0, 1]], np.int8)
    a_zp = np.array([1, 2], np.uint8)  # per-row of A
    ex = build([("MatMulInteger", ["a", "b", "az"], ["y"])],
               inits={"a": a, "b": b, "az": a_zp},
               inputs=[], outputs=[("y", np.int32, (2, 2))])
    (y,) = ex.run(None, {})
    ref = (a.astype(np.int32) - a_zp[:, None]) @ b.astype(np.int32)
    np.testing.assert_array_equal(y, ref)


# ---------------------------------------------------------------------------
# com.microsoft contrib ops (ORT graph-optimizer output)
# ---------------------------------------------------------------------------

def test_contrib_norms_and_gelus(rng):
    x = rng.standard_normal((2, 5, 8)).astype(F32)
    skip = rng.standard_normal((2, 5, 8)).astype(F32)
    g = rng.standard_normal((8,)).astype(F32)
    b = rng.standard_normal((8,)).astype(F32)

    # SkipLayerNormalization == LN(x + skip)
    ex = build([("SkipLayerNormalization", ["x", "sk", "g", "b"], ["y"],
                 {"epsilon": 1e-5})],
               inits={"g": g, "b": b},
               inputs=[("x", F32, (2, 5, 8)), ("sk", F32, (2, 5, 8))],
               outputs=[("y", F32, (2, 5, 8))])
    s = x + skip
    mu = s.mean(-1, keepdims=True)
    var = ((s - mu) ** 2).mean(-1, keepdims=True)
    ref = (s - mu) / np.sqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(run1(ex, x=x, sk=skip), ref,
                               rtol=1e-4, atol=1e-5)

    # SimplifiedLayerNormalization == RMSNorm
    ex = build([("SimplifiedLayerNormalization", ["x", "g"], ["y"],
                 {"epsilon": 1e-6})],
               inits={"g": g},
               inputs=[("x", F32, (2, 5, 8))], outputs=[("y", F32, (2, 5, 8))])
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6) * g
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)

    # BiasGelu / FastGelu / QuickGelu
    import math
    bias = rng.standard_normal((8,)).astype(F32)
    ex = build([("BiasGelu", ["x", "bb"], ["y"])], inits={"bb": bias},
               inputs=[("x", F32, (2, 5, 8))], outputs=[("y", F32, (2, 5, 8))])
    xb = (x + bias).astype(np.float64)
    ref = xb * 0.5 * (1 + np.vectorize(math.erf)(xb / np.sqrt(2)))
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)

    ex = build([("QuickGelu", ["x"], ["y"])],
               inputs=[("x", F32, (2, 5, 8))], outputs=[("y", F32, (2, 5, 8))])
    ref = x / (1 + np.exp(-1.702 * x)) 
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)


def test_contrib_fusedmatmul(rng):
    a = rng.standard_normal((3, 4)).astype(F32)
    b = rng.standard_normal((5, 4)).astype(F32)
    ex = build([("FusedMatMul", ["a", "b"], ["y"],
                 {"alpha": 0.5, "transB": 1})],
               inits={"b": b},
               inputs=[("a", F32, (3, 4))], outputs=[("y", F32, (3, 5))])
    np.testing.assert_allclose(run1(ex, a=a), 0.5 * (a @ b.T),
                               rtol=1e-5, atol=1e-5)


def test_contrib_attention_vs_manual(rng):
    b, s, h, nh = 2, 6, 8, 2
    x = rng.standard_normal((b, s, h)).astype(F32)
    w = (rng.standard_normal((h, 3 * h)) * 0.3).astype(F32)
    bias = (rng.standard_normal((3 * h,)) * 0.1).astype(F32)
    lens = np.array([6, 3], np.int32)

    ex = build([("Attention", ["x", "w", "bb", "mi"], ["y"],
                 {"num_heads": nh})],
               inits={"w": w, "bb": bias, "mi": lens},
               inputs=[("x", F32, (b, s, h))], outputs=[("y", F32, (b, s, h))])
    y = run1(ex, x=x)

    qkv = x @ w + bias
    q, k, v = qkv[..., :h], qkv[..., h:2 * h], qkv[..., 2 * h:]
    dh = h // nh
    ref = np.zeros_like(x)
    for bi in range(b):
        for hd in range(nh):
            qs = q[bi, :, hd * dh:(hd + 1) * dh]
            ks = k[bi, :, hd * dh:(hd + 1) * dh]
            vs = v[bi, :, hd * dh:(hd + 1) * dh]
            lg = qs @ ks.T / np.sqrt(dh)
            lg[:, lens[bi]:] = -1e9
            p = np.exp(lg - lg.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[bi, :, hd * dh:(hd + 1) * dh] = p @ vs
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-4)


def test_contrib_fusedconv(rng):
    import torch
    import torch.nn.functional as tF

    x = rng.standard_normal((1, 3, 10)).astype(F32)
    w = rng.standard_normal((4, 3, 3)).astype(F32)
    ex = build([("FusedConv", ["x", "w"], ["y"],
                 {"kernel_shape": [3], "pads": [1, 1],
                  "activation": "Relu"})],
               inits={"w": w},
               inputs=[("x", F32, (1, 3, 10))], outputs=[("y", F32, (1, 4, 10))])
    ref = tF.relu(tF.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                            padding=1)).numpy()
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)


def test_contrib_embedlayernorm(rng):
    v_sz, h, b, s = 20, 8, 2, 5
    ids = rng.integers(0, v_sz, (b, s)).astype(np.int32)
    we = rng.standard_normal((v_sz, h)).astype(F32)
    pe = rng.standard_normal((s + 2, h)).astype(F32)
    g = rng.standard_normal((h,)).astype(F32)
    bb = rng.standard_normal((h,)).astype(F32)
    mask = np.array([[1, 1, 1, 1, 1], [1, 1, 0, 0, 0]], np.int32)

    ex = build([("EmbedLayerNormalization",
                 ["ids", "", "we", "pe", "", "g", "bb", "m"],
                 ["y", "mi"], {"epsilon": 1e-5})],
               inits={"we": we, "pe": pe, "g": g, "bb": bb, "m": mask},
               inputs=[("ids", np.int32, (b, s))],
               outputs=[("y", F32, (b, s, h)), ("mi", np.int32, (b,))])
    y, mi = ex.run(None, {"ids": ids})
    emb = we[ids] + pe[None, :s]
    mu = emb.mean(-1, keepdims=True)
    var = ((emb - mu) ** 2).mean(-1, keepdims=True)
    ref = (emb - mu) / np.sqrt(var + 1e-5) * g + bb
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(mi, [5, 2])


def test_contrib_multiheadattention(rng):
    b, sq, skv, h, nh = 2, 4, 6, 8, 2
    q = rng.standard_normal((b, sq, h)).astype(F32)
    k = rng.standard_normal((b, skv, h)).astype(F32)
    v = rng.standard_normal((b, skv, h)).astype(F32)
    lens = np.array([6, 3], np.int32)
    ex = build([("MultiHeadAttention", ["q", "k", "v", "", "m"], ["y"],
                 {"num_heads": nh})],
               inits={"m": lens},
               inputs=[("q", F32, (b, sq, h)), ("k", F32, (b, skv, h)),
                       ("v", F32, (b, skv, h))],
               outputs=[("y", F32, (b, sq, h))])
    y = run1(ex, q=q, k=k, v=v)
    dh = h // nh
    ref = np.zeros((b, sq, h), F32)
    for bi in range(b):
        for hd in range(nh):
            sl = slice(hd * dh, (hd + 1) * dh)
            lg = q[bi, :, sl] @ k[bi, :, sl].T / np.sqrt(dh)
            lg[:, lens[bi]:] = -1e9
            p = np.exp(lg - lg.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[bi, :, sl] = p @ v[bi, :, sl]
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-4)


def test_contrib_diffusion_set(rng):
    # BiasAdd / BiasSplitGelu / GroupNorm (NHWC, swish) — the ORT
    # diffusion-optimizer fusion set
    import math

    x = rng.standard_normal((2, 3, 8)).astype(F32)
    bias = rng.standard_normal((8,)).astype(F32)
    skip = rng.standard_normal((2, 3, 8)).astype(F32)
    ex = build([("BiasAdd", ["x", "bb", "sk"], ["y"])],
               inits={"bb": bias},
               inputs=[("x", F32, (2, 3, 8)), ("sk", F32, (2, 3, 8))],
               outputs=[("y", F32, (2, 3, 8))])
    np.testing.assert_allclose(run1(ex, x=x, sk=skip), x + bias + skip,
                               rtol=1e-6)

    ex = build([("BiasSplitGelu", ["x", "bb"], ["y"])],
               inits={"bb": bias},
               inputs=[("x", F32, (2, 3, 8))], outputs=[("y", F32, (2, 3, 4))])
    s = (x + bias).astype(np.float64)
    a, b = s[..., :4], s[..., 4:]
    ref = a * (b * 0.5 * (1 + np.vectorize(math.erf)(b / np.sqrt(2))))
    np.testing.assert_allclose(run1(ex, x=x), ref, rtol=1e-4, atol=1e-5)

    # GroupNorm NHWC vs torch (NCHW) with swish
    import torch
    import torch.nn.functional as tF

    xn = rng.standard_normal((2, 4, 3, 6)).astype(F32)  # NHWC, C=6
    g = rng.standard_normal((6,)).astype(F32)
    be = rng.standard_normal((6,)).astype(F32)
    ex = build([("GroupNorm", ["x", "g", "b"], ["y"],
                 {"groups": 2, "epsilon": 1e-5, "activation": 1})],
               inits={"g": g, "b": be},
               inputs=[("x", F32, (2, 4, 3, 6))],
               outputs=[("y", F32, (2, 4, 3, 6))])
    got = run1(ex, x=xn)
    xt = torch.from_numpy(np.transpose(xn, (0, 3, 1, 2)))  # NCHW
    ref = tF.group_norm(xt, 2, torch.from_numpy(g), torch.from_numpy(be),
                        eps=1e-5)
    ref = tF.silu(ref).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_contrib_rotaryembedding(rng):
    b, n, s, dh = 2, 2, 5, 8
    x = rng.standard_normal((b, n, s, dh)).astype(F32)
    max_pos = 16
    inv = 1.0 / (10000 ** (np.arange(0, dh // 2) * 2 / dh))
    ang = np.arange(max_pos)[:, None] * inv[None, :]
    cos, sin = np.cos(ang).astype(F32), np.sin(ang).astype(F32)
    pos = np.tile(np.arange(s, dtype=np.int64)[None], (b, 1))

    ex = build([("RotaryEmbedding", ["x", "p", "c", "s"], ["y"])],
               inits={"p": pos, "c": cos, "s": sin},
               inputs=[("x", F32, (b, n, s, dh))],
               outputs=[("y", F32, (b, n, s, dh))])
    y = run1(ex, x=x)
    half = dh // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[pos][:, None]
    sn = sin[pos][:, None]
    ref = np.concatenate([x1 * c - x2 * sn, x1 * sn + x2 * c], axis=-1)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_softmax_opset_semantics(rng):
    """Softmax < 13 flattens trailing dims from `axis`; >= 13 is per-axis."""
    x = rng.standard_normal((2, 3, 4)).astype(F32)

    def build_with_opset(opset):
        node = R.encode_node("Softmax", ["x"], ["y"], name="n0",
                             attrs={"axis": 1})
        data = R.encode_model(
            "g", [node], [],
            [R.encode_value_info("x", F32, (2, 3, 4))],
            [R.encode_value_info("y", F32, (2, 3, 4))], opset=opset)
        return OnnxExecutor(R.parse_model(data))

    # modern: softmax along axis 1 only
    y = run1(build_with_opset(17), x=x)
    e = np.exp(x - x.max(1, keepdims=True))
    np.testing.assert_allclose(y, e / e.sum(1, keepdims=True),
                               rtol=1e-5, atol=1e-6)

    # opset 11: softmax over the flattened [3*4] trailing block
    y = run1(build_with_opset(11), x=x)
    flat = x.reshape(2, 12)
    e = np.exp(flat - flat.max(-1, keepdims=True))
    ref = (e / e.sum(-1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_contrib_attention_scale_attr(rng):
    b, s, h, nh = 1, 4, 8, 2
    x = rng.standard_normal((b, s, h)).astype(F32)
    w = (rng.standard_normal((h, 3 * h)) * 0.3).astype(F32)

    def run_with(attrs):
        ex = build([("Attention", ["x", "w"], ["y"], attrs)],
                   inits={"w": w},
                   inputs=[("x", F32, (b, s, h))],
                   outputs=[("y", F32, (b, s, h))])
        return run1(ex, x=x)

    default = run_with({"num_heads": nh})
    scaled = run_with({"num_heads": nh, "scale": 1.0})
    assert not np.allclose(default, scaled)
    # scale=1/sqrt(dh) must equal the default
    np.testing.assert_allclose(
        run_with({"num_heads": nh, "scale": 1.0 / np.sqrt(h // nh)}),
        default, rtol=1e-5, atol=1e-6)


def test_gru_accepts_default_activations_attr(rng):
    """tf2onnx always serializes `activations`, even with the defaults —
    must run, while a genuine custom chain raises."""
    t_len, batch, d_in, hidden = 3, 2, 3, 4
    x = rng.standard_normal((t_len, batch, d_in)).astype(F32)
    w = (rng.standard_normal((1, 3 * hidden, d_in)) * 0.4).astype(F32)
    r = (rng.standard_normal((1, 3 * hidden, hidden)) * 0.4).astype(F32)

    def build_gru(acts):
        return build([("GRU", ["x", "w", "r"], ["y", "yh"],
                       {"hidden_size": hidden, "activations": acts})],
                     inits={"w": w, "r": r},
                     inputs=[("x", F32, (t_len, batch, d_in))],
                     outputs=[("y", F32, (t_len, 1, batch, hidden)),
                              ("yh", F32, (1, batch, hidden))])

    y, _ = build_gru(["Sigmoid", "Tanh"]).run(None, {"x": x})
    assert np.isfinite(y).all()
    with pytest.raises(UnsupportedOp):
        build_gru(["Relu", "Relu"]).run(None, {"x": x})


def test_small_float_initializers_are_jit_arguments(rng):
    """Per-channel gains / scalar scales must be weights (jit args), not
    baked constants — hot-swapping exe._weights must actually take effect.
    Resize scales stay static (ops require trace-time values)."""
    x = rng.standard_normal((2, 4)).astype(F32)
    gain = np.array([1.0, 2.0, 3.0, 4.0], F32)  # size 4 <= the old 32 cap
    ex = build([("Mul", ["x", "g"], ["y"])], inits={"g": gain},
               inputs=[("x", F32, (2, 4))], outputs=[("y", F32, (2, 4))])
    assert "g" in ex._weights and "g" not in ex._static_inits
    np.testing.assert_allclose(run1(ex, x=x), x * gain, rtol=1e-6)
    # swap the weight: the SAME compiled executable must honor it
    ex._weights["g"] = ex._weights["g"] * 10.0
    np.testing.assert_allclose(run1(ex, x=x), x * gain * 10.0, rtol=1e-6)

    # Resize scales are genuinely static-required and stay constants
    xr = rng.standard_normal((1, 2, 4)).astype(F32)
    ex = build([("Resize", ["x", "", "s"], ["y"],
                 {"mode": "nearest", "coordinate_transformation_mode":
                  "asymmetric", "nearest_mode": "floor"})],
               inits={"s": np.array([1, 1, 2], F32)},
               inputs=[("x", F32, (1, 2, 4))], outputs=[("y", F32, (1, 2, 8))])
    assert "s" in ex._static_inits
    assert run1(ex, x=xr).shape == (1, 2, 8)


def test_bf16_storage_mode(rng):
    """bf16_storage=True: attention-shaped graphs run with MatMul/Conv
    outputs stored bfloat16 (softmax/norm still f32-accumulated), graph
    outputs keep their declared f32 dtype, and results stay within bf16
    rounding of the strict-f32 run."""
    q = rng.standard_normal((2, 8, 16)).astype(F32)
    k = rng.standard_normal((2, 16, 8)).astype(F32)
    v = rng.standard_normal((2, 8, 16)).astype(F32)
    scale = np.ones((16,), F32)
    bias = np.zeros((16,), F32)

    def make(**kw):
        data = R.encode_model(
            "g",
            [R.encode_node("MatMul", ["q", "k"], ["logits"], name="n0"),
             R.encode_node("Softmax", ["logits"], ["p"], name="n1",
                           attrs={"axis": -1}),
             R.encode_node("MatMul", ["p", "v"], ["ctxv"], name="n2"),
             R.encode_node("LayerNormalization", ["ctxv", "scale", "bias"],
                           ["y"], name="n3", attrs={"axis": -1})],
            [R.encode_tensor("k", k), R.encode_tensor("v", v),
             R.encode_tensor("scale", scale), R.encode_tensor("bias", bias)],
            [R.encode_value_info("q", F32, (2, 8, 16))],
            [R.encode_value_info("y", F32, (2, 8, 16))],
        )
        return OnnxExecutor(R.parse_model(data), **kw)

    ref = make().run(None, {"q": q})[0]
    got = make(bf16_storage=True).run(None, {"q": q})[0]
    assert got.dtype == np.float32
    assert np.max(np.abs(got - ref)) < 0.1  # bf16 rounding, not divergence
    np.testing.assert_allclose(got, ref, atol=0.1, rtol=0.1)


def test_bf16_storage_conv(rng):
    """Conv outputs store bf16 under the flag; final graph output is f32."""
    x = rng.standard_normal((1, 4, 16)).astype(F32)
    w = (rng.standard_normal((8, 4, 3)) * 0.2).astype(F32)
    ex = build([("Conv", ["x", "w"], ["h"], {"pads": [1, 1]}),
                ("Relu", ["h"], ["h2"]),
                ("ReduceMean", ["h2"], ["y"], {"axes": [2]})],
               inits={"w": w},
               inputs=[("x", F32, (1, 4, 16))],
               outputs=[("y", F32, (1, 8, 1))])
    ref = run1(ex, x=x)
    ex2 = build([("Conv", ["x", "w"], ["h"], {"pads": [1, 1]}),
                 ("Relu", ["h"], ["h2"]),
                 ("ReduceMean", ["h2"], ["y"], {"axes": [2]})],
                inits={"w": w},
                inputs=[("x", F32, (1, 4, 16))],
                outputs=[("y", F32, (1, 8, 1))],
                bf16_storage=True)
    got = ex2.run(None, {"x": x})[0]
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_dead_shape_chain_pruned():
    """Exporter-left dead branches (Shape/Gather trees feeding nothing) are
    eliminated before tracing — a dead node with an op the registry does
    NOT support must not break execution of the live path."""
    ex = build(
        [
            ("Relu", ["x"], ["y"]),
            # dead chain, including an op this executor has no handler for
            ("Shape", ["x"], ["d_shape"]),
            ("NonMaxSuppression", ["d_shape"], ["d_boxes"]),
        ],
        inputs=[("x", F32, (2, 3))],
        outputs=[("y", F32, (2, 3))],
    )
    assert [n.op_type for n in ex._nodes] == ["Relu"]
    x = np.array([[-1, 2, -3], [4, -5, 6]], F32)
    np.testing.assert_array_equal(run1(ex, x=x), np.maximum(x, 0))


def test_time_mask_makes_bucket_padded_conv_stack_exact():
    """Regression for the round-4 bucket-halo bug: a mask-free conv-stack
    graph (the reference vocoder shape, §2.2) run at BUCKET-padded length
    bleeds conv-bias halo from the padded frames into the valid tail —
    dilated and overlapping-transposed convs carry it several frames in.
    With ``time_mask`` passed to ``_run_traced``, the executor re-zeroes
    padded frames after every Conv/ConvTranspose, making padded execution
    bit-identical to exact-length execution. (The synthetic four-graph
    bundle's vocoder is a NON-overlapping stride==kernel ConvTranspose, so
    the module-level backend tests could never catch this.)"""
    from test_onnx_pipeline import _model

    rng = np.random.default_rng(7)
    c, up, k_up, k = 4, 4, 8, 3
    w_up = rng.standard_normal((c, c, k_up)).astype(np.float32) * 0.3
    b_up = rng.standard_normal((c,)).astype(np.float32)
    w_c = rng.standard_normal((c, c, k)).astype(np.float32) * 0.3
    b_c = rng.standard_normal((c,)).astype(np.float32)
    model = _model(
        [("ConvTranspose", ["latent", "w_up", "b_up"], ["h"],
          {"strides": [up], "kernel_shape": [k_up], "pads": [2, 2]}),
         ("Conv", ["h", "w_c", "b_c"], ["h2"],
          {"kernel_shape": [k], "dilations": [2], "pads": [2, 2]}),
         ("Tanh", ["h2"], ["wav"], None)],
        {"w_up": w_up, "b_up": b_up, "w_c": w_c, "b_c": b_c},
        [("latent", np.float32, ("B", c, "T"))],
        [("wav", np.float32, ("B", c, "W"))],
    )
    exe = OnnxExecutor(R.parse_model(model))
    t_true, pad = 11, 5
    x = rng.standard_normal((2, c, t_true)).astype(np.float32)
    (exact,) = exe._run_traced(exe._weights, (jnp.asarray(x),))

    xp = np.zeros((2, c, t_true + pad), np.float32)
    xp[:, :, :t_true] = x
    mask = (np.arange(t_true + pad) < t_true).astype(np.float32)

    # unmasked padded run DIFFERS in the valid tail (the bug this guards)
    (padded_raw,) = exe._run_traced(exe._weights, (jnp.asarray(xp),))
    assert not np.allclose(np.asarray(padded_raw)[..., : exact.shape[-1]],
                           np.asarray(exact), atol=1e-6)

    # masked padded run is EXACT in the valid region
    (padded_masked,) = exe._run_traced(
        exe._weights, (jnp.asarray(xp),), jnp.asarray(mask))
    np.testing.assert_array_equal(
        np.asarray(padded_masked)[..., : exact.shape[-1]],
        np.asarray(exact))


def test_store_mixed_pointwise_policy():
    """_store_mixed (r5): under bf16-storage mode a binary pointwise result
    with any bf16 operand is stored bf16 — the policy that keeps the
    residual/AdaLN activation stream bf16 between matmuls (the
    executor-vs-native throughput gap of r4 was exactly this re-inflation).
    Graph outputs and static (numpy) values are exempt."""
    import jax.numpy as jnp

    from supertonic_tpu.assets.onnx_exec import Ctx, _store_mixed
    from supertonic_tpu.assets.onnx_reader import OnnxNode

    node = OnnxNode("Add", "n", ["a", "b"], ["t"], {})
    a16 = jnp.ones((2, 3, 4), jnp.bfloat16)
    b32 = jnp.ones((2, 3, 4), jnp.float32)
    y = a16 + b32  # jnp promotion -> f32
    assert y.dtype == jnp.float32

    on = {"__bf16_storage__": True, "__graph_outputs__": frozenset({"out"})}
    ctx = Ctx(jnp, {}, node, on)
    assert _store_mixed(ctx, y, a16, b32).dtype == jnp.bfloat16
    # all-f32 operands: nothing arrived bf16, result stays f32
    assert _store_mixed(ctx, y, b32, b32).dtype == jnp.float32
    # flag off: untouched
    assert _store_mixed(Ctx(jnp, {}, node, {}), y, a16, b32).dtype \
        == jnp.float32
    # declared graph output: keeps its f32 contract
    out_node = OnnxNode("Add", "n2", ["a", "b"], ["out"], {})
    assert _store_mixed(Ctx(jnp, {}, out_node, on), y, a16, b32).dtype \
        == jnp.float32
    # static numpy value (shape-math path): never touched
    import numpy as _np

    ys = _np.ones((2,), _np.float32)
    assert _store_mixed(ctx, ys, a16, b32).dtype == _np.float32
