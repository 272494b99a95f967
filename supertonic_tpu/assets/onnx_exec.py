"""Generic ONNX-graph executor on JAX.

The four reference networks ship as ONNX graphs (SURVEY.md §2.2;
reference py/helper.py:289-306) whose internals are unknown until the real
assets are mountable. Rather than guessing the architecture, this module
interprets *any* ONNX graph op-by-op on top of the dependency-free
``onnx_reader`` and jit-compiles the whole thing with XLA — so the moment
real weights drop in, bit-level parity against the reference pipeline is a
data problem, not an architecture gamble. The hand-tuned native models in
``models/`` remain the fast path, validated against this executor.

Design notes (TPU/XLA-first):

* **Static shape math.** ONNX graphs compute shapes dynamically
  (Shape -> Gather -> Concat -> Reshape). Under ``jax.jit`` every shape is
  static, so the executor partially evaluates: integer initializers,
  ``Shape``/``Constant`` outputs, and any op in the static-eval set whose
  inputs are all host values are computed eagerly with numpy at trace time.
  Ops like ``Reshape``/``Slice``/``Expand`` then see concrete shapes and
  lower to static XLA ops. A genuinely data-dependent shape raises a clear
  error instead of silently miscompiling.
* **Weights as jit arguments.** Float initializers are passed into the
  jitted program as arguments (never closed over — see CLAUDE.md), so the
  compiled executable is reused across weight updates and donation works.
  Integer initializers are treated as trace-time constants (they are shape
  tables / index maps, not learnable weights).
* **Precision.** Defaults to float32 matmul precision so parity versus
  onnxruntime's strict-f32 CPU semantics holds on TPU (SURVEY.md §7.3
  hard-part #2); pass ``matmul_precision='default'`` for the fast bf16 path.

int64 caveat: jax runs with 32-bit ints by default; traced int64 tensors
become int32. Shape arithmetic stays in numpy int64 (static), so this only
affects data-plane integer tensors, which for these graphs are token ids and
indices far below 2**31.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .onnx_reader import DTYPE_MAP, OnnxGraph, OnnxNode, load_onnx

__all__ = ["OnnxExecutor", "OnnxSession", "load_session", "UnsupportedOp"]


class UnsupportedOp(NotImplementedError):
    pass


def _is_static(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic))


def _spec(nd: int) -> tuple[str, str, str]:
    sp = "DHW"[-nd:] if nd <= 3 else "".join(chr(ord("a") + i) for i in range(nd))
    return ("NC" + sp, "OI" + sp, "NC" + sp)


@dataclasses.dataclass
class Ctx:
    xp: Any  # np (static eval) or jnp (traced)
    attrs: dict[str, Any]
    node: OnnxNode
    env: dict | None = None  # enclosing scope (If/Loop subgraph capture)

    def attr(self, name: str, default=None):
        return self.attrs.get(name, default)

    def static(self, v, what: str) -> np.ndarray:
        """Require a trace-time-known value (shape/axes/pads operand)."""
        if v is None:
            raise ValueError(f"{self.node.op_type} '{self.node.name}': "
                             f"missing required static input ({what})")
        if not _is_static(v):
            raise UnsupportedOp(
                f"{self.node.op_type} '{self.node.name}': {what} is a traced "
                f"tensor; data-dependent shapes cannot compile under jit"
            )
        return np.asarray(v)


_REGISTRY: dict[str, Callable] = {}


def op(name: str, *, static_ok: bool = False):
    def deco(fn):
        fn.static_ok = static_ok
        _REGISTRY[name] = fn
        return fn
    return deco


# ---------------------------------------------------------------------------
# elementwise / unary
# ---------------------------------------------------------------------------

def _simple(name: str, fn, *, static_ok: bool = False):
    @op(name, static_ok=static_ok)
    def h(ctx: Ctx, *ins):
        return fn(ctx, *ins)
    h.__name__ = f"op_{name.lower()}"
    return h


_simple("Identity", lambda c, x: x, static_ok=True)
_simple("Relu", lambda c, x: c.xp.maximum(x, 0))
_simple("Sigmoid", lambda c, x: jax.nn.sigmoid(x))
_simple("Tanh", lambda c, x: c.xp.tanh(x))
_simple("Exp", lambda c, x: c.xp.exp(x))
_simple("Log", lambda c, x: c.xp.log(x))
_simple("Sqrt", lambda c, x: c.xp.sqrt(x))
_simple("Reciprocal", lambda c, x: 1.0 / x)
_simple("Neg", lambda c, x: -x, static_ok=True)
_simple("Abs", lambda c, x: c.xp.abs(x), static_ok=True)
_simple("Floor", lambda c, x: c.xp.floor(x), static_ok=True)
_simple("Ceil", lambda c, x: c.xp.ceil(x), static_ok=True)
_simple("Round", lambda c, x: c.xp.round(x))
_simple("Sin", lambda c, x: c.xp.sin(x))
_simple("Cos", lambda c, x: c.xp.cos(x))
_simple("Tan", lambda c, x: c.xp.tan(x))
_simple("Erf", lambda c, x: jax.scipy.special.erf(x))
_simple("Sign", lambda c, x: c.xp.sign(x))
_simple("Softplus", lambda c, x: jax.nn.softplus(x))
_simple("Softsign", lambda c, x: x / (1 + c.xp.abs(x)))
_simple("Not", lambda c, x: c.xp.logical_not(x), static_ok=True)
_simple("IsNaN", lambda c, x: c.xp.isnan(x))
@op("IsInf")
def op_isinf(ctx: Ctx, x):
    neg = ctx.attr("detect_negative", 1)
    pos = ctx.attr("detect_positive", 1)
    if neg and pos:
        return ctx.xp.isinf(x)
    if pos:
        return ctx.xp.isposinf(x) if ctx.xp is np else jnp.isposinf(x)
    if neg:
        return ctx.xp.isneginf(x) if ctx.xp is np else jnp.isneginf(x)
    return ctx.xp.zeros_like(x, dtype=bool)
_simple("Sinh", lambda c, x: c.xp.sinh(x))
_simple("Cosh", lambda c, x: c.xp.cosh(x))
_simple("Asin", lambda c, x: c.xp.arcsin(x))
_simple("Acos", lambda c, x: c.xp.arccos(x))
_simple("Atan", lambda c, x: c.xp.arctan(x))
_simple("Asinh", lambda c, x: c.xp.arcsinh(x))
_simple("Acosh", lambda c, x: c.xp.arccosh(x))
_simple("Atanh", lambda c, x: c.xp.arctanh(x))
_simple("Mish", lambda c, x: x * c.xp.tanh(jax.nn.softplus(x)))
_simple("HardSwish", lambda c, x: x * jnp.clip(x / 6.0 + 0.5, 0, 1))


@op("Gelu")
def op_gelu(ctx: Ctx, x):
    approx = ctx.attr("approximate", "none")
    return jax.nn.gelu(x, approximate=(approx == "tanh"))


@op("LeakyRelu")
def op_leakyrelu(ctx: Ctx, x):
    alpha = ctx.attr("alpha", 0.01)
    return jnp.where(x >= 0, x, alpha * x)


@op("Elu")
def op_elu(ctx: Ctx, x):
    alpha = ctx.attr("alpha", 1.0)
    return jnp.where(x >= 0, x, alpha * (jnp.exp(x) - 1))


@op("HardSigmoid")
def op_hardsigmoid(ctx: Ctx, x):
    a, b = ctx.attr("alpha", 0.2), ctx.attr("beta", 0.5)
    return jnp.clip(a * x + b, 0, 1)


@op("PRelu")
def op_prelu(ctx: Ctx, x, slope):
    return jnp.where(x >= 0, x, slope * x)


@op("Selu")
def op_selu(ctx: Ctx, x):
    # ONNX defaults (exact f32 literals from the spec)
    alpha = ctx.attr("alpha", 1.6732631921768188)
    gamma = ctx.attr("gamma", 1.0507010221481323)
    return gamma * jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1))


@op("Celu")
def op_celu(ctx: Ctx, x):
    alpha = ctx.attr("alpha", 1.0)
    return jnp.maximum(x, 0) + jnp.minimum(0.0, alpha * (jnp.exp(x / alpha) - 1))


@op("ThresholdedRelu")
def op_thresholdedrelu(ctx: Ctx, x):
    alpha = ctx.attr("alpha", 1.0)
    return jnp.where(x > alpha, x, 0.0).astype(x.dtype)


@op("Shrink")
def op_shrink(ctx: Ctx, x):
    lambd = ctx.attr("lambd", 0.5)
    bias = ctx.attr("bias", 0.0)
    return jnp.where(x < -lambd, x + bias,
                     jnp.where(x > lambd, x - bias, 0.0)).astype(x.dtype)


@op("Clip")
def op_clip(ctx: Ctx, x, lo=None, hi=None):
    if lo is None and "min" in ctx.attrs:
        lo = ctx.attr("min")
    if hi is None and "max" in ctx.attrs:
        hi = ctx.attr("max")
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


# ---------------------------------------------------------------------------
# binary / variadic
# ---------------------------------------------------------------------------

def _store_mixed(ctx: Ctx, y, *ins):
    """bf16-storage policy for binary pointwise arithmetic (Add/Sub/Mul/
    Div): jnp type promotion turns a mixed bf16/f32 operand pair into an
    f32 RESULT, which re-inflates the activation stream one op after every
    MatMul/Conv stored it bf16. In the 66M estimator the residual Add and
    the AdaLN modulation Mul are exactly such sites, and the f32 stream
    they rebuild is what the per-step LayerNorm fusions then carry at
    f32[64,256,512] (xplane r5: the six LN fusions cost ~7 ms/iter of the
    executor-vs-native b64 gap). Under bf16-storage mode, if any floating
    operand arrived bf16, the result is stored bf16 — matching the native
    fast path's end-to-end bf16 activation stream (norm stats and softmax
    still accumulate f32 at their op sites via _acc_upcast/_softmax_like;
    declared graph outputs are restored at the _run_traced boundary)."""
    env = ctx.env or {}
    if (env.get("__bf16_storage__")
            and not _is_static(y)
            and getattr(y, "dtype", None) == jnp.float32
            and any(getattr(i, "dtype", None) == jnp.bfloat16 for i in ins)
            and ctx.node.outputs
            and ctx.node.outputs[0] not in env.get("__graph_outputs__", ())):
        return y.astype(jnp.bfloat16)
    return y


_simple("Add", lambda c, a, b: _store_mixed(c, a + b, a, b), static_ok=True)
_simple("Sub", lambda c, a, b: _store_mixed(c, a - b, a, b), static_ok=True)
_simple("Mul", lambda c, a, b: _store_mixed(c, a * b, a, b), static_ok=True)
_simple("Pow", lambda c, a, b: c.xp.power(a, b))
_simple("Equal", lambda c, a, b: c.xp.equal(a, b), static_ok=True)
_simple("Greater", lambda c, a, b: c.xp.greater(a, b), static_ok=True)
_simple("GreaterOrEqual", lambda c, a, b: c.xp.greater_equal(a, b), static_ok=True)
_simple("Less", lambda c, a, b: c.xp.less(a, b), static_ok=True)
_simple("LessOrEqual", lambda c, a, b: c.xp.less_equal(a, b), static_ok=True)
_simple("And", lambda c, a, b: c.xp.logical_and(a, b), static_ok=True)
_simple("Or", lambda c, a, b: c.xp.logical_or(a, b), static_ok=True)
_simple("Xor", lambda c, a, b: c.xp.logical_xor(a, b), static_ok=True)
_simple("Where", lambda c, cond, a, b: c.xp.where(cond, a, b), static_ok=True)


@op("Div", static_ok=True)
def op_div(ctx: Ctx, a, b):
    # ONNX integer Div truncates toward zero (not floor)
    a_int = np.issubdtype(np.asarray(a).dtype if _is_static(a) else a.dtype,
                          np.integer)
    b_int = np.issubdtype(np.asarray(b).dtype if _is_static(b) else b.dtype,
                          np.integer)
    if a_int and b_int:
        if ctx.xp is np:
            return (np.abs(a) // np.abs(b)) * np.sign(a) * np.sign(b)
        return lax.div(jnp.asarray(a), jnp.asarray(b))
    return _store_mixed(ctx, a / b, a, b)


@op("Mod", static_ok=True)
def op_mod(ctx: Ctx, a, b):
    if ctx.attr("fmod", 0):
        return ctx.xp.fmod(a, b)
    return ctx.xp.mod(a, b)


@op("Min", static_ok=True)
def op_min(ctx: Ctx, *ins):
    out = ins[0]
    for v in ins[1:]:
        out = ctx.xp.minimum(out, v)
    return out


@op("Max", static_ok=True)
def op_max(ctx: Ctx, *ins):
    out = ins[0]
    for v in ins[1:]:
        out = ctx.xp.maximum(out, v)
    return out


@op("Sum", static_ok=True)
def op_sum(ctx: Ctx, *ins):
    out = ins[0]
    for v in ins[1:]:
        out = out + v
    return out


@op("Mean")
def op_mean(ctx: Ctx, *ins):
    out = ins[0]
    for v in ins[1:]:
        out = out + v
    return out / len(ins)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def _acc_upcast(ctx: Ctx, x):
    """f32-accumulation policy for reductions/normalizations: bf16 inputs
    upcast to f32 before the reduction (an 8-bit mantissa loses digits over
    long axes). Returns ``(x_f32, restore_dtype)``: the f32 ACCUMULATION is
    kept in both modes, but the stored RESULT goes back to bf16 — for a
    genuinely-bf16 graph (flag off) because that is its declared dtype, and
    under bf16-storage mode because keeping norm outputs f32 re-inflates
    the very activations the mode exists to halve (measured round 4: the
    six per-step LayerNorm fusions in the 66M estimator carried
    f32[64,256,512] in+out — ~1.5 ms/step of the executor-vs-native gap;
    the native engine computes norms in f32 and stores bf16 identically).
    Declared graph-output dtypes are restored at the _run_traced
    boundary."""
    if getattr(x, "dtype", None) != jnp.bfloat16:
        return x, None
    return jnp.asarray(x).astype(jnp.float32), jnp.bfloat16


def _reduce(fn_name: str):
    def body(ctx: Ctx, x, axes, keep):
        if axes is None:
            if ctx.attr("noop_with_empty_axes", 0):
                return x
            axes_t = None
        else:
            axes_t = tuple(int(a) for a in (axes if isinstance(axes, list)
                                            else [axes]))
        red = {
            "ReduceMean": ctx.xp.mean, "ReduceSum": ctx.xp.sum,
            "ReduceMax": ctx.xp.max, "ReduceMin": ctx.xp.min,
            "ReduceProd": ctx.xp.prod,
        }
        if fn_name == "ReduceL1":
            return ctx.xp.sum(ctx.xp.abs(x), axis=axes_t, keepdims=keep)
        if fn_name == "ReduceL2":
            return ctx.xp.sqrt(ctx.xp.sum(ctx.xp.square(x), axis=axes_t,
                                          keepdims=keep))
        if fn_name == "ReduceSumSquare":
            return ctx.xp.sum(ctx.xp.square(x), axis=axes_t, keepdims=keep)
        if fn_name == "ReduceLogSum":
            return ctx.xp.log(ctx.xp.sum(x, axis=axes_t, keepdims=keep))
        if fn_name == "ReduceLogSumExp":
            if ctx.xp is np:
                m = np.max(x, axis=axes_t, keepdims=True)
                s = np.log(np.sum(np.exp(x - m), axis=axes_t, keepdims=True)) + m
                return s if keep else np.squeeze(s, axis=axes_t)
            s = jax.nn.logsumexp(jnp.asarray(x), axis=axes_t, keepdims=True)
            return s if keep else jnp.squeeze(s, axis=axes_t)
        return red[fn_name](x, axis=axes_t, keepdims=keep)

    @op(fn_name, static_ok=True)
    def h(ctx: Ctx, x, axes_in=None):
        axes = ctx.attr("axes")
        if axes_in is not None:
            axes = [int(a) for a in ctx.static(axes_in, "axes").ravel()]
        keep = bool(ctx.attr("keepdims", 1))
        x, odt = _acc_upcast(ctx, x)
        res = body(ctx, x, axes, keep)
        return res.astype(odt) if odt is not None else res
    h.__name__ = f"op_{fn_name.lower()}"
    return h


for _r in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin",
           "ReduceProd", "ReduceL1", "ReduceL2", "ReduceSumSquare",
           "ReduceLogSum", "ReduceLogSumExp"):
    _reduce(_r)


@op("ArgMax")
def op_argmax(ctx: Ctx, x):
    axis = ctx.attr("axis", 0)
    keep = bool(ctx.attr("keepdims", 1))
    out = jnp.argmax(x, axis=axis)
    return jnp.expand_dims(out, axis) if keep else out


@op("ArgMin")
def op_argmin(ctx: Ctx, x):
    axis = ctx.attr("axis", 0)
    keep = bool(ctx.attr("keepdims", 1))
    out = jnp.argmin(x, axis=axis)
    return jnp.expand_dims(out, axis) if keep else out


@op("CumSum")
def op_cumsum(ctx: Ctx, x, axis):
    ax = int(ctx.static(axis, "axis"))
    x = jnp.asarray(x)
    if ctx.attr("reverse", 0):
        x = jnp.flip(x, axis=ax)
    if ctx.attr("exclusive", 0):
        # shift inclusive cumsum right by one, zero first (bit-exact: no
        # subtraction rounding)
        inc = jnp.cumsum(x, axis=ax)
        pad = [(0, 0)] * x.ndim
        pad[ax if ax >= 0 else ax + x.ndim] = (1, 0)
        out = jnp.pad(inc, pad)[
            tuple(slice(0, -1) if i == (ax % x.ndim) else slice(None)
                  for i in range(x.ndim))
        ]
    else:
        out = jnp.cumsum(x, axis=ax)
    if ctx.attr("reverse", 0):
        out = jnp.flip(out, axis=ax)
    return out


# ---------------------------------------------------------------------------
# shape / layout
# ---------------------------------------------------------------------------

@op("Shape", static_ok=True)
def op_shape(ctx: Ctx, x):
    shape = np.asarray(x.shape, np.int64)
    start = ctx.attr("start", 0)
    end = ctx.attr("end")
    return shape[start:end] if end is not None else shape[start:]


@op("Size", static_ok=True)
def op_size(ctx: Ctx, x):
    return np.asarray(math.prod(x.shape), np.int64)


@op("Reshape", static_ok=True)
def op_reshape(ctx: Ctx, x, shape):
    tgt = [int(v) for v in ctx.static(shape, "shape").ravel()]
    allowzero = ctx.attr("allowzero", 0)
    out = []
    for i, d in enumerate(tgt):
        if d == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(d)
    return ctx.xp.reshape(x, tuple(out))


@op("Flatten", static_ok=True)
def op_flatten(ctx: Ctx, x):
    axis = ctx.attr("axis", 1)
    if axis < 0:
        axis += x.ndim
    lead = math.prod(x.shape[:axis]) if axis else 1
    return ctx.xp.reshape(x, (lead, -1))


@op("Transpose", static_ok=True)
def op_transpose(ctx: Ctx, x):
    perm = ctx.attr("perm")
    return ctx.xp.transpose(x, perm if perm is None else tuple(perm))


@op("Squeeze", static_ok=True)
def op_squeeze(ctx: Ctx, x, axes_in=None):
    axes = ctx.attr("axes")
    if axes_in is not None:
        axes = [int(a) for a in ctx.static(axes_in, "axes").ravel()]
    if axes is None:
        return ctx.xp.squeeze(x)
    if isinstance(axes, int):
        axes = [axes]
    return ctx.xp.squeeze(x, axis=tuple(int(a) for a in axes))


@op("Unsqueeze", static_ok=True)
def op_unsqueeze(ctx: Ctx, x, axes_in=None):
    axes = ctx.attr("axes")
    if axes_in is not None:
        axes = [int(a) for a in ctx.static(axes_in, "axes").ravel()]
    if isinstance(axes, int):
        axes = [axes]
    out_nd = x.ndim + len(axes)
    axes = sorted(a + out_nd if a < 0 else a for a in axes)
    out = x
    for a in axes:
        out = ctx.xp.expand_dims(out, a)
    return out


@op("Concat", static_ok=True)
def op_concat(ctx: Ctx, *ins):
    return ctx.xp.concatenate(ins, axis=ctx.attr("axis", 0))


@op("Split", static_ok=True)
def op_split(ctx: Ctx, x, split_in=None):
    axis = ctx.attr("axis", 0)
    split = ctx.attr("split")
    if split_in is not None:
        split = [int(s) for s in ctx.static(split_in, "split").ravel()]
    n_out = len(ctx.node.outputs)
    dim = x.shape[axis]
    if split is None:
        base = -(-dim // n_out)
        split = [base] * (n_out - 1) + [dim - base * (n_out - 1)]
    idx = np.cumsum(split)[:-1]
    return tuple(ctx.xp.split(x, idx, axis=axis))


@op("Slice", static_ok=True)
def op_slice(ctx: Ctx, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset-1 attribute form
        starts = np.asarray(ctx.attr("starts"), np.int64)
        ends = np.asarray(ctx.attr("ends"), np.int64)
        axes = (np.asarray(ctx.attr("axes"), np.int64)
                if ctx.attr("axes") is not None else None)
        steps = None
    else:
        starts = ctx.static(starts, "starts")
        ends = ctx.static(ends, "ends")
        axes = None if axes is None else ctx.static(axes, "axes")
        steps = None if steps is None else ctx.static(steps, "steps")
    starts = np.atleast_1d(starts).astype(np.int64)
    ends = np.atleast_1d(ends).astype(np.int64)
    n = len(starts)
    axes = (np.arange(n, dtype=np.int64) if axes is None
            else np.atleast_1d(axes).astype(np.int64))
    steps = (np.ones(n, np.int64) if steps is None
             else np.atleast_1d(steps).astype(np.int64))
    sl = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) + (x.ndim if ax < 0 else 0)
        dim = x.shape[ax]
        st, en, sp = int(st), int(en), int(sp)
        # ONNX clamps out-of-range starts/ends (INT_MAX conventions)
        if sp > 0:
            st = min(max(st + dim if st < 0 else st, 0), dim)
            en = min(max(en + dim if en < 0 else en, 0), dim)
            sl[ax] = slice(st, en, sp)
        else:
            st = min(max(st + dim if st < 0 else st, 0), dim - 1)
            en = min(en + dim if en < 0 else en, dim - 1)
            # per spec ends clamp to [-1, dim-1]; anything below 0 after
            # wrapping means "run through index 0" (python stop=None)
            sl[ax] = slice(st, en if en >= 0 else None, sp)
    return x[tuple(sl)]


@op("Gather", static_ok=True)
def op_gather(ctx: Ctx, x, indices):
    axis = ctx.attr("axis", 0)
    if _is_static(indices):
        indices = np.asarray(indices)
    if ctx.xp is np:
        return np.take(x, indices, axis=axis)
    dim = x.shape[axis]
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + dim, idx)
    return jnp.take(jnp.asarray(x), idx, axis=axis)


@op("GatherElements")
def op_gatherelements(ctx: Ctx, x, indices):
    axis = ctx.attr("axis", 0)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + x.shape[axis], idx)
    return jnp.take_along_axis(jnp.asarray(x), idx, axis=axis)


@op("Expand", static_ok=True)
def op_expand(ctx: Ctx, x, shape):
    tgt = tuple(int(v) for v in ctx.static(shape, "shape").ravel())
    out_shape = np.broadcast_shapes(x.shape, tgt)
    return ctx.xp.broadcast_to(x, out_shape)


@op("Tile", static_ok=True)
def op_tile(ctx: Ctx, x, repeats):
    reps = tuple(int(v) for v in ctx.static(repeats, "repeats").ravel())
    return ctx.xp.tile(x, reps)


@op("Pad", static_ok=True)
def op_pad(ctx: Ctx, x, pads=None, cval=None, axes=None):
    mode = ctx.attr("mode", "constant")
    if pads is None:
        pads = np.asarray(ctx.attr("pads"), np.int64)
    else:
        pads = ctx.static(pads, "pads").astype(np.int64)
    if axes is not None:
        ax = [int(a) % x.ndim for a in ctx.static(axes, "axes").ravel()]
    else:
        ax = list(range(x.ndim))
    n = len(ax)
    width = [(0, 0)] * x.ndim
    for i, a in enumerate(ax):
        width[a] = (int(pads[i]), int(pads[i + n]))
    if any(lo < 0 or hi < 0 for lo, hi in width):
        # ONNX allows negative pads (cropping); np/jnp.pad do not — crop
        # first, keep only the non-negative remainder to pad. A crop that
        # exceeds the dimension extent is a geometry bug (ORT errors);
        # fail loudly instead of propagating a zero-size tensor.
        for d, (lo, hi) in enumerate(width):
            if max(0, -lo) + max(0, -hi) > x.shape[d]:
                raise ValueError(
                    f"Pad: negative pads ({lo}, {hi}) crop more than "
                    f"dim {d} extent {x.shape[d]}")
        sl = tuple(
            slice(max(0, -lo), x.shape[d] - max(0, -hi))
            for d, (lo, hi) in enumerate(width)
        )
        x = x[sl]
        width = [(max(0, lo), max(0, hi)) for lo, hi in width]
    if mode == "constant":
        c = 0 if cval is None else np.asarray(cval).item() if _is_static(cval) else cval
        return ctx.xp.pad(x, width, mode="constant", constant_values=c)
    return ctx.xp.pad(x, width, mode={"reflect": "reflect", "edge": "edge",
                                      "wrap": "wrap"}[mode])


@op("Trilu")
def op_trilu(ctx: Ctx, x, k=None):
    kk = 0 if k is None else int(ctx.static(k, "k"))
    return jnp.triu(x, kk) if ctx.attr("upper", 1) else jnp.tril(x, kk)


@op("DepthToSpace")
def op_depthtospace(ctx: Ctx, x):
    b = ctx.attr("blocksize")
    mode = ctx.attr("mode", "DCR")
    n, c, h, w = x.shape
    if mode == "DCR":
        y = jnp.reshape(x, (n, b, b, c // (b * b), h, w))
        y = jnp.transpose(y, (0, 3, 4, 1, 5, 2))
    else:  # CRD
        y = jnp.reshape(x, (n, c // (b * b), b, b, h, w))
        y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return jnp.reshape(y, (n, c // (b * b), h * b, w * b))


@op("SpaceToDepth")
def op_spacetodepth(ctx: Ctx, x):
    b = ctx.attr("blocksize")
    n, c, h, w = x.shape
    y = jnp.reshape(x, (n, c, h // b, b, w // b, b))
    y = jnp.transpose(y, (0, 3, 5, 1, 2, 4))
    return jnp.reshape(y, (n, c * b * b, h // b, w // b))


@op("Upsample", static_ok=True)
def op_upsample(ctx: Ctx, x, scales=None):
    # deprecated opset-7/9 alias of Resize (mode nearest|linear, asymmetric
    # coordinates per its spec); scales via attr (opset 7) or input (opset 9)
    node = dataclasses.replace(
        ctx.node, op_type="Resize",
        attrs={"mode": ctx.attr("mode", "nearest"),
               "coordinate_transformation_mode": "asymmetric",
               "nearest_mode": "floor"},
    )
    sc = (np.asarray(ctx.attr("scales"), np.float32) if scales is None
          else ctx.static(scales, "scales"))
    return _REGISTRY["Resize"](
        Ctx(ctx.xp, node.attrs, node, ctx.env), x, None, sc, None)


# ---------------------------------------------------------------------------
# constants / generators / casts
# ---------------------------------------------------------------------------

@op("Constant", static_ok=True)
def op_constant(ctx: Ctx):
    a = ctx.attrs
    if "value" in a:
        return np.asarray(a["value"].data)
    if "value_float" in a:
        return np.asarray(a["value_float"], np.float32)
    if "value_int" in a:
        return np.asarray(a["value_int"], np.int64)
    if "value_floats" in a:
        return np.asarray(a["value_floats"], np.float32)
    if "value_ints" in a:
        return np.asarray(a["value_ints"], np.int64)
    raise UnsupportedOp("Constant: unsupported value attribute")


@op("ConstantOfShape", static_ok=True)
def op_constantofshape(ctx: Ctx, shape):
    tgt = tuple(int(v) for v in ctx.static(shape, "shape").ravel())
    val = ctx.attr("value")
    if val is None:
        return np.zeros(tgt, np.float32)
    arr = np.asarray(val.data)
    return np.full(tgt, arr.ravel()[0], arr.dtype)


@op("Range", static_ok=True)
def op_range(ctx: Ctx, start, limit, delta):
    s = ctx.static(start, "start").item()
    l = ctx.static(limit, "limit").item()
    d = ctx.static(delta, "delta").item()
    return np.arange(s, l, d)


@op("Cast", static_ok=True)
def op_cast(ctx: Ctx, x):
    to = DTYPE_MAP[ctx.attr("to")]
    return x.astype(to) if ctx.xp is np else jnp.asarray(x).astype(to)


@op("CastLike", static_ok=True)
def op_castlike(ctx: Ctx, x, like):
    dt = np.asarray(like).dtype if _is_static(like) else like.dtype
    return x.astype(dt) if ctx.xp is np else jnp.asarray(x).astype(dt)


@op("OneHot")
def op_onehot(ctx: Ctx, indices, depth, values):
    d = int(ctx.static(depth, "depth"))
    vals = ctx.static(values, "values")  # [off, on]
    axis = ctx.attr("axis", -1)
    oh = jax.nn.one_hot(jnp.asarray(indices), d, axis=axis)
    return oh * (vals[1] - vals[0]) + vals[0]


@op("EyeLike", static_ok=True)
def op_eyelike(ctx: Ctx, x):
    dt = DTYPE_MAP.get(ctx.attr("dtype"), np.asarray(x).dtype
                       if _is_static(x) else x.dtype)
    return np.eye(x.shape[0], x.shape[1], k=ctx.attr("k", 0), dtype=dt)


# ---------------------------------------------------------------------------
# linear algebra / NN
# ---------------------------------------------------------------------------

def _store_act(ctx: Ctx, y):
    """Activation-STORAGE policy for the hot ops (MatMul/Gemm/Conv/
    ConvTranspose). Under bf16-storage mode (``OnnxExecutor(...,
    bf16_storage=True)``) their f32 outputs are stored bfloat16: in an
    op-by-op graph these outputs (attention logits, conv activations) are
    the largest HBM tensors, and halving their bytes is the same lever the
    native engine's bf16-logits fast path uses (docs/PERFORMANCE.md, +18%
    measured). Softmax/normalizations/reductions still compute in f32
    (upcast on entry below); graph OUTPUTS keep their declared f32 dtype
    (skipped here, enforced again at the _run_traced boundary)."""
    env = ctx.env or {}
    if (env.get("__bf16_storage__")
            and getattr(y, "dtype", None) == jnp.float32
            and ctx.node.outputs
            and ctx.node.outputs[0] not in env.get("__graph_outputs__", ())):
        return y.astype(jnp.bfloat16)
    return y


@op("MatMul")
def op_matmul(ctx: Ctx, a, b):
    return _store_act(ctx, jnp.matmul(jnp.asarray(a), jnp.asarray(b)))


@op("Gemm")
def op_gemm(ctx: Ctx, a, b, c=None):
    alpha = ctx.attr("alpha", 1.0)
    beta = ctx.attr("beta", 1.0)
    a = jnp.asarray(a).T if ctx.attr("transA", 0) else jnp.asarray(a)
    b = jnp.asarray(b).T if ctx.attr("transB", 0) else jnp.asarray(b)
    y = alpha * (a @ b)
    if c is not None:
        y = y + beta * jnp.asarray(c)
    return _store_act(ctx, y)


@op("Einsum")
def op_einsum(ctx: Ctx, *ins):
    return jnp.einsum(ctx.attr("equation"), *[jnp.asarray(i) for i in ins])


def _softmax_like(ctx: Ctx, x, fn):
    x = jnp.asarray(x)
    out_dt = x.dtype
    if x.dtype == jnp.bfloat16:  # bf16-storage mode: the exp-sum reduction
        x = x.astype(jnp.float32)  # must accumulate in f32 (stored back bf16)
    opset = (ctx.env or {}).get("__opset__")
    if opset is not None and opset < 13:
        # opset < 13: softmax over the FLATTENED trailing dims from `axis`
        # (default 1), not a single axis
        axis = ctx.attr("axis", 1) % x.ndim
        lead = x.shape[:axis]
        flat = jnp.reshape(x, (int(np.prod(lead, dtype=np.int64)), -1))
        return jnp.reshape(fn(flat, axis=-1), x.shape).astype(out_dt)
    return fn(x, axis=ctx.attr("axis", -1)).astype(out_dt)


@op("Softmax")
def op_softmax(ctx: Ctx, x):
    return _softmax_like(ctx, x, jax.nn.softmax)


@op("LogSoftmax")
def op_logsoftmax(ctx: Ctx, x):
    return _softmax_like(ctx, x, jax.nn.log_softmax)


@op("LayerNormalization")
def op_layernorm(ctx: Ctx, x, scale, bias=None):
    axis = ctx.attr("axis", -1)
    eps = ctx.attr("epsilon", 1e-5)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    x, odt = _acc_upcast(ctx, jnp.asarray(x))  # stats in f32
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + eps)
    y = (x - mean) * inv * scale
    if bias is not None:
        y = y + bias
    if odt is not None:
        y = y.astype(odt)
    outs = ctx.node.outputs
    if len(outs) == 1:
        return y
    return (y, mean, inv)[: len(outs)]


@op("InstanceNormalization")
def op_instancenorm(ctx: Ctx, x, scale, bias):
    eps = ctx.attr("epsilon", 1e-5)
    x, odt = _acc_upcast(ctx, jnp.asarray(x))  # stats in f32
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    y = ((x - mean) / jnp.sqrt(var + eps)) * scale.reshape(shape) \
        + bias.reshape(shape)
    return y.astype(odt) if odt is not None else y


@op("GroupNormalization")
def op_groupnorm(ctx: Ctx, x, scale, bias):
    eps = ctx.attr("epsilon", 1e-5)
    g = ctx.attr("num_groups")
    x, odt = _acc_upcast(ctx, jnp.asarray(x))  # stats in f32
    n, c = x.shape[:2]
    sp = x.shape[2:]
    y = jnp.reshape(x, (n, g, c // g) + sp)
    axes = tuple(range(2, y.ndim))
    mean = jnp.mean(y, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=axes, keepdims=True)
    y = (y - mean) / jnp.sqrt(var + eps)
    y = jnp.reshape(y, x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    # opset-18 semantics: scale/bias are per-channel [C]
    y = y * jnp.reshape(scale, shape) + jnp.reshape(bias, shape)
    return y.astype(odt) if odt is not None else y


@op("LpNormalization")
def op_lpnorm(ctx: Ctx, x):
    axis = ctx.attr("axis", -1)
    p = ctx.attr("p", 2)
    x = jnp.asarray(x)
    if p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    elif p == 2:
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    else:
        raise UnsupportedOp(f"LpNormalization p={p}")
    return x / norm


@op("MeanVarianceNormalization")
def op_mvn(ctx: Ctx, x):
    axes = tuple(ctx.attr("axes", [0, 2, 3]))
    x, odt = _acc_upcast(ctx, jnp.asarray(x))  # stats in f32
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=axes, keepdims=True) - jnp.square(mean)
    y = (x - mean) / jnp.sqrt(var + 1e-9)
    return y.astype(odt) if odt is not None else y


@op("BatchNormalization")
def op_batchnorm(ctx: Ctx, x, scale, bias, mean, var):
    eps = ctx.attr("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((jnp.asarray(x) - mean.reshape(shape))
            / jnp.sqrt(var.reshape(shape) + eps)) * scale.reshape(shape) \
        + bias.reshape(shape)


@op("Dropout")
def op_dropout(ctx: Ctx, x, ratio=None, training=None):
    outs = ctx.node.outputs
    if len(outs) == 1:
        return x
    return x, jnp.ones(x.shape, bool)


def _window_pads(ctx: Ctx, in_shape, k, strides, dils) -> list[tuple[int, int]]:
    """Per-spatial-dim (lo, hi) padding honoring auto_pad (shared by Conv
    and the pooling ops — SAME_* pooling is standard in TF-exported ONNX)."""
    nd = len(in_shape) - 2
    auto = ctx.attr("auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        for i in range(nd):
            o = -(-in_shape[2 + i] // strides[i])
            total = max(0, (o - 1) * strides[i]
                        + (k[i] - 1) * dils[i] + 1 - in_shape[2 + i])
            lo = total // 2
            hi = total - lo
            out.append((hi, lo) if auto == "SAME_LOWER" else (lo, hi))
        return out
    if auto == "VALID":
        return [(0, 0)] * nd
    pads = ctx.attr("pads", [0] * (2 * nd))
    if isinstance(pads, int):
        pads = [pads] * (2 * nd)
    return [(pads[i], pads[i + nd]) for i in range(nd)]


def _conv_pads(ctx: Ctx, x, w, strides, dils) -> list[tuple[int, int]]:
    return _window_pads(ctx, x.shape, w.shape[2:], strides, dils)


def _conv_operands(x, w):
    """lax.conv requires matching operand dtypes. Under bf16 activation
    storage an f32-weight conv can receive a bf16 input: compute with bf16
    operands and f32 accumulation (the MXU-native mixed mode)."""
    x, w = jnp.asarray(x), jnp.asarray(w)
    if x.dtype == w.dtype:
        return x, w, None
    if jnp.bfloat16 in (x.dtype, w.dtype):
        return (x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                jnp.float32)
    dt = jnp.promote_types(x.dtype, w.dtype)
    return x.astype(dt), w.astype(dt), None


def _apply_time_mask(ctx: Ctx, y):
    """Bucket-padding halo guard for mask-free conv-stack graphs (the
    reference vocoder, SURVEY.md §2.2 — it runs at batch-max length with no
    mask input). The engine serves bucket-PADDED shapes (frames beyond the
    longest utterance in the batch), and a conv's bias makes those padded
    frames nonzero, which the next (dilated/transposed) conv bleeds back
    into the valid tail — the exact bug fixed for the native vocoder with
    batch-max frame masking (models/vocoder.py). When the caller passes a
    ``time_mask`` ([T_latent] f32, 1 = real frame) to ``_run_traced``,
    every Conv/ConvTranspose output whose trailing axis is an integer
    upsample multiple of T_latent is re-zeroed on the padded frames; since
    only convs mix across time (pointwise ops cannot leak pad values into
    valid frames), this makes bucket-padded execution bit-identical to
    exact-length execution by the same receptive-field argument as the
    native path.

    REQUIREMENT (ADVICE r4): the bit-identical guarantee additionally
    relies on every op BETWEEN convs being zero-preserving (maps 0 -> 0 on
    the padded frames). Silu/tanh/relu/mul/residual-add all are; a
    Softplus, Sigmoid output, or Add-with-nonzero-constant would make the
    padded frames nonzero again BEFORE the next conv reads them into the
    valid tail, reintroducing the halo undetected. The invariant is NOT
    assumed per-graph: ``tools/parity_check.py`` validates padded-vs-exact
    vocoder execution bit-for-bit on the actual bundle being served
    (compare_padded_vocoder), so a future graph with a non-zero-preserving
    inter-conv op fails the gate instead of shipping a halo. Per-ROW padding below batch-max stays UNMASKED — that
    halo is reference semantics. Non-integer-multiple timelines (e.g. a
    downsampling conv) are left unmasked: not a reference-vocoder shape."""
    m = (ctx.env or {}).get("__time_mask__")
    if m is None or getattr(y, "ndim", 0) != 3:
        return y
    t = int(m.shape[0])
    tp = int(y.shape[-1])
    if tp % t == 0:
        mm = jnp.repeat(m.astype(y.dtype), tp // t)
        return y * mm[None, None, :]
    return y


@op("Conv")
def op_conv(ctx: Ctx, x, w, b=None):
    nd = x.ndim - 2
    strides = tuple(ctx.attr("strides", [1] * nd))
    dils = tuple(ctx.attr("dilations", [1] * nd))
    group = ctx.attr("group", 1)
    padding = _conv_pads(ctx, x, w, strides, dils)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, _spec(nd))
    x2, w2, acc = _conv_operands(x, w)
    out = lax.conv_general_dilated(
        x2, w2, strides, padding,
        rhs_dilation=dils, dimension_numbers=dn, feature_group_count=group,
        preferred_element_type=acc,
    )
    if b is not None:
        out = out + jnp.reshape(b, (1, -1) + (1,) * nd)
    return _store_act(ctx, _apply_time_mask(ctx, out))


@op("ConvTranspose")
def op_convtranspose(ctx: Ctx, x, w, b=None):
    # w: [C, M/group, *k]  (ONNX layout). Implemented as the gradient-of-conv
    # formulation: lhs-dilate by stride, flip kernel, swap I/O.
    nd = x.ndim - 2
    strides = tuple(ctx.attr("strides", [1] * nd))
    dils = tuple(ctx.attr("dilations", [1] * nd))
    group = ctx.attr("group", 1)
    k = w.shape[2:]
    c_in = x.shape[1]
    m_per_g = w.shape[1]
    m = m_per_g * group
    out_padding = tuple(ctx.attr("output_padding", [0] * nd))
    output_shape = ctx.attr("output_shape")
    auto = ctx.attr("auto_pad", "NOTSET")
    if output_shape is not None:
        pads = []
        for i in range(nd):
            total = (strides[i] * (x.shape[2 + i] - 1) + out_padding[i]
                     + (k[i] - 1) * dils[i] + 1 - output_shape[i])
            lo = total - total // 2 if auto == "SAME_LOWER" else total // 2
            pads.append((lo, total - lo))
    elif auto in ("SAME_UPPER", "SAME_LOWER"):
        pads = []
        for i in range(nd):
            total = max(0, (k[i] - 1) * dils[i] + 1 - strides[i])
            lo = total - total // 2 if auto == "SAME_LOWER" else total // 2
            pads.append((lo, total - lo))
    else:
        p = ctx.attr("pads", [0] * (2 * nd))
        pads = [(p[i], p[i + nd]) for i in range(nd)]

    w = jnp.asarray(w)
    w2 = jnp.reshape(w, (group, c_in // group, m_per_g) + k)
    perm = (0, 2, 1) + tuple(range(3, 3 + nd))
    w2 = jnp.transpose(w2, perm)                # [g, M/g, C/g, *k]
    w2 = jnp.reshape(w2, (m, c_in // group) + k)
    w2 = jnp.flip(w2, axis=tuple(range(2, 2 + nd)))
    conv_pads = [
        (dils[i] * (k[i] - 1) - pads[i][0],
         dils[i] * (k[i] - 1) - pads[i][1] + out_padding[i])
        for i in range(nd)
    ]
    dn = lax.conv_dimension_numbers(x.shape, w2.shape, _spec(nd))
    x2, w2, acc = _conv_operands(x, w2)
    out = lax.conv_general_dilated(
        x2, w2, (1,) * nd, conv_pads,
        lhs_dilation=strides, rhs_dilation=dils, dimension_numbers=dn,
        feature_group_count=group,
        preferred_element_type=acc,
    )
    if b is not None:
        out = out + jnp.reshape(b, (1, -1) + (1,) * nd)
    return _store_act(ctx, _apply_time_mask(ctx, out))


def _pool(ctx: Ctx, x, reducer, init, is_avg: bool):
    nd = x.ndim - 2
    k = tuple(ctx.attr("kernel_shape"))
    strides = tuple(ctx.attr("strides", [1] * nd))
    dils = tuple(ctx.attr("dilations", [1] * nd))
    pads = _window_pads(ctx, jnp.asarray(x).shape, k, strides, dils)
    x = jnp.asarray(x)
    extra = [0] * nd
    if ctx.attr("ceil_mode", 0):
        # extend the hi pad so output dims use ceil instead of floor; the
        # counts-divisor below (and -inf for max) keeps the extension inert
        for i in range(nd):
            span = x.shape[2 + i] + pads[i][0] + pads[i][1] \
                - dils[i] * (k[i] - 1) - 1
            o_ceil = -(-span // strides[i]) + 1
            # torch/ORT convention: a ceil window may only overhang if it
            # STARTS inside the (left-padded) input
            if (o_ceil - 1) * strides[i] >= x.shape[2 + i] + pads[i][0]:
                o_ceil -= 1
            need = (o_ceil - 1) * strides[i] + dils[i] * (k[i] - 1) + 1
            extra[i] = max(0, need - (x.shape[2 + i] + pads[i][0]
                                      + pads[i][1]))
    if is_avg and ctx.attr("count_include_pad", 0):
        # fold the explicit pads into the data as zeros so they count in the
        # denominator; the ceil-mode extension stays excluded (torch/ONNX
        # semantics: ceil windows that reach past the padded input are
        # truncated, not counted)
        width = [(0, 0), (0, 0)] + pads
        x = jnp.pad(x, width)
        pads = [(0, 0)] * nd
    pads = [(lo, hi + e) for (lo, hi), e in zip(pads, extra)]
    window = (1, 1) + k
    ws = (1, 1) + strides
    wd = (1, 1) + dils
    pad_full = [(0, 0), (0, 0)] + pads
    out = lax.reduce_window(x, init, reducer, window, ws, pad_full,
                            window_dilation=wd)
    if is_avg:
        ones = jnp.ones(x.shape, x.dtype)
        counts = lax.reduce_window(ones, 0.0, lax.add, window, ws,
                                   pad_full, window_dilation=wd)
        out = out / counts
    return out


@op("MaxPool")
def op_maxpool(ctx: Ctx, x):
    return _pool(ctx, x, lax.max, -jnp.inf, False)


@op("AveragePool")
def op_averagepool(ctx: Ctx, x):
    return _pool(ctx, x, lax.add, 0.0, True)


@op("GlobalAveragePool")
def op_globalavgpool(ctx: Ctx, x):
    return jnp.mean(jnp.asarray(x), axis=tuple(range(2, x.ndim)),
                    keepdims=True)


@op("GlobalMaxPool")
def op_globalmaxpool(ctx: Ctx, x):
    return jnp.max(jnp.asarray(x), axis=tuple(range(2, x.ndim)),
                   keepdims=True)


def _resize_src_coords(out_dim: int, in_dim: int, scale: float,
                       coord: str) -> np.ndarray:
    """ONNX coordinate_transformation_mode -> fractional input coords.
    Computed in numpy f32 at trace time (shapes/scales are static) so the
    boundary rounding matches ORT's float math — under jit XLA may rewrite
    x/scale as x*(1/scale), which flips exact-integer boundaries."""
    xo = np.arange(out_dim, dtype=np.float32)
    s = np.float32(scale)
    if coord == "half_pixel":
        return (xo + np.float32(0.5)) / s - np.float32(0.5)
    if coord == "pytorch_half_pixel":
        if out_dim > 1:
            return (xo + np.float32(0.5)) / s - np.float32(0.5)
        return np.zeros(1, np.float32)
    if coord == "align_corners":
        if out_dim == 1:
            return np.zeros(1, np.float32)
        return xo * np.float32((in_dim - 1) / (out_dim - 1))
    if coord == "asymmetric":
        return xo / s
    raise UnsupportedOp(f"Resize coordinate mode {coord!r}")


@op("Resize")
def op_resize(ctx: Ctx, x, roi=None, scales=None, sizes=None):
    mode = ctx.attr("mode", "nearest")
    coord = ctx.attr("coordinate_transformation_mode", "half_pixel")
    nearest_mode = ctx.attr("nearest_mode", "round_prefer_floor")
    if sizes is not None:
        out_shape = tuple(int(v) for v in ctx.static(sizes, "sizes").ravel())
        scale_vals = [out_shape[i] / x.shape[i] for i in range(x.ndim)]
    else:
        scale_vals = [float(s) for s in ctx.static(scales, "scales").ravel()]
        out_shape = tuple(int(math.floor(x.shape[i] * scale_vals[i]))
                          for i in range(x.ndim))
    x = jnp.asarray(x)
    int_scales = all(abs(s - round(s)) < 1e-9 and s >= 1 for s in scale_vals)
    if mode == "nearest" and int_scales and (
            (coord, nearest_mode) in (("asymmetric", "floor"),
                                      ("half_pixel", "round_prefer_floor"))):
        # integer upsample (torch nn.Upsample(nearest) export): element
        # repeat is index-exact ONLY for these two combos — e.g.
        # half_pixel+floor at scale 2 is [0,0,0,1,1,2,2,3], not a repeat
        out = x
        for ax, s in enumerate(scale_vals):
            r = round(s)
            if r > 1:
                out = jnp.repeat(out, r, axis=ax)
        return out
    if mode == "cubic":
        if coord != "half_pixel":
            raise UnsupportedOp(f"Resize cubic with coord mode {coord!r}")
        # approximation: jax Keys kernel a=-0.5 vs ORT default a=-0.75
        return jax.image.resize(x, out_shape, method="cubic")
    # exact per-axis nearest/linear for every ONNX coordinate mode
    out = x
    for ax in range(x.ndim):
        if (out_shape[ax] == out.shape[ax]
                and abs(scale_vals[ax] - 1.0) < 1e-9):
            # identity axis; a non-unit scale with floor(in*s) == in still
            # RESAMPLES per spec (e.g. s=1.2 on dim 3 -> indices [0,0,1])
            continue
        src = _resize_src_coords(out_shape[ax], out.shape[ax],
                                 scale_vals[ax], coord)
        in_dim = out.shape[ax]
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = np.floor(src)
            elif nearest_mode == "ceil":
                idx = np.ceil(src)
            elif nearest_mode == "round_prefer_floor":
                idx = np.ceil(src - 0.5)
            else:  # round_prefer_ceil
                idx = np.floor(src + 0.5)
            idx = np.clip(idx, 0, in_dim - 1).astype(np.int32)
            out = jnp.take(jnp.asarray(out), jnp.asarray(idx), axis=ax)
        elif mode == "linear":
            lo = np.clip(np.floor(src), 0, in_dim - 1).astype(np.int32)
            hi = np.clip(lo + 1, 0, in_dim - 1)
            w = np.clip(src - lo.astype(np.float32), 0.0, 1.0)
            shape = [1] * out.ndim
            shape[ax] = -1
            out = jnp.asarray(out)
            w_dev = jnp.asarray(w.reshape(shape)).astype(out.dtype)
            out = (jnp.take(out, jnp.asarray(lo), axis=ax) * (1 - w_dev)
                   + jnp.take(out, jnp.asarray(hi), axis=ax) * w_dev)
        else:
            raise UnsupportedOp(f"Resize mode {mode!r}")
    return out


# ---------------------------------------------------------------------------
# com.microsoft contrib ops (ORT graph-optimizer output). The registry keys
# on op_type, which is exactly how these appear in optimized graphs — an
# ORT-optimized export of the reference assets would otherwise hard-fail.
# ---------------------------------------------------------------------------

def _rms_norm(x, scale, eps):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
                        + eps)
    return (x32 * inv * jnp.asarray(scale).astype(jnp.float32)).astype(x.dtype)


@op("SimplifiedLayerNormalization")
def op_simplifiedlayernorm(ctx: Ctx, x, scale):
    # RMSNorm (axis must be the last — the only form ORT emits)
    eps = ctx.attr("epsilon", 1e-5)
    return _rms_norm(jnp.asarray(x), scale, eps)


@op("SkipSimplifiedLayerNormalization")
def op_skipsimplifiedlayernorm(ctx: Ctx, x, skip, scale, bias=None):
    s = jnp.asarray(x) + jnp.asarray(skip)
    if bias is not None:
        s = s + jnp.asarray(bias)
    y = _rms_norm(s, scale, ctx.attr("epsilon", 1e-5))
    # outputs: (y, mean?, inv_std_var?, input_skip_bias_sum?) — ORT graphs
    # consume y and sometimes the sum; zip-with-outputs drops the rest
    return y, None, None, s


def _ln(x, gamma, beta, eps):
    x32 = jnp.asarray(x).astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * jnp.asarray(gamma).astype(jnp.float32)
    if beta is not None:
        y = y + jnp.asarray(beta).astype(jnp.float32)
    return y


@op("SkipLayerNormalization")
def op_skiplayernorm(ctx: Ctx, x, skip, gamma, beta=None, bias=None):
    s = jnp.asarray(x) + jnp.asarray(skip)
    if bias is not None:
        s = s + jnp.asarray(bias)
    y = _ln(s, gamma, beta, ctx.attr("epsilon", 1e-5)).astype(
        jnp.asarray(x).dtype)
    return y, None, None, s


@op("BiasGelu")
def op_biasgelu(ctx: Ctx, x, bias):
    return jax.nn.gelu(jnp.asarray(x) + jnp.asarray(bias), approximate=False)


@op("FastGelu")
def op_fastgelu(ctx: Ctx, x, bias=None):
    x = jnp.asarray(x)
    if bias is not None:
        x = x + jnp.asarray(bias)
    return jax.nn.gelu(x, approximate=True)


@op("QuickGelu")
def op_quickgelu(ctx: Ctx, x):
    alpha = ctx.attr("alpha", 1.702)
    x = jnp.asarray(x)
    return x * jax.nn.sigmoid(alpha * x)


@op("FusedMatMul")
def op_fusedmatmul(ctx: Ctx, a, b):
    if ctx.attr("transBatchA", 0) or ctx.attr("transBatchB", 0):
        raise UnsupportedOp("FusedMatMul: transBatch* is not supported")
    a, b = jnp.asarray(a), jnp.asarray(b)
    if ctx.attr("transA", 0):
        a = jnp.swapaxes(a, -1, -2)
    if ctx.attr("transB", 0):
        b = jnp.swapaxes(b, -1, -2)
    return ctx.attr("alpha", 1.0) * jnp.matmul(a, b)


@op("FusedConv")
def op_fusedconv(ctx: Ctx, x, w, b=None, z=None):
    """Conv + fused activation (+ optional residual add input z)."""
    out = _REGISTRY["Conv"](ctx, x, w, b)  # same pads/strides attr names
    if z is not None:
        out = out + jnp.asarray(z)
    act = ctx.attr("activation", "")
    if not act:
        return out
    if act == "Relu":
        return jnp.maximum(out, 0)
    if act == "Tanh":
        return jnp.tanh(out)
    if act == "Sigmoid":
        return jax.nn.sigmoid(out)
    if act == "LeakyRelu":
        alpha = (ctx.attr("activation_params") or [0.01])[0]
        return jnp.where(out >= 0, out, alpha * out)
    if act == "HardSigmoid":
        p = ctx.attr("activation_params") or [0.2, 0.5]
        return jnp.clip(p[0] * out + p[1], 0, 1)
    raise UnsupportedOp(f"FusedConv: activation {act!r} not supported")


@op("Attention")
def op_attention(ctx: Ctx, x, weight, bias=None, mask_index=None,
                 past=None, attention_bias=None, past_seq_len=None):
    """com.microsoft.Attention, the common encoder subset: packed QKV
    projection + multi-head attention. No past/present KV cache."""
    if past is not None or past_seq_len is not None:
        raise UnsupportedOp("Attention: past KV cache is not supported")
    if ctx.attr("do_rotary", 0):
        raise UnsupportedOp("Attention: do_rotary is not supported")
    n_heads = ctx.attr("num_heads")
    if not n_heads:
        raise UnsupportedOp("Attention: num_heads attribute is required")
    if ctx.attr("qkv_hidden_sizes") is not None:
        q_sz, k_sz, v_sz = [int(v) for v in ctx.attr("qkv_hidden_sizes")]
    else:
        q_sz = k_sz = v_sz = jnp.asarray(weight).shape[1] // 3
    x = jnp.asarray(x)
    b, s, _ = x.shape
    qkv = jnp.matmul(x, jnp.asarray(weight))
    if bias is not None:
        qkv = qkv + jnp.asarray(bias)
    q = qkv[..., :q_sz]
    k = qkv[..., q_sz:q_sz + k_sz]
    v = qkv[..., q_sz + k_sz:]
    dh = q_sz // n_heads

    def split(t, sz):
        return jnp.transpose(
            jnp.reshape(t, (b, s, n_heads, sz // n_heads)), (0, 2, 1, 3))

    q, k, v = split(q, q_sz), split(k, k_sz), split(v, v_sz)
    scale = ctx.attr("scale") or 1.0 / math.sqrt(dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * jnp.asarray(
        scale, q.dtype)
    if attention_bias is not None:
        logits = logits + jnp.asarray(attention_bias)
    neg = jnp.asarray(-1e9, logits.dtype)
    if mask_index is not None:
        m = jnp.asarray(mask_index)
        if m.ndim == 1:      # [B] right-side key lengths
            valid = jnp.arange(s)[None, :] < m[:, None]
        elif m.ndim == 2:    # [B, S_kv] padding mask (1 = keep)
            valid = m.astype(bool)
        else:
            raise UnsupportedOp(
                f"Attention: mask_index rank {m.ndim} not supported")
        logits = jnp.where(valid[:, None, None, :], logits, neg)
    if ctx.attr("unidirectional", 0):
        causal = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(causal[None, None], logits, neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, s, v_sz))


@op("BiasAdd")
def op_biasadd(ctx: Ctx, x, bias, skip=None):
    out = jnp.asarray(x) + jnp.asarray(bias)
    if skip is not None:
        out = out + jnp.asarray(skip)
    return out


@op("BiasSplitGelu")
def op_biassplitgelu(ctx: Ctx, x, bias):
    # diffusion-UNet geglu fusion: split (x+bias) in half on the last dim,
    # first half * gelu(second half)
    s = jnp.asarray(x) + jnp.asarray(bias)
    a, b = jnp.split(s, 2, axis=-1)
    return a * jax.nn.gelu(b, approximate=False)


@op("GroupNorm")
def op_groupnorm_contrib(ctx: Ctx, x, gamma, beta):
    """com.microsoft.GroupNorm: NHWC layout (unlike the standard
    GroupNormalization's NCHW), optional fused swish."""
    groups = ctx.attr("groups")
    eps = ctx.attr("epsilon", 1e-5)
    if ctx.attr("channels_last", 1) == 0:
        raise UnsupportedOp("GroupNorm: channels_last=0 is not emitted by "
                            "the ORT optimizer and is not supported")
    x = jnp.asarray(x)
    shape = x.shape
    c = shape[-1]
    x32 = x.astype(jnp.float32).reshape(shape[0], -1, groups, c // groups)
    mu = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=(1, 3), keepdims=True)
    y = ((x32 - mu) * jax.lax.rsqrt(var + eps)).reshape(shape)
    y = y * jnp.asarray(gamma).astype(jnp.float32) \
        + jnp.asarray(beta).astype(jnp.float32)
    if ctx.attr("activation", 0):  # 1 = swish
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@op("RotaryEmbedding")
def op_rotaryembedding(ctx: Ctx, x, pos_ids, cos_cache, sin_cache):
    """com.microsoft.RotaryEmbedding: rotate the head dim of x [B,S,H] or
    [B,N,S,Dh] using cached cos/sin tables indexed by position ids."""
    if ctx.attr("is_packed_batching", 0):
        raise UnsupportedOp("RotaryEmbedding: packed batching not supported")
    x = jnp.asarray(x)
    squeeze_heads = False
    if x.ndim == 3:
        n_heads = ctx.attr("num_heads", 1) or 1
        b, s, h = x.shape
        x4 = jnp.transpose(
            jnp.reshape(x, (b, s, n_heads, h // n_heads)), (0, 2, 1, 3))
        squeeze_heads = True
    else:
        x4 = x
        b, _n, s, _dh = x4.shape
    pos = jnp.asarray(pos_ids)
    if pos.ndim == 1:
        pos = jnp.broadcast_to(pos[:, None], (b, s))
    cos = jnp.take(jnp.asarray(cos_cache), pos, axis=0)  # [B, S, Dh/2]
    sin = jnp.take(jnp.asarray(sin_cache), pos, axis=0)
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    half = x4.shape[-1] // 2
    if ctx.attr("interleaved", 0):
        x_even = x4[..., 0::2]
        x_odd = x4[..., 1::2]
        r_even = x_even * cos - x_odd * sin
        r_odd = x_even * sin + x_odd * cos
        out = jnp.stack([r_even, r_odd], axis=-1).reshape(x4.shape)
    else:
        x1, x2 = x4[..., :half], x4[..., half:]
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    if squeeze_heads:
        out = jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), x.shape)
    return out.astype(x.dtype)


@op("EmbedLayerNormalization")
def op_embedlayernorm(ctx: Ctx, ids, seg_ids, word_emb, pos_emb,
                      seg_emb=None, gamma=None, beta=None, mask=None,
                      position_ids=None):
    """com.microsoft.EmbedLayerNormalization (the ORT BERT-pattern fusion):
    LN(word_emb[ids] + pos_emb + segment_emb[seg_ids]). Outputs
    (y, mask_index, embedding_sum)."""
    ids = jnp.asarray(ids)
    b, s = ids.shape
    emb = jnp.take(jnp.asarray(word_emb), ids, axis=0)
    if position_ids is not None:
        pos = jnp.take(jnp.asarray(pos_emb), jnp.asarray(position_ids), axis=0)
    else:
        pos = jnp.asarray(pos_emb)[None, :s, :]
    emb = emb + pos
    if seg_emb is not None and seg_ids is not None:
        emb = emb + jnp.take(jnp.asarray(seg_emb), jnp.asarray(seg_ids),
                             axis=0)
    y = _ln(emb, gamma, beta, ctx.attr("epsilon", 1e-12)).astype(
        jnp.asarray(word_emb).dtype)
    mask_index = (jnp.sum(jnp.asarray(mask), axis=1).astype(jnp.int32)
                  if mask is not None else jnp.full((b,), s, jnp.int32))
    return y, mask_index, emb


@op("MultiHeadAttention")
def op_multiheadattention(ctx: Ctx, q, k=None, v=None, bias=None,
                          key_padding_mask=None, attention_bias=None,
                          past_key=None, past_value=None):
    """com.microsoft.MultiHeadAttention, separate-QKV encoder subset
    (no KV cache)."""
    if past_key is not None or past_value is not None:
        raise UnsupportedOp("MultiHeadAttention: past KV is not supported")
    n_heads = ctx.attr("num_heads")
    if not n_heads:
        raise UnsupportedOp("MultiHeadAttention: num_heads is required")
    q = jnp.asarray(q)
    if k is None or v is None or jnp.asarray(k).ndim != 3:
        raise UnsupportedOp(
            "MultiHeadAttention: only separate 3-D q/k/v inputs supported")
    k, v = jnp.asarray(k), jnp.asarray(v)
    b, sq, h = q.shape
    skv = k.shape[1]
    if bias is not None:
        bias = jnp.asarray(bias)
        hq, hk = q.shape[-1], k.shape[-1]
        q = q + bias[:hq]
        k = k + bias[hq:hq + hk]
        v = v + bias[hq + hk:]

    def split(t):
        return jnp.transpose(
            jnp.reshape(t, (b, t.shape[1], n_heads, -1)), (0, 2, 1, 3))

    qh, kh, vh = split(q), split(k), split(v)
    scale = ctx.attr("scale") or 1.0 / math.sqrt(qh.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * jnp.asarray(
        scale, qh.dtype)
    if attention_bias is not None:
        logits = logits + jnp.asarray(attention_bias)
    neg = jnp.asarray(-1e9, logits.dtype)
    if key_padding_mask is not None:
        m = jnp.asarray(key_padding_mask)
        if m.ndim == 1:      # [B] key lengths
            valid = jnp.arange(skv)[None, :] < m[:, None]
        elif m.ndim == 2:    # [B, S_kv]
            valid = m.astype(bool)
        else:
            raise UnsupportedOp(
                f"MultiHeadAttention: mask rank {m.ndim} not supported")
        logits = jnp.where(valid[:, None, None, :], logits, neg)
    if ctx.attr("unidirectional", 0):
        causal = jnp.tril(jnp.ones((sq, skv), bool), skv - sq)
        logits = jnp.where(causal[None, None], logits, neg)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return jnp.reshape(jnp.transpose(out, (0, 2, 1, 3)), (b, sq, -1))


# ---------------------------------------------------------------------------
# quantization (QDQ format: QuantizeLinear/DequantizeLinear around f32 ops)
# ---------------------------------------------------------------------------

def _qdq_broadcast(ctx: Ctx, x_ndim: int, v):
    """Per-tensor (scalar) or per-axis (1-D along ``axis``) scale/zero-point
    reshaped to broadcast against x."""
    if ctx.attr("block_size"):
        raise UnsupportedOp(
            f"{ctx.node.op_type}: blocked quantization is not supported")
    v = jnp.asarray(v)
    if v.ndim == 0 or v.size == 1:
        return jnp.reshape(v, ())
    axis = ctx.attr("axis", 1) % x_ndim
    shape = [1] * x_ndim
    shape[axis] = v.shape[0]
    return jnp.reshape(v, shape)


@op("DequantizeLinear")
def op_dequantizelinear(ctx: Ctx, x, scale, zp=None):
    x = jnp.asarray(x)
    s = _qdq_broadcast(ctx, x.ndim, scale).astype(jnp.float32)
    y = x.astype(jnp.float32)
    if zp is not None:
        y = y - _qdq_broadcast(ctx, x.ndim, zp).astype(jnp.float32)
    return y * s


@op("QuantizeLinear")
def op_quantizelinear(ctx: Ctx, x, scale, zp=None):
    x = jnp.asarray(x).astype(jnp.float32)
    s = _qdq_broadcast(ctx, x.ndim, scale).astype(jnp.float32)
    if zp is not None:
        zp_arr = jnp.asarray(zp)
        out_dtype = zp_arr.dtype
        z = _qdq_broadcast(ctx, x.ndim, zp_arr).astype(jnp.float32)
    else:
        out_dtype = jnp.uint8
        z = 0.0
    info = jnp.iinfo(out_dtype)
    # spec: round half to even, then saturate to the zero-point dtype
    q = jnp.round(x / s) + z
    return jnp.clip(q, info.min, info.max).astype(out_dtype)


@op("DynamicQuantizeLinear")
def op_dynamicquantizelinear(ctx: Ctx, x):
    """Per-spec uint8 dynamic quantization: scale from the (0-including)
    min/max range, zero point rounded and saturated."""
    x = jnp.asarray(x).astype(jnp.float32)
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / 255.0
    scale = jnp.where(scale == 0, jnp.float32(1.0), scale)
    zp = jnp.clip(jnp.round(-x_min / scale), 0, 255)
    y = jnp.clip(jnp.round(x / scale) + zp, 0, 255).astype(jnp.uint8)
    return y, scale.astype(jnp.float32), zp.astype(jnp.uint8)


@op("MatMulInteger")
def op_matmulinteger(ctx: Ctx, a, b, a_zp=None, b_zp=None):
    """int8/uint8 matmul accumulating in int32 (zero points subtracted
    first, per spec)."""
    a = jnp.asarray(a).astype(jnp.int32)
    b = jnp.asarray(b).astype(jnp.int32)
    if a_zp is not None:
        z = jnp.asarray(a_zp).astype(jnp.int32)
        # 1-D zero point is per-row of A -> broadcast along K
        a = a - (z[..., :, None] if z.ndim else z)
    if b_zp is not None:
        z = jnp.asarray(b_zp).astype(jnp.int32)
        # 1-D zero point is per-column of B -> broadcasts along the last dim
        b = b - z
    return jnp.matmul(a, b, preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# recurrent (GRU / LSTM / RNN) — lax.scan over time
# ---------------------------------------------------------------------------

def _rnn_prep(ctx: Ctx, x, seq_lens, initials: list):
    """Common RNN-family plumbing. Returns (x [T,B,I], lens [B] | None,
    init_states [(B,H)...] per direction list, directions, layout, finish).
    ``finish(ys, hs)`` packs (Y [T,dirs,B,H], Y_h... per state)."""
    acts = ctx.attr("activations")
    if acts is not None:
        # tf2onnx/keras2onnx always serialize the attribute even when it
        # holds the spec defaults — only a genuine deviation is unsupported
        defaults = {"GRU": ["sigmoid", "tanh"], "LSTM":
                    ["sigmoid", "tanh", "tanh"], "RNN": ["tanh"]}[
                        ctx.node.op_type]
        per_dir = [str(a).lower() for a in acts]
        n_dirs = 2 if ctx.attr("direction", "forward") == "bidirectional" \
            else 1
        if per_dir != defaults * n_dirs and per_dir != defaults:
            raise UnsupportedOp(
                f"{ctx.node.op_type}: custom activations {acts} are not "
                f"supported (defaults: {defaults})")
    layout = ctx.attr("layout", 0)
    if layout == 1:  # [B, T, ...] -> [T, B, ...]
        x = jnp.swapaxes(jnp.asarray(x), 0, 1)
    x = jnp.asarray(x)
    direction = ctx.attr("direction", "forward")
    dirs = 2 if direction == "bidirectional" else 1
    hidden = ctx.attr("hidden_size")
    b = x.shape[1]
    lens = None if seq_lens is None else jnp.asarray(seq_lens)
    if lens is not None and direction != "forward":
        raise UnsupportedOp(
            f"{ctx.node.op_type}: sequence_lens with reverse/bidirectional "
            f"directions is not supported")
    inits = []
    for init in initials:
        if init is None:
            inits.append(jnp.zeros((dirs, b, hidden), x.dtype))
        else:
            init = jnp.asarray(init)
            if layout == 1:  # [B, dirs, H] -> [dirs, B, H]
                init = jnp.swapaxes(init, 0, 1)
            inits.append(init)

    def finish(ys, final_states):
        # ys: list per direction of [T, B, H]; final_states: list per state
        # of list per direction of [B, H]
        y = jnp.stack(ys, axis=1)  # [T, dirs, B, H]
        outs = [jnp.stack(s, axis=0) for s in final_states]  # [dirs, B, H]
        if layout == 1:
            y = jnp.transpose(y, (2, 0, 1, 3))  # [B, T, dirs, H]
            outs = [jnp.swapaxes(o, 0, 1) for o in outs]
        return y, outs

    return x, lens, inits, direction, ctx.attr("clip"), finish


def _rnn_scan(x, lens, step, carry0, reverse: bool):
    """Run ``step(carry, x_t) -> (carry, y_t)`` over time, masking updates
    past each row's sequence length (Y zero-padded, states held — ORT
    semantics)."""
    t_idx = jnp.arange(x.shape[0])
    if reverse:
        x = jnp.flip(x, axis=0)

    def body(carry, inp):
        t, xt = inp
        new_carry, y = step(carry, xt)
        if lens is not None:
            valid = (t < lens)[:, None]
            new_carry = tuple(
                jnp.where(valid, nc, c) for nc, c in zip(new_carry, carry))
            y = jnp.where(valid, y, 0)
        return new_carry, y

    carry, ys = lax.scan(body, carry0, (t_idx, x))
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return carry, ys


def _gates(w, r, b, n_gates, hidden):
    """Split ONNX-packed weights for one direction into per-gate blocks:
    W [n*H, I] -> n x [I, H] (transposed for x @ w), likewise R; bias
    [2*n*H] -> n x [H] (Wb + Rb combined)."""
    ws = [jnp.transpose(w[i * hidden:(i + 1) * hidden]) for i in range(n_gates)]
    rs = [jnp.transpose(r[i * hidden:(i + 1) * hidden]) for i in range(n_gates)]
    if b is None:
        bs = [0.0] * n_gates
        rbs = [0.0] * n_gates
    else:
        bs = [b[i * hidden:(i + 1) * hidden] for i in range(n_gates)]
        rbs = [b[(n_gates + i) * hidden:(n_gates + i + 1) * hidden]
               for i in range(n_gates)]
    return ws, rs, bs, rbs


def _maybe_clip(v, clip):
    return v if clip is None else jnp.clip(v, -clip, clip)


@op("GRU")
def op_gru(ctx: Ctx, x, w, r, b=None, seq_lens=None, initial_h=None):
    hidden = ctx.attr("hidden_size")
    lbr = ctx.attr("linear_before_reset", 0)
    x, lens, (h0,), direction, clip, finish = _rnn_prep(
        ctx, x, seq_lens, [initial_h])
    w, r = jnp.asarray(w), jnp.asarray(r)
    b = None if b is None else jnp.asarray(b)

    ys, hs = [], []
    for d in range(w.shape[0]):
        (wz, wr, wh), (rz, rr, rh), (bz, br, bh), (rbz, rbr, rbh) = _gates(
            w[d], r[d], None if b is None else b[d], 3, hidden)

        def step(carry, xt, wz=wz, wr=wr, wh=wh, rz=rz, rr=rr, rh=rh,
                 bz=bz, br=br, bh=bh, rbz=rbz, rbr=rbr, rbh=rbh):
            (h,) = carry
            z = jax.nn.sigmoid(_maybe_clip(
                xt @ wz + h @ rz + bz + rbz, clip))
            rg = jax.nn.sigmoid(_maybe_clip(
                xt @ wr + h @ rr + br + rbr, clip))
            if lbr:
                hh = jnp.tanh(_maybe_clip(
                    xt @ wh + bh + rg * (h @ rh + rbh), clip))
            else:
                hh = jnp.tanh(_maybe_clip(
                    xt @ wh + (rg * h) @ rh + bh + rbh, clip))
            h_new = (1 - z) * hh + z * h
            return (h_new,), h_new

        reverse = (direction == "reverse") or (
            direction == "bidirectional" and d == 1)
        (h_fin,), y = _rnn_scan(x, lens, step, (h0[d],), reverse)
        ys.append(y)
        hs.append(h_fin)
    y, (y_h,) = finish(ys, [hs])
    return y, y_h


@op("LSTM")
def op_lstm(ctx: Ctx, x, w, r, b=None, seq_lens=None, initial_h=None,
            initial_c=None, peepholes=None):
    if peepholes is not None:
        raise UnsupportedOp("LSTM: peephole connections are not supported")
    hidden = ctx.attr("hidden_size")
    input_forget = ctx.attr("input_forget", 0)
    x, lens, (h0, c0), direction, clip, finish = _rnn_prep(
        ctx, x, seq_lens, [initial_h, initial_c])
    w, r = jnp.asarray(w), jnp.asarray(r)
    b = None if b is None else jnp.asarray(b)

    ys, hs, cs = [], [], []
    for d in range(w.shape[0]):
        # ONNX gate order: input, output, forget, cell
        (wi, wo, wf, wc), (ri, ro, rf, rc), (bi, bo, bf, bc), \
            (rbi, rbo, rbf, rbc) = _gates(
                w[d], r[d], None if b is None else b[d], 4, hidden)

        def step(carry, xt, wi=wi, wo=wo, wf=wf, wc=wc, ri=ri, ro=ro,
                 rf=rf, rc=rc, bi=bi, bo=bo, bf=bf, bc=bc, rbi=rbi,
                 rbo=rbo, rbf=rbf, rbc=rbc):
            h, c = carry
            i = jax.nn.sigmoid(_maybe_clip(xt @ wi + h @ ri + bi + rbi, clip))
            f = (1.0 - i if input_forget else jax.nn.sigmoid(
                _maybe_clip(xt @ wf + h @ rf + bf + rbf, clip)))
            g = jnp.tanh(_maybe_clip(xt @ wc + h @ rc + bc + rbc, clip))
            o = jax.nn.sigmoid(_maybe_clip(xt @ wo + h @ ro + bo + rbo, clip))
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        reverse = (direction == "reverse") or (
            direction == "bidirectional" and d == 1)
        (h_fin, c_fin), y = _rnn_scan(x, lens, step, (h0[d], c0[d]), reverse)
        ys.append(y)
        hs.append(h_fin)
        cs.append(c_fin)
    y, (y_h, y_c) = finish(ys, [hs, cs])
    return y, y_h, y_c


@op("RNN")
def op_rnn(ctx: Ctx, x, w, r, b=None, seq_lens=None, initial_h=None):
    hidden = ctx.attr("hidden_size")
    x, lens, (h0,), direction, clip, finish = _rnn_prep(
        ctx, x, seq_lens, [initial_h])
    w, r = jnp.asarray(w), jnp.asarray(r)
    b = None if b is None else jnp.asarray(b)

    ys, hs = [], []
    for d in range(w.shape[0]):
        (wx,), (rh,), (bx,), (rbx,) = _gates(
            w[d], r[d], None if b is None else b[d], 1, hidden)

        def step(carry, xt, wx=wx, rh=rh, bx=bx, rbx=rbx):
            (h,) = carry
            h_new = jnp.tanh(_maybe_clip(xt @ wx + h @ rh + bx + rbx, clip))
            return (h_new,), h_new

        reverse = (direction == "reverse") or (
            direction == "bidirectional" and d == 1)
        (h_fin,), y = _rnn_scan(x, lens, step, (h0[d],), reverse)
        ys.append(y)
        hs.append(h_fin)
    y, (y_h,) = finish(ys, [hs])
    return y, y_h


# ---------------------------------------------------------------------------
# scatter / gather-nd / topk / control flow
# ---------------------------------------------------------------------------

def _wrap_nd_indices(idx: jax.Array, shape: tuple) -> jax.Array:
    """ONNX allows negative indices (wrap from the end); jit-mode advanced
    indexing would silently CLAMP them to 0 instead."""
    dims = jnp.asarray(shape[: idx.shape[-1]], idx.dtype)
    return jnp.where(idx < 0, idx + dims, idx)


@op("GatherND")
def op_gathernd(ctx: Ctx, data, indices):
    b = ctx.attr("batch_dims", 0)
    d = jnp.asarray(data)
    idx = jnp.asarray(indices)
    if b:
        # vmap the batch_dims away (leading dims of data and indices agree)
        def inner(dd, ii):
            ii = _wrap_nd_indices(ii, dd.shape)
            k = ii.shape[-1]
            return dd[tuple(ii[..., i] for i in range(k))]

        fn = inner
        for _ in range(b):
            fn = jax.vmap(fn)
        return fn(d, idx)
    idx = _wrap_nd_indices(idx, d.shape)
    k = idx.shape[-1]
    return d[tuple(idx[..., i] for i in range(k))]


@op("ScatterND")
def op_scatternd(ctx: Ctx, data, indices, updates):
    red = ctx.attr("reduction", "none")
    d = jnp.asarray(data)
    idx = _wrap_nd_indices(jnp.asarray(indices), d.shape)
    upd = jnp.asarray(updates).astype(d.dtype)
    k = idx.shape[-1]
    flat_idx = idx.reshape(-1, k)
    upd_flat = upd.reshape((-1,) + d.shape[k:])
    loc = d.at[tuple(flat_idx[:, i] for i in range(k))]
    if red == "add":
        return loc.add(upd_flat)
    if red == "mul":
        return loc.multiply(upd_flat)
    if red == "none":
        return loc.set(upd_flat)
    raise UnsupportedOp(f"ScatterND reduction={red!r}")


@op("TopK")
def op_topk(ctx: Ctx, x, k):
    kk = int(ctx.static(k, "k").ravel()[0])
    axis = ctx.attr("axis", -1)
    largest = ctx.attr("largest", 1)
    xa = jnp.asarray(x)
    moved = jnp.moveaxis(xa, axis, -1)
    if largest:
        vals, idx = jax.lax.top_k(moved, kk)
    else:  # smallest-k ascending: argsort (negation breaks uint/INT_MIN)
        idx = jnp.argsort(moved, axis=-1, stable=True)[..., :kk]
        vals = jnp.take_along_axis(moved, idx, axis=-1)
    return (jnp.moveaxis(vals, -1, axis),
            jnp.moveaxis(idx, -1, axis).astype(jnp.int32))


@op("ScatterElements")
def op_scatterelements(ctx: Ctx, data, indices, updates):
    axis = ctx.attr("axis", 0)
    red = ctx.attr("reduction", "none")
    d = jnp.asarray(data)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + d.shape[axis], idx)
    upd = jnp.asarray(updates).astype(d.dtype)
    # build full index grids: scatter along `axis`, identity elsewhere
    grids = jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing="ij")
    loc_idx = tuple(idx if a == (axis % d.ndim) else grids[a]
                    for a in range(d.ndim))
    loc = d.at[loc_idx]
    if red == "add":
        return loc.add(upd)
    if red == "mul":
        return loc.multiply(upd)
    if red == "max":
        return loc.max(upd)
    if red == "min":
        return loc.min(upd)
    if red == "none":
        return loc.set(upd)
    raise UnsupportedOp(f"ScatterElements reduction={red!r}")


@op("If")
def op_if(ctx: Ctx, cond):
    """Condition must be trace-time static (in these graphs it derives from
    shape math, which the partial evaluator keeps concrete)."""
    c = bool(np.asarray(ctx.static(cond, "condition")).ravel()[0])
    sub = ctx.attr("then_branch" if c else "else_branch")
    if sub is None:
        raise UnsupportedOp("If: missing branch subgraph")
    sub_env = dict(ctx.env or {})
    for name, t in sub.initializers.items():
        sub_env[name] = np.asarray(t.data)
    _run_nodes(_toposort(sub, set(sub_env)), sub_env)
    outs = tuple(sub_env[vi.name] for vi in sub.outputs)
    return outs if len(outs) > 1 else outs[0]


@op("Loop")
def op_loop(ctx: Ctx, trip_count, cond, *carried):
    """ONNX Loop with a trace-time-static trip count, unrolled at trace
    time (the jit-compatible subset: for-loops over fixed lengths, the form
    torch exports for fixed-iteration scans). A data-dependent loop
    condition cannot compile under jit and raises UnsupportedOp.

    Body graph signature per spec: (iter_num, cond_in, carried...) ->
    (cond_out, carried..., scan_outputs...); scan outputs are stacked along
    a new leading axis.
    """
    body = ctx.attr("body")
    if body is None:
        raise UnsupportedOp("Loop: missing body subgraph")
    m = int(ctx.static(trip_count, "trip_count (M)").ravel()[0])
    if cond is not None:
        c = np.asarray(ctx.static(cond, "initial condition"))
        if not bool(c.ravel()[0]):
            m = 0
    n_carried = len(carried)
    n_scan = len(body.outputs) - 1 - n_carried
    if m == 0 and n_scan > 0:
        # ORT returns dim-0 scan outputs; their element shape is unknowable
        # without running the body — refuse loudly rather than crash in
        # jnp.stack([]) with an opaque error
        raise UnsupportedOp(
            "Loop: zero trip count with scan outputs is not supported "
            "(empty scan output shapes cannot be derived without running "
            "the body)")
    in_names = [vi.name for vi in body.inputs]
    out_names = [vi.name for vi in body.outputs]
    state = list(carried)
    scans: list[list] = [[] for _ in range(n_scan)]
    for it in range(m):
        sub_env = dict(ctx.env or {})
        for name, t in body.initializers.items():
            sub_env[name] = np.asarray(t.data)
        sub_env[in_names[0]] = np.asarray(it, np.int64)
        if len(in_names) > 1:
            sub_env[in_names[1]] = np.asarray(True)
        for name, val in zip(in_names[2:], state):
            sub_env[name] = val
        _run_nodes(_toposort(body, set(sub_env)), sub_env)
        cond_out = sub_env[out_names[0]]
        state = [sub_env[n] for n in out_names[1 : 1 + n_carried]]
        for i, n in enumerate(out_names[1 + n_carried:]):
            scans[i].append(jnp.asarray(sub_env[n]))
        if _is_static(cond_out):
            if not bool(np.asarray(cond_out).ravel()[0]):
                break
        else:
            raise UnsupportedOp(
                "Loop: data-dependent loop condition cannot compile under jit"
            )
    outs = tuple(state) + tuple(jnp.stack(s) for s in scans)
    return outs if len(outs) > 1 else outs[0]


@op("Scan")
def op_scan(ctx: Ctx, *inputs):
    """ONNX Scan: N carried states + M scan inputs iterated along an axis,
    unrolled at trace time (sequence lengths are static under jit, so the
    trip count always is too — unlike Loop there is no dynamic condition).

    Body signature per spec: (state_1..N, scan_elem_1..M) ->
    (state_1..N, scan_out_1..K); scan outputs stack along scan_output_axes.
    """
    body = ctx.attr("body")
    if body is None:
        raise UnsupportedOp("Scan: missing body subgraph")
    m = ctx.attr("num_scan_inputs")
    if not m:
        raise UnsupportedOp("Scan: num_scan_inputs attribute is required")
    n = len(inputs) - m
    state = list(inputs[:n])
    scans_in = [jnp.asarray(s) for s in inputs[n:]]
    in_axes = ctx.attr("scan_input_axes", [0] * m)
    in_dirs = ctx.attr("scan_input_directions", [0] * m)
    in_names = [vi.name for vi in body.inputs]
    out_names = [vi.name for vi in body.outputs]
    k = len(out_names) - n
    out_axes = ctx.attr("scan_output_axes", [0] * k)
    out_dirs = ctx.attr("scan_output_directions", [0] * k)
    ax0 = in_axes[0] % scans_in[0].ndim
    t = scans_in[0].shape[ax0]
    collect: list[list] = [[] for _ in range(k)]
    for it in range(t):
        sub_env = dict(ctx.env or {})
        for name, tens in body.initializers.items():
            sub_env[name] = np.asarray(tens.data)
        for name, val in zip(in_names[:n], state):
            sub_env[name] = val
        for j, s in enumerate(scans_in):
            ax = in_axes[j] % s.ndim
            idx = t - 1 - it if in_dirs[j] else it
            sub_env[in_names[n + j]] = jnp.take(s, idx, axis=ax)
        _run_nodes(_toposort(body, set(sub_env)), sub_env)
        state = [sub_env[nm] for nm in out_names[:n]]
        for i, nm in enumerate(out_names[n:]):
            collect[i].append(jnp.asarray(sub_env[nm]))
    outs = list(state)
    for i in range(k):
        seq = collect[i][::-1] if out_dirs[i] else collect[i]
        axis = out_axes[i] % (seq[0].ndim + 1)
        outs.append(jnp.stack(seq, axis=axis))
    return tuple(outs) if len(outs) > 1 else outs[0]


def _run_nodes(nodes: list[OnnxNode], env: dict) -> None:
    """Evaluate nodes into ``env`` (shared by the executor and subgraphs)."""
    for node in nodes:
        ins = [env[i] if i else None for i in node.inputs]
        handler = _REGISTRY.get(node.op_type)
        if handler is None:
            raise UnsupportedOp(
                f"op '{node.op_type}' (node '{node.name}') is not "
                f"implemented by the JAX ONNX executor"
            )
        static = getattr(handler, "static_ok", False) and all(
            v is None or _is_static(v) for v in ins
        )
        ctx = Ctx(np if static else jnp, node.attrs, node, env)
        out = handler(ctx, *ins)
        if not isinstance(out, tuple):
            out = (out,)
        for name, val in zip(node.outputs, out):
            if name:
                env[name] = val


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

def _dce(nodes: list[OnnxNode], outputs) -> list[OnnxNode]:
    """Dead-code elimination over a topologically-ordered node list: keep
    only nodes whose outputs transitively feed ``outputs``. Exporters
    routinely leave dead shape chains behind (torch.onnx.export emits
    Shape/Gather/Concat trees for branches the final graph never reads);
    every ONNX op in this registry is pure, so dropping them changes
    nothing but trace/compile time and op count. Subgraph-carrying nodes
    (If/Loop/Scan) are kept whole whenever any of their outputs is live —
    their bodies are traced lazily by their handlers."""
    live = set(outputs)
    kept_rev: list[OnnxNode] = []
    for n in reversed(nodes):
        if any(o and o in live for o in n.outputs):
            kept_rev.append(n)
            live.update(i for i in n.inputs if i)
    return kept_rev[::-1]


def _toposort(graph: OnnxGraph, available: set[str]) -> list[OnnxNode]:
    """ONNX requires topological order, but be tolerant of producers that
    violate it. Kahn's algorithm over value names."""
    nodes = list(graph.nodes)
    produced = dict(  # name -> producing node index
        (o, i) for i, n in enumerate(nodes) for o in n.outputs if o
    )
    ordered: list[OnnxNode] = []
    ready = set(available)
    pending = list(range(len(nodes)))
    while pending:
        progressed = False
        rest = []
        for i in pending:
            n = nodes[i]
            if all((not inp) or inp in ready for inp in n.inputs):
                ordered.append(n)
                ready.update(o for o in n.outputs if o)
                progressed = True
            else:
                rest.append(i)
        if not progressed:
            missing = {
                inp for i in rest for inp in nodes[i].inputs
                if inp and inp not in ready and inp not in produced
            }
            raise ValueError(f"graph has undefined inputs: {sorted(missing)}")
        pending = rest
    return ordered


class OnnxExecutor:
    """Executes one ONNX graph as a jitted JAX program.

    ``feeds`` are numpy arrays keyed by graph input name; returns numpy
    outputs in graph-output order. Float initializers travel as jit
    arguments; integer initializers are trace-time constants (shape math).
    """

    # float-typed operands that MUST be trace-time constants (everything
    # else static-required — axes/shapes/pads/trip counts — is integer and
    # caught by dtype): Range bounds, Resize/Upsample scales, OneHot values
    _STATIC_FLOAT_OPERANDS = {
        "Range": (0, 1, 2), "Resize": (2,), "Upsample": (1,), "OneHot": (2,),
    }

    @classmethod
    def _static_required_names(cls, graph: OnnxGraph) -> set[str]:
        names: set[str] = set()
        stack = [graph]
        while stack:
            g = stack.pop()
            for n in g.nodes:
                for i in cls._STATIC_FLOAT_OPERANDS.get(n.op_type, ()):
                    if len(n.inputs) > i and n.inputs[i]:
                        names.add(n.inputs[i])
                stack.extend(v for v in n.attrs.values()
                             if isinstance(v, OnnxGraph))
        return names

    def __init__(self, graph: OnnxGraph, *,
                 matmul_precision: str = "float32",
                 bf16_storage: bool = False):
        """``bf16_storage``: store MatMul/Gemm/Conv outputs as bfloat16
        inside the traced program (softmax/norm/reduce still compute f32;
        graph outputs keep their declared f32 dtype). The op-by-op graph's
        HBM-traffic analog of the native engine's bf16-logits fast path —
        opt-in throughput mode, NOT for the ORT-parity gate."""
        self.graph = graph
        self._static_inits: dict[str, np.ndarray] = {}
        self._weights: dict[str, jax.Array] = {}
        static_req = self._static_required_names(graph)
        for name, t in graph.initializers.items():
            arr = np.asarray(t.data)
            # integers/bools are trace-time constants (shape math), as are
            # the few float operands ops REQUIRE static (Resize scales,
            # Range bounds). Every other float array — including tiny
            # per-channel gains and scalar output scales — travels as a jit
            # ARGUMENT so the compiled executable is reusable across weight
            # updates (hot-swapping exe._weights really takes effect)
            if (np.issubdtype(arr.dtype, np.integer) or arr.dtype == np.bool_
                    or name in static_req):
                self._static_inits[name] = arr
            else:
                self._weights[name] = jnp.asarray(arr)
        init_names = set(graph.initializers)
        self.input_names = [vi.name for vi in graph.inputs
                            if vi.name not in init_names]
        self.output_names = [vi.name for vi in graph.outputs]
        if not self.output_names:
            raise ValueError("graph has no declared outputs")
        avail = (set(self.input_names) | init_names)
        self._nodes = _dce(_toposort(graph, avail), self.output_names)
        self._matmul_precision = matmul_precision
        self._bf16_storage = bool(bf16_storage)
        self._jfn = jax.jit(self._run_traced)

    # -- trace-time evaluation -------------------------------------------
    def _run_traced(self, weights: dict, inputs: tuple, time_mask=None):
        env: dict[str, Any] = dict(self._static_inits)
        # reserved key consulted by opset-sensitive ops (Softmax < 13);
        # If/Loop/Scan bodies inherit it via their env copies
        env["__opset__"] = self.graph.opset
        if time_mask is not None:
            # [T_latent] validity mask: re-zero bucket-padded frames after
            # every Conv/ConvTranspose (see _apply_time_mask)
            env["__time_mask__"] = jnp.asarray(time_mask, jnp.float32)
        if self._bf16_storage:
            env["__bf16_storage__"] = True
            env["__graph_outputs__"] = frozenset(self.output_names)
        env.update(weights)
        for name, arr in zip(self.input_names, inputs):
            env[name] = arr
        with jax.default_matmul_precision(self._matmul_precision):
            _run_nodes(self._nodes, env)
        outs = []
        for name in self.output_names:
            v = env[name]
            v = jnp.asarray(v) if _is_static(v) else v
            if self._bf16_storage and getattr(v, "dtype", None) == jnp.bfloat16:
                v = v.astype(jnp.float32)  # keep the declared output contract
            outs.append(v)
        return tuple(outs)

    # -- public API --------------------------------------------------------
    def __call__(self, feeds: dict[str, np.ndarray]) -> list[np.ndarray]:
        missing = [n for n in self.input_names if n not in feeds]
        if missing:
            raise ValueError(f"missing feeds: {missing}")
        inputs = tuple(jnp.asarray(feeds[n]) for n in self.input_names)
        outs = self._jfn(self._weights, inputs)
        return [np.asarray(o) for o in outs]

    def run(self, output_names=None,
            feeds: dict[str, np.ndarray] | None = None) -> list[np.ndarray]:
        """onnxruntime.InferenceSession.run-compatible signature
        (reference py/helper.py:190-214 calls ``run(None, {...})``)."""
        outs = self(feeds or {})
        if output_names:
            by_name = dict(zip(self.output_names, outs))
            return [by_name[n] for n in output_names]
        return outs


class OnnxSession(OnnxExecutor):
    """Alias that reads straight from an .onnx file — a drop-in stand-in for
    ``ort.InferenceSession(path)`` within this codebase."""

    def __init__(self, path: str, **kw):
        super().__init__(load_onnx(path), **kw)


def load_session(path: str, **kw) -> OnnxSession:
    return OnnxSession(path, **kw)
