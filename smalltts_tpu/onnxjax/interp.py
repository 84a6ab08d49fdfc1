"""Graph-walking ONNX interpreter lowering to JAX.

Evaluates an ONNX graph node-by-node (ONNX graphs are topologically sorted
per spec), producing a pure function `fn(params, *inputs)` that jits cleanly:

* initializers become a params dict (so they can be dtype-cast, donated,
  sharded like any pytree);
* values flow as either `np.ndarray` (compile-time constants) or JAX arrays
  (traced); any op whose inputs are all numpy is constant-folded with the
  same jnp implementation, so shape-math chains (`Shape -> Gather -> Concat
  -> Reshape`) stay static — `Shape` of a traced array returns its *static*
  shape as numpy, which is exact under jit;
* opset differences are handled per-op (attribute -> input migrations for
  Slice/Squeeze/Unsqueeze/Pad/Clip/Reduce*, Softmax axis semantics).

This replaces the reference's onnxruntime sessions
(reference: src/smalltts/codec/onnx.py:22-32) with XLA-compiled execution.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from smalltts_tpu.onnxjax import proto
from smalltts_tpu.onnxjax.proto import Model, Node, tensor_to_numpy

_REGISTRY: Dict[str, Callable] = {}


def op(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


class Ctx:
    """Per-node evaluation context handed to op implementations."""

    def __init__(self, node: Node, opset: int, env: dict,
                 statics: Optional[dict] = None, base_dir: str = "."):
        self.node = node
        self.opset = opset
        self._env = env
        self._statics = statics or {}
        self.attrs = node.attributes
        self.base_dir = base_dir

    # ---- attribute accessors
    def attr_i(self, name: str, default: Optional[int] = None) -> Optional[int]:
        a = self.attrs.get(name)
        return int(a.i) if a is not None else default

    def attr_f(self, name: str, default: Optional[float] = None) -> Optional[float]:
        a = self.attrs.get(name)
        return float(a.f) if a is not None else default

    def attr_s(self, name: str, default: str = "") -> str:
        a = self.attrs.get(name)
        return a.s.decode("utf-8") if a is not None else default

    def attr_ints(self, name: str, default=None):
        a = self.attrs.get(name)
        return list(a.ints) if a is not None else default

    def attr_floats(self, name: str, default=None):
        a = self.attrs.get(name)
        return list(a.floats) if a is not None else default

    def attr_tensor(self, name: str):
        # base_dir threads through: an attribute tensor with external data
        # must resolve against the model's directory, not the cwd (the
        # same wrong-bytes hazard serialize_tensor guards, review r3)
        a = self.attrs.get(name)
        return tensor_to_numpy(a.t, self.base_dir) if a is not None else None

    # ---- optional-input accessor (ONNX marks absent inputs with "")
    def input(self, idx: int):
        names = self.node.inputs
        if idx >= len(names) or names[idx] == "":
            return None
        return self._env[names[idx]]

    def static_input(self, idx: int):
        """Input that must be a compile-time constant (shape math)."""
        v = self.input(idx)
        if v is None:
            return None
        name = self.node.inputs[idx]
        if isinstance(v, jax.core.Tracer) and name in self._statics:
            # An INITIALIZER threaded through jit arrives as a tracer, but
            # its value is the stored host-side numpy copy bit-for-bit
            # (torch.onnx.export with do_constant_folding=True emits
            # Reshape/Slice/Pad shape tensors as initializers). Shape
            # tensors are graph structure, not weights — using the host
            # copy keeps the graph compilable with params as jit args.
            return np.asarray(self._statics[name])
        return to_static(v, f"{self.node.op_type} input #{idx}")


def to_static(v, what: str = "value") -> np.ndarray:
    if isinstance(v, np.ndarray) or np.isscalar(v):
        return np.asarray(v)
    if isinstance(v, jax.Array) and not isinstance(v, jax.core.Tracer):
        return np.asarray(v)
    raise ValueError(
        f"ONNX import: {what} must be statically known (got traced value); "
        "the graph does data-dependent shape computation we cannot compile"
    )


def _is_const(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


class OnnxFunction:
    """An ONNX model as a pure jittable JAX function.

    `params` is `{initializer_name: np.ndarray}`; `__call__(params, *inputs)`
    returns a single output or a tuple. Graph inputs are positional in the
    order declared by the model (minus initializers, which older exporters
    also list as graph inputs).
    """

    def __init__(self, model: Model, base_dir: Optional[str] = None):
        # default external-data resolution to the directory the model was
        # loaded from (Model._path), like proto.serialize_model — a bare
        # OnnxFunction(load_model(path)) must not read sidecar files
        # relative to the cwd (review r3)
        if base_dir is None:
            p = getattr(model, "_path", None)
            base_dir = os.path.dirname(os.path.abspath(p)) if p else "."
        self._base_dir = base_dir
        self.model = model
        self.opset = model.opset_version
        g = model.graph
        self.params: Dict[str, np.ndarray] = {
            t.name: tensor_to_numpy(t, base_dir) for t in g.initializers
        }
        self.input_names = [
            vi.name for vi in g.inputs if vi.name not in self.params
        ]
        self.output_names = [vi.name for vi in g.outputs]
        self.input_info = {vi.name: vi for vi in g.inputs}
        # names whose values SOMETHING reads: node inputs + graph outputs
        # (used to flag not-implemented-but-consumed node outputs early)
        self._consumed = {i for n in g.nodes for i in n.inputs if i}
        self._consumed.update(self.output_names)
        unsupported = sorted(
            {n.op_type for n in g.nodes if n.op_type not in _REGISTRY}
        )
        if unsupported:
            raise NotImplementedError(
                f"ONNX import: unsupported ops {unsupported} "
                f"(graph {g.name!r}, {len(g.nodes)} nodes)"
            )
        # Structural validation: catches truncated/corrupt files that still
        # parse (protobuf truncation at a field boundary is silent).
        if not g.outputs:
            raise ValueError("ONNX import: graph has no outputs (truncated file?)")
        known = set(self.params) | set(self.input_names) | {""}
        for node in g.nodes:
            missing = [i for i in node.inputs if i not in known]
            if missing:
                raise ValueError(
                    f"ONNX import: node {node.op_type} ({node.name!r}) reads "
                    f"undefined values {missing} (truncated or out-of-order graph)"
                )
            known.update(node.outputs)
        dangling = [o for o in self.output_names if o not in known]
        if dangling:
            raise ValueError(
                f"ONNX import: graph outputs {dangling} are never produced "
                "(truncated file?)"
            )

    def __call__(self, params: Dict[str, np.ndarray], *inputs):
        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"expected {len(self.input_names)} inputs "
                f"{self.input_names}, got {len(inputs)}"
            )
        env: Dict[str, object] = dict(params)
        env.update(zip(self.input_names, inputs))
        env[""] = None
        for node in self.model.graph.nodes:
            fn = _REGISTRY[node.op_type]
            ctx = Ctx(node, self.opset, env, self.params, self._base_dir)
            args = [env[name] if name else None for name in node.inputs]
            if all(a is None or _is_const(a) for a in args):
                # Constant folding. Inside a jit trace even jnp ops on numpy
                # constants produce tracers; forcing compile-time eval keeps
                # shape-math chains (Shape->Gather->Mul->Reshape) static.
                with jax.ensure_compile_time_eval():
                    out = fn(ctx, *args)
                if not isinstance(out, tuple):
                    out = (out,)
                out = tuple(
                    np.asarray(o) if o is not None else None for o in out
                )
            else:
                out = fn(ctx, *args)
            if not isinstance(out, tuple):
                out = (out,)
            for name, val in zip(node.outputs, out):
                if name:
                    env[name] = val
            # a declared output the impl did not produce must fail HERE with
            # a clear message, not as a bare KeyError deep inside a jit trace
            # when a consumer looks it up (e.g. MaxPool Indices) — unconsumed
            # optional outputs remain fine
            for name in node.outputs[len(out):]:
                if name and name in self._consumed:
                    raise NotImplementedError(
                        f"{node.op_type}: declared output {name!r} is "
                        "consumed by the graph but not implemented")
        outs = tuple(env[name] for name in self.output_names)
        return outs[0] if len(outs) == 1 else outs

    def ops_used(self) -> List[str]:
        return sorted({n.op_type for n in self.model.graph.nodes})


# ============================================================ elementwise


def _ew(name: str, fn):
    @op(name)
    def impl(ctx, *xs, _fn=fn):
        out = _fn(*xs)
        if all(_is_const(x) for x in xs):
            return np.asarray(out)
        return out

    return impl


_ew("Add", lambda a, b: jnp.add(a, b))
_ew("Sub", lambda a, b: jnp.subtract(a, b))
_ew("Mul", lambda a, b: jnp.multiply(a, b))
_ew(
    "Div",
    lambda a, b: (
        jnp.divide(a, b)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        # ONNX integer Div truncates toward zero (C semantics); lax.div does
        # too, while Python's // floors (differs on negatives)
        else lax.div(jnp.asarray(a), jnp.asarray(b).astype(jnp.asarray(a).dtype))
    ),
)
def _pow(a, b):
    # output takes the BASE dtype, but the math must not truncate a
    # fractional exponent when the base is integer (pow(4, 0.5) == 2)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if jnp.issubdtype(a.dtype, jnp.integer) and jnp.issubdtype(b.dtype, jnp.floating):
        return jnp.power(a.astype(b.dtype), b).astype(a.dtype)
    return jnp.power(a, b.astype(a.dtype))


_ew("Pow", _pow)
_ew("Sqrt", jnp.sqrt)
_ew("Exp", jnp.exp)
_ew("Log", jnp.log)
_ew("Abs", jnp.abs)
_ew("Neg", jnp.negative)
_ew("Floor", jnp.floor)
_ew("Ceil", jnp.ceil)
_ew("Round", jnp.round)
_ew("Reciprocal", lambda x: 1.0 / x)
_ew("Sign", jnp.sign)
_ew("Sin", jnp.sin)
_ew("Cos", jnp.cos)
_ew("Tan", jnp.tan)
_ew("Asin", jnp.arcsin)
_ew("Acos", jnp.arccos)
_ew("Atan", jnp.arctan)
_ew("Sinh", jnp.sinh)
_ew("Cosh", jnp.cosh)
_ew("Tanh", jnp.tanh)
_ew("Asinh", jnp.arcsinh)
_ew("Acosh", jnp.arccosh)
_ew("Atanh", jnp.arctanh)
_ew("Erf", jax.scipy.special.erf)
_ew("Sigmoid", jax.nn.sigmoid)
_ew("Relu", jax.nn.relu)
_ew("Softplus", jax.nn.softplus)
_ew("Softsign", jax.nn.soft_sign)
_ew("Mish", lambda x: x * jnp.tanh(jax.nn.softplus(x)))
_ew("Not", jnp.logical_not)
_ew("And", jnp.logical_and)
_ew("Or", jnp.logical_or)
_ew("Xor", jnp.logical_xor)
_ew("Equal", lambda a, b: jnp.equal(a, b))
_ew("Greater", lambda a, b: jnp.greater(a, b))
_ew("GreaterOrEqual", lambda a, b: jnp.greater_equal(a, b))
_ew("Less", lambda a, b: jnp.less(a, b))
_ew("LessOrEqual", lambda a, b: jnp.less_equal(a, b))
_ew("IsNaN", jnp.isnan)
_ew("Where", lambda c, a, b: jnp.where(c, a, b))
_ew("Min", lambda *xs: _variadic(jnp.minimum, xs))
_ew("Max", lambda *xs: _variadic(jnp.maximum, xs))
_ew("Sum", lambda *xs: _variadic(jnp.add, xs))
_ew("Mean", lambda *xs: _variadic(jnp.add, xs) / len(xs))


def _variadic(fn, xs):
    out = xs[0]
    for x in xs[1:]:
        out = fn(out, x)
    return out


@op("LeakyRelu")
def _leaky_relu(ctx, x):
    return jax.nn.leaky_relu(x, ctx.attr_f("alpha", 0.01))


@op("PRelu")
def _prelu(ctx, x, slope):
    return jnp.where(x >= 0, x, x * slope)


@op("Elu")
def _elu(ctx, x):
    return jax.nn.elu(x, ctx.attr_f("alpha", 1.0))


@op("Selu")
def _selu(ctx, x):
    alpha = ctx.attr_f("alpha", 1.6732631921768188)
    gamma = ctx.attr_f("gamma", 1.0507010221481323)
    return gamma * jnp.where(x > 0, x, alpha * jnp.expm1(x))


@op("Celu")
def _celu(ctx, x):
    return jax.nn.celu(x, ctx.attr_f("alpha", 1.0))


@op("HardSigmoid")
def _hard_sigmoid(ctx, x):
    alpha = ctx.attr_f("alpha", 0.2)
    beta = ctx.attr_f("beta", 0.5)
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


@op("HardSwish")
def _hard_swish(ctx, x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@op("Gelu")
def _gelu(ctx, x):
    return jax.nn.gelu(x, approximate=ctx.attr_s("approximate", "none") == "tanh")


@op("Clip")
def _clip(ctx, x, *rest):
    if ctx.opset < 11:
        lo = ctx.attr_f("min", -3.4028234663852886e38)
        hi = ctx.attr_f("max", 3.4028234663852886e38)
    else:
        lo = ctx.input(1)
        hi = ctx.input(2)
    out = x
    if lo is not None:
        out = jnp.maximum(out, lo)
    if hi is not None:
        out = jnp.minimum(out, hi)
    return out


@op("Mod")
def _mod(ctx, a, b):
    if ctx.attr_i("fmod", 0):
        return jnp.fmod(a, b)
    return jnp.mod(a, b)


@op("Cast")
def _cast(ctx, x):
    dt = proto.TENSOR_DTYPES.get(ctx.attr_i("to"))
    if dt is None:
        raise NotImplementedError(f"Cast to onnx dtype {ctx.attr_i('to')}")
    if _is_const(x):
        return np.asarray(x).astype(dt)
    return jnp.asarray(x).astype(dt)


@op("CastLike")
def _cast_like(ctx, x, target):
    return jnp.asarray(x).astype(jnp.asarray(target).dtype)


@op("Identity")
def _identity(ctx, x):
    return x


@op("Dropout")
def _dropout(ctx, x, *rest):
    if len(ctx.node.outputs) > 1:
        return x, jnp.ones(jnp.shape(x), bool)
    return x


# ============================================================ reductions


def _reduce(name: str, fn, needs_float=False):
    @op(name)
    def impl(ctx, x, *rest, _fn=fn):
        if ctx.opset >= 18 or (name == "ReduceSum" and ctx.opset >= 13):
            axes_v = ctx.static_input(1) if len(ctx.node.inputs) > 1 else None
            axes = None if axes_v is None else tuple(int(a) for a in np.atleast_1d(axes_v))
        else:
            a = ctx.attr_ints("axes")
            axes = tuple(a) if a is not None else None
        keep = bool(ctx.attr_i("keepdims", 1))
        if (axes is None or axes == ()) and ctx.attr_i("noop_with_empty_axes", 0):
            return x
        if axes == ():
            # an explicitly EMPTY axes tensor (without the noop attr) means
            # reduce over ALL axes, same as an absent input
            axes = None
        out = _fn(jnp.asarray(x), axis=axes, keepdims=keep)
        return np.asarray(out) if _is_const(x) else out

    return impl


_reduce("ReduceSum", jnp.sum)
_reduce("ReduceMean", jnp.mean)
_reduce("ReduceMax", jnp.max)
_reduce("ReduceMin", jnp.min)
_reduce("ReduceProd", jnp.prod)
_reduce("ReduceL1", lambda x, axis, keepdims: jnp.sum(jnp.abs(x), axis=axis, keepdims=keepdims))
_reduce("ReduceL2", lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims)))
_reduce("ReduceSumSquare", lambda x, axis, keepdims: jnp.sum(x * x, axis=axis, keepdims=keepdims))
_reduce("ReduceLogSum", lambda x, axis, keepdims: jnp.log(jnp.sum(x, axis=axis, keepdims=keepdims)))
_reduce(
    "ReduceLogSumExp",
    lambda x, axis, keepdims: jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims),
)


def _arg_extreme(ctx, x, fn):
    axis = ctx.attr_i("axis", 0)
    keep = bool(ctx.attr_i("keepdims", 1))
    if ctx.attr_i("select_last_index", 0):
        # ONNX spec: ties resolve to the LAST occurrence; jnp.argmax/argmin
        # return the first, so scan the reversed axis and mirror the index
        rev = fn(jnp.flip(x, axis=axis), axis=axis)
        out = (x.shape[axis] - 1 - rev).astype(jnp.int64)
    else:
        out = fn(x, axis=axis).astype(jnp.int64)
    return jnp.expand_dims(out, axis) if keep else out


@op("ArgMax")
def _argmax(ctx, x):
    return _arg_extreme(ctx, x, jnp.argmax)


@op("ArgMin")
def _argmin(ctx, x):
    return _arg_extreme(ctx, x, jnp.argmin)


@op("CumSum")
def _cumsum(ctx, x, axis):
    ax = int(ctx.static_input(1))
    if ctx.attr_i("exclusive", 0) or ctx.attr_i("reverse", 0):
        y = jnp.asarray(x)
        if ctx.attr_i("reverse", 0):
            y = jnp.flip(y, ax)
        out = jnp.cumsum(y, axis=ax)
        if ctx.attr_i("exclusive", 0):
            out = jnp.roll(out, 1, ax).at[(slice(None),) * (ax % out.ndim) + (0,)].set(0)
        if ctx.attr_i("reverse", 0):
            out = jnp.flip(out, ax)
        return out
    return jnp.cumsum(x, axis=ax)


# ============================================================ shape / data


@op("Shape")
def _shape(ctx, x):
    shape = np.asarray(jnp.shape(x), np.int64)
    start = ctx.attr_i("start", 0)
    end = ctx.attr_i("end")
    n = len(shape)
    start = max(start + n, 0) if start < 0 else min(start, n)
    if end is None:
        end = n
    end = max(end + n, 0) if end < 0 else min(end, n)
    return shape[start:end]


@op("Size")
def _size(ctx, x):
    return np.asarray(int(np.prod(jnp.shape(x), dtype=np.int64)), np.int64)


@op("Constant")
def _constant(ctx):
    for name in ("value", "value_float", "value_int", "value_floats", "value_ints"):
        a = ctx.attrs.get(name)
        if a is None:
            continue
        if name == "value":
            return tensor_to_numpy(a.t, ctx.base_dir)
        if name == "value_float":
            return np.asarray(a.f, np.float32)
        if name == "value_int":
            return np.asarray(a.i, np.int64)
        if name == "value_floats":
            return np.asarray(a.floats, np.float32)
        if name == "value_ints":
            return np.asarray(a.ints, np.int64)
    raise NotImplementedError("Constant: no supported value attribute")


@op("ConstantOfShape")
def _constant_of_shape(ctx, shape):
    dims = tuple(int(d) for d in ctx.static_input(0))
    val = ctx.attr_tensor("value")
    if val is None:
        val = np.zeros((1,), np.float32)
    return np.full(dims, val.reshape(()).item(), val.dtype)


@op("Range")
def _range(ctx, start, limit, delta):
    s = ctx.static_input(0)
    l = ctx.static_input(1)
    d = ctx.static_input(2)
    return np.arange(s.item(), l.item(), d.item(), dtype=s.dtype)


@op("Reshape")
def _reshape(ctx, x, shape):
    target = [int(d) for d in ctx.static_input(1)]
    xshape = jnp.shape(x)
    allowzero = ctx.attr_i("allowzero", 0)
    if not allowzero:
        target = [xshape[i] if d == 0 else d for i, d in enumerate(target)]
    out = jnp.reshape(jnp.asarray(x), target)
    return np.asarray(out) if _is_const(x) else out


@op("Flatten")
def _flatten(ctx, x):
    axis = ctx.attr_i("axis", 1)
    shape = jnp.shape(x)
    # ONNX: negative axis means axis + rank (NOT modulo rank+1 — that is
    # off by one for every negative value)
    axis = axis + len(shape) if axis < 0 else axis
    a = int(np.prod(shape[:axis], dtype=np.int64))
    b = int(np.prod(shape[axis:], dtype=np.int64))
    return jnp.reshape(jnp.asarray(x), (a, b))


@op("Squeeze")
def _squeeze(ctx, x, *rest):
    if ctx.opset >= 13:
        axes_v = ctx.static_input(1)
        axes = None if axes_v is None else tuple(int(a) for a in np.atleast_1d(axes_v))
    else:
        a = ctx.attr_ints("axes")
        axes = tuple(a) if a is not None else None
    out = jnp.squeeze(jnp.asarray(x), axis=axes)
    return np.asarray(out) if _is_const(x) else out


@op("Unsqueeze")
def _unsqueeze(ctx, x, *rest):
    if ctx.opset >= 13:
        axes = [int(a) for a in np.atleast_1d(ctx.static_input(1))]
    else:
        axes = ctx.attr_ints("axes")
    out = jnp.asarray(x)
    rank = out.ndim + len(axes)
    for ax in sorted(a % rank for a in axes):
        out = jnp.expand_dims(out, ax)
    return np.asarray(out) if _is_const(x) else out


@op("Transpose")
def _transpose(ctx, x):
    perm = ctx.attr_ints("perm")
    out = jnp.transpose(jnp.asarray(x), perm)
    return np.asarray(out) if _is_const(x) else out


@op("Concat")
def _concat(ctx, *xs):
    axis = ctx.attr_i("axis")
    out = jnp.concatenate([jnp.asarray(x) for x in xs], axis=axis)
    return np.asarray(out) if all(_is_const(x) for x in xs) else out


@op("Split")
def _split(ctx, x, *rest):
    axis = ctx.attr_i("axis", 0)
    n_out = len(ctx.node.outputs)
    splits = None
    if ctx.opset >= 13 and len(ctx.node.inputs) > 1:
        sv = ctx.static_input(1)
        if sv is not None:
            splits = [int(s) for s in np.atleast_1d(sv)]
    else:
        a = ctx.attr_ints("split")
        splits = list(a) if a is not None else None
    dim = jnp.shape(x)[axis]
    if splits is None:
        num = ctx.attr_i("num_outputs", n_out)
        chunk = -(-dim // num)
        splits = [chunk] * (num - 1) + [dim - chunk * (num - 1)]
    idx = np.cumsum(splits[:-1]).tolist()
    parts = jnp.split(jnp.asarray(x), idx, axis=axis)
    return tuple(parts)


@op("Slice")
def _slice(ctx, x, *rest):
    if ctx.opset < 10:
        starts = ctx.attr_ints("starts")
        ends = ctx.attr_ints("ends")
        axes = ctx.attr_ints("axes")
        steps = None
    else:
        starts = [int(v) for v in np.atleast_1d(ctx.static_input(1))]
        ends = [int(v) for v in np.atleast_1d(ctx.static_input(2))]
        axes_v = ctx.static_input(3)
        axes = None if axes_v is None else [int(v) for v in np.atleast_1d(axes_v)]
        steps_v = ctx.static_input(4)
        steps = None if steps_v is None else [int(v) for v in np.atleast_1d(steps_v)]
    shape = jnp.shape(x)
    rank = len(shape)
    if axes is None:
        axes = list(range(len(starts)))
    if steps is None:
        steps = [1] * len(starts)
    sl = [slice(None)] * rank
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % rank
        # ONNX clamps INT_MAX/MIN sentinels
        st = None if st in (-(1 << 63), (1 << 63) - 1) and sp < 0 else st
        sl[ax] = slice(st, None if en >= (1 << 31) else (None if en <= -(1 << 31) and sp < 0 else en), sp)
    out = jnp.asarray(x)[tuple(sl)]
    return np.asarray(out) if _is_const(x) else out


@op("Gather")
def _gather(ctx, x, indices):
    axis = ctx.attr_i("axis", 0)
    xa = jnp.asarray(x)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + xa.shape[axis], idx)
    out = jnp.take(xa, idx, axis=axis)
    return np.asarray(out) if _is_const(x) and _is_const(indices) else out


@op("GatherElements")
def _gather_elements(ctx, x, indices):
    axis = ctx.attr_i("axis", 0)
    xa = jnp.asarray(x)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + xa.shape[axis], idx)
    return jnp.take_along_axis(xa, idx, axis=axis)


@op("ScatterElements")
def _scatter_elements(ctx, x, indices, updates):
    axis = ctx.attr_i("axis", 0)
    reduction = ctx.attr_s("reduction", "none")
    xa = jnp.asarray(x)
    idx = jnp.asarray(indices)
    idx = jnp.where(idx < 0, idx + xa.shape[axis], idx)
    upd = jnp.asarray(updates)
    # build full index grids for scatter
    grids = jnp.meshgrid(*[jnp.arange(s) for s in idx.shape], indexing="ij")
    grids[axis] = idx
    if reduction == "add":
        return xa.at[tuple(grids)].add(upd)
    if reduction == "none":
        return xa.at[tuple(grids)].set(upd)
    raise NotImplementedError(f"ScatterElements reduction={reduction}")


@op("Expand")
def _expand(ctx, x, shape):
    target = [int(d) for d in ctx.static_input(1)]
    xa = jnp.asarray(x)
    # ONNX Expand uses numpy broadcasting; dims of 1 in target keep input dim
    in_shape = list(xa.shape)
    rank = max(len(in_shape), len(target))
    in_shape = [1] * (rank - len(in_shape)) + in_shape
    target = [1] * (rank - len(target)) + target
    final = [max(a, b) for a, b in zip(in_shape, target)]
    out = jnp.broadcast_to(xa.reshape(in_shape), final)
    return np.asarray(out) if _is_const(x) else out


@op("Tile")
def _tile(ctx, x, repeats):
    reps = [int(r) for r in ctx.static_input(1)]
    out = jnp.tile(jnp.asarray(x), reps)
    return np.asarray(out) if _is_const(x) else out


@op("Pad")
def _pad(ctx, x, *rest):
    if ctx.opset < 11:
        pads = ctx.attr_ints("pads")
        cval = ctx.attr_f("value", 0.0)
        mode = ctx.attr_s("mode", "constant")
        axes = None
    else:
        pads = [int(p) for p in np.atleast_1d(ctx.static_input(1))]
        cv = ctx.input(2)
        cval = (float(ctx.static_input(2).reshape(()))
                if cv is not None else 0.0)
        axes_v = ctx.static_input(3) if len(ctx.node.inputs) > 3 else None
        axes = None if axes_v is None else [int(a) for a in np.atleast_1d(axes_v)]
        mode = ctx.attr_s("mode", "constant")
    xa = jnp.asarray(x)
    rank = xa.ndim
    if axes is None:
        axes = list(range(rank))
    axes = [a % rank for a in axes]
    k = len(axes)
    width = [(0, 0)] * rank
    for j, ax in enumerate(axes):
        width[ax] = (pads[j], pads[k + j])
    jmode = {"constant": "constant", "reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
    if any(lo < 0 or hi < 0 for lo, hi in width):
        # negative pads crop; split into crop + pad
        sl = tuple(
            slice(max(0, -lo), xa.shape[i] - max(0, -hi)) for i, (lo, hi) in enumerate(width)
        )
        xa = xa[sl]
        width = [(max(0, lo), max(0, hi)) for lo, hi in width]
    if jmode == "constant":
        out = jnp.pad(xa, width, mode="constant", constant_values=cval)
    else:
        out = jnp.pad(xa, width, mode=jmode)
    return np.asarray(out) if _is_const(x) else out


@op("DepthToSpace")
def _depth_to_space(ctx, x):
    b = ctx.attr_i("blocksize")
    mode = ctx.attr_s("mode", "DCR")
    n, c, h, w = jnp.shape(x)
    xa = jnp.asarray(x)
    if mode == "DCR":
        xa = xa.reshape(n, b, b, c // (b * b), h, w).transpose(0, 3, 4, 1, 5, 2)
    else:
        xa = xa.reshape(n, c // (b * b), b, b, h, w).transpose(0, 1, 4, 2, 5, 3)
    return xa.reshape(n, c // (b * b), h * b, w * b)


@op("SpaceToDepth")
def _space_to_depth(ctx, x):
    b = ctx.attr_i("blocksize")
    n, c, h, w = jnp.shape(x)
    xa = jnp.asarray(x).reshape(n, c, h // b, b, w // b, b)
    return xa.transpose(0, 3, 5, 1, 2, 4).reshape(n, c * b * b, h // b, w // b)


@op("Trilu")
def _trilu(ctx, x, *rest):
    kv = ctx.static_input(1)
    k = int(kv) if kv is not None else 0
    upper = ctx.attr_i("upper", 1)
    xa = jnp.asarray(x)
    return jnp.triu(xa, k) if upper else jnp.tril(xa, k)


@op("OneHot")
def _one_hot(ctx, indices, depth, values):
    axis = ctx.attr_i("axis", -1)
    d = int(ctx.static_input(1).reshape(()))
    vals = ctx.static_input(2)
    idx = jnp.asarray(indices)
    # indices outside [-d, d-1] must yield an all-off row (no wrapping)
    valid = (idx >= -d) & (idx < d)
    oh = jax.nn.one_hot(jnp.where(valid, idx % d, -1), d, axis=axis)
    ax = axis if axis >= 0 else oh.ndim + axis
    vshape = list(jnp.shape(idx))
    vshape.insert(ax, 1)
    oh = oh * jnp.reshape(valid, vshape).astype(oh.dtype)
    # output dtype = values dtype per spec (one_hot returns float; an int64
    # OneHot feeding Gather/int arithmetic must stay integral, review r3)
    vals = jnp.asarray(vals)
    return (oh.astype(vals.dtype) * (vals[1] - vals[0]) + vals[0]).astype(
        vals.dtype)


# ============================================================ linear algebra


@op("MatMul")
def _matmul(ctx, a, b):
    return jnp.matmul(jnp.asarray(a), jnp.asarray(b), preferred_element_type=None)


@op("Gemm")
def _gemm(ctx, a, b, c=None):
    alpha = ctx.attr_f("alpha", 1.0)
    beta = ctx.attr_f("beta", 1.0)
    if ctx.attr_i("transA", 0):
        a = jnp.asarray(a).T
    if ctx.attr_i("transB", 0):
        b = jnp.asarray(b).T
    out = alpha * jnp.matmul(jnp.asarray(a), jnp.asarray(b))
    if c is not None:
        out = out + beta * jnp.asarray(c)
    return out


@op("Einsum")
def _einsum(ctx, *xs):
    return jnp.einsum(ctx.attr_s("equation"), *[jnp.asarray(x) for x in xs])


# ============================================================ normalization


@op("Softmax")
def _softmax(ctx, x):
    axis = ctx.attr_i("axis", -1 if ctx.opset >= 13 else 1)
    xa = jnp.asarray(x)
    if ctx.opset >= 13:
        return jax.nn.softmax(xa, axis=axis)
    # opset < 13: coerce to 2D at `axis`, softmax over flattened trailing dims
    shape = xa.shape
    axis = axis % len(shape)
    flat = xa.reshape(int(np.prod(shape[:axis])) if axis else 1, -1)
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


@op("LogSoftmax")
def _log_softmax(ctx, x):
    axis = ctx.attr_i("axis", -1 if ctx.opset >= 13 else 1)
    return jax.nn.log_softmax(jnp.asarray(x), axis=axis)


@op("LayerNormalization")
def _layer_norm(ctx, x, scale, bias=None):
    axis = ctx.attr_i("axis", -1)
    eps = ctx.attr_f("epsilon", 1e-5)
    xa = jnp.asarray(x)
    axes = tuple(range(axis % xa.ndim, xa.ndim))
    mean = jnp.mean(xa, axis=axes, keepdims=True)
    var = jnp.mean((xa - mean) ** 2, axis=axes, keepdims=True)
    out = (xa - mean) / jnp.sqrt(var + eps) * jnp.asarray(scale)
    if bias is not None:
        out = out + jnp.asarray(bias)
    if len(ctx.node.outputs) > 1:
        rstd = 1.0 / jnp.sqrt(var + eps)
        return out, mean, rstd
    return out


@op("InstanceNormalization")
def _instance_norm(ctx, x, scale, bias):
    eps = ctx.attr_f("epsilon", 1e-5)
    xa = jnp.asarray(x)
    axes = tuple(range(2, xa.ndim))
    mean = jnp.mean(xa, axis=axes, keepdims=True)
    var = jnp.mean((xa - mean) ** 2, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (xa.ndim - 2)
    return (xa - mean) / jnp.sqrt(var + eps) * jnp.asarray(scale).reshape(shape) + jnp.asarray(
        bias
    ).reshape(shape)


@op("GroupNormalization")
def _group_norm(ctx, x, scale, bias):
    eps = ctx.attr_f("epsilon", 1e-5)
    g = ctx.attr_i("num_groups")
    xa = jnp.asarray(x)
    n, c = xa.shape[:2]
    spatial = xa.shape[2:]
    xg = xa.reshape(n, g, c // g, *spatial)
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=axes, keepdims=True)
    out = ((xg - mean) / jnp.sqrt(var + eps)).reshape(xa.shape)
    shape = (1, -1) + (1,) * (xa.ndim - 2)
    sc, bi = jnp.asarray(scale), jnp.asarray(bias)
    if sc.shape[0] == g and g != c:  # opset-18 per-group affine
        sc = jnp.repeat(sc, c // g)
        bi = jnp.repeat(bi, c // g)
    return out * sc.reshape(shape) + bi.reshape(shape)


@op("BatchNormalization")
def _batch_norm(ctx, x, scale, bias, mean, var):
    eps = ctx.attr_f("epsilon", 1e-5)
    xa = jnp.asarray(x)
    shape = (1, -1) + (1,) * (xa.ndim - 2)
    return (xa - jnp.asarray(mean).reshape(shape)) / jnp.sqrt(
        jnp.asarray(var).reshape(shape) + eps
    ) * jnp.asarray(scale).reshape(shape) + jnp.asarray(bias).reshape(shape)


@op("LpNormalization")
def _lp_norm(ctx, x):
    axis = ctx.attr_i("axis", -1)
    p = ctx.attr_i("p", 2)
    xa = jnp.asarray(x)
    if p == 2:
        denom = jnp.sqrt(jnp.sum(xa * xa, axis=axis, keepdims=True))
    else:
        denom = jnp.sum(jnp.abs(xa), axis=axis, keepdims=True)
    return xa / denom


# ============================================================ convolution


def _conv_dims(rank: int):
    spatial = "DHW"[3 - (rank - 2) :]
    return ("NC" + spatial, "OI" + spatial, "NC" + spatial)


def _resolve_pads(ctx, x_shape, k_eff, strides, n_spatial):
    auto = ctx.attr_s("auto_pad", "NOTSET")
    if auto in ("NOTSET", ""):
        pads = ctx.attr_ints("pads", [0] * (2 * n_spatial))
        return [(pads[i], pads[n_spatial + i]) for i in range(n_spatial)]
    if auto == "VALID":
        return [(0, 0)] * n_spatial
    out = []
    for i in range(n_spatial):
        in_dim = x_shape[2 + i]
        out_dim = -(-in_dim // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + k_eff[i] - in_dim)
        if auto == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        else:
            out.append((total - total // 2, total // 2))
    return out


@op("Conv")
def _conv(ctx, x, w, b=None):
    xa, wa = jnp.asarray(x), jnp.asarray(w)
    n_spatial = xa.ndim - 2
    strides = ctx.attr_ints("strides", [1] * n_spatial)
    dilations = ctx.attr_ints("dilations", [1] * n_spatial)
    group = ctx.attr_i("group", 1)
    k_eff = [(wa.shape[2 + i] - 1) * dilations[i] + 1 for i in range(n_spatial)]
    pads = _resolve_pads(ctx, xa.shape, k_eff, strides, n_spatial)
    out = lax.conv_general_dilated(
        xa,
        wa,
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dims(xa.ndim),
        feature_group_count=group,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * n_spatial)
    return out


@op("ConvTranspose")
def _conv_transpose(ctx, x, w, b=None):
    xa, wa = jnp.asarray(x), jnp.asarray(w)
    n_spatial = xa.ndim - 2
    strides = ctx.attr_ints("strides", [1] * n_spatial)
    dilations = ctx.attr_ints("dilations", [1] * n_spatial)
    group = ctx.attr_i("group", 1)
    output_padding = ctx.attr_ints("output_padding", [0] * n_spatial)
    k = [wa.shape[2 + i] for i in range(n_spatial)]
    k_eff = [(k[i] - 1) * dilations[i] + 1 for i in range(n_spatial)]

    auto = ctx.attr_s("auto_pad", "NOTSET")
    output_shape = ctx.attr_ints("output_shape")
    if output_shape is not None or auto not in ("NOTSET", ""):
        # resolve pads from requested output size (SAME_* => out = in*stride)
        pads = []
        for i in range(n_spatial):
            in_dim = xa.shape[2 + i]
            want = (
                output_shape[i]
                if output_shape is not None
                else in_dim * strides[i]
            )
            total = strides[i] * (in_dim - 1) + output_padding[i] + k_eff[i] - want
            total = max(total, 0)
            # spec: only SAME_UPPER puts the extra odd pad at the END;
            # SAME_LOWER *and* NOTSET-with-output_shape put it at the START
            if auto == "SAME_UPPER":
                pads.append((total // 2, total - total // 2))
            else:
                pads.append((total - total // 2, total // 2))
    else:
        p = ctx.attr_ints("pads", [0] * (2 * n_spatial))
        pads = [(p[i], p[n_spatial + i]) for i in range(n_spatial)]

    # ONNX ConvTranspose weight is (C_in, C_out/group, *k). Lower to a
    # fractionally-strided conv: flip spatial dims, regroup to (C_out, C_in/g).
    wa = jnp.flip(wa, axis=tuple(range(2, wa.ndim)))
    c_in, c_out_g = wa.shape[0], wa.shape[1]
    wa = wa.reshape(group, c_in // group, c_out_g, *k)
    wa = jnp.moveaxis(wa, 2, 1).reshape(group * c_out_g, c_in // group, *k)

    conv_pads = [
        (k_eff[i] - 1 - pads[i][0], k_eff[i] - 1 - pads[i][1] + output_padding[i])
        for i in range(n_spatial)
    ]
    out = lax.conv_general_dilated(
        xa,
        wa,
        window_strides=[1] * n_spatial,
        padding=conv_pads,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=_conv_dims(xa.ndim),
        feature_group_count=group,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * n_spatial)
    return out


# ============================================================ pooling


@op("GlobalAveragePool")
def _global_avg_pool(ctx, x):
    xa = jnp.asarray(x)
    return jnp.mean(xa, axis=tuple(range(2, xa.ndim)), keepdims=True)


@op("GlobalMaxPool")
def _global_max_pool(ctx, x):
    xa = jnp.asarray(x)
    return jnp.max(xa, axis=tuple(range(2, xa.ndim)), keepdims=True)


def _pool_out_shape(in_dim, k_eff, stride, lo, hi, ceil_mode):
    num = in_dim + lo + hi - k_eff
    if ceil_mode:
        return -(-num // stride) + 1
    return num // stride + 1


@op("MaxPool")
def _max_pool(ctx, x):
    xa = jnp.asarray(x)
    n_spatial = xa.ndim - 2
    kernel = ctx.attr_ints("kernel_shape")
    strides = ctx.attr_ints("strides", [1] * n_spatial)
    dilations = ctx.attr_ints("dilations", [1] * n_spatial)
    ceil_mode = ctx.attr_i("ceil_mode", 0)
    k_eff = [(kernel[i] - 1) * dilations[i] + 1 for i in range(n_spatial)]
    pads = _resolve_pads(ctx, xa.shape, k_eff, strides, n_spatial)
    if ceil_mode:
        pads = [
            (
                lo,
                hi
                + (
                    (_pool_out_shape(xa.shape[2 + i], k_eff[i], strides[i], lo, hi, 1) - 1)
                    * strides[i]
                    + k_eff[i]
                    - (xa.shape[2 + i] + lo + hi)
                ),
            )
            for i, (lo, hi) in enumerate(pads)
        ]
    neg = jnp.finfo(xa.dtype).min if jnp.issubdtype(xa.dtype, jnp.floating) else jnp.iinfo(xa.dtype).min
    return lax.reduce_window(
        xa,
        neg,
        lax.max,
        (1, 1) + tuple(kernel),
        (1, 1) + tuple(strides),
        [(0, 0), (0, 0)] + pads,
        window_dilation=(1, 1) + tuple(dilations),
    )


@op("AveragePool")
def _avg_pool(ctx, x):
    xa = jnp.asarray(x)
    n_spatial = xa.ndim - 2
    kernel = ctx.attr_ints("kernel_shape")
    strides = ctx.attr_ints("strides", [1] * n_spatial)
    dilations = ctx.attr_ints("dilations", [1] * n_spatial)
    ceil_mode = ctx.attr_i("ceil_mode", 0)
    include_pad = ctx.attr_i("count_include_pad", 0)
    k_eff = [(kernel[i] - 1) * dilations[i] + 1 for i in range(n_spatial)]
    pads = _resolve_pads(ctx, xa.shape, k_eff, strides, n_spatial)
    explicit_pads = pads
    if ceil_mode:  # extend the END pad so the last partial window emits
        pads = [
            (
                lo,
                hi
                + (
                    (_pool_out_shape(xa.shape[2 + i], k_eff[i], strides[i], lo, hi, 1) - 1)
                    * strides[i]
                    + k_eff[i]
                    - (xa.shape[2 + i] + lo + hi)
                ),
            )
            for i, (lo, hi) in enumerate(pads)
        ]
    full_pads = [(0, 0), (0, 0)] + pads
    window = (1, 1) + tuple(kernel)
    win_strides = (1, 1) + tuple(strides)
    win_dil = (1, 1) + tuple(dilations)
    summed = lax.reduce_window(xa, 0.0, lax.add, window, win_strides, full_pads,
                               window_dilation=win_dil)
    if include_pad and not ceil_mode:
        return summed / float(np.prod(kernel))
    # count_include_pad counts EXPLICIT padding but never the ceil-mode
    # extension; build the count window over ones padded accordingly
    if include_pad:
        ones_shape = list(xa.shape)
        for i in range(n_spatial):
            ones_shape[2 + i] += explicit_pads[i][0] + explicit_pads[i][1]
        ones = jnp.ones(ones_shape, xa.dtype)
        count_pads = [(0, 0), (0, 0)] + [
            (0, pads[i][1] - explicit_pads[i][1]) for i in range(n_spatial)
        ]
    else:
        ones = jnp.ones(xa.shape, xa.dtype)
        count_pads = full_pads
    counts = lax.reduce_window(ones, 0.0, lax.add, window, win_strides,
                               count_pads, window_dilation=win_dil)
    return summed / counts


# ============================================================ resize


@op("Resize")
def _resize(ctx, x, *rest):
    xa = jnp.asarray(x)
    mode = ctx.attr_s("mode", "nearest")
    coord = ctx.attr_s("coordinate_transformation_mode", "half_pixel")
    nearest_mode = ctx.attr_s("nearest_mode", "round_prefer_floor")
    # silently ignoring these knobs produced silently-different samples —
    # unsupported variants must raise like every other op's (review r3)
    if nearest_mode not in ("round_prefer_floor", "round_prefer_ceil",
                            "floor", "ceil"):
        raise NotImplementedError(f"Resize nearest_mode {nearest_mode!r}")
    if ctx.attr_i("antialias", 0):
        raise NotImplementedError("Resize antialias")
    if ctx.attr_i("exclude_outside", 0):
        raise NotImplementedError("Resize exclude_outside")
    if ctx.attr_ints("axes") is not None:
        raise NotImplementedError(
            "Resize axes (per-rank scales/sizes assumed)")
    # inputs: X, roi?, scales?, sizes?
    scales_v = ctx.static_input(2) if len(ctx.node.inputs) > 2 else None
    sizes_v = ctx.static_input(3) if len(ctx.node.inputs) > 3 else None
    in_shape = xa.shape
    if sizes_v is not None and np.size(sizes_v):
        out_shape = [int(s) for s in sizes_v]
        scales = [out_shape[i] / in_shape[i] for i in range(xa.ndim)]
    elif scales_v is not None and np.size(scales_v):
        scales = [float(s) for s in scales_v]
        out_shape = [int(math.floor(in_shape[i] * scales[i])) for i in range(xa.ndim)]
    else:
        raise NotImplementedError("Resize: neither scales nor sizes given")

    out = xa
    for axis in range(xa.ndim):
        if out_shape[axis] == in_shape[axis]:
            continue
        out = _resize_axis(
            out, axis, in_shape[axis], out_shape[axis], scales[axis], mode, coord, nearest_mode
        )
    return out


def _src_coords(out_dim, in_dim, scale, coord):
    i = np.arange(out_dim, dtype=np.float64)
    if coord == "half_pixel":
        return (i + 0.5) / scale - 0.5
    if coord == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if out_dim > 1 else np.zeros_like(i)
    if coord == "asymmetric":
        return i / scale
    if coord == "align_corners":
        return i * (in_dim - 1) / max(out_dim - 1, 1)
    raise NotImplementedError(f"Resize coordinate mode {coord}")


def _resize_axis(x, axis, in_dim, out_dim, scale, mode, coord, nearest_mode):
    src = _src_coords(out_dim, in_dim, scale, coord)
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = np.floor(src)
        elif nearest_mode == "ceil":
            idx = np.ceil(src)
        elif nearest_mode == "round_prefer_ceil":
            idx = np.floor(src + 0.5)
        else:  # round_prefer_floor
            idx = np.ceil(src - 0.5)
        idx = np.clip(idx, 0, in_dim - 1).astype(np.int32)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    if mode == "linear":
        lo = np.clip(np.floor(src), 0, in_dim - 1).astype(np.int32)
        hi = np.clip(lo + 1, 0, in_dim - 1)
        w = np.clip(src - lo, 0.0, 1.0).astype(np.float32)
        shape = [1] * x.ndim
        shape[axis] = out_dim
        wj = jnp.asarray(w).reshape(shape)
        a = jnp.take(x, jnp.asarray(lo), axis=axis)
        b = jnp.take(x, jnp.asarray(hi), axis=axis)
        return a * (1 - wj) + b * wj
    raise NotImplementedError(f"Resize mode {mode}")


# ============================================================ recurrence
# EnCodec-class codecs carry LSTM bottlenecks; implemented with lax.scan so
# imported graphs with recurrence still compile to one XLA program.


def _rnn_directions(ctx, w, r, b, seq_len, batch, hidden, n_gates):
    num_dir = w.shape[0]
    if b is None:
        b = jnp.zeros((num_dir, 2 * n_gates * hidden), w.dtype)
    return num_dir, jnp.asarray(b)


@op("LSTM")
def _lstm(ctx, x, w, r, b=None, seq_lens=None, init_h=None, init_c=None, p=None):
    """ONNX LSTM, default activations (sigmoid/tanh/tanh), iofc gate order.
    x: (T, B, I); W: (D, 4H, I); R: (D, 4H, H); B: (D, 8H)."""
    if ctx.attrs.get("activations") is not None:
        acts = [s.decode().lower() for s in ctx.attrs["activations"].strings]
        # the implementation hard-codes the default sigmoid/tanh/tanh per
        # direction — membership in {sigmoid, tanh} is NOT enough (e.g.
        # all-tanh gates passed the old guard and silently ran sigmoid
        # gates, review r3)
        if acts != ["sigmoid", "tanh", "tanh"] * (len(acts) // 3):
            raise NotImplementedError(f"LSTM non-default activations {acts}")
    if ctx.attr_f("clip") is not None:
        raise NotImplementedError("LSTM clip (pre-activation clipping)")
    if ctx.attr_i("input_forget", 0):
        raise NotImplementedError("LSTM input_forget coupling")
    if p is not None:
        raise NotImplementedError("LSTM peepholes")
    if seq_lens is not None:
        raise NotImplementedError(
            "LSTM sequence_lens (per-sequence lengths would be silently "
            "ignored — pad-and-mask outside the graph instead)")
    if ctx.attr_i("layout", 0):
        raise NotImplementedError("LSTM layout=1 (batch-major)")
    direction = ctx.attr_s("direction", "forward")
    hidden = ctx.attr_i("hidden_size")
    xa, wa, ra = jnp.asarray(x), jnp.asarray(w), jnp.asarray(r)
    t_len, batch, _ = xa.shape
    num_dir, ba = _rnn_directions(ctx, wa, ra, b, t_len, batch, hidden, 4)
    wb, rb = ba[:, : 4 * hidden], ba[:, 4 * hidden :]

    h0 = (jnp.zeros((num_dir, batch, hidden), xa.dtype)
          if init_h is None else jnp.asarray(init_h))
    c0 = (jnp.zeros((num_dir, batch, hidden), xa.dtype)
          if init_c is None else jnp.asarray(init_c))

    def run_dir(d, reverse):
        xs = jnp.flip(xa, 0) if reverse else xa
        # hoist the input projection out of the scan: one big matmul (MXU)
        gates_x = xs @ wa[d].T + wb[d]

        def step(carry, gx):
            h, c = carry
            g = gx + h @ ra[d].T + rb[d]
            i, o, f, cand = jnp.split(g, 4, axis=-1)  # ONNX iofc order
            i, o, f = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jax.nn.sigmoid(f)
            c = f * c + i * jnp.tanh(cand)
            h = o * jnp.tanh(c)
            return (h, c), h

        (h_fin, c_fin), hs = lax.scan(step, (h0[d], c0[d]), gates_x)
        if reverse:
            hs = jnp.flip(hs, 0)
        return hs, h_fin, c_fin

    if direction == "bidirectional":
        f_hs, f_h, f_c = run_dir(0, False)
        b_hs, b_h, b_c = run_dir(1, True)
        y = jnp.stack([f_hs, b_hs], 1)          # (T, 2, B, H)
        y_h = jnp.stack([f_h, b_h], 0)
        y_c = jnp.stack([f_c, b_c], 0)
    else:
        hs, h_fin, c_fin = run_dir(0, direction == "reverse")
        y = hs[:, None]
        y_h, y_c = h_fin[None], c_fin[None]
    return y, y_h, y_c


@op("GRU")
def _gru(ctx, x, w, r, b=None, seq_lens=None, init_h=None):
    """ONNX GRU, zrh gate order, default activations; x (T,B,I)."""
    if ctx.attrs.get("activations") is not None:
        acts = [a.decode().lower() for a in ctx.attrs["activations"].strings]
        if acts != ["sigmoid", "tanh"] * (len(acts) // 2):
            raise NotImplementedError(f"GRU non-default activations {acts}")
    if ctx.attr_f("clip") is not None:
        raise NotImplementedError("GRU clip (pre-activation clipping)")
    if seq_lens is not None:
        raise NotImplementedError(
            "GRU sequence_lens (per-sequence lengths would be silently "
            "ignored — pad-and-mask outside the graph instead)")
    if ctx.attr_i("layout", 0):
        raise NotImplementedError("GRU layout=1 (batch-major)")
    direction = ctx.attr_s("direction", "forward")
    hidden = ctx.attr_i("hidden_size")
    lbr = ctx.attr_i("linear_before_reset", 0)
    xa, wa, ra = jnp.asarray(x), jnp.asarray(w), jnp.asarray(r)
    t_len, batch, _ = xa.shape
    num_dir, ba = _rnn_directions(ctx, wa, ra, b, t_len, batch, hidden, 3)
    wb, rb = ba[:, : 3 * hidden], ba[:, 3 * hidden :]
    h0 = (jnp.zeros((num_dir, batch, hidden), xa.dtype)
          if init_h is None else jnp.asarray(init_h))

    def run_dir(d, reverse):
        xs = jnp.flip(xa, 0) if reverse else xa
        gates_x = xs @ wa[d].T + wb[d]
        rz_r, rh_r = ra[d][: 2 * hidden], ra[d][2 * hidden :]
        rbz, rbh = rb[d][: 2 * hidden], rb[d][2 * hidden :]

        def step(h, gx):
            zr_x, hx = gx[..., : 2 * hidden], gx[..., 2 * hidden :]
            zr = jax.nn.sigmoid(zr_x + h @ rz_r.T + rbz)
            z, rgate = zr[..., :hidden], zr[..., hidden:]
            if lbr:
                hh = jnp.tanh(hx + rgate * (h @ rh_r.T + rbh))
            else:
                hh = jnp.tanh(hx + (rgate * h) @ rh_r.T + rbh)
            h_new = (1 - z) * hh + z * h
            return h_new, h_new

        h_fin, hs = lax.scan(step, h0[d], gates_x)
        if reverse:
            hs = jnp.flip(hs, 0)
        return hs, h_fin

    if direction == "bidirectional":
        f_hs, f_h = run_dir(0, False)
        b_hs, b_h = run_dir(1, True)
        y = jnp.stack([f_hs, b_hs], 1)
        y_h = jnp.stack([f_h, b_h], 0)
    else:
        hs, h_fin = run_dir(0, direction == "reverse")
        y = hs[:, None]
        y_h = h_fin[None]
    return y, y_h


@op("Upsample")  # deprecated alias of Resize (opset 9)
def _upsample(ctx, x, scales=None):
    xa = jnp.asarray(x)
    mode = ctx.attr_s("mode", "nearest")
    if scales is None:
        sc = ctx.attr_floats("scales")
    else:
        sc = [float(s) for s in ctx.static_input(1)]
    out = xa
    for axis in range(xa.ndim):
        out_dim = int(math.floor(xa.shape[axis] * sc[axis]))
        if out_dim == xa.shape[axis]:
            continue
        out = _resize_axis(
            out, axis, xa.shape[axis], out_dim, sc[axis],
            "nearest" if mode == "nearest" else "linear", "asymmetric", "floor",
        )
    return out
