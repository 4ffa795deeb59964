"""Minimal ONNX -> JAX executor (no onnx/onnxruntime dependency).

Purpose: load a LOCAL learned-VAD checkpoint (Silero-VAD ships as ONNX,
reference ``stt_server/backend/component/vad_gate.py:235-247``) and run it
as a jitted XLA program. The image has neither ``onnx`` nor
``onnxruntime``, so this module does both halves first-party:

1. a hand-rolled protobuf wire-format reader for the ONNX schema subset
   (ModelProto/GraphProto/NodeProto/TensorProto/AttributeProto — field
   numbers from the public onnx.proto spec), and
2. a graph interpreter over the op set Silero-class models use (Conv,
   LSTM, Gemm/MatMul, elementwise, shape ops, reflection Pad, If, ...),
   emitting jax.numpy/lax calls, so tracing the interpreter under
   ``jax.jit`` compiles the whole graph into one XLA program.

Constant folding: values derived only from initializers/attributes (e.g.
Silero's sample-rate switch) are kept as numpy and folded at trace time —
an ``If`` whose condition is constant selects its branch eagerly, which is
exactly how Silero's 8k/16k dispatch resolves when sr is fixed.

Validated against torch-exported ONNX graphs (``tests/test_onnx_jax.py``),
including a Silero-v5-shaped conv+LSTM+sigmoid network.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Protobuf wire-format reader
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_fields(buf: bytes) -> Dict[int, List[Tuple[int, Any]]]:
    """Decode one message into {field_no: [(wire_type, raw_value), ...]}."""
    fields: Dict[int, List[Tuple[int, Any]]] = {}
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            val = buf[pos:pos + length]
            pos += length
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:  # pragma: no cover - groups are not used by ONNX
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field_no, []).append((wire, val))
    return fields


def _get_bytes(fields, no, default=b"") -> bytes:
    vals = fields.get(no)
    return vals[-1][1] if vals else default


def _get_str(fields, no, default="") -> str:
    return _get_bytes(fields, no, default.encode()).decode("utf-8", "replace")


def _get_int(fields, no, default=0) -> int:
    vals = fields.get(no)
    return vals[-1][1] if vals else default


def _signed(v: int) -> int:
    """Protobuf int64 varints are two's-complement over 64 bits."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_ints(fields, no) -> List[int]:
    out: List[int] = []
    for wire, val in fields.get(no, []):
        if wire == 0:
            out.append(_signed(val))
        else:  # packed
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                out.append(_signed(v))
    return out


def _packed_floats(fields, no) -> List[float]:
    out: List[float] = []
    for wire, val in fields.get(no, []):
        if wire == 5:
            out.append(struct.unpack("<f", val)[0])
        else:
            out.extend(np.frombuffer(val, "<f4").tolist())
    return out


# ONNX TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    f = _parse_fields(buf)
    dims = _packed_ints(f, 1)
    dtype = _DTYPES.get(_get_int(f, 2, 1), np.float32)
    name = _get_str(f, 8)
    raw = _get_bytes(f, 9)
    if raw:
        arr = np.frombuffer(raw, dtype=dtype)
    elif 4 in f:
        arr = np.asarray(_packed_floats(f, 4), np.float32)
    elif 7 in f:
        arr = np.asarray(_packed_ints(f, 7), np.int64)
    elif 5 in f:
        arr = np.asarray(_packed_ints(f, 5), np.int32).astype(dtype)
    else:
        arr = np.zeros(0, dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


@dataclass
class OnnxAttr:
    name: str
    value: Any


def _parse_attribute(buf: bytes) -> OnnxAttr:
    f = _parse_fields(buf)
    name = _get_str(f, 1)
    atype = _get_int(f, 20, 0)
    if atype == 1:    # FLOAT
        return OnnxAttr(name, struct.unpack("<f", _get_bytes(f, 2))[0])
    if atype == 2:    # INT
        return OnnxAttr(name, _signed(_get_int(f, 3)))
    if atype == 3:    # STRING
        return OnnxAttr(name, _get_bytes(f, 4).decode("utf-8", "replace"))
    if atype == 4:    # TENSOR
        return OnnxAttr(name, _parse_tensor(_get_bytes(f, 5))[1])
    if atype == 5:    # GRAPH
        return OnnxAttr(name, _parse_graph(_get_bytes(f, 6)))
    if atype == 6:    # FLOATS
        return OnnxAttr(name, _packed_floats(f, 7))
    if atype == 7:    # INTS
        return OnnxAttr(name, _packed_ints(f, 8))
    if atype == 8:    # STRINGS
        return OnnxAttr(name, [v.decode() for _, v in f.get(9, [])])
    return OnnxAttr(name, None)


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, Any]
    name: str = ""


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    inputs: List[str]               # non-initializer graph inputs, in order
    outputs: List[str]
    input_shapes: Dict[str, List[Optional[int]]] = field(default_factory=dict)


def _parse_value_info(buf: bytes) -> Tuple[str, List[Optional[int]]]:
    f = _parse_fields(buf)
    name = _get_str(f, 1)
    shape: List[Optional[int]] = []
    type_buf = _get_bytes(f, 2)
    if type_buf:
        tf = _parse_fields(type_buf)
        tensor_buf = _get_bytes(tf, 1)
        if tensor_buf:
            ttf = _parse_fields(tensor_buf)
            shape_buf = _get_bytes(ttf, 2)
            if shape_buf:
                sf = _parse_fields(shape_buf)
                for _, dim_buf in sf.get(1, []):
                    df = _parse_fields(dim_buf)
                    if 1 in df:
                        shape.append(_get_int(df, 1))
                    else:
                        shape.append(None)  # symbolic dim
    return name, shape


def _parse_graph(buf: bytes) -> OnnxGraph:
    f = _parse_fields(buf)
    nodes = []
    for _, node_buf in f.get(1, []):
        nf = _parse_fields(node_buf)
        nodes.append(OnnxNode(
            op_type=_get_str(nf, 4),
            inputs=[v.decode() for _, v in nf.get(1, [])],
            outputs=[v.decode() for _, v in nf.get(2, [])],
            attrs={
                a.name: a.value
                for a in (_parse_attribute(v) for _, v in nf.get(5, []))
            },
            name=_get_str(nf, 3),
        ))
    initializers = dict(
        _parse_tensor(v) for _, v in f.get(5, [])
    )
    inputs = []
    input_shapes: Dict[str, List[Optional[int]]] = {}
    for _, vi_buf in f.get(11, []):
        name, shape = _parse_value_info(vi_buf)
        if name not in initializers:
            inputs.append(name)
            input_shapes[name] = shape
    outputs = [_parse_value_info(v)[0] for _, v in f.get(12, [])]
    return OnnxGraph(nodes, initializers, inputs, outputs, input_shapes)


def load_onnx_graph(path: str) -> OnnxGraph:
    """Parse a .onnx file's graph (ModelProto.graph is field 7)."""
    with open(path, "rb") as fh:
        model = _parse_fields(fh.read())
    return _parse_graph(_get_bytes(model, 7))


# ---------------------------------------------------------------------------
# Graph interpreter (jit-traceable)
# ---------------------------------------------------------------------------


def _is_np(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float)) for v in vals)


def _xp(*vals):
    """numpy for constant-only subexpressions (folds at trace time),
    jax.numpy as soon as a traced value is involved."""
    if _is_np(*vals):
        return np
    import jax.numpy as jnp

    return jnp


def _conv(x, w, b, attrs):
    import jax.numpy as jnp
    from jax import lax

    strides = attrs.get("strides") or [1] * (x.ndim - 2)
    dil = attrs.get("dilations") or [1] * (x.ndim - 2)
    groups = int(attrs.get("group", 1) or 1)
    pads = attrs.get("pads")
    n_spatial = x.ndim - 2
    if pads:
        padding = [
            (int(pads[i]), int(pads[i + n_spatial])) for i in range(n_spatial)
        ]
    else:
        padding = [(0, 0)] * n_spatial
    # ONNX layout: x NC(spatial), w OI(spatial)
    letters = "DHW"[-n_spatial:] if n_spatial <= 3 else None
    if letters is None:  # pragma: no cover
        raise ValueError("conv with >3 spatial dims")
    lhs_spec = "NC" + letters
    rhs_spec = "OI" + letters
    out = lax.conv_general_dilated(
        jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32),
        window_strides=[int(s) for s in strides],
        padding=padding,
        rhs_dilation=[int(d) for d in dil],
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + jnp.asarray(b, jnp.float32).reshape(
            (1, -1) + (1,) * n_spatial
        )
    return out


def _lstm(env, node):
    """ONNX LSTM (single layer, forward): gate order i, o, f, c."""
    import jax.numpy as jnp
    from jax import lax

    ins = node.inputs
    x = jnp.asarray(env[ins[0]], jnp.float32)       # (T, B, I)
    w = jnp.asarray(env[ins[1]], jnp.float32)[0]    # (4H, I)
    r = jnp.asarray(env[ins[2]], jnp.float32)[0]    # (4H, H)
    hidden = r.shape[1]
    b_name = ins[3] if len(ins) > 3 and ins[3] else None
    if b_name:
        bb = jnp.asarray(env[b_name], jnp.float32)[0]  # (8H,)
        bias = bb[:4 * hidden] + bb[4 * hidden:]
    else:
        bias = jnp.zeros(4 * hidden, jnp.float32)
    batch = x.shape[1]
    h0_name = ins[5] if len(ins) > 5 and ins[5] else None
    c0_name = ins[6] if len(ins) > 6 and ins[6] else None
    h0 = (
        jnp.asarray(env[h0_name], jnp.float32)[0]
        if h0_name else jnp.zeros((batch, hidden), jnp.float32)
    )
    c0 = (
        jnp.asarray(env[c0_name], jnp.float32)[0]
        if c0_name else jnp.zeros((batch, hidden), jnp.float32)
    )

    def step(carry, xt):
        h, c = carry
        gates = xt @ w.T + h @ r.T + bias
        i_g, o_g, f_g, c_g = jnp.split(gates, 4, axis=-1)
        i_g = 1.0 / (1.0 + jnp.exp(-i_g))
        o_g = 1.0 / (1.0 + jnp.exp(-o_g))
        f_g = 1.0 / (1.0 + jnp.exp(-f_g))
        c_new = f_g * c + i_g * jnp.tanh(c_g)
        h_new = o_g * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_n, c_n), ys = lax.scan(step, (h0, c0), x)
    outs = node.outputs
    if outs and outs[0]:
        env[outs[0]] = ys[:, None, :, :]            # (T, 1, B, H)
    if len(outs) > 1 and outs[1]:
        env[outs[1]] = h_n[None]                    # (1, B, H)
    if len(outs) > 2 and outs[2]:
        env[outs[2]] = c_n[None]


def _pad(x, pads, mode, value):
    xp = _xp(x)
    n = x.ndim
    pairs = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    if mode == "reflect":
        return xp.pad(x, pairs, mode="reflect")
    if mode == "edge":
        return xp.pad(x, pairs, mode="edge")
    return xp.pad(x, pairs, mode="constant", constant_values=value)


def _slice_op(env, node):
    x = env[node.inputs[0]]
    if len(node.inputs) > 1:  # opset >= 10: runtime inputs
        starts = np.asarray(env[node.inputs[1]]).tolist()
        ends = np.asarray(env[node.inputs[2]]).tolist()
        axes = (
            np.asarray(env[node.inputs[3]]).tolist()
            if len(node.inputs) > 3 and node.inputs[3]
            else list(range(len(starts)))
        )
        steps = (
            np.asarray(env[node.inputs[4]]).tolist()
            if len(node.inputs) > 4 and node.inputs[4]
            else [1] * len(starts)
        )
    else:  # opset 1: attributes
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes") or list(range(len(starts)))
        steps = [1] * len(starts)
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % x.ndim
        big = int(np.iinfo(np.int64).max)
        st, en = int(st), int(en)
        en = None if en >= big else en
        slices[ax] = slice(st, en, int(sp))
    return x[tuple(slices)]


def _axes_arg(env, node, attr="axes", input_idx=1):
    if attr in node.attrs and node.attrs[attr] is not None:
        return [int(a) for a in node.attrs[attr]]
    if len(node.inputs) > input_idx and node.inputs[input_idx]:
        return [int(a) for a in np.asarray(env[node.inputs[input_idx]])]
    return None


def run_graph(
    graph: OnnxGraph, env: Dict[str, Any]
) -> List[Any]:
    """Execute nodes in graph order; env maps input names -> arrays
    (numpy constants fold, traced jax values compile). Returns outputs."""
    env = dict(env)
    for name, arr in graph.initializers.items():
        env.setdefault(name, arr)
    env[""] = None

    for node in graph.nodes:
        op = node.op_type
        ins = [env[n] if n else None for n in node.inputs]
        a = node.attrs
        if op == "Constant":
            out = a.get("value")
            if out is None and "value_float" in a:
                out = np.float32(a["value_float"])
            if out is None and "value_int" in a:
                out = np.int64(a["value_int"])
        elif op == "Conv":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == "LSTM":
            _lstm(env, node)
            continue
        elif op == "Gemm":
            x, w = ins[0], ins[1]
            if int(a.get("transA", 0)):
                x = x.T
            if int(a.get("transB", 0)):
                w = w.T
            out = float(a.get("alpha", 1.0)) * (x @ w)
            if len(ins) > 2 and ins[2] is not None:
                out = out + float(a.get("beta", 1.0)) * ins[2]
        elif op == "MatMul":
            out = ins[0] @ ins[1]
        elif op in ("Add", "Sub", "Mul", "Div", "Pow"):
            xp = _xp(*ins)
            fn = {"Add": xp.add, "Sub": xp.subtract, "Mul": xp.multiply,
                  "Div": xp.divide, "Pow": xp.power}[op]
            out = fn(ins[0], ins[1])
        elif op == "Sqrt":
            out = _xp(*ins).sqrt(ins[0])
        elif op == "Exp":
            out = _xp(*ins).exp(ins[0])
        elif op == "Log":
            out = _xp(*ins).log(ins[0])
        elif op == "Neg":
            out = -ins[0]
        elif op == "Abs":
            out = _xp(*ins).abs(ins[0])
        elif op == "Relu":
            out = _xp(*ins).maximum(ins[0], 0)
        elif op == "Sigmoid":
            xp = _xp(*ins)
            out = 1.0 / (1.0 + xp.exp(-ins[0]))
        elif op == "Tanh":
            out = _xp(*ins).tanh(ins[0])
        elif op == "Softmax":
            import jax

            out = jax.nn.softmax(ins[0], axis=int(a.get("axis", -1)))
        elif op == "Concat":
            xp = _xp(*[i for i in ins if i is not None])
            out = xp.concatenate(
                [i for i in ins if i is not None], axis=int(a.get("axis", 0))
            )
        elif op == "Slice":
            out = _slice_op(env, node)
        elif op == "Squeeze":
            axes = _axes_arg(env, node)
            xp = _xp(ins[0])
            out = (
                xp.squeeze(ins[0], axis=tuple(int(x) for x in axes))
                if axes else xp.squeeze(ins[0])
            )
        elif op == "Unsqueeze":
            axes = _axes_arg(env, node) or [0]
            out = ins[0]
            for ax in sorted(int(x) for x in axes):
                out = _xp(out).expand_dims(out, axis=ax)
        elif op == "Reshape":
            shape = [int(s) for s in np.asarray(env[node.inputs[1]])]
            out = ins[0].reshape(shape)
        elif op == "Transpose":
            perm = a.get("perm")
            out = (
                ins[0].transpose(perm) if perm is not None else ins[0].T
            )
        elif op == "Flatten":
            ax = int(a.get("axis", 1))
            lead = int(np.prod(ins[0].shape[:ax])) if ax else 1
            out = ins[0].reshape(lead, -1)
        elif op == "Pad":
            if len(node.inputs) > 1 and node.inputs[1]:
                pads = [int(p) for p in np.asarray(env[node.inputs[1]])]
                value = (
                    float(np.asarray(env[node.inputs[2]]))
                    if len(node.inputs) > 2 and node.inputs[2] else 0.0
                )
            else:
                pads = [int(p) for p in a.get("pads", [])]
                value = float(a.get("value", 0.0))
            mode = a.get("mode", "constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            out = _pad(ins[0], pads, mode, value)
        elif op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
            axes = _axes_arg(env, node)
            keep = bool(int(a.get("keepdims", 1)))
            xp = _xp(ins[0])
            fn = {"ReduceMean": xp.mean, "ReduceSum": xp.sum,
                  "ReduceMax": xp.max, "ReduceMin": xp.min}[op]
            out = fn(
                ins[0],
                axis=tuple(int(x) for x in axes) if axes else None,
                keepdims=keep,
            )
        elif op == "Cast":
            to = _DTYPES.get(int(a.get("to", 1)), np.float32)
            out = _xp(ins[0]).asarray(ins[0]).astype(to)
        elif op == "Shape":
            out = np.asarray(ins[0].shape, np.int64)
        elif op == "Gather":
            ax = int(a.get("axis", 0))
            xp = _xp(*ins)
            out = xp.take(ins[0], xp.asarray(ins[1], np.int64), axis=ax)
        elif op == "ConstantOfShape":
            shape = [int(s) for s in np.asarray(ins[0])]
            value = a.get("value")
            fill = value.reshape(-1)[0] if value is not None else np.float32(0)
            out = np.full(shape, fill)
        elif op == "Expand":
            shape = [int(s) for s in np.asarray(env[node.inputs[1]])]
            out = _xp(ins[0]).broadcast_to(
                ins[0],
                tuple(
                    max(s, d) for s, d in zip(
                        shape, [1] * (len(shape) - ins[0].ndim)
                        + list(ins[0].shape)
                    )
                ),
            )
        elif op in ("Equal", "Greater", "Less"):
            xp = _xp(*ins)
            fn = {"Equal": xp.equal, "Greater": xp.greater,
                  "Less": xp.less}[op]
            out = fn(ins[0], ins[1])
        elif op == "Not":
            out = _xp(*ins).logical_not(ins[0])
        elif op == "Where":
            out = _xp(*ins).where(ins[0], ins[1], ins[2])
        elif op == "If":
            cond = bool(np.asarray(ins[0]))  # constant-folded (e.g. sr)
            branch = a["then_branch"] if cond else a["else_branch"]
            sub_out = run_graph(branch, env)
            for name, val in zip(node.outputs, sub_out):
                env[name] = val
            continue
        elif op in ("Identity", "Dropout"):
            out = ins[0]
        elif op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else a.get("min")
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else a.get("max")
            out = _xp(ins[0]).clip(ins[0], lo, hi)
        elif op == "LeakyRelu":
            alpha = float(a.get("alpha", 0.01))
            xp = _xp(ins[0])
            out = xp.where(ins[0] >= 0, ins[0], alpha * ins[0])
        elif op == "ReduceL2":
            axes = _axes_arg(env, node)
            keep = bool(int(a.get("keepdims", 1)))
            xp = _xp(ins[0])
            out = xp.sqrt(xp.sum(
                xp.square(ins[0]),
                axis=tuple(int(x) for x in axes) if axes else None,
                keepdims=keep,
            ))
        else:
            raise NotImplementedError(f"ONNX op not supported: {op}")
        env[node.outputs[0]] = out

    return [env[name] for name in graph.outputs]


__all__ = ["OnnxGraph", "OnnxNode", "load_onnx_graph", "run_graph"]
