"""Minimal ONNX protobuf codec — enough of the PUBLIC onnx.proto schema
(github.com/onnx/onnx/blob/main/onnx/onnx.proto) to write and read real
``.onnx`` model files without the onnx package installed.

The wire format is standard protobuf: each field is a varint tag
(field_number << 3 | wire_type) followed by a varint (wire type 0), a
64-bit scalar (1), a length-delimited blob (2), or a 32-bit scalar (5).
Field numbers below are copied from the public onnx.proto:

  ModelProto:    ir_version=1, producer_name=2, graph=7, opset_import=8
  OperatorSetId: domain=1, version=2
  GraphProto:    node=1, name=2, initializer=5, input=11, output=12
  NodeProto:     input=1, output=2, name=3, op_type=4, attribute=5
  AttributeProto: name=1, f=2, i=3, s=4, t=5, floats=7, ints=8, type=20
  TensorProto:   dims=1, data_type=2, int64_data=7, name=8, raw_data=9
  ValueInfoProto: name=1, type=2; TypeProto: tensor_type=1;
  TypeProto.Tensor: elem_type=1, shape=2; TensorShapeProto: dim=1;
  Dimension: dim_value=1, dim_param=2

Only the subset the tiny model zoo needs is implemented (float32 tensors
via raw_data, int/ints/float attributes); unknown fields are skipped on
read, so files written by real exporters still parse as long as they use
these node types.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

# AttributeProto.AttributeType enum values (public onnx.proto)
ATTR_FLOAT, ATTR_INT, ATTR_STRING, ATTR_TENSOR = 1, 2, 3, 4
ATTR_FLOATS, ATTR_INTS = 6, 7
# TensorProto.DataType
DT_FLOAT = 1
DT_INT64 = 7


# ------------------------------------------------------------------ encode


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1  # two's-complement for negative int64, per protobuf
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint(num << 3 | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _str_field(num: int, s: str) -> bytes:
    return _len_field(num, s.encode("utf-8"))


def _int_field(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v)


def _packed_ints(num: int, vals: list[int]) -> bytes:
    return _len_field(num, b"".join(_varint(v) for v in vals))


def encode_tensor(name: str, arr: np.ndarray) -> bytes:
    """TensorProto for a float32 or int64 tensor, data in raw_data
    (little-endian). int64 is needed for Resize ``sizes`` inputs, which
    real exporters emit as INT64 initializers."""
    arr = np.asarray(arr)
    if np.issubdtype(arr.dtype, np.integer):
        a = np.ascontiguousarray(arr, dtype=np.int64)
        dt, raw = DT_INT64, a.astype("<i8").tobytes()
    else:
        a = np.ascontiguousarray(arr, dtype=np.float32)
        dt, raw = DT_FLOAT, a.astype("<f4").tobytes()
    msg = _packed_ints(1, list(a.shape))
    msg += _int_field(2, dt)
    msg += _str_field(8, name)
    msg += _len_field(9, raw)
    return msg


def encode_attr(name: str, value: Any) -> bytes:
    msg = _str_field(1, name)
    if isinstance(value, float):
        msg += _field(2, 5) + struct.pack("<f", value) + _int_field(20, ATTR_FLOAT)
    elif isinstance(value, int):
        msg += _int_field(3, value) + _int_field(20, ATTR_INT)
    elif isinstance(value, str):
        msg += _len_field(4, value.encode("utf-8")) + _int_field(20, ATTR_STRING)
    elif isinstance(value, (list, tuple)) and all(isinstance(v, int) for v in value):
        msg += _packed_ints(8, list(value)) + _int_field(20, ATTR_INTS)
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return msg


def encode_node(
    op_type: str, inputs: list[str], outputs: list[str], name: str = "", **attrs: Any
) -> bytes:
    msg = b"".join(_str_field(1, i) for i in inputs)
    msg += b"".join(_str_field(2, o) for o in outputs)
    msg += _str_field(3, name or f"{op_type}_{outputs[0]}")
    msg += _str_field(4, op_type)
    msg += b"".join(_len_field(5, encode_attr(k, v)) for k, v in attrs.items())
    return msg


def _encode_value_info(name: str, dims: list[int | str]) -> bytes:
    dim_msgs = b""
    for d in dims:
        dim_msgs += _len_field(
            1, _int_field(1, d) if isinstance(d, int) else _str_field(2, d)
        )
    tensor_type = _int_field(1, DT_FLOAT) + _len_field(2, dim_msgs)
    return _str_field(1, name) + _len_field(2, _len_field(1, tensor_type))


def encode_model(
    graph_name: str,
    nodes: list[bytes],
    initializers: dict[str, np.ndarray],
    inputs: dict[str, list[int | str]],
    outputs: dict[str, list[int | str]],
    opset: int = 13,
) -> bytes:
    graph = b"".join(_len_field(1, n) for n in nodes)
    graph += _str_field(2, graph_name)
    graph += b"".join(
        _len_field(5, encode_tensor(k, v)) for k, v in initializers.items()
    )
    graph += b"".join(_len_field(11, _encode_value_info(k, d)) for k, d in inputs.items())
    graph += b"".join(_len_field(12, _encode_value_info(k, d)) for k, d in outputs.items())
    model = _int_field(1, 8)  # ir_version 8
    model += _str_field(2, "doctr-spark-tiny-zoo")
    model += _len_field(7, graph)
    model += _len_field(8, _str_field(1, "") + _int_field(2, opset))
    return model


# ------------------------------------------------------------------ decode


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _walk(buf: bytes) -> dict[int, list]:
    """Parse one message into {field_number: [raw values]} — varints as
    ints, length-delimited as bytes, 32/64-bit scalars as bytes."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(num, []).append(val)
    return fields


def _signed64(v: int) -> int:
    """Reinterpret a decoded varint as int64: protobuf encodes negative
    int64 as 10-byte two's-complement, so a raw decode of e.g. axes=[-1]
    reads as ~2^64 — sign-reconstruct it (and reject values outside the
    int64 range outright: they cannot come from a valid int64 field)."""
    if v >= 1 << 64:
        raise ValueError(f"varint {v} out of int64 range")
    return v - (1 << 64) if v >= 1 << 63 else v


def _packed_varints(blob: bytes, signed: bool = False) -> list[int]:
    out, pos = [], 0
    while pos < len(blob):
        v, pos = _read_varint(blob, pos)
        out.append(_signed64(v) if signed else v)
    return out


def _decode_tensor(blob: bytes) -> tuple[str, np.ndarray]:
    f = _walk(blob)
    dims = _packed_varints(f[1][0]) if 1 in f else []
    dtype = f[2][0] if 2 in f else DT_FLOAT
    name = f[8][0].decode("utf-8") if 8 in f else ""
    if dtype == DT_FLOAT:
        if 9 in f:
            arr = np.frombuffer(f[9][0], dtype="<f4").reshape(dims)
        elif 4 in f:  # packed float_data
            arr = np.frombuffer(f[4][0], dtype="<f4").reshape(dims)
        else:
            raise ValueError(f"tensor {name} has no data")
    elif dtype == DT_INT64:
        if 9 in f:
            arr = np.frombuffer(f[9][0], dtype="<i8").reshape(dims)
        elif 7 in f:  # packed int64_data
            arr = np.asarray(_packed_varints(f[7][0], signed=True), dtype=np.int64).reshape(dims)
        else:
            raise ValueError(f"tensor {name} has no data")
    else:
        raise ValueError(
            f"only float32/int64 tensors supported, got data_type={dtype}"
        )
    return name, arr.copy()


def _decode_attr(blob: bytes) -> tuple[str, Any]:
    f = _walk(blob)
    name = f[1][0].decode("utf-8")
    atype = f[20][0] if 20 in f else None
    if atype == ATTR_FLOAT or (atype is None and 2 in f):
        return name, struct.unpack("<f", f[2][0])[0]
    if atype == ATTR_INT or (atype is None and 3 in f):
        return name, _signed64(f[3][0])
    if atype == ATTR_STRING or (atype is None and 4 in f):
        return name, f[4][0].decode("utf-8")
    if atype == ATTR_INTS or (atype is None and 8 in f):
        return name, _packed_varints(f[8][0], signed=True)
    raise ValueError(f"unsupported attribute type {atype} for {name}")


def _decode_node(blob: bytes) -> dict[str, Any]:
    f = _walk(blob)
    return {
        "inputs": [b.decode("utf-8") for b in f.get(1, [])],
        "outputs": [b.decode("utf-8") for b in f.get(2, [])],
        "op_type": f[4][0].decode("utf-8"),
        "attrs": dict(_decode_attr(a) for a in f.get(5, [])),
    }


def _decode_value_info_name(blob: bytes) -> str:
    return _walk(blob)[1][0].decode("utf-8")


def decode_model(blob: bytes) -> dict[str, Any]:
    """Parse a .onnx ModelProto into {graph_name, nodes, initializers,
    inputs, outputs, opset} — the subset NumpySession executes."""
    model = _walk(blob)
    if 7 not in model:
        raise ValueError("not an ONNX ModelProto: no graph field")
    g = _walk(model[7][0])
    opset = 0
    for imp in model.get(8, []):
        fields = _walk(imp)
        opset = max(opset, fields.get(2, [0])[0])
    return {
        "graph_name": g[2][0].decode("utf-8") if 2 in g else "",
        "nodes": [_decode_node(n) for n in g.get(1, [])],
        "initializers": dict(_decode_tensor(t) for t in g.get(5, [])),
        "inputs": [_decode_value_info_name(v) for v in g.get(11, [])],
        "outputs": [_decode_value_info_name(v) for v in g.get(12, [])],
        "opset": opset,
    }
