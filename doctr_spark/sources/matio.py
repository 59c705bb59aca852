"""Minimal MAT-file v5 codec — enough of the PUBLIC MATLAB Level-5
MAT-file format (mathworks.com "MAT-File Format", R2006a+) to read and
write the annotation containers two reference datasets ship as ``.mat``
without scipy installed: IIIT5K's 1xN struct arrays
(datasets/iiit5k.py:71 ``sio.loadmat(...)[mat_file][0]``) and
SynthText's cell arrays (datasets/synthtext.py:91-95 ``imnames`` /
``wordBB`` / ``txt``).

Wire format (all little-endian here, the 'IM' byte-order mark):

- 128-byte header: 116 bytes description text, 8 bytes subsystem offset,
  uint16 version 0x0100, 2 bytes endian indicator.
- Data elements: 8-byte tag (uint32 type, uint32 byte count) + payload
  padded to 8; or the SMALL element form (bytes <= 4): type and size
  packed into the first word, data in the second.
- Element types used: miINT8=1 miUINT8=2 miINT32=5 miUINT32=6
  miDOUBLE=9 miMATRIX=14 miCOMPRESSED=15 miUTF8=16 miUINT16=4(char).
- miMATRIX payload = Array Flags (class in the low byte of the first
  word: mxCELL=1 mxSTRUCT=2 mxCHAR=4 mxDOUBLE=6) + Dimensions (miINT32)
  + Name (miINT8) + class-specific subelements: numeric real data
  (column-major), char data (miUTF8 / miUINT16), one nested miMATRIX per
  cell (column-major), or field-name-length (miINT32) + field names
  (miINT8, fixed 32-byte slots) + one nested miMATRIX per element and
  field for structs.
- miCOMPRESSED wraps one complete zlib-compressed data element — what
  scipy's savemat emits by default (do_compression=True), so real files
  written that way parse here.

Python mapping on read: numeric -> float64 ndarray; char (1 row) -> str,
char (R rows) -> list of R strings (MATLAB pads rows with spaces —
kept, callers split); cell -> nested list in row-major reading order of
the column-major file layout flattened to the MATLAB linear order (the
reference indexes cells linearly, e.g. ``imnames[0]``); struct array ->
list of {field: value} dicts in linear order. Only the subset above is
implemented; anything else raises, loudly.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

import numpy as np

MI_INT8, MI_UINT8, MI_INT16, MI_UINT16, MI_INT32, MI_UINT32 = 1, 2, 3, 4, 5, 6
MI_SINGLE, MI_DOUBLE = 7, 9
MI_MATRIX, MI_COMPRESSED, MI_UTF8, MI_UTF16 = 14, 15, 16, 17

MX_CELL, MX_STRUCT, MX_CHAR, MX_DOUBLE = 1, 2, 4, 6
MX_SINGLE, MX_INT8, MX_UINT8, MX_INT16, MX_UINT16, MX_INT32, MX_UINT32 = (
    7, 8, 9, 10, 11, 12, 13,
)

_MI_DTYPE = {
    MI_INT8: "<i1", MI_UINT8: "<u1", MI_INT16: "<i2", MI_UINT16: "<u2",
    MI_INT32: "<i4", MI_UINT32: "<u4", MI_SINGLE: "<f4", MI_DOUBLE: "<f8",
}
_MX_TO_MI = {
    MX_DOUBLE: MI_DOUBLE, MX_SINGLE: MI_SINGLE, MX_INT8: MI_INT8,
    MX_UINT8: MI_UINT8, MX_INT16: MI_INT16, MX_UINT16: MI_UINT16,
    MX_INT32: MI_INT32, MX_UINT32: MI_UINT32,
}


# ------------------------------------------------------------------ write


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _element(mi_type: int, payload: bytes) -> bytes:
    return struct.pack("<II", mi_type, len(payload)) + _pad8(payload)


def _matrix(flags_class: int, dims: tuple[int, ...], name: str, body: bytes) -> bytes:
    sub = _element(MI_UINT32, struct.pack("<II", flags_class, 0))
    sub += _element(MI_INT32, struct.pack(f"<{len(dims)}i", *dims))
    sub += _element(MI_INT8, name.encode("ascii"))
    sub += body
    return _element(MI_MATRIX, sub)


def _encode_value(value: Any, name: str = "") -> bytes:
    """One miMATRIX element for a python value (ndarray / str /
    list-of-strings (char matrix is NOT produced — multi-row char is
    written as a cell) / list (cell) / list-of-dicts (struct array))."""
    if isinstance(value, np.ndarray):
        a = np.asarray(value, dtype=np.float64)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        body = _element(MI_DOUBLE, a.flatten(order="F").astype("<f8").tobytes())
        return _matrix(MX_DOUBLE, a.shape, name, body)
    if isinstance(value, str):
        body = _element(MI_UTF8, value.encode("utf-8"))
        return _matrix(MX_CHAR, (1, len(value)), name, body)
    if isinstance(value, list) and value and all(isinstance(v, dict) for v in value):
        fields = list(value[0])
        sub = _element(MI_INT32, struct.pack("<i", 32))  # field name length
        names = b"".join(f.encode("ascii").ljust(32, b"\x00") for f in fields)
        sub += _element(MI_INT8, names)
        for entry in value:  # 1xN struct: linear order == column-major
            for f in fields:
                sub += _encode_value(entry[f])
        flags = _element(MI_UINT32, struct.pack("<II", MX_STRUCT, 0))
        dims = _element(MI_INT32, struct.pack("<2i", 1, len(value)))
        nm = _element(MI_INT8, name.encode("ascii"))
        return _element(MI_MATRIX, flags + dims + nm + sub)
    if isinstance(value, list):
        body = b"".join(_encode_value(v) for v in value)
        return _matrix(MX_CELL, (1, len(value)), name, body)
    raise TypeError(f"cannot encode {type(value)} as a .mat value")


def write_mat(path: str, variables: dict[str, Any], compress: bool = True) -> None:
    """Write a v5 .mat file (header + one top-level element per variable),
    zlib-wrapping each element like scipy's default do_compression."""
    header = b"MATLAB 5.0 MAT-file, written by doctr_spark matio".ljust(116)
    header += b"\x00" * 8 + struct.pack("<H", 0x0100) + b"IM"
    out = [header]
    for name, value in variables.items():
        el = _encode_value(value, name)
        if compress:
            el = _element(MI_COMPRESSED, zlib.compress(el))
        out.append(el)
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


# ------------------------------------------------------------------- read


def _read_tag(buf: bytes, pos: int) -> tuple[int, int, int, int]:
    """-> (mi_type, n_bytes, data_pos, next_pos)."""
    word = struct.unpack_from("<I", buf, pos)[0]
    if word >> 16:  # small data element: size in the high 16 bits
        mi_type, n = word & 0xFFFF, word >> 16
        return mi_type, n, pos + 4, pos + 8
    n = struct.unpack_from("<I", buf, pos + 4)[0]
    data_pos = pos + 8
    return word, n, data_pos, data_pos + n + (-n % 8)


def _subelements(buf: bytes, pos: int, end: int):
    while pos < end:
        mi, n, dp, nxt = _read_tag(buf, pos)
        yield mi, buf[dp : dp + n]
        pos = nxt


def _decode_matrix(payload: bytes) -> tuple[str, Any]:
    subs = list(_subelements(payload, 0, len(payload)))
    (mi_f, flags), (mi_d, dims_raw), (mi_n, name_raw) = subs[0], subs[1], subs[2]
    if mi_f != MI_UINT32 or mi_d != MI_INT32:
        raise ValueError("malformed miMATRIX header subelements")
    flags_word = struct.unpack_from("<I", flags, 0)[0]
    mx_class = flags_word & 0xFF
    if flags_word & 0x0800:  # complex flag: only pr would be read — refuse
        raise ValueError("complex numeric arrays are not supported")
    dims = np.frombuffer(dims_raw, dtype="<i4").tolist()
    name = name_raw.decode("ascii", errors="replace").rstrip("\x00")
    rest = subs[3:]

    if mx_class in _MX_TO_MI:
        mi, data = rest[0]
        if mi not in _MI_DTYPE:
            raise ValueError(f"unsupported numeric storage type {mi}")
        arr = np.frombuffer(data, dtype=_MI_DTYPE[mi]).astype(np.float64)
        return name, arr.reshape(dims, order="F")
    if mx_class == MX_CHAR:
        mi, data = rest[0]
        if mi == MI_UTF8:
            flat = data.decode("utf-8")
        elif mi in (MI_UINT16, MI_UTF16):
            flat = data.decode("utf-16-le")
        elif mi in (MI_UINT8, MI_INT8):
            flat = data.decode("latin-1")
        else:
            raise ValueError(f"unsupported char storage type {mi}")
        rows, cols = (dims + [1, 1])[:2]
        if rows <= 1:
            return name, flat
        # R x C char matrix, column-major: row r = chars r, r+R, r+2R...
        return name, ["".join(flat[r::rows]) for r in range(rows)]
    if mx_class == MX_CELL:
        cells = [
            _decode_matrix(body)[1]
            for mi, body in rest
            if mi == MI_MATRIX
        ]
        return name, cells
    if mx_class == MX_STRUCT:
        (mi_l, flen_raw), (mi_fn, names_raw) = rest[0], rest[1]
        flen = struct.unpack_from("<i", flen_raw, 0)[0]
        fields = [
            names_raw[i : i + flen].decode("ascii").rstrip("\x00")
            for i in range(0, len(names_raw), flen)
        ]
        values = [
            _decode_matrix(body)[1] for mi, body in rest[2:] if mi == MI_MATRIX
        ]
        n_elem = int(np.prod(dims)) if dims else 0
        if len(values) != n_elem * len(fields):
            raise ValueError("struct field/value count mismatch")
        out = []
        for e in range(n_elem):
            out.append({
                f: values[e * len(fields) + i] for i, f in enumerate(fields)
            })
        return name, out
    raise ValueError(f"unsupported MATLAB array class {mx_class}")


def read_mat(path: str) -> dict[str, Any]:
    """Parse a v5 .mat file -> {variable name: python value} for the
    supported subset (numeric/char/cell/struct, plain or zlib-wrapped)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 128:
        raise ValueError("not a MAT-file: truncated header")
    version, endian = struct.unpack_from("<H2s", buf, 124)
    if endian == b"MI":
        raise ValueError("big-endian MAT-files are not supported")
    if endian != b"IM":
        raise ValueError(f"not a v5 MAT-file (endian marker {endian!r})")
    out: dict[str, Any] = {}
    pos = 128
    while pos < len(buf):
        mi, n, dp, nxt = _read_tag(buf, pos)
        body = buf[dp : dp + n]
        if mi == MI_COMPRESSED:
            inner = zlib.decompress(body)
            mi2, n2, dp2, _ = _read_tag(inner, 0)
            mi, body = mi2, inner[dp2 : dp2 + n2]
        if mi == MI_MATRIX:
            name, value = _decode_matrix(body)
            out[name] = value
        # non-matrix top-level elements (none in practice) are skipped
        pos = nxt
    return out
