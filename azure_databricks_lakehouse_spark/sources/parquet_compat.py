"""pyarrow compatibility shim for parquet footers carrying logical
types newer than the installed pyarrow understands (VARIANT, and any
future addition).

The installed pyarrow (16.1) refuses to OPEN a file whose footer
carries a Thrift ``LogicalType`` union member it does not know
("Metadata contains Thrift LogicalType that is not recognized") —
Spark's VARIANT columns annotate their ``group {metadata: binary,
value: binary}`` with exactly such a member.  The data pages are
ordinary binary columns; only the ANNOTATION is unreadable.

:func:`read_table_compat` therefore patches the footer IN MEMORY: a
minimal Thrift compact-protocol walker copies the ``FileMetaData``
byte stream verbatim, except that each ``SchemaElement.logicalType``
(field 10) whose union member id is unknown to pyarrow (>= 16 —
VARIANT is 16, GEOMETRY 17, GEOGRAPHY 18; pyarrow 16.1 knows through
FLOAT16 = 15) is dropped.  The column then reads as a plain
``struct<metadata: binary, value: binary>`` — exactly the physical
bytes a VariantVal is built from.  Nothing else changes: column-chunk
offsets are absolute file positions and the data region is untouched,
so only the footer tail is replaced.

This is the executor-side twin of the driver-side
``tables._jvm_footer_rows`` fallback (which routes footer METADATA
reads through Spark's JVM): a streaming source partition runs in a
Python worker with no JVM access, so the file itself must become
readable.  Used by ``sources/cdf_stream.py``.

Thrift compact protocol reference: field header byte = (id delta << 4)
| type nibble (delta 0 ⇒ explicit zigzag-varint id); types: 1/2 bool
true/false, 3 i8, 4 i16, 5 i32, 6 i64, 7 double, 8 binary, 9 list,
10 set, 11 map, 12 struct.  Lists encode (size << 4 | elem type) with
size 15 ⇒ varint.  The parquet ``FileMetaData`` struct keeps the
schema element list in field 2.
"""

from __future__ import annotations

import struct

_STOP = 0
_TRUE = 1
_FALSE = 2
_I8 = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12

# LogicalType union members pyarrow 16.1 recognizes: 1..15 (STRING …
# FLOAT16).  16+ (VARIANT, GEOMETRY, GEOGRAPHY, …) make it refuse the
# whole footer.
_MAX_KNOWN_LOGICAL_TYPE = 15


def _read_varint(b: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        byte = b[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return out, pos
        shift += 7


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            return bytes(out)
        out.append((n & 0x7F) | 0x80)
        n >>= 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _skip_value(b: bytes, pos: int, t: int) -> int:
    if t in (_TRUE, _FALSE):
        return pos
    if t == _I8:
        return pos + 1
    if t in (_I16, _I32, _I64):
        _, pos = _read_varint(b, pos)
        return pos
    if t == _DOUBLE:
        return pos + 8
    if t == _BINARY:
        n, pos = _read_varint(b, pos)
        return pos + n
    if t == _STRUCT:
        while True:
            hdr = b[pos]
            pos += 1
            if hdr == _STOP:
                return pos
            ft = hdr & 0x0F
            if (hdr >> 4) == 0:
                _, pos = _read_varint(b, pos)  # zigzag field id
            pos = _skip_value(b, pos, ft)
    if t in (_LIST, _SET):
        hdr = b[pos]
        pos += 1
        size = hdr >> 4
        et = hdr & 0x0F
        if size == 0x0F:
            size, pos = _read_varint(b, pos)
        for _ in range(size):
            pos = pos + 1 if et in (_TRUE, _FALSE) else _skip_value(b, pos, et)
        return pos
    if t == _MAP:
        size, pos = _read_varint(b, pos)
        if size == 0:
            return pos
        kv = b[pos]
        pos += 1
        kt, vt = kv >> 4, kv & 0x0F
        for _ in range(size):
            # bool elements inside maps carry 1 payload byte (unlike
            # struct fields, where the bool lives in the type nibble) —
            # _skip_value(_TRUE/_FALSE) consumes 0 and would desync
            pos = pos + 1 if kt in (_TRUE, _FALSE) else _skip_value(b, pos, kt)
            pos = pos + 1 if vt in (_TRUE, _FALSE) else _skip_value(b, pos, vt)
        return pos
    raise ValueError(f"unknown thrift compact type {t} at {pos}")


def _field_header(fid: int, t: int, last_emitted: int) -> bytes:
    delta = fid - last_emitted
    if 1 <= delta <= 15:
        return bytes([(delta << 4) | t])
    return bytes([t]) + _write_varint(_zigzag(fid))


def _transform_schema_element(b: bytes, pos: int, out: bytearray) -> int:
    """Copy one SchemaElement struct, dropping a ``logicalType``
    (field 10) whose union member id pyarrow cannot parse.  Field
    headers after a drop are re-encoded so the id delta chain stays
    valid regardless of field order."""
    last_read = 0
    last_emitted = 0
    while True:
        hdr = b[pos]
        pos += 1
        if hdr == _STOP:
            out.append(_STOP)
            return pos
        t = hdr & 0x0F
        delta = hdr >> 4
        if delta == 0:
            z, pos = _read_varint(b, pos)
            fid = (z >> 1) ^ -(z & 1)
        else:
            fid = last_read + delta
        last_read = fid
        val_start = pos
        pos = _skip_value(b, pos, t)
        if fid == 10 and t == _STRUCT:
            # the LogicalType union: exactly one member field
            inner = b[val_start]
            it = inner & 0x0F
            ip = val_start + 1
            if (inner >> 4) == 0:
                z, ip = _read_varint(b, ip)
                member = (z >> 1) ^ -(z & 1)
            else:
                member = inner >> 4
            del it
            if member > _MAX_KNOWN_LOGICAL_TYPE:
                continue  # drop the annotation entirely
        out += _field_header(fid, t, last_emitted)
        out += b[val_start:pos]
        last_emitted = fid


def strip_unknown_logical_types(footer: bytes) -> bytes:
    """``FileMetaData`` footer bytes with every unknown-to-pyarrow
    ``SchemaElement.logicalType`` dropped (see module docstring)."""
    b = footer
    out = bytearray()
    pos = 0
    last_read = 0
    last_emitted = 0
    while True:
        hdr = b[pos]
        pos += 1
        if hdr == _STOP:
            out.append(_STOP)
            break
        t = hdr & 0x0F
        delta = hdr >> 4
        if delta == 0:
            z, pos = _read_varint(b, pos)
            fid = (z >> 1) ^ -(z & 1)
        else:
            fid = last_read + delta
        last_read = fid
        if fid == 2 and t == _LIST:
            # schema: list<SchemaElement> — transform each element
            out += _field_header(fid, t, last_emitted)
            last_emitted = fid
            lh = b[pos]
            pos += 1
            size = lh >> 4
            et = lh & 0x0F
            out.append(lh)
            if size == 0x0F:
                start = pos
                size, pos = _read_varint(b, pos)
                out += b[start:pos]
            for _ in range(size):
                pos = _transform_schema_element(b, pos, out)
            continue
        val_start = pos
        pos = _skip_value(b, pos, t)
        out += _field_header(fid, t, last_emitted)
        out += b[val_start:pos]
        last_emitted = fid
    return bytes(out)


def read_table_compat(path: str):
    """``pyarrow.parquet.read_table`` that survives footers carrying
    logical types newer than the installed pyarrow: on the
    characteristic refusal, re-read with the annotation stripped from
    an in-memory copy (data region untouched — column-chunk offsets
    are absolute, and only the footer tail is replaced)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        return pq.read_table(path)
    except (OSError, ValueError) as exc:
        # pyarrow surfaces footer parse failures as OSError on some
        # builds and ArrowInvalid (a ValueError subclass) on others —
        # both routes gate on the characteristic LogicalType message
        if "LogicalType" not in str(exc):
            raise
    with open(path, "rb") as fh:
        data = fh.read()
    if data[-4:] != b"PAR1":
        raise ValueError(f"not a parquet file: {path}")
    flen = struct.unpack("<I", data[-8:-4])[0]
    footer = data[-8 - flen : -8]
    patched = strip_unknown_logical_types(footer)
    return pq.read_table(
        pa.BufferReader(
            data[: -8 - flen]
            + patched
            + struct.pack("<I", len(patched))
            + b"PAR1"
        )
    )
