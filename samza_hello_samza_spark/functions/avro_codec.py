"""Pure-python Apache Avro binary codec (spec-compliant subset).

The reference serializes events with Avro (PageViewAvroRecord.java;
AzureBlobApplication.java:98-141 writes Avro blobs). This container
has neither the ``spark-avro`` module nor the ``avro`` Python package,
so this module implements the Avro 1.x *binary encoding* and the
Object Container File framing from the public specification
(https://avro.apache.org/docs/current/specification/) directly:

- int/long: zigzag varint
- float/double: little-endian IEEE-754
- boolean: one byte; null: zero bytes
- string/bytes: long length + bytes
- records: field values in declaration order
- unions: zigzag branch index + value (the nullable ``["null", T]``
  pattern)
- arrays/maps: blocked (count, items..., 0 terminator)
- container file: ``Obj\\x01`` magic, metadata map with
  ``avro.schema``/``avro.codec``, 16-byte sync marker, blocks of
  (count, byte-size, payload, sync)

Used by ``sources/serde.py`` for an Arrow-batched Avro round-trip —
the real wire format, interoperable with any Avro reader. ``deflate``
codec is supported via zlib; ``null`` codec is default.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive encoding
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# --------------------------------------------------------------------------
# schema-driven datum codec
# --------------------------------------------------------------------------


def encode_datum(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            buf.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            write_long(buf, int(value))
        elif t == "float":
            buf.write(struct.pack("<f", float(value)))
        elif t == "double":
            buf.write(struct.pack("<d", float(value)))
        elif t == "string":
            write_bytes(buf, str(value).encode("utf-8"))
        elif t == "bytes":
            write_bytes(buf, bytes(value))
        else:
            raise ValueError(f"unsupported primitive {t!r}")
    elif isinstance(schema, list):  # union
        for idx, branch in enumerate(schema):
            if _matches(branch, value):
                write_long(buf, idx)
                encode_datum(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    elif schema["type"] == "record":
        for field in schema["fields"]:
            encode_datum(buf, field["type"], value[field["name"]])
    elif schema["type"] == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode_datum(buf, schema["items"], item)
        write_long(buf, 0)
    elif schema["type"] == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, str(k).encode("utf-8"))
                encode_datum(buf, schema["values"], v)
        write_long(buf, 0)
    elif schema["type"] == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif schema["type"] == "fixed":
        buf.write(bytes(value))
    else:
        raise ValueError(f"unsupported schema {schema!r}")


def _matches(branch: Any, value: Any) -> bool:
    if branch == "null":
        return value is None
    if value is None:
        return False
    if branch == "boolean":
        return isinstance(value, bool)
    if branch in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if branch in ("float", "double"):
        return isinstance(value, float)
    if branch == "string":
        return isinstance(value, str)
    if branch == "bytes":
        return isinstance(value, (bytes, bytearray))
    return True  # complex branch: first match wins


def decode_datum(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "string":
            return read_bytes(buf).decode("utf-8")
        if t == "bytes":
            return read_bytes(buf)
        raise ValueError(f"unsupported primitive {t!r}")
    if isinstance(schema, list):
        return decode_datum(buf, schema[read_long(buf)])
    if schema["type"] == "record":
        return {f["name"]: decode_datum(buf, f["type"]) for f in schema["fields"]}
    if schema["type"] == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # blocked with byte-size
                read_long(buf)
                n = -n
            out.extend(decode_datum(buf, schema["items"]) for _ in range(n))
    if schema["type"] == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode_datum(buf, schema["values"])
    if schema["type"] == "enum":
        return schema["symbols"][read_long(buf)]
    if schema["type"] == "fixed":
        return buf.read(schema["size"])
    raise ValueError(f"unsupported schema {schema!r}")


def encode_record(schema: Any, value: dict) -> bytes:
    buf = io.BytesIO()
    encode_datum(buf, schema, value)
    return buf.getvalue()


def decode_record(schema: Any, data: bytes) -> dict:
    return decode_datum(io.BytesIO(data), schema)


# --------------------------------------------------------------------------
# Object Container File
# --------------------------------------------------------------------------


def write_container(
    schema: Any, records: list[dict], codec: str = "null", sync: bytes | None = None
) -> bytes:
    """Serialize records into one Avro Object Container File."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = sync or os.urandom(16)
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    write_long(buf, len(meta))
    for k, v in meta.items():
        write_bytes(buf, k.encode())
        write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            encode_datum(block, schema, rec)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    return buf.getvalue()


def read_container(data: bytes) -> tuple[Any, list[dict]]:
    """Parse an Avro Object Container File → (schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        records.extend(decode_datum(block, schema) for _ in range(count))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records
