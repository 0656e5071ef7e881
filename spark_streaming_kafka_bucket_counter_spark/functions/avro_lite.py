"""Minimal Avro binary codec for FLAT record schemas (pure Python,
implements the Apache Avro 1.x binary encoding spec).

Why this exists: the reference decodes Avro-framed Kafka values
(``utils.py:341-373``) and Avro-encodes HTTP response rows
(``utils.py:276-304``, ``http.py:78-86``). Spark's native
``from_avro``/``to_avro`` live in the external spark-avro module, which
is frequently absent from a cluster's classpath (it is not bundled with
the Spark distribution). This module is the *executed* fallback: the
same wire format, implemented from the public Avro specification
(zigzag-varint ints, little-endian IEEE floats, length-prefixed UTF-8,
union-index prefix), applied inside Arrow ``mapInPandas`` batches so the
per-record Python cost is amortized over columnar batches.

Scope (all the reference's messages need): ``null boolean int long
float double bytes string`` and unions thereof; records are flat. The
multi-record framing the reference calls ``msg_count`` (S4) is plain
record concatenation — :func:`decode_records` reads until the buffer is
exhausted.
"""

from __future__ import annotations

import json
import struct as _struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def parse_schema(schema_json: str | dict) -> list[tuple[str, object]]:
    """Avro record schema JSON -> [(field_name, type)] where type is a
    primitive name or a list of primitive names (union)."""
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas are supported")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            bad = [x for x in t if not (isinstance(x, str) and x in _PRIMITIVES)]
        else:
            bad = [] if isinstance(t, str) and t in _PRIMITIVES else [t]
        if bad:
            raise ValueError(f"unsupported Avro type(s) {bad} in field {f['name']!r}")
        fields.append((f["name"], t))
    return fields


# ---------------------------------------------------------------------------
# Binary primitives (Avro spec: zigzag varint longs, LE IEEE floats,
# length-prefixed bytes/strings)
# ---------------------------------------------------------------------------


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (Python's arithmetic shift handles sign)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf, pos: int) -> tuple[int, int]:
    acc = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _write_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # union: long index, then the value
        idx = _union_index(typ, v)
        _write_long(out, idx)
        return _write_value(out, typ[idx], v)
    if typ == "null":
        if v is not None:
            raise ValueError(f"null type with non-null value {v!r}")
        return
    if v is None:
        # a None for a non-nullable type must fail loudly — silently
        # coercing (str(None) -> 'None', bool(None) -> False) would emit
        # corrupted payloads and diverge from spark-avro, which errors
        raise ValueError(f"None for non-nullable Avro type {typ!r}")
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out.extend(_struct.pack("<f", float(v)))
    elif typ == "double":
        out.extend(_struct.pack("<d", float(v)))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        _write_long(out, len(raw))
        out.extend(raw)
    elif typ == "bytes":
        raw = bytes(v)
        _write_long(out, len(raw))
        out.extend(raw)
    else:  # pragma: no cover - parse_schema rejects these
        raise ValueError(f"unsupported type {typ!r}")


def _union_index(union: list, v) -> int:
    if v is None:
        if "null" in union:
            return union.index("null")
        raise ValueError("None for a union without null")
    import numbers

    # numbers ABCs so numpy scalars (Arrow batches) dispatch like natives
    if isinstance(v, (bool,)) or type(v).__name__ == "bool_":
        pref = ("boolean",)
    elif isinstance(v, numbers.Integral):
        pref = ("long", "int")
    elif isinstance(v, numbers.Real):
        pref = ("double", "float")
        # Arrow hands int64-with-nulls to pandas as float64, so integral
        # values of a nullable-int union arrive as floats — route them to
        # the integer branch when no float branch exists
        if not any(p in union for p in pref) and float(v).is_integer():
            pref = ("long", "int")
    elif isinstance(v, str):
        pref = ("string",)
    else:
        pref = ("bytes",)
    for p in pref:
        if p in union:
            return union.index(p)
    raise ValueError(f"no union branch in {union} for {v!r}")


def _read_value(buf, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = _read_long(buf, pos)
        return _read_value(buf, pos, typ[idx])
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return _read_long(buf, pos)
    if typ == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _read_long(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    raise ValueError(f"unsupported type {typ!r}")  # pragma: no cover


# ---------------------------------------------------------------------------
# Record codec
# ---------------------------------------------------------------------------


def encode_record(fields: list[tuple[str, object]], record: dict) -> bytes:
    """One record -> Avro binary (fields in schema order, per spec)."""
    out = bytearray()
    for name, typ in fields:
        _write_value(out, typ, record.get(name))
    return bytes(out)


def decode_record(fields: list[tuple[str, object]], data: bytes) -> dict:
    rec, pos = _decode_at(fields, data, 0)
    return rec


def _decode_at(fields, data, pos: int) -> tuple[dict, int]:
    rec = {}
    for name, typ in fields:
        rec[name], pos = _read_value(data, pos, typ)
    return rec, pos


def decode_records(fields: list[tuple[str, object]], data: bytes) -> list[dict]:
    """Multi-record framing (reference S4 ``msg_count``): records are
    concatenated back-to-back; read until the buffer is exhausted."""
    out, pos = [], 0
    while pos < len(data):
        rec, pos = _decode_at(fields, data, pos)
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# Spark integration (Arrow-batched; schema-driven struct columns)
# ---------------------------------------------------------------------------

_SPARK_TYPES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def spark_struct(fields: list[tuple[str, object]]) -> T.StructType:
    """Avro fields -> Spark StructType (union-with-null -> nullable)."""
    out = []
    for name, typ in fields:
        if isinstance(typ, list):
            branches = [t for t in typ if t != "null"]
            if len(branches) != 1:
                raise ValueError(f"union {typ} needs exactly one non-null branch")
            out.append(T.StructField(name, _SPARK_TYPES[branches[0]], True))
        elif typ == "null":
            out.append(T.StructField(name, T.NullType(), True))
        else:
            out.append(T.StructField(name, _SPARK_TYPES[typ], False))
    return T.StructType(out)


def avro_decode_df(
    df: DataFrame, schema_json: str, value_col: str = "value"
) -> DataFrame:
    """Binary Avro ``value_col`` -> one struct column ``j`` (the same
    output contract as spark-avro's ``from_avro``)."""
    fields = parse_schema(schema_json)
    out_type = T.StructType([T.StructField("j", spark_struct(fields), True)])

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"j": [decode_record(fields, bytes(v)) for v in pdf[value_col]]}
            )

    return df.select(value_col).mapInPandas(_decode, out_type)


def avro_encode_df(df: DataFrame, schema_json: str) -> DataFrame:
    """All columns -> one binary ``avro`` column (the same output contract
    as spark-avro's ``to_avro(struct(*))``)."""
    fields = parse_schema(schema_json)
    names = [n for n, _ in fields]
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(f"schema fields missing from DataFrame: {missing}")

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            # python-native values: Arrow hands nullable ints as float
            # NaN and numbers as numpy scalars — both break the
            # isinstance-driven union dispatch
            cols = [
                pdf[n].astype(object).where(pd.notna(pdf[n]), None).tolist()
                for n in names
            ]
            vals = [
                encode_record(fields, dict(zip(names, row))) for row in zip(*cols)
            ]
            yield pd.DataFrame({"avro": vals})

    return df.select(*names).mapInPandas(_encode, "avro binary")


# ---------------------------------------------------------------------------
# Object Container Files (the standard .avro file format)
# ---------------------------------------------------------------------------

_OCF_MAGIC = b"Obj\x01"


def encode_ocf(
    schema_json: str,
    records: list[dict],
    codec: str = "deflate",
    block_records: int = 1000,
) -> bytes:
    """Records -> a conformant Avro Object Container File (spec 1.x):
    magic, file-metadata map (``avro.schema`` + ``avro.codec``), 16-byte
    sync marker, then data blocks of ``(count, size, payload, sync)``.
    ``deflate`` is raw RFC-1951 (no zlib header), per spec. The sync
    marker is derived deterministically from the schema + first record
    so identical inputs produce identical bytes (testable builds);
    uniqueness across files is irrelevant to correctness — sync exists
    for split alignment, which block boundaries here provide."""
    import hashlib
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    fields = parse_schema(schema_json)
    sync = hashlib.md5(
        schema_json.encode() + repr(sorted((records or [{}])[0].items())).encode()
    ).digest()

    out = bytearray(_OCF_MAGIC)
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)  # end of map
    out += sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        payload = bytearray()
        for rec in chunk:
            payload += encode_record(fields, rec)
        data = bytes(payload)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out += data
        out += sync
    return bytes(out)


def decode_ocf(data: bytes) -> tuple[str, list[dict]]:
    """Object Container File -> ``(schema_json, records)``. Raises
    ``ValueError`` on bad magic / codec / sync drift — ingest should
    fail loudly on a corrupt container, not guess (unlike the
    crawl-payload decoders, which fail closed per row)."""
    import zlib

    if data[:4] != _OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = _read_long(data, pos)
        for _ in range(n):
            klen, pos = _read_long(data, pos)
            k = data[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _read_long(data, pos)
            meta[k] = data[pos : pos + vlen]
            pos += vlen
    schema_json = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    fields = parse_schema(schema_json)
    sync = data[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        cnt, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        payload = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        rp = 0
        for _ in range(cnt):
            rec, rp = _decode_at(fields, payload, rp)
            records.append(rec)
        if rp != len(payload):
            raise ValueError("block payload has trailing bytes")
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker drift (corrupt block boundary)")
        pos += 16
    return schema_json, records
