"""Property-based tests (hypothesis) for the pure-Python pieces: the
Avro wire codec, the upsert-SQL escaping, and the MinHash parameter
bounds — fast (no Spark) and exhaustive where example tests are not."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_streaming_kafka_bucket_counter_spark.functions import avro_lite as A
from spark_streaming_kafka_bucket_counter_spark.operators.dedup import (
    MINHASH_P,
    minhash_params,
)
from spark_streaming_kafka_bucket_counter_spark.streaming.sinks import upsert_sql

settings.register_profile("no_deadline", deadline=None)
settings.load_profile("no_deadline")

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(I64)
def test_zigzag_roundtrip_any_int64(n):
    out = bytearray()
    A._write_long(out, n)
    back, pos = A._read_long(bytes(out), 0)
    assert back == n and pos == len(out)


_FIELD_TYPES = st.sampled_from(
    ["long", "string", "boolean", "double", "bytes", ["long", "null"], ["string", "null"]]
)


def _value_for(typ):
    if isinstance(typ, list):
        base = [t for t in typ if t != "null"][0]
        return st.one_of(st.none(), _value_for(base))
    return {
        "long": I64,
        "string": st.text(max_size=40),
        "boolean": st.booleans(),
        # avoid NaN (NaN != NaN breaks equality) but keep inf
        "double": st.floats(allow_nan=False),
        "bytes": st.binary(max_size=40),
    }[typ]


@st.composite
def _schema_and_record(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    types = [draw(_FIELD_TYPES) for _ in range(n)]
    fields = [(f"f{i}", t) for i, t in enumerate(types)]
    record = {name: draw(_value_for(t)) for name, t in fields}
    return fields, record


@given(_schema_and_record())
@settings(max_examples=200, deadline=None)
def test_avro_record_roundtrip_property(sr):
    fields, record = sr
    blob = A.encode_record(fields, record)
    assert A.decode_record(fields, blob) == record


@given(_schema_and_record(), st.integers(min_value=0, max_value=5))
@settings(max_examples=50, deadline=None)
def test_avro_multi_record_framing_property(sr, count):
    fields, record = sr
    blob = b"".join(A.encode_record(fields, record) for _ in range(count))
    assert A.decode_records(fields, blob) == [record] * count


@given(st.text(max_size=60))
def test_upsert_sql_escapes_any_text(v):
    sql = upsert_sql("t", {"k": v})
    # the VALUES literal must contain no bare single quote: every quote in
    # the payload is doubled (models.py:359-363 interpolated raw)
    inner = sql.split("VALUES (", 1)[1].rsplit(")", 1)[0]
    assert inner.startswith("'") and inner.endswith("'")
    body = inner[1:-1]
    assert "'" not in body.replace("''", "")


@given(st.integers(min_value=1, max_value=512))
def test_minhash_params_never_overflow_int64(num_hashes):
    """A_j * max_h32 + B_j must stay under 2^63 for every generated
    parameter pair (the no-overflow invariant the affine family relies
    on for exact arithmetic in both engines)."""
    max_h32 = (1 << 32) - 1
    for a, b in minhash_params(num_hashes):
        assert 0 < a and 0 <= b
        assert a * max_h32 + b < (1 << 63)
        assert (a * max_h32 + b) % MINHASH_P >= 0


def test_avro_schema_json_shape_accepted():
    fields = A.parse_schema(
        json.dumps(
            {
                "type": "record",
                "name": "r",
                "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "y", "type": ["string", "null"]},
                ],
            }
        )
    )
    assert fields == [("x", "long"), ("y", ["string", "null"])]
