"""Property test: unknown_field_paths == a Python reference walk.

The Catalyst expression (json_object_keys + array_except per level,
recursing into struct fields) must agree with a straightforward Python
set-difference walk for arbitrary schemas and payloads — including extra
keys at any depth, missing keys, nulls, and non-struct leaves.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.cdc import unknown_field_paths

# -- schema strategy: small nested Debezium-style struct nodes -------------
_names = st.sampled_from(["a", "b", "c", "d", "e", "f"])


def _field(depth: int):
    scalar = st.sampled_from(["int64", "string", "boolean", "float64"])
    if depth <= 0:
        return st.fixed_dictionaries({"type": scalar, "field": _names})
    sub_fields = st.lists(
        _field(depth - 1), min_size=0, max_size=3, unique_by=lambda f: f["field"]
    )
    return st.one_of(
        st.fixed_dictionaries({"type": scalar, "field": _names}),
        st.fixed_dictionaries(
            {"type": st.just("struct"), "field": _names, "fields": sub_fields}
        ),
        st.fixed_dictionaries(
            {
                "type": st.just("array"),
                "field": _names,
                "items": st.fixed_dictionaries(
                    {"type": st.just("struct"), "fields": sub_fields}
                ),
            }
        ),
    )


schemas = st.fixed_dictionaries(
    {
        "type": st.just("struct"),
        "fields": st.lists(_field(2), min_size=0, max_size=4, unique_by=lambda f: f["field"]),
    }
)

# payload values: scalars, nulls, or dicts keyed by short names
_scalars = st.one_of(st.none(), st.integers(-5, 5), st.sampled_from(["x", "y"]), st.booleans())


def _payloads(depth: int = 2):
    if depth <= 0:
        return st.dictionaries(_names, _scalars, max_size=4)
    inner = st.one_of(
        _scalars,
        _payloads(depth - 1),
        st.lists(_payloads(depth - 1), max_size=3),
    )
    return st.dictionaries(_names, inner, max_size=4)


def _reference_walk(payload, node, prefix=""):
    """The plain-Python truth: keys present in payload but not in schema,
    recursing into struct-typed KNOWN fields whose payload value is a dict
    and into array-of-struct fields whose value is a list (per-element
    paths spelled ``name[].sub`` and de-duplicated across elements)."""
    if not isinstance(payload, dict):
        return []
    known = {f["field"]: f for f in node.get("fields", [])}
    out = [f"{prefix}{k}" for k in payload if k not in known]
    for name, f in known.items():
        if f.get("type") == "struct" and isinstance(payload.get(name), dict):
            out += _reference_walk(payload[name], f, f"{prefix}{name}.")
        elif (
            f.get("type") == "array"
            and isinstance(f.get("items"), dict)
            and f["items"].get("type") == "struct"
            and isinstance(payload.get(name), list)
        ):
            seen: list[str] = []
            for elem in payload[name]:
                for p in _reference_walk(elem, f["items"], ""):
                    if p not in seen:
                        seen.append(p)
            out += [f"{prefix}{name}[].{p}" for p in seen]
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(schema=schemas, payload=_payloads())
def test_unknown_field_paths_matches_reference_walk(spark, schema, payload):
    df = spark.createDataFrame([(json.dumps(payload),)], "value string")
    got = sorted(
        df.select(unknown_field_paths(F.col("value"), schema).alias("u"))
        .collect()[0]["u"]
    )
    assert got == sorted(_reference_walk(payload, schema))
