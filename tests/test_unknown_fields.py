"""ignore-unknown-fields strict mode (StreamConsumerConfig.java:30-32).

The reference's stream consumer passes ``setIgnoreUnknownFields`` to the
BigQuery JsonStreamWriter: with the default (true) unknown payload fields
are dropped; with false the append FAILS.  ``from_json`` always drops
unknowns, so the engine diffs raw JSON keys against the schema before the
parse (sources/cdc.py unknown_field_paths) and raises on mismatch — the
unknown-property shape mirrors serde-unknown-property.json (middle_name
nested inside before/after).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.cdc import (
    read_cdc_ndjson,
    unknown_field_paths,
)

SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int64", "field": "id"},
        {"type": "string", "field": "first_name"},
        {
            "type": "struct",
            "optional": True,
            "field": "address",
            "fields": [
                {"type": "string", "field": "city"},
            ],
        },
        {"type": "string", "optional": True, "field": "__op"},
    ],
}


def _write(tmp_path, payloads):
    path = tmp_path / "events.ndjson"
    path.write_text(
        "\n".join(json.dumps({"schema": SCHEMA, "payload": p}) for p in payloads)
        + "\n"
    )
    return str(path)


GOOD = {"id": 1, "first_name": "Anne", "address": {"city": "Oslo"}, "__op": "c"}
BAD_TOP = {"id": 2, "first_name": "Bo", "middle_name": "L", "__op": "c"}
BAD_NESTED = {"id": 3, "first_name": "Cy", "address": {"city": "Bergen", "zip": "5003"}, "__op": "c"}


def test_permissive_default_drops_unknown_silently(spark, tmp_path):
    path = _write(tmp_path, [GOOD, BAD_TOP, BAD_NESTED])
    rows = read_cdc_ndjson(spark, path).orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert "middle_name" not in rows[0].asDict()


def test_strict_mode_passes_clean_payloads(spark, tmp_path):
    path = _write(tmp_path, [GOOD])
    rows = read_cdc_ndjson(spark, path, ignore_unknown_fields=False).collect()
    assert rows[0]["id"] == 1
    assert rows[0]["address"]["city"] == "Oslo"


def test_strict_mode_fails_on_top_level_unknown(spark, tmp_path):
    path = _write(tmp_path, [GOOD, BAD_TOP])
    with pytest.raises(Exception, match="middle_name"):
        read_cdc_ndjson(spark, path, ignore_unknown_fields=False).collect()


def test_strict_mode_fails_on_nested_unknown_with_path(spark, tmp_path):
    path = _write(tmp_path, [BAD_NESTED])
    with pytest.raises(Exception, match=r"address\.zip"):
        read_cdc_ndjson(spark, path, ignore_unknown_fields=False).collect()


def test_unknown_field_paths_expression(spark):
    df = spark.createDataFrame(
        [
            (json.dumps(GOOD),),
            (json.dumps(BAD_TOP),),
            (json.dumps(BAD_NESTED),),
            (None,),
        ],
        "value string",
    )
    out = df.select(
        unknown_field_paths(F.col("value"), SCHEMA).alias("unk")
    ).collect()
    assert list(out[0]["unk"]) == []
    assert list(out[1]["unk"]) == ["middle_name"]
    assert list(out[2]["unk"]) == ["address.zip"]
    assert list(out[3]["unk"]) == []


ARRAY_SCHEMA = {
    "type": "struct",
    "fields": [
        {"type": "int64", "field": "id"},
        {
            "type": "array",
            "optional": True,
            "field": "addresses",
            "items": {
                "type": "struct",
                "fields": [
                    {"type": "string", "field": "city"},
                    {
                        "type": "struct",
                        "optional": True,
                        "field": "geo",
                        "fields": [{"type": "string", "field": "lat"}],
                    },
                ],
            },
        },
    ],
}


def test_unknown_fields_descend_array_elements(spark):
    rows = [
        # clean: known keys only, at every depth
        {"id": 1, "addresses": [{"city": "Oslo", "geo": {"lat": "59"}}]},
        # unknown key inside the second array element
        {"id": 2, "addresses": [{"city": "A"}, {"city": "B", "zip": "5003"}]},
        # unknown key inside a struct nested in an array element
        {"id": 3, "addresses": [{"city": "C", "geo": {"lat": "60", "lon": "5"}}]},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")
    out = df.select(
        unknown_field_paths(F.col("value"), ARRAY_SCHEMA).alias("unk")
    ).collect()
    assert list(out[0]["unk"]) == []
    assert list(out[1]["unk"]) == ["addresses[].zip"]
    assert list(out[2]["unk"]) == ["addresses[].geo.lon"]


def test_strict_mode_fails_on_array_element_unknown(spark, tmp_path):
    payload = {"id": 9, "addresses": [{"city": "X", "zip": "1"}]}
    path = tmp_path / "events.ndjson"
    path.write_text(
        json.dumps({"schema": ARRAY_SCHEMA, "payload": payload}) + "\n"
    )
    with pytest.raises(Exception, match=r"addresses\[\]\.zip"):
        read_cdc_ndjson(
            spark, str(path), ignore_unknown_fields=False
        ).collect()
