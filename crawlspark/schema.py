"""Spark schemas for the crawl engine + BigQuery-JSON schema export.

``RESULT_SCHEMA`` mirrors the reference's generated BigQuery schema
(/root/reference/schema/schema.go:7-316, golden /root/reference/
schema.json) and the Go structs (/root/reference/crawler/data/
result.go:18-43): nested Address RECORDs, REPEATED Link/Hreflang/
Header records, INT64/STRING/BOOL primitives, Depth the only REQUIRED
field. ``bigquery_json()`` re-implements the reflection-based
generator (/root/reference/schema/gen.go:63-126) as a ~40-line
StructType walker — `crawl schema` parity (crawl.go:67-70).

Payload extension (BASELINE.json input_hint): IMAGE_SCHEMA is the
input Iceberg-table shape; results carry an extra nullable ``Payload``
struct. Extra columns beyond the reference schema are additive —
parity tests select only reference fields.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

__all__ = [
    "ADDRESS_TYPE", "PAIR_TYPE", "LINK_TYPE", "HREFLANG_TYPE",
    "CANONICAL_TYPE", "RESULT_SCHEMA", "RESULT_FIELDS",
    "FRONTIER_SCHEMA", "SEEN_SCHEMA", "IMAGE_SCHEMA", "PAGE_SCHEMA",
    "ROBOTS_FIXTURE_SCHEMA", "PAYLOAD_TYPE", "METRICS_SCHEMA",
    "bigquery_json",
]

ADDRESS_TYPE = T.StructType(
    [
        T.StructField("Full", T.StringType()),
        T.StructField("Scheme", T.StringType()),
        T.StructField("Opaque", T.StringType()),
        T.StructField("Host", T.StringType()),
        T.StructField("Path", T.StringType()),
        T.StructField("Query", T.StringType()),
    ]
)

PAIR_TYPE = T.StructType(
    [T.StructField("K", T.StringType()), T.StructField("V", T.StringType())]
)

LINK_TYPE = T.StructType(
    [
        T.StructField("Address", ADDRESS_TYPE),
        T.StructField("Anchor", T.StringType()),
        T.StructField("Href", T.StringType()),
        T.StructField("Nofollow", T.BooleanType()),
    ]
)

HREFLANG_TYPE = T.StructType(
    [
        T.StructField("Address", ADDRESS_TYPE),
        T.StructField("Href", T.StringType()),
        T.StructField("Hreflang", T.StringType()),
    ]
)

CANONICAL_TYPE = T.StructType(
    [
        T.StructField("Address", ADDRESS_TYPE),
        T.StructField("Href", T.StringType()),
    ]
)

PAYLOAD_TYPE = T.StructType(
    [
        T.StructField("ImageId", T.StringType()),
        T.StructField("Caption", T.StringType()),
        T.StructField("Fmt", T.StringType()),
        T.StructField("W", T.IntegerType()),
        T.StructField("H", T.IntegerType()),
        T.StructField("Phash", T.LongType()),
        T.StructField("Psnr", T.DoubleType()),
        T.StructField("PixelsOk", T.BooleanType()),
    ]
)

# Field order matches result.go:18-43 / schema.json.
RESULT_FIELDS = [
    T.StructField("Address", ADDRESS_TYPE),
    T.StructField("Depth", T.LongType(), nullable=False),
    T.StructField("BodyTextHash", T.StringType()),
    T.StructField("Description", T.StringType()),
    T.StructField("Title", T.StringType()),
    T.StructField("H1", T.StringType()),
    T.StructField("Robots", T.StringType()),
    T.StructField("Canonical", CANONICAL_TYPE),
    T.StructField("Links", T.ArrayType(LINK_TYPE)),
    T.StructField("Hreflang", T.ArrayType(HREFLANG_TYPE)),
    T.StructField("Status", T.StringType()),
    T.StructField("StatusCode", T.LongType()),
    T.StructField("Proto", T.StringType()),
    T.StructField("ProtoMajor", T.LongType()),
    T.StructField("ProtoMinor", T.LongType()),
    T.StructField("Header", T.ArrayType(PAIR_TYPE)),
    T.StructField("ResolvesTo", ADDRESS_TYPE),
]

RESULT_SCHEMA = T.StructType(RESULT_FIELDS)

# engine-side columns appended to every emitted result row
RESULT_ENGINE_FIELDS = [
    T.StructField("Priority", T.IntegerType(), nullable=False),
    T.StructField("UrlKey", T.StringType(), nullable=False),
    T.StructField("Payload", PAYLOAD_TYPE),
]

FRONTIER_SCHEMA = T.StructType(
    [
        # url_key: the canonical dedup/seen/ordering key (go-parity
        # serialization, or extended RFC-3986 normal form when
        # cfg.canon_mode == "extended"). fetch_url: the URL actually
        # requested (go-parity resolved form) — equal to url_key in
        # go-parity mode.
        T.StructField("url_key", T.StringType(), nullable=False),
        T.StructField("fetch_url", T.StringType(), nullable=False),
        T.StructField("depth", T.IntegerType(), nullable=False),
        T.StructField("priority", T.IntegerType(), nullable=False),
        T.StructField("seed_order", T.IntegerType()),
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_key", T.StringType(), nullable=False),
        T.StructField("wave", T.IntegerType(), nullable=False),
    ]
)

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("proto", T.StringType()),
        T.StructField("proto_major", T.IntegerType()),
        T.StructField("proto_minor", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("headers", T.ArrayType(PAIR_TYPE)),
        T.StructField("html", T.StringType()),
        T.StructField("image_id", T.StringType()),
    ]
)

ROBOTS_FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("scheme", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("body", T.StringType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave", T.IntegerType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("blocked", T.LongType()),
        T.StructField("candidates", T.LongType()),
        T.StructField("deduped", T.LongType()),
        T.StructField("enqueued", T.LongType()),
        T.StructField("seconds", T.DoubleType()),
    ]
)

# standard-SQL type names, matching the reference generator exactly
# (gen.go:107-126: string->STRING, int->INT64, bool->BOOL, float64->FLOAT64)
_BQ_TYPE = {
    "string": "STRING",
    "long": "INT64",
    "integer": "INT64",
    "boolean": "BOOL",
    "double": "FLOAT64",
}


def _bq_field(f: T.StructField) -> dict:
    name = f.name
    dt = f.dataType
    mode = "REQUIRED" if not f.nullable else "NULLABLE"
    if isinstance(dt, T.ArrayType):
        mode = "REPEATED"
        dt = dt.elementType
    if isinstance(dt, T.StructType):
        return {
            "name": name,
            "type": "RECORD",
            "mode": mode,
            "fields": [_bq_field(sf) for sf in dt.fields],
        }
    return {"name": name, "type": _BQ_TYPE[dt.typeName()], "mode": mode}


def bigquery_json(schema: T.StructType = RESULT_SCHEMA, indent: int = 4) -> str:
    """Serialize a StructType as a BigQuery JSON schema — parity with
    `crawl schema` (/root/reference/schema/interface.go:8-12, type
    mapping gen.go:107-126)."""
    return json.dumps([_bq_field(f) for f in schema.fields], indent=indent)
