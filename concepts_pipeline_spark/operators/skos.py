"""LoC SKOS JSON-LD transformer (SURVEY §2.2 P1/P2/P3) — pure Catalyst expressions.

The reference parses each bulk-export line, finds the root node in ``@graph``
whose ``@id`` ends with the document's ``@id`` path, and projects
``skos:prefLabel`` / ``skos:altLabel`` tolerating the JSON-LD polymorphism where
a label is either a bare string or an ``{"@value": ...}`` object, and altLabel
is scalar-or-array (ref: ingestor/src/main/scala/weco/concepts/ingestor/stages/
Transformer.scala:29-75; scalar/array normalization: common/.../json/
JsonOps.scala:50-74). Records with no prefLabel (deprecated entries) yield None
→ dropped (Transformer.scala:14-21), and LCSH geographic subdivisions
(ids ending ``-781``) are filtered before the sink (ingestor/IngestStream.scala:68-82).

Spark-first: VariantType (`parse_json` + `try_variant_get`) handles the
shape-polymorphism that a fixed `from_json` schema cannot, and the whole
transform stays JVM-side — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _label_value(node_or_scalar) -> F.Column:
    """string | {"@value": string} → string (null on any other shape).

    The ``@value`` branch is tried first: a variant-to-string cast SERIALIZES an
    object to its JSON text instead of failing, so the bare-string branch must
    be the fallback, guarded to scalars only."""
    return F.coalesce(
        F.try_variant_get(node_or_scalar, "$['@value']", "string"),
        F.when(
            F.schema_of_variant(node_or_scalar) == "STRING",
            F.try_variant_get(node_or_scalar, "$", "string"),
        ),
    )


def skos_transform(
    df: DataFrame, json_col: str, authority: str
) -> DataFrame:
    """One authoritative concept per JSON-LD line:
    (authority, identifier, label, alternativeLabels).

    Rows whose root node is missing or has no prefLabel are dropped (the
    reference's None-emitting deprecated records)."""
    v = F.parse_json(F.col(json_col))
    concept_id = F.try_variant_get(v, "$['@id']", "string")
    nodes = F.try_variant_get(v, "$['@graph']", "array<variant>")
    node = F.try_element_at(
        F.filter(
            F.coalesce(nodes, F.array().cast("array<variant>")),
            lambda n: F.coalesce(
                F.try_variant_get(n, "$['@id']", "string").endswith(concept_id),
                F.lit(False),
            ),
        ),
        F.lit(1),
    )
    label = _label_value(F.try_variant_get(node, "$['skos:prefLabel']", "variant"))
    # altLabel: absent → [], scalar → [x], array → array (JsonOps.asSeq semantics)
    alt_array = F.try_variant_get(node, "$['skos:altLabel']", "array<variant>")
    alt_scalar = F.try_variant_get(node, "$['skos:altLabel']", "variant")
    alts_raw = F.coalesce(
        alt_array,
        F.when(alt_scalar.isNotNull(), F.array(alt_scalar)),
        F.array().cast("array<variant>"),
    )
    alt_labels = F.filter(
        F.transform(alts_raw, _label_value), lambda x: x.isNotNull()
    )
    identifier = F.element_at(F.split(concept_id, "/"), -1)
    out = df.select(
        F.lit(authority).alias("authority"),
        identifier.alias("identifier"),
        label.alias("label"),
        alt_labels.alias("alternative_labels"),
    )
    return out.filter(F.col("label").isNotNull() & F.col("identifier").isNotNull())


def filter_geographic_subdivisions(
    df: DataFrame, identifier_col: str = "identifier"
) -> DataFrame:
    """Drop LCSH ids ending '-781' (geographic subdivision duplicates,
    ref: ingestor/IngestStream.scala:68-82)."""
    return df.filter(~F.col(identifier_col).endswith("-781"))
