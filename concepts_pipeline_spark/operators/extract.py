"""Recursive concept extraction from nested JSON documents (SURVEY §2.2 P4/P5/P6).

The reference walks arbitrary catalogue-work JSON breadth-first, collecting every
object whose ``type`` is one of nine concept types AND that has an ``identifiers``
property, validates each (exactly one source identifier, known authority, label
and id present — warn+drop otherwise), infers a compound concept's ontology type
from its sub-concepts, and de-duplicates per document by canonicalId keeping the
first occurrence (ref: aggregator/src/main/scala/weco/concepts/aggregator/
ConceptExtractor.scala:10-69, 81-118, 119-124; authorities:
common/src/main/scala/weco/concepts/common/model/Identifier.scala:44-84).

Spark-first shape: per-row recursive JSON descent is the one transform that
genuinely can't be a Catalyst expression, so it is an Arrow-vectorized pandas UDF
returning ``array<struct>`` that is then exploded — everything downstream
(filtering, accumulation, joins) stays in DataFrame land. Per the input_hint,
no per-row Python UDFs: the UDF is Arrow-batched.
"""

from __future__ import annotations

import json
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# ref: ConceptExtractor.scala:11-22
CONCEPT_TYPES = {
    "Concept", "Person", "Organisation", "Meeting", "Period",
    "Subject", "Place", "Agent", "Genre",
}

# ref: Identifier.scala:44-84 — the closed authority enum
AUTHORITIES = {
    "fihrist", "label-derived", "lc-names", "lc-subjects", "nlm-mesh", "viaf",
}

CONCEPT_SCHEMA = StructType(
    [
        StructField("canonical_id", StringType(), False),
        StructField("label", StringType(), False),
        StructField("ontology_type", StringType(), False),
        StructField("authority", StringType(), False),
        StructField("identifier_value", StringType(), False),
    ]
)


def _find_ontology_type(obj: dict) -> str | None:
    """0 sub-concepts → own type; exactly 1 → the sub-concept's type; >1 →
    literal 'Concept' (ref: ConceptExtractor.scala:119-124)."""
    subs = obj.get("concepts")
    if not isinstance(subs, list) or len(subs) == 0:
        t = obj.get("type")
        return t if isinstance(t, str) else None
    if len(subs) == 1:
        t = subs[0].get("type") if isinstance(subs[0], dict) else None
        return t if isinstance(t, str) else None
    return "Concept"


def _concept_with_source(obj: dict) -> dict | None:
    """Validation per ref CatalogueConcepts.conceptWithSource
    (ConceptExtractor.scala:81-118): exactly one identifier, known authority,
    value/label/id present — None (drop) otherwise."""
    idents = obj.get("identifiers")
    if not isinstance(idents, list) or len(idents) != 1:
        return None
    ident = idents[0]
    if not isinstance(ident, dict):
        return None
    itype = ident.get("identifierType")
    authority = itype.get("id") if isinstance(itype, dict) else None
    if authority not in AUTHORITIES:
        return None
    value = ident.get("value")
    label = obj.get("label")
    canonical = obj.get("id")
    ontology = _find_ontology_type(obj)
    if not (
        isinstance(value, str)
        and isinstance(label, str)
        and isinstance(canonical, str)
        and isinstance(ontology, str)
    ):
        return None
    return {
        "canonical_id": canonical,
        "label": label,
        "ontology_type": ontology,
        "authority": authority,
        "identifier_value": value,
    }


def _is_concept(obj: dict) -> bool:
    return obj.get("type") in CONCEPT_TYPES and "identifiers" in obj


def extract_concepts_from_json(doc: str | None) -> list[dict]:
    """Breadth-first walk mirroring the reference's tail-recursive allConcepts
    (ConceptExtractor.scala:33-49): matched concept objects are still descended
    into (nested sub-concepts get extracted in their own right); per-document
    distinct-by canonicalId keeps the first valid occurrence in BFS order."""
    if not doc:
        return []
    try:
        root = json.loads(doc)
    except (ValueError, TypeError):
        return []
    out: list[dict] = []
    seen: set[str] = set()
    queue: deque = deque([root])
    while queue:
        node = queue.popleft()
        if isinstance(node, dict):
            if _is_concept(node):
                c = _concept_with_source(node)
                if c is not None and c["canonical_id"] not in seen:
                    seen.add(c["canonical_id"])
                    out.append(c)
            queue.extend(node.values())
        elif isinstance(node, list):
            queue.extend(node)
    return out


def extract_concepts(
    df: DataFrame, json_col: str, key_col: str
) -> DataFrame:
    """(key, concept-struct) per extracted concept — Arrow-batched UDF + explode."""

    @F.pandas_udf(ArrayType(CONCEPT_SCHEMA))
    def run(docs: pd.Series) -> pd.Series:
        return docs.map(extract_concepts_from_json)

    return (
        df.select(F.col(key_col), F.explode(run(F.col(json_col))).alias("c"))
        .select(key_col, "c.*")
    )


def accumulate_catalogue_concepts(concepts: DataFrame) -> DataFrame:
    """The aggregator's per-identifier accumulation (ref: CatalogueConcept
    plural canonicalId/ontologyType, common/.../model/CatalogueConcept.scala:15-20
    + the append-fields set-union script): group extracted occurrences by
    (authority, identifier_value), union the canonical ids and ontology types,
    keep the first label by canonical-id order (deterministic)."""
    return (
        concepts.groupBy("authority", "identifier_value")
        .agg(
            F.min_by("label", F.col("canonical_id")).alias("label"),
            F.array_sort(F.collect_set("canonical_id")).alias("canonical_ids"),
            F.array_sort(F.collect_set("ontology_type")).alias("ontology_types"),
            F.count(F.lit(1)).alias("occurrences"),
        )
    )
