"""Recorder-stage merge: authoritative ⋈ catalogue → final concepts
(SURVEY §2.5 K1/K2 + §2.4 A4; ref: recorder/src/main/scala/weco/concepts/
recorder/MergeConcepts.scala:11-65 precedence, 41-50+56-65 per-canonicalId
fan-out with sameAs, 67-83 mostSpecificType; stream shape:
recorder/RecorderStream.scala:57-96 — catalogue scan left-joined to
authoritative).

The reference's fragile positional ZipWith over two ordered mget responses
(MergeConcepts.scala:39 documents the ordering assumption) becomes a plain
equi-join; Catalyst picks broadcast-hash vs sort-merge. Precedence: the
authoritative side wins label/alternativeLabels; the catalogue side supplies
canonicalIds/ontologyTypes; catalogue-only rows pass through with empty
alternativeLabels (the reference's (None, cat) arm)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .merge_ops import most_specific_type


def record_concepts(
    catalogue: DataFrame,
    authoritative: DataFrame,
    key_cols: list[str] = ("authority", "identifier"),
) -> DataFrame:
    """catalogue(authority, identifier, label, canonical_ids, ontology_types)
    LEFT JOIN authoritative(authority, identifier, label, alternative_labels)
    → one row per canonicalId:
    (canonical_id, authority, identifier, label, alternative_labels,
     ontology_type, same_as)."""
    a = authoritative.select(
        *key_cols,
        F.col("label").alias("__a_label"),
        F.col("alternative_labels").alias("__a_alts"),
    )
    joined = catalogue.join(a, on=list(key_cols), how="left")
    label = F.coalesce(F.col("__a_label"), F.col("label"))
    alts = F.coalesce(F.col("__a_alts"), F.array().cast("array<string>"))
    exploded = joined.select(
        *key_cols,
        label.alias("__label"),
        alts.alias("alternative_labels"),
        most_specific_type(F.col("ontology_types")).alias("ontology_type"),
        F.col("canonical_ids"),
        F.explode("canonical_ids").alias("canonical_id"),
    )
    return exploded.select(
        "canonical_id",
        *key_cols,
        F.col("__label").alias("label"),
        "alternative_labels",
        "ontology_type",
        # sameAs = the other canonical ids of the same identifier
        # (ref: MergeConcepts.scala:47-50)
        F.array_remove(F.col("canonical_ids"), F.col("canonical_id")).alias("same_as"),
    )
