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


# The closed IdentifierType enum with its display labels
# (ref: common/src/main/scala/weco/concepts/common/model/Identifier.scala:44-84).
AUTHORITY_LABELS = {
    "fihrist": "Fihrist Authority",
    "label-derived": "Identifier derived from the label of the referent",
    "lc-names": "Library of Congress Name authority records",
    "lc-subjects": "Library of Congress Subject Headings (LCSH)",
    "nlm-mesh": "Medical Subject Headings (MeSH) identifier",
    "viaf": "VIAF: The Virtual International Authority File",
}


def record_concept_docs(records: DataFrame) -> DataFrame:
    """Serialize merged concept rows into the final nested ``{query, display}``
    document — the reference pipeline's end product
    (ref: common/src/main/scala/weco/concepts/common/model/Concept.scala:20-51,
    field-for-field: flat typed-id identifiers in ``query``, expanded
    ``IdentifierType`` objects in ``display``, ``sameAs`` only in ``display``).

    Input: the output of :func:`record_concepts`. Output: (canonical_id, doc)
    where doc is the canonical JSON string (nulls kept, field order as in the
    reference's ``toDoc``). One ``F.struct`` projection — pure JVM expressions.
    """
    auth_label = F.element_at(
        F.create_map(*[F.lit(x) for kv in AUTHORITY_LABELS.items() for x in kv]),
        F.col("authority"),
    )
    query = F.struct(
        F.col("canonical_id").alias("id"),
        F.array(
            F.struct(
                F.col("identifier").alias("value"),
                F.col("authority").alias("identifierType"),
            )
        ).alias("identifiers"),
        F.col("label").alias("label"),
        F.col("alternative_labels").alias("alternativeLabels"),
        F.col("ontology_type").alias("type"),
    )
    display = F.struct(
        F.col("canonical_id").alias("id"),
        F.array(
            F.struct(
                F.struct(
                    F.col("authority").alias("id"),
                    auth_label.alias("label"),
                    F.lit("IdentifierType").alias("type"),
                ).alias("identifierType"),
                F.col("identifier").alias("value"),
                F.lit("Identifier").alias("type"),
            )
        ).alias("identifiers"),
        F.col("label").alias("label"),
        F.col("alternative_labels").alias("alternativeLabels"),
        F.col("ontology_type").alias("type"),
        F.col("same_as").alias("sameAs"),
    )
    doc = F.to_json(
        F.struct(query.alias("query"), display.alias("display")),
        {"ignoreNullFields": "false"},
    )
    return records.select("canonical_id", doc.alias("doc"))
