"""Recorder-merge precedence tests, table-driven like the reference's
MergeConceptsTest (ref: recorder/src/test/.../MergeConceptsTest.scala:23-36
specificity tables; merge arms at 11-65)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concepts_pipeline_spark.operators.merge_ops import most_specific_type
from concepts_pipeline_spark.operators.record import record_concepts

CAT_COLS = ["authority", "identifier", "label", "canonical_ids", "ontology_types"]
AUTH_COLS = ["authority", "identifier", "label", "alternative_labels"]


def cat_row(auth="lc-subjects", ident="sh1", label="cat label",
            ids=("id1",), types=("Concept",)):
    return (auth, ident, label, list(ids), list(types))


def auth_row(auth="lc-subjects", ident="sh1", label="auth label",
             alts=("alt1", "alt2")):
    return (auth, ident, label, list(alts))


CAT_SCHEMA = ("authority string, identifier string, label string, "
              "canonical_ids array<string>, ontology_types array<string>")
AUTH_SCHEMA = ("authority string, identifier string, label string, "
               "alternative_labels array<string>")


def run(spark, cats, auths):
    c = spark.createDataFrame(cats, CAT_SCHEMA)
    a = spark.createDataFrame(auths, AUTH_SCHEMA)
    return {r["canonical_id"]: r.asDict() for r in record_concepts(c, a).collect()}


def test_authoritative_label_and_alts_win(spark):
    out = run(spark, [cat_row()], [auth_row()])
    assert out["id1"]["label"] == "auth label"
    assert out["id1"]["alternative_labels"] == ["alt1", "alt2"]


def test_catalogue_only_passes_through_with_empty_alts(spark):
    out = run(spark, [cat_row(ident="sh9")], [auth_row()])  # no auth match for sh9
    assert out["id1"]["label"] == "cat label"
    assert out["id1"]["alternative_labels"] == []


def test_fan_out_per_canonical_id_with_same_as(spark):
    out = run(spark, [cat_row(ids=("idA", "idB", "idC"))], [auth_row()])
    assert set(out) == {"idA", "idB", "idC"}
    assert out["idA"]["same_as"] == ["idB", "idC"]
    assert out["idB"]["same_as"] == ["idA", "idC"]


# specificity table mirroring MergeConceptsTest.scala:23-36
@pytest.mark.parametrize(
    "types,expected",
    [
        (["Person"], "Person"),
        (["Agent", "Person"], "Person"),
        (["Agent", "Concept"], "Agent"),
        (["Concept"], "Concept"),
        (["Agent"], "Agent"),
        (["Concept", "Genre", "Place"], "Genre"),  # first specific in order
        ([], None),
    ],
)
def test_most_specific_type_table(spark, types, expected):
    df = spark.createDataFrame([(types,)], "t array<string>")
    got = df.select(most_specific_type(F.col("t")).alias("s")).first()["s"]
    assert got == expected


def test_ontology_type_applied_in_merge(spark):
    out = run(
        spark,
        [cat_row(ids=("x",), types=("Agent", "Concept", "Person"))],
        [],
    )
    assert out["x"]["ontology_type"] == "Person"


def test_concept_doc_golden(spark):
    """Field-for-field golden doc vs the reference's Concept.toDoc shape
    (ref: common/src/main/scala/weco/concepts/common/model/Concept.scala:20-51)."""
    import json

    from concepts_pipeline_spark.operators.record import record_concept_docs

    c = spark.createDataFrame(
        [cat_row(auth="viaf", ident="n1", ids=("idA", "idB"), types=("Person",))],
        CAT_SCHEMA,
    )
    a = spark.createDataFrame(
        [auth_row(auth="viaf", ident="n1", label="A. Uthor", alts=("Author, A.",))],
        AUTH_SCHEMA,
    )
    docs = {r["canonical_id"]: r["doc"] for r in record_concept_docs(record_concepts(c, a)).collect()}
    got = json.loads(docs["idA"])
    assert got == {
        "query": {
            "id": "idA",
            "identifiers": [{"value": "n1", "identifierType": "viaf"}],
            "label": "A. Uthor",
            "alternativeLabels": ["Author, A."],
            "type": "Person",
        },
        "display": {
            "id": "idA",
            "identifiers": [
                {
                    "identifierType": {
                        "id": "viaf",
                        "label": "VIAF: The Virtual International Authority File",
                        "type": "IdentifierType",
                    },
                    "value": "n1",
                    "type": "Identifier",
                }
            ],
            "label": "A. Uthor",
            "alternativeLabels": ["Author, A."],
            "type": "Person",
            "sameAs": ["idB"],
        },
    }
    # key order matches the reference's toDoc serialization order
    assert list(got) == ["query", "display"]
    assert list(got["display"]) == [
        "id", "identifiers", "label", "alternativeLabels", "type", "sameAs",
    ]
