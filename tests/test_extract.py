"""Concept-extraction tests mirroring the reference's test strategy
(ref: aggregator/src/test/.../ConceptExtractorTest.scala — type × authority
tables at 280-350, malformation table at 383-479; SURVEY §5 "generative
scenario tests"). Fixtures are synthesized here, not copied."""

from __future__ import annotations

import json

import pytest

from concepts_pipeline_spark.operators.extract import (
    AUTHORITIES,
    CONCEPT_TYPES,
    extract_concepts,
    extract_concepts_from_json,
)


def concept(
    cid="cafebeef",
    ctype="Concept",
    label="a label",
    identifiers=...,
    authority="lc-subjects",
    value="sh12345",
    concepts=None,
):
    c = {"id": cid, "type": ctype, "label": label}
    if identifiers is ...:
        c["identifiers"] = [{"value": value, "identifierType": {"id": authority}}]
    elif identifiers is not None:
        c["identifiers"] = identifiers
    if concepts is not None:
        c["concepts"] = concepts
    return c


def work(*concept_blocks, wid="w1"):
    return json.dumps({"id": wid, "type": "Work", "subjects": list(concept_blocks)})


# --- type × authority acceptance table (ref: ConceptExtractorTest.scala:280-350)

@pytest.mark.parametrize("ctype", sorted(CONCEPT_TYPES))
@pytest.mark.parametrize("authority", sorted(AUTHORITIES))
def test_all_type_authority_combinations_extract(ctype, authority):
    out = extract_concepts_from_json(work(concept(ctype=ctype, authority=authority)))
    assert [c["canonical_id"] for c in out] == ["cafebeef"]
    assert out[0]["ontology_type"] == ctype
    assert out[0]["authority"] == authority


def test_non_concept_types_ignored():
    for ctype in ["Work", "Item", "ProductionEvent", "Language"]:
        assert extract_concepts_from_json(work(concept(ctype=ctype))) == []


# --- malformation table (ref: ConceptExtractorTest.scala:383-479)

@pytest.mark.parametrize(
    "broken",
    [
        concept(identifiers=None),  # no identifiers property → not a concept
        concept(identifiers=[]),  # empty identifiers → dropped
        concept(  # multiple source identifiers → dropped
            identifiers=[
                {"value": "a", "identifierType": {"id": "viaf"}},
                {"value": "b", "identifierType": {"id": "lc-names"}},
            ]
        ),
        concept(authority="wibble"),  # unknown authority → dropped
        concept(label=None),  # missing label → dropped
        concept(cid=None),  # missing canonical id → dropped
        concept(identifiers=[{"identifierType": {"id": "viaf"}}]),  # no value
        concept(identifiers=[{"value": "x"}]),  # no identifierType
    ],
)
def test_malformed_concepts_dropped(broken):
    doc = {k: v for k, v in broken.items() if v is not None}
    assert extract_concepts_from_json(work(doc)) == []


def test_malformed_does_not_poison_siblings():
    out = extract_concepts_from_json(
        work(concept(authority="wibble", cid="bad1"), concept(cid="good1"))
    )
    assert [c["canonical_id"] for c in out] == ["good1"]


# --- ontology type inference (ref: ConceptExtractor.scala:119-124)

def test_compound_type_inference():
    no_subs = concept(cid="a", ctype="Subject", concepts=[])
    one_sub = concept(cid="b", ctype="Subject", concepts=[{"type": "Genre"}])
    two_subs = concept(
        cid="c", ctype="Subject", concepts=[{"type": "Genre"}, {"type": "Place"}]
    )
    out = {c["canonical_id"]: c["ontology_type"]
           for c in extract_concepts_from_json(work(no_subs, one_sub, two_subs))}
    assert out == {"a": "Subject", "b": "Genre", "c": "Concept"}


# --- recursion + per-document dedup (ref: ConceptExtractor.scala:26, 33-49)

def test_nested_concepts_extracted_and_deduplicated():
    nested = concept(
        cid="outer",
        ctype="Subject",
        concepts=[concept(cid="inner", ctype="Person", value="n1", authority="lc-names")],
    )
    dup = concept(cid="outer")  # same canonicalId again, elsewhere in the doc
    out = extract_concepts_from_json(work(nested, dup))
    ids = [c["canonical_id"] for c in out]
    assert sorted(ids) == ["inner", "outer"]
    assert len(ids) == len(set(ids))  # first-wins dedup


def test_deeply_nested_found_at_any_depth():
    deep = {"a": {"b": [{"c": {"d": concept(cid="deep")}}]}}
    doc = json.dumps({"id": "w", "type": "Work", "stuff": deep})
    assert [c["canonical_id"] for c in extract_concepts_from_json(doc)] == ["deep"]


def test_garbage_inputs():
    assert extract_concepts_from_json(None) == []
    assert extract_concepts_from_json("") == []
    assert extract_concepts_from_json("not json {") == []
    assert extract_concepts_from_json("[1, 2, 3]") == []


# --- Spark-side explode plumbing

def test_extract_concepts_dataframe(spark):
    rows = [
        ("w1", work(concept(cid="x"), wid="w1")),
        ("w2", work(concept(cid="y", ctype="Person"), wid="w2")),
        ("w3", json.dumps({"id": "w3", "nothing": True})),
    ]
    df = spark.createDataFrame(rows, ["work_id", "doc"])
    out = extract_concepts(df, "doc", "work_id")
    got = {(r["work_id"], r["canonical_id"], r["ontology_type"]) for r in out.collect()}
    assert got == {("w1", "x", "Concept"), ("w2", "y", "Person")}
