"""SKOS JSON-LD transformer tests mirroring the reference's golden-file tests
(ref: ingestor/src/test/.../TransformerTest.scala:10-81 — fixtures synthesized
here, not copied; shapes match the LoC bulk-export lines)."""

from __future__ import annotations

import json

import pytest

from concepts_pipeline_spark.operators.skos import (
    filter_geographic_subdivisions,
    skos_transform,
)


def skos_line(
    path="/authorities/subjects/sh0001",
    pref_label=...,
    alt_label=...,
    with_graph=True,
    extra_nodes=(),
):
    doc = {"@id": path, "@context": "ctx"}
    if with_graph:
        node = {"@id": f"http://id.loc.gov{path}"}
        if pref_label is not ...:
            if pref_label is not None:
                node["skos:prefLabel"] = pref_label
        else:
            node["skos:prefLabel"] = "default label"
        if alt_label is not ... and alt_label is not None:
            node["skos:altLabel"] = alt_label
        doc["@graph"] = [
            {"@id": "http://id.loc.gov/authorities/subjects/zz9",
             "skos:prefLabel": "distractor"},
            *extra_nodes,
            node,
        ]
    return json.dumps(doc)


def run(spark, *lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
    return sorted(
        (r.asDict() for r in skos_transform(df, "line", "lc-subjects").collect()),
        key=lambda r: r["identifier"],
    )


def test_string_pref_label(spark):
    out = run(spark, skos_line(pref_label="Sanitation"))
    assert out == [{"authority": "lc-subjects", "identifier": "sh0001",
                    "label": "Sanitation", "alternative_labels": []}]


def test_object_pref_label_and_mixed_alt_labels(spark):
    out = run(spark, skos_line(
        pref_label={"@language": "en", "@value": "Libraries"},
        alt_label=[{"@value": "Bibliothecas"}, "Book houses"],
    ))
    assert out[0]["label"] == "Libraries"
    assert out[0]["alternative_labels"] == ["Bibliothecas", "Book houses"]


def test_scalar_alt_label_normalized_to_singleton(spark):
    out = run(spark, skos_line(pref_label="Ada", alt_label="Countess"))
    assert out[0]["alternative_labels"] == ["Countess"]


def test_deprecated_record_without_pref_label_dropped(spark):
    assert run(spark, skos_line(pref_label=None)) == []


def test_missing_graph_dropped(spark):
    assert run(spark, skos_line(with_graph=False)) == []


def test_root_node_found_by_id_suffix_not_position(spark):
    # root node is matched by @id suffix; unrelated nodes with labels are ignored
    out = run(spark, skos_line(
        pref_label="Right",
        extra_nodes=(
            {"@id": "http://id.loc.gov/authorities/subjects/sh777",
             "skos:prefLabel": "Wrong"},
        ),
    ))
    assert [r["label"] for r in out] == ["Right"]


def test_identifier_is_path_leaf(spark):
    out = run(spark, skos_line(path="/authorities/names/n12345", pref_label="X"))
    assert out[0]["identifier"] == "n12345"


def test_geographic_subdivision_filter(spark):
    df = spark.createDataFrame(
        [(skos_line(path="/authorities/subjects/sh1-781", pref_label="Geo"),),
         (skos_line(path="/authorities/subjects/sh2", pref_label="Keep"),)],
        ["line"],
    )
    out = filter_geographic_subdivisions(skos_transform(df, "line", "lc-subjects"))
    assert [r["identifier"] for r in out.collect()] == ["sh2"]
