"""write_data_files metric_cols: exact non-null counts per (bucket, column)
recovered from parquet footer null_counts, columns invisible to readers."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from concepts_pipeline_spark.lake import LakeTable

SCHEMA = StructType(
    [
        StructField("k", LongType(), False),
        StructField("v", IntegerType(), True),
    ]
)


def test_metric_cols_counts_and_reader_invisibility(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, ["k"], num_buckets=4)
    df = spark.createDataFrame([(i, i * 10) for i in range(200)], SCHEMA)
    tagged = df.select(
        "k",
        "v",
        F.when(F.col("k") % 3 == 0, F.lit(1).cast("tinyint")).alias("__m_a"),
        F.when(F.col("k") % 3 != 0, F.lit(1).cast("tinyint")).alias("__m_b"),
    )
    m = t.manifest()
    entries, counts = t.write_data_files(
        tagged, m, schema_id=0, metric_cols=["__m_a", "__m_b"]
    )
    t.commit(m, entries, summary={"operation": "test"})

    # counts are exact per bucket and sum to the true totals
    total_a = sum(n for (b, c), n in counts.items() if c == "__m_a")
    total_b = sum(n for (b, c), n in counts.items() if c == "__m_b")
    n_a = sum(1 for i in range(200) if i % 3 == 0)
    assert (total_a, total_b) == (n_a, 200 - n_a)
    assert {b for (b, _), _n in counts.items()} <= {0, 1, 2, 3}

    # per-bucket counts agree with a Spark-side recount
    want = {
        (r["b"], "__m_a"): r["n"]
        for r in df.filter(F.col("k") % 3 == 0)
        .select(F.pmod(F.xxhash64(F.col("k")), F.lit(4)).cast("int").alias("b"))
        .groupBy("b").agg(F.count("*").alias("n")).collect()
    }
    got = {k: n for k, n in counts.items() if k[1] == "__m_a"}
    assert got == want

    # the indicator columns never reach readers
    out = t.read(spark)
    assert set(out.columns) == {"k", "v"}
    assert out.count() == 200
