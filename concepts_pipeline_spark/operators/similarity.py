"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH bucketing as
the scale path (candidates via equi-join on signature prefix, re-ranked exactly).
Scalar math is JVM-side higher-order functions (zip_with / aggregate); the one
deliberate Python hop is IVF centroid assignment, where an Arrow-batched numpy
matmul beats both a per-row expression fold and (decisively) a thousand-literal
inlined centroid expression that Catalyst re-optimizes per plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v) -> F.Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.

    The query vector is a literal array → broadcast to every task for free; the scan
    is embarrassingly parallel, followed by a global top-k (TakeOrderedAndProject —
    no full sort)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(key_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(key_col))
        .limit(k)
    )


def _hyperplane_component(seed: int, p: int, i: int) -> float:
    """Deterministic "random" hyperplane component in [-1, 1] from
    (seed, plane, dim index). SINGLE source of truth: the data-side signature
    (hyperplane_signature) and the query-side signature (ann_lsh_topk) must use
    bit-identical components or the hamming prune silently returns garbage.

    Derived from blake2b over the struct-packed key — spec'd bytes, identical
    on every Python version/build (unlike the previous tuple ``hash()``, which
    is CPython-implementation-defined)."""
    import hashlib
    import struct

    digest = hashlib.blake2b(
        struct.pack("<qqq", seed, p, i), digest_size=4
    ).digest()
    h = int.from_bytes(digest, "little")
    return (h / 0xFFFFFFFF) * 2.0 - 1.0


def hyperplane_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    planes: int = 16,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Sign-bit signature under `planes` pseudo-random hyperplanes.

    Hyperplane components are deterministic blake2b-derived values in [-1,1] —
    reproducible across sessions and Python builds without shipping a matrix."""
    sig = None
    for p in range(planes):
        plane = [_hyperplane_component(seed, p, i) for i in range(dim)]
        d = _dot(F.col(vec_col), F.array(*[F.lit(c) for c in plane]))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig.bitwiseOR(term)
    return df.select(F.col(key_col), F.col(vec_col), sig.alias("signature"))


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    num_lists: int = 16,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """IVF-flat index build: pick ``num_lists`` deterministic centroids (the
    vectors whose xxhash64(key) ranks lowest — a seeded sample, no iteration),
    assign every vector to its nearest centroid. Returns (assignments, centroids).

    Centroid metadata is O(num_lists) — collected once and captured in an
    Arrow-vectorized pandas UDF closure as a numpy matrix, so the assignment is
    a MAP-ONLY scan (one batched matmul argmin per Arrow batch): no join node,
    no shuffle. (A pure-expression alternative — the centroid matrix inlined as
    ~num_lists×dim literal nodes — is measured 10×+ slower at dim 64: Catalyst
    re-optimizes the thousand-literal tree on every plan using it.) At cluster
    scale the posting lists are then written bucketed by ``list_id`` so a probe
    reads only its lists' files. Ties on distance break to the smaller list_id
    (argmin first occurrence over id-sorted centroids)."""
    from pyspark.sql.types import StringType

    spark = df.sparkSession
    # hash_fn='md5': engine-portable centroid rank (first 60 bits of
    # md5(key || '-ivf-' || seed)) so an external oracle (DuckDB) re-derives
    # the identical centroid set — the same pattern as dedup's md5 modes.
    # xxhash64 stays the default (cheaper, JVM-native).
    if hash_fn == "md5":
        rank = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(key_col).cast("string"), F.lit(f"-ivf-{seed}")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    elif hash_fn == "xxhash64":
        rank = F.xxhash64(F.col(key_col).cast("string"), F.lit(seed))
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    cents = (
        df.select(F.col(key_col), F.col(vec_col), rank.alias("__rk"))
        .orderBy("__rk")
        .limit(num_lists)
        .collect()
    )
    cent_rows = sorted(
        (str(r[key_col]), [float(x) for x in r[vec_col]]) for r in cents
    )
    if not cent_rows:  # empty input table (or all-zero-norm upstream filter)
        empty_assign = df.select(
            F.col(key_col), F.col(vec_col),
            F.lit(None).cast("string").alias("list_id"),
        ).limit(0)
        return empty_assign, spark.createDataFrame(
            [], "list_id string, centroid array<double>"
        )
    centroids = spark.createDataFrame(
        cent_rows, "list_id string, centroid array<double>"
    )
    C = np.stack([v for _, v in cent_rows])
    c_sq = (C * C).sum(axis=1)
    ids = np.array([i for i, _ in cent_rows], dtype=object)

    @F.pandas_udf(StringType())
    def nearest(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch from an empty partition
            return pd.Series([], dtype=object)
        V = np.stack(vs.to_numpy())
        # argmin ‖v−c‖² = argmin (−2 v·c + ‖c‖²); ‖v‖² is constant per row
        d2 = -2.0 * (V @ C.T) + c_sq[None, :]
        return pd.Series(ids[np.argmin(d2, axis=1)])

    assign = df.select(
        F.col(key_col), F.col(vec_col), nearest(F.col(vec_col)).alias("list_id")
    )
    return assign, centroids


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
    num_lists: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """IVF approximate top-k: rank centroids by distance to the query, search
    only the ``n_probe`` nearest posting lists, exact cosine re-rank inside."""
    assign, centroids = ivf_assign(df, vec_col, key_col, num_lists, seed, hash_fn)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cdist = F.aggregate(
        F.zip_with(F.col("centroid"), q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe = [
        r["list_id"]
        for r in centroids.select("list_id", cdist.alias("d"))
        .orderBy("d", "list_id")
        .limit(n_probe)
        .collect()
    ]
    candidates = assign.filter(F.col("list_id").isin(probe))
    return cosine_topk(candidates, query_vec, vec_col, key_col, k)


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    k: int = 10,
    planes: int = 16,
    max_hamming: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: prune to vectors whose hyperplane signature is within
    `max_hamming` bits of the query's, then exact cosine re-rank.

    At cluster scale the signature column is precomputed/persisted and the prune is a
    cheap scan filter; only the surviving fraction pays the full dot product."""
    dim = len(query_vec)
    sig_df = hyperplane_signature(df, vec_col, key_col, planes, dim, seed)

    qsig = 0
    for p in range(planes):
        d = sum(query_vec[i] * _hyperplane_component(seed, p, i) for i in range(dim))
        if d > 0:
            qsig |= 1 << p
    candidates = sig_df.filter(
        F.bit_count(F.col("signature").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return cosine_topk(candidates, query_vec, vec_col, key_col, k)
