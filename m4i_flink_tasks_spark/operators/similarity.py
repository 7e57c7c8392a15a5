"""Similarity search over embedding columns (``array<float>``).

Two paths, same results contract:
- ``brute_force_topk``: exact cosine against a query vector — a single
  narrow scan + top-k; the correctness baseline.
- bit-sampling LSH (``bit_sample_bucket``): quantize sign bits of a
  fixed dimension subset into a bucket key; candidate set = query's
  bucket. At 100 TB the table is written bucketed/partitioned by this
  key so a query prunes to 1/2^b of the data before any distance math.

All arithmetic is sequential double folds (zip_with + aggregate) so the
DuckDB oracle (list_transform + list_reduce, same order) reproduces the
values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_BITS = 8  # dimensions sampled for the sign-bit bucket


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def bit_sample_bucket(emb: Column, bits: int = LSH_BITS) -> Column:
    """Sign bits of the first ``bits`` dimensions folded into one key —
    deterministic bit-sampling LSH (no random planes, so the oracle can
    replicate it exactly)."""
    return F.aggregate(
        F.transform(
            F.slice(emb, 1, bits),
            lambda x: F.when(x > 0, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, bit: acc * 2 + bit,
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the vector with ``query_vec_id``.

    The one-row query side is a broadcast cross join — the fact side
    streams through once with no shuffle until the final top-k."""
    query = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(emb_col).alias("query_emb")
    )
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            F.round(cosine(F.col(emb_col), F.col("query_emb")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = LSH_BITS,
) -> DataFrame:
    """ANN top-k: restrict to the query's sign-bit bucket, then exact
    cosine — the scale path (bucket pruning) with the same output shape
    as brute force."""
    with_bucket = embeddings.withColumn("bucket", bit_sample_bucket(F.col(emb_col), bits))
    query = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(emb_col).alias("query_emb"), F.col("bucket").alias("query_bucket")
    )
    return (
        with_bucket.filter(F.col(id_col) != query_vec_id)
        .join(
            F.broadcast(query),
            F.col("bucket") == F.col("query_bucket"),
        )
        .select(
            id_col,
            F.round(cosine(F.col(emb_col), F.col("query_emb")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )


def cosine_pairs_above(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bits: int = LSH_BITS,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket self-join + exact cosine
    verify. The bucket equality keeps the join from being O(n²)."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(emb_col).alias("emb"),
        bit_sample_bucket(F.col(emb_col), bits).alias("bucket"),
    )
    left = with_bucket.alias("l")
    right = with_bucket.alias("r")
    return (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(
            F.col("l.vid").alias("id_a"),
            F.col("r.vid").alias("id_b"),
            F.round(cosine(F.col("l.emb"), F.col("r.emb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_probe_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_probe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str = "label",
) -> DataFrame:
    """IVF ANN: coarse-quantize (centroid per cluster), probe the
    ``n_probe`` nearest clusters, exact cosine rerank within them.

    The cluster assignment is the given ``label`` column (the k-means
    build step's output); centroid components are sum/count per
    dimension so the oracle reproduces them. At 100 TB the table is
    partitioned by cluster id, so a probe scans n_probe/n_clusters of
    the data — the IVF pruning contract — while the centroid table is
    tiny and broadcast.
    """
    query = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(emb_col).alias("query_emb")
    )
    base = embeddings.filter(F.col(id_col) != query_vec_id)

    cents = base.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.element_at(emb_col, i + 1).cast("double")).alias(f"_s{i}")
            for i in range(dim)
        ],
    )
    centroid = F.array(*[F.col(f"_s{i}") / F.col("_n") for i in range(dim)])
    probed = (
        cents.select(cluster_col, centroid.alias("centroid"))
        .crossJoin(F.broadcast(query))
        .select(
            cluster_col,
            F.round(cosine(F.col("centroid"), F.col("query_emb")), 6).alias(
                "centroid_sim"
            ),
        )
        .orderBy(F.desc("centroid_sim"), cluster_col)
        .limit(n_probe)
    )
    return (
        base.join(F.broadcast(probed.select(cluster_col)), cluster_col, "left_semi")
        .crossJoin(F.broadcast(query))
        .select(
            id_col,
            cluster_col,
            F.round(cosine(F.col(emb_col), F.col("query_emb")), 6).alias(
                "cosine_sim"
            ),
        )
        .orderBy(F.desc("cosine_sim"), id_col)
        .limit(k)
    )
