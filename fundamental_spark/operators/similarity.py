"""Similarity search over embedding columns (array<float>).

- ``cosine`` / ``dot``: JVM higher-order functions (zip_with +
  aggregate in double precision) — no Python, no UDF.
- ``brute_force_topk``: exact top-k neighbors for a (small) query set:
  broadcast the queries, score every corpus vector, rank per query
  with a window. O(|Q|·|corpus|) scoring but fully distributed; the
  correct baseline and the verifier for approximate methods.
- ``lsh_topk``: random-hyperplane LSH (deterministic planes derived
  from fixed constants): bucket vectors by sign signature, search only
  same-bucket (multi-probe: hamming-1 buckets optional) — the scale
  path; recall measured against brute force in tests.
- ``embedding_near_dup_pairs``: all pairs ≥ cosine threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, cos) — exact top-k by cosine.
    Queries are broadcast; scoring runs where the corpus lives."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


_PLANE_SEED = 0x2545F4914F6CDD1D


def _plane_constants(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (xorshift-derived,
    mapped to [-1, 1]); fixed at import — no runtime RNG."""
    planes = []
    x = _PLANE_SEED
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((x % 2000003) / 1000001.5) - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign signature as a long: bit i = (vec · plane_i) > 0."""
    planes = _plane_constants(n_planes, dim)
    sig = F.lit(0).cast("long")
    vd = _to_double(vec)
    for i, p in enumerate(planes):
        d = dot(vd, F.array(*[F.lit(c) for c in p]))
        sig = sig.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket (plus all
    hamming-1 probes of the query signature), then exact cosine rank
    within candidates. At corpus scale the bucket join replaces the
    full scan; recall vs brute force is measured in tests."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_signature(F.col(vec_col), n_planes, dim).alias("qsig"),
    )
    # multi-probe: query probes its own bucket + all hamming-1 buckets
    probes = q.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("qsig"),
                *[
                    F.col("qsig").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(probes), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 4).alias("cos"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup dedup).
    Self-join guarded by id< ordering; at scale the LSH bucketing
    (lsh_topk's bucket column) prunes the cross product first."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("va"), F.col("vb"))
    return pairs.select(
        "id_a", "id_b", F.round(cos, 4).alias("cos")
    ).filter(F.col("cos") >= threshold)
