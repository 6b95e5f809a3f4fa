"""Approximate-nearest-neighbor similarity search over embedding columns.

Not in the reference (pure string matcher); required by the training-data
pipeline mandate. Two paths over ``array<float>`` vectors:

- ``cosine_topk``       brute-force exact top-k (baseline / verifier)
- ``srp_lsh_topk``      signed-random-projection LSH buckets + rerank
                        (the 100 TB path: candidates come from an
                        equi-join on integer bucket keys, so the cross
                        join never materializes)

FP parity with the DuckDB oracle: dot products accumulate in ascending
index order in BOTH engines (Spark ``aggregate`` over ``zip_with``;
DuckDB ``list_reduce`` over an index ``range``) and results are rounded
to 6 dp before comparison, so value hashes agree.

SRP hyperplane coefficients are deterministic (seeded) and embedded as
literals in the Spark plan and in the generated oracle SQL — the same
buckets fall out of both engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from record_matcher_spark.functions import texthash as TH


def _planes(num_planes: int, dim: int) -> list[list[float]]:
    rng = random.Random(0x51AE)
    # 3-dp literals: short SQL, exactly representable comparisons are not
    # needed (sign of a dot product only), but identical literals in both
    # engines ARE.
    return [
        [round(rng.uniform(-1.0, 1.0), 3) for _ in range(dim)]
        for _ in range(num_planes)
    ]


def dot_expr(a: Column, b: Column) -> Column:
    """Index-ascending sequential dot product (FP-order pinned)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        "(acc, v) -> acc + v)"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id: str | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: -> [q_id, n_id, cosine, rank].

    Plan: the (small) query side is broadcast; the corpus streams through
    one scan; per-query top-k is a window over (q_id) ordered by
    (cosine desc, n_id) — deterministic under ties. At scale the corpus
    side stays partition-parallel with no shuffle until the final top-k,
    which AQE handles as a skewless window over q_id.
    """
    query_id = query_id or id_col
    nrm = lambda v: F.sqrt(dot_expr(v, v))  # noqa: E731
    q = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(vec_col).alias("qv"),
        nrm(F.col(vec_col)).alias("qn"),
    ).where(F.col("qn") > 0)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("cv"),
        nrm(F.col(vec_col)).alias("cn"),
    ).where(F.col("cn") > 0)
    cos = TH.q6_expr(dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk_oracle_sql(
    corpus_table: str,
    queries_sql: str,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id: str | None = None,
) -> str:
    query_id = query_id or id_col
    dot = dot_sql("q.qv", "c.cv")
    q6cos = TH.q6_sql(f"{dot} / (q.qn * c.cn)")
    return f"""
WITH q AS (
  SELECT {query_id} AS q_id, {vec_col} AS qv,
         sqrt({dot_sql(vec_col, vec_col)}) AS qn
  FROM ({queries_sql})
), c AS (
  SELECT {id_col} AS n_id, {vec_col} AS cv,
         sqrt({dot_sql(vec_col, vec_col)}) AS cn
  FROM {corpus_table}
)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT q.q_id, c.n_id,
         {q6cos} AS cosine,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY {q6cos} DESC, c.n_id ASC
         ) AS rank
  FROM c, q
  WHERE q.qn > 0 AND c.cn > 0 AND q.q_id <> c.n_id
) WHERE rank <= {k}
"""


def srp_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit i = sign(<v, plane_i>)."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in p]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def srp_bucket_sql(vec: str, planes: list[list[float]]) -> str:
    terms = []
    for i, p in enumerate(planes):
        lits = "[" + ", ".join(repr(x) for x in p) + "]"
        d = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, len({vec}) + 1), "
            f"i -> CAST({vec}[i] AS DOUBLE) * ({lits})[i])), "
            "(acc, v) -> acc + v)"
        )
        terms.append(
            f"CASE WHEN {d} > 0 THEN CAST({1 << i} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def _table_planes(
    num_tables: int, planes_per_table: int, dim: int
) -> list[list[list[float]]]:
    all_planes = _planes(num_tables * planes_per_table, dim)
    return [
        all_planes[t * planes_per_table : (t + 1) * planes_per_table]
        for t in range(num_tables)
    ]


def srp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_tables: int = 8,
    planes_per_table: int = 3,
    dim: int = 64,
    query_id: str | None = None,
) -> DataFrame:
    """ANN top-k: multi-table SRP-LSH candidates + exact cosine rerank
    -> [q_id, n_id, cosine, rank].

    ``num_tables`` independent hash tables of ``planes_per_table`` planes
    each: a candidate collides with the query in >= 1 table. For neighbor
    angle θ, P(candidate) = 1 - (1 - (1-θ/π)^p)^L — a single wide table
    (p=8) has near-zero recall at θ ~ 60°, the 8x3 default ~0.9.

    The cross join becomes an equi-join on (table, bucket) int keys: at
    100 TB the corpus is hash-partitioned by bucket, each bucket scans
    independently, and candidate dedup is one distinct. Approximate by
    construction — recall vs ``cosine_topk`` is asserted in tests, and the
    oracle replicates the SAME tables/buckets so the driver check is exact.
    """
    query_id = query_id or id_col
    tables = _table_planes(num_tables, planes_per_table, dim)
    nrm = lambda v: F.sqrt(dot_expr(v, v))  # noqa: E731

    def keyed(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        buckets = F.array(
            *[srp_bucket_expr(F.col(vec_col), planes) for planes in tables]
        )
        base = df.select(
            F.col(idc).alias(out_id),
            nrm(F.col(vec_col)).alias("_n"),
            F.posexplode(buckets).alias("tbl", "bucket"),
        ).where(F.col("_n") > 0)
        return base.select(out_id, "tbl", "bucket")

    q = keyed(queries, query_id, "q_id")
    c = keyed(corpus, id_col, "n_id")
    cand = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    qv = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(vec_col).alias("qv"),
        nrm(F.col(vec_col)).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("cv"),
        nrm(F.col(vec_col)).alias("cn"),
    )
    cos = TH.q6_expr(
        dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "n_id")
        .select("q_id", "n_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def srp_lsh_topk_oracle_sql(
    corpus_table: str,
    queries_sql: str,
    id_col: str,
    vec_col: str,
    k: int = 5,
    num_tables: int = 8,
    planes_per_table: int = 3,
    dim: int = 64,
    query_id: str | None = None,
) -> str:
    query_id = query_id or id_col
    tables = _table_planes(num_tables, planes_per_table, dim)
    nrm = f"sqrt({dot_sql(vec_col, vec_col)})"
    qk = "\n  UNION ALL\n  ".join(
        f"SELECT q_id, {t} AS tbl, {srp_bucket_sql('qv0', planes)} AS bucket "
        "FROM q0"
        for t, planes in enumerate(tables)
    )
    ck = "\n  UNION ALL\n  ".join(
        f"SELECT n_id, {t} AS tbl, {srp_bucket_sql('cv0', planes)} AS bucket "
        "FROM c0"
        for t, planes in enumerate(tables)
    )
    dot = dot_sql("qv.qv", "cv.cv")
    q6cos = TH.q6_sql(f"{dot} / (qv.qn * cv.cn)")
    return f"""
WITH q0 AS (
  SELECT {query_id} AS q_id, {vec_col} AS qv0, {nrm} AS qn0
  FROM ({queries_sql}) WHERE {nrm} > 0
), c0 AS (
  SELECT {id_col} AS n_id, {vec_col} AS cv0, {nrm} AS cn0
  FROM {corpus_table} WHERE {nrm} > 0
), qk AS (
  {qk}
), ck AS (
  {ck}
), cand AS (
  SELECT DISTINCT qk.q_id, ck.n_id
  FROM ck JOIN qk ON ck.tbl = qk.tbl AND ck.bucket = qk.bucket
  WHERE qk.q_id <> ck.n_id
), qv AS (SELECT q_id, qv0 AS qv, qn0 AS qn FROM q0),
cv AS (SELECT n_id, cv0 AS cv, cn0 AS cn FROM c0)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT cand.q_id, cand.n_id,
         {q6cos} AS cosine,
         row_number() OVER (
           PARTITION BY cand.q_id
           ORDER BY {q6cos} DESC, cand.n_id ASC
         ) AS rank
  FROM cand JOIN qv ON qv.q_id = cand.q_id
            JOIN cv ON cv.n_id = cand.n_id
) WHERE rank <= {k}
"""


def srp_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_tables: int = 8,
    planes_per_table: int = 3,
    dim: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SRP-LSH buckets + exact cosine verify
    -> [id_a, id_b, cosine] with cosine >= threshold and id_a < id_b.

    The scale path for ``dedup.embedding_near_dup`` (whose default is the
    brute-force cross join baseline): candidates come from a self
    equi-join on (table, bucket) integer keys, so the n^2 product never
    materializes — at 100 TB the corpus hash-partitions by bucket and
    each bucket compares independently. ``num_tables`` independent hash
    tables give recall 1-(1-(1-θ/π)^p)^L for neighbor angle θ (the 8x3
    default ~0.99 at cosine 0.95); candidate dedup across tables is one
    distinct on (id_a, id_b).

    ``max_bucket_size`` drops over-populated (table, bucket) blocks
    (hub/degenerate vectors) the way blocking.candidate_pairs caps hot
    blocks: pairs lost in a dropped bucket can still surface through the
    other L-1 tables, so the cap bounds fan-out with a graceful recall
    cost rather than a quadratic blow-up. Approximate by construction;
    recall vs the exact pair set is asserted in tests, and the generated
    oracle replicates the same planes/buckets/cap so the driver check is
    exact.
    """
    tables = _table_planes(num_tables, planes_per_table, dim)
    nrm = F.sqrt(dot_expr(F.col(vec_col), F.col(vec_col)))
    buckets = F.array(
        *[srp_bucket_expr(F.col(vec_col), planes) for planes in tables]
    )
    keyed = (
        df.select(
            F.col(id_col).alias("id"),
            nrm.alias("_n"),
            F.posexplode(buckets).alias("tbl", "bucket"),
        )
        .where(F.col("_n") > 0)
        .select("id", "tbl", "bucket")
    )
    if max_bucket_size:
        over = (
            keyed.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") > max_bucket_size)
            .select("tbl", "bucket")
        )
        keyed = keyed.join(over, ["tbl", "bucket"], "left_anti")
    a = keyed.select(F.col("id").alias("id_a"), "tbl", "bucket")
    b = keyed.select(F.col("id").alias("id_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        nrm.alias("na"),
    ).where(F.col("na") > 0)
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        nrm.alias("nb"),
    ).where(F.col("nb") > 0)
    cos = TH.q6_expr(
        dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def srp_lsh_pairs_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_tables: int = 8,
    planes_per_table: int = 3,
    dim: int = 64,
    max_bucket_size: int | None = None,
) -> str:
    """DuckDB twin of ``srp_lsh_pairs`` — same planes, buckets, cap."""
    tables = _table_planes(num_tables, planes_per_table, dim)
    nrm = f"sqrt({dot_sql(vec_col, vec_col)})"
    keyed = "\n  UNION ALL\n  ".join(
        f"SELECT id, {t} AS tbl, {srp_bucket_sql('v0', planes)} AS bucket "
        "FROM base"
        for t, planes in enumerate(tables)
    )
    cap_cte = (
        f""", keyed AS (
  SELECT k.* FROM keyed0 k
  JOIN (SELECT tbl, bucket, count(*) AS _c
        FROM keyed0 GROUP BY tbl, bucket) s
    ON k.tbl = s.tbl AND k.bucket = s.bucket
  WHERE s._c <= {max_bucket_size}
)"""
        if max_bucket_size
        else ", keyed AS (SELECT * FROM keyed0)"
    )
    dot = dot_sql("va.v0", "vb.v0")
    q6cos = TH.q6_sql(f"{dot} / (va.n0 * vb.n0)")
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col} AS v0, {nrm} AS n0
  FROM {table} WHERE {nrm} > 0
), keyed0 AS (
  {keyed}
){cap_cte}, cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM keyed a JOIN keyed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
)
SELECT cand.id_a, cand.id_b, {q6cos} AS cosine
FROM cand JOIN base va ON va.id = cand.id_a
          JOIN base vb ON vb.id = cand.id_b
WHERE {q6cos} >= {threshold}
"""


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_id: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k -> [q_id, n_id, cosine, rank].

    The coarse-quantizer scale path: every corpus vector is assigned to
    its nearest centroid once (the inverted lists), and a query scans
    only its ``n_probe`` nearest lists — expected work per query is
    n_probe/n_centroids of the corpus instead of all of it. Centroids
    here are the ``n_centroids`` corpus vectors with the smallest ids:
    deterministic seed centroids (no k-means iterations), so the DuckDB
    oracle reproduces the identical lists and the driver check is exact.
    At 100 TB the same shape holds with trained centroids: the centroid
    set broadcasts (it is tiny), assignment is one map-side pass
    (crossJoin with a broadcast side + per-row argmax — no shuffle), the
    lists are an equi-join key, and only the probed lists rerank.

    Ties break deterministically everywhere: centroid choice by
    (cosine desc, centroid id asc), final top-k by (cosine desc, n_id
    asc). Zero-norm vectors are excluded on both sides, as in
    ``cosine_topk``.
    """
    query_id = query_id or id_col
    nrm = lambda v: F.sqrt(dot_expr(v, v))  # noqa: E731

    cents = (
        corpus.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cv0"),
            nrm(F.col(vec_col)).alias("cn0"),
        )
        .where(F.col("cn0") > 0)
        .orderBy("cent_id")
        .limit(n_centroids)
    )

    def assign(df: DataFrame, idc: str, out_id: str, top: int) -> DataFrame:
        base = df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias("_v"),
            nrm(F.col(vec_col)).alias("_n"),
        ).where(F.col("_n") > 0)
        sim = TH.q6_expr(
            dot_expr(F.col("_v"), F.col("cv0")) / (F.col("_n") * F.col("cn0"))
        )
        w = Window.partitionBy(out_id).orderBy(
            F.desc("_sim"), F.asc("cent_id")
        )
        return (
            base.crossJoin(F.broadcast(cents))
            .select(out_id, "cent_id", sim.alias("_sim"))
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= top)
            .select(out_id, "cent_id")
        )

    lists = assign(corpus, id_col, "n_id", 1)
    probes = assign(queries, query_id, "q_id", n_probe)
    cand = probes.join(lists, "cent_id").where(
        F.col("q_id") != F.col("n_id")
    ).select("q_id", "n_id")
    qv = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(vec_col).alias("qv"),
        nrm(F.col(vec_col)).alias("qn"),
    ).where(F.col("qn") > 0)
    cv = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("cv"),
        nrm(F.col(vec_col)).alias("cn"),
    ).where(F.col("cn") > 0)
    cos = TH.q6_expr(
        dot_expr(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        cand.join(F.broadcast(qv), "q_id")
        .join(cv, "n_id")
        .select("q_id", "n_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk_oracle_sql(
    corpus_table: str,
    queries_sql: str,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    query_id: str | None = None,
) -> str:
    """DuckDB twin of ``ivf_topk`` — same seed centroids, lists, probes."""
    query_id = query_id or id_col
    nrm = f"sqrt({dot_sql(vec_col, vec_col)})"
    sim = TH.q6_sql(f"{dot_sql('b._v', 'c.cv0')} / (b._n * c.cn0)")
    dot = dot_sql("qv.qv", "cv.cv")
    q6cos = TH.q6_sql(f"{dot} / (qv.qn * cv.cn)")
    return f"""
WITH cents AS (
  SELECT {id_col} AS cent_id, {vec_col} AS cv0, {nrm} AS cn0
  FROM {corpus_table} WHERE {nrm} > 0
  ORDER BY cent_id LIMIT {n_centroids}
), cbase AS (
  SELECT {id_col} AS n_id, {vec_col} AS _v, {nrm} AS _n
  FROM {corpus_table} WHERE {nrm} > 0
), qbase AS (
  SELECT {query_id} AS q_id, {vec_col} AS _v, {nrm} AS _n
  FROM ({queries_sql}) WHERE {nrm} > 0
), lists AS (
  SELECT n_id, cent_id FROM (
    SELECT b.n_id, c.cent_id,
      row_number() OVER (PARTITION BY b.n_id
        ORDER BY {sim} DESC, c.cent_id ASC) AS _r
    FROM cbase b, cents c
  ) WHERE _r = 1
), probes AS (
  SELECT q_id, cent_id FROM (
    SELECT b.q_id, c.cent_id,
      row_number() OVER (PARTITION BY b.q_id
        ORDER BY {sim} DESC, c.cent_id ASC) AS _r
    FROM qbase b, cents c
  ) WHERE _r <= {n_probe}
), cand AS (
  SELECT p.q_id, l.n_id FROM probes p JOIN lists l USING (cent_id)
  WHERE p.q_id <> l.n_id
), qv AS (SELECT q_id, _v AS qv, _n AS qn FROM qbase),
cv AS (SELECT n_id, _v AS cv, _n AS cn FROM cbase)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT cand.q_id, cand.n_id, {q6cos} AS cosine,
    row_number() OVER (PARTITION BY cand.q_id
      ORDER BY {q6cos} DESC, cand.n_id ASC) AS rank
  FROM cand JOIN qv ON qv.q_id = cand.q_id
            JOIN cv ON cv.n_id = cand.n_id
) WHERE rank <= {k}
"""
