"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    ivf_topk_pinned,
    lsh_bucketed_topk,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

OFFSET = 100000

# Shared oracle scaffolding: exploded elements quantized to int64
# fixed point (floor(val * 2^24)) exactly like operators.similarity —
# dot products and norms are exact integer arithmetic in both engines.
_EL = """
el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM {src}
),
n2 AS (
  SELECT vec_id, SUM(val * val) AS norm2
  FROM el GROUP BY vec_id
)
"""


def ann_brute_force_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return brute_force_topk(queries, emb, k=5)


ANN_BRUTE_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  WHERE q.vec_id % 100 = 0
  GROUP BY q.vec_id, t.vec_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
)
SELECT query_id, target_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM cos
) WHERE rank <= 5
"""
)


def ann_lsh_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, k=3, n_planes=4)


_BUCKET_EXPR = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(4)
)

ANN_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, CAST({_BUCKET_EXPR} AS BIGINT) AS bucket
  FROM embeddings
),
el AS (
  SELECT vec_id, bucket, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM b
),
n2 AS (
  SELECT vec_id, SUM(val * val) AS norm2
  FROM el GROUP BY vec_id
),
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.bucket = t.bucket AND q.pos = t.pos
                     AND q.vec_id <> t.vec_id
  GROUP BY q.vec_id, t.vec_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
)
SELECT query_id, target_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM cos
) WHERE rank <= 3
"""


def ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a pinned coarse quantizer (centroids = vectors with
    vec_id < 16): the full inverted-file build + n_probe search is
    exact int64 arithmetic, so it runs under the hash gate. The k-means
    variant (operators.similarity.ivf_topk) shares this search plan and
    is recall-tested in tests/test_llm_ops.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk_pinned(emb, k=3, n_centroids=16, n_probe=3)


ANN_IVF_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
cel AS (SELECT vec_id AS cell, pos, val AS cval FROM el WHERE vec_id < 16),
cn2 AS (SELECT vec_id AS cell, norm2 AS cnorm2 FROM n2 WHERE vec_id < 16),
cdist AS (
  SELECT el.vec_id, cel.cell,
         MAX(n2.norm2) - 2 * SUM(el.val * cel.cval) + MAX(cn2.cnorm2) AS dist2
  FROM el
  JOIN cel ON cel.pos = el.pos
  JOIN n2 ON n2.vec_id = el.vec_id
  JOIN cn2 ON cn2.cell = cel.cell
  GROUP BY el.vec_id, cel.cell
),
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS r
  FROM cdist
),
assigned AS (SELECT vec_id, cell FROM ranked WHERE r = 1),
probes AS (SELECT vec_id AS query_id, cell FROM ranked WHERE r <= 3),
qel AS (
  SELECT p.query_id, p.cell, el.pos, el.val AS qval
  FROM probes p JOIN el ON el.vec_id = p.query_id
),
tel AS (
  SELECT a.vec_id AS target_id, a.cell, el.pos, el.val AS tval
  FROM assigned a JOIN el ON el.vec_id = a.vec_id
),
dots AS (
  SELECT q.query_id, t.target_id, SUM(q.qval * t.tval) AS dot
  FROM qel q JOIN tel t ON t.cell = q.cell AND t.pos = q.pos
  WHERE q.query_id <> t.target_id
  GROUP BY q.query_id, t.target_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
)
SELECT query_id, target_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM cos
) WHERE rank <= 3
"""
)


def embedding_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: cosine >= 0.99 among a sampled
    duplicate-injected corpus (every sampled vector has one exact copy)."""
    emb = read_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 5 == 0
    )
    corpus = emb.unionAll(
        emb.select(
            (F.col("vec_id") + OFFSET).alias("vec_id"), "embedding", "label"
        )
    )
    pairs = cosine_pairs(corpus, corpus)
    return pairs.where(
        (F.col("cosine") >= 0.99) & (F.col("query_id") < F.col("target_id"))
    )


EMB_NEARDUP_SQL = (
    f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
  UNION ALL
  SELECT vec_id + {OFFSET} AS vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
),
"""
    + _EL.format(src="corpus")
    + """,
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  GROUP BY q.vec_id, t.vec_id
)
SELECT query_id, target_id,
       CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
FROM dots
JOIN n2 qn ON qn.vec_id = query_id
JOIN n2 tn ON tn.vec_id = target_id
WHERE CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) >= 0.99
  AND query_id < target_id
"""
)


QUERIES = [
    Query("ann_brute_force_topk", ann_brute_force_q, ANN_BRUTE_SQL, "exact cosine top-5 for sampled query vectors"),
    Query("ann_lsh_bucketed_topk", ann_lsh_bucketed_q, ANN_LSH_SQL, "sign-bucket ANN top-3 within LSH buckets"),
    Query("ann_ivf_topk", ann_ivf_q, ANN_IVF_SQL, "IVF ANN: pinned quantizer cells + n_probe search (exact oracle)"),
    Query("embedding_neardup", embedding_neardup_q, EMB_NEARDUP_SQL, "cosine >= 0.99 near-duplicate vector pairs"),
]


def emb_quantize_int8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization under the exact gate: every code
    byte and per-vector scale hash-checked (operators/similarity.
    quantize_int8 — exact int64 fixed-point, truncating division)."""
    from map_reduce_project_spark.operators.similarity import quantize_int8

    return quantize_int8(read_table(spark, sf_dir, "embeddings"))


QUANTIZE_SQL = f"""
WITH {_EL.format(src="embeddings")}
, s AS (
  SELECT vec_id, MAX(ABS(val)) AS scale FROM el GROUP BY vec_id
)
SELECT el.vec_id, CAST(el.pos AS BIGINT) AS pos,
  CAST(CASE WHEN s.scale = 0 THEN 0
       ELSE (CASE WHEN el.val < 0 THEN -1 ELSE 1 END)
            * ((ABS(el.val) * 127) // s.scale)
  END AS INT) AS q,
  s.scale
FROM el JOIN s USING (vec_id)
"""

QUERIES.append(
    Query(
        "emb_quantize_int8",
        emb_quantize_int8_q,
        QUANTIZE_SQL,
        "symmetric int8 embedding quantization, every code byte exact",
    )
)


def ann_arrow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow data-plane twin of ann_brute_force_topk: the corpus
    streams through ``mapInArrow`` (zero-copy Arrow -> numpy int64
    matmul, batch-local top-k pruning), so the only exchange in the
    plan is the final candidate window. Bit-identical to the
    position-join formulation — same QSCALE fixed point, same IEEE
    double cosine — which is what the shared-shape oracle checks."""
    from map_reduce_project_spark.operators.similarity import (
        arrow_brute_force_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 200 == 0)
    return arrow_brute_force_topk(queries, emb, k=3)


ANN_ARROW_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  WHERE q.vec_id % 200 = 0
  GROUP BY q.vec_id, t.vec_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
)
SELECT query_id, target_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM cos
) WHERE rank <= 3
"""
)

QUERIES.append(
    Query(
        "ann_arrow_topk",
        ann_arrow_q,
        ANN_ARROW_SQL,
        "mapInArrow zero-copy cosine top-3: streamed corpus, batch-local pruning",
    )
)

def rag_retrieve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval capstone: rank the corpus against a query vector
    (vec_id 0's embedding) with the exact cosine kernel, take the
    top 10, and join the winners back to their DOCUMENT rows — the
    embed -> score -> top-k -> fetch-text shape every retrieval
    pipeline runs. The score side broadcasts the single query vector
    and streams the corpus; the fetch side joins only the 10
    survivors against documents (broadcast the tiny side)."""
    emb = read_table(spark, sf_dir, "embeddings")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    hits = brute_force_topk(
        emb.where(F.col("vec_id") == 0), emb, k=10
    ).select(
        F.col("target_id").alias("doc_id"), "cosine", "rank"
    )
    return F.broadcast(hits).join(docs, "doc_id").select(
        "doc_id", "rank", "cosine", "lang", "source", "n_chars"
    )


RAG_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
dots AS (
  SELECT t.vec_id AS doc_id, SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND t.vec_id <> 0
  WHERE q.vec_id = 0
  GROUP BY t.vec_id
),
cos AS (
  SELECT doc_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = 0
  JOIN n2 tn ON tn.vec_id = doc_id
),
hits AS (
  SELECT doc_id, cosine,
         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank
  FROM cos
)
SELECT hits.doc_id, rank, cosine, lang, source, n_chars
FROM hits JOIN documents ON documents.doc_id = hits.doc_id
WHERE rank <= 10
"""
)

QUERIES.append(
    Query(
        "rag_retrieve_topk",
        rag_retrieve_q,
        RAG_SQL,
        "embed->score->top-k->fetch-text retrieval join (exact cosine kernel)",
    )
)



# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic dedup over an injected near-dup
# corpus (every even-id vector gets a slightly perturbed copy at
# id + 1000, so the pruner has real positives; perturbation keeps
# cosine ~0.9995, far above the 0.92 threshold)
# ---------------------------------------------------------------------------

SEM_OFFSET = 1000
SEM_TAU = 0.92


def dedup_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.similarity import semdedup_prune

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pert = emb.where(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + SEM_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + ((i % 5) - 2).cast("double") * F.lit(0.001)),
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionAll(pert)
    return semdedup_prune(corpus, n_centroids=16, threshold=SEM_TAU)


DEDUP_SEMANTIC_SQL = f"""
WITH raw AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
corpus_el AS (
  SELECT vec_id, pos, x FROM raw
  UNION ALL
  SELECT vec_id + {SEM_OFFSET} AS vec_id, pos,
         x * (1.0 + CAST((pos % 5) - 2 AS DOUBLE) * 0.001) AS x
  FROM raw WHERE vec_id % 2 = 0
),
el AS (
  SELECT vec_id, pos, CAST(FLOOR(x * 16777216) AS BIGINT) AS val
  FROM corpus_el
),
n2 AS (SELECT vec_id, SUM(val * val) AS norm2 FROM el GROUP BY vec_id),
cel AS (SELECT vec_id AS cell, pos, val AS cval FROM el WHERE vec_id < 16),
cn2 AS (SELECT vec_id AS cell, norm2 AS cnorm2 FROM n2 WHERE vec_id < 16),
cdot AS (
  SELECT e.vec_id, c.cell, SUM(e.val * c.cval) AS cdot
  FROM el e JOIN cel c ON e.pos = c.pos
  GROUP BY e.vec_id, c.cell
),
cdist AS (
  SELECT d.vec_id, d.cell, n.norm2 - 2 * d.cdot + c.cnorm2 AS dist2
  FROM cdot d
  JOIN n2 n ON n.vec_id = d.vec_id
  JOIN cn2 c ON c.cell = d.cell
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS r
    FROM cdist
  ) WHERE r = 1
),
uel AS (
  SELECT a.cell, e.vec_id AS u, e.pos, e.val AS uval
  FROM assigned a JOIN el e ON e.vec_id = a.vec_id
),
vel AS (
  SELECT a.cell, e.vec_id AS v, e.pos, e.val AS vval
  FROM assigned a JOIN el e ON e.vec_id = a.vec_id
),
dots AS (
  SELECT u, v, SUM(uval * vval) AS dot
  FROM uel JOIN vel ON uel.cell = vel.cell AND uel.pos = vel.pos
  WHERE u < v
  GROUP BY u, v
),
dup AS (
  SELECT d.v, d.u
  FROM dots d
  JOIN n2 un ON un.vec_id = d.u
  JOIN n2 vn ON vn.vec_id = d.v
  WHERE d.dot > 0
    AND CAST(d.dot AS DOUBLE) * CAST(d.dot AS DOUBLE)
        >= {SEM_TAU * SEM_TAU!r} * CAST(un.norm2 AS DOUBLE) * CAST(vn.norm2 AS DOUBLE)
),
pby AS (SELECT v, MIN(u) AS pby FROM dup GROUP BY v)
SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
       p.pby IS NOT NULL AS pruned,
       CAST(COALESCE(p.pby, -1) AS BIGINT) AS pruned_by
FROM assigned a LEFT JOIN pby p ON p.v = a.vec_id
"""

QUERIES.append(
    Query(
        "dedup_semantic",
        dedup_semantic_q,
        DEDUP_SEMANTIC_SQL,
        "SemDeDup: pinned-quantizer clustering + intra-cell cosine pruning on an injected near-dup corpus",
    )
)


def emb_srp_project_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.similarity import srp_project

    emb = read_table(spark, sf_dir, "embeddings")
    return srp_project(emb, out_dims=16)


EMB_SRP_SQL = """
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
),
js AS (SELECT range AS j FROM range(0, 16))
SELECT vec_id, CAST(j AS BIGINT) AS j,
       CAST(SUM(val * CASE
             WHEN ((CAST(pos AS BIGINT) * 73856093 + CAST(j AS BIGINT) * 19349663) % 97) < 48
             THEN 1 ELSE -1 END) AS BIGINT) AS proj
FROM el CROSS JOIN js
GROUP BY vec_id, j
"""

QUERIES.append(
    Query(
        "emb_srp_project",
        emb_srp_project_q,
        EMB_SRP_SQL,
        "sign-random-projection dim reduction, exact int64 (Achlioptas-style JL)",
    )
)


def emb_pq_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.similarity import pq_codes

    emb = read_table(spark, sf_dir, "embeddings")
    return pq_codes(emb, n_subspaces=8, n_codes=8)


EMB_PQ_SQL = """
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
),
sel AS (SELECT vec_id, CAST(pos // 8 AS INT) AS sub, pos, val FROM el),
cb AS (SELECT sub, pos, vec_id AS code, val AS cval FROM sel WHERE vec_id < 8),
d2 AS (
  SELECT s.vec_id, s.sub, c.code,
         CAST(SUM((s.val - c.cval) * (s.val - c.cval)) AS BIGINT) AS dist2
  FROM sel s JOIN cb c ON s.sub = c.sub AND s.pos = c.pos
  GROUP BY s.vec_id, s.sub, c.code
)
SELECT vec_id, CAST(sub AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code, dist2
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist2, code) AS r
  FROM d2
) WHERE r = 1
"""

QUERIES.append(
    Query(
        "emb_pq_codes",
        emb_pq_codes_q,
        EMB_PQ_SQL,
        "product-quantization code assignment against a pinned codebook, exact int64 L2",
    )
)


# ---------------------------------------------------------------------------
# Integer k-means: Lloyd training loop under the exact hash gate
# (oracle = the same rounds unrolled as chained CTEs)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


def emb_kmeans_int_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.similarity import kmeans_int

    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_int(emb, k=KMEANS_K, iterations=KMEANS_ITERS)


def _kmeans_sql(k: int, iterations: int) -> str:
    ctes = [
        """el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
)""",
        f"c0 AS (SELECT vec_id AS cluster, pos, val AS cval FROM el WHERE vec_id < {k})",
    ]

    def assign_body(prev: str) -> str:
        return f"""
  SELECT vec_id, cluster, dist2 FROM (
    SELECT vec_id, cluster, dist2,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cluster) AS r
    FROM (
      SELECT e.vec_id, c.cluster,
             CAST(SUM((e.val - c.cval) * (e.val - c.cval)) AS BIGINT) AS dist2
      FROM el e JOIN {prev} c ON e.pos = c.pos
      GROUP BY e.vec_id, c.cluster
    )
  ) WHERE r = 1
"""

    for i in range(1, iterations + 1):
        prev = f"c{i - 1}"
        ctes.append(f"a{i} AS ({assign_body(prev)})")
        ctes.append(
            f"""m{i} AS (
  SELECT a.cluster, e.pos,
         CAST(FLOOR(CAST(SUM(e.val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS newval
  FROM a{i} a JOIN el e ON e.vec_id = a.vec_id
  GROUP BY a.cluster, e.pos
)"""
        )
        ctes.append(
            f"""c{i} AS (
  SELECT c.cluster, c.pos, CAST(COALESCE(m.newval, c.cval) AS BIGINT) AS cval
  FROM {prev} c LEFT JOIN m{i} m ON m.cluster = c.cluster AND m.pos = c.pos
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
final AS ({assign_body(f"c{iterations}")})
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, dist2 FROM final
"""
    )


EMB_KMEANS_SQL = _kmeans_sql(KMEANS_K, KMEANS_ITERS)

QUERIES.append(
    Query(
        "emb_kmeans_int",
        emb_kmeans_int_q,
        EMB_KMEANS_SQL,
        "Lloyd k-means training loop in exact int64 vs the same rounds unrolled as CTEs",
    )
)


def emb_hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each sampled
    anchor vector, the top-3 most-similar vectors with a DIFFERENT
    label — the batch-construction step of every embedding-model
    training pipeline (the negatives that are hard precisely because
    cosine says they look positive).

    Same broadcast-anchor exact kernel as ``ann_brute_force_topk``
    with a label anti-filter before ranking; at corpus scale the
    kernel runs per IVF/LSH bucket and this fusion plan is unchanged.
    """
    from pyspark.sql.window import Window

    emb = read_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % 50 == 0)
    pairs = cosine_pairs(anchors, emb)
    lq = emb.selectExpr("vec_id as query_id", "label as q_label")
    lt = emb.selectExpr("vec_id as target_id", "label as t_label")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("target_id")
    )
    return (
        pairs.join(F.broadcast(lq), "query_id")
        .join(lt, "target_id")
        .where(F.col("q_label") != F.col("t_label"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select(
            "query_id",
            "target_id",
            F.col("q_label").cast("long").alias("q_label"),
            F.col("t_label").cast("long").alias("t_label"),
            "cosine",
            "rank",
        )
    )


EMB_HARDNEG_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  WHERE q.vec_id % 50 = 0
  GROUP BY q.vec_id, t.vec_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
),
lab AS (
  SELECT c.query_id, c.target_id,
         CAST(eq.label AS BIGINT) AS q_label,
         CAST(et.label AS BIGINT) AS t_label, c.cosine
  FROM cos c
  JOIN embeddings eq ON eq.vec_id = c.query_id
  JOIN embeddings et ON et.vec_id = c.target_id
  WHERE eq.label <> et.label
)
SELECT query_id, target_id, q_label, t_label, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM lab
) WHERE rank <= 3
"""
)

QUERIES.append(
    Query(
        "emb_hard_negatives",
        emb_hard_negatives_q,
        EMB_HARDNEG_SQL,
        "contrastive hard-negative mining: top-3 cross-label cosine neighbours per anchor",
    )
)


def emb_binary_codes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary embedding codes + Hamming ANN: each vector compresses to
    a 63-bit sign code (1 bit per dimension, top bit unused to stay in
    signed int64 — the 32x storage tier below int8), and each sampled
    query retrieves its top-3 nearest
    codes by Hamming distance via bit_count(xor) — the cheap first
    pass of a binary-rerank retrieval stack. Codes and distances are
    pure integer arithmetic, engine-exact.

    Scale: code build is map-side (no shuffle); the query side
    broadcasts sampled codes against the corpus stream. A full-corpus
    Hamming search partitions by code prefix (the multi-index trick) —
    same plan family as the SimHash band join.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    bit = lambda i: F.when(
        F.element_at("embedding", i + 1) > 0, F.lit(1 << i)
    ).otherwise(F.lit(0))
    code = bit(0)
    for i in range(1, 63):
        code = code + bit(i)
    codes = emb.select("vec_id", code.cast("long").alias("code"))
    q = codes.where(F.col("vec_id") % 100 == 0).selectExpr(
        "vec_id as query_id", "code as qcode"
    )
    t = codes.selectExpr("vec_id as target_id", "code as tcode")
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("hamming", "target_id")
    return (
        F.broadcast(q)
        .join(t, F.col("query_id") != F.col("target_id"))
        .select(
            "query_id",
            "target_id",
            F.bit_count(F.col("qcode").bitwiseXOR(F.col("tcode")))
            .cast("long")
            .alias("hamming"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
    )


_BIN_CODE_EXPR = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(63)
)

EMB_BINARY_SQL = f"""
WITH codes AS (
  SELECT vec_id, CAST({_BIN_CODE_EXPR} AS BIGINT) AS code FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         CAST(bit_count(xor(q.code, t.code)) AS BIGINT) AS hamming
  FROM codes q JOIN codes t ON q.vec_id <> t.vec_id
  WHERE q.vec_id % 100 = 0
)
SELECT query_id, target_id, hamming, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY hamming, target_id) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= 3
"""

QUERIES.append(
    Query(
        "emb_binary_codes",
        emb_binary_codes_q,
        EMB_BINARY_SQL,
        "63-bit sign codes + Hamming top-3 (binary retrieval tier, 32x compression)",
    )
)


# ---------------------------------------------------------------------------
# Matryoshka-style truncation evaluation: recall@3 of prefix-dim cosine
# against full-dim ground truth, per truncation tier
# ---------------------------------------------------------------------------

MRL_PREFIXES = (8, 16, 32)
MRL_K = 3


def emb_truncation_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Choose your embedding-truncation tier with MEASURED recall:
    for each prefix length (8/16/32 of 64 dims), compute each sampled
    query's top-3 by prefix-only cosine and report how many of the
    full-dimension top-3 it recovers — the evaluation behind
    Matryoshka-style (MRL) storage tiering, where serving cost drops
    linearly with dims and this table says what recall that buys.

    Exact end to end: prefix cosines are the same int64 kernel with a
    pos < prefix filter; recall counts are integers. One row per
    (prefix, query): n_hits and recall@3.
    """
    from pyspark.sql.window import Window

    emb = read_table(spark, sf_dir, "embeddings")
    el = _q_elements(emb).localCheckpoint(eager=False)

    def topk_at(prefix: int | None):
        e = el if prefix is None else el.where(F.col("pos") < prefix)
        q = e.where(F.col("vec_id") % 100 == 0).selectExpr(
            "vec_id as query_id", "pos", "val as qval"
        )
        t = e.selectExpr("vec_id as target_id", "pos", "val as tval")
        dots = (
            F.broadcast(q)
            .join(t, "pos")
            .where(F.col("query_id") != F.col("target_id"))
            .groupBy("query_id", "target_id")
            .agg(F.sum(F.col("qval") * F.col("tval")).alias("dot"))
        )
        n2 = e.groupBy("vec_id").agg(
            F.sum(F.col("val") * F.col("val")).alias("norm2")
        )
        qn = n2.selectExpr("vec_id as query_id", "norm2 as qn2")
        tn = n2.selectExpr("vec_id as target_id", "norm2 as tn2")
        cos = (
            dots.join(qn, "query_id")
            .join(tn, "target_id")
            .select(
                "query_id",
                "target_id",
                (
                    F.col("dot").cast("double")
                    / (
                        F.sqrt(F.col("qn2").cast("double"))
                        * F.sqrt(F.col("tn2").cast("double"))
                    )
                ).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("target_id")
        )
        return (
            cos.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= MRL_K)
            .select("query_id", "target_id")
        )

    truth = topk_at(None)
    out = None
    for p in MRL_PREFIXES:
        hits = (
            topk_at(p)
            .join(truth, ["query_id", "target_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count("*").alias("_h"))
        )
        allq = truth.select("query_id").distinct()
        row = allq.join(hits, "query_id", "left").select(
            F.lit(p).cast("long").alias("prefix_dims"),
            "query_id",
            F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce(F.col("_h"), F.lit(0)).cast("double") / MRL_K
            ).alias("recall_at_3"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def _q_elements(emb):
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.floor(F.col("val").cast("double") * 16777216))


def _mrl_topk_sql(prefix: str, where_pos: str) -> str:
    return f"""
el{prefix} AS (
  SELECT vec_id, pos, val FROM el0 {where_pos}
),
n2{prefix} AS (SELECT vec_id, SUM(val * val) AS norm2 FROM el{prefix} GROUP BY vec_id),
dots{prefix} AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id, SUM(q.val * t.val) AS dot
  FROM el{prefix} q JOIN el{prefix} t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  WHERE q.vec_id % 100 = 0
  GROUP BY q.vec_id, t.vec_id
),
top{prefix} AS (
  SELECT query_id, target_id FROM (
    SELECT d.query_id, d.target_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id ORDER BY
             CAST(d.dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) DESC,
             d.target_id) AS r
    FROM dots{prefix} d
    JOIN n2{prefix} qn ON qn.vec_id = d.query_id
    JOIN n2{prefix} tn ON tn.vec_id = d.target_id
  ) WHERE r <= 3
)"""


def _mrl_sql() -> str:
    parts = [
        """el0 AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
)""",
        _mrl_topk_sql("full", ""),
    ]
    selects = []
    for p in MRL_PREFIXES:
        parts.append(_mrl_topk_sql(str(p), f"WHERE pos < {p}"))
        selects.append(
            f"""
SELECT CAST({p} AS BIGINT) AS prefix_dims, q.query_id,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
  CAST(COALESCE(h.n, 0) AS DOUBLE) / {MRL_K} AS recall_at_3
FROM (SELECT DISTINCT query_id FROM topfull) q
LEFT JOIN (
  SELECT t.query_id, COUNT(*) AS n
  FROM top{p} t JOIN topfull f USING (query_id, target_id)
  GROUP BY t.query_id
) h ON h.query_id = q.query_id"""
        )
    return "WITH " + ",\n".join(parts) + "\nUNION ALL".join(selects)


EMB_TRUNC_SQL = _mrl_sql()

QUERIES.append(
    Query(
        "emb_truncation_recall",
        emb_truncation_recall_q,
        EMB_TRUNC_SQL,
        "Matryoshka truncation-tier evaluation: recall@3 of prefix-dim cosine vs full-dim truth",
    )
)


def ann_pq_adc_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (ADC, Jegou et al. 2011): rank
    the corpus for each sampled query using ONLY its 8-byte PQ codes —
    per-query lookup tables d(query_sub, codebook_entry) are built
    once (8 subspaces x 8 codes), and each target's distance is the
    sum of 8 table lookups instead of a 64-dim kernel. Completes the
    compression ladder: ivf (route) -> pq_codes (store) -> ADC
    (search). All int64, so the approximate ranking itself is
    engine-exact under the hash gate.

    Scale: the lookup table is query_batch x 64 rows (broadcast); the
    target side touches only the code table — 8 small ints per vector,
    never the embeddings. The join keys are (sub, code): 64 distinct
    values, AQE-splittable.
    """
    from pyspark.sql.window import Window
    from map_reduce_project_spark.operators.similarity import (
        _elements,
        pq_codes,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    el = _elements(emb, "vec_id", "embedding").localCheckpoint(eager=False)
    sub = (F.col("pos") - F.col("pos") % 8) / 8
    sel = el.withColumn("sub", sub.cast("int"))
    cb = sel.where(F.col("vec_id") < 8).selectExpr(
        "sub", "pos", "vec_id as code", "val as cval"
    )
    q = sel.where(F.col("vec_id") % 100 == 0).selectExpr(
        "vec_id as query_id", "sub", "pos", "val as qval"
    )
    dtab = (
        q.join(F.broadcast(cb), ["sub", "pos"])
        .groupBy("query_id", "sub", "code")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval"))
            ).alias("d")
        )
    )
    codes = pq_codes(emb, n_subspaces=8, n_codes=8).selectExpr(
        "vec_id as target_id", "subspace as sub", "code"
    )
    adc = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .where(F.col("query_id") != F.col("target_id"))
        .groupBy("query_id", "target_id")
        .agg(F.sum("d").alias("adc_dist2"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist2", "target_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("query_id", "target_id", "adc_dist2", "rank")
    )


ANN_PQ_ADC_SQL = """
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
),
sel AS (SELECT vec_id, CAST(pos // 8 AS INT) AS sub, pos, val FROM el),
cb AS (SELECT sub, pos, vec_id AS code, val AS cval FROM sel WHERE vec_id < 8),
codes AS (
  SELECT vec_id AS target_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY CAST(SUM((s.val - c.cval) * (s.val - c.cval)) AS BIGINT), c.code) AS r
    FROM sel s JOIN cb c ON s.sub = c.sub AND s.pos = c.pos
    GROUP BY s.vec_id, s.sub, c.code
  ) WHERE r = 1
),
dtab AS (
  SELECT q.vec_id AS query_id, q.sub, c.code,
         CAST(SUM((q.val - c.cval) * (q.val - c.cval)) AS BIGINT) AS d
  FROM sel q JOIN cb c ON c.sub = q.sub AND c.pos = q.pos
  WHERE q.vec_id % 100 = 0
  GROUP BY q.vec_id, q.sub, c.code
),
adc AS (
  SELECT d.query_id, codes.target_id, CAST(SUM(d.d) AS BIGINT) AS adc_dist2
  FROM codes JOIN dtab d ON d.sub = codes.sub AND d.code = codes.code
  WHERE d.query_id <> codes.target_id
  GROUP BY d.query_id, codes.target_id
)
SELECT query_id, target_id, adc_dist2, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY adc_dist2, target_id) AS BIGINT) AS rank
  FROM adc
) WHERE rank <= 3
"""

QUERIES.append(
    Query(
        "ann_pq_adc",
        ann_pq_adc_q,
        ANN_PQ_ADC_SQL,
        "PQ asymmetric-distance search: 8 table lookups per target instead of a 64-dim kernel",
    )
)


def emb_kmeans_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained k-means MODEL under the hash gate: the final
    centroid table after the same 3 exact-integer Lloyd rounds as
    emb_kmeans_int — proving not just the assignment but the persisted
    model artifact is bit-reproducible."""
    from map_reduce_project_spark.operators.similarity import (
        kmeans_centroids_int,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_centroids_int(emb, k=KMEANS_K, iterations=KMEANS_ITERS)


def _kmeans_centroids_sql(k: int, iterations: int) -> str:
    base = _kmeans_sql(k, iterations)
    # same CTE chain; select the final centroid table instead of the
    # final assignment
    head = base.split(",\nfinal AS (")[0]
    return (
        head
        + f"""
SELECT CAST(cluster AS BIGINT) AS cluster, CAST(pos AS BIGINT) AS pos,
       CAST(cval AS BIGINT) AS cval
FROM c{iterations}
"""
    )


EMB_KMEANS_CENTROIDS_SQL = _kmeans_centroids_sql(KMEANS_K, KMEANS_ITERS)

QUERIES.append(
    Query(
        "emb_kmeans_centroids",
        emb_kmeans_centroids_q,
        EMB_KMEANS_CENTROIDS_SQL,
        "the trained k-means centroid table (the persisted model artifact), bit-reproducible",
    )
)


def ann_ivf_pq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ search stack in one gated plan: coarse cells
    route each query to its 3 nearest cells (pinned quantizer, exact
    int64), and within the probed cells targets are ranked by PQ
    asymmetric distance — 8 lookup-table adds per candidate, never the
    raw embeddings. This is the billion-vector serving architecture:
    IVF bounds the candidate set, PQ bounds the bytes per candidate.
    """
    from pyspark.sql.window import Window
    from map_reduce_project_spark.operators.similarity import (
        _elements,
        norms2,
        pq_codes,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    el = _elements(emb, "vec_id", "embedding").localCheckpoint(eager=False)
    n2 = norms2(emb, "vec_id", "embedding").localCheckpoint(eager=False)

    # coarse routing (same pinned-quantizer arithmetic as ann_ivf_topk)
    cel = el.where(F.col("vec_id") < 16).selectExpr(
        "vec_id as cell", "pos", "val as cval"
    )
    cn2 = n2.where(F.col("vec_id") < 16).selectExpr(
        "vec_id as cell", "norm2 as cnorm2"
    )
    cdot = (
        el.join(F.broadcast(cel), "pos")
        .groupBy("vec_id", "cell")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("cdot"))
    )
    cdist = (
        cdot.join(n2, "vec_id")
        .join(F.broadcast(cn2), "cell")
        .select(
            "vec_id",
            "cell",
            (F.col("norm2") - 2 * F.col("cdot") + F.col("cnorm2")).alias("dist2"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cell")
    ranked = cdist.withColumn("_r", F.row_number().over(w))
    assigned = ranked.where(F.col("_r") == 1).selectExpr(
        "vec_id as target_id", "cell"
    )
    probes = ranked.where(
        (F.col("_r") <= 3) & (F.col("vec_id") % 100 == 0)
    ).selectExpr("vec_id as query_id", "cell")

    # PQ codes + per-query lookup tables (same arithmetic as ann_pq_adc)
    sel = el.withColumn(
        "sub", ((F.col("pos") - F.col("pos") % 8) / 8).cast("int")
    )
    cb = sel.where(F.col("vec_id") < 8).selectExpr(
        "sub", "pos", "vec_id as code", "val as cval"
    )
    qtab = (
        sel.where(F.col("vec_id") % 100 == 0)
        .selectExpr("vec_id as query_id", "sub", "pos", "val as qval")
        .join(F.broadcast(cb), ["sub", "pos"])
        .groupBy("query_id", "sub", "code")
        .agg(
            F.sum(
                (F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval"))
            ).alias("d")
        )
    )
    codes = pq_codes(emb, n_subspaces=8, n_codes=8).selectExpr(
        "vec_id as target_id", "subspace as sub", "code"
    )
    cand = probes.join(assigned, "cell").where(
        F.col("query_id") != F.col("target_id")
    )
    adc = (
        cand.join(codes, "target_id")
        .join(F.broadcast(qtab), ["query_id", "sub", "code"])
        .groupBy("query_id", "target_id")
        .agg(F.sum("d").alias("adc_dist2"))
    )
    wf = Window.partitionBy("query_id").orderBy("adc_dist2", "target_id")
    return (
        adc.withColumn("rank", F.row_number().over(wf).cast("long"))
        .where(F.col("rank") <= 3)
        .select("query_id", "target_id", "adc_dist2", "rank")
    )


ANN_IVF_PQ_SQL = """
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
),
n2 AS (SELECT vec_id, SUM(val * val) AS norm2 FROM el GROUP BY vec_id),
cel AS (SELECT vec_id AS cell, pos, val AS cval FROM el WHERE vec_id < 16),
cn2 AS (SELECT vec_id AS cell, norm2 AS cnorm2 FROM n2 WHERE vec_id < 16),
cdist AS (
  SELECT e.vec_id, c.cell,
         MAX(n.norm2) - 2 * SUM(e.val * c.cval) + MAX(cc.cnorm2) AS dist2
  FROM el e
  JOIN cel c ON c.pos = e.pos
  JOIN n2 n ON n.vec_id = e.vec_id
  JOIN cn2 cc ON cc.cell = c.cell
  GROUP BY e.vec_id, c.cell
),
ranked AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS r
  FROM cdist
),
assigned AS (SELECT vec_id AS target_id, cell FROM ranked WHERE r = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE r <= 3 AND vec_id % 100 = 0
),
sel AS (SELECT vec_id, CAST(pos // 8 AS INT) AS sub, pos, val FROM el),
cb AS (SELECT sub, pos, vec_id AS code, val AS cval FROM sel WHERE vec_id < 8),
codes AS (
  SELECT vec_id AS target_id, sub, code FROM (
    SELECT s.vec_id, s.sub, c.code,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
             ORDER BY CAST(SUM((s.val - c.cval) * (s.val - c.cval)) AS BIGINT), c.code) AS r
    FROM sel s JOIN cb c ON c.sub = s.sub AND c.pos = s.pos
    GROUP BY s.vec_id, s.sub, c.code
  ) WHERE r = 1
),
qtab AS (
  SELECT q.vec_id AS query_id, q.sub, c.code,
         CAST(SUM((q.val - c.cval) * (q.val - c.cval)) AS BIGINT) AS d
  FROM sel q JOIN cb c ON c.sub = q.sub AND c.pos = q.pos
  WHERE q.vec_id % 100 = 0
  GROUP BY q.vec_id, q.sub, c.code
),
cand AS (
  SELECT p.query_id, a.target_id
  FROM probes p JOIN assigned a ON a.cell = p.cell
  WHERE p.query_id <> a.target_id
),
adc AS (
  SELECT c.query_id, c.target_id, CAST(SUM(q.d) AS BIGINT) AS adc_dist2
  FROM cand c
  JOIN codes co ON co.target_id = c.target_id
  JOIN qtab q ON q.query_id = c.query_id AND q.sub = co.sub AND q.code = co.code
  GROUP BY c.query_id, c.target_id
)
SELECT query_id, target_id, adc_dist2, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY adc_dist2, target_id) AS BIGINT) AS rank
  FROM adc
) WHERE rank <= 3
"""

QUERIES.append(
    Query(
        "ann_ivf_pq",
        ann_ivf_pq_q,
        ANN_IVF_PQ_SQL,
        "full IVF-PQ: coarse-cell routing + asymmetric-distance ranking inside probed cells",
    )
)


def emb_ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@3 of the pinned-quantizer IVF
    search against exact brute force, per query — the measurement that
    gates an ANN index rollout (the IVF counterpart of
    emb_truncation_recall). Both sides are exact int64 pipelines, so
    the recall table itself is engine-exact.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    ivf = ivf_topk_pinned(emb, k=3, n_centroids=16, n_probe=3).where(
        F.col("query_id") % 100 == 0
    )
    truth = brute_force_topk(
        emb.where(F.col("vec_id") % 100 == 0), emb, k=3
    )
    hits = (
        ivf.select("query_id", "target_id")
        .join(
            truth.select("query_id", "target_id"),
            ["query_id", "target_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("_h"))
    )
    allq = truth.select("query_id").dropDuplicates()
    return allq.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("_h"), F.lit(0)).cast("double") / 3.0).alias(
            "recall_at_3"
        ),
    )


EMB_IVF_RECALL_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
cel AS (SELECT vec_id AS cell, pos, val AS cval FROM el WHERE vec_id < 16),
cn2 AS (SELECT vec_id AS cell, norm2 AS cnorm2 FROM n2 WHERE vec_id < 16),
cdist AS (
  SELECT e.vec_id, c.cell,
         MAX(n.norm2) - 2 * SUM(e.val * c.cval) + MAX(cc.cnorm2) AS dist2
  FROM el e
  JOIN cel c ON c.pos = e.pos
  JOIN n2 n ON n.vec_id = e.vec_id
  JOIN cn2 cc ON cc.cell = c.cell
  GROUP BY e.vec_id, c.cell
),
rankedc AS (
  SELECT vec_id, cell,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cell) AS r
  FROM cdist
),
assigned AS (SELECT vec_id AS target_id, cell FROM rankedc WHERE r = 1),
probes AS (SELECT vec_id AS query_id, cell FROM rankedc WHERE r <= 3),
qel AS (
  SELECT p.query_id, p.cell, el.pos, el.val AS qval
  FROM probes p JOIN el ON el.vec_id = p.query_id
),
tel AS (
  SELECT a.target_id, a.cell, el.pos, el.val AS tval
  FROM assigned a JOIN el ON el.vec_id = a.target_id
),
ivfdots AS (
  SELECT q.query_id, t.target_id, SUM(q.qval * t.tval) AS dot
  FROM qel q JOIN tel t ON t.cell = q.cell AND t.pos = q.pos
  WHERE q.query_id <> t.target_id
  GROUP BY q.query_id, t.target_id
),
ivftop AS (
  SELECT query_id, target_id FROM (
    SELECT d.query_id, d.target_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id ORDER BY
             CAST(d.dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) DESC,
             d.target_id) AS r
    FROM ivfdots d
    JOIN n2 qn ON qn.vec_id = d.query_id
    JOIN n2 tn ON tn.vec_id = d.target_id
  ) WHERE r <= 3
),
bfdots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id, SUM(q.val * t.val) AS dot
  FROM el q JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  WHERE q.vec_id % 100 = 0
  GROUP BY q.vec_id, t.vec_id
),
bftop AS (
  SELECT query_id, target_id FROM (
    SELECT d.query_id, d.target_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id ORDER BY
             CAST(d.dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) DESC,
             d.target_id) AS r
    FROM bfdots d
    JOIN n2 qn ON qn.vec_id = d.query_id
    JOIN n2 tn ON tn.vec_id = d.target_id
  ) WHERE r <= 3
)
SELECT q.query_id,
  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
  CAST(COALESCE(h.n, 0) AS DOUBLE) / 3.0 AS recall_at_3
FROM (SELECT DISTINCT query_id FROM bftop) q
LEFT JOIN (
  SELECT i.query_id, COUNT(*) AS n
  FROM ivftop i
  JOIN bftop b USING (query_id, target_id)
  WHERE i.query_id % 100 = 0
  GROUP BY i.query_id
) h ON h.query_id = q.query_id
"""
)

QUERIES.append(
    Query(
        "emb_ivf_recall",
        emb_ivf_recall_q,
        EMB_IVF_RECALL_SQL,
        "IVF index recall@3 vs exact brute force per query — the index-rollout gate",
    )
)


def emb_centroid_sim_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between LABEL CENTROIDS — the
    class-overlap diagnostic run before training a classifier or
    choosing hard-negative pairs (two labels whose centroids sit at
    cosine ~1 are candidates to merge; near 0, clean negatives).

    Exactness: each embedding dim is fixed-point floored at scale
    1000 (exact int64 in both engines); per-label dim SUMS are exact
    integer aggregates, and the centroid cosine equals the cosine of
    the sum vectors (the 1/n scalars cancel), so no division happens
    until the final double cosine — dot products stay < 2^53, so the
    int64 -> double casts are exact and the one sqrt/divide sequence
    is identical IEEE arithmetic on both engines.

    Shape: posexplode (64 dims/row) -> partial+final agg to 10x64
    label vectors -> broadcast self-join on dim for the 45 label
    pairs. At corpus scale only the first agg touches the data; the
    pair stage is constant-size.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * 1000).cast("long").alias("q"),
    )
    sums = el.groupBy("label", "pos").agg(F.sum("q").alias("s"))
    a = sums.select(
        F.col("label").alias("label_a"), "pos", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("label").alias("label_b"), "pos", F.col("s").alias("sb")
    )
    pairs = (
        a.join(F.broadcast(b), "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("dot"),
            F.sum(F.col("sa") * F.col("sa")).alias("na"),
            F.sum(F.col("sb") * F.col("sb")).alias("nb"),
        )
    )
    return pairs.select(
        F.col("label_a").cast("long").alias("label_a"),
        F.col("label_b").cast("long").alias("label_b"),
        (
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
        ).alias("centroid_cos"),
    )


EMB_CENTROID_SIM_SQL = """
WITH el AS (
  SELECT label, pos - 1 AS pos,
    CAST(FLOOR(val * 1000) AS BIGINT) AS q
  FROM (
    SELECT label, UNNEST(embedding) AS val,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  )
),
sums AS (
  SELECT label, pos, SUM(q) AS s FROM el GROUP BY 1, 2
)
SELECT CAST(a.label AS BIGINT) AS label_a, CAST(b.label AS BIGINT) AS label_b,
  CAST(SUM(a.s * b.s) AS DOUBLE)
    / (SQRT(CAST(SUM(a.s * a.s) AS DOUBLE)) * SQRT(CAST(SUM(b.s * b.s) AS DOUBLE)))
    AS centroid_cos
FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "emb_centroid_sim",
        emb_centroid_sim_q,
        EMB_CENTROID_SIM_SQL,
        "pairwise label-centroid cosine from exact fixed-point dim sums",
    )
)


def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix of the embedding corpus — the
    covariance/PCA/whitening prep stage of an embedding pipeline:
    G[i][j] = sum over vectors of q_i * q_j with q = floor(val*2^24)
    (the module's fixed-point discipline, so the 64x64 statistic is
    summation-order-free and hash-exact cross-engine). Upper triangle
    only (G is symmetric). ONE distributed pass: posexplode the
    vector elements once, self-join per vec_id on the tiny 64-element
    side (both sides are the same exploded scan), partial+final sum
    on (i, j) — shuffle volume is bounded by 64*65/2 rows per
    partition regardless of corpus size, which is the whole point:
    the driver-side eigensolve a consumer runs on the 2080-row result
    is O(dims^3), never O(corpus).

    OVERFLOW ENVELOPE (round-7 self-audit): each PRODUCT q_i*q_j is
    int64-safe iff |x| < 2^7 (then |q| < 2^31) — embeddings are
    unit-scale, 10^5x inside that bound. The SUM is another story:
    the true diagonal sum_N(q_i^2) crosses 2^63 near N ~ 10^5-10^6
    unit-scale vectors (the sf0.1 corpus of 128k vectors is already
    past the WORST-CASE envelope N * max|q|^2), so the accumulators
    are DECIMAL(38,0) — exact to ~10^38, i.e. any conceivable
    corpus — matching DuckDB, whose SUM(BIGINT) is a HUGEINT for the
    same reason; int64 accumulation would raise under ANSI at sf~1
    and silently wrap without it. The output column is the decimal
    rendered as a STRING: pandas lowers DuckDB DECIMAL(38,0) to
    float64 (the round-1 q17 HUGEINT escape), so only a digit
    string crosses the gate canon exactly.

    Plan note: the pair expansion is a DOUBLE posexplode of the same
    row (no self-join!), so the corpus never shuffles at all — the
    ONLY exchange in the plan moves the <= 2080 (i, j) partials per
    map partition (plan-pinned). The quantized array is materialized
    once per row by a single-level transform before the explodes
    (nesting the lambda would re-evaluate it per pair — the round-5
    HOF lesson)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr(
            "transform(embedding, x -> "
            "CAST(FLOOR(CAST(x AS DOUBLE) * 16777216) AS BIGINT))"
        ).alias("qarr")
    )
    a = q.select(F.posexplode("qarr").alias("i", "qi"), "qarr")
    return (
        a.select("i", "qi", F.posexplode("qarr").alias("j", "qj"))
        .where(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                (F.col("qi") * F.col("qj")).cast("decimal(38,0)")
            ).alias("gram")
        )
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.col("gram").cast("decimal(38,0)").cast("string").alias("gram"),
        )
    )


EMB_GRAM_SQL = """
WITH el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS q
  FROM embeddings
)
SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
       CAST(CAST(SUM(a.q * b.q) AS DECIMAL(38,0)) AS VARCHAR) AS gram
FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY 1, 2
"""

QUERIES.append(
    Query(
        "emb_gram_matrix",
        emb_gram_matrix,
        EMB_GRAM_SQL,
        "exact DECIMAL(38) Gram matrix (PCA/whitening prep): one pass, dims^2-bounded shuffle",
    )
)


def ann_filtered_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search (round 8) — the production-ANN feature
    every serving stack grew in 2023+: top-k under a metadata
    predicate (here label parity opposite to the query's, so every
    query has a nontrivial candidate subset). Spark-first this is
    pre-filtering: the predicate pushes into the target-side scan
    BEFORE the distance kernel (check PushedFilters in the plan), so
    the exact kernel only touches qualifying vectors — at 100 TB the
    filter prunes the scan, not the top-k. Same int64 fixed-point
    cosine + unique tiebreak as the unfiltered brute gate."""
    from map_reduce_project_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    targets = emb.where(F.col("label") % 2 == 1)
    return brute_force_topk(queries, targets, k=5)


ANN_FILTERED_SQL = (
    "WITH "
    + _EL.format(src="embeddings")
    + """,
lab AS (SELECT vec_id, label FROM embeddings),
dots AS (
  SELECT q.vec_id AS query_id, t.vec_id AS target_id,
         SUM(q.val * t.val) AS dot
  FROM el q
  JOIN el t ON q.pos = t.pos AND q.vec_id <> t.vec_id
  JOIN lab tl ON tl.vec_id = t.vec_id
  WHERE q.vec_id % 100 = 0 AND tl.label % 2 = 1
  GROUP BY q.vec_id, t.vec_id
),
cos AS (
  SELECT query_id, target_id,
         CAST(dot AS DOUBLE) / (SQRT(CAST(qn.norm2 AS DOUBLE)) * SQRT(CAST(tn.norm2 AS DOUBLE))) AS cosine
  FROM dots
  JOIN n2 qn ON qn.vec_id = query_id
  JOIN n2 tn ON tn.vec_id = target_id
)
SELECT query_id, target_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, target_id) AS BIGINT) AS rank
  FROM cos
) WHERE rank <= 5
"""
)

QUERIES.append(
    Query(
        "ann_filtered_topk",
        ann_filtered_topk_q,
        ANN_FILTERED_SQL,
        "filtered vector search: metadata predicate pushed into the target scan before the exact cosine top-k",
    )
)
