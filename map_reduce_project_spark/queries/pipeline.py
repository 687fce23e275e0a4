"""Training-pipeline queries: deterministic dataset splitting,
stratified sampling, and BM25 relevance scoring — the reproducibility
layer of a 100 TB data-prep stack (operators/sampling.py rationale:
content-hash randomness survives retries, repartitioning, and corpus
growth, unlike rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    importance_upsample,
    stratified_sample,
    weighted_sample,
)
from map_reduce_project_spark.operators.text import bm25_scores
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

DEC = "decimal(18,2)"

# DuckDB spelling of operators/sampling.hash_bucket
_BUCKET = (
    "('0x' || substr(md5('{salt}|' || {id}), 1, 8))::BIGINT % 10000"
)


def split_train_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 deterministic split of orders; per-split size and
    revenue prove the assignment (and its balance) exactly."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        hash_split(
            orders, "o_orderkey", {"train": 0.8, "valid": 0.1, "test": 0.1}
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("revenue"),
        )
    )


SPLIT_SQL = f"""
WITH b AS (
  SELECT o_totalprice,
         {_BUCKET.format(salt="split", id="o_orderkey")} AS bucket
  FROM orders
)
SELECT CASE WHEN bucket < 8000 THEN 'train'
            WHEN bucket < 9000 THEN 'valid'
            ELSE 'test' END AS split,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM b GROUP BY 1
"""


def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment deterministic sample of customers (20% BUILDING,
    10% MACHINERY, other segments dropped) — the reproducible twin of
    DataFrame.sampleBy."""
    cust = read_table(spark, sf_dir, "customer")
    return stratified_sample(
        cust,
        "c_mktsegment",
        {"BUILDING": 0.2, "MACHINERY": 0.1},
        id_col="c_custkey",
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


SAMPLE_STRAT_SQL = f"""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE (c_mktsegment = 'BUILDING'
       AND {_BUCKET.format(salt="strata", id="c_custkey")} < 2000)
   OR (c_mktsegment = 'MACHINERY'
       AND {_BUCKET.format(salt="strata", id="c_custkey")} < 1000)
"""


def sample_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% content-hash Bernoulli sample of the document corpus."""
    docs = read_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.05).select(
        "doc_id", "lang", "n_chars"
    )


SAMPLE_DOCS_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_BUCKET.format(salt="sample", id="doc_id")} < 500
"""


def sample_weighted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample: each document kept with
    probability min(20*n_chars, 10000)/10000 — the quality-weighted
    downsampling primitive (here weight = document length in lieu of a
    model score). Keep decision is an exact integer compare of the
    content-hash bucket against the per-row weight."""
    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs, "doc_id", F.least(F.col("n_chars") * 20, F.lit(10000))
    ).select("doc_id", "source", "n_chars")


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {_BUCKET.format(salt="weighted", id="doc_id")}
      < GREATEST(0, LEAST(10000, LEAST(n_chars * 20, 10000)))
"""


def sample_epoch_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing epoch replication: per-source epoch weights
    (0.25x / 1.0x / 1.75x / 2.5x by source id mod 4) applied with
    importance_upsample — whole copies always, the fractional copy by
    exact content-hash draw. The emitted (doc_id, copy_idx) multiset
    IS the training-mix manifest."""
    docs = read_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("long")
    weight = F.lit(2500) + (src_num % 4) * 7500
    return importance_upsample(docs, "doc_id", weight).select(
        "doc_id", "source", "copy_idx"
    )


SAMPLE_EPOCH_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
    2500 + (CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 4) * 7500
      AS wbp,
    {_BUCKET.format(salt="epoch", id="doc_id")} AS bucket
  FROM documents
),
n AS (
  SELECT doc_id, source,
    (wbp // 10000)
      + CASE WHEN bucket < wbp % 10000 THEN 1 ELSE 0 END AS n_copies
  FROM w
)
SELECT doc_id, source,
  CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_idx
FROM n
WHERE n_copies > 0
"""


BM25_TERMS = ["spark", "join", "window"]
_K1, _B = 1.2, 0.75


def text_bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query term
    set, corpus statistics computed in-plan (operators/text.bm25_scores)."""
    docs = read_table(spark, sf_dir, "documents")
    return bm25_scores(docs, BM25_TERMS)


_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
hits AS (SELECT doc_id, tok FROM tok WHERE tok IN ({_TERMS_SQL})),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, tok),
dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY tok)
SELECT tf.doc_id,
       ROUND(SUM(
         ln((stats.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
         * (tf.tf * ({_K1} + 1))
         / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
       ), 4) AS score
FROM tf
JOIN dft USING (tok)
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN stats
GROUP BY tf.doc_id
"""


def pipeline_curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A full training-data curation pass in ONE declarative plan:
    quality scoring + language ID + exact dedup -> the kept corpus.

    The composition every 100 TB pre-training pipeline runs: compute
    C4/Gopher-style quality heuristics and the language heuristic per
    document (pure codegen expressions over the scan), drop exact
    duplicates (hash-agg keep-min, left-semi join back — broadcastable
    at gate scale, shuffle-partitioned at corpus scale), keep documents
    that clear the quality threshold and the language filter. All
    predicates are over bit-deterministic values (the same expressions
    already hash-checked by text_quality/text_language_id), so the kept
    SET is engine-exact, not approximately similar.

    Runs on the duplicate-injected corpus so the dedup stage has real
    work; output is the kept (doc_id, n_tokens, pred_lang, quality).
    """
    from map_reduce_project_spark.operators.dedup import exact_dedup
    from map_reduce_project_spark.operators.text import (
        language_id,
        quality_score,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionAll(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    q = quality_score(corpus).select("doc_id", "n_tokens", "quality")
    lang = language_id(corpus).select("doc_id", "pred_lang")
    keep = exact_dedup(corpus, ["text"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    return (
        q.join(lang, "doc_id")
        .join(keep, "doc_id", "left_semi")
        .where((F.col("quality") >= 0.3) & (F.col("pred_lang") == "en"))
        .select("doc_id", "n_tokens", "pred_lang", "quality")
    )


CURATION_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
),
m AS (
  SELECT doc_id,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN ({{stops}}))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
    LENGTH(regexp_replace(text, '[^\\x{{{{4e00}}}}-\\x{{{{9fff}}}}]', '', 'g')) > 0 AS has_cjk
  FROM corpus
),
scored AS (
  SELECT doc_id, n_tokens,
    CASE WHEN has_cjk THEN 'cjk'
         WHEN stopword_ratio >= 0.05 THEN 'en'
         ELSE 'other' END AS pred_lang,
    CASE WHEN n_tokens < 5 THEN 0.0
         WHEN distinct_ratio < 0.1 THEN 0.0
         ELSE distinct_ratio * 0.5 + stopword_ratio * 0.25
              + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) * 0.25
    END AS quality
  FROM m
),
keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text))
SELECT s.doc_id, s.n_tokens, s.pred_lang, s.quality
FROM scored s JOIN keep USING (doc_id)
WHERE s.quality >= 0.3 AND s.pred_lang = 'en'
"""


def _curation_sql() -> str:
    from map_reduce_project_spark.operators.text import EN_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return CURATION_SQL.format(stops=stops)


def domain_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 10 documents, keeping the longest (n_chars
    DESC, doc_id tiebreak) — the domain-balancing step that stops a
    few giant sources from dominating the training mix."""
    from map_reduce_project_spark.operators.sampling import cap_per_group

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return cap_per_group(
        docs, group_col="source", order_col="n_chars", id_col="doc_id", cap=10
    )


DOMAIN_BALANCE_SQL = """
SELECT doc_id, source, n_chars, rank_in_group FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rank_in_group
  FROM documents
) WHERE rank_in_group <= 10
"""



def sample_lang_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha=0.5 temperature rebalancing of the language mix: each
    language's target = 200 * isqrt(count) / sum(isqrt(count)),
    filled by the frozen hash-order draw — head languages flatten,
    tail languages keep share (operators/sampling.py:
    temperature_sample). All-integer arithmetic, exact hash match."""
    from map_reduce_project_spark.operators.sampling import (
        temperature_sample,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_sample(
        docs, group_col="lang", id_col="doc_id", total_target=200,
        salt="lang_temp",
    )


SAMPLE_TEMP_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*) AS grp_count,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS w
  FROM documents GROUP BY lang
), tot AS (
  SELECT SUM(w) AS sum_w FROM counts
), targets AS (
  SELECT lang, grp_count,
         CAST((200 * w) // sum_w AS BIGINT) AS grp_target
  FROM counts CROSS JOIN tot
), ranked AS (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('lang_temp|' || doc_id), 1, 8))::BIGINT,
                    doc_id
         ) AS BIGINT) AS rk
  FROM documents
)
SELECT doc_id, ranked.lang AS lang, grp_count, grp_target, rk
FROM ranked JOIN targets ON ranked.lang = targets.lang
WHERE rk <= grp_target
"""


def curation_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade attrition funnel in ONE scan: survivors after
    each cumulative curation rule (length band -> min token count ->
    target languages -> exact-dup keep-first), as conditional sums in
    a single aggregate. This is the observability half of a curation
    pipeline — the per-rule attrition report that tells you WHICH rule
    ate the corpus before you ship a training mix. The only exchanges
    are the dedup rank window and the final single-row aggregate."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    rk = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy("doc_id")
    )
    f = docs.select(
        F.col("n_chars").between(200, 1200).alias("len_ok"),
        (F.size(F.split(F.col("text"), " ")) >= 30).alias("tok_ok"),
        F.col("lang").isin("en", "es", "de", "fr").alias("lang_ok"),
        (rk == 1).alias("uniq_ok"),
    )

    def stage(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    s1 = F.col("len_ok")
    s2 = s1 & F.col("tok_ok")
    s3 = s2 & F.col("lang_ok")
    s4 = s3 & F.col("uniq_ok")
    return f.agg(
        F.count("*").alias("n_total"),
        stage(s1, "n_after_len"),
        stage(s2, "n_after_tokens"),
        stage(s3, "n_after_lang"),
        stage(s4, "n_after_dedup"),
    )


CURATION_FUNNEL_SQL = """
WITH f AS (
  SELECT n_chars BETWEEN 200 AND 1200 AS len_ok,
         LEN(string_split(text, ' ')) >= 30 AS tok_ok,
         lang IN ('en', 'es', 'de', 'fr') AS lang_ok,
         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
           AS uniq_ok
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
  CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_after_len,
  CAST(SUM(CASE WHEN len_ok AND tok_ok THEN 1 ELSE 0 END) AS BIGINT)
    AS n_after_tokens,
  CAST(SUM(CASE WHEN len_ok AND tok_ok AND lang_ok THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after_lang,
  CAST(SUM(CASE WHEN len_ok AND tok_ok AND lang_ok AND uniq_ok THEN 1
    ELSE 0 END) AS BIGINT) AS n_after_dedup
FROM f
"""

QUERIES = [
    Query("domain_balance", domain_balance_q, DOMAIN_BALANCE_SQL, "per-source document cap (domain balancing), deterministic ranking"),
    Query("split_train_test", split_train_test_q, SPLIT_SQL, "deterministic 80/10/10 content-hash dataset split"),
    Query("sample_stratified", sample_stratified_q, SAMPLE_STRAT_SQL, "per-stratum deterministic sample (reproducible sampleBy)"),
    Query("sample_documents", sample_documents_q, SAMPLE_DOCS_SQL, "content-hash Bernoulli corpus sample"),
    Query("sample_weighted", sample_weighted_q, SAMPLE_WEIGHTED_SQL, "per-row weighted Bernoulli sample (quality-weighted downsampling)"),
    Query("sample_epoch_mix", sample_epoch_mix_q, SAMPLE_EPOCH_SQL, "corpus-mixing epoch replication (importance upsampling manifest)"),
    Query("text_bm25", text_bm25_q, BM25_SQL, "BM25 relevance scoring with in-plan corpus statistics"),
    Query("pipeline_curation", pipeline_curation_q, _curation_sql(), "quality + language + exact-dedup curation pass (kept corpus)"),
    Query("sample_lang_temperature", sample_lang_temperature_q, SAMPLE_TEMP_SQL, "alpha=0.5 temperature language-mix rebalancing, integer-exact"),
    Query("curation_funnel", curation_funnel_q, CURATION_FUNNEL_SQL, "single-scan filter-cascade attrition funnel (cumulative rule survivors)"),
]


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical leg + exact-cosine semantic leg fused
# with Reciprocal Rank Fusion (Cormack et al. 2009): rrf(d) =
# sum over legs 1/(K + rank_leg(d)). Rank-based, so the fusion needs
# no score calibration between legs — and it is engine-exact because
# only integer ranks enter the formula.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_LEG_TOPK = 50
RRF_FINAL_TOPK = 10


def rag_hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: lexical BM25 top-50 and semantic cosine top-50
    (query = vector 0), fused by reciprocal-rank and cut to a final
    top-10 — the two-leg retrieval shape RAG stacks run before
    reranking.

    Scale notes: the lexical leg's global rank is a window over only
    the documents matching a query term (bounded by posting-list size,
    not corpus size); the semantic leg is the broadcast-query exact
    kernel (per-bucket at corpus scale via IVF/LSH — same fusion plan
    either way); the fusion join touches 2x50 rows.
    """
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = read_table(spark, sf_dir, "embeddings")

    lex = bm25_scores(docs, BM25_TERMS)
    wl = Window.orderBy(F.col("score").desc(), "doc_id")
    lex_rank = (
        lex.withColumn("rank_lex", F.row_number().over(wl).cast("long"))
        .where(F.col("rank_lex") <= RRF_LEG_TOPK)
        .select("doc_id", "rank_lex")
    )

    from map_reduce_project_spark.operators.similarity import brute_force_topk

    sem_rank = brute_force_topk(
        emb.where(F.col("vec_id") == 0), emb, k=RRF_LEG_TOPK
    ).select(F.col("target_id").alias("doc_id"), F.col("rank").alias("rank_sem"))

    fused = lex_rank.join(sem_rank, "doc_id", "full_outer")
    leg = lambda c: F.when(
        F.col(c).isNotNull(), F.lit(1.0) / (F.lit(RRF_K) + F.col(c))
    ).otherwise(F.lit(0.0))
    scored = fused.select(
        "doc_id",
        F.coalesce("rank_lex", F.lit(-1)).alias("rank_lex"),
        F.coalesce("rank_sem", F.lit(-1)).alias("rank_sem"),
        (leg("rank_lex") + leg("rank_sem")).alias("rrf_score"),
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), "doc_id")
    return (
        scored.withColumn("final_rank", F.row_number().over(wf).cast("long"))
        .where(F.col("final_rank") <= RRF_FINAL_TOPK)
    )


RRF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
hits AS (SELECT doc_id, tok FROM tok WHERE tok IN ({_TERMS_SQL})),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM hits GROUP BY doc_id, tok),
dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY tok),
bm25 AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln((stats.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
           * (tf.tf * ({_K1} + 1))
           / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
         ), 4) AS score
  FROM tf
  JOIN dft USING (tok)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_lex
    FROM bm25
  ) WHERE rank_lex <= {RRF_LEG_TOPK}
),
el AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 16777216) AS BIGINT) AS val
  FROM embeddings
),
n2 AS (SELECT vec_id, SUM(val * val) AS norm2 FROM el GROUP BY vec_id),
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
sem AS (
  SELECT doc_id, rank_sem FROM (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank_sem
    FROM cos
  ) WHERE rank_sem <= {RRF_LEG_TOPK}
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         CAST(COALESCE(rank_lex, -1) AS BIGINT) AS rank_lex,
         CAST(COALESCE(rank_sem, -1) AS BIGINT) AS rank_sem,
         (CASE WHEN rank_lex IS NOT NULL THEN 1.0 / ({RRF_K} + rank_lex) ELSE 0.0 END)
         + (CASE WHEN rank_sem IS NOT NULL THEN 1.0 / ({RRF_K} + rank_sem) ELSE 0.0 END)
           AS rrf_score
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, rank_lex, rank_sem, rrf_score, final_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS final_rank
  FROM fused
) WHERE final_rank <= {RRF_FINAL_TOPK}
"""

QUERIES.append(
    Query(
        "rag_hybrid_rrf",
        rag_hybrid_rrf_q,
        RRF_SQL,
        "hybrid retrieval: BM25 + cosine legs fused by reciprocal-rank (RRF), engine-exact ranks",
    )
)


def sample_balanced_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language downsampled to the
    minority language's document count via deterministic per-class
    hash ranking (operators.sampling.balance_classes) — the
    label-rebalancing step before classifier training, reproducible
    and engine-exact."""
    from map_reduce_project_spark.operators.sampling import balance_classes

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return balance_classes(docs, "lang", "doc_id")


SAMPLE_BALANCED_SQL = """
WITH m AS (
  SELECT MIN(n) AS min_n FROM (
    SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
  )
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('balance|' || doc_id), 1, 8))::BIGINT,
                    doc_id
         ) AS r
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM ranked CROSS JOIN m
WHERE r <= m.min_n
"""

QUERIES.append(
    Query(
        "sample_balanced",
        sample_balanced_q,
        SAMPLE_BALANCED_SQL,
        "class-balanced downsampling to the minority class via hash ranking",
    )
)


def sample_kfold_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) from the content hash —
    folds are reproducible, partitioning-invariant, and disjoint by
    construction (the same salted-hash discipline as every sampler
    here). Output: per-fold document counts and mean length, the
    balance check run before trusting the folds."""
    docs = read_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.concat(F.lit("kfold|"), "doc_id")), 1, 8), 16, 10)
        .cast("long")
        % 5
    )
    return (
        docs.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


SAMPLE_KFOLD_SQL = """
SELECT ('0x' || substr(md5('kfold|' || doc_id), 1, 8))::BIGINT % 5 AS fold,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""

QUERIES.append(
    Query(
        "sample_kfold",
        sample_kfold_q,
        SAMPLE_KFOLD_SQL,
        "reproducible k-fold assignment from salted content hashes, with balance check",
    )
)


def sample_bootstrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap resample of the documents table: each
    doc gets Binomial(8, 1/8) replicates from its salted content hash
    (operators.sampling.bootstrap_replicates) — the resampling step
    behind bootstrap confidence intervals on corpus statistics,
    reproducible across engines and retries. Zero-shuffle plan: hash,
    filter, generator explode."""
    from map_reduce_project_spark.operators.sampling import (
        bootstrap_replicates,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return bootstrap_replicates(docs, "doc_id")


SAMPLE_BOOTSTRAP_SQL = """
WITH counted AS (
  SELECT doc_id, lang, n_chars,
         (CASE WHEN substr(md5('bootstrap|' || doc_id), 1, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 2, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 3, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 4, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 5, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 6, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 7, 1) IN ('0','1') THEN 1 ELSE 0 END
        + CASE WHEN substr(md5('bootstrap|' || doc_id), 8, 1) IN ('0','1') THEN 1 ELSE 0 END
         ) AS cnt
  FROM documents
)
SELECT doc_id, lang, n_chars,
       CAST(UNNEST(generate_series(1, cnt)) AS BIGINT) AS replicate
FROM counted
WHERE cnt > 0
"""

QUERIES.append(
    Query(
        "sample_bootstrap",
        sample_bootstrap_q,
        SAMPLE_BOOTSTRAP_SQL,
        "deterministic Binomial(8,1/8) bootstrap replicates from content hashes",
    )
)


def sample_curriculum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering manifest: shortest-to-longest staged
    training order (the classic length curriculum) with deterministic
    within-stage shuffling. Stage = which of the 9 exact decile
    boundaries of ``n_chars`` (percentile_disc — picks real data
    values, engine-exact) the doc exceeds; within a stage the order
    is a salted md5 of the doc id, so epochs are reproducible and
    uncorrelated with the corpus layout. The boundary aggregate is
    ONE row cross-joined back (lazy, broadcast — no collect); the
    within-stage row_number partitions by stage, which is the
    manifest-plane sort every curriculum trainer needs anyway.
    Output: (doc_id, stage, curriculum_rank)."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bounds = docs.agg(
        *[
            F.expr(
                f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY n_chars)"
            ).alias(f"b{i}")
            for i in range(1, 10)
        ]
    )
    staged = docs.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        (
            F.lit(1)
            + sum(
                F.when(F.col("n_chars") > F.col(f"b{i}"), 1).otherwise(0)
                for i in range(1, 10)
            )
        )
        .cast("long")
        .alias("stage"),
        F.md5(F.concat(F.lit("curr|"), F.col("doc_id").cast("string"))).alias(
            "_h"
        ),
    )
    w = Window.partitionBy("stage").orderBy("_h", "doc_id")
    return staged.select(
        "doc_id",
        "stage",
        F.row_number().over(w).cast("long").alias("curriculum_rank"),
    )


SAMPLE_CURRICULUM_SQL = """
WITH bounds AS (
  SELECT
    percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars) AS b1,
    percentile_disc(0.2) WITHIN GROUP (ORDER BY n_chars) AS b2,
    percentile_disc(0.3) WITHIN GROUP (ORDER BY n_chars) AS b3,
    percentile_disc(0.4) WITHIN GROUP (ORDER BY n_chars) AS b4,
    percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS b5,
    percentile_disc(0.6) WITHIN GROUP (ORDER BY n_chars) AS b6,
    percentile_disc(0.7) WITHIN GROUP (ORDER BY n_chars) AS b7,
    percentile_disc(0.8) WITHIN GROUP (ORDER BY n_chars) AS b8,
    percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars) AS b9
  FROM documents
),
staged AS (
  SELECT doc_id,
    CAST(1
      + (CASE WHEN n_chars > b1 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b2 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b3 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b4 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b5 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b6 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b7 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b8 THEN 1 ELSE 0 END)
      + (CASE WHEN n_chars > b9 THEN 1 ELSE 0 END) AS BIGINT) AS stage,
    md5('curr|' || doc_id) AS _h
  FROM documents CROSS JOIN bounds
)
SELECT doc_id, stage,
  CAST(ROW_NUMBER() OVER (PARTITION BY stage ORDER BY _h, doc_id) AS BIGINT)
    AS curriculum_rank
FROM staged
"""

QUERIES.append(
    Query(
        "sample_curriculum",
        sample_curriculum_q,
        SAMPLE_CURRICULUM_SQL,
        "length-curriculum manifest: exact decile stages + salted within-stage order",
    )
)


def sample_bottom_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-SIZE uniform sample without replacement via bottom-k
    hashing: rank documents by a salted md5 of their id and keep the
    100 smallest — the deterministic twin of reservoir sampling
    (Bernoulli samplers give a BINOMIAL size; bottom-k gives exactly
    k, which is what eval-set carving and sketch-union estimators
    need). One rank over a content hash — on a cluster this is a
    top-k (takeOrdered-shaped) aggregation, never a global sort of
    the corpus; the same hash order is reproducible across engines,
    retries, and partitionings."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.md5(F.concat(F.lit("bk|"), F.col("doc_id").cast("string")))
    # orderBy+limit plans as TakeOrderedAndProject — a DISTRIBUTED
    # top-k (per-partition heaps merged at the driver), never a
    # single-partition global sort; the rank window then runs over
    # exactly k rows
    top = docs.withColumn("_h", h).orderBy("_h", "doc_id").limit(100)
    w = Window.orderBy(F.col("_h"), F.col("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("doc_id", "n_chars", "rank")


SAMPLE_BOTTOM_K_SQL = """
SELECT doc_id, n_chars,
  CAST(ROW_NUMBER() OVER (ORDER BY md5('bk|' || doc_id), doc_id) AS BIGINT)
    AS rank
FROM documents
QUALIFY rank <= 100
"""

QUERIES.append(
    Query(
        "sample_bottom_k",
        sample_bottom_k_q,
        SAMPLE_BOTTOM_K_SQL,
        "bottom-k hash sample: exactly-k uniform draw, reproducible cross-engine",
    )
)


def feat_target_encode_oof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe OUT-OF-FOLD target encoding — the feature-
    engineering step that replaces a category with the target mean
    computed on the OTHER folds, so a row never sees its own label
    (in-fold encoding leaks the target and inflates validation
    scores). Folds come from the same salted content hash as
    sample_kfold (reproducible, partitioning-invariant); the encoding
    is emitted as an exact integer (numerator, denominator) pair per
    (category, fold) — the x-denominator rational discipline — so the
    gate hashes pure int64 and the consumer performs the one division.
    One aggregation + one category-window pass; no per-row shuffle of
    the training table beyond the grouped agg."""
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kfold|"), "o_orderkey")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    target = (F.col("o_totalprice") >= 150000).cast("long")
    per = (
        orders.select(
            F.col("o_orderpriority").alias("category"),
            fold.alias("fold"),
            target.alias("t"),
        )
        .groupBy("category", "fold")
        .agg(
            F.sum("t").cast("long").alias("fold_pos"),
            F.count("*").cast("long").alias("fold_cnt"),
        )
    )
    w = Window.partitionBy("category")
    return per.select(
        "category",
        "fold",
        (F.sum("fold_pos").over(w) - F.col("fold_pos"))
        .cast("long")
        .alias("oof_pos"),
        (F.sum("fold_cnt").over(w) - F.col("fold_cnt"))
        .cast("long")
        .alias("oof_cnt"),
    )


FEAT_TARGET_ENCODE_SQL = """
WITH per AS (
  SELECT o_orderpriority AS category,
    ('0x' || substr(md5('kfold|' || o_orderkey), 1, 8))::BIGINT % 5 AS fold,
    CAST(SUM(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END) AS BIGINT)
      AS fold_pos,
    CAST(COUNT(*) AS BIGINT) AS fold_cnt
  FROM orders
  GROUP BY 1, 2
)
SELECT category, fold,
  CAST(SUM(fold_pos) OVER (PARTITION BY category) - fold_pos AS BIGINT)
    AS oof_pos,
  CAST(SUM(fold_cnt) OVER (PARTITION BY category) - fold_cnt AS BIGINT)
    AS oof_cnt
FROM per
"""

QUERIES.append(
    Query(
        "feat_target_encode_oof",
        feat_target_encode_oof_q,
        FEAT_TARGET_ENCODE_SQL,
        "leakage-safe out-of-fold target encoding as exact (num, den) rationals",
    )
)


def sample_poisson_bootstrap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap resampling weights over the documents
    corpus (round 7): each row draws an exact integer-CDF Poisson
    multiplicity from its salted md5 uniform
    (operators/sampling.py:poisson_bootstrap_weights) — the
    distributed bootstrap (per-row independent draws instead of a
    global n-with-replacement shuffle; Chamandy et al. 2012). The
    gate aggregates the full weight distribution per source: row
    count, total resampled weight (mean ~ 1), and the count at each
    multiplicity 0..6 — any drift in the hash, the CDF table, or the
    comparison chain moves some bucket count."""
    from map_reduce_project_spark.operators.sampling import (
        poisson_bootstrap_weights,
    )

    docs = read_table(spark, sf_dir, "documents")
    w = poisson_bootstrap_weights(docs, "doc_id")
    return (
        w.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("boot_weight").cast("long").alias("total_weight"),
            *[
                F.sum((F.col("boot_weight") == k).cast("long"))
                .alias(f"n_k{k}")
                for k in range(7)
            ],
        )
    )


SAMPLE_POISSON_SQL = """
WITH w AS (
  SELECT source,
    CASE
      WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
      WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
      WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5
      ELSE 6
    END AS boot_weight
  FROM (
    SELECT source,
      ('0x' || substr(md5('poisson|' || doc_id), 1, 8))::BIGINT
        % 1000000 AS u
    FROM documents
  )
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(boot_weight) AS BIGINT) AS total_weight,
  CAST(SUM(CASE WHEN boot_weight = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_k0,
  CAST(SUM(CASE WHEN boot_weight = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_k1,
  CAST(SUM(CASE WHEN boot_weight = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_k2,
  CAST(SUM(CASE WHEN boot_weight = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_k3,
  CAST(SUM(CASE WHEN boot_weight = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_k4,
  CAST(SUM(CASE WHEN boot_weight = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_k5,
  CAST(SUM(CASE WHEN boot_weight = 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_k6
FROM w
GROUP BY source
"""

QUERIES.append(
    Query(
        "sample_poisson_bootstrap",
        sample_poisson_bootstrap_q,
        SAMPLE_POISSON_SQL,
        "Poisson(1) bootstrap weights: exact integer-CDF draws, per-source distribution gated",
    )
)


# ---------------------------------------------------------------------------
# WARC/WET ingestion (round 9) — the crawl pipeline's stage minus-one.


def warc_records_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive ingestion under the exact gate (sources/warc.py): a
    deterministic WET fixture — one conversion record per documents
    row plus a warcinfo record per archive, spread over 8 files with
    the odd files per-record-gzip-member compressed (Common Crawl
    layout) — is read back through the custom ``warc`` Python
    DataSource (one partition per archive file, task-side streaming
    parse). The oracle predicts every parsed field from the documents
    table alone, INCLUDING content_length recomputed from the
    predicted payload text — so writer and reader cannot hide
    mutually-cancelling length bugs."""
    from map_reduce_project_spark.sources.warc import (
        ensure_synthetic_warc_dir,
        read_warc,
    )

    path = ensure_synthetic_warc_dir(sf_dir)
    return read_warc(spark, path).select(
        "warc_file",
        "record_pos",
        "warc_version",
        "warc_type",
        "record_id",
        F.coalesce("target_uri", F.lit("")).alias("target_uri"),
        "warc_date",
        "content_type",
        "content_length",
        F.col("payload").cast("string").alias("payload"),
    )


_WET_PAYLOAD_DUCK = (
    "'Document ' || CAST(doc_id AS VARCHAR) || ' headline' || chr(10) || "
    "'The quick brown fox jumps over the lazy dog ' || "
    "CAST(doc_id % 7 AS VARCHAR) || ' times.' || chr(10) || "
    "'- bullet item ' || CAST(doc_id % 5 AS VARCHAR) || "
    "' in the summary list' || chr(10) || "
    "'Trailing thought number ' || CAST(doc_id % 3 AS VARCHAR) || "
    "'...' || chr(10) || "
    "'Shared boilerplate footer line' || chr(10) || "
    "repeat('repeated filler sentence for padding' || chr(10), "
    "CAST(doc_id % 4 AS INT))"
)

_UUID_DUCK = (
    "'<urn:uuid:' || substr({h}, 1, 8) || '-' || substr({h}, 9, 4) || "
    "'-' || substr({h}, 13, 4) || '-' || substr({h}, 17, 4) || '-' || "
    "substr({h}, 21, 12) || '>'"
)

WARC_RECORDS_SQL = f"""
WITH p AS (
  SELECT doc_id,
         doc_id % 8 AS fi,
         {_WET_PAYLOAD_DUCK} AS payload
  FROM documents
),
conv AS (
  SELECT
    printf('synth-%04d.warc', fi)
      || CASE WHEN fi % 2 = 1 THEN '.gz' ELSE '' END AS warc_file,
    CAST(1 + ROW_NUMBER() OVER (PARTITION BY fi ORDER BY doc_id)
         AS BIGINT) AS record_pos,
    'WARC/1.0' AS warc_version,
    'conversion' AS warc_type,
    {_UUID_DUCK.format(h="md5(CAST(doc_id AS VARCHAR))")} AS record_id,
    'https://example' || CAST(doc_id % 50 AS VARCHAR)
      || '.com/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
    '2026-08-15T00:00:00Z' AS warc_date,
    'text/plain' AS content_type,
    CAST(length(payload) AS BIGINT) AS content_length,
    payload
  FROM p
),
info AS (
  SELECT DISTINCT fi,
    'software: synth-wet 1.0' || chr(13) || chr(10)
      || 'file-index: ' || CAST(fi AS VARCHAR) || chr(13) || chr(10)
      AS payload
  FROM p
),
infor AS (
  SELECT
    printf('synth-%04d.warc', fi)
      || CASE WHEN fi % 2 = 1 THEN '.gz' ELSE '' END AS warc_file,
    CAST(1 AS BIGINT) AS record_pos,
    'WARC/1.0' AS warc_version,
    'warcinfo' AS warc_type,
    {_UUID_DUCK.format(h="md5('warcinfo:' || CAST(fi AS VARCHAR))")}
      AS record_id,
    '' AS target_uri,
    '2026-08-15T00:00:00Z' AS warc_date,
    'application/warc-fields' AS content_type,
    CAST(length(payload) AS BIGINT) AS content_length,
    payload
  FROM info
)
SELECT * FROM conv UNION ALL SELECT * FROM infor
"""

QUERIES.append(
    Query(
        "warc_records",
        warc_records_q,
        WARC_RECORDS_SQL,
        "WARC/WET archive ingestion via custom Python DataSource; every parsed field oracle-predicted",
    )
)


def warc_gopher_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-based Gopher repetition rules (Rae et al. 2021 A1) over
    ACTUAL archive-reader output — WET conversion records parsed by
    the warc DataSource, doc_id recovered from the target URI, then
    operators/text.gopher_line_rules on the multi-line payload (the
    rules gopher_rules omits for single-line corpora). The oracle
    re-derives the payload from documents and evaluates the same
    integer definitions in DuckDB list functions."""
    from map_reduce_project_spark.operators.text import (
        gopher_line_rules,
    )
    from map_reduce_project_spark.sources.warc import (
        ensure_synthetic_warc_dir,
        read_warc,
    )

    path = ensure_synthetic_warc_dir(sf_dir)
    docs = (
        read_warc(spark, path)
        .where(F.col("warc_type") == "conversion")
        .select(
            F.regexp_extract("target_uri", "/doc/([0-9]+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
        )
    )
    return gopher_line_rules(docs)


# Shared by warc_gopher_lines and wet_curation_manifest — one
# definition of the line-rule replay so the two oracles cannot drift
_WET_LINE_CTES = f"""p AS (
  SELECT doc_id, {_WET_PAYLOAD_DUCK} AS text FROM documents
),
l AS (
  SELECT doc_id,
    list_filter(string_split(text, chr(10)),
                x -> length(x) > 0) AS lines
  FROM p
),
d AS (
  SELECT doc_id, lines, list_distinct(lines) AS dlines FROM l
),
s AS (
  SELECT doc_id,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines, x ->
      x LIKE '- %' OR x LIKE '* %' OR x LIKE chr(8226) || '%'))
      AS BIGINT) AS n_bullet_lines,
    CAST(len(list_filter(lines, x -> x LIKE '%...'))
      AS BIGINT) AS n_ellipsis_lines,
    CAST(len(lines) - len(dlines) AS BIGINT) AS n_dup_lines,
    CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
      AS BIGINT) AS line_chars,
    CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
       - coalesce(list_sum(list_transform(dlines, x -> length(x))), 0)
      AS BIGINT) AS dup_line_chars
  FROM d
)"""

_LINE_PASS_SQL = (
    "(10 * n_bullet_lines <= 9 * n_lines"
    " AND 10 * n_ellipsis_lines <= 3 * n_lines"
    " AND 10 * n_dup_lines <= 3 * n_lines"
    " AND 5 * dup_line_chars <= line_chars)"
)

WARC_GOPHER_LINES_SQL = f"""
WITH {_WET_LINE_CTES}
SELECT s.*,
  10 * n_bullet_lines <= 9 * n_lines AS pass_bullet_lines,
  10 * n_ellipsis_lines <= 3 * n_lines AS pass_ellipsis_lines,
  10 * n_dup_lines <= 3 * n_lines AS pass_dup_lines,
  5 * dup_line_chars <= line_chars AS pass_dup_line_chars,
  {_LINE_PASS_SQL} AS gopher_line_pass
FROM s
"""

QUERIES.append(
    Query(
        "warc_gopher_lines",
        warc_gopher_lines_q,
        WARC_GOPHER_LINES_SQL,
        "line-based Gopher repetition rules over parsed WET records (bullet/ellipsis/duplicate-line fractions)",
    )
)


def wet_curation_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl arc end-to-end FROM THE ARCHIVE (round 9): WET
    records parsed by the warc DataSource -> line-based Gopher
    repetition filter on the decoded multi-line payloads ->
    headline-normalized exact dedup (fingerprint = payload minus its
    first line, the crawl pattern for "same body, different title"
    copies — the synthetic payloads collide exactly on doc_id mod
    420) -> fixed-context packing manifest of the kept corpus. The
    curation_capstone starts from an already-columnar html column;
    this query pins the stage-minus-one seams instead: binary payload
    -> text decode -> line semantics -> manifest. Every stage
    oracle-replayed from the documents table alone.
    """
    from map_reduce_project_spark.operators.dedup import exact_dedup
    from map_reduce_project_spark.operators.text import (
        gopher_line_rules,
        pack_sequences,
    )
    from map_reduce_project_spark.sources.warc import (
        ensure_synthetic_warc_dir,
        read_warc,
    )

    path = ensure_synthetic_warc_dir(sf_dir)
    # barrier the parsed records (O9 discipline, the capstone's
    # lesson): docs feeds both sides of the kept join and fp feeds
    # both the dedup aggregate and the canon branch — without
    # barriers the archive parse + HOF line rules re-execute ~4x
    docs = (
        read_warc(spark, path)
        .where(F.col("warc_type") == "conversion")
        .select(
            F.regexp_extract("target_uri", "/doc/([0-9]+)$", 1)
            .cast("long")
            .alias("doc_id"),
            # CR-normalize ONCE at entry: payloads are byte-verbatim
            # and every downstream stage (line rules, body
            # fingerprint, token split) must see one line convention
            # or same-body CRLF/LF documents would never dedup
            F.regexp_replace(
                F.col("payload").cast("string"), "\r\n", "\n"
            ).alias("text"),
        )
        .localCheckpoint(eager=False)
    )
    rules = gopher_line_rules(docs)
    kept = docs.join(
        rules.where(F.col("gopher_line_pass")).select(
            "doc_id", "n_lines"
        ),
        "doc_id",
    )
    # fingerprint: everything after the first newline (headline off)
    fp = kept.withColumn(
        "_body", F.expr("substring(text, instr(text, '\n') + 1)")
    ).localCheckpoint(eager=False)
    keepers = exact_dedup(fp, ["_body"], "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    canon = fp.join(keepers, "doc_id", "left_semi").select(
        "doc_id",
        "n_lines",
        F.regexp_replace("text", "\n", " ").alias("text"),
    )
    packed = pack_sequences(canon, context_len=512)
    return packed.join(
        canon.select("doc_id", "n_lines"), "doc_id"
    ).select(
        "doc_id",
        "n_lines",
        "n_tokens",
        "start_offset",
        "bin_id",
        "offset_in_bin",
    )


WET_CURATION_SQL = f"""
WITH {_WET_LINE_CTES},
keptq AS (
  SELECT p.doc_id, p.text, s.n_lines
  FROM p JOIN s USING (doc_id)
  WHERE {_LINE_PASS_SQL}
),
fpq AS (
  SELECT doc_id, text, n_lines,
         substr(text, position(chr(10) IN text) + 1) AS body
  FROM keptq
),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM fpq GROUP BY body
),
canon AS (
  SELECT f.doc_id, f.n_lines,
         CAST(len(string_split(replace(f.text, chr(10), ' '), ' '))
              AS BIGINT) AS n_tokens
  FROM fpq f JOIN keepers USING (doc_id)
),
packedq AS (
  SELECT doc_id, n_lines, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS BIGINT) AS start_offset
  FROM canon
)
SELECT doc_id, n_lines, n_tokens, start_offset,
  CAST(start_offset // 512 AS BIGINT) AS bin_id,
  CAST(start_offset % 512 AS BIGINT) AS offset_in_bin
FROM packedq
"""

QUERIES.append(
    Query(
        "wet_curation_manifest",
        wet_curation_manifest_q,
        WET_CURATION_SQL,
        "archive-to-manifest integration: WET parse -> line-rule filter -> headline-normalized dedup -> packing manifest",
    )
)
