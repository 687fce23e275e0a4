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
    stratified_sample,
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


QUERIES = [
    Query("split_train_test", split_train_test_q, SPLIT_SQL, "deterministic 80/10/10 content-hash dataset split"),
    Query("sample_stratified", sample_stratified_q, SAMPLE_STRAT_SQL, "per-stratum deterministic sample (reproducible sampleBy)"),
    Query("sample_documents", sample_documents_q, SAMPLE_DOCS_SQL, "content-hash Bernoulli corpus sample"),
    Query("text_bm25", text_bm25_q, BM25_SQL, "BM25 relevance scoring with in-plan corpus statistics"),
]
