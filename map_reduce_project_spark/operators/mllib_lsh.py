"""MLlib LSH variants — the off-the-shelf rungs of the dedup/ANN ladder.

SURVEY.md §2.3 names ``MinHashLSH`` (near-dup over shingle sets) and
``BucketedRandomProjectionLSH`` (euclidean ANN) as the built-in
alternatives to the hand-rolled md5/sign-bucket operators in
operators/dedup.py and operators/similarity.py. The hand-rolled ones
are canonical here because their hashing is engine-portable (DuckDB
oracle); these MLlib pipelines are the library path a production user
would reach for first — seeded, tested for recall against the exact
operators, but not oracle-checkable (MLlib's hash families are
JVM-internal).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    CountVectorizer,
    MinHashLSH,
    NGram,
    RegexTokenizer,
)
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    num_hash_tables: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs via MLlib MinHashLSH over word
    k-gram shingle sets. Returns (id_a, id_b, jaccard_distance)."""
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern=" "
    )
    ngram = NGram(n=k, inputCol="_tokens", outputCol="_shingles")
    cv = CountVectorizer(
        inputCol="_shingles", outputCol="_features", binary=True
    )
    staged = ngram.transform(tokenizer.transform(docs))
    cv_model = cv.fit(staged)
    feats = cv_model.transform(staged)
    # MinHashLSH requires at least one non-zero entry
    feats = feats.where(
        F.expr("aggregate(_shingles, 0, (acc, x) -> acc + 1) > 0")
    )
    mh = MinHashLSH(
        inputCol="_features",
        outputCol="_hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_distance",
        )
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def brp_lsh_neighbors(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate euclidean nearest neighbors via MLlib
    BucketedRandomProjectionLSH. Returns (query_id, target_id,
    euclidean_distance, rank)."""
    # array_to_vector is JVM-native (no row-at-a-time Python)
    feats = vectors.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "_features"
        ),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = brp.fit(feats)
    qfeats = queries.select(
        F.col(id_col).alias("query_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_qf"),
    )
    from pyspark.sql.window import Window

    joined = model.approxSimilarityJoin(
        qfeats.withColumnRenamed("_qf", "_features"),
        feats,
        float("inf"),
        distCol="euclidean_distance",
    ).select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col(f"datasetB.{id_col}").alias("target_id"),
        "euclidean_distance",
    ).where(F.col("query_id") != F.col("target_id"))
    w = Window.partitionBy("query_id").orderBy(
        "euclidean_distance", "target_id"
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
