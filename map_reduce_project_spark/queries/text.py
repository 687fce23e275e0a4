"""Text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.text import (
    EN_STOPWORDS,
    bpe_token_count,
    chunk_documents,
    fingerprint,
    language_id,
    quality_score,
    text_stats,
)
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

_STOP_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(read_table(spark, sf_dir, "documents"))


TEXT_STATS_SQL = """
SELECT doc_id,
  CAST(LENGTH(text) AS BIGINT) AS n_chars,
  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(LEN(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
  CAST(LENGTH(text) - LEN(string_split(text, ' ')) + 1 AS DOUBLE)
    / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
FROM documents
"""


def bpe_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_token_count(read_table(spark, sf_dir, "documents"))


BPE_TOKENS_SQL = r"""
SELECT doc_id,
  CAST(LEN(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def language_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(read_table(spark, sf_dir, "documents"))


LANGID_SQL = f"""
WITH scored AS (
  SELECT doc_id,
    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN ({_STOP_LIST}))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS en_score,
    LENGTH(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 AS has_cjk
  FROM documents
)
SELECT doc_id,
  CASE WHEN has_cjk THEN 'cjk'
       WHEN en_score >= 0.05 THEN 'en'
       ELSE 'other' END AS pred_lang,
  en_score
FROM scored
"""


def quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(read_table(spark, sf_dir, "documents"))


QUALITY_SQL = f"""
WITH m AS (
  SELECT doc_id,
    CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN ({_STOP_LIST}))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
  FROM documents
)
SELECT doc_id, n_tokens,
  CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
  stopword_ratio, distinct_ratio,
  CASE WHEN n_tokens < 5 THEN 0.0
       WHEN distinct_ratio < 0.1 THEN 0.0
       ELSE distinct_ratio * 0.5 + stopword_ratio * 0.25
            + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) * 0.25
  END AS quality
FROM m
"""


def fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(read_table(spark, sf_dir, "documents"))


FINGERPRINT_SQL = """
SELECT doc_id,
  md5(text) AS raw_fp,
  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fp
FROM documents
"""


def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.text import repetition_metrics

    return repetition_metrics(read_table(spark, sf_dir, "documents"))


# mirror of shingles_expr(n): slice-beyond-end semantics give
# greatest(len-n+1, 1) grams (a short doc yields one whole-text gram)
def _gram_list(n: int) -> str:
    return (
        f"list_transform(generate_series(1, greatest(len(w) - {n - 1}, 1)),"
        f" i -> array_to_string(w[i:i+{n - 1}], ' '))"
    )


TEXT_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, {_gram_list(2)} AS g2, {_gram_list(3)} AS g3 FROM toks)
SELECT doc_id,
  CAST(len(g2) AS BIGINT) AS n_2grams,
  1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
    AS dup_2gram_frac,
  CAST(len(g3) AS BIGINT) AS n_3grams,
  1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
    AS dup_3gram_frac
FROM g
"""


def text_pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.text import pack_sequences

    return pack_sequences(
        read_table(spark, sf_dir, "documents"), context_len=2048
    )


TEXT_PACK_SQL = """
SELECT doc_id, n_tokens, start_offset,
       start_offset // 2048 AS bin_id,
       start_offset % 2048 AS offset_in_bin
FROM (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(len(string_split(text, ' ')))
                OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS start_offset
  FROM documents
)
"""


def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus with deterministically injected
    synthetic PII (the raw documents are clean word-soup): emails on
    doc_id%3, phones on doc_id%4, IPs on doc_id%5 — so the oracle can
    verify both the redacted text and the per-type audit counts."""
    from map_reduce_project_spark.operators.text import scrub_pii

    d = read_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" call 555-123-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
            F.lit(" logged"),
        ),
    ).otherwise(F.lit(""))
    corpus = d.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )
    return scrub_pii(corpus)


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\d{3}-\\d{3}-\\d{4}"
_PII_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

PII_SCRUB_SQL = f"""
WITH pii AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 7 % 256 AS VARCHAR) || ' logged' ELSE '' END
    AS text
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{_PII_EMAIL}', '<EMAIL>', 'g'),
    '{_PII_PHONE}', '<PHONE>', 'g'),
    '{_PII_IP}', '<IP>', 'g') AS redacted,
  CAST(LEN(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(LEN(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
  CAST(LEN(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips
FROM pii
"""


def unigram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.text import unigram_familiarity

    return unigram_familiarity(read_table(spark, sf_dir, "documents"))


UNIGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
freqs AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM tok GROUP BY token
)
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(f.freq) AS BIGINT) AS sum_freq,
  CAST(MIN(f.freq) AS BIGINT) AS min_freq,
  CAST(CAST(SUM(f.freq) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    AS mean_freq
FROM tok t JOIN freqs f ON f.token = t.token
GROUP BY t.doc_id
"""


QUERIES = [
    Query("text_pii_scrub", pii_scrub_q, PII_SCRUB_SQL, "PII redaction (emails/phones/IPs) with per-type audit counts; scan-speed regex projection"),
    Query("text_unigram_scores", unigram_q, UNIGRAM_SQL, "integer-exact unigram-LM familiarity scores (corpus-frequency quality filter)"),
    Query("text_pack_manifest", text_pack_q, TEXT_PACK_SQL, "GPT-style sequence-packing manifest via scalable two-pass prefix sum"),
    Query("text_repetition", text_repetition_q, TEXT_REPETITION_SQL, "Gopher-style duplicate n-gram fractions (repetition filter), shuffle-free"),
    Query("text_stats", text_stats_q, TEXT_STATS_SQL, "token/char statistics per document"),
    Query("text_bpe_tokens", bpe_tokens_q, BPE_TOKENS_SQL, "whitespace + BPE-ish regex token counts"),
    Query("text_language_id", language_id_q, LANGID_SQL, "stopword-density + script language heuristic"),
    Query("text_quality", quality_q, QUALITY_SQL, "C4/Gopher-style quality ratios + composite score"),
    Query("text_fingerprint", fingerprint_q, FINGERPRINT_SQL, "raw + bag-of-words md5 fingerprints"),
]


def rolling_fp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.scale import fan_out
    from map_reduce_project_spark.operators.text import rolling_fingerprint

    # round 12: the per-row work is O(tokens * windows) rolling-hash
    # expressions and the pruned scan is one split at gate scale —
    # fan out so it runs on every core, not one (19.9 s -> ~2 s)
    return rolling_fingerprint(fan_out(read_table(spark, sf_dir, "documents")))


_CODES = "list_transform(string_split(text, ' '), t -> ('0x' || substr(md5(t), 1, 6))::BIGINT)"
_FOLD = "list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}), (acc, c) -> (acc * 131 + c) % 2147483647)"

ROLLING_FP_SQL = f"""
SELECT doc_id,
  {_FOLD.format(arr=_CODES)} AS doc_fp,
  list_min(list_transform(
    generate_series(1, greatest(len({_CODES}) - 2, 1)),
    i -> {_FOLD.format(arr=f"({_CODES})[i:i+2]")})) AS win_fp
FROM documents
"""

def text_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking via generator EXPRESSIONS (JVM fast
    path): 64-token windows, stride 48."""
    return chunk_documents(read_table(spark, sf_dir, "documents"), 64, 48)


def text_chunks_udtf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunking through the Python UDTF path (LATERAL
    table-valued function, Spark 4 `@udtf`) — one oracle pins both
    implementations row-for-row. The UDTF is the API-surface/reference
    twin; production uses the expression plan of ``text_chunks``."""
    from map_reduce_project_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM _docs_for_udtf d, LATERAL chunk_document(d.text, 64, 48) c
        """
    )


CHUNKS_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
    unnest(generate_series(0, greatest((len(toks) - 64 + 47) // 48, 0)))
      AS chunk_idx
  FROM w
)
SELECT doc_id,
  CAST(chunk_idx AS BIGINT) AS chunk_idx,
  array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk,
  CAST(len(toks[chunk_idx*48+1 : chunk_idx*48+64]) AS BIGINT) AS n_tokens
FROM c
"""

QUERIES.append(
    Query(
        "text_chunks",
        text_chunks_q,
        CHUNKS_SQL,
        "64-token/stride-48 context-window chunking (generator expressions)",
    )
)

QUERIES.append(
    Query(
        "text_chunks_udtf",
        text_chunks_udtf_q,
        CHUNKS_SQL,
        "the same chunking through a Python UDTF (LATERAL TVF) — twin under one oracle",
    )
)

QUERIES.append(
    Query(
        "text_rolling_fingerprint",
        rolling_fp_q,
        ROLLING_FP_SQL,
        "Rabin-Karp rolling-hash doc fingerprint + winnowing-lite min-window hash",
    )
)


def text_vocab_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with contiguous frequency-ranked ids
    (operators/text.build_vocab): the two-pass zipWithIndex id
    assignment (parallel per-partition windows + tiny driver offset
    map) hash-matched against the oracle's global row_number — proving
    the scalable formulation computes exactly the single-reducer
    answer."""
    from map_reduce_project_spark.operators.text import build_vocab

    return build_vocab(
        read_table(spark, sf_dir, "documents"), min_count=2
    )


VOCAB_SQL = """
WITH c AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
n AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY token
  HAVING COUNT(*) >= 2
)
SELECT token, n,
  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
    AS token_id
FROM n
"""

QUERIES.append(
    Query(
        "text_vocab",
        text_vocab_q,
        VOCAB_SQL,
        "frequency-ranked vocabulary; scalable two-pass contiguous ids vs global row_number oracle",
    )
)

def bow_cosine_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse bag-of-words cosine pairs with in-plan DF pruning
    (operators/text.py:bow_cosine_pairs) — integer tf dot products,
    one IEEE double division, exact under the hash gate."""
    from map_reduce_project_spark.operators.text import bow_cosine_pairs

    return bow_cosine_pairs(read_table(spark, sf_dir, "documents"))


BOW_COSINE_SQL = """
WITH tok AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) GROUP BY doc_id, tok
), total AS (
  SELECT COUNT(*) AS n_docs FROM documents
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok
), kept AS (
  SELECT tok.doc_id, tok.tok, tok.tf
  FROM tok JOIN dfreq USING (tok) CROSS JOIN total
  WHERE dfreq.df <= total.n_docs * 0.2
), n2 AS (
  SELECT doc_id, SUM(tf * tf) AS n2 FROM kept GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, dot,
       CAST(dot AS DOUBLE)
         / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
         AS cosine
FROM dots
JOIN n2 na ON na.doc_id = id_a
JOIN n2 nb ON nb.doc_id = id_b
WHERE CAST(dot AS DOUBLE)
      / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) >= 0.5
"""

QUERIES.append(
    Query(
        "text_bow_cosine",
        bow_cosine_q,
        BOW_COSINE_SQL,
        "sparse bag-of-words cosine pairs, DF-pruned posting-list join",
    )
)



def text_quality_classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality-classifier inference over every document
    (operators.text.hashed_linear_score): the fastText-shaped scoring
    pass of a pretraining curation pipeline, exact int64 under the
    hash gate."""
    from map_reduce_project_spark.operators.text import hashed_linear_score

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_score(docs)


TEXT_QC_SQL = """
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS th FROM documents
),
wtok AS (
  SELECT doc_id,
         (('0x' || substr(th, 1, 2))::BIGINT * 2654435761) % 1000 - 500 AS w
  FROM tok
)
SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score,
       SUM(w) > 0 AS quality_label
FROM wtok GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "text_quality_classifier",
        text_quality_classifier_q,
        TEXT_QC_SQL,
        "fastText-style hashed linear classifier inference, pinned int weights",
    )
)


def text_bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM familiarity score (the KenLM-proxy quality filter):
    train add-one-smoothed bigram probabilities on the corpus itself,
    then score each document by its mean log-probability — low scorers
    are gibberish/boilerplate relative to the corpus distribution.

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V); score = mean ln p,
    rounded to 4 decimals (same ln-noise bound as the BM25 oracle —
    all counts are exact integers, only the final expression is
    float). Corpus statistics are in-plan aggregates joined back by
    bigram key; nothing is collected to the driver.
    """
    from map_reduce_project_spark.operators.dedup import shingles_expr

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = docs.select(
        "doc_id", F.explode_outer(shingles_expr(2, "text")).alias("bg")
    ).withColumn("w1", F.split("bg", " ")[0])
    c2 = big.groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    p = (F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")).cast("double")
    return (
        big.join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.log(p)) / F.count("*"), 4).alias("mean_logprob"),
        )
    )


TEXT_BIGRAM_LM_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 1, 1)),
           i -> array_to_string(w[i:i+1], ' '))) AS bg
  FROM toks
),
bw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM big),
c2 AS (SELECT bg, COUNT(*) AS c2 FROM bw GROUP BY bg),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bw GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
  ROUND(SUM(ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE))) / COUNT(*), 4)
    AS mean_logprob
FROM bw
JOIN c2 USING (bg)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "text_bigram_lm",
        text_bigram_lm_q,
        TEXT_BIGRAM_LM_SQL,
        "add-one-smoothed bigram LM mean log-prob per doc (KenLM-proxy quality filter)",
    )
)


def text_keywords_tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF (smooth
    idf = ln(1 + N/df), score rounded to 4 decimals per the BM25
    ln-noise precedent, rank ties broken by token). Corpus statistics
    (N, per-term df) are in-plan aggregates — no vocabulary collected
    to the driver; the per-doc rank window partitions on doc_id.
    """
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n")).select("n")
    scored = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    1.0 + F.col("n").cast("double") / F.col("df").cast("double")
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select(
            "doc_id",
            "rank",
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )


TEXT_KEYWORDS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
nd AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
         ROUND(tf.tf * ln(1.0 + CAST(nd.n AS DOUBLE) / CAST(dft.df AS DOUBLE)), 4)
           AS score
  FROM tf JOIN dft USING (token) CROSS JOIN nd
)
SELECT doc_id, rank, token, CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df, score
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         ORDER BY score DESC, token) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= 3
"""

QUERIES.append(
    Query(
        "text_keywords_tfidf",
        text_keywords_tfidf_q,
        TEXT_KEYWORDS_SQL,
        "per-doc top-3 TF-IDF keyword extraction, in-plan corpus stats",
    )
)


def text_lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID EVALUATION: confusion matrix of the heuristic
    predictor against the corpus's labeled `lang` column, with
    per-cell precision against the predicted-class total — the
    accept/tune measurement run before trusting a cheap classifier to
    route a 100 TB corpus. Two aggregates, one broadcast join; the
    matrix is |langs|² regardless of corpus size."""
    from map_reduce_project_spark.operators.text import language_id

    docs = read_table(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "pred_lang")
    cells = (
        docs.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred, "doc_id")
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    totals = cells.groupBy("pred_lang").agg(F.sum("n").alias("n_pred"))
    return cells.join(F.broadcast(totals), "pred_lang").select(
        "actual_lang",
        "pred_lang",
        F.col("n").cast("long").alias("n"),
        (F.col("n").cast("double") / F.col("n_pred").cast("double")).alias(
            "cell_precision"
        ),
    )


TEXT_LANG_CONFUSION_SQL = f"""
WITH scored AS (
  SELECT doc_id,
    CAST(LEN(list_filter(string_split(text, ' '), t -> t IN ({_STOP_LIST}))) AS DOUBLE)
      / CAST(LEN(string_split(text, ' ')) AS DOUBLE) AS en_score,
    LENGTH(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0 AS has_cjk
  FROM documents
),
pred AS (
  SELECT doc_id,
    CASE WHEN has_cjk THEN 'cjk'
         WHEN en_score >= 0.05 THEN 'en'
         ELSE 'other' END AS pred_lang
  FROM scored
),
cells AS (
  SELECT d.lang AS actual_lang, p.pred_lang, COUNT(*) AS n
  FROM documents d JOIN pred p ON p.doc_id = d.doc_id
  GROUP BY d.lang, p.pred_lang
),
totals AS (SELECT pred_lang, SUM(n) AS n_pred FROM cells GROUP BY pred_lang)
SELECT c.actual_lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
  CAST(c.n AS DOUBLE) / CAST(t.n_pred AS DOUBLE) AS cell_precision
FROM cells c JOIN totals t ON t.pred_lang = c.pred_lang
"""

QUERIES.append(
    Query(
        "text_lang_confusion",
        text_lang_confusion_q,
        TEXT_LANG_CONFUSION_SQL,
        "language-ID confusion matrix vs labeled lang column, with per-cell precision",
    )
)


def text_hapax_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness quality signal: per document, the fraction
    of tokens that occur exactly once in it (hapax legomena) and the
    type-token ratio — low hapax = template/boilerplate, near-1 =
    word-salad; both filters in corpus curation. Two nested exact
    aggregates per doc, shuffle key = doc id.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    per_tok = tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("n_hapax"),
        (
            F.count(F.when(F.col("c") == 1, 1)).cast("double")
            / F.sum("c").cast("double")
        ).alias("hapax_ratio"),
        (F.count("*").cast("double") / F.sum("c").cast("double")).alias(
            "type_token_ratio"
        ),
    )


TEXT_HAPAX_SQL = """
WITH per_tok AS (
  SELECT doc_id, t, COUNT(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
  ) GROUP BY doc_id, t
)
SELECT doc_id,
  CAST(SUM(c) AS BIGINT) AS n_tokens,
  COUNT(*) AS n_types,
  CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_hapax,
  CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
    AS hapax_ratio,
  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS type_token_ratio
FROM per_tok
GROUP BY doc_id
"""

QUERIES.append(
    Query(
        "text_hapax_ratio",
        text_hapax_ratio_q,
        TEXT_HAPAX_SQL,
        "hapax-legomena and type-token vocabulary-richness ratios per document",
    )
)


def text_zipf_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf profile: the top-20 tokens with rank, frequency,
    and the rank x frequency product (constant under Zipf's law — the
    one-glance sanity check that a corpus is natural language and not
    generator output). Exact integers; one token agg + one top-k.
    """
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("text")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("f"))
    )
    w = Window.orderBy(F.col("f").desc(), "t")
    return (
        freq.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 20)
        .select(
            "rank",
            "t",
            F.col("f").cast("long").alias("freq"),
            (F.col("rank") * F.col("f")).cast("long").alias("rank_x_freq"),
        )
    )


TEXT_ZIPF_SQL = """
WITH freq AS (
  SELECT t, COUNT(*) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents
  ) GROUP BY t
)
SELECT rank, t, CAST(f AS BIGINT) AS freq,
       CAST(rank * f AS BIGINT) AS rank_x_freq
FROM (
  SELECT t, f,
         CAST(ROW_NUMBER() OVER (ORDER BY f DESC, t) AS BIGINT) AS rank
  FROM freq
) WHERE rank <= 20
"""

QUERIES.append(
    Query(
        "text_zipf_profile",
        text_zipf_profile_q,
        TEXT_ZIPF_SQL,
        "top-20 Zipf profile: rank x frequency constancy as the natural-language sanity check",
    )
)


def text_regexp_suite_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regexp function surface beyond replace: per document,
    pattern match counts (regexp_count), the first extracted group
    (regexp_extract), and a boolean match flag — the triage pass
    before a scrub/extract pipeline commits to a pattern.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ip_pat = r"\d+\.\d+\.\d+\.\d+"
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{ip_pat}')").cast("long").alias("n_ips"),
        F.regexp_extract("text", f"({ip_pat})", 1).alias("first_ip"),
        F.col("text").rlike(ip_pat).alias("has_ip"),
        F.expr("regexp_count(text, 'data')").cast("long").alias("n_data_word"),
    )


TEXT_REGEXP_SQL = r"""
SELECT doc_id,
  CAST(LEN(regexp_extract_all(text, '\d+\.\d+\.\d+\.\d+')) AS BIGINT) AS n_ips,
  regexp_extract(text, '(\d+\.\d+\.\d+\.\d+)', 1) AS first_ip,
  regexp_matches(text, '\d+\.\d+\.\d+\.\d+') AS has_ip,
  CAST(LEN(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data_word
FROM documents
"""

QUERIES.append(
    Query(
        "text_regexp_suite",
        text_regexp_suite_q,
        TEXT_REGEXP_SQL,
        "regexp_count / regexp_extract / rlike surface over documents",
    )
)


def text_gopher_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher document-quality rules per doc
    (operators/text.gopher_rules): five per-rule verdicts + the
    conjunction, every threshold an exact integer comparison so the
    gate hashes verdicts, not float ratios."""
    from map_reduce_project_spark.operators.text import gopher_rules

    return gopher_rules(read_table(spark, sf_dir, "documents"))


TEXT_GOPHER_SQL = """
WITH m AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(length(text) - len(string_split(text, ' ')) + 1 AS BIGINT)
      AS total_word_len,
    CAST(len(string_split(text, '#')) - 1
       + len(string_split(text, '...')) - 1 AS BIGINT) AS n_symbols,
    CAST(len(list_filter(string_split(text, ' '),
                         w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
      AS alpha_words,
    CAST((CASE WHEN contains(' ' || text || ' ', ' the ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' be ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' to ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' of ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' and ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' that ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' have ') THEN 1 ELSE 0 END)
       + (CASE WHEN contains(' ' || text || ' ', ' with ') THEN 1 ELSE 0 END)
      AS BIGINT) AS must_have_stopwords
  FROM documents
)
SELECT doc_id, n_words, total_word_len, n_symbols, alpha_words,
  must_have_stopwords,
  (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
  (3 * n_words <= total_word_len AND total_word_len <= 10 * n_words)
    AS pass_mean_word_len,
  (10 * n_symbols <= n_words) AS pass_symbol_ratio,
  (5 * alpha_words >= 4 * n_words) AS pass_alpha_words,
  (must_have_stopwords >= 2) AS pass_stopwords,
  ((n_words >= 50 AND n_words <= 100000)
   AND (3 * n_words <= total_word_len AND total_word_len <= 10 * n_words)
   AND (10 * n_symbols <= n_words)
   AND (5 * alpha_words >= 4 * n_words)
   AND (must_have_stopwords >= 2)) AS gopher_pass
FROM m
"""

QUERIES.append(
    Query(
        "text_gopher_rules",
        text_gopher_rules_q,
        TEXT_GOPHER_SQL,
        "published Gopher quality rules, exact integer thresholds per rule",
    )
)


def text_bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training under the exact gate
    (operators/text.bpe_train): 3 merge rounds over the corpus, each
    round = one pair-count shuffle + a 1-row argmax broadcast +
    greedy-leftmost application via gaps-and-islands windows. The
    DuckDB oracle replays the identical rounds (unrolled CTEs — the
    emb_kmeans_int pattern for training loops), so pair counts,
    tie-breaks, AND the greedy overlap rule are all hash-pinned."""
    from map_reduce_project_spark.operators.text import bpe_train

    return bpe_train(
        read_table(spark, sf_dir, "documents"), n_merges=3
    )


def _bpe_round_sql(r: int) -> str:
    """CTE block for BPE round r: pair counts, argmax, greedy-leftmost
    match set, and the spliced next-round token table."""
    return f"""
p{r} AS (
  SELECT doc_id, pos, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM t{r}
),
b{r} AS (
  SELECT tok AS lhs, nxt AS rhs, CAST(COUNT(*) AS BIGINT) AS c
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2
  ORDER BY c DESC, lhs, rhs LIMIT 1
),
m{r} AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY pos) AS rn
    FROM (
      SELECT p.doc_id, p.pos,
             p.pos - ROW_NUMBER()
               OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS grp
      FROM p{r} p, b{r} b
      WHERE p.tok = b.lhs AND p.nxt = b.rhs
    )
  ) WHERE rn % 2 = 1
),
t{r + 1} AS (
  SELECT tt.doc_id,
         ROW_NUMBER() OVER (PARTITION BY tt.doc_id ORDER BY tt.pos) - 1
           AS pos,
         CASE WHEN mm.mk IS NOT NULL
              THEN tt.tok || (SELECT rhs FROM b{r})
              ELSE tt.tok END AS tok
  FROM t{r} tt
  LEFT JOIN (SELECT doc_id, pos, 1 AS mk FROM m{r}) mm
    ON mm.doc_id = tt.doc_id AND mm.pos = tt.pos
  LEFT JOIN (SELECT doc_id, pos + 1 AS pos, 1 AS dr FROM m{r}) dd
    ON dd.doc_id = tt.doc_id AND dd.pos = tt.pos
  WHERE dd.dr IS NULL
)"""


TEXT_BPE_SQL = (
    """
WITH t1 AS (
  SELECT doc_id, g.pos - 1 AS pos, g.tok
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1)
                         AS pos) g
),"""
    + ",".join(_bpe_round_sql(r) for r in (1, 2, 3))
    + """
SELECT 1 AS merge_rank, lhs, rhs, lhs || rhs AS merged, c AS pair_count
FROM b1
UNION ALL
SELECT 2, lhs, rhs, lhs || rhs, c FROM b2
UNION ALL
SELECT 3, lhs, rhs, lhs || rhs, c FROM b3
"""
)

QUERIES.append(
    Query(
        "text_bpe_merges",
        text_bpe_merges_q,
        TEXT_BPE_SQL,
        "distributed BPE tokenizer training (3 rounds) vs unrolled-CTE oracle",
    )
)


def text_bpe_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE lifecycle under one gate: learn 3 merges
    (bpe_train), then encode the corpus with the learned list
    (bpe_apply — broadcast merges, same greedy splice) and report
    per-doc token counts before/after. The oracle replays training
    AND application in one unrolled-CTE chain, so the whole
    tokenizer round trip is hash-pinned."""
    from map_reduce_project_spark.operators.scale import fan_out
    from map_reduce_project_spark.operators.text import bpe_apply, bpe_train

    # round 12: single-split scan serializes both the training passes
    # and the greedy splice apply onto one core — fan out first
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    learned = bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    return bpe_apply(docs, [(r["lhs"], r["rhs"]) for r in learned])


TEXT_BPE_ENCODE_SQL = (
    """
WITH t1 AS (
  SELECT doc_id, g.pos - 1 AS pos, g.tok
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1)
                         AS pos) g
),"""
    + ",".join(_bpe_round_sql(r) for r in (1, 2, 3))
    + """
SELECT b.doc_id, b.n AS n_tokens_before, a.n AS n_tokens_after
FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM t1 GROUP BY 1) b
JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM t4 GROUP BY 1) a
  USING (doc_id)
"""
)

QUERIES.append(
    Query(
        "text_bpe_encode",
        text_bpe_encode_q,
        TEXT_BPE_ENCODE_SQL,
        "BPE train->encode round trip: per-doc token counts before/after 3 merges",
    )
)


def text_domain_shift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift report between two halves of the corpus (even vs
    odd doc ids — stands in for train-vs-incoming batches): per term,
    exact occurrence counts in each half and the absolute rate
    difference, top-30 largest shifts (deterministic tiebreak). The
    distribution-shift smoke test run before retraining on new data.
    Counts are exact integers; each rate is a single IEEE division,
    and the ranking key |rate_a - rate_b| is the same double
    expression on both engines."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2 == 0).alias("half_a"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    )
    tot = toks.groupBy("half_a").agg(F.count("*").alias("n"))
    counts = toks.groupBy("term", "half_a").agg(
        F.count("*").cast("long").alias("c")
    )
    wide = counts.groupBy("term").agg(
        F.sum(F.when(F.col("half_a"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(~F.col("half_a"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    # ONE collect of the tiny 2-row totals table (re-aggregating the
    # token table per scalar would scan it twice more). An empty half
    # has every per-term count 0, so dividing by 1 keeps its rate an
    # exact 0.0 instead of crashing on float(None).
    totals = {r["half_a"]: r["n"] for r in tot.collect()}
    tot_a = totals.get(True) or 1
    tot_b = totals.get(False) or 1
    shift = F.abs(
        F.col("n_a").cast("double") / F.lit(float(tot_a))
        - F.col("n_b").cast("double") / F.lit(float(tot_b))
    )
    return (
        wide.select(
            "term",
            "n_a",
            "n_b",
            shift.alias("rate_shift"),
        )
        .orderBy(F.col("rate_shift").desc(), "term")
        .limit(30)
    )


TEXT_SHIFT_SQL = """
WITH toks AS (
  SELECT doc_id % 2 = 0 AS half_a, UNNEST(string_split(text, ' ')) AS term
  FROM documents
),
tot AS (
  SELECT
    CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
    CAST(SUM(CASE WHEN half_a THEN 0 ELSE 1 END) AS BIGINT) AS tot_b
  FROM toks
),
wide AS (
  SELECT term,
    CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN half_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM toks GROUP BY term
)
SELECT term, n_a, n_b,
  ABS(CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE)
    - CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE)) AS rate_shift
FROM wide CROSS JOIN tot
ORDER BY rate_shift DESC, term
LIMIT 30
"""

QUERIES.append(
    Query(
        "text_domain_shift",
        text_domain_shift_q,
        TEXT_SHIFT_SQL,
        "corpus drift: top term-rate shifts between two halves, exact counts",
    )
)


def text_cooccurrence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GloVe-style weighted co-occurrence counts: for every ordered
    token pair within a window of 3, accumulate weight 1/distance —
    kept EXACT by the x6 scaling (6/1, 6/2, 6/3 = 6, 3, 2, all
    integers; the same exact-rational trick as the attribution
    credits and harmonic centrality). The co-occurrence matrix is THE
    data-prep stage of count-based embedding training, and the skew
    reality is real: frequent-pair cells dominate, which is exactly
    what the partial+final count aggregate absorbs map-side. Top-50
    cells with deterministic tiebreak keep the gate result small."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    pairs = None
    for dist in (1, 2, 3):
        right = toks.select(
            "doc_id",
            (F.col("pos") - dist).alias("pos"),
            F.col("term").alias("ctx"),
        )
        p = toks.join(right, ["doc_id", "pos"]).select(
            "term", "ctx", F.lit(6 // dist).cast("long").alias("w6")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.groupBy("term", "ctx")
        .agg(F.sum("w6").cast("long").alias("weight_x6"))
        .orderBy(F.col("weight_x6").desc(), "term", "ctx")
        .limit(50)
    )


TEXT_COOC_SQL = """
WITH toks AS (
  SELECT doc_id, pos - 1 AS pos, term
  FROM (
    SELECT doc_id,
           UNNEST(string_split(text, ' ')) AS term,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  )
),
pairs AS (
  SELECT a.term, b.term AS ctx, CAST(6 / d.d AS BIGINT) AS w6
  FROM toks a
  JOIN (VALUES (1), (2), (3)) d(d) ON TRUE
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + d.d
)
SELECT term, ctx, CAST(SUM(w6) AS BIGINT) AS weight_x6
FROM pairs GROUP BY 1, 2
ORDER BY weight_x6 DESC, term, ctx
LIMIT 50
"""

QUERIES.append(
    Query(
        "text_cooccurrence",
        text_cooccurrence_q,
        TEXT_COOC_SQL,
        "GloVe-prep windowed co-occurrence, 1/distance weights exact via x6",
    )
)


def text_span_corruption_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption mask prep: each token position is
    marked for masking by a deterministic md5 draw (p = 2/10), and
    CONSECUTIVE masked positions collapse into spans via the
    gaps-and-islands pos - row_number trick — the denoising-objective
    data stage (each span becomes one sentinel in training). Salted
    content-hash draws make the mask reproducible across engines,
    retries, and partitionings (rand() would re-roll per retry);
    output (doc_id, span_start, span_len, n_spans_in_doc) per span,
    capped to the first 200 docs to keep the gate result small."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    masked = toks.where(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("span|"),
                        F.col("doc_id").cast("string"),
                        F.lit("|"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
        < 2
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = masked.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        F.count("*").cast("long").alias("span_len"),
    )
    wd = Window.partitionBy("doc_id")
    return spans.select(
        "doc_id",
        "span_start",
        "span_len",
        F.count("*").over(wd).cast("long").alias("n_spans_in_doc"),
    )


TEXT_SPAN_SQL = """
WITH toks AS (
  SELECT doc_id, pos - 1 AS pos
  FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents WHERE doc_id < 200
  )
),
masked AS (
  SELECT doc_id, pos
  FROM toks
  WHERE ('0x' || substr(md5('span|' || doc_id || '|' || pos), 1, 8))::BIGINT
        % 10 < 2
),
islands AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM masked
),
spans AS (
  SELECT doc_id, island,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(COUNT(*) AS BIGINT) AS span_len
  FROM islands GROUP BY 1, 2
)
SELECT doc_id, span_start, span_len,
       CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_spans_in_doc
FROM spans
"""

QUERIES.append(
    Query(
        "text_span_corruption",
        text_span_corruption_q,
        TEXT_SPAN_SQL,
        "T5 span-corruption masks: hash draws -> gaps-and-islands spans",
    )
)


def text_burstiness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness: the variance-to-mean ratio of per-document
    counts (zeros included — a bursty term concentrates in few docs,
    VMR > 1; a uniform function word sits near 1). The moments are
    exact integers and the ratio is assembled as ONE division of
    integer-valued doubles with pinned association:
    vmr = (N*sum_sq - sum^2) / ((N-1) * sum) — both operands exact in
    double at gate scale, so the hash is stable cross-engine."""
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    counts = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    stats = counts.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("total_sq"),
    )
    num = (
        F.lit(n_docs) * F.col("total_sq") - F.col("total") * F.col("total")
    ).cast("double")
    den = (F.lit(n_docs - 1) * F.col("total")).cast("double")
    return stats.select(
        "term", "df", "total", (num / den).alias("vmr")
    )


TEXT_BURSTINESS_SQL = """
WITH counts AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY 1, 2
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT term,
  CAST(COUNT(*) AS BIGINT) AS df,
  CAST(SUM(c) AS BIGINT) AS total,
  CAST((SELECT n_docs FROM n) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
    / CAST(((SELECT n_docs FROM n) - 1) * SUM(c) AS DOUBLE) AS vmr
FROM counts
GROUP BY term
"""

QUERIES.append(
    Query(
        "text_burstiness",
        text_burstiness_q,
        TEXT_BURSTINESS_SQL,
        "term burstiness (VMR with zeros) from exact integer moments",
    )
)


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build — the IR/RAG retrieval prep stage: term ->
    document frequency + the full postings list, with postings
    rendered as a comma-joined string of NUMERICALLY sorted doc_ids
    (array cells can't cross the gate canon; the string is exact and
    order-pinned). One explode + two aggregates: distinct (term,
    doc) pairs via a partial+final dedup agg, then per-term
    collect + sort_array (numeric sort BEFORE stringification — a
    lexicographic sort would scramble doc 10 before doc 2). At 100 TB
    the per-term postings string is the scale limit — a production
    index shards postings by (term, bucket); df and the grouped
    shuffle shape are unchanged by that split."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.col("text"), " +")).alias("term"),
    ).where(F.col("term") != "")
    per_doc = terms.dropDuplicates(["term", "doc_id"])
    return (
        per_doc.groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
    )


TEXT_INVERTED_INDEX_SQL = """
WITH pairs AS (
  SELECT DISTINCT t.term, d.doc_id
  FROM documents d, UNNEST(string_split_regex(d.text, ' +')) AS t(term)
  WHERE t.term <> ''
)
SELECT term,
  CAST(COUNT(*) AS BIGINT) AS df,
  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs
GROUP BY term
"""

QUERIES.append(
    Query(
        "text_inverted_index",
        text_inverted_index,
        TEXT_INVERTED_INDEX_SQL,
        "inverted index: term -> df + numerically-sorted postings string",
    )
)


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword extraction: the top-5 BM25-scored terms per
    document (k1=1.2, b=0.75) — the classic retrieval ranking
    function, and the keyword-extraction prep stage of a RAG corpus.
    Every BM25 input (tf, df, dl, N, sum_dl) is an exact int64; the
    score is ONE fixed float expression over them (two divisions +
    ln), rounded to 4 decimals like every log-based score in this
    module so the engines' 1-ulp ln latitude cannot reach the hash.
    Plan: one explode + three partial+final aggs (tf, dl, df) + a
    broadcast of the two corpus scalars + one per-doc top-k window —
    at 100 TB the only big shuffles key on (doc, term) and term."""
    from pyspark.sql.window import Window

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " +")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    corpus = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(df_t, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "bm25",
            F.round(
                F.log(
                    1.0
                    + (
                        F.col("n_docs") - F.col("df") + F.lit(0.5)
                    ).cast("double")
                    / (F.col("df") + F.lit(0.5)).cast("double")
                )
                * (F.col("tf") * F.lit(2.2)).cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75)
                        * (F.col("dl") * F.col("n_docs")).cast("double")
                        / F.col("sum_dl").cast("double")
                    )
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("bm25").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("doc_id", "rank", "term", "tf", "df", "dl", "bm25")
    )


TEXT_BM25_SQL = """
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents d, UNNEST(string_split_regex(d.text, ' +')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
       FROM toks GROUP BY doc_id),
df_t AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df_t.df, dl.dl,
    ROUND(
      LN(1.0 + CAST(n_docs - df + 0.5 AS DOUBLE) / CAST(df + 0.5 AS DOUBLE))
      * CAST(tf.tf * 2.2 AS DOUBLE)
      / (CAST(tf.tf AS DOUBLE)
         + 1.2 * (0.25 + 0.75 * CAST(dl.dl * n_docs AS DOUBLE)
                                / CAST(sum_dl AS DOUBLE))),
      4) AS bm25
  FROM tf JOIN dl USING (doc_id) JOIN df_t USING (term) CROSS JOIN corpus
)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY bm25 DESC, term) AS BIGINT) AS rank,
  term, tf, df, dl, bm25
FROM scored
QUALIFY rank <= 5
"""

QUERIES.append(
    Query(
        "text_bm25_topk",
        text_bm25_topk,
        TEXT_BM25_SQL,
        "BM25 top-5 keywords per doc: exact int inputs, one rounded float expression",
    )
)


def text_self_bleu_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU-2 between consecutive same-corpus documents (round
    7) — the standard diversity probe for a training corpus: high
    self-BLEU between neighbors means the corpus repeats itself.
    Pair (hypothesis, reference) = (doc 2k, doc 2k+1); for n = 1, 2
    the clipped n-gram precision p_n =
    sum_g min(cnt_hyp(g), cnt_ref(g)) / n_hyp_grams, brevity penalty
    exp(1 - len_r/len_h) when the hypothesis is shorter, and
    BLEU = BP * sqrt(p1 * p2). All counts are exact int64; the score
    is one float expression over them rounded to 4 decimals (the
    module's log/exp-latitude discipline). Plan: one explode into
    (doc, gram, n) counts — bigrams from one self-zip of the token
    array, no joins to build them — then ONE join per order between
    hyp and ref count tables keyed on (pair, n, gram), partial+final
    aggs throughout."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split("text", " +"), lambda t: t != F.lit("")
        ).alias("ts"),
    )
    # bigrams via an index sequence, NOT zip_with-against-slice:
    # zip_with pads the shorter side with null and concat_ws skips
    # nulls, so the padded tail would fabricate a unigram-shaped
    # "bigram" of the last token (caught by the gate on first run)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.expr(
                    "transform(ts, t -> "
                    "named_struct('n', 1, 'g', t))"
                ),
                F.expr(
                    "CASE WHEN size(ts) < 2 THEN "
                    "CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>) "
                    "ELSE transform(sequence(1, size(ts) - 1), i -> "
                    "named_struct('n', 2, 'g', concat_ws(' ', "
                    "element_at(ts, i), element_at(ts, i + 1)))) END"
                ),
            )
        ).alias("ng"),
    ).select("doc_id", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))
    cnt = grams.groupBy("doc_id", "n", "g").agg(
        F.count("*").alias("c")
    )
    hyp = cnt.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("pair"),
        "n",
        "g",
        F.col("c").alias("ch"),
    )
    ref = cnt.where(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") - 1) / 2).cast("long").alias("pair"),
        "n",
        "g",
        F.col("c").alias("cr"),
    )
    clipped = (
        hyp.join(ref, ["pair", "n", "g"])
        .groupBy("pair", "n")
        .agg(F.sum(F.least("ch", "cr")).alias("clip"))
    )
    totals = hyp.groupBy("pair", "n").agg(F.sum("ch").alias("tot"))
    pn = (
        totals.join(clipped, ["pair", "n"], "left")
        .na.fill({"clip": 0})
        .groupBy("pair")
        .agg(
            F.sum(F.when(F.col("n") == 1, F.col("clip"))).alias("c1"),
            F.sum(F.when(F.col("n") == 1, F.col("tot"))).alias("t1"),
            F.sum(F.when(F.col("n") == 2, F.col("clip"))).alias("c2"),
            F.sum(F.when(F.col("n") == 2, F.col("tot"))).alias("t2"),
        )
    )
    bp = F.when(
        F.col("t1") >= F.col("rt1"), F.lit(1.0)
    ).otherwise(
        F.exp(
            F.lit(1.0)
            - F.col("rt1").cast("double") / F.col("t1").cast("double")
        )
    )
    rtot = (
        ref.groupBy("pair", "n")
        .agg(F.sum("cr").alias("rtot"))
        .where(F.col("n") == 1)
        .select("pair", F.col("rtot").alias("rt1"))
    )
    return (
        pn.join(rtot, "pair")
        .select(
            "pair",
            F.col("t1").cast("long").alias("hyp_len"),
            F.col("rt1").cast("long").alias("ref_len"),
            F.col("c1").cast("long").alias("clip1"),
            F.col("c2").cast("long").alias("clip2"),
            F.round(
                F.when(
                    (F.col("c1") > 0) & (F.col("c2") > 0),
                    bp
                    * F.sqrt(
                        (
                            F.col("c1").cast("double")
                            / F.col("t1").cast("double")
                        )
                        * (
                            F.col("c2").cast("double")
                            / F.col("t2").cast("double")
                        )
                    ),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("self_bleu2"),
        )
    )


TEXT_SELF_BLEU_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, ' +'), t -> t <> '') AS ts
  FROM documents
),
uni AS (
  SELECT doc_id, 1 AS n, unnest(ts) AS g FROM toks
),
bi AS (
  SELECT doc_id, 2 AS n,
    ts[i] || ' ' || ts[i + 1] AS g
  FROM toks, UNNEST(range(1, len(ts))) AS r(i)
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
cnt AS (
  SELECT doc_id, n, g, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3
),
hyp AS (
  SELECT doc_id // 2 AS pair, n, g, c AS ch FROM cnt WHERE doc_id % 2 = 0
),
ref AS (
  SELECT (doc_id - 1) // 2 AS pair, n, g, c AS cr FROM cnt
  WHERE doc_id % 2 = 1
),
clipped AS (
  SELECT h.pair, h.n, SUM(LEAST(h.ch, r.cr)) AS clip
  FROM hyp h JOIN ref r ON h.pair = r.pair AND h.n = r.n AND h.g = r.g
  GROUP BY 1, 2
),
totals AS (SELECT pair, n, SUM(ch) AS tot FROM hyp GROUP BY 1, 2),
pn AS (
  SELECT t.pair,
    SUM(CASE WHEN t.n = 1 THEN COALESCE(c.clip, 0) END) AS c1,
    SUM(CASE WHEN t.n = 1 THEN t.tot END) AS t1,
    SUM(CASE WHEN t.n = 2 THEN COALESCE(c.clip, 0) END) AS c2,
    SUM(CASE WHEN t.n = 2 THEN t.tot END) AS t2
  FROM totals t LEFT JOIN clipped c ON c.pair = t.pair AND c.n = t.n
  GROUP BY t.pair
),
rt AS (
  SELECT pair, SUM(cr) AS rt1 FROM ref WHERE n = 1 GROUP BY pair
)
SELECT CAST(p.pair AS BIGINT) AS pair,
  CAST(p.t1 AS BIGINT) AS hyp_len,
  CAST(r.rt1 AS BIGINT) AS ref_len,
  CAST(p.c1 AS BIGINT) AS clip1,
  CAST(p.c2 AS BIGINT) AS clip2,
  ROUND(CASE WHEN p.c1 > 0 AND p.c2 > 0 THEN
    (CASE WHEN p.t1 >= r.rt1 THEN 1.0
          ELSE EXP(1.0 - CAST(r.rt1 AS DOUBLE) / CAST(p.t1 AS DOUBLE))
     END)
    * SQRT((CAST(p.c1 AS DOUBLE) / CAST(p.t1 AS DOUBLE))
           * (CAST(p.c2 AS DOUBLE) / CAST(p.t2 AS DOUBLE)))
    ELSE 0.0 END, 4) AS self_bleu2
FROM pn p JOIN rt r ON r.pair = p.pair
"""

QUERIES.append(
    Query(
        "text_self_bleu",
        text_self_bleu_q,
        TEXT_SELF_BLEU_SQL,
        "self-BLEU-2 corpus-diversity probe: clipped n-gram precisions + brevity penalty, exact counts",
    )
)


def text_html_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML/boilerplate extraction (round 8) — crawl-pipeline stage
    zero, the trafilatura/jusText family re-expressed as pure codegen
    expressions (operators.text.html_extract): script/style/comment
    removal, block segmentation at closing block tags, per-block
    entity decode + whitespace normalization, link-density
    boilerplate pruning (integer cross-multiplication), short-block
    pruning, in-order reassembly. The HTML is synthesized from doc_id
    across five orthogonal axes (nav bar, content paragraph,
    every-third-doc second passage vs a too-short stub, a mixed
    "Read more" block right at the density seam, an entity-heavy list
    item), so the oracle predicts the extracted text and per-rule
    drop counts exactly. Zero shuffles, zero explodes — the whole
    plan is one codegen projection over the scan."""
    from map_reduce_project_spark.operators.text import html_extract

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    html = F.concat(
        F.lit(
            '<html><head><style>p {color: red}</style>'
            '<script type="text/javascript">var x = 1; '
            'alert("noise");</script></head><body>'
        ),
        F.lit("<!-- hidden boilerplate "),
        (d % 1000).cast("string"),
        F.lit(" --><h1>Document number "),
        (d % 1000).cast("string"),
        F.lit(
            '</h1><div class="nav"><a href="/home">Home page</a> '
            '<a href="/about">About us</a></div>'
            "<p>Alpha beta gamma delta content <b>sentence</b> "
        ),
        (d % 1000).cast("string"),
        F.lit(" &amp; more.</p>"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<p>Second passage epsilon zeta eta theta "),
                (d % 7).cast("string"),
                F.lit(".</p>"),
            ),
        ).otherwise(
            F.concat(F.lit("<p>ok "), (d % 7).cast("string"), F.lit("</p>"))
        ),
        F.lit('<div>Read more: <a href="/p/'),
        (d % 100).cast("string"),
        F.lit(
            '">continue reading the full article</a></div>'
            "<li>&lt;tagged&gt; text with &quot;quotes&quot; and "
            "&#39;marks&#39; plus "
        ),
        (d % 5).cast("string"),
        F.lit("</li></body></html>"),
    )
    return html_extract(docs.withColumn("html", html))


_HTML_NORM_DUCK = """trim(regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace({0}, '<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
      '\\s+', ' ', 'g'))"""

# DuckDB twins of operators/text._HTML_BLOCK_SPLIT / _HTML_ANCHOR_RE,
# shared with queries/capstone.py — ONE definition per regex so an
# extraction-semantics change cannot leave a stale copy behind (the
# round-8 anchor-regex fix had to touch two sites; three would be
# worse)
_HTML_BLOCK_SPLIT_DUCK = "(?i)</(?:p|div|li|h[1-6]|td|tr|section|article)>"
_HTML_ANCHOR_DUCK = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"

TEXT_HTML_EXTRACT_SQL = f"""
WITH h AS (
  SELECT doc_id,
    '<html><head><style>p {{color: red}}</style>'
    || '<script type="text/javascript">var x = 1; alert("noise");</script></head><body>'
    || '<!-- hidden boilerplate ' || CAST(doc_id % 1000 AS VARCHAR)
    || ' --><h1>Document number ' || CAST(doc_id % 1000 AS VARCHAR)
    || '</h1><div class="nav"><a href="/home">Home page</a> <a href="/about">About us</a></div>'
    || '<p>Alpha beta gamma delta content <b>sentence</b> '
    || CAST(doc_id % 1000 AS VARCHAR) || ' &amp; more.</p>'
    || (CASE WHEN doc_id % 3 = 0
        THEN '<p>Second passage epsilon zeta eta theta '
             || CAST(doc_id % 7 AS VARCHAR) || '.</p>'
        ELSE '<p>ok ' || CAST(doc_id % 7 AS VARCHAR) || '</p>' END)
    || '<div>Read more: <a href="/p/' || CAST(doc_id % 100 AS VARCHAR)
    || '">continue reading the full article</a></div>'
    || '<li>&lt;tagged&gt; text with &quot;quotes&quot; and &#39;marks&#39; plus '
    || CAST(doc_id % 5 AS VARCHAR) || '</li></body></html>' AS html
  FROM documents
),
cleaned AS (
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
     '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
     '(?s)<!--.*?-->', ' ', 'g') AS c
  FROM h
),
norms AS (
  SELECT doc_id,
    list_transform(
      string_split_regex(c, '{_HTML_BLOCK_SPLIT_DUCK}'),
      b -> {_HTML_NORM_DUCK.format('b')}) AS btexts,
    list_transform(
      string_split_regex(c, '{_HTML_BLOCK_SPLIT_DUCK}'),
      b -> coalesce(list_sum(list_transform(
        regexp_extract_all(b, '{_HTML_ANCHOR_DUCK}', 1),
        a -> length({_HTML_NORM_DUCK.format('a')}))), 0)) AS alens
  FROM cleaned
),
kept AS (
  SELECT doc_id, btexts, alens,
    list_filter(generate_series(1, len(btexts)), i ->
      length(btexts[i]) >= 10
      AND alens[i] * 100 <= length(btexts[i]) * 50) AS keep_idx
  FROM norms
)
SELECT doc_id,
  array_to_string(list_transform(keep_idx, i -> btexts[i]), ' ')
    AS extracted_text,
  CAST(len(keep_idx) AS BIGINT) AS n_kept,
  CAST(len(list_filter(btexts,
    t -> length(t) > 0 AND length(t) < 10)) AS BIGINT) AS n_drop_short,
  CAST(len(list_filter(generate_series(1, len(btexts)), i ->
    length(btexts[i]) >= 10
    AND alens[i] * 100 > length(btexts[i]) * 50)) AS BIGINT)
    AS n_drop_link,
  CAST(length(array_to_string(
    list_transform(keep_idx, i -> btexts[i]), ' ')) AS BIGINT)
    AS text_len,
  CAST(len(string_split(array_to_string(
    list_transform(keep_idx, i -> btexts[i]), ' '), ' ')) AS BIGINT)
    AS n_words
FROM kept
"""

QUERIES.append(
    Query(
        "text_html_extract",
        text_html_extract_q,
        TEXT_HTML_EXTRACT_SQL,
        "HTML main-content extraction: script/style/comment removal, entity decode, link-density boilerplate pruning",
    )
)


def text_unigram_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-family) tokenizer training under the
    exact gate (round 8, operators/text.unigram_train): 2 Viterbi
    hard-EM rounds — segment every distinct word, re-estimate piece
    counts from the chosen segmentations, re-segment — under the
    exact-integer objective (fewest pieces, then max summed piece
    count, then lexicographically smallest segmentation). The DuckDB
    oracle enumerates ALL minimal segmentations with a recursive CTE
    (words are short; the engine side prunes per-position instead)
    and replays both rounds with window argmaxes."""
    from map_reduce_project_spark.operators.text import unigram_train

    docs = read_table(spark, sf_dir, "documents").select("text")
    return unigram_train(docs, n_rounds=2, max_piece_len=4)


TEXT_UNIGRAM_SQL = """
WITH RECURSIVE
words AS (
  SELECT t AS word, COUNT(*) AS wfreq
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE length(t) >= 1
  GROUP BY t
),
subs AS (
  SELECT word, wfreq, length(word) AS wlen, i AS start, L AS plen,
         substr(word, i, L) AS piece
  FROM words,
       LATERAL unnest(generate_series(1, length(word))) AS a(i),
       LATERAL unnest(generate_series(1, 4)) AS b(L)
  WHERE i + L - 1 <= length(word)
),
c0 AS (SELECT piece, SUM(wfreq) AS c FROM subs GROUP BY piece),
paths AS (
  SELECT word, length(word) AS wlen, 0 AS pos,
         CAST('' AS VARCHAR) AS seg, 0 AS n
  FROM words
  UNION ALL
  SELECT p.word, p.wlen, p.pos + s.plen,
         p.seg || (CASE WHEN p.pos = 0 THEN '' ELSE '|' END) || s.piece,
         p.n + 1
  FROM paths p
  JOIN subs s ON s.word = p.word AND s.start = p.pos + 1
  WHERE p.pos < p.wlen
),
full_segs AS (
  SELECT word, wlen, seg, n FROM paths WHERE pos = wlen
),
min_m AS (SELECT word, MIN(n) AS m FROM full_segs GROUP BY word),
cand AS (
  SELECT f.word, f.seg, f.n
  FROM full_segs f JOIN min_m USING (word)
  WHERE f.n = min_m.m
),
cand_pieces AS (
  SELECT word, seg, n, unnest(string_split(seg, '|')) AS piece
  FROM cand
),
r1scored AS (
  SELECT cp.word, cp.seg, cp.n, SUM(COALESCE(c0.c, 0)) AS score
  FROM cand_pieces cp LEFT JOIN c0 USING (piece)
  GROUP BY cp.word, cp.seg, cp.n
),
r1best AS (
  SELECT word, seg FROM (
    SELECT word, seg,
      ROW_NUMBER() OVER (
        PARTITION BY word ORDER BY score DESC, seg) AS rn
    FROM r1scored
  ) WHERE rn = 1
),
c1 AS (
  SELECT piece, SUM(wfreq) AS c FROM (
    SELECT b.word, unnest(string_split(b.seg, '|')) AS piece
    FROM r1best b
  ) bp JOIN words USING (word)
  GROUP BY piece
),
r2scored AS (
  SELECT cp.word, cp.seg, cp.n, SUM(COALESCE(c1.c, 0)) AS score
  FROM cand_pieces cp LEFT JOIN c1 USING (piece)
  GROUP BY cp.word, cp.seg, cp.n
),
r2best AS (
  SELECT word, seg, n, score FROM (
    SELECT word, seg, n, score,
      ROW_NUMBER() OVER (
        PARTITION BY word ORDER BY score DESC, seg) AS rn
    FROM r2scored
  ) WHERE rn = 1
)
SELECT b.word,
  CAST(w.wfreq AS BIGINT) AS wfreq,
  CAST(b.n AS BIGINT) AS n_pieces,
  b.seg,
  CAST(b.score AS BIGINT) AS score
FROM r2best b JOIN words w USING (word)
"""

QUERIES.append(
    Query(
        "text_unigram_train",
        text_unigram_train_q,
        TEXT_UNIGRAM_SQL,
        "unigram-LM (SentencePiece-family) tokenizer training: 2 Viterbi hard-EM rounds, exact-integer objective",
    )
)


def text_unigram_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoding with the trained unigram tokenizer (round 8):
    train 2 hard-EM rounds (text_unigram_train), then map every
    document's words through the segmentation table (distinct-words-
    sized; AQE picks the join strategy) and re-assemble in order — the production
    tokenize step. The oracle replays training and joins the
    per-word segmentations onto position-exploded documents."""
    from map_reduce_project_spark.operators.text import (
        unigram_apply,
        unigram_train,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    segs = unigram_train(docs, n_rounds=2, max_piece_len=4)
    return unigram_apply(docs, segs)


_UNIGRAM_TRAIN_CTES = TEXT_UNIGRAM_SQL[
    TEXT_UNIGRAM_SQL.index("WITH RECURSIVE") : TEXT_UNIGRAM_SQL.index(
        "\nSELECT b.word"
    )
]

TEXT_UNIGRAM_ENCODE_SQL = (
    _UNIGRAM_TRAIN_CTES
    + """,
dtoks AS (
  SELECT doc_id, i AS pos, t[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL unnest(generate_series(1, len(t))) AS u(i)
)
SELECT d.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(COALESCE(b.n, 1)) AS BIGINT) AS n_pieces,
  string_agg(COALESCE(b.seg, d.word), ' ' ORDER BY d.pos) AS encoded
FROM dtoks d LEFT JOIN r2best b USING (word)
GROUP BY d.doc_id
"""
)

QUERIES.append(
    Query(
        "text_unigram_encode",
        text_unigram_encode_q,
        TEXT_UNIGRAM_ENCODE_SQL,
        "corpus encoding with the trained unigram tokenizer: segmentation lookup join, in-order reassembly",
    )
)


def text_html_links_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + resolution under the exact gate (round 8,
    operators/text.html_extract_links): the same doc_id-synthesized
    HTML fixture as text_html_extract (three hrefs per doc — /home,
    /about, /p/{id%100}) plus a per-doc base URL
    https://example{id%50}.com; every anchor resolves root-relative
    against the base and emits in document order. The crawl-frontier
    edge list a link-graph CC or frontier dedup consumes."""
    from map_reduce_project_spark.operators.text import (
        html_extract_links,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    html = F.concat(
        F.lit('<div class="nav"><a href="/home">Home page</a> '),
        F.lit('<a href="/about">About us</a></div>'),
        F.lit('<div>Read more: <a href="/p/'),
        (d % 100).cast("string"),
        F.lit('">continue reading the full article</a></div>'),
    )
    base = F.concat(
        F.lit("https://example"), (d % 50).cast("string"), F.lit(".com")
    )
    return html_extract_links(
        docs.withColumn("html", html).withColumn("base", base),
        base_col="base",
    )


TEXT_HTML_LINKS_SQL = """
WITH h AS (
  SELECT doc_id,
    '<div class="nav"><a href="/home">Home page</a> <a href="/about">About us</a></div>'
    || '<div>Read more: <a href="/p/' || CAST(doc_id % 100 AS VARCHAR)
    || '">continue reading the full article</a></div>' AS html,
    'https://example' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS base
  FROM documents
),
x AS (
  SELECT doc_id, base,
    unnest(regexp_extract_all(html, '(?is)<a(?:\\s[^>]*?)?\\shref="([^"]*)"', 1)) AS href,
    unnest(generate_series(1,
      len(regexp_extract_all(html, '(?is)<a(?:\\s[^>]*?)?\\shref="([^"]*)"', 1)))) AS link_pos
  FROM h
)
SELECT doc_id,
  CAST(link_pos AS BIGINT) AS link_pos,
  href,
  CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN href
       WHEN href LIKE '//%'
         THEN regexp_extract(base, '^([A-Za-z]+):', 1) || ':' || href
       WHEN href LIKE '/%' THEN
         coalesce(nullif(regexp_extract(base,
           '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1), ''), base) || href
       ELSE
         coalesce(nullif(regexp_extract(base,
           '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*(?:/[^/]*)*)/[^/]*$', 1), ''),
           base) || '/' || href END AS resolved
FROM x
"""

QUERIES.append(
    Query(
        "text_html_links",
        text_html_links_q,
        TEXT_HTML_LINKS_SQL,
        "HTML outlink extraction + base-URL resolution: the crawl-frontier edge list",
    )
)
