"""Dedup queries over the documents table.

The driver corpus has no duplicate texts, so dedup queries run on a
duplicate-injected corpus: documents UNION ALL a copy with
doc_id + 100000 — every document then has exactly one known duplicate,
giving the pipeline real positives to find. Both the Spark and oracle
sides inject identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_dedup_fused,
    lsh_buckets,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
    simhash_candidate_pairs,
)
from map_reduce_project_spark.graph.ccf import connected_components
from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.sources.io import read_table

OFFSET = 100000
NUM_HASHES = 12
BANDS = 4


def _injected_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.scale import fan_out

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copy = docs.select(
        (F.col("doc_id") + OFFSET).alias("doc_id"), F.col("text")
    )
    # single-file scan -> fan out so the shingle/hash map work runs
    # on every core, not one (operators.scale.fan_out)
    return fan_out(docs.unionAll(copy))


CORPUS_CTE = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {OFFSET} AS doc_id, text FROM documents
)
"""

# shingle CTE shared by the minhash/jaccard oracles (word 3-grams,
# same slice semantics as operators.dedup.shingles_expr)
SHINGLE_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM toks
)
"""

# One-hash MinHash formulas — MUST stay textually equivalent to
# operators.dedup.minhash_min_exprs / band_hash_expr
def _sig_cols_sql(num_hashes: int = NUM_HASHES) -> str:
    from map_reduce_project_spark.operators.dedup import (
        MINHASH_P,
        minhash_a,
        minhash_b,
    )

    base = "('0x' || substr(md5(shingle), 1, 8))::BIGINT"
    return ",\n    ".join(
        f"min(({base} * {minhash_a(s)} + {minhash_b(s)}) % {MINHASH_P}) AS h{s}"
        for s in range(num_hashes)
    )


def _band_hash_sql(b: int, rows_per_band: int = 3) -> str:
    from map_reduce_project_spark.operators.dedup import MINHASH_P

    e = f"h{b * rows_per_band}"
    for r in range(1, rows_per_band):
        e = f"({e} * 1000003 + h{b * rows_per_band + r}) % {MINHASH_P}"
    return e


_SIG_COLS = _sig_cols_sql()
_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"{_band_hash_sql(b)} AS band_hash FROM sig"
    for b in range(BANDS)
)

LSH_CTES = f"""
{CORPUS_CTE},
{SHINGLE_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
)
"""


def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(
        _injected_corpus(spark, sf_dir), key_cols=["text"], id_col="doc_id"
    )


DEDUP_EXACT_SQL = f"""
WITH {CORPUS_CTE}
SELECT md5(text) AS content_key, MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM corpus GROUP BY md5(text)
"""


def dedup_minhash_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _injected_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=NUM_HASHES)
    return lsh_candidate_pairs(
        lsh_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    )


DEDUP_MINHASH_SQL = f"""
WITH {LSH_CTES}
SELECT id_a, id_b FROM cands
"""


def dedup_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused shingle-once pipeline: the gate corpus is 100% duplicated,
    # the regime where minhash_dedup_fused beats the candidate-pruned
    # two-pass composition (2.8x at sf0.1 — see its docstring for the
    # |candidates| << |corpus| trade-off where jaccard_verify wins)
    corpus = _injected_corpus(spark, sf_dir)
    return minhash_dedup_fused(
        corpus, num_hashes=NUM_HASHES, bands=BANDS, threshold=0.5
    )


DEDUP_JACCARD_SQL = f"""
WITH {LSH_CTES},
sset AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sset GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sset a ON a.doc_id = c.id_a
  JOIN sset b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE) >= 0.5
"""

def dedup_minhash_pruned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates with document-frequency pruning of hot
    shingles (boilerplate resistance): shingles in more than 5% of the
    corpus are dropped before hashing. The 5%-of-corpus threshold is
    computed with integer division on both sides so the hash check is
    exact."""
    corpus = _injected_corpus(spark, sf_dir)
    max_df = corpus.count() // 20  # metadata-sized driver action
    sigs = minhash_signatures(corpus, num_hashes=NUM_HASHES, max_df=max_df)
    return lsh_candidate_pairs(
        lsh_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    )


DEDUP_MINHASH_PRUNED_SQL = f"""
WITH {CORPUS_CTE},
{SHINGLE_CTE},
dfreq AS (
  SELECT shingle, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY shingle
),
kept AS (
  SELECT s.doc_id, s.shingle
  FROM sh s JOIN dfreq USING (shingle)
  WHERE dfreq.df <= (SELECT COUNT(*) // 20 FROM corpus)
),
sig AS (SELECT doc_id, {_SIG_COLS} FROM kept GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b FROM cands
"""


def dedup_cluster_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical web-scale dedup pipeline END-TO-END: MinHash
    signatures -> LSH band buckets -> candidate pairs -> exact Jaccard
    verification -> connected components over the verified pair graph
    -> keep the numerically smallest doc_id per near-dup cluster.

    Near-duplication is not transitive, so pair lists alone cannot
    answer "which copies do I drop?" — clustering the pair graph can,
    and CCF is exactly that operator (composition, not new code). The
    pair graph is tiny relative to the corpus (cost ∝ verified pairs),
    so CC runs on the small-graph local path here; at corpus scale the
    same edges feed the distributed loop unchanged. doc_ids are
    zero-padded before the lexicographic min so the canonical is the
    NUMERIC min. Output: (doc_id, canonical_id) for every non-canonical
    member of a cluster — the drop list.
    """
    corpus = _injected_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=NUM_HASHES)
    cands = lsh_candidate_pairs(
        lsh_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    )
    verified = jaccard_verify(corpus, cands, threshold=0.5)
    # 12-digit pad: 6 would silently truncate 7-digit doc_ids on BOTH
    # engines identically (gate stays green on merged components).
    # Barriered (round 11): connected_components' local fast path runs
    # count() then collect() on its input, so an unbarriered edge
    # frame re-executes the MinHash->LSH->Jaccard chain twice — same
    # fix as the capstone's cluster stage.
    edges = verified.select(
        F.lpad(F.col("id_a").cast("string"), 12, "0").alias("src"),
        F.lpad(F.col("id_b").cast("string"), 12, "0").alias("dst"),
    ).localCheckpoint(eager=False)
    res = connected_components(edges, local_threshold=500_000)
    return res.mapping.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("canonical_id"),
    )


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {LSH_CTES},
sset AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sset GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sset a ON a.doc_id = c.id_a
  JOIN sset b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
),
vpairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE) >= 0.5
),
e AS (
  SELECT lpad(CAST(id_a AS VARCHAR), 12, '0') AS src,
         lpad(CAST(id_b AS VARCHAR), 12, '0') AS dst
  FROM vpairs
),
und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
gnodes AS (SELECT DISTINCT src AS n FROM und),
und2 AS (SELECT src, dst FROM und UNION SELECT n, n FROM gnodes),
lab AS (
  SELECT 0 AS it, n AS node, n AS lab FROM gnodes
  UNION ALL
  SELECT lab.it + 1 AS it, und2.dst AS node, MIN(lab.lab) AS lab
  FROM lab JOIN und2 ON und2.src = lab.node
  WHERE lab.it < 16
  GROUP BY lab.it, und2.dst
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(lab AS BIGINT) AS canonical_id
FROM lab WHERE it = 16 AND node <> lab
"""


_SIMHASH_BITS = 16


def _sum_cols(bits: int) -> str:
    return ",\n    ".join(
        f"sum(CASE WHEN ('0x' || substr(th, {i + 1}, 1))::INT % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )


def _sig_expr(bits: int) -> str:
    return " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )


_SUM_COLS = _sum_cols(_SIMHASH_BITS)
_SIG_EXPR = _sig_expr(_SIMHASH_BITS)


def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_project_spark.operators.scale import fan_out

    docs = fan_out(read_table(spark, sf_dir, "documents"))
    return simhash(docs, bits=_SIMHASH_BITS)


DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS th FROM documents
),
sums AS (SELECT doc_id, {_SUM_COLS} FROM tok GROUP BY doc_id)
SELECT doc_id, CAST({_SIG_EXPR} AS BIGINT) AS simhash FROM sums
"""


_PAIR_BITS = 32  # 4 bands x 8 bits: 256 bucket values per band


def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS over the duplicate-injected corpus:
    Hamming-band bucketed equi-join (pigeonhole-lossless for
    max_hamming=3 at 4 bands) + exact bit_count(xor) verification.
    32-bit signatures so band buckets have 256 values — buckets scale
    with the corpus instead of collapsing to 16 mega-buckets."""
    corpus = _injected_corpus(spark, sf_dir)
    sigs = simhash(corpus, bits=_PAIR_BITS)
    return simhash_candidate_pairs(
        sigs, bits=_PAIR_BITS, bands=4, max_hamming=3
    )


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH {CORPUS_CTE},
tok AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS th FROM corpus
),
sums AS (SELECT doc_id, {_sum_cols(_PAIR_BITS)} FROM tok GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({_sig_expr(_PAIR_BITS)} AS BIGINT) AS simhash
        FROM sums),
bands AS (
  SELECT doc_id, simhash, b AS band_idx,
         (simhash >> (b * 8)) & 255 AS band_bits
  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS b)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b USING (band_idx, band_bits)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cands WHERE hamming <= 3
"""


def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch-vs-index dedup: the index is documents with
    doc_id % 3 != 0, the incoming batch is a copy of ALL documents at
    doc_id + OFFSET — so two-thirds of the batch has an exact index
    twin and the rest only matches via natural near-dup overlap.
    Each flagged batch doc names its best index match."""
    from map_reduce_project_spark.operators.dedup import incremental_dedup
    from map_reduce_project_spark.operators.scale import fan_out

    docs = fan_out(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    index_docs = docs.where(F.col("doc_id") % 3 != 0)
    batch = docs.select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    return incremental_dedup(index_docs, batch, threshold=0.5)


def _side_ctes(name: str, src: str) -> str:
    """Shingle/signature/band CTE chain for one side of the
    incremental-dedup oracle (same hash formulas as LSH_CTES)."""
    sig_cols = _sig_cols_sql()
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"{_band_hash_sql(b)} AS band_hash"
        f" FROM {name}sig"
        for b in range(BANDS)
    )
    return f"""
{name}toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM {src}),
{name}sh AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' '))) AS shingle
  FROM {name}toks
),
{name}sig AS (SELECT doc_id, {sig_cols} FROM {name}sh GROUP BY doc_id),
{name}bands AS ({band_selects}),
{name}sset AS (SELECT DISTINCT doc_id, shingle FROM {name}sh),
{name}sizes AS (SELECT doc_id, COUNT(*) AS n FROM {name}sset GROUP BY doc_id)
"""


DEDUP_INCREMENTAL_SQL = f"""
WITH idx AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
bat AS (SELECT doc_id + {OFFSET} AS doc_id, text FROM documents),
{_side_ctes("i", "idx")},
{_side_ctes("b", "bat")},
cands AS (
  SELECT DISTINCT bb.doc_id AS id_b, ib.doc_id AS id_i
  FROM bbands bb JOIN ibands ib
    ON ib.band_idx = bb.band_idx AND ib.band_hash = bb.band_hash
),
inter AS (
  SELECT c.id_b, c.id_i, COUNT(*) AS n_inter
  FROM cands c
  JOIN bsset b ON b.doc_id = c.id_b
  JOIN isset i ON i.doc_id = c.id_i AND i.shingle = b.shingle
  GROUP BY c.id_b, c.id_i
),
scored AS (
  SELECT x.id_b, x.id_i,
         CAST(n_inter AS DOUBLE) / CAST(nb.n + ni.n - n_inter AS DOUBLE)
           AS jaccard
  FROM inter x
  JOIN bsizes nb ON nb.doc_id = x.id_b
  JOIN isizes ni ON ni.doc_id = x.id_i
)
SELECT id_b AS doc_id, id_i AS dup_of, jaccard FROM (
  SELECT id_b, id_i, jaccard,
         ROW_NUMBER() OVER (PARTITION BY id_b
                            ORDER BY jaccard DESC, id_i) AS rn
  FROM scored WHERE jaccard >= 0.5
) WHERE rn = 1
"""


def dedup_winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint substring-overlap pairs (MOSS) over the
    injected-duplicate corpus: every injected copy must share all its
    fingerprints with its twin; natural long shared runs also pair."""
    from map_reduce_project_spark.operators.text import substring_overlap_pairs

    corpus = _injected_corpus(spark, sf_dir)
    return substring_overlap_pairs(corpus, k=3, w=4)


_W_CODES = (
    "list_transform(string_split(text, ' '),"
    " t -> ('0x' || substr(md5(t), 1, 6))::BIGINT)"
)
_W_FOLD = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}),"
    " (acc, c) -> (acc * 131 + c) % 2147483647)"
)

DEDUP_WINNOW_SQL = f"""
WITH {CORPUS_CTE},
coded AS (SELECT doc_id, {_W_CODES} AS codes FROM corpus),
hashed AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(codes) - 2, 1)),
           i -> {_W_FOLD.format(arr="codes[i:i+2]")}) AS hashes
  FROM coded
),
winnowed AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(hashes) - 3, 1)),
           j -> list_min(hashes[j:j+3]))) AS fps
  FROM hashed
),
fps AS (SELECT doc_id, unnest(fps) AS fp FROM winnowed)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM fps a JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def decontaminate_train_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over a deterministic eval split:
    doc_id % 7 == 3 is the held-out benchmark, the rest is the training
    corpus; training docs sharing any word 5-gram with the benchmark
    are flagged with hit counts and contamination ratio."""
    from map_reduce_project_spark.operators.dedup import ngram_contamination
    from map_reduce_project_spark.operators.scale import fan_out

    docs = fan_out(
        read_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    eval_docs = docs.where(F.col("doc_id") % 7 == 3)
    train_docs = docs.where(F.col("doc_id") % 7 != 3)
    return ngram_contamination(train_docs, eval_docs, n=5)


DECONTAMINATE_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(w) - 4, 1)),
           i -> array_to_string(w[i:i+4], ' '))) AS gram
  FROM toks
),
ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 7 = 3),
tr AS (SELECT DISTINCT doc_id, gram FROM sh WHERE doc_id % 7 <> 3),
totals AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM tr GROUP BY doc_id),
hits AS (
  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM tr JOIN ev USING (gram) GROUP BY tr.doc_id
)
SELECT h.doc_id, h.n_hits, t.n_grams,
       CAST(h.n_hits AS DOUBLE) / CAST(t.n_grams AS DOUBLE) AS contamination
FROM hits h JOIN totals t ON t.doc_id = h.doc_id
"""


QUERIES = [
    Query("dedup_incremental", dedup_incremental_q, DEDUP_INCREMENTAL_SQL, "incremental batch-vs-index dedup: new batch matched against the existing corpus only"),
    Query("dedup_winnow_pairs", dedup_winnow_q, DEDUP_WINNOW_SQL, "MOSS winnowed-fingerprint substring-overlap candidate pairs"),
    Query("decontaminate_train", decontaminate_train_q, DECONTAMINATE_SQL, "benchmark decontamination: word 5-gram overlap of train docs vs a held-out eval split"),
    Query("dedup_simhash_pairs", dedup_simhash_pairs_q, DEDUP_SIMHASH_PAIRS_SQL, "SimHash Hamming-band near-dup pairs (lossless banding + exact verify)"),
    Query("dedup_cluster_canonical", dedup_cluster_canonical_q, DEDUP_CLUSTER_SQL, "full dedup pipeline: LSH -> Jaccard -> CC clustering -> canonical keep"),
    Query("dedup_exact", dedup_exact_q, DEDUP_EXACT_SQL, "exact dedup via content-hash group-by"),
    Query("dedup_minhash_candidates", dedup_minhash_candidates_q, DEDUP_MINHASH_SQL, "MinHash+LSH near-dup candidate pairs"),
    Query("dedup_jaccard_verified", dedup_jaccard_q, DEDUP_JACCARD_SQL, "exact n-gram Jaccard over LSH candidates"),
    Query("dedup_simhash", dedup_simhash_q, DEDUP_SIMHASH_SQL, "16-bit SimHash signatures"),
    Query("dedup_minhash_pruned", dedup_minhash_pruned_q, DEDUP_MINHASH_PRUNED_SQL, "MinHash+LSH with document-frequency pruning of hot shingles"),
]


def dedup_normalized_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact dedup: the cheap first rung of every
    corpus dedup ladder (before MinHash/SimHash) — lowercase, collapse
    every non-alphanumeric run to one space, trim, then group exact.
    Catches case/punctuation/whitespace variants that byte-exact hash
    dedup misses. The injected corpus adds an UPPERCASED copy with
    trailing junk per even doc, so the normalizer has real work.

    Scale: identical shape to ``dedup_exact`` — map-side normalize +
    one hash-agg on the normalized key (partial+final); no UDF, the
    normalizer is a single JVM regexp_replace inside codegen.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    variant = docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    corpus = docs.unionAll(variant)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    per_doc = corpus.select("doc_id", norm.alias("norm"))
    groups = per_doc.groupBy("norm").agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_variants")
    )
    return (
        per_doc.join(groups, "norm")
        .select(
            "doc_id",
            "keeper",
            (F.col("doc_id") != F.col("keeper")).alias("is_dup"),
            F.col("n_variants").cast("long").alias("n_variants"),
        )
    )


DEDUP_NORMALIZED_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {OFFSET} AS doc_id, upper(text) || '  !!' AS text
  FROM documents WHERE doc_id % 2 = 0
),
per_doc AS (
  SELECT doc_id,
         TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM corpus
),
groups AS (
  SELECT norm, MIN(doc_id) AS keeper, COUNT(*) AS n_variants
  FROM per_doc GROUP BY norm
)
SELECT p.doc_id, g.keeper, p.doc_id <> g.keeper AS is_dup,
       CAST(g.n_variants AS BIGINT) AS n_variants
FROM per_doc p JOIN groups g ON p.norm = g.norm
"""

QUERIES.append(
    Query(
        "dedup_normalized",
        dedup_normalized_q,
        DEDUP_NORMALIZED_SQL,
        "normalization-then-exact dedup: case/punct/whitespace-invariant hash group-by",
    )
)


def dedup_recall_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup pipeline SELF-EVALUATION: the injected corpus has exact
    ground truth (every doc_id pairs with doc_id + OFFSET), so
    candidate-generation recall and precision are computable exactly —
    the measurement every production dedup rollout runs before
    trusting a banding config. One row: truth size, candidate volume,
    hits, recall, precision (exact integers + two fixed divisions).
    """
    corpus = _injected_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=NUM_HASHES)
    cands = lsh_candidate_pairs(
        lsh_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    truth = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + OFFSET).alias("id_b"),
    )
    hits = cands.join(truth, ["id_a", "id_b"], "left_semi")
    return (
        truth.agg(F.count("*").alias("n_truth"))
        .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_truth").cast("double")).alias("recall"),
            (F.col("n_hits").cast("double") / F.col("n_candidates").cast("double")).alias("precision"),
        )
    )


DEDUP_RECALL_SQL = f"""
WITH {CORPUS_CTE},
{SHINGLE_CTE},
sig AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id),
bands AS ({_BAND_SELECTS}),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
),
truth AS (SELECT doc_id AS id_a, doc_id + {OFFSET} AS id_b FROM documents),
hits AS (SELECT 1 FROM cands JOIN truth USING (id_a, id_b)),
c AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cands) AS n_candidates,
         (SELECT COUNT(*) FROM hits) AS n_hits
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
  CAST(n_candidates AS BIGINT) AS n_candidates,
  CAST(n_hits AS BIGINT) AS n_hits,
  CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall,
  CAST(n_hits AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS precision
FROM c
"""

QUERIES.append(
    Query(
        "dedup_recall_report",
        dedup_recall_report_q,
        DEDUP_RECALL_SQL,
        "dedup self-evaluation: LSH candidate recall/precision vs injected ground truth",
    )
)


def dedup_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT scoring over LSH candidates: |A∩B| / |A| instead of
    Jaccard — the asymmetric overlap that catches a small document
    embedded inside a big one (quotes, boilerplate wrappers, partial
    mirrors), which symmetric Jaccard dilutes below threshold. Same
    candidate machinery, one extra division; emits both directions of
    any pair whose containment clears 0.7.
    """
    corpus = _injected_corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=NUM_HASHES)
    cands = lsh_candidate_pairs(
        lsh_buckets(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    )
    from map_reduce_project_spark.operators.dedup import shingles_expr

    sset = corpus.select(
        F.col("doc_id"),
        F.array_distinct(shingles_expr(3, "text")).alias("sset"),
    )
    sa = sset.selectExpr("doc_id as id_a", "sset as set_a")
    sb = sset.selectExpr("doc_id as id_b", "sset as set_b")
    scored = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_inter"),
            F.size("set_a").alias("na"),
            F.size("set_b").alias("nb"),
        )
    )
    contain = lambda inter, n: inter.cast("double") / n.cast("double")
    both = scored.select(
        "id_a",
        "id_b",
        F.col("n_inter").cast("long").alias("n_inter"),
        contain(F.col("n_inter"), F.col("na")).alias("containment_a"),
        contain(F.col("n_inter"), F.col("nb")).alias("containment_b"),
    )
    return both.where(
        (F.col("containment_a") >= 0.7) | (F.col("containment_b") >= 0.7)
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH {LSH_CTES},
sset AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sset GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN sset a ON a.doc_id = c.id_a
  JOIN sset b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, CAST(n_inter AS BIGINT) AS n_inter,
  CAST(n_inter AS DOUBLE) / CAST(na.n AS DOUBLE) AS containment_a,
  CAST(n_inter AS DOUBLE) / CAST(nb.n AS DOUBLE) AS containment_b
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.7
   OR CAST(n_inter AS DOUBLE) / CAST(nb.n AS DOUBLE) >= 0.7
"""

QUERIES.append(
    Query(
        "dedup_containment",
        dedup_containment_q,
        DEDUP_CONTAINMENT_SQL,
        "asymmetric containment scoring over LSH candidates (subset-dup detection)",
    )
)


def dedup_prefix_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity join (AllPairs/PPJoin family,
    Bayardo et al. 2007): sort each doc's token set by GLOBAL
    frequency (rarest first) and index only the first
    n - ceil(t*n) + 1 tokens — two sets with Jaccard >= t MUST share a
    prefix token, so candidate generation is LOSSLESS (MinHash banding
    is probabilistic; this is the exact-recall alternative, at the
    cost of hot-prefix skew instead of hot-bucket skew). Candidates
    sharing a rare prefix token are verified with exact token-set
    Jaccard at t = 0.5.

    Plan: one token-frequency agg (broadcast), one per-doc rank
    window, prefix equi-join on the token, exact verify over the
    candidate pairs — every stage keyed and AQE-splittable; the
    frequency ordering exists precisely to make prefix postings
    short.
    """
    from pyspark.sql.window import Window

    from map_reduce_project_spark.operators.dedup import shingles_expr

    corpus = _injected_corpus(spark, sf_dir)
    # word 3-gram shingle sets (same universe as the MinHash family) —
    # far more discriminative than unigram tokens, so J >= 0.5 means
    # real near-duplication, not shared vocabulary. Round 12: the
    # token table feeds FIVE consumers (freq, sizes, the ranked
    # window, and both verify-join sides) — a lazy checkpoint
    # materializes the explode once instead of re-shingling the
    # corpus per consumer (14.7 s -> 6.4 s at sf0.1, noop sink).
    tok = corpus.select(
        "doc_id",
        F.explode_outer(F.array_distinct(shingles_expr(3, "text"))).alias("t"),
    ).localCheckpoint(eager=False)
    freq = tok.groupBy("t").agg(F.count("*").alias("f"))
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("f", "t")
    ranked = (
        tok.join(freq, "t")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        # t = 0.5: prefix length = n - ceil(n/2) + 1; ceil(n/2) as
        # floor((n+1)/2) keeps it integer (a double / here silently
        # shortens even-n prefixes below the lossless bound)
        .where(
            F.col("rn")
            <= F.col("n") - F.floor((F.col("n") + 1) / 2) + 1
        )
        .select("doc_id", "t")
    )
    cands = (
        ranked.selectExpr("t", "doc_id as id_a")
        .join(ranked.selectExpr("t", "doc_id as id_b"), "t")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    # Round-12 verify rewrite (guide §2.3 "shuffle keys and metadata
    # instead of payloads"): the old per-token verify exploded every
    # candidate pair by its a-side tokens (1.6M pairs x ~52 tokens =
    # 85M rows of ~45-byte shingle strings through two shuffles —
    # 12 s of the query's 15 s at sf0.1). Instead: encode tokens to
    # int64 ids, build one set per doc, and intersect per pair
    # locally — the jaccard_verify shape. One array per pair side
    # crosses the shuffle instead of a token explosion. Query wall
    # 15.5 s -> ~6 s.
    #
    # Round-13 (verdict item 2): ids are xxhash64(t), not a
    # row_number dictionary — the dictionary needed a GLOBAL
    # unpartitioned window (the entire shingle vocabulary sorting
    # through ONE task) plus an unbounded broadcast of the full
    # vocabulary, both scale-killers on a billion-shingle corpus.
    # The hash id needs no dictionary state at all: no window, no
    # broadcast, no join. Intersection counts are exact under
    # injectivity; for a vocabulary of V distinct shingles the
    # collision probability is ~V^2/2^65 (sf0.1: V~2e5 -> ~1e-9;
    # even V=1e9 -> ~3%, and a collision only perturbs a pair's
    # count when exactly one side holds exactly one of the colliding
    # shingles). tests/test_queries.py pins hash-set intersections
    # == string-set intersections on the gate corpus. NULL guard:
    # xxhash64(NULL) is the seed (42), not NULL, so the explode_outer
    # placeholder row of an empty doc must be filtered (the old
    # inner join against the dictionary dropped it implicitly).
    tsets = (
        tok.where(F.col("t").isNotNull())
        .groupBy("doc_id")
        .agg(F.collect_set(F.xxhash64("t")).alias("tset"))
    )
    inter = (
        cands.join(
            tsets.selectExpr("doc_id as id_a", "tset as set_a"), "id_a"
        )
        .join(
            tsets.selectExpr("doc_id as id_b", "tset as set_b"), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("set_a", "set_b")).alias("n_inter"),
        )
        .where(F.col("n_inter") > 0)
    )
    na = sizes.selectExpr("doc_id as id_a", "n as na")
    nb = sizes.selectExpr("doc_id as id_b", "n as nb")
    jac = (
        F.col("n_inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double")
    )
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


DEDUP_PREFIX_SQL = f"""
WITH {CORPUS_CTE},
{SHINGLE_CTE},
tok AS (
  SELECT DISTINCT doc_id, shingle AS t FROM sh
),
freq AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
ranked AS (
  SELECT tok.doc_id, tok.t FROM (
    SELECT tok.doc_id, tok.t, s.n,
           ROW_NUMBER() OVER (PARTITION BY tok.doc_id ORDER BY freq.f, tok.t) AS rn
    FROM tok JOIN freq USING (t) JOIN sizes s ON s.doc_id = tok.doc_id
  ) tok
  WHERE rn <= n - (n + 1) // 2 + 1
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ranked a JOIN ranked b USING (t)
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cands c
  JOIN tok ta ON ta.doc_id = c.id_a
  JOIN tok tb ON tb.doc_id = c.id_b AND tb.t = ta.t
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
  CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / CAST(na.n + nb.n - n_inter AS DOUBLE) >= 0.5
"""

QUERIES.append(
    Query(
        "dedup_prefix_filter",
        dedup_prefix_filter_q,
        DEDUP_PREFIX_SQL,
        "prefix-filtering set-similarity join (PPJoin family): lossless candidates + exact Jaccard",
    )
)


def dedup_savings_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup BUSINESS CASE in one row: bytes and documents the
    exact-dedup pass would remove from the injected corpus — what a
    storage/training-cost review asks before green-lighting the
    pipeline. Duplicate bytes = (copies - 1) x doc length, summed
    exactly."""
    corpus = _injected_corpus(spark, sf_dir)
    groups = corpus.groupBy(F.md5("text").alias("k")).agg(
        F.count("*").alias("n"),
        F.min(F.length("text")).alias("len"),
    )
    return groups.agg(
        F.count("*").cast("long").alias("n_unique_docs"),
        F.sum("n").cast("long").alias("n_total_docs"),
        F.sum(F.col("n") - 1).cast("long").alias("n_removable"),
        F.sum((F.col("n") - 1) * F.col("len")).cast("long").alias(
            "bytes_removable"
        ),
    )


DEDUP_SAVINGS_SQL = f"""
WITH {CORPUS_CTE},
groups AS (
  SELECT md5(text) AS k, COUNT(*) AS n, MIN(LENGTH(text)) AS len
  FROM corpus GROUP BY md5(text)
)
SELECT COUNT(*) AS n_unique_docs,
  CAST(SUM(n) AS BIGINT) AS n_total_docs,
  CAST(SUM(n - 1) AS BIGINT) AS n_removable,
  CAST(SUM((n - 1) * len) AS BIGINT) AS bytes_removable
FROM groups
"""

QUERIES.append(
    Query(
        "dedup_savings_report",
        dedup_savings_report_q,
        DEDUP_SAVINGS_SQL,
        "dedup savings: removable documents and bytes from exact-dedup groups",
    )
)


def dedup_bloom_probe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination probe: the eval split (every 7th
    doc) becomes a 512-bit / 5-hash Bloom filter
    (operators/sketches.py); EVERY doc (train + eval) streams through
    the broadcast bit set and the verdict is compared against exact
    membership. The eval self-probes pin the no-false-negative
    guarantee row by row (every member MUST hit); the train probes
    that hit are the false positives — the price of shipping ~KB
    instead of the corpus. This is the 100 TB decontamination shape:
    broadcast the small side's fingerprint, never shuffle the big
    side.

    Output: every doc the filter flags, with the exact verdict beside
    it (the corpus has no exact cross-doc duplicates, so exact_hit
    marks precisely the eval members).
    """
    from map_reduce_project_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 7 == 0)
    # 512 bits is deliberately tight for the fixture corpus (~46% fill)
    # so the gate exercises BOTH verdict kinds: guaranteed member hits
    # and a visible false-positive tail
    bits = bloom_bits(ev, "text", n_bits=512, n_hashes=5)
    flagged = bloom_probe(
        bits, docs, "text", n_bits=512, n_hashes=5
    ).where(F.col("bloom_hit"))
    exact = ev.select("text").distinct().withColumn("_e", F.lit(1))
    return (
        flagged.join(exact, "text", "left")
        .select(
            "doc_id",
            F.col("bloom_hit"),
            F.coalesce(F.col("_e") == 1, F.lit(False)).alias("exact_hit"),
        )
    )


DEDUP_BLOOM_SQL = """
WITH i(i) AS (VALUES (0), (1), (2), (3), (4)),
ev AS (SELECT text FROM documents WHERE doc_id % 7 = 0),
bits AS (
  SELECT DISTINCT
    ('0x' || substr(md5('bloom' || i.i || '|' || text), 1, 8))::BIGINT
      % 512 AS bit
  FROM ev CROSS JOIN i
),
train AS (
  SELECT doc_id, text,
    ('0x' || substr(md5('bloom' || i.i || '|' || text), 1, 8))::BIGINT
      % 512 AS bit
  FROM documents CROSS JOIN i
),
probe AS (
  SELECT t.doc_id, t.text,
         SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nset
  FROM train t LEFT JOIN bits b USING (bit)
  GROUP BY 1, 2
)
SELECT p.doc_id, TRUE AS bloom_hit,
       EXISTS (SELECT 1 FROM ev e WHERE e.text = p.text) AS exact_hit
FROM probe p
WHERE nset = 5
"""

QUERIES.append(
    Query(
        "dedup_bloom_probe",
        dedup_bloom_probe_q,
        DEDUP_BLOOM_SQL,
        "Bloom decontamination probe vs exact membership (no false negatives)",
    )
)


def dedup_cdc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (round 7) — the FastCDC/rsync-family
    primitive storage dedup systems run before fingerprinting:
    chunk boundaries are declared wherever a rolling window's hash
    hits a target pattern, so an insertion early in a document shifts
    only the chunk it lands in, never every downstream fixed-size
    block. Here the window is the last 3 tokens, the boundary rule is
    md5-bucket(tok[i-2..i]) % 16 == 0 (expected chunk ~16 tokens),
    and chunk membership is the running boundary count — the
    gaps-and-islands shape over ONE explode + one per-doc window.
    Output per (doc, chunk): token span, length, and the chunk's
    md5 fingerprint over its joined tokens, plus n_docs_sharing —
    how many documents contain a byte-identical chunk (the dedup
    signal itself, from one extra partial+final agg). At 100 TB the
    only shuffles key on doc_id (window) and chunk_fp (share
    count); chunk state never exceeds the token stream."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return cdc_chunk_documents(docs)


def cdc_chunk_documents(docs: DataFrame) -> DataFrame:
    """Content-defined chunking over a (doc_id, text) frame — the
    operator behind ``dedup_cdc_chunks`` (see its docstring for the
    design); extracted so property tests can drive crafted corpora
    (the EDIT-LOCALITY property — a one-token edit only disturbs
    chunks within the rolling window's reach — is pinned in
    tests/test_llm_ops.py)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " +")).alias("pos", "tok"),
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # rolling 3-token window hash; positions 0/1 (incomplete window)
    # are never boundaries, so chunk 0 always exists
    win = F.concat_ws(
        " ", F.lag("tok", 2).over(w), F.lag("tok", 1).over(w), F.col("tok")
    )
    is_boundary = (
        (F.row_number().over(w) >= 3)
        & (
            F.conv(F.substring(F.md5(win), 1, 8), 16, 10).cast("long")
            % 16
            == 0
        )
    ).cast("long")
    chunked = toks.withColumn(
        "chunk",
        F.sum(is_boundary).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).na.fill({"chunk": 0})
    per_chunk = (
        chunked.groupBy("doc_id", "chunk")
        .agg(
            F.min("pos").cast("long").alias("start_pos"),
            F.max("pos").cast("long").alias("end_pos"),
            F.count("*").cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_fp"),
        )
    )
    shares = per_chunk.groupBy("chunk_fp").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_sharing")
    )
    return per_chunk.join(shares, "chunk_fp").select(
        "doc_id",
        F.col("chunk").cast("long").alias("chunk"),
        "start_pos",
        "end_pos",
        "n_tokens",
        "chunk_fp",
        "n_docs_sharing",
    )


DEDUP_CDC_SQL = """
WITH raw AS (
  SELECT doc_id,
    generate_subscripts(string_split_regex(text, ' +'), 1) - 1 AS pos,
    unnest(string_split_regex(text, ' +')) AS tok
  FROM documents
),
toks AS (SELECT * FROM raw WHERE tok <> ''),
flagged AS (
  SELECT doc_id, pos, tok,
    CASE WHEN row_number() OVER (PARTITION BY doc_id ORDER BY pos) >= 3
          AND ('0x' || substr(md5(
                 lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos)
                 || ' ' ||
                 lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                 || ' ' || tok), 1, 8))::BIGINT % 16 = 0
         THEN 1 ELSE 0 END AS is_boundary
  FROM toks
),
chunked AS (
  SELECT doc_id, pos, tok,
    COALESCE(SUM(is_boundary) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS chunk
  FROM flagged
),
per_chunk AS (
  SELECT doc_id, chunk,
    MIN(pos) AS start_pos, MAX(pos) AS end_pos,
    COUNT(*) AS n_tokens,
    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_fp
  FROM chunked
  GROUP BY doc_id, chunk
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
  CAST(p.chunk AS BIGINT) AS chunk,
  CAST(p.start_pos AS BIGINT) AS start_pos,
  CAST(p.end_pos AS BIGINT) AS end_pos,
  CAST(p.n_tokens AS BIGINT) AS n_tokens,
  p.chunk_fp,
  CAST(s.n_docs_sharing AS BIGINT) AS n_docs_sharing
FROM per_chunk p
JOIN (
  SELECT chunk_fp, COUNT(DISTINCT doc_id) AS n_docs_sharing
  FROM per_chunk GROUP BY chunk_fp
) s USING (chunk_fp)
"""

QUERIES.append(
    Query(
        "dedup_cdc_chunks",
        dedup_cdc_chunks_q,
        DEDUP_CDC_SQL,
        "content-defined chunking (FastCDC-family): rolling-hash boundaries, chunk fingerprints, share counts",
    )
)


def dedup_url_canonical_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (round 7) — the FIRST dedup stage a
    crawl pipeline runs, before any content hashing: the same page
    arrives as Example.COM:443/p/7/?utm_source=x&b=2&a=1#top and
    example.com/p/7?a=1&b=2, and canonicalization must collapse the
    variants. Rules (the regex-subset ones both engines share —
    no parse_url, which DuckDB lacks): lowercase scheme+host, strip
    default :80/:443 ports, strip the fragment, strip ONE trailing
    path slash, drop utm_*/fbclid/gclid tracking params, sort the
    surviving query params. URL variants are synthesized from doc_id
    (five orthogonal variant axes), so the oracle predicts both the
    canonical forms and the collapse counts exactly. Everything is
    codegen string expressions; the only shuffle keys on the
    canonical URL."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 7 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(d % 2 == 0, F.concat(F.lit("Example"), (d % 50).cast("string"), F.lit(".COM")))
        .otherwise(F.concat(F.lit("example"), (d % 50).cast("string"), F.lit(".com"))),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), (d % 100).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("?utm_source=x&b=2&a=1")).otherwise(
            F.lit("?a=1&b=2")
        ),
        F.when(d % 5 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    u = docs.withColumn("url", url)
    no_frag = F.regexp_replace("url", "#.*$", "")
    scheme_host = F.lower(
        F.regexp_extract(no_frag, "^([A-Za-z]+://[^/?#]+)", 1)
    )
    host_noport = F.regexp_replace(scheme_host, ":(443|80)$", "")
    path = F.regexp_extract(no_frag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path_norm = F.regexp_replace(path, "/$", "")
    qs = F.regexp_extract(no_frag, "\\?([^#]*)", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: ~p.rlike("^(utm_[^=]*|fbclid|gclid)=")
                & (p != F.lit("")),
            )
        ),
        "&",
    )
    canon = F.concat(
        host_noport,
        path_norm,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(
            F.lit("")
        ),
    )
    return (
        u.withColumn("canonical_url", canon)
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("keep_doc"),
        )
    )


DEDUP_URL_SQL = """
WITH u AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END)
    || (CASE WHEN doc_id % 2 = 0
        THEN 'Example' || CAST(doc_id % 50 AS VARCHAR) || '.COM'
        ELSE 'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' END)
    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
    || '/p/' || CAST(doc_id % 100 AS VARCHAR)
    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&b=2&a=1'
        ELSE '?a=1&b=2' END)
    || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
  FROM documents
),
c AS (
  SELECT doc_id,
    regexp_replace(url, '#.*$', '') AS no_frag
  FROM u
),
parts AS (
  SELECT doc_id,
    regexp_replace(
      lower(regexp_extract(no_frag, '^([A-Za-z]+://[^/?#]+)', 1)),
      ':(443|80)$', '') AS host_noport,
    regexp_replace(
      regexp_extract(no_frag, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
      '/$', '') AS path_norm,
    regexp_extract(no_frag, '\\?([^#]*)', 1) AS qs
  FROM c
),
canon AS (
  SELECT doc_id,
    host_noport || path_norm ||
    (CASE WHEN list_aggregate(
        list_sort(list_filter(string_split(qs, '&'),
          p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')
               AND p <> '')),
        'string_agg', '&') IS NOT NULL
      AND list_aggregate(
        list_sort(list_filter(string_split(qs, '&'),
          p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')
               AND p <> '')),
        'string_agg', '&') <> ''
     THEN '?' || list_aggregate(
        list_sort(list_filter(string_split(qs, '&'),
          p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')
               AND p <> '')),
        'string_agg', '&')
     ELSE '' END) AS canonical_url
  FROM parts
)
SELECT canonical_url,
  CAST(COUNT(*) AS BIGINT) AS n_variants,
  CAST(MIN(doc_id) AS BIGINT) AS keep_doc
FROM canon
GROUP BY canonical_url
"""

QUERIES.append(
    Query(
        "dedup_url_canonical",
        dedup_url_canonical_q,
        DEDUP_URL_SQL,
        "URL canonicalization dedup: case/port/fragment/tracking-param/slash variants collapse exactly",
    )
)


def dedup_exact_substring_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global exact-substring dedup (round 8, Lee et al. 2022 class):
    maximal duplicated token spans >= k tokens across the whole
    corpus, exactly verified on gram text with a deterministic
    (doc, pos)-minimum keeper, merged per document via
    gaps-and-islands (operators.dedup.duplicate_spans). k=4 on the
    31-word-vocab driver corpus gives the same duplicate density a
    50-token threshold has on real crawl text. The oracle recomputes
    spans from first principles with window functions."""
    from map_reduce_project_spark.operators.dedup import duplicate_spans

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicate_spans(docs, k=4)


DEDUP_EXACT_SUBSTR_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
),
occ AS (
  SELECT doc_id, pos,
    COUNT(*) OVER (PARTITION BY gram) AS n_occ,
    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM g
),
excise AS (
  SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn > 1
),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN pos - COALESCE(
        LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos),
        -1000000000) > 4 THEN 1 ELSE 0 END AS new_isl
  FROM excise
),
isl2 AS (
  SELECT doc_id, pos,
    SUM(new_isl) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
)
SELECT doc_id,
  CAST(MIN(pos) AS BIGINT) AS span_start,
  CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
  CAST(MAX(pos) + 3 - MIN(pos) + 1 AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_grams
FROM isl2
GROUP BY doc_id, island
"""

QUERIES.append(
    Query(
        "dedup_exact_substring",
        dedup_exact_substring_q,
        DEDUP_EXACT_SUBSTR_SQL,
        "global exact-substring dedup: duplicated >=k-token spans, hash-bucketed candidates, exact-text verify, keeper election",
    )
)


def dedup_excise_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Lee-et-al-2022 loop under the exact gate (round 8):
    detect duplicated >=4-token spans corpus-wide (duplicate_spans,
    same parameters as dedup_exact_substring) and EXCISE them from
    every non-keeper occurrence (excise_spans — one aggregate on the
    span table, one filter-HOF over the token array, documents
    without spans pass through byte-identical). The oracle re-derives
    the cut positions from first principles and string_aggs the
    survivors in order."""
    from map_reduce_project_spark.operators.dedup import (
        duplicate_spans,
        excise_spans,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return excise_spans(docs, duplicate_spans(docs, k=4))


DEDUP_EXCISE_SQL = """
WITH toks0 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
g AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks0, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
),
occ AS (
  SELECT doc_id, pos,
    COUNT(*) OVER (PARTITION BY gram) AS n_occ,
    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM g
),
excise AS (
  SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn > 1
),
toks AS (
  SELECT doc_id, i, t[i] AS tok, len(t) AS n
  FROM toks0, LATERAL unnest(generate_series(1, len(t))) AS u(i)
),
cut AS (
  SELECT DISTINCT tk.doc_id, tk.i
  FROM toks tk JOIN excise e
    ON e.doc_id = tk.doc_id AND tk.i BETWEEN e.pos AND e.pos + 3
)
SELECT tk.doc_id,
  COALESCE(
    string_agg(CASE WHEN c.i IS NULL THEN tk.tok END, ' ' ORDER BY tk.i),
    '') AS clean_text,
  CAST(MAX(tk.n) AS BIGINT) AS n_tokens_before,
  CAST(COUNT(*) FILTER (WHERE c.i IS NULL) AS BIGINT) AS n_tokens_after,
  CAST(COUNT(*) FILTER (WHERE c.i IS NOT NULL) AS BIGINT) AS n_tokens_cut
FROM toks tk
LEFT JOIN cut c ON c.doc_id = tk.doc_id AND c.i = tk.i
GROUP BY tk.doc_id
"""

QUERIES.append(
    Query(
        "dedup_excise_spans",
        dedup_excise_spans_q,
        DEDUP_EXCISE_SQL,
        "exact-substring dedup EXCISION: duplicated spans cut from non-keeper occurrences, keepers byte-identical",
    )
)
