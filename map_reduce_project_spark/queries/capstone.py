"""End-to-end training-data curation capstone (round 9).

One gated query composing EVERY stage of the crawl-to-training-data
pipeline in sequence — the composition the individual gates
(text_html_extract, text_gopher_rules, dedup_cluster_canonical,
dedup_excise_spans, text_unigram_encode, text_pack_manifest) never
exercise as one plan:

    raw corpus (duplicate-injected, HTML-wrapped)
      -> html_extract            (boilerplate/link-density pruning)
      -> gopher_rules filter     (structural quality gate)
      -> MinHash/LSH/Jaccard/CC  (cluster-canonical near-dup drop)
      -> duplicate_spans/excise  (exact-substring span excision)
      -> unigram_train/apply     (tokenizer training + encoding)
      -> pack_sequences          (fixed-context packing manifest)

Two registry entries share the composition:

* ``curation_capstone`` — the per-document final manifest
  (provenance counters + pack offsets), hash-gated per row;
* ``curation_capstone_funnel`` — the single-row per-stage attrition
  report (the ``curation_funnel`` observability pattern applied to
  the full ladder).

Oracle discipline: the DuckDB side REPLAYS every stage rather than
asserting closed forms, and reuses the exact SQL fragments of the
individually-gated stage oracles programmatically (``SHINGLE_CTE`` /
minhash signature + band builders from ``queries.dedup``, the
unigram-training recursive CTEs from ``queries.text`` retargeted at
the excised corpus) so the capstone oracle cannot drift from the
stage oracles. Module-level asserts pin the retargeting rewrites.

Stage-parameter notes, all driven by the synthetic corpus:

* the injected copy (doc_id + OFFSET) gives the cluster-dedup stage a
  known positive per document, while ``doc_id % 17 == 3`` documents
  get NO content block, so extraction attrition is non-zero and some
  copies out-survive their originals (the copy then becomes its own
  canonical — a real seam the per-stage gates cannot reach);
* the Gopher stopword rule runs at ``must_have_stopwords >= 1``: the
  synthetic vocabulary carries exactly one must-have class ("the"),
  so the published ``>= 2`` threshold would void the corpus — the
  remaining four structural rules run at their published thresholds
  (word count 50..100k attrits ~45% of extraction survivors);
* span dedup uses k=4 grams — the same duplicate-density-equivalent
  choice the gated ``dedup_exact_substring`` documents for the
  31-word vocabulary.

Scale shape (the seams, not the stages, are what this query pins):
extraction + quality are zero-shuffle codegen projections feeding the
single-shuffle shingle aggregate; the CC loop runs on the verified
pair graph (duplicate-volume-sized, never corpus-sized); span
excision shuffles text only for candidate positions; tokenizer state
is vocabulary-bounded; packing's global prefix sum moves one row per
partition to the driver. SCALING.md §capstone records the fused plan's
exchange census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_project_spark.queries import Query
from map_reduce_project_spark.queries.dedup import (
    BANDS,
    NUM_HASHES,
    OFFSET,
    SHINGLE_CTE,
    _band_hash_sql,
    _sig_cols_sql,
)
from map_reduce_project_spark.queries.text import (
    _HTML_ANCHOR_DUCK,
    _HTML_BLOCK_SPLIT_DUCK,
    _HTML_NORM_DUCK,
    _UNIGRAM_TRAIN_CTES,
)
from map_reduce_project_spark.sources.io import read_table

CONTEXT_LEN = 512
SPAN_K = 4
# CC node ids are lpadded so the lexicographic min IS the numeric min;
# 12 digits covers any doc_id below 10^12 — a 6-digit pad would
# silently TRUNCATE 7-digit ids on both engines identically, merging
# unrelated documents into one component with the gate still green
_CC_PAD = 12
# propagation rounds for the oracle's CC replay; a convergence canary
# in the SQL errors out if any label is still moving at the cap
_CC_ROUNDS = 40

# Retarget the gated unigram-training oracle fragment at the excised
# corpus CTE. Assert on the RESULT, not the input: counting the input
# marker while replacing a longer string would let a formatting drift
# in queries.text turn the replace into a silent no-op (tokenizer
# trained on the raw documents table) with the assert still green.
_UNIGRAM_ON_CLEAN = _UNIGRAM_TRAIN_CTES.replace(
    "WITH RECURSIVE\n", ""
).replace("FROM documents)", "FROM clean)")
assert "FROM clean)" in _UNIGRAM_ON_CLEAN
assert "FROM documents" not in _UNIGRAM_ON_CLEAN
assert SHINGLE_CTE.count("FROM corpus") == 1


def _wrapped_corpus(docs: DataFrame) -> DataFrame:
    """Duplicate-injected corpus wrapped in synthesized crawl HTML:
    nav boilerplate (link-dense), a short heading, the document text
    as the content paragraph (omitted for doc_id % 17 == 3 — the
    extraction-attrition axis), and a link-dense read-more block.
    ``docs`` is any (doc_id, text) frame — the gated queries pass the
    sf_dir documents table; the bench scale tier passes a synthesized
    1M-doc corpus through the same wrapper.

    CALLER CONTRACT on doc_id: the id set and (id set + OFFSET) must
    be DISJOINT, or a copy's id collides with a different original's
    id and two texts silently merge under one doc_id (shingle sets,
    CC nodes, span positions all keyed by id). The sf corpora are
    safe (≤50k rows vs OFFSET=100,000); an arbitrary corpus larger
    than OFFSET must stride or offset its ids — the bench 1M tier
    uses multiples of 3 (100,000 % 3 != 0)."""
    from map_reduce_project_spark.operators.scale import fan_out

    corpus = fan_out(
        docs.unionAll(
            docs.select(
                (F.col("doc_id") + OFFSET).alias("doc_id"), "text"
            )
        )
    )
    d = F.col("doc_id")
    html = F.concat(
        F.lit(
            "<html><head><style>p {color: red}</style>"
            '<script type="text/javascript">alert("noise");</script>'
            '</head><body><div class="nav">'
            '<a href="/home">Home page</a> '
            '<a href="/about">About us</a></div><h1>Doc '
        ),
        (d % 100).cast("string"),
        F.lit("</h1>"),
        F.when(d % 17 == 3, F.lit("")).otherwise(
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
        ),
        F.lit('<div>Read more: <a href="/p/'),
        (d % 100).cast("string"),
        F.lit(
            '">continue reading the full article</a></div>'
            "</body></html>"
        ),
    )
    return corpus.withColumn("html", html)


def _capstone_frames(
    spark: SparkSession, sf_dir: str, **stage_params
) -> dict[str, DataFrame]:
    """Run the composition over the sf_dir documents table (the gated
    registry entries' input). ``stage_params`` pass through to
    ``_frames_from_docs`` (fuzz lane); empty for the pinned gates."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _frames_from_docs(spark, docs, **stage_params)


def _frames_from_docs(
    spark: SparkSession,
    docs: DataFrame,
    stage_hook=None,
    span_k: int = SPAN_K,
    context_len: int = CONTEXT_LEN,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> dict[str, DataFrame]:
    """Run the composition once, returning every stage frame so the
    manifest and funnel queries assemble from the same plan.

    ``stage_hook(name, frame)``: optional bench instrumentation point,
    called in stage order (quality, cluster_dedup, span_excise,
    tokenize, pack) with the stage's output frame the moment it is
    wired — the hook may force it (count) so callback-to-callback wall
    time attributes each stage's cost, including the construction-time
    actions that run between hooks (the CC fixed point, the span
    autoprobe when enabled, the tokenizer training loop, the packing
    prefix-sum). Default None keeps the gated queries' behavior
    byte-identical.

    ``span_k`` / ``context_len`` / ``num_hashes`` / ``bands``: stage
    parameters, defaulting to the module constants the gated queries
    pin. The fuzz lane (tools/fuzz_capstone.py) perturbs them and
    re-gates against ``build_capstone_sql`` built with the SAME
    draws — stage-coupling bugs only surface in composition, so each
    parameter must reach both engines from one source."""
    from map_reduce_project_spark.graph.ccf import connected_components
    from map_reduce_project_spark.operators.dedup import (
        duplicate_spans,
        excise_spans,
        minhash_dedup_fused,
    )
    from map_reduce_project_spark.operators.text import (
        gopher_doc_metrics,
        html_extract,
        pack_sequences,
        unigram_apply,
        unigram_train,
    )

    hook = stage_hook or (lambda name, frame: None)
    wrapped = _wrapped_corpus(docs)
    ext = html_extract(wrapped)
    # Barrier the extraction output BEFORE any filter touches it
    # (round 11): a `where(extracted_text != '')` placed above
    # html_extract's layered projections gets predicate-pushed BELOW
    # them, inlining the whole regex chain into the filter condition
    # with multiplicative alias duplication (the optimized plan grows
    # to ~64 KB of expression text) — measured 48.2 s vs 6.4 s for
    # this materialization at the 1M-doc bench tier. Checkpoint the
    # pruned projection first; the filter then reads a materialized
    # column (plan: 179 chars). Same O9 discipline as the barriers
    # below (round 10 added the barrier; round 11 moved it below the
    # filter).
    ext_ck = ext.select("doc_id", "extracted_text").localCheckpoint(
        eager=False
    )
    ext_ok = ext_ck.where(F.col("extracted_text") != "").select(
        "doc_id", F.col("extracted_text").alias("text")
    )
    # Quality gate as an INLINE filter on the materialized corpus
    # (round 11): the rules are row-local functions of text, so the
    # former rule-frame left-semi join (a full corpus-sized shuffle
    # on both sides) is a plain predicate — one exchange fewer, and
    # the 100 TB shape is a map-only stage. Same thresholds as
    # gopher_rules (must_have >= 1 is this funnel's deliberate
    # relaxation — synthetic corpora have one planted stopword).
    m = gopher_doc_metrics("text")
    n_w, tl = m["n_words"], m["total_word_len"]
    # Barrier the quality-survivor corpus (O9 discipline): the
    # MinHash->LSH->Jaccard chain below references it ~6 times
    # (signatures, candidate semi-filter, shingle sets) and each
    # reference would otherwise re-run the filter + upstream chain.
    quality = ext_ok.where(
        (n_w >= 50)
        & (n_w <= 100_000)
        & (3 * n_w <= tl)
        & (tl <= 10 * n_w)
        & (10 * m["n_symbols"] <= n_w)
        & (5 * m["alpha_words"] >= 4 * n_w)
        & (m["must_have_stopwords"] >= 1)
    ).localCheckpoint(eager=False)
    hook("quality", quality)

    # Shingle-ONCE fused dedup (optimization round 12, guide §2.3
    # "shuffle fewer bytes"/§2.4): the composable chain shingled the
    # quality corpus twice — once for signatures over ALL docs, once
    # more to rebuild candidate docs' shingle sets for verification.
    # THIS corpus is the fused path's home regime (its docstring
    # trade-off): the ladder injects a full copy of every doc, so
    # ~half the quality survivors are candidates and the candidate-
    # pruned re-shingle saves nothing while the second explode +
    # distinct-shingle shuffle costs a full corpus pass. Output is
    # pair-identical to jaccard_verify (same LSH banding, same exact
    # Jaccard, same threshold) — funnel counts and gate hashes are
    # unchanged (oracle-verified at sf0.01/sf0.1). Measured at the 1M
    # bench tier: cluster_dedup stage 45.5 s -> 33.3 s.
    # collapse_exact (round 13): the wrapper injects a literal copy
    # of every doc, so ~half the quality survivors are exact
    # duplicates — the collapse halves the shingle explode (the
    # fused plan's most expensive step) and expands pairs back
    # losslessly (pair-identical by the operator's property test;
    # funnel counts oracle-verified). 1M tier: cluster stage
    # 21.5 s -> 15.7 s.
    verified = minhash_dedup_fused(
        quality,
        num_hashes=num_hashes,
        bands=bands,
        threshold=0.5,
        collapse_exact=True,
    )
    # Barrier the verified edge list (round 11): connected_components'
    # local fast path runs count() THEN collect() on its input, so an
    # unbarriered edge frame re-executes the whole
    # MinHash->LSH->Jaccard chain twice (~23 s of the 44.6 s
    # cluster_dedup stage wall at the 1M-doc bench tier). One
    # dedup-pair-sized checkpoint halves the stage.
    edges = verified.select(
        F.lpad(F.col("id_a").cast("string"), _CC_PAD, "0").alias("src"),
        F.lpad(F.col("id_b").cast("string"), _CC_PAD, "0").alias("dst"),
    ).localCheckpoint(eager=False)
    res = connected_components(edges, local_threshold=500_000)
    drop = res.mapping.select(
        F.col("node").cast("bigint").alias("doc_id")
    )
    # Two more barriers at the downstream reuse hubs: duplicate_spans
    # touches its input three times (probe, candidates, verify-join)
    # and the tokenize/pack stages re-read the excised corpus four
    # more — without the barriers the whole upstream chain re-executes
    # per touch. All three barriers together: 196s -> 40s at sf0.1.
    canonical = quality.join(drop, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    hook("cluster_dedup", canonical)

    # skew_robust pinned: the quality gate bounds documents at 100k
    # words over a 31-word vocabulary, so no 4-gram can approach the
    # skew threshold — pinning removes the autoprobe's construction-
    # time collect. (Construction is NOT otherwise lazy: the CC fixed
    # point above and pack_sequences below both act at call time; the
    # pin just drops one more eager job, it does not make the frames
    # explain-safe.) Real crawl deployments leave the default so the
    # probe can flip to the aggregate path.
    spans = duplicate_spans(canonical, k=span_k, skew_robust=False)
    clean = excise_spans(canonical, spans).localCheckpoint(eager=False)
    hook("span_excise", clean)
    clean_docs = clean.select(
        "doc_id", F.col("clean_text").alias("text")
    )
    segs = unigram_train(clean_docs, n_rounds=2, max_piece_len=4)
    # Barrier the encoded corpus too: the tokenize hook forces enc,
    # and without a checkpoint the pack stage would re-run
    # unigram_apply over the whole corpus — pack's reported wall
    # would double-count tokenization (round-10 advisory).
    enc = unigram_apply(clean_docs, segs).localCheckpoint(eager=False)
    hook("tokenize", enc)
    packed = pack_sequences(
        enc.select(
            "doc_id", F.translate("encoded", "|", " ").alias("text")
        ),
        context_len=context_len,
    )
    hook("pack", packed)
    return {
        "raw": wrapped,
        "ext_ok": ext_ok,
        "quality": quality,
        "canonical": canonical,
        "clean": clean,
        "enc": enc,
        "packed": packed,
    }


def capstone_funnel_staged(
    spark: SparkSession, docs: DataFrame
) -> dict:
    """Bench instrumentation entry: run the full curation ladder over
    an arbitrary (doc_id, text) corpus, forcing each stage frame as it
    is wired so callback-to-callback wall time attributes per-stage
    cost. Returns ``{"funnel": {...}, "stage_walls": {...}}``.

    Wall semantics: ``quality`` includes HTML extraction (the hook
    sequence starts at the quality count, which materializes the
    round-10 ``ext_ok`` extraction barrier as a side effect — the two
    are timed together); every later stage starts from the previous
    stage's materialized localCheckpoint (including ``enc``, so pack
    does not re-run tokenization), so its wall is the genuine
    incremental cost (cluster_dedup carries the CC fixed point,
    tokenize the training loop, pack the eager prefix-sum).
    ``n_raw``/``n_extracted`` are computed afterwards for the funnel
    (one column-pruned count + one cheap count over the materialized
    extraction checkpoint, untimed)."""
    import time

    walls: dict[str, float] = {}
    last = time.perf_counter()

    def force(name: str, frame: DataFrame) -> None:
        nonlocal last
        frame.count()
        now = time.perf_counter()
        walls[name] = round(now - last, 3)
        last = now

    s = _frames_from_docs(spark, docs, stage_hook=force)
    funnel = {
        "n_raw": s["raw"].count(),
        "n_extracted": s["ext_ok"].count(),
        "n_quality": s["quality"].count(),
        "n_canonical": s["canonical"].count(),
    }
    ex = s["clean"].agg(
        F.sum(F.when(F.col("n_tokens_cut") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_excised"),
        F.sum("n_tokens_before").cast("long").alias("tokens_before"),
        F.sum("n_tokens_cut").cast("long").alias("tokens_cut"),
    ).collect()[0]
    pk = s["packed"].agg(
        F.sum("n_tokens").cast("long").alias("total_pieces")
    ).collect()[0]
    funnel.update(
        n_docs_excised=ex["n_docs_excised"],
        tokens_before=ex["tokens_before"],
        tokens_cut=ex["tokens_cut"],
        total_pieces=pk["total_pieces"],
    )
    return {"funnel": funnel, "stage_walls": walls}


def curation_capstone_q(
    spark: SparkSession, sf_dir: str, **stage_params
) -> DataFrame:
    """Per-document final manifest of the full curation ladder:
    pre-excision token count, tokens excised, encoded piece count,
    and the pack offsets of each surviving document."""
    s = _capstone_frames(spark, sf_dir, **stage_params)
    return (
        s["packed"]
        .join(
            s["clean"].select(
                "doc_id", "n_tokens_before", "n_tokens_cut"
            ),
            "doc_id",
        )
        .join(s["enc"].select("doc_id", "n_pieces"), "doc_id")
        .select(
            "doc_id",
            "n_tokens_before",
            "n_tokens_cut",
            "n_pieces",
            "start_offset",
            "bin_id",
            "offset_in_bin",
        )
    )


def curation_capstone_funnel_q(
    spark: SparkSession, sf_dir: str, **stage_params
) -> DataFrame:
    """Single-row per-stage attrition report over the same ladder:
    documents surviving each cumulative stage plus the token-level
    excision and packing totals."""
    s = _capstone_frames(spark, sf_dir, **stage_params)
    context_len = stage_params.get("context_len", CONTEXT_LEN)

    def n(df: DataFrame, alias: str) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias(alias))

    excision = s["clean"].agg(
        F.sum(F.when(F.col("n_tokens_cut") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_excised"),
        F.sum("n_tokens_before").cast("long").alias("tokens_before"),
        F.sum("n_tokens_cut").cast("long").alias("tokens_cut"),
    )
    packing = s["packed"].agg(
        F.sum("n_tokens").cast("long").alias("total_pieces"),
        F.expr(
            f"cast((sum(n_tokens) + {context_len - 1}) "
            f"div {context_len} as long)"
        ).alias("n_bins"),
    )
    return (
        n(s["raw"], "n_raw")
        .crossJoin(n(s["ext_ok"], "n_extracted"))
        .crossJoin(n(s["quality"], "n_quality"))
        .crossJoin(n(s["canonical"], "n_canonical"))
        .crossJoin(excision)
        .crossJoin(packing)
    )


_GOPHER_STOP_CASES = "\n       + ".join(
    f"(CASE WHEN contains(' ' || text || ' ', ' {w} ') "
    "THEN 1 ELSE 0 END)"
    for w in (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )
)

def _capstone_ctes_raw(
    span_k: int, cc_rounds: int, num_hashes: int, bands: int
) -> str:
    """The full oracle CTE ladder with every stage parameter
    injected from arguments — one source of truth for the pinned
    module-level SQL (defaults) AND the fuzz lane's perturbed
    rebuilds."""
    sig_cols = _sig_cols_sql(num_hashes)
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, (num_hashes, bands)
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"{_band_hash_sql(b, rows_per_band)} AS band_hash FROM sig"
        for b in range(bands)
    )
    return f"""
WITH RECURSIVE
raw AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {OFFSET} AS doc_id, text FROM documents
),
h AS (
  SELECT doc_id,
    '<html><head><style>p {{color: red}}</style>'
    || '<script type="text/javascript">alert("noise");</script>'
    || '</head><body><div class="nav"><a href="/home">Home page</a>'
    || ' <a href="/about">About us</a></div><h1>Doc '
    || CAST(doc_id % 100 AS VARCHAR) || '</h1>'
    || (CASE WHEN doc_id % 17 = 3 THEN ''
        ELSE '<p>' || text || '</p>' END)
    || '<div>Read more: <a href="/p/' || CAST(doc_id % 100 AS VARCHAR)
    || '">continue reading the full article</a></div></body></html>'
    AS html
  FROM raw
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
extok AS (
  SELECT doc_id, text FROM (
    SELECT doc_id,
      array_to_string(list_transform(
        list_filter(generate_series(1, len(btexts)), i ->
          length(btexts[i]) >= 10
          AND alens[i] * 100 <= length(btexts[i]) * 50),
        i -> btexts[i]), ' ') AS text
    FROM norms
  ) WHERE text <> ''
),
gm AS (
  SELECT doc_id, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(length(text) - len(string_split(text, ' ')) + 1 AS BIGINT)
      AS total_word_len,
    CAST(len(string_split(text, '#')) - 1
       + len(string_split(text, '...')) - 1 AS BIGINT) AS n_symbols,
    CAST(len(list_filter(string_split(text, ' '),
                         w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
      AS alpha_words,
    CAST({_GOPHER_STOP_CASES}
      AS BIGINT) AS must_have_stopwords
  FROM extok
),
corpus AS (
  SELECT doc_id, text FROM gm
  WHERE n_words >= 50 AND n_words <= 100000
    AND 3 * n_words <= total_word_len
    AND total_word_len <= 10 * n_words
    AND 10 * n_symbols <= n_words
    AND 5 * alpha_words >= 4 * n_words
    AND must_have_stopwords >= 1
),
{SHINGLE_CTE.strip()},
sig AS (SELECT doc_id, {sig_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_idx, band_hash)
  WHERE a.doc_id < b.doc_id
),
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
  WHERE CAST(n_inter AS DOUBLE)
      / CAST(na.n + nb.n - n_inter AS DOUBLE) >= 0.5
),
e AS (
  SELECT lpad(CAST(id_a AS VARCHAR), {_CC_PAD}, '0') AS src,
         lpad(CAST(id_b AS VARCHAR), {_CC_PAD}, '0') AS dst
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
  WHERE lab.it < {cc_rounds}
  GROUP BY lab.it, und2.dst
),
convchk AS (
  SELECT COUNT(*) AS n_unconv
  FROM lab a JOIN lab b USING (node)
  WHERE a.it = {cc_rounds} AND b.it = {cc_rounds - 1}
    AND a.lab <> b.lab
),
dropids AS (
  SELECT CAST(node AS BIGINT)
       + (SELECT CASE WHEN n_unconv = 0 THEN 0
          ELSE error('capstone CC replay unconverged at {cc_rounds} rounds')
          END FROM convchk) AS doc_id
  FROM lab
  WHERE it = {cc_rounds} AND node <> lab
),
surv AS (
  SELECT c.doc_id, c.text FROM corpus c
  LEFT JOIN dropids d USING (doc_id)
  WHERE d.doc_id IS NULL
),
toks0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
gr AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[i:i+{span_k - 1}], ' ') AS gram
  FROM toks0, LATERAL unnest(generate_series(1, len(t) - {span_k - 1}))
       AS u(i)
  WHERE len(t) >= {span_k}
),
occ AS (
  SELECT doc_id, pos,
    COUNT(*) OVER (PARTITION BY gram) AS n_occ,
    ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM gr
),
exc AS (SELECT doc_id, pos FROM occ WHERE n_occ >= 2 AND rn > 1),
tokpos AS (
  SELECT doc_id, i, t[i] AS tok, len(t) AS n
  FROM toks0, LATERAL unnest(generate_series(1, len(t))) AS u(i)
),
cut AS (
  SELECT DISTINCT tk.doc_id, tk.i
  FROM tokpos tk JOIN exc e2
    ON e2.doc_id = tk.doc_id
   AND tk.i BETWEEN e2.pos AND e2.pos + {span_k - 1}
),
clean AS (
  SELECT tk.doc_id,
    COALESCE(string_agg(
      CASE WHEN c2.i IS NULL THEN tk.tok END, ' ' ORDER BY tk.i),
      '') AS text,
    CAST(MAX(tk.n) AS BIGINT) AS n_tokens_before,
    CAST(COUNT(*) FILTER (WHERE c2.i IS NOT NULL) AS BIGINT)
      AS n_tokens_cut
  FROM tokpos tk
  LEFT JOIN cut c2 ON c2.doc_id = tk.doc_id AND c2.i = tk.i
  GROUP BY tk.doc_id
),
{_UNIGRAM_ON_CLEAN},
dtoks AS (
  SELECT doc_id, i AS pos, t[i] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM clean),
       LATERAL unnest(generate_series(1, len(t))) AS u(i)
),
encdoc AS (
  SELECT d.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(COALESCE(b.n, 1)) AS BIGINT) AS n_pieces,
    string_agg(COALESCE(b.seg, d.word), ' ' ORDER BY d.pos) AS encoded
  FROM dtoks d LEFT JOIN r2best b USING (word)
  GROUP BY d.doc_id
),
packdoc AS (
  SELECT doc_id, n_pieces,
    CAST(len(string_split(replace(encoded, '|', ' '), ' ')) AS BIGINT)
      AS n_tokens
  FROM encdoc
),
packed AS (
  SELECT doc_id, n_pieces, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      0) AS BIGINT) AS start_offset
  FROM packdoc
)
"""

# DuckDB inlines CTEs: without materialization every reference
# re-evaluates its upstream chain, and the LSH band self-join alone
# fans the HTML-extraction regexes out 8x (measured 50s at sf0.01 vs
# <1s materialized). Recursive CTEs (lab, paths) must stay inline.
_MATERIALIZE_CTES = (
    "raw", "h", "cleaned", "norms", "extok", "gm", "corpus",
    "toks", "sh", "sig", "bands", "cands", "sset", "sizes", "inter",
    "vpairs", "e", "und", "gnodes", "und2", "dropids", "surv",
    "toks0", "gr", "occ", "exc", "tokpos", "cut", "clean",
    "words", "subs", "c0", "full_segs", "min_m", "cand",
    "cand_pieces", "r1scored", "r1best", "c1", "r2scored", "r2best",
    "dtoks", "encdoc", "packdoc", "packed",
)


def _materialize(sql: str) -> str:
    import re

    for name in _MATERIALIZE_CTES:
        pat = re.compile(rf"(?m)^{name} AS \(")
        found = pat.findall(sql)
        assert len(found) == 1, (name, len(found))
        sql = pat.sub(f"{name} AS MATERIALIZED (", sql)
    return sql


def build_capstone_ctes(
    span_k: int = SPAN_K,
    cc_rounds: int = _CC_ROUNDS,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> str:
    return _materialize(
        _capstone_ctes_raw(span_k, cc_rounds, num_hashes, bands)
    )


def build_capstone_sql(
    span_k: int = SPAN_K,
    context_len: int = CONTEXT_LEN,
    cc_rounds: int = _CC_ROUNDS,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> str:
    return (
        build_capstone_ctes(span_k, cc_rounds, num_hashes, bands)
        + f"""
SELECT p.doc_id,
  cl.n_tokens_before,
  cl.n_tokens_cut,
  p.n_pieces,
  p.start_offset,
  CAST(p.start_offset // {context_len} AS BIGINT) AS bin_id,
  CAST(p.start_offset % {context_len} AS BIGINT) AS offset_in_bin
FROM packed p JOIN clean cl USING (doc_id)
"""
    )


def build_capstone_funnel_sql(
    span_k: int = SPAN_K,
    context_len: int = CONTEXT_LEN,
    cc_rounds: int = _CC_ROUNDS,
    num_hashes: int = NUM_HASHES,
    bands: int = BANDS,
) -> str:
    return (
        build_capstone_ctes(span_k, cc_rounds, num_hashes, bands)
        + f"""
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM raw) AS n_raw,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM extok) AS n_extracted,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_quality,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_canonical,
  (SELECT CAST(COUNT(*) FILTER (WHERE n_tokens_cut > 0) AS BIGINT)
     FROM clean) AS n_docs_excised,
  (SELECT CAST(SUM(n_tokens_before) AS BIGINT) FROM clean)
    AS tokens_before,
  (SELECT CAST(SUM(n_tokens_cut) AS BIGINT) FROM clean) AS tokens_cut,
  (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM packdoc) AS total_pieces,
  (SELECT CAST((SUM(n_tokens) + {context_len - 1}) // {context_len}
     AS BIGINT) FROM packdoc) AS n_bins
"""
    )


CAPSTONE_SQL = build_capstone_sql()

CAPSTONE_FUNNEL_SQL = build_capstone_funnel_sql()

QUERIES = [
    Query(
        "curation_capstone",
        curation_capstone_q,
        CAPSTONE_SQL,
        "end-to-end curation ladder (extract -> quality -> cluster-dedup -> span-excise -> tokenize -> pack): per-document final manifest",
    ),
    Query(
        "curation_capstone_funnel",
        curation_capstone_funnel_q,
        CAPSTONE_FUNNEL_SQL,
        "end-to-end curation ladder: single-row per-stage attrition report",
    ),
]
