"""Round-11 diagnosis: where do the 1M-doc capstone quality-stage
seconds go (round-10 verdict item 5 — 68 s of the 149-191 s funnel)?

Decomposes the stage into (a) the pure gopher_rules expression term
(aggregate over the rule verdicts, no join, nothing materialized),
(b) the semi-join + localCheckpoint materialization term, and probes
cheaper formulations of the two heaviest expressions:

- alpha_words: per-word `rlike '[a-zA-Z]'` (a regex compile+match per
  token) vs a single `regexp_count` over the whole doc vs per-word
  `translate`-based alpha test.
- n_symbols: two regex `split`s vs literal `replace` length deltas.

Usage: python tools/diag_quality.py [n_docs]    (default 1_000_000)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from map_reduce_project_spark import get_spark  # noqa: E402
from map_reduce_project_spark.operators.text import (  # noqa: E402
    gopher_rules,
)

CAP_VOCAB = 50_000


def synth_docs(spark, n_docs: int):
    """The bench's 1M-capstone corpus (bench.py synth_capstone_docs),
    minus the wrapper — (doc_id, text) with ~37/42-word docs over a
    bounded vocabulary."""
    ids = spark.range(n_docs).select(
        F.col("id"), (F.col("id") * 3).alias("doc_id")
    )
    gid = F.col("id") - (F.col("id") % 10 == 9).cast("long")

    def w(seed, anchor):
        return F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(F.lit(seed), anchor)) % CAP_VOCAB).cast(
                "string"
            ),
        )

    head = (
        [F.lit("the")]
        + [w(j, F.col("id")) for j in range(10)]
        + [w(1000 + j, gid) for j in range(12)]
        + [w(100 + j, F.col("id")) for j in range(22)]
    )
    tail = [w(200 + j, F.col("id")) for j in range(5)]
    full = F.concat_ws(" ", *(head + tail))
    short = F.concat_ws(" ", *head)
    return ids.select(
        "doc_id",
        F.when(F.col("id") % 20 >= 10, short).otherwise(full).alias(
            "text"
        ),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("diag-quality")
    out: dict = {"n_docs": n_docs}

    docs = synth_docs(spark, n_docs).localCheckpoint(eager=True)

    def timed(label, fn, n=2):
        runs = []
        for _ in range(n):
            t = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t, 3))
        out[label] = min(runs)
        print(label, runs, flush=True)

    # (a) pure rules term
    gm = gopher_rules(docs)
    timed(
        "rules_expr_only",
        lambda: gm.agg(
            F.sum(F.col("gopher_pass").cast("long"))
        ).collect(),
    )

    # (b) stage shape as the funnel runs it: rule verdicts -> id set
    # -> semi-join -> localCheckpoint -> count
    def stage():
        qual_ids = gopher_rules(docs).where(
            F.col("pass_word_count")
            & F.col("pass_mean_word_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_alpha_words")
            & (F.col("must_have_stopwords") >= 1)
        ).select("doc_id")
        q = docs.join(qual_ids, "doc_id", "left_semi").localCheckpoint(
            eager=False
        )
        q.count()

    timed("stage_join_checkpoint", stage)

    # ---- expression variants, isolated --------------------------------
    tok = F.split(F.col("text"), " ")
    n = F.size(tok).cast("long")

    timed(
        "alpha_rlike_per_word",
        lambda: docs.agg(
            F.sum(
                F.expr(
                    "size(filter(split(text, ' '), "
                    "w -> w rlike '[a-zA-Z]'))"
                ).cast("long")
            )
        ).collect(),
    )
    timed(
        "alpha_regexp_count_doc",
        lambda: docs.agg(
            F.sum(
                F.expr(
                    "regexp_count(' ' || text, "
                    "' [^ ]*[a-zA-Z]')"
                ).cast("long")
            )
        ).collect(),
    )
    timed(
        "alpha_translate_per_word",
        lambda: docs.agg(
            F.sum(
                F.expr(
                    "size(filter(split(text, ' '), w -> "
                    "length(translate(w, "
                    "'abcdefghijklmnopqrstuvwxyz"
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ', '')) < length(w)))"
                ).cast("long")
            )
        ).collect(),
    )

    timed(
        "symbols_regex_split",
        lambda: docs.agg(
            F.sum(
                (
                    F.size(F.split(F.col("text"), "#", -1))
                    - 1
                    + F.size(F.split(F.col("text"), r"\.\.\.", -1))
                    - 1
                ).cast("long")
            )
        ).collect(),
    )
    timed(
        "symbols_replace_delta",
        lambda: docs.agg(
            F.sum(
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit("#")))
                    + (
                        F.length("text")
                        - F.length(
                            F.replace(F.col("text"), F.lit("..."))
                        )
                    )
                    / 3
                ).cast("long")
            )
        ).collect(),
    )

    # must-have stopwords: 8 literal contains vs one regexp pass
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    from map_reduce_project_spark.operators.text import GOPHER_MUST_HAVE

    timed(
        "stopwords_8_contains",
        lambda: docs.agg(
            F.sum(
                sum(
                    F.when(padded.contains(f" {w} "), 1).otherwise(0)
                    for w in GOPHER_MUST_HAVE
                ).cast("long")
            )
        ).collect(),
    )

    # word-count + mean-word-len only (the cheap rules, as floor)
    timed(
        "wc_mwl_only",
        lambda: docs.agg(
            F.sum(
                (
                    (n >= 50)
                    & (n <= 100_000)
                    & (
                        3 * n
                        <= (F.length("text") - n + 1).cast("long")
                    )
                ).cast("long")
            )
        ).collect(),
    )

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
