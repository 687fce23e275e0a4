"""Vectorized Pandas UDFs — the gated Python path.

Rule of the engine: built-in ``pyspark.sql.functions`` first (JVM,
whole-stage codegen); Arrow-batched ``@pandas_udf`` ONLY where the
logic genuinely needs Python (here: as reference implementations and
for logic that would need a library, e.g. a real BPE tokenizer).
Row-at-a-time ``F.udf`` never — it is 10-100x slower than these.

Each UDF has a built-in-expression twin in operators/text.py; tests
assert equivalence, which is the promotion path: prototype in pandas,
promote to expressions when the operator becomes hot.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from map_reduce_project_spark.operators.text import BPE_PATTERN, EN_STOPWORDS

_BPE_RE = re.compile(BPE_PATTERN)


@pandas_udf(LongType())
def token_count_udf(text: pd.Series) -> pd.Series:
    """BPE-ish token count (pandas twin of operators.text.bpe_token_count)."""
    return text.map(lambda t: len(_BPE_RE.findall(t)))


@pandas_udf(DoubleType())
def en_stopword_ratio_udf(text: pd.Series) -> pd.Series:
    """English function-word density (twin of the language-ID score)."""
    stop = set(EN_STOPWORDS)

    def ratio(t: str) -> float:
        toks = t.split(" ")
        return sum(tok in stop for tok in toks) / len(toks)

    return text.map(ratio)


@pandas_udf(DoubleType())
def quality_score_pandas(text: pd.Series) -> pd.Series:
    """Composite quality score (twin of operators.text.quality_score)."""
    stop = set(EN_STOPWORDS)

    def score(t: str) -> float:
        toks = t.split(" ")
        n_tokens = len(toks)
        if n_tokens < 5:
            return 0.0
        n_chars = len(t)
        n_punct = n_chars - len(re.sub(r"[^a-zA-Z0-9 ]", "", t))
        distinct_ratio = len(set(toks)) / n_tokens
        if distinct_ratio < 0.1:
            return 0.0
        stop_ratio = sum(tok in stop for tok in toks) / n_tokens
        punct_ratio = n_punct / n_chars
        return distinct_ratio * 0.5 + stop_ratio * 0.25 + (1.0 - punct_ratio) * 0.25

    return text.map(score)
