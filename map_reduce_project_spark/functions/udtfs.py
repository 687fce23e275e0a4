"""Python UDTFs — the one-row-to-many-rows Python escape hatch.

Same engine rule as udfs.py: built-in generator expressions
(explode/posexplode over transform/sequence) first — they run JVM-side
inside whole-stage codegen. A UDTF executes Python per input row, so
it is the LAST resort, for fan-out logic that genuinely needs Python
(a real tokenizer library, a parser). ``chunk_document`` here is the
API-surface reference implementation; its built-in-expression twin
``operators.text.chunk_documents`` is the production path, and both
sit under the same DuckDB oracle (``text_chunks`` /
``text_chunks_udtf`` queries) proving them equivalent row-for-row.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx bigint, chunk string, n_tokens bigint")
class ChunkDocument:
    """Fixed-size overlapping token windows over one document.

    Chunk i covers tokens [i*stride, i*stride + size); the last chunk
    starts at the largest multiple of ``stride`` still inside the
    document, so every token lands in at least one chunk and chunks
    overlap by ``size - stride`` tokens — the standard context-window
    chunking for embedding / pretraining pipelines.
    """

    def eval(self, text: str, size: int, stride: int):
        toks = (text or "").split(" ")
        n = len(toks)
        n_chunks = max((n - size + stride - 1) // stride, 0) + 1
        for i in range(n_chunks):
            window = toks[i * stride : i * stride + size]
            yield i, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register every UDTF for SQL/LATERAL use on this session."""
    spark.udtf.register("chunk_document", ChunkDocument)
