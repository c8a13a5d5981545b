"""Python UDTFs (SURVEY §2.10 U4 — Spark 4 `pyspark.sql.functions.udtf`).

The reference has no table-valued functions (SURVEY marked U4 "not
planned"), but Spark 4's Python UDTF API makes the surface real engine
capability: a class whose ``eval`` yields zero-or-more rows per input
row, usable as a lateral-join table function in SQL. UDTFs are the
ROW-AT-A-TIME Python path — the slowest tier in this repo's hierarchy
(built-in expressions ≫ Arrow-batched pandas UDFs ≫ UDTFs) — so the
shipped UDTF deliberately mirrors an operator that already exists as a
pure-expression form (`packing.chunk_by_tokens`): the driver query runs
BOTH paths and proves them row-identical, making the UDTF surface
oracle-checkable while documenting that the expression form is what the
100 TB pipeline should run.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk_text string, n_chunk_tokens int")
class ChunkTokensUDTF:
    """Sliding-window token chunking as a table function — the exact
    semantics of ``packing.chunk_by_tokens`` (same normalization, same
    ``1 + ceil((n - size)/stride)`` geometry, one empty chunk for an
    empty document, no rows for a NULL document). Usage (after
    ``spark.udtf.register``)::

        SELECT d.doc_id, c.*
        FROM docs d, LATERAL neulix_chunk_tokens(d.text, 64, 8) c
    """

    def eval(self, text: str, chunk_size: int, overlap: int):
        if text is None:
            return  # match the expression form: explode(NULL) drops the row
        if not 0 <= overlap < chunk_size:
            raise ValueError(
                f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}"
            )
        # Java \s class + space-only strip: Python's re \s is
        # Unicode-aware and would diverge from the expression
        # chunker (packing.py) on NBSP/U+2028/C0 — the same parity
        # class fixed in bpe_segment_pandas (round 10)
        norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip(" ")
        toks = norm.split(" ") if norm else []
        stride = chunk_size - overlap
        n = len(toks)
        n_chunks = (
            1 if n <= chunk_size else (n - chunk_size + stride - 1) // stride + 1
        )
        for i in range(n_chunks):
            part = toks[i * stride : i * stride + chunk_size]
            yield i, " ".join(part), len(part)


def register_udtfs(spark) -> None:
    """Idempotent session registration of the UDTF surface."""
    spark.udtf.register("neulix_chunk_tokens", ChunkTokensUDTF)
