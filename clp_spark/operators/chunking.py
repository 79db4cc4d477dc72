"""Token-window document chunking: split each document into fixed-size,
optionally overlapping token windows — the retrieval-chunking step of a
RAG / embedding pipeline (embed chunks, not whole documents) and the
sliding-window step ahead of fixed-context pretraining.

No counterpart in the reference repo (CLP stops at search/agg over logs);
training-data-pipeline extension mandate, same as operators/curation.py.

Scale shape (10^12-doc regime): the whole operator is a single narrow
projection — tokenize, enumerate window starts with `sequence`, explode,
`slice` the token array per start. Zero shuffles, zero Python; output rows
stay co-partitioned with their input document, so a downstream per-chunk
embedding stage starts from whatever partitioning the scan produced.
Catalyst prunes the scan to (id, text). Fan-out is bounded by
ceil(n_tokens / stride) rows per document; `spark.sql.files.
maxPartitionBytes` continues to govern task sizing because the explode is
pipelined inside the same stage as the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]

# whitespace tokenization (NOT the lowercased-alnum rule curation's
# counting ops use): chunk text must preserve the original words so the
# chunk remains readable/embeddable. The class is spelled out rather than
# written \s because the engines' \s disagree at the edge (Java's includes
# vertical tab \x0B, RE2's — DuckDB — does not); the explicit ASCII class
# evaluates identically in both, keeping the operator oracle-portable.
_WS_RE = r"[ \t\n\r\f\x0B]+"


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> one row per token window:
    (doc_id, chunk_idx, chunk_text, n_tokens).

    Window starts are 0, stride, 2*stride, ... while start < n_tokens, so
    every chunk is non-empty and consecutive chunks overlap by
    (chunk_tokens - stride) tokens; the final window may be short.
    Documents with zero tokens produce no rows. chunk_text re-joins the
    window's whitespace tokens with single spaces (runs of whitespace are
    normalized — the chunker's contract is token windows, not byte
    fidelity; byte-exact extraction is the decompression sink's job).

    Deterministic and engine-portable: chunk boundaries depend only on
    (text, chunk_tokens, stride), never on partitioning or cluster width.
    """
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = F.filter(
        F.split(F.col(text_col), _WS_RE), lambda t: t != F.lit("")
    )
    base = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    exploded = base.select(
        "doc_id",
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "_s"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("_s") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s"))
        .cast("long")
        .alias("n_tokens"),
    )
