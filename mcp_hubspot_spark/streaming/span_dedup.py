"""Streaming exact-substring (token-span) dedup — the incremental twin
of ``operators.dedup.repeated_spans`` (round-8 batch family).

Why foreachBatch and not a stateful operator: a standing per-key shingle
index is UNBOUNDED state (every position of every document ever seen),
so the honest streaming shape is the incremental_lsh_dedup quadrant
discipline over a PERSISTED index — each micro-batch of new documents

  1. detects within-batch spans with the batch operator itself
     (new x new quadrant),
  2. detects new-vs-corpus spans with one shingle equi-join against the
     persisted positional index (new x old; the old x old quadrant was
     settled when those docs streamed in),
  3. appends its own index rows so later batches see it as corpus.

The union of all batches' span outputs equals one batch
``repeated_spans`` run over the same documents EXACTLY (pair
orientation is by doc id, every pair's matched shingles meet in exactly
one batch's join) — pinned by the e2e drain test. Checkpointing makes
each batch at-least-once; a replayed batch re-appends both its spans
and its index rows, so downstream readers of the span log should
de-duplicate on (doc_a, doc_b, a_start, b_start) if the source can
replay (the standard foreachBatch-append caveat, same as ingest.py).

Scale shape per batch: the increment index is small → AQE broadcasts it
into the join; the persisted corpus index is scanned but never
shuffled; the diagonal merge windows only matched rows. The persisted
index grows linearly with the corpus — at 100 TB keep it hash-bucketed
by shingle (bucketed parquet) so the per-batch join prunes to matching
buckets instead of scanning the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.utils import AnalysisException

from ..operators.dedup import (
    cross_index_spans,
    repeated_spans,
    token_shingle_index,
)


def stream_span_dedup(
    stream_df: DataFrame,
    index_path: str,
    spans_path: str,
    checkpoint_dir: str,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int | None = None,
):
    """Start the streaming span-dedup query. ``index_path`` is the
    persisted positional shingle index (seed it from an existing corpus
    with ``token_shingle_index(corpus, k).write.parquet(index_path)``,
    or start empty); ``spans_path`` accumulates one parquet row per
    detected maximal span, in ``repeated_spans`` output shape. Returns
    the StreamingQuery handle.

    The corpus-global ``max_df`` / ``hash_shingles`` knobs of the batch
    operator are deliberately absent: a stop-shingle cap needs
    corpus-wide frequencies, which an increment cannot see — at scale,
    maintain a standing stop-shingle list beside the index and
    anti-join it into both sides instead.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx_new = token_shingle_index(batch_df, k, id_col, text_col)
        # new x new: the batch operator on the micro-batch itself
        out = repeated_spans(
            batch_df, k, id_col, text_col, min_tokens=min_tokens
        )
        try:
            idx_old = spark.read.parquet(index_path)
            has_index = True
        except AnalysisException:  # first batch, nothing persisted yet
            has_index = False
        if has_index:
            out = out.unionByName(
                cross_index_spans(
                    idx_old, idx_new, k, min_tokens=min_tokens
                )
            )
        out.write.mode("append").parquet(spans_path)
        # append AFTER matching: the batch must not pair against itself
        # through the index (its within-batch pairs came from step 1)
        idx_new.write.mode("append").parquet(index_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
