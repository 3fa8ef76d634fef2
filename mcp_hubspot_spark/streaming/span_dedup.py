"""Streaming exact-substring (token-span) dedup — the incremental twin
of ``operators.dedup.repeated_spans`` (round-8 batch family).

Why foreachBatch and not a stateful operator: a standing per-key shingle
index is UNBOUNDED state (every position of every document ever seen),
so the honest streaming shape is the incremental_lsh_dedup quadrant
discipline over a PERSISTED index — each micro-batch of new documents

  1. writes its own positional shingle index to a per-batch partition
     (``batch=<id>``, overwrite mode — replays are IDEMPOTENT: a batch
     that crashed after writing simply overwrites the same partition,
     never double-appends),
  2. detects within-batch spans by self-joining the just-written index
     (new x new quadrant, no re-tokenization),
  3. detects new-vs-corpus spans with one shingle equi-join against the
     EARLIER batch partitions (new x old; partition pruning on
     ``batch < id`` keeps a replayed batch from pairing against its own
     rows — the old x old quadrant was settled when those docs streamed
     in),
  4. writes the union to the span log's own ``batch=<id>`` partition
     (overwrite — the output is exactly-once per batch, no downstream
     dedup needed).

The union of all batches' span outputs equals one batch
``repeated_spans`` run over the same documents EXACTLY (pair
orientation is by doc id, every pair's matched shingles meet in exactly
one batch's join) — pinned by the e2e drain test.

Scale shape per batch: the batch index is computed ONCE (written, then
read back for both joins — the tokenize+posexplode that dominates batch
cost is never repeated); the increment side is small → AQE broadcasts
it into the cross join; the persisted corpus index is scanned but never
shuffled; the diagonal merge windows only matched rows. The persisted
index grows linearly with the corpus — at 100 TB keep it additionally
hash-bucketed by shingle (bucketed parquet) so the per-batch join
prunes to matching buckets instead of scanning the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    cross_index_spans,
    index_repeated_spans,
    token_shingle_index,
)


def process_span_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    spans_path: str,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int | None = None,
) -> None:
    """One micro-batch's work (module-level so the replay-idempotency
    contract is directly testable: calling it twice with the same
    batch_id must leave index and span output byte-identical to one
    call — foreachBatch redelivers exactly this way after a crash
    between the writes and the checkpoint commit)."""
    spark = batch_df.sparkSession
    # 1. the batch index lands FIRST, in its own overwrite-mode
    # partition — the single tokenization pass; everything below
    # reads it back instead of recomputing it
    token_shingle_index(batch_df, k, id_col, text_col).write.mode(
        "overwrite"
    ).parquet(f"{index_path}/batch={int(batch_id)}")
    idx_all = spark.read.option("basePath", index_path).parquet(index_path)
    cols = [id_col, "pos", "shingle"]
    idx_batch = idx_all.filter(F.col("batch") == int(batch_id)).select(
        *cols
    )
    idx_old = idx_all.filter(F.col("batch") < int(batch_id)).select(*cols)
    out = index_repeated_spans(idx_batch, k, min_tokens=min_tokens)
    out = out.unionByName(
        cross_index_spans(idx_old, idx_batch, k, min_tokens=min_tokens)
    )
    # 4. overwrite-mode per-batch span partition: replaying the
    # batch rewrites the identical rows — exactly-once output
    out.write.mode("overwrite").parquet(
        f"{spans_path}/batch={int(batch_id)}"
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
    persisted positional shingle index, partitioned by micro-batch id
    (seed it from an existing corpus by writing
    ``token_shingle_index(corpus, k)`` to ``index_path/batch=-1``, or
    start empty); ``spans_path`` accumulates spans in
    ``repeated_spans`` output shape plus the ``batch`` partition
    column. Returns the StreamingQuery handle.

    The corpus-global ``max_df`` / ``hash_shingles`` knobs of the batch
    operator are deliberately absent: a stop-shingle cap needs
    corpus-wide frequencies, which an increment cannot see — at scale,
    maintain a standing stop-shingle list beside the index and
    anti-join it into both sides instead.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_span_batch(
            batch_df,
            batch_id,
            index_path=index_path,
            spans_path=spans_path,
            k=k,
            id_col=id_col,
            text_col=text_col,
            min_tokens=min_tokens,
        )

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
