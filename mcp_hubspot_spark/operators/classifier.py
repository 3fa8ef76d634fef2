"""Hashed-feature linear text classifier scoring (fasttext-tier).

The quality-classifier stage of a training-data pipeline (FineWeb-Edu /
CCNet style): a linear model over hashed bag-of-token features, served
at corpus scale to score every document. The reference engine has no
model-scoring surface at all (its closest analog is the embedding hook,
reference src/mcp_server_hubspot/server.py:81-87); this module is part
of the beyond-reference LLM-pipeline mandate.

Two physical paths for the same model, mirroring the literal-vs-join
split the ADC serving family established (operators/vector.py):

- ``classifier_score_expr`` — weights derived ON THE FLY from the token
  hash (the "hashing trick with hash-seeded weights" form). Pure
  expression tree: tokenize -> per-token weight via ``F.transform`` ->
  ``F.aggregate`` mean -> sigmoid. ZERO shuffle, zero join; the whole
  score is computed inside the scan's project. Used to pin agreement
  and as the no-weight-table smoke path.
- ``classifier_score`` — the SERVING path for a TRAINED model: weight
  table (bucket, weight) broadcast-joined against exploded token
  buckets, mean-aggregated per doc, sigmoid at the edge. This is the
  shape that scales: the weight table is O(num_buckets) and broadcast
  once; the explode is narrow (no shuffle); the per-doc mean is a
  hash aggregate whose partial (sum, count) runs map-side, so the one
  shuffle moves ~one row per document, not one per token. At 100 TB
  the only knob is ``spark.sql.shuffle.partitions`` for the final agg.

Weight-table sizes: 2^12-2^20 buckets x 8 bytes is 32 KB-8 MB —
comfortably under any broadcast threshold. A model too wide to
broadcast (>100M buckets) should flip the join to a shuffle hash join
by keying BOTH sides on bucket; not implemented because no text
classifier at this tier is that wide.

Hashing is md5-based (first 15 hex digits as a 60-bit long, the
engine-portable idiom shared with operators/dedup.py:99) so a SQL
oracle replays bucketing and weights bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .text import tokens

__all__ = [
    "hash_bucket",
    "hashed_weight_table",
    "classifier_score",
    "classifier_score_expr",
    "classifier_train",
    "binary_auc",
    "calibration_task",
]


def hash_bucket(token: Column, num_buckets: int) -> Column:
    """Feature-hash a token to ``[0, num_buckets)`` — md5-based so both
    engines (and any retraining job) agree on the bucketing."""
    return (
        F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")
        % F.lit(num_buckets)
    )


def _hash_weight(bucket: Column, seed: str) -> Column:
    """Deterministic pseudo-random weight in [-1, 1] for a bucket id:
    ``((md5num(seed:bucket) % 2001) - 1000) / 1000``. Stands in for a
    trained weight vector in tests/oracles; real deployments pass their
    trained table to :func:`classifier_score` instead."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), bucket.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return ((h % 2001) - 1000).cast("double") / F.lit(1000.0)


def hashed_weight_table(
    spark: SparkSession, num_buckets: int, seed: str = "clf"
) -> DataFrame:
    """(bucket, weight) table with hash-seeded weights — the stand-in
    for a trained model checkpoint. Distributed ``spark.range`` (never a
    driver-side list: at 2^20 buckets that would be a 1M-row
    createDataFrame through py4j)."""
    return spark.range(num_buckets).select(
        F.col("id").alias("bucket"),
        _hash_weight(F.col("id"), seed).alias("weight"),
    )


def _sigmoid(x: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    bias: float = 0.0,
) -> DataFrame:
    """Score every document with a linear model over hashed token
    features: ``sigmoid(bias + mean(weight[bucket(token)]))``.

    ``weights`` is the trained model: (bucket BIGINT, weight DOUBLE).
    Missing buckets contribute 0 (left join + coalesce), matching the
    sparse-weight convention. Documents with no tokens score
    ``sigmoid(bias)``.

    Plan shape (pytest-audited): Scan -> Generate(explode, narrow) ->
    BroadcastHashJoin(weight table) -> partial HashAggregate (map-side
    sum/count) -> ONE Exchange on the doc id -> final HashAggregate ->
    Project(sigmoid). The token fan-out never crosses the network.
    """
    toks = df.select(
        F.col(id_col),
        # lowercased before hashing, like the rest of the text family
        # and the SQL oracles' tokenizer — case variants of a word must
        # land in one feature bucket
        F.explode_outer(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    ).select(
        id_col,
        F.when(
            F.col("_tok").isNotNull(), hash_bucket(F.col("_tok"), num_buckets)
        ).alias("bucket"),
    )
    joined = toks.join(F.broadcast(weights), "bucket", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("bucket").cast("long").alias("n_toks"),
        F.coalesce(
            F.sum(F.coalesce("weight", F.lit(0.0))), F.lit(0.0)
        ).alias("_wsum"),
    )
    mean = F.when(
        F.col("n_toks") > 0, F.col("_wsum") / F.col("n_toks")
    ).otherwise(F.lit(0.0))
    return per_doc.select(
        id_col,
        "n_toks",
        _sigmoid(F.lit(float(bias)) + mean).alias("score"),
    )


def classifier_score_expr(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    seed: str = "clf",
    bias: float = 0.0,
) -> DataFrame:
    """Zero-shuffle expression twin of :func:`classifier_score` with
    hash-seeded weights: per-token weights via ``F.transform``, mean via
    ``F.aggregate``, sigmoid in the same project. No explode, no join,
    no Exchange — one narrow pass over the scan (pytest-audited).

    Only valid for the hash-derived weight family (a trained table
    cannot be folded into an expression without the literal-bloat
    failure mode SCALE_r10 characterized for ADC serving); agreement
    with the join path on that family is pytest-pinned.
    """
    toks = tokens(F.lower(F.col(text_col)))
    wsum = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + _hash_weight(hash_bucket(t, num_buckets), seed),
    )
    n = F.coalesce(F.size(toks), F.lit(0))
    mean = F.when(n > 0, wsum / n).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_toks"),
        _sigmoid(F.lit(float(bias)) + mean).alias("score"),
    )


def classifier_train(
    df: DataFrame,
    *,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    lr: float = 0.5,
    epochs: int = 2,
    seed: int = 13,
    shuffle: bool = False,
    num_parts: int | None = None,
) -> DataFrame:
    """Train the (bucket, weight) table :func:`classifier_score` serves:
    distributed logistic regression over hashed bag-of-token features by
    PARALLEL SGD WITH PARAMETER AVERAGING (the one-pass "parameter
    mixing" recipe of Zinkevich et al. 2010 / Mann et al. 2009, the
    standard fasttext-tier trainer shape) — each partition runs local
    SGD over its documents from the shared starting weights, and the
    per-partition models merge by example-weighted averaging. The model
    matches serving exactly: a doc's feature vector is the MEAN of its
    token buckets (md5 ``hash_bucket``, case-folded tokens), so
    ``classifier_score(df, classifier_train(labeled))`` is the
    train→serve loop with no representation skew.

    Scale shape: one ``mapInPandas`` pass per epoch (Arrow-batched,
    local numpy SGD, ONE output row per partition carrying the
    num_buckets-double weight vector and its example count), and the
    merge is a DISTRIBUTED posexplode + weighted-average aggregate —
    the O(num_buckets x partitions) intermediate never lands on the
    driver. Only the merged O(num_buckets) table is collected between
    epochs (and only when ``epochs > 1``) to re-seed the next pass —
    the same parameter-server-step memory any trainer pays. Label
    column must be 0/1.

    Returns a sparse (bucket BIGINT, weight DOUBLE) table (zero-weight
    buckets dropped — :func:`classifier_score` treats missing as 0).

    ``shuffle=True`` orders examples by ``xxhash64(id, seed)`` (one
    range repartition + in-partition sort per training run, reused by
    every epoch) — the minibatch-shuffling step SGD convergence theory
    assumes. Deterministic: same (data, seed, partitioning) trains the
    same model. Default off: clustered input order is the honest
    baseline and the planted-task pytests pin both modes.

    ``num_parts`` sets the number of training partitions — the
    AVERAGING GRANULARITY, which the round-12 calibration grid
    (SCALE_r12 ``classifier_cal_*``, numpy-replicated in
    ``tests/test_operators.py``) measured as the knob that actually
    governs convergence on feature-correlated tasks: local SGD
    decorrelates confounded features only within a partition, so AUC
    on the shadow-token task falls monotonically with partition count
    (P=1: 0.51→0.67 over 1→4 epochs; P=16: flat at ~0.47) while
    within-partition ORDER moves it at noise level. Fewer partitions =
    better convergence but less parallelism; pick by corpus size. When
    unset, shuffle preserves the INPUT's partition count — r11's
    unparameterized ``repartitionByRange`` let AQE coalesce the small
    shuffle to ONE partition, silently serializing training (and
    making the r11 "shuffle" AUC really a sequential-SGD AUC); an
    explicit count is AQE-exempt. The plan-time ``getNumPartitions``
    is metadata-only, no job.
    """
    import numpy as np
    import pandas as pd

    toks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda x: x != ""
    )
    cols = [
        F.col(label_col).cast("double").alias("_y"),
        F.transform(toks, lambda t: hash_bucket(t, num_buckets)).alias(
            "_b"
        ),
    ]
    if shuffle:
        cols.append(
            F.xxhash64(
                F.col(id_col).cast("string"), F.lit(int(seed))
            ).alias("_ord")
        )
    feats = df.select(*cols).filter(F.size("_b") > 0)
    if shuffle:
        n_parts = int(num_parts or feats.rdd.getNumPartitions())
        feats = (
            feats.repartitionByRange(n_parts, "_ord")
            .sortWithinPartitions("_ord")
            .drop("_ord")
        )
    elif num_parts is not None:
        feats = feats.repartition(int(num_parts))

    def _epoch(w0: "np.ndarray"):
        def fit(batches):
            w = w0.copy()
            seen = 0
            for pdf in batches:
                for y, buckets in zip(pdf["_y"], pdf["_b"]):
                    b = np.asarray(buckets, dtype=np.int64)
                    x = 1.0 / len(b)
                    z = float(w[b].sum()) * x
                    p = 1.0 / (1.0 + np.exp(-z))
                    # duplicate buckets in one doc accumulate (.at),
                    # matching the mean-of-occurrences serving feature
                    np.subtract.at(w, b, lr * (p - y) * x)
                    seen += 1
            if seen:
                yield pd.DataFrame({"w": [w.tolist()], "n": [seen]})

        return fit

    w0 = np.zeros(num_buckets, dtype=np.float64)
    merged = None
    for ep in range(max(1, int(epochs))):
        if ep > 0:
            # re-seed the next pass from the merged model: O(model)
            # driver memory, the parameter-server step
            w0 = np.zeros(num_buckets, dtype=np.float64)
            for r in merged.collect():
                w0[int(r.bucket)] = float(r.weight)
        parts = feats.mapInPandas(
            _epoch(w0), schema="w array<double>, n long"
        )
        merged = (
            parts.select(
                F.posexplode("w").alias("bucket", "_wv"), F.col("n")
            )
            .groupBy("bucket")
            .agg(
                (
                    F.sum(F.col("_wv") * F.col("n")) / F.sum("n")
                ).alias("weight")
            )
        )
    return merged.filter(F.col("weight") != 0.0).select(
        F.col("bucket").cast("long"), "weight"
    )


def binary_auc(
    df: DataFrame,
    *,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """ROC AUC for a binary classifier by the Mann-Whitney pair count,
    computed over DISTINCT score values: per-score (n_pos, n_neg)
    aggregates first (map-side partial), then one window over the
    distinct-score rows accumulates negatives-below, and ties
    contribute half (the standard mid-rank convention). Returns one row
    (n_pos, n_neg, auc).

    Scale: the window runs over |distinct scores| rows, not documents —
    already reduced by the aggregate; for continuous scores at extreme
    corpus sizes, quantize the score column first (standard binned-AUC
    practice) to bound the distinct count.
    """
    from pyspark.sql.window import Window

    per_score = (
        df.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("double").alias("_np"),
            F.sum(1 - F.col("_y")).cast("double").alias("_nn"),
        )
    )
    w = (
        Window.orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = per_score.select(
        "_np",
        "_nn",
        (F.sum("_nn").over(w) - F.col("_nn")).alias("_below"),
    ).select(
        "_np",
        "_nn",
        (F.col("_np") * (F.col("_below") + F.col("_nn") / 2)).alias("_u"),
    )
    # fail loud on a single-class input: n_pos*n_neg = 0 would make the
    # division return null, which a metrics harness records as None/NaN
    # silently (ADVICE r11). raise_error keeps the operator lazy — the
    # check rides the same one-row aggregate, no extra plan-time job.
    return contrib.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.when(
            (F.sum("_np") == 0) | (F.sum("_nn") == 0),
            F.raise_error(
                "binary_auc: input has a single class "
                "(AUC undefined without both positives and negatives)"
            ),
        )
        .otherwise(F.sum("_u") / (F.sum("_np") * F.sum("_nn")))
        .alias("auc"),
    )


def calibration_task(
    docs: DataFrame,
    *,
    nsig: int = 24,
    p_inv: int = 5,
    thresh: int = 6,
    noise_inv: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 1000,
) -> DataFrame:
    """Deterministic MULTI-SIGNAL planted labeling task for trainer
    calibration (r11 verdict #4: the single-dominant-feature noisy task
    saturated in one pass, so 1-vs-2 epochs and shuffled-vs-clustered
    order all landed on the same AUC — it proved the knobs run, not
    that they work).

    Construction (a pure function of ids, fully replayable):

    - signal token ``sig<j>`` present iff
      ``xxhash64(id, seed+j) % p_inv == 0`` (~nsig/p_inv weak signals
      per doc, diluted among the doc's ordinary tokens by the
      mean-of-buckets feature);
    - SHADOW token ``sha<j>`` present whenever ``sig<j>`` is, PLUS in
      a ``1/(p_inv-1)`` background of unrelated docs — a label-
      correlated CONFOUNDER whose optimal weight (conditional on its
      signal) is ~0. One-pass SGD from zero init scores by class-
      frequency difference, which the shadows poison; unlearning them
      requires repeated interleaved passes — this is what makes the
      task discriminate training knobs at all (without confounders,
      one pass already ranks at the task ceiling: AUC is invariant to
      the weight scaling further passes mostly add);
    - clean label = ``#signals >= thresh`` (majority-of-weak-signals,
      no single bucket can carry it); ``1/noise_inv`` of labels flip.

    What the grid over this task measured (numpy-replicated, pinned):
    AVERAGING GRANULARITY governs convergence — AUC at 4 epochs falls
    0.670 / 0.509 / 0.471 as partitions go 1 / 4 / 16, epochs help
    roughly in proportion to per-partition sequential work, and
    within-partition ORDER (id-sorted vs label-sorted vs shuffled)
    moves AUC at noise level for this trainer, because each local
    pass revisits all its examples every epoch.

    Returns (id_col, text_col, label): text with signal and shadow
    tokens appended, label int 0/1.
    """
    sig_pred = [
        F.pmod(
            F.xxhash64(F.col(id_col), F.lit(int(seed + j))),
            F.lit(int(p_inv)),
        )
        == 0
        for j in range(nsig)
    ]
    sig_arr = F.array(
        *[F.when(sig_pred[j], F.lit(f"sig{j}")) for j in range(nsig)]
    )
    sha_arr = F.array(
        *[
            F.when(
                sig_pred[j]
                | (
                    F.pmod(
                        F.xxhash64(
                            F.col(id_col), F.lit(int(seed + 1000 + j))
                        ),
                        F.lit(int(p_inv - 1)),
                    )
                    == 0
                ),
                F.lit(f"sha{j}"),
            )
            for j in range(nsig)
        ]
    )
    sigs = F.filter(sig_arr, lambda x: x.isNotNull())
    shas = F.filter(sha_arr, lambda x: x.isNotNull())
    clean = (F.size(sigs) >= int(thresh)).cast("int")
    flip = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(777)), F.lit(int(noise_inv)))
        == 0
    )
    label = F.when(flip, 1 - clean).otherwise(clean)
    return docs.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.col(text_col), F.concat_ws(" ", sigs), F.concat_ws(" ", shas)
        ).alias(text_col),
        label.alias("label"),
    )
