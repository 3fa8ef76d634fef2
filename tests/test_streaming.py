"""Structured Streaming: windowed aggs match their batch twins; incremental
reader honors the high-water mark (SURVEY §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_hubspot_spark.sources.catalog import load_table
from mcp_hubspot_spark.streaming import (
    IncrementalReader,
    hourly_counts_stream,
    session_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    """Re-materialize events as a parquet dir usable as a file-stream
    source (the testdata file itself is a single file; a stream source
    needs a directory)."""
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, SF, "events").write.parquet(d)
    return d


def _run_stream_to_memory(spark, stream_df, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_hourly_stream_matches_batch(spark, events_stream_dir):
    batch = load_table(spark, SF, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    got = _run_stream_to_memory(
        spark, hourly_counts_stream(stream), "hourly_mem"
    )
    expected = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    g = {(r.window_start, r.event_type): r.n for r in got.collect()}
    e = {(r.window_start, r.event_type): r.n for r in expected.collect()}
    assert g == e and len(g) > 0


def test_session_stream_matches_batch(spark, events_stream_dir):
    batch = load_table(spark, SF, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    got = _run_stream_to_memory(spark, session_stream(stream), "session_mem")
    expected = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )
    g = {(r.session_start, r.user_id): r.n_events for r in got.collect()}
    e = {(r.session_start, r.user_id): r.n_events for r in expected.collect()}
    assert g == e and len(g) > 0


def test_incremental_reader_high_water_mark(spark, tmp_path):
    events = load_table(spark, SF, "events")
    rd = IncrementalReader(str(tmp_path / "state.json"), ts_col="ts")

    first = rd.read_increment(events)
    n_total = events.count()
    assert first.count() == n_total  # no mark yet → everything
    rd.commit(first)

    second = rd.read_increment(events)
    assert second.count() == 0  # nothing new after commit

    # new data past the mark is picked up
    newer = events.withColumn("ts", F.col("ts") + F.expr("INTERVAL 40 DAY"))
    assert rd.read_increment(newer).count() == n_total

    # failed batch (no commit) → re-read (at-least-once)
    assert rd.read_increment(newer).count() == n_total
    rd.commit(newer)
    assert rd.read_increment(newer).count() == 0


def test_running_user_totals_stateful(spark, tmp_path):
    """applyInPandasWithState: state accumulates across micro-batches —
    totals after two single-file batches equal the batch aggregate."""
    from mcp_hubspot_spark.streaming.stateful import running_user_totals

    events = load_table(spark, SF, "events").filter(F.col("user_id") < 5)
    d = tmp_path / "ev"
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.subtract(half)
    half.coalesce(1).write.parquet(str(d / "b1"))
    other.coalesce(1).write.parquet(str(d / "b2"))
    # two files, one per trigger → two micro-batches through the state
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per batch: the LAST emit per key
    # is the running total
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.table("totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("total_value").alias("total_value"))
        .collect()
    }
    want = {
        r.user_id: (r.n, round(r.t, 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_first_seen_dedup_stream(spark, tmp_path):
    """Stateful dedup emits exactly one row per key across batches."""
    from mcp_hubspot_spark.streaming.stateful import first_seen_dedup

    events = load_table(spark, SF, "events").filter(F.col("user_id") < 10)
    d = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(d / "b1"))
    events.coalesce(1).write.parquet(str(d / "b2"))  # same keys again
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        first_seen_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("dedup").collect()
    assert len(rows) == len({r.user_id for r in rows})  # one emit per key
    assert {r.user_id for r in rows} == {
        r.user_id for r in events.select("user_id").distinct().collect()
    }


def test_stream_embed_to_store_and_search(spark, tmp_path):
    """End-to-end: document stream → pandas-UDF embedding → foreachBatch
    append into the date-partitioned store → kNN search sees the rows
    (the reference's embed-and-index side effect as a streaming job)."""
    from mcp_hubspot_spark.streaming.ingest import stream_embed_to_store
    from mcp_hubspot_spark.vector_store import VectorStore

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 30)
    d = tmp_path / "docs"
    docs.coalesce(1).write.parquet(str(d / "b1"))
    store = VectorStore(spark, str(tmp_path / "vs"))
    stream = spark.readStream.schema(docs.schema).parquet(str(d) + "/*")
    q = stream_embed_to_store(
        stream, store, checkpoint_dir=str(tmp_path / "ckpt"), dim=16
    )
    q.awaitTermination(120)
    stored = store.load()
    assert stored.count() == 30
    assert {f.name for f in stored.schema.fields} >= {
        "date", "vec_id", "embedding", "type", "data_json"
    }
    # a stored vector must find itself as its own nearest neighbor
    probe = [float(x) for x in stored.filter(F.col("vec_id") == 3).first().embedding]
    top = store.search(probe, k=1).collect()[0]
    assert top.vec_id == 3 and top.similarity > 0.99


def test_lag_sessionization_agrees_with_session_window(spark):
    """Two independent sessionization definitions — session_window (state
    machine) and lag→running-sum (window composition) — must produce the
    same per-user session counts for the same 30-min gap."""
    from mcp_hubspot_spark.workload import QUERIES

    lag_based = {
        r.user_id: r.n_sessions
        for r in QUERIES["events_sessionized"](spark, SF).collect()
    }
    events = load_table(spark, SF, "events")
    sw = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    native = {r.user_id: r.n_sessions for r in sw.collect()}
    assert lag_based == native


def test_stream_stream_interval_join_matches_batch(spark, events_stream_dir):
    """The watermarked stream-stream interval join must produce exactly
    the pairs the equivalent batch join produces (click→purchase within
    30 min per user), once the availableNow run drains."""
    from mcp_hubspot_spark.streaming import interval_join_stream

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("user_id_r"),
            F.col("ts").alias("ts_r"),
            F.col("event_id").alias("buy_id"),
        )
        return clicks, buys

    batch = spark.read.parquet(events_stream_dir)
    bc, bb = split(batch)
    expected = {
        (r.click_id, r.buy_id)
        for r in bc.join(
            bb,
            (bc.user_id == bb.user_id_r)
            & (bb.ts_r >= bc.ts)
            & (bb.ts_r <= bc.ts + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert expected, "fixture must produce at least one pair"

    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    sc, sb = split(stream)
    sb = sb.withColumnRenamed("user_id_r", "user_id")
    joined = interval_join_stream(
        sc, sb, key="user_id", left_ts="ts", right_ts="ts_r"
    )
    q = (
        joined.select("click_id", "buy_id")
        .writeStream.format("memory")
        .queryName("ssjoin_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.click_id, r.buy_id) for r in spark.table("ssjoin_mem").collect()}
    assert got == expected


def test_watermarked_dedup_stream(spark, tmp_path):
    """Built-in dropDuplicatesWithinWatermark twin of first_seen_dedup:
    exactly one surviving row per key across micro-batches."""
    from mcp_hubspot_spark.streaming.stateful import watermarked_dedup

    events = load_table(spark, SF, "events").filter(F.col("user_id") < 10)
    d = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(d / "b1"))
    events.coalesce(1).write.parquet(str(d / "b2"))  # same keys again
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        watermarked_dedup(stream)
        .writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("wm_dedup").collect()
    assert len(rows) == len({r.user_id for r in rows})
    assert {r.user_id for r in rows} == {
        r.user_id for r in events.select("user_id").distinct().collect()
    }


def test_streaming_kmv_agrees_with_batch_sketch(spark, tmp_path):
    """Incremental KMV: after the stream drains, each key's final estimate
    equals the batch sketch over the same rows — merging bottom-k sets
    across micro-batches loses nothing the batch pass keeps."""
    from mcp_hubspot_spark.operators.sketch import kmv_distinct
    from mcp_hubspot_spark.streaming.stateful import streaming_kmv_distinct

    events = load_table(spark, SF, "events")
    d = tmp_path / "ev"
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.subtract(half)
    half.coalesce(1).write.parquet(str(d / "b1"))
    other.coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_kmv_distinct(stream, k=32)
        .writeStream.format("memory")
        .queryName("kmv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: n_sketch and est_distinct are both monotonically
    # nondecreasing across merges, so max per key = the final emission
    got = {
        r.event_type: (r.n_sketch, round(r.est_distinct, 6))
        for r in spark.table("kmv")
        .groupBy("event_type")
        .agg(
            F.max("n_sketch").alias("n_sketch"),
            F.max("est_distinct").alias("est_distinct"),
        )
        .collect()
    }
    want = {
        r.event_type: (r.n_sketch, round(r.est_distinct, 6))
        for r in kmv_distinct(events, ["event_type"], "user_id", k=32).collect()
    }
    assert got == want


def test_transform_with_state_topk_agrees_with_batch(spark, tmp_path):
    """Spark-4 transformWithStateInPandas: per-key bounded top-k state
    across micro-batches equals the batch top-k over the same rows.
    The new-API state server speaks protobuf; skip where the lib is
    absent (operator stays import-clean either way)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )
    from mcp_hubspot_spark.streaming.transform_state import (
        streaming_topk_values,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = load_table(spark, SF, "events").filter(F.col("user_id") < 8)
        d = tmp_path / "ev"
        half = events.filter(F.col("event_id") % 2 == 0)
        other = events.subtract(half)
        half.coalesce(1).write.parquet(str(d / "b1"))
        other.coalesce(1).write.parquet(str(d / "b2"))
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d) + "/*")
        )
        q = (
            streaming_topk_values(stream, k=3)
            .writeStream.format("memory")
            .queryName("tws_topk")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode: the per-key topk only improves; element-wise max of
        # emissions per key is unnecessary — take the LAST emission, which
        # is the lexicographically largest sorted-desc list
        emitted = spark.table("tws_topk").collect()
        last: dict[int, list[float]] = {}
        for r in emitted:
            cand = [round(float(x), 6) for x in r.topk]
            if r.user_id not in last or cand >= last[r.user_id]:
                last[r.user_id] = cand
        want = {
            r.user_id: [round(float(x), 6) for x in r.tk]
            for r in events.groupBy("user_id")
            .agg(
                F.slice(
                    F.sort_array(F.collect_list(F.col("value").cast("double")), asc=False),
                    1,
                    3,
                ).alias("tk")
            )
            .collect()
        }
        assert last == want
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_static_enrich_matches_batch(spark, events_stream_dir):
    """Stream-static broadcast join: streaming events decorated with a
    static user-segment dim agree with the batch join, and the stateless
    join needs no watermark (append mode, no state store)."""
    from mcp_hubspot_spark.streaming import enrich_stream

    batch = load_table(spark, SF, "events")
    dim = (
        batch.select("user_id").distinct()
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    )
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    enriched = enrich_stream(
        stream.select("event_id", "user_id"), dim, on="user_id"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.event_id, r.segment) for r in spark.table("enrich_mem").collect()}
    exp = {
        (r.event_id, r.segment)
        for r in batch.select("event_id", "user_id").join(dim, "user_id").collect()
    }
    assert got == exp and len(got) > 0


def test_stream_merge_to_table(spark, tmp_path):
    """foreachBatch streaming MERGE: file-streamed updates land in the
    SnapshotTable with upsert semantics and the final state equals the
    batch merge of the same updates."""
    from mcp_hubspot_spark.sources.snapshot_table import SnapshotTable
    from mcp_hubspot_spark.streaming.ingest import stream_merge_to_table

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(i, "base") for i in range(10)], "id long, payload string"
    )
    t.create(base, keys=["id"], n_buckets=4)
    upd_dir = str(tmp_path / "updates")
    spark.createDataFrame(
        [(3, "streamed"), (11, "streamed-new")], "id long, payload string"
    ).write.parquet(upd_dir)
    stream = spark.readStream.schema("id long, payload string").parquet(upd_dir)
    q = stream_merge_to_table(stream, t, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {(r.id, r.payload) for r in t.read().collect()}
    exp = {(i, "base") for i in range(10) if i != 3} | {
        (3, "streamed"), (11, "streamed-new")
    }
    assert got == exp


def test_stream_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """Per-micro-batch drift log: a batch drawn from the reference
    distribution scores near zero; a shifted batch scores high."""
    from mcp_hubspot_spark.streaming.monitor import (
        histogram_fractions,
        stream_drift_monitor,
    )
    from pyspark.sql import functions as F

    ref_df = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    ref = histogram_fractions(ref_df, "v", bucket_width=10.0, max_bucket=20)
    src = str(tmp_path / "src")
    # batch A: same distribution; batch B: shifted by +150 (all clamp);
    # written as two plain files so maxFilesPerTrigger=1 yields 2 batches
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src, exist_ok=True)
    vals = [float(i % 100) for i in range(1000)]
    pq.write_table(pa.table({"v": vals}), src + "/a.parquet")
    pq.write_table(
        pa.table({"v": [v + 150 for v in vals]}), src + "/b.parquet"
    )
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    log = str(tmp_path / "log")
    q = stream_drift_monitor(
        stream, ref, "v", bucket_width=10.0, max_bucket=20,
        log_path=log, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    logged = spark.read.parquet(log).collect()
    drifts = sorted(r.l1_drift for r in logged)
    assert len(logged) >= 2
    assert drifts[0] < 0.05      # in-distribution batch
    assert drifts[-1] > 1.0      # fully shifted batch (disjoint support)
    # the smoothed-PSI column (online twin of operators.profiling
    # .psi_drift) ranks the batches the same way, and the disjoint-
    # support batch lands deep in "drifted" (> 0.25 by convention)
    psis = sorted(r.psi for r in logged)
    assert psis[0] < 0.01
    assert psis[-1] > 0.25
    # the ks column (online twin of operators.profiling.ks_drift) is
    # the sup cumulative-fraction distance: ~0 in-distribution, 1.0 for
    # disjoint support (every batch bucket clamps past the reference)
    kss = sorted(r.ks for r in logged)
    assert kss[0] < 0.01
    assert kss[-1] == 1.0
    # exact batch-twin agreement on the identical bucketed data: batch A
    # IS the reference population, so its cumulative fractions match the
    # reference's bucket-for-bucket and ks is exactly 0
    assert kss[0] == 0.0


def test_histogram_fractions_empty_reference_raises(spark):
    import pytest
    from mcp_hubspot_spark.streaming.monitor import histogram_fractions

    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="reference is empty"):
        histogram_fractions(empty, "v", bucket_width=10.0, max_bucket=5)


def test_stream_drift_agrees_with_batch_query(spark, tmp_path):
    """Batch/stream twin agreement (mirrors the KMV agreement test): the
    streaming monitor's L1 score over the post-split orders, against a
    reference histogram of the pre-split orders, equals the batch
    orders_value_drift query's total L1 on the identical split."""
    from mcp_hubspot_spark.streaming.monitor import (
        histogram_fractions,
        stream_drift_monitor,
    )
    from mcp_hubspot_spark.workload import orders_value_drift

    orders = load_table(spark, SF, "orders")
    split = F.lit("1998-07-01").cast("timestamp")
    ref = histogram_fractions(
        orders.filter(F.col("o_orderdate") < split).select(
            F.col("o_totalprice").alias("v")
        ),
        "v", bucket_width=50000.0, max_bucket=10,
    )
    cur_dir = str(tmp_path / "cur")
    orders.filter(F.col("o_orderdate") >= split).select(
        F.col("o_totalprice").cast("double").alias("v")
    ).coalesce(1).write.parquet(cur_dir)
    stream = spark.readStream.schema("v double").parquet(cur_dir)
    log = str(tmp_path / "log")
    q = stream_drift_monitor(
        stream, ref, "v", bucket_width=50000.0, max_bucket=10,
        log_path=log, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    stream_l1 = [r.l1_drift for r in spark.read.parquet(log).collect()]
    assert len(stream_l1) == 1  # one micro-batch = the whole current side

    batch_rows = orders_value_drift(spark, SF).collect()
    t_ref = sum(r.n_ref for r in batch_rows)
    t_cur = sum(r.n_cur for r in batch_rows)
    batch_l1 = round(
        sum(abs(r.n_cur / t_cur - r.n_ref / t_ref) for r in batch_rows), 6
    )
    assert stream_l1[0] == batch_l1


def test_streaming_quantile_sketch_agrees_with_batch(spark, tmp_path):
    """After the stream drains, each key's FINAL emission (max upd)
    matches the batch bottom-m hash-sample quantiles over the same rows
    bit-for-bit — the union-closure of the deterministic sample."""
    from mcp_hubspot_spark.operators.sketch import hash_sample_quantiles
    from mcp_hubspot_spark.streaming.stateful import streaming_quantile_sketch

    events = load_table(spark, SF, "events")
    d = tmp_path / "ev"
    half = events.filter(F.col("event_id") % 2 == 0)
    events.subtract(half).coalesce(1).write.parquet(str(d / "b2"))
    half.coalesce(1).write.parquet(str(d / "b1"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    qs = [0.5, 0.9]
    q = (
        streaming_quantile_sketch(stream, qs=qs, m=64)
        .writeStream.format("memory")
        .queryName("qsk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("qsk").collect()
    max_upd: dict = {}
    for r in rows:
        max_upd[r.event_type] = max(max_upd.get(r.event_type, 0), r.upd)
    got = {
        (r.event_type, r.q): (r.n_sample, r.value)
        for r in rows
        if r.upd == max_upd[r.event_type]
    }
    for et in [r.event_type for r in events.select("event_type").distinct().collect()]:
        want = {
            r.q: r.value
            for r in hash_sample_quantiles(
                events.filter(F.col("event_type") == et),
                "event_id", "value", qs=qs, m=64,
            ).collect()
        }
        for qq, wv in want.items():
            n, v = got[(et, qq)]
            assert v == wv, (et, qq, v, wv)
            assert n <= 64


def test_streaming_cms_agrees_with_batch_sketch(spark, tmp_path):
    """Incremental CMS: cell-wise sums are order-independent, so the
    drained per-row state equals the batch cms_build over the same
    rows CELL FOR CELL (n_batches identifies the final emission)."""
    from mcp_hubspot_spark.operators.sketch import cms_build
    from mcp_hubspot_spark.streaming.stateful import streaming_cms

    events = load_table(spark, SF, "events")
    d = tmp_path / "ev"
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.subtract(half)
    half.coalesce(1).write.parquet(str(d / "b1"))
    other.coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    depth, width = 4, 64
    q = (
        streaming_cms(stream, term_col="event_type", depth=depth, width=width)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("cms_stream").collect()
    assert rows
    last_batch = max(r.n_batches for r in rows)
    got = {}
    for r in rows:
        if r.n_batches == max(
            x.n_batches for x in rows if x.row_idx == r.row_idx
        ):
            got[r.row_idx] = list(r.cells)
    assert set(got) == set(range(depth)) and last_batch >= 2
    tc = events.groupBy(F.col("event_type").alias("term")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    want = {j: [0] * width for j in range(depth)}
    for r in cms_build(tc, depth=depth, width=width).collect():
        want[r.row_idx][r.bucket] = r.cell_count
    assert got == want


def test_streaming_seasonal_stats_agrees_with_batch(spark, tmp_path):
    """Welford/Chan per-cell stats: after the stream drains, every
    (dow, hod) cell's running (n, mean, std) matches the batch
    groupBy mean/stddev_samp on the same rows to float tolerance."""
    from mcp_hubspot_spark.streaming.stateful import streaming_seasonal_stats

    events = load_table(spark, SF, "events")
    d = tmp_path / "ev"
    half = events.filter(F.col("event_id") % 2 == 0)
    other = events.subtract(half)
    half.coalesce(1).write.parquet(str(d / "b1"))
    other.coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_seasonal_stats(stream)
        .writeStream.format("memory")
        .queryName("seas")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: n is monotonically nondecreasing → max n per cell is
    # the final state; take that row's mean/std
    rows = spark.table("seas").collect()
    final = {}
    for r in rows:
        cur = final.get((r.dow, r.hod))
        if cur is None or r.n > cur.n:
            final[(r.dow, r.hod)] = r
    want = {
        (r.dow, r.hod): r
        for r in events.select(
            F.dayofweek("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
            F.col("value").cast("double").alias("v"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("mean"),
            F.stddev("v").alias("std"),
        )
        .collect()
    }
    assert set(final) == set(want) and len(want) > 10
    for cell, g in final.items():
        w = want[cell]
        assert g.n == w.n
        assert abs(g.mean - w.mean) < 1e-9
        if w.std is None:
            # n=1 cells: sample std undefined — BOTH sides emit NULL
            assert g.std is None and g.n == 1
        else:
            assert abs(g.std - w.std) < 1e-9


def test_streaming_minhash_state_agrees_with_batch(spark, tmp_path):
    """Incremental per-key MinHash: after the stream drains, each key's
    final signature equals the batch elementwise-min of the SAME
    per-document signatures (min over a union of shingle sets = min of
    mins), and n_docs equals the key's row count — merging across
    micro-batches loses nothing."""
    from mcp_hubspot_spark.operators.dedup import minhash_signature
    from mcp_hubspot_spark.streaming.stateful import (
        streaming_minhash_signature,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    )
    d = tmp_path / "docs"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        str(d / "b1")
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        str(d / "b2")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_minhash_signature(stream, num_perm=8)
        .writeStream.format("memory")
        .queryName("mhsig")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: every signature position is monotonically
    # NONINCREASING across merges and n_docs nondecreasing, so the
    # elementwise min / max per key recover the final emission
    got_rows = (
        spark.table("mhsig")
        .select("key", "n_docs", F.posexplode("sig").alias("pos", "v"))
        .groupBy("key", "pos")
        .agg(F.min("v").alias("v"), F.max("n_docs").alias("n_docs"))
        .collect()
    )
    got_sig: dict = {}
    got_n: dict = {}
    for r in got_rows:
        got_sig.setdefault(r.key, {})[r.pos] = r.v
        got_n[r.key] = max(got_n.get(r.key, 0), r.n_docs)
    got = {
        k: [v for _, v in sorted(pos.items())] for k, pos in got_sig.items()
    }
    want_rows = (
        docs.select(
            F.col("source").cast("string").alias("key"),
            F.posexplode(
                minhash_signature(F.col("text"), num_perm=8)
            ).alias("pos", "v"),
        )
        .groupBy("key", "pos")
        .agg(F.min("v").alias("v"))
        .collect()
    )
    want_sig: dict = {}
    for r in want_rows:
        want_sig.setdefault(r.key, {})[r.pos] = r.v
    want = {
        k: [v for _, v in sorted(pos.items())]
        for k, pos in want_sig.items()
    }
    assert got == want
    want_n = {
        r.key: r.n
        for r in docs.groupBy(F.col("source").cast("string").alias("key"))
        # count(text): NULL-text rows carry no shingles and are not
        # counted in n_docs (none exist in this corpus, but the contract
        # is pinned separately by the noop-batch test below)
        .agg(F.count("text").alias("n"))
        .collect()
    }
    assert got_n == want_n


@pytest.mark.slow
def test_stream_span_dedup_drained_equals_batch(spark, tmp_path):
    """Streaming exact-substring dedup over a persisted shingle index:
    stream the documents corpus in three micro-batches from an EMPTY
    index — the union of all batches' span outputs (within-batch pairs
    + new-vs-persisted pairs) must equal one batch repeated_spans run
    over the full corpus EXACTLY, row for row (every pair's matched
    shingles meet in exactly one batch's join, orientation is by id)."""
    from mcp_hubspot_spark.operators.dedup import repeated_spans
    from mcp_hubspot_spark.streaming.span_dedup import stream_span_dedup

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    d = tmp_path / "docs"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = stream_span_dedup(
        stream,
        index_path=str(tmp_path / "idx"),
        spans_path=str(tmp_path / "spans"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=16,
        min_tokens=24,
    )
    q.awaitTermination(180)
    cols = [
        "doc_a", "doc_b", "a_start", "a_end", "b_start", "b_end", "n_tokens"
    ]
    got = sorted(
        tuple(r) for r in spark.read.parquet(
            str(tmp_path / "spans")
        ).select(*cols).collect()
    )
    want = sorted(
        tuple(r)
        for r in repeated_spans(
            docs, k=16, min_tokens=24
        ).select(*cols).collect()
    )
    assert got == want and len(want) > 0


@pytest.mark.slow
def test_span_batch_replay_is_idempotent(spark, tmp_path):
    """The round-9 review finding, pinned: foreachBatch redelivers a
    batch after a crash between the writes and the checkpoint commit.
    Replaying process_span_batch with the SAME batch_id must leave the
    persisted index and the span log byte-identical to a single
    delivery (overwrite-mode per-batch partitions) — under the old
    append design the replay doubled the batch's index rows, and
    duplicated matched positions fragmented the diagonal merge into
    truncated spans that poisoned every later batch."""
    from mcp_hubspot_spark.streaming.span_dedup import process_span_batch

    shared = " ".join(f"tok{i}" for i in range(20))
    b0 = spark.createDataFrame(
        [(0, f"{shared} zero tail"), (1, "unrelated text one")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(2, f"prefix two {shared}")], "doc_id long, text string"
    )
    ip, sp = str(tmp_path / "idx"), str(tmp_path / "spans")
    kw = dict(index_path=ip, spans_path=sp, k=16)

    process_span_batch(b0, 0, **kw)
    process_span_batch(b0, 0, **kw)  # REPLAY of batch 0
    process_span_batch(b1, 1, **kw)
    process_span_batch(b1, 1, **kw)  # replay of batch 1 too

    cols = ["doc_a", "doc_b", "a_start", "a_end", "b_start", "b_end",
            "n_tokens"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(sp).select(*cols).collect()
    )
    # exactly ONE maximal 20-token span between docs 0 and 2 — no
    # duplicates, no truncated fragments, despite both replays
    assert got == [(0, 2, 0, 19, 2, 21, 20)]
    # the index holds each (doc, pos) exactly once
    idx = spark.read.parquet(ip)
    assert idx.count() == idx.select("doc_id", "pos").distinct().count()


_SPAN_COLS = [
    "doc_a", "doc_b", "a_start", "a_end", "b_start", "b_end", "n_tokens"
]


def _max_df_corpus(spark):
    """Five docs over three batches: a 20-token BOILERPLATE prefix in
    every doc (shingle df grows 2 -> 3 -> 5 across batches, crossing
    max_df=3 only at the LAST batch — the retro-scrub trigger) plus a
    20-token UNIQUE span shared by docs 0 and 2 only (df 2, survives
    the cap)."""
    boiler = " ".join(f"boil{i}" for i in range(20))
    uniq = " ".join(f"uniq{i}" for i in range(20))
    rows = [
        (0, f"{boiler} x0 {uniq}"),
        (1, f"{boiler} y1 onlyone"),
        (2, f"{boiler} z2 {uniq} tail2"),
        (3, f"{boiler} w3 other"),
        (4, f"{boiler} v4 more"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batches = [
        docs.filter(F.col("doc_id").isin(0, 1)),
        docs.filter(F.col("doc_id") == 2),
        docs.filter(F.col("doc_id").isin(3, 4)),
    ]
    return docs, batches


@pytest.mark.slow
def test_stream_span_dedup_max_df_drained_equals_batch(spark, tmp_path):
    """The round-9 documented gap, closed: the corpus-global max_df
    stop-shingle cap maintained INCREMENTALLY. The boilerplate shingles
    cross the cap only at the last batch — batches 0 and 1 have already
    emitted boilerplate spans by then, so equality with the batch
    operator REQUIRES the retro scrub of earlier span partitions. After
    the drain: output == repeated_spans(max_df=3) exactly (only the
    unique 0-2 span survives), and != the uncapped run (the cap did
    real work)."""
    from mcp_hubspot_spark.operators.dedup import repeated_spans
    from mcp_hubspot_spark.streaming.span_dedup import stream_span_dedup

    docs, batches = _max_df_corpus(spark)
    d = tmp_path / "docs"
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = stream_span_dedup(
        stream,
        index_path=str(tmp_path / "idx"),
        spans_path=str(tmp_path / "spans"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=16,
        max_df=3,
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "spans"))
        .select(*_SPAN_COLS)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in repeated_spans(docs, k=16, max_df=3)
        .select(*_SPAN_COLS)
        .collect()
    )
    assert got == want and len(want) > 0
    uncapped = sorted(
        tuple(r)
        for r in repeated_spans(docs, k=16).select(*_SPAN_COLS).collect()
    )
    assert got != uncapped  # the cap removed the boilerplate pairs
    # the surviving span is the unique 0-2 pair only
    assert {(r[0], r[1]) for r in got} == {(0, 2)}


@pytest.mark.slow
def test_span_batch_max_df_replay_and_retro_scrub_idempotent(spark, tmp_path):
    """Replaying the batch that TRIGGERED a retro scrub must leave
    index, stats, and every span partition identical to a single
    delivery — the rewrites are pure functions of (index, stop set),
    so redelivery redoes them bit-for-bit."""
    from mcp_hubspot_spark.operators.dedup import repeated_spans
    from mcp_hubspot_spark.streaming.span_dedup import process_span_batch

    docs, batches = _max_df_corpus(spark)
    ip, sp = str(tmp_path / "idx"), str(tmp_path / "spans")
    kw = dict(index_path=ip, spans_path=sp, k=16, max_df=3)
    process_span_batch(batches[0], 0, **kw)
    process_span_batch(batches[1], 1, **kw)
    # BEFORE the cap crosses (df(boiler)=3 <= max_df), the boilerplate
    # spans are legitimately present — so equality after batch 2 proves
    # the retro scrub actually REMOVED emitted rows, not that the cap
    # never emitted them
    mid_pairs = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(sp).select("doc_a", "doc_b").collect()
    }
    assert mid_pairs == {(0, 1), (0, 2), (1, 2)}
    process_span_batch(batches[2], 2, **kw)
    # batch 2 crossed the cap and scrubbed partitions 0 and 1; replay it
    process_span_batch(batches[2], 2, **kw)
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(sp).select(*_SPAN_COLS).collect()
    )
    want = sorted(
        tuple(r)
        for r in repeated_spans(docs, k=16, max_df=3)
        .select(*_SPAN_COLS)
        .collect()
    )
    assert got == want and len(want) > 0
    # stats bookkeeping: one row per (batch, shingle), counts sum to
    # the index's total position count
    idx = spark.read.option("basePath", ip).parquet(ip)
    stats = spark.read.parquet(f"{ip}/_shingle_stats")
    assert stats.agg(F.sum("cnt")).first()[0] == idx.count()


def test_cross_index_spans_orientation_and_disjoint_quadrants(spark):
    """Operator-level contract of cross_index_spans: pair orientation
    is by doc id regardless of which side a doc arrived on (an old doc
    with the HIGHER id still lands in doc_b), and output matches
    repeated_spans on the union corpus restricted to cross pairs."""
    from mcp_hubspot_spark.operators.dedup import (
        cross_index_spans,
        repeated_spans,
        token_shingle_index,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    old = spark.createDataFrame(
        [(5, f"{shared} old tail")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, f"new head {shared}"), (9, "nothing shared here at all")],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in cross_index_spans(
            token_shingle_index(old, 8), token_shingle_index(new, 8), 8
        ).collect()
    )
    both = old.unionByName(new)
    want = sorted(
        tuple(r)
        for r in repeated_spans(both, 8)
        .filter(  # cross pairs only: {2,5} — within-side pairs excluded
            (F.col("doc_a") == 2) & (F.col("doc_b") == 5)
        )
        .collect()
    )
    assert got == want and len(got) == 1
    # orientation: the NEW doc (id 2) is doc_a because its id is lower
    assert got[0][0] == 2 and got[0][1] == 5


def test_streaming_minhash_skips_noop_batches(spark, tmp_path):
    """A micro-batch containing ONLY NULL-text rows for an existing key
    must not re-emit that key's unchanged (n_docs, sig) row: n_docs
    cannot have moved (every non-NULL row increments it), so a second
    emission would surface as a spurious 'update' downstream. Batch 1
    seeds the key; batch 2 is all-NULL for the same key — exactly one
    output row total."""
    from mcp_hubspot_spark.streaming.stateful import (
        streaming_minhash_signature,
    )

    d = tmp_path / "docs"
    schema = "doc_id long, source string, text string"
    spark.createDataFrame(
        [(1, "web", "alpha beta gamma delta"), (2, "web", "beta gamma")],
        schema,
    ).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(
        [(3, "web", None), (4, "web", None)], schema
    ).coalesce(1).write.parquet(str(d / "b2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        streaming_minhash_signature(stream, num_perm=8)
        .writeStream.format("memory")
        .queryName("mhsig_noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("mhsig_noop").collect()
    assert len(out) == 1  # the NULL-only batch emitted nothing
    assert out[0].key == "web" and out[0].n_docs == 2


@pytest.mark.slow
def test_seeded_stop_stats_skip_retro_storm(spark, tmp_path):
    """seed_stop_stats pre-settles the max_df cap from a corpus sample:
    on the retro-storm corpus (boilerplate crosses the cap only at the
    LAST batch when unseeded), a seeded run performs ZERO retroactive
    partition rewrites — the stop set already contains the boilerplate
    at batch 0 — and the drain still equals the batch operator."""
    from mcp_hubspot_spark.operators.dedup import repeated_spans
    from mcp_hubspot_spark.streaming.span_dedup import (
        process_span_batch,
        seed_stop_stats,
    )

    docs, batches = _max_df_corpus(spark)
    ip, sp = str(tmp_path / "idx"), str(tmp_path / "spans")
    # sample: four pure-boilerplate docs — their shingle counts alone
    # (4 each) already exceed max_df=3, so the cap is settled upfront
    boiler = " ".join(f"boil{i}" for i in range(20))
    sample = spark.createDataFrame(
        [(100 + i, boiler) for i in range(4)], "doc_id long, text string"
    )
    seed_stop_stats(sample, ip, k=16)
    seed_stop_stats(sample, ip, k=16)  # re-seeding replaces, no double
    rewrites = []
    for i, b in enumerate(batches):
        out = process_span_batch(
            b, i, index_path=ip, spans_path=sp, k=16, max_df=3
        )
        rewrites += out["retro_rewrites"]
    assert rewrites == []  # the storm never started
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(sp).select(*_SPAN_COLS).collect()
    )
    want = sorted(
        tuple(r)
        for r in repeated_spans(docs, k=16, max_df=3)
        .select(*_SPAN_COLS)
        .collect()
    )
    assert got == want and {(r[0], r[1]) for r in got} == {(0, 2)}


@pytest.mark.slow
def test_seed_stop_stats_k_mismatch_fails_loud(spark, tmp_path):
    """seed_stop_stats persists its shingle width beside the stats; a
    stream running with a different k must fail instead of silently
    ignoring the seed (mismatched-k counts key different shingles —
    ADVICE r11). A matching k passes; an unseeded stream is unaffected."""
    import pytest

    from mcp_hubspot_spark.streaming.span_dedup import (
        process_span_batch,
        seed_stop_stats,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    ip, sp = str(tmp_path / "idx"), str(tmp_path / "spans")
    seed_stop_stats(docs, ip, k=4)
    with pytest.raises(ValueError, match="seeded with k=4"):
        process_span_batch(docs, 0, index_path=ip, spans_path=sp, k=8, max_df=3)
    # matching width proceeds; so does a cap-free stream (no stats read)
    process_span_batch(docs, 0, index_path=ip, spans_path=sp, k=4, max_df=3)
    ip2, sp2 = str(tmp_path / "idx2"), str(tmp_path / "spans2")
    process_span_batch(docs, 0, index_path=ip2, spans_path=sp2, k=8, max_df=3)


@pytest.mark.slow
def test_stream_docs_to_text_index_equals_rebuild(spark, tmp_path):
    """Streaming append-only ingest rides the TextIndex epoch machinery
    (one epoch per micro-batch): after the drain, BM25 served from the
    streamed index must be score-identical to one build over the full
    corpus — df from postings, stats bumped exactly once per batch."""
    from mcp_hubspot_spark.streaming.ingest import stream_docs_to_text_index
    from mcp_hubspot_spark.text_index import TextIndex
    from mcp_hubspot_spark.workload import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seed = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    d = tmp_path / "in"
    for i in (1, 2):
        rest.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    ix = TextIndex(spark, str(tmp_path / "ix"))
    ix.build(seed)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = stream_docs_to_text_index(
        stream, ix, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    full = TextIndex(spark, str(tmp_path / "full"))
    full.build(docs)
    terms = ["spark", "merge", "hash"]
    got = [
        (r.doc_id, round(r.score, 9))
        for r in ix.search(terms, k=10).collect()
    ]
    want = [
        (r.doc_id, round(r.score, 9))
        for r in full.search(terms, k=10).collect()
    ]
    assert got == want and len(got) == 10


@pytest.mark.slow
def test_stream_ingest_auto_compact_bounds_epochs(spark, tmp_path):
    """Round-12 epoch hygiene e2e: with max_epochs=1 the ingest folds
    after every batch, so the live epoch-partition count stays bounded
    (<= 2: the fold + at most one fresh add) while the drained index
    stays score-identical to a full rebuild — the policy-triggered
    compact is pinned equivalent to the uncompacted stream."""
    from mcp_hubspot_spark.streaming.ingest import stream_docs_to_text_index
    from mcp_hubspot_spark.text_index import TextIndex
    from mcp_hubspot_spark.workload import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    seed = docs.filter(F.col("doc_id") % 4 == 0)
    rest = docs.filter(F.col("doc_id") % 4 != 0)
    d = tmp_path / "in"
    for i in (1, 2, 3):
        rest.filter(F.col("doc_id") % 4 == i).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    ix = TextIndex(spark, str(tmp_path / "ix"))
    ix.build(seed)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = stream_docs_to_text_index(
        stream, ix, checkpoint_dir=str(tmp_path / "ckpt"), max_epochs=1
    )
    q.awaitTermination(120)
    assert ix._n_epoch_dirs() == 1  # drained: last batch folded too
    full = TextIndex(spark, str(tmp_path / "full"))
    full.build(docs)
    terms = ["spark", "merge", "hash"]
    got = [
        (r.doc_id, round(r.score, 9))
        for r in ix.search(terms, k=10).collect()
    ]
    want = [
        (r.doc_id, round(r.score, 9))
        for r in full.search(terms, k=10).collect()
    ]
    assert got == want and len(got) == 10
