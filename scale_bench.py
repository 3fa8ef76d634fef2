"""Scale benchmark: the LLM-pipeline operators at 40× the sf0.1 corpus
(200k documents / 80k embeddings), emitted as a JSON artifact so scale
claims are reproducible instead of builder-reported prose.

Corpus construction is deterministic: each source document is replicated
``copies`` times with a per-copy suffix mutation, so the dedup operators
see realistic NEAR-duplicates (high-Jaccard, non-identical), not exact
copies; embeddings get a per-copy deterministic perturbation on one
dimension. Everything is materialized to parquet first so the measured
time is the OPERATOR, not the corpus synthesis.

Methodology matches bench.py: noop-write materialization, warmed JVM and
Python worker pool, two runs per operator with the steady-state (second)
run as the headline and the cold run preserved alongside.

Usage: python scale_bench.py [--copies 40] → prints one JSON line and
writes SCALE_r{N}.json when --out is given.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

from mcp_hubspot_spark.operators.dedup import (
    connected_components,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    semantic_contamination_matmul,
    simhash_fingerprints,
)
from mcp_hubspot_spark.operators.sampling import (
    hash_stratified_sample,
    per_group_cap,
    temperature_mixture,
    weighted_sample,
)
from mcp_hubspot_spark.operators.sketch import (
    bloom_prefiltered_contamination,
    cms_build,
    cms_estimate,
    hash_sample_quantiles,
    kmv_distinct,
)
from mcp_hubspot_spark.operators.text import (
    bm25_scores,
    bpe_learn_merges,
    dedup_lines_keep_first,
    greedy_pack_docs,
    pack_sequences,
    quality_features,
    remove_boilerplate_lines,
    repetition_features,
)
from mcp_hubspot_spark.operators.vector import knn, knn_batch_matmul
from mcp_hubspot_spark.session import get_spark
from mcp_hubspot_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.1"


def build_corpus(spark, work: Path, copies: int) -> tuple[str, str]:
    """Materialize the replicated corpus; returns (docs_path, embs_path)."""
    docs = load_table(spark, SF_DIR, "documents")
    copy = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy")
    big_docs = (
        docs.select("*", copy)
        .select(
            (F.col("doc_id") * copies + F.col("copy")).alias("doc_id"),
            # near-dup, not exact-dup: each copy gets a distinct short
            # suffix, so shingle sets overlap heavily but differ
            F.concat(
                F.col("text"), F.lit(" variant "), F.col("copy").cast("string")
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 9).alias("n_chars"),
        )
        .repartition(32)
    )
    embs = load_table(spark, SF_DIR, "embeddings")
    dim_idx = F.pmod(F.col("copy"), F.lit(16)).cast("int")
    big_embs = (
        embs.select("*", copy)
        .select(
            (F.col("vec_id") * copies + F.col("copy")).alias("vec_id"),
            # deterministic tiny perturbation of one dimension per copy:
            # copies of a vector stay mutual near-neighbors
            F.transform(
                "embedding",
                lambda x, i: x
                + F.when(i == dim_idx, F.col("copy") * 1e-4).otherwise(0.0),
            ).cast("array<float>").alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    dp, ep = str(work / "documents"), str(work / "embeddings")
    big_docs.write.mode("overwrite").parquet(dp)
    big_embs.write.mode("overwrite").parquet(ep)
    return dp, ep


def _cms_roundtrip(docs):
    """Build the CMS over the full token stream, then estimate every
    distinct term's frequency against it (the worst-case probe load)."""
    from mcp_hubspot_spark.operators.text import tokens

    toks = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).filter(F.col("term") != "")
    tc = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    sketch = cms_build(tc, depth=4, width=1024)
    return cms_estimate(sketch, tc.select("term"), depth=4, width=1024)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=40)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(10_000).repartition(64).mapInPandas(
        _noop, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    work = Path(tempfile.mkdtemp(prefix="scale_bench_"))
    try:
        dp, ep = build_corpus(spark, work, args.copies)
        docs = spark.read.parquet(dp)
        embs = spark.read.parquet(ep)
        n_docs, n_embs = docs.count(), embs.count()
        probe = [
            float(x)
            for x in embs.filter(F.col("vec_id") == 0).first().embedding
        ]
        queries = [
            (int(r.vec_id), [float(x) for x in r.embedding])
            for r in embs.filter(F.col("vec_id") < 32).collect()
        ]

        def lsh_pairs():
            return minhash_lsh_pairs(docs, num_perm=16, bands=4)

        cases = {
            "minhash_lsh_pairs_200k": lsh_pairs,
            "dedup_clusters_200k": lambda: connected_components(
                lsh_pairs().select("id_a", "id_b")
            ),
            "simhash_fingerprints_200k": lambda: simhash_fingerprints(docs),
            # dim inferred from the data — a hardcoded wrong dim NULLs the
            # plane dots and collapses everything into one n² bucket
            "embedding_neardup_lsh_80k": lambda: embedding_neardup_pairs(
                embs, n_planes=12
            ),
            "repetition_features_200k": lambda: repetition_features(docs),
            "quality_features_200k": lambda: quality_features(docs),
            "pack_sequences_200k": lambda: pack_sequences(docs),
            "remove_boilerplate_200k": lambda: remove_boilerplate_lines(docs),
            "knn_l2_80k": lambda: knn(embs, probe, k=10),
            "knn_matmul_32q_80k": lambda: knn_batch_matmul(
                embs, queries, k=10
            ),
            # benchmark = 200 base docs (8k 7-grams); candidates = all 200k
            "bloom_decontaminate_200k": lambda: bloom_prefiltered_contamination(
                docs,
                docs.filter(F.col("doc_id") % 1000 == 0).select("doc_id", "text"),
                n=7,
                num_bits=1 << 18,
            ),
            "kmv_distinct_200k": lambda: kmv_distinct(
                docs, ["lang"], "doc_id", k=256
            ),
            "dedup_lines_keep_first_200k": lambda: dedup_lines_keep_first(docs),
            "bm25_search_200k": lambda: bm25_scores(
                docs, ["spark", "window", "hash"]
            ),
            # TakeOrderedAndProject: 1000 winners out of 200k by A-ES key
            "weighted_sample_200k": lambda: weighted_sample(
                docs, "n_chars", k=1000
            ),
            "temperature_mixture_200k": lambda: temperature_mixture(
                docs, "lang", alpha=0.5
            ),
            "hash_sample_quantiles_200k": lambda: hash_sample_quantiles(
                docs, F.col("doc_id"), "n_chars", qs=[0.5, 0.9, 0.99], m=4000
            ),
            # wordcount shuffle + 1024-cell sketch + broadcast probe of
            # the full vocabulary back against it
            "cms_build_estimate_200k": lambda: _cms_roundtrip(docs),
            # two-phase bottom-k head-domain cap: 20 sources x 200k docs
            "per_group_cap_200k": lambda: per_group_cap(
                docs, "source", "doc_id", k=100
            ),
            # eval set = 2k vecs broadcast against the 80k corpus; the
            # BLAS backend (one matmul per Arrow batch) — the expression
            # variant is the oracle twin and ~50x slower at this |bench|
            "semantic_contamination_80k": lambda: semantic_contamination_matmul(
                embs.filter(F.col("vec_id") % 40 != 0),
                embs.filter(F.col("vec_id") % 40 == 0),
                min_cosine=0.99,
            ),
            # applyInPandas next-fit walk over 32 shards of 200k rows
            "greedy_pack_200k": lambda: greedy_pack_docs(
                docs, "n_chars", capacity=4096, n_shards=32
            ),
        }

        timings: dict[str, float] = {}
        cold: dict[str, float] = {}
        rows: dict[str, int] = {}
        errors: dict[str, str] = {}

        # BPE trains on a hash-sample (counts converge; the documented
        # scale contract) — 4 merges over a ~2.5% deterministic sample
        # of the 200k corpus, timed like the DataFrame cases but via its
        # driver-loop API (returns plain rows, nothing to noop-write)
        def bpe_case():
            sample = hash_stratified_sample(
                docs, "lang", {}, id_col="doc_id", default_rate=0.025
            )
            return bpe_learn_merges(sample, k=4)

        try:
            t0 = time.perf_counter()
            out = bpe_case()
            cold["bpe_merges_5k_sample"] = round(time.perf_counter() - t0, 3)
            t1 = time.perf_counter()
            out = bpe_case()
            timings["bpe_merges_5k_sample"] = round(
                time.perf_counter() - t1, 3
            )
            rows["bpe_merges_5k_sample"] = len(out)
        except Exception as exc:
            errors["bpe_merges_5k_sample"] = f"{type(exc).__name__}: {exc}"[:200]

        for name, fn in cases.items():
            try:
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                cold[name] = round(time.perf_counter() - t0, 3)
                t1 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                timings[name] = round(time.perf_counter() - t1, 3)
                rows[name] = fn().count()
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]

        payload = {
            "metric": "scale_operators_steady_total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "n_docs": n_docs,
            "n_embeddings": n_embs,
            "copies": args.copies,
            "queries": timings,
            "cold_queries": cold,
            "cold_total": round(sum(cold.values()), 3),
            "rows": rows,
        }
        if errors:
            payload["errors"] = errors
        line = json.dumps(payload)
        print(line)
        if args.out:
            Path(args.out).write_text(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
