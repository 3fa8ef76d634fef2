"""Property-based tests (hypothesis): independent oracles for the
operators whose semantics are easiest to get subtly wrong — the as-of join
(vs pandas.merge_asof) and the OR-of-AND predicate compiler (vs a plain
Python evaluator). The reference ships no assertions at all (SURVEY §5);
these are the engine's stronger replacement."""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_key = st.sampled_from(["k1", "k2", "k3"])
_ts = st.integers(min_value=0, max_value=50)

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=25)
_right_rows = st.lists(st.tuples(_key, _ts, st.integers(0, 999)), max_size=25)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    from mcp_hubspot_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, ts long, lid long"
    )
    # de-dup (key, ts) on the right: with duplicate timestamps inside a key
    # both engines pick an arbitrary winner — not a semantics difference
    seen: dict = {}
    for k, t, v in right:
        seen[(k, t)] = v
    right_u = [(k, t, v) for (k, t), v in seen.items()]
    rdf = spark.createDataFrame(
        right_u or [("_none", -1, 0)], "k string, ts long, rv long"
    )
    got = {
        r.lid: r.rv
        for r in asof_join(
            ldf.withColumn("ts", F.timestamp_micros("ts")),
            rdf.withColumn("ts", F.timestamp_micros("ts")),
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rv"],
            how="left",
        ).collect()
    }
    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        right_u or [("_none", -1, 0)], columns=["k", "ts", "rv"]
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
        for r in merged.itertuples()
    }
    assert got == want


_OPS = ["EQ", "NEQ", "GT", "GTE", "LT", "LTE"]
_filter = st.fixed_dictionaries(
    {
        "propertyName": st.sampled_from(["a", "b"]),
        "operator": st.sampled_from(_OPS),
        "value": st.integers(0, 9),
    }
)
_groups = st.lists(st.lists(_filter, min_size=1, max_size=3), min_size=1, max_size=3)


def _py_eval(row: dict, groups: list[list[dict]]) -> bool:
    import operator as op

    fns = {"EQ": op.eq, "NEQ": op.ne, "GT": op.gt, "GTE": op.ge,
           "LT": op.lt, "LTE": op.le}
    return any(
        all(fns[f["operator"]](row[f["propertyName"]], f["value"]) for f in g)
        for g in groups
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(groups=_groups, rows=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30))
def test_filter_groups_match_python_semantics(spark, groups, rows):
    from mcp_hubspot_spark.plans.predicates import compile_filter_groups

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, a long, b long"
    )
    got = {r.id for r in df.filter(compile_filter_groups(groups)).collect()}
    want = {
        i for i, (a, b) in enumerate(rows) if _py_eval({"a": a, "b": b}, groups)
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=20),
    right=st.lists(st.tuples(_key, _ts), min_size=1, max_size=20),
    bounds=st.tuples(st.integers(0, 20), st.integers(0, 20)).map(sorted),
)
def test_range_join_matches_brute_force(spark, left, right, bounds):
    from mcp_hubspot_spark.operators.joins import range_join

    lower, upper = int(bounds[0]) * 1_000_000, int(bounds[1]) * 1_000_000
    ldf = spark.createDataFrame(
        [(k, t * 1_000_000, i) for i, (k, t) in enumerate(left)],
        "k string, us long, lid long",
    ).withColumn("ts", F.timestamp_micros("us"))
    rdf = spark.createDataFrame(
        [(k, t * 1_000_000, i) for i, (k, t) in enumerate(right)],
        "k string, us long, rid long",
    ).select("k", F.timestamp_micros("us").alias("ts2"), "rid")
    got = {
        (r.lid, r.rid)
        for r in range_join(
            ldf.select("k", "ts", "lid"), rdf, on=["k"],
            left_ts="ts", right_ts="ts2", lower_us=lower, upper_us=upper,
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and lower <= (rt - lt) * 1_000_000 <= upper
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=8),
    chunk=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
def test_chunk_documents_reconstructs_tokens(spark, lens, chunk, overlap):
    """Invariant: dropping each chunk's overlapping prefix (after chunk 0)
    and concatenating reconstructs the exact token sequence — no token
    lost, duplicated, or reordered — for any doc length / chunk / overlap."""
    from hypothesis import assume

    from mcp_hubspot_spark.operators.text import chunk_documents

    assume(overlap < chunk)
    stride = chunk - overlap
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(n))) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text.split()))
    for i, n in enumerate(lens):
        chunks = [t for _, t in sorted(by_doc[i])]
        rebuilt = list(chunks[0])
        for prev, cur in zip(chunks, chunks[1:]):
            # consecutive chunks agree on the shared region
            shared = min(len(prev) - stride, len(cur))
            assert prev[stride:stride + shared] == cur[:shared]
            rebuilt.extend(cur[len(prev) - stride:])
        assert rebuilt == [f"t{i}_{j}" for j in range(n)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    members=st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=60, unique=True),
    probes=st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=60),
)
def test_bloom_never_false_negative(spark, members, probes):
    """For ANY member set, every member probes true; probe results for
    non-members may be true (FP) but membership must never be missed."""
    from mcp_hubspot_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )

    mdf = spark.createDataFrame([(m,) for m in members], "v string")
    words = bloom_build(mdf, "v", num_bits=1 << 10, num_hashes=4)
    pdf = spark.createDataFrame(
        [(p,) for p in set(members) | set(probes)], "v string"
    )
    got = {
        r.v
        for r in pdf.filter(
            bloom_might_contain(F.col("v"), words, num_hashes=4)
        ).collect()
    }
    assert set(members) <= got


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=200),
    k=st.integers(min_value=8, max_value=64),
)
@pytest.mark.slow
def test_kmv_exact_below_k_and_layout_invariant(spark, values, k):
    """When a group has fewer than k distinct values the KMV estimate is
    EXACT; and for any input, any repartitioning yields the same sketch."""
    from mcp_hubspot_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(v,) for v in values], "v long").withColumn(
        "g", F.lit("all")
    )
    out = kmv_distinct(df, ["g"], "v", k=k).first()
    n_distinct = len(set(values))
    if n_distinct < k:
        assert out.est_distinct == float(n_distinct)
    out2 = kmv_distinct(df.repartition(7), ["g"], "v", k=k).first()
    assert (out.n_sketch, out.est_distinct) == (out2.n_sketch, out2.est_distinct)


_ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),     # user
        st.integers(min_value=0, max_value=40),    # ts (seconds)
        st.sampled_from(["view", "click", "purchase", "other"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ev_rows, within=st.sampled_from([None, 5, 15]))
@pytest.mark.slow
def test_ordered_funnel_matches_python_walk(spark, rows, within):
    """Funnel counts equal a brute-force per-user python walk — first
    qualifying event per step, optional conversion deadline."""
    from mcp_hubspot_spark.operators.analytics import ordered_funnel

    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, t, ty, i) for i, (u, t, ty) in enumerate(rows)],
        "user_id long, sec long, event_type string, event_id long",
    ).withColumn("ts", F.timestamp_seconds("sec"))

    # python oracle: sequential first-qualifying min per step
    by_user: dict = {}
    for u, t, ty in rows:
        by_user.setdefault(u, []).append((t, ty))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev_t = None
        for i, step in enumerate(steps):
            cand = [
                t for t, ty in evs
                if ty == step
                and (prev_t is None or t >= prev_t)
                and (prev_t is None or within is None or t <= prev_t + within)
            ]
            if not cand:
                break
            prev_t = min(cand)
            counts[i] += 1

    got = {
        r.step: r.n_users
        for r in ordered_funnel(df, steps, within_seconds=within).collect()
    }
    assert got == {i + 1: c for i, c in enumerate(counts)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ev_rows)
def test_transition_matrix_matches_python(spark, rows):
    """Transition counts equal the pandas/python adjacency walk over
    (ts, event_id)-ordered per-user sequences."""
    from collections import Counter

    from mcp_hubspot_spark.operators.analytics import transition_matrix

    df = spark.createDataFrame(
        [(u, t, ty, i) for i, (u, t, ty) in enumerate(rows)],
        "user_id long, sec long, event_type string, event_id long",
    ).withColumn("ts", F.timestamp_seconds("sec"))

    by_user: dict = {}
    for i, (u, t, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t, i, ty))
    want: Counter = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1

    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in transition_matrix(df).collect()
    }
    assert got == dict(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["a", "b", "c", "d"])),
        min_size=1,
        max_size=40,
    ),
    min_count=st.integers(1, 3),
)
def test_copurchase_lift_matches_brute_force(spark, rows, min_count):
    """Pair counts and lift vs a plain-Python itertools oracle; every
    pair is emitted once with item_a < item_b."""
    import itertools

    from mcp_hubspot_spark.operators.analytics import copurchase_lift

    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r.item_a, r.item_b): (r.pair_count, r.count_a, r.count_b, r.lift)
        for r in copurchase_lift(df, "basket", "item", min_pair_count=min_count).collect()
    }
    baskets: dict[int, set] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    n = len(baskets)
    item_n: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for items in baskets.values():
        for i in items:
            item_n[i] = item_n.get(i, 0) + 1
        for a, b in itertools.combinations(sorted(items), 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    want = {
        p: (
            c,
            item_n[p[0]],
            item_n[p[1]],
            round(c * n / (item_n[p[0]] * item_n[p[1]]), 6),
        )
        for p, c in pair_n.items()
        if c >= min_count
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ranked=st.lists(
        st.tuples(st.integers(0, 3), st.floats(0.0, 3.0, width=16)),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(1, 8),
)
def test_ranking_metrics_bounds_and_perfect_order(spark, ranked, k):
    """NDCG/MRR/precision all land in [0, 1]; re-ranking each query's
    list by descending relevance yields NDCG exactly 1 for queries
    with any positive relevance (the ideal ordering is its own IDCG)."""
    from mcp_hubspot_spark.operators.analytics import ranking_metrics

    per_q: dict[int, list] = {}
    for q, rel in ranked:
        per_q.setdefault(q, []).append(rel)
    rows = [
        (q, i + 1, rel)
        for q, rels in per_q.items()
        for i, rel in enumerate(rels)
    ]
    df = spark.createDataFrame(rows, "query_id long, rank int, rel double")
    for r in ranking_metrics(df, k=k).collect():
        for v in (r.ndcg_at_k, r.mrr, r.precision_at_k):
            assert 0.0 <= v <= 1.0
    ideal_rows = [
        (q, i + 1, rel)
        for q, rels in per_q.items()
        for i, rel in enumerate(sorted(rels, reverse=True))
    ]
    ideal = spark.createDataFrame(
        ideal_rows, "query_id long, rank int, rel double"
    )
    for r in ranking_metrics(ideal, k=k).collect():
        has_rel = any(x > 0 for x in sorted(per_q[r.query], reverse=True)[:k])
        assert r.ndcg_at_k == (1.0 if has_rel else 0.0)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ref=st.lists(st.floats(0.0, 100.0, width=16), min_size=30, max_size=80),
    cur=st.lists(st.floats(0.0, 100.0, width=16), min_size=30, max_size=80),
)
@pytest.mark.slow
def test_psi_drift_nonnegative_total(spark, ref, cur):
    """Every PSI term (p−q)·ln(p/q) is individually >= 0, so the total
    is too; identical slices give exactly 0 in every bin."""
    from mcp_hubspot_spark.operators.profiling import psi_drift

    rdf = spark.createDataFrame([(v,) for v in ref], "value double")
    cdf = spark.createDataFrame([(v,) for v in cur], "value double")
    out = psi_drift(rdf, cdf, "value", n_bins=5).collect()
    # vanished/one-sided bins carry NULL psi_term (visible, unscored);
    # every SCORED term is individually >= 0
    assert all(
        r.psi_term >= 0.0 for r in out if r.psi_term is not None
    )
    assert all(
        (r.n_ref == 0 or r.n_cur == 0) for r in out if r.psi_term is None
    )
    same = psi_drift(rdf, rdf, "value", n_bins=5).collect()
    assert all(r.psi_term == 0.0 for r in same)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.floats(0.0, 100.0, width=16), min_size=5, max_size=60),
    b=st.lists(st.floats(0.0, 100.0, width=16), min_size=5, max_size=60),
)
@pytest.mark.slow
def test_ks_drift_matches_brute_force(spark, a, b):
    """The bucket-partitioned CDF assembly is pure plumbing: the
    statistic must equal the brute-force sup-norm ECDF distance at
    every pooled point, sit in [0, 1], and be 0 for identical
    slices."""
    from mcp_hubspot_spark.operators.profiling import ks_drift

    adf = spark.createDataFrame([(v,) for v in a], "value double")
    bdf = spark.createDataFrame([(v,) for v in b], "value double")
    got = ks_drift(adf, bdf, "value", n_buckets=4).collect()[0]

    sa, sb = sorted(a), sorted(b)
    import bisect

    expected = max(
        abs(
            bisect.bisect_right(sa, v) / len(sa)
            - bisect.bisect_right(sb, v) / len(sb)
        )
        for v in set(a) | set(b)
    )
    assert 0.0 <= got.ks_stat <= 1.0
    assert abs(got.ks_stat - expected) <= 1e-6
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert ks_drift(adf, adf, "value").collect()[0].ks_stat == 0.0


def _brute_spans(texts: dict, k: int):
    """Reference token-span implementation: all-pairs shingle match +
    per-diagonal run chaining, pure Python."""
    toks = {i: t.split() for i, t in texts.items()}
    sh = {
        i: {
            p: tuple(ts[p : p + k])
            for p in range(len(ts) - k + 1)
        }
        for i, ts in toks.items()
    }
    out = set()
    ids = sorted(texts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            matched = sorted(
                (pa, pb)
                for pa, sa in sh[a].items()
                for pb, sb in sh[b].items()
                if sa == sb
            )
            by_diag: dict = {}
            for pa, pb in matched:
                by_diag.setdefault(pa - pb, []).append(pa)
            for diag, pas in by_diag.items():
                pas.sort()
                start = prev = pas[0]
                for p in pas[1:] + [None]:
                    if p is not None and p == prev + 1:
                        prev = p
                        continue
                    out.add(
                        (a, b, start, prev + k - 1, start - diag,
                         prev + k - 1 - diag, prev - start + k)
                    )
                    if p is not None:
                        start = prev = p
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_repeated_spans_matches_brute_force(spark, texts):
    """The shingle-join + diagonal-merge span recovery must equal the
    all-pairs brute-force reference on tiny-vocab corpora (which force
    dense accidental matches, the hardest case for maximal-run
    merging), including empty docs and docs shorter than k."""
    from mcp_hubspot_spark.operators.dedup import repeated_spans

    corpus = {i: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.a_start, r.a_end, r.b_start, r.b_end,
         r.n_tokens)
        for r in repeated_spans(df, k=3).collect()
    }
    assert got == _brute_spans(corpus, 3)
