"""Scan-shaped operators (SURVEY §2.1 S1-S10, §2.2 P1-P10).

Every reference scan is "remote search with pushed-down projection,
predicates, sort, limit" (reference ``clients/company_client.py:31-65``,
``clients/ticket_client.py:148-181``). Declaratively that is just
``select → filter → orderBy → limit``; Catalyst pushes the projection and
predicates into the parquet scan and plans the sort+limit as
TakeOrderedAndProject, so the physical shape matches what the reference
asks its remote engine for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.predicates import compile_filter_groups
from .topk import top_k


def recent_scan(
    df: DataFrame,
    ts_col: str,
    limit: int = 10,
    properties: Sequence[str] | None = None,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Most-recently-modified top-k (reference S1/S2/O1:
    clients/company_client.py:58-65, clients/contact_client.py:58-66).

    Sort DESC on the modification timestamp, unique tiebreaker for
    determinism, project the requested properties only.
    """
    order: list[Column] = [F.col(ts_col).desc()]
    if tiebreaker:
        order.append(F.col(tiebreaker).desc())
    return top_k(df, order, limit, project=properties)


def filtered_scan(
    df: DataFrame,
    filter_groups: list[list] | None = None,
    sorts: Sequence[tuple[str, str]] = (),
    limit: int | None = None,
    properties: Sequence[str] | None = None,
) -> DataFrame:
    """Filtered+sorted+limited scan (reference S3:
    clients/ticket_client.py:33-63,148-181).

    ``filter_groups`` follow the reference's OR-of-AND-groups semantics
    (plans.predicates). ``sorts`` is a list of (column, "asc"|"desc").
    """
    out = df
    if filter_groups:
        out = out.filter(compile_filter_groups(filter_groups))
    order = [
        F.col(c).desc() if d.lower() == "desc" else F.col(c).asc()
        for c, d in sorts
    ]
    if order and limit is not None:
        out = out.orderBy(*order).limit(limit)
    elif order:
        out = out.orderBy(*order)
    elif limit is not None:
        out = out.limit(limit)
    if properties is not None:
        out = out.select(*properties)
    return out


def filtered_scan_with_total(
    df: DataFrame,
    filter_groups: list[list] | None = None,
    sorts: Sequence[tuple[str, str]] = (),
    limit: int | None = None,
    properties: Sequence[str] | None = None,
    total_col: str = "total",
) -> DataFrame:
    """Limited page + TOTAL matching count, pre-limit (reference A2: the
    search response surfaces ``search_response.total`` next to the page,
    clients/ticket_client.py:213,232-234).

    Two branches off one filtered scan: the top-k page and a single-row
    count aggregate, recombined by a broadcast cross-join (1 row × k
    rows). The count is a partial-agg reduce — each task emits one long —
    so at 100 TB this is a cheap second pass over the scan, never a
    driver-side collect.
    """
    filtered = df
    if filter_groups:
        filtered = filtered.filter(compile_filter_groups(filter_groups))
    page = filtered_scan(filtered, None, sorts, limit, properties)
    total = filtered.agg(F.count(F.lit(1)).alias(total_col))
    return page.crossJoin(F.broadcast(total))


def semi_lookup(df: DataFrame, ids: DataFrame | Sequence, key: str) -> DataFrame:
    """Batched point-lookup (reference S5/J4:
    clients/conversation_client.py:101-146 — ID batches of 10).

    In Spark the whole ID list is one broadcast left-semi join: no N+1, no
    batching constant, and at 100 TB the fact side never shuffles.
    """
    if isinstance(ids, DataFrame):
        return df.join(F.broadcast(ids), on=key, how="left_semi")
    return df.filter(F.col(key).isin(list(ids)))
