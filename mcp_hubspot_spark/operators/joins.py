"""Join operators (SURVEY §2.3 J1-J5).

The reference's joins are hand-rolled loops over REST calls:
association-expand (edges → per-id detail GETs, reference
``clients/company_client.py:67-137``), N+1 thread→messages enrichment
(``clients/conversation_client.py:301-333``), and a search-before-insert
dedup check (``clients/contact_client.py:79-87``). Each becomes ONE
declarative join here; Catalyst/AQE picks broadcast-hash vs sort-merge and
splits skewed keys at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_expand(
    left: DataFrame,
    edges: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    edge_from: str = "from_id",
    edge_to: str = "to_object_id",
    broadcast_edges: bool = False,
) -> DataFrame:
    """left ⋈ edges ⋈ right (reference J1/J2 association traversal).

    The reference walks edges per-left-row with capped fan-out (500,
    company_client.py:97); here the whole traversal is two equi-joins. At
    scale: if the edge table is small relative to the facts, pass
    ``broadcast_edges=True`` to avoid shuffling both fact sides; otherwise
    both joins shuffle on their keys and AQE handles skewed hub entities.
    """
    e = F.broadcast(edges) if broadcast_edges else edges
    out = left.join(e, left[left_key] == e[edge_from], "inner")
    return out.join(right, e[edge_to] == right[right_key], "inner")


def dedup_insert(
    new_rows: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Search-before-insert dedup (reference J3:
    clients/contact_client.py:79-87,100-150 — if a match exists return it,
    else insert).

    Returns ``(to_insert, duplicates)``: the anti-join survivors to append
    and the semi-join matches to report. Set semantics, one shuffle each,
    broadcast when ``new_rows`` is small (the common ingest case). For
    atomicity the pair maps onto Delta ``MERGE WHEN NOT MATCHED``.
    """
    on = list(keys)
    to_insert = new_rows.join(existing, on=on, how="left_anti")
    duplicates = new_rows.join(existing, on=on, how="left_semi")
    return to_insert, duplicates


def enrich_one_to_many(
    parents: DataFrame,
    children: DataFrame,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Replace the reference's N+1 per-parent child fetch (J5,
    conversation_client.py:301-333) with one equi-join; pair with
    aggregates.group_to_array for the nested re-assembly."""
    return parents.join(children, on=key, how=how)
