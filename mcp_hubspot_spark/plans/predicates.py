"""Filter-group predicate compiler.

The reference's query IR is HubSpot's ``PublicObjectSearchRequest``: a list
of filter groups, where filters inside a group are ANDed and groups are ORed
(reference ``clients/ticket_client.py:115-116`` — "either condition can
match"; multi-filter group at ``clients/contact_client.py:116-137``).

This module folds that JSON-ish IR into a single boolean ``Column`` so
Catalyst sees one ordinary predicate it can push into the parquet scan —
the declarative equivalent of the reference pushing the groups into the
remote search API (SURVEY §4 "genuinely custom pieces" #4).

Operator vocabulary follows HubSpot search semantics: EQ NEQ GT GTE LT LTE
BETWEEN IN NOT_IN HAS_PROPERTY NOT_HAS_PROPERTY CONTAINS_TOKEN
NOT_CONTAINS_TOKEN.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-level tokenization for CONTAINS_TOKEN (reference
# tests/test_closed_tickets.py:123-130 — token match, not substring)
_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


@dataclass
class Filter:
    """One filter leaf: ``property <op> value``."""

    property: str
    operator: str
    value: object = None
    high_value: object = None  # BETWEEN upper bound
    values: list = field(default_factory=list)  # IN / NOT_IN

    @classmethod
    def from_dict(cls, d: dict) -> "Filter":
        return cls(
            property=d.get("propertyName") or d["property"],
            operator=d["operator"].upper(),
            value=d.get("value"),
            high_value=d.get("highValue"),
            values=list(d.get("values") or []),
        )


def _tokens(col: Column) -> Column:
    return F.split(F.lower(col), _TOKEN_SPLIT)


def compile_filter(f: Filter | dict) -> Column:
    if isinstance(f, dict):
        f = Filter.from_dict(f)
    c = F.col(f.property)
    op = f.operator.upper()
    if op == "EQ":
        return c == F.lit(f.value)
    if op == "NEQ":
        return c != F.lit(f.value)
    if op == "GT":
        return c > F.lit(f.value)
    if op == "GTE":
        return c >= F.lit(f.value)
    if op == "LT":
        return c < F.lit(f.value)
    if op == "LTE":
        return c <= F.lit(f.value)
    if op == "BETWEEN":
        return (c >= F.lit(f.value)) & (c <= F.lit(f.high_value))
    if op == "IN":
        return c.isin(*f.values)
    if op == "NOT_IN":
        return ~c.isin(*f.values)
    if op == "HAS_PROPERTY":
        return c.isNotNull()
    if op == "NOT_HAS_PROPERTY":
        return c.isNull()
    if op == "CONTAINS_TOKEN":
        return F.array_contains(_tokens(c), str(f.value).lower())
    if op == "NOT_CONTAINS_TOKEN":
        return ~F.array_contains(_tokens(c), str(f.value).lower())
    raise ValueError(f"unsupported filter operator: {f.operator}")


def compile_filter_groups(groups: list[list[Filter | dict]]) -> Column:
    """AND within each group, OR across groups → one pushable Column."""
    if not groups:
        return F.lit(True)
    group_cols = [
        reduce(lambda a, b: a & b, (compile_filter(f) for f in g), F.lit(True))
        for g in groups
    ]
    return reduce(lambda a, b: a | b, group_cols)
