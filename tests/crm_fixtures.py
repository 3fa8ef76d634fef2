"""Synthetic CRM-shaped tables for behavioral-parity tests (FIXTURES.md
Part B). Deterministic, tiny, built with spark.createDataFrame against the
explicit schemas — these pin the reference's semantics listed in SURVEY §5."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from mcp_hubspot_spark.schemas import CRM_SCHEMAS

T0 = datetime(2024, 6, 1, 12, 0, 0)


def _ts(days: float) -> datetime:
    return T0 + timedelta(days=days)


def build_crm_tables(spark: SparkSession) -> dict:
    companies = spark.createDataFrame(
        [
            ("c1", "Acme", "acme.com", None, None, "mfg", _ts(0), False),
            ("c2", "Globex", "globex.com", None, None, "tech", _ts(1), False),
            ("c3", "Initech", None, None, None, "tech", _ts(2), False),
            # duplicate name (J3 dedup target), older
            ("c4", "Acme", "acme.org", None, None, "mfg", _ts(-1), False),
            # timestamp tie with c2 (top-k determinism)
            ("c5", "Hooli", None, None, None, "tech", _ts(1), False),
        ],
        CRM_SCHEMAS["companies"],
    )
    contacts = spark.createDataFrame(
        [
            ("p1", "Ada", "Lovelace", "ada@acme.com", None, "Acme", _ts(0), _ts(0), False),
            ("p2", "Alan", "Turing", "alan@globex.com", None, "Globex", _ts(1), _ts(1), False),
            # same (first,last) different company — NOT a dup under 3-key check
            ("p3", "Ada", "Lovelace", "ada@globex.com", None, "Globex", _ts(2), _ts(2), False),
        ],
        CRM_SCHEMAS["contacts"],
    )
    tickets = spark.createDataFrame(
        [
            ("t1", "login broken", "cannot log in", "p0", "4", "CLOSED", "CLOSED",
             "HIGH", _ts(-3), _ts(-0.5), _ts(-0.2)),
            ("t2", "billing question", "invoice wrong", "p0", "Closed", "closed", "closed",
             "LOW", _ts(-10), _ts(-5), _ts(-5)),
            ("t3", "feature ask", "please add", "p0", "1", "OPEN", "open",
             "MEDIUM", _ts(-1), None, _ts(-0.1)),
        ],
        CRM_SCHEMAS["tickets"],
    )
    associations = spark.createDataFrame(
        [
            ("companies", "c1", "engagements", "e1"),
            ("companies", "c1", "engagements", "e2"),
            ("companies", "c2", "engagements", "e3"),
            ("tickets", "t1", "conversation", "101"),
            ("tickets", "t1", "conversation", "102"),
            ("tickets", "t2", "conversation", "95"),
            # t3 has no edges (empty-response path, ticket_client.py:296-314)
        ],
        CRM_SCHEMAS["associations"],
    )

    def meta(**kw):
        base = dict.fromkeys(
            [
                "body", "subject", "sender_email", "text", "html", "status",
                "forObjectType", "title", "internalMeetingNotes", "fromNumber",
                "toNumber", "disposition",
            ]
        )
        base.update({"from": None, "to": None, "cc": None, "bcc": None,
                     "startTime": None, "endTime": None,
                     "durationMilliseconds": None})
        base.update(kw)
        return base

    engagements = spark.createDataFrame(
        [
            ("e1", "NOTE", _ts(-2), _ts(-2), _ts(-2), "u1", "u1",
             meta(body="called them")),
            # EMAIL with empty text, html set → coalesce picks html (F4)
            ("e2", "EMAIL", _ts(-1), _ts(-1), _ts(-1), "u1", "u2",
             meta(subject="hello", text="", html="<b>hi</b>",
                  **{"from": ("raw1", "a@x.com", "A", "X")},
                  to=[("raw2", "b@y.com", "B", "Y")])),
            ("e3", "CALL", _ts(0), _ts(0), _ts(0), "u2", "u2",
             meta(body="call notes", fromNumber="1", toNumber="2",
                  durationMilliseconds=60000, disposition="answered",
                  status="done")),
            # unknown type → all-null content branches (company_client.py:192)
            ("e4", "WHATSAPP", _ts(0), _ts(0), _ts(0), "u2", "u2", meta()),
        ],
        CRM_SCHEMAS["engagements"],
    )
    threads = spark.createDataFrame(
        [
            ("101", _ts(-3), _ts(-0.5), "OPEN", "i1", "p1", "u1", False, False),
            ("102", _ts(-2), _ts(-1), "CLOSED", "i1", "p1", "u1", False, False),
            ("95", _ts(-9), _ts(-5), "CLOSED", "i2", "p2", None, False, False),
            ("1003", _ts(-1), _ts(-0.1), "OPEN", "i1", "p3", None, False, False),
        ],
        CRM_SCHEMAS["threads"],
    )

    def sender(actor, name, field, dtype="HS_EMAIL_ADDRESS", value="x@y.com"):
        return (actor, name, field, (dtype, value))

    long_text = "x" * 300  # > 200 chars → truncation test (F3)
    messages = spark.createDataFrame(
        [
            # th1: out-of-order creation (W2 sort test), AGENT + CUSTOMER
            ("m2", "101", "MESSAGE", _ts(-1.0), _ts(-1.0), "re: help", long_text, long_text,
             "OUT", "ch1", "acc1", ("SENT",),
             [sender("0-1 agent-7", "Agent", "FROM")],
             [("TO", ("HS_EMAIL_ADDRESS", "cust@ex.com")),
              ("CC", ("HS_PHONE_NUMBER", "+15551234"))]),
            ("m1", "101", "MESSAGE", _ts(-2.0), _ts(-2.0), "help", "first msg", "first msg",
             "IN", "ch1", "acc1", ("SENT",),
             [sender("visitor-9", "Cust", "FROM")],
             [("TO", ("HS_EMAIL_ADDRESS", "agent@ex.com"))]),
            # system row dropped by P7
            ("m3", "101", "SYSTEM", _ts(-0.9), _ts(-0.9), None, "joined", None,
             None, "ch1", "acc1", ("SENT",), [], []),
            ("m4", "102", "MESSAGE", _ts(-1.5), _ts(-1.5), "s", "short", "short",
             "IN", "ch1", "acc1", ("SENT",),
             [sender("0-2 bot", "Bot", "FROM")], []),
            # empty senders → UNKNOWN (F5)
            ("m5", "95", "MESSAGE", _ts(-5.0), _ts(-5.0), "s2", "anon", "anon",
             "IN", "ch2", "acc2", ("SENT",), [], []),
            ("m6", "1003", "MESSAGE", _ts(-0.2), _ts(-0.2), "s3", "hi", "hi",
             "IN", "ch1", "acc1", ("SENT",),
             [sender("0-9 other", "NotAgent", "FROM")], []),
        ],
        CRM_SCHEMAS["messages"],
    )
    emails = spark.createDataFrame(
        [
            # text empty, html set → F4 coalesce picks html
            ("501", "welcome", "", "<p>welcome!</p>", "a@x.com", "b@y.com",
             None, None, _ts(-1), _ts(-1), False),
            ("502", "invoice", "plain body", "<p>rich</p>", "a@x.com", "c@z.com",
             None, None, _ts(0), _ts(0), False),
            # archived → excluded by P9
            ("503", "old", "gone", None, "a@x.com", "d@w.com",
             None, None, _ts(1), _ts(1), True),
            ("500", "hello", None, "<p>html only</p>", "e@v.com", "a@x.com",
             None, None, _ts(-2), _ts(-2), False),
        ],
        CRM_SCHEMAS["emails"],
    )
    return {
        "companies": companies,
        "emails": emails,
        "contacts": contacts,
        "tickets": tickets,
        "associations": associations,
        "engagements": engagements,
        "threads": threads,
        "messages": messages,
    }
