"""Python UDTFs (user-defined TABLE functions) — the one §2.11 UDF shape
the rest of the repo doesn't exercise (scalar pandas UDF, grouped-map,
grouped-agg, mapInPandas, applyInPandasWithState are all covered
elsewhere).

UDTFs are row-at-a-time Python — the SLOW path. The rule stated on every
operator here: use a UDTF only where the fan-out logic genuinely needs
imperative per-row control AND the input is metadata-scale (config
tables, small dimension expansion), never on the 100 TB fact path — there
the same reshape belongs to posexplode/sequence/mapInPandas (see
``operators/text.chunk_documents`` for the vectorized equivalent).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sentence_idx int, sentence string, n_words int")
class SplitSentences:
    """Emit one row per sentence of the input text (with its index and
    word count). Lateral-joined against a document table it is the UDTF
    twin of the chunking operator; registered via
    ``spark.udtf.register("split_sentences", SplitSentences)``.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, s in enumerate(_SENTENCE_RE.split(text.strip())):
            s = s.strip()
            if s:
                yield i, s, len(s.split())


@udtf(returnType="step bigint, lo bigint, hi bigint")
class BisectRanges:
    """Emit the binary-search interval sequence for ``target`` within
    [0, n) — a genuinely imperative per-row expansion (data-dependent
    iteration count) that has no clean posexplode equivalent. Metadata-
    scale only (e.g. deriving probe schedules for an index), per the
    module rule."""

    def eval(self, n: int, target: int):  # noqa: D102
        if n is None or target is None or n <= 0:
            return
        lo, hi, step = 0, int(n), 0
        while lo < hi:
            yield step, lo, hi
            mid = (lo + hi) // 2
            if mid < target:
                lo = mid + 1
            else:
                hi = mid
            step += 1
