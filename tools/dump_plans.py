"""Dump .explain('formatted') for named registry queries to plans/<dir>/.

Usage: python tools/dump_plans.py <outdir-suffix> <query> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mcp_hubspot_spark.session import get_spark  # noqa: E402
from mcp_hubspot_spark.workload import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
