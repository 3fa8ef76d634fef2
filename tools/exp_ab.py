"""Interleaved A/B harness for optimization experiments (guide §1).

Usage: build a dict name -> (spark, sf_dir) -> DataFrame in a driver
script and call run_ab(variants). Each rep rebuilds the DataFrame and
materializes it through the noop sink; variants are interleaved
(A,B,C,A,B,C,...) so host drift hits every variant equally. Prints
per-variant min/median/max and per-rep times.
"""

from __future__ import annotations

import statistics
import time


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_ab(spark, sf_dir, variants: dict, reps: int = 5, warmup: int = 1):
    times: dict[str, list[float]] = {n: [] for n in variants}
    for n, fn in variants.items():
        for _ in range(warmup):
            materialize(fn(spark, sf_dir))
    for r in range(reps):
        for n, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{n}#rep{r}")
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            times[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    print(f"{'variant':34s} {'min':>7s} {'med':>7s} {'max':>7s}  reps")
    for n, ts in times.items():
        print(
            f"{n:34s} {min(ts):7.3f} {statistics.median(ts):7.3f} "
            f"{max(ts):7.3f}  {[round(t, 2) for t in ts]}"
        )
    return times
