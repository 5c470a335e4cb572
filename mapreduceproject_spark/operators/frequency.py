"""Exact heavy hitters at unbounded vocabulary: Misra-Gries candidates,
then exact verification.

The reference's word count (src/reduce_exe_word_count.go) shuffles every
distinct key; at 100 TB with a web-scale vocabulary that shuffle IS the
bottleneck.  The classic fix is two passes:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   capacity M (bounded memory, one Arrow-batched scan, no shuffle).  MG
   guarantees any item with partition count > N_p/(M+1) survives; by
   weighted pigeonhole, any item with global frequency >= phi*N exceeds
   that bar in at least one partition whenever M+1 > 1/phi.  The union of
   per-partition survivors is therefore a SUPERSET of the true heavy
   hitters — tiny (<= partitions*M rows) and broadcastable.
2. **Verify pass** — re-scan, keep only candidate tokens (broadcast semi
   join, no full-vocabulary shuffle), count exactly, filter >= phi*N.

The output is EXACT — approximation lives only in the pruning — which is
what makes the DuckDB oracle a plain GROUP BY ... HAVING.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(capacity: int, col: str):
    """Weighted (batched) Misra-Gries, fully vectorized: each Arrow batch
    is pre-aggregated with value_counts (C speed), merged into a counter
    Series by index alignment (C hash join), and the decrement step is a
    single order statistic instead of a Python loop.

    The repeated subtract-the-minimum loop run to completion subtracts a
    total of d = the (capacity+1)-th largest counter value — the smallest
    uniform decrement leaving <= capacity positive counters — so
    ``keep (v - d) where v > d`` yields the IDENTICAL survivor set and
    values in one np.partition + one vectorized compare.  Measured
    same-harness against the round-3 per-token dict loop at the 100×
    fixture (27 M tokens, capacity 101): 6.2 s → 3.1 s end-to-end,
    4.3 M → 8.8 M tok/s (measurements/scale_100x_latest.json).  The MG guarantee is unchanged:
    decomposing the uniform d into unit rounds, round j decrements every
    counter with value >= j, and for j <= d at least capacity+1 counters
    qualify, so total decremented mass <= N_p/(capacity+1) and any item
    with partition count above that bar keeps a positive counter."""

    import numpy as np

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = (
                vc
                if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            if len(counters) > capacity:
                vals = counters.to_numpy()
                kth = len(vals) - capacity - 1
                d = np.partition(vals, kth)[kth]
                counters = counters[vals > d] - d
        yield pd.DataFrame({col: counters.index.to_numpy(dtype=object)})

    return summarize


def heavy_hitters_exact(
    tokens: DataFrame, col: str, phi: float, capacity: int | None = None
) -> DataFrame:
    """Tokens with exact frequency >= ``phi`` of the stream, via the
    MG-candidates + exact-verify two-pass.

    ``capacity`` defaults to ceil(2/phi) (safely above the 1/phi bound
    that makes the candidate set a guaranteed superset).  Output:
    (col, cnt, freq) — exact counts, exact ratios.
    """
    if capacity is None:
        capacity = int(2.0 / phi) + 1
    elif capacity + 1 <= 1.0 / phi:
        # loud, like simhash_dedup's lossy-banding guard: MG with M
        # counters only guarantees survival of items above N/(M+1), so a
        # capacity at or below 1/phi - 1 can silently drop a TRUE heavy
        # hitter from the candidate set — breaking the EXACT contract.
        # suggest the minimal capacity this guard accepts:
        # floor(1/phi) + 1 > 1/phi holds for every real 1/phi (the
        # fractional part is < 1), so the suggestion is accepted by
        # construction
        min_cap = math.floor(1.0 / phi)
        raise ValueError(
            f"capacity={capacity} cannot guarantee phi={phi} candidates: "
            f"need capacity + 1 > 1/phi (capacity >= {min_cap})"
        )
    # The stream feeds three consumers (MG pass, total, verify count) and
    # is deliberately NOT persisted: re-running a codegen'd tokenize scan
    # costs ~1/5th of materializing the exploded token stream (measured
    # 1.6 s vs 7.1 s at sf0.1) — caching pays only when the upstream is
    # expensive relative to its output volume, the opposite case here.
    stream = tokens.select(col)
    candidates = stream.mapInPandas(
        _misra_gries_partition(capacity, col), schema=f"{col} string"
    ).distinct()
    # stream size stays in-plan (broadcast 1-row agg), never a driver scalar
    total = stream.agg(F.count("*").cast("long").alias("_total"))
    return (
        stream.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.lit(phi) * F.col("_total"))
        .select(
            col,
            "cnt",
            (F.col("cnt").cast("double") / F.col("_total")).alias("freq"),
        )
    )
