"""Distributed count-min sketch (heavy-hitter detection).

The mergeable-summary pattern: every partition folds its rows into a
fixed d×w counter matrix inside an Arrow batch (numpy bincount — no
Python per row), the tiny matrices merge by elementwise addition (one
groupBy over d·w cells), and the merged sketch — metadata-sized, like a
broadcast-join build side or the k-means centroid matrix — ships back
into a second map-side pass that estimates any key's frequency as the
min over its d cells. Guarantees (public CM-sketch bounds): estimate >=
true count always; estimate <= true + (e/w)·N with probability
1 - (1/e)^d.

At 100 TB nothing changes shape: the build is one scan emitting d·w
partials per partition, the merge is d·w rows total, estimation is
map-only — the sketch never grows with data volume, which is the whole
point versus an exact groupBy whose shuffle carries every distinct key.

Reference parity: none (the reference has no aggregation); [EXT]
north-star "novel sketch" slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed public mixing constants (splitmix64 finalizer per depth-seeded lane)
_DEPTH = 4
_WIDTH = 256


def _cm_hash(keys: np.ndarray, row: int) -> np.ndarray:
    """Deterministic 64-bit mix of int64 keys for sketch row `row`."""
    x = keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * np.uint64(row + 1)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(_WIDTH)).astype(np.int64)


def build_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """One distributed pass: (cell_row, cell_col, n) partials, pre-merged
    map-side by the groupBy — at most d·w rows leave every executor."""

    def batches(it):
        for pdf in it:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            rows_, cols_, ns_ = [], [], []
            for r in range(_DEPTH):
                cols = _cm_hash(keys, r)
                counts = np.bincount(cols, minlength=_WIDTH)
                nz = np.nonzero(counts)[0]
                rows_.extend([r] * len(nz))
                cols_.extend(nz.tolist())
                ns_.extend(counts[nz].tolist())
            yield pd.DataFrame({"cell_row": rows_, "cell_col": cols_, "n": ns_})

    partials = df.select(key_col).mapInPandas(
        batches, schema="cell_row int, cell_col int, n long"
    )
    return partials.groupBy("cell_row", "cell_col").agg(F.sum("n").alias("n"))


def estimate_counts(df: DataFrame, key_col: str, sketch_rows: list) -> DataFrame:
    """Map-side estimation: the merged sketch (d·w cells, collected once —
    metadata-sized) broadcasts inside the UDF closure; every key's
    estimate is the min over its d cells."""
    M = np.zeros((_DEPTH, _WIDTH), dtype=np.int64)
    for r in sketch_rows:
        M[r["cell_row"], r["cell_col"]] = r["n"]

    @F.pandas_udf("long")
    def est(keys: pd.Series) -> pd.Series:
        k = keys.to_numpy(dtype=np.int64)
        mins = np.full(len(k), np.iinfo(np.int64).max)
        for r in range(_DEPTH):
            cols = _cm_hash(k, r)
            mins = np.minimum(mins, M[r, cols])
        return pd.Series(mins)

    return df.withColumn("est_count", est(F.col(key_col)))


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch
# ---------------------------------------------------------------------------

_K = 512  # sample size — error ~ O(1/sqrt(k)) on quantile ranks


def _bottomk_hash(keys: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer) — the sampling
    'randomness'. Hash-ordered bottom-k is a uniform sample of the keys
    with no RNG state, so the sketch is identical on every run and at
    any partitioning."""
    x = keys.astype(np.uint64) ^ np.uint64(0xD6E8FEB86659FD93)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return (x ^ (x >> np.uint64(31))).astype(np.int64)


def bottomk_partials(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-partition bottom-k by hash: each partition emits at most k
    (hash, value) rows — a mergeable uniform-sample summary. Merging two
    sketches = union, keep k smallest hashes; the global merge below is
    Spark's TakeOrderedAndProject (per-partition heaps, O(k) driver)."""

    def batches(it):
        acc_h = np.empty(0, dtype=np.int64)
        acc_v = np.empty(0, dtype=np.float64)
        for pdf in it:
            h = _bottomk_hash(pdf[key_col].to_numpy(dtype=np.int64))
            v = pdf[value_col].to_numpy(dtype=np.float64)
            acc_h = np.concatenate([acc_h, h])
            acc_v = np.concatenate([acc_v, v])
            if len(acc_h) > 4 * _K:  # compact: keep partition state bounded
                idx = np.argpartition(acc_h, _K)[:_K]
                acc_h, acc_v = acc_h[idx], acc_v[idx]
        if len(acc_h) > _K:
            idx = np.argpartition(acc_h, _K)[:_K]
            acc_h, acc_v = acc_h[idx], acc_v[idx]
        yield pd.DataFrame({"h": acc_h, "v": acc_v})

    return df.select(key_col, value_col).mapInPandas(batches, schema="h long, v double")


def bottomk_quantiles(
    df: DataFrame, key_col: str, value_col: str, probs: list
) -> list:
    """Quantile estimates from the merged bottom-k sample: sort the ≤k
    sampled values, read ranks. Driver sees k rows, never data."""
    sample = (
        bottomk_partials(df, key_col, value_col).orderBy("h").limit(_K).collect()
    )
    vals = np.sort(np.array([r["v"] for r in sample]))
    n = len(vals)
    return [float(vals[min(n - 1, int(p * (n - 1) + 0.5))]) for p in probs]
