"""Deterministic sampling operators for training-data curation.

Curation pipelines need samples that are (a) reproducible across runs
and engines — no RNG, no partition-order dependence — and (b) cheap:
a pure filter (no shuffle) for rate sampling, one bounded window for
fixed-count sampling. Randomness comes from a multiplicative integer
hash of the row key (Knuth 2654435761 mod 2³²) — the engine-portable
mix already used across the contract fixtures, so every oracle can
replay the exact sample in SQL.

- ``hash_sample``: keep ≈ rate‰ of rows — a codegen filter, zero
  shuffle, linear at any scale;
- ``stratified_sample``: per-stratum rates (e.g. downsample the head
  language, keep the tail) — still a pure filter;
- ``stratified_fixed``: exactly n rows per stratum, chosen by hash
  order (deterministic "reservoir") — one window per stratum key,
  shuffles only the stratum column's hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_KNUTH = 2654435761
_M32 = 1 << 32


def _mix(key):
    """Engine-portable uniform hash of an integer key → [0, 2³²).
    ``key`` may be a column name or a Column expression.

    Mathematically ``(key · 2654435761) mod 2³²``, but computed in two
    16-bit halves so no intermediate exceeds 2⁴⁹: the naive product
    silently wraps int64 for keys ≥ ~3.5·10⁹ (non-ANSI Spark),
    producing NEGATIVE "hashes" that pass every rate filter — the
    oracle (DuckDB int128) would not wrap, so engine and oracle would
    diverge exactly at lake scale (review r02). ``pmod`` keeps the
    reduction non-negative for negative keys too."""
    col = F.col(key) if isinstance(key, str) else key
    k = F.pmod(col.cast("long"), F.lit(_M32))
    lo = k % F.lit(1 << 16)
    hi = (k - lo) / F.lit(1 << 16)
    part_lo = (lo * F.lit(_KNUTH)) % F.lit(_M32)
    part_hi = (((hi.cast("long") * F.lit(_KNUTH)) % F.lit(_M32)) * F.lit(1 << 16)) % F.lit(_M32)
    return (part_lo + part_hi) % F.lit(_M32)


def hash_sample(df: DataFrame, rate_permille: int, key: str) -> DataFrame:
    """Keep rows whose key hash lands under rate‰ — deterministic,
    filter-only (survives any scale; pushes past column pruning)."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError("rate_permille must be in [0, 1000]")
    return df.filter(_mix(key) % 1000 < rate_permille)


def stratified_sample(
    df: DataFrame, stratum: str, rates_permille: dict, key: str,
    default_permille: int = 0,
) -> DataFrame:
    """Per-stratum rate sampling: rates_permille maps stratum value →
    keep-rate‰; unlisted strata use ``default_permille``. Pure filter."""
    rate = F.lit(int(default_permille))
    for val, r in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum) == val, int(r)).otherwise(rate)
    return df.filter(_mix(key) % 1000 < rate)


def stratified_fixed(df: DataFrame, stratum: str, n: int, key: str) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, deterministic:
    rank by (key hash, key) within the stratum, keep rank ≤ n. The
    window partitions on the stratum (its hash partitioning is the
    only shuffle); ties cannot occur because the key breaks them."""
    w = Window.partitionBy(stratum).orderBy(_mix(key).asc(), F.col(key).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= n)
        .drop("_rank")
    )
