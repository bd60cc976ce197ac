"""Deterministic sampling and dataset splitting for training-data pipelines.

Training corpora need STABLE sampling and train/val/test assignment: a row's
fate must be a pure function of its key — not of partitioning, row order,
cluster size, or a seed-carrying RNG stream — so resume/backfill reproduce
byte-identical splits and a row never migrates between train and test when
the corpus grows (the classic leakage bug with `ORDER BY rand()` splits).

Mechanism: compare a fixed-width lowercase-hex prefix of md5(salt || key)
LEXICOGRAPHICALLY against threshold strings. md5 of an identical string is
bit-identical in every engine, and hex-string comparison avoids hex->int
conversion (whose builtins differ between Spark and DuckDB), so the same
assignment is expressible verbatim as a DuckDB oracle. With `digits` hex
chars the fraction granularity is 16^-digits (default 4 -> 1/65536).

Scale shape: a pure per-row codegen'd projection/filter — zero shuffles,
zero state, trivially resumable; downstream partitioning is untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIGITS = 4  # hex chars compared; 16^4 = 65536 fraction granularity


def _cut_hex(fraction: float, digits: int = DIGITS) -> str:
    """Threshold hex string: rows whose bucket sorts BELOW it are kept."""
    space = 16**digits
    cut = int(round(fraction * space))
    if not 0 <= cut <= space:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    # cut == space means "keep everything": 'g…' sorts above every hex char
    return "g" * digits if cut == space else format(cut, f"0{digits}x")


def hash_bucket(key: Column, salt: str = "", digits: int = DIGITS) -> Column:
    """Lowercase-hex bucket of a key column: substr(md5(salt || key), 1, n).
    Changing `salt` redraws every assignment; identical (salt, key) is
    identical forever, across engines and cluster sizes."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, digits
    )


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Stable Bernoulli-style sample: keeps the rows whose hash bucket
    falls below the fraction threshold — the SAME rows every run, every
    partitioning, every engine (unlike DataFrame.sample, whose output
    depends on the seed AND the physical split)."""
    return df.where(hash_bucket(F.col(key_col), salt) < _cut_hex(fraction))


def hash_split(
    df: DataFrame,
    splits: list[tuple[str, float]],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Adds a `split` column assigning each row to one named split by
    cumulative hash-threshold (e.g. [("train", .8), ("val", .1),
    ("test", .1)]). Fractions must sum to 1 (±granularity); the last
    split absorbs the rounding remainder so every row is assigned.
    Assignment is per-key stable: growing the corpus NEVER moves an
    existing key between splits."""
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1.0 / 16**DIGITS * len(splits):
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    bucket = hash_bucket(F.col(key_col), salt)
    cum = 0.0
    cuts = []
    for name, frac in splits[:-1]:
        cum += frac
        cuts.append((name, _cut_hex(cum)))
    # fold inside-out so the FIRST threshold an ascending bucket clears
    # wins: when(b < cut1, n1).otherwise(when(b < cut2, n2).otherwise(last))
    expr = F.lit(splits[-1][0])  # last split takes the remainder
    for name, cut in reversed(cuts):
        expr = F.when(bucket < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample — the data-MIXING /
    source-weighting pass of corpus preparation (down-weight a dominant
    crawl, up-weight a scarce language) as a pure per-row filter: a row
    is kept iff its hash bucket falls below ITS STRATUM's threshold.
    Strata missing from `fractions` get `default_fraction`.

    Same md5 mechanism (and the same guarantees) as deterministic_sample:
    a row's fate is a pure function of (salt, key) — growing the corpus,
    repartitioning, or porting engines never flips an existing row, and
    re-weighting one stratum leaves every other stratum's sample
    byte-identical. Zero shuffles."""
    bucket = hash_bucket(F.col(key_col), salt)
    cut = F.lit(_cut_hex(default_fraction))
    for name, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == name, F.lit(_cut_hex(frac))).otherwise(
            cut
        )
    return df.where(bucket < cut)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """At most `n_per_stratum` rows per stratum, chosen by hash order
    (rank over (md5 bucket, key) within the stratum) — the per-source CAP
    of a data-mixing recipe. Deterministic and engine-portable given the
    snapshot; unlike the fraction-based samplers a QUOTA is inherently
    snapshot-relative (new rows can displace old ones at the boundary —
    that is what capping means), so persist the chosen keys if the cut
    must be frozen across backfills. One shuffle (the per-stratum
    window); 8 hex digits keep hash-order ties (broken by key) rare."""
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt, digits=8), F.col(key_col)
    )
    return (
        df.withColumn("_qrk", F.row_number().over(w))
        .where(F.col("_qrk") <= n_per_stratum)
        .drop("_qrk")
    )
