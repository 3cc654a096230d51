"""Skew mitigation operators: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (a viral document id, a null-heavy
foreign key, one huge chromosome) can pin an entire stage on one
reducer. Spark's AQE skew-join (spark.sql.adaptive.skewJoin.enabled)
handles the sort-merge case by splitting oversized partitions at
runtime — prefer it when it applies. Manual salting still matters when:

- the operation is an AGGREGATION, not a join (AQE skew handling does
  not split hot groupBy keys);
- the hot side must shuffle-join a mid-sized table that cannot
  broadcast (AQE splits the partition but each split re-reads the full
  matching build side);
- running on engines/configs without AQE.

Both operators here are deterministic (hash-based salts, no rand()), so
results are stable under task retries — the same replay-safety
discipline as the source partitions (SURVEY D5/D6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed ``big`` side against a non-broadcastable
    ``small`` side with hot keys spread over ``n_salts`` reducers.

    The big side gets a deterministic per-row salt (xxhash64 of the whole
    row mod n_salts — NOT rand(), so task retries replay identically);
    the small side is replicated n_salts times via an explode (rows x
    n_salts, acceptable for a mid-sized build side). The join key becomes
    (key..., salt), so a hot key's rows land on n_salts reducers instead
    of one. Result == plain ``big.join(small, key, how)`` for the
    supported join types.

    ``how`` is restricted to inner/left/left_semi/left_anti: for
    right/full outer joins an unmatched small-side row would surface once
    per salt replica, which is NOT equivalent to the plain join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the exploded small side "
            "replicates unmatched rows n_salts times under right/full outer "
            f"joins; use one of {sorted(allowed)}. Rewrite: a right outer "
            "join is a left outer join with the arguments swapped — call "
            "salted_join(other, one, key, how='left') so the preserved side "
            "is the salted one; for full outer, union the salted left join "
            "with the small side's anti-join remainder, or rely on AQE "
            "skew handling (spark.sql.adaptive.skewJoin.enabled)."
        )
    keys = [key] if isinstance(key, str) else list(key)
    salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, keys + ["_salt"], how)
    return out.drop("_salt")


def two_phase_distinct_count(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    n_salts: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) per group without funneling any hot group
    through one reducer.

    Phase 1 shuffles on (group, salt(value)) and dedupes values inside
    each salt bucket; because the salt is a hash OF THE VALUE, a given
    value always lands in the same bucket, so bucket-local distinct
    counts sum exactly. Phase 2 is a cheap (group)-keyed sum of
    n_salts partial counts. Equivalent to
    ``df.groupBy(group).agg(countDistinct(value))`` (which plans the
    same expand-based two-shuffle shape but keys the first shuffle on
    (group, value) — fine in general, still one reducer per group for
    the final exact count at extreme cardinality; salting bounds the
    phase-2 fan-in to n_salts rows per group).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    salted = df.select(
        *groups, F.col(value_col),
        F.pmod(F.xxhash64(value_col), F.lit(n_salts)).cast("int").alias("_salt"),
    )
    partial = (
        salted.groupBy(*groups, "_salt")
        .agg(F.countDistinct(value_col).alias("_part"))
    )
    return (
        partial.groupBy(*groups)
        .agg(F.sum("_part").cast("long").alias(out_col))
    )
