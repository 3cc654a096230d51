"""Engine-wide production/oracle-parity switch.

Several operator families carry a deliberate "oracle-parity tax" so the
driver can hash their results against a DuckDB oracle bit-for-bit:

- **decimal-quantized double sums** (`operators/zoom.py:exact_sum`):
  order-independent Σ over decimals instead of a plain double sum;
- **md5-based dedup hashing** (`operators/dedup.py`): cross-engine
  reproducible digests instead of the JVM-side `xxhash64`;
- **exact pair dots** (`operators/similarity.py`, ``exact=True``):
  decimal chain-sum dot products instead of `F.zip_with` double sums.

Each family already exposes a local knob (``hash_fn=``, ``exact=``,
plain ``F.sum``). This module is the ONE switch that flips all their
DEFAULTS to the production (fast) path:

    import oxbow_spark.config as cfg
    cfg.set_production(True)        # or: export OXBOW_SPARK_PRODUCTION=1

Semantics under production mode (measured deltas in SCALE.md):

- sums lose order-independent bit-reproducibility (normal double agg —
  same values any engine computes by default; the quantized path is
  only needed to hash-match an external oracle);
- dedup digests/band keys become xxhash64 (same plan shape, same
  dedup GUARANTEES — candidate generation is still banded LSH and the
  verify stage still enforces the Jaccard threshold — but the sampled
  candidate set differs because the hash family differs);
- similarity cosines are double zip_with sums (values drift at ~1e-12;
  drop/keep decisions are threshold-stable unless a pair sits within
  float error of the threshold).

Explicit per-call arguments always win over the global default.
"""

from __future__ import annotations

import os

_PRODUCTION: bool = os.environ.get(
    "OXBOW_SPARK_PRODUCTION", "").strip().lower() in ("1", "true", "yes", "on")


def set_production(on: bool) -> None:
    """Flip every oracle-parity default to the production path (or
    back). Affects only call sites that do not pass the local knob."""
    global _PRODUCTION
    _PRODUCTION = bool(on)


def production() -> bool:
    return _PRODUCTION


def default_hash_fn() -> str:
    """Dedup hash family default: cross-engine 'md5' for oracle parity,
    JVM 'xxhash64' in production."""
    return "xxhash64" if _PRODUCTION else "md5"


def default_exact() -> bool:
    """Similarity dot-product default: decimal chain-sum (True) for
    oracle parity, double zip_with sum (False) in production."""
    return not _PRODUCTION
