"""SweetSpotSimilarity kernels (lucene/misc/SweetSpotSimilarity.java).

A ClassicSimilarity subclass where tf and lengthNorm have tunable
"sweet spots":

- ``baselineTf`` (:139-147): 0 for freq 0, ``tf_base`` up to
  ``tf_min``, then ``sqrt(freq + tf_base² − tf_min)``.
- ``hyperbolicTf`` (:161-178): min + (max−min)/2 · (tanh-like curve
  in ``base**(x−xoffset)``) — hard max for spammy fields.
- ``computeLengthNorm`` (:117-133): 1/sqrt(steepness·(|len−min| +
  |len−max| − (max−min)) + 1) — flat 1.0 inside [min, max], falling
  off outside.

All three are pure column expressions (whole-stage codegen); the
searcher's ``sweetspot_exact`` scoring mode composes them with the
ClassicSimilarity idf exactly as the reference class does.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["baseline_tf", "hyperbolic_tf", "compute_length_norm"]


def baseline_tf(
    freq: Column, tf_base: float = 0.0, tf_min: float = 0.0
) -> Column:
    """SweetSpotSimilarity.baselineTf (:139-147)."""
    f = freq.cast("double")
    return (
        F.when(f == 0.0, F.lit(0.0))
        .when(f <= F.lit(float(tf_min)), F.lit(float(tf_base)))
        .otherwise(
            F.sqrt(f + F.lit(float(tf_base) * float(tf_base) - float(tf_min)))
        )
    )


def hyperbolic_tf(
    freq: Column,
    tf_min: float = 0.0,
    tf_max: float = 2.0,
    base: float = 1.3,
    xoffset: float = 10.0,
) -> Column:
    """SweetSpotSimilarity.hyperbolicTf (:161-178)."""
    f = freq.cast("double")
    x = f - F.lit(float(xoffset))
    up = F.pow(F.lit(float(base)), x)
    dn = F.pow(F.lit(float(base)), -x)
    curve = (up - dn) / (up + dn) + F.lit(1.0)
    return F.when(f == 0.0, F.lit(0.0)).otherwise(
        F.lit(float(tf_min))
        + F.lit((float(tf_max) - float(tf_min)) / 2.0) * curve
    )


def compute_length_norm(
    length: Column,
    ln_min: int = 1,
    ln_max: int = 1,
    steepness: float = 0.5,
) -> Column:
    """SweetSpotSimilarity.computeLengthNorm (:117-133)."""
    x = length.cast("double")
    lo, hi = float(ln_min), float(ln_max)
    return F.lit(1.0) / F.sqrt(
        F.lit(float(steepness))
        * (
            F.abs(x - F.lit(lo))
            + F.abs(x - F.lit(hi))
            - F.lit(hi - lo)
        )
        + F.lit(1.0)
    )
