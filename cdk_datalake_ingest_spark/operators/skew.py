"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (on by default, session.py) handles most hot
keys at runtime; explicit salting remains the tool when a single key is
so hot that even split shuffle blocks overwhelm one reducer, or when
the build side must stay a shuffle join (too big to broadcast). The
standard recipe: spread each left row across ``num_salts`` synthetic
sub-keys, replicate the right side once per salt, join on key+salt —
pair multiplicity is unchanged, so results equal the plain join.

Valid for ``inner`` and ``left`` joins (unmatched RIGHT rows would be
emitted once per salt, so right/full outer are rejected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join ``left`` (the large, skewed side) with ``right`` on
    ``on``, salting the hot keys across ``num_salts`` reducers.

    The salt is derived from ``monotonically_increasing_id`` — stable
    for a given input partitioning and spread uniformly within every
    key group, which is what breaks the hot key apart."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} "
            "(right rows are replicated per salt)"
        )
    salt_l = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts)
    )
    lhs = left.withColumn("__salt", salt_l)
    rhs = right.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(num_salts - 1).cast("bigint")
            )
        ),
    )
    out = lhs.join(rhs, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
