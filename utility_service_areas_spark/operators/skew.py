"""Skew-mitigation join (SURVEY.md §6): explicit key salting for the
case AQE's runtime skew-join can't fix — e.g. a build side too large
to broadcast joined on a key whose hot values would pin one reducer.

Mechanics: fact rows get a random-ish salt in [0, n_salts) derived
deterministically from a row id (no RNG — reproducible retries); the
other side is replicated n_salts times with an exploded salt column;
the join key becomes (key, salt), spreading each hot key over n_salts
reducers. Replication cost is n_salts × |right|, so this is used for
moderate-size right sides with known-hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    right: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the shuffle spread over n_salts
    partitions per key value. ``salt_source`` is any deterministic
    per-row fact expression (an id column) used to derive the salt.
    """
    salted_facts = facts.withColumn("__salt", F.pmod(F.hash(salt_source), F.lit(n_salts)))
    replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_facts.join(replicated, on=[key, "__salt"], how=how)
    return out.drop("__salt")
