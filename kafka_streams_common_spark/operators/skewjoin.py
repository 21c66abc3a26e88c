"""Skew-salted equi-join for hot-key fact/dimension joins.

The reference joins streams to tables with Kafka Streams' hash
partitioning (``DynamicTopologyBuilder.java:120-160``) and has no
answer for a hot key beyond "one partition burns". At 100 TB the
standard mitigation is salting: append a salt in ``[0, B)`` to the
fact side's join key and explode the dimension side B×, so one hot
key's rows spread across B reducers instead of one.

Spark's AQE skew-join handles MEASURED skew at runtime; explicit
salting is still the tool when skew is known ahead of time (power-law
user activity), when the dimension side is too big to broadcast, or
when AQE's post-shuffle splitting can't apply (e.g. the skewed side
feeds a downstream keyed aggregation that must share the salted
partitioning). The fact side never gets bigger — only the B×
replication of the (small but non-broadcastable) dimension side is
paid, and the explode is map-side with no extra shuffle of facts
beyond the join's own exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_source: str | Column,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join skewed ``facts`` with ``dim`` on the equi-key ``on``.

    ``salt_source`` must be a fact-side column (or expression) that is
    well-distributed per row — typically the fact's unique id. The salt
    is ``pmod(hash(salt_source), salt_buckets)``: deterministic, so the
    join result is reproducible run-to-run (a ``rand()`` salt is not),
    and the output is EXACTLY the unsalted join's rows — salting changes
    the physical partitioning only.

    ``how`` supports 'inner' and 'left' (left keeps fact rows whose key
    misses the dimension — the dimension explode can't drop them because
    every (key, salt) pair exists on the exploded side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_buckets < 1:
        raise ValueError("salt_buckets must be >= 1")
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    salted_facts = facts.withColumn(
        _SALT, F.pmod(F.hash(src), F.lit(salt_buckets)).cast("int")
    )
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_facts.join(salted_dim, [on, _SALT], how).drop(_SALT)
