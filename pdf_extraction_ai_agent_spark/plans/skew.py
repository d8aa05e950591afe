"""Skew mitigation for shuffle joins — the two production answers and when
to use which:

1. AQE skew-join split (spark.sql.adaptive.skewJoin.*): free, runtime,
   handles skew DISCOVERED at execution; the right default. Pinned working
   in tests/test_plan_shapes.py::test_aqe_skew_join_split_engages.
2. Explicit salting (``salted_join``): for skew KNOWN up front (a
   mega-customer, a null-ish default key) or engines/stages where AQE
   can't split (e.g. a skewed side feeding a stateful op). The fact side
   gets salt = pmod(xxhash64(row position, entire row), n_salts); the dim
   side is replicated n_salts× with an exploded salt column, and the join
   keys become (key, salt). Any salt assignment is CORRECT for an inner
   equi-join — each fact row meets exactly the dim copy carrying its salt —
   determinism just keeps reruns bit-identical.

Cost model: salting multiplies the replicated side by n_salts — use it when
|dim| · n_salts ≪ |fact-hot-key partition|, which is exactly the regime
where one reducer would otherwise own the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with the hot-key shuffle spread over
    ``n_salts`` reducers. Returns fact⋈dim with the salt column dropped;
    column set identical to ``fact.join(dim, on, how)``."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # Salt = hash(row values + per-row position). The positional component
    # (monotonically_increasing_id = partition_id<<33 | row offset) matters:
    # a values-only hash sends IDENTICAL duplicate rows on the hot key to ONE
    # salt bucket — the exact degenerate hot-key case salting exists to
    # spread. Position makes duplicates fan out round-robin-ish. Still
    # deterministic for reruns over the same input layout (Spark's file-split
    # planning is deterministic for fixed files/config); any salt assignment
    # is CORRECT regardless (each fact row meets exactly its dim copy).
    salted_fact = fact.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id(), *fact.columns),
            F.lit(n_salts),
        ).cast("int"),
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_fact.join(salted_dim, on + [SALT_COL], how).drop(SALT_COL)
