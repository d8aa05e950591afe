"""Skew mitigation for shuffle joins — the two production answers and when
to use which:

1. AQE skew-join split (spark.sql.adaptive.skewJoin.*): free, runtime,
   handles skew DISCOVERED at execution; the right default. Pinned working
   in tests/test_plan_shapes.py::test_aqe_skew_join_split_engages.
2. Explicit salting (``salted_join``): for skew KNOWN up front (a
   mega-customer, a null-ish default key) or engines/stages where AQE
   can't split (e.g. a skewed side feeding a stateful op). The fact side
   gets salt = pmod(xxhash64(entire row [+ row position, opt-in]), n_salts)
   — see salted_join's docstring for the determinism tradeoff; the dim
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
    spread_identical: bool = False,
) -> DataFrame:
    """Inner/left equi-join with the hot-key shuffle spread over
    ``n_salts`` reducers. Returns fact⋈dim with the salt column dropped;
    column set identical to ``fact.join(dim, on, how)``.

    Salt choice (any assignment is CORRECT — each fact row meets exactly
    the dim copy carrying its salt — the choice only affects spreading):

    - default: salt = hash of the full fact row. Deterministic under any
      recomputation, hence safe when ``fact`` sits downstream of a shuffle
      (a nondeterministic salt there risks the SPARK-23207 class of
      duplicated/lost rows on partial stage retry). Caveat: IDENTICAL
      duplicate rows on a hot key all land in one salt bucket.
    - ``spread_identical=True``: mixes the row position
      (monotonically_increasing_id) into the salt so identical duplicates
      fan out — use for degenerate duplicate-heavy corpora, but ONLY when
      ``fact`` is read directly from stable storage (file scan): position
      is stable for a fixed file layout but NOT across recomputation of a
      shuffled upstream.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_parts = [F.xxhash64(*fact.columns)]
    if spread_identical:
        salt_parts = [F.xxhash64(F.monotonically_increasing_id(), *fact.columns)]
    salted_fact = fact.withColumn(
        SALT_COL, F.pmod(salt_parts[0], F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_fact.join(salted_dim, on + [SALT_COL], how).drop(SALT_COL)
