"""Skew-resistant join: salting for hot keys (the join-side complement of
``relational.advanced.salted_aggregate``).

At 100 TB a single hot key (the null user, the default merchant, the
viral document) lands one reducer with hours of work.  AQE's skew-join
splitting (enabled in the session factory) handles sort-merge cases at
runtime; explicit salting is the declarative fallback that also works for
shuffled-hash joins and is deterministic at plan time:

* fact side: append a uniform salt in [0, n_salts) to every row's key;
* dim side: replicate each row n_salts times (one per salt value) —
  `explode(sequence(...))`, a narrow op on the SMALL side;
* join on (key, salt) — each hot key now spreads over n_salts reducers.

Semantics are identical to the plain inner join (each fact row matches
exactly the one replicated dim row carrying its salt), verified by the
equality test in tests/test_skew_join.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of a skewed fact against a dim, spread over
    ``n_salts`` reducers per key.

    The salt on the fact side is derived from a hash of the whole row's
    ``monotonically_increasing_id`` substitute — a uniform spread that
    needs no data statistics.  The dim side is replicated ``n_salts``×,
    acceptable because the dim is the small side by contract.
    """
    fact_salted = fact.withColumn(
        "_salt", (F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)))
    )
    dim_replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = fact_salted.join(
        dim_replicated,
        (fact_salted[fact_key] == dim_replicated[dim_key])
        & (fact_salted["_salt"] == dim_replicated["_salt"]),
        how,
    )
    return joined.drop("_salt")
