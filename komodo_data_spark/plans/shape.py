"""Physical-plan shape helpers.

These functions change no query semantics; they exist because a
straightforward logical plan sometimes optimizes into a pathological
physical plan. Each helper documents the trap it avoids so the lesson
is discoverable next to the code that needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exploded(df: DataFrame, arr: Column, alias: str, *keep: str) -> DataFrame:
    """``select(*keep, explode(arr))`` without the serial-re-evaluation trap.

    ``F.explode`` (outer=false) makes Catalyst add an implicit
    ``size(arr) > 0 AND isnotnull(arr)`` Filter, and PushDownPredicates
    happily pushes that filter below any Exchange — e.g. the round-robin
    repartition used to spread a single-row-group scan across cores. When
    ``arr`` is an expensive derived expression (tokenize + shingle of a
    text column), the pushed filter re-evaluates it (twice: once for
    ``size``, once for ``isnotnull``) serially inside the scan task.
    Measured at sf0.1: 12 s fused vs 0.9 s with this helper.

    ``explode_outer`` generates no implicit filter; the cheap
    ``isnotnull`` on the *generated* attribute cannot be pushed below the
    generator, so the expensive expression is evaluated exactly once, in
    parallel, above the Exchange.

    Caveat: rows whose array *contains* null elements lose those elements
    (plain ``explode`` would emit them). All callers explode arrays built
    from ``concat_ws``/``split``/``sequence``, which never contain nulls.
    """
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())
