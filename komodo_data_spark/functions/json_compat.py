"""MySQL ``->`` compatible JSON access for Spark columns.

The reference extracts every parameter and metric from the ``message`` JSON
column with MySQL's ``->`` operator (SURVEY.md §1.3). Three dialect quirks
decide correctness against the oracle, all reproduced here:

1. ``->`` vs a numeric literal coerces numerically (``message->'$.clientId'
   = 5`` matches ``"5"`` and ``5``; /root/reference/process.py:207). Spark's
   ``get_json_object`` yields a *string* → :func:`jget_num` casts to double
   before comparing.
2. ``->`` in a projection surfaces JSON scalars as text (entity_type comes
   back as the string ``'0'``; /root/reference/test_user_energy.py:70-74).
   :func:`jget` keeps the string form for projections.
3. ``->`` on a key whose value is JSON ``null`` renders the 4-char text
   ``null`` (the dispatcher's validity checks compare against the literal
   string ``"null"``; /root/reference/process.py:352,358,363). Spark's
   ``get_json_object`` returns SQL NULL for both *missing key* and
   *present-but-null*, so :func:`req_param` restores the distinction with a
   structural match on the raw JSON text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# entityType decode map (reference: process.py:161 — an in-place UPDATE with
# nested REPLACE; here a projection-time lookup, same output, no mutation).
ENTITY_DECODE: dict[str, str] = {
    "0": "head",
    "1": "left_hand",
    "2": "right_hand",
    "3": "spawned_entity",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def jget(col: Column | str, path: str) -> Column:
    """``col->path`` as MySQL projects it: a string (JSON scalar as text)."""
    return F.get_json_object(_col(col), path)


def jget_num(col: Column | str, path: str) -> Column:
    """``col->path`` for numeric predicates/arithmetic: double-cast extraction.

    Matches MySQL's numeric coercion when ``->`` output meets a number
    (process.py:83,202-204,207).
    """
    return F.get_json_object(_col(col), path).cast("double")


def decode_entity(col: Column | str) -> Column:
    """Decode entityType codes to names (process.py:159-164) at projection time.

    Unknown codes pass through unchanged — MySQL's REPLACE chain leaves
    non-matching text untouched.
    """
    c = _col(col)
    mapping = F.create_map(
        *[F.lit(x) for kv in ENTITY_DECODE.items() for x in kv]
    )
    return F.coalesce(F.element_at(mapping, c), c)


def req_param(col: Column | str, key: str) -> Column:
    """Extract a top-level request parameter the way MySQL ``->`` does.

    - key present with scalar → its text form
    - key present with JSON null → the literal string ``'null'``
    - key absent → SQL NULL

    The ``null`` case is matched structurally on the raw JSON text because
    ``get_json_object`` collapses it to SQL NULL. Request messages are flat
    one-level objects (process.py:302-303), so the pattern is unambiguous.
    """
    c = _col(col)
    present_null = c.rlike(f'"{key}"\\s*:\\s*null')
    return F.when(present_null, F.lit("null")).otherwise(
        F.get_json_object(c, f"$.{key}")
    )
