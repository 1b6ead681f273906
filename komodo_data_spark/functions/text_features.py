"""Shared text-feature column builders (tokens, shingles, MinHash, SimHash).

Everything here is a *pure Catalyst expression* — built-in string / array /
higher-order functions only, no Python UDFs — so the hot path stays inside
whole-stage codegen and the same formula can be mirrored 1:1 in ANSI SQL for
the DuckDB oracle. Hash primitive is md5 (identical hex output in Spark,
DuckDB, and Python hashlib), and MinHash minima are taken *lexicographically
over the hex strings*, which is a valid uniform min-hash and engine-portable.

Scale notes (100 TB): every helper is per-row and embarrassingly parallel —
no shuffle, no state. The expensive downstream ops (shingle self-joins) live
in operators/dedup.py which documents their scale strategy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

#: Tiny per-language stopword lists for the heuristic language identifier.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "de": ["der", "die", "das", "und", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "es": ["el", "la", "y", "los", "que", "una"],
}

#: Stopwords used by the quality scorer (English core).
QUALITY_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens of lower(trim(text)).

    Oracle twin: ``regexp_split_to_array(trim(lower(text)), '\\s+')``.
    """
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def sql_tokens(text_col: str = "text") -> str:
    return f"regexp_split_to_array(trim(lower({text_col})), '\\s+')"


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined). Docs shorter than n tokens
    yield an empty array, not null.

    Implementation: zip the token array against its n-1 shifted copies and
    concat element-wise — ~2× faster than the transform(sequence)+slice
    form (no per-position array allocation), same values in the same
    first-occurrence order, so array_distinct output is identical.
    """
    # NB: guard short docs explicitly — Spark's sequence(1, 0) yields the
    # DESCENDING [1, 0], not an empty array; and slice() with a negative
    # length throws (the CASE keeps it unevaluated for short docs).
    m = F.size(toks) - (n - 1)
    zipped = F.slice(toks, 1, m)
    for k in range(1, n):
        zipped = F.zip_with(
            zipped,
            F.slice(toks, 1 + k, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(toks) >= n, F.array_distinct(zipped)).otherwise(
        F.array().cast("array<string>")
    )


def sql_shingles(toks_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (list comprehension, inclusive slices)."""
    return (
        f"list_distinct([array_to_string(({toks_expr})[i:i+{n - 1}], ' ') "
        f"for i in range(1, greatest(len({toks_expr}) - {n - 1}, 0) + 1)])"
    )


def minhash(sh: Column, seed: int) -> Column:
    """One MinHash coordinate: lexicographic min of md5('h{seed}|' || shingle).

    Null when the shingle set is empty.
    """
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"h{seed}|"), s)))
    )


def sql_minhash(sh_expr: str, seed: int) -> str:
    return f"list_min(list_transform({sh_expr}, s -> md5('h{seed}|' || s)))"


def simhash(toks: Column, bits: int = 16) -> Column:
    """SimHash over the distinct token set: bit k is set when the number of
    tokens whose md5 hex digit k is odd exceeds half the token count
    (equivalently, the +1/-1 vote sum is positive). Pure Catalyst expression.
    """
    distinct = F.array_distinct(toks)
    out = F.lit(0).cast("long")
    for k in range(bits):
        # vote_k = count of tokens with odd hex digit k of md5(token)
        ones = F.aggregate(
            distinct,
            F.lit(0),
            lambda acc, t: acc
            + (
                (F.instr(F.lit(HEX), F.substring(F.md5(t), k + 1, 1)) - 1) % 2
            ).cast("int"),
        )
        bit = (ones * 2 > F.size(distinct)).cast("long")
        out = out + bit * F.lit(2**k).cast("long")
    return out


def sql_simhash(toks_expr: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`simhash` (same md5-hex-digit parity votes)."""
    terms = []
    for k in range(bits):
        ones = (
            f"list_sum(list_transform(list_distinct({toks_expr}), "
            f"t -> (strpos('{HEX}', substr(md5(t), {k + 1}, 1)) - 1) % 2))"
        )
        terms.append(
            f"(CASE WHEN {ones} * 2 > len(list_distinct({toks_expr})) "
            f"THEN {2**k} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"
