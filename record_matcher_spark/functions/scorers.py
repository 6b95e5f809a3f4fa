"""Scorer registry: named pair-similarity functions on a 0-100 scale.

The reference defines a scorer as ``Callable[[str, str], int | float]``
returning >= 0 (/root/reference/record_matcher/matcher.py:48-52) with one
built-in, ``exact_match = lambda x, y: 100.0 if x == y else 0.0``
(config.py:349), registered by name in a pluggable dict
(config.py:349-400; docstring advertises ``fuzzy_match`` / ``token_match``
names, config.py:325-327).

The Spark build keeps the named-registry contract but a scorer produces a
**Column expression** over two string columns. Catalyst-expressible scorers
(exact, levenshtein ratio, token-set Jaccard) stay JVM-side inside
whole-stage codegen; the rest (jaro_winkler) are Arrow-batched pandas UDFs —
never row-at-a-time Python UDFs.

Every scorer also carries a pure-Python twin (``py``) with identical
semantics, used by the vendored differential oracle and unit tests.

Blank semantics (reference matcher.py:78-81): values are compared as
strings with missing/None coerced to ``""``; ``"" == ""`` scores 100 under
exact_match — consistently, every scorer here scores two blanks as 100 and
one blank vs non-blank as 0 (ratio scorers derive this naturally).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Java \s (ASCII whitespace) — keep the Python twin identical to Spark's
# split(col, '\\s+') so oracle and engine tokenize the same way.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def blank_coalesce(col: Column) -> Column:
    """str-coerce with missing->'' (reference matcher.py:78-81)."""
    return F.coalesce(col.cast("string"), F.lit(""))


# --------------------------------------------------------------------------
# pure-Python twins (oracle + unit tests)
# --------------------------------------------------------------------------


def _py_exact(x: str, y: str) -> float:
    return 100.0 if x == y else 0.0  # reference config.py:349


def _py_levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_levenshtein_ratio(x: str, y: str) -> float:
    denom = max(len(x), len(y), 1)
    return 100.0 * (1.0 - _py_levenshtein(x, y) / denom)


def _py_tokens(s: str) -> set[str]:
    s = s.strip()
    if not s:
        return set()
    return set(_WS_RE.split(s))


def _py_token_set_jaccard(x: str, y: str) -> float:
    tx, ty = _py_tokens(x), _py_tokens(y)
    if not tx and not ty:
        return 100.0
    union = len(tx | ty)
    return 100.0 * len(tx & ty) / union if union else 0.0


def _py_jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not s2_matches[j] and s2[j] == c:
                s1_matches[i] = True
                s2_matches[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if s1_matches[i]:
            while not s2_matches[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def _py_jaro_winkler(x: str, y: str, prefix_weight: float = 0.1) -> float:
    if x == y:
        return 100.0  # includes both-blank => 100 (consistent with exact)
    jaro = _py_jaro(x, y)
    prefix = 0
    for a, b in zip(x[:4], y[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return 100.0 * (jaro + prefix * prefix_weight * (1.0 - jaro))


# --------------------------------------------------------------------------
# Spark-side expressions
# --------------------------------------------------------------------------


def _expr_exact(x: Column, y: Column) -> Column:
    return F.when(x == y, F.lit(100.0)).otherwise(F.lit(0.0))


def _expr_levenshtein_ratio(x: Column, y: Column) -> Column:
    denom = F.greatest(F.length(x), F.length(y), F.lit(1)).cast("double")
    return 100.0 * (F.lit(1.0) - F.levenshtein(x, y).cast("double") / denom)


def _tokens_expr(s: Column) -> Column:
    return F.array_distinct(
        F.filter(F.split(F.trim(s), r"\s+"), lambda t: t != F.lit(""))
    )


def _token_hashes_prep(s: Column) -> Column:
    """Distinct xxhash64 token hashes — the ``prep`` payload.

    Intersect/union cardinalities over 8-byte hashes equal those over the
    token strings except on a 64-bit collision (~2^-64 per token pair —
    negligible even at 10^12 rows, and the Jaccard RATIO only shifts by
    1/|union| if one ever occurs). Shipping longs instead of strings cuts
    the candidate-join shuffle ~3x and replaces string comparisons with
    long compares in the hot intersect loop.
    """
    return F.transform(_tokens_expr(s), lambda t: F.xxhash64(t))


def _expr_token_set_jaccard(x: Column, y: Column) -> Column:
    return _pair_token_set_jaccard(_token_hashes_prep(x), _token_hashes_prep(y))


def _pair_token_set_jaccard(tx: Column, ty: Column) -> Column:
    """Jaccard over pre-tokenized arrays (the ``prep`` fast path: a record
    is tokenized once per side instead of once per candidate pair)."""
    inter = F.size(F.array_intersect(tx, ty)).cast("double")
    union = F.size(F.array_union(tx, ty)).cast("double")
    return F.when(union == 0, F.lit(100.0)).otherwise(100.0 * inter / union)


def _make_pandas_scorer(py_fn: Callable[[str, str], float]):
    """Wrap a pure-Python pair function as an Arrow-batched pandas UDF.

    Batch-level Arrow transfer (the north rule forbids row-at-a-time
    Python UDF registration; the per-element loop runs inside one Arrow
    batch on the Python worker).
    """

    @F.pandas_udf(DoubleType())
    def _scorer(x: pd.Series, y: pd.Series) -> pd.Series:
        xv = x.fillna("").astype(str).to_numpy()
        yv = y.fillna("").astype(str).to_numpy()
        return pd.Series([py_fn(a, b) for a, b in zip(xv, yv)], dtype="float64")

    # Semantically pure — the non-deterministic flag is an optimizer fence:
    # it stops Catalyst from duplicating the call into Filter operators
    # (predicate pushdown would otherwise evaluate the UDF twice per pair —
    # one ArrowEvalPython pass for the gate filter, one for the score).
    _scorer = _scorer.asNondeterministic()

    def expr(x: Column, y: Column) -> Column:
        return _scorer(x, y)

    return expr


@dataclass(frozen=True)
class Scorer:
    """A named scorer: Spark expression + pure-Python twin.

    ``expr`` takes two *normalized* string Columns (already
    ``blank_coalesce``-d) and returns a double Column in [0, 100].
    ``py`` is the oracle twin with byte-identical semantics.
    ``catalyst`` is True when the scorer is a pure Catalyst expression
    (stays inside whole-stage codegen — preferred in the hot path).

    ``prep``/``pair``: optional two-phase form for scorers with expensive
    per-value preprocessing — ``prep(col)`` runs ONCE PER RECORD on each
    side (e.g. tokenization), ``pair(px, py)`` runs per candidate pair over
    the prepped columns. Semantically identical to ``expr``; purely a
    work-motion optimization (a record in a block of size B would
    otherwise be re-preprocessed B times).
    """

    name: str
    expr: Callable[[Column, Column], Column]
    py: Callable[[str, str], float]
    catalyst: bool
    prep: Callable[[Column], Column] | None = None
    pair: Callable[[Column, Column], Column] | None = None


SCORERS: dict[str, Scorer] = {}


def register_scorer(
    name: str,
    expr: Callable[[Column, Column], Column],
    py: Callable[[str, str], float],
    catalyst: bool = False,
    prep: Callable[[Column], Column] | None = None,
    pair: Callable[[Column, Column], Column] | None = None,
) -> Scorer:
    """Register a scorer by name (pluggable registry, reference
    config.py:349-400 + tests/test_config.py:194-202)."""
    scorer = Scorer(name=name, expr=expr, py=py, catalyst=catalyst,
                    prep=prep, pair=pair)
    SCORERS[name] = scorer
    return scorer


register_scorer("exact_match", _expr_exact, _py_exact, catalyst=True)
register_scorer(
    "levenshtein_ratio", _expr_levenshtein_ratio, _py_levenshtein_ratio, catalyst=True
)
register_scorer(
    "token_set_jaccard",
    _expr_token_set_jaccard,
    _py_token_set_jaccard,
    catalyst=True,
    prep=_token_hashes_prep,
    pair=_pair_token_set_jaccard,
)
register_scorer(
    "jaro_winkler",
    _make_pandas_scorer(_py_jaro_winkler),
    _py_jaro_winkler,
    catalyst=False,
)
