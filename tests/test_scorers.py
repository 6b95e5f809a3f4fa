"""Scorer unit tests: F5 edge strings + Spark-expression vs pure-Python
twin agreement (FIXTURES.md §F5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from record_matcher_spark.functions.scorers import SCORERS, blank_coalesce

EDGE_PAIRS = [
    ("", ""),  # both blank
    ("abc", ""),  # one blank
    ("", "abc"),
    ("abc", "abc"),  # identical
    ("naïve café 😀", "naïve café 😀"),  # unicode identical
    ("naïve", "naive"),
    ("kitten", "sitting"),  # classic levenshtein
    ("martha", "marhta"),  # classic jaro transposition
    ("dixon", "dicksonx"),  # classic jaro-winkler prefix
    ("the quick brown fox", "fox brown quick the"),  # token permutation
    ("a b c", "a b c d"),
    ("short", "a much longer string entirely"),
    ("MiXeD", "mixed"),  # case-sensitive by design
    ("a  b", "a b"),  # whitespace runs
    (" leading", "leading"),
]


@pytest.mark.parametrize("name", sorted(SCORERS))
def test_spark_expr_matches_python_twin(spark, name):
    scorer = SCORERS[name]
    df = spark.createDataFrame(EDGE_PAIRS, "x string, y string")
    rows = (
        df.select(
            "x",
            "y",
            scorer.expr(blank_coalesce(F.col("x")), blank_coalesce(F.col("y"))).alias(
                "s"
            ),
        )
        .orderBy("x", "y")
        .collect()
    )
    for row in rows:
        expected = scorer.py(row["x"] or "", row["y"] or "")
        assert math.isclose(row["s"], expected, rel_tol=0, abs_tol=1e-9), (
            name,
            row["x"],
            row["y"],
            row["s"],
            expected,
        )
        assert 0.0 <= row["s"] <= 100.0


def test_blank_semantics():
    """Both blank => 100, one blank => 0, for every scorer (FIXTURES F5)."""
    for name, sc in SCORERS.items():
        assert sc.py("", "") == 100.0, name
        assert sc.py("abc", "") == 0.0, name
        assert sc.py("", "abc") == 0.0, name
        assert sc.py("same", "same") == 100.0, name


def test_np_jaro_winkler_kernel_bitwise_identical():
    """The vectorized numpy JW batch kernel must agree BIT-FOR-BIT with the
    pure-Python twin (the generated SQL oracle and the driver's value hash
    both depend on exact doubles). Sweeps edge pairs + seeded random pairs
    including chunk-boundary length mixes."""
    import random

    import numpy as np
    import pandas as pd

    from record_matcher_spark.functions.scorers import (
        _np_jaro_winkler_batch,
        _py_jaro_winkler,
    )

    rng = random.Random(0xC0FFEE)
    alpha = "abcdef XYZ#01"
    xs, ys = [], []
    for a, b in EDGE_PAIRS:
        xs.append(a)
        ys.append(b)
    for _ in range(4000):
        xs.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40))))
        ys.append("".join(rng.choice(alpha) for _ in range(rng.randrange(0, 40))))
    for _ in range(1000):  # near-duplicates (single-char edits)
        s = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 30)))
        t = list(s)
        for _ in range(rng.randrange(0, 3)):
            p = rng.randrange(len(t))
            t[p] = rng.choice(alpha)
        xs.append(s)
        ys.append("".join(t))
    got = _np_jaro_winkler_batch(pd.Series(xs), pd.Series(ys)).to_numpy()
    exp = np.array([_py_jaro_winkler(a, b) for a, b in zip(xs, ys)])
    bad = np.nonzero(got != exp)[0]
    assert len(bad) == 0, [(xs[i], ys[i], got[i], exp[i]) for i in bad[:5]]


def test_np_jaro_winkler_transposed_skew_shapes():
    """A batch mixing (tiny, huge) and (huge, tiny) pairs must stay
    bit-identical to the Python twin (the batch swaps pairs to
    (shorter, longer) — JW symmetry) AND must not allocate a chunk of
    n * Lmax^2 cells: before the shape-keyed chunking this exact mix put
    both orientations in one chunk with L1max = L2max = huge."""
    import random
    import time

    import numpy as np
    import pandas as pd

    from record_matcher_spark.functions.scorers import (
        _np_jaro_winkler_batch,
        _py_jaro_winkler,
    )

    rng = random.Random(0xD15C)
    big = "".join(rng.choice("abcdef gh") for _ in range(30000))
    xs, ys = [], []
    for i in range(200):
        small = "".join(rng.choice("abcdef gh") for _ in range(3))
        if i % 2:
            xs.append(small), ys.append(big)
        else:
            xs.append(big), ys.append(small)
    t0 = time.perf_counter()
    got = _np_jaro_winkler_batch(pd.Series(xs), pd.Series(ys)).to_numpy()
    dt = time.perf_counter() - t0
    exp = np.array([_py_jaro_winkler(a, b) for a, b in zip(xs, ys)])
    assert (got == exp).all()
    # 200 pairs of area 3x30000 ~= 0.5 * cell budget: the whole batch is
    # a couple of bounded chunks; the old product-sorted path ran
    # 200 * 30000^2 cells (~100x budget) here and took minutes.
    assert dt < 30, f"skewed-shape chunking regressed: {dt:.1f}s"


def test_known_values():
    assert SCORERS["exact_match"].py("a", "b") == 0.0
    # levenshtein("kitten","sitting") = 3, max len 7
    assert math.isclose(
        SCORERS["levenshtein_ratio"].py("kitten", "sitting"), 100 * (1 - 3 / 7)
    )
    # classic JW: martha/marhta = 0.9611...
    assert math.isclose(
        SCORERS["jaro_winkler"].py("martha", "marhta"), 96.11111111111111, abs_tol=1e-9
    )
    # token permutation => full jaccard
    assert SCORERS["token_set_jaccard"].py("a b c", "c a b") == 100.0
    assert math.isclose(
        SCORERS["token_set_jaccard"].py("a b c", "a b c d"), 75.0
    )


def test_bounded_levenshtein_matches_full_above_threshold(spark):
    """``Scorer.bounded`` contract (scoring pre-gate): for every pair the
    banded kernel returns the EXACT unbounded ratio when that ratio is
    >= threshold and exact 0.0 otherwise — over edge pairs plus random
    near-threshold strings, at several thresholds."""
    import random

    from record_matcher_spark.functions.scorers import (
        _bounded_levenshtein_ratio,
    )

    rng = random.Random(0xB07)
    pairs = list(EDGE_PAIRS)
    for _ in range(120):
        n = rng.randint(1, 24)
        x = "".join(rng.choice("abcde ") for _ in range(n))
        # mutate a random fraction so ratios cluster around mid-range
        y = "".join(
            rng.choice("abcde ") if rng.random() < rng.random() else ch
            for ch in x
        )
        pairs.append((x, y))
    df = spark.createDataFrame(pairs, "x string, y string")
    scorer = SCORERS["levenshtein_ratio"]
    for threshold in (30.0, 50.0, 75.0, 100.0):
        xs, ys = blank_coalesce(F.col("x")), blank_coalesce(F.col("y"))
        rows = df.select(
            scorer.expr(xs, ys).alias("full"),
            _bounded_levenshtein_ratio(xs, ys, threshold).alias("bounded"),
        ).collect()
        for r in rows:
            expected = r["full"] if r["full"] >= threshold else 0.0
            assert r["bounded"] == expected, (threshold, r)
