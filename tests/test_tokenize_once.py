"""Tokenize-once fast paths: the rollup's tok_hashes columns must be
bit-equal (as sets) to the per-consumer tokenizations they replace, the
MinHash expression path must emit identical keys to the explode path, the
prepped-column scoring override must score identically, and the CC
canonicalization must not change components.

Reference anchor: the reference tokenizes per scorer call
(/root/reference/record_matcher/*); this repo moves that work to one
aggregation per corpus — these tests pin that the motion is semantics-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from record_matcher_spark.config import ColumnRule, MatchConfig
from record_matcher_spark.datagen import generate_transcripts
from record_matcher_spark.functions.scorers import _token_hashes_prep
from record_matcher_spark.operators.blocking import (
    minhash_band_keys,
    _tokens,
)
from record_matcher_spark.operators.cluster import connected_components
from record_matcher_spark.operators.rollup import rollup_conversations
from record_matcher_spark.operators.scoring import score_candidate_pairs


def assert_df_equal(a, b):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert a.columns == b.columns
    assert ra == rb, (ra[:3], rb[:3])


def _conv(spark, n=60, seed=11):
    t, _ = generate_transcripts(spark, n, seed=seed, num_partitions=4)
    return rollup_conversations(t, tokens=True).drop("turns").cache()


def test_tok_hashes_match_full_text_tokenization(spark):
    """tok_hashes (case-sensitive) == scorer prep of full_text — same
    arrays (the rollup uses the prep expression itself), and as SETS they
    equal hashing the distinct raw tokens (hash-before-distinct
    equivalence)."""
    conv = _conv(spark)
    chk = conv.select(
        "conv_id",
        F.array_sort("tok_hashes").alias("got"),
        F.array_sort(_token_hashes_prep(F.col("full_text"))).alias("want"),
        F.array_sort(
            F.transform(
                _tokens(F.col("full_text"), lowercase=False),
                lambda t: F.xxhash64(t),
            )
        ).alias("want_raw"),
    )
    bad = chk.where(
        (F.col("got") != F.col("want")) | (F.col("got") != F.col("want_raw"))
    )
    assert bad.count() == 0, bad.limit(3).collect()


def test_minhash_precomputed_hashes_keys_identical(spark):
    """The precomputed-hashes path (tok_hashes) and the tokenizing path
    (full_text) produce the identical (_id, _k) key set — the transcript
    family is case-sensitive on both paths."""
    conv = _conv(spark)
    key = minhash_band_keys("full_text", num_hashes=16, bands=4,
                            hashes_column="tok_hashes", lowercase=False)
    fast = key.keyed(conv, "conv_id")
    slow = key.keyed(conv.drop("tok_hashes"), "conv_id")
    assert_df_equal(fast, slow)


def test_minhash_lowercase_family_distinct_from_raw(spark):
    """lowercase=True (generic default) and lowercase=False (transcript
    family) give the same keys on case-clean text and different keys when
    case differs — pinning that the normalization knob is real."""
    rows = [("a", "alpha beta gamma"), ("b", "Alpha beta gamma")]
    df = spark.createDataFrame(rows, ["id", "full_text"])
    lo = minhash_band_keys("full_text", 8, 2).keyed(df, "id")
    raw = minhash_band_keys("full_text", 8, 2, lowercase=False).keyed(df, "id")
    lo_keys = {(r["_id"], r["_k"]) for r in lo.collect()}
    raw_keys = {(r["_id"], r["_k"]) for r in raw.collect()}
    lo_a = {k for i, k in lo_keys if i == "a"}
    lo_b = {k for i, k in lo_keys if i == "b"}
    raw_a = {k for i, k in raw_keys if i == "a"}
    raw_b = {k for i, k in raw_keys if i == "b"}
    assert lo_a == lo_b  # case-folded: identical signatures
    assert raw_a != raw_b  # raw: the capitalized token changes draws


def test_prepped_override_scores_identical(spark):
    """ColumnRule.prepped=tok_hashes scores bit-identically to the
    prep-expression path. (Both sides resolve exact_match through the
    registry's hash-prep — the hash-vs-string-equality differential is
    test_exact_hash_prep_vs_string_equality below.)"""
    conv = _conv(spark)
    plain = conv.drop("tok_hashes", "tok_hashes_lower")
    cand = (
        conv.alias("a")
        .join(conv.alias("b"), F.col("a.role_seq") == F.col("b.role_seq"))
        .select(
            F.col("a.conv_id").alias("x_id"), F.col("b.conv_id").alias("y_id")
        )
        .where(F.col("x_id") != F.col("y_id"))
        .distinct()
    )
    rules = lambda prepped: (
        ColumnRule("full_text", ("full_text",), scorer="token_set_jaccard",
                   threshold=40.0, cutoff=False, prepped=prepped),
        ColumnRule("role_seq", ("role_seq",), scorer="exact_match"),
        ColumnRule("tool_seq", ("tool_seq",), scorer="exact_match"),
    )
    mk = lambda prepped: MatchConfig(
        rules=rules(prepped), required_threshold=45.0,
        duplicate_threshold=0.0, x_id="conv_id", y_id="conv_id",
    )
    fast = score_candidate_pairs(conv, conv, cand, mk("tok_hashes"))
    slow = score_candidate_pairs(plain, plain, cand, mk(None))
    assert_df_equal(fast, slow)


def test_exact_hash_prep_vs_string_equality(spark):
    """The exact_match hash-prep path (xxhash64 compare) must score
    bit-identically to a TRUE string-equality scorer: a registry variant
    with no prep resolves through scorer.expr on the normalized strings,
    so this is a real differential over the prep change (round-4 review
    flagged that no test exercised hash-vs-string equality)."""
    from record_matcher_spark.functions.scorers import (
        SCORERS, _expr_exact, _py_exact, register_scorer,
    )

    name = "__test_exact_strings"
    register_scorer(name, _expr_exact, _py_exact, catalyst=True)
    try:
        conv = _conv(spark)
        cand = (
            conv.alias("a")
            .join(conv.alias("b"), F.col("a.n_turns") == F.col("b.n_turns"))
            .select(
                F.col("a.conv_id").alias("x_id"),
                F.col("b.conv_id").alias("y_id"),
            )
            .where(F.col("x_id") != F.col("y_id"))
            .limit(500)
        )
        mk = lambda scorer: MatchConfig(
            rules=(
                ColumnRule("role_seq", ("role_seq",), scorer=scorer),
                ColumnRule("tool_seq", ("tool_seq",), scorer=scorer),
                ColumnRule("first_user_text", ("first_user_text",),
                           scorer=scorer),
            ),
            required_threshold=45.0, duplicate_threshold=0.0,
            x_id="conv_id", y_id="conv_id",
        )
        hashed = score_candidate_pairs(conv, conv, cand, mk("exact_match"))
        strings = score_candidate_pairs(conv, conv, cand, mk(name))
        assert_df_equal(hashed, strings)
    finally:
        SCORERS.pop(name, None)


def test_minhash_lower_precomputed_keys_identical(spark):
    """The tok_hashes_lower fast path (the DEFAULT transcript family) and
    the lowercase-retokenizing path produce the identical (_id, _k) key
    set — same pin as the case-sensitive twin above, for the case-folded
    normalization the default keys actually use."""
    conv = _conv(spark)
    key = minhash_band_keys("full_text", num_hashes=16, bands=4)
    fast = key.keyed(conv, "conv_id")
    slow = key.keyed(conv.drop("tok_hashes_lower"), "conv_id")
    assert_df_equal(fast, slow)


def test_minhash_hashes_column_type_validated(spark):
    """A present-but-wrongly-typed hashes_column is a hard error, not a
    silent recall loss (round-4 review: the fast path engaged on column
    NAME alone)."""
    import pytest

    rows = [("a", "alpha beta", ["alpha", "beta"])]
    df = spark.createDataFrame(
        rows, ["id", "full_text", "tok_hashes_lower"]
    )  # array<string>, not array<long>
    key = minhash_band_keys("full_text", 8, 2)
    with pytest.raises(TypeError, match="array<bigint>"):
        key.keyed(df, "id")


def test_prepped_column_absent_falls_back(spark):
    """A config naming a prepped column works unchanged on inputs that
    don't carry it (presence-based fallback)."""
    conv = _conv(spark)
    plain = conv.drop("tok_hashes", "tok_hashes_lower")
    cand = plain.select(F.col("conv_id").alias("x_id")).crossJoin(
        plain.select(F.col("conv_id").alias("y_id"))
    ).limit(200)
    cfg = MatchConfig(
        rules=(
            ColumnRule("full_text", ("full_text",),
                       scorer="token_set_jaccard", threshold=40.0,
                       cutoff=False, prepped="tok_hashes"),
        ),
        required_threshold=45.0, duplicate_threshold=0.0,
        x_id="conv_id", y_id="conv_id",
    )
    out = score_candidate_pairs(plain, plain, cand, cfg)
    assert out.count() > 0


def test_cc_directed_vs_canonical_components_identical(spark):
    """CC over a directed edge list equals CC over any edge direction mix
    (canonicalization is internal); self-loops keep their nodes."""
    rows = [("a", "b"), ("b", "a"), ("b", "c"), ("x", "y"), ("z", "z"),
            ("m", "n"), ("n", "m"), ("n", "o"), ("o", "m")]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, "src", "dst").collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "x": "x", "y": "x", "z": "z",
        "m": "m", "n": "m", "o": "m",
    }


def test_prepped_scoring_plan_has_no_tokenization(spark):
    """With ColumnRule.prepped engaged on both sides, the pair-scoring
    plan must NOT re-split any text: the only split in the whole DAG is
    the rollup's tokenize-once projection (pinned by plan string — a
    regression would re-tokenize per join side)."""
    from record_matcher_spark.pipeline import default_transcript_match_config

    conv = _conv(spark)
    cand = conv.select(F.col("conv_id").alias("x_id")).crossJoin(
        conv.select(F.col("conv_id").alias("y_id"))
    ).limit(100)
    cfg = default_transcript_match_config()
    out = score_candidate_pairs(conv, conv, cand, cfg, lazy_uniqueness=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # conv is cached, so its rollup-side split lives only in the
    # InMemoryRelation descriptor; the scoring operators above the scans
    # must not contain any split/lower tokenization
    above_cache = plan.split("InMemoryRelation")[0]
    assert "split(" not in above_cache, above_cache


def test_rollup_tokens_plan_exchange_free_on_clustered_input(spark):
    """tokens=True must not add a shuffle on a CACHED conv_id-clustered
    input (the bench/production layout): both aggregates read the cache's
    hash(conv_id) partitioning and the join reuses it — zero
    'Exchange hashpartitioning' in the whole plan."""
    t, _ = generate_transcripts(spark, 40, seed=7, num_partitions=4)
    clustered = t.repartition(8, "conv_id").cache()
    clustered.count()
    try:
        plan = (
            rollup_conversations(clustered, tokens=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the cache descriptor's own REPARTITION_BY_NUM lines are not
        # executed exchanges; any shuffle ADDED by this plan would carry
        # the ENSURE_REQUIREMENTS marker
        added = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
            and "ENSURE_REQUIREMENTS" in ln
        ]
        assert not added, plan
    finally:
        clustered.unpersist()
