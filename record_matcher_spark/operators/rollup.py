"""Turn → conversation rollup.

Maps the reference's flat "record" model (records.py:5-30) onto the
north-star transcript payload: one record per conversation, with derived
match columns, built from the turns table in a single groupBy.

Pinned invariant (BASELINE.json ``input_hint``): per-turn text equality
under stable turn ordering — the ``turns`` array is sorted by
``(turn_idx, ts)`` and exploding it back yields exactly the input rows
(tests/test_rollup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Derived match columns and what they're for:
#   full_text        whole-conversation fuzzy similarity (token_set_jaccard)
#   first_user_text  cheap high-signal fuzzy column (levenshtein/jw)
#   role_seq         exact/blocking column (conversation shape)
#   tool_seq         exact column (tool usage fingerprint)
#   n_turns          blocking bucket
#   ts_min           time-window blocking if needed
CONVERSATION_COLUMNS = [
    "conv_id",
    "n_turns",
    "full_text",
    "first_user_text",
    "role_seq",
    "tool_seq",
    "ts_min",
    "turns",
]


def rollup_conversations(transcripts: DataFrame) -> DataFrame:
    """One row per conv_id with ordered turns + derived match columns.

    One shuffle (groupBy conv_id). The per-conversation turn order is
    ``sort_array`` over structs keyed by (turn_idx, ts) — deterministic,
    executor-side, no window needed.
    """
    turn = F.struct(
        F.col("turn_idx"),
        F.col("ts"),
        F.col("role"),
        F.col("text"),
        F.coalesce(F.col("tool"), F.lit("")).alias("tool"),
    )
    agg = transcripts.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(turn)).alias("turns"),
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("ts_min"),
    )
    texts = F.transform("turns", lambda t: t["text"])
    roles = F.transform("turns", lambda t: t["role"])
    tools = F.filter(
        F.transform("turns", lambda t: t["tool"]), lambda s: s != F.lit("")
    )
    first_user = F.filter(
        "turns", lambda t: t["role"] == F.lit("user")
    )[0]["text"]
    return agg.select(
        "conv_id",
        "n_turns",
        F.array_join(texts, "\n").alias("full_text"),
        F.coalesce(first_user, F.lit("")).alias("first_user_text"),
        F.array_join(roles, ">").alias("role_seq"),
        F.array_join(tools, ">").alias("tool_seq"),
        "ts_min",
        "turns",
    )


def explode_turns(conversations: DataFrame) -> DataFrame:
    """Inverse of the rollup (for the per-turn-equality invariant test)."""
    t = F.explode("turns").alias("t")
    return conversations.select("conv_id", t).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )
