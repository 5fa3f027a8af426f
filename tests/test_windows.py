"""Conversation-window operator tests on hand-built mini conversations."""

import datetime as dt

from pii_redaction_data_pipeline_spark.operators.windows import (
    with_conversation_flags,
)

TS = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, tool, TS) for c, i, r, t, tool in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _flags(df):
    out = df.orderBy("conv_id", "turn_idx").collect()
    return [(r.is_duplicate_turn, r.is_tool_loop) for r in out]


def test_duplicate_turn_later_occurrence_only(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "user", "hello there", None),
            ("c1", 1, "assistant", "hi, how can i help", None),
            ("c1", 2, "user", "hello there", None),  # dup of 0
            ("c1", 3, "user", "  Hello   THERE ", None),  # dup after normalization
        ],
    )
    assert _flags(with_conversation_flags(df)) == [
        (False, False),
        (False, False),
        (True, False),
        (True, False),
    ]


def test_duplicate_scoped_per_conversation(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "user", "same text", None),
            ("c2", 0, "user", "same text", None),  # different conv: not a dup
        ],
    )
    assert _flags(with_conversation_flags(df)) == [(False, False), (False, False)]


def test_tool_loop_run_of_three(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "tool", "result A", "search"),
            ("c1", 1, "tool", "result A", "search"),
            ("c1", 2, "tool", "result A", "search"),
            ("c1", 3, "user", "thanks", None),
            ("c1", 4, "tool", "result A", "search"),  # separate run of 1
        ],
    )
    assert _flags(with_conversation_flags(df)) == [
        (False, False),
        (False, True),
        (False, True),
        (False, False),
        (False, False),
    ]


def test_tool_run_of_two_not_a_loop(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "tool", "result A", "search"),
            ("c1", 1, "tool", "result A", "search"),
        ],
    )
    assert _flags(with_conversation_flags(df)) == [(False, False), (False, False)]


def test_tool_loop_requires_same_tool_and_text(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "tool", "result A", "search"),
            ("c1", 1, "tool", "result A", "exec"),  # different tool
            ("c1", 2, "tool", "result A", "search"),
            ("c1", 3, "tool", "result B", "search"),  # different text
        ],
    )
    flags = _flags(with_conversation_flags(df))
    assert all(not loop for _, loop in flags)


def test_tool_turns_exempt_from_duplicate_rule(spark):
    df = _df(
        spark,
        [
            ("c1", 0, "tool", "result A", "search"),
            ("c1", 5, "tool", "result A", "search"),  # non-consecutive repeat
        ],
    )
    assert _flags(with_conversation_flags(df)) == [(False, False), (False, False)]


def test_null_text_turn_is_dropped(spark):
    """A NULL-text turn must be dropped (too_short), never silently kept
    via NULL comparison propagation."""
    from pii_redaction_data_pipeline_spark.config import PipelineConfig
    from pii_redaction_data_pipeline_spark.plans.pipeline import annotate

    rows = [
        ("c1", 0, "user", None, None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant",
         "a perfectly fine long answer with plenty of normal words here.",
         None, "2024-01-01 00:00:01"),
        ("c1", 2, "user", "", None, "2024-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    out = {r["turn_idx"]: r for r in
           annotate(df, PipelineConfig(), spark)
           .select("turn_idx", "keep", "drop_reasons").collect()}
    assert out[0]["keep"] is False and "too_short" in out[0]["drop_reasons"]
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and "too_short" in out[2]["drop_reasons"]


def test_conversation_verdict(spark):
    from pii_redaction_data_pipeline_spark.operators.windows import (
        conversation_verdict,
    )

    rows = [
        ("a", 1, True), ("a", 2, True), ("a", 3, False),   # 2/3 kept
        ("b", 1, False), ("b", 2, False), ("b", 3, True),  # 1/3 kept
        ("c", 1, False), ("c", 2, False),                  # 0 kept
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, keep boolean")
    out = {r["conv_id"]: r for r in conversation_verdict(df, 0.5, 1).collect()}
    assert out["a"]["conv_keep"] is True and out["a"]["n_kept"] == 2
    assert out["b"]["conv_keep"] is False and abs(out["b"]["kept_frac"] - 1 / 3) < 1e-6
    assert out["c"]["conv_keep"] is False and out["c"]["n_kept"] == 0
    # min_kept_turns dominates the fraction gate
    strict = {r["conv_id"]: r for r in conversation_verdict(df, 0.0, 3).collect()}
    assert [strict[c]["conv_keep"] for c in "abc"] == [False, False, False]


def test_null_role_duplicate_turn_flag_is_total(spark):
    """A repeated NULL-role turn must flag is_duplicate_turn TRUE, not
    NULL — role != 'tool' is NULL under three-valued logic and the
    pipeline's drop gate treats NULL as not-dropped (round-5 review)."""
    df = spark.createDataFrame(
        [("c", 0, None, "same text", None),
         ("c", 1, None, "same text", None),
         ("c", 2, "tool", "same text", "search")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    rows = {r.turn_idx: r for r in with_conversation_flags(df).collect()}
    assert rows[0].is_duplicate_turn is False
    assert rows[1].is_duplicate_turn is True
    assert rows[2].is_duplicate_turn is False  # tool turns excluded
