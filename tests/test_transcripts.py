"""Conversation-level transcript analytics (functions/transcripts.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions import transcripts as tx


def _turns(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


TS0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s):
    return TS0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tiny(spark):
    return _turns(
        spark,
        [
            # conv a: user -> assistant -> tool(search) -> assistant
            ("a", 0, "user", "hello there", None, _ts(0)),
            ("a", 1, "assistant", "hi", None, _ts(5)),
            ("a", 2, "tool", "grep results here", "search", _ts(9)),
            ("a", 3, "assistant", "done", None, _ts(30)),
            # conv b: same texts as a, same order -> same fingerprint
            ("b", 0, "user", "hello there", None, _ts(100)),
            ("b", 1, "assistant", "hi", None, _ts(101)),
            ("b", 2, "tool", "grep results here", "search", _ts(102)),
            ("b", 3, "assistant", "done", None, _ts(103)),
            # conv c: PERMUTED turns of a -> different fingerprint;
            # conversation-FINAL tool call (no next turn -> no gap)
            ("c", 0, "assistant", "hi", None, _ts(0)),
            ("c", 1, "user", "hello there", None, _ts(7)),
            ("c", 2, "tool", "done grep", "code", _ts(11)),
        ],
    )


def test_conv_stats_counts_and_duration(tiny):
    rows = {r["conv_id"]: r for r in tx.conv_stats(tiny).collect()}
    a = rows["a"]
    assert a["n_turns"] == 4
    assert a["n_user"] == 1
    assert a["n_assistant"] == 2
    assert a["n_tool_calls"] == 1
    assert a["n_distinct_tools"] == 1
    # hello there | hi | grep results here | done = 2 + 1 + 3 + 1
    assert a["total_words"] == 7
    assert a["duration_sec"] == 30
    assert rows["c"]["duration_sec"] == 11
    assert rows["b"]["n_distinct_tools"] == 1


def test_conv_fingerprints_order_sensitive(tiny):
    rows = {r["conv_id"]: r for r in tx.conv_fingerprints(tiny).collect()}
    # identical ordered turn texts -> identical fp, group of 2
    assert rows["a"]["fp"] == rows["b"]["fp"]
    assert rows["a"]["dup_group_size"] == 2
    # permuted texts -> different conversation
    assert rows["c"]["fp"] != rows["a"]["fp"]
    assert rows["c"]["dup_group_size"] == 1


def test_fingerprint_ignores_arrival_order(spark, tiny):
    """The fingerprint sorts by turn_idx, not by row arrival order."""
    shuffled = tiny.orderBy(F.desc("text"))
    a = {r["conv_id"]: r["fp"] for r in tx.conv_fingerprints(tiny).collect()}
    b = {r["conv_id"]: r["fp"] for r in
         tx.conv_fingerprints(shuffled).collect()}
    assert a == b


def test_role_transitions(tiny):
    got = {
        (r["from_role"], r["to_role"]): r["n"]
        for r in tx.role_transitions(tiny).collect()
    }
    assert got[("user", "assistant")] == 2       # a0->a1, b0->b1
    assert got[("assistant", "tool")] == 2       # a1->a2, b1->b2
    assert got[("tool", "assistant")] == 2       # a2->a3, b2->b3
    assert got[("assistant", "user")] == 1       # c0->c1
    assert got[("user", "tool")] == 1            # c1->c2
    assert sum(got.values()) == 8                # 3+3+2 transitions


def test_tool_usage_gap_semantics(tiny):
    rows = {r["tool"]: r for r in tx.tool_usage(tiny).collect()}
    s = rows["search"]
    assert s["n_calls"] == 2 and s["n_convs"] == 2
    # gaps to next turn: a2->a3 = 21 s, b2->b3 = 1 s
    assert s["avg_gap_next_sec"] == pytest.approx(11.0)
    assert s["avg_turn_words"] == pytest.approx(3.0)
    # conv-final tool call: no next turn -> no gap rows at all
    c = rows["code"]
    assert c["n_calls"] == 1
    assert c["avg_gap_next_sec"] is None


def test_derive_turns_reconstructs_text(spark):
    docs = spark.createDataFrame(
        [(0, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), (1, "one"), (2, "a b")],
        "doc_id long, text string",
    )
    t = tx.derive_turns(docs)
    # joining a conversation's turns in order with ' ' restores the text
    back = {
        r["conv_id"]: r["txt"]
        for r in t.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda x: x["text"],
                ),
                " ",
            ).alias("txt")
        )
        .collect()
    }
    assert back == {"0": "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "1": "one", "2": "a b"}
    # 10 words at 8/turn -> 2 turns; derivation schema is the canonical one
    assert t.filter(F.col("conv_id") == "0").count() == 2
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_ops_run_on_real_corpus_shape(transcripts_df):
    """The operators consume the production transcript schema directly."""
    assert tx.conv_stats(transcripts_df).count() > 0
    assert tx.role_transitions(transcripts_df).count() > 0
    fp = tx.conv_fingerprints(transcripts_df)
    assert fp.select("conv_id").distinct().count() == fp.count()


def test_context_windows_training_samples(spark):
    t = _turns(
        spark,
        [
            ("a", 0, "user", "t0", None, _ts(0)),
            ("a", 1, "assistant", "t1", None, _ts(1)),
            ("a", 2, "user", "t2", None, _ts(2)),
            ("a", 3, "assistant", "t3", None, _ts(3)),
            ("a", 4, "tool", "t4", "search", _ts(4)),
            ("a", 5, "assistant", "t5", None, _ts(5)),
            # conversation OPENING with an assistant turn -> empty context
            ("b", 0, "assistant", "hi", None, _ts(0)),
        ],
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["context"], r["target"])
        for r in tx.context_windows(t, k=3).collect()
    }
    s = tx.CTX_SEP
    assert got[("a", 1)] == ("t0", "t1")
    assert got[("a", 3)] == (s.join(["t0", "t1", "t2"]), "t3")
    # k=3 window slides: turns 2,3,4 (any role) form the context of turn 5
    assert got[("a", 5)] == (s.join(["t2", "t3", "t4"]), "t5")
    assert got[("b", 0)] == ("", "hi")
    assert len(got) == 4  # assistant turns only
