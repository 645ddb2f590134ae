"""The per-row invariant from BASELINE.json input_hint: per-turn text
equality must survive the whole pipeline under stable (conv_id, turn_idx)
ordering — no normalization anywhere in the Arrow/UDF path."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tricky_pdf():
    texts = [
        "plain ascii text",
        "  leading and trailing whitespace  ",
        "tabs\tand\nnewlines\r\nand\rcarriage",
        "unicode: café naïve 日本語 🚀 ünïcödé",
        "quotes \"double\" 'single' `back`",
        "null-ish: None nan NULL",
        "emoji zwj: 👩‍💻 combining: é",
        "long " + "x" * 5000,
        "",
        "control chars: \x01\x02\x03",
    ]
    rows = []
    for i, t in enumerate(texts):
        rows.append(
            {
                "conv_id": f"conv_{i:08d}",
                "turn_idx": 0,
                "role": "user",
                "text": t,
                "tool": "",
                "ts": pd.Timestamp("2025-01-01"),
            }
        )
    return pd.DataFrame(rows)


def test_text_survives_build_byte_identical(spark, tricky_pdf, tmp_path):
    from search_engine_spark.index.builder import build_index

    store = build_index(
        spark,
        spark.createDataFrame(tricky_pdf),
        str(tmp_path / "ix"),
        drange_span=64,
        n_chunks=1,
    )
    got = (
        store.docs(spark)
        .select("conv_id", "turn_idx", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    exp = tricky_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(got["text"]) == list(exp["text"])  # exact, char-for-char
    assert list(got["conv_id"]) == list(exp["conv_id"])


def test_analyzer_handles_tricky_text_without_error(tricky_pdf):
    from search_engine_spark.analysis import analyze

    for t in tricky_pdf["text"]:
        out = analyze(t)
        assert isinstance(out, list)
    # non-ASCII letters are dropped by [a-zA-Z]+ (Tokenizer.java:25)
    assert analyze("café 日本語") == ["caf"]
