"""Dirichlet LM similarity vs an exhaustive pandas oracle."""

from __future__ import annotations

import math
from collections import Counter

from search_engine_spark.analysis.analyzer import analyze
from search_engine_spark.query.lm import LM_MU


def _lm_scores(oix, terms: list[str], mu: float) -> dict[int, float]:
    qtf = Counter(terms)
    dl = dict(zip(oix.docs["doc_id"], oix.docs["doc_len"]))
    total = float(sum(dl.values()))
    scores: dict[int, float] = {}
    for t in sorted(qtf):
        plist = oix.postings.get(t)
        if not plist:
            continue
        cf = float(sum(plist.values()))
        for doc_id, tf in plist.items():
            s = qtf[t] * (
                math.log(1.0 + tf / (mu * (cf / total)))
                + math.log(mu / (dl[doc_id] + mu))
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + s
    return scores


def test_lm_dirichlet_matches_bruteforce(spark, index_store, oracle_index):
    from search_engine_spark.query.lm import lm_dirichlet_topk

    terms = analyze("spark index query spark")  # duplicate -> qtf=2
    exp = sorted(
        _lm_scores(oracle_index, terms, LM_MU).items(),
        key=lambda x: (-x[1], x[0]),
    )[:10]

    rows = lm_dirichlet_topk(spark, index_store, terms, k=10).collect()
    assert [int(r["doc_id"]) for r in rows] == [d for d, _ in exp]
    for r, (_, s) in zip(rows, exp):
        assert abs(float(r["score"]) - s) < 1e-9


def test_lm_empty_and_miss(spark, index_store):
    from search_engine_spark.query.lm import lm_dirichlet_topk

    assert lm_dirichlet_topk(spark, index_store, [], k=5).count() == 0
    assert lm_dirichlet_topk(spark, index_store, ["zzznope"], k=5).count() == 0
