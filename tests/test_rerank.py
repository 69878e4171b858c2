"""T4 reranker plumbing: actor-pool cross-encoder stage with a
deterministic lexical proxy (model execution is env-stubbed)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _result_tbl():
    return pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "rank": pa.array([0, 1, 2, None], pa.int64()),
        "score": pa.array([3.0, 2.0, 1.0, 0.0], pa.float64()),
        "text": pa.array([
            "alpha beta gamma",
            "database connection pooling retries",
            "gamma delta",
            "flagged tail row",
        ]),
    })


def test_cross_encoder_scorer_is_declared_stub():
    from probe_ray import rerank as rr

    with pytest.raises(NotImplementedError, match="ms-marco-TinyBERT"):
        rr.CrossEncoderScorer(question="q")


def test_unknown_reranker_value_rejected(t1_index):
    from probe_ray.search import Engine

    with pytest.raises(ValueError, match="unknown reranker"):
        Engine(t1_index).search(["keywordAlpha"], reranker="nope")


def test_rerank_table_reorders_and_preserves_flagged():
    from probe_ray import rerank as rr

    out = rr.rerank_table(
        _result_tbl(), "database connection pooling", concurrency=(1, 2)
    )
    # the question's terms live in doc 1 -> it must take rank 0
    assert out.column("doc_id").to_pylist()[0] == 1
    ranks = out.column("rank").to_pylist()
    assert ranks[:3] == [0, 1, 2]  # renumbered in the new order
    assert ranks[3] is None  # flagged tail untouched, after the ranked block
    assert out.column("doc_id").to_pylist()[3] == 3
    assert out.column("rerank_score").to_pylist()[3] is None
    s = out.column("rerank_score").to_pylist()[:3]
    assert s == sorted(s, reverse=True) and s[0] > 0


def test_rerank_table_tie_falls_back_to_original_rank():
    from probe_ray import rerank as rr

    tbl = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "rank": pa.array([0, 1], pa.int64()),
        "text": pa.array(["zzz yyy", "xxx www"]),  # both score 0.0
    })
    out = rr.rerank_table(tbl, "unrelated question terms")
    assert out.column("doc_id").to_pylist() == [10, 11]


def test_engine_search_ms_marco_reranks(t1_index):
    """End-to-end through Engine.search: bm25 aliases are no-ops (and
    rank-identical to the default), ms-marco-* adds a rerank_score column
    and keeps the same RESULT SET while reordering by lexical proxy."""
    from probe_ray.search import Engine

    eng = Engine(t1_index)
    base = eng.search(["keywordAlpha OR keywordBeta"], max_results=8)
    for alias in ("hybrid", "hybrid2", "tfidf"):
        same = eng.search(["keywordAlpha OR keywordBeta"], max_results=8,
                          reranker=alias)
        assert same.equals(base)
    rr = eng.search(
        ["keywordAlpha OR keywordBeta"], max_results=8,
        reranker="ms-marco-tinybert", question="keywordBeta",
    )
    assert "rerank_score" in rr.schema.names
    assert set(rr.column("doc_id").to_pylist()) == set(
        base.column("doc_id").to_pylist()
    )
    # ranked rows sorted by proxy score desc
    mask = [r is not None for r in rr.column("rank").to_pylist()]
    scores = [
        s for s, m in zip(rr.column("rerank_score").to_pylist(), mask) if m
    ]
    assert scores == sorted(scores, reverse=True)
    # deterministic
    again = eng.search(
        ["keywordAlpha OR keywordBeta"], max_results=8,
        reranker="ms-marco-tinybert", question="keywordBeta",
    )
    assert again.equals(rr)


def test_search_blocks_ms_marco_reranks_by_code(t1_index):
    from probe_ray.search import Engine

    eng = Engine(t1_index)
    base = eng.search_blocks(["keywordAlpha OR keywordBeta"], max_results=6)
    same = eng.search_blocks(["keywordAlpha OR keywordBeta"], max_results=6,
                             reranker="hybrid")
    assert same.equals(base)
    rr = eng.search_blocks(
        ["keywordAlpha OR keywordBeta"], max_results=6,
        reranker="ms-marco-minilm-l12", question="keywordBeta",
    )
    assert "rerank_score" in rr.schema.names
    assert set(zip(rr.column("path").to_pylist(),
                   rr.column("start_line").to_pylist())) == set(
        zip(base.column("path").to_pylist(),
            base.column("start_line").to_pylist())
    )
    scores = rr.column("rerank_score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    # the engine's rank convention (value set) is preserved, reassigned in
    # the new order
    assert sorted(rr.column("rank").to_pylist()) == sorted(
        base.column("rank").to_pylist()
    )
    assert rr.column("rank").to_pylist() == sorted(rr.column("rank").to_pylist())
    with pytest.raises(ValueError, match="unknown reranker"):
        eng.search_blocks(["keywordAlpha"], reranker="bert-large")
