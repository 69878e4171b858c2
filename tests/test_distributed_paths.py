"""Exercise the DISTRIBUTED query paths (the >LOCAL_DOCS_MAX branches that
a 10^12-doc corpus would take): map_batches verify, distributed filename
scan, candidate fetch — results must still be rank-identical to the
oracle."""

import math

import pytest

from probe_ray.corpus import QUERY_SUITE
from probe_ray.oracle import oracle_search
from probe_ray.search import Engine

_SUBSET = [q for q in QUERY_SUITE if q[0] in (
    "q01_single_term", "q02_or_chain", "q04_exclusion", "q07_complex_exclusion",
    "q09_quoted_exact", "q14_filename_only", "q18_all_stopwords",
    "q19_bm25_gradient", "q22_multi_query_and", "q23_max_results",
    "q24_files_only", "q25_max_bytes", "q26_max_tokens",
)]


@pytest.fixture()
def distributed_engine(t2_index, monkeypatch):
    monkeypatch.setattr(Engine, "LOCAL_DOCS_MAX", 0)
    monkeypatch.setattr(Engine, "LOCAL_CAND_MAX", 0)
    monkeypatch.setattr(Engine, "LOCAL_VECTOR_CAND_MAX", 0)
    monkeypatch.setattr(Engine, "LOCAL_FEATS_MAX", 0)
    return Engine(t2_index)


@pytest.mark.parametrize("qid,queries,opts", _SUBSET, ids=[q[0] for q in _SUBSET])
def test_distributed_rank_identity(qid, queries, opts, t2_rows, distributed_engine):
    expected = oracle_search(t2_rows, queries, **opts)
    got = distributed_engine.search(queries, **opts).to_pylist()
    assert len(got) == len(expected), f"{qid}: {len(got)} vs {len(expected)}"
    for i, (g, e) in enumerate(zip(got, expected)):
        assert g["doc_id"] == e.doc_id, f"{qid} row {i}"
        assert g["rank"] == e.rank, f"{qid} row {i}"
        assert math.isclose(g["score"], e.score, abs_tol=1e-9), f"{qid} row {i}"
        assert math.isclose(g["bm25_score"], e.bm25_score, abs_tol=1e-9), f"{qid} row {i}"
        assert list(g["matched_terms"]) == list(e.matched_terms), f"{qid} row {i}"
