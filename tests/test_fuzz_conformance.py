"""Randomized (seeded) query fuzzing: engine vs oracle rank identity on
generated boolean queries over corpus-derived terms."""

import math
import random

import pytest

from probe_ray.oracle import oracle_search
from probe_ray.search import Engine

_WORDS = [
    "keywordAlpha", "keywordBeta", "keywordGamma", "zetaTerm", "whitelist",
    "codeblock", "filler", "login", "auth", "migrateEndpointMetaByType",
    "parse", "marker", "session", "payment", "handle", "request", "content",
]


def _gen_query(rng: random.Random) -> str:
    def term():
        w = rng.choice(_WORDS)
        p = rng.random()
        if p < 0.12:
            return f"+{w}"
        if p < 0.24:
            return f"-{w}"
        if p < 0.32:
            return f'"{w}"'
        return w

    n = rng.randint(1, 3)
    parts = [term() for _ in range(n)]
    out = parts[0]
    for t in parts[1:]:
        op = rng.choice([" AND ", " OR ", " "])
        if t.startswith(("+", "-")):
            op = " "
        out += op + t
    if rng.random() < 0.2 and n > 1:
        out = f"({out})"
    return out


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_rank_identity(seed, t2_rows, t2_index):
    rng = random.Random(1000 + seed)
    query = _gen_query(rng)
    try:
        expected = oracle_search(t2_rows, [query])
    except Exception:
        pytest.skip(f"oracle rejects query {query!r}")
    engine = Engine(t2_index)
    got = engine.search([query]).to_pylist()
    assert len(got) == len(expected), (
        f"{query!r}: engine {len(got)} vs oracle {len(expected)}"
    )
    for i, (g, e) in enumerate(zip(got, expected)):
        assert g["doc_id"] == e.doc_id, f"{query!r} row {i}"
        assert g["rank"] == e.rank, f"{query!r} row {i}"
        assert math.isclose(g["score"], e.score, abs_tol=1e-9), f"{query!r} row {i}"
        assert tuple(g["matched_terms"]) == tuple(e.matched_terms), f"{query!r} row {i}"
