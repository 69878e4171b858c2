"""grep / extract / symbols / test-detection ops over the synthetic corpus."""

import pytest


@pytest.fixture(scope="module")
def corpus_ds(ray_session, tmp_path_factory):
    import ray.data as rd

    from probe_ray.corpus import write_corpus

    p = tmp_path_factory.mktemp("tools") / "c.parquet"
    write_corpus(str(p), "t1")
    return rd.read_parquet(str(p)).materialize()


def test_grep(corpus_ds):
    from probe_ray.tools import grep

    hits = grep(corpus_ds, r"keywordAlpha").to_pandas()
    assert len(hits) > 0
    assert all("keywordalpha" in l.lower() for l in hits["line"])
    # long lines are skipped during matching (ripgrep_searcher.rs:106-118)
    hits_y = grep(corpus_ds, r"y{100}").to_pandas()
    assert len(hits_y) == 0


def test_extract(corpus_ds):
    from probe_ray.tools import extract

    row = corpus_ds.take(1)[0]
    full = extract(corpus_ds, row["repo"], row["path"])
    assert full is not None and full["code"] == row["content"]
    sliced = extract(corpus_ds, row["repo"], row["path"], line=1, context=1)
    assert sliced["start_line"] == 1 and sliced["end_line"] <= 2
    assert extract(corpus_ds, "nope", "nope") is None


def test_symbols(corpus_ds):
    from probe_ray.tools import symbols

    syms = symbols(corpus_ds).to_pandas()
    assert len(syms) > 0
    assert set(syms["kind"]).issuperset({"function"})
    # rust fn defs found with names
    rust = syms[syms["lang"] == "rust"]
    assert (rust["kind"] == "function").any()


def test_is_test_file():
    from probe_ray.tools import is_test_file

    assert is_test_file("tests/foo_test.rs", "")
    assert is_test_file("src/lib.rs", "#[test]\nfn t() {}")
    assert not is_test_file("src/lib.rs", "fn f() {}")


def test_allow_tests_conformance(t2_rows, t2_index):
    from probe_ray.oracle import oracle_search
    from probe_ray.search import Engine

    expected = oracle_search(t2_rows, ["keywordAlpha"], allow_tests=False)
    got = Engine(t2_index).search(["keywordAlpha"], allow_tests=False).to_pylist()
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g["doc_id"] == e.doc_id and g["rank"] == e.rank
    # and it actually excludes something
    full = oracle_search(t2_rows, ["keywordAlpha"])
    assert len(expected) < len(full)
