"""Index build: resume manifests, determinism, codec round-trip."""

import glob
import json

import numpy as np
import pyarrow.parquet as pq
import pytest


def test_codec_roundtrip_block_boundaries():
    from probe_ray.codec import decode_postings, encode_postings, merge_encoded

    rng = np.random.default_rng(1)
    for n in [1, 127, 128, 129, 4096]:
        ids = np.sort(rng.choice(np.arange(4 * n, dtype=np.uint64), n, replace=False))
        tfs = rng.integers(1, 4, n).astype(np.uint8)
        blob, skip, bmax = encode_postings(ids, tfs)
        ids2, tfs2 = decode_postings(blob)
        assert np.array_equal(ids, ids2) and np.array_equal(tfs, tfs2)
        nblocks = (n + 127) // 128
        assert len(skip) == nblocks * 16
        assert len(bmax) == nblocks
    a = np.array([3, 10], dtype=np.uint64)
    b = np.array([1, 7, 20], dtype=np.uint64)
    m, _, _ = merge_encoded(
        [encode_postings(a, np.ones(2, np.uint8))[0],
         encode_postings(b, np.ones(3, np.uint8))[0]]
    )
    ids, _ = decode_postings(m)
    assert ids.tolist() == [1, 3, 7, 10, 20]


def test_build_resume_reuses_manifest(ray_session, tmp_path):
    """Second build with an unchanged fingerprint is a no-op reuse;
    overwrite=True rebuilds (write-temp-then-rename atomicity)."""
    import time

    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus

    corpus = str(tmp_path / "c.parquet")
    write_corpus(corpus, "t1")
    out = str(tmp_path / "idx")
    p1 = build_index(corpus, out)
    manifest1 = json.load(open(p1.manifest_path))
    t0 = time.time()
    p2 = build_index(corpus, out)  # must reuse, not rebuild
    assert time.time() - t0 < 1.0
    assert json.load(open(p2.manifest_path)) == manifest1


def test_build_deterministic_across_runs(ray_session, tmp_path):
    """Two independent builds of the same corpus produce identical doc-id
    assignments and identical per-term postings (SURVEY.md §5 determinism)."""
    from probe_ray import codec
    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus

    corpus = str(tmp_path / "c.parquet")
    write_corpus(corpus, "t1")

    def snapshot(out):
        paths = build_index(corpus, out, overwrite=True)
        docs = pq.read_table(
            paths.docs_dir, columns=["doc_id", "repo", "path", "content_sha256"]
        ).sort_by("doc_id")
        seg_files = glob.glob(paths.segments_dir + "/**/*.parquet", recursive=True)
        postings = {}
        for f in seg_files:
            t = pq.read_table(f, columns=["term", "salt", "blob"])
            for term, salt, blob in zip(
                t.column("term").to_pylist(),
                t.column("salt").to_pylist(),
                t.column("blob").to_pylist(),
            ):
                ids, tfs = codec.decode_postings(blob)
                cur = postings.setdefault(term, [])
                cur.extend(zip(ids.tolist(), tfs.tolist()))
        postings = {t: sorted(v) for t, v in postings.items()}
        return docs.to_pydict(), postings

    d1, p1 = snapshot(str(tmp_path / "idx1"))
    d2, p2 = snapshot(str(tmp_path / "idx2"))
    assert d1 == d2
    assert p1 == p2


def test_doc_lens_sharded_multi_shard(ray_session, tmp_path, monkeypatch):
    """The doc-length attribute file is written as per-id-range slices from
    Ray tasks and stream-concatenated — with a tiny shard size the multi-
    shard path must still produce the exact dense doc_id -> doc_len array
    (including the trimmed final shard) and the same corpus stats."""
    import numpy as np

    import probe_ray.build as B
    from probe_ray.corpus import write_corpus

    monkeypatch.setattr(B, "DOC_LEN_SHARD", 8)
    corpus = str(tmp_path / "c.parquet")
    write_corpus(corpus, "t2")  # ~tens of docs -> several shards at size 8
    paths = B.build_index(corpus, str(tmp_path / "idx"))
    docs = pq.read_table(paths.docs_dir, columns=["doc_id", "doc_len"])
    n = docs.num_rows
    assert n > 8, "corpus must span multiple shards for this test"
    arr = np.load(paths.doc_lens_path, mmap_mode="r")
    assert arr.shape == (n,) and arr.dtype == np.int32
    expect = np.zeros(n, dtype=np.int32)
    expect[docs.column("doc_id").to_numpy()] = docs.column("doc_len").to_numpy()
    assert np.array_equal(np.asarray(arr), expect)
    stats = paths.stats()
    assert stats["n_docs"] == n
    assert stats["sum_dl"] == int(expect.sum())


def test_doc_ids_follow_sort_order(t1_index):
    docs = pq.read_table(t1_index.docs_dir, columns=["doc_id", "repo", "path", "commit"])
    rows = sorted(
        zip(
            docs.column("doc_id").to_pylist(),
            docs.column("repo").to_pylist(),
            docs.column("path").to_pylist(),
            docs.column("commit").to_pylist(),
        )
    )
    keys = [(r, p, c) for _, r, p, c in rows]
    assert keys == sorted(keys)
    assert [d for d, *_ in rows] == list(range(len(rows)))


def test_stats_consistency(t2_index):
    stats = t2_index.stats()
    docs = pq.read_table(t2_index.docs_dir, columns=["doc_len"])
    assert stats["n_docs"] == docs.num_rows
    assert stats["sum_dl"] == sum(docs.column("doc_len").to_pylist())


def test_mid_build_resume(ray_session, tmp_path):
    """Crash after the docs stage; the rerun reuses the completed docs stage
    (file mtimes unchanged) and finishes an identical index."""
    import os
    import time

    import pytest as _pytest

    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus

    corpus = str(tmp_path / "c.parquet")
    write_corpus(corpus, "t1")
    out = str(tmp_path / "idx")

    with _pytest.raises(RuntimeError, match="injected failure"):
        build_index(corpus, out, _fail_after="docs")
    tmp_docs = out + ".tmp/docs"
    assert os.path.isdir(tmp_docs)
    mtimes = {
        f: os.path.getmtime(os.path.join(tmp_docs, f))
        for f in os.listdir(tmp_docs)
    }
    time.sleep(0.05)
    paths = build_index(corpus, out)  # resume
    assert os.path.isdir(paths.segments_dir)
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(paths.docs_dir, f)) == m, (
            "docs stage was recomputed on resume"
        )
    # and the resumed index equals a from-scratch one
    ref = build_index(corpus, str(tmp_path / "idx2"))
    assert paths.stats()["sum_dl"] == ref.stats()["sum_dl"]


def test_checkpointed_segment_merge_resume(ray_session, tmp_path):
    """The north rule's checkpointed segment merge: a crash between the
    posting-partials checkpoint and the merge resumes WITHOUT re-encoding
    partials (their file mtimes unchanged), the finished index drops the
    checkpoint dir, and search results equal a from-scratch build."""
    import os
    import time

    import pytest as _pytest

    from probe_ray.build import build_index
    from probe_ray.corpus import write_corpus
    from probe_ray.search import Engine

    corpus = str(tmp_path / "c.parquet")
    write_corpus(corpus, "t1")
    out = str(tmp_path / "idx")

    with _pytest.raises(RuntimeError, match="posting_partials"):
        build_index(
            corpus, out, checkpoint_partials=True,
            _fail_after="posting_partials",
        )
    tmp_partials = out + ".tmp/posting_partials"
    assert os.path.isdir(tmp_partials)
    mtimes = {
        f: os.path.getmtime(os.path.join(tmp_partials, f))
        for f in os.listdir(tmp_partials)
    }
    assert mtimes
    time.sleep(0.05)
    paths = build_index(corpus, out, checkpoint_partials=True)  # merge only
    # checkpoint was consumed and not carried into the final index
    assert not os.path.exists(os.path.join(paths.root, "posting_partials"))
    assert not os.path.exists(out + ".tmp")
    ref = build_index(corpus, str(tmp_path / "idx2"))
    a = Engine(paths).search(["keywordAlpha"], max_results=10).to_pylist()
    b = Engine(ref).search(["keywordAlpha"], max_results=10).to_pylist()
    assert a == b

    # crash AFTER the segments stage (checkpoint already consumed): the
    # resume must NOT try to reopen the deleted partials checkpoint
    out3 = str(tmp_path / "idx3")
    with _pytest.raises(RuntimeError, match="segments"):
        build_index(
            corpus, out3, checkpoint_partials=True, _fail_after="segments"
        )
    assert not os.path.exists(out3 + ".tmp/posting_partials")
    paths3 = build_index(corpus, out3, checkpoint_partials=True)  # resume
    c = Engine(paths3).search(["keywordAlpha"], max_results=10).to_pylist()
    assert c == b


def test_jsonl_and_csv_corpus_sources(ray_session, tmp_path):
    """The same corpus in JSONL or CSV builds an index identical to the
    parquet build (search results equal row-for-row) — the source layer is
    format-agnostic."""
    import csv as _csv
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from probe_ray.build import build_index
    from probe_ray.search import Engine

    rows = [
        dict(
            repo="r1", path=f"src/alpha{i}.py", commit="0" * 40, lang="python",
            content=f"def handleAlpha{i}():\n    return alphaValue + {i}\n",
        )
        for i in range(6)
    ] + [
        dict(repo="r2", path="src/beta.py", commit="0" * 40, lang="python",
             content="betaValue = computeBeta()\n")
    ]
    pq_path = tmp_path / "c.parquet"
    pq.write_table(pa.table({k: [r[k] for r in rows] for k in rows[0]}), str(pq_path))
    jl_path = tmp_path / "c.jsonl"
    with open(jl_path, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    csv_path = tmp_path / "c.csv"
    with open(csv_path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    results = {}
    for name, src in (("parquet", pq_path), ("jsonl", jl_path), ("csv", csv_path)):
        paths = build_index(str(src), str(tmp_path / f"idx_{name}"))
        results[name] = Engine(paths).search(["alphaValue"]).to_pylist()
    assert results["jsonl"] == results["parquet"]
    assert results["csv"] == results["parquet"]
    # alphaValue tokenizes to alpha+valu: the 6 alpha files rank first and
    # betaValue's file matches via "valu"
    assert len(results["parquet"]) == 7

    # a standard JSON-array file is rejected with a descriptive error, not
    # a deep pyarrow parse failure
    import pytest

    from probe_ray.build import read_corpus

    arr_path = tmp_path / "c.json"
    with open(arr_path, "w") as f:
        _json.dump(rows, f)
    with pytest.raises(ValueError, match="newline-delimited"):
        read_corpus(str(arr_path))


def test_single_doc_and_tiny_corpus(ray_session, tmp_path):
    """Degenerate corpora: one doc, and a doc with one line — build,
    search (all modes), and block search all behave."""
    import pyarrow as pa

    import ray.data as rd

    from probe_ray.build import build_index
    from probe_ray.search import Engine

    corpus = rd.from_arrow(pa.table({
        "repo": ["r"], "path": ["only.txt"], "commit": ["c"],
        "lang": ["txt"], "content": ["solitary marker line"],
    }))
    paths = build_index(corpus, str(tmp_path / "one"), ngram_index=True)
    eng = Engine(paths)
    # NOTE: a stem-ALTERING query word ("solitary" -> "solitari") would find
    # the doc in document mode (stemmed token membership) but NOT in block
    # mode: the reference's line patterns are the STEMMED keywords, which
    # cannot substring-match the original inflection — a real probe quirk
    # (elastic_query.rs:801 custom_tokenize; query.rs:494 collect_patterns).
    # "marker" is stem-neutral, so both modes agree.
    assert eng.search(["marker"]).num_rows == 1
    assert eng.search(["marker"], mode="global", max_results=5).num_rows == 1
    blk = eng.search_blocks(["marker"])
    assert blk.num_rows == 1
    r = blk.to_pylist()[0]
    assert (r["start_line"], r["end_line"]) == (1, 1)
    assert r["code"] == "solitary marker line"
    # query for something absent
    assert eng.search(["nonexistentzzz"]).num_rows == 0
    assert eng.search_blocks(["nonexistentzzz"]).num_rows == 0
