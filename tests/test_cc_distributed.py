"""Distributed connected components for the dedup graph (round-4 verdict
item 1): Dataset-native min-label propagation with label-shortcut edges
must match the driver union-find bit for bit, converge in O(log diameter)
rounds, and keep driver state O(1)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _edges_ds(pairs):
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return rd.from_arrow(pa.table({"a": a, "b": b}))


def _labels_dict(tbl_or_rows):
    if isinstance(tbl_or_rows, pa.Table):
        return dict(zip(tbl_or_rows.column("doc_id").to_pylist(),
                        tbl_or_rows.column("cluster_id").to_pylist()))
    return {r["doc_id"]: r["cluster_id"] for r in tbl_or_rows}


def test_cc_distributed_matches_union_find_on_random_graph():
    from probe_ray import textops

    rng = np.random.default_rng(7)
    # several medium components + noise edges + duplicate edges
    pairs = []
    base = 0
    for size in (2, 3, 17, 40, 5, 9):
        ids = base + rng.permutation(size * 3)[:size]
        for i in range(size - 1):
            pairs.append((int(ids[i]), int(ids[i + 1])))
        # extra intra-component edges incl. duplicates
        for _ in range(size):
            i, j = rng.integers(0, size, 2)
            if i != j:
                pairs.append((int(ids[i]), int(ids[j])))
        base += size * 3 + 10
    want = _labels_dict(textops._cc_union_find(
        np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])
    ))
    got_ds, rounds = textops._cc_labels_distributed(_edges_ds(pairs))
    got = _labels_dict(got_ds.take_all())
    assert got == want
    assert rounds <= 10


def test_cc_distributed_chain_converges_logarithmically():
    """A 512-node path graph has diameter 511: plain one-hop min
    propagation needs ~511 rounds (and would trip the 100-round guard);
    the label-shortcut doubling must finish in O(log d)."""
    from probe_ray import textops

    pairs = [(i, i + 1) for i in range(511)]
    got_ds, rounds = textops._cc_labels_distributed(_edges_ds(pairs))
    got = _labels_dict(got_ds.take_all())
    assert got == {i: 0 for i in range(512)}
    assert rounds <= 15


def _write_dup_corpus(tmp_path, n_groups=12, group_size=6):
    """documents.parquet with heavy near-duplication: n_groups groups of
    group_size docs sharing a long common text with tiny suffixes (well
    above the 0.5 Jaccard bar), plus unique singletons between groups."""
    rows = []
    did = 0
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    for g in range(n_groups):
        core = " ".join(words[(g + i) % len(words)] + str(g)
                        for i in range(40))
        for m in range(group_size):
            rows.append(dict(doc_id=did, text=core + f" tail{m}",
                             lang="en"))
            did += 1
        rows.append(dict(
            doc_id=did,
            text=" ".join(f"unique{g}w{i}x{did}" for i in range(30)),
            lang="en",
        ))
        did += 1
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_minhash_forced_distributed_matches_driver(tmp_path, monkeypatch):
    from probe_ray import textops

    sf = _write_dup_corpus(tmp_path)
    want = textops.minhash_lsh_dedup(sf)
    assert want.num_rows >= 24  # the dup groups actually cluster
    assert textops.LAST_MINHASH_METRICS["cc_mode"] == "driver-union-find"

    monkeypatch.setattr(textops, "_CC_DRIVER_EDGE_MAX", 0)
    got = textops.minhash_lsh_dedup(sf)
    assert textops.LAST_MINHASH_METRICS["cc_mode"] == "distributed-min-label"
    assert textops.LAST_CC_METRICS["mode"] == "distributed-min-label"
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert (got.column("cluster_id").to_pylist()
            == want.column("cluster_id").to_pylist())


def test_dedup_clusters_forced_distributed_matches_driver(tmp_path, monkeypatch):
    from probe_ray import textops

    sf = _write_dup_corpus(tmp_path, n_groups=8, group_size=5)
    want = textops.dedup_clusters(sf).take_all()
    assert textops.LAST_CC_METRICS["mode"] == "driver-union-find"

    monkeypatch.setattr(textops, "_CC_DRIVER_EDGE_MAX", 0)
    got = textops.dedup_clusters(sf).take_all()
    assert textops.LAST_CC_METRICS["mode"] == "distributed-min-label"
    assert got == want
    # the dup groups collapse onto their min doc ids
    labels = _labels_dict(got)
    assert labels[1] == 0 and labels[2] == 0
