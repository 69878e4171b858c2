"""Training-data pipeline operators over the `documents` / `embeddings`
tables — deduplication, similarity search, text analysis, multimodal
plumbing. Ray-Data-native: every op is a vectorized ``map_batches`` /
``groupby`` pipeline designed for the 100 TB shape (pre-aggregation before
shuffles, broadcast small sides, no driver-side loops over rows).

Ops with exact ANSI-SQL equivalents are paired with oracles in
__ray_entry__.oracle_sql(); hash/sketch ops (minhash, simhash, winnowing,
LSH) get rows-only checks. The *simple* tokenizer used here (lowercase,
split on non-alphanumeric) is deliberately SQL-reproducible; the probe
tokenizer (tokenizer.py) powers the search engine and is validated against
the in-repo oracle instead.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_WORD_SPLIT = re.compile(r"[^a-z0-9]+")

# fixed query terms for the search/BM25 demos (present in the synthetic docs)
QUERY_TERMS = ("spark", "join", "window")
STOPWORDS = ("the", "a", "of", "and", "to")

BM25_K1 = 1.5
BM25_B = 0.5


def simple_tokens(text: str) -> list[str]:
    return [t for t in _WORD_SPLIT.split(text.lower()) if t]


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Text statistics
# ---------------------------------------------------------------------------

def doc_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_unique) with the simple tokenizer."""

    def stats(batch: pa.Table) -> pa.Table:
        toks = [simple_tokens(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array([len(t) for t in toks], pa.int64()),
                "n_unique": pa.array([len(set(t)) for t in toks], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pyarrow")


def term_df(sf_dir: str) -> pa.Table:
    """Top-100 terms by document frequency. Pre-aggregated per batch (one
    row per term per batch) BEFORE the groupby shuffle — A2 in SURVEY §3.4."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column("text").to_pylist():
            for term in set(simple_tokens(t)):
                counts[term] = counts.get(term, 0) + 1
        return pa.table(
            {
                "term": pa.array(list(counts), pa.string()),
                "partial_df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("partial_df")
    )
    tbl = agg.to_pandas().rename(columns={"sum(partial_df)": "df"})
    tbl = tbl.sort_values(["df", "term"], ascending=[False, True]).head(100)
    return pa.Table.from_pandas(tbl.reset_index(drop=True))


def corpus_stats(sf_dir: str) -> pa.Table:
    ds = doc_stats(sf_dir)
    n = ds.count()
    total = ds.sum("n_tokens")
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "total_tokens": pa.array([total], pa.int64()),
            "avg_tokens": pa.array([total / n], pa.float64()),
        }
    )


def token_count_bpe(sf_dir: str) -> rd.Dataset:
    """Whitespace + BPE-ish regex token counting per doc."""
    pat = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")

    def count(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ws_tokens": pa.array([len(t.split()) for t in texts], pa.int64()),
                "bpe_tokens": pa.array(
                    [len(pat.findall(t.lower())) for t in texts], pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(count, batch_format="pyarrow")


def quality_score(sf_dir: str) -> rd.Dataset:
    """Quality signals: length, stop-word ratio, mean token length."""

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sw, mwl, nt = [], [], []
        stop = set(STOPWORDS)
        for t in texts:
            toks = simple_tokens(t)
            nt.append(len(toks))
            if toks:
                sw.append(sum(1 for x in toks if x in stop) / len(toks))
                mwl.append(sum(len(x) for x in toks) / len(toks))
            else:
                sw.append(0.0)
                mwl.append(0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(nt, pa.int64()),
                "stopword_ratio": pa.array(sw, pa.float64()),
                "mean_token_len": pa.array(mwl, pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pyarrow")


def langid_heuristic(sf_dir: str) -> rd.Dataset:
    """Character-bigram profile language-ID heuristic (rows-only oracle:
    the sketch is not SQL-expressible). Stateful profile table is built once
    per actor (__init__), not per batch."""

    class LangId:
        def __init__(self):
            # deterministic fake profiles: bigram -> lang weights
            self.profiles = {
                "en": {"th", "he", "er", "on"},
                "es": {"el", "la", "os", "de"},
                "de": {"ch", "ei", "de", "en"},
                "zh": {"zh", "ng", "sh", "ia"},
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            preds, confs = [], []
            for t in batch.column("text").to_pylist():
                grams = {t[i : i + 2] for i in range(len(t) - 1)}
                scores = {
                    lang: len(grams & marks) for lang, marks in self.profiles.items()
                }
                best = max(sorted(scores), key=lambda l: scores[l])
                preds.append(best)
                confs.append(scores[best] / 4.0)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "predicted_lang": pa.array(preds, pa.string()),
                    "confidence": pa.array(confs, pa.float64()),
                }
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=2
    )


def lang_distribution(sf_dir: str) -> pa.Table:
    agg = _docs(sf_dir, ["doc_id", "lang"]).groupby("lang").count()
    df = agg.to_pandas().rename(columns={"count()": "n_docs"})
    df = df.sort_values("lang").reset_index(drop=True)
    return pa.Table.from_pandas(df)


# ---------------------------------------------------------------------------
# Search over documents (simple tokenizer; SQL-parity boolean retrieval+BM25)
# ---------------------------------------------------------------------------

def search_and(sf_dir: str) -> rd.Dataset:
    """doc_ids containing ALL of ('spark', 'join')."""
    return _boolean_search(sf_dir, must=["spark", "join"])


def search_or(sf_dir: str) -> rd.Dataset:
    return _boolean_search(sf_dir, should=["vector", "stream"])


def search_not(sf_dir: str) -> rd.Dataset:
    return _boolean_search(sf_dir, must=["spark"], must_not=["window"])


def _boolean_search(sf_dir, must=(), should=(), must_not=()) -> rd.Dataset:
    def match(batch: pa.Table) -> pa.Table:
        ids, texts = batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        keep = []
        for did, t in zip(ids, texts):
            toks = set(simple_tokens(t))
            if must and not all(m in toks for m in must):
                continue
            if should and not any(s in toks for s in should):
                continue
            if must_not and any(x in toks for x in must_not):
                continue
            keep.append(did)
        return pa.table({"doc_id": pa.array(keep, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(match, batch_format="pyarrow")


def bm25_topk(sf_dir: str, terms=QUERY_TERMS, k: int = 20) -> pa.Table:
    """Global-stats BM25 top-k over documents with the simple tokenizer —
    the SQL-checkable twin of the engine's global mode. Two passes: tiny
    per-batch stat partials, then scoring with broadcast stats."""
    terms = list(terms)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        dfv = [0] * len(terms)
        sdl = 0
        for t in texts:
            toks = simple_tokens(t)
            sdl += len(toks)
            ts = set(toks)
            for i, q in enumerate(terms):
                if q in ts:
                    dfv[i] += 1
        return pa.table(
            {
                "df": pa.array([dfv], pa.list_(pa.int64())),
                "sum_dl": pa.array([sdl], pa.int64()),
                "n": pa.array([len(texts)], pa.int64()),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "text"])
    parts = docs.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sum_dl = sum(p["sum_dl"] for p in parts)
    dfv = np.sum([p["df"] for p in parts], axis=0)
    avgdl = sum_dl / n
    import math

    idfs = [
        math.log(1.0 + (n - int(df) + 0.5) / (int(df) + 0.5)) if df > 0 else 0.0
        for df in dfv
    ]

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_s = [], []
        for did, t in zip(ids, texts):
            toks = simple_tokens(t)
            dl = len(toks)
            s = 0.0
            for q, qidf in zip(terms, idfs):
                tf = toks.count(q)
                if tf > 0:
                    s += qidf * (tf * (BM25_K1 + 1.0)) / (
                        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                    )
            if s > 0:
                out_id.append(did)
                out_s.append(s)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "score_raw": pa.array(out_s, pa.float64()),
            }
        )

    scored = docs.map_batches(score, batch_format="pyarrow")
    top = scored.sort(["score_raw", "doc_id"], descending=[True, False]).limit(k)
    tbl = top.to_pandas().rename(columns={"score_raw": "score"})
    return pa.Table.from_pandas(tbl[["doc_id", "score"]])


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> pa.Table:
    """Exact dedup: hash-partition on md5(text), keep min doc_id per group
    (the canonical hash-partition + per-group-first pattern)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_hash": pa.array(hashes, pa.string())}
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow"
    )
    agg = hashed.groupby("text_hash").aggregate(
        rd.aggregate.Min("doc_id", alias_name="keeper_doc_id"),
        rd.aggregate.Count(alias_name="dup_count"),
    )
    df = agg.to_pandas().sort_values("keeper_doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df[["text_hash", "keeper_doc_id", "dup_count"]])


def _shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _minhash_sig(shingles: set[str], n_hashes: int = 64) -> np.ndarray:
    """md5-based minhash signature (deterministic across workers)."""
    if not shingles:
        return np.full(n_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(
        [
            int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in sorted(shingles)
        ],
        dtype=np.uint64,
    )
    # xor-shift family: h_i(x) = rotate/mix with the i-th odd constant
    seeds = (np.arange(1, n_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    mixed = base[:, None] ^ seeds[None, :]
    mixed = (mixed * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    mixed ^= mixed >> np.uint64(31)
    return mixed.min(axis=0)


def minhash_lsh_dedup(
    sf_dir: str, n_hashes: int = 64, bands: int = 16, threshold: float = 0.5
) -> pa.Table:
    """MinHash + LSH near-duplicate clustering:
    shingle -> minhash -> band -> groupby(band, band_hash) -> candidate
    pairs -> verify Jaccard -> min-label clusters. Output
    (doc_id, cluster_id) for docs in non-singleton clusters.

    Scale notes: banding keys the shuffle; candidate pairs are generated
    per-bucket (buckets are small by construction); verification re-reads
    only candidate docs; min-label propagation runs on the candidate GRAPH
    (tiny vs corpus).
    """
    rows_per_band = n_hashes // bands

    def sig_batch(batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_hash = [], [], []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = _minhash_sig(_shingles(simple_tokens(text)), n_hashes)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_doc.append(did)
                out_band.append(b)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
            }
        )

    bands_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pyarrow"
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    pairs = (
        bands_ds.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )

    # verify candidate pairs with true Jaccard on the candidate docs only
    cand_ids = set(pairs["a"]) | set(pairs["b"])
    ids_ref = ray.put(np.array(sorted(cand_ids), dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        mask = np.isin(batch.column("doc_id").to_numpy(), want)
        return batch.filter(pa.array(mask))

    cand_rows = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pick, batch_format="pyarrow")
        .take_all()
    )
    sh = {r["doc_id"]: _shingles(simple_tokens(r["text"])) for r in cand_rows}
    edges = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sh[a], sh[b]
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            edges.append((int(a), int(b)))

    # min-label propagation (union-find on the small candidate graph)
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    members: dict[int, list[int]] = {}
    for x in set(parent) | {e for pair in edges for e in pair}:
        members.setdefault(find(x), []).append(x)
    out_doc, out_cluster = [], []
    for root, ms in sorted(members.items()):
        if len(ms) < 2:
            continue
        for m in sorted(ms):
            out_doc.append(m)
            out_cluster.append(root)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "cluster_id": pa.array(out_cluster, pa.int64()),
        }
    )


def simhash64(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash per doc (md5 token hashes weighted by tf)."""

    def sim(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            toks = simple_tokens(text)
            if not toks:
                out.append(0)
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for t, c in counts.items():
                h = np.uint64(
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                )
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, c, -c)
            out.append(int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([v - (1 << 63) for v in out], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sim, batch_format="pyarrow")


def near_dup_word_jaccard(sf_dir: str, window: int = 5, threshold: float = 0.5) -> pa.Table:
    """Word-set Jaccard for doc pairs within a doc_id window (the
    SQL-checkable near-dup variant; the unrestricted version is
    minhash_lsh_dedup). Windowed self-join via overlap-replicated buckets."""
    bucket = 64

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        ob, oi, ot = [], [], []
        for did, t in zip(ids, texts):
            for b in {did // bucket, (did + window) // bucket}:
                ob.append(b)
                oi.append(did)
                ot.append(t)
        return pa.table(
            {
                "bucket": pa.array(ob, pa.int64()),
                "doc_id": pa.array(oi, pa.int64()),
                "text": pa.array(ot, pa.string()),
            }
        )

    def pair_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        texts = g["text"].tolist()
        bnum = g["bucket"].iloc[0]
        sets = [set(simple_tokens(t)) for t in texts]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[j] - ids[i] > window:
                    break
                # each pair is emitted from exactly ONE bucket: the bucket of
                # the larger id (both endpoints are replicated into it)
                if ids[j] // bucket != bnum:
                    continue
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    j_out.append(jac)
        return pd.DataFrame({"doc_id_a": a_out, "doc_id_b": b_out, "jaccard": j_out})

    pairs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_group, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["doc_id_a", "doc_id_b"])
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    if pairs.empty:
        return pa.table({"doc_id_a": pa.array([], pa.int64()),
                         "doc_id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    return pa.Table.from_pandas(pairs)


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """md5 fingerprint of whitespace-normalized lowercase text."""

    def fp(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, pa.string())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def winnowing_fingerprints(sf_dir: str, k: int = 5, w: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints: rolling hash over char k-grams,
    window-min selection (rows-only oracle: rolling hash not in SQL)."""

    def winnow(batch: pa.Table) -> pa.Table:
        n_out, min_out, max_out = [], [], []
        for text in batch.column("text").to_pylist():
            s = " ".join(text.lower().split())
            if len(s) < k:
                n_out.append(0)
                min_out.append(0)
                max_out.append(0)
                continue
            base, mod = 257, (1 << 61) - 1
            h = 0
            pw = pow(base, k - 1, mod)
            hashes = []
            for i, ch in enumerate(s):
                h = (h * base + ord(ch)) % mod
                if i >= k:
                    h = (h - ord(s[i - k]) * pw * base) % mod
                if i >= k - 1:
                    hashes.append(h)
            sel = set()
            for i in range(max(1, len(hashes) - w + 1)):
                win = hashes[i : i + w]
                sel.add(min(win))
            fp = sorted(sel)
            n_out.append(len(fp))
            min_out.append(fp[0] & 0x7FFFFFFFFFFFFFFF)
            max_out.append(fp[-1] & 0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fingerprints": pa.array(n_out, pa.int64()),
                "min_fp": pa.array(min_out, pa.int64()),
                "max_fp": pa.array(max_out, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(winnow, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

def knn_cosine(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k: the query vector is broadcast once
    (ray.put) and each batch does one numpy matmul. Output (rank, vec_id)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrow = emb.filter(lambda r: r["vec_id"] == query_vec_id).take(1)[0]
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch.column("vec_id").to_numpy()
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qv) / np.where(norms > 0, norms, 1.0)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    scored = emb.map_batches(score, batch_format="pyarrow")
    top = (
        scored.filter(lambda r: r["vec_id"] != query_vec_id)
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = range(1, len(top) + 1)
    return pa.Table.from_pandas(top[["rank", "vec_id"]])


def knn_lsh(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_planes: int = 6) -> pa.Table:
    """LSH-bucketed approximate top-k (the scale path): random-hyperplane
    signatures bucket the vectors; rerank within the query's bucket ring.
    Deterministic seeded planes. Rows-only oracle (approximate)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrow = emb.filter(lambda r: r["vec_id"] == query_vec_id).take(1)[0]
    q = np.asarray(qrow["embedding"], dtype=np.float64)
    dim = q.size
    planes = np.random.default_rng(42).standard_normal((n_planes, dim))
    qsig = int((planes @ q > 0).astype(np.uint64) @ (1 << np.arange(n_planes, dtype=np.uint64)))
    state = ray.put((planes, qsig, q / np.linalg.norm(q)))

    def bucket_score(batch: pa.Table) -> pa.Table:
        pl, qs, qv = ray.get(state)
        ids = batch.column("vec_id").to_numpy()
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        sigs = ((mat @ pl.T) > 0).astype(np.uint64) @ (1 << np.arange(pl.shape[0], dtype=np.uint64))
        # Hamming distance <= 2 from the query signature = the bucket ring
        ham = np.array([bin(int(s) ^ qs).count("1") for s in sigs])
        mask = ham <= 2
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        sub = mat[mask]
        norms = np.linalg.norm(sub, axis=1)
        sims = (sub @ qv) / np.where(norms > 0, norms, 1.0)
        return pa.table(
            {
                "vec_id": pa.array(ids[mask], pa.int64()),
                "sim": pa.array(sims, pa.float64()),
            }
        )

    scored = emb.map_batches(bucket_score, batch_format="pyarrow")
    top = (
        scored.filter(lambda r: r["vec_id"] != query_vec_id)
        .sort(["sim", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = range(1, len(top) + 1)
    return pa.Table.from_pandas(top[["rank", "vec_id"]])


def embedding_cosine_dedup(sf_dir: str, threshold: float = 0.999) -> pa.Table:
    """Embedding near-dup pairs: LSH-bucket then verify cosine >= threshold
    within buckets. Output (vec_id_a, vec_id_b)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_planes = 10
    planes_ref = ray.put(np.random.default_rng(7).standard_normal((n_planes, 8)))

    def sig(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        if pl.shape[1] != mat.shape[1]:
            pl = np.random.default_rng(7).standard_normal((n_planes, mat.shape[1]))
        sigs = ((mat @ pl.T) > 0).astype(np.uint64) @ (
            1 << np.arange(n_planes, dtype=np.uint64)
        )
        return pa.table(
            {
                "bucket": pa.array(sigs.astype(np.int64), pa.int64()),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].tolist()
        mat = np.array(group["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.where(norms > 0, norms, 1.0)
        sims = unit @ unit.T
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    a_out.append(a)
                    b_out.append(b)
        return pd.DataFrame({"vec_id_a": a_out, "vec_id_b": b_out})

    pairs = (
        emb.map_batches(sig, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty or "vec_id_a" not in pairs.columns:
        return pa.table({"vec_id_a": pa.array([], pa.int64()),
                         "vec_id_b": pa.array([], pa.int64())})
    pairs = (
        pairs.drop_duplicates()
        .sort_values(["vec_id_a", "vec_id_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(pairs)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns; decode stubbed — no media libs here)
# ---------------------------------------------------------------------------

class MediaFeatureExtractor:
    """Actor-pool stage for opaque binary media columns: schema, batching
    and actor lifecycle are real; the DECODE step is a deterministic stub
    (image/audio libraries are not available in this environment).

    Replace ``_decode`` with a real decoder (PIL/librosa/ffmpeg) on a
    cluster that has them; everything else (small batch_size for large
    payloads, per-actor init, Arrow binary in/out) carries over.
    """

    def __init__(self, decode: bool = False):
        self.decode = decode  # real decode unavailable -> deterministic fake

    def _decode(self, payload: bytes):
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; the pipeline uses deterministic byte-level features"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n_bytes, sha, feats = [], [], []
        for p in payloads:
            if self.decode:
                self._decode(p)
            n_bytes.append(len(p))
            digest = hashlib.sha256(p).digest()
            sha.append(digest.hex())
            # fake embedding: first 8 digest bytes, scaled
            feats.append([b / 255.0 for b in digest[:8]])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "sha256": pa.array(sha, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def media_features(sf_dir: str) -> rd.Dataset:
    """Treat documents.text as an opaque binary payload column and run the
    actor-pool feature extractor (small batches: large-payload pattern)."""

    def to_binary(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(
                    [t.encode() for t in batch.column("text").to_pylist()], pa.binary()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(to_binary, batch_format="pyarrow")
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
    )


def grep_count(sf_dir: str, pattern: str = "ba[a-z]+") -> rd.Dataset:
    """Regex grep over documents (probe's grep subcommand, src/grep.rs,
    re-expressed): per-doc match count for a fixed pattern."""
    rx = re.compile(pattern)

    def scan(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = [len(rx.findall(t)) for t in texts]
        keep = [c > 0 for c in counts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_matches": pa.array(
                    [c for c in counts if c > 0], pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Streaming-shaped ops over the events table (Ray Data has no event-time
# windows; windows are expressed as groupby(key).map_groups over ts-sorted
# groups — the pattern the engine would use for any stream-shaped input)
# ---------------------------------------------------------------------------

def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_tumbling_hourly(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event_type: count + sum(value).
    Pre-aggregated per batch before the groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.timestamp("us"))
        hour = pc.floor_temporal(ts, unit="hour")
        # fixed-point micros so the distributed sum is EXACT (float sums
        # are order-dependent and would not hash-match the SQL oracle)
        micros = np.rint(
            batch.column("value").to_numpy() * 1e6
        ).astype(np.int64)
        tbl = pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": hour,
                "n": pa.array([1] * batch.num_rows, pa.int64()),
                "value_micros": pa.array(micros, pa.int64()),
            }
        )
        df = tbl.to_pandas()
        agg = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("n", "sum"), value_micros=("value_micros", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            rd.aggregate.Sum("n", alias_name="n_events"),
            rd.aggregate.Sum("value_micros", alias_name="value_sum_micros"),
        )
    )
    df = agg.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["event_type", "window_start", "n_events", "value_sum_micros"]]
    )


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Session windows per user (new session when the gap to the previous
    event exceeds ``gap_minutes``): (user_id, session_id, n_events,
    session_start, session_end). groupby(user).map_groups over ts-sorted
    groups — the ordered-log pattern for stream-shaped tables."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        ts = g["ts"].values
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        session_id = np.cumsum(new_session)
        g = g.assign(session_id=session_id)
        out = g.groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("event_id", "count"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        return out[["user_id", "session_id", "n_events", "session_start", "session_end"]]

    df = (
        _events(sf_dir, ["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df)


def source_stats(sf_dir: str) -> pa.Table:
    """Per-source document statistics (groupby + multiple aggregates)."""

    def tok_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "source": batch.column("source"),
                "n_tokens": pa.array(
                    [len(simple_tokens(t)) for t in texts], pa.int64()
                ),
            }
        )

    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(tok_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            rd.aggregate.Count(alias_name="n_docs"),
            rd.aggregate.Sum("n_tokens", alias_name="total_tokens"),
            rd.aggregate.Max("n_tokens", alias_name="max_tokens"),
        )
    )
    df = agg.to_pandas().sort_values("source").reset_index(drop=True)
    df["avg_tokens"] = df["total_tokens"] / df["n_docs"]
    return pa.Table.from_pandas(
        df[["source", "n_docs", "total_tokens", "max_tokens", "avg_tokens"]]
    )


# ---------------------------------------------------------------------------
# Relational wide-step demos over the TPC-H-ish tables (pre-aggregate before
# the shuffle; broadcast the small join side — the engine's standard moves)
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary over lineitem (fixed-point cents so
    distributed sums hash-match the SQL oracle exactly)."""

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.rint(batch.column("l_quantity").to_numpy() * 100).astype(np.int64)
        price = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        df = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_cents": pa.array(qty, pa.int64()),
                "price_cents": pa.array(price, pa.int64()),
                "n": pa.array([1] * batch.num_rows, pa.int64()),
            }
        ).to_pandas()
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            rd.aggregate.Sum("qty_cents", alias_name="sum_qty_cents"),
            rd.aggregate.Sum("price_cents", alias_name="sum_price_cents"),
            rd.aggregate.Sum("n", alias_name="count_order"),
        )
    )
    df = agg.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        df[["l_returnflag", "l_linestatus", "sum_qty_cents", "sum_price_cents", "count_order"]]
    )


def top_customers_by_orders(sf_dir: str, k: int = 25) -> pa.Table:
    """Join orders to customer and rank customers by total order value.
    The customer table is SMALL -> broadcast dict lookup inside map_batches
    (no shuffle join)."""
    import pyarrow.parquet as _pq

    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    name_by_key = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_name").to_pylist())
    )
    ref = ray.put(name_by_key)

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        df = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "total_cents": pa.array(cents, pa.int64()),
                "n": pa.array([1] * batch.num_rows, pa.int64()),
            }
        ).to_pandas()
        agg = df.groupby("o_custkey", as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    agg = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(
            rd.aggregate.Sum("total_cents", alias_name="total_cents"),
            rd.aggregate.Sum("n", alias_name="n_orders"),
        )
    )
    df = agg.to_pandas().sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    names = ray.get(ref)
    df["c_name"] = [names.get(ck, "") for ck in df["o_custkey"]]
    df = df.rename(columns={"o_custkey": "c_custkey"})
    return pa.Table.from_pandas(df[["c_custkey", "c_name", "n_orders", "total_cents"]])
