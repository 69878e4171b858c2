"""Distributed query path over the inverted index.

Two modes sharing one index (SURVEY.md §7.4):

- **compat** (default; rank-identical to probe_ray.oracle, which encodes the
  reference's semantics at document granularity): candidate retrieval from
  postings + filename scan + substring-prefilter for exact/excluded terms,
  then a verification ``map_batches`` over the candidates only that
  recomputes the exact token vector (with query-scoped special terms),
  applies the exact-literal injection rule and boolean admission, then
  candidate-set BM25 statistics (N, df, avgdl over the CANDIDATE set —
  ranking.rs:326-349) and boolean bool-query scoring with coverage boosts.

- **global**: corpus-global statistics frozen at build time; index-only
  retrieval + scoring (no substring verification), vectorized numpy scoring
  over decoded postings with top-k. This is the 10^12-scale throughput path;
  it is validated for self-consistency, not reference-identity.

Candidate-generation narrowing vs the reference's full regex scan is
documented in oracle.py and SURVEY.md §7.4: a doc can only be retrieved via
token membership, the filename rule, or (for special terms) the tokenized
prefilter + substring verification. The oracle implements the identical
rule, and conformance tests assert engine == oracle exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from probe_ray import codec
from probe_ray import queryparse as qp
from probe_ray import tokenizer as tok
from probe_ray.build import IndexPaths
from probe_ray.oracle import BM25_B, BM25_K1, idf, score_expr

RESULT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("rank", pa.int64()),
        ("score", pa.float64()),
        ("bm25_score", pa.float64()),
        ("matched_terms", pa.list_(pa.string())),
    ]
)


def _empty_result() -> pa.Table:
    return RESULT_SCHEMA.empty_table()


@dataclass
class _QueryContext:
    plan: qp.QueryPlan
    filters: qp.SearchFilters
    specials: frozenset[str]
    filenames_enabled: bool
    ast_all_exact: bool
    language: str | None


class Engine:
    """A built index, ready to serve queries."""

    def __init__(self, index: IndexPaths | str):
        self.paths = index if isinstance(index, IndexPaths) else IndexPaths(index)
        self._stats = self.paths.stats()
        self._term_dict: np.ndarray | None = None
        #: per-query observability (LimitedSearchResults-style counters:
        #: models.rs:2-9): set by every search() call
        self.last_metrics: dict = {}

    def _term_dictionary(self) -> np.ndarray:
        """All indexed terms (cached). Used for substring-candidate
        generation: probe's scan matches terms as case-insensitive
        substrings of content (query.rs:363-393), so a doc whose token
        'oauth2' contains the query term 'auth' must be retrievable. Tokens
        are (near-always) literal substrings of the content they came from,
        so scanning the TERM DICTIONARY for containment and unioning those
        postings reproduces substring retrieval without touching content —
        the candidates are then exactly re-verified against content. At
        10^12 scale this dictionary scan is the piece an n-gram term index
        would accelerate."""
        if self._term_dict is None:
            tbl = self._seg_handle().to_table(columns=["term"])
            self._term_dict = np.unique(
                np.asarray(tbl.column("term").to_pylist(), dtype=object)
            )
        return self._term_dict

    def _expand_substring_terms(self, needles: list[str]) -> dict[str, list[str]]:
        """For each needle, the indexed terms containing it as a substring
        (Arrow match_substring over the cached dictionary — C-speed)."""
        if not needles:
            return {}
        terms = self._term_dictionary()
        if getattr(self, "_term_dict_arrow", None) is None:
            self._term_dict_arrow = pa.array(terms.tolist(), pa.string())
        arr = self._term_dict_arrow
        out: dict[str, list[str]] = {}
        for t in needles:
            mask = pc.match_substring(arr, t).to_numpy(zero_copy_only=False)
            out[t] = terms[mask].tolist()
        return out

    # -- char-n-gram substring index ----------------------------------------

    def _has_ngrams(self) -> bool:
        import os

        return bool(self._stats.get("has_ngrams")) and os.path.isdir(
            self.paths.ngrams_dir
        )

    def _gram_doc_ids(self, needles: list[str]) -> dict[str, np.ndarray]:
        """Substring-candidate doc ids from the content char-3-gram index:
        for each needle (len >= 3), intersect the posting lists of its
        3-grams — a SUPERSET of docs containing the needle as a substring
        (grams can match non-contiguously); exact verification happens in
        the normal verify stage. Replaces the O(vocab) per-query dictionary
        scan AND closes the cross-token-boundary narrowing (VERDICT item 3)."""
        from probe_ray.build import NGRAM_N, _term_shard

        per_needle: dict[str, list[str]] = {}
        wanted: set[str] = set()
        for nd in needles:
            if len(nd) < NGRAM_N:
                continue
            gs = sorted({nd[i : i + NGRAM_N] for i in range(len(nd) - NGRAM_N + 1)})
            per_needle[nd] = gs
            wanted.update(gs)
        if not per_needle:
            return {}
        n_shards = self._stats["n_shards"]
        shards = sorted({_term_shard(g, n_shards) for g in wanted})
        # metadata-first: read per-gram df only, probe the RAREST grams per
        # needle (any subset intersection stays a superset of true matches;
        # common grams add read+intersect cost without narrowing)
        meta = self._ngram_read(shards, sorted(wanted), ["gram", "df"])
        df_by_gram: dict[str, int] = {}
        for g, d in zip(meta.column("gram").to_pylist(), meta.column("df").to_pylist()):
            df_by_gram[g] = df_by_gram.get(g, 0) + int(d)
        MAX_PROBE_GRAMS = 6
        probe: dict[str, list[str]] = {}
        out: dict[str, np.ndarray] = {}
        fetch: set[str] = set()
        for nd, gs in per_needle.items():
            if any(g not in df_by_gram for g in gs):
                out[nd] = np.empty(0, dtype=np.int64)  # absent gram: no match
                continue
            sel = sorted(gs, key=df_by_gram.__getitem__)[:MAX_PROBE_GRAMS]
            probe[nd] = sel
            fetch.update(sel)
        if not probe:
            return out
        shards_f = sorted({_term_shard(g, n_shards) for g in fetch})
        tbl = self._ngram_read(shards_f, sorted(fetch), ["gram", "blob"])
        by_gram: dict[str, list[np.ndarray]] = {}
        for g, b in zip(tbl.column("gram").to_pylist(), tbl.column("blob").to_pylist()):
            ids, _ = codec.decode_postings(b)
            by_gram.setdefault(g, []).append(ids.astype(np.int64))
        gram_ids = {g: np.unique(np.concatenate(v)) for g, v in by_gram.items()}
        for nd, sel in probe.items():
            sets = sorted((gram_ids[g] for g in sel), key=len)
            inter = sets[0]
            for s in sets[1:]:
                if inter.size == 0:
                    break
                inter = np.intersect1d(inter, s, assume_unique=True)
            out[nd] = inter
        return out

    # -- segment access -----------------------------------------------------

    def _ngram_read(self, shards: list[int], grams: list[str], columns: list[str]) -> pa.Table:
        import pyarrow.dataset as pads

        if getattr(self, "_ngram_ds_handle", None) is None:
            dirs = self.paths.ngrams_dirs()
            sets = [pads.dataset(d, partitioning="hive") for d in dirs]
            self._ngram_ds_handle = (
                sets[0] if len(sets) == 1 else pads.dataset(sets)
            )
        return self._ngram_ds_handle.to_table(
            columns=columns,
            filter=pads.field("shard").isin(shards)
            & pads.field("gram").isin(grams),
        )

    def _seg_handle(self):
        """Cached pyarrow dataset handle over the hive-partitioned segments
        dir: per-query reads reuse the discovered fragments instead of
        re-walking the directory + footers on every probe (the dominant cost
        of warm global-mode queries)."""
        if getattr(self, "_seg_ds_handle", None) is None:
            import pyarrow.dataset as pads

            dirs = self.paths.segments_dirs()
            sets = [pads.dataset(d, partitioning="hive") for d in dirs]
            # base + committed update generations as one union dataset —
            # appended segment rows merge in every read path exactly like
            # salted blobs (update_index)
            self._seg_ds_handle = sets[0] if len(sets) == 1 else pads.dataset(sets)
        return self._seg_ds_handle

    def _docs_read_table(self, columns=None, filters=None) -> pa.Table:
        """Local (driver-side) docs read across base + committed update
        generations, with optional predicate pushdown."""
        ps = self.paths.docs_paths()
        if len(ps) == 1:
            if filters is not None:
                return pq.read_table(ps[0], columns=columns, filters=filters)
            return pq.read_table(ps[0], columns=columns)
        import pyarrow.dataset as pads

        ds = pads.dataset([pads.dataset(p) for p in ps])
        filt = pq.filters_to_expression(filters) if filters is not None else None
        return ds.to_table(columns=columns, filter=filt)

    def _seg_read(self, shards: list[int], terms: list[str], columns: list[str]) -> pa.Table:
        import pyarrow.dataset as pads

        return self._seg_handle().to_table(
            columns=columns,
            filter=pads.field("shard").isin(shards)
            & pads.field("term").isin(terms),
        )

    def _read_postings(self, terms: list[str]) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """Read + decode postings for the given terms. Pruned at the read:
        shard partition filter + parquet predicate pushdown on term."""
        if not terms:
            return {}
        n_shards = self._stats["n_shards"]
        from probe_ray.build import _term_shard

        shards = sorted({_term_shard(t, n_shards) for t in terms})
        table = self._seg_read(shards, terms, ["term", "salt", "blob"])
        out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        term_col = table.column("term").to_pylist()
        salt_col = table.column("salt").to_pylist()
        blob_col = table.column("blob").to_pylist()
        by_term: dict[str, list[tuple[int, bytes]]] = {}
        for t, s, b in zip(term_col, salt_col, blob_col):
            by_term.setdefault(t, []).append((s, b))
        for t, salted in by_term.items():
            salted.sort()
            ids_parts, tf_parts = [], []
            for _, blob in salted:
                ids, tfs = codec.decode_postings(blob)
                ids_parts.append(ids)
                tf_parts.append(tfs)
            ids = np.concatenate(ids_parts)
            tfs = np.concatenate(tf_parts)
            order = np.argsort(ids, kind="stable")  # doc-id order across
            out[t] = (ids[order], tfs[order])       # salted/split blobs
        return out

    def _probe_postings(
        self, term: str, want: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Skip-pointer probe: decode only the posting BLOCKS that can hold
        ids in ``want`` (sorted), via the stored per-128-entry skip pairs —
        the Block-Max read path of MaxScore's update-only phase. Returns
        (ids, tfs) covering a superset of the wanted ids present."""
        if not term or want.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.uint8)
        n_shards = self._stats["n_shards"]
        from probe_ray.build import _term_shard

        tbl = self._seg_read(
            [_term_shard(term, n_shards)], [term], ["salt", "blob", "skip"]
        )
        rows = sorted(
            zip(
                tbl.column("salt").to_pylist(),
                tbl.column("blob").to_pylist(),
                tbl.column("skip").to_pylist(),
            )
        )
        want_u = np.asarray(np.sort(want), dtype=np.uint64)
        ids_parts, tf_parts = [], []
        blocks_total = 0
        blocks_read = 0
        for _, blob, skip in rows:
            blocks_total += max(1, len(skip) // 16)
            ids, tfs = codec.decode_postings_selective(blob, skip, want_u)
            blocks_read += (ids.size + codec.BLOCK - 1) // codec.BLOCK
            if ids.size:
                ids_parts.append(ids)
                tf_parts.append(tfs)
        if not hasattr(self, "_probe_block_stats"):
            self._probe_block_stats = []
        self._probe_block_stats.append(
            dict(term=term, read=blocks_read, total=blocks_total)
        )
        if not ids_parts:
            return np.empty(0, np.int64), np.empty(0, np.uint8)
        ids = np.concatenate(ids_parts).astype(np.int64)
        tfs = np.concatenate(tf_parts)
        order = np.argsort(ids, kind="stable")
        return ids[order], tfs[order]

    def _docs_ds(self, columns: list[str]) -> rd.Dataset:
        return rd.read_parquet(self.paths.docs_read_paths(), columns=columns)

    def _read_term_bounds(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """(df, max unpacked tf) per term from segment metadata only (df +
        block_max columns; posting blobs are NOT read). Feeds the MaxScore
        upper bounds."""
        if not terms:
            return {}
        n_shards = self._stats["n_shards"]
        from probe_ray.build import _term_shard

        shards = sorted({_term_shard(t, n_shards) for t in terms})
        tbl = self._seg_read(shards, terms, ["term", "df", "block_max"])
        out: dict[str, tuple[int, int]] = {}
        for t, df, bm in zip(
            tbl.column("term").to_pylist(),
            tbl.column("df").to_pylist(),
            tbl.column("block_max").to_pylist(),
        ):
            prev = out.get(t, (0, 0))
            out[t] = (prev[0] + int(df), max(prev[1], max(bm) if bm else 0))
        return out

    def _doc_len_array(self) -> np.ndarray:
        """Dense doc_id -> doc_len array (doc ids are dense by
        construction). Served MEMORY-MAPPED from the build's attribute file
        when present — pages in on demand, so the driver never pins
        4 B x n_docs of heap (the doc-attribute store pattern a cluster
        deployment puts on shared storage). Falls back to an in-memory
        array built from the docs table for pre-attribute-file indexes."""
        if getattr(self, "_dl_arr", None) is None:
            import os

            slices = [
                (q, n) for q, n in self.paths.doc_lens_slices()
                if os.path.exists(q)
            ]
            if slices and os.path.exists(self.paths.doc_lens_path):
                # each slice is trimmed to its RECORDED doc count: the
                # writer pads an empty corpus's npy to shape (1,), so an
                # untrimmed concat after a zero-doc base build would shift
                # every generation doc's length by one
                arrs = [
                    a if n < 0 else a[:n]
                    for q, n in slices
                    for a in (np.load(q, mmap_mode="r"),)
                ]
                # generation slices are doc-id ranges in commit order, so a
                # plain concat is the dense array (single-file case stays a
                # pure mmap; multi-gen concat materializes — acceptable at
                # 4 B/doc, and a cluster deployment would serve the slices
                # from shared storage without the concat)
                self._dl_arr = arrs[0] if len(arrs) == 1 else np.concatenate(arrs)
            else:
                tbl = self._docs_read_table(
                    columns=["doc_id", "doc_len"]
                )
                arr = np.zeros(self._stats["n_docs"], dtype=np.float64)
                arr[tbl.column("doc_id").to_numpy()] = tbl.column(
                    "doc_len"
                ).to_numpy()
                self._dl_arr = arr
        return self._dl_arr

    def _maxscore_topk(self, kw_terms: list[str], k: int,
                       weights: dict[str, int] | None = None):
        """MaxScore pruned top-k over an OR-of-terms query (the Block-Max
        scale path): terms are processed in descending impact-upper-bound
        order (bounds from the stored per-block max tf); once the summed
        bound of the remaining terms cannot beat the current k-th score, no
        NEW doc can enter the top-k, so the remaining (typically hottest)
        posting lists are only probed at the already-accumulated candidates
        instead of being traversed."""
        n_docs = self._stats["n_docs"]
        avgdl = self._stats["avgdl"]
        bounds = self._read_term_bounds(kw_terms)
        terms = [t for t in kw_terms if t in bounds and bounds[t][0] > 0]
        if not terms:
            return np.empty(0, np.int64), np.empty(0), {}
        weights = weights or {}
        idfs = {t: idf(n_docs, bounds[t][0]) for t in terms}
        # keyword multiplicity across Term nodes: score_term_bm25 sums each
        # Term's keywords, so a keyword shared by several Terms contributes
        # once PER TERM (ranking.rs:213-220 + 252-276)
        wt = {t: weights.get(t, 1) for t in terms}
        ubs = {
            t: wt[t] * idfs[t]
            * ((bounds[t][1] * (BM25_K1 + 1.0))
               / (bounds[t][1] + BM25_K1 * (1.0 - BM25_B)))
            for t in terms
        }
        order = sorted(terms, key=lambda t: -ubs[t])
        dl = self._doc_len_array()
        norm_cache: np.ndarray | None = None

        acc_ids = np.empty(0, dtype=np.int64)
        acc_sc = np.empty(0, dtype=np.float64)
        matched: dict[str, np.ndarray] = {}
        update_only = False
        for i, t in enumerate(order):
            remaining_ub = sum(ubs[x] for x in order[i:])
            if acc_ids.size >= k:
                theta = np.partition(acc_sc, -k)[-k]
                if remaining_ub <= theta:
                    update_only = True
                    # accumulator pruning: a doc whose current score plus
                    # the remaining upper bound cannot reach theta can never
                    # enter the top-k — drop it so the skip-pointer probe
                    # touches only viable candidates' blocks (>= keeps
                    # exact ties, which can still win on doc-id order)
                    keep = acc_sc + remaining_ub >= theta
                    if not keep.all():
                        acc_ids = acc_ids[keep]
                        acc_sc = acc_sc[keep]
            if update_only:
                # skip-pointer probe: decode ONLY the blocks containing
                # accumulated candidates (true Block-Max read path)
                ids_u, tfb = self._probe_postings(t, acc_ids)
            else:
                ids_u, tfb = self._read_postings([t]).get(t, (None, None))
            if ids_u is None:
                continue
            ids_t = ids_u.astype(np.int64)
            tf = ((tfb & 0xF) + (tfb >> 4)).astype(np.float64)
            real = tf > 0  # drop shadow postings
            ids_t, tf = ids_t[real], tf[real]
            if ids_t.size == 0:
                continue
            if update_only:
                # probe only at accumulated candidates
                pos = np.searchsorted(ids_t, acc_ids)
                pos_c = np.minimum(pos, ids_t.size - 1)
                hit = ids_t[pos_c] == acc_ids
                tf_at = np.where(hit, tf[pos_c], 0.0)
                nz = tf_at > 0
                normv = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl[acc_ids] / avgdl))
                acc_sc = acc_sc + np.where(
                    nz,
                    wt[t] * idfs[t] * ((tf_at * (BM25_K1 + 1.0)) / (tf_at + normv)),
                    0.0,
                )
                matched[t] = acc_ids[hit]
                continue
            normv = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl[ids_t] / avgdl))
            imp = wt[t] * idfs[t] * ((tf * (BM25_K1 + 1.0)) / (tf + normv))
            matched[t] = ids_t
            # merge impacts into the accumulator
            all_ids = np.union1d(acc_ids, ids_t)
            new_sc = np.zeros(all_ids.size)
            new_sc[np.searchsorted(all_ids, acc_ids)] += acc_sc
            new_sc[np.searchsorted(all_ids, ids_t)] += imp
            acc_ids, acc_sc = all_ids, new_sc
        return acc_ids, acc_sc, matched

    # Small-corpus fast path: below this doc count the per-query work is
    # dominated by Ray execution round-trips, so the engine pins the docs
    # table driver-side (content + lowered content, ~2x corpus bytes) and
    # runs the SAME batch closures locally. Above it, every stage goes
    # through Ray Data (the 10^12-scale path; conformance-tested by
    # tests/test_distributed_paths.py). 1M docs ~ a few GB on this node.
    LOCAL_DOCS_MAX = 1_000_000
    # candidate sets up to this size are verified on the driver (the verify
    # closure is single-threaded there); larger sets fan out via map_batches
    LOCAL_CAND_MAX = 2048
    # same threshold for the VECTORIZED verifier (C-speed on the driver, so
    # much higher); beyond it the verify fans out across the cluster
    LOCAL_VECTOR_CAND_MAX = 100_000
    # block extraction is per-row Python (line matching + window tokenize):
    # fan out beyond a small candidate count even with a pinned docs table
    LOCAL_BLOCK_CAND_MAX = 2048
    # block early termination auto-engages (limits set, ranked query) above
    # this many keyword-matched docs; below it, full extraction is cheap
    # and exact. early_termination=True/False overrides.
    EARLY_TERM_AUTO_MIN = 5000
    # below this many verified feats rows, the exact/files_only finish
    # sorts on the driver — a Ray Sort job costs ~1 s of fixed overhead
    # regardless of size (feats is already materialized, count() is
    # metadata-only). 0 disables the shortcut (tests force the big path).
    LOCAL_FEATS_MAX = 100_000

    def _has_is_test(self) -> bool:
        """Docs built at schema version >= 3 carry the static is_test flag
        (computed once at build; saves the per-query content regex)."""
        if getattr(self, "_is_test_avail", None) is None:
            import pyarrow.dataset as pads

            self._is_test_avail = (
                "is_test" in pads.dataset(self.paths.docs_dir).schema.names
            )
        return self._is_test_avail

    def _local_docs_table(self) -> pa.Table | None:
        if self._stats["n_docs"] > self.LOCAL_DOCS_MAX:
            return None
        if getattr(self, "_docs_cache", None) is None:
            tbl = self._docs_read_table(
                columns=["doc_id", "repo", "path", "lang", "content", "tokens",
                         "n_content_tokens", "path_tokens", "doc_len"]
                + (["is_test"] if self._has_is_test() else []),
            ).sort_by("doc_id")
            # per-engine precomputations shared by every query: lowered
            # content (injection substring checks) and byte sizes (limits)
            tbl = tbl.append_column(
                "content_lower", pc.utf8_lower(tbl.column("content"))
            )
            tbl = tbl.append_column(
                "n_bytes_pre",
                pc.binary_length(tbl.column("content").cast(pa.binary())),
            )
            self._docs_cache = tbl
        return self._docs_cache

    # -- filename matching --------------------------------------------------

    def _path_token_index(self):
        """Inverted index over path tokens (token -> doc_id array), built
        lazily from the narrow (doc_id, path_tokens) projection. The
        filename-match rule then runs against the tiny path-token VOCABULARY
        instead of every doc — the scalable form of probe's filename
        matching (file_list_cache.rs:441-550)."""
        if getattr(self, "_path_idx", None) is None:
            tbl = self._docs_read_table(
                columns=["doc_id", "path_tokens"]
            )
            ids = tbl.column("doc_id").to_pylist()
            ptoks = tbl.column("path_tokens").to_pylist()
            flat_tok: list[str] = []
            flat_id: list[int] = []
            for did, ts in zip(ids, ptoks):
                for t in set(ts):
                    flat_tok.append(t)
                    flat_id.append(did)
            tok_arr = np.asarray(flat_tok, dtype=object)
            id_arr = np.asarray(flat_id, dtype=np.int64)
            order = np.argsort(tok_arr, kind="stable")
            tok_arr, id_arr = tok_arr[order], id_arr[order]
            vocab, starts = np.unique(tok_arr.astype(str), return_index=True)
            bounds = np.append(starts, len(tok_arr))
            self._path_idx = (vocab, bounds, id_arr)
        return self._path_idx

    def _filename_match_term_ids(
        self, ctx: _QueryContext, local_ok: bool
    ) -> dict[str, np.ndarray]:
        """file_list_cache.rs:505-531: for each plan term, the doc ids whose
        path tokens match it (equality / substring either way, the reverse
        direction requiring a >=3-char path token)."""
        term_tokens = {
            t: tok.tokenize(t, ctx.specials) for t in ctx.plan.term_indices
        }
        term_tokens = {t: tt for t, tt in term_tokens.items() if tt}
        if not term_tokens:
            return {}
        if local_ok:
            vocab, bounds, id_arr = self._path_token_index()
            vocab_list = vocab.tolist()
            out: dict[str, np.ndarray] = {}
            for term, tts in term_tokens.items():
                hit_idx = [
                    i
                    for i, v in enumerate(vocab_list)
                    if any(
                        v == tt or tt in v or (len(v) >= 3 and v in tt)
                        for tt in tts
                    )
                ]
                if hit_idx:
                    out[term] = np.unique(
                        np.concatenate(
                            [id_arr[bounds[i]:bounds[i + 1]] for i in hit_idx]
                        )
                    )
            return out
        pairs = self._filename_scan_distributed(term_tokens)
        out2: dict[str, list[int]] = {}
        for did, term in pairs:
            out2.setdefault(term, []).append(did)
        return {t: np.unique(np.array(v, dtype=np.int64)) for t, v in out2.items()}

    def _filename_scan_distributed(self, term_tokens) -> list[tuple[int, str]]:
        """Fallback per-query scan of (doc_id, path_tokens) for corpora too
        large to pin the path-token index driver-side."""

        def scan(batch: pa.Table, tts) -> list[tuple[int, str]]:
            ids = batch.column("doc_id").to_pylist()
            ptoks = batch.column("path_tokens").to_pylist()
            hits = []
            for did, fts in zip(ids, ptoks):
                if not fts:
                    continue
                ft_set = set(fts)
                for term, tts_list in tts.items():
                    hit = any(t in ft_set for t in tts_list) or any(
                        tt in ft or (len(ft) >= 3 and ft in tt)
                        for tt in tts_list
                        for ft in fts
                    )
                    if hit:
                        hits.append((did, term))
            return hits

        tt_ref = ray.put(term_tokens)

        def scan_batch(batch: pa.Table) -> pa.Table:
            hits = scan(batch, ray.get(tt_ref))
            return pa.table(
                {
                    "doc_id": pa.array([h[0] for h in hits], pa.int64()),
                    "term": pa.array([h[1] for h in hits], pa.string()),
                }
            )

        return [
            (r["doc_id"], r["term"])
            for r in self._docs_ds(["doc_id", "path_tokens"])
            .map_batches(scan_batch, batch_format="pyarrow")
            .take_all()
        ]

    # -- candidate generation ----------------------------------------------

    def _candidate_ids(
        self,
        ctx: _QueryContext,
        fname_matches: dict[str, np.ndarray],
        extra_lookup: list[str] = (),
    ) -> tuple[np.ndarray, dict]:
        ti = ctx.plan.term_indices
        plain = [t for t in ti if t not in ctx.specials]
        special = [t for t in ti if t in ctx.specials]
        # original-case keywords for special terms: the static-tokenization
        # prefilter must see the original casing (camelCase splits) so its
        # parts line up with the index built WITHOUT query-scoped specials
        originals: dict[str, str] = {}
        for term in qp.walk_terms(ctx.plan.ast):
            if term.exact or term.excluded:
                for kw in term.keywords:
                    originals.setdefault(kw.lower(), kw)
        use_ngrams = self._has_ngrams()
        gram_ids = self._gram_doc_ids(list(ti)) if use_ngrams else {}
        # dictionary-expansion fallback only for terms the gram index does
        # not cover (needles shorter than NGRAM_N, or no ngram index built)
        expand_terms = [t for t in ti if t not in gram_ids]
        lookup = set(plain)
        special_parts: dict[str, list[str]] = {}
        scan_terms: list[str] = []
        for t in special:
            if t in gram_ids:
                continue  # gram index subsumes the substring prefilter
            parts = tok.tokenize(originals.get(t, t))  # STATIC prefilter
            if parts:
                special_parts[t] = parts
                lookup.update(parts)
            else:
                scan_terms.append(t)
        # substring-candidate expansion over the term dictionary (probe's
        # scan is substring-based; see _term_dictionary)
        expansion = self._expand_substring_terms(expand_terms)
        for exp in expansion.values():
            lookup.update(exp)
        lookup.update(extra_lookup)
        postings = self._read_postings(sorted(lookup))
        id_sets: list[np.ndarray] = [gram_ids[t] for t in ti if t in gram_ids]
        for t in plain:
            for w in expansion.get(t, []) or [t]:
                if w in postings:
                    id_sets.append(postings[w][0].astype(np.int64))
        for t in special:
            for w in expansion.get(t, []):
                if w in postings:
                    id_sets.append(postings[w][0].astype(np.int64))
        for t, parts in special_parts.items():
            sets = [postings[p][0].astype(np.int64) for p in parts if p in postings]
            if len(sets) != len(parts):
                continue  # some part matches nothing -> prefilter empty
            inter = sets[0]
            for s in sets[1:]:
                inter = np.intersect1d(inter, s, assume_unique=True)
            id_sets.append(inter)
        if scan_terms:
            id_sets.append(self._substring_scan(scan_terms))
        for arr in fname_matches.values():
            id_sets.append(arr)
        if not id_sets:
            return np.empty(0, dtype=np.int64), postings
        return np.unique(np.concatenate(id_sets)), postings

    def _substring_scan(self, terms: list[str]) -> np.ndarray:
        """Fallback full substring scan, needed only for special terms whose
        static tokenization is empty (e.g. all-stop-word quoted phrases)."""
        local = self._local_docs_table()
        if local is not None:
            ts = [t.lower() for t in terms]
            ids = local.column("doc_id").to_pylist()
            contents = local.column("content").to_pylist()
            return np.array(
                [d for d, c in zip(ids, contents) if any(t in c.lower() for t in ts)],
                dtype=np.int64,
            )
        terms_ref = ray.put([t.lower() for t in terms])

        def scan(batch: pa.Table) -> pa.Table:
            ts = ray.get(terms_ref)
            ids = batch.column("doc_id").to_pylist()
            contents = batch.column("content").to_pylist()
            hit = [
                did
                for did, c in zip(ids, contents)
                if any(t in c.lower() for t in ts)
            ]
            return pa.table({"doc_id": pa.array(hit, pa.int64())})

        rows = (
            self._docs_ds(["doc_id", "content"])
            .map_batches(scan, batch_format="pyarrow")
            .take_all()
        )
        return np.array([r["doc_id"] for r in rows], dtype=np.int64)

    # above this candidate count the isin read-filter expression gets heavy
    # (it serializes ~7 B/id with every read task — 3.5 MB at 470k ids) and
    # row-group pruning stops helping (wide candidate sets touch every row
    # group anyway); fall back to the broadcast-mask semi-join scan.
    # Measured @524k files / 470k candidates: mask 7.6 s vs predicate 9.2 s.
    FETCH_FILTER_MAX_IDS = 200_000

    def _fetch_candidates(self, ids: np.ndarray, columns: list[str]) -> rd.Dataset:
        if ids.size == 0:
            return rd.from_arrow(
                pa.table({c: pa.array([], pa.int64() if c == "doc_id" else pa.string())
                          for c in ["doc_id"]})
            )
        if ids.size <= self.FETCH_FILTER_MAX_IDS:
            # predicate applied DURING the Arrow scan (row-group pruning +
            # no Python mask stage) — 2-7x faster than scan+mask. Ray's
            # read-task sizing underestimates the post-filter work and
            # coalesces to a handful of tasks, starving the downstream
            # Python-heavy stages — force one read task per CPU.
            import pyarrow.dataset as pads

            try:
                n_cpus = int(ray.cluster_resources().get("CPU", 8))
            except Exception:
                n_cpus = 8
            return rd.read_parquet(
                self.paths.docs_read_paths(),
                columns=columns,
                filter=pads.field("doc_id").isin([int(i) for i in ids]),
                override_num_blocks=max(16, n_cpus),
            )
        ids_ref = ray.put(ids)

        def pick(batch: pa.Table) -> pa.Table:
            want = ray.get(ids_ref)
            mask = np.isin(batch.column("doc_id").to_numpy(), want)
            return batch.filter(pa.array(mask))

        return self._docs_ds(columns).map_batches(pick, batch_format="pyarrow")

    def _rerank_result(
        self,
        result: pa.Table,
        queries: list[str],
        question: str | None,
        model: str,
    ) -> pa.Table:
        """Cross-encoder rerank of the ADMITTED rows (probe_ray.rerank):
        content is fetched for only the result's doc ids (pruned candidate
        read — the 100-TB shape: rerank depth bounds the content read),
        attached as a text column, scored by the actor-pool stage, dropped
        again. Flagged rank=None rows pass through unscored."""
        from probe_ray import rerank as _rr

        if result.num_rows == 0:
            return result
        ids = np.unique(
            result.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        fetched = pa.concat_tables(
            ray.get(
                self._fetch_candidates(ids, ["doc_id", "content"]).to_arrow_refs()
            )
        )
        content = dict(
            zip(
                fetched.column("doc_id").to_pylist(),
                fetched.column("content").to_pylist(),
            )
        )
        text = pa.array(
            [content.get(d, "") for d in result.column("doc_id").to_pylist()],
            pa.string(),
        )
        tbl = result.append_column("text", text)
        out = _rr.rerank_table(tbl, question or " ".join(queries), model=model)
        return out.select([n for n in out.schema.names if n != "text"])

    # -- main entry ---------------------------------------------------------

    def search(
        self,
        queries: list[str] | str,
        *,
        exact: bool = False,
        max_results: int | None = None,
        max_bytes: int | None = None,
        max_tokens: int | None = None,
        language: str | None = None,
        include_filenames: bool = True,
        files_only: bool = False,
        session: str | None = None,
        seen: set[str] | None = None,
        allow_tests: bool = True,
        exhaustive: bool = False,
        mode: str = "compat",
        reranker: str = "bm25",
        question: str | None = None,
    ) -> pa.Table:
        """Search the index.

        Knobs mirror the reference CLI (SURVEY.md Appendix A): ``exact``,
        ``max_results``/``max_bytes``/``max_tokens`` (running-total limits,
        search_limiter.rs), ``language``, ``include_filenames``
        (--exclude-filenames inverse), ``files_only``, and session-based
        dedup: pass ``session`` to persist seen docs per (session,
        query-hash) next to the index (cache.rs:14-42 semantics at document
        granularity), or pass an explicit ``seen`` set of "repo/path" keys.

        ``reranker`` takes the reference CLI's values (cli.rs:35-37):
        bm25/hybrid/hybrid2/tfidf all run the standard BM25 path (as in the
        reference, where the tfidf/hybrid fields are vestigial), and the
        ms-marco-* models dispatch a cross-encoder actor-pool rerank of the
        admitted ranked rows (result_ranking.rs:139-145; model execution
        stubbed — see probe_ray.rerank). ``question`` replaces the keyword
        string as the scored query (cli.rs:92). Deviation: the reference
        reranks pre-limit; this engine reranks the admitted top-N (content
        is only fetched for those ids — the scale-correct shape)."""
        if isinstance(queries, str):
            queries = [queries]
        plan, filters = qp.plan_query(queries, exact)
        ast_all_exact = (not plan.is_universal) and qp.is_exact_search(plan.ast)
        ctx = _QueryContext(
            plan=plan,
            filters=filters,
            specials=plan.specials,
            filenames_enabled=include_filenames and not exact and not ast_all_exact,
            ast_all_exact=ast_all_exact,
            language=language,
        )
        session_key = None
        if session is not None:
            session_key = self._session_key(session, queries)
            seen = (seen or set()) | self._session_seen(session_key)
        import time as _time

        t0 = _time.time()
        from probe_ray import rerank as _rr

        if reranker not in _rr.RERANKER_BM25_ALIASES and (
            reranker not in _rr.RERANKER_MODELS
        ):
            raise ValueError(
                f"unknown reranker {reranker!r}; expected one of "
                f"{_rr.RERANKER_BM25_ALIASES + tuple(_rr.RERANKER_MODELS)}"
            )
        if mode == "global":
            self._probe_block_stats = []
            result = self._search_global(ctx, queries, max_results)
            if reranker in _rr.RERANKER_MODELS:
                result = self._rerank_result(result, queries, question, reranker)
            self.last_metrics = dict(
                mode="global", results=result.num_rows,
                wall_sec=round(_time.time() - t0, 4),
                probe_blocks=self._probe_block_stats,
            )
            # fresh LimitedSearchResults record (global mode applies only
            # max_results, inside the MaxScore top-k itself)
            self.last_search_meta = dict(
                n_results=result.num_rows,
                limits_applied=(
                    dict(max_results=max_results, max_bytes=None,
                         max_tokens=None, total_bytes=0, total_tokens=0)
                    if max_results is not None else None
                ),
                n_skipped_by_limits=0,
                cached_blocks_skipped=None,
                files_skipped_early_termination=None,
            )
            return result
        self._last_limits_meta = None
        result = self._search_compat(
            ctx, queries, exact, max_results, max_bytes, max_tokens,
            files_only, seen, allow_tests, exhaustive,
        )
        if reranker in _rr.RERANKER_MODELS and not files_only:
            result = self._rerank_result(result, queries, question, reranker)
        # LimitedSearchResults metadata (models.rs:2-9) at doc granularity
        lm = self._last_limits_meta or dict(
            limits_applied=None, n_skipped_by_limits=0
        )
        self.last_search_meta = dict(
            n_results=result.num_rows,
            limits_applied=lm.get("limits_applied"),
            n_skipped_by_limits=lm.get("n_skipped_by_limits", 0),
            cached_blocks_skipped=None,
            files_skipped_early_termination=None,
        )
        ranks = result.column("rank").to_pylist()
        self.last_metrics = dict(
            mode="compat",
            results=result.num_rows,
            ranked=sum(1 for r in ranks if r is not None),
            flagged=sum(1 for r in ranks if r is None),
            specials=len(ctx.specials),
            wall_sec=round(_time.time() - t0, 4),
        )
        if session_key is not None and not files_only:
            returned = {
                f"{r}/{p}": int(d)
                for r, p, d in zip(
                    result.column("repo").to_pylist(),
                    result.column("path").to_pylist(),
                    result.column("doc_id").to_pylist(),
                )
            }
            self._session_add(session_key, returned)
        return result

    # -- block-granularity search (the reference's real output unit) --------

    def search_blocks(
        self,
        queries: list[str] | str,
        *,
        exact: bool = False,
        max_results: int | None = None,
        max_bytes: int | None = None,
        max_tokens: int | None = None,
        language: str | None = None,
        include_filenames: bool = True,
        allow_tests: bool = True,
        session: str | None = None,
        seen: set[str] | None = None,
        no_merge: bool = False,
        merge_threshold: int | None = None,
        exhaustive: bool = False,
        mode: str = "compat",
        global_overfetch: int = 8,
        early_termination: bool | None = None,
        reranker: str = "bm25",
        question: str | None = None,
    ) -> pa.Table:
        """Ranked code BLOCKS (fallback-extractor granularity), rank- and
        score-identical to oracle.oracle_search_blocks on the full
        compat extraction path. CAVEAT: with limits set, early termination
        auto-engages above EARLY_TERM_AUTO_MIN (5000) keyword-matched docs
        (search_runner.rs:892-1208 parity) and is then APPROXIMATE vs the
        full extraction (measured span overlap in BASELINE.md's recall
        table); pass ``early_termination=False`` to force the identical
        path at any scale.

        ``reranker``/``question`` mirror Engine.search: ms-marco-* values
        cross-encoder-rerank the admitted blocks by their CODE text (the
        reference reranks SearchResults, which are blocks —
        result_ranking.rs:139-145); bm25/hybrid/hybrid2/tfidf are the
        standard path. Candidates come from
        the index (dictionary substring expansion over the generated pattern
        needles + filename matches + shadow postings); per-candidate line
        matching, window extraction, block stats and code text are computed
        in a ``map_batches`` over candidate docs only. Ranking is the
        candidate-set BM25 with per-block coverage and node-type boosts;
        then limits -> contained dedup -> adjacent merge (block_merging.rs).

        ``mode="global"`` is the SCALE path (engine extension, like doc-mode
        global): instead of extracting/ranking every candidate's blocks,
        MaxScore prunes to the top max_results x global_overfetch docs by
        corpus-global BM25 and only THOSE are block-extracted and ranked.
        APPROXIMATE vs compat: block stats (n/df/avgdl) are computed over
        the pruned OR-match candidate set, not compat's needle-expansion
        set, so scores shift even at full overfetch — the returned SPANS
        converge to compat's top-k as overfetch grows. Requires a
        ranking-term query (exact/filter-only queries ignore the mode)."""
        from probe_ray import blocks as blk
        from probe_ray import rerank as _rr

        if reranker not in _rr.RERANKER_BM25_ALIASES and (
            reranker not in _rr.RERANKER_MODELS
        ):
            raise ValueError(
                f"unknown reranker {reranker!r}; expected one of "
                f"{_rr.RERANKER_BM25_ALIASES + tuple(_rr.RERANKER_MODELS)}"
            )
        if isinstance(queries, str):
            queries = [queries]
        plan, filters = qp.plan_query(queries, exact)
        specials = plan.specials
        ast_all_exact = qp.is_exact_search(plan.ast)
        ctx = _QueryContext(
            plan=plan, filters=filters, specials=specials,
            filenames_enabled=include_filenames and not exact and not ast_all_exact,
            ast_all_exact=ast_all_exact, language=language,
        )
        seen_blocks: dict[str, list[tuple[int, int]]] | None = None
        if session is not None:
            key = self._session_key(session, queries)
            # block-granularity session (cache.rs:36-42): previously
            # returned block spans per file; legacy file-level entries (doc
            # searches / old sessions) still suppress whole files
            seen = (seen or set()) | self._session_seen(key)
            seen_blocks = self._session_seen_blocks(key)

        patterns = blk.term_patterns(plan)
        all_needles = sorted({p for ps in patterns.values() for p in ps})
        fname_matches = (
            self._filename_match_term_ids(
                ctx, local_ok=self._stats["n_docs"] <= self.LOCAL_DOCS_MAX
            )
            if ctx.filenames_enabled
            else {}
        )

        # Ranking terms, plus the POSITIVE subset in the same walk: MaxScore
        # ranks by OR-of-terms, so the global-mode pruning set must exclude
        # NEGATED terms' keywords (they'd ATTRACT the docs the query bans —
        # the doc-mode global path enforces the same via its pure_or
        # guard); the extractor's boolean eval still enforces exclusions on
        # the pruned candidates.
        ranking_terms: list[str] = []
        positive_terms: list[str] = []
        ranking_ast = None
        if not (exact or ast_all_exact):
            try:
                ranking_ast, _ = qp.parse_query(" ".join(queries), False)
                all_kw: set[str] = set()
                pos_kw: set[str] = set()
                for t in qp.walk_terms(ranking_ast):
                    for kw in t.lowercase_keywords:
                        all_kw.add(kw)
                        if not t.excluded:
                            pos_kw.add(kw)
                ranking_terms = sorted(all_kw)
                positive_terms = sorted(pos_kw)
                if len(ranking_terms) > 256:
                    ranking_ast, ranking_terms, positive_terms = None, [], []
            except qp.ParseError:
                ranking_ast = None

        lang_exts = None
        if ctx.language:
            lang_exts = qp._LANG_EXTENSIONS.get(qp.normalize_language(ctx.language))
        self._cached_skip_counter = {"n": 0, "calls": 0}
        extract = _make_block_extractor(
            ctx, patterns, fname_matches, ranking_terms, lang_exts,
            allow_tests=allow_tests, exact=exact, seen=seen,
            seen_blocks=seen_blocks, counter=self._cached_skip_counter,
        )
        cols = ["doc_id", "repo", "path", "content"] + (
            ["is_test"] if self._has_is_test() else []
        )
        n_cached = len(seen or ()) + sum(
            len(v) for v in (seen_blocks or {}).values()
        )

        # early termination (search_runner.rs:892-1208): with limits set the
        # reference never extracts blocks from every matched file — it ranks
        # files by a cheap early score and stops after
        # estimate_files_needed(...) files (or 2x max_results blocks). The
        # final ranking's candidate-set stats then cover the extracted
        # subset only, exactly as in the reference. Auto-on for large
        # keyword-matched sets (EARLY_TERM_AUTO_MIN); force with
        # early_termination=True/False. Falls back to full extraction when
        # fewer keyword-matched docs exist than the estimate needs.
        self.LAST_BLOCKS_EARLY = None
        limited = (
            max_results is not None or max_bytes is not None
            or max_tokens is not None
        )
        early_feats = None
        if (
            mode != "global" and limited and early_termination is not False
            and ranking_ast is not None and positive_terms
            and not (exact or ast_all_exact or plan.is_universal or exhaustive)
        ):
            early_feats = self._early_terminated_extract(
                ranking_terms, positive_terms, len(queries),
                max_results, max_tokens, n_cached, extract, cols,
                forced=early_termination is True,
            )

        # candidate doc ids: the document-level candidate machinery (plain
        # terms, exact/excluded static-tokenization prefilter, dictionary
        # substring expansion, filename matches) UNION the expansion over
        # the extra line-pattern needles (stems / compound parts, which
        # match as substrings at line level)
        use_global = (
            mode == "global"
            and bool(positive_terms)
            and not (exact or ast_all_exact or plan.is_universal or exhaustive)
        )
        if early_feats is not None:
            cand_ids = None  # extraction already done in early-ranked order
        elif use_global:
            # scale path: MaxScore top docs by corpus-global BM25; only
            # their blocks are extracted and ranked. With an active session
            # the top of the pruned set may be entirely cached spans — widen
            # k_docs by the cached file/span count so pagination keeps
            # surfacing unseen matches past them (compat mode ranks all
            # candidates and needs no widening).
            k_docs = max((max_results or 10) * max(global_overfetch, 1), 1) + n_cached
            ids_g, sc_g, _ = self._maxscore_topk(positive_terms, k_docs)
            if ids_g.size == 0:
                return _BLOCK_SCHEMA.empty_table()
            top = np.argsort(-sc_g, kind="stable")[:k_docs]
            cand_ids = np.sort(ids_g[top])
        elif exhaustive or plan.is_universal:
            # universal (filter-only) plans match every doc: no index probe
            # (search_runner.rs:402-411)
            cand_ids = np.arange(self._stats["n_docs"], dtype=np.int64)
        else:
            cand_ids, _ = self._candidate_ids(ctx, fname_matches)
            extra = sorted(set(all_needles) - set(plan.term_indices))
            if extra:
                id_sets = [cand_ids]
                if self._has_ngrams():
                    gram_ids = self._gram_doc_ids(extra)
                    id_sets.extend(gram_ids.values())
                    extra = [t for t in extra if t not in gram_ids]
                if extra:
                    expansion = self._expand_substring_terms(extra)
                    lookup = sorted({w for ws in expansion.values() for w in ws})
                    postings = self._read_postings(lookup)
                    id_sets.extend(p[0].astype(np.int64) for p in postings.values())
                cand_ids = np.unique(np.concatenate(id_sets))
        if cand_ids is not None and cand_ids.size == 0:
            return _BLOCK_SCHEMA.empty_table()

        # block extraction is a Python-heavy per-doc stage (line matching +
        # window tokenization) — unlike the vectorized doc verifier it pays
        # to fan out even when the docs table fits driver-side
        local_tbl = (
            self._local_docs_table()
            if cand_ids is not None and cand_ids.size <= self.LOCAL_BLOCK_CAND_MAX
            else None
        )
        if early_feats is not None:
            feats = early_feats
        elif local_tbl is not None:
            mask = np.isin(local_tbl.column("doc_id").to_numpy(), cand_ids)
            feats = extract(local_tbl.filter(pa.array(mask)))
        else:
            feats_ds = (
                self._fetch_candidates(cand_ids, cols)
                .map_batches(extract, batch_format="pyarrow")
                .materialize()
            )
            n_feats = feats_ds.count()
            if n_feats == 0:
                return _BLOCK_SCHEMA.empty_table()
            if (
                n_feats > self.LOCAL_BLOCK_FEATS_MAX
                and not (exact or ast_all_exact or ranking_ast is None)
            ):
                # 100x-scale finish: block feats NEVER concatenate on the
                # driver — distributed stats reduce + per-block top-k +
                # histogram-located flagged rows (the compat path's scheme
                # at block granularity)
                return self._finish_blocks_distributed(
                    feats_ds, queries, ranking_ast, ranking_terms,
                    max_results, max_bytes, max_tokens,
                    no_merge=no_merge, merge_threshold=merge_threshold,
                    session=session, reranker=reranker, question=question,
                    n_matched=n_feats,
                )
            # zero-row blocks pass through map_batches with the upstream
            # schema — drop before concat
            tables = [
                t
                for t in (ray.get(r) for r in feats_ds.to_arrow_refs())
                if t.num_rows > 0
            ]
            feats = (
                pa.concat_tables(tables) if tables else _BLOCK_FEATS_SCHEMA.empty_table()
            )
        if feats.num_rows == 0:
            return _BLOCK_SCHEMA.empty_table()
        # canonical candidate order: (doc_id, start)
        feats = feats.sort_by([("doc_id", "ascending"), ("start", "ascending")])
        n = feats.num_rows

        rows: list[dict]
        if exact or ast_all_exact or ranking_ast is None:
            rows = _block_rows(feats, order=None)
            rows.sort(key=lambda r: (r["file"], r["start"]))
        else:
            if ranking_terms:
                arr = _tf_matrix(feats.column("tf"), n, dtype=np.int64)
                df_vec = (arr > 0).sum(axis=0)
            else:
                df_vec = np.zeros(0, dtype=np.int64)
            sum_dl = int(np.sum(feats.column("dl").to_numpy()))
            avgdl = sum_dl / n
            idfs = {
                t: idf(n, int(df))
                for t, df in zip(ranking_terms, df_vec)
                if df > 0
            }
            bm25_arr, boosted_arr, valid_arr = _score_feats_vectorized(
                feats, ranking_ast, ranking_terms, idfs, avgdl, len(queries)
            )
            node_boosts = blk.node_type_boost_vec(
                feats.column("node_type").to_pylist(),
                feats.column("start").to_numpy(),
                feats.column("end").to_numpy(),
            )
            boosted_arr = boosted_arr * node_boosts
            valid_idx = np.flatnonzero(valid_arr)
            order = valid_idx[
                np.lexsort(
                    (valid_idx, -bm25_arr[valid_idx], -boosted_arr[valid_idx])
                )
            ]
            k = len(order)
            # limits only ever admit the first max_iter rows (ranked then
            # flagged) — materialize dict rows for just that prefix
            limited = (
                max_results is not None or max_bytes is not None
                or max_tokens is not None
            )
            max_iter = (
                min(max_results if max_results is not None else 1000, n)
                if limited else None
            )
            order_out = order if max_iter is None else order[:max_iter]
            ranked_rows = _block_rows(feats, order=order_out, bm25=bm25_arr,
                                      boosted=boosted_arr)
            flagged_idx = np.arange(k, n)
            if flagged_idx.size:
                repos_f = feats.column("repo").take(
                    pa.array(flagged_idx)
                ).to_pylist()
                paths_f = feats.column("path").take(
                    pa.array(flagged_idx)
                ).to_pylist()
                starts_f = feats.column("start").take(
                    pa.array(flagged_idx)
                ).to_pylist()
                fkeys = [
                    (f"{r}/{p}", s) for r, p, s in zip(repos_f, paths_f, starts_f)
                ]
                forder = sorted(range(len(fkeys)), key=fkeys.__getitem__)
                if max_iter is not None:
                    need = max(0, max_iter - len(ranked_rows))
                    forder = forder[:need]
                flagged_rows = _block_rows(
                    feats, order=flagged_idx[forder], bm25=None, boosted=None
                )
            else:
                flagged_rows = []
            rows = ranked_rows + flagged_rows

        return self._assemble_block_results(
            rows, queries, max_results, max_bytes, max_tokens,
            no_merge=no_merge, merge_threshold=merge_threshold, session=session,
            reranker=reranker, question=question, n_matched=n,
        )

    def _assemble_block_results(
        self, rows, queries, max_results, max_bytes, max_tokens,
        *, no_merge, merge_threshold, session,
        reranker="bm25", question=None, n_matched=None,
    ) -> pa.Table:
        """Shared block finish: limits over code bytes -> code attach ->
        contained dedup -> adjacent merge -> session record -> optional
        cross-encoder rerank of the admitted blocks -> table."""
        from probe_ray import rerank as _rr
        from probe_ray import blocks as blk

        # limits over block code bytes (search_limiter.rs:22-226)
        pre_limit = len(rows)
        limits_meta = dict(limits_applied=None, n_skipped_by_limits=0)
        if max_results is not None or max_bytes is not None or max_tokens is not None:
            max_iter = min(max_results if max_results is not None else 1000, len(rows))
            out_rows: list[dict] = []
            tb = tt = 0
            for i, r in enumerate(rows):
                if i >= max_iter:
                    break
                size = r["n_code_bytes"]
                if max_results is not None and len(out_rows) >= max_results:
                    break
                if max_bytes is not None and tb + size > max_bytes and out_rows:
                    break
                toks = size // 4
                if max_tokens is not None and tt + toks > max_tokens and out_rows:
                    break
                tb += size
                tt += toks
                out_rows.append(r)
            rows = out_rows
            # callers that pre-trim candidate rows for scale pass the true
            # matched-block count so the skip count reflects everything the
            # limits cut, not just the finish-local trim
            base = n_matched if n_matched is not None else pre_limit
            limits_meta = dict(
                limits_applied=dict(
                    max_results=max_results, max_bytes=max_bytes,
                    max_tokens=max_tokens, total_bytes=tb, total_tokens=tt,
                ),
                n_skipped_by_limits=max(base - len(rows), 0),
            )

        # attach code text for the surviving rows (content only for the
        # final files — small), then contained dedup + adjacent merge
        file_lines = self._file_lines_for(sorted({r["doc_id"] for r in rows}))
        for r in rows:
            lines = file_lines[r["doc_id"]]
            r["code"] = "\n".join(lines[r["start"] - 1 : r["end"]])
        rows = blk.dedupe_contained_blocks(rows)
        if not no_merge:
            rows = blk.merge_ranked_blocks(
                rows,
                merge_threshold or blk.MERGE_THRESHOLD_DEFAULT,
                {r["file"]: file_lines[r["doc_id"]] for r in rows},
            )
        if session is not None:
            self._session_add_blocks(
                self._session_key(session, queries),
                [
                    (r["file"], int(r["start"]), int(r["end"]), int(r["doc_id"]))
                    for r in rows
                ],
            )
        out = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "repo": pa.array([r["repo"] for r in rows], pa.string()),
                "path": pa.array([r["path"] for r in rows], pa.string()),
                "start_line": pa.array([r["start"] for r in rows], pa.int64()),
                "end_line": pa.array([r["end"] for r in rows], pa.int64()),
                "node_type": pa.array([r["node_type"] for r in rows], pa.string()),
                "rank": pa.array([r["rank"] for r in rows], pa.int64()),
                "score": pa.array([r["score"] for r in rows], pa.float64()),
                "bm25_score": pa.array(
                    [r["bm25_score"] for r in rows], pa.float64()
                ),
                "matched_keywords": pa.array(
                    [r["matched_keywords"] for r in rows], pa.list_(pa.string())
                ),
                "matched_lines": pa.array(
                    [r["matched_lines"] for r in rows], pa.list_(pa.int64())
                ),
                "code": pa.array([r["code"] for r in rows], pa.string()),
            }
        )
        if reranker in _rr.RERANKER_MODELS:
            out = _rr.rerank_table(
                out, question or " ".join(queries), model=reranker,
                text_col="code",
            )
        # LimitedSearchResults metadata (models.rs:2-9): applied limits +
        # totals, limit-skip count, cached-block skips (exact when the
        # extractor ran in-process; None on the distributed fan-out), and
        # the early-termination file skip count
        counter = getattr(self, "_cached_skip_counter", None) or {}
        early = self.LAST_BLOCKS_EARLY or {}
        self.last_search_meta = dict(
            n_results=out.num_rows,
            limits_applied=limits_meta["limits_applied"],
            n_skipped_by_limits=limits_meta["n_skipped_by_limits"],
            cached_blocks_skipped=(
                counter.get("n") if counter.get("calls") else None
            ),
            files_skipped_early_termination=early.get(
                "files_skipped_early_termination"
            ),
        )
        return out

    # beyond this many block-feat rows the ranking finish goes distributed
    # (stats reduce + per-block top-k); below it the driver concat is faster
    LOCAL_BLOCK_FEATS_MAX = 200_000
    _KEY_SHIFT = 21  # cand_key = doc_id << 21 | start (files are <= 1 MiB
    #                  so line numbers stay well under 2^21)

    def _finish_blocks_distributed(
        self, feats_ds: rd.Dataset, queries, ranking_ast, ranking_terms,
        max_results, max_bytes, max_tokens, *, no_merge, merge_threshold,
        session, reranker="bm25", question=None, n_matched=None,
    ) -> pa.Table:
        """Block-granularity analogue of _finish_ranked_distributed: the
        feats Dataset never concatenates driver-side. Canonical candidate
        order is (doc_id, start) == ascending cand_key."""
        from probe_ray import blocks as blk

        HB = self._HIST_BUCKETS
        SHIFT = self._KEY_SHIFT
        key_max = max((self._stats["n_docs"] + 1) << SHIFT, 1)
        # Divide-before-multiply: key can reach n_docs<<21, so `key * HB`
        # would wrap int64 past ~2^30 docs. Bucket by floor-div of a
        # ceil-width instead (clamped defensively).
        bucket_w = max(1, -(-key_max // HB))
        rt = list(ranking_terms)
        n_queries = len(queries)

        def keys_of(tbl: pa.Table) -> np.ndarray:
            ids = tbl.column("doc_id").to_numpy().astype(np.int64)
            starts = tbl.column("start").to_numpy().astype(np.int64)
            return (ids << SHIFT) + starts

        def partials(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            if n == 0:
                return pa.table(
                    {"n": pa.array([], pa.int64()),
                     "sum_dl": pa.array([], pa.int64()),
                     "df": pa.array([], pa.list_(pa.int64())),
                     "n_valid": pa.array([], pa.int64()),
                     "hist": pa.array([], pa.list_(pa.int64()))}
                )
            if rt:
                tfm = _tf_matrix(tbl.column("tf"), n, dtype=np.int64)
                df_vec = (tfm > 0).sum(axis=0)
            else:
                df_vec = np.zeros(0, dtype=np.int64)
            _, _, valid = _score_feats_vectorized(
                tbl, ranking_ast, rt, {t: 1.0 for t in rt}, 1.0, n_queries
            )
            hist = np.bincount(
                np.minimum(keys_of(tbl) // bucket_w, HB - 1), minlength=HB
            )
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "sum_dl": pa.array(
                        [int(tbl.column("dl").to_numpy().sum())], pa.int64()
                    ),
                    "df": pa.array([df_vec.tolist()], pa.list_(pa.int64())),
                    "n_valid": pa.array([int(valid.sum())], pa.int64()),
                    "hist": pa.array([hist.tolist()], pa.list_(pa.int64())),
                }
            )

        parts = feats_ds.map_batches(partials, batch_format="pyarrow").take_all()
        n_cand = sum(p["n"] for p in parts)
        if n_cand == 0:
            return _BLOCK_SCHEMA.empty_table()
        avgdl = sum(p["sum_dl"] for p in parts) / n_cand
        df_vec = (
            np.sum([p["df"] for p in parts], axis=0)
            if rt else np.zeros(0, dtype=np.int64)
        )
        k_valid = sum(p["n_valid"] for p in parts)
        hist = np.sum([p["hist"] for p in parts], axis=0)
        idfs = {t: idf(n_cand, int(df)) for t, df in zip(rt, df_vec) if df > 0}

        out_cols = ["doc_id", "repo", "path", "start", "end", "node_type",
                    "matched_keywords", "matched_lines", "n_code_bytes"]
        part_schema = pa.schema(
            list(_BLOCK_FEATS_SCHEMA.field(c) for c in out_cols)
            + [pa.field("bm25", pa.float64()), pa.field("boosted", pa.float64())]
        )
        cap = max_results

        def score_topk(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return part_schema.empty_table()
            bm25_a, boosted_a, valid_a = _score_feats_vectorized(
                tbl, ranking_ast, rt, idfs, avgdl, n_queries
            )
            node = blk.node_type_boost_vec(
                tbl.column("node_type").to_pylist(),
                tbl.column("start").to_numpy(),
                tbl.column("end").to_numpy(),
            )
            boosted_a = boosted_a * node
            keys = keys_of(tbl)
            vi = np.flatnonzero(valid_a)
            if vi.size == 0:
                return part_schema.empty_table()
            order = vi[np.lexsort((keys[vi], -bm25_a[vi], -boosted_a[vi]))]
            if cap is not None:
                order = order[:cap]
            sel = tbl.select(out_cols).take(pa.array(order))
            sel = sel.append_column("bm25", pa.array(bm25_a[order], pa.float64()))
            sel = sel.append_column(
                "boosted", pa.array(boosted_a[order], pa.float64())
            )
            return sel.cast(part_schema)

        part_tables = [
            t
            for t in (
                ray.get(r)
                for r in feats_ds.map_batches(
                    score_topk, batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_rows > 0
        ]
        ranked_tbl = (
            pa.concat_tables(part_tables) if part_tables
            else part_schema.empty_table()
        )
        keys_m = keys_of(ranked_tbl) if ranked_tbl.num_rows else np.empty(0, np.int64)
        bm_m = ranked_tbl.column("bm25").to_numpy()
        bo_m = ranked_tbl.column("boosted").to_numpy()
        order_m = np.lexsort((keys_m, -bm_m, -bo_m))
        if max_results is not None:
            order_m = order_m[:max_results]
        merged = ranked_tbl.take(pa.array(order_m))
        rows = [
            dict(
                doc_id=r["doc_id"], repo=r["repo"], path=r["path"],
                file=f"{r['repo']}/{r['path']}", start=r["start"],
                end=r["end"], node_type=r["node_type"], rank=i + 1,
                score=float(r["boosted"]), bm25_score=float(r["bm25"]),
                matched_keywords=list(r["matched_keywords"]),
                matched_lines=list(r["matched_lines"]),
                n_code_bytes=r["n_code_bytes"], but=None, total=None,
            )
            for i, r in enumerate(merged.to_pylist())
        ]

        need_flagged = (
            None if max_results is None else max(0, max_results - len(rows))
        )
        if k_valid < n_cand and (need_flagged is None or need_flagged > 0):
            if k_valid == 0:
                d_star = 0
            else:
                cum = np.cumsum(hist)
                b0 = int(np.searchsorted(cum, k_valid, side="right"))
                prior = int(cum[b0 - 1]) if b0 > 0 else 0

                def pick_bucket(tbl: pa.Table) -> pa.Table:
                    keys = keys_of(tbl)
                    mask = np.minimum(keys // bucket_w, HB - 1) == b0
                    return pa.table({"k": pa.array(keys[mask], pa.int64())})

                bucket_keys = np.sort(
                    np.concatenate(
                        [
                            b.column("k").to_numpy()
                            for b in feats_ds.map_batches(
                                pick_bucket, batch_format="pyarrow"
                            ).iter_batches(batch_format="pyarrow")
                        ]
                        or [np.empty(0, dtype=np.int64)]
                    )
                )
                d_star = int(bucket_keys[k_valid - prior])

            def add_keycol(tbl: pa.Table) -> pa.Table:
                tbl = tbl.append_column(
                    "cand_key", pa.array(keys_of(tbl), pa.int64())
                )
                return self._file_key_column(tbl)

            flagged_ds = (
                feats_ds.map_batches(add_keycol, batch_format="pyarrow")
                .filter(expr=f"cand_key >= {d_star}")
                .sort(["file_key", "start"])
            )
            n_flagged = 0
            for batch in flagged_ds.iter_batches(batch_format="pyarrow"):
                stop = False
                for r in batch.to_pylist():
                    if need_flagged is not None and n_flagged >= need_flagged:
                        stop = True
                        break
                    n_flagged += 1
                    rows.append(
                        dict(
                            doc_id=r["doc_id"], repo=r["repo"], path=r["path"],
                            file=f"{r['repo']}/{r['path']}", start=r["start"],
                            end=r["end"], node_type=r["node_type"], rank=None,
                            score=0.0, bm25_score=0.0,
                            matched_keywords=list(r["matched_keywords"]),
                            matched_lines=list(r["matched_lines"]),
                            n_code_bytes=r["n_code_bytes"], but=None, total=None,
                        )
                    )
                if stop:
                    break
        return self._assemble_block_results(
            rows, queries, max_results, max_bytes, max_tokens,
            no_merge=no_merge, merge_threshold=merge_threshold, session=session,
            reranker=reranker, question=question, n_matched=n_matched,
        )

    def _docs_rows_for(self, ids: np.ndarray, cols: list[str]) -> pa.Table:
        """Doc rows for the given sorted ids (early-termination chunks are
        <= EARLY_BATCH_SIZE docs — a doc-id predicate read prunes row
        groups; the pinned local table is reused when present)."""
        local = (
            self._local_docs_table()
            if self._stats["n_docs"] <= self.LOCAL_DOCS_MAX
            else None
        )
        if local is not None:
            mask = np.isin(local.column("doc_id").to_numpy(), ids)
            return local.filter(pa.array(mask))
        return self._docs_read_table(
            columns=cols,
            filters=[("doc_id", "in", [int(i) for i in ids])],
        )

    def _early_terminated_extract(
        self,
        ranking_terms: list[str],
        positive_terms: list[str],
        n_queries: int,
        max_results: int | None,
        max_tokens: int | None,
        n_cached: int,
        extract,
        cols: list[str],
        *,
        forced: bool,
    ) -> pa.Table | None:
        """Early-ranked batch extraction (search_runner.rs:892-1208 +
        early_ranker.rs:22-77, index-adapted — see blocks.py): rank the
        keyword-matched docs by the early BM25-like score over posting
        presence nibbles, extract blocks in batches of min(100, est) docs
        in that order, and stop once est files are processed or extracted
        blocks exceed 2x max_results. Returns the feats table, or None to
        fall back to full extraction (fewer matched docs than the estimate
        needs, or below the auto threshold). The session's cached file/span
        count widens the estimate so pagination keeps surfacing unseen
        blocks (the reference removes cached files before ranking instead —
        cache filtering here happens inside the extractor)."""
        from probe_ray import blocks as blk

        postings = self._read_postings(ranking_terms)
        empty = (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
        )
        stats: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t in ranking_terms:
            got = postings.get(t)
            if got is None or got[0].size == 0:
                stats[t] = empty
                continue
            ids_t, tfs_t = got
            ctf = (tfs_t & 0xF).astype(np.int64)
            ptf = (tfs_t >> 4).astype(np.int64)
            m = (ctf + ptf) > 0  # tf=0 shadow postings are not matches
            stats[t] = (ids_t[m].astype(np.int64), ctf[m], ptf[m])
        pos_sets = [stats[t][0] for t in positive_terms if stats[t][0].size]
        if not pos_sets:
            return None
        eids = np.unique(np.concatenate(pos_sets))
        est = blk.estimate_files_needed(max_results, max_tokens) + n_cached
        if eids.size < est:
            return None  # full extraction touches fewer files than est
        if not forced and eids.size < self.EARLY_TERM_AUTO_MIN:
            return None
        dls = np.asarray(self._doc_len_array()[eids], dtype=np.float64)
        score = blk.early_rank_scores(
            eids, dls, [stats[t] for t in ranking_terms], n_queries
        )
        ordered = eids[np.lexsort((eids, -score))]
        eff = min(blk.EARLY_BATCH_SIZE, est)
        tables: list[pa.Table] = []
        processed = 0
        n_blocks = 0
        for start in range(0, int(ordered.size), eff):
            chunk = np.sort(ordered[start : start + eff])
            f = extract(self._docs_rows_for(chunk, cols))
            if f.num_rows:
                tables.append(f)
                n_blocks += f.num_rows
            processed += int(chunk.size)
            if processed >= est:
                break
            if max_results is not None and n_blocks > 2 * max_results:
                break
        self.LAST_BLOCKS_EARLY = {
            "files_ranked": int(eids.size),
            "files_processed": processed,
            "files_skipped_early_termination": int(eids.size) - processed,
            "estimated_files_needed": est,
        }
        if not tables:
            return _BLOCK_FEATS_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    def _file_lines_for(self, doc_ids: list[int]) -> dict[int, list[str]]:
        """Effective content lines for the given docs (final-result files
        only — pruned read)."""
        if not doc_ids:
            return {}
        local = getattr(self, "_docs_cache", None)  # reuse if already pinned
        if local is not None:
            ids = local.column("doc_id").to_numpy()
            mask = np.isin(ids, np.asarray(doc_ids, dtype=np.int64))
            sub = local.filter(pa.array(mask))
        else:
            sub = self._docs_read_table(
                columns=["doc_id", "content"],
                filters=[("doc_id", "in", [int(i) for i in doc_ids])],
            )
        return {
            int(i): c.split("\n")
            for i, c in zip(
                sub.column("doc_id").to_pylist(), sub.column("content").to_pylist()
            )
        }

    # -- session cache (cache.rs: block-granularity "file:start-end" keys
    # for block searches; document granularity retained for doc-mode
    # search(); both share the content-sha invalidation scheme) ------------

    def _session_key(self, session: str, queries: list[str]) -> str:
        import hashlib as _h

        qhash = _h.sha256(" AND ".join(queries).encode()).hexdigest()[:16]
        return f"{session}_{qhash}"

    def _session_path(self, key: str) -> str:
        import os

        d = os.path.join(self.paths.root, "sessions")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{key}.json")

    def _file_shas(self, ids_by_file: dict[str, int]) -> dict[str, str]:
        """file-key -> stored content_sha256 for the given docs (doc-id
        predicate read prunes row groups; session sets are small)."""
        if not ids_by_file:
            return {}
        tbl = self._docs_read_table(
            columns=["doc_id", "repo", "path", "content_sha256"],
            filters=[("doc_id", "in", sorted(set(ids_by_file.values())))],
        )
        by_key = {
            f"{r}/{p}": s
            for r, p, s in zip(
                tbl.column("repo").to_pylist(),
                tbl.column("path").to_pylist(),
                tbl.column("content_sha256").to_pylist(),
            )
        }
        return {fk: by_key[fk] for fk in ids_by_file if fk in by_key}

    def _session_seen(self, key: str) -> set[str]:
        """Load the session's seen set, invalidating entries whose file
        content hash changed or whose file vanished (cache.rs:197-240 —
        the reference stores per-file MD5; this engine uses the stored
        content_sha256 invariant, same semantics)."""
        import json
        import os

        p = self._session_path(key)
        if not os.path.exists(p):
            return set()
        with open(p) as f:
            data = json.load(f)
        if isinstance(data, list):  # pre-invalidation format
            return set(data)
        seen = set(data.get("seen", []))
        recorded = data.get("sha", {})
        ids = data.get("ids", {})
        if not recorded or not ids:
            return seen
        current = self._file_shas({fk: ids[fk] for fk in recorded if fk in ids})
        stale = {fk for fk, sha in recorded.items() if current.get(fk) != sha}
        return seen - stale

    def _session_ids(self, key: str) -> dict[str, int]:
        import json
        import os

        p = self._session_path(key)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            data = json.load(f)
        return data.get("ids", {}) if isinstance(data, dict) else {}

    def _session_add(self, key: str, files: dict[str, int]) -> None:
        """Record returned files (file-key -> doc_id) with their content
        hashes for later invalidation."""
        import json

        ids = self._session_ids(key)
        ids.update(files)
        current = self._session_seen(key) | set(files)
        # VALIDATED spans only (session keys are mode-agnostic, so a
        # doc-mode write must not re-persist block spans a content change
        # invalidated — same rule as _session_add_blocks)
        blocks = self._session_seen_blocks(key)
        ids = {
            fk: did
            for fk, did in ids.items()
            if fk in current or fk in blocks
        }
        shas = self._file_shas(ids)
        with open(self._session_path(key), "w") as f:
            json.dump(
                dict(seen=sorted(current), sha=shas, ids=ids,
                     blocks={f: sorted(map(list, rs)) for f, rs in blocks.items()}),
                f,
            )

    # -- block-granularity session entries (cache.rs:36-42: identifiers are
    # "file:start-end" block spans; invalidation reuses the per-file
    # content-sha scheme above) --

    def _session_blocks_raw(self, key: str) -> dict[str, list[tuple[int, int]]]:
        import json
        import os

        p = self._session_path(key)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            return {}
        return {
            f: [tuple(r) for r in rs]
            for f, rs in data.get("blocks", {}).items()
        }

    def _session_seen_blocks(self, key: str) -> dict[str, list[tuple[int, int]]]:
        """Previously returned block spans per file key, dropping every span
        of a file whose content sha changed (cache.rs:197-240 semantics at
        block granularity)."""
        blocks = self._session_blocks_raw(key)
        if not blocks:
            return {}
        ids = self._session_ids(key)
        import json

        with open(self._session_path(key)) as f:
            data = json.load(f)
        recorded = data.get("sha", {}) if isinstance(data, dict) else {}
        tracked = {fk: ids[fk] for fk in blocks if fk in ids and fk in recorded}
        current = self._file_shas(tracked)
        return {
            fk: rs
            for fk, rs in blocks.items()
            if fk not in tracked or current.get(fk) == recorded.get(fk)
        }

    def _session_add_blocks(
        self, key: str, new_blocks: list[tuple[str, int, int, int]]
    ) -> None:
        """Record returned blocks as (file, start, end, doc_id); per-file
        shas ride along for invalidation. Seeds from the VALIDATED span set
        (not the raw file) so spans invalidated by a content change are
        dropped for good — re-persisting them next to the refreshed sha
        would resurrect stale suppressions."""
        import json

        blocks = self._session_seen_blocks(key)
        ids = self._session_ids(key)
        for fk, s, e, did in new_blocks:
            rs = blocks.setdefault(fk, [])
            if (s, e) not in rs:
                rs.append((s, e))
            ids[fk] = did
        seen = self._session_seen(key)
        ids = {fk: did for fk, did in ids.items() if fk in seen or fk in blocks}
        shas = self._file_shas(ids)
        with open(self._session_path(key), "w") as f:
            json.dump(
                dict(seen=sorted(seen), sha=shas, ids=ids,
                     blocks={f2: sorted(map(list, rs)) for f2, rs in blocks.items()}),
                f,
            )

    # -- compat mode --------------------------------------------------------

    def _search_compat(
        self,
        ctx: _QueryContext,
        queries: list[str],
        exact: bool,
        max_results: int | None = None,
        max_bytes: int | None = None,
        max_tokens: int | None = None,
        files_only: bool = False,
        seen: set[str] | None = None,
        allow_tests: bool = True,
        exhaustive: bool = False,
    ) -> pa.Table:
        plan = ctx.plan
        local_tbl = self._local_docs_table()
        fname_matches = self._filename_match_term_ids(
            ctx, local_ok=self._stats["n_docs"] <= self.LOCAL_DOCS_MAX
        ) if (ctx.filenames_enabled and not plan.is_universal) else {}

        lang_exts = None
        if ctx.language:
            lang_exts = qp._LANG_EXTENSIONS.get(qp.normalize_language(ctx.language))

        # ranking AST (re-parsed from the space-joined original queries —
        # result_ranking.rs:149, ranking.rs:288)
        ranking_ast = None
        ranking_terms: list[str] = []
        if not (exact or ctx.ast_all_exact):
            try:
                ranking_ast, _ = qp.parse_query(" ".join(queries), False)
                ranking_terms = sorted(
                    {kw for t in qp.walk_terms(ranking_ast)
                     for kw in t.lowercase_keywords}
                )
                if len(ranking_terms) > 256:
                    ranking_ast, ranking_terms = None, []
            except qp.ParseError:
                ranking_ast = None

        # two verify implementations with identical outputs:
        # - vectorized (Arrow/numpy per-doc term bitmaps) — the fast path,
        #   usable when no query-scoped special terms require re-tokenizing
        # - python row loop — exact/excluded queries and files_only
        use_vector = not ctx.specials and not files_only and allow_tests
        # specials (quoted / exact terms): HYBRID verification — a doc's
        # tokenization can only differ from its stored tokens when content
        # or path CONTAINS a special's text (the invariant the row verifier
        # already relies on), so non-containing rows go through the
        # vectorized postings verifier and only substring-hit rows pay the
        # Python re-tokenize (kills the quoted-exact plateau, r3 item 1)
        use_hybrid = (
            bool(ctx.specials) and not files_only and allow_tests
            and not plan.is_universal
        )
        fast = use_vector or use_hybrid
        compound_parts = {
            t: parts
            for t in plan.term_indices
            if len(parts := tok.split_compound_word_for_filtering(
                t, ctx.specials)) > 1
        }
        extra_terms = (
            set(ranking_terms) | {p for ps in compound_parts.values() for p in ps}
        ) - set(plan.term_indices)
        if use_hybrid:
            # special plan terms are not in _candidate_ids' plain lookup
            # set; the vector sub-verifier needs their postings for token
            # membership on non-containing rows
            extra_terms |= set(ctx.specials) & set(plan.term_indices)
        extra_lookup = sorted(extra_terms) if fast else []

        cand_tbl = None  # local-path candidates (small candidate sets only)
        cand_mask = None  # vector path: candidate mask over the full table
        cand_ds = None
        cols = ["doc_id", "repo", "path", "lang", "content", "doc_len"] + (
            [] if use_vector
            else ["tokens"] if use_hybrid
            else ["tokens", "n_content_tokens"]
        ) + (["is_test"] if not allow_tests and self._has_is_test() else [])
        postings: dict = {}
        if plan.is_universal:
            if use_vector:
                postings = self._read_postings(sorted(set(ranking_terms)))
            if local_tbl is not None and (
                use_vector or self._stats["n_docs"] <= self.LOCAL_CAND_MAX
            ):
                cand_tbl = local_tbl
            else:
                cand_ds = self._docs_ds(cols)
        else:
            cand_ids, postings = self._candidate_ids(ctx, fname_matches, extra_lookup)
            if exhaustive:
                # full-scan mode: every doc is a candidate (probe's actual
                # behavior); verification decides
                cand_ids = np.arange(self._stats["n_docs"], dtype=np.int64)
            if cand_ids.size == 0:
                return _empty_result()
            local_cap = (
                self.LOCAL_VECTOR_CAND_MAX if fast else self.LOCAL_CAND_MAX
            )
            go_local = local_tbl is not None and cand_ids.size <= local_cap
            if go_local:
                mask = np.isin(local_tbl.column("doc_id").to_numpy(), cand_ids)
                if fast and cand_ids.size > 0.5 * self._stats["n_docs"]:
                    # majority of the corpus: skip the table copy, verify
                    # the full cached table under the candidate mask
                    cand_tbl = local_tbl
                    cand_mask = mask
                else:
                    cand_tbl = local_tbl.filter(pa.array(mask))
            else:
                cand_ds = self._fetch_candidates(cand_ids, cols)

        if use_vector:
            verify = _make_vector_verifier(
                ctx, lang_exts, fname_matches, ranking_terms, compound_parts,
                postings, seen=seen,
            )
        elif use_hybrid:
            verify = _make_hybrid_verifier(
                ctx, lang_exts, fname_matches, ranking_terms, compound_parts,
                postings, seen=seen, fanout=cand_tbl is not None,
            )
        else:
            verify = _make_verifier(
                ctx, lang_exts, fname_matches, ranking_terms,
                files_only=files_only, seen=seen, allow_tests=allow_tests,
            )
        if cand_tbl is None:
            # DISTRIBUTED finish (the 100x-scale path): the feats Dataset
            # never materializes on the driver. Stats are a tiny per-block
            # reduce; scoring + per-block top-k run in map_batches; the
            # driver merges <= k rows per block; the positional-overwrite
            # flagged set is located via a doc-id histogram + one narrow
            # boundary-resolve pass (SURVEY.md §7.4's plan, VERDICT item 2).
            feats_ds = cand_ds.map_batches(
                verify, batch_format="pyarrow"
            ).materialize()
            if files_only or exact or ctx.ast_all_exact:
                return self._finish_exact_distributed(
                    feats_ds, plan, max_results, max_bytes, max_tokens
                )
            if ranking_ast is None:
                return _empty_result()
            return self._finish_ranked_distributed(
                feats_ds, plan, queries, ranking_ast, ranking_terms,
                max_results, max_bytes, max_tokens,
            )

        feats_tbl = verify(cand_tbl, cand_mask) if fast else verify(cand_tbl)

        if files_only or exact or ctx.ast_all_exact:
            self._last_limits_meta = {}
            return _finish_exact_local(
                feats_tbl, plan, max_results, max_bytes, max_tokens,
                meta=self._last_limits_meta,
            )

        n = feats_tbl.num_rows
        if n == 0 or ranking_ast is None:
            return _empty_result()

        # candidate-set statistics: N, avgdl, df per ranking term
        # (J6/A3 in SURVEY.md §3; candidate-set semantics per §7.4)
        if ranking_terms:
            arr = _tf_matrix(feats_tbl.column("tf"), n, dtype=np.int64)
            df_vec = (arr > 0).sum(axis=0)
        else:
            df_vec = np.zeros(0, dtype=np.int64)
        sum_dl = int(np.sum(feats_tbl.column("dl").to_numpy()))
        avgdl = sum_dl / n
        idfs = {
            t: idf(n, int(df))
            for t, df in zip(ranking_terms, df_vec)
            if df > 0
        }

        bm25_arr, boosted_arr, valid_arr = _score_feats_vectorized(
            feats_tbl, ranking_ast, ranking_terms, idfs, avgdl, len(queries)
        )
        ids_arr = feats_tbl.column("doc_id").to_numpy()

        # final order: (-boosted, -bm25, doc_id) == the reference's stable
        # boosted-desc sort over (bm25 desc, candidate-index asc) — oracle.py
        valid_idx = np.flatnonzero(valid_arr)
        order = valid_idx[
            np.lexsort(
                (ids_arr[valid_idx], -bm25_arr[valid_idx], -boosted_arr[valid_idx])
            )
        ]
        k = len(order)
        # positional-overwrite quirk (result_ranking.rs:337-358): trailing
        # candidates (in doc-id order) become flagged rank=None entries
        ids_sorted_pos = np.argsort(ids_arr, kind="stable")
        flagged_pos = ids_sorted_pos[k:]

        repos_l = feats_tbl.column("repo").to_pylist()
        paths_l = feats_tbl.column("path").to_pylist()
        kws_b = feats_tbl.column("kws_bits").to_pylist()
        mts_b = feats_tbl.column("matched_bits").to_pylist()
        plan_terms = sorted(plan.term_indices, key=plan.term_indices.__getitem__)
        flagged_order = sorted(
            flagged_pos.tolist(), key=lambda i: f"{repos_l[i]}/{paths_l[i]}"
        )
        if max_results is not None and max_bytes is None and max_tokens is None:
            order = order[:max_results]
            flagged_order = flagged_order[: max(0, max_results - len(order))]
        out_rows = [
            dict(doc_id=int(ids_arr[i]), repo=repos_l[i], path=paths_l[i],
                 rank=r + 1, score=float(boosted_arr[i]),
                 bm25_score=float(bm25_arr[i]),
                 matched_terms=_bits_to_terms(kws_b[i], plan_terms))
            for r, i in enumerate(order.tolist())
        ]
        out_rows += [
            dict(doc_id=int(ids_arr[i]), repo=repos_l[i], path=paths_l[i],
                 rank=None, score=0.0, bm25_score=0.0,
                 matched_terms=_bits_to_terms(mts_b[i], plan_terms))
            for i in flagged_order
        ]
        limits_meta: dict = {}
        out_rows = _apply_limits_rows(out_rows, max_results, max_bytes, max_tokens,
                                      nbytes_by_id=dict(zip(
                                          feats_tbl.column("doc_id").to_pylist(),
                                          feats_tbl.column("n_bytes").to_pylist(),
                                      )), meta=limits_meta)
        if limits_meta.get("limits_applied") is not None:
            # ranked+flagged rows are pre-capped for scale; the true skip
            # count is measured against ALL verified matched docs (n)
            limits_meta["n_skipped_by_limits"] = max(n - len(out_rows), 0)
        self._last_limits_meta = limits_meta
        # whole-file contained-dedup (block_merging.rs:17-118)
        seen: dict[str, dict] = {}
        deduped = []
        for r in out_rows:
            key = f"{r['repo']}/{r['path']}"
            if key in seen:
                seen[key]["matched_terms"] = sorted(
                    set(seen[key]["matched_terms"]) | set(r["matched_terms"])
                )
                continue
            seen[key] = r
            deduped.append(r)
        return _dicts_to_result(deduped)

    # -- distributed compat finish (no O(candidates) driver state) ----------

    _HIST_BUCKETS = 4096

    @staticmethod
    def _file_key_column(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("repo").combine_chunks(),
            batch.column("path").combine_chunks(),
            pa.scalar("/"),
        )
        return batch.append_column("file_key", key)

    def _finish_exact_distributed(
        self, feats_ds: rd.Dataset, plan, max_results, max_bytes, max_tokens
    ) -> pa.Table:
        """files_only / exact path at scale: Ray-side sort by the joined
        file key, then a STREAMING driver consume that stops as soon as the
        running-total limits are satisfied. Small feats sets short-circuit
        to a driver sort (a Ray Sort job has ~1 s fixed overhead)."""
        if feats_ds.count() <= self.LOCAL_FEATS_MAX:
            # zero-row blocks keep their upstream schema (Ray forwards
            # them without calling the UDF) — drop before concat
            parts = [
                t for t in
                (ray.get(r) for r in feats_ds.to_arrow_refs())
                if t.num_rows > 0
            ]
            tbl = (
                pa.concat_tables(parts)
                if parts else _FEATS_SCHEMA.empty_table()
            )
            self._last_limits_meta = {}
            return _finish_exact_local(
                tbl, plan, max_results, max_bytes, max_tokens,
                meta=self._last_limits_meta,
            )
        n_matched = feats_ds.count()
        sorted_ds = feats_ds.map_batches(
            self._file_key_column, batch_format="pyarrow"
        ).sort("file_key")
        pt = sorted(plan.term_indices, key=plan.term_indices.__getitem__)
        out_rows: list[dict] = []
        total_bytes = total_tokens = 0
        for batch in sorted_ds.iter_batches(batch_format="pyarrow"):
            stop = False
            for r in batch.to_pylist():
                if max_results is not None and len(out_rows) >= max_results:
                    stop = True
                    break
                size = r["n_bytes"]
                if max_bytes is not None and total_bytes + size > max_bytes and out_rows:
                    stop = True
                    break
                toks = size // 4
                if max_tokens is not None and total_tokens + toks > max_tokens and out_rows:
                    stop = True
                    break
                total_bytes += size
                total_tokens += toks
                r["matched_terms"] = _bits_to_terms(r.get("matched_bits", b""), pt)
                out_rows.append(r)
            if stop:
                break
        limited = (
            max_results is not None or max_bytes is not None
            or max_tokens is not None
        )
        self._last_limits_meta = dict(
            limits_applied=(
                dict(max_results=max_results, max_bytes=max_bytes,
                     max_tokens=max_tokens, total_bytes=total_bytes,
                     total_tokens=total_tokens)
                if limited else None
            ),
            n_skipped_by_limits=(
                max(n_matched - len(out_rows), 0) if limited else 0
            ),
        )
        return _rows_to_result(out_rows, ranked=False)

    def _finish_ranked_distributed(
        self, feats_ds: rd.Dataset, plan, queries, ranking_ast, ranking_terms,
        max_results, max_bytes, max_tokens,
    ) -> pa.Table:
        HB = self._HIST_BUCKETS
        n_docs_total = max(self._stats["n_docs"], 1)
        # Divide-before-multiply (overflow-proof bucketing; see the block
        # path's bucket_w note).
        bucket_w = max(1, -(-n_docs_total // HB))
        rt = list(ranking_terms)
        n_queries = len(queries)

        # --- pass A: per-block stats partials (tiny rows) ---
        def partials(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            if n == 0:
                return pa.table(
                    {"n": pa.array([], pa.int64()),
                     "sum_dl": pa.array([], pa.int64()),
                     "df": pa.array([], pa.list_(pa.int64())),
                     "n_valid": pa.array([], pa.int64()),
                     "hist": pa.array([], pa.list_(pa.int64()))}
                )
            if rt:
                tfm = _tf_matrix(tbl.column("tf"), n, dtype=np.int64)
                df_vec = (tfm > 0).sum(axis=0)
            else:
                df_vec = np.zeros(0, dtype=np.int64)
            # validity is independent of idf/avgdl VALUES (a term contributes
            # iff tf>0, and tf>0 here implies global df>0): indicator stats
            _, _, valid = _score_feats_vectorized(
                tbl, ranking_ast, rt, {t: 1.0 for t in rt}, 1.0, n_queries
            )
            ids = tbl.column("doc_id").to_numpy()
            hist = np.bincount(
                np.minimum(ids.astype(np.int64) // bucket_w, HB - 1),
                minlength=HB,
            )
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "sum_dl": pa.array(
                        [int(tbl.column("dl").to_numpy().sum())], pa.int64()
                    ),
                    "df": pa.array([df_vec.tolist()], pa.list_(pa.int64())),
                    "n_valid": pa.array([int(valid.sum())], pa.int64()),
                    "hist": pa.array([hist.tolist()], pa.list_(pa.int64())),
                }
            )

        parts = feats_ds.map_batches(partials, batch_format="pyarrow").take_all()
        if not parts:
            return _empty_result()
        n_cand = sum(p["n"] for p in parts)
        if n_cand == 0:
            return _empty_result()
        sum_dl = sum(p["sum_dl"] for p in parts)
        avgdl = sum_dl / n_cand
        df_vec = (
            np.sum([p["df"] for p in parts], axis=0)
            if rt else np.zeros(0, dtype=np.int64)
        )
        k_valid = sum(p["n_valid"] for p in parts)
        hist = np.sum([p["hist"] for p in parts], axis=0)
        idfs = {
            t: idf(n_cand, int(df)) for t, df in zip(rt, df_vec) if df > 0
        }
        plan_terms = sorted(plan.term_indices, key=plan.term_indices.__getitem__)

        # --- pass B: score + per-block top-k (k rows per block max) ---
        cap = max_results

        part_schema = pa.schema(
            [("doc_id", pa.int64()), ("repo", pa.string()),
             ("path", pa.string()), ("kws_bits", pa.binary()),
             ("n_bytes", pa.int64()), ("bm25", pa.float64()),
             ("boosted", pa.float64())]
        )

        def score_topk(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            if n == 0:
                return part_schema.empty_table()
            bm25_a, boosted_a, valid_a = _score_feats_vectorized(
                tbl, ranking_ast, rt, idfs, avgdl, n_queries
            )
            ids = tbl.column("doc_id").to_numpy()
            vi = np.flatnonzero(valid_a)
            if vi.size == 0:
                return part_schema.empty_table()
            order = vi[np.lexsort((ids[vi], -bm25_a[vi], -boosted_a[vi]))]
            if cap is not None:
                order = order[:cap]
            sel = tbl.select(["doc_id", "repo", "path", "kws_bits", "n_bytes"]).take(
                pa.array(order)
            )
            sel = sel.append_column("bm25", pa.array(bm25_a[order], pa.float64()))
            sel = sel.append_column(
                "boosted", pa.array(boosted_a[order], pa.float64())
            )
            return sel.cast(part_schema)

        # NOTE: Ray forwards zero-row input blocks through map_batches
        # without invoking the UDF, so empty blocks can carry the UPSTREAM
        # schema — drop them before concat
        part_tables = [
            t
            for t in (
                ray.get(r)
                for r in feats_ds.map_batches(
                    score_topk, batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_rows > 0
        ]
        ranked_tbl = (
            pa.concat_tables(part_tables) if part_tables
            else part_schema.empty_table()
        )
        # driver k-way merge over <= cap rows per block
        ids_m = ranked_tbl.column("doc_id").to_numpy()
        bm_m = ranked_tbl.column("bm25").to_numpy()
        bo_m = ranked_tbl.column("boosted").to_numpy()
        order_m = np.lexsort((ids_m, -bm_m, -bo_m))
        if max_results is not None:
            order_m = order_m[:max_results]
        merged = ranked_tbl.take(pa.array(order_m))
        out_rows = [
            dict(
                doc_id=r["doc_id"], repo=r["repo"], path=r["path"],
                rank=i + 1, score=float(r["boosted"]),
                bm25_score=float(r["bm25"]),
                matched_terms=_bits_to_terms(r["kws_bits"], plan_terms),
                n_bytes=r["n_bytes"],
            )
            for i, r in enumerate(merged.to_pylist())
        ]

        # --- flagged rows (positional-overwrite quirk): the trailing
        # n_cand - k_valid candidates in doc-id order, located without
        # materializing candidate ids driver-side ---
        need_flagged = (
            None if max_results is None else max(0, max_results - len(out_rows))
        )
        flagged_rows: list[dict] = []
        if k_valid < n_cand and (need_flagged is None or need_flagged > 0):
            if k_valid == 0:
                d_star = 0
            else:
                cum = np.cumsum(hist)
                b0 = int(np.searchsorted(cum, k_valid, side="right"))
                prior = int(cum[b0 - 1]) if b0 > 0 else 0

                # resolve the k-th smallest candidate doc id exactly by
                # fetching ONLY the ids in histogram bucket b0
                def pick_bucket(tbl: pa.Table) -> pa.Table:
                    ids = tbl.column("doc_id").to_numpy().astype(np.int64)
                    mask = np.minimum(ids // bucket_w, HB - 1) == b0
                    return pa.table(
                        {"doc_id": pa.array(ids[mask], pa.int64())}
                    )
                bucket_ids = np.sort(
                    np.concatenate(
                        [
                            b.column("doc_id").to_numpy()
                            for b in feats_ds.map_batches(
                                pick_bucket, batch_format="pyarrow"
                            ).iter_batches(batch_format="pyarrow")
                        ]
                        or [np.empty(0, dtype=np.int64)]
                    )
                )
                d_star = int(bucket_ids[k_valid - prior])
            flagged_ds = (
                feats_ds.filter(expr=f"doc_id >= {d_star}")
                .map_batches(self._file_key_column, batch_format="pyarrow")
                .sort("file_key")
            )
            for batch in flagged_ds.iter_batches(batch_format="pyarrow"):
                stop = False
                for r in batch.to_pylist():
                    if need_flagged is not None and len(flagged_rows) >= need_flagged:
                        stop = True
                        break
                    flagged_rows.append(
                        dict(
                            doc_id=r["doc_id"], repo=r["repo"], path=r["path"],
                            rank=None, score=0.0, bm25_score=0.0,
                            matched_terms=_bits_to_terms(
                                r["matched_bits"], plan_terms
                            ),
                            n_bytes=r["n_bytes"],
                        )
                    )
                if stop:
                    break
        all_rows = out_rows + flagged_rows
        limits_meta: dict = {}
        all_rows = _apply_limits_rows(all_rows, max_results, max_bytes,
                                      max_tokens, meta=limits_meta)
        if limits_meta.get("limits_applied") is not None:
            limits_meta["n_skipped_by_limits"] = max(
                int(n_cand) - len(all_rows), 0
            )
        self._last_limits_meta = limits_meta
        # whole-file contained-dedup (block_merging.rs:17-118)
        seen_files: dict[str, dict] = {}
        deduped = []
        for r in all_rows:
            key = f"{r['repo']}/{r['path']}"
            if key in seen_files:
                seen_files[key]["matched_terms"] = sorted(
                    set(seen_files[key]["matched_terms"]) | set(r["matched_terms"])
                )
                continue
            seen_files[key] = r
            deduped.append(r)
        return _dicts_to_result(deduped)

    # -- global mode --------------------------------------------------------

    def _search_global(
        self, ctx: _QueryContext, queries: list[str], max_results: int | None
    ) -> pa.Table:
        """Corpus-global statistics, index-only scoring (the scale path)."""
        try:
            ranking_ast, _ = qp.parse_query(" ".join(queries), False)
        except qp.ParseError:
            return _empty_result()
        terms = sorted(
            {kw for t in qp.walk_terms(ranking_ast) for kw in t.lowercase_keywords}
        )
        if not terms or len(terms) > 256:
            return _empty_result()

        # pure OR-of-terms + top-k -> MaxScore pruned path (block-max bounds)
        pure_or = all(
            not t.required and not t.excluded for t in qp.walk_terms(ranking_ast)
        )
        if pure_or and max_results is not None:
            mult: dict[str, int] = {}
            for tnode in qp.walk_terms(ranking_ast):
                for kw in tnode.lowercase_keywords:
                    mult[kw] = mult.get(kw, 0) + 1
            acc_ids, acc_sc, matched = self._maxscore_topk(
                terms, max_results, weights=mult
            )
            pos_order = np.lexsort((acc_ids, -acc_sc))[:max_results]
            hit_ids = acc_ids[pos_order]
            hit_sc = acc_sc[pos_order]
            meta = self._doc_meta(hit_ids)
            rows = [
                dict(
                    doc_id=int(d), repo=meta[int(d)][0], path=meta[int(d)][1],
                    rank=i + 1, score=float(s), bm25_score=float(s),
                    matched_terms=[
                        t for t in terms
                        if t in matched and d in matched[t]
                    ],
                )
                for i, (d, s) in enumerate(zip(hit_ids, hit_sc))
            ]
            return _dicts_to_result(rows)

        postings = self._read_postings(terms)
        if not postings:
            return _empty_result()
        n_docs = self._stats["n_docs"]
        avgdl = self._stats["avgdl"]

        # doc lengths for the involved docs only
        all_ids = np.unique(
            np.concatenate([p[0] for p in postings.values()]).astype(np.int64)
        )
        dl_map = self._doc_lens(all_ids)

        idfs = {
            t: idf(
                n_docs,
                int((((postings[t][1] & 0xF) + (postings[t][1] >> 4)) > 0).sum()),
            )
            for t in postings
        }
        # dense local indexing of candidate doc ids
        pos = {int(d): i for i, d in enumerate(all_ids)}
        tf_mat = np.zeros((len(terms), all_ids.size), dtype=np.float64)
        for ti_, t in enumerate(terms):
            if t not in postings:
                continue
            ids, tfb = postings[t]
            tf = (tfb & 0xF) + (tfb >> 4)
            idxs = np.searchsorted(all_ids, ids.astype(np.int64))
            tf_mat[ti_, idxs] = tf
        dls = np.array([dl_map.get(int(d), 0) for d in all_ids], dtype=np.float64)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl)

        def term_scores(ti_: int, t: str) -> np.ndarray:
            tf = tf_mat[ti_]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(tf > 0, idfs.get(t, 0.0) * tf * (BM25_K1 + 1.0) / (tf + norm), 0.0)
            return s

        score_vecs = {t: term_scores(i, t) for i, t in enumerate(terms)}

        def eval_expr(expr: qp.Expr) -> tuple[np.ndarray, np.ndarray]:
            """Returns (score, valid_mask) arrays implementing
            score_expr_bm25_optimized vectorized."""
            if isinstance(expr, qp.Term):
                s = np.zeros(all_ids.size)
                for kw in expr.lowercase_keywords:
                    if kw in score_vecs:
                        s = s + score_vecs[kw]
                if expr.excluded:
                    return np.zeros_like(s), s <= 0
                if expr.required:
                    return s, s > 0
                return s, np.ones_like(s, dtype=bool)
            ls, lv = eval_expr(expr.left)
            rs, rv = eval_expr(expr.right)
            if isinstance(expr, qp.And):
                return ls + rs, lv & rv
            both = lv & rv
            only_l = lv & ~rv
            only_r = rv & ~lv
            s = np.where(both, ls + rs, np.where(only_l, ls, rs))
            return s, lv | rv

        scores, valid = eval_expr(ranking_ast)
        # a doc must have at least one positive contribution to be a hit
        valid = valid & (scores > 0)
        hit_idx = np.flatnonzero(valid)
        order = hit_idx[np.lexsort((all_ids[hit_idx], -scores[hit_idx]))]
        if max_results is not None:
            order = order[:max_results]
        hit_ids = all_ids[order]
        meta = self._doc_meta(hit_ids)
        rows = [
            dict(
                doc_id=int(d),
                repo=meta[int(d)][0],
                path=meta[int(d)][1],
                rank=i + 1,
                score=float(scores[j]),
                bm25_score=float(scores[j]),
                matched_terms=[t for t in terms if tf_mat[terms.index(t), j] > 0],
            )
            for i, (d, j) in enumerate(zip(hit_ids, order))
        ]
        return _dicts_to_result(rows)

    def _doc_lens(self, ids: np.ndarray) -> dict[int, int]:
        """doc_id -> doc_len for the given ids. Served from the engine's
        cached dense array below LOCAL_DOCS_MAX (no per-query table read);
        above it, a doc_id parquet predicate prunes row groups (doc files
        are doc_id-sorted by construction)."""
        if self._stats["n_docs"] <= self.LOCAL_DOCS_MAX:
            arr = self._doc_len_array()
            return {int(i): int(arr[int(i)]) for i in ids}
        tbl = self._docs_read_table(
            columns=["doc_id", "doc_len"],
            filters=[("doc_id", "in", [int(i) for i in ids])],
        )
        return dict(
            zip(tbl.column("doc_id").to_pylist(), tbl.column("doc_len").to_pylist())
        )

    def _doc_meta(self, ids: np.ndarray) -> dict[int, tuple[str, str]]:
        """doc_id -> (repo, path). Engine-cached object arrays below
        LOCAL_DOCS_MAX (read once per engine, not per query); row-group
        predicate read above it (final-result ids only — small)."""
        if self._stats["n_docs"] <= self.LOCAL_DOCS_MAX:
            if getattr(self, "_meta_cache", None) is None:
                tbl = self._docs_read_table(
                    columns=["doc_id", "repo", "path"]
                )
                d = tbl.column("doc_id").to_numpy()
                repo = np.empty(self._stats["n_docs"], dtype=object)
                path = np.empty(self._stats["n_docs"], dtype=object)
                repo[d] = tbl.column("repo").to_pylist()
                path[d] = tbl.column("path").to_pylist()
                self._meta_cache = (repo, path)
            repo, path = self._meta_cache
            return {int(i): (repo[int(i)], path[int(i)]) for i in ids}
        tbl = self._docs_read_table(
            columns=["doc_id", "repo", "path"],
            filters=[("doc_id", "in", [int(i) for i in ids])],
        )
        return {
            int(i): (r, p)
            for i, r, p in zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("repo").to_pylist(),
                tbl.column("path").to_pylist(),
            )
        }


# ---------------------------------------------------------------------------
# Block-granularity schemas + closures
# ---------------------------------------------------------------------------

_BLOCK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("start_line", pa.int64()),
        ("end_line", pa.int64()),
        ("node_type", pa.string()),
        ("rank", pa.int64()),
        ("score", pa.float64()),
        ("bm25_score", pa.float64()),
        ("matched_keywords", pa.list_(pa.string())),
        ("matched_lines", pa.list_(pa.int64())),
        ("code", pa.string()),
    ]
)

_BLOCK_FEATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("node_type", pa.string()),
        ("dl", pa.int32()),
        ("tf", pa.list_(pa.int32())),
        ("but", pa.int32()),
        ("matched_keywords", pa.list_(pa.string())),
        ("matched_lines", pa.list_(pa.int64())),
        ("n_code_bytes", pa.int64()),
    ]
)


def _make_block_extractor(ctx, patterns, fname_matches, ranking_terms, lang_exts,
                          *, allow_tests, exact, seen, seen_blocks=None,
                          counter=None):
    """Per-batch closure: candidate docs -> block feature rows (no code
    text; narrow columns only). Line matching, window extraction and block
    stats are blocks.py pure functions — identical to the oracle's."""
    from probe_ray import blocks as blk
    from probe_ray.tools import is_test_file

    plan = ctx.plan
    filters = ctx.filters
    specials = ctx.specials
    no_filters = filters.is_empty()
    term_indices = plan.term_indices
    pat_ref = ray.put(patterns)
    fname_ref = ray.put(fname_matches)  # term -> sorted doc_id array
    seen = seen or set()
    seen_blocks = {
        f: [tuple(r) for r in ranges] for f, ranges in (seen_blocks or {}).items()
    }
    rt = list(ranking_terms)
    rt_set = frozenset(rt)

    def extract(batch: pa.Table) -> pa.Table:
        # the cached-skip counter only survives when this closure runs in
        # the driver process (the local / early paths); Ray tasks mutate a
        # pickled copy, so callers treat calls == 0 as "count unknown"
        if counter is not None:
            counter["calls"] += 1
        pats = ray.get(pat_ref)
        fnames = ray.get(fname_ref)
        ids = batch.column("doc_id").to_pylist()
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        contents = batch.column("content").to_pylist()
        test_flags = (
            batch.column("is_test").to_pylist()
            if not allow_tests and "is_test" in batch.schema.names
            else None
        )
        ids_np = np.asarray(ids, dtype=np.int64)
        fname_mask = {
            t: np.isin(ids_np, arr) for t, arr in fnames.items()
        }
        out: dict[str, list] = {k: [] for k in (
            "doc_id", "repo", "path", "start", "end", "node_type", "dl",
            "tf", "but", "matched_keywords", "matched_lines", "n_code_bytes")}
        for row_i, (did, repo, path, content) in enumerate(
            zip(ids, repos, paths, contents)
        ):
            if not allow_tests and (
                test_flags[row_i]
                if test_flags is not None
                else is_test_file(path, content)
            ):
                continue
            if lang_exts is not None:
                ext = path.rsplit(".", 1)[-1].lower() if "." in path else None
                if ext is None or ext not in lang_exts:
                    continue
            if not no_filters and not filters.matches_path(path):
                continue
            lines = content.split("\n")
            term_map = blk.line_term_matches(lines, pats)
            if plan.is_universal:
                # "." pattern: every non-empty line matches term 0
                term_map = blk.universal_term_matches(lines)
            for t, mask in fname_mask.items():
                if mask[row_i]:
                    term_map.setdefault(term_indices[t], set()).update(
                        range(1, len(lines) + 1)
                    )
            if not term_map:
                continue
            if not qp.evaluate(plan.ast, set(term_map), term_indices, True):
                continue
            if seen and f"{repo}/{path}" in seen:
                continue
            cached_ranges = seen_blocks.get(f"{repo}/{path}", [])
            if cached_ranges:
                # block-granularity session: drop lines inside previously
                # returned blocks pre-extraction (cache.rs:418-505); each
                # cached span of an admitted file counts as a skipped block
                if counter is not None:
                    counter["n"] += len(cached_ranges)
                term_map = blk.remove_cached_lines(term_map, cached_ranges)
                if not term_map:
                    continue
            for b in blk.extract_blocks(
                lines, path, term_map, plan, specials,
                allow_tests=allow_tests, exact=exact,
            ):
                if (b["start"], b["end"]) in cached_ranges:
                    continue  # exact-id post-filter (cache.rs:318-360;
                    # span already counted with its file's cached ranges)
                if rt:
                    cnt: dict[str, int] = {}
                    for tok_ in b["tokenized"]:
                        if tok_ in rt_set:
                            cnt[tok_] = cnt.get(tok_, 0) + 1
                    tf = [cnt.get(t, 0) for t in rt]
                else:
                    tf = []
                out["doc_id"].append(did)
                out["repo"].append(repo)
                out["path"].append(path)
                out["start"].append(b["start"])
                out["end"].append(b["end"])
                out["node_type"].append(b["node_type"])
                out["dl"].append(len(b["tokenized"]))
                out["tf"].append(tf)
                out["but"].append(b["but"])
                out["matched_keywords"].append(b["matched_keywords"])
                out["matched_lines"].append(b["matched_lines"])
                out["n_code_bytes"].append(
                    len(b["code"].encode("utf-8", "surrogatepass"))
                )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "start": pa.array(out["start"], pa.int64()),
                "end": pa.array(out["end"], pa.int64()),
                "node_type": pa.array(out["node_type"], pa.string()),
                "dl": pa.array(out["dl"], pa.int32()),
                "tf": pa.array(out["tf"], pa.list_(pa.int32())),
                "but": pa.array(out["but"], pa.int32()),
                "matched_keywords": pa.array(
                    out["matched_keywords"], pa.list_(pa.string())
                ),
                "matched_lines": pa.array(
                    out["matched_lines"], pa.list_(pa.int64())
                ),
                "n_code_bytes": pa.array(out["n_code_bytes"], pa.int64()),
            }
        )

    return extract


def _block_rows(feats: pa.Table, order, bm25=None, boosted=None) -> list[dict]:
    """Materialize block feat rows as result dicts. ``order=None`` takes all
    rows unranked; an index array takes those rows, ranked sequentially when
    ``boosted`` is given, else flagged (rank None).

    The selected rows are sliced out with ``take`` BEFORE any Python
    conversion — limits usually admit ~max_results rows out of thousands of
    feats, and converting whole list columns to_pylist dominated warm block
    latency."""
    ranked = boosted is not None
    if order is None:
        sel = feats
        n_sel = feats.num_rows
    else:
        order = np.asarray(order, dtype=np.int64)
        sel = feats.take(pa.array(order))
        n_sel = order.size
        if ranked:
            bm25 = bm25[order]
            boosted = boosted[order]
    ids = sel.column("doc_id").to_pylist()
    repos = sel.column("repo").to_pylist()
    paths = sel.column("path").to_pylist()
    starts = sel.column("start").to_pylist()
    ends = sel.column("end").to_pylist()
    node_types = sel.column("node_type").to_pylist()
    kws = sel.column("matched_keywords").to_pylist()
    mls = sel.column("matched_lines").to_pylist()
    nbytes = sel.column("n_code_bytes").to_pylist()
    rows = []
    for pos in range(n_sel):
        rows.append(
            dict(
                doc_id=ids[pos], repo=repos[pos], path=paths[pos],
                file=f"{repos[pos]}/{paths[pos]}",
                start=starts[pos], end=ends[pos], node_type=node_types[pos],
                rank=(pos + 1) if ranked else None,
                score=float(boosted[pos]) if ranked else 0.0,
                bm25_score=float(bm25[pos]) if ranked else 0.0,
                matched_keywords=list(kws[pos]), matched_lines=list(mls[pos]),
                n_code_bytes=nbytes[pos], but=None, total=None,
            )
        )
    return rows


# ---------------------------------------------------------------------------
# Batch closures (pure functions over broadcast query state)
# ---------------------------------------------------------------------------

_FEATS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("dl", pa.int32()),
        ("tf", pa.list_(pa.int32())),
        # packed per-plan-term bitmasks (np.packbits over the alphabetical
        # plan-term order); decoded to term lists only for FINAL output rows
        ("matched_bits", pa.binary()),
        ("kws_bits", pa.binary()),
        ("but", pa.int32()),
        ("n_bytes", pa.int64()),
    ]
)


def _bits_to_terms(bits: bytes, plan_terms: list[str]) -> list[str]:
    if not bits or not plan_terms:
        return []
    arr = np.unpackbits(np.frombuffer(bits, dtype=np.uint8))[: len(plan_terms)]
    return [t for t, b in zip(plan_terms, arr) if b]


def _make_vector_verifier(ctx, lang_exts, fname_matches, ranking_terms,
                          compound_parts, postings, seen=None):
    """Vectorized candidate verification: per-doc term bitmaps from decoded
    postings (token membership), Arrow match_substring for the exact-literal
    injection rule, numpy boolean evaluation (J2 in SURVEY.md §3.5).
    Output-identical to _make_verifier for queries without dynamic special
    terms; used both driver-side and as a map_batches function."""
    plan = ctx.plan
    term_indices = plan.term_indices
    plan_terms = sorted(term_indices, key=term_indices.__getitem__)
    filters = ctx.filters
    no_filters = filters.is_empty()
    is_universal = plan.is_universal
    vec_eval = None if is_universal else qp.make_vector_evaluator(plan.ast, term_indices)
    seen = seen or set()
    n_queries_terms = len(plan_terms)

    needed_terms = sorted(
        set(plan_terms)
        | set(ranking_terms)
        | {p for ps in compound_parts.values() for p in ps}
    )
    post_small = {}
    for t in needed_terms:
        if t in postings:
            ids, tfb = postings[t]
            post_small[t] = (
                ids.astype(np.int64),
                ((tfb & 0xF) + (tfb >> 4)).astype(np.int16),
            )
    post_ref = ray.put(post_small)
    fname_ref = ray.put(fname_matches)  # term -> sorted doc_id array
    rt_in_plan = {t for t in ranking_terms if t in term_indices}

    def verify(batch: pa.Table, cand_mask=None) -> pa.Table:
        posts = ray.get(post_ref)
        fnames = ray.get(fname_ref)
        n = batch.num_rows
        if n == 0:
            return _FEATS_SCHEMA.empty_table()
        ids = batch.column("doc_id").to_numpy()
        keep = np.ones(n, dtype=bool) if cand_mask is None else cand_mask.copy()
        paths = None
        if lang_exts is not None or not no_filters:
            paths = batch.column("path").to_pylist()
            for i, p in enumerate(paths):
                if lang_exts is not None:
                    ext = p.rsplit(".", 1)[-1].lower() if "." in p else None
                    if ext is None or ext not in lang_exts:
                        keep[i] = False
                        continue
                if not no_filters and not filters.matches_path(p):
                    keep[i] = False

        def member_tf(t):
            pt = posts.get(t)
            if pt is None:
                return np.zeros(n, dtype=bool), None
            pid, ptf = pt
            idx = np.searchsorted(pid, ids)
            idx_c = np.minimum(idx, len(pid) - 1)
            tf_at = np.where(pid[idx_c] == ids, ptf[idx_c], 0).astype(np.int32)
            # token membership requires a REAL posting (tf > 0); tf=0 rows
            # are shadow postings used only for substring candidate gen
            return tf_at > 0, tf_at

        member = {}
        tfvals = {}
        for t in needed_terms:
            member[t], tfvals[t] = member_tf(t)

        # exact-literal injection (file_processing.rs:1353-1358), vectorized
        content_lower = None
        if "content_lower" in batch.schema.names:  # engine-cached
            content_lower = batch.column("content_lower")
        inj = {}
        inj_count = np.zeros(n, dtype=np.int32)
        for t in plan_terms:
            missing = ~member[t]
            if missing.any():
                if content_lower is None:
                    content_lower = pc.utf8_lower(batch.column("content"))
                sub = pc.match_substring(content_lower, t).to_numpy(
                    zero_copy_only=False
                )
                inj[t] = sub & missing
            else:
                inj[t] = np.zeros(n, dtype=bool)
            inj_count += inj[t]

        full = {}
        fname_mask = {}
        for t in plan_terms:
            f = member[t] | inj[t]
            fn_ids = fnames.get(t)
            if fn_ids is not None and ctx.filenames_enabled:
                fname_mask[t] = np.isin(ids, fn_ids)
                f = f | fname_mask[t]
            full[t] = f

        if is_universal:
            admit = keep
        else:
            admit = keep & vec_eval(full, n)
        if seen:
            if paths is None:
                paths = batch.column("path").to_pylist()
            repos_l = batch.column("repo").to_pylist()
            seen_mask = np.array(
                [f"{r}/{p}" in seen for r, p in zip(repos_l, paths)], dtype=bool
            )
            admit &= ~seen_mask
        if not admit.any():
            return _FEATS_SCHEMA.empty_table()

        dl = batch.column("doc_len").to_numpy().astype(np.int32) + inj_count
        tf_mat = np.zeros((n, len(ranking_terms)), dtype=np.int32)
        for j, t in enumerate(ranking_terms):
            v = tfvals.get(t)
            col = v if v is not None else np.zeros(n, dtype=np.int32)
            if t in rt_in_plan:
                col = col + inj[t]
            tf_mat[:, j] = col

        # block stats (file_processing.rs:1426-1469): direct = plan-term
        # presence in the (injected) vector; compound = all parts present
        but = np.zeros(n, dtype=np.int32)
        kws_mask = np.zeros((n, n_queries_terms), dtype=bool)
        for j, t in enumerate(plan_terms):
            direct = member[t] | inj[t]
            comp = np.zeros(n, dtype=bool)
            parts = compound_parts.get(t)
            if parts:
                comp = np.ones(n, dtype=bool)
                for p in parts:
                    pm = member[p] | inj.get(p, False)
                    comp &= pm
                comp &= ~direct
            kws_mask[:, j] = direct | comp
            but += (direct | comp).astype(np.int32)

        sel = np.flatnonzero(admit)
        repos_l = batch.column("repo").to_pylist()
        if paths is None:
            paths = batch.column("path").to_pylist()
        if "n_bytes_pre" in batch.schema.names:
            n_bytes = batch.column("n_bytes_pre").to_numpy()
        else:
            n_bytes = pc.binary_length(
                batch.column("content").cast(pa.binary())
            ).to_numpy(zero_copy_only=False)
        if n_queries_terms:
            matched_mat = np.stack([full[t] for t in plan_terms], axis=1)
            matched_bits = np.packbits(matched_mat[sel], axis=1)
            kws_bits = np.packbits(kws_mask[sel], axis=1)
            mb_list = [b.tobytes() for b in matched_bits]
            kb_list = [b.tobytes() for b in kws_bits]
        else:
            mb_list = [b""] * sel.size
            kb_list = [b""] * sel.size
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "repo": pa.array([repos_l[i] for i in sel], pa.string()),
                "path": pa.array([paths[i] for i in sel], pa.string()),
                "dl": pa.array(dl[sel], pa.int32()),
                "tf": pa.array(tf_mat[sel].tolist(), pa.list_(pa.int32())),
                "matched_bits": pa.array(mb_list, pa.binary()),
                "kws_bits": pa.array(kb_list, pa.binary()),
                "but": pa.array(but[sel], pa.int32()),
                "n_bytes": pa.array(n_bytes[sel].astype(np.int64), pa.int64()),
            }
        )

    return verify


@ray.remote(num_cpus=1)
def _apply_verify(fn, tbl: pa.Table) -> pa.Table:
    return fn(tbl)


# driver-local hybrid verify: above this many substring-hit rows the Python
# re-tokenize sub-verify fans out as plain Ray tasks (the table is already
# in driver memory — a Dataset job's fixed overhead would dominate)
_HIT_FANOUT_MIN = 384
_HIT_FANOUT_TASKS = 32


def _make_hybrid_verifier(ctx, lang_exts, fname_matches, ranking_terms,
                          compound_parts, postings, seen=None, fanout=False):
    """Specials (quoted/exact-term) verification without a full Python row
    loop. Invariant (same one the row verifier's fast path at
    _make_verifier relies on; file_processing.rs:1353-1358 semantics):
    query-scoped special terms can only change a doc's tokenization when
    the doc's content or path CONTAINS a special's text. So rows WITHOUT
    any special substring are verified by the vectorized postings verifier
    (stored tokens == re-tokenized tokens for them), and only
    substring-hit rows pay the Python re-tokenize. Output-identical to
    _make_verifier; usable driver-side (with a candidate mask) and as a
    map_batches function."""
    vec_verify = _make_vector_verifier(
        ctx, lang_exts, fname_matches, ranking_terms, compound_parts,
        postings, seen=seen,
    )
    row_verify = _make_verifier(
        ctx, lang_exts, fname_matches, ranking_terms,
        files_only=False, seen=seen, allow_tests=True,
    )
    specials = sorted(ctx.specials)

    def verify(batch: pa.Table, cand_mask=None) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _FEATS_SCHEMA.empty_table()
        if "content_lower" in batch.schema.names:
            cl = batch.column("content_lower")
        else:
            cl = pc.utf8_lower(batch.column("content"))
            batch = batch.append_column("content_lower", cl)
        pl = pc.utf8_lower(batch.column("path"))
        hit = np.zeros(n, dtype=bool)
        for s in specials:
            hit |= pc.match_substring(cl, s).to_numpy(zero_copy_only=False)
            hit |= pc.match_substring(pl, s).to_numpy(zero_copy_only=False)
        # Arrow utf8_lower can differ from Python str.lower() on a few
        # codepoints (e.g. U+0130 expands to two chars in Python): re-check
        # arrow-NEGATIVE non-ASCII rows with the row verifier's exact
        # `str.lower()` containment rule. Arrow false POSITIVES are
        # harmless — re-tokenizing an unaffected doc reproduces the stored
        # tokens by the invariant above.
        non_ascii = ~(
            pc.string_is_ascii(batch.column("content")).to_numpy(
                zero_copy_only=False)
            & pc.string_is_ascii(batch.column("path")).to_numpy(
                zero_copy_only=False)
        )
        check = non_ascii & ~hit
        if check.any():
            idx = np.flatnonzero(check)
            take = pa.array(idx)
            contents = batch.column("content").take(take).to_pylist()
            paths = batch.column("path").take(take).to_pylist()
            for j, c, p in zip(idx, contents, paths):
                cl_py, pl_py = c.lower(), p.lower()
                if any(s in cl_py or s in pl_py for s in specials):
                    hit[j] = True
        keep = (
            np.ones(n, dtype=bool) if cand_mask is None
            else np.asarray(cand_mask, dtype=bool)
        )
        parts = []
        vec_mask = keep & ~hit
        if vec_mask.any():
            parts.append(vec_verify(batch, vec_mask))
        row_mask = keep & hit
        n_hit = int(row_mask.sum())
        if n_hit:
            sub = batch.filter(pa.array(row_mask))
            if fanout and n_hit >= _HIT_FANOUT_MIN:
                fn_ref = ray.put(row_verify)
                step = -(-n_hit // _HIT_FANOUT_TASKS)
                refs = [
                    _apply_verify.remote(fn_ref, sub.slice(i, step))
                    for i in range(0, n_hit, step)
                ]
                parts.extend(ray.get(refs))
            else:
                parts.append(row_verify(sub))
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return _FEATS_SCHEMA.empty_table()
        if len(parts) == 1:
            return parts[0]
        # the two partitions are doc_id-disjoint; restore doc order
        return pa.concat_tables(parts).sort_by("doc_id")

    return verify


def _apply_limits_rows(rows, max_results, max_bytes, max_tokens,
                       nbytes_by_id=None, meta=None):
    """Running-total limiting in result order (search_limiter.rs:22-226);
    token estimate = bytes/4 (search_limiter.rs:151; tiktoken unavailable
    here — documented deviation, see oracle.estimate_tokens). When
    ``meta`` is a dict it is populated with the LimitedSearchResults
    record (models.rs:2-22): the applied limits + running totals and the
    skipped-row count."""
    if max_results is None and max_bytes is None and max_tokens is None:
        if meta is not None:
            meta.update(limits_applied=None, n_skipped_by_limits=0)
        return rows
    out, total_bytes, total_tokens = [], 0, 0
    for r in rows:
        if max_results is not None and len(out) >= max_results:
            break
        size = nbytes_by_id.get(r["doc_id"], 0) if nbytes_by_id else r.get("n_bytes", 0)
        if max_bytes is not None and total_bytes + size > max_bytes and out:
            break
        toks = size // 4
        if max_tokens is not None and total_tokens + toks > max_tokens and out:
            break
        total_bytes += size
        total_tokens += toks
        out.append(r)
    if meta is not None:
        meta.update(
            limits_applied=dict(
                max_results=max_results, max_bytes=max_bytes,
                max_tokens=max_tokens, total_bytes=total_bytes,
                total_tokens=total_tokens,
            ),
            n_skipped_by_limits=len(rows) - len(out),
        )
    return out


def _terms_to_bits(terms, plan_term_pos) -> bytes:
    if not terms or not plan_term_pos:
        return b""
    arr = np.zeros(len(plan_term_pos), dtype=np.uint8)
    for t in terms:
        p = plan_term_pos.get(t)
        if p is not None:
            arr[p] = 1
    return np.packbits(arr).tobytes()


def _make_verifier(ctx, lang_exts, fname_matches, ranking_terms,
                   files_only=False, seen=None, allow_tests=True):
    plan = ctx.plan
    specials = ctx.specials
    term_items = sorted(plan.term_indices.items(), key=lambda kv: kv[1])
    filters = ctx.filters
    no_filters = filters.is_empty()
    is_universal = plan.is_universal
    term_indices = plan.term_indices
    eval_fast = None if is_universal else qp.make_evaluator(plan.ast, term_indices)
    plan_term_pos = {t: i for i, t in enumerate(sorted(term_indices, key=term_indices.__getitem__))}
    seen = seen or set()
    # invert term -> doc_id arrays into doc_id -> term set for the row loop
    by_doc: dict[int, set[str]] = {}
    for t, arr in fname_matches.items():
        for did in arr.tolist():
            by_doc.setdefault(did, set()).add(t)
    fname_matches = by_doc
    # compound parts per plan term, precomputed once (file_processing.rs:1444)
    compound_parts = {
        t: parts
        for t in term_indices
        if len(parts := tok.split_compound_word_for_filtering(t, specials)) > 1
    }
    fname_ref = ray.put(fname_matches)
    rt_set = frozenset(ranking_terms)

    def verify(batch: pa.Table) -> pa.Table:
        fmatches = ray.get(fname_ref)
        out = {
            "doc_id": [], "repo": [], "path": [], "dl": [], "tf": [],
            "matched_bits": [], "kws_bits": [], "but": [], "n_bytes": [],
        }
        ids = batch.column("doc_id").to_pylist()
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        contents = batch.column("content").to_pylist()
        tokens_col = batch.column("tokens").to_pylist()
        test_flags = (
            batch.column("is_test").to_pylist()
            if not allow_tests and "is_test" in batch.schema.names
            else None
        )
        for row_i, (did, repo, path, content, tokens) in enumerate(zip(
            ids, repos, paths, contents, tokens_col
        )):
            if not allow_tests:
                from probe_ray.tools import is_test_file

                if (
                    test_flags[row_i]
                    if test_flags is not None
                    else is_test_file(path, content)
                ):
                    continue  # --allow-tests off: test files excluded
                    # (file_list_cache.rs allow_tests semantics)
            if lang_exts is not None:
                ext = path.rsplit(".", 1)[-1].lower() if "." in path else None
                if ext is None or ext not in lang_exts:
                    continue
            if not no_filters and not filters.matches_path(path):
                continue
            if specials:
                # dynamic special terms can only change tokenization of a
                # doc whose content/path CONTAINS the special term text
                # (is_special_case compares against words/parts that are
                # substrings of the text); others reuse stored tokens
                cl = content.lower()
                pl = path.lower()
                if any(s in cl or s in pl for s in specials):
                    vector = (
                        tok.tokenize(content, specials)
                        + tok.tokenize(path, specials)
                    )
                else:
                    vector = tokens
            else:
                vector = tokens
            vec_set = set(vector)
            injected = None
            missing = [t for t, _ in term_items if t not in vec_set]
            if missing:
                content_lower = content.lower()
                injected = [t for t in missing if t in content_lower]
                vec_set.update(injected)
            if not is_universal:
                matched = {t for t, _ in term_items if t in vec_set}
                fm = fmatches.get(did)
                if fm:
                    matched |= fm
                if not matched:
                    continue
                midx = {term_indices[t] for t in matched}
                if files_only:
                    # early-filter admission, negatives ignored
                    # (search_runner.rs:637-686, 699-744)
                    if not qp.evaluate(plan.ast, midx, term_indices, True):
                        continue
                else:
                    if seen and f"{repo}/{path}" in seen:
                        continue  # session anti-join (search_runner.rs:746-799)
                    if not eval_fast(midx):
                        continue
            else:
                matched = set()
                if not files_only and seen and f"{repo}/{path}" in seen:
                    continue
            dl = len(vector) + (len(injected) if injected else 0)
            if ranking_terms:
                cnt: dict[str, int] = {}
                for v in vector:
                    if v in rt_set:
                        cnt[v] = cnt.get(v, 0) + 1
                if injected:
                    for t in injected:
                        if t in rt_set:
                            cnt[t] = cnt.get(t, 0) + 1
                tf = [cnt.get(t, 0) for t in ranking_terms]
            else:
                tf = []
            # block stats (file_processing.rs:1426-1469)
            direct = {t for t in term_indices if t in vec_set}
            compound = {
                t for t, parts in compound_parts.items()
                if t not in direct and all(p in vec_set for p in parts)
            }
            out["doc_id"].append(did)
            out["repo"].append(repo)
            out["path"].append(path)
            out["dl"].append(dl)
            out["tf"].append(tf)
            out["matched_bits"].append(
                b"" if files_only else _terms_to_bits(matched, plan_term_pos)
            )
            out["kws_bits"].append(_terms_to_bits(direct | compound, plan_term_pos))
            out["but"].append(len(direct) + len(compound))
            out["n_bytes"].append(len(content.encode("utf-8", "surrogatepass")))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "dl": pa.array(out["dl"], pa.int32()),
                "tf": pa.array(out["tf"], pa.list_(pa.int32())),
                "matched_bits": pa.array(out["matched_bits"], pa.binary()),
                "kws_bits": pa.array(out["kws_bits"], pa.binary()),
                "but": pa.array(out["but"], pa.int32()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
            }
        )

    return verify


def _tf_matrix(col, n: int, dtype=np.float64) -> np.ndarray:
    """Fixed-width list<int> column -> (n, w) matrix via the Arrow values
    buffer — no Python-object round trip (every tf list has len(ranking
    terms) by construction)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(dtype)


def _score_feats_vectorized(feats_tbl, ranking_ast, ranking_terms, idfs, avgdl,
                            n_queries):
    """Vectorized boolean BM25 over the feats table. Mirrors
    score_expr_bm25_optimized (ranking.rs:228-276) with numpy arrays; the
    expression structure (term order, left-to-right sums) matches the scalar
    oracle exactly, so doubles are bit-identical."""
    n = feats_tbl.num_rows
    tf_mat = (
        _tf_matrix(feats_tbl.column("tf"), n)
        if ranking_terms
        else np.zeros((n, 0))
    )
    dls = feats_tbl.column("dl").to_numpy().astype(np.float64)
    # parenthesization mirrors oracle.bm25_tf_part exactly (double parity)
    norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dls / avgdl))
    col = {t: j for j, t in enumerate(ranking_terms)}
    zero = np.zeros(n)

    def term_vec(kw):
        j = col.get(kw)
        if j is None or kw not in idfs:
            return zero
        tf = tf_mat[:, j]
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(
                tf > 0, idfs[kw] * ((tf * (BM25_K1 + 1.0)) / (tf + norm)), 0.0
            )

    def eval_node(e):
        if isinstance(e, qp.Term):
            s = zero
            for kw in e.lowercase_keywords:
                s = s + term_vec(kw)
            if e.excluded:
                return np.zeros(n), s <= 0.0
            if e.required:
                return s, s > 0.0
            return s, np.ones(n, dtype=bool)
        ls, lv = eval_node(e.left)
        rs, rv = eval_node(e.right)
        if isinstance(e, qp.And):
            return ls + rs, lv & rv
        both = lv & rv
        s = np.where(both, ls + rs, np.where(lv, ls, rs))
        return s, lv | rv

    bm25, valid = eval_node(ranking_ast)
    but = feats_tbl.column("but").to_numpy().astype(np.float64)
    cov = np.minimum(but / n_queries, 1.0) if n_queries > 0 else np.zeros(n)
    boosted = bm25 * (1.0 + cov**1.5 * 2.0)
    return np.asarray(bm25, dtype=np.float64), boosted, valid


def _finish_exact_local(
    feats_tbl: pa.Table, plan, max_results, max_bytes, max_tokens,
    meta: dict | None = None,
) -> pa.Table:
    """Shared files_only/exact finish over driver-sized feats: file-key
    sort, running-total limits, matched-term decode (used by both the
    local verify branch and the small-feats distributed shortcut)."""
    rows = feats_tbl.to_pylist()
    rows.sort(key=lambda r: f"{r['repo']}/{r['path']}")
    rows = _apply_limits_rows(rows, max_results, max_bytes, max_tokens,
                              meta=meta)
    pt = sorted(plan.term_indices, key=plan.term_indices.__getitem__)
    for r in rows:
        r["matched_terms"] = _bits_to_terms(r.get("matched_bits", b""), pt)
    return _rows_to_result(rows, ranked=False)


def _rows_to_result(rows, ranked: bool) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "rank": pa.array([None] * len(rows), pa.int64()),
            "score": pa.array([0.0] * len(rows), pa.float64()),
            "bm25_score": pa.array([0.0] * len(rows), pa.float64()),
            "matched_terms": pa.array(
                [list(r["matched_terms"]) for r in rows], pa.list_(pa.string())
            ),
        }
    )


def _dicts_to_result(rows) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "rank": pa.array([r["rank"] for r in rows], pa.int64()),
            "score": pa.array([r["score"] for r in rows], pa.float64()),
            "bm25_score": pa.array([r["bm25_score"] for r in rows], pa.float64()),
            "matched_terms": pa.array(
                [r["matched_terms"] for r in rows], pa.list_(pa.string())
            ),
        }
    )


def search(index_dir: str, queries, **kwargs) -> pa.Table:
    return Engine(index_dir).search(queries, **kwargs)
