"""Single-process oracle: the document-granularity reference semantics.

This module defines EXACTLY what the distributed engine must compute. It is a
pure-Python, no-Ray implementation of probe's search pipeline re-expressed at
document granularity over a corpus of (repo, path, commit, lang, content)
rows. Conformance tests assert the Ray engine's results are identical
(doc ids, ranks, scores to 1e-9) to this oracle.

Pipeline (citations into /root/reference/):

1. Guard: drop rows with NUL bytes or content > 1 MiB (file_guard.rs:5,
   107-120). Lines > 500 chars are blanked before tokenization/matching
   (file_processing.rs:1117-1134).
2. Query: multiple query strings joined with " AND "
   (search_runner.rs:371-375); parse -> filters -> plan (queryparse.py).
3. Term matching, the documented index-friendly narrowing of probe's
   line-regex scan (SURVEY.md §7.4): a doc matches term t iff
     t ∈ tokens(content_eff, specials)            (token membership), or
     t is a substring of lower(content_eff)       (the exact-literal
        injection rule, file_processing.rs:1353-1358), or
     t filename-matches the path (file_list_cache.rs:505-531) — only when
        filename matching is enabled (not exact / all-exact / disabled,
        search_runner.rs:514-517).
4. Admission: evaluate(matched, negatives enforced)
   (file_processing.rs:84-210). Docs with no matched terms are never
   candidates (they are never scanned into file_term_map) — so a pure
   negation query returns nothing, as in the reference.
5. Ranking (skipped for exact / all-exact queries, then results sort by
   (file, start_line)): candidate-set BM25 with k1=1.5, b=0.5
   (ranking.rs:363-364), IDF = ln(1+(N-df+0.5)/(df+0.5)) (ranking.rs:136-139),
   boolean bool-query scoring (ranking.rs:228-276), statistics computed over
   the CANDIDATE set only (ranking.rs:326-349). Document token vector =
   tokenize(content_eff) ++ tokenize(path) ++ injected literals
   (ranking.rs:56-61, file_processing.rs:1353-1358); tf comes from that
   vector, dl = its length. The ranking AST is re-parsed from the
   space-joined query strings (result_ranking.rs:149, ranking.rs:288).
6. Boosts: boosted = bm25 * coverage_boost * node_type_boost;
   node_type_boost = 1.0 (documents are whole files);
   coverage_boost = 1 + min(block_unique_terms/len(queries), 1)^1.5 * 2
   (result_ranking.rs:8-18). block_unique_terms = |direct token matches| +
   |compound matches| over the plan's term_indices keys
   (file_processing.rs:1426-1469).
7. Order: boosted desc (stable over bm25 desc, candidate-index asc), rank
   reassigned 1-based (result_ranking.rs:320-333); scoring-vetoed docs
   reproduce the positional-overwrite behavior of result_ranking.rs:337-358
   (trailing candidates flagged rank=None, score=0, ordered by file); final
   deterministic tie-break (file, start_line) (search_runner.rs:1336-1359).
8. max_results limiting (search_limiter.rs:22-226), then contained-block
   dedup (block_merging.rs:17-118) which at document granularity removes
   exact duplicates from the overwrite quirk.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from probe_ray import queryparse as qp
from probe_ray import tokenizer as tok

MAX_FILE_SIZE = 1 << 20  # file_guard.rs:5
MAX_BLOCK_LINE_LEN = 500  # file_processing.rs:1117-1134
BM25_K1 = 1.5  # ranking.rs:363
BM25_B = 0.5  # ranking.rs:364
MAX_QUERY_TERMS = 256  # ranking.rs:164-167


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8", errors="surrogatepass")).hexdigest()


def guard_ok(content: str) -> bool:
    """file_guard.rs: reject NUL bytes and oversized files."""
    if "\x00" in content:
        return False
    if len(content.encode("utf-8", errors="surrogatepass")) > MAX_FILE_SIZE:
        return False
    return True


def effective_content(content: str) -> str:
    """Blank lines longer than 500 chars (file_processing.rs:1117-1134)."""
    lines = content.split("\n")
    if all(len(l) <= MAX_BLOCK_LINE_LEN for l in lines):
        return content
    return "\n".join("" if len(l) > MAX_BLOCK_LINE_LEN else l for l in lines)


@dataclass
class Doc:
    doc_id: int
    repo: str
    path: str
    commit: str
    lang: str
    content: str  # effective (blanked) content
    content_sha256: str

    @property
    def file(self) -> str:
        return f"{self.repo}/{self.path}"


@dataclass
class SearchHit:
    doc_id: int
    repo: str
    path: str
    rank: int | None
    score: float  # boosted score
    bm25_score: float
    matched_terms: list[str] = field(default_factory=list)


def load_docs(rows: list[dict]) -> list[Doc]:
    """Deterministic doc_id assignment: sort by (repo, path, commit)
    (SURVEY.md §1.2); guard-rejected rows are dropped."""
    rows = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    docs = []
    for r in rows:
        if not guard_ok(r["content"]):
            continue
        docs.append(
            Doc(
                doc_id=len(docs),
                repo=r["repo"],
                path=r["path"],
                commit=r["commit"],
                lang=r.get("lang", ""),
                content=effective_content(r["content"]),
                content_sha256=sha256_hex(r["content"]),
            )
        )
    return docs


def filename_match_terms(
    path: str, term_indices: dict[str, int], specials: frozenset[str]
) -> set[str]:
    """file_list_cache.rs:505-531: term tokens vs path tokens with two-way
    substring containment (path-token side must be >= 3 chars for the
    reverse direction)."""
    path_tokens = tok.tokenize(path, specials)
    if not path_tokens:
        return set()
    matched = set()
    for term in term_indices:
        term_tokens = tok.tokenize(term, specials)
        hit = any(
            ft == tt or tt in ft or (len(ft) >= 3 and ft in tt)
            for tt in term_tokens
            for ft in path_tokens
        )
        if hit:
            matched.add(term)
    return matched


def doc_token_vector(
    doc: Doc, term_indices: dict[str, int], specials: frozenset[str]
) -> list[str]:
    """tokenize(content) ++ tokenize(path) ++ injected substring literals
    (ranking.rs:56-61; file_processing.rs:1353-1358). Injection iterates
    plan terms in index order for determinism (reference order is
    HashMap-arbitrary; tf/df/dl are order-insensitive)."""
    vector = tok.tokenize(doc.content, specials) + tok.tokenize(doc.path, specials)
    if term_indices:
        present = set(vector)
        content_lower = doc.content.lower()
        for term in sorted(term_indices, key=term_indices.__getitem__):
            if term not in present and term in content_lower:
                vector.append(term)
                present.add(term)
    return vector


def coverage_boost(block_unique_terms: int, query_count: int) -> float:
    """result_ranking.rs:8-18."""
    cov = min(block_unique_terms / query_count, 1.0) if query_count > 0 else 0.0
    return 1.0 + cov**1.5 * 2.0


def idf(n_docs: int, df: int) -> float:
    """ranking.rs:136-139."""
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_part(tf: float, dl: int, avgdl: float) -> float:
    """ranking.rs:186-210."""
    return (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
    )


def score_expr(
    expr: qp.Expr, tf: dict[str, int], dl: int, avgdl: float, idfs: dict[str, float]
) -> float | None:
    """ranking.rs:228-276 (score_expr_bm25_optimized)."""
    if isinstance(expr, qp.Term):
        score = 0.0
        for kw in expr.lowercase_keywords:
            freq = tf.get(kw, 0)
            if freq > 0:
                score += idfs.get(kw, 0.0) * bm25_tf_part(freq, dl, avgdl)
        if expr.excluded:
            return None if score > 0.0 else 0.0
        if expr.required:
            return score if score > 0.0 else None
        return score
    l = score_expr(expr.left, tf, dl, avgdl, idfs)
    r = score_expr(expr.right, tf, dl, avgdl, idfs)
    if isinstance(expr, qp.And):
        if l is None or r is None:
            return None
        return l + r
    if l is None and r is None:
        return None
    return (l or 0.0) + (r or 0.0)


def oracle_search(rows: list[dict], queries: list[str], **kwargs) -> list[SearchHit]:
    return oracle_search_docs(load_docs(rows), queries, **kwargs)


def estimate_tokens(n_bytes: int) -> int:
    """bytes/4 token estimate (search_limiter.rs:151). The reference
    refines this lazily with tiktoken p50k_base near the budget boundary;
    tiktoken is unavailable in this environment, so the estimate is the
    contract (documented deviation)."""
    return n_bytes // 4


def apply_limits(
    hits: list[SearchHit],
    docs_by_id: dict[int, "Doc"],
    max_results: int | None,
    max_bytes: int | None,
    max_tokens: int | None,
) -> list[SearchHit]:
    """Running-total limiting in result order (search_limiter.rs:22-226)."""
    if max_results is None and max_bytes is None and max_tokens is None:
        return hits
    out: list[SearchHit] = []
    total_bytes = 0
    total_tokens = 0
    for h in hits:
        if max_results is not None and len(out) >= max_results:
            break
        size = len(docs_by_id[h.doc_id].content.encode("utf-8", "surrogatepass"))
        if max_bytes is not None and total_bytes + size > max_bytes and out:
            break
        toks = estimate_tokens(size)
        if max_tokens is not None and total_tokens + toks > max_tokens and out:
            break
        total_bytes += size
        total_tokens += toks
        out.append(h)
    return out


@dataclass
class BlockHit:
    doc_id: int
    repo: str
    path: str
    start: int
    end: int
    node_type: str
    rank: int | None
    score: float
    bm25_score: float
    matched_keywords: list[str] = field(default_factory=list)
    matched_lines: list[int] = field(default_factory=list)
    code: str = ""

    @property
    def file(self) -> str:
        return f"{self.repo}/{self.path}"


def _early_order(
    docs: list[Doc],
    queries: list[str],
    max_results: int | None,
    max_bytes: int | None,
    max_tokens: int | None,
    seen: set[str] | None,
    seen_blocks: dict[str, list[tuple[int, int]]] | None,
):
    """Early-ranked doc order + processing estimate (early_ranker.rs:22-77,
    index-adapted; see blocks.py). Presence stats come from the
    UNSPECIALIZED token sets of content and path — exactly the engine's
    posting nibbles — and the scoring is the shared
    blocks.early_rank_scores, so engine and oracle order identically.
    Returns (ordered doc ids, estimated_files_needed) or None when early
    termination must fall back to full extraction (no limits, unrankable
    query, or fewer keyword-matched docs than the estimate needs)."""
    import numpy as np

    from probe_ray import blocks as blk

    limited = (
        max_results is not None or max_bytes is not None
        or max_tokens is not None
    )
    if not limited:
        return None
    try:
        r_ast, _ = qp.parse_query(" ".join(queries), False)
    except qp.ParseError:
        return None
    all_kw: set[str] = set()
    pos_kw: set[str] = set()
    for t in qp.walk_terms(r_ast):
        for kw in t.lowercase_keywords:
            all_kw.add(kw)
            if not t.excluded:
                pos_kw.add(kw)
    if not pos_kw or len(all_kw) > 256:
        return None
    ranking_terms = sorted(all_kw)
    ct_lists = [tok.tokenize(d.content) for d in docs]
    pt_lists = [tok.tokenize(d.path) for d in docs]
    ct_sets = [frozenset(x) for x in ct_lists]
    pt_sets = [frozenset(x) for x in pt_lists]
    stats: dict[str, tuple] = {}
    for kw in ranking_terms:
        ids: list[int] = []
        ctf: list[int] = []
        ptf: list[int] = []
        for d, cs, ps in zip(docs, ct_sets, pt_sets):
            c = 1 if kw in cs else 0
            p = 1 if kw in ps else 0
            if c or p:
                ids.append(d.doc_id)
                ctf.append(c)
                ptf.append(p)
        stats[kw] = (
            np.array(ids, np.int64),
            np.array(ctf, np.int64),
            np.array(ptf, np.int64),
        )
    pos_sets = [stats[k][0] for k in sorted(pos_kw) if stats[k][0].size]
    if not pos_sets:
        return None
    eids = np.unique(np.concatenate(pos_sets))
    n_cached = len(seen or ()) + sum(
        len(v) for v in (seen_blocks or {}).values()
    )
    est = blk.estimate_files_needed(max_results, max_tokens) + n_cached
    if eids.size < est:
        return None
    dl_map = {
        d.doc_id: len(c) + len(p)
        for d, c, p in zip(docs, ct_lists, pt_lists)
    }
    dls = np.array([dl_map[int(i)] for i in eids], np.float64)
    score = blk.early_rank_scores(
        eids, dls, [stats[k] for k in ranking_terms], len(queries)
    )
    return eids[np.lexsort((eids, -score))], est


def oracle_search_blocks(
    docs: list[Doc],
    queries: list[str],
    exact: bool = False,
    max_results: int | None = None,
    max_bytes: int | None = None,
    max_tokens: int | None = None,
    language: str | None = None,
    include_filenames: bool = True,
    allow_tests: bool = True,
    seen: set[str] | None = None,
    seen_blocks: dict[str, list[tuple[int, int]]] | None = None,
    no_merge: bool = False,
    merge_threshold: int | None = None,
    early_termination: bool = False,
) -> list[BlockHit]:
    """Block-granularity oracle: the reference's ACTUAL output unit.

    Pipeline (search_runner.rs:900-1595 + file_processing.rs fallback path —
    this corpus is unsupported-language, so the fallback extractor IS the
    extractor):

    1. line-level term matches from generated literal patterns
       (blocks.term_patterns / line_term_matches; query.rs:415-646),
       filename matches mark ALL lines (search_runner.rs:592-614);
    2. early file filter: evaluate(matched terms, ignore_negatives=True)
       (search_runner.rs:637-686);
    3. fallback context extraction per file (blocks.extract_fallback_blocks;
       file_processing.rs:473-1048);
    4. block ranking: candidate-set BM25 over block token vectors
       (result_ranking.rs:118-333) with per-block coverage + node-type
       boosts; positional-overwrite quirk for score-vetoed blocks
       (result_ranking.rs:337-358);
    5. secondary sort (rank, then (file, start)) (search_runner.rs:1334-1359);
    6. apply_limits over block code bytes with the estimated-results
       iteration cap (search_limiter.rs:22-226);
    7. contained-block dedup (block_merging.rs:17-118);
    8. adjacent merge, threshold 5, unless no_merge (block_merging.rs:131-360).

    Deviations (documented): candidate order is canonical (doc_id, start)
    — the reference's is rayon-scheduling-dependent; sessions stay at
    document granularity (cache.rs stores block keys). Universal
    (filter-only) plans match every non-empty line via the "." pattern
    (search_runner.rs:402-411), producing near-whole-file merged windows.
    """
    from probe_ray import blocks as blk

    plan, filters = qp.plan_query(queries, exact)
    specials = plan.specials
    ast_all_exact = qp.is_exact_search(plan.ast)
    filenames_enabled = include_filenames and not exact and not ast_all_exact
    term_indices = plan.term_indices
    patterns = blk.term_patterns(plan)

    lang_exts = None
    if language:
        lang_exts = qp._LANG_EXTENSIONS.get(qp.normalize_language(language))

    def path_admitted(doc: Doc) -> bool:
        if not allow_tests:
            from probe_ray.tools import is_test_file

            if is_test_file(doc.path, doc.content):
                return False
        if lang_exts is not None:
            ext = doc.path.rsplit(".", 1)[-1].lower() if "." in doc.path else None
            if ext is None or ext not in lang_exts:
                return False
        return filters.matches_path(doc.path)

    # --- per-doc block extraction in canonical (doc_id, window) order ---
    candidates: list[tuple[Doc, dict]] = []

    def process_doc(doc: Doc) -> None:
        if not path_admitted(doc):
            return
        lines = doc.content.split("\n")
        term_map = blk.line_term_matches(lines, patterns)
        if plan.is_universal:
            # filter-only query: the "." pattern matches every non-empty
            # line (search_runner.rs:402-411 universal plan)
            term_map = blk.universal_term_matches(lines)
        if filenames_enabled:
            fn_terms = filename_match_terms(doc.path, term_indices, specials)
            if fn_terms:
                all_ln = set(range(1, len(lines) + 1))
                for t in fn_terms:
                    term_map.setdefault(term_indices[t], set()).update(all_ln)
        if not term_map:
            return
        if not qp.evaluate(plan.ast, set(term_map), term_indices, True):
            return  # early file filter (ignore negatives)
        if seen and doc.file in seen:
            return  # session anti-join at document granularity
        cached_ranges = (seen_blocks or {}).get(doc.file, [])
        if cached_ranges:
            # block-granularity session: lines inside previously returned
            # blocks are removed pre-extraction (cache.rs:418-505)
            term_map = blk.remove_cached_lines(term_map, cached_ranges)
            if not term_map:
                return
        for b in blk.extract_blocks(
            lines, doc.path, term_map, plan, specials,
            allow_tests=allow_tests, exact=exact,
        ):
            if (b["start"], b["end"]) in cached_ranges:
                continue  # exact-id post-filter (cache.rs:318-360)
            b["doc_id"] = doc.doc_id
            b["repo"] = doc.repo
            b["file"] = doc.file
            candidates.append((doc, b))

    early_order = (
        _early_order(docs, queries, max_results, max_bytes, max_tokens,
                     seen, seen_blocks)
        if early_termination and not (exact or ast_all_exact)
        and not plan.is_universal
        else None
    )
    if early_order is not None:
        # search_runner.rs:892-1208: early-ranked batch processing with the
        # estimate / 2x-max_results stop rules (mirrors
        # Engine._early_terminated_extract bit-for-bit: same shared scoring,
        # same batch boundaries, same counts)
        import numpy as np

        ordered, est = early_order
        by_id = {d.doc_id: d for d in docs}
        eff = min(blk.EARLY_BATCH_SIZE, est)
        processed = 0
        for start in range(0, int(ordered.size), eff):
            chunk = np.sort(ordered[start : start + eff])
            for i in chunk:
                d = by_id.get(int(i))
                if d is not None:
                    process_doc(d)
            processed += int(chunk.size)
            if processed >= est:
                break
            if max_results is not None and len(candidates) > 2 * max_results:
                break
        # canonical candidate order, as the engine sorts its feats
        candidates.sort(key=lambda p: (p[0].doc_id, p[1]["start"]))
    else:
        for doc in docs:
            process_doc(doc)

    def to_hit(doc: Doc, b: dict, rank, score, bm25) -> BlockHit:
        return BlockHit(
            doc_id=doc.doc_id, repo=doc.repo, path=doc.path,
            start=b["start"], end=b["end"], node_type=b["node_type"],
            rank=rank, score=score, bm25_score=bm25,
            matched_keywords=list(b["matched_keywords"]),
            matched_lines=list(b["matched_lines"]), code=b["code"],
        )

    if exact or ast_all_exact:
        hits = [to_hit(d, b, None, 0.0, 0.0) for d, b in candidates]
        hits.sort(key=lambda h: (h.file, h.start))
    else:
        try:
            ranking_ast, _ = qp.parse_query(" ".join(queries), False)
        except qp.ParseError:
            ranking_ast = None
        n = len(candidates)
        hits_ranked: list[BlockHit] = []
        flagged: list[BlockHit] = []
        if ranking_ast is not None and n > 0:
            query_terms = {
                kw for t in qp.walk_terms(ranking_ast) for kw in t.lowercase_keywords
            }
            if len(query_terms) > MAX_QUERY_TERMS:
                ranked = []
            else:
                vectors = [b["tokenized"] for _, b in candidates]
                dls = [len(v) for v in vectors]
                avgdl = sum(dls) / n if n else 0.0
                vec_sets = [set(v) for v in vectors]
                dfs = {t: sum(1 for s in vec_sets if t in s) for t in query_terms}
                idfs = {t: idf(n, df) for t, df in dfs.items() if df > 0}
                tfs = []
                for v in vectors:
                    tf: dict[str, int] = {}
                    for token in v:
                        if token in query_terms:
                            tf[token] = tf.get(token, 0) + 1
                    tfs.append(tf)
                scored = [
                    (i, score_expr(ranking_ast, tfs[i], dls[i], avgdl, idfs))
                    for i in range(n)
                ]
                ranked = [(i, s) for i, s in scored if s is not None]
                ranked.sort(key=lambda p: (-p[1], p[0]))
            boosted_list = []
            for pos, (i, bm25) in enumerate(ranked):
                _, b = candidates[i]
                boosted = (
                    bm25
                    * coverage_boost(b["but"], len(queries))
                    * blk.node_type_boost(b["node_type"], b["start"], b["end"])
                )
                boosted_list.append((pos, i, bm25, boosted))
            boosted_list.sort(key=lambda x: (-x[3], x[0]))
            for rank0, (_, i, bm25, boosted) in enumerate(boosted_list):
                d, b = candidates[i]
                hits_ranked.append(to_hit(d, b, rank0 + 1, boosted, bm25))
            k = len(hits_ranked)
            for d, b in candidates[k:]:
                flagged.append(to_hit(d, b, None, 0.0, 0.0))
            flagged.sort(key=lambda h: (h.file, h.start))
        hits = hits_ranked + flagged

    # --- limits over block code bytes (search_limiter.rs:22-226) ---
    if max_results is not None or max_bytes is not None or max_tokens is not None:
        max_iter = min(max_results if max_results is not None else 1000, len(hits))
        out: list[BlockHit] = []
        total_bytes = 0
        total_tokens = 0
        for idx, h in enumerate(hits):
            if idx >= max_iter:
                break
            size = len(h.code.encode("utf-8", "surrogatepass"))
            if max_results is not None and len(out) >= max_results:
                break
            if max_bytes is not None and total_bytes + size > max_bytes and out:
                break
            toks = estimate_tokens(size)
            if max_tokens is not None and total_tokens + toks > max_tokens and out:
                break
            total_bytes += size
            total_tokens += toks
            out.append(h)
        hits = out

    # --- contained dedup + adjacent merge over dict rows ---
    rows = [
        dict(
            doc_id=h.doc_id, repo=h.repo, path=h.path, file=h.file,
            start=h.start, end=h.end, node_type=h.node_type, rank=h.rank,
            score=h.score, bm25_score=h.bm25_score,
            matched_keywords=h.matched_keywords, matched_lines=h.matched_lines,
            code=h.code, but=None, total=None,
        )
        for h in hits
    ]
    from probe_ray import blocks as _b

    rows = _b.dedupe_contained_blocks(rows)
    if not no_merge:
        file_lines = {
            d.file: d.content.split("\n")
            for d in docs
            if d.file in {r["file"] for r in rows}
        }
        rows = _b.merge_ranked_blocks(
            rows, merge_threshold or _b.MERGE_THRESHOLD_DEFAULT, file_lines
        )
    return [
        BlockHit(
            doc_id=r["doc_id"], repo=r["repo"], path=r["path"], start=r["start"],
            end=r["end"], node_type=r["node_type"], rank=r["rank"],
            score=r["score"], bm25_score=r["bm25_score"],
            matched_keywords=list(r["matched_keywords"]),
            matched_lines=list(r["matched_lines"]), code=r["code"],
        )
        for r in rows
    ]


def oracle_search_docs(
    docs: list[Doc],
    queries: list[str],
    exact: bool = False,
    max_results: int | None = None,
    max_bytes: int | None = None,
    max_tokens: int | None = None,
    language: str | None = None,
    include_filenames: bool = True,
    files_only: bool = False,
    seen: set[str] | None = None,
    allow_tests: bool = True,
) -> list[SearchHit]:
    plan, filters = qp.plan_query(queries, exact)
    specials = plan.specials
    ast_all_exact = (not plan.is_universal) and qp.is_exact_search(plan.ast)
    filenames_enabled = include_filenames and not exact and not ast_all_exact

    # --- path-level filtering (filters.rs; language param like --language) ---
    lang_exts = None
    if language:
        lang_exts = qp._LANG_EXTENSIONS.get(qp.normalize_language(language))

    def path_admitted(doc: Doc) -> bool:
        if not allow_tests:
            from probe_ray.tools import is_test_file

            if is_test_file(doc.path, doc.content):
                return False
        if lang_exts is not None:
            ext = doc.path.rsplit(".", 1)[-1].lower() if "." in doc.path else None
            if ext is None or ext not in lang_exts:
                return False
        return filters.matches_path(doc.path)

    term_indices = plan.term_indices
    docs_by_id = {d.doc_id: d for d in docs}

    # --- candidate matching ---
    candidates: list[tuple[Doc, list[str], set[int]]] = []
    early_files: list[Doc] = []  # ignore-negatives admission (files_only)
    for doc in docs:  # doc_id ascending == deterministic candidate order
        if not path_admitted(doc):
            continue
        if plan.is_universal:
            vector = doc_token_vector(doc, term_indices, specials)
            early_files.append(doc)
            if seen and doc.file in seen:
                continue
            candidates.append((doc, vector, set()))
            continue
        vector = doc_token_vector(doc, term_indices, specials)
        vec_set = set(vector)
        matched_names = {t for t in term_indices if t in vec_set}
        if filenames_enabled:
            matched_names |= filename_match_terms(doc.path, term_indices, specials)
        if not matched_names:
            continue
        matched_idx = {term_indices[t] for t in matched_names}
        if qp.evaluate(plan.ast, matched_idx, term_indices, True):
            early_files.append(doc)  # search_runner.rs:637-686
        if seen and doc.file in seen:
            continue  # session anti-join (search_runner.rs:746-799)
        if qp.evaluate(plan.ast, matched_idx, term_indices, False):
            candidates.append((doc, vector, matched_idx))

    # --- files_only short-circuit (search_runner.rs:699-744) ---
    if files_only:
        hits = [
            SearchHit(d.doc_id, d.repo, d.path, None, 0.0, 0.0, [])
            for d in early_files
        ]
        hits.sort(key=lambda h: f"{h.repo}/{h.path}")
        return apply_limits(hits, docs_by_id, max_results, max_bytes, max_tokens)

    # --- exact (no ranking): sort by (file, start_line) — search_runner:1357-1359
    if exact or ast_all_exact:
        hits = [
            SearchHit(
                d.doc_id, d.repo, d.path, None, 0.0, 0.0,
                sorted(t for t in term_indices if term_indices[t] in m),
            )
            for d, v, m in candidates
        ]
        hits.sort(key=lambda h: (f"{h.repo}/{h.path}", 1))
        return apply_limits(hits, docs_by_id, max_results, max_bytes, max_tokens)

    # --- ranking ---
    ranking_query = " ".join(queries)
    try:
        ranking_ast, _ = qp.parse_query(ranking_query, False)
    except qp.ParseError:
        ranking_ast = None

    n = len(candidates)
    hits_ranked: list[SearchHit] = []
    flagged: list[SearchHit] = []
    if ranking_ast is not None and n > 0:
        query_terms = {
            kw for t in qp.walk_terms(ranking_ast) for kw in t.lowercase_keywords
        }
        if len(query_terms) > 256:
            ranked = []  # ranking.rs:164-167: too many terms -> empty ranking
        else:
            dls = [len(v) for _, v, _ in candidates]
            avgdl = sum(dls) / n if n else 0.0
            vec_sets = [set(v) for _, v, _ in candidates]
            dfs = {t: sum(1 for s in vec_sets if t in s) for t in query_terms}
            idfs = {t: idf(n, df) for t, df in dfs.items() if df > 0}
            tfs = []
            for _, v, _ in candidates:
                tf: dict[str, int] = {}
                for token in v:
                    if token in query_terms:
                        tf[token] = tf.get(token, 0) + 1
                tfs.append(tf)
            scored = [
                (i, score_expr(ranking_ast, tfs[i], dls[i], avgdl, idfs))
                for i in range(n)
            ]
            ranked = [(i, s) for i, s in scored if s is not None]
            ranked.sort(key=lambda p: (-p[1], p[0]))

        # boosts + stable re-sort by boosted score (result_ranking.rs:284-333)
        boosted_list = []
        unique_query_terms = set(term_indices)
        for pos, (i, bm25) in enumerate(ranked):
            doc, vector, matched_idx = candidates[i]
            vec_set = set(vector)
            direct = {q for q in unique_query_terms if q in vec_set}
            compound = set()
            for q in unique_query_terms - direct:
                parts = tok.split_compound_word_for_filtering(q, specials)
                if len(parts) > 1 and all(p in vec_set for p in parts):
                    compound.add(q)
            but = len(direct) + len(compound)
            boosted = bm25 * coverage_boost(but, len(queries)) * 1.0
            boosted_list.append((pos, i, bm25, boosted, sorted(direct | compound)))
        boosted_list.sort(key=lambda x: (-x[3], x[0]))  # stable: pre-order pos
        for rank0, (_, i, bm25, boosted, kws) in enumerate(boosted_list):
            doc = candidates[i][0]
            hits_ranked.append(
                SearchHit(doc.doc_id, doc.repo, doc.path, rank0 + 1, boosted, bm25, kws)
            )
        # positional-overwrite quirk (result_ranking.rs:337-358): trailing
        # original candidates become flagged rank=None entries
        k = len(hits_ranked)
        for doc, vector, matched_idx in candidates[k:]:
            flagged.append(
                SearchHit(
                    doc.doc_id, doc.repo, doc.path, None, 0.0, 0.0,
                    sorted(t for t in term_indices if term_indices[t] in matched_idx),
                )
            )
        flagged.sort(key=lambda h: (f"{h.repo}/{h.path}", 1))

    hits = hits_ranked + flagged
    hits = apply_limits(hits, docs_by_id, max_results, max_bytes, max_tokens)

    # contained-block dedup (block_merging.rs:17-118): whole-file blocks —
    # drop later duplicates of the same (repo, path); keep best-ranked entry.
    seen: dict[str, int] = {}
    deduped: list[SearchHit] = []
    for h in hits:
        key = f"{h.repo}/{h.path}"
        if key in seen:
            prev = deduped[seen[key]]
            merged = sorted(set(prev.matched_terms) | set(h.matched_terms))
            prev.matched_terms = merged
            continue
        seen[key] = len(deduped)
        deduped.append(h)
    return deduped
