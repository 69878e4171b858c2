"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in probe_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline at sf0.001 — build the probe-semantics
  inverted index over a corpus derived from the documents table, run a BM25
  search, return the result table.
- ``queries()``: one entry per implemented operator (SURVEY.md §2/§3 +
  training-data ops); each callable takes sf_dir.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible op —
  including full replays of the minhash+LSH clustering, simhash and
  winnowing sketches (md5-bit / mod-2^64 / rolling-hash arithmetic
  reproduced in SQL). Probe-tokenizer ops (camelCase splitting, stemming,
  the engine's ranked search) and the random-plane/approx ANN entries get
  rows-only checks here and are instead verified rank-identically (or
  recall-gated) against the in-repo oracle by ``python -m pytest tests/``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

SIMPLE_TOKENS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)

# simple tokens of the GUARDED text (file_guard.rs: >500-char lines are
# blanked before tokenization) — used by the probe_search set oracles
_GUARD_TOKENS_SQL = (
    "list_filter(string_split_regex(lower(array_to_string("
    "list_filter(string_split(text, chr(10)), l -> len(l) <= 500), ' ')), "
    "'[^a-z0-9]+'), x -> x <> '')"
)


# ---------------------------------------------------------------------------
# documents -> probe corpus mapping + cached index per sf_dir
# ---------------------------------------------------------------------------

def _corpus_from_documents(sf_dir: str) -> str:
    """Materialize the documents table in the engine's corpus schema
    (repo, path, commit, lang, content)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # cache key includes the SOURCE file's size+mtime so regenerated input
    # data invalidates the cached corpus (and, via the same tag, the index)
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{sf_dir}:{st.st_size}:{int(st.st_mtime)}".encode()
    ).hexdigest()[:10]
    out = f"/tmp/probe_ray_corpus_{tag}.parquet"
    if os.path.exists(out):
        return out
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    n = t.num_rows
    doc_ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    corpus = pa.table(
        {
            "repo": pa.array([f"corpus/{s}" for s in sources], pa.string()),
            "path": pa.array(
                [f"docs/doc{d:07d}.txt" for d in doc_ids], pa.string()
            ),
            "commit": pa.array(["0" * 40] * n, pa.string()),
            "lang": t.column("lang"),
            "content": t.column("text"),
        }
    )
    pq.write_table(corpus, out + ".tmp")
    os.rename(out + ".tmp", out)
    return out


def _engine_for(sf_dir: str):
    from probe_ray.build import build_index
    from probe_ray.search import Engine

    corpus = _corpus_from_documents(sf_dir)
    # index dir keyed on the corpus cache tag -> regenerated inputs rebuild
    tag = os.path.basename(corpus).replace("probe_ray_corpus_", "").replace(
        ".parquet", ""
    )
    paths = build_index(corpus, f"/tmp/probe_ray_index_{tag}", ngram_index=True)
    return Engine(paths)


def entry() -> Any:
    eng = _engine_for("/root/testdata/sf0.001")
    return eng.search(["spark join"], max_results=100)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from probe_ray import textops as T

    def probe_search(query, **opts):
        def run(sf_dir):
            return _engine_for(sf_dir).search([query], **opts)

        return run

    def probe_search_ids(query, **opts):
        """SQL-checkable projection of an engine search: the (repo, path)
        RESULT SET. Scores/ranks are probe-tokenizer BM25 (verified
        rank-identically vs the in-repo oracle in tests/); the SET itself is
        ANSI-SQL-expressible on this table family (all-lowercase exact-form
        vocabulary, so probe token admission == simple-token equality once
        the file-guard line-blanking rule is encoded in the SQL)."""

        def run(sf_dir):
            import pyarrow as pa

            tbl = _engine_for(sf_dir).search([query], **opts)
            out = tbl.select(["repo", "path"])
            return out.sort_by([("repo", "ascending"), ("path", "ascending")])

        return run

    def probe_search_global(query, **opts):
        def run(sf_dir):
            return _engine_for(sf_dir).search([query], mode="global", **opts)

        return run

    def probe_search_blocks(query, *, forced_distributed=False, **opts):
        def run(sf_dir):
            eng = _engine_for(sf_dir)
            if forced_distributed:
                # the 100x-scale branches: distributed extraction + the
                # distributed ranking finish (no driver feats concat)
                eng.LOCAL_DOCS_MAX = 0
                eng.LOCAL_CAND_MAX = 0
                eng.LOCAL_VECTOR_CAND_MAX = 0
                eng.LOCAL_BLOCK_CAND_MAX = 0
                eng.LOCAL_BLOCK_FEATS_MAX = 0
            tbl = eng.search_blocks([query], **opts)
            # drop the code text for the correctness harness (hash stability
            # over narrow columns; the code column is exercised in pytest)
            return tbl.drop_columns(["code"])

        return run

    return {
        # --- text statistics / analysis (SQL-checked) ---
        "doc_stats": T.doc_stats,
        "term_df": T.term_df,
        "tfidf_topk": T.tfidf_topk,
        "heavy_hitter_terms": T.heavy_hitter_terms,      # MG sketch, exact 2nd pass
        "distinct_users_per_type": T.distinct_users_per_type,
        "hll_distinct_users": T.hll_distinct_users,      # rows-only (sketch)
        "corpus_stats": T.corpus_stats,
        "token_count_bpe": T.token_count_bpe,
        "quality_score": T.quality_score,
        "ngram_repetition": T.ngram_repetition,
        "dup_ngram_fraction": T.dup_ngram_fraction,
        "benchmark_contamination": T.benchmark_contamination,
        "hashed_bow": T.hashed_bow,
        "token_chunks": T.token_chunks,
        "seeded_shuffle": T.seeded_shuffle,
        "sequence_pack": T.sequence_pack,
        "props_json_stats": T.props_json_stats,
        "lang_distribution": T.lang_distribution,
        "grep_count": T.grep_count,
        "structural_matches": T.structural_matches,
        "source_stats": T.source_stats,
        "top_docs_per_source": T.top_docs_per_source,
        "event_value_percentiles": T.event_value_percentiles,
        "pricing_summary": T.pricing_summary,
        "top_customers_by_orders": T.top_customers_by_orders,
        # --- streaming-shaped windows over events (SQL-checked) ---
        "events_tumbling_hourly": T.events_tumbling_hourly,
        "events_sliding_hourly": T.events_sliding_hourly,
        "events_sessionize": T.events_sessionize,
        "events_tumbling_watermark": T.events_tumbling_watermark,
        # --- boolean retrieval + BM25 over documents (SQL-checked) ---
        "search_and": T.search_and,
        "search_or": T.search_or,
        "search_not": T.search_not,
        "bm25_topk": T.bm25_topk,
        # --- deduplication ---
        "exact_dedup": T.exact_dedup,                  # SQL-checked
        "corpus_clean": T.corpus_clean,                # SQL-checked
        "near_dup_word_jaccard": T.near_dup_word_jaccard,  # SQL-checked
        "dedup_clusters": T.dedup_clusters,            # SQL-checked
        "stratified_sample": T.stratified_sample,      # SQL-checked
        "temperature_sample": T.temperature_sample,    # SQL-checked
        "filter_report": T.filter_report,              # SQL-checked
        # --- cleaning / privacy / normalization (all SQL-checked) ---
        "pii_redact": T.pii_redact,
        "c4_line_filter": T.c4_line_filter,
        "unicode_normalize": T.unicode_normalize,
        "doc_fingerprint": T.doc_fingerprint,          # SQL-checked
        "minhash_lsh_dedup": T.minhash_lsh_dedup,      # SQL-checked
        "simhash64": T.simhash64,                      # SQL-checked
        "simhash_near_dup": T.simhash_near_dup,        # SQL-checked (banded Hamming)
        "winnowing_fingerprints": T.winnowing_fingerprints,  # SQL-checked
        # --- similarity search over embeddings ---
        "knn_cosine": T.knn_cosine,                    # SQL-checked
        "knn_cosine_batch": T.knn_cosine_batch,        # SQL-checked
        "knn_lsh": T.knn_lsh,                          # rows-only (approx)
        "knn_ivf": T.knn_ivf,                          # rows-only (approx)
        "ivf_assignments": T.ivf_assignments,          # SQL-checked (k-means replay)
        "embedding_cosine_dedup": T.embedding_cosine_dedup,  # SQL-checked (LSH replay)
        "embedding_cosine_window_pairs": T.embedding_cosine_window_pairs,  # SQL-checked
        # --- language id (stopword vote SQL-checked; bigram heuristic
        #     rows-only) ---
        "langid_stopwords": T.langid_stopwords,
        "langid_heuristic": T.langid_heuristic,
        # --- multimodal plumbing (sha/bytes SQL-checked) ---
        "media_features": lambda sf: T.media_features(sf).map_batches(
            lambda b: b.select(["doc_id", "n_bytes", "sha256"]),
            batch_format="pyarrow",
        ),
        # --- the probe-semantics engine itself. The boolean/exact entries
        #     return their (repo, path) RESULT SET, which IS SQL-checkable
        #     (guard-aware oracles below); ranks/scores are verified
        #     rank-identically vs the in-repo oracle in tests/. The
        #     limited/blocks/global entries stay rows-only (ranked outputs).
        "probe_search_or": probe_search_ids("spark OR vector"),
        "probe_search_and": probe_search_ids("spark AND join"),
        "probe_search_required": probe_search_ids("+spark window"),
        "probe_search_exclusion": probe_search_ids("spark -window"),
        "probe_search_exact": probe_search_ids('"batch"'),
        "probe_search_files_only": probe_search_ids(
            "spark -window", files_only=True
        ),
        "probe_search_limited": probe_search("spark OR vector", max_results=20,
                                             max_bytes=200_000),
        "probe_search_blocks": probe_search_blocks("spark join"),
        "probe_search_blocks_topk": probe_search_blocks("spark OR vector",
                                                        max_results=25),
        "probe_search_blocks_distributed": probe_search_blocks(
            "spark OR vector", max_results=25, forced_distributed=True),
        "probe_search_blocks_global": probe_search_blocks(
            "spark OR vector", max_results=25, mode="global"),
        "probe_search_blocks_early": probe_search_blocks(
            "spark OR vector", max_results=25, early_termination=True),
        "probe_search_blocks_ast": _probe_search_blocks_ast,
        # probe symbols over an 18-language fixture corpus (M12 surface;
        # rows-only: stack-based parent tracking is stateful per file)
        "probe_symbols": _probe_symbols,
        "probe_search_global_topk": probe_search_global("spark join", max_results=50),
        # cross-encoder rerank of the admitted top-k (T4 surface; the
        # deterministic lexical-proxy scorer stands in for the env-stubbed
        # model forward pass — rows-only: ranked output)
        "probe_search_reranked": probe_search(
            "spark OR vector", max_results=20,
            reranker="ms-marco-tinybert", question="vector index scan"),
        # --- input-source layer (file references from free text —
        #     src/extract/file_paths.rs; SQL-checked) ---
        "extract_from_text_refs": _extract_from_text_refs,
    }


def _probe_search_blocks_ast(sf_dir: str):
    """Block search over the deterministic synthetic CODE corpus
    (probe_ray.corpus.generate_rows — rust/go/python/js/ts sources),
    exercising the language-aware AST block extractor (M8,
    probe_ray/structparse.py): results are function/struct/class/statement
    spans with tree-sitter kind names, comment runs merged into their
    context construct (parser.rs:898-1260 semantics). rows-only by design
    (ranked block output); rank identity vs the in-repo oracle is pinned
    in tests/test_blocks.py and span goldens in tests/test_structparse.py.
    The sf_dir argument is unused: the corpus is seed-fixed, synthesized at
    small scale per the task brief (no external data)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from probe_ray.build import build_index
    from probe_ray.corpus import generate_rows
    from probe_ray.search import Engine

    out = "/tmp/probe_ray_ast_corpus_t1.parquet"
    if not os.path.exists(out):
        tmp = f"{out}.tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pylist(generate_rows("t1")), tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            os.unlink(tmp)
    eng = Engine(build_index(out, "/tmp/probe_ray_ast_index_t1"))
    tbl = eng.search_blocks(["keywordAlpha OR keywordBeta"])
    return tbl.drop_columns(["code"])


def _probe_symbols(sf_dir: str):
    """probe symbols (M12, src/extract/symbols.rs) over a deterministic
    fixture corpus covering all 18 recognizer languages (every factory.rs
    route except tsx, which shares typescript's recognizer): per-file
    symbol tables with kind/name/parent-path/signature/params, sorted for
    a stable rows-only check. The sf_dir argument is unused: the corpus is
    fixed per the task brief (no external data); golden (kind, name,
    parent, params) rows are pinned in tests/test_tools.py."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    fixtures = {
        "a.rs": ("rust", "pub struct P { x: f64 }\nimpl P {\n"
                 "    pub fn norm(&self) -> f64 { self.x }\n}\n"),
        "a.py": ("python", "class C:\n    def add(self, x):\n"
                 "        return x\ndef helper(a):\n    return a\n"),
        "a.go": ("go", "type C struct{}\nfunc (c *C) Add(x int) int {\n"
                 "    return x\n}\nfunc New() *C { return &C{} }\n"),
        "a.js": ("javascript", "class C {\n    add(x) { return x; }\n}\n"
                 "function helper(a) { return a; }\n"),
        "a.ts": ("typescript", "export interface Ops { run(): void; }\n"
                 "type Pair = [number, number];\n"),
        "A.java": ("java", "public class A {\n"
                   "    public int add(int x) { return x; }\n}\n"),
        "a.c": ("c", "struct node { int v; };\n"
                "static int add(int x) {\n    return x;\n}\n"),
        "a.cpp": ("cpp", "namespace n {\nclass C {\n};\n"
                  "double C::f(double x) {\n    return x;\n}\n}\n"),
        "A.cs": ("csharp", "namespace N {\n    public class A {\n"
                 "        public int Add(int x) { return x; }\n    }\n}\n"),
        "a.rb": ("ruby", "module M\n  class C\n    def add(x)\n"
                 "      x\n    end\n  end\nend\n"),
        "a.php": ("php", "<?php\nclass C {\n"
                  "    public function add($x) { return $x; }\n}\n"
                  "function helper($a) { return $a; }\n"),
        "a.swift": ("swift", "struct P {\n    func norm() -> Double {\n"
                    "        return 0\n    }\n}\n"),
        "a.md": ("markdown", "# Title\ntext\n## Usage\nmore\n"),
        "a.yaml": ("yaml", "server:\n  host: localhost\nlogging:\n"
                   "  level: info\n"),
        "a.sol": ("solidity", "contract T {\n"
                  "    event Moved(address a);\n"
                  "    function go(address a) public {\n    }\n}\n"),
        "a.cr": ("crystal", "module M\n  class C\n    def add(x)\n"
                 "      x\n    end\n  end\nend\n"),
        "a.hs": ("haskell", "data Shape = Circle Double\n"
                 "addOne :: Int -> Int\naddOne x = x + 1\n"),
        "a.html": ("html", "<html>\n<body>\n  <section>\n    <p>t</p>\n"
                   "  </section>\n</body>\n</html>\n"),
    }
    docs = rd.from_arrow(pa.table({
        "repo": ["fixture"] * len(fixtures),
        "path": list(fixtures),
        "lang": [l for l, _ in fixtures.values()],
        "content": [c for _, c in fixtures.values()],
    }))
    return symbols(docs).sort(["path", "line_no", "kind", "name"])


def _extract_from_text_refs(sf_dir: str):
    """probe extract with stdin text: parse file references out of free
    text and resolve them against the corpus in one broadcast pass
    (inputs.extract_from_text). Exercises the range, whole-file, and
    bare-basename reference forms over the documents-derived corpus."""
    import ray.data as rd

    from probe_ray import inputs

    docs = rd.read_parquet(
        _corpus_from_documents(sf_dir),
        columns=["repo", "path", "lang", "content"],
    )
    text = ("See docs/doc0000003.txt:1-1 and docs/doc0000007.txt; "
            "also the bare doc0000011.txt mention.")
    tbl = inputs.extract_from_text(docs, text)
    return tbl.select(
        ["repo", "path", "start_line", "end_line", "kind", "code"]
    )


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_SIMHASH_REPLAY_CTES = """
            -- 64-bit SimHash replay: per-token md5, the first 8 digest
            -- bytes little-endian (bit b = bit b%8 of hex pair b//8, via a
            -- 256-row hex LUT), tf-weighted signed bit sums, bits with
            -- acc > 0 set, then the engine's unconditional -2^63 shift
            -- into int64 (shared by the simhash64 and simhash_near_dup
            -- oracles)
            toks AS (
              SELECT doc_id, u.t AS t
              FROM documents,
                   unnest(list_filter(string_split_regex(lower(text),
                          '[^a-z0-9]+'), x -> x <> '')) AS u(t)
            ),
            counts AS (
              SELECT doc_id, t, count(*)::BIGINT AS c
              FROM toks GROUP BY doc_id, t
            ),
            hx AS (SELECT doc_id, c, md5(t) AS h FROM counts),
            lut AS (SELECT i, printf('%02x', i) AS hxp FROM range(256) tt(i)),
            bits AS (
              SELECT hx.doc_id, b.b AS bitpos,
                     SUM(CASE WHEN (lut.i >> CAST(b.b % 8 AS INTEGER)) & 1 = 1
                              THEN hx.c ELSE -hx.c END) AS acc
              FROM hx
              CROSS JOIN range(64) b(b)
              JOIN lut
                ON lut.hxp = substr(hx.h, CAST(2*(b.b // 8) + 1 AS INTEGER), 2)
              GROUP BY hx.doc_id, b.b
            ),
            sums AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                              THEN (1::HUGEINT << CAST(bitpos AS INTEGER))
                              ELSE 0::HUGEINT END) AS uns
              FROM bits GROUP BY doc_id
            ),
            simhashes AS (
              SELECT d.doc_id,
                     CAST(COALESCE(s.uns, 0::HUGEINT) - (1::HUGEINT << 63)
                          AS BIGINT) AS simhash
              FROM documents d LEFT JOIN sums s USING (doc_id)
            )"""


_EMB_DIM = 64  # embeddings.parquet schema constant (list<float>[64])


def _hyperplane_values_sql(n_planes: int, seed: int) -> str:
    """VALUES rows (pid, DOUBLE[] plane) for the seeded Gaussian
    hyperplanes — the exact arrays textops._lsh_planes produces (repr()
    round-trips float64 exactly, so engine and oracle share bit-identical
    planes)."""
    import numpy as np

    pl = np.random.default_rng(seed).standard_normal((n_planes, _EMB_DIM))
    rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in pl[i])}]::DOUBLE[])"
        for i in range(n_planes)
    )
    return rows


def _embedding_cosine_dedup_sql(
    n_tables: int = 8, planes_per_table: int = 4, threshold: float = 0.35,
) -> str:
    """Full SQL replay of embedding_cosine_dedup (the minhash-replay
    pattern for cosine LSH): seeded plane literals -> per-table 4-bit
    bucket signatures (strict dot > 0, bit j = plane 4t+j) -> 64-smallest-
    id bucket cap -> exact cosine verify -> cross-table DISTINCT. All dot
    products run in DOUBLE from the same float32 inputs as the engine
    (measured signature margin ~4e-4 >> the ~1e-13 summation-order
    noise)."""
    planes = _hyperplane_values_sql(n_tables * planes_per_table, seed=7)
    return f"""
        WITH planes(pid, p) AS (VALUES
          {planes}
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        bits AS (
          SELECT e.vec_id, p.pid,
                 CASE WHEN list_dot_product(e.emb, p.p) > 0
                      THEN 1 ELSE 0 END AS b
          FROM e CROSS JOIN planes p
        ),
        buckets AS (
          SELECT vec_id, pid // {planes_per_table} AS tbl,
                 sum(b * (1 << (pid % {planes_per_table})))::BIGINT AS bucket
          FROM bits GROUP BY vec_id, pid // {planes_per_table}
        ),
        members AS (
          SELECT * FROM (
            SELECT vec_id, tbl, bucket,
                   row_number() OVER (
                     PARTITION BY tbl, bucket ORDER BY vec_id
                   ) AS rn
            FROM buckets
          ) WHERE rn <= 64
        )
        SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM members a
        JOIN members b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND b.vec_id > a.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE list_cosine_similarity(ea.emb, eb.emb) >= {threshold}
        ORDER BY vec_id_a, vec_id_b
    """


def _ivf_assignments_sql(n_centroids: int = 16, iters: int = 8) -> str:
    """Full SQL replay of the IVF coarse quantizer (textops._ivf_store):
    unit-normalize the deterministic vec_id<4096 training sample, strided
    init (smat[::max(1, n//k)][:k]), ``iters`` UNROLLED Lloyd iterations
    (argmax ties to the smallest centroid id, empty/zero-sum clusters keep
    their previous centroid), then the final raw-dot argmax assignment of
    every vector (scale-invariant, so the engine's unit-normalize can be
    skipped). Element sums are spelled out per dimension — the embedding
    schema is a fixed 64-wide float list."""
    sum_list = ", ".join(f"sum(u[{j + 1}])" for j in range(_EMB_DIM))
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f"""
        a{i} AS (
          SELECT s.rid, s.u, c.cid,
                 row_number() OVER (
                   PARTITION BY s.rid
                   ORDER BY list_dot_product(s.u, c.c) DESC, c.cid
                 ) AS rnk
          FROM s CROSS JOIN {prev} c
        ),
        g{i} AS (
          SELECT cid, [{sum_list}]::DOUBLE[] AS v
          FROM a{i} WHERE rnk = 1 GROUP BY cid
        ),
        n{i} AS (
          SELECT cid,
                 CASE WHEN sqrt(list_dot_product(v, v)) > 0
                      THEN list_transform(
                        v, x -> x / sqrt(list_dot_product(v, v)))
                      ELSE NULL END AS c2
          FROM g{i}
        ),
        c{i} AS (
          SELECT p.cid, coalesce(n.c2, p.c) AS c
          FROM {prev} p LEFT JOIN n{i} n ON n.cid = p.cid
        )""")
        prev = f"c{i}"
    steps_sql = ",".join(steps)
    return f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        ),
        s AS (
          -- the train_sample smallest ids relative to the corpus minimum,
          -- ordered by vec_id — the engine's exact (file-order-free)
          -- sampling rule
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rid,
                 CASE WHEN sqrt(list_dot_product(emb, emb)) > 0
                      THEN list_transform(
                        emb, x -> x / sqrt(list_dot_product(emb, emb)))
                      ELSE emb END AS u
          FROM e
          WHERE vec_id < (SELECT min(vec_id) + 4096 FROM e)
        ),
        params AS (
          SELECT greatest(count(*) // {n_centroids}, 1) AS stride,
                 least({n_centroids}, count(*)) AS k
          FROM s
        ),
        c0 AS (
          SELECT (rid // stride)::BIGINT AS cid, u AS c
          FROM s, params
          WHERE rid % stride = 0 AND rid // stride < k
        ),{steps_sql}
        SELECT vec_id, cid::INTEGER AS centroid
        FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.emb, c.c) DESC, c.cid
                 ) AS rnk
          FROM e CROSS JOIN {prev} c
        ) WHERE rnk = 1
        ORDER BY vec_id
    """


def oracle_sql() -> dict[str, str]:
    toks = SIMPLE_TOKENS_SQL
    return {
        "source_stats": f"""
            WITH t AS (
              SELECT source, len({toks}) AS n FROM documents
            )
            SELECT source, count(*) AS n_docs, sum(n)::BIGINT AS total_tokens,
                   max(n) AS max_tokens,
                   sum(n)::DOUBLE / count(*) AS avg_tokens
            FROM t GROUP BY source ORDER BY source
        """,
        "top_docs_per_source": """
            WITH r AS (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id
                     ) AS rnk
              FROM documents
            )
            SELECT source, doc_id, n_chars, rnk FROM r
            WHERE rnk <= 3 ORDER BY source, rnk
        """,
        "event_value_percentiles": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90,
                   quantile_cont(value, 0.99) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity * 100) AS BIGINT))::BIGINT AS sum_qty_cents,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS sum_price_cents,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers_by_orders": """
            WITH t AS (
              SELECT o_custkey AS c_custkey,
                     count(*) AS n_orders,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
              FROM orders GROUP BY o_custkey
            )
            SELECT t.c_custkey, c.c_name, t.n_orders, t.total_cents
            FROM t JOIN customer c ON c.c_custkey = t.c_custkey
            ORDER BY t.total_cents DESC, t.c_custkey LIMIT 25
        """,
        "events_tumbling_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT AS value_sum_micros
            FROM events GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start
        """,
        "events_sliding_hourly": """
            WITH w AS (
              SELECT event_type, value,
                     unnest([
                       make_timestamp((floor(epoch(ts) / 1800))::BIGINT * 1800 * 1000000),
                       make_timestamp(((floor(epoch(ts) / 1800))::BIGINT * 1800 - 1800) * 1000000)
                     ]) AS window_start
              FROM events
            )
            SELECT event_type, window_start, count(*) AS n_events,
                   sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT AS value_sum_micros
            FROM w GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "events_tumbling_watermark": """
            WITH wm AS (
              SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events
            )
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   sum(CAST(round(value * 1000000) AS BIGINT))::BIGINT AS value_sum_micros
            FROM events, wm WHERE ts >= wm.w
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start
        """,
        "events_sessionize": """
            WITH ordered AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            ),
            flagged AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM ordered
            ),
            sessions AS (
              SELECT user_id, ts,
                     sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS session_id
              FROM flagged
            )
            SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM sessions GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "grep_count": r"""
            SELECT doc_id, len(regexp_extract_all(text, 'ba[a-z]+')) AS n_matches
            FROM documents
            WHERE len(regexp_extract_all(text, 'ba[a-z]+')) > 0
        """,
        "structural_matches": r"""
            SELECT doc_id,
                   unnest(regexp_extract_all(text, 'spark\s+([A-Za-z_][A-Za-z0-9_]*)', 1)) AS w
            FROM documents
            ORDER BY doc_id, w
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   len({toks}) AS n_tokens,
                   len(list_distinct({toks})) AS n_unique
            FROM documents
        """,
        "term_df": f"""
            WITH t AS (
              SELECT doc_id, unnest(list_distinct({toks})) AS term FROM documents
            )
            SELECT term, count(*) AS df FROM t
            GROUP BY term ORDER BY df DESC, term LIMIT 100
        """,
        "tfidf_topk": f"""
            WITH tok AS (
              SELECT doc_id, unnest({toks}) AS token FROM documents
            ),
            tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM tok GROUP BY doc_id, token
            ),
            dfx AS (
              SELECT token, count(DISTINCT doc_id)::BIGINT AS df
              FROM tok GROUP BY token
            ),
            n AS (SELECT count(*)::BIGINT AS n FROM documents),
            s AS (
              SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
                     CAST(tf.tf * (SELECT n FROM n) AS DOUBLE) / dfx.df AS score
              FROM tf JOIN dfx USING (token)
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, token
              ) AS rnk
              FROM s
            )
            SELECT doc_id, token, tf, df, score, rnk FROM r
            WHERE rnk <= 5 ORDER BY doc_id, rnk
        """,
        "heavy_hitter_terms": f"""
            WITH tok AS (SELECT unnest({toks}) AS token FROM documents),
            c AS (
              SELECT token AS term, count(*)::BIGINT AS occurrences
              FROM tok GROUP BY token
            )
            SELECT term, occurrences FROM c
            ORDER BY occurrences DESC, term LIMIT 20
        """,
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "corpus_stats": f"""
            WITH t AS (SELECT len({toks}) AS n FROM documents)
            SELECT count(*) AS n_docs,
                   sum(n)::BIGINT AS total_tokens,
                   sum(n)::DOUBLE / count(*) AS avg_tokens
            FROM t
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]')) AS bpe_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
            SELECT doc_id, len(toks) AS n_tokens,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE / len(toks)
                   END AS stopword_ratio,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)
                   END AS mean_token_len
            FROM t
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
        """,
        "langid_stopwords": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            c AS (
              SELECT doc_id,
                len(list_filter(tk, x -> x IN ('der','die','das','und','ist','von','mit','den','nicht','ein'))) AS c_de,
                len(list_filter(tk, x -> x IN ('the','and','of','to','in','is','that','it','for','with'))) AS c_en,
                len(list_filter(tk, x -> x IN ('el','los','las','que','y','en','un','para','con','por'))) AS c_es,
                len(list_filter(tk, x -> x IN ('le','la','les','des','et','une','que','pour','dans','est'))) AS c_fr
              FROM t
            )
            SELECT doc_id,
                   CASE
                     WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                     WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                     WHEN c_es >= c_fr THEN 'es'
                     ELSE 'fr'
                   END AS lang_guess,
                   greatest(c_de, c_en, c_es, c_fr) AS n_hits
            FROM c
        """,
        "ngram_repetition": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            g AS (
              SELECT doc_id,
                     list_transform(
                       range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                     ) AS grams
              FROM t WHERE len(tk) >= 3
            )
            SELECT doc_id,
                   len(grams) AS n_grams,
                   len(list_distinct(grams)) AS n_distinct,
                   1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
                     AS repetition_ratio
            FROM g
        """,
        # cross-document duplicate 8-gram fraction (Gopher rule): an
        # occurrence is "dup" when its gram appears in >= 2 distinct docs
        "dup_ngram_fraction": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(len(tk) - 6, 1)),
                       i -> array_to_string(tk[i:i+7], ' ')
                     )) AS gram
              FROM t WHERE len(tk) >= 8
            ),
            occ AS (
              SELECT doc_id, gram, count(*) AS occ
              FROM g GROUP BY doc_id, gram
            ),
            gd AS (SELECT gram, count(*) AS n_docs FROM occ GROUP BY gram),
            dup AS (
              SELECT o.doc_id,
                     sum(CASE WHEN gd.n_docs >= 2 THEN o.occ ELSE 0 END)
                       AS n_dup
              FROM occ o JOIN gd USING (gram) GROUP BY o.doc_id
            ),
            tot AS (
              SELECT doc_id, greatest(len(tk) - 7, 0) AS n_grams FROM t
            )
            SELECT t.doc_id, t.n_grams::BIGINT AS n_grams,
                   coalesce(d.n_dup, 0)::BIGINT AS n_dup,
                   CASE WHEN t.n_grams > 0
                        THEN coalesce(d.n_dup, 0)::DOUBLE / t.n_grams
                        ELSE 0.0 END AS dup_fraction
            FROM tot t LEFT JOIN dup d USING (doc_id)
            ORDER BY t.doc_id
        """,
        # sliding-window token chunks: size 64, stride 56; chunk c starts
        # at c*56 and the last chunk is the first reaching the doc's end
        "token_chunks": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            nz AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
            c AS (
              SELECT doc_id, tk, n,
                     unnest(range(0,
                       CASE WHEN n <= 64 THEN 1
                            ELSE 1 + (n - 64 + 55) // 56 END
                     )) AS chunk_id
              FROM nz
            )
            SELECT doc_id, chunk_id,
                   len(tk[chunk_id * 56 + 1 : least(chunk_id * 56 + 64, n)])
                     ::BIGINT AS n_tokens,
                   array_to_string(
                     tk[chunk_id * 56 + 1 : least(chunk_id * 56 + 64, n)], ' '
                   ) AS chunk
            FROM c ORDER BY doc_id, chunk_id
        """,
        # greedy within-doc packing of the size-64/stride-56 chunks into
        # <=150-token sequences; the recursive CTE replays the same fill
        "sequence_pack": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {toks} AS tk FROM documents),
            nz AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
            c AS (
              SELECT doc_id,
                     unnest(range(0,
                       CASE WHEN n <= 64 THEN 1
                            ELSE 1 + (n - 64 + 55) // 56 END
                     )) AS chunk_id,
                     tk, n
              FROM nz
            ),
            ch AS (
              SELECT doc_id, chunk_id,
                     len(tk[chunk_id * 56 + 1 : least(chunk_id * 56 + 64, n)])
                       AS n_tokens,
                     array_to_string(
                       tk[chunk_id * 56 + 1 : least(chunk_id * 56 + 64, n)],
                       ' '
                     ) AS chunk
              FROM c
            ),
            p AS (
              SELECT doc_id, chunk_id, n_tokens, chunk,
                     0 AS seq_id, n_tokens AS fill
              FROM ch WHERE chunk_id = 0
              UNION ALL
              SELECT ch.doc_id, ch.chunk_id, ch.n_tokens, ch.chunk,
                     CASE WHEN p.fill + ch.n_tokens > 150
                          THEN p.seq_id + 1 ELSE p.seq_id END,
                     CASE WHEN p.fill + ch.n_tokens > 150
                          THEN ch.n_tokens ELSE p.fill + ch.n_tokens END
              FROM p JOIN ch
                ON ch.doc_id = p.doc_id AND ch.chunk_id = p.chunk_id + 1
            )
            SELECT doc_id, seq_id, count(*)::BIGINT AS n_chunks,
                   sum(n_tokens)::BIGINT AS n_tokens,
                   string_agg(chunk, ' ' ORDER BY chunk_id) AS seq_text
            FROM p GROUP BY doc_id, seq_id ORDER BY doc_id, seq_id
        """,
        # JSON field extraction + per-type aggregate; avg is one exact
        # integer division so both engines agree bit-for-bit
        "props_json_stats": r"""
            WITH k AS (
              SELECT event_type,
                     NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
                       ::BIGINT AS k
              FROM events
            )
            SELECT event_type, count(k)::BIGINT AS n_events,
                   sum(k)::BIGINT AS sum_k, min(k)::BIGINT AS min_k,
                   max(k)::BIGINT AS max_k,
                   sum(k)::DOUBLE / count(k) AS avg_k
            FROM k WHERE k IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        # sequential email -> ipv4 -> phone redaction, RE2 on both sides
        "pii_redact": r"""
            WITH s1 AS (
              SELECT doc_id,
                len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                  AS n_emails,
                regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '[EMAIL]', 'g') AS t1
              FROM documents
            ), s2 AS (
              SELECT doc_id, n_emails,
                len(regexp_extract_all(t1,
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
                regexp_replace(t1,
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS t2
              FROM s1
            )
            SELECT doc_id,
                regexp_replace(t2,
                  '\+\d{9,15}|\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g')
                  AS redacted,
                n_emails, n_ips,
                len(regexp_extract_all(t2,
                  '\+\d{9,15}|\b\d{3}[-.]\d{3}[-.]\d{4}\b'))::BIGINT
                  AS n_phones
            FROM s2 ORDER BY doc_id
        """,
        # C4 line rules: terminal punctuation + >=3 words + no javascript;
        # page drop on lorem ipsum / curly brace / nothing kept
        "c4_line_filter": r"""
            WITH f AS (
              SELECT doc_id, text,
                     string_split(text, chr(10)) AS ls,
                     list_filter(string_split(text, chr(10)),
                       x -> regexp_matches(x, '[.!?]["]?\s*$')
                        AND len(regexp_extract_all(x, '\S+')) >= 3
                        AND NOT contains(lower(x), 'javascript')) AS kept
              FROM documents
            )
            SELECT doc_id,
                   coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
                   len(ls)::BIGINT AS n_lines, len(kept)::BIGINT AS n_kept,
                   (NOT contains(lower(text), 'lorem ipsum')
                    AND NOT contains(text, '{')
                    AND len(kept) >= 1) AS doc_keep
            FROM f ORDER BY doc_id
        """,
        # NFC -> control strip -> horizontal-whitespace collapse -> trim,
        # in exactly the engine's kernel order
        "unicode_normalize": r"""
            WITH n AS (
              SELECT doc_id, text,
                trim(
                  regexp_replace(
                    regexp_replace(nfc_normalize(text),
                      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                    '[ \t]+', ' ', 'g'),
                  ' ' || chr(9) || chr(13) || chr(10)) AS norm_text
              FROM documents
            )
            SELECT doc_id, norm_text, norm_text <> text AS changed
            FROM n ORDER BY doc_id
        """,
        # alpha=0.5 temperature mixing: integer isqrt weights, md5 keep
        "temperature_sample": """
            WITH c AS (
              SELECT source, count(*)::BIGINT AS n,
                     CAST(floor(sqrt(count(*))) AS BIGINT) AS w
              FROM documents GROUP BY source
            ),
            t AS (SELECT sum(n) AS n_total, sum(w) AS sum_w FROM c),
            r AS (
              SELECT source,
                     least(1000, (200 * w * (SELECT n_total FROM t))
                                 // ((SELECT sum_w FROM t) * n)) AS rate
              FROM c
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN r USING (source)
            WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                  ::UBIGINT % 1000 < r.rate
            ORDER BY d.doc_id
        """,
        # seeded deterministic shuffle: md5(seed:doc_id) sort key
        "seeded_shuffle": """
            SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
            FROM documents ORDER BY shuffle_key
        """,
        # hashing-trick bag-of-words: bucket = md5(token) % 64, long form
        "hashed_bow": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            tok AS (SELECT doc_id, unnest(tk) AS tok FROM t)
            SELECT doc_id,
                   (('0x' || substr(md5(tok), 1, 8))::UBIGINT % 64)::BIGINT
                     AS bucket,
                   count(*)::BIGINT AS cnt
            FROM tok GROUP BY doc_id, bucket ORDER BY doc_id, bucket
        """,
        # decontamination: fraction of a doc's 8-grams present in the
        # benchmark holdout's (doc_id % 97 == 0) gram set
        "benchmark_contamination": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(
                       range(1, greatest(len(tk) - 6, 1)),
                       i -> array_to_string(tk[i:i+7], ' ')
                     )) AS gram
              FROM t WHERE len(tk) >= 8
            ),
            bg AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
            ),
            hits AS (
              SELECT g.doc_id, count(*) AS n_hit
              FROM g JOIN bg USING (gram) GROUP BY g.doc_id
            ),
            tot AS (
              SELECT doc_id, greatest(len(tk) - 7, 0) AS n_grams FROM t
            )
            SELECT tot.doc_id, tot.n_grams::BIGINT AS n_grams,
                   coalesce(h.n_hit, 0)::BIGINT AS n_contaminated,
                   CASE WHEN tot.n_grams > 0
                        THEN coalesce(h.n_hit, 0)::DOUBLE / tot.n_grams
                        ELSE 0.0 END AS contamination
            FROM tot LEFT JOIN hits h USING (doc_id)
            ORDER BY tot.doc_id
        """,
        "search_and": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
            SELECT doc_id FROM t
            WHERE list_contains(toks, 'spark') AND list_contains(toks, 'join')
        """,
        "search_or": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
            SELECT doc_id FROM t
            WHERE list_contains(toks, 'vector') OR list_contains(toks, 'stream')
        """,
        "search_not": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
            SELECT doc_id FROM t
            WHERE list_contains(toks, 'spark') AND NOT list_contains(toks, 'window')
        """,
        "bm25_topk": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
            st AS (SELECT count(*) AS n, sum(len(toks))::DOUBLE / count(*) AS avgdl FROM t),
            tf AS (
              SELECT doc_id, len(toks) AS dl,
                     len(list_filter(toks, x -> x = 'spark')) AS tf1,
                     len(list_filter(toks, x -> x = 'join')) AS tf2,
                     len(list_filter(toks, x -> x = 'window')) AS tf3
              FROM t
            ),
            df AS (
              SELECT count(*) FILTER (tf1 > 0) AS df1,
                     count(*) FILTER (tf2 > 0) AS df2,
                     count(*) FILTER (tf3 > 0) AS df3
              FROM tf
            ),
            scored AS (
              SELECT doc_id,
                (CASE WHEN tf1 > 0 THEN ln(1.0 + (st.n - df.df1 + 0.5) / (df.df1 + 0.5))
                      * (tf1 * 2.5) / (tf1 + 1.5 * (1.0 - 0.5 + 0.5 * dl / st.avgdl)) ELSE 0.0 END)
                + (CASE WHEN tf2 > 0 THEN ln(1.0 + (st.n - df.df2 + 0.5) / (df.df2 + 0.5))
                      * (tf2 * 2.5) / (tf2 + 1.5 * (1.0 - 0.5 + 0.5 * dl / st.avgdl)) ELSE 0.0 END)
                + (CASE WHEN tf3 > 0 THEN ln(1.0 + (st.n - df.df3 + 0.5) / (df.df3 + 0.5))
                      * (tf3 * 2.5) / (tf3 + 1.5 * (1.0 - 0.5 + 0.5 * dl / st.avgdl)) ELSE 0.0 END)
                AS score
              FROM tf, st, df
            )
            SELECT doc_id, score FROM scored WHERE score > 0
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id,
                   count(*) AS dup_count
            FROM documents GROUP BY md5(text)
        """,
        "corpus_clean": f"""
            WITH q AS (
              SELECT doc_id, {SIMPLE_TOKENS_SQL} AS toks, text FROM documents
            ),
            gated AS (
              SELECT doc_id, text FROM q
              WHERE len(toks) >= 20
                AND (len(toks) = 0 OR
                     len(list_filter(toks, x -> x IN ('the','a','of','and','to')))::DOUBLE / len(toks) <= 0.10)
            ),
            keepers AS (
              SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            )
            SELECT g.doc_id FROM gated g JOIN keepers k ON k.doc_id = g.doc_id
            ORDER BY g.doc_id
        """,
        "near_dup_word_jaccard": f"""
            WITH t AS (SELECT doc_id, list_distinct({toks}) AS s FROM documents)
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jaccard
            FROM t a JOIN t b
              ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
            WHERE len(list_distinct(a.s || b.s)) > 0
              AND len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.5
        """,
        # connected components over the near-dup pair graph: every doc
        # labeled with its component's min doc_id (recursive CTE; the
        # pair predicate is near_dup_word_jaccard's)
        "dedup_clusters": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id, list_distinct({toks}) AS s FROM documents
            ),
            pairs AS (
              SELECT a.doc_id AS pa, b.doc_id AS pb
              FROM t a JOIN t b
                ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
              WHERE len(list_distinct(a.s || b.s)) > 0
                AND len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(a.s || b.s)) >= 0.5
            ),
            e(a, b) AS (
              SELECT pa, pb FROM pairs UNION ALL SELECT pb, pa FROM pairs
            ),
            n(id) AS (SELECT DISTINCT a FROM e),
            cc(id, label) AS (
              SELECT id, id FROM n
              UNION
              SELECT e.b, cc.label FROM cc JOIN e ON e.a = cc.id
              WHERE cc.label < e.b
            ),
            m AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id)
            SELECT d.doc_id,
                   coalesce(m.cluster, d.doc_id)::BIGINT AS cluster_id
            FROM documents d LEFT JOIN m ON m.id = d.doc_id
            ORDER BY d.doc_id
        """,
        # deterministic hash-based stratified sample: md5(doc_id) % 1000
        # under the stratum's permille (en boosted to 300, default 100)
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  ::UBIGINT % 1000
                  < CASE WHEN lang = 'en' THEN 300 ELSE 100 END
            ORDER BY doc_id
        """,
        # reason-labeled quality filter: short / repetitive (3-gram) /
        # non-english (langid_stopwords' exact vote)
        "filter_report": f"""
            WITH t AS (SELECT doc_id, {toks} AS tk FROM documents),
            c AS (
              SELECT doc_id, len(tk) AS n_tok,
                CASE WHEN len(tk) >= 3 THEN
                  1.0 - len(list_distinct(list_transform(
                        range(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                      )))::DOUBLE / (len(tk) - 2)
                ELSE 0.0 END AS rep_ratio,
                len(list_filter(tk, x -> x IN ('der','die','das','und','ist','von','mit','den','nicht','ein'))) AS c_de,
                len(list_filter(tk, x -> x IN ('the','and','of','to','in','is','that','it','for','with'))) AS c_en,
                len(list_filter(tk, x -> x IN ('el','los','las','que','y','en','un','para','con','por'))) AS c_es,
                len(list_filter(tk, x -> x IN ('le','la','les','des','et','une','que','pour','dans','est'))) AS c_fr
              FROM t
            )
            SELECT doc_id,
                   (n_tok < 20) AS too_short,
                   (rep_ratio > 0.2) AS too_repetitive,
                   (CASE
                      WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                      WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                      WHEN c_es >= c_fr THEN 'es'
                      ELSE 'fr'
                    END) <> 'en' AS non_english,
                   NOT ((n_tok < 20) OR (rep_ratio > 0.2) OR (CASE
                      WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                      WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
                      WHEN c_es >= c_fr THEN 'es'
                      ELSE 'fr'
                    END) <> 'en') AS keep
            FROM c ORDER BY doc_id
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   md5(array_to_string(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), ' ')) AS fingerprint
            FROM documents
        """,
        "minhash_lsh_dedup": r"""
            -- FULL minhash+LSH replay: word-3-gram shingles, md5 u64
            -- (little-endian, hex-parse -- no lossy HUGEINT SUM), the
            -- engine's xorshift seed family via 32-bit-half mod-2^64
            -- arithmetic, 16 bands x 4 rows (band key = the chunk tuple,
            -- equality-equivalent to the engine's md5 key), bucket cap 64
            -- smallest ids, exact Jaccard >= 0.5 over the shingle-hash
            -- sets, min-label connected components (recursive CTE)
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS tk
              FROM documents
            ),
            shing AS (
              SELECT DISTINCT doc_id, unnest(
                CASE WHEN len(tk) >= 3 THEN
                  list_distinct(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                ELSE [array_to_string(tk, ' ')] END) AS s
              FROM t WHERE len(tk) > 0
            ),
            u64 AS (
              SELECT doc_id, s,
                ('0x' || substr(md5(s),15,2) || substr(md5(s),13,2)
                       || substr(md5(s),11,2) || substr(md5(s),9,2))::BIGINT::HUGEINT
                  * 4294967296::HUGEINT
                + ('0x' || substr(md5(s),7,2) || substr(md5(s),5,2)
                         || substr(md5(s),3,2) || substr(md5(s),1,2))::BIGINT::HUGEINT AS v
              FROM shing
            ),
            st1 AS (
              SELECT doc_id, seed.i AS si, v,
                     (seed.i::HUGEINT * 11400714819323198485::HUGEINT)
                       % 18446744073709551616::HUGEINT AS s64
              FROM u64 CROSS JOIN range(1, 65) seed(i)
            ),
            st2 AS (
              SELECT doc_id, si,
                     xor(CAST(v // 4294967296 AS BIGINT),
                         CAST(s64 // 4294967296 AS BIGINT))::HUGEINT * 4294967296::HUGEINT
                     + xor(CAST(v % 4294967296 AS BIGINT),
                           CAST(s64 % 4294967296 AS BIGINT))::HUGEINT AS a
              FROM st1
            ),
            st3 AS (
              SELECT doc_id, si,
                     ( ((a // 4294967296) * 484763065::HUGEINT
                        + (a % 4294967296) * 3210233709::HUGEINT
                       ) % 4294967296::HUGEINT * 4294967296::HUGEINT
                       + (a % 4294967296) * 484763065::HUGEINT
                     ) % 18446744073709551616::HUGEINT AS b
              FROM st2
            ),
            mixed AS (
              SELECT doc_id, si,
                     MIN(xor(CAST(b // 4294967296 AS BIGINT),
                             CAST((b // 2147483648) // 4294967296 AS BIGINT))::HUGEINT
                           * 4294967296::HUGEINT
                         + xor(CAST(b % 4294967296 AS BIGINT),
                               CAST((b // 2147483648) % 4294967296 AS BIGINT))::HUGEINT
                     ) AS sig
              FROM st3 GROUP BY doc_id, si
            ),
            sig4 AS (
              SELECT doc_id, CAST((si - 1) // 4 AS INTEGER) AS band,
                     string_agg(CAST(sig AS VARCHAR), ',' ORDER BY si) AS bkey
              FROM mixed GROUP BY doc_id, (si - 1) // 4
            ),
            members AS (
              SELECT band, bkey, doc_id,
                     row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY band, bkey) AS cnt
              FROM sig4
            ),
            capped AS (
              SELECT band, bkey, doc_id FROM members WHERE cnt >= 2 AND rn <= 64
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS pa, b.doc_id AS pb
              FROM capped a
              JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
                            AND b.doc_id > a.doc_id
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM u64 GROUP BY doc_id),
            inter AS (
              SELECT c.pa, c.pb, count(*) AS ni
              FROM cand c
              JOIN u64 x ON x.doc_id = c.pa
              JOIN u64 y ON y.doc_id = c.pb AND y.v = x.v
              GROUP BY c.pa, c.pb
            ),
            pairs AS (
              SELECT c.pa, c.pb
              FROM cand c
              JOIN sizes sa ON sa.doc_id = c.pa
              JOIN sizes sb ON sb.doc_id = c.pb
              LEFT JOIN inter i ON i.pa = c.pa AND i.pb = c.pb
              WHERE (sa.n + sb.n - coalesce(i.ni, 0)) > 0
                AND coalesce(i.ni, 0)::DOUBLE
                    / (sa.n + sb.n - coalesce(i.ni, 0)) >= 0.5
            ),
            e(a, b) AS (SELECT pa, pb FROM pairs UNION ALL SELECT pb, pa FROM pairs),
            nn(id) AS (SELECT DISTINCT a FROM e),
            cc(id, label) AS (
              SELECT id, id FROM nn
              UNION
              SELECT e.b, cc.label FROM cc JOIN e ON e.a = cc.id WHERE cc.label < e.b
            ),
            m AS (SELECT id, min(label) AS cluster FROM cc GROUP BY id)
            SELECT id::BIGINT AS doc_id, cluster::BIGINT AS cluster_id
            FROM m ORDER BY doc_id
        """,
        "winnowing_fingerprints": r"""
            -- winnowing replay: k=5 char-gram polynomial hash (base 257
            -- mod 2^61-1, computed directly per gram — the engine's
            -- rolling form is the same polynomial), w=4 window minima via
            -- a window frame, DISTINCT selection, per-doc count/min/max
            WITH s AS (
              SELECT doc_id,
                     array_to_string(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> x <> ''), ' ') AS s
              FROM documents
            ),
            positions AS (
              SELECT doc_id, s, unnest(range(1, len(s) - 3)) AS i
              FROM s WHERE len(s) >= 5
            ),
            grams AS (
              SELECT doc_id, i,
                     (ord(substr(s, CAST(i AS INTEGER), 1))::HUGEINT
                        * 4362470401
                      + ord(substr(s, CAST(i+1 AS INTEGER), 1))::HUGEINT
                        * 16974593
                      + ord(substr(s, CAST(i+2 AS INTEGER), 1))::HUGEINT
                        * 66049
                      + ord(substr(s, CAST(i+3 AS INTEGER), 1))::HUGEINT
                        * 257
                      + ord(substr(s, CAST(i+4 AS INTEGER), 1))::HUGEINT
                     ) % 2305843009213693951 AS h
              FROM positions
            ),
            mins AS (
              SELECT doc_id, i,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                       AS wmin,
                     COUNT(*) OVER (PARTITION BY doc_id) AS nh
              FROM grams
            ),
            sel AS (
              SELECT DISTINCT doc_id, wmin
              FROM mins WHERE i <= greatest(nh - 3, 1)
            ),
            agg AS (
              SELECT doc_id, count(*) AS n_fingerprints,
                     CAST(min(wmin) AS BIGINT) AS min_fp,
                     CAST(max(wmin) AS BIGINT) AS max_fp
              FROM sel GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_fingerprints, 0) AS n_fingerprints,
                   COALESCE(a.min_fp, 0) AS min_fp,
                   COALESCE(a.max_fp, 0) AS max_fp
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id
        """,
        "simhash64": f"""
            WITH {_SIMHASH_REPLAY_CTES}
            SELECT doc_id, simhash FROM simhashes ORDER BY doc_id
        """,
        "simhash_near_dup": f"""
            -- banded Hamming near-dup replay over the simhash CTEs: band
            -- keys via signed arithmetic shift + mask (identical low-16
            -- bits to the engine's unsigned chunks), 64-smallest-id cap
            -- per (band, key), popcount verify, cross-band distinct
            WITH {_SIMHASH_REPLAY_CTES},
            banded AS (
              SELECT b.b AS band,
                     ((simhash >> CAST(16 * b.b AS INTEGER)) & 65535)
                       AS key,
                     doc_id, simhash
              FROM simhashes CROSS JOIN range(4) b(b)
            ),
            capped AS (
              SELECT * FROM (
                SELECT band, key, doc_id, simhash,
                       row_number() OVER (
                         PARTITION BY band, key ORDER BY doc_id
                       ) AS rn
                FROM banded
              ) WHERE rn <= 64
            )
            SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
            FROM capped a
            JOIN capped b
              ON a.band = b.band AND a.key = b.key
             AND b.doc_id > a.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_id_a, doc_id_b
        """,
        "knn_cosine": """
            WITH s AS (
              SELECT vec_id,
                     list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)
                     ) AS sim
              FROM embeddings WHERE vec_id <> 0
            )
            SELECT row_number() OVER (ORDER BY sim DESC, vec_id) AS rank, vec_id
            FROM s ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "knn_cosine_batch": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings WHERE vec_id < 8
            ),
            s AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(e.embedding, q.qe)
                                DESC, e.vec_id
                     ) AS rank
              FROM embeddings e JOIN q ON e.vec_id <> q.query_id
            )
            SELECT query_id, rank, vec_id FROM s
            WHERE rank <= 10 ORDER BY query_id, rank
        """,
        "embedding_cosine_dedup": _embedding_cosine_dedup_sql(),
        "ivf_assignments": _ivf_assignments_sql(),
        "embedding_cosine_window_pairs": """
            WITH t AS (SELECT vec_id, embedding FROM embeddings)
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM t a JOIN t b
              ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 100
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
            ORDER BY vec_id_a, vec_id_b
        """,
        "media_features": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS sha256
            FROM documents
        """,
        # --- probe-search result SETS (guard-aware: NUL / >1 MiB docs are
        # dropped, >500-char lines are blanked before tokenization —
        # file_guard.rs semantics; the all-lowercase exact-form vocabulary
        # of this table family makes probe token admission equal to
        # simple-token equality, with stemming the identity on these terms) ---
        **{
            name: f"""
            WITH g AS (
              SELECT doc_id, source,
                     {_GUARD_TOKENS_SQL} AS toks
              FROM documents
              WHERE strpos(text, chr(0)) = 0
                AND octet_length(encode(text)) <= 1048576
            )
            SELECT 'corpus/' || source AS repo,
                   printf('docs/doc%07d.txt', doc_id) AS path
            FROM g WHERE {where}
            ORDER BY repo, path
        """
            for name, where in {
                "probe_search_or": "list_contains(toks,'spark') OR list_contains(toks,'vector')",
                "probe_search_and": "list_contains(toks,'spark') AND list_contains(toks,'join')",
                # '+spark window': the required term alone defines the set
                # (optional terms only shape the ranking)
                "probe_search_required": "list_contains(toks,'spark')",
                "probe_search_exclusion": "list_contains(toks,'spark') AND NOT list_contains(toks,'window')",
                "probe_search_exact": "list_contains(toks,'batch')",
                # files_only admits with negatives IGNORED
                # (search_runner.rs:637-686 early-files semantics)
                "probe_search_files_only": "list_contains(toks,'spark')",
            }.items()
        },
        # the documents are single-line texts, so every resolved span is
        # line 1..1 and the code is the whole text; the Ray side parses
        # "docs/doc0000003.txt:1-1" (range), "docs/doc0000007.txt"
        # (whole file) and bare "doc0000011.txt" (basename membership)
        "extract_from_text_refs": """
            SELECT 'corpus/' || d.source AS repo,
                   printf('docs/doc%07d.txt', d.doc_id) AS path,
                   CAST(1 AS BIGINT) AS start_line,
                   CAST(1 AS BIGINT) AS end_line,
                   r.kind AS kind,
                   d.text AS code
            FROM (VALUES (3, 'range'), (7, 'file'), (11, 'file'))
                 r(ref_id, kind)
            JOIN documents d ON d.doc_id = r.ref_id
            ORDER BY path
        """,
    }
