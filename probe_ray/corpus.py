"""Deterministic synthetic code corpus generator (FIXTURES.md §1).

Produces the (repo, path, commit, lang, content) Parquet corpus the engine
indexes, mirroring the reference's own integration fixtures
(/root/reference/tests/elastic_query_integration_tests.rs:14-88 keyword
markers, tokenization.rs:2852-2959 identifier cases) at document granularity.
Seed-fixed; no external data.

Sizes: t1 = 4 repos x 8 files (smoke, includes guard violations),
t2 = 16 x 64 (rank-identity vs oracle), bench = 64 x 512 (throughput).
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

SIZES = {
    "t1": (4, 8),
    "t2": (16, 64),
    "bench": (64, 512),        # 32,768 files
    "bench4x": (128, 1024),    # 131,072 files
    "bench16x": (512, 1024),   # 524,288 files (scaling criterion runs)
}

LANGS = ["rust", "javascript", "typescript", "python", "go"]
EXT = {"rust": "rs", "javascript": "js", "typescript": "ts", "python": "py", "go": "go"}

_CAMEL_IDENTS = [
    "migrateEndpointMetaByType",
    "parseJSONToHTML5",
    "APIDefinition",
    "OAuth2Provider",
    "enableFirewallWhitelist",
    "typeIgnore",
]
_COMPOUNDS = ["code_block", "codeblock", "file_name", "filename", "hashmap", "whitelist"]
_CAMEL_WORDS = [
    "Payment", "Session", "Routing", "Billing", "Metric", "Catalog", "Tenant",
    "Schema", "Replica", "Cursor", "Ledger", "Quota", "Signal", "Bundle",
]

_COMMENT = {"rust": "//", "javascript": "//", "typescript": "//", "python": "#", "go": "//"}


def _fn_def(lang: str, name: str, body: str) -> str:
    if lang == "rust":
        return f"pub fn {name}() {{\n    {body}\n}}\n"
    if lang == "python":
        return f"def {name}():\n    {body}\n"
    if lang == "go":
        return f"func {name}() {{\n    {body}\n}}\n"
    return f"function {name}() {{\n    {body}\n}}\n"


def _commit_for(repo: str, seed: int) -> str:
    return hashlib.sha1(f"{repo}:{seed}".encode()).hexdigest()


def generate_rows(size: str = "t2", seed: int = 42) -> list[dict]:
    n_repos, files_per_repo = SIZES[size]
    rng = random.Random(seed)
    rows = []
    gi = 0  # global file index drives all deterministic choices
    for r in range(n_repos):
        repo = f"org{r % 4}/repo{r}"
        commit = _commit_for(repo, seed)
        for f in range(files_per_repo):
            lang = LANGS[gi % len(LANGS)]
            ext = EXT[lang]
            cm = _COMMENT[lang]
            parts: list[str] = []
            subdir = ["src", "src/search", "lib", "core", "internal"][gi % 5]
            fname = f"file{f}.{ext}"

            # 1. keyword markers: file gi carries marker m iff (gi >> m) & 1
            markers = [
                m for b, m in enumerate(["keywordAlpha", "keywordBeta", "keywordGamma"])
                if (gi >> b) & 1
            ]
            for m in markers:
                parts.append(f"{cm} This file mentions {m} in a comment\n")
                parts.append(_fn_def(lang, f"use{m[0].upper()}{m[1:]}", f"{cm} {m} marker"))

            # 2. camelCase identifier files
            if gi % 4 == 0:
                ident = _CAMEL_IDENTS[(gi // 4) % len(_CAMEL_IDENTS)]
                parts.append(_fn_def(lang, ident, f"{cm} identifier case"))

            # 3. snake/compound files
            if gi % 5 == 1:
                comp = _COMPOUNDS[(gi // 5) % len(_COMPOUNDS)]
                parts.append(f"{cm} compound term: {comp}\n")
                parts.append(_fn_def(lang, f"handle_{comp.replace('.', '_')}", f"{cm} {comp}"))

            # 4. stop-word-heavy files
            if gi % 7 == 2:
                parts.append(
                    f"{cm} " + " ".join(["fn if for return string int the and"] * 5) + "\n"
                )

            # 5. zetaTerm frequency/length gradient
            if gi % 3 == 0:
                reps = 1 << (gi % 6)
                parts.append(f"{cm} " + " ".join(["zetaTerm"] * reps) + "\n")
                filler = rng.randrange(0, 40)
                for k in range(filler):
                    parts.append(_fn_def(lang, f"filler{k}", f"{cm} pad{k} content"))

            # 6. path-match files: 'auth' only in the path
            if gi % 11 == 3:
                subdir = "src/authcontroller"
                parts.append(_fn_def(lang, "login", f"{cm} session logic"))

            # 7. substring-literal files
            if gi % 13 == 4:
                parts.append(
                    f"{cm} helper invocation\n"
                    + _fn_def(lang, "orchestrate", "let r = cleanupScopeMappings(input)"
                              if lang == "rust" else "r = cleanupScopeMappings(input)")
                )

            # 8. test-flagged files
            if gi % 17 == 5:
                subdir = "tests"
                fname = f"file{f}_test.{ext}"
                attr = "#[test]\n" if lang == "rust" else f"{cm} test case\n"
                parts.append(attr + _fn_def(lang, f"test_case_{f}", f"{cm} assertion"))

            # per-file unique camelCase identifiers: defeats cross-file token
            # caching so the tokenize stage does REAL per-file work (as real
            # code would), which is what the throughput benchmark measures
            u = rng.randrange(1 << 30)
            for k in range(4):
                ident = f"handle{_CAMEL_WORDS[(u + k) % len(_CAMEL_WORDS)]}Request{u % 9973}V{k}"
                parts.append(_fn_def(lang, ident, f"{cm} unique logic {u}-{k}"))
            body_terms = " ".join(
                f"field{(u >> (k % 16)) % 997}Value" for k in range(24)
            )
            parts.append(f"{cm} {body_terms}\n")

            if not parts:
                parts.append(_fn_def(lang, f"plain{f}", f"{cm} ordinary content {gi}"))

            content = "".join(parts)
            rows.append(
                dict(repo=repo, path=f"{subdir}/{fname}", commit=commit,
                     lang=lang, content=content)
            )
            gi += 1

    if size == "t1":
        # 9. guard violations: NUL byte, > 1 MiB, 3000-char line
        repo, commit = "org0/repo0", _commit_for("org0/repo0", seed)
        rows.append(dict(repo=repo, path="src/nul_file.rs", commit=commit, lang="rust",
                         content="fn bad() { let x = \x00; }"))
        rows.append(dict(repo=repo, path="src/huge_file.rs", commit=commit, lang="rust",
                         content="// big\n" + "x" * (1 << 20)))
        rows.append(dict(repo=repo, path="src/longline.rs", commit=commit, lang="rust",
                         content="// ok line keywordAlpha\n" + "y" * 3000 + "\n// tail\n"))
    return rows


def corpus_table(size: str = "t2", seed: int = 42) -> pa.Table:
    rows = generate_rows(size, seed)
    return pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.string()),
        }
    )


def write_corpus(path: str, size: str = "t2", seed: int = 42,
                 num_files: int = 1) -> str:
    """Write the corpus as one or more parquet files under ``path`` (a
    directory when num_files > 1, else a single file path)."""
    import pyarrow.parquet as pq

    table = corpus_table(size, seed)
    if num_files <= 1:
        pq.write_table(table, path)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + num_files - 1) // num_files
    for i in range(num_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, f"{path}/part-{i:05d}.parquet")
    return path


QUERY_SUITE: list[tuple[str, list[str], dict]] = [
    # (id, query strings, options) — FIXTURES.md §2
    ("q01_single_term", ["keywordAlpha"], {}),
    ("q02_or_chain", ["keywordAlpha OR keywordBeta OR keywordGamma"], {}),
    ("q03_required_optional", ["+keywordAlpha keywordBeta"], {}),
    ("q04_exclusion", ["keywordAlpha -keywordGamma"], {}),
    ("q05_and", ["keywordAlpha AND keywordBeta"], {}),
    ("q06_grouping", ["(keywordAlpha OR keywordBeta) AND keywordGamma"], {}),
    ("q07_complex_exclusion", ["(keywordAlpha OR keywordBeta) -keywordGamma"], {}),
    ("q08_camel_identifier", ["migrateEndpointMetaByType"], {}),
    ("q09_quoted_exact", ['"cleanupScopeMappings"'], {}),
    ("q10_exact_plus_negative", ['"keywordAlpha" -keywordGamma'], {}),
    ("q11_multi_term_stem", ["parse JSON html"], {}),
    ("q12_special_case", ["whitelist"], {}),
    ("q13_compound_split", ["codeblocks"], {}),
    ("q14_filename_only", ["auth"], {}),
    ("q15_lang_filter", ["keywordAlpha AND lang:rust"], {}),
    ("q16_ext_filter", ["keywordAlpha ext:rs"], {}),
    ("q17_filename_autodetect", ['"file1.rs"'], {}),
    ("q18_all_stopwords", ["the if for"], {}),
    ("q19_bm25_gradient", ["zetaTerm"], {}),
    ("q20_underscore", ["user_input"], {}),
    ("q21_exact_flag", ["keywordAlpha"], {"exact": True}),
    ("q22_multi_query_and", ["keywordAlpha", "keywordBeta"], {}),
    ("q23_max_results", ["keywordAlpha OR keywordBeta"], {"max_results": 5}),
    ("q24_files_only", ["keywordAlpha -keywordGamma"], {"files_only": True}),
    ("q25_max_bytes", ["keywordAlpha"], {"max_bytes": 5000}),
    ("q26_max_tokens", ["keywordBeta"], {"max_tokens": 2000}),
    ("q27_exclude_filenames", ["auth"], {"include_filenames": False}),
    ("q28_language", ["keywordAlpha"], {"language": "python"}),
]

QUERY_SUITE.append(("q29_allow_tests_off", ["keywordAlpha"], {"allow_tests": False}))
