"""Block-granularity result layer: the reference's fallback context
extractor, contained-block dedup and adjacent-block merge, re-expressed as
pure functions shared by the single-process oracle (oracle.py) and the
distributed engine's ``map_batches`` closures (search.py).

probe's output unit is a ranked *code block*, not a file. For languages
with a tree-sitter grammar the reference extracts AST nodes; for
unsupported extensions (e.g. ``.txt`` — this engine's corpus) EVERY matched
line goes through the fallback path (file_processing.rs:1673-1707 →
process_uncovered_lines_batch, file_processing.rs:473-1048): ±5-line
context windows around matched lines, merged with a dynamic gap threshold,
filtered by the query AST over line-level term matches, with node-type
heuristics (file_processing.rs:380-445).

Line-level term matching mirrors the reference's generated regex patterns
(query.rs:415-646 create_structured_patterns): every pattern is an escaped
literal matched case-insensitively without word boundaries, so matching
reduces to lowercase substring containment of any of the term's pattern
strings:

  - the keyword itself (query.rs:494-507),
  - for non-exact, non-excluded terms: each token of
    tokenize_and_stem(keyword) (query.rs:509-530; tokenization.rs:2682-2713),
  - for keywords longer than 3 chars in non-exact queries: camel-case or
    vocabulary compound parts of length >= 3 whose part is not excluded
    (query.rs:585-646).

Deviation (documented): the reference pushes per-file results from a rayon
parallel loop over early-ranked files, so its results-vector order (which
feeds BM25 tie-breaks and the positional-overwrite quirk) is scheduling-
dependent. This implementation defines the canonical candidate order
(doc_id asc, block start asc); ties are deterministic.

Reference quirk faithfully reproduced: the AST's Term keywords are the
PROCESSED (tokenized, stemmed) query terms (elastic_query.rs:790-808), and
the generated line patterns are those stemmed strings — so a query word
whose stem alters the suffix ("solitary" -> "solitari", "apply" ->
"appli") cannot substring-match its own original inflection at line level.
Document-mode search still finds such docs via stemmed token membership in
the index; block mode, like probe's scan, does not.
"""

from __future__ import annotations

from probe_ray import queryparse as qp
from probe_ray import stemmer
from probe_ray import tokenizer as tok

CONTEXT_SIZE = 5  # file_processing.rs:500 (default_context_size)
MERGE_THRESHOLD_DEFAULT = 5  # block_merging.rs:136


# ---------------------------------------------------------------------------
# Pattern generation (query.rs create_structured_patterns, literal needles)
# ---------------------------------------------------------------------------

def tokenize_and_stem(keyword: str) -> list[str]:
    """tokenization.rs:2682-2713: camel-case parts (stop-filtered, stemmed)
    else vocabulary compound parts (stop-filtered, stemmed) else the stemmed
    keyword."""
    camel = tok.split_camel_case(keyword)
    if len(camel) > 1:
        return [stemmer.stem(p) for p in camel if not tok.is_stop_word(p)]
    parts = tok.split_compound_word_for_filtering(keyword)
    if len(parts) > 1:
        return [stemmer.stem(p) for p in parts if not tok.is_stop_word(p)]
    return [stemmer.stem(keyword)]


def universal_term_matches(lines: list[str]) -> dict[int, set[int]]:
    """Universal-plan line matches: the reference's "." pattern is
    regex-any-character, so every NON-EMPTY line matches term index 0
    (query.rs:858-889; the needles elsewhere are literal substrings, hence
    this special case)."""
    hit = {i for i, l in enumerate(lines, 1) if l}
    return {0: hit} if hit else {}


def term_patterns(plan: qp.QueryPlan) -> dict[int, list[str]]:
    """Per term index, the lowercase literal needles whose case-insensitive
    substring presence in a line marks that line as matching the term.
    Mirrors collect_patterns (query.rs:460-564) + the compound pass
    (query.rs:585-646). Universal plans return no literal needles — their
    "." pattern is regex-any-char, handled by universal_term_matches."""
    if plan.is_universal:
        return {}
    out: dict[int, set[str]] = {}
    exact_search = (not plan.is_universal) and qp.is_exact_search(plan.ast)
    for term in qp.walk_terms(plan.ast):
        for kw in term.keywords:
            kw_lower = kw.lower()
            idx = plan.term_indices.get(kw_lower)
            if idx is None:
                continue
            bucket = out.setdefault(idx, set())
            bucket.add(kw_lower)
            if not term.exact and not term.excluded:
                for t in tokenize_and_stem(kw):
                    bucket.add(t.lower())
    # compound pass over term_indices (lowercased keys — query.rs:585)
    for kw_lower, idx in plan.term_indices.items():
        if kw_lower in plan.excluded_terms:
            continue
        if len(kw_lower) > 3 and not exact_search:
            camel = tok.split_camel_case(kw_lower)
            parts = camel if len(camel) > 1 else tok.split_compound_word_for_filtering(kw_lower)
            if len(parts) > 1:
                bucket = out.setdefault(idx, set())
                for p in parts:
                    if len(p) >= 3 and p not in plan.excluded_terms:
                        bucket.add(p.lower())
    return {i: sorted(s) for i, s in out.items()}


def line_term_matches(
    lines: list[str], patterns: dict[int, list[str]]
) -> dict[int, set[int]]:
    """term index -> set of 1-based line numbers whose lowercase text
    contains any of the term's needles (ripgrep_searcher.rs case-insensitive
    literal matching of the generated patterns).

    Offset-based: one ``str.find`` walk over the joined lowered content per
    needle, jumping to the next line after each hit — O(matching lines)
    instead of O(lines x needles). Needles never contain newlines, so
    joined-text matching is exactly per-line matching."""
    if not lines or not patterns:
        return {}
    # Lowercase PER LINE before joining: Unicode lowercasing can change
    # string length ('İ' U+0130 lowers to 2 chars), so offsets computed from
    # the original lines would drift against a whole-text .lower().
    low_lines = [l.lower() for l in lines]
    lowered = "\n".join(low_lines)
    starts = [0]
    for l in low_lines:
        starts.append(starts[-1] + len(l) + 1)
    import bisect

    out: dict[int, set[int]] = {}
    for idx, needles in patterns.items():
        hit: set[int] = set()
        for p in needles:
            if not p:
                continue
            pos = lowered.find(p)
            while pos != -1:
                line_i = bisect.bisect_right(starts, pos) - 1
                hit.add(line_i + 1)
                nxt = starts[line_i + 1] if line_i + 1 < len(starts) else len(lowered)
                pos = lowered.find(p, nxt)
        if hit:
            out[idx] = hit
    return out


# ---------------------------------------------------------------------------
# Fallback context extraction (file_processing.rs:473-1048)
# ---------------------------------------------------------------------------

def determine_fallback_node_type(line: str, extension: str | None) -> str:
    """file_processing.rs:380-445."""
    trimmed = line.strip()
    if (
        trimmed.startswith("//")
        or trimmed.startswith("/*")
        or trimmed.startswith("*")
        or (trimmed.startswith("#") and extension in ("py", "rb"))
        or trimmed.startswith("'''")
        or trimmed.startswith('"""')
    ):
        return "comment"
    lowercase = trimmed.lower()
    if (
        ("fn " in trimmed and ("(" in trimmed or ")" in trimmed) and extension == "rs")
        or ("func " in trimmed and extension == "go")
        or ("function " in trimmed and extension in ("js", "ts"))
        or ("def " in lowercase and extension == "py")
        or ("public" in trimmed and "void" in trimmed and extension in ("java", "kt"))
    ):
        return "function"
    if (
        ("class " in trimmed or "interface " in trimmed)
        or ("struct " in trimmed and extension in ("rs", "go", "c", "cpp"))
        or ("type " in trimmed and "struct" in trimmed and extension == "go")
        or ("enum " in trimmed)
    ):
        return "class"
    if (
        trimmed.startswith("import ")
        or trimmed.startswith("from ")
        or trimmed.startswith("require ")
        or trimmed.startswith("use ")
        or trimmed.startswith("#include ")
    ):
        return "import"
    if (
        trimmed.startswith("let ")
        or trimmed.startswith("var ")
        or trimmed.startswith("const ")
    ) or ("=" in trimmed and "==" not in trimmed and "=>" not in trimmed):
        return "variable_declaration"
    if (
        trimmed.startswith("if ")
        or trimmed.startswith("for ")
        or trimmed.startswith("while ")
        or trimmed.startswith("switch ")
        or trimmed.startswith("match ")
    ):
        return "control_flow"
    return "code"


def fallback_windows(
    matched_lines: set[int], n_lines: int
) -> list[tuple[list[int], int, int]]:
    """Context windows (±CONTEXT_SIZE, clamped) around matched lines, merged
    with the dynamic gap threshold (file_processing.rs:522-671). Returns
    (original_lines, start, end) with 1-based inclusive line numbers."""
    if n_lines == 0:
        return []
    windows = []
    for line_num in matched_lines:
        if line_num > n_lines:
            continue
        idx = line_num - 1
        start_idx = max(0, idx - CONTEXT_SIZE)
        end_idx = min(idx + CONTEXT_SIZE, n_lines - 1)
        if start_idx <= end_idx:
            windows.append((line_num, start_idx + 1, end_idx + 1))
    windows.sort(key=lambda w: w[1])
    if len(windows) > 10:
        threshold = CONTEXT_SIZE + 3  # file_processing.rs:593-595
    elif len(windows) > 5:
        threshold = CONTEXT_SIZE + 1
    else:
        threshold = 1
    merged: list[tuple[list[int], int, int]] = []
    cur: tuple[list[int], int, int] | None = None
    for line_num, start, end in windows:
        if cur is None:
            cur = ([line_num], start, end)
        elif start <= cur[2] + threshold:
            cur[0].append(line_num)
            cur = (cur[0], cur[1], max(cur[2], end))
        else:
            merged.append(cur)
            cur = ([line_num], start, end)
    if cur is not None:
        merged.append(cur)
    return merged


def remove_cached_lines(
    term_map: dict[int, set[int]], ranges: list[tuple[int, int]]
) -> dict[int, set[int]]:
    """cache.rs:418-505 (filter_matched_lines_with_cache): matched lines
    covered by a previously returned block of the same file are removed
    before extraction, so a repeat query in a session yields only NEW
    blocks while untouched lines still produce theirs."""
    if not ranges:
        return term_map
    out: dict[int, set[int]] = {}
    for idx, lines in term_map.items():
        kept = {l for l in lines if not any(s <= l <= e for s, e in ranges)}
        if kept:
            out[idx] = kept
    return out


def _is_test_context(context_code: str) -> bool:
    """file_processing.rs:726-753 (string-based test detection)."""
    if "#[test]" in context_code:
        return True
    for line in context_code.split("\n"):
        t = line.strip()
        if t.startswith("fn test_") or t.startswith("pub fn test_"):
            return True
    return False


def block_matched_for_range(
    start: int, end: int, term_matches: dict[int, set[int]]
) -> set[int]:
    """Term indices with a matched line inside [start, end]
    (filter_code_block_with_ast, file_processing.rs:96-104)."""
    return {
        idx
        for idx, lines in term_matches.items()
        if any(start <= l <= end for l in lines)
    }


def filter_block(
    start: int, end: int, term_matches: dict[int, set[int]], plan: qp.QueryPlan
) -> bool:
    """filter_code_block_with_ast (file_processing.rs:84-210): line-based
    term indices -> AST evaluation with negatives enforced."""
    matched = block_matched_for_range(start, end, term_matches)
    if not matched and not plan.has_only_excluded_terms and not plan.is_universal:
        return False
    if plan.is_universal and not matched:
        return True
    return qp.evaluate(plan.ast, matched, plan.term_indices, False)


def extract_fallback_blocks(
    lines: list[str],
    path: str,
    term_matches: dict[int, set[int]],
    plan: qp.QueryPlan,
    specials: frozenset[str],
    *,
    extension: str | None = None,
    allow_tests: bool = True,
    exact: bool = False,
    is_test_file_flag: bool = False,
) -> list[dict]:
    """process_uncovered_lines_batch (file_processing.rs:473-1048) with no
    AST-covered lines (unsupported-language path): every matched line is
    uncovered. ``lines`` are the EFFECTIVE lines (>500-char lines blanked,
    file_processing.rs:1117-1134). Returns block dicts in window order."""
    all_lines: set[int] = set()
    for ls in term_matches.values():
        all_lines.update(ls)
    if not all_lines:
        return []
    if extension is None:
        extension = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if not allow_tests and is_test_file_flag:
        return []  # file_processing.rs:532-540
    n_lines = len(lines)
    query_terms_lower = set(plan.term_indices)  # keys are lowercase
    # filename-match heuristic (file_processing.rs:765-770)
    likely_filename_match = any(
        len(ls) >= n_lines for ls in term_matches.values()
    )
    blocks: list[dict] = []
    compound_parts = {
        t: parts
        for t in plan.term_indices
        if len(parts := tok.split_compound_word_for_filtering(t, specials)) > 1
    }
    for original_lines, start, end in fallback_windows(all_lines, n_lines):
        context_code = "\n".join(lines[start - 1 : end])
        primary = original_lines[0]
        node_type = determine_fallback_node_type(lines[primary - 1], extension)
        if not allow_tests and _is_test_context(context_code):
            continue
        context_lower = context_code.lower()
        has_potential = any(t in context_lower for t in query_terms_lower)
        if not has_potential and not likely_filename_match:
            continue  # aggressive pre-filter (file_processing.rs:772-791)
        # tokenization: exact mode includes the filename, non-exact does not
        # (file_processing.rs:816-826); specials thread through the global
        # term-exception registry in the reference
        if exact:
            context_terms = tok.tokenize(context_code, specials) + tok.tokenize(
                path, specials
            )
        else:
            context_terms = tok.tokenize(context_code, specials)
        if not filter_block(start, end, term_matches, plan):
            continue
        terms_set = set(context_terms)
        direct = {t for t in query_terms_lower if t in terms_set}
        compound = set()
        # compound matching only when some query term has _ or -
        # (file_processing.rs:886-903)
        if any("_" in t or "-" in t for t in query_terms_lower):
            for t in query_terms_lower - direct:
                parts = compound_parts.get(t)
                if parts and all(p in terms_set for p in parts):
                    compound.add(t)
        but = len(direct) + len(compound)
        matched_keywords = set(direct) | set(compound)
        matched_idx = block_matched_for_range(start, end, term_matches)
        for term, idx in plan.term_indices.items():
            if idx in matched_idx and term not in plan.excluded_terms:
                matched_keywords.add(term)
        matched_line_offsets = sorted(
            {
                l - start
                for ls in term_matches.values()
                for l in ls
                if start <= l <= end
            }
        )
        blocks.append(
            dict(
                path=path,
                start=start,
                end=end,
                node_type=node_type,
                code=context_code,
                tokenized=context_terms,
                but=but,
                total=but,  # block_total_matches == block_unique_terms here
                matched_keywords=sorted(matched_keywords),
                matched_lines=matched_line_offsets,
            )
        )
    return blocks


# worker-local cache of per-file structural analysis, keyed by content
# hash + extension — the reference's LINE_MAP_CACHE / tree cache analog
# (parser.rs:1862-1900 cache_key = f"{ext}_{content_hash}_{allow_tests}";
# allow_tests is resolved at block level here, so the key drops it)
_STRUCT_CACHE: dict = {}
_STRUCT_CACHE_MAX = 512


def _file_structure(lines: list[str], extension: str):
    import hashlib

    from probe_ray import structparse as spx

    key = (
        extension,
        hashlib.md5(
            "\n".join(lines).encode("utf-8", "surrogatepass")
        ).hexdigest(),
    )
    st = _STRUCT_CACHE.get(key)
    if st is None:
        if len(_STRUCT_CACHE) >= _STRUCT_CACHE_MAX:
            _STRUCT_CACHE.clear()
        st = _STRUCT_CACHE[key] = spx.analyze(lines, extension)
    return st


def extract_ast_blocks(
    lines: list[str],
    path: str,
    term_matches: dict[int, set[int]],
    plan: qp.QueryPlan,
    specials: frozenset[str],
    *,
    extension: str,
    allow_tests: bool = True,
) -> tuple[list[dict], set[int]]:
    """AST-covered block extraction for supported languages (M8): matched
    lines resolve to structural spans via structparse.resolve_blocks
    (parser.rs:898-1260 semantics), then each block is built exactly as the
    reference's AST result path (file_processing.rs:1272-1590):

    - code = effective lines[start..end] (long lines already blanked);
    - tokenization ALWAYS includes the filename
      (preprocess_text_with_filename, file_processing.rs:1337-1344 —
      unlike the fallback path, which adds the filename only in exact
      mode);
    - query terms substring-contained in the lowercased code are injected
      into the block's terms (file_processing.rs:1165-1173);
    - compound matching runs for every query term (file_processing.rs:
      1444-1461 — NOT gated on '_'/'-' presence like the fallback);
    - the block filter is filter_code_block_with_ast over line-level term
      matches (file_processing.rs:1376-1390);
    - covered lines are marked for EVERY resolved block, filtered or not
      (file_processing.rs:1404-1410), so they never re-enter the fallback.

    Returns (blocks, covered_lines)."""
    from probe_ray import structparse as spx

    all_lines: set[int] = set()
    for ls in term_matches.values():
        all_lines.update(ls)
    if not all_lines:
        return [], set()
    resolved, covered = spx.resolve_blocks(
        lines, extension, all_lines, allow_tests=allow_tests,
        struct=_file_structure(lines, extension),
    )
    if not resolved:
        return [], covered
    query_terms_lower = set(plan.term_indices)
    compound_parts = {
        t: parts
        for t in plan.term_indices
        if len(parts := tok.split_compound_word_for_filtering(t, specials)) > 1
    }
    blocks: list[dict] = []
    for start, end, node_type in resolved:
        if not filter_block(start, end, term_matches, plan):
            continue
        code = "\n".join(lines[start - 1 : end])
        context_terms = tok.tokenize(code, specials) + tok.tokenize(path, specials)
        code_lower = code.lower()
        terms_set = set(context_terms)
        for term in query_terms_lower:
            if term in code_lower and term not in terms_set:
                context_terms.append(term)
                terms_set.add(term)
        direct = {t for t in query_terms_lower if t in terms_set}
        compound = set()
        for t in query_terms_lower - direct:
            parts = compound_parts.get(t)
            if parts and all(p in terms_set for p in parts):
                compound.add(t)
        but = len(direct) + len(compound)
        matched_keywords = set(direct) | set(compound)
        matched_idx = block_matched_for_range(start, end, term_matches)
        for term, idx in plan.term_indices.items():
            if idx in matched_idx and term not in plan.excluded_terms:
                matched_keywords.add(term)
        matched_line_offsets = sorted(
            {
                l - start
                for ls in term_matches.values()
                for l in ls
                if start <= l <= end
            }
        )
        blocks.append(
            dict(
                path=path,
                start=start,
                end=end,
                node_type=node_type,
                code=code,
                tokenized=context_terms,
                but=but,
                total=but,
                matched_keywords=sorted(matched_keywords),
                matched_lines=matched_line_offsets,
            )
        )
    return blocks, covered


def extract_blocks(
    lines: list[str],
    path: str,
    term_matches: dict[int, set[int]],
    plan: qp.QueryPlan,
    specials: frozenset[str],
    *,
    extension: str | None = None,
    allow_tests: bool = True,
    exact: bool = False,
    is_test_file_flag: bool = False,
) -> list[dict]:
    """Block extraction router (process_file_with_results,
    file_processing.rs:1072-1707): supported languages run the AST path
    first (extract_ast_blocks), then matched lines NOT covered by any AST
    block fall through to the fallback context extractor
    (file_processing.rs:1675-1700); unsupported extensions go straight to
    the fallback — the reference's own behavior for languages without a
    grammar.  Output is in canonical (start, end) order per file."""
    from probe_ray import structparse as spx

    if extension is None:
        extension = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if extension not in spx.SUPPORTED_EXTS:
        return extract_fallback_blocks(
            lines, path, term_matches, plan, specials,
            extension=extension, allow_tests=allow_tests, exact=exact,
            is_test_file_flag=is_test_file_flag,
        )
    if not allow_tests and is_test_file_flag:
        return []  # file_processing.rs:532-540
    ast_blocks, covered = extract_ast_blocks(
        lines, path, term_matches, plan, specials,
        extension=extension, allow_tests=allow_tests,
    )
    out = ast_blocks
    if covered:
        residual = {
            idx: rem
            for idx, ls in term_matches.items()
            if (rem := {l for l in ls if l not in covered})
        }
    else:
        residual = term_matches
    if residual:
        out = out + extract_fallback_blocks(
            lines, path, residual, plan, specials,
            extension=extension, allow_tests=allow_tests, exact=exact,
        )
    out.sort(key=lambda b: (b["start"], b["end"], b["node_type"]))
    return out


# ---------------------------------------------------------------------------
# Ranking boosts (result_ranking.rs:8-103)
# ---------------------------------------------------------------------------

_NODE_BOOSTS = {
    # function-like: 2.0
    **{t: 2.0 for t in (
        "function_item", "function_declaration", "method_declaration",
        "function_definition", "function_expression", "arrow_function",
        "method_definition", "method", "singleton_method",
        "constructor_declaration")},
    # types: 1.8
    **{t: 1.8 for t in (
        "impl_item", "struct_item", "class_declaration", "type_definition",
        "interface_declaration", "class_specifier", "struct_specifier",
        "struct_declaration", "interface_type", "protocol_declaration",
        "type_alias_declaration", "typealias_declaration")},
    # enums/traits: 1.6
    **{t: 1.6 for t in (
        "enum_item", "trait_item", "enum_declaration", "enum_specifier",
        "type_declaration", "type_spec", "trait_declaration",
        "extension_declaration", "delegate_declaration")},
    # modules: 1.4
    **{t: 1.4 for t in (
        "module", "mod_item", "namespace", "namespace_declaration",
        "namespace_definition", "module_declaration", "package_declaration")},
    # properties/vars: 1.3
    **{t: 1.3 for t in (
        "property_declaration", "event_declaration", "const_declaration",
        "var_declaration", "variable_declaration", "constant_declaration",
        "const_spec", "var_spec")},
    # exports: 1.1
    **{t: 1.1 for t in ("export_statement", "declare_statement", "declaration")},
    # comments: 0.5
    **{t: 0.5 for t in ("line_comment", "comment", "//", "/*", "*/")},
    # neutral set: 1.0 (explicit in the reference; same as default)
    **{t: 1.0 for t in (
        "object", "array", "jsx_element", "jsx_self_closing_element",
        "property_identifier", "class_body", "class", "identifier")},
}


def node_type_boost(node_type: str, start: int, end: int) -> float:
    """result_ranking.rs:21-103. Match-arm order matters: the doc-comment
    multi-line rule and the test-containment rule precede the default."""
    if node_type in ("doc_comment", "block_comment") and end - start > 3:
        return 1.2
    boost = _NODE_BOOSTS.get(node_type)
    if boost is not None:
        return boost
    if "test" in node_type or "Test" in node_type:
        return 0.7
    return 1.0


def node_type_boost_vec(node_types, starts, ends):
    """Vectorized node_type_boost: the base boost is resolved once per
    DISTINCT node type (few), then the multi-line comment rule overrides
    row-wise — identical fall-through order to the scalar version."""
    import numpy as np
    import pandas as pd

    codes, uniques = pd.factorize(np.asarray(node_types, dtype=object))
    base = np.array(
        [
            _NODE_BOOSTS.get(u)
            if _NODE_BOOSTS.get(u) is not None
            else (0.7 if ("test" in u or "Test" in u) else 1.0)
            for u in uniques
        ],
        dtype=np.float64,
    )
    out = base[codes]
    comment_codes = [
        i for i, u in enumerate(uniques) if u in ("doc_comment", "block_comment")
    ]
    if comment_codes:
        mask = np.isin(codes, comment_codes) & (
            np.asarray(ends, dtype=np.int64) - np.asarray(starts, dtype=np.int64)
            > 3
        )
        out[mask] = 1.2
    return out


# ---------------------------------------------------------------------------
# Contained-block dedup (block_merging.rs:17-118)
# ---------------------------------------------------------------------------

def dedupe_contained_blocks(results: list[dict]) -> list[dict]:
    """Blocks grouped per file key; a block fully contained in another is
    dropped, its matched_keywords merged into the container. Results keep
    their incoming order otherwise (the reference regroups by file via
    BTreeMap — file-key order — which matters only for multi-file overlap;
    we preserve it)."""
    if len(results) <= 1:
        return results
    from collections import defaultdict

    by_file: dict[str, list[dict]] = defaultdict(list)
    for r in results:
        by_file[r["file"]].append(r)
    out: list[dict] = []
    for file_key in sorted(by_file):  # BTreeMap iteration order
        blocks = by_file[file_key]
        if len(blocks) == 1:
            out.append(blocks[0])
            continue
        blocks.sort(key=lambda b: (b["start"], -(b["end"] - b["start"])))
        removed = [False] * len(blocks)
        for i in range(len(blocks)):
            if removed[i]:
                continue
            for j in range(i + 1, len(blocks)):
                if removed[j]:
                    continue
                os_, oe = blocks[i]["start"], blocks[i]["end"]
                is_, ie = blocks[j]["start"], blocks[j]["end"]
                if is_ >= os_ and ie <= oe:
                    merged_kw = list(blocks[i].get("matched_keywords") or [])
                    for kw in blocks[j].get("matched_keywords") or []:
                        if kw not in merged_kw:
                            merged_kw.append(kw)
                    blocks[i]["matched_keywords"] = sorted(merged_kw)
                    removed[j] = True
                elif os_ >= is_ and oe <= ie:
                    merged_kw = list(blocks[j].get("matched_keywords") or [])
                    for kw in blocks[i].get("matched_keywords") or []:
                        if kw not in merged_kw:
                            merged_kw.append(kw)
                    blocks[j]["matched_keywords"] = sorted(merged_kw)
                    removed[i] = True
                    break
        out.extend(b for k, b in enumerate(blocks) if not removed[k])
    return out


# ---------------------------------------------------------------------------
# Adjacent-block merge (block_merging.rs:131-360)
# ---------------------------------------------------------------------------

def _is_function_like(node_type: str) -> bool:
    return (
        "function" in node_type
        or "method" in node_type
        or "fn" in node_type
        or "func" in node_type
    )


def _should_merge(b1: dict, b2: dict, threshold: int) -> bool:
    """block_merging.rs:301-360."""
    if b1["file"] != b2["file"]:
        return False
    s1, e1 = b1["start"], b1["end"]
    s2, e2 = b2["start"], b2["end"]
    overlapping = s1 <= e2 and s2 <= e1
    if overlapping:
        distance = 0
    elif s2 > e1:
        distance = s2 - e1 - 1
    else:
        distance = s1 - e2 - 1
    comment_fn = (
        "comment" in b1["node_type"] and _is_function_like(b2["node_type"])
    ) or ("comment" in b2["node_type"] and _is_function_like(b1["node_type"]))
    return overlapping or distance <= threshold or (
        comment_fn and distance <= threshold * 2
    )


def _merge_code(b1: dict, b2: dict, file_lines: list[str] | None) -> str:
    """block_merging.rs:378-536 — line map union; gaps filled from the file
    content when available (< 10 lines) else placeholder text."""
    s1, e1 = b1["start"], b1["end"]
    s2, e2 = b2["start"], b2["end"]
    ms, me = min(s1, s2), max(e1, e2)
    if s1 == ms and e1 == me:
        return b1["code"]
    if s2 == ms and e2 == me:
        return b2["code"]
    line_map: dict[int, str] = {}
    for i, line in enumerate(b1["code"].split("\n")):
        line_map[s1 + i] = line
    for i, line in enumerate(b2["code"].split("\n")):
        line_map.setdefault(s2 + i, line)
    out: list[str] = []
    cur = ms
    while cur <= me:
        if cur in line_map:
            out.append(line_map[cur])
            cur += 1
            continue
        gap_start = cur
        gap_end = cur
        while gap_end < me and (gap_end + 1) not in line_map:
            gap_end += 1
        gap_size = gap_end - gap_start + 1
        if gap_size < 10:
            if file_lines is not None and gap_end <= len(file_lines):
                out.extend(file_lines[gap_start - 1 : gap_end])
            else:
                out.append(
                    f"... lines {gap_start}-{gap_end} should be included ..."
                )
        else:
            out.append(f"... lines {gap_start}-{gap_end} skipped...")
        cur = gap_end + 1
    return "\n".join(out)


def merge_ranked_blocks(
    results: list[dict],
    threshold: int = MERGE_THRESHOLD_DEFAULT,
    file_lines: dict[str, list[str]] | None = None,
) -> list[dict]:
    """block_merging.rs:131-290: per file (file-key order), blocks sorted by
    start, greedily absorb any unprocessed block that overlaps / is within
    ``threshold`` lines (comment-next-to-function gets 2x threshold). Scores
    take the max, block_unique_terms the max, total matches the sum,
    node_type from the better-ranked block; rank keeps the seed block's."""
    if not results:
        return results
    from collections import defaultdict

    by_file: dict[str, list[dict]] = defaultdict(list)
    for r in results:
        by_file[r["file"]].append(r)
    out: list[dict] = []
    for file_key in sorted(by_file):
        blocks = by_file[file_key]
        if len(blocks) == 1:
            out.append(blocks[0])
            continue
        blocks.sort(key=lambda b: b["start"])
        processed: set[int] = set()
        flines = (file_lines or {}).get(file_key)
        for i in range(len(blocks)):
            if i in processed:
                continue
            cur = dict(blocks[i])
            processed.add(i)
            changed = True
            while changed:
                changed = False
                for j in range(len(blocks)):
                    if j in processed:
                        continue
                    nxt = blocks[j]
                    if not _should_merge(cur, nxt, threshold):
                        continue
                    ms = min(cur["start"], nxt["start"])
                    me = max(cur["end"], nxt["end"])
                    code = _merge_code(cur, nxt, flines)
                    cur_rank = cur.get("rank")
                    nxt_rank = nxt.get("rank")
                    if (cur_rank if cur_rank is not None else 1 << 62) <= (
                        nxt_rank if nxt_rank is not None else 1 << 62
                    ):
                        node_type = cur["node_type"]
                    else:
                        node_type = nxt["node_type"]
                    # scores: max of each (block_merging.rs:546-576)
                    for key in ("score", "bm25_score"):
                        a, b = cur.get(key), nxt.get(key)
                        cur[key] = (
                            max(a, b) if a is not None and b is not None
                            else a if a is not None else b
                        )
                    a, b = cur.get("but"), nxt.get("but")
                    cur["but"] = (
                        max(a, b) if a is not None and b is not None
                        else a if a is not None else b
                    )
                    a, b = cur.get("total"), nxt.get("total")
                    cur["total"] = (
                        a + b if a is not None and b is not None
                        else a if a is not None else b
                    )
                    # matched_lines: union, re-based to the merged start
                    ml: set[int] = set()
                    for blk in (cur, nxt):
                        for off in blk.get("matched_lines") or []:
                            ml.add(blk["start"] + off - ms)
                    cur["matched_lines"] = sorted(ml)
                    kws = list(cur.get("matched_keywords") or [])
                    for kw in nxt.get("matched_keywords") or []:
                        if kw not in kws:
                            kws.append(kw)
                    cur["matched_keywords"] = sorted(kws)
                    cur["start"], cur["end"] = ms, me
                    cur["code"] = code
                    cur["node_type"] = node_type
                    processed.add(j)
                    changed = True
            out.append(cur)
    return out


# ---------------------------------------------------------------------------
# Early ranking + early termination (early_ranker.rs, search_runner.rs:892-
# 1208): when limits are set the reference does NOT extract blocks from
# every matched file — it ranks files by a cheap BM25-like early score,
# processes them in batches of min(100, estimate_files_needed(...)), and
# stops once the estimate is met or results exceed 2x max_results. The
# final block ranking then runs over the extracted subset only. These pure
# functions are shared by the engine and the oracle so both compute
# bit-identical early scores (same numpy ops, same order).
#
# Index-derived adaptation (documented deviations from early_ranker.rs):
# - tf comes from the index postings' presence nibbles (content-token
#   presence + path-token presence, each 0/1 after tokenize()'s dedup)
#   instead of the reference's matched-line-count proxy (which needs the
#   very line scan early ranking exists to avoid);
# - the filename component uses the path-token presence bit (the indexed
#   form of a filename match) instead of a raw substring test on the
#   basename;
# - scoring runs per tokenized KEYWORD (the same unit the block ranking
#   uses) rather than per raw query term;
# - ties in the score sort break by doc_id ascending (the reference's
#   order is Vec-iteration over a HashSet — nondeterministic).
# ---------------------------------------------------------------------------

EARLY_K1 = 1.2  # early_ranker.rs:36-37 (NOT the ranking BM25's 1.5/0.5)
EARLY_B = 0.75
EARLY_FILENAME_BOOST = 2.0  # early_ranker.rs:60
EARLY_MIN_FILES = 20  # early_ranker.rs MIN_FILES_TO_PROCESS
EARLY_AVG_RESULTS_PER_FILE = 2.5
EARLY_BATCH_SIZE = 100  # search_runner.rs:892 BATCH_SIZE


def estimate_files_needed(
    max_results: int | None, max_tokens: int | None,
    avg_tokens_per_result: int = 250,
) -> int:
    """Faithful port of early_ranker.rs estimate_files_needed: 1.5x-buffered
    limits, ~2.5 results/file, floor of 20 files."""
    import math

    result_limit = max_results if max_results is not None else 1000
    buffered_result_limit = math.ceil(result_limit * 1.5)
    files_for_results = math.ceil(
        buffered_result_limit / EARLY_AVG_RESULTS_PER_FILE
    )
    if max_tokens is not None:
        results_for_tokens = max_tokens // max(avg_tokens_per_result, 1)
        buffered_token_results = math.ceil(results_for_tokens * 1.5)
        files_for_tokens = math.ceil(
            buffered_token_results / EARLY_AVG_RESULTS_PER_FILE
        )
        return max(min(files_for_tokens, files_for_results), EARLY_MIN_FILES)
    return max(files_for_results, EARLY_MIN_FILES)


def early_rank_scores(
    eids, dls, term_stats: list[tuple], n_queries: int,
):
    """Early scores (early_ranker.rs:27-77) for the candidate docs ``eids``
    (sorted int64 doc ids) with doc lengths ``dls``. ``term_stats`` is one
    (doc_ids, ctf, ptf) triple per ranking keyword — sorted posting doc ids
    with content/path presence counts (entries whose ids fall outside
    ``eids`` are ignored; df/N/avgdl are computed over ``eids`` only).
    Returns the score vector aligned with ``eids``."""
    import numpy as np

    n = int(eids.size)
    score = np.zeros(n, dtype=np.float64)
    if n == 0:
        return score
    dls = np.asarray(dls, dtype=np.float64)
    avgdl = dls.mean() if dls.size else 1.0
    if avgdl <= 0:
        avgdl = 1.0
    length_norm = 1.0 - EARLY_B + EARLY_B * (dls / avgdl)
    matched = np.zeros(n, dtype=np.int64)
    for ids_t, ctf, ptf in term_stats:
        if ids_t.size == 0:
            continue
        pos = np.searchsorted(eids, ids_t)
        ok = (pos < n) & (eids[np.minimum(pos, n - 1)] == ids_t)
        pos = pos[ok]
        ctf = np.asarray(ctf, dtype=np.float64)[ok]
        ptf = np.asarray(ptf, dtype=np.float64)[ok]
        df = int(pos.size)
        if df == 0:
            continue
        idf = np.log((n + 1.0) / (df + 1.0))  # early_ranker.rs:23
        tf = ctf + ptf
        cmask = ctf > 0
        if cmask.any():
            cp = pos[cmask]
            score[cp] += idf * (
                (tf[cmask] * (EARLY_K1 + 1.0))
                / (tf[cmask] + EARLY_K1 * length_norm[cp])
            )
        pmask = ptf > 0
        if pmask.any():
            score[pos[pmask]] += idf * EARLY_FILENAME_BOOST
        matched[pos] += cmask.astype(np.int64) + pmask.astype(np.int64)
    # NOTE: a term matching in BOTH content and filename counts twice and
    # coverage is NOT clamped to 1.0 — this mirrors early_ranker.rs:68-74
    # exactly (content_matches.len() + filename_matched_terms.len(), no
    # min), which differs from the FINAL ranker's clamped coverage boost.
    coverage = matched / n_queries if n_queries else np.zeros(n)
    score *= 1.0 + coverage**1.5 * 2.0  # early_ranker.rs:69-75
    return score
