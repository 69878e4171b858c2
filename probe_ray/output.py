"""Output formatters (S4): render result tables in the reference's
surface formats — json / xml / plain terminal — over the engine's Arrow
result tables (document- or block-granularity).

Mirrors the field layout of search_output.rs:570-660 (JSON: file, lines
[start, end], node_type, code, matched_keywords, score, bm25_score) and
search_output.rs:1077-1160 (XML: <probe_results><result>...), minus the
tree-sitter-derived enrichment fields (scope/owner symbols/LSP — those
layers are out of scope, SURVEY.md §7.6). Terminal format follows the
plain (non-color) layout: `file:start-end` header + code body.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape

import pyarrow as pa


def _rows(table: pa.Table) -> list[dict]:
    rows = table.to_pylist()
    for r in rows:
        # document-granularity results have no span columns; a whole-file
        # hit renders as lines [1, 1] like the reference's filename matches
        r.setdefault("start_line", 1)
        r.setdefault("end_line", 1)
        r.setdefault("node_type", "file")
        r.setdefault("code", "")
        if "matched_keywords" not in r:
            r["matched_keywords"] = r.get("matched_terms", [])
    return rows


def _file_key(r: dict) -> str:
    return f"{r['repo']}/{r['path']}"


def format_json(table: pa.Table) -> str:
    """search_output.rs:570-808 JSON shape (summary wrapper + results)."""
    rows = _rows(table)
    results = [
        {
            "file": _file_key(r),
            "lines": [r["start_line"], r["end_line"]],
            "node_type": r["node_type"],
            "code": r["code"],
            "matched_keywords": list(r["matched_keywords"]),
            "rank": r.get("rank"),
            "score": r.get("score"),
            "bm25_score": r.get("bm25_score"),
        }
        for r in rows
    ]
    from probe_ray.oracle import estimate_tokens

    # surrogatepass matches the n_code_bytes semantics used throughout the
    # block path (lone surrogates in scraped content must not raise).
    byte_lens = [len(r["code"].encode("utf-8", "surrogatepass")) for r in rows]
    wrapper = {
        "results": results,
        "summary": {
            "count": len(results),
            "total_bytes": sum(byte_lens),
            "total_tokens": sum(estimate_tokens(b) for b in byte_lens),
        },
    }
    return json.dumps(wrapper, indent=2)


def format_xml(table: pa.Table) -> str:
    """search_output.rs:1077-1160 XML shape."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>', "<probe_results>"]
    for r in _rows(table):
        out.append("  <result>")
        out.append(f"    <file>{escape(_file_key(r))}</file>")
        out.append(f"    <lines>{r['start_line']}-{r['end_line']}</lines>")
        out.append(f"    <node_type>{escape(r['node_type'])}</node_type>")
        if r["matched_keywords"]:
            out.append("    <matched_keywords>")
            for kw in r["matched_keywords"]:
                out.append(f"      <keyword>{escape(kw)}</keyword>")
            out.append("    </matched_keywords>")
        if r.get("score") is not None:
            out.append(f"    <score>{r['score']:.4f}</score>")
        if r.get("bm25_score") is not None:
            out.append(f"    <bm25_score>{r['bm25_score']:.4f}</bm25_score>")
        out.append(f"    <code>{escape(r['code'])}</code>")
        out.append("  </result>")
    out.append("</probe_results>")
    return "\n".join(out)


def format_terminal(table: pa.Table) -> str:
    """Plain (non-color) terminal layout: header line + code block per
    result, separated by blank lines (search_output.rs plain branch)."""
    parts = []
    for r in _rows(table):
        rank = f" (rank {r['rank']})" if r.get("rank") is not None else ""
        header = f"{_file_key(r)}:{r['start_line']}-{r['end_line']}{rank}"
        parts.append(header + ("\n" + r["code"] if r["code"] else ""))
    return "\n\n".join(parts)


def format_outline(table: pa.Table) -> str:
    """Outline view (search_output.rs:2659-2830): results grouped per file
    (file order), sorted by start line within a file; a `File:` header once
    per file, then each block's span with its matched lines highlighted as
    `line_no: text` (first line of the block when no matched lines)."""
    from collections import defaultdict

    by_file: dict[str, list[dict]] = defaultdict(list)
    for r in _rows(table):
        by_file[_file_key(r)].append(r)
    out: list[str] = []
    for file_key in sorted(by_file):
        blocks = sorted(by_file[file_key], key=lambda r: r["start_line"])
        if out:
            out.append("")
        out.append("---")
        out.append(f"File: {file_key}")
        for r in blocks:
            lines = r["code"].split("\n") if r["code"] else []
            matched = r.get("matched_lines") or []
            out.append(f"{r['start_line']}-{r['end_line']} [{r['node_type']}]")
            shown = matched if matched else ([0] if lines else [])
            for off in shown:
                if 0 <= off < len(lines):
                    out.append(f"  {r['start_line'] + off}: {lines[off]}")
    return "\n".join(out)


FORMATS = {
    "json": format_json,
    "xml": format_xml,
    "terminal": format_terminal,
    "outline": format_outline,
}


def format_results(table: pa.Table, fmt: str = "terminal") -> str:
    try:
        return FORMATS[fmt](table)
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; choose from {sorted(FORMATS)}")
