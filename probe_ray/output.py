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


def _parse_diff_lines(diff_text: str) -> dict[str, list[dict]]:
    """outline_diff_formatter.rs:445-560 parse_diff: per file, the hunk
    lines as dicts (kind, old_no, new_no, text) with BOTH counters
    tracked. The hunk header's old/new line COUNTS bound each hunk
    (exactly how git disambiguates '-'-leading content from trailers);
    '\\ No newline' markers are skipped."""
    from probe_ray.inputs import _DIFF_HEADER_RE, _HUNK_HEADER_RE

    out: dict[str, list[dict]] = {}
    cur: list[dict] | None = None
    old_no = new_no = 0
    rem_old = rem_new = 0
    for line in diff_text.split("\n"):
        m = _DIFF_HEADER_RE.match(line)
        if m:
            cur = out.setdefault(m.group(2), [])
            rem_old = rem_new = 0
            continue
        h = _HUNK_HEADER_RE.match(line)
        if h and cur is not None:
            old_no, new_no = int(h.group(1)), int(h.group(3))
            rem_old = int(h.group(2) or 1)
            rem_new = int(h.group(4) or 1)
            continue
        if cur is None or (rem_old <= 0 and rem_new <= 0):
            continue  # outside any hunk
        if line.startswith("\\"):
            continue  # '\ No newline at end of file'
        if line.startswith("+"):
            cur.append(dict(kind="add", old_no=None, new_no=new_no,
                            text=line[1:]))
            new_no += 1
            rem_new -= 1
        elif line.startswith("-"):
            cur.append(dict(kind="remove", old_no=old_no, new_no=None,
                            text=line[1:]))
            old_no += 1
            rem_old -= 1
        elif line.startswith(" ") or (
            line == "" and rem_old > 0 and rem_new > 0
        ):
            # "" inside a counted hunk = an empty context line whose
            # trailing space was stripped by an editor/transport
            cur.append(dict(kind="context", old_no=old_no, new_no=new_no,
                            text=line[1:] if line else ""))
            old_no += 1
            new_no += 1
            rem_old -= 1
            rem_new -= 1
    return out


def _coalesce_replacements(lines: list[dict]) -> list[tuple]:
    """outline_diff_formatter.rs:52-105: pair contiguous removes with the
    adds that follow into ('replace', old, new) ops; leftovers stay
    plain ('remove', dl) / ('add', dl); context passes through."""
    ops: list[tuple] = []
    i = 0
    while i < len(lines):
        if lines[i]["kind"] == "remove":
            r0 = i
            while i < len(lines) and lines[i]["kind"] == "remove":
                i += 1
            a0 = i
            while i < len(lines) and lines[i]["kind"] == "add":
                i += 1
            removes, adds = lines[r0:a0], lines[a0:i]
            k = min(len(removes), len(adds))
            ops.extend(("replace", removes[j], adds[j]) for j in range(k))
            ops.extend(("remove", r) for r in removes[k:])
            ops.extend(("add", a) for a in adds[k:])
        elif lines[i]["kind"] == "add":
            ops.append(("add", lines[i]))
            i += 1
        else:
            ops.append(("context", lines[i]))
            i += 1
    return ops


def format_outline_diff(table: pa.Table, raw_diff: str | None = None) -> str:
    """Outline-diff view (src/extract/outline_diff_formatter.rs:112-255):
    the extracted blocks re-rendered AS a unified diff — per file a
    `diff --git` header, per block a `@@` hunk whose context is the
    block's first code line, and a line-numbered gutter where changed
    lines carry +/- (contiguous remove/add runs coalesced into
    replacement pairs). Without ``raw_diff`` every line renders as
    context (test_outline_diff_with_no_diff semantics).

    Contract: like the reference (which reads the WORKING TREE after the
    diff was applied), the corpus is expected to hold the POST-diff
    content, so extracted code lines align with the diff's new-side line
    numbers; removed lines exist only in the diff and render from its
    ops. Files are grouped per (repo, path) — the same path in two repos
    yields two diff sections."""
    from collections import defaultdict

    if table.num_rows == 0:
        return "No results found.\n"
    diff_by_file = _parse_diff_lines(raw_diff) if raw_diff else {}

    by_file: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for r in _rows(table):
        by_file[(r["repo"], r["path"])].append(r)

    out: list[str] = []
    for repo, path in sorted(by_file):
        out.append(f"diff --git a/{path} b/{path}")
        out.append("index 00000000..11111111 100644")
        out.append(f"--- a/{path}")
        out.append(f"+++ b/{path}")
        dlines = diff_by_file.get(path, [])
        ops = _coalesce_replacements(dlines)
        # index render ops by the NEW line they anchor to: a leftover
        # remove anchors AFTER the previous rendered line (trailing
        # removes then print inside the block instead of vanishing);
        # leading removes anchor to the next op's line
        by_new: dict[int, list[tuple]] = defaultdict(list)
        pending: list[tuple] = []
        last_new: int | None = None
        for op in ops:
            anchor = op[2]["new_no"] if op[0] == "replace" else op[1]["new_no"]
            if anchor is None:
                if last_new is not None:
                    by_new[last_new].append(op)
                else:
                    pending.append(op)
                continue
            by_new[anchor].extend(pending)
            pending = []
            by_new[anchor].append(op)
            last_new = anchor
        width = max(
            (r["end_line"] for r in by_file[(repo, path)]),
            default=1,
        )
        width = max(width, max(
            (dl["old_no"] or 0 for dl in dlines), default=0
        ))
        width = len(str(width))

        def emit(num, prefix, text):
            out.append(f"{num:>{width}}{prefix} {text}")

        for r in sorted(by_file[(repo, path)], key=lambda x: x["start_line"]):
            code_lines = r["code"].split("\n") if r["code"] else []
            span = r["end_line"] - r["start_line"] + 1
            context = code_lines[0].strip() if code_lines else ""
            out.append(
                f"@@ -{r['start_line']},{span} +{r['start_line']},{span} "
                f"@@ {context}"
            )
            for off in range(span):
                n = r["start_line"] + off
                rendered = False
                for op in by_new.get(n, []):
                    if op[0] == "replace":
                        emit(op[1]["old_no"], "-", op[1]["text"])
                        emit(op[2]["new_no"], "+", op[2]["text"])
                        rendered = True
                    elif op[0] == "remove":
                        emit(op[1]["old_no"], "-", op[1]["text"])
                    elif op[0] == "add":
                        emit(op[1]["new_no"], "+", op[1]["text"])
                        rendered = True
                    else:
                        emit(op[1]["new_no"], " ", op[1]["text"])
                        rendered = True
                if not rendered and off < len(code_lines):
                    emit(n, " ", code_lines[off])
    return "\n".join(out)


FORMATS = {
    "json": format_json,
    "xml": format_xml,
    "terminal": format_terminal,
    "outline": format_outline,
    "outline-diff": format_outline_diff,
}


def format_results(table: pa.Table, fmt: str = "terminal") -> str:
    try:
        return FORMATS[fmt](table)
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; choose from {sorted(FORMATS)}")
