"""Secondary probe commands re-expressed over the corpus/docs table:
grep (src/grep.rs), extract (src/extract/, §4.2), symbols
(src/extract/symbols.rs), and the test-file detector
(src/language/test_detection.rs).

The reference's symbols/extract commands are tree-sitter based; tree-sitter
is not available in this environment, so `symbols` uses per-language regex
definitions for the function/class/type declarations of the five corpus
languages — the Ray-side plumbing (batch transform, schema, output layout)
is the real component, the recognizer is swappable.
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data as rd

_SYMBOL_PATTERNS = {
    # kind, regex with a 'name' group; line-anchored
    "rust": [
        ("function", re.compile(r"^\s*(?:pub\s+)?(?:async\s+)?fn\s+(?P<name>\w+)")),
        ("struct", re.compile(r"^\s*(?:pub\s+)?struct\s+(?P<name>\w+)")),
        ("enum", re.compile(r"^\s*(?:pub\s+)?enum\s+(?P<name>\w+)")),
        ("trait", re.compile(r"^\s*(?:pub\s+)?trait\s+(?P<name>\w+)")),
        ("impl", re.compile(r"^\s*impl(?:<[^>]*>)?\s+(?P<name>\w+)")),
    ],
    "python": [
        ("function", re.compile(r"^\s*(?:async\s+)?def\s+(?P<name>\w+)")),
        ("class", re.compile(r"^\s*class\s+(?P<name>\w+)")),
    ],
    "go": [
        # methods carry their receiver type: parent = the receiver
        # (symbols.rs qualifies methods under the type's SymbolNode)
        ("method", re.compile(
            r"^\s*func\s+\((?P<recv>[^)]*)\)\s*(?P<name>\w+)")),
        ("function", re.compile(r"^\s*func\s+(?P<name>\w+)")),
        ("type", re.compile(r"^\s*type\s+(?P<name>\w+)")),
    ],
    "javascript": [
        ("function", re.compile(r"^\s*(?:async\s+)?function\s+(?P<name>\w+)")),
        ("class", re.compile(r"^\s*class\s+(?P<name>\w+)")),
        ("const_fn", re.compile(r"^\s*(?:export\s+)?const\s+(?P<name>\w+)\s*=\s*(?:async\s*)?\(")),
        # class methods (incl. constructor/getters): only emitted when an
        # enclosing symbol is on the stack — see _NEEDS_PARENT
        ("method", re.compile(
            r"^\s*(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?"
            r"(?!if\b|for\b|while\b|switch\b|catch\b|return\b|else\b|do\b|new\b|function\b)"
            r"(?P<name>\w+)\s*\([^)]*\)?\s*{?\s*$")),
    ],
}
_SYMBOL_PATTERNS["typescript"] = [
    ("interface", re.compile(r"^\s*(?:export\s+)?interface\s+(?P<name>\w+)")),
    ("type", re.compile(r"^\s*(?:export\s+)?type\s+(?P<name>\w+)")),
] + [
    (k, rx) for k, rx in _SYMBOL_PATTERNS["javascript"] if k != "method"
] + [
    # ts methods/interface members may carry a return annotation and end
    # in ';' (interface) or '{' (class)
    ("method", re.compile(
        r"^\s*(?:public\s+|private\s+|protected\s+)?(?:static\s+)?"
        r"(?:async\s+)?(?:get\s+|set\s+)?"
        r"(?!if\b|for\b|while\b|switch\b|catch\b|return\b|else\b|do\b|new\b|function\b)"
        r"(?P<name>\w+)\s*\([^)]*\)?\s*(?::[^;{]*)?[;{]?\s*$")),
]

# (lang, kind) pairs only valid INSIDE another symbol's span (a bare
# `name(...) {` line at top level is a call, not a method)
_NEEDS_PARENT = {("javascript", "method"), ("typescript", "method")}
_SYMBOL_PATTERNS["java"] = [
    ("class", re.compile(
        r"^\s*(?:(?:public|private|protected|abstract|final|static)\s+)*"
        r"class\s+(?P<name>\w+)")),
    ("interface", re.compile(
        r"^\s*(?:(?:public|private|protected)\s+)*interface\s+(?P<name>\w+)")),
    ("enum", re.compile(
        r"^\s*(?:(?:public|private|protected)\s+)*enum\s+(?P<name>\w+)")),
    ("method", re.compile(
        r"^\s*(?:(?:public|private|protected|static|final|synchronized|"
        r"abstract|native)\s+)+[\w<>\[\],.\s]+?\s+(?P<name>\w+)\s*\(")),
    # constructor: modifiers then Capitalized name directly followed by '('
    # (no return type) — symbols.rs emits these as methods of the class
    ("method", re.compile(
        r"^\s*(?:(?:public|private|protected)\s+)+(?P<name>[A-Z]\w*)\s*\(")),
]
_SYMBOL_PATTERNS["c"] = [
    ("struct", re.compile(r"^\s*(?:typedef\s+)?struct\s+(?P<name>\w+)")),
    ("enum", re.compile(r"^\s*(?:typedef\s+)?enum\s+(?P<name>\w+)")),
    # function DEFINITION: return type + name( ... with no trailing ';'
    ("function", re.compile(
        r"^(?:static\s+|inline\s+)*[A-Za-z_][\w ]*[\w\*]\s+\*?"
        r"(?P<name>\w+)\s*\([^;]*$")),
]
_SYMBOL_PATTERNS["ruby"] = [
    ("method", re.compile(r"^\s*def\s+(?:self\.)?(?P<name>[\w?!]+)")),
    ("class", re.compile(r"^\s*class\s+(?P<name>\w+)")),
    ("module", re.compile(r"^\s*module\s+(?P<name>\w+)")),
]
# kinds mirror cpp.rs:40-49 acceptable parents (function_definition,
# struct/class/enum_specifier, namespace_definition); Foo::bar definitions
# qualify under Foo via the recv group, like Go receivers
_SYMBOL_PATTERNS["cpp"] = [
    ("namespace", re.compile(r"^\s*namespace\s+(?P<name>[\w:]+)")),
    ("class", re.compile(
        r"^\s*(?:template\s*<[^>]*>\s*)?class\s+(?P<name>\w+)")),
    ("struct", re.compile(
        r"^\s*(?:typedef\s+)?(?:template\s*<[^>]*>\s*)?struct\s+(?P<name>\w+)")),
    ("enum", re.compile(
        r"^\s*(?:typedef\s+)?enum\s+(?:class\s+)?(?P<name>\w+)")),
    # function DEFINITION: type [Qual::]name( ... with no ';' on the line
    ("function", re.compile(
        r"^\s*(?:(?:static|inline|virtual|constexpr|explicit|friend|extern)\s+)*"
        r"(?!return\b|throw\b|delete\b|new\b|case\b|else\b)"
        r"(?=[\w~])[\w:<>~&\*,\s]*?[\s\*&]"
        r"(?:(?P<recv>\w+)::)?(?P<name>~?\w+)\s*\([^;]*$")),
    # constructor inside a class/struct body: name == the class name
    ("function", re.compile(
        r"^\s*(?:explicit\s+)?(?P<name>[A-Z]\w*)\s*\([^;]*$"),
     frozenset({"ctor"})),
]
# csharp.rs:28-41 acceptable parents
_SYMBOL_PATTERNS["csharp"] = [
    ("namespace", re.compile(r"^\s*namespace\s+(?P<name>[\w.]+)")),
    ("class", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|static|sealed|"
        r"abstract|partial)\s+)*class\s+(?P<name>\w+)")),
    ("interface", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|partial)\s+)*"
        r"interface\s+(?P<name>\w+)")),
    ("struct", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|readonly|partial)\s+)*"
        r"struct\s+(?P<name>\w+)")),
    ("enum", re.compile(
        r"^\s*(?:(?:public|private|protected|internal)\s+)*"
        r"enum\s+(?P<name>\w+)")),
    ("method", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|static|virtual|"
        r"override|async|sealed|abstract|partial|new|extern)\s+)+"
        r"[\w<>\[\],.?\s]+?\s+(?P<name>\w+)\s*\(")),
    # constructor: modifiers then the class's own name directly before '('
    ("method", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|static)\s+)+"
        r"(?P<name>[A-Z]\w*)\s*\("), frozenset({"ctor"})),
    ("property", re.compile(
        r"^\s*(?:(?:public|private|protected|internal|static|virtual|"
        r"override)\s+)+[\w<>\[\],.?]+\s+(?P<name>\w+)\s*(?:\{\s*(?:get|set)|=>)")),
]
# php.rs:28-37 acceptable parents (method_declaration = function with
# visibility/static modifiers inside a class-like body)
_SYMBOL_PATTERNS["php"] = [
    ("class", re.compile(
        r"^\s*(?:(?:abstract|final)\s+)*class\s+(?P<name>\w+)")),
    ("interface", re.compile(r"^\s*interface\s+(?P<name>\w+)")),
    ("trait", re.compile(r"^\s*trait\s+(?P<name>\w+)")),
    ("method", re.compile(
        r"^\s*(?:(?:public|private|protected|static|abstract|final)\s+)+"
        r"function\s+(?P<name>\w+)")),
    ("function", re.compile(r"^\s*function\s+(?P<name>\w+)")),
]
# swift.rs:28-41 acceptable parents
_SYMBOL_PATTERNS["swift"] = [
    ("class", re.compile(
        r"^\s*(?:(?:public|private|internal|open|final|fileprivate)\s+)*"
        r"class\s+(?P<name>\w+)")),
    ("struct", re.compile(
        r"^\s*(?:(?:public|private|internal|open|fileprivate)\s+)*"
        r"struct\s+(?P<name>\w+)")),
    ("enum", re.compile(
        r"^\s*(?:(?:public|private|internal|open|fileprivate|indirect)\s+)*"
        r"enum\s+(?P<name>\w+)")),
    ("protocol", re.compile(
        r"^\s*(?:(?:public|private|internal|open)\s+)*"
        r"protocol\s+(?P<name>\w+)")),
    ("extension", re.compile(
        r"^\s*(?:(?:public|private|internal|open)\s+)*"
        r"extension\s+(?P<name>[\w.]+)")),
    ("typealias", re.compile(
        r"^\s*(?:(?:public|private|internal|open)\s+)*"
        r"typealias\s+(?P<name>\w+)")),
    ("function", re.compile(
        r"^\s*(?:(?:public|private|internal|open|fileprivate|static|"
        r"override|mutating|final|class)\s+)*func\s+(?P<name>\w+)")),
]
# markdown.rs: atx headings are the symbols; a section spans to the next
# heading of the same or a shallower level (see _symbol_end_line)
_SYMBOL_PATTERNS["markdown"] = [
    ("section", re.compile(r"^(?P<marker>#{1,6})\s+(?P<name>.+?)\s*$")),
]
# yaml.rs: key-value pairs; block span from indentation
_SYMBOL_PATTERNS["yaml"] = [
    ("key", re.compile(r"^\s*(?P<name>[A-Za-z0-9_.\-]+):(?:\s|$)")),
]
# solidity.rs:55-72 acceptable parents (contract/interface/library/
# function/constructor/modifier/fallback-receive/struct/enum/event/error/
# state_variable/user-defined type)
_SYMBOL_PATTERNS["solidity"] = [
    ("contract", re.compile(
        r"^\s*(?:abstract\s+)?contract\s+(?P<name>\w+)")),
    ("interface", re.compile(r"^\s*interface\s+(?P<name>\w+)")),
    ("library", re.compile(r"^\s*library\s+(?P<name>\w+)")),
    ("struct", re.compile(r"^\s*struct\s+(?P<name>\w+)")),
    ("enum", re.compile(r"^\s*enum\s+(?P<name>\w+)")),
    ("event", re.compile(r"^\s*event\s+(?P<name>\w+)")),
    ("error", re.compile(r"^\s*error\s+(?P<name>\w+)")),
    ("modifier", re.compile(r"^\s*modifier\s+(?P<name>\w+)")),
    ("constructor", re.compile(r"^\s*(?P<name>constructor)\s*\(")),
    ("function", re.compile(r"^\s*function\s+(?P<name>\w+)")),
    ("function", re.compile(r"^\s*(?P<name>fallback|receive)\s*\(")),
    ("state_variable", re.compile(
        r"^\s*(?:mapping\s*\([^;]*\)|uint\d*|int\d*|address|bool|string"
        r"|bytes\d*)\s+(?:(?:public|private|internal|constant|immutable"
        r"|override)\s+)*(?P<name>\w+)\s*(?:=[^=>]|;)")),
]
# crystal.rs:70-87 acceptable parents (end-keyword scoped like ruby; the
# shared indent heuristic approximates spans)
_SYMBOL_PATTERNS["crystal"] = [
    ("class", re.compile(r"^\s*(?:abstract\s+)?class\s+(?P<name>\w+)")),
    ("module", re.compile(r"^\s*module\s+(?P<name>\w+)")),
    ("struct", re.compile(r"^\s*(?:abstract\s+)?struct\s+(?P<name>\w+)")),
    ("enum", re.compile(r"^\s*enum\s+(?P<name>\w+)")),
    ("method", re.compile(
        r"^\s*(?:abstract\s+)?def\s+(?:self\.)?(?P<name>[\w?!]+)")),
    ("macro", re.compile(r"^\s*macro\s+(?P<name>\w+)")),
    ("lib", re.compile(r"^\s*lib\s+(?P<name>\w+)")),
    ("fun", re.compile(r"^\s*fun\s+(?P<name>\w+)")),
    ("alias", re.compile(r"^\s*alias\s+(?P<name>\w+)")),
    ("annotation", re.compile(r"^\s*annotation\s+(?P<name>\w+)")),
]
# haskell.rs:77-99 acceptable parents; a function symbol is its type
# signature line (the binding lines below it have no separate node here —
# the reference's "bind" kind needs the grammar); class/instance bodies
# span by indentation (`where` blocks indent)
_SYMBOL_PATTERNS["haskell"] = [
    ("data", re.compile(
        r"^\s*data\s+(?:family\s+|instance\s+)?(?P<name>\w+)")),
    ("newtype", re.compile(r"^\s*newtype\s+(?P<name>\w+)")),
    ("type", re.compile(
        r"^\s*type\s+(?:family\s+|instance\s+)?(?P<name>\w+)")),
    ("class", re.compile(r"^\s*class\s+(?:.*?=>\s*)?(?P<name>\w+)")),
    ("instance", re.compile(r"^\s*instance\s+(?:.*?=>\s*)?(?P<name>\w+)")),
    ("foreign", re.compile(
        r"^\s*foreign\s+(?:import|export)\b.*?\"[^\"]*\"\s+(?P<name>\w+)")),
    ("function", re.compile(r"^(?P<name>[a-z_][\w']*)\s*::")),
]
# html.rs:240-255 acceptable parents: structural/semantic container
# elements; the span runs to the matching close tag (tag-nesting count)
_SYMBOL_PATTERNS["html"] = [
    ("element", re.compile(
        r"^\s*<(?P<name>html|head|body|header|footer|nav|main|section|"
        r"article|aside|form|table|div|ul|ol|script|style)\b")),
]

_TEST_PATH_RE = re.compile(r"(^|/)tests?/|_test\.\w+$|\.test\.\w+$|^test_|/test_")
_TEST_CONTENT_RE = re.compile(r"#\[test\]|^\s*def test_|\bit\(|\bdescribe\(", re.M)


def is_test_file(path: str, content: str) -> bool:
    """Test-file detection (src/language/test_detection.rs semantics at file
    granularity): test-like path OR test markers in content."""
    return bool(_TEST_PATH_RE.search(path)) or bool(_TEST_CONTENT_RE.search(content))


def grep(docs: rd.Dataset, pattern: str, *, ignore_case: bool = True,
         max_line_len: int = 2000) -> rd.Dataset:
    """probe grep (src/grep.rs:13-29): regex line matches over the corpus.
    Lines longer than ``max_line_len`` chars are skipped during matching
    (ripgrep_searcher.rs:106-118). Returns (repo, path, line_no, line)."""
    flags = re.IGNORECASE if ignore_case else 0
    rx = re.compile(pattern, flags)

    def scan(batch: pa.Table) -> pa.Table:
        out = {"repo": [], "path": [], "line_no": [], "line": []}
        for repo, path, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            for i, line in enumerate(content.split("\n"), start=1):
                if len(line) > max_line_len:
                    continue
                if rx.search(line):
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["line_no"].append(i)
                    out["line"].append(line)
        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "line_no": pa.array(out["line_no"], pa.int32()),
                "line": pa.array(out["line"], pa.string()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


def extract(docs: rd.Dataset, repo: str, path: str, line: int | None = None,
            context: int | None = None, symbol: str | None = None) -> dict | None:
    """probe extract file.rs:42 / file.rs#symbol (src/extract/
    processor.rs:27-96): point lookup by (repo, path); with ``line`` and no
    explicit ``context``, the extracted unit is the FALLBACK CONTEXT BLOCK
    around that line (±5-line window — the reference extracts the enclosing
    AST block; unsupported languages fall back to the same windows the
    search path uses). An explicit ``context`` gives a plain ±context line
    slice. ``symbol`` extracts the NAMED symbol's span via the symbol
    recognizers (the file.rs#symbol form)."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        # vectorized point lookup — a per-row Python lambda filter walks
        # the whole corpus in the interpreter
        return batch.filter(pc.and_(
            pc.equal(batch.column("repo"), repo),
            pc.equal(batch.column("path"), path),
        ))

    rows = docs.map_batches(pick, batch_format="pyarrow").take(1)
    if not rows:
        return None
    row = rows[0]
    content = row["content"]
    if symbol is not None:
        lang = row.get("lang", "")
        lines = content.split("\n")
        for r in file_symbol_rows(lang, content):
            if r["name"] == symbol:
                return dict(
                    repo=repo, path=path, start_line=r["line_no"],
                    end_line=r["end_line"], symbol=symbol, kind=r["kind"],
                    code="\n".join(lines[r["line_no"] - 1 : r["end_line"]]),
                )
        return None
    if line is None:
        return dict(repo=repo, path=path, start_line=1,
                    end_line=content.count("\n") + 1, code=content)
    lines = content.split("\n")
    if context is None:
        from probe_ray.blocks import fallback_windows

        windows = fallback_windows({line}, len(lines))
        if windows:
            _, lo, hi = windows[0]
        else:
            lo = hi = min(max(1, line), len(lines))
    else:
        lo = max(1, line - context)
        hi = min(len(lines), line + context)
    return dict(repo=repo, path=path, start_line=lo, end_line=hi,
                code="\n".join(lines[lo - 1: hi]))


# indentation-scoped block ends; ruby/crystal are end-keyword scoped but
# follow indentation conventions, so the indent heuristic approximates
# their spans; haskell `where` blocks indent
_INDENT_LANGS = {"python", "ruby", "yaml", "crystal", "haskell"}

_MD_HEADING_RE = re.compile(r"^(#{1,6})\s")


def _symbol_end_line(lines: list[str], start_i: int, lang: str) -> int:
    """Block end for the declaration at 0-based line start_i
    (symbols.rs gets this from the tree-sitter node span; this is the
    regex-era approximation: brace counting for brace languages,
    indentation for python)."""
    n = len(lines)
    if lang == "markdown":
        # a section runs to the line before the next heading of the same
        # or a shallower level (markdown.rs section semantics)
        m = _MD_HEADING_RE.match(lines[start_i])
        level = len(m.group(1)) if m else 6
        for j in range(start_i + 1, n):
            m2 = _MD_HEADING_RE.match(lines[j])
            if m2 and len(m2.group(1)) <= level:
                return j
        return n
    if lang == "html":
        # an element spans to its matching close tag (same-tag nesting
        # count; a self-closing or same-line-closed element is one line)
        m = re.match(r"\s*<(\w+)", lines[start_i])
        tag = m.group(1) if m else ""
        open_rx = re.compile(rf"<{tag}\b(?![^>]*/>)")
        close_rx = re.compile(rf"</{tag}\s*>")
        depth = 0
        for j in range(start_i, n):
            depth += len(open_rx.findall(lines[j]))
            depth -= len(close_rx.findall(lines[j]))
            if depth <= 0:
                return j + 1
        return n
    if lang in _INDENT_LANGS:
        indent = len(lines[start_i]) - len(lines[start_i].lstrip())
        end = start_i
        for j in range(start_i + 1, n):
            l = lines[j]
            if not l.strip():
                continue
            if len(l) - len(l.lstrip()) <= indent:
                break
            end = j
        return end + 1
    depth = 0
    opened = False
    for j in range(start_i, n):
        for c in lines[j]:
            if c == "{":
                depth += 1
                opened = True
            elif c == "}":
                depth -= 1
                if opened and depth <= 0:
                    return j + 1
                if not opened and depth < 0:
                    # hit the ENCLOSING block's close before any open
                    # brace: a body-less declaration (protocol/interface
                    # member) ends on its own line
                    return start_i + 1
        if not opened and ";" in lines[j]:
            return j + 1  # declaration without a body (struct S;  type T = ...)
        if not opened and j - start_i > 2:
            return start_i + 1  # no block found near the declaration
    return n if opened else start_i + 1


# kinds whose declaration carries a parameter list worth extracting
_PARAM_KINDS = {"function", "method", "const_fn"}
# js/ts method emission (and every "ctor"-flagged pattern) additionally
# requires the IMMEDIATE parent to be one of these kinds (a bare
# name(...) outside a class body is a call, not a method)
_CLASS_LIKE = {"class", "interface", "struct"}


def _param_list(lines: list[str], start_i: int, name: str) -> str | None:
    """Parameter list of the declaration at 0-based line start_i: the text
    between the first '(' after the name and its balanced ')' — spanning
    up to 12 lines, whitespace-collapsed (symbols.rs reads this off the
    tree-sitter parameters node; this is the regex-era equivalent)."""
    text = "\n".join(lines[start_i : start_i + 12])
    at = text.find(name)
    if at < 0:
        return None
    open_i = text.find("(", at + len(name))
    if open_i < 0 or text[at + len(name) : open_i].strip():
        return None  # something other than a parameter list follows
    depth = 0
    for j in range(open_i, len(text)):
        c = text[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return re.sub(r"\s+", " ", text[open_i + 1 : j]).strip()
    return None


def file_symbol_rows(lang: str, content: str) -> list[dict]:
    """Per-file symbol walk shared by symbols() and extract(symbol=...):
    list of dicts (kind, name, line_no, end_line, signature, parent,
    depth, params); per-line "text" symbols for languages without a
    recognizer. ``parent`` is the ::-joined enclosing-symbol path; Go
    methods are qualified under their receiver type."""
    pats = _SYMBOL_PATTERNS.get(lang, [])
    lines = content.split("\n")
    rows: list[dict] = []
    if not pats:
        for i, line in enumerate(lines, start=1):
            rows.append(dict(kind="text", name="", line_no=i, end_line=i,
                             signature=line, parent="", depth=0, params=None))
        return rows
    stack: list[tuple[str, int, str]] = []  # (name, end_line, kind)
    for i, line in enumerate(lines, start=1):
        for pat in pats:
            kind, rx = pat[0], pat[1]
            flags = pat[2] if len(pat) > 2 else frozenset()
            m = rx.match(line)
            if not m:
                continue
            while stack and i > stack[-1][1]:
                stack.pop()
            needs_parent = "ctor" in flags or "needs_parent" in flags \
                or (lang, kind) in _NEEDS_PARENT
            if needs_parent and not (stack and stack[-1][2] in _CLASS_LIKE):
                break  # bare name(...) outside a class body is a call
            name = m.group("name")
            if "ctor" in flags and name != stack[-1][0]:
                break  # a constructor is named after its class
            end = _symbol_end_line(lines, i - 1, lang)
            parent = "::".join(nm for nm, _, _ in stack)
            recv = m.groupdict().get("recv")
            if recv:
                # go method receiver: `(c *Calculator)` -> parent Calculator
                recv_type = recv.split()[-1].lstrip("*&").strip()
                parent = (
                    f"{parent}::{recv_type}" if parent else recv_type
                )
            params = (
                _param_list(lines, i - 1, name)
                if kind in _PARAM_KINDS
                else None
            )
            rows.append(dict(
                kind=kind, name=name, line_no=i, end_line=end,
                signature=line.strip(), parent=parent,
                depth=len(stack), params=params,
            ))
            stack.append((name, end, kind))
            break
    return rows


def symbols(docs: rd.Dataset, *, allow_tests: bool = True) -> rd.Dataset:
    """probe symbols (src/extract/symbols.rs): per-file symbol table with
    the reference's SymbolNode fields flattened — (repo, path, lang, kind,
    name, line_no, end_line, signature, parent, depth). ``parent`` is the
    ::-joined enclosing-symbol path (the reference nests children under a
    SymbolNode tree; a table flattens that tree). Files whose language has
    no recognizer fall back to per-line "text" symbols
    (extract_plain_text_symbols, symbols.rs:110-130). Recognizers are
    regex-based (tree-sitter unavailable; swap point documented)."""

    def scan(batch: pa.Table) -> pa.Table:
        out = {"repo": [], "path": [], "lang": [], "kind": [], "name": [],
               "line_no": [], "end_line": [], "signature": [], "parent": [],
               "depth": [], "params": []}

        def emit(repo, path, lang, kind, name, line_no, end_line, sig,
                 parent, depth, params):
            out["repo"].append(repo)
            out["path"].append(path)
            out["lang"].append(lang)
            out["kind"].append(kind)
            out["name"].append(name)
            out["line_no"].append(line_no)
            out["end_line"].append(end_line)
            out["signature"].append(sig)
            out["parent"].append(parent)
            out["depth"].append(depth)
            out["params"].append(params)

        for repo, path, lang, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            if not allow_tests and is_test_file(path, content):
                continue
            for r in file_symbol_rows(lang, content):
                emit(repo, path, lang, r["kind"], r["name"], r["line_no"],
                     r["end_line"], r["signature"], r["parent"], r["depth"],
                     r["params"])
        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "kind": pa.array(out["kind"], pa.string()),
                "name": pa.array(out["name"], pa.string()),
                "line_no": pa.array(out["line_no"], pa.int32()),
                "end_line": pa.array(out["end_line"], pa.int32()),
                "signature": pa.array(out["signature"], pa.string()),
                "parent": pa.array(out["parent"], pa.string()),
                "depth": pa.array(out["depth"], pa.int32()),
                "params": pa.array(out["params"], pa.string()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Structural pattern query (probe query / ast-grep fallback — M13)
# ---------------------------------------------------------------------------

_METAVAR_MULTI = re.compile(r"\$\$\$(?:[A-Z_][A-Z0-9_]*)?")
_METAVAR_SINGLE = re.compile(r"\$([A-Z_][A-Z0-9_]*)")


def compile_structural_pattern(pattern: str) -> re.Pattern:
    """Translate an ast-grep-style pattern (src/query.rs:32-46;
    `probe query 'fn $NAME($$$)'`) into a regex:

    - ``$$$`` / ``$$$ARGS``  -> non-greedy any-text (incl. newlines),
    - ``$NAME``              -> a named identifier capture,
    - literal text escaped; runs of whitespace match flexibly (ast-grep is
      whitespace-insensitive between tokens).

    DOCUMENTED FALLBACK: the reference matches against the tree-sitter AST
    (structural equality); this translation matches the same programs
    textually and is the swap point for a real ast-grep when grammars are
    available. Repeated ``$NAME`` occurrences are enforced equal via
    backreferences, mirroring ast-grep metavariable unification.
    """
    out: list[str] = []
    seen_names: set[str] = set()
    i = 0
    while i < len(pattern):
        m = _METAVAR_MULTI.match(pattern, i)
        if m:
            out.append(r"[\s\S]*?")
            i = m.end()
            continue
        m = _METAVAR_SINGLE.match(pattern, i)
        if m:
            name = m.group(1)
            if name in seen_names:
                out.append(f"(?P={name})")  # unification: same text
            else:
                out.append(f"(?P<{name}>[A-Za-z_][A-Za-z0-9_]*)")
                seen_names.add(name)
            i = m.end()
            continue
        ch = pattern[i]
        if ch.isspace():
            while i < len(pattern) and pattern[i].isspace():
                i += 1
            out.append(r"\s+")
            continue
        out.append(re.escape(ch))
        i += 1
    rx = re.compile("".join(out))
    if rx.match(""):  # degenerate all-metavariable pattern
        raise ValueError(
            "structural pattern must contain literal text besides "
            "metavariables (got a pattern matching the empty string)"
        )
    return rx


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_OPENERS = {"(": ")", "[": "]", "{": "}"}
_CLOSERS = {")", "]", "}"}


def _lit_regex(text: str) -> re.Pattern:
    parts: list[str] = []
    i = 0
    while i < len(text):
        if text[i].isspace():
            while i < len(text) and text[i].isspace():
                i += 1
            parts.append(r"\s+")
        else:
            parts.append(re.escape(text[i]))
            i += 1
    return re.compile("".join(parts))


def parse_structural_pattern(pattern: str) -> list[tuple[str, object]]:
    """ast-grep-style pattern -> segment list:
    ('lit', compiled regex with flexible whitespace) | ('var', NAME) |
    ('multi', None). Raises on degenerate all-metavariable patterns."""
    segs: list[tuple[str, object]] = []
    lit: list[str] = []
    i = 0

    def flush() -> None:
        if lit:
            segs.append(("lit", "".join(lit)))
            lit.clear()

    while i < len(pattern):
        m = _METAVAR_MULTI.match(pattern, i)
        if m:
            flush()
            segs.append(("multi", None))
            i = m.end()
            continue
        m = _METAVAR_SINGLE.match(pattern, i)
        if m:
            flush()
            segs.append(("var", m.group(1)))
            i = m.end()
            continue
        lit.append(pattern[i])
        i += 1
    flush()
    if not any(
        k == "var" or (k == "lit" and str(v).strip()) for k, v in segs
    ):
        raise ValueError(
            "structural pattern must contain literal text besides "
            "metavariables (got a pattern matching the empty string)"
        )
    return [
        ("lit", _lit_regex(v)) if k == "lit" else (k, v) for k, v in segs
    ]


def _match_segments(content: str, pos: int, segs, si: int, caps: dict):
    """Match segments at pos; returns the end offset or None. ``$$$``
    consumes lazily but BALANCED: it never crosses an unmatched closing
    delimiter, and nested delimiters are skipped whole — the nesting
    fidelity a plain regex translation cannot provide (the remaining
    deviation vs ast-grep is token- vs AST-level equality)."""
    if si == len(segs):
        return pos
    kind, v = segs[si]
    if kind == "lit":
        m = v.match(content, pos)
        if not m:
            return None
        return _match_segments(content, m.end(), segs, si + 1, caps)
    if kind == "var":
        m = _IDENT_RE.match(content, pos)
        if not m:
            return None
        if v in caps:
            if caps[v] != m.group(0):  # metavariable unification
                return None
            return _match_segments(content, m.end(), segs, si + 1, caps)
        caps[v] = m.group(0)
        r = _match_segments(content, m.end(), segs, si + 1, caps)
        if r is None:
            del caps[v]
        return r
    # multi ($$$): lazy balanced scan
    depth = 0
    j = pos
    n = len(content)
    while True:
        if depth == 0:
            r = _match_segments(content, j, segs, si + 1, caps)
            if r is not None:
                return r
        if j >= n:
            return None
        c = content[j]
        if c in _OPENERS:
            depth += 1
        elif c in _CLOSERS:
            if depth == 0:
                return None  # would escape the enclosing scope
            depth -= 1
        j += 1


def finditer_structural(
    segs, content: str
) -> list[tuple[int, int, dict]]:
    """Non-overlapping leftmost matches of a parsed structural pattern."""
    results: list[tuple[int, int, dict]] = []
    pos = 0
    first = segs[0]
    n = len(content)
    while pos <= n:
        if first[0] == "lit":
            m = first[1].search(content, pos)
            if not m:
                break
            start = m.start()
        else:
            start = pos
        caps: dict = {}
        end = _match_segments(content, start, segs, 0, caps)
        if end is not None and end > start:
            results.append((start, end, caps))
            pos = end
        else:
            pos = start + 1
    return results


def structural_query(docs: rd.Dataset, pattern: str, *,
                     language: str | None = None,
                     max_results: int | None = None) -> pa.Table:
    """probe query fallback: match a structural pattern over the corpus,
    returning (repo, path, line_start, line_end, matched_text, captures)
    like query.rs AstMatch (byte offsets mapped to lines). Distributed scan
    via map_batches; the per-batch function runs the balanced segment
    matcher (``$$$`` respects delimiter nesting; repeated ``$NAME`` unify).
    DOCUMENTED FALLBACK: the reference matches tree-sitter ASTs; this is
    token-level matching with balanced delimiters — the swap point for a
    real ast-grep when grammars are available."""
    segs = parse_structural_pattern(pattern)

    def scan(batch: pa.Table) -> pa.Table:
        out = {"repo": [], "path": [], "line_start": [], "line_end": [],
               "matched_text": [], "captures": []}
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.schema.names else [None] * batch.num_rows
        )
        for repo, path, lang, content in zip(
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            langs,
            batch.column("content").to_pylist(),
        ):
            if language is not None and lang != language:
                continue
            for start, end, capd in finditer_structural(segs, content):
                line_start = content.count("\n", 0, start) + 1
                line_end = content.count("\n", 0, end) + 1
                caps = sorted(f"{k}={v}" for k, v in capd.items())
                out["repo"].append(repo)
                out["path"].append(path)
                out["line_start"].append(line_start)
                out["line_end"].append(line_end)
                out["matched_text"].append(content[start:end])
                out["captures"].append(caps)
        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "line_start": pa.array(out["line_start"], pa.int32()),
                "line_end": pa.array(out["line_end"], pa.int32()),
                "matched_text": pa.array(out["matched_text"], pa.string()),
                "captures": pa.array(out["captures"], pa.list_(pa.string())),
            }
        )

    ds = docs.map_batches(scan, batch_format="pyarrow")
    ds = ds.sort(["repo", "path", "line_start"])
    if max_results is not None:
        ds = ds.limit(max_results)
    batches = [b for b in ds.iter_batches(batch_format="pyarrow") if b.num_rows]
    if batches:
        return pa.concat_tables(batches)
    return pa.table(
        {"repo": pa.array([], pa.string()), "path": pa.array([], pa.string()),
         "line_start": pa.array([], pa.int32()),
         "line_end": pa.array([], pa.int32()),
         "matched_text": pa.array([], pa.string()),
         "captures": pa.array([], pa.list_(pa.string()))}
    )
