"""Input-source layer (src/extract/file_paths.rs): file references from
free text, git diffs, and CLI arguments, resolved against the corpus."""
import pyarrow as pa
import ray.data as rd
import pytest

from probe_ray.inputs import (
    extract_from_text,
    is_git_diff_format,
    is_likely_file_path,
    parse_file_references,
    parse_file_with_line,
    parse_git_diff,
)


def _paths(refs):
    return [r["path"] for r in refs]


def test_text_refs_precedence_and_forms():
    """file_paths.rs:275-727: symbol > range > line(:col) > bare, one
    reference per path except multiple #symbols."""
    text = (
        "error in src/main.rs:10:5\n"
        "see src/lib.rs:1-60 and src/lib.rs:9 (already claimed by range)\n"
        "also api/handler.go#ServeHTTP api/handler.go#Close\n"
        "plain mention of docs/readme.md here\n"
    )
    refs = parse_file_references(text)
    by_path = {}
    for r in refs:
        by_path.setdefault(r["path"], []).append(r)
    assert [(r["start_line"], r["end_line"]) for r in by_path["src/main.rs"]] \
        == [(10, None)]
    assert [(r["start_line"], r["end_line"]) for r in by_path["src/lib.rs"]] \
        == [(1, 60)]
    assert sorted(r["symbol"] for r in by_path["api/handler.go"]) \
        == ["Close", "ServeHTTP"]
    assert by_path["docs/readme.md"][0]["symbol"] is None
    assert by_path["docs/readme.md"][0]["start_line"] is None


def test_text_refs_markdown_and_quotes():
    """file_paths.rs:1207-1430 test family: paths wrapped in markdown
    bold/italic/strikethrough/backticks/quotes are found; apostrophes
    inside words don't open a quote."""
    text = (
        "Here's the fix: **src/bold.rs:3** and *src/ital.py* and "
        "~~src/gone.go~~ and `src/tick.ts:7-9` and 'src/sq.c' and "
        '"src/dq.rb"'
    )
    got = set(_paths(parse_file_references(text)))
    assert got == {
        "src/bold.rs", "src/ital.py", "src/gone.go", "src/tick.ts",
        "src/sq.c", "src/dq.rb",
    }
    refs = {r["path"]: r for r in parse_file_references(text)}
    assert (refs["src/bold.rs"]["start_line"],
            refs["src/tick.ts"]["start_line"],
            refs["src/tick.ts"]["end_line"]) == (3, 7, 9)


def test_text_refs_code_construct_filtering():
    """file_paths.rs:16-56 + 1601-1631: self.value / array.length /
    each.value are code constructs, not paths; real extensions pass."""
    assert not is_likely_file_path("self.value")
    assert not is_likely_file_path("config.name")
    assert not is_likely_file_path("array.length")
    assert is_likely_file_path("main.tf")
    assert is_likely_file_path("path/to/data.value")  # separator wins
    text = "set local.name and data.count then edit deploy.tf and lib.rs"
    got = set(_paths(parse_file_references(text)))
    assert "deploy.tf" in got and "lib.rs" in got
    assert "local.name" not in got and "data.count" not in got


def test_text_refs_allow_tests_filter():
    text = "see tests/test_foo.py:3 and src/foo.py:3"
    assert set(_paths(parse_file_references(text, allow_tests=False))) \
        == {"src/foo.py"}
    assert set(_paths(parse_file_references(text))) \
        == {"tests/test_foo.py", "src/foo.py"}


def test_parse_file_with_line_forms():
    """file_paths.rs:732-1090: the CLI argument forms."""
    assert parse_file_with_line("a/b.rs")[0] == dict(
        path="a/b.rs", start_line=None, end_line=None, symbol=None,
        lines=None, bare=False)
    assert parse_file_with_line("a/b.rs:10")[0]["start_line"] == 10
    r = parse_file_with_line("a/b.rs:1-60")[0]
    assert (r["start_line"], r["end_line"]) == (1, 60)
    assert parse_file_with_line("a/b.rs:10:5")[0]["start_line"] == 10
    assert parse_file_with_line("a/b.rs#run")[0]["symbol"] == "run"
    assert parse_file_with_line("tests/t_test.go:3", allow_tests=False) == []


def test_git_diff_parsing():
    """file_paths.rs:94-258: per-file added-line sets from '+' lines
    walked with the new-side counter; first header wins; no-'+' files
    dropped."""
    diff = (
        "diff --git a/src/a.rs b/src/a.rs\n"
        "--- a/src/a.rs\n"
        "+++ b/src/a.rs\n"
        "@@ -45,7 +45,7 @@\n"
        " ctx\n"
        "-old line\n"
        "+new line\n"
        " ctx\n"
        "@@ -90 +91,2 @@\n"
        "+added one\n"
        "+added two\n"
        "diff --git a/src/b.rs b/src/b.rs\n"
        "@@ -1,3 +1,3 @@\n"
        " unchanged\n"
        "-removed\n"
        " unchanged\n"
    )
    assert is_git_diff_format(diff)
    assert not is_git_diff_format("just text")
    refs = parse_git_diff(diff)
    assert _paths(refs) == ["src/a.rs"]  # b.rs has no '+' lines
    r = refs[0]
    # hunk 1: ctx@45, -old, +new@46 ; hunk 2: +91, +92
    assert r["lines"] == [46, 91, 92]
    assert (r["start_line"], r["end_line"]) == (46, 92)


def test_git_diff_test_file_filter():
    diff = (
        "diff --git a/tests/x_test.go b/tests/x_test.go\n"
        "@@ -1 +1 @@\n"
        "+added\n"
    )
    assert parse_git_diff(diff, allow_tests=False) == []
    assert _paths(parse_git_diff(diff)) == ["tests/x_test.go"]


@pytest.fixture(scope="module")
def corpus():
    rows = {
        "src/calc.py": "class Calc:\n    def add(self, x, y):\n"
                       "        return x + y\n\n\ndef helper(a):\n"
                       "    return a\n",
        "src/util.py": "\n".join(f"line {i}" for i in range(1, 31)) + "\n",
        "docs/readme.md": "hello\nworld\n",
        "tests/test_calc.py": "def test_add():\n    pass\n",
    }
    return rd.from_arrow(pa.table({
        "repo": ["r"] * len(rows),
        "path": list(rows),
        "lang": ["python", "python", "text", "python"],
        "content": list(rows.values()),
    }))


def test_extract_from_text_ranges_and_symbols(corpus):
    text = "check src/util.py:5-8, then src/calc.py#add and docs/readme.md"
    tbl = extract_from_text(corpus, text)
    rows = {(r["path"], r["kind"]): r for r in tbl.to_pylist()}
    rng = rows[("src/util.py", "range")]
    assert (rng["start_line"], rng["end_line"]) == (5, 8)
    assert rng["code"] == "line 5\nline 6\nline 7\nline 8"
    sym = rows[("src/calc.py", "function")]
    assert sym["symbol"] == "add" and sym["start_line"] == 2
    whole = rows[("docs/readme.md", "file")]
    assert whole["code"] == "hello\nworld\n"


def test_extract_from_text_single_line_context(corpus):
    """A single line extracts the fallback context block around it
    (processor.rs: enclosing block; unsupported-language ±5 windows)."""
    tbl = extract_from_text(corpus, "boom at src/util.py:15")
    r = tbl.to_pylist()[0]
    assert r["kind"] == "context"
    assert r["start_line"] <= 15 <= r["end_line"]
    assert "line 15" in r["code"]


def test_extract_from_text_diff_glob_and_tests(corpus):
    diff = (
        "diff --git a/src/util.py b/src/util.py\n"
        "@@ -3,2 +3,2 @@\n"
        "+line 3\n"
        " line 4\n"
        "diff --git a/tests/test_calc.py b/tests/test_calc.py\n"
        "@@ -1 +1 @@\n"
        "+def test_add():\n"
    )
    tbl = extract_from_text(corpus, diff, allow_tests=False)
    assert [r["path"] for r in tbl.to_pylist()] == ["src/util.py"]
    # glob resolution against corpus paths (backticked: a bare * in free
    # text is consumed as markdown italic — file_paths.rs:305-317 — so
    # globs survive only inside quotes/backticks, as in the reference)
    tbl = extract_from_text(corpus, "look at `src/*.py:1-2` please")
    assert sorted({r["path"] for r in tbl.to_pylist()}) \
        == ["src/calc.py", "src/util.py"]
    # bare filename -> basename membership in the corpus
    tbl = extract_from_text(corpus, "the readme.md file explains it")
    assert [r["path"] for r in tbl.to_pylist()] == ["docs/readme.md"]
    # no refs -> empty typed table
    empty = extract_from_text(corpus, "nothing here")
    assert empty.num_rows == 0 and "code" in empty.schema.names


def test_git_diff_no_newline_marker():
    r"""'\ No newline at end of file' markers must not advance the
    new-side line counter (they are metadata, not content)."""
    diff = (
        "diff --git a/src/a.txt b/src/a.txt\n"
        "@@ -1,2 +1,2 @@\n"
        " keep\n"
        "-old\n"
        "\\ No newline at end of file\n"
        "+new\n"
        "\\ No newline at end of file\n"
    )
    refs = parse_git_diff(diff)
    assert refs[0]["lines"] == [2]


def test_brace_glob_expansion(corpus):
    """{a,b} alternation (the reference's glob crate supports it; fnmatch
    needs explicit expansion) via the CLI argument form."""
    from probe_ray.inputs import _ref_matches, parse_file_with_line

    ref = parse_file_with_line("src/{calc,util}.py:1-1")[0]
    assert _ref_matches(ref, "src/calc.py")
    assert _ref_matches(ref, "src/util.py")
    assert not _ref_matches(ref, "docs/readme.md")


def test_outline_diff_formatter(corpus):
    """outline_diff_formatter.rs: extraction results re-rendered as a
    unified diff — per-file headers, per-block @@ hunks, numbered gutter
    with +/- on changed lines and remove/add runs coalesced into
    replacement pairs."""
    from probe_ray.output import format_outline_diff, format_results

    diff = (
        "diff --git a/src/util.py b/src/util.py\n"
        "--- a/src/util.py\n"
        "+++ b/src/util.py\n"
        "@@ -4,3 +4,3 @@\n"
        "-line 4\n"
        "+line four\n"
        " line 5\n"
        "-line 6\n"
        "+line six\n"
    )
    tbl = extract_from_text(corpus, diff)
    out = format_outline_diff(tbl, diff)
    assert "diff --git a/src/util.py b/src/util.py" in out
    assert "--- a/src/util.py" in out and "+++ b/src/util.py" in out
    assert "@@ " in out
    # replacement pairs: old line with '-', new with '+', same number
    assert "4- line 4" in out and "4+ line four" in out
    assert "6- line 6" in out and "6+ line six" in out
    # interior context carries the plain gutter
    assert "5  line 5" in out
    # no diff -> all context lines (test_outline_diff_with_no_diff):
    # no numbered gutter line carries a +/- marker
    import re

    ctx = format_outline_diff(tbl)
    assert not re.search(r"^\s*\d+[+-] ", ctx, re.M), ctx
    # registered in FORMATS
    assert "diff --git" in format_results(tbl, "outline-diff")
    # empty result
    import pyarrow as pa
    from probe_ray.inputs import _EXTRACT_SCHEMA
    assert format_outline_diff(_EXTRACT_SCHEMA.empty_table()) == "No results found.\n"


def test_inputs_property_fuzz():
    """Property fuzz: parse_file_references never crashes on arbitrary
    text, and a well-formed reference injected into arbitrary noise is
    always recovered with its line info intact."""
    from hypothesis import given, settings, strategies as st

    noise = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
    )

    @settings(max_examples=150, deadline=None)
    @given(noise)
    def never_crashes(text):
        refs = parse_file_references(text)
        for r in refs:
            assert r["path"]

    never_crashes()

    @settings(max_examples=100, deadline=None)
    @given(
        noise,
        st.integers(min_value=1, max_value=9999),
        st.integers(min_value=1, max_value=9999),
    )
    def injected_ref_recovered(text, a, b):
        lo, hi = min(a, b), max(a, b)
        ref = f"pkg/mod_x.py:{lo}-{hi}"
        refs = parse_file_references(f"{text} {ref} ")
        mine = [r for r in refs if r["path"] == "pkg/mod_x.py"]
        assert mine and (mine[0]["start_line"], mine[0]["end_line"]) == (lo, hi)

    injected_ref_recovered()


def test_outline_diff_trailing_removes_render(corpus):
    """A hunk that deletes more than it adds: the unpaired removed lines
    must still render with '-' (anchored after the previous rendered
    line), not silently vanish."""
    from probe_ray.output import format_outline_diff

    diff = (
        "diff --git a/src/util.py b/src/util.py\n"
        "--- a/src/util.py\n"
        "+++ b/src/util.py\n"
        "@@ -4,4 +4,2 @@\n"
        " line 4\n"
        "+line A\n"
        "-line 5\n"
        "-line 6\n"
        " line 7\n"
    )
    tbl = extract_from_text(corpus, diff)
    out = format_outline_diff(tbl, diff)
    # the replace pair and the surviving extra remove both render
    assert "+ line A" in out
    assert "- line 5" in out
    assert "- line 6" in out


def test_split_dep_reference_forms():
    """path_resolver/mod.rs + go.rs/javascript.rs/rust.rs split rules."""
    from probe_ray.inputs import split_dep_reference as S

    assert S("go:github.com/gin-gonic/gin") == dict(
        lang="go", module="github.com/gin-gonic/gin", subpath=None)
    assert S("go:github.com/gin-gonic/gin/examples/basic") == dict(
        lang="go", module="github.com/gin-gonic/gin", subpath="examples/basic")
    assert S("go:golang.org/x/tools/cmd") == dict(
        lang="go", module="golang.org/x/tools", subpath="cmd")
    assert S("go:net/http") == dict(lang="go", module="net/http", subpath=None)
    assert S("go:net/http/server.go") == dict(
        lang="go", module="net/http", subpath="server.go")
    assert S("js:lodash") == dict(lang="js", module="lodash", subpath=None)
    assert S("js:lodash/get") == dict(lang="js", module="lodash", subpath="get")
    assert S("js:@types/node/fs") == dict(
        lang="js", module="@types/node", subpath="fs")
    assert S("js:@types") is None  # scope without package
    assert S("rust:serde") == dict(lang="rust", module="serde", subpath=None)
    assert S("/dep/go/fmt") == dict(lang="go", module="fmt", subpath=None)
    assert S("/dep/py/requests") is None  # unknown language id
    assert S("go:a/../b") is None  # '..' rejected (go.rs:36-38)
    assert S("src/plain.rs") is None


def test_resolve_dep_refs_against_corpus():
    """The corpus's repo column is the 'installed dependency' space."""
    from probe_ray.inputs import resolve_dep_refs

    docs = rd.from_arrow(pa.table({
        "repo": ["github.com/gin-gonic/gin", "github.com/gin-gonic/gin",
                 "vendor/lodash", "corpus/web"],
        "path": ["examples/basic/main.go", "gin.go", "get.js", "doc.txt"],
        "lang": ["go", "go", "javascript", "text"],
        "content": ["package main\n", "package gin\n", "module.exports\n",
                    "hello\n"],
    }))
    rows = resolve_dep_refs(
        docs, "go:github.com/gin-gonic/gin/examples/basic"
    ).take_all()
    assert [r["path"] for r in rows] == ["examples/basic/main.go"]
    rows = resolve_dep_refs(docs, "go:github.com/gin-gonic/gin").take_all()
    assert len(rows) == 2
    # module matches the repo's trailing segments (vendor/lodash)
    rows = resolve_dep_refs(docs, "js:lodash").take_all()
    assert [r["path"] for r in rows] == ["get.js"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resolve_dep_refs(docs, "not/a/dep.rs")
