"""grep / extract / symbols / test-detection ops over the synthetic corpus."""

import pytest


@pytest.fixture(scope="module")
def corpus_ds(ray_session, tmp_path_factory):
    import ray.data as rd

    from probe_ray.corpus import write_corpus

    p = tmp_path_factory.mktemp("tools") / "c.parquet"
    write_corpus(str(p), "t1")
    return rd.read_parquet(str(p)).materialize()


def test_grep(corpus_ds):
    from probe_ray.tools import grep

    hits = grep(corpus_ds, r"keywordAlpha").to_pandas()
    assert len(hits) > 0
    assert all("keywordalpha" in l.lower() for l in hits["line"])
    # long lines are skipped during matching (ripgrep_searcher.rs:106-118)
    hits_y = grep(corpus_ds, r"y{100}").to_pandas()
    assert len(hits_y) == 0


def test_extract(corpus_ds):
    from probe_ray.tools import extract

    row = corpus_ds.take(1)[0]
    full = extract(corpus_ds, row["repo"], row["path"])
    assert full is not None and full["code"] == row["content"]
    sliced = extract(corpus_ds, row["repo"], row["path"], line=1, context=1)
    assert sliced["start_line"] == 1 and sliced["end_line"] <= 2
    assert extract(corpus_ds, "nope", "nope") is None


def test_symbols(corpus_ds):
    from probe_ray.tools import symbols

    syms = symbols(corpus_ds).to_pandas()
    assert len(syms) > 0
    assert set(syms["kind"]).issuperset({"function"})
    # rust fn defs found with names
    rust = syms[syms["lang"] == "rust"]
    assert (rust["kind"] == "function").any()
    # spans are well-formed
    assert (syms["end_line"] >= syms["line_no"]).all()


def test_symbols_nesting_and_fallback():
    """Reference SymbolNode fields: signature, end_line span, parent path
    (tree flattened to a table), and the plain-text per-line fallback for
    unsupported languages (symbols.rs:110-130)."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    rust = (
        "impl Config {\n"
        "    pub fn new(name: String) -> Config {\n"
        "        Config { name }\n"
        "    }\n"
        "    fn reset(&mut self) {\n"
        "        self.name.clear();\n"
        "    }\n"
        "}\n"
        "fn free() {}\n"
    )
    py = (
        "class Widget:\n"
        "    def render(self):\n"
        "        pass\n"
        "def helper():\n"
        "    return 1\n"
    )
    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * 3,
        "path": ["c.rs", "w.py", "notes.txt"],
        "lang": ["rust", "python", "text"],
        "content": [rust, py, "alpha\nbeta\n"],
    }))
    df = symbols(docs).to_pandas()

    r = df[df["path"] == "c.rs"].set_index("name")
    assert r.loc["Config", "kind"] == "impl"
    assert r.loc["Config", "end_line"] == 8
    assert r.loc["new", "parent"] == "Config" and r.loc["new", "depth"] == 1
    assert r.loc["reset", "parent"] == "Config"
    assert r.loc["free", "parent"] == "" and r.loc["free", "depth"] == 0
    assert r.loc["new", "signature"].startswith("pub fn new(")

    p = df[df["path"] == "w.py"].set_index("name")
    assert p.loc["render", "parent"] == "Widget"
    assert p.loc["Widget", "end_line"] == 3
    assert p.loc["helper", "parent"] == ""

    t = df[df["path"] == "notes.txt"]
    assert list(t["kind"].unique()) == ["text"]
    assert list(t["signature"])[:2] == ["alpha", "beta"]


def test_symbols_java_c_ruby():
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    java = (
        "public class Account {\n"
        "    private int balance;\n"
        "    public int getBalance() {\n"
        "        return balance;\n"
        "    }\n"
        "}\n"
    )
    c = (
        "typedef struct Node {\n"
        "    int v;\n"
        "} Node;\n"
        "static int add_one(int x) {\n"
        "    return x + 1;\n"
        "}\n"
        "int declared_only(int x);\n"
    )
    rb = (
        "module Billing\n"
        "  class Invoice\n"
        "    def total\n"
        "      42\n"
        "    end\n"
        "  end\n"
        "end\n"
    )
    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * 3,
        "path": ["A.java", "n.c", "b.rb"],
        "lang": ["java", "c", "ruby"],
        "content": [java, c, rb],
    }))
    df = symbols(docs).to_pandas()

    j = df[df["path"] == "A.java"].set_index("name")
    assert j.loc["Account", "kind"] == "class"
    assert j.loc["getBalance", "kind"] == "method"
    assert j.loc["getBalance", "parent"] == "Account"

    cc = df[df["path"] == "n.c"].set_index("name")
    assert cc.loc["Node", "kind"] == "struct"
    assert cc.loc["add_one", "kind"] == "function"
    assert "declared_only" not in cc.index  # prototype, not a definition

    r = df[df["path"] == "b.rb"].set_index("name")
    assert r.loc["Billing", "kind"] == "module"
    assert r.loc["Invoice", "parent"] == "Billing"
    assert r.loc["total", "parent"] == "Billing::Invoice"


def test_symbols_golden_eight_langs():
    """Golden table over the 8 recognizer languages, modeled on the
    reference's per-language outline_format_tests fixture shapes (nested
    types, receiver methods, interfaces, multi-line parameter lists):
    every expected (kind, name, parent, params) row must come out of
    symbols() exactly."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    fixtures = {
        ("calc.rs", "rust"): (
            "pub struct Calc {\n"
            "    total: f64,\n"
            "}\n"
            "impl Calc {\n"
            "    pub fn add(&mut self, x: f64, y: f64) -> f64 {\n"
            "        x + y\n"
            "    }\n"
            "    async fn flush(\n"
            "        &mut self,\n"
            "        hard: bool,\n"
            "    ) {\n"
            "    }\n"
            "}\n"
            "pub trait Ops {\n"
            "    fn run(&self);\n"
            "}\n"
        ),
        ("calc.py", "python"): (
            "class Calc:\n"
            "    def add(self, x, y=0):\n"
            "        return x + y\n"
            "    class Inner:\n"
            "        def scale(self, f):\n"
            "            return f\n"
            "def helper(a, *args, **kw):\n"
            "    return a\n"
        ),
        ("calc.go", "go"): (
            "type Calc struct {\n"
            "    Total float64\n"
            "}\n"
            "func (c *Calc) Add(x, y float64) float64 {\n"
            "    return x + y\n"
            "}\n"
            "func (c Calc) Reset() {\n"
            "}\n"
            "func NewCalc(name string) *Calc {\n"
            "    return &Calc{}\n"
            "}\n"
        ),
        ("calc.js", "javascript"): (
            "class Calc {\n"
            "    constructor(name) {\n"
            "        this.name = name;\n"
            "    }\n"
            "    async add(x, y) {\n"
            "        return x + y;\n"
            "    }\n"
            "}\n"
            "function helper(a, b) {\n"
            "    return fmt(a, b);\n"
            "}\n"
            "const scale = (f) => f;\n"
        ),
        ("calc.ts", "typescript"): (
            "export interface Ops {\n"
            "    add(x: number, y: number): number;\n"
            "}\n"
            "export type Pair = [number, number];\n"
            "class Calc {\n"
            "    add(x: number, y: number): number {\n"
            "        return x + y;\n"
            "    }\n"
            "}\n"
        ),
        ("Calc.java", "java"): (
            "public class Calc {\n"
            "    private double total;\n"
            "    public Calc(String name) {\n"
            "    }\n"
            "    public double add(double x,\n"
            "                      double y) {\n"
            "        return x + y;\n"
            "    }\n"
            "    public interface Ops {\n"
            "    }\n"
            "}\n"
        ),
        ("calc.c", "c"): (
            "typedef struct Calc {\n"
            "    double total;\n"
            "} Calc;\n"
            "static double add(double x, double y)\n"
            "{\n"
            "    return x + y;\n"
            "}\n"
        ),
        ("calc.rb", "ruby"): (
            "module Math\n"
            "  class Calc\n"
            "    def add(x, y)\n"
            "      x + y\n"
            "    end\n"
            "    def self.build(name)\n"
            "      new\n"
            "    end\n"
            "  end\n"
            "end\n"
        ),
    }
    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * len(fixtures),
        "path": [p for p, _ in fixtures],
        "lang": [l for _, l in fixtures],
        "content": list(fixtures.values()),
    }))
    df = symbols(docs).to_pandas()
    got = {
        (r.path, r.kind, r.name, r.parent): r.params
        for r in df.itertuples()
    }

    golden = [
        # (path, kind, name, parent, params)
        ("calc.rs", "struct", "Calc", "", None),
        ("calc.rs", "impl", "Calc", "", None),
        ("calc.rs", "function", "add", "Calc", "&mut self, x: f64, y: f64"),
        ("calc.rs", "function", "flush", "Calc", "&mut self, hard: bool,"),
        ("calc.rs", "trait", "Ops", "", None),
        ("calc.rs", "function", "run", "Ops", "&self"),
        ("calc.py", "class", "Calc", "", None),
        ("calc.py", "function", "add", "Calc", "self, x, y=0"),
        ("calc.py", "class", "Inner", "Calc", None),
        ("calc.py", "function", "scale", "Calc::Inner", "self, f"),
        ("calc.py", "function", "helper", "", "a, *args, **kw"),
        ("calc.go", "type", "Calc", "", None),
        ("calc.go", "method", "Add", "Calc", "x, y float64"),
        ("calc.go", "method", "Reset", "Calc", ""),
        ("calc.go", "function", "NewCalc", "", "name string"),
        ("calc.js", "class", "Calc", "", None),
        ("calc.js", "method", "constructor", "Calc", "name"),
        ("calc.js", "method", "add", "Calc", "x, y"),
        ("calc.js", "function", "helper", "", "a, b"),
        ("calc.ts", "interface", "Ops", "", None),
        ("calc.ts", "type", "Pair", "", None),
        ("calc.ts", "method", "add", "Ops", "x: number, y: number"),
        ("calc.ts", "class", "Calc", "", None),
        ("Calc.java", "class", "Calc", "", None),
        ("Calc.java", "method", "Calc", "Calc", "String name"),
        ("Calc.java", "method", "add", "Calc", "double x, double y"),
        ("Calc.java", "interface", "Ops", "Calc", None),
        ("calc.c", "struct", "Calc", "", None),
        ("calc.c", "function", "add", "", "double x, double y"),
        ("calc.rb", "module", "Math", "", None),
        ("calc.rb", "class", "Calc", "Math", None),
        ("calc.rb", "method", "add", "Math::Calc", "x, y"),
        ("calc.rb", "method", "build", "Math::Calc", "name"),
    ]
    for path, kind, name, parent, params in golden:
        key = (path, kind, name, parent)
        assert key in got, f"missing {path}:{kind}:{name} under {parent!r}"
        assert got[key] == params, (
            f"{path}:{name} params {got[key]!r} != {params!r}"
        )
    # no call-statement false positives in the js body
    assert not any(
        k[0] == "calc.js" and k[2] == "fmt" for k in got
    )


def test_extract_by_symbol():
    """probe extract file.rs#symbol (§4.2): the named symbol's span."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import extract

    rust = (
        "impl Config {\n"
        "    pub fn new(name: String) -> Config {\n"
        "        Config { name }\n"
        "    }\n"
        "}\n"
    )
    docs = rd.from_arrow(pa.table({
        "repo": ["r"], "path": ["c.rs"], "lang": ["rust"], "content": [rust],
    }))
    got = extract(docs, "r", "c.rs", symbol="new")
    assert got["start_line"] == 2 and got["end_line"] == 4
    assert got["kind"] == "function" and got["code"].startswith("    pub fn new")
    assert extract(docs, "r", "c.rs", symbol="absent") is None


def test_is_test_file():
    from probe_ray.tools import is_test_file

    assert is_test_file("tests/foo_test.rs", "")
    assert is_test_file("src/lib.rs", "#[test]\nfn t() {}")
    assert not is_test_file("src/lib.rs", "fn f() {}")


def test_allow_tests_conformance(t2_rows, t2_index):
    from probe_ray.oracle import oracle_search
    from probe_ray.search import Engine

    expected = oracle_search(t2_rows, ["keywordAlpha"], allow_tests=False)
    got = Engine(t2_index).search(["keywordAlpha"], allow_tests=False).to_pylist()
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g["doc_id"] == e.doc_id and g["rank"] == e.rank
    # and it actually excludes something
    full = oracle_search(t2_rows, ["keywordAlpha"])
    assert len(expected) < len(full)


def test_output_formatters(t2_index):
    """S4: json/xml/terminal renderers over document- and block-granularity
    result tables (search_output.rs:570-1160 field layout)."""
    import json as _json
    import xml.etree.ElementTree as ET

    from probe_ray.output import format_results
    from probe_ray.search import Engine

    eng = Engine(t2_index)
    doc_tbl = eng.search(["keywordAlpha"], max_results=3)
    blk_tbl = eng.search_blocks(["keywordAlpha"], max_results=3)

    for tbl in (doc_tbl, blk_tbl):
        j = _json.loads(format_results(tbl, "json"))
        assert j["summary"]["count"] == tbl.num_rows
        assert len(j["results"]) == tbl.num_rows
        for r in j["results"]:
            assert "file" in r and len(r["lines"]) == 2

        x = format_results(tbl, "xml")
        root = ET.fromstring(x)  # well-formed
        assert root.tag == "probe_results"
        assert len(root.findall("result")) == tbl.num_rows

        t = format_results(tbl, "terminal")
        assert t.count(":") >= tbl.num_rows  # one file:span header per hit

    import pytest as _pytest

    with _pytest.raises(ValueError):
        format_results(doc_tbl, "yaml")


def test_structural_query_patterns():
    """M13 fallback: ast-grep-style patterns via regex translation
    (query.rs:32-46 surface; documented textual-matching deviation)."""
    import ray.data as rd
    import pyarrow as pa

    from probe_ray.tools import compile_structural_pattern, structural_query

    rx = compile_structural_pattern("fn $NAME($$$)")
    m = rx.search("pub fn migrate_all(a: u32, b: &str) {")
    assert m and m.group("NAME") == "migrate_all"

    # metavariable unification: repeated $X must bind the same text
    rx2 = compile_structural_pattern("$X == $X")
    assert rx2.search("if a == a {")
    assert not rx2.search("if a == b {")

    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * 3,
        "path": ["a.rs", "b.rs", "c.py"],
        "lang": ["rust", "rust", "python"],
        "content": [
            "fn alpha(x: u32) {}\nfn beta() {}",
            "struct S;\nfn gamma(a, b) { body }",
            "def delta():\n    pass",
        ],
    }))
    tbl = structural_query(docs, "fn $NAME($$$)")
    names = sorted(
        c.split("=", 1)[1]
        for caps in tbl.column("captures").to_pylist()
        for c in caps
    )
    assert names == ["alpha", "beta", "gamma"]
    assert tbl.column("path").to_pylist() == ["a.rs", "a.rs", "b.rs"]

    # language filter + max_results
    t2 = structural_query(docs, "def $F($$$):", language="python")
    assert t2.num_rows == 1 and "F=delta" in t2.column("captures").to_pylist()[0]
    t3 = structural_query(docs, "fn $NAME($$$)", max_results=2)
    assert t3.num_rows == 2

    # no match -> typed empty table
    t4 = structural_query(docs, "impl $T for $U")
    assert t4.num_rows == 0 and t4.schema.names[0] == "repo"

    # balanced $$$: nested delimiters are consumed whole, and the match
    # cannot escape its enclosing scope (a plain regex translation stops at
    # the FIRST closing paren, truncating nested argument lists)
    docs2 = rd.from_arrow(pa.table({
        "repo": ["r"] * 2,
        "path": ["n.rs", "m.rs"],
        "lang": ["rust", "rust"],
        "content": [
            "fn outer(inner(x), y) { }",
            "call(a); fn plain(z) {}",
        ],
    }))
    t5 = structural_query(docs2, "fn $NAME($$$)")
    assert t5.column("matched_text").to_pylist() == [
        "fn plain(z)", "fn outer(inner(x), y)",
    ] or sorted(t5.column("matched_text").to_pylist()) == [
        "fn outer(inner(x), y)", "fn plain(z)",
    ]


def test_extract_block_default(corpus_ds):
    """extract with --line and no explicit context returns the fallback
    context block (±5-line merged window), like the reference's AST-block
    extraction on unsupported languages."""
    from probe_ray.tools import extract

    row = corpus_ds.take(1)[0]
    n_lines = row["content"].count("\n") + 1
    mid = max(1, n_lines // 2)
    out = extract(corpus_ds, row["repo"], row["path"], line=mid)
    assert out is not None
    assert out["start_line"] <= mid <= out["end_line"]
    # spans the ±5 window (clamped)
    assert out["start_line"] == max(1, mid - 5)
    assert out["end_line"] == min(n_lines, mid + 5)


def test_outline_format(t2_index):
    from probe_ray.output import format_results
    from probe_ray.search import Engine

    tbl = Engine(t2_index).search_blocks(["keywordAlpha"], max_results=6)
    o = format_results(tbl, "outline")
    assert o.startswith("---")
    assert "File: " in o
    # per-file grouping: a file header appears once even with several blocks
    import re

    headers = re.findall(r"^File: (.+)$", o, re.M)
    assert len(headers) == len(set(headers))


def test_symbols_golden_six_more_langs():
    """Golden table for the round-4 recognizer languages (cpp, csharp,
    php, swift, markdown, yaml) — kinds mirror each language's
    is_acceptable_parent node set (cpp.rs:40-49, csharp.rs:28-41,
    php.rs:28-37, swift.rs:28-41; markdown sections, yaml keys)."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    fixtures = {
        ("calc.cpp", "cpp"): (
            "namespace util {\n"
            "class Calc {\n"
            "public:\n"
            "    explicit Calc(int base)\n"
            "        : base_(base) {}\n"
            "    double add(double x, double y) {\n"
            "        return x + y;\n"
            "    }\n"
            "};\n"
            "double Calc::sub(double x, double y) {\n"
            "    return x - y;\n"
            "}\n"
            "inline int helper(int a) {\n"
            "    return a;\n"
            "}\n"
            "}\n"
        ),
        ("Calc.cs", "csharp"): (
            "namespace App.Core {\n"
            "    public sealed class Calc {\n"
            "        public int Count { get; set; }\n"
            "        public Calc(string name) {\n"
            "        }\n"
            "        public double Add(double x, double y) {\n"
            "            return x + y;\n"
            "        }\n"
            "    }\n"
            "    public interface IOps {\n"
            "    }\n"
            "    public enum Mode { A, B }\n"
            "}\n"
        ),
        ("calc.php", "php"): (
            "<?php\n"
            "interface Ops {\n"
            "    public function run($x);\n"
            "}\n"
            "class Calc implements Ops {\n"
            "    public function add($x, $y) {\n"
            "        return $x + $y;\n"
            "    }\n"
            "    final public function reset() {}\n"
            "}\n"
            "function helper($a) {\n"
            "    return $a;\n"
            "}\n"
        ),
        ("calc.swift", "swift"): (
            "public struct Point {\n"
            "    var x: Double\n"
            "    func dist(to other: Point) -> Double {\n"
            "        return 0\n"
            "    }\n"
            "}\n"
            "class Calc {\n"
            "    static func build(name: String) -> Calc {\n"
            "        return Calc()\n"
            "    }\n"
            "}\n"
            "protocol Ops {\n"
            "    func run()\n"
            "}\n"
            "extension Calc {\n"
            "    func reset() {}\n"
            "}\n"
            "typealias Pair = (Int, Int)\n"
        ),
        ("README.md", "markdown"): (
            "# Title\n"
            "intro\n"
            "## Install\n"
            "steps\n"
            "### Deps\n"
            "more\n"
            "## Usage\n"
            "text\n"
        ),
        ("conf.yaml", "yaml"): (
            "server:\n"
            "  host: localhost\n"
            "  port: 8080\n"
            "logging:\n"
            "  level: info\n"
        ),
    }
    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * len(fixtures),
        "path": [p for p, _ in fixtures],
        "lang": [l for _, l in fixtures],
        "content": list(fixtures.values()),
    }))
    df = symbols(docs).to_pandas()
    got = {
        (r.path, r.kind, r.name, r.parent): r.params
        for r in df.itertuples()
    }

    golden = [
        # (path, kind, name, parent, params)
        ("calc.cpp", "namespace", "util", "", None),
        ("calc.cpp", "class", "Calc", "util", None),
        ("calc.cpp", "function", "Calc", "util::Calc", "int base"),
        ("calc.cpp", "function", "add", "util::Calc", "double x, double y"),
        ("calc.cpp", "function", "sub", "util::Calc", "double x, double y"),
        ("calc.cpp", "function", "helper", "util", "int a"),
        ("Calc.cs", "namespace", "App.Core", "", None),
        ("Calc.cs", "class", "Calc", "App.Core", None),
        ("Calc.cs", "property", "Count", "App.Core::Calc", None),
        ("Calc.cs", "method", "Calc", "App.Core::Calc", "string name"),
        ("Calc.cs", "method", "Add", "App.Core::Calc", "double x, double y"),
        ("Calc.cs", "interface", "IOps", "App.Core", None),
        ("Calc.cs", "enum", "Mode", "App.Core", None),
        ("calc.php", "interface", "Ops", "", None),
        ("calc.php", "method", "run", "Ops", "$x"),
        ("calc.php", "class", "Calc", "", None),
        ("calc.php", "method", "add", "Calc", "$x, $y"),
        ("calc.php", "method", "reset", "Calc", ""),
        ("calc.php", "function", "helper", "", "$a"),
        ("calc.swift", "struct", "Point", "", None),
        ("calc.swift", "function", "dist", "Point", "to other: Point"),
        ("calc.swift", "class", "Calc", "", None),
        ("calc.swift", "function", "build", "Calc", "name: String"),
        ("calc.swift", "protocol", "Ops", "", None),
        ("calc.swift", "function", "run", "Ops", ""),
        ("calc.swift", "extension", "Calc", "", None),
        ("calc.swift", "function", "reset", "Calc", ""),
        ("calc.swift", "typealias", "Pair", "", None),
        ("README.md", "section", "Title", "", None),
        ("README.md", "section", "Install", "Title", None),
        ("README.md", "section", "Deps", "Title::Install", None),
        ("README.md", "section", "Usage", "Title", None),
        ("conf.yaml", "key", "server", "", None),
        ("conf.yaml", "key", "host", "server", None),
        ("conf.yaml", "key", "port", "server", None),
        ("conf.yaml", "key", "logging", "", None),
        ("conf.yaml", "key", "level", "logging", None),
    ]
    for path, kind, name, parent, params in golden:
        key = (path, kind, name, parent)
        assert key in got, f"missing {path}:{kind}:{name} under {parent!r}"
        assert got[key] == params, (
            f"{path}:{name} params {got[key]!r} != {params!r}"
        )
    # markdown section spans: Install runs to the line before Usage
    md = df[df["path"] == "README.md"].set_index("name")
    assert (md.loc["Install", "line_no"], md.loc["Install", "end_line"]) == (3, 6)
    # file ends with "\n" -> 9 split lines; Title spans to EOF
    assert md.loc["Title", "end_line"] == 9
    # no false symbols from member/statement lines
    assert not any(k[0] == "calc.cpp" and k[2] in ("base_", "return") for k in got)
    assert not any(k[0] == "calc.swift" and k[2] == "x" for k in got)


def test_symbols_golden_final_four_langs():
    """Golden table for the last factory languages (solidity, crystal,
    haskell, html) — kinds mirror each language's is_acceptable_parent
    node set (solidity.rs:55-72, crystal.rs:70-87, haskell.rs:77-99,
    html.rs:240-255). With these, 18 of the reference's 19 factory
    routes have a recognizer (tsx shares typescript's)."""
    import pyarrow as pa
    import ray.data as rd

    from probe_ray.tools import symbols

    fixtures = {
        ("Token.sol", "solidity"): (
            "contract Token {\n"
            "    mapping(address => uint256) public balances;\n"
            "    event Transfer(address from, address to);\n"
            "    error NotOwner();\n"
            "    modifier onlyOwner() {\n"
            "        _;\n"
            "    }\n"
            "    constructor(uint256 supply) {\n"
            "    }\n"
            "    function transfer(address to, uint256 amount) public {\n"
            "    }\n"
            "    receive() external payable {\n"
            "    }\n"
            "}\n"
            "interface IToken {\n"
            "    function total() external;\n"
            "}\n"
            "library MathLib {\n"
            "}\n"
        ),
        ("calc.cr", "crystal"): (
            "module Billing\n"
            "  class Calc\n"
            "    def add(x, y)\n"
            "      x + y\n"
            "    end\n"
            "    def self.build\n"
            "      new\n"
            "    end\n"
            "  end\n"
            "  enum Mode\n"
            "    A\n"
            "  end\n"
            "  alias Num = Int32\n"
            "end\n"
            "lib LibC\n"
            "  fun strlen(s : UInt8*) : Int32\n"
            "end\n"
            "macro define_getter(name)\n"
            "end\n"
        ),
        ("Calc.hs", "haskell"): (
            "module Calc where\n"
            "\n"
            "data Shape = Circle Double | Square Double\n"
            "newtype Total = Total Double\n"
            "type Pair = (Int, Int)\n"
            "\n"
            "class Area a where\n"
            "  area :: a -> Double\n"
            "\n"
            "instance Area Shape where\n"
            "  area (Circle r) = r * r\n"
            "\n"
            "addOne :: Int -> Int\n"
            "addOne x = x + 1\n"
        ),
        ("index.html", "html"): (
            "<html>\n"
            "<head>\n"
            "  <title>T</title>\n"
            "</head>\n"
            "<body>\n"
            "  <nav>\n"
            "    <div>menu</div>\n"
            "  </nav>\n"
            "  <section>\n"
            "    <p>text</p>\n"
            "  </section>\n"
            "  <script>\n"
            "    run();\n"
            "  </script>\n"
            "</body>\n"
            "</html>\n"
        ),
    }
    docs = rd.from_arrow(pa.table({
        "repo": ["r"] * len(fixtures),
        "path": [p for p, _ in fixtures],
        "lang": [l for _, l in fixtures],
        "content": list(fixtures.values()),
    }))
    df = symbols(docs).to_pandas()
    got = {
        (r.path, r.kind, r.name, r.parent): r.params
        for r in df.itertuples()
    }

    golden = [
        # (path, kind, name, parent, params)
        ("Token.sol", "contract", "Token", "", None),
        ("Token.sol", "state_variable", "balances", "Token", None),
        ("Token.sol", "event", "Transfer", "Token", None),
        ("Token.sol", "error", "NotOwner", "Token", None),
        ("Token.sol", "modifier", "onlyOwner", "Token", None),
        ("Token.sol", "constructor", "constructor", "Token", None),
        ("Token.sol", "function", "transfer", "Token",
         "address to, uint256 amount"),
        ("Token.sol", "function", "receive", "Token", ""),
        ("Token.sol", "interface", "IToken", "", None),
        ("Token.sol", "function", "total", "IToken", ""),
        ("Token.sol", "library", "MathLib", "", None),
        ("calc.cr", "module", "Billing", "", None),
        ("calc.cr", "class", "Calc", "Billing", None),
        ("calc.cr", "method", "add", "Billing::Calc", "x, y"),
        ("calc.cr", "method", "build", "Billing::Calc", None),
        ("calc.cr", "enum", "Mode", "Billing", None),
        ("calc.cr", "alias", "Num", "Billing", None),
        ("calc.cr", "lib", "LibC", "", None),
        ("calc.cr", "fun", "strlen", "LibC", None),
        ("calc.cr", "macro", "define_getter", "", None),
        ("Calc.hs", "data", "Shape", "", None),
        ("Calc.hs", "newtype", "Total", "", None),
        ("Calc.hs", "type", "Pair", "", None),
        ("Calc.hs", "class", "Area", "", None),
        ("Calc.hs", "instance", "Area", "", None),
        ("Calc.hs", "function", "addOne", "", None),
        ("index.html", "element", "html", "", None),
        ("index.html", "element", "head", "html", None),
        ("index.html", "element", "body", "html", None),
        ("index.html", "element", "nav", "html::body", None),
        ("index.html", "element", "div", "html::body::nav", None),
        ("index.html", "element", "section", "html::body", None),
        ("index.html", "element", "script", "html::body", None),
    ]
    for path, kind, name, parent, params in golden:
        key = (path, kind, name, parent)
        assert key in got, f"missing {path}:{kind}:{name} under {parent!r}"
        assert got[key] == params, (
            f"{path}:{name} params {got[key]!r} != {params!r}"
        )
    # html element spans end at the matching close tag
    h = df[df["path"] == "index.html"]
    nav = h[h["name"] == "nav"].iloc[0]
    assert (nav.line_no, nav.end_line) == (6, 8)
    # haskell 'area ::' inside the class body is indented (column > 0), so
    # it is NOT a top-level function symbol
    assert not any(k[0] == "Calc.hs" and k[2] == "area" for k in got)
