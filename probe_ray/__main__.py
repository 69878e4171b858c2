"""probe-ray CLI — the engine's counterpart of probe's subcommand surface
(src/cli.rs:104-460): build, update, search, grep, extract, symbols, bench.

Usage:
  python -m probe_ray build  <corpus.parquet|dir> <index_dir> [--shards N]
  python -m probe_ray search <index_dir> <query> [knobs...]
  python -m probe_ray grep   <corpus> <pattern>
  python -m probe_ray extract <corpus> <repo> <path> [--line N] [--context N]
  python -m probe_ray symbols <corpus>

This CLI owns its Ray session (the library never calls ray.init —
the driver/tests own theirs).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import logging

    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def main(argv=None):
    p = argparse.ArgumentParser(prog="probe_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--shards", type=int, default=16)
    b.add_argument("--ngram-index", action="store_true",
                   help="build the content 3-gram substring index")
    b.add_argument("--overwrite", action="store_true")

    u = sub.add_parser("update", help="incrementally update an index to "
                       "match a corpus (segment append; rebuild fallback "
                       "on changes/removals)")
    u.add_argument("corpus")
    u.add_argument("index_dir")

    co = sub.add_parser("compact", help="fold update generations into a "
                        "fresh single-generation index (segment merge)")
    co.add_argument("index_dir")
    co.add_argument("out_dir")

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query", nargs="+")
    s.add_argument("--exact", action="store_true")
    s.add_argument("--max-results", type=int, default=None)
    s.add_argument("--max-bytes", type=int, default=None)
    s.add_argument("--max-tokens", type=int, default=None)
    s.add_argument("--language", default=None)
    s.add_argument("--exclude-filenames", action="store_true")
    s.add_argument("--files-only", action="store_true")
    s.add_argument("--allow-tests", action="store_true",
                   help="include test files (matches the reference flag)")
    s.add_argument("--session", default=None)
    s.add_argument("--mode",
                   choices=["compat", "global", "blocks", "blocks-global"],
                   default="blocks",
                   help="blocks = ranked code blocks (the reference's "
                        "output unit, default); compat = whole-file; "
                        "global = corpus-stats top-k")
    s.add_argument("--no-merge", action="store_true",
                   help="skip adjacent-block merging (blocks mode)")
    s.add_argument("-r", "--reranker", default="bm25",
                   choices=["bm25", "hybrid", "hybrid2", "tfidf",
                            "ms-marco-tinybert", "ms-marco-minilm-l6",
                            "ms-marco-minilm-l12"],
                   help="ranking algorithm (cli.rs:35-37); ms-marco-* "
                        "cross-encoder-reranks the admitted results")
    s.add_argument("--question", default=None,
                   help="natural-language question for reranking "
                        "(cli.rs:92; defaults to the keyword string)")
    s.add_argument("--format", choices=["terminal", "json", "xml", "outline"],
                   default="terminal")
    s.add_argument("--json", action="store_true",
                   help="shorthand for --format json (raw rows)")

    q = sub.add_parser("query", help="ast-grep-style structural pattern")
    q.add_argument("corpus")
    q.add_argument("pattern")
    q.add_argument("--language", default=None)
    q.add_argument("--max-results", type=int, default=None)

    g = sub.add_parser("grep")
    g.add_argument("corpus")
    g.add_argument("pattern")

    e = sub.add_parser("extract")
    e.add_argument("corpus")
    e.add_argument("repo", nargs="?", default=None)
    e.add_argument("path", nargs="?", default=None)
    e.add_argument("--stdin", action="store_true",
                   help="read free text or a git diff from stdin and "
                        "extract every file reference found "
                        "(file_paths.rs stdin/--diff modes; git-diff "
                        "format auto-detected)")
    e.add_argument("--no-tests", action="store_true",
                   help="drop references to test files")
    e.add_argument("--format", default="plain",
                   choices=["plain", "outline-diff"],
                   help="--stdin output: plain spans+code, or the "
                        "outline-diff unified-diff rendering")
    e.add_argument("--line", type=int, default=None)
    e.add_argument("--context", type=int, default=None,
                   help="explicit ±N line slice; default extracts the "
                        "fallback context block around --line")
    e.add_argument("--symbol", default=None,
                   help="extract the named symbol's span (file#symbol form)")

    y = sub.add_parser("symbols")
    y.add_argument("corpus")

    args = p.parse_args(argv)
    ray = _init_ray(args.num_cpus)
    try:
        if args.cmd == "build":
            from probe_ray.build import build_index

            paths = build_index(
                args.corpus, args.index_dir, n_shards=args.shards,
                ngram_index=args.ngram_index, overwrite=args.overwrite,
            )
            print(json.dumps(paths.stats()))
        elif args.cmd == "update":
            from probe_ray.build import update_index

            paths = update_index(args.corpus, args.index_dir)
            print(json.dumps(paths.stats()))
        elif args.cmd == "compact":
            from probe_ray.build import compact_index

            paths = compact_index(args.index_dir, args.out_dir)
            print(json.dumps(paths.stats()))
        elif args.cmd == "search":
            if args.mode == "blocks-global" and args.files_only:
                print(
                    "error: --files-only has no block-granularity output; "
                    "use --mode global (doc granularity) with --files-only",
                    file=sys.stderr,
                )
                return 2
            from probe_ray.search import Engine

            eng = Engine(args.index_dir)
            common = dict(
                exact=args.exact,
                max_results=args.max_results,
                max_bytes=args.max_bytes,
                max_tokens=args.max_tokens,
                language=args.language,
                include_filenames=not args.exclude_filenames,
                # CLI mirrors the reference default (tests EXCLUDED unless
                # --allow-tests); the library default is include-all
                allow_tests=args.allow_tests,
                session=args.session,
                reranker=args.reranker,
                question=args.question,
            )
            if args.mode in ("blocks", "blocks-global") and not args.files_only:
                result = eng.search_blocks(
                    args.query, no_merge=args.no_merge,
                    mode="global" if args.mode == "blocks-global" else "compat",
                    **common,
                )
            else:
                result = eng.search(
                    args.query, files_only=args.files_only,
                    mode="compat" if args.mode.startswith("blocks") else args.mode,
                    **common,
                )
            if args.json:
                print(json.dumps(result.to_pylist()))
            else:
                from probe_ray.output import format_results

                print(format_results(result, args.format))
        elif args.cmd == "query":
            import ray.data as rd

            from probe_ray.tools import structural_query

            ds = rd.read_parquet(args.corpus)
            try:
                tbl = structural_query(
                    ds, args.pattern, language=args.language,
                    max_results=args.max_results,
                )
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
            for r in tbl.to_pylist():
                caps = " ".join(r["captures"])
                print(f"{r['repo']}/{r['path']}:{r['line_start']}-"
                      f"{r['line_end']}\t{caps}\t{r['matched_text'][:80]!r}")
        elif args.cmd == "grep":
            import ray.data as rd

            from probe_ray.tools import grep

            ds = rd.read_parquet(args.corpus)
            for r in grep(ds, args.pattern).take_all():
                print(f"{r['repo']}/{r['path']}:{r['line_no']}:{r['line']}")
        elif args.cmd == "extract":
            import ray.data as rd

            from probe_ray.tools import extract

            ds = rd.read_parquet(args.corpus)
            if args.stdin:
                if (args.repo is not None or args.path is not None
                        or args.line is not None or args.context is not None
                        or args.symbol is not None):
                    print("--stdin conflicts with repo/path/--line/"
                          "--context/--symbol (references come from the "
                          "piped text)", file=sys.stderr)
                    return 2
                from probe_ray.inputs import extract_from_text

                text = sys.stdin.read()
                tbl = extract_from_text(
                    ds, text, allow_tests=not args.no_tests
                )
                if args.format == "outline-diff":
                    from probe_ray.inputs import is_git_diff_format
                    from probe_ray.output import format_outline_diff

                    print(format_outline_diff(
                        tbl, text if is_git_diff_format(text) else None
                    ))
                    return 0
                for r in tbl.to_pylist():
                    print(f"{r['repo']}/{r['path']}:"
                          f"{r['start_line']}-{r['end_line']}")
                    print(r["code"])
                return 0
            if args.format != "plain":
                print("--format applies to --stdin extraction only",
                      file=sys.stderr)
                return 2
            if args.repo is None or args.path is None:
                print("extract needs <repo> <path> (or --stdin)",
                      file=sys.stderr)
                return 2
            out = extract(ds, args.repo, args.path, args.line, args.context,
                          symbol=args.symbol)
            if out is None:
                print("not found", file=sys.stderr)
                return 1
            print(out["code"])
        elif args.cmd == "symbols":
            import ray.data as rd

            from probe_ray.tools import symbols

            ds = rd.read_parquet(args.corpus)
            for r in symbols(ds).take_all():
                print(f"{r['repo']}/{r['path']}:{r['line_no']}\t{r['kind']}\t{r['name']}")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
