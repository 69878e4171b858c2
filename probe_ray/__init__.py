"""probe_ray — a Ray-Data-native distributed inverted-index + BM25 code
search engine with probe-compatible (probelabs/probe) query and ranking
semantics.

Public API:
- probe_ray.build.build_index(corpus, out_dir, ...) -> IndexPaths
- probe_ray.search.search(index_dir_or_corpus, queries, ...) -> results
- probe_ray.oracle.oracle_search(rows, queries, ...) -> reference results
"""

__version__ = "0.1.0"


def _shim_fsspec_http() -> None:
    """Ray Data's path resolution probes `from fsspec.implementations.http
    import HTTPFileSystem` on EVERY read/write plan build, catching only
    ModuleNotFoundError. In this environment the import always fails
    (aiohttp absent) — and when two driver threads build plans
    concurrently (e.g. corpus_clean_pipeline's parallel partition writes),
    one thread can observe the other's partially-initialized module and
    get a plain ImportError instead, crashing the job. Pre-installing an
    inert stub module makes the probe deterministic: the import succeeds,
    the isinstance check is False (no HTTP filesystems exist here), and
    the race is gone."""
    import sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types

        stub = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - inert sentinel
            def __init__(self, *a, **k):
                raise ModuleNotFoundError(
                    "aiohttp is not installed; HTTP filesystems are "
                    "unavailable in this environment"
                )

        stub.HTTPFileSystem = HTTPFileSystem
        sys.modules.setdefault("fsspec.implementations.http", stub)


_shim_fsspec_http()
