"""probe_ray — a Ray-Data-native distributed inverted-index + BM25 code
search engine with probe-compatible (probelabs/probe) query and ranking
semantics.

Public API:
- probe_ray.build.build_index(corpus, out_dir, ...) -> IndexPaths
- probe_ray.search.search(index_dir_or_corpus, queries, ...) -> results
- probe_ray.oracle.oracle_search(rows, queries, ...) -> reference results
"""

__version__ = "0.1.0"
