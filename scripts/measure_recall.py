"""Measure the approximate operators' recall against their exact ground
truth and record the numbers BASELINE.md's "Recall gates" table reports.

    python scripts/measure_recall.py [sf_dir ...]

Per sf_dir:
- knn_lsh / knn_ivf: recall@10 vs knn_cosine (exact brute-force top-10)
  plus the candidate scan fraction each one actually touched.
- blocks GLOBAL mode: top-k span overlap vs compat at the default
  overfetch (8x) and span IDENTITY at full overfetch (the convergence
  contract tests/test_blocks.py::test_block_global_mode enforces).
- blocks EARLY termination: top-k span overlap vs the full run. (Early
  termination is its own admission contract — search_runner.rs:892-1208
  ranks by an approximate early score and stops once the limit is
  stable — so identity to the full run is NOT expected; engine-early ==
  oracle-early identity is what tests/test_blocks.py enforces.)

Prints one JSON line per sf_dir. Run in a quiet window like bench.py.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spans(tbl) -> set:
    return {
        (r["path"], r["start_line"], r["end_line"]) for r in tbl.to_pylist()
    }


def measure(sf_dir: str) -> dict:
    from probe_ray import textops as T
    import __ray_entry__ as E

    out: dict = {"sf_dir": sf_dir}

    exact = T.knn_cosine(sf_dir).to_pandas()["vec_id"].tolist()
    k = len(exact)
    lsh = T.knn_lsh(sf_dir).to_pandas()["vec_id"].tolist()
    out["knn_lsh"] = {
        "recall_at_10": round(len(set(exact) & set(lsh)) / k, 3),
        "scan_fraction": T.LAST_KNN_LSH_METRICS.get("scan_fraction"),
    }
    ivf = T.knn_ivf(sf_dir).to_pandas()["vec_id"].tolist()
    out["knn_ivf"] = {
        "recall_at_10": round(len(set(exact) & set(ivf)) / k, 3),
        "scan_fraction": T.LAST_KNN_IVF_METRICS.get("scan_fraction"),
    }

    eng = E._engine_for(sf_dir)
    q = ["spark OR vector"]
    compat = _spans(eng.search_blocks(q, max_results=25))
    glob_def = _spans(eng.search_blocks(q, max_results=25, mode="global"))
    glob_full = _spans(
        eng.search_blocks(q, max_results=25, mode="global",
                          global_overfetch=10_000_000)
    )
    out["blocks_global"] = {
        "span_overlap_default_overfetch": round(
            len(compat & glob_def) / max(len(compat), 1), 3
        ),
        "identical_at_full_overfetch": glob_full == compat,
    }
    early = _spans(eng.search_blocks(q, max_results=25, early_termination=True))
    out["blocks_early"] = {
        "span_overlap_vs_full": round(
            len(compat & early) / max(len(compat), 1), 3
        ),
    }
    return out


def main() -> None:
    import ray

    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False)
    for d in dirs:
        print(json.dumps(measure(d)), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
