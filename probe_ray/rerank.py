"""Cross-encoder result reranking (T4): the reference's feature-gated BERT
reranker re-expressed as a Ray Data actor-pool stage.

Reference surface: ``--reranker`` accepts bm25 | hybrid | hybrid2 | tfidf |
ms-marco-tinybert | ms-marco-minilm-l6 | ms-marco-minilm-l12
(src/cli.rs:35-37). The non-model values all run the same BM25 ranking path
(the tfidf/hybrid score fields are vestigial — set to ``None`` everywhere in
src/search/); only the ms-marco models dispatch to the cross-encoder
(src/search/result_ranking.rs:139-145 -> handle_bert_reranking ->
src/bert_reranker.rs, which is behind the ``bert-reranker`` cargo feature).
An optional ``--question`` replaces the keyword string as the scored query
(cli.rs:92).

This environment has no torch/candle, so the model execution is a
clearly-marked stub (the media-decode pattern): ``CrossEncoderScorer``
raises NotImplementedError at actor init. Everything AROUND the model is
real and tested — the actor-pool ``map_batches`` plumbing (model load once
per actor in ``__init__``, batched pair scoring in ``__call__``), the
score-desc stable re-sort, rank renumbering, and the flagged-row (rank
``None``) tail preservation. ``LexicalProxyScorer`` is the deterministic
stand-in used when no model can load: token-overlap F1 between the question
and the document text — a monotone relevance proxy that lets tests assert
real reordering end to end.

At 100 TB the shape matters: reranking runs over the ADMITTED top-N rows
only (content is fetched for just those ids via the pruned candidate read),
batch_size bounds the pair tensor per actor call, and concurrency sizes the
model replica pool — swap LexicalProxyScorer for a GPU scorer with
``num_gpus=1`` per actor and nothing else changes.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# cli.rs:35-37 value_parser; model repo mapping result_ranking.rs:428-432
RERANKER_BM25_ALIASES = ("bm25", "hybrid", "hybrid2", "tfidf")
RERANKER_MODELS = {
    "ms-marco-tinybert": "cross-encoder/ms-marco-TinyBERT-L-2-v2",
    "ms-marco-minilm-l6": "cross-encoder/ms-marco-MiniLM-L-6-v2",
    "ms-marco-minilm-l12": "cross-encoder/ms-marco-MiniLM-L-12-v2",
}


class CrossEncoderScorer:
    """Actor-pool scorer that loads the real cross-encoder once per actor.

    STUB: torch/candle and the model weights are unavailable in this
    environment, so ``__init__`` raises NotImplementedError after the
    import probe. The signature, batch contract (a ``text`` column in,
    a ``rerank_score`` float64 column appended) and pool wiring are the
    real ones; see LexicalProxyScorer for the executable twin.
    """

    def __init__(self, question: str, model: str = "ms-marco-tinybert"):
        self.question = question
        self.model_repo = RERANKER_MODELS.get(model, RERANKER_MODELS["ms-marco-tinybert"])
        try:
            import torch  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "cross-encoder execution needs torch + model weights "
                f"(would load {self.model_repo} once per actor here); "
                "unavailable in this environment — use LexicalProxyScorer"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class LexicalProxyScorer:
    """Deterministic cross-encoder stand-in: token-overlap F1 between the
    question and each document text. Per-actor setup (compiled splitter +
    question token set) happens once in ``__init__``; ``__call__`` scores a
    whole batch. Monotone in shared-term coverage, so tests can assert that
    a question's distinctive terms pull the right document to rank 0."""

    def __init__(self, question: str, model: str = "ms-marco-tinybert"):
        self._split = re.compile(r"[^a-z0-9]+")
        self._q = set(t for t in self._split.split(question.lower()) if t)
        self.model = model

    def _score(self, text: str) -> float:
        d = set(t for t in self._split.split(text.lower()) if t)
        if not self._q or not d:
            return 0.0
        inter = len(self._q & d)
        return 2.0 * inter / (len(self._q) + len(d))

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = [self._score(t) for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "rerank_score", pa.array(scores, pa.float64())
        )


def rerank_table(
    tbl: pa.Table,
    question: str,
    *,
    model: str = "ms-marco-tinybert",
    scorer_cls=None,
    text_col: str = "text",
    concurrency=(1, 4),
    batch_size: int = 64,
) -> pa.Table:
    """Rerank the ranked prefix of a result table by cross-encoder score.

    Rows with ``rank = None`` (the positional-overwrite flagged tail,
    result_ranking.rs:337-358) are never scored and keep their position
    after the ranked block, exactly as the reference's reranker only
    touches ranked results. Ties on score fall back to the ORIGINAL rank
    (stable), and the original rank VALUES are reassigned in the new order
    (whatever convention the caller used is preserved).

    The scorer runs as an actor pool (``map_batches(Cls, concurrency,
    batch_size)``): model load once per actor, batched pairs per call.
    """
    if scorer_cls is None:
        try:
            import torch  # noqa: F401

            scorer_cls = CrossEncoderScorer
        except ImportError:
            scorer_cls = LexicalProxyScorer
    if "rank" not in tbl.schema.names or text_col not in tbl.schema.names:
        raise ValueError(f"result table needs 'rank' and '{text_col}' columns")
    if text_col != "text":
        tbl = tbl.rename_columns(
            ["text" if n == text_col else n for n in tbl.schema.names]
        )
    ranked_mask = pc.is_valid(tbl.column("rank"))
    ranked = tbl.filter(ranked_mask)
    flagged = tbl.filter(pc.invert(ranked_mask))
    if ranked.num_rows == 0:
        # nothing to score: keep the output contract (rerank_score column,
        # original text column name) without spinning up the pool
        out = tbl.append_column(
            "rerank_score", pa.array([None] * tbl.num_rows, pa.float64())
        )
        if text_col != "text":
            out = out.rename_columns(
                [text_col if n == "text" else n for n in out.schema.names]
            )
        return out

    scored_ds = rd.from_arrow(ranked).map_batches(
        scorer_cls,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"question": question, "model": model},
    )
    scored = pa.concat_tables(
        [b for b in scored_ds.iter_batches(batch_format="pyarrow")]
    )
    s = scored.column("rerank_score").to_numpy()
    orig = scored.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((orig, -s))
    scored = scored.take(pa.array(order))
    # reassign the ORIGINAL rank values in the new order — preserves the
    # caller's rank convention (engine paths are 1-based) instead of
    # silently renumbering from 0
    scored = scored.set_column(
        scored.schema.get_field_index("rank"),
        "rank",
        pa.array(np.sort(orig)),
    )
    if flagged.num_rows:
        flagged = flagged.append_column(
            "rerank_score",
            pa.array([None] * flagged.num_rows, pa.float64()),
        )
        scored = pa.concat_tables([scored, flagged])
    if text_col != "text":
        scored = scored.rename_columns(
            [text_col if n == "text" else n for n in scored.schema.names]
        )
    return scored
