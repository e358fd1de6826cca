"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rindex) calls ray.init()/ray.shutdown().

Operator inventory lives in rindex/ops/* (SURVEY.md §2 coverage); the
full-text engine itself is rindex/{build,search}.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: build the inverted index over the sf0.001
    documents corpus with the Ray Data build pipeline (tokenize ->
    groupby-term -> block-compressed postings -> segment writers), then
    serve the reference BM25 query set (block-max WAND) and return the
    top-k table."""
    from rindex.ops.fulltext import q_bm25_topk_documents

    return q_bm25_topk_documents(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rindex.ops import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible op; sketch/model-like
    ops (minhash/simhash/LSH-ANN/langid/multimodal) are rows-only and are
    instead validated by pytest (recall vs exact oracles)."""
    from rindex.ops import registry

    return registry.all_oracle_sql()
