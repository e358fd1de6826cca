"""Aggregates QUERIES / ORACLE registries from all ops modules."""

from __future__ import annotations


def _modules():
    # imports fail LOUD: a swallowed ImportError would silently drop a
    # whole module's ops from the driver's query set and verification
    # would pass vacuously on the remainder
    from rindex.ops import (
        analysis_ext, ann, dedup, fulltext, loaders, multimodal,
        relational, search_ext, sketches, textstats,
    )

    return [
        relational, fulltext, dedup, textstats, ann, multimodal,
        search_ext, loaders, analysis_ext, sketches,
    ]


def all_queries() -> dict:
    out = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return out


def all_oracle_sql() -> dict:
    out = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
