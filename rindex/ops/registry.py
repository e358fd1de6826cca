"""Aggregates QUERIES / ORACLE registries from all ops modules."""

from __future__ import annotations


def _modules():
    from rindex.ops import relational

    mods = [relational]
    for name in (
        "fulltext", "dedup", "textstats", "ann", "multimodal",
        "search_ext", "loaders", "analysis_ext", "sketches",
    ):
        try:
            mods.append(
                __import__(f"rindex.ops.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods


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
