"""Operator registries for __ray_entry__.py (SURVEY.md §2 coverage).

Each ops module exposes QUERIES (name -> callable(sf_dir) -> Dataset /
DataFrame / Table) and ORACLE (name -> DuckDB SQL).  Ops without a SQL
oracle (model-like / sketch-like semantics) appear only in QUERIES and get
the driver's weaker rows-only check; pytest covers them instead.
"""
