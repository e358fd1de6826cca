"""rindex — a Ray-Data-native full-text inverted-index + BM25 top-k engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the Lucene/Solr 8.x reference (`zsgyulavari/lucene-solr`), built idiomatically
on `ray.data.Dataset` pipelines over Arrow batches.  See SURVEY.md for the
structural analysis of the reference and the mapping of every operator family
onto Ray Data primitives.

Layout (SURVEY.md §7.0):
    schema.py    constants + Arrow schemas (transcripts, token rows, postings)
    analysis.py  StandardAnalyzer-equivalent tokenization chain (pluggable)
    codec.py     delta + FOR bit-packed posting blocks, SmallFloat norms
    bm25.py      BM25 scoring kernel (k1=1.2, b=0.75), Lucene-lossy norm mode
    build.py     Ray Data index-build pipeline (read -> seg -> tokenize ->
                 salted groupby(term) -> postings -> segment writer actors)
    segments.py  segment dir IO, manifest with lineage/metrics, atomic publish
    merge.py     TieredMergePolicy-semantics merge selection + merge tasks
    search.py    query AST, per-segment top-k, block-max WAND, global merge
    oracle.py    naive full-scan BM25 oracle (the in-repo reference stand-in)
    fixtures.py  deterministic synthetic transcript + query corpora
    ops/         relational / dedup / ANN / text-analysis operators
                 (SURVEY.md §2 coverage, exercised via __ray_entry__.py)
"""

from rindex.schema import BLOCK_SIZE, K1, B

__all__ = ["BLOCK_SIZE", "K1", "B"]
