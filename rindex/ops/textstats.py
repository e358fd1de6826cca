"""Text-analysis operators over `documents` (training-data-pipeline ops).

Reference anchors: language-ID URP (`solr/contrib/langid/src/java/org/apache/
solr/update/processor/LangDetectLanguageIdentifierUpdateProcessor.java`),
signature URPs (`solr/core/src/java/org/apache/solr/update/processor/
{SignatureUpdateProcessorFactory,TextProfileSignature}.java`), analyze()
stream evaluator (`solr/solrj/.../io/eval/AnalyzeEvaluator.java`).

The SQL-token regex `[0-9a-z]+` is shared verbatim between the Ray
implementations and the DuckDB oracles.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

_TOKEN_RE = re.compile(r"[0-9a-z]+")
_PUNCT_RE = re.compile(r"[.!?,;:]")

STOPSETS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "un", "une"},
    "es": {"el", "la", "los", "y", "es", "un", "una"},
}


def q_token_count_documents(sf_dir: str):
    """Token counting (whitespace/regex tokenizer as a column function —
    the analyze() evaluator mapping)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.utf8_lower(t["text"]).to_pylist()
        n = np.fromiter(
            (len(_TOKEN_RE.findall(x or "")) for x in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(n)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["token_count_documents"] = q_token_count_documents
ORACLE["token_count_documents"] = """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[0-9a-z]+'))::BIGINT AS n_tokens
    FROM documents
"""


def q_quality_score_documents(sf_dir: str):
    """Quality scoring: length / punctuation / token stats + a keep flag
    (the heuristic-quality-filter stage of a training-data pipeline)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        raw = t["text"].to_pylist()
        low = pc.utf8_lower(t["text"]).to_pylist()
        n_chars = np.fromiter((len(x or "") for x in raw), np.int64, len(raw))
        n_words = np.fromiter(
            (len(_TOKEN_RE.findall(x or "")) for x in low), np.int64, len(low)
        )
        n_punct = np.fromiter(
            (len(_PUNCT_RE.findall(x or "")) for x in raw), np.int64, len(raw)
        )
        keep = (n_words >= 5) & (n_words <= 2000) & (
            n_punct <= 0.1 * np.maximum(n_chars, 1)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "n_punct": pa.array(n_punct),
                "is_quality": pa.array(keep),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["quality_score_documents"] = q_quality_score_documents
ORACLE["quality_score_documents"] = """
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len(regexp_extract_all(lower(text), '[0-9a-z]+'))::BIGINT AS n_words,
           (length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))::BIGINT AS n_punct,
           (len(regexp_extract_all(lower(text), '[0-9a-z]+')) BETWEEN 5 AND 2000
            AND (length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))
                <= 0.1 * greatest(length(text), 1)) AS is_quality
    FROM documents
"""


def q_fingerprint_documents(sf_dir: str):
    """Document fingerprinting: content hash of the normalized token stream
    (SignatureUpdateProcessorFactory / MD5Signature mapping)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        low = pc.utf8_lower(t["text"]).to_pylist()
        fps = [
            hashlib.md5(" ".join(_TOKEN_RE.findall(x or "")).encode()).hexdigest()
            for x in low
        ]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["fingerprint_documents"] = q_fingerprint_documents
ORACLE["fingerprint_documents"] = """
    SELECT doc_id,
           md5(array_to_string(regexp_extract_all(lower(text), '[0-9a-z]+'), ' ')) AS fingerprint
    FROM documents
"""


def q_textprofile_signature_documents(sf_dir: str):
    """TextProfileSignature: quantized term-frequency profile hash for fuzzy
    dedup (reference: `solr/core/src/java/org/apache/solr/update/processor/
    TextProfileSignature.java` — terms with quantized freq, sorted, hashed).
    Quantization: round(tf / max_tf * 4)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from collections import Counter

        low = pc.utf8_lower(t["text"]).to_pylist()
        sigs = []
        for x in low:
            c = Counter(_TOKEN_RE.findall(x or ""))
            if not c:
                sigs.append(hashlib.md5(b"").hexdigest())
                continue
            mx = max(c.values())
            items = sorted(
                f"{w}:{round(v / mx * 4)}" for w, v in c.items()
            )
            sigs.append(hashlib.md5(" ".join(items).encode()).hexdigest())
        return pa.table({"doc_id": t["doc_id"], "signature": pa.array(sigs)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


QUERIES["textprofile_signature_documents"] = q_textprofile_signature_documents
# No SQL oracle: python round() is banker's rounding on .5 quantization
# boundaries; replicating that plus the profile string assembly in SQL is
# not portable.  Covered by pytest golden tests instead.


def q_langid_documents(sf_dir: str):
    """Language-ID enrichment via stopword-profile heuristic (LangDetect URP
    mapping; the model here is a dictionary profile loaded once per actor —
    the actor-pool stateful-stage pattern)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    class LangId:
        def __init__(self):
            self.profiles = {k: frozenset(v) for k, v in STOPSETS.items()}
            self.rx = re.compile(r"[0-9a-z]+")

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            preds = []
            for x in batch["text"]:
                toks = set(self.rx.findall((x or "").lower() if isinstance(x, str) else ""))
                scores = {
                    lang: len(toks & sw) for lang, sw in self.profiles.items()
                }
                best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
                preds.append(best[0] if best[1] > 0 else "und")
            return pd.DataFrame(
                {"doc_id": batch["doc_id"], "pred_lang": preds}
            )

    return ds.map_batches(
        LangId, batch_format="pandas", batch_size=1024, concurrency=(1, 2)
    )


QUERIES["langid_documents"] = q_langid_documents
