"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake, or NotImplementedError in
strict mode) while the Ray-side plumbing — binary column schema, actor-pool
map_batches stage with per-actor "model" setup, bounded batch sizes for
large payloads, typed metadata output — is real and tested.

Reference anchor: Tika extraction of rich documents
(`solr/contrib/extraction/src/java/org/apache/solr/handler/extraction/
ExtractingRequestHandler.java`) — binary in, typed fields out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

STRICT_DECODE = False  # True -> decode raises NotImplementedError


def make_payloads(sf_dir: str):
    """Synthesize a deterministic opaque binary column from documents.text
    (stands in for image bytes; schema: doc_id, payload:binary, mime)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        payloads, mimes = [], []
        for x in t["text"].to_pylist():
            d = hashlib.sha256((x or "").encode()).digest()
            payloads.append(d * 32)  # 1 KiB opaque payload
            mimes.append("image/fake" if d[0] % 2 == 0 else "audio/fake")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class FakeDecoder:
    """Actor-pool decode stage: heavy decoder state would be loaded ONCE per
    actor here (the LangDetect-URP / LTR-model pattern); per-batch __call__
    emits typed metadata.  Small batch_size because payload rows are wide."""

    def __init__(self, strict: bool = STRICT_DECODE):
        self.strict = strict
        # real impl: self.codec = load_image_codec()  # not in this container

    def decode_one(self, payload: bytes) -> tuple[int, int]:
        if self.strict:
            raise NotImplementedError(
                "image/audio codecs unavailable in this container"
            )
        h = hashlib.md5(payload).digest()
        return 16 + h[0] % 240, 16 + h[1] % 240  # fake (width, height)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dims = [self.decode_one(p) for p in batch["payload"]]
        w = np.array([d[0] for d in dims], dtype=np.int64)
        h = np.array([d[1] for d in dims], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "mime": batch["mime"],
                "n_bytes": batch["payload"].map(len).astype(np.int64),
                "width": w,
                "height": h,
                "aspect": (w / h).round(6),
            }
        )


def q_multimodal_decode_features(sf_dir: str):
    """Binary payload -> actor-pool decode -> typed feature columns."""
    return make_payloads(sf_dir).map_batches(
        FakeDecoder,
        batch_format="pandas",
        batch_size=256,  # wide binary rows -> small batches
        concurrency=(1, 2),
        num_cpus=1,
    )


QUERIES["multimodal_decode_features"] = q_multimodal_decode_features
