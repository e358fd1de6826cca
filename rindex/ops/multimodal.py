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


TARGET_BOX = (224, 224)


class FakeResizer(FakeDecoder):
    """Actor-pool resize stage: the aspect-preserving fit-into-box geometry
    is real (what a real cv2/PIL stage computes before the pixel op); only
    the pixel transform itself is stubbed behind the fake decoder."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dims = [self.decode_one(p) for p in batch["payload"]]
        w = np.array([d[0] for d in dims], dtype=np.float64)
        h = np.array([d[1] for d in dims], dtype=np.float64)
        scale = np.minimum(TARGET_BOX[0] / w, TARGET_BOX[1] / h)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "src_w": w.astype(np.int64),
                "src_h": h.astype(np.int64),
                "out_w": np.floor(w * scale).astype(np.int64),
                "out_h": np.floor(h * scale).astype(np.int64),
                "scale": np.round(scale, 6),
            }
        )


def q_multimodal_resize_plan(sf_dir: str):
    """Resize stage plan: per payload, the aspect-preserving target
    geometry for a 224x224 box (actor pool, small batches)."""
    return make_payloads(sf_dir).map_batches(
        FakeResizer,
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, 2),
        num_cpus=1,
    )


QUERIES["multimodal_resize_plan"] = q_multimodal_resize_plan


FRAME_SAMPLE_N = 8


def q_multimodal_frame_sample(sf_dir: str):
    """Frame-sampling stage for video-like payloads: deterministic fake
    (fps, duration) metadata per payload, REAL uniform frame-index
    selection (N evenly spaced frames, the standard decode plan a real
    ffmpeg stage would execute).  One output row per sampled frame —
    flat_map-style expansion inside map_batches."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _h

        rows = []
        for did, p in zip(batch["doc_id"], batch["payload"]):
            hd = _h.md5(p).digest()
            fps = 12 + hd[2] % 19          # 12..30 fps
            duration_ms = 1000 + int.from_bytes(hd[3:5], "little") % 9000
            n_frames = max(1, fps * duration_ms // 1000)
            idx = np.unique(
                np.linspace(0, n_frames - 1, FRAME_SAMPLE_N).astype(np.int64)
            )
            for fi in idx:
                rows.append((did, int(fps), int(n_frames), int(fi),
                             round(float(fi) / fps, 6)))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "fps", "n_frames", "frame_idx", "ts_sec"],
        )

    return make_payloads(sf_dir).map_batches(
        f, batch_format="pandas", batch_size=256
    )


QUERIES["multimodal_frame_sample"] = q_multimodal_frame_sample
