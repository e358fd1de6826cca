"""Multimodal columns: binary image payloads + typed metadata, with a REAL
decode path.

The payloads are genuine P6 PPM images (the uncompressed netpbm format:
`P6\\n<w> <h>\\n255\\n` header + raw RGB24) synthesized deterministically
from doc_id, so the decode stage does real work with no codec libraries:
header parsing, `np.frombuffer` -> (h, w, 3) pixel array, vectorized
channel statistics and nearest-neighbor resampling.  Compressed codecs
(JPEG etc.) are NOT available in this container — payloads carrying a
codec mime route to a loud NotImplementedError in strict mode / a logged
skip otherwise, exactly how a real pipeline quarantines undecodable rows.

Because the pixel function is arithmetic ((a*r + b*c + s) mod 256 per
channel, parameters from md5(doc_id) bytes), EVERY stage here is
SQL-expressible: the DuckDB oracles re-derive the image from the same
bytes (md5_number_upper/lower = digest halves little-endian) and recompute
the channel means / thumbnail / frame plan over unnested pixel grids.

Reference anchor: Tika extraction of rich documents
(`solr/contrib/extraction/src/java/org/apache/solr/handler/extraction/
ExtractingRequestHandler.java`) — binary in, typed fields out; the
actor-pool stage shape (decoder state per actor, small batches for wide
binary rows) is the LangDetect-URP / LTR-model pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from rindex.schema import pool_cap
from rindex.ops.util import read_table

QUERIES: dict = {}
ORACLE: dict = {}

STRICT_DECODE = False  # True -> codec mimes raise NotImplementedError
JPEG_EVERY = 17        # doc_id % 17 == 0 -> stub-codec mime row
PPM_MIME = "image/x-portable-pixmap"
THUMB = 16             # nearest-neighbor thumbnail side
TARGET_BOX = (224, 224)
FRAME_SAMPLE_N = 8


def _img_params(doc_id: int) -> tuple:
    """(w, h, ar[3], ac[3], s[3], fps, duration_ms) — all from the md5 of
    the DECIMAL doc_id string, byte-for-byte what the SQL oracles read via
    md5_number_upper/lower."""
    d = hashlib.md5(str(int(doc_id)).encode()).digest()
    w = 16 + d[0] % 48
    h = 16 + d[1] % 48
    ar = [1 + (d[2] + k) % 5 for k in range(3)]
    ac = [1 + (d[3] + k) % 5 for k in range(3)]
    s = [d[4], d[5], d[6]]
    fps = 12 + d[8] % 19                       # digest[8] = lower-half byte 0
    duration_ms = 1000 + (d[9] | (d[10] << 8)) % 9000
    return w, h, ar, ac, s, fps, duration_ms


def _render_ppm(doc_id: int) -> bytes:
    w, h, ar, ac, s, _f, _d = _img_params(doc_id)
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    img = np.stack(
        [(ar[k] * r + ac[k] * c + s[k]) % 256 for k in range(3)], axis=-1
    ).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def make_payloads(sf_dir: str):
    """Deterministic binary image column: real P6 PPM bytes per doc
    (schema: doc_id, payload:binary, mime); every JPEG_EVERY-th doc gets a
    codec mime + opaque bytes to keep the quarantine path exercised."""
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        payloads, mimes = [], []
        for did in t["doc_id"].to_pylist():
            if did % JPEG_EVERY == 0:
                payloads.append(
                    hashlib.sha256(str(did).encode()).digest() * 32
                )
                mimes.append("image/jpeg")
            else:
                payloads.append(_render_ppm(did))
                mimes.append(PPM_MIME)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class PpmDecoder:
    """Actor-pool decode stage: decoder state (header pattern, skip
    counters) lives per actor; __call__ does the real parse + pixel work
    per batch.  Small batch_size because payload rows are wide."""

    def __init__(self, strict: bool = STRICT_DECODE):
        self.strict = strict
        self.skipped = 0

    def decode_one(self, payload: bytes, mime: str) -> np.ndarray | None:
        """(h, w, 3) uint8 pixels, or None for quarantined codec rows."""
        if mime != PPM_MIME or not payload.startswith(b"P6"):
            if self.strict:
                raise NotImplementedError(
                    f"codec {mime!r} unavailable in this container"
                )
            self.skipped += 1
            return None
        # header: magic, width, height, maxval, then EXACTLY ONE
        # whitespace byte before the raw RGB24 — bytes.split would eat a
        # whitespace-valued first pixel byte, so anchor with a regex and
        # slice at the match end
        import re as _re

        m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if m is None:
            raise ValueError("malformed PPM header")
        w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if maxval != 255:
            raise ValueError(f"unsupported maxval {maxval}")
        px = np.frombuffer(payload, dtype=np.uint8, offset=m.end(),
                           count=w * h * 3)
        return px.reshape(h, w, 3)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            img = self.decode_one(p, m)
            if img is None:
                continue
            h, w, _ = img.shape
            means = img.reshape(-1, 3).mean(axis=0)
            rows.append(
                (did, m, w, h, w * h,
                 round(float(means[0]), 6),
                 round(float(means[1]), 6),
                 round(float(means[2]), 6))
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "mime", "width", "height", "n_pixels",
                     "mean_r", "mean_g", "mean_b"],
        ).astype({"doc_id": np.int64, "width": np.int64,
                  "height": np.int64, "n_pixels": np.int64})


def q_multimodal_decode_features(sf_dir: str):
    """Binary payload -> actor-pool PPM decode -> typed feature columns
    (dimensions + per-channel means over the REAL pixel array).  Codec
    rows are quarantined (excluded), as the oracle's WHERE mirrors."""
    return make_payloads(sf_dir).map_batches(
        PpmDecoder,
        batch_format="pandas",
        batch_size=256,  # wide binary rows -> small batches
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )


QUERIES["multimodal_decode_features"] = q_multimodal_decode_features

# byte k of the md5 digest: first 8 bytes via md5_number_upper (little-
# endian), bytes 8.. via md5_number_lower — verified equal to python
# digest[k] in tests.
_D = "md5_number_upper(doc_id::VARCHAR)"
_DL = "md5_number_lower(doc_id::VARCHAR)"


def _byte(expr: str, k: int) -> str:
    return f"(({expr} >> {8 * k}) & 255)::BIGINT"


_PAR = f"""
    par AS (
      SELECT doc_id,
             16 + {_byte(_D, 0)} % 48 AS w,
             16 + {_byte(_D, 1)} % 48 AS h,
             {_byte(_D, 2)} AS d2, {_byte(_D, 3)} AS d3,
             {_byte(_D, 4)} AS s0, {_byte(_D, 5)} AS s1,
             {_byte(_D, 6)} AS s2
      FROM documents WHERE doc_id % {JPEG_EVERY} <> 0
    )
"""

ORACLE["multimodal_decode_features"] = f"""
    WITH {_PAR},
    grid AS (
      SELECT p.*, r.i AS r, c.j AS c
      FROM par p, range(64) r(i), range(64) c(j)
      WHERE r.i < p.h AND c.j < p.w
    ),
    m AS (
      SELECT doc_id,
             avg(((1 + (d2 + 0) % 5) * r + (1 + (d3 + 0) % 5) * c + s0) % 256) AS mean_r,
             avg(((1 + (d2 + 1) % 5) * r + (1 + (d3 + 1) % 5) * c + s1) % 256) AS mean_g,
             avg(((1 + (d2 + 2) % 5) * r + (1 + (d3 + 2) % 5) * c + s2) % 256) AS mean_b
      FROM grid GROUP BY doc_id
    )
    SELECT p.doc_id, '{PPM_MIME}' AS mime, p.w AS width, p.h AS height,
           (p.w * p.h)::BIGINT AS n_pixels,
           round(m.mean_r, 6) AS mean_r, round(m.mean_g, 6) AS mean_g,
           round(m.mean_b, 6) AS mean_b
    FROM par p JOIN m USING (doc_id)
"""


class PpmResizer(PpmDecoder):
    """Actor-pool resize stage: the aspect-preserving fit-into-224-box
    geometry PLUS a real nearest-neighbor 16x16 thumbnail resample of the
    decoded pixels (pure fancy-indexing — src row (r*h)//16, col
    (c*w)//16) with per-channel thumbnail means."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        ti = np.arange(THUMB, dtype=np.int64)
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            img = self.decode_one(p, m)
            if img is None:
                continue
            h, w, _ = img.shape
            scale = min(TARGET_BOX[0] / w, TARGET_BOX[1] / h)
            thumb = img[(ti * h) // THUMB][:, (ti * w) // THUMB]
            tm = thumb.reshape(-1, 3).mean(axis=0)
            rows.append(
                (did, w, h, int(w * scale), int(h * scale),
                 round(scale, 6),
                 round(float(tm[0]), 6), round(float(tm[1]), 6),
                 round(float(tm[2]), 6))
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "src_w", "src_h", "out_w", "out_h", "scale",
                     "thumb_r", "thumb_g", "thumb_b"],
        ).astype({"doc_id": np.int64, "src_w": np.int64, "src_h": np.int64,
                  "out_w": np.int64, "out_h": np.int64})


def q_multimodal_resize_plan(sf_dir: str):
    """Resize stage: target geometry for the 224x224 box + a REAL 16x16
    nearest-neighbor thumbnail of the decoded image (actor pool, small
    batches)."""
    return make_payloads(sf_dir).map_batches(
        PpmResizer,
        batch_format="pandas",
        batch_size=256,
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )


QUERIES["multimodal_resize_plan"] = q_multimodal_resize_plan

ORACLE["multimodal_resize_plan"] = f"""
    WITH {_PAR},
    tgrid AS (
      SELECT p.*, r.i AS tr, c.j AS tc,
             (r.i * p.h) // {THUMB} AS sr, (c.j * p.w) // {THUMB} AS sc
      FROM par p, range({THUMB}) r(i), range({THUMB}) c(j)
    ),
    t AS (
      SELECT doc_id,
             avg(((1 + (d2 + 0) % 5) * sr + (1 + (d3 + 0) % 5) * sc + s0) % 256) AS tr_,
             avg(((1 + (d2 + 1) % 5) * sr + (1 + (d3 + 1) % 5) * sc + s1) % 256) AS tg_,
             avg(((1 + (d2 + 2) % 5) * sr + (1 + (d3 + 2) % 5) * sc + s2) % 256) AS tb_
      FROM tgrid GROUP BY doc_id
    )
    SELECT p.doc_id, p.w AS src_w, p.h AS src_h,
           -- floor, not cast: DOUBLE->BIGINT casts ROUND in DuckDB while
           -- python int() truncates
           floor(p.w * least({TARGET_BOX[0]} / p.w::DOUBLE,
                             {TARGET_BOX[1]} / p.h::DOUBLE))::BIGINT AS out_w,
           floor(p.h * least({TARGET_BOX[0]} / p.w::DOUBLE,
                             {TARGET_BOX[1]} / p.h::DOUBLE))::BIGINT AS out_h,
           round(least({TARGET_BOX[0]} / p.w::DOUBLE,
                       {TARGET_BOX[1]} / p.h::DOUBLE), 6) AS scale,
           round(t.tr_, 6) AS thumb_r, round(t.tg_, 6) AS thumb_g,
           round(t.tb_, 6) AS thumb_b
    FROM par p JOIN t USING (doc_id)
"""


def q_multimodal_frame_sample(sf_dir: str):
    """Frame-sampling stage for video-like payloads: (fps, duration)
    metadata from the doc's digest bytes, REAL uniform frame-index
    selection with INTEGER arithmetic ((i * (n-1)) // (N-1) — exact on
    both sides, no float linspace edge cases), one output row per sampled
    frame — flat_map-style expansion inside map_batches.  Codec rows are
    quarantined like the other stages."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, m in zip(batch["doc_id"], batch["mime"]):
            if m != PPM_MIME:
                if STRICT_DECODE:  # same loud-quarantine contract as the
                    # decode/resize stages (PpmDecoder.decode_one)
                    raise NotImplementedError(
                        f"codec {m!r} unavailable in this container"
                    )
                continue
            _w, _h, _ar, _ac, _s, fps, duration_ms = _img_params(did)
            n_frames = max(1, fps * duration_ms // 1000)
            idx = np.unique(
                (np.arange(FRAME_SAMPLE_N, dtype=np.int64) * (n_frames - 1))
                // (FRAME_SAMPLE_N - 1)
            )
            for fi in idx:
                rows.append((did, int(fps), int(n_frames), int(fi),
                             round(float(fi) / fps, 6)))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "fps", "n_frames", "frame_idx", "ts_sec"],
        ).astype({"doc_id": np.int64, "fps": np.int64,
                  "n_frames": np.int64, "frame_idx": np.int64})

    return make_payloads(sf_dir).map_batches(
        f, batch_format="pandas", batch_size=256
    )


QUERIES["multimodal_frame_sample"] = q_multimodal_frame_sample

ORACLE["multimodal_frame_sample"] = f"""
    WITH vid AS (
      SELECT doc_id,
             12 + {_byte(_DL, 0)} % 19 AS fps,
             1000 + ({_byte(_DL, 1)} | ({_byte(_DL, 2)} << 8)) % 9000
               AS duration_ms
      FROM documents WHERE doc_id % {JPEG_EVERY} <> 0
    ),
    nf AS (
      SELECT doc_id, fps,
             greatest(1, fps * duration_ms // 1000) AS n_frames
      FROM vid
    ),
    idx AS (
      SELECT DISTINCT doc_id, fps, n_frames,
             (r.i * (n_frames - 1)) // ({FRAME_SAMPLE_N} - 1) AS frame_idx
      FROM nf, range({FRAME_SAMPLE_N}) r(i)
    )
    SELECT doc_id, fps, n_frames, frame_idx,
           round(frame_idx / fps::DOUBLE, 6) AS ts_sec
    FROM idx
"""


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE payloads with a REAL header-walking decode
# ---------------------------------------------------------------------------

AUDIO_CODEC_EVERY = 23      # doc_id % 23 == 0 -> compressed-codec mime row
WAV_MIME = "audio/wav"
WAV_RATE = 8000
WAV_WINDOW = 100            # samples per energy window


def _audio_params(doc_id: int) -> tuple:
    """(a, b, c, n) from md5 lower-half bytes 11..15 (digest[11..15] —
    disjoint from the image/video parameter bytes so the modalities are
    independent): samples x[i] = (a*i*i + b*i + c) % 256, 8-bit unsigned
    mono PCM."""
    d = hashlib.md5(str(int(doc_id)).encode()).digest()
    a = 1 + d[11] % 7
    b = d[12]
    c = d[13]
    n = 400 + (d[14] | (d[15] << 8)) % 800
    return a, b, c, n


def _render_wav(doc_id: int) -> bytes:
    import struct

    a, b, c, n = _audio_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    x = ((a * i * i + b * i + c) % 256).astype(np.uint8)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
        + b"data" + struct.pack("<I", n)
    )
    return hdr + x.tobytes()


def make_audio_payloads(sf_dir: str):
    """Deterministic binary audio column (doc_id, payload:binary, mime);
    every AUDIO_CODEC_EVERY-th doc carries a compressed mime + opaque
    bytes for the quarantine path."""
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        payloads, mimes = [], []
        for did in t["doc_id"].to_pylist():
            if did % AUDIO_CODEC_EVERY == 0:
                payloads.append(
                    hashlib.sha256(b"mp3" + str(did).encode()).digest() * 16
                )
                mimes.append("audio/mpeg")
            else:
                payloads.append(_render_wav(did))
                mimes.append(WAV_MIME)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class WavDecoder:
    """Actor-pool audio decode: a REAL RIFF chunk walk (magic checks, fmt
    field parse, data chunk located by iterating chunk headers — not a
    fixed offset), then vectorized integer energy features.  All-integer
    outputs make the oracle compare exact."""

    def __init__(self, strict: bool = STRICT_DECODE):
        self.strict = strict
        self.skipped = 0

    def decode_one(self, payload: bytes, mime: str):
        import struct

        if mime != WAV_MIME or payload[:4] != b"RIFF":
            if self.strict:
                raise NotImplementedError(
                    f"codec {mime!r} unavailable in this container"
                )
            self.skipped += 1
            return None
        if payload[8:12] != b"WAVE":
            raise ValueError("malformed RIFF: not a WAVE form")
        pos, rate, bits, channels = 12, None, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if cid == b"fmt ":
                fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                    "<HHIIHH", payload, pos + 8
                )
                if fmt != 1:
                    raise ValueError(f"non-PCM wav (fmt={fmt})")
            elif cid == b"data":
                if rate is None:
                    raise ValueError("data chunk before fmt")
                if bits != 8 or channels != 1:
                    raise ValueError("only 8-bit mono PCM supported")
                x = np.frombuffer(payload, np.uint8, count=size,
                                  offset=pos + 8)
                return rate, x
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        raise ValueError("no data chunk")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            dec = self.decode_one(p, m)
            if dec is None:
                continue
            rate, x8 = dec
            x = x8.astype(np.int64)
            n = len(x)
            nw = -(-n // WAV_WINDOW)
            pad = np.zeros(nw * WAV_WINDOW, np.int64)
            pad[:n] = x  # zero-pad: max per window unaffected (x >= 0)
            rows.append(
                (did, n, rate, int(x.sum()), int((x * x).sum()),
                 nw, int(pad.reshape(nw, WAV_WINDOW).max(axis=1).sum()))
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "n_samples", "sample_rate", "sum_amp",
                     "sum_sq", "n_windows", "sum_window_max"],
        ).astype(np.int64)


def q_multimodal_audio_energy(sf_dir: str):
    """Binary audio payload -> actor-pool RIFF/WAVE decode -> integer
    energy features (amplitude sum, energy sum, per-window peak sum —
    the windowed-feature shape of a real audio pipeline).  Codec rows
    quarantine like the image path."""
    out = make_audio_payloads(sf_dir).map_batches(
        WavDecoder,
        batch_format="pandas",
        batch_size=256,
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


QUERIES["multimodal_audio_energy"] = q_multimodal_audio_energy

ORACLE["multimodal_audio_energy"] = f"""
    WITH apar AS (
      SELECT doc_id,
             1 + {_byte(_DL, 3)} % 7 AS a,
             {_byte(_DL, 4)} AS b,
             {_byte(_DL, 5)} AS c,
             400 + ({_byte(_DL, 6)} | ({_byte(_DL, 7)} << 8)) % 800 AS n
      FROM documents WHERE doc_id % {AUDIO_CODEC_EVERY} <> 0
    ),
    samples AS (
      SELECT p.doc_id, r.i AS i,
             (p.a * r.i * r.i + p.b * r.i + p.c) % 256 AS x
      FROM apar p, range(1200) r(i)
      WHERE r.i < p.n
    ),
    wins AS (
      SELECT doc_id, i // {WAV_WINDOW} AS w, max(x) AS wmax
      FROM samples GROUP BY 1, 2
    ),
    wagg AS (
      SELECT doc_id, count(*)::BIGINT AS n_windows,
             sum(wmax)::BIGINT AS sum_window_max
      FROM wins GROUP BY 1
    )
    SELECT s.doc_id, max(p.n)::BIGINT AS n_samples,
           {WAV_RATE}::BIGINT AS sample_rate,
           sum(s.x)::BIGINT AS sum_amp,
           sum(s.x * s.x)::BIGINT AS sum_sq,
           max(w.n_windows) AS n_windows,
           max(w.sum_window_max) AS sum_window_max
    FROM samples s
    JOIN apar p ON s.doc_id = p.doc_id
    JOIN wagg w ON s.doc_id = w.doc_id
    GROUP BY s.doc_id
    ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# Video: multi-frame container with a REAL frame-walking decode
# ---------------------------------------------------------------------------

VIDEO_CODEC_EVERY = 31   # doc_id % 31 == 0 -> compressed-codec mime row
VID_MIME = "video/x-raw-ppm"
VID_MAGIC = b"VID0"
VID_FRAME_STEP = 7       # pixel formula shifts by 7*frame_idx per frame


def _video_params(doc_id: int) -> int:
    """n_frames from digest byte 7 (disjoint from image/audio bytes)."""
    d = hashlib.md5(str(int(doc_id)).encode()).digest()
    return 2 + d[7] % 4


def _render_video(doc_id: int) -> bytes:
    """VID0 container: magic + u16 frame count, then each frame as a FULL
    embedded P6 PPM (header + raw RGB24) whose pixel formula shifts by
    7*frame_idx — consecutive frames differ deterministically."""
    import struct

    w, h, ar, ac, s, _f, _d = _img_params(doc_id)
    n_frames = _video_params(doc_id)
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    frames = []
    for f in range(n_frames):
        img = np.stack(
            [(ar[k] * r + ac[k] * c + s[k] + VID_FRAME_STEP * f) % 256
             for k in range(3)],
            axis=-1,
        ).astype(np.uint8)
        frames.append(b"P6\n%d %d\n255\n" % (w, h) + img.tobytes())
    return VID_MAGIC + struct.pack("<H", n_frames) + b"".join(frames)


def make_video_payloads(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        payloads, mimes = [], []
        for did in t["doc_id"].to_pylist():
            if did % VIDEO_CODEC_EVERY == 0:
                payloads.append(
                    hashlib.sha256(b"h264" + str(did).encode()).digest() * 16
                )
                mimes.append("video/mp4")
            else:
                payloads.append(_render_video(did))
                mimes.append(VID_MIME)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(mimes, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class VideoDecoder(PpmDecoder):
    """Actor-pool video decode: container magic + frame-count parse, then a
    frame WALK — each frame's P6 header is re-parsed (frames are not
    assumed equal-sized) and the cursor advances by that frame's true
    byte length.  Emits one row per frame with INTEGER pixel sums, so the
    oracle compare is exact."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import re as _re
        import struct

        rows = []
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            if m != VID_MIME or p[:4] != VID_MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        f"codec {m!r} unavailable in this container"
                    )
                self.skipped += 1
                continue
            (n_frames,) = struct.unpack_from("<H", p, 4)
            pos = 6
            for f in range(n_frames):
                mm = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", p[pos:])
                if mm is None:
                    raise ValueError(f"malformed frame {f} in doc {did}")
                w, h = int(mm.group(1)), int(mm.group(2))
                px = np.frombuffer(
                    p, dtype=np.uint8, offset=pos + mm.end(), count=w * h * 3
                ).astype(np.int64)
                rows.append((did, f, w, h, int(px.sum())))
                pos += mm.end() + w * h * 3
        return pd.DataFrame(
            rows, columns=["doc_id", "frame_idx", "width", "height", "sum_px"]
        ).astype(np.int64)


def q_multimodal_video_decode(sf_dir: str):
    """Multi-frame video payload -> actor-pool container walk -> one row
    per decoded frame with integer pixel sums (the image/audio decode
    pattern completed for the video modality; codec mimes quarantine)."""
    out = make_video_payloads(sf_dir).map_batches(
        VideoDecoder,
        batch_format="pandas",
        batch_size=128,   # video rows are the widest payloads
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )
    return (
        out.to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )


QUERIES["multimodal_video_decode"] = q_multimodal_video_decode

ORACLE["multimodal_video_decode"] = f"""
    WITH par AS (
      SELECT doc_id,
             16 + {_byte(_D, 0)} % 48 AS w,
             16 + {_byte(_D, 1)} % 48 AS h,
             {_byte(_D, 2)} AS d2, {_byte(_D, 3)} AS d3,
             {_byte(_D, 4)} AS s0, {_byte(_D, 5)} AS s1,
             {_byte(_D, 6)} AS s2,
             2 + {_byte(_D, 7)} % 4 AS n_frames
      FROM documents WHERE doc_id % {VIDEO_CODEC_EVERY} <> 0
    ),
    frames AS (
      SELECT p.*, fr.i AS frame_idx
      FROM par p, range(6) fr(i)
      WHERE fr.i < p.n_frames
    ),
    grid AS (
      SELECT f.doc_id, f.frame_idx, f.w, f.h,
             ((1 + (d2 + 0) % 5) * r.i + (1 + (d3 + 0) % 5) * c.j
              + s0 + {VID_FRAME_STEP} * frame_idx) % 256
             + ((1 + (d2 + 1) % 5) * r.i + (1 + (d3 + 1) % 5) * c.j
                + s1 + {VID_FRAME_STEP} * frame_idx) % 256
             + ((1 + (d2 + 2) % 5) * r.i + (1 + (d3 + 2) % 5) * c.j
                + s2 + {VID_FRAME_STEP} * frame_idx) % 256 AS px3
      FROM frames f, range(64) r(i), range(64) c(j)
      WHERE r.i < f.h AND c.j < f.w
    )
    SELECT doc_id, frame_idx, max(w)::BIGINT AS width,
           max(h)::BIGINT AS height, sum(px3)::BIGINT AS sum_px
    FROM grid
    GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx
"""


class PpmBoxDownsampler(PpmDecoder):
    """Actor-pool 2x2 box-filter downsample (area averaging — the
    classic antialiased half-resolution step; PIL's Image.resize(...,
    BOX) computes the same cell sums).  Stays INTEGER-exact end to end:
    the op emits each channel's position-weighted checksum over the
    per-cell pixel SUMS (weight = (i*down_w + j) % 97), which pins both
    the cell values AND their grid alignment, and the SQL oracle
    re-derives it pixel-by-pixel from the md5 image formula.  Odd edges
    crop (h//2, w//2 cells), the standard box-downsample convention."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            img = self.decode_one(p, m)
            if img is None:
                continue
            h, w, _ = img.shape
            h2, w2 = h // 2, w // 2
            cells = (
                img[: 2 * h2, : 2 * w2]
                .astype(np.int64)
                .reshape(h2, 2, w2, 2, 3)
                .sum(axis=(1, 3))
            )  # (h2, w2, 3) integer cell sums
            wgt = (
                (np.arange(h2, dtype=np.int64)[:, None] * w2
                 + np.arange(w2, dtype=np.int64)[None, :]) % 97
            )
            ck = (cells * wgt[:, :, None]).sum(axis=(0, 1))
            rows.append(
                (did, w2, h2, int(ck[0]), int(ck[1]), int(ck[2]))
            )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "down_w", "down_h", "ck_r", "ck_g", "ck_b"],
        ).astype({c: np.int64 for c in
                  ["doc_id", "down_w", "down_h", "ck_r", "ck_g", "ck_b"]})


def q_multimodal_box_downsample(sf_dir: str):
    """Binary payload -> actor-pool decode -> 2x2 box downsample ->
    integer checksums of the cell-sum grid (exact compare)."""
    return make_payloads(sf_dir).map_batches(
        PpmBoxDownsampler,
        batch_format="pandas",
        batch_size=256,
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )


QUERIES["multimodal_box_downsample"] = q_multimodal_box_downsample
ORACLE["multimodal_box_downsample"] = f"""
    WITH {_PAR},
    grid AS (
      SELECT p.*, (p.w // 2) AS w2, (p.h // 2) AS h2, r.i AS r, c.j AS c
      FROM par p, range(64) r(i), range(64) c(j)
      WHERE r.i < 2 * (p.h // 2) AND c.j < 2 * (p.w // 2)
    ),
    px AS (
      SELECT doc_id, w2, h2,
             (((r // 2) * w2 + (c // 2)) % 97)::BIGINT AS wgt,
             ((1 + (d2 + 0) % 5) * r + (1 + (d3 + 0) % 5) * c + s0) % 256 AS pr,
             ((1 + (d2 + 1) % 5) * r + (1 + (d3 + 1) % 5) * c + s1) % 256 AS pg,
             ((1 + (d2 + 2) % 5) * r + (1 + (d3 + 2) % 5) * c + s2) % 256 AS pb
      FROM grid
    )
    SELECT doc_id, max(w2)::BIGINT AS down_w, max(h2)::BIGINT AS down_h,
           sum(wgt * pr)::BIGINT AS ck_r,
           sum(wgt * pg)::BIGINT AS ck_g,
           sum(wgt * pb)::BIGINT AS ck_b
    FROM px GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) image near-dup buckets
# ---------------------------------------------------------------------------

AHASH_SIDE = 4  # 4x4 grid -> 16-bit hash: collision buckets ARE the signal


class PpmAHasher(PpmDecoder):
    """Actor-pool aHash stage: decode (inherited), nearest-neighbor
    sample a {AHASH_SIDE}x{AHASH_SIDE} grid, binarize each cell's gray
    sum against the grid total (EXACT integer compare: gray*16 > total),
    pack the bits into an int64 average-hash — the classic pHash-family
    image dedup signature, computed per batch inside the pool."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:  # type: ignore[override]
        n = AHASH_SIDE
        ids, hashes = [], []
        for did, p, m in zip(
            batch["doc_id"], batch["payload"], batch["mime"]
        ):
            img = self.decode_one(p, m)
            if img is None:
                continue
            h, w, _ = img.shape
            rr = (np.arange(n) * h) // n
            cc = (np.arange(n) * w) // n
            gray = img[np.ix_(rr, cc)].astype(np.int64).sum(axis=2)
            total = int(gray.sum())
            bits = (gray.ravel() * (n * n) > total).astype(np.int64)
            hashes.append(int((bits << np.arange(n * n)).sum()))
            ids.append(did)
        return pd.DataFrame({"doc_id": ids, "ahash": hashes})


def q_multimodal_ahash_dedup(sf_dir: str):
    """Image near-dup via average-hash buckets: decode -> 4x4 aHash in an
    actor pool, then ONE hash groupby; buckets holding >= 2 images are
    the candidate duplicate groups (the image analog of the MD5/minhash
    text dedup family — at 100 TB the same coarse-bucket reduce shape).
    Output: (ahash, n_docs, rep_doc) per bucket."""
    from ray.data.aggregate import Count, Min

    hashes = make_payloads(sf_dir).map_batches(
        PpmAHasher,
        batch_format="pandas",
        batch_size=256,
        concurrency=pool_cap(min_cap=2),
        num_cpus=1,
    )
    out = (
        hashes.groupby("ahash")
        .aggregate(Count(alias_name="n_docs"), Min("doc_id"))
        .to_pandas()
        .rename(columns={"min(doc_id)": "rep_doc"})
    )
    out = out[out["n_docs"] >= 2].sort_values("ahash").reset_index(drop=True)
    return out[["ahash", "n_docs", "rep_doc"]]


QUERIES["multimodal_ahash_dedup"] = q_multimodal_ahash_dedup
ORACLE["multimodal_ahash_dedup"] = f"""
    WITH {_PAR},
    grid4 AS (
      SELECT p.*, r.i AS r, c.j AS c,
             (r.i * p.h) // {AHASH_SIDE} AS rr,
             (c.j * p.w) // {AHASH_SIDE} AS cc
      FROM par p, range({AHASH_SIDE}) r(i), range({AHASH_SIDE}) c(j)
    ),
    g AS (
      SELECT doc_id, r, c,
             (((1 + (d2 + 0) % 5) * rr + (1 + (d3 + 0) % 5) * cc + s0) % 256
            + ((1 + (d2 + 1) % 5) * rr + (1 + (d3 + 1) % 5) * cc + s1) % 256
            + ((1 + (d2 + 2) % 5) * rr + (1 + (d3 + 2) % 5) * cc + s2) % 256
             )::BIGINT AS gray
      FROM grid4
    ),
    tot AS (SELECT doc_id, sum(gray)::BIGINT AS tot FROM g GROUP BY doc_id),
    hs AS (
      SELECT g.doc_id,
             sum(CASE WHEN g.gray * {AHASH_SIDE * AHASH_SIDE} > t.tot
                      THEN 1::BIGINT << (g.r * {AHASH_SIDE} + g.c)
                      ELSE 0 END)::BIGINT AS ahash
      FROM g JOIN tot t USING (doc_id) GROUP BY g.doc_id
    )
    SELECT ahash, count(*)::BIGINT AS n_docs, min(doc_id) AS rep_doc
    FROM hs GROUP BY ahash HAVING count(*) >= 2 ORDER BY ahash
"""
