"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — the large-scale training-data-pipeline ops (prompt
requirement; reference anchors: SignatureUpdateProcessorFactory exact-dup +
TextProfileSignature fuzzy-dup, SURVEY.md §2.7).

Scale shapes:
  * exact        — content-hash column -> groupby(hash) -> first per group.
  * ngram-jaccard— shingle explode -> groupby(shingle) bucket -> candidate
                   pairs -> exact-verify.  Full recall for tau > 0 (any
                   overlapping pair shares >= 1 shingle), so the DuckDB
                   brute-force oracle matches exactly.  At 10^12 scale the
                   shingle buckets are hot-key-capped and MinHash takes over.
  * minhash-lsh  — 128 perms x (16 bands x 8 rows) -> band-bucket groupby ->
                   candidates -> exact-verify (probabilistic recall -> no SQL
                   oracle; recall asserted vs the exact op in pytest).
  * simhash      — 64-bit simhash, 4x16-bit band blocking (EXACT for
                   hamming <= 3 by pigeonhole) -> verify hamming.
  * embedding    — cosine over normalized vectors, blocked matmul.
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
NGRAM = 3
JACCARD_TAU = 0.5
COSINE_TAU = 0.45


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall((text or "").lower())


def _stable_hash64(data: bytes) -> int:
    """Process-stable 63-bit hash (python's hash() is seed-randomized across
    Ray workers and would break bucket joins)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little") >> 1


_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1_000_000  # bound worker RSS on high-cardinality text
_MASK63 = (1 << 63) - 1


def _token_hashes(toks: list[str]) -> np.ndarray:
    """Stable 63-bit hash per token, memoized — Zipf text means the cache
    hit rate is ~1, so md5 runs once per DISTINCT token per worker."""
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) >= _TOKEN_HASH_CACHE_MAX:
                cache.clear()
            h = cache[t] = _stable_hash64(t.encode())
        out[i] = h
    return out


def _shingles(text: str) -> np.ndarray:
    """Distinct 3-gram shingle hashes: vectorized polynomial combine of the
    cached per-token hashes (replaces one md5 PER SHINGLE — the previous
    hot spot of every shingle-based dedup op)."""
    th = _token_hashes(_tokens(text))
    if len(th) < NGRAM:
        return np.empty(0, dtype=np.int64)
    h = (th[:-2] * 0x9E3779B1 + th[1:-1] * 0x85EBCA77 + th[2:]) & _MASK63
    return np.unique(h)


# ---------------------------------------------------------------------------

def q_dedup_exact_documents(sf_dir: str):
    """Exact dedup: md5(text) -> keep min doc_id per hash.  The shuffle key
    is a COARSE bucket of the content hash, and each reduce task keeps the
    min doc per exact-hash run vectorized — one pandas group per distinct
    md5 would pay ~1ms scheduling per (mostly singleton) group, the
    tiny-group antipattern _pairs_from_buckets documents."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5((x or "").encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        cb = np.fromiter(
            (int(x[:4], 16) % 509 for x in h), dtype=np.int32, count=len(h)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h),
                "_cb": pa.array(cb),
            }
        )

    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["h", "doc_id"], kind="mergesort")
        k = df["h"].to_numpy()
        d = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        return pd.DataFrame({"doc_id": d[starts]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_cb")
        .map_groups(first_per_hash, batch_format="pandas")
    )


QUERIES["dedup_exact_documents"] = q_dedup_exact_documents
ORACLE["dedup_exact_documents"] = (
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"
)


# ---------------------------------------------------------------------------

def _shingle_table(sf_dir: str):
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids, sh = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = _shingles(text)
            ids.extend([did] * len(s))
            sh.extend(s.tolist())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "shingle": pa.array(sh, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _verify_pairs(pairs_df: pd.DataFrame, shingle_sets: dict, tau: float):
    rows = []
    for a, b in zip(pairs_df["doc_a"], pairs_df["doc_b"]):
        sa, sb = shingle_sets[int(a)], shingle_sets[int(b)]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        jac = inter / union if union else 0.0
        if jac >= tau:
            rows.append((int(a), int(b), round(jac, 6)))
    return rows


def _pairs_from_buckets(bucketed, key: str, n_coarse: int = 509):
    """exact-key buckets -> all intra-bucket candidate pairs (a < b).

    The shuffle key is a COARSE hash of the exact bucket key (key % prime),
    so one map_groups task handles ~1/509 of the buckets and expands pairs
    for all of its exact-key runs vectorized — a per-exact-key map_groups
    would pay ~1ms scheduling/slicing per tiny group, which at 16 bands x
    n_docs buckets dominates the whole op (the same coarse-reduce shape as
    the index build's (seg, bucket) term shuffle)."""

    def add_coarse(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy()
        return t.append_column(
            "_cb", pa.array((k % n_coarse).astype(np.int32))
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values([key, "doc_id"], kind="mergesort")
        k = df[key].to_numpy()
        d = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        bounds = np.append(starts, len(k))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            ids = np.unique(d[s:e])
            if len(ids) < 2:
                continue
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": np.zeros(0, np.int64),
                    "doc_b": np.zeros(0, np.int64),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
            }
        )

    return (
        bucketed.map_batches(
            add_coarse, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("_cb")
        .map_groups(pairs, batch_format="pandas")
    )


_SHINGLE_SETS_CACHE: dict[str, dict] = {}


def _collect_shingle_sets(sf_dir: str) -> dict:
    """doc_id -> sorted shingle array, for exact-Jaccard verification of
    candidate pairs.  Collected driver-side (test scale) with one lexsort +
    run split instead of a per-doc pandas groupby; cached per sf_dir since
    the minhash and ngram ops share it.  At 10^12 scale the verify becomes
    a hash join of candidates against the shingle table."""
    if sf_dir in _SHINGLE_SETS_CACHE:
        return _SHINGLE_SETS_CACHE[sf_dir]
    if len(_SHINGLE_SETS_CACHE) >= 2:  # bound driver memory across sf_dirs
        _SHINGLE_SETS_CACHE.clear()
    df = _shingle_table(sf_dir).to_pandas()
    d = df["doc_id"].to_numpy()
    s = df["shingle"].to_numpy()
    order = np.lexsort((s, d))
    d, s = d[order], s[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    bounds = np.append(starts, len(d))
    sets = {
        int(d[a]): s[a:b] for a, b in zip(bounds[:-1], bounds[1:])
    }
    _SHINGLE_SETS_CACHE[sf_dir] = sets
    return sets


def q_ngram_jaccard_neardup(sf_dir: str):
    """Near-dup pairs with 3-gram Jaccard >= 0.5, fully distributed via the
    co-occurrence formulation: shingles are DISTINCT per doc, so a pair's
    intersection size equals how many shingle buckets emit it — pair
    multiplicity from the bucket expansion, counted with a groupby, no
    per-pair set intersection anywhere (the Zipf corpus yields ~1.1M
    candidate pairs at sf0.1; verifying each with set ops was the op's
    entire cost).  |union| = |A| + |B| - inter with per-doc sizes looked up
    from a broadcast array.  Exact: full recall (any qualifying pair shares
    a shingle) and exact Jaccard — same SQL oracle."""
    st = _shingle_table(sf_dir).materialize()  # feeds sizes AND pairs
    sizes = st.groupby("doc_id").count().to_pandas()
    order = np.argsort(sizes["doc_id"].to_numpy())  # groupby output order
    # is an implementation detail — make the searchsorted invariant explicit
    size_ids = sizes["doc_id"].to_numpy()[order]
    size_vals = sizes["count()"].to_numpy().astype(np.int64)[order]
    if len(size_ids) and int(size_ids.max()) >= 1 << 31:
        raise ValueError(
            "pair-key packing requires doc_id < 2^31; re-key the corpus"
        )

    # pair keys stream back as packed int64 blocks; the multiplicity count
    # is ONE np.unique over them (~1.3M rows -> ms).  At 10^12 scale this
    # final count becomes a distributed groupby over the pre-counted
    # per-coarse-bucket partials instead of a driver concat.
    pk_parts = []
    for t in _pairs_from_buckets(st, "shingle").iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        a = t["doc_a"].to_numpy().astype(np.int64)
        b = t["doc_b"].to_numpy().astype(np.int64)
        pk_parts.append((a << 32) | b)
    if not pk_parts:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype=np.int64),
             "doc_b": pd.Series(dtype=np.int64),
             "jaccard": pd.Series(dtype=np.float64)}
        )
    pk, inter = np.unique(np.concatenate(pk_parts), return_counts=True)
    a = pk >> 32
    b = pk & 0xFFFFFFFF
    sa = size_vals[np.searchsorted(size_ids, a)]
    sb = size_vals[np.searchsorted(size_ids, b)]
    jac = inter / (sa + sb - inter)
    keep = jac >= JACCARD_TAU
    out = pd.DataFrame(
        {
            "doc_a": a[keep],
            "doc_b": b[keep],
            "jaccard": np.round(jac[keep], 6),
        }
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


QUERIES["ngram_jaccard_neardup"] = q_ngram_jaccard_neardup
ORACLE["ngram_jaccard_neardup"] = f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+{NGRAM - 1}], ' ')
                            FOR i IN range(1, len(toks) - {NGRAM - 2})]) AS shingles
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '[0-9a-z]+') AS toks
            FROM documents)
      WHERE len(toks) >= {NGRAM}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= {JACCARD_TAU}
"""


# ---------------------------------------------------------------------------

N_PERM = 128
N_BANDS = 16  # 16 bands x 8 rows
_MERSENNE31 = (1 << 31) - 1


def _minhash_params():
    rng = np.random.Generator(np.random.PCG64(1234))
    a = rng.integers(1, _MERSENNE31, size=N_PERM, dtype=np.int64)
    b = rng.integers(0, _MERSENNE31, size=N_PERM, dtype=np.int64)
    return a, b


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Min over shingles of (a*x+b) mod p per permutation — universal-hash
    family over the Mersenne-31 prime; int64-safe (a,x < 2^31 -> a*x < 2^62)
    and fully vectorized."""
    x = (shingles % _MERSENNE31)[:, None]
    h = (a[None, :] * x + b[None, :]) % _MERSENNE31
    return np.min(h, axis=0).astype(np.int64)


def q_minhash_lsh_neardup(sf_dir: str):
    """MinHash+LSH near-dup: shingle -> 128 minhashes -> 16 band buckets ->
    groupby(band, band_hash) -> candidate pairs -> exact Jaccard verify.
    Probabilistic recall (no SQL oracle); precision is exact because
    candidates are re-verified.  pytest asserts high recall vs the exact
    n-gram op on the planted near-dups."""
    a, b = _minhash_params()
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    rows_per_band = N_PERM // N_BANDS

    def sigs(t: pa.Table) -> pa.Table:
        ids, band_hashes = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = _shingles(text)
            if len(s) == 0:
                continue
            mh = _minhash(s, a, b).reshape(N_BANDS, rows_per_band)
            for bi in range(N_BANDS):
                ids.append(did)
                # the band index is baked into the bucket key, so one
                # int64 column is the whole LSH bucket identity
                band_hashes.append(
                    _stable_hash64(bytes([bi]) + mh[bi].tobytes())
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bh": pa.array(band_hashes, pa.int64()),
            }
        )

    bucketed = ds.map_batches(sigs, batch_format="pyarrow")
    cand = (
        _pairs_from_buckets(bucketed, "bh").to_pandas().drop_duplicates()
    )
    sets = _collect_shingle_sets(sf_dir)
    rows = _verify_pairs(cand, sets, JACCARD_TAU)
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
        {"doc_a": np.int64, "doc_b": np.int64, "jaccard": np.float64}
    )


QUERIES["minhash_lsh_neardup"] = q_minhash_lsh_neardup


# ---------------------------------------------------------------------------

def _simhash64(text: str) -> int:
    from collections import Counter

    c = Counter(_tokens(text))
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w, f in c.items():
        h = np.uint64(
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, f, -f)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def q_simhash_neardup(sf_dir: str):
    """SimHash near-dup: 64-bit simhash, pairs with hamming <= 3 found via
    4x16-bit band blocking (exact by pigeonhole: <=3 differing bits leave
    >=1 band identical)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def sigs(t: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = _simhash64(text)
            for bi in range(4):
                ids.append(did)
                # band baked into the bucket key (band<<16 | 16-bit slice)
                keys.append((bi << 16) | ((h >> (16 * bi)) & 0xFFFF))
                hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "bk": pa.array(keys, pa.int64()),
                "sh": pa.array(np.array(hashes, dtype=np.uint64).view(np.int64)),
            }
        )

    bucketed = ds.map_batches(sigs, batch_format="pyarrow").materialize()
    # materialize: the signature stage feeds BOTH the pair expansion and
    # the verify map — without it the per-doc simhash runs twice
    cand = (
        _pairs_from_buckets(bucketed, "bk").to_pandas().drop_duplicates()
    )
    # verify hamming on the candidates (vectorized XOR popcount).  The
    # signature map collects driver-side here; at 10^12 scale the verify is
    # a hash join of the (small) candidate table against the signatures.
    sh_map = (
        bucketed.to_pandas()
        .drop_duplicates("doc_id")
        .set_index("doc_id")["sh"]
    )
    ha = sh_map.loc[cand["doc_a"]].to_numpy().astype(np.uint64)
    hb = sh_map.loc[cand["doc_b"]].to_numpy().astype(np.uint64)
    x = np.bitwise_xor(ha, hb)
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    m = ham <= 3
    out = pd.DataFrame(
        {
            "doc_a": cand["doc_a"].to_numpy()[m],
            "doc_b": cand["doc_b"].to_numpy()[m],
            "hamming": ham[m],
        }
    ).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return out.astype({"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64})


QUERIES["simhash_neardup"] = q_simhash_neardup


# ---------------------------------------------------------------------------

def q_embedding_cosine_neardup(sf_dir: str):
    """Embedding near-dup: pairs with cosine >= 0.45 over L2-normalized
    vectors.  Blocked matmul per batch against the (broadcast) full matrix —
    at 10^12 scale the matrix is replaced by LSH buckets (ops/ann.py)."""
    import ray

    emb = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    full = emb.to_pandas()
    ids_all = full["vec_id"].to_numpy()
    M = np.array(full["embedding"].tolist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids_all, M))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ids_all_, M_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        V = np.array(batch["embedding"].tolist(), dtype=np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ M_.T
        out_a, out_b, out_c = [], [], []
        for r in range(len(ids)):
            m = (S[r] >= COSINE_TAU) & (ids_all_ > ids[r])
            for j in np.nonzero(m)[0]:
                out_a.append(int(ids[r]))
                out_b.append(int(ids_all_[j]))
                out_c.append(round(float(S[r, j]), 6))
        return pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "cosine": out_c})

    return emb.map_batches(f, batch_format="pandas", batch_size=512)


QUERIES["embedding_cosine_neardup"] = q_embedding_cosine_neardup
ORACLE["embedding_cosine_neardup"] = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {COSINE_TAU}
"""
