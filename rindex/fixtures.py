"""Deterministic synthetic transcript + query corpora (FIXTURES.md).

Seeded (PCG64, seed=42), no wall-clock, no external data.  Zipf(s~1.1)
vocabulary with an injected stopword-class head guarantees hot-term skew so
the salted groupby(term) shuffle paths are exercised; mixed case, punctuation,
digits and overlong tokens exercise the StandardAnalyzer-equivalent chain;
log-normal turn lengths give varied norms.  Patterned on the reference's
random-corpus test strategy
(`lucene/test-framework/src/java/org/apache/lucene/index/
BasePostingsFormatTestCase.java` RandomPostingsTester — SURVEY.md §5).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 5000
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "you", "that"]
SEED = 42

SCALES = {
    # name: (n_convs, max_turns, n_files)
    "tiny": (20, 8, 2),
    "small": (2000, 8, 8),
    "bench": (80_000, 8, 32),
}


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def make_transcripts(
    n_convs: int, max_turns: int, seed: int = SEED
) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = np.array(_vocab())
    # Zipf(s=1.1) over the vocab ranks, with 30% stopword mass on the head.
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    stop = np.array(STOPWORDS)

    n_turns_per_conv = rng.integers(1, max_turns + 1, size=n_convs)
    total_turns = int(n_turns_per_conv.sum())
    # log-normal lengths, median ~40 tokens, clipped to [1, 2000]
    lens = np.clip(
        rng.lognormal(mean=np.log(40), sigma=0.9, size=total_turns), 1, 2000
    ).astype(np.int64)
    total_tokens = int(lens.sum())

    is_stop = rng.random(total_tokens) < 0.30
    stop_toks = stop[rng.integers(0, len(stop), size=total_tokens)]
    body_toks = vocab[rng.choice(VOCAB_SIZE, size=total_tokens, p=p)]
    toks = np.where(is_stop, stop_toks, body_toks).astype(object)

    # noise: mixed case / punctuation / digits / overlong tokens
    u = rng.random(total_tokens)
    cap = u < 0.05
    toks[cap] = [t.capitalize() for t in toks[cap]]
    punct = (u >= 0.05) & (u < 0.10)
    marks = np.array([",", ".", "!", "?", ";"])
    toks[punct] = [
        t + m for t, m in zip(toks[punct], marks[rng.integers(0, 5, punct.sum())])
    ]
    digit = (u >= 0.10) & (u < 0.12)
    toks[digit] = [str(x) for x in rng.integers(0, 9999, digit.sum())]
    overlong = u >= 0.9995
    toks[overlong] = ["x" * 300] * int(overlong.sum())

    # assemble turn texts
    bounds = np.concatenate([[0], np.cumsum(lens)])
    texts = [
        " ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(total_turns)
    ]

    conv_ids = np.repeat(
        np.array([f"c{i:06d}" for i in range(n_convs)], dtype=object),
        n_turns_per_conv,
    )
    turn_idx = np.concatenate([np.arange(n) for n in n_turns_per_conv]).astype(
        np.int32
    )
    roles_cycle = np.array(["user", "assistant"], dtype=object)
    roles = roles_cycle[turn_idx % 2].copy()
    special = rng.random(total_turns) < 0.08
    roles[special] = np.array(["tool", "system"], dtype=object)[
        rng.integers(0, 2, int(special.sum()))
    ]
    tools_pool = np.array(
        ["", "bash", "search", "browser", "editor", "python"], dtype=object
    )
    tools = tools_pool[rng.integers(0, len(tools_pool), total_turns)]
    base = np.datetime64("2026-01-01T00:00:00", "us")
    deltas = rng.integers(1, 120_000_000, total_turns)  # us gaps
    ts = base + np.concatenate(
        [np.cumsum(d) for d in np.split(deltas, np.cumsum(n_turns_per_conv)[:-1])]
    ).astype("timedelta64[us]")

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def write_corpus(out_dir: str, scale: str = "small", seed: int = SEED) -> str:
    """Write the corpus as multi-file Parquet (exercises partitioned reads
    and checkpoint/resume).  Idempotent: skips if already present."""
    n_convs, max_turns, n_files = SCALES[scale]
    done = os.path.join(out_dir, "_DONE")
    stamp = f"{scale} seed={seed}"
    if os.path.exists(done):
        with open(done) as fh:
            # compare the first two fields exactly — startswith(stamp) would
            # let 'seed=4' claim a marker written for 'seed=42'
            if fh.read().strip().split()[:2] == stamp.split():
                return out_dir
        # dir was written for a DIFFERENT scale/seed: rebuild, do not
        # silently serve mismatched data under this label
        os.remove(done)
    os.makedirs(out_dir, exist_ok=True)
    # clean stale part files (e.g. a crashed larger-scale write) so the
    # directory read cannot include leftovers
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    t = make_transcripts(n_convs, max_turns, seed)
    n = t.num_rows
    per = (n + n_files - 1) // n_files
    for f in range(n_files):
        chunk = t.slice(f * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(out_dir, f"part-{f:04d}.parquet"))
    with open(done, "w") as fh:
        fh.write(f"{stamp} {n} rows\n")
    return out_dir


def make_queries(seed: int = SEED, n_queries: int = 60) -> pa.Table:
    """Reference query-set fixture: head/torso/tail/absent terms plus
    mixed-df conjunctions and disjunctions (the WAND-stress cases, cf.
    `lucene/core/src/test/org/apache/lucene/search/TestWANDScorer.java`)."""
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    vocab = _vocab()
    rows = []

    def add(qtype: str, text: str, k: int = 10):
        rows.append((f"q{len(rows):03d}", qtype, text, k))

    heads = STOPWORDS + vocab[:10]
    torso = [vocab[i] for i in rng.integers(50, 800, 10)]
    tail = [vocab[i] for i in rng.integers(3000, VOCAB_SIZE, 10)]
    for t in heads[:8]:
        add("term", t)
    for t in torso[:6]:
        add("term", t)
    for t in tail[:4]:
        add("term", t)
    add("term", "zzzzabsent")  # df=0 -> empty result
    add("term", heads[0], k=1)
    add("term", torso[0], k=100)
    pools = {"head": heads, "torso": torso, "tail": tail}
    combos = [
        ("head", "head"), ("head", "torso"), ("head", "tail"),
        ("torso", "torso"), ("torso", "tail"), ("tail", "tail"),
        ("head", "torso", "tail"), ("head", "head", "torso"),
    ]
    for qtype in ("and", "or"):
        for combo in combos:
            terms = [
                pools[c][int(rng.integers(0, len(pools[c])))] for c in combo
            ]
            add(qtype, " ".join(terms))
        add(qtype, f"{heads[1]} zzzzabsent")
        add(qtype, " ".join([pools["torso"][0]] * 2))  # duplicate clause
    while len(rows) < n_queries:
        qt = ("term", "and", "or")[int(rng.integers(0, 3))]
        nt = 1 if qt == "term" else int(rng.integers(2, 4))
        terms = [vocab[int(rng.integers(0, VOCAB_SIZE))] for _ in range(nt)]
        add(qt, " ".join(terms), k=int(rng.choice([10, 10, 10, 5, 100])))
    qid, qtype, text, k = zip(*rows)
    return pa.table(
        {
            "query_id": pa.array(qid, pa.string()),
            "qtype": pa.array(qtype, pa.string()),
            "text": pa.array(text, pa.string()),
            "k": pa.array(k, pa.int32()),
        }
    )
