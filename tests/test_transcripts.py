"""Behavioral tests for the conversation-level ops (rindex/ops/transcripts.py).

The driver corpora are random text, so the echo-loop detector's positive
branch (max consecutive-assistant Jaccard >= 0.5) never fires there — these
tests engineer a corpus where it must, and pin the window op's
no-cross-conversation-leak invariant.  doc_id -> (conv_id, turn_idx, role,
tool) derivation: see transcripts.T_CTE.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def loop_dir(tmp_path_factory):
    """15 docs = 3 conversations of 5 turns.  Conversation 0's assistant
    turns (doc 1, doc 3) are identical -> Jaccard 1.0 (a loop).
    Conversation 1's assistant turns (doc 6, doc 8) share half their
    4-token union -> Jaccard 2/6 = 0.333 (not a loop).  Conversation 2's
    share nothing -> 0.0."""
    d = tmp_path_factory.mktemp("loopcorpus")
    texts = [
        "intro words here",          # 0 user
        "run the same command",      # 1 assistant  } identical
        "ok",                        # 2 user
        "run the same command",      # 3 assistant  } identical
        "done",                      # 4 user
        "hello",                     # 5 user
        "alpha beta gamma delta",    # 6 assistant  } |inter|=2 |union|=6
        "mid",                       # 7 user
        "alpha beta xx yy",          # 8 assistant  }
        "bye",                       # 9 user
        "q",                         # 10 user
        "one two",                   # 11 assistant } disjoint
        "m",                         # 12 user
        "three four",                # 13 assistant }
        "end",                       # 14 user
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(15, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_echo_loop_flags_identical_assistant_turns(ray_session, loop_dir):
    from rindex.ops.transcripts import q_conv_echo_loop_documents

    df = (
        q_conv_echo_loop_documents(loop_dir)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert df.loc[0, "max_jaccard"] == 1.0 and df.loc[0, "is_loop"] == 1
    assert abs(df.loc[1, "max_jaccard"] - 2.0 / 6.0) < 1e-12
    assert df.loc[1, "is_loop"] == 0
    assert df.loc[2, "max_jaccard"] == 0.0 and df.loc[2, "is_loop"] == 0
    assert (df["n_pairs"] == 1).all()


def test_window_context_never_leaks_across_conversations(ray_session, loop_dir):
    from rindex.ops.transcripts import q_conv_window_context_documents

    df = q_conv_window_context_documents(loop_dir).to_pandas()
    # assistant turns are odd turn_idx (1, 3) -> 2 per full conversation
    assert len(df) == 6
    # lag-1 within the conversation: prev doc is doc_id - 1, same conv
    assert (df["doc_id"] // 5 == df["conv_id"]).all()
    assert (df["turn_idx"] % 2 == 1).all()
    assert (df["prev_role"] == "user").all()
    # the previous turn's text, never another conversation's
    prev_expected = {1: "intro words here", 3: "ok", 6: "hello",
                     8: "mid", 11: "q", 13: "m"}
    got = dict(zip(df["doc_id"], df["prev_text"]))
    assert got == prev_expected


def test_conv_dedup_keeps_lowest_conv_id(ray_session, loop_dir):
    from rindex.ops.transcripts import q_conv_dedup_documents

    df = q_conv_dedup_documents(loop_dir).to_pandas()
    # three distinct conversations -> three fingerprints, each kept once
    assert len(df) == 3
    assert sorted(df["keep_conv_id"]) == [0, 1, 2]
    assert (df["n_convs"] == 1).all()


def test_renumber_is_dense_and_order_preserving(ray_session, loop_dir):
    from rindex.ops.transcripts import q_conv_renumber_documents

    df = (
        q_conv_renumber_documents(loop_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    # tool turns (doc_id % 7 in {0, 3}) are dropped; per conv the new index
    # is dense 0..n-1 in the original turn order
    assert not set(df["doc_id"]) & {0, 3, 7, 10, 14}
    for _, g in df.groupby("conv_id"):
        assert list(g["new_turn_idx"]) == list(range(len(g)))
        assert list(g["turn_idx"]) == sorted(g["turn_idx"])


def test_conv_packing_budget_and_atomicity(ray_session):
    from rindex.ops.transcripts import (
        PACK_BUDGET_CHARS, q_conv_packing_documents,
    )

    df = q_conv_packing_documents("/root/testdata/sf0.001").to_pandas()
    # every conversation appears exactly once (atomicity)
    assert df["conv_id"].is_unique
    # per (shard, win): total chars within budget unless the window is a
    # single oversized conversation
    g = df.groupby(["shard", "win"]).agg(
        total=("chars", "sum"), n=("conv_id", "size")
    )
    over = g[g["total"] > PACK_BUDGET_CHARS]
    assert (over["n"] == 1).all(), "multi-conv window exceeded the budget"
    # windows are dense 0..k per shard, in conv order
    for _, s in df.sort_values(["shard", "conv_id"]).groupby("shard"):
        w = s["win"].to_numpy()
        assert w[0] == 0
        assert ((w[1:] - w[:-1]) >= 0).all()
        assert ((w[1:] - w[:-1]) <= 1).all()


@pytest.fixture(scope="module")
def neardup_dir(tmp_path_factory):
    """3 conversations: conv 0 and conv 1 carry the SAME 40-token stream
    split across DIFFERENT turn boundaries (near-dup, boundary-spanning
    shingles must match them); conv 2 is unrelated."""
    d = tmp_path_factory.mktemp("neardupcorpus")
    words = [f"w{i}" for i in range(40)]
    stream = " ".join(words)
    # conv 0: splits after 8/16/24/32; conv 1: splits after 5/20/25/35
    def split(cuts):
        cuts = [0] + cuts + [40]
        return [" ".join(words[a:b]) for a, b in zip(cuts, cuts[1:])]

    texts = split([8, 16, 24, 32]) + split([5, 20, 25, 35]) + [
        "zebra yak xray walrus vulture",
        "unicorn tiger snake rhino",
        "quail porcupine otter",
        "narwhal moose llama",
        "koala jaguar ibis",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(15, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_conv_near_dedup_spans_turn_boundaries(ray_session, neardup_dir):
    """Identical content under different turn segmentation must match with
    Jaccard 1.0 (shingles are computed on the JOINED conversation text);
    the unrelated conversation must not appear in any pair."""
    from rindex.ops.transcripts import q_conv_near_dedup_documents

    df = q_conv_near_dedup_documents(neardup_dir)
    assert len(df) == 1
    row = df.iloc[0]
    assert (row["conv_a"], row["conv_b"]) == (0, 1)
    assert row["jaccard"] == 1.0


def test_tool_recovery_suffix_scan_matches_bruteforce(ray_session, tmp_path):
    """The per-conversation vectorized suffix scan in
    conv_tool_recovery_documents must equal the quadratic definition: an
    error tool turn is recovered iff ANY later tool turn in the same
    conversation succeeded."""
    import os

    import pyarrow.parquet as pq

    # 40 conversations x 5 turns; texts irrelevant to the op
    n = 200
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["w"] * n, pa.string()),
        }
    )
    d = tmp_path / "sfrec"
    d.mkdir()
    pq.write_table(t, os.path.join(str(d), "documents.parquet"))

    from rindex.ops.transcripts import (
        TOOL_ERR_MOD,
        TURNS_PER_CONV,
        q_conv_tool_recovery_documents,
    )

    got = (
        q_conv_tool_recovery_documents(str(d))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )

    # brute force
    rows = {}
    for did in range(n):
        m7 = did % 7
        if m7 not in (0, 3):
            continue
        conv, ti = did // TURNS_PER_CONV, did % TURNS_PER_CONV
        rows.setdefault(conv, []).append((ti, did % TOOL_ERR_MOD == 0))
    expect = []
    for conv, turns in sorted(rows.items()):
        n_err = sum(e for _, e in turns)
        if not n_err:
            continue
        n_rec = sum(
            1
            for ti, e in turns
            if e and any(t2 > ti and not e2 for t2, e2 in turns)
        )
        expect.append((conv, len(turns), n_err, n_rec))
    assert list(map(tuple, got.to_records(index=False))) == expect
