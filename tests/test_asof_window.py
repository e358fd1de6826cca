"""Property tests: the as-of join and sliding-window kernels vs O(n^2)
brute force on random inputs (the registered ops are DuckDB-oracled at
three scales; these pin the KERNELS — merge_asof bucketing and the
searchsorted/prefix-sum window — on adversarial tiny inputs: duplicate
timestamps across users, single-event users, empty sides)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


def _events(draw, n):
    users = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    # unique (user, ts) like the real table; ts ints keep arithmetic exact
    pairs = list({(u, draw(st.integers(0, 50))) for u in users})
    rows = [
        (i, u, t, float(i % 7), "purchase" if i % 3 == 0 else "click")
        for i, (u, t) in enumerate(sorted(pairs))
    ]
    return pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "value", "event_type"]
    )


@st.composite
def event_frames(draw):
    return _events(draw, draw(st.integers(1, 40)))


@given(event_frames())
@settings(max_examples=60, deadline=None)
def test_asof_matches_bruteforce(df):
    a = df[df["event_type"] == "purchase"]
    b = df[df["event_type"] == "click"]
    # engine kernel: per-user merge_asof exactly as q_asof_join_events
    aa = a.sort_values("ts", kind="mergesort")[
        ["event_id", "user_id", "ts"]
    ]
    bb = b.sort_values("ts", kind="mergesort")[
        ["event_id", "user_id", "ts", "value"]
    ].rename(columns={"event_id": "b_event_id", "value": "b_value"})
    if aa.empty or bb.empty:
        got = {}
    else:
        m = pd.merge_asof(aa, bb, on="ts", by="user_id",
                          direction="backward").dropna(subset=["b_event_id"])
        got = dict(zip(m["event_id"], m["b_event_id"].astype(int)))
    # brute force: latest b with b.ts <= a.ts per user ((user, ts) unique)
    want = {}
    for _, ar in a.iterrows():
        cand = b[(b["user_id"] == ar["user_id"]) & (b["ts"] <= ar["ts"])]
        if len(cand):
            want[ar["event_id"]] = int(
                cand.sort_values("ts").iloc[-1]["event_id"]
            )
    assert got == want


@given(event_frames(), st.integers(1, 20))
@settings(max_examples=60, deadline=None)
def test_sliding_window_matches_bruteforce(df, w):
    g = df.sort_values(["user_id", "ts"], kind="mergesort")
    ts = g["ts"].to_numpy(np.int64)
    vals = g["value"].to_numpy(np.float64)
    users = g["user_id"].to_numpy(np.int64)
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(users))[0] + 1, [len(users)]]
    )
    cnt = np.empty(len(users), np.int64)
    sm = np.empty(len(users), np.float64)
    for a_, b_ in zip(starts[:-1], starts[1:]):
        t = ts[a_:b_]
        lo = np.searchsorted(t, t - w, side="left")
        cnt[a_:b_] = np.arange(1, b_ - a_ + 1) - lo
        cs = np.concatenate([[0.0], np.cumsum(vals[a_:b_])])
        sm[a_:b_] = cs[1 : b_ - a_ + 1] - cs[lo]
    got = dict(zip(g["event_id"], zip(cnt, np.round(sm, 9))))
    for _, r in df.iterrows():
        win = df[
            (df["user_id"] == r["user_id"])
            & (df["ts"] >= r["ts"] - w)
            & (df["ts"] <= r["ts"])
        ]
        c, s = got[r["event_id"]]
        assert c == len(win)
        assert abs(s - win["value"].sum()) < 1e-9
