"""Nested-document blocks + multi-valued fields: block-join aggregation
against a flat-search oracle, position-increment-gap phrase semantics,
multi-valued stored-field filters, and vec≡python tokenizer equivalence
for list-valued text."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def small_corpus_index(ray_session, small_corpus, tmp_path_factory):
    from rindex.build import build_index

    idx = str(tmp_path_factory.mktemp("nested_idx") / "small")
    build_index(small_corpus, idx, num_segments=8, mode="local")
    return idx


def _build(tmp, rows, **kw):
    import ray.data as rd

    from rindex.build import build_index

    tbl = pa.table(rows)
    kw.setdefault("num_segments", 2)
    kw.setdefault("mode", "local")
    kw.setdefault("keep_cols", ())
    build_index(rd.from_arrow(tbl), str(tmp), **kw)
    return str(tmp)


def test_block_join_matches_flat_aggregation(ray_session, small_corpus_index):
    """search_block_join(conv_id) must equal aggregating the flat per-turn
    search results by conversation — same scores, same children counts."""
    from rindex.search import IndexSearcher

    s = IndexSearcher(small_corpus_index)
    flat = s.search("w0003 w0017", k=10**9, mode="or", algo="exhaustive")
    df = pd.DataFrame(flat, columns=["rank", "conv_id", "turn_idx", "score"])
    for mode, aggfn in [("max", "max"), ("total", "sum"), ("avg", "mean")]:
        want = (
            df.groupby("conv_id")["score"]
            .agg([aggfn, "size"])
            .reset_index()
            .rename(columns={aggfn: "score", "size": "n"})
            .sort_values(["score", "conv_id"], ascending=[False, True],
                         kind="mergesort")
            .head(15)
            .reset_index(drop=True)
        )
        got = s.search_block_join(
            "w0003 w0017", parent_col="conv_id", k=15, score_mode=mode
        )
        assert [g[1] for g in got] == want["conv_id"].tolist()
        assert [g[3] for g in got] == want["n"].tolist()
        np.testing.assert_allclose(
            [g[2] for g in got], want["score"].to_numpy(), rtol=1e-12
        )


def test_block_join_rejects_non_contiguous_parent(ray_session, small_corpus_index):
    from rindex.search import IndexSearcher

    s = IndexSearcher(small_corpus_index)
    # `role` alternates within a conversation — runs are not contiguous
    with pytest.raises(ValueError, match="not contiguous"):
        s.search_block_join("w0003", parent_col="role")


def test_position_gap_blocks_cross_value_phrases(ray_session, tmp_path):
    from rindex.search import IndexSearcher

    idx = _build(
        tmp_path / "mv",
        {
            "name": ["A", "B", "C"],
            "text": [
                ["hello world", "foo bar"],   # phrase inside one value
                ["hello", "world"],           # phrase split across values
                ["nothing here"],
            ],
        },
        id_cols=("name",),
        text_col="text",
        with_positions=True,
    )
    s = IndexSearcher(idx)
    hits = s.search_phrase("hello world")  # [(name, phrase_freq)]
    assert [h[0] for h in hits] == ["A"]  # B must NOT match across the gap
    # both docs still match the terms individually (tf unaffected by gap)
    both = {h[1] for h in s.search("hello", k=10)}
    assert both == {"A", "B"}


def test_multivalued_norms_exclude_gap(ray_session, tmp_path):
    """dl = total token count across values; the 100-position gaps must not
    inflate length norms."""
    from rindex.search import IndexSearcher

    idx = _build(
        tmp_path / "mvn",
        {
            "name": ["multi", "single"],
            "text": [["alpha beta", "gamma delta"], ["alpha beta gamma delta"]],
        },
        id_cols=("name",),
        text_col="text",
        with_positions=True,
    )
    s = IndexSearcher(idx)
    hits = s.search("alpha", k=2)
    assert len(hits) == 2
    # identical tf and dl -> identical scores
    assert abs(hits[0][-1] - hits[1][-1]) < 1e-15


def test_multivalued_stored_field_filter(ray_session, tmp_path):
    from rindex.search import IndexSearcher

    idx = _build(
        tmp_path / "tags",
        {
            "name": ["d0", "d1", "d2"],
            "text": ["common text", "common words", "common stuff"],
            "tags": [["red", "blue"], ["blue"], ["green"]],
        },
        id_cols=("name",),
        text_col="text",
        keep_cols=("tags",),
    )
    s = IndexSearcher(idx)
    assert {h[1] for h in s.search("common", field_filter=("tags", "blue"))} == {
        "d0", "d1"
    }
    assert {h[1] for h in s.search("common", field_filter=("tags", "red"))} == {
        "d0"
    }
    assert s.search("common", field_filter=("tags", "purple")) == []


def test_vec_tokenizer_handles_list_text(ray_session):
    """Non-positional multi-valued text through the vectorized path must be
    pack-identical to the general Python path."""
    from rindex.build import _make_tokenize_local, _make_tokenize_partials_vec

    batch = pa.table(
        {
            "seg": pa.array([0, 0, 1], pa.int32()),
            "doc": pa.array([0, 1, 0], pa.int32()),
            "text": pa.array(
                [["Hello world", "don't stop"], ["one"], None],
                pa.list_(pa.string()),
            ),
        }
    )
    a = _make_tokenize_partials_vec(None)(batch).to_pandas()
    b = _make_tokenize_local("standard")(batch).to_pandas()
    key = ["seg", "term", "salt"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
