"""Merge-join (innerJoin/leftOuterJoin) contracts: result equivalence vs a
plain pandas join, key-sorted output, and loud rejection of unsorted input
(the InnerJoinStream 'streams must be sorted' contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(seed, n, key_space, cols):
    rng = np.random.Generator(np.random.PCG64(seed))
    df = pd.DataFrame({c: rng.integers(0, 1000, n) for c in cols})
    df[cols[0]] = rng.integers(0, key_space, n)
    return df


def test_merge_join_inner_matches_pandas(ray_session):
    import ray.data as rd

    from rindex.ops.streams import merge_join

    left = _mk(1, 5000, 300, ["k", "lv"])
    right = _mk(2, 800, 300, ["rk", "rv"])
    lds = rd.from_pandas(left).repartition(8).sort("k")
    rds = rd.from_pandas(right).repartition(4).sort("rk")
    got = merge_join(lds, rds, on="k", right_on="rk", num_partitions=6).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    key = ["k", "lv", "rk", "rv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    # the merged stream stays globally key-sorted (the /export contract)
    assert (np.diff(got["k"].to_numpy()) >= 0).all()


def test_merge_join_left_outer_keeps_unmatched(ray_session):
    import ray.data as rd

    from rindex.ops.streams import merge_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"rk": [2, 2, 4], "rv": [7, 8, 9]})
    got = merge_join(
        rd.from_pandas(left).sort("k"),
        rd.from_pandas(right).sort("rk"),
        on="k",
        right_on="rk",
        how="left",
        num_partitions=2,
    ).to_pandas()
    assert len(got) == 5  # 1 and 3 survive unmatched; 2 matches twice
    unmatched = got[got["rv"].isna()]["k"].tolist()
    assert sorted(unmatched) == [1, 3]


def test_merge_join_rejects_unsorted_input(ray_session):
    import ray.data as rd

    from rindex.ops.streams import merge_join

    left = pd.DataFrame({"k": [5, 1, 3], "lv": [0, 1, 2]})  # NOT sorted
    right = pd.DataFrame({"rk": [1, 3, 5], "rv": [1, 2, 3]})
    ds = merge_join(
        rd.from_pandas(left), rd.from_pandas(right).sort("rk"), on="k",
        right_on="rk",
    )
    with pytest.raises(Exception, match="not sorted"):
        ds.to_pandas()


def test_having_evaluator_predicate(ray_session):
    import ray.data as rd

    from rindex.ops.streams import having

    df = pd.DataFrame({"g": ["a", "b", "c"], "n": [5, 70, 68]})
    got = having(rd.from_pandas(df), "and(gt(n, 67), lt(n, 70))").to_pandas()
    assert got["g"].tolist() == ["c"]


def test_cartesian_product_ordinals_and_empty_lists(ray_session):
    import ray.data as rd

    from rindex.ops.streams import cartesian_product

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3, 4]),
            "vals": pa.array(
                [[10.0, 11.0], [], None, [7.0]],
                pa.list_(pa.float64()),
            ),
        }
    )
    got = (
        cartesian_product(rd.from_arrow(tbl), "vals", "val")
        .to_pandas()
        .sort_values(["id", "idx"])
        .reset_index(drop=True)
    )
    # empty and null lists emit nothing; order within a list is preserved
    assert got["id"].tolist() == [1, 1, 4]
    assert got["idx"].tolist() == [0, 1, 0]
    assert got["val"].tolist() == [10.0, 11.0, 7.0]


def test_strdist_kernel_shapes():
    from rindex.ops.evaluators import EVALUATORS

    sd = EVALUATORS["strdist"]
    col = np.array(["kitten", "sitting", "click", "kitten"])
    # column vs literal (and the symmetric literal vs column)
    np.testing.assert_array_equal(sd(col, "sitting"), [3.0, 0.0, 6.0, 3.0])
    np.testing.assert_array_equal(sd("sitting", col), [3.0, 0.0, 6.0, 3.0])
    # column vs column
    other = np.array(["kitten", "sitting", "clack", "mitten"])
    np.testing.assert_array_equal(sd(col, other), [0.0, 0.0, 1.0, 1.0])
    # scalar vs scalar
    assert sd("flaw", "lawn") == 2.0
