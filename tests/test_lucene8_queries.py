"""r4 query-type batch contracts: IndexOrDocValuesQuery path identity +
planner choice, and the span-window membership kernel's slop boundary."""

import numpy as np
import pandas as pd


def test_iodv_paths_identical_and_planner(ray_session):
    """Both IndexOrDocValuesQuery execution paths must produce identical
    frames (the Lucene contract); the planner picks points for a narrow
    range and docvalues for an all-matching one."""
    from rindex.ops.lucene8 import IODV_HI, IODV_LO, iodv_plan, iodv_range_rollup

    sf = "/root/testdata/sf0.001"
    a = iodv_range_rollup(sf, IODV_LO, IODV_HI, "points")
    b = iodv_range_rollup(sf, IODV_LO, IODV_HI, "docvalues")
    pd.testing.assert_frame_equal(a, b)
    # an all-matching range cannot prune row groups -> docvalues
    assert iodv_plan(sf, -1e18, 1e18) == "docvalues"
    # an empty range prunes every row group -> points
    assert iodv_plan(sf, 1e17, 2e17) == "points"


def test_span_window_slop_boundary():
    """The offset-probe kernel: a prefix hit at exactly offset slop+1
    matches; offset slop+2 does not (ordered span width contract)."""
    from rindex.ops.lucene8 import SMTQ_SLOP

    # mirror the kernel on synthetic flat postings: spark at pos 0,
    # jo* at pos SMTQ_SLOP+1 (match) and a second doc at SMTQ_SLOP+2 (miss)
    ad = np.array([1, 2], np.int64); ap = np.array([0, 0], np.int64)
    bd = np.array([1, 2], np.int64)
    bp = np.array([SMTQ_SLOP + 1, SMTQ_SLOP + 2], np.int64)
    stride = np.int64(bp.max() + SMTQ_SLOP + 3)
    have = np.sort(bd * stride + bp)
    hit = np.zeros(len(ad), bool)
    for off in range(1, SMTQ_SLOP + 2):
        want = ad * stride + (ap + off)
        i = np.searchsorted(have, want)
        hit |= (i < len(have)) & (have[np.minimum(i, len(have) - 1)] == want)
    assert hit.tolist() == [True, False]
