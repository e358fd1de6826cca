"""CDCR forward contracts: checkpoint exactly-once, target-side verify."""

import glob
import os


def test_cdcr_forward_exactly_once(ray_session):
    from rindex.ops.cdcr import _cdcr_target, cdcr_forward

    sf = "/root/testdata/sf0.001"
    t1 = cdcr_forward(sf)
    tgt, ck = _cdcr_target(sf)
    assert os.path.exists(ck)
    files = sorted(glob.glob(os.path.join(tgt, "*.parquet")))
    assert files, "forward wrote no data files"
    mtimes = [os.path.getmtime(f) for f in files]
    t2 = cdcr_forward(sf)   # second forward: checkpoint hit, no data moves
    assert t2 == t1
    assert [os.path.getmtime(f) for f in files] == mtimes
    assert t1["forwarded_docs"] > 0 and t1["last_doc_id"] >= 0
