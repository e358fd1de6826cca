"""CheckIndex-style full-index audit (reference:
`lucene/core/src/java/org/apache/lucene/index/CheckIndex.java`
#checkFields/#checkImpacts — SURVEY.md §5)."""

import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from rindex.analysis import get_analyzer
from rindex.build import build_index
from rindex.codec import decode_posting, encode_norms
from rindex.segments import read_manifest, seg_dir


@pytest.fixture(scope="session")
def audited_index(ray_session, tiny_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("chk") / "idx")
    build_index(tiny_corpus, idx, num_segments=4, salt_range=64)
    return idx


def test_check_index_invariants(audited_index):
    audit_index(audited_index)


def audit_index(index_dir):
    """Reusable CheckIndex audit (also run post-merge by test_merge.py).
    Positional segments additionally get the checkTermsAndPositions-style
    checks: run lengths == tfs, positions ascending within a run, within
    [0, dl), and equal to the analyzer's ground-truth token positions."""
    from rindex.codec import decode_positions

    manifest = read_manifest(index_dir)
    analyzer = get_analyzer(manifest["config"]["analyzer"])
    total_docs = 0
    for m in manifest["segments"]:
        sdir = seg_dir(index_dir, m["seg_id"], m.get("gen", 0))
        docs_tbl = pq.read_table(os.path.join(sdir, "docs.parquet"))
        postings = pq.read_table(os.path.join(sdir, "postings.parquet"))
        max_doc = m["max_doc"]
        total_docs += m["doc_count"]
        assert docs_tbl.num_rows == m["doc_count"] == max_doc

        # docmap ordinals dense + docmap sorted by (conv_id, turn_idx)
        d = docs_tbl["doc"].to_numpy()
        np.testing.assert_array_equal(d, np.arange(max_doc))
        keys = list(zip(docs_tbl["conv_id"].to_pylist(), docs_tbl["turn_idx"].to_pylist()))
        assert keys == sorted(keys)

        # recompute ground truth from stored fields via the analyzer
        true_tf = [analyzer.term_freqs(t or "") for t in docs_tbl["text"].to_pylist()]
        true_dl = np.array([sum(c.values()) for c in true_tf], dtype=np.int64)
        true_norms = encode_norms(true_dl)
        inv: dict[str, Counter] = {}
        for doc, c in enumerate(true_tf):
            for term, f in c.items():
                inv.setdefault(term, Counter())[doc] = f

        terms = postings["term"].to_pylist()
        assert terms == sorted(terms) and len(set(terms)) == len(terms)
        assert set(terms) == set(inv)
        assert m["n_terms"] == len(terms)

        sum_ttf = 0
        for row in postings.to_pylist():
            docs_arr, tfs, norms = decode_posting(row)
            # postings ascending, df == length, ttf == sum(tf)
            assert np.all(np.diff(docs_arr) > 0)
            assert row["df"] == len(docs_arr)
            assert row["ttf"] == int(tfs.sum())
            sum_ttf += row["ttf"]
            assert docs_arr[0] >= 0 and docs_arr[-1] < max_doc
            # postings match ground-truth inverted index exactly
            want = inv[row["term"]]
            assert dict(zip(docs_arr.tolist(), tfs.tolist())) == dict(want)
            # norms present and equal to the SmallFloat-encoded true dl
            np.testing.assert_array_equal(norms, true_norms[docs_arr])
            # skip data consistent + impacts are upper bounds per block
            nb = len(row["block_offset"])
            bf = row["block_first_doc"]
            bl = row["block_last_doc"]
            assert all(bf[i] <= bl[i] for i in range(nb))
            assert all(bl[i] < bf[i + 1] for i in range(nb - 1))
            # per-block: recompute max_tf / min_norm from decoded entries
            pos = 0
            for i in range(nb):
                in_block = (docs_arr >= bf[i]) & (docs_arr <= bl[i])
                assert row["block_max_tf"][i] == int(tfs[in_block].max())
                assert row["block_min_norm"][i] == int(norms[in_block].min())
                pos += int(in_block.sum())
            assert pos == row["df"]
            if "pos_blob" in row and row.get("pos_blob") is not None:
                ps = decode_positions(
                    row["pos_blob"], int(row["pos_width"]), tfs
                )
                assert len(ps) == row["ttf"]
                bounds = np.concatenate([[0], np.cumsum(tfs)])
                for j, doc in enumerate(docs_arr.tolist()):
                    run = ps[bounds[j]: bounds[j + 1]]
                    assert np.all(np.diff(run) > 0)
                    assert run[0] >= 0 and run[-1] < true_dl[doc]
                    toks = analyzer.tokens(
                        docs_tbl["text"][int(doc)].as_py() or ""
                    )
                    want_pos = [
                        i for i, t in enumerate(toks) if t == row["term"]
                    ]
                    assert run.tolist() == want_pos
        assert m["sum_dl"] == sum_ttf == int(true_dl.sum())
    assert total_docs == manifest["totals"]["doc_count"]


@pytest.fixture(scope="session")
def audited_pos_index(ray_session, tiny_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("chkpos") / "idx")
    build_index(
        tiny_corpus, idx, num_segments=4, salt_range=64, with_positions=True
    )
    return idx


def test_check_index_invariants_positional(audited_pos_index):
    audit_index(audited_pos_index)
