"""WordBreakSpellChecker: break AND combine modes over a compound-bearing
corpus (the synthetic sf vocabulary has no run-together compounds, so the
registered oracle-backed op only fires break mode; combine is pinned here).

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
WordBreakSpellChecker.java — suggestWordBreaks (maxChanges=1, ranked by
freq of the least-frequent part) and suggestWordCombinations (adjacent
pair whose concatenation is a dictionary word).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def compound_index(ray_session, tmp_path_factory):
    from rindex.build import build_index

    rows = [
        (0, 0, "data base data base database"),
        (0, 1, "note book note pad notebook"),
        (1, 0, "data base systems store rows"),
        (1, 1, "the notebook has a database"),
        (2, 0, "plain filler words here"),
        (2, 1, "base data note plain"),
    ]
    tmp = tmp_path_factory.mktemp("wordbreak")
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.int64()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    src = tmp / "src"
    src.mkdir()
    pq.write_table(t, str(src / "part-0.parquet"))
    idx = str(tmp / "idx")
    build_index(str(src), idx, num_segments=2, mode="local", keep_cols=())
    return idx


def test_break_mode(compound_index):
    from rindex.ops.search_ext import word_break_suggest

    out = word_break_suggest(
        compound_index,
        break_inputs=("databasesystems",),  # OOV run-together
        combine_query="",
    )
    br = out[out["mode"] == "break"]
    # "database systems" (split at 8) and "data basesystems" is invalid
    # ("basesystems" OOV); "databases ystems" invalid.  Expect exactly the
    # splits where BOTH parts are dictionary words.
    assert list(br["suggestion"]) == ["database systems"]
    # freq = df of the least-frequent part: database df=2, systems df=1
    assert list(br["freq"]) == [1]


def test_break_ranking_by_weakest_part(compound_index):
    from rindex.ops.search_ext import word_break_suggest

    out = word_break_suggest(
        compound_index, break_inputs=("database",), combine_query=""
    )
    br = out[out["mode"] == "break"]
    # "data base": min(df(data)=3, df(base)=4) = 3
    assert list(br["suggestion"]) == ["data base"]
    assert list(br["freq"]) == [3]


def test_combine_mode(compound_index):
    from rindex.ops.search_ext import word_break_suggest

    out = word_break_suggest(
        compound_index,
        break_inputs=(),
        combine_query="data base note book plain",
    )
    cb = out[out["mode"] == "combine"]
    # adjacent pairs: data+base -> database (df=2), base+note -> OOV,
    # note+book -> notebook (df=2), book+plain -> OOV
    got = dict(zip(cb["input"], cb["suggestion"]))
    assert got == {"data base": "database", "note book": "notebook"}
    assert dict(zip(cb["suggestion"], cb["freq"])) == {
        "database": 2,
        "notebook": 2,
    }


def test_min_freq_gate(compound_index):
    from rindex.ops.search_ext import word_break_suggest

    out = word_break_suggest(
        compound_index,
        break_inputs=("databasesystems",),
        combine_query="",
        min_freq=2,  # systems df=1 < 2 -> suggestion suppressed
    )
    assert out.empty
