"""compression_ratio vs a scalar zlib mirror over the same rows."""

import zlib

import pyarrow.parquet as pq

from marc_data_migration_ray.pipelines import text_analysis

SF_DIR = "/root/testdata/sf0.001"


def test_compression_ratio_matches_scalar_mirror(ray_session):
    got = {
        r["doc_id"]: r
        for r in text_analysis.compression_ratio(SF_DIR).take_all()
    }
    t = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == t.num_rows
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        raw = len(text.encode())
        comp = len(zlib.compress(text.encode(), text_analysis.ZRATIO_LEVEL))
        r = got[doc_id]
        assert r["raw_len"] == raw
        assert r["comp_len"] == comp
        assert r["ratio_milli"] == comp * 1000 // max(raw, 1)
        assert r["is_natural"] == (r["ratio_milli"] >= text_analysis.ZRATIO_MIN_MILLI)
