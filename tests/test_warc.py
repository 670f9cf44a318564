"""WARC/1.0 reader-writer (functions/warc.py) — framing, gzip members,
non-response skipping, and the shard-parallel Ray reader."""

from __future__ import annotations

import datetime as dt
import gzip

from documentai_ray.functions.warc import (build_record, iter_warc,
                                           read_warc, write_warc)

TS = dt.datetime(2024, 1, 2, 3, 4, 5)


def test_roundtrip_plain_and_gz(tmp_path):
    recs = [
        ("https://h/p/1", TS, b"<html>one</html>"),
        ("https://h/p/2", TS, b"\xff\xfe\x00 binary body \r\n\r\n tricky"),
        ("https://h/p/3", TS, b""),
    ]
    for name in ("a.warc", "a.warc.gz"):
        p = str(tmp_path / name)
        assert write_warc(p, recs) == 3
        got = list(iter_warc(open(p, "rb").read()))
        assert got == recs


def test_gz_is_per_record_members(tmp_path):
    p = str(tmp_path / "m.warc.gz")
    write_warc(p, [("u1", TS, b"x"), ("u2", TS, b"y")])
    blob = open(p, "rb").read()
    # two gzip magic headers -> two members (CC record-level layout)
    assert blob.count(b"\x1f\x8b\x08") == 2
    # each member is independently decompressible at its offset
    second = blob.index(b"\x1f\x8b\x08", 3)
    assert b"WARC-Target-URI: u2" in gzip.decompress(blob[second:])


def test_non_response_records_skipped():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\ninfo\r\n\r\n")
    resp = build_record("https://h/p/9", TS, b"body")
    got = list(iter_warc(info + resp))
    assert got == [("https://h/p/9", TS, b"body")]


def test_read_warc_distributed(ray_session, tmp_path):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.warc.gz")
        write_warc(p, [(f"https://h/p/{i}-{j}", TS, f"b{i}{j}".encode())
                       for j in range(4)])
        paths.append(p)
    df = read_warc(paths).to_pandas().sort_values("url")
    assert len(df) == 12
    assert df.iloc[0].html == b"b00"
    assert str(df.iloc[0].warc_ts) == "2024-01-02 03:04:05"


def test_wet_roundtrip_records():
    from documentai_ray.functions.warc import (build_conversion_record,
                                               iter_wet)

    recs = [("https://h/p/1", TS, "line one\nline two"),
            ("https://h/p/2", TS, ""),
            ("https://h/p/3", TS, "naïve café — unicode")]
    blob = b"".join(build_conversion_record(*r) for r in recs)
    assert list(iter_wet(blob)) == recs


def test_wet_shard_write_read(ray_session, tmp_path):
    import datetime as dt

    import ray.data

    from documentai_ray.functions.warc import read_wet, write_wet_shards

    rows = [{"url": f"https://h/p/{i}",
             "warc_ts": dt.datetime(2024, 1, 1, 0, i),
             "text": f"doc {i}\nbody"} for i in range(20)]
    ds = ray.data.from_items(rows).repartition(4)
    manifest = write_wet_shards(ds, str(tmp_path / "wet"),
                                num_shards=4).to_pandas()
    assert manifest.n_records.sum() == 20
    back = read_wet(manifest.path.tolist()).to_pandas()
    assert len(back) == 20
    got = dict(zip(back.url, back.text))
    assert got["https://h/p/7"] == "doc 7\nbody"


def test_cdx_index_random_access(tmp_path):
    from documentai_ray.functions.warc import (fetch_record,
                                               write_warc_indexed)

    p = str(tmp_path / "i.warc.gz")
    recs = [(f"https://h/p/{i}", TS, f"body {i}".encode() * (i + 1))
            for i in range(10)]
    idx = write_warc_indexed(p, recs)
    assert len(idx) == 10
    # fetch records out of order by byte range only
    for i in (7, 0, 9, 3):
        e = idx[i]
        assert fetch_record(p, e["offset"], e["length"]) == recs[i]
    # offsets tile the file exactly
    import os
    assert idx[-1]["offset"] + idx[-1]["length"] == os.path.getsize(p)


def test_jsonl_shards_deterministic_and_resumable(ray_session, tmp_path):
    import gzip
    import hashlib

    import ray.data

    from documentai_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    rows = [{"url": f"https://h/{i}", "text": f"line\nbreak é {i}"}
            for i in range(100)]
    digests = []
    for run in (1, 2):
        d = tmp_path / f"r{run}"
        ds = ray.data.from_items(rows).repartition(4 if run == 1 else 7)
        m = write_jsonl_shards(ds, str(d), num_shards=4).to_pandas()
        assert int(m["n_records"].sum()) == 100
        blob = b"".join(
            (d / f"shard-{b:02d}.jsonl.gz").read_bytes() for b in range(4))
        digests.append(hashlib.md5(blob).hexdigest())
    # byte-identical shards across runs AND parallelism levels
    assert digests[0] == digests[1]
    back = read_jsonl(sorted(str(p) for p in (tmp_path / "r1").iterdir()))
    df = back.to_pandas().sort_values("url").reset_index(drop=True)
    import pandas as pd
    expect = pd.DataFrame(rows).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(df[["url", "text"]], expect)


def test_tfrecord_crc_validation_rejects_corruption(ray_session, tmp_path):
    import ray.data

    from documentai_ray.sources.tfrecord import (iter_tfrecords,
                                                 read_tfrecord,
                                                 write_tfrecord_shards)

    rows = [{"url": f"https://h/{i}", "text": f"t {i} é"} for i in range(40)]
    m = write_tfrecord_shards(ray.data.from_items(rows), str(tmp_path),
                              num_shards=2).to_pandas()
    assert int(m["n_records"].sum()) == 40
    paths = sorted(str(p) for p in tmp_path.iterdir())
    back = read_tfrecord(paths).to_pandas().sort_values("url")
    assert len(back) == 40 and set(back.columns) == {"url", "text"}
    # flip one payload byte → the CRC check must fail loudly
    blob = bytearray(open(paths[0], "rb").read())
    blob[20] ^= 0xFF
    import pytest
    with pytest.raises(ValueError, match="crc mismatch"):
        list(iter_tfrecords(bytes(blob)))
    # truncation must also fail loudly
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(open(paths[0], "rb").read()[:-2]))


def test_csv_shards_quote_newline_roundtrip(ray_session, tmp_path):
    import ray.data

    from documentai_ray.sources.jsonl import read_csv_shards, write_csv_shards

    rows = [{"url": f"https://h/{i}",
             "text": f'line1\nline2 "quoted" ,comma é {i}'} for i in range(30)]
    m = write_csv_shards(ray.data.from_items(rows), str(tmp_path),
                         num_shards=3).to_pandas()
    assert int(m["n_records"].sum()) == 30
    back = (read_csv_shards(sorted(str(p) for p in tmp_path.iterdir()))
            .to_pandas().sort_values("url").reset_index(drop=True))
    import pandas as pd
    expect = pd.DataFrame(rows).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["url", "text"]], expect)


def test_ipc_shards_roundtrip(ray_session, tmp_path):
    import ray.data

    from documentai_ray.sources.jsonl import read_ipc_shards, write_ipc_shards

    rows = [{"url": f"https://h/{i}", "text": f"body é\n{i}"} for i in range(25)]
    m = write_ipc_shards(ray.data.from_items(rows), str(tmp_path),
                         num_shards=3).to_pandas()
    assert int(m["n_records"].sum()) == 25
    back = (read_ipc_shards(sorted(str(p) for p in tmp_path.iterdir()))
            .to_pandas().sort_values("url").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(
        back, pd.DataFrame(rows).sort_values("url").reset_index(drop=True))


def test_sorted_export_global_order(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from documentai_ray.stages.curation import sorted_range_export

    rows = [{"k": f"key{i:04d}", "v": i} for i in range(0, 400, 3)]
    man = sorted_range_export(
        ray.data.from_items(rows).repartition(5), str(tmp_path),
        key_col="k", boundaries=["key0100", "key0200", "key0300"]
    ).to_pandas().sort_values("shard")
    assert man["shard"].tolist() == [0, 1, 2, 3]
    # manifest ranges don't overlap and cover in order
    assert (man["max_key"].to_numpy()[:-1] < man["min_key"].to_numpy()[1:]).all()
    # shards are internally sorted AND globally ordered end-to-end
    all_keys = []
    for p in sorted(glob.glob(str(tmp_path / "part-*.parquet"))):
        ks = pq.read_table(p).column("k").to_pylist()
        assert ks == sorted(ks)
        all_keys.extend(ks)
    assert all_keys == sorted(k["k"] for k in rows)
