"""WebDataset tar-shard reader (sources/webdataset.py)."""

import pytest

from lantern_extras_spark.sources import webdataset as WDS


def _ppm(px=(255, 0, 0)):
    return b"P6\n2 2\n255\n" + bytes(px) * 4


SAMPLES = [
    {"key": "000000", "parts": {"ppm": _ppm(), "txt": b"a red square", "json": b'{"id": 0}'}},
    {"key": "000001", "parts": {"ppm": _ppm((0, 255, 0)), "txt": b"a green square"}},
    {"key": "000002", "parts": {"txt": b"text only sample"}},
]


def test_split_wds_key():
    assert WDS.split_wds_key("000123.jpg") == ("000123", "jpg")
    assert WDS.split_wds_key("a/b.c.jpg") == ("a/b", "c.jpg")
    assert WDS.split_wds_key("dir/plain") == ("dir/plain", "")


def test_parse_roundtrip(tmp_path):
    p = str(tmp_path / "shard-000.tar")
    WDS.write_webdataset_shard(p, SAMPLES)
    got = WDS.parse_webdataset_bytes(open(p, "rb").read())
    assert [s["key"] for s in got] == ["000000", "000001", "000002"]
    assert got[0]["parts"]["txt"] == b"a red square"
    assert set(got[0]["parts"]) == {"ppm", "txt", "json"}
    assert len(WDS.parse_webdataset_bytes(open(p, "rb").read(), max_samples=2)) == 2


def test_malformed_shards(tmp_path):
    # interleaved keys = half-samples -> must fail loudly
    p = str(tmp_path / "bad.tar")
    WDS.write_webdataset_shard(
        p,
        [
            {"key": "a", "parts": {"txt": b"1"}},
            {"key": "b", "parts": {"txt": b"2"}},
            {"key": "a", "parts": {"json": b"3"}},
        ],
    )
    with pytest.raises(ValueError, match="non-consecutive"):
        WDS.parse_webdataset_bytes(open(p, "rb").read())
    with pytest.raises(ValueError, match="tar"):
        WDS.parse_webdataset_bytes(b"definitely not a tar file at all" * 30)


def test_read_webdataset_spark_and_multimodal(spark, tmp_path):
    """Shards -> rows -> image feature kernel: the multimodal training seam."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.multimodal.media import decode_image_features

    for i in range(2):
        WDS.write_webdataset_shard(str(tmp_path / f"s{i}.tar"), SAMPLES)
    df = WDS.read_webdataset(spark, str(tmp_path / "*.tar"))
    assert df.count() == 6
    pairs = df.select(
        "key",
        F.element_at("parts", "ppm").alias("media"),
        F.decode(F.element_at("parts", "txt"), "UTF-8").alias("caption"),
    ).where(F.col("media").isNotNull())
    assert pairs.count() == 4
    feats = decode_image_features(
        pairs.withColumn("media_id", F.monotonically_increasing_id()),
        decoder="numpy", dim=8,
    )
    rows = feats.collect()
    assert len(rows) == 4 and all(len(r["feature"]) == 8 for r in rows)


def test_read_webdataset_stream(spark, tmp_path):
    src = tmp_path / "shards"; src.mkdir()
    sink = tmp_path / "out"; ckpt = tmp_path / "ck"
    WDS.write_webdataset_shard(str(src / "a.tar"), SAMPLES[:2])
    stream = WDS.read_webdataset_stream(spark, str(src))
    from pyspark.sql import functions as F

    q = (
        stream.select("key", F.decode(F.element_at("parts", "txt"), "UTF-8").alias("t"))
        .writeStream.format("parquet")
        .option("path", str(sink)).option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["key"]: r["t"] for r in spark.read.parquet(str(sink)).collect()}
    assert got == {"000000": "a red square", "000001": "a green square"}


def test_write_webdataset_shards_roundtrip(spark, tmp_path):
    """Distributed export -> read back: same samples, deterministic shard
    assignment, consecutive members, key-sorted within shards."""
    from pyspark.sql import functions as F

    rows = [
        (f"{i:06d}", {"txt": bytearray(f"caption {i}".encode()), "cls": bytearray(str(i % 3).encode())})
        for i in range(37)
    ]
    df = spark.createDataFrame(rows, "key string, parts map<string, binary>")
    out = str(tmp_path / "export")
    manifest = WDS.write_webdataset_shards(df, out, samples_per_shard=10)
    assert sum(r["n_samples"] for r in manifest) == 37
    assert all(r["file"].endswith(".tar") for r in manifest)
    # identical re-run -> identical assignment (deterministic hash sharding)
    manifest2 = WDS.write_webdataset_shards(df, str(tmp_path / "export2"), samples_per_shard=10)
    assert [(r["shard"], r["n_samples"]) for r in manifest] == [
        (r["shard"], r["n_samples"]) for r in manifest2
    ]
    back = WDS.read_webdataset(spark, out + "/*.tar")
    got = {
        r["key"]: bytes(r["parts"]["txt"]).decode()
        for r in back.collect()
    }
    assert got == {f"{i:06d}": f"caption {i}" for i in range(37)}
    # empty frame: no shards, no crash
    assert WDS.write_webdataset_shards(df.limit(0), str(tmp_path / "e")) == []


# ---------------------------------------------------------------------------
# Differential fuzz: shard write -> parse round-trip (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=12)
_ext = st.sampled_from(["jpg", "txt", "json", "cls", "bin"])


@settings(max_examples=40, deadline=None)
@given(
    data=st.dictionaries(
        _keys,
        st.dictionaries(_ext, st.binary(max_size=300), min_size=1, max_size=4),
        min_size=1,
        max_size=10,
    )
)
def test_webdataset_roundtrip_fuzz(tmp_path_factory, data):
    d = tmp_path_factory.mktemp("wds")
    p = str(d / "s.tar")
    samples = [{"key": k, "parts": v} for k, v in data.items()]
    WDS.write_webdataset_shard(p, samples)
    got = WDS.parse_webdataset_bytes(open(p, "rb").read())
    assert {g["key"]: g["parts"] for g in got} == data


def test_iter_webdataset_samples_bounded_memory(tmp_path):
    """Streaming pin (mirrors the WARC one): iterating a shard from disk
    holds ~one sample, never the shard."""
    import tarfile
    import tracemalloc

    p = str(tmp_path / "big.tar")
    payload = bytes(1 << 20)  # 1 MiB per member
    with tarfile.open(p, "w") as tar:
        import io as _io

        for i in range(150):  # 150 MiB shard
            info = tarfile.TarInfo(name=f"{i:06d}.bin")
            info.size = len(payload)
            tar.addfile(info, _io.BytesIO(payload))
    tracemalloc.start()
    n = 0
    for s in WDS.iter_webdataset_samples(p):
        assert len(s["parts"]["bin"]) == len(payload)
        n += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 150
    assert peak < 24 * (1 << 20), f"peak {peak / 1e6:.1f} MB — not streaming"


def test_interleave_guard_bounded_memory(tmp_path):
    """r12 verdict #4: the interleave guard holds 64-bit fingerprints, not
    key strings — a key-dense shard (100k tiny samples, 120-char keys)
    stays far below what retaining the keys themselves would cost
    (~30 MB measured), restoring symmetry with the 'peak = one sample'
    contract up to the documented ~30 B/sample fingerprint cost."""
    import io as _io
    import tarfile
    import tracemalloc

    p = str(tmp_path / "dense.tar")
    n = 100_000
    with tarfile.open(p, "w") as tar:
        for i in range(n):
            # long keys are the point: the guard must not retain them
            info = tarfile.TarInfo(
                name=f"{'very/long/common/crawl/style/prefix' * 2}/{i:09d}.txt"
            )
            info.size = 2
            tar.addfile(info, _io.BytesIO(b"hi"))
    tracemalloc.start()
    count = sum(1 for _ in WDS.iter_webdataset_samples(p))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n
    assert peak < 16 * (1 << 20), f"peak {peak / 1e6:.1f} MB — guard retains keys?"
