"""fvecs/ivecs/bvecs readers — format fidelity per dotvecs.rs semantics."""

import os
import struct

import numpy as np
import pytest

from lantern_extras_spark.sources import vecs as VS


@pytest.fixture(scope="module")
def tdir(tmp_path_factory):
    return tmp_path_factory.mktemp("vecs")


def test_fvecs_roundtrip(spark, tdir):
    path = str(tdir / "a.fvecs")
    data = [[1.5, -2.25, 3.0], [4.0, 5.0, 6.0]]
    VS.write_fvecs(path, data)
    rows = VS.read_fvecs(spark, path).orderBy("row_id").collect()
    assert [r["vector"] for r in rows] == data


def test_fvecs_count_limit(spark, tdir):
    path = str(tdir / "b.fvecs")
    VS.write_fvecs(path, [[float(i), 0.0] for i in range(10)])
    assert VS.read_fvecs(spark, path, count=3).count() == 3


def test_ivecs(spark, tdir):
    path = str(tdir / "c.ivecs")
    with open(path, "wb") as f:
        for v in [[1, 2, 3], [4, 5, 6]]:
            f.write(struct.pack("<I", 3))
            f.write(np.asarray(v, dtype=np.int32).tobytes())
    rows = VS.read_ivecs(spark, path).orderBy("row_id").collect()
    assert [r["vector"] for r in rows] == [[1, 2, 3], [4, 5, 6]]


def test_bvecs_widened(spark, tdir):
    path = str(tdir / "d.bvecs")
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        f.write(bytes([0, 127, 200, 255]))  # u8 values > i8 range
    rows = VS.read_bvecs(spark, path).collect()
    assert rows[0]["vector"] == [0, 127, 200, 255]  # widened to smallint


def test_inconsistent_dims_error(spark, tdir):
    path = str(tdir / "bad.fvecs")
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 2) + np.zeros(2, dtype=np.float32).tobytes())
        f.write(struct.pack("<I", 3) + np.zeros(3, dtype=np.float32).tobytes())
    with pytest.raises(Exception, match="inconsistent"):
        VS.read_fvecs(spark, path).collect()


def test_truncated_record_error(spark, tdir):
    path = str(tdir / "trunc.fvecs")
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 10) + b"\x00" * 8)  # claims 10 floats, has 2
    with pytest.raises(Exception, match="truncated"):
        VS.read_fvecs(spark, path).collect()


def test_write_corpus_shards_token_balance(spark, tmp_path):
    from lantern_extras_spark.sources.sinks import write_corpus_shards

    # 40 docs x 10 tokens = 400 tokens; 100-token shards -> 4 shards
    docs = spark.createDataFrame(
        [(i, "w " * 10) for i in range(40)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    n = write_corpus_shards(docs, path, tokens_per_shard=100)
    assert n == 4
    back = spark.read.parquet(path)
    assert back.count() == 40
    sizes = {r["shard"]: r["n"] for r in back.groupBy("shard").count()
             .withColumnRenamed("count", "n").collect()}
    assert set(sizes) == {0, 1, 2, 3}
    # contiguous-prefix binning: every shard holds ~100 tokens = 10 docs
    assert all(v == 10 for v in sizes.values())
    # deterministic across runs (same seed -> same assignment)
    path2 = str(tmp_path / "shards2")
    write_corpus_shards(docs, path2, tokens_per_shard=100)
    a = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(path2)
         .select("doc_id", "shard").collect()}
    assert a == b
    # one FILE per shard, not just one directory (rows repartitioned on shard)
    import glob
    for s in range(4):
        files = [f for f in glob.glob(f"{path}/shard={s}/*") if not f.endswith(".crc")]
        assert len(files) == 1, files
    # text format writes one value column per doc
    path3 = str(tmp_path / "shards_txt")
    write_corpus_shards(docs, path3, tokens_per_shard=100, fmt="text")
    assert spark.read.text(path3).count() == 40
    import pytest as _pt
    with _pt.raises(ValueError, match="fmt"):
        write_corpus_shards(docs, path, tokens_per_shard=100, fmt="csvx")
