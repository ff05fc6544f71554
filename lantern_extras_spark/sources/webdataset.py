"""WebDataset tar-shard reader — the de-facto multimodal training format.

Large image/audio-text corpora (LAION-scale) ship as thousands of .tar
shards whose members group by basename: `000123.jpg` + `000123.txt` +
`000123.json` are ONE sample keyed `000123` (the public WebDataset
convention: the key is the path up to the FIRST dot of the last path
segment, so `a/b.c.jpg` has key `a/b` and extension `c.jpg`). This module
reads shards into one row per sample with a map of extension → bytes,
feeding the multimodal kernels (decode_image_features, audio_frame_energy,
clip_preprocess) and the text pipeline directly.

Spark design — same stance as sources/vecs.py and sources/warc.py: shards
arrive through `binaryFile`, ONE TASK PER SHARD (tar has no central index;
members stream sequentially, and the corpus-level parallelism axis is the
shard count — WebDataset exists precisely so that a 100 TB corpus is
10k+ independently-readable shards). stdlib tarfile over an in-memory
buffer; .tar.gz accepted via the same transparent decompression. A
`read_webdataset_stream` twin rides the binaryFile streaming source for
continuously-landing shards.

No counterpart in the reference (Postgres ingestion only) — part of the
beyond-reference training-pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WDS_SCHEMA = "path string, key string, parts map<string, binary>"
_BINFILE_SCHEMA = "path string, modificationTime timestamp, length long, content binary"


def split_wds_key(name: str) -> tuple[str, str]:
    """WebDataset member name → (sample key, extension): split at the FIRST
    dot of the last path segment (`a/b.c.jpg` → (`a/b`, `c.jpg`))."""
    head, _, last = name.rpartition("/")
    stem, dot, ext = last.partition(".")
    key = f"{head}/{stem}" if head else stem
    return key, ext if dot else ""


def parse_webdataset_bytes(
    blob: bytes, max_samples: int | None = None
) -> list[dict]:
    """Parse one shard's bytes → [{key, parts: {ext: bytes}}]. Samples are
    consecutive runs of members sharing a key (the format's contract — tar
    order IS sample order; an interleaved shard is malformed and fails
    loudly so a half-sample never trains). Directories and PAX metadata
    members are skipped; extensionless members land under ''."""
    out: list[dict] = []
    seen: set[str] = set()
    cur_key: str | None = None
    cur: dict[str, bytes] = {}

    def flush():
        nonlocal cur_key, cur
        if cur_key is not None:
            if cur_key in seen:
                raise ValueError(
                    f"webdataset shard: key {cur_key!r} appears in non-consecutive "
                    "runs (interleaved shard)"
                )
            seen.add(cur_key)
            out.append({"key": cur_key, "parts": cur})
        cur_key, cur = None, {}

    try:
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tar:
            for m in tar:
                if not m.isfile():
                    continue
                key, ext = split_wds_key(m.name)
                if key != cur_key:
                    flush()
                    if max_samples is not None and len(out) >= max_samples:
                        return out
                    cur_key = key
                if ext in cur:
                    raise ValueError(
                        f"webdataset shard: duplicate extension {ext!r} for key {key!r}"
                    )
                f = tar.extractfile(m)
                cur[ext] = f.read() if f is not None else b""
    except tarfile.TarError as e:
        raise ValueError(f"bad webdataset tar shard: {e}") from e
    flush()
    return out


def _parse_batches(batches: Iterator[pd.DataFrame], max_samples) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for _, row in pdf.iterrows():
            samples = parse_webdataset_bytes(bytes(row["content"]), max_samples)
            if samples:
                out = pd.DataFrame(samples)
                out.insert(0, "path", row["path"])
                yield out[["path", "key", "parts"]]


def read_webdataset(
    spark: SparkSession,
    path: str,
    max_samples_per_shard: int | None = None,
) -> DataFrame:
    """Read WebDataset shard(s) → (path, key, parts map<string,binary>) —
    one task per shard. Project parts with `element_at(parts, 'jpg')` /
    `map_keys`; the column-pruning analog for a tar source is
    `max_samples_per_shard` (sampling runs) since tar has no random access."""
    binary = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _parse_batches(batches, max_samples_per_shard)

    return binary.select("path", "content").mapInPandas(parse, _WDS_SCHEMA)


def read_webdataset_stream(
    spark: SparkSession,
    path: str,
    glob: str = "*.tar",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of `read_webdataset` (shards land continuously from a
    packing job); exactly-once shard tracking from the checkpoint,
    `maxFilesPerTrigger` as backpressure (shards are ~1 GB: cap files)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINFILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    binary = reader.load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _parse_batches(batches, None)

    return binary.select("path", "content").mapInPandas(parse, _WDS_SCHEMA)


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    samples_per_shard: int = 1000,
    n_shards: int | None = None,
    key_col: str = "key",
    parts_col: str = "parts",
):
    """Distributed WebDataset EXPORT — the symmetry of `read_webdataset`:
    shard a (key, parts map<string,binary>) frame into `shard-NNNNNN.tar`
    files under `path`, one tar per task via groupBy(shard).applyInPandas.
    Shard assignment is deterministic (xxhash64(key) mod n — re-runs produce
    identical shards), members within a shard are key-sorted, and each
    sample's members are written consecutively (the format's contract, the
    same one `parse_webdataset_bytes` enforces on read). `path` must be a
    filesystem every executor can reach (shared FS / fuse mount — the same
    contract as any Spark file sink). Returns the collected manifest
    [(shard, file, n_samples, n_bytes)] — one row per shard, bounded.

    For token/byte-BALANCED text shards use `write_corpus_shards`; this
    writer is for multimodal sample bundles where the unit is the sample."""
    import math
    import os

    from pyspark.sql import functions as F

    count = df.count()
    if count == 0:
        return []
    n = n_shards or max(1, math.ceil(count / samples_per_shard))
    os.makedirs(path, exist_ok=True)
    asg = df.select(
        F.col(key_col).alias("key"), F.col(parts_col).alias("parts")
    ).withColumn("__shard", F.pmod(F.xxhash64(F.col("key")), F.lit(n)))

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        fname = os.path.join(path, f"shard-{shard:06d}.tar")
        pdf = pdf.sort_values("key")
        n_bytes = 0
        with tarfile.open(fname, "w") as tar:
            for _, row in pdf.iterrows():
                for ext, payload in row["parts"].items():
                    payload = bytes(payload)
                    name = f"{row['key']}.{ext}" if ext else row["key"]
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                    n_bytes += len(payload)
        return pd.DataFrame(
            [{"shard": shard, "file": fname, "n_samples": len(pdf), "n_bytes": n_bytes}]
        )

    manifest = asg.groupBy("__shard").applyInPandas(
        write_group, "shard long, file string, n_samples long, n_bytes long"
    )
    return sorted(manifest.collect(), key=lambda r: r["shard"])


def write_webdataset_shard(path: str, samples: list[dict]) -> None:
    """Test helper / exporter: write one WebDataset shard. `samples` =
    [{key, parts: {ext: bytes}}], members emitted key-consecutively in the
    given order (the format's contract)."""
    with tarfile.open(path, "w") as tar:
        for s in samples:
            for ext, payload in s["parts"].items():
                name = f"{s['key']}.{ext}" if ext else s["key"]
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
