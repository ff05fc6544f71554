"""CLI surface (`python -m lantern_extras_spark`) — one subprocess smoke test
per reference subcommand (lantern_cli/src/cli.rs:10-32). Each test drives the
real module entry point on tiny fixtures (sf0.001 testdata) and parses the
JSON contract line the command prints."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(*args, timeout=240):
    out = subprocess.run(
        [sys.executable, "-m", "lantern_extras_spark", *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith(("{", "["))]
    assert lines, out.stdout
    return [json.loads(ln) for ln in lines]


def _spawn(*args):
    return subprocess.Popen(
        [sys.executable, "-m", "lantern_extras_spark", *args],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
    )


def _first_json_line(proc, timeout=120):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        line = proc.stdout.readline()
        if line.startswith("{"):
            return json.loads(line)
    raise TimeoutError("server never printed its listening line")


def test_cli_show_runtimes_and_models():
    (runtimes,) = _run("show-runtimes")
    assert "hash" in runtimes and "openai" in runtimes
    (models,) = _run("show-models", "--runtime", "openai")
    assert any("text-embedding" in m for m in models)


def test_cli_measure_model_speed():
    (rep,) = _run("measure-model-speed", "--max-tokens", "100")
    assert rep["runtime"] == "hash" and rep["emb_per_sec_max"] > 0


def test_cli_create_embeddings(tmp_path):
    out = str(tmp_path / "emb.parquet")
    (res,) = _run("create-embeddings", "--input", f"{SF}/documents.parquet",
                  "--column", "text", "--output", out, "--limit", "40")
    assert res["output"] == out and 0 < res["rows"] <= 40 and res["tokens"] > 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_cli_create_index(tmp_path):
    (res,) = _run("create-index", "--input", f"{SF}/embeddings.parquet",
                  "--root", str(tmp_path), "--index-name", "smoke",
                  "-m", "4", "--efc", "16", "--ef", "16", "--n-shards", "2")
    assert res["index"].endswith("smoke")
    assert os.path.isfile(os.path.join(res["index"], "_lantern_catalog.json"))


def test_cli_autotune_index(tmp_path):
    (res,) = _run("autotune-index", "--input", f"{SF}/embeddings.parquet",
                  "--index-kind", "ivf", "--k", "5", "--n-queries", "3",
                  "--target-recall", "50", "--results-dir", str(tmp_path / "r"))
    assert res["best"] is not None and res["variants"]
    assert res["best"]["recall"] >= 50


def test_cli_pq_table(tmp_path):
    out = str(tmp_path / "coded.parquet")
    cb = str(tmp_path / "codebook")
    (res,) = _run("pq-table", "--input", f"{SF}/embeddings.parquet",
                  "--output", out, "--splits", "4", "--clusters", "8",
                  "--codebook", cb)
    assert res["codes_column"] == "embedding_pq"
    assert os.path.exists(os.path.join(out, "_SUCCESS")) and os.path.isdir(cb)


def test_cli_start_daemon_exits_after_max_cycles(tmp_path):
    lines = _run("start-daemon", "--store", str(tmp_path / "store"),
                 "--table", f"documents={SF}/documents.parquet",
                 "--poll-seconds", "0", "--max-cycles", "1")
    assert lines[0]["daemon"] == "started" and lines[0]["tables"] == ["documents"]
    assert lines[-1]["daemon"] == "stopped"


def test_cli_start_server_serves_requests(tmp_path):
    proc = _spawn("start-server", "--root", str(tmp_path / "cols"),
                  "--port", "0", "--username", "u", "--password", "p")
    try:
        hello = _first_json_line(proc)
        assert hello["auth"] is True
        import base64
        import urllib.request

        req = urllib.request.Request(f"http://127.0.0.1:{hello['port']}/collections")
        req.add_header("Authorization", "Basic " + base64.b64encode(b"u:p").decode())
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200 and json.loads(resp.read()) == []
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)


def test_cli_start_indexing_server_accepts_connections():
    proc = _spawn("start-indexing-server", "--port", "0")
    try:
        hello = _first_json_line(proc)
        import socket

        with socket.create_connection(("127.0.0.1", hello["port"]), timeout=10):
            pass  # the protocol handshake is covered by test_index_server.py
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)


def test_cli_bad_input_fails_loud(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "lantern_extras_spark", "create-embeddings",
         "--input", "/no/such/file.parquet", "--column", "text",
         "--output", str(tmp_path / "x")],
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert out.returncode != 0


@pytest.mark.parametrize("args", [("show-models",), ("show-runtimes",)])
def test_cli_sparkless_commands_are_fast(args):
    t0 = time.monotonic()
    _run(*args)
    assert time.monotonic() - t0 < 30  # no SparkSession spin-up


def test_cli_search_bm25_and_hybrid(tmp_path):
    (res,) = _run("search", "--input", f"{SF}/documents.parquet",
                  "--query", "spark merge join", "--k", "5")
    assert len(res["results"]) == 5
    assert {"doc_id", "score", "rnk"} <= set(res["results"][0])
    (res,) = _run("search", "--input", f"{SF}/documents.parquet",
                  "--query", "spark merge join", "--mode", "hybrid",
                  "--k", "5", "--pool", "10")
    assert len(res["results"]) == 5
    assert {"doc_id", "rrf", "rnk"} <= set(res["results"][0])


def test_cli_autotune_bq(tmp_path):
    (res,) = _run("autotune-index", "--input", f"{SF}/embeddings.parquet",
                  "--index-kind", "bq", "--k", "5", "--n-queries", "3")
    assert res["variants"], res
    assert "oversample" in res["variants"][0]


def test_cli_compare_compressed():
    (res,) = _run("compare-compressed", "--input", f"{SF}/embeddings.parquet",
                  "--k", "5", "--n-queries", "3", timeout=420)
    fams = {r["family"] for r in res["report"]}
    assert fams == {"float32", "sq8", "bq", "pq"}


def test_cli_corpus_health():
    (res,) = _run("corpus-health", "--input", f"{SF}/documents.parquet",
                  "--baseline", f"{SF}/documents.parquet", "--top-k", "10")
    assert res["zipf"]["slope"] < 0  # frequency falls with rank
    assert res["fertility"] and {"lang", "fertility", "chars_per_token"} <= set(res["fertility"][0])
    # identical snapshots -> every drift log-ratio ~0 (only total-size jitter)
    assert all(abs(d["log_ratio"]) < 1e-9 for d in res["top_drifts"])


def test_cli_select_data(tmp_path):
    out_path = str(tmp_path / "selected.parquet")
    (rep,) = _run(
        "select-data", "--input", f"{SF}/documents.parquet",
        "--target", f"{SF}/documents.parquet", "--output", out_path,
        "--n", "5", "--buckets", "256",
    )
    assert rep["n_selected"] == 5
    # target == raw: the divergence gauge must read zero
    assert rep["target_vs_raw_js_div"] == 0.0
    import glob

    files = glob.glob(out_path + "/*.parquet")
    assert files, "selected parquet not written"


def test_cli_sketch_stats():
    (rep,) = _run(
        "sketch-stats", "--input", f"{SF}/documents.parquet",
        "--m", "64", "--k", "32", "--top-k", "3",
    )
    assert rep["distinct_tokens"]["hll_est"] > 0
    assert len(rep["heavy_hitters"]) == 3
    # CMS one-sided guarantee visible through the CLI too
    assert all(h["cms_est"] >= h["n"] for h in rep["heavy_hitters"])
    assert [q["prob"] for q in rep["doc_token_quantiles"]] == [0.5, 0.9, 0.99]


def test_cli_release_gate(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # baseline: 3 docs; new: doc 2 edited, doc 3 removed, split column added,
    # and one doc embeds the benchmark item (contamination must be flagged)
    old = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["alpha words here now", "beta words here now", "gamma words here now"],
    })
    new = pa.table({
        "doc_id": [1, 2, 4],
        "text": ["alpha words here now",
                 "beta words here now edited",
                 "intro what is the capital of france answer paris tail"],
        "split": ["train", "train", "test"],
    })
    bench = pa.table({"doc_id": [100],
                      "text": ["what is the capital of france answer paris"]})
    pq.write_table(old, tmp_path / "old.parquet")
    pq.write_table(new, tmp_path / "new.parquet")
    pq.write_table(bench, tmp_path / "bench.parquet")
    (rep,) = _run(
        "release-gate", "--input", str(tmp_path / "new.parquet"),
        "--baseline", str(tmp_path / "old.parquet"),
        "--benchmark", str(tmp_path / "bench.parquet"),
        "--split-col", "split", "--phi", "0.01",
    )
    assert rep["n_docs"] == 3
    assert rep["diff"].get("removed", 0) >= 1 and rep["diff"].get("added", 0) >= 1
    assert rep["contaminated_docs"] == 1
    assert rep["split_leak_pairs"] == 0
    # the gate fails loudly when contamination exists
    assert rep["gate_ok"] is False


def test_cli_release_gate_typod_split_col_fails_loudly(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    new = pa.table({"doc_id": [1], "text": ["alpha words here now"],
                    "split": ["train"]})
    pq.write_table(new, tmp_path / "new.parquet")
    out = subprocess.run(
        [sys.executable, "-m", "lantern_extras_spark",
         "release-gate", "--input", str(tmp_path / "new.parquet"),
         "--split-col", "splitt"],  # typo: the audit must NOT silently skip
        capture_output=True, text=True, timeout=240, cwd=REPO,
    )
    assert out.returncode == 2, out.stderr[-2000:]
    rep = next(json.loads(ln) for ln in out.stdout.splitlines()
               if ln.startswith("{"))
    assert rep["gate_ok"] is False
    assert rep["split_col_missing"] == "splitt"


def test_cli_plan_lint(tmp_path):
    (rep,) = _run(
        "plan", "--name", "dsir_select_big", "--sf-dir", SF,
    )
    assert rep["query"] == "dsir_select_big"
    assert rep["clean"] is True, rep["findings"]
    # ad-hoc SQL with a deliberate global window must be flagged
    (rep2,) = _run(
        "plan", "--sql",
        "SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r FROM docs",
        "--table", f"docs={SF}/documents.parquet",
    )
    assert rep2["clean"] is False
    assert any(f["rule"] == "global-window" for f in rep2["findings"])


def test_cli_crawl_ingest(spark, tmp_path):
    """The public-crawl loop as one subcommand: manifest -> http CDX shards
    -> index-side filter + digest dedup -> ranged member fetch -> parquet.
    Fixtures served by tools/rangeserver; archive IO is Range GETs only."""
    import gzip as _gz

    from lantern_extras_spark.sources import warc as W
    from tools.rangeserver import serve_directory

    crawl = tmp_path / "crawl-data"
    crawl.mkdir()
    records = [
        {
            "warc_type": "response",
            "target_uri": f"https://example.com/{w}",
            "payload": (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(w) + 11}\r\n\r\n<html>{w}</html>"
            ).encode(),
            "content_type": "application/http; msgtype=response",
        }
        for w in ("alpha", "beta")
    ]
    for i in range(2):  # two archives with IDENTICAL content -> dedupable
        W.write_warc(str(crawl / f"seg-{i}.warc.gz"), records)
    idx = W.index_warc(spark, str(crawl / "*.warc.gz")).collect()
    cdx_lines = []
    for r in idx:
        fname = "crawl-data/" + r["path"].rsplit("/", 1)[1]
        entry = {
            "url": r["target_uri"],
            "mime": r["http_content_type"],
            "status": str(r["http_status"]),
            "digest": r["digest"],
            "filename": fname,
            "offset": str(r["warc_offset"]),
            "length": str(r["warc_length"]),
        }
        if "beta" in r["target_uri"]:
            del entry["digest"]  # undigested index rows exist in real CDXes
        cdx_lines.append("com,example)/ 20260101000000 " + json.dumps(entry))
    (tmp_path / "cdx-00000.gz").write_bytes(
        _gz.compress(("\n".join(cdx_lines) + "\n").encode())
    )
    (tmp_path / "cdx.paths.gz").write_bytes(_gz.compress(b"cdx-00000.gz\n"))
    (tmp_path / "warc.paths").write_text(
        "crawl-data/seg-0.warc.gz\ncrawl-data/seg-1.warc.gz\n"
    )
    with serve_directory(tmp_path) as srv:
        base = srv.base_url
        out_dir = str(tmp_path / "out_cdx")
        (rep,) = _run(
            "crawl-ingest", "--manifest", f"{base}/cdx.paths.gz",
            "--base-url", base, "--output", out_dir,
            "--filter", "status = 200", "--dedup-digest",
        )
        assert rep["kind"] == "cdx" and rep["manifest_entries"] == 1
        # alpha (digested, 2 copies) dedups to ONE before any fetch; the two
        # undigested beta rows pass through — null digests carry no content
        # identity and must never collapse into a single survivor
        assert rep["selected_index_rows"] == 3 and rep["n_records"] == 3
        bodies = sorted(
            bytes(r["body"]) for r in spark.read.parquet(out_dir).collect()
        )
        assert bodies == [
            b"<html>alpha</html>", b"<html>beta</html>", b"<html>beta</html>"
        ]
        # archive requests were all ranged (selective fetch, no full bodies)
        archive_reqs = [(p, rng) for p, rng in srv.log if "seg-" in p]
        assert archive_reqs and all(rng for _, rng in archive_reqs)

        # bulk mode: warc.paths manifest, whole-archive streaming
        out_bulk = str(tmp_path / "out_warc")
        (rep2,) = _run(
            "crawl-ingest", "--manifest", f"{base}/warc.paths",
            "--base-url", base, "--kind", "warc", "--output", out_bulk,
            "--filter", "http_status = 200",
        )
        assert rep2["manifest_entries"] == 2 and rep2["n_records"] == 4
