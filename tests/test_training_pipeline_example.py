"""examples/training_data_pipeline.py as a living e2e test: clean ->
strip boilerplate -> quality/lang -> dedup -> decontaminate -> split -> pack."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_training_data_pipeline(spark):
    from training_data_pipeline import main

    out = main()
    # stage -1: every raw doc entered through the WARC wire format
    assert out["ingested"] == 9
    # stage -0.5: index-side digest dedup catches doc 7 (a byte-identical
    # re-crawl of doc 1) BEFORE any archive bytes are fetched — 8 ranges
    # survive of 9 records, and only those are read
    assert out["index_fetched"] == 8
    # doc 7 (re-crawl of doc 1's page under a variant URL) dies at stage 0
    assert out["after_url_dedup"] == [1, 2, 3, 4, 5, 6, 8, 9]
    # the cross-site license paragraph survives only in doc 2 (its first
    # corpus occurrence) — doc 8's pasted copy is removed globally
    assert out["license_kept_in"] == [2]
    # the relaxed Gopher screen keeps the whole demo corpus (audit trail)
    assert out["gopher_kept"] == [1, 2, 3, 4, 5, 6, 8, 9]
    # boilerplate lines stripped AND markup cleaned
    assert out["cleaned_sample"] == "The quick brown fox jumps over the lazy dog"
    # doc 3 (near-dup of 1) removed; everything else survives dedup
    assert out["after_dedup"] == [1, 2, 4, 5, 6, 8, 9]
    # doc 4 embedded the eval item -> decontaminated
    assert out["after_decontaminate"] == [1, 2, 5, 6, 8, 9]
    # embedding-level pass: deterministic hash vectors of the surviving docs
    # sit far from the eval item (cos distance >> 0.2), so nothing else drops
    assert out["after_embedding_decontaminate"] == [1, 2, 5, 6, 8, 9]
    # mixture report: shares sum to 1, under-represented siteB upweights
    shares = [v[1] for v in out["mixture"].values()]
    assert abs(sum(shares) - 1.0) < 1e-6
    assert out["mixture"]["siteB"][2] > 1 > out["mixture"]["siteA"][2]
    assert set(out["resampled_rows"]) == {"siteA", "siteB"}
    # quota keeps a deterministic subset; vocab report is (token, count) rows
    assert set(out["quota_kept"]) <= {1, 2, 5, 6, 8, 9}
    assert out["vocab_top3"][0] == ("the", 4)
    # every surviving train doc packed exactly once, positions start at 1
    ids = [p[0] for p in out["packed"]]
    assert len(ids) == len(set(ids)) and set(ids) <= {1, 2, 5, 6, 8, 9}
    assert all(p[3] >= 1 for p in out["packed"])
    # materialized sequences cover the same docs, in assignment order, and
    # the concatenated text is real data (non-empty, whitespace-joined)
    seq_ids = [i for s in out["sequences"] for i in s[2]]
    assert sorted(seq_ids) == sorted(ids)
    assert all(s[4].strip() and s[3] > 0 for s in out["sequences"])
    # the shard export bins the same train docs into >=1 token-balanced file
    assert out["n_shards"] >= 1
    # r8 stages: health gauge fitted over the real vocab; blocklist anti-join
    # removed exactly the one present blocked id; the search spot-check
    # returns ranked snippets with real hit windows
    n_terms, slope = out["zipf"]
    assert n_terms >= 10 and slope < 0  # frequency decreases with rank
    # blocklist {5, 999}: doc 5 present -> removed; 999 absent -> no effect
    assert out["after_blocklist"] == len(out["after_embedding_decontaminate"]) - 1
    # spot-check: doc 1 matches "quick", doc 2 matches "shuffles" — both
    # snippets carry >=1 hit inside a real text window
    assert sorted(d for d, _, _ in out["spot_check"]) == [1, 2]
    assert all(h >= 1 for _, h, _ in out["spot_check"])
    assert all(s.split() for _, _, s in out["spot_check"])
    # lexical release gate: the stripped boilerplate header is the biggest
    # lexical loser of the whole pipeline run
    vd = out["vocab_drift"]
    assert vd["SUBSCRIBE"] < 0 and vd["SUBSCRIBE"] == min(vd.values())
    # 7c temperature smoothing: shares sum to 1, low-resource siteB
    # up-weights but less aggressively than the static 50/50 target
    t = out["temperature"]
    assert abs(t["siteA"][0] + t["siteB"][0] - 1.0) < 1e-6
    assert t["siteB"][1] > 1 > t["siteA"][1]
    assert t["siteB"][1] < out["mixture"]["siteB"][2]
    # 7d/7e DSIR selection + divergence: 3 docs picked from the survivors,
    # and the two sources measurably diverge (but are far from disjoint)
    assert len(out["dsir_picked"]) == 3
    assert set(out["dsir_picked"]) <= set(out["after_semantic_dedup"])
    assert 0 < out["divergence_js"] < 0.693
    # 11b sketch dashboard: HLL within its error bound of the real distinct
    # count isn't assertable on 6 docs — pin determinism + sane ranges
    sk = out["sketches"]
    assert sk["hll_est"] > 0 and sk["sample_p50_tokens"] >= 1
    assert len(sk["reservoir_ids"]) == 2
    assert set(sk["reservoir_ids"]) <= set(out["after_semantic_dedup"])


import pytest


@pytest.fixture(scope="module")
def ingest_out(spark):
    """One shared run of examples/incremental_ingest.main — four tests assert
    on disjoint sections of its output; re-running the whole example per test
    tripled the file's wall-clock for no extra coverage."""
    from incremental_ingest import main

    return main()

def test_incremental_ingest_example(ingest_out):
    out = ingest_out
    assert out["batch1"] == {"accepted": [1, 2, 3], "dropped": {}}
    # batch 2: 10 duplicates corpus doc 1 (estimate 1.0), 12 duplicates
    # in-batch doc 11, 13 is a near-dup of corpus doc 2 at estimate 0.97
    assert out["batch2"]["accepted"] == [11]
    d = out["batch2"]["dropped"]
    assert d[10].startswith("corpus:1@1.00")
    assert d[12].startswith("batch:11@1.00")
    assert d[13].startswith("corpus:2@0.97")
    # the store holds every accepted signature across batches
    assert out["store_size"] == 4


def test_incremental_ingest_semantic_section(ingest_out):
    out = ingest_out
    assert out["vec_batch1"]["accepted"] == [1, 3]
    assert list(out["vec_batch1"]["dropped"]) == [2]          # in-batch near-dup
    assert out["vec_batch1"]["dropped"][2].startswith("batch:1@")
    assert out["vec_batch2"]["accepted"] == [11]
    assert out["vec_batch2"]["dropped"][10].startswith("corpus:1@")  # store match


def test_incremental_ingest_refresh_section(ingest_out):
    out = ingest_out
    # the drifted epoch fires the monitor and triggers the refresh
    assert out["drift"] > 0.5
    assert out["refreshed_nlist"] == 3
    assert out["refreshed_epochs"] == [-1]  # consolidated refresh partition


def test_incremental_ingest_index_store_section(ingest_out):
    out = ingest_out
    # BM25 store: both 'spark' docs (one per ingested batch) outrank the rest
    assert len(out["bm25_top"]) == 3
    assert set(out["bm25_top"][:2]) == {2, 13}
    # IVF store: query ~ X[2] → the base-epoch vectors clustered around
    # X[0]/X[1] plus the drifted X[3]*5 epoch — nearest must come from the
    # store and be 3 distinct ids
    assert len(out["ivf_top"]) == 3 and len(set(out["ivf_top"])) == 3
    # HNSW store + compaction policy (r10): the epoch pile collapses to one
    # shard set when the trigger fires, and the compacted store serves the
    # same neighbors the IVF store found for the same query
    assert out["hnsw_pre_compact"]["epochs"] == 2
    assert out["hnsw_compacted"] is True
    assert out["hnsw_post_compact"] == {
        "epochs": 1, "total_shards": 2, "rows": 12,
    }
    assert out["hnsw_top"] == out["ivf_top"]
