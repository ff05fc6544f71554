"""The examples/quickstart.py workflow is a living e2e test: collection ->
job -> backfill -> search -> incremental -> dedup -> PQ -> autotune."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_quickstart_workflow(spark, tmp_path):
    from quickstart import main

    out = main(str(tmp_path / "qs"))
    assert out["inserted"] == 6
    assert out["job_status"] == "enabled"
    assert out["embedded"] == 6
    assert out["search_top"] == "Weather is nice today"  # exact-text query hits
    assert out["after_incremental"] == 7
    assert out["after_dedup"] == 6  # the exact duplicate removed
    assert len(out["pq_codes"]) == 4
    assert out["autotune_recall"] is not None
    assert out["index_search_top"] == "Weather is nice today"
