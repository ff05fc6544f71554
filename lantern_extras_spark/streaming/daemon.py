"""Daemon orchestrator — the reference daemon's job-routing semantics on top of
the JobStore + streaming/batch runners (SURVEY.md §2.11).

The reference daemon LISTENs for job notifications, routes by label, streams
each job, and reconciles unfinished jobs on startup. Here:

- D1 job CDC      → `run_once()` scans the job table (poll model; on a
                    lakehouse deployment, a Delta CDF stream on the job table)
- D8 label routing → a daemon only claims jobs whose label matches its own
                    (daemon/embedding_jobs.rs:702-706)
- D4/D11 init + reconciliation → queued or interrupted (started, unfinished,
                    not failed/canceled) jobs are (re)run via run_backfill
- D7 cancel       → canceled jobs are skipped / their streams stopped
- D6 retry        → failed jobs are retried up to `max_retries` with the job's
                    failure reason preserved in between

`run_once` is synchronous and returns what it did — deterministic to test;
`run_forever` wraps it in a poll loop (10 s default, the reference's drain
cadence)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.jobs.runner import run_backfill
from lantern_extras_spark.jobs.spec import JobStore, job_status_col


@dataclass
class DaemonReport:
    ran: list[int] = field(default_factory=list)
    skipped_label: list[int] = field(default_factory=list)
    skipped_canceled: list[int] = field(default_factory=list)
    failed: list[int] = field(default_factory=list)


class EmbeddingDaemon:
    def __init__(
        self,
        store: JobStore,
        sources: dict[str, DataFrame],
        label: str | None = None,
        max_retries: int = 1,
    ):
        """`sources` maps job.table_name → source DataFrame (the reference
        resolves table names against the target DB; we resolve against the
        caller-provided catalog)."""
        self.store = store
        self.sources = sources
        self.label = label
        self.max_retries = max_retries
        self.results: dict[int, DataFrame] = {}
        self._retries: dict[int, int] = {}

    def _claimable(self) -> list:
        jobs = self.store.jobs().withColumn("status", job_status_col()).collect()
        out = []
        for j in jobs:
            if j["status"] in ("queued", "in_progress"):
                out.append(j)
            elif j["status"] == "failed" and self._retries.get(j["id"], 0) < self.max_retries:
                out.append(j)
        return out

    def run_once(self) -> DaemonReport:
        rep = DaemonReport()
        for job in self._claimable():
            jid = job["id"]
            # D8: label routing — daemon label must equal job label
            if (job["label"] or None) != self.label:
                rep.skipped_label.append(jid)
                continue
            if job["canceled_at"] is not None:
                rep.skipped_canceled.append(jid)
                continue
            src = self.sources.get(job["table_name"])
            if src is None:
                self.store.mark_failed(jid, f"unknown table {job['table_name']!r}")
                rep.failed.append(jid)
                continue
            if job["status"] == "failed":
                self._retries[jid] = self._retries.get(jid, 0) + 1
            try:
                merged = run_backfill(self.store, jid, src)
                if merged is not None:
                    self.results[jid] = merged
                    rep.ran.append(jid)
                else:
                    rep.skipped_canceled.append(jid)
            except Exception:  # noqa: BLE001 — failure already recorded on the job row
                rep.failed.append(jid)
        return rep

    def run_forever(self, poll_seconds: int = 10, max_cycles: int | None = None) -> None:
        """Poll loop at the reference's 10 s drain cadence (D3)."""
        cycles = 0
        while max_cycles is None or cycles < max_cycles:
            self.run_once()
            cycles += 1
            if max_cycles is None or cycles < max_cycles:
                time.sleep(poll_seconds)


class MultiCatalogDaemon:
    """D10 multi-DB fan-out: one daemon process spanning several catalogs, one
    job loop per catalog — the reference spawns one embedding-job loop per
    target database URI (daemon/mod.rs:225-353). Each catalog keeps its own
    JobStore, source map, and label routing; a cycle drains every catalog.

    On a real cluster each catalog maps to a metastore/Delta catalog; failures
    in one catalog's jobs never block another's (per-job try in run_once)."""

    def __init__(self, catalogs: dict[str, EmbeddingDaemon]):
        self.catalogs = dict(catalogs)

    def run_once(self) -> dict[str, DaemonReport]:
        return {name: d.run_once() for name, d in self.catalogs.items()}

    def run_forever(self, poll_seconds: int = 10, max_cycles: int | None = None) -> None:
        cycles = 0
        while max_cycles is None or cycles < max_cycles:
            self.run_once()
            cycles += 1
            if max_cycles is None or cycles < max_cycles:
                time.sleep(poll_seconds)
