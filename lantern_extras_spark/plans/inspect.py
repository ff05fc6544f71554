"""Physical-plan inspection utilities — the engine's scale guardrails.

At 100 TB the difference between a correct plan and a fast plan is visible in
three places: filters reaching the parquet scan (`PushedFilters`), scans
reading only needed columns (`ReadSchema`), and small-side joins broadcasting
instead of shuffling. These helpers turn those properties into assertions so
regressions fail tests instead of burning cluster hours.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    text: str
    n_exchanges: int
    n_broadcasts: int
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)

    @property
    def n_shuffles(self) -> int:
        """Shuffle exchanges only (broadcast exchanges move small data)."""
        return self.n_exchanges - self.n_broadcasts


def plan_summary(df: DataFrame) -> PlanSummary:
    text = df._jdf.queryExecution().executedPlan().toString()
    return PlanSummary(
        text=text,
        n_exchanges=len(re.findall(r"\bExchange\b|\bBroadcastExchange\b", text)),
        n_broadcasts=text.count("BroadcastExchange"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        partition_filters=re.findall(r"PartitionFilters: \[(.*?)\], ", text),
    )


def assert_filter_pushed(df: DataFrame, fragment: str) -> PlanSummary:
    """Assert that some parquet scan carries a pushed filter containing
    `fragment` (e.g. "l_shipdate" or "EqualTo(c_mktsegment")."""
    s = plan_summary(df)
    if not any(fragment in f for f in s.pushed_filters):
        raise AssertionError(
            f"no pushed filter containing {fragment!r}; pushed={s.pushed_filters}"
        )
    return s


def assert_column_pruned(df: DataFrame, absent_column: str) -> PlanSummary:
    """Assert no scan reads `absent_column` — column pruning reached parquet."""
    s = plan_summary(df)
    for schema in s.read_schemas:
        if absent_column in schema:
            raise AssertionError(
                f"column {absent_column!r} read by a scan; ReadSchema={schema}"
            )
    return s


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> PlanSummary:
    s = plan_summary(df)
    if s.n_broadcasts < at_least:
        raise AssertionError(f"expected ≥{at_least} broadcast joins, found {s.n_broadcasts}")
    return s


def assert_partition_pruned(df: DataFrame, column: str, values: list) -> PlanSummary:
    """Assert some scan carries a PartitionFilter restricting `column` to
    exactly `values` — i.e. the probe becomes storage-level partition pruning
    (the central 100 TB ANN claim: nprobe/nlist of the data is read, not all
    of it). Fails if the filter is missing or mentions any non-probed value."""
    s = plan_summary(df)
    hits = [f for f in s.partition_filters if column in f]
    if not hits:
        raise AssertionError(
            f"no PartitionFilters on {column!r}; partition_filters={s.partition_filters}"
        )
    import re as _re

    for f in hits:
        in_sets = _re.findall(r"IN \(([^)]*)\)", f)
        eqs = _re.findall(rf"{column}#\d+\s*=\s*(-?\w+)", f)
        got = {v.strip() for s_ in in_sets for v in s_.split(",")} | set(eqs)
        if got and got != {str(v) for v in values}:
            raise AssertionError(
                f"PartitionFilter on {column!r} selects {sorted(got)}, expected {sorted(str(v) for v in values)}"
            )
    return s


def count_shuffles(df: DataFrame) -> int:
    return plan_summary(df).n_shuffles


# ---------------------------------------------------------------------------
# Plan linting: turn the 100 TB antipattern checklist into a report
# ---------------------------------------------------------------------------

#: (rule, severity, explanation) — the antipatterns the round verdicts and
#: measured pitfalls keep finding; each is cheap to detect in the plan text.
LINT_RULES = {
    "global-window": (
        "warn",
        "ordered Window with no PARTITION BY moves every input row to ONE "
        "reducer — use TakeOrderedAndProject (orderBy().limit()) or "
        "two-phase partials, or bound the window's input (a sample/limit) "
        "if you know the cardinality the plan cannot show",
    ),
    "global-window-over-limit": (
        "info",
        "ordered partition-less Window, but a limit appears below it — the "
        "rank-after-top-k idiom; verify the window consumes the limited "
        "side, not the raw corpus",
    ),
    "cartesian": (
        "warn",
        "CartesianProduct scales as |L|x|R| with BOTH sides shuffled — "
        "almost never what you want",
    ),
    "broadcast-nested-loop": (
        "info",
        "BroadcastNestedLoopJoin is |L|x|broadcast side| — the standard "
        "1-row scalar-attach (crossJoin of a broadcast aggregate) is fine; "
        "verify the broadcast side is bounded by construction",
    ),
    "single-partition-exchange": (
        "warn",
        "Exchange SinglePartition serializes ROW DATA through one task "
        "(a keyless final aggregate above it is exempt — its input is one "
        "combined partial row per upstream task, bounded by construction)",
    ),
    "global-sort": (
        "info",
        "rangepartitioning global sort without a limit — legitimate for "
        "ordered output, a bottleneck when a top-k was meant",
    ),
    "unpushed-filter-over-scan": (
        "info",
        "a Filter sits directly on a parquet scan with no PushedFilters — "
        "the predicate may not be pushable (UDF/complex expr), or a cast is "
        "blocking pushdown",
    ),
}


def lint_plan(df: DataFrame) -> list[dict]:
    """Scan the executed plan for the known scale antipatterns and return
    findings as [{rule, severity, detail}]. Empty list = nothing flagged.
    The rules encode this repo's measured pitfalls (single-reducer ranking
    windows, accidental cartesians, unpushed predicates) so ops can lint a
    new query the way tests/test_plans.py pins the registry's."""
    s = plan_summary(df)
    lines = s.text.splitlines()
    findings: list[dict] = []

    def add(rule: str, detail: str) -> None:
        sev, why = LINT_RULES[rule]
        findings.append({"rule": rule, "severity": sev,
                         "detail": detail.strip()[:200], "why": why})

    for i, ln in enumerate(lines):
        t = ln.strip().lstrip("+-:* ")
        if t.startswith("Window "):
            # plan format: Window [exprs], [partition cols], [ordering] —
            # three groups = partitioned; two groups = EITHER partitioned
            # with no ordering (second group has no ASC/DESC; fine) OR a
            # GLOBAL ordered window (second group is the ordering; the
            # single-reducer case). Root-first printing means a limit BELOW
            # the window appears later in the text.
            groups = re.findall(r"\[[^\]]*\]", t)
            if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
                rest = "\n".join(lines[i + 1:])
                if re.search(r"TakeOrderedAndProject|GlobalLimit|CollectLimit", rest):
                    add("global-window-over-limit", t)
                else:
                    add("global-window", t)
            elif len(groups) < 2:
                add("global-window", t)
        if "CartesianProduct" in t:
            add("cartesian", t)
        elif "BroadcastNestedLoopJoin" in t:
            add("broadcast-nested-loop", t)
        if "Exchange SinglePartition" in t:
            # a keyless FINAL aggregate directly above consumes one combined
            # partial row per task — bounded; real row data through one
            # task is the case worth flagging
            parent = " ".join(lines[max(0, i - 2):i])
            if not re.search(r"Aggregate\(keys=\[\]", parent):
                add("single-partition-exchange", t)
    if "rangepartitioning" in s.text and "TakeOrderedAndProject" not in s.text:
        if not re.search(r"(GlobalLimit|CollectLimit)", s.text):
            add("global-sort", "rangepartitioning exchange with no limit")
    for i, ln in enumerate(lines):
        if "Scan parquet" in ln and "PushedFilters: []" in ln:
            above = " ".join(lines[max(0, i - 2):i])
            if re.search(r"\bFilter\b", above):
                add("unpushed-filter-over-scan", ln)
    return findings
