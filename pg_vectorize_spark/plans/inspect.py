"""Physical-plan introspection — the ".explain and iterate" discipline as code.

Parses ``df.explain("formatted")`` output into a structured report so tests
(and operators) can ASSERT plan properties instead of eyeballing them:

- ``n_exchanges`` — every Exchange is a shuffle; joins/aggs should not add
  more than their keys require;
- ``n_broadcasts`` — small-side joins must broadcast, not shuffle;
- ``has_take_ordered`` — top-k must compile to TakeOrderedAndProject, never
  a global Sort + Limit;
- ``pushed_filters`` / ``read_schemas`` — predicate pushdown and column
  pruning must reach the parquet scans;
- ``wholestage_codegen`` — how much of the plan runs in generated code.

Used by tests/test_plans.py to lock in the plan shapes of the headline
queries (a plan regression fails CI, not just the benchmark).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    n_exchanges: int = 0
    n_broadcasts: int = 0
    n_sorts: int = 0
    has_take_ordered: bool = False
    n_scans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    wholestage_codegen_ids: int = 0

    def summary(self) -> str:
        return (
            f"exchanges={self.n_exchanges} broadcasts={self.n_broadcasts} "
            f"sorts={self.n_sorts} takeOrdered={self.has_take_ordered} "
            f"scans={self.n_scans} codegenSpans={self.wholestage_codegen_ids}"
        )


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> PlanReport:
    text = plan_text(df)
    rep = PlanReport(text=text)
    # count operator occurrences in the numbered-node section
    rep.n_exchanges = len(re.findall(r"(?<!Broadcast)Exchange\b", text))
    rep.n_broadcasts = len(re.findall(r"\bBroadcastExchange\b", text))
    rep.n_sorts = len(re.findall(r"^\s*(?:\+-|:-|\*)?\s*\(?\d*\)?\s*Sort\b", text, re.M)) + len(
        re.findall(r"\bSortExec\b", text)
    )
    rep.has_take_ordered = "TakeOrderedAndProject" in text
    rep.n_scans = len(re.findall(r"Scan parquet", text))
    rep.pushed_filters = re.findall(r"PushedFilters: \[(.*?)\]", text)
    rep.read_schemas = re.findall(r"ReadSchema: (.*)", text)
    rep.wholestage_codegen_ids = len(
        set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    )
    return rep
