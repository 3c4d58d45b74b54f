"""Physical-plan inspection helpers.

Used in tests and tuning sessions to assert the plans we *designed for*
are the plans Catalyst actually produces: column-pruned parquet scans
(ReadSchema), pushed filters (PushedFilters), whole-stage codegen spans,
and no accidental cartesian products.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> dict:
    """Summarize scan pruning / pushdown / codegen facts from the plan."""
    s = plan_string(df)
    read_schemas = re.findall(r"ReadSchema: (.+)", s)
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", s)
    return {
        "read_schemas": read_schemas,
        "pushed_filters": [p for p in pushed if p],
        # formatted mode prints each node in the tree AND a detail
        # section — count the detail headers only
        "n_exchanges": len(re.findall(r"\(\d+\) Exchange", s)),
        "n_codegen_stages": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", s))),
        "has_cartesian": "CartesianProduct" in s,
        "has_broadcast": "BroadcastHashJoin" in s or "BroadcastNestedLoop" in s,
        "plan": s,
    }


def assert_pushdown(df: DataFrame, max_exchanges: int | None = None,
                    require_pruned_to: list[str] | None = None,
                    forbid_cartesian: bool = True) -> dict:
    """Raise if the physical plan regresses on the properties we rely on."""
    rep = plan_report(df)
    if forbid_cartesian and rep["has_cartesian"]:
        raise AssertionError("plan contains CartesianProduct:\n" + rep["plan"])
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {rep['n_exchanges']} exchanges (max {max_exchanges}):\n"
            + rep["plan"]
        )
    if require_pruned_to:
        joined = " ".join(rep["read_schemas"])
        for col in require_pruned_to:
            if col not in joined:
                raise AssertionError(
                    f"expected column {col} in ReadSchema; got "
                    f"{rep['read_schemas']}"
                )
    return rep
