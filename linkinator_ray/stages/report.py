"""Reporters + result aggregations (SURVEY.md §2.1 S8-S11, §2.6 G1-G4).

The reference renders TEXT/JSON/CSV from the in-memory result array
(/root/reference/src/cli.ts:248-341, :443-589); here the results are an
Arrow table — grouping/filters are table ops, rendering is driver-side
(the report is small by construction).
"""

from __future__ import annotations

import csv
import io
import json

import pyarrow as pa
import pyarrow.compute as pc

from linkinator_ray.options import LinkState

VERBOSITY = ("none", "error", "warning", "info", "debug")


def map_url(url: str, static_host: str | None, server_root: str | None) -> str:
    """Display mapping (mapUrl, src/index.ts:1148-1176): strip the
    synthetic corpus-host prefix, re-prefix the local root."""
    if not url or not static_host or not url.startswith(static_host):
        return url
    mapped = url[len(static_host):]
    if server_root:
        mapped = server_root.rstrip("/") + "/" + mapped
    return mapped or "./"


def filter_verbosity(results: pa.Table, verbosity: str = "warning") -> pa.Table:
    """Row filter by verbosity (shouldShowResult, src/cli.ts:647-665 with
    LogLevel DEBUG<INFO<WARNING<ERROR<NONE): OK shows at verbosity<=warning,
    BROKEN at verbosity<=error, SKIPPED at verbosity<=info. So:
    debug/info → all states; warning → OK+BROKEN (SKIPPED hidden);
    error → BROKEN only; none → nothing. failureDetails are retained only
    at debug (src/cli.ts:654-656) — see strip_failure_details."""
    if verbosity in ("debug", "info"):
        return results
    if verbosity == "none":
        return results.slice(0, 0)
    if verbosity == "error":
        return results.filter(pc.equal(results["state"], "BROKEN"))
    # warning (default): OK + BROKEN, hide SKIPPED
    return results.filter(pc.invert(pc.equal(results["state"], "SKIPPED")))


def strip_failure_details(results: pa.Table, verbosity: str = "warning") -> pa.Table:
    """Non-debug verbosity clears failureDetails (src/cli.ts:654-656)."""
    if verbosity == "debug" or "failure_details" not in results.column_names:
        return results
    idx = results.column_names.index("failure_details")
    cleared = pa.array([""] * results.num_rows, type=pa.string())
    return results.set_column(idx, "failure_details", cleared)


def summarize(results: pa.Table) -> dict:
    """Totals (G1, G3): passed, broken count, scanned count."""
    broken = results.filter(pc.equal(results["state"], "BROKEN")).num_rows
    skipped = results.filter(pc.equal(results["state"], "SKIPPED")).num_rows
    return {
        "passed": broken == 0,
        "total": results.num_rows,
        "broken": broken,
        "skipped": skipped,
        "scanned": results.num_rows - skipped,  # state != SKIPPED
    }


def group_by_parent(results: pa.Table) -> dict[str, list[dict]]:
    """G2: the TEXT report's parent grouping (src/cli.ts:466-475)."""
    grouped: dict[str, list[dict]] = {}
    for row in results.to_pylist():
        grouped.setdefault(row["parent"] or "", []).append(row)
    return grouped


def render_text(results: pa.Table, elapsed_s: float = 0.0,
                static_host: str | None = None,
                server_root: str | None = None,
                verbosity: str = "debug") -> str:
    """TEXT reporter (S8): per-parent sections, per-link lines, totals.

    Per-link rows are verbosity-filtered, but the totals line counts the
    FULL result set (the reference computes 'N links scanned / M broken'
    from result.links unfiltered, src/cli.ts:563-588).
    """
    shown = filter_verbosity(results, verbosity)
    lines = []
    state_mark = {"OK": "[ OK ]", "BROKEN": "[FAIL]", "SKIPPED": "[SKIP]"}
    for parent, rows in sorted(group_by_parent(shown).items()):
        lines.append(f"\nScanning {map_url(parent, static_host, server_root) or '(seeds)'}")
        for row in rows:
            status = row["status"] if row["status"] is not None else ""
            lines.append(
                f"  {state_mark.get(row['state'], '[????]')} "
                f"{status:>3} {map_url(row['url'], static_host, server_root)}")
    summary = summarize(results)
    lines.append("")
    lines.append(
        f"{summary['scanned']} links scanned, {summary['skipped']} skipped, "
        f"{summary['broken']} broken in {elapsed_s:.1f}s")
    lines.append("PASSED :)" if summary["passed"] else "FAILED :(")
    return "\n".join(lines)


def render_json(results: pa.Table, passed: bool) -> str:
    """JSON reporter (S9): {passed, links:[...]}."""
    links = [
        {"url": r["url"], "status": r["status"], "state": r["state"],
         "parent": r["parent"] or None,
         "failureDetails": json.loads(r["failure_details"]) if r["failure_details"] else []}
        for r in results.to_pylist()
    ]
    return json.dumps({"passed": passed, "links": links}, indent=2)


def render_csv(results: pa.Table) -> str:
    """CSV reporter (S10): url,status,state,parent,failureDetails."""
    buf = io.StringIO()
    writer = csv.writer(buf)
    writer.writerow(["url", "status", "state", "parent", "failureDetails"])
    for r in results.to_pylist():
        writer.writerow([r["url"], r["status"] if r["status"] is not None else "",
                         r["state"], r["parent"], r["failure_details"]])
    return buf.getvalue()


def write_results_parquet(results: pa.Table, out_dir: str) -> None:
    """Partitioned Parquet sink — the at-scale result output (one file
    per state partition so a rerun can diff broken-only cheaply)."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    for state in ("OK", "BROKEN", "SKIPPED"):
        part = results.filter(pc.equal(results["state"], state))
        pq.write_table(part, os.path.join(out_dir, f"state={state}.parquet"))


def exit_code(results: pa.Table) -> int:
    """S11: exit 1 iff any BROKEN."""
    return 0 if summarize(results)["passed"] else 1
