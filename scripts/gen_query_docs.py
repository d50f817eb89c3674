"""Generate QUERIES.md — the full registry index (name, oracle status,
driver-window position, note) — so reviewers can audit coverage without
reading registry.py. Re-run after adding queries: python scripts/gen_query_docs.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from uav_streamprocessor_spark import registry  # noqa: E402


def main() -> None:
    specs = registry.all_specs()
    window = set(registry._DRIVER_WINDOW_PRIORITY)
    groups: dict[str, list] = {}
    for i, s in enumerate(specs):
        prefix = s.name.split("_")[0]
        groups.setdefault(prefix, []).append((i, s))
    lines = [
        "# QUERIES — full registry index",
        "",
        f"{len(specs)} registered queries; "
        f"{sum(1 for s in specs if s.oracle)} DuckDB-oracled, "
        f"{sum(1 for s in specs if not s.oracle)} rows-only by design "
        "(sketches / LSH internals / pixel paths / iterative-greedy ops).",
        "",
        "`window` = inside the 50-query driver CORRECTNESS window this "
        "round (position = registration order the driver sees).",
        "",
    ]
    order = ["uav", "tpch", "rel", "ev", "text", "dedup", "emb", "media"]
    titles = {
        "uav": "UAV surface (reference operators + extensions)",
        "tpch": "TPC-H relational depth",
        "rel": "Relational / star-schema analytics",
        "ev": "Event-stream analytics (batch twins of the streaming surface)",
        "text": "Text curation / LLM-data pipeline",
        "dedup": "Deduplication family",
        "emb": "Embedding similarity / ANN / audits",
        "media": "Multimodal (binary columns)",
    }
    for p in order:
        if p not in groups:
            continue
        lines.append(f"## {titles.get(p, p)} ({len(groups[p])})")
        lines.append("")
        lines.append("| # | query | oracle | window | note |")
        lines.append("|---|---|---|---|---|")
        for i, s in groups[p]:
            oracle = "✓" if s.oracle else "rows-only"
            win = str(i + 1) if s.name in window and i < 50 else ""
            note = (s.notes or "").replace("\n", " ").replace("|", "\\|")
            if len(note) > 160:
                note = note[:157] + "..."
            lines.append(f"| {i + 1} | {s.name} | {oracle} | {win} | {note} |")
        lines.append("")
    open("/root/repo/QUERIES.md", "w").write("\n".join(lines))
    print(f"QUERIES.md: {len(specs)} queries")


if __name__ == "__main__":
    main()
