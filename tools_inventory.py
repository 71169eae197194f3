"""Regenerate QUERIES.md: the full registry inventory, one line per query.

Run: ``python tools_inventory.py`` (writes QUERIES.md at the repo root).
No Spark session needed — this only introspects the registry.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohlc_spark_streaming_spark.registry import ORACLES, QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.abspath(__file__))


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text if text.endswith(".") else text + "."


def main() -> None:
    by_module: dict[str, list[str]] = defaultdict(list)
    for name, fn in QUERIES.items():
        code = fn.__code__
        rel = os.path.relpath(code.co_filename, ROOT)
        mod = rel.removeprefix("ohlc_spark_streaming_spark/queries/")
        oracle = "oracle" if name in ORACLES else "rows-only"
        summary = first_sentence(fn.__doc__)
        by_module[mod].append(
            f"| `{name}` | {oracle} | `{rel}:{code.co_firstlineno}` | {summary} |"
        )
    lines = [
        "# QUERIES — full registry inventory",
        "",
        f"{len(QUERIES)} registered queries "
        f"({sum(1 for n in QUERIES if n in ORACLES)} DuckDB-oracle-backed). "
        "Regenerate with `python tools_inventory.py`. Each row: registry "
        "name, correctness contract, implementation site, one-line summary "
        "(from the query docstring). The driver rotation ledger is "
        "`ROTATION.md`; plan notes are `PLANS.md`.",
        "",
    ]
    for mod in sorted(by_module):
        lines.append(f"## {mod}")
        lines.append("")
        lines.append("| query | check | where | what |")
        lines.append("|---|---|---|---|")
        lines.extend(sorted(by_module[mod]))
        lines.append("")
    with open(os.path.join(ROOT, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"QUERIES.md: {len(QUERIES)} queries across {len(by_module)} modules")


if __name__ == "__main__":
    main()
