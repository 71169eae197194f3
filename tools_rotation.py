"""Regenerate ROTATION.md: cumulative driver-correctness coverage ledger.

The driver hashes only the first 50 registry slots per round
(CORRECTNESS_r{N}.json), so the window rotates (registry.DRIVER_ANCHORS /
DRIVER_ROTATION) until every oracle-backed query has produced at least one
driver row. This tool reads every CORRECTNESS_r*.json plus the current
window and writes the ledger the next rotation is planned from.

Usage::

    python tools_rotation.py          # rewrites ROTATION.md
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohlc_spark_streaming_spark.registry import (  # noqa: E402
    DRIVER_ANCHORS,
    DRIVER_ROTATION,
    ORACLES,
    QUERIES,
)

REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    rounds: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        with open(path) as f:
            rounds[tag] = set(json.load(f))

    checked = set().union(*rounds.values()) if rounds else set()
    window = [*DRIVER_ANCHORS, *DRIVER_ROTATION]
    after_this = checked | set(window)
    oracle_backed = [n for n in QUERIES if n in ORACLES]
    remaining = [n for n in oracle_backed if n not in after_this]
    no_oracle = [n for n in QUERIES if n not in ORACLES]

    lines = [
        "# ROTATION — driver correctness-window ledger",
        "",
        "The per-round correctness gate hashes only the FIRST 50 registry",
        "slots, so the window rotates until every oracle-backed query has at",
        f"least one driver-verified CORRECTNESS row. {len(DRIVER_ANCHORS)} anchor slot(s)",
        f"persist every round; {len(DRIVER_ROTATION)} slots rotate over names without a",
        "green driver row. Regenerate with",
        "`python tools_rotation.py` after editing `registry.DRIVER_ROTATION`.",
        "",
        f"- registered queries: **{len(QUERIES)}**"
        f" ({len(oracle_backed)} oracle-backed, {len(no_oracle)} rows-only)",
        f"- driver-checked so far (r1-r{len(rounds)}): **{len(checked & set(QUERIES))}**",
        f"- current window adds: **{len(set(window) - checked)}** first-time names",
        f"- cumulative after this round: **{len(after_this & set(oracle_backed) | (after_this & set(no_oracle)))}"
        f" / {len(QUERIES)}**",
        f"- still unchecked after this round: **{len(remaining) + len([n for n in no_oracle if n not in after_this])}**"
        " (next rotation)",
        "",
        "## Current window (50)",
        "",
        f"### Anchors ({len(DRIVER_ANCHORS)}, permanent)",
        "",
    ]
    lines += [f"- `{n}`" for n in DRIVER_ANCHORS]
    lines += ["", f"### Rotation ({len(DRIVER_ROTATION)}, this round)", ""]
    lines += [f"- `{n}`" for n in DRIVER_ROTATION]
    lines += ["", "## Remaining for future rotations", ""]
    if remaining:
        lines += [f"- `{n}`" for n in remaining]
    else:
        lines += ["(none — every oracle-backed query has a driver row)"]
    unchecked_no_oracle = [n for n in no_oracle if n not in checked]
    if unchecked_no_oracle:
        lines += ["", "Rows-only (no oracle; weaker driver check):", ""]
        lines += [f"- `{n}`" for n in unchecked_no_oracle]
    lines += [
        "",
        "## Per-round window history",
        "",
        "| round | names checked | first-time names |",
        "|---|---|---|",
    ]
    seen: set[str] = set()
    for tag, names in rounds.items():
        fresh = names - seen
        lines.append(f"| {tag} | {len(names)} | {len(fresh)} |")
        seen |= names
    lines.append("")

    with open(os.path.join(REPO, "ROTATION.md"), "w") as f:
        f.write("\n".join(lines))
    print(
        f"ROTATION.md: {len(checked & set(QUERIES))} checked, "
        f"{len(set(window) - checked)} new this round, "
        f"{len(remaining)} oracle-backed remaining"
    )


if __name__ == "__main__":
    main()
