"""Generate COVERAGE.md: driver-proven vs locally-proven query coverage.

The driver grades only a 50-query window per round, so at 260+ registered
queries the "what has the driver actually hash-proven" set is spread
across CORRECTNESS_r*.json artifacts and the never-graded queue is easy
to misstate by hand (SURVEY claimed "8 queue" when the true count was 14
— VERDICT r6). This script derives the whole table from the artifacts +
the live registry, so the queue is always visible and exact:

- **driver-proven**: every CORRECTNESS_r*.json round in which the query
  graded fully green (rows+schema+hash), newest first.
- **queued**: registered EXACT query with no green driver row yet — in
  or out of the current graded window (in-window ones grade next round).

Usage: python tools/coverage.py           # (re)write COVERAGE.md
       python tools/coverage.py --check   # exit 1 if COVERAGE.md is stale

``--check`` is artifact-aware (VERDICT r7 item 1): COVERAGE.md records
which CORRECTNESS_r*.json rounds it was generated from in an
``<!-- artifacts: ... -->`` marker.  When the on-disk artifact set differs
from the recorded one — i.e. the driver dropped a new round's artifact
AFTER the round closed, which the builder could not have seen — the check
REGENERATES the file in place and passes.  It fails only when the
staleness is builder-controlled (registry/window edits without a regen),
so a driver artifact drop can never redden a closed round again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_rounds() -> list[int]:
    return sorted(
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(f"{REPO}/CORRECTNESS_r*.json")
    )


def _recorded_rounds(text: str) -> list[int] | None:
    m = re.search(r"<!-- artifacts: ([0-9, ]*) -->", text)
    if not m:
        return None
    body = m.group(1).strip()
    return sorted(int(x) for x in body.split(",")) if body else []


def build() -> str:
    from dataflow_pubsub_message_encryption_spark.operators import _WINDOW, registry

    queries, oracles = registry()
    green: dict[str, list[int]] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.setdefault(name, []).append(rnd)

    window = set(_WINDOW)
    lines = [
        "# Query coverage (generated — do not edit)",
        "",
        "Regenerate with `python tools/coverage.py`; `--check` verifies",
        "freshness (tests/test_registry.py runs it) and self-heals when",
        "the only change is a new driver CORRECTNESS artifact.",
        "",
        f"<!-- artifacts: {', '.join(str(r) for r in _artifact_rounds())} -->",
        "",
    ]
    proven = {k: v for k, v in green.items() if k in queries}
    queued = [k for k in queries if k in oracles and k not in green]
    queued_in = [k for k in queued if k in window]
    queued_out = [k for k in queued if k not in window]
    lines += [
        f"- registered queries: **{len(queries)}** "
        f"(EXACT oracles: **{len(oracles)}**)",
        f"- driver-proven (green in ≥1 round): **{len(proven)}**",
        f"- queued, in the current graded window: **{len(queued_in)}**",
        f"- queued, awaiting a window slot: **{len(queued_out)}**",
        "",
        "| query | status | driver rounds (green) |",
        "|---|---|---|",
    ]
    for k in queries:
        if k in green:
            rounds = ", ".join(f"r{r}" for r in sorted(green[k], reverse=True))
            lines.append(f"| `{k}` | driver-proven | {rounds} |")
        elif k in oracles:
            where = "in window" if k in window else "awaiting slot"
            lines.append(f"| `{k}` | queued ({where}) | — |")
        else:
            lines.append(f"| `{k}` | rows-only (no oracle) | — |")
    return "\n".join(lines) + "\n"


def main() -> int:
    out = os.path.join(REPO, "COVERAGE.md")
    text = build()
    if "--check" in sys.argv[1:]:
        current = open(out).read() if os.path.exists(out) else ""
        if current == text:
            print("COVERAGE.md is current")
            return 0
        # Stale. Driver-caused (new artifact round landed after the file
        # was generated) → regenerate in place and pass; builder-caused
        # (registry/window drift with an unchanged artifact set) → fail.
        if _recorded_rounds(current) != _artifact_rounds():
            with open(out, "w") as fh:
                fh.write(text)
            print(
                "COVERAGE.md regenerated: new driver CORRECTNESS artifact "
                "landed after generation (artifact-aware check, passes)"
            )
            return 0
        print("COVERAGE.md is stale — run: python tools/coverage.py")
        return 1
    with open(out, "w") as fh:
        fh.write(text)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
