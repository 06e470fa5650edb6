"""Fold a fresh BENCH_DETAIL.json into BASELINE.md's per-query minima
table (min(old, new) per query; new queries appended), anchored on the
LAST "| query | sec |" occurrence (rindex — the file has earlier tables
with the same separator; a first-match anchor once deleted the narrative
sections between them, r11 commit a0220a5).

Usage: python tools/fold_baseline.py [--dry-run]
Prints per-query over-2x flags of the fresh run vs the PRE-fold minima
(the driver's gate), then rewrites the table.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dry = "--dry-run" in sys.argv
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        fresh = json.load(f)["queries"]
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()

    anchor = text.rindex("| query | sec |")
    head, table_block = text[:anchor], text[anchor:]
    old: dict[str, float] = {}
    tail_lines = []
    for line in table_block.splitlines():
        m = re.match(r"\|\s*(\S+)\s*\|\s*([0-9.]+)\s*\|", line)
        if m:
            old[m.group(1)] = float(m.group(2))
        elif line.strip() and not line.startswith("|"):
            tail_lines.append(line)

    flags = {
        q: (s, old[q], round(s / old[q], 2))
        for q, s in fresh.items()
        if q in old and s > 2.0 * old[q]
    }
    print(f"fresh run: {len(fresh)} queries, {sum(fresh.values()):.1f}s total")
    print(f"over-2x-of-fold flags: {len(flags)}")
    for q, (s, o, r) in sorted(flags.items(), key=lambda kv: -kv[1][2]):
        print(f"  {q}: {s:.2f}s vs fold {o:.2f}s = {r}x")

    folded = dict(old)
    for q, s in fresh.items():
        folded[q] = min(folded.get(q, s), s)
    rows = "\n".join(
        f"| {q} | {folded[q]:.2f} |" for q in sorted(folded)
    )
    new_table = "| query | sec |\n|---|---|\n" + rows + "\n"
    if tail_lines:
        new_table += "\n" + "\n".join(tail_lines) + "\n"
    if dry:
        print("(dry run, BASELINE.md untouched)")
        return
    with open(path, "w") as f:
        f.write(head + new_table)
    print(f"folded table: {len(folded)} queries, {sum(folded.values()):.1f}s")


if __name__ == "__main__":
    main()
