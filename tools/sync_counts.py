"""Rewrite the query/oracle counts in SURVEY.md / README.md /
BENCH/BASELINE.md from the actual ``__spark_entry__`` registry, so the
docs can never drift from the artifact again (a round-2 verdict nit).

Usage: python tools/sync_counts.py   (idempotent; prints what changed)
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402

N_Q = len(entry.queries())
N_O = len(entry.oracle_sql())

SUBS = [
    (
        os.path.join(ROOT, "SURVEY.md"),
        r"\d+ driver queries \(round 3\), \d+ with DuckDB oracle",
        f"{N_Q} driver queries (round 3), {N_O} with DuckDB oracle",
    ),
    (
        os.path.join(ROOT, "README.md"),
        r"driver contract: \d+ queries, \d+ with DuckDB oracle SQL twins",
        f"driver contract: {N_Q} queries, {N_O} with DuckDB oracle SQL twins",
    ),
    (
        os.path.join(ROOT, "BENCH", "BASELINE.md"),
        r"\(round 3: \d+ queries, \d+",
        f"(round 3: {N_Q} queries, {N_O}",
    ),
]


def main() -> int:
    changed = 0
    for path, pat, repl in SUBS:
        src = open(path).read()
        out, n = re.subn(pat, repl, src)
        if n == 0:
            print(f"WARNING: pattern not found in {path}: {pat}")
            continue
        if out != src:
            open(path, "w").write(out)
            print(f"updated {os.path.relpath(path, ROOT)} -> {N_Q}/{N_O}")
            changed += 1
        else:
            print(f"ok      {os.path.relpath(path, ROOT)} already {N_Q}/{N_O}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
