#!/usr/bin/env python3
"""Regenerate COVERAGE.md §2.B's in-window query lists from the code
(VERDICT r11 #8): DRIVER_WINDOW is the single source of truth for window
membership and _all_goldens() for oracle coverage — the doc lists were
hand-maintained and drifted (r11 listed rotated-out rows as in-window).
Run after every rotation; tests/test_oracle_parity.py diffs doc vs code
so a stale COVERAGE.md fails loudly."""
from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BEGIN = ("<!-- BEGIN GENERATED: window lists (tools/gen_coverage_lists.py; "
         "guarded by tests/test_oracle_parity.py::"
         "test_coverage_window_lists_match_code) -->")
END = "<!-- END GENERATED -->"


def _wrap(words: list[str], width: int = 72) -> str:
    lines, cur = [], ""
    for w in words:
        if cur and len(cur) + 1 + len(w) > width:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}".strip()
    if cur:
        lines.append(cur)
    return "\n".join(lines)


def generated_block() -> str:
    import __spark_entry__ as m

    window = list(m.DRIVER_WINDOW)
    oracled = [k for k in window if k in m.oracle_sql()]
    rows_only = [k for k in window if k not in m.oracle_sql()]
    return (
        f"{BEGIN}\n"
        f"oracle ({len(oracled)}, all inside the current driver window):\n"
        f"{_wrap(oracled)}\n\n"
        "rows-only inside the window (non-SQL-expressible; unit-tested\n"
        "instead):\n"
        f"{_wrap(rows_only)}\n"
        f"{END}\n"
    )


def main(check: bool = False) -> int:
    path = REPO / "COVERAGE.md"
    text = path.read_text()
    pat = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END) + r"\n",
                     re.S)
    if not pat.search(text):
        print("COVERAGE.md: generation markers not found", file=sys.stderr)
        return 2
    new = pat.sub(generated_block().replace("\\", r"\\"), text)
    if check:
        if new != text:
            print("COVERAGE.md window lists are STALE — run "
                  "tools/gen_coverage_lists.py", file=sys.stderr)
            return 1
        print("COVERAGE.md window lists match the code")
        return 0
    path.write_text(new)
    print("COVERAGE.md window lists regenerated")
    return 0


if __name__ == "__main__":
    sys.exit(main(check="--check" in sys.argv[1:]))
