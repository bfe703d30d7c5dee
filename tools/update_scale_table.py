"""Refresh the measured-rehearsal table in SCALE.md from
SCALE_REHEARSAL.json, preserving each row's data-factor and hand-written
verdict columns.  Run after tools/scale_rehearsal.py.

Guardrails (so the doc can't silently drift from the JSON):
- measured queries with no matching table row are PRINTED by name — new
  --only/deep entries must be added to the table by hand;
- the ratio bold marker and the 0-MB shuffle bold are derived solely from
  the NEW measured values, never inherited from the old cell;
- the row regex requires balanced ``**`` around the ratio.
"""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    data = json.loads((REPO / "SCALE_REHEARSAL.json").read_text())["queries"]
    path = REPO / "SCALE.md"
    text = path.read_text()
    matched: set[str] = set()

    def repl(m: re.Match) -> str:
        name, factor, verdict = m.group(1), m.group(2), m.group(3)
        q = data.get(name)
        if q is None:
            return m.group(0)
        matched.add(name)
        ratio = q["time_ratio"]
        bold = "**" if ratio >= 20 else ""
        sh = q["shuffle_write_mb_big"]
        if sh == 0:
            sh_txt = "**0 MB**"  # zero shuffle is the headline — always bold
        else:
            sh_txt = f"{sh:.1f} MB".replace(".0 MB", " MB")
        return (
            f"| {name} | {factor} | {q['sec_1x']:.2f} | {q['sec_big']:.2f} "
            f"| {bold}{ratio}×{bold} | {sh_txt} | {verdict} |"
        )

    row_re = re.compile(
        r"^\| (\w+) \| (\d+×) \| [\d.]+ \| [\d.]+ \| (?:\*\*[\d.]+×\*\*|[\d.]+×) "
        r"\| (?:\*\*)?[\d.]+ MB(?:\*\*)? \| (.*?) \|$",
        re.M,
    )
    new = row_re.sub(repl, text)
    path.write_text(new)
    n = len(row_re.findall(text))
    print(f"updated {n} table rows in SCALE.md")
    unmatched = sorted(set(data) - matched)
    if unmatched:
        print(
            f"WARNING: {len(unmatched)} measured entr{'y' if len(unmatched) == 1 else 'ies'} "
            f"with NO table row (add by hand): {', '.join(unmatched)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
