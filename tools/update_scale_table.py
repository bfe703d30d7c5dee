"""Refresh the measured-rehearsal table in SCALE.md from
SCALE_REHEARSAL.json, preserving each row's data-factor and hand-written
verdict columns.  Run after tools/scale_rehearsal.py."""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    data = json.loads((REPO / "SCALE_REHEARSAL.json").read_text())["queries"]
    path = REPO / "SCALE.md"
    text = path.read_text()

    def repl(m: re.Match) -> str:
        name, factor, shuffle_bold, verdict = (
            m.group(1), m.group(2), m.group(4), m.group(5)
        )
        q = data.get(name)
        if q is None:
            return m.group(0)
        ratio = q["time_ratio"]
        bold = "**" if ratio >= 20 else ""
        sh = q["shuffle_write_mb_big"]
        sh_txt = f"{sh:.1f} MB".replace(".0 MB", " MB")
        if sh == 0:
            sh_txt = "**0 MB**" if "**" in shuffle_bold else "0 MB"
        return (
            f"| {name} | {factor} | {q['sec_1x']:.2f} | {q['sec_big']:.2f} "
            f"| {bold}{ratio}×{bold} | {sh_txt} | {verdict} |"
        )

    row_re = re.compile(
        r"^\| (\w+) \| (\d+×) \| [\d.]+ \| [\d.]+ \| (\*\*)?[\d.]+×(?:\*\*)? "
        r"\| ((?:\*\*)?[\d.]+ MB(?:\*\*)?) \| (.*?) \|$",
        re.M,
    )
    new = row_re.sub(repl, text)
    path.write_text(new)
    n = len(row_re.findall(text))
    print(f"updated {n} table rows in SCALE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
