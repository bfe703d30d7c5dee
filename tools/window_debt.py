"""Driver-window ledger debt: which catalog queries have never held a
green row in any CORRECTNESS_r*.json, and which seats they could take.

The correctness driver hash-checks only the FIRST 50 entries of
``catalog.queries()`` (see the rotation policy above ``_DRIVER_PRIORITY``
in queries.py).  This prints, from the committed ledger:

- per-round green counts (sanity),
- the never-green list, split into currently-seated (will close next
  driver run) vs tail (candidates for the next rotation),
- seated entries by consecutive-green streak (long-green seats are the
  rotation's eviction candidates under rule 2).

Usage: python tools/window_debt.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from feature_store_healthcare_spark import queries as catalog  # noqa: E402


def main() -> int:
    green_rounds: dict[str, list[str]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = f.split("_r")[1].split(".")[0]
        with open(f) as fh:
            for q, r in json.load(fh).items():
                ok = (
                    isinstance(r, dict)
                    and r.get("rows_match")
                    and r.get("schema_match")
                    and r.get("hash_match")
                )
                if ok:
                    green_rounds.setdefault(q, []).append(rnd)
    names = list(catalog.queries())
    window, tail = names[:50], names[50:]
    never = [n for n in names if n not in green_rounds]
    print(f"catalog {len(names)} | ever-green {len(green_rounds)} | "
          f"never-green {len(never)}")
    seated_never = [n for n in window if n in never]
    print(f"\nseated, never-green yet ({len(seated_never)} — close next "
          f"driver run):")
    for n in seated_never:
        print(f"  {n}")
    tail_never = [n for n in tail if n in never]
    print(f"\ntail, never-green ({len(tail_never)} — next rotation's "
          f"candidates):")
    for n in tail_never:
        print(f"  {n}")
    print("\nseated by green-round count (rule-2 eviction candidates first):")
    for n in sorted(window, key=lambda n: -len(green_rounds.get(n, []))):
        print(f"  {len(green_rounds.get(n, [])):2d}  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
