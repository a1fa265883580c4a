"""One-shot generator for the consolidated rotation ledger (VERDICT r6
'Next round #3'): reads the CURRENT registry constants plus every
driver CORRECTNESS artifact and prints the single
``(name, era, windows)`` table that replaces the six parallel list
constants (WINDOW_R2..R7 / POST_ROTATION_R3..R7 / rep pools).

Run once, paste the output into registry.py, keep for audit: the table
it emits is provably consistent with history because every value is
derived from the artifacts themselves.

Usage: python tools/gen_ledger.py > /root/repo/.scratch/ledger.py
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from pokertracker_cassandra_st_spark import registry as R

    R._load_all()

    # driver rounds per name, from the artifacts (ground truth)
    windows: dict[str, list[int]] = {n: [] for n in R.REGISTRY}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r[0-9]*.json"))):
        rnd = int(f.rsplit("r0", 1)[1].split(".")[0])
        for n in json.load(open(f)):
            windows[n].append(rnd)
    # round 7 is staged, not yet run: mark the active window
    for n in R.WINDOW:
        if 7 not in windows[n]:
            windows[n].append(7)

    # era per name: the round whose POST_ROTATION ledger it joined;
    # era 1 = the rounds-1/2 cohort predating the ledger system
    era: dict[str, int] = {n: 1 for n in R.REGISTRY}
    for e, names in [
        (3, R.POST_ROTATION_R3),
        (4, R.POST_ROTATION_R4),
        (5, R.POST_ROTATION_R5),
        (6, R.POST_ROTATION_R6),
        (7, R.POST_ROTATION_R7),
    ]:
        for n in names:
            era[n] = e

    # ledger order: era groups ascending; era 1 in REGISTRY import
    # order, era >= 3 in its POST_ROTATION list order (that order is
    # contract: it defines each next window's lead block)
    ordered: list[str] = [n for n in R.REGISTRY if era[n] == 1]
    for _e, names in [
        (3, R.POST_ROTATION_R3),
        (4, R.POST_ROTATION_R4),
        (5, R.POST_ROTATION_R5),
        (6, R.POST_ROTATION_R6),
        (7, R.POST_ROTATION_R7),
    ]:
        ordered.extend(names)
    assert sorted(ordered) == sorted(R.REGISTRY), "ledger order lost names"

    print("_LEDGER: tuple[tuple[str, int, tuple[int, ...]], ...] = (")
    for n in ordered:
        w = ", ".join(str(x) for x in sorted(windows[n]))
        if w and "," not in w:
            w += ","
        print(f'    ("{n}", {era[n]}, ({w})),')
    print(")")

    # cross-check: derived windows reproduce the historical constants
    def derived(r: int) -> tuple[list[str], list[str]]:
        lead = [
            n for n in ordered
            if r in windows[n] and not any(x < r for x in windows[n])
        ]
        reps = [
            n for n in ordered
            if r in windows[n] and any(x < r for x in windows[n])
        ]
        return lead, reps

    for r, const in [(4, R.WINDOW_R4), (5, R.WINDOW_R5), (6, R.WINDOW_R6), (7, R.WINDOW_R7)]:
        lead, reps = derived(r)
        assert set(lead + reps) == set(const), f"round {r} membership drift"
        assert len(lead + reps) == 50, f"round {r} size {len(lead + reps)}"
    lead6, reps6 = derived(6)
    assert lead6 == list(R.POST_ROTATION_R5), "r6 lead order drift"
    lead7, _ = derived(7)
    assert lead7 == list(R.POST_ROTATION_R6), "r7 lead order drift"
    print("# cross-checks passed", file=sys.stderr)


if __name__ == "__main__":
    main()
