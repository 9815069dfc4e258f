"""Compare two bench artifacts with host-load normalization.

Two consecutive rounds produced driver BENCH artifacts 1.4-2.1× their
clean-host values on byte-identical headline plans (adjudicated as host
contamination by A/B/A re-runs in VERDICT r8/r9). bench.py now embeds a
fixed-cost calibration probe; this tool makes the adjudication
mechanical: given two BENCH_r*.json files it prints raw and
load-normalized totals and per-query deltas, and flags which differences
survive normalization.

Usage:
    python tools/bench_compare.py BENCH_r09.json BENCH_r10.json

Normalization: value / load_factor where load_factor =
median(calibration reps) / CALIBRATION_CLEAN_SEC (carried inside the
artifact). Artifacts from before the calibration field (r1-r9) get
load_factor None and are compared raw with a warning — their inflation
can only be argued from an A/B/A, not from the artifact itself.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's own JSON line or the driver's
    BENCH_r{N}.json wrapper ({n, rc, sf, tail, parsed})."""
    with open(path) as f:
        d = json.load(f)
    if "value" not in d:
        p = d.get("parsed")
        if p is None:
            sys.exit(
                f"{path}: driver artifact with parsed=None — the bench "
                "line exceeded the driver's 2000-char tail window "
                "(r7-r9 artifacts). Re-run bench.py (r10+ lines fit) or "
                "adjudicate from an A/B/A."
            )
        d = p
    cal = d.get("calibration_sec") or {}
    d["_lf"] = cal.get("load_factor")
    return d


def norm(v: float, lf: float | None) -> float:
    return v / lf if lf else v


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    for tag, d in (("A", a), ("B", b)):
        lf = d["_lf"]
        note = f"load_factor {lf}" if lf else "NO CALIBRATION (pre-r10)"
        print(
            f"{tag}: uncached {d['value']:.2f}s  cached "
            f"{d['value_cached']:.2f}s  [{note}]"
        )
    na, nb = norm(a["value"], a["_lf"]), norm(b["value"], b["_lf"])
    print(
        f"normalized uncached: A {na:.2f}s  B {nb:.2f}s  "
        f"(B/A = {nb / na:.3f})"
    )
    print()
    print(f"{'query':32s} {'A':>8s} {'B':>8s} {'raw':>7s} {'norm':>7s}")
    rows = []
    for q in a["queries"]:
        if q not in b["queries"]:
            continue
        va, vb = a["queries"][q], b["queries"][q]
        raw = vb / va if va else float("inf")
        normed = norm(vb, b["_lf"]) / norm(va, a["_lf"]) if va else raw
        rows.append((normed, q, va, vb, raw))
    for normed, q, va, vb, raw in sorted(rows, reverse=True):
        flag = "  <-- real" if normed > 1.3 else ""
        print(f"{q:32s} {va:8.3f} {vb:8.3f} {raw:6.2f}x {normed:6.2f}x{flag}")
    worst = [q for normed, q, *_ in rows if normed > 1.3]
    print()
    if worst:
        print(f"{len(worst)} quer{'y' if len(worst) == 1 else 'ies'} "
              f"slower by >1.3x AFTER normalization: {worst}")
    else:
        print("no per-query regression survives load normalization")


if __name__ == "__main__":
    main()
