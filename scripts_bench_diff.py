"""Like-for-like per-query bench diff (PLANS.md "Bench protocol —
comparison base", VERDICT r12 item 4, mechanized r13).

Compares two BENCH_DETAIL-format files and prints the bar-crossers:
queries slower by MORE THAN 1.5x AND MORE THAN 0.3 s absolute (both
bars, matching the protocol — either alone is machine noise at sf0.1's
sub-second floors).  The protocol's core rule is WHAT you may compare:
a driver detail against the PRIOR ROUND's driver detail, or an idle run
against the idle band's runs — never idle-vs-driver, whose +2-10%
systematic offset manufactures phantom regressions.  This script
therefore REQUIRES naming the base kind on both sides and refuses a
mixed comparison unless --allow-mixed is passed (and then stamps the
output as non-protocol).

Usage:
  python scripts_bench_diff.py --base BENCH_DETAIL_r12.json --base-kind driver \
      --cand BENCH_DETAIL.json --cand-kind driver
  (add --json for one machine-readable line)
"""

from __future__ import annotations

import argparse
import json
import sys

RATIO_BAR = 1.5
ABS_BAR_SEC = 0.3


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no 'queries' per-query dict — not a "
                         "BENCH_DETAIL-format file")
    return {k: float(v) for k, v in q.items()}


def diff(base: dict[str, float], cand: dict[str, float]) -> dict:
    shared = sorted(set(base) & set(cand))
    crossers, improvements = [], []
    for name in shared:
        b, c = base[name], cand[name]
        # Guard b == 0 (possible in a hand-edited/truncated detail file):
        # a zero base with any positive candidate is an infinite-ratio
        # crosser, not a ZeroDivisionError (ADVICE r13).
        ratio = c / b if b > 0 else float("inf")
        if ratio > RATIO_BAR and c - b > ABS_BAR_SEC:
            crossers.append(
                {"query": name, "base_sec": round(b, 3),
                 "cand_sec": round(c, 3),
                 "ratio": round(ratio, 2) if b > 0 else "inf"}
            )
        # Inverse double bar, same constants mirrored: a genuine
        # improvement must shrink by BOTH >1.5x and >0.3 s.  The
        # protocol reads this list to verify a claimed optimization
        # actually landed (and that a "flat" round really is flat) with
        # the same noise floor as the regression side.
        elif c < b / RATIO_BAR and b - c > ABS_BAR_SEC:
            improvements.append(
                {"query": name, "base_sec": round(b, 3),
                 "cand_sec": round(c, 3), "ratio": round(ratio, 2)}
            )
    crossers.sort(
        key=lambda r: -(r["ratio"] if isinstance(r["ratio"], float)
                        else float("inf"))
    )
    improvements.sort(key=lambda r: r["ratio"])
    return {
        "n_shared": len(shared),
        "only_in_base": sorted(set(base) - set(cand)),
        "only_in_cand": sorted(set(cand) - set(base)),
        "bar": {"ratio": RATIO_BAR, "abs_sec": ABS_BAR_SEC},
        "bar_crossers": crossers,
        "improvements": improvements,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--base-kind", required=True,
                    choices=["driver", "idle"])
    ap.add_argument("--cand", required=True)
    ap.add_argument("--cand-kind", required=True,
                    choices=["driver", "idle"])
    ap.add_argument("--allow-mixed", action="store_true",
                    help="permit idle-vs-driver (output stamped "
                         "non-protocol; phantom regressions likely)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.base_kind != args.cand_kind and not args.allow_mixed:
        print(
            "REFUSED: idle-vs-driver cross-comparison (the +2-10% "
            "driver-side offset manufactures phantom regressions — see "
            "PLANS.md 'Bench protocol — comparison base').  Compare "
            "like-for-like, or pass --allow-mixed to proceed stamped "
            "non-protocol.",
            file=sys.stderr,
        )
        return 2

    out = diff(_load(args.base), _load(args.cand))
    out["base"] = {"path": args.base, "kind": args.base_kind}
    out["cand"] = {"path": args.cand, "kind": args.cand_kind}
    out["protocol"] = args.base_kind == args.cand_kind

    if args.json:
        print(json.dumps(out))
    else:
        k = "PROTOCOL" if out["protocol"] else "NON-PROTOCOL (mixed kinds)"
        print(f"[{k}] {args.base_kind} {args.base}  ->  "
              f"{args.cand_kind} {args.cand}: {out['n_shared']} shared")
        if out["only_in_base"] or out["only_in_cand"]:
            print(f"  only-in-base: {out['only_in_base']}")
            print(f"  only-in-cand: {out['only_in_cand']}")
        if not out["bar_crossers"]:
            print(f"  zero bar-crossers (> {RATIO_BAR}x AND "
                  f"> {ABS_BAR_SEC} s)")
        for r in out["bar_crossers"]:
            print(f"  {r['query']}: {r['base_sec']} -> {r['cand_sec']} s "
                  f"({r['ratio']}x)")
        for r in out["improvements"]:
            print(f"  improved {r['query']}: {r['base_sec']} -> "
                  f"{r['cand_sec']} s ({r['ratio']}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
