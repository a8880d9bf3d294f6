"""Suggest _CHANGED_THIS_ROUND entries by diffing query-builder sources.

Writes .query_source_hashes.json (name -> sha256 of the undecorated
builder's source + its oracle SQL + its module file's hash) and, when a
previous snapshot exists, prints three lists:

- CHANGED: builder source or oracle text moved — these queries MUST go
  into plans/__init__._CHANGED_THIS_ROUND next round.
- MODULE-TOUCHED: the defining module changed but this builder didn't —
  shared helpers may have moved; review before deciding.
- NEW: no previous hash.

This is a SUGGESTION tool, not the decision: an implementation can change
through a helper in another module without any of these hashes moving.
Run it at the END of a round (snapshot the baseline) and at the START of
the next (read the diff).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_etl_demo_spark.plans import all_specs  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   ".query_source_hashes.json")


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def main() -> None:
    specs = all_specs()
    module_hash: dict[str, str] = {}
    cur: dict[str, dict] = {}
    for name, spec in specs.items():
        if spec.src_fn is None:
            continue
        mod = sys.modules[spec.src_fn.__module__]
        mfile = mod.__file__
        if mfile not in module_hash:
            with open(mfile) as f:
                module_hash[mfile] = _sha(f.read())
        cur[name] = {
            "fn": _sha(inspect.getsource(spec.src_fn)),
            "oracle": _sha(spec.oracle or ""),
            "module": module_hash[mfile],
        }

    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)

    if prev:
        changed = sorted(
            n for n in cur
            if n in prev
            and (cur[n]["fn"] != prev[n]["fn"]
                 or cur[n]["oracle"] != prev[n]["oracle"])
        )
        touched = sorted(
            n for n in cur
            if n in prev
            and cur[n]["module"] != prev[n]["module"]
            and n not in changed
        )
        new = sorted(n for n in cur if n not in prev)
        print("CHANGED (add to _CHANGED_THIS_ROUND):", changed)
        print("MODULE-TOUCHED (review shared helpers):", len(touched),
              "queries across",
              len({cur[n]["module"] for n in touched}), "modules")
        print("NEW:", new)
    else:
        print("no previous snapshot — writing baseline")

    with open(OUT, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
    print(f"snapshot: {len(cur)} builders -> {OUT}")


if __name__ == "__main__":
    main()
