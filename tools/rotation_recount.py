"""Verify-head rotation recount — the round-start discipline as a
committed tool instead of a per-round ad-hoc snippet.

Ground truth is CORRECTNESS_r*.json (max green round per query), NOT
any verdict's narrative arithmetic: the r14 verdict under-counted the
r10 cohort 40 -> 2, and following it would have left 38 queries six
rounds stale (COVERAGE.md round-15 ledger). This prints:

- the latest-green cohort histogram,
- queries registered but never driver-checked (these lead the head,
  in registration order — each carries two-scale local parity proof
  at registration time per the registration-time rule),
- the suggested 50-slot head: never-checked first, then oldest
  cohorts in registration order,
- and a diff against the committed ``_VERIFY_FIRST`` so a drifted
  enumeration is caught before the driver runs.

Usage: PYTHONPATH=. python tools/rotation_recount.py
"""

from __future__ import annotations

import glob
import json
import re

HEAD_CAP = 50


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f).group(1))
        for q, v in json.load(open(f)).items():
            if (
                isinstance(v, dict)
                and v.get("err") is None
                and v.get("rows_match")
                and v.get("hash_match")
                and v.get("schema_match") is not False
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def main() -> None:
    from evidence_images_etl_airflow_spark.workload import (
        REGISTRY,
        _VERIFY_FIRST,
    )

    green = latest_green()
    order = list(REGISTRY)
    hist: dict[int, int] = {}
    for q in order:
        if q in green:
            hist[green[q]] = hist.get(green[q], 0) + 1
    print("latest-green cohorts:", dict(sorted(hist.items())))

    never = [q for q in order if q not in green]
    print(f"never driver-checked ({len(never)}):", never)

    ranked = never + sorted(
        (q for q in order if q in green),
        key=lambda q: (green[q], order.index(q)),
    )
    head = ranked[:HEAD_CAP]
    spill = [q for q in ranked[HEAD_CAP:] if q in green and green[q] == min(
        (green[q] for q in ranked[HEAD_CAP:] if q in green), default=-1
    )]
    print(f"suggested head (cap {HEAD_CAP}): {head}")
    print(f"oldest spilled past the cap: {spill[:5]}")

    committed = list(_VERIFY_FIRST)
    if committed == head:
        print("committed _VERIFY_FIRST MATCHES the recount.")
    else:
        only_committed = [q for q in committed if q not in head]
        only_recount = [q for q in head if q not in committed]
        print("committed _VERIFY_FIRST DIFFERS from the recount:")
        print("  in committed, not in recount head:", only_committed)
        print("  in recount head, not in committed:", only_recount)
        print(
            "  (a difference is not automatically wrong — e.g. a head "
            "committed before new registrations landed — but it must "
            "be explained in the COVERAGE.md ledger)"
        )


if __name__ == "__main__":
    main()
