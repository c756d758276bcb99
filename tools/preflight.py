"""Pre-snapshot gate (VERDICT r06 item 3): run the full test suite,
the bench sweep, and the physical-plan audit, and REFUSE (exit 1) if
any of them fails — the checks that would have caught round 6's red
suite and crashed bench before the snapshot.

Usage: PYTHONPATH=. python tools/preflight.py [--no-audit]

- pytest tests/ -q           -> must exit 0
- bench.py                   -> must exit 0 AND print a parseable JSON
                                line with a numeric headline total
                                (SPARK_GRAFT_SF_DIR honored; defaults
                                to sf0.01 here for speed — the point
                                is "bench completes", not the number)
- tools/explain_audit.py     -> must exit 0 with zero flagged queries
                                (skippable with --no-audit when only
                                docs/tests changed)

Each stage streams its output; the gate prints a PASS/FAIL line per
stage and a final verdict. Record the run in the snapshot commit
message.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None) -> tuple[bool, str]:
    print(f"== preflight: {name}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        cmd,
        cwd=REPO,
        env={**os.environ, **(env or {})},
        capture_output=True,
        text=True,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    print(tail, flush=True)
    return proc.returncode == 0, proc.stdout


def main() -> int:
    no_audit = "--no-audit" in sys.argv[1:]
    results: list[tuple[str, bool, str]] = []

    ok, _ = run("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    results.append(("pytest", ok, "" if ok else "suite not green"))

    bench_env = {
        "SPARK_GRAFT_SF_DIR": os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        ),
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "8"),
    }
    ok, out = run("bench", [sys.executable, "bench.py"], bench_env)
    detail = ""
    if ok:
        parsed = None
        for line in out.splitlines():
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except json.JSONDecodeError:
                    continue
        if not (parsed and isinstance(parsed.get("value"), (int, float))):
            ok, detail = False, "bench exited 0 but printed no parseable JSON"
    else:
        detail = "bench crashed (the BENCH_r06 failure mode)"
    results.append(("bench", ok, detail))

    if no_audit:
        print("== preflight: explain_audit SKIPPED (--no-audit)", flush=True)
    else:
        ok, out = run(
            "explain_audit",
            [sys.executable, "tools/explain_audit.py"],
            {"PYTHONPATH": REPO},
        )
        detail = ""
        if ok:
            m = re.search(r"flagged: (.*)\)", out)
            if not m or m.group(1) != "none":
                ok = False
                detail = f"plan audit flagged: {m.group(1) if m else 'unparseable'}"
        results.append(("explain_audit", ok, detail))

    print("\n== preflight summary")
    failed = False
    for name, ok, detail in results:
        print(f"  {name}: {'PASS' if ok else 'FAIL'}{' — ' + detail if detail else ''}")
        failed |= not ok
    print(f"preflight: {'REFUSE — do not snapshot' if failed else 'OK to snapshot'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
