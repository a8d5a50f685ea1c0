#!/usr/bin/env python
"""One-command test suite runner with crash-retry (VERDICT r4 item 4).

The FULL (``--runslow``) suite cannot run as a single pytest process on
this image: the XLA:CPU compiler SIGSEGVs a long-lived process around the
~290th compile, and individual tier runs occasionally SIGABRT in an early
compile yet pass immediately on rerun (both reproduced round 4; see
CLAUDE.md).  That made "full suite green" a manual two-process protocol
with "on a crash, rerun the tier" instructions.  This runner makes it
mechanical:

* tiers run in SEPARATE pytest processes (fresh XLA:CPU compiler state
  per tier, keeping each tier's compile count under the crash horizon);
* a tier exiting on a signal (SIGSEGV/SIGABRT/SIGBUS/SIGILL — pytest rc
  < 0 from the kernel, or 128+N from a shell) is the KNOWN compiler
  flakiness, not a test failure: the tier is retried up to --retries
  times;
* any ordinary non-zero pytest exit (real test failure, collection
  error, usage error) stops the run immediately and is reported as a
  failure — crashes never mask red tests.

Usage:
  python scripts/run_tests.py            # FULL suite (--runslow), tiered
  python scripts/run_tests.py --fast     # fast suite (slow tests skipped)
  python scripts/run_tests.py --retries 3 -- -x   # extra pytest args after --

Exit code: 0 iff every tier passed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Tier split chosen so each process stays under the XLA:CPU compile-count
#: crash horizon (~290 compiles; the full suite is ~2x that).
TIERS = [
    ("unit+golden", ["tests/unit", "tests/golden"]),
    ("parity+distributed", ["tests/parity", "tests/distributed"]),
]

#: Signal exits = the image's known compiler flakiness (CLAUDE.md):
#: SIGSEGV (11), SIGABRT (6), SIGBUS (7), SIGILL (4).  subprocess reports
#: these as negative returncodes; keep the 128+N shell forms too.
CRASH_SIGNALS = {4, 6, 7, 11}
CRASH_RCS = {-s for s in CRASH_SIGNALS} | {128 + s for s in CRASH_SIGNALS}


def run_tier(name: str, paths: list[str], pytest_args: list[str],
             retries: int) -> bool:
    cmd = [sys.executable, "-m", "pytest", "-q", *pytest_args, *paths]
    for attempt in range(1, retries + 2):
        label = f"[suite] tier {name} (attempt {attempt}/{retries + 1})"
        print(f"{label}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = subprocess.call(cmd, cwd=REPO)
        dt = time.time() - t0
        if rc == 0:
            print(f"{label}: PASSED in {dt:.0f}s", flush=True)
            return True
        if rc in CRASH_RCS:
            print(
                f"{label}: CRASHED rc={rc} after {dt:.0f}s — known XLA:CPU "
                "compile flakiness (CLAUDE.md), retrying the tier",
                flush=True,
            )
            continue
        print(f"{label}: FAILED rc={rc} after {dt:.0f}s (real test failure "
              "— not retrying)", flush=True)
        return False
    print(f"[suite] tier {name}: still crashing after {retries + 1} "
          "attempts — giving up", flush=True)
    return False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--fast", action="store_true",
                    help="skip slow-marked tests (omit --runslow)")
    ap.add_argument("--retries", type=int, default=2,
                    help="max retries per tier on a compiler crash")
    ap.add_argument("rest", nargs="*",
                    help="extra pytest args (put them after --)")
    args = ap.parse_args(argv)

    pytest_args = list(args.rest)
    if not args.fast:
        pytest_args.insert(0, "--runslow")

    t0 = time.time()
    results = {}
    for name, paths in TIERS:
        results[name] = run_tier(name, paths, pytest_args, args.retries)
        if not results[name]:
            break
    dt = time.time() - t0
    print(f"\n[suite] {'FULL' if not args.fast else 'FAST'} run "
          f"finished in {dt / 60:.1f} min:")
    ok = True
    for name, _ in TIERS:
        state = results.get(name)
        print(f"  {name}: "
              + ("PASS" if state else "FAIL" if state is False else "SKIPPED"))
        ok = ok and bool(state)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
