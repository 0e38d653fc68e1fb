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

Refresh + prune (`--prune`): runs the dryrun COLD into a fresh temp dir — the
entries it writes are by construction exactly the live set for the current
code — then makes `.xla_cache` hold that set and nothing else. Superseded
`jit_train_step-*`/`jit_init-*` generations (VERDICT r4 weak #4: each stale
refresh grew git history by 4-50 MB of dead binary) are deleted in the same
operation, so the refresh commit is always minimal:

    python tools/check_dryrun_cache.py --prune
    git add -A .xla_cache && git commit -m 'refresh dryrun xla cache'

Run this AFTER the last commit that touches any code the train step traces,
then run the gate (no flag) to confirm it passes warm.
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".xla_cache")


def entries(path: str = CACHE) -> set:
    if not os.path.isdir(path):
        return set()
    return set(os.listdir(path))


def check() -> int:
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
        print("\nThe code changed since the cache was refreshed. Run with "
              "--prune to rebuild the cache to exactly the live set, commit, "
              "then re-run the gate to confirm.")
        return 1
    print(f"cache OK: dryrun warm in {dt:.1f}s, no new entries")
    return 0


def prune() -> int:
    """In-place cold rebuild: quarantine every existing entry, run the dryrun
    exactly as the driver does (same process mode, no env redirection), and
    keep only what that run writes.

    The first version redirected the cache into a temp dir via
    EMOPORTRAITS_XLA_CACHE_DIR — and the train-step program hash in that
    redirected process measurably DIFFERED from a normal run's (r5 finding: the
    gate immediately wrote a fourth jit_train_step twin), leaving dead weight.
    Rebuilding in place with a plain run is hash-identical to the gate by
    construction."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    os.makedirs(CACHE, exist_ok=True)
    quarantine = tempfile.mkdtemp(prefix="xla_cache_old_")
    old = entries()
    for n in old:
        shutil.move(os.path.join(CACHE, n), os.path.join(quarantine, n))
    ok = False
    try:
        t0 = time.time()
        g.dryrun_multichip(8)  # cold in place: writes exactly the live set
        ok = True
        live = entries()
        total = sum(os.path.getsize(os.path.join(CACHE, n)) for n in live)
        print(f"cold dryrun {time.time() - t0:.1f}s -> {len(live)} live "
              f"entries, {total / 1e6:.1f} MB (was {len(old)}). "
              f"Commit .xla_cache, then run the gate to confirm warm.")
        for n in sorted(old - live):
            print(f"  pruned dead entry {n}")
        return 0
    finally:
        if not ok:
            # dryrun failed mid-rebuild: restore the quarantined entries so a
            # crash doesn't destroy the (possibly uncommitted) cache
            for n in entries(quarantine):
                shutil.move(os.path.join(quarantine, n),
                            os.path.join(CACHE, n))
            print("prune aborted: dryrun failed, original cache restored")
        shutil.rmtree(quarantine, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(prune() if "--prune" in sys.argv[1:] else check())
