"""Crash-safe snapshot-swap recovery shared by the foreachBatch sinks.

The cdc/bitmap/cms sinks swap snapshots with ``rename(cur, old);
rename(tmp, cur); write(marker); rmtree(old)`` — the marker is journaled
BEFORE ``old`` is dropped, because once ``old`` is gone the state is
indistinguishable from 'batch never ran' and a pre-marker crash would let
the replay double-apply (caught by the exhaustive crash-point drill in
tests/test_streaming.py). A crash between the two renames leaves
no live snapshot — without recovery the replayed batch reads ``snap=None``
and silently rebuilds state from that single micro-batch, losing all prior
state (ADVICE round 5, high-value latent bug).

Recovery rules (run before each merge):

- ``cur`` missing, a ``.tmp-{b}`` exists: ``tmp`` is always a COMPLETE
  post-merge snapshot by the time ``cur`` is renamed away (the parquet
  write precedes both renames), so restore the newest ``tmp`` AND write the
  marker to its batch id — the merge had fully happened; only the marker
  write was lost. Writing the marker is what keeps NON-idempotent merges
  (cdc's ``sum(n_versions)``) correct: the replayed batch then skips
  instead of folding in twice.
- ``cur`` missing, only ``.old-{b}`` dirs: restore the newest ``old``
  (pre-merge snapshot; marker untouched, so the replayed batch re-merges
  exactly once). Unreachable in the current rename order — kept as a
  defensive fallback.
- ``cur`` present WITH a ``.old-{b}`` leftover: the swap for batch b
  COMPLETED (old is only created by ``rename(cur, old)`` and survives
  only if the crash hit after ``rename(tmp, cur)`` but before cleanup +
  marker write), so the marker is journaled forward to b BEFORE the
  leftover is dropped — otherwise the replayed batch b would re-merge
  into a snapshot that already contains it (double-count for
  non-idempotent merges; the code-review catch on the round-6 fix).
- ``cur`` present with only ``.tmp-*`` leftovers: the crash hit before
  the swap started; the merge never landed, the marker is correct, and
  the stale tmp is simply dropped (the replay redoes the merge).
"""

from __future__ import annotations

import glob
import os
import shutil


def recover_snapshot(target_dir: str, snapshot: str, marker: str) -> None:
    cur = os.path.join(target_dir, snapshot)

    def _by_batch(paths: list[str]) -> list[str]:
        return sorted(paths, key=lambda p: int(p.rsplit("-", 1)[-1]))

    if not os.path.isdir(cur):
        tmps = _by_batch(glob.glob(os.path.join(target_dir, ".tmp-*")))
        olds = _by_batch(glob.glob(os.path.join(target_dir, ".old-*")))
        if tmps:
            restored = tmps[-1]
            os.rename(restored, cur)
            with open(os.path.join(target_dir, marker), "w") as fh:
                fh.write(restored.rsplit("-", 1)[-1])
        elif olds:
            os.rename(olds[-1], cur)
    if os.path.isdir(cur):
        olds = _by_batch(glob.glob(os.path.join(target_dir, ".old-*")))
        if olds:
            done = int(olds[-1].rsplit("-", 1)[-1])
            mpath = os.path.join(target_dir, marker)
            prev = -1
            if os.path.exists(mpath):
                with open(mpath) as fh:
                    prev = int(fh.read().strip() or -1)
            if done > prev:
                with open(mpath, "w") as fh:
                    fh.write(str(done))
        for leftover in glob.glob(os.path.join(target_dir, ".tmp-*")) + glob.glob(
            os.path.join(target_dir, ".old-*")
        ):
            shutil.rmtree(leftover, ignore_errors=True)
