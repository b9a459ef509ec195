"""Crash-safe snapshot-swap recovery shared by the foreachBatch sinks.

The cdc/bitmap sinks swap snapshots with ``rename(cur, old); rename(tmp,
cur); rmtree(old); write(marker)``. A crash between the two renames leaves
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
- ``cur`` present: any ``.tmp-*`` / ``.old-*`` leftovers are stale
  (interrupted write, or a crash after the swap but before cleanup) and
  are dropped.
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
        for leftover in glob.glob(os.path.join(target_dir, ".tmp-*")) + glob.glob(
            os.path.join(target_dir, ".old-*")
        ):
            shutil.rmtree(leftover, ignore_errors=True)
