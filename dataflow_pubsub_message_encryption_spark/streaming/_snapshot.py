"""Crash-safe snapshot-swap protocol shared by the foreachBatch sinks.

The cdc/bitmap/cms sinks fold each micro-batch into a parquet snapshot and
swap it live via :func:`swap_in`; :func:`recover_snapshot` runs before every
merge and repairs any half-completed swap. The at-least-once replay rule is
"skip iff ``batch_id <= marker``", so the marker journal must move in
lock-step with the snapshot: a state where the snapshot contains batch b but
the marker does not say so lets the replayed batch fold in twice
(double-count for the non-idempotent cdc/cms SUM merges).

Steady state (a prior snapshot exists) — ``write(tmp); rename(cur, old);
rename(tmp, cur); journal(marker); rmtree(old)``:

- The marker is journaled BEFORE ``old`` is dropped, because once ``old``
  is gone the state is indistinguishable from 'batch never ran' and a
  pre-marker crash would let the replay double-apply.
- A crash between the two renames leaves no live snapshot; recovery
  restores the newest ``.tmp-{b}`` — provably a COMPLETE post-merge
  snapshot, because ``rename(cur, old)`` only runs after the tmp write
  finished (witnessed by ``.old-{b}`` existing) — and journals the marker
  to b (the merge fully happened; only the swap tail was lost).

First batch (no prior snapshot, so no ``old`` witness exists) —
``write(tmp); journal(marker); rename(tmp, cur)``:

- The marker is journaled BEFORE ``rename(tmp, cur)``. With the
  steady-state order a crash between the rename and the marker write
  would leave ``cur`` present with no marker and no leftovers — nothing
  for recovery to act on, and the replayed batch would re-merge into a
  snapshot that already contains it (the round-6 ADVICE catch,
  reproduced as '+b0+b0' by the bootstrap crash drill). With the marker
  first, a crash in between leaves ``cur`` missing, ``.tmp-{b}``
  complete, marker == b — which recovery restores and the replay skips.
- The marker is only journaled AFTER the tmp parquet write completed, so
  marker == b is itself the completeness proof for ``.tmp-{b}``.

Recovery rules (run before each merge):

- ``cur`` missing, a ``.tmp-{b}`` exists, and its completeness is proven
  (``.old-{b}`` exists — steady state — or marker == b — first batch):
  journal the marker to b FIRST, then restore ``tmp`` as ``cur``. The
  marker-first order makes recovery itself re-runnable: a crash between
  the two steps recreates exactly the 'marker == b proves tmp complete'
  state (the round-6 ADVICE low catch — rename-then-journal would
  recreate the marker-less hole needing a second crash).
- ``cur`` missing, ``.tmp-{b}`` present but UNPROVEN (first-batch crash
  mid-parquet-write: ``cur`` never existed, marker never written): the
  tmp may be a torn write — drop it; the replayed batch redoes the merge
  from empty state, which is exactly-once for batch b.
- ``cur`` missing, only ``.old-{b}`` dirs: restore the newest ``old``
  (pre-merge snapshot; marker untouched, so the replayed batch re-merges
  exactly once). Unreachable in the current rename order — kept as a
  defensive fallback.
- ``cur`` present WITH a ``.old-{b}`` leftover: the swap for batch b
  COMPLETED (old is only created by ``rename(cur, old)`` and survives
  only if the crash hit after ``rename(tmp, cur)`` but before cleanup +
  marker write), so the marker is journaled forward to b BEFORE the
  leftover is dropped.
- ``cur`` present with only ``.tmp-*`` leftovers: the crash hit before
  the swap started; the merge never landed, the marker is correct, and
  the stale tmp is simply dropped (the replay redoes the merge).

Marker writes go through :func:`_journal` (write-aside + ``os.replace``)
so a torn marker file can never be observed.
"""

from __future__ import annotations

import glob
import os
import shutil


def _journal(target_dir: str, marker: str, batch_id: int) -> None:
    """Atomically journal ``batch_id`` into the marker file."""
    mpath = os.path.join(target_dir, marker)
    aside = mpath + ".w"
    with open(aside, "w") as fh:
        fh.write(str(batch_id))
    os.replace(aside, mpath)


def marker_value(target_dir: str, marker: str) -> int:
    """The journaled batch id, or -1 if no batch has ever committed."""
    mpath = os.path.join(target_dir, marker)
    if os.path.exists(mpath):
        with open(mpath) as fh:
            return int(fh.read().strip() or -1)
    return -1


def swap_in(target_dir: str, snapshot: str, marker: str, batch_id: int) -> None:
    """Swap the fully-written ``.tmp-{batch_id}`` dir into place as the live
    snapshot and journal the marker, crash-safely (see module docstring for
    the two orderings and why they differ)."""
    cur = os.path.join(target_dir, snapshot)
    tmp = os.path.join(target_dir, f".tmp-{batch_id}")
    if os.path.isdir(cur):
        old = os.path.join(target_dir, f".old-{batch_id}")
        os.rename(cur, old)
        os.rename(tmp, cur)
        # journal BEFORE dropping old: once old is gone the state is
        # indistinguishable from "batch never ran", so a crash in between
        # would let the replay double-apply — with the marker written
        # first, recovery either reads it or re-derives it from the old
        # leftover (exhaustive crash-point drill in tests/test_streaming.py)
        _journal(target_dir, marker, batch_id)
        shutil.rmtree(old, ignore_errors=True)
    else:
        # first batch: no old witness can exist, so the marker goes first —
        # a crash before the rename leaves (cur missing, tmp complete,
        # marker == batch_id), which recovery restores and the replay skips
        _journal(target_dir, marker, batch_id)
        os.rename(tmp, cur)


def recover_snapshot(target_dir: str, snapshot: str, marker: str) -> None:
    cur = os.path.join(target_dir, snapshot)

    # a crash inside _journal can leave the write-aside file; it is never
    # the source of truth, drop it
    aside = os.path.join(target_dir, marker + ".w")
    if os.path.exists(aside):
        os.remove(aside)

    def _by_batch(paths: list[str]) -> list[str]:
        return sorted(paths, key=lambda p: int(p.rsplit("-", 1)[-1]))

    if not os.path.isdir(cur):
        tmps = _by_batch(glob.glob(os.path.join(target_dir, ".tmp-*")))
        olds = _by_batch(glob.glob(os.path.join(target_dir, ".old-*")))
        restored = tmps[-1] if tmps else None
        proven = False
        if restored is not None:
            b = int(restored.rsplit("-", 1)[-1])
            proven = (
                os.path.isdir(os.path.join(target_dir, f".old-{b}"))
                or marker_value(target_dir, marker) == b
            )
        if restored is not None and proven:
            # marker first: recovery stays re-runnable if it crashes
            # between these two steps (marker == b re-proves the tmp)
            _journal(target_dir, marker, b)
            os.rename(restored, cur)
        else:
            if restored is not None:
                # unproven first-batch tmp: possibly a torn parquet write —
                # drop it and let the replay redo the merge from empty
                shutil.rmtree(restored, ignore_errors=True)
            if olds:
                os.rename(olds[-1], cur)
    if os.path.isdir(cur):
        olds = _by_batch(glob.glob(os.path.join(target_dir, ".old-*")))
        if olds:
            done = int(olds[-1].rsplit("-", 1)[-1])
            if done > marker_value(target_dir, marker):
                _journal(target_dir, marker, done)
        for leftover in glob.glob(os.path.join(target_dir, ".tmp-*")) + glob.glob(
            os.path.join(target_dir, ".old-*")
        ):
            shutil.rmtree(leftover, ignore_errors=True)
