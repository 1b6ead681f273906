"""Write→audit→publish directory swap, shared and crash-recoverable.

Three surfaces publish a fully-rewritten parquet directory over a live
path: table compaction (``sources/compaction.py``), MERGE
(``sources/merge.py``), and incremental-export compaction
(``streaming/export_incremental.py``). They share ONE protocol here so the
suffix conventions and the crash-window recovery live in a single place
(review finding: three hand-rolled variants, two of which stranded the
table if the process died between the two renames).

Protocol — every step idempotent:

1. caller writes + audits ``staging_path(path)`` completely;
2. ``publish_staged`` drops a ``_publish_ready`` marker into staging
   (Spark ignores underscore files; its content records the keep-backup
   intent so recovery can finish the same publish), renames ``path`` →
   backup (or the kept rollback copy), staging → ``path``, removes the
   marker, deletes backup;
3. ``recover_publish`` (call before reusing a path) heals every crash
   window: a READY staging is always FINISHED FORWARD — including the
   window where the crash hit after the marker write but before the live
   path was displaced (review finding: that state used to be discarded,
   silently rolling back a committed, audited publish) — an un-ready
   staging is discarded, a leftover backup with ``path`` missing is
   rolled back, a leftover backup beside a live ``path`` is dropped.
   Crash leftovers from the pre-unification per-surface protocols
   (``.__merging__``/``.__premerge__``, ``.__compacting__``/
   ``.__precompact__``) are healed conservatively first: those had no
   READY marker, so the displaced original is restored when the live path
   is missing and the interrupted operation's work dirs are dropped (it
   must be re-run).

Local-filesystem rename/delete as throughout the repo; on an object store
swap for the Hadoop FileSystem equivalents (same contract).
"""

from __future__ import annotations

import os
import shutil

STAGING_SUFFIX = ".__staging__"
BACKUP_SUFFIX = ".__backup__"
ROLLBACK_SUFFIX = ".__rollback__"
READY_MARKER = "_publish_ready"

#: (staging, backup) suffix pairs of the retired hand-rolled protocols;
#: recover_publish heals their leftovers so a pre-upgrade crash cannot
#: strand a table behind the old names forever.
LEGACY_SUFFIX_PAIRS = (
    (".__merging__", ".__premerge__"),
    (".__compacting__", ".__precompact__"),
)


def staging_path(path: str) -> str:
    return path.rstrip("/") + STAGING_SUFFIX


def backup_path(path: str) -> str:
    return path.rstrip("/") + BACKUP_SUFFIX


def rollback_path(path: str) -> str:
    """Where ``publish_staged(keep_backup=True)`` parks the displaced
    directory. Deliberately NOT one of the recovery suffixes: recovery
    must never reclaim an intentionally kept rollback copy."""
    return path.rstrip("/") + ROLLBACK_SUFFIX


def prepare_staging(path: str) -> str:
    """Heal prior crashes, clear any stale staging dir, and return the
    staging path the caller should write to."""
    recover_publish(path)
    staging = staging_path(path)
    shutil.rmtree(staging, ignore_errors=True)
    return staging


def publish_staged(path: str, keep_backup: bool = False) -> None:
    """Publish a COMPLETELY written staging dir over ``path``. The caller
    must have finished (and audited) its write to ``staging_path(path)``.

    ``keep_backup=True`` leaves the displaced directory at
    ``rollback_path(path)`` for manual rollback (the MERGE contract). The
    rollback suffix is outside the recovery protocol on purpose: a crash
    healed forward by ``recover_publish`` must never delete the kept copy
    (it WOULD delete a ``backup_path`` leftover). Only the next
    ``publish_staged(keep_backup=True)`` on the same path replaces it.
    """
    staging, backup = staging_path(path), backup_path(path)
    if not os.path.isdir(staging):
        raise FileNotFoundError(f"no staging dir at {staging}")
    # mark complete BEFORE the destructive steps: recovery rolls forward
    # if and only if this marker exists; the content records the
    # keep-backup intent so a recovery finishes the SAME publish. The
    # marker appears ATOMICALLY (write a dot-file, fsync, rename into
    # place): a crash mid-write must never leave an empty marker whose
    # blank intent would read as drop-backup and delete a keep_backup
    # publish's rollback copy during recovery.
    tmp_marker = os.path.join(staging, "." + READY_MARKER + ".tmp")
    with open(tmp_marker, "w") as fh:
        fh.write("keep" if keep_backup else "drop")
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp_marker, os.path.join(staging, READY_MARKER))
    _finish_swap(path, staging, backup, keep_backup)


def _finish_swap(
    path: str, staging: str, backup: str, keep_backup: bool
) -> None:
    """The destructive tail of a publish — shared verbatim by the live
    path (``publish_staged``) and crash recovery, so both walk the exact
    same state machine."""
    displaced = rollback_path(path) if keep_backup else backup
    if os.path.exists(path):
        # clear the displaced target ONLY while the live path still needs
        # displacing: on a recovery re-entry after the displacement rename,
        # `displaced` already holds the old live copy — deleting it here
        # would lose the rollback/backup copy the protocol promises
        shutil.rmtree(displaced, ignore_errors=True)
        os.rename(path, displaced)
    os.rename(staging, path)
    os.remove(os.path.join(path, READY_MARKER))
    # a crash between the tmp-marker write and its rename leaves the
    # dot-file behind; it is invisible to Spark but should not ride into
    # the published directory forever
    stale_tmp = os.path.join(path, "." + READY_MARKER + ".tmp")
    if os.path.exists(stale_tmp):
        os.remove(stale_tmp)
    if not keep_backup:
        shutil.rmtree(backup, ignore_errors=True)


def recover_publish(path: str) -> None:
    """Heal any crash window of ``publish_staged`` (and of the retired
    per-surface protocols). Safe to call anytime the publisher is not
    running."""
    _recover_legacy(path)
    staging, backup = staging_path(path), backup_path(path)
    marker = os.path.join(staging, READY_MARKER)
    if os.path.exists(marker):
        # complete, audited staging: FINISH the swap — even when the
        # crash hit before the live path was displaced (path still
        # present). Discarding it here would roll back a committed
        # publish. Empty marker content comes from a pre-intent marker
        # version whose publishes could ALSO be keep_backup — default
        # such markers to KEEP: parking the displaced copy at
        # rollback_path is always safe (a stray rollback dir is cheaper
        # than a deleted one; the next keep_backup publish replaces it),
        # while defaulting to drop would delete a keep_backup publish's
        # rollback copy.
        with open(marker) as fh:
            keep_backup = fh.read().strip() != "drop"
        _finish_swap(path, staging, backup, keep_backup)
    elif not os.path.exists(path) and os.path.isdir(backup):
        # incomplete staging: roll back to the pre-publish directory
        os.rename(backup, path)
    # leftovers beside a live path: an un-ready staging is an incomplete
    # write, a backup is a crashed final delete — both safe to drop
    if os.path.exists(path):
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
        if os.path.isdir(backup):
            shutil.rmtree(backup, ignore_errors=True)
        live_marker = os.path.join(path, READY_MARKER)
        if os.path.exists(live_marker):
            # crashed between the final rename and the marker removal
            os.remove(live_marker)


def _recover_legacy(path: str) -> None:
    """One-time healing of crashes from the pre-unification protocols.
    They had no READY marker, so recovery is conservative: a missing live
    path is restored from the displaced original, then leftover work dirs
    are dropped — the interrupted merge/compaction must simply be re-run
    (its inputs are intact)."""
    base = path.rstrip("/")
    for stg_sfx, bak_sfx in LEGACY_SUFFIX_PAIRS:
        stg, bak = base + stg_sfx, base + bak_sfx
        if not os.path.exists(path) and os.path.isdir(bak):
            os.rename(bak, path)
        if os.path.exists(path):
            shutil.rmtree(stg, ignore_errors=True)
            shutil.rmtree(bak, ignore_errors=True)
