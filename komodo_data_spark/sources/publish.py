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
   (Spark ignores underscore files), renames ``path`` → backup, staging →
   ``path``, removes the marker, deletes backup;
3. ``recover_publish`` (call before reusing a path) heals every crash
   window: a READY staging with ``path`` missing is finished forward, an
   un-ready staging is discarded, a leftover backup with ``path`` missing
   is rolled back, a leftover backup beside a live ``path`` is dropped.

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
    # if and only if this marker exists
    with open(os.path.join(staging, READY_MARKER), "w") as fh:
        fh.write("")
    if keep_backup:
        displaced = rollback_path(path)
        shutil.rmtree(displaced, ignore_errors=True)
    else:
        displaced = backup
        shutil.rmtree(backup, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, displaced)
    os.rename(staging, path)
    os.remove(os.path.join(path, READY_MARKER))
    if not keep_backup:
        shutil.rmtree(backup, ignore_errors=True)


def recover_publish(path: str) -> None:
    """Heal any crash window of ``publish_staged``. Safe to call anytime
    the publisher is not running."""
    staging, backup = staging_path(path), backup_path(path)
    ready = os.path.exists(os.path.join(staging, READY_MARKER))
    if not os.path.exists(path):
        if ready:
            # crashed between the renames with a complete staging: finish
            os.rename(staging, path)
            marker = os.path.join(path, READY_MARKER)
            if os.path.exists(marker):
                os.remove(marker)
        elif os.path.isdir(backup):
            # incomplete staging: roll back to the pre-publish directory
            os.rename(backup, path)
    # leftovers beside a live path: an un-ready staging is an incomplete
    # write, a backup is a crashed final delete — both safe to drop
    if os.path.exists(path):
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)
        if os.path.isdir(backup):
            shutil.rmtree(backup, ignore_errors=True)
        marker = os.path.join(path, READY_MARKER)
        if os.path.exists(marker):
            # crashed between the final rename and the marker removal
            os.remove(marker)
