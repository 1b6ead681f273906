"""Crash-window state machine of the shared directory-publish protocol
(sources/publish.py) — pure filesystem, no Spark. Every reachable crash
state must heal to either the new or the old directory, never neither."""

from __future__ import annotations

import os

from komodo_data_spark.sources.publish import (
    READY_MARKER,
    backup_path,
    prepare_staging,
    publish_staged,
    recover_publish,
    staging_path,
)


def _mkdir_with(path: str, name: str, body: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        fh.write(body)


def _content(path: str, name: str) -> str:
    with open(os.path.join(path, name)) as fh:
        return fh.read()


def test_happy_path_publish(tmp_path):
    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v1")
    staging = prepare_staging(live)
    _mkdir_with(staging, "data", "v2")
    publish_staged(live)
    assert _content(live, "data") == "v2"
    assert not os.path.exists(staging)
    assert not os.path.exists(backup_path(live))
    assert not os.path.exists(os.path.join(live, READY_MARKER))


def test_first_publish_with_no_prior_dir(tmp_path):
    live = str(tmp_path / "t")
    staging = prepare_staging(live)
    _mkdir_with(staging, "data", "v1")
    publish_staged(live)
    assert _content(live, "data") == "v1"


def test_recover_rolls_forward_ready_staging(tmp_path):
    # crash after `path` was renamed away: READY staging, no live dir
    live = str(tmp_path / "t")
    _mkdir_with(backup_path(live), "data", "v1")
    _mkdir_with(staging_path(live), "data", "v2")
    open(os.path.join(staging_path(live), READY_MARKER), "w").close()
    recover_publish(live)
    assert _content(live, "data") == "v2"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))


def test_recover_rolls_back_unready_staging(tmp_path):
    # crash mid-write: un-ready staging, live dir renamed to backup is
    # impossible (rename happens after marking), so the un-ready case has
    # the live dir either intact or only the backup left by a PRIOR run
    live = str(tmp_path / "t")
    _mkdir_with(backup_path(live), "data", "v1")
    _mkdir_with(staging_path(live), "data", "partial")
    recover_publish(live)
    assert _content(live, "data") == "v1"
    assert not os.path.exists(staging_path(live))


def test_recover_drops_leftovers_beside_live_dir(tmp_path):
    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v2")
    _mkdir_with(staging_path(live), "data", "junk")
    _mkdir_with(backup_path(live), "data", "v1")
    open(os.path.join(live, READY_MARKER), "w").close()  # crashed pre-remove
    recover_publish(live)
    assert _content(live, "data") == "v2"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))
    assert not os.path.exists(os.path.join(live, READY_MARKER))


def test_keep_backup_survives_recovery_and_next_publish_replaces_it(tmp_path):
    from komodo_data_spark.sources.publish import rollback_path

    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v1")
    staging = prepare_staging(live)
    _mkdir_with(staging, "data", "v2")
    publish_staged(live, keep_backup=True)
    assert _content(rollback_path(live), "data") == "v1"  # rollback copy
    # recovery (run by the next prepare) must NOT reclaim the kept copy
    prepare_staging(live)
    assert _content(rollback_path(live), "data") == "v1"
    # only the next keep_backup publish replaces it
    staging = prepare_staging(live)
    _mkdir_with(staging, "data", "v3")
    publish_staged(live, keep_backup=True)
    assert _content(rollback_path(live), "data") == "v2"
    assert _content(live, "data") == "v3"
