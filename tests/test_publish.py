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


def test_recover_finishes_ready_staging_beside_live(tmp_path):
    # crash after the marker write but BEFORE the live dir was displaced:
    # the publish is committed (staging complete + audited), so recovery
    # must finish it forward, not silently roll it back (review finding)
    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v1")
    _mkdir_with(staging_path(live), "data", "v2")
    with open(os.path.join(staging_path(live), READY_MARKER), "w") as fh:
        fh.write("drop")
    recover_publish(live)
    assert _content(live, "data") == "v2"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))
    assert not os.path.exists(os.path.join(live, READY_MARKER))


def test_recover_finishes_keep_backup_publish_beside_live(tmp_path):
    # same window for a keep_backup publish: the marker records the
    # intent, so recovery parks the displaced live dir at the rollback
    # path exactly as the uninterrupted publish would have
    from komodo_data_spark.sources.publish import rollback_path

    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v1")
    _mkdir_with(staging_path(live), "data", "v2")
    with open(os.path.join(staging_path(live), READY_MARKER), "w") as fh:
        fh.write("keep")
    recover_publish(live)
    assert _content(live, "data") == "v2"
    assert _content(rollback_path(live), "data") == "v1"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))


def test_recover_empty_marker_defaults_to_keep(tmp_path):
    # pre-intent marker versions wrote an EMPTY marker for both publish
    # modes; recovery must default to keep — parking the displaced live
    # copy at rollback_path is always safe, while defaulting to drop
    # would delete a keep_backup publish's rollback copy (review finding)
    from komodo_data_spark.sources.publish import rollback_path

    live = str(tmp_path / "t")
    _mkdir_with(live, "data", "v1")
    _mkdir_with(staging_path(live), "data", "v2")
    open(os.path.join(staging_path(live), READY_MARKER), "w").close()
    recover_publish(live)
    assert _content(live, "data") == "v2"
    assert _content(rollback_path(live), "data") == "v1"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))


def test_recover_heals_legacy_protocol_leftovers(tmp_path):
    # pre-unification crashes (.__merging__/.__premerge__ and
    # .__compacting__/.__precompact__) had no READY marker: restore the
    # displaced original when the live path is missing, drop leftovers
    from komodo_data_spark.sources.publish import LEGACY_SUFFIX_PAIRS

    for stg_sfx, bak_sfx in LEGACY_SUFFIX_PAIRS:
        # stranded: live renamed away, staged work incomplete by definition
        live = str(tmp_path / f"strand{stg_sfx}")
        _mkdir_with(live + bak_sfx, "data", "v1")
        _mkdir_with(live + stg_sfx, "data", "staged")
        recover_publish(live)
        assert _content(live, "data") == "v1"
        assert not os.path.exists(live + stg_sfx)
        assert not os.path.exists(live + bak_sfx)
        # leftovers beside a live dir are dropped
        live2 = str(tmp_path / f"left{stg_sfx}")
        _mkdir_with(live2, "data", "v2")
        _mkdir_with(live2 + stg_sfx, "data", "junk")
        _mkdir_with(live2 + bak_sfx, "data", "old")
        recover_publish(live2)
        assert _content(live2, "data") == "v2"
        assert not os.path.exists(live2 + stg_sfx)
        assert not os.path.exists(live2 + bak_sfx)


class _FsCrash:
    """Counts the publish module's destructive filesystem ops and raises
    once ``crash_at`` of them have succeeded (None = never)."""

    def __init__(self):
        self.calls = 0
        self.crash_at: int | None = None

    def gate(self):
        if self.crash_at is not None and self.calls >= self.crash_at:
            raise RuntimeError(f"injected crash after op {self.crash_at}")
        self.calls += 1


class _FsProxy:
    """Stands in for the ``os``/``shutil`` module attribute inside
    sources/publish.py, crashing the named destructive ops via the shared
    counter; everything else (os.path, getters) passes through."""

    def __init__(self, real, names, state: _FsCrash):
        self._real, self._names, self._state = real, names, state

    def __getattr__(self, name):
        attr = getattr(self._real, name)
        if name in self._names:
            def wrapped(*a, **k):
                self._state.gate()
                return attr(*a, **k)
            return wrapped
        return attr


def _patched_publish(state: _FsCrash):
    """Install the crashing proxies on the publish module; returns the
    restore thunk."""
    import os as os_mod
    import shutil as shutil_mod

    from komodo_data_spark.sources import publish as pub

    orig = (pub.os, pub.shutil)
    pub.os = _FsProxy(os_mod, {"rename", "remove"}, state)
    pub.shutil = _FsProxy(shutil_mod, {"rmtree", "move"}, state)

    def restore():
        pub.os, pub.shutil = orig

    return restore


def _fresh_state(tmp_path, n: int, keep_backup: bool) -> str:
    live = str(tmp_path / f"fuzz{int(keep_backup)}_{n}")
    _mkdir_with(live, "data", "v1")
    staging = prepare_staging(live)
    _mkdir_with(staging, "data", "v2")
    return live


def _assert_converged(live: str, keep_backup: bool) -> None:
    from komodo_data_spark.sources.publish import rollback_path

    assert _content(live, "data") == "v2"
    assert not os.path.exists(staging_path(live))
    assert not os.path.exists(backup_path(live))
    assert not os.path.exists(os.path.join(live, READY_MARKER))
    if keep_backup:
        assert _content(rollback_path(live), "data") == "v1"


def _recover_then_retry(live: str, keep_backup: bool) -> None:
    """The real operational contract: after a crash, recover; if the crash
    hit BEFORE the commit point (no READY marker landed — e.g. during the
    marker's own atomic rename), recovery correctly preserves the OLD
    table and the caller simply retries the publish. Either way the end
    state must be the fully-published v2 with no leftovers."""
    recover_publish(live)
    if _content(live, "data") == "v1":
        assert not os.path.exists(os.path.join(live, READY_MARKER))
        staging = prepare_staging(live)
        _mkdir_with(staging, "data", "v2")
        publish_staged(live, keep_backup=keep_backup)
    _assert_converged(live, keep_backup)


def test_publish_crash_fuzz_every_fs_op(tmp_path):
    """Kill publish_staged after EVERY destructive filesystem op (for all
    N), then recover: the table must always converge to the published v2
    with no leftovers and no data loss — for both publish modes."""
    for keep_backup in (False, True):
        # count the ops of an uncrashed run (patch AFTER staging setup so
        # the count covers exactly the ops the crashed runs will see)
        live = _fresh_state(tmp_path, 999 + int(keep_backup), keep_backup)
        state = _FsCrash()
        restore = _patched_publish(state)
        try:
            publish_staged(live, keep_backup=keep_backup)
        finally:
            restore()
        total = state.calls
        assert total >= 3
        for n in range(total):
            live = _fresh_state(tmp_path, n, keep_backup)
            state = _FsCrash()
            state.crash_at = n
            restore = _patched_publish(state)
            try:
                import pytest

                with pytest.raises(RuntimeError, match="injected crash"):
                    publish_staged(live, keep_backup=keep_backup)
            finally:
                restore()
            _recover_then_retry(live, keep_backup)


def test_publish_double_crash_fuzz(tmp_path):
    """Crash the publish at every op N, then crash the FIRST recovery at
    every op M, then run a clean recovery: still must converge — recovery
    itself is re-entrant at every one of its own filesystem steps."""
    import pytest

    live = _fresh_state(tmp_path, 998, False)
    state = _FsCrash()
    restore = _patched_publish(state)
    try:
        publish_staged(live)
    finally:
        restore()
    total = state.calls
    case = 0
    for n in range(total):
        for m in range(total + 2):
            case += 1
            live = _fresh_state(tmp_path, 1000 + case, False)
            state = _FsCrash()
            state.crash_at = n
            restore = _patched_publish(state)
            try:
                with pytest.raises(RuntimeError, match="injected crash"):
                    publish_staged(live)
            finally:
                restore()
            state = _FsCrash()
            state.crash_at = m
            restore = _patched_publish(state)
            try:
                recover_publish(live)
            except RuntimeError:
                pass
            finally:
                restore()
            _recover_then_retry(live, False)


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


def test_consumer_crash_fuzz_recover_then_retry_converges(spark, tmp_path):
    """Round-4 verdict ask #5: kill the protocol after EVERY destructive
    filesystem op inside ALL THREE consumers (compaction, merge, export
    compaction); a plain retry (which heals via prepare_staging) must
    always converge to the same final table with no data loss."""
    import pytest

    from komodo_data_spark.sources.compaction import compact_data_table
    from komodo_data_spark.sources.merge import merge_snapshot
    from komodo_data_spark.streaming.export_incremental import (
        compact_export,
        export_batch,
    )

    def build_compaction(base):
        path = str(base / "data_table")
        spark.createDataFrame(
            [(s, i, f"m{i}") for s in (1, 2) for i in range(5)],
            "session_id int, seq int, message string",
        ).write.partitionBy("session_id").parquet(path)
        return path

    def run_compaction(path):
        compact_data_table(spark, path)

    exp_compaction = sorted((s, i, f"m{i}") for s in (1, 2) for i in range(5))

    def build_merge(base):
        path = str(base / "target")
        spark.createDataFrame(
            [(i, f"old{i}") for i in range(5)], "k int, v string"
        ).write.parquet(path)
        return path

    updates_rows = [(3, "new3"), (4, "new4"), (9, "new9")]

    def run_merge(path):
        updates = spark.createDataFrame(updates_rows, "k int, v string")
        merge_snapshot(spark, path, updates, "k")

    exp_merge = sorted(
        [(0, "old0"), (1, "old1"), (2, "old2")] + updates_rows
    )

    def build_export(base):
        path = str(base / "export")
        mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
        export_batch(mk([(1, "a"), (2, "b")]), 0, path, n_shards=2)
        export_batch(mk([(3, "c")]), 1, path, n_shards=2)
        return path

    def run_export(path):
        compact_export(spark, path, n_shards=2)

    exp_export = sorted([(1, "a"), (2, "b"), (3, "c")])

    cases = [
        ("compaction", build_compaction, run_compaction, exp_compaction,
         ("session_id", "seq", "message")),
        ("merge", build_merge, run_merge, exp_merge, ("k", "v")),
        ("export", build_export, run_export, exp_export, ("doc_id", "text")),
    ]
    for name, build, run, expected, cols in cases:
        # op count of an uncrashed run (fs ops inside sources/publish only)
        live = build(tmp_path / f"{name}_count")
        state = _FsCrash()
        restore = _patched_publish(state)
        try:
            run(live)
        finally:
            restore()
        total = state.calls
        assert total >= 3, f"{name}: expected >=3 protocol fs ops"
        for n in range(total):
            live = build(tmp_path / f"{name}_{n}")
            state = _FsCrash()
            state.crash_at = n
            restore = _patched_publish(state)
            try:
                with pytest.raises(RuntimeError, match="injected crash"):
                    run(live)
            finally:
                restore()
            run(live)  # retry: prepare_staging heals, operation completes
            got = sorted(
                tuple(r)
                for r in spark.read.parquet(live).select(*cols).collect()
            )
            assert got == expected, f"{name} crash@{n}: {got}"
