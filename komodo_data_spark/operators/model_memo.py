"""Session-scoped memo for expensive deterministic model fits.

Round-10 verdict #1/#5: the batched-BPE trainer was refit from scratch
by each of its four registry consumers (~44 s of a ~330 s bench re-
deriving one identical model) and the IVFPQ index twice. A real
pipeline trains ONCE and applies everywhere — cross-session via the
published parquet stores (``text_bpe_publish`` /
``publish_ivfpq_model`` + ``require_store``), and within a session via
this memo: the first consumer fits and eager-localCheckpoints the
model frames, later consumers reuse the materialized blocks.

Why this is sound: every memoized fit is DETERMINISTIC in
(sf_dir, geometry) — same corpus, same rounds/topc/k — so a memo hit
is frame-identical to a refit (pinned per family in tests). Why
localCheckpoint and not cache(): checkpointed blocks need no
re-computation lineage and are released by the ContextCleaner when the
memo entry is dropped; keyed by applicationId so a new session can
never read a dead session's blocks, and stale keys from previous
sessions are evicted on first touch.
"""

from __future__ import annotations

import os
from typing import Any, Callable

from pyspark.sql import SparkSession

_MEMO: dict[tuple, Any] = {}


def _dir_fingerprint(path: str) -> tuple:
    """(name, size, mtime_ns) of every data file under ``path`` (one level
    of table-directory nesting). 'Deterministic in sf_dir' really means
    deterministic in the sf_dir's FILES: a caller that overwrites a table
    in place (the hand-computed tests do exactly that) must miss the memo,
    not read the previous corpus's model. O(file count) driver-side stat
    calls — a few entries per scale dir, never data-sized."""
    out = []
    try:
        with os.scandir(path) as it:
            for e in sorted(it, key=lambda e: e.name):
                if e.name.startswith("."):
                    continue
                if e.is_dir(follow_symlinks=False):
                    with os.scandir(e.path) as sub:
                        for s in sorted(sub, key=lambda s: s.name):
                            if s.name.startswith("."):
                                continue
                            st = s.stat(follow_symlinks=False)
                            out.append(
                                (e.name + "/" + s.name, st.st_size, st.st_mtime_ns)
                            )
                else:
                    st = e.stat(follow_symlinks=False)
                    out.append((e.name, st.st_size, st.st_mtime_ns))
    except OSError:
        pass
    return tuple(out)


def session_model(
    spark: SparkSession, family: str, params: tuple, fit: Callable[[], Any]
) -> Any:
    """Return ``fit()``'s result memoized for this Spark application.

    ``fit`` must return frames that are already materialized
    (localCheckpointed) — the memo stores and returns them as-is. Keys
    from other applications (dead sessions) are evicted eagerly so the
    dict cannot grow across test-suite session restarts. Directory
    params are keyed by their file fingerprint, not just their path, so
    rewriting a table in place can never serve a stale model."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _MEMO if k[0] != app]:
        del _MEMO[k]
    key = (app, family) + tuple(
        (os.path.abspath(p), _dir_fingerprint(os.path.abspath(p)))
        if isinstance(p, str) and os.path.isdir(p)
        else p
        for p in params
    )
    if key not in _MEMO:
        # drop superseded fits of the same family over the same paths
        # (rewritten dir => new fingerprint) so their checkpointed blocks
        # are GC-released instead of accumulating; DIFFERENT paths (e.g.
        # the warm-up sf and the bench sf) still coexist
        paths = tuple(p[0] for p in key[2:] if isinstance(p, tuple))
        for k in [
            k
            for k in _MEMO
            if k[:2] == key[:2]
            and tuple(p[0] for p in k[2:] if isinstance(p, tuple)) == paths
        ]:
            del _MEMO[k]
        _MEMO[key] = fit()
    return _MEMO[key]
