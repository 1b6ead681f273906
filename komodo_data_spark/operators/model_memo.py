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


def session_model(
    spark: SparkSession, family: str, params: tuple, fit: Callable[[], Any]
) -> Any:
    """Return ``fit()``'s result memoized for this Spark application.

    ``fit`` must return frames that are already materialized
    (localCheckpointed) — the memo stores and returns them as-is. Keys
    from other applications (dead sessions) are evicted eagerly so the
    dict cannot grow across test-suite session restarts."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _MEMO if k[0] != app]:
        del _MEMO[k]
    key = (app, family) + tuple(
        os.path.abspath(p) if isinstance(p, str) and os.sep in p else p
        for p in params
    )
    if key not in _MEMO:
        _MEMO[key] = fit()
    return _MEMO[key]
