"""Training-shard export sink: the pipeline's last mile.

After cleaning / dedup / packing, a training run consumes the corpus as a
fixed set of shards that many data-loader workers read independently. The
export contract here is what that consumer needs:

- **Deterministic shard assignment**: ``shard = pmod(xxhash64(key), n)`` —
  a pure function of the row key, so assignment is stable under reruns,
  retries, input reordering, and incremental appends (a re-export after
  adding documents moves NO existing row between shards). Round-robin or
  ``rand()`` would reshuffle everything on every run.
- **Idempotent writes**: the export is always the COMPLETE shard set, so
  the write is a full overwrite of the target path. (Dynamic partition
  overwrite would be wrong here: it only replaces partitions present in
  the new data, so shrinking ``n_shards`` or an input that empties a shard
  would leave stale shard directories serving duplicate rows.)
- **Audited manifest**: ``_manifest.json`` records per-shard row/token
  counts plus an order-free content fingerprint (bit_xor of per-row
  hashes), computed from the exact frame that was written (the frame is
  localCheckpointed first, so a nondeterministic upstream cannot make the
  manifest disagree with the data — the sources/backfill.py lesson). A
  loader runs ``verify_export`` against the manifest before training; a
  re-export of identical input yields an identical manifest.

The per-row hash feeds every column through a delimited ``concat_ws`` with
an explicit NULL sentinel before hashing — multi-arg ``xxhash64`` skips
NULL arguments entirely, so it would fingerprint ``('x', NULL)`` and
``(NULL, 'x')`` identically and miss value-position corruption.

Scale: one hash projection + one partitioned write + one combinable
aggregate over the checkpointed frame. The manifest JSON is written with
local-file IO; on an object store swap it for the Hadoop FileSystem
create/rename like the other store modules (same contract).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

MANIFEST_NAME = "_manifest.json"

#: Field separator / NULL sentinel for the row fingerprint. Control chars
#: that cannot appear in the fixture data; collisions would need a data
#: column to contain them adjacent to a crafted value, acceptable for an
#: integrity audit (this is not an adversarial MAC).
_FP_SEP = "\x1f"
_FP_NULL = "\x00∅"


def _row_fp(cols: list[str]) -> F.Column:
    """Order-free-aggregatable per-row fingerprint over ``cols`` (in the
    given order), NULL-position-sensitive."""
    return F.xxhash64(
        F.concat_ws(
            _FP_SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_FP_NULL))
                for c in cols
            ],
        )
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    token_col: str | None = None,
) -> dict:
    """Export ``df`` as ``n_shards`` hash-assigned parquet shards under
    ``path`` and return (and persist) the audit manifest.

    ``token_col`` (if given) must be a numeric column; its per-shard sums
    land in the manifest so the training side can budget without a scan.
    """
    if "shard" in df.columns:
        raise ValueError(
            "input frame already has a 'shard' column; rename it — the "
            "export would silently clobber it with the derived assignment"
        )
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    ).localCheckpoint(eager=True)
    try:
        # full overwrite, NOT dynamic partition overwrite — see module doc
        sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
        agg_cols = [
            F.count(F.lit(1)).alias("rows"),
            F.expr("bit_xor(fp_)").alias("fp"),
        ]
        if token_col is not None:
            agg_cols.append(F.sum(token_col).alias("tokens"))
        per_shard = (
            sharded.withColumn("fp_", _row_fp(df.columns))
            .groupBy("shard")
            .agg(*agg_cols)
            .collect()
        )
    finally:
        sharded.unpersist()
    shards = {
        int(r["shard"]): {
            "rows": int(r["rows"]),
            **(
                {"tokens": int(r["tokens"] or 0)}
                if token_col is not None
                else {}
            ),
        }
        for r in per_shard
    }
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "total_rows": sum(s["rows"] for s in shards.values()),
        **(
            {"total_tokens": sum(s["tokens"] for s in shards.values())}
            if token_col is not None
            else {}
        ),
        "fingerprint": format(
            _xor_all(int(r["fp"]) for r in per_shard) & (2**64 - 1), "016x"
        ),
        "shards": {str(k): v for k, v in sorted(shards.items())},
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def _xor_all(values) -> int:
    out = 0
    for v in values:
        out ^= v
    return out


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return json.load(fh)


def verify_export(spark, path: str) -> dict:
    """Re-audit an export against its manifest (what a loader runs before
    training): recount rows per shard and recompute the fingerprint from
    the shard files themselves. Checks BOTH directions — manifest shards
    missing data AND on-disk shards absent from the manifest (stale
    partitions / duplicated task output), so detection never rests on the
    XOR fingerprint alone (which even-multiplicity duplication cancels).
    Returns ``{"ok": bool, "mismatches": [...]}``.
    """
    manifest = read_manifest(path)
    try:
        df = spark.read.parquet(path)
        data_cols = [c for c in df.columns if c != "shard"]
        rows = {
            int(r["shard"]): int(r["rows"])
            for r in df.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        }
        fp_row = (
            df.withColumn("fp_", _row_fp(data_cols))
            .agg(F.expr("bit_xor(fp_)").alias("fp"))
            .collect()[0]
        )
        # bit_xor over zero rows is NULL -> the 0 fingerprint an empty
        # export writes
        fp = format(int(fp_row["fp"] or 0) & (2**64 - 1), "016x")
    except AnalysisException:
        # a 0-row export writes no parquet files at all; that IS the empty
        # dataset the manifest describes
        rows, fp = {}, format(0, "016x")
    mismatches = []
    for shard, meta in manifest["shards"].items():
        if rows.get(int(shard), 0) != meta["rows"]:
            mismatches.append(
                f"shard {shard}: manifest {meta['rows']} rows, "
                f"data {rows.get(int(shard), 0)}"
            )
    for shard in sorted(set(rows) - {int(s) for s in manifest["shards"]}):
        mismatches.append(
            f"shard {shard}: {rows[shard]} rows on disk, absent from manifest"
        )
    if fp != manifest["fingerprint"]:
        mismatches.append(
            f"fingerprint: manifest {manifest['fingerprint']}, data {fp}"
        )
    return {"ok": not mismatches, "mismatches": mismatches}
