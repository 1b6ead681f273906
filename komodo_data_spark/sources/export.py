"""Training-shard export sink: the pipeline's last mile.

After cleaning / dedup / packing, a training run consumes the corpus as a
fixed set of shards that many data-loader workers read independently. The
export contract here is what that consumer needs:

- **Deterministic shard assignment**: ``shard = pmod(xxhash64(key), n)`` —
  a pure function of the row key, so assignment is stable under reruns,
  retries, input reordering, and incremental appends (a re-export after
  adding documents moves NO existing row between shards). Round-robin or
  ``rand()`` would reshuffle everything on every run.
- **Idempotent writes**: shards are parquet partitions written with dynamic
  partition overwrite — re-exporting the same input overwrites in place
  rather than duplicating.
- **Audited manifest**: ``_manifest.json`` records per-shard row/token
  counts plus an order-free content fingerprint (bit_xor of per-row
  xxhash64), computed from the exact frame that was written (the frame is
  localCheckpointed first, so a nondeterministic upstream cannot make the
  manifest disagree with the data — the sources/backfill.py lesson). A
  loader verifies completeness against the manifest before training; a
  re-export of identical input yields an identical manifest.

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

MANIFEST_NAME = "_manifest.json"


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
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    ).localCheckpoint(eager=True)
    (
        sharded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(path)
    )
    agg_cols = [
        F.count(F.lit(1)).alias("rows"),
        # order-free content fingerprint: xor of per-row hashes over every
        # exported column (shard is derived, so hash the original columns)
        F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"`{c}`" for c in df.columns)
            + "))"
        ).alias("fp"),
    ]
    if token_col is not None:
        agg_cols.append(F.sum(token_col).alias("tokens"))
    per_shard = sharded.groupBy("shard").agg(*agg_cols).collect()
    shards = {
        int(r["shard"]): {
            "rows": int(r["rows"]),
            **({"tokens": int(r["tokens"])} if token_col is not None else {}),
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
            # combine per-shard fingerprints order-free as well
            _xor_all(int(r["fp"]) for r in per_shard) & (2**64 - 1),
            "016x",
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
    the shard files themselves. Returns ``{"ok": bool, "mismatches": [...]}``.
    """
    manifest = read_manifest(path)
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != "shard"]
    rows = {
        int(r["shard"]): int(r["rows"])
        for r in df.groupBy("shard").agg(F.count(F.lit(1)).alias("rows")).collect()
    }
    fp_rows = (
        df.agg(
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(f"`{c}`" for c in data_cols)
                + "))"
            ).alias("fp")
        ).collect()
    )
    # bit_xor over zero rows is NULL -> same 0 fingerprint the export
    # writes for an empty frame
    fp = format(int(fp_rows[0]["fp"] or 0) & (2**64 - 1), "016x")
    mismatches = []
    for shard, meta in manifest["shards"].items():
        if rows.get(int(shard), 0) != meta["rows"]:
            mismatches.append(
                f"shard {shard}: manifest {meta['rows']} rows, "
                f"data {rows.get(int(shard), 0)}"
            )
    if fp != manifest["fingerprint"]:
        mismatches.append(
            f"fingerprint: manifest {manifest['fingerprint']}, data {fp}"
        )
    return {"ok": not mismatches, "mismatches": mismatches}
