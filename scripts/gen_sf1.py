#!/usr/bin/env python
"""Repo-generated sf1 extrapolation of the driver testdata (round-5
verdict ask #1): a second measured scale decade for BENCH_SCALING.

The driver ships sf{0.001,0.01,0.1} (seed=42, read-only). This script
extrapolates the SAME schema one more decade to ``/root/testdata_local/
sf1/`` — clearly repo-generated, never written under the read-only
``/root/testdata``. Method: **empirical row-resampling** from sf0.1 —
each scaled fact/dim table draws whole rows with replacement from the
driver table (preserving intra-row correlations such as
extendedprice≈quantity×price and every categorical frequency/skew),
then re-keys into fresh dense key domains with uniform FK assignment
(matching the driver's observed FK shape: events-per-user 45..99 ≈
uniform multinomial). Dimension tables with fixed cardinality
(region, nation) are copied verbatim.

Synthesized rather than resampled (resampling would distort the
operator workload):
- ``documents``: fresh bag-of-words texts over the driver's observed
  31-word vocabulary and 10..100-word uniform length, with the driver's
  near-dup convention reproduced (~1% near-dups that substitute 1-3
  words with the ``dup`` token, ~0.2% exact duplicates) — so dedup
  candidate-pair density scales LINEARLY like a real crawl, instead of
  every sf0.1 text suddenly having 10 exact copies.
- ``embeddings``: fresh unit-norm 64-dim vectors, labels uniform 0..9
  (the driver vectors are unit-norm with near-zero label centroids).
  Count follows the driver's own sub-linear step (sf0.01→sf0.1 grew
  4×, not 10×): 2000 → 8000.
- ``events.ts``: fresh uniform timestamps over the driver's observed
  range (resampling 100k distinct ts into 1M rows would create 10-way
  timestamp collisions that no real stream has), sorted, with
  ``event_id`` assigned in ts order.

Deterministic: numpy PCG64 seed 4242. Output ~170 MB parquet.

Row counts (10× the sf0.1 facts): customer 150k, supplier 10k,
part 200k, orders 1.5M, lineitem ~6M (lines-per-order sampled from the
empirical sf0.1 distribution), events 1M (user_id 0..14999),
documents 50k, embeddings 8k.

Usage: python scripts/gen_sf1.py [out_dir]   (default /root/testdata_local/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = "/root/testdata_local/sf1"
SEED = 4242
SCALE = 10

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DOCS = 50_000
N_EMBED = 8_000  # driver's own sub-linear step: 500 → 2000 is 4×
EMBED_DIM = 64


@dataclass(frozen=True)
class GenConfig:
    """Explicit generator parameters. gen_sf10.py passes its own instance
    instead of mutating this module's globals (round-6 advice finding: a
    refactor that captured the globals as locals would have silently made
    sf10 generate sf1-sized data with sf1's seed)."""

    out_dir: str = DEFAULT_OUT
    seed: int = SEED
    label: str = "sf1"
    n_customer: int = N_CUSTOMER
    n_supplier: int = N_SUPPLIER
    n_part: int = N_PART
    n_orders: int = N_ORDERS
    n_events: int = N_EVENTS
    n_users: int = N_USERS
    n_docs: int = N_DOCS
    n_embed: int = N_EMBED


def _read(name: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet")).to_pandas()


def _write(out_dir: str, name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    # match the driver's physical types (schema taken from the sf0.1 file)
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {len(df):,} rows")


def _schema_of(name: str) -> pa.Schema:
    return pq.read_schema(os.path.join(SRC, f"{name}.parquet"))


def _resample(rng: np.random.Generator, src: pd.DataFrame, n: int,
              cols: list[str]) -> pd.DataFrame:
    idx = rng.integers(0, len(src), size=n)
    return src.iloc[idx][cols].reset_index(drop=True)


def main(cfg: GenConfig | None = None) -> int:
    if cfg is None:
        cfg = GenConfig(out_dir=sys.argv[1]) if len(sys.argv) > 1 else GenConfig()
    out_dir = cfg.out_dir
    if os.path.realpath(out_dir).startswith("/root/testdata/"):
        raise SystemExit("refusing to write under the read-only driver dir")
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(out_dir, exist_ok=True)

    # fixed-cardinality dims: copy verbatim
    for name in ("region", "nation"):
        shutil.copyfile(os.path.join(SRC, f"{name}.parquet"),
                        os.path.join(out_dir, f"{name}.parquet"))
        print(f"  {name}: copied")

    # customer / supplier / part: row-resample attributes, fresh keys
    cust = _read("customer")
    df = _resample(rng, cust, cfg.n_customer,
                   ["c_nationkey", "c_acctbal", "c_mktsegment"])
    df.insert(0, "c_custkey", np.arange(cfg.n_customer, dtype=np.int64))
    df.insert(1, "c_name", [f"Customer#{k:09d}" for k in range(cfg.n_customer)])
    _write(out_dir, "customer", df, _schema_of("customer"))

    supp = _read("supplier")
    df = _resample(rng, supp, cfg.n_supplier, ["s_nationkey", "s_acctbal"])
    df.insert(0, "s_suppkey", np.arange(cfg.n_supplier, dtype=np.int64))
    df.insert(1, "s_name", [f"Supplier#{k:09d}" for k in range(cfg.n_supplier)])
    _write(out_dir, "supplier", df, _schema_of("supplier"))

    part = _read("part")
    df = _resample(rng, part, cfg.n_part,
                   ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    df.insert(0, "p_partkey", np.arange(cfg.n_part, dtype=np.int64))
    _write(out_dir, "part", df, _schema_of("part"))

    # orders: resampled attributes, uniform FK into the new customer domain
    orders = _read("orders")
    df = _resample(rng, orders, cfg.n_orders,
                   ["o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority"])
    df.insert(0, "o_orderkey", np.arange(cfg.n_orders, dtype=np.int64))
    df.insert(1, "o_custkey",
              rng.integers(0, cfg.n_customer, size=cfg.n_orders, dtype=np.int64))
    _write(out_dir, "orders", df, _schema_of("orders"))

    # lineitem: lines-per-order drawn from the EMPIRICAL sf0.1 distribution
    # (so the orderkey-group skew scales, not flattens)
    li = _read("lineitem")
    lpo_counts = li.groupby("l_orderkey").size()
    lpo_vals, lpo_freq = np.unique(lpo_counts.values, return_counts=True)
    lpo = rng.choice(lpo_vals, size=cfg.n_orders, p=lpo_freq / lpo_freq.sum())
    n_li = int(lpo.sum())
    df = _resample(rng, li, n_li,
                   ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"])
    df.insert(0, "l_orderkey", np.repeat(
        np.arange(cfg.n_orders, dtype=np.int64), lpo))
    df.insert(1, "l_partkey",
              rng.integers(0, cfg.n_part, size=n_li, dtype=np.int64))
    df.insert(2, "l_suppkey",
              rng.integers(0, cfg.n_supplier, size=n_li, dtype=np.int64))
    # driver convention: linenumber is uniform 1..7, not sequential
    df.insert(3, "l_linenumber",
              rng.integers(1, 8, size=n_li).astype(np.int32))
    _write(out_dir, "lineitem", df, _schema_of("lineitem"))

    # events: fresh sorted timestamps over the driver's observed range;
    # (event_type, value, props-k) resampled jointly to keep correlations
    ev = _read("events")
    t0, t1 = ev["ts"].min().value, ev["ts"].max().value  # ns since epoch
    ts = np.sort(rng.integers(t0, t1, size=cfg.n_events))
    ts = (ts // 1000) * 1000  # microsecond resolution like the driver file
    idx = rng.integers(0, len(ev), size=cfg.n_events)
    df = pd.DataFrame({
        "event_id": np.arange(cfg.n_events, dtype=np.int64),
        "ts": pd.to_datetime(ts),
        "user_id": rng.integers(0, cfg.n_users, size=cfg.n_events, dtype=np.int64),
        "event_type": ev["event_type"].values[idx],
        "value": ev["value"].values[idx],
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, size=cfg.n_events)],
    })
    _write(out_dir, "events", df, _schema_of("events"))

    # documents: fresh bag-of-words over the driver vocabulary, with the
    # driver's near-dup convention ("dup"-substituted copies) at a rate
    # that keeps candidate-pair density LINEAR in corpus size
    vocab = np.array(sorted(set(
        w for t in _read("documents")["text"].head(1000) for w in t.split()
        if w != "dup")))
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    n_words = rng.integers(10, 101, size=cfg.n_docs)
    texts = [" ".join(rng.choice(vocab, size=k)) for k in n_words]
    # ~1% near-dups: copy an earlier doc, substitute 1-3 words with "dup"
    for i in rng.choice(np.arange(1, cfg.n_docs), size=cfg.n_docs // 100,
                        replace=False):
        words = texts[int(rng.integers(0, i))].split()
        for j in rng.choice(len(words),
                            size=min(len(words), int(rng.integers(1, 4))),
                            replace=False):
            words[j] = "dup"
        texts[i] = " ".join(words)
    # ~0.2% exact duplicates
    for i in rng.choice(np.arange(1, cfg.n_docs), size=cfg.n_docs // 500,
                        replace=False):
        texts[i] = texts[int(rng.integers(0, i))]
    df = pd.DataFrame({
        "doc_id": np.arange(cfg.n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=cfg.n_docs, p=lang_p),
        "source": [f"src{k}" for k in rng.integers(0, 20, size=cfg.n_docs)],
    })
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    _write(out_dir, "documents", df, _schema_of("documents"))

    # embeddings: unit-norm vectors like the driver's (label centroids
    # are near zero there, so labels are independent uniform)
    vecs = rng.standard_normal((cfg.n_embed, EMBED_DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = pd.DataFrame({
        "vec_id": np.arange(cfg.n_embed, dtype=np.int64),
        "embedding": list(vecs),
        "label": rng.integers(0, 10, size=cfg.n_embed).astype(np.int32),
    })
    _write(out_dir, "embeddings", df, _schema_of("embeddings"))

    print(f"{cfg.label} written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
