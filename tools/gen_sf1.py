#!/usr/bin/env python3
"""Generate the sf1 BENCH ANCHOR tables under testdata-sf1/ (round 15).

The driver ships sf{0.001,0.01,0.1}; the sf1 anchor exists purely to test
SCALING of the ten heaviest bench keys (documents/embeddings/events
consumers), so it is built by STRUCTURE-PRESERVING 10x replication of
sf0.1 rather than by re-deriving the driver's generator:

 - documents: 10 copies; copy c > 0 salts every whitespace token with a
   per-copy suffix, so within-copy shingle/minhash/similarity structure is
   BIT-PRESERVED (token mapping is injective) while cross-copy similarity
   is zero — near-dup pair counts scale linearly, never quadratically;
 - embeddings: 10 copies; copy c applies a deterministic diagonal +-1
   sign flip (an orthogonal transform: within-copy cosines exact,
   cross-copy structure scrambled);
 - events: 10 copies with user_id/event_id offsets on the same time range
   (stream-state cardinality scales with users, the realistic axis);
 - the TPC-H star tables copy through at sf0.1 (none of the anchored keys
   reads them; the bench warmup tolerates any scale).

Deterministic (seeded per copy). Output is NOT oracle-gated — bench only.
"""
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata-sf1")
COPIES = 10


def write_like(src_path, df, dst_path):
    orig = pq.read_table(src_path).schema
    schema = pa.schema([orig.field(i) for i in range(len(orig.names))])
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(tbl, dst_path)


def main():
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    d = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    out = []
    for c in range(COPIES):
        dc = d.copy()
        dc["doc_id"] = dc["doc_id"] + c * 1_000_000
        if c > 0:
            salt = f"q{c}z"
            dc["text"] = dc["text"].map(
                lambda s, _salt=salt: " ".join(
                    w + _salt for w in s.split(" ")))
            dc["n_chars"] = dc["text"].str.len().astype("int64")
        out.append(dc)
    write_like(f"{SRC}/documents.parquet",
               pd.concat(out, ignore_index=True),
               f"{DST}/documents.parquet")
    print("documents:", sum(len(x) for x in out))

    e = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    dim = len(e["embedding"].iloc[0])
    out = []
    for c in range(COPIES):
        ec = e.copy()
        ec["vec_id"] = ec["vec_id"] + c * 1_000_000
        if c > 0:
            signs = np.where(
                np.random.RandomState(1000 + c).rand(dim) < 0.5,
                np.float32(-1.0), np.float32(1.0))
            ec["embedding"] = ec["embedding"].map(
                lambda v, _s=signs: (np.asarray(v, dtype=np.float32) * _s))
        ec["embedding"] = ec["embedding"].map(
            lambda v: np.asarray(v, dtype=np.float32))
        out.append(ec)
    write_like(f"{SRC}/embeddings.parquet",
               pd.concat(out, ignore_index=True),
               f"{DST}/embeddings.parquet")
    print("embeddings:", sum(len(x) for x in out))

    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    umax = int(ev["user_id"].max()) + 1
    emax = int(ev["event_id"].max()) + 1
    out = []
    for c in range(COPIES):
        vc = ev.copy()
        vc["user_id"] = vc["user_id"] + c * umax
        vc["event_id"] = vc["event_id"] + c * emax
        out.append(vc)
    allev = pd.concat(out, ignore_index=True)
    # keep the global time order the streamed replays stage by
    allev = allev.sort_values(["ts", "event_id"], kind="mergesort") \
        .reset_index(drop=True)
    write_like(f"{SRC}/events.parquet", allev, f"{DST}/events.parquet")
    print("events:", len(allev))


if __name__ == "__main__":
    main()
