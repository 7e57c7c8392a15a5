"""Synthesize a larger scale factor from the driver's sf0.1 testdata.

The sandbox testdata tops out at sf0.1 and is read-only, so the sf1
scale rehearsal (SCALE.md) needs its own input. This tool replicates
sf0.1 K times (default 10 -> "sf1") with key shifting that PRESERVES
referential integrity — each replica's facts reference that replica's
dimension copies — and writes ordinary parquet a `SPARK_GRAFT_SF_DIR`
override can point at. TPC-H conventions are kept: region/nation stay
fixed, the date range stays fixed (row density grows), key domains
shift by (max key + 1) per replica.

Two tables get fresh CONTENT instead of shifted copies, because exact
replication would manufacture super-linear behavior the rehearsal is
supposed to detect, not cause:

- ``documents``: text is re-sampled from the corpus vocabulary with a
  per-doc seeded RNG (matching the original per-doc word counts), so
  the near-dup surface scales like a real corpus — NOT 10 exact copies
  of every document, which would grow every LSH bucket 10x and the
  candidate-pair count 100x by construction.
- ``embeddings``: each replica's vectors are the originals rolled by r
  positions (norms exactly preserved, cross-replica correlation
  broken), so ANN bucket occupancy scales linearly instead of stacking
  identical vectors.

Usage:  python tools/make_scale_data.py [K] [SRC_DIR] [OUT_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, OUT=/tmp/m4i_scale/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# table -> columns shifted by (max(key_domain)+1) * replica; the key
# domain owner is listed first in _DOMAINS.
_DOMAINS = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def _offsets(src: str) -> dict[str, int]:
    out = {}
    for table, key in _DOMAINS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[key])
        out[table] = int(pa.compute.max(t.column(0)).as_py()) + 1
    return out


def _shift_replica(table: pa.Table, shifts: dict[str, str],
                   offs: dict[str, int], r: int) -> pa.Table:
    cols = []
    for name in table.column_names:
        col = table.column(name)
        if name in shifts and r > 0:
            col = pa.compute.add(col, offs[shifts[name]] * r)
        cols.append(col)
    out = pa.table(cols, names=table.column_names)
    # TPC-H keeps c_name == "Customer#" + 9-digit key; the shifted
    # replicas must re-derive it or every replica repeats the base
    # names VERBATIM — which manufactures the same super-linear
    # artifact the documents/embeddings synthesis avoids (measured:
    # name-blocked linkage at sf10 saw 100-copy name blocks and a
    # 182x pair blow-up from replication alone, not from the
    # operator).
    if "c_name" in out.column_names and r > 0:
        keys = out.column("c_custkey").to_pylist()
        names = pa.array(
            [f"Customer#{key:09d}" for key in keys], pa.string()
        )
        out = out.set_column(
            out.column_names.index("c_name"), "c_name", names
        )
    # s_name follows the same per-row-unique "Supplier#" + 9-digit key
    # convention, so it carries the same replication hazard (r10 audit:
    # no recorded law keys on s_name content today — every use is a
    # post-key-join projection — but re-deriving it closes the class).
    if "s_name" in out.column_names and r > 0:
        keys = out.column("s_suppkey").to_pylist()
        names = pa.array(
            [f"Supplier#{key:09d}" for key in keys], pa.string()
        )
        out = out.set_column(
            out.column_names.index("s_name"), "s_name", names
        )
    return out


def _synth_documents(table: pa.Table, r: int, n_docs: int) -> pa.Table:
    """Replica r>0: fresh text sampled from the corpus vocabulary with
    the ORIGINAL row's word count; lang/source kept for distribution."""
    texts = table.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in t.split()})
    varr = np.array(vocab)
    out_texts, out_nchars = [], []
    for i, t in enumerate(texts):
        rng = np.random.RandomState(1_000_003 * r + i)
        words = varr[rng.randint(0, len(varr), size=max(1, len(t.split())))]
        s = " ".join(words)
        out_texts.append(s)
        out_nchars.append(len(s))
    return pa.table(
        {
            "doc_id": pa.compute.add(table.column("doc_id"), n_docs * r),
            "text": pa.array(out_texts, pa.string()),
            "lang": table.column("lang"),
            "source": table.column("source"),
            "n_chars": pa.array(out_nchars, pa.int64()),
        }
    )


def _roll_embeddings(table: pa.Table, r: int, n_vecs: int) -> pa.Table:
    vecs = table.column("embedding").to_pylist()
    rolled = [np.roll(np.asarray(v, np.float32), r).tolist() for v in vecs]
    return pa.table(
        {
            "vec_id": pa.compute.add(table.column("vec_id"), n_vecs * r),
            "embedding": pa.array(rolled, table.schema.field("embedding").type),
            "label": table.column("label"),
        }
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/m4i_scale/sf1"
    os.makedirs(out, exist_ok=True)
    offs = _offsets(src)
    for name in TABLES:
        table = pq.read_table(os.path.join(src, f"{name}.parquet"))
        if name in ("region", "nation"):
            reps = [table]  # fixed dimensions at every scale factor
        elif name == "documents":
            reps = [table] + [
                _synth_documents(table, r, offs["documents"]) for r in range(1, k)
            ]
        elif name == "embeddings":
            reps = [table] + [
                _roll_embeddings(table, r, offs["embeddings"]) for r in range(1, k)
            ]
        else:
            reps = [
                _shift_replica(table, _SHIFTS.get(name, {}), offs, r)
                for r in range(k)
            ]
        combined = pa.concat_tables(reps)
        pq.write_table(
            combined,
            os.path.join(out, f"{name}.parquet"),
            # parquet format 2.6 stores whatever timestamp unit the
            # source carried (incl. the nanos older testdata
            # generations used) instead of silently coercing to µs
            version="2.6",
        )
        print(f"{name}: {table.num_rows} -> {combined.num_rows}")


if __name__ == "__main__":
    main()
