"""Generate sf1 testdata (10x sf0.1) under $OUT (default
/root/repo/testdata_sf1) by deterministic bootstrap of the driver's
sf0.1 tables — the r12 verdict's ask #4 (no network: DuckDB's tpch
extension cannot download, so the existing data IS the generator).

Design: 10 copies of every fact table with CONSISTENT key offsets
(copy c adds c * (max_key + 1) to each key wherever it appears, so
all joins land exactly as at sf0.1), dims (region/nation) fixed as
TPC-H scaling does. Three decorrelation rules keep workloads honest
at 10x instead of artificially quadratic:

  * documents: copy c > 0 suffixes EVERY token with the copy digit —
    intra-copy dup/near-dup structure is preserved (all docs of a
    copy transform identically) while cross-copy minhash/LSH bucket
    collisions vanish (10 exact copies of each doc would otherwise
    make every dedup bucket 10x deeper and pair work 100x).
  * embeddings: copy c > 0 applies a seed-c random SIGN FLIP per
    coordinate — an orthogonal transform, so intra-copy cosine
    geometry is EXACTLY preserved while copies decorrelate.
  * events: copy c shifts ts by c * (span + 1 day) and offsets
    user_id/event_id — distinct users in disjoint time ranges, so
    session/cell densities match sf0.1 and co-occurrence graphs grow
    linearly (10x users in the SAME cells would grow edges 100x).

Row counts: lineitem 6M, orders 1.5M, customer 150k, part 200k,
supplier 10k, events 1M, documents 50k, embeddings 20k.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("OUT", "/root/repo/testdata_sf1")
N_COPIES = 10

# table -> {column: key domain} (same domain name = same offset)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    # dims: verbatim
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    # key domain sizes from sf0.1 maxima
    dom = {}
    for t, cols in KEYED.items():
        for col, d in cols.items():
            m = con.execute(
                f"SELECT MAX({col}) FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchone()[0]
            dom[d] = max(dom.get(d, 0), int(m) + 1)
    print("domains:", dom)

    # name columns derive from the key (TPC-H 'Customer#%09d'): they
    # must follow the REMAPPED key or every name occurs N_COPIES
    # times and name-blocked workloads (fuzzy_name_pairs, fs_linkage
    # SNM) go quadratic in copies — the first sf1 bench measured
    # fuzzy_name_pairs at 71x for 10x data before this rewrite.
    NAMED = {
        "customer": ("c_name", "Customer#", "c_custkey", "cust"),
        "supplier": ("s_name", "Supplier#", "s_suppkey", "supp"),
    }

    for t, cols in KEYED.items():
        schema_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for c in range(N_COPIES):
            def _proj(col, c=c):
                if t in NAMED and col == NAMED[t][0]:
                    _, pfx, keycol, d = NAMED[t]
                    return (
                        f"'{pfx}' || lpad(CAST({keycol} + "
                        f"{c * dom[d]} AS VARCHAR), 9, '0') AS {col}"
                    )
                if col in cols:
                    return f"{col} + {c * dom[cols[col]]} AS {col}"
                return col

            proj = ", ".join(_proj(col) for col in schema_cols)
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
        print(t, "x10 written")

    # events: ts shift + id offsets (schema: event_id ts user_id
    # event_type value props)
    emax = con.execute(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1, "
        f"CAST(EXTRACT(EPOCH FROM CAST(MAX(ts) AS TIMESTAMP) "
        f"- CAST(MIN(ts) AS TIMESTAMP)) AS BIGINT) "
        f"FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    eoff, uoff, span_s = int(emax[0]), int(emax[1]), int(emax[2])
    selects = []
    for c in range(N_COPIES):
        shift = c * (span_s + 86400)
        selects.append(
            f"SELECT event_id + {c * eoff} AS event_id, "
            f"ts + to_seconds({shift}) AS ts, "
            f"user_id + {c * uoff} AS user_id, event_type, value, props "
            f"FROM read_parquet('{SRC}/events.parquet')"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/events.parquet' "
        f"(FORMAT PARQUET)"
    )
    print("events x10 written")

    # documents: per-copy token suffix (python — string surgery)
    dt = pq.read_table(f"{SRC}/documents.parquet")
    dmax = int(pa.compute.max(dt["doc_id"]).as_py()) + 1
    parts = []
    for c in range(N_COPIES):
        ids = pa.compute.add(dt["doc_id"], c * dmax)
        if c == 0:
            text = dt["text"]
            nch = dt["n_chars"]
        else:
            texts = [
                " ".join(f"{w}{c}" for w in s.split())
                for s in dt["text"].to_pylist()
            ]
            text = pa.array(texts, pa.string())
            nch = pa.array([len(s) for s in texts], pa.int64())
        parts.append(
            pa.table(
                {
                    "doc_id": ids,
                    "text": text,
                    "lang": dt["lang"],
                    "source": dt["source"],
                    "n_chars": nch,
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{OUT}/documents.parquet")
    print("documents x10 written")

    # embeddings: per-copy orthogonal sign flip
    et = pq.read_table(f"{SRC}/embeddings.parquet")
    vmax = int(pa.compute.max(et["vec_id"]).as_py()) + 1
    emb = np.array(et["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for c in range(N_COPIES):
        ids = pa.compute.add(et["vec_id"], c * vmax)
        if c == 0:
            vecs = emb
        else:
            rng = np.random.RandomState(c)
            signs = rng.choice(
                [-1.0, 1.0], size=emb.shape[1]
            ).astype(np.float32)
            vecs = emb * signs
        parts.append(
            pa.table(
                {
                    "vec_id": ids,
                    "embedding": pa.array(
                        [v for v in vecs.tolist()],
                        pa.list_(pa.float32()),
                    ),
                    "label": et["label"],
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{OUT}/embeddings.parquet")
    print("embeddings x10 written")

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
