#!/usr/bin/env python3
"""Generate an HONEST sf1 fixture (10x sf0.1) at /tmp/sf1_honest.

Round 6's sf1 was 10 ID-shifted copies of sf0.1, which densifies
graphs (identical burst intervals on every user copy) and duplicates
every document/embedding (every span a cross-doc duplicate), so the
measured scaling exponents for q48/q130/q153 were upper bounds on a
semantically inflated workload. This generator produces NOVEL content
with sf0.1's empirical distributions instead:

- documents (50k): i.i.d. words from the sf0.1 unigram distribution,
  lengths resampled from the empirical length histogram, (lang,
  source) resampled from the empirical joint; exact-duplicate and
  near-duplicate docs planted at sf0.1's measured RATES (8/5000 exact,
  ~256 near-dup pairs/5000 docs) rather than at the copies' 100%.
- embeddings (20k): unit-normalized gaussians (sf0.1's embeddings are
  empirically uniform on the sphere: per-dim std ~= 1/8, pairwise
  cos ~ N(0, 1/8)); labels uniform over 0..9.
- events (1M): 15k fresh users; per-user event counts resampled from
  the empirical count distribution; timestamps sorted-uniform over the
  same January 2024 span (= Poisson arrivals conditioned on count);
  types uniform over the 5 observed; value ~ Exp(mean 50) rounded to
  2dp (matches the observed bucket decay); props {"k": 0..99}.
- relational tables (region..lineitem): 10 ID-shifted copies — joins
  and aggregates are key-preserving under an ID shift, so unlike the
  docs/graph tables this axis is semantically honest for them.

Deterministic: seed 421. Never writes to /root/testdata.
"""
import json
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/sf1_honest"
SCALE = 10
rng = np.random.default_rng(421)
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


# row groups sized so Spark's byte-range splitting (openCost 4 MB)
# can actually parallelize the scan: the driver's single-row-group
# layout forces CPU-heavy text scans through ONE task, which is a
# fixture artifact, not a 100 TB property (big corpora are many
# files/row groups).
ROW_GROUPS = {"documents": 2048, "events": 65536, "embeddings": 2048,
              "lineitem": 262144, "orders": 131072}


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet",
                   row_group_size=ROW_GROUPS.get(name, 1 << 20))
    print(f"{name}: {table.num_rows} rows")


# ---------------------------------------------------------------- documents
docs = con.sql(f"SELECT text, lang, source FROM '{SRC}/documents.parquet'").fetchall()
vocab_rows = con.sql(
    f"SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) AS w "
    f"FROM '{SRC}/documents.parquet') GROUP BY w ORDER BY w").fetchall()
vocab = [w for w, _ in vocab_rows]
probs = np.array([c for _, c in vocab_rows], dtype=float)
probs /= probs.sum()
lengths = np.array([len(t.split(" ")) for t, _, _ in docs])
langsrc = [(l, s) for _, l, s in docs]

n_docs = len(docs) * SCALE
exact_rate = 8 / len(docs)        # measured: 8 exact dups in 5000
near_rate = 256 / len(docs)       # measured: 256 near-dup pairs in 5000

# Planted duplicates COPY the source document's (lang, source): real
# exact/near dups overwhelmingly share their origin's metadata (sf0.1's
# do), and independently resampled metadata would scatter dup pairs
# across sources/langs at random — skewing source-conditioned dup
# metrics (q153 cross-source span overlap, contamination queries) on
# the very fixture that claims to preserve those distributions.
texts, metas = [], []
for i in range(n_docs):
    r = rng.random()
    if i > 0 and r < exact_rate:
        src = int(rng.integers(0, i))
        texts.append(texts[src])
        metas.append(metas[src])
    elif i > 0 and r < exact_rate + near_rate:
        src = int(rng.integers(0, i))
        words = texts[src].split(" ")
        k = max(1, len(words) // 10)
        for p in rng.choice(len(words), size=k, replace=False):
            words[p] = vocab[rng.choice(len(vocab), p=probs)]
        texts.append(" ".join(words))
        metas.append(metas[src])
    else:
        nw = int(rng.choice(lengths))
        texts.append(" ".join(
            vocab[j] for j in rng.choice(len(vocab), size=nw, p=probs)))
        metas.append(langsrc[rng.integers(0, len(langsrc))])

write("documents", pa.table({
    "doc_id": pa.array(range(n_docs), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array([m[0] for m in metas], pa.string()),
    "source": pa.array([m[1] for m in metas], pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

# --------------------------------------------------------------- embeddings
n_emb = 2000 * SCALE
V = rng.standard_normal((n_emb, 64)).astype(np.float32)
V /= np.linalg.norm(V, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(range(n_emb), pa.int64()),
    "embedding": pa.array([v for v in V.tolist()], pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
}))

# ------------------------------------------------------------------- events
counts_src = np.array([c for (c,) in con.sql(
    f"SELECT count(*) FROM '{SRC}/events.parquet' GROUP BY user_id").fetchall()])
ts_lo, ts_hi = con.sql(
    f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM '{SRC}/events.parquet'"
).fetchone()
types = ["signup", "purchase", "view", "click", "error"]
n_users = 1500 * SCALE
per_user = rng.choice(counts_src, size=n_users)
total = int(per_user.sum())
uid = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
ts = np.empty(total, dtype=np.int64)
pos = 0
for c in per_user:
    ts[pos:pos + c] = np.sort(rng.integers(ts_lo, ts_hi, c))
    pos += c
write("events", pa.table({
    "event_id": pa.array(range(total), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(uid, pa.int64()),
    "event_type": pa.array([types[i] for i in rng.integers(0, 5, total)], pa.string()),
    "value": pa.array(np.round(rng.exponential(50.0, total), 2), pa.float64()),
    "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, total)],
                      pa.string()),
}))

# -------------------------------------------- relational tables: ID shift
# Key-preserving: copy k shifts every key column by k*stride so all
# FK joins stay within a copy. Honest for joins/aggregates (the
# workload really is 10x the keys), unlike content tables.
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
# each key column strides by ITS referenced table's max+1 so FK joins
# stay aligned within a copy
FK_PK = {"r_regionkey": ("region", "r_regionkey"),
         "n_nationkey": ("nation", "n_nationkey"),
         "n_regionkey": ("region", "r_regionkey"),
         "c_custkey": ("customer", "c_custkey"),
         "c_nationkey": ("nation", "n_nationkey"),
         "s_suppkey": ("supplier", "s_suppkey"),
         "s_nationkey": ("nation", "n_nationkey"),
         "p_partkey": ("part", "p_partkey"),
         "o_orderkey": ("orders", "o_orderkey"),
         "o_custkey": ("customer", "c_custkey"),
         "l_orderkey": ("orders", "o_orderkey"),
         "l_partkey": ("part", "p_partkey"),
         "l_suppkey": ("supplier", "s_suppkey")}
stride_of = {k: int(con.sql(f"SELECT max({pk}) + 1 FROM '{SRC}/{tbl}.parquet'")
                    .fetchone()[0]) for k, (tbl, pk) in FK_PK.items()}
for name, keys in KEYS.items():
    t = pq.read_table(f"{SRC}/{name}.parquet")
    copies = []
    for c in range(SCALE):
        cols = {}
        for col in t.column_names:
            arr = t.column(col)
            if col in keys:
                vals = arr.to_numpy(zero_copy_only=False) + c * stride_of[col]
                cols[col] = pa.array(vals, arr.type)
            else:
                cols[col] = arr
        copies.append(pa.table(cols))
    write(name, pa.concat_tables(copies))

print("DONE ->", OUT)
