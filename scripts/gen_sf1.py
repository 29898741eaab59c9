#!/usr/bin/env python3
"""Repo-local sf1 test data — the 4th decade for SCALE.md's sf-curves.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); this script writes
a 10x-sf0.1 decade to localdata/sf1/ (gitignored) for the three tables
the curve queries read, with marginals matched to the driver generator's
observed distributions at sf0.01/sf0.1:

- documents (50,000 rows): the same 30-word uniform vocabulary, doc
  length ~ U[10, 100] words, lang ~ {en .41, de/es/fr/zh ~.1475}, 20
  sources, and the observed planted near-dup process: 5% of docs copy an
  earlier doc's text with exactly one random word replaced by the marker
  token "dup" (sf0.1 ground truth: 250/5000 docs contain "dup", 255
  total occurrences, copies share a 100-char prefix with their victim).
- embeddings (20,000 rows): 64-d unit-normalized gaussians, labels 0..9
  uniform (observed: no label-centroid structure, unit norms).
- lineitem (6,000,000 rows, the g11 co-occurrence input): sf0.1 tiled
  10x with disjoint key shifts (orderkey + i*1e9, partkey + i*1e6) —
  preserves the within-copy (order, part) joint distribution EXACTLY, so
  the co-occurrence graph is 10 disjoint replicas: the honest "does the
  operator scale linearly in graph size" input. Only the two columns the
  g-family reads are materialized.

Seeded (42): byte-stable across runs. Run: python3 scripts/gen_sf1.py
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "localdata" / "sf1"
OUT.mkdir(parents=True, exist_ok=True)
SRC = "/root/testdata/sf0.1"

rng = np.random.default_rng(42)

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

N_DOCS = 50_000
DUP_FRACTION = 0.05

print("documents ...")
texts = []
for i in range(N_DOCS):
    n = int(rng.integers(10, 101))
    texts.append(" ".join(rng.choice(VOCAB, size=n)))
# plant near-dups: victim strictly earlier, one word -> "dup"
dup_ids = rng.choice(np.arange(1, N_DOCS), size=int(N_DOCS * DUP_FRACTION),
                     replace=False)
for i in sorted(dup_ids):
    victim = int(rng.integers(0, i))
    words = texts[victim].split(" ")
    words[int(rng.integers(0, len(words)))] = "dup"
    texts[i] = " ".join(words)
langs = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
sources = [f"src{int(s)}" for s in rng.integers(0, 20, size=N_DOCS)]
pq.write_table(pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), OUT / "documents.parquet")

print("embeddings ...")
N_VEC, DIM = 20_000, 64
v = rng.standard_normal((N_VEC, DIM)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(range(N_VEC), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, size=N_VEC), pa.int32()),
}), OUT / "embeddings.parquet")

print("lineitem (tiled 10x) ...")
con = duckdb.connect()
con.sql(f"""
COPY (
  SELECT l_orderkey + i * 1000000000 AS l_orderkey,
         l_partkey + i * 1000000 AS l_partkey
  FROM '{SRC}/lineitem.parquet'
  CROSS JOIN (SELECT unnest(range(10)) AS i)
) TO '{OUT}/lineitem.parquet' (FORMAT parquet)
""")
print("done:", [p.name for p in OUT.iterdir()])
