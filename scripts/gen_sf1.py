#!/usr/bin/env python3
"""Repo-local sf1 test data — the 4th decade for SCALE.md's sf-curves.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); this script writes
a 10x-sf0.1 decade to localdata/sf1/ (gitignored) for the five tables
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
- orders (150,000 rows): sf0.1 tiled 10x with the SAME orderkey shift as
  lineitem (so the g2 bipartite join lines up) and disjoint custkeys —
  the HITS graph becomes 10 exact replicas.
- events (1,000,000 rows): sf0.1 tiled 10x with disjoint key shifts
  (event_id + i*1e6, user_id + i*10000; ts/type/value/props copied) —
  per-user event sequences are preserved exactly, so user-keyed windows
  see 10 disjoint replica populations and group-keyed aggregates see 10x
  rows per group. Input for the c/x-family sf1 curves (x96 etc.).

Round-13 addition — the production-shaped corpus (VERDICT r12 #5): the
driver's 30-word closed vocabulary makes near-threshold pair density
quadratic in corpus size BY CONSTRUCTION (any two docs share most of
their unigram vocabulary), which is the measured cause of d17's 1.28
sf1 slope. Real corpora are heavy-tailed: rare words stay rare as the
corpus grows, so near-dup candidate density grows ~linearly. This
script therefore also writes a Zipfian decade —
  localdata/sf0.1_zipf/documents.parquet  (5,000 docs) and
  localdata/sf1_zipf/documents.parquet    (50,000 docs)
— same row schema, doc length ~ U[10,100], langs/sources matched, the
same planted near-dup process (5% copy an earlier doc with one word ->
"dup"), but words drawn rank-wise from a 50,000-type vocabulary with
P(rank r) ∝ 1/r^1.05 (inside the s∈[1,1.2] band measured on web text;
Piantadosi 2014 review). Both decades are seeded from the same stream,
so the sf0.1_zipf corpus is NOT a subset of sf1_zipf — each is an iid
draw at its size, which is what a growing crawl looks like.

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

print("orders (tiled 10x, the g2 bipartite-graph input) ...")
con.sql(f"""
COPY (
  SELECT o_orderkey + i * 1000000000 AS o_orderkey,
         o_custkey + i * 1000000 AS o_custkey
  FROM '{SRC}/orders.parquet'
  CROSS JOIN (SELECT unnest(range(10)) AS i)
) TO '{OUT}/orders.parquet' (FORMAT parquet)
""")

print("events (tiled 10x) ...")
con.sql(f"""
COPY (
  SELECT event_id + i * 1000000 AS event_id,
         ts,
         user_id + i * 10000 AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'
  CROSS JOIN (SELECT unnest(range(10)) AS i)
) TO '{OUT}/events.parquet' (FORMAT parquet)
""")

# ---- Zipfian-vocabulary decade (round 13) --------------------------------
ZIPF_VOCAB_N = 50_000
ZIPF_S = 1.05
zipf_words = np.array([f"w{r:05d}" for r in range(1, ZIPF_VOCAB_N + 1)])
zipf_p = 1.0 / np.arange(1, ZIPF_VOCAB_N + 1) ** ZIPF_S
zipf_p /= zipf_p.sum()

def gen_zipf_docs(n_docs: int, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    # one vectorized draw for the whole corpus (per-doc rng.choice would
    # rebuild the 50k-entry CDF once per document — ~100x slower for the
    # identical distribution), then slice per document
    lengths = rng.integers(10, 101, size=n_docs)
    cdf = np.cumsum(zipf_p)
    idx = np.searchsorted(cdf, rng.random(int(lengths.sum())))
    draws = zipf_words[np.minimum(idx, len(zipf_words) - 1)]  # fp-sum guard
    bounds = np.concatenate(([0], np.cumsum(lengths)))
    texts = [" ".join(draws[bounds[i]:bounds[i + 1]]) for i in range(n_docs)]
    dup_ids = rng.choice(np.arange(1, n_docs), size=int(n_docs * DUP_FRACTION),
                         replace=False)
    for i in sorted(dup_ids):
        victim = int(rng.integers(0, i))
        words = texts[victim].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[i] = " ".join(words)
    langs_z = rng.choice(LANGS, size=n_docs, p=LANG_P)
    sources_z = [f"src{int(s)}" for s in rng.integers(0, 20, size=n_docs)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs_z, pa.string()),
        "source": pa.array(sources_z, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), out_dir / "documents.parquet")

print("documents zipf sf0.1 (5,000 docs) ...")
gen_zipf_docs(5_000, OUT.parent / "sf0.1_zipf")
print("documents zipf sf1 (50,000 docs) ...")
gen_zipf_docs(50_000, OUT.parent / "sf1_zipf")

print("done:", [p.name for p in OUT.iterdir()],
      [p.name for p in (OUT.parent / "sf0.1_zipf").iterdir()],
      [p.name for p in (OUT.parent / "sf1_zipf").iterdir()])

# ---- 5th decade (round 14): sf10 documents + embeddings ------------------
# VERDICT r13 #4: the three steepest 4th-decade survivors (x109 0.91,
# s22 0.72, d23 0.70) get one more decade to show no hidden
# super-linear term is amortizing out of view. Only the two tables
# those queries read are materialized (documents for x109/d23,
# embeddings for s22) — same marginals and planted-dup process as sf1,
# 10x the rows, fresh iid draw (a growing crawl, not a superset).
OUT10 = Path(__file__).resolve().parent.parent / "localdata" / "sf10"
OUT10.mkdir(parents=True, exist_ok=True)
rng10 = np.random.default_rng(43)

N10 = 500_000
print("sf10 documents ...")
lengths = rng10.integers(10, 101, size=N10)
all_words = rng10.choice(VOCAB, size=int(lengths.sum()))
texts10 = []
off = 0
for n in lengths:
    texts10.append(" ".join(all_words[off:off + n]))
    off += n
dup_ids10 = rng10.choice(np.arange(1, N10), size=int(N10 * DUP_FRACTION),
                         replace=False)
for i in sorted(dup_ids10):
    victim = int(rng10.integers(0, i))
    words = texts10[victim].split(" ")
    words[int(rng10.integers(0, len(words)))] = "dup"
    texts10[i] = " ".join(words)
langs10 = rng10.choice(LANGS, size=N10, p=LANG_P)
sources10 = [f"src{int(s)}" for s in rng10.integers(0, 20, size=N10)]
pq.write_table(pa.table({
    "doc_id": pa.array(range(N10), pa.int64()),
    "text": pa.array(texts10, pa.string()),
    "lang": pa.array(langs10, pa.string()),
    "source": pa.array(sources10, pa.string()),
    "n_chars": pa.array([len(t) for t in texts10], pa.int64()),
}), OUT10 / "documents.parquet")

print("sf10 embeddings ...")
NV10 = 200_000
v10 = rng10.standard_normal((NV10, DIM)).astype(np.float32)
v10 /= np.linalg.norm(v10, axis=1, keepdims=True)
pq.write_table(pa.table({
    "vec_id": pa.array(range(NV10), pa.int64()),
    "embedding": pa.array(list(v10), pa.list_(pa.float32())),
    "label": pa.array(rng10.integers(0, 10, size=NV10), pa.int32()),
}), OUT10 / "embeddings.parquet")
print("sf10 done")
