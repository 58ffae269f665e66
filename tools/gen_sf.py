#!/usr/bin/env python3
"""Deterministic sf-scaled testdata generator (dev tool only).

Mirrors the driver's testdata layout (TESTDATA.md) so the suite can be
driven at scale factors the driver doesn't ship — the round-9 use is
sf1 (10x sf0.1): run Verify + Bench at sf1 and record per-query scaling
exponents in BASELINE.md. Distributions are matched to the shipped
sf0.1 tables (measured, not guessed):

  lineitem   6,000,000   qty 1..50 int-as-double, 3x2 flag/status,
                         price U[900,105000], disc 0..0.10, tax 0..0.08
  orders     1,500,000   status O/P/F uniform, 5 priorities, custkey fk
  customer     150,000   5 mktsegments, acctbal U[-1000,10000]
  part         200,000   Brand#1..25, 5 types, size 1..50, retail 900+k/10
  supplier      10,000   acctbal U[-1000,10000]
  events     1,000,000   5 types, 30-day us-timestamps, value U[0,600]
  documents     50,000   31-word vocab, langs en 40%/others 15%,
                         src0..19 uniform, ~0.16% exact-dup pairs,
                         ~1% truncation families (shared long prefix)
  embeddings    20,000   unit-norm 64-dim, weak label clusters
                         (within-label mean cos ~0.004, matching sf0.1)

Never writes into /root/testdata (read-only) — pass an output root like
/root/sfgen and a scale factor; tables land at <root>/sf<sf>/*.parquet.

    python3 tools/gen_sf.py 1 /root/sfgen      # -> /root/sfgen/sf1/

Deterministic: every column derives from numpy PCG64 seeded per-table;
re-running reproduces byte-identical values (row order included).
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
ROOT = sys.argv[2] if len(sys.argv) > 2 else "/root/sfgen"
# optional 4th arg: comma-separated table subset (e.g. "documents,embeddings"
# for the dedup/ANN decade runs — generating 6M*SF lineitem rows to measure a
# documents-only query wastes minutes and gigabytes). Values must be table
# names; anything else still generates (cheap) dimension tables it depends on.
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
# optional 5th arg: documents GEOMETRY (provenance-versioned; every scale
# table in BASELINE.md names the geometry it was measured on):
#   synthetic  (default) the 31-word adversarial vocabulary that matches the
#              shipped sf0.1 tables — deliberately worst-case for SimHash
#              (correlated vote bits -> hot 12-bit blocks)
#   natural    Zipf-Mandelbrot vocabulary of 20,000 pseudo-words with
#              lognormal doc lengths — the "real corpus" geometry the
#              round-10 verdict asked for (c92/c93's served-default decision
#              leaned on an unmeasured "near-linear on natural vocabularies"
#              claim). Word frequencies follow p(r) ~ 1/(r+2.7)^1.07 (Zipf-
#              Mandelbrot fit to English), doc lengths ln N(median 50 tok,
#              sigma 0.8) clipped to [8, 400] so token mass per doc stays
#              comparable to synthetic. Only documents changes; the seed
#              string carries the geometry tag so both mirrors coexist.
GEOM = sys.argv[4] if len(sys.argv) > 4 else "synthetic"
assert GEOM in ("synthetic", "natural"), GEOM
sfs = ("%g" % SF)
OUT = f"{ROOT}/sf{sfs}"
os.makedirs(OUT, exist_ok=True)

# row counts: linear in sf, anchored to the shipped sf0.1 counts
N_LINE = int(6_000_000 * SF)
N_ORD = int(1_500_000 * SF)
N_CUST = int(150_000 * SF)
N_PART = int(200_000 * SF)
N_SUPP = int(10_000 * SF)
N_EVT = int(1_000_000 * SF)
N_DOC = int(50_000 * SF)
N_EMB = int(20_000 * SF)


def rng(name):
    # hashlib, not built-in hash(): str hashing is SipHash-salted per process
    # (PYTHONHASHSEED), which would make "re-running reproduces byte-identical
    # values" false across interpreter invocations.
    digest = hashlib.md5(f"graft_sf|{name}|{sfs}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(digest[:4], "big")))


def want(name):
    return ONLY is None or name in ONLY


def write(name, cols, schema=None):
    if not want(name):
        return
    t = pa.table(cols, schema=schema)
    pq.write_table(t, f"{OUT}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows")


# region / nation: fixed dimensions, same at every sf
write("region", {
    "r_regionkey": pa.array(range(5), pa.int64()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("nation", {
    "n_nationkey": pa.array(range(25), pa.int64()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
})

g = rng("customer")
write("customer", {
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(g.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(g.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])[g.integers(0, 5, N_CUST)]),
})

g = rng("supplier")
write("supplier", {
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(g.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(g.uniform(-1000, 10000, N_SUPP), 2),
})

g = rng("part")
adjs = ["large", "hot", "blue", "old", "small", "red", "new", "cold", "green", "dim"]
nouns = ["ring", "bolt", "plate", "case", "gear", "disk", "tube", "rod", "cap", "pin"]
write("part", {
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{adjs[i % 10]} {nouns[(i // 10) % 10]}" for i in range(N_PART)],
    "p_brand": pa.array([f"Brand#{1 + (i % 25)}" for i in range(N_PART)]),
    "p_type": pa.array(np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"])[g.integers(0, 5, N_PART)]),
    "p_size": pa.array(g.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + (np.arange(N_PART) % 1000) / 10.0, 2),
})

DAY_US = 86_400_000_000
base_date = np.datetime64("1995-01-01", "us").astype("int64")

if want("orders"):
    g = rng("orders")
    odate = base_date + g.integers(0, 2404, N_ORD) * DAY_US  # ~1995-01..2001-08
    write("orders", {
        "o_orderkey": pa.array(range(N_ORD), pa.int64()),
        "o_custkey": pa.array(g.integers(0, N_CUST, N_ORD), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[g.integers(0, 3, N_ORD)]),
        "o_totalprice": np.round(g.uniform(1000, 500000, N_ORD), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[g.integers(0, 5, N_ORD)]),
    })

if want("lineitem"):
    g = rng("lineitem")
    lok = np.sort(g.integers(0, N_ORD, N_LINE))  # ~4 lines per order
    # linenumber = 1..n within each orderkey run
    ln = np.ones(N_LINE, dtype=np.int32)
    same = np.concatenate(([False], lok[1:] == lok[:-1]))
    run = np.ones(N_LINE, dtype=np.int32)
    idx = np.arange(N_LINE)
    starts = np.where(~same, idx, 0)
    np.maximum.accumulate(starts, out=starts)
    ln = (idx - starts + 1).astype(np.int32)
    ship = base_date + DAY_US + g.integers(0, 2500, N_LINE) * DAY_US
    write("lineitem", {
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(g.integers(0, N_PART, N_LINE), pa.int64()),
        "l_suppkey": pa.array(g.integers(0, N_SUPP, N_LINE), pa.int64()),
        "l_linenumber": pa.array(np.minimum(ln, 7), pa.int32()),
        "l_quantity": g.integers(1, 51, N_LINE).astype(np.float64),
        "l_extendedprice": np.round(g.uniform(900, 105000, N_LINE), 2),
        "l_discount": np.round(g.integers(0, 11, N_LINE) / 100.0, 2),
        "l_tax": np.round(g.integers(0, 9, N_LINE) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[g.integers(0, 3, N_LINE)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[g.integers(0, 2, N_LINE)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })

if want("events"):
    g = rng("events")
    ets = np.sort(np.datetime64("2024-01-01", "us").astype("int64") + g.integers(0, 30 * DAY_US, N_EVT))
    write("events", {
        "event_id": pa.array(range(N_EVT), pa.int64()),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(g.integers(0, max(1, N_CUST // 10), N_EVT), pa.int64()),
        "event_type": pa.array(np.array(["view", "click", "purchase", "signup", "error"])[g.integers(0, 5, N_EVT)]),
        "value": np.round(g.uniform(0, 600, N_EVT), 2),
        "props": [f'{{"k": {k}}}' for k in g.integers(0, 100, N_EVT)],
    })

g = rng("documents" if GEOM == "synthetic" else f"documents|{GEOM}")
if GEOM == "synthetic":
    VOCAB = np.array([
        "spark", "window", "merge", "table", "column", "vector", "stream", "value",
        "data", "small", "join", "filter", "big", "group", "hash", "customer",
        "sort", "order", "slow", "line", "part", "fast", "row", "the",
        "agg", "key", "query", "a", "scan", "batch", "so",
    ])
else:
    # 20k distinct pseudo-words: rank r spelled as syllables of (r + 40)
    # in base 40 — deterministic, all distinct, natural-ish lengths
    SYL = ["ka", "ro", "ti", "na", "se", "lo", "mi", "da", "ve", "pu",
           "ri", "ta", "no", "ba", "ku", "le", "sa", "do", "fi", "ga",
           "he", "ju", "wa", "zo", "ce", "ny", "qu", "xi", "pe", "ma",
           "tu", "si", "re", "ko", "la", "bi", "mo", "ne", "vi", "su"]
    NV = 20_000

    def word(r):
        r += len(SYL)  # skip 1-syllable collisions with short ranks
        out = []
        while r:
            out.append(SYL[r % len(SYL)])
            r //= len(SYL)
        return "".join(reversed(out))

    VOCAB = np.array([word(r) for r in range(NV)])
    zipf = 1.0 / np.power(np.arange(1, NV + 1) + 2.7, 1.07)
    zipf /= zipf.sum()
langs = np.array(["en", "es", "fr", "de", "zh"])
lang_ix = g.choice(5, N_DOC, p=[0.41, 0.15, 0.15, 0.14, 0.15])
if GEOM == "synthetic":
    lens = g.integers(8, 100, N_DOC)
else:
    lens = np.clip(np.round(np.exp(g.normal(np.log(50.0), 0.8, N_DOC))), 8, 400).astype(np.int64)
texts = []
if GEOM == "synthetic":
    for i in range(N_DOC):
        texts.append(" ".join(VOCAB[g.integers(0, len(VOCAB), lens[i])]))
else:
    # one bulk Zipf draw for the whole corpus (per-doc choice() re-scans
    # the 20k-probability vector -> 1e9 ops at sf1), then slice per doc
    offs = np.concatenate(([0], np.cumsum(lens)))
    all_toks = g.choice(len(VOCAB), int(offs[-1]), p=zipf)
    for i in range(N_DOC):
        texts.append(" ".join(VOCAB[all_toks[offs[i]:offs[i + 1]]]))
# exact-dup pairs ~0.16% of docs, mirroring sf0.1's 8-in-5000
gd = rng("doc_dups" if GEOM == "synthetic" else f"doc_dups|{GEOM}")
n_dup = max(1, int(N_DOC * 0.0016))
for _ in range(n_dup):
    a, b = gd.integers(0, N_DOC, 2)
    texts[b] = texts[a]
# truncation families ~1%: b = a's text cut (or extended) at a token edge
n_trunc = max(2, int(N_DOC * 0.01))
for _ in range(n_trunc):
    a, b = gd.integers(0, N_DOC, 2)
    w = texts[a].split(" ")
    if len(w) > 20:
        texts[b] = " ".join(w[: gd.integers(15, len(w))])
write("documents", {
    "doc_id": pa.array(range(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(langs[lang_ix]),
    "source": pa.array([f"src{i}" for i in g.integers(0, 20, N_DOC)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})

g = rng("embeddings" if GEOM == "synthetic" else f"embeddings|{GEOM}")
labels = g.integers(0, 10, N_EMB).astype(np.int32)
centers = g.standard_normal((10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
if GEOM == "synthetic":
    # near-isotropic (within-label mean cos ~0.004, matches shipped sf0.1)
    E = g.standard_normal((N_EMB, 64)) / 8.0 + 0.063 / 8.0 * centers[labels] * 8.0
else:
    # CLUSTERED: the production-embedding geometry (LASER/encoder
    # outputs concentrate around semantic clusters) — within-CLUSTER
    # mean cos ~0.75 (unit signal + total noise power 1/3: cos =
    # 1/(1 + 1/3)), the regime where IVF holds recall at fixed probes
    # because neighbors co-reside. The semantic cluster is drawn
    # INDEPENDENTLY of the label: the label plays "language" in the
    # bitext queries, and aligned multilingual embeddings put
    # translations in the SAME semantic cluster across languages
    # (tying clusters to labels instead makes the two languages
    # disjoint point clouds and IVF candidate sets go EMPTY — measured
    # round 11, recorded in BASELINE.md as the label-aligned trap).
    # The adversarial isotropic default stays the stress test.
    sem = g.integers(0, 10, N_EMB)
    E = centers[sem] + g.standard_normal((N_EMB, 64)) * (1.0 / np.sqrt(3.0 * 64.0))
E /= np.linalg.norm(E, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": pa.array(range(N_EMB), pa.int64()),
    "embedding": pa.array([row for row in E.astype(np.float32)], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
})

print(f"done -> {OUT} (geometry={GEOM}, seed=md5('graft_sf|<table>|{sfs}" + ("" if GEOM == "synthetic" else f"|{GEOM}") + "'))")
