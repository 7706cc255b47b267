"""Deterministic synthetic-fixture generator matching the driver testdata shape.

The driver ships read-only fixtures at sf0.001/0.01/0.1 (TESTDATA.md). Every
100 TB claim in SCALING.md was, through round 6, design-audited at sf0.1 only;
this tool generates the SAME star schema at larger scale factors (sf1 = 10x
the bench scale: 6 M lineitem rows) so the full oracle sweep and bench can be
run one decade up and per-query scaling ratios measured (VERDICT r6, next-round
item 1).

Distributional shape mirrors the driver fixtures (measured from sf0.1):
key cardinalities scale linearly with sf; category sets, value ranges, the
per-order line-count distribution, the document vocabulary / dup rate, and the
clustered unit-norm embeddings keep the same shape. Exact provenance does NOT
matter for correctness — the sweep compares Spark vs DuckDB over the SAME
parquet files — and only shape parity matters for scaling ratios.

Usage:  python tools/gen_fixtures.py <sf> <outdir>     e.g. 1 .fixtures/sf1

Row counts at sf: customer 150k*sf, supplier 10k*sf, part 200k*sf,
orders 1.5M*sf, lineitem ~4x orders, events 1M*sf (15k*sf users),
documents 50k*sf, embeddings 20k*sf. Seed fixed at 42; all draws from one
numpy Generator so any (sf, outdir) pair is reproducible bit-for-bit.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["O", "F", "P"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PNOUNS = ["ring", "bolt", "screw", "washer", "nut", "gear", "rod", "plate"]
PADJS = ["large", "hot", "blue", "red", "small", "green", "dim", "shiny"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def _write(outdir: str, name: str, cols: dict, schema: pa.Schema) -> None:
    table = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _days(rng, n, start: str, end: str):
    lo = np.datetime64(start)
    span = int((np.datetime64(end) - lo) / np.timedelta64(1, "D"))
    return lo + rng.integers(0, span + 1, n).astype("timedelta64[D]")


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_user = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    ts_us = pa.timestamp("us")

    _write(outdir, "region",
           {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS},
           pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    _write(outdir, "nation",
           {"n_nationkey": np.arange(25, dtype=np.int32),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
           pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                      ("n_regionkey", pa.int32())]))

    _write(outdir, "customer",
           {"c_custkey": np.arange(n_cust, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": np.array(MKTSEGS)[rng.integers(0, 5, n_cust)]},
           pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                      ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                      ("c_mktsegment", pa.string())]))

    _write(outdir, "supplier",
           {"s_suppkey": np.arange(n_supp, dtype=np.int64),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2)},
           pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                      ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    adj = np.array(PADJS)[rng.integers(0, len(PADJS), n_part)]
    noun = np.array(PNOUNS)[rng.integers(0, len(PNOUNS), n_part)]
    _write(outdir, "part",
           {"p_partkey": np.arange(n_part, dtype=np.int64),
            "p_name": np.char.add(np.char.add(adj, " "), noun),
            "p_brand": np.char.add("Brand#", rng.integers(1, 26, n_part).astype(str)),
            "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
            "p_size": rng.integers(1, 51, n_part).astype(np.int32),
            "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2)},
           pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                      ("p_brand", pa.string()), ("p_type", pa.string()),
                      ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    odate = _days(rng, n_ord, "1995-01-01", "2001-08-01")
    _write(outdir, "orders",
           {"o_orderkey": np.arange(n_ord, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, n_ord),
            "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
            "o_orderdate": odate.astype("datetime64[us]"),
            "o_orderpriority": np.array(PRIOS)[rng.integers(0, 5, n_ord)]},
           pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                      ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                      ("o_orderdate", ts_us), ("o_orderpriority", pa.string())]))

    nlines = 1 + rng.poisson(3.0, n_ord)          # mean 4 lines/order, as measured
    lkey = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    n_li = int(nlines.sum())
    lnum = (np.arange(n_li) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1)
    sdate = (np.repeat(odate, nlines)
             + rng.integers(1, 96, n_li).astype("timedelta64[D]"))
    _write(outdir, "lineitem",
           {"l_orderkey": lkey,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": lnum.astype(np.int32),
            "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": rng.integers(0, 11, n_li) / 100.0,
            "l_tax": rng.integers(0, 9, n_li) / 100.0,
            "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
            "l_shipdate": sdate.astype("datetime64[us]")},
           pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                      ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                      ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                      ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                      ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                      ("l_shipdate", ts_us)]))

    # events: time-ordered over 30 days, exponential value (median ~35)
    span_us = 30 * 86_400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n_evt))
    ets = np.datetime64("2024-01-01") + ts.astype("timedelta64[us]")
    _write(outdir, "events",
           {"event_id": np.arange(n_evt, dtype=np.int64),
            "ts": ets,
            "user_id": rng.integers(0, n_user, n_evt),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
            "value": np.round(rng.exponential(50.0, n_evt), 2),
            "props": np.char.add(np.char.add('{"k": ',
                                 rng.integers(0, 100, n_evt).astype(str)), "}")},
           pa.schema([("event_id", pa.int64()), ("ts", ts_us),
                      ("user_id", pa.int64()), ("event_type", pa.string()),
                      ("value", pa.float64()), ("props", pa.string())]))

    # documents: bag-of-vocab texts, ~0.2% exact dups + ~0.3% near-dups
    nw = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    words = vocab[rng.integers(0, len(vocab), int(nw.sum()))]
    offs = np.concatenate([[0], np.cumsum(nw)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    for i in rng.choice(n_doc, max(1, n_doc // 500), replace=False):
        j = int(rng.integers(0, n_doc))
        if i != j:
            texts[int(i)] = texts[j]                       # exact dup
    for i in rng.choice(n_doc, max(1, (3 * n_doc) // 1000), replace=False):
        j = int(rng.integers(0, n_doc))
        if i != j:
            toks = texts[j].split()
            toks[int(rng.integers(0, len(toks)))] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts[int(i)] = " ".join(toks)                 # near dup
    _write(outdir, "documents",
           {"doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
            "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))

    # embeddings: 64-dim unit-norm vectors clustered on 10 label centroids
    cent = rng.standard_normal((10, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = cent[labels] + 0.25 * rng.standard_normal((n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(outdir, "embeddings",
           {"vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": list(vecs),
            "label": labels.astype(np.int32)},
           pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())]))

    with open(os.path.join(outdir, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "generator": "tools/gen_fixtures.py"}, f)


def generate_documents_only(sf: float, outdir: str, seed: int = 42,
                            mode: str = "heaps") -> None:
    """Documents-ONLY fixture, two vocabulary regimes:

    ``mode="heaps"`` — Heaps'-law growing vocabulary with a Zipfian unigram
    distribution, the adversarially-realistic counterpart to the base
    fixture's fixed 31-word vocab (which manufactures Σdf² ∝ N² for the
    exact-Jaccard family, VERDICT r8 item 3). Vocabulary size V = 3·√T for
    T total tokens (Heaps β = 0.5, K = 3 — mid-range of published English
    estimates of K ∈ [10, 100] at β ≈ 0.4-0.6 once T is tokens not
    characters); word probabilities Zipf rank⁻¹. This is deliberately NOT a
    uniform draw over the growing vocab: real corpora keep a Zipf head, so
    the hottest 3-gram shingle's df still grows ∝ N and the measurement
    shows what vocabulary growth does and does NOT buy the Σdf²-shaped
    inverted-index joins.

    ``mode="fixed"`` — the base fixture's fixed 31-word uniform vocabulary,
    for growing the documents table past the full-fixture scales (the
    capped-dedup sf3→sf10 decade, VERDICT r8 item 6) without paying for
    15M-row orders tables nobody reads. NOTE: same distributional shape as
    ``generate()``'s documents but NOT byte-identical at the same sf (the
    full generator's rng state has advanced through the other tables).

    Same exact-dup (~0.2%) and near-dup (~0.3%) injection as the base
    fixture so the dedup queries return non-trivial pair sets. Other tables
    are absent on purpose — Catalog resolves lazily and the exact-dedup
    family reads only ``documents``.
    """
    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)
    n_doc = int(50_000 * sf)
    nw = rng.integers(10, 101, n_doc)
    total = int(nw.sum())
    if mode == "heaps":
        v = max(31, int(round(3.0 * total ** 0.5)))
        p = 1.0 / np.arange(1, v + 1, dtype=np.float64)
        p /= p.sum()
        vocab = np.array([f"w{i}" for i in range(v)])
        words = vocab[rng.choice(v, total, p=p)]
    elif mode == "fixed":
        vocab = np.array(VOCAB)
        v = len(vocab)
        words = vocab[rng.integers(0, v, total)]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    offs = np.concatenate([[0], np.cumsum(nw)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    for i in rng.choice(n_doc, max(1, n_doc // 500), replace=False):
        j = int(rng.integers(0, n_doc))
        if i != j:
            texts[int(i)] = texts[j]                       # exact dup
    for i in rng.choice(n_doc, max(1, (3 * n_doc) // 1000), replace=False):
        j = int(rng.integers(0, n_doc))
        if i != j:
            toks = texts[j].split()
            toks[int(rng.integers(0, len(toks)))] = str(vocab[int(rng.integers(0, v))])
            texts[int(i)] = " ".join(toks)                 # near dup
    _write(outdir, "documents",
           {"doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
            "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
           pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                      ("lang", pa.string()), ("source", pa.string()),
                      ("n_chars", pa.int64())]))
    print(f"  {mode} vocab: {v} words for {total} tokens")
    with open(os.path.join(outdir, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "mode": f"{mode}-documents",
                   "vocab": v, "generator": "tools/gen_fixtures.py"}, f)


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = ("heaps" if "--heaps" in flags
            else "fixed" if "--docs-only" in flags else None)
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else (
        f".fixtures/{mode}-sf{sf:g}" if mode else f".fixtures/sf{sf:g}")
    label = f" ({mode} documents-only)" if mode else ""
    print(f"generating sf={sf:g}{label} -> {out}")
    if mode:
        generate_documents_only(sf, out, mode=mode)
    else:
        generate(sf, out)
