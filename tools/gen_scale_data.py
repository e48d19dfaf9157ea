"""Deterministic scale-factor data generator for the sf1+ scale gate.

Reproduces the driver's testdata discipline (TESTDATA.md: seed-42
deterministic synthetic TPC-H-ish star schema + events/documents/
embeddings) at scale factors the driver does not ship, with IDENTICAL
schemas (column names, arrow types, column order — verified by
tests/test_generated_data.py-style schema asserts in tools/scale_gate.py)
and the same per-table scaling rules observed across sf0.001/0.01/0.1:

    customer 150k*sf   supplier 10k*sf    part 200k*sf
    orders   1.5M*sf   lineitem ~6M*sf    events 1M*sf
    documents 50k*sf   embeddings 20k*sf  (region 5 / nation 25 fixed)

One deliberate, documented divergence: ``documents`` text draws from a
~4,000-token Zipf vocabulary instead of the driver's 31-word toy vocab.
At 500-5,000 docs the toy vocab is harmless, but at 50k+ docs every
3-gram shingle becomes a corpus-wide hot key and the dedup scale test
degenerates into an all-pairs corner no real corpus exhibits (real text
has Zipf vocabulary; near-dup pairs come from shared PASSAGES, not from
a 31-word closed lexicon). The generator injects explicit duplicate
structure instead — 5% exact copies + 5% near-dup perturbations — which
is the workload shape the dedup operators exist for. Everything else
(langs/sources/length distribution, n_chars = len(text)) mirrors the
driver's tables.

Usage: python tools/gen_scale_data.py [sf] [out_dir]
       (defaults: sf=1, out_dir=<repo>/scaledata/sf{sf})

Pure numpy+pyarrow — no Spark needed; sf1 generates in ~1 min.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "MACHINERY", "FURNITURE", "BUILDING", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "error", "click", "view", "purchase"]
PART_ADJ = ["small", "red", "blue", "hot", "cold", "big", "green", "dim", "pale", "dark"]
PART_NOUN = ["ring", "widget", "bolt", "gear", "cog", "pipe", "valve", "disk", "lens", "coil"]
PART_TYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _ts_us(iso: str) -> int:
    return np.datetime64(iso, "us").astype(np.int64)


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("datetime64[us]"))


def gen_all(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, table: pa.Table) -> None:
        # bounded row groups: a real distributed writer emits many row
        # groups/files, and Spark's scan splits need row-group
        # boundaries to parallelize a single file. One giant row group
        # (pyarrow's default for <64Mi rows) serializes every map stage
        # over the table into one task.
        rg = max(4096, table.num_rows // 64)
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=rg
        )
        print(f"  {name}: {table.num_rows} rows")

    # --- region / nation (fixed) ------------------------------------
    write(
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
                "r_name": pa.array(REGIONS),
            }
        ),
    )
    write(
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
            }
        ),
    )

    # --- customer ----------------------------------------------------
    n_cust = int(150_000 * sf)
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(0, 10_000, n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )

    # --- supplier ----------------------------------------------------
    n_supp = int(10_000 * sf)
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32)
                ),
                "s_acctbal": pa.array(np.round(rng.uniform(0, 10_000, n_supp), 2)),
            }
        ),
    )

    # --- part --------------------------------------------------------
    n_part = int(200_000 * sf)
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
                "p_name": pa.array([f"{a} {n}" for a, n in zip(adj, noun)]),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]
                ),
                "p_type": pa.array(np.array(PART_TYPES)[rng.integers(0, 5, n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
                # driver's own formula (900.0, 900.1, ... by key)
                "p_retailprice": pa.array(
                    np.round(900.0 + 0.1 * np.arange(n_part), 1)
                ),
            }
        ),
    )

    # --- orders ------------------------------------------------------
    n_ord = int(1_500_000 * sf)
    d0, d1 = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    odate_us = (
        d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, n_ord) * DAY_US
    )
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_ord)),
                "o_orderstatus": pa.array(
                    np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1_000, 500_000, n_ord), 2)
                ),
                "o_orderdate": _ts_col(odate_us),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )

    # --- lineitem (1 + Poisson(3) lines per order, driver-like avg 4) -
    # Clamped to <= 7 lines: the driver testdata / TPC-H cap is
    # l_linenumber <= 7 (verified max 7 at sf0.1), and the synthetic
    # row id l_orderkey*8 + l_linenumber used by skew_zipf_join is only
    # collision-free under that cap.
    per_order = np.minimum(1 + rng.poisson(3.0, n_ord), 7)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    l_odate = np.repeat(odate_us, per_order)
    n_li = len(l_orderkey)
    linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(per_order) - per_order, per_order) + 1
    ).astype(np.int32)
    l_partkey = rng.integers(0, n_part, n_li)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    retail = 900.0 + 0.1 * l_partkey
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_orderkey),
                "l_partkey": pa.array(l_partkey),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li)),
                "l_linenumber": pa.array(linenumber),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(
                    np.round(qty * retail * rng.uniform(0.5, 1.0, n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, n_li) * 0.01, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts_col(
                    l_odate + rng.integers(1, 96, n_li) * DAY_US
                ),
            }
        ),
    )

    # --- events ------------------------------------------------------
    n_ev = int(1_000_000 * sf)
    n_users = max(n_ev // 67, 1)
    e0 = _ts_us("2024-01-01")
    ev_ts = np.sort(e0 + rng.integers(0, 30 * DAY_US, n_ev))
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
                "ts": _ts_col(ev_ts),
                "user_id": pa.array(rng.integers(0, n_users, n_ev)),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": pa.array(
                    np.round(
                        np.clip(rng.exponential(50.0, n_ev), 0.01, 490.02), 2
                    )
                ),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
                ),
            }
        ),
    )

    # --- documents (Zipf vocab + injected dup structure) --------------
    n_doc = int(50_000 * sf)
    vocab_n = 4_000
    # Zipf-weighted token frequencies; head includes common stopwords so
    # stopword/quality text queries see realistic ratios
    head = ["the", "a", "of", "and", "to", "in", "is", "data", "value", "table"]
    vocab = np.array(head + [f"w{i:04d}" for i in range(vocab_n - len(head))])
    w = 1.0 / np.arange(1, vocab_n + 1) ** 1.1
    w /= w.sum()
    n_base = n_doc - 2 * (n_doc // 20)  # 90% base, 5% exact, 5% near
    lens = rng.integers(8, 101, n_base)
    toks = rng.choice(vocab, size=int(lens.sum()), p=w)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(toks[offs[i] : offs[i + 1]]) for i in range(n_base)]
    # 5% exact duplicates of random base docs
    for src in rng.integers(0, n_base, n_doc // 20):
        texts.append(texts[src])
    # 5% near-dups: perturb ~10% of tokens of a random base doc
    for src in rng.integers(0, n_base, n_doc - len(texts)):
        t = texts[src].split(" ")
        n_mut = max(len(t) // 10, 1)
        for j in rng.integers(0, len(t), n_mut):
            t[j] = vocab[rng.integers(0, vocab_n)]
        texts.append(" ".join(t))
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
                "source": pa.array(
                    [f"src{i}" for i in rng.integers(0, 20, n_doc)]
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64)
                ),
            }
        ),
    )

    # --- embeddings (10 weak unit-norm Gaussian clusters, float32) ----
    # Cluster noise 3.0 puts same-cluster cosine at ~0.1 — the driver's
    # own corpus is near-orthogonal (measured on testdata sf0.1:
    # same-label avg cos 0.0012, max 0.43), so the scale data mirrors
    # that. (Earlier cuts used noise 0.35 / 0.8 → same-cluster cos
    # 0.89 / 0.6: whole clusters sat at or near the near-dup threshold
    # and the true pair set itself was quadratic — a property neither
    # the driver corpus nor any real embedding corpus has.) Near-dup
    # structure is injected explicitly instead: 5% of vectors are
    # near-copies (cos ~0.999) of a random earlier vector — the
    # workload shape embedding dedup exists for.
    n_vec = int(20_000 * sf)
    dim = 64
    centers = rng.normal(size=(10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, 10, n_vec).astype(np.int32)
    x = centers[label] + 3.0 * rng.normal(size=(n_vec, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    n_near = n_vec // 20
    src_idx = rng.integers(0, n_vec - n_near, n_near)
    dst_idx = np.arange(n_vec - n_near, n_vec)
    x[dst_idx] = x[src_idx] + 0.03 * rng.normal(size=(n_near, dim))
    x[dst_idx] /= np.linalg.norm(x[dst_idx], axis=1, keepdims=True)
    label[dst_idx] = label[src_idx]
    x = x.astype(np.float32)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
                "embedding": pa.array(list(x), type=pa.list_(pa.float32())),
                "label": pa.array(label),
            }
        ),
    )


def main() -> int:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    sf_name = f"{sf:g}"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "scaledata", f"sf{sf_name}")
    )
    print(f"generating sf{sf_name} -> {out_dir}")
    gen_all(sf, out_dir)
    return 0


if __name__ == "__main__":
    main()
