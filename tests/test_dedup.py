"""Dedup operator semantics on hand-built corpora."""

from __future__ import annotations

import pytest

from gibbon_spark.operators import dedup

DOCS = [
    # 0 and 1: exact duplicates modulo whitespace/case
    (0, "The quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick  brown fox jumps over the lazy dog near the river bank"),
    # 2: near-dup of 0 (one word changed)
    (2, "The quick brown fox jumps over the lazy cat near the river bank"),
    # 3: unrelated
    (3, "completely different content about spark engines and parquet files here"),
    # 4: another unrelated
    (4, "yet another document with totally distinct vocabulary and no overlap at all"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = {
        r.representative: r.n_copies
        for r in dedup.exact_dedup_groups(_docs_df(spark)).collect()
    }
    assert out[0] == 2  # docs 0,1 collapse (case/whitespace normalized)
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_drop_exact_duplicates_keeps_min_id(spark):
    kept = sorted(
        r.doc_id for r in dedup.drop_exact_duplicates(_docs_df(spark)).collect()
    )
    assert kept == [0, 2, 3, 4]


def test_jaccard_finds_near_dup_pair(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(_docs_df(spark), threshold=0.3).collect()
    }
    assert (0, 2) in pairs  # one-word edit → high shingle overlap
    assert all(3 not in p and 4 not in p for p in pairs)  # unrelated docs excluded
    assert pairs[(0, 1)] > 0.7  # case diff at shingle level keeps it below 1.0


def test_jaccard_prefix_equals_naive(spark):
    """The prefix-filtered join must be LOSSLESS: identical pairs and
    values to the naive inverted-index join, at several thresholds."""
    docs = _docs_df(spark)
    for t in (0.3, 0.5, 0.7):
        naive = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_pairs_prefix(docs, threshold=t).collect()
        }
        assert pref == naive, f"threshold {t}: {pref} != {naive}"


def test_jaccard_prefix_positional_boundary(spark):
    """The r12 PPJoin positional filter must keep pairs whose overlap
    sits EXACTLY at the α = ⌈t·(|A|+|B|)/(1+t)⌉ bound (the tightest
    case the prune is allowed to touch). Unigram shingles (n=1) make
    the shingle sets equal the token sets, so overlaps are crafted
    exactly: (|A|, |B|, |∩|) cases at, just above, and just below the
    t = 0.5 boundary."""
    # tokens are globally unique unless shared on purpose
    cases = [
        # (nA, nB, n_inter) -> expect J = inter/(nA+nB-inter) vs 0.5
        (3, 3, 2),  # J = 0.5  exactly -> kept (alpha = 2, bound tight)
        (4, 4, 3),  # J = 0.6         -> kept
        (4, 4, 2),  # J = 1/3         -> dropped
        (4, 2, 2),  # J = 0.5 exactly, size-ratio boundary -> kept
        (6, 2, 2),  # J = 1/3         -> dropped (size-ratio prunes too)
    ]
    rows = []
    expected = {}
    for ci, (na, nb, ni) in enumerate(cases):
        shared = [f"s{ci}x{j}" for j in range(ni)]
        a_toks = shared + [f"a{ci}x{j}" for j in range(na - ni)]
        b_toks = shared + [f"b{ci}x{j}" for j in range(nb - ni)]
        ida, idb = 1000 * ci, 1000 * ci + 1
        rows.append((ida, " ".join(a_toks)))
        rows.append((idb, " ".join(b_toks)))
        j = ni / (na + nb - ni)
        if j >= 0.5:
            expected[(ida, idb)] = round(j, 6)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pref = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs_prefix(docs, n=1, threshold=0.5).collect()
    }
    naive = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, n=1, threshold=0.5).collect()
    }
    assert pref == naive == expected


def test_jaccard_prefix_hot_shingle_excluded(spark):
    """A boilerplate shingle shared by every doc must not create
    candidates between otherwise-unrelated docs: the prefix index
    ranks it last (max df), so disjoint-content docs never meet."""
    boiler = "all rights reserved worldwide"
    rows = [
        (i, f"unique{i}a unique{i}b unique{i}c unique{i}d {boiler}")
        for i in range(20)
    ]
    # one true near-dup pair on top of the boilerplate corpus
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs_prefix(docs, threshold=0.5).collect()
    }
    naive = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert out == naive
    assert (100, 101) in out
    assert all(a >= 100 for a, _ in out)  # no boilerplate-only pairs


def test_minhash_lsh_finds_near_dup_pair(spark):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(_docs_df(spark), min_est=0.3).collect()
    }
    # the high-sim pair must band-collide; (0,2) at j≈0.57 may or may not
    # (that selectivity is the LSH tradeoff — jaccard_pairs catches it)
    assert (0, 1) in pairs
    assert pairs[(0, 1)] >= 0.5  # k=12 estimator variance around true j≈0.83
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_pairs_near_dups_only(spark):
    """60-bit simhash at its operating point: documents long enough
    that a one-word edit is a SMALL fraction of the shingle set (the
    Manku-style near-dup definition). The 13-token DOCS corpus above is
    below that point — a one-word edit there changes ~25% of shingles,
    which is 'different documents' to a 60-bit simhash (correctly)."""
    base = " ".join(f"tok{i}" for i in range(150))
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base.replace("tok75", "changed")),  # 1 edit in 150 tokens
            (3, "completely different content about spark engines and parquet files here today"),
            (4, "yet another document with totally distinct vocabulary and no overlap at all now"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert all((3 not in p and 4 not in p) for p in pairs)


def test_simhash_pairs_rejects_unguaranteed_radius(spark):
    """The 4-chunk banding pigeonhole only covers hamming <= 3; larger
    radii would silently under-recall, so they must be rejected."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(_docs_df(spark), max_hamming=8)


def test_minhash_estimates_jaccard(spark):
    """est_jaccard from signatures should track exact jaccard for the
    near-identical pair (both ≈ 1)."""
    sigs = dedup.minhash_signatures(_docs_df(spark), num_hashes=12)
    rows = {r.id: [r[f"sig_{i}"] for i in range(12)] for r in sigs.collect()}
    matches = sum(a == b for a, b in zip(rows[0], rows[1]))
    assert matches >= 7  # docs 0/1: high but not full overlap (case-sensitive shingles)


def test_connected_components_transitive(spark):
    """A~B, B~C, C~D chain collapses to one component labeled by the min
    id; disjoint pair stays separate; convergence needs > 1 round
    (diameter 3)."""
    from gibbon_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_lsh_cross_pairs_incoming_vs_index_only(spark):
    """Cross-set candidates: near-identical docs across the two sets are
    found regardless of id order; within-set twins are NOT paired."""
    from gibbon_spark.operators.dedup import (
        lsh_candidate_pairs_cross,
        minhash_signatures,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    incoming = spark.createDataFrame(
        [(100, base), (5, base + " extra"), (7, "totally different words here now")],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [(1, base), (2, base), (3, "unrelated corpus entry nothing shared")],
        "doc_id long, text string",
    )
    pairs = lsh_candidate_pairs_cross(
        minhash_signatures(incoming), minhash_signatures(index)
    ).filter("est_jaccard >= 0.5")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # id_a always from incoming (even when its id is LARGER than the match),
    # id_b always from index; the (1,2) within-index twin pair is absent.
    assert (100, 1) in got and (100, 2) in got
    assert all(a in (100, 5, 7) and b in (1, 2, 3) for a, b in got)
    assert not any(a == 7 for a, _ in got)


def test_lsh_bucket_cap_drops_hot_buckets_only(spark):
    """max_bucket must drop candidates that come ONLY from over-sized
    buckets, leave everything else identical, and stay a subset."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(12)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta"),
        (101, "alpha beta gamma delta epsilon zeta"),
        (200, "completely unrelated words in this one here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs, num_hashes=4)
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sigs, num_hashes=4, bands=2).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(
            sigs, num_hashes=4, bands=2, max_bucket=4
        ).collect()
    }
    assert capped <= uncapped
    # the 12-doc boilerplate clique (66 pairs) is gone...
    assert not any(a < 100 and b < 100 for a, b in capped)
    assert any(a < 100 and b < 100 for a, b in uncapped)
    # ...but the small exact-dup pair survives the cap
    assert (100, 101) in capped


def test_lsh_cross_cap_combined_count(spark):
    """lsh_candidate_pairs_cross caps by the COMBINED (batch + index)
    bucket count: a bucket that is small on each side but hot overall
    is dropped; normal pairs survive."""
    hot = "the same boilerplate text repeated everywhere"
    batch = spark.createDataFrame(
        [(100 + i, hot) for i in range(6)]
        + [(200, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [(i, hot) for i in range(6)]
        + [(50, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    sa = dedup.minhash_signatures(batch, num_hashes=4)
    sb = dedup.minhash_signatures(index, num_hashes=4)
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs_cross(
            sa, sb, num_hashes=4, bands=2
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs_cross(
            sa, sb, num_hashes=4, bands=2, max_bucket=8
        ).collect()
    }
    assert capped <= uncapped
    # hot bucket: 6 batch + 6 index = 12 members > 8 -> dropped even
    # though each side alone (6) is under the cap
    assert not any(a >= 100 and a < 200 for a, _ in capped)
    assert any(a >= 100 and a < 200 for a, _ in uncapped)
    # the small cross pair survives
    assert (200, 50) in capped


def test_lsh_band_stats_exact_counts(spark):
    """Integer-exact per-band bucket profile on a corpus with a known
    clique: 5 identical docs band to one bucket per band, so each band
    must report max_size >= 5 and >= 10 pairs; thresholds cut exactly
    the pair mass of over-sized buckets."""
    rows = [(i, "same text for the whole clique of documents") for i in range(5)]
    rows += [(10 + i, f"unique document number {i} with its own words entirely") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r.band: r for r in dedup.lsh_band_stats(
        docs, size_thresholds=(2, 4)
    ).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for band, r in stats.items():
        assert r.max_size >= 5
        assert r.total_pairs >= 10
        # a cap at 4 cuts the 5-clique's 10 pairs (and any larger bucket)
        assert r.pairs_cut_at_4 >= 10
        assert r.pairs_cut_at_2 >= r.pairs_cut_at_4
        # singletons + multi-member buckets account for all buckets
        assert r.n_singleton <= r.n_buckets


@pytest.mark.slow
def test_lsh_cap_recall_budget_sf1(spark):
    """Contract test for the LSH_MAX_BUCKET cap (r9 verdict ask #6):
    the cap is a RECALL trade, and its cost must stay inside a stated
    budget instead of drifting silently as corpora grow. At sf1 (50k
    docs, the generated scale corpus) the pair mass a max_bucket=64 cap
    would cut must be <= 0.1% of the total candidate-pair mass across
    bands (measured: 0 through sf3; the cap first binds at sf10 at
    ~0.03% — SCALE.md telemetry). If this fails, the corpus shape
    changed: re-run lsh_band_stats, re-pick the cap from the new
    telemetry, and update SCALE.md — do not just raise the budget.

    Generates scaledata/sf1 via tools/gen_scale_data.py on first run
    (deterministic, ~1 min; marked slow for that reason — deselect with
    -m "not slow" in a quick loop); later runs reuse the cached
    parquet."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = os.path.join(repo, "scaledata", "sf1")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        # capture output so a cold-runner generation failure surfaces in
        # the assertion message instead of an opaque CalledProcessError
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "gen_scale_data.py"),
             "1", sf1],
            cwd=repo, timeout=600, capture_output=True, text=True,
        )
        assert proc.returncode == 0, (
            f"sf1 generation failed (rc={proc.returncode}):\n"
            f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
        )
    docs = spark.read.parquet(os.path.join(sf1, "documents.parquet"))
    stats = dedup.lsh_band_stats(
        docs, size_thresholds=(dedup.LSH_MAX_BUCKET,)
    ).collect()
    total = sum(r.total_pairs for r in stats)
    cut = sum(r[f"pairs_cut_at_{dedup.LSH_MAX_BUCKET}"] for r in stats)
    assert total > 0
    # stated budget: 0.1% of candidate-pair mass
    assert cut <= 0.001 * total, (
        f"LSH cap now cuts {cut}/{total} pairs "
        f"({100.0 * cut / total:.3f}%) at sf1 — over the 0.1% budget"
    )


def test_verify_elem_hash_path_is_exact(spark):
    """r12 hashed verify arrays: the xxhash64 element path must produce
    the SAME intersection sizes as the string path (injectivity is
    checked per run; on this vocabulary the hash path is chosen)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    sh = dedup.shingle_table(docs, id_col="doc_id", text_col="text", n=3)
    elem = dedup._verify_elem(sh)
    # the driver vocabulary is tiny — the injectivity check must pick
    # the 8-byte hash element here
    assert "xxhash64" in str(elem).lower()
    arrs_h = sh.groupBy("id").agg(F.collect_list(elem).alias("a"))
    arrs_s = sh.groupBy("id").agg(F.collect_list("shingle").alias("a"))
    pairs_h = (
        arrs_h.alias("x")
        .join(arrs_h.alias("y"), F.col("x.id") < F.col("y.id"))
        .select(
            "x.id",
            F.col("y.id").alias("id2"),
            F.size(F.array_intersect("x.a", "y.a")).alias("ni"),
        )
    )
    pairs_s = (
        arrs_s.alias("x")
        .join(arrs_s.alias("y"), F.col("x.id") < F.col("y.id"))
        .select(
            "x.id",
            F.col("y.id").alias("id2"),
            F.size(F.array_intersect("x.a", "y.a")).alias("ni"),
        )
    )
    h = {(r["id"], r["id2"]): r["ni"] for r in pairs_h.collect()}
    s = {(r["id"], r["id2"]): r["ni"] for r in pairs_s.collect()}
    assert h == s
