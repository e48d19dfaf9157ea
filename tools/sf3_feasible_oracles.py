"""Feasible sf3 oracles for the six queries whose DELIBERATELY-NAIVE
oracles exceed the container at sf3 (round-4 verdict ask #6).

The registered queries themselves are scale-clean at sf3 (timed,
flag-free — SCALE.md); only the naive DuckDB restatements blow the box
(all-pairs joins / recursive CTE / 3-way edge join). This tool verifies
the REGISTERED query's FULL sf3 output with restatements that are exact
but bounded:

- dedup_containment, sim_embedding_neardup, sim_embedding_neardup_exact:
  pair membership and the pair's score depend ONLY on the two endpoint
  rows, so the full Spark output filtered to pairs with BOTH endpoints
  in a deterministic md5-sampled id subset must equal the naive oracle
  run over the subsetted source table (same md5 bucket predicate in
  SQL). Verifies the actual sf3 output rows bit-for-bit on the subset.
- knn_graph_lsh: a vector's top-k depends on ALL candidates, so the
  subset is asymmetric — md5-sampled QUERY vectors, FULL candidate
  corpus (per-band hash joins instead of the naive 32-way OR join,
  which is what exceeds the non-spillable buffer cap). Verifies the
  sampled vectors' full-corpus neighbor lists exactly.
- dedup_clusters_cc: FULL exact check — the naive recursive CTE is
  replaced by Python-driven min-label propagation over the identical
  md5-deterministic capped-LSH edge table (each round one grouped
  join, spillable; converges in O(cluster diameter) rounds, the same
  argument as operators.dedup.connected_components).
- graph_triangle_count: FULL exact check — the 3-way edge join is
  blocked on hash buckets of the first vertex (bounded intermediates
  per block), per-vertex triangle counts accumulated across blocks.

Usage: python tools/sf3_feasible_oracles.py <sf_dir> <query> [subset_pct]
Run ONE query per process (round-4 sf3 protocol: one 48g JVM + one
capped DuckDB per process; GS_ORACLE_DUCK_MEM=40GB for sf3).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from oracle_check import compare, duck_connection  # noqa: E402

SUBSET_PCT = {
    "dedup_containment": 10,
    "sim_embedding_neardup": 20,
    "sim_embedding_neardup_exact": 10,
    "knn_graph_lsh": 2,
    "dedup_ngram_jaccard": 5,
}


def _pred_sql(col: str, pct: int) -> str:
    return (
        f"('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))::INTEGER "
        f"% 100 < {pct}"
    )


def _in_subset(i: int, pct: int) -> bool:
    return int(hashlib.md5(str(int(i)).encode()).hexdigest()[:4], 16) % 100 < pct


def _subset_table_sql(sql: str, table: str, id_col: str, pct: int) -> str:
    """Replace every `FROM <table>` with the md5-subsetted inline view —
    exact for queries whose output rows are pairwise-determined."""
    needle = f"FROM {table}"
    assert needle in sql, f"oracle SQL has no '{needle}'"
    repl = (
        f"FROM (SELECT * FROM {table} "
        f"WHERE {_pred_sql(id_col, pct)}) {table}"
    )
    return sql.replace(needle, repl)


def _spark_result(name: str, sf_dir: str) -> pd.DataFrame:
    import __spark_entry__ as entrymod

    return entrymod.queries()[name](entrymod_spark(), sf_dir).toPandas()


_SPARK = None


def entrymod_spark():
    global _SPARK
    if _SPARK is None:
        from gibbon_spark.session import get_spark

        _SPARK = get_spark("sf3_feasible_oracles")
    return _SPARK


def _report(name: str, tag: str, problems: list[str], n: int, t0: float) -> int:
    dt = time.time() - t0
    if problems:
        print(f"FAIL {name} [{tag}] ({n} rows, {dt:.1f}s)")
        for p in problems:
            print(f"     {p}")
        return 1
    print(f"PASS {name} [{tag}] ({n} rows, {dt:.1f}s)")
    return 0


def check_pairwise_subset(name: str, sf_dir: str, pct: int) -> int:
    """containment / neardup / neardup_exact: full Spark run, subset
    compare (both endpoints sampled)."""
    import __spark_entry__ as entrymod

    t0 = time.time()
    spark_pdf = _spark_result(name, sf_dir)
    a_col, b_col = {
        "dedup_containment": ("id_contained", "id_container"),
        "sim_embedding_neardup": ("id_a", "id_b"),
        "sim_embedding_neardup_exact": ("id_a", "id_b"),
        "dedup_ngram_jaccard": ("id_a", "id_b"),
    }[name]
    keep = (
        spark_pdf[a_col].map(lambda i: _in_subset(i, pct))
        & spark_pdf[b_col].map(lambda i: _in_subset(i, pct))
    ).astype(bool)  # empty frames map to object dtype -> column selection
    spark_sub = spark_pdf[keep].reset_index(drop=True)

    table, id_col = (
        ("documents", "doc_id")
        if name in ("dedup_containment", "dedup_ngram_jaccard")
        else ("embeddings", "vec_id")
    )
    sql = _subset_table_sql(entrymod.oracle_sql()[name], table, id_col, pct)
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    return _report(
        name,
        f"both-endpoints md5 subset {pct}%",
        compare(name, spark_sub, duck_pdf),
        len(spark_sub),
        t0,
    )


def check_knn_subset(name: str, sf_dir: str, pct: int) -> int:
    """knn_graph_lsh: sampled query vectors vs the FULL candidate
    corpus; per-band hash joins replace the naive 32-way OR join.

    Two-phase option (GS_SF3_PHASE): at sf3 the Spark JVM (grown to
    tens of GB by the graph build) plus DuckDB's hash-join build exceed
    the box even with a 56GB duck cap — run `GS_SF3_PHASE=spark` (saves
    the subsetted Spark result to /tmp/gs_knn_spark.parquet and exits,
    freeing the JVM) then `GS_SF3_PHASE=duck` (duck-only process with
    the whole box for the oracle)."""
    from gibbon_spark.operators import similarity
    from gibbon_spark.queries_llm import _COSINE_SQL

    phase = os.environ.get("GS_SF3_PHASE", "")
    # cache name embeds the run's provenance (sf_dir + subset pct) so the
    # duck phase cannot silently validate a stale cache from an earlier
    # round, another sf_dir, or a different pct — that would be a false
    # PASS/FAIL masquerading as scale evidence
    tag = f"{sf_dir.rstrip('/').rsplit('/', 1)[-1]}_pct{pct}"
    cache = f"/tmp/gs_knn_spark_{tag}.parquet"
    t0 = time.time()
    if phase == "duck":
        if not os.path.exists(cache):
            print(
                f"FAIL {name}: duck phase found no cache for {tag} at {cache} "
                "— run GS_SF3_PHASE=spark first with the same sf_dir/pct"
            )
            return 1
        spark_sub = pd.read_parquet(cache)
    else:
        spark_pdf = _spark_result(name, sf_dir)
        keep = spark_pdf["src"].map(lambda i: _in_subset(i, pct)).astype(bool)
        spark_sub = spark_pdf[keep].reset_index(drop=True)
        if phase == "spark":
            spark_sub.to_parquet(cache)
            print(f"spark phase done: {len(spark_sub)} rows -> {cache} "
                  f"({time.time()-t0:.1f}s)")
            return 0

    # Planes as a TABLE + list_dot_product, not inline ±v[1]±...±v[64]
    # chains: the expression form (512 planes x 64 terms = 32k-node
    # trees from _lsh_band_exprs) OOM-killed DuckDB at sf3 even with a
    # 90 GB cap and no JVM present, while the relational form streams.
    # Long-form banding also folds the 32-way UNION into ONE join with
    # band_idx in the key — identical candidate set.
    band_bits = similarity.NEARDUP_BAND_BITS
    signs = similarity.plane_signs(similarity.NEARDUP_PLANES, 64)
    plane_rows = ", ".join(
        f"({p}, [{', '.join(str(float(w)) for w in signs[p])}]::DOUBLE[])"
        for p in range(similarity.NEARDUP_PLANES)
    )
    pred_a = _pred_sql("a.vec_id", pct)
    pred_b = _pred_sql("b.vec_id", pct)
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    planes(plane_id, w) AS (VALUES {plane_rows}),
    dots AS (
      SELECT e.vec_id, p.plane_id // {band_bits} AS band_idx,
             CASE WHEN list_dot_product(e.v, p.w) >= 0
                  THEN (1 << (p.plane_id % {band_bits})) ELSE 0 END AS bit
      FROM e, planes p
    ),
    bands AS MATERIALIZED (
      SELECT vec_id, band_idx, CAST(sum(bit) AS BIGINT) AS band_val
      FROM dots GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        AND a.vec_id < b.vec_id
      WHERE ({pred_a}) OR ({pred_b})
    ),
    sym AS (
      SELECT id_a AS src, id_b AS nbr FROM cand
        WHERE {_pred_sql('id_a', pct)}
      UNION ALL
      SELECT id_b AS src, id_a AS nbr FROM cand
        WHERE {_pred_sql('id_b', pct)}
    ),
    scored AS (
      SELECT s.src, s.nbr, {_COSINE_SQL} AS cosine_sim
      FROM sym s JOIN e a ON s.src = a.vec_id JOIN e b ON s.nbr = b.vec_id
    )
    SELECT src, nbr, cosine_sim, rank FROM (
      SELECT src, nbr, cosine_sim,
             row_number() OVER (PARTITION BY src
                                ORDER BY cosine_sim DESC, nbr) AS rank
      FROM scored
    ) WHERE rank <= 3
    """
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    return _report(
        name,
        f"src md5 subset {pct}%, FULL candidate corpus",
        compare(name, spark_sub, duck_pdf),
        len(spark_sub),
        t0,
    )


def _build_sigs_chunked(con, chunks: int) -> None:
    """Materialize the per-doc MinHash signature table in ``chunks``
    doc_id-sliced passes (round-11 sf10 restatement path,
    SCALE_ORACLE_SF10.txt): the one-shot sigs aggregate expands ~100M
    shingles × 12 md5s and spilled >75 GB at sf10 (disk-full at a 28 GB
    memory cap). min() per doc is independent across docs, so GROUP BY
    slices of ``doc_id % chunks`` are EXACT — each slice expands only
    1/chunks of the corpus (the WHERE is injected into the innermost
    documents scan, before the split/unnest), bounding the spill to
    roughly the sf1-scale regime per slice. The signature and shingle
    expressions are the same generator strings as the registered oracle
    (_minhash_sig_cols / _SHINGLE_CTE), so the hash family cannot
    drift."""
    from gibbon_spark.queries_llm import _SHINGLE_CTE, _minhash_sig_cols

    sig_cols = _minhash_sig_cols()
    for i in range(chunks):
        sliced = _SHINGLE_CTE.replace(
            "FROM documents", f"FROM documents WHERE doc_id % {chunks} = {i}"
        )
        select = f"{sliced} SELECT doc_id AS id, {sig_cols} FROM sh GROUP BY doc_id"
        if i == 0:
            con.execute(f"CREATE TEMP TABLE sigs_t AS {select}")
        else:
            con.execute(f"INSERT INTO sigs_t {select}")


def _sigs_table(con, sf_dir: str) -> None:
    """Materialize sigs_t, reusing an on-disk parquet cache across the
    four minhash-family checks of one sweep (the chunked build costs
    ~1.2B md5 calls at sf10 — pay it once). The cache name embeds the
    sf tag and chunk count (the knn-cache provenance rule), so a stale
    cache from another SF or config cannot silently validate."""
    k = _chunks()
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    cache = f"/tmp/gs_sigs_{tag}_k{k}.parquet"
    if os.path.exists(cache):
        con.execute(
            f"CREATE TEMP TABLE sigs_t AS SELECT * FROM read_parquet('{cache}')"
        )
        return
    _build_sigs_chunked(con, k)
    con.execute(f"COPY sigs_t TO '{cache}' (FORMAT PARQUET)")


def _chunks() -> int:
    return int(os.environ.get("GS_MINHASH_CHUNKS", "10"))


def check_minhash_chunked(sf_dir: str) -> int:
    """dedup_minhash_lsh: FULL exact — chunked signature TEMP TABLE +
    the registered oracle's own tail (banding/cap/candidates/estimate)
    reading sigs from the TEMP table instead of the inline CTE."""
    from gibbon_spark.queries_llm import _minhash_tail_sql

    t0 = time.time()
    spark_pdf = _spark_result("dedup_minhash_lsh", sf_dir)
    k = _chunks()
    con = duck_connection(sf_dir)
    _sigs_table(con, sf_dir)
    duck_pdf = con.execute(
        f"WITH sigs AS (SELECT * FROM sigs_t),\n    {_minhash_tail_sql()}"
    ).fetchdf()
    con.close()
    return _report(
        "dedup_minhash_lsh",
        f"FULL, chunked sigs TEMP TABLE ({k} slices)",
        compare("dedup_minhash_lsh", spark_pdf, duck_pdf),
        len(spark_pdf),
        t0,
    )


def check_pipeline_chunked(sf_dir: str) -> int:
    """pipeline_training_corpus: FULL exact — the embedded minhash
    near-dup CTE is the sf10 blocker; build the pair table once via the
    chunked sigs path, then run the registered pipeline SQL with
    dup_pairs sourced from the TEMP table (_pipeline_oracle_sql's
    pairs_src hook — every downstream stage is the same string)."""
    from gibbon_spark.queries_llm import _minhash_tail_sql, _pipeline_oracle_sql

    t0 = time.time()
    spark_pdf = _spark_result("pipeline_training_corpus", sf_dir)
    k = _chunks()
    con = duck_connection(sf_dir)
    _sigs_table(con, sf_dir)
    con.execute(
        "CREATE TEMP TABLE pairs_t AS "
        f"WITH sigs AS (SELECT * FROM sigs_t),\n    {_minhash_tail_sql()}"
    )
    duck_pdf = con.execute(_pipeline_oracle_sql(pairs_src="pairs_t")).fetchdf()
    con.close()
    return _report(
        "pipeline_training_corpus",
        f"FULL, chunked-sigs pair TEMP TABLE ({k} slices)",
        compare("pipeline_training_corpus", spark_pdf, duck_pdf),
        len(spark_pdf),
        t0,
    )


def check_incremental_chunked(sf_dir: str) -> int:
    """dedup_incremental: FULL exact — chunked sigs TEMP TABLE + the
    registered oracle's own split/band/cross-candidate tail
    (_incremental_tail_sql)."""
    from gibbon_spark.queries_llm import (
        _INCREMENTAL_SPLIT_CTE,
        _incremental_tail_sql,
    )

    t0 = time.time()
    spark_pdf = _spark_result("dedup_incremental", sf_dir)
    k = _chunks()
    con = duck_connection(sf_dir)
    _build_sigs_chunked(con, k)
    duck_pdf = con.execute(
        f"WITH {_INCREMENTAL_SPLIT_CTE},\n"
        "    sigs AS (SELECT * FROM sigs_t),\n"
        f"    {_incremental_tail_sql()}"
    ).fetchdf()
    con.close()
    return _report(
        "dedup_incremental",
        f"FULL, chunked sigs TEMP TABLE ({k} slices)",
        compare("dedup_incremental", spark_pdf, duck_pdf),
        len(spark_pdf),
        t0,
    )


def check_pc_scan(sf_dir: str) -> int:
    """embedding_top_pc: FULL exact — the registered oracle's Gram
    self-join materializes n·d² rows (819M at sf10) in a non-spillable
    hash build; gram_mode='scan' streams the same HUGEINT product terms
    from one scan into the 4,096-group aggregate (identical values —
    proven equal to the join form at sf0.01/sf0.1). Every CTE downstream
    of g is the identical string."""
    from gibbon_spark.queries_round2b import _pc_oracle_sql

    t0 = time.time()
    spark_pdf = _spark_result("embedding_top_pc", sf_dir)
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(_pc_oracle_sql(gram_mode="scan")).fetchdf()
    con.close()
    return _report(
        "embedding_top_pc",
        "FULL, single-scan streaming Gram (no join)",
        compare("embedding_top_pc", spark_pdf, duck_pdf),
        len(spark_pdf),
        t0,
    )


def check_neardup_relational_subset(sf_dir: str, pct: int) -> int:
    """sim_embedding_neardup: both-endpoints md5 subset (pair membership
    and cosine depend only on the two endpoint vectors — no bucket cap
    in this query), with the band values built RELATIONALLY (planes
    VALUES table + list_dot_product) instead of the registered oracle's
    inline ±v[1]±…±v[64] sign chains, whose 32k-node expression trees
    OOM DuckDB at sf10 independent of subset size — the same
    restatement the knn oracle received. Band values are identical:
    list_dot_product accumulates in index order, matching the inline
    left-to-right chain bit-for-bit (knn_graph_lsh sf10 PASS
    precedent)."""
    from gibbon_spark.operators import similarity
    from gibbon_spark.queries_llm import _COSINE_SQL

    t0 = time.time()
    spark_full = _spark_result("sim_embedding_neardup", sf_dir)
    keep = (
        spark_full["id_a"].map(lambda i: _in_subset(i, pct))
        & spark_full["id_b"].map(lambda i: _in_subset(i, pct))
    ).astype(bool)
    spark_sub = spark_full[keep].reset_index(drop=True)

    band_bits = similarity.NEARDUP_BAND_BITS
    signs = similarity.plane_signs(similarity.NEARDUP_PLANES, 64)
    plane_rows = ", ".join(
        f"({p}, [{', '.join(str(float(w)) for w in signs[p])}]::DOUBLE[])"
        for p in range(similarity.NEARDUP_PLANES)
    )
    sql = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE {_pred_sql('vec_id', pct)}),
    planes(plane_id, w) AS (VALUES {plane_rows}),
    dots AS (
      SELECT e.vec_id, p.plane_id // {band_bits} AS band_idx,
             CASE WHEN list_dot_product(e.v, p.w) >= 0
                  THEN (1 << (p.plane_id % {band_bits})) ELSE 0 END AS bit
      FROM e, planes p
    ),
    bands AS MATERIALIZED (
      SELECT vec_id, band_idx, CAST(sum(bit) AS BIGINT) AS band_val
      FROM dots GROUP BY 1, 2
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {_COSINE_SQL} AS cosine_sim
    FROM cand c
    JOIN e a ON c.id_a = a.vec_id
    JOIN e b ON c.id_b = b.vec_id
    WHERE {_COSINE_SQL} >= 0.4
    """
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    return _report(
        "sim_embedding_neardup",
        f"both-endpoints md5 subset {pct}%, relational band build",
        compare("sim_embedding_neardup", spark_sub, duck_pdf),
        len(spark_sub),
        t0,
    )


def check_cc_full(sf_dir: str) -> int:
    """dedup_clusters_cc: FULL exact via iterative min-label propagation
    over the identical capped-LSH edge set. The pair table builds
    through the chunked-sigs path (exact at every SF; at sf10 the
    one-shot sigs aggregate is the disk-filling stage)."""
    from gibbon_spark.queries_llm import _minhash_tail_sql

    t0 = time.time()
    spark_pdf = _spark_result("dedup_clusters_cc", sf_dir)

    con = duck_connection(sf_dir)
    _sigs_table(con, sf_dir)
    con.execute(
        "CREATE TEMP TABLE pairs AS "
        f"WITH sigs AS (SELECT * FROM sigs_t),\n    {_minhash_tail_sql()}"
    )
    con.execute(
        "CREATE TEMP TABLE edges AS "
        "SELECT id_a AS a, id_b AS b FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs"
    )
    con.execute(
        "CREATE TEMP TABLE lab AS "
        "SELECT DISTINCT a AS node, a AS label FROM edges"
    )
    rounds = 0
    while True:
        rounds += 1
        assert rounds <= 200, "label propagation failed to converge"
        con.execute(
            "CREATE TEMP TABLE lab2 AS "
            "SELECT node, min(label) AS label FROM ("
            "  SELECT node, label FROM lab"
            "  UNION ALL"
            "  SELECT e.b AS node, lab.label FROM lab"
            "  JOIN edges e ON e.a = lab.node"
            ") GROUP BY node"
        )
        changed = con.execute(
            "SELECT count(*) FROM lab2 JOIN lab USING (node) "
            "WHERE lab2.label <> lab.label"
        ).fetchone()[0]
        con.execute("DROP TABLE lab")
        con.execute("ALTER TABLE lab2 RENAME TO lab")
        if changed == 0:
            break
    duck_pdf = con.execute(
        "SELECT label AS component, count(*) AS n_members, "
        "max(node) AS max_member FROM lab GROUP BY label ORDER BY component"
    ).fetchdf()
    con.close()
    return _report(
        "dedup_clusters_cc",
        f"FULL, iterative label propagation ({rounds} rounds)",
        compare("dedup_clusters_cc", spark_pdf, duck_pdf),
        len(spark_pdf),
        t0,
    )


def check_triangles_full(sf_dir: str, n_blocks: int = 16) -> int:
    """graph_triangle_count: FULL exact via blocked 3-way edge join."""
    t0 = time.time()
    spark_pdf = _spark_result("graph_triangle_count", sf_dir)

    con = duck_connection(sf_dir)
    con.execute(
        """
        CREATE TEMP TABLE t_edges AS
        WITH items AS (
          SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
        )
        SELECT a.part AS pa, b.part AS pb
        FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
        GROUP BY 1, 2
        HAVING count(*) >= 2
        """
    )
    con.execute("CREATE TEMP TABLE triv (v BIGINT, c BIGINT)")
    n_tri = 0
    for k in range(n_blocks):
        con.execute(
            f"""
            INSERT INTO triv
            SELECT v, count(*) FROM (
              SELECT u.v FROM (
                SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
                FROM t_edges e1
                JOIN t_edges e2 ON e1.pb = e2.pa
                JOIN t_edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
                WHERE e1.pa % {n_blocks} = {k}
              ) t, (VALUES (1), (2), (3)) role(r),
              LATERAL (SELECT CASE role.r WHEN 1 THEN t.a
                                          WHEN 2 THEN t.b
                                          ELSE t.c END AS v) u
            ) GROUP BY v
            """
        )
    agg = con.execute(
        """
        WITH pv AS (SELECT v, sum(c) AS n FROM triv GROUP BY v)
        SELECT CAST((SELECT count(*) FROM t_edges) AS BIGINT) AS n_edges,
               CAST((SELECT coalesce(sum(n), 0) / 3 FROM pv) AS BIGINT)
                 AS n_triangles,
               CAST((SELECT count(*) FROM pv) AS BIGINT)
                 AS n_vertices_in_triangles,
               CAST((SELECT coalesce(max(n), 0) FROM pv) AS BIGINT)
                 AS max_per_vertex
        """
    ).fetchdf()
    con.close()
    return _report(
        "graph_triangle_count",
        f"FULL, blocked 3-way join ({n_blocks} blocks)",
        compare("graph_triangle_count", spark_pdf, agg),
        len(spark_pdf),
        t0,
    )


def check_skyline_full(sf_dir: str) -> int:
    """skyline_orders: FULL exact check without the quadratic NOT
    EXISTS (whose all-pairs over ~4.5M distinct price points is what
    exceeds the box at sf3). Two-sided dominance argument, exact and
    independent of the engine's bucketed-staircase plan:

    (a) soundness — no point in the FULL per-price point set strictly
        dominates any Spark output row (output x pts, ~15 x 4.5M);
    (b) completeness — every point NOT in the output is strictly
        dominated by SOME output row (pts x output). A truly
        undominated point cannot be dominated by anything, so (b)
        failing catches any missed frontier member.

    (a) + (b) prove the output set IS the skyline; the per-point
    rep_orderkey / n_orders columns are then recomputed from orders on
    the verified frontier and value-compared."""
    t0 = time.time()
    spark_pdf = _spark_result("skyline_orders", sf_dir)

    con = duck_connection(sf_dir)
    con.register("s_front", spark_pdf)
    con.execute(
        """
        CREATE TEMP TABLE pts AS
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
               max(o_orderdate) AS dt
        FROM orders GROUP BY 1
        """
    )
    problems = []
    dominated_out = con.execute(
        """
        SELECT count(*) FROM s_front s
        WHERE EXISTS (
          SELECT 1 FROM pts q
          WHERE q.price_cents >= s.price_cents AND q.dt >= s.o_orderdate
            AND (q.price_cents > s.price_cents OR q.dt > s.o_orderdate))
        """
    ).fetchone()[0]
    if dominated_out:
        problems.append(f"{dominated_out} output rows are dominated")
    missed = con.execute(
        """
        SELECT count(*) FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM s_front s
          WHERE s.price_cents = p.price_cents AND s.o_orderdate = p.dt)
        AND NOT EXISTS (
          SELECT 1 FROM s_front s
          WHERE s.price_cents >= p.price_cents AND s.o_orderdate >= p.dt
            AND (s.price_cents > p.price_cents OR s.o_orderdate > p.dt))
        """
    ).fetchone()[0]
    if missed:
        problems.append(f"{missed} undominated points missing from output")
    duck_pdf = con.execute(
        """
        SELECT s.price_cents, s.o_orderdate,
               CAST(min(o.o_orderkey) AS BIGINT) AS rep_orderkey,
               count(*) AS n_orders_at_point
        FROM s_front s
        JOIN orders o
          ON CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) = s.price_cents
         AND o.o_orderdate = s.o_orderdate
        GROUP BY s.price_cents, s.o_orderdate
        """
    ).fetchdf()
    con.close()
    problems += compare("skyline_orders", spark_pdf, duck_pdf)
    return _report(
        "skyline_orders",
        "FULL, two-sided dominance check + rejoin",
        problems,
        len(spark_pdf),
        t0,
    )


def check_rowwise_subset(name: str, sf_dir: str, pct: int) -> int:
    """unpivot_lineitem_measures: each output row is determined by ONE
    input row (pure projection), so an md5 subset on l_orderkey is an
    exact restatement. The full 53M-row output at sf3 is beyond the
    compare harness's driver materialization (an Arrow toPandas limit,
    not an engine limit — the noop-sink full run is timed flag-free in
    the scale gate)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    t0 = time.time()
    df = entrymod.queries()[name](entrymod_spark(), sf_dir)
    pred = (
        F.conv(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10
        ).cast("int")
        % 100
        < pct
    )
    spark_sub = df.filter(pred).toPandas()

    sql = _subset_table_sql(
        entrymod.oracle_sql()[name], "lineitem", "l_orderkey", pct
    )
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(sql).fetchdf()
    con.close()
    return _report(
        name,
        f"row-determined md5 subset {pct}% of orderkeys",
        compare(name, spark_sub, duck_pdf),
        len(spark_sub),
        t0,
    )


def main() -> int:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    if name == "dedup_clusters_cc":
        return check_cc_full(sf_dir)
    if name == "dedup_minhash_lsh":
        return check_minhash_chunked(sf_dir)
    if name == "pipeline_training_corpus":
        return check_pipeline_chunked(sf_dir)
    if name == "dedup_incremental":
        return check_incremental_chunked(sf_dir)
    if name == "embedding_top_pc":
        return check_pc_scan(sf_dir)
    if name == "graph_triangle_count":
        return check_triangles_full(sf_dir)
    if name == "skyline_orders":
        return check_skyline_full(sf_dir)
    if name == "unpivot_lineitem_measures":
        return check_rowwise_subset(
            name, sf_dir, int(sys.argv[3]) if len(sys.argv) > 3 else 2
        )
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else SUBSET_PCT[name]
    if name == "sim_embedding_neardup":
        return check_neardup_relational_subset(sf_dir, pct)
    if name == "knn_graph_lsh":
        return check_knn_subset(name, sf_dir, pct)
    return check_pairwise_subset(name, sf_dir, pct)


if __name__ == "__main__":
    sys.exit(main())
