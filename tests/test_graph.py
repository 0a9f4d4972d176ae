"""Connected-components correctness on constructed graphs."""

from __future__ import annotations

from machine_learning_algorithm_sparkml__spark.operators.graph import connected_components


def test_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {5,6}, {7} isolated
    vertices = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    out = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_components_string_ids_join_fallback(spark):
    # string labels can't use the label-sum convergence check; this
    # exercises the join-based fallback end-to-end
    vertices = spark.createDataFrame([(f"d{i}",) for i in range(1, 8)], "id string")
    edges = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d3", "d4"), ("d5", "d6")],
        "id_a string, id_b string",
    )
    out = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert out == {"d1": "d1", "d2": "d1", "d3": "d1", "d4": "d1", "d5": "d5", "d6": "d5", "d7": "d7"}


def test_components_long_chain_converges(spark):
    # diameter-bound check: min-label propagation needs ~n iterations
    # on a chain (worst case; real near-dup clusters have diameter 2-3)
    n = 12
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    out = {r.id: r.component for r in connected_components(vertices, edges, max_iterations=15).collect()}
    assert set(out.values()) == {0}


def test_pagerank_star_graph_center_dominates(spark):
    """All leaves point at the center: center rank must dominate, total
    rank conserved at |V|."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import pagerank

    edges = spark.createDataFrame([(i, 0) for i in range(1, 11)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(11)], "id long")
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, edges, iterations=10).collect()}
    assert len(ranks) == 11
    assert ranks[0] == max(ranks.values())
    assert all(ranks[0] > ranks[i] for i in range(1, 11))
    assert abs(sum(ranks.values()) - 11.0) < 1e-6
    assert min(ranks.values()) >= 0.15 - 1e-9


def test_pagerank_key_invariants(spark, sf_dir):
    from pyspark.sql import functions as F
    from machine_learning_algorithm_sparkml__spark.workload.scale import q_graph_pagerank

    out = q_graph_pagerank(spark, sf_dir)
    row = out.select("rank_sum_ok", "rank_min_ok").limit(1).collect()[0]
    assert row["rank_sum_ok"] and row["rank_min_ok"]
    assert out.filter(F.col("rank").isNull()).count() == 0


def test_triangles_constructed_graph(spark):
    """K4 on {0,1,2,3} (4 triangles) + a pendant edge (no triangle) +
    a disjoint triangle {10,11,12}; edges fed duplicated, reversed,
    and with a self-loop to prove canonicalization. Every triangle
    enumerated exactly once, corners in (degree, id) order."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = (
        k4
        + [(b, a) for a, b in k4]      # reversed duplicates
        + [(3, 4), (5, 5)]             # pendant + self-loop
        + [(10, 11), (11, 12), (12, 10)]
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    tri = {tuple(r) for r in triangles(df).collect()}
    assert len(tri) == 5  # C(4,3) + 1
    assert (10, 11, 12) in tri
    # K4 triangles present regardless of corner order
    assert {frozenset(t) for t in tri} == {
        frozenset(s) for s in ([0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3], [10, 11, 12])
    }


def test_triangles_hub_out_degree_bounded(spark):
    """Star hub (degree 40) + one rim edge: degree orientation must
    point rim->hub, so the hub's out-degree is 0 and the only triangle
    is (rim_a, rim_b, hub) — the skew guarantee, and no
    cartesian/nested-loop node in the physical plan."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import triangles

    edges = [(i, 100) for i in range(1, 41)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from machine_learning_algorithm_sparkml__spark.plans import formatted_plan

    out = triangles(df)
    plan = formatted_plan(out)  # public explain output, Connect-safe
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert [tuple(r) for r in out.collect()] == [(1, 2, 100)]


def test_triangle_count_key_matches_duckdb(spark, sf_dir):
    import duckdb

    from machine_learning_algorithm_sparkml__spark.workload.scale import (
        ORACLE,
        q_graph_triangle_count,
    )

    got = {r["id"]: r["n_triangles"] for r in q_graph_triangle_count(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = dict(con.sql(ORACLE["graph_triangle_count"]).fetchall())
    assert got == want


def test_link_pagerank_composition_invariants(spark, sf_dir):
    """PageRank over the EXTRACTED link graph: rank mass conserved at
    |V|, the theoretical floor holds, the node set is exactly the
    union of crawled sources and href targets (frontier pages
    included), and edges come from parsing the extractor's real hrefs
    — recompute the expected node set independently from the fixture
    rule."""
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    from machine_learning_algorithm_sparkml__spark.workload.scale import (
        q_graph_link_pagerank,
    )

    rows = q_graph_link_pagerank(spark, sf_dir).collect()
    n = len(rows)
    assert abs(sum(r["rank"] for r in rows) - n) / n < 1e-5
    assert min(r["rank"] for r in rows) >= 0.15 - 1e-9

    doc_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    expected_nodes = set(doc_ids) | {
        (d * 7 + k * 13) % 1000 for d in doc_ids for k in range(3)
    }
    assert {r["id"] for r in rows} == expected_nodes
