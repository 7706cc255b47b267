"""Graph-layer queries (SURVEY.md §2.10) on the driver fixtures.

The communication graph is emulated on ``events`` (FIXTURES.md B4):
consecutive users within an event_type stream form directed edges. Edge
building, weighting and degrees are oracle-matched; connected components is
oracle-matched via a recursive-CTE reachability twin; the iterative ops
(PageRank, PPR, Bellman-Ford SSSP, k-core, LPA) oracle via their rounds
unrolled as chained MATERIALIZED CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hierarchical_graph_db_spark.materialize import materialize

from hierarchical_graph_db_spark.io import Catalog
from hierarchical_graph_db_spark.operators.graph import (
    connected_components,
    degrees,
    edge_weights,
    pagerank,
    sequential_interaction_edges,
    shortest_paths,
    triangle_count,
)
from hierarchical_graph_db_spark.queries import query

_SQL_EDGES = """
    SELECT CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst
    FROM (
        SELECT user_id AS src,
               lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
        FROM events
    )
    WHERE dst IS NOT NULL AND src <> dst
"""


@query(
    "interaction_edge_weights",
    f"""
    WITH edges AS ({_SQL_EDGES})
    SELECT src, dst, CAST(count(*) AS BIGINT) AS weight
    FROM edges
    GROUP BY src, dst
    """,
)
def interaction_edge_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: edge construction + weighting. On the email corpus this is
    explode(to/cc/bcc)+groupBy (operators/graph.communication_edges); here the
    events-stream emulation. One window pass + one shuffle on (src,dst)."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return edge_weights(edges)


@query(
    "graph_degrees",
    f"""
    WITH edges AS (
        SELECT DISTINCT src, dst FROM ({_SQL_EDGES})
    ),
    out_d AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS out_degree
              FROM edges GROUP BY src),
    in_d  AS (SELECT dst AS id, CAST(count(*) AS BIGINT) AS in_degree
              FROM edges GROUP BY dst)
    SELECT coalesce(out_d.id, in_d.id)        AS id,
           coalesce(out_degree, 0)            AS out_degree,
           coalesce(in_degree, 0)             AS in_degree,
           coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
    FROM out_d FULL OUTER JOIN in_d ON out_d.id = in_d.id
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertex degrees over the distinct edge set."""
    ev = Catalog(spark, sf_dir).events
    edges = (
        sequential_interaction_edges(ev)
        .select(F.col("src").cast("string").alias("src"),
                F.col("dst").cast("string").alias("dst"))
        .distinct()
    )
    return degrees(edges)


def _cc_oracle(n_rounds: int = 16) -> str:
    """Unrolled hash-to-min connected components: per round each vertex
    takes the min of its own label, its neighbors' labels (edge relax),
    and its label's label (pointer jump). The jump step doubles label
    shortcuts, so rounds needed is O(log diameter) — 16 covers any graph
    these fixtures can produce. Replaces the original full-reachability
    recursive CTE, whose working set is O(Σ component²) pairs: fine at
    1.5k vertices, but 15k vertices / 1M edges at sf1 is ~225M pairs and
    OOMed DuckDB at an 18 GiB cap. Per-round cost here is one O(E) join
    + one O(N) self-join."""
    parts = [f"""
    eu AS MATERIALIZED (
        SELECT src, dst FROM ({_SQL_EDGES})
        UNION
        SELECT dst AS src, src AS dst FROM ({_SQL_EDGES})
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS l FROM eu)"""]
    for k in range(1, n_rounds + 1):
        parts.append(f"""
    l{k} AS MATERIALIZED (
        SELECT v, min(l) AS l FROM (
            SELECT v, l FROM l{k - 1}
            UNION ALL
            SELECT e.dst AS v, p.l FROM l{k - 1} p JOIN eu e ON e.src = p.v
            UNION ALL
            SELECT a.v, b.l FROM l{k - 1} a JOIN l{k - 1} b ON b.v = a.l
        ) GROUP BY v
    )""")
    return ("WITH " + ",".join(parts)
            + f"\n    SELECT v AS id, l AS component FROM l{n_rounds}")


@query("graph_connected_components", _cc_oracle())
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4's engine: min-label-propagation connected components (used for
    thread reconstruction on the email corpus). Label = lexicographic min
    vertex id in the component — same fixed point the unrolled
    hash-to-min oracle computes."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return connected_components(edges, max_iter=50)


def _pagerank_oracle(n_iter: int = 10, d: float = 0.85) -> str:
    """DuckDB twin of ``operators.graph.pagerank``: the fixed iteration count
    unrolls into chained CTEs (recursive CTEs can't aggregate per step), each
    computing exactly the Spark update — same dangling-mass redistribution,
    same operator order, and the same order-independent fixed-point bigint
    mass sums (round(x·1e15) partials), so every iteration is
    bit-reproducible across engines AND across Spark partitionings."""
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"r{i}"
        # MATERIALIZED is load-bearing: each iteration references the
        # previous CTE twice (dangling mass + contributions); inlining would
        # re-evaluate the whole chain 2^iterations times.
        iters.append(f"""
    {cur} AS MATERIALIZED (
        SELECT v.id,
               (1 - {d}) / nn.n
               + {d} * (SELECT coalesce(sum(CAST(round({prev}.rank * 1000000000000000)
                                         AS BIGINT)) / 1000000000000000.0, 0)
                        FROM {prev} LEFT JOIN out_deg od ON {prev}.id = od.id
                        WHERE od.id IS NULL) / nn.n
               + {d} * coalesce(c.in_rank, 0) AS rank
        FROM vertices v
        CROSS JOIN nn
        LEFT JOIN (
            SELECT e.dst AS id, sum(CAST(round(p.rank / e.out_degree * 1000000000000000) AS BIGINT))
                   / 1000000000000000.0 AS in_rank
            FROM edges_deg e JOIN {prev} p ON e.src = p.id
            GROUP BY e.dst
        ) c ON v.id = c.id
    )""")
        prev = cur
    return f"""
    WITH base_edges AS ({_SQL_EDGES}),
    -- multi-edges intentional: the Spark operator weights by row multiplicity
    edges AS (SELECT src, dst FROM base_edges),
    vertices AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
    out_deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS out_degree
                FROM edges GROUP BY src),
    edges_deg AS MATERIALIZED (SELECT e.src, e.dst, od.out_degree
                  FROM edges e JOIN out_deg od ON e.src = od.id),
    r0 AS MATERIALIZED (SELECT v.id, 1.0 / nn.n AS rank
                        FROM vertices v CROSS JOIN nn),
    {','.join(iters)}
    SELECT id, round(rank, 6) AS rank FROM {prev}
    """


@query("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 iterations, d=0.85) over the interaction graph. Scores
    sum to 1 (dangling mass redistributed). The oracle unrolls the same 10
    iterations as chained SQL CTEs — even the iterative fixpoint is
    differential-tested. ``grid="absolute"`` is PINNED here (not the
    engine default, which flipped to ``relative`` in round 11): the oracle
    unroll IS the absolute grid, and keeping this query on it preserves
    the r7-r10 artifact history unchanged while ``graph_pagerank_relative``
    covers the default grid against the same oracle — together the two
    queries driver-check cross-grid 6dp equivalence every round."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    ranks = pagerank(edges, n_iter=10, grid="absolute")
    return ranks.select("id", F.round("rank", 6).alias("rank"))


@query("graph_pagerank_relative", _pagerank_oracle())
def graph_pagerank_relative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank under the RELATIVE fixed-point grid — since round 11 the
    ENGINE DEFAULT (``pagerank()`` with no ``grid`` argument resolves to
    this; the explicit ``grid="relative"`` below is kept so the query's
    contract survives any future default change): quantize ``rank·|V|``
    instead of ``rank``, so per-edge contributions ``rank/out_degree``
    stay representable at ANY vertex count — the billion-vertex path that
    closes the absolute 1e-15 grid's documented mass-leak cliff
    (operators/graph.py:_relative_fp). The ORACLE IS THE
    SAME absolute-grid unroll as ``graph_pagerank``: inside the absolute
    grid's provably-lossless regime (|V| ≤ 1e7 — every fixture scale) the
    two grids agree to the 6dp output exactly, and this query existing in
    the registry makes that equivalence driver-checked every round, not
    just pytest-checked (tests/test_graph.py::
    test_rank_grid_modes_agree_at_fixture_scale covers the mechanism;
    test_rank_grid_mass_conservation pins the regime where they MUST
    diverge)."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    ranks = pagerank(edges, n_iter=10, grid="relative")
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def _hits_oracle(n_iter: int = 8) -> str:
    """DuckDB twin of ``operators.graph.hits``: each iteration's authority
    and hub half-steps unroll into chained MATERIALIZED CTEs with the same
    max-normalization, 6dp rounding, and order-independent fixed-point
    bigint mass sums — mutual recursion, differential-tested like
    PageRank."""
    iters = []
    prev_h = "h0"
    for i in range(1, n_iter + 1):
        iters.append(f"""
    ar{i} AS MATERIALIZED (
        SELECT e.dst AS id,
               sum(CAST(round(h.hub * 1000000) AS BIGINT)) / 1000000.0 AS s
        FROM edges e JOIN {prev_h} h ON e.src = h.id GROUP BY e.dst
    )""")
        iters.append(f"""
    a{i} AS MATERIALIZED (
        SELECT v.id,
               round(coalesce(r.s / (SELECT max(s) FROM ar{i}), 0), 6) AS auth
        FROM vertices v LEFT JOIN ar{i} r ON v.id = r.id
    )""")
        iters.append(f"""
    hr{i} AS MATERIALIZED (
        SELECT e.src AS id,
               sum(CAST(round(a.auth * 1000000) AS BIGINT)) / 1000000.0 AS s
        FROM edges e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
    )""")
        iters.append(f"""
    h{i} AS MATERIALIZED (
        SELECT v.id,
               round(coalesce(r.s / (SELECT max(s) FROM hr{i}), 0), 6) AS hub
        FROM vertices v LEFT JOIN hr{i} r ON v.id = r.id
    )""")
        prev_h = f"h{i}"
    return f"""
    WITH base_edges AS ({_SQL_EDGES}),
    -- multi-edges intentional: weight by multiplicity, like pagerank
    edges AS MATERIALIZED (SELECT src, dst FROM base_edges),
    vertices AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM vertices),
    {','.join(iters)}
    SELECT h.id, h.hub, a.auth
    FROM h{n_iter} h JOIN a{n_iter} a ON h.id = a.id
    """


@query("graph_hits", _hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (8 iterations, max-norm) over the interaction
    graph — who initiates interactions (hub) vs who receives them
    (authority), the directed complement to PageRank. Every half-step
    unrolls into the oracle (operators/graph.py:hits)."""
    from hierarchical_graph_db_spark.operators.graph import hits

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return hits(edges, n_iter=8)


@query(
    "graph_triangle_count",
    f"""
    WITH edges AS ({_SQL_EDGES}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM e e1 JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting via the wedge-closing two-join pattern on the
    canonicalized (a<b) edge set — each triangle counted once (a<b<c)."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return triangle_count(edges)


@query(
    "graph_shortest_paths",
    f"""
    WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({_SQL_EDGES})
        UNION
        SELECT dst AS src, src AS dst FROM ({_SQL_EDGES})
    ),
    bfs(id, distance) AS (
        SELECT '1', 0
        UNION
        SELECT eu.dst, bfs.distance + 1
        FROM bfs JOIN eu ON bfs.id = eu.src
        WHERE bfs.distance < 10
    )
    SELECT id, CAST(min(distance) AS INT) AS distance
    FROM bfs GROUP BY id
    """,
)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted BFS distances from landmark user '1' over the undirected
    interaction graph — iterative frontier joins in Spark, recursive CTE in
    the DuckDB oracle (both capped at 10 hops)."""
    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return shortest_paths(edges, landmark="1", max_hops=10)


def _lpa_ctes(n_iter: int = 5) -> tuple[str, str]:
    """DuckDB twin of ``operators.graph.label_propagation_communities``:
    the synchronized rounds unroll into chained MATERIALIZED CTEs (each
    round reads the previous once per reference; MATERIALIZED still
    prevents the chain re-inlining). The most-frequent-neighbor-label
    choice with min-label tie-break (Spark: ``min_by(community,
    struct(-freq, community))``) is reproduced with ``row_number() OVER
    (ORDER BY freq DESC, community ASC)`` — both are binary-collation
    string comparisons, so ties agree."""
    rounds = []
    prev = "l0"
    for i in range(1, n_iter + 1):
        cur = f"l{i}"
        rounds.append(f"""
    {cur} AS MATERIALIZED (
        SELECT v.id, coalesce(b.community, v.id) AS community
        FROM verts v
        LEFT JOIN (
            SELECT id, community FROM (
                SELECT id, community,
                       row_number() OVER (PARTITION BY id
                                          ORDER BY freq DESC, community ASC)
                           AS rn
                FROM (
                    SELECT s.a AS id, l.community, count(*) AS freq
                    FROM sym s JOIN {prev} l ON l.id = s.b
                    GROUP BY s.a, l.community
                )
            ) WHERE rn = 1
        ) b ON b.id = v.id
    )""")
        prev = cur
    ctes = f"""raw AS ({_SQL_EDGES}),
    sym AS MATERIALIZED (
        SELECT src AS a, dst AS b FROM raw
        UNION
        SELECT dst AS a, src AS b FROM raw
    ),
    verts AS MATERIALIZED (SELECT DISTINCT a AS id FROM sym),
    l0 AS MATERIALIZED (SELECT id, id AS community FROM verts),
    {','.join(rounds)}"""
    return ctes, prev


def _lpa_oracle(n_iter: int = 5) -> str:
    ctes, last = _lpa_ctes(n_iter)
    return f"""
    WITH {ctes}
    SELECT id, community FROM {last}
    """


@query("graph_communities_lpa", _lpa_oracle())
def graph_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronized label-propagation communities (5 rounds, deterministic
    min-tie-break) over the interaction graph — dense-structure detection
    beside CC's connectivity. Determinism + clique-separation behavior
    pinned in tests/test_graph.py; the oracle unrolls the same 5
    synchronized rounds as SQL CTEs (fixed round count IS the contract —
    mode-finding can oscillate, so LPA is not a convergence loop)."""
    from hierarchical_graph_db_spark.operators.graph import (
        label_propagation_communities,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return label_propagation_communities(edges)


WEIGHTED_SSSP_ORACLE_ROUNDS = 16


def _weighted_sssp_oracle(n_rounds: int = WEIGHTED_SSSP_ORACLE_ROUNDS) -> str:
    """Unrolled Bellman-Ford rounds (MATERIALIZED — each round reads the
    previous twice: carry-over + relaxation).

    The Spark operator iterates to the fixed point, so the oracle unrolls
    a round count safely PAST the fixture's convergence depth (rounds after
    convergence are no-ops — the CTE chain reproduces the fixed point
    exactly). ``tests/test_graph.py`` pins that the fixture converges well
    inside this margin."""
    rounds = []
    prev = "d0"
    for i in range(1, n_rounds + 1):
        cur = f"d{i}"
        rounds.append(f"""
    {cur} AS MATERIALIZED (
        SELECT id, min(distance) AS distance FROM (
            SELECT id, distance FROM {prev}
            UNION ALL
            SELECT e.dst AS id, p.distance + e.cost AS distance
            FROM {prev} p JOIN we e ON e.src = p.id
        ) GROUP BY id
    )""")
        prev = cur
    return f"""
    WITH base_edges AS ({_SQL_EDGES}),
    we AS MATERIALIZED (
        SELECT src, dst, 1.0 / count(*) AS cost
        FROM base_edges GROUP BY src, dst
    ),
    d0 AS MATERIALIZED (SELECT '1' AS id, 0.0 AS distance),
    {','.join(rounds)}
    SELECT id, round(distance, 6) AS distance FROM {prev}
    """


@query("graph_weighted_distances", _weighted_sssp_oracle())
def graph_weighted_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP from user '1': edge cost = 1/interaction-count (frequent
    pairs are 'closer'), Bellman-Ford relaxed to the fixed point —
    hash-checked against an unrolled SQL CTE chain that runs past the
    convergence depth (post-convergence rounds are no-ops)."""
    from hierarchical_graph_db_spark.operators.graph import weighted_distances

    ev = Catalog(spark, sf_dir).events
    weighted = edge_weights(
        sequential_interaction_edges(ev).select(
            F.col("src").cast("string").alias("src"),
            F.col("dst").cast("string").alias("dst"),
        )
    ).select("src", "dst", (F.lit(1.0) / F.col("weight")).alias("cost"))
    out = weighted_distances(weighted, landmark="1")
    return out.select("id", F.round("distance", 6).alias("distance"))


@query(
    "graph_link_prediction",
    f"""
    WITH raw AS ({_SQL_EDGES}),
    sym AS (
        SELECT src, dst FROM raw
        UNION
        SELECT dst AS src, src AS dst FROM raw
    ),
    deg AS (SELECT src AS w, count(*) AS w_degree FROM sym GROUP BY 1),
    pairs AS (
        SELECT a.src AS a, b.src AS b,
               CAST(count(*) AS BIGINT) AS common_neighbors,
               -- same 1e-9 fixed-point witness grid as the operator, so the
               -- rank-10 cut selects the identical row set in both engines
               round(sum(CAST(round(1.0 / ln(d.w_degree) * 1000000000)
                              AS BIGINT)) / 1000000000.0, 6) AS adamic_adar
        FROM sym a
        JOIN sym b ON a.dst = b.dst AND a.src < b.src
        JOIN deg d ON d.w = a.dst
        GROUP BY 1, 2
        HAVING count(*) >= 2
    ),
    nonadj AS (
        SELECT p.a, p.b, p.common_neighbors, p.adamic_adar
        FROM pairs p
        LEFT JOIN sym e ON e.src = p.a AND e.dst = p.b
        WHERE e.src IS NULL
    )
    SELECT a, b, common_neighbors, adamic_adar FROM (
        SELECT a, b, common_neighbors, adamic_adar,
               row_number() OVER (
                   PARTITION BY a
                   ORDER BY adamic_adar DESC, common_neighbors DESC, b
               ) AS rn
        FROM nonadj
    ) WHERE rn <= 10
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the interaction graph: non-adjacent user pairs
    ranked by common neighbors and Adamic-Adar (hub witnesses down-weighted
    by 1/ln degree). Witness-indexed self-join — per-witness quadratic work
    bounded by max degree, never all-pairs — then an anti-join removes
    existing edges. The result is the top-10 suggestions per pair-anchor
    (WindowGroupLimit rank filter, O(|V|·10) rows), matching how link
    prediction is consumed — the unbounded all-candidate-pairs shape made
    this the registry's slowest query at sf1 (VERDICT r8 item 4)."""
    from hierarchical_graph_db_spark.operators.graph import link_prediction

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return link_prediction(edges, min_common=2, per_source_k=10)


def _ppr_oracle(n_iter: int = 10, d: float = 0.85) -> str:
    """DuckDB twin of ``operators.graph.personalized_pagerank`` with the
    seed set {vertices whose numeric id ≡ 0 mod 37}: same unrolled
    chained-CTE construction (and the same MATERIALIZED discipline) as the
    PageRank oracle, with the per-vertex reset column replacing the uniform
    1/N terms in both the teleport and the dangling redistribution."""
    iters = []
    prev = "r0"
    for i in range(1, n_iter + 1):
        cur = f"r{i}"
        iters.append(f"""
    {cur} AS MATERIALIZED (
        SELECT b.id,
               (1 - {d}) * b.reset
               + {d} * (SELECT coalesce(sum(CAST(round({prev}.rank * 1000000000000000)
                                         AS BIGINT)) / 1000000000000000.0, 0)
                        FROM {prev} LEFT JOIN out_deg od ON {prev}.id = od.id
                        WHERE od.id IS NULL) * b.reset
               + {d} * coalesce(c.in_rank, 0) AS rank
        FROM base b
        LEFT JOIN (
            SELECT e.dst AS id, sum(CAST(round(p.rank / e.out_degree * 1000000000000000) AS BIGINT))
                   / 1000000000000000.0 AS in_rank
            FROM edges_deg e JOIN {prev} p ON e.src = p.id
            GROUP BY e.dst
        ) c ON b.id = c.id
    )""")
        prev = cur
    return f"""
    WITH base_edges AS ({_SQL_EDGES}),
    edges AS (SELECT src, dst FROM base_edges),
    vertices AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    srcs AS (SELECT id FROM vertices WHERE CAST(id AS BIGINT) % 37 = 0),
    ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM srcs),
    base AS MATERIALIZED (
        SELECT v.id,
               CASE WHEN s.id IS NOT NULL THEN 1.0 / ns.n ELSE 0.0 END AS reset
        FROM vertices v CROSS JOIN ns LEFT JOIN srcs s ON s.id = v.id
    ),
    out_deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS out_degree
                FROM edges GROUP BY src),
    edges_deg AS MATERIALIZED (SELECT e.src, e.dst, od.out_degree
                  FROM edges e JOIN out_deg od ON e.src = od.id),
    r0 AS MATERIALIZED (SELECT id, reset AS rank FROM base),
    {','.join(iters)}
    SELECT id, round(rank, 6) AS rank FROM {prev}
    """


@query("graph_personalized_pagerank", _ppr_oracle())
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded on users ≡ 0 (mod 37): teleport and
    dangling mass return to the seed set, ranking every user by proximity
    to the seeds (recommendation / seed-expansion retrieval). Ten unrolled
    iterations, hash-checked like the global PageRank."""
    from hierarchical_graph_db_spark.operators.graph import personalized_pagerank

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    sources = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .where(F.col("id").cast("bigint") % 37 == 0)
    )
    ranks = personalized_pagerank(edges, sources, n_iter=10)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


K_CORE_K = 72
K_CORE_ORACLE_ROUNDS = 24


def _kcore_oracle(k: int = K_CORE_K, n_rounds: int = K_CORE_ORACLE_ROUNDS) -> str:
    """DuckDB twin of ``operators.graph.k_core``: peeling rounds unroll into
    chained CTEs, each keeping edges whose BOTH endpoints clear the
    induced-degree bar of the previous round. The Spark operator peels to
    the fixed point, so the unroll count sits safely past the fixture's
    convergence depth (post-convergence rounds are no-ops);
    ``tests/test_graph.py`` pins the margin."""
    iters = []
    prev = "a0"
    for i in range(1, n_rounds + 1):
        cur = f"a{i}"
        iters.append(f"""
    {cur} AS MATERIALIZED (
        SELECT e.src, e.dst
        FROM {prev} e
        JOIN (SELECT src AS id FROM {prev} GROUP BY src
              HAVING count(*) >= {k}) ks ON ks.id = e.src
        JOIN (SELECT src AS id FROM {prev} GROUP BY src
              HAVING count(*) >= {k}) kd ON kd.id = e.dst
    )""")
        prev = cur
    return f"""
    WITH raw AS ({_SQL_EDGES}),
    sym AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
    a0 AS MATERIALIZED (SELECT src, dst FROM sym),
    {','.join(iters)}
    SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
    FROM {prev} GROUP BY src HAVING count(*) >= {k}
    """


@query("graph_k_core", _kcore_oracle())
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """72-core of the interaction graph, peeled to the fixed point.
    Surviving vertices with their induced degree; the oracle unrolls
    peeling rounds past the convergence depth (no-ops once converged)."""
    from hierarchical_graph_db_spark.operators.graph import k_core

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return k_core(edges, k=K_CORE_K)


@query(
    "graph_clustering_coefficient",
    f"""
    WITH edges AS ({_SQL_EDGES}),
    e AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst
    ),
    deg AS (
        SELECT id, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        GROUP BY id
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tnode AS (
        SELECT id, CAST(count(*) AS BIGINT) AS triangles
        FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY id
    )
    SELECT d.id, d.degree, coalesce(t.triangles, 0) AS triangles,
           round(CASE WHEN d.degree >= 2
                      THEN 2.0 * coalesce(t.triangles, 0)
                           / (d.degree * (d.degree - 1))
                      ELSE 0.0 END, 6) AS clustering
    FROM deg d LEFT JOIN tnode t ON d.id = t.id
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per vertex — triangles credited to their
    three corners by one explode off the wedge-closing join (no per-vertex
    neighborhood intersections), degrees from the undirected incidence
    list. The global transitivity summary is one further aggregate away."""
    from hierarchical_graph_db_spark.operators.graph import local_clustering

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return local_clustering(edges)


@query(
    "graph_harmonic_centrality",
    f"""
    WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({_SQL_EDGES})
        UNION
        SELECT dst AS src, src AS dst FROM ({_SQL_EDGES})
    ),
    bfs(source, id, distance) AS (
        SELECT s, s, 0
        FROM (VALUES ('1'), ('2'), ('3'), ('4')) seeds(s)
        UNION
        SELECT bfs.source, eu.dst, bfs.distance + 1
        FROM bfs JOIN eu ON bfs.id = eu.src
        WHERE bfs.distance < 6
    ),
    d AS (
        SELECT source, id, min(distance) AS dist
        FROM bfs GROUP BY source, id
    )
    SELECT id, CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           round(CAST(sum(CAST(round(1000000.0 / dist) AS BIGINT)) AS BIGINT)
                 / 1000000.0, 6) AS harmonic
    FROM d WHERE dist > 0 GROUP BY id
    """,
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic centrality over the undirected interaction graph:
    Σ 1/d(s, v) from 4 landmark users, one multi-source BFS (see
    operators/graph.py:harmonic_centrality) vs the oracle's recursive CTE
    seeded with all 4 landmarks at once. Both engines cap at 6 hops and
    take min-distance per (source, vertex) before the fixed-point 1/d
    fold."""
    from hierarchical_graph_db_spark.operators.graph import (
        harmonic_centrality,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return harmonic_centrality(edges, ["1", "2", "3", "4"], max_hops=6)


def _betweenness_oracle(n_hops: int = 4,
                        seeds: tuple[str, ...] = ("1", "2", "3", "4")) -> str:
    """DuckDB twin of ``operators.graph.betweenness_sampled``: the forward
    σ-counting BFS unrolls one CTE per hop (group-sum of predecessor σ,
    anti-filtered against the visited prefix), the backward dependency
    accumulation unrolls one CTE per depth from the deepest level up, with
    the same fixed-point bigint contribution sums and 6dp delta rounding.
    Empty levels yield empty CTEs, so the fixed unroll equals the engine's
    early-stopping loop."""
    seed_vals = ", ".join(f"('{s}')" for s in seeds)
    fwd = []
    prev_f, prev_vis = "f0", "vis0"
    for h in range(1, n_hops + 1):
        fwd.append(f"""
    f{h} AS MATERIALIZED (
        SELECT f.source, e.dst AS id, {h} AS dist,
               CAST(sum(f.sigma) AS BIGINT) AS sigma
        FROM {prev_f} f JOIN e ON f.id = e.src
        WHERE NOT EXISTS (SELECT 1 FROM {prev_vis} v
                          WHERE v.source = f.source AND v.id = e.dst)
        GROUP BY 1, 2
    ),
    vis{h} AS MATERIALIZED (
        SELECT * FROM {prev_vis} UNION ALL SELECT * FROM f{h}
    )""")
        prev_f, prev_vis = f"f{h}", f"vis{h}"
    bwd = [f"""
    dl{n_hops} AS MATERIALIZED (
        SELECT source, id, sigma, CAST(0 AS DOUBLE) AS delta
        FROM {prev_vis} WHERE dist = {n_hops}
    )"""]
    for d in range(n_hops, 0, -1):
        bwd.append(f"""
    dl{d - 1} AS MATERIALIZED (
        SELECT v.source, v.id, v.sigma, round(coalesce(c.s, 0), 6) AS delta
        FROM (SELECT * FROM {prev_vis} WHERE dist = {d - 1}) v
        LEFT JOIN (
            SELECT p.source, p.id AS vid,
                   sum(CAST(round(p.sigma / w.sigma * (1 + w.delta)
                                  * 1000000) AS BIGINT)) / 1000000.0 AS s
            FROM (SELECT * FROM {prev_vis} WHERE dist = {d - 1}) p
            JOIN e ON p.id = e.src
            JOIN dl{d} w ON w.source = p.source AND w.id = e.dst
            GROUP BY 1, 2
        ) c ON c.source = v.source AND c.vid = v.id
    )""")
    union_dl = " UNION ALL ".join(
        f"SELECT * FROM dl{d}" for d in range(1, n_hops + 1))
    return f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM ({_SQL_EDGES}) WHERE src <> dst
    ),
    f0 AS (SELECT s AS source, s AS id, 0 AS dist,
                  CAST(1 AS BIGINT) AS sigma
           FROM (VALUES {seed_vals}) seeds(s)),
    vis0 AS (SELECT * FROM f0),
    {','.join(fwd)},
    {','.join(bwd)}
    SELECT id,
           round(CAST(sum(CAST(round(delta * 1000000) AS BIGINT)) AS BIGINT)
                 / 1000000.0, 6) AS betweenness
    FROM ({union_dl}) u
    GROUP BY id
    """


@query("graph_betweenness_sampled", _betweenness_oracle())
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled hop-bounded betweenness (Brandes 2001 / Brandes & Pich 2007)
    from 4 landmark users over the directed interaction graph, shortest
    paths capped at 4 hops — who sits ON the communication paths, the
    brokerage complement to PageRank's prestige and HITS' hub/authority.
    Both Brandes phases (σ-counting forward BFS, depth-by-depth dependency
    accumulation) unroll into the CTE oracle with exact integer path
    counts and fixed-point delta sums (operators/graph.py:
    betweenness_sampled)."""
    from hierarchical_graph_db_spark.operators.graph import (
        betweenness_sampled,
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return betweenness_sampled(edges, ["1", "2", "3", "4"], max_hops=4)


def _ktruss_oracle(k: int = 12, n_rounds: int = 3) -> str:
    """DuckDB twin of ``operators.graph.ktruss_edges``: each pruning round
    unrolls to (adjacency ∪ reverse) + the two-join common-neighbor count
    + the support threshold, then the final surviving-edge support."""
    min_sup = k - 2
    rounds = []
    for i in range(n_rounds):
        rounds.append(f"""
    adj{i} AS MATERIALIZED (
        SELECT a AS u, b AS v FROM e{i} UNION ALL SELECT b, a FROM e{i}
    ),
    s{i} AS MATERIALIZED (
        SELECT e.a, e.b, count(*) AS sup
        FROM e{i} e
        JOIN adj{i} x ON x.u = e.a AND x.v <> e.b
        JOIN adj{i} y ON y.u = e.b AND y.v = x.v
        GROUP BY e.a, e.b
    ),
    e{i + 1} AS MATERIALIZED (
        SELECT e.a, e.b
        FROM e{i} e LEFT JOIN s{i} s ON s.a = e.a AND s.b = e.b
        WHERE coalesce(s.sup, 0) >= {min_sup}
    )""")
    last = f"e{n_rounds}"
    return f"""
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ({_SQL_EDGES}) WHERE src <> dst
    ),
    {','.join(rounds)},
    adjf AS (SELECT a AS u, b AS v FROM {last}
             UNION ALL SELECT b, a FROM {last}),
    sf AS (
        SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS sup
        FROM {last} e
        JOIN adjf x ON x.u = e.a AND x.v <> e.b
        JOIN adjf y ON y.u = e.b AND y.v = x.v
        GROUP BY e.a, e.b
    )
    SELECT e.a, e.b, coalesce(s.sup, 0) AS support
    FROM {last} e LEFT JOIN sf s ON s.a = e.a AND s.b = e.b
    """


@query("graph_ktruss_edges", _ktruss_oracle())
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-truss of the undirected interaction graph (3 pruning rounds,
    fixed like PageRank's iteration contract): edges supported by ≥10
    triangles among surviving edges — the cohesive-subgraph mining step
    between triangle counting and k-core (truss ⊂ core). Every round's
    two-join support count and threshold unrolls into the oracle
    (operators/graph.py:ktruss_edges)."""
    from hierarchical_graph_db_spark.operators.graph import (
        ktruss_edges,
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    return ktruss_edges(edges, k=12, n_rounds=3)


@query(
    "graph_reciprocity_assortativity",
    f"""
    WITH e AS (
        SELECT DISTINCT src, dst FROM ({_SQL_EDGES}) WHERE src <> dst
    ),
    und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e
    ),
    adj AS (SELECT a AS u, b AS v FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
    pairs AS (
        SELECT du.d AS x, dv.d AS y
        FROM adj JOIN deg du ON adj.u = du.u
                 JOIN deg dv ON adj.v = dv.u
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs
    ),
    rec AS (
        SELECT CAST(count(*) AS BIGINT) AS n_directed,
               CAST(sum(CASE WHEN EXISTS (
                   SELECT 1 FROM e r
                   WHERE r.src = e.dst AND r.dst = e.src)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal
        FROM e
    )
    SELECT n_directed, n_reciprocal,
           round(n_reciprocal / CAST(n_directed AS DOUBLE), 6)
               AS reciprocity,
           CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
                THEN NULL
                ELSE round((m * sxy - sx * sy)
                           / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                                  * CAST(m * syy - sy * sy AS DOUBLE)), 6)
           END AS assortativity
    FROM rec CROSS JOIN mom
    """,
)
def graph_reciprocity_assortativity(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Two whole-network structure metrics in one pass: reciprocity (the
    fraction of directed edges whose reverse also exists — a semi-join
    count) and degree assortativity (Newman 2002, public method — Pearson
    correlation of endpoint degrees over the undirected adjacency). Every
    moment is an exact integer sum (degrees and counts are ints), so the
    single final expression is order-independent; the plan is two edge
    aggregates + two broadcast-sized degree joins, no iteration."""
    from hierarchical_graph_db_spark.operators.graph import (
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    e = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_directed = e.count()
    n_reciprocal = e.join(rev, ["src", "dst"], "left_semi").count()
    und = e.select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b")).distinct()
    adj = und.select(F.col("a").alias("u"), F.col("b").alias("v")) \
        .unionByName(und.select(F.col("b").alias("u"),
                                F.col("a").alias("v")))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pairs = (adj.join(deg, "u")
             .withColumnRenamed("d", "x")
             .join(deg.select(F.col("u").alias("v"), F.col("d").alias("y")),
                   "v"))
    mom = pairs.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return mom.select(
        F.lit(n_directed).cast("bigint").alias("n_directed"),
        F.lit(n_reciprocal).cast("bigint").alias("n_reciprocal"),
        F.round(F.lit(n_reciprocal) / F.lit(float(n_directed)), 6)
        .alias("reciprocity"),
        # Degree-variance guard (round 15, inherited sf0.001 crash): a
        # degenerate graph where every endpoint degree is equal has zero
        # variance — Pearson correlation is undefined and ANSI division
        # errored. Both engines now emit NULL for the undefined case; any
        # non-degenerate graph is bit-identical to the unguarded form.
        F.when(
            ((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")) == 0)
            | ((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")) == 0),
            F.lit(None).cast("double"),
        ).otherwise(
            F.round((F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    / F.sqrt((F.col("m") * F.col("sxx")
                              - F.col("sx") * F.col("sx")).cast("double")
                             * (F.col("m") * F.col("syy")
                                - F.col("sy") * F.col("sy")).cast("double")),
                    6)
        ).alias("assortativity"),
    )


def _modularity_oracle(n_iter: int = 5) -> str:
    ctes, last = _lpa_ctes(n_iter)
    return f"""
    WITH {ctes},
    und AS (
        SELECT DISTINCT least(a, b) AS x, greatest(a, b) AS y FROM sym
    ),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
    comm AS (SELECT id, community FROM {last}),
    deg AS (
        SELECT u AS id, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT x AS u FROM und UNION ALL SELECT y FROM und) t
        GROUP BY u
    ),
    dsum AS (
        SELECT c.community, CAST(sum(g.d) AS BIGINT) AS d_c,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM comm c JOIN deg g ON g.id = c.id
        GROUP BY c.community
    ),
    intra AS (
        SELECT ca.community, CAST(count(*) AS BIGINT) AS e_c
        FROM und
        JOIN comm ca ON ca.id = und.x
        JOIN comm cb ON cb.id = und.y AND cb.community = ca.community
        GROUP BY ca.community
    ),
    terms AS (
        SELECT d.community, d.n_nodes, d.d_c,
               coalesce(i.e_c, 0) AS e_c,
               4 * mm.m * coalesce(i.e_c, 0) - d.d_c * d.d_c AS num_term
        FROM dsum d
        LEFT JOIN intra i ON i.community = d.community
        CROSS JOIN mm
    )
    SELECT community, n_nodes, e_c, d_c,
           round(num_term / (4.0 * mm.m * mm.m), 6) AS contribution,
           round((SELECT CAST(sum(num_term) AS BIGINT) FROM terms)
                 / (4.0 * mm.m * mm.m), 6) AS modularity_q
    FROM terms CROSS JOIN mm
    """


@query("graph_lpa_modularity", _modularity_oracle())
def graph_lpa_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA communities — the quality score that
    tells you whether the partition is real structure or noise:
    Q = Σ_c (eᶜ/m − (d_c/2m)²), computed as ONE exact integer numerator
    Σ(4·m·e_c − d_c²) over 4m² (no per-community float summation — the
    rational form makes the fold order-independent; bigint-safe to
    m ≈ 10⁹ undirected edges, beyond which the numerator moves to
    decimal). Per-community rows carry (n_nodes, intra-edges, degree
    mass, contribution) plus the global Q. Communities come from the
    same 5-round deterministic LPA the registry already hash-checks."""
    from hierarchical_graph_db_spark.operators.graph import (
        label_propagation_communities,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    comm = label_propagation_communities(edges, n_iter=5)
    und = (edges.select(F.least("src", "dst").alias("x"),
                        F.greatest("src", "dst").alias("y"))
           .where(F.col("x") != F.col("y")).distinct()
           .transform(materialize))
    m = und.count()
    deg = (und.select(F.col("x").alias("id"))
           .unionByName(und.select(F.col("y").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    dsum = (comm.join(deg, "id")
            .groupBy("community")
            .agg(F.sum("d").cast("bigint").alias("d_c"),
                 F.count(F.lit(1)).alias("n_nodes")))
    ca = comm.select(F.col("id").alias("x"), F.col("community").alias("ca"))
    cb = comm.select(F.col("id").alias("y"), F.col("community").alias("cb"))
    intra = (und.join(ca, "x").join(cb, "y")
             .where(F.col("ca") == F.col("cb"))
             .groupBy(F.col("ca").alias("community"))
             .agg(F.count(F.lit(1)).cast("bigint").alias("e_c")))
    terms = (dsum.join(intra, "community", "left")
             .select("community", "n_nodes", "d_c",
                     F.coalesce("e_c", F.lit(0).cast("bigint")).alias("e_c"),
                     (F.lit(4 * m) * F.coalesce("e_c", F.lit(0))
                      - F.col("d_c") * F.col("d_c")).alias("num_term")))
    tot = terms.agg(F.sum("num_term").cast("bigint").alias("tot"))
    den = float(4.0 * m * m)
    return (
        terms.crossJoin(F.broadcast(tot))
        .select("community", "n_nodes", "e_c", "d_c",
                F.round(F.col("num_term") / F.lit(den), 6)
                .alias("contribution"),
                F.round(F.col("tot") / F.lit(den), 6).alias("modularity_q"))
    )


@query(
    "graph_rich_club",
    f"""
    WITH und AS (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM ({_SQL_EDGES}) WHERE src <> dst
    ),
    deg AS (
        SELECT u AS id, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT a AS u FROM und UNION ALL SELECT b FROM und) t
        GROUP BY u
    ),
    ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
    club AS (
        SELECT ks.k, deg.id
        FROM ks JOIN deg ON deg.d > ks.k
    ),
    stats AS (
        SELECT c.k, CAST(count(*) AS BIGINT) AS n_nodes
        FROM club c GROUP BY c.k
    ),
    ce AS (
        SELECT ca.k, CAST(count(*) AS BIGINT) AS n_edges
        FROM und
        JOIN club ca ON ca.id = und.a
        JOIN club cb ON cb.id = und.b AND cb.k = ca.k
        GROUP BY ca.k
    )
    SELECT s.k, s.n_nodes, coalesce(ce.n_edges, 0) AS n_edges,
           CASE WHEN s.n_nodes >= 2
                THEN round(2.0 * coalesce(ce.n_edges, 0)
                           / (s.n_nodes * (s.n_nodes - 1)), 6) END AS phi
    FROM stats s LEFT JOIN ce ON ce.k = s.k
    """,
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004, public method):
    edge density among the vertices of degree > k, for k ∈ {2,4,8,16} —
    do the hubs of the communication graph talk to each other more than
    chance? Pure integer counting (degree table → per-k membership →
    intra-club edge count via two keyed joins), one exact final ratio per
    k. The per-k fan-out joins the small degree table, never the fact."""
    from hierarchical_graph_db_spark.operators.graph import (
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    und = (sequential_interaction_edges(ev)
           .select(F.least(F.col("src").cast("string"),
                           F.col("dst").cast("string")).alias("a"),
                   F.greatest(F.col("src").cast("string"),
                              F.col("dst").cast("string")).alias("b"))
           .where(F.col("a") != F.col("b")).distinct()
           .transform(materialize))
    deg = (und.select(F.col("a").alias("id"))
           .unionByName(und.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d")))
    ks = und.sparkSession.createDataFrame([(2,), (4,), (8,), (16,)],
                                          "k int")
    club = ks.join(deg, deg.d > ks.k).select("k", "id")
    stats = club.groupBy("k").agg(F.count(F.lit(1)).alias("n_nodes"))
    ce = (und.join(club.withColumnRenamed("id", "a"), "a")
          .join(club.withColumnRenamed("id", "b")
                .withColumnRenamed("k", "kb"), "b")
          .where(F.col("k") == F.col("kb"))
          .groupBy("k").agg(F.count(F.lit(1)).cast("bigint")
                            .alias("n_edges")))
    return (
        stats.join(ce, "k", "left")
        .select(F.col("k").cast("bigint").alias("k"),
                "n_nodes",
                F.coalesce("n_edges", F.lit(0).cast("bigint"))
                .alias("n_edges"),
                F.when(F.col("n_nodes") >= 2,
                       F.round(F.lit(2.0)
                               * F.coalesce("n_edges", F.lit(0))
                               / (F.col("n_nodes")
                                  * (F.col("n_nodes") - 1)), 6))
                .alias("phi"))
    )


@query(
    "graph_path_length_sampled",
    f"""
    WITH RECURSIVE eu AS (
        SELECT src, dst FROM ({_SQL_EDGES})
        UNION
        SELECT dst AS src, src AS dst FROM ({_SQL_EDGES})
    ),
    bfs(source, id, distance) AS (
        SELECT s, s, 0
        FROM (VALUES ('1'), ('2'), ('3'), ('4')) seeds(s)
        UNION
        SELECT bfs.source, eu.dst, bfs.distance + 1
        FROM bfs JOIN eu ON bfs.id = eu.src
        WHERE bfs.distance < 6
    ),
    d AS (
        SELECT source, id, min(distance) AS dist
        FROM bfs GROUP BY source, id
    ),
    n AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_vertices FROM eu)
    SELECT source,
           CAST(count(*) - 1 AS BIGINT) AS n_reached,
           round((count(*) - 1)
                 / CAST((SELECT n_vertices FROM n) - 1 AS DOUBLE), 6)
               AS reach_fraction,
           round(sum(dist) / CAST(count(*) - 1 AS DOUBLE), 6)
               AS avg_distance,
           CAST(max(dist) AS BIGINT) AS eccentricity
    FROM d GROUP BY source
    """,
)
def graph_path_length_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-landmark path-length profile (Eppstein & Wang 2001 landmark
    sampling): vertices reached within 6 hops, reach fraction, mean
    shortest-path distance, and hop-bounded eccentricity — the
    small-world summary statistics, from ONE multi-source BFS shared by
    all 4 seeds (the harmonic-centrality frontier reused with a
    per-source aggregate instead of a per-vertex fold). Distance sums are
    exact integers; one division per source."""
    from hierarchical_graph_db_spark.operators.graph import (
        multi_source_distances,
        sequential_interaction_edges,
    )

    ev = Catalog(spark, sf_dir).events
    edges = sequential_interaction_edges(ev).select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    )
    d = multi_source_distances(edges, ["1", "2", "3", "4"], max_hops=6)
    sym = edges.select(F.col("src").alias("a")).unionByName(
        edges.select(F.col("dst").alias("a")))
    n_vertices = sym.distinct().count()
    return (
        d.groupBy("source")
        .agg((F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
             F.round((F.count(F.lit(1)) - 1)
                     / F.lit(float(n_vertices - 1)), 6)
             .alias("reach_fraction"),
             F.round(F.sum("distance")
                     / (F.count(F.lit(1)) - 1).cast("double"), 6)
             .alias("avg_distance"),
             F.max("distance").cast("bigint").alias("eccentricity"))
    )


# --- Strongly connected components (directed) ------------------------------
#
# SCC needs a DIRECTED graph with non-trivial cycle structure; the raw
# sequential-interaction graph is one giant SCC at every sf (measured round
# 11), so the query runs on its "strong ties" sparsification: the top-300
# most-active users, each keeping its 2 heaviest outgoing edges (weight
# desc, dst asc — deterministic). That rule is scale-invariant (~2·V edges
# at any sf: sf0.01 → 47 SCCs incl. a 104-vertex giant; sf0.1 → 215) and
# keeps the oracle's reachability closure bounded (≤ 300² pairs) — the
# ENGINE never builds a closure (see operators.graph.
# strongly_connected_components), only the DuckDB twin does.

_SQL_SCC_BASE = """
    tops AS (SELECT user_id FROM events
             GROUP BY user_id ORDER BY count(*) DESC, user_id LIMIT 300),
    raw AS (SELECT user_id AS src,
                   lead(user_id) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id) AS dst
            FROM events),
    w AS (SELECT CAST(src AS VARCHAR) s, CAST(dst AS VARCHAR) d,
                 count(*) AS wt
          FROM raw
          WHERE dst IS NOT NULL AND src <> dst
            AND src IN (SELECT user_id FROM tops)
            AND dst IN (SELECT user_id FROM tops)
          GROUP BY 1, 2),
    edges AS (SELECT s, d FROM (
        SELECT s, d, row_number() OVER (PARTITION BY s
                                        ORDER BY wt DESC, d) rn FROM w)
        WHERE rn <= 2),
    verts AS (SELECT s AS v FROM edges UNION SELECT d FROM edges),
    reach AS (WITH RECURSIVE r(a, b) AS (
                  SELECT s, d FROM edges
                  UNION
                  SELECT r.a, e.d FROM r JOIN edges e ON e.s = r.b)
              SELECT a, b FROM r),
    mutual AS (SELECT r1.a AS v, r1.b AS u
               FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
    scc AS (SELECT v.v AS id, least(v.v, coalesce(min(m.u), v.v)) AS scc
            FROM verts v LEFT JOIN mutual m ON m.v = v.v GROUP BY v.v)
"""


def _strong_tie_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-300-active-user, top-2-out-edge sparsification (Spark twin of
    ``_SQL_SCC_BASE``'s ``edges`` CTE). Tops is a 300-row broadcast; the
    weight agg is one shuffle on (src, dst); top-2 is a per-src window."""
    from pyspark.sql.window import Window

    ev = Catalog(spark, sf_dir).events
    tops = (ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
            .orderBy(F.col("n_ev").desc(), F.col("user_id")).limit(300)
            .select("user_id"))
    w = (
        sequential_interaction_edges(ev)
        .join(F.broadcast(tops.withColumnRenamed("user_id", "src")), "src")
        .join(F.broadcast(tops.withColumnRenamed("user_id", "dst")), "dst")
        .groupBy(F.col("src").cast("string").alias("s"),
                 F.col("dst").cast("string").alias("d"))
        .agg(F.count(F.lit(1)).alias("wt"))
    )
    win = Window.partitionBy("s").orderBy(F.col("wt").desc(), F.col("d"))
    return (w.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") <= 2)
            .select(F.col("s").alias("src"), F.col("d").alias("dst")))


@query(
    "graph_scc",
    f"""
    WITH {_SQL_SCC_BASE},
    sizes AS (SELECT scc, CAST(count(*) AS BIGINT) AS scc_size
              FROM scc GROUP BY scc)
    SELECT s.id, s.scc, z.scc_size FROM scc s JOIN sizes z ON s.scc = z.scc
    """,
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the strong-tie interaction graph:
    (id, scc, scc_size) with scc = lexicographic-min member (canonical, so
    the oracle's reachability-closure computation must agree exactly with
    the engine's FW-BW-MIN coloring — SCC is algorithm-independent)."""
    from hierarchical_graph_db_spark.operators.graph import (
        strongly_connected_components,
    )

    labels = strongly_connected_components(_strong_tie_edges(spark, sf_dir))
    sizes = labels.groupBy("scc").agg(
        F.count(F.lit(1)).cast("bigint").alias("scc_size"))
    return labels.join(sizes, on="scc").select("id", "scc", "scc_size")


@query(
    "graph_scc_condensation",
    f"""
    WITH {_SQL_SCC_BASE}
    SELECT sa.scc AS scc_src, sb.scc AS scc_dst,
           CAST(count(*) AS BIGINT) AS cross_edges
    FROM edges e
    JOIN scc sa ON sa.id = e.s
    JOIN scc sb ON sb.id = e.d
    WHERE sa.scc <> sb.scc
    GROUP BY 1, 2
    """,
)
def graph_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG of :func:`graph_scc`: one row per cross-SCC edge
    group (scc_src, scc_dst, cross_edges). Contracting SCCs always yields a
    DAG — the structure dependency-ordering / cycle-breaking passes run on.
    Same labels as graph_scc (one extra edge→label join, shuffle on id)."""
    from hierarchical_graph_db_spark.operators.graph import (
        strongly_connected_components,
    )

    edges = _strong_tie_edges(spark, sf_dir).transform(materialize)
    labels = strongly_connected_components(edges)
    return (
        edges
        .join(labels.select(F.col("id").alias("src"),
                            F.col("scc").alias("scc_src")), on="src")
        .join(labels.select(F.col("id").alias("dst"),
                            F.col("scc").alias("scc_dst")), on="dst")
        .where(F.col("scc_src") != F.col("scc_dst"))
        .groupBy("scc_src", "scc_dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cross_edges"))
    )


@query(
    "graph_scc_layers",
    f"""
    WITH {_SQL_SCC_BASE},
    cedges AS (SELECT DISTINCT sa.scc AS s, sb.scc AS d
               FROM edges e
               JOIN scc sa ON sa.id = e.s
               JOIN scc sb ON sb.id = e.d
               WHERE sa.scc <> sb.scc),
    sccs AS (SELECT scc, CAST(count(*) AS BIGINT) AS n_members
             FROM scc GROUP BY scc),
    lp AS (WITH RECURSIVE lpr(v, d) AS (
               SELECT scc, 0 FROM sccs
               UNION
               SELECT e.d, lpr.d + 1 FROM lpr JOIN cedges e ON e.s = lpr.v)
           SELECT v, max(d) AS layer FROM lpr GROUP BY v)
    SELECT s.scc, CAST(l.layer AS BIGINT) AS layer, s.n_members
    FROM sccs s JOIN lp l ON l.v = s.scc
    """,
)
def graph_scc_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dependency layering of the SCC condensation: collapse cycles
    (graph_scc), then longest-path layers over the resulting DAG — layer 0
    = sccs nothing points into, layer k = all prerequisites in layers < k.
    The engine's `dag_layers` is iterative max-relaxation (raises on a
    cycle, so it also re-validates that the condensation IS a DAG); the
    oracle computes the same fixpoint via a recursive CTE (UNION-deduped,
    so paths cap at |SCC|·depth rows)."""
    from hierarchical_graph_db_spark.operators.graph import (
        dag_layers,
        strongly_connected_components,
    )

    edges = _strong_tie_edges(spark, sf_dir).transform(materialize)
    labels = strongly_connected_components(edges).transform(materialize)
    cond = (
        edges
        .join(labels.select(F.col("id").alias("src"),
                            F.col("scc").alias("scc_src")), on="src")
        .join(labels.select(F.col("id").alias("dst"),
                            F.col("scc").alias("scc_dst")), on="dst")
        .where(F.col("scc_src") != F.col("scc_dst"))
        .select(F.col("scc_src").alias("src"), F.col("scc_dst").alias("dst"))
        .distinct()
    )
    layers = dag_layers(cond)
    sizes = labels.groupBy("scc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"))
    return (
        sizes.join(layers.withColumnRenamed("id", "scc"), on="scc",
                   how="left")
        .select("scc",
                F.coalesce("layer", F.lit(0)).cast("bigint").alias("layer"),
                "n_members")
    )


@query(
    "thread_reply_layers",
    """
    SELECT CAST(length(bin(event_id)) - 1 AS BIGINT)  AS layer,
           CAST(count(*) AS BIGINT)                   AS n_messages,
           CAST(sum(event_id) AS BIGINT)              AS sum_message_id,
           CAST(min(event_id) AS BIGINT)              AS min_message_id,
           CAST(max(event_id) AS BIGINT)              AS max_message_id
    FROM events
    WHERE event_id >= 1
    GROUP BY 1
    """,
)
def thread_reply_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reply-depth layering of the synthesized message reply FOREST — the
    dependency-scheduling consumer for :func:`operators.graph.dag_layers`
    that runs the DISTRIBUTED relaxation path at driver-check scale
    (VERDICT r11 #7): message ``e`` replies to message ``e >> 1`` (a
    binary reply tree rooted at message 1), giving |V| = |events| − 1
    vertices — 9,999 at sf0.01, ABOVE the 4096 hybrid driver-finish
    cutoff, so unlike ``graph_scc_layers`` (whose condensation is tiny)
    every driver-green row here exercises the distributed max-relaxation
    fixpoint, not the driver Kahn kernel. Depth is log2(N) — ~13 rounds
    at sf0.01, ~20 at sf1, safely under dag_layers' max_iter=64 at ANY
    realistic scale (the per-user event-chain alternative would need
    depth ≈ max chain length — a scale cliff; the balanced forest is the
    shape that survives 100 TB).

    Output: one row per reply depth with the message count and the
    min/max/SUM of message ids — the sum is an exact membership
    fingerprint, so a single vertex assigned to the wrong layer by the
    relaxation loop flips two rows' hashes even if the counts happened to
    balance. Oracle: in the binary tree rooted at 1, depth(v) is exactly
    bit_length(v) − 1 (float-free via length(bin(v))), so DuckDB needs no
    recursive CTE — the closed form checks the whole fixpoint.

    ASSUMPTION (load-bearing for the oracle, r12 ADVICE): event_ids must
    be contiguous from 1, which the generator guarantees (TESTDATA.md).
    A gap at id g would make g's orphaned children dag_layers SOURCES
    (layer 0) and introduce the synthetic parent vertex g on the Spark
    side only, while the closed form still reports bit_length−1 — i.e. a
    fixture change that breaks contiguity fails this query's hash check
    BY DESIGN (loudly, not silently); re-derive the oracle with a
    recursive parent-chain CTE if the fixture contract ever changes."""
    from hierarchical_graph_db_spark.operators.graph import dag_layers

    ev = Catalog(spark, sf_dir).events
    edges = (
        ev.where(F.col("event_id") >= 2)
        .select(F.shiftright("event_id", 1).alias("src"),
                F.col("event_id").alias("dst"))
    )
    layers = dag_layers(edges)
    return (
        layers.groupBy(F.col("layer").cast("bigint").alias("layer"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_messages"),
             F.sum("id").cast("bigint").alias("sum_message_id"),
             F.min("id").cast("bigint").alias("min_message_id"),
             F.max("id").cast("bigint").alias("max_message_id"))
    )
