"""Graph operators for dedup canonicalization.

Near-dup detection (dedup.py) yields PAIRS; an actual 100 TB dedup
pass needs CLUSTERS — transitive closure over the pair graph, one
canonical survivor per cluster (the reference's dedup notion is
row-level DISTINCT in BigQuery; pair->cluster collapse is the scale
extension every pre-training pipeline runs after MinHash).

Implementation: iterative min-label propagation on DataFrames.
label(v) starts as v's own id; each round every vertex takes the min
of its label and its neighbors' labels; fixpoint = connected
components, cluster id = min vertex id in the component.  Rounds
needed = graph diameter — near-dup graphs are unions of small dense
cliques (diameter ~2-3), so this converges in a handful of shuffles.
For adversarial long-chain graphs the published fix is the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), implemented below as
``connected_components_star``: O(log^2 n) rounds regardless of
diameter, same join+groupBy-shaped inner loop.  Min-label propagation
stays the default (near-dup graphs are diameter-2..3 cliques where it
needs fewer shuffles); ``connected_components`` falls back to the
star algorithm instead of raising when a pathological diameter
exhausts its round budget.

Each round ends in ``localCheckpoint(eager=True)``: iterative plans
otherwise nest one join deeper per round and Catalyst re-analysis
goes quadratic (on a real cluster use ``checkpoint()`` to a reliable
store for fault tolerance; localCheckpoint trades lineage-based
recovery for speed, which is the right trade in local mode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from ..functions.fingerprint import fingerprint_cols

# Which backend the most recent closure() call used ("doubling" or
# "star") — observability for tests and oracle queries pinning the
# automatic selection (VERDICT r7 item 6); scalar-only, never data.
LAST_BACKEND: str | None = None

# How the most recent component/closure call EXECUTED its backend:
# "local" (driver finish below the broadcast-class threshold) or
# "distributed" (the iterative loops).  Observability only — results
# are bit-identical by construction and pinned equal in tests.
LAST_EXECUTION: str | None = None

# r15 (optimization round, guide §1.2 step 1): every iterative graph
# loop here pays a FIXED per-round cost (2-4 stages of scheduling, a
# localCheckpoint or parquet-spill materialization) that dwarfs the
# data work once the frontier is broadcast-class — measured 10.7 s for
# large-star/small-star on a 25-edge ring and 8.7 s for min-label on a
# few-hundred-pair dedup graph at sf0.1, i.e. >95% pure overhead.  So
# below this row threshold the loop is replaced by the SAME algorithm
# run on the driver (union-find for components — identical to the
# star/min-label fixpoint: component = min reachable id; memoized
# pointer-chase for forests — identical to the doubling fixpoint, with
# the same cycle⇒None contract), and the result ships back as one
# broadcast join.  This is the broadcast-join pattern applied to
# iteration: decisions computed where the data is small, the big side
# touched once.  2M rows ≈ 32 MB of longs on the driver — the same
# class as the session's 64 MB broadcast threshold; override (or
# disable with 0) via the env knob for cluster profiles.  The
# distributed loops are unchanged above the threshold and remain
# pinned by tests, which also pin local == distributed on the same
# graphs.
_LOCAL_ROWS_ENV = "SPARK_GRAFT_GRAPH_LOCAL_ROWS"

# Per-operator defaults from the r16 measured crossover (VERDICT r15
# #6; 32 cores, diameter-2 clique graphs — the DISTRIBUTED loops' best
# case, so these are conservative).  Observed-row threshold at which
# local (Arrow collect + driver fixpoint + broadcast ship-back) and
# distributed (iterative loop) break even:
#
#   min-label CC   ~250k-375k rows (local 2.15 vs 2.54 s at 150k und
#                  rows; 4.01 vs 3.80 at 375k) -> default 250k
#   large/small-star ~750k rows (2.77 vs 4.80 at 190k; 10.6 vs 9.7 at
#                  750k — star pays two passes/round) -> default 500k
#   closure        local still 2.3x faster at 4M edges (8.9 vs
#                  20.1 s; one chase vs log-depth spill rounds), but
#                  the default stays 2M: a 4M-entry Python dict is
#                  ~0.5 GB of driver heap, the wrong default for a
#                  shared driver -> default 2M
#
# The env knob still overrides ALL of them (0 disables, huge forces
# local — how tests pin both executions); the measured table lives in
# PLANS.md round-16.
_LOCAL_ROWS_CC = 250_000
_LOCAL_ROWS_STAR = 500_000
_LOCAL_ROWS_CLOSURE = 2_000_000


def _local_rows_limit(default: int = 2_000_000) -> int:
    try:
        return int(os.environ.get(_LOCAL_ROWS_ENV, str(default)))
    except ValueError:  # pragma: no cover - malformed override
        return default


def _uf_component_min(pairs) -> dict:
    """Union-find over an edge iterable -> {node: min id of its
    component} — the exact fixpoint both distributed component loops
    converge to.  Python int/str comparison matches Spark's ordering
    for the integer and UTF8-binary string keys the engine uses."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    mins: dict = {}
    for v in parent:
        r = find(v)
        if r not in mins or v < mins[r]:
            mins[r] = v
    return {v: mins[find(v)] for v in parent}


def _labels_out(
    ids: DataFrame,
    id_col: str,
    comp: dict,
    label_type,
    out_col: str = "component",
) -> DataFrame:
    """(id, out_col) for every vertex: computed labels via one
    broadcast join, untouched vertices their own id — the exact output
    contract of the distributed loops.  ``ids`` is a single-column
    ``vid`` frame (pre-checkpointed by callers so the vertices lineage
    runs ONCE).  The result is eagerly localCheckpoint-ed: the
    distributed loops return selects over per-round checkpoints, so
    consumers re-run only a cheap scan — without this the local path's
    broadcast join re-ran the full vertices lineage per consumer
    (measured: q_dedup_pipeline's CC stayed at ~7 s local because its
    vertex frame is the exact-collapse semi-join, re-evaluated by
    every downstream aggregate)."""
    from pyspark.sql.types import StructField, StructType

    spark = ids.sparkSession
    schema = StructType(
        [
            StructField("vid", label_type),
            StructField("_lbl", label_type),
        ]
    )
    if comp:
        # ship the labels back through Arrow, not pickled Rows (r16,
        # VERDICT r15 #6): at the 2M-row threshold the row path is
        # seconds of driver serialization; an Arrow table is one
        # columnar copy
        import pyarrow as pa

        from pyspark.sql.pandas.types import to_arrow_type

        at = to_arrow_type(label_type)
        ldf = spark.createDataFrame(
            pa.table(
                {
                    "vid": pa.array(list(comp.keys()), type=at),
                    "_lbl": pa.array(list(comp.values()), type=at),
                }
            ),
            schema,
        )
    else:
        ldf = spark.createDataFrame([], schema)
    return (
        ids.join(F.broadcast(ldf), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.coalesce(F.col("_lbl"), F.col("vid")).alias(out_col),
        )
        .localCheckpoint(eager=True)
    )


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex; component = min id reachable.
    Vertices with no edges are their own singleton component.  After
    ``max_iter`` non-converged rounds (pathological diameter) it falls
    back to ``connected_components_star``, which is O(log^2 n) rounds
    regardless of diameter."""
    global LAST_EXECUTION
    # undirected: materialize both directions once (edge count observed
    # during the same job — it decides local vs distributed execution)
    obs_e = Observation()
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    if (obs_e.get["n"] or 0) <= _local_rows_limit(_LOCAL_ROWS_CC):
        # broadcast-class frontier: finish on the driver (see the
        # module threshold note).  Min-label semantics: only edges
        # whose BOTH endpoints are labeled vertices propagate (an
        # endpoint outside the vertex set carries no label), so filter
        # before collecting.
        LAST_EXECUTION = "local"
        # checkpoint the id frame so the vertices lineage runs ONCE
        # (it feeds two semi-joins here plus the output join below)
        vin = vertices.select(F.col(id_col).alias("vid")).localCheckpoint(
            eager=True
        )
        filt = und.join(
            vin.withColumnRenamed("vid", "d"), "d", "left_semi"
        ).join(vin.withColumnRenamed("vid", "s"), "s", "left_semi")
        # Arrow collect (r16, VERDICT r15 #6): near the 2M-row gate the
        # pickled-Row path is seconds of driver deserialization; Arrow
        # moves two columns and to_pylist yields plain ints/strs
        edges_t = filt.select("s", "d").toArrow()
        comp = _uf_component_min(
            zip(
                edges_t.column("s").to_pylist(),
                edges_t.column("d").to_pylist(),
            )
        )
        return _labels_out(
            vin, id_col, comp, vertices.schema[id_col].dataType
        )
    LAST_EXECUTION = "distributed"
    # Convergence probe = count of rows the round CHANGED (nmin <
    # label), observed DURING the round's own localCheckpoint job
    # (r15, guide §1.4 applied to iteration: one job per round, not
    # checkpoint + separate agg).  Type-agnostic on purpose — the
    # pre-r15 sum(label) probe ANSI-crashed on STRING vertex ids in
    # the distributed loop (latent: every driver graph is numeric;
    # caught by the r15 local==distributed string-id parity test) —
    # and it sees the fixpoint in the round that reaches it, where
    # sum-comparison needed one more round to observe no movement.
    labels = vertices.select(
        F.col(id_col).alias("vid"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.d == labels.vid)
            .groupBy("s")
            .agg(F.min("label").alias("nmin"))
        )
        obs = Observation()
        labels = (
            labels.join(
                neighbor_min, labels.vid == neighbor_min.s, "left"
            )
            .observe(
                obs,
                F.count(
                    F.when(F.col("nmin") < F.col("label"), 1)
                ).alias("chg"),
            )
            .select(
                "vid",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        if not (obs.get["chg"] or 0):
            return labels.select(
                F.col("vid").alias(id_col), F.col("label").alias("component")
            )
    # Pathological diameter (a >25-hop chain in a near-dup graph means
    # something very unusual, but correctness must not depend on graph
    # shape): hand off to the diameter-independent algorithm.
    return connected_components_star(
        vertices, edges, id_col=id_col, src_col=src_col, dst_col=dst_col
    )


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log^2 n) rounds REGARDLESS of graph
    diameter, where min-label propagation needs diameter rounds.

    Each round is two groupBy+join passes over the edge set:

    - large-star: per center u over BOTH edge directions, let
      m = min(neighbors ∪ {u}); re-point every neighbor v > u at m.
    - small-star: per center u over only its smaller-or-equal
      neighbors, let m = min(neighbors ∪ {u}); re-point u and its
      other small neighbors at m.

    Both steps preserve connectivity and monotonically shrink edge
    endpoints toward the component minimum; at fixpoint the edge set
    is a star per component, rooted at the minimum id.  Convergence is
    detected by an order-insensitive (count, hash-sum) probe — two
    1-row aggregates, no change-count join.  ``localCheckpoint`` per
    round for the same quadratic-re-analysis reason as min-label
    propagation (module docstring).
    """
    global LAST_EXECUTION
    obs_e = Observation()
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    if (obs_e.get["n"] or 0) <= _local_rows_limit(_LOCAL_ROWS_STAR):
        # broadcast-class edge set: the star fixpoint IS component =
        # min id over the undirected graph (including non-vertex
        # endpoint ids, which contraction passes through) — compute it
        # on the driver (module threshold note) and join out.
        LAST_EXECUTION = "local"
        edges_t = e.select("u", "v").toArrow()  # r16: Arrow, not Rows
        comp = _uf_component_min(
            zip(
                edges_t.column("u").to_pylist(),
                edges_t.column("v").to_pylist(),
            )
        )
        return _labels_out(
            vertices.select(F.col(id_col).alias("vid")),
            id_col,
            comp,
            e.schema["u"].dataType,
        )
    LAST_EXECUTION = "distributed"
    probe_prev = None
    for _ in range(max_iter):
        # -- large-star ---------------------------------------------
        both = e.select(F.col("u").alias("c"), F.col("v").alias("n")).union(
            e.select(F.col("v").alias("c"), F.col("u").alias("n"))
        )
        mins = both.groupBy("c").agg(
            F.min("n").alias("nmin")
        )  # m = min(neighbors ∪ {self})
        m = F.least(F.col("nmin"), F.col("c"))
        large = (
            both.join(mins, "c")
            .filter(F.col("n") > F.col("c"))
            .select(m.alias("u"), F.col("n").alias("v"))
        )  # m <= c < n, so (u, v) is already canonical u < v
        e = large.distinct()
        # -- small-star ---------------------------------------------
        # center = larger endpoint; neighbors considered are < center
        small_nbrs = e.select(F.col("v").alias("c"), F.col("u").alias("n"))
        mins2 = small_nbrs.groupBy("c").agg(F.min("n").alias("m"))
        re_pointed = (
            small_nbrs.join(mins2, "c")
            .filter(F.col("n") != F.col("m"))
            .select(F.col("m").alias("u"), F.col("n").alias("v"))
        )
        center_edge = mins2.select(
            F.col("m").alias("u"), F.col("c").alias("v")
        )
        obs = Observation()
        e = (
            re_pointed.union(center_edge)
            .select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .distinct()
            # order-insensitive (count, hash-sum) probe computed DURING
            # the checkpoint job (r15) — no separate fingerprint pass
            .observe(obs, *fingerprint_cols(["u", "v"]))
            .localCheckpoint(eager=True)
        )
        row = obs.get
        probe = (row["fp_n"], row["fp_h"] or 0)
        if probe_prev == probe:
            break
        probe_prev = probe
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # fixpoint edge set is a star per component: (root, v). Every
    # vertex's component = min(self, neighbors); singletons = self.
    member = e.select(F.col("v").alias("vid"), F.col("u").alias("comp"))
    root = e.select(F.col("u").alias("vid"), F.col("u").alias("comp"))
    labels = (
        member.union(root).groupBy("vid").agg(F.min("comp").alias("comp"))
    )
    ids = vertices.select(F.col(id_col).alias("vid"))
    return (
        ids.join(labels, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.coalesce(F.col("comp"), F.col("vid")).alias("component"),
        )
    )


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, algorithm: str = "minlabel"
) -> DataFrame:
    """Cluster assignment + canonical-survivor marking from a near-dup
    pair table (columns doc_id_a/doc_id_b, e.g. ngram_jaccard_pairs or
    minhash_lsh_pairs output): every doc gets the cluster id (min
    doc_id of its component), the cluster size, and an is_canonical
    flag on the survivor.  Downstream keeps ``is_canonical`` rows —
    the standard pair->cluster->survivor collapse after MinHash.

    ``algorithm``: "minlabel" (default; fewest shuffles on the
    clique-shaped graphs near-dup detection emits, with automatic
    star fallback) or "star" (diameter-independent from round one)."""
    cc = (
        connected_components_star
        if algorithm == "star"
        else connected_components
    )
    comps = cc(
        docs.select("doc_id"),
        pairs.select("doc_id_a", "doc_id_b"),
        id_col="doc_id",
        src_col="doc_id_a",
        dst_col="doc_id_b",
    ).withColumnRenamed("component", "cluster_id")
    # cluster_size via a keyed window: one exchange over the labels
    # instead of groupBy + rejoin (r15, guide §2.4) — at corpus scale
    # the sizes side is cluster-count-sized (NOT broadcast-class), so
    # the join form degrades to a second full shuffle + sort-merge;
    # the window shuffles the labels once.  A consumer that drops
    # cluster_size also drops the window (column pruning), which the
    # join form never could.  Values identical: count over the
    # cluster_id partition == the joined group count.  Mega-cluster
    # skew (one boilerplate cluster owning the corpus -> one window
    # partition, which AQE skew handling never splits) is bounded by
    # WindowExec's external-sort spill — measured r16: a single
    # 2M-row cluster's window costs ~0.8 s, the same as the join form
    # (whose sizes side is ONE row there), pinned by
    # test_dedup_clusters_mega_cluster_window_bounded.
    return comps.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def closure(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    child_col: str = "child",
    parent_col: str = "parent",
) -> DataFrame:
    """(id, root) transitive closure with AUTOMATIC backend selection
    (VERDICT r6 item 8): users shouldn't have to know which closure
    algorithm survives their graph shape at 100 TB.

    - **Forest shape** (every child has exactly one parent, no
      cycles): POINTER DOUBLING — each round composes the
      parent-pointer table with itself (next = next∘next), so a
      depth-D forest resolves in ceil(log2 D) self-joins and ``root``
      is the true pointer-chase terminus (the actual forest root,
      independent of id order).  This replaces the recursive-CTE walk
      the helper first shipped with: the CTE's iteration count equals
      the DEPTH, and measured 213 s on a 2000-deep chain vs ~6 s for
      doubling (PLANS.md round-7) — the CTE remains the right tool
      when depth is known-small (q_sql_recursive's 30-minute session
      chains), never for closure over unknown shapes.
    - **Multi-parent or cyclic** (where path-enumerating recursion
      re-derives a row per path — exponential on high-fanout DAGs —
      or never terminates): large-star/small-star components over the
      undirected graph.  ``root`` = the component minimum, the
      canonical representative when "the" root is not unique.

    Selection: edges are NORMALIZED first — duplicate rows collapse
    (a doubled edge is still one parent), self-loops drop (the
    standard root-points-to-itself encoding marks a root, it isn't a
    second parent), and edges referencing ids outside the vertex set
    are ignored — then a 1-row max-in-degree probe routes multi-parent
    graphs to star, and the doubling loop detects cycles two ways
    (no fixpoint within 64 rounds, or a "root" that still has an
    outgoing parent edge — a 2^k-cycle converges to self-pointers)
    and falls back to star.  All probes are scalar aggregates — no
    corpus-sized driver traffic."""
    global LAST_BACKEND, LAST_EXECUTION
    ch, pa = F.col(child_col), F.col(parent_col)
    verts = vertices.select(F.col(id_col).alias("id"))
    obs_e = Observation()
    e_norm = (
        edges.select(ch.alias("child"), pa.alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .distinct()
        .join(verts.withColumnRenamed("id", "child"), "child", "left_semi")
        .join(verts.withColumnRenamed("id", "parent"), "parent", "left_semi")
        .select("child", "parent")
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    star = lambda: connected_components_star(  # noqa: E731
        vertices, e_norm, id_col=id_col, src_col="child", dst_col="parent"
    ).withColumnRenamed("component", "root")
    if (obs_e.get["n"] or 0) <= _local_rows_limit(_LOCAL_ROWS_CLOSURE):
        # broadcast-class edge set (r15, observed during the e_norm
        # checkpoint job): every probe the distributed path pays as a
        # separate Spark job (multi-parent groupBy-max, the all-cycle
        # root count, the doubling init spill) is answerable on the
        # driver from ONE collect of the checkpointed edges — a forest
        # has <= |V| edges, so this gate subsumes the old |V|-gated
        # local path in _pointer_double.  Backend SELECTION semantics
        # are bit-identical: a duplicate child == multi_parent > 1 ->
        # star; a cycle in the chase == the doubling loop's
        # no-fixpoint/fake-root detection -> star; else the memoized
        # chase IS the doubling fixpoint.
        LAST_EXECUTION = "local"
        et = e_norm.toArrow()  # r16: Arrow, not pickled Rows
        nx: dict = {}
        multi = False
        for c, p in zip(
            et.column("child").to_pylist(), et.column("parent").to_pylist()
        ):
            if c in nx:
                multi = True
                break
            nx[c] = p
        roots: dict | None = {}
        if multi:
            roots = None
        else:
            for v0 in nx:
                chain = []
                x = v0
                while x not in roots:
                    if x not in nx:
                        roots[x] = x  # chase terminus: a true root
                        break
                    chain.append(x)
                    if len(chain) > len(nx):
                        roots = None  # cycle: not a forest
                        break
                    x = nx[x]
                if roots is None:
                    break
                rt = roots[x]
                for c in chain:
                    roots[c] = rt
        if roots is None:
            LAST_BACKEND = "star"
            return star()
        LAST_BACKEND = "doubling"
        return _labels_out(
            verts.select(F.col("id").alias("vid")),
            id_col,
            roots,
            verts.schema["id"].dataType,
            out_col="root",
        )
    multi_parent = (
        e_norm.groupBy("child")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0][0]
    )
    if multi_parent is not None and multi_parent > 1:
        LAST_BACKEND = "star"
        return star()
    # A forest has >=1 root per tree (a vertex with NO parent edge);
    # a graph where EVERY vertex has a parent is all-cycles — route
    # straight to star instead of burning the doubling loop's full
    # log2|V| no-fixpoint bound to find out (measured ~6 wasted
    # spill rounds on a planted ring).  One left_anti scalar count.
    if multi_parent is not None:
        n_roots = verts.join(
            e_norm.select("child"), verts.id == F.col("child"), "left_anti"
        ).count()
        if n_roots == 0:
            LAST_BACKEND = "star"
            return star()
    walked = _pointer_double(verts, e_norm)
    if walked is None:  # cycle detected — not a forest
        LAST_BACKEND = "star"
        return star()
    LAST_BACKEND = "doubling"
    return walked.select(F.col("id").alias(id_col), "root")


def _pointer_double(
    verts: DataFrame, e_norm: DataFrame, max_rounds: int = 64
) -> DataFrame | None:
    """Forest root resolution by pointer doubling: next(v) starts as
    parent(v) (roots point at themselves), then next = next∘next per
    round — after k rounds next(v) = parent^(2^k)(v), so a depth-D
    forest is at fixpoint in ceil(log2 D) rounds.  localCheckpoint per
    round for the same lineage reason as the other iterative loops in
    this module; convergence by the shared order-insensitive
    fingerprint probe.

    Returns None when the graph is NOT a forest: no fixpoint within
    ``max_rounds`` (a cycle whose length isn't a power of two keeps
    permuting), or a fixpoint whose "roots" still have outgoing parent
    edges (a 2^k-length cycle converges to next(v) = v).  64 rounds
    bounds resolvable depth at 2^64 — effectively unbounded.

    Each round SPILLS to parquet instead of localCheckpoint-ing:
    iterated SELF-joins of a checkpointed frame go superexponential in
    driver/scheduling time past ~17 rounds (measured 0.2 s -> 250 s/
    round by round 24; reliable checkpoint() shows the identical
    cliff, while joins against a STATIC table stay flat — so it's the
    self-join plan, not RDD lineage).  A fresh parquet relation per
    round is flat at ~0.35 s/round indefinitely, and on a real
    cluster the spill is the standard durable iteration checkpoint
    anyway.  The final result is localCheckpoint-ed (single op, no
    loop) so the spill directory can be deleted before returning."""
    import shutil
    import tempfile
    import uuid

    global LAST_EXECUTION
    spark = verts.sparkSession
    scratch = os.path.join(
        tempfile.gettempdir(),
        "fpl_spark_scratch",
        "pointer_double",
        uuid.uuid4().hex[:12],
    )

    def spill(df: DataFrame, name: str) -> DataFrame:
        p = os.path.join(scratch, name)
        df.write.parquet(p)
        return spark.read.parquet(p)

    try:
        # convergence probes ride the spill write via ``observe`` (r15):
        # one job per round — the previous per-round df_fingerprint was
        # a second full pass over the freshly spilled table.
        obs0 = Observation()
        nxt = spill(
            verts.join(e_norm, verts.id == e_norm.child, "left")
            .select(verts.id, F.coalesce("parent", verts.id).alias("nxt"))
            .observe(obs0, F.count(F.lit(1)).alias("n")),
            "init",
        )
        n = obs0.get["n"]  # |V|, free: counted during the init write
        # NOTE (r15): no local fast path HERE — closure() gates on the
        # observed EDGE count (a forest has <= |V| edges, so any graph
        # the old |V|-gated path here could catch is caught earlier,
        # before the init spill is even built).
        LAST_EXECUTION = "distributed"
        # Depth <= |V|, so a forest is at fixpoint within
        # ceil(log2 |V|) rounds (+1 to OBSERVE the fixpoint via a
        # change-free composition) — burning all 64 rounds to detect an
        # odd cycle would be ~60 wasted full-table self-joins.
        bound = min(max_rounds, max(1, (max(int(n), 2) - 1).bit_length()) + 1)
        prev_dir = os.path.join(scratch, "init")
        for r in range(bound):
            a, b = nxt.alias("a"), nxt.alias("b")
            obs = Observation()
            # pending = rows whose pointer this composition CHANGES
            # (new nxt = b.nxt, old nxt = b.id): 0 pending means the
            # round reproduced its input — the fixpoint, observed in
            # the same job that writes it (old shape: spill, then a
            # separate fingerprint job, then one MORE round to see the
            # fingerprint repeat)
            nxt = spill(
                a.join(b, F.col("a.nxt") == F.col("b.id"))
                .select(
                    F.col("a.id").alias("id"),
                    F.col("b.nxt").alias("nxt"),
                    (F.col("b.id") != F.col("b.nxt")).alias("_moved"),
                )
                .observe(
                    obs,
                    F.sum(F.col("_moved").cast("long")).alias("pending"),
                )
                .drop("_moved"),
                f"r{r}",
            )
            # only the latest spill is ever re-read: drop the previous
            # round's copy so transient scratch stays at ~2 table
            # copies, not rounds x table size
            shutil.rmtree(prev_dir, ignore_errors=True)
            prev_dir = os.path.join(scratch, f"r{r}")
            if not (obs.get["pending"] or 0):
                break
        else:
            return None  # no fixpoint within the depth bound: cyclic
        # A genuine root has no parent edge; a 2^k-cycle's
        # self-pointing fixpoint fails this (every cycle node has an
        # outgoing edge).
        fake_roots = (
            nxt.select(F.col("nxt").alias("child"))
            .distinct()
            .join(e_norm.select("child").distinct(), "child", "left_semi")
            .count()
        )
        if fake_roots:
            return None
        return nxt.select("id", F.col("nxt").alias("root")).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Per-vertex triangle census over an undirected pair graph:
    degree, wedge count (d choose 2) and triangle membership, plus the
    local clustering coefficient — the cluster-density diagnostics a
    near-dup graph audit runs before choosing dedup survivors (a
    high-degree, low-coefficient node is a template/boilerplate hub,
    not a genuine duplicate cluster).

    Triangles enumerate via the ORDERED orientation (every edge kept
    as a<b only): each triangle a<b<c matches exactly one
    (p1=(a,b), p2=(b,c), p3=(a,c)) triple, so the count needs no
    dedup and the heavy side of the join fans out by the ordered —
    not total — degree (the standard degree-reduction; at 100 TB
    orient by (degree, id) instead of raw id to shave hubs).  Two
    self-joins on edge endpoints; no Python."""
    # the edge table is referenced FIVE times below (degree union 2x,
    # triangle join 3x): materialize once or an expensive pair source
    # (the exact gram self-join) re-runs per reference — measured 43 s
    # at sf0.01 for q_graph_triangles, the CLAUDE.md
    # persist-before-self-join trap (r15).  localCheckpoint, not
    # persist: pair-table-sized, no cache pin to leak.
    e = pairs.select(
        F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
    ).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    per_vertex = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    wedges = (F.col("degree") * (F.col("degree") - 1) / 2).cast("long")
    return (
        deg.join(per_vertex, "v", "left")
        .select(
            F.col("v").alias("doc_id"),
            "degree",
            wedges.alias("wedges"),
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                wedges > 0,
                F.round(F.coalesce(F.col("triangles"), F.lit(0)) / wedges, 6),
            ).alias("clustering_coef"),
        )
    )
