"""Graph analytics: PageRank over an edge table.

The second iterative-fixpoint operator family in the repo (the first
is the connected-components loop in operators/dedup.py) — kept
deliberately parallel to it in its scale discipline:

- Every iteration is ONE keyed shuffle (contributions grouped by
  destination) plus broadcast-scale scalars (dangling mass, delta).
- The only driver round-trips are loop control: a 2-scalar collect per
  iteration (convergence delta + dangling mass), never rank data.
- Per-iteration frames are persisted through caching.persist_tracked
  and the PREVIOUS iteration is released as soon as the next one
  materializes — bounded ~2-iteration block storage at any graph size
  (the dedup CC loop's bookkeeping argument, restated).
- Ranks are rounded to 10 decimal digits at every iteration boundary,
  so the float-summation order inside a groupBy cannot leak across
  iterations: re-runs converge bit-identically unless a sum lands
  exactly on a rounding boundary (measure-zero on real data) — the
  same stabilization the oracle-facing keys apply before comparisons.

PageRank itself is the standard damped formulation (Page et al. 1999):
    r' = (1-d)/N + d * (Σ_in r_j / outdeg_j + dangling/N)
with dangling mass redistributed uniformly. Convergence = max |Δr| <
tol, checked per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rounding import round_half_up
from . import caching

#: iteration-boundary rounding — see module docstring
_RANK_SCALE = 10

#: pagerank frontier gate (see the broadcast_frontier note in
#: _pagerank_loop): at or below this node count the per-iteration
#: share table broadcasts; above it the loop uses partitioning-aligned
#: shuffled-hash joins. Module constant so tests / A-B harnesses can
#: force the big-graph path on small data.
#: r17 (VERDICT r16 #8): lowered 2M → 200k on paired sf1/sf10 A/Bs.
#: Both contribution-join sides are hash(·, p)-partitioned caches, so
#: the non-broadcast path is exchange-free and (with the shuffle_hash
#: hint below) sort-free; the broadcast only buys skipping a bounded
#: n_nodes/p per-task hash build, while costing a FRESH n_nodes-row
#: relation built and shipped EVERY iteration. Measured interleaved:
#: 200k nodes (sf1) broadcast 17.1 s vs partitioned-SHJ 16.8 s (wash);
#: 2M nodes (sf10) broadcast 146.8 s vs 133.1 s (1.10×) — outputs
#: equal at sf0.01/sf0.1 (the per-iteration round_half_up snap makes
#: both paths' sums land identically). Below 200k the per-iteration
#: relation is trivially small and broadcast keeps the join map-only.
_PAGERANK_BROADCAST_NODE_CAP = 200_000

#: triangle_stats broadcast gate: with at most this many (oriented)
#: edges the closure edge set (~16 B/row + relation overhead) and the
#: degree table stay comfortably inside a single executor broadcast —
#: above it the wedge probe falls back to a keyed semi-join
_TRIANGLE_BROADCAST_EDGE_CAP = 5_000_000

#: triangle_stats closure-build budget: max packed-long edge keys per
#: task when the closure semi-join runs as a SHUFFLED-HASH join (r16).
#: SHJ cannot spill its build side, so the closure side is
#: repartitioned to ceil(n_edges / this) partitions — ~1.4M keys is a
#: ~64 MB LongHashedRelation per task, which 32 concurrent local task
#: slots sustain beside the edge cache (the unsized build at sf10 —
#: 120M keys / 32 partitions — died with "Can't acquire 134217728
#: bytes memory to build hash relation"). Scale-adaptive: partitions
#: derive from the measured edge count, not from a constant tuned to
#: either local mode or one cluster shape.
_TRIANGLE_CLOSURE_KEYS_PER_TASK = 1_400_000

#: triangle_stats wedge-slice budget (rows per closure semi-join).
#: Above the broadcast gate the wedge-candidate stream (Σ C(outdeg,2)
#: rows) becomes a real EXCHANGE; its size is data-dependent and can
#: dwarf the input by orders of magnitude (the sf10 co-purchase graph:
#: 120M edges → ~3.5B wedges → ~77 GB of shuffle spill, which filled
#: local disk — round 13). The estimate is one cheap aggregate over
#: the oriented edges, and when it exceeds this budget the closure is
#: processed in deterministic src-hash SLICES — exactly the same rows
#: probed, counts summed, so results are identical while the shuffle
#: high-water stays ~budget × 20 B. On a cluster the aggregate disk
#: across executors absorbs the unsliced exchange; the slicing is the
#: bounded-single-box execution mode of the same plan.
_TRIANGLE_WEDGE_SLICE_ROWS = 250_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 20,
) -> DataFrame:
    """PageRank over a DIRECTED edge table → (node, rank 6dp, n_iter).

    For an undirected graph pass both orientations. Self-loops and
    duplicate edges are deduped. Nodes appearing only as destinations
    (dangling) keep their mass — it redistributes uniformly.

    Scale shape per iteration: contributions = edges ⋈ ranks on src
    (both sides hash-partitioned on the node key — Catalyst reuses the
    partitioning across iterations), one groupBy(dst) sum, a LEFT join
    back onto the node spine so zero-in-degree nodes keep receiving
    the teleport term. Dangling mass and the convergence delta are
    one-row aggregates collected as loop control.

    Concurrency contract: the loop pins ``spark.sql.shuffle.partitions``
    (and, on small graphs, ``spark.sql.adaptive.enabled``) for its
    duration — Spark has no per-query equivalent of these two (unlike
    ``partitionOverwriteMode``, which upsert_partitions scopes per
    write), and the pin is what lets EnsureRequirements elide the
    per-iteration join exchanges against the p-partitioned caches. Both
    confs are restored on exit (to UNSET if they were unset — a
    previously default-derived value stays default-derived), but while
    the loop runs, OTHER queries submitted concurrently on the same
    SparkSession will plan under the loop's values: run pagerank on a
    session it has to itself (a per-job session via
    ``SparkSession.newSession()`` shares the cluster but isolates
    session confs).
    """
    # node id typing: cast integer-family ids to long (8-byte shuffle
    # keys), but NEVER cast arbitrary ids — cast('long') on a string id
    # like 'user_42' yields NULL for every row and the operator would
    # return a silently empty result instead of a type error. Non-
    # integer ids are aligned on string so both endpoints union/join
    # on one type.
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    if isinstance(edges.schema[src].dataType, int_types) and isinstance(
        edges.schema[dst].dataType, int_types
    ):
        id_type = "long"
    else:
        id_type = "string"
    # raw (pre-dedup) edge stream — self-loops dropped, ids aligned.
    # The dedup itself is FUSED into the loop's one partitioning
    # shuffle (r8 rework, measured at sf0.1: hash(s, p) co-locates
    # every duplicate of an (s, d) pair — duplicates share s — so
    # repartition(p, 's') + dropDuplicates dedupes globally with NO
    # second exchange; the old distinct-then-repartition shape paid
    # two full shuffles of the edge table and cached it twice). The
    # upstream expansion is therefore scanned twice (sizing count +
    # the dedup shuffle): persist the INPUT if it is expensive — the
    # co-purchase caller caches its basket frame, so the re-run is a
    # cheap in-memory flatten.
    e_raw = edges.select(
        F.col(src).cast(id_type).alias("s"),
        F.col(dst).cast(id_type).alias("d"),
    ).filter(F.col("s") != F.col("d"))
    spark = edges.sparkSession
    # size the loop's parallelism from the RAW edge count (upper bound
    # of the deduped count — fine for sizing, and a map-only job
    # instead of a shuffle): per-iteration fixed overhead dominates on
    # small graphs, so tiny frames get tiny shuffles; AQE is gated off
    # for the loop on small graphs — its per-stage re-planning costs
    # more than the stages on frames this size (same measurement as
    # dedup.py's CC loop)
    n_edges = e_raw.count()
    p = max(2, min(int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
                   n_edges // 50_000 + 2))
    # snapshot the confs as SET-OR-UNSET, not as resolved values: a
    # conf the user never touched resolves to a DERIVED default (AQE
    # true; shuffle width from the session builder / cluster manager),
    # and writing that resolved value back on exit would PIN what was
    # previously floating. Restore means: set back what was set, unset
    # what was unset.
    prev_aqe = _conf_snapshot(spark, "spark.sql.adaptive.enabled")
    prev_sp = _conf_snapshot(spark, "spark.sql.shuffle.partitions")
    # both conf.set calls sit INSIDE the try (snapshots outside): if
    # the second set raised with the first already applied, a set
    # outside the try would leave the session half-pinned with the
    # finally never running
    try:
        if n_edges < 1_000_000:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        # pin the session shuffle width to the loop's own p: every
        # exchange the loop DOES need (the groupBy(dst) combine, the
        # node-spine distinct) then lands hash(key, p), which is
        # exactly the partitioning of the persisted edge/rank frames —
        # so EnsureRequirements elides the join exchanges instead of
        # re-shuffling a p-partitioned cache into a differently-sized
        # join. Session-scoped by necessity (see the docstring's
        # concurrency contract): Spark exposes no per-query handle for
        # these two.
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        return _pagerank_loop(
            e_raw, p, damping, tol, max_iter
        )
    finally:
        _conf_restore(spark, "spark.sql.adaptive.enabled", prev_aqe)
        _conf_restore(spark, "spark.sql.shuffle.partitions", prev_sp)


def _conf_snapshot(spark, key: str):
    """The conf's EXPLICIT session value, or None when it is unset and
    resolving to a default (SQLConf.contains checks the session's
    settings map — RuntimeConfig.get would hand back the resolved
    default and erase the set/unset distinction)."""
    if spark._jsparkSession.sessionState().conf().contains(key):
        return spark.conf.get(key)
    return None


def _conf_restore(spark, key: str, prev) -> None:
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _pagerank_loop(
    e_raw: DataFrame, p: int, damping: float, tol: float, max_iter: int
) -> DataFrame:
    # ONE shuffle builds the loop's edge cache: hash(s, p) partitioning
    # co-locates all copies of any (s, d) pair (duplicates share s), and
    # HashPartitioning(s) satisfies the dedup aggregate's
    # ClusteredDistribution(s, d), so EnsureRequirements adds no second
    # exchange — dedup runs partition-local over the repartition output
    # (plan-asserted in tests/test_plan_assertions.py). The cache lands
    # already partitioned for every iteration's contribution join.
    e = caching.persist_tracked(
        e_raw.repartition(p, "s").dropDuplicates(["s", "d"])
    )
    nodes = caching.persist_tracked(
        e.select(F.col("s").alias("node"))
        .unionAll(e.select(F.col("d").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            F.col("node"),
            F.lit(None).cast("double").alias("rank"),
            F.lit(0).alias("n_iter"),
        )
    spark = e.sparkSession
    teleport = (1.0 - damping) / n_nodes
    # single loop frame (node, deg, rank): the out-degree spine and the
    # rank vector TOGETHER, so every iteration is ONE aligned left join
    # (ranks ⋈ inflow, both hash(node, p) — no exchange) plus the one
    # essential shuffle (the groupBy(dst) combine). Carrying deg also
    # lets the loop-control aggregate read delta AND dangling mass off
    # the new frame alone — no old⋈new join. deg NULL = dangling.
    #
    # Each iteration's frame is localCheckpoint-ed, NOT persisted: the
    # loop body references the previous frame TWICE (shares + the
    # prev-rank carry), and persist does not truncate the LOGICAL
    # plan — Catalyst's tree copies would expand the doubly-referenced
    # lineage into a 2^k-node tree and OOM the driver around k≈25
    # (measured on the 8-edge star test). The eager checkpoint keeps
    # every iteration's plan shallow, exactly the dedup CC loop's
    # argument; block bookkeeping mirrors it too (~2-iteration
    # storage: previous blocks released once the next checkpoint is
    # materialized).
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    pre_ids = caching.persistent_rdd_ids(spark)
    ranks = (
        nodes.join(out_deg, nodes["node"] == out_deg["s"], "left")
        .select("node", "deg", F.lit(1.0 / n_nodes).alias("rank"))
        .localCheckpoint()
    )
    prev_ids = caching.persistent_rdd_ids(spark) - pre_ids
    # dangling mass of the INITIAL ranks (uniform): one tiny job
    [row] = ranks.agg(
        F.sum(F.when(F.col("deg").isNull(), 1.0 / n_nodes)).alias("dm")
    ).collect()
    nodes.unpersist()  # folded into the ranks frame now
    dangling = (row["dm"] or 0.0) / n_nodes
    # frontier size gate: below the cap the per-iteration share table
    # (≤ n_nodes rows of (long, double)) BROADCASTS into the
    # contribution join, making it map-only over the cached edge
    # partitions — no sort, no exchange on either side; the groupBy(d)
    # combine stays the iteration's single shuffle. Cap at 2M nodes:
    # the executor-side HashedRelation is several × the raw ~24 B/row
    # (row + hash-map overhead), each iteration ships a FRESH
    # broadcast, and stale ones are only reclaimed by the
    # ContextCleaner after driver GC — so the worst transient cost is
    # ~max_iter × relation size, which a 2M cap keeps in the
    # low-hundreds-of-MB band at the default max_iter=20. Above the
    # cap the partitioning-aligned join takes over — the right trade
    # once ranks no longer fit comfortably per executor.
    broadcast_frontier = n_nodes <= _PAGERANK_BROADCAST_NODE_CAP
    it = 0
    for it in range(1, max_iter + 1):
        shares = ranks.filter(F.col("deg").isNotNull()).select(
            F.col("node").alias("s"),
            (F.col("rank") / F.col("deg")).alias("share"),
        )
        if broadcast_frontier:
            shares = F.broadcast(shares)
        else:
            # r17 (VERDICT r16 #8, second attempt with a BOUNDED
            # build): SHUFFLE_HASH on the CONTRIBUTION join's shares
            # side only. Both sides are already hash(·, p)-partitioned
            # caches (the edge cache and the checkpointed rank frame),
            # so the join is exchange-free either way and the hint
            # replaces the per-iteration SORT of the big edge cache
            # with a hash build of n_nodes/p rows per task — bounded,
            # deterministic (no fresh exchange for AQE to coalesce),
            # ~a few MB at any p sized by the n_edges/50k rule. The
            # r16 OOM came from the OTHER join: SHJ on the rank-update
            # build (an AQE-coalescible fresh aggregate exchange) died
            # at sf10 — that join stays sort-merge below (graceful
            # spill under 20-iteration storage pressure, guide §3.1).
            shares = shares.hint("shuffle_hash")
        contribs = (
            e.join(shares, "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        pre_ids = caching.persistent_rdd_ids(spark)
        new_ranks = (
            ranks.select("node", "deg", F.col("rank").alias("prev"))
            .join(contribs, "node", "left")
            .select(
                "node",
                "deg",
                "prev",
                # floor-based half-up (functions.rounding), NOT F.round:
                # the iteration snap must be bit-identical across
                # engines so the unrolled DuckDB oracle for
                # part_pagerank re-derives the same fixpoint —
                # BigDecimal HALF_UP and DuckDB's scaled-multiply
                # round() disagree at representability edges
                round_half_up(
                    F.lit(teleport)
                    + damping * (F.coalesce("inflow", F.lit(0.0)) + dangling),
                    _RANK_SCALE,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        new_ids = caching.persistent_rdd_ids(spark) - pre_ids
        # ONE loop-control collect per iteration: convergence delta of
        # this step AND the next step's dangling mass, read straight
        # off the new frame (prev rank carried — no join needed)
        [drow] = new_ranks.agg(
            F.max(F.abs(F.col("rank") - F.col("prev"))).alias("delta"),
            F.sum(F.when(F.col("deg").isNull(), F.col("rank"))).alias("dm"),
        ).collect()
        dangling = (drow["dm"] or 0.0) / n_nodes
        # previous iteration's blocks fed only the checkpoint just
        # materialized — release them now (eager: data is safe)
        caching.unpersist_rdd_ids(spark, prev_ids)
        prev_ids = new_ids
        ranks = new_ranks
        if drow["delta"] is not None and drow["delta"] < tol:
            break
    # the final checkpoint feeds the returned plan; releasable by the
    # caller via caching.release_cached() after materializing
    caching.track_rdd_ids(spark, prev_ids)
    return ranks.select(
        "node", round_half_up(F.col("rank"), 6).alias("rank"), F.lit(it).alias("n_iter")
    )


def copurchase_edges(baskets: DataFrame, array_col: str = "pks") -> DataFrame:
    """Both orientations of the basket pair expansion → (src, dst):
    the undirected co-purchase graph as a directed edge table for
    :func:`pagerank`. Reuses the in-plan array_pairs kernel."""
    from .analytics import array_pairs

    p = array_pairs(baskets, array_col, "a", "b")
    return p.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        p.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def triangle_stats(pairs: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global triangle census over an undirected graph given as
    CANONICAL distinct pairs (``a < b``, no self-loops): one row
    (n_nodes, n_edges, n_wedges, n_triangles, global_clustering 4dp),
    where global_clustering = 3·triangles / wedges (the transitivity
    ratio; NULL on wedge-free graphs).

    Scale shape — the compact-forward / degree-ordering algorithm
    (Latapy 2008; the distributed standard): edges are re-oriented
    from the (degree, id)-SMALLER endpoint to the larger, so every
    node's out-degree is bounded by ~√(2·|E|) regardless of how
    skewed the raw degree distribution is — a celebrity node with
    10^6 neighbors contributes wedge candidates only through its few
    HIGHER-ranked neighbors, never C(10^6, 2) pairs. Each triangle is
    then counted exactly once at its lowest-ranked vertex: candidate
    wedges are out-neighbor pairs (ordered by the same rank), closed
    by a semi-join back onto the oriented edge set. Cost is the
    arboricity-bounded Σ outdeg² instead of the naive Σ deg²; wedges
    come free from the degree table (Σ C(deg, 2)), no join.

    Shuffle shape (r9 rework — measured 12.6 s → ~4 s at sf0.1 on the
    dense 1.2M-edge co-purchase graph): the WEDGE-CANDIDATE table
    (Σ C(outdeg, 2) rows — 35M there, the dominant intermediate) must
    never shuffle. Under the edge-count gate the degree table and the
    closure edge set both broadcast: orientation becomes map-only,
    the self-join on src is the one wedge shuffle (of EDGES, not
    wedges), and the closing semi-join probes a broadcast hash
    relation map-side — wedge candidates are generated and consumed
    inside one stage. Above the gate (edge set too big for an
    executor relation) everything falls back to node-keyed shuffles,
    which is the right trade when the graph itself dwarfs memory.
    The input edge set is persisted (it feeds degree, orientation,
    closure, and the count) and released by the caller.
    """
    from . import caching

    e0 = caching.persist_tracked(
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    )
    # one cheap count job sizes the gate AND becomes the n_edges
    # output (the pair table is 1:1 with oriented edges)
    n_edges = e0.count()
    gate = n_edges <= _TRIANGLE_BROADCAST_EDGE_CAP
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg_u = deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du")
    deg_v = deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv")
    if gate:
        # degree table ≤ 2·edges rows but typically ≪; broadcast makes
        # the two orientation joins map-only over the cached edges
        deg_u, deg_v = F.broadcast(deg_u), F.broadcast(deg_v)
    base = e0.join(deg_u, "u").join(deg_v, "v")
    # orient: src = (deg, id)-smaller endpoint; rank carried as (rd, r)
    # so out-neighbor pairs can be ordered WITHOUT a global rank sort
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # the oriented edge frame feeds THREE consumers (both wedge sides
    # + the closure set): persist it, or each consumer re-runs the
    # orientation joins over the edge cache (measured ~2.5 s × 3 at
    # sf0.1). Released with the caller's release_cached().
    oriented = base.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_u, F.col("dv")).otherwise(F.col("du")).alias("rd"),
    )
    if not gate:
        # r16 (guide §2.4): above the broadcast gate the wedge
        # self-join (w1 ⋈ w2 on src) is a sort-merge join — and on the
        # sliced path EVERY slice re-exchanges + re-sorts its filter
        # of the edge cache on BOTH sides. Persisting the cache
        # already hash(src)-partitioned and src-sorted makes each
        # slice's self-join exchange-free AND sort-free
        # (InMemoryTableScan preserves partitioning and order, and a
        # slice filter preserves both), and the Σ C(outdeg, 2) sizing
        # aggregate becomes partition-local: one exchange at cache
        # build replaces 2 × slices exchanges + sorts. Under the gate
        # the self-join build side broadcasts, so the repartition
        # would be pure cost — skipped.
        oriented = oriented.repartition("src").sortWithinPartitions("src")
    e = caching.persist_tracked(oriented)
    # wedge volume estimate (Σ C(outdeg, 2)) — one cheap aggregate
    # over the persisted oriented edges. Above the broadcast gate the
    # wedge stream is a real exchange; when it would exceed the slice
    # budget, close it in deterministic src-hash slices (identical
    # rows probed, per-slice counts summed) so one box's local disk
    # bounds the high-water instead of the data (round 13: the sf10
    # co-purchase graph's unsliced 3.5B-row wedge shuffle filled disk).
    slices = 1
    if not gate:
        est = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .agg(F.sum(F.expr("od * (od - 1) div 2")).alias("w"))
            .first()["w"]
            or 0
        )
        slices = max(1, -(-int(est) // _TRIANGLE_WEDGE_SLICE_ROWS))

    def _wedges(edge_frame: DataFrame) -> DataFrame:
        w1 = edge_frame.select(
            "src", F.col("dst").alias("x"), F.col("rd").alias("rx")
        )
        w2 = edge_frame.select(
            "src", F.col("dst").alias("y"), F.col("rd").alias("ry")
        )
        return w1.join(w2, "src").filter(
            (F.col("rx") < F.col("ry"))
            | ((F.col("rx") == F.col("ry")) & (F.col("x") < F.col("y")))
        )

    wedge_cand = _wedges(e)
    # closure probe key: when node ids fit in 32 bits (checked on the
    # cached edge frame — one tiny agg job), pack (x, y) into ONE long
    # (x·2³² + y, exact) so the 41M-probe semi-join hashes a single
    # 8-byte key instead of a two-column row — measured ~25% off the
    # probe stage at sf0.1. Ids outside the range keep the 2-key join.
    packable = False
    if isinstance(e0.schema["u"].dataType, (T.ByteType, T.ShortType,
                                            T.IntegerType, T.LongType)):
        [mr] = e0.agg(
            F.min(F.least("u", "v")).alias("lo"),
            F.max(F.greatest("u", "v")).alias("hi"),
        ).collect()
        packable = (
            mr["lo"] is not None
            and mr["lo"] >= 0
            and mr["hi"] < 2_147_483_648
        )
    if packable:
        def _project(wc: DataFrame) -> DataFrame:
            return wc.select(
                (F.col("x") * F.lit(4_294_967_296) + F.col("y")).alias("__xy")
            )

        closer = e.select(
            (F.col("src") * F.lit(4_294_967_296) + F.col("dst")).alias("__xy")
        )
        join_keys = ["__xy"]
    else:
        def _project(wc: DataFrame) -> DataFrame:
            return wc.select("x", "y")

        closer = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
        join_keys = ["x", "y"]
    if gate:
        closer = F.broadcast(closer)
    else:
        # r16 (guide §3.1): above the gate, the closure probe's STREAM
        # side is the wedge-candidate table (Σ C(outdeg, 2) rows —
        # orders of magnitude above the edge count), and a sort-merge
        # semi-join SORTS that whole stream after exchanging it. Run
        # it as a SHUFFLE_HASH semi-join instead — but SHJ cannot
        # spill its build, so the closure side is pre-partitioned to
        # keep every per-task build table under
        # _TRIANGLE_CLOSURE_KEYS_PER_TASK packed longs (sf1: 12M
        # edges → session width; sf10: 120M edges → ~86 partitions —
        # the unsized 32-way build died on this box). The stream side
        # is exchanged by EnsureRequirements to match; AQE cannot
        # re-coalesce it against the fixed cache side.
        p_sess = int(
            e0.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        closure_parts = max(
            p_sess, -(-n_edges // _TRIANGLE_CLOSURE_KEYS_PER_TASK)
        )
        closer = closer.repartition(closure_parts, *join_keys)
    if slices == 1:
        # hint at the join site — hints do not survive a cache
        if not gate:
            closer = closer.hint("shuffle_hash")
        closed = _project(wedge_cand).join(closer, join_keys, "left_semi")
        tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    else:
        # sliced closure: every wedge belongs to exactly ONE src slice,
        # so the per-slice semi-join counts partition the unsliced
        # count exactly; the per-slice .first() is a loop-control
        # SCALAR collect (slices rows total), never data-scale.
        # The closure side is exchanged ONCE and cached in that shape
        # (InMemoryTableScan preserves hash partitioning, and a slice
        # filter preserves it too), so each slice's semi-join pays an
        # exchange only on its OWN wedge stream — without this the
        # full edge set re-shuffles every slice (measured +30%: 308 s
        # → 238 s at sf10). r16: the per-slice semi-join is the same
        # SHUFFLE_HASH shape as above (wedge stream never sorted; the
        # cached closure side needs no sort either; per-task build
        # bounded by the closure_parts sizing).
        closer = caching.persist_tracked(closer)
        total = 0
        for i in range(slices):
            sl = e.filter(
                F.pmod(F.xxhash64("src"), F.lit(slices)) == F.lit(i)
            )
            total += (
                _project(_wedges(sl))
                .join(closer.hint("shuffle_hash"), join_keys, "left_semi")
                .agg(F.count(F.lit(1)).cast("long").alias("n"))
                .first()["n"]
            )
        tri = e0.sparkSession.createDataFrame(
            [(total,)], "n_triangles long"
        )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    edges_n = e0.sparkSession.createDataFrame(
        [(n_edges,)], "n_edges long"
    )
    return (
        stats.crossJoin(F.broadcast(edges_n))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            round_half_up(
                F.when(
                    F.col("n_wedges") > 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ),
                4,
            ).alias("global_clustering"),
        )
    )
