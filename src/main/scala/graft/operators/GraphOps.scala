package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{EpochRegistry, Tables}

/** Graph analytics over the order co-purchase graph.
  *
  * Nodes are parts; an undirected edge (src < dst) connects two parts
  * that appear in the same order, weighted by the number of such orders.
  * Edge construction is an order-keyed self-join — the fan-out is
  * bounded by the per-order basket size (≤ 7 lineitems in TPC-H-shaped
  * data → ≤ 21 pairs per order), so the join never goes all-pairs and
  * scales linearly in |lineitem| at 100 TB, exactly like the
  * market-basket miner ([[graft.RelationalQueries]] copurchase).
  *
  * Iterative algorithms (PageRank, triangles) run on the *support ≥ 2
  * backbone*: pairs co-purchased at least twice. Random co-incidence
  * almost never repeats, so the backbone is orders of magnitude smaller
  * than the raw edge set (3.6k vs 116k edges at sf0.01) and — crucially
  * for Spark — it is epoch-materialized to parquet once per (session,
  * dataset), so the three PageRank iterations re-read a tiny columnar
  * file instead of re-running the heavy self-join per lineage reference
  * (the r15 re-evaluation trap). All rank arithmetic is integer ppb
  * (parts-per-billion) with truncating `div`, making Spark and DuckDB
  * bit-equal with no float drift.
  */
object GraphOps {

  /** The kNN-graph family's ONE parameter set (ADVICE r16): these
    * constants are the defaults of [[knnGraphDir]]/[[graphSearch]] AND
    * the literals [[graft.GraphQueries]]' DuckDB mirrors interpolate —
    * the recallK discipline, so the Spark plan and the oracle can never
    * silently disagree on k / rounds / beam / probe widths. Non-default
    * builds get their own parameter-keyed epoch (never poisoning the
    * gated default epoch) but have no oracle. */
  val KnnK = 3
  val KnnDescentRounds = 2
  val KnnSeedProbeCells = 4
  val WalkBeam = 8
  val WalkRounds = 3
  val WalkEntryCells = 2
  /** The widened shortlist beam of the exact re-rank composition
    * ([[probeGraphIndexRerank]]) — 2× the serving beam, the same
    * shortlist-widening ratio the PQ/IVF-PQ re-rank entries use. */
  val WalkRerankBeam = 16
  /** ...and its widened entry probe (2× the serving entry): the
    * residual serve misses are ENTRY misses (a true neighbor whose
    * cell the 2-cell entry never opens stays unreachable at any beam),
    * so the high-recall tier widens both knobs — the nProbe/beam pair
    * every graph-ANN system exposes. */
  val WalkRerankEntryCells = 4
  /** The FILTERED walk's entry width — 4 cells, matching the IVF
    * filtered probe's nProbe: only the label's members of each entry
    * cell are admissible, so a label-partitioned walk needs more cells
    * for the same candidate mass. Measured on the audit (sf0.01,
    * label-restricted truth): 2 cells → recall@3 0.50 with one query
    * at 0.0 (its label subgraph unreachable — the under-fill the
    * filtered-ANN design exists to avoid), 4 → 0.70 (= the IVF
    * filtered probe's), 8 → 0.77; beam width is irrelevant here (the
    * label-agnostic adjacency contributes few matching candidates) —
    * a label-aware edge build (FilteredDiskANN) is the real lift
    * beyond entry widening. */
  val WalkFilteredEntryCells = 4

  /** Distinct undirected co-purchase edges (src < dst) from lineitem.
    *
    * Single-scan basket expansion instead of the order-keyed self-join:
    * one shuffle groups lineitem into per-order part arrays (≤ 7
    * elements), then a narrow nested-transform emits the sorted pairs —
    * no second scan, no join shuffle. The lambda only captures the
    * `parts` attribute (cheap), not a recomputed expression (the r14
    * HOF-capture trap). */
  def copurchaseEdges(lineitem: DataFrame): DataFrame = {
    val baskets = lineitem.groupBy("l_orderkey")
      .agg(array_sort(array_distinct(collect_list(col("l_partkey")))).as("parts"))
    baskets.select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts)),
          |            y -> struct(x AS src, y AS dst))))""".stripMargin)).as("p"))
      .select(col("p.src"), col("p.dst")).distinct()
  }

  /** The FULL co-purchase edge set, epoch-materialized (VERDICT r16
    * advisory: [[degreeDistribution]] re-ran the basket expansion per
    * call — 2.2 s warm — while every other graph entry reads an epoch;
    * with the weighted-PageRank family landing more full-graph
    * consumers, the expansion now runs once per (session, dataset) and
    * everything downstream scans a tiny columnar file). */
  def edgesDir(spark: SparkSession, sfDir: String): String =
    EpochRegistry.acquire(spark, "graph_copurchase_edges", sfDir) { () =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_edges_").toString
      copurchaseEdges(Tables.lineitem(spark, sfDir))
        .write.mode("overwrite").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }

  /** Degree distribution of the full co-purchase graph: for each degree
    * value, how many nodes have it. Reads the [[edgesDir]] epoch — one
    * shuffle per aggregation level; the symmetric union doubles edge
    * rows, never nodes. */
  def degreeDistribution(spark: SparkSession, sfDir: String): DataFrame =
    degreeOf(spark.read.parquet(edgesDir(spark, sfDir)))

  /** [[degreeDistribution]] from an in-memory lineitem frame (the
    * un-epoched form — fixture tests hand it tiny baskets). */
  def degreeDistribution(lineitem: DataFrame): DataFrame =
    degreeOf(copurchaseEdges(lineitem))

  private def degreeOf(pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("src").as("node"))
      .unionAll(pairs.select(col("dst").as("node")))
    val deg = sym.groupBy("node").agg(count(lit(1)).as("deg"))
    deg.groupBy("deg").agg(count(lit(1)).as("n_nodes"))
  }

  /** The support ≥ 2 backbone, materialized once per (session, dataset)
    * epoch: (src, dst, w) with src < dst and w ≥ 2. */
  def backboneDir(spark: SparkSession, sfDir: String): String =
    EpochRegistry.acquire(spark, "graph_copurchase_backbone", sfDir) { () =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_backbone_").toString
      val li = Tables.lineitem(spark, sfDir)
      val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("src"))
      val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("dst"))
      a.join(b, Seq("ok")).filter(col("src") < col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .write.mode("overwrite").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }

  /** Fresh scan of the backbone (separate reads → separate attribute
    * ids, so self-joins between derived frames never collapse into
    * trivially-true predicates). */
  private def backbone(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(backboneDir(spark, sfDir))

  /** Frontier-pin gate for the iterative BFS forms (VERDICT r20 #5).
    * Each BFS round references the visited set ~3× (expand, anti-join,
    * union), so plan lineage grows ~3^depth; at fixture scale the
    * re-executed subtrees are tiny epoch-parquet scans and per-round
    * materialization measured 2× SLOWER (OPTIMIZATION_r20.md §10), but
    * at real scale depth-d lineage re-execution dominates. The gate is
    * the EDGE RELATION'S on-disk size (one driver-side FS listing — no
    * job): past `spark.graft.bfs.pinBytes` (default 1 GiB) every
    * round's visited set is pinned with an eager `localCheckpoint`, so
    * plan depth and recompute cost stay O(1) in depth. Results are
    * identical either way — the pin only truncates lineage. */
  private def bfsPinBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.bfs.pinBytes").map(_.toLong)
      .getOrElse(1L << 30)

  private def edgeBytes(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  private def maybePin(df: DataFrame, srcBytes: Long, pinBytes: Long): DataFrame =
    if (srcBytes >= pinBytes) df.localCheckpoint() else df

  private def symmetric(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Integer-quantized PageRank over the backbone, `iters` synchronous
    * iterations, damping 0.85, ranks in ppb.
    *
    *   r0(v)   = SCALE div n
    *   r_k+1(v) = base + Σ_{u→v} (850·r_k(u)) div (1000·outdeg(u))
    *   base    = (150·(SCALE div n)) div 1000
    *
    * Each iteration is one key-partitioned shuffle of the edge list
    * joined against the (node-keyed) rank table — the standard Pregel
    * layout: at 1000 executors the edges stay partitioned by src for
    * the join and re-shuffle by dst for the sum; the backbone is tiny
    * here, but nothing in the plan depends on that (no collect, no
    * broadcast of the rank table). Dangling nodes cannot occur: the
    * symmetric edge set gives every node an out-edge. */
  def pageRank(spark: SparkSession, sfDir: String, iters: Int): DataFrame = {
    val Scale = 1000000000L
    // plan-time scalar: node count of the materialized backbone
    // (Generations-style metadata read — one tiny job over the parquet)
    val n = symmetric(backbone(spark, sfDir))
      .select(col("src").as("node")).distinct().count()
    val r0 = Scale / n
    val base = (150L * r0) / 1000L
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    var ranks = symmetric(backbone(spark, sfDir))
      .select(col("src").as("node")).distinct()
      .withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val contrib = symmetric(backbone(spark, sfDir)).as("e")
        .join(ranks.as("rk"), col("e.src") === col("rk.node"))
        .join(deg.as("dg"), col("e.src") === col("dg.node"))
        .select(col("e.dst").as("node"),
          expr("(850 * r) div (1000 * outdeg)").as("c"))
      ranks = contrib.groupBy("node")
        .agg((lit(base) + sum(col("c"))).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_ppb"))
  }

  /** PERSONALIZED PageRank (Haveliwala, WWW 2002): the surfer teleports
    * to a SEED SET instead of everywhere — the initial mass and the
    * per-iteration teleport live only on the seeds, so rank concentrates
    * in the seeds' neighborhood. This is the serving form of graph
    * recommendation ("products related to this basket"): score =
    * proximity to the seeds, not global centrality.
    *
    *   r0(v)    = SCALE div |S|        for v ∈ S, absent otherwise
    *   r_k+1(v) = [v ∈ S]·base + Σ_{u→v} (850·r_k(u)) div (1000·outdeg(u))
    *   base     = (150·(SCALE div |S|)) div 1000
    *
    * Same integer-ppb quantization, truncating div, and Pregel layout
    * as [[pageRank]]. The 100 TB property global PageRank lacks:
    * iteration state stays proportional to the TOUCHED neighborhood
    * (nodes the seeds can reach in k hops), not the graph — the rank
    * table starts at |S| rows and grows only along real edges, so a
    * basket-sized seed set on a billion-node graph never materializes
    * a billion-row state. Seeds here are the `nSeeds` smallest node
    * ids (a deterministic, mirrorable stand-in for a caller-supplied
    * basket). */
  def pageRankPersonalized(spark: SparkSession, sfDir: String,
      iters: Int, nSeeds: Int): DataFrame = {
    val Scale = 1000000000L
    val seeds = symmetric(backbone(spark, sfDir))
      .select(col("src").as("node")).distinct()
      .orderBy(col("node")).limit(nSeeds)
    val r0 = Scale / nSeeds
    val base = (150L * r0) / 1000L
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    var ranks = seeds.withColumn("r", lit(r0))
    for (_ <- 1 to iters) {
      val contrib = symmetric(backbone(spark, sfDir)).as("e")
        .join(ranks.as("rk"), col("e.src") === col("rk.node"))
        .join(deg.as("dg"), col("e.src") === col("dg.node"))
        .select(col("e.dst").as("node"),
          expr("(850 * r) div (1000 * outdeg)").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
      ranks = contrib
        .join(seeds.withColumn("b", lit(base)), Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("cs"), lit(0L)) + coalesce(col("b"), lit(0L))).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_ppb"))
  }

  /** HITS hubs-and-authorities (Kleinberg, JACM 1999) over the
    * DIRECTED backbone (edges oriented src < dst — the deterministic
    * orientation the backbone already stores): authority(v) = Σ hub(u)
    * over in-edges, hub(u) = Σ authority(v) over out-edges, each side
    * L1-normalized per half-iteration. The mutual-reinforcement
    * centrality pair PageRank's single score can't express — a part
    * can be a strong *hub* (points at many strong authorities) without
    * being an authority itself.
    *
    * CAVEAT — the orientation is an ARTIFACT, not a domain direction:
    * the co-purchase backbone is an undirected graph stored with the
    * deterministic src < dst convention, so here "u points at v" just
    * means u's part key is smaller. The hub-vs-authority SPLIT is
    * therefore semantically arbitrary on this graph (a node lands on
    * the authority side because its id exceeds its neighbors', unlike
    * reference HITS runs over genuinely directed link graphs); what IS
    * meaningful is the combined mutual-reinforcement magnitude and the
    * algorithm's exact-integer fixed point, which the oracle gates.
    * On the symmetric edge set the two sides coincide and HITS
    * degenerates to eigenvector centrality — run it there if a
    * direction-free score is wanted.
    *
    * Integer discipline: scores live in ppm of their side's L1 mass —
    * normalize(x) = (x·1e6) div Σx, so every score ≤ 1e6 and a raw
    * half-iteration sum ≤ 1e6·maxdeg. The ppm product 1e6·raw then
    * stays inside BIGINT while maxdeg ≤ ~9.2e6 — far beyond any
    * backbone degree (the support ≥ 2 cut removes co-incidence hubs);
    * past that, widen the normalize products to DECIMAL(38,0).
    *
    * Scale shape: each half-iteration is one edge⋈score join shuffled
    * on the edge key plus a node-keyed agg — the Pregel layout of
    * [[pageRank]]; the L1 total is a single-row agg broadcast back
    * onto the scores (never collected). Nodes with no in-edge hold
    * authority 0 (standard HITS) and drop out of the nonzero output. */
  def hits(spark: SparkSession, sfDir: String, iters: Int): DataFrame = {
    val Scale = 1000000L
    def edges() = backbone(spark, sfDir).select(col("src"), col("dst"))
    // one half-iteration: pull scores across `key`→`out` edges, then
    // L1-normalize to ppm (broadcast of the 1-row total)
    def pull(scores: DataFrame, key: String, out: String): DataFrame = {
      val raw = edges().as("e")
        .join(scores.as("sc"), col(s"e.$key") === col("sc.node"))
        .groupBy(col(s"e.$out").as("node"))
        .agg(sum(col("sc.s")).as("raw"))
      val tot = raw.agg(sum(col("raw")).as("t"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"), expr(s"(raw * $Scale) div t").as("s"))
    }
    var hub = edges().select(col("src").as("node"))
      .unionAll(edges().select(col("dst").as("node")))
      .distinct().withColumn("s", lit(Scale))
    var auth = hub
    for (_ <- 1 to iters) {
      auth = pull(hub, "src", "dst")  // authority: pulled from in-edges
      hub = pull(auth, "dst", "src")  // hub: pulled from out-edges
    }
    auth.select(col("node"), col("s").as("auth_ppm"))
      .join(hub.select(col("node"), col("s").as("hub_ppm")),
        Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"),
        coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"))
  }

  /** LINK PREDICTION by the resource-allocation index (Zhou, Lü &
    * Zhang 2009): for every non-adjacent pair within two hops, score =
    * Σ_{z ∈ common neighbors} 1/deg(z) — each common neighbor
    * "allocates" its unit of resource evenly across its edges, so
    * well-connected-through-low-degree-hubs pairs rank highest. RA is
    * the integer-exact member of the common-neighbor family (1e9 div
    * deg — Adamic-Adar's 1/ln(deg) would ride the log quantization
    * instead), and benchmarks at or above AA on co-occurrence graphs.
    * The recommender use: "parts bought together with both of these" —
    * edges that SHOULD exist next.
    *
    * Scale shape: the 2-hop expansion is one self-join of the
    * symmetric edge list keyed on the shared middle node — fan-out
    * bounded by deg², the quantity every production link predictor
    * caps (degree-cap hubs or sample their neighbor lists at true
    * scale; the backbone's support ≥ 2 cut already removes the raw
    * co-incidence hubs here). Anti-join against the existing edge set,
    * then one pair-keyed agg; top-k via TakeOrderedAndProject. */
  def linkPredictRa(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val sym = symmetric(backbone(spark, sfDir))
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val hop2 = sym.as("e1")
      .join(symmetric(backbone(spark, sfDir)).as("e2"),
        col("e1.dst") === col("e2.src"))
      .filter(col("e1.src") < col("e2.dst"))
      .select(col("e1.src").as("a"), col("e2.dst").as("b"),
        col("e1.dst").as("z"))
    val cand = hop2.join(
      backbone(spark, sfDir).select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"), "left_anti")
    cand.join(deg, cand("z") === deg("node"))
      .select(col("a"), col("b"), expr("1000000000 div d").as("alloc"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("alloc")).as("ra_score"),
        count(lit(1)).as("n_common"))
      .orderBy(col("ra_score").desc, col("a"), col("b")).limit(k)
  }

  /** DEGREE ASSORTATIVITY (Newman, PRL 2002): the Pearson correlation
    * of endpoint degrees over the directed-both-ways edge list — one
    * number answering "do hubs attach to hubs (r > 0, social) or to
    * leaves (r < 0, technological)?". The stats_corr_matrix
    * discipline: every Σx/Σx²/Σxy accumulates as an EXACT
    * DECIMAL(38,0) (order-independent across the shuffle — Σdeg² can
    * pass BIGINT at graph scale), and the final r derives from
    * identical decimal inputs through the same IEEE double expression
    * on both engines, rounded to 6 dp. The symmetric edge list makes
    * Σx = Σy and Σx² = Σy², so one pass accumulates everything.
    *
    * Scale shape: two degree joins onto the edge list (node-keyed
    * shuffles), one global agg — no pairwise anything. */
  def assortativity(spark: SparkSession, sfDir: String): DataFrame = {
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val sums = symmetric(backbone(spark, sfDir)).as("e")
      .join(deg.select(col("node").as("src"), col("d").as("dx")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("d").as("dy")), Seq("dst"))
      .select(col("dx").cast("decimal(19,0)").as("x"),
        col("dy").cast("decimal(19,0)").as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    def dbl(c: String) = col(c).cast("double")
    sums.select(col("n").cast("long").as("n_directed_edges"),
      round((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sx")) /
        (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")), 6)
        .as("assortativity"))
  }

  /** EDGE EMBEDDEDNESS (Granovetter tie strength via neighborhood
    * Jaccard — the Easley–Kleinberg formulation): for each EXISTING
    * backbone edge (a,b), the Jaccard overlap of the endpoints'
    * neighborhoods excluding each other —
    * c div ((da−1)+(db−1)−c) in ppm, c = common neighbors. High
    * embeddedness = redundant intra-community tie; zero = a BRIDGE
    * (Granovetter's weak tie) — the edge-level complement of
    * [[linkPredictRa]] (which scores ABSENT pairs) and of the
    * node-level triangle count. Degree-1-to-degree-1 edges have an
    * empty union and are excluded (0/0).
    *
    * Scale shape: common neighbors come from ONE wedge join (edge list
    * ⋈ sym ⋈ sym keyed on the shared endpoint then the candidate
    * neighbor) — deg²-bounded like every triangle-family op, with the
    * backbone's support ≥ 2 cut as the hub cap; degrees broadcast-join
    * back; top-k via TakeOrderedAndProject. */
  def edgeEmbeddedness(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    val sym = symmetric(backbone(spark, sfDir))
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    // wedge join: z adjacent to BOTH endpoints (z ∉ {a,b} is automatic
    // — a~a / b~b self-loops don't exist in the backbone)
    val cn = backbone(spark, sfDir).as("ed")
      .join(symmetric(backbone(spark, sfDir)).as("x"),
        col("ed.src") === col("x.src"))
      .join(symmetric(backbone(spark, sfDir)).as("y"),
        col("ed.dst") === col("y.src") && col("x.dst") === col("y.dst"))
      .groupBy(col("ed.src").as("a"), col("ed.dst").as("b"))
      .agg(count(lit(1)).as("nc"))
    backbone(spark, sfDir).select(col("src").as("a"), col("dst").as("b"))
      .join(cn, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
      .filter(col("da") + col("db") - 2 - col("nc") > 0)
      .select(col("a"), col("b"), col("nc").as("n_common"),
        col("da"), col("db"),
        expr("nc * 1000000 div (da + db - 2 - nc)").as("embed_ppm"))
      .orderBy(col("embed_ppm").desc, col("a"), col("b")).limit(k)
  }

  /** Iterative k-CORE decomposition (synchronous peel): drop every
    * node with degree < `kMin`, recompute degrees, repeat `rounds`
    * times — the surviving subgraph after convergence is the k-core,
    * the standard dense-cohesion backbone cut (Seidman 1983; the
    * "remove the fringe before community detection" preprocessing every
    * large-graph pipeline runs). Fixed synchronous rounds keep the
    * operator mirrorable (the DuckDB oracle unrolls the same peels);
    * [[kCoreCheck]] gates that the last two rounds agree, so an
    * under-provisioned `rounds` is loud, not silent.
    *
    * Scale shape: each round is one degree agg + two semi-joins over
    * the CURRENT edge set — monotonically shrinking, node-keyed
    * shuffles. Every round's edge state persists (each is referenced
    * by the degree agg AND the next filter — without the persist the
    * lineage re-evaluates 3× per round, exponential by round 8) and
    * every state but the result's is released at exit (the
    * weightedRanks discipline). */
  def kCore(spark: SparkSession, sfDir: String, kMin: Int,
      rounds: Int): DataFrame = {
    val (states, rdds) = kCoreStates(spark, sfDir, kMin, rounds)
    finishPeel(spark,
      states.last.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("core_deg")),
      rdds)
  }

  /** [[kCore]]'s convergence audit: edge counts of the last two peel
    * rounds and whether they agree (they must — a shrinking integer
    * sequence that stopped moving has converged, since a fixed edge
    * set yields fixed degrees yields the same keep set). */
  def kCoreCheck(spark: SparkSession, sfDir: String, kMin: Int,
      rounds: Int): DataFrame = {
    val (states, rdds) = kCoreStates(spark, sfDir, kMin, rounds)
    val out = states(rounds - 1).agg(count(lit(1)).as("n_prev"))
      .crossJoin(states(rounds).agg(count(lit(1)).as("n_last")))
      .select(col("n_prev"), col("n_last"),
        (col("n_prev") === col("n_last")).as("converged"))
    finishPeel(spark, out, rdds)
  }

  /** Each peel round's edge state is a lineage-SEVERED persisted RDD
    * leaf (the beamWalk discipline), not a plain `.persist()`: a round
    * references the previous round's frame three times (the degree agg
    * and both semi-join probes), so an unsevered logical plan TRIPLES
    * per round — by round 8 the analyzer chokes on a ~2 GB plan string
    * (measured: heap exhaustion at sf0.001) even though the cached DATA
    * is tiny. The leaf keeps every round's plan one node deep; all
    * round leaves are released once the caller's result materializes. */
  private def kCoreStates(spark: SparkSession, sfDir: String, kMin: Int,
      rounds: Int): (Seq[DataFrame],
      Seq[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]) = {
    val rdds =
      Seq.newBuilder[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def leaf(df: DataFrame): DataFrame = {
      val r = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdds += r
      spark.createDataFrame(r, df.schema)
    }
    var edges = leaf(symmetric(backbone(spark, sfDir)))
    val states = Seq.newBuilder[DataFrame]
    states += edges
    (1 to rounds).foreach { _ =>
      val keep = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d"))
        .filter(col("d") >= kMin).select(col("node"))
      edges = leaf(edges
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi"))
      states += edges
    }
    (states.result(), rdds.result())
  }

  private def finishPeel(spark: SparkSession, out: DataFrame,
      rdds: Seq[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]): DataFrame = {
    val r = out.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    r.count()
    rdds.foreach(_.unpersist())
    spark.createDataFrame(r, out.schema)
  }

  private def symmetricW(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("w"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))

  /** WEIGHT-PROPORTIONAL PageRank over the backbone (VERDICT r16
    * advisory: [[pageRank]]'s unweighted surfer ignores the edge weight
    * `w` a co-purchase ranking would actually serve on) — the standard
    * weighted variant: a node's rank flows along each out-edge in
    * proportion to its weight,
    *
    *   r_k+1(v) = base + Σ_{u→v} (850·r_k(u)·w(u,v)) div (1000·Σw_out(u))
    *
    * same integer-ppb quantization and truncating `div` (per-edge
    * numerator ≤ 850·10⁹·w, so BIGINT holds through w ≲ 10⁷ — ADVICE
    * r17: 850·10⁹·10⁹ would exceed Long.MaxValue ≈ 9.2·10¹⁸, and Spark
    * wraps silently where DuckDB raises; a corpus whose co-purchase
    * weights approach 10⁷ must widen the numerator to DECIMAL(38,0),
    * the exact-Pearson discipline), same Pregel
    * layout (one edge-keyed shuffle per iteration, weights ride the
    * edge rows, no collect, no rank broadcast). Kept ALONGSIDE the
    * unweighted variant — both are standard; the unweighted one is the
    * structural centrality, this one the traffic-weighted ranking. */
  def pageRankWeighted(spark: SparkSession, sfDir: String,
      iters: Int): DataFrame = {
    val states = weightedRanks(spark, sfDir, iters)
    materializeAndRelease(spark,
      states.last._2.select(col("node"), col("r").as("rank_ppb")),
      states.map(_._2))
  }

  /** [[pageRankWeighted]] over an ARBITRARY (src, dst, w) edge source —
    * the serving form for a MAINTAINED backbone (r18: the CDC matview
    * loop keeps the co-purchase counts current per batch, and the rank
    * refresh reads the view instead of re-expanding lineitem — the
    * derived-analytics-over-maintained-views composition). `edges` is
    * a thunk: each reference takes a fresh scan, so the per-iteration
    * self-joins never collapse on shared attribute ids (the backbone
    * discipline). */
  def pageRankWeightedOver(spark: SparkSession, edges: () => DataFrame,
      iters: Int): DataFrame = {
    val states = weightedRanksOver(spark, edges, iters)
    materializeAndRelease(spark,
      states.last._2.select(col("node"), col("r").as("rank_ppb")),
      states.map(_._2))
  }

  /** Force `out` into an RDD leaf while `cached` is still live, then
    * release every cached state (ADVICE r17: the weighted-PR loop
    * persisted each iteration's rank frame for the session — benchmarks
    * call these entries repeatedly, leaking node-count blocks per call).
    * The leaf itself is RDD-level persisted, so the ContextCleaner frees
    * it when the returned frame goes unreferenced (the ivfTopK
    * pattern). */
  private def materializeAndRelease(spark: SparkSession, out: DataFrame,
      cached: Seq[DataFrame]): DataFrame = {
    val rdd = out.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    cached.foreach(_.unpersist())
    spark.createDataFrame(rdd, out.schema)
  }

  /** Every iteration's rank table for the weighted surfer — ranks are
    * persisted per iteration (each is referenced by the next state AND
    * the delta monitor: the r15 re-evaluation trap, loop form; each is
    * node-count rows, the model-sized class). Returned as
    * (iteration, ranks(node, r)) with iteration 0 = the uniform seed. */
  private def weightedRanks(spark: SparkSession, sfDir: String,
      iters: Int): Seq[(Int, DataFrame)] =
    weightedRanksOver(spark, () => backbone(spark, sfDir), iters)

  private def weightedRanksOver(spark: SparkSession,
      edges: () => DataFrame, iters: Int): Seq[(Int, DataFrame)] = {
    val Scale = 1000000000L
    val n = symmetric(edges())
      .select(col("src").as("node")).distinct().count()
    val r0 = Scale / n
    val base = (150L * r0) / 1000L
    val wsum = symmetricW(edges())
      .groupBy(col("src").as("node")).agg(sum(col("w")).as("wout"))
    var ranks = symmetric(edges())
      .select(col("src").as("node")).distinct()
      .withColumn("r", lit(r0))
      .persist()
    val states = Seq.newBuilder[(Int, DataFrame)]
    states += ((0, ranks))
    (1 to iters).foreach { k =>
      val contrib = symmetricW(edges()).as("e")
        .join(ranks.as("rk"), col("e.src") === col("rk.node"))
        .join(wsum.as("dg"), col("e.src") === col("dg.node"))
        .select(col("e.dst").as("node"),
          expr("(850 * r * w) div (1000 * wout)").as("c"))
      ranks = contrib.groupBy("node")
        .agg((lit(base) + sum(col("c"))).as("r"))
        .persist()
      states += ((k, ranks))
    }
    states.result()
  }

  /** The weighted surfer's CONVERGENCE monitor — the observable a
    * 100 TB PageRank run actually stops on: per iteration, the max and
    * total absolute rank movement in ppb. Three one-row aggregates over
    * node-count join frames; a deployment runs exactly this between
    * supersteps and stops when max_delta_ppb crosses its tolerance. */
  def pageRankWeightedDeltas(spark: SparkSession, sfDir: String,
      iters: Int): DataFrame = {
    val states = weightedRanks(spark, sfDir, iters)
    val deltas = states.sliding(2).map { case Seq((_, prev), (k, cur)) =>
      prev.as("p").join(cur.as("c"), col("p.node") === col("c.node"))
        .select(abs(col("c.r") - col("p.r")).as("d"))
        .agg(max(col("d")).as("max_delta_ppb"),
          sum(col("d")).as("sum_delta_ppb"))
        .select(lit(k.toLong).as("iter"), col("max_delta_ppb"),
          col("sum_delta_ppb"))
    }.reduce(_.unionAll(_))
    materializeAndRelease(spark, deltas, states.map(_._2))
  }

  /** Min-label propagation over the backbone, `rounds` synchronous
    * rounds: lab₀(v) = v, lab_k+1(v) = min(lab_k(v), min over neighbors
    * lab_k(u)). After enough rounds this is connected components; we
    * gate the deterministic K-round state (converged iff every
    * component's diameter ≤ K — the reported label histogram makes the
    * convergence level observable). Same Pregel layout as [[pageRank]]:
    * one edge-keyed shuffle per round, no collect, no rank broadcast —
    * the standard large-graph CC loop at 1000 executors. */
  def labelPropagation(spark: SparkSession, sfDir: String,
      rounds: Int): DataFrame = {
    var lab = symmetric(backbone(spark, sfDir))
      .select(col("src").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      val nbrMin = symmetric(backbone(spark, sfDir)).as("e")
        .join(lab.as("l"), col("e.src") === col("l.node"))
        .groupBy(col("e.dst").as("node")).agg(min(col("lab")).as("nl"))
      lab = lab.join(nbrMin, Seq("node"))
        .select(col("node"), least(col("lab"), col("nl")).as("lab"))
    }
    lab
  }

  /** Newman MODULARITY of the label-propagation partition — the
    * one-number answer to "did the clustering find real structure?"
    * (Q > 0 ⇔ more intra-community edges than a degree-preserving
    * random rewiring; Q ≈ 0 ⇔ the partition is noise):
    *
    *   Q = Σ_c (e_c/m − (d_c/2m)²)
    *     = (Σ_c 4·m·e_c − d_c²) / (4·m²)   — one exact BIGINT ratio,
    *
    * quantized to ppm with the (verified) both-engines-truncate
    * division. Magnitudes: 4·m·e_c and d_c² ≤ 4m² ~ 10⁸ at fixture
    * scale and the ppm scale holds through m ~ 10⁶ edges; larger
    * graphs widen the numerator to DECIMAL (the weighted-PageRank
    * bound discipline). One labels join per side of the edge list +
    * two community-keyed aggs — the same shuffles the LP rounds
    * themselves take. */
  def modularity(spark: SparkSession, sfDir: String,
      rounds: Int): DataFrame = {
    val lab = labelPropagation(spark, sfDir, rounds)
    val edges = backbone(spark, sfDir).select(col("src"), col("dst"))
    val mAgg = edges.agg(count(lit(1)).as("m"))
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    val dsum = deg.join(lab, Seq("node"))
      .groupBy(col("lab")).agg(sum(col("d")).as("d_c"))
    val ein = edges
      .join(lab.select(col("node").as("src"), col("lab").as("la")), Seq("src"))
      .join(lab.select(col("node").as("dst"), col("lab").as("lb")), Seq("dst"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("e_c"))
    dsum.join(ein, Seq("lab"), "left")
      .select(col("lab"), coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
      .crossJoin(broadcast(mAgg))
      .agg(min(col("m")).as("m"), count(lit(1)).as("n_communities"),
        sum(lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
          .as("qnum"))
      .select(col("m"), col("n_communities"),
        expr("qnum * 1000000 div (4 * m * m)").as("q_ppm"))
  }

  /** Triangle enumeration on the backbone: the canonical a<b<c wedge
    * join — e1(a,b) ⋈ e2(b,c) closed by e3(a,c). The ordering
    * constraint (src < dst everywhere) enumerates each triangle exactly
    * once and keeps the wedge fan-out at Σ deg²/2 of the *backbone*,
    * not the full graph. */
  def triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val e1 = backbone(spark, sfDir).select(col("src").as("a"), col("dst").as("b"))
    val e2 = backbone(spark, sfDir).select(col("src").as("b"), col("dst").as("c"))
    val e3 = backbone(spark, sfDir).select(col("src").as("a"), col("dst").as("c"))
    e1.join(e2, Seq("b")).join(e3, Seq("a", "c")).select("a", "b", "c")
  }

  /** LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998): per node,
    * the fraction of its neighbor pairs that are themselves adjacent —
    * lcc = 2·T(v) / (d(v)·(d(v)−1)) in ppm from the exact per-node
    * triangle counts (each [[triangles]] row credits all three
    * corners); the per-node texture the one-number transitivity hides.
    * Degree-1 nodes have no neighbor pair and report 0 over d·(d−1)=0
    * — excluded (the standard convention). Scale shape: the triangle
    * join is the deg²-bounded wedge pattern; the per-node fold and
    * degree join are node-keyed. */
  def localClustering(spark: SparkSession, sfDir: String): DataFrame = {
    val tri = triangles(spark, sfDir)
    val corners = tri.select(col("a").as("node"))
      .unionAll(tri.select(col("b").as("node")))
      .unionAll(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    val deg = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    deg.filter(col("d") >= 2)
      .join(corners, Seq("node"), "left")
      .select(col("node"), col("d"),
        coalesce(col("t"), lit(0L)).as("n_triangles"))
      .withColumn("lcc_ppm",
        expr("n_triangles * 2 * 1000000 div (d * (d - 1))"))
  }

  /** GLOBAL TRANSITIVITY: 3·triangles / wedges in ppm over the SAME
    * backbone [[triangles]] walks (wedges from backbone degrees —
    * mixing graphs here would silently inflate the denominator). The
    * hub-weighted closure number beside [[localClustering]]'s
    * per-node, equal-weight view. Wedge sum Σ d(d−1)/2 runs on the
    * deg-bounded distribution rows. */
  def transitivity(spark: SparkSession, sfDir: String): DataFrame = {
    val tri = triangles(spark, sfDir).agg(count(lit(1)).as("t"))
    val wedges = symmetric(backbone(spark, sfDir))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .select(expr("d * (d - 1) div 2").as("w"))
      .agg(sum(col("w")).as("wedges"))
    tri.crossJoin(broadcast(wedges))
      .select(col("t").as("n_triangles"), col("wedges"),
        expr("t * 3 * 1000000 div wedges").as("transitivity_ppm"))
  }

  // ------------- k-NN graph over the embedding corpus (r16) -------------

  /** The kNN graph's coarse-quantizer epoch: the trained centroids
    * (K ~ √N, 2 Lloyd iterations — exactly the chain
    * SimilarityQueries.clusterAssignCtes mirrors), persisted once per
    * (session, dataset) and shared by the graph BUILD (seed probing)
    * and graph SEARCH (entry cell selection) — the serving quantizer is
    * trained once, not per caller. */
  def centsDir(spark: SparkSession, sfDir: String): String =
    EpochRegistry.acquire(spark, "graph_knn_cents", sfDir) { () =>
      graft.functions.GraftFunctions.register(spark)
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_knn_cents_").toString
      val emb = Tables.embeddings(spark, sfDir)
      VectorOps.trainCentroids(emb, graft.SimilarityQueries.ivfK(emb),
          iterations = 2)
        .write.mode("overwrite").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }

  /** The corpus→cell assignment epoch under [[centsDir]]'s frozen
    * quantizer: (list_id, vec_id), one row per corpus vector. */
  def cellsDir(spark: SparkSession, sfDir: String): String = {
    // child epoch resolved BEFORE the acquire — a nested computeIfAbsent
    // on the registry map throws "Recursive update" on bin collision
    // (the bandAppendIndexFor discipline)
    val centsPath = centsDir(spark, sfDir)
    EpochRegistry.acquire(spark, "graph_knn_cells", sfDir) { () =>
      graft.functions.GraftFunctions.register(spark)
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_knn_cells_").toString
      val cents = broadcast(spark.read.parquet(centsPath))
      VectorOps.assignLists(Tables.embeddings(spark, sfDir), cents)
        .select(col("list_id"), col("vec_id"))
        .write.mode("overwrite").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }
  }

  /** K-MEANS-seeded, NN-DESCENT-refined k-NN graph epoch (the
    * FAISS-IVF seed + Dong et al. 2011 refinement): every vector's
    * top-k cosine neighbors WITHIN its trained k-means cell (the same
    * coarse quantizer the IVF index families serve from — a 4-bit sign
    * seed measured recall@3 0.12 on this corpus, the cell seed 0.9+),
    * then `descentRounds` rounds of "my neighbors' neighbors are
    * probably my neighbors": candidates = edges ∪ reversed ∪ 2-hop,
    * exact re-rank, per-src top-k — descent heals the cross-cell edges
    * a single-probe seed misses. The audit (`graph_knn_recall`) gates
    * the result. Materialized once per (session, dataset) — the graph
    * is an index artifact (the r15 re-evaluation trap otherwise).
    *
    * Scale shape: the seed self-join's per-cell density is N/K (K ~ √N
    * — the semantic-dedup shape, never all-pairs); each descent round
    * is candidate-bounded at N·(k² + 2k) rows re-scored through two
    * embedding joins — linear in N at fixed k, the standard
    * distributed kNN-graph recipe at 100 TB. */
  def knnGraphDir(spark: SparkSession, sfDir: String, k: Int = KnnK,
      descentRounds: Int = KnnDescentRounds): String = {
    // child epochs resolved BEFORE the acquire — a nested
    // computeIfAbsent on the registry map throws "Recursive update" on
    // bin collision (the bandAppendIndexFor discipline)
    val centsPath = centsDir(spark, sfDir)
    val cellsPath = cellsDir(spark, sfDir)
    // parameter-keyed epoch: a non-default (k, rounds) build can never
    // serve (or be served by) the gated default epoch (ADVICE r16)
    val epochKey =
      if (k == KnnK && descentRounds == KnnDescentRounds) "graph_knn_edges"
      else s"graph_knn_edges_k${k}_d$descentRounds"
    EpochRegistry.acquire(spark, epochKey, sfDir) { () =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_knn_").toString
      buildEdges(Tables.embeddings(spark, sfDir),
        spark.read.parquet(centsPath), spark.read.parquet(cellsPath),
        k, descentRounds,
        knn => knn.write.mode("overwrite").parquet(path))
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }
  }

  /** The seed + NN-descent edge build of [[knnGraphDir]] over an
    * ARBITRARY (vec_id, embedding) corpus under a FROZEN quantizer —
    * shared by the session epoch and [[writeGraphIndex]] (the served
    * generation / retrain path), so the two can never drift. `write`
    * receives the final ranked edge frame while the per-round caches
    * are still live (each round references the previous round's edges
    * ~4× — fwd twice in the 2-hop join, the union, the reverse — so
    * every round persists+forces, or the seed join re-runs
    * exponentially in round count: the r15 re-evaluation trap, loop
    * form). */
  private def buildEdges(corpus: DataFrame, centsDf: DataFrame,
      cellsDf: DataFrame, k: Int, descentRounds: Int,
      write: DataFrame => Unit, labeled: Boolean = false): Unit = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_sim").desc, col("dst"))
    def embAs(idName: String, embName: String) =
      corpus.select(col("vec_id").as(idName), col("embedding").as(embName))
    val cents = broadcast(centsDf)
    // corpus side lives in its ONE nearest cell; the src side probes
    // its 4 nearest cells — the IVF serving nProbe, which is what
    // lifts seed recall@3 from 0.21 (own-cell only) to ~0.9 here
    //
    // LABELED build (r18 — the FilteredDiskANN-style stitched graph):
    // when `labeled`, the corpus carries a `label` column and the SEED
    // join additionally matches on it, so every seed edge stays within
    // its label's subgraph. That single equality is sufficient: the
    // descent candidates (reversed edges, 2-hops of within-label
    // edges) are CLOSED under the label by construction, so the
    // rounds below need no change — the result is the union of
    // per-label kNN graphs built in ONE pass (the (cell, label)
    // sub-partitioned seed join is strictly finer, hence cheaper,
    // than the unlabeled one).
    val lbl = (id: String) =>
      corpus.select(col("vec_id").as(id), col("label").as(s"_l$id"))
    val dstLists0 = cellsDf
      .select(col("list_id"), col("vec_id").as("dst"))
      .join(embAs("dst", "bemb"), Seq("dst"))
    val dstLists =
      if (labeled) dstLists0.join(lbl("dst"), Seq("dst")) else dstLists0
    val probeW = Window.partitionBy(col("src"))
      .orderBy(col("_csim").desc, col("cid"))
    // r21: spreading this side (with the cellsDir/writeGraphIndex
    // assignment spreads) was measured min-of-3 and REVERTED — the
    // full graph build went 8.41 -> 10.22 s at local[32]; see the
    // VectorOps build-path note
    val srcProbe0 = embAs("src", "aemb").crossJoin(cents)
      .withColumn("_csim", round(VectorOps.cosine(col("aemb"), col("cv")), 6))
      .withColumn("_cr", row_number().over(probeW))
      .filter(col("_cr") <= KnnSeedProbeCells)
      .select(col("cid").as("list_id"), col("src"), col("aemb"))
    val srcProbe =
      if (labeled) srcProbe0.join(lbl("src"), Seq("src")) else srcProbe0
    val cached = Seq.newBuilder[DataFrame]
    var knn = srcProbe.join(dstLists, Seq("list_id"))
      .filter(col("src") =!= col("dst"))
      .filter(if (labeled) col("_lsrc") === col("_ldst") else lit(true))
      .select(col("src"), col("dst"),
        round(VectorOps.cosine(col("aemb"), col("bemb")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .persist()
    knn.count()
    cached += knn
    (1 to descentRounds).foreach { _ =>
      val fwd = knn.select(col("src"), col("dst"))
      val rev = knn.select(col("dst").as("src"), col("src").as("dst"))
      val hop = fwd.as("x").join(fwd.as("y"), col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
      val cand = fwd.unionAll(rev).unionAll(hop)
        .filter(col("src") =!= col("dst")).distinct()
      knn = cand.join(embAs("src", "semb"), Seq("src"))
        .join(embAs("dst", "demb"), Seq("dst"))
        .select(col("src"), col("dst"),
          round(VectorOps.cosine(col("semb"), col("demb")), 6).as("cos_sim"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .persist()
      knn.count()
      cached += knn
    }
    write(knn)
    cached.result().foreach(_.unpersist())
  }

  /** Fresh scan of the materialized k-NN graph. */
  def knnEdges(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(knnGraphDir(spark, sfDir))

  /** The LABEL-AWARE ("stitched") kNN graph epoch (r18 — the
    * FilteredDiskANN fix the filtered-probe recall audit called for):
    * the union of per-label kNN subgraphs, built in ONE pass by
    * [[buildEdges]] with the seed join matching on the label
    * (descent is closed under the label, so the refinement rounds are
    * the standard ones). A filtered walk over THIS adjacency expands
    * through neighbors that are admissible by construction, instead of
    * burning beam slots on a label-agnostic graph's candidates —
    * measured recall@3 0.70 → 0.93 at sf0.01 at the same entry width.
    * Shares the serving quantizer and cells with the unlabeled epoch. */
  def labeledKnnGraphDir(spark: SparkSession, sfDir: String,
      k: Int = KnnK, descentRounds: Int = KnnDescentRounds): String = {
    val centsPath = centsDir(spark, sfDir)
    val cellsPath = cellsDir(spark, sfDir)
    val epochKey =
      if (k == KnnK && descentRounds == KnnDescentRounds)
        "graph_knn_ledges"
      else s"graph_knn_ledges_k${k}_d$descentRounds"
    EpochRegistry.acquire(spark, epochKey, sfDir) { () =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_lknn_").toString
      buildEdges(
        Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"), col("label")),
        spark.read.parquet(centsPath), spark.read.parquet(cellsPath),
        k, descentRounds,
        knn => knn.write.mode("overwrite").parquet(path), labeled = true)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }
  }

  /** Label-filtered graph serving over the STITCHED adjacency — the
    * session-epoch filtered walk with [[labeledKnnGraphDir]]'s edges:
    * same entry (the label's members of the query's
    * [[WalkFilteredEntryCells]] cells, label-matched before every
    * rank), but frontier expansion now routes through the label's own
    * kNN subgraph. */
  def graphSearchFilteredStitched(spark: SparkSession, sfDir: String,
      queries: DataFrame, labelRel: DataFrame, k: Int,
      beam: Int = WalkBeam, rounds: Int = WalkRounds,
      entryCells: Int = WalkFilteredEntryCells): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    beamWalk(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel")),
      spark.read.parquet(labeledKnnGraphDir(spark, sfDir))
        .select(col("src"), col("dst")),
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("node"), col("embedding").as("nemb")),
      spark.read.parquet(centsDir(spark, sfDir)),
      spark.read.parquet(cellsDir(spark, sfDir))
        .select(col("list_id"), col("vec_id")),
      k, beam, rounds, entryCells,
      labelRel = Some(labelRel.select(col("vec_id"), col("label"))))
  }

  /** Mutual-kNN symmetrization: the undirected edge (a < b) survives
    * only if each endpoint is in the OTHER's top-k — the standard cut
    * that drops asymmetric hub links before density-based clustering.
    * A self-equi-join on the (already tiny) k·N edge table. */
  def mutualKnnEdges(knn: DataFrame): DataFrame = {
    val d = knn.select(col("src"), col("dst"))
    val r = knn.select(col("dst").as("src"), col("src").as("dst"))
    d.join(r, Seq("src", "dst")).filter(col("src") < col("dst"))
  }

  /** Graph-based ANN serving (the DiskANN/SPANN-class hybrid the kNN
    * graph exists for): entry = the members of the query's `entryCells`
    * nearest quantizer cells (the IVF probe, already near the answer),
    * then `rounds` rounds of greedy BEAM refinement — "score my
    * frontier's graph neighbors, keep the best `beam`" — which heals
    * the cell-boundary misses a pure IVF probe makes; report the final
    * frontier's top-k. Everything is rounded-cosine ranking with id
    * tie-breaks, so the whole walk is mirrorable round-for-round
    * (measured recall@3 at sf0.001: fixed-32-entry walk 0.23 →
    * cell-entry + walk 0.9+).
    *
    * Scale shape: entry scoring is entryCells·N/K rows per query
    * (~2√N); each round is O(beam·k) candidate scorings, independent
    * of corpus size. The corpus is never scanned at serving time — the
    * index IS the graph + quantizer. Each round's frontier is
    * materialized through the RDD-persist leaf (the ivfTopK pattern:
    * reference-tracked, the ContextCleaner frees the blocks) — it is
    * referenced twice per round, the r15 re-evaluation trap in loop
    * form. */
  def graphSearch(spark: SparkSession, sfDir: String, queries: DataFrame,
      k: Int, beam: Int = WalkBeam, rounds: Int = WalkRounds,
      entryCells: Int = WalkEntryCells): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    beamWalk(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      knnEdges(spark, sfDir).select(col("src"), col("dst")),
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("node"), col("embedding").as("nemb")),
      spark.read.parquet(centsDir(spark, sfDir)),
      spark.read.parquet(cellsDir(spark, sfDir))
        .select(col("list_id"), col("vec_id")),
      k, beam, rounds, entryCells)
  }

  /** The cell-entry greedy beam walk shared by the session-epoch server
    * ([[graphSearch]]) and the persisted-generation prober
    * ([[probeGraphIndex]]): entry = the members of the query's
    * `entryCells` nearest quantizer cells, then `rounds` rounds of
    * "score my frontier's graph neighbors, keep the best `beam`".
    * `q` is (query_id, qv); `nodeEmb` (node, nemb) is the ONLY relation
    * candidates are scored against — a node absent from it (tombstoned,
    * purged) can neither enter the frontier nor be served, which is
    * what makes soft-delete exclusion and physical compaction
    * result-identical by construction.
    *
    * METADATA FILTERING: when `q` carries a `qlabel` column and
    * `labelRel` (vec_id, label) is given, candidates are label-matched
    * BEFORE every rank (post-filtering a top-k would under-fill k — the
    * classic filtered-ANN mistake): the walk routes through the
    * label's own subgraph, entering via the label's members of the
    * query's cells — the label-partitioned walk of
    * [[probeGraphIndexFiltered]]. The label relation joins the
    * BEAM-BOUNDED candidate frame inside each scoring round (VERDICT
    * r17 advisory: the old form pre-joined labels onto the full node
    * table, paying one corpus-wide label hash join per walk even
    * though only frontier-sized candidates are ever scored).
    *
    * CACHE HYGIENE (VERDICT r17 advisory): each round's frontier is an
    * RDD-persisted leaf (referenced twice by the next round — the r15
    * re-evaluation trap, loop form); at walk exit the FINAL frontier is
    * forced and every earlier round's leaf is released, so one probe
    * leaves exactly one block-manager entry — the result leaf itself,
    * reference-tracked by the ContextCleaner (the buildEdges
    * discipline, applied to serving). */
  private def beamWalk(spark: SparkSession, q: DataFrame, edges: DataFrame,
      nodeEmb: DataFrame, centsDf: DataFrame, cellsDf: DataFrame,
      k: Int, beam: Int, rounds: Int, entryCells: Int,
      labelRel: Option[DataFrame] = None): DataFrame = {
    val beamW = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("node"))
    val cachedRdds =
      Seq.newBuilder[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def scoreTop(cand: DataFrame, width: Int): DataFrame = {
      // the query vector is itself a corpus node — never serve it back
      val base = cand.filter(col("query_id") =!= col("node"))
        .join(nodeEmb, Seq("node"))
        .join(broadcast(q), Seq("query_id"))
      // the label relation joins the candidate frame (beam·queries
      // rows after round 0), never the full node table — the probe
      // side of this key join is frontier-sized by construction
      val joined = labelRel match {
        case Some(lr) =>
          base.join(lr.select(col("vec_id").as("node"),
              col("label").as("nlabel")), Seq("node"))
            .filter(col("nlabel") === col("qlabel"))
        case None => base
      }
      val scored = joined
        .select(col("query_id"), col("node"),
          round(VectorOps.cosine(col("qv"), col("nemb")), 6).as("cos_sim"))
        .withColumn("rk", row_number().over(beamW).cast("long"))
        .filter(col("rk") <= width)
      val rdd = scored.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cachedRdds += rdd
      spark.createDataFrame(rdd, scored.schema)
    }
    // entry: the query's entryCells nearest centroids' member lists
    val cents = broadcast(centsDf)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("_csim").desc, col("cid"))
    val qCells = q.crossJoin(cents)
      .withColumn("_csim", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .withColumn("_cr", row_number().over(probeW))
      .filter(col("_cr") <= entryCells)
      .select(col("query_id"), col("cid").as("list_id"))
    val entry = qCells.join(
        cellsDf.select(col("list_id"), col("vec_id").as("node")),
        Seq("list_id"))
      .select(col("query_id"), col("node"))
    var frontier = scoreTop(entry, beam)
    (1 to rounds).foreach { _ =>
      val cand = frontier.select(col("query_id"), col("node"))
        .unionAll(frontier.select(col("query_id"), col("node").as("src"))
          .join(edges, Seq("src"))
          .select(col("query_id"), col("dst").as("node")))
        .distinct()
      frontier = scoreTop(cand, beam)
    }
    // force the final frontier, then release every earlier round's leaf
    // (bounded at beam·queries rows each — hygiene, not correctness)
    val all = cachedRdds.result()
    all.last.count()
    all.init.foreach { r => r.unpersist(); () }
    frontier.filter(col("rk") <= k)
      .select(col("query_id"), col("node").as("neighbor_id"),
        col("cos_sim"), col("rk"))
  }

  /** Incremental graph INSERT (the NSW append): each new vector's
    * out-edges are its beam-walk top-k over the FROZEN graph — exactly
    * [[graphSearch]] run with the batch as the query set — and the
    * appended generation is base edges ∪ new-node edges (existing
    * nodes' out-edges untouched; the walk can still route THROUGH new
    * nodes via their forward edges). Per-inserted-vector cost is the
    * serving cost — O(entry + beam·k·rounds), corpus-independent — the
    * property that makes graph indexes incrementally maintainable at
    * 100 TB. Batch = the standard exact-dup append wave (id+100000). */
  def knnAppendDir(spark: SparkSession, sfDir: String): String = {
    // every child epoch resolves BEFORE the acquire (fresh inserts into
    // the registry inside a build are the flaky "Recursive update");
    // the walk itself is LAZY so a warm call — epoch already built —
    // never re-plans or re-runs it (graphSearch's own acquires inside
    // the build are then pure cache hits, which do not insert)
    val basePath = knnGraphDir(spark, sfDir)
    centsDir(spark, sfDir); cellsDir(spark, sfDir)
    EpochRegistry.acquire(spark, "graph_knn_append", sfDir) { () =>
      val batch = graft.SimilarityQueries
        .dupVectors(Tables.embeddings(spark, sfDir))
        .filter(col("vec_id") >= 100000)
      val newEdges = graphSearch(spark, sfDir, batch, k = 3)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
          col("cos_sim"), col("rk"))
      val path = java.nio.file.Files
        .createTempDirectory("graft_graph_knn_append_").toString
      spark.read.parquet(basePath).unionAll(newEdges)
        .write.mode("overwrite").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }
  }

  /** Min-label propagation over an ARBITRARY undirected edge set,
    * seeded with every node in `nodes` — isolated nodes keep their own
    * label (singleton clusters, not dropped rows), hence the left join
    * the backbone variant ([[labelPropagation]]) doesn't need. Same
    * Pregel layout: one edge-keyed shuffle per round, no collect. */
  def labelPropagationOver(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    var lab = nodes.select(col("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      val nbrMin = sym.as("e")
        .join(lab.as("l"), col("e.src") === col("l.node"))
        .groupBy(col("e.dst").as("node")).agg(min(col("lab")).as("nl"))
      lab = lab.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("nl"), col("lab"))).as("lab"))
    }
    lab
  }

  // -----------------------------------------------------------------
  // Persisted graph-index generations (r17): the kNN-graph family gains
  // the SAME lifecycle the six other ANN serving families carry —
  // build → serve → append → delete → upsert → compact → monitor →
  // retrain, with Generations pointer publishing and a CDC loop
  // (IngestStream.cdcGraphSink). The served index is four catalog
  // tables: `_cents` (frozen coarse quantizer), `_cells` (corpus→cell
  // assignment, partitionBy(list_id) — the entry lists, DPP-pruned at
  // probe time), `_nodes` (the full-precision vectors the walk scores
  // against — the graph index CARRIES its vectors, the DiskANN layout,
  // so probes never touch the lake), `_edges` (the ranked adjacency).
  // -----------------------------------------------------------------

  /** K = max(4, ⌊√n⌋) — the corpus-derived cell count every quantizer
    * build in the repo uses (probe cost ~ entryCells·√N either way). */
  private def kOf(corpus: DataFrame): Int =
    math.max(4, math.floor(math.sqrt(corpus.count().toDouble)).toInt)

  /** BUILD a served graph-index generation from scratch over `corpus`
    * (vec_id, embedding): train the coarse quantizer (K = max(4, ⌊√n⌋),
    * the corpusK discipline), assign cells, copy the vectors, run the
    * seed + NN-descent edge build — result-defined equal to the session
    * epoch built over the same corpus, which is what lets the retrain
    * generation share the build's corpus-parameterized mirror. Also the
    * RETRAIN executor's engine ([[retrainGraphIndex]]). */
  def writeGraphIndex(corpus: DataFrame, table: String, path: String,
      trainIters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val trained = VectorOps.trainCentroids(corpus, kOf(corpus), trainIters)
    // RDD-persist leaf: the trained centroids are referenced by the
    // assignment AND the edge build — without the leaf each reference
    // re-runs the Lloyd passes (the r14 tiny-aggregate trap)
    val centRdd = trained.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = spark.createDataFrame(centRdd, trained.schema)
    cents.write.mode("overwrite").format("parquet")
      .option("path", s"$path/cents").saveAsTable(s"${table}_cents")
    VectorOps.assignLists(corpus, broadcast(cents))
      .select(col("vec_id"), col("list_id"))
      .write.mode("overwrite").format("parquet")
      .partitionBy("list_id")
      .option("path", s"$path/cells").saveAsTable(s"${table}_cells")
    corpus.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/nodes").saveAsTable(s"${table}_nodes")
    buildEdges(spark.table(s"${table}_nodes"),
      spark.table(s"${table}_cents"),
      spark.table(s"${table}_cells").select(col("list_id"), col("vec_id")),
      KnnK, KnnDescentRounds,
      knn => knn.write.mode("overwrite").format("parquet")
        .option("path", s"$path/edges").saveAsTable(s"${table}_edges"))
    centRdd.unpersist()
  }

  /** PROBE a graph-index generation — [[graphSearch]] against the
    * persisted tables instead of the session epoch, with the family's
    * pointer indirection ([[Generations.resolveServing]]) and tombstone
    * exclusion. Dead ids are dropped from the ONE relation candidates
    * score against (`_nodes`), so they can neither enter via the entry
    * cells nor via an in-edge NOR be served — and because a compacted
    * generation differs only by physically removing those same rows,
    * the soft-deleted and compacted probes are result-identical by
    * construction (they share one oracle). Deleted nodes do not route
    * (their out-edges never expand — the frontier cannot contain them),
    * the conservative variant of HNSW mark-deletion; the walk heals
    * around the hole through the entry cells. */
  def probeGraphIndex(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, beam: Int = WalkBeam, rounds: Int = WalkRounds,
      entryCells: Int = WalkEntryCells): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val t = Generations.resolveServing(spark, table)
    val nodes =
      if (spark.catalog.tableExists(s"${t}_tombstones"))
        spark.table(s"${t}_nodes").join(
          broadcast(spark.table(s"${t}_tombstones").select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
      else spark.table(s"${t}_nodes")
    beamWalk(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      spark.table(s"${t}_edges").select(col("src"), col("dst")),
      nodes.select(col("vec_id").as("node"), col("embedding").as("nemb")),
      spark.table(s"${t}_cents"),
      spark.table(s"${t}_cells").select(col("list_id"), col("vec_id")),
      k, beam, rounds, entryCells)
  }

  /** METADATA-FILTERED probe of a graph-index generation — the
    * production "vector search with attribute filter" for the graph
    * family ([[VectorOps.probeIvfIndexFiltered]]'s walk twin): each
    * query returns only neighbors whose `label` equals its own,
    * matched BEFORE every rank, so the walk routes through the label's
    * own subgraph (entry = the label's members of the query's cells;
    * a frontier node's out-edges may point anywhere, but non-matching
    * candidates drop before they can take a beam slot). `labelRel`
    * (vec_id, label) is the metadata side, equi-joined to the
    * BEAM-BOUNDED candidate frame inside each scoring round (VERDICT
    * r17 advisory: pre-joining it onto the full `_nodes` paid one
    * corpus-wide label hash join per probe; the frontier is
    * beam·queries rows, so the label join's probe side is now
    * candidate-sized at every round). */
  def probeGraphIndexFiltered(spark: SparkSession, table: String,
      queries: DataFrame, labelRel: DataFrame, k: Int,
      beam: Int = WalkBeam, rounds: Int = WalkRounds,
      entryCells: Int = WalkFilteredEntryCells): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val t = Generations.resolveServing(spark, table)
    val nodes =
      if (spark.catalog.tableExists(s"${t}_tombstones"))
        spark.table(s"${t}_nodes").join(
          broadcast(spark.table(s"${t}_tombstones").select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
      else spark.table(s"${t}_nodes")
    beamWalk(spark,
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel")),
      spark.table(s"${t}_edges").select(col("src"), col("dst")),
      nodes.select(col("vec_id").as("node"), col("embedding").as("nemb")),
      spark.table(s"${t}_cents"),
      spark.table(s"${t}_cells").select(col("list_id"), col("vec_id")),
      k, beam, rounds, entryCells,
      labelRel = Some(labelRel.select(col("vec_id"), col("label"))))
  }

  /** SHORTLIST → EXACT-RE-RANK serving for the graph family (VERDICT
    * r17 #2 — the last asymmetry in the seven-family serving matrix:
    * PQ/IVF-PQ/residual/binary each gate a shortlist → exact-re-rank
    * composition; the graph index already carries full-precision
    * vectors in `_nodes`, so its re-rank needs no second relation): a
    * WIDENED beam walk ([[WalkRerankBeam]] — 2× the serving beam, the
    * family's shortlist-widening ratio) produces the candidate
    * shortlist, then the shortlist alone re-scores by exact cosine
    * against `_nodes` and the top-k is served. Cost: the wide walk is
    * ~2× the serving walk's candidate volume (still corpus-independent
    * per round), and the re-rank is shortlist·1 rows through one key
    * join — the recall lift of a wider frontier at strictly bounded
    * extra work, never a corpus scan. */
  def probeGraphIndexRerank(spark: SparkSession, table: String,
      queries: DataFrame, k: Int, shortBeam: Int = WalkRerankBeam,
      rounds: Int = WalkRounds,
      entryCells: Int = WalkRerankEntryCells): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val t = Generations.resolveServing(spark, table)
    val nodes =
      if (spark.catalog.tableExists(s"${t}_tombstones"))
        spark.table(s"${t}_nodes").join(
          broadcast(spark.table(s"${t}_tombstones").select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
      else spark.table(s"${t}_nodes")
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val shortlist = beamWalk(spark, q,
      spark.table(s"${t}_edges").select(col("src"), col("dst")),
      nodes.select(col("vec_id").as("node"), col("embedding").as("nemb")),
      spark.table(s"${t}_cents"),
      spark.table(s"${t}_cells").select(col("list_id"), col("vec_id")),
      k = shortBeam, beam = shortBeam, rounds = rounds,
      entryCells = entryCells)
      .select(col("query_id"), col("neighbor_id").as("node"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("node"))
    shortlist
      .join(nodes.select(col("vec_id").as("node"),
        col("embedding").as("nemb")), Seq("node"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("node"),
        round(VectorOps.cosine(col("qv"), col("nemb")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("node").as("neighbor_id"),
        col("cos_sim"), col("rk"))
  }

  /** INSERT maintenance — the NSW append against a persisted
    * generation: each new vector's out-edges are its beam-walk top-k
    * over the index AS IT STANDS (tombstones respected), its vector
    * joins `_nodes`, and its cell assignment (frozen quantizer) joins
    * the entry lists — so an appended vector is immediately REACHABLE
    * through entry, not just routable through. Per-vector cost is the
    * serving cost (entry + beam·k·rounds — corpus-independent), the
    * property that makes graph indexes incrementally maintainable at
    * 100 TB. The walk result is lineage-severed (RDD leaf + force)
    * before the edge append: it READS `_edges` while appending to it. */
  def appendToGraphIndex(spark: SparkSession, table: String,
      batch: DataFrame): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val t = Generations.resolveServing(spark, table)
    val newEdges = probeGraphIndex(spark, t, batch, k = KnnK)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
        col("cos_sim"), col("rk"))
    val rdd = newEdges.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    spark.createDataFrame(rdd, newEdges.schema)
      .write.mode("append").format("parquet").saveAsTable(s"${t}_edges")
    rdd.unpersist()
    batch.select(col("vec_id"), col("embedding"))
      .write.mode("append").format("parquet").saveAsTable(s"${t}_nodes")
    val cents = broadcast(spark.table(s"${t}_cents"))
    // insertInto is positional: partitioned schema is (vec_id, list_id)
    VectorOps.assignLists(batch, cents)
      .select(col("vec_id"), col("list_id"))
      .write.mode("append").insertInto(s"${t}_cells")
  }

  /** Copy a graph-index generation — the clone step of every
    * clone-corrupt/append-settle epoch. Tombstones do NOT copy (they
    * belong to the source generation's pending-maintenance state). */
  def cloneGraphIndex(spark: SparkSession, src: String, dest: String,
      path: String): Unit = {
    spark.table(s"${src}_cents").write.mode("overwrite").format("parquet")
      .option("path", s"$path/cents").saveAsTable(s"${dest}_cents")
    spark.table(s"${src}_cells").write.mode("overwrite").format("parquet")
      .partitionBy("list_id")
      .option("path", s"$path/cells").saveAsTable(s"${dest}_cells")
    spark.table(s"${src}_nodes").write.mode("overwrite").format("parquet")
      .option("path", s"$path/nodes").saveAsTable(s"${dest}_nodes")
    spark.table(s"${src}_edges").write.mode("overwrite").format("parquet")
      .option("path", s"$path/edges").saveAsTable(s"${dest}_edges")
  }

  /** COMPACTION — settle pending tombstones physically: the new
    * generation drops dead ids from the nodes, the entry cells, and the
    * adjacency (both as src — their out-edges — and as dst — in-edges
    * pointing at them), and starts tombstone-free. Result-identical to
    * probing the source with its tombstones ([[probeGraphIndex]]'s
    * exclusion argument), so the compacted probe shares the deleted
    * probe's oracle. One generation copy — the family's compaction cost
    * class. */
  def compactGraphIndex(spark: SparkSession, src: String, dest: String,
      path: String): Unit = {
    import spark.implicits._
    val dead =
      if (spark.catalog.tableExists(s"${src}_tombstones"))
        spark.table(s"${src}_tombstones").select(col("vec_id")).distinct()
      else Seq.empty[Long].toDF("vec_id")
    spark.table(s"${src}_cents").write.mode("overwrite").format("parquet")
      .option("path", s"$path/cents").saveAsTable(s"${dest}_cents")
    spark.table(s"${src}_cells")
      .join(broadcast(dead), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("list_id"))
      .write.mode("overwrite").format("parquet").partitionBy("list_id")
      .option("path", s"$path/cells").saveAsTable(s"${dest}_cells")
    spark.table(s"${src}_nodes")
      .join(broadcast(dead), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/nodes").saveAsTable(s"${dest}_nodes")
    spark.table(s"${src}_edges")
      .join(broadcast(dead.select(col("vec_id").as("src"))),
        Seq("src"), "left_anti")
      .join(broadcast(dead.select(col("vec_id").as("dst"))),
        Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), col("cos_sim"), col("rk"))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/edges").saveAsTable(s"${dest}_edges")
  }

  /** UPDATE maintenance — the generation-step upsert (graph indexes
    * cannot update in place: an edge's stored score is the endpoint
    * vectors' cosine, stale the moment either moves — the
    * FreshDiskANN delete-then-reinsert model): the new generation
    * PRUNES every touched or tombstoned id (its rows in nodes/cells,
    * its out-edges, AND in-edges pointing at it — a stale in-edge
    * score is the subtle corruption), then re-inserts the winning
    * (vec_id, embedding) batch through the standard append walk over
    * the pruned graph. Batch semantics (all winners walk the same
    * frozen pruned graph at once — order-free, which is what makes the
    * settle mirrorable); the result starts tombstone-free. */
  def upsertToGraphIndex(spark: SparkSession, src: String, dest: String,
      path: String, vecs: DataFrame): Unit = {
    import spark.implicits._
    val dead =
      if (spark.catalog.tableExists(s"${src}_tombstones"))
        spark.table(s"${src}_tombstones").select(col("vec_id")).distinct()
      else Seq.empty[Long].toDF("vec_id")
    val gone = vecs.select(col("vec_id")).distinct()
      .unionAll(dead).distinct()
    spark.table(s"${src}_cents").write.mode("overwrite").format("parquet")
      .option("path", s"$path/cents").saveAsTable(s"${dest}_cents")
    spark.table(s"${src}_cells")
      .join(broadcast(gone), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("list_id"))
      .write.mode("overwrite").format("parquet").partitionBy("list_id")
      .option("path", s"$path/cells").saveAsTable(s"${dest}_cells")
    spark.table(s"${src}_nodes")
      .join(broadcast(gone), Seq("vec_id"), "left_anti")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/nodes").saveAsTable(s"${dest}_nodes")
    spark.table(s"${src}_edges")
      .join(broadcast(gone.select(col("vec_id").as("src"))),
        Seq("src"), "left_anti")
      .join(broadcast(gone.select(col("vec_id").as("dst"))),
        Seq("dst"), "left_anti")
      .select(col("src"), col("dst"), col("cos_sim"), col("rk"))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/edges").saveAsTable(s"${dest}_edges")
    appendToGraphIndex(spark, dest, vecs)
  }

  /** The graph family's retrain DECISION — [[VectorOps.ivfRetrainCheck]]
    * over the ENTRY CELLS: appends assign through the frozen quantizer,
    * so corpus drift concentrates new nodes in few cells, and entry
    * cost is `entryCells · (sizes of the probed cells)` — a hot cell is
    * both a probe tail AND a seed-quality cliff at the next rebuild.
    * Identical statistics, thresholds, and BIGINT floor arithmetic as
    * the IVF families (frozen assignment ⇒ identical cell populations
    * for the same corpus, so they share one mirror). Near-metadata
    * cost: reads the partition column only, reduces to ONE row. */
  def graphRetrainCheck(spark: SparkSession, table: String,
      maxOverMeanX1000: Long = 2000L, topFracX1000: Long = 200L): DataFrame =
    spark.table(s"${table}_cells")
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_lists"), sum(col("n")).as("total_vectors"),
        max(col("n")).as("max_list"))
      .withColumn("mean_list", expr("total_vectors div n_lists"))
      .withColumn("max_over_mean_x1000", expr("max_list * 1000 div mean_list"))
      .withColumn("top_frac_x1000", expr("max_list * 1000 div total_vectors"))
      .withColumn("retrain",
        col("max_over_mean_x1000") >= maxOverMeanX1000 ||
          col("top_frac_x1000") >= topFracX1000)

  /** Execute the retrain [[graphRetrainCheck]] decides on — a full
    * rebuild over the LIVE corpus read back from the index's own nodes
    * (originals + every appended batch, minus tombstoned ids): fresh
    * quantizer with re-derived K, fresh cells, fresh NN-descent edges —
    * the walk-priced appended edges (seeded from the OLD cells) are
    * replaced by full-quality descent edges under cells that reflect
    * the drifted corpus. Result-defined equal to [[writeGraphIndex]]
    * over the live corpus, which is what makes it oracle-able. Build
    * cost class, triggered exactly when the monitor says the cheap
    * appends have degraded entry cost. */
  def retrainGraphIndex(spark: SparkSession, src: String, dest: String,
      path: String, trainIters: Int = 2): Unit = {
    val corpus =
      if (spark.catalog.tableExists(s"${src}_tombstones"))
        spark.table(s"${src}_nodes").join(
          broadcast(spark.table(s"${src}_tombstones").select(col("vec_id"))),
          Seq("vec_id"), "left_anti")
      else spark.table(s"${src}_nodes")
    writeGraphIndex(corpus.select(col("vec_id"), col("embedding")),
      dest, path, trainIters)
  }

  /** RICH-CLUB coefficient φ(k) over the backbone (Colizza et al.,
    * Nature Physics 2006): for each degree cutoff k, the edge density
    * among the nodes of degree > k — "do the hubs preferentially wire
    * to each other?". φ_ppm = 2·E_k·1e6 div (N_k(N_k−1)); cutoffs with
    * fewer than two qualifying nodes are dropped (undefined density).
    * Degrees are WITHIN-backbone (the graph φ is measured on), not
    * raw-graph. Scale shape: the degree table joins the edge list
    * twice on the node key (the triangle-enumeration layout), then one
    * |ks|-row broadcast fans each edge/node over the cutoff grid — no
    * per-k rescan of the edges. */
  def richClub(spark: SparkSession, sfDir: String,
      ks: Seq[Long]): DataFrame = {
    import spark.implicits._
    val e = backbone(spark, sfDir)
    val deg = symmetric(e).groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val kdf = ks.toDF("k")
    val nk = deg.crossJoin(broadcast(kdf)).filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
    val ek = e.join(deg.as("ds"), col("src") === col("ds.node"))
      .join(deg.as("dd"), col("dst") === col("dd.node"))
      .crossJoin(broadcast(kdf))
      .filter(col("ds.deg") > col("k") && col("dd.deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
    nk.join(ek, Seq("k"), "left").na.fill(0L, Seq("e_k"))
      .filter(col("n_k") >= 2)
      .select(col("k"), col("n_k"), col("e_k"),
        expr("e_k * 2000000 div (n_k * (n_k - 1))").as("phi_ppm"))
      .orderBy(col("k"))
  }

  /** Synchronous BFS from the backbone's minimum part key over the
    * SYMMETRIC edge set: (node, depth) for every node within
    * `maxDepth` hops — the reachability shell a "how far does
    * influence spread" question needs, and the only distance operator
    * in the suite (PPR measures mass, not hops). Each round is one
    * frontier⋈edges shuffle keyed on the node plus an anti-join
    * against the visited set — the Pregel layout; no collect, no
    * driver-side frontier. Rounds are FIXED (not run-to-convergence)
    * so the oracle is a finite CTE chain; unreached nodes are absent
    * rather than ∞-labeled. */
  /** Bounded-horizon HARMONIC centrality probes of the hub set: for
    * the `k` highest-degree nodes (deterministic pick — degree desc,
    * node asc), multi-source BFS to `maxDepth` and
    * H(r) = Σ_{0<d(r,u)≤maxDepth} 1/d(r,u), with 1/d as precomputed
    * ppm literals (1e6, 5e5, 333333, 25e4 — no division at query
    * time, integer-exact sums). Exact harmonic centrality needs
    * all-pairs distances; the bounded-horizon hub probe is the form
    * that survives scale — k·|frontier| work per level, the same
    * level-synchronous shape as [[bfsDepths]] with the root threaded
    * through the visited set — and in practice ranks hubs identically
    * because 1/d contributions past 4 hops are dominated by the
    * near field. */
  def harmonicCentrality(spark: SparkSession, sfDir: String, k: Int,
      maxDepth: Int): DataFrame = {
    require(maxDepth == 4, "the 1/d ppm literal table is built for depth 4")
    val sym = symmetric(backbone(spark, sfDir)).select(col("src"), col("dst"))
    val eb = edgeBytes(spark, backboneDir(spark, sfDir))
    val pin = bfsPinBytes(spark)
    val roots = sym.groupBy(col("src")).agg(count(lit(1)).as("dg"))
      .orderBy(col("dg").desc, col("src")).limit(k)
      .select(col("src").as("root"))
    var visited = broadcast(roots)
      .select(col("root"), col("root").as("node"))
      .withColumn("depth", lit(0L))
    for (d <- 1 to maxDepth) {
      val frontier = visited.filter(col("depth") === (d - 1))
      val expand = frontier.join(sym, col("node") === col("src"))
        .select(col("root"), col("dst").as("node")).distinct()
      val fresh = expand.join(visited.select(col("root"), col("node")),
          Seq("root", "node"), "left_anti")
        .withColumn("depth", lit(d.toLong))
      visited = maybePin(visited.unionAll(fresh), eb, pin)
    }
    visited.filter(col("depth") > 0)
      .withColumn("invd", expr(
        """CASE depth WHEN 1 THEN 1000000 WHEN 2 THEN 500000
          |WHEN 3 THEN 333333 ELSE 250000 END""".stripMargin))
      .groupBy(col("root"))
      .agg(count(lit(1)).as("n_reached"), sum(col("invd")).as("harmonic_ppm"))
      .orderBy(col("root"))
  }

  def bfsDepths(spark: SparkSession, sfDir: String,
      maxDepth: Int): DataFrame = {
    val sym = symmetric(backbone(spark, sfDir))
    val eb = edgeBytes(spark, backboneDir(spark, sfDir))
    val pin = bfsPinBytes(spark)
    val seed = sym.agg(min(col("src")).as("node"))
    var visited = seed.withColumn("depth", lit(0L))
    for (d <- 1 to maxDepth) {
      val frontier = visited.filter(col("depth") === (d - 1))
      val expand = frontier.join(sym, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
      val fresh = expand.join(visited.select(col("node")),
          Seq("node"), "left_anti")
        .withColumn("depth", lit(d.toLong))
      visited = maybePin(visited.unionAll(fresh), eb, pin)
    }
    visited
  }
}
