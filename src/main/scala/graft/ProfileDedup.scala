package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{BoundedPairs, Dedup, TextOps}

/** Builder-side dev tool (like [[VerifySome]]): stage-level timing of the
  * dedup pair pipeline, so tuning targets the measured bottleneck — prep
  * (shingle sketch CPU), bucket/salt shuffle, or in-task pair scoring.
  * Each stage is timed with 3 repeats; report the MIN (the container's
  * timing noise is one-sided).
  *
  * Usage: runMain graft.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def best(label: String)(body: => Long): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (s, n) = secs.minBy(_._1)
      println(f"[profile] $label%-28s min=${s}%7.3f s  (all=${secs.map(x => f"${x._1}%.2f").mkString(",")})  rows=$n")
    }

    val base = Tables.documents(spark, sfDir)
    // same corpus as the gated queries (TextQueries.dupCorpus)
    val near = base.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(lit("xdup "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val exact = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val docs = base.select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .unionAll(near).unionAll(exact)
    val prepParallelism = spark.sparkContext.defaultParallelism

    // --- prep decomposition: where inside prep does the time go? ---
    val toks = TextOps.tokens(col("text"))
    best("floor: docs.count")(docs.count())
    best("floor: +repartition")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id")).count())
    best("prep: tokens only")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id"))
        .select(col("doc_id"), size(toks).as("n")).agg(sum(col("n"))).count())
    best("prep: +shingles (size only)")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id"))
        .select(col("doc_id"), size(TextOps.shingles(toks)).as("n"))
        .agg(sum(col("n"))).count())
    // force full shingle-STRING materialization (sum of all lengths)
    best("prep: +shingles (forced)")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id"))
        .select(col("doc_id"), aggregate(TextOps.shingles(toks), lit(0L),
          (a, x) => a + length(x)).as("n"))
        .agg(sum(col("n"))).count())
    def sh = docs.select(col("doc_id"), col("text"))
      .repartition(prepParallelism, col("doc_id"))
      .select(col("doc_id"), TextOps.shingles(toks).as("shingles"))
      .withColumn("sk", graft.functions.GraftFunctions.shingleSketch(col("shingles")))
      .select(col("doc_id"), col("sk.ds").as("ds"), col("sk.mh").as("mh"))
    best("mh: prep (sketch)")(sh.count())

    val rowsPerBand = 2
    val bkeys = array((0 until 4).map { b =>
      concat_ws("|", (0 until rowsPerBand).map(r => col("mh")(b * rowsPerBand + r)): _*)
    }: _*)
    def bucketRows = sh.select(col("doc_id"), col("ds"), posexplode(bkeys)
        .as(Seq("band", "bkey")), bkeys.as("all_bkeys"))
      .filter(col("bkey") =!= "")
      .select(concat_ws("#", col("band"), col("bkey")).as("bucket"),
        col("doc_id"),
        struct(col("band"), col("all_bkeys"), col("ds")).as("payload"))
    // diagnosis: does the sketch projection stay in codegen, and is the
    // HOF shingle chain being re-evaluated per output field?
    println("==== sh plan ====")
    println(sh.queryExecution.executedPlan.toString.take(4000))
    best("mh: sketch, no filter")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id"))
        .select(col("doc_id"), TextOps.shingles(toks).as("shingles"))
        .withColumn("sk", graft.functions.GraftFunctions.shingleSketch(col("shingles")))
        .select(col("doc_id"), col("sk.ds").as("ds"), col("sk.mh").as("mh"))
        .count())
    best("mh: sketch, no ds/mh split")(
      docs.select(col("doc_id"), col("text"))
        .repartition(prepParallelism, col("doc_id"))
        .select(col("doc_id"), TextOps.shingles(toks).as("shingles"))
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.shingleSketch(col("shingles")).as("sk"))
        .count())
    best("mh: +bucket rows")(bucketRows.count())
    best("mh: +salt assignments")(
      BoundedPairs.saltAssignments(bucketRows, 8192).count())
    best("mh: full pairs")(
      Dedup.minhashPairs(docs, "doc_id", "text").count())

    // --- jaccard-in-bucket stages (mirrors jaccardPairsWithinBucket) ---
    def shj = docs
      .select(col("source").cast("string").as("bucket"),
        col("doc_id").cast("long").as("doc_id"), col("text").as("_text"))
      .repartition(prepParallelism, col("doc_id"))
      .select(col("bucket"), col("doc_id"),
        graft.functions.GraftFunctions.shingleSet(
          TextOps.shingles(TextOps.tokens(col("_text")))).as("payload"))
    best("jac: prep (set)")(shj.count())
    best("jac: +salt assignments")(
      BoundedPairs.saltAssignments(shj, 8192).filter(size(col("payload")) > 0).count())
    best("jac: full pairs")(
      Dedup.jaccardPairsWithinBucket(docs, "doc_id", "text", "source", 0.5).count())

    spark.stop()
  }
}
