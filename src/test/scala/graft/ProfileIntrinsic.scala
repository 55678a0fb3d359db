package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Builder-side dev tool: isolate where sim_intrinsic_dim's 41 s warm
  * goes — the BNLJ pair fold, the single-partition stream side, or the
  * window. Usage: Test/runMain graft.ProfileIntrinsic [sfDir]
  */
object ProfileIntrinsic {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prof] $label pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }

    val qBig = Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("""transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))""").as("qe"))
      .select(col("vec_id"), col("qe"),
        expr("""aggregate(qe, CAST(0 AS BIGINT),
          (a, v) -> a + v * v)""").as("nsq"))
    val pairsBig = qBig.as("a").join(qBig.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        (col("a.nsq") + col("b.nsq") - lit(2) *
          expr("""aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y),
            CAST(0 AS BIGINT), (acc, v) -> acc + v)""")).as("dsq"))

    time("pairs-fold-only (sum dsq)") {
      pairsBig.agg(sum("dsq")).count()
    }
    time("full current (window)") {
      val rk = pairsBig.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dsq"), col("nid"))))
        .filter(col("rk") <= 2)
      rk.groupBy("qid").agg(max(when(col("rk") === 1, col("dsq"))).as("d1"),
        max(when(col("rk") === 2, col("dsq"))).as("d2")).count()
    }
    val qRep = qBig.repartition(spark.sparkContext.defaultParallelism)
    val pairsRep = qRep.as("a").join(qBig.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        (col("a.nsq") + col("b.nsq") - lit(2) *
          expr("""aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y),
            CAST(0 AS BIGINT), (acc, v) -> acc + v)""")).as("dsq"))
    time("repartitioned stream + window") {
      val rk = pairsRep.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dsq"), col("nid"))))
        .filter(col("rk") <= 2)
      rk.groupBy("qid").agg(max(when(col("rk") === 1, col("dsq"))).as("d1"),
        max(when(col("rk") === 2, col("dsq"))).as("d2")).count()
    }

    val qInt = Tables.embeddings(spark, dir).select(col("vec_id"),
      expr("""transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS INT))""").as("qe"))
      .select(col("vec_id"), col("qe"),
        expr("graft_dot_i(qe, qe)").as("nsq"))
    val qIntRep = qInt.repartition(spark.sparkContext.defaultParallelism)
    val pairsInt = qIntRep.as("a").join(qInt.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"),
        (col("a.nsq") + col("b.nsq") - lit(2) *
          expr("graft_dot_i(a.qe, b.qe)")).as("dsq"))
    time("native dot + repart + window") {
      val rk = pairsInt.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dsq"), col("nid"))))
        .filter(col("rk") <= 2)
      rk.groupBy("qid").agg(max(when(col("rk") === 1, col("dsq"))).as("d1"),
        max(when(col("rk") === 2, col("dsq"))).as("d2")).count()
    }
    time("native dot + repart, fold only") {
      pairsInt.agg(sum("dsq")).count()
    }
    spark.stop()
  }
}
