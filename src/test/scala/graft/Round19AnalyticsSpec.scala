package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the r19 analytics wave (HITS, Kaplan-Meier,
  * chi-squared, Poisson bootstrap, PMI collocations, completeness) —
  * the hash gate proves Spark ≡ DuckDB; these prove the SEMANTICS
  * (monotone survival, L1-normalized scores, non-negative statistics,
  * support cuts) on the sf0.001 fixture. */
class Round19AnalyticsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("kaplan-meier curve is a monotone step function over shrinking risk sets") {
    val rows = EventQueries.queries("events_survival_km")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Long]("s_ppm"))
    val n = rows.map(_.getAs[Long]("n_risk"))
    assert(s.zip(s.tail).forall { case (a, b) => b <= a },
      "survival must be non-increasing")
    assert(n.zip(n.tail).forall { case (a, b) => b <= a },
      "risk sets must shrink with t")
    assert(s.forall(v => v >= 0 && v <= 1000000))
    // every user is accounted for: first risk set = all users
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(n.head == users)
  }

  test("hits scores are an L1-normalized ppm distribution on each side") {
    val all = operators.GraphOps.hits(spark, sfDir, iters = 2).collect()
    assert(all.nonEmpty)
    for (c <- Seq("auth_ppm", "hub_ppm")) {
      val v = all.map(_.getAs[Long](c))
      assert(v.forall(x => x >= 0 && x <= 1000000))
      // truncating div loses < 1 ppm per node
      assert(v.sum <= 1000000 && v.sum >= 1000000 - v.length,
        s"$c L1 mass ${v.sum} outside the truncation band")
    }
  }

  test("chi-squared statistic is non-negative with the categorical dof") {
    val r = EventQueries.queries("stats_chi2_independence")(spark, sfDir)
      .collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("chi2_ppm") >= 0)
    assert(r(0).getAs[Long]("dof") > 0)
  }

  test("poisson-bootstrap CI brackets and orders correctly") {
    val rows = EventQueries.queries("stats_bootstrap_ci")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
    }
  }

  test("pmi collocations respect the support cut and rank by lift") {
    val rows = TextQueries.queries("text_pmi_collocations")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("c_xy") >= 20))
    val lift = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lift.zip(lift.tail).forall { case (a, b) => b <= a })
  }

  test("holt forecast extrapolates the final level linearly in the trend") {
    val rows = EventQueries.queries("events_forecast_holt")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Long]("level_cents"); val b = r.getAs[Long]("trend_cents")
      assert(r.getAs[Long]("f1_cents") == l + b)
      assert(r.getAs[Long]("f3_cents") == l + 3 * b)
      assert(r.getAs[Long]("n_days") > 1)
    }
  }

  test("theil-sen median rank sits at the lower median of the pair count") {
    val rows = EventQueries.queries("stats_theil_sen")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pairs")
      assert(np >= 1)
    }
  }

  test("textrank keywords exclude stopwords and rank by centrality") {
    val rows = TextQueries.queries("text_textrank_keywords")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val stop = operators.TextOps.stopwords("en").toSet
    assert(rows.forall(r => !stop(r.getAs[String]("token"))))
    val rk = rows.map(_.getAs[Long]("rank_ppb"))
    assert(rk.zip(rk.tail).forall { case (a, b) => b <= a })
  }

  test("edge embeddedness is a ppm jaccard bounded by the smaller neighborhood") {
    val rows = GraphQueries.queries("graph_edge_embeddedness")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_common")
      val da = r.getAs[Long]("da"); val db = r.getAs[Long]("db")
      assert(c <= math.min(da, db) - 1,
        "common neighbors can't exceed either endpoint's other-neighbor count")
      val p = r.getAs[Long]("embed_ppm")
      assert(p >= 0 && p <= 1000000)
    }
  }

  test("streaming holt equals batch when days split across micro-batches") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("holt_waves_").toString
    val e = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // split the (day-grid-bounded) day set into three time-ordered waves
    val days = e.select(expr("ts div 86400000000000").as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getLong(0)).toSeq
    assert(days.length >= 3, "fixture must span at least 3 days")
    days.grouped(math.max(1, (days.length + 2) / 3)).zipWithIndex
      .foreach { case (ds, i) =>
        val tmp = Files.createTempDirectory("holt_part_").toString
        e.filter(expr("ts div 86400000000000").isin(ds: _*))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, Paths.get(dir, s"w$i.parquet"))
        Thread.sleep(20)
      }
    val st = graft.streaming.CdcStream.readEventStream(spark, dir,
      maxFilesPerTrigger = 1)
    val q = graft.streaming.HoltStream.levels(st).toDF()
      .writeStream.format("memory").queryName("holt_waves_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = StreamingQueries.holtFinish(spark.table("holt_waves_out"))
      .collect().map(_.toString).toSeq
    val want = EventQueries.queries("events_forecast_holt")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == want, "multi-batch stream drifted from the batch fold")
  }

  test("space-saving sketch bounds overestimates and keeps heavy hitters under eviction") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val sparkS = spark; import sparkS.implicits._
    val dir = Files.createTempDirectory("ss_waves_").toString
    def write(name: String, rows: Seq[(String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("ss_part_").toString
      rows.toDF("event_type", "user_id").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(dir, name)); Thread.sleep(20)
    }
    val w1 = Seq.fill(6)(("click", 1L)) ++ Seq.fill(4)(("click", 2L)) ++
      Seq.fill(3)(("click", 3L))
    val w2 = Seq.fill(4)(("click", 1L)) ++
      Seq(("click", 4L), ("click", 5L), ("click", 6L)) ++
      Seq.fill(3)(("click", 2L))
    write("w1.parquet", w1); write("w2.parquet", w2)
    val st = graft.streaming.CdcStream.readEventStream(spark, dir,
      maxFilesPerTrigger = 1)
    val q = graft.streaming.SpaceSavingStream.heavyHitters(st, k = 3).toDF()
      .writeStream.format("memory").queryName("ss_hh_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("ss_hh_out")
    val lastSeq = out.agg(max(col("seq"))).collect()(0).getLong(0)
    val fin = out.filter(col("seq") === lastSeq)
      .select("user", "n", "err").as[(Long, Long, Long)].collect()
    assert(fin.length <= 3, "counter table must stay within k")
    val truth = (w1 ++ w2).groupBy(_._2)
      .map { case (u, xs) => u -> xs.length.toLong }
    fin.foreach { case (u, n, err) =>
      val t = truth.getOrElse(u, 0L)
      assert(t <= n && n - err <= t,
        s"user $u: n=$n err=$err must bracket true=$t")
    }
    // the dominant item (true 10 > N/k = 23/3) can never be evicted
    assert(fin.exists(_._1 == 1L), "true heavy hitter was evicted")
  }

  test("completeness audit catches the simulated dirty rows only") {
    val rows = RelationalQueries.queries("dq_completeness_audit")(
        spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_null"), r.getAs[Long]("n_blank"))).toMap
    assert(rows("documents.text") == ((0L, 0L)))
    assert(rows("documents_dirty.text")._1 == 1L)
    assert(rows("documents_dirty.lang")._2 == 1L)
  }
}
