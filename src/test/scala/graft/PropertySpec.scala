package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{CdcOps, Dedup, TextOps}

/** Property-based invariants (SURVEY §5.2): diff(r,r) = ∅, diff emits only
  * changed columns, dedup idempotence/survivor rules, jaccard bounds.
  * Generators are sampled with fixed seeds (deterministic CI) and kept
  * small — each case builds real DataFrames. */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowGen: Gen[(String, Option[String], Option[Long])] = for {
    id <- Gen.identifier.map(_.take(8))
    s <- Gen.option(Gen.alphaStr.map(_.take(12)))
    n <- Gen.option(Gen.chooseNum(-1000L, 1000L))
  } yield (id, s, n)

  test("diff of a table with itself is always empty (no-op suppression invariant)") {
    for (rows <- samples(Gen.listOfN(8, rowGen), 5)) {
      val distinctRows = rows.distinctBy(_._1)
      val df = distinctRows.toDF("id", "s", "n")
      assert(CdcOps.updateDiff(df, df, "id", "id").count() == 0,
        s"non-empty diff for $distinctRows")
    }
  }

  test("diff emits only genuinely changed columns, never the pk") {
    for (rows <- samples(Gen.listOfN(6, rowGen), 5)) {
      val distinctRows = rows.distinctBy(_._1)
      val oldDf = distinctRows.toDF("id", "s", "n")
      val newDf = oldDf.withColumn("n", coalesce(col("n"), lit(0L)) + 7)
      val diff = CdcOps.updateDiff(oldDf, newDf, "id", "id").collect()
      assert(diff.forall(_.getAs[String]("changed_col") == "n"))
      assert(diff.length == distinctRows.size)
    }
  }

  test("exact dedup: survivor is min id, copies sum to corpus size, idempotent") {
    for (contentIds <- samples(Gen.listOfN(10, Gen.chooseNum(0, 3)), 5)) {
      val df = contentIds.zipWithIndex
        .map { case (c, i) => (i.toLong, s"content-$c") }.toDF("doc_id", "text")
      val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
      assert(groups.map(_.getAs[Long]("n_copies")).sum == contentIds.size)
      val byContent = contentIds.zipWithIndex.groupMap(_._1)(_._2.toLong)
      assert(groups.length == byContent.size)
      assert(groups.map(_.getAs[Long]("keep_id")).toSet ==
        byContent.values.map(_.min).toSet)
      // dedup of the deduped survivors is the identity
      val survivors = df.join(
        Dedup.exactGroups(df, "doc_id", "text")
          .select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      val again = Dedup.exactGroups(survivors, "doc_id", "text")
      assert(again.filter(col("n_copies") > 1).count() == 0)
    }
  }

  test("jaccardScore early-exit matches the naive set-Jaccard on random sorted arrays") {
    // the prunes (size-ratio + mid-merge bail) must be lossless: for any
    // pair, the scorer returns Some(round6(j)) iff round6(j) >= t
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted.toArray)
    def naive(a: Array[Long], b: Array[Long]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      val inter = sa.intersect(sb).size
      if (sa.isEmpty && sb.isEmpty) 0.0
      else inter.toDouble / (sa.size + sb.size - inter)
    }
    for {
      t <- Seq(0.0, 0.25, 0.5, 0.8, 1.0)
      pair <- samples(Gen.zip(arrGen, arrGen), 40)
    } {
      val (a, b) = pair
      if (a.nonEmpty && b.nonEmpty) {
        val expectJ = BigDecimal(naive(a, b))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = Dedup.jaccardScore(t)(a, b)
        if (expectJ >= t) assert(got.contains(expectJ),
          s"t=$t a=${a.toList} b=${b.toList}: expected Some($expectJ), got $got")
        else assert(got.isEmpty,
          s"t=$t a=${a.toList} b=${b.toList}: expected None (j=$expectJ), got $got")
      }
    }
  }

  test("containmentScore early-exit matches the naive containment on random sorted arrays") {
    // |A∩B| / min(|A|,|B|): a subset pair must score exactly 1.0 and
    // the mid-merge bail must be lossless at every threshold
    val arrGen = Gen.listOf(Gen.chooseNum(0L, 40L)).map(_.distinct.sorted.toArray)
    def naive(a: Array[Long], b: Array[Long]): Double = {
      val inter = a.toSet.intersect(b.toSet).size
      inter.toDouble / math.min(a.length, b.length)
    }
    for {
      t <- Seq(0.0, 0.25, 0.5, 0.8, 1.0)
      pair <- samples(Gen.zip(arrGen, arrGen), 40)
    } {
      val (a, b) = pair
      if (a.nonEmpty && b.nonEmpty) {
        val expectC = BigDecimal(naive(a, b))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = Dedup.containmentScore(t)(a, b)
        if (expectC >= t) assert(got.contains(expectC),
          s"t=$t a=${a.toList} b=${b.toList}: expected Some($expectC), got $got")
        else assert(got.isEmpty,
          s"t=$t a=${a.toList} b=${b.toList}: expected None (c=$expectC), got $got")
      }
    }
    // the doc-in-doc property Jaccard dilutes: strict subset scores 1.0
    val whole = (0L to 30L).toArray
    val part = Array(3L, 7L, 11L)
    assert(Dedup.containmentScore(0.9)(part, whole).contains(1.0))
    assert(Dedup.jaccardScore(0.9)(part, whole).isEmpty,
      "Jaccard must NOT fire on the embedded-subset pair containment catches")
  }

  test("slidingAgg with slide == length degenerates to tumblingAgg") {
    import graft.operators.EventOps
    val events = (0 until 200).map { i =>
      (1000000L * (i * 37 % 3600), if (i % 2 == 0) "view" else "click", (i % 7).toDouble)
    }.toDF("ts_us", "event_type", "value")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1)) -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
    val sliding = EventOps.slidingAgg(events, 600, 600).collect().map(key).toMap
    val tumbling = EventOps.tumblingAgg(events, 600).collect().map(key).toMap
    assert(sliding == tumbling, "k = len/slide = 1 must be exactly tumbling")
  }

  test("bm25: conjunctive ⊆ disjunctive with identical scores; scores positive") {
    import graft.operators.SearchOps
    val docGen = Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta", "pad"))
    for ((docLists, i) <- samples(Gen.listOfN(5, docGen), 4).zipWithIndex) {
      val docs = docLists.zipWithIndex
        .map { case (ts, j) => (j.toLong, ts.mkString(" ")) }.toDF("doc_id", "text")
      val table = s"graft_bm25_prop_${i}_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val path = java.nio.file.Files.createTempDirectory("graft_bm25_prop_").toString
      val dlPath = java.nio.file.Files.createTempDirectory("graft_bm25_prop_dl_").toString
      try {
        SearchOps.writeSearchIndex(docs, "doc_id", "text", table, path, numBuckets = 4)
        SearchOps.writeDocLengths(spark, table, dlPath)
        val terms = Seq("alpha", "beta")
        def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
          df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val conj = scores(SearchOps.searchBm25(spark, table, terms, 10))
        val disj = scores(SearchOps.searchBm25Any(spark, table, terms, 10))
        // the conjunctive result is exactly the disjunctive one cut to
        // all-terms docs — same shared scorer, same scaled-int scores
        assert(conj.keySet.subsetOf(disj.keySet),
          s"conjunctive hits outside the disjunctive set: $conj vs $disj")
        conj.foreach { case (id, s) =>
          assert(disj(id) == s, s"scorer drift on doc $id: $s vs ${disj(id)}")
        }
        assert(disj.values.forall(_ > 0L), s"non-positive bm25 score: $disj")
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS ${table}_doclens")
        spark.sql(s"DROP TABLE IF EXISTS $table")
      }
    }
  }

  test("jaccard is 1 on self, within [0,1], symmetric") {
    val tokenList = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))
    for (lists <- samples(Gen.listOfN(2, tokenList), 5)) {
      val Seq(x, y) = lists.map(_.mkString(" "))
      val r = Seq((x, y)).toDF("x", "y")
        .withColumn("tx", TextOps.shingles(TextOps.tokens(col("x"))))
        .withColumn("ty", TextOps.shingles(TextOps.tokens(col("y"))))
        .select(
          TextOps.jaccard(col("tx"), col("tx")).as("self"),
          TextOps.jaccard(col("tx"), col("ty")).as("xy"),
          TextOps.jaccard(col("ty"), col("tx")).as("yx"))
        .collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
      assert(r.getDouble(1) == r.getDouble(2))
    }
  }
}
