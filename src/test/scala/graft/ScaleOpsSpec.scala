package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** The two scale patterns: salting must be result-invisible, and the
  * registry lookup must behave like the trigger's early return
  * (unwatched tables dropped) with a broadcast plan. */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedSumCount equals the unsalted aggregation on a skewed key") {
    val df = (0 until 500).map(i => (if (i % 10 == 0) "hot" else s"k${i % 3}", i.toLong))
      .toDF("k", "v")
    val salted = ScaleOps.saltedSumCount(df, Seq("k"), "v",
        saltExpr = col("v"), saltBuckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct, "salting must not change sums or counts")
  }

  test("saltedJoin equals the plain join and spreads a hot key over buckets") {
    // 80% of the big side is one hot key
    val big = (0 until 500).map(i =>
        (if (i % 5 > 0) 1L else (i % 7).toLong + 2, i.toLong))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("sk", "name")
    val salted = ScaleOps.saltedJoin(big, small, "k", "sk",
        saltBuckets = 8, bigSaltSrc = col("row_id"))
      .select("row_id", "name").as[(Long, String)].collect().sorted.toSeq
    val plain = big.join(small, col("k") === col("sk"))
      .select("row_id", "name").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain, "salting must not change the join result")
    // the hot key's rows carry all 8 salt values → 8 independent tasks
    val hotSalts = big.withColumn("_salt", pmod(col("row_id"), lit(8)))
      .filter(col("k") === 1L).select("_salt").distinct().count()
    assert(hotSalts == 8L)
  }

  test("saltedJoin works when both sides share the key column name") {
    // the COMMON equi-join case — the pre-fix unqualified predicate
    // failed analysis as ambiguous here (ADVICE r9 #3)
    val big = (0 until 100).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val out = ScaleOps.saltedJoin(big, small, "k", "k",
      saltBuckets = 4, bigSaltSrc = col("row_id"))
    assert(out.count() == 100L, "every hot-key row matches its dim row once")
    assert(out.select("name").distinct().as[String].collect().toSeq == Seq("hot"))
  }

  test("registryLookup drops unwatched tables and broadcasts the registry") {
    val queue = Seq(("users", 1L), ("users", 2L), ("orders", 3L), ("ghost", 4L))
      .toDF("table_name", "event_id")
    val registry = Seq(("users", "id"), ("orders", "order_id"))
      .toDF("table_name", "key_col")
    val out = ScaleOps.registryLookup(queue, registry)
    val rows = out.collect().map(r =>
      (r.getAs[String]("table_name"), r.getAs[Long]("event_id"), r.getAs[String]("key_col")))
    // unwatched "ghost" dropped (trigger early return); each event enriched
    // with exactly its table's key column (<=1 registry row per table)
    assert(rows.toSet == Set(
      ("users", 1L, "id"), ("users", 2L, "id"), ("orders", 3L, "order_id")))
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "registry side must be broadcast")
  }

  test("zValue interleaves bits exactly (hand-computed morton codes)") {
    val out = Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(ScaleOps.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a fills even bits, b odd bits: (3,5) -> 0b100111 = 39;
    // 16 ones spread to alternating bits = 0x55555555 / 0xAAAAAAAA
    assert(out == Seq(39L, 0L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("blockingResolve links within blocks only, best match per dirty record") {
    val clean = Seq((1L, "aa bb zebra"), (2L, "aa bc zebra"), (3L, "aa bb lion"))
      .toDF("clean_id", "name")
    val dirty = Seq(
        (10L, "aa b zebra"),   // lev 1 to clean 1, lev 2 to clean 2 -> picks 1
        (20L, "aa bb liom"),   // last-token block differs ("liom" != "lion"): no match
        (30L, "zz bb zebra"))  // same last token, different prefix block: no match
      .toDF("dirty_id", "name")
    val out = ScaleOps.blockingResolve(dirty, clean, maxEdit = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1L, 1L)),
      "only the in-block candidate resolves; blocking excludes the rest")
  }
}
