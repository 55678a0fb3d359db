package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Semantics of [[Dedup.removeDuplicateSpans]] — exact-substring (span-
  * level) dedup: a `gramLen`-token window shared with ANOTHER document
  * is cut everywhere it appears, surrounding text kept. */
class SpanRemovalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: (Long, String)*): Map[Long, (String, Long)] =
    Dedup.removeDuplicateSpans(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text", gramLen = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("a shared window is cut from every host, flanks survive") {
    val shared = "one two three four"
    val got = run(
      1L -> s"alpha $shared omega",
      2L -> s"beta gamma $shared")
    assert(got(1L) == (("alpha omega", 4L)))
    assert(got(2L) == (("beta gamma", 4L)))
  }

  test("overlapping duplicated windows erase the maximal span") {
    // a 6-token run shared between two docs = three overlapping 4-gram
    // windows; the union of their covers is exactly the 6-token span
    val shared = "a b c d e f"
    val got = run(1L -> s"pre $shared", 2L -> s"$shared post")
    assert(got(1L) == (("pre", 6L)))
    assert(got(2L) == (("post", 6L)))
  }

  test("within-document repetition alone is not cross-document") {
    // the same window twice in ONE doc: min(doc)==max(doc), kept whole
    val got = run(1L -> "x y z w x y z w", 2L -> "unrelated text here now")
    assert(got(1L) == (("x y z w x y z w", 0L)))
    assert(got(2L) == (("unrelated text here now", 0L)))
  }

  test("short documents and clean documents pass through byte-identical") {
    val got = run(
      1L -> "too short",
      2L -> "five distinct tokens right here",
      3L -> "wholly different words in this document")
    assert(got == Map(
      1L -> (("too short", 0L)),
      2L -> (("five distinct tokens right here", 0L)),
      3L -> (("wholly different words in this document", 0L))))
  }

  test("a fully shared document empties; n_removed = its token count") {
    val t = "p q r s t u"
    val got = run(1L -> t, 2L -> t)
    assert(got(1L) == (("", 6L)))
    assert(got(2L) == (("", 6L)))
  }

  test("gram-index probe equals the full recompute on the batch docs, " +
      "and the probe never reshuffles the index") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val corpus = Seq(
      (2L, "alpha one two three four omega"),
      (4L, "unrelated corpus text entirely different")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "pre one two three four post"),       // shares a corpus window
      (3L, "w x y z w2 x2"), (5L, "w x y z w2 x2"), // batch-internal pair
      (7L, "nothing shared with anything here"))
      .toDF("doc_id", "text")
    val table = "graft_gram_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val path = java.nio.file.Files.createTempDirectory("gram_spec_").toString
    try {
      Dedup.writeGramIndex(corpus, "doc_id", "text", table, path, gramLen = 4)
      val got = Dedup.probeGramIndex(spark, table, batch, "doc_id", "text",
          gramLen = 4)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val full = Dedup.removeDuplicateSpans(
          corpus.unionByName(batch), "doc_id", "text", gramLen = 4)
        .filter(col("doc_id") % 2 === 1)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == full, s"probe diverged from full recompute: $got vs $full")
      assert(got(7L)._2 == 0L, "the clean doc must pass through untouched")
      assert(got(1L)._2 > 0L && got(3L)._2 > 0L)
      // admitting the batch makes its grams visible to LATER batches
      Dedup.appendToGramIndex(spark, table, batch, "doc_id", "text", gramLen = 4)
      val later = Seq((9L, "now also w x y z w2 x2")).toDF("doc_id", "text")
      val got2 = Dedup.probeGramIndex(spark, table, later, "doc_id", "text",
          gramLen = 4).collect().head
      assert(got2.getLong(2) > 0L, "appended batch grams must clean later batches")
      // plan: the bucketed index scan must not sit under an Exchange
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val probe = Dedup.probeGramIndex(spark, table, batch, "doc_id", "text",
          gramLen = 4)
        def isBucketedScan(p: SparkPlan): Boolean = p match {
          case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
          case _ => false
        }
        // the precise property: between the index's bucketed scan and
        // the FIRST join above it there is no shuffle — exchanges
        // further downstream (the per-doc aggregation) are the batch's
        // own and sit above the scan in the tree without touching it
        def pathTo(p: SparkPlan): Option[List[SparkPlan]] =
          if (isBucketedScan(p)) Some(List(p))
          else p.children.view.flatMap(pathTo).headOption.map(p :: _)
        val path = pathTo(probe.queryExecution.executedPlan)
        assert(path.isDefined, "no bucketed scan on the gram index")
        val belowJoin = path.get.reverse.takeWhile(
          !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
        assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
          "gram index is reshuffled before its join")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
