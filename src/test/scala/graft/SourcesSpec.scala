package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Round-trip the non-parquet sources (csv/json/orc) and prove the CDC
  * transforms are source-agnostic. */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val rows = Seq((1L, "alice", 10.5), (2L, "bob", -3.25), (3L, null, 0.0))

  test("csv round-trip with explicit schema") {
    val dir = tmp("csv_src")
    rows.toDF("id", "name", "bal").write.mode("overwrite")
      .option("header", "true").csv(dir)
    val back = Sources.csv(spark, dir, "id LONG, name STRING, bal DOUBLE")
    assert(back.count() == 3)
    assert(back.schema.map(_.dataType.typeName) == Seq("long", "string", "double"))
    assert(back.filter(col("name").isNull).count() == 1)
  }

  test("json-lines round-trip with explicit schema") {
    val dir = tmp("json_src")
    rows.toDF("id", "name", "bal").write.mode("overwrite").json(dir)
    val back = Sources.jsonLines(spark, dir, "id LONG, name STRING, bal DOUBLE")
    assert(back.count() == 3)
    assert(back.agg(sum("bal")).collect().head.getDouble(0) == 7.25)
  }

  test("orc round-trip") {
    val dir = tmp("orc_src")
    rows.toDF("id", "name", "bal").write.mode("overwrite").orc(dir)
    assert(Sources.orc(spark, dir).count() == 3)
  }

  test("binaryFile source reads whole files; glob prunes at listing time") {
    val dir = tmp("bin_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.bin"),
      "payload-a".getBytes("US-ASCII"))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.txt"),
      "not-matched".getBytes("US-ASCII"))
    val got = Sources.binaryFiles(spark, dir, "*.bin")
      .select("path", "length", "content").collect()
    assert(got.length == 1, "the glob must exclude the .txt file")
    assert(got.head.getLong(1) == 9L)
    assert(new String(got.head.getAs[Array[Byte]](2), "US-ASCII") == "payload-a")
  }

  test("CDC snapshot is source-agnostic (same events from csv as from parquet)") {
    val csvDir = tmp("csv_cdc"); val pqDir = tmp("pq_cdc")
    val df = rows.toDF("id", "name", "bal")
    df.write.mode("overwrite").option("header", "true").csv(csvDir)
    df.write.mode("overwrite").parquet(pqDir)
    val fromCsv = graft.operators.CdcOps.snapshot(
      Sources.csv(spark, csvDir, "id LONG, name STRING, bal DOUBLE"), "t", "id")
    val fromPq = graft.operators.CdcOps.snapshot(
      Sources.parquet(spark, pqDir), "t", "id")
    assert(fromCsv.orderBy("external_id").collect().toSeq ==
      fromPq.orderBy("external_id").collect().toSeq)
  }
}
