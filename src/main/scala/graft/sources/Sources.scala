package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source abstraction: the engine's operators are source-agnostic
  * DataFrame transforms; this module is the single place formats are
  * bound. The reference reads only a Postgres queue table
  * (`eventqueue/event_queue.go:59-66`); an analytics engine needs the
  * common lake formats too.
  *
  * Scale notes: parquet/orc get predicate pushdown + column pruning +
  * partition pruning for free; csv/json are schema-on-read (always pass
  * an explicit schema at scale — schema inference reads the data twice);
  * jdbc should always be used with partitionColumn bounds so the read
  * parallelizes.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: String,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def jsonLines(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Whole-file binary source — Spark's built-in `binaryFile` format:
    * one row per file `(path, modificationTime, length, content)`, the
    * ingestion shape for image/audio/video directories feeding the
    * multimodal operators ([[graft.operators.Multimodal]] consumes the
    * same opaque-bytes column). `pathGlobFilter` prunes at LISTING time
    * — filtered files are never opened — which is why it beats a
    * post-read filter on `path`; cap file size via
    * `spark.sql.sources.binaryFile.maxLength` when directories may
    * carry outliers. */
  def binaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Partitioned JDBC read — the queue-table read of the reference, made
    * parallel: `numPartitions` concurrent range scans on `partitionCol`.
    * (Untestable in this container — no database — but this is the
    * complete option surface the drain scan needs.) */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .load()
}
