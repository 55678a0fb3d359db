package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Exact all-pairs-within-bucket enumeration with **bounded per-task
  * memory** — the 100 TB-safe core shared by [[Dedup.jaccardPairsWithinBucket]]
  * and [[VectorOps.cosineNearDupPairs]].
  *
  * Problem (VERDICT r1 #1): pairing a bucket in memory
  * (`flatMapGroups` + `toArray`) is unbounded — bucket size is set by data
  * skew, so one hot bucket OOMs one executor. Fix: classic distributed
  * triangle enumeration. Each bucket of size `sz` is hash-split into
  * `S = ceil(sz / cap)` salt groups; a doc in group `g` is replicated to
  * the `S` tasks `{(min(i,g), max(i,g)) : i < S}`. Task `(i, i)` pairs
  * within group `i`; task `(i, j), i<j` pairs group `i` × group `j` only.
  * Every unordered pair is produced by exactly one task, and a task holds
  * at most two salt groups (~`2·cap` docs in expectation — the bound is
  * hash-uniform, not adversarial-exact, the standard salting guarantee).
  * Replication factor is `S` per doc — linear in bucket size, while the
  * pairwise work is inherently quadratic, so the shuffle overhead is
  * asymptotically free.
  *
  * Buckets at or under `cap` get `S = 1` → a single `(0,0)` task,
  * identical to the unsalted formulation (no regression on the common
  * path). Bucket sizes come from a window count in the same pass that
  * co-locates the bucket (see [[saltAssignments]]); a hot bucket's
  * window buffer spills to disk, so even the sizing step never holds a
  * bucket in memory.
  */
object BoundedPairs {

  /** Salt-group + task-replica assignment. Input columns: `bucket`
    * (string), `doc_id` (long), `payload` (any). Output: (bucket, ti, tj,
    * g, doc_id, payload), one row per (doc, task) replica. */
  private[graft] def saltAssignments(rows: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    // Bucket size via a window count, NOT a groupBy+join: the join form
    // executes the (CPU-heavy) upstream lineage twice — once to count,
    // once to carry the payload. The window computes the count in the
    // same single pass/shuffle that co-locates the bucket; a hot bucket's
    // window buffer spills to disk (ExternalAppendOnlyUnsafeRowArray), so
    // per-task MEMORY stays bounded even before the salting kicks in.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
    rows
      .withColumn("bsz", count(lit(1)).over(w))
      // singleton buckets can never form a pair — drop them before any
      // replication (for LSH front-ends most docs are unique, so this
      // eliminates the bulk of the groups)
      .filter(col("bsz") >= 2)
      .withColumn("n_salt",
        greatest(lit(1L), ceil(col("bsz").cast("double") / cap)).cast("int"))
      .withColumn("g", pmod(xxhash64(col("doc_id")), col("n_salt")).cast("int"))
      // task list for group g: {(min(i,g), max(i,g)) : i < S} — enumerates
      // every task containing g exactly once, no empty-sequence edge cases
      .withColumn("task", explode(transform(
        sequence(lit(0), col("n_salt") - 1),
        i => struct(least(i, col("g")).cast("int").as("ti"),
          greatest(i, col("g")).cast("int").as("tj")))))
      .select(col("bucket"), col("task.ti").as("ti"), col("task.tj").as("tj"),
        col("g"), col("doc_id"), col("payload"))
  }

  /** Pair + score the task groups. `score` must be symmetric; it returns
    * Some(rounded score) only for surviving pairs, so only survivors ever
    * become rows. Output: (id_a, id_b, score) with id_a < id_b. */
  private[graft] def scoredPairs[T](
      assigned: Dataset[(String, Int, Int, Int, Long, T)],
      score: (T, T) => Option[Double]): Dataset[(Long, Long, Double)] = {
    implicit val keyEnc: Encoder[(String, Int, Int)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaInt)
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    assigned.groupByKey(r => (r._1, r._2, r._3))
      .flatMapGroups { (key: (String, Int, Int),
          it: Iterator[(String, Int, Int, Int, Long, T)]) =>
        val (_, ti, tj) = key
        val out = Seq.newBuilder[(Long, Long, Double)]
        if (ti == tj) {
          // one salt group: all pairs within it (≤ ~cap docs in memory)
          val docs = it.map(r => (r._5, r._6)).toArray.sortBy(_._1)
          var i = 0
          while (i < docs.length) {
            var j = i + 1
            while (j < docs.length) {
              score(docs(i)._2, docs(j)._2)
                .foreach(s => out += ((docs(i)._1, docs(j)._1, s)))
              j += 1
            }
            i += 1
          }
        } else {
          // two salt groups: cross pairs only (within-group pairs belong
          // to the (g, g) task) — ≤ ~2·cap docs in memory
          val left = scala.collection.mutable.ArrayBuffer.empty[(Long, T)]
          val right = scala.collection.mutable.ArrayBuffer.empty[(Long, T)]
          it.foreach { r =>
            if (r._4 == ti) left += ((r._5, r._6)) else right += ((r._5, r._6))
          }
          left.foreach { case (ia, a) =>
            right.foreach { case (ib, b) =>
              score(a, b).foreach { s =>
                out += ((math.min(ia, ib), math.max(ia, ib), s))
              }
            }
          }
        }
        out.result().iterator
      }
  }

  /** Spark SQL `round(x, 6)` quantization (BigDecimal HALF_UP) — shared by
    * the scorers so JVM-side scores hash-match column-expression scores. */
  private[graft] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
