package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-pattern operators: skew-defeating salted aggregation and the
  * broadcast registry lookup join (the reference's only join,
  * `sql/triggers.sql:10-12` — registry row per table, unique by
  * table_name, `sql/migrations.sql:27-28`). */
object ScaleOps {

  /** Two-phase salted aggregation: when the grouping key is heavily
    * skewed (few distinct values, e.g. a status flag over 100 TB), a
    * direct groupBy routes each hot key to one reducer. Salting splits
    * every key into `saltBuckets` sub-groups aggregated in parallel, then
    * merges the partials — the sum/count result is identical (integral
    * values keep double addition associative-exact).
    *
    * `saltExpr` must be deterministic (e.g. pmod of another column) so
    * results are reproducible run-to-run.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltExpr: Column, saltBuckets: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(saltExpr, lit(saltBuckets)))
      .groupBy((keyCols.map(col) :+ col("_salt")).toIndexedSeq: _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).cast("long").as("n_rows"))
  }

  /** Salted equi-join for skewed keys: when one join key carries a large
    * share of the big side (a hot user, a null-ish default), a plain
    * shuffle join routes that key's entire volume to one task. Salting
    * splits every big-side key into `saltBuckets` sub-keys via a
    * deterministic row-level expression, and replicates the SMALL side
    * once per bucket — the join result is identical, the hot key now
    * spreads over `saltBuckets` tasks, and the cost is a bounded
    * small-side blowup (dim × buckets). The manual form of what AQE's
    * skew-join mitigation does adaptively — needed when the skew is
    * known ahead of time or AQE's thresholds won't trigger (e.g. the
    * skew is in a single huge partition AQE can't split because the key
    * is one value).
    *
    * `bigSaltSrc` must be deterministic and row-varying on the big side
    * (an id column, not rand()) so results are reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int, bigSaltSrc: Column): DataFrame = {
    val b = big.withColumn("_salt", pmod(bigSaltSrc, lit(saltBuckets)).cast("int"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // key columns qualified through the salted frames: an unqualified
    // col(bigKey) === col(smallKey) fails analysis as ambiguous whenever
    // the two sides share the key name — the COMMON equi-join case
    // (ADVICE r9 #3)
    b.join(s, b("_salt") === s("_salt") && b(bigKey) === s(smallKey))
      .drop(b("_salt")).drop(s("_salt"))
  }

  /** Broadcast registry lookup: enrich a change stream with its watched
    * key column, guaranteed ≤1 registry row per table (the reference's
    * unique index). Inner join drops unwatched tables, exactly like the
    * trigger's early return. */
  def registryLookup(queue: DataFrame, registry: DataFrame,
      tableCol: String = "table_name"): DataFrame =
    queue.join(broadcast(registry), Seq(tableCol), "inner")

  /** Z-order (morton) value interleaving two 16-bit dimensions — the
    * multi-dimensional clustering key behind data-skipping layouts
    * (Delta/Iceberg OPTIMIZE ZORDER): rows sorted by z land near rows
    * close in BOTH dimensions, so per-file min/max ranges stay narrow
    * on each dimension and a predicate on either one prunes files. */
  def zValue(a: Column, b: Column): Column = {
    // fail LOUDLY outside the 16-bit domain (ADVICE r15, the
    // packSignBits pattern): silently masking to 16 bits would alias
    // keys modulo 65536 above ~sf0.3 and the clustering would degrade
    // with no error — callers must range-normalize first
    def checked(c: Column): Column =
      when(c >= 0L && c <= 0xFFFFL, c).otherwise(raise_error(concat(
        lit("zValue: dimension out of 16-bit range: "), c.cast("string")))
        .cast("long"))
    def spread(c0: Column): Column = {
      val c = checked(c0)
      var x = c.bitwiseAND(lit(0xFFFFL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
      x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
      x
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Entity resolution by token blocking + edit-distance verification —
    * the classic record-linkage shape, never all-pairs.
    *
    * Both sides must carry a `name` string column plus their id
    * (`dirty_id` / `clean_id`). Candidates are generated only inside a
    * block (shared last name-token), pre-pruned by a length band (an
    * edit distance ≤ maxEdit implies |len(a)−len(b)| ≤ maxEdit — a
    * free, lossless filter before the quadratic-cost levenshtein), then
    * verified with codegen'd `levenshtein` and resolved to the best
    * match per dirty record (min distance, id tie-break).
    *
    * At 100 TB the cost is Σ_blocks |dirty_b|·|clean_b| — governed by
    * the blocking key's selectivity, not the corpus square; the join
    * shuffles on the block key, so hot blocks can be salted with the
    * same [[BoundedPairs]] machinery the dedup family uses if a key
    * degenerates. */
  def blockingResolve(dirty: DataFrame, clean: DataFrame,
      maxEdit: Int): DataFrame = {
    // composite blocking key (standard multi-key practice): last
    // name-token × 2-char prefix — each alone leaves ~200-row blocks,
    // together they cut candidate pairs ~100× before the quadratic
    // levenshtein (5.5 s → sub-second at sf0.1)
    val blockKey = concat_ws("|",
      element_at(split(col("name"), " "), -1), substring(col("name"), 1, 2))
    val d = dirty.withColumn("bk", blockKey)
    val c = clean.withColumn("bk", blockKey)
    val cand = d.as("d").join(c.as("c"), Seq("bk"))
      .filter(abs(length(col("d.name")) - length(col("c.name"))) <= maxEdit)
      .withColumn("lev", levenshtein(col("d.name"), col("c.name")))
      .filter(col("lev") <= maxEdit)
    val best = Window.partitionBy(col("dirty_id"))
      .orderBy(col("lev"), col("clean_id"))
    cand.withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("dirty_id"), col("clean_id"), col("lev").cast("long").as("lev"))
  }

  /** [[blockingResolve]] with the Jaro-Winkler scorer (the codegen'd
    * [[graft.functions.JaroWinklerSim]]) instead of edit distance —
    * the swap entity resolution makes when transpositions and
    * prefix-preserving typos shouldn't count as full edits. Same
    * composite blocking, best match = highest round(jw, 6) above
    * `minSim`, clean_id tie-break. */
  def blockingResolveJw(dirty: DataFrame, clean: DataFrame,
      minSim: Double): DataFrame = {
    val blockKey = concat_ws("|",
      element_at(split(col("name"), " "), -1), substring(col("name"), 1, 2))
    val d = dirty.withColumn("bk", blockKey)
    val c = clean.withColumn("bk", blockKey)
    val cand = d.as("d").join(c.as("c"), Seq("bk"))
      .withColumn("jw", round(
        graft.functions.GraftFunctions.jaroWinkler(
          col("d.name"), col("c.name")), 6))
      .filter(col("jw") >= minSim)
    val best = Window.partitionBy(col("dirty_id"))
      .orderBy(col("jw").desc, col("clean_id"))
    cand.withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("dirty_id"), col("clean_id"), col("jw"))
  }
}
