package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CdcOps

/** Oracle-gated queries for the faithful CDC surface (SURVEY §2.1 O2-O10).
  *
  * Old-vs-new fixtures are derived deterministically from the `orders`
  * table with engine-portable mutations (multiplication by 2 is exact in
  * IEEE754, string constants are trivially portable), so Spark and the
  * DuckDB oracle compute identical values.
  */
object CdcQueries {

  /** Deterministic "updated" copy of orders: every 7th order doubles its
    * total price, every 11th flips status to 'X'; everything else is an
    * update that changed nothing (exercises O5 no-op suppression). */
  private def mutatedOrders(orders: DataFrame): DataFrame =
    orders
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))

  private val mutatedOrdersSql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders""".stripMargin

  /** Queue analog for O7/O8/O9: the `events` table shaped into the
    * outbound_event_queue envelope (id, external_id, statement, data,
    * created_at, processed) with a deterministic processed flag. */
  private def eventQueue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id").as("id"),
      col("user_id").cast("string").as("external_id"),
      lit("events").as("table_name"),
      upper(col("event_type")).as("statement"),
      col("props").as("data"),
      expr("ts div 1000").as("created_at_us"),
      (col("event_id") % 5 === 0).as("processed"))

  private val eventQueueSql =
    """SELECT event_id AS id, CAST(user_id AS VARCHAR) AS external_id,
      |  'events' AS table_name, upper(event_type) AS statement,
      |  props AS data, epoch_us(ts) AS created_at_us, (event_id % 5 = 0) AS processed
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O2 snapshot scan: full-table → SNAPSHOT envelope rows
    "cdc_snapshot" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      CdcOps.snapshot(c, "customer", "c_custkey")
        .orderBy(col("external_id").cast("long"))
    }),
    // O3 insert capture: full-row JSON payload
    "cdc_insert_payload" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      CdcOps.insertEvents(p, "part", "p_partkey")
        .orderBy(col("external_id").cast("long"))
    }),
    // O4+O5 update diff (relational form) with no-op suppression
    "cdc_update_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      CdcOps.updateDiff(o, mutatedOrders(o), "o_orderkey", "o_custkey")
        .orderBy(col("external_id").cast("long"), col("changed_col"), col("new_value"))
    }),
    // O4 wire form: diff as a single JSON payload per changed row
    "cdc_update_payload" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      CdcOps.updateEventsJson(o, mutatedOrders(o), "o_orderkey", "o_custkey")
        .orderBy(col("data"), col("external_id").cast("long"))
    }),
    // O6 delete capture: empty payload, key from OLD row
    "cdc_delete_events" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_orderkey") % 13 === 0)
      CdcOps.deleteEvents(o, "orders", "o_custkey")
        .orderBy(col("external_id").cast("long"))
    }),
    // O7 drain page: processed=false ORDER BY id LIMIT 1000
    "cdc_drain_page" -> ((s, dir) =>
      CdcOps.drainPage(eventQueue(s, dir), 1000).orderBy(col("id"))),
    // keyset-cursor drain: page 2 of the queue via `id > cursor`
    // (cursor = last id of page 1, an in-plan broadcast singleton) —
    // OFFSET paging re-sorts and discards every prior page; the keyset
    // predicate prunes at the scan and stays O(page) per page at 100 TB
    "cdc_drain_keyset" -> ((s, dir) => {
      val q = eventQueue(s, dir)
      // page size 500 (not the O7 default 1000) so page 2 is non-empty
      // even at the sf0.001 fixture's ~800 unprocessed events
      val cursor = CdcOps.drainPage(q, 500)
        .agg(max(col("id")).as("cursor"))
      CdcOps.drainKeyset(q, cursor, 500)
        .select(col("id"), col("external_id"), col("statement"),
          col("cursor"))
        .orderBy(col("id"))
    }),
    // O8 page count: ceil(unprocessed/1000)
    "cdc_page_count" -> ((s, dir) => CdcOps.pageCount(eventQueue(s, dir), 1000)),
    // O9 ack as anti-join: queue minus delivered ids
    "cdc_ack" -> ((s, dir) => {
      val q = eventQueue(s, dir)
      val acked = q.filter(!col("processed") && col("id") % 3 === 0).select("id")
      CdcOps.ackAntiJoin(q.filter(!col("processed")), acked)
        .select("id", "external_id", "statement").orderBy(col("id"))
    }),
    // registry lookup join (sql/triggers.sql:10-12): broadcast the watch
    // registry, enrich each queued event with its watched key column
    "cdc_registry_lookup" -> ((s, dir) => {
      val q = eventQueue(s, dir)
      val registry = Tables.events(s, dir)
        .select(upper(col("event_type")).as("statement")).distinct()
        .filter(col("statement").isin("CLICK", "VIEW", "PURCHASE"))
        .withColumn("key_col", concat(lit("k_"), lower(col("statement"))))
      graft.operators.ScaleOps.registryLookup(
          q.withColumnRenamed("table_name", "tbl"), registry, "statement")
        .select(col("id"), col("statement"), col("key_col"), col("external_id"))
        .orderBy(col("id"))
    }),
    // dynamic-schema payload evolution (sql/triggers.sql:21 — the
    // payload is schema-less jsonb, so a watched table can gain a
    // column mid-stream): the watched table is materialized as two
    // parquet waves, the second carrying an added `extra` column; the
    // merged-schema read surfaces it (pre-evolution rows as NULL) and
    // the SAME runtime row_to_json envelope emits it with no code
    // change — JSON nulls preserved, reference sql_test.go:92-110
    "cdc_payload_evolution" -> ((s, dir) => {
      val merged = s.read.option("mergeSchema", "true")
        .parquet(evolvedEventsDir(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("extra"))
      CdcOps.insertEvents(merged, "events", "user_id")
        .orderBy(col("data"))
    }),
    // Incremental materialized-view maintenance: fold one CDC batch
    // (deletes %13, price-doubling updates %7, clone inserts %17) into
    // a per-customer (count, cents) view WITHOUT touching the fact
    // table; the oracle recomputes the view from the post-batch state
    // from scratch, so the gate is incremental == recompute.
    "cdc_matview_apply" -> ((s, dir) =>
      CdcOps.applyAggDeltas(matviewBase(s, dir),
          matviewDeltaWaves(s, dir).reduce(_ union _),
          Seq("o_custkey"), "n_orders")
        .orderBy(col("o_custkey"))),
    // SCD Type 2 dimension build from the CDC history log: every
    // non-delete event becomes a version row whose validity interval
    // is [its ts, next event's ts) — the standard slowly-changing-
    // dimension derivation a warehouse runs downstream of exactly the
    // kind of change stream the reference emits. One window pass keyed
    // by the dimension key; a delete closes the final version.
    "cdc_scd2_build" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderkey")).orderBy(col("seq"))
      historyLog(s, dir)
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .filter(col("op") =!= "D")
        .select(col("o_orderkey"), col("seq").as("version"),
          col("status"), col("price_cents"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("o_orderkey"), col("version"))
    }),
    // Point-in-time reconstruction (time travel): the table state as
    // of T from the same history log — latest event per key with
    // ts <= T, dropped if that event is the delete. This is what a
    // change-stream consumer replays to rebuild a snapshot at T.
    "cdc_time_travel" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("seq").desc)
      historyLog(s, dir)
        .filter(col("ts") <= lit(asOfSec))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1 && col("op") =!= "D")
        .select(col("o_orderkey"), col("status"), col("price_cents"),
          col("seq").as("version"), col("ts").as("valid_from"))
        .orderBy(col("o_orderkey"))
    }),
    // O10 topic routing truth table (main_test.go:157-164)
    "cdc_topic_routing" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
      n.select(
        col("n_name").as("table_name"),
        CdcOps.topicName(
          when(col("n_nationkey") % 2 === 0, lit("ns")).otherwise(lit("")),
          when(col("n_nationkey") % 3 === 0, lit("db")).otherwise(lit("")),
          lower(col("n_name"))).as("topic"))
        .orderBy(col("table_name"))
    }))

  /** The schema-evolution fixture: the events projection written as two
    * waves — the second gains an `extra` column (deterministic value
    * `'x' ++ event_id` for odd event_ids), modeling a watched table
    * whose shape changed between drains. Epoch-cached per (session,
    * dir); the oracle recomputes both waves from `events` directly. */
  private[graft] def evolvedEventsDir(s: SparkSession, dir: String): String =
    EpochRegistry.acquire(s, "cdc_evolved_events_dir", dir) { () =>
      val path = java.nio.file.Files
        .createTempDirectory("graft_cdc_evolved_").toString
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      e.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(path)
      e.filter(col("event_id") % 2 === 1)
        .withColumn("extra", concat(lit("x"), col("event_id").cast("string")))
        .write.mode("append").parquet(path)
      EpochRegistry.Resource(path, deleteDirs = Seq(path))
    }

  /** The per-customer (count, cents) view over orders — generation 0
    * of the matview family, shared by the batch apply and the
    * streaming maintenance loop. */
  private[graft] def matviewBase(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(matviewCents).as("cents"))
  }

  private def matviewCents: org.apache.spark.sql.Column =
    round(col("o_totalprice") * 100).cast("long")

  /** One CDC batch as three signed delta waves (deletes %13,
    * price-doubling updates %7, clone inserts %17) — unioned by the
    * batch apply, drained file-per-micro-batch by the streaming loop. */
  private[graft] def matviewDeltaWaves(
      s: SparkSession, dir: String): Seq[DataFrame] = {
    val o = Tables.orders(s, dir)
    Seq(
      o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_custkey"), lit(-1L).as("n_orders"),
          (-matviewCents).as("cents")),
      o.filter(col("o_orderkey") % 13 =!= 0 && col("o_orderkey") % 7 === 0)
        .select(col("o_custkey"), lit(0L).as("n_orders"),
          (round(col("o_totalprice") * 2 * 100).cast("long") - matviewCents)
            .as("cents")),
      o.filter(col("o_orderkey") % 13 =!= 0 && col("o_orderkey") % 17 === 0)
        .select(col("o_custkey"), lit(1L).as("n_orders"),
          matviewCents.as("cents")))
  }

  /** Deterministic per-key CDC history over `orders`: seq 1 is the
    * insert at the order date; every 7th key doubles its price a day
    * later; every 11th flips status to 'X' two days in (price carried
    * from the latest prior version); every 13th is deleted on day 3.
    * All-integer (seconds, cents) so both engines agree bit-for-bit.
    * Four narrow projections of one scan — the same shape the matview
    * delta waves use. */
  private[graft] def historyLog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    // double cast: NTZ→long is rejected, NTZ→LTZ→long is fine and
    // identical under the UTC session tz (stats_table_profile precedent)
    val base = col("o_orderdate").cast("timestamp").cast("long")
    val cents = round(col("o_totalprice") * 100).cast("long")
    val cents2 = round(col("o_totalprice") * 2 * 100).cast("long")
    val insert = o.select(col("o_orderkey"), lit(1L).as("seq"),
      lit("I").as("op"), col("o_orderstatus").as("status"),
      cents.as("price_cents"), base.as("ts"))
    val reprice = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
        col("o_orderstatus").as("status"), cents2.as("price_cents"),
        (base + 86400L).as("ts"))
    val restatus = o.filter(col("o_orderkey") % 11 === 0)
      .select(col("o_orderkey"), lit(3L).as("seq"), lit("U").as("op"),
        lit("X").as("status"),
        when(col("o_orderkey") % 7 === 0, cents2).otherwise(cents)
          .as("price_cents"),
        (base + 172800L).as("ts"))
    val delete = o.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit(4L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("status"),
        lit(null).cast("long").as("price_cents"),
        (base + 259200L).as("ts"))
    insert.union(reprice).union(restatus).union(delete)
  }

  /** The time-travel cut: mid-range of the orders date span, so at T
    * some keys are not yet inserted, some are mid-history, and some
    * are already deleted. */
  private[graft] val asOfSec: Long = 9298L * 86400L // DATE '1995-06-17'

  private val historyLogSql =
    """SELECT o_orderkey, 1 AS seq, 'I' AS op, o_orderstatus AS status,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |  epoch_us(o_orderdate) // 1000000 AS ts
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey, 2, 'U', o_orderstatus,
      |  CAST(round(o_totalprice * 2 * 100) AS BIGINT),
      |  epoch_us(o_orderdate) // 1000000 + 86400
      |FROM orders WHERE o_orderkey % 7 = 0
      |UNION ALL
      |SELECT o_orderkey, 3, 'U', 'X',
      |  CASE WHEN o_orderkey % 7 = 0
      |    THEN CAST(round(o_totalprice * 2 * 100) AS BIGINT)
      |    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END,
      |  epoch_us(o_orderdate) // 1000000 + 172800
      |FROM orders WHERE o_orderkey % 11 = 0
      |UNION ALL
      |SELECT o_orderkey, 4, 'D', NULL, NULL,
      |  epoch_us(o_orderdate) // 1000000 + 259200
      |FROM orders WHERE o_orderkey % 13 = 0""".stripMargin

  def oracle: Map[String, String] = Map(
    "cdc_scd2_build" ->
      s"""WITH log AS ($historyLogSql),
        |v AS (SELECT *, lead(ts) OVER
        |  (PARTITION BY o_orderkey ORDER BY seq) AS valid_to FROM log)
        |SELECT o_orderkey, CAST(seq AS BIGINT) AS version, status,
        |  price_cents, ts AS valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current
        |FROM v WHERE op <> 'D'
        |ORDER BY o_orderkey, version""".stripMargin,
    "cdc_time_travel" ->
      s"""WITH log AS ($historyLogSql),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY o_orderkey ORDER BY seq DESC) AS rk
        |  FROM log WHERE ts <= ${9298L * 86400L})
        |SELECT o_orderkey, status, price_cents,
        |  CAST(seq AS BIGINT) AS version, ts AS valid_from
        |FROM r WHERE rk = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "cdc_snapshot" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS external_id, 'SNAPSHOT' AS statement,
        |  CAST(to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
        |    c_nationkey := c_nationkey, c_acctbal := c_acctbal,
        |    c_mktsegment := c_mktsegment)) AS VARCHAR) AS data,
        |  'customer' AS table_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "cdc_insert_payload" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS external_id, 'INSERT' AS statement,
        |  CAST(to_json(struct_pack(p_partkey := p_partkey, p_name := p_name,
        |    p_brand := p_brand, p_type := p_type, p_size := p_size,
        |    p_retailprice := p_retailprice)) AS VARCHAR) AS data,
        |  'part' AS table_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "cdc_update_diff" ->
      s"""WITH newo AS ($mutatedOrdersSql),
        |diffs AS (
        |  SELECT o.o_custkey, n.o_orderkey, 'o_orderstatus' AS changed_col,
        |    CAST(n.o_orderstatus AS VARCHAR) AS new_value
        |  FROM orders o JOIN newo n ON o.o_orderkey = n.o_orderkey
        |  WHERE o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |  UNION ALL
        |  SELECT o.o_custkey, n.o_orderkey, 'o_totalprice',
        |    CAST(n.o_totalprice AS VARCHAR)
        |  FROM orders o JOIN newo n ON o.o_orderkey = n.o_orderkey
        |  WHERE o.o_totalprice IS DISTINCT FROM n.o_totalprice)
        |SELECT CAST(o_custkey AS VARCHAR) AS external_id, 'UPDATE' AS statement,
        |  changed_col, new_value
        |FROM diffs ORDER BY o_custkey, changed_col, new_value""".stripMargin,
    "cdc_update_payload" ->
      s"""WITH newo AS ($mutatedOrdersSql)
        |SELECT CAST(o.o_custkey AS VARCHAR) AS external_id, 'UPDATE' AS statement,
        |  '{' || concat_ws(',',
        |    CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |      THEN '"o_orderstatus":' || CAST(to_json(n.o_orderstatus) AS VARCHAR) END,
        |    CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |      THEN '"o_totalprice":' || CAST(to_json(n.o_totalprice) AS VARCHAR) END
        |  ) || '}' AS data
        |FROM orders o JOIN newo n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |ORDER BY data, o.o_custkey""".stripMargin,
    "cdc_delete_events" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS external_id, 'DELETE' AS statement,
        |  '{}' AS data, 'orders' AS table_name
        |FROM orders WHERE o_orderkey % 13 = 0 ORDER BY o_custkey""".stripMargin,
    "cdc_drain_page" ->
      s"""WITH q AS ($eventQueueSql)
        |SELECT * FROM q WHERE NOT processed ORDER BY id ASC LIMIT 1000""".stripMargin,
    "cdc_drain_keyset" ->
      s"""WITH q AS ($eventQueueSql),
        |p1 AS (SELECT id FROM q WHERE NOT processed ORDER BY id LIMIT 500),
        |cur AS (SELECT max(id) AS cursor FROM p1)
        |SELECT id, external_id, statement, cursor
        |FROM q CROSS JOIN cur
        |WHERE NOT processed AND id > cursor
        |ORDER BY id LIMIT 500""".stripMargin,
    "cdc_page_count" ->
      s"""WITH q AS ($eventQueueSql)
        |SELECT CAST(ceil(count(*) / 1000.0) AS BIGINT) AS page_count
        |FROM q WHERE NOT processed""".stripMargin,
    "cdc_ack" ->
      s"""WITH q AS ($eventQueueSql)
        |SELECT id, external_id, statement FROM q
        |WHERE NOT processed AND NOT (id % 3 = 0)
        |ORDER BY id""".stripMargin,
    "cdc_registry_lookup" ->
      s"""WITH q AS ($eventQueueSql),
        |registry AS (
        |  SELECT DISTINCT upper(event_type) AS statement,
        |    'k_' || lower(upper(event_type)) AS key_col
        |  FROM events
        |  WHERE upper(event_type) IN ('CLICK', 'VIEW', 'PURCHASE'))
        |SELECT q.id, q.statement, r.key_col, q.external_id
        |FROM q JOIN registry r ON q.statement = r.statement
        |ORDER BY q.id""".stripMargin,
    "cdc_payload_evolution" ->
      """SELECT CAST(user_id AS VARCHAR) AS external_id, 'INSERT' AS statement,
        |  CAST(to_json(struct_pack(event_id := event_id, user_id := user_id,
        |    event_type := event_type,
        |    extra := CASE WHEN event_id % 2 = 1
        |      THEN 'x' || CAST(event_id AS VARCHAR) END)) AS VARCHAR) AS data,
        |  'events' AS table_name
        |FROM events ORDER BY data""".stripMargin,
    "cdc_matview_apply" ->
      """WITH finals AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END * 100 AS p100
        |  FROM orders WHERE NOT (o_orderkey % 13 = 0)
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice * 100
        |  FROM orders WHERE o_orderkey % 17 = 0 AND NOT (o_orderkey % 13 = 0))
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(SUM(CAST(round(p100) AS BIGINT)) AS BIGINT) AS cents
        |FROM finals GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "cdc_topic_routing" ->
      """SELECT n_name AS table_name,
        |  'pg2kafka.' ||
        |  CASE WHEN n_nationkey % 2 = 0 AND NOT n_nationkey % 3 = 0 THEN 'ns.'
        |       WHEN n_nationkey % 2 = 0 AND n_nationkey % 3 = 0 THEN 'ns.db'
        |       WHEN NOT n_nationkey % 2 = 0 AND n_nationkey % 3 = 0 THEN 'db'
        |       ELSE '' END
        |  || '.' || lower(n_name) AS topic
        |FROM nation ORDER BY n_name""".stripMargin)
}
