package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def oracle: Map[String, String] = Map(
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
