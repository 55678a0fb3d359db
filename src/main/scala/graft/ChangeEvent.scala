package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed form of the event envelope (SURVEY §1.1/§1.5): the queue row of
  * `sql/migrations.sql:6-15` minus queue-internal fields. `Dataset[ChangeEvent]`
  * gives compile-time field checks on the CDC hot path; the DataFrame form
  * remains the dynamic-schema surface (`row_to_json` of arbitrary tables).
  */
case class ChangeEvent(
    uuid: String,
    external_id: Option[String],
    table_name: String,
    statement: String,
    data: String,
    created_at: Timestamp)

object ChangeEvent {
  implicit val encoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]

  /** Typed view over a finalized envelope DataFrame. */
  def typed(envelope: DataFrame): Dataset[ChangeEvent] =
    envelope.selectExpr("uuid", "external_id", "table_name", "statement",
      "data", "CAST(created_at AS TIMESTAMP) AS created_at")
      .as[ChangeEvent]
}
