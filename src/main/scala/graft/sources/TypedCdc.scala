package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

import scala.reflect.runtime.universe.TypeTag

/** Typed change-event facade (SURVEY.md §1.6: `Dataset[ChangeEvent[T]]`
  * via case classes where type safety helps; the untyped DataFrame path
  * stays primary because schemas are registry-driven).
  *
  * Scala 2 encoders cannot derive for generic `ChangeEvent[T]` without an
  * implicit chain, so the envelope is concrete per table: instantiate via
  * [[TypedCdc.typed]] with the table's row case class. */
final case class SourceMeta(
    connector: String,
    db: String,
    table: String,
    lsn: Long,
    tsMs: Long,
    snapshot: Boolean)

final case class ChangeEvent[T](
    before: Option[T],
    after: Option[T],
    op: String, // c | u | d | r
    source: SourceMeta)

object TypedCdc {

  /** Lift a parsed+unwrapped-shaped DataFrame (cols: before/after structs
    * already split out is NOT required — this operates on the parsed
    * envelope column layout produced by [[Debezium.parseEnvelope]]) into
    * a typed Dataset. `T` is the table's row case class. */
  def typed[T <: Product: TypeTag](
      parsed: DataFrame): Dataset[ChangeEvent[T]] = {
    implicit val evEnc: Encoder[ChangeEvent[T]] =
      Encoders.product[ChangeEvent[T]]
    parsed
      .filter("NOT _tombstone")
      .selectExpr(
        "env.before AS before",
        "env.after AS after",
        "env.op AS op",
        """named_struct(
          |  'connector', env.source.connector,
          |  'db', env.source.db,
          |  'table', env.source.table,
          |  'lsn', env.source.lsn,
          |  'tsMs', env.source.ts_ms,
          |  'snapshot', coalesce(env.source.snapshot = 'true', false)
          |) AS source""".stripMargin)
      .as[ChangeEvent[T]]
  }
}
