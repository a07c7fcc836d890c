package graft.sources

import org.apache.spark.sql.types._

/** Schema evolution from the DDL control stream (SURVEY.md §2.A A5 /
  * §1.4): the reference captures DDL to `schema-changes.prod.postgres`
  * (`include.schema.changes=true`, postgresql-connector.yaml:44-46), and
  * the consumer-side registry must evolve forward-compatibly — an added
  * column appears as nullable, so envelopes produced BEFORE the DDL still
  * parse (the field is simply null) and envelopes after it populate it.
  * This is exactly `from_json`'s missing-field behavior, so evolution =
  * updating the registry StructType; no reprocessing.
  *
  * v1 scope: ADD COLUMN only (the forward-compatible evolution); type
  * changes and drops need a reprocessing policy and stay out of scope,
  * matching SURVEY.md §2.A A5's "log-and-ignore the rest".
  */
object SchemaEvolution {

  private val AddColumn =
    """(?i)ALTER\s+TABLE\s+(?:[\w"]+\.)?([\w"]+)\s+ADD\s+COLUMN\s+([\w"]+)\s+([\w()\[\], ]+?)\s*$""".r

  /** Debezium-typed mapping for the common Postgres DDL type names, under
    * the configured modes (decimal-as-string, adaptive micros). */
  def sqlTypeToSpark(t: String): DataType =
    t.trim.toLowerCase.takeWhile(c => c != '(') match {
      case "smallint" | "int" | "integer" | "serial"       => IntegerType
      case "bigint" | "bigserial"                          => LongType
      case "real"                                          => FloatType
      case "double" | "float8"                             => DoubleType
      case "boolean" | "bool"                              => BooleanType
      case "numeric" | "decimal"                           => StringType // decimal.handling.mode=string
      case "timestamp" | "timestamptz" | "time" | "date"   => LongType   // adaptive micros
      case _                                               => StringType // text/varchar/json/unknown
    }

  /** Parse one DDL statement; None when unsupported (log-and-ignore). */
  def parseAddColumn(ddl: String): Option[(String, StructField)] =
    ddl match {
      case AddColumn(table, colName, sqlType) =>
        Some((table.replaceAll("\"", ""),
          StructField(colName.replaceAll("\"", ""),
            sqlTypeToSpark(sqlType), nullable = true)))
      case _ => None
    }

  /** Apply supported DDL statements to a registry; unknown statements and
    * unknown tables are ignored (the side topic also carries session DDL
    * noise in real deployments). Duplicate adds are idempotent. */
  def evolve(
      registry: Map[String, StructType],
      ddls: Seq[String]): Map[String, StructType] =
    ddls.flatMap(parseAddColumn).foldLeft(registry) {
      case (reg, (table, field)) =>
        reg.get(table) match {
          case Some(schema) if !schema.fieldNames.contains(field.name) =>
            reg.updated(table, StructType(schema.fields :+ field))
          case _ => reg
        }
    }
}
