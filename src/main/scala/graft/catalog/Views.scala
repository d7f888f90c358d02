package graft.catalog

import java.nio.file.{Files, Path}
import java.util
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}
import scala.jdk.CollectionConverters._

/** Persisted view definition — the path-based analog of the reference
  * JDBC catalog's view records (JdbcRelativeCatalog.java:157-201,
  * 476-547): SQL text + schema + column metadata + properties, stored
  * as `<ns…>/<name>.view.json` under the warehouse (relative by
  * construction, so views relocate with the warehouse like tables).
  */
final case class ViewDef(
    name: String,
    sql: String,
    currentCatalog: String,
    currentNamespace: List[String],
    schemaJson: String,
    queryColumnNames: List[String],
    columnAliases: List[String],
    columnComments: List[String],
    properties: Map[String, String])

object ViewDef {
  private implicit val formats: Formats = Serialization.formats(NoTypeHints)
  def toJson(v: ViewDef): String = Serialization.writePretty(v)
  def fromJson(s: String): ViewDef = JsonMethods.parse(s).extract[ViewDef]
}

class GraftView(d: ViewDef) extends View {
  override def name(): String = d.name
  override def query(): String = d.sql
  override def currentCatalog(): String = d.currentCatalog
  override def currentNamespace(): Array[String] = d.currentNamespace.toArray
  override def schema(): StructType =
    org.apache.spark.sql.types.DataType.fromJson(d.schemaJson).asInstanceOf[StructType]
  override def queryColumnNames(): Array[String] = d.queryColumnNames.toArray
  override def columnAliases(): Array[String] = d.columnAliases.toArray
  override def columnComments(): Array[String] = d.columnComments.map(c =>
    if (c == null) null else c).toArray
  override def properties(): util.Map[String, String] = d.properties.asJava
}
