package graft.plans

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DescribeRelation, DropView, LogicalPlan, RenameTable, SetViewProperties, ShowCreateTable, ShowTableProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._
import scala.util.Try

/** SQL view DDL + view reads for V2 `ViewCatalog`s.
  *
  * Spark 4.1 parses `CREATE/DROP/SHOW VIEW` and relation references
  * fine, but its analyzer hard-stops every one of them for a non-
  * session catalog (`ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY.VIEWS — the V2 view SQL surface is
  * unfinished upstream), so a catalog implementing the connector
  * `ViewCatalog` API is reachable only programmatically. The reference
  * treats SQL view DDL as a first-class catalog operation
  * (JdbcRelativeCatalog.java:476-547), so this extension closes the
  * gap Spark-first:
  *
  *  - a delegating parser rewrites CREATE [OR REPLACE] VIEW /
  *    DROP VIEW / SHOW VIEWS that target a registered `ViewCatalog`
  *    into runnable commands driving the V2 API (the rewrite happens
  *    at parse time because the analyzer's ability check throws
  *    mid-resolution, before any injected rule could see the plan);
  *  - an injected resolution rule expands relation references that
  *    name a V2 view into its parsed SQL (`SubqueryAlias` over the
  *    stored text), so SELECT / spark.table() read through.
  *
  * Names inside a view body resolve in the READER's context; qualify
  * table references in view definitions (the stored
  * currentCatalog/currentNamespace are kept as metadata, matching the
  * reference's records). Registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftViewDdlParser(session, delegate))
    ext.injectResolutionRule(session => ResolveGraftViews(session))
  }
}

object GraftViewDdl {
  /** The V2 ViewCatalog registered under `name`, if any (the session
    * catalog is never one). */
  def viewCatalog(spark: SparkSession, name: String): Option[ViewCatalog] =
    Try(spark.sessionState.catalogManager.catalog(name)).toOption
      .collect { case v: ViewCatalog => v }

  /** Split a relation/identifier name into (catalog, ident) when its
    * head names a registered ViewCatalog — explicit 3-part names only;
    * 2-part names resolve against the CURRENT catalog when that is a
    * ViewCatalog. */
  def viewTarget(spark: SparkSession, parts: Seq[String]): Option[(ViewCatalog, Identifier)] =
    if (parts.length >= 3)
      viewCatalog(spark, parts.head)
        .map(_ -> Identifier.of(parts.tail.init.toArray, parts.last))
    else if (parts.length == 2)
      spark.sessionState.catalogManager.currentCatalog match {
        case v: ViewCatalog => Some(v -> Identifier.of(Array(parts.head), parts.last))
        case _ => None
      }
    else None
}

/** Delegating parser: rewrites view DDL aimed at a V2 ViewCatalog into
  * graft commands; everything else passes through untouched. */
class GraftViewDdlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    route(delegate.parsePlan(sqlText))

  private def route(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, _,
        props, originalText, _, allowExisting, replace, _) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        CreateGraftViewCommand(parts.head, ident,
          originalText.getOrElse(throw new IllegalArgumentException(
            "CREATE VIEW without original SQL text")),
          cols.map(_._1), comment, props, allowExisting, replace)
      }.getOrElse(cv)
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        DropGraftViewCommand(parts.head, ident, ifExists)
      }.getOrElse(dv)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, _)
        if parts.nonEmpty && GraftViewDdl.viewCatalog(spark, parts.head).isDefined =>
      ShowGraftViewsCommand(parts.head, parts.tail, pattern)
    // ALTER VIEW … SET/UNSET TBLPROPERTIES / AS <query> / RENAME TO —
    // same analyzer hard-stop as CREATE/DROP for non-session catalogs,
    // so route them to the V2 alterView/renameView/replace paths
    case sp @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        AlterGraftViewPropsCommand(parts.head, ident,
          props.map { case (k, v) => ViewChange.setProperty(k, v) }.toSeq)
      }.getOrElse(sp)
    case up @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        AlterGraftViewPropsCommand(parts.head, ident,
          keys.map(ViewChange.removeProperty))
      }.getOrElse(up)
    case av @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText, _) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        AlterGraftViewAsCommand(parts.head, ident, originalText)
      }.getOrElse(av)
    case rt @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, true) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        RenameGraftViewCommand(parts.head, ident, newName)
      }.getOrElse(rt)
    // introspection statements hit TABLE_OR_VIEW_NOT_FOUND for V2
    // views upstream; route them ONLY when the name IS an existing
    // graft view (tables keep their native V2 paths — the existence
    // probe is the cached viewExists, so this costs no IO steady-state)
    case dr @ DescribeRelation(UnresolvedTableOrView(parts, _, _), partSpec, isExtended, _)
        if partSpec.isEmpty && isGraftView(parts) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        DescribeGraftViewCommand(parts.head, ident, isExtended)
      }.getOrElse(dr)
    case sc @ ShowCreateTable(UnresolvedTableOrView(parts, _, _), false, _)
        if isGraftView(parts) =>
      GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
        ShowCreateGraftViewCommand(parts.head, ident)
      }.getOrElse(sc)
    case sp: ShowTableProperties =>
      val parts = sp.child match {
        case UnresolvedTable(p, _, _) => p
        case UnresolvedTableOrView(p, _, _) => p
        case _ => Nil
      }
      if (parts.nonEmpty && isGraftView(parts))
        GraftViewDdl.viewTarget(spark, parts).map { case (_, ident) =>
          ShowGraftViewPropsCommand(parts.head, ident, sp.propertyKey)
        }.getOrElse(sp)
      else sp
    case other => other
  }

  private def isGraftView(parts: Seq[String]): Boolean =
    GraftViewDdl.viewTarget(spark, parts)
      .exists { case (cat, ident) => cat.viewExists(ident) }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

/** CREATE [OR REPLACE] VIEW catalog.ns.v [(aliases)] AS <sql> → V2
  * createView: analyze the body for its schema, then persist SQL +
  * schema + column metadata through the catalog API. */
case class CreateGraftViewCommand(
    catalogName: String, ident: Identifier, sql: String,
    columnAliases: Seq[String], comment: Option[String],
    properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    val exists = cat.viewExists(ident)
    if (exists && allowExisting) return Nil
    if (exists && !replace)
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    val analyzed = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql)).analyzed
    val queryNames = analyzed.schema.fieldNames
    if (columnAliases.nonEmpty && columnAliases.length != queryNames.length)
      throw new IllegalArgumentException(
        s"view column list has ${columnAliases.length} names, query produces ${queryNames.length}")
    val schema =
      if (columnAliases.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(columnAliases)
        .map { case (f, a) => f.copy(name = a) })
    val cm = spark.sessionState.catalogManager
    val props = new java.util.HashMap[String, String]()
    properties.foreach { case (k, v) => props.put(k, v) }
    comment.foreach(props.put(ViewCatalog.PROP_COMMENT, _))
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryNames,
      columnAliases.toArray, Array.empty[String], props)
    cat match {
      // atomic swap when the catalog offers one (readers never see a
      // missing view between drop and create)
      case g: graft.catalog.RelativeCatalog if exists => g.replaceView(info)
      case _ =>
        if (exists) cat.dropView(ident)
        cat.createView(info)
    }
    Nil
  }
}

case class DropGraftViewCommand(catalogName: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

/** SHOW VIEWS IN catalog.ns — same output shape as Spark's ShowViews
  * (namespace, viewName, isTemporary). */
case class ShowGraftViewsCommand(catalogName: String, namespace: Seq[String],
    pattern: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ShowViews.getOutputAttrs

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    val re = pattern.map(p =>
      p.split('|').map(s => java.util.regex.Pattern.quote(s).replace("*", "\\E.*\\Q"))
        .mkString("(?i)(", ")|(", ")").r)
    cat.listViews(namespace: _*).toSeq
      .filter(id => re.forall(_.matches(id.name())))
      .sortBy(_.name())
      .map(id => Row(namespace.mkString("."), id.name(), false))
  }
}

/** ALTER VIEW … SET/UNSET TBLPROPERTIES → V2 alterView. */
case class AlterGraftViewPropsCommand(catalogName: String, ident: Identifier,
    changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    if (!cat.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    cat.alterView(ident, changes: _*)
    Nil
  }
}

/** ALTER VIEW … AS <query> → replace the stored SQL (schema
  * re-derived from the new body; properties and comment carry over;
  * column aliases reset — the new query defines the names, matching
  * Spark's session-catalog semantics). */
case class AlterGraftViewAsCommand(catalogName: String, ident: Identifier,
    sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    if (!cat.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val old = cat.loadView(ident)
    val analyzed = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql)).analyzed
    val cm = spark.sessionState.catalogManager
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String], old.properties())
    cat match {
      case g: graft.catalog.RelativeCatalog => g.replaceView(info)
      case _ => cat.dropView(ident); cat.createView(info)
    }
    Nil
  }
}

/** ALTER VIEW old RENAME TO new → V2 renameView (the catalog strips a
  * redundant leading catalog name and guards table/view clashes). */
case class RenameGraftViewCommand(catalogName: String, ident: Identifier,
    newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    val newIdent =
      if (newName.length >= 2) Identifier.of(newName.init.toArray, newName.last)
      else Identifier.of(ident.namespace(), newName.head)
    cat.renameView(ident, newIdent)
    Nil
  }
}

/** DESCRIBE [EXTENDED] on a V2 view: schema rows, plus the detailed
  * view section (text, default catalog/namespace, output columns,
  * properties) under EXTENDED — the session-catalog layout. */
case class DescribeGraftViewCommand(catalogName: String, ident: Identifier,
    isExtended: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = DescribeRelation.getOutputAttrs

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    val v = cat.loadView(ident)
    val cols = v.schema().fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString,
        f.getComment().orNull))
    if (!isExtended) cols
    else {
      import scala.jdk.CollectionConverters._
      val props = v.properties().asScala.toSeq.sortBy(_._1)
        .map { case (k, vl) => s"$k=$vl" }.mkString("[", ", ", "]")
      cols ++ Seq(
        Row("", "", ""),
        Row("# Detailed View Information", "", ""),
        Row("Name", (catalogName +: ident.namespace() :+ ident.name()).mkString("."), ""),
        Row("View Text", v.query(), ""),
        Row("View Default Catalog", v.currentCatalog(), ""),
        Row("View Default Namespace", v.currentNamespace().mkString("."), ""),
        Row("View Query Output Columns", v.queryColumnNames().mkString("[", ", ", "]"), ""),
        Row("View Properties", props, ""))
    }
  }
}

/** SHOW CREATE TABLE on a V2 view → the CREATE VIEW statement. */
case class ShowCreateGraftViewCommand(catalogName: String,
    ident: Identifier) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ShowCreateTable.getoutputAttrs

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    val v = cat.loadView(ident)
    val name = (catalogName +: ident.namespace() :+ ident.name()).mkString(".")
    val aliases =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) ""
      else v.columnAliases().mkString(" (", ", ", ")")
    import scala.jdk.CollectionConverters._
    val shown = v.properties().asScala -- Seq(ViewCatalog.PROP_COMMENT)
    val props =
      if (shown.isEmpty) ""
      else shown.toSeq.sortBy(_._1)
        .map { case (k, vl) => s"  '$k' = '$vl'" }
        .mkString("\nTBLPROPERTIES (\n", ",\n", ")")
    val comment = Option(v.properties().get(ViewCatalog.PROP_COMMENT))
      .map(c => s"\nCOMMENT '$c'").getOrElse("")
    Seq(Row(s"CREATE VIEW $name$aliases$comment$props AS\n${v.query()}\n"))
  }
}

/** SHOW TBLPROPERTIES on a V2 view (optionally a single key). */
case class ShowGraftViewPropsCommand(catalogName: String, ident: Identifier,
    key: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = ShowTableProperties.getOutputAttrs

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewDdl.viewCatalog(spark, catalogName).getOrElse(
      throw new IllegalStateException(s"catalog $catalogName is not a ViewCatalog"))
    import scala.jdk.CollectionConverters._
    val props = cat.loadView(ident).properties().asScala
    key match {
      case Some(k) => props.get(k).map(v => Row(k, v)).toSeq
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** Read path: a relation reference naming a V2 ViewCatalog view
  * expands to its stored SQL. Runs inside the resolution fixed point,
  * after the built-ins have had their chance (tables win over views,
  * as in the catalogs themselves). */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
      GraftViewDdl.viewTarget(spark, u.multipartIdentifier)
        .filter { case (cat, ident) => cat.viewExists(ident) }
        .map { case (cat, ident) =>
          val v = cat.loadView(ident)
          val body = spark.sessionState.sqlParser.parsePlan(v.query)
          // user column aliases rename the body's output by position
          // (stored as parallel queryColumnNames/columnAliases arrays)
          val aliased =
            if (v.columnAliases == null || v.columnAliases.isEmpty) body
            else org.apache.spark.sql.catalyst.plans.logical.Project(
              v.queryColumnNames.zip(v.columnAliases).toIndexedSeq.map { case (q, a) =>
                org.apache.spark.sql.catalyst.expressions.Alias(
                  org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(q), a)()
              }, body)
          SubqueryAlias(ident.name, aliased)
        }.getOrElse(u)
  }
}
