package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared operator from SURVEY.md §2: the Spark-side query plus
  * (when SQL-expressible) the DuckDB oracle run by the driver on the
  * same parquet tables. Keeping both in one value keeps output column
  * names in sync — the driver's compare sorts columns by name and
  * hashes values, so names must match exactly.
  */
final case class Decl(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait Pack { def decls: Seq[Decl] }

/** Loads the driver-generated parquet fixtures (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read it as raw nanos and floor-truncate to µs —
      // exactly what DuckDB does when it reads the same file, so oracle
      // comparisons see identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}

/** Determinism helpers shared by every declared query (SURVEY.md §7):
  * double aggregates must be exact in both engines → cast inputs to
  * decimal before SUM/AVG; every result ends in a total ORDER BY with
  * explicit null ordering.
  */
object Dsl {
  /** Exact pre-aggregation numeric: decimal(18,6) sums identically in
    * Spark and DuckDB regardless of addition order. */
  def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Narrow decimal for factors in [0,1] (discount/tax): keeps chained
    * decimal multiplication within 38 digits of precision in BOTH
    * engines, so no engine-specific scale truncation kicks in. */
  def frac(c: Column): Column = c.cast("decimal(8,6)")

  /** Final output shape for money-like aggregates: exact decimal(18,4)
    * value (order-independent, identical in both engines), then a last
    * cast to double so the DECLARED schema is floating-point — the
    * driver's checker stringifies parquet DECIMAL as "50.0000" but
    * DuckDB results as float "50.0", so a physical DECIMAL output
    * column can never hash-match even when values are identical.
    * decimal→nearest-double is the same IEEE conversion in both
    * engines, so equality is preserved. */
  def d4(c: Column): Column = c.cast("decimal(18,4)").cast("double")

  def spark(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
