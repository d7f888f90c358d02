package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) key for multi-dimensional file clustering: each
  * column is scaled to a 16-bit rank over its observed [min, max] and
  * the ranks' bits are interleaved, so sorting by the key gives files
  * whose bounds are tight on EVERY z-column — one clustering pass buys
  * min/max skipping for predicates on any of them (the
  * classic lakehouse answer to "we filter by user_id AND by date").
  *
  * Built entirely from Column bitwise ops (shifts/and/or), so the key
  * stays inside whole-stage codegen — no UDF in the compaction path.
  * Up to 4 columns of numeric/date/timestamp type (16 bits each → a
  * 64-bit key).
  */
object ZOrder {

  /** Per-column [min, max] collected in ONE aggregation pass; columns
    * are cast to double ranks (dates/timestamps through their numeric
    * representation). */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4, s"z-order supports 1-4 columns, got ${cols.size}")
    val nums = cols.map(c => toNum(df, c))
    val aggExprs = nums.zipWithIndex.flatMap { case (n, i) =>
      Seq(min(n).cast("double").as(s"mn$i"), max(n).cast("double").as(s"mx$i"))
    }
    val bounds = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    val stride = cols.size
    val parts = nums.zipWithIndex.map { case (n, j) =>
      val mn = Option(bounds.getAs[java.lang.Double](s"mn$j")).map(_.toDouble).getOrElse(0.0)
      val mx = Option(bounds.getAs[java.lang.Double](s"mx$j")).map(_.toDouble).getOrElse(0.0)
      val rank: Column =
        if (mx <= mn) lit(0L)
        else least(greatest(
          ((n.cast("double") - lit(mn)) / lit(mx - mn) * lit(65535.0)).cast("long"),
          lit(0L)), lit(65535L))
      val nz = coalesce(rank, lit(0L))
      // spread bit i of the 16-bit rank to position i*stride + j
      (0 until 16).map(i =>
        shiftleft(shiftright(nz, i).bitwiseAND(lit(1L)), i * stride + j): Column)
        .reduce(_.bitwiseOR(_))
    }
    parts.reduce(_.bitwiseOR(_)).as("__zorder")
  }

  private def toNum(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema.fields.find(_.name == c).map(_.dataType) match {
      case Some(_: DateType) => col(c).cast("int")
      case Some(_: TimestampType) | Some(_: TimestampNTZType) => col(c).cast("long")
      case Some(_: NumericType) => col(c)
      case other => throw new IllegalArgumentException(
        s"z-order column $c must be numeric/date/timestamp, got $other")
    }
  }
}
