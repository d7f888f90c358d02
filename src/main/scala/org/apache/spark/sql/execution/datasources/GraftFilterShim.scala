package org.apache.spark.sql.execution.datasources

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter

/** Visibility shim: DataSourceStrategy.translateFilter is
  * protected[datasources]; graft's file-pruning scan builder needs the
  * standard catalyst→source filter translation.
  */
object GraftFilterShim {
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
