package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) `private[sql]`;
  * extension libraries conventionally expose them through a shim in the
  * `org.apache.spark.sql` package — the same pattern Delta/Iceberg use for
  * their custom Catalyst expressions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Column names an UNRESOLVED column expression references — collected
    * from the Spark-4 ColumnNode tree (`Column.node` is `private[sql]`,
    * and `expression(c)` wraps the node lazily, so catalyst-side
    * traversal sees no attributes until analysis). Multi-part names join
    * with '.'; resolved/analyzed columns are out of scope. */
  def referencedNames(c: Column): Set[String] =
    c.node.collect {
      case a: internal.UnresolvedAttribute => a.nameParts.mkString(".")
    }.toSet

  /** The classic session's guaranteed-unique UUID (`private[sql]` in
    * Spark 4) — used to key session-scoped caches where identityHashCode
    * could collide after a stopped session is GC'd. */
  def sessionUUID(s: SparkSession): Option[String] = s match {
    case c: classic.SparkSession => Some(c.sessionUUID)
    case _ => None
  }
}
