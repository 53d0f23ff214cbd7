package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between user-facing `Column` and catalyst `Expression` for the
  * custom expressions in `graft.functions`. `classic.ExpressionUtils` is
  * `private[sql]`, so this lives inside the `org.apache.spark.sql` package —
  * the conventional extension-library pattern (public Spark API surface has
  * no Expression↔Column constructor since Spark 4's Connect split). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `org.apache.spark.sql.types.AbstractDataType` is `private[sql]` in
  * Spark 4, but `ExpectsInputTypes.inputTypes` names it — so custom
  * expressions outside the spark package need this public alias to declare
  * typed inputs. */
object TypeBridge {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
