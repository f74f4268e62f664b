package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is private[sql] in
  * Spark 4, so this one-file shim lives under the spark package — the
  * standard pattern extension libraries use to register custom Catalyst
  * expressions without forking Spark. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is private[sql]; expressions outside the spark
    * package need the alias to declare ExpectsInputTypes.inputTypes. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
