package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotF

/** Session extensions for the engine's native expressions.
  *
  * Registers `dotf(array, array) -> double` so SQL users (and
  * `call_function`) get the codegen'd dot product. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`; the
  * Column-level API ([[graft.functions.DotF.dotf]]) works without it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dotf"),
      new ExpressionInfo(classOf[DotF].getName, "dotf"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotF(children(0), children(1))))
  }
}
