package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Engine extension point (registered via `spark.sql.extensions`,
  * GraftSession): injects the native SQL functions so `cosine_sim(a, b)`
  * is available to `expr()`/`spark.sql` everywhere, including pure-SQL
  * consumers — the idiomatic way to ship custom Catalyst expressions
  * with a library. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          s"cosine_sim requires exactly 2 arguments, got ${children.size}")
        CosineSimilarity(children(0), children(1))
      }
    ))
  }
}
