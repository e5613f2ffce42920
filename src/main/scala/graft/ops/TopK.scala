package graft.ops

import graft.plans.TopKPerKeyPlan
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}

/** Public face of the custom per-key top-k operator
  * ([[graft.plans.TopKPerKeyPlan]]): bounded-heap per key instead of the
  * window form's full partition sort. Requires the
  * [[graft.functions.GraftExtensions]] planner strategy (registered by
  * GraftSession) to lower the node.
  */
object TopK {

  /** First k rows per key under `orderBy` (pass a tiebreak column for a
    * total order, exactly as with the window form). */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.PlanBridge
    val analyzed = df.queryExecution.analyzed
    val keyExprs = keyCols.map(c => PlanBridge.expression(df.sparkSession, df(c)))
    val sortOrder = orderBy.map(c => PlanBridge.expression(df.sparkSession, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    PlanBridge.ofRows(df.sparkSession, TopKPerKeyPlan(keyExprs, sortOrder, k, analyzed))
  }
}
