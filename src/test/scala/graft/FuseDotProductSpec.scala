package graft

import org.apache.spark.sql.functions._

/** FuseDotProduct rewrite: the composed aggregate(zip_with(...)) dot
  * idiom must optimize to the native dot_product expression, near-miss
  * patterns must NOT be touched, and values must match bit-for-bit. */
class FuseDotProductSpec extends SparkSpecBase {
  import spark.implicits._

  private val df = Seq(
    (Seq(1.5f, -2.0f, 3.25f), Seq(0.5f, 4.0f, -1.25f)),
    (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f))
  ).toDF("a", "b")

  private def composedDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, x) => acc + x)

  // parquet-backed source: a LocalRelation would be constant-folded away
  // before the optimized plan can be inspected
  private def emb = Tables(spark, "/root/testdata/sf0.001").embeddings
    .select(col("embedding").as("a"), col("embedding").as("b"))

  test("the composed dot idiom is rewritten to the native dot_product") {
    val optimized = emb.select(composedDot.as("d")).queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"), s"composed form survived:\n$optimized")
  }

  test("near-miss patterns are left alone") {
    // different seed (1.0): NOT a dot product — must not rewrite
    val otherSeed = emb.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, x) => acc + x).as("d")).queryExecution.optimizedPlan.toString
    assert(!otherSeed.contains("dot_product"), "rewrote a non-zero-seed aggregate")

    // addition instead of multiply inside zip_with — must not rewrite
    val sums = emb.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") + y.cast("double")),
      lit(0.0), (acc, x) => acc + x).as("d")).queryExecution.optimizedPlan.toString
    assert(!sums.contains("dot_product"), "rewrote a zip_with sum")
  }

  test("rewritten values are bit-identical to the composed semantics") {
    val viaRule = df.select(composedDot.as("d")).as[Double].collect()
    val expected = Array(1.5 * 0.5 + -2.0 * 4.0 + 3.25 * -1.25, 0.0)
    assert(viaRule.toSeq == expected.toSeq)

    // null element poisons to null, exactly like the composed form
    val withNull = Seq((Seq(Some(1.0f), None), Seq(Some(2.0f), Some(3.0f))))
      .toDF("a", "b")
    val r = withNull.select(composedDot.as("d")).collect()(0)
    assert(r.isNullAt(0), "null element must poison the dot product")
  }
}
