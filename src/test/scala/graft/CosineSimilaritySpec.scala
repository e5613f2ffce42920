package graft

import org.apache.spark.sql.functions._

/** The native cosine_sim Expression: registered through the session
  * extension, bit-identical to the composed zip_with+aggregate form,
  * null-safe on zero vectors, interpreted and codegen paths agree. */
class CosineSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def composedDot(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("native expression matches the composed form bit-for-bit on real embeddings") {
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings.limit(100)
    val pairs = e.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(2000)
    val diff = pairs
      .withColumn("native", expr("cosine_sim(a, b)"))
      .withColumn("composed",
        composedDot("a", "b") / (sqrt(composedDot("a", "a")) * sqrt(composedDot("b", "b"))))
      .filter(col("native") =!= col("composed")) // exact equality, not tolerance
      .count()
    assert(diff == 0)
  }

  test("zero vector yields null, not NaN or divide error") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val r = df.select(expr("cosine_sim(a, b)").as("c")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("dimension mismatch yields null (a data error, not a prefix comparison)") {
    val df = Seq((Seq(1.0f, 0.0f, 5.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val r = df.select(expr("cosine_sim(a, b)").as("c")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("SQL surface works through the extension registration") {
    val c = spark.sql("SELECT cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)) AS c")
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
