package graft

import org.apache.spark.sql.functions._

/** MinHash/LSH invariants that the oracle hash-match can't express:
  * signature determinism, near-dup banding recall on crafted docs, and
  * cosine self-similarity. */
class DedupSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  // must match DedupQueries: min over md5(token + "#" + i)
  private def signature(tokens: Seq[String], i: Int): String =
    tokens.toDF("t")
      .select(min(md5(concat(col("t"), lit(s"#$i")))).as("m")).as[String].head()

  test("MinHash: identical token sets yield identical signatures; permutation-invariant") {
    val a = Seq("alpha", "beta", "gamma", "delta")
    val b = scala.util.Random.shuffle(a)
    (0 until 3).foreach { i =>
      assert(signature(a, i) == signature(b, i))
    }
  }

  test("MinHash banding: identical docs always share every band; disjoint docs share none") {
    val docs = Seq(
      (1L, "x y z w v u t s"),
      (2L, "x y z w v u t s"),            // exact dup of 1
      (3L, "p q r aa bb cc dd ee")        // disjoint
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val sigs = (0 until 6).foldLeft(toks) { (df, i) =>
      df.withColumn(s"mh$i", array_min(transform(col("toks"), t => md5(concat(t, lit(s"#$i"))))))
    }
    val rows = sigs.select("doc_id", "mh0", "mh1", "mh2", "mh3", "mh4", "mh5")
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getString)).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L).zip(rows(3L)).forall { case (x, y) => x != y })
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 2.0f)),
      (2L, Seq(0.0f, 3.0f, 0.0f))
    ).toDF("id", "v")
    def dot(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val self = df.filter(col("id") === 1)
      .select((dot("v", "v") / (sqrt(dot("v", "v")) * sqrt(dot("v", "v")))).as("c"))
      .as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)

    val pair = df.filter(col("id") === 1).select(col("v").as("a"))
      .crossJoin(df.filter(col("id") === 2).select(col("v").as("b")))
      .select(dot("a", "b").as("d")).as[Double].head()
    assert(pair == 0.0)
  }

  test("sign-LSH bucket: vector and its double share a bucket; negation lands elsewhere") {
    val bucketOf = (v: Seq[Float]) => {
      val df = Seq(Tuple1(v)).toDF("embedding")
      df.select((1 to 3).map(i =>
        when(element_at(col("embedding"), i) >= 0f, "1").otherwise("0"))
        .reduce(concat(_, _)).as("b")).as[String].head()
    }
    val v = Seq(0.5f, -0.2f, 0.9f)
    assert(bucketOf(v) == bucketOf(v.map(_ * 2)))
    assert(bucketOf(v) != bucketOf(v.map(-_)))
  }
}
