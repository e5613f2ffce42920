package graft

import org.apache.spark.sql.functions._

/** MinHash/LSH invariants that the oracle hash-match can't express:
  * signature determinism, near-dup banding recall on crafted docs, and
  * cosine self-similarity. */
class DedupSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  // must match DedupQueries: min over the i-th 5-hex-char slice of md5(token)
  private def signature(tokens: Seq[String], i: Int): String =
    tokens.toDF("t")
      .select(min(substring(md5(col("t")), 1 + 5 * i, 5)).as("m")).as[String].head()

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
      df.withColumn(s"mh$i", array_min(transform(col("toks"), t => substring(md5(t), 1 + 5 * i, 5))))
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

  test("word 3-gram shingles: count, content, and window order") {
    // must match DedupQueries.jaccardNgram's shingle construction
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), size(col("toks")) - 2),
          i => concat_ws(" ",
            element_at(col("toks"), i),
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2)))).as("sh"))
    val sh = df.select("sh").as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("3-gram Jaccard: shared-prefix docs score the overlap ratio exactly") {
    // doc A "a b c d", doc B "a b c e": shingles {abc,bcd} vs {abc,bce}
    // → intersection 1, union 3 → jaccard 1/3
    def shingles(text: String): Set[String] = {
      val t = text.split(" ")
      t.sliding(3).map(_.mkString(" ")).toSet
    }
    val a = shingles("a b c d"); val b = shingles("a b c e")
    val jac = (a & b).size.toDouble / (a | b).size
    assert(math.abs(jac - 1.0 / 3) < 1e-12)
  }

  test("IVF assignment: vectors go to their argmax-cosine centroid; query probes find planted neighbor") {
    import org.apache.spark.sql.expressions.Window
    // centroids along axes; v is near axis-0 centroid, w near axis-1
    val data = Seq(
      (0L, Seq(1.0f, 0.0f)), // centroid 0
      (1L, Seq(0.0f, 1.0f)), // centroid 1
      (10L, Seq(0.9f, 0.1f)), // cell 0
      (11L, Seq(0.1f, 0.9f)), // cell 1
      (12L, Seq(0.8f, 0.2f))  // cell 0
    ).toDF("vec_id", "embedding")
    def dotc(a: String, b: String) =
      aggregate(zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val base = data.withColumn("nrm", sqrt(aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)))
    val cents = base.filter(col("vec_id") < 2)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id").asc)
    val cells = base.join(cents)
      .withColumn("ccos", dotc("embedding", "c_emb") / (col("nrm") * col("c_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("vec_id", "c_id").as[(Long, Long)].collect().toMap
    assert(cells(10L) == 0L && cells(12L) == 0L && cells(11L) == 1L)
  }

  test("nearest-neighbor 4x4 resize picks exactly the stride-2 pixels of the 8x8 grid") {
    // embedding value = its own 0-based flat index → nn_sum must be the
    // sum of indices (2r)*8 + 2c for r,c in 0..3
    val emb = (0 until 64).map(_.toFloat)
    val expected = (for (r <- 0 until 4; c <- 0 until 4) yield (2 * r) * 8 + 2 * c).sum.toDouble
    val df = Seq(Tuple1(emb)).toDF("embedding")
    def px(r: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      element_at(col("embedding"), (r * 8 + c + 1).cast("int")).cast("double")
    val nn = df.select(aggregate(
      transform(sequence(lit(0), lit(15)),
        i => px((i / 4).cast("int") * 2, (i % 4) * 2)),
      lit(0.0), (acc, x) => acc + x).as("s")).as[Double].head()
    assert(nn == expected)
  }
}
