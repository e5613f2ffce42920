package graft

import graft.functions.CdcBoundaries
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unit proofs for the native rolling-hash CDC boundary expression:
  * the O(n) rolling recurrence equals the closed-form window hash at
  * every position; edge cases; the shift-resilience property that makes
  * CDC worth having over fixed windows; and codegen/eval agreement
  * through a real DataFrame. */
class CdcBoundariesSpec extends SparkSpecBase {

  private def kernel(s: String): Seq[Int] =
    CdcBoundaries.kernel(UTF8String.fromString(s)).toIntArray().toSeq

  /** Closed-form reference: full window re-hash at each position. */
  private def bruteForce(s: String): Seq[Int] = {
    val M = 1 << 20
    (8 until s.length).filter { p =>
      val h = (0 until 8).foldLeft(0L)((acc, k) => (acc * 31 + s.charAt(p - 8 + k)) % M)
      h % 37 == 0
    }
  }

  test("rolling recurrence equals the closed-form window hash on seeded random text") {
    val rnd = new scala.util.Random(42)
    for (len <- Seq(0, 1, 8, 9, 20, 100, 1000); trial <- 1 to 5) {
      val s = (1 to len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      assert(kernel(s) == bruteForce(s), s"len=$len trial=$trial")
    }
  }

  test("strings at or below the window length have no boundaries") {
    for (s <- Seq("", "a", "12345678"))
      assert(kernel(s).isEmpty)
  }

  test("an insertion shifts only boundaries; positions re-synchronize past the edit") {
    val rnd = new scala.util.Random(7)
    val s = (1 to 2000).map(_ => (97 + rnd.nextInt(26)).toChar).mkString
    val edited = s.substring(0, 10) + "X" + s.substring(10)
    val orig = kernel(s).toSet
    val after = kernel(edited)
    // every boundary strictly past the edit's influence window (position
    // 10 + window 8) must be an original boundary shifted by exactly 1 —
    // fixed-size windows lose ALL alignments after an insertion
    val past = after.filter(_ > 19)
    assert(past.nonEmpty, "fixture text produced no post-edit boundaries")
    assert(past.forall(p => orig.contains(p - 1)),
      "rolling boundaries failed to re-synchronize after a single-char insertion")
  }

  test("codegen path through a DataFrame equals the kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val rows = (1 to 50).map { i =>
      (i.toLong, (1 to 200).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val out = rows.toDF("id", "text")
      .select(col("id"), expr("cdc_boundaries(text)").as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap
    for ((id, text) <- rows)
      assert(out(id) == kernel(text), s"id=$id")
  }
}
