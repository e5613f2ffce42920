package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Model check for `x28_fuzzy_match`'s load-bearing algorithm property
  * (SymSpell, delete-neighborhood candidate generation): for ANY two
  * strings within Levenshtein distance 1, their key sets — each string
  * plus its single-character deletions — must intersect. If that
  * guarantee held only for the fixture vocabulary, a future corpus
  * could silently drop true matches (a recall bug the DuckDB oracle
  * would NOT catch, because both engines run the same key scheme).
  *
  * Checked exhaustively over a seeded random population of short
  * strings (the fixture alphabet shape), plus the converse direction
  * the levenshtein gate depends on: shared keys do NOT imply distance
  * ≤ 1 (adjacent transpositions are distance-2 candidates), so the
  * exact gate is load-bearing, not decorative.
  */
class FuzzyMatchModelSpec extends AnyFunSuite {

  private def deletionKeys(s: String): Set[String] =
    (s.indices.map(i => s.substring(0, i) + s.substring(i + 1)).toSet + s)

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = Seq(
        d(i - 1)(j) + 1, d(i)(j - 1) + 1,
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
    d(a.length)(b.length)
  }

  private val rnd = new Random(42)
  private val alphabet = "abcdefgh"
  private def word(len: Int): String =
    Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("distance <= 1 implies a shared deletion key (no candidate is ever missed)") {
    val words = (Seq.fill(300)(word(1 + rnd.nextInt(7))) ++
      Seq("scan", "scn", "sca", "scanx", "a", "ab")).distinct
    var checkedPairs = 0
    for (a <- words; b <- words if a < b && levenshtein(a, b) <= 1) {
      checkedPairs += 1
      assert(deletionKeys(a).intersect(deletionKeys(b)).nonEmpty,
        s"distance-1 pair ($a, $b) shares no key — SymSpell would miss it")
    }
    assert(checkedPairs > 50, s"population too sparse ($checkedPairs pairs) to mean anything")
  }

  test("adjacent transpositions share keys at distance 2 — the levenshtein gate is load-bearing") {
    var live = 0
    for (w <- Seq.fill(100)(word(4 + rnd.nextInt(4))); i <- 0 until w.length - 1
         if w(i) != w(i + 1)) {
      val t = w.substring(0, i) + w(i + 1) + w(i) + w.substring(i + 2)
      assert(deletionKeys(w).intersect(deletionKeys(t)).nonEmpty,
        s"transposition ($w, $t) should surface as a candidate")
      if (levenshtein(w, t) == 2) live += 1
    }
    assert(live > 50, "expected many distance-2 transposition candidates for the gate to reject")
  }

  test("every planted deletion in the query is correctable: deleting any char keeps distance 1") {
    for (w <- Seq.fill(100)(word(4 + rnd.nextInt(4))); i <- 0 until w.length) {
      val t = w.substring(0, i) + w.substring(i + 1)
      assert(levenshtein(w, t) == 1)
      assert(deletionKeys(w).intersect(deletionKeys(t)).nonEmpty)
    }
  }
}
