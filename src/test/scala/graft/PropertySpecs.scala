package graft

import graft.functions.{WelfordBuf, WelfordStats}
import graft.ops.TiffCodec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property-based tests (SURVEY §5.3) — the algebraic laws the engine's
  * custom kernels rely on, checked over generated inputs rather than
  * hand-picked vectors. Pure JVM (no SparkSession): these are the
  * per-partition kernels themselves.
  */
object TiffCodecProps extends Properties("TiffCodec") {

  private val genGrid: Gen[Array[Array[Double]]] = for {
    h <- Gen.choose(1, 24)
    w <- Gen.choose(1, 24)
    cells <- Gen.listOfN(h * w, Gen.chooseNum(-1e6, 1e6))
  } yield cells.grouped(w).map(_.toArray).toArray

  property("decode(encode(g)) is the identity on grids") = Prop.forAll(genGrid) { g =>
    val r = TiffCodec.decode(TiffCodec.encode(g)).get
    r.height == g.length && r.width == g(0).length &&
      g.indices.forall(row => g(row).indices.forall(col => r.at(row, col) == g(row)(col)))
  }

  property("any truncation of a valid tiff decodes to None, never throws") =
    Prop.forAll(genGrid, Gen.choose(0.0, 0.99)) { (g, frac) =>
      val full = TiffCodec.encode(g)
      TiffCodec.decode(full.take((full.length * frac).toInt)).isEmpty
    }

  property("random bytes never decode to a raster (no false positives at small sizes)") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(Byte.MinValue, Byte.MaxValue))) { bs =>
      TiffCodec.decode(bs.toArray).isEmpty
    }

  private val genLayout: Gen[(Int, Int, Option[(Int, Int)])] = Gen.oneOf(
    (TiffCodec.CompLzw, 0, None), (TiffCodec.CompLzw, 3, None),
    (TiffCodec.CompDeflate, 0, None), (TiffCodec.CompDeflate, 5, None),
    (TiffCodec.CompPackBits, 0, None),
    (TiffCodec.CompLzw, 0, Some((16, 16))), (TiffCodec.CompDeflate, 0, Some((16, 16))))

  property("decode(encodeEx(g)) is the identity across compressed/tiled layouts") =
    Prop.forAll(genGrid, genLayout) { case (g, (comp, rps, tile)) =>
      val r = TiffCodec.decode(
        TiffCodec.encodeEx(g, compression = comp, rowsPerStrip = rps, tile = tile)).get
      r.height == g.length && r.width == g(0).length &&
        g.indices.forall(row => g(row).indices.forall(col => r.at(row, col) == g(row)(col)))
    }

  property("integer-predictor layouts roundtrip (LZW and deflate)") =
    Prop.forAll(
      Gen.choose(1, 20), Gen.choose(1, 20),
      Gen.oneOf(TiffCodec.CompLzw, TiffCodec.CompDeflate),
      Gen.choose(0L, 1L << 30)) { (h, w, comp, seed) =>
      val rnd = new scala.util.Random(seed)
      val g = Array.fill(h, w)(rnd.nextInt(65536).toDouble)
      val r = TiffCodec.decode(TiffCodec.encodeEx(
        g, compression = comp, bits = 16, fmt = 1, predictor = 2)).get
      g.indices.forall(row => g(row).indices.forall(col => r.at(row, col) == g(row)(col)))
    }
}

object WelfordProps extends Properties("WelfordStats") {

  private val genXs: Gen[List[Double]] = Gen.nonEmptyListOf(Gen.chooseNum(-1e4, 1e4))

  private def fold(xs: Seq[Double]): WelfordBuf =
    xs.foldLeft(WelfordStats.zero)(WelfordStats.reduce)

  private def close(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  property("merge(fold(xs), fold(ys)) == fold(xs ++ ys) for the statistic") =
    Prop.forAll(genXs, genXs) { (xs, ys) =>
      val merged = WelfordStats.finish(WelfordStats.merge(fold(xs), fold(ys)))
      val direct = WelfordStats.finish(fold(xs ++ ys))
      merged.n == direct.n && close(merged.mean, direct.mean) &&
        close(merged.variance_pop, direct.variance_pop)
    }

  property("split point never changes the result (partition independence)") =
    Prop.forAll(genXs, Gen.choose(0, 1000)) { (xs, k) =>
      val cut = k % (xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val a = WelfordStats.finish(WelfordStats.merge(fold(l), fold(r)))
      val b = WelfordStats.finish(fold(xs))
      close(a.mean, b.mean) && close(a.variance_pop, b.variance_pop)
    }

  property("matches the two-pass textbook formula") = Prop.forAll(genXs) { xs =>
    val out = WelfordStats.finish(fold(xs))
    val mean = xs.sum / xs.length
    val varPop = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    close(out.mean, mean) && close(out.variance_pop, varPop)
  }
}

object ValidatorProps extends Properties("Validators") {

  // Pure mirror of the F1/F2 predicates (CollectPipeline.validate);
  // soundness: everything accepted lies inside the declared region union.
  private def inBounds(lat: Double, lon: Double): Boolean =
    lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180 && !(lat == 0 && lon == 0)
  private def inUs(lat: Double, lon: Double): Boolean =
    (lat >= 24.5 && lat <= 49.5 && lon >= -125 && lon <= -67) ||
      (lat >= 54 && lat <= 71.5 && ((lon >= -180 && lon <= -130) || (lon >= 170 && lon <= 180))) ||
      (lat >= 18 && lat <= 29 && lon >= -178 && lon <= -154)

  private val genCoord = Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(-200.0, 200.0))

  property("acceptance implies membership in one of the three region rectangles") =
    Prop.forAll(genCoord) { case (lat, lon) =>
      val accepted = inBounds(lat, lon) && inUs(lat, lon)
      !accepted || {
        val conus = lat >= 24.5 && lat <= 49.5 && lon >= -125 && lon <= -67
        val ak = lat >= 54 && lat <= 71.5 && (math.abs(lon) >= 130 && math.abs(lon) <= 180)
        val hi = lat >= 18 && lat <= 29 && lon >= -178 && lon <= -154
        conus || ak || hi
      }
    }

  property("region membership implies valid geographic bounds (no region outside the globe)") =
    Prop.forAll(genCoord) { case (lat, lon) =>
      !inUs(lat, lon) || (lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180)
    }
}

object DownsampleProps extends Properties("Downsample") {
  // pure mirrors of m3_resize_pool's kernels over an 8x8 row-major grid
  private def nnSum(g: IndexedSeq[Float]): Double =
    (for (r <- 0 until 4; c <- 0 until 4) yield g((2 * r) * 8 + 2 * c).toDouble).sum
  private def poolSum(g: IndexedSeq[Float]): Double =
    (for (r <- 0 until 4; c <- 0 until 4) yield {
      val b = (2 * r) * 8 + 2 * c
      math.max(math.max(g(b), g(b + 1)), math.max(g(b + 8), g(b + 9))).toDouble
    }).sum

  private val genGrid: Gen[IndexedSeq[Float]] =
    Gen.containerOfN[Vector, Float](64, Gen.chooseNum(-100f, 100f))

  property("max-pool dominates nearest-neighbor (nn picks a member of each pooled block)") =
    Prop.forAll(genGrid) { g => poolSum(g) >= nnSum(g) }

  property("both downsamples are invariant to values outside their support/blocks") =
    Prop.forAll(genGrid) { g =>
      // constant grid: both reduce to 16 * value
      val v = g.head
      val const = Vector.fill(64)(v)
      math.abs(nnSum(const) - 16.0 * v) < 1e-3 * math.max(1.0, math.abs(16.0 * v)) &&
        math.abs(poolSum(const) - 16.0 * v) < 1e-3 * math.max(1.0, math.abs(16.0 * v))
    }
}

object TokenizerProps extends Properties("Tokenizer") {
  // pure mirror of x28_token_count's regexes
  private val ws = "\\S+".r
  private val subword = "[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\\s]".r
  private def wsTokens(s: String) = ws.findAllIn(s).length
  private def pieces(s: String) = subword.findAllIn(s.toLowerCase).length

  private val genWord = Gen.choose(1, 12).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val genText = Gen.choose(0, 30).flatMap(n =>
    Gen.listOfN(n, genWord).map(_.mkString(" ")))

  property("fertility >= 1: every whitespace token yields at least one subword piece") =
    Prop.forAll(genText) { t => pieces(t) >= wsTokens(t) }

  property("piece count is ceil(len/4) summed per word for pure alpha text") =
    Prop.forAll(genText) { t =>
      val expected = ws.findAllIn(t).map(w => (w.length + 3) / 4).sum
      pieces(t) == expected
    }
}

object AucProps extends Properties("AucCensus") {
  // Pure mirror of a13_auc_score's census formula: per-value (pc, nc)
  // counts, cumulative negatives below, u2 = Σ pc·(2·cumneg + nc) —
  // model-checked against the naive O(n²) Mann-Whitney pair count
  // (2·wins + ties), including heavy-tie configurations the narrow
  // value domain deliberately generates.
  private val genData = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(0, 12), Gen.oneOf(true, false)))

  property("census u2 equals naive pairwise 2*wins + ties") =
    Prop.forAll(genData) { xs =>
      val pos = xs.collect { case (v, true) => v }
      val neg = xs.collect { case (v, false) => v }
      (pos.nonEmpty && neg.nonEmpty) ==> {
        val naive2U = pos.iterator.map { p =>
          2L * neg.count(p > _) + neg.count(p == _)
        }.sum
        val values = xs.map(_._1).distinct.sorted
        val pc = values.map(v => pos.count(_ == v).toLong)
        val nc = values.map(v => neg.count(_ == v).toLong)
        val cum = nc.scanLeft(0L)(_ + _) // cum(i) = negatives strictly below values(i)
        val u2 = values.indices.map(i => pc(i) * (2 * cum(i) + nc(i))).sum
        u2 == naive2U
      }
    }

  property("auc is symmetric: swapping classes mirrors u2 around 2*n_pos*n_neg") =
    Prop.forAll(genData) { xs =>
      val pos = xs.collect { case (v, true) => v }
      val neg = xs.collect { case (v, false) => v }
      (pos.nonEmpty && neg.nonEmpty) ==> {
        def u2(a: List[Int], b: List[Int]): Long =
          a.iterator.map(p => 2L * b.count(p > _) + b.count(p == _)).sum
        u2(pos, neg) + u2(neg, pos) == 2L * pos.size * neg.size
      }
    }
}

object AmsSketchProps extends Properties("AmsSketch") {
  // Pure mirror of a11_join_size_sketch's estimator: est = Σ_b S_b²
  // with S_b = Σ_{k∈b} s_k·cnt_k. Model-checked invariants that hold
  // for EVERY bucket/sign assignment (not just in expectation):
  private val genCounts = Gen.nonEmptyListOf(Gen.choose(1L, 50L)).map(_.take(40))

  private def estimate(cnts: List[Long], bucket: Int => Int, sign: Int => Long): Long =
    cnts.indices.groupBy(bucket).values.map { ks =>
      val s = ks.map(i => sign(i) * cnts(i)).sum
      s * s
    }.sum

  property("collision-free rows estimate F2 exactly, for any signs") =
    Prop.forAll(genCounts, Gen.listOfN(40, Gen.oneOf(-1L, 1L))) { (cnts, signs) =>
      val f2 = cnts.map(c => c * c).sum
      estimate(cnts, i => i, i => signs(i % signs.size)) == f2
    }

  property("global sign flip never changes the estimate") =
    Prop.forAll(genCounts, Gen.listOfN(40, Gen.oneOf(-1L, 1L)),
      Gen.listOfN(40, Gen.choose(0, 7))) { (cnts, signs, buckets) =>
      def b(i: Int) = buckets(i % buckets.size)
      def s(i: Int) = signs(i % signs.size)
      estimate(cnts, b, s) == estimate(cnts, b, i => -s(i))
    }

  property("estimate never drops below the self-bucket floor when each bucket is pure-sign") =
    Prop.forAll(genCounts) { cnts =>
      // all keys one bucket, all signs +1: est = (Σcnt)² >= Σcnt² = F2
      val f2 = cnts.map(c => c * c).sum
      estimate(cnts, _ => 0, _ => 1L) >= f2
    }
}

object IntervalUnionProps extends Properties("IntervalUnion") {
  // Pure mirror of j7_interval_union's gaps-and-islands window logic,
  // model-checked against brute-force point-set interval union.
  private val Len = 30L
  private val genStarts = Gen.nonEmptyListOf(Gen.choose(0L, 300L)).map(_.take(30))

  private def islandsCoverage(starts: List[Long]): (Int, Long) = {
    val iv = starts.sorted.map(s => (s, s + Len))
    // the window recurrence: new island iff start > running max end
    var maxEnd = Long.MinValue
    var islands = List.empty[(Long, Long)] // (start, end) per island
    for ((s, e) <- iv) {
      if (islands.isEmpty || s > maxEnd) islands = (s, e) :: islands
      else {
        val (is, ie) = islands.head
        islands = (is, math.max(ie, e)) :: islands.tail
      }
      maxEnd = math.max(maxEnd, e)
    }
    (islands.size, islands.map { case (s, e) => e - s }.sum)
  }

  property("island coverage equals brute-force interval union measure") =
    Prop.forAll(genStarts) { starts =>
      val (_, cov) = islandsCoverage(starts)
      // brute force: count half-open unit cells covered by any interval
      val cells = starts.flatMap(s => s until (s + Len)).toSet
      cov == cells.size.toLong
    }

  property("island count equals the number of maximal gap-free runs") =
    Prop.forAll(genStarts) { starts =>
      val (n, _) = islandsCoverage(starts)
      val sorted = starts.sorted
      // a new run starts when the gap to the previous covered end exceeds 0
      var runs = 0; var end = Long.MinValue
      for (s <- sorted) { if (s > end) runs += 1; end = math.max(end, s + Len) }
      n == runs
    }
}
