package graft

import graft.functions.{WelfordBuf, WelfordStats}
import graft.ops.TiffCodec
import org.scalacheck.{Gen, Prop, Properties}

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
