package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the trickiest reference semantics called out in SURVEY.md §5:
  * A7 first-vs-last argmax, F2 antimeridian, X7 center-index, X9
  * boundary exclusivity, X14 default label, F6 repeated digits. */
class OperatorSemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("A7: last-valid vs first-valid argmax differ exactly as the reference loops do") {
    // modis_container.py:248-258 (no break → LAST valid wins) vs :287-301
    // (break → FIRST valid wins). Valid band: value in [0, 1].
    val ts = Seq(
      ("g", "2024-01-01", 0.5),  // valid, earliest
      ("g", "2024-01-02", 5.0),  // invalid
      ("g", "2024-01-03", 0.7),  // valid, latest
      ("g", "2024-01-04", 9.0)   // invalid
    ).toDF("grp", "d", "v").filter(col("v").between(0, 1))

    val lastValid = ts.withColumn("rn",
      row_number().over(Window.partitionBy("grp").orderBy(col("d").desc)))
      .filter(col("rn") === 1).select("d").as[String].collect()
    val firstValid = ts.withColumn("rn",
      row_number().over(Window.partitionBy("grp").orderBy(col("d").asc)))
      .filter(col("rn") === 1).select("d").as[String].collect()

    assert(lastValid.toSeq == Seq("2024-01-03")) // NDVI semantics
    assert(firstValid.toSeq == Seq("2024-01-01")) // LST semantics
  }

  test("F2: Alaska region spans the antimeridian (orchestrator.py:107)") {
    val inUs = (lat: Double, lon: Double) => {
      val df = Seq((lat, lon)).toDF("lat", "lon")
      df.select((col("lat").between(54, 71.5) &&
        (col("lon").between(-180, -130) || col("lon").between(170, 180))).as("ak"))
        .as[Boolean].head()
    }
    assert(inUs(55.0, 178.0))   // east of the antimeridian — Aleutians
    assert(inUs(62.0, -150.0))  // mainland Alaska
    assert(!inUs(52.0, -176.0)) // below the 54N floor
    assert(!inUs(55.0, 160.0))  // Kamchatka side
  }

  test("X7: center index is len/2 zero-based == floor(len/2)+1 one-based (modis_container.py:253)") {
    val df = Seq(
      (Seq(10.0, 20.0, 30.0, 40.0, 50.0), 30.0), // odd: idx 2
      (Seq(10.0, 20.0, 30.0, 40.0), 30.0),       // even: idx 2 (len//2)
      (Seq(7.0), 7.0)                            // single: idx 0
    ).toDF("arr", "expect")
    val got = df.withColumn("center",
      element_at(col("arr"), (floor(size(col("arr")) / 2) + 1).cast("int")))
      .filter(col("center") =!= col("expect")).count()
    assert(got == 0)
  }

  test("X9: risk boundaries are exclusive (weather_container.py:202-223)") {
    // At exactly 30C/20%/15mps each factor takes the SECOND bucket.
    val df = Seq((30.0, 20, 15.0)).toDF("t", "h", "w")
    val score = df.select((
      when(col("t") > 30, 3).when(col("t") > 25, 2).when(col("t") > 20, 1).otherwise(0) +
        when(col("h") < 20, 3).when(col("h") < 40, 2).when(col("h") < 60, 1).otherwise(0) +
        when(col("w") > 15, 3).when(col("w") > 10, 2).when(col("w") > 5, 1).otherwise(0)).as("s"))
      .as[Int].head()
    assert(score == 6) // 2+2+2, NOT 9
  }

  test("X10: vegetation health is monotone non-increasing in stress as NDVI rises") {
    val order = Map("SEVERELY_STRESSED" -> 0, "STRESSED" -> 1, "MODERATE" -> 2, "HEALTHY" -> 3)
    val ndvi = (-100 to 100).map(_ / 100.0)
    val classes = ndvi.toDF("n").select(
      when(col("n") > 0.6, "HEALTHY").when(col("n") > 0.3, "MODERATE")
        .when(col("n") > 0.1, "STRESSED").otherwise("SEVERELY_STRESSED").as("c"))
      .as[String].collect()
    assert(classes.map(order).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("X14: unmatched pixel values get the literal 'Unknown (v)' label (landfire_container.py:132)") {
    val df = Seq(12345).toDF("pixel_value")
    val label = df.select(
      coalesce(lit(null).cast("string"),
        concat(lit("Unknown ("), col("pixel_value"), lit(")"))).as("l"))
      .as[String].head()
    assert(label == "Unknown (12345)")
  }

  test("F6: 5+ consecutive identical digits rejected; <4-digit strings skip the check") {
    val repeated = (0 to 9).map(d => s"$d{5}").mkString("|")
    val check = (coord: Double) => {
      val df = Seq(coord).toDF("c")
      df.select((
        !regexp_replace(
          regexp_replace(regexp_replace(format_string("%.10f", col("c")), "0+$", ""), "\\.$", ""),
          "[.-]", "").rlike(repeated) ||
          length(regexp_replace(
            regexp_replace(regexp_replace(format_string("%.10f", col("c")), "0+$", ""), "\\.$", ""),
            "[.-]", "")) < 4).as("ok"))
        .as[Boolean].head()
    }
    assert(!check(34.55555))  // digits 3455555 contain 55555
    assert(check(34.0522))
    assert(check(1.23))       // 3 digits → pattern check skipped
  }
}
