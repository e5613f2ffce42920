package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the temporal lookup a time-series engine needs
  * ("for each probe row, the newest build row at or before it, per key")
  * that Spark has no built-in operator for.
  *
  * Spark-first shape (SURVEY §4): a naive formulation is a non-equi range
  * join (`p.ts >= b.ts` + per-key argmax), which Catalyst can only plan as
  * BroadcastNestedLoop/cartesian-per-key — O(|probe|·|build|) within each
  * key and a non-starter at 100 TB. Instead, UNION the two sides and take
  * one window pass: tag build rows side=0 and probe rows side=1, sort each
  * key's rows by (ts, side), and carry the last non-null build payload
  * forward (`last(..., ignoreNulls)` over UNBOUNDED PRECEDING..CURRENT).
  * Every probe row then holds exactly the newest build row with
  * `build.ts <= probe.ts`. Cost: ONE hash shuffle on the key + an in-sort
  * window — the same plan class as latest-per-group (A7), linear in
  * |probe| + |build|, skew governed by the key distribution alone.
  *
  * Determinism: multiple build rows sharing (key, ts) would make "the"
  * as-of row ambiguous (DuckDB's ASOF JOIN leaves the pick unspecified),
  * so callers must pre-aggregate the build side to one row per (key, ts)
  * — argmax by a tiebreak column, as `graft.queries.CoreQueries.j6` does.
  */
object AsOfJoin {

  /** Left backward as-of join: every `probe` row, joined to the newest
    * `build` row with the same `keys` and `build(tsCol) <= probe(tsCol)`;
    * probe rows with no such build row keep null as-of columns.
    *
    * `build` must be unique per (keys, tsCol). The build columns named in
    * `buildPayload` (which must exclude the keys) are emitted as
    * `asof_<name>`, plus `asof_ts` = the matched build row's timestamp.
    *
    * `tolerance` (optional) bounds the match window: a backward match
    * further than `tolerance` before the probe row is nulled out (the
    * "don't join to stale state" guard). Express it in the timestamp
    * column's algebra — `expr("INTERVAL 7 DAYS")` for timestamps,
    * `lit(10L)` for numeric event times.
    */
  def leftBackward(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      buildPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(probe, build, keys, tsCol, buildPayload, forward = false, tolerance)

  /** Left forward as-of join: the EARLIEST build row at or after each
    * probe row per key (the "next event" lookup) — the time-mirrored
    * traversal of [[leftBackward]], same single-shuffle cost. */
  def leftForward(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      buildPayload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asOf(probe, build, keys, tsCol, buildPayload, forward = true, tolerance)

  private def asOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      tsCol: String,
      buildPayload: Seq[String],
      forward: Boolean,
      tolerance: Option[Column]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    require(!buildPayload.exists(keys.contains),
      s"buildPayload must not repeat the keys, got $buildPayload vs $keys")
    val probeCols = probe.columns.toSeq
    val payload = buildPayload :+ tsCol

    // Align the two sides on one schema: keys + event time + side tag +
    // the probe row as a struct (null on build rows) + the build payload
    // (null on probe rows).
    val probeSide = probe.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(probeCols.map(col): _*).as("__probe")) ++
        payload.map(c => lit(null).cast(build.schema(c).dataType).as(s"__b_$c")): _*)
    val buildSide = build.select(
      keys.map(col) ++ Seq(
        col(tsCol).cast(probe.schema(tsCol).dataType).as("__ts"), lit(0).as("__side"),
        lit(null).cast(probeSide.schema("__probe").dataType).as("__probe")) ++
        payload.map(c => col(c).as(s"__b_$c")): _*)

    // side ASC puts a build row BEFORE probe rows at the same instant, so
    // equal timestamps match (the `>=`/`<=` in ASOF semantics). Forward
    // direction = the same carry-forward traversal over REVERSED time:
    // the last build seen walking ts DESC is the earliest at-or-after.
    val ord = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The build side is unique per (keys, ts), so `last(..., ignoreNulls)`
    // of each payload column under ONE ordering reads the SAME build row —
    // the emitted as-of columns are mutually consistent.
    val carried = probeSide.unionByName(buildSide)
      .select(
        col("__side") +: col("__probe") +:
          payload.map(c => last(col(s"__b_$c"), ignoreNulls = true).over(w)
            .as(if (c == tsCol) "asof_ts" else s"asof_$c")): _*)

    val joined = carried.filter(col("__side") === 1)
      .select(probeCols.map(c => col(s"__probe.$c").as(c)) ++
        (buildPayload.map(c => col(s"asof_$c")) :+ col("asof_ts")): _*)
    tolerance.fold(joined) { tol =>
      val within =
        if (forward) col("asof_ts") <= col(tsCol) + tol
        else col("asof_ts") >= col(tsCol) - tol
      val asofCols = buildPayload.map(c => s"asof_$c") :+ "asof_ts"
      asofCols.foldLeft(joined)((df, c) =>
        df.withColumn(c, when(within, col(c))))
    }
  }
}
