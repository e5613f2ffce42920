package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — time-series selection over the `events` fixture.
  *
  * The reference's subtlest correctness trap is A7: the NDVI loop keeps the
  * LAST valid observation (no break — /root/reference/containers/modis/
  * modis_container.py:248-258) while the LST loop keeps the FIRST valid one
  * (break at :301). Both variants are explicit `orderBy` directions here —
  * never source order (O1).
  *
  * Scale notes: latest-per-group is a single shuffle on the group key with
  * the rank filter applied map-side after sort within partitions
  * (WindowExec); at 100 TB the partition count on (user_id) keys is the
  * knob, and AQE coalesces post-shuffle. The tumbling-window agg is a plain
  * hash aggregate on (bucket, type) — no windowing state needed in batch.
  */
object TimeSeriesQueries {

  private val validValue = col("value").between(1.0, 400.0) // F9-style validity band

  /** A7 last-valid variant (NDVI semantics, modis_container.py:258):
    * newest valid observation per (user_id, event_type). */
  val a7Last = Q(
    "a7_latest_last",
    "Latest-valid-per-group argmax, LAST-valid semantics: filter validity, rank by ts DESC (event_id DESC tiebreak), keep row_number=1.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t.events
        .filter(validValue)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
    },
    Some("""SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE value BETWEEN 1.0 AND 400.0
            ) WHERE rn = 1""")
  )

  /** A7 first-valid variant (LST semantics, modis_container.py:301):
    * oldest valid observation per (user_id, event_type). */
  val a7First = Q(
    "a7_latest_first",
    "Latest-valid-per-group argmax, FIRST-valid semantics (the reference's `break` on first hit): rank by ts ASC.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t.events
        .filter(validValue)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
    },
    Some("""SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts ASC, event_id ASC) AS rn
              FROM events WHERE value BETWEEN 1.0 AND 400.0
            ) WHERE rn = 1""")
  )

  /** W1 — lookback window: effective = max(days_back, 90) days before a
    * fixed `now` param (reproducible — the reference uses wall clock,
    * modis_container.py:87-100), plus the X16 AYYYYDDD MODIS date encode. */
  val w1 = Q(
    "w1_lookback",
    "90-day-floor lookback window from a fixed reference instant + AYYYYDDD day-of-year encoding; per-type in/out-of-window counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      val now = to_timestamp(lit("2024-04-15 00:00:00"))
      val daysBack = lit(14) // < 90 → the 90-day floor wins
      val effective = greatest(daysBack, lit(90))
      t.events
        .withColumn("window_start", to_date(date_sub(now.cast("date"), 90))) // effective is constant here
        .withColumn("in_window", col("ts") >= col("window_start").cast("timestamp"))
        .withColumn("modis_date",
          concat(lit("A"), year(col("ts")), lpad(date_format(col("ts"), "D"), 3, "0")))
        .groupBy(col("event_type"), col("modis_date"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("in_window"), 1)).as("n_in_window"),
          max(col("window_start").cast("string")).as("window_start")
        )
    },
    Some("""SELECT event_type,
            concat('A', CAST(year(ts) AS VARCHAR), strftime(ts, '%j')) AS modis_date,
            count(*) AS n,
            count(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-04-15 00:00:00' - INTERVAL 90 DAY THEN 1 END) AS n_in_window,
            max(strftime(TIMESTAMP '2024-04-15 00:00:00' - INTERVAL 90 DAY, '%Y-%m-%d')) AS window_start
            FROM events
            GROUP BY event_type, concat('A', CAST(year(ts) AS VARCHAR), strftime(ts, '%j'))""")
  )

  /** W2 — general window-function surface: rank/lag/lead/moving average
    * per user ordered by time. */
  val w2 = Q(
    "w2_window_funcs",
    "Ranking + offset + sliding-frame window functions per user: row_number, prior/next value (lag/lead), 3-row moving average. One shuffle on user_id; frames evaluated in-sort.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t.events
        .filter(col("user_id") < 20)
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .withColumn("mov_avg3", round(avg(col("value")).over(w.rowsBetween(-2, 0)), 4))
        .select(col("user_id"), col("event_id"), col("rn"), col("value"),
          col("prev_value"), col("next_value"), col("mov_avg3"))
    },
    Some("""SELECT user_id, event_id,
            row_number() OVER w AS rn, value,
            lag(value, 1) OVER w AS prev_value,
            lead(value, 1) OVER w AS next_value,
            round(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
            FROM events WHERE user_id < 20
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")
  )

  /** W3 — tumbling event-time windows (batch shape; the streaming variant
    * with watermark lives in graft.streaming.EventStreamPipeline). */
  val w3 = Q(
    "w3_tumbling",
    "10-minute tumbling event-time windows per event_type: count + rounded mean; epoch-aligned buckets match time_bucket.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        // rounded SUM, not a rounded mean: fixture values have finite
        // decimal granularity, so mean = sum/n lands EXACTLY on round()
        // half boundaries (observed 25.02125 at sf0.1), where Spark's
        // shortest-decimal HALF_UP and DuckDB's binary rounding disagree.
        // Sums stay far from their own boundaries; means are exercised on
        // boundary-safe data elsewhere (w2, x28, x29).
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
    },
    Some("""SELECT time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)) AS win_start,
            event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""")
  )

  /** W3 session variant — gap-based session windows (5-minute inactivity
    * gap) per user. The oracle derives sessions relationally (lag → gap
    * flag → running sum), pinning Spark's `session_window` semantics:
    * session start = first event ts. */
  val w3Session = Q(
    "w3_session",
    "Session windows (5-min gap) per user via session_window; oracle reproduces sessionization with lag + cumulative sum island detection.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .filter(col("user_id") < 50)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("session_window.start").as("session_start"), col("user_id"),
          col("n_events"), col("sum_value"))
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '5 minutes'
                       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS new_session
              FROM events WHERE user_id < 50
            ), sess AS (
              SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                               ROWS UNBOUNDED PRECEDING) AS session_id
              FROM e
            )
            SELECT min(ts) AS session_start, user_id,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM sess GROUP BY user_id, session_id""")
  )

  /** W3 hopping variant — overlapping (sliding) event-time windows: a
    * 1-hour window hopping every 15 minutes, so each event lands in
    * exactly 4 windows. The third windowing kind next to tumbling and
    * session — the shape behind "rolling last-hour rate refreshed every
    * 15 min" dashboards. Spark expands the row to its 4 windows BEFORE
    * the aggregate (Expand + hash agg — still one shuffle, no window
    * state); the oracle derives the same membership relationally: the
    * window starts covering ts are floor15(ts) − k·15min for k=0..3.
    *
    * Scale shape: the 4× row expansion happens map-side inside Expand
    * and immediately partial-aggregates into (win, type) cells — the
    * shuffled volume is the CELL count (time-range/15min × types), not
    * 4× the corpus. Sum is exact integer cents. */
  val w3Hopping = Q(
    "w3_hopping",
    "Hopping event-time windows (1h width, 15min hop) per event_type: each event in exactly 4 windows; count + exact integer-cents sum.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .select(col("ts"), col("event_type"),
          expr("cast(round(value * 100) as long)").as("cents"))
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_cents"))
    },
    Some("""SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                - k * INTERVAL '15 minutes' AS win_start,
              event_type, count(*) AS n,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events, (SELECT unnest([0,1,2,3]) AS k)
            GROUP BY 1, 2""")
  )

  /** W2 depth — value-RANGE window frame: the rolling-hour sum is bounded
    * by the ORDER BY value (epoch seconds), not a row count — rows outside
    * the hour fall out of the frame regardless of event density. The frame
    * kind a time-series engine needs for "last N minutes" analytics; rows
    * frames approximate it only under uniform event rates. */
  val w2Range = Q(
    "w2_range_frame",
    "RANGE-frame rolling window: per-user trailing-1-hour event count and value sum, frame bounded by epoch seconds not row position.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_ms"))
        .rangeBetween(-3600000L, 0L)
      t.events
        .filter(col("user_id") < 20)
        .withColumn("epoch_ms", unix_millis(col("ts").cast("timestamp")))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .withColumn("sum_last_hour", round(sum(col("value")).over(w), 4))
        .select(col("user_id"), col("event_id"), col("epoch_ms"),
          col("n_last_hour"), col("sum_last_hour"))
    },
    Some("""SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS epoch_ms,
            count(*) OVER w AS n_last_hour,
            round(sum(value) OVER w, 4) AS sum_last_hour
            FROM events WHERE user_id < 20
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
                         RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""")
  )

  /** W2 depth — distribution window functions: quartile bucketing,
    * relative rank, and cumulative distribution per partition (the
    * percentile-style analytics layer over ordered groups). */
  val w2Dist = Q(
    "w2_distribution",
    "Distribution window functions per event_type: ntile(4) quartiles, percent_rank, cume_dist over value order.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").asc, col("event_id").asc)
      t.events
        .filter(col("user_id") < 10)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .select(col("event_type"), col("event_id"), col("quartile"),
          col("pct_rank"), col("cume"))
    },
    Some("""SELECT event_type, event_id,
            ntile(4) OVER w AS quartile,
            round(percent_rank() OVER w, 6) AS pct_rank,
            round(cume_dist() OVER w, 6) AS cume
            FROM events WHERE user_id < 10
            WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""")
  )

  /** W4 ⊕ — gap-filled hourly resampling with carry-forward: the
    * time-series densification every monitoring/feature pipeline runs
    * (downstream models want a value for EVERY bucket, not just observed
    * ones). Per user: observed hourly sums in exact integer cents, a
    * dense 720-hour grid from one tiny broadcast bound, missing buckets
    * carried forward from the last observation (`last(ignoreNulls)` over
    * an unbounded-preceding frame), leading buckets before the first
    * observation explicitly `empty`.
    *
    * Scale shape: the grid explode is per-user row-local; the only
    * shuffles key on user_id (the aggregate and the window) — at 100 TB
    * the user axis is the partition axis and the 720-bucket span is
    * bounded, so per-key work is constant. */
  val gapFill = Q(
    "w4_gap_fill",
    "Hourly gap-fill: per-user integer-cents sums on a dense sequence grid, carry-forward window fill, obs/filled/empty provenance flags.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val e = t.events
        .filter(col("user_id") < 5)
        .select(col("user_id"),
          expr("timestampdiff(HOUR, TIMESTAMP'2024-01-01 00:00:00', ts)").as("h"),
          expr("cast(round(value * 100) as long)").as("cents"))
      val hourly = e.groupBy(col("user_id"), col("h"))
        .agg(sum(col("cents")).as("v"), count(lit(1)).as("n_obs"))
      val grid = e.groupBy(col("user_id")).agg(max(col("h")).as("maxh"))
        .select(col("user_id"), explode(sequence(lit(0L), col("maxh"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("carried", last(col("v"), ignoreNulls = true).over(w))
        .select(
          col("user_id"), col("h"),
          coalesce(col("carried"), lit(0L)).as("cents"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          when(col("v").isNotNull, "obs")
            .when(col("carried").isNotNull, "filled")
            .otherwise("empty").as("kind"))
    },
    Some("""WITH e AS (
              SELECT user_id,
                     date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS h,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events WHERE user_id < 5
            ), hourly AS (
              SELECT user_id, h, CAST(sum(cents) AS BIGINT) AS v,
                     count(*) AS n_obs
              FROM e GROUP BY 1, 2
            ), grid AS (
              SELECT user_id, unnest(generate_series(0, maxh)) AS h
              FROM (SELECT user_id, max(h) AS maxh FROM e GROUP BY 1)
            ), filled AS (
              SELECT g.user_id, g.h, hourly.v, hourly.n_obs,
                last_value(hourly.v IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.h ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
              FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h
            )
            SELECT user_id, h,
                   COALESCE(carried, 0) AS cents,
                   COALESCE(n_obs, 0) AS n_obs,
                   CASE WHEN v IS NOT NULL THEN 'obs'
                        WHEN carried IS NOT NULL THEN 'filled'
                        ELSE 'empty' END AS kind
            FROM filled""")
  )

  /** W4 ⊕ — strict sequential funnel (view → click-after-view →
    * purchase-after-that-click) over the event stream: each stage's
    * entry time is the MIN event time strictly after the previous
    * stage's entry, so out-of-order occurrences don't count — the
    * product-analytics conversion query. Census output: stage
    * populations plus exact integer microsecond conversion-time sums
    * (no double accumulation).
    *
    * Scale shape: three filtered aggregates and two equi-joins, all
    * keyed on user_id; event-type filters push into the scan. */
  val funnel = Q(
    "w4_funnel",
    "Sequential funnel view->click->purchase: per-stage min-after-previous entry times, stage census + exact integer conversion-time sums.",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.events.select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("tv"))
        .groupBy(col("user_id"), col("tv")).agg(min(col("us")).as("tc"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("tc"))
        .groupBy(col("user_id"), col("tv"), col("tc")).agg(min(col("us")).as("tp"))
      val stages = v.select(col("user_id"), lit("1_view").as("stage"), lit(0L).as("lat_us"))
        .unionByName(c.select(col("user_id"), lit("2_click").as("stage"),
          (col("tc") - col("tv")).as("lat_us")))
        .unionByName(p.select(col("user_id"), lit("3_purchase").as("stage"),
          (col("tp") - col("tv")).as("lat_us")))
      stages.groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"), sum(col("lat_us")).as("total_latency_us"))
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, epoch_us(ts) AS us FROM events
            ), v AS (
              SELECT user_id, min(us) AS tv FROM e WHERE event_type = 'view' GROUP BY 1
            ), c AS (
              SELECT e.user_id, v.tv, min(us) AS tc
              FROM e JOIN v USING (user_id)
              WHERE event_type = 'click' AND us > tv GROUP BY 1, 2
            ), p AS (
              SELECT e.user_id, c.tv, c.tc, min(us) AS tp
              FROM e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND us > tc GROUP BY 1, 2, 3
            ), stages AS (
              SELECT user_id, '1_view' AS stage, 0 AS lat_us FROM v
              UNION ALL
              SELECT user_id, '2_click', tc - tv FROM c
              UNION ALL
              SELECT user_id, '3_purchase', tp - tv FROM p
            )
            SELECT stage, count(*) AS n_users,
                   CAST(sum(lat_us) AS BIGINT) AS total_latency_us
            FROM stages GROUP BY stage""")
  )

  /** W5 — exponential smoothing (EWMA, α = 1/2) over each user's event
    * sequence: s₁ = x₁, sₜ = (xₜ + sₜ₋₁)·0.5. The α = 1/2 choice makes
    * every step one IEEE add + one exact multiply-by-0.5, and the fold
    * order is pinned by (ts, event_id), so the result is bit-identical
    * across engines — the one smoothing constant that needs no float
    * tolerance.
    *
    * Scale: per-user sequences materialize via collect_list inside one
    * hash aggregate — bounded by the per-user event count, the same
    * contract as the session/funnel state machines (a streaming
    * deployment folds the same recurrence in mapGroupsWithState without
    * materializing the list; StreamingFunnel is that shape). */
  val w5Ewma = Q(
    "w5_ewma",
    "EWMA (alpha=1/2) per user over (ts, event_id)-ordered values: dyadic fold, bit-identical cross-engine; final smoothed value + count.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("seq"))
        .select(col("user_id"), size(col("seq")).as("n_events"),
          aggregate(col("seq"), lit(null).cast("double"),
            (acc, e) => when(acc.isNull, e.getField("value"))
              .otherwise((e.getField("value") + acc) * 0.5)).as("ewma"))
    },
    Some("""WITH seq AS (
              SELECT user_id, list(value ORDER BY ts, event_id) AS vs
              FROM events GROUP BY 1
            )
            SELECT user_id, len(vs) AS n_events,
              list_reduce(vs, (s, x) -> (x + s) * 0.5) AS ewma
            FROM seq""")
  )

  /** W6 — robust outlier detection per event_type: median and MAD
    * (median absolute deviation) with the LOWER-median convention
    * (element at rank ceil(n/2) in (value, event_id) order) instead of
    * the interpolating percentile — rank selection is exact and
    * engine-independent where linear interpolation differs in ulps.
    * Flags |x − med| > 3·MAD, the standard robust z-score.
    *
    * Scale: two windowed rank passes over the same event_type
    * partitioning (the second over deviations) + one census aggregate —
    * all partitioned by the group key, no global sort. */
  val w6Outliers = Q(
    "w6_robust_outliers",
    "Robust outliers per event_type: lower-median + MAD via rank selection (no interpolation), |x-med| > 3*MAD census.",
    (s, dir) => {
      val t = Tables(s, dir)
      val byVal = Window.partitionBy(col("event_type")).orderBy(col("value").asc, col("event_id").asc)
      val medOf = t.events
        .withColumn("rk", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .filter(col("rk") === ceil(col("n") / 2.0))
        .select(col("event_type"), col("value").as("med"))
      // consumed twice (MAD rank-selection + final census) — cache the
      // narrow (type, id, value, med, dev) projection instead of
      // re-running the scan + median lineage for each consumer
      val withDev = t.events
        .select(col("event_type"), col("event_id"), col("value"))
        .join(broadcast(medOf), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
        .cache()
      val byDev = Window.partitionBy(col("event_type")).orderBy(col("dev").asc, col("event_id").asc)
      val madOf = withDev
        .withColumn("rk", row_number().over(byDev))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .filter(col("rk") === ceil(col("n") / 2.0))
        .select(col("event_type"), col("dev").as("mad"))
      withDev.join(broadcast(madOf), "event_type")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          first(col("med")).as("med"),
          first(col("mad")).as("mad"),
          count(when(col("dev") > col("mad") * 3, 1)).as("n_outliers"))
    },
    Some("""WITH ranked AS (
              SELECT event_type, event_id, value,
                row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
                count(*) OVER (PARTITION BY event_type) AS n
              FROM events
            ), med AS (
              SELECT event_type, value AS med FROM ranked WHERE rk = ceil(n / 2.0)
            ), dev AS (
              SELECT e.event_type, e.event_id, abs(e.value - m.med) AS dev, m.med
              FROM events e JOIN med m USING (event_type)
            ), dranked AS (
              SELECT event_type, dev,
                row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rk,
                count(*) OVER (PARTITION BY event_type) AS n
              FROM dev
            ), mad AS (
              SELECT event_type, dev AS mad FROM dranked WHERE rk = ceil(n / 2.0)
            )
            SELECT d.event_type, count(*) AS n_events,
              max(d.med) AS med, max(m.mad) AS mad,
              count(CASE WHEN d.dev > m.mad * 3 THEN 1 END) AS n_outliers
            FROM dev d JOIN mad m USING (event_type)
            GROUP BY d.event_type""")
  )

  /** W7 — retention cohorts: users grouped by first-activity day, the
    * classic (cohort, age)-triangle of distinct active users. All
    * integer counts; the cohort assignment is one min-aggregate and the
    * triangle one distinct-count — two shuffles on user/cohort keys. */
  val w7Retention = Q(
    "w7_retention_cohorts",
    "Retention triangle: first-seen-day cohorts x day age -> distinct active users; exact integer counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      val firstSeen = t.events.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort"))
      t.events
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .join(firstSeen, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          datediff(col("day"), col("cohort")).as("age_days"))
        .agg(count_distinct(col("user_id")).as("n_active"))
    },
    Some("""WITH fs AS (
              SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort
              FROM events GROUP BY 1
            ), act AS (
              SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events
            )
            SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
              datediff('day', cohort, day) AS age_days,
              count(DISTINCT user_id) AS n_active
            FROM act JOIN fs USING (user_id)
            GROUP BY 1, 2""")
  )

  /** W8 — change detection (the SCD/compaction primitive): per user in
    * (ts, event_id) order, a row is a "change" iff its event_type
    * differs from the previous row's. One lag window per user partition,
    * then a census — the pass that turns an append log into a
    * state-transition stream, and the dedup that collapses repeated
    * identical readings at 100 TB. */
  val w8Changes = Q(
    "w8_change_detect",
    "Change detection: lag(event_type) per user over (ts, event_id) order; per-type census of rows that changed state vs repeats.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t.events
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("changed", col("prev").isNull || col("prev") =!= col("event_type"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("changed"), 1)).as("n_changes"),
          count(when(!col("changed"), 1)).as("n_repeats"))
    },
    Some("""WITH x AS (
              SELECT event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT event_type, count(*) AS n_events,
              count(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 END) AS n_changes,
              count(CASE WHEN prev = event_type THEN 1 END) AS n_repeats
            FROM x GROUP BY event_type""")
  )

  /** W9 ⊕ — seasonal-profile outliers: the deseasonalization a metrics
    * pipeline runs before alerting — a value that is normal at peak hour
    * is an anomaly at 3am, so the baseline must be the (event_type,
    * hour-of-day) profile, not a global center. Two passes, exactly like
    * w6's median/MAD: (1) profile = per-(type, hour) count + exact
    * fixed-point sum; (2) per-event deviation from its profile mean,
    * flagged when it exceeds 3× the profile's mean absolute deviation.
    *
    * Exactness discipline: v6 = floor(value·1e6) Long; the mean is
    * never divided out — deviation is the cross-multiplied
    * |v6·n − Σv6| (the q17 trick), and the threshold compares against
    * 3·(Σdev div n), all non-negative integer arithmetic, so truncating
    * div == flooring // and no double ever accumulates. The profile
    * mean is emitted as the (sum_micro, n) pair rather than a quotient
    * (Σv6 may be negative, where div and // diverge).
    *
    * Scale shape: two corpus scans, each ending in a ≤ (types×24)-group
    * aggregate; the profile tables broadcast back. Headroom: |v6| ≤
    * ~1e9 for fixture values, so v6·n holds to n ≈ 9e9 rows per
    * (type, hour) cell before the Long would need a two-level split. */
  val w9Seasonal = Q(
    "w9_seasonal_outliers",
    "Seasonal (event_type, hour-of-day) profile: exact integer mean-deviation census, outliers past 3x mean absolute deviation.",
    (s, dir) => {
      val t = Tables(s, dir)
      val e = t.events.select(col("event_type"), hour(col("ts")).as("hr"),
        floor(col("value") * 1000000L).cast("long").as("v6"))
      val prof = e.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v6")).as("s6"))
      val dev = e.join(broadcast(prof), Seq("event_type", "hr"))
        .withColumn("dev", abs(col("v6") * col("n") - col("s6")))
      val spread = dev.groupBy(col("event_type"), col("hr"))
        .agg(sum(col("dev")).as("sum_dev"))
      dev.join(broadcast(spread), Seq("event_type", "hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(first(col("n")).as("n"), first(col("s6")).as("sum_micro"),
          count(when(col("dev") > lit(3) * expr("sum_dev div n"), 1)).as("n_outliers"))
    },
    Some("""WITH e AS (
              SELECT event_type, hour(ts) AS hr,
                CAST(floor(value * 1000000) AS BIGINT) AS v6
              FROM events
            ), prof AS (
              SELECT event_type, hr, count(*) AS n, CAST(sum(v6) AS BIGINT) AS s6
              FROM e GROUP BY 1, 2
            ), dv AS (
              SELECT e.event_type, e.hr, abs(e.v6 * p.n - p.s6) AS dev, p.n, p.s6
              FROM e JOIN prof p USING (event_type, hr)
            ), sd AS (
              SELECT event_type, hr, CAST(sum(dev) AS BIGINT) AS sum_dev
              FROM dv GROUP BY 1, 2
            )
            SELECT d.event_type, d.hr, d.n, d.s6 AS sum_micro,
              count(CASE WHEN d.dev > 3 * (sd.sum_dev // d.n) THEN 1 END) AS n_outliers
            FROM dv d JOIN sd USING (event_type, hr)
            GROUP BY 1, 2, 3, 4""")
  )

  /** Multi-touch attribution — the marketing-analytics shape w4's funnel
    * doesn't cover: every `purchase` distributes its revenue across the
    * SAME user's click/view touches in the preceding hour under three
    * credit models at once — first-touch, last-touch, and linear (equal
    * split, integer cents, remainder to the last touch so every model
    * conserves revenue exactly). Purchases with no in-window touch land
    * in an explicit `unattributed` row rather than silently dropping.
    *
    * Scale shape: the 1-hour lookback is a RANGE join expressed as a
    * time-bin hash equi-join (the j7_interval_overlap trick — the
    * purchase side explodes into its 2 covering hour bins, the join key
    * is (user_id, bin)) so no nested loop ever plans; per-purchase
    * ranking windows partition by purchase id (high cardinality,
    * healthy); the census is a bounded group-by. At 100 TB the join
    * stays bounded because a user×hour cell holds few events. */
  val w10Attribution = Q(
    "w10_attribution",
    "Multi-touch attribution: 1h lookback range join (time-bin equi), first/last/linear credit in exact cents, per-touch-type census + unattributed.",
    (s, dir) => {
      val t = Tables(s, dir)
      val hourUs = 3600000000L
      val e = t.events.select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"),
          expr("cast(floor(value * 100) as long)").as("cents"))
      val touches = e.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("touch_type"),
          col("event_id").as("t_id"), col("us").as("t_us"))
      val pb = purchases.withColumn("bin",
        explode(array(expr(s"p_us div $hourUs"), expr(s"p_us div $hourUs - 1"))))
      val tb = touches.withColumn("bin", expr(s"t_us div $hourUs"))
      // cached (r13): cand feeds BOTH the ranked credit windows and the
      // unattributed anti-join — uncached, the event-scale bin join ran
      // twice (the CC jump lesson: materialize shared subtrees when they
      // are data-sized)
      val cand = pb.join(tb, Seq("user_id", "bin"))
        .filter(col("t_us") >= col("p_us") - hourUs && col("t_us") < col("p_us"))
        .cache()
      val w = Window.partitionBy(col("p_id")).orderBy(col("t_us").asc, col("t_id").asc)
      val ranked = cand
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("p_id"))))
        .select(col("touch_type"), col("p_id"), col("cents"), col("rn"), col("n"))
      val unattributed = purchases
        .join(cand.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
        .select(lit("unattributed").as("touch_type"), col("p_id"), col("cents"),
          lit(1).as("rn"), lit(1L).as("n"))
      ranked.unionByName(unattributed)
        .withColumn("first_cents", when(col("rn") === 1, col("cents")).otherwise(0L))
        .withColumn("last_cents", when(col("rn") === col("n"), col("cents")).otherwise(0L))
        .withColumn("linear_cents",
          expr("cents div n + CASE WHEN rn = n THEN cents % n ELSE 0L END"))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("p_id")).as("n_purchases"),
          sum(col("first_cents")).as("first_cents"),
          sum(col("last_cents")).as("last_cents"),
          sum(col("linear_cents")).as("linear_cents"))
        .orderBy(col("touch_type"))
    },
    Some("""WITH e AS (
              SELECT user_id, event_type, event_id, epoch_us(ts) AS us, value FROM events
            ), p AS (
              SELECT user_id, event_id AS p_id, us AS p_us,
                CAST(floor(value * 100) AS BIGINT) AS cents
              FROM e WHERE event_type = 'purchase'
            ), t AS (
              SELECT user_id, event_type AS touch_type, event_id AS t_id, us AS t_us
              FROM e WHERE event_type IN ('click', 'view')
            ), cand AS (
              SELECT t.touch_type, p.p_id, p.cents, t.t_us, t.t_id
              FROM p JOIN t ON p.user_id = t.user_id
                AND t.t_us >= p.p_us - 3600000000 AND t.t_us < p.p_us
            ), ranked AS (
              SELECT touch_type, p_id, cents,
                row_number() OVER (PARTITION BY p_id ORDER BY t_us ASC, t_id ASC) AS rn,
                count(*) OVER (PARTITION BY p_id) AS n
              FROM cand
            ), unattr AS (
              SELECT 'unattributed' AS touch_type, p_id, cents, 1 AS rn, 1 AS n
              FROM p WHERE p_id NOT IN (SELECT p_id FROM cand)
            ), credits AS (
              SELECT touch_type, p_id, cents, rn, n FROM ranked
              UNION ALL
              SELECT touch_type, p_id, cents, rn, n FROM unattr
            )
            SELECT touch_type,
              count(*) AS n_touches,
              count(DISTINCT p_id) AS n_purchases,
              CAST(sum(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT) AS first_cents,
              CAST(sum(CASE WHEN rn = n THEN cents ELSE 0 END) AS BIGINT) AS last_cents,
              CAST(sum(cents // n + CASE WHEN rn = n THEN cents % n ELSE 0 END) AS BIGINT) AS linear_cents
            FROM credits GROUP BY 1 ORDER BY 1""")
  )

  /** Cross-series co-movement census — do two event types rise and fall
    * together hour-to-hour? The Pearson numerator n·Σxy − Σx·Σy over
    * each type-pair's co-observed hourly counts, kept as EXACT integers
    * (the full correlation needs two libm sqrts; the numerator alone
    * already carries the sign and ordering of the relationship, which is
    * what an alerting rule thresholds on). Pairs are ordered type_a <
    * type_b; only hours where BOTH series have events count (inner
    * join — absent-as-zero is a different estimator, documented choice).
    *
    * Scale shape: the hourly census collapses the corpus to a bounded
    * (type × hour) table FIRST (map-side combinable), and the pair
    * self-join runs on that census keyed by hour — never on events. At
    * 100 TB the join input is |types|·|hours| rows regardless of event
    * count. */
  val w11Comovement = Q(
    "w11_comovement",
    "Pairwise co-movement of hourly event-type series: exact integer Pearson numerator n*Sxy - Sx*Sy per type pair over co-observed hours.",
    (s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000L").as("hour"))
        .agg(count(lit(1)).as("c"))
      val a = hourly.select(col("event_type").as("type_a"), col("hour"), col("c").as("x"))
      val b = hourly.select(col("event_type").as("type_b"), col("hour"), col("c").as("y"))
      a.join(b, Seq("hour")).filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(
          count(lit(1)).as("n_hours"),
          sum(col("x") * col("y")).as("sum_xy"),
          sum(col("x")).as("sum_x"),
          sum(col("y")).as("sum_y"))
        .select(col("type_a"), col("type_b"), col("n_hours"),
          (col("n_hours") * col("sum_xy") - col("sum_x") * col("sum_y")).as("cov_num"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""WITH hourly AS (
              SELECT event_type, epoch_us(ts) // 3600000000 AS hour, count(*) AS c
              FROM events GROUP BY 1, 2
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
              count(*) AS n_hours,
              CAST(count(*) * sum(a.c * b.c) - sum(a.c) * sum(b.c) AS BIGINT) AS cov_num
            FROM hourly a JOIN hourly b
              ON a.hour = b.hour AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** W12 extension — first-order Markov transition matrix over user
    * event sequences (the user-journey model behind next-action
    * prediction, funnel simulation, and anomalous-session scoring):
    * for each user's time-ordered stream, consecutive (prev → next)
    * event-type pairs are extracted with ONE lag window partitioned by
    * user, censused into the |types|² transition matrix, and
    * row-normalized to exact basis-point probabilities (integer div —
    * no cross-engine float risk). The plan is one user-keyed window
    * shuffle plus a bounded 25-cell aggregate; at 100 TB the window
    * partitions by user exactly like the funnel/retention family, and
    * the matrix itself never exceeds |event types|². */
  val markovTransitions = Q(
    "w12_markov_transitions",
    "Markov transition matrix: per-user lag pairs via one partitioned window, 25-cell census, exact basis-point row-normalized probabilities.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      t.events
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total",
          sum(col("n")).over(Window.partitionBy(col("prev_type"))))
        .withColumn("p_bp", expr("n * 10000 div row_total"))
        .select(col("prev_type"), col("next_type"), col("n"), col("p_bp"))
    },
    Some("""WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
            ), p AS (
              SELECT event_type AS next_type,
                lag(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY us, event_id) AS prev_type
              FROM e
            ), c AS (
              SELECT prev_type, next_type, count(*) AS n
              FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT prev_type, next_type, n,
              CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_bp
            FROM c""")
  )

  def all: Seq[Q] = Seq(a7Last, a7First, w1, w2, w2Range, w2Dist, w3, w3Session, w3Hopping,
    gapFill, funnel, w5Ewma, w6Outliers, w7Retention, w8Changes, w9Seasonal,
    w10Attribution, w11Comovement, markovTransitions)
}
