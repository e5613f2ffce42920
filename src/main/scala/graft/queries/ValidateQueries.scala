package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — the reference's request-validation surface (F1–F7, F11)
  * as pure `Column` predicates over inline test-vector tables.
  *
  * Semantics transcribed from /root/reference/containers/orchestrator/
  * orchestrator.py:89-234 and containers/shared_schema.py:276-304. Each
  * query emits the vector plus per-rule booleans so the DuckDB oracle
  * hash-pins every branch (including the Alaska antimeridian arm and the
  * repeated-digit pattern, which uses an RE2-safe alternation — DuckDB's
  * regex engine has no backreferences).
  *
  * Scale note: these are stateless row-local predicates — they fuse into
  * whole-stage codegen directly over the scan, shuffle nothing, and push
  * down wherever Catalyst can reach the source. At 100 TB they are the
  * cheapest operators in the engine.
  */
object ValidateQueries {

  /** F1 — coordinate bounds: lat∈[-90,90] ∧ lon∈[-180,180] ∧ ¬(0,0)
    * (orchestrator.py:89-100). */
  val f1 = Q(
    "f1_coord_bounds",
    "Coordinate bounds filter incl. the (0,0) null-island reject; boundary values are inclusive.",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, 34.0522, -118.2437), // LA — valid
        (2, 91.0, 10.0),         // lat out of range
        (3, 10.0, -181.0),       // lon out of range
        (4, 0.0, 0.0),           // null island
        (5, 90.0, 180.0),        // inclusive boundary — valid
        (6, -90.0, -180.0)       // inclusive boundary — valid
      ).toDF("id", "lat", "lon")
        .withColumn("in_bounds",
          col("lat").between(-90, 90) && col("lon").between(-180, 180))
        .withColumn("not_null_island", !(col("lat") === 0 && col("lon") === 0))
        .withColumn("valid", col("in_bounds") && col("not_null_island"))
    },
    Some("""SELECT id, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon,
            (lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180) AS in_bounds,
            NOT (lat = 0 AND lon = 0) AS not_null_island,
            (lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180)
              AND NOT (lat = 0 AND lon = 0) AS valid
            FROM (VALUES (1, 34.0522, -118.2437), (2, 91.0, 10.0), (3, 10.0, -181.0),
                         (4, 0.0, 0.0), (5, 90.0, 180.0), (6, -90.0, -180.0)) AS t(id, lat, lon)""")
  )

  /** F2 — US-region membership: CONUS ∨ Alaska (antimeridian split) ∨ Hawaii
    * (orchestrator.py:102-111). */
  val f2 = Q(
    "f2_us_region",
    "US-region filter: 3 rectangles; the Alaska longitude test is a disjunction across the antimeridian ([-180,-130] ∪ [170,180]).",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, 34.0522, -118.2437), // LA → CONUS
        (2, 51.5074, -0.1278),   // London → none
        (3, 62.0, -150.0),       // Anchorage → Alaska (western arm)
        (4, 55.0, 178.0),        // Aleutians east of antimeridian → Alaska
        (5, 52.0, -176.0),       // Aleutian latitude below 54 → none
        (6, 20.0, -156.0),       // Maui → Hawaii
        (7, 20.0, 156.0)         // mirrored lon → none
      ).toDF("id", "lat", "lon")
        .withColumn("conus", col("lat").between(24.5, 49.5) && col("lon").between(-125, -67))
        .withColumn("alaska",
          col("lat").between(54, 71.5) &&
            (col("lon").between(-180, -130) || col("lon").between(170, 180)))
        .withColumn("hawaii", col("lat").between(18, 29) && col("lon").between(-178, -154))
        .withColumn("in_us", col("conus") || col("alaska") || col("hawaii"))
    },
    Some("""SELECT id, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon,
            (lat BETWEEN 24.5 AND 49.5 AND lon BETWEEN -125 AND -67) AS conus,
            (lat BETWEEN 54 AND 71.5 AND (lon BETWEEN -180 AND -130 OR lon BETWEEN 170 AND 180)) AS alaska,
            (lat BETWEEN 18 AND 29 AND lon BETWEEN -178 AND -154) AS hawaii,
            (lat BETWEEN 24.5 AND 49.5 AND lon BETWEEN -125 AND -67)
              OR (lat BETWEEN 54 AND 71.5 AND (lon BETWEEN -180 AND -130 OR lon BETWEEN 170 AND 180))
              OR (lat BETWEEN 18 AND 29 AND lon BETWEEN -178 AND -154) AS in_us
            FROM (VALUES (1, 34.0522, -118.2437), (2, 51.5074, -0.1278), (3, 62.0, -150.0),
                         (4, 55.0, 178.0), (5, 52.0, -176.0), (6, 20.0, -156.0), (7, 20.0, 156.0))
                 AS t(id, lat, lon)""")
  )

  /** F3 — buffer size: 100 ≤ b ≤ 50000 and integer-valued
    * (orchestrator.py:113-129). */
  val f3 = Q(
    "f3_buffer",
    "Buffer-size filter: [100, 50000] inclusive plus a wholeness check (b == floor(b)).",
    (s, _) => {
      import s.implicits._
      Seq((1, 99.0), (2, 100.0), (3, 1000.0), (4, 50000.0), (5, 50001.0), (6, 250.5))
        .toDF("id", "buffer_m")
        .withColumn("in_range", col("buffer_m").between(100, 50000))
        .withColumn("whole", col("buffer_m") === floor(col("buffer_m")))
        .withColumn("valid", col("in_range") && col("whole"))
    },
    Some("""SELECT id, CAST(buffer_m AS DOUBLE) AS buffer_m,
            buffer_m BETWEEN 100 AND 50000 AS in_range,
            buffer_m = floor(buffer_m) AS whole,
            (buffer_m BETWEEN 100 AND 50000) AND buffer_m = floor(buffer_m) AS valid
            FROM (VALUES (1, 99.0), (2, 100.0), (3, 1000.0), (4, 50000.0), (5, 50001.0), (6, 250.5))
                 AS t(id, buffer_m)""")
  )

  /** F4 — event-ID format: length 3..100, `^[a-zA-Z0-9_-]+$`, and a
    * case-insensitive blocklist of injection substrings
    * (orchestrator.py:131-162). */
  val f4 = Q(
    "f4_event_id",
    "Event-ID filter: length window, charset regex, and 17-substring injection blocklist (case-insensitive contains).",
    (s, _) => {
      import s.implicits._
      val blocklist = Seq("script", "select", "drop", "insert", "update", "delete", "union",
        "exec", "eval", "javascript", "<", ">", "\"", "'", ";", "--", "/*")
      Seq(
        (1, "fire_2024-001"), // valid
        (2, "ab"),            // too short
        (3, "x" * 101),       // too long
        (4, "has;semi"),      // charset violation (and blocklist ';')
        (5, "selectx"),       // blocklist: contains 'select'
        (6, "DROPTABLE"),     // blocklist hit is case-insensitive
        (7, "evt_42")         // valid
      ).toDF("id", "event_id")
        .withColumn("len_ok", length(col("event_id")).between(3, 100))
        .withColumn("charset_ok", col("event_id").rlike("^[a-zA-Z0-9_-]+$"))
        .withColumn("blocklist_hit",
          exists(array(blocklist.map(lit): _*), p => contains(lower(col("event_id")), p)))
        .withColumn("valid", col("len_ok") && col("charset_ok") && !col("blocklist_hit"))
        .select("id", "len_ok", "charset_ok", "blocklist_hit", "valid")
    },
    Some(s"""SELECT id,
            length(event_id) BETWEEN 3 AND 100 AS len_ok,
            regexp_matches(event_id, '^[a-zA-Z0-9_-]+$$') AS charset_ok,
            len(list_filter(['script','select','drop','insert','update','delete','union',
                             'exec','eval','javascript','<','>','"','''',';','--','/*'],
                            p -> contains(lower(event_id), p))) > 0 AS blocklist_hit,
            (length(event_id) BETWEEN 3 AND 100)
              AND regexp_matches(event_id, '^[a-zA-Z0-9_-]+$$')
              AND NOT len(list_filter(['script','select','drop','insert','update','delete','union',
                                       'exec','eval','javascript','<','>','"','''',';','--','/*'],
                                      p -> contains(lower(event_id), p))) > 0 AS valid
            FROM (VALUES (1, 'fire_2024-001'), (2, 'ab'), (3, repeat('x', 101)), (4, 'has;semi'),
                         (5, 'selectx'), (6, 'DROPTABLE'), (7, 'evt_42')) AS t(id, event_id)""")
  )

  /** F5 — sources list: members ⊆ {landfire,modis,weather,topography},
    * no duplicates, ≤4; empty list passes (optional field)
    * (orchestrator.py:164-184). */
  val f5 = Q(
    "f5_sources_list",
    "Sources-list filter via array predicates: forall-membership, distinct-size dedup check, cardinality cap.",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, Seq("landfire", "modis")),
        (2, Seq("landfire", "landfire")),                        // duplicate
        (3, Seq("foo")),                                         // invalid member
        (4, Seq.empty[String]),                                  // optional → valid
        (5, Seq("landfire", "modis", "weather", "topography")),  // all four
        (6, Seq("landfire", "modis", "weather", "topography", "modis")) // >4 + dup
      ).toDF("id", "sources")
        .withColumn("members_ok",
          forall(col("sources"), m => m.isin("landfire", "modis", "weather", "topography")))
        .withColumn("no_dups", size(array_distinct(col("sources"))) === size(col("sources")))
        .withColumn("count_ok", size(col("sources")) <= 4)
        .withColumn("valid", col("members_ok") && col("no_dups") && col("count_ok"))
        .select("id", "members_ok", "no_dups", "count_ok", "valid")
    },
    Some("""SELECT id,
            len(list_filter(sources, m -> m NOT IN ('landfire','modis','weather','topography'))) = 0 AS members_ok,
            len(list_distinct(sources)) = len(sources) AS no_dups,
            len(sources) <= 4 AS count_ok,
            len(list_filter(sources, m -> m NOT IN ('landfire','modis','weather','topography'))) = 0
              AND len(list_distinct(sources)) = len(sources) AND len(sources) <= 4 AS valid
            FROM (VALUES (1, ['landfire','modis']), (2, ['landfire','landfire']), (3, ['foo']),
                         (4, CAST([] AS VARCHAR[])), (5, ['landfire','modis','weather','topography']),
                         (6, ['landfire','modis','weather','topography','modis'])) AS t(id, sources)""")
  )

  /** F6 — coordinate precision: ≤8 decimal places after canonical "%.10f"
    * formatting + zero-strip; 5+ consecutive identical digits rejected.
    * The repeated-digit test is written as `0{5}|1{5}|…|9{5}` because the
    * oracle's RE2 engine has no backreferences (orchestrator.py:186-212). */
  val f6 = Q(
    "f6_coord_precision",
    "Precision filter: decimal-place count from canonical %.10f formatting; fake-pattern detection via repeated-digit alternation; <4-digit strings skip the pattern check.",
    (s, _) => {
      import s.implicits._
      val repeated = (0 to 9).map(d => s"$d{5}").mkString("|")
      Seq(
        (1, 34.0522),       // valid
        (2, 34.123456789),  // 9 decimal places → invalid
        (3, 34.55555),      // digits 3455555 contain 55555 → invalid
        (4, 1.23),          // only 3 digits → pattern check skipped → valid
        (5, -118.2437),     // valid (negative formatting)
        (6, 40.0)           // integral — 0 decimals → valid
      ).toDF("id", "coord")
        // canonical string: %.10f, strip trailing zeros, strip trailing dot
        .withColumn("canon",
          regexp_replace(regexp_replace(format_string("%.10f", col("coord")), "0+$", ""), "\\.$", ""))
        .withColumn("n_dec",
          when(col("canon").contains("."), length(element_at(split(col("canon"), "\\."), 2)))
            .otherwise(lit(0)))
        .withColumn("digits", regexp_replace(col("canon"), "[.-]", ""))
        .withColumn("precision_ok", col("n_dec") <= 8)
        .withColumn("pattern_ok",
          length(col("digits")) < 4 || !col("digits").rlike(repeated))
        .withColumn("valid", col("precision_ok") && col("pattern_ok"))
        .select("id", "canon", "n_dec", "precision_ok", "pattern_ok", "valid")
    },
    Some {
      val repeated = (0 to 9).map(d => s"$d{5}").mkString("|")
      s"""WITH v AS (
            SELECT id, regexp_replace(regexp_replace(printf('%.10f', CAST(coord AS DOUBLE)), '0+$$', ''), '\\.$$', '') AS canon
            FROM (VALUES (1, 34.0522), (2, 34.123456789), (3, 34.55555),
                         (4, 1.23), (5, -118.2437), (6, 40.0)) AS t(id, coord)
          ), d AS (
            SELECT id, canon,
              CASE WHEN contains(canon, '.') THEN length(string_split(canon, '.')[2]) ELSE 0 END AS n_dec,
              regexp_replace(canon, '[.-]', '', 'g') AS digits
            FROM v
          )
          SELECT id, canon, n_dec,
            n_dec <= 8 AS precision_ok,
            (length(digits) < 4 OR NOT regexp_matches(digits, '$repeated')) AS pattern_ok,
            n_dec <= 8 AND (length(digits) < 4 OR NOT regexp_matches(digits, '$repeated')) AS valid
          FROM d"""
    }
  )

  /** F7 — enum filters: priority ∈ {low,normal,high,emergency},
    * event_type ∈ {created,updated,location_changed}
    * (orchestrator.py:214-234). */
  val f7 = Q(
    "f7_enums",
    "Priority/event-type enum membership via isin.",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, "normal", "created"), (2, "emergency", "updated"),
        (3, "urgent", "created"),            // bad priority
        (4, "low", "location_changed"),
        (5, "high", "deleted")               // bad event type
      ).toDF("id", "priority", "event_type")
        .withColumn("priority_ok", col("priority").isin("low", "normal", "high", "emergency"))
        .withColumn("type_ok", col("event_type").isin("created", "updated", "location_changed"))
        .withColumn("valid", col("priority_ok") && col("type_ok"))
    },
    Some("""SELECT id, priority, event_type,
            priority IN ('low','normal','high','emergency') AS priority_ok,
            event_type IN ('created','updated','location_changed') AS type_ok,
            priority IN ('low','normal','high','emergency')
              AND event_type IN ('created','updated','location_changed') AS valid
            FROM (VALUES (1, 'normal', 'created'), (2, 'emergency', 'updated'), (3, 'urgent', 'created'),
                         (4, 'low', 'location_changed'), (5, 'high', 'deleted')) AS t(id, priority, event_type)""")
  )

  /** F11 — output-schema conformance: required fields present,
    * quality_score ∈ [0,1], location in range (shared_schema.py:276-304). */
  val f11 = Q(
    "f11_schema_conformance",
    "ContainerOutput conformance predicate: null checks on required fields + range checks on quality_score and location.",
    (s, _) => {
      import s.implicits._
      Seq(
        (1, Some("landfire"), Some("vegetation"), Some(0.8), Some(34.0), Some(-118.0)),
        (2, None,             Some("vegetation"), Some(0.8), Some(34.0), Some(-118.0)), // missing source
        (3, Some("modis"),    Some("ndvi"),       Some(1.2), Some(34.0), Some(-118.0)), // quality > 1
        (4, Some("weather"),  Some("current"),    Some(0.0), Some(95.0), Some(-118.0)), // lat out of range
        (5, Some("topography"), None,             Some(1.0), Some(34.0), Some(-118.0))  // missing data_type
      ).toDF("id", "source", "data_type", "quality_score", "lat", "lon")
        .withColumn("required_ok", col("source").isNotNull && col("data_type").isNotNull)
        .withColumn("quality_ok", col("quality_score").between(0.0, 1.0))
        .withColumn("location_ok", col("lat").between(-90, 90) && col("lon").between(-180, 180))
        .withColumn("conforms", col("required_ok") && col("quality_ok") && col("location_ok"))
        .select("id", "required_ok", "quality_ok", "location_ok", "conforms")
    },
    Some("""SELECT id,
            (source IS NOT NULL AND data_type IS NOT NULL) AS required_ok,
            quality_score BETWEEN 0.0 AND 1.0 AS quality_ok,
            (lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180) AS location_ok,
            (source IS NOT NULL AND data_type IS NOT NULL)
              AND quality_score BETWEEN 0.0 AND 1.0
              AND (lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180) AS conforms
            FROM (VALUES (1, 'landfire', 'vegetation', 0.8, 34.0, -118.0),
                         (2, NULL, 'vegetation', 0.8, 34.0, -118.0),
                         (3, 'modis', 'ndvi', 1.2, 34.0, -118.0),
                         (4, 'weather', 'current', 0.0, 95.0, -118.0),
                         (5, 'topography', NULL, 1.0, 34.0, -118.0))
                 AS t(id, source, data_type, quality_score, lat, lon)""")
  )

  /** F12 extension — the dbt-style data-contract gate over the star
    * schema: referential integrity, key uniqueness, accepted values,
    * numeric ranges, and non-null/non-empty — one census row per check.
    * The fixtures are clean, so an "incoming batch" is derived with
    * DETERMINISTIC planted violations (negated FK every 97th/103rd key,
    * status 'X' every 89th order, +0.15 discount on every 101st order's
    * first line, every 500th event duplicated) so all violation branches
    * provably fire at every sf and both engines count them exactly.
    *
    * Scale shape: each check is one scan + one aggregate; the FK checks
    * are anti-joins on the natural key (the orders side broadcasts when
    * small, shuffles on the key otherwise — the same co-partitioning a
    * 100 TB ingest gate would use), and uniqueness is count-minus-
    * distinct, never a self-join. A failed gate at this layer is what
    * keeps a bad batch OUT of the lake before any downstream operator
    * sees it. */
  val f12 = Q(
    "f12_contract_checks",
    "Data-contract gate: FK anti-joins, count-minus-distinct uniqueness, accepted values, range and not-null checks over a batch with planted violations.",
    (s, dir) => {
      val t = Tables(s, dir)
      val ordersB = t.orders.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, -col("o_custkey"))
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 89 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"))
      val lineitemB = t.lineitem.select(
        when(col("l_orderkey") % 103 === 0, -col("l_orderkey"))
          .otherwise(col("l_orderkey")).as("l_orderkey"),
        when(col("l_orderkey") % 101 === 0 && col("l_linenumber") === 1,
          col("l_discount") + 0.15).otherwise(col("l_discount")).as("l_discount"))
      val eventsB = t.events.select(col("event_id"))
        .unionAll(t.events.select(col("event_id")).filter(col("event_id") % 500 === 0))

      val fkLine = lineitemB
        .join(t.orders.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_lineitem_orderkey").as("check"), col("n_violations"))
      val fkCust = ordersB
        .join(t.customer.select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_orders_custkey").as("check"), col("n_violations"))
      val uniq = eventsB
        .agg((count(lit(1)) - count_distinct(col("event_id"))).as("n_violations"))
        .select(lit("unique_event_id").as("check"), col("n_violations"))
      val accepted = ordersB
        .agg(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)).as("n_violations"))
        .select(lit("accepted_status").as("check"), col("n_violations"))
      val range = lineitemB
        .agg(sum(when(!col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)).as("n_violations"))
        .select(lit("range_discount").as("check"), col("n_violations"))
      val notNull = t.documents
        .agg(sum(when(col("text").isNull || length(col("text")) === 0, 1L).otherwise(0L)).as("n_violations"))
        .select(lit("not_null_text").as("check"), col("n_violations"))

      fkLine.unionAll(fkCust).unionAll(uniq).unionAll(accepted)
        .unionAll(range).unionAll(notNull)
        .withColumn("pass", col("n_violations") === 0L)
    },
    Some("""WITH orders_b AS (
              SELECT o_orderkey,
                CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey ELSE o_custkey END AS o_custkey,
                CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus
              FROM orders
            ), lineitem_b AS (
              SELECT CASE WHEN l_orderkey % 103 = 0 THEN -l_orderkey ELSE l_orderkey END AS l_orderkey,
                CASE WHEN l_orderkey % 101 = 0 AND l_linenumber = 1
                     THEN l_discount + 0.15 ELSE l_discount END AS l_discount
              FROM lineitem
            ), events_b AS (
              SELECT event_id FROM events
              UNION ALL SELECT event_id FROM events WHERE event_id % 500 = 0
            ), checks AS (
              SELECT 'fk_lineitem_orderkey' AS check, CAST(count(*) AS BIGINT) AS n_violations
              FROM lineitem_b l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
              UNION ALL
              SELECT 'fk_orders_custkey', CAST(count(*) AS BIGINT)
              FROM orders_b ob ANTI JOIN customer c ON ob.o_custkey = c.c_custkey
              UNION ALL
              SELECT 'unique_event_id', CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
              FROM events_b
              UNION ALL
              SELECT 'accepted_status',
                CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders_b
              UNION ALL
              SELECT 'range_discount',
                CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END) AS BIGINT)
              FROM lineitem_b
              UNION ALL
              SELECT 'not_null_text',
                CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
              FROM documents
            )
            SELECT "check", n_violations, n_violations = 0 AS pass FROM checks""")
  )

  def all: Seq[Q] = Seq(f1, f2, f3, f4, f5, f6, f7, f11, f12)
}
