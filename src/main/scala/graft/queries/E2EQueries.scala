package graft.queries

import graft.ops.CollectPipeline
import org.apache.spark.sql.functions._

/** SURVEY.md §3.1 — the /collect entry point end-to-end over the four
  * golden coordinates (README.md:262-266 of the reference) plus invalid
  * requests, through [[graft.ops.CollectPipeline]]. The oracle mirrors
  * the entire pipeline — validation, deterministic enrichment kernels,
  * classification chains, pivot, summary — in one SQL statement, so the
  * full composition is hash-pinned, not just the parts.
  */
object E2EQueries {

  val collect = Q(
    "e2e_collect",
    "Full /collect composition: validate -> 4-source enrichment fan-out -> union -> pivot -> summary, golden coordinates + rejects.",
    (s, _) => {
      import s.implicits._
      val requests = Seq(
        ("req_la", 34.0522, -118.2437, 1000.0, Some("fire_2024-001")),
        ("req_yellowstone", 44.6, -110.5, 5000.0, None: Option[String]),
        ("req_death_valley", 36.5, -117.0, 1000.0, Some("dv_survey_01")),
        ("req_seattle", 47.5086, -122.3551, 2000.0, Some("sea-042")),
        ("req_london", 51.5074, -0.1278, 1000.0, None: Option[String]),  // outside US → rejected
        ("req_bad_lat", 91.0, 10.0, 1000.0, None: Option[String]),       // bounds → rejected
        ("req_bad_buffer", 36.5, -117.0, 99.0, None: Option[String])     // buffer → rejected
      ).toDF("request_id", "lat", "lon", "buffer_m", "event_id")
      CollectPipeline.run(requests)
    },
    Some("""WITH req(request_id, lat, lon, buffer_m, event_id) AS (VALUES
              ('req_la', 34.0522, -118.2437, 1000.0, 'fire_2024-001'),
              ('req_yellowstone', 44.6, -110.5, 5000.0, NULL),
              ('req_death_valley', 36.5, -117.0, 1000.0, 'dv_survey_01'),
              ('req_seattle', 47.5086, -122.3551, 2000.0, 'sea-042'),
              ('req_london', 51.5074, -0.1278, 1000.0, NULL),
              ('req_bad_lat', 91.0, 10.0, 1000.0, NULL),
              ('req_bad_buffer', 36.5, -117.0, 99.0, NULL)),
            valid AS (
              SELECT request_id, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon FROM req
              WHERE (lat BETWEEN -90 AND 90 AND lon BETWEEN -180 AND 180 AND NOT (lat = 0 AND lon = 0))
                AND ((lat BETWEEN 24.5 AND 49.5 AND lon BETWEEN -125 AND -67)
                  OR (lat BETWEEN 54 AND 71.5 AND (lon BETWEEN -180 AND -130 OR lon BETWEEN 170 AND 180))
                  OR (lat BETWEEN 18 AND 29 AND lon BETWEEN -178 AND -154))
                AND buffer_m BETWEEN 100 AND 50000
                AND (event_id IS NULL OR (length(event_id) BETWEEN 3 AND 100
                                          AND regexp_matches(event_id, '^[a-zA-Z0-9_-]+$')))
            ), k AS (
              SELECT request_id,
                ((lat * 7 + lon * 3) % 20 + 20) % 20 + 15.0 AS w_temp_raw,
                CAST(((floor(lat * 11 + lon * 5) % 80) + 80) % 80 AS INT) + 10 AS w_hum,
                ((lon * 13) % 18 + 18) % 18 AS w_wind_raw,
                CAST(((floor(lat * 100 + lon * 50) % 9000) + 9000) % 9000 AS INT) AS ndvi_raw,
                CAST(((floor(lat * 37 + lon * 17) % 10) + 10) % 10 * 1000 + 2500 AS INT) AS pixel,
                ((lat * 19 - lon * 7) % 150 + 150) % 150 AS elev_raw
              FROM valid
            ), tall AS (
              SELECT request_id, 'weather' AS source,
                CASE WHEN (CASE WHEN round(w_temp_raw, 2) > 30 THEN 3 WHEN round(w_temp_raw, 2) > 25 THEN 2 WHEN round(w_temp_raw, 2) > 20 THEN 1 ELSE 0 END
                         + CASE WHEN w_hum < 20 THEN 3 WHEN w_hum < 40 THEN 2 WHEN w_hum < 60 THEN 1 ELSE 0 END
                         + CASE WHEN round(w_wind_raw, 2) > 15 THEN 3 WHEN round(w_wind_raw, 2) > 10 THEN 2 WHEN round(w_wind_raw, 2) > 5 THEN 1 ELSE 0 END) >= 7 THEN 'EXTREME'
                     WHEN (CASE WHEN round(w_temp_raw, 2) > 30 THEN 3 WHEN round(w_temp_raw, 2) > 25 THEN 2 WHEN round(w_temp_raw, 2) > 20 THEN 1 ELSE 0 END
                         + CASE WHEN w_hum < 20 THEN 3 WHEN w_hum < 40 THEN 2 WHEN w_hum < 60 THEN 1 ELSE 0 END
                         + CASE WHEN round(w_wind_raw, 2) > 15 THEN 3 WHEN round(w_wind_raw, 2) > 10 THEN 2 WHEN round(w_wind_raw, 2) > 5 THEN 1 ELSE 0 END) >= 5 THEN 'HIGH'
                     WHEN (CASE WHEN round(w_temp_raw, 2) > 30 THEN 3 WHEN round(w_temp_raw, 2) > 25 THEN 2 WHEN round(w_temp_raw, 2) > 20 THEN 1 ELSE 0 END
                         + CASE WHEN w_hum < 20 THEN 3 WHEN w_hum < 40 THEN 2 WHEN w_hum < 60 THEN 1 ELSE 0 END
                         + CASE WHEN round(w_wind_raw, 2) > 15 THEN 3 WHEN round(w_wind_raw, 2) > 10 THEN 2 WHEN round(w_wind_raw, 2) > 5 THEN 1 ELSE 0 END) >= 3 THEN 'MODERATE'
                     ELSE 'LOW' END AS risk
              FROM k
              UNION ALL
              SELECT request_id, 'modis',
                CASE WHEN ndvi_raw * 0.0001 > 0.6 THEN 'LOW' WHEN ndvi_raw * 0.0001 > 0.3 THEN 'MODERATE'
                     WHEN ndvi_raw * 0.0001 > 0.1 THEN 'HIGH' ELSE 'EXTREME' END
              FROM k
              UNION ALL
              SELECT request_id, 'landfire',
                CASE WHEN pixel >= 7000 AND pixel < 8000 THEN 'LOW'
                     WHEN pixel >= 3000 AND pixel < 4000 THEN 'MODERATE_TO_HIGH'
                     WHEN pixel >= 2000 AND pixel < 3000 THEN 'MODERATE_TO_HIGH'
                     ELSE 'MODERATE' END
              FROM k
              UNION ALL
              SELECT request_id, 'topography',
                CASE WHEN round(elev_raw, 2) > 100 THEN 'HIGH' WHEN round(elev_raw, 2) > 50 THEN 'MODERATE' ELSE 'LOW' END
              FROM k
            )
            SELECT request_id,
              max(CASE WHEN source = 'landfire' THEN risk END) AS landfire,
              max(CASE WHEN source = 'modis' THEN risk END) AS modis,
              max(CASE WHEN source = 'weather' THEN risk END) AS weather,
              max(CASE WHEN source = 'topography' THEN risk END) AS topography,
              count(*) AS sources_successful,
              count(CASE WHEN risk IN ('HIGH', 'EXTREME') THEN 1 END) AS n_high_risk
            FROM tall GROUP BY request_id""")
  )

  def all: Seq[Q] = Seq(collect)
}
