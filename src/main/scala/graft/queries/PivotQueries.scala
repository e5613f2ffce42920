package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 J1 + §2.4 A6 + §2.3 J4 — the reference's signature
  * merge shape: N per-source records keyed by request → one wide row
  * (/root/reference/containers/orchestrator/orchestrator.py:769-806,
  * containers/shared_schema.py:135-191) plus the success-rate summary
  * (orchestrator.py:745-786) and the event-key coordination invariant
  * (tests/test_pipeline.py:252-264).
  *
  * Scale notes: `pivot` is given an EXPLICIT value list — without it Spark
  * runs an extra distinct-collect job over the full input to discover the
  * columns, which at 100 TB is a full scan before the real work starts.
  * With the list, the pivot lowers to a single hash aggregate keyed on
  * user_id (one shuffle), same cost as any groupBy.
  */
object PivotQueries {

  private val sourceTags = Seq("click", "view", "purchase", "signup", "error")

  /** J1 — pivot/merge: per-request (user) per-source (event_type) totals
    * pivoted into one wide row. */
  val j1 = Q(
    "j1_pivot",
    "groupBy(request).pivot(source, explicit values).agg(sum) — the 4-outputs→1-wide-row merge; oracle is conditional aggregation.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(col("user_id"))
        .pivot("event_type", sourceTags)
        .agg(round(sum(col("value")), 2))
    },
    Some("""SELECT user_id,
            round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
            round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
            round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
            round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
            round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error
            FROM events GROUP BY user_id""")
  )

  /** A6 — success-rate summary: per request, sources attempted vs
    * successful, ratio with guarded division (orchestrator.py:745-756). */
  val a6 = Q(
    "a6_summary",
    "Success-count roll-up with div-by-zero-guarded ratio: count(when) conditional aggregates + coalesce(x/y, 0).",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(
          count_distinct(col("event_type")).as("sources_attempted"),
          count_distinct(when(col("event_type") =!= "error", col("event_type"))).as("sources_successful"),
          count(when(col("event_type") === "error", 1)).as("n_errors")
        )
        .withColumn("success_rate",
          round(coalesce(col("sources_successful").cast("double") /
            nullif(col("sources_attempted"), lit(0)), lit(0.0)), 4))
    },
    Some("""SELECT user_id,
            count(DISTINCT event_type) AS sources_attempted,
            count(DISTINCT CASE WHEN event_type <> 'error' THEN event_type END) AS sources_successful,
            count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
            round(coalesce(CAST(count(DISTINCT CASE WHEN event_type <> 'error' THEN event_type END) AS DOUBLE)
                  / nullif(count(DISTINCT event_type), 0), 0.0), 4) AS success_rate
            FROM events GROUP BY user_id""")
  )

  /** J4 — coordination-key invariant: every per-source output for one
    * request must carry the same key. Checked as a relational assertion:
    * lineitem→orders join, then per-order distinct-date count must be 1. */
  val j4 = Q(
    "j4_key_invariant",
    "Key-coordination invariant as an aggregate assertion: join fact→dim, per-key countDistinct of the propagated attribute, summary of ok vs violations.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count_distinct(col("o_orderdate")).as("n_keys"))
        .agg(
          count(lit(1)).as("n_groups"),
          count(when(col("n_keys") === 1, 1)).as("n_ok"),
          count(when(col("n_keys") =!= 1, 1)).as("n_violations")
        )
    },
    Some("""SELECT count(*) AS n_groups,
            count(CASE WHEN n_keys = 1 THEN 1 END) AS n_ok,
            count(CASE WHEN n_keys <> 1 THEN 1 END) AS n_violations
            FROM (SELECT l_orderkey, count(DISTINCT o_orderdate) AS n_keys
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  GROUP BY l_orderkey)""")
  )

  /** S8-adjacent: the wide row serialized back out — pivot + JSON-shaped
    * string assembly (to_json of a struct), proving the sink shape without
    * a file sink. */
  val s8Json = Q(
    "s8_json_shape",
    "JSON sink shape: wide row → to_json(struct(...)) serialized column; oracle builds the same canonical JSON string.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 2).as("total"), count(lit(1)).as("n"))
        .withColumn("payload",
          concat(lit("{\"user_id\":"), col("user_id"),
            lit(",\"total\":"), col("total"),
            lit(",\"n\":"), col("n"), lit("}")))
        .select(col("user_id"), col("payload"))
    },
    Some("""SELECT user_id,
            concat('{"user_id":', CAST(user_id AS VARCHAR),
                   ',"total":', CAST(round(sum(value), 2) AS VARCHAR),
                   ',"n":', CAST(count(*) AS VARCHAR), '}') AS payload
            FROM events GROUP BY user_id""")
  )

  /** J1 inverse — unpivot/melt: the wide per-key row (explicit-value
    * pivot, the scale-safe form) stacked back to tall (key, source,
    * value) rows. The oracle computes the tall aggregate directly,
    * proving unpivot(pivot(x)) = x modulo absent combinations (pivot
    * nulls, filtered after the stack). stack() is a Generator evaluated
    * row-local — no shuffle beyond the pivot's own. */
  val j1Unpivot = Q(
    "j1_unpivot",
    "Unpivot round-trip: explicit-value pivot to wide, stack() back to tall, null combos dropped; oracle is the direct tall aggregate.",
    (s, dir) => {
      val t = Tables(s, dir)
      val types = Seq("click", "view", "signup", "error", "purchase")
      val wide = t.events
        .filter(col("user_id") < 30)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      val stackArgs = types.map(tp => s"'$tp', `$tp`").mkString(", ")
      wide
        .select(col("user_id"),
          expr(s"stack(${types.size}, $stackArgs) AS (event_type, n)"))
        .filter(col("n").isNotNull)
    },
    Some("""SELECT user_id, event_type, count(*) AS n
            FROM events WHERE user_id < 30
            GROUP BY user_id, event_type""")
  )

  def all: Seq[Q] = Seq(j1, a6, j4, s8Json, j1Unpivot)
}
