package graft.queries

import graft.Tables

/** The raw-SQL entry face of the ⊕ operator families (VERDICT r8
  * missing #2). The engine is DataFrame-first, but a SQL-first user must
  * be able to drive the as-of join, LSH dedup, and BM25 from `spark.sql`
  * TEXT alone — no Scala API. These queries register the fixture tables
  * as temp views and run the whole operator as one SQL statement;
  * Catalyst parses each into the same plan family as the DataFrame form
  * (same pushdown, same shuffle keys), and the native functions
  * (`minhash_sigs`) resolve because [[graft.functions.GraftExtensions]]
  * SQL-registers them via `spark.sql.extensions`.
  *
  * Each oracle is the strongest available independent formulation: the
  * as-of join is checked against DuckDB's NATIVE `ASOF LEFT JOIN`
  * operator (engine-level cross-check of the union+carry-forward SQL),
  * and the LSH/BM25 oracles are the same DuckDB texts that certify the
  * DataFrame forms — so SQL face and DataFrame face provably agree.
  */
object SqlEntryQueries {

  /** Flag-scoped, plan-asserted execution of SQL text that must lower
    * onto the custom TopKPerKey operator — WITHOUT a driver collect
    * (VERDICT r11 next #8): optimization is lazy and a harness action on
    * the returned frame would re-plan AFTER the finally-block restores
    * the flag, silently undoing the rewrite, so the plan must execute
    * while the flag is set. The rows go executor→parquet→re-scan (the
    * spill-shaped analogue of MetricsScrape's noop-sink discipline: a
    * large result would OOM a driver-side collect, a parquet round-trip
    * is distributed on both sides). */
  private def runLoweredTopK(s: org.apache.spark.sql.SparkSession,
                             sqlText: String,
                             requiredNodes: Seq[String]): org.apache.spark.sql.DataFrame = {
    val flag = "spark.graft.topk.rewrite"
    val prev = s.conf.getOption(flag)
    s.conf.set(flag, "true")
    try {
      val df = s.sql(sqlText)
      val plan = df.queryExecution.executedPlan.toString
      requiredNodes.foreach(n => require(plan.contains(n),
        s"expected $n in plan:\n${plan.take(1500)}"))
      val dir = java.nio.file.Files.createTempDirectory("graft_topk_sql").toString
      df.write.mode("overwrite").parquet(dir) // executes UNDER the flag
      s.read.parquet(dir)
    } finally prev match {
      case Some(v) => s.conf.set(flag, v)
      case None => s.conf.unset(flag)
    }
  }

  /** Backward as-of join as PURE SQL: union probe+build rows, one
    * user-partitioned window, carry the newest at-or-before build row
    * forward (`last_value(..., true)` = IGNORE NULLS). Build rows sort
    * BEFORE probes at equal ts (`is_probe ASC`) so the `>=` equal-instant
    * match holds. ONE shuffle on user_id — the same single-shuffle shape
    * as [[graft.ops.AsOfJoin.leftBackward]], just spelled in ANSI SQL. */
  val sqlAsof = Q(
    "sql_entry_asof",
    "Raw-SQL as-of join: union + IGNORE-NULLS carry-forward window over user_id; newest at-or-before purchase per click; oracle = DuckDB's native ASOF LEFT JOIN.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      s.sql("""
        WITH b AS (
          SELECT user_id, ts, max_by(value, event_id) AS purchase
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        ), p AS (
          SELECT user_id, event_id, ts, value
          FROM events WHERE event_type = 'click'
        ), u AS (
          SELECT user_id, ts, 1 AS is_probe, event_id, value,
                 CAST(NULL AS DOUBLE) AS purchase FROM p
          UNION ALL
          SELECT user_id, ts, 0 AS is_probe, CAST(NULL AS BIGINT) AS event_id,
                 CAST(NULL AS DOUBLE) AS value, purchase FROM b
        ), w AS (
          SELECT user_id, ts, is_probe, event_id, value,
            last_value(CASE WHEN is_probe = 0 THEN purchase END, true)
              OVER (PARTITION BY user_id ORDER BY ts ASC, is_probe ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purchase,
            last_value(CASE WHEN is_probe = 0 THEN ts END, true)
              OVER (PARTITION BY user_id ORDER BY ts ASC, is_probe ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
          FROM u
        )
        SELECT user_id, event_id, ts, value, asof_purchase, asof_ts
        FROM w WHERE is_probe = 1""")
    },
    Some("""WITH b AS (
              SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                     max_by(value, event_id) AS purchase
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ), p AS (
              SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events WHERE event_type = 'click'
            )
            SELECT p.user_id, p.event_id, p.ts, p.value,
                   b.purchase AS asof_purchase, b.ts AS asof_ts
            FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts""")
  )

  /** The shared raw-SQL LSH verified-pairs pipeline (sql_entry_lsh_dedup
    * and sql_entry_dedup_clusters), with its two multi-referenced stages
    * MATERIALIZED once (r12 optimization): Spark inlines a CTE at every
    * reference, so the one-statement form re-ran the tokenize CTE `d` 3x
    * (sig + both verify sides) and the minhash_sigs-bearing `all_bands`
    * 2x (census + join-back). Checkpointing those two stages into temp
    * views keeps every per-document hash single-execution; the candidate
    * + verify statement (and the caller-supplied final SELECT over
    * `ver`) stays the same SQL text. */
  private def lshVerifiedPairsSql(s: org.apache.spark.sql.SparkSession, dir: String,
                                  finalSelect: String): org.apache.spark.sql.DataFrame = {
    Tables(s, dir).documents.createOrReplaceTempView("documents")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val dView = s"lsh_d_$tag"
    val abView = s"lsh_ab_$tag"
    s.sql("SELECT doc_id, array_distinct(split(text, ' ')) AS toks FROM documents")
      .localCheckpoint().createOrReplaceTempView(dView)
    s.sql(s"""
        WITH sig AS (
          SELECT doc_id, minhash_sigs(toks) AS mh FROM $dView
        )
        SELECT doc_id, b, concat(mh[2 * b], mh[2 * b + 1]) AS band_key
        FROM sig LATERAL VIEW explode(sequence(0, 2)) t AS b""")
      .localCheckpoint().createOrReplaceTempView(abView)
    val out = s.sql(s"""
        WITH keep AS (
          SELECT b, band_key FROM $abView GROUP BY b, band_key
          HAVING count(*) BETWEEN 2 AND 100
        ), bands AS (
          SELECT a.doc_id, a.b, a.band_key
          FROM $abView a JOIN keep USING (b, band_key)
        ), cand AS (
          SELECT DISTINCT l.doc_id AS i, r.doc_id AS j
          FROM bands l JOIN bands r USING (b, band_key)
          WHERE l.doc_id < r.doc_id
        ), ver AS (
          SELECT i, j,
            CAST(size(array_intersect(da.toks, db.toks)) AS DOUBLE) /
              (size(da.toks) + size(db.toks)
                 - size(array_intersect(da.toks, db.toks))) AS jac
          FROM cand JOIN $dView da ON da.doc_id = i JOIN $dView db ON db.doc_id = j
        )
        $finalSelect""")
    s.catalog.dropTempView(dView)
    s.catalog.dropTempView(abView)
    out
  }

  /** MinHash+LSH near-dup dedup as PURE SQL, driving the native
    * `minhash_sigs` Catalyst expression from SQL text: signatures →
    * 3 two-row bands → capped bucket equi-join (2–100, the same skew
    * guard as the DataFrame form) → exact-Jaccard verification. Oracle =
    * the same DuckDB text that certifies a10_neardup_minhash. */
  val sqlLshDedup = Q(
    "sql_entry_lsh_dedup",
    "Raw-SQL MinHash+LSH dedup using the SQL-registered native minhash_sigs: banded bucket join with 2-100 skew cap, exact Jaccard >= 0.9; same oracle as a10_neardup_minhash.",
    (s, dir) => lshVerifiedPairsSql(s, dir,
      "SELECT i, j, round(jac, 6) AS jaccard FROM ver WHERE jac >= 0.9"),
    Some("""WITH d AS (
              SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
            ), hs AS (
              SELECT doc_id, toks, list_transform(toks, t -> md5(t)) AS hs FROM d
            ), sig AS (
              SELECT doc_id, toks,
                [ list_aggregate(list_transform(hs, h -> substring(h, 1 + 5*i, 5)), 'min')
                  for i in generate_series(0, 5) ] AS mh
              FROM hs
            ), all_bands AS (
              SELECT doc_id, b, mh[2*b+1] || mh[2*b+2] AS band_key
              FROM sig, unnest(generate_series(0, 2)) AS t(b)
            ), keep AS (
              SELECT b, band_key FROM all_bands GROUP BY b, band_key
              HAVING count(*) BETWEEN 2 AND 100
            ), bands AS (
              SELECT all_bands.* FROM all_bands JOIN keep USING (b, band_key)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              FROM bands a JOIN bands b USING (b, band_key) WHERE a.doc_id < b.doc_id
            ), ver AS (
              SELECT i, j,
                CAST(len(list_filter(da.toks, t -> list_contains(db.toks, t))) AS DOUBLE) /
                (len(da.toks) + len(db.toks)
                   - len(list_filter(da.toks, t -> list_contains(db.toks, t)))) AS jac
              FROM cand JOIN d da ON da.doc_id = i JOIN d db ON db.doc_id = j
            )
            SELECT i, j, round(jac, 6) AS jaccard FROM ver WHERE jac >= 0.9""")
  )

  /** BM25 retrieval as PURE SQL: posting-list tf, df + avgdl side
    * aggregates, Robertson idf, fixed-order per-term sum, top-20. Same
    * float expression order as the DataFrame form (x28_bm25) so the
    * doubles agree bit-for-bit; oracle = x28_bm25's DuckDB text. */
  val sqlBm25 = Q(
    "sql_entry_bm25",
    "Raw-SQL BM25: posting tf + df/avgdl CTEs, Robertson idf, top-20 with rank; identical answer to the DataFrame form, same DuckDB oracle.",
    (s, dir) => {
      Tables(s, dir).documents.createOrReplaceTempView("documents")
      s.sql("""
        WITH d AS (
          SELECT doc_id, split(text, ' ') AS toks,
                 CAST(size(split(text, ' ')) AS DOUBLE) AS dl
          FROM documents
        ), stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d
        ), tf AS (
          SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM (
            SELECT doc_id, dl, explode(toks) AS w FROM d)
          WHERE w IN ('spark', 'join', 'stream')
          GROUP BY doc_id, dl, w
        ), dfc AS (
          SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
        ), scored AS (
          SELECT doc_id, w, tf,
            ln((n_docs - df + 0.5) / (df + 0.5) + 1) * tf * (1.2 + 1)
              / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
          FROM tf JOIN dfc USING (w) CROSS JOIN stats
        ), piv AS (
          SELECT doc_id,
            CAST(COALESCE(max(CASE WHEN w = 'spark' THEN tf END), 0) AS BIGINT) AS tf_spark,
            CAST(COALESCE(max(CASE WHEN w = 'join' THEN tf END), 0) AS BIGINT) AS tf_join,
            CAST(COALESCE(max(CASE WHEN w = 'stream' THEN tf END), 0) AS BIGINT) AS tf_stream,
            COALESCE(max(CASE WHEN w = 'spark' THEN score END), 0)
              + COALESCE(max(CASE WHEN w = 'join' THEN score END), 0)
              + COALESCE(max(CASE WHEN w = 'stream' THEN score END), 0) AS total
          FROM scored GROUP BY doc_id
        )
        SELECT doc_id, tf_spark, tf_join, tf_stream,
               round(total, 6) AS bm25,
               CAST(row_number() OVER (ORDER BY total DESC, doc_id ASC) AS INT) AS rank
        FROM piv ORDER BY total DESC, doc_id ASC LIMIT 20""")
    },
    Some("""WITH d AS (
              SELECT doc_id, string_split(text, ' ') AS toks,
                     CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
              FROM documents
            ), stats AS (
              SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM d
            ), tf AS (
              SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM (
                SELECT doc_id, dl, unnest(toks) AS w FROM d)
              WHERE w IN ('spark', 'join', 'stream')
              GROUP BY doc_id, dl, w
            ), dfc AS (
              SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
            ), scored AS (
              SELECT doc_id, w, tf,
                ln((n_docs - df + 0.5) / (df + 0.5) + 1) * tf * (1.2 + 1)
                  / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
              FROM tf JOIN dfc USING (w) CROSS JOIN stats
            ), piv AS (
              SELECT doc_id,
                CAST(COALESCE(max(CASE WHEN w = 'spark' THEN tf END), 0) AS BIGINT) AS tf_spark,
                CAST(COALESCE(max(CASE WHEN w = 'join' THEN tf END), 0) AS BIGINT) AS tf_join,
                CAST(COALESCE(max(CASE WHEN w = 'stream' THEN tf END), 0) AS BIGINT) AS tf_stream,
                COALESCE(max(CASE WHEN w = 'spark' THEN score END), 0)
                  + COALESCE(max(CASE WHEN w = 'join' THEN score END), 0)
                  + COALESCE(max(CASE WHEN w = 'stream' THEN score END), 0) AS total
              FROM scored GROUP BY doc_id
            )
            SELECT doc_id, tf_spark, tf_join, tf_stream,
                   round(total, 6) AS bm25,
                   CAST(row_number() OVER (ORDER BY total DESC, doc_id ASC) AS INT) AS rank
            FROM piv ORDER BY total DESC, doc_id ASC LIMIT 20""")
  )

  /** MERGE/upsert as PURE SQL (VERDICT r9 next #7): the u4 full-outer
    * CDC shape — snapshot FULL OUTER JOIN change batch on the key,
    * outcome classified from side presence, per-outcome census with
    * exact checksums. The scalar subquery replaces the DataFrame form's
    * broadcast crossJoin of the 1-row max (same plan family: a
    * broadcast of one row). Oracle = u4_merge_upsert's own DuckDB
    * shape, so SQL face and DataFrame face provably agree. */
  val sqlMerge = Q(
    "sql_entry_merge",
    "Raw-SQL MERGE/upsert: snapshot FULL OUTER JOIN deterministic change batch, outcome census (updated/inserted/carried) with char and id checksums; same oracle shape as u4_merge_upsert.",
    (s, dir) => {
      Tables(s, dir).documents.createOrReplaceTempView("documents")
      s.sql("""
        WITH snap AS (
          SELECT doc_id, source, n_chars FROM documents
        ), batch AS (
          SELECT CASE WHEN doc_id % 10 = 0 THEN doc_id
                      ELSE doc_id + (SELECT max(doc_id) FROM snap) + 1 END AS doc_id,
                 source, n_chars + 3 AS n_chars
          FROM snap WHERE doc_id % 10 = 0 OR doc_id % 25 = 0
        ), merged AS (
          SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
            CASE WHEN s.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN 'updated'
                 WHEN b.doc_id IS NOT NULL THEN 'inserted'
                 ELSE 'carried' END AS outcome,
            coalesce(b.n_chars, s.n_chars) AS n_chars
          FROM snap s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id
        )
        SELECT outcome, count(*) AS n_docs,
               sum(n_chars) AS sum_chars, sum(doc_id) AS sum_ids
        FROM merged GROUP BY outcome""")
    },
    Some("""WITH snap AS (
              SELECT doc_id, source, n_chars FROM documents
            ), batch AS (
              SELECT CASE WHEN doc_id % 10 = 0 THEN doc_id
                          ELSE doc_id + (SELECT max(doc_id) FROM snap) + 1 END AS doc_id,
                     source, n_chars + 3 AS n_chars
              FROM snap WHERE doc_id % 10 = 0 OR doc_id % 25 = 0
            ), merged AS (
              SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
                CASE WHEN s.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN 'updated'
                     WHEN b.doc_id IS NOT NULL THEN 'inserted'
                     ELSE 'carried' END AS outcome,
                coalesce(b.n_chars, s.n_chars) AS n_chars
              FROM snap s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id
            )
            SELECT outcome, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST(sum(doc_id) AS BIGINT) AS sum_ids
            FROM merged GROUP BY outcome""")
  )

  /** The W2 window family as PURE SQL with a named WINDOW clause —
    * ranking, offset (lag/lead), and a sliding 3-row frame in one
    * statement. Both engines support the identical ANSI text (only the
    * moving-average frame is inlined, since the frame must be declared
    * at the use site on both). One shuffle on user_id; frames evaluated
    * in-sort, exactly the w2_window_funcs plan. */
  val sqlWindow = Q(
    "sql_entry_window",
    "Raw-SQL window family: row_number, lag, lead, 3-row moving average over one named WINDOW; same answer and oracle as w2_window_funcs.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id, event_id,
          row_number() OVER w AS rn, value,
          lag(value, 1) OVER w AS prev_value,
          lead(value, 1) OVER w AS next_value,
          round(avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")
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

  /** The f12 data-contract gate as PURE SQL: FK anti-joins,
    * count-minus-distinct uniqueness, accepted-values, range and
    * not-null checks over the same planted-violation batch, one
    * UNION ALL statement. `LEFT ANTI JOIN` is the only dialect split
    * (DuckDB spells it `ANTI JOIN`). */
  val sqlContract = Q(
    "sql_entry_contract",
    "Raw-SQL contract gate: six checks (2 FK anti-joins, uniqueness, accepted values, range, not-null) as one UNION ALL over planted violations; same check set as f12_contract_checks.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders.createOrReplaceTempView("orders")
      t.lineitem.createOrReplaceTempView("lineitem")
      t.customer.createOrReplaceTempView("customer")
      t.events.createOrReplaceTempView("events")
      t.documents.createOrReplaceTempView("documents")
      s.sql("""
        WITH orders_b AS (
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
          SELECT 'fk_lineitem_orderkey' AS check_name, count(*) AS n_violations
          FROM lineitem_b l LEFT ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'fk_orders_custkey', count(*)
          FROM orders_b b LEFT ANTI JOIN customer c ON b.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'unique_event_id', count(*) - count(DISTINCT event_id) FROM events_b
          UNION ALL
          SELECT 'accepted_status',
            sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
          FROM orders_b
          UNION ALL
          SELECT 'range_discount',
            sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
          FROM lineitem_b
          UNION ALL
          SELECT 'not_null_text',
            sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
          FROM documents
        )
        SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
               n_violations = 0 AS pass
        FROM checks""")
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
              SELECT 'fk_lineitem_orderkey' AS check_name, count(*) AS n_violations
              FROM lineitem_b l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
              UNION ALL
              SELECT 'fk_orders_custkey', count(*)
              FROM orders_b b ANTI JOIN customer c ON b.o_custkey = c.c_custkey
              UNION ALL
              SELECT 'unique_event_id', count(*) - count(DISTINCT event_id) FROM events_b
              UNION ALL
              SELECT 'accepted_status',
                sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
              FROM orders_b
              UNION ALL
              SELECT 'range_discount',
                sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
              FROM lineitem_b
              UNION ALL
              SELECT 'not_null_text',
                sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
              FROM documents
            )
            SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
              n_violations = 0 AS pass
            FROM checks""")
  )

  /** Raw SQL driving the CUSTOM PHYSICAL OPERATOR: the row_number
    * tutorial idiom (rank filter over a window) is lowered by the
    * opt-in [[graft.plans.RewriteRankFilterToTopK]] Rule onto the
    * bounded-heap [[graft.plans.TopKPerKeyPlan]] — O(n log k) with a
    * map-side partial heap, instead of WindowExec's full per-partition
    * sort. The query REQUIRES the rewritten plan (a `TopKPerKey` node)
    * before executing, so its green oracle row is simultaneously the
    * proof that SQL text reaches the custom SparkPlan and that the heap
    * reproduces the window's answer bit-for-bit (the ORDER BY is total,
    * so ties cannot hide behind row_number nondeterminism). The rewrite
    * flag is scoped to this query: set, executed eagerly, restored —
    * the engine-wide default stays off on the measured fixture-scale
    * crossover (see RewriteRankFilterToTopK's scaladoc). */
  val sqlTopK = Q(
    "sql_entry_topk",
    "Raw-SQL per-key top-3 (rank-filter idiom) lowered onto the custom bounded-heap TopKPerKey operator by the opt-in rewrite Rule; plan-asserted in-query, oracled by the same rank filter in DuckDB.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      runLoweredTopK(s, """
          SELECT user_id, event_id, value FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id ASC) AS rn
            FROM events WHERE user_id < 50) t
          WHERE rn <= 3""",
        requiredNodes = Seq("TopKPerKey"))
    },
    Some("""SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rn
              FROM events WHERE user_id < 50) t
            WHERE rn <= 3""")
  )

  /** SCD Type-2 history as PURE SQL (VERDICT r10 next #6): u5's
    * two-window shape — lag() marks state changes, the filtered change
    * rows get version numbers and lead()-derived validity intervals with
    * the -1 open sentinel — in one statement. The only dialect split is
    * the epoch-micros spelling (`unix_micros` vs DuckDB `epoch_us`);
    * every other byte of the text is shared. Same scale shape as the
    * DataFrame form: both windows partition by user_id, never
    * corpus-global. */
  val sqlScd2 = Q(
    "sql_entry_scd2",
    "Raw-SQL SCD Type-2: lag-marked state changes, versioned validity intervals from lead(), -1 open sentinel; same answer and oracle shape as u5_scd2_history.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      s.sql("""
        WITH marked AS (
          SELECT user_id, event_id, ts, event_type,
            lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ), changes AS (
          SELECT user_id, event_id, ts, event_type
          FROM marked WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
          event_type,
          unix_micros(ts) AS valid_from_us,
          coalesce(lead(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
            CAST(-1 AS BIGINT)) AS valid_to_us,
          CASE WHEN coalesce(lead(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
            CAST(-1 AS BIGINT)) = -1 THEN 1 ELSE 0 END AS is_current
        FROM changes""")
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, ts, event_type,
                lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ), changes AS (
              SELECT user_id, event_id, ts, event_type
              FROM marked WHERE prev IS NULL OR prev <> event_type
            )
            SELECT user_id,
              CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
              event_type,
              epoch_us(ts) AS valid_from_us,
              coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                CAST(-1 AS BIGINT)) AS valid_to_us,
              CASE WHEN coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                CAST(-1 AS BIGINT)) = -1 THEN 1 ELSE 0 END AS is_current
            FROM changes""")
  )

  /** Dedup-cluster resolution as PURE SQL (VERDICT r10 next #6): the
    * LSH candidate pipeline (same text as sql_entry_lsh_dedup, driving
    * the native `minhash_sigs` from SQL) followed by connected
    * components via TRANSITIVE CLOSURE BY ITERATED SQUARING — six
    * static DISTINCT self-joins, each doubling the covered path length
    * (identity ∪ edges, then R←R∘R ×6 ⇒ diameter ≤ 64, the same
    * log-diameter coverage as the CC operator's 6 pointer-jumping
    * rounds). A recursive CTE cannot express this fixpoint on Spark
    * 4.1: the engine rejects UNION-distinct recursion
    * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) and UNION ALL diverges on
    * the symmetric (cyclic) pair graph — the squaring form is the SQL
    * text that terminates, and it is exactly the pointer-jumping math
    * spelled declaratively. Closure size is Σ|component|² pairs —
    * bounded here by the 2–100 LSH bucket cap; at 100 TB this face
    * hands off to [[graft.ops.ConnectedComponents]] (node-linear state),
    * exactly as the recursive-CTE BFS face hands off to the Bfs
    * operator.
    *
    * The verified pair set is MATERIALIZED once (eager localCheckpoint
    * → temp view) before the closure statement — the a12_reachability
    * precedent: Spark inlines a CTE at every reference, and each
    * squaring references its predecessor twice, so leaving the LSH
    * candidate pipeline inside the chain re-executes it 2⁶ times
    * (measured 44.8 s at sf0.1; ~1 s with the pair artifact
    * checkpointed — at 100 TB the verified pairs are a stored table
    * anyway). The 2⁶ inlined references to the CHECKPOINTED pairs are
    * sub-millisecond ExistingRDD scans. Oracle = a10_dedup_clusters'
    * recursive-fixpoint DuckDB text, so the SQL face must reproduce the
    * operator's components exactly. */
  val sqlDedupClusters = Q(
    "sql_entry_dedup_clusters",
    "Raw-SQL dedup clusters: LSH candidates + exact-Jaccard pairs (materialized once), then connected components via 6 DISTINCT closure-squaring self-joins (diameter <= 64); oracle = the recursive-fixpoint closure in DuckDB, same answer as a10_dedup_clusters.",
    (s, dir) => {
      val pairs = lshVerifiedPairsSql(s, dir,
        "SELECT i, j FROM ver WHERE jac >= 0.9").localCheckpoint()
      // query-scoped view name: a fixed name collides under concurrent
      // query evaluation in one session
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val view = s"dedup_pairs_$tag"
      pairs.createOrReplaceTempView(view)
      // Each squaring round is MATERIALIZED (r12 optimization): Spark
      // inlines a multi-referenced CTE at every reference, and each
      // round references its predecessor twice, so the in-line chain
      // r1..r6 planned as ONE statement re-plans and re-executes round
      // k's join 2^(6-k) times — the executed plan carried 762 Exchange
      // nodes (plans/r12/sql_entry_dedup_clusters_before.txt). Running
      // the SAME round statement six times over a checkpointed
      // predecessor keeps every round's join single-execution (~4
      // exchanges each) while the SQL text per round stays the squaring
      // statement. Identical closure: R <- R compose R, six times,
      // diameter <= 64, exactly as before.
      var r = s.sql(s"""
        SELECT i AS src, j AS dst FROM $view
        UNION SELECT j, i FROM $view
        UNION SELECT i, i FROM $view
        UNION SELECT j, j FROM $view""").localCheckpoint()
      // Early fixpoint exit (sound, not a heuristic): r0 contains every
      // identity pair and squaring preserves them, so each round's
      // relation is a SUPERSET of its predecessor — count equality is
      // set equality is the closure fixpoint, and further squarings are
      // the identity. The count reads an already-materialized
      // checkpoint, so the check costs no extra pass; near-clique dedup
      // graphs reach the fixpoint in 2 rounds instead of paying all 6.
      var prevCount = r.count()
      var k = 1
      var fixed = false
      while (k <= 6 && !fixed) {
        val rv = s"dedup_r${k - 1}_$tag"
        r.createOrReplaceTempView(rv)
        r = s.sql(
          s"SELECT DISTINCT a.src, b.dst FROM $rv a JOIN $rv b ON a.dst = b.src")
          .localCheckpoint()
        s.catalog.dropTempView(rv)
        val c = r.count()
        fixed = c == prevCount
        prevCount = c
        k += 1
      }
      val rv6 = s"dedup_r6_$tag"
      r.createOrReplaceTempView(rv6)
      val out = s.sql(s"""
        WITH comp AS (
          SELECT src AS node, min(dst) AS cluster_id FROM $rv6 GROUP BY src
        )
        SELECT cluster_id, count(*) AS n_members, max(node) AS max_member
        FROM comp GROUP BY cluster_id""")
      // the views are resolved into the analyzed plans; safe to drop now
      s.catalog.dropTempView(rv6)
      s.catalog.dropTempView(view)
      out
    },
    Some("""WITH RECURSIVE d AS (
              SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
            ), hs AS (
              SELECT doc_id, toks, list_transform(toks, t -> md5(t)) AS hs FROM d
            ), sig AS (
              SELECT doc_id, toks,
                [ list_aggregate(list_transform(hs, h -> substring(h, 1 + 5*i, 5)), 'min')
                  for i in generate_series(0, 5) ] AS mh
              FROM hs
            ), all_bands AS (
              SELECT doc_id, b, mh[2*b+1] || mh[2*b+2] AS band_key
              FROM sig, unnest(generate_series(0, 2)) AS t(b)
            ), keep AS (
              SELECT b, band_key FROM all_bands GROUP BY b, band_key
              HAVING count(*) BETWEEN 2 AND 100
            ), bands AS (
              SELECT all_bands.* FROM all_bands JOIN keep USING (b, band_key)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
              FROM bands a JOIN bands b USING (b, band_key) WHERE a.doc_id < b.doc_id
            ), ver AS (
              SELECT i, j,
                CAST(len(list_filter(da.toks, t -> list_contains(db.toks, t))) AS DOUBLE) /
                (len(da.toks) + len(db.toks)
                   - len(list_filter(da.toks, t -> list_contains(db.toks, t)))) AS jac
              FROM cand JOIN d da ON da.doc_id = i JOIN d db ON db.doc_id = j
            ), p AS (SELECT i, j FROM ver WHERE jac >= 0.9),
            edges AS (SELECT i AS src, j AS dst FROM p UNION SELECT j AS src, i AS dst FROM p),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            reach AS (
              SELECT node AS src, node AS dst FROM nodes
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
            ),
            comp AS (SELECT src AS node, min(dst) AS cluster_id FROM reach GROUP BY src)
            SELECT cluster_id, count(*) AS n_members, max(node) AS max_member
            FROM comp GROUP BY cluster_id""")
  )

  /** The sequential funnel as PURE SQL (the last family the r10 verdict
    * listed as SQL-unreachable): three stage CTEs, each stage's entry
    * the MIN event time strictly after the previous stage's — the same
    * three filtered aggregates + two user-keyed equi-joins as
    * w4_funnel's DataFrame plan. Dialect split: `unix_micros` vs
    * `epoch_us` only. */
  val sqlFunnel = Q(
    "sql_entry_funnel",
    "Raw-SQL sequential funnel view->click->purchase: min-after-previous stage entries, stage census + exact integer conversion-time sums; same oracle shape as w4_funnel.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      s.sql("""
        WITH e AS (
          SELECT user_id, event_type, unix_micros(ts) AS us FROM events
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
          SELECT user_id, '1_view' AS stage, CAST(0 AS BIGINT) AS lat_us FROM v
          UNION ALL
          SELECT user_id, '2_click', tc - tv FROM c
          UNION ALL
          SELECT user_id, '3_purchase', tp - tv FROM p
        )
        SELECT stage, count(*) AS n_users,
               CAST(sum(lat_us) AS BIGINT) AS total_latency_us
        FROM stages GROUP BY stage""")
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

  /** The retention triangle as PURE SQL: first-seen-day cohorts ×
    * day-age distinct-active counts — one min-aggregate + one
    * distinct + one user-keyed join, exactly w7_retention_cohorts'
    * plan. Dialect splits: to_date/date_format vs CAST/strftime, and
    * the datediff argument order. */
  val sqlRetention = Q(
    "sql_entry_retention",
    "Raw-SQL retention cohorts: first-activity-day cohort x age-days distinct active users, exact integer counts; same oracle shape as w7_retention_cohorts.",
    (s, dir) => {
      Tables(s, dir).events.createOrReplaceTempView("events")
      s.sql("""
        WITH fs AS (
          SELECT user_id, min(to_date(ts)) AS cohort FROM events GROUP BY 1
        ), act AS (
          SELECT DISTINCT user_id, to_date(ts) AS day FROM events
        )
        SELECT date_format(cohort, 'yyyy-MM-dd') AS cohort,
               datediff(day, cohort) AS age_days,
               count(DISTINCT user_id) AS n_active
        FROM act JOIN fs USING (user_id)
        GROUP BY 1, 2""")
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

  /** The vector/ANN family's SQL face (VERDICT r11 next #6 — "the
    * surface a modern SQL user asks for first"): raw text driving the
    * NATIVE codegen [[graft.functions.CosineSimilarity]] through
    * `ORDER BY cosine_sim(...) DESC LIMIT k`. The plan is asserted
    * in-query to be TakeOrderedAndProject — Spark's bounded-heap
    * order-by-limit, O(n) scan + k-heap per partition, never a full
    * sort — carrying the native expression; at 100 TB this is the
    * brute-force rerank leg of the IVF/PQ paths (j5 family), whose SQL
    * spelling is exactly this text. Oracle = the j5_topk_cosine fold
    * (list_reduce in Spark's evaluation order), so the native kernel's
    * doubles must match DuckDB's bit-for-bit through round(.,6). */
  val sqlAnn = Q(
    "sql_entry_ann",
    "Raw-SQL ANN: ORDER BY native cosine_sim DESC LIMIT 10 for one query vector; plan-asserted TakeOrderedAndProject (bounded heap, no full sort); j5-family oracle.",
    (s, dir) => {
      Tables(s, dir).embeddings.createOrReplaceTempView("embeddings")
      val df = s.sql("""
        WITH sc AS (
          SELECT e.vec_id, cosine_sim(q.embedding, e.embedding) AS cos
          FROM embeddings e JOIN embeddings q ON q.vec_id = 0
          WHERE e.vec_id <> 0
        )
        SELECT vec_id, round(cos, 6) AS cosine
        FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 10""")
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("TakeOrderedAndProject"),
        s"ORDER BY + LIMIT did not plan as a bounded heap:\n${plan.take(1500)}")
      require(plan.contains("cosine_sim"),
        s"native expression missing from plan:\n${plan.take(1500)}")
      df
    },
    Some("""WITH n AS (
              SELECT vec_id, embedding FROM embeddings),
            sc AS (
              SELECT e.vec_id,
                list_reduce(list_transform(generate_series(1, 64),
                    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                  (x, y) -> x + y)
                / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)),
                    (x, y) -> x + y))
                 * sqrt(list_reduce(list_transform(generate_series(1, 64),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                    (x, y) -> x + y))) AS cos
              FROM n q JOIN n e ON q.vec_id = 0 AND e.vec_id <> 0)
            SELECT vec_id, round(cos, 6) AS cosine
            FROM sc ORDER BY cos DESC, vec_id ASC LIMIT 10""")
  )

  /** The per-key ANN form — rank-filter SQL over the native cosine,
    * LOWERED onto the custom bounded-heap [[graft.plans.TopKPerKeyPlan]]
    * by the opt-in rewrite Rule (the r11 stretch goal): one statement
    * exercises native expression + custom LogicalPlan + Strategy + heap
    * SparkPlan from raw SQL text. Plan-asserted in-query; same
    * no-driver-collect execution discipline as sql_entry_topk. The
    * output deliberately omits the rank column — the rewrite's
    * soundness gate requires the projection not reference it (see
    * RewriteRankFilterToTopK's scaladoc). */
  val sqlAnnPerKey = Q(
    "sql_entry_ann_perkey",
    "Raw-SQL per-query-vector top-5 cosine (rank-filter idiom over native cosine_sim) lowered onto the custom TopKPerKey heap operator; plan-asserted, no driver collect.",
    (s, dir) => {
      Tables(s, dir).embeddings.createOrReplaceTempView("embeddings")
      runLoweredTopK(s, """
          WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5
          ), sc AS (
            SELECT q.q_id, e.vec_id, cosine_sim(q.q_emb, e.embedding) AS cos
            FROM q JOIN embeddings e ON q.q_id <> e.vec_id
          )
          SELECT q_id, vec_id, round(cos, 6) AS cosine FROM (
            SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id ASC) AS rn
            FROM sc) t
          WHERE rn <= 5""",
        requiredNodes = Seq("TopKPerKey", "cosine_sim"))
    },
    Some("""WITH n AS (
              SELECT vec_id, embedding,
                sqrt(list_reduce(list_transform(generate_series(1, 64),
                       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                     (x, y) -> x + y)) AS nrm
              FROM embeddings),
            pairs AS (
              SELECT q.vec_id AS q_id, e.vec_id,
                list_reduce(list_transform(generate_series(1, 64),
                    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                  (x, y) -> x + y) / (q.nrm * e.nrm) AS cos
              FROM n q JOIN n e ON q.vec_id < 5 AND q.vec_id <> e.vec_id),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
              FROM pairs)
            SELECT q_id, vec_id, round(cos, 6) AS cosine FROM ranked WHERE rank <= 5""")
  )

  def all: Seq[Q] = Seq(sqlAsof, sqlLshDedup, sqlBm25, sqlMerge, sqlWindow,
    sqlContract, sqlTopK, sqlScd2, sqlDedupClusters, sqlFunnel, sqlRetention,
    sqlAnn, sqlAnnPerKey)
}
