package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A13 ⊕ dataset MONITORING — the observability layer a 100 TB training
  * corpus needs between pipeline runs: is today's batch distributed like
  * yesterday's (drift), and what does each source actually contain
  * (profile card)? The reference stops at per-request summaries
  * (orchestrator.py:850); these are the corpus-level rollups a curation
  * team would page on.
  *
  * Both follow graft's oracle-exactness rule: all statistics are exact
  * integer arithmetic (counts, parts-per-million frequencies, integer-div
  * means, rank-based medians) — no libm logs, no float accumulation — so
  * the DuckDB oracle hash-matches bit-for-bit and the result is invariant
  * to partitioning and fold order.
  */
object MonitorQueries {

  /** Distribution drift between two document batches, on the classic
    * PSI/KL shape but log-free: bucket `n_chars` into 20 fixed-width
    * bins, express each batch's bin mass in parts-per-million (ppm,
    * integer-div — order-independent), and report per-bin
    * |ref_ppm − cur_ppm| (summing the column gives 2× the total
    * variation distance in ppm) plus a chi-square-style
    * (ref−cur)²/(cur+1) integer surrogate that, like PSI, over-weights
    * bins that moved a lot relative to their size. Batches here are the
    * even/odd doc_id halves — the stand-in for yesterday/today.
    *
    * Scale shape: ONE census over a bounded bin domain (≤ 20 × 2 groups
    * after the map-side partial agg — kilobytes on the wire no matter
    * the corpus size), then a broadcast of the single-row batch totals.
    * Nothing is per-document after the first aggregate; the plan is a
    * scan + one tiny shuffle at any scale. */
  val driftTvd = Q(
    "a13_drift_tvd",
    "Distribution drift, log-free PSI shape: 20 fixed n_chars bins, per-batch ppm mass, |ref-cur| ppm and (ref-cur)^2/(cur+1) per bin.",
    (s, dir) => {
      val t = Tables(s, dir)
      val binned = t.documents.select(
        expr("least(n_chars div 100L, 19L)").as("bin"),
        (col("doc_id") % 2 === 0).as("is_ref"))
      val perBin = binned.groupBy(col("bin")).agg(
        count(when(col("is_ref"), 1)).as("c_ref"),
        count(when(!col("is_ref"), 1)).as("c_cur"))
      val totals = perBin.agg(sum(col("c_ref")).as("t_ref"), sum(col("c_cur")).as("t_cur"))
      perBin.crossJoin(broadcast(totals))
        .select(col("bin"),
          expr("(c_ref * 1000000L) div t_ref").as("ref_ppm"),
          expr("(c_cur * 1000000L) div t_cur").as("cur_ppm"))
        .withColumn("diff_ppm", abs(col("ref_ppm") - col("cur_ppm")))
        .withColumn("drift_score",
          expr("((ref_ppm - cur_ppm) * (ref_ppm - cur_ppm)) div (cur_ppm + 1L)"))
        .orderBy(col("bin"))
    },
    Some("""WITH binned AS (
              SELECT least(n_chars // 100, 19) AS bin, doc_id % 2 = 0 AS is_ref
              FROM documents
            ), per_bin AS (
              SELECT bin,
                count(CASE WHEN is_ref THEN 1 END) AS c_ref,
                count(CASE WHEN NOT is_ref THEN 1 END) AS c_cur
              FROM binned GROUP BY 1
            ), tot AS (
              SELECT sum(c_ref) AS t_ref, sum(c_cur) AS t_cur FROM per_bin
            ), ppm AS (
              SELECT bin,
                CAST((c_ref * 1000000) // t_ref AS BIGINT) AS ref_ppm,
                CAST((c_cur * 1000000) // t_cur AS BIGINT) AS cur_ppm
              FROM per_bin, tot
            )
            SELECT bin, ref_ppm, cur_ppm,
              abs(ref_ppm - cur_ppm) AS diff_ppm,
              CAST(((ref_ppm - cur_ppm) * (ref_ppm - cur_ppm)) // (cur_ppm + 1) AS BIGINT) AS drift_score
            FROM ppm ORDER BY bin""")
  )

  /** Per-source dataset card — the one-page profile a curation team
    * reads before training: volume (docs, chars), language spread,
    * emptiness, length range, exact rank-based median length, and mean
    * length (integer div). The median is percentile_disc-style — the
    * value at ordered position (n+1)/2, tie-broken by doc_id — computed
    * with a per-source window, NOT percentile_approx: exact, and
    * cross-engine stable where approx sketches are not.
    *
    * Scale shape: one shuffle by source for the window (sources are few;
    * if one source held half the corpus you'd pre-aggregate by
    * (source, n_chars) first — the bounded-domain trick budget_select
    * uses), then a per-source aggregate. No driver-side anything. */
  val profileCard = Q(
    "a13_profile_card",
    "Per-source dataset card: n_docs, langs, chars total/mean/min/max, exact rank-median n_chars, empty-doc count.",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
      val ranked = t.documents.select(
          col("source"), col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"),
          (length(col("text")) === 0 || col("text").isNull).as("empty"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("source"))))
      ranked.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        expr("sum(n_chars) div count(1)").as("mean_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("n_chars"))).as("median_chars"),
        count(when(col("empty"), 1)).as("n_empty"))
        .orderBy(col("source"))
    },
    Some("""WITH ranked AS (
              SELECT source, doc_id, lang, n_chars,
                (length(text) = 0 OR text IS NULL) AS empty,
                row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
                count(*) OVER (PARTITION BY source) AS cnt
              FROM documents
            )
            SELECT source,
              count(*) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              CAST(sum(n_chars) AS BIGINT) AS total_chars,
              CAST(sum(n_chars) // count(*) AS BIGINT) AS mean_chars,
              min(n_chars) AS min_chars,
              max(n_chars) AS max_chars,
              max(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS median_chars,
              count(CASE WHEN empty THEN 1 END) AS n_empty
            FROM ranked GROUP BY 1 ORDER BY 1""")
  )

  /** Trending terms — a13_drift_tvd at TOKEN granularity: which words
    * gained the most corpus mass between the reference and current
    * batches (even/odd doc_id halves again)? Each batch's token counts
    * become ppm masses (integer-div, order-independent), and the rise
    * score is the signed ppm delta; the result is the top-20 risers.
    * This is the monitor that catches a new spam template or scraped
    * domain changing the vocabulary before a quality metric moves.
    *
    * Scale shape: unlike the bin census, the token domain is UNBOUNDED —
    * so the plan demonstrates the other monitoring discipline: one
    * token census (map-side combinable), one single-row total broadcast,
    * and a global top-k that plans as TakeOrderedAndProject — the
    * full-ordering never materializes, output stays 20 rows at any
    * corpus size. */
  val trendingTerms = Q(
    "a13_trending_terms",
    "Token-level drift: per-batch ppm mass per token, top-20 by signed ppm rise (cur - ref) — TakeOrdered over an unbounded token domain.",
    (s, dir) => {
      val t = Tables(s, dir)
      val toks = t.documents.select(
        (col("doc_id") % 2 === 0).as("is_ref"),
        explode(split(col("text"), " ")).as("tok"))
      val perTok = toks.groupBy(col("tok")).agg(
        count(when(col("is_ref"), 1)).as("c_ref"),
        count(when(!col("is_ref"), 1)).as("c_cur"))
      val totals = perTok.agg(sum(col("c_ref")).as("t_ref"), sum(col("c_cur")).as("t_cur"))
      perTok.crossJoin(broadcast(totals))
        .select(col("tok"),
          expr("(c_ref * 1000000L) div t_ref").as("ref_ppm"),
          expr("(c_cur * 1000000L) div t_cur").as("cur_ppm"))
        .withColumn("rise_ppm", col("cur_ppm") - col("ref_ppm"))
        .orderBy(col("rise_ppm").desc, col("tok").asc)
        .limit(20)
    },
    Some("""WITH toks AS (
              SELECT doc_id % 2 = 0 AS is_ref,
                unnest(string_split(text, ' ')) AS tok
              FROM documents
            ), per_tok AS (
              SELECT tok,
                count(CASE WHEN is_ref THEN 1 END) AS c_ref,
                count(CASE WHEN NOT is_ref THEN 1 END) AS c_cur
              FROM toks GROUP BY 1
            ), tot AS (
              SELECT sum(c_ref) AS t_ref, sum(c_cur) AS t_cur FROM per_tok
            ), ppm AS (
              SELECT tok,
                CAST((c_ref * 1000000) // t_ref AS BIGINT) AS ref_ppm,
                CAST((c_cur * 1000000) // t_cur AS BIGINT) AS cur_ppm
              FROM per_tok, tot
            )
            SELECT tok, ref_ppm, cur_ppm, cur_ppm - ref_ppm AS rise_ppm
            FROM ppm ORDER BY rise_ppm DESC, tok ASC LIMIT 20""")
  )

  /** Embedding-space drift — the vector-side companion to the text
    * monitors: per label, how far did the batch centroid MOVE between
    * the reference and current halves (even/odd vec_id)? Reported as
    * the exact squared L2 distance between the two centroids in
    * micro-unit integers. A retrained embedding model, a corrupted
    * encoder, or a shifted upstream corpus all announce themselves here
    * before any retrieval metric degrades.
    *
    * Exactness: values are fixed-pointed (floor·1e6) then OFFSET by
    * +2e6 so every per-dim sum is non-negative — integer division
    * truncation and floor agree on non-negatives, so Spark's `div` and
    * DuckDB's `//` compute the same centroid (the offset cancels in the
    * centroid difference up to that shared rounding). Labels must
    * appear in both halves (guarded; true of the fixtures).
    *
    * Scale shape: one (label × 64-dim) census — bounded groups, map-side
    * combinable — then a per-label rollup. Corpus size only changes the
    * scan, never the state. */
  val embeddingDrift = Q(
    "a13_embedding_drift",
    "Per-label centroid shift between vec_id-parity halves: exact micro-unit squared L2 between half-centroids over a bounded (label, dim) census.",
    (s, dir) => {
      val t = Tables(s, dir)
      val dims = t.embeddings
        .select(col("label"), (col("vec_id") % 2 === 0).as("is_ref"),
          posexplode(expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000d) as long) + 2000000L)"))
            .as(Seq("d", "v")))
      val cent = dims.groupBy(col("label"), col("d")).agg(
          sum(when(col("is_ref"), col("v"))).as("s_ref"),
          count(when(col("is_ref"), 1)).as("n_ref"),
          sum(when(!col("is_ref"), col("v"))).as("s_cur"),
          count(when(!col("is_ref"), 1)).as("n_cur"))
        .filter(col("n_ref") > 0 && col("n_cur") > 0)
        .withColumn("diff", expr("s_ref div n_ref - s_cur div n_cur"))
      cent.groupBy(col("label"))
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          sum(col("diff") * col("diff")).as("shift_l2sq_micro"))
        .orderBy(col("label"))
    },
    Some("""WITH dims AS (
              SELECT label, vec_id % 2 = 0 AS is_ref, i - 1 AS d,
                CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) + 2000000 AS v
              FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
            ), cent AS (
              SELECT label, d,
                CAST(sum(CASE WHEN is_ref THEN v END) AS BIGINT) AS s_ref,
                count(CASE WHEN is_ref THEN 1 END) AS n_ref,
                CAST(sum(CASE WHEN NOT is_ref THEN v END) AS BIGINT) AS s_cur,
                count(CASE WHEN NOT is_ref THEN 1 END) AS n_cur
              FROM dims GROUP BY 1, 2
            ), diffs AS (
              SELECT label, n_ref, n_cur, s_ref // n_ref - s_cur // n_cur AS diff
              FROM cent WHERE n_ref > 0 AND n_cur > 0
            )
            SELECT label, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
              CAST(sum(diff * diff) AS BIGINT) AS shift_l2sq_micro
            FROM diffs GROUP BY 1 ORDER BY 1""")
  )

  /** A13 ⊕ — threshold-free signal-quality eval (AUC): before a
    * filtering pipeline trusts a score, it asks "does the score RANK
    * the classes apart?" — AUC, the Mann–Whitney rank statistic, is
    * that answer with no threshold baked in. Computed WITHOUT a
    * corpus-global rank window: per score-value census (pc, nc), then
    * pairs-won = Σ pc·(2·cumneg_below + nc) in doubled units so value
    * ties contribute exactly ½ each — pure integers end to end, and the
    * only unpartitioned window runs over the BOUNDED distinct-value
    * domain, never corpus rows (the a10_budget_select discipline).
    * Evaluated here: does doc length separate English from non-English
    * (the kind of sanity probe run before using length in a lang-aware
    * quality cascade). */
  val aucScore = Q(
    "a13_auc_score",
    "Threshold-free AUC (Mann-Whitney, tie-exact doubled units) of n_chars as an is-English discriminator; value-domain census, exact basis points.",
    (s, dir) => {
      val t = Tables(s, dir)
      val census = t.documents
        .select(col("n_chars"), (col("lang") === "en").cast("long").as("is_pos"))
        .groupBy(col("n_chars"))
        .agg(sum(col("is_pos")).as("pc"), sum(lit(1L) - col("is_pos")).as("nc"))
      val w = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
      census.withColumn("cumneg", coalesce(sum(col("nc")).over(w), lit(0L)))
        .agg(sum(col("pc")).as("n_pos"), sum(col("nc")).as("n_neg"),
          count(lit(1)).as("n_values"),
          sum(col("pc") * (lit(2L) * col("cumneg") + col("nc"))).as("u2"))
        .withColumn("auc_bp", expr("u2 * 10000 div (2 * n_pos * n_neg)"))
        .select(col("n_pos"), col("n_neg"), col("n_values"), col("u2"),
          col("auc_bp"))
    },
    Some("""WITH c AS (
              SELECT n_chars,
                CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pc,
                CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS nc
              FROM documents GROUP BY 1
            ), s AS (
              SELECT *, coalesce(sum(nc) OVER (ORDER BY n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
              FROM c
            )
            SELECT CAST(sum(pc) AS BIGINT) AS n_pos,
              CAST(sum(nc) AS BIGINT) AS n_neg,
              count(*) AS n_values,
              CAST(sum(pc * (2 * cumneg + nc)) AS BIGINT) AS u2,
              CAST(sum(pc * (2 * cumneg + nc)) * 10000
                // (2 * sum(pc) * sum(nc)) AS BIGINT) AS auc_bp
            FROM s""")
  )

  /** A13 extension — calibration reliability bins + expected calibration
    * error (the companion to [[aucScore]]: AUC measures ranking, ECE
    * measures whether predicted probabilities MEAN what they say —
    * Naeini et al. 2015's binned estimator). The "model" is the same
    * deterministic length-based is-English score the AUC probe ranks by,
    * mapped to [0,1] micro-units: score = least(n_chars, 2000)/2000.
    * Per decile bin: count, predicted-positive mass, observed positives,
    * per-bin gap and the N-weighted ECE — all exact integers (micro-unit
    * scores, basis-point gaps), so both engines hash identically.
    * Scale shape: one map-side-combined groupBy on the 10-value bin key;
    * the only windows run over the BOUNDED 10-row bin domain (the
    * a13_auc_score discipline) — corpus rows are touched exactly once. */
  val calibrationBins = Q(
    "a13_calibration_bins",
    "Calibration reliability diagram: decile bins of a deterministic [0,1] score, per-bin predicted-vs-observed gap and exact integer ECE in basis points.",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(
          expr("least(n_chars, 2000) * 500").as("score_micro"),
          (col("lang") === "en").cast("long").as("is_pos"))
        .withColumn("bin", least(expr("score_micro div 100000"), lit(9L)))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("score_micro")).as("pred_micro"),
          sum(col("is_pos")).as("obs_pos"))
        .withColumn("gap_bp",
          expr("abs(pred_micro - obs_pos * 1000000) * 10000 div (n * 1000000)"))
        .withColumn("tot_gap",
          sum(abs(col("pred_micro") - col("obs_pos") * 1000000))
            .over(Window.partitionBy()))
        .withColumn("tot_n", sum(col("n")).over(Window.partitionBy()))
        .withColumn("ece_bp", expr("tot_gap * 10000 div (tot_n * 1000000)"))
        .select(col("bin"), col("n"), col("pred_micro"), col("obs_pos"),
          col("gap_bp"), col("ece_bp"))
    },
    Some("""WITH b AS (
              SELECT least(least(n_chars, 2000) * 500 // 100000, 9) AS bin,
                least(n_chars, 2000) * 500 AS score_micro,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
              FROM documents
            ), g AS (
              SELECT bin, count(*) AS n,
                CAST(sum(score_micro) AS BIGINT) AS pred_micro,
                CAST(sum(is_pos) AS BIGINT) AS obs_pos
              FROM b GROUP BY bin
            )
            SELECT bin, n, pred_micro, obs_pos,
              CAST(abs(pred_micro - obs_pos * 1000000) * 10000
                // (n * 1000000) AS BIGINT) AS gap_bp,
              CAST(sum(abs(pred_micro - obs_pos * 1000000)) OVER () * 10000
                // (sum(n) OVER () * 1000000) AS BIGINT) AS ece_bp
            FROM g""")
  )

  /** A13 extension — SLO error-budget burn rate with the multiwindow
    * alert rule (the SRE-workbook pager policy): error share per
    * 30-minute bucket, trailing 6 h (12-bucket) and 30 min (1-bucket)
    * burn rates against a 1 % error SLO, alert only when BOTH windows
    * burn ≥ 6× — the long window proves budget is really being spent,
    * the short window proves it is STILL being spent (no paging on a
    * recovered blip). All rates are exact integer basis points
    * (burn ≥ 6× SLO ⇔ rate ≥ 600 bp), and the only unpartitioned
    * window runs over the BOUNDED time-bucket domain (buckets grow with
    * wall-clock span, not data volume — at 100 TB/day this table is
    * still 48 rows/day). One scan, one bucket census, two range
    * windows. */
  val sloBurnRate = Q(
    "a13_slo_burn_rate",
    "SLO burn rate: 30-min error-share buckets, trailing 6h + 30min burn vs a 1% target in exact bp, both-windows >=6x alert rule.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val buckets = t.events
        .select(expr("unix_micros(ts) div 1800000000").as("bucket"),
          (col("event_type") === "error").cast("long").as("is_err"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("is_err")).as("errs"))
      val wLong = Window.orderBy(col("bucket")).rangeBetween(-11, 0)
      buckets
        .withColumn("n_long", sum(col("n")).over(wLong))
        .withColumn("err_long", sum(col("errs")).over(wLong))
        .withColumn("burn_long_bp", expr("err_long * 10000 div n_long"))
        .withColumn("burn_short_bp", expr("errs * 10000 div n"))
        .withColumn("alert", col("burn_long_bp") >= 600 && col("burn_short_bp") >= 600)
        .select(col("bucket"), col("n"), col("errs"), col("n_long"), col("err_long"),
          col("burn_long_bp"), col("burn_short_bp"), col("alert"))
    },
    Some("""WITH b AS (
              SELECT epoch_us(ts) // 1800000000 AS bucket,
                count(*) AS n,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errs
              FROM events GROUP BY 1
            ), w AS (
              SELECT *,
                CAST(sum(n) OVER (ORDER BY bucket RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_long,
                CAST(sum(errs) OVER (ORDER BY bucket RANGE BETWEEN 11 PRECEDING AND CURRENT ROW) AS BIGINT) AS err_long
              FROM b
            )
            SELECT bucket, n, errs, n_long, err_long,
              CAST(err_long * 10000 // n_long AS BIGINT) AS burn_long_bp,
              CAST(errs * 10000 // n AS BIGINT) AS burn_short_bp,
              (err_long * 10000 // n_long >= 600 AND errs * 10000 // n >= 600) AS alert
            FROM w""")
  )

  /** A13 extension — two-sample Kolmogorov–Smirnov drift test, the
    * distribution-free companion to the binned TVD above: where
    * [[driftTvd]] fixes a bin width and can miss shifts inside a bin,
    * KS compares the full empirical CDFs and reports the worst
    * separation anywhere on the axis. Populations are the even/odd
    * user_id halves of `events.value` (the A/B stand-in); the statistic
    * is computed entirely in integer arithmetic: per-cents cumulative
    * counts, per-side ppm CDFs by integer division, D = max |cdfA −
    * cdfB| with the argmax tie broken at the smallest cents value.
    *
    * Scale shape: one census over the bounded cents domain (values are
    * range-bounded, so distinct cents is a fixed-size domain no matter
    * the row count), then ONE unpartitioned cumulative window over that
    * bounded census — the same bounded-domain window contract as
    * a13_slo_burn_rate. fa ≤ 2^63/1e6 rows keeps fa·1e6 in range up to
    * ~9·10¹² rows per side. */
  val ksStat = Q(
    "a13_ks_stat",
    "Two-sample KS statistic between even/odd user halves of events.value: integer ppm CDFs over the cents census, max |cdfA-cdfB| with smallest-cents tie-break.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val census = t.events
        .select(expr("cast(round(value * 100) as long)").as("cents"),
          (col("user_id") % 2 === 0).as("is_a"))
        .groupBy(col("cents"))
        .agg(count(when(col("is_a"), 1)).as("ca"),
          count(when(!col("is_a"), 1)).as("cb"))
      val wCum = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = census.select(col("cents"),
        sum(col("ca")).over(wCum).as("fa"),
        sum(col("cb")).over(wCum).as("fb"))
      val tot = census.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .select(col("cents"), col("na"), col("nb"),
          expr("abs((fa * 1000000L) div na - (fb * 1000000L) div nb)").as("d_ppm"))
        .orderBy(col("d_ppm").desc, col("cents").asc)
        .limit(1)
        .select(col("cents").as("argmax_cents"), col("d_ppm"),
          col("na"), col("nb"))
    },
    Some("""WITH c AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS cents,
                count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS ca,
                count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS cb
              FROM events GROUP BY 1
            ), cum AS (
              SELECT cents,
                sum(ca) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
                sum(cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
              FROM c
            ), tot AS (
              SELECT sum(ca) AS na, sum(cb) AS nb FROM c
            )
            SELECT cents AS argmax_cents,
              CAST(abs((fa * 1000000) // na - (fb * 1000000) // nb) AS BIGINT) AS d_ppm,
              CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb
            FROM cum, tot
            ORDER BY d_ppm DESC, argmax_cents ASC LIMIT 1""")
  )

  /** A13 extension — group-parity audit over the curation gate: for
    * each source, the rate at which its documents pass the length gate
    * (n_chars ≥ 500 — the a9/x28 quality-cascade keep proxy), in exact
    * ppm, plus the gap to the corpus-wide rate and the disparate-impact
    * ratio against the best-performing source (the EEOC four-fifths
    * framing: di < 800,000 ppm of the best group flags the gate as
    * skewed against that source). A training-data pipeline runs this
    * census after every filter change: a gate that silently drops one
    * source's documents 5× faster than another's shifts the corpus mix.
    *
    * Scale shape: one scan → per-source census (bounded by |sources|) →
    * single-row global broadcast. Nothing per-document after the first
    * aggregate. */
  val groupParity = Q(
    "a13_group_parity",
    "Group-parity audit: per-source keep rate under the n_chars>=500 gate in exact ppm, gap to the global rate, and four-fifths disparate-impact ratio vs the best source.",
    (s, dir) => {
      val t = Tables(s, dir)
      val per = t.documents.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          count(when(col("n_chars") >= 500, 1)).as("n_kept"))
        .withColumn("rate_ppm", expr("(n_kept * 1000000L) div n"))
      val glob = per.agg(
        sum(col("n")).as("tot_n"), sum(col("n_kept")).as("tot_kept"),
        max(col("rate_ppm")).as("best_ppm"))
      per.crossJoin(broadcast(glob))
        .select(col("source"), col("n"), col("n_kept"), col("rate_ppm"),
          expr("rate_ppm - (tot_kept * 1000000L) div tot_n").as("gap_ppm"),
          expr("(rate_ppm * 1000000L) div best_ppm").as("di_vs_best_ppm"))
        .withColumn("four_fifths_flag", col("di_vs_best_ppm") < 800000L)
        .orderBy(col("source"))
    },
    Some("""WITH per AS (
              SELECT source, count(*) AS n,
                count(CASE WHEN n_chars >= 500 THEN 1 END) AS n_kept
              FROM documents GROUP BY 1
            ), r AS (
              SELECT source, n, n_kept,
                CAST((n_kept * 1000000) // n AS BIGINT) AS rate_ppm
              FROM per
            ), g AS (
              SELECT sum(n) AS tot_n, sum(n_kept) AS tot_kept,
                max(rate_ppm) AS best_ppm FROM r
            )
            SELECT source, n, CAST(n_kept AS BIGINT) AS n_kept, rate_ppm,
              CAST(rate_ppm - (tot_kept * 1000000) // tot_n AS BIGINT) AS gap_ppm,
              CAST((rate_ppm * 1000000) // best_ppm AS BIGINT) AS di_vs_best_ppm,
              (rate_ppm * 1000000) // best_ppm < 800000 AS four_fifths_flag
            FROM r, g ORDER BY source""")
  )

  /** A13 extension — Theil–Sen robust trend: is the error rate actually
    * drifting up, or did a few bad buckets fool the least-squares line?
    * The Theil–Sen estimator is the median of all pairwise slopes —
    * breakdown point 29%, so outlier buckets (deploy spikes, backfill
    * gaps) can't drag the trend the way they drag a mean-based fit.
    * Over the bounded 30-minute error-rate census: y = per-bucket error
    * ppm (integer div), slope(i,j) = (yⱼ−yᵢ)·10⁶ div (xⱼ−xᵢ) — every
    * slope an exact integer, so the median is a deterministic rank
    * selection (lower median, ties broken by the pair's bucket ids).
    *
    * Scale shape: the pair expansion is over the TIME-BUCKET census —
    * C(buckets, 2) pairs grows with wall-clock span, not event volume
    * (48 buckets/day → ~10⁶ pairs/year, constant for a 100 TB/day
    * firehose). One event-volume census, then bounded-domain self-join
    * + rank window. */
  val theilSen = Q(
    "a13_theil_sen",
    "Theil-Sen robust trend of the 30-min error-rate series: median of all pairwise integer slopes (e6/bucket), lower-median rank selection, quartile band.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val buckets = t.events
        .select(expr("unix_micros(ts) div 1800000000").as("x"),
          (col("event_type") === "error").cast("long").as("is_err"))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("n"), sum(col("is_err")).as("errs"))
        .select(col("x"), expr("(errs * 1000000L) div n").as("y"))
        .localCheckpoint() // both sides of the bounded pair self-join
      // widen the checkpointed census (ops/ScanLayout): the C(B,2) pair
      // expansion is a broadcast nested-loop join whose parallelism is
      // the STREAMED side's partition count — the checkpoint inherits
      // the AQE-coalesced single partition, so the whole quadratic
      // stage (pairs + slope census partials) otherwise runs in one
      // task; hashing the B bucket rows out first is a ~B-row exchange
      val wideBuckets = graft.ops.ScanLayout.widenByKey(buckets, col("x"))
      val pairs = wideBuckets.select(col("x").as("xi"), col("y").as("yi"))
        .join(buckets.select(col("x").as("xj"), col("y").as("yj")),
          col("xi") < col("xj"))
        .select(expr("((yj - yi) * 1000000L) div (xj - xi)").as("slope_e6"))
      // Rank selection WITHOUT the global pair sort (r12 optimization):
      // the old form ranked all C(buckets,2) pairs through one
      // unpartitioned row_number window (a single-partition sort of the
      // full pair set, plus a checkpoint of it) — but the three rank
      // probes only ever read the SLOPE at a rank, and the slope at rank
      // r is independent of the (xi,xj) tie-break within equal slopes.
      // So aggregate to the slope census first (hash aggregate,
      // map-side-combined, fully parallel), take the cumulative count
      // over the DISTINCT slopes only (a bounded-domain window, the
      // a13_ks_stat contract), and pick the slope whose cumulative range
      // [lo, hi] covers each target rank. Identical output by
      // construction; the sort shrinks from |pairs| rows to
      // |distinct slopes|.
      val census = pairs.groupBy(col("slope_e6")).agg(count(lit(1)).as("c"))
        // lazy checkpoint: census has two consumers (the cumulative
        // window and the single-row total) — without it the C(B,2) pair
        // join re-executes for each; with it the first consumer
        // materializes the census-sized table once (local wall delta is
        // inside noise, the 2x pair-stage saving is the scale argument)
        .localCheckpoint(false)
      // SinglePartition window, bounded by |distinct slopes| ≤ C(B,2)
      // where B = |30-minute buckets| — data-dependent (e6 fixed-point
      // quotients collide freely) but capped by the bucket count the
      // time range fixes, NOT by row count: a year of buckets is
      // B ≈ 17.5k ⇒ at worst ~1.5e8 distinct slopes. Past that horizon,
      // range-partition the census on slope_e6 and compose per-range
      // subtotal offsets (the a13_ks_stat escape hatch). Fine at every
      // declared scale.
      val wCum = Window.orderBy(col("slope_e6"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = census
        .withColumn("hi", sum(col("c")).over(wCum))
        .withColumn("lo", col("hi") - col("c") + 1L)
      val m = census.agg(sum(col("c")).as("m"))
      cum.crossJoin(broadcast(m))
        .filter((col("lo") <= expr("(m + 1L) div 2L") && expr("(m + 1L) div 2L") <= col("hi")) ||
          (col("lo") <= expr("(m + 3L) div 4L") && expr("(m + 3L) div 4L") <= col("hi")) ||
          (col("lo") <= expr("(3L * m + 1L) div 4L") && expr("(3L * m + 1L) div 4L") <= col("hi")))
        .groupBy(col("m").as("n_pairs"))
        .agg(
          max(when(col("lo") <= expr("(m + 1L) div 2L") && expr("(m + 1L) div 2L") <= col("hi"),
            col("slope_e6"))).as("median_slope_e6"),
          max(when(col("lo") <= expr("(m + 3L) div 4L") && expr("(m + 3L) div 4L") <= col("hi"),
            col("slope_e6"))).as("p25_slope_e6"),
          max(when(col("lo") <= expr("(3L * m + 1L) div 4L") && expr("(3L * m + 1L) div 4L") <= col("hi"),
            col("slope_e6"))).as("p75_slope_e6"))
        .select(col("n_pairs"), col("median_slope_e6"),
          col("p25_slope_e6"), col("p75_slope_e6"))
    },
    Some("""WITH b AS (
              SELECT epoch_us(ts) // 1800000000 AS x,
                count(*) AS n,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errs
              FROM events GROUP BY 1
            ), pts AS (
              SELECT x, CAST((errs * 1000000) // n AS BIGINT) AS y FROM b
            ), pairs AS (
              SELECT a.x AS xi, c.x AS xj,
                ((c.y - a.y) * 1000000) // (c.x - a.x) AS slope_e6
              FROM pts a JOIN pts c ON a.x < c.x
            ), ranked AS (
              SELECT slope_e6,
                row_number() OVER (ORDER BY slope_e6, xi, xj) AS rn,
                count(*) OVER () AS m
              FROM pairs
            )
            SELECT CAST(max(m) AS BIGINT) AS n_pairs,
              CAST(max(CASE WHEN rn = (m + 1) // 2 THEN slope_e6 END) AS BIGINT) AS median_slope_e6,
              CAST(max(CASE WHEN rn = (m + 3) // 4 THEN slope_e6 END) AS BIGINT) AS p25_slope_e6,
              CAST(max(CASE WHEN rn = (3 * m + 1) // 4 THEN slope_e6 END) AS BIGINT) AS p75_slope_e6
            FROM ranked""")
  )

  /** A13 extension — autocorrelation of the ingest-volume series at
    * fixed lags (1, 2, 4, 8, 12, 24, 48 half-hour buckets): the
    * seasonality detector — a spike at lag 48 says the firehose has a
    * daily cycle, which drives partition sizing and alert baselines
    * (w9's seasonal cells assume a period; this measures whether one
    * exists). Scale-safe exact arithmetic: per-bucket volumes are
    * quantized to per-mille of the peak FIRST (d ≤ 1000, so Σd² and
    * every lag product stay far under 2⁶³ at any event volume), the
    * mean is an integer-div, and r(k) = (Σ dₜdₜ₊ₖ · 10⁶) div Σd² —
    * truncation-consistent across both engines (verified: DuckDB's //
    * truncates toward zero on negatives, like Spark's div).
    *
    * Scale shape: one event-volume census, then self-joins over the
    * TIME-BUCKET domain only (buckets grow with wall-clock span, not
    * volume), one 1-row denominator broadcast. */
  val autocorrelation = Q(
    "a13_autocorrelation",
    "Ingest-volume ACF at lags 1,2,4,8,12,24,48 half-hour buckets: per-mille-quantized deviations, exact integer r(k) in ppm, pair counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      val buckets = t.events
        .select(expr("unix_micros(ts) div 1800000000").as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("y"))
      val peak = buckets.agg(max(col("y")).as("peak"), count(lit(1)).as("nb"))
      val pm = buckets.crossJoin(broadcast(peak))
        .select(col("x"), expr("(y * 1000L) div peak").as("ypm"), col("nb"))
      val mean = pm.agg(expr("sum(ypm) div max(nb)").as("mu"))
      val dev = pm.crossJoin(broadcast(mean))
        .select(col("x"), (col("ypm") - col("mu")).as("d"))
        .localCheckpoint() // three consumers: both join sides + denominator
      val den = dev.agg(sum(expr("d * d")).as("den"))
      val lags = dev.select(col("x"), col("d"),
        explode(lit(Array(1L, 2L, 4L, 8L, 12L, 24L, 48L))).as("k"))
      lags.join(dev.select(col("x").as("x2"), col("d").as("d2")),
          col("x") + col("k") === col("x2"))
        .groupBy(col("k"))
        .agg(sum(expr("d * d2")).as("num"), count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(den))
        .select(col("k").as("lag"),
          expr("(num * 1000000L) div den").as("r_ppm"), col("n_pairs"))
        .orderBy(col("lag"))
    },
    Some("""WITH b AS (
              SELECT epoch_us(ts) // 1800000000 AS x, count(*) AS y
              FROM events GROUP BY 1
            ), pk AS (
              SELECT max(y) AS peak, count(*) AS nb FROM b
            ), pm AS (
              SELECT x, (y * 1000) // peak AS ypm FROM b, pk
            ), mu AS (
              SELECT CAST(sum(ypm) AS BIGINT) // (SELECT nb FROM pk) AS mu FROM pm
            ), dev AS (
              SELECT x, ypm - mu AS d FROM pm, mu
            ), den AS (
              SELECT CAST(sum(d * d) AS BIGINT) AS den FROM dev
            ), lags AS (
              SELECT a.x, a.d, k.k, c.d AS d2
              FROM dev a,
                (VALUES (1), (2), (4), (8), (12), (24), (48)) AS k(k)
              JOIN dev c ON c.x = a.x + k.k
            )
            SELECT CAST(k AS BIGINT) AS lag,
              CAST((sum(d * d2) * 1000000) // (SELECT den FROM den) AS BIGINT) AS r_ppm,
              count(*) AS n_pairs
            FROM lags GROUP BY k ORDER BY lag""")
  )

  def all: Seq[Q] = Seq(driftTvd, profileCard, trendingTerms, embeddingDrift,
    aucScore, calibrationBins, sloBurnRate, ksStat, groupParity, theilSen,
    autocorrelation)
}
