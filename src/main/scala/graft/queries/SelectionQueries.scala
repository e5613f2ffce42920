package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A10 ⊕ data SELECTION — the step after dedup/decontamination in an LLM
  * training-data pipeline: decide WHICH surviving documents to train on,
  * and in what order. Three published shapes, each re-expressed as exact
  * integer-arithmetic relational plans (graft's oracle-exactness rule —
  * no doubles accumulate across rows, no libm):
  *
  *  - hashed-n-gram importance weighting (the DSIR recipe: score raw
  *    documents by how target-like their hashed token distribution is),
  *  - token-budget greedy selection (fill a fixed training budget with
  *    the highest-quality documents first),
  *  - curriculum ordering (a deterministic easy→hard schedule with a
  *    seeded intra-stage shuffle).
  *
  * Reference anchor: the reference's pipeline ends at collection
  * (orchestrator.py:850 hands results straight to the caller); selection
  * is north-star surface the engine adds for corpus curation at 100 TB.
  */
object SelectionQueries {

  /** 16-bit md5 feature bucket — the same cross-engine-stable hash the
    * split/decontamination queries use (md5 hex prefix → int). */
  private def bucket16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")

  private val bucket16Sql = (h: String) =>
    s"""((strpos('0123456789abcdef', $h[1]) - 1) * 4096
       + (strpos('0123456789abcdef', $h[2]) - 1) * 256
       + (strpos('0123456789abcdef', $h[3]) - 1) * 16
       + (strpos('0123456789abcdef', $h[4]) - 1))"""

  /** Importance weighting à la DSIR (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hash every token
    * into 2^16 feature buckets, estimate the target distribution from
    * the in-domain slice (lang = 'en' stands in for the target corpus)
    * and the raw distribution from everything, then score each document
    * by its tokens' target/raw likelihood ratios. The published recipe
    * sums log-ratios; logs are libm (not bit-stable cross-engine), so
    * the score here is the fixed-point ratio sum
    * Σ ((c_target[f]+1)·2^20 div (c_raw[f]+1)) — add-one smoothed,
    * order-independent (integer addition commutes), and monotone in the
    * same direction. Scale shape: two token-bucket censuses (map-side
    * partial agg into ≤ 65,536 groups), one BROADCAST join of the
    * ratio table (bounded at 65,536 rows no matter the corpus size)
    * back onto the token stream, one per-doc aggregate, and a global
    * top-k that plans as TakeOrderedAndProject — nothing driver-side,
    * nothing all-pairs. */
  val importanceWeights = Q(
    "a10_importance_weights",
    "DSIR-style importance scores: hashed-token target/raw ratio table (<=65536 buckets, broadcast) -> per-doc fixed-point score -> top-20.",
    (s, dir) => {
      val t = Tables(s, dir)
      // scan widened on doc_id (ops/ScanLayout): the explode + per-token
      // md5 bucketing runs TWICE (census pass + ratio-join pass) and
      // both passes pipeline onto the unsplittable scan — the widen
      // parallelizes both for one small doc exchange
      val toks = graft.ops.ScanLayout.widenByKey(t.documents, col("doc_id"))
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .withColumn("f", bucket16(col("tok")))
      // ONE bucket census (r12 optimization): the raw and target counts
      // are conditional aggregates over the same token stream — the old
      // two-census + join form re-ran the explode+md5 pass twice and
      // paid a join for a table this very query proves is <=65,536 rows.
      // coalesce(c_tgt, 0) == count(when(lang='en')) exactly (buckets
      // with no target tokens count 0 either way).
      val ratio = toks.groupBy(col("f"))
        .agg(count(lit(1)).as("c_raw"),
          count(when(col("lang") === "en", 1)).as("c_tgt"))
        .select(col("f"),
          expr("((c_tgt + 1L) * 1048576L) div (c_raw + 1L)").as("w"))
      toks.join(broadcast(ratio), Seq("f"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("w")).as("score"), count(lit(1)).as("n_toks"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
    },
    Some(s"""WITH toks AS (
              SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
            ), f AS (
              SELECT doc_id, lang, ${bucket16Sql("h")} AS f
              FROM (SELECT doc_id, lang, md5(tok) AS h FROM toks)
            ), raw AS (
              SELECT f, count(*) AS c_raw FROM f GROUP BY 1
            ), tgt AS (
              SELECT f, count(*) AS c_tgt FROM f WHERE lang = 'en' GROUP BY 1
            ), ratio AS (
              SELECT raw.f,
                CAST(((coalesce(c_tgt, 0) + 1) * 1048576) // (c_raw + 1) AS BIGINT) AS w
              FROM raw LEFT JOIN tgt ON raw.f = tgt.f
            )
            SELECT doc_id, lang, CAST(sum(w) AS BIGINT) AS score,
                   count(*) AS n_toks
            FROM f JOIN ratio ON f.f = ratio.f
            GROUP BY doc_id, lang
            ORDER BY score DESC, doc_id ASC
            LIMIT 20""")
  )

  /** Token-budget greedy selection: rank documents by a quality proxy
    * (type-token ratio in basis points — exact integers), then take
    * documents in rank order until the budget (1/5 of corpus tokens) is
    * filled. "Take until the running total passes the budget" is a
    * prefix sum over the quality ordering; like a10_sample_weighted it
    * is decomposed so no corpus-proportional partition exists: the
    * quality key has a BOUNDED domain (≤ 10,001 basis-point values), so
    * level 1 is a per-quality-value aggregate (≤ 10,001 rows, the only
    * unpartitioned window — driver-scale by construction) and level 2
    * windows WITHIN one quality value. The oracle recomputes with a
    * plain global window, independently validating the decomposition. */
  val budgetSelect = Q(
    "a10_budget_select",
    "Greedy token-budget fill: type-token-ratio quality ranking, distributed prefix sum, select docs while tokens-before < corpus/5; per-source census.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("n_toks"),
          expr("(size(array_distinct(toks)) * 10000L) div size(toks)").as("q"))
      // level 1: per-quality-value token mass; running total over the
      // DESC-ordered quality domain (<= 10,001 rows, driver-scale)
      val wQ = Window.orderBy(col("q").desc).rowsBetween(Window.unboundedPreceding, -1)
      val qOffsets = docs.groupBy(col("q")).agg(sum(col("n_toks")).as("qsum"))
        .withColumn("qoff", coalesce(sum(col("qsum")).over(wQ), lit(0L)))
        .select(col("q"), col("qoff"))
      // level 2: within one quality value, ordered by doc_id
      val wIn = Window.partitionBy(col("q")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val budget = docs.agg((sum(col("n_toks")) / lit(5)).cast("long").as("budget"))
      docs
        .join(qOffsets, Seq("q"))
        .withColumn("cum_before",
          col("qoff") + coalesce(sum(col("n_toks")).over(wIn), lit(0L)))
        .crossJoin(broadcast(budget))
        .withColumn("sel", col("cum_before") < col("budget"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("sel"), 1)).as("n_selected"),
          coalesce(sum(when(col("sel"), col("n_toks"))), lit(0L)).as("toks_selected"))
    },
    Some("""WITH d AS (
              SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                CAST((len(list_distinct(string_split(text, ' '))) * 10000)
                     // len(string_split(text, ' ')) AS BIGINT) AS q
              FROM documents
            ), tot AS (
              SELECT CAST(sum(n_toks) // 5 AS BIGINT) AS budget FROM d
            ), w AS (
              SELECT d.*, CAST(coalesce(sum(n_toks) OVER (
                  ORDER BY q DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
              FROM d
            )
            SELECT source, count(*) AS n_docs,
              count(CASE WHEN cum_before < budget THEN 1 END) AS n_selected,
              CAST(coalesce(sum(CASE WHEN cum_before < budget THEN n_toks END), 0) AS BIGINT) AS toks_selected
            FROM w, tot GROUP BY 1""")
  )

  /** Curriculum ordering: a deterministic easy→hard training schedule —
    * stage = document length band (shorter reads first), seeded md5
    * shuffle WITHIN a stage (reproducible across runs, machines, and
    * partitionings, unlike random()). The full schedule is a sort key,
    * not a materialization: at corpus scale a consumer range-partitions
    * on (stage, h) and never total-orders through one partition. The
    * registered result is the schedule HEAD (top-20 — plans as
    * TakeOrderedAndProject, scale-free), with the position computed
    * after the take, over 20 rows. */
  val curriculumOrder = Q(
    "a10_curriculum_order",
    "Deterministic curriculum schedule: length-band stages, seeded md5 intra-stage shuffle; emits the top-20 schedule head with positions.",
    (s, dir) => {
      val t = Tables(s, dir)
      val staged = t.documents
        .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
        .withColumn("stage", least(expr("n_toks div 64"), lit(7L)))
        .withColumn("h", md5(concat(lit("cur:"), col("doc_id").cast("string"))))
      val head = staged
        .orderBy(col("stage").asc, col("h").asc, col("doc_id").asc)
        .limit(20)
      head
        .withColumn("pos", row_number().over(
          Window.orderBy(col("stage").asc, col("h").asc, col("doc_id").asc)))
        .select(col("pos").cast("long").as("pos"), col("doc_id"),
          col("stage"), col("n_toks"))
    },
    Some("""WITH d AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                least(CAST(len(string_split(text, ' ')) AS BIGINT) // 64, 7) AS stage,
                md5('cur:' || CAST(doc_id AS VARCHAR)) AS h
              FROM documents
            )
            SELECT CAST(row_number() OVER (ORDER BY stage, h, doc_id) AS BIGINT) AS pos,
                   doc_id, stage, n_toks
            FROM d ORDER BY stage, h, doc_id LIMIT 20""")
  )

  /** Preference-pair construction (the DPO/RLHF data shape — Rafailov
    * et al. 2023): within each (source, lang) "prompt group", rank
    * documents by a deterministic quality proxy (type-token ratio in
    * basis points, the same exact-integer score budget_select uses) and
    * pair each document with its NEXT-ranked neighbor as
    * (chosen, rejected), keeping only strict preferences (margin > 0).
    * Adjacent pairing yields n−1 pairs per group — linear, not the
    * quadratic best×worst-cross-product a naive pairer builds — and the
    * hardest pairs (smallest positive margin) are exactly the ones
    * preference-tuning papers report the most signal from; the result
    * surfaces the top-20 widest margins as the schedule head.
    *
    * Scale shape: one shuffle by (source, lang) for the window, one
    * `lead` per row, a global TakeOrderedAndProject for the head. No
    * self-join, no pair blowup, nothing driver-side. */
  val preferencePairs = Q(
    "a10_preference_pairs",
    "DPO-style pairs: rank docs by exact TTR quality within (source, lang), pair adjacent ranks as chosen/rejected with margin > 0, top-20 by margin.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"), col("lang"),
          expr("(size(array_distinct(toks)) * 10000L) div size(toks)").as("q"))
      val w = Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("q").desc, col("doc_id").asc)
      docs
        .withColumn("rejected_id", lead(col("doc_id"), 1).over(w))
        .withColumn("rejected_q", lead(col("q"), 1).over(w))
        .filter(col("rejected_id").isNotNull && col("q") > col("rejected_q"))
        .select(col("source"), col("lang"),
          col("doc_id").as("chosen_id"), col("rejected_id"),
          (col("q") - col("rejected_q")).as("margin"))
        .orderBy(col("margin").desc, col("chosen_id").asc)
        .limit(20)
    },
    Some("""WITH d AS (
              SELECT doc_id, source, lang,
                CAST((len(list_distinct(string_split(text, ' '))) * 10000)
                     // len(string_split(text, ' ')) AS BIGINT) AS q
              FROM documents
            ), p AS (
              SELECT source, lang, doc_id AS chosen_id, q,
                lead(doc_id, 1) OVER w AS rejected_id,
                lead(q, 1) OVER w AS rejected_q
              FROM d
              WINDOW w AS (PARTITION BY source, lang ORDER BY q DESC, doc_id ASC)
            )
            SELECT source, lang, chosen_id, rejected_id,
              CAST(q - rejected_q AS BIGINT) AS margin
            FROM p
            WHERE rejected_id IS NOT NULL AND q > rejected_q
            ORDER BY margin DESC, chosen_id ASC
            LIMIT 20""")
  )

  /** Leave-one-out target encoding — the feature-prep op that turns a
    * categorical column into a numeric feature without LABEL LEAKAGE:
    * each row's encoding is the mean target of its (source, lang)
    * category EXCLUDING the row itself ((Σ − own) div (n − 1)), so a
    * model can't read its own label back out of the feature — the naive
    * per-category mean does exactly that and inflates validation scores.
    * Singleton categories fall back to the global mean (their LOO set is
    * empty). Target here is n_chars; everything is exact integer
    * arithmetic (sums, counts, integer div), so the oracle hash-matches.
    *
    * Scale shape: one category census (map-side combinable, bounded by
    * |source|×|lang|), broadcast back onto the scan; the LOO subtraction
    * is row-local — no window, no self-join, nothing per-row beyond the
    * one broadcast probe. The global mean is a single-row broadcast. */
  val targetEncode = Q(
    "a10_target_encode",
    "Leave-one-out target encoding of (source, lang) against n_chars: (sum - own) div (n - 1), singleton fallback to global mean, exact integers.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars").cast("long").as("y"))
      val census = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("cat_n"), sum(col("y")).as("cat_sum"))
      val global = docs.agg(expr("sum(y) div count(1)").as("global_mean"))
      docs
        .join(broadcast(census), Seq("source", "lang"))
        .crossJoin(broadcast(global))
        .withColumn("loo_enc",
          when(col("cat_n") > 1, expr("(cat_sum - y) div (cat_n - 1L)"))
            .otherwise(col("global_mean")))
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("source"), col("lang"), col("y"), col("loo_enc"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (
              SELECT doc_id, source, lang, n_chars AS y FROM documents
            ), census AS (
              SELECT source, lang, count(*) AS cat_n,
                CAST(sum(y) AS BIGINT) AS cat_sum
              FROM d GROUP BY 1, 2
            ), g AS (
              SELECT CAST(sum(y) // count(*) AS BIGINT) AS global_mean FROM d
            )
            SELECT doc_id, d.source, d.lang, y,
              CASE WHEN cat_n > 1
                THEN CAST((cat_sum - y) // (cat_n - 1) AS BIGINT)
                ELSE global_mean END AS loo_enc
            FROM d
            JOIN census ON d.source = census.source AND d.lang = census.lang
            CROSS JOIN g
            WHERE doc_id < 20 ORDER BY doc_id""")
  )

  /** A10 ⊕ — length-bucketed batch packing: transformer training pads
    * every sequence in a batch to the batch max, so batching in arrival
    * order burns FLOPs on pad tokens while sorting by length before
    * batching collapses the per-batch spread (the bucketing every
    * serious pretraining loader does). This query prices both
    * strategies on the same corpus: fixed batches of 32 within each of
    * 8 deterministic shards, padded = Σ batch_count·batch_max, waste =
    * (padded − useful)/padded in exact basis points. The emitted pair
    * of rows IS the decision evidence: same docs, same batch count,
    * strictly less padding under bucketing.
    *
    * Scale shape: the only windows are row_numbers PARTITIONED BY the
    * shard key (on a cluster: the loader shard), never corpus-global;
    * everything after is two bounded aggregates. */
  val lengthBuckets = Q(
    "a10_length_buckets",
    "Length-bucketed batching: padding-waste basis points for arrival-order vs length-sorted batches of 32 within 8 shards — same corpus, same batch count, less pad.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("shard", col("doc_id") % 8)
      def priced(strategy: String, w: org.apache.spark.sql.expressions.WindowSpec) =
        docs.withColumn("rn", row_number().over(w))
          .withColumn("batch", expr("(rn - 1) div 32"))
          .groupBy(col("shard"), col("batch"))
          .agg(count(lit(1)).as("bn"), max(col("n_toks")).as("bmax"),
            sum(col("n_toks")).as("bsum"))
          .agg(count(lit(1)).as("n_batches"),
            sum(col("bn") * col("bmax")).as("padded_tokens"),
            sum(col("bsum")).as("useful_tokens"))
          .withColumn("strategy", lit(strategy))
      val arrival = priced("arrival",
        Window.partitionBy(col("shard")).orderBy(col("doc_id")))
      val bucketed = priced("length_bucketed",
        Window.partitionBy(col("shard")).orderBy(col("n_toks"), col("doc_id")))
      arrival.unionByName(bucketed)
        .withColumn("waste_bp",
          expr("(padded_tokens - useful_tokens) * 10000 div padded_tokens"))
        .select(col("strategy"), col("n_batches"), col("padded_tokens"),
          col("useful_tokens"), col("waste_bp"))
        .orderBy(col("strategy"))
    },
    Some("""WITH d AS (
              SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                doc_id % 8 AS shard
              FROM documents
            ), ranked AS (
              SELECT shard, n_toks,
                (row_number() OVER (PARTITION BY shard ORDER BY doc_id) - 1) // 32 AS b_arr,
                (row_number() OVER (PARTITION BY shard ORDER BY n_toks, doc_id) - 1) // 32 AS b_len
              FROM d
            ), arr AS (
              SELECT shard, b_arr AS batch, count(*) AS bn, max(n_toks) AS bmax,
                sum(n_toks) AS bsum
              FROM ranked GROUP BY 1, 2
            ), lenb AS (
              SELECT shard, b_len AS batch, count(*) AS bn, max(n_toks) AS bmax,
                sum(n_toks) AS bsum
              FROM ranked GROUP BY 1, 2
            ), priced AS (
              SELECT 'arrival' AS strategy, count(*) AS n_batches,
                CAST(sum(bn * bmax) AS BIGINT) AS padded_tokens,
                CAST(sum(bsum) AS BIGINT) AS useful_tokens
              FROM arr
              UNION ALL
              SELECT 'length_bucketed', count(*),
                CAST(sum(bn * bmax) AS BIGINT), CAST(sum(bsum) AS BIGINT)
              FROM lenb
            )
            SELECT strategy, n_batches, padded_tokens, useful_tokens,
              (padded_tokens - useful_tokens) * 10000 // padded_tokens AS waste_bp
            FROM priced ORDER BY strategy""")
  )

  /** A10 ⊕ — Bradley-Terry strength fit (Bradley & Terry 1952; Hunter
    * 2004 MM algorithm): the reward-modeling companion of
    * a10_preference_pairs — given pairwise win counts between sources,
    * fit each source's latent quality strength. This is the analysis an
    * RLHF data pipeline runs over preference data to find annotator/
    * source skew before training a reward model on it.
    *
    * Pairwise wins come from the same TTR quality signal as the DPO
    * pairs, computed WITHOUT doc×doc expansion: a (source, quality)
    * census, a per-source strictly-below cumulative over the bounded
    * quality domain (basis points), and wins_ij = Σ_v c_i(v)·cum_j(<v) —
    * the census-based Mann-Whitney trick a13_auc_score uses, so the
    * comparison count is |census|·|sources|, never |docs|². Ties count
    * for neither side.
    *
    * The MM fixed point runs as 3 UNROLLED integer iterations in 1e6
    * fixed point: st_i ← (W_i·1e12) div Σ_j (n_ij·1e12 div (st_i+st_j)).
    * Integer sums commute exactly, so the result is partition-order-
    * independent (the float form would not hash-match across engines).
    * Total comparisons are pre-normalized to ≤1e6 (BT is invariant to a
    * common factor), which bounds every intermediate below 2^63 at ANY
    * scale factor. The tournament is restricted to sources with ≥1
    * scaled win, so every strength update is well-defined.
    *
    * Scale shape: census + bounded-domain grid + one equi-join on the
    * quality value; the MM iterations run on the ≤|sources|² pair table
    * with the strength vector broadcast — the driver only holds the
    * loop counter. */
  val btStrength = Q(
    "a10_bt_strength",
    "Bradley-Terry source strengths: census-based Mann-Whitney pairwise wins (never doc x doc), total-normalized, 3 unrolled integer MM iterations in 1e6 fixed point.",
    (s, dir) => {
      val t = Tables(s, dir)
      val census = t.documents
        .withColumn("toks", split(col("text"), " "))
        .select(col("source"),
          expr("(size(array_distinct(toks)) * 10000L) div size(toks)").as("q"))
        .groupBy(col("source"), col("q")).agg(count(lit(1)).as("c"))
      val grid = census.select(col("q")).distinct()
        .crossJoin(census.select(col("source")).distinct())
        .join(census, Seq("source", "q"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("cum_below",
          coalesce(sum(col("c")).over(
            Window.partitionBy(col("source")).orderBy(col("q"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source").as("j"), col("q"), col("cum_below"))
      val wins = census.select(col("source").as("i"), col("q"), col("c"))
        .join(grid, "q")
        .filter(col("i") =!= col("j"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("c") * col("cum_below")).as("w_ij"))
      val tot = wins.agg(sum(col("w_ij")).as("tot"))
      val scaled = wins.crossJoin(broadcast(tot))
        .withColumn("w", expr("w_ij div greatest(1L, tot div 1000000L)"))
        .filter(col("w") > 0)
        .select(col("i"), col("j"), col("w"))
        .localCheckpoint()
      val dom = scaled.select(col("i")).distinct()
      val rev = scaled.select(col("i").as("rj"), col("j").as("ri"), col("w").as("w_ji"))
      val pairs = scaled
        .join(rev, col("i") === col("ri") && col("j") === col("rj"), "left")
        .select(col("i"), col("j"), col("w").as("w_ij"),
          (col("w") + coalesce(col("w_ji"), lit(0L))).as("n_ij"))
        .join(dom.select(col("i").as("j")), Seq("j"), "left_semi")
        .localCheckpoint()
      val wt = pairs.groupBy(col("i")).agg(sum(col("w_ij")).as("w_total"))
      var strength = wt.select(col("i").as("source"), lit(1000000L).as("st"))
      for (_ <- 1 to 3) {
        val si = strength.select(col("source").as("i"), col("st").as("st_i"))
        val sj = strength.select(col("source").as("j"), col("st").as("st_j"))
        strength = pairs.join(broadcast(si), "i").join(broadcast(sj), "j")
          .withColumn("term", expr("(n_ij * 1000000000000L) div (st_i + st_j)"))
          .groupBy(col("i")).agg(sum(col("term")).as("denom"))
          .join(broadcast(wt), "i")
          .select(col("i").as("source"),
            expr("(w_total * 1000000000000L) div denom").as("st"))
          // flat loop-carried plan (r12 optimization): each iteration
          // references the strength table TWICE (st_i and st_j sides),
          // so the lazily-chained form nested the whole previous
          // iteration under BOTH broadcasts — 2^3 plan copies and ~14
          // broadcast builds by iteration 3. The checkpoint is a
          // <=|sources|-row frame; the LabelProp per-round discipline.
          .localCheckpoint()
      }
      strength
        .join(wt.select(col("i").as("source"), col("w_total").as("wins_scaled")), "source")
        .select(col("source"), col("st").as("strength_micro"), col("wins_scaled"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (
              SELECT source,
                CAST((len(list_distinct(string_split(text, ' '))) * 10000)
                     // len(string_split(text, ' ')) AS BIGINT) AS q
              FROM documents
            ), cen AS (
              SELECT source, q, count(*) AS c FROM d GROUP BY 1, 2
            ), grid AS (
              SELECT s.source AS j, v.q,
                COALESCE(SUM(cen.c) OVER (PARTITION BY s.source ORDER BY v.q
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
              FROM (SELECT DISTINCT q FROM cen) v
              CROSS JOIN (SELECT DISTINCT source FROM cen) s
              LEFT JOIN cen ON cen.source = s.source AND cen.q = v.q
            ), wins AS (
              SELECT cen.source AS i, g.j, CAST(SUM(cen.c * g.cum_below) AS BIGINT) AS w_ij
              FROM cen JOIN grid g ON cen.q = g.q AND cen.source <> g.j
              GROUP BY 1, 2
            ), scaled AS (
              SELECT i, j,
                w_ij // GREATEST(1, (SELECT CAST(SUM(w_ij) AS BIGINT) FROM wins) // 1000000) AS w
              FROM wins
            ), sc AS (
              SELECT * FROM scaled WHERE w > 0
            ), pairs AS (
              SELECT a.i, a.j, a.w AS w_ij, a.w + COALESCE(b.w, 0) AS n_ij
              FROM sc a LEFT JOIN sc b ON b.i = a.j AND b.j = a.i
              WHERE a.j IN (SELECT DISTINCT i FROM sc)
            ), wt AS (
              SELECT i, CAST(SUM(w_ij) AS BIGINT) AS w_total FROM pairs GROUP BY 1
            ), s0 AS (
              SELECT i AS source, CAST(1000000 AS BIGINT) AS st FROM wt
            ), it1 AS (
              SELECT wt.i AS source,
                (wt.w_total * 1000000000000) //
                  CAST(SUM((p.n_ij * 1000000000000) // (si.st + sj.st)) AS BIGINT) AS st
              FROM pairs p
              JOIN s0 si ON si.source = p.i
              JOIN s0 sj ON sj.source = p.j
              JOIN wt ON wt.i = p.i
              GROUP BY wt.i, wt.w_total
            ), it2 AS (
              SELECT wt.i AS source,
                (wt.w_total * 1000000000000) //
                  CAST(SUM((p.n_ij * 1000000000000) // (si.st + sj.st)) AS BIGINT) AS st
              FROM pairs p
              JOIN it1 si ON si.source = p.i
              JOIN it1 sj ON sj.source = p.j
              JOIN wt ON wt.i = p.i
              GROUP BY wt.i, wt.w_total
            ), it3 AS (
              SELECT wt.i AS source,
                (wt.w_total * 1000000000000) //
                  CAST(SUM((p.n_ij * 1000000000000) // (si.st + sj.st)) AS BIGINT) AS st
              FROM pairs p
              JOIN it2 si ON si.source = p.i
              JOIN it2 sj ON sj.source = p.j
              JOIN wt ON wt.i = p.i
              GROUP BY wt.i, wt.w_total
            )
            SELECT it3.source, CAST(it3.st AS BIGINT) AS strength_micro,
              wt.w_total AS wins_scaled
            FROM it3 JOIN wt ON wt.i = it3.source
            ORDER BY it3.source""")
  )

  /** A10 ⊕ — Pareto-frontier (skyline) selection: the documents no
    * other document dominates on (quality ↑, cost ↓) — here lexical
    * diversity (distinct-token per-mille, integer) vs token count. The
    * frontier is what a budget-vs-quality curve is drawn from; every
    * point NOT on it is strictly worse than some other document on both
    * axes (Börzsönyi et al., "The Skyline Operator", ICDE 2001).
    *
    * Scale shape — NO doc-wide sort and NO doc×doc dominance join. A
    * 2D skyline collapses to censuses: (1) group docs by the cost axis
    * and keep max quality per cost — a |distinct costs|-sized census
    * (bounded by max document length, a data-character constant, the
    * same bounded-domain argument as the SLO-burn buckets); (2) ONE
    * cumulative window over that census computes, per cost, the best
    * quality at any STRICTLY cheaper cost; (3) each doc joins its cost
    * row and survives iff it holds its cost's max quality AND beats
    * every cheaper cost's best. Dominance with ties handled exactly:
    * equal (cost, quality) pairs dominate each other on neither axis,
    * so both stay. The oracle is the independent O(n²) NOT-EXISTS
    * dominance formulation — the census path must reproduce it
    * bit-for-bit. */
  val paretoFrontier = Q(
    "a10_pareto_frontier",
    "Pareto/skyline selection: docs undominated on (distinct-token per-mille up, token count down), via a cost-census cumulative window — no global doc sort, no doc-x-doc join; oracle = NOT EXISTS dominance.",
    (s, dir) => {
      val t = Tables(s, dir)
      val m = t.documents
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          expr("CAST(size(array_distinct(w)) AS BIGINT) * 1000 div size(w)").as("uniq_pm"))
      val census = m.groupBy(col("n_tokens")).agg(max(col("uniq_pm")).as("mq"))
      // cumulative best at strictly cheaper cost; window runs over the
      // bounded cost census only, never over documents
      val win = Window.orderBy(col("n_tokens").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val thresh = census.withColumn("best_cheaper", max(col("mq")).over(win))
      m.join(broadcast(thresh), "n_tokens")
        .filter(col("uniq_pm") === col("mq") &&
          (col("best_cheaper").isNull || col("uniq_pm") > col("best_cheaper")))
        .select(col("doc_id"), col("n_tokens"), col("uniq_pm"))
        .orderBy(col("n_tokens"), col("doc_id"))
    },
    Some("""WITH m AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000
                  // len(string_split(text, ' ')) AS uniq_pm
              FROM documents
            )
            SELECT a.doc_id, a.n_tokens, a.uniq_pm
            FROM m a
            WHERE NOT EXISTS (
              SELECT 1 FROM m b
              WHERE b.uniq_pm >= a.uniq_pm AND b.n_tokens <= a.n_tokens
                AND (b.uniq_pm > a.uniq_pm OR b.n_tokens < a.n_tokens))
            ORDER BY a.n_tokens, a.doc_id""")
  )

  def all: Seq[Q] =
    Seq(importanceWeights, budgetSelect, curriculumOrder, preferencePairs,
      targetEncode, lengthBuckets, btStrength, paretoFrontier)
}
