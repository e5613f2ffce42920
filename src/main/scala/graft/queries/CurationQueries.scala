package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A10 ⊕ depth — two curation operators every LLM training-data pipeline
  * runs besides dedup: deterministic dataset SPLIT assignment and
  * benchmark DECONTAMINATION. Both are pure hash/shingle relational
  * shapes — no state, no randomness (split hashing is seeded and
  * reproducible, the property that makes splits stable across reruns and
  * machines at 100 TB).
  */
object CurationQueries {

  /** Deterministic train/val/test split: a seeded md5 of the document id
    * maps to a 16-bit bucket, thresholded at 90%/95% — the standard
    * hash-split that (unlike random()) is reproducible, stable under
    * re-partitioning, and assigns a document identically no matter which
    * machine or run processes it. One scan + one tiny aggregate. */
  val splitAssign = Q(
    "a10_split_assign",
    "Deterministic hash split: md5('split:'||doc_id) -> 16-bit bucket -> train/val/test at 90/95%; per-(source, split) doc and char counts.",
    (s, dir) => {
      val t = Tables(s, dir)
      val bucket = conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("int")
      t.documents
        .withColumn("split",
          when(bucket < 58982, "train").when(bucket < 62259, "val").otherwise("test"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    },
    Some("""WITH hx AS (
              SELECT source, n_chars, md5('split:' || CAST(doc_id AS VARCHAR)) AS h FROM documents
            ), b AS (
              SELECT source, n_chars,
                ((strpos('0123456789abcdef', h[1]) - 1) * 4096
                 + (strpos('0123456789abcdef', h[2]) - 1) * 256
                 + (strpos('0123456789abcdef', h[3]) - 1) * 16
                 + (strpos('0123456789abcdef', h[4]) - 1)) AS bucket
              FROM hx)
            SELECT source,
              CASE WHEN bucket < 58982 THEN 'train' WHEN bucket < 62259 THEN 'val' ELSE 'test' END AS split,
              count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM b GROUP BY 1, 2""")
  )

  /** Distinct word 5-grams per document — the decontamination shingle
    * basis, shared by the exact and bucket-pruned variants. */
  private def grams5(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), split(col("text"), " ").as("toks"))
    .filter(size(col("toks")) >= 5)
    .select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("toks")) - 4),
        i => concat_ws(" ",
          element_at(col("toks"), i), element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3),
          element_at(col("toks"), i + 4))))).as("gram"))

  /** Benchmark decontamination: flag training documents that share any
    * word 5-gram with the held-out eval set (doc_id % 50 == 0 stands in
    * for the benchmark corpus). The overlap test is a shingle equi-join —
    * explode both sides to (gram, doc) and hash-join on the gram, never
    * doc×doc — so at 100 TB the shuffle key is the n-gram and the eval
    * side (tiny by construction) broadcasts. */
  val decontaminate = Q(
    "a10_decontaminate",
    "Decontamination: training docs sharing any word 5-gram with the eval slice, via a gram equi-join (no doc x doc); per-source contamination census.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      val evalGrams = grams5(docs.filter(col("doc_id") % 50 === 0))
        .select(col("gram")).distinct()
      // no broadcast hint: the eval side is usually benchmark-sized, but
      // it's derived from the corpus here — let AQE pick the build side
      val flagged = grams5(docs.filter(col("doc_id") % 50 =!= 0))
        .join(evalGrams, Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      docs.filter(col("doc_id") % 50 =!= 0)
        .join(flagged.withColumn("contaminated", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_train"),
          count(col("contaminated")).as("n_flagged"),
          (count(col("contaminated")).cast("double") / count(lit(1))).as("flagged_share"))
    },
    Some("""WITH d AS (
              SELECT source, doc_id, string_split(text, ' ') AS toks FROM documents
            ), g AS (
              SELECT source, doc_id,
                list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])
                               for i in generate_series(1, len(toks) - 4)]) AS grams
              FROM d WHERE len(toks) >= 5
            ), ev AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
            ), fl AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0) t
              WHERE gram IN (SELECT gram FROM ev)
            )
            SELECT d.source,
              count(*) AS n_train,
              count(fl.doc_id) AS n_flagged,
              CAST(count(fl.doc_id) AS DOUBLE) / count(*) AS flagged_share
            FROM d LEFT JOIN fl ON d.doc_id = fl.doc_id
            WHERE d.doc_id % 50 <> 0
            GROUP BY d.source""")
  )

  /** Sequence packing: assign documents to fixed token-budget context
    * windows (4096 here) by cumulative token count in deterministic
    * doc_id order, PER SOURCE SHARD — the shape that scales, because
    * packing is embarrassingly parallel across shards while a single
    * global order would serialize the corpus through one partition. A
    * document lands in window floor(tokens_before / budget); the
    * summary reports windows and fill per shard. One running-sum window
    * + one aggregate, all exact integer arithmetic. */
  val packSequences = Q(
    "a10_pack_sequences",
    "Context-window packing: per-source cumulative token count -> 4096-token window ids -> windows/fill-ratio census. Running sum + aggregate, exact ints.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = t.documents
        .withColumn("n_toks", size(split(col("text"), " ")))
        .withColumn("cum", sum(col("n_toks")).over(w))
        .withColumn("window_id", ((col("cum") - col("n_toks")) / lit(4096)).cast("long"))
      packed
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_tokens"),
          (max(col("window_id")) + 1).as("n_windows"),
          (sum(col("n_toks")).cast("double") / ((max(col("window_id")) + 1) * 4096))
            .as("fill_ratio"))
    },
    Some("""WITH p AS (
              SELECT source, doc_id, len(string_split(text, ' ')) AS n_toks,
                sum(len(string_split(text, ' '))) OVER
                  (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM documents
            ), w AS (
              SELECT source, n_toks, CAST((cum - n_toks) // 4096 AS BIGINT) AS window_id FROM p
            )
            SELECT source, count(*) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS total_tokens,
              CAST(max(window_id) + 1 AS BIGINT) AS n_windows,
              CAST(sum(n_toks) AS DOUBLE) / ((max(window_id) + 1) * 4096) AS fill_ratio
            FROM w GROUP BY source""")
  )

  /** Stratified downsampling to a balanced language mixture: every
    * stratum is sampled down to (about) the MINORITY stratum's size —
    * the class-rebalancing step before training-mixture assembly. The
    * per-stratum rate is derived from the data as an exact 16-bit
    * integer (65536·n_min div n_stratum — no float rate, so the
    * threshold is bit-identical everywhere), and membership is the same
    * seeded-md5 bucket as a10_split_assign: a document's fate depends
    * only on its id, never on partitioning, run order, or machine
    * count. Two scans + a 5-row broadcast — at 100 TB the census
    * aggregate is the only shuffle. */
  val sampleStratified = Q(
    "a10_sample_stratified",
    "Stratified hash downsampling: per-lang integer rate (65536*n_min div n) + seeded md5 bucket; per-stratum sampled doc/char census.",
    (s, dir) => {
      val t = Tables(s, dir)
      val census = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      val rate = census
        .crossJoin(broadcast(census.agg(min(col("n_total")).as("n_min"))))
        .withColumn("rate16", expr("(65536 * n_min) div n_total"))
        .select(col("lang").as("r_lang"), col("n_total"), col("rate16"))
      val bucket = conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
        .cast("long")
      t.documents
        .join(broadcast(rate), col("lang") === col("r_lang"))
        .withColumn("sampled", bucket < col("rate16"))
        .groupBy(col("lang"))
        .agg(
          max(col("n_total")).as("n_total"),
          max(col("rate16")).as("rate16"),
          count(when(col("sampled"), 1)).as("n_sampled"),
          coalesce(sum(when(col("sampled"), col("n_chars"))), lit(0L)).as("n_chars_sampled"))
    },
    Some("""WITH census AS (
              SELECT lang, count(*) AS n_total FROM documents GROUP BY 1
            ), rate AS (
              SELECT lang, n_total,
                     CAST((65536 * (SELECT min(n_total) FROM census)) // n_total AS BIGINT) AS rate16
              FROM census
            ), b AS (
              SELECT d.lang, d.n_chars, r.rate16, r.n_total,
                ((strpos('0123456789abcdef', h[1]) - 1) * 4096
                 + (strpos('0123456789abcdef', h[2]) - 1) * 256
                 + (strpos('0123456789abcdef', h[3]) - 1) * 16
                 + (strpos('0123456789abcdef', h[4]) - 1)) AS bucket
              FROM (SELECT lang, n_chars,
                           md5('sample:' || CAST(doc_id AS VARCHAR)) AS h
                    FROM documents) d
              JOIN rate r USING (lang)
            )
            SELECT lang, CAST(max(n_total) AS BIGINT) AS n_total, max(rate16) AS rate16,
                   CAST(count(CASE WHEN bucket < rate16 THEN 1 END) AS BIGINT) AS n_sampled,
                   CAST(COALESCE(sum(CASE WHEN bucket < rate16 THEN n_chars END), 0) AS BIGINT) AS n_chars_sampled
            FROM b GROUP BY lang""")
  )

  /** Weighted systematic sampling: walk the corpus in doc_id order and
    * take one document per stratum of total_chars/50 cumulative weight —
    * longer documents are proportionally likelier, the sample size is
    * EXACTLY 50, and everything is integer arithmetic (no pow/log priority
    * keys, which are libm-dependent and can flip ties across engines).
    *
    * The cumulative weight is a DISTRIBUTED two-level prefix sum:
    * per-shard partial sums (corpus/100 rows, hash-aggregated), rolled up
    * to super-shards (corpus/10^7 rows) whose running total is the ONLY
    * unpartitioned window — genuinely driver-scale (~10^3 rows at 10^10
    * docs). Shard offsets are a window partitioned BY super-shard
    * (<=10^5 rows each), so no single partition ever carries a
    * corpus-proportional row count. The oracle recomputes with a plain
    * global window, independently validating the decomposition. */
  val sampleWeighted = Q(
    "a10_sample_weighted",
    "Weighted systematic sample (1 doc per total/50 cumulative chars) via distributed prefix sum; per-source selection census.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val docs = t.documents.select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("shard", expr("doc_id div 100"))
      // two-level prefix sum: shard sums (corpus/100) -> super-shard sums
      // (corpus/10^7). Only the super-shard running total is an
      // unpartitioned window, and that table is ~10^3 rows at 10^10 docs;
      // shard offsets window within a super-shard (<=10^5 rows/partition).
      val shardSums = docs.groupBy(col("shard")).agg(sum(col("n_chars")).as("ssum"))
        .withColumn("super", expr("shard div 100000"))
      val wSuper = Window.orderBy(col("super"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val superOffsets = shardSums.groupBy(col("super")).agg(sum(col("ssum")).as("susum"))
        .withColumn("soff", coalesce(sum(col("susum")).over(wSuper), lit(0L)))
        .select(col("super"), col("soff"))
      val wShardInSuper = Window.partitionBy(col("super")).orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = shardSums
        .withColumn("prev", coalesce(sum(col("ssum")).over(wShardInSuper), lit(0L)))
        .join(broadcast(superOffsets), Seq("super"))
        .select(col("shard"), (col("soff") + col("prev")).as("offset"))
      val wIn = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = docs.agg(sum(col("n_chars")).as("total"))
      // plain equi-join on shard (NOT a broadcast hint: the shard table is
      // corpus/100 rows — AQE still broadcasts it at small scale, but at
      // 10^10 docs it must be allowed to shuffle)
      docs.join(offsets, Seq("shard"))
        .withColumn("cum", col("offset") + sum(col("n_chars")).over(wIn))
        .crossJoin(broadcast(total))
        .withColumn("step", greatest(expr("total div 50"), lit(1L)))
        .withColumn("sel",
          expr("(cum - n_chars) div step") < expr("cum div step"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("sel"), 1)).as("n_selected"),
          coalesce(sum(when(col("sel"), col("n_chars"))), lit(0L)).as("chars_selected"))
    },
    Some("""WITH w AS (
              SELECT doc_id, source, n_chars,
                sum(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents
            ), tot AS (
              SELECT greatest(CAST(sum(n_chars) AS BIGINT) // 50, 1) AS step FROM documents
            ), sel AS (
              SELECT w.*, (cum - n_chars) // step < cum // step AS sel FROM w, tot
            )
            SELECT source, count(*) AS n_docs,
                   count(CASE WHEN sel THEN 1 END) AS n_selected,
                   CAST(COALESCE(sum(CASE WHEN sel THEN n_chars END), 0) AS BIGINT) AS chars_selected
            FROM sel GROUP BY source""")
  )

  /** Decontamination with an explicit runtime-filter stage — the shape
    * Spark's InjectRuntimeFilter produces automatically when thresholds
    * allow, built manually so it is guaranteed and uncapped: the eval
    * grams' 16-bit md5 bucket set (<= 65,536 ints, broadcastable no
    * matter the corpus size) semi-joins the corpus grams BEFORE the
    * exact gram join, so the expensive shuffle only carries grams whose
    * bucket collides with an eval gram. Superset semantics (bucket
    * collisions only ADD candidates, the exact join removes them), so
    * the flags equal a10_decontaminate's — which the shared oracle
    * census proves. Telemetry counts the grams entering vs surviving
    * the prune: the shuffle-volume saving at 100 TB. */
  val decontaminatePruned = Q(
    "a10_decontaminate_pruned",
    "Decontamination behind a broadcast bucket-set pre-filter (explicit runtime-bloom shape); flags match the exact join, plus prune telemetry.",
    (s, dir) => {
      val t = Tables(s, dir)
      // corpus side widened on doc_id (ops/ScanLayout): the 5-gram
      // explosion + per-gram md5 bucketing over 98% of the corpus is
      // the query's dominant row-local work and otherwise pipelines
      // single-threaded onto the unsplittable scan (the 2% eval side
      // stays narrow)
      val docs = t.documents
      val wideDocs = graft.ops.ScanLayout.widenByKey(t.documents, col("doc_id"))
      val bucketOf = (g: Column) => conv(substring(md5(g), 1, 4), 16, 10).cast("int")
      val evalGrams = grams5(docs.filter(col("doc_id") % 50 === 0))
        .select(col("gram")).distinct()
      val evalBuckets = evalGrams.select(bucketOf(col("gram")).as("bucket")).distinct()
      // ONE pass over the corpus gram stream (r12 optimization): the
      // bucket membership becomes a boolean via a left join against the
      // DISTINCT broadcast bucket set (at most one match per gram, so
      // rows are preserved), checkpointed once — the old shape re-derived
      // the 5-gram explosion for the prune, the flag join AND both
      // telemetry counts, and the two telemetry censuses now fuse into
      // one conditional aggregate over the same pass.
      val corpusGrams = grams5(wideDocs.filter(col("doc_id") % 50 =!= 0))
        .join(broadcast(evalBuckets), bucketOf(col("gram")) === col("bucket"), "left")
        .withColumn("hit", col("bucket").isNotNull)
        .drop("bucket")
        .localCheckpoint()
      val prunedGrams = corpusGrams.filter(col("hit"))
      val flagged = prunedGrams.join(evalGrams, Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      val telemetry = corpusGrams.agg(count(lit(1)).as("n_grams_total"),
        count(when(col("hit"), 1)).as("n_grams_pruned"))
      docs.filter(col("doc_id") % 50 =!= 0)
        .join(flagged.withColumn("contaminated", lit(1)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_train"), count(col("contaminated")).as("n_flagged"))
        .crossJoin(broadcast(telemetry))
    },
    Some("""WITH d AS (
              SELECT source, doc_id, string_split(text, ' ') AS toks FROM documents
            ), g AS (
              SELECT source, doc_id,
                list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])
                               for i in generate_series(1, len(toks) - 4)]) AS grams
              FROM d WHERE len(toks) >= 5
            ), ev AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
            ), evb AS (
              SELECT DISTINCT ((strpos('0123456789abcdef', h[1]) - 1) * 4096
                + (strpos('0123456789abcdef', h[2]) - 1) * 256
                + (strpos('0123456789abcdef', h[3]) - 1) * 16
                + (strpos('0123456789abcdef', h[4]) - 1)) AS bucket
              FROM (SELECT md5(gram) AS h FROM ev)
            ), cg AS (
              SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0
            ), cgb AS (
              SELECT doc_id, gram,
                ((strpos('0123456789abcdef', h[1]) - 1) * 4096
                + (strpos('0123456789abcdef', h[2]) - 1) * 256
                + (strpos('0123456789abcdef', h[3]) - 1) * 16
                + (strpos('0123456789abcdef', h[4]) - 1)) AS bucket
              FROM (SELECT doc_id, gram, md5(gram) AS h FROM cg)
            ), pr AS (
              SELECT doc_id, gram FROM cgb WHERE bucket IN (SELECT bucket FROM evb)
            ), fl AS (
              SELECT DISTINCT doc_id FROM pr WHERE gram IN (SELECT gram FROM ev)
            )
            SELECT d.source,
              count(*) AS n_train,
              count(fl.doc_id) AS n_flagged,
              (SELECT count(*) FROM cg) AS n_grams_total,
              (SELECT count(*) FROM pr) AS n_grams_pruned
            FROM d LEFT JOIN fl ON d.doc_id = fl.doc_id
            WHERE d.doc_id % 50 <> 0
            GROUP BY 1""")
  )

  /** Decontamination behind Spark's NATIVE bloom filter — the third
    * point on the runtime-filter spectrum after the exact join
    * (a10_decontaminate) and the explicit 16-bit bucket set
    * (a10_decontaminate_pruned). Spark ships the pair
    * (`BloomFilterAggregate` builds the sketch distributed and
    * order-independent, `BloomFilterMightContain` probes it codegen'd)
    * but only the InjectRuntimeFilter rule can reach it, and that rule
    * is threshold- and shape-gated; GraftExtensions registers both as
    * SQL functions so the filter is GUARANTEED. The sketch is ~1 MB for
    * 2^20 grams at 2^23 bits — broadcastable at any corpus size, and
    * unlike the bucket set it never grows past its bit budget (the FP
    * rate degrades instead, which only weakens pruning, never
    * correctness: might_contain has no false negatives, and the exact
    * gram join after it removes every false positive). Flags therefore
    * equal a10_decontaminate's, which the shared oracle census proves. */
  val decontaminateBloom = Q(
    "a10_decontaminate_bloom",
    "Decontamination behind a broadcast native bloom filter (bloom_filter_agg/might_contain); flags match the exact gram join.",
    (s, dir) => {
      val t = Tables(s, dir)
      val docs = t.documents
      // might_contain requires its bloom input to be a scalar subquery
      // (the same shape InjectRuntimeFilter emits), so this query is
      // declared as SQL text over temp views rather than DataFrame ops.
      grams5(docs.filter(col("doc_id") % 50 === 0))
        .select(col("gram")).distinct()
        .createOrReplaceTempView("graft_bloom_eval_grams")
      grams5(docs.filter(col("doc_id") % 50 =!= 0))
        .createOrReplaceTempView("graft_bloom_corpus_grams")
      docs.filter(col("doc_id") % 50 =!= 0).select(col("doc_id"), col("source"))
        .createOrReplaceTempView("graft_bloom_train_docs")
      s.sql("""
        WITH pruned AS (
          SELECT doc_id, gram FROM graft_bloom_corpus_grams
          WHERE might_contain(
            (SELECT bloom_filter_agg(xxhash64(gram), 1048576L, 8388608L)
             FROM graft_bloom_eval_grams),
            xxhash64(gram))
        ),
        flagged AS (
          SELECT DISTINCT doc_id FROM pruned
          WHERE gram IN (SELECT gram FROM graft_bloom_eval_grams)
        )
        SELECT d.source, count(*) AS n_train, count(f.doc_id) AS n_flagged
        FROM graft_bloom_train_docs d LEFT JOIN flagged f USING (doc_id)
        GROUP BY d.source
      """)
    },
    Some("""WITH d AS (
              SELECT source, doc_id, string_split(text, ' ') AS toks FROM documents
            ), g AS (
              SELECT source, doc_id,
                list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])
                               for i in generate_series(1, len(toks) - 4)]) AS grams
              FROM d WHERE len(toks) >= 5
            ), ev AS (
              SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0
            ), fl AS (
              SELECT DISTINCT doc_id
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0) t
              WHERE gram IN (SELECT gram FROM ev)
            )
            SELECT d.source,
              count(*) AS n_train,
              count(fl.doc_id) AS n_flagged
            FROM d LEFT JOIN fl ON d.doc_id = fl.doc_id
            WHERE d.doc_id % 50 <> 0
            GROUP BY 1""")
  )

  /** Training-mixture allocation — the multilingual/multi-source
    * "sampling temperature" pass every LLM data pipeline runs before
    * training: per-source token mass, damped by temperature T = 0.5
    * (w = mass^0.5, which up-weights small sources), then an EXACT
    * largest-remainder apportionment of a fixed document budget.
    *
    * Cross-engine exactness: mass^0.5 is the one libm-free power
    * (IEEE-754 sqrt is correctly rounded everywhere), and the weight is
    * immediately floored to a micro-unit integer, so normalization and
    * apportionment are pure Long arithmetic — no double accumulates
    * across rows (graft's oracle-exactness rule). Scale: everything
    * after the first aggregate operates on the per-source table
    * (dozens of rows); the global windows there are driver-scale by
    * construction. */
  val sourceMixing = Q(
    "a10_source_mixing",
    "Temperature-0.5 mixing weights: per-source char mass -> sqrt-damped micro-unit weights -> largest-remainder allocation of a 100k-doc budget.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val budget = 100000L
      val per = t.documents.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("mass"))
        .withColumn("w", floor(sqrt(col("mass").cast("double") * 1e6)).cast("long"))
      val tot = per.agg(sum(col("w")).as("wsum"))
      per.crossJoin(broadcast(tot))
        .withColumn("quota_floor", expr(s"($budget * w) div wsum"))
        .withColumn("rem", expr(s"($budget * w) % wsum"))
        .withColumn("qsum", sum(col("quota_floor")).over(Window.partitionBy()))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .withColumn("alloc",
          col("quota_floor") + when(col("rk") <= lit(budget) - col("qsum"), 1L).otherwise(0L))
        .select(col("source"), col("n_docs"), col("mass"), col("w"),
          col("quota_floor"), col("alloc"))
    },
    Some("""WITH per AS (
              SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS mass
              FROM documents GROUP BY 1
            ), w AS (
              SELECT *, CAST(floor(sqrt(CAST(mass AS DOUBLE) * 1000000.0)) AS BIGINT) AS w FROM per
            ), t AS (
              SELECT CAST(sum(w) AS BIGINT) AS wsum FROM w
            ), q AS (
              SELECT w.*, (100000 * w) // wsum AS quota_floor, (100000 * w) % wsum AS rem
              FROM w, t
            ), r AS (
              SELECT *, CAST(sum(quota_floor) OVER () AS BIGINT) AS qsum,
                row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
              FROM q
            )
            SELECT source, n_docs, mass, w, quota_floor,
              CAST(quota_floor + CASE WHEN rk <= 100000 - qsum THEN 1 ELSE 0 END AS BIGINT) AS alloc
            FROM r""")
  )

  /** A10 ⊕ — contrastive training-batch construction with the in-batch-
    * negatives constraint: a CLIP/DPR-style loss treats every other row
    * of a batch as a negative, so two documents from the SAME source in
    * one batch are a false negative. The builder shuffles
    * deterministically (seeded md5, reproducible across runs and
    * partitionings), ranks documents WITHIN each source, and interleaves
    * by (rank, source) before cutting fixed batches of 32 — so a source
    * repeats in a batch only when the batch is bigger than the number of
    * live sources, and then by at most the forced minimum. The emitted
    * census (docs / distinct sources / max-per-source per batch) is the
    * constraint audit a training job runs before writing batch files.
    *
    * Scale shape: the per-source rank is a key-partitioned window; the
    * interleave position is NOT a global window over the corpus — it is
    * cum_before(level) + rank-in-level, where the level offsets come
    * from a window over the per-level COUNTS (≤ max-docs-per-source
    * rows, metadata-sized like s9_compaction_plan's planning window) and
    * the in-level rank is partitioned by level (≤ n_sources rows per
    * partition; at extreme source cardinality this level would compose
    * the two-level prefix sum a10_sample_weighted already implements). */
  val contrastiveBatches = Q(
    "a10_contrastive_batches",
    "In-batch-negative-safe batch builder: seeded shuffle, per-source rank, (rank, source) interleave, batches of 32; per-batch diversity census.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val rk = t.documents
        .withColumn("h", md5(concat(lit("cb:"), col("doc_id").cast("string"))))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
        .select(col("doc_id"), col("source"), col("r"))
      val lvl = rk.groupBy(col("r")).agg(count(lit(1)).as("n"))
      val off = lvl
        .withColumn("cum_before",
          coalesce(sum(col("n")).over(
            Window.orderBy(col("r")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("r"), col("cum_before"))
      val pos = rk.join(broadcast(off), "r")
        .withColumn("rn", col("cum_before") +
          row_number().over(Window.partitionBy(col("r")).orderBy(col("source"))))
      pos
        .withColumn("batch_id", expr("(rn - 1) div 32"))
        .groupBy(col("batch_id"), col("source")).agg(count(lit(1)).as("c"))
        .groupBy(col("batch_id"))
        .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_sources"),
          max(col("c")).as("max_per_source"))
    },
    Some("""WITH rk AS (
              SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5('cb:' || CAST(doc_id AS VARCHAR)), doc_id) AS r
              FROM documents
            ), lvl AS (
              SELECT r, count(*) AS n FROM rk GROUP BY 1
            ), off AS (
              SELECT r, CAST(coalesce(sum(n) OVER (ORDER BY r
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
              FROM lvl
            ), pos AS (
              SELECT rk.doc_id, rk.source,
                o.cum_before + row_number() OVER (PARTITION BY rk.r ORDER BY rk.source) AS rn
              FROM rk JOIN off o ON rk.r = o.r
            ), per AS (
              SELECT CAST((rn - 1) // 32 AS BIGINT) AS batch_id, source, count(*) AS c
              FROM pos GROUP BY 1, 2
            )
            SELECT batch_id, CAST(sum(c) AS BIGINT) AS n_docs,
              count(*) AS n_sources, CAST(max(c) AS BIGINT) AS max_per_source
            FROM per GROUP BY 1""")
  )

  /** Per-domain frequency capping (the RefinedWeb/C4 recipe: no single
    * domain may dominate the corpus): keep at most 50 documents per
    * source, chosen by a SEEDED md5 shuffle — deterministic across
    * runs, machines, and partitionings, unlike a random() sample — and
    * report the kept/dropped census per source. Differs from
    * a10_source_mixing (soft proportional quotas over a shared budget):
    * the cap is a hard per-domain ceiling applied independently.
    *
    * Scale shape: one shuffle by source for the per-domain rank. The
    * domain column is high-cardinality in production (millions of
    * hosts) so the window partitioning is healthy; for a pathological
    * mega-domain the rank only needs the hash-top-50, which the bounded
    * partial/final heap of o2_topk_custom computes without a full
    * per-domain sort. */
  val domainCap = Q(
    "a10_domain_cap",
    "Hard per-domain cap: keep <=50 docs per source by seeded md5 shuffle rank; per-source kept/dropped census with char mass.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("cap42:"), col("doc_id").cast("string"))), col("doc_id"))
      t.documents
        .withColumn("rn", row_number().over(w))
        .withColumn("kept", col("rn") <= 50)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("kept"), 1)).as("n_kept"),
          count(when(!col("kept"), 1)).as("n_dropped"),
          coalesce(sum(when(col("kept"), col("n_chars"))), lit(0L)).as("chars_kept"))
        .orderBy(col("source"))
    },
    Some("""WITH r AS (
              SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5('cap42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents
            )
            SELECT source, count(*) AS n_docs,
              count(CASE WHEN rn <= 50 THEN 1 END) AS n_kept,
              count(CASE WHEN rn > 50 THEN 1 END) AS n_dropped,
              CAST(coalesce(sum(CASE WHEN rn <= 50 THEN n_chars END), 0) AS BIGINT) AS chars_kept
            FROM r GROUP BY 1 ORDER BY 1""")
  )

  /** k-anonymity census (Sweeney 2002) — the privacy gate that runs
    * BESIDE x28_pii_scrub in a release pipeline: PII scrubbing removes
    * direct identifiers, k-anonymity measures whether the remaining
    * quasi-identifiers (here: lang × source × length band) still single
    * people out. An equivalence class smaller than k = 5 is re-identifi-
    * able; the census reports, per language, how many classes and
    * documents sit below the threshold — the rows a release process
    * would suppress or generalize.
    *
    * Scale shape: one hash aggregate over the quasi-identifier tuple
    * (map-side combinable), then a tiny per-lang rollup of class sizes.
    * The class census is proportional to DISTINCT quasi-identifier
    * tuples, not documents — bounded at any corpus size. */
  val kAnonymity = Q(
    "a10_k_anonymity",
    "k-anonymity census over (lang, source, n_chars-band) quasi-identifiers: per-lang classes, sub-k classes/docs, min class size.",
    (s, dir) => {
      val t = Tables(s, dir)
      val cls = t.documents
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100L").as("len_band"))
        .agg(count(lit(1)).as("sz"))
      cls.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_classes"),
          count(when(col("sz") < 5, 1)).as("n_risky_classes"),
          coalesce(sum(when(col("sz") < 5, col("sz"))), lit(0L)).as("n_risky_docs"),
          min(col("sz")).as("min_class_size"),
          sum(col("sz")).as("n_docs"))
        .orderBy(col("lang"))
    },
    Some("""WITH cls AS (
              SELECT lang, source, n_chars // 100 AS len_band, count(*) AS sz
              FROM documents GROUP BY 1, 2, 3
            )
            SELECT lang,
              count(*) AS n_classes,
              count(CASE WHEN sz < 5 THEN 1 END) AS n_risky_classes,
              CAST(coalesce(sum(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT) AS n_risky_docs,
              min(sz) AS min_class_size,
              CAST(sum(sz) AS BIGINT) AS n_docs
            FROM cls GROUP BY 1 ORDER BY 1""")
  )

  /** A10 ⊕ — differentially-private release (Dwork et al. 2006), the
    * third leg of the privacy gate beside x28_pii_scrub and
    * a10_k_anonymity: when per-user event counts leave the pipeline
    * (telemetry dashboards, public data cards), the released histogram
    * is CONTRIBUTION-BOUNDED then Laplace-noised. Contribution bounding
    * caps each user at C=10 rows per cell (row_number per (user, type)),
    * which fixes the per-cell sensitivity at C; the release adds
    * Laplace(C/ε) noise, ε=1. The reference's sampler nondeterminism is
    * taken as a parameter (X22 policy): the uniform draw is the first
    * 12 md5 hex chars of the cell key mapped to [-0.5, 0.5), pushed
    * through the exact inverse-CDF −b·sign(u)·ln(1−2|u|) — both engines
    * compute the identical doubles, so even the noise is hash-pinned.
    * n_raw/n_capped/n_clipped_users stay in the frame as the audit
    * columns a release review reads (what got clipped, how hard).
    *
    * Scale shape: the bounding pass is one (user, type)-keyed window —
    * key-partitioned, no global sort; the histogram is a map-side-
    * combinable census; the noise is row-local on ≤|types| rows. */
  val dpRelease = Q(
    "a10_dp_release",
    "Differentially-private histogram release: per-(user,cell) contribution cap C=10, Laplace(C/1) noise via deterministic md5 inverse-CDF; audit columns for raw/capped/clipped.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val ranked = t.events.withColumn("rn",
        row_number().over(
          Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))))
      ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          count(when(col("rn") <= 10, 1)).as("n_capped"),
          count_distinct(when(col("rn") === 11, col("user_id"))).as("n_clipped_users"))
        .withColumn("u",
          conv(substring(md5(concat(lit("dp42:"), col("event_type"))), 1, 12), 16, 10)
            .cast("long").cast("double") / 281474976710656.0 - 0.5)
        .select(col("event_type"), col("n_raw"), col("n_capped"), col("n_clipped_users"),
          round(col("n_capped") +
            lit(-10.0) * signum(col("u")) * log(lit(1.0) - lit(2.0) * abs(col("u"))), 4)
            .as("dp_release"))
        .orderBy(col("event_type"))
    },
    Some("""WITH r AS (
              SELECT event_type, user_id,
                row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
              FROM events
            ), per AS (
              SELECT event_type, count(*) AS n_raw,
                count(CASE WHEN rn <= 10 THEN 1 END) AS n_capped,
                count(DISTINCT CASE WHEN rn = 11 THEN user_id END) AS n_clipped_users
              FROM r GROUP BY 1
            ), seeded AS (
              SELECT *, CAST(CAST(concat('0x', substring(md5('dp42:' || event_type), 1, 12)) AS BIGINT) AS DOUBLE)
                          / 281474976710656.0 - 0.5 AS u
              FROM per
            )
            SELECT event_type, n_raw, n_capped,
              CAST(n_clipped_users AS BIGINT) AS n_clipped_users,
              round(n_capped + (-10.0) * sign(u) * ln(1.0 - 2.0 * abs(u)), 4) AS dp_release
            FROM seeded ORDER BY event_type""")
  )

  /** A10 ⊕ — data-constrained epoch accounting: a10_source_mixing says
    * how many tokens of each source the target mixture WANTS; this asks
    * whether each source can SUPPLY them, and at what repeat rate. For
    * a 3×-corpus training budget apportioned by the sqrt-damped
    * mixture, each source's requested/available ratio is its epoch
    * count (exact integer micro-epochs); sources pushed past 4 epochs
    * are flagged — the data-constrained-scaling regime (Muennighoff et
    * al. 2023) where further repeats stop buying loss, i.e. the signal
    * to go collect more of that source rather than upsample it again.
    *
    * Scale shape: one per-source token census, one tiny broadcast
    * weight-sum, row-local arithmetic — ≤|sources| rows after the
    * first aggregate. */
  val epochBudget = Q(
    "a10_epoch_budget",
    "Epoch feasibility: sqrt-damped mixture apportions a 3x-corpus token budget; per-source requested/available micro-epochs with an over-4-epoch flag.",
    (s, dir) => {
      val t = Tables(s, dir)
      val per = t.documents
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_toks"))
        .groupBy(col("source"))
        .agg(sum(col("n_toks")).as("toks"))
        .withColumn("w", floor(sqrt(col("toks").cast("double") * 1e6)).cast("long"))
      val tot = per.agg(sum(col("w")).as("wsum"), sum(col("toks")).as("total_toks"))
      per.crossJoin(broadcast(tot))
        .withColumn("requested", expr("(3 * total_toks * w) div wsum"))
        .withColumn("epochs_micro", expr("requested * 1000000 div toks"))
        .withColumn("over_cap",
          when(col("epochs_micro") > 4000000L, 1L).otherwise(0L))
        .select(col("source"), col("toks"), col("requested"),
          col("epochs_micro"), col("over_cap"))
        .orderBy(col("source"))
    },
    Some("""WITH per AS (
              SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
              FROM documents GROUP BY 1
            ), w AS (
              SELECT *, CAST(floor(sqrt(CAST(toks AS DOUBLE) * 1000000.0)) AS BIGINT) AS w
              FROM per
            ), t AS (
              SELECT CAST(sum(w) AS BIGINT) AS wsum,
                CAST(sum(toks) AS BIGINT) AS total_toks
              FROM w
            )
            SELECT source, toks,
              (3 * total_toks * w) // wsum AS requested,
              ((3 * total_toks * w) // wsum) * 1000000 // toks AS epochs_micro,
              CAST(CASE WHEN ((3 * total_toks * w) // wsum) * 1000000 // toks > 4000000
                THEN 1 ELSE 0 END AS BIGINT) AS over_cap
            FROM w, t ORDER BY source""")
  )

  /** A10 extension — the hashing trick (Weinberger et al. 2009):
    * vocabulary → fixed 4096-bucket feature space via md5, with the
    * collision census that tells a featurizer whether the table is big
    * enough. Per bucket: how many distinct word types landed there;
    * output is the types-per-bucket histogram plus the implied
    * empty-bucket row — the observed profile a Poisson(λ=V/4096) check
    * reads directly. One word-keyed distinct + two bounded aggregates;
    * the feature table never exists materially (that is the trick —
    * at 100 TB the featurizer maps tokens to indices statelessly, and
    * this census is the only global pass it ever needs). */
  val featureHashing = Q(
    "a10_feature_hashing",
    "Hashing-trick collision census: distinct vocab -> md5 16-bit % 4096 buckets; types-per-bucket histogram incl. the empty-bucket count.",
    (s, dir) => {
      val t = Tables(s, dir)
      val types = t.documents
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .distinct()
      val occupied = types
        .withColumn("bucket",
          expr("cast(conv(substring(md5(concat('fh:', w)), 1, 4), 16, 10) as int) % 4096"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_types"))
        .groupBy(col("n_types")).agg(count(lit(1)).as("n_buckets"))
        // bounded histogram, read twice (rows + empty-bucket row);
        // self-releasing, unlike a leaked .cache()
        .localCheckpoint()
      val empty = occupied
        .agg((lit(4096L) - sum(col("n_buckets"))).as("n_buckets"))
        .select(lit(0L).as("n_types"), col("n_buckets"))
      occupied.select(col("n_types").cast("long").as("n_types"), col("n_buckets"))
        .unionAll(empty)
    },
    Some("""WITH w AS (
              SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS w FROM documents
            ), t AS (
              SELECT w FROM w WHERE length(w) > 0
            ), b AS (
              SELECT ((strpos('0123456789abcdef', h[1]) - 1) * 4096
                    + (strpos('0123456789abcdef', h[2]) - 1) * 256
                    + (strpos('0123456789abcdef', h[3]) - 1) * 16
                    + (strpos('0123456789abcdef', h[4]) - 1)) % 4096 AS bucket
              FROM (SELECT md5('fh:' || w) AS h FROM t)
            ), occ AS (
              SELECT bucket, count(*) AS n_types FROM b GROUP BY 1
            ), hist AS (
              SELECT CAST(n_types AS BIGINT) AS n_types, count(*) AS n_buckets
              FROM occ GROUP BY 1
            )
            SELECT n_types, n_buckets FROM hist
            UNION ALL
            SELECT 0, 4096 - CAST(sum(n_buckets) AS BIGINT) FROM hist""")
  )

  /** A10 extension — group-aware splitting, the fix for the subtlest
    * train/test leak: a ROW-hash split (a10_split_assign) scatters one
    * source's near-identical documents across train AND test, so the
    * model is evaluated on what it memorized. Grouped splitting hashes
    * the GROUP key (source) so every group lands wholly in one split.
    * This census runs BOTH policies side by side and measures the leak
    * directly: under row-hash, how many sources span more than one
    * split (every one is a leakage channel); under group-hash, the same
    * count is provably zero. One scan, two hash columns, two bounded
    * censuses — the group-split is no more expensive than the leaky
    * one, which is the point. */
  val groupSplit = Q(
    "a10_group_split",
    "Group-aware vs row-hash splitting: per-policy split sizes + count of sources spanning >1 split (the leakage channel), group policy provably 0.",
    (s, dir) => {
      val t = Tables(s, dir)
      val hashed = t.documents.select(col("doc_id"), col("source"),
        when(conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4), 16, 10)
          .cast("int") < 58982, "train").otherwise("holdout").as("row_split"),
        when(conv(substring(md5(concat(lit("gsplit:"), col("source"))), 1, 4), 16, 10)
          .cast("int") < 58982, "train").otherwise("holdout").as("group_split"))
      val rowLeak = hashed.groupBy(col("source"))
        .agg(count_distinct(col("row_split")).as("nsp"))
        .agg(sum(when(col("nsp") > 1, 1L).otherwise(0L)).as("n_leaky_sources"))
        .select(lit("row_hash").as("policy"), col("n_leaky_sources"))
      val grpLeak = hashed.groupBy(col("source"))
        .agg(count_distinct(col("group_split")).as("nsp"))
        .agg(sum(when(col("nsp") > 1, 1L).otherwise(0L)).as("n_leaky_sources"))
        .select(lit("group_hash").as("policy"), col("n_leaky_sources"))
      val rowSizes = hashed.groupBy(col("row_split"))
        .agg(count(lit(1)).as("n_docs"))
        .select(lit("row_hash").as("policy"), col("row_split").as("split"), col("n_docs"))
      val grpSizes = hashed.groupBy(col("group_split"))
        .agg(count(lit(1)).as("n_docs"))
        .select(lit("group_hash").as("policy"), col("group_split").as("split"), col("n_docs"))
      rowSizes.unionAll(grpSizes)
        .join(rowLeak.unionAll(grpLeak), "policy")
    },
    Some("""WITH h AS (
              SELECT doc_id, source,
                CASE WHEN ((strpos('0123456789abcdef', r[1]) - 1) * 4096
                         + (strpos('0123456789abcdef', r[2]) - 1) * 256
                         + (strpos('0123456789abcdef', r[3]) - 1) * 16
                         + (strpos('0123456789abcdef', r[4]) - 1)) < 58982
                     THEN 'train' ELSE 'holdout' END AS row_split,
                CASE WHEN ((strpos('0123456789abcdef', g[1]) - 1) * 4096
                         + (strpos('0123456789abcdef', g[2]) - 1) * 256
                         + (strpos('0123456789abcdef', g[3]) - 1) * 16
                         + (strpos('0123456789abcdef', g[4]) - 1)) < 58982
                     THEN 'train' ELSE 'holdout' END AS group_split
              FROM (SELECT doc_id, source,
                      md5('split:' || CAST(doc_id AS VARCHAR)) AS r,
                      md5('gsplit:' || source) AS g
                    FROM documents)
            ), leak AS (
              SELECT 'row_hash' AS policy,
                CAST(sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_sources
              FROM (SELECT source, count(DISTINCT row_split) AS nsp FROM h GROUP BY 1)
              UNION ALL
              SELECT 'group_hash',
                CAST(sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT)
              FROM (SELECT source, count(DISTINCT group_split) AS nsp FROM h GROUP BY 1)
            ), sizes AS (
              SELECT 'row_hash' AS policy, row_split AS split, count(*) AS n_docs
              FROM h GROUP BY 2
              UNION ALL
              SELECT 'group_hash', group_split, count(*) FROM h GROUP BY 2
            )
            SELECT sizes.policy, split, n_docs, n_leaky_sources
            FROM sizes JOIN leak ON sizes.policy = leak.policy""")
  )

  def all: Seq[Q] = Seq(splitAssign, decontaminate, decontaminatePruned,
    decontaminateBloom, packSequences, sampleStratified, sampleWeighted,
    sourceMixing, contrastiveBatches, domainCap, kAnonymity, dpRelease,
    epochBudget, featureHashing, groupSplit)
}
