package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 J5 / §2.8 X29 ⊕ depth — the vector-index *training*
  * and *compression* operators that sit beside ANN search in a production
  * embedding pipeline: a distributed k-means (Lloyd) iteration to train
  * the IVF codebook that `j5_ivf_probe` consumes, and scalar int8 (SQ8)
  * quantization with an exact reconstruction-error census.
  *
  * Cross-engine exactness: every per-element value is first fixed-pointed
  * with `floor(x * 1e6)` (floor is exact on identical doubles, unlike
  * round's half-tie), after which all distances, assignments, codes, and
  * error sums are pure Long arithmetic — order-independent and
  * bit-identical in Spark and DuckDB. No double accumulates across rows
  * anywhere (the q10 lesson from round 4).
  *
  * Scale shapes:
  *  - k-means: the codebook is broadcast (K rows); assignment is one
  *    corpus scan with row-local distance math; the recompute is one hash
  *    aggregate on (centroid, dim) — 100 TB of vectors stream through two
  *    narrow stages per Lloyd round, exactly how Spark MLlib's KMeans
  *    schedules it.
  *  - SQ8: per-dimension min/max is one tiny aggregate (64 groups),
  *    broadcast back; encoding is row-local. Compressed vectors are 4x
  *    smaller, which is the difference between an in-memory and a spilled
  *    ANN probe at corpus scale.
  */
object VectorQueries {

  /** Fixed-point quantization of the embedding: exact Long micro-units
    * (shared with the streaming index-maintenance path via PqIndex). */
  private def quantized = graft.ops.PqIndex.quantized

  /** Row-local 1-bit sign pack of a 32-element array slice into one
    * long: bit i set iff element i >= 0 — the same two words the old
    * posexplode + sum(shiftleft) aggregate built, computed as a per-row
    * array fold so the pack needs no exchange (r12 optimization;
    * j5_hamming_topk and the cascade's tier 0 share it). */
  private def signPack(sliceSql: String) = expr(
    s"aggregate(zip_with($sliceSql, sequence(0, 31), " +
      "(e, i) -> IF(e >= 0, shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)")

  /** J5 ⊕ — one Lloyd iteration of k-means over the embeddings: assign
    * every vector to its nearest of K=8 seed centroids (the first 8
    * corpus vectors, the same deterministic seeding as j5_ivf_probe's
    * codebook), then emit the new centroid as exact fixed-point sums —
    * (c_id, dim, sum_micro, n_members) is the numerator/denominator pair
    * of the updated mean, 8x64 rows. */
  val kmeansIter = Q(
    "j5_kmeans_iter",
    "Distributed Lloyd iteration: broadcast K=8 codebook, exact integer L2 assignment, new centroids as (sum_micro, n) fixed-point pairs per dim.",
    (s, dir) => {
      val t = Tables(s, dir)
      val q = t.embeddings.select(col("vec_id"), quantized.as("qe"))
      val cents = broadcast(q.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("qe").as("ce")))
      val d2 = aggregate(
        zip_with(col("qe"), col("ce"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
      // argmin and the vector ride the SAME aggregate (qe is constant per
      // vec_id, so first() is deterministic) — one shuffle on vec_id, no
      // join-back; map-side partial agg collapses the K-way expansion
      // before the exchange
      val best = q.join(cents)
        .withColumn("d2", d2)
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("c_id"))).as("m"), first(col("qe")).as("qe"))
        .select(col("m.c_id").as("c_id"), col("qe"))
      best
        .select(col("c_id"), posexplode(col("qe")).as(Seq("dim", "v")))
        .groupBy(col("c_id"), col("dim"))
        .agg(sum(col("v")).as("sum_micro"), count(lit(1)).as("n_members"))
    },
    Some("""WITH q AS (
              SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
              FROM embeddings
            ), cent AS (
              SELECT vec_id AS c_id, qe AS ce FROM q WHERE vec_id < 8
            ), d AS (
              SELECT q.vec_id, cent.c_id,
                list_reduce(list_transform(generate_series(1, 64),
                  i -> (q.qe[i] - cent.ce[i]) * (q.qe[i] - cent.ce[i])), (x, y) -> x + y) AS d2
              FROM q, cent
            ), best AS (
              SELECT vec_id, c_id FROM (
                SELECT vec_id, c_id,
                  row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn
                FROM d) WHERE rn = 1
            ), ex AS (
              SELECT b.c_id, g.dim, q.qe[g.dim + 1] AS v
              FROM best b JOIN q USING (vec_id)
              CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) g
            )
            SELECT c_id, CAST(dim AS INT) AS dim,
                   CAST(sum(v) AS BIGINT) AS sum_micro,
                   count(*) AS n_members
            FROM ex GROUP BY c_id, dim""")
  )

  /** X29 ⊕ — SQ8 scalar quantization: per-dimension [min, max] over the
    * corpus defines a 256-level grid; each element encodes to
    * `floor((x - min) * 255 / (max - min))` and reconstructs to the cell
    * midpoint. The per-vector census is exact: working in doubled scaled
    * units (err_510 = |2*255*(x - min) - (2*code + 1)*(max - min)|, all
    * Long) removes every fractional midpoint, so the total absolute error
    * and clip counts are integer-exact in both engines. */
  val sq8 = Q(
    "j5_sq8_quantize",
    "SQ8 scalar quantization: per-dim min/max grid (one 64-group agg, broadcast back), int codes, exact integer reconstruction-error census per vector.",
    (s, dir) => {
      val t = Tables(s, dir)
      val el = t.embeddings
        .select(col("vec_id"), posexplode(quantized).as(Seq("dim", "x")))
      val dims = broadcast(el.groupBy(col("dim"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx")))
      el.join(dims, "dim")
        .withColumn("den", col("mx") - col("mn"))
        .withColumn("code",
          when(col("den") === 0, 0L)
            .otherwise(expr("((x - mn) * 255) div den")))
        .withColumn("err510",
          when(col("den") === 0, 0L)
            .otherwise(abs((col("x") - col("mn")) * 510 - (col("code") * 2 + 1) * col("den"))))
        .groupBy(col("vec_id"))
        .agg(
          sum(col("err510")).as("total_err_510"),
          sum(col("code")).as("code_sum"),
          count(when(col("code") === 0, 1)).as("n_floor"),
          count(when(col("code") === 255, 1)).as("n_ceil"))
    },
    Some("""WITH q AS (
              SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
              FROM embeddings
            ), el AS (
              SELECT vec_id, g.dim, qe[g.dim + 1] AS x
              FROM q CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) g
            ), dims AS (
              SELECT dim, min(x) AS mn, max(x) AS mx FROM el GROUP BY dim
            ), coded AS (
              SELECT vec_id,
                CASE WHEN mx = mn THEN 0 ELSE ((x - mn) * 255) // (mx - mn) END AS code,
                CASE WHEN mx = mn THEN 0
                     ELSE abs((x - mn) * 510 - ((((x - mn) * 255) // (mx - mn)) * 2 + 1) * (mx - mn))
                END AS err510
              FROM el JOIN dims USING (dim)
            )
            SELECT vec_id,
                   CAST(sum(err510) AS BIGINT) AS total_err_510,
                   CAST(sum(code) AS BIGINT) AS code_sum,
                   count(CASE WHEN code = 0 THEN 1 END) AS n_floor,
                   count(CASE WHEN code = 255 THEN 1 END) AS n_ceil
            FROM coded GROUP BY vec_id""")
  )

  /** J5 ⊕ — product quantization with asymmetric distance computation
    * (Jégou et al. 2011, the FAISS IVF-PQ search core): 64 dims split
    * into M=8 sub-spaces of 8; each sub-vector encodes to its nearest of
    * 16 sub-codewords (the first 16 corpus vectors' sub-vectors, same
    * deterministic seeding as the IVF codebook); a query builds a tiny
    * (M x 16) distance look-up table and scores every DB vector by
    * summing LUT entries addressed by its codes — the DB vectors are
    * never touched, only their 8-code rows.
    *
    * All distances are exact Long sums in fixed-point micro-units, so
    * codes, LUTs, ADC totals, and ranks are bit-identical across engines
    * (ties break on lowest codeword / vec_id).
    *
    * Scale shape: codes are ~1/32 the vector bytes (the compressed
    * corpus IS the index); the LUT is query-local and broadcast; the
    * scoring pass is one scan of the codes table with a broadcast hash
    * join on (m, code) + one partial-agged shuffle on (q_id, vec_id).
    * Encoding is one broadcast join + one argmin aggregate — the same
    * two-stage shape as j5_kmeans_iter. */
  /** The shared PQ/ADC pipeline: quantized corpus `q`, and the per-query
    * ADC score table `(q_id, vec_id, adc_dist)` — factored so the plain
    * ADC query and the two-stage refine query build the SAME index and
    * stay plan- and bit-identical on the stage they share. */
  private def adcPipeline(t: Tables): (DataFrame, DataFrame) = {
    import graft.ops.PqIndex
    // scan widened on vec_id (ops/ScanLayout): the encode explosion
    // (8 sub-spaces x 16 codewords x zip_with distance per vector) is
    // ~128 distance kernels per vector pipelined onto the scan task —
    // the dominant single-threaded stretch of every PQ query — while
    // the vector payload is ~0.5 KB/row, so the widen exchange is tiny
    // cached (r13, the ADVICE follow-up): q fans out to the codebook,
    // the encode, the query LUT, and (in refine) the exact re-rank —
    // uncached, each consumer re-ran the scan + widen + quantize
    // (no ReusedExchange fires across these subtrees; verified in
    // plans/r13/j5_pq_refine_before.txt — two separate REPARTITION
    // exchanges of the same scan)
    val q = graft.ops.ScanLayout.widenByKey(t.embeddings, col("vec_id"))
      .select(col("vec_id"), quantized.as("qe"))
      .cache()
    val cw = PqIndex.codebook(q)
    val codes = PqIndex.encode(q, cw)
    val lut = broadcast(PqIndex.subVectors(q)
      .filter(col("vec_id").between(450, 459))
      .withColumnRenamed("vec_id", "q_id")
      .join(cw, "m")
      .withColumn("d2", PqIndex.subDist2)
      .select(col("q_id"), col("m").as("lm"), col("cw_id"), col("d2")))
    val adc = codes.join(lut, col("lm") === col("m") && col("cw_id") === col("code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_dist"))
    (q, adc)
  }

  val pqAdc = Q(
    "j5_pq_adc",
    "Product-quantization ANN: 8x8 sub-spaces, 16-codeword argmin encode, per-query broadcast LUT, exact integer ADC scan, top-3 per query.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (_, adc) = adcPipeline(Tables(s, dir))
      val w = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
      adc
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id"), col("rank"), col("adc_dist"))
    },
    Some(s"""WITH $adcCtes
            SELECT q_id, vec_id, rank, adc_dist FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY adc_dist ASC, vec_id ASC) AS rank
              FROM adc)
            WHERE rank <= 3""")
  )

  /** J5 ⊕ — the two-stage retrieve-then-refine search every production
    * PQ index actually runs (FAISS `IVFPQR` / re-rank pattern): the
    * compressed-domain ADC scan nominates a candidate shortlist
    * (top-16 per query — cheap, approximate, touches only the 8-byte
    * codes), then ONLY those candidates' raw vectors are fetched and
    * re-ranked by exact integer L2. Emits both ranks, so the result
    * shows the refinement reordering the shortlist (adc_rank vs rank).
    *
    * Scale shape: stage 1 is j5_pq_adc's scan unchanged; stage 2 joins
    * a |Q|·16-row candidate list (broadcast — bounded by query count,
    * not corpus size) against the corpus on vec_id, so the exact-math
    * pass reads raw vectors for a constant number of rows per query
    * while the corpus-wide pass never leaves the compressed domain.
    * This is the memory-bandwidth contract that makes PQ work at
    * 100 TB: full vectors are touched O(|Q|·k), not O(n). */
  val pqRefine = Q(
    "j5_pq_refine",
    "Two-stage PQ search: ADC top-16 shortlist in the compressed domain, then exact integer L2 re-rank of only those candidates; top-3 per query.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (q, adc) = adcPipeline(Tables(s, dir))
      val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id").asc)
      val cand = adc
        .withColumn("adc_rank", row_number().over(wAdc))
        .filter(col("adc_rank") <= 16)
      val qvecs = broadcast(q.filter(col("vec_id").between(450, 459))
        .select(col("vec_id").as("q_id"), col("qe").as("q_vec")))
      val exact = broadcast(cand)
        .join(q, "vec_id")
        .join(qvecs, "q_id")
        .withColumn("d2_exact", aggregate(
          zip_with(col("qe"), col("q_vec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
      val wEx = Window.partitionBy(col("q_id")).orderBy(col("d2_exact").asc, col("vec_id").asc)
      exact
        .withColumn("rank", row_number().over(wEx))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id"), col("rank"), col("d2_exact"), col("adc_rank"))
    },
    Some(s"""WITH $adcCtes, cand AS (
              SELECT q_id, vec_id, adc_rank FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q_id ORDER BY adc_dist ASC, vec_id ASC) AS adc_rank
                FROM adc)
              WHERE adc_rank <= 16
            ), ex AS (
              SELECT c.q_id, c.vec_id, c.adc_rank,
                CAST(list_reduce(list_transform(generate_series(1, 64),
                  i -> (qv.qe[i] - qq.qe[i]) * (qv.qe[i] - qq.qe[i])), (x, y) -> x + y)
                  AS BIGINT) AS d2_exact
              FROM cand c
              JOIN q qv ON qv.vec_id = c.vec_id
              JOIN q qq ON qq.vec_id = c.q_id
            )
            SELECT q_id, vec_id, rank, d2_exact, adc_rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY d2_exact ASC, vec_id ASC) AS rank
              FROM ex)
            WHERE rank <= 3""")
  )

  /** The DuckDB formulation of [[adcPipeline]], shared verbatim by the
    * j5_pq_adc and j5_pq_refine oracles. */
  private def adcCtes: String =
    """q AS (
              SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
              FROM embeddings
            ), sub AS (
              SELECT vec_id, g.m,
                list_transform(generate_series(1, 8), i -> qe[g.m * 8 + i]) AS sub
              FROM q CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m) g
            ), cw AS (
              SELECT m, vec_id AS cw_id, sub AS cw FROM sub WHERE vec_id < 16
            ), codes AS (
              SELECT vec_id, m, cw_id AS code FROM (
                SELECT s.vec_id, s.m, c.cw_id,
                  row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    list_reduce(list_transform(generate_series(1, 8),
                      i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i])), (x, y) -> x + y) ASC,
                    c.cw_id ASC) AS rn
                FROM sub s JOIN cw c USING (m))
              WHERE rn = 1
            ), lut AS (
              SELECT s.vec_id AS q_id, s.m, c.cw_id,
                list_reduce(list_transform(generate_series(1, 8),
                  i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i])), (x, y) -> x + y) AS d2
              FROM sub s JOIN cw c USING (m)
              WHERE s.vec_id BETWEEN 450 AND 459
            ), adc AS (
              SELECT l.q_id, co.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_dist
              FROM codes co JOIN lut l ON l.m = co.m AND l.cw_id = co.code
              WHERE l.q_id <> co.vec_id
              GROUP BY 1, 2
            )"""

  /** J5 ⊕ — binary-sign (1-bit) quantization + Hamming top-k: keep only
    * the SIGN of each of the 64 dimensions, packed into two 32-bit words
    * (two halves so no packed value ever crosses the BIGINT sign bit —
    * DuckDB widens BIGINT sums to HUGEINT, so a 2^63 bit would diverge),
    * then rank the corpus against a probe vector by
    * popcount(xor(lo)) + popcount(xor(hi)). This is the coarsest, fastest
    * ANN tier — 64 dims × 4 bytes → 8 bytes/vector, a 32× compression —
    * and on sign-distributed embeddings Hamming distance tracks angular
    * distance (Charikar 2002, SimHash for cosine); production stacks use
    * it as the shortlist tier in front of SQ8/PQ re-rank (j5_pq_refine).
    *
    * Scale shape: packing is ONE aggregate per vector (map-side combine,
    * 2 longs of state); the probe row is a broadcast single-row
    * aggregate; ranking is a row-local xor/popcount scan planning as
    * TakeOrderedAndProject. At 100 TB the packed index is ~0.8% the size
    * of the raw float corpus and the scan never touches the floats. */
  val hammingTopK = Q(
    "j5_hamming_topk",
    "1-bit sign quantization packed to 2x32-bit words; Hamming top-20 vs probe vec_id=0 via bit_count(xor) — 32x-compressed coarse ANN tier.",
    (s, dir) => {
      val t = Tables(s, dir)
      // row-local sign pack (r12 optimization): the old posexplode +
      // groupBy re-assembled each vector from its own 64 exploded rows
      // through a full exchange + hash aggregate; the pack is a pure
      // per-row fold over the array, so it stays inside the scan's
      // projection — zero exchanges, identical two words (bit pos =
      // array pos, same signs)
      val packed = t.embeddings
        .select(col("vec_id"), col("label"),
          signPack("slice(embedding, 1, 32)").as("lo"),
          signPack("slice(embedding, 33, 32)").as("hi"))
      val probe = broadcast(packed.filter(col("vec_id") === 0)
        .select(col("lo").as("p_lo"), col("hi").as("p_hi")))
      packed.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id"), col("label"),
          (bit_count(col("lo").bitwiseXOR(col("p_lo"))) +
            bit_count(col("hi").bitwiseXOR(col("p_hi")))).cast("long").as("hd"))
        .orderBy(col("hd").asc, col("vec_id").asc)
        .limit(20)
    },
    Some("""WITH packed AS (
              SELECT vec_id, label,
                CAST(sum(CASE WHEN i <= 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
                CAST(sum(CASE WHEN i > 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
              FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
              GROUP BY vec_id, label
            ), probe AS (
              SELECT lo AS p_lo, hi AS p_hi FROM packed WHERE vec_id = 0
            )
            SELECT vec_id, label,
              CAST(bit_count(xor(lo, p_lo)) + bit_count(xor(hi, p_hi)) AS BIGINT) AS hd
            FROM packed, probe
            WHERE vec_id <> 0
            ORDER BY hd ASC, vec_id ASC
            LIMIT 20""")
  )

  /** J5 ⊕ — the full production retrieval CASCADE, tiered coarse→fine
    * exactly as a serving stack layers it (e.g. a FAISS binary-prefilter
    * + IVFPQR deployment): the 1-bit Hamming tier (8 bytes/vector, xor +
    * popcount) nominates 64 candidates per query; the PQ-ADC tier
    * (8 bytes of codes + a broadcast LUT) re-scores ONLY those and keeps
    * 16; the exact integer-L2 tier touches raw vectors for just that
    * shortlist and emits the final top-3 — with all three ranks visible
    * so the successive reorderings are auditable. Per query the raw
    * corpus is touched 16 times regardless of corpus size; the
    * compressed tiers are the only full scans, at ~1.6% of the raw
    * bytes.
    *
    * Scale shape: tier 0 is a row-local xor/popcount scan against a
    * 10-row broadcast; tier 1 restricts the codes scan to a broadcast
    * 640-row candidate list before the LUT join; tier 2 is pqRefine's
    * broadcast-fetch. Every tier's intermediate is bounded by
    * |Q|×k, never by the corpus. */
  val cascade = Q(
    "j5_cascade",
    "Tiered ANN cascade: 1-bit Hamming top-64 -> PQ-ADC top-16 -> exact integer L2 top-3 per query, all three ranks emitted.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.PqIndex
      val t = Tables(s, dir)
      // scan widened on vec_id (ops/ScanLayout) — same rationale as
      // adcPipeline: parallel PQ encode off the unsplittable scan
      val emb = graft.ops.ScanLayout.widenByKey(t.embeddings, col("vec_id"))
      // cached as in adcPipeline (r13): q feeds the codebook/encode/LUT
      // chain, the exact tier's join, and the query-vector broadcast
      val q = emb.select(col("vec_id"), quantized.as("qe")).cache()
      // tier 0: 1-bit sign pack (two 32-bit words, as j5_hamming_topk —
      // row-local fold, no explode/exchange; see signPack)
      val packed = emb
        .select(col("vec_id"),
          signPack("slice(embedding, 1, 32)").as("lo"),
          signPack("slice(embedding, 33, 32)").as("hi"))
      val hamQ = broadcast(packed.filter(col("vec_id").between(450, 459))
        .select(col("vec_id").as("q_id"), col("lo").as("p_lo"), col("hi").as("p_hi")))
      val wHam = Window.partitionBy(col("q_id"))
        .orderBy(col("hd").asc, col("vec_id").asc)
      val ham = packed.crossJoin(hamQ)
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("hd",
          (bit_count(col("lo").bitwiseXOR(col("p_lo"))) +
            bit_count(col("hi").bitwiseXOR(col("p_hi")))).cast("long"))
        .withColumn("ham_rank", row_number().over(wHam))
        .filter(col("ham_rank") <= 64)
        .select(col("q_id"), col("vec_id"), col("ham_rank"))
      // tier 1: ADC restricted to the Hamming survivors
      val cw = PqIndex.codebook(q)
      val codes = PqIndex.encode(q, cw)
      val lut = broadcast(PqIndex.subVectors(q)
        .filter(col("vec_id").between(450, 459))
        .withColumnRenamed("vec_id", "lq_id")
        .join(cw, "m")
        .withColumn("d2", PqIndex.subDist2)
        .select(col("lq_id"), col("m").as("lm"), col("cw_id"), col("d2")))
      val wAdc = Window.partitionBy(col("q_id"))
        .orderBy(col("adc_dist").asc, col("vec_id").asc)
      val short = broadcast(ham).join(codes, "vec_id")
        .join(lut, col("lm") === col("m") && col("cw_id") === col("code") &&
          col("lq_id") === col("q_id"))
        .groupBy(col("q_id"), col("vec_id"), col("ham_rank"))
        .agg(sum(col("d2")).as("adc_dist"))
        .withColumn("adc_rank", row_number().over(wAdc))
        .filter(col("adc_rank") <= 16)
      // tier 2: exact integer L2 on the 16-row shortlist
      val qvecs = broadcast(q.filter(col("vec_id").between(450, 459))
        .select(col("vec_id").as("qq_id"), col("qe").as("q_vec")))
      val wEx = Window.partitionBy(col("q_id"))
        .orderBy(col("d2_exact").asc, col("vec_id").asc)
      broadcast(short).join(q, "vec_id")
        .join(qvecs, col("qq_id") === col("q_id"))
        .withColumn("d2_exact", aggregate(
          zip_with(col("qe"), col("q_vec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .withColumn("rank", row_number().over(wEx))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id"), col("rank"),
          col("d2_exact"), col("adc_rank"), col("ham_rank"))
    },
    Some(s"""WITH $adcCtes, packed AS (
              SELECT vec_id,
                CAST(sum(CASE WHEN i <= 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
                CAST(sum(CASE WHEN i > 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
              FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g2
              GROUP BY vec_id
            ), hamq AS (
              SELECT vec_id AS q_id, lo AS p_lo, hi AS p_hi FROM packed
              WHERE vec_id BETWEEN 450 AND 459
            ), ham AS (
              SELECT q_id, vec_id, ham_rank FROM (
                SELECT hq.q_id, p.vec_id, row_number() OVER (
                  PARTITION BY hq.q_id ORDER BY
                    bit_count(xor(p.lo, hq.p_lo)) + bit_count(xor(p.hi, hq.p_hi)) ASC,
                    p.vec_id ASC) AS ham_rank
                FROM packed p, hamq hq WHERE p.vec_id <> hq.q_id)
              WHERE ham_rank <= 64
            ), shortl AS (
              SELECT q_id, vec_id, ham_rank, adc_rank FROM (
                SELECT h.q_id, h.vec_id, h.ham_rank, row_number() OVER (
                  PARTITION BY h.q_id ORDER BY a.adc_dist ASC, h.vec_id ASC) AS adc_rank
                FROM ham h JOIN adc a ON a.q_id = h.q_id AND a.vec_id = h.vec_id)
              WHERE adc_rank <= 16
            ), ex AS (
              SELECT c.q_id, c.vec_id, c.ham_rank, c.adc_rank,
                CAST(list_reduce(list_transform(generate_series(1, 64),
                  i -> (qv.qe[i] - qq.qe[i]) * (qv.qe[i] - qq.qe[i])), (x, y) -> x + y)
                  AS BIGINT) AS d2_exact
              FROM shortl c
              JOIN q qv ON qv.vec_id = c.vec_id
              JOIN q qq ON qq.vec_id = c.q_id
            )
            SELECT q_id, vec_id, rank, d2_exact, adc_rank, ham_rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY d2_exact ASC, vec_id ASC) AS rank
              FROM ex)
            WHERE rank <= 3""")
  )

  /** J5 ⊕ — rank-position retrieval eval (MRR@10): j5_ivf_recall asks
    * "did the ANN tier find the truth?"; this asks "how HIGH did it
    * rank it?" — the metric that actually moves when a tier is tuned,
    * because recall@k is blind to ordering inside the top k. Ground
    * truth is the exact integer-L2 nearest neighbor per probe; the
    * system under eval is the 1-bit Hamming tier's top-10; the
    * reciprocal rank is exact integer micro-units (1e6 div rank, 0 on
    * miss) so the mean over probes is oracle-stable — no double math
    * anywhere. Emits per-probe rows (truth id, found rank with -1
    * sentinel, rr) so individual failures are auditable, not just the
    * aggregate.
    *
    * Scale shape: both sides are the established bounded plans (probe
    * batch broadcast, window ranks per probe); the eval join touches
    * ≤ |Q|·10 candidate rows. */
  val mrrEval = Q(
    "j5_mrr_eval",
    "MRR@10 eval of the Hamming ANN tier vs exact integer-L2 truth: per-probe found-rank (-1 on miss) + reciprocal rank in exact micro-units.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(s, dir)
      val q = t.embeddings.select(col("vec_id"), quantized.as("qe"))
      val probes = broadcast(q.filter(col("vec_id").between(450, 459))
        .select(col("vec_id").as("q_id"), col("qe").as("q_vec")))
      val wEx = Window.partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
      val truth = q.join(probes, col("vec_id") =!= col("q_id"))
        .withColumn("d2", aggregate(
          zip_with(col("qe"), col("q_vec"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .withColumn("rk", row_number().over(wEx))
        .filter(col("rk") === 1)
        .select(col("q_id"), col("vec_id").as("truth_id"))
      val packed = t.embeddings
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy(col("vec_id"))
        .agg(
          expr("sum(CASE WHEN pos < 32 AND e >= 0 THEN shiftleft(1L, int(pos)) ELSE 0L END)").as("lo"),
          expr("sum(CASE WHEN pos >= 32 AND e >= 0 THEN shiftleft(1L, int(pos) - 32) ELSE 0L END)").as("hi"))
      val hamQ = broadcast(packed.filter(col("vec_id").between(450, 459))
        .select(col("vec_id").as("h_qid"), col("lo").as("p_lo"), col("hi").as("p_hi")))
      val wHam = Window.partitionBy(col("h_qid")).orderBy(col("hd").asc, col("vec_id").asc)
      val ham10 = packed.crossJoin(hamQ)
        .filter(col("vec_id") =!= col("h_qid"))
        .withColumn("hd",
          (bit_count(col("lo").bitwiseXOR(col("p_lo"))) +
            bit_count(col("hi").bitwiseXOR(col("p_hi")))).cast("long"))
        .withColumn("ham_rank", row_number().over(wHam))
        .filter(col("ham_rank") <= 10)
        .select(col("h_qid"), col("vec_id").as("h_vid"), col("ham_rank"))
      truth.join(ham10,
          col("q_id") === col("h_qid") && col("truth_id") === col("h_vid"), "left")
        .select(col("q_id"), col("truth_id"),
          coalesce(col("ham_rank").cast("long"), lit(-1L)).as("found_rank"))
        .withColumn("rr_micro",
          when(col("found_rank") > 0, expr("1000000 div found_rank")).otherwise(lit(0L)))
        .orderBy(col("q_id"))
    },
    Some("""WITH q AS (
              SELECT vec_id,
                list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
              FROM embeddings
            ), probes AS (
              SELECT vec_id AS q_id, qe AS q_vec FROM q WHERE vec_id BETWEEN 450 AND 459
            ), truth AS (
              SELECT q_id, vec_id AS truth_id FROM (
                SELECT p.q_id, c.vec_id, row_number() OVER (PARTITION BY p.q_id ORDER BY
                  list_reduce(list_transform(generate_series(1, 64),
                    i -> (c.qe[i] - p.q_vec[i]) * (c.qe[i] - p.q_vec[i])), (x, y) -> x + y) ASC,
                  c.vec_id ASC) AS rk
                FROM q c, probes p WHERE c.vec_id <> p.q_id)
              WHERE rk = 1
            ), packed AS (
              SELECT vec_id,
                CAST(sum(CASE WHEN i <= 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
                CAST(sum(CASE WHEN i > 32 AND embedding[i] >= 0
                  THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
              FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
              GROUP BY vec_id
            ), hamq AS (
              SELECT vec_id AS q_id, lo AS p_lo, hi AS p_hi FROM packed
              WHERE vec_id BETWEEN 450 AND 459
            ), ham AS (
              SELECT q_id, vec_id, ham_rank FROM (
                SELECT hq.q_id, p.vec_id, row_number() OVER (
                  PARTITION BY hq.q_id ORDER BY
                    bit_count(xor(p.lo, hq.p_lo)) + bit_count(xor(p.hi, hq.p_hi)) ASC,
                    p.vec_id ASC) AS ham_rank
                FROM packed p, hamq hq WHERE p.vec_id <> hq.q_id)
              WHERE ham_rank <= 10
            )
            SELECT t.q_id, t.truth_id,
              CAST(coalesce(h.ham_rank, -1) AS BIGINT) AS found_rank,
              CAST(CASE WHEN h.ham_rank IS NOT NULL
                THEN 1000000 // h.ham_rank ELSE 0 END AS BIGINT) AS rr_micro
            FROM truth t LEFT JOIN ham h ON h.q_id = t.q_id AND h.vec_id = t.truth_id
            ORDER BY t.q_id""")
  )

  def all: Seq[Q] = Seq(kmeansIter, sq8, pqAdc, pqRefine, hammingTopK, cascade,
    mrrEval)
}
