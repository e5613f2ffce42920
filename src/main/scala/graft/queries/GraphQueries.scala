package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** A12 ⊕ (beyond SURVEY §2, LLM-pipeline north star) — link-graph
  * quality signals over the document corpus. Web-scale curation ranks
  * hosts by how content flows between them (the CommonCrawl host-rank
  * idea); here the "link" is observed content syndication: two sources
  * are connected when they publish the same rare word 5-gram.
  *
  * Everything is exact fixed-point integer arithmetic (micro-units,
  * truncating division on provably non-negative numerators) so the
  * DuckDB oracle hash-matches bit-for-bit — no doubles anywhere.
  */
object GraphQueries {

  /** PageRank over the source-syndication graph, 3 unrolled iterations.
    *
    * Graph construction is the scale-heavy part and stays key-partitioned
    * throughout: spans explode to ~1 row per corpus token, the shared-gram
    * census is one groupBy(gram), and the pair expansion is capped to
    * grams shared by 2–8 sources (a gram in every host is boilerplate,
    * not syndication — the same skew cap as the LSH band joins, so a
    * viral gram cannot quadratically blow up a bucket).
    *
    * Each rank iteration is a join of the rank vector with the edge list
    * on src, then a groupBy(dst) — the textbook distributed PageRank
    * step. The fixture graph is 19 nodes, but the plan is node-count-
    * independent: at 10⁸ hosts the same join-agg runs partitioned on the
    * graph keys; the driver only ever sees the loop counter (3 fixed
    * iterations, no convergence collect). Per-edge contribution is
    * (pr·w) div out_weight in 10⁶ fixed point; damping 0.85 as the exact
    * integer form 150000 + (85·Σ) div 100.
    */
  val syndicationRank = Q(
    "a12_syndication_rank",
    "Fixed-point integer PageRank over the source-syndication graph (shared rare 5-grams, 2-8 source cap). 3 unrolled join-agg iterations.",
    (s, dir) => {
      val t = Tables(s, dir)
      val spans = t.documents
        .select(col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("source"),
          explode(transform(sequence(lit(1), size(col("w")) - 4),
            i => concat_ws(" ", (0 to 4).map(k => element_at(col("w"), i + k)): _*))).as("g"))
        .distinct()
      val sharedGrams = spans.groupBy(col("g"))
        .agg(count(lit(1)).as("ns"))
        .filter(col("ns").between(2, 8))
        .select(col("g"))
      val kept = spans.join(sharedGrams, "g").cache()
      val edges = kept.select(col("g"), col("source").as("src"))
        .join(kept.select(col("g"), col("source").as("dst")), "g")
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .cache()
      val outw = edges.groupBy(col("src"))
        .agg(sum(col("w")).as("ow"), count(lit(1)).as("n_neighbors"))
        .cache()
      var pr = outw.select(col("src").as("s"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        pr = edges.join(pr, edges("src") === pr("s"))
          .join(outw.select(col("src"), col("ow")), "src")
          .selectExpr("dst AS s", "(pr * w) div ow AS c")
          .groupBy(col("s")).agg(sum(col("c")).as("contrib"))
          .selectExpr("s", "150000 + (85 * contrib) div 100 AS pr")
      }
      outw.select(col("src").as("source"), col("n_neighbors"), col("ow").as("total_w"))
        .join(pr.select(col("s").as("source"), col("pr").as("pr_fixed")), "source")
    },
    Some("""WITH toks AS (
              SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
            ), spans AS (
              SELECT DISTINCT source, array_to_string(w[i:i+4], ' ') AS g
              FROM toks, LATERAL unnest(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)
              WHERE len(w) >= 5
            ), gsrc AS (
              SELECT g FROM spans GROUP BY g HAVING count(*) BETWEEN 2 AND 8
            ), e AS (
              SELECT a.source AS src, b.source AS dst, count(*) AS w
              FROM spans a JOIN gsrc USING (g) JOIN spans b USING (g)
              WHERE a.source <> b.source
              GROUP BY 1, 2
            ), outw AS (
              SELECT src, CAST(sum(w) AS BIGINT) AS ow, count(*) AS n_neighbors
              FROM e GROUP BY 1
            ), it0 AS (
              SELECT src AS s, CAST(1000000 AS BIGINT) AS pr FROM outw
            ), it1 AS (
              SELECT e.dst AS s, 150000 + 85 * CAST(sum((it0.pr * e.w) // o.ow) AS BIGINT) // 100 AS pr
              FROM e JOIN it0 ON e.src = it0.s JOIN outw o ON e.src = o.src GROUP BY 1
            ), it2 AS (
              SELECT e.dst AS s, 150000 + 85 * CAST(sum((it1.pr * e.w) // o.ow) AS BIGINT) // 100 AS pr
              FROM e JOIN it1 ON e.src = it1.s JOIN outw o ON e.src = o.src GROUP BY 1
            ), it3 AS (
              SELECT e.dst AS s, 150000 + 85 * CAST(sum((it2.pr * e.w) // o.ow) AS BIGINT) // 100 AS pr
              FROM e JOIN it2 ON e.src = it2.s JOIN outw o ON e.src = o.src GROUP BY 1
            )
            SELECT o.src AS source, o.n_neighbors, o.ow AS total_w, it3.pr AS pr_fixed
            FROM outw o JOIN it3 ON o.src = it3.s""")
  )

  def all: Seq[Q] = Seq(syndicationRank)
}
