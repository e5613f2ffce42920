package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-stress fixture synthesizer: replicate-and-rekey the driver's
  * sf0.1 tables by an integer factor (default 10 → "sf1"), so scaling
  * behavior can be MEASURED instead of design-argued. Usage:
  *
  *   sbt "runMain graft.ScaleGen [srcDir] [dstDir] [factor]"
  *
  * The scale model mirrors how a corpus actually grows — more entities,
  * not denser ones — so per-key work stays bounded and any super-linear
  * curve the bench finds is the ALGORITHM's, not an artifact:
  *
  *   - dimensions (region/nation/customer/supplier/part) copy verbatim:
  *     dims grow much slower than facts, and keeping them fixed keeps
  *     broadcast-ability exactly as production would see it;
  *   - orders/lineitem replicate with `o_orderkey += rep·(max+1)` on
  *     both sides, so referential integrity and per-order line counts
  *     are preserved (each customer simply owns factor× orders);
  *   - events replicate with event_id AND user_id rekeyed — factor×
  *     users at the same per-user density, so per-user windows and
  *     streaming state stay constant-size per key;
  *   - documents replicate with doc_id rekeyed and the text passed
  *     through a per-replica alphabet rotation (a bijective letter
  *     substitution): every replica is internally ISOMORPHIC to the
  *     original corpus (same lengths, token counts, within-replica
  *     similarity structure — dedup finds the same clusters inside each
  *     replica) while replicas share almost no tokens with each other —
  *     no artificial factor-way duplicate blowup that would turn a
  *     scaling measurement into a data-character change;
  *   - embeddings replicate with vec_id rekeyed and a small per-replica
  *     additive offset, breaking exact vector ties without moving the
  *     distance distribution.
  *
  * Output timestamps are plain µs TimestampType; Tables.events' nanos
  * shim is schema-conditional, so the generated dir reads through the
  * same loaders as the driver fixtures.
  */
object ScaleGen {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/target/scale/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-scalegen")
    val t = Tables(spark, src)

    // write with enough files that the sf-scaled scans parallelize the
    // way a real multi-file table would (one splittable file per core)
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      write(t.table(dim), dim, 1)

    val rep = explode(array((0 until factor).map(i => lit(i.toLong)): _*)).as("rep")
    def keyOff(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1

    val oOff = keyOff(t.orders, "o_orderkey")
    write(t.orders.select(col("*"), rep)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * oOff)
      .drop("rep"), "orders", 8)
    write(t.lineitem.select(col("*"), rep)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * oOff)
      .drop("rep"), "lineitem", 32)

    val eOff = keyOff(t.events, "event_id")
    val uOff = keyOff(t.events, "user_id")
    write(t.events.select(col("*"), rep)
      .withColumn("event_id", col("event_id") + col("rep") * eOff)
      .withColumn("user_id", col("user_id") + col("rep") * uOff)
      .drop("rep"), "events", 16)

    // per-replica bijective letter substitution: a when-chain because
    // translate() takes literal maps. For rep < 26 this is the plain
    // alphabet rotation (sf1 regeneration unchanged); beyond 26 replicas
    // a rotation would repeat (rep 26 ≡ rep 0 → whole-corpus exact
    // duplicates, a data-character change), so the map generalizes to an
    // affine cipher x → a·x + b (mod 26) with a coprime to 26 —
    // 12 × 26 = 312 distinct bijections, enough for any factor used here.
    val dOff = keyOff(t.documents, "doc_id")
    val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    def permFor(r: Int): String = {
      val a = coprimes((r / 26) % coprimes.length)
      val b = r % 26
      Alpha.map(ch => Alpha((a * (ch - 'a') + b) % 26)).mkString
    }
    require(factor <= 26 * coprimes.length, s"factor $factor exceeds the distinct substitution count")
    val rotated = (1 until factor).foldLeft(
      when(col("rep") === 0, col("text"))) { (acc, r) =>
      acc.when(col("rep") === r, translate(col("text"), Alpha, permFor(r)))
    }
    write(t.documents.select(col("*"), rep)
      .withColumn("doc_id", col("doc_id") + col("rep") * dOff)
      .withColumn("text", rotated)
      .drop("rep"), "documents", 16)

    val vOff = keyOff(t.embeddings, "vec_id")
    write(t.embeddings.select(col("*"), rep)
      .withColumn("vec_id", col("vec_id") + col("rep") * vOff)
      .withColumn("embedding", transform(col("embedding"),
        x => x + col("rep").cast("float") * lit(1e-3f)))
      .drop("rep"), "embeddings", 16)

    // sanity: every fact table must hold exactly factor× the source rows
    for (n <- Seq("orders", "lineitem", "events", "documents", "embeddings")) {
      val (a, b) = (t.table(n).count(), spark.read.parquet(s"$dst/$n.parquet").count())
      require(b == a * factor, s"$n: expected ${a * factor} rows, wrote $b")
      println(s"[scalegen] $n: $a -> $b rows")
    }
    spark.stop()
  }
}
