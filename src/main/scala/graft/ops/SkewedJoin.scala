package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4 / the 100 TB playbook).
  *
  * AQE's skew-join split handles most skew at runtime, but it only
  * splits oversized SHUFFLE partitions — it cannot help when one logical
  * key is itself hot (every row of the hot key still meets every build
  * row of that key in one task's stream). Salting fixes the logical key:
  * the probe side scatters each key across `saltBuckets` sub-keys; the
  * build side replicates each key to all sub-keys. The join then
  * distributes the hot key's work over `saltBuckets` tasks.
  *
  * Cost model: build side is replicated ×saltBuckets — use only when the
  * build side is small relative to the skew saved, and pick saltBuckets
  * ≈ (hot-key rows / target-partition rows). Results are identical to
  * the plain join (spec-verified): salting only changes distribution.
  */
object SkewedJoin {

  /** Inner equi-join `probe(probeKey) = build(buildKey)` with the probe
    * side salted and the build side replicated. */
  def saltedInnerJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    // deterministic scatter: hash the whole probe row's key + a uniform
    // component derived from monotonically increasing id would be
    // nondeterministic across reruns; pmod of a per-row hash is stable
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltBuckets - 1})")))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
