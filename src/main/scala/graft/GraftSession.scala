package graft

import org.apache.spark.sql.SparkSession

/** Centralized SparkSession construction for the engine.
  *
  * Local mode (`local[N]`) is one JVM with N executor threads; on a real
  * cluster the same builder settings apply per-session. Shuffle partitions
  * default to the local core count (not Spark's 200) and AQE is enabled so
  * joins/skew re-plan at runtime — the setting that actually matters at
  * 100 TB, where AQE coalesces the post-shuffle partitions the static
  * number gets wrong.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Master override for cross-process validation legs: e.g.
    * SPARK_GRAFT_MASTER='local-cluster[2,2,1024]' runs the same mains
    * against real executor PROCESSES (separate JVMs, real serialization
    * and broadcast boundaries) — the cheapest stand-in for a cluster. */
  def master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  /** Auto-broadcast ceiling, sized to EXECUTOR memory, not data: the
    * threshold compares the SERIALIZED build side, but the executor
    * deserializes it into a LongToUnsafeRowMap at roughly 10-20x the
    * wire size — the round-11 local-cluster leg measured a <64 MB
    * broadcast OOM-killing a 3 GB executor heap in exactly this
    * readLongArray path. 64 MB is right for this engine's local[32]
    * (128 GB heap) and for >=8 GB cluster executors; smaller executors
    * must lower it (SPARK_GRAFT_BROADCAST_MAX, bytes) — Spark's own
    * 10 MB default exists for the small-executor regime. */
  def broadcastMax: String =
    sys.env.getOrElse("SPARK_GRAFT_BROADCAST_MAX", s"${64L * 1024 * 1024}")

  def builder(appName: String): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", broadcastMax)
      .config("spark.sql.session.timeZone", "UTC")
      // driver fixtures store ts as parquet TIMESTAMP(NANOS), which Spark
      // rejects by default; read as long nanos and convert in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native engine functions (cosine_sim, §2.10 D5)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
