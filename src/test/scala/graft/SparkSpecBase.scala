package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (sbt forks a single
  * test JVM; SparkSession.getOrCreate dedups across suites). */
object SharedSpark {
  lazy val spark: SparkSession = {
    // local[4,2]: 4 threads, max 2 task attempts — plain local[N] pins
    // task retries to 1, which would make RetryResilienceSpec's injected
    // first-attempt failure fatal instead of retried. Every other spec
    // is unaffected (a healthy task never reaches attempt 1).
    val s = GraftSession.builder("graft-test")
      .master("local[4,2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
}
