package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM under Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    // StreamingJoinHelper WARN-logs an internal-error stack for every
    // non-time </> predicate in a stream-stream join condition (our
    // a_id < b_id pair-dedup in the near-dup self-join) once per side
    // per micro-batch — benign by construction (the time-range
    // predicates still yield the state watermark; see
    // StreamingOps.nearDupPairsStream), and the optimizer pushes a
    // post-join filter back into the condition, so the plan cannot
    // dodge it. Quiet exactly that logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.analysis.StreamingJoinHelper",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
