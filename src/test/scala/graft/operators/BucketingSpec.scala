package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the 100 TB answer to "this join
  * shuffles every run": write both sides bucketed on the join key once,
  * and every subsequent join is exchange-free.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join plans without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Seq("b_orders", "b_customer").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val orders = (1L to 1000L).map(i => (i, i % 100, i * 1.5))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = (0L until 100L).map(i => (i, s"cust$i"))
      .toDF("c_custkey", "c_name")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")
    // merge hint: a broadcast build would trivially avoid the shuffle;
    // the point is that the SORT-MERGE join needs no exchange either,
    // because both sides are pre-bucketed on the key
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_customer")
  }
}
