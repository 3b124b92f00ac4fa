package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._
  import BoundedCollect.boundedCollectList

  test("under the cap: exactly collect_list (as a multiset), nulls skipped") {
    val df = Seq((1, Some(10)), (1, Some(11)), (1, None), (2, Some(20)))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(sort_array(boundedCollectList(col("v"), 100)).as("vs"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(out(1) == Seq(10, 11))
    assert(out(2) == Seq(20))
  }

  test("over the cap: buffer stops at cap, elements come from the group") {
    val df = spark.range(1000).select(lit(1).as("k"), col("id"))
      .repartition(8) // force partial buffers + merges
    val out = df.groupBy("k")
      .agg(boundedCollectList(col("id"), 7).as("vs"))
      .as[(Int, Seq[Long])].collect().head._2
    assert(out.size == 7)
    assert(out.forall(v => v >= 0 && v < 1000))
    assert(out.distinct.size == 7)
  }

  test("string elements survive buffer serialization across the exchange") {
    val df = spark.range(100).select((col("id") % 3).as("k"),
      concat(lit("doc-"), col("id")).as("v")).repartition(8)
    val out = df.groupBy("k")
      .agg(boundedCollectList(col("v"), 1000).as("vs"),
        count(lit(1)).as("n"))
      .as[(Long, Seq[String], Long)].collect()
    out.foreach { case (k, vs, n) =>
      assert(vs.size == n)
      assert(vs.forall(_.startsWith("doc-")))
    }
  }

  test("the inverted-index contract: size filter at cap-1 is exact") {
    // groups with true size <= maxDf are complete; bigger ones are
    // truncated to maxDf+1 and hence filterable — the containmentPairs
    // usage (cap = maxDf + 1, filter size <= maxDf)
    val maxDf = 5
    val df = spark.range(300)
      .select((col("id") % 60).as("k"), col("id")) // 60 groups of 5
      .union(spark.range(1000).select(lit(999L).as("k"), col("id")))
      .repartition(16)
    val out = df.groupBy("k")
      .agg(boundedCollectList(col("id"), maxDf + 1).as("ids"))
      .filter(size(col("ids")) <= maxDf)
      .as[(Long, Seq[Long])].collect()
    assert(out.length == 60)
    assert(!out.exists(_._1 == 999L))
    assert(out.forall(_._2.size == 5))
  }
}
