package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = {
    val rnd = new scala.util.Random(7)
    (1 to 5000).map { i =>
      (i.toLong, s"g${rnd.nextInt(40)}", rnd.nextInt(100000).toDouble)
    }.toDF("id", "grp", "score").repartition(8).cache()
  }

  test("TopKPerKey matches window row_number exactly") {
    val native = TopK.perKey(df, Seq("grp"),
      Seq(col("score").desc, col("id").asc), 3)
      .select("grp", "rk", "id", "score")
      .as[(String, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("grp", "rk", "id", "score")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(native == viaWindow)
    assert(native.size == 40 * 3)
  }

  test("plan shape: local prune below the exchange, final above") {
    val plan = TopK.perKey(df, Seq("grp"), Seq(col("score").desc), 2)
      .queryExecution.executedPlan.toString
    // the exchange sits between the two — LocalTopK runs map-side
    val idxFinal = plan.indexOf("TopKPerKey ")
    val idxEx = plan.indexOf("Exchange hashpartitioning")
    val idxLocal = plan.indexOf("LocalTopK ")
    assert(idxFinal >= 0 && idxEx > idxFinal && idxLocal > idxEx, plan)
  }

  test("k larger than any group returns whole groups ranked") {
    val small = Seq((1L, "a", 5.0), (2L, "a", 7.0), (3L, "b", 1.0))
      .toDF("id", "grp", "score")
    val out = TopK.perKey(small, Seq("grp"),
      Seq(col("score").desc, col("id").asc), 10)
      .select("grp", "rk", "id").as[(String, Int, Long)]
      .collect().toSet
    assert(out == Set(("a", 1, 2L), ("a", 2, 1L), ("b", 1, 3L)))
  }

  test("RowNumberToTopK rewrites the SQL row_number idiom to the heap operator") {
    df.createOrReplaceTempView("t_rewrite")
    val sql = """SELECT grp, rk, id, score FROM (
                   SELECT *, row_number() OVER
                     (PARTITION BY grp ORDER BY score DESC, id ASC) AS rk
                   FROM t_rewrite)
                 WHERE rk <= 3 AND id % 2 = 0"""
    val plain = spark.sql(sql)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(!plain.isEmpty)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RowNumberToTopK
    try {
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey "), plan)
      assert(!plan.contains("Window "), plan)
      // identical results, including the preserved non-rank conjunct
      assert(rewritten.as[(String, Int, Long, Double)].collect().toSet
        == plain)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("RowNumberToTopK leaves non-rewritable windows alone") {
    df.createOrReplaceTempView("t_norewrite")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RowNumberToTopK
    try {
      // rank() is not row_number; an unordered row_number is skipped too
      val p1 = spark.sql("""SELECT * FROM (
          SELECT *, rank() OVER
            (PARTITION BY grp ORDER BY score DESC) AS rk
          FROM t_norewrite) WHERE rk <= 3""")
        .queryExecution.executedPlan.toString
      assert(p1.contains("Window ") && !p1.contains("TopKPerKey "), p1)
      // lower bound only — no top-k semantics, must not fire
      val p2 = spark.sql("""SELECT * FROM (
          SELECT *, row_number() OVER
            (PARTITION BY grp ORDER BY score DESC) AS rk
          FROM t_norewrite) WHERE rk >= 3""")
        .queryExecution.executedPlan.toString
      assert(p2.contains("Window ") && !p2.contains("TopKPerKey "), p2)
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }

  test("multi-column keys and ascending order work") {
    val out = TopK.perKey(df.withColumn("g2", col("grp").substr(2, 1)),
      Seq("grp", "g2"), Seq(col("score").asc, col("id").asc), 1)
    assert(out.count() == 40)
    assert(out.filter(col("rk") =!= 1).count() == 0)
  }
}
