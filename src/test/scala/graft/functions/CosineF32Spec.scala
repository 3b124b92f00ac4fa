package graft.functions

import graft.SparkSpec
import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

class CosineF32Spec extends SparkSpec {
  import spark.implicits._

  lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native expression is bit-identical to the HOF kernel on real vectors") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(
        SimilarityOps.cosineF32(col("qv"), col("embedding")).as("hof"),
        CosineF32.cosineF32Native(col("qv"), col("embedding")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diffs == 0)
  }

  test("interpreted eval (nullSafeEval) matches codegen path") {
    val vecs = Seq(
      (Array(1f, 2f, 3f), Array(3f, 2f, 1f)),
      (Array(0.1f, -0.5f), Array(0.7f, 0.2f)))
      .toDF("a", "b")
    val viaCol = vecs
      .select(CosineF32.cosineF32Native(col("a"), col("b"))).as[Double]
      .collect().toSeq
    val manual = Seq(
      (Array(1f, 2f, 3f), Array(3f, 2f, 1f)),
      (Array(0.1f, -0.5f), Array(0.7f, 0.2f))).map { case (a, b) =>
      var dot = 0f; var na = 0f; var nb = 0f
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      (dot / (math.sqrt(na.toDouble).toFloat *
        math.sqrt(nb.toDouble).toFloat)).toDouble
    }
    assert(viaCol == manual)
  }

  test("SQL registration: cosine_f32 callable from spark.sql") {
    CosineF32.register(spark)
    emb.limit(10).createOrReplaceTempView("emb10")
    val n = spark.sql(
      """SELECT cosine_f32(a.embedding, b.embedding) AS s
         FROM emb10 a JOIN emb10 b ON a.vec_id < b.vec_id""")
      .filter(col("s").between(-1.0000001, 1.0000001)).count()
    assert(n == 45)
  }

  test("null inputs yield null") {
    val r = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(CosineF32.cosineF32Native(col("a"), col("b")))
      .collect().head
    assert(r.isNullAt(0))
  }
}
