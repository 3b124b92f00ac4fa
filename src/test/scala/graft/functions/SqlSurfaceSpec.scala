package graft.functions

import graft.SparkSpec

/** The SQL face of the native functions/generators: everything the
  * Column API exposes must also work from `spark.sql`, including
  * LATERAL VIEW over the custom generators.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)
  Seq((1L, "the quick brown fox the quick"), (2L, "x"))
    .toDF("doc_id", "text").createOrReplaceTempView("sql_docs")
  Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 0.001f)))
    .toDF("vec_id", "embedding").createOrReplaceTempView("sql_vecs")

  test("cosine_f32 from SQL") {
    val sims = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_f32(a.embedding, b.embedding) AS s
         FROM sql_vecs a JOIN sql_vecs b ON a.vec_id < b.vec_id""")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> math.rint(s * 1000) / 1000 }.toMap
    assert(sims((1L, 2L)) == 0.0)
    assert(sims((1L, 3L)) == 1.0)
  }

  test("shingle_gen as LATERAL VIEW") {
    val rows = spark.sql(
      """SELECT doc_id, s.shingle
         FROM sql_docs LATERAL VIEW shingle_gen(text, 2, true) s AS shingle""")
      .as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "the quick"), (1L, "quick brown"),
      (1L, "brown fox"), (1L, "fox the")))
  }

  test("minhash_text_bands generator matches the Column-API pipeline from SQL") {
    val sqlRows = spark.sql(
      """SELECT doc_id, t.pos, t.bh
         FROM sql_docs LATERAL VIEW minhash_text_bands(text, 3, 16, 4) t AS pos, bh""")
      .as[(Long, Int, String)].collect().toSet
    val api = spark.table("sql_docs")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        MinhashSig.minhashTextBandsGen(
          org.apache.spark.sql.functions.col("text"), 3, 16, 4))
      .as[(Long, Int, String)].collect().toSet
    assert(sqlRows == api && sqlRows.nonEmpty)
  }

  test("minhash_sig and minhash_bands scalar forms from SQL") {
    val r = spark.sql(
      """SELECT minhash_sig(array('a', 'b'), 4) AS sig,
                minhash_bands(array('a', 'b'), 4, 2) AS bands""").head()
    assert(r.getSeq[Long](0).length == 4)
    assert(r.getSeq[String](1).length == 2)
  }

  test("char_entropy from SQL matches hand-computed values and unicode") {
    val r = spark.sql(
      """SELECT char_entropy('aabb') AS e1, char_entropy('aaaa') AS e2,
                char_entropy('') AS e3, char_entropy(CAST(NULL AS STRING)) AS e4,
                char_entropy('ℓℓδδ') AS e5""").head()
    assert(r.getDouble(0) == 1.0) // two symbols, equal mass
    assert(r.getDouble(1) == 0.0) // single symbol
    assert(r.getDouble(2) == 0.0) // empty
    assert(r.isNullAt(3))
    assert(r.getDouble(4) == 1.0) // non-ASCII path, two code points
    // supplementary-plane code points (surrogate pairs in UTF-16) count
    // as single symbols, matching DuckDB's character split
    val astral = spark.sql(
      "SELECT char_entropy('𝄞𝄞') AS a, " +
        "char_entropy('𝄞x') AS b").head()
    assert(astral.getDouble(0) == 0.0)
    assert(astral.getDouble(1) == 1.0)
  }

  test("morton from SQL matches the JVM kernel") {
    val r = spark.sql(
      "SELECT morton(3, 3) AS a, morton(4, 0) AS b, " +
        "morton(CAST(NULL AS INT), 1) AS c").head()
    assert(r.getLong(0) == graft.functions.Morton.interleave(3, 3))
    assert(r.getLong(1) == graft.functions.Morton.interleave(4, 0))
    assert(r.isNullAt(2))
  }

  test("year_in_range predicate from SQL") {
    val kept = spark.sql(
      """SELECT y FROM VALUES ('1850'), ('1850/51'), ('1901'), ('junk'),
         (CAST(NULL AS STRING)) AS t(y)
         WHERE year_in_range(y, 1800, 1900)""")
      .as[String].collect().toSet
    assert(kept == Set("1850", "1850/51"))
  }
}
