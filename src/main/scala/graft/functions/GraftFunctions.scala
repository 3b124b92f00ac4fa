package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** SQL registration for graft's native expressions and generators, so
  * the library surface is reachable from `spark.sql(...)` as well as
  * the Column API:
  *
  *   SELECT cosine_f32(a.embedding, b.embedding) ...
  *   SELECT doc_id, s.shingle
  *   FROM documents LATERAL VIEW shingle_gen(text, 3, true) s AS shingle
  *   SELECT doc_id, t.pos, t.bh
  *   FROM documents LATERAL VIEW minhash_text_bands(text, 3, 16, 4) t AS pos, bh
  *
  * Deployment-time alternative: `spark.sql.extensions=graft.plans.
  * GraftExtensions` injects the same functions (plus the TopKPerKey
  * planner strategy) into every session without code changes.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case l: Literal => l.value.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, fn: String, pos: Int): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a boolean literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_f32" -> (exprs => CosineF32(exprs(0), exprs(1))),
    "minhash_sig" -> (exprs => MinhashSigExpr(exprs(0),
      intArg(exprs(1), "minhash_sig", 2))),
    "minhash_bands" -> (exprs => MinhashBandsExpr(exprs(0),
      intArg(exprs(1), "minhash_bands", 2),
      intArg(exprs(2), "minhash_bands", 3))),
    "minhash_text_bands" -> (exprs => MinhashTextBandsGenerate(exprs(0),
      intArg(exprs(1), "minhash_text_bands", 2),
      intArg(exprs(2), "minhash_text_bands", 3),
      intArg(exprs(3), "minhash_text_bands", 4))),
    "shingle_gen" -> (exprs => ShingleGenerate(exprs(0),
      intArg(exprs(1), "shingle_gen", 2),
      boolArg(exprs(2), "shingle_gen", 3))),
    "year_in_range" -> (exprs => YearInRangeExpr(exprs(0),
      intArg(exprs(1), "year_in_range", 2),
      intArg(exprs(2), "year_in_range", 3))),
    "char_entropy" -> (exprs => CharEntropyExpr(exprs(0))),
    "unicode_norm_key" -> (exprs => UnicodeNormKeyExpr(exprs(0))),
    "repetition_stats" -> (exprs => RepetitionStatsExpr(exprs(0))),
    "morton" -> (exprs => MortonExpr(exprs(0), exprs(1))),
    "canonical_url" -> (exprs => CanonicalUrlExpr(exprs(0))),
    "registered_domain" -> (exprs => RegisteredDomainExpr(exprs(0))))

  /** Session-local registration (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
