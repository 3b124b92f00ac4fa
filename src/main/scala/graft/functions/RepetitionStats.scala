package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition statistics for the Gopher-style quality filters:
  * `struct<n_words, n_distinct_words, top_bigram_n, n_bigrams>` from a
  * single tokenization — word count, distinct-word count, and the
  * multiplicity of the document's most frequent bigram.
  *
  * The declarative formulations both lose: explode → two keyed aggs
  * shuffles ~2× corpus bytes twice (the round-2 shape — the most
  * expensive query in the catalog at sf0.1), and the shuffle-free
  * sort + `aggregate` fold still pays an interpreted lambda per
  * element plus an O(L log L) sort and three separate passes for the
  * word stats. This kernel is one JVM pass with a per-doc hash map —
  * memory bounded by the document, inside whole-stage codegen (static
  * call, the [[CharEntropyExpr]] pattern).
  *
  * Tokenization matches `split(text, " ")` exactly (regex split,
  * limit -1: consecutive separators yield empty tokens, trailing
  * empties kept) so the DuckDB `string_split` oracle replays it.
  * Null → null; a doc with < 2 words reports zero bigrams (callers
  * filter on `n_words >= 2`, the no-bigram-exists exclusion).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = RepetitionStats.outType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.stats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.stats($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {

  val outType: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  def stats(s: UTF8String): InternalRow = {
    // limit -1 matches Spark's split(col, " ") (keeps trailing empties)
    val w = s.toString.split(" ", -1)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < w.length) { distinct.add(w(i)); i += 1 }
    var top = 0L
    if (w.length >= 2) {
      val counts = new java.util.HashMap[String, Integer]()
      i = 0
      while (i < w.length - 1) {
        val c = counts.merge(w(i) + " " + w(i + 1), Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
        if (c.longValue > top) top = c.longValue
        i += 1
      }
    }
    val nBigrams = if (w.length >= 2) (w.length - 1).toLong else 0L
    new GenericInternalRow(
      Array[Any](w.length, distinct.size, top, nBigrams))
  }

  /** Column-API form. */
  def repetitionStats(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(c)))
  }
}
