package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the 1:1 synth contract the mm21/mm22/mm23/mm28 bloom sizing
  * leans on (advisor r18): those lanes size `expectedKeys` by counting
  * the RAW documents table with the batch predicate instead of
  * re-running the synth+decode pipeline — valid only while every
  * `synth*TrimAssets` op emits EXACTLY one row per input row with
  * `asset_id = cast(doc_id as long)`. If a synth ever drops/dups rows
  * or remaps ids, the bloom FPR and the metadata-pruning branch would
  * silently diverge from the actual batch (a perf regression with no
  * functional signal — buckets still derive from the real batch). This
  * spec turns that silent divergence into a red test.
  */
class SynthCardinalitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def check(name: String,
                    synth: org.apache.spark.sql.DataFrame =>
                      org.apache.spark.sql.DataFrame): Unit = {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = synth(docs)
    val nDocs = docs.count()
    assert(out.count() == nDocs,
      s"$name must emit exactly one asset per document")
    // asset_id = cast(doc_id as long), bijectively: an anti-join each
    // way is empty iff the id sets match (and 1:1 follows from the
    // count equality above)
    val ids = docs.select(col("doc_id").cast("long").as("asset_id"))
    assert(out.select("asset_id").join(ids, Seq("asset_id"), "left_anti")
      .isEmpty, s"$name emitted an asset_id outside the doc_id set")
    assert(ids.join(out.select("asset_id"), Seq("asset_id"), "left_anti")
      .isEmpty, s"$name lost a doc_id")
  }

  test("synthY4mTrimAssets is 1:1 with asset_id = doc_id (mm21/mm28)") {
    check("synthY4mTrimAssets",
      MultimodalOps.synthY4mTrimAssets(_, "doc_id"))
  }

  test("synthWavTrimAssets is 1:1 with asset_id = doc_id (mm22)") {
    check("synthWavTrimAssets",
      MultimodalOps.synthWavTrimAssets(_, "doc_id"))
  }

  test("synthBinaryTrimAssets is 1:1 with asset_id = doc_id (mm23)") {
    check("synthBinaryTrimAssets",
      MultimodalOps.synthBinaryTrimAssets(_, "doc_id"))
  }
}
