package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables._
import graft.operators.MultimodalOps

/** Multimodal-column queries: binary payload + metadata plumbing over the
  * documents corpus standing in for media assets (MultimodalOps scaladoc —
  * decode kernels are stubbed, the Spark plumbing is real).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata projection over binary assets (content pruned away unless
    // hashed).
    "mm1_asset_meta" -> ((s, d) => {
      MultimodalOps.describe(
        MultimodalOps.toAssets(documents(s, d), "doc_id", "text"))
    }),

    // Frame-sample plan: every-100-bytes offsets, deterministic frame ids.
    "mm2_frame_sample" -> ((s, d) => {
      MultimodalOps.frameSampleOffsets(
        MultimodalOps.toAssets(documents(s, d), "doc_id", "text"), 100)
    })
  )

  val oracles: Map[String, String] = Map(
    "mm1_asset_meta" ->
      """SELECT doc_id AS asset_id,
           (['image','audio','video'])[(doc_id % 3 + 1)::INTEGER] AS kind,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS content_hash
         FROM documents""",
    "mm2_frame_sample" ->
      """SELECT doc_id AS asset_id, octet_length(text::BLOB) AS n_bytes,
           unnest(range(0, octet_length(text::BLOB), 100)) AS frame_off,
           md5(doc_id::VARCHAR || ':' ||
               unnest(range(0, octet_length(text::BLOB), 100))::VARCHAR) AS frame_id
         FROM documents"""
  )
}
