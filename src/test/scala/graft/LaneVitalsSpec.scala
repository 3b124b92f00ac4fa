package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Structural non-vacuousness checks for every fingerprint / near-dup
  * lane, at BOTH oracle-gated scales.
  *
  * Why this suite exists: a near-dup lane can hash-match its oracle
  * while verifying NOTHING — r12 shipped two such lanes in-round (mm13's
  * first fixture put every clip in one over-cap bucket and the lane
  * hash-matched an EMPTY pair universe; mm12's first fixture went
  * quadratic), and r13's first mm14 fixture starved at sf0.1 the same
  * way (an affine luma gradient yields ~w·h distinct fingerprints, so
  * every bucket grows with the corpus and the cap removes everything).
  * Each trap was caught by ad-hoc vigilance; this suite makes the check
  * structural: for each lane the PLANTED pairs must be present, NATURAL
  * (non-planted) collisions must be present, and where the lane caps
  * degenerate buckets the cap must BIND (a non-empty capped-out
  * universe) — at sf0.01 and sf0.1, the two scales the driver gates.
  */
class LaneVitalsSpec extends SparkSpec {

  private val scales = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def run(lane: String, d: String): Array[Row] =
    SparkEntry.queries(lane)(spark, d).collect()

  private def docs(d: String): DataFrame =
    spark.read.parquet(s"$d/documents.parquet")

  /** planted + natural both non-empty; total sane. */
  private def assertVitals(lane: String, d: String, rows: Array[Row],
                           planted: Row => Boolean): Unit = {
    assert(rows.nonEmpty, s"$lane@$d: empty pair universe")
    val p = rows.count(planted)
    val n = rows.length - p
    assert(p > 0, s"$lane@$d: no planted pairs survived (${rows.length} rows)")
    assert(n > 0, s"$lane@$d: no natural collisions (${rows.length} rows)")
  }

  /** The cap must bind: at least one uncapped fingerprint bucket
    * exceeds `cap`, so the capped lane really excised a degenerate
    * universe rather than hash-matching a trivially-uncapped one.
    */
  private def assertCapBinds(lane: String, d: String, fp: DataFrame,
                             fpCol: String, cap: Int): Unit = {
    val over = fp.filter(col(fpCol).isNotNull)
      .groupBy(fpCol).count().filter(col("count") > cap)
      .agg(coalesce(sum("count"), lit(0L))).head.getLong(0)
    assert(over > 0, s"$lane@$d: bucket cap $cap never binds — " +
      "the capped universe equals the uncapped one and the cap is untested")
  }

  // ---- perceptual fingerprint family (image / audio / video) --------
  // pairs plant on gid = id − id % 2: (even, even+1) is the planted
  // byte-different sample-identical pair; anything else is a natural
  // collision the fingerprint found on its own.

  private def plantedGidPair(r: Row): Boolean =
    r.getLong(0) % 2 == 0 && r.getLong(1) == r.getLong(0) + 1

  test("mm12 image aHash pairs: planted + natural + binding cap, both scales") {
    for (d <- scales) {
      assertVitals("mm12_ahash_pairs", d, run("mm12_ahash_pairs", d),
        plantedGidPair)
      assertCapBinds("mm12_ahash_pairs", d,
        MultimodalOps.aHashBits(
          MultimodalOps.synthBmpPairAssets(docs(d), "doc_id")),
        "ahash_bits", cap = 8)
    }
  }

  test("mm13 audio energy pairs: planted + natural + binding cap, both scales") {
    for (d <- scales) {
      assertVitals("mm13_audio_neardup", d, run("mm13_audio_neardup", d),
        plantedGidPair)
      assertCapBinds("mm13_audio_neardup", d,
        MultimodalOps.audioEnergyFingerprint(
          MultimodalOps.synthWavPairAssets(docs(d), "doc_id")),
        "energy_bits", cap = 8)
    }
  }

  test("mm14 video aHash pairs: planted + natural + binding cap, both scales") {
    for (d <- scales) {
      assertVitals("mm14_video_neardup", d, run("mm14_video_neardup", d),
        plantedGidPair)
      assertCapBinds("mm14_video_neardup", d,
        MultimodalOps.videoAHashFingerprint(
          MultimodalOps.synthY4mPairAssets(docs(d), "doc_id"), stride = 2),
        "vhash_bits", cap = 8)
    }
  }

  test("mm16 frame containment: all planted regimes + natural + binding cap, both scales") {
    for (d <- scales) {
      val rows = run("mm16_frame_containment", d)
      assert(rows.nonEmpty, s"mm16@$d: empty pair universe")
      def shape(r: Row) = (r.getLong(0) % 3, r.getLong(1) - r.getLong(0))
      val full = rows.count(shape(_) == ((0L, 2L)))   // tag-swap re-mux
      val trim = rows.count(r => r.getLong(1) - r.getLong(0) == 1L &&
        r.getLong(0) / 3 == r.getLong(1) / 3)         // offset re-cuts
      val natural = rows.count(r => r.getLong(0) / 3 != r.getLong(1) / 3)
      assert(full > 0, s"mm16@$d: no full re-mux pairs")
      assert(trim > 0, s"mm16@$d: no trimmed-overlap pairs — " +
        "the capability the lane exists for")
      assert(natural > 0, s"mm16@$d: no cross-triplet natural collisions")
      val fh = MultimodalOps.videoFrameHashes(
          MultimodalOps.synthY4mTrimAssets(docs(d), "doc_id"))
        .filter(col("fhash").isNotNull)
        .select(col("asset_id"), col("fhash")).distinct()
      assertCapBinds("mm16_frame_containment", d, fh, "fhash", cap = 8)
    }
  }

  test("mm20 cross-modal dedup: every planted twin class + flat-bucket cap, both scales") {
    for (d <- scales) {
      val rows = run("mm20_crossmodal_dedup", d)
      assert(rows.nonEmpty, s"mm20@$d: empty pair universe")
      def cls(r: Row) = (r.getLong(0) % 4, r.getLong(1) - r.getLong(0),
        r.getLong(2))
      // channels can only vote 1 or 2 — anything else is a key leak
      assert(rows.forall(r => r.getLong(2) == 1 || r.getLong(2) == 2),
        s"mm20@$d: vote outside {1, 2}")
      // full twin: both channels agree on (g, g+3)
      assert(rows.exists(cls(_) == ((0L, 3L, 2L))),
        s"mm20@$d: no both-channel full twins")
      // caption-only twin (g, g+1): homoglyph swap, different image
      assert(rows.exists(cls(_) == ((0L, 1L, 1L))),
        s"mm20@$d: no caption-channel twins")
      // image-only twin (g, g+2): pad-stamped pixels, different caption
      assert(rows.exists(cls(_) == ((0L, 2L, 1L))),
        s"mm20@$d: no image-channel twins")
      // FLAT groups: the corpus-wide all-zeros image bucket is capped,
      // so their full-twin pair survives on the caption channel alone
      val flatFull = rows.filter(r => r.getLong(0) % 4 == 0 &&
        r.getLong(1) == r.getLong(0) + 3 && (r.getLong(0) / 4) % 7 == 0)
      assert(flatFull.nonEmpty && flatFull.forall(_.getLong(2) == 1),
        s"mm20@$d: flat groups' image votes escaped the cap")
      // and the cap really binds on the composite key universe
      val assets = MultimodalOps.synthCaptionImageAssets(docs(d), "doc_id")
      assertCapBinds("mm20_crossmodal_dedup", d,
        MultimodalOps.aHashBits(assets.select("asset_id", "content"))
          .select(concat(lit("i:"), col("ahash_bits")).as("k")),
        "k", cap = 8)
    }
  }

  /** mm21/mm22 shared contract: the incremental lane must equal its
    * rebuild lane restricted to batch-touching pairs, with evidence
    * against BOTH index halves (built %5 in 1..3, appended %5=4) so
    * the append path is load-bearing, not vacuously green. */
  private def incrementalIndexVitals(lane: String,
                                     rebuildLane: String): Unit = {
    for (d <- scales) {
      val inc = run(lane, d)
      assert(inc.nonEmpty, s"$lane@$d: empty incremental pair universe")
      // every pair involves >=1 batch (%5=0) asset — nothing leaks
      // from index-only buckets the bloom happened to pass
      assert(inc.forall(r => r.getLong(0) % 5 == 0 || r.getLong(1) % 5 == 0),
        s"$lane@$d: pair without a batch member")
      // append ≡ rebuild: exactly the batch-touching slice
      val full = run(rebuildLane, d)
        .filter(r => r.getLong(0) % 5 == 0 || r.getLong(1) % 5 == 0)
      def key(r: Row) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(inc.map(key).toSet == full.map(key).toSet,
        s"$lane@$d: incremental diverged from the rebuild slice " +
          s"(${inc.size} vs ${full.size})")
      assert(inc.exists(r => Seq(r.getLong(0) % 5, r.getLong(1) % 5)
          .exists(m => m >= 1 && m <= 3)),
        s"$lane@$d: no pair against the BUILT index half")
      assert(inc.exists(r =>
          r.getLong(0) % 5 == 4 || r.getLong(1) % 5 == 4),
        s"$lane@$d: no pair against the APPENDED index half")
    }
  }

  test("mm21 incremental frame index: equals mm16 restricted to batch pairs, cross-split evidence, both scales") {
    incrementalIndexVitals("mm21_frame_index", "mm16_frame_containment")
  }

  test("mm22 incremental segment index: equals mm17 restricted to batch pairs, cross-split evidence, both scales") {
    incrementalIndexVitals("mm22_segment_index", "mm17_audio_containment")
  }

  test("mm23 incremental chunk index: equals mm18 restricted to batch pairs, cross-split evidence, both scales") {
    incrementalIndexVitals("mm23_chunk_index", "mm18_binary_cdc")
  }

  test("st16 streaming containment: cross pairs only, both index halves, equals batch slice, both scales") {
    for (d <- scales) {
      val rows = run("st16_stream_containment", d)
      assert(rows.nonEmpty, s"st16@$d: empty streamed pair universe")
      // the stream-static join can only emit (streamed, corpus) pairs
      assert(rows.forall(r => r.getLong(0) % 5 == 0 && r.getLong(1) % 5 != 0),
        s"st16@$d: pair outside the stream x corpus cross")
      // the appended index half serves streaming probes too
      assert(rows.exists(r => (1L to 3L).contains(r.getLong(1) % 5)),
        s"st16@$d: no pair against the BUILT index half")
      assert(rows.exists(_.getLong(1) % 5 == 4),
        s"st16@$d: no pair against the APPENDED index half")
      // drain ≡ batch: exactly mm16's cross-(%5) slice
      val full = run("mm16_frame_containment", d)
        .flatMap { r =>
          val (x, y, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
          if (x % 5 == 0 && y % 5 != 0) Some((x, y, n))
          else if (y % 5 == 0 && x % 5 != 0) Some((y, x, n))
          else None
        }.toSet
      val got = rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == full,
        s"st16@$d: drained stream diverged from the batch slice " +
          s"(${got.size} vs ${full.size})")
    }
  }

  test("tx50 evasive decontamination: canonical keys excise the disguised salt raw keys miss, both scales") {
    import graft.operators.TextAnalysisOps
    for (d <- scales) {
      val corpus = docs(d)
      val phrase = lit("alpha beta gamma delta epsilon")
      val disguised = translate(phrase, "aeoc",
        "\u0430\u0435\u043e\u0441")
      val train = corpus.filter(col("source") =!= "src0")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" "), disguised))
            .otherwise(col("text")).as("text"))
      val evalPlus = corpus.filter(col("source") === "src0")
        .select(col("doc_id"), col("text"))
        .unionByName(spark.range(1)
          .select(lit(-1L).as("doc_id"), phrase.as("text")))
      def removedBy(canonical: Boolean): Map[Long, Long] =
        TextAnalysisOps.decontaminateSpans(train, evalPlus,
            "doc_id", "text", k = 3, canonicalKeys = canonical)
          .select("doc_id", "n_removed").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val can = removedBy(canonical = true)
      val raw = removedBy(canonical = false)
      assert(can.keySet == raw.keySet, s"tx50@$d: doc sets diverged")
      for ((id, nc) <- can) {
        val nr = raw(id)
        if (id % 3 == 0)
          // the 5 disguised salt words ARE the capability: canonical
          // must excise at least them beyond whatever raw catches
          assert(nc >= nr + 5,
            s"tx50@$d doc $id: canonical removed $nc vs raw $nr — " +
              "the disguised salt escaped")
        else
          // unsalted ASCII docs take the fast path: identical keys
          assert(nc == nr,
            s"tx50@$d doc $id: canonical diverged on a clean doc")
      }
    }
  }

  // ---- SimHash Hamming family --------------------------------------
  // the corpus is salted with exact copies at +10000: every doc must
  // pair with its copy at hamming 0 (recall floor), and hamming 1..3
  // pairs are the natural near-dups the signature found.

  private def simhashVitals(lane: String): Unit = {
    for (d <- scales) {
      val rows = run(lane, d)
      val nDocs = docs(d).count()
      val planted = rows.count(r =>
        r.getLong(1) - r.getLong(0) == 10000L && r.getInt(2) == 0)
      assert(planted == nDocs,
        s"$lane@$d: ${planted} of $nDocs planted exact copies recalled")
      assert(rows.exists(_.getInt(2) >= 1),
        s"$lane@$d: no natural hamming>=1 near-dups")
    }
  }

  test("dd15 simhash pairs: full planted recall + natural near-dups, both scales") {
    simhashVitals("dd15_simhash_pairs")
  }

  test("dd16 wide simhash pairs: full planted recall + natural near-dups, both scales") {
    simhashVitals("dd16_simhash_wide")
  }

  test("mm17 audio containment: all planted regimes + natural + binding cap, both scales") {
    for (d <- scales) {
      val rows = run("mm17_audio_containment", d)
      assert(rows.nonEmpty, s"mm17@$d: empty pair universe")
      val full = rows.count(r => r.getLong(1) - r.getLong(0) == 2L &&
        r.getLong(0) % 3 == 0)
      val trim = rows.count(r => r.getLong(1) - r.getLong(0) == 1L &&
        r.getLong(0) / 3 == r.getLong(1) / 3)
      val natural = rows.count(r => r.getLong(0) / 3 != r.getLong(1) / 3)
      assert(full > 0, s"mm17@$d: no container-noise re-mux pairs")
      assert(trim > 0, s"mm17@$d: no offset-re-cut pairs — " +
        "the capability the lane exists for")
      assert(natural > 0, s"mm17@$d: no cross-triplet collisions")
      val sk = MultimodalOps.audioSegmentKeys(
          MultimodalOps.synthWavTrimAssets(docs(d), "doc_id"))
        .filter(col("seg_key").isNotNull)
        .select(col("asset_id"), md5(col("seg_key")).as("skey")).distinct()
      assertCapBinds("mm17_audio_containment", d, sk, "skey", cap = 8)
    }
  }

  test("mm18 binary CDC: insert/trim/natural regimes + binding cap, both scales") {
    for (d <- scales) {
      val rows = run("mm18_binary_cdc", d)
      assert(rows.nonEmpty, s"mm18@$d: empty pair universe")
      val insert = rows.count(r => r.getLong(1) - r.getLong(0) == 1L &&
        r.getLong(0) % 3 == 0)
      val trim = rows.count(r => r.getLong(1) - r.getLong(0) == 2L &&
        r.getLong(0) % 3 == 0)
      val natural = rows.count(r => r.getLong(0) / 3 != r.getLong(1) / 3)
      assert(insert > 0, s"mm18@$d: no spliced-insertion pairs — " +
        "the insertion-robustness the lane exists for")
      assert(trim > 0, s"mm18@$d: no truncation pairs")
      assert(natural > 0, s"mm18@$d: no cross-triplet collisions")
      val ck = MultimodalOps.cdcChunkKeys(
          MultimodalOps.synthBinaryTrimAssets(docs(d), "doc_id"))
        .filter(col("chunk_key").isNotNull)
        .select(col("asset_id"), col("chunk_key")).distinct()
      assertCapBinds("mm18_binary_cdc", d, ck, "chunk_key", cap = 8)
    }
  }

  test("tx49 normalized near-dup: full homoglyph-twin recall + natural pairs, both scales") {
    for (d <- scales) {
      val rows = run("tx49_norm_neardup", d)
      val nDocs = docs(d).count()
      val planted = rows.count(r => r.getLong(1) - r.getLong(0) == 20000L)
      assert(planted == nDocs,
        s"tx49@$d: $planted of $nDocs homoglyph twins recalled — " +
          "the canonicalizer stopped reducing the salted corpus")
      assert(rows.length > planted, s"tx49@$d: no natural candidates")
    }
  }

  // ---- byte-MinHash candidates (mm7) -------------------------------
  // no salted copies here; the vitals are that candidates exist, that
  // they include byte-DIFFERENT near-dups (not just exact-equal texts —
  // those a content hash would find), and that the band join stayed
  // far from quadratic.

  test("mm7 binary near-dup candidates: non-empty, near (not just exact) dups, sub-quadratic, both scales") {
    for (d <- scales) {
      val rows = run("mm7_binary_neardup", d)
      assert(rows.nonEmpty, s"mm7@$d: empty candidate set")
      val text = docs(d).select(col("doc_id"), md5(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val near = rows.count(r => text(r.getLong(0)) != text(r.getLong(1)))
      assert(near > 0, s"mm7@$d: only exact-equal texts paired")
      val n = text.size.toLong
      assert(rows.length < 20 * n,
        s"mm7@$d: ${rows.length} candidates for $n docs — quadratic blowup")
    }
  }

  // ---- LSH-bucketed cosine pairs (ss3) -----------------------------
  // vitals: pairs exist, none are degenerate self-similar duplicates
  // (the fixture has no identical vectors, so sim < 1 throughout), the
  // threshold really filters (all sims >= 0.2), and the bucket join
  // stayed sub-quadratic.

  test("ss3 LSH bucket pairs: non-empty, thresholded, sub-quadratic, both scales") {
    for (d <- scales) {
      val rows = run("ss3_lsh_bucket", d)
      assert(rows.nonEmpty, s"ss3@$d: empty pair set")
      val sims = rows.map(_.getDouble(2))
      assert(sims.forall(s => s >= 0.2 && s < 0.9999),
        s"ss3@$d: sim out of the expected (0.2, 1) band")
      val n = spark.read.parquet(s"$d/embeddings.parquet").count()
      assert(rows.length < 20 * n,
        s"ss3@$d: ${rows.length} pairs for $n vectors — quadratic blowup")
    }
  }
}
