package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables._
import graft.operators.{MultimodalOps, PngCodec}

/** Multimodal-column queries over the documents corpus standing in for
  * media assets. Since r12 all three modalities decode through REAL
  * pure-JVM kernels (BMP / PCM-WAV / Y4M — MultimodalOps scaladoc):
  * the synth fixtures emit genuine container bytes, Spark genuinely
  * parses them, and the oracles replay every feature analytically from
  * the generative parameters without touching bytes. The md5 stub
  * survives only in the metadata-plan lanes (mm1/mm2/mm4/mm6) and as
  * the batching spec twin.
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
    }),

    // Decode → similarity composition on the REAL kernel (promoted from
    // the md5 stub in r12): every asset is a genuine 24-bit BMP
    // (synthBmpAssets), decodeImageFeatures really parses the container
    // (header, BGR, row padding, bottom-up rows), and the query asks
    // for the 10 decoded assets nearest asset 1 by EXACT-INTEGER L2
    // over the (sum_r, sum_g, sum_b) channel signature — so both the
    // decode evidence AND the similarity arithmetic are bit-replayable
    // (no float rounding anywhere; asset 1, not 0, because id % 13 = 0
    // payloads are truncated and decode to in-band nulls).
    "mm3_decode_topk" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val feats = MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(documents(s, d), "doc_id"))
        .filter(col("decoded"))
        .select(col("asset_id"), col("sum_r"), col("sum_g"), col("sum_b"))
      val q = feats.filter(col("asset_id") === 1)
        .select(col("sum_r").as("_qr"), col("sum_g").as("_qg"),
          col("sum_b").as("_qb"))
      val d2 = (col("sum_r") - col("_qr")) * (col("sum_r") - col("_qr")) +
        (col("sum_g") - col("_qg")) * (col("sum_g") - col("_qg")) +
        (col("sum_b") - col("_qb")) * (col("sum_b") - col("_qb"))
      feats.crossJoin(broadcast(q))
        .filter(col("asset_id") =!= 1)
        .withColumn("d2", d2)
        .orderBy(col("d2").asc, col("asset_id").asc)
        .limit(10)
        .select("asset_id", "d2")
    }),

    // Decode → PQ-encode composite on the REAL kernel (promoted from
    // the md5 stub in r12): genuinely decoded per-channel sums and dims
    // become an 8-dim integer-valued float32 embedding, then
    // product-quantized (2 subspaces × 2-cell codebooks, one training
    // round) — the multimodal-ingest-to-ANN-index pipeline end-to-end
    // under the exact oracle, with real bytes parsed at the front.
    // Codes emitted as scalar columns c0/c1 (not an array — the
    // driver's checker can't hash array cells; q24 precedent).
    "mm5_decode_pq" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val feats = MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(documents(s, d), "doc_id"))
        .filter(col("decoded"))
        .select(col("asset_id"), array(
          col("sum_r").cast("float"), col("sum_g").cast("float"),
          col("sum_b").cast("float"), col("img_w").cast("float"),
          col("img_h").cast("float"),
          (col("img_w") * col("img_h")).cast("float"),
          (col("sum_r") - col("sum_g")).cast("float"),
          (col("sum_g") - col("sum_b")).cast("float")).as("embedding"))
      graft.operators.SimilarityOps.productQuantize(feats, m = 2,
        subDim = 4, k = 2, iters = 1, idCol = "asset_id")
        .select(col("asset_id"),
          element_at(col("pq_code"), 1).as("c0"),
          element_at(col("pq_code"), 2).as("c1"))
    }),

    // Byte-range chunk manifest at 256-byte chunks: the parallel-decode
    // work list (offset/length per chunk, tail carries the remainder).
    "mm4_byte_chunks" -> ((s, d) => {
      MultimodalOps.byteChunks(
        MultimodalOps.toAssets(documents(s, d), "doc_id", "text"), 256L)
    }),

    // Resize work plan at 512px long side: aspect-preserving integer
    // target dims + decoded-RGB byte estimate, metadata-only (stub
    // header dims, md5-derived — the real pipeline probes the
    // container header instead).
    "mm6_resize_plan" -> ((s, d) => {
      MultimodalOps.resizePlan(
        MultimodalOps.withStubDims(
          MultimodalOps.toAssets(documents(s, d), "doc_id", "text")), 512)
    }),

    // Byte-level near-dup candidates over the binary payloads — no
    // decode, no text assumption: strided 16-byte grams → MinHash →
    // band self-join (dd2's pipeline re-based onto byte ranges; the
    // corpus' duplicate groups share most byte windows and collide).
    "mm7_binary_neardup" -> ((s, d) =>
      MultimodalOps.binaryNearDupPairs(
        MultimodalOps.toAssets(documents(s, d), "doc_id", "text"))),

    // REAL container decode under the oracle: synthesize one genuine
    // 24-bit BMP per doc (parametric pixels, every 13th payload
    // truncated), decode it back with the hand-rolled codec — header
    // parse, BGR, 4-byte row padding, bottom-up rows — and emit
    // exact-integer channel sums. The oracle never parses bytes: it
    // computes the same sums analytically from the generative
    // parameters, so a single padding/row-order/channel-order bug in
    // the decoder shifts a sum and breaks the hash.
    "mm8_decode_real" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("img_w"), col("img_h"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("decoded"))
    }),

    // REAL audio decode under the oracle — mm8's contract on the second
    // modality: one genuine mono 16-bit PCM WAV per doc (parametric
    // samples, every 11th payload truncated), decoded back through the
    // hand-rolled RIFF chunk walk, exact-integer amplitude features
    // out. The oracle never parses bytes — it computes the same stats
    // analytically from the generative sample formula.
    "mm9_decode_audio" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.decodeAudioFeatures(
        MultimodalOps.synthWavAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("n_samples"), col("sample_rate"),
          col("sum_abs"), col("max_abs"), col("decoded"))
    }),

    // REAL video frame sampling under the oracle — the third modality:
    // one genuine Y4M clip per doc (C444 or C420 by id, parametric pixels, every 9th
    // payload torn mid-frame), frames sampled at stride 2 through the
    // actual container walk with in-place per-plane sums — mm2's
    // frame-sample plan executed on real bytes. The oracle replays the
    // generative pixel formulas analytically per (id, frame, pixel).
    "mm10_decode_video" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.sampleVideoFrames(
        MultimodalOps.synthY4mAssets(documents(s, d), "doc_id"), stride = 2)
        .select(col("asset_id"), col("frame_idx"), col("vid_w"),
          col("vid_h"), col("n_frames"), col("sum_y"), col("sum_u"),
          col("sum_v"), col("decoded"))
    }),

    // Cross-modality curation gate — the composition the real kernels
    // exist for: per asset, decode image + audio + video payloads and
    // apply exact-integer quality gates (brightness floor on the
    // decoded channel sums, no audio clipping + minimum duration,
    // minimum frame count), then the conjunctive keep verdict. Every
    // gate also fails closed on an undecodable payload (the in-band
    // decoded=false rows), so torn uploads are curated out, not
    // crashed on. All arithmetic integer; every gate genuinely splits
    // the corpus at both scales.
    "mm11_modality_gate" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = documents(s, d)
      val img = MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(docs, "doc_id"))
        .select(col("asset_id"),
          (col("decoded") && (col("sum_r") + col("sum_g") + col("sum_b"))
            >= lit(3) * col("img_w") * col("img_h") * 96).as("img_ok"))
      val aud = MultimodalOps.decodeAudioFeatures(
        MultimodalOps.synthWavAssets(docs, "doc_id"))
        .select(col("asset_id"),
          (col("decoded") && col("max_abs") <= 32700 &&
            col("n_samples") >= 60).as("aud_ok"))
      val vid = MultimodalOps.sampleVideoFrames(
        MultimodalOps.synthY4mAssets(docs, "doc_id"), stride = 2)
        .groupBy("asset_id")
        .agg(max(col("decoded")).as("_vdec"), max(col("n_frames")).as("_nf"))
        .select(col("asset_id"),
          (col("_vdec") && col("_nf") >= 4).as("vid_ok"))
      img.join(aud, Seq("asset_id")).join(vid, Seq("asset_id"))
        .withColumn("keep",
          col("img_ok") && col("aud_ok") && col("vid_ok"))
        .select("asset_id", "img_ok", "aud_ok", "vid_ok", "keep")
    }),

    // Perceptual near-dup pairs over DECODED pixels (aHash): the
    // fixture plants pixel-identical pairs whose BYTES differ (junk
    // stamped in the BMP row padding — content_hash dedup structurally
    // misses them), the operator decodes and fingerprints the 8×8
    // block-mean bit pattern with exact cross-multiplied comparisons,
    // and pairs form on an equi join over the fingerprint — never
    // all-pairs — under the dd12 df-cap discipline: a fingerprint
    // bucket larger than maxBucket is a DEGENERATE pattern (flat /
    // low-entropy images all hash alike — production reality for blank
    // pages and test cards), not a duplicate cluster, and uncapped it
    // makes the pair join quadratic in bucket size (measured: 7.9k
    // pairs at sf0.01 ballooning to 806k at sf0.1 pre-cap). The cap
    // BINDS on this corpus, so the oracle replays the capped universe,
    // not the trivial one.
    "mm12_ahash_pairs" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val fp = MultimodalOps.aHashBits(
        MultimodalOps.synthBmpPairAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("ahash_bits"))
      MultimodalOps.cappedFingerprintPairs(fp, "asset_id", "ahash_bits",
        cap = 8)
    }),

    // Audio container-noise near-dup (mm13) — mm12's discipline on the
    // second modality: pairs share decoded SAMPLES while the odd
    // member's WAV carries a spliced junk LIST chunk (byte-different,
    // sample-identical — the RIFF walk really skips it), fingerprints
    // are exact-integer energy contours, pairs form on an equi join
    // under the same binding bucket cap (the sawtooth corpus is
    // low-entropy by construction, so uncapped buckets would go
    // quadratic exactly like mm12's measured 806k).
    "mm13_audio_neardup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val fp = MultimodalOps.audioEnergyFingerprint(
        MultimodalOps.synthWavPairAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("energy_bits"))
      MultimodalOps.cappedFingerprintPairs(fp, "asset_id", "energy_bits",
        cap = 8)
    }),

    // Video perceptual near-dup (mm14) — the third modality completes
    // the fingerprint family (mm12 image, mm13 audio): pairs share
    // decoded SAMPLES while the odd member's Y4M header carries the
    // other equal-layout chroma-siting tag (C420jpeg → C420mpeg2 —
    // byte-different, the header even changes length), the fingerprint
    // is each sampled frame's 64-bit Y-plane aHash concatenated in
    // frame order, and pairs form on an equi join under the binding
    // bucket cap: the fixture's flat clips (blank-video reality) all
    // land in one all-zeros bucket that grows with the corpus, so the
    // cap binds at every scale.
    "mm14_video_neardup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val fp = MultimodalOps.videoAHashFingerprint(
        MultimodalOps.synthY4mPairAssets(documents(s, d), "doc_id"),
        stride = 2)
        .select(col("asset_id"), col("vhash_bits"))
      MultimodalOps.cappedFingerprintPairs(fp, "asset_id", "vhash_bits",
        cap = 8)
    }),

    // Real WIRE-FORMAT decode (mm15): mm8's contract on the containers
    // corpora actually ship — even ids arrive as JDK-written PNG, odd
    // ids as hand-rolled BMP, and ONE magic-sniffing kernel
    // (PngCodec.decodeAuto) decodes both to the same top-down RGB,
    // feature sums hash-gated against the same analytic oracle (PNG is
    // lossless, so the pixels are bit-identical across containers;
    // JPEG rides the same seam but is never hash-gated — lossy).
    // Every 13th payload is torn after the signature: the miss path
    // fires in-band on both container branches.
    "mm15_decode_wire" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthWireImageAssets(documents(s, d), "doc_id"),
        kernel = PngCodec.decodeAuto)
        .select(col("asset_id"), col("img_w"), col("img_h"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("decoded"))
    }),

    // FROM-SCRATCH PNG pixel decode under the oracle (mm35): the same
    // analytic-sum contract as mm8/mm15, but the kernel is PngNative —
    // chunk walk with CRC verification, Inflater'd IDAT, scanline
    // unfilter, sample extraction — no image library in the path. Two
    // corrupt classes fire in-band: every 13th payload torn after the
    // signature (truncated stream), every 11th with a flipped byte in
    // the IDAT tail (CRC mismatch — the integrity check a meta-only
    // parse never runs). The JDK writer picks per-row filters
    // adaptively, so the unfilter paths are exercised by real encoder
    // output, and one wrong predictor byte shifts a channel sum and
    // breaks the hash.
    "mm35_png_native" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthPngCorruptAssets(documents(s, d), "doc_id"),
        kernel = graft.operators.PngNative.decode)
        .select(col("asset_id"), col("img_w"), col("img_h"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("decoded"))
    }),

    // Frame-level video CONTAINMENT (mm16): the trimmed-re-cut shape
    // mm14's whole-clip fingerprint structurally misses — an offset
    // clip has a different frame set, so the concatenated bits differ
    // even though individual frames match. Per-frame hashes become
    // rows, dedupe within clip, cap degenerate hash buckets (flat
    // frames — the blank-leader reality — all hash alike and the
    // bucket grows with the corpus), then an equi self-join on the
    // frame hash votes per clip pair: shared >= 2 distinct frame
    // hashes is containment evidence. Never all-pairs; fan-out
    // bounded by the cap.
    "mm16_frame_containment" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val fh = MultimodalOps.videoFrameHashes(
        MultimodalOps.synthY4mTrimAssets(documents(s, d), "doc_id"))
        .filter(col("fhash").isNotNull)
        .select(col("asset_id"), col("fhash")).distinct()
      MultimodalOps.cappedContainmentVotes(fh, "asset_id", "fhash",
        cap = 8, minShared = 2)
    }),

    // Segment-level audio CONTAINMENT (mm17) — mm16's vote on the
    // audio axis: per-segment exact-energy keys as rows, distinct
    // within clip, the silence bucket (flat clips — every segment of
    // every flat clip keys identically) capped, equi self-join,
    // shared >= 2 vote. Catches offset re-cuts whose whole-clip
    // energy contour differs while two aligned segments match, and
    // container-noise twins the chunk walk flattens.
    "mm17_audio_containment" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val sk = MultimodalOps.audioSegmentKeys(
        MultimodalOps.synthWavTrimAssets(documents(s, d), "doc_id"))
        .filter(col("seg_key").isNotNull)
        .select(col("asset_id"), md5(col("seg_key")).as("skey"))
        .distinct()
      MultimodalOps.cappedContainmentVotes(sk, "asset_id", "skey",
        cap = 8, minShared = 2)
    }),

    // Content-defined-chunk binary dedup (mm18): the insertion-robust
    // half of binary near-dup that fixed-stride grams (mm7) document
    // as their trade — an 11-byte splice shifts every downstream gram
    // but CDC boundaries resync within a window, so chunks outside
    // the splice keep their content-addressed keys. Distinct chunk
    // keys per asset, degenerate bucket (all-zero payloads chunk into
    // identical minimum pieces) capped, equi self-join, shared >= 2
    // vote — the mm16/mm17 discipline on raw bytes.
    "mm18_binary_cdc" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ck = MultimodalOps.cdcChunkKeys(
        MultimodalOps.synthBinaryTrimAssets(documents(s, d), "doc_id"))
        .filter(col("chunk_key").isNotNull)
        .select(col("asset_id"), col("chunk_key")).distinct()
      MultimodalOps.cappedContainmentVotes(ck, "asset_id", "chunk_key",
        cap = 8, minShared = 2)
    }),

    // JPEG metadata profile (mm19): real corpora are JPEG-first and
    // mm15 deliberately keeps JPEG pixels ungated (lossy, IDCT
    // rounding is decoder-dependent) — but the FRAME HEADER is fixed
    // by the marker syntax the encoder wrote, deterministically. The
    // marker walk (PngCodec.jpegHeader) reads dims / component count /
    // sample precision / progressive flag without touching entropy
    // data; the oracle replays every field analytically from the
    // fixture's generative parameters (the mm8 contract — pinned
    // encoder quality, id-derived dims, every 13th payload torn to 4
    // bytes so the miss path fires in-band on real wire bytes).
    "mm19_jpeg_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.jpegHeaderProfile(
        MultimodalOps.synthJpegAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("jpg_w"), col("jpg_h"),
          col("n_components"), col("bit_depth"), col("progressive"),
          col("parsed"))
    }),

    // TIFF IFD metadata profile (mm24): EXIF is a TIFF tag directory
    // embedded in JPEG APP1, so the IFD walk is the load-bearing half
    // of EXIF extraction — and unlike JPEG pixels the ENTIRE directory
    // is deterministic wire bytes. Both byte orders live in the
    // fixture (even ids II, odd ids MM); the oracle replays every
    // field analytically from the generative parameters (the
    // mm8/mm19 contract), torn and bad-magic ids miss in-band.
    "mm24_tiff_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.tiffMetaProfile(
        MultimodalOps.synthTiffAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("tif_w"), col("tif_h"),
          col("orientation"), col("bits"), col("little_endian"),
          col("date_time"), col("parsed"))
    }),

    // MP3 frame-header walk (mm29): the dominant wire audio format —
    // WAV (mm9) is the raw interchange shape, crawled audio is MP3/AAC.
    // Every header field is deterministic encoder output (sync,
    // bitrate/sample-rate table indices, frame-length hop), so the
    // whole profile is oracle-replayable from the generative rule,
    // including the VBR bitrate envelope (min/max over the per-frame
    // index sequence) and the integer duration. Torn (id%13) and
    // reserved-sample-rate (id%17) assets miss in-band; the spectral
    // payload is never decoded (the mm15 rule).
    // Merge-on-read DELETE on the frame-hash posting index (mm28):
    // the mm21 probe against a fixture whose %7 = 1 banked assets are
    // tombstoned (takedown / right-to-erasure). The mask is a
    // broadcast anti-join applied BEFORE the df cap, so the cap counts
    // the post-delete posting set — the oracle replays a fresh rebuild
    // WITHOUT the deleted assets (delete ≡ rebuild, the ss22
    // discipline on the media axis). Vacuum (physical rewrite of only
    // the affected bucket directories) is probe-equivalence-gated in
    // ExtOpsSpec.
    "mm28_index_delete" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = graft.operators.FrameDeleteIndexFixture.dir(s, d)
      val batch = MultimodalOps.synthY4mTrimAssets(documents(s, d), "doc_id")
        .filter(col("asset_id") % 5 === 0)
      // 1:1 synth: the batch cardinality comes from the raw table, so
      // the synth+decode pipeline runs once (mm22/mm23 rationale;
      // value identical, bloom and pruning branch unchanged)
      MultimodalOps.frameContainmentIncremental(batch, dir, expectedClips =
        documents(s, d).filter(col("doc_id") % 5 === 0).count(),
        immutable = true)
    }),

    // ID3v2.3 tag extraction (mm31): the metadata layer crawled MP3s
    // actually carry — title/artist/album text frames walked from the
    // real tag bytes (frame headers, sizes, encoding byte, padding
    // stop), never the audio stream. Tagless (id%13) and
    // frame-overrun (id%17) assets miss in-band; the oracle replays
    // the generative strings analytically.
    "mm31_id3_tags" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.mp3TagProfile(
        MultimodalOps.synthTaggedMp3Assets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("title"), col("artist"),
          col("album"), col("n_text_frames"), col("parsed"))
    }),

    // WARC container walk (mm32): the wire format of web crawls — the
    // single most common source a 100-TB pretraining ingest reads.
    // Each doc becomes one synthetic WARC (warcinfo + request +
    // response whose payload IS the doc text + metadata on id%3=0);
    // the walk censuses records by type, sums payload octets, and
    // digests the response payload — the oracle replays the census
    // arithmetically and the digest as md5(text), so the byte-walk is
    // content-gated end to end. Torn terminator (id%13) and alien
    // version line (id%17) miss in-band. O(records) header hops per
    // file; embarrassingly parallel at any scale (the tar-scan shape).
    "mm32_warc_walk" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.warcProfile(
        MultimodalOps.synthWarcAssets(documents(s, d), "doc_id", "text"))
        .select(col("asset_id"), col("n_records"), col("n_warcinfo"),
          col("n_request"), col("n_response"), col("n_metadata"),
          col("payload_bytes"), col("response_md5"), col("parsed"))
    }),

    // Charset sniff + transcode (mm34): the wire-text normalization
    // every downstream text op assumes — the same doc text shipped in
    // five encodings by id residue (UTF-8±BOM, UTF-16 both endians,
    // latin-1 with a planted non-UTF-8 byte forcing the fallback),
    // sniffed by deterministic byte rules (BOMs, full RFC 3629
    // validation walk) and decoded; torn UTF-16 (id%13) misses
    // in-band. Oracle: the charset label is residue arithmetic and
    // every decode is byte-replayable on the ASCII gated corpus
    // (md5 of the UTF-8 re-encoding).
    "mm34_charset" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.charsetProfile(
        MultimodalOps.synthCharsetAssets(documents(s, d), "doc_id",
          "text"))
        .select(col("asset_id"), col("charset"), col("n_chars"),
          col("text_md5"), col("parsed"))
    }),

    // WARC → HTML-extract composition (mm33): the full ingest slice a
    // crawl pipeline actually runs — container walk (mm32's codec)
    // hands the response payloads to the tx51 boilerplate strip. The
    // payloads carry tx51's exact HTML template around the doc text,
    // so the oracle is tx51's replay restricted to parseable files
    // (corrupt %13/%17 WARCs contribute NO content rows — their miss
    // is mm32's `parsed` ledger, not silent nulls here).
    "mm33_warc_html" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      graft.operators.TextAnalysisOps.htmlExtract(
        MultimodalOps.warcResponseTexts(
          MultimodalOps.synthWarcHtmlAssets(
            documents(s, d), "doc_id", "text")),
        "asset_id", "payload")
    }),

    "mm29_mp3_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.mp3Profile(
        MultimodalOps.synthMp3Assets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("n_frames"), col("sample_rate"),
          col("min_br"), col("max_br"), col("channel_mode"),
          col("duration_ms"), col("has_id3"), col("has_crc"),
          col("parsed"))
    }),

    // ADTS (AAC transport) header walk (mm30): the other half of wire
    // audio. Same discipline as mm29; duration counts 1024 PCM samples
    // per raw data block. Torn (id%11) and nonzero-layer (id%19)
    // assets miss in-band.
    "mm30_adts_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.adtsProfile(
        MultimodalOps.synthAdtsAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("n_frames"), col("sample_rate"),
          col("aac_profile"), col("channels"), col("duration_ms"),
          col("has_crc"), col("parsed"))
    }),

    // GIF animation-structure profile (mm25): the block walk reads
    // canvas/palette/frame-count/total-delay/loop off the wire without
    // ever touching LZW data — O(blocks) per asset. The writer's
    // degenerate-valid LZW is independently decoded by javax.imageio
    // in GifCodecSpec, so these are real wire bytes, and the oracle
    // replays every field analytically from the generative parameters
    // (per-frame delays unrolled — frames ≤ 4). Torn (%13) and
    // signature-stomped (%17) ids miss in-band; every 3rd id has no
    // NETSCAPE extension, so loop_count is null INSIDE a successful
    // parse.
    "mm25_gif_struct" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.gifStructProfile(
        MultimodalOps.synthGifAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("gif_w"), col("gif_h"),
          col("gct_colors"), col("n_frames"), col("total_delay_cs"),
          col("loop_count"), col("parsed"))
    }),

    // WebVTT cue-statistics profile (mm26): the timed-text modality —
    // video corpora ship caption sidecars, and curation filters on cue
    // density / coverage / OVERLAP (auto-generated captions overlap,
    // human ones rarely do) long before any audio model runs. Strict
    // parse: a torn sidecar misses whole, in-band. The oracle replays
    // every statistic analytically from the generative parameters
    // (cues ≤ 5, unrolled).
    "mm26_vtt_cues" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      MultimodalOps.vttCueProfile(
        MultimodalOps.synthVttAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("n_cues"), col("total_cue_ms"),
          col("n_overlaps"), col("n_lines"), col("parsed"))
    }),

    // Cross-modal caption-coverage gate (mm27): join the VIDEO decode
    // profile (real Y4M kernel; fixture clips are 1 fps so duration_ms
    // = n_frames · 1000) against the CAPTION profile (mm26) per asset
    // and keep assets whose captioned time covers ≥ 1800 permille of
    // the runtime — the caption-completeness gate an AV-training
    // pipeline runs before pairing clips with transcripts. Exact
    // integer arithmetic throughout (the keep comparison is
    // cross-multiplied, the permille a floor division); EITHER side
    // torn (video %9, vtt %13/%17) fails closed to keep = false with
    // the nulls in-band. Both verdicts fire: 1-cue assets under-cover
    // 3-second clips, multi-cue assets over-cover.
    "mm27_caption_coverage" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      // stride 8 > the max frame count (7): exactly one row per asset
      val vids = MultimodalOps.sampleVideoFrames(
        MultimodalOps.synthY4mAssets(documents(s, d), "doc_id"),
        stride = 8)
        .select(col("asset_id"), col("n_frames"), col("decoded"))
      val caps = MultimodalOps.vttCueProfile(
        MultimodalOps.synthVttAssets(documents(s, d), "doc_id"))
        .select(col("asset_id"), col("total_cue_ms"), col("parsed"))
      val dur = col("n_frames").cast("long") * 1000L
      val cap1000 = col("total_cue_ms") * 1000L
      vids.join(caps, Seq("asset_id"))
        .select(col("asset_id"),
          when(col("decoded"), dur).as("duration_ms"),
          col("total_cue_ms").as("captioned_ms"),
          when(col("decoded") && col("parsed"),
            ((cap1000 - pmod(cap1000, dur)) / dur).cast("long"))
            .as("coverage_permille"),
          (col("decoded") && col("parsed") && cap1000 >= dur * 1800L)
            .as("keep"))
    }),

    // Incremental frame-hash containment against the PERSISTED index
    // (mm21): mm16 rebuilds the whole corpus' fingerprints every run —
    // production banks them once (FrameIndexFixture: build on %5 in
    // 1..3, APPEND %5=4) and each ingest decodes only its own batch
    // (%5=0), bloom-reduces the index scan by the batch's fingerprint
    // set, and votes over the merged postings. For any hash a batch
    // asset carries the bloom passes the entire index bucket, so caps
    // and vote counts equal the full rebuild's — append ≡ rebuild,
    // hash-gated by the full-corpus oracle restricted to batch pairs.
    "mm21_frame_index" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = graft.operators.FrameIndexFixture.dir(s, d)
      val batch = MultimodalOps.synthY4mTrimAssets(documents(s, d), "doc_id")
        .filter(col("asset_id") % 5 === 0)
      // 1:1 synth: the batch cardinality comes from the raw table, so
      // the synth+decode pipeline runs once (mm22/mm23 rationale;
      // value identical, bloom and pruning branch unchanged)
      MultimodalOps.frameContainmentIncremental(batch, dir, expectedClips =
        documents(s, d).filter(col("doc_id") % 5 === 0).count(),
        immutable = true)
    }),

    // Incremental segment-key containment (mm22): mm21's append ≡
    // rebuild discipline on the AUDIO axis, through the GENERIC
    // posting-index seam (postingIndexBuild/Append/
    // postingContainmentIncremental) — one implementation, two
    // modalities. Batch = %5 = 0 clips, decoded alone; index = built
    // %5 in 1..3, appended %5 = 4 (SegmentIndexFixture); oracle =
    // mm17's full-corpus replay restricted to batch-touching pairs.
    "mm22_segment_index" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = graft.operators.SegmentIndexFixture.dir(s, d)
      val batchAssets = MultimodalOps.synthWavTrimAssets(
          documents(s, d), "doc_id")
        .filter(col("asset_id") % 5 === 0)
      // expectedKeys sizes the bloom + the metadata-pruning branch; the
      // synth is 1:1 per input row (asset_id = doc_id), so this count
      // EQUALS batchAssets.count() — computed from the raw documents
      // table instead, which skips a second full synth+decode pass
      // (the old eager count re-ran the expensive pipeline just to
      // size a filter; value identical, so branch and bloom unchanged)
      MultimodalOps.postingContainmentIncremental(
        MultimodalOps.distinctSegmentKeys(batchAssets), dir,
        "asset_id", "skey",
        expectedKeys =
          documents(s, d).filter(col("doc_id") % 5 === 0).count() * 8L,
        immutable = true)
    }),

    // Incremental CDC-chunk containment (mm23): the third modality on
    // the generic posting-index seam — content-addressed chunk keys of
    // the %5 = 0 binary batch against the built(1..3)+appended(4)
    // index; oracle = mm18's recursive chunker replay restricted to
    // batch-touching pairs. One implementation, three gated
    // modalities (video frames, audio segments, binary chunks).
    "mm23_chunk_index" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val dir = graft.operators.ChunkIndexFixture.dir(s, d)
      val batchAssets = MultimodalOps.synthBinaryTrimAssets(
          documents(s, d), "doc_id")
        .filter(col("asset_id") % 5 === 0)
      // same identical-value count relocation as mm22: the synth is 1:1
      // per input row, so counting the raw table skips a second full
      // synth+decode pass with bit-identical bloom sizing and branch
      MultimodalOps.postingContainmentIncremental(
        MultimodalOps.distinctChunkKeys(batchAssets), dir,
        "asset_id", "chunk_key",
        expectedKeys =
          documents(s, d).filter(col("doc_id") % 5 === 0).count() * 32L,
        immutable = true)
    }),

    // Cross-modal composite dedup (mm20): CLIP-style (caption, image)
    // pairs where each modality dedups through its own canonical
    // channel — md5(unicode_norm_key(caption)) for text (homoglyph
    // twins collapse), aHash bits for pixels (padding-noise re-encodes
    // collapse) — and the channels VOTE per asset pair (the mm16 shape
    // across modalities): shared = 2 means both modalities agree (the
    // full near-dup), 1 means a single channel caught what the other
    // missed. Tagged keys ride ONE capped posting build, so the flat
    // degenerate image bucket is excised map-side while the caption
    // channel keeps pairing those same assets.
    "mm20_crossmodal_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val assets = MultimodalOps.synthCaptionImageAssets(
        documents(s, d), "doc_id")
      val ckeys = assets.select(col("asset_id"),
        concat(lit("c:"), md5(graft.functions.UnicodeNorm
          .unicodeNormKey(col("caption")))).as("k"))
      val ikeys = MultimodalOps.aHashBits(
          assets.select("asset_id", "content"))
        .filter(col("ahash_bits").isNotNull)
        .select(col("asset_id"),
          concat(lit("i:"), col("ahash_bits")).as("k"))
      MultimodalOps.cappedContainmentVotes(
        ckeys.unionByName(ikeys), "asset_id", "k",
        cap = 8, minShared = 1)
    })
  )

  /** The mm12 analytic aHash CTE chain over the PAIR fixture
    * ([[MultimodalOps.synthBmpPairAssets]]): every fingerprint replayed
    * from the generative channel formulas over gid = id − id % 2 —
    * shared by mm12's capped pair join and st15's streaming-dedup
    * oracle. Emits `bits(id, ahash_bits)`. */
  private[queries] val ahashBitsCte: String =
    """pars AS (
           SELECT doc_id AS id, (doc_id - doc_id % 2) AS gid,
             (4 + (doc_id - doc_id % 2) % 5)::INT AS w,
             (3 + (doc_id - doc_id % 2) % 4)::INT AS h
           FROM documents),
         pxx AS (SELECT id, gid, w, h, unnest(range(w)) AS x FROM pars),
         pxy AS (SELECT id, gid, w, h, x, unnest(range(h)) AS y FROM pxx),
         lum AS (SELECT id, w, h,
             ((y * 8 // h) * 8 + (x * 8 // w)) AS b,
             ((gid*7 + 3*x + 5*y) % 256) + ((gid*11 + x + 2*y) % 256)
               + ((gid*13 + 2*x + y) % 256) AS l
           FROM pxy),
         blk AS (SELECT id, b, sum(l)::BIGINT AS bs, count(*)::BIGINT AS bn
                 FROM lum GROUP BY 1, 2),
         tot AS (SELECT id, sum(l)::BIGINT AS ts,
                        (max(w)::BIGINT * max(h)) AS n
                 FROM lum GROUP BY 1),
         grid AS (SELECT id, unnest(range(64)) AS b FROM pars),
         bits AS (
           SELECT grid.id,
             string_agg(CASE WHEN coalesce(bs, 0) * n > ts * coalesce(bn, 0)
                             THEN '1' ELSE '0' END, '' ORDER BY grid.b)
               AS ahash_bits
           FROM grid
           LEFT JOIN blk ON grid.id = blk.id AND grid.b = blk.b
           JOIN tot ON grid.id = tot.id
           GROUP BY grid.id)"""

  /** The mm8 analytic-decode CTE chain: per-doc dims and per-channel
    * sums computed from the generative pixel formulas WITHOUT parsing
    * bytes — the cross-engine half of the real-decode contract, shared
    * by mm3/mm5/mm8. Emits `sums(id, w, h, sr, sg, sb)`. */
  private[queries] val sumsCte: String =
    """dims AS (
         SELECT doc_id AS id, (4 + doc_id % 5) AS w, (3 + doc_id % 4) AS h
         FROM documents),
       pxx AS (SELECT id, w, h, unnest(range(w)) AS x FROM dims),
       pxy AS (SELECT id, w, h, x, unnest(range(h)) AS y FROM pxx),
       sums AS (SELECT id, w, h,
           sum((id*7 + 3*x + 5*y) % 256)::BIGINT AS sr,
           sum((id*11 + x + 2*y) % 256)::BIGINT AS sg,
           sum((id*13 + 2*x + y) % 256)::BIGINT AS sb
         FROM pxy GROUP BY 1, 2, 3)"""

  /** The mm16 analytic frame-hash CTE chain over the TRIM fixture
    * ([[MultimodalOps.synthY4mTrimAssets]]): per-frame hashes replayed
    * over GLOBAL time t (member offsets shift the sampled range, so
    * trims share exactly the overlapping frames), distinct within
    * clip, the binding per-hash bucket cap applied — ends with
    * `capped(id, fhash)`. Shared by mm16's full vote join and mm21's
    * batch-restricted incremental replay. */
  private[queries] val frameCappedCte: String =
    """pars AS (
  SELECT doc_id AS id, (doc_id - doc_id % 3) AS bs, doc_id % 3 AS m
  FROM documents),
dims AS (
  SELECT id, bs, (bs // 3) AS q, ((bs // 3) % 7 = 0) AS flat,
    (4 + 2 * ((bs // 3) % 3))::INT AS w,
    (2 + 2 * ((bs // 3) % 2))::INT AS h,
    CASE WHEN m = 1 THEN 2 ELSE 0 END AS f0
  FROM pars),
frm AS (SELECT id, bs, q, flat, w, h, f0 + unnest(range(4)) AS t
        FROM dims),
pxx AS (SELECT id, bs, q, flat, w, h, t, unnest(range(w)) AS x FROM frm),
pxy AS (SELECT id, bs, q, flat, w, h, t, x, unnest(range(h)) AS y FROM pxx),
lum AS (SELECT id, w, h, t,
    ((y * 8 // h) * 8 + (x * 8 // w)) AS bk,
    CASE WHEN flat THEN (q * 31) % 251
         ELSE (bs*9973 + t*101 + (2*(q % 97) + 37)*(y*w + x)) % 256
    END AS l
  FROM pxy),
blk AS (SELECT id, t, bk, sum(l)::BIGINT AS s, count(*)::BIGINT AS n
        FROM lum GROUP BY 1, 2, 3),
tot AS (SELECT id, t, sum(l)::BIGINT AS ts,
               (max(w)::BIGINT * max(h)) AS np
        FROM lum GROUP BY 1, 2),
grid AS (SELECT id, t, unnest(range(64)) AS bk FROM frm),
bits AS (
  SELECT grid.id, grid.t,
    string_agg(CASE WHEN coalesce(s, 0) * np > ts * coalesce(n, 0)
                    THEN '1' ELSE '0' END, '' ORDER BY grid.bk) AS fhash
  FROM grid
  LEFT JOIN blk ON grid.id = blk.id AND grid.t = blk.t
               AND grid.bk = blk.bk
  JOIN tot ON grid.id = tot.id AND grid.t = tot.t
  GROUP BY grid.id, grid.t),
fh AS (SELECT DISTINCT id, fhash FROM bits),
capped AS (
  SELECT id, fhash FROM fh
  QUALIFY count(*) OVER (PARTITION BY fhash) <= 8)"""

  /** The mm17 analytic segment-key CTE chain over the audio TRIM
    * fixture ([[MultimodalOps.synthWavTrimAssets]]): per-segment exact
    * energies over GLOBAL windows, '|'-joined into the canonical
    * segment key, md5-keyed, distinct within clip, the binding bucket
    * cap applied — ends with `capped(id, skey)`. Shared by mm17's full
    * vote join and mm22's batch-restricted incremental replay. */
  private[queries] val segmentCappedCte: String =
    """pars AS (
  SELECT doc_id AS id, (doc_id - doc_id % 3) // 3 AS q, doc_id % 3 AS m
  FROM documents),
kq AS (
  SELECT id, m,
    CASE WHEN ((q // 2) % 5 = 1) THEN q - q % 2 ELSE q END AS qk
  FROM pars),
dims AS (
  SELECT id, m, qk, (qk % 7 = 0) AS flat,
    CASE WHEN m = 1 THEN 8 ELSE 0 END AS offw
  FROM kq),
win AS (SELECT id, qk, flat, offw, unnest(range(24)) AS lw FROM dims),
smp AS (SELECT id, qk, flat, offw, lw, unnest(range(8)) AS j FROM win),
en AS (SELECT id, lw,
         sum(CASE WHEN flat THEN 0
              ELSE ((qk*9973 + ((offw + lw)*8 + j)*5741) % 65536 - 32768)
                 * ((qk*9973 + ((offw + lw)*8 + j)*5741) % 65536 - 32768)
             END)::BIGINT AS e
       FROM smp GROUP BY 1, 2),
seg AS (SELECT id, lw // 8 AS si,
          string_agg(e::VARCHAR, '|' ORDER BY lw) AS seg_key
        FROM en GROUP BY 1, 2),
sk AS (SELECT DISTINCT id, md5(seg_key) AS skey FROM seg),
capped AS (SELECT id, skey FROM sk
           QUALIFY count(*) OVER (PARTITION BY skey) <= 8)"""

  /** The mm18 recursive CDC-chunker replay over the binary TRIM
    * fixture ([[MultimodalOps.synthBinaryTrimAssets]]): the WHOLE
    * FastCDC walk in SQL (Rabin hash B=257, M=2^31-1,
    * BW=257^8 mod M), chunk keys as md5 over upper-case hex, distinct
    * within asset, the binding bucket cap applied — ends with
    * `capped(id, ckey)`. Shared by mm18's full vote join, mm23's
    * batch-restricted incremental replay, and dq11's whole-artifact
    * audit. Byte-model precedence is pinned by the FIXTURE: m=1
    * splices its 11 bytes into FLAT payloads too (an insertion is an
    * insertion, even into a blank file — content-defined chunking
    * must localize it), so the splice CASE precedes the flat zero;
    * the original flat-first ordering was a 24-posting divergence
    * mm18's pair-level gate masked and dq11's posting-level audit
    * caught (r14). */
  private[queries] val cdcCappedCte: String =
    """meta AS (
  SELECT doc_id AS id, doc_id % 3 AS m,
    CASE WHEN ((((doc_id - doc_id % 3) // 3) // 2) % 5 = 1)
         THEN ((doc_id - doc_id % 3) // 3) - ((doc_id - doc_id % 3) // 3) % 2
         ELSE ((doc_id - doc_id % 3) // 3) END AS qk
  FROM documents),
md AS (
  SELECT id, m, qk, (qk % 7 = 0) AS flat,
    CASE WHEN m = 1 THEN 779 WHEN m = 2 THEN 512 ELSE 768 END AS len
  FROM meta),
walk(id, i, start, h, cs, ce) AS (
  SELECT id, 0, 0, 0::BIGINT, NULL::INT, NULL::INT FROM md
  UNION ALL
  SELECT id, i + 1,
    CASE WHEN cut THEN i + 1 ELSE start END,
    CASE WHEN cut THEN 0::BIGINT ELSE h2 END,
    CASE WHEN cut THEN start END,
    CASE WHEN cut THEN i + 1 END
  FROM (
    SELECT t.*,
      ((t.i - t.start + 1 >= 32 AND (t.h2 & 63) = 0)
       OR t.i - t.start + 1 >= 128) AS cut
    FROM (
      SELECT w.id, w.i, w.start,
        ((((w.h * 257 + lat.bi)
           - CASE WHEN w.i - w.start >= 8
                  THEN (lat.bo * 1213495441) % 2147483647
                  ELSE 0 END) % 2147483647)
         + 2147483647) % 2147483647 AS h2
      FROM walk w JOIN md d USING (id),
      LATERAL (SELECT
        CASE WHEN d.m = 1 AND w.i >= 320 AND w.i < 331
             THEN ((d.qk*7 + (w.i - 320)) % 65537) % 256
             WHEN d.flat THEN 0
             WHEN d.m = 1 AND w.i >= 331
             THEN ((d.qk*9973 + (w.i - 11)*5741) % 65537) % 256
             ELSE ((d.qk*9973 + w.i*5741) % 65537) % 256
        END AS bi,
        CASE WHEN d.m = 1 AND (w.i - 8) >= 320 AND (w.i - 8) < 331
             THEN ((d.qk*7 + (w.i - 8 - 320)) % 65537) % 256
             WHEN d.flat THEN 0
             WHEN d.m = 1 AND (w.i - 8) >= 331
             THEN ((d.qk*9973 + (w.i - 8 - 11)*5741) % 65537) % 256
             ELSE ((d.qk*9973 + (w.i - 8)*5741) % 65537) % 256
        END AS bo) lat
      WHERE w.i < d.len) t) s),
bounds AS (
  SELECT id, cs AS s, ce AS e FROM walk WHERE cs IS NOT NULL
  UNION ALL
  SELECT w.id, w.start, w.i FROM walk w JOIN md d USING (id)
  WHERE w.i = d.len AND w.start < d.len),
pos AS (SELECT id, s, e, s + unnest(range(e - s)) AS p FROM bounds),
ck AS (
  SELECT pos.id, s,
    md5(string_agg(lpad(to_hex(
      CASE WHEN d.m = 1 AND p >= 320 AND p < 331
           THEN ((d.qk*7 + (p - 320)) % 65537) % 256
           WHEN d.flat THEN 0
           WHEN d.m = 1 AND p >= 331
           THEN ((d.qk*9973 + (p - 11)*5741) % 65537) % 256
           ELSE ((d.qk*9973 + p*5741) % 65537) % 256
      END), 2, '0'), '' ORDER BY p)) AS ckey
  FROM pos JOIN md d USING (id)
  GROUP BY pos.id, s),
sk AS (SELECT DISTINCT id, ckey FROM ck),
capped AS (SELECT id, ckey FROM sk
           QUALIFY count(*) OVER (PARTITION BY ckey) <= 8)"""

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
         FROM documents""",
    "mm3_decode_topk" ->
      s"""WITH $sumsCte,
          f AS (SELECT id AS asset_id, sr, sg, sb FROM sums
                WHERE id % 13 <> 0),
          q AS (SELECT sr AS qr, sg AS qg, sb AS qb FROM f
                WHERE asset_id = 1)
          SELECT asset_id,
            (sr - qr) * (sr - qr) + (sg - qg) * (sg - qg)
              + (sb - qb) * (sb - qb) AS d2
          FROM f, q WHERE asset_id <> 1
          ORDER BY d2 ASC, asset_id ASC LIMIT 10""",
    "mm5_decode_pq" ->
      s"""WITH $sumsCte,
          f AS (
            SELECT id AS asset_id,
              [sr::FLOAT, sg::FLOAT, sb::FLOAT, w::FLOAT, h::FLOAT,
               (w * h)::FLOAT, (sr - sg)::FLOAT, (sg - sb)::FLOAT] AS fv
            FROM sums WHERE id % 13 <> 0),
          s0 AS (SELECT asset_id, fv[1:4] AS v FROM f),
          s1 AS (SELECT asset_id, fv[5:8] AS v FROM f),
          a00 AS (SELECT asset_id, v,
                    (('0x' || substr(md5(asset_id::VARCHAR), 1, 8))
                       ::UBIGINT % 2)::INT AS cluster
                  FROM s0),
          u01 AS (SELECT cluster, unnest(v) AS x,
                    generate_subscripts(v, 1) AS pos FROM a00),
          m01 AS (SELECT cluster, pos,
                    (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                  FROM u01 GROUP BY cluster, pos),
          c01 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                  FROM m01 GROUP BY cluster),
          a01 AS (SELECT asset_id, cc AS c0 FROM (
                    SELECT a00.asset_id, c01.cc,
                      row_number() OVER (PARTITION BY a00.asset_id
                        ORDER BY list_cosine_similarity(a00.v, c01.cv)
                                   DESC, c01.cc ASC) AS rn
                    FROM a00 CROSS JOIN c01) WHERE rn = 1),
          a10 AS (SELECT asset_id, v,
                    (('0x' || substr(md5(asset_id::VARCHAR), 1, 8))
                       ::UBIGINT % 2)::INT AS cluster
                  FROM s1),
          u11 AS (SELECT cluster, unnest(v) AS x,
                    generate_subscripts(v, 1) AS pos FROM a10),
          m11 AS (SELECT cluster, pos,
                    (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                  FROM u11 GROUP BY cluster, pos),
          c11 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                  FROM m11 GROUP BY cluster),
          a11 AS (SELECT asset_id, cc AS c1 FROM (
                    SELECT a10.asset_id, c11.cc,
                      row_number() OVER (PARTITION BY a10.asset_id
                        ORDER BY list_cosine_similarity(a10.v, c11.cv)
                                   DESC, c11.cc ASC) AS rn
                    FROM a10 CROSS JOIN c11) WHERE rn = 1)
          SELECT a01.asset_id, c0, c1
          FROM a01 JOIN a11 USING (asset_id)""",
    // `//` replays Spark's floor(double-div) exactly: operands are
    // non-negative and ≪ 2^53, so integer floor-div == floored IEEE
    // division.
    "mm6_resize_plan" ->
      """WITH d AS (
           SELECT doc_id AS asset_id,
             (['image','audio','video'])[(doc_id % 3 + 1)::INTEGER] AS kind,
             (256 + ('0x' || substr(md5(doc_id::VARCHAR || ':w'), 1, 4))
                ::UBIGINT % 3584)::INT AS src_w,
             (256 + ('0x' || substr(md5(doc_id::VARCHAR || ':h'), 1, 4))
                ::UBIGINT % 2160)::INT AS src_h
           FROM documents),
         p AS (
           SELECT asset_id, kind, src_w, src_h,
             CASE WHEN greatest(src_w, src_h) <= 512 THEN src_w
                  ELSE ((src_w::BIGINT * 512) //
                        greatest(src_w, src_h))::INT END AS dst_w,
             CASE WHEN greatest(src_w, src_h) <= 512 THEN src_h
                  ELSE ((src_h::BIGINT * 512) //
                        greatest(src_w, src_h))::INT END AS dst_h,
             greatest(src_w, src_h) > 512 AS downscaled
           FROM d)
         SELECT asset_id, kind, src_w, src_h, dst_w, dst_h, downscaled,
           dst_w::BIGINT * dst_h * 3 AS est_bytes
         FROM p""",
    // `//` (not `/`): DuckDB float-divides with `/` and the ::INTEGER cast
    // would round where Spark's cast truncates; offsets are non-negative
    // so trunc == floor on both sides.
    "mm4_byte_chunks" ->
      """SELECT asset_id, (off // 256)::INTEGER AS chunk_id,
           off AS "offset", least(256::BIGINT, n_bytes - off) AS length
         FROM (SELECT doc_id AS asset_id, octet_length(text::BLOB) AS n_bytes,
                      unnest(range(0, octet_length(text::BLOB), 256)) AS off
               FROM documents) t""",
    // content bytes == text bytes on the ASCII corpus, so the byte
    // grams replay as string substrings; hash chain is dd2's md5-affine
    // family verbatim
    "mm7_binary_neardup" ->
      """WITH g AS (
           SELECT doc_id AS asset_id,
             unnest(list_distinct([
               (('0x' || substr(md5(substr(text, p, 16)), 1, 15))::UBIGINT
                 % 2147483647)::BIGINT
               for p in range(1, greatest(len(text) - 15, 1) + 1, 4)])) AS x
           FROM documents WHERE len(text) > 0),
         sig AS (SELECT asset_id, i,
                   min(((i*1000003 + 12345) * x + i*999983 + 54321) % 2147483647) AS mh
                 FROM g CROSS JOIN (SELECT unnest(range(0,16)) AS i) perms
                 GROUP BY asset_id, i),
         bands AS (SELECT asset_id, i // 4 AS band,
                     md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bh
                   FROM sig GROUP BY asset_id, i // 4)
         SELECT DISTINCT l.asset_id AS a, r.asset_id AS b
         FROM bands l JOIN bands r
           ON l.band = r.band AND l.bh = r.bh AND l.asset_id < r.asset_id""",

    // the decode evidence computed WITHOUT parsing bytes: per-channel
    // sums from the generative pixel formulas (two sequential unnests
    // cross x × y), truncated payloads (id % 13 = 0) decode to nulls
    "mm8_decode_real" ->
      s"""WITH $sumsCte
         SELECT id AS asset_id,
           CASE WHEN id % 13 = 0 THEN NULL ELSE w::INT END AS img_w,
           CASE WHEN id % 13 = 0 THEN NULL ELSE h::INT END AS img_h,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sr END AS sum_r,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sg END AS sum_g,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sb END AS sum_b,
           (id % 13 <> 0) AS decoded
         FROM sums""",

    // the audio decode evidence computed WITHOUT parsing bytes: the
    // generative sample formula unnested per (id, k), truncated
    // payloads (id % 11 = 0) decode to nulls
    "mm9_decode_audio" ->
      """WITH pars AS (
           SELECT doc_id AS id, (50 + doc_id % 32) AS n,
                  (8000 + (doc_id % 3) * 4000)::INT AS rate
           FROM documents),
         smp AS (SELECT id, n, rate, unnest(range(n)) AS k FROM pars),
         st AS (SELECT id, n, rate,
                  sum(abs((id*31 + k*17) % 65536 - 32768))::BIGINT AS sa,
                  max(abs((id*31 + k*17) % 65536 - 32768))::BIGINT AS ma
                FROM smp GROUP BY 1, 2, 3)
         SELECT id AS asset_id,
           CASE WHEN id % 11 = 0 THEN NULL ELSE n::BIGINT END AS n_samples,
           CASE WHEN id % 11 = 0 THEN NULL ELSE rate END AS sample_rate,
           CASE WHEN id % 11 = 0 THEN NULL ELSE sa END AS sum_abs,
           CASE WHEN id % 11 = 0 THEN NULL ELSE ma END AS max_abs,
           (id % 11 <> 0) AS decoded
         FROM st""",

    // the video frame-sample evidence computed WITHOUT parsing bytes:
    // generative pixel formulas unnested per (id, frame, pixel), only
    // stride-2 frames materialized; chroma sums run over the FULL grid
    // for the C444 ids (id % 3 = 1) and the QUARTER grid for the 420
    // ids, mirroring the encoder's per-mode plane geometry; torn
    // payloads (id % 9 = 0) emit one in-band undecoded row each
    "mm10_decode_video" ->
      """WITH pars AS (
           SELECT doc_id AS id, (4 + doc_id % 3)::INT AS w,
                  (2 + doc_id % 3)::INT AS h, (3 + doc_id % 5) AS nf,
                  CASE WHEN doc_id % 3 = 1
                       THEN (4 + doc_id % 3) * (2 + doc_id % 3)
                       ELSE ((4 + doc_id % 3) // 2) * ((2 + doc_id % 3) // 2)
                  END AS cp
           FROM documents),
         fr AS (SELECT id, w, h, nf, cp, unnest(range(nf)) AS f FROM pars
                WHERE id % 9 <> 0),
         sf AS (SELECT * FROM fr WHERE f % 2 = 0),
         px AS (SELECT id, w, h, nf, f, unnest(range(w * h)) AS p FROM sf),
         sy AS (SELECT id, w, h, nf, f,
                  sum((id*3 + f*7 + p) % 256)::BIGINT AS sy
                FROM px GROUP BY 1, 2, 3, 4, 5),
         cx AS (SELECT id, f, unnest(range(cp)) AS q FROM sf),
         sc AS (SELECT id, f,
                  sum((id*5 + f*11 + q) % 256)::BIGINT AS su,
                  sum((id*7 + f*13 + q) % 256)::BIGINT AS sv
                FROM cx GROUP BY 1, 2),
         st AS (SELECT sy.id, w, h, nf, sy.f, sy.sy, sc.su, sc.sv
                FROM sy JOIN sc ON sy.id = sc.id AND sy.f = sc.f)
         SELECT id AS asset_id, f AS frame_idx, w AS vid_w, h AS vid_h,
                nf::INT AS n_frames, sy AS sum_y, su AS sum_u,
                sv AS sum_v, true AS decoded
         FROM st
         UNION ALL
         SELECT id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, false
         FROM pars WHERE id % 9 = 0""",

    // all three modality gates replayed analytically: image brightness
    // from the shared sums CTE, audio peak/duration from the sample
    // formula, video frame count from its dim formula; each gate fails
    // closed on the planted truncation ids
    "mm11_modality_gate" ->
      s"""WITH $sumsCte,
          aud AS (
            SELECT id, n,
              max(abs((id*31 + k*17) % 65536 - 32768))::BIGINT AS ma
            FROM (SELECT doc_id AS id, (50 + doc_id % 32) AS n,
                    unnest(range(50 + doc_id % 32)) AS k
                  FROM documents) t
            GROUP BY 1, 2)
          SELECT sums.id AS asset_id,
            (sums.id % 13 <> 0 AND
             (sr + sg + sb) >= 3 * w * h * 96) AS img_ok,
            (aud.id % 11 <> 0 AND ma <= 32700 AND n >= 60) AS aud_ok,
            (sums.id % 9 <> 0 AND (3 + sums.id % 5) >= 4) AS vid_ok,
            ((sums.id % 13 <> 0 AND (sr + sg + sb) >= 3 * w * h * 96)
             AND (aud.id % 11 <> 0 AND ma <= 32700 AND n >= 60)
             AND (sums.id % 9 <> 0 AND (3 + sums.id % 5) >= 4)) AS keep
          FROM sums JOIN aud ON sums.id = aud.id""",

    // every aHash fingerprint replayed analytically: luminance from the
    // generative channel formulas over gid = id - id%2 (pixel-duplicate
    // pairs), pooled onto the 8x8 block grid with the same floor-div
    // mapping and the same cross-multiplied mean comparison; empty
    // blocks (w < 8) contribute '0' on both sides via the LEFT JOIN
    "mm12_ahash_pairs" ->
      s"""WITH $ahashBitsCte,
         capped AS (
           SELECT id, ahash_bits FROM bits
           QUALIFY count(*) OVER (PARTITION BY ahash_bits) <= 8)
         SELECT l.id AS a, r.id AS b, l.ahash_bits
         FROM capped l JOIN capped r
           ON l.ahash_bits = r.ahash_bits AND l.id < r.id""",

    // the energy-contour fingerprints replayed analytically from the
    // generative sample formula over gid (sample-identical pairs):
    // complete windows of 8, energy = sum of squares, bit w set iff
    // e_w > e_{w-1}; same binding bucket cap
    "mm13_audio_neardup" ->
      """WITH pars AS (
           SELECT doc_id AS id, (doc_id - doc_id % 2) AS gid,
                  (400 + (doc_id - doc_id % 2) % 32) AS n
           FROM documents),
         smp AS (SELECT id, gid, n, unnest(range(n)) AS k FROM pars),
         en AS (SELECT id, k // 8 AS w,
                  sum(((gid*31 + k*9973) % 65536 - 32768)
                      * ((gid*31 + k*9973) % 65536 - 32768))::BIGINT AS e
                FROM smp WHERE k // 8 < n // 8
                GROUP BY 1, 2),
         bits AS (
           SELECT id, string_agg(
               CASE WHEN e > prev THEN '1' ELSE '0' END, '' ORDER BY w)
             AS energy_bits
           FROM (SELECT id, w, e,
                   lag(e) OVER (PARTITION BY id ORDER BY w) AS prev
                 FROM en)
           WHERE prev IS NOT NULL
           GROUP BY id),
         capped AS (
           SELECT id, energy_bits FROM bits
           QUALIFY count(*) OVER (PARTITION BY energy_bits) <= 8)
         SELECT l.id AS a, r.id AS b, l.energy_bits
         FROM capped l JOIN capped r
           ON l.energy_bits = r.energy_bits AND l.id < r.id""",

    // every per-frame Y-plane aHash replayed analytically from the
    // generative luma formula over the clip key k (coarse blocks of 4
    // gids collapse to one k; flat clips paint constant luma), pooled
    // onto the 8x8 block grid per SAMPLED frame (stride 2) with the
    // same floor-div mapping and cross-multiplied mean comparison;
    // frame strings concatenate in (f, b) order; same binding cap
    "mm14_video_neardup" ->
      """WITH pars AS (
           SELECT doc_id AS id,
             CASE WHEN (((doc_id - doc_id % 2) // 8) % 3 = 1)
                  THEN (doc_id - doc_id % 2) - (doc_id - doc_id % 2) % 8
                  ELSE (doc_id - doc_id % 2) END AS k
           FROM documents),
         dims AS (
           SELECT id, k, (k % 7 = 0) AS flat,
             (4 + 2 * (k % 3))::INT AS w,
             (2 + 2 * (k % 2))::INT AS h,
             CASE WHEN k % 7 = 0 THEN 2 ELSE (2 + k % 3) END::INT AS nf
           FROM pars),
         frm AS (
           SELECT * FROM (
             SELECT id, k, flat, w, h, unnest(range(nf)) AS f FROM dims) t
           WHERE f % 2 = 0),
         pxx AS (SELECT id, k, flat, w, h, f, unnest(range(w)) AS x
                 FROM frm),
         pxy AS (SELECT id, k, flat, w, h, f, x, unnest(range(h)) AS y
                 FROM pxx),
         lum AS (SELECT id, w, h, f,
             ((y * 8 // h) * 8 + (x * 8 // w)) AS b,
             CASE WHEN flat THEN k % 251
                  ELSE (k*9973 + f*101 + (2*(k % 97) + 37)*(y*w + x)) % 256
             END AS l
           FROM pxy),
         blk AS (SELECT id, f, b, sum(l)::BIGINT AS bs,
                        count(*)::BIGINT AS bn
                 FROM lum GROUP BY 1, 2, 3),
         tot AS (SELECT id, f, sum(l)::BIGINT AS ts,
                        (max(w)::BIGINT * max(h)) AS n
                 FROM lum GROUP BY 1, 2),
         grid AS (SELECT id, f, unnest(range(64)) AS b FROM frm),
         bits AS (
           SELECT grid.id,
             string_agg(
                 CASE WHEN coalesce(bs, 0) * n > ts * coalesce(bn, 0)
                      THEN '1' ELSE '0' END, '' ORDER BY grid.f, grid.b)
               AS vhash_bits
           FROM grid
           LEFT JOIN blk ON grid.id = blk.id AND grid.f = blk.f
                        AND grid.b = blk.b
           JOIN tot ON grid.id = tot.id AND grid.f = tot.f
           GROUP BY grid.id),
         capped AS (
           SELECT id, vhash_bits FROM bits
           QUALIFY count(*) OVER (PARTITION BY vhash_bits) <= 8)
         SELECT l.id AS a, r.id AS b, l.vhash_bits
         FROM capped l JOIN capped r
           ON l.vhash_bits = r.vhash_bits AND l.id < r.id""",

    // container-invariant decode evidence: the PNG/BMP split changes
    // only the bytes on the wire, never the pixels, so mm15 replays
    // mm8's analytic CTE verbatim — if either container branch (or the
    // magic sniff) shifted a single pixel, a channel sum would move
    // and the hash would break
    "mm15_decode_wire" ->
      s"""WITH $sumsCte
         SELECT id AS asset_id,
           CASE WHEN id % 13 = 0 THEN NULL ELSE w::INT END AS img_w,
           CASE WHEN id % 13 = 0 THEN NULL ELSE h::INT END AS img_h,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sr END AS sum_r,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sg END AS sum_g,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sb END AS sum_b,
           (id % 13 <> 0) AS decoded
         FROM sums""",

    // the from-scratch decoder replays the same analytic CTE; the two
    // corrupt classes (torn stream, flipped IDAT-tail byte) both null
    // in-band — a decoder that skipped CRC verification would "decode"
    // the flipped class and break every id % 11 row
    "mm35_png_native" ->
      s"""WITH $sumsCte
         SELECT id AS asset_id,
           CASE WHEN id % 13 = 0 OR id % 11 = 0 THEN NULL ELSE w::INT END AS img_w,
           CASE WHEN id % 13 = 0 OR id % 11 = 0 THEN NULL ELSE h::INT END AS img_h,
           CASE WHEN id % 13 = 0 OR id % 11 = 0 THEN NULL ELSE sr END AS sum_r,
           CASE WHEN id % 13 = 0 OR id % 11 = 0 THEN NULL ELSE sg END AS sum_g,
           CASE WHEN id % 13 = 0 OR id % 11 = 0 THEN NULL ELSE sb END AS sum_b,
           (id % 13 <> 0 AND id % 11 <> 0) AS decoded
         FROM sums""",

    // per-frame hashes replayed analytically over GLOBAL time t
    // (member offsets shift the sampled t range, so trims share
    // exactly the overlapping frames); distinct within clip, same
    // binding cap per frame hash, pair vote with shared >= 2
    "mm16_frame_containment" ->
      s"""WITH $frameCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r
  ON l.fhash = r.fhash AND l.id < r.id
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // the SAME full-corpus replay restricted to pairs touching the
    // %5=0 ingest batch: the lane's index was built from %5 in 1..3
    // and APPENDED with %5=4, so a row the append dropped,
    // double-wrote, or mis-bucketed shifts a bucket cap or a vote
    // count and breaks the hash — append ≡ rebuild is the gate
    "mm21_frame_index" ->
      s"""WITH $frameCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r
  ON l.fhash = r.fhash AND l.id < r.id
WHERE l.id % 5 = 0 OR r.id % 5 = 0
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // segment keys replayed analytically over GLOBAL windows (the
    // member offset shifts the sampled range, so offset re-cuts share
    // exactly the aligned segments); same distinct + cap + vote
    "mm17_audio_containment" ->
      s"""WITH $segmentCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.skey = r.skey AND l.id < r.id
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // mm21's append ≡ rebuild gate on the audio axis, through the
    // GENERIC posting index: the same full-corpus replay restricted to
    // pairs touching the %5 = 0 ingest batch (index built from 1..3,
    // appended with 4)
    "mm22_segment_index" ->
      s"""WITH $segmentCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.skey = r.skey AND l.id < r.id
WHERE l.id % 5 = 0 OR r.id % 5 = 0
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // the WHOLE chunker replayed in SQL: a recursive CTE walks every
    // byte (analytic byte formulas, the Rabin hash with B=257,
    // M=2^31-1, BW=257^8 mod M = 1213495441), cuts where the kernel
    // cuts, and keys each chunk as md5 over its upper-case hex — so a
    // boundary off by one byte anywhere in ~770-byte payloads desyncs
    // a key and breaks the hash
    "mm18_binary_cdc" ->
      s"""WITH RECURSIVE $cdcCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.ckey = r.ckey AND l.id < r.id
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // mm21's append ≡ rebuild gate on the BINARY axis: mm18's
    // recursive chunker replay restricted to batch-touching pairs
    "mm23_chunk_index" ->
      s"""WITH RECURSIVE $cdcCappedCte
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.ckey = r.ckey AND l.id < r.id
WHERE l.id % 5 = 0 OR r.id % 5 = 0
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // cross-modal composite: the caption channel replays as canonical
    // EQUALITY CLASSES (same cg ⇔ same md5(unicode_norm_key) — the
    // homoglyph swap normalizes back by tx48's pinned rule, and cg is
    // embedded verbatim so classes never collide), the image channel
    // replays the aHash analytically from the generative pixel
    // formulas (mm12's contract — natural cross-group collisions and
    // the corpus-wide all-zeros flat bucket must both reproduce), and
    // the composite cap + vote run over the tagged union exactly like
    // the lane
    "mm20_crossmodal_dedup" ->
      """WITH pars AS (
  SELECT doc_id AS id, (doc_id - doc_id % 4) AS g, doc_id % 4 AS m
  FROM documents),
par2 AS (
  SELECT id, g, m, ((g // 4) % 7 = 0) AS flat,
    CASE WHEN m = 1 THEN id ELSE g END AS ig,
    CASE WHEN m = 2 THEN id ELSE g END AS cg
  FROM pars),
dimz AS (SELECT id, flat, cg, ig,
    (4 + ig % 5)::INT AS w, (3 + ig % 4)::INT AS h FROM par2),
nf AS (SELECT * FROM dimz WHERE NOT flat),
pxx AS (SELECT id, ig, w, h, unnest(range(w)) AS x FROM nf),
pxy AS (SELECT id, ig, w, h, x, unnest(range(h)) AS y FROM pxx),
lum AS (SELECT id, w, h,
    ((y * 8 // h) * 8 + (x * 8 // w)) AS b,
    ((ig*7 + 3*x + 5*y) % 256) + ((ig*11 + x + 2*y) % 256)
      + ((ig*13 + 2*x + y) % 256) AS l
  FROM pxy),
blk AS (SELECT id, b, sum(l)::BIGINT AS bs, count(*)::BIGINT AS bn
        FROM lum GROUP BY 1, 2),
tot AS (SELECT id, sum(l)::BIGINT AS ts, (max(w)::BIGINT * max(h)) AS n
        FROM lum GROUP BY 1),
grid AS (SELECT id, unnest(range(64)) AS b FROM nf),
ibit AS (
  SELECT grid.id,
    string_agg(CASE WHEN coalesce(bs, 0) * n > ts * coalesce(bn, 0)
                    THEN '1' ELSE '0' END, '' ORDER BY grid.b) AS bits
  FROM grid
  LEFT JOIN blk ON grid.id = blk.id AND grid.b = blk.b
  JOIN tot ON grid.id = tot.id
  GROUP BY grid.id),
ibits AS (
  SELECT id, bits FROM ibit
  UNION ALL
  SELECT id, repeat('0', 64) AS bits FROM dimz WHERE flat),
keys AS (
  SELECT id, 'c:' || cg::VARCHAR AS k FROM par2
  UNION ALL
  SELECT id, 'i:' || bits AS k FROM ibits),
capped AS (
  SELECT id, k FROM keys
  QUALIFY count(*) OVER (PARTITION BY k) <= 8)
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.k = r.k AND l.id < r.id
GROUP BY 1, 2""",

    // the deterministic half of the JPEG container, replayed purely
    // from the fixture's generative parameters: the encoder was asked
    // for baseline (SOF0 → not progressive), 8-bit, 3-component
    // (TYPE_INT_RGB → JFIF YCbCr) frames at id-derived dims, and the
    // marker walk must read exactly those facts back off the wire;
    // torn ids (every 13th, 4-byte payload) miss in-band
    // both modality analytics composed: the video side's frame count,
    // mm26's unrolled captioned time, the floor-division permille, and
    // the cross-multiplied keep — either torn side nulls its columns
    // and forces keep false
    "mm27_caption_coverage" -> {
      val badVtt = "doc_id % 13 = 0 OR doc_id % 17 = 0"
      val total = (0 until 5).map(f =>
        s"""CASE WHEN 1 + doc_id % 5 > $f
             THEN 3500 + ((doc_id + $f) % 10) * 200 ELSE 0 END""")
        .mkString(" + ")
      s"""SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 9 = 0 THEN NULL
                ELSE ((3 + doc_id % 5) * 1000)::BIGINT END AS duration_ms,
           CASE WHEN $badVtt THEN NULL
                ELSE ($total)::BIGINT END AS captioned_ms,
           CASE WHEN doc_id % 9 = 0 OR $badVtt THEN NULL
                ELSE ((($total) * 1000) // ((3 + doc_id % 5) * 1000))::BIGINT
           END AS coverage_permille,
           (doc_id % 9 <> 0 AND NOT ($badVtt)
             AND ($total) * 1000 >= (3 + doc_id % 5) * 1000 * 1800)
             AS keep
         FROM documents"""
    },
    // cue statistics replayed from the generative parameters, f
    // unrolled over the ≤ 5 cues; overlap(f−1, f) fires iff
    // (id+f−1) % 10 ≥ 3 (duration beats the 4000 ms cue spacing)
    "mm26_vtt_cues" -> {
      val bad = "doc_id % 13 = 0 OR doc_id % 17 = 0"
      def ifCue(f: Int, expr: String) =
        s"CASE WHEN 1 + doc_id % 5 > $f THEN $expr ELSE 0 END"
      val total = (0 until 5).map(f =>
        ifCue(f, s"3500 + ((doc_id + $f) % 10) * 200")).mkString(" + ")
      val overlaps = (1 until 5).map(f =>
        ifCue(f, s"CASE WHEN (doc_id + $f - 1) % 10 >= 3 THEN 1 ELSE 0 END"))
        .mkString(" + ")
      val lines = (0 until 5).map(f =>
        ifCue(f, s"1 + (doc_id + $f) % 2")).mkString(" + ")
      s"""SELECT doc_id AS asset_id,
           CASE WHEN $bad THEN NULL
                ELSE (1 + doc_id % 5)::INT END AS n_cues,
           CASE WHEN $bad THEN NULL
                ELSE ($total)::BIGINT END AS total_cue_ms,
           CASE WHEN $bad THEN NULL
                ELSE ($overlaps)::INT END AS n_overlaps,
           CASE WHEN $bad THEN NULL
                ELSE ($lines)::INT END AS n_lines,
           NOT ($bad) AS parsed
         FROM documents"""
    },
    // the GIF structure replayed purely from the generative
    // parameters: per-frame delays unrolled over the ≤ 4 frames, loop
    // null both on parse misses AND on the no-extension thirds
    "mm25_gif_struct" ->
      """SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (4 + doc_id % 5)::INT END AS gif_w,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (3 + doc_id % 4)::INT END AS gif_h,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE 4::INT END AS gct_colors,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (1 + doc_id % 4)::INT END AS n_frames,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE ((5 + doc_id % 10)
                  + CASE WHEN 1 + doc_id % 4 > 1
                         THEN 5 + (doc_id + 1) % 10 ELSE 0 END
                  + CASE WHEN 1 + doc_id % 4 > 2
                         THEN 5 + (doc_id + 2) % 10 ELSE 0 END
                  + CASE WHEN 1 + doc_id % 4 > 3
                         THEN 5 + (doc_id + 3) % 10 ELSE 0 END)::INT
           END AS total_delay_cs,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN NULL
                ELSE (doc_id % 3)::INT END AS loop_count,
           NOT (doc_id % 13 = 0 OR doc_id % 17 = 0) AS parsed
         FROM documents""",
    // the TIFF tag directory replayed purely from the fixture's
    // generative parameters: id-derived dims/orientation/DateTime,
    // byte order by parity; ids torn to 6 bytes (% 13) or stamped
    // with magic 0x2B2B (% 17) miss in-band
    "mm24_tiff_meta" ->
      """SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (6 + doc_id % 9)::INT END AS tif_w,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (5 + doc_id % 7)::INT END AS tif_h,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (1 + doc_id % 8)::INT END AS orientation,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE 8::INT END AS bits,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE (doc_id % 2 = 0) END AS little_endian,
           CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN NULL
                ELSE '2020:01:' || lpad((1 + doc_id % 28)::VARCHAR, 2, '0')
                  || ' 12:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0')
           END AS date_time,
           NOT (doc_id % 13 = 0 OR doc_id % 17 = 0) AS parsed
         FROM documents""",
    // fresh-rebuild-without-the-deleted replay: the fh postings minus
    // the tombstoned ids, the df cap recomputed over the LIVE set
    // (capping before deletion would keep ghost assets binding the
    // cap), batch-touching pairs only — byte-identical to the masked
    // incremental probe or the lane fails
    "mm28_index_delete" ->
      s"""WITH $frameCappedCte,
live AS (SELECT id, fhash FROM fh
         WHERE NOT (id % 7 = 1 AND id % 5 <> 0)),
capl AS (SELECT id, fhash FROM live
         QUALIFY count(*) OVER (PARTITION BY fhash) <= 8)
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capl l JOIN capl r ON l.fhash = r.fhash AND l.id < r.id
WHERE l.id % 5 = 0 OR r.id % 5 = 0
GROUP BY 1, 2
HAVING count(*) >= 2""",
    "mm31_id3_tags" ->
      """WITH d AS (SELECT doc_id::BIGINT AS id FROM documents),
         p AS (SELECT id, (id % 13 = 0 OR id % 17 = 0) AS bad FROM d)
         SELECT id AS asset_id,
           CASE WHEN bad THEN NULL
                ELSE 'Track ' || id::VARCHAR END AS title,
           CASE WHEN bad THEN NULL
                ELSE 'Artist ' || (id % 7)::VARCHAR END AS artist,
           CASE WHEN bad OR id % 3 = 0 THEN NULL
                ELSE 'Album ' || (id % 5)::VARCHAR END AS album,
           CASE WHEN bad THEN NULL
                ELSE (2 + CASE WHEN id % 3 <> 0 THEN 1 ELSE 0 END)::INT
           END AS n_text_frames,
           NOT bad AS parsed
         FROM p""",
    // mm32: the census replayed arithmetically, the digest as
    // md5(text) — constants 25/37/13 are the writer's fixed warcinfo /
    // request / metadata-prefix payload octet counts (a drift in
    // either engine breaks the hash, which is the gate)
    "mm32_warc_walk" ->
      """WITH d AS (SELECT doc_id::BIGINT AS id, text FROM documents),
         p AS (SELECT id, text,
             (id % 13 = 0 OR id % 17 = 0) AS bad,
             (id % 3 = 0) AS meta
           FROM d)
         SELECT id AS asset_id,
           CASE WHEN bad THEN NULL
                ELSE (3 + CASE WHEN meta THEN 1 ELSE 0 END) END::INT
             AS n_records,
           CASE WHEN bad THEN NULL ELSE 1 END::INT AS n_warcinfo,
           CASE WHEN bad THEN NULL ELSE 1 END::INT AS n_request,
           CASE WHEN bad THEN NULL ELSE 1 END::INT AS n_response,
           CASE WHEN bad THEN NULL
                ELSE CASE WHEN meta THEN 1 ELSE 0 END END::INT
             AS n_metadata,
           CASE WHEN bad THEN NULL
                ELSE 25 + 37 + octet_length(encode(text)) +
                  CASE WHEN meta
                    THEN 13 + length((id % 1000)::VARCHAR)
                    ELSE 0 END
           END::BIGINT AS payload_bytes,
           CASE WHEN bad THEN NULL ELSE md5(text) END AS response_md5,
           NOT bad AS parsed
         FROM p""",

    // mm34: label by residue; decoded text = the original text except
    // the latin-1 arm's planted "é " tail; length() is chars in both
    // engines
    "mm34_charset" ->
      """SELECT doc_id::BIGINT AS asset_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                WHEN doc_id % 5 = 0 THEN 'utf-8-bom'
                WHEN doc_id % 5 = 1 THEN 'utf-16le'
                WHEN doc_id % 5 = 2 THEN 'utf-16be'
                WHEN doc_id % 5 = 3 THEN 'utf-8'
                ELSE 'latin-1' END AS charset,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                WHEN doc_id % 5 = 4 THEN length(text) + 2
                ELSE length(text) END::INT AS n_chars,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                WHEN doc_id % 5 = 4 THEN md5(text || chr(233) || ' ')
                ELSE md5(text) END AS text_md5,
           doc_id % 13 <> 0 AS parsed
         FROM documents""",

    // mm33: tx51's extraction replay over the parseable WARC subset
    "mm33_warc_html" ->
      """WITH h AS (SELECT doc_id,
           '<html><head><title>Doc ' || doc_id::VARCHAR
           || '</title><style>body { margin: 0; }</style></head><body><h1>Doc '
           || doc_id::VARCHAR || '</h1>' || chr(10) || '<p>' || text
           || ' &amp; tail &lt;' || doc_id::VARCHAR
           || '&gt;&nbsp;end</p><script>var a = ' || doc_id::VARCHAR
           || ';</script>' || chr(9)
           || '<div class="nav">footer &amp; nav</div></body></html>' AS html
         FROM documents
         WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0),
         s1 AS (SELECT doc_id, regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, regexp_replace(t,
           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, regexp_replace(t,
           '<[^>]*>', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t FROM s3),
         s5 AS (SELECT doc_id, trim(regexp_replace(t,
           '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g')) AS t
         FROM s4)
         SELECT doc_id AS asset_id, t AS extracted,
           length(t)::INT AS n_extracted
         FROM s5""",

    "mm29_mp3_meta" ->
      """WITH d AS (SELECT doc_id::BIGINT AS id FROM documents),
         p AS (SELECT id,
             (id % 13 = 0 OR id % 17 = 0) AS bad,
             (3 + id % 5)::INT AS nf,
             (CASE id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                          ELSE 32000 END)::INT AS sr
           FROM d),
         b AS (SELECT id, bad, nf, sr,
             CASE WHEN id % 4 = 0 THEN
               [list_extract([32,40,48,56,64,80,96,112,128,160,192,224,
                              256,320], (((id + i) % 14) + 1)::INT)
                for i in range(0, nf)]
             ELSE
               [list_extract([32,40,48,56,64,80,96,112,128,160,192,224,
                              256,320], ((id % 14) + 1)::INT)]
             END AS brs
           FROM p)
         SELECT id AS asset_id,
           CASE WHEN bad THEN NULL ELSE nf END AS n_frames,
           CASE WHEN bad THEN NULL ELSE sr END AS sample_rate,
           CASE WHEN bad THEN NULL ELSE list_min(brs)::INT END AS min_br,
           CASE WHEN bad THEN NULL ELSE list_max(brs)::INT END AS max_br,
           CASE WHEN bad THEN NULL ELSE (id % 4)::INT END AS channel_mode,
           CASE WHEN bad THEN NULL
                ELSE ((nf::BIGINT * 1152 * 1000) // sr)::BIGINT
           END AS duration_ms,
           CASE WHEN bad THEN NULL ELSE id % 2 = 0 END AS has_id3,
           CASE WHEN bad THEN NULL ELSE id % 5 = 0 END AS has_crc,
           NOT bad AS parsed
         FROM b""",
    "mm30_adts_meta" ->
      """WITH d AS (SELECT doc_id::BIGINT AS id FROM documents),
         p AS (SELECT id,
             (id % 11 = 0 OR id % 19 = 0) AS bad,
             (2 + id % 6)::INT AS nf,
             (CASE 3 + id % 9
                WHEN 3 THEN 48000 WHEN 4 THEN 44100 WHEN 5 THEN 32000
                WHEN 6 THEN 24000 WHEN 7 THEN 22050 WHEN 8 THEN 16000
                WHEN 9 THEN 12000 WHEN 10 THEN 11025 ELSE 8000
              END)::INT AS sr
           FROM d)
         SELECT id AS asset_id,
           CASE WHEN bad THEN NULL ELSE nf END AS n_frames,
           CASE WHEN bad THEN NULL ELSE sr END AS sample_rate,
           CASE WHEN bad THEN NULL ELSE (id % 4)::INT END AS aac_profile,
           CASE WHEN bad THEN NULL ELSE (1 + id % 6)::INT END AS channels,
           CASE WHEN bad THEN NULL
                ELSE ((nf::BIGINT * 1024 * 1000) // sr)::BIGINT
           END AS duration_ms,
           CASE WHEN bad THEN NULL ELSE id % 3 = 0 END AS has_crc,
           NOT bad AS parsed
         FROM p""",
    "mm19_jpeg_meta" ->
      """SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE (16 + doc_id % 9)::INT END AS jpg_w,
           CASE WHEN doc_id % 13 = 0 THEN NULL
                ELSE (12 + doc_id % 7)::INT END AS jpg_h,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 3::INT END
             AS n_components,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 8::INT END
             AS bit_depth,
           CASE WHEN doc_id % 13 = 0 THEN NULL ELSE FALSE END
             AS progressive,
           (doc_id % 13 <> 0) AS parsed
         FROM documents"""
  )
}
