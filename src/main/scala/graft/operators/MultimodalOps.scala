package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * / frame-sample run as per-partition batch functions over the binary
  * column.
  *
  * Decode: all three modalities carry REAL pure-JVM kernels —
  * [[decodeImageFeatures]] ([[ImageCodec]], 24-bit BMP: header parse,
  * BGR order, row padding, bottom-up rows), [[decodeAudioFeatures]]
  * ([[AudioCodec]], mono 16-bit PCM WAV: RIFF chunk walk), and
  * [[sampleVideoFrames]] ([[VideoCodec]], YUV4MPEG2/C444: frame-marker
  * walk with in-place plane reduction) — proving the batching plumbing
  * carries actual codecs end-to-end. COMPRESSED formats (r17): PNG
  * decodes through the from-scratch [[PngNative]] (chunk walk + CRCs,
  * JDK-Inflater IDAT, all five scanline filters, every color
  * type/depth, Adam7) — hash-gated like BMP since PNG is lossless;
  * JPEG parses its frame header deterministically ([[PngCodec.jpegHeader]])
  * and decodes pixels through the JDK reader only (IDCT rounding is
  * decoder-dependent — never hash-gated); MP3 stays meta-only. The
  * original md5 stub (`decodeStub`/`decodeFeatures`) remains as the
  * spec twin for the batch shape.
  *
  * Scale: binary payloads stay opaque until the last possible operator
  * (no accidental row-cache of decoded frames); per-partition batching
  * amortizes codec init; frame sampling is index arithmetic pushed to a
  * row-local `sequence()` — the bytes of unsampled frames are never
  * touched.
  */
object MultimodalOps {

  /** Canonical asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = true),   // image|audio|video
      StructField("n_bytes", LongType, nullable = true),
      StructField("mime", StringType, nullable = true))), nullable = true)))

  /** Wrap any (id, string payload) source into the asset shape — the test
    * corpus has no real media, so text bytes stand in for payloads.
    */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val bytes = col(payloadCol).cast("binary")
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col(idCol) % 3 + 1).cast("int"))
    df.select(col(idCol).as("asset_id"), bytes.as("content"),
      struct(kind.as("kind"),
        octet_length(bytes).cast("long").as("n_bytes"),
        concat(lit("application/x-"), kind).as("mime")).as("meta"))
  }

  /** Modality-routed storage: assets written hive-partitioned by
    * `meta.kind`, so downstream per-modality jobs (image decode, audio
    * resample, frame sampling) open ONLY their modality's directory —
    * partition pruning at the coarsest, cheapest level. Payload bytes
    * are clustered by asset_id inside bounded files via
    * [[graft.sources.Compaction.writePartitioned]].
    */
  def writeByModality(assets: DataFrame, path: String,
                      maxRecordsPerFile: Long = 100000L): Unit =
    graft.sources.Compaction.writePartitioned(
      assets.select(col("asset_id"), col("content"),
        col("meta.kind").as("kind"),
        col("meta.n_bytes").as("n_bytes"), col("meta.mime").as("mime")),
      path, Seq("kind"), clusterBy = Seq("asset_id"),
      maxRecordsPerFile = maxRecordsPerFile)

  /** Read ONE modality back from a [[writeByModality]] layout — the
    * `kind = …` predicate prunes to that partition directory (verify
    * `PartitionFilters` in the scan; other modalities' bytes are never
    * listed, opened, or read).
    */
  def readModality(spark: org.apache.spark.sql.SparkSession, path: String,
                   kind: String): DataFrame =
    spark.read.parquet(path).filter(col("kind") === kind)

  /** Metadata projection — never touches `content` (column pruning keeps
    * the binary out of the scan when only metadata is asked for).
    */
  def describe(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("meta.kind").as("kind"),
      col("meta.n_bytes").as("n_bytes"), md5(col("content")).as("content_hash"))

  /** Frame-sample index plan: one row per sampled frame offset (every
    * `step` bytes stands in for every Nth video frame). Pure index
    * arithmetic — the payload is not read.
    */
  def frameSampleOffsets(assets: DataFrame, step: Int): DataFrame =
    assets.select(col("asset_id"), col("meta.n_bytes").as("n_bytes"))
      // empty payloads sample zero frames; sequence(0, -1) would throw
      .withColumn("frame_off",
        explode(when(col("n_bytes") > 0,
          sequence(lit(0L), col("n_bytes") - 1, lit(step.toLong)))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("frame_id",
        md5(concat(col("asset_id"), lit(":"), col("frame_off"))))

  /** Byte-range chunk manifest: split each asset's payload into
    * fixed-size ranges — the unit of PARALLEL decode (each chunk is an
    * independent task reading `length` bytes at `offset`; the payload
    * itself is never touched here, only `n_bytes`). The tail chunk
    * carries the remainder; empty payloads emit no chunks.
    */
  def byteChunks(assets: DataFrame, chunkBytes: Long): DataFrame =
    assets.select(col("asset_id"), col("meta.n_bytes").as("n_bytes"))
      .withColumn("offset",
        explode(when(col("n_bytes") > 0,
          sequence(lit(0L), col("n_bytes") - 1, lit(chunkBytes)))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("asset_id"),
        (col("offset") / chunkBytes).cast("int").as("chunk_id"),
        col("offset"),
        least(lit(chunkBytes), col("n_bytes") - col("offset"))
          .as("length"))

  /** Deterministic fake source dimensions — the stand-in for a header
    * probe (a real pipeline reads width/height from the container
    * metadata, not the payload): md5-derived uint16s mapped into
    * [256, 3840) × [256, 2416). Same derivation idiom as the decode
    * stub, replayable in an external engine.
    */
  def withStubDims(assets: DataFrame): DataFrame = {
    def dim(salt: String, span: Int): Column =
      (lit(256) + conv(substring(
        md5(concat(col("asset_id"), lit(salt))), 1, 4), 16, 10)
        .cast("long") % span).cast("int")
    assets.select(col("asset_id"), col("meta.kind").as("kind"),
      dim(":w", 3584).as("src_w"), dim(":h", 2160).as("src_h"))
  }

  /** Resize work plan: per-asset target dimensions at `maxDim` on the
    * long side, aspect preserved, never upscaled — the work list a
    * distributed resize executes (metadata-only; payload bytes are not
    * touched here, exactly like [[byteChunks]]). All arithmetic is
    * integer-exact (`floor(src * maxDim / longSide)`, products ≪ 2^53)
    * so the plan replays bit-identically in any engine. `est_bytes` is
    * the decoded RGB estimate `dst_w * dst_h * 3` — the number a
    * scheduler bin-packs decode batches by.
    */
  def resizePlan(dims: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim >= 1, s"maxDim must be positive, got $maxDim")
    def scaled(side: Column, longSide: Column): Column =
      when(longSide <= maxDim, side)
        .otherwise(floor(side.cast("double") * maxDim / longSide)
          .cast("int"))
    val mx = greatest(col("src_w"), col("src_h"))
    dims.select(col("asset_id"), col("kind"),
        col("src_w"), col("src_h"),
        scaled(col("src_w"), mx).as("dst_w"),
        scaled(col("src_h"), mx).as("dst_h"),
        (mx > maxDim).as("downscaled"))
      .withColumn("est_bytes",
        col("dst_w").cast("long") * col("dst_h") * 3L)
  }

  /** The single stub "decode" kernel: 8 doubles from the md5 of the
    * payload — the shape a real `decode(bytes) -> features` kernel would
    * return. Shared by the UDF and the batched path so the two cannot
    * drift; swap for a codec-backed kernel in prod.
    */
  private[operators] def stubFeatures(
      md: java.security.MessageDigest, bytes: Array[Byte]): Array[Double] =
    if (bytes == null) null
    else {
      md.reset()
      val h = md.digest(bytes)
      (0 until 8).map(i =>
        ((h(2 * i) & 0xff) * 256 + (h(2 * i + 1) & 0xff)) / 65535.0).toArray
    }

  /** Row-at-a-time UDF form of the stub decode (the batched
    * [[decodeFeatures]] is the production shape).
    */
  val decodeStub: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      stubFeatures(java.security.MessageDigest.getInstance("MD5"), bytes)
    }

  /** Batched decode over partitions: iterator-to-iterator (no
    * materialization), codec init once per partition — the Scala analog
    * of a `mapInPandas` batch UDF.
    */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(assets.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.mapPartitions { it =>
      // per-partition "codec" init happens here (stubbed)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val feats = stubFeatures(md, r.getAs[Array[Byte]]("content"))
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Deterministic BMP fixture assets: one real 24-bit BMP per id with
    * parametric pixels — dims `w = 4 + id % 5`, `h = 3 + id % 4` (w = 5
    * hits the 4-byte row-padding path; all dims exercise bottom-up row
    * order), pixel (x, y) channels `r = (id·7 + 3x + 5y) % 256`,
    * `g = (id·11 + x + 2y) % 256`, `b = (id·13 + 2x + y) % 256`. Every
    * 13th id carries a CORRUPT payload (BMP magic, truncated body) so
    * the decode-miss path fires in-band. The generative parameters are
    * pure integer functions of the id, so an oracle can compute every
    * downstream feature analytically WITHOUT parsing bytes — while the
    * Spark side genuinely decodes the container.
    */
  def synthBmpAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val bmp = ImageCodec.encodeBmp24(w, h, (x, y) => (
            ((id * 7 + 3 * x + 5 * y) % 256).toInt,
            ((id * 11 + x + 2 * y) % 256).toInt,
            ((id * 13 + 2 * x + y) % 256).toInt))
          val payload =
            if (id % 13 == 0) bmp.take(20) // truncated: magic ok, body gone
            else bmp
          Row(id, payload)
        }
      }(enc)
  }

  /** REAL image decode over the binary column (retires the stub as the
    * production kernel; [[decodeFeatures]] stays as the batching spec
    * twin): parse each payload as a 24-bit BMP via [[ImageCodec]] and
    * append exact-integer features — dims + per-channel sums. Corrupt
    * or non-BMP payloads yield `decoded = false` with null features
    * (in-band, never a task failure — the dead-letter discipline).
    * Iterator-to-iterator `mapPartitions`: no materialization, kernel
    * is static, zero per-row setup — the same batch shape a Pandas-UDF
    * decode uses, minus the Python boundary.
    */
  def decodeImageFeatures(assets: DataFrame,
                          contentCol: String = "content",
                          kernel: Array[Byte] => Option[ImageCodec.DecodedImage]
                            = ImageCodec.decodeBmp24): DataFrame = {
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("img_w", IntegerType, nullable = true),
      StructField("img_h", IntegerType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true),
      StructField("decoded", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.map { r =>
        kernel(r.getAs[Array[Byte]](idx)) match {
          case Some(img) =>
            val (sr, sg, sb) = ImageCodec.channelSums(img)
            Row.fromSeq(r.toSeq ++ Seq(img.w, img.h, sr, sg, sb, true))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** Mixed wire-format image fixture — [[synthBmpAssets]]'s parametric
    * pixels carried by the container each id draws: even ids encode as
    * PNG through the JDK writer ([[PngCodec]]), odd ids as hand-rolled
    * BMP, so one corpus exercises both decode paths of the
    * [[PngCodec.decodeAuto]] sniffing kernel under a single analytic
    * oracle (dims and channel sums are container-invariant — PNG is
    * lossless). Every 13th id is truncated to 20 bytes: signature
    * intact, body gone — the decode-miss path fires on BOTH container
    * branches in-band.
    */
  /** The parametric image formulas every wire fixture AND its analytic
    * DuckDB oracle share (mm8/mm15/mm35's `sumsCte`) — ONE definition,
    * so a drift between a fixture copy and the oracle is impossible
    * (review r17). */
  private def wireDims(id: Long): (Int, Int) =
    ((4 + id % 5).toInt, (3 + id % 4).toInt)
  private def wirePx(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + 3 * x + 5 * y) % 256).toInt,
    ((id * 11 + x + 2 * y) % 256).toInt,
    ((id * 13 + 2 * x + y) % 256).toInt)

  def synthWireImageAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h) = wireDims(id)
          val img =
            if (id % 2 == 0) PngCodec.encodePng24(w, h, wirePx(id))
            else ImageCodec.encodeBmp24(w, h, wirePx(id))
          val payload =
            if (id % 13 == 0) img.take(20) // signature ok, body gone
            else img
          Row(id, payload)
        }
      }(enc)
  }

  /** PNG-only wire fixture with TWO corrupt classes for the
    * from-scratch decoder's in-band taxonomy (mm35): every id encodes
    * through the JDK PNG writer (same parametric pixels as
    * [[synthWireImageAssets]] so the analytic oracle is shared); every
    * 13th payload is torn after the signature (truncated-stream
    * class); every 11th has one byte flipped in the IDAT tail
    * (CRC-mismatch class — the wire-integrity check a meta-only parse
    * never exercises). */
  def synthPngCorruptAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h) = wireDims(id)
          val img = PngCodec.encodePng24(w, h, wirePx(id))
          val payload =
            if (id % 13 == 0) img.take(20) // signature ok, body gone
            else if (id % 11 == 0) {
              // last byte of the IDAT chunk CRC (IEND is the final 12
              // bytes): any flip here must fail the chunk-walk CRC
              val c = img.clone()
              c(c.length - 13) = (c(c.length - 13) ^ 0x5a).toByte
              c
            } else img
          Row(id, payload)
        }
      }(enc)
  }

  /** JPEG wire fixture — the dominant container of real image corpora:
    * every id encodes through the JDK JPEG writer at pinned quality
    * 0.75 with dims drawn from the id (w = 16 + id % 9,
    * h = 12 + id % 7 — past the 8×8 MCU so the encoder exercises real
    * block layout), gradient pixels. Every 13th id is truncated to 4
    * bytes: SOI + one marker byte, signature intact, frame header gone
    * — the [[PngCodec.jpegHeader]] miss path fires in-band. Pixels are
    * LOSSY and decoder-dependent; only the header facts are
    * deterministic, which is exactly what mm19 gates.
    */
  def synthJpegAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (16 + id % 9).toInt
          val h = (12 + id % 7).toInt
          val jpg = PngCodec.encodeJpeg24(w, h, 0.75f, (x, y) => (
            ((id * 7 + 3 * x + 5 * y) % 256).toInt,
            ((id * 11 + x + 2 * y) % 256).toInt,
            ((id * 13 + 2 * x + y) % 256).toInt))
          val payload =
            if (id % 13 == 0) jpg.take(4) // SOI + FF, frame header gone
            else jpg
          Row(id, payload)
        }
      }(enc)
  }

  /** Frame-header profile over JPEG payloads — the hash-gateable half
    * of the format ([[PngCodec.jpegHeader]]): dims, component count,
    * sample precision, progressive flag, parse success in-band. The
    * batch shape matches [[decodeImageFeatures]]: per-partition map,
    * payload untouched beyond the marker walk (entropy data is never
    * read, so cost is O(header) per asset no matter the payload size).
    */
  def jpegHeaderProfile(assets: DataFrame,
                        contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("jpg_w", IntegerType, nullable = true),
      StructField("jpg_h", IntegerType, nullable = true),
      StructField("n_components", IntegerType, nullable = true),
      StructField("bit_depth", IntegerType, nullable = true),
      StructField("progressive", BooleanType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        PngCodec.jpegHeader(r.getAs[Array[Byte]](idx)) match {
          case Some(hd) =>
            Row.fromSeq(base ++ Seq(hd.w, hd.h, hd.nComponents,
              hd.precision, hd.progressive, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** TIFF wire fixture — the metadata-bearing image container (mm24):
    * every id writes a single-strip gray8 TIFF
    * ([[TiffCodec.encodeTiffGray8]]) with id-derived dims, orientation
    * and DateTime, byte order alternating by parity (even ids "II"
    * little-endian — the EXIF default; odd ids "MM" big-endian: a
    * reader that silently assumes one order fails half this corpus),
    * gradient pixels. Corrupt taxonomy in-band: every 13th id
    * truncated to 6 bytes (order mark + magic intact, IFD offset
    * torn); every 17th (not also 13th) carries magic 0x2B2B ≠ 42 —
    * both must MISS, never throw.
    */
  def synthTiffAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (6 + id % 9).toInt
          val h = (5 + id % 7).toInt
          val dt = f"2020:01:${1 + id % 28}%02d 12:00:${id % 60}%02d"
          val tif = TiffCodec.encodeTiffGray8(w, h, (1 + id % 8).toInt,
            dt, littleEndian = id % 2 == 0,
            (x, y) => ((id * 7 + 3 * x + 5 * y) % 256).toInt)
          val payload =
            if (id % 13 == 0) tif.take(6)
            else if (id % 17 == 0) {
              tif(2) = 0x2b.toByte; tif(3) = 0x2b.toByte; tif
            } else tif
          Row(id, payload)
        }
      }(enc)
  }

  /** Deterministic MP3 corpus from ids — the audio analog of
    * [[synthTiffAssets]]: every header field is an arithmetic function
    * of the id (the oracle replays the rule analytically, including
    * the VBR min/max over the per-frame bitrate sequence), with the
    * corrupt taxonomy planted at id % 13 (torn mid-frame) and id % 17
    * (reserved sample-rate index patched into the first header). */
  def synthMp3Assets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val vbr = id % 4 == 0
          val mp3 = Mp3Codec.encodeMp3(
            nFrames = (3 + id % 5).toInt,
            srIdx = (id % 3).toInt,
            mode = (id % 4).toInt,
            withCrc = id % 5 == 0,
            id3Size = if (id % 2 == 0) (16 + id % 8).toInt else -1,
            brIdx = i => (1 + (if (vbr) (id + i) % 14 else id % 14)).toInt,
            padBit = i => if ((id + i) % 3 == 0) 1 else 0)
          val payload =
            // cut INSIDE the final frame (3 < any frame length), so
            // the torn class can never land on a frame boundary and
            // accidentally parse clean
            if (id % 13 == 0) mp3.take(mp3.length - 3)
            else if (id % 17 == 0) {
              val at = (if (id % 2 == 0) 10 + 16 + id % 8 else 0).toInt
              mp3(at + 2) = (mp3(at + 2) | 0x0c).toByte // srIdx -> 3
              mp3
            } else mp3
          Row(id, payload)
        }
      }(enc)
  }

  /** Frame-header profile over MP3 payloads ([[Mp3Codec.mp3Walk]]):
    * frame count, sample rate, bitrate envelope (min == max ⟺ CBR),
    * channel mode, integer duration, tag/CRC presence, parse success
    * in-band. O(n_frames) header hops per asset — the spectral
    * payload is never read, so cost is independent of asset size. */
  def mp3Profile(assets: DataFrame,
                 contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("min_br", IntegerType, nullable = true),
      StructField("max_br", IntegerType, nullable = true),
      StructField("channel_mode", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("has_id3", BooleanType, nullable = true),
      StructField("has_crc", BooleanType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        Mp3Codec.mp3Walk(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(base ++ Seq(m.nFrames, m.sampleRate,
              m.minBitrateKbps, m.maxBitrateKbps, m.channelMode,
              m.durationMs, m.hasId3, m.hasCrc, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, null,
              null, null, false))
        }
      }
    }(enc)
  }

  /** Deterministic TAGGED MP3 corpus from ids: a real ID3v2.3 tag
    * (title/artist always, album for id % 3 ≠ 0, id-varying padding)
    * ahead of one audio frame. Corrupt taxonomy: id % 13 carries NO
    * tag at all, id % 17 a frame whose size runs past the tag
    * boundary — both resolve in-band. */
  def synthTaggedMp3Assets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val frames = Seq("TIT2" -> s"Track $id",
            "TPE1" -> s"Artist ${id % 7}") ++
            (if (id % 3 != 0) Seq("TALB" -> s"Album ${id % 5}") else Nil)
          val tag = Mp3Codec.encodeId3(frames, pad = (id % 6).toInt)
          val audio = Mp3Codec.encodeMp3(1, (id % 3).toInt, 0,
            withCrc = false, id3Size = -1, _ => 5, _ => 0)
          val payload =
            if (id % 13 == 0) audio // tagless
            else if (id % 17 == 0) {
              tag(14) = 0x7f.toByte // first frame size -> overrun
              tag ++ audio
            } else tag ++ audio
          Row(id, payload)
        }
      }(enc)
  }

  /** ID3v2.3 tag profile over MP3 payloads
    * ([[Mp3Codec.id3TextFrames]]): the canonical text frames plus the
    * frame census, parse success in-band. Only the tag bytes are
    * walked — never the audio stream. */
  def mp3TagProfile(assets: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("title", StringType, nullable = true),
      StructField("artist", StringType, nullable = true),
      StructField("album", StringType, nullable = true),
      StructField("n_text_frames", IntegerType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        Mp3Codec.id3TextFrames(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(base ++ Seq(m.get("TIT2").orNull,
              m.get("TPE1").orNull, m.get("TALB").orNull, m.size, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** Deterministic ADTS (AAC) corpus from ids; corrupt taxonomy at
    * id % 11 (torn) and id % 19 (nonzero layer bits patched into the
    * first header). */
  def synthAdtsAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val aac = Mp3Codec.encodeAdts(
            nFrames = (2 + id % 6).toInt,
            sfi = (3 + id % 9).toInt,
            profile = (id % 4).toInt,
            channels = (1 + id % 6).toInt,
            withCrc = id % 3 == 0,
            payloadLen = i => (10 + (id + i) % 20).toInt)
          val payload =
            if (id % 11 == 0) aac.take(aac.length - 3) // mid-final-frame

            else if (id % 19 == 0) {
              aac(1) = (aac(1) | 0x02).toByte // layer 00 -> 01
              aac
            } else aac
          Row(id, payload)
        }
      }(enc)
  }

  /** Header profile over ADTS payloads ([[Mp3Codec.adtsWalk]]). */
  def adtsProfile(assets: DataFrame,
                  contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("aac_profile", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("has_crc", BooleanType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        Mp3Codec.adtsWalk(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(base ++ Seq(m.nFrames, m.sampleRate, m.profile,
              m.channels, m.durationMs, m.hasCrc, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, null,
              false))
        }
      }
    }(enc)
  }

  /** Deterministic WARC corpus from (id, text) — the crawl-container
    * analog of [[synthMp3Assets]]: each doc becomes one WARC file of
    * warcinfo + request + response (payload = the doc's text bytes,
    * so the response digest is honestly content-derived and the
    * oracle replays it as md5(text)) + metadata on id % 3 = 0.
    * Corrupt taxonomy: id % 13 torn mid-terminator (final 3 bytes
    * cut), id % 17 (not also 13) an alien version line — both miss
    * in-band. */
  def synthWarcAssets(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    synthWarcCore(df, idCol, textCol, (_, t) => t)

  /** [[synthWarcAssets]] with the response payload wrapped in tx51's
    * exact HTML template — the composition corpus for the
    * walk-then-extract ingest slice (mm33). */
  def synthWarcHtmlAssets(df: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    synthWarcCore(df, idCol, textCol, (id, t) =>
      s"<html><head><title>Doc $id</title><style>body { margin: 0; }" +
        s"</style></head><body><h1>Doc $id</h1>\n<p>$t &amp; tail " +
        s"&lt;$id&gt;&nbsp;end</p><script>var a = $id;</script>\t" +
        "<div class=\"nav\">footer &amp; nav</div></body></html>")

  private def synthWarcCore(df: DataFrame, idCol: String,
      textCol: String, respBody: (Long, String) => String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"),
        col(textCol).cast("string").as("_t"))
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        it.map { r =>
          val id = r.getLong(0)
          val uri = s"http://site${id % 7}.org/p${id % 11}"
          val recs = Seq(
            ("warcinfo", null: String,
              "software: graft-synth 1.0".getBytes(utf8)),
            ("request", uri,
              "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"
                .getBytes(utf8)),
            ("response", uri,
              respBody(id, r.getString(1)).getBytes(utf8))) ++
            (if (id % 3 == 0)
              Seq(("metadata", uri,
                s"fetchTimeMs: ${id % 1000}".getBytes(utf8)))
            else Nil)
          val warc = WarcCodec.encodeWarc(recs)
          val payload =
            if (id % 13 == 0) warc.take(warc.length - 3)
            else if (id % 17 == 0) {
              warc(0) = 'H'; warc(1) = 'T'; warc(2) = 'T'; warc(3) = 'P'
              warc
            } else warc
          Row(id, payload)
        }
      }(enc)
  }

  /** Deterministic mixed-charset wire-text corpus from (id, text) —
    * the transcode-normalization analog of [[synthWarcAssets]]: the
    * same doc text shipped as UTF-8+BOM (%5=0), UTF-16LE (%5=1),
    * UTF-16BE (%5=2), bare UTF-8 (%5=3), and latin-1 with a planted
    * non-UTF-8 byte pair 0xE9 0x20 ("é ") forcing the fallback
    * (%5=4). Corrupt: id % 13 a UTF-16LE stream torn mid code unit.
    * The gated corpus is pure ASCII (probed), so every decode is
    * byte-replayable by the oracle. */
  def synthCharsetAssets(df: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"),
        col(textCol).cast("string").as("_t"))
      .mapPartitions { it =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        it.map { r =>
          val id = r.getLong(0)
          val t = r.getString(1)
          val payload: Array[Byte] =
            if (id % 13 == 0) {
              val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
              Array(0xff.toByte, 0xfe.toByte) ++ b.take(b.length - 1)
            } else (id % 5) match {
              case 0 => Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                t.getBytes(utf8)
              case 1 => Array(0xff.toByte, 0xfe.toByte) ++
                t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
              case 2 => Array(0xfe.toByte, 0xff.toByte) ++
                t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
              case 3 => t.getBytes(utf8)
              case _ => t.getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1) ++
                Array(0xe9.toByte, 0x20.toByte)
            }
          Row(id, payload)
        }
      }(enc)
  }

  /** Charset profile over wire-text payloads ([[CharsetCodec.sniff]]):
    * detected charset, decoded char count, md5 of the UTF-8
    * re-encoding (the normalized bytes every downstream text op
    * consumes), parse success in-band. One byte pass per asset. */
  def charsetProfile(assets: DataFrame,
                     contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("charset", StringType, nullable = true),
      StructField("n_chars", IntegerType, nullable = true),
      StructField("text_md5", StringType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      it.map { r =>
        val base = keep.map(r.get)
        CharsetCodec.sniff(r.getAs[Array[Byte]](idx)) match {
          case Some(s) =>
            val md = java.security.MessageDigest.getInstance("MD5")
              .digest(s.text.getBytes(utf8))
              .map(b => f"${b & 0xff}%02x").mkString
            Row.fromSeq(base ++ Seq(s.charset, s.text.length, md, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, false))
        }
      }
    }(enc)
  }

  /** Response payloads of parsed WARC files as UTF-8 text, one row
    * per response record `(asset_id, resp_idx, payload)` — the hand-
    * off from container walk to content processing (HTML extraction,
    * quality scoring, dedup all consume this). Corrupt files have no
    * rows here BY DESIGN: their in-band miss lives in
    * [[warcProfile]]'s `parsed` column, and an ingest pipeline reads
    * both (profile for the ledger, payloads for the content path).
    */
  def warcResponseTexts(assets: DataFrame,
                        contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("resp_idx", IntegerType, nullable = false),
      StructField("payload", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      it.flatMap { r =>
        val base = keep.map(r.get)
        WarcCodec.responsePayloads(r.getAs[Array[Byte]](idx)) match {
          case Some(ps) => ps.zipWithIndex.map { case (p, i) =>
            Row.fromSeq(base ++ Seq(i, new String(p, utf8)))
          }
          case None => Nil
        }
      }
    }(enc)
  }

  /** Record census over WARC payloads ([[WarcCodec.warcWalk]]):
    * counts by record type, total payload octets, response-payload
    * md5, parse success in-band. O(records) header hops per file —
    * payloads are never parsed (the response md5 update is the one
    * payload read, and it IS the profile's point). */
  def warcProfile(assets: DataFrame,
                  contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("n_records", IntegerType, nullable = true),
      StructField("n_warcinfo", IntegerType, nullable = true),
      StructField("n_request", IntegerType, nullable = true),
      StructField("n_response", IntegerType, nullable = true),
      StructField("n_metadata", IntegerType, nullable = true),
      StructField("payload_bytes", LongType, nullable = true),
      StructField("response_md5", StringType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        WarcCodec.warcWalk(r.getAs[Array[Byte]](idx)) match {
          case Some(w) =>
            Row.fromSeq(base ++ Seq(w.nRecords, w.nWarcinfo, w.nRequest,
              w.nResponse, w.nMetadata, w.payloadBytes, w.responseMd5,
              true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, null,
              null, false))
        }
      }
    }(enc)
  }

  /** IFD metadata profile over TIFF payloads ([[TiffCodec.ifdWalk]]):
    * dims, orientation, bits-per-sample, byte order, DateTime, parse
    * success in-band — the EXIF-class facts a curation pipeline
    * filters and groups on. O(header) per asset: the strip data is
    * never read.
    */
  def tiffMetaProfile(assets: DataFrame,
                      contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("tif_w", IntegerType, nullable = true),
      StructField("tif_h", IntegerType, nullable = true),
      StructField("orientation", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("little_endian", BooleanType, nullable = true),
      StructField("date_time", StringType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        TiffCodec.ifdWalk(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(base ++ Seq(m.w, m.h, m.orientation,
              m.bitsPerSample, m.littleEndian, m.dateTime.orNull, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, null,
              false))
        }
      }
    }(enc)
  }

  /** GIF wire fixture — the ANIMATION container (mm25): every id
    * writes a multi-frame GIF89a via [[GifCodec.encodeGif]] with
    * id-derived canvas, frame count, per-frame delays and loop count
    * (every 3rd id omits the NETSCAPE extension — loop_count must come
    * back null IN a successful parse, not as a miss). The LZW payload
    * is the degenerate-valid encoding `javax.imageio` decodes
    * (GifCodecSpec pins that); the walk itself never reads it. Corrupt
    * taxonomy: every 13th id torn to 10 bytes (inside the logical
    * screen descriptor); every 17th signature-stomped — both miss
    * in-band.
    */
  def synthGifAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 5).toInt
          val h = (3 + id % 4).toInt
          val frames = (1 + id % 4).toInt
          val delays = (0 until frames).map(f => (5 + (id + f) % 10).toInt)
          val loop = if (id % 3 == 0) None else Some((id % 3).toInt)
          val gif = GifCodec.encodeGif(w, h, delays, loop,
            (f, x, y) => ((id * 7 + f + x + 2 * y) % 4).toInt)
          val payload =
            if (id % 13 == 0) gif.take(10)
            else if (id % 17 == 0) { gif(0) = 'X'.toByte; gif }
            else gif
          Row(id, payload)
        }
      }(enc)
  }

  /** Animation-structure profile over GIF payloads
    * ([[GifCodec.gifMeta]]): canvas dims, palette size, frame count,
    * total animation time, loop count, parse success — the curation
    * facts for an animated-image corpus (drop single-frame "animations",
    * cap runtimes, split loopers) — at O(blocks) per asset, pixel data
    * never read.
    */
  def gifStructProfile(assets: DataFrame,
                       contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == contentCol) ++ Seq(
      StructField("gif_w", IntegerType, nullable = true),
      StructField("gif_h", IntegerType, nullable = true),
      StructField("gct_colors", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("total_delay_cs", IntegerType, nullable = true),
      StructField("loop_count", IntegerType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        GifCodec.gifMeta(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(base ++ Seq(m.w, m.h, m.gctColors, m.frames,
              m.totalDelayCs, m.loopCount.map(Int.box).orNull, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, null, null,
              false))
        }
      }
    }(enc)
  }

  /** WebVTT sidecar fixture — the timed-text modality (mm26): every id
    * writes a caption file with id-derived cue count, starts,
    * durations and payload line counts; even cues carry an identifier
    * line and odd cues' END timestamps omit the hour field (both
    * grammar branches of [[SubtitleCodec]]), every 5th id opens with a
    * NOTE comment block. Durations run long enough that consecutive
    * cues OVERLAP whenever (id+f−1) % 10 ≥ 3 — the auto-caption
    * signature the profile exists to flag. Corrupt taxonomy: every
    * 13th id loses its header; every 17th carries a malformed timing
    * line — both miss in-band (strict parse: a torn sidecar must not
    * contribute half its cues).
    */
  def synthVttAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("vtt", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    def fmtFull(ms: Long): String =
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
    def fmtShort(ms: Long): String =
      f"${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val sb = new StringBuilder
          sb.append(if (id % 13 == 0) "XEBVTT\n\n" else "WEBVTT\n\n")
          if (id % 5 == 0) sb.append("NOTE generated fixture\n\n")
          val nCues = (1 + id % 5).toInt
          for (f <- 0 until nCues) {
            val start = f * 4000L + (id % 7) * 100
            val end = start + 3500 + ((id + f) % 10) * 200
            if (f % 2 == 0) sb.append(s"c$f\n")
            if (f == 0 && id % 17 == 0)
              sb.append("00:00 --> bogus\n")
            else
              sb.append(s"${fmtFull(start)} --> ${
                if (f % 2 == 1) fmtShort(end) else fmtFull(end)}\n")
            val nl = (1 + (id + f) % 2).toInt
            for (l <- 0 until nl) sb.append(s"caption $id $f $l\n")
            sb.append("\n")
          }
          Row(id, sb.toString)
        }
      }(enc)
  }

  /** Cue-statistics profile over VTT sidecars
    * ([[SubtitleCodec.vttCues]]): cue count, total captioned time,
    * overlapping-cue count (auto-caption signature), payload line
    * count, parse success in-band — the curation facts for a
    * caption corpus. O(len) per document, one string walk.
    */
  def vttCueProfile(assets: DataFrame,
                    textCol: String = "vtt"): DataFrame = {
    val schema = StructType(assets.schema.fields.filterNot(
      _.name == textCol) ++ Seq(
      StructField("n_cues", IntegerType, nullable = true),
      StructField("total_cue_ms", LongType, nullable = true),
      StructField("n_overlaps", IntegerType, nullable = true),
      StructField("n_lines", IntegerType, nullable = true),
      StructField("parsed", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(textCol)
    val keep = assets.schema.fields.indices.filterNot(_ == idx)
    assets.mapPartitions { it =>
      it.map { r =>
        val base = keep.map(r.get)
        SubtitleCodec.vttCues(r.getString(idx)) match {
          case Some(cues) =>
            val overlaps = cues.sliding(2).count {
              case Seq(a, b) => b.startMs < a.endMs
              case _ => false
            }
            Row.fromSeq(base ++ Seq(cues.length,
              cues.map(c => c.endMs - c.startMs).sum,
              overlaps, cues.map(_.nLines).sum, true))
          case None =>
            Row.fromSeq(base ++ Seq(null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** Pixel-duplicate BMP fixture: consecutive id pairs (2k, 2k+1)
    * share dims and pixels (both derived from gid = id − id % 2), and
    * the odd member's ROW-PADDING bytes are stamped with junk — same
    * decoded image, different payload bytes wherever the width has
    * padding (w ∈ {5, 6, 7}). The shape byte-hash dedup (dd1/mm1
    * content_hash) structurally misses and pixel-level perceptual
    * hashing exists to catch: re-encoded / container-noise duplicates.
    */
  def synthBmpPairAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val gid = id - id % 2
          val w = (4 + gid % 5).toInt
          val h = (3 + gid % 4).toInt
          val bmp = ImageCodec.encodeBmp24(w, h, (x, y) => (
            ((gid * 7 + 3 * x + 5 * y) % 256).toInt,
            ((gid * 11 + x + 2 * y) % 256).toInt,
            ((gid * 13 + 2 * x + y) % 256).toInt))
          if (id % 2 == 1) { // stamp junk into the pad bytes, if any
            val rowBytes = (w * 3 + 3) & ~3
            var row = 0
            while (row < h) {
              var p = 3 * w
              while (p < rowBytes) {
                bmp(54 + row * rowBytes + p) = ((id + row + p) % 256).toByte
                p += 1
              }
              row += 1
            }
          }
          Row(id, bmp)
        }
      }(enc)
  }

  /** Paired (caption, image) asset fixture — the CLIP-style corpus
    * shape for CROSS-MODAL composite dedup (mm20). Ids quadruple on
    * g = id − id % 4, and each member twins the group base through a
    * different channel:
    *   - member 0: base caption (keyed by g), base image (pixels keyed
    *     by g);
    *   - member 1: the CAPTION twin — base caption homoglyph-swapped
    *     (byte-different, canonical-equal under `unicode_norm_key`),
    *     image keyed by id (unique);
    *   - member 2: the IMAGE twin — caption keyed by id (unique),
    *     base pixels with junk stamped in the BMP row padding
    *     (byte-different, pixel-identical);
    *   - member 3: the FULL twin — swapped caption AND pad-stamped
    *     base image (both channels vote).
    * Every 7th group paints FLAT images (constant luma → the all-zeros
    * aHash every flat image shares corpus-wide) — the degenerate
    * bucket the composite cap must excise while the caption channel
    * keeps pairing the group.
    */
  def synthCaptionImageAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("caption", StringType, nullable = true),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val swap = Map('a' -> 'а', 'e' -> 'е',
      'o' -> 'о', 'c' -> 'с')
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val g = id - id % 4; val m = id % 4
          val flat = (g / 4) % 7 == 0
          val ig = if (m == 1) id else g // image channel key
          val cg = if (m == 2) id else g // caption channel key
          val w = (4 + ig % 5).toInt
          val h = (3 + ig % 4).toInt
          val bmp =
            if (flat) ImageCodec.encodeBmp24(w, h, (_, _) => (
              ((g * 31) % 200 + 20).toInt, ((g * 17) % 200 + 20).toInt,
              ((g * 13) % 200 + 20).toInt))
            else ImageCodec.encodeBmp24(w, h, (x, y) => (
              ((ig * 7 + 3 * x + 5 * y) % 256).toInt,
              ((ig * 11 + x + 2 * y) % 256).toInt,
              ((ig * 13 + 2 * x + y) % 256).toInt))
          if (m == 2 || m == 3) { // byte-noise in the pad bytes, if any
            val rowBytes = (w * 3 + 3) & ~3
            var row = 0
            while (row < h) {
              var p = 3 * w
              while (p < rowBytes) {
                bmp(54 + row * rowBytes + p) = ((id + row + p) % 256).toByte
                p += 1
              }
              row += 1
            }
          }
          val base = s"caption group $cg alpha case"
          val caption =
            if (m == 1 || m == 3) base.map(ch => swap.getOrElse(ch, ch))
            else base
          Row(id, caption, bmp)
        }
      }(enc)
  }

  /** Average-hash (aHash) perceptual fingerprint over DECODED pixels:
    * luminance (r+g+b) pooled onto the 8×8 block grid
    * (block(x, y) = (y·8/h)·8 + x·8/w), bit b set iff the block's mean
    * exceeds the global mean — compared EXACTLY as
    * blockSum·(w·h) > total·blockN, no division, so the 64-char bit
    * string replays bit-for-bit in any engine (blocks left empty by
    * images narrower than the grid contribute 0 > 0 = unset, same rule
    * both sides). Byte-identical containers obviously collide; the
    * point is that byte-DIFFERENT pixel-identical ones (padding noise,
    * re-encodes) collide too, where `content_hash` dedup misses them.
    * Corrupt payloads yield a null fingerprint, in-band.
    */
  def aHashBits(assets: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields :+
      StructField("ahash_bits", StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.map { r =>
        val bits = ImageCodec.decodeBmp24(r.getAs[Array[Byte]](idx)) match {
          case Some(img) =>
            val w = img.w; val h = img.h
            val blockSum = new Array[Long](64)
            val blockN = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val i = (y * w + x) * 3
                val lum = (img.rgb(i) & 0xff) + (img.rgb(i + 1) & 0xff) +
                  (img.rgb(i + 2) & 0xff)
                // Long math: y*8 / x*8 overflow Int past 2^28-pixel dims
                val b = ((y.toLong * 8 / h) * 8 + x.toLong * 8 / w).toInt
                blockSum(b) += lum; blockN(b) += 1
                total += lum
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            val sb = new java.lang.StringBuilder(64)
            var b = 0
            while (b < 64) {
              sb.append(if (blockSum(b) * n > total * blockN(b)) '1' else '0')
              b += 1
            }
            sb.toString
          case None => null
        }
        Row.fromSeq(r.toSeq :+ bits)
      }
    }(enc)
  }

  /** Deterministic WAV fixture assets — [[synthBmpAssets]]'s audio
    * twin: one real mono 16-bit PCM WAV per id with parametric samples
    * `s_k = (id·31 + k·17) % 65536 − 32768` over `n = 50 + id % 32`
    * samples at `rate = 8000 + (id % 3)·4000` Hz. Every 11th id
    * carries a CORRUPT payload (RIFF magic, truncated body) so the
    * decode-miss path fires in-band. Integer generative parameters →
    * every downstream feature is oracle-computable analytically while
    * the Spark side genuinely walks the RIFF chunks.
    */
  def synthWavAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val n = (50 + id % 32).toInt
          val rate = (8000 + (id % 3) * 4000).toInt
          val samples = Array.tabulate(n)(k =>
            ((id * 31 + k * 17) % 65536 - 32768).toShort)
          val wav = AudioCodec.encodeWavPcm16(rate, samples)
          val payload =
            if (id % 11 == 0) wav.take(20) // truncated: magic ok, body gone
            else wav
          Row(id, payload)
        }
      }(enc)
  }

  /** REAL audio decode over the binary column — the
    * [[decodeImageFeatures]] contract on the second modality: parse
    * each payload as mono 16-bit PCM WAV via [[AudioCodec]] and append
    * exact-integer features (sample count, rate, Σ|amplitude|, peak).
    * Corrupt or non-PCM payloads yield `decoded = false` with null
    * features — in-band, never a task failure. Iterator-to-iterator
    * `mapPartitions`, static kernel, zero per-row setup.
    */
  def decodeAudioFeatures(assets: DataFrame,
                          contentCol: String = "content"): DataFrame = {
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("n_samples", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("max_abs", LongType, nullable = true),
      StructField("decoded", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.map { r =>
        AudioCodec.decodeWavPcm16(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            val (n, sumAbs, maxAbs) = AudioCodec.amplitudeStats(clip)
            Row.fromSeq(r.toSeq ++
              Seq(n, clip.sampleRate, sumAbs, maxAbs, true))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, false))
        }
      }
    }(enc)
  }

  /** Container-noise audio pair fixture: consecutive id pairs
    * (2k, 2k+1) share SAMPLES (from gid = id − id % 2, n = 400 + gid %
    * 32 of them), and the odd member's WAV carries a junk `LIST` chunk
    * spliced between `fmt ` and `data` — the decoder's RIFF walk skips
    * it, so the pair is sample-identical but byte-different: the audio
    * analog of mm12's padding class, which byte-hash dedup misses.
    */
  def synthWavPairAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val gid = id - id % 2
          val n = (400 + gid % 32).toInt
          // step 9973 (co-prime, wraps every ~6.6 samples): window
          // energies vary per gid, so fingerprints are high-entropy —
          // a smooth ramp made every clip share one giant over-cap
          // bucket and the lane verified an EMPTY universe (r12)
          val samples = Array.tabulate(n)(k =>
            ((gid * 31 + k * 9973) % 65536 - 32768).toShort)
          val wav = AudioCodec.encodeWavPcm16(16000, samples)
          val payload = if (id % 2 == 1) {
            // splice an 11-byte LIST chunk (odd size → 1 pad byte)
            val extra = new Array[Byte](8 + 11 + 1)
            extra(0) = 'L'; extra(1) = 'I'; extra(2) = 'S'; extra(3) = 'T'
            extra(4) = 11
            var i = 0
            while (i < 11) { extra(8 + i) = ((id + i) % 256).toByte; i += 1 }
            val spliced = wav.take(36) ++ extra ++ wav.drop(36)
            // keep the RIFF size field spec-valid after the splice
            val riffSize = spliced.length - 8
            i = 0
            while (i < 4) {
              spliced(4 + i) = ((riffSize >>> (8 * i)) & 0xff).toByte; i += 1
            }
            spliced
          } else wav
          Row(id, payload)
        }
      }(enc)
  }

  /** Energy-contour audio fingerprint over DECODED samples — the
    * audio-fingerprinting shape (per-window energy differences) in
    * exact integers: samples group into complete windows of
    * `windowSize`, window energy is Σ s² (Long), and bit w (w ≥ 1) is
    * set iff e_w > e_{w−1} — a variable-length '0'/'1' string that
    * replays bit-for-bit in any engine. Byte-identical clips collide
    * trivially; the point is that container-noise variants (spliced
    * chunks, re-muxed files) decode to the same samples and collide
    * too, where `content_hash` misses them. Corrupt payloads yield a
    * null fingerprint, in-band.
    */
  def audioEnergyFingerprint(assets: DataFrame, windowSize: Int = 8,
                             contentCol: String = "content"): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive: $windowSize")
    val schema = StructType(assets.schema.fields :+
      StructField("energy_bits", StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.map { r =>
        val bits = AudioCodec.decodeWavPcm16(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            val nWin = clip.samples.length / windowSize
            val e = new Array[Long](nWin)
            var w = 0
            while (w < nWin) {
              var s = 0L
              var k = w * windowSize
              val end = k + windowSize
              while (k < end) {
                val v = clip.samples(k).toLong
                s += v * v
                k += 1
              }
              e(w) = s
              w += 1
            }
            val sb = new java.lang.StringBuilder(math.max(0, nWin - 1))
            w = 1
            while (w < nWin) {
              sb.append(if (e(w) > e(w - 1)) '1' else '0')
              w += 1
            }
            sb.toString
          case None => null
        }
        Row.fromSeq(r.toSeq :+ bits)
      }
    }(enc)
  }

  /** Deterministic Y4M fixture assets — the video member of the
    * synth-asset family: one real YUV4MPEG2 clip per id with parametric
    * pixels — dims `w = 4 + id % 3`, `h = 2 + id % 3`,
    * `frames = 3 + id % 5`; luma pixel p of frame f carries
    * `y = (id·3 + f·7 + p) % 256`, chroma sample q (full grid for 444,
    * quarter grid for 420) carries `u = (id·5 + f·11 + q) % 256`,
    * `v = (id·7 + f·13 + q) % 256`. Ids with even dims (id % 3 ≠ 1)
    * encode as C420jpeg, the rest as C444 — BOTH chroma walks run
    * under the oracle, not just the spec. Every 9th id is CORRUPT
    * (last 5 bytes cut — a trailing partial frame, the torn-upload
    * shape).
    */
  def synthY4mAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (4 + id % 3).toInt
          val h = (2 + id % 3).toInt
          val nf = (3 + id % 5).toInt
          def lum(f: Int, p: Int) = ((id * 3 + f * 7 + p) % 256).toInt
          def chrU(f: Int, q: Int) = ((id * 5 + f * 11 + q) % 256).toInt
          def chrV(f: Int, q: Int) = ((id * 7 + f * 13 + q) % 256).toInt
          val clip =
            if (id % 3 != 1) // 4x2 or 6x4: even dims, the 420 regime
              VideoCodec.encodeY4m420(w, h, nf, lum, chrU, chrV)
            else
              VideoCodec.encodeY4m(w, h, nf,
                (f, p) => (lum(f, p), chrU(f, p), chrV(f, p)))
          val payload =
            if (id % 9 == 0) clip.take(clip.length - 5) // torn final frame
            else clip
          Row(id, payload)
        }
      }(enc)
  }

  /** REAL frame sampling over video payloads — mm2's frame-sample PLAN
    * made actual: parse each payload as Y4M via [[VideoCodec]] and emit
    * one row per `stride`-th frame with exact-integer per-plane sums,
    * computed in place on the raw buffer (frames are never copied out —
    * the decode-and-reduce shape a 100-TB video pipeline needs, where
    * materializing every frame would multiply the scan by the frame
    * count). Corrupt payloads emit ONE in-band `decoded = false` row so
    * every asset stays accounted for — the dead-letter discipline.
    */
  def sampleVideoFrames(assets: DataFrame, stride: Int,
                        contentCol: String = "content"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = true),
      StructField("vid_w", IntegerType, nullable = true),
      StructField("vid_h", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sum_y", LongType, nullable = true),
      StructField("sum_u", LongType, nullable = true),
      StructField("sum_v", LongType, nullable = true),
      StructField("decoded", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.flatMap { r =>
        VideoCodec.decodeY4m(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            (0 until clip.nFrames by stride).iterator.map { f =>
              val (sy, su, sv) = clip.planeSums(f)
              Row.fromSeq(r.toSeq ++ Seq(f.toLong, clip.w, clip.h,
                clip.nFrames, sy, su, sv, true))
            }
          case None =>
            Iterator.single(Row.fromSeq(r.toSeq ++
              Seq(null, null, null, null, null, null, null, false)))
        }
      }
    }(enc)
  }

  /** Deterministic Y4M PAIR fixture — the video member of the pair-asset
    * family ([[synthBmpPairAssets]] image, [[synthWavPairAssets]] audio):
    * ids pair on `gid = id − id % 2` with IDENTICAL samples, and the odd
    * member's header chroma tag is rewritten `C420jpeg → C420mpeg2` —
    * the two sitings share the exact byte layout per the Y4M spec
    * ([[VideoCodec]] header), so the payloads are byte-different (the
    * header even changes length) while every decoded sample matches:
    * the re-mux shape `content_hash` dedup structurally misses.
    *
    * Three planted regimes (the mm12/mm13 lesson — a near-dup fixture
    * must make planted pairs, NATURAL cross-gid collisions, and
    * cap-binding degenerate buckets all fire, at any corpus size):
    *   - coarse blocks: when `(gid/8) % 3 == 1` the clip key collapses
    *     to `k = gid − gid % 8`, so 4 consecutive gids (8 ids) share one
    *     clip — natural collision buckets of exactly 8, cap-surviving;
    *   - flat clips: `k % 7 == 0` paints constant luma — every flat clip
    *     fingerprints to the all-zeros string (blank-page reality), one
    *     degenerate bucket that grows with the corpus and always trips
    *     the cap;
    *   - the rest: a per-k gradient whose mod-256 wrap position varies
    *     by k, giving both singleton-pair buckets (planted pairs
    *     survive) and a fat no-wrap bucket (capped).
    * All dims even (C420-compatible) by construction.
    */
  def synthY4mPairAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val gid = id - id % 2
          val k = if ((gid / 8) % 3 == 1) gid - gid % 8 else gid
          val flat = k % 7 == 0
          val w = (4 + 2 * (k % 3)).toInt
          val h = (2 + 2 * (k % 2)).toInt
          val nf = if (flat) 2 else (2 + k % 3).toInt
          // per-clip ODD slope co-prime to 256: an affine p-gradient
          // with a fixed slope only yields ~w·h distinct bit patterns
          // (cyclic shifts of one sequence — every bucket grows with
          // the corpus and the cap starves the lane, measured r13);
          // varying the slope by k % 97 breaks the shift degeneracy
          def lum(f: Int, p: Int) =
            if (flat) (k % 251).toInt
            else ((k * 9973 + f * 101 + (2 * (k % 97) + 37) * p) % 256).toInt
          def chrU(f: Int, q: Int) = ((k * 5 + f * 11 + q) % 256).toInt
          def chrV(f: Int, q: Int) = ((k * 13 + 2 * f + q) % 256).toInt
          val clip = VideoCodec.encodeY4m420(w, h, nf, lum, chrU, chrV)
          val payload = if (id % 2 == 1) {
            // swap the chroma-siting tag: same layout, different bytes
            val head = new String(clip, 0, math.min(clip.length, 64),
              java.nio.charset.StandardCharsets.US_ASCII)
            val at = head.indexOf("C420jpeg")
            require(at >= 0, "fixture clip lost its chroma tag")
            clip.take(at) ++
              "C420mpeg2".getBytes(
                java.nio.charset.StandardCharsets.US_ASCII) ++
              clip.drop(at + 8)
          } else clip
          Row(id, payload)
        }
      }(enc)
  }

  /** Per-sampled-frame perceptual video fingerprint — [[aHashBits]]'s
    * 8×8 block rule applied to each `stride`-th frame's LUMA plane in
    * place on the decoded buffer (no frame copies — the
    * [[sampleVideoFrames]] walk), with the same exact cross-multiplied
    * mean comparison (`blockSum·(w·h) > total·blockN`, no division), so
    * each frame yields 64 bits and the clip fingerprint is their
    * concatenation in frame order — a '0'/'1' string any engine replays
    * bit-for-bit. Byte-different re-muxes of the same samples (chroma
    * siting tags, rewrapped headers) collide; corrupt payloads yield a
    * null fingerprint, in-band.
    */
  def videoAHashFingerprint(assets: DataFrame, stride: Int = 2,
                            contentCol: String = "content"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val schema = StructType(assets.schema.fields :+
      StructField("vhash_bits", StringType, nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.map { r =>
        val bits = VideoCodec.decodeY4m(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            val w = clip.w; val h = clip.h
            val n = w.toLong * h
            val sampled = (clip.nFrames + stride - 1) / stride
            val sb = new java.lang.StringBuilder(64 * sampled)
            var f = 0
            while (f < clip.nFrames) {
              val base = clip.frameOffsets(f)
              val blockSum = new Array[Long](64)
              val blockN = new Array[Long](64)
              var total = 0L
              var y = 0
              while (y < h) {
                var x = 0
                val rowBase = base + y * w
                // Long math on the block index (the aHashBits r12 rule)
                val by = (y.toLong * 8 / h) * 8
                while (x < w) {
                  val lum = clip.data(rowBase + x) & 0xff
                  val b = (by + x.toLong * 8 / w).toInt
                  blockSum(b) += lum; blockN(b) += 1
                  total += lum
                  x += 1
                }
                y += 1
              }
              var b = 0
              while (b < 64) {
                sb.append(if (blockSum(b) * n > total * blockN(b)) '1'
                          else '0')
                b += 1
              }
              f += stride
            }
            sb.toString
          case None => null
        }
        Row.fromSeq(r.toSeq :+ bits)
      }
    }(enc)
  }

  /** Triplet WAV fixture for SEGMENT-LEVEL audio containment (mm17) —
    * [[synthY4mTrimAssets]]'s design on the audio axis: ids group in
    * threes on `bs = id − id % 3`, all sampling one sample stream
    * indexed by GLOBAL sample position —
    *   - member 0: global windows 0..23 (three 8-window segments);
    *   - member 1: global windows 8..31 — an offset re-cut sharing two
    *     aligned segments with member 0 (different clip, different
    *     whole-clip fingerprint, shared audio);
    *   - member 2: member 0's samples behind a spliced LIST chunk
    *     (byte-different, sample-identical — shares all three).
    * Coarse groups: when `(q/2) % 5 == 1` two consecutive triplets
    * share one stream (6 clips — natural cross-triplet collisions that
    * stay under the cap). Flat triplets (`qk % 7 == 0`) are silence:
    * every segment of every flat clip keys identically — the one
    * degenerate bucket that grows with the corpus and trips the cap.
    */
  def synthWavTrimAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bs = id - id % 3
          val m = id % 3
          val q = bs / 3
          val qk = if ((q / 2) % 5 == 1) q - q % 2 else q
          val flat = qk % 7 == 0
          val off = if (m == 1) 64 else 0 // 8 windows × 8 samples
          val samples = Array.tabulate(192) { i =>
            if (flat) 0.toShort
            else ((qk * 9973 + (off + i) * 5741) % 65536 - 32768).toShort
          }
          val wav = AudioCodec.encodeWavPcm16(16000, samples)
          val payload = if (m == 2) {
            val extra = new Array[Byte](8 + 11 + 1)
            extra(0) = 'L'; extra(1) = 'I'; extra(2) = 'S'; extra(3) = 'T'
            extra(4) = 11
            var i = 0
            while (i < 11) { extra(8 + i) = ((id + i) % 256).toByte; i += 1 }
            val spliced = wav.take(36) ++ extra ++ wav.drop(36)
            val riffSize = spliced.length - 8
            i = 0
            while (i < 4) {
              spliced(4 + i) = ((riffSize >>> (8 * i)) & 0xff).toByte; i += 1
            }
            spliced
          } else wav
          Row(id, payload)
        }
      }(enc)
  }

  /** Per-segment exact-energy keys as ROWS — the audio analog of
    * [[videoFrameHashes]]: samples group into `windowSize`-sample
    * windows (energy = Σ s², Long), `segmentWindows` consecutive
    * complete windows form a segment, and each segment emits its
    * energies as a canonical '|'-joined key — exact integers, so the
    * key replays bit-for-bit in any engine and trimmed/offset re-cuts
    * whose cut points align on segment boundaries share segment keys
    * even though clip-level fingerprints differ. Corrupt payloads emit
    * ONE in-band null-key row.
    */
  def audioSegmentKeys(assets: DataFrame, windowSize: Int = 8,
                       segmentWindows: Int = 8,
                       contentCol: String = "content"): DataFrame = {
    require(windowSize > 0 && segmentWindows > 0,
      s"bad segmenting: $windowSize x $segmentWindows")
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("seg_idx", LongType, nullable = true),
      StructField("seg_key", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.flatMap { r =>
        AudioCodec.decodeWavPcm16(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            val segSamples = windowSize * segmentWindows
            val nSeg = clip.samples.length / segSamples
            (0 until nSeg).iterator.map { si =>
              val sb = new java.lang.StringBuilder(segmentWindows * 12)
              var w = 0
              while (w < segmentWindows) {
                var e = 0L
                var j = 0
                val base = si * segSamples + w * windowSize
                while (j < windowSize) {
                  val s = clip.samples(base + j).toLong
                  e += s * s
                  j += 1
                }
                if (w > 0) sb.append('|')
                sb.append(e)
                w += 1
              }
              Row.fromSeq(r.toSeq ++ Seq(si.toLong, sb.toString))
            }
          case None =>
            Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null)))
        }
      }
    }(enc)
  }

  /** Triplet Y4M fixture for FRAME-LEVEL containment (mm16): ids group
    * in threes on `bs = id − id % 3`, all sampling one luma stream
    * indexed by GLOBAL time t —
    *   - member 0: frames t = 0..3;
    *   - member 1: frames t = 2..5 — a TRIMMED/offset re-cut sharing
    *     exactly two frames with member 0 (the shape a whole-clip
    *     fingerprint like [[videoAHashFingerprint]] structurally
    *     misses: different frame sets, different concatenated bits);
    *   - member 2: member 0's samples under the swapped chroma-siting
    *     tag (byte-different, frame-identical — shares all four).
    * Flat triplets (`(bs/3) % 7 == 0`) paint constant luma: every
    * frame of every flat clip hashes to the all-zeros pattern, one
    * degenerate bucket that grows with the corpus and always trips the
    * per-hash cap. The non-flat luma varies its gradient slope per
    * triplet (the mm14 lesson — a fixed affine slope collapses the
    * hash space and the cap starves the lane at scale).
    */
  def synthY4mTrimAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bs = id - id % 3
          val m = id % 3
          val q = bs / 3
          val flat = q % 7 == 0
          val w = (4 + 2 * (q % 3)).toInt
          val h = (2 + 2 * (q % 2)).toInt
          val f0 = if (m == 1) 2 else 0
          def lum(f: Int, p: Int) = {
            val t = f + f0
            if (flat) (q * 31 % 251).toInt
            else ((bs * 9973 + t * 101 + (2 * (q % 97) + 37) * p) % 256).toInt
          }
          def chrU(f: Int, q2: Int) = ((bs * 5 + (f + f0) * 11 + q2) % 256).toInt
          def chrV(f: Int, q2: Int) = ((bs * 13 + 2 * (f + f0) + q2) % 256).toInt
          val clip = VideoCodec.encodeY4m420(w, h, 4, lum, chrU, chrV)
          val payload = if (m == 2) {
            val head = new String(clip, 0, math.min(clip.length, 64),
              java.nio.charset.StandardCharsets.US_ASCII)
            val at = head.indexOf("C420jpeg")
            require(at >= 0, "fixture clip lost its chroma tag")
            clip.take(at) ++
              "C420mpeg2".getBytes(
                java.nio.charset.StandardCharsets.US_ASCII) ++
              clip.drop(at + 8)
          } else clip
          Row(id, payload)
        }
      }(enc)
  }

  /** Per-frame Y-plane aHash as ROWS — [[videoAHashFingerprint]]'s
    * walk, but each sampled frame emits its own (frame_idx, fhash) row
    * instead of concatenating into a clip string, so frame hashes can
    * JOIN across clips: trimmed re-cuts, offset clips, and spliced
    * compilations share individual frames even when the clip-level
    * fingerprints differ. Corrupt payloads emit ONE in-band null-hash
    * row (every asset stays accounted for — the dead-letter
    * discipline).
    */
  def videoFrameHashes(assets: DataFrame, stride: Int = 1,
                       contentCol: String = "content"): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("frame_idx", LongType, nullable = true),
      StructField("fhash", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    assets.mapPartitions { it =>
      it.flatMap { r =>
        VideoCodec.decodeY4m(r.getAs[Array[Byte]](idx)) match {
          case Some(clip) =>
            val w = clip.w; val h = clip.h
            val n = w.toLong * h
            (0 until clip.nFrames by stride).iterator.map { f =>
              val base = clip.frameOffsets(f)
              val blockSum = new Array[Long](64)
              val blockN = new Array[Long](64)
              var total = 0L
              var y = 0
              while (y < h) {
                var x = 0
                val rowBase = base + y * w
                val by = (y.toLong * 8 / h) * 8
                while (x < w) {
                  val lum = clip.data(rowBase + x) & 0xff
                  val b = (by + x.toLong * 8 / w).toInt
                  blockSum(b) += lum; blockN(b) += 1
                  total += lum
                  x += 1
                }
                y += 1
              }
              val sb = new java.lang.StringBuilder(64)
              var b = 0
              while (b < 64) {
                sb.append(if (blockSum(b) * n > total * blockN(b)) '1'
                          else '0')
                b += 1
              }
              Row.fromSeq(r.toSeq ++ Seq(f.toLong, sb.toString))
            }
          case None =>
            Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null)))
        }
      }
    }(enc)
  }

  /** Triplet BINARY fixture for content-defined-chunk dedup (mm18):
    * ids group in threes on `bs = id − id % 3` over one analytic byte
    * stream —
    *   - member 0: 768 bytes;
    *   - member 1: member 0 with 11 junk bytes INSERTED at offset 320
    *     — the transform a fixed-stride gram pipeline (mm7)
    *     structurally cannot absorb: every gram downstream of the
    *     insertion shifts, while content-defined boundaries resync a
    *     window later and every chunk outside the splice region keeps
    *     its key;
    *   - member 2: member 0 truncated to 512 bytes — prefix chunks
    *     shared, the tail chunk honestly different.
    * Coarse groups ((q/2) % 5 == 1: two triplets share the stream)
    * give cap-safe natural cross-triplet collisions; flat triplets
    * (qk % 7 == 0, all-zero bytes) chunk into identical minimum-size
    * pieces — the degenerate bucket that grows with the corpus and
    * trips the cap. The byte formula reduces mod 65537 BEFORE the
    * byte cast: a plain mod-256 affine clones the payload every 256
    * triplets and the cap starves the lane at sf0.1 (the mm14 lesson,
    * measured again here).
    */
  def synthBinaryTrimAssets(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long").as("asset_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bs = id - id % 3
          val m = id % 3
          val q = bs / 3
          val qk = if ((q / 2) % 5 == 1) q - q % 2 else q
          val flat = qk % 7 == 0
          def g(i: Int): Byte =
            if (flat) 0
            else (((qk * 9973 + i.toLong * 5741) % 65537) % 256).toByte
          val payload = m match {
            case 1 =>
              val out = new Array[Byte](779)
              var i = 0
              while (i < 320) { out(i) = g(i); i += 1 }
              var t = 0
              while (t < 11) {
                out(320 + t) = (((qk * 7 + t) % 65537) % 256).toByte
                t += 1
              }
              i = 320
              while (i < 768) { out(i + 11) = g(i); i += 1 }
              out
            case 2 => Array.tabulate[Byte](512)(g)
            case _ => Array.tabulate[Byte](768)(g)
          }
          Row(id, payload)
        }
      }(enc)
  }

  /** Content-defined chunk keys as ROWS — FastCDC-style dedup for
    * opaque binary payloads: a Rabin rolling hash (the
    * [[graft.functions.RollingHash]] B/M family) walks the bytes, a
    * boundary cuts after any full window whose hash masks to zero once
    * the chunk reaches `minChunk` (forced at `maxChunk`, tail
    * remainder kept), and each chunk emits a content-addressed key —
    * md5 over the chunk's UPPER-CASE hex encoding, the exact string
    * any engine can rebuild, so the oracle replays boundaries AND keys
    * bit-for-bit. Because boundaries depend only on local content,
    * an insertion shifts every downstream byte but the cut points
    * resync within a window — chunks outside the splice keep their
    * keys, which is the whole point versus fixed-stride grams
    * ([[binaryNearDupPairs]] documents that trade from the other
    * side). Null/empty payloads emit ONE in-band null-key row.
    */
  def cdcChunkKeys(assets: DataFrame, window: Int = 8, maskBits: Int = 6,
                   minChunk: Int = 32, maxChunk: Int = 128,
                   contentCol: String = "content"): DataFrame = {
    require(window > 0 && maskBits > 0 && minChunk >= window &&
      maxChunk > minChunk, "bad chunking parameters")
    val schema = StructType(assets.schema.fields ++ Seq(
      StructField("chunk_idx", LongType, nullable = true),
      StructField("chunk_key", StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = assets.schema.fieldIndex(contentCol)
    val (bConst, mConst) = (graft.functions.RollingHash.B,
      graft.functions.RollingHash.M)
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hexU = "0123456789ABCDEF".toCharArray
      val hexL = "0123456789abcdef".toCharArray
      def chunkKey(b: Array[Byte], s: Int, e: Int): String = {
        md.reset()
        val hex = new Array[Byte](2 * (e - s))
        var i = s
        var j = 0
        while (i < e) {
          hex(j) = hexU((b(i) >> 4) & 0xf).toByte
          hex(j + 1) = hexU(b(i) & 0xf).toByte
          i += 1; j += 2
        }
        val d = md.digest(hex)
        val out = new Array[Char](32)
        var k = 0
        while (k < 16) {
          out(2 * k) = hexL((d(k) >> 4) & 0xf)
          out(2 * k + 1) = hexL(d(k) & 0xf)
          k += 1
        }
        new String(out)
      }
      var bw = 1L
      var t = 0
      while (t < window) { bw = bw * bConst % mConst; t += 1 }
      val mask = (1L << maskBits) - 1
      it.flatMap { r =>
        val b = r.getAs[Array[Byte]](idx)
        if (b == null || b.isEmpty)
          Iterator.single(Row.fromSeq(r.toSeq ++ Seq(null, null)))
        else {
          val cuts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var start = 0
          var h = 0L
          var i = 0
          while (i < b.length) {
            h = (h * bConst + (b(i) & 0xffL)) % mConst
            if (i - start >= window) {
              h = (h - (b(i - window) & 0xffL) * bw % mConst) % mConst
              if (h < 0) h += mConst
            }
            val clen = i - start + 1
            if ((clen >= minChunk && clen >= window && (h & mask) == 0L)
                || clen >= maxChunk) {
              cuts += ((start, i + 1)); start = i + 1; h = 0L
            }
            i += 1
          }
          if (start < b.length) cuts += ((start, b.length))
          cuts.iterator.zipWithIndex.map { case ((s, e), ci) =>
            Row.fromSeq(r.toSeq ++ Seq(ci.toLong, chunkKey(b, s, e)))
          }
        }
      }
    }(enc)
  }

  /** Near-duplicate candidate pairs over OPAQUE binary payloads: strided
    * byte k-grams → MinHash signature → LSH band self-join — the dd2
    * pipeline with byte-range shingles instead of word shingles, so it
    * needs no decode, no text assumption, no codec: re-encoded copies,
    * truncated uploads and watermarked variants of the same asset share
    * most byte windows and collide in a band. Grams stride every
    * `strideBytes` (cost ∝ n_bytes/stride per asset; for
    * insertion-robust chunking use dd8's rolling-hash content-defined
    * boundaries instead — a fixed stride shifts every downstream gram
    * on a single inserted byte, the documented trade). Hash arithmetic
    * is the shared [[DedupOps]] md5-affine family, so any engine
    * replays signatures over the same bytes; the band join is the
    * spill-safe merge-hinted shape minhashCandidates documents.
    *
    * Plan shape: gram hashes EXPLODE to rows once and the 16 per-perm
    * minima ride one aggregate — the staged HOF form (array column →
    * 16 array_mins → 4 band slices) re-inlines the whole gram pipeline
    * into every consumer (CollapseProject) and measured 36.6 s vs
    * 1.3 s for this shape at sf0.1; dd2 solves the same blowup with a
    * fused native Generator, this byte variant solves it relationally
    * (one extra keyed shuffle, which the text path's Generator avoids
    * — the documented trade for not writing a second native kernel).
    */
  def binaryNearDupPairs(assets: DataFrame, idCol: String = "asset_id",
                         contentCol: String = "content",
                         gramBytes: Int = 16, strideBytes: Int = 4,
                         numPerm: Int = 16, bands: Int = 4): DataFrame = {
    require(numPerm % bands == 0, s"bands $bands must divide numPerm $numPerm")
    val rowsPerBand = numPerm / bands
    val n = octet_length(col(contentCol)).cast("long")
    val hashes = array_distinct(transform(
      sequence(lit(1L), greatest(n - gramBytes + 1, lit(1L)),
        lit(strideBytes.toLong)),
      p => conv(substring(md5(col(contentCol)
          .substr(p.cast("int"), lit(gramBytes))), 1, 15), 16, 10)
        .cast("long") % DedupOps.MinhashP))
    val grams = assets
      .filter(col(contentCol).isNotNull && n > 0)
      .select(col(idCol).as("_id"), explode(hashes).as("_x"))
    val perms = (0 until numPerm).map(i =>
      min((lit(DedupOps.minhashA(i)) * col("_x") +
        lit(DedupOps.minhashB(i))) % DedupOps.MinhashP).as(s"_m$i"))
    val sig = grams.groupBy("_id").agg(perms.head, perms.tail: _*)
    val bandArr = array((0 until bands).map { b =>
      md5(concat_ws("|", (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"_m$i").cast("string")): _*))
    }: _*)
    val banded = sig
      .select(col("_id"), posexplode(bandArr).as(Seq("_band", "_bh")))
    val l = banded.hint("merge").as("l")
    val r = banded.hint("merge").as("r")
    l.join(r, col("l._band") === col("r._band") &&
        col("l._bh") === col("r._bh") && col("l._id") < col("r._id"))
      .select(col("l._id").as("a"), col("r._id").as("b"))
      .distinct()
  }

  /** Df-capped fingerprint pair formation — the shared scale shape of
    * every mm pair lane (mm12/13/14 whole-asset fingerprints,
    * mm16/17/18 per-frame/segment/chunk keys): group ids by the exact
    * fingerprint into a size-capped posting list, DROP buckets larger
    * than `cap` (a fingerprint shared by more than `cap` assets is a
    * DEGENERATE pattern — flat frames, silence, all-zero payloads —
    * not a duplicate cluster), pair map-side within each surviving
    * list. Output `(a, b, keyCol)` with `a < b`, one row per shared
    * fingerprint.
    *
    * Why not `count(*) OVER (PARTITION BY key)` + filter: `WindowExec`
    * colocates EVERY row of a key in one task before the filter can
    * drop it, and the hot key is precisely the degenerate bucket the
    * cap exists to excise — at corpus scale that is an O(#flat assets)
    * single-task sort. Here [[graft.functions.BoundedCollect]] caps
    * each partial buffer at `cap + 1` (just enough for the size filter
    * to see "too big"), so the hot key crosses the exchange as a
    * handful of O(cap) partial rows and pairs form by exploding within
    * posting lists — the dd12 discipline
    * ([[graft.operators.DedupOps.containmentPairs]]), which also
    * deletes the pair self-join the window form needed. A truncated
    * list is by construction exactly `cap + 1` long, so exactly the
    * over-frequent buckets drop, independent of which ids survived
    * truncation — result-identical to the window form (which the
    * oracle replays) for inputs with one row per (id, key).
    *
    * Null keys are excluded (the window form's equi join dropped them
    * implicitly; the groupBy form would otherwise pair the null
    * bucket). PlanShapeSpec pins WindowExec out of every mm pair plan.
    */
  def cappedFingerprintPairs(fp: DataFrame, idCol: String, keyCol: String,
                             cap: Int = 8): DataFrame = {
    val postings = fp
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(graft.functions.BoundedCollect
        .boundedCollectList(col(idCol), cap + 1).as("_ids"))
      .filter(size(col("_ids")) <= cap)
    postings
      .select(col(keyCol), explode(col("_ids")).as("a"), col("_ids"))
      .select(col(keyCol), col("a"), explode(col("_ids")).as("b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col(keyCol))
  }

  /** The containment-vote composition of [[cappedFingerprintPairs]]
    * (mm16/17/18): count distinct shared fingerprints per asset pair,
    * keep pairs with at least `minShared` votes. Input must already be
    * distinct per (id, key) — the lanes dedupe within asset first, so
    * the vote counts distinct shared keys. */
  def cappedContainmentVotes(fp: DataFrame, idCol: String, keyCol: String,
                             cap: Int = 8, minShared: Int = 2): DataFrame =
    cappedFingerprintPairs(fp, idCol, keyCol, cap)
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)

  /** Distinct (asset_id, fhash) rows of a clip corpus — the posting
    * unit of the persisted frame-hash index and the input shape of
    * [[cappedContainmentVotes]]. */
  def distinctFrameHashes(assets: DataFrame, stride: Int = 1): DataFrame =
    videoFrameHashes(assets, stride)
      .filter(col("fhash").isNotNull)
      .select(col("asset_id"), col("fhash")).distinct()

  private def postingBucket(keyCol: String, buckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(buckets.toLong)).as("_bkt")

  /** Bucket-count metadata persisted beside a posting index (the sp7
    * `_GRAFT_GRID` discipline): append and probe read the geometry
    * from the artifact, so a bucket mismatch — which would mis-route
    * appends or prune wrong partitions — fails loudly instead of
    * silently corrupting. Indexes built before this metadata existed
    * read as `None`; callers then skip partition pruning (correct,
    * just unpruned). */
  private val PostingMetaName = "_GRAFT_POSTING"

  private def writePostingMeta(dir: String, buckets: Int): Unit =
    SidecarIO.write(dir, PostingMetaName, s"buckets=$buckets\n")

  private def readPostingMeta(dir: String): Option[Int] = {
    if (!SidecarIO.exists(dir, PostingMetaName)) None
    else Some(SidecarIO.read(dir, PostingMetaName).linesIterator
      .find(_.startsWith("buckets=")).map(_.drop("buckets=".length).trim.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"malformed $PostingMetaName at $dir")))
  }

  /** Persist a corpus' fingerprint postings for INCREMENTAL
    * containment detection — the dd10/ss18 discipline generalized to
    * ANY (id, fingerprint) modality (video frame hashes, audio segment
    * keys, CDC chunk keys): the expensive part of every ingest
    * (decoding and fingerprinting the EXISTING corpus) is paid once
    * and written down, hive-partitioned by a bounded hash bucket of
    * the fingerprint (the fingerprint itself is too high-cardinality
    * for a directory key), files clustered by the fingerprint so
    * parquet min/max stats prune ranges within each bucket. New
    * batches append theirs via [[postingIndexAppend]]; periodic
    * `Compaction.compact` keeps file counts bounded. Input must be
    * distinct (id, key) rows.
    */
  def postingIndexBuild(fp: DataFrame, dir: String, idCol: String,
                        keyCol: String, buckets: Int = 32): Unit = {
    graft.sources.Compaction.writePartitioned(
      fp.select(col(idCol), col(keyCol), postingBucket(keyCol, buckets)),
      dir, Seq("_bkt"), clusterBy = Seq(keyCol))
    writePostingMeta(dir, buckets)
  }

  /** Append a new batch's postings, preserving the build's layout
    * invariant (repartitioned on the bucket, files clustered by the
    * fingerprint) — an unshaped append would write tasks × buckets
    * sliver files with useless min/max stats until the next
    * compaction. `buckets` MUST match the build's. */
  def postingIndexAppend(fp: DataFrame, dir: String, idCol: String,
                         keyCol: String, buckets: Int = 32,
                         maxRecordsPerFile: Long = 1000000L): Unit = {
    readPostingMeta(dir).foreach(b => require(b == buckets,
      s"posting index at $dir was built with buckets=$b, append asked " +
        s"for $buckets — a mismatch would mis-route every posting"))
    fp.select(col(idCol), col(keyCol), postingBucket(keyCol, buckets))
      .repartition(col("_bkt"))
      .sortWithinPartitions(col("_bkt"), col(keyCol))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("_bkt").parquet(dir)
  }

  /** Logical DELETE from a posting index (takedown / right-to-erasure
    * — the operational reality of media corpora): asset ids land in an
    * append-only tombstone table under `_tombstones` (the leading
    * underscore hides it from the hive-partition discovery of the
    * posting read, the `_SUCCESS` convention), and
    * [[postingContainmentIncremental]] masks them with a broadcast
    * anti-join — the bucket layout is immutable between
    * [[postingIndexVacuum]]s, so deletes never rewrite data files
    * (the ss22 / merge-on-read discipline). A deleted id can still
    * appear in a NEW batch: deletion removes an asset from the banked
    * corpus, not from the world. */
  def postingIndexDelete(ids: DataFrame, dir: String,
                         idCol: String): Unit =
    ids.select(col(idCol)).distinct()
      .coalesce(1) // tombstone batches are id-lists, not data
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$dir/_tombstones")

  private def postingTombstones(spark: org.apache.spark.sql.SparkSession, dir: String,
                                idCol: String,
                                immutable: Boolean = false)
      : Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/_tombstones")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      Some((if (immutable) graft.Tables.immutablePath(spark, path.toString)
            else spark.read.parquet(path.toString))
        .select(col(idCol)).distinct())
    else None
  }

  /** Physical reclamation: rewrite ONLY the bucket directories that
    * hold a tombstoned asset's postings, then drop the tombstone
    * table. Unlike ss22's whole-layout vacuum, an asset's postings
    * spread over at most `buckets` directories and usually far fewer,
    * so the affected set (a ≤-buckets-value collect from a semi-join,
    * bounded) is the entire rewrite. A bucket whose every row is
    * tombstoned is deleted outright (a dynamic partition overwrite
    * cannot emit an EMPTY partition, which would strand the stale
    * rows). Probe results are identical before and after by
    * construction — the anti-join was already masking these rows.
    *
    * Crash safety — STAGED swap, never delete-then-rewrite-from-memory:
    * the surviving rows are written to `_vacuum_tmp` on the SAME
    * filesystem first (hidden from partition discovery like
    * `_tombstones`), a commit marker lands after the last staged byte,
    * and only then are affected buckets deleted and the staged dirs
    * renamed in. Every interruption point is recoverable: before the
    * marker, the old buckets and the tombstone table are intact (the
    * next vacuum discards the torn stage and re-runs); after the
    * marker, [[finishVacuumSwap]] is idempotent (a staged dir still
    * present has not been renamed yet, so delete-dst-then-rename
    * resumes exactly where the crash hit) and runs first on the next
    * vacuum. At no point do live postings exist only in this app's
    * memory — unlike `Compaction.compactInPlace`, the source bytes
    * here cannot be re-derived.
    */
  def postingIndexVacuum(spark: org.apache.spark.sql.SparkSession, dir: String, idCol: String,
                         keyCol: String): Unit = {
    finishVacuumSwap(spark, dir) // heal an interrupted swap first
    postingTombstones(spark, dir, idCol).foreach { ts =>
      val idx = spark.read.parquet(dir)
      val affected = idx.join(broadcast(ts), Seq(idCol), "left_semi")
        .select(col("_bkt")).distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by bucket count
      if (affected.nonEmpty) {
        stageVacuumSwap(spark, dir, idCol, keyCol, ts, affected)
        finishVacuumSwap(spark, dir)
      }
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_tombstones"), true)
    }
  }

  private val VacuumTmp = "_vacuum_tmp"
  private val VacuumReady = "_GRAFT_SWAP_READY"
  private val VacuumEmptyList = "_empty_buckets"

  /** Stage the affected buckets' SURVIVING rows under `_vacuum_tmp`,
    * record which affected buckets stage no survivors (fully
    * tombstoned — they must be deleted outright, and the distinction
    * matters during recovery: a bucket absent from the stage is either
    * fully tombstoned or already renamed in, and only the former may
    * be deleted), then drop the commit marker. The marker is the
    * atomic commit point of the whole vacuum. */
  private[operators] def stageVacuumSwap(spark: org.apache.spark.sql.SparkSession,
      dir: String, idCol: String, keyCol: String,
      ts: DataFrame, affected: Seq[Int]): Unit = {
    val tmp = s"$dir/$VacuumTmp"
    spark.read.parquet(dir)
      .filter(col("_bkt").isin(affected: _*))
      .join(broadcast(ts), Seq(idCol), "left_anti")
      .select(col(idCol), col(keyCol), col("_bkt"))
      .repartition(col("_bkt"))
      .sortWithinPartitions(col("_bkt"), col(keyCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("_bkt").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath.getName).filter(_.startsWith("_bkt="))
      .map(_.stripPrefix("_bkt=").toInt).toSet
    val emptyOut = fs.create(
      new org.apache.hadoop.fs.Path(tmp, VacuumEmptyList), true)
    emptyOut.write(affected.filterNot(staged).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    emptyOut.close()
    fs.create(new org.apache.hadoop.fs.Path(tmp, VacuumReady), true)
      .close()
  }

  /** Complete (or discard) a staged vacuum swap; idempotent, called
    * first by every [[postingIndexVacuum]] so a crashed swap
    * self-heals on the next run. No marker → the stage never
    * committed, the live index and tombstones are untouched: discard.
    * Marker present → delete the fully-tombstoned buckets, then for
    * each staged dir delete the (old) destination and rename in —
    * a staged dir's presence proves its rename has not happened. */
  private[operators] def finishVacuumSwap(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, VacuumTmp)
    if (!fs.exists(tmp)) return
    if (!fs.exists(new org.apache.hadoop.fs.Path(tmp, VacuumReady))) {
      fs.delete(tmp, true); return
    }
    // A crash between deleting _empty_buckets and removing the marker
    // would otherwise wedge every later vacuum on FileNotFound; by that
    // point all staged dirs have been renamed out, so absence ≡ empty.
    val emptyP = new org.apache.hadoop.fs.Path(tmp, VacuumEmptyList)
    val emptyB = if (!fs.exists(emptyP)) Nil else {
      val in = fs.open(emptyP)
      try scala.io.Source.fromInputStream(in).getLines()
        .filter(_.nonEmpty).toList finally in.close()
    }
    emptyB.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"_bkt=$b"), true)
    }
    fs.listStatus(tmp).filter(_.getPath.getName.startsWith("_bkt="))
      .foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(dir, st.getPath.getName)
        fs.delete(dst, true)
        fs.rename(st.getPath, dst)
      }
    fs.delete(tmp, true)
  }

  /** Containment of a NEW batch's fingerprints against the persisted
    * index: ONLY the batch was decoded (the corpus' fingerprints read
    * back from the index), the index scan is bloom-reduced by the
    * batch's fingerprint set before anything joins, and the capped
    * vote runs over the merged postings. Output = exactly the
    * full-rebuild vote pairs that involve at least one batch asset:
    * for any key a batch asset carries, the bloom passes the ENTIRE
    * index bucket, so both the degenerate-bucket cap and the vote
    * count see the same posting set a rebuild would — append ≡ rebuild
    * by construction (mm21/mm22 hash-gate it). Bloom false positives
    * admit index-only buckets whose pairs the batch-membership filter
    * drops; they cost scan rows (~fpp of the index), never
    * correctness. `expectedKeys` sizes the bloom (overestimate only
    * costs bits); `batchFp` must be distinct (id, key) rows.
    */
  def postingContainmentIncremental(batchFp: DataFrame, dir: String,
                                    idCol: String, keyCol: String,
                                    expectedKeys: Long, cap: Int = 8,
                                    minShared: Int = 2,
                                    immutable: Boolean = false)
      : DataFrame = {
    // immutable = true routes the index reads through the per-session
    // resolved-relation memo (Tables.immutablePath) — ONLY for callers
    // whose dir is a marker-gated fixture never rewritten in-process
    // (the mm21/22/23/28 lanes); anything that appends/deletes/vacuums
    // between probes keeps the direct read (r18 verdict item 5)
    def readIdx(path: String): DataFrame =
      if (immutable) graft.Tables.immutablePath(batchFp.sparkSession, path)
      else batchFp.sparkSession.read.parquet(path)
    val spark = batchFp.sparkSession
    // no persist of the batch side: a cached plan would leak a
    // CacheManager entry per ingest in the steady-state loop, and the
    // batch is small by premise (the dd10 trade) — it evaluates twice
    // (bloom build + merge)
    val bloom = BloomJoin.buildBloom(batchFp, col(keyCol),
      math.max(expectedKeys, 1L))
    // directory-level pruning ahead of the row-level bloom — but ONLY
    // for small batches: fingerprint keys are hash-uniform (no
    // locality to preserve, unlike sp7's spatial tiles), so a batch
    // beyond a few dozen distinct keys saturates the bucket set and
    // the extra batchFp evaluation (a DECODE pass, the expensive part)
    // would buy an all-pass filter. Below 2×buckets expected keys the
    // expected coverage is ≲ 60 % and whole hive partitions drop; the
    // collect is ≤ buckets values, bounded. Pre-metadata indexes read
    // unpruned — correct, just wider.
    val pruned = readPostingMeta(dir) match {
      case Some(b) if expectedKeys <= 2L * b =>
        val bkts = batchFp
          .select(pmod(xxhash64(col(keyCol)), lit(b.toLong)).as("_bkt"))
          .distinct().collect().map(_.getLong(0)).toSeq
        readIdx(dir).filter(col("_bkt").isin(bkts: _*))
      case _ => readIdx(dir)
    }
    val unmasked = pruned
      .filter(BloomJoin.mightContain(bloom, col(keyCol)))
      .select(col(idCol), col(keyCol))
    // tombstone mask BEFORE the capped vote: the df cap must count the
    // post-delete posting set, exactly what a fresh rebuild without
    // the deleted assets would see (mm28 hash-gates delete ≡ rebuild).
    // Broadcast anti-join — the tombstone set is an id list bounded by
    // vacuum cadence, the ss22 trade.
    val index = postingTombstones(spark, dir, idCol, immutable) match {
      case Some(ts) => unmasked.join(broadcast(ts), Seq(idCol), "left_anti")
      case None => unmasked
    }
    val merged = batchFp.select(col(idCol), col(keyCol)).unionByName(index)
    val votes = cappedContainmentVotes(merged, idCol, keyCol,
      cap, minShared)
    // keep pairs involving >=1 batch asset — ONE consumer chain of two
    // broadcast marker joins (batch ids are small by premise), not two
    // semi-join branches that would evaluate the vote aggregate twice
    val bids = batchFp.select(col(idCol)).distinct()
    votes
      .join(broadcast(bids.select(col(idCol).as("a"),
        lit(true).as("_na"))), Seq("a"), "left")
      .join(broadcast(bids.select(col(idCol).as("b"),
        lit(true).as("_nb"))), Seq("b"), "left")
      .filter(col("_na").isNotNull || col("_nb").isNotNull)
      .select(col("a"), col("b"), col("shared"))
  }

  /** Distinct (asset_id, skey) rows of an audio corpus — the posting
    * unit of the segment-key index (mm17's fingerprint, md5-keyed so
    * the exchange carries 32-char digests instead of the '|'-joined
    * energy string). */
  def distinctSegmentKeys(assets: DataFrame): DataFrame =
    audioSegmentKeys(assets)
      .filter(col("seg_key").isNotNull)
      .select(col("asset_id"), md5(col("seg_key")).as("skey")).distinct()

  /** Distinct (asset_id, chunk_key) rows of a binary corpus — the
    * posting unit of the CDC-chunk index (mm18's content-addressed
    * fingerprint). */
  def distinctChunkKeys(assets: DataFrame): DataFrame =
    cdcChunkKeys(assets)
      .filter(col("chunk_key").isNotNull)
      .select(col("asset_id"), col("chunk_key")).distinct()

  /** The video instantiation of [[postingIndexBuild]] (mm21): distinct
    * per-frame hashes as the posting unit. */
  def frameHashIndexBuild(assets: DataFrame, dir: String, stride: Int = 1,
                          buckets: Int = 32): Unit =
    postingIndexBuild(distinctFrameHashes(assets, stride), dir,
      "asset_id", "fhash", buckets)

  /** The video instantiation of [[postingIndexAppend]] (mm21). */
  def frameHashIndexAppend(assets: DataFrame, dir: String, stride: Int = 1,
                           buckets: Int = 32,
                           maxRecordsPerFile: Long = 1000000L): Unit =
    postingIndexAppend(distinctFrameHashes(assets, stride), dir,
      "asset_id", "fhash", buckets, maxRecordsPerFile)

  /** The video instantiation of [[postingContainmentIncremental]]
    * (mm21): only the batch clips decode; the bloom is sized from
    * clips × a generous frames-per-clip bound. `expectedClips` lets a
    * caller that already knows the batch cardinality (e.g. a 1:1 synth
    * off a keyed table) supply it and skip the eager `batch.count()`,
    * which re-runs the whole synth pipeline once more just to size the
    * bloom; -1 keeps the self-counting default. */
  def frameContainmentIncremental(batch: DataFrame, dir: String,
                                  stride: Int = 1, cap: Int = 8,
                                  minShared: Int = 2,
                                  expectedClips: Long = -1L,
                                  immutable: Boolean = false): DataFrame =
    postingContainmentIncremental(
      distinctFrameHashes(batch, stride), dir, "asset_id", "fhash",
      expectedKeys =
        (if (expectedClips >= 0L) expectedClips else batch.count()) * 64L,
      cap = cap, minShared = minShared, immutable = immutable)
}
