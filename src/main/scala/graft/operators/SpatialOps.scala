package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial neighbor operators over flat integer coordinates.
  *
  * The reference pipeline's spatial surface is point geocoding
  * (`city-directories.js:341-450` emits Point/MultiPoint GeoJSON); the
  * scale extension a geodata corpus needs next is the RADIUS JOIN —
  * "every (a, b) pair within distance r" — which has no equi key, the
  * 2-D twin of the interval-overlap problem `EventOps.intervalOverlapJoin`
  * solves in 1-D. Same lowering, one dimension up: grid cells of side r
  * turn the predicate join into an ordinary equi join Catalyst can
  * shuffle, reorder, and AQE-skew-split.
  *
  * Coordinates are integers (microdegrees, millimeters — caller's
  * choice of unit) and the distance test is exact integer arithmetic
  * (Δx² + Δy² ≤ r², no sqrt, no trig), so results are bit-identical
  * across engines and partitionings. Callers on a sphere convert the
  * final candidate set with their geodesic of choice — the expensive
  * part (candidate pruning) is metric-agnostic as long as the grid unit
  * bounds the true distance from above, which microdegree L2 does for
  * small radii away from the poles. Overflow bound: |coordinate| must
  * stay below ~2^31 so Δ² sums fit a signed long; lat/lon microdegrees
  * (≤ 1.8e8) clear it by 10×.
  */
object SpatialOps {

  /** Exact floor division (toward −∞, unlike SQL integer division's
    * truncation) so negative coordinates land in the right cell. */
  private def fdiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / d).cast("long")

  /** All (a, b) pairs with (ax−bx)² + (ay−by)² ≤ radius², emitted
    * exactly once each.
    *
    * Lowering: the `b` side maps to its home cell (side = radius); the
    * `a` side replicates to its 3×3 cell neighborhood via a narrow
    * map-side explode (no shuffle — the replication rides INTO the join
    * exchange). |Δ| ≤ r implies the cells differ by ≤ 1 per axis, so
    * every qualifying pair meets in b's home cell — and ONLY there,
    * because a's nine replica cells are distinct: exactly-once without
    * any dedup pass. The join is a plain equi join on (cellx, celly)
    * with the exact integer predicate applied at the match site.
    *
    * Scale: replication is a fixed ×9 on one side — choose the SMALLER
    * frame as `a`. Shuffle carries (coords + payload) × 9 for `a`, ×1
    * for `b`; there is never a cross product. A dense city cell is
    * ordinary equi-join skew (AQE splits it); cell side = radius is
    * canonical — larger cells trade replication for wasted candidate
    * pairs, and the ×9 constant is the 2-D price of the interval
    * join's ×(len/bin+1).
    */
  def radiusJoin(a: DataFrame, ax: String, ay: String,
                 b: DataFrame, bx: String, by: String,
                 radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive: $radius")
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) }
      yield struct((fdiv(col(ax), radius) + dx).as("cx"),
        (fdiv(col(ay), radius) + dy).as("cy"))
    val aCells = a
      .withColumn("_cell", explode(array(offsets: _*)))
      .withColumn("_cx", col("_cell.cx"))
      .withColumn("_cy", col("_cell.cy"))
      .drop("_cell")
    val bCells = b
      .withColumn("_cx", fdiv(col(bx), radius))
      .withColumn("_cy", fdiv(col(by), radius))
    val dx = col(ax) - col(bx)
    val dy = col(ay) - col(by)
    aCells.join(bCells, Seq("_cx", "_cy"))
      .filter(dx * dx + dy * dy <= lit(radius) * lit(radius))
      .withColumn("d2", dx * dx + dy * dy)
      .drop("_cx", "_cy")
  }

  /** Mean Earth radius in meters (IUGG R1, truncated to integer). */
  val EarthRadiusM: Long = 6371000L

  /** π/180 as one double literal, NOT a builtin `radians` call: engines
    * disagree on the association order inside their radians ((x·π)/180
    * vs x·(π/180)), and a last-ulp disagreement upstream of `cos` is
    * exactly the cross-engine drift the quantized contract exists to
    * kill. One shared literal multiplies identically everywhere. */
  val DegToRad: Double = 0.017453292519943295

  /** Great-circle radius join over (lon, lat) MICRODEGREE integer
    * points: every (a, b) pair within `radiusMeters` along the sphere,
    * exactly once — sp1's lowering lifted to the reference's actual
    * domain (GeoJSON lon/lat points, city-directories.js:393), where
    * flat integer L2 is the wrong geometry.
    *
    * Metric contract — the QUANTIZED-CHORD metric: each point maps to
    * Earth-centered (ECEF) coordinates rounded to integer METERS
    * (`x = round(R·cosφ·cosλ)` etc.), and a pair qualifies iff the
    * exact integer chord² between those quantized points is ≤ cb²,
    * where `cb = round(2R·sin(r/2R))` is the chord length of a
    * great-circle arc r (computed once, driver-side). This equals true
    * haversine up to the ±√3 m quantization — and in exchange the
    * decision predicate is EXACT INTEGER arithmetic: bit-identical
    * across engines and partitionings (trig runs once per POINT, and a
    * last-ulp `cos` disagreement flips a rounded meter only when the
    * true value sits within ~1e-9 of a half-meter — not per PAIR at
    * the radius boundary, where float haversine comparisons flake).
    *
    * Lowering: 3-D grid cells of side cb over the ECEF coords — the a
    * side replicates to its 3×3×3 neighborhood (×27, the 3-D price of
    * sp1's ×9; choose the smaller frame as `a`), b keeps its home
    * cell, every qualifying pair meets exactly once (distinct
    * replicas). Gridding in ECEF SUPERSEDES latitude-aware 2-D cell
    * sizing: cells in 3-space are automatically latitude-correct and
    * have no antimeridian wrap or pole-cap special cases — the two
    * classic sources of missed pairs in lon/lat-grid implementations.
    * A cheap axis bounding-box prefilter runs before the multiplies at
    * the match site. Dense city cells are ordinary equi-join skew
    * (AQE). Overflow: |coord| ≤ R < 2^23, so chord² sums ≤ 5e14 ≪ 2^63.
    */
  def greatCircleRadiusJoin(a: DataFrame, aLon: String, aLat: String,
                            b: DataFrame, bLon: String, bLat: String,
                            radiusMeters: Double): DataFrame = {
    require(radiusMeters > 0, s"radius must be positive: $radiusMeters")
    val cb = math.round(2.0 * EarthRadiusM *
      math.sin(radiusMeters / (2.0 * EarthRadiusM)))
    require(cb > 0, s"radius $radiusMeters quantizes to a zero chord")
    def ecef(lon: String, lat: String): Seq[Column] = {
      val phi = col(lat).cast("double") / 1e6 * DegToRad
      val lam = col(lon).cast("double") / 1e6 * DegToRad
      // association order (R · cosφ) · cosλ mirrored verbatim in the
      // oracle SQL — IEEE multiply is order-sensitive in the last ulp
      Seq(round(lit(EarthRadiusM.toDouble) * cos(phi) * cos(lam))
          .cast("long"),
        round(lit(EarthRadiusM.toDouble) * cos(phi) * sin(lam))
          .cast("long"),
        round(lit(EarthRadiusM.toDouble) * sin(phi)).cast("long"))
    }
    val Seq(axc, ayc, azc) = ecef(aLon, aLat)
    val Seq(bxc, byc, bzc) = ecef(bLon, bLat)
    val aE = a.withColumn("_ax", axc).withColumn("_ay", ayc)
      .withColumn("_az", azc)
    val bE = b.withColumn("_bx", bxc).withColumn("_by", byc)
      .withColumn("_bz", bzc)
    val offsets = for {
      dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L); dz <- Seq(-1L, 0L, 1L)
    } yield struct((fdiv(col("_ax"), cb) + dx).as("cx"),
      (fdiv(col("_ay"), cb) + dy).as("cy"),
      (fdiv(col("_az"), cb) + dz).as("cz"))
    val aCells = aE.withColumn("_cell", explode(array(offsets: _*)))
      .withColumn("_cx", col("_cell.cx"))
      .withColumn("_cy", col("_cell.cy"))
      .withColumn("_cz", col("_cell.cz"))
      .drop("_cell")
    val bCells = bE
      .withColumn("_cx", fdiv(col("_bx"), cb))
      .withColumn("_cy", fdiv(col("_by"), cb))
      .withColumn("_cz", fdiv(col("_bz"), cb))
    val dx = col("_ax") - col("_bx")
    val dy = col("_ay") - col("_by")
    val dz = col("_az") - col("_bz")
    aCells.join(bCells, Seq("_cx", "_cy", "_cz"))
      .filter(abs(dx) <= cb && abs(dy) <= cb && abs(dz) <= cb) // bbox prefilter
      .filter(dx * dx + dy * dy + dz * dz <= lit(cb) * lit(cb))
      .withColumn("chord2", dx * dx + dy * dy + dz * dz)
      .drop("_cx", "_cy", "_cz", "_ax", "_ay", "_az", "_bx", "_by", "_bz")
  }

  /** Radius-bounded k-nearest neighbors ON THE SPHERE: for each `b`
    * row, its `k` closest `a` rows within `radiusMeters` great-circle
    * distance — the reference's actual geocode-disambiguation shape
    * (nearest candidate addresses for an OCR'd point,
    * city-directories.js:341-450) lifted to the geometry it really
    * lives in. Composition of the two proven lowerings: sp4's
    * exactly-once ECEF cell join produces the candidate set (already
    * radius-pruned, never all-pairs), and `TopK.perKey`'s bounded
    * per-task heap does the selection map-side — no global sort, no
    * per-key row explosion past k. Distance ordering is the quantized
    * chord² (monotone in great-circle distance), ties broken by
    * `tieCol` so the result is deterministic across partitionings.
    *
    * Scale: candidates ≤ |qualifying pairs| (the radius bounds the
    * per-key fan-in); the heap retains ≤ k rows per key per task
    * (TopKPerKey contract — keep k small, it's a heap not a
    * histogram). Same ×27 replication economics as the radius join:
    * pass the smaller frame as `a`.
    */
  def greatCircleKnn(a: DataFrame, aLon: String, aLat: String,
                     b: DataFrame, bLon: String, bLat: String,
                     radiusMeters: Double, k: Int,
                     bKey: String, tieCol: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val cand = greatCircleRadiusJoin(a, aLon, aLat, b, bLon, bLat,
      radiusMeters)
    graft.plans.TopK.perKey(cand, Seq(bKey),
      Seq(col("chord2").asc, col(tieCol).asc), k)
  }

  /** Point-in-box containment join: every (box, point) pair with
    * |px − cx| ≤ hw and |py − cy| ≤ hh (boxes given by center +
    * per-row half-extents, edges inclusive). The 2-D cover join —
    * geofences, map tiles, bounding-box pre-filters for polygon work.
    *
    * Lowering: each box replicates to every grid cell its extent
    * covers (two nested `sequence` explodes — narrow, no shuffle);
    * each point maps to its home cell only. A contained point's home
    * cell is by definition covered by the box, so every qualifying
    * pair meets exactly once — exactly-once by construction again, no
    * dedup pass. Replication per box is (⌈2hw/cell⌉+1)·(⌈2hh/cell⌉+1),
    * guarded in-column by `maxCellsPerBox` (`raise_error`, the
    * intervalOverlapJoin discipline): a degenerate continent-sized box
    * should fail loudly, not silently explode the exchange. Pick
    * `cell` near the TYPICAL box extent — the 1-D binSec rule, squared.
    */
  /** Grid-cell metadata persisted beside a point index so readers can
    * never probe with the wrong geometry (a silent cell-size mismatch
    * would MISS pairs — worse than the bucket-count mismatch the
    * posting index merely documents). */
  private val GridMetaName = "_GRAFT_GRID"

  private def writeGridMeta(dir: String, cell: Long, tile: Long,
                            grid: Long): Unit =
    SidecarIO.write(dir, GridMetaName,
      s"cell=$cell\ntile=$tile\ngrid=$grid\n")

  private[operators] def gridMeta(dir: String): (Long, Long, Long) = {
    require(SidecarIO.exists(dir, GridMetaName),
      s"point index at $dir has no $GridMetaName metadata — not a " +
        "pointIndexBuild directory, or a torn build")
    val kv = SidecarIO.read(dir, GridMetaName).linesIterator
      .filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2); (k, v)
      }.toMap
    (kv("cell").toLong, kv("tile").toLong, kv("grid").toLong)
  }

  /** The directory key: LOCALITY-PRESERVING tile residue, not a hash.
    * Cells group into tile×tile squares; a tile maps to directory
    * `(tileX mod g)·g + (tileY mod g)` — bounded at g² directories
    * regardless of coordinate extent, and CONTIGUOUS batches stay in
    * few directories: a batch spanning ≤ tile cells per axis touches
    * ≤ 4 of the g² directories, so the probe-side partition filter
    * skips ≥ (1 − 4/g²) of the index. A hash bucket of the cell would
    * balance file sizes identically but scatter every neighborhood
    * across ALL directories — with uniform-hash keys any batch beyond
    * a few dozen cells saturates the bucket set and directory pruning
    * never fires (the reason the mm21 posting index, whose fingerprint
    * keys have no locality to preserve, prunes only small batches).
    * Distant tiles sharing a residue cost scan width, never
    * correctness — exactness lives in the cell equi join. */
  private def tileBucket(cx: Column, cy: Column, tile: Long,
                         grid: Long): Column =
    pmod(fdiv(cx, tile), lit(grid)) * grid + pmod(fdiv(cy, tile), lit(grid))

  private def withCells(points: DataFrame, idCol: String, xCol: String,
                        yCol: String, cell: Long, tile: Long,
                        grid: Long): DataFrame =
    points.select(col(idCol), col(xCol), col(yCol),
      fdiv(col(xCol), cell).as("_cx"), fdiv(col(yCol), cell).as("_cy"))
      .withColumn("_bkt", tileBucket(col("_cx"), col("_cy"), tile, grid))

  /** Persist a point corpus' grid-cell index for INCREMENTAL radius
    * joins — the dd10/ss18/mm21 banked-artifact discipline on the
    * spatial axis: the standing corpus (a geocoded address base, the
    * reference's accumulated output) is celled and written ONCE,
    * hive-partitioned by the bounded LOCALITY-PRESERVING tile residue of
    * the home cell ([[tileBucket]] — cells are too high-cardinality
    * for a directory key, and a hash of the cell would destroy the
    * locality that makes probe-side directory pruning fire), files
    * clustered by (_cx, _cy) so parquet min/max stats prune within
    * each directory. New
    * batches append via [[pointIndexAppend]] and probe via
    * [[radiusJoinIncremental]] without the corpus ever being rescanned
    * from source. `cell` bounds the largest radius later queries may
    * use (probe neighborhoods are 3×3 home cells); it is persisted in
    * the directory and re-read by append/probe, so a geometry mismatch
    * is structurally impossible.
    */
  def pointIndexBuild(points: DataFrame, dir: String, idCol: String,
                      xCol: String, yCol: String, cell: Long,
                      tile: Long = 64L, grid: Long = 8L): Unit = {
    require(cell > 0, s"cell must be positive: $cell")
    require(tile > 0 && grid > 0, s"bad tile/grid: $tile/$grid")
    graft.sources.Compaction.writePartitioned(
      withCells(points, idCol, xCol, yCol, cell, tile, grid),
      dir, Seq("_bkt"), clusterBy = Seq("_cx", "_cy"))
    writeGridMeta(dir, cell, tile, grid)
  }

  /** Append a batch's points, preserving the build's layout invariant
    * (repartitioned on the bucket, files clustered by cell); geometry
    * comes from the persisted metadata, never from the caller. */
  def pointIndexAppend(points: DataFrame, dir: String, idCol: String,
                       xCol: String, yCol: String,
                       maxRecordsPerFile: Long = 1000000L): Unit = {
    val (cell, tile, grid) = gridMeta(dir)
    withCells(points, idCol, xCol, yCol, cell, tile, grid)
      .repartition(col("_bkt"))
      .sortWithinPartitions(col("_bkt"), col("_cx"), col("_cy"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("_bkt").parquet(dir)
  }

  /** Radius join of a NEW batch against the persisted corpus index:
    * every (batch a, corpus b) pair with Δx² + Δy² ≤ radius², exactly
    * once, with ONLY the batch's coordinates computed fresh — the
    * corpus side reads back from the index, and the index scan is
    * bloom-reduced by the batch's 3×3 probe-cell set before anything
    * joins (bloom false positives admit index cells no probe matches;
    * the equi join drops them — they cost scan rows, never
    * correctness). Requires radius ≤ the index's persisted cell size
    * (|Δ| ≤ radius ≤ cell ⟹ home cells differ by ≤ 1 per axis, so the
    * 3×3 probe meets every qualifying pair in b's home cell — and only
    * there: exactly-once with no dedup pass, sp1's invariant).
    * `expectedCells` sizes the bloom (overestimate only costs bits).
    * Output: (a = batch id, b = corpus id, d2).
    *
    * The batch side evaluates three times (probe-bucket distinct,
    * bloom build, the join) — the dd10 no-persist trade: a cached plan
    * would leak a CacheManager entry per ingest in the steady-state
    * loop, and the batch is small by premise with CHEAP per-row work
    * (coordinates, not decodes).
    */
  def radiusJoinIncremental(batch: DataFrame, dir: String, idCol: String,
                            xCol: String, yCol: String, radius: Long,
                            expectedCells: Long,
                            immutable: Boolean = false): DataFrame = {
    val spark = batch.sparkSession
    val (cell, tile, grid) = gridMeta(dir)
    require(radius > 0 && radius <= cell,
      s"radius $radius must be in (0, cell=$cell] — the 3×3 probe " +
        "neighborhood only covers one cell of slack; rebuild the index " +
        "with a larger cell for wider queries")
    val offsets = for { dx <- Seq(-1L, 0L, 1L); dy <- Seq(-1L, 0L, 1L) }
      yield struct((fdiv(col("_ax"), cell) + dx).as("cx"),
        (fdiv(col("_ay"), cell) + dy).as("cy"))
    val probes = batch
      .select(col(idCol).as("a"), col(xCol).as("_ax"), col(yCol).as("_ay"))
      .withColumn("_cell", explode(array(offsets: _*)))
      .withColumn("_cx", col("_cell.cx"))
      .withColumn("_cy", col("_cell.cy"))
      .drop("_cell")
    val bloom = BloomJoin.buildBloom(probes,
      xxhash64(col("_cx"), col("_cy")), math.max(expectedCells, 1L))
    // directory-level pruning BEFORE the row-level bloom: probe cells
    // map through the same locality-preserving tile residue as the
    // build, the distinct set is ≤ grid² values by construction (the
    // collect is bounded no matter the batch size), and a CONTIGUOUS
    // batch touches a handful of them — the ss7
    // probed-cells-as-partition-filters discipline, which only works
    // because the directory key preserves locality (see tileBucket)
    val probeBkts = probes
      .select(tileBucket(col("_cx"), col("_cy"), tile, grid).as("_bkt"))
      .distinct().collect().map(_.getLong(0)).toSeq
    // immutable = true: marker-gated point-index fixture, never
    // rewritten in-process — resolved-relation memo (r18 verdict item 5)
    val index = (if (immutable) graft.Tables.immutablePath(spark, dir)
                 else spark.read.parquet(dir))
      .filter(col("_bkt").isin(probeBkts: _*))
      .filter(BloomJoin.mightContain(bloom,
        xxhash64(col("_cx"), col("_cy"))))
      .select(col(idCol).as("b"), col(xCol).as("_bx"),
        col(yCol).as("_by"), col("_cx"), col("_cy"))
    val dx = col("_ax") - col("_bx")
    val dy = col("_ay") - col("_by")
    probes.join(index, Seq("_cx", "_cy"))
      .filter(dx * dx + dy * dy <= lit(radius) * lit(radius))
      .withColumn("d2", dx * dx + dy * dy)
      .select("a", "b", "d2")
  }

  /** Even-odd ray-cast point-in-polygon test as one column expression:
    * true iff a ray from (px, py) toward +x crosses an odd number of
    * polygon edges. `poly` is an `array<struct<x: long, y: long>>` of
    * vertices in ring order (closing edge last→first implied); the
    * polygon must be simple (non-self-intersecting) — vertex order
    * direction does not matter.
    *
    * EXACT integer arithmetic: the textbook form compares px against
    * the edge/ray intersection `x1 + (x2−x1)(py−y1)/(y2−y1)`, whose
    * division is where float implementations flake at boundaries.
    * Cross-multiplying by (y2−y1) — sign-flipped when negative — keeps
    * every comparison in integers, so the verdict is bit-identical
    * across engines and partitionings. Edge rule: an edge counts only
    * when its endpoints STRADDLE the ray's line under strict `>` on
    * both ends (the classic half-open rule, so a vertex exactly at py
    * is counted by exactly one of its two incident edges — never zero,
    * never both), and the crossing comparison is strict (`px` exactly
    * on an edge resolves deterministically, same answer both engines).
    *
    * Overflow bound: |coord| ≤ c — `lhs` is the DIFFERENCE of two
    * products each bounded by 4c², so the worst case is 8c² < 2^63,
    * i.e. c < 1.07e9; microdegrees (≤ 1.8e8) clear it by ~6×.
    *
    * Degenerate rings (null, empty, or < 3 vertices) resolve IN-BAND
    * to `false` — the codec discipline. Unguarded, `sequence(0, n-1)`
    * with n = 0 is the DESCENDING [0, -1] (Spark sequence semantics),
    * whose i = -1 step evaluates `element_at(poly, 0)` — a hard
    * runtime error ("array indices start at 1") that would fail the
    * whole job on one malformed ring.
    *
    * Runs as one HOF aggregate
    * over the vertex array: O(V) per candidate pair, no explode, no
    * extra rows.
    */
  def rayCastInside(poly: Column, px: Column, py: Column): Column = {
    val n = size(poly)
    val crossings = aggregate(
      sequence(lit(0), n - 1), lit(0L),
      (acc: Column, i: Column) => {
        val a = element_at(poly, i + 1)
        val b = element_at(poly, pmod(i + 1, n) + 1) // ring-closing edge
        val (x1, y1) = (a.getField("x"), a.getField("y"))
        val (x2, y2) = (b.getField("x"), b.getField("y"))
        val dy = y2 - y1
        val straddles = (y1 > py) =!= (y2 > py)
        val lhs = (px - x1) * dy - (x2 - x1) * (py - y1)
        val crosses = straddles &&
          ((dy > 0 && lhs < 0) || (dy < 0 && lhs > 0))
        acc + when(crosses, 1L).otherwise(0L)
      })
    when(n >= 3, pmod(crossings, lit(2L)) === 1L).otherwise(lit(false))
  }

  /** Point-in-POLYGON containment join: every (polygon, point) pair
    * where the point falls inside the simple polygon ring carried in
    * `polyCol` (`array<struct<x: long, y: long>>`) — census tracts,
    * admin boundaries, non-rectangular geofences; the general-geometry
    * step past [[containsJoin]]'s boxes, for the reference's own
    * geocoded-point domain (city-directories.js:325-336 emits the
    * MultiPoint geometry this would be joined against).
    *
    * Lowering — prune with the proven cover join, decide exactly: the
    * polygon's BOUNDING BOX (array min/max, computed in-column — no
    * explode) replicates to every grid cell it covers; points map to
    * their home cell only; a contained point's home cell is inside the
    * bbox cover, so each qualifying pair meets EXACTLY ONCE, and the
    * exact [[rayCastInside]] predicate runs only on bbox-candidate
    * pairs at the match site. Same fan-out guard economics as
    * [[containsJoin]]: replication is per-polygon O(bbox area /
    * cell²), `maxCellsPerPoly` fails a continent-sized ring loudly.
    * The vertex array rides the ×cover replication — keep rings
    * decimated (tens of vertices) or join the ring back by polygon id
    * when carrying thousand-vertex coastlines.
    */
  /** Exact-integer polygon census: vertex count, twice-area (shoelace,
    * |Σ cross|), winding orientation, and centroid — the geometry
    * facts a spatial-curation pass filters on (degenerate slivers,
    * inverted rings, size buckets) before any join. All sums are
    * EXACT LONGS; the only floats are the two final one-IEEE-division
    * centroid quotients (the ss13 recipe, replayed verbatim by the
    * oracle).
    *
    * Overflow: the centroid numerator is CUBIC in coordinates, so the
    * sums run over BBOX-SHIFTED vertices (shoelace is translation-
    * invariant; the centroid shifts back by the bbox min as a final
    * double add) — the bound is 4e³ < 2^63 on the polygon EXTENT e
    * (e < 1.3e6), not on the absolute position: a city-block ring at
    * the far end of a microdegree world stays exact. Degenerate rings
    * (< 3 vertices, or zero signed area) resolve in-band: area2 = 0,
    * ccw/cx/cy null. Three row-local HOF aggregates over the ring —
    * no explode, no shuffle.
    */
  def polygonStats(polys: DataFrame, polyCol: String): DataFrame = {
    val p = col(polyCol)
    val n = size(p)
    val xs = transform(p, v => v.getField("x"))
    val ys = transform(p, v => v.getField("y"))
    val mnx = array_min(xs)
    val mny = array_min(ys)
    def shx(i: Column) = element_at(xs, i) - mnx
    def shy(i: Column) = element_at(ys, i) - mny
    def crossAt(i: Column) = {
      val j = pmod(i, n) + 1 // ring-closing successor (1-based)
      shx(i) * shy(j) - shx(j) * shy(i)
    }
    val idx = sequence(lit(1), n) // 1-based vertex positions
    val signed = aggregate(idx, lit(0L), (acc, i) => acc + crossAt(i))
    val cxNum = aggregate(idx, lit(0L),
      (acc, i) => acc + (shx(i) + shx(pmod(i, n) + 1)) * crossAt(i))
    val cyNum = aggregate(idx, lit(0L),
      (acc, i) => acc + (shy(i) + shy(pmod(i, n) + 1)) * crossAt(i))
    val ok = n >= 3 && signed =!= 0L
    polys
      .withColumn("n_verts", when(p.isNotNull, n).otherwise(lit(0)))
      .withColumn("_signed", when(col("n_verts") >= 3, signed)
        .otherwise(lit(0L)))
      .withColumn("area2", abs(col("_signed")))
      .withColumn("ccw", when(col("_signed") =!= 0L, col("_signed") > 0L))
      .withColumn("cx", when(ok,
        mnx + cxNum.cast("double") / (lit(3L) * signed).cast("double")))
      .withColumn("cy", when(ok,
        mny + cyNum.cast("double") / (lit(3L) * signed).cast("double")))
      .drop("_signed")
  }

  def polygonContainsJoin(polys: DataFrame, polyCol: String,
                          points: DataFrame, pxCol: String, pyCol: String,
                          cell: Long,
                          maxCellsPerPoly: Long = 4096L): DataFrame = {
    require(cell > 0, s"cell must be positive: $cell")
    val xs = transform(col(polyCol), v => v.getField("x"))
    val ys = transform(col(polyCol), v => v.getField("y"))
    val x0 = fdiv(array_min(xs), cell)
    val x1 = fdiv(array_max(xs), cell)
    val y0 = fdiv(array_min(ys), cell)
    val y1 = fdiv(array_max(ys), cell)
    val nCells = (x1 - x0 + 1) * (y1 - y0 + 1)
    val guarded = polys.withColumn("_nc",
      when(nCells <= maxCellsPerPoly, nCells).otherwise(raise_error(
        concat(lit(s"polygonContainsJoin: polygon bbox covers more than " +
            s"$maxCellsPerPoly cells ("),
          nCells, lit(s") at cell=$cell — raise cell or maxCellsPerPoly")))))
    val polyCells = guarded
      .withColumn("_cx", explode(sequence(x0, x1)))
      .withColumn("_cy", explode(sequence(y0, y1)))
      .drop("_nc")
    val pointCells = points
      .withColumn("_cx", fdiv(col(pxCol), cell))
      .withColumn("_cy", fdiv(col(pyCol), cell))
    polyCells.join(pointCells, Seq("_cx", "_cy"))
      .filter(rayCastInside(col(polyCol), col(pxCol), col(pyCol)))
      .drop("_cx", "_cy")
  }

  def containsJoin(boxes: DataFrame, cxCol: String, cyCol: String,
                   hwCol: String, hhCol: String,
                   points: DataFrame, pxCol: String, pyCol: String,
                   cell: Long, maxCellsPerBox: Long = 4096L): DataFrame = {
    require(cell > 0, s"cell must be positive: $cell")
    val x0 = fdiv(col(cxCol) - col(hwCol), cell)
    val x1 = fdiv(col(cxCol) + col(hwCol), cell)
    val y0 = fdiv(col(cyCol) - col(hhCol), cell)
    val y1 = fdiv(col(cyCol) + col(hhCol), cell)
    val nCells = (x1 - x0 + 1) * (y1 - y0 + 1)
    val guarded = boxes.withColumn("_nc",
      when(nCells <= maxCellsPerBox, nCells).otherwise(raise_error(
        concat(lit(s"containsJoin: box covers more than $maxCellsPerBox cells ("),
          nCells, lit(s") at cell=$cell — raise cell or maxCellsPerBox")))))
    val boxCells = guarded
      .withColumn("_cx", explode(sequence(x0, x1)))
      .withColumn("_cy", explode(sequence(y0, y1)))
      .drop("_nc")
    val pointCells = points
      .withColumn("_cx", fdiv(col(pxCol), cell))
      .withColumn("_cy", fdiv(col(pyCol), cell))
    boxCells.join(pointCells, Seq("_cx", "_cy"))
      .filter(abs(col(pxCol) - col(cxCol)) <= col(hwCol) &&
        abs(col(pyCol) - col(cyCol)) <= col(hhCol))
      .drop("_cx", "_cy")
  }
}
