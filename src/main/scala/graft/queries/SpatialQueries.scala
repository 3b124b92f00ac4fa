package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.SpatialOps

/** Spatial lanes (sp*): the grid-cell radius join over deterministic
  * integer coordinates. Points are md5-derived microdegree-style
  * coordinates in a 1e6 × 1e6 space (the tx9 uniform recipe — both
  * engines compute the identical hex arithmetic), so the lane is a
  * pure function of the keys and the exact integer distance test
  * replays bit-for-bit in DuckDB. The oracle is the PREDICATE form
  * (cross join + filter) — semantics, not the plan — while the Spark
  * side must pass the PlanShapeSpec no-cartesian pin: same result,
  * equi-join plan.
  */
object SpatialQueries {

  /** 28-bit md5 window → coordinate in [0, 1e6). `off` picks disjoint
    * hex windows so x and y decorrelate. */
  private def coord(key: org.apache.spark.sql.Column, off: Int) =
    conv(substring(md5(key.cast("string")), off, 7), 16, 10)
      .cast("long") % 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Customers within 25k units of a supplier (facility catchment):
    // supplier side (smaller) takes the ×9 replication, customer side
    // shuffles once at ×1. ~300 pairs at sf0.01, ~29k at sf0.1 — both
    // the match and the (overwhelming) no-match path exercised.
    "sp1_radius_join" -> ((s, d) => {
      val su = supplier(s, d).select(col("s_suppkey"),
        coord(col("s_suppkey") + 7000000L, 1).as("sx"),
        coord(col("s_suppkey") + 7000000L, 9).as("sy"))
      val cu = customer(s, d).select(col("c_custkey"),
        coord(col("c_custkey"), 1).as("cx"),
        coord(col("c_custkey"), 9).as("cy"))
      SpatialOps.radiusJoin(su, "sx", "sy", cu, "cx", "cy", 25000L)
        .select("s_suppkey", "c_custkey", "d2")
    }),

    // Radius-bounded k-nearest: each customer's 3 closest suppliers
    // within 100k units (the geocode-disambiguation shape — candidates
    // from the cell join, selection on the bounded TopKPerKey heap, no
    // global sort; ~3.1 expected candidates/customer so the k=3 cut
    // genuinely truncates). Deterministic under d2 ties via the
    // suppkey tiebreak.
    "sp2_radius_knn" -> ((s, d) => {
      val su = supplier(s, d).select(col("s_suppkey"),
        coord(col("s_suppkey") + 7000000L, 1).as("sx"),
        coord(col("s_suppkey") + 7000000L, 9).as("sy"))
      val cu = customer(s, d).select(col("c_custkey"),
        coord(col("c_custkey"), 1).as("cx"),
        coord(col("c_custkey"), 9).as("cy"))
      val cand = SpatialOps.radiusJoin(su, "sx", "sy", cu, "cx", "cy",
          100000L)
        .select("c_custkey", "s_suppkey", "d2")
      graft.plans.TopK.perKey(cand, Seq("c_custkey"),
        Seq(col("d2").asc, col("s_suppkey").asc), 3)
        .select("c_custkey", "s_suppkey", "d2")
    }),

    // Point-in-box containment (geofence) join: supplier service boxes
    // (md5-derived half-extents 5k–25k per axis) × customer points.
    // Cover-join lowering — box replicated to its covered cells, point
    // home-cell only, exactly once by construction; inclusive edges.
    "sp3_contains_join" -> ((s, d) => {
      val boxes = supplier(s, d).select(col("s_suppkey"),
        coord(col("s_suppkey") + 7000000L, 1).as("sx"),
        coord(col("s_suppkey") + 7000000L, 9).as("sy"),
        (coord(col("s_suppkey") + 9000000L, 1) % 20001L + 5000L).as("hw"),
        (coord(col("s_suppkey") + 9000000L, 9) % 20001L + 5000L).as("hh"))
      val pts = customer(s, d).select(col("c_custkey"),
        coord(col("c_custkey"), 1).as("cx"),
        coord(col("c_custkey"), 9).as("cy"))
      SpatialOps.containsJoin(boxes, "sx", "sy", "hw", "hh",
          pts, "cx", "cy", cell = 50000L)
        .select("s_suppkey", "c_custkey", "hw", "hh")
    }),

    // Great-circle radius join (sp4): suppliers × customers within
    // 200 km ALONG THE SPHERE, points in lon/lat microdegrees spanning
    // the full globe (±180° lon incl. the antimeridian, ±85° lat) —
    // the geometry sp1's flat integer L2 cannot express. The quantized
    // ECEF-chord contract makes the decision exact-integer; the oracle
    // replays the per-point trig + rounding verbatim and the predicate
    // as a cross join. 53 pairs at sf0.01, 5242 at sf0.1.
    "sp4_greatcircle" -> ((s, d) => {
      def lonlat(key: org.apache.spark.sql.Column) = (
        conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
          .cast("long") % 360000000L - 180000000L,
        conv(substring(md5(key.cast("string")), 9, 8), 16, 10)
          .cast("long") % 170000000L - 85000000L)
      val (slon, slat) = lonlat(col("s_suppkey") + 7000000L)
      val su = supplier(s, d).select(col("s_suppkey"),
        slon.as("slon"), slat.as("slat"))
      val (clon, clat) = lonlat(col("c_custkey"))
      val cu = customer(s, d).select(col("c_custkey"),
        clon.as("clon"), clat.as("clat"))
      SpatialOps.greatCircleRadiusJoin(su, "slon", "slat",
          cu, "clon", "clat", radiusMeters = 200000.0)
        .select("s_suppkey", "c_custkey", "chord2")
    }),

    // Spherical k-nearest (sp5): each customer's 3 closest suppliers
    // within 2000 km along the sphere — sp2's geocode-disambiguation
    // shape on sp4's geometry. ~2.5 expected in-radius suppliers per
    // customer at the uniform-globe density, so k=3 genuinely
    // truncates; selection on the bounded TopKPerKey heap, ordering by
    // the exact-integer quantized chord² with the suppkey tiebreak.
    "sp5_greatcircle_knn" -> ((s, d) => {
      def lonlat(key: org.apache.spark.sql.Column) = (
        conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
          .cast("long") % 360000000L - 180000000L,
        conv(substring(md5(key.cast("string")), 9, 8), 16, 10)
          .cast("long") % 170000000L - 85000000L)
      val (slon, slat) = lonlat(col("s_suppkey") + 7000000L)
      val su = supplier(s, d).select(col("s_suppkey"),
        slon.as("slon"), slat.as("slat"))
      val (clon, clat) = lonlat(col("c_custkey"))
      val cu = customer(s, d).select(col("c_custkey"),
        clon.as("clon"), clat.as("clat"))
      SpatialOps.greatCircleKnn(su, "slon", "slat", cu, "clon", "clat",
          radiusMeters = 2000000.0, k = 3,
          bKey = "c_custkey", tieCol = "s_suppkey")
        .select("c_custkey", "s_suppkey", "chord2")
    }),

    // Point-in-POLYGON containment (sp6): supplier service areas as
    // md5-parameterized hexagonal rings (six fixed angularly-ordered
    // directions × per-vertex integer scales — star-shaped, hence
    // simple, by construction; concavity genuinely possible since
    // adjacent scales vary 6×) × customer points. Bbox cover join
    // prunes, the exact-integer even-odd ray cast decides; the oracle
    // replays all six unrolled crossing terms on the cross join. ~90
    // pairs at sf0.01, ~8.8k at sf0.1.
    "sp6_polygon_join" -> ((s, d) => {
      val su = supplier(s, d).select(col("s_suppkey"),
        coord(col("s_suppkey") + 7000000L, 1).as("sx"),
        coord(col("s_suppkey") + 7000000L, 9).as("sy"))
      val verts = PolyDirs.zipWithIndex.map { case ((dx, dy), v) =>
        val sv = coord(col("s_suppkey") * 10 + lit(90000000L + v), 1) %
          10001L + 2000L
        struct((col("sx") + lit(dx) * sv).as("x"),
          (col("sy") + lit(dy) * sv).as("y"))
      }
      val polys = su.withColumn("poly", array(verts: _*))
      val cu = customer(s, d).select(col("c_custkey"),
        coord(col("c_custkey"), 1).as("cx"),
        coord(col("c_custkey"), 9).as("cy"))
      SpatialOps.polygonContainsJoin(polys, "poly", cu, "cx", "cy",
          cell = 50000L)
        .select("s_suppkey", "c_custkey")
    }),

    // Exact-integer polygon census (sp8): shoelace twice-area, winding
    // orientation, and the bbox-shifted centroid over the sp6 hexagon
    // fixture — ODD suppkeys get their ring REVERSED so both winding
    // verdicts fire (area and centroid are orientation-invariant: the
    // signed sums flip sign together and (-a)/(-b) is the identical
    // IEEE quotient). The only floats are the two final divisions,
    // replayed verbatim.
    "sp8_polygon_stats" -> ((s, d) => {
      val su = supplier(s, d).select(col("s_suppkey"),
        coord(col("s_suppkey") + 7000000L, 1).as("sx"),
        coord(col("s_suppkey") + 7000000L, 9).as("sy"))
      val verts = PolyDirs.zipWithIndex.map { case ((dx, dy), v) =>
        val sv = coord(col("s_suppkey") * 10 + lit(90000000L + v), 1) %
          10001L + 2000L
        struct((col("sx") + lit(dx) * sv).as("x"),
          (col("sy") + lit(dy) * sv).as("y"))
      }
      val ring = array(verts: _*)
      val polys = su.withColumn("poly",
        when(col("s_suppkey") % 2 === 1, reverse(ring)).otherwise(ring))
      SpatialOps.polygonStats(polys, "poly")
        .select(col("s_suppkey"), col("n_verts"), col("area2"),
          col("ccw"), col("cx"), col("cy"))
    }),

    // Incremental radius join vs the PERSISTED point index (sp7): the
    // standing customer corpus (%5 ∈ 1..3 built + %5 = 4 appended —
    // the append path sits inside the gated artifact) banked once,
    // cell-partitioned; the %5 = 0 batch probes its 3×3 neighborhoods
    // with the index scan bloom-reduced to the batch's cells. Output ≡
    // the full radius join restricted to (batch, corpus) pairs — a row
    // the append dropped/double-wrote shifts the hash. ~700 pairs at
    // sf0.01, ~70k at sf0.1.
    "sp7_radius_incremental" -> ((s, d) => {
      import graft.operators.PointIndexFixture
      val dir = PointIndexFixture.dir(s, d)
      val batch = PointIndexFixture.withCoords(customer(s, d))
        .filter(col("c_custkey") % 5 === 0)
      SpatialOps.radiusJoinIncremental(batch, dir, "c_custkey",
          "cx", "cy", radius = 25000L, expectedCells = 200000L,
          immutable = true)
        .select("a", "b", "d2")
    })
  )

  /** sp6's hexagon directions, in strictly increasing angular order
    * (0°, 63°, 117°, 180°, 243°, 297°) so any positive per-vertex
    * scales yield a simple star-shaped ring. */
  private val PolyDirs: Seq[(Long, Long)] =
    Seq((2L, 0L), (1L, 2L), (-1L, 2L), (-2L, 0L), (-1L, -2L), (1L, -2L))

  /** ECEF replay for the oracle SQL: per-point trig + rounding
    * mirrored VERBATIM from `SpatialOps.greatCircleRadiusJoin` — the
    * `e0` suffixes force DOUBLE literals (a bare decimal literal is
    * DECIMAL in DuckDB and would reassociate the arithmetic), the
    * division by 1e6 precedes the DegToRad multiply, and the multiply
    * association is (R·cosφ)·cosλ, all exactly as the Spark side. The
    * 0.017453292519943295 literal IS SpatialOps.DegToRad. */
  private def ecefSql(tbl: String, idCol: String, keyExpr: String,
                      px: String, py: String, pz: String): String =
    s"""SELECT $idCol,
          CAST(round(6371000e0 * cos(lat_ / 1e6 * 0.017453292519943295)
                               * cos(lon_ / 1e6 * 0.017453292519943295))
               AS BIGINT) AS $px,
          CAST(round(6371000e0 * cos(lat_ / 1e6 * 0.017453292519943295)
                               * sin(lon_ / 1e6 * 0.017453292519943295))
               AS BIGINT) AS $py,
          CAST(round(6371000e0 * sin(lat_ / 1e6 * 0.017453292519943295))
               AS BIGINT) AS $pz
        FROM (
          SELECT $idCol,
            (('0x' || substr(md5(($keyExpr)::VARCHAR), 1, 8))::UBIGINT
              % 360000000)::BIGINT - 180000000 AS lon_,
            (('0x' || substr(md5(($keyExpr)::VARCHAR), 9, 8))::UBIGINT
              % 170000000)::BIGINT - 85000000 AS lat_
          FROM $tbl)"""

  /** The quantized chord bound for radius r, replaying the operator's
    * driver-side computation exactly (same JVM expression). */
  private def chordBound(radiusMeters: Double): Long =
    math.round(2.0 * SpatialOps.EarthRadiusM *
      math.sin(radiusMeters / (2.0 * SpatialOps.EarthRadiusM)))

  val oracles: Map[String, String] = Map(
    "sp1_radius_join" ->
      """WITH su AS (
           SELECT s_suppkey,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS sx,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS sy
           FROM supplier),
         cu AS (
           SELECT c_custkey,
             (('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS cx,
             (('0x' || substr(md5(c_custkey::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS cy
           FROM customer)
         SELECT s_suppkey, c_custkey,
           (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) AS d2
         FROM su, cu
         WHERE (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy)
               <= 25000 * 25000""",
    "sp2_radius_knn" ->
      """WITH su AS (
           SELECT s_suppkey,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS sx,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS sy
           FROM supplier),
         cu AS (
           SELECT c_custkey,
             (('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS cx,
             (('0x' || substr(md5(c_custkey::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS cy
           FROM customer)
         SELECT c_custkey, s_suppkey,
           (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) AS d2
         FROM su, cu
         WHERE (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy)
               <= 100000::BIGINT * 100000
         QUALIFY row_number() OVER (PARTITION BY c_custkey
           ORDER BY d2, s_suppkey) <= 3""",
    "sp3_contains_join" ->
      """WITH bx AS (
           SELECT s_suppkey,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS sx,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS sy,
             ((('0x' || substr(md5((s_suppkey + 9000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000) % 20001 + 5000)::BIGINT AS hw,
             ((('0x' || substr(md5((s_suppkey + 9000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000) % 20001 + 5000)::BIGINT AS hh
           FROM supplier),
         pt AS (
           SELECT c_custkey,
             (('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS cx,
             (('0x' || substr(md5(c_custkey::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS cy
           FROM customer)
         SELECT s_suppkey, c_custkey, hw, hh
         FROM bx, pt
         WHERE abs(cx - sx) <= hw AND abs(cy - sy) <= hh""",
    "sp4_greatcircle" -> {
      val cb = chordBound(200000.0)
      s"""WITH se AS (${ecefSql("supplier", "s_suppkey",
             "s_suppkey + 7000000", "ax", "ay", "az")}),
         ce AS (${ecefSql("customer", "c_custkey",
             "c_custkey", "bx", "by", "bz")})
         SELECT s_suppkey, c_custkey,
           (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
             + (az - bz) * (az - bz) AS chord2
         FROM se, ce
         WHERE (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
             + (az - bz) * (az - bz) <= ${cb}::BIGINT * ${cb}"""
    },
    // sp6's vertex construction replayed, then the shoelace sums over
    // BBOX-SHIFTED coordinates exactly as the engine runs them; the
    // odd-key ring reversal only flips the winding verdict (the two
    // signed sums negate together, and (-a)/(-b) is the identical IEEE
    // quotient, so area and centroid come from the canonical ring)
    "sp8_polygon_stats" -> {
      val scales = (0 until 6).map { v =>
        s"""((('0x' || substr(md5((s_suppkey * 10 + ${90000000 + v})::VARCHAR),
              1, 7))::UBIGINT % 1000000) % 10001 + 2000)::BIGINT AS s$v"""
      }.mkString(",\n             ")
      val dirs = Seq((2L, 0L), (1L, 2L), (-1L, 2L), (-2L, 0L),
        (-1L, -2L), (1L, -2L))
      val verts = dirs.zipWithIndex.map { case ((dx, dy), v) =>
        s"sx + ($dx) * s$v AS x$v, sy + ($dy) * s$v AS y$v"
      }.mkString(",\n             ")
      val mnx = s"least(${(0 until 6).map(i => s"x$i").mkString(", ")})"
      val mny = s"least(${(0 until 6).map(i => s"y$i").mkString(", ")})"
      def cross(i: Int) = {
        val j = (i + 1) % 6
        s"((x$i - mnx) * (y$j - mny) - (x$j - mnx) * (y$i - mny))"
      }
      val signed = (0 until 6).map(cross).mkString(" + ")
      val cxNum = (0 until 6).map(i =>
        s"((x$i - mnx) + (x${(i + 1) % 6} - mnx)) * ${cross(i)}")
        .mkString(" + ")
      val cyNum = (0 until 6).map(i =>
        s"((y$i - mny) + (y${(i + 1) % 6} - mny)) * ${cross(i)}")
        .mkString(" + ")
      s"""WITH su AS (
           SELECT s_suppkey,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS sx,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS sy,
             $scales
           FROM supplier),
         poly AS (SELECT s_suppkey, $verts FROM su),
         sh AS (SELECT s_suppkey, $mnx AS mnx, $mny AS mny,
                  x0, y0, x1, y1, x2, y2, x3, y3, x4, y4, x5, y5
                FROM poly),
         agg AS (SELECT s_suppkey, mnx, mny,
                   ($signed)::BIGINT AS signed,
                   ($cxNum)::BIGINT AS cxnum,
                   ($cyNum)::BIGINT AS cynum
                 FROM sh)
         SELECT s_suppkey, 6::INT AS n_verts,
           abs(signed)::BIGINT AS area2,
           CASE WHEN signed = 0 THEN NULL
                WHEN s_suppkey % 2 = 1 THEN signed < 0
                ELSE signed > 0 END AS ccw,
           CASE WHEN signed = 0 THEN NULL
                ELSE mnx + cxnum::DOUBLE / (3 * signed)::DOUBLE
           END AS cx,
           CASE WHEN signed = 0 THEN NULL
                ELSE mny + cynum::DOUBLE / (3 * signed)::DOUBLE
           END AS cy
         FROM agg"""
    },
    "sp7_radius_incremental" ->
      """WITH cu AS (
           SELECT c_custkey,
             (('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS cx,
             (('0x' || substr(md5(c_custkey::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS cy
           FROM customer)
         SELECT a.c_custkey AS a, b.c_custkey AS b,
           (a.cx - b.cx) * (a.cx - b.cx)
             + (a.cy - b.cy) * (a.cy - b.cy) AS d2
         FROM cu a, cu b
         WHERE a.c_custkey % 5 = 0 AND b.c_custkey % 5 <> 0
           AND (a.cx - b.cx) * (a.cx - b.cx)
             + (a.cy - b.cy) * (a.cy - b.cy) <= 25000 * 25000""",
    "sp6_polygon_join" -> {
      // per-vertex scale + vertex coordinates, replaying the Spark
      // side's md5 windows verbatim (28-bit window % 1e6 % 10001 + 2000
      // — the same double-mod as coord() composed with the scale mod)
      val scales = (0 until 6).map { v =>
        s"""((('0x' || substr(md5((s_suppkey * 10 + ${90000000 + v})::VARCHAR),
              1, 7))::UBIGINT % 1000000) % 10001 + 2000)::BIGINT AS s$v"""
      }.mkString(",\n             ")
      val dirs = Seq((2L, 0L), (1L, 2L), (-1L, 2L), (-2L, 0L),
        (-1L, -2L), (1L, -2L))
      val verts = dirs.zipWithIndex.map { case ((dx, dy), v) =>
        s"sx + ($dx) * s$v AS x$v, sy + ($dy) * s$v AS y$v"
      }.mkString(",\n             ")
      // even-odd ray cast, six unrolled exact-integer crossing terms:
      // strict straddle test on both endpoints, cross-multiplied
      // intersection comparison sign-flipped with dy — mirrors
      // SpatialOps.rayCastInside term for term
      val terms = (0 until 6).map { i =>
        val j = (i + 1) % 6
        s"""CASE WHEN (y$i > cy) <> (y$j > cy) AND
               ((y$j - y$i > 0 AND
                 (cx - x$i) * (y$j - y$i) - (x$j - x$i) * (cy - y$i) < 0) OR
                (y$j - y$i < 0 AND
                 (cx - x$i) * (y$j - y$i) - (x$j - x$i) * (cy - y$i) > 0))
             THEN 1 ELSE 0 END"""
      }.mkString("\n           + ")
      s"""WITH su AS (
           SELECT s_suppkey,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS sx,
             (('0x' || substr(md5((s_suppkey + 7000000)::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS sy,
             $scales
           FROM supplier),
         poly AS (
           SELECT s_suppkey,
             $verts
           FROM su),
         cu AS (
           SELECT c_custkey,
             (('0x' || substr(md5(c_custkey::VARCHAR), 1, 7))::UBIGINT
               % 1000000)::BIGINT AS cx,
             (('0x' || substr(md5(c_custkey::VARCHAR), 9, 7))::UBIGINT
               % 1000000)::BIGINT AS cy
           FROM customer)
         SELECT s_suppkey, c_custkey
         FROM poly, cu
         WHERE ($terms) % 2 = 1"""
    },
    "sp5_greatcircle_knn" -> {
      val cb = chordBound(2000000.0)
      s"""WITH se AS (${ecefSql("supplier", "s_suppkey",
             "s_suppkey + 7000000", "ax", "ay", "az")}),
         ce AS (${ecefSql("customer", "c_custkey",
             "c_custkey", "bx", "by", "bz")})
         SELECT c_custkey, s_suppkey,
           (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
             + (az - bz) * (az - bz) AS chord2
         FROM se, ce
         WHERE (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
             + (az - bz) * (az - bz) <= ${cb}::BIGINT * ${cb}
         QUALIFY row_number() OVER (PARTITION BY c_custkey
           ORDER BY chord2, s_suppkey) <= 3"""
    }
  )
}
