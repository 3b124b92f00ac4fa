package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized property tests (deterministic seed, batched so each
  * property is O(1) Spark jobs) — the SURVEY §5 property suite:
  * year-union invariants, chunk token coverage, rolling-hash model
  * equality, generator/staged minhash equality on random corpora.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  test("yearNorm: random year strings obey the union invariants") {
    val samples: Seq[String] = Seq.fill(120) {
      rnd.nextInt(4) match {
        case 0 => (1700 + rnd.nextInt(400)).toString            // plain
        case 1 => val y = 1700 + rnd.nextInt(400)               // split
          s"$y/${(y + 1).toString.takeRight(2)}"
        case 2 => s"  ${1700 + rnd.nextInt(400)}  "             // padded
        case _ => Seq("", "junk", "n/a", "??", "18x5")(rnd.nextInt(5))
      }
    }
    val out = samples.toDF("y")
      .select(col("y"), CityDirOps.yearNorm(col("y")).as("yn"))
      .select(col("y"), col("yn.yearMin"), col("yn.yearMax"))
      .as[(String, Option[Int], Option[Int])].collect()
    out.foreach { case (y, mn, mx) =>
      val digitsLead = y.trim.takeWhile(_.isDigit)
      if (digitsLead.isEmpty) assert(mn.isEmpty && mx.isEmpty, y)
      else {
        val base = digitsLead.toInt
        assert(mn.contains(base), y)
        val expectMax = if (y.contains("/")) base + 1 else base
        assert(mx.contains(expectMax), y)
        assert(mn.get <= mx.get, y)
      }
    }

    // the native struct kernel equals the declarative regex formulation
    // cell-for-cell (null text included)
    val withNull = samples :+ null.asInstanceOf[String]
    val decl = withNull.toDF("y")
      .select(CityDirOps.yearNormDeclarative(col("y")).as("yn"))
      .select(col("yn.yearMin"), col("yn.yearMax"))
      .as[(Option[Int], Option[Int])].collect().toSeq
    val native = withNull.toDF("y")
      .select(CityDirOps.yearNorm(col("y")).as("yn"))
      .select(col("yn.yearMin"), col("yn.yearMax"))
      .as[(Option[Int], Option[Int])].collect().toSeq
    assert(native == decl)
  }

  test("chunk: every token covered exactly per the stride formula, texts are substrings") {
    for ((size, stride) <- Seq((4, 3), (5, 5), (3, 1), (8, 2), (6, 4))) {
      val docs = (0 until 12).map { i =>
        val n = rnd.nextInt(20) // 0..19 tokens
        (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
      }
      val byId = docs.toMap
      val chunks = TextAnalysisOps.chunk(docs.toDF("doc_id", "text"),
        "doc_id", "text", size, stride)
        .as[(Long, Int, String, Int)].collect()
      chunks.foreach { case (id, _, text, nTok) =>
        assert(byId(id).contains(text), s"chunk not a substring: $text")
        assert(text.split(" ", -1).length == nTok)
      }
      docs.foreach { case (id, text) =>
        val tokens = text.split(" ", -1)
        val covered = chunks.filter(_._1 == id)
          .flatMap(c => c._3.split(" ", -1)).toSet
        assert(tokens.toSet.subsetOf(covered),
          s"size=$size stride=$stride doc=$id lost tokens")
      }
    }
  }

  test("rolling min-hash equals the BigInt model on random ASCII text") {
    def model(s: String, w: Int): Option[Long] = {
      val b = s.getBytes("UTF-8")
      if (b.length < w) None
      else Some((0 to b.length - w).map { j =>
        (0 until w).map(t =>
          BigInt(b(j + t) & 0xff) * BigInt(257).pow(w - 1 - t)).sum
          .mod(BigInt(2147483647)).toLong
      }.min)
    }
    val alphabet = "abcdefgh XYZ012.,"
    val samples = (0 until 60).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val native = samples.toDF("id", "text")
      .select(col("id"),
        graft.functions.RollingHash.rollingMinHash(col("text"), 8))
      .as[(Long, Option[Long])].collect().toMap
    samples.foreach { case (id, s) =>
      assert(native(id) == model(s, 8), s"id=$id text='$s'")
    }
  }

  test("whole-pipeline minhash generator equals staged HOF on random corpora") {
    val words = Vector("alpha", "beta", "gamma", "", "δφ", "x1", "beta")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(
        words(rnd.nextInt(words.length))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val sh = DedupOps.shingles(col("text"), 3)
    val staged = df.filter(size(sh) > 0)
      .select(col("doc_id"), posexplode(DedupOps.lshBandHashes(
        DedupOps.minhashSignature(DedupOps.shingleHashes(sh), 16), 4, 4))
        .as(Seq("pos", "bh")))
      .as[(Long, Int, String)].collect().toSet
    val gen = df.select(col("doc_id"),
      graft.functions.MinhashSig.minhashTextBandsGen(col("text"), 3, 16, 4))
      .as[(Long, Int, String)].collect().toSet
    assert(gen == staged)
  }

  test("gramBuckets equals the declarative md5 chain on random unicode corpora, any k-set/buckets") {
    // r5 verdict item 7: the example-based parity pin (ExtOpsSpec)
    // locks the known edges; this clause sweeps random unicode word
    // soup (multi-byte chars, empty tokens, runs of spaces, nulls) ×
    // random gram-size sets × bucket counts against the executable
    // spec — the two-generator union + conv(substring(md5(...)))
    // projection the kernel fused away
    val words = Vector("alpha", "b", "", "δφγ", "héllo", "wörld",
      "日本語", "x1", "é́", "zzz")
    for ((ks, buckets) <- Seq(
        (Seq(1), 7), (Seq(2), 64), (Seq(1, 2), 1024), (Seq(1, 2, 3), 13))) {
      val docs = (0 until 30).map { i =>
        val sep = if (rnd.nextBoolean()) " " else "  "
        val t =
          if (i % 10 == 9) null.asInstanceOf[String]
          else Seq.fill(rnd.nextInt(8))(
            words(rnd.nextInt(words.length))).mkString(sep)
        (i.toLong, t)
      }
      val df = docs.toDF("id", "text")
      val declarative = ks.map(k =>
          df.select(col("id"), graft.functions.ShingleGen
            .shingleGen(col("text"), k, distinct = false)).toDF("id", "_g"))
        .reduce(_ unionByName _)
        .select(col("id"), (conv(substring(
          md5(concat(lit("seed_"), col("_g"))), 1, 8), 16, 10)
          .cast("long") % buckets).as("_b"))
        .as[(Long, Long)].collect().toSeq.sorted
      val native = df.select(col("id"), graft.functions.ShingleGen
        .gramBuckets(col("text"), ks, buckets, "seed_"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(native == declarative, s"ks=$ks buckets=$buckets")
    }
  }

  test("simhash60 equals the MessageDigest model on random unicode corpora") {
    // same executable spec as the ExtOpsSpec example pin, swept over
    // random multi-byte word soup, short docs, empty and null texts
    def model(text: String, k: Int): Option[Long] = {
      val w = text.split(" ").toSeq
      if (w.length < k) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val sums = new Array[Int](60)
        for (s <- w.sliding(k).map(_.mkString(" ")).toSeq.distinct) {
          val hex = md.digest(s.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          for (p <- 0 until 60) {
            val v = Character.digit(hex.charAt(p / 4), 16)
            sums(p) += (((v >> (p % 4)) & 1) * 2 - 1)
          }
        }
        Some((0 until 60).map(p => if (sums(p) > 0) 1L << p else 0L).sum)
      }
    }
    val words = Vector("alpha", "b", "δφγ", "héllo", "wörld", "日本語",
      "x1", "zzz", "qq", "ngram")
    for (k <- Seq(2, 3)) {
      val docs = (0 until 40).map { i =>
        val t =
          if (i % 13 == 12) null.asInstanceOf[String]
          else if (i % 11 == 10) ""
          else Seq.fill(rnd.nextInt(9))(
            words(rnd.nextInt(words.length))).mkString(" ")
        (i.toLong, t)
      }
      val out = DedupOps.simhash60(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .as[(Long, Long)].collect().toMap
      val expected = docs.flatMap { case (id, t) =>
        Option(t).flatMap(model(_, k)).map(id -> _)
      }.toMap
      assert(out == expected, s"k=$k")
    }
  }

  test("simhashHammingPairsW: pigeonhole recall holds at 60- and 120-bit widths") {
    // executable spec: signatures from the MessageDigest model at the
    // requested width; EVERY pair within maxHamming = bands-1 must
    // surface (the Manku pigeonhole guarantee), exactly once (the
    // emit-once lowest-band contract), with the exact Hamming distance.
    // Swept at the default 60/4 and the wide 120/8 geometry — the
    // 100-TB configuration the dd15 scaladoc promises.
    def sig(text: String, k: Int, bits: Int): Option[Array[Boolean]] = {
      val w = text.split(" ").toSeq
      if (w.length < k) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val sums = new Array[Int](bits)
        for (s <- w.sliding(k).map(_.mkString(" ")).toSeq.distinct) {
          val hex = md.digest(s.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          for (p <- 0 until bits) {
            val v = Character.digit(hex.charAt(p / 4), 16)
            sums(p) += (((v >> (p % 4)) & 1) * 2 - 1)
          }
        }
        Some(sums.map(_ > 0))
      }
    }
    // tiny vocabulary + short docs → dense near-dup space, so the
    // threshold actually bites
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    for ((bits, bands, maxH) <- Seq((60, 4, 3), (120, 8, 7))) {
      val docs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(4 + rnd.nextInt(5))(
          words(rnd.nextInt(words.length))).mkString(" "))
      }
      val sigs = docs.flatMap { case (id, t) =>
        sig(t, 2, bits).map(id -> _) }.toMap
      val expected = (for {
        (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
        h = sa.zip(sb).count { case (x, y) => x != y } if h <= maxH
      } yield (a, b, h)).toSet
      val got = DedupOps.simhashHammingPairsW(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 2, maxHamming = maxH,
          bands = bands, bits = bits)
        .as[(Long, Long, Int)].collect()
      assert(got.length == got.toSet.size, s"bits=$bits: duplicate pairs")
      assert(got.toSet == expected, s"bits=$bits")
    }
  }

  test("decontaminateSpans invariants: identity vs no-op eval, total self-wipe, bounds") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(10))(
        words(rnd.nextInt(words.length))).mkString(" "))
    }
    val train = docs.toDF("doc_id", "text")
    // eval sharing no vocabulary → nothing removed, text reassembles
    // to the original (single-space corpus)
    val inert = Seq((999L, "zz yy xx ww")).toDF("doc_id", "text")
    val untouched = TextAnalysisOps.decontaminateSpans(train, inert,
        "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect()
    val byId = docs.toMap
    untouched.foreach { case (id, t, n, r) =>
      assert(r == 0L && t == byId(id) && n == byId(id).split(" ").length.toLong)
    }
    // eval = train → every doc with >= k words is wiped; shorter docs
    // carry no grams and survive intact
    val wiped = TextAnalysisOps.decontaminateSpans(train, train,
        "doc_id", "text", k = 3)
      .as[(Long, String, Long, Long)].collect()
    wiped.foreach { case (id, t, n, r) =>
      if (byId(id).split(" ").length >= 3) assert(t == "" && r == n)
      else assert(t == byId(id) && r == 0L)
      assert(r >= 0L && r <= n)
    }
  }

  test("native year_in_range equals the declarative yearNorm+yearInterval filter") {
    val samples: Seq[String] = Seq.fill(210) {
      rnd.nextInt(7) match {
        case 0 => (1700 + rnd.nextInt(400)).toString
        case 1 => val y = 1700 + rnd.nextInt(400)
          s"$y/${(y + 1).toString.takeRight(2)}"
        case 2 => s"  ${1700 + rnd.nextInt(400)} "
        case 3 => Seq("", "junk", "/1850", "18/50x", "1850abc/51",
          "1850xyz")(rnd.nextInt(6))
        case 4 => // full Java \s whitespace, incl. \f and vertical tab
          Seq("\f", "\u000B", "\t\f", " \u000B ")(rnd.nextInt(4)) +
            (1700 + rnd.nextInt(400)).toString
        case 5 => // leading zeros + 10-digit int-fitting magnitudes
          Seq("0" * (1 + rnd.nextInt(7)) + (1700 + rnd.nextInt(400)),
            "2000000000", "0000000000", "2147483647")(rnd.nextInt(4))
        case _ => (1990 + rnd.nextInt(10)).toString +
          (if (rnd.nextBoolean()) "/x" else "")
      }
    }
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "y")
    for ((lo, hi) <- Seq((Some(1800), Some(1900)),
      (Some(1995), Some(1996)), (None, Some(1850)), (Some(1993), None))) {
      val declarative = df
        .select(col("id"), CityDirOps.yearNorm(col("y")).as("yn"))
        .filter(CityDirOps.yearInterval(
          col("yn.yearMin"), col("yn.yearMax"), lo, hi))
        .select("id").as[Long].collect().toSet
      val native = df
        .filter(graft.functions.YearInRange.yearInRange(col("y"), lo, hi))
        .select("id").as[Long].collect().toSet
      assert(native == declarative, s"bounds=($lo,$hi)")
    }
  }

  test("rayCastInside equals the Scala model on random star-shaped rings, any vertex count") {
    // star-shaped construction: K directions in strictly increasing
    // angle (random angles, sorted) × positive integer radii — always
    // a simple ring, frequently concave; one batched Spark job for
    // all (ring, probe) pairs
    def model(poly: Seq[(Long, Long)], px: Long, py: Long): Boolean = {
      val n = poly.length
      var c = 0
      for (i <- 0 until n) {
        val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % n)
        val dy = y2 - y1
        if ((y1 > py) != (y2 > py)) {
          val lhs = (px - x1) * dy - (x2 - x1) * (py - y1)
          if ((dy > 0 && lhs < 0) || (dy < 0 && lhs > 0)) c += 1
        }
      }
      c % 2 == 1
    }
    val cases = for (t <- 0 until 60) yield {
      val k = 3 + rnd.nextInt(10) // 3..12 vertices
      val angles = Seq.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      // reject accidental duplicate angles (collinear-from-center spokes
      // are fine; equal angles could self-intersect)
      val ring =
        if (angles.distinct.size < k) Seq((0L, 0L), (10L, 0L), (5L, 8L))
        else angles.map { a =>
          val r = 10 + rnd.nextInt(400)
          (math.round(r * math.cos(a)), math.round(r * math.sin(a)))
        }
      val probes = Seq.fill(8)(
        (rnd.nextInt(900) - 450L, rnd.nextInt(900) - 450L))
      (t.toLong, ring, probes)
    }
    val rows = cases.flatMap { case (t, ring, probes) =>
      probes.map { case (px, py) => (t, ring, px, py) }
    }
    val df = rows.toDF("t", "ring", "px", "py")
      .select(col("t"), col("px"), col("py"),
        transform(col("ring"), v =>
          struct(v.getField("_1").as("x"), v.getField("_2").as("y")))
          .as("poly"))
      .withColumn("inside",
        SpatialOps.rayCastInside(col("poly"), col("px"), col("py")))
    val got = df.select("t", "px", "py", "inside")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val byT = cases.map(c => c._1 -> c._2).toMap
    var insides = 0
    rows.foreach { case (t, _, px, py) =>
      val want = model(byT(t), px, py)
      assert(got((t, px, py)) == want, s"t=$t probe=($px,$py)")
      if (want) insides += 1
    }
    assert(insides > 20, s"degenerate fixture: only $insides inside")
  }

  test("morton interleave equals the naive bit model; order-preserving on quadrants") {
    def model(a: Int, b: Int): Long = {
      var z = 0L
      for (i <- 0 until 31) {
        z |= ((a.toLong >> i) & 1L) << (2 * i)
        z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0, 0), (1, 0), (0, 1), (Int.MaxValue, Int.MaxValue),
      (-1, 7), (123456789, 987654321)) ++
      Seq.fill(200)((rnd.nextInt(), rnd.nextInt()))
    samples.foreach { case (a, b) =>
      assert(graft.functions.Morton.interleave(a, b) == model(a, b),
        s"($a,$b)")
    }
    // both coordinates small → code small (locality of the curve)
    assert(graft.functions.Morton.interleave(3, 3) <
      graft.functions.Morton.interleave(4, 0))
  }

  test("mintId: null exactly when a component is missing/zero/empty") {
    val rows = (0 until 80).map { i =>
      val yMin = if (rnd.nextBoolean()) Some(1800 + rnd.nextInt(100)) else
        if (rnd.nextBoolean()) Some(0) else None
      val page = if (rnd.nextBoolean()) Some(rnd.nextInt(5)) else None
      val bbox = rnd.nextInt(3) match {
        case 0 => Some(Seq(1, 2, 3, 4))
        case 1 => Some(Seq.empty[Int])
        case _ => None
      }
      (i.toLong, yMin, page, bbox)
    }
    val out = rows.toDF("id", "ymin", "page", "bbox")
      .select(col("id"), CityDirOps.mintId(col("ymin"), col("ymin"),
        col("page"), col("bbox")).as("mid"))
      .as[(Long, Option[String])].collect().toMap
    rows.foreach { case (id, yMin, page, bbox) =>
      val valid = yMin.exists(_ != 0) && page.exists(_ != 0) &&
        bbox.exists(_.nonEmpty)
      assert(out(id).isDefined == valid,
        s"id=$id y=$yMin p=$page b=$bbox → ${out(id)}")
    }
  }

  test("spanDedup: conservation + first-owner invariants on random corpora") {
    // random word-soup docs over a tiny vocab so span collisions are common
    val docs = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(6)}").mkString(" "))
    }
    val segWords = 3
    val out = DedupOps.spanDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", segWords)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // reference model: walk docs in id order, first occurrence owns a span
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, text) =>
      val words = text.split(" ").toSeq
      val segs = words.grouped(segWords).map(_.mkString(" ")).toSeq
      var kept = 0L
      segs.foreach { s => if (seen.add(s)) kept += 1 }
      val (nSegs, nKept) = out(id)
      assert(nSegs == segs.size, s"doc $id seg count")
      assert(nKept == kept, s"doc $id kept count")
    }
    // conservation: every distinct span in the corpus is kept exactly once
    val totalKept = out.values.map(_._2).sum
    assert(totalKept == seen.size)
  }

  test("leakageFreeSplit: total, rep-min, and no candidate pair straddles a split") {
    // random docs over a small vocab, salted with near-dup families:
    // each family shares a base text with at most one word perturbed,
    // so minhash+LSH finds plenty of candidate pairs
    val vocab = (0 until 30).map(i => s"v$i")
    val base = (0 until 25).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(8))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = base.flatMap { case (id, text) =>
      if (rnd.nextBoolean()) {
        val w = text.split(" ")
        w(rnd.nextInt(w.length)) = vocab(rnd.nextInt(vocab.size))
        Seq((id + 1000L, w.mkString(" ")), (id + 2000L, text))
      } else Nil
    }
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val out = DedupOps.leakageFreeSplit(corpus, "doc_id", "text",
        trainPct = 80, valPct = 10, shingleK = 3, numPerm = 16, bands = 4)
      .as[(Long, Long, String)].collect()
    // total function: exactly one split row per input doc
    assert(out.map(_._1).sorted.toSeq ==
      (base ++ dups).map(_._1).sorted)
    val split = out.map(r => r._1 -> r._3).toMap
    val rep = out.map(r => r._1 -> r._2).toMap
    // rep is the cluster MIN, so never exceeds the member id
    out.foreach { case (id, r, _) => assert(r <= id, s"rep $r > id $id") }
    // THE leakage property: both endpoints of every candidate pair
    // (same pipeline parameters) land in the same split
    val pairs = DedupOps.minhashCandidates(corpus, "doc_id", "text",
        shingleK = 3, numPerm = 16, bands = 4)
      .select("a", "b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must produce candidate pairs")
    pairs.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"pair ($a,$b) rep mismatch")
      assert(split(a) == split(b), s"pair ($a,$b) straddles splits")
    }
  }

  test("saltedJoin equals the plain join on random skewed frames, any salt count") {
    val big = (0 until 300).map { _ =>
      // zipf-ish: key 0 dominates
      val k = if (rnd.nextInt(10) < 6) 0L else rnd.nextInt(20).toLong
      (k, rnd.nextInt(1000))
    }
    val small = (0 until 25).map(i => (i.toLong % 20, s"p$i"))
    val b = big.toDF("k", "v"); val sm = small.toDF("k", "w")
    val plain = b.join(sm, Seq("k"))
      .as[(Long, Int, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 2, 7, 16)) {
      val salted = SkewOps.saltedJoin(b, sm, Seq("k"), salts)
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(salted == plain, s"salts=$salts")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("shardManifest equals the Scala model on random corpora, any shard count") {
    val n = 200 + rnd.nextInt(300)
    val ids = rnd.shuffle((0L until 5000L).toList).take(n)
    val rows = ids.map(id => (id, 1L + rnd.nextInt(50)))
    val docs = rows.toDF("id", "w")
    for (nShards <- Seq(1, 3, 16)) {
      val out = TextAnalysisOps.shardManifest(docs, "id", "w", nShards)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      // model: shard + md5 order + position-salted xor, all in Scala
      val model = rows
        .groupBy { case (id, _) =>
          java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % nShards }
        .map { case (shard, members) =>
          val ordered = members.sortBy { case (id, _) =>
            (md5hex(id.toString), id) }
          val fp = ordered.zipWithIndex.map { case ((id, _), i) =>
            java.lang.Long.parseLong(md5hex(s"$id:${i + 1}").take(8), 16)
          }.reduce(_ ^ _)
          (shard, members.size.toLong, members.map(_._2.toLong).sum, fp)
        }.toSeq.sortBy(_._1)
      assert(out == model, s"nShards=$nShards")
    }
  }

  test("vocabCoverage/oovRate equal the Scala model on random corpora") {
    val alphabet = (0 until 40).map(i => s"w$i")
    val docs = (0 until 150).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(
        alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val counts = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, xs) => (t, xs.size.toLong) }
    val total = counts.values.sum.toDouble
    for (vocabSize <- Seq(5, 40, 100)) {
      val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(vocabSize)
      val out = TextAnalysisOps.vocabCoverage(df, "text", vocabSize)
        .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
      // Spark round = BigDecimal.valueOf(double).setScale(4, HALF_UP) —
      // mirror it exactly; math.rint is HALF_EVEN and can diverge on
      // exact ten-thousandth-half ratios
      def r4(d: Double): Double = java.math.BigDecimal.valueOf(d)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      val modelVocab = ranked.zipWithIndex.map { case ((t, c), i) =>
        (i + 1, t, c, r4(ranked.take(i + 1).map(_._2).sum / total))
      }
      assert(out == modelVocab, s"vocabSize=$vocabSize")
      // full vocab → the curve ends at exactly 1.0
      if (vocabSize >= counts.size) assert(out.last._4 == 1.0)
      val vocabSet = ranked.map(_._1).toSet
      val oov = TextAnalysisOps.oovRate(df, "doc_id", "text", vocabSize)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      def r4b(d: Double): Double = java.math.BigDecimal.valueOf(d)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      val modelOov = docs.map { case (id, text) =>
        val toks = text.split(" ").toSeq
        val nOov = toks.count(!vocabSet.contains(_))
        (id, toks.size.toLong, nOov.toLong,
          r4b(nOov.toDouble / toks.size))
      }
      assert(oov == modelOov, s"vocabSize=$vocabSize")
    }
  }

  test("histogram: counts conserved, bins contiguous, bounds honored") {
    val vals = Seq.fill(200)(rnd.nextDouble() * 100 - 50)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    for (nBins <- Seq(1, 4, 10)) {
      val out = TransformOps.histogram(df, "x", nBins)
        .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
      assert(out.map(_._2).sum == vals.size, s"nBins=$nBins conservation")
      assert(out.forall(b => b._1 >= 0 && b._1 < nBins), s"nBins=$nBins range")
      // per-bin lo/hi nest inside the global range, and bins don't overlap
      out.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._3 + 1e-9,
          s"nBins=$nBins bins overlap: $a vs $b")
        case _ =>
      }
    }
  }

  test("sourceOverlap equals the Set-model Jaccard on random multi-source corpora") {
    // executable spec: per-source distinct 3-gram Sets, pairwise
    // intersection/union over source pairs in string order — catches
    // any dedup slip (per-doc vs per-source distinct) or pair-order
    // drift in the posting-list formulation
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 1 to 3) {
      val docs = (0 until 30).map { i =>
        (i.toLong, s"s${rnd.nextInt(4)}",
          Seq.fill(3 + rnd.nextInt(6))(words(rnd.nextInt(words.length)))
            .mkString(" "))
      }
      val bySrc = docs.groupBy(_._2).map { case (s, ds) =>
        s -> ds.flatMap { case (_, _, t) =>
          val w = t.split(" ")
          (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
        }.toSet
      }
      val model = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        inter = (bySrc(a) & bySrc(b)).size if inter > 0
      } yield (a, b, inter.toLong, bySrc(a).size.toLong,
        bySrc(b).size.toLong,
        inter.toDouble / (bySrc(a).size + bySrc(b).size - inter))).toSet
      val got = TextAnalysisOps.sourceOverlap(
          docs.toDF("doc_id", "source", "text"), "source", "text", k = 3)
        .as[(String, String, Long, Long, Long, Double)].collect().toSet
      assert(got == model, s"trial=$trial")
    }
  }

  test("bpeLearn equals the list-rewrite Scala model on random small-alphabet corpora") {
    // executable spec: symbol-LIST rewrite (the ground truth BPE step),
    // vs the operator's sentinel-space string replace — ties in pair
    // counts (frequent on a 3-letter alphabet) and multi-char-symbol
    // boundary cases are exactly where a string formulation could
    // silently diverge. Pair tie-break is (count desc, pair asc); ASCII
    // symbols keep Scala string order and Spark's binary sort aligned.
    def modelBpe(texts: Seq[String], nMerges: Int): List[(Int, String, Long)] = {
      val wf = texts.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
        .groupBy(identity).map { case (w, l) => w -> l.size.toLong }
      var v = wf.map { case (w, f) => (w.map(_.toString).toList, f) }.toList
      (1 to nMerges).toList.map { r =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, f) <- v; Seq(a, b) <- syms.sliding(2))
          counts((a, b)) = counts.getOrElse((a, b), 0L) + f
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, s"$x $y") }
        def rewrite(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b => (a + b) :: rewrite(rest)
          case x :: rest => x :: rewrite(rest)
          case Nil => Nil
        }
        v = v.map { case (s, f) => (rewrite(s), f) }
        (r, s"$a $b", n)
      }
    }
    for (trial <- 1 to 3) {
      val texts = (0 until 12).map { _ =>
        Seq.fill(3 + rnd.nextInt(6))(
          Seq.fill(4 + rnd.nextInt(5))("abc" (rnd.nextInt(3))).mkString)
          .mkString(" ")
      }
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysisOps.bpeLearn(docs, "text", nMerges = 4)
        .as[(Int, String, Long)].collect().toList.sortBy(_._1)
      assert(got == modelBpe(texts, 4), s"trial=$trial texts=$texts")
    }
  }

  test("bpePairCounts equals the Scala model on random mixed corpora") {
    // executable spec: case-fold, extract [a-z]+ runs, weight each
    // word's adjacent char pairs by corpus frequency, (n desc, pair
    // asc) top-N. Pairs are always two ASCII letters, so the model's
    // string order and Spark's binary sort agree.
    val alphabet = "abcdefgzQRZ019 ,.!-é"
    for (topN <- Seq(3, 25)) {
      val docs = (0 until 25).map { i =>
        val t =
          if (i % 9 == 8) null.asInstanceOf[String]
          else Seq.fill(rnd.nextInt(60))(
            alphabet(rnd.nextInt(alphabet.length))).mkString
        (i.toLong, t)
      }
      val wf = docs.flatMap { case (_, t) => Option(t).toSeq.flatMap(s =>
          "[a-z]+".r.findAllIn(s.toLowerCase).toSeq) }
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val model = wf.toSeq.filter(_._1.length >= 2)
        .flatMap { case (w, f) => w.sliding(2).map(_ -> f) }
        .groupBy(_._1).map { case (p, ps) => p -> ps.map(_._2).sum }
        .toSeq.sortBy { case (p, n) => (-n, p) }.take(topN).toList
      val got = TextAnalysisOps
        .bpePairCounts(docs.toDF("doc_id", "text"), "text", topN)
        .as[(String, Long)].collect().toList
      assert(got == model, s"topN=$topN")
    }
  }

  test("tokenBudgetSelect equals the cumsum model on random corpora, any budget") {
    val words = Seq("the", "a", "of", "zebra", "spark", "quick", "data")
    for (trial <- 0 until 4) {
      val docs = (1L to (20 + rnd.nextInt(30)).toLong).map { i =>
        val n = 1 + rnd.nextInt(12)
        (i, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val scored = TextAnalysisOps.qualityMetrics(df, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens").cast("long"),
          col("stopword_ratio"))
        .as[(Long, Long, Double)].collect()
        .sortBy { case (id, _, r) => (-r, id) }
      val total = scored.map(_._2).sum
      // budgets probing: empty cut, mid-corpus, one-token-short,
      // exact-fit (whole-corpus branch), beyond
      for (budget <- Seq(0L, total / 3, total - 1, total, total + 100)) {
        val (sel, release) = TextAnalysisOps
          .tokenBudgetSelectReleasable(df, "doc_id", "text", budget)
        val out = sel.as[(Long, Long, Double)].collect().toSet
        release()
        var cum = 0L
        val expected = scored.takeWhile { case (_, n, _) =>
          cum += n; cum <= budget
        }.toSet
        assert(out == expected, s"trial=$trial budget=$budget")
      }
    }
  }

  test("sourceCap equals the md5-rank model on random groupings, any cap") {
    def h(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (trial <- 0 until 4) {
      val nSrc = 1 + rnd.nextInt(6)
      val docs = (1L to (30 + rnd.nextInt(40)).toLong)
        .map(i => (i, s"s${rnd.nextInt(nSrc)}"))
      val cap = 1 + rnd.nextInt(8)
      val df = docs.toDF("doc_id", "source")
      val out = TextAnalysisOps.sourceCap(df, "doc_id", "source", cap)
        .as[(String, Long)].collect()
      val expected = docs.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
        ds.map(_._1).sortBy(i => (h(i), i)).take(cap).map(s -> _)
      }.toSet
      assert(out.toSet == expected, s"trial=$trial cap=$cap")
      assert(out.groupBy(_._1).values.forall(_.size <= cap))
      // the large-cap histogram-cutoff path keeps the BIT-IDENTICAL
      // set (maxHeapCap = 0 forces it onto the same small data)
      val viaHist = TextAnalysisOps.sourceCap(df, "doc_id", "source",
          cap, maxHeapCap = 0)
        .as[(String, Long)].collect().toSet
      assert(viaHist == expected, s"trial=$trial cap=$cap (histogram)")
    }
  }

  test("mixToBudget equals the per-stratum window model on random corpora and budgets") {
    def h(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (trial <- 0 until 3) {
      val docs = (1L to (40 + rnd.nextInt(60)).toLong).map(i =>
        (i, s"s${rnd.nextInt(4)}", 1 + rnd.nextInt(9)))
      val budgets = Map("s0" -> (5 + rnd.nextInt(40)).toLong,
        "s1" -> (5 + rnd.nextInt(40)).toLong)
      val dflt = (5 + rnd.nextInt(40)).toLong
      val model = docs.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
        val bud = budgets.getOrElse(s, dflt)
        var run = 0L
        ds.sortBy(d => (h(d._1), d._1)).takeWhile { d =>
          run += d._3; run <= bud
        }
      }.toSet
      val out = TextAnalysisOps.mixToBudget(
          docs.toDF("doc_id", "source", "w"),
          "doc_id", "source", "w", budgets, dflt)
        .as[(Long, String, Int)].collect().toSet
      assert(out == model, s"trial=$trial budgets=$budgets dflt=$dflt")
    }
  }

  test("dedupKeepBest keeps exactly one max-quality member per cluster on random dup corpora") {
    for (trial <- 0 until 2) {
      val base = (1L to 12L).map(i =>
        (i, (1 to 6).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
      // exact dups under fresh ids — quality (= id) makes the COPY the
      // keeper, pinning the policy against the min-id default
      val dups = base.filter(_ => rnd.nextBoolean())
        .map { case (i, t) => (i + 100L, t) }
      val all = base ++ dups
      val df = all.toDF("doc_id", "text")
      val out = DedupOps.dedupKeepBest(df, "doc_id", "text",
          col("doc_id").cast("long"))
        .as[(Long, Long, Long, Long)].collect()
      val members = DedupOps.clusters(DedupOps.minhashCandidates(df,
          "doc_id", "text", shingleK = 3, numPerm = 16, bands = 4))
        .as[(Long, Long)].collect().toMap
      val byRep = all.map(_._1).groupBy(id => members.getOrElse(id, id))
      val expected = byRep.map { case (rep, ms) =>
        (ms.max, rep, ms.max, ms.size.toLong)
      }.toSet
      assert(out.toSet == expected, s"trial=$trial")
    }
  }
}
