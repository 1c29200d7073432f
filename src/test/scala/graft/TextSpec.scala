package graft

import graft.functions.TextHash
import graft.queries.TextOps

/** Unit + property tests for the text-pipeline operator family —
  * MinHash/SimHash/winnowing semantics that the DuckDB oracle can't
  * express (SURVEY §5 test plan).
  */
class TextSpec extends SparkSpec {

  // --- pure kernel properties ---

  test("hashString is deterministic and spreads") {
    assert(TextHash.hashString("spark") === TextHash.hashString("spark"))
    assert(TextHash.hashString("spark") !== TextHash.hashString("sparl"))
  }

  test("jaccard: identical sets 1.0, disjoint 0.0") {
    val a = TextHash.shingleHashes("the quick brown fox jumps", 5)
    val b = TextHash.shingleHashes("zzzzzzzqqqqqqqwwwwwww", 5)
    assert(TextHash.jaccard(a, a) === 1.0)
    assert(TextHash.jaccard(a, b) === 0.0)
  }

  test("minhash signature equality fraction estimates jaccard") {
    val base = "spark catalyst tungsten shuffle partition broadcast " * 6
    val edit = base.replace("shuffle", "exchnge")
    val sa = TextHash.shingleHashes(base, 5)
    val sb = TextHash.shingleHashes(edit, 5)
    val trueJ = TextHash.jaccard(sa, sb)
    val ma = TextHash.minHashSignature(sa, 128)
    val mb = TextHash.minHashSignature(sb, 128)
    val est = ma.zip(mb).count { case (x, y) => x == y } / 128.0
    assert(math.abs(est - trueJ) < 0.15,
      s"estimate $est vs true $trueJ")
  }

  test("minhash of identical text is identical (dup always caught)") {
    val t = "identical document text for exact duplicate detection"
    val s1 = TextHash.minHashSignature(TextHash.shingleHashes(t, 5), 128)
    val s2 = TextHash.minHashSignature(TextHash.shingleHashes(t, 5), 128)
    assert(s1.sameElements(s2))
  }

  test("simhash: identical → 0 hamming; near text → small hamming") {
    val a = "spark query engine for large scale data processing pipelines"
    val b = "spark query engine for large scale data processing pipeline"
    assert(TextHash.hamming(TextHash.simHash(a), TextHash.simHash(a)) === 0)
    val near = TextHash.hamming(TextHash.simHash(a), TextHash.simHash(b))
    val far = TextHash.hamming(TextHash.simHash(a),
      TextHash.simHash("completely unrelated words about cooking recipes"))
    assert(near < far, s"near=$near far=$far")
  }

  test("winnowing: substring sharing guarantees shared fingerprints") {
    val shared = "the winnowing algorithm selects minima per window"
    val a = "prefix text one " + shared
    val b = "other prelude xx " + shared + " suffix"
    val fa = TextHash.winnow(a, 5, 8).toSet
    val fb = TextHash.winnow(b, 5, 8).toSet
    assert(fa.intersect(fb).nonEmpty)
  }

  test("winnow_mins kernel plan is row-equal to the min-over-frame " +
      "window twin on the same rolling hashes") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    graft.functions.RollingHash.registerAll(spark)
    graft.functions.Winnow.registerAll(spark)
    val k = 5; val w = 8
    val hs = Tables.documents(spark, sf)
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        graft.functions.RollingHash.rolling_hashes(col("text"), k)
          .as("hs"))
    val kernel = SparkEntry.queries("t08_winnow_fingerprint")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // relational twin: positional explode, min over the w-row frame,
    // full windows only (p is 0-based: starts p <= n_grams - w),
    // distinct selected values per doc
    val byDoc = Window.partitionBy("doc_id")
    val twin = hs
      .withColumn("n", size(col("hs")))
      .select(col("doc_id"), col("n"),
        posexplode(col("hs")).as(Seq("p", "h")))
      .withColumn("m",
        min("h").over(byDoc.orderBy("p").rowsBetween(0, w - 1)))
      .filter(col("p") <= col("n") - w)
      .select(col("doc_id"), col("m"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twin.nonEmpty)
    assert(kernel === twin,
      s"kernel=${kernel.size} twin=${twin.size} " +
        s"onlyKernel=${(kernel -- twin).take(3)} " +
        s"onlyTwin=${(twin -- kernel).take(3)}")
  }

  test("winnow_mins rejects array<bigint> with nullable elements") {
    import org.apache.spark.sql.functions._
    graft.functions.Winnow.registerAll(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Seq[Option[Long]](Some(1L), None)))
      .toDF("hs") // element type: bigint with containsNull = true
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.Winnow.winnow_mins(col("hs"), 4)).collect()
    }
    assert(err.getMessage.contains("non-null"), err.getMessage)
  }

  test("property: minhash estimate within 0.3 of true jaccard (100 seeds)") {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(42)
    def doc(): String = Array.fill(30)(words(rnd.nextInt(words.length)))
      .mkString(" ")
    (1 to 100).foreach { _ =>
      val (a, b) = (doc(), doc())
      val sa = TextHash.shingleHashes(a, 5)
      val sb = TextHash.shingleHashes(b, 5)
      val trueJ = TextHash.jaccard(sa, sb)
      val est = TextHash.minHashSignature(sa, 128)
        .zip(TextHash.minHashSignature(sb, 128))
        .count { case (x, y) => x == y } / 128.0
      assert(math.abs(est - trueJ) <= 0.3, s"est=$est true=$trueJ a=$a b=$b")
    }
  }

  // --- distributed operator semantics ---

  test("minHashPairs finds planted exact + near duplicates") {
    import spark.implicits._
    val base = "large scale training data deduplication with minhash " +
      "lsh banding over character shingles for the win"
    val corpus = Seq(
      (0L, base),
      (1L, base), // exact dup — must be found (prob 1)
      (2L, base.replace("win", "won")), // near dup
      (3L, "totally different content about geospatial service areas"),
      (4L, "yet another unrelated document mentioning alaska utilities"))
      .toDF("doc_id", "text")
    val pairs = TextOps.minHashPairs(corpus, 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"exact dup missed: $pairs")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"near dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simHashPairs agrees with the kernel's hamming distances") {
    import spark.implicits._
    val base = "structured streaming watermark tumbling window state " +
      "store checkpoint recovery exactly once semantics guarantee"
    val texts = Seq(
      0L -> base,
      1L -> base, // identical → hamming 0, must always be found
      2L -> (base + " extra"),
      3L -> "alaska electric utility certificate chronology geometry")
    val corpus = texts.toDF("doc_id", "text")
    val got = TextOps.simHashPairs(corpus, 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sig = texts.toMap.view.mapValues(TextHash.simHash).toMap
    val expected = (for {
      (i, si) <- sig; (j, sj) <- sig
      if i < j && TextHash.hamming(si, sj) <= 3
    } yield (i, j)).toSet
    assert(got === expected)
    assert(got.contains((0L, 1L)), "identical docs must always be caught")
  }

  test("t06 reported pairs all have jaccard >= 0.5 and d1 < d2") {
    TextOps.t06MinHashLsh(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
    }
  }

  test("dedupCorpus cascade: exact dups, near dups dropped; rest kept") {
    import spark.implicits._
    val base = "training data deduplication cascade with exact and " +
      "near duplicate stages running over the corpus at scale"
    val corpus = Seq(
      (0L, base),
      (1L, base), // exact dup of 0 → dropped in exact pass
      (2L, base.replace("scale", "scples")), // near dup → dropped
      (3L, "совершенно другой документ о геометрии сервисных зон"),
      (4L, "the quick brown fox jumps over the lazy dog repeatedly"))
      .toDF("doc_id", "text")
    val kept = TextOps.dedupCorpus(corpus, 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 3L, 4L), s"got $kept")
  }

  test("spanDedup strikes later span occurrences, keeps first in place") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      // shares the 5-gram "a b c d e" with doc 1 at pos 3 → words
      // 3..7 struck, leaving "x y z"
      (2L, "x y a b c d e z"),
      // shares overlapping dup grams "c d e f g" (pos 1) and
      // "d e f g h" (pos 2) with doc 1 → union covers pos 1..6,
      // only the trailing novel words survive
      (3L, "c d e f g h p q"),
      // shorter than k → no grams, kept whole
      (4L, "p q"))
      .toDF("doc_id", "text")
    val out = TextOps.spanDedup(docs, 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text")))
      .toMap
    assert(out(1L) === ((0L, "a b c d e f g h")))
    assert(out(2L) === ((5L, "x y z")))
    assert(out(3L) === ((6L, "p q")))
    assert(out(4L) === ((0L, "p q")))
  }

  test("dedupIncremental: drops corpus dups and intra-batch dups, keeps novel") {
    import spark.implicits._
    val a = "existing corpus document about spark catalyst optimizer " +
      "rules and physical planning strategies for large clusters"
    val c = "fresh near duplicate pair about minhash banding and " +
      "locality sensitive hashing for near duplicate detection"
    val corpus = Seq((0L, a)).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, a), // dup of corpus → dropped
      (11L, "genuinely novel content about alaska service areas"),
      (12L, c), // intra-batch pair, lower id → kept
      (13L, c.replace("detection", "detect"))) // near dup of 12 → dropped
      .toDF("doc_id", "text")
    val kept = TextOps.dedupIncremental(corpus, newDocs, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L), s"got $kept")
  }

  test("dedupIncrementalIndexed: same decisions from a stored band table") {
    import spark.implicits._
    val a = "existing corpus document about spark catalyst optimizer " +
      "rules and physical planning strategies for large clusters"
    val c = "fresh near duplicate pair about minhash banding and " +
      "locality sensitive hashing for near duplicate detection"
    val corpus = Seq((0L, a)).toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, a), // dup of corpus → dropped
      (11L, "genuinely novel content about alaska service areas"),
      (12L, c), // intra-batch pair, lower id → kept
      (13L, c.replace("detection", "detect"))) // near dup of 12 → dropped
      .toDF("doc_id", "text")
    // the index frame is what ensureBandIndex persists — here built
    // in-memory so the test exercises the join/verify/drop logic alone
    val index = TextOps.portableBandTable(corpus)
    val kept = TextOps.dedupIncrementalIndexed(
        index, newDocs, corpus.unionByName(newDocs), 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L), s"got $kept")
  }

  test("multi-batch ingest loop: index updates carry kept docs forward, " +
      "dropped docs never re-enter") {
    import spark.implicits._
    val a = "alpha document about spark catalyst optimizer rules and " +
      "physical planning strategies for large analytics clusters"
    val b = "beta document about minhash banding and locality sensitive " +
      "hashing for near duplicate detection at corpus scale"
    val c = "gamma document entirely about alaska utility service areas"
    val corpus = Seq((0L, a)).toDF("doc_id", "text")
    val b1 = Seq((10L, a + "!"), (11L, b)).toDF("doc_id", "text")
    val b2 = Seq((20L, b + "!"), (21L, c), (22L, a.replace("large", "big")))
      .toDF("doc_id", "text")
    val texts = corpus.unionByName(b1).unionByName(b2)
    val index0 = TextOps.portableBandTable(corpus)
    val kept1 = TextOps.dedupIncrementalIndexed(index0, b1, texts, 0.5)
    assert(kept1.collect().map(_.getLong(0)).toSet === Set(11L),
      "near-dup of corpus dropped, novel kept")
    val index1 = TextOps.updateBandIndex(index0, b1.join(kept1, "doc_id"))
    val kept2 = TextOps.dedupIncrementalIndexed(index1, b2, texts, 0.5)
    // 20 dups kept-doc 11; 22 dups corpus doc 0; 21 is novel
    assert(kept2.collect().map(_.getLong(0)).toSet === Set(21L))
  }

  test("t15 indexed plan reproduces the full-sign drop decisions exactly") {
    // equivalence oracle for the round-3 redesign: the stored-index t15
    // must keep precisely the ids the ad-hoc full-corpus signing keeps
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val pairs = TextOps.minHashPairsPortable(docs, 0.5)
    val expected = {
      import org.apache.spark.sql.functions._
      val drops = pairs
        .filter(col("d1") >= 400 || col("d2") >= 400)
        .select(when(col("d1") >= 400 && col("d2") < 400, col("d1"))
          .when(col("d2") >= 400 && col("d1") < 400, col("d2"))
          .otherwise(greatest(col("d1"), col("d2"))).as("doc_id"))
        .distinct()
      docs.filter(col("doc_id") >= 400).select("doc_id")
        .join(drops, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
    }
    val got = SparkEntry.queries("t15_incremental_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected, s"indexed=${got.size} fullsign=${expected.size}")
  }

  test("t15b small-batch serve path keeps exactly the full-sign keeps " +
      "on its own split") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = maxId - maxId / TextOps.SmallBatchFraction
    val pairs = TextOps.minHashPairsPortable(docs, 0.5)
    val expected = {
      val drops = pairs
        .filter(col("d1") >= cut || col("d2") >= cut)
        .select(when(col("d1") >= cut && col("d2") < cut, col("d1"))
          .when(col("d2") >= cut && col("d1") < cut, col("d2"))
          .otherwise(greatest(col("d1"), col("d2"))).as("doc_id"))
        .distinct()
      docs.filter(col("doc_id") >= cut).select("doc_id")
        .join(drops, Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
    }
    val got = SparkEntry.benchOnly("t15b_small_batch_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected,
      s"t15b=${got.size} fullsign=${expected.size}")
  }

  test("rolling_hashes: native expression matches the brute polynomial, " +
      "handles nulls/short strings, stays in codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.RollingHash.registerAll(spark)
    val df = Seq((1L, "abcdefg"), (2L, "abcd"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.functions.RollingHash.rolling_hashes(col("text"), 5).as("hs"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1)).map(_ => r.getSeq[Long](1))).toMap
    def brute(s: String): Seq[Long] = (0 to s.length - 5).map { i =>
      s.substring(i, i + 5).foldLeft(0L)((h, c) => h * 257 + c)
    }
    assert(got(1L).get === brute("abcdefg"))
    assert(got(2L).get === Seq.empty) // under k code points -> no grams
    assert(got(3L).isEmpty)           // null in -> null out
    // SQL registration resolves too
    val viaSql = df.filter($"doc_id" === 1L)
      .selectExpr("rolling_hashes(text, 5, 257) AS hs")
      .head().getSeq[Long](0)
    assert(viaSql === brute("abcdefg"))
    // native doGenCode (no CodegenFallback): over a real scan (a local
    // Seq constant-folds to LocalTableScan) the projection must stay
    // inside a WholeStageCodegen span
    val plan = Tables.documents(spark, sf)
      .select(graft.functions.RollingHash.rolling_hashes(col("text"), 5))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the simple plan string
    assert("""\*\(\d+\) Project \[rolling_hashes""".r
      .findFirstIn(plan).isDefined,
      s"rolling_hashes projection not inside a codegen stage:\n$plan")
  }

  test("t25 LM quality: common-bigram text outscores token soup, " +
      "scores are finite log-probs") {
    import spark.implicits._
    // real corpus: every scored doc has a strictly negative finite score
    val rows = TextOps.t25LmQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lp = r.getAs[Double]("avg_logp")
      assert(lp < 0.0 && !lp.isNaN && !lp.isInfinite, s"bad score: $r")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
    // synthetic: a doc built from the corpus' dominant bigram must
    // outscore a doc of hapax gibberish (the CCNet gate's whole point)
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat again"),
      (3L, "the cat sat on the mat too"),
      (4L, "zqx wvu ponm lkj ihg fed")) // every bigram unique
      .toDF("doc_id", "text")
    val scored = TextOps.lmQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(scored(1L) > scored(4L),
      s"common-bigram doc must outscore gibberish: $scored")
  }

  test("md5_hash48 expression equals the composed conv(substr(md5)) " +
      "form it replaced") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.Md5Hash48.registerAll(spark)
    val vals = Seq("", "a", "hello", "héllo wörld", "ab😀cd",
      "0", "12345", "the quick brown fox").toDF("s")
    val rows = vals.select(
      graft.functions.Md5Hash48.md5_hash48(col("s")).as("fast"),
      conv(substring(md5(col("s").cast("binary")), 1, 12), 16, 10)
        .cast("long").as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("portableBandsKernel equals the portableBandTable plan per doc") {
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 60)
      .select("doc_id", "text")
    val fromPlan = TextOps.portableBandTable(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val fromKernel = docs.collect().flatMap { r =>
      TextOps.portableBandsKernel(r.getString(1))
        .map { case (b, s) => (r.getLong(0), b, s) }
    }.toSet
    assert(fromKernel === fromPlan)
  }

  test("portableBandsKernel matches the plan on astral / multi-byte text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab😀cd ef😀gh ij"),     // surrogate pairs inside grams
      (2L, "😀😀😀😀"),            // 4 code points -> under k, no bands
      (3L, "héllo wörld déjà vu")) // 2-byte UTF-8 chars
      .toDF("doc_id", "text")
    val fromPlan = TextOps.portableBandTable(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val fromKernel = docs.collect().flatMap { r =>
      TextOps.portableBandsKernel(r.getString(1))
        .map { case (b, s) => (r.getLong(0), b, s) }
    }.toSet
    assert(fromKernel === fromPlan)
    assert(!fromPlan.exists(_._1 == 2L), "under-k doc must have no bands")
  }

  test("banding kernel property: equals the plan on random unicode docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31337L)
    val alphabets: Seq[Array[Int]] = Seq(
      ('a' to 'z').mkString + " .,!",
      "абвгд的是了ab ",
      "ab😀c ").map(_.codePoints().toArray)
    val docs = (1 to 60).map { id =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val cps = Array.fill(rnd.nextInt(30))(alpha(rnd.nextInt(alpha.length)))
      (id.toLong, new String(cps, 0, cps.length))
    }.toDF("doc_id", "text")
    val fromPlan = TextOps.portableBandTable(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val fromKernel = docs.collect().flatMap { r =>
      TextOps.portableBandsKernel(r.getString(1))
        .map { case (b, s) => (r.getLong(0), b, s) }
    }.toSet
    assert(fromKernel === fromPlan)
  }

  test("rolling hash property: equals brute polynomial on random " +
      "unicode strings, injective on ASCII grams") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(20260812L)
    // alphabets as CODE POINTS (picking UTF-16 chars would split the
    // emoji's surrogate pair into invalid lone surrogates, which are
    // not representable strings)
    val alphabets: Seq[Array[Int]] = Seq(
      ('a' to 'z').mkString + " .,!",                     // ASCII
      "абвгд的是了ab ",                                   // BMP unicode
      "ab😀c ")                                 // surrogate pairs
      .map(_.codePoints().toArray)
    def brute(cps: Array[Int], k: Int, base: Long): Seq[Long] =
      (0 to cps.length - k).map(i =>
        (0 until k).foldLeft(0L)((h, j) => h * base + cps(i + j)))
    for (_ <- 1 to 200) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(40)
      val cps = Array.fill(len)(alpha(rnd.nextInt(alpha.length)))
      val s = new String(cps, 0, cps.length)
      val k = 1 + rnd.nextInt(7)
      val got = graft.functions.RollingHash
        .hashes(UTF8String.fromString(s), k, 257L)
        .toLongArray().toSeq
      assert(got === brute(cps, k, 257L), s"k=$k s=$s")
      assert(got.length === math.max(0, cps.length - k + 1))
      // injectivity on ASCII: base 257 > any code point in the gram
      if (s.forall(_ < 128) && cps.length >= k) {
        val grams = (0 to cps.length - k).map(i =>
          cps.slice(i, i + k).toSeq)
        assert(grams.distinct.length === got.distinct.length)
      }
    }
  }

  test("prefix-filtered jaccard join is EXACT: finds every pair brute force finds") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 80)
      .select("doc_id", "text")
    val threshold = 0.6
    val got = TextOps.prefixJaccardPairs(docs, threshold)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute force over all pairs on the driver
    val texts = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")
        .distinct.toSet).toMap
    val ids = texts.keys.toSeq.sorted
    val expected = (for {
      i <- ids; j <- ids if i < j
      inter = texts(i).intersect(texts(j)).size
      union = texts(i).size + texts(j).size - inter
      if union > 0 && inter.toDouble / union >= threshold
    } yield (i, j)).toSet
    assert(got === expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("t03 lang scores are non-negative and predicted is a known lang") {
    val rows = TextOps.t03LangId(spark, sf).collect()
    val known = Set("en", "es", "de", "fr", "zh")
    rows.foreach { r =>
      assert(known.contains(r.getAs[String]("predicted_lang")))
      assert(r.getAs[Double]("s_en") >= 0.0)
    }
  }

  test("t04 dedup groups have n_dupes > 1 and stable keeper") {
    TextOps.t04ExactDedup(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_dupes") > 1)
      assert(r.getAs[Long]("keep_doc") >= 0)
    }
  }

  test("t21 decontamination flags exactly the planted n-gram overlap") {
    val rows = TextOps.t21Decontaminate(spark, sf).collect()
    // eval docs (id % 50 == 0) are never flagged as contaminated train
    rows.foreach(r =>
      assert(r.getAs[Long]("doc_id") % TextOps.DecontamEvalMod != 0))
    // every hit points at a real eval doc and shares >= 1 gram
    rows.foreach { r =>
      assert(r.getAs[Long]("first_eval_doc") %
        TextOps.DecontamEvalMod === 0)
      assert(r.getAs[Long]("n_shared") >= 1)
    }
    // ground truth: brute-force gram overlap on the collected corpus
    val n = TextOps.DecontamGramLen
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
    def grams(t: Array[String]) =
      t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % TextOps.DecontamEvalMod == 0)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs
      .filter(_._1 % TextOps.DecontamEvalMod != 0)
      .map { case (id, t) => id -> grams(t).count(evalGrams) }
      .filter(_._2 > 0).toMap
    assert(rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_shared").toInt).toMap === expected)
  }

  test("t49 bloom gate: no false negatives, real map-side pruning, " +
      "bounded false-positive sliver") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val (ref, cand) = TextOps.bloomRefCand(docs)
    val candP = cand.persist()
    val nCand = candP.count()
    val survivors =
      TextOps.bloomSurvivors(spark, ref, candP).persist()
    val nSurv = survivors.count()
    val refSet = ref.select("g").distinct()
    val nTrue = candP.join(refSet, "g").count()
    // Bloom invariant the verify join's exactness rests on: every
    // truly-overlapping candidate gram survives the gate
    assert(candP.join(refSet, "g")
      .join(survivors.select("g").distinct(), Seq("g"), "left_anti")
      .count() === 0L)
    // the gate actually prunes — survivors are overlap-sized, not
    // candidate-sized (corpus overlap measured ~6%, fpp 1%)
    assert(nSurv < nCand / 2,
      s"gate passed $nSurv of $nCand candidate grams")
    // the false-positive sliver is fpp-sized (generous 5x margin for
    // sketch variance at fixture scale)
    val fp = nSurv - nTrue
    assert(fp <= (5 * TextOps.BloomFpp * (nCand - nTrue)).toLong + 1,
      s"false positives $fp of ${nCand - nTrue} non-overlap grams")
    candP.unpersist(); survivors.unpersist()
  }

  test("t49 result equals the bloom-free exact join (the gate is " +
      "invisible in the output)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val (ref, cand) = TextOps.bloomRefCand(docs)
    val refTable = ref.groupBy("g")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("ref_doc"))
    val exact = cand.join(refTable, "g")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct("g")
          .as("n_shared"),
        org.apache.spark.sql.functions.min("ref_doc")
          .as("first_ref_doc"))
      .orderBy("doc_id").collect().toSeq
    val gated = TextOps.t49BloomDecontaminate(spark, sf)
      .collect().toSeq
    assert(gated === exact)
  }

  test("t26 span decontamination strikes exactly the t21-flagged docs " +
      "and its counts reconcile with the rebuilt text") {
    val rows = TextOps.t26SpanDecontaminate(spark, sf).collect()
    rows.foreach { r =>
      // eval docs never appear — only train rows get surgery
      assert(r.getAs[Long]("doc_id") % TextOps.DecontamEvalMod != 0)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed")
        === r.getAs[Long]("n_words"))
      val kept = r.getAs[String]("cleaned_text")
        .split("\\s+").count(_.nonEmpty)
      assert(kept === r.getAs[Long]("n_kept").toInt,
        s"rebuilt text of doc ${r.getAs[Long]("doc_id")} does not " +
          "match its kept count")
    }
    // a doc loses spans iff t21 flags it (both read the same overlap)
    val cut = rows.filter(_.getAs[Long]("n_removed") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    val flagged = TextOps.t21Decontaminate(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(cut === flagged)
  }

  test("t27 cluster resolution keeps the max-quality member of every " +
      "t19 group") {
    val rows = TextOps.t27ClusterKeepBest(spark, sf).collect()
    val groups = TextOps.t19DedupGroups(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_id"))
    val byGroup = groups.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(rows.map(_.getAs[Long]("group_id")).toSet === byGroup.keySet)
    // brute quality recompute on the collected corpus
    val q = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).trim.split("\\s+")
        r.getLong(0) ->
          BigDecimal(w.distinct.length.toDouble / w.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    rows.foreach { r =>
      val members = byGroup(r.getAs[Long]("group_id"))
      assert(r.getAs[Long]("n_members") === members.size)
      assert(r.getAs[Long]("n_dropped") === members.size - 1)
      val best = members.toSeq.map(id => (q(id), id))
        .sortBy { case (qq, id) => (-qq, id) }.head._2
      assert(r.getAs[Long]("kept_doc") === best,
        s"group ${r.getAs[Long]("group_id")} kept the wrong member")
    }
  }

  test("t28 sequence packing: offsets and boundary flags reconcile " +
      "with the straight running total") {
    val rows = TextOps.t28SequencePack(spark, sf).collect()
      .sortBy(_.getAs[Long]("doc_id"))
    val L = TextOps.PackSeqLen
    var cum = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("start_seq") === cum / L)
      assert(r.getAs[Long]("end_seq") === (cum + n - 1) / L)
      assert(r.getAs[Long]("seq_offset") === cum % L)
      assert(r.getAs[Boolean]("crosses") === (cum / L != (cum + n - 1) / L))
      cum += n
    }
  }

  test("t35 mixture budget: every language's admitted tokens land in " +
      "[budget, budget + last doc), the scarcest language admits " +
      "everything, and admission follows the (bucket, doc_id) order") {
    val rows = TextOps.t35MixtureBudget(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val totals = byLang.map { case (l, rs) =>
      l -> rs.map(_.getAs[Long]("n_tokens")).sum }
    val budget = totals.values.min
    byLang.foreach { case (lang, rs) =>
      val adm = rs.filter(_.getAs[Boolean]("admitted"))
      val admTokens = adm.map(_.getAs[Long]("n_tokens")).sum
      if (totals(lang) <= budget)
        assert(adm.length === rs.length,
          s"$lang: under-budget language must admit every doc")
      else {
        // take-until-crossed: admitted ≥ budget, overshoot < last doc
        val lastLen = adm.maxBy(_.getAs[Long]("cum_before"))
          .getAs[Long]("n_tokens")
        assert(admTokens >= budget && admTokens < budget + lastLen,
          s"$lang: admitted $admTokens outside [$budget, " +
            s"${budget + lastLen})")
      }
      // the admitted set is a PREFIX of the (cum_before) order: no
      // admitted doc starts after a rejected one
      val maxAdm = adm.map(_.getAs[Long]("cum_before")).max
      val rej = rs.filterNot(_.getAs[Boolean]("admitted"))
      if (rej.nonEmpty)
        assert(rej.map(_.getAs[Long]("cum_before")).min > maxAdm,
          s"$lang: a rejected doc starts before an admitted one")
    }
    // non-degenerate on this corpus: some language actually downsamples
    assert(totals.values.exists(_ > budget),
      "corpus has no over-budget language — the test proves nothing")
  }

  test("t29 mixture upsampling: per-lang epochs equal the capped " +
      "ceiling ratio and every doc appears exactly reps times") {
    val counts = graft.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mx = counts.values.max
    val expectedReps = counts.map { case (l, n) =>
      l -> math.min(TextOps.MixtureMaxEpochs, (mx + n - 1) / n) }
    val rows = TextOps.t29MixtureUpsample(spark, sf).collect()
    // per-doc appearance count = its lang's reps; epochs are 0..reps-1
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val lang = rs.head.getAs[String]("lang")
      assert(rs.length === expectedReps(lang))
      assert(rs.map(_.getAs[Long]("epoch")).sorted
        .sameElements(0L until expectedReps(lang)))
    }
    // the dominant language runs exactly 1 epoch; the mixture is
    // non-degenerate on this corpus (some lang actually upsamples)
    val dominant = counts.maxBy(_._2)._1
    assert(expectedReps(dominant) === 1L)
    assert(expectedReps.values.exists(_ > 1L),
      "corpus too uniform for the upsampling test to exercise anything")
  }

  test("t30 chunking: chunks tile every doc with the declared overlap " +
      "and each chunk's text is the exact token-window slice") {
    val (l, st) = (TextOps.ChunkLen, TextOps.ChunkStride)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+"))
      .toMap
    val byDoc = TextOps.t30Chunk(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val w = docs(id)
      val sorted = rs.sortBy(_.getAs[Long]("chunk_id"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong)
        val start = i * st
        assert(r.getAs[Long]("chunk_start") === start.toLong)
        val exp = w.slice(start, start + l)
        assert(r.getAs[Long]("n_chunk_tokens") === exp.length.toLong)
        assert(r.getAs[String]("chunk_text") === exp.mkString(" "))
      }
      // full coverage: the last chunk reaches the end of the doc, and
      // one fewer chunk would leave a tail uncovered
      val k = sorted.length
      assert((k - 1) * st + l >= w.length, s"doc $id tail uncovered")
      assert(k == 1 || (k - 2) * st + l < w.length,
        s"doc $id has a redundant trailing chunk")
    }
    // the corpus exercises both single- and multi-chunk docs
    assert(byDoc.values.exists(_.length > 1))
    assert(byDoc.values.exists(_.length == 1))
  }

  test("t31 eval sampling: exactly k docs per language, selected by " +
      "the portable bucket order") {
    val k = TextOps.EvalSamplePerLang
    val rows = TextOps.t31EvalSample(spark, sf).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length === k.toInt, s"$lang: ${rs.length} docs, want $k")
      // ranks are 1..k and bucket-ordered (doc_id tiebreak)
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).sameElements(1 to k.toInt))
      val keys = sorted.map(r =>
        (r.getAs[Long]("bucket"), r.getAs[Long]("doc_id")))
      assert(keys.sameElements(keys.sorted), s"$lang: not bucket-ordered")
    }
  }

  test("t32 span masking: splicing each target span back over its " +
      "sentinel reproduces the original document exactly") {
    val rows = TextOps.t32SpanMask(spark, sf).collect()
    val orig = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim
        .split("\\s+").toSeq).toMap
    assert(rows.length === orig.size)
    var masked = 0L
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // parse the target into sentinel → span-tokens
      val tgt = r.getAs[String]("target_text")
      val spans: Map[String, Seq[String]] =
        if (tgt.isEmpty) Map.empty
        else "<extra_id_\\d+>".r.findAllIn(tgt).toSeq
          .zip(tgt.split("<extra_id_\\d+>").drop(1).toSeq)
          .map { case (sent, body) =>
            sent -> body.trim.split("\\s+").toSeq }.toMap
      val rebuilt = r.getAs[String]("input_text").split("\\s+").toSeq
        .flatMap(tok => spans.getOrElse(tok, Seq(tok)))
      assert(rebuilt === orig(id), s"doc $id does not round-trip")
      assert(r.getAs[Long]("n_masked") ===
        spans.values.map(_.length.toLong).sum)
      assert(r.getAs[Long]("n_tokens") === orig(id).length.toLong)
      masked += r.getAs[Long]("n_masked")
    }
    // the corpus-wide mask rate is near the configured 3/20 = 15%
    val total = orig.values.map(_.length.toLong).sum
    val rate = masked.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate off target")
  }

  test("t39 cascade agrees with its component rules and orders " +
      "reasons first-fail-wins") {
    val cascade = TextOps.t39FilterCascade(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val quality = TextOps.t02QualityScore(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Boolean]("keep_doc"))).toMap
    val rep = TextOps.t22Repetition(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("flagged"))
      .toMap
    val langOk = TextOps.t03LangId(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("predicted_lang") == r.getAs[String]("lang")))
      .toMap
    assert(cascade.nonEmpty)
    cascade.foreach { case (doc, (keep, reason)) =>
      val (nWords, q) = quality(doc)
      val pass = q && !rep.getOrElse(doc, false) && langOk(doc)
      assert((keep == 1) === pass,
        s"doc $doc: keep=$keep vs components pass=$pass ($reason)")
      // first-fail-wins ordering spot checks
      if (reason == "too_short") assert(nWords < 20)
      if (reason == "repetitive") assert(q && rep(doc))
      if (reason == "lang_mismatch")
        assert(q && !rep.getOrElse(doc, false) && !langOk(doc))
    }
    // the cascade discriminates: multiple reasons actually fire
    assert(cascade.values.map(_._2).toSet.size >= 3)
  }

  test("t40 leakage-safe split: every near-dup group lands in ONE " +
      "split, and the per-doc split would have leaked") {
    val rows = TextOps.t40LeakageSafeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    // the leakage invariant: one split per group
    rows.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"group $g spans splits ${members.map(_._3).distinct.toSeq}")
    }
    // non-degenerate: real multi-doc groups exist and all three
    // splits are populated
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "no multi-doc groups — dedup map empty?")
    assert(rows.map(_._3).distinct.sorted.toSeq === Seq(0, 1, 2))
    // the whole-group rule matters: at least one multi-doc group
    // contains members whose PER-DOC buckets straddle a split
    // boundary — the leak the group split prevents
    val bucketOf = (id: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    def docSplit(id: Long): Int = {
      val b = bucketOf(id)
      if (b < 800000) 0 else if (b < 900000) 1 else 2
    }
    val wouldLeak = multi.values.exists(ms =>
      ms.map(m => docSplit(m._1)).distinct.length > 1)
    assert(wouldLeak,
      "no group straddles a per-doc split boundary — invariant untested")
  }

  test("t22 repetition scores are exact on a constructed document") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "w x y z q r")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("t22fix")
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long")
          .as("n_chars"))
      .write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = TextOps.t22Repetition(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: bigrams = (a b),(b a),(a b),(b a) → top share 2/4 = 0.5
    //        trigrams = (a b a),(b a b),(a b a) → dups 1 of 3 = 0.3333
    assert(rows(1L).getAs[Double]("top_bigram_share") === 0.5)
    assert(rows(1L).getAs[Double]("dup_trigram_frac") === 0.3333)
    assert(rows(1L).getAs[Boolean]("flagged"))
    // doc 2: all distinct → shares 1/5 = 0.2 (top bigram), dup 0
    assert(rows(2L).getAs[Double]("top_bigram_share") === 0.2)
    assert(rows(2L).getAs[Double]("dup_trigram_frac") === 0.0)
    assert(rows(2L).getAs[Boolean]("flagged"), // 0.2 > 0.05
      "short docs trip the top-share rule by construction")
  }

  test("t23 source curation: dup rate and keep flag per source") {
    val rows = TextOps.t23SourceCuration(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val dup = r.getAs[Long]("dup_docs")
      assert(n > 0 && dup >= 0 && dup < n)
      assert(r.getAs[Boolean]("keep") ===
        (r.getAs[Double]("dup_rate") <= 0.02))
    }
    assert(rows.exists(_.getAs[Long]("dup_docs") > 0),
      "the planted duplicates must surface in at least one source")
  }

  test("t41 merge kernel: ordered passes, non-overlap run parity, " +
      "merged tokens inert in later rules") {
    import graft.queries.TextOps.bpeApplyRules
    // self-pair rule merges a run at alternate positions (parity)
    assert(bpeApplyRules("x x x x x".split(" "), Seq(("x", "x")))
      .toSeq === Seq("x x", "x x", "x"))
    // plain pair, two separate occurrences
    assert(bpeApplyRules("a b c a b".split(" "), Seq(("a", "b")))
      .toSeq === Seq("a b", "c", "a b"))
    // rule order matters: (b,c) first consumes the b that (a,b)
    // would have taken
    assert(bpeApplyRules("a b c".split(" "),
      Seq(("b", "c"), ("a", "b"))).toSeq === Seq("a", "b c"))
    // a merged token (contains a space) never re-matches a
    // single-word rule side
    assert(bpeApplyRules("a b b".split(" "),
      Seq(("a", "b"), ("a b", "b"))).toSeq === Seq("a b b"))
    assert(bpeApplyRules(Array("solo"), Seq(("a", "b")))
      .toSeq === Seq("solo"))
  }

  test("t41 encodes with t38's learned rules and the merges do " +
      "non-trivial work") {
    val rows = TextOps.t41BpeEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nRaw = r.getAs[Int]("n_raw")
      val nTok = r.getAs[Int]("n_tokens")
      assert(nTok <= nRaw && nTok >= (nRaw + 1) / 2,
        "each merge consumes exactly two tokens")
      assert(r.getAs[Int]("n_merges") === nRaw - nTok)
    }
    assert(rows.map(_.getAs[Int]("n_merges").toLong).sum > 0,
      "the top-8 mined pairs must actually occur in the corpus")
  }

  test("t44 char-level kernel: empty separator concatenates merges, " +
      "run parity holds, and subwords splice back to the word") {
    import graft.queries.TextOps.bpeApplyRules
    def chars(w: String) = w.toCharArray.map(_.toString)
    assert(bpeApplyRules(chars("aaaa"), Seq(("a", "a")), "")
      .toSeq === Seq("aa", "aa"))
    assert(bpeApplyRules(chars("banana"), Seq(("a", "n")), "")
      .toSeq === Seq("b", "an", "an", "a"))
    // cascading is impossible: merged "an" never re-matches the
    // single-char rule sides
    assert(bpeApplyRules(chars("banana"),
      Seq(("a", "n"), ("a", "n")), "")
      .toSeq === Seq("b", "an", "an", "a"))
    // subwords always splice back to the original word
    Seq("mississippi", "xyzzy", "a").foreach { w =>
      val out = bpeApplyRules(chars(w),
        Seq(("s", "s"), ("i", "s"), ("p", "i")), "")
      assert(out.mkString === w)
    }
  }

  test("t44 emits a zeroed row (not NULL, not a dropped doc) for an " +
      "empty/whitespace-only document") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files
      .createTempDirectory("graft-t44-edge").toFile
    try {
      import spark.implicits._
      Seq((1L, "alpha beta alpha beta", "en", "web", 21L),
        (2L, "   ", "en", "web", 3L),
        (3L, "", "en", "web", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"${dir.getAbsolutePath}/documents.parquet")
      val rows = TextOps.t44BpeCharEncode(spark, dir.getAbsolutePath)
        .collect()
      assert(rows.length === 3, "no document may be dropped")
      Seq(2L, 3L).foreach { id =>
        val r = rows.find(_.getLong(0) == id).get
        assert(r.getAs[Int]("n_chars") === 0)
        assert(r.getAs[Int]("n_tokens") === 0)
        assert(r.getAs[Int]("n_merges") === 0)
        assert(!r.isNullAt(r.fieldIndex("ids_checksum")),
          "empty stream checksum must be 0, not NULL")
        assert(r.getAs[Long]("ids_checksum") === 0L)
      }
      assert(rows.find(_.getLong(0) == 1L).get
        .getAs[Int]("n_chars") === 18)
    } finally graft.streaming.EventStreams.deleteRecursively(dir)
  }

  test("t45 greedy trainer re-counts after each merge: on xyxyxy the " +
      "iterative list diverges from the static ranking") {
    import spark.implicits._
    // static char-pair ranking of "xyxyxy" is (x,y):3 then (y,x):2;
    // the GREEDY loop instead merges (x,y) first, and the re-count
    // then sees [xy,xy,xy] — so step 2 selects (xy,xy):2, a pair that
    // does not even exist before the first merge, and step 3 merges
    // the resulting [xyxy, xy]. Pinning this list pins the re-count.
    val docs = Seq((1L, "xyxyxy")).toDF("doc_id", "text")
    val got = TextOps.bpeTrainOf(spark, docs, 6)
      .collect().map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1, "x", "y", 3L),
      (2, "xy", "xy", 2L),
      (3, "xyxy", "xy", 1L)),
      "exhaustion after step 3 must stop the loop early")
  }

  test("t45 on the corpus: full depth reached, step 1 equals the " +
      "static top pair, selection counts never increase") {
    val rows = TextOps.t45BpeTrain(spark, sf).collect()
    assert(rows.length === TextOps.BpeTrainDepth)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    // before any merge the greedy top-1 IS the static top-1
    val static = TextOps.bpeCharRules(spark, sf).head
    assert((rows.head.getString(1), rows.head.getString(2)) === static)
    // each merge can only shrink existing pair counts, and every new
    // pair it creates occurs at most once per merged occurrence — so
    // the greedy selection counts are non-increasing
    val ns = rows.map(_.getLong(3)).toSeq
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns)
  }

  test("t44 encodes the corpus into subwords: counts bounded, " +
      "merges non-trivial") {
    val rows = TextOps.t44BpeCharEncode(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (nc, nt) = (r.getAs[Int]("n_chars"), r.getAs[Int]("n_tokens"))
      assert(nt <= nc && 2 * nt >= nc)
      assert(r.getAs[Int]("n_merges") === nc - nt)
    }
    assert(rows.map(_.getAs[Int]("n_merges").toLong).sum > 0,
      "the mined char pairs must actually occur")
  }

  test("t42 vocab: merged tokens materialize with dense gap-free ids " +
      "in (count, token) order") {
    val rows = TextOps.t42VocabBuild(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("token_id")).toSeq ===
      (1 to rows.length), "ids must be dense from 1")
    // strictly ranked: counts non-increasing, token ascending on ties
    rows.sliding(2).foreach { case Array(a, b) =>
      val (ca, cb) = (a.getAs[Long]("n_occurrences"),
        b.getAs[Long]("n_occurrences"))
      assert(ca > cb || (ca == cb &&
        a.getAs[String]("token") < b.getAs[String]("token")))
    case _ => ()
    }
    assert(rows.exists(_.getAs[String]("token").contains(" ")),
      "at least one MERGED token (contains a space) must enter the vocab")
    rows.foreach(r => assert(r.getAs[Long]("n_docs") <=
      r.getAs[Long]("n_occurrences")))
  }

  test("t43 OOV audit: counts are consistent with a direct re-encode " +
      "and the verdict splits the corpus") {
    val rows = TextOps.t43OovAudit(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (n, oov) = (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_oov"))
      assert(oov >= 0 && oov <= n)
      assert((r.getAs[Int]("keep") == 1) === (oov * 10 <= 3 * n))
    }
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length,
      s"budget must discriminate, kept=$kept")
  }

  test("t46 piiRedact: each class redacts in order, multi-hit docs " +
      "redact fully, and near-miss negatives pass through untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // one positive per class
      ("reach me at bob.smith+x@mail.example.com today",
        "reach me at <EMAIL> today"),
      ("origin 10.20.3.251 logged", "origin <IP> logged"),
      ("case 512-34-5678 filed", "case <ID> filed"),
      ("call 555-123-4567 today", "call <PHONE> today"),
      // multi-hit: two classes in one doc
      ("a@b.io or 10.0.0.1 then", "<EMAIL> or <IP> then"),
      // near-miss negatives: version strings, wrong field widths,
      // missing TLD, digit runs — all untouched
      ("release v1.2.3 shipped", "release v1.2.3 shipped"),
      ("ticket 12-34-5678 is not an id", "ticket 12-34-5678 is not an id"),
      ("ping a@b no tld here", "ping a@b no tld here"),
      ("serial 5551234567 plain", "serial 5551234567 plain"))
    val got = cases.map(_._1).toDF("text")
      .select(TextOps.piiRedact(col("text")).as("r"))
      .as[String].collect().toSeq
    got.zip(cases.map(_._2)).foreach { case (g, w) =>
      assert(g === w)
    }
  }

  test("t46 scrub: counts agree with the redaction, the review flag " +
      "is the >=2 rule, and residue-0 documents carry no PII") {
    val rows = TextOps.t46PiiScrub(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val total = r.getAs[Int]("pii_total")
      assert(total === r.getAs[Int]("n_emails") + r.getAs[Int]("n_ips") +
        r.getAs[Int]("n_ids") + r.getAs[Int]("n_phones"))
      assert((r.getAs[Int]("needs_review") == 1) === (total >= 2))
      val id = r.getAs[Long]("doc_id")
      // the augmentation contract: residue decides the classes
      if (id % 5 == 0 && id % 7 != 0) assert(total === 0,
        s"doc $id should be PII-free")
      if (id % 5 == 1) assert(r.getAs[Int]("n_emails") >= 1)
      if (id % 5 == 2) assert(r.getAs[Int]("n_ips") === 1)
      if (id % 5 == 3) assert(r.getAs[Int]("n_ids") === 1)
      if (id % 5 == 4) assert(r.getAs[Int]("n_phones") === 1)
      if (id % 7 == 0) assert(r.getAs[Int]("n_emails") >= 1)
    }
    // the flag must discriminate (docs with both residue-class and
    // %7 email exist at sf0.001: e.g. doc 21)
    assert(rows.exists(_.getAs[Int]("needs_review") == 1))
    assert(rows.exists(_.getAs[Int]("needs_review") == 0))
  }

  test("t47 fuzzy resolve: two-pass blocking is complete (every " +
      "corrupted record resolves), every match is ground truth, and " +
      "the distance reflects the injected edit class") {
    val rows = TextOps.t47FuzzyResolve(spark, sf).collect()
    assert(rows.length === 500,
      "one edit cannot break both blocking keys — recall must be total")
    rows.foreach { r =>
      // ground truth everywhere: the only tie in the construction
      // (an appended char vs a same-words registry entry whose
      // suffix extends the key's digits, e.g. dirty 3 vs clean 35)
      // is resolved by the deterministic smallest-clean-id rule,
      // which always prefers the true shorter-suffix entity
      assert(r.getAs[Int]("is_correct") === 1,
        s"dirty ${r.getAs[Long]("dirty_id")} resolved to " +
          s"${r.getAs[Long]("match_id")}")
      val d = r.getAs[Int]("distance")
      if (r.getAs[Long]("dirty_id") % 4 == 2) assert(d === 2)
      else assert(d === 1)
      assert(r.getAs[Int]("n_candidates") >= 1)
    }
    // blocking must actually block: no dirty record may see the
    // whole registry as candidates
    assert(rows.forall(_.getAs[Int]("n_candidates") < 500 / 2))
  }

  test("t47 hot-cell escalation: a prefix-AND-length-concentrated " +
      "registry routes through the 4-char key with recall intact, " +
      "and the candidate volume shrinks vs the banded key") {
    import org.apache.spark.sql.functions._
    // the worst case for the composite (prefix, length) key: every
    // name shares pre3 AND length — one cell. Names diverge at the
    // 4th char (16 values), so the escalated pre4 key splits the
    // cell 16 ways; the suffix side stays naturally diverse (unique
    // digit tails).
    val n = 800
    val reg = spark.range(n).select(col("id").as("k"),
      concat(lit("zzz"),
        // 4th char cycles a..p — the escalation's split point
        chr(lit(97) + pmod(col("id"), lit(16))),
        lpad(col("id").cast("string"), 8, "0")).as("name"),
      lit(8).as("wlen"))
    val dirty = TextOps.fuzzyDirtyOf(reg)
    def matches(r: org.apache.spark.sql.DataFrame) = r
      .select("dirty_id", "match_id", "distance").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val esc = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50)
    val banded = TextOps.fuzzyResolveOf(reg, dirty,
      hotBudget = Int.MaxValue)
    val flat = TextOps.fuzzyResolveOf(reg, dirty, lengthBand = false,
      hotBudget = Int.MaxValue)
    val mEsc = matches(esc)
    // the single-edit recall contract survives the key lengthening
    // (names are length 12 ≥ 9): every variant finds the same match
    // set, and every dirty record resolves to its ground truth
    assert(mEsc === matches(banded) && mEsc === matches(flat))
    assert(mEsc.size === n)
    assert(esc.collect().forall(_.getAs[Int]("is_correct") === 1))
    // the escalation must actually bite: in-cell candidate work
    // drops ~16× when the one hot cell splits on the 4th char
    def candVolume(r: org.apache.spark.sql.DataFrame): Long = r
      .agg(sum(col("n_candidates"))).collect()(0).getLong(0)
    val (vEsc, vBand) = (candVolume(esc), candVolume(banded))
    assert(vEsc * 4 < vBand,
      s"escalated candidate volume $vEsc not << banded $vBand")
  }

  test("t47 escalation rung 2: names sharing FOUR leading chars at " +
      "one length split on the 5-char key with recall intact, and " +
      "candidate volume drops vs both the banded and key4 regimes") {
    import org.apache.spark.sql.functions._
    // key4's worst case: every name shares pre4 ("zzzz") AND length;
    // the 5th char cycles 16 values, so only the pre5 rung splits
    // the cell. Length 13 ≥ 11 satisfies the rung-2 recall guard.
    val n = 800
    val reg = spark.range(n).select(col("id").as("k"),
      concat(lit("zzzz"),
        chr(lit(97) + pmod(col("id"), lit(16))),
        lpad(col("id").cast("string"), 8, "0")).as("name"),
      lit(9).as("wlen"))
    val dirty = TextOps.fuzzyDirtyOf(reg)
    def matches(r: org.apache.spark.sql.DataFrame) = r
      .select("dirty_id", "match_id", "distance").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    def candVolume(r: org.apache.spark.sql.DataFrame): Long = r
      .agg(sum(col("n_candidates"))).collect()(0).getLong(0)
    val full = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50)
    val key4 = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50,
      deepKey = false, saltHot = false)
    val banded = TextOps.fuzzyResolveOf(reg, dirty,
      hotBudget = Int.MaxValue)
    val mFull = matches(full)
    // the single-edit recall contract survives the second
    // lengthening: identical match sets, total recall, ground truth
    assert(mFull === matches(key4) && mFull === matches(banded))
    assert(mFull.size === n)
    assert(full.collect().forall(_.getAs[Int]("is_correct") === 1))
    // rung 2 must bite where rung 1 cannot: pre4 is one cell here,
    // so the key4 regime's candidate volume stays at banded level
    // while the pre5 split cuts it ~16×
    val (vFull, vKey4) = (candVolume(full), candVolume(key4))
    assert(vFull * 4 < vKey4,
      s"rung-2 candidate volume $vFull not << key4 regime $vKey4")
  }

  test("t47 salt rung: a cell no key rung can split (five shared " +
      "leading chars, one length) keeps an IDENTICAL candidate set " +
      "and match set under salting — salting re-partitions, never " +
      "prunes") {
    import org.apache.spark.sql.functions._
    val n = 800
    val reg = spark.range(n).select(col("id").as("k"),
      concat(lit("zzzzz"),
        lpad(col("id").cast("string"), 8, "0")).as("name"),
      lit(9).as("wlen"))
    val dirty = TextOps.fuzzyDirtyOf(reg)
    def matches(r: org.apache.spark.sql.DataFrame) = r
      .select("dirty_id", "match_id", "distance").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    def candVolume(r: org.apache.spark.sql.DataFrame): Long = r
      .agg(sum(col("n_candidates"))).collect()(0).getLong(0)
    // maxKey pinned off: this test prices SALT on a cell no key
    // rung may split, and the r19 maximal-prefix rung would reroute
    // it first (its own test follows)
    val salted = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50,
      maxKey = false)
    val noSalt = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50,
      saltHot = false, maxKey = false)
    assert(matches(salted) === matches(noSalt))
    assert(matches(salted).size === n)
    assert(salted.collect()
      .forall(_.getAs[Int]("is_correct") === 1))
    // the invariant that spares the oracle any salt mirroring:
    // per-dirty candidate counts are unchanged by the shard split
    assert(candVolume(salted) === candVolume(noSalt),
      "salting must not change the candidate set")
  }

  test("t47 maximal-prefix rung: a cell hot at pre5 whose members " +
      "differ only deep inside the string splits on pre_{blen-7} " +
      "with recall intact — including edits that corrupt the " +
      "maximal key itself — and candidate volume collapses vs the " +
      "salt-final ladder") {
    import org.apache.spark.sql.functions._
    // head(10) shared by every name, 3 discriminating digits in the
    // middle, 7-digit unique tail: blen 20 ≥ 13, the (pre5, blen)
    // cell holds all n names, pre_{13} reaches the middle digits
    // (unique per name) while the last 7 stay outside the key —
    // exactly the word-registry shape the k=32/64 conc4 probe
    // showed salting cannot shrink
    val n = 800
    val reg = spark.range(n).select(col("id").as("k"),
      concat(lit("AAAAABBBBB"),
        lpad(col("id").cast("string"), 3, "0"),
        lpad(col("id").cast("string"), 7, "0")).as("name"),
      lit(13).as("wlen"))
    val dirty = TextOps.fuzzyDirtyOf(reg)
    def matches(r: org.apache.spark.sql.DataFrame) = r
      .select("dirty_id", "match_id", "distance").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    def candVolume(r: org.apache.spark.sql.DataFrame): Long = r
      .agg(sum(col("n_candidates"))).collect()(0).getLong(0)
    val maxed = TextOps.fuzzyResolveOf(reg, dirty, hotBudget = 50)
    val saltFinal = TextOps.fuzzyResolveOf(reg, dirty,
      hotBudget = 50, maxKey = false)
    // recall: the dirty edits land anywhere in positions 1..14
    // (fuzzyDirtyOf's residue arithmetic over wlen 13) — edits
    // INSIDE pre_{13} corrupt the maximal key and must be caught by
    // the suffix pass (unique digit tails keep it cold), edits at
    // the tail leave the maximal key intact and ride the new rung.
    // The regime-invariant is each dirty name's BEST DISTANCE: any
    // single-edit-relationship pair (the recall contract) survives
    // every rung, while INCIDENTAL pairs two independent edits
    // apart — which prefix/suffix blocking never promised — may be
    // pruned by the wider key and flip a distance-2 tie's winner;
    // the rung changes candidates, so the oracle mirrors it and the
    // declared semantics stay pinned there
    def distOf(r: org.apache.spark.sql.DataFrame) = r
      .select("dirty_id", "distance").collect()
      .map(x => (x.getLong(0), x.getInt(1))).toMap
    val dMax = distOf(maxed)
    assert(dMax === distOf(saltFinal))
    assert(dMax.size === n)
    assert(matches(maxed).size === n)
    // ground truth holds for every single-edit dirty; transposition
    // rows (k % 4 == 2, distance 2) can LEGITIMATELY tie with a
    // clean name sharing the swapped digits' prefix (e.g. dirty of
    // 38 swaps "…038|0…" into "…030|8…" — distance 2 from both
    // clean 38 and clean 30, and the deterministic tie-break picks
    // the smaller id), so they assert resolution, not identity
    assert(maxed.collect()
      .filter(_.getAs[Long]("dirty_id") % 4 != 2)
      .forall(_.getAs[Int]("is_correct") === 1))
    // the rung must bite where salt cannot: the salt-final ladder
    // carries the full n² cell as candidates (spread, not shrunk),
    // the maximal key cuts it to near-linear
    val (vMax, vSalt) = (candVolume(maxed), candVolume(saltFinal))
    assert(vMax * 20 < vSalt,
      s"maximal-rung candidate volume $vMax not << salt-final $vSalt")
  }

  test("t48 cutoff: threshold semantics on the weight histogram — " +
      "the cutoff is the smallest weight past the drop fraction, and " +
      "every doc tied at it keeps") {
    import spark.implicits._
    // 8 docs at weight -0.2 (bottom), 4 at -0.1, 4 at 0.3: drop
    // 3/4 of 16 = 12 -> ascending cum passes 12 inside the -0.1
    // run? cum(-0.2)=8, cum(-0.1)=12 NOT > 12, cum(0.3)=16 > 12 ->
    // cutoff 0.3; the -0.1 tie-run sits exactly at the boundary and
    // drops as a block (threshold, not drop-exactly-k)
    val scored = ((1 to 8).map(i => (i.toLong, "a", 1L, -0.2)) ++
      (9 to 12).map(i => (i.toLong, "a", 1L, -0.1)) ++
      (13 to 16).map(i => (i.toLong, "a", 1L, 0.3)))
      .toDF("doc_id", "source", "n_grams", "w")
    val cut = TextOps.dsirCutOf(scored).collect()(0).getDouble(0)
    assert(cut === 0.3)
    // widen the tie-run past the boundary: cum(-0.1)=13 > 12 -> the
    // whole tie-run now KEEPS (cutoff -0.1, 9 docs admitted)
    val scored2 = ((1 to 7).map(i => (i.toLong, "a", 1L, -0.2)) ++
      (8 to 13).map(i => (i.toLong, "a", 1L, -0.1)) ++
      (14 to 16).map(i => (i.toLong, "a", 1L, 0.3)))
      .toDF("doc_id", "source", "n_grams", "w")
    val cut2 = TextOps.dsirCutOf(scored2).collect()(0).getDouble(0)
    assert(cut2 === -0.1)
  }

  test("t48/s27 serve path: a document whose grams hash only to " +
      "buckets the training corpus never occupied still scores — at " +
      "the add-one smoothing floor — instead of silently dropping") {
    import spark.implicits._
    val train = ((0L until 4L).map(i =>
      (i, "alpha beta gamma delta epsilon", "en", "a")) ++
      (10L until 12L).map(i =>
        (i, "foo bar baz qux quux", "fr", "a")))
      .toDF("doc_id", "text", "lang", "source")
    val model = TextOps.dsirModelOf(train)
    // serve-time docs: one all-novel vocabulary, one raw-present but
    // target-absent (the fr vocabulary)
    val serve = Seq(
      (100L, "zulu xray whiskey victor uniform", "xx", "b"),
      (101L, "foo bar baz qux", "fr", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val w = TextOps.dsirScoreWith(serve, model)
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(w.contains(100L),
      "all-novel doc must get a verdict, not vanish from the gate")
    // every never-seen gram scores the same neutral smoothing prior
    // ln((1/ntB)/(1/nrB)), so the mean is exactly its 4-decimal
    // round (+0.0 for the sign norm) — the add-one ceiling that
    // target-exclusive grams tie and raw-common grams fall below
    val floor = BigDecimal(math.log(model.nrB / model.ntB))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    assert(w(100L) === floor,
      s"novel doc must score the smoothing prior $floor, got ${w(100L)}")
    assert(w(100L) > w(101L),
      "no-evidence must outscore evidence-against (raw-present, " +
        "target-absent grams)")
  }

  test("t48 scoring: documents sharing the target language's bigram " +
      "vocabulary outscore alien-vocabulary documents, whatever " +
      "their own lang label; under-2-token docs sit out") {
    import spark.implicits._
    val en = (0L until 8L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en", "a"))
    // target-like vocabulary under a NON-target label: DSIR selects
    // on content, not on the label that trained the model
    val like = Seq((100L, "the quick brown fox jumps", "xx", "b"))
    val alien = Seq((200L, "zzz qqq www eee rrr ttt", "xx", "b"))
    val short = Seq((300L, "loner", "en", "b"))
    val docs = (en ++ like ++ alien ++ short)
      .toDF("doc_id", "text", "lang", "source")
    val w = TextOps.dsirScoredOf(docs)
      .select("doc_id", "w").as[(Long, Double)].collect().toMap
    assert(!w.contains(300L), "a 1-token doc has no bigram evidence")
    assert(w(100L) > w(200L),
      s"target-like ${w(100L)} must outweigh alien ${w(200L)}")
    en.foreach(e => assert(w(e._1) > w(200L)))
  }
}
