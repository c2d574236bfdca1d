package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.NativeColumns

/** The native DotProduct expression must be bit-identical to the
  * declarative HOF fold it replaces (that equivalence is what keeps the
  * DuckDB oracle parity valid).
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Run `f` with [[graft.plans.RewriteDeclarativeDot]] excluded, so the
    * HOF fold actually executes interpreted (the differential tests would
    * otherwise compare the native expression against itself).
    */
  private def withRewriteExcluded[T](f: => T): T = {
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "graft.plans.RewriteDeclarativeDot")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case scala.None => spark.conf.unset(key)
    }
  }

  test("native dot == HOF fold bit-for-bit on random float vectors") {
    withRewriteExcluded {
      val vecs = (0 until 200).map { i =>
        val rnd = new scala.util.Random(i)
        (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
      }.toDF("a", "b")
      val diffs = vecs.select(
        NativeColumns.dot(col("a"), col("b")).as("nat"),
        hofDot(col("a"), col("b")).as("hof"))
        .filter(col("nat") =!= col("hof"))
      assert(diffs.count() == 0)
    }
  }

  test("optimizer rewrites the declarative HOF dot fold to the native expression") {
    // a parquet source, not a LocalRelation — ConvertToLocalRelation would
    // otherwise eagerly evaluate the projection and hide the rewrite
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val hof = vecs.select(hofDot(col("a"), col("b")).as("d"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "the canonical fold must rewrite to DotProduct")
    // a fold that ISN'T a dot product (zero = 1.0) must not be touched
    val notDot = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!notDot.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "a non-zero seed changes semantics — no rewrite")
    // and the rewrite is value-preserving vs the interpreted fold
    val rewritten = hof.as[Double].collect()
    val interpreted = withRewriteExcluded {
      val h = vecs.select(hofDot(col("a"), col("b")).as("d"))
      assert(!h.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      h.as[Double].collect()
    }
    assert(rewritten.sameElements(interpreted))
  }

  test("native dot: length mismatch and null elements yield NULL (zip_with parity)") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f)), // length mismatch
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f))) // clean
      .toDF("a", "b")
    val out = df.select(NativeColumns.dot(col("a"), col("b"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(None, Some(11.0)))
  }

  test("native dot works on array<double> too") {
    val r = Seq((Array(1.5, 2.0), Array(2.0, -1.0))).toDF("a", "b")
      .select(NativeColumns.dot(col("a"), col("b"))).as[Double].head()
    assert(r == 1.0)
  }

  test("graft_dot is SQL-callable via GraftExtensions") {
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("hilbert2D: exhaustive bijection + adjacency on 32x32; codegen == companion; null") {
    import graft.functions.expressions.HilbertIndex2D
    val bits = 5
    val n = 1 << bits
    // bijection: every cell maps to a distinct d in [0, n^2)
    val cells = for { x <- 0 until n; y <- 0 until n }
      yield (x, y, HilbertIndex2D.index(x.toLong, y.toLong, bits))
    val ds = cells.map(_._3)
    assert(ds.toSet == (0L until n.toLong * n).toSet, "must be a bijection onto [0, n^2)")
    // the defining Hilbert property: consecutive d are GRID NEIGHBORS —
    // Morton fails this at every quadrant boundary
    val byD = cells.map(c => c._3 -> ((c._1, c._2))).toMap
    (1L until n.toLong * n).foreach { d =>
      val (x0, y0) = byD(d - 1); val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"d=$d jumps from ($x0,$y0) to ($x1,$y1)")
    }
    // Column path (codegen) == companion; null in -> null out
    val df = Seq((3L, 7L), (31L, 0L), (0L, 0L)).toDF("x", "y")
    val got = df.select(NativeColumns.hilbert2D(col("x"), col("y"), bits)).as[Long].collect()
    assert(got.toSeq == Seq(
      HilbertIndex2D.index(3L, 7L, bits), HilbertIndex2D.index(31L, 0L, bits), 0L))
    val nulls = Seq((java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
      .toDF("x", "y").select(NativeColumns.hilbert2D(col("x"), col("y"), bits)).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("blockHash64: known payloads, null/empty, Column == SQL == companion") {
    import graft.functions.expressions.BlockHash64
    val rnd = new scala.util.Random(11)
    val payloads: Seq[Array[Byte]] = Seq(
      null, Array.emptyByteArray, Array[Byte](1), Array.fill(7)(9.toByte),
      Array.tabulate(256)(i => i.toByte), Array.fill(293)(rnd.nextInt(256).toByte))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
    val viaCol = df.select(col("id"),
      NativeColumns.blockHash64(col("payload")).as("h")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      val expected = if (p == null) null else BlockHash64.hash(p)
      assert(viaCol(i.toLong) == expected, s"payload $i")
    }
    df.createOrReplaceTempView("bh_in")
    val viaSql = spark.sql("SELECT id, graft_blockhash64(payload) AS h FROM bh_in").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(viaSql == viaCol)
    // non-binary input is an analysis-time type error, not a runtime crash
    intercept[Exception] { spark.sql("SELECT graft_blockhash64('s')").collect() }
  }

  test("the whole native family is SQL-callable via GraftExtensions") {
    val n = spark.sql("SELECT graft_normalize(array(3.0D, 4.0D)) AS v")
      .as[Seq[Double]].head()
    assert(n == Seq(0.6, 0.8))
    val q = spark.sql("SELECT graft_quantize_int8(array(0.5D, -1.0D)) AS v").head().getSeq[Byte](0)
    assert(q == Seq(64.toByte, (-127).toByte))
    // simhash: equals the Column-API form, both hash variants
    val viaSql = spark.sql("SELECT graft_simhash(array('a','b','c')) AS h, " +
      "graft_simhash(array('a','b','c'), true) AS hm").head()
    val viaCol = Seq(Tuple1(Seq("a", "b", "c"))).toDF("w").select(
      NativeColumns.simhashWords(col("w"), md5 = false),
      NativeColumns.simhashWords(col("w"), md5 = true)).head()
    assert(viaSql.getLong(0) == viaCol.getLong(0) && viaSql.getLong(1) == viaCol.getLong(1))
    val b = spark.sql("SELECT graft_hyperplane_buckets(array(0.1D, -0.2D, 0.7D), 2, 4) AS b")
      .head().getSeq[Int](0)
    val bCol = Seq(Tuple1(Seq(0.1, -0.2, 0.7))).toDF("v")
      .select(NativeColumns.hyperplaneBuckets(col("v"), 2, 4)).head().getSeq[Int](0)
    assert(b == bCol && b.length == 2)
    // non-literal SQL parameter is an analysis-time error, not a crash
    intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_buckets(array(1.0D), CAST(rand()*2 AS INT), 4)").collect()
    }
  }

  test("native hyperplane buckets == declarative per-plane folds on random vectors") {
    val vecs = (0 until 200).map { i =>
      val rnd = new scala.util.Random(i)
      Tuple1(Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("v")
    val diffs = vecs.select(
      graft.functions.Vectors.bandedBuckets(col("v"), 4, 4).as("nat"),
      graft.functions.Vectors.bandedBucketsDeclarative(col("v"), 4, 4).as("dec"))
      .filter(not(col("nat") === col("dec")))
    assert(diffs.count() == 0)
  }

  test("native hyperplane buckets: null vector -> NULL row; null element -> all-zero buckets") {
    val df = Seq(
      (1L, null: Array[java.lang.Float]),
      (2L, Array[java.lang.Float](1.0f, null, 2.0f)),
      (3L, Array[java.lang.Float](1.0f, -1.0f, 2.0f)))
      .toDF("id", "v")
    val out = df.select(col("id"),
      graft.functions.Vectors.bandedBuckets(col("v"), 2, 2).as("b"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1)))
      .toMap
    assert(out(1L) == null)
    assert(out(2L) == Seq(0, 0))
    assert(out(3L) != null && out(3L).length == 2)
  }

  test("native minhash signature == explode/groupBy/min-aggregate form") {
    val docs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(40)("w" + rnd.nextInt(300)).mkString(" "))
    }.toDF("doc_id", "text")
    val k = 16
    val native = graft.operators.Dedup
      .minhashSignature(docs, "doc_id", "text", n = 3, k = k)
      .as[(Long, Seq[Long])].collect().toMap
    // the original aggregate formulation, reproduced as the reference spec
    val p = 2147483647L
    val hashed = docs
      .select(col("doc_id"), graft.functions.Text.words(col("text")).as("__w"))
      .select(col("doc_id"), explode(transform(
        graft.functions.Text.shinglesFromWords(col("__w"), 3),
        s => pmod(xxhash64(s), lit(p)))).as("hx"))
    val minima = graft.operators.Dedup.minhashCoefficients(k).zipWithIndex.map {
      case ((a, b), i) => min(pmod(col("hx") * a + b, lit(p))).as(s"m$i")
    }
    val agg = hashed.groupBy("doc_id").agg(minima.head, minima.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("mh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == agg)
  }

  test("native simhash == explode/vote-aggregate form") {
    val docs = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i + 7)
      (i.toLong, Seq.fill(30)("w" + rnd.nextInt(200)).mkString(" "))
    }.toDF("doc_id", "text")
    val native = graft.operators.Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // the original vote-aggregation formulation, reproduced as the spec
    val toks = docs.select(col("doc_id"),
      explode(transform(graft.functions.Text.words(col("text")), t => xxhash64(t))).as("h"))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"v$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce((a, b) => a.bitwiseOR(b)).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(native == agg)
  }

  test("native minhash signature: empty shingle set -> doc dropped") {
    val docs = Seq((1L, "only two"), (2L, "three word doc here")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.minhashSignature(docs, "doc_id", "text", n = 3, k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(2L)) // doc 1 has < 3 words: no 3-gram shingles
  }

  test("topKByScore == rank window, incl. score ties and multi-partition merge") {
    val rnd = new scala.util.Random(11)
    // duplicate scores force tie-breaks; 13 partitions force partial merges
    val rows = (0 until 5000).map(i => (i % 40L, rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("query_id", "cosine", "neighbor_id").repartition(13)
    val agg = df.groupBy("query_id")
      .agg(NativeColumns.topKByScore(col("cosine"), col("neighbor_id"), 7).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cosine"), (col("pos") + 1).as("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 7)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == win)
  }

  test("l2Normalize: unit norm, zero vector to zeros, null element to NULL") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(_ => Tuple1(Array.fill(32)(rnd.nextFloat() * 2 - 1))).toDF("v")
    val bad = vecs
      .select(NativeColumns.l2Normalize(col("v")).as("n"))
      .select(NativeColumns.dot(col("n"), col("n")).as("d"))
      .filter(abs(col("d") - 1.0) > 1e-12)
    assert(bad.count() == 0)
    val zero = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(NativeColumns.l2Normalize(col("v"))).as[Seq[Double]].head()
    assert(zero == Seq(0.0, 0.0))
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null))).toDF("v")
      .select(NativeColumns.l2Normalize(col("v"))).collect()
    assert(withNull(0).isNullAt(0))
  }

  test("native dot on int arrays is integer-exact (quantized path)") {
    val r = Seq((Array(127, -127, 100, 1), Array(127, 127, -100, 0))).toDF("a", "b")
      .select(NativeColumns.dot(col("a"), col("b"))).as[Double].head()
    // 127*127 - 127*127 - 100*100 + 0 = -10000 — every partial sum is an
    // integer well inside double's exact range
    assert(r == -10000.0)
  }

  test("quantizeInt8: known vectors, zero vector, null element, dequant error bound") {
    val r = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), NativeColumns.quantizeInt8(col("v")).as("q"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Int](1)).toMap
    assert(r(1L) == Seq(127, -63, 0)) // -0.5*127+0.5 = -63.0 exactly
    assert(r(2L) == Seq(0, 0, 0)) // zero vector: no division by zero
    // null element -> NULL result
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null))).toDF("v")
      .select(NativeColumns.quantizeInt8(col("v"))).collect()
    assert(withNull(0).isNullAt(0))
    // reconstruction error <= scale/2 on random vectors
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 100).map(_ => Array.fill(64)(rnd.nextFloat() * 2 - 1)).toDF("v")
    val bad = vecs.select(col("v"), NativeColumns.quantizeInt8(col("v")).as("q"))
      .select(aggregate(
        zip_with(col("v"), col("q"),
          (x, q) => abs(x.cast("double") -
            q * (aggregate(col("v"), lit(0.0),
              (a, e) => greatest(a, abs(e.cast("double")))) / 127.0))),
        lit(0.0), (a, e) => greatest(a, e)).as("maxerr"),
        (aggregate(col("v"), lit(0.0),
          (a, e) => greatest(a, abs(e.cast("double")))) / 254.0).as("halfscale"))
      .filter(col("maxerr") > col("halfscale") + lit(1e-9))
    assert(bad.count() == 0)
  }

  test("native hyperplane buckets rejects non-array types at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1("nope")).toDF("v")
        .select(graft.functions.Vectors.bandedBuckets(col("v"), 2, 2)).collect()
    }
    assert(e.getMessage.contains("graft_hyperplane_buckets"))
  }

  test("imageDims parses hand-crafted PNG/JPEG headers and tolerates corruption") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(x: Int) = b(x >>> 24, (x >>> 16) & 0xff, (x >>> 8) & 0xff, x & 0xff)
    def be16(x: Int) = b((x >>> 8) & 0xff, x & 0xff)
    val pngSig = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def png(w: Int, h: Int) =
      pngSig ++ be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++ b(8, 6, 0, 0, 0)
    // JPEG with an EXIF APP1 segment (the phone-camera shape), a COM, a
    // stray RST marker, then a PROGRESSIVE SOF2 frame header
    def jpegExif(w: Int, h: Int) = {
      val exif = "Exif".getBytes ++ b(0) ++ Array.fill(9)(0x41.toByte)
      b(0xff, 0xd8) ++
        b(0xff, 0xe1) ++ be16(exif.length + 2) ++ exif ++
        b(0xff, 0xfe) ++ be16(5) ++ "abc".getBytes ++
        b(0xff, 0xd3) ++ // RST3: zero-payload marker, must step over
        b(0xff, 0xc2) ++ be16(17) ++ b(8) ++ be16(h) ++ be16(w) ++
        b(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    }
    // JPEG with runs of 0xFF FILL BYTES between segments (spec-permitted
    // marker padding real encoders emit): the walker must skip the run and
    // read the marker code from the first non-FF byte
    def jpegPadded(w: Int, h: Int) =
      b(0xff, 0xd8) ++
        b(0xff, 0xff, 0xff, 0xe0) ++ be16(4) ++ b(0x4a, 0x46) ++ // APP0 behind 2 fill bytes
        b(0xff, 0xff, 0xc0) ++ be16(11) ++ b(8) ++ be16(h) ++ be16(w) ++
        b(1, 1, 0x11, 0)
    val rows = Seq(
      (1L, png(800, 600)),
      (2L, jpegExif(4032, 3024)),
      (9L, jpegPadded(640, 480)),
      (3L, png(1, 1)),
      (4L, "not an image at all".getBytes),
      (5L, png(800, 600).take(20)),           // truncated PNG
      (6L, jpegExif(100, 100).take(9)),       // truncated mid-segment
      (7L, b(0xff, 0xd8, 0xff, 0xd9)),        // SOI then EOI: no frame
      (8L, Array.emptyByteArray))
    val got = rows.toDF("id", "payload")
      .select(col("id"), NativeColumns.imageDims(col("payload")).as("h"))
      .select(col("id"), col("h.format"), col("h.width"), col("h.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == ("png", 800, 600))
    assert(got(2L) == ("jpeg", 4032, 3024))
    assert(got(9L) == ("jpeg", 640, 480))
    assert(got(3L) == ("png", 1, 1))
    assert(got(4L) == null)
    assert(got(5L) == null)
    assert(got(6L) == null)
    assert(got(7L) == null)
    assert(got(8L) == null)
    // null payload -> null result (nullSafeEval path)
    val nul = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(NativeColumns.imageDims(col("payload"))).collect()
    assert(nul(0).isNullAt(0))
  }

  test("wavMeta parses hand-crafted RIFF chunk layouts and tolerates corruption") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le16(x: Int) = b(x & 0xff, (x >>> 8) & 0xff)
    def le32(x: Int) = b(x & 0xff, (x >>> 8) & 0xff, (x >>> 16) & 0xff, (x >>> 24) & 0xff)
    def fmt(ch: Int, rate: Int, bits: Int) = {
      val ba = ch * bits / 8
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(rate * ba) ++ le16(ba) ++ le16(bits)
    }
    def riff(inner: Array[Byte]) = "RIFF".getBytes ++ le32(inner.length + 4) ++ "WAVE".getBytes ++ inner
    // odd-sized LIST chunk: the walker must honor the RIFF even-padding rule
    val oddList = "LIST".getBytes ++ le32(5) ++ "INFOx".getBytes ++ b(0)
    val rows = Seq(
      (1L, riff(fmt(2, 44100, 16) ++ "data".getBytes ++ le32(44100 * 4))), // 1000 ms stereo CD
      (2L, riff(oddList ++ fmt(1, 8000, 8) ++ "data".getBytes ++ le32(4000))), // padded LIST, then 500 ms
      (3L, riff("data".getBytes ++ le32(100) ++ b(1, 2) ++ fmt(1, 16000, 16))), // truncated data payload hides the fmt behind it
      (4L, "RIFFxxxxAVI ".getBytes),               // RIFF but not WAVE
      (5L, riff(fmt(1, 8000, 8))),                 // fmt but no data chunk
      (6L, "not audio".getBytes),
      (7L, Array.emptyByteArray),
      // adversarial: a chunk declaring size Int.MaxValue must terminate the
      // walk (Long cursor), not wrap negative and index out of bounds
      (8L, riff("JUNK".getBytes ++ le32(Int.MaxValue) ++ fmt(1, 8000, 8))),
      // adversarial: garbage fmt declaring rate 2^32-1 (> Int.MaxValue as
      // unsigned LE) must reject, not emit a negative sample_rate
      (9L, riff(("fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(0xffffffff) ++ le32(8000) ++ le16(1) ++ le16(8)) ++
        "data".getBytes ++ le32(4000))))
    val got = rows.toDF("id", "payload")
      .select(col("id"), NativeColumns.wavMeta(col("payload")).as("h"))
      .select(col("id"), col("h.sample_rate"), col("h.channels"), col("h.bits"), col("h.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got(1L) == (44100, 2, 16, 1000L))
    assert(got(2L) == (8000, 1, 8, 500L))
    // the walker honors the DECLARED data size, so a fmt chunk "hidden"
    // inside a truncated data payload is (correctly) never reached
    assert(got(3L) == null)
    assert(got(4L) == null)
    assert(got(5L) == null)
    assert(got(6L) == null)
    assert(got(7L) == null)
    assert(got(8L) == null)
    assert(got(9L) == null)
  }

  test("syntheticWavs payloads roundtrip through the real parser") {
    val docs = (0L until 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val parsed = graft.operators.Multimodal.syntheticWavs(docs, "doc_id")
      .select(col("media_id"), NativeColumns.wavMeta(col("payload")).as("h"))
      .select(col("media_id"), col("h.sample_rate"), col("h.channels"),
        col("h.bits"), col("h.duration_ms"))
      .collect()
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % 13 == 0) assert(r.isNullAt(1), s"id $id should be unparseable")
      else {
        val rate = ((id % 5) + 1) * 8000
        val ch = (id % 2) + 1
        val bits = (id % 3) * 8 + 8
        val ba = ch * bits / 8
        val dataLen = ((id % 1000) + 1) * ba
        assert(r.getInt(1) == rate.toInt, s"id $id rate")
        assert(r.getInt(2) == ch.toInt, s"id $id channels")
        assert(r.getInt(3) == bits.toInt, s"id $id bits")
        assert(r.getLong(4) == dataLen * 1000 / (rate * ba), s"id $id duration")
      }
    }
  }

  test("syntheticImages payloads roundtrip through the real parser") {
    // the generator's Column-built bytes must be what the parser expects —
    // this is the byte-level handshake the registry oracle (arithmetic
    // only) does not itself re-check
    val docs = (0L until 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val parsed = graft.operators.Multimodal.syntheticImages(docs, "doc_id")
      .select(col("media_id"),
        NativeColumns.imageDims(col("payload")).as("h"))
      .select(col("media_id"), col("h.format"), col("h.width"), col("h.height"))
      .collect()
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % 17 == 0) assert(r.isNullAt(1), s"id $id should be unparseable")
      else {
        val fmt = if (id % 2 == 0) "png" else "jpeg"
        assert(r.getString(1) == fmt, s"id $id format")
        assert(r.getInt(2) == (id % 640 + 1).toInt, s"id $id width")
        assert(r.getInt(3) == (id % 480 + 1).toInt, s"id $id height")
      }
    }
  }

  test("decodeStats: known byte math, empty payload, null payload, SQL-callable") {
    // "abcd": checksum = 97+98+99+100, 1 frame, feature_i = byte(i*4/8)/255
    val payload = "abcd".getBytes("UTF-8")
    val got = Seq(Tuple1(payload)).toDF("payload")
      .select(NativeColumns.decodeStats(col("payload")).as("s"))
      .select(col("s.byte_len"), col("s.checksum"), col("s.n_frames"), col("s.feature"))
      .head()
    assert(got.getLong(0) == 4L)
    assert(got.getLong(1) == ('a' + 'b' + 'c' + 'd').toLong)
    assert(got.getInt(2) == 1)
    val feat = got.getSeq[Double](3)
    assert(feat.length == 8)
    (0 until 8).foreach { i =>
      val expected = (payload(math.min(i * 4 / 8, 3)) & 0xff) / 255.0
      assert(feat(i) == expected, s"feature($i)")
    }
    // empty payload: zero checksum, 1 frame (1 + 0/64), all-zero feature
    val empty = Seq(Tuple1(Array.emptyByteArray)).toDF("payload")
      .select(NativeColumns.decodeStats(col("payload")).as("s"))
      .select(col("s.byte_len"), col("s.checksum"), col("s.n_frames"), col("s.feature"))
      .head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L && empty.getInt(2) == 1)
    assert(empty.getSeq[Double](3) == Seq.fill(8)(0.0))
    // null payload -> NULL struct (nullSafeEval path)
    val nul = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(NativeColumns.decodeStats(col("payload"))).head()
    assert(nul.isNullAt(0))
    // SQL registration parity with the Column form
    val viaSql = spark.sql("SELECT graft_decode_stats(CAST('abcd' AS BINARY)) AS s")
      .select(col("s.checksum")).head().getLong(0)
    assert(viaSql == got.getLong(1))
  }

  test("nfcNormalize: recomposition, identity fast path, idempotence, null, SQL-callable") {
    // decomposed (base + combining mark) -> precomposed under NFC; the
    // expected strings are built from codepoints so no editor or tool in
    // the chain can silently recompose either side
    val eAcuteD = "café"; val eAcuteC = "café"
    val aRingD = "Ångström"; val aRingC = "Ångström"
    val astral = new String(Character.toChars(0x1D11E)) // NFC-inert
    val rows = Seq(
      eAcuteD -> eAcuteC,
      aRingD -> aRingC,
      (eAcuteD + " " + astral) -> (eAcuteC + " " + astral),
      "plain ascii stays" -> "plain ascii stays",
      eAcuteC -> eAcuteC) // already composed: fixed point
    val got = rows.map(_._1).toDF("t")
      .select(NativeColumns.nfcNormalize(col("t"))).as[String].collect().toSeq
    assert(got == rows.map(_._2), s"got ${got.map(_.codePoints().toArray.toSeq)}")
    // idempotence over the normalized output
    val twice = got.toDF("t")
      .select(NativeColumns.nfcNormalize(col("t"))).as[String].collect().toSeq
    assert(twice == got)
    // null in -> null out
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(NativeColumns.nfcNormalize(col("t"))).head().isNullAt(0))
    // SQL registration parity
    val viaNfcSql = spark.sql(s"SELECT graft_nfc('$eAcuteD')").as[String].head()
    assert(viaNfcSql == eAcuteC)
  }

  test("bpeTokenize: greedy longest-match == reference impl; codepoints; stats; null totality") {
    // reference greedy matcher in plain Scala — the independent spec the
    // expression must agree with on randomized vocab/word draws
    def refTokenize(words: Seq[String], vocab: Map[String, Int], maxLen: Int): Seq[Int] =
      words.flatMap { w =>
        val cps = w.codePoints().toArray
        val out = scala.collection.mutable.ArrayBuffer[Int]()
        var pos = 0
        while (pos < cps.length) {
          val l = (math.min(maxLen, cps.length - pos) to 1 by -1)
            .find(k => vocab.contains(new String(cps, pos, k)))
          out += l.map(k => vocab(new String(cps, pos, k))).getOrElse(-1)
          pos += l.getOrElse(1)
        }
        out.toSeq
      }
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    (0 until 20).foreach { trial =>
      // vocab: all singles + random 2..4-grams over a 4-char alphabet
      val singles = alphabet.map(_.toString)
      val multis = (0 until 12).map(_ =>
        (0 until (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(4))).mkString).distinct
      val vocab = (singles ++ multis).zipWithIndex.map { case (t, i) => (t, i) }
      val vmap = vocab.toMap
      val docs = (0 until 30).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(4)))
          .map(_ => (0 until (1 + rnd.nextInt(9)))
            .map(_ => alphabet(rnd.nextInt(4))).mkString).mkString(" "))
      }
      val got = docs.toDF("id", "text")
        .select(col("id"),
          NativeColumns.bpeTokenize(graft.functions.Text.words(col("text")), vocab, 4).as("st"))
        .select(col("id"), col("st.n_tokens"), col("st.id_checksum"), col("st.ids"))
        .as[(Long, Long, Long, Seq[Int])].collect().sortBy(_._1)
      docs.zip(got).foreach { case ((_, text), (_, n, ck, ids)) =>
        // Text.words semantics in plain Scala: lower/trim/split-on-spaces
        val ws = text.trim.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
        val expect = refTokenize(ws, vmap, 4)
        assert(ids == expect, s"trial $trial text '$text': $ids vs $expect")
        assert(n == expect.length && ck == expect.map(_.toLong).sum)
      }
    }
    // codepoint semantics: an astral-plane char is ONE position (a
    // UTF-16-char matcher would split the surrogate pair and emit two)
    val astral = new String(Character.toChars(0x1D11E))
    val vz = Seq((astral, 0), ("x", 1), (s"x$astral", 2))
    val zids = Seq(Tuple1(s"x$astral $astral y")).toDF("text")
      .select(NativeColumns.bpeTokenize(graft.functions.Text.words(col("text")), vz, 4).as("st"))
      .select(col("st.ids")).as[Seq[Int]].head()
    assert(zids == Seq(2, 0, -1), s"got $zids") // greedy 2-gram, single, unknown 'y'
    // totality: null array -> null struct; empty text -> zero stats
    val nrow = Seq(Tuple1(null: String)).toDF("text")
      .select(NativeColumns.bpeTokenize(graft.functions.Text.words(col("text")), vz, 4))
    assert(nrow.head().isNullAt(0))
    val erow = Seq(Tuple1("")).toDF("text")
      .select(NativeColumns.bpeTokenize(graft.functions.Text.words(col("text")), vz, 4).as("st"))
      .select(col("st.n_tokens"), col("st.id_checksum")).as[(Long, Long)].head()
    assert(erow == ((0L, 0L)))
  }
  test("unigramTokenize: Viterbi min-cost beats greedy; tie goes to the longer token; unknowns; null totality") {
    import org.apache.spark.sql.graftnative.NativeColumns
    def ids(text: String, model: Seq[(String, Int, Long)]): Seq[Int] =
      Seq(Tuple1(text)).toDF("text")
        .select(NativeColumns.unigramTokenize(
          graft.functions.Text.words(col("text")), model, 4).as("st"))
        .select(col("st.ids")).as[Seq[Int]].head()
    // min-cost composition: "ab" as one token when cheaper...
    val cheapAb = Seq(("a", 0, 1000L), ("b", 1, 1000L), ("ab", 2, 1500L))
    assert(ids("ab", cheapAb) == Seq(2))
    // ...as two singles when the pair is dearer (greedy longest-match
    // would STILL take "ab" here -- the case that separates the families)
    val dearAb = Seq(("a", 0, 1000L), ("b", 1, 1000L), ("ab", 2, 2500L))
    assert(ids("ab", dearAb) == Seq(0, 1))
    // exact tie on total cost -> the longer token wins
    val tieAb = Seq(("a", 0, 1000L), ("b", 1, 1000L), ("ab", 2, 2000L))
    assert(ids("ab", tieAb) == Seq(2))
    // global optimum over overlapping candidates: "abc" with ab+c vs a+bc
    val abc = Seq(("a", 0, 900L), ("b", 1, 1000L), ("c", 2, 1000L),
      ("ab", 3, 1500L), ("bc", 4, 1300L))
    assert(ids("abc", abc) == Seq(0, 4)) // a+bc = 2200 < ab+c = 2500
    // unknown char: id -1 at UnkCost, segmentation still total
    assert(ids("azb", cheapAb) == Seq(0, -1, 1))
    // multi-word + stats
    val st = Seq(Tuple1("ab a zz")).toDF("text")
      .select(NativeColumns.unigramTokenize(
        graft.functions.Text.words(col("text")), cheapAb, 4).as("st"))
      .select(col("st.n_tokens"), col("st.id_checksum")).as[(Long, Long)].head()
    assert(st == ((4L, 0L))) // [2], [0], [-1,-1] -> 4 tokens, 2+0-1-1 = 0
    // null text -> null struct; empty -> zero stats
    val nrow = Seq(Tuple1(null: String)).toDF("text")
      .select(NativeColumns.unigramTokenize(
        graft.functions.Text.words(col("text")), cheapAb, 4))
    assert(nrow.head().isNullAt(0))
  }
}
