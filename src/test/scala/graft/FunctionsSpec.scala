package graft

import org.apache.spark.sql.functions._

import graft.functions.{Slugify, TextFunctions, VectorFunctions, WeatherFunctions}

/** Scalar-function parity: slugify cases (tests/test_utils.py:4-8), PM2.5
  * categorizer thresholds (tests/test_report.py:4-8 + FIXTURES.md §1.6),
  * weather-code decode, compass, recommendation rules. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("slugify reference cases") {
    assert(Slugify.slugify("Bandung") == "bandung")
    assert(Slugify.slugify("Kota Yogyakarta") == "kota-yogyakarta")
    assert(Slugify.slugify("Cirebon/Harjamukti") == "cirebon-harjamukti")
    assert(Slugify.slugify("São Paulo") == "sao-paulo")
    assert(Slugify.slugify("") == "city")
    assert(Slugify.slugify(null) == "city")
  }

  test("slugify as registered SQL function (native expression)") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT slugify('São  Paulo!!') AS s").as[String].head()
    assert(out == "sao-paulo")
  }

  test("char_entropy: known values, degenerate inputs, SQL surface, type check") {
    import graft.functions.Entropy
    import org.apache.spark.unsafe.types.UTF8String
    def e(s: String): Double = Entropy.compute(UTF8String.fromString(s))
    assert(e("") == 0.0)
    assert(e("aaaa") == 0.0)                      // single-symbol string
    assert(math.abs(e("ab") - 1.0) < 1e-9)        // one fair bit
    assert(math.abs(e("abcd") - 2.0) < 1e-9)      // two fair bits
    // uneven: p = [3/4, 1/4] -> 0.75*log2(4/3) + 0.25*2 ~ 0.811278
    assert(math.abs(e("aaab") - 0.8112781245) < 1e-6)
    // order independence: same multiset of chars, same bits
    assert(e("abacabad") == e("dabacaba"))
    // prose sits well above repeated filler
    assert(e("the quick brown fox jumps over the lazy dog") > 3.0)
    assert(e("aaaaaaaaaaaaaaaaaaaaaab") < 0.5)
    // supplementary-plane chars count as ONE code point, not two surrogate
    // halves: a string of one repeated emoji is single-symbol (0 bits), and
    // "a🙂" is one fair bit — matching the DuckDB per-code-point mirror
    assert(e("🙂🙂🙂") == 0.0)
    assert(math.abs(e("a🙂") - 1.0) < 1e-9)
    // mixed BMP + astral: p = [2/4, 1/4, 1/4] -> 1.5 bits over L=4 symbols
    assert(math.abs(e("🙂🙂ab") - 1.5) < 1e-9)
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT char_entropy('abcd') AS h").as[Double].head()
    assert(out == 2.0)
    assert(spark.sql("SELECT char_entropy(NULL)").collect()(0).isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_entropy(42)").collect()
    }
    assert(err.getMessage.contains("char_entropy"))
  }

  test("nfc_normalize composes canonical equivalents, keeps compatibility forms") {
    import graft.functions.TextNormalize
    assert(TextNormalize.nfc("é") == "é")          // composes
    assert(TextNormalize.nfc("é") == "é")            // already NFC
    assert(TextNormalize.nfc("ﬁnal") == "ﬁnal")      // NFC != NFKC
    assert(TextNormalize.nfc("ascii only") == "ascii only")
    GraftExtensions.register(spark)
    // the dedup-key motivation: both spellings hash identical after NFC
    val r = spark.sql(
      "SELECT md5(nfc_normalize('café')) = md5(nfc_normalize('café')) AS same," +
        " nfc_normalize(NULL) AS n").collect()(0)
    assert(r.getBoolean(0) && r.isNullAt(1))
  }

  test("pm25 categorizer boundary table") {
    val cases = Seq[(Option[Double], String)](
      (None, "Tidak diketahui"),
      (Some(12.0), "Baik"), (Some(12.01), "Sedang"), (Some(35.4), "Sedang"),
      (Some(35.41), "Tidak sehat (sensitif)"), (Some(55.4), "Tidak sehat (sensitif)"),
      (Some(55.41), "Tidak sehat"), (Some(150.4), "Tidak sehat"),
      (Some(150.41), "Sangat tidak sehat"), (Some(250.4), "Sangat tidak sehat"),
      (Some(250.41), "Berbahaya"))
    val got = cases.map(_._1).toDF("v")
      .select(WeatherFunctions.pm25Category(col("v"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("weather code decode + compass") {
    val got = Seq(0, 2, 45, 55, 63, 75, 81, 85, 95, 42).toDF("c")
      .select(WeatherFunctions.weatherCodeLabel(col("c"))).as[String].collect()
    assert(got.toSeq == Seq("Clear", "Partly Cloudy", "Fog", "Drizzle", "Rain",
      "Snow", "Showers", "Snow Showers", "Thunderstorms", "Unknown"))
    // 0->N, 90->E, 180->S, 270->W, 360->N, -90 -> W (mod wrap), 11.24 -> N
    val comp = Seq(0.0, 90.0, 180.0, 270.0, 360.0, -90.0, 11.24, 11.3)
      .toDF("d").select(WeatherFunctions.compass16(col("d"))).as[String].collect()
    assert(comp.toSeq == Seq("N", "E", "S", "W", "N", "W", "N", "NNE"))
    // emoji variant (app.js:283-299): distinct groupings from the label map —
    // 81 shares rain (not Showers), 85 shares snow, 96 collapses to storm;
    // null and unmapped codes take the thermometer fallback
    val e = WeatherFunctions.WeatherEmoji
    val emo = Seq[Integer](0, 1, 2, 3, 45, 55, 63, 75, 81, 85, 95, 96, 42, null)
      .toDF("c").select(WeatherFunctions.weatherCodeEmoji(col("c")))
      .as[String].collect()
    assert(emo.toSeq == Seq(e("sun"), e("sunCld"), e("partCld"), e("cloud"),
      e("fog"), e("drizzle"), e("rain"), e("snow"), e("rain"), e("snow"),
      e("storm"), e("storm"), e("thermo"), e("thermo")))
    // the variation selector must survive: every glyph except partCld (U+26C5)
    // ends in U+FE0F
    assert(e.removed("partCld").values.forall(_.endsWith("\uFE0F")))
  }

  test("recommendation rules fire in order (report.py:28-49)") {
    val msg = Seq(1).toDF("x").select(WeatherFunctions.recommendation(
      lit(35.0), lit(60.0), lit(4L))).as[String].head()
    assert(msg.contains("masker")) // pm25 > 55.4
    assert(msg.contains("panas"))  // temp > 33
    assert(msg.contains("hujan"))  // rainy >= 3
    val calm = Seq(1).toDF("x").select(WeatherFunctions.recommendation(
      lit(25.0), lit(10.0), lit(0L))).as[String].head()
    assert(calm.contains("relatif aman"))
  }

  test("text functions: tokens, shingles, fingerprint, quality, langId") {
    val df = Seq("The quick brown fox", "fox brown quick the", "ab").toDF("text")
    val toks = df.select(TextFunctions.tokenCount(col("text")).as("n")).as[Int].collect()
    assert(toks.toSeq == Seq(4, 4, 1))
    // shingles: n < k collapses to a single whole-string shingle
    val sh = df.select(TextFunctions.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(sh(0) == Seq("the quick brown", "quick brown fox"))
    assert(sh(2) == Seq("ab"))
    // order-insensitive fingerprint: permutations collide
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    val lang = Seq("the cat and the dog is big", "el que y la de", "xyz")
      .toDF("text").select(TextFunctions.langId(col("text"))).as[String].collect()
    assert(lang.toSeq == Seq("en", "es", "und"))
  }

  test("caller-supplied stopword and language-marker lists override the defaults") {
    val df = Seq("ini adalah sebuah kalimat", "the cat sat").toDF("text")
    // Indonesian function words are invisible to the default English list...
    val defRatio = df.select(TextFunctions.stopwordRatio(col("text")))
      .as[Double].collect()
    assert(defRatio(0) == 0.0)
    // ...but a caller-supplied list scores them
    val id = Seq("ini", "adalah", "sebuah", "yang", "dan")
    val idRatio = df.select(TextFunctions.stopwordRatio(col("text"), id))
      .as[Double].collect()
    assert(idRatio(0) == 0.75 && idRatio(1) == 0.0)
    // langId with an Indonesian marker row; en row kept so English still wins
    val markers = Seq(
      "id" -> Seq("ini", "adalah", "yang", "dan", "di"),
      "en" -> Seq("the", "and", "of", "is", "with"))
    val lang = df.select(TextFunctions.langId(col("text"), markers))
      .as[String].collect()
    assert(lang.toSeq == Seq("id", "en"))
    // qualityScore: the stopword presence term follows the injected list
    val long = ("ini adalah sebuah kalimat panjang " * 3).trim
    val qDef = Seq(long).toDF("text")
      .select(TextFunctions.qualityScore(col("text"))).as[Double].head()
    val qId = Seq(long).toDF("text")
      .select(TextFunctions.qualityScore(col("text"), id)).as[Double].head()
    assert(qId == qDef + 0.2)
  }

  test("hamming64 native expression matches a reference popcount, via SQL too") {
    import graft.functions.Hamming64
    def ref(a: String, b: String): Long =
      (BigInt(a, 16) ^ BigInt(b, 16)).bitCount.toLong
    val cases = Seq(
      ("0000000000000000", "0000000000000000"),
      ("ffffffffffffffff", "0000000000000000"),
      ("deadbeefdeadbeef", "deadbeefdeadbeee"),
      ("8000000000000001", "0000000000000001"))
    val df = cases.toDF("a", "b")
    val got = df.select(Hamming64.hamming64(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == cases.map { case (a, b) => ref(a, b) })
    // and through the registered SQL surface
    GraftExtensions.register(spark)
    val sql = df.selectExpr("hamming64(a, b)").as[Long].collect()
    assert(sql.toSeq == got.toSeq)
  }

  test("highlight wraps only the first match, case-insensitive, escaped (F13)") {
    val df = Seq("Bandung and BANDUNG", "no hit here", "a.c literal").toDF("t")
    def hl(q: String) = df.select(WeatherFunctions.highlightFirst(col("t"), q))
      .as[String].collect().toSeq
    assert(hl("bandung") == Seq(
      """<span class="highlight">Bandung</span> and BANDUNG""", // first only, case kept
      "no hit here",
      "a.c literal"))
    // regex metachars in the query are literal: "a.c" must not match "abc"
    assert(hl("a.c") == Seq(
      "Bandung and BANDUNG", "no hit here",
      """<span class="highlight">a.c</span> literal"""))
  }

  test("PII redaction: emails, IPs, phones, in contract order") {
    import graft.functions.Redact
    val df = Seq(
      "mail a.user+tag@sub.example.co.id now",
      "server at 192.168.1.17 responded",
      "call +62 812-3456-7890 or (021) 555 0199 today",
      "ip 10.0.0.1 then mail x@y.org then +62 811 222 333",
      "clean text with the number 42").toDF("t")
    val got = df.select(Redact.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail [EMAIL] now")
    assert(got(1) == "server at [IP] responded")
    assert(got(2) == "call [PHONE] or [PHONE] today")
    assert(got(3) == "ip [IP] then mail [EMAIL] then [PHONE]")
    assert(got(4) == "clean text with the number 42")
    // counts respect the order: an IP is not double-counted as a phone
    val (ne, ni, np) = Redact.piiCounts(col("t"))
    val counts = df.select(ne, ni, np).as[(Int, Int, Int)].collect()
    assert(counts(1) == ((0, 1, 0)))
    assert(counts(2) == ((0, 0, 2)))
    assert(counts(3) == ((1, 1, 1)))
    assert(counts(4) == ((0, 0, 0)))
  }

  test("rolling hash matches a reference fold") {
    val p = 2147483647L
    def ref(s: String): Long = s.foldLeft(0L)((a, c) => (a * 257 + c.toLong) % p)
    val texts = Seq("hello world", "a", "")
    val got = texts.toDF("text")
      .select(TextFunctions.rollingHash(col("text"))).as[Long].collect()
    assert(got.toSeq == texts.map(ref))
  }

  test("vector cosine and hyperplane sign bucket") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f))).toDF("a", "b")
    val cos = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)
    assert(math.abs(cos(1)) < 1e-12)
    assert(math.abs(cos(2) + 1.0) < 1e-12)
    // driver-side mirror of the seeded planes: bucket bit i = sign(v · plane_i)
    val planes = VectorFunctions.signPlanes(2, 2)
    def expect(v: Seq[Float]): String = planes.map { p =>
      val d = v.zip(p).map { case (x, c) => x.toDouble * c }.sum
      if (d >= 0.0) "+" else "-"
    }.mkString
    val b = df.select(VectorFunctions.hyperplaneBucket(col("b"), 2, 2)).as[String].collect()
    assert(b.toSeq == Seq(
      expect(Seq(1.0f, 0.0f)), expect(Seq(0.0f, 1.0f)), expect(Seq(-1.0f, -1.0f))))
    // an antipodal pair never shares a bucket (every projection flips sign;
    // (1,2) dodges exact zeros — no ±1 combination of 1 and 2 sums to 0)
    assert(expect(Seq(1.0f, 2.0f)) != expect(Seq(-1.0f, -2.0f)))
  }

  test("native vec_cosine is bit-identical to the Column-tree cosine") {
    import graft.functions.{VecCosine, VectorFunctions}
    graft.GraftExtensions.register(spark)
    // awkward magnitudes so any accumulation-order difference would show up
    // in the low bits; the assertion is EXACT equality, not a tolerance
    val vecs = Seq(
      (Seq(0.1f, 0.2f, 0.3f, 1e7f), Seq(1e-7f, 3.3f, -0.7f, 0.11f)),
      (Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(4.0f, 3.0f, 2.0f, 1.0f)),
      (Seq(-1.5f, 0.0f, 2.5f, -0.1f), Seq(0.9f, -0.9f, 0.9f, -0.9f)))
      .toDF("a", "b")
    val r = vecs.select(
      VecCosine.cosine(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("tree")).collect()
    r.foreach { row =>
      assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1)),
        s"native=${row.getDouble(0)} tree=${row.getDouble(1)}")
    }
    // null semantics match zip_with padding: length mismatch -> NULL
    val mismatched = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val m = mismatched.select(
      VecCosine.cosine(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("tree")).head()
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("gopher structural signals count symbols, bullets, ellipses, alpha words") {
    import graft.functions.TextFunctions._
    val text = Seq(
      "# heading one\n- bullet a\n- bullet b\nplain line ends here...\n\n* third bullet…"
    ).toDF("text")
    val r = text.select(
      symbolWordRatio(col("text")).as("sym"),
      bulletLineFraction(col("text")).as("bullet"),
      ellipsisLineFraction(col("text")).as("ell"),
      alphaWordFraction(col("text")).as("alpha")).head()
    // 16 whitespace tokens; one '#' + one '...' + one '…' = 3 symbols
    assert(math.abs(r.getDouble(0) - 3.0 / 16) < 1e-12)
    // 5 non-empty lines; 3 start with a bullet marker
    assert(math.abs(r.getDouble(1) - 3.0 / 5) < 1e-12)
    // 2 of 5 lines end in an ellipsis ("here..." and "bullet…")
    assert(math.abs(r.getDouble(2) - 2.0 / 5) < 1e-12)
    // tokens without a letter are '#', '-', '-', '*': 12 alpha of 16
    assert(math.abs(r.getDouble(3) - 12.0 / 16) < 1e-12)
    // empty doc: all zero, no division blowups
    val z = Seq("").toDF("text").select(
      symbolWordRatio(col("text")), bulletLineFraction(col("text")),
      ellipsisLineFraction(col("text")), alphaWordFraction(col("text"))).head()
    assert((0 to 3).forall(i => z.getDouble(i) == 0.0))
  }

  test("SQL-registered vec kernels reject bad argument types and arity") {
    graft.GraftExtensions.register(spark)
    // the Scala wrappers cast to array<double>, but the SQL surface used to
    // be unguarded: an array<int> argument reaches ArrayData.getDouble on a
    // 4-byte-element layout and silently returns garbage. Must now be an
    // ANALYSIS error, for all three kernels.
    for (fn <- Seq("vec_cosine", "vec_dot", "vec_dist2")) {
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $fn(array(1, 2), array(3, 4))").collect()
      }
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $fn(array('a'), array('b'))").collect()
      }
      // wrong arity: Spark's standard WRONG_NUM_ARGS analysis error from
      // the builder guard — a stable, named error class, never an
      // IndexOutOfBoundsException from children(1)
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $fn(array(1.0d))").collect()
      }
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        s"unexpected error class: ${e.getCondition} (${e.getMessage})")
    }
    // the guarded path still computes: 1*3 + 2*4
    assert(spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0) == 11.0)
  }

  test("readability: sentence/syllable counts and the Flesch formulas") {
    import graft.functions.TextFunctions._
    import spark.implicits._
    val df = Seq(
      // 2 sentences, 6 words; syllables: the(1) cat(1) sat(1) it(1) was(1)
      // happy(2) = 7
      "The cat sat. It was happy!",
      "word",             // no terminator: 1 sentence, 1 word, 1 syllable
      "shh"               // no vowels: syllable floor of 1 per token
    ).toDF("text").select(
      sentenceCount(col("text")).as("s"),
      tokenCount(col("text")).as("w"),
      syllableCount(col("text")).as("sy"),
      fleschReadingEase(col("text")).as("fre"),
      fkGradeLevel(col("text")).as("fk"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 2 && rows(0).getInt(1) == 6 &&
      rows(0).getLong(2) == 7L)
    assert(rows(0).getDouble(3) ==
      206.835 - 1.015 * (6.0 / 2) - 84.6 * (7.0 / 6))
    assert(rows(0).getDouble(4) ==
      0.39 * (6.0 / 2) + 11.8 * (7.0 / 6) - 15.59)
    assert(rows(1).getInt(0) == 1 && rows(1).getLong(2) == 1L)
    assert(rows(2).getLong(2) == 1L)
    // empty text: well-defined zeros, no div-by-zero nulls
    val empty = Seq("").toDF("text")
      .select(fleschReadingEase(col("text")), fkGradeLevel(col("text"))).head()
    assert(empty.getDouble(0) == 0.0 && empty.getDouble(1) == 0.0)
  }

  test("foldConfusables: homoglyphs map back, invisibles strip, ascii is a fixpoint") {
    val rows = Seq(
      "​ѕраrk ѕсаn", // ZWSP + cyr swap of "spark scan"
      "spark scan",                                     // ascii fixpoint
      "soft­hyphen zw‌nj bom﻿",          // invisibles only
      "nb sp",                                     // NBSP -> space
      "οΟ greek o"                            // greek omicron pair
    ).toDF("text").select(TextFunctions.foldConfusables(col("text")).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(rows(0) == "spark scan")
    assert(rows(1) == "spark scan")
    assert(rows(2) == "softhyphen zwnj bom")
    assert(rows(3) == "nb sp")
    assert(rows(4) == "oO greek o")
    // the from/to tables stay in lockstep (one codepoint per slot)
    assert(TextFunctions.ConfusablesFrom.length ==
      TextFunctions.ConfusablesTo.length)
  }
}
