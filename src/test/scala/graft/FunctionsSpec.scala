package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.DateType
import graft.functions.{TextFunctions, VectorFunctions, WeekOfMonth, Wkt}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("week_of_month: custom expression matches Postgres 'W' semantics") {
    val dates = Seq(
      "2018-05-01" -> 1, "2018-05-07" -> 1, "2018-05-08" -> 2,
      "2018-05-14" -> 2, "2018-05-15" -> 3, "2018-05-28" -> 4,
      "2018-05-29" -> 5, "2018-05-31" -> 5, "2020-02-29" -> 5,
      "2021-02-28" -> 4, "2024-01-01" -> 1)
    val df = dates.map(_._1).toDF("d").select(
      F.col("d"),
      WeekOfMonth.weekOfMonth(F.col("d").cast(DateType)).as("custom"),
      WeekOfMonth.weekOfMonthArith(F.col("d").cast(DateType)).as("arith"))
    val got = df.collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    dates.foreach { case (d, expected) =>
      assert(got(d) === ((expected, expected)), s"date $d")
    }
  }

  test("week_of_month works through SQL text after registration") {
    val n = spark.sql(
      "SELECT week_of_month(CAST('2018-05-29' AS DATE)) AS w").head().getInt(0)
    assert(n === 5)
  }

  test("week_of_month: null in, null out") {
    val r = spark.sql("SELECT week_of_month(CAST(NULL AS DATE)) AS w").head()
    assert(r.isNullAt(0))
  }

  test("dot_f matches the HOF dot product and handles nulls") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.0f, 0.0f), Array(0.0f, 0.0f))
    ).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot($"a", $"b").as("fast"),
      VectorFunctions.dotHof($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
    assert(math.abs(rows(0).getDouble(0) - 32.0) < 1e-9)
  }

  test("cosine of identical vectors is 1, zero vector is null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f))
    ).toDF("a", "b")
    val rows = df.select(VectorFunctions.cosine($"a", $"b").as("c")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-9)
    assert(rows(1).isNullAt(0))
  }

  test("malformed date_time casts to null (reference-lenient, ANSI off)") {
    val df = Seq("2018-05-28 09:03:40", "not a date", "").toDF("date_time")
      .select(F.col("date_time").cast(DateType).as("d"))
    val rows = df.collect()
    assert(rows(0).getDate(0).toString === "2018-05-28")
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("avgPool resizes features by contiguous-chunk averaging") {
    val df = Seq(Array(1.0f, 3.0f, 5.0f, 7.0f, 2.0f, 4.0f, 6.0f, 8.0f)).toDF("v")
    val out = df.select(graft.functions.VectorFunctions.avgPool($"v", 4).as("p"))
      .head().getSeq[Double](0)
    assert(out === Seq(2.0, 6.0, 3.0, 7.0))
  }

  test("wkt parse extracts lon/lat; malformed yields null") {
    val df = Seq(
      "POINT (14.4973794438195 50.00136875782316)",
      "garbage",
      "POINT (-7.5 -45.25)"
    ).toDF("w").select(
      Wkt.lon($"w").as("lon"), Wkt.lat($"w").as("lat"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 14.4973794438195) < 1e-12)
    assert(math.abs(rows(0).getDouble(1) - 50.00136875782316) < 1e-12)
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) === -7.5)
    assert(rows(2).getDouble(1) === -45.25)
  }

  test("md5 hash family matches the md5 builtin's hex prefix") {
    import graft.functions.HashingUtil
    // md5Int must equal parsing the first 8 hex chars of the standard
    // md5 — the contract the DuckDB oracle relies on
    Seq("", "abc", "hello world", "a:0", "b:63").foreach { s =>
      val viaSql = spark.sql(s"SELECT conv(substr(md5('$s'), 1, 8), 16, 10)")
        .head().getString(0).toLong
      assert(HashingUtil.md5Int(s) === viaSql, s"md5Int($s)")
    }
  }

  test("md5 minhash signature is deterministic, bounded, and set-based") {
    import graft.functions.HashingUtil
    import org.apache.spark.unsafe.types.UTF8String
    val p = HashingUtil.P31
    def sig(s: String) = {
      val a = HashingUtil.md5MinhashSig(UTF8String.fromString(s), 5, 16)
      (0 until 16).map(a.getLong)
    }
    val s1 = sig("the quick brown fox jumps over the lazy dog")
    assert(s1 === sig("the quick brown fox jumps over the lazy dog"))
    assert(s1.forall(v => v >= 0 && v < p))
    // duplicated shingles don't change a set sketch: every 5-char window
    // of "aaa...a" is the same shingle regardless of length
    assert(sig("aaaaa") === sig("a" * 12))
    // short strings hash as one whole-string shingle
    assert(sig("ab") !== sig("ba"))
  }

  test("md5 simhash: halves are unsigned 32-bit; similar docs are close") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight"),
      (4L, "")).toDF("doc_id", "text")
    val got = Dedup.simhashMd5(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
    assert(got(4L) === ((0L, 0L))) // no tokens: all-zero signature
    def dist(x: (Long, Long), y: (Long, Long)) =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    // 7-of-8 shared tokens beat a disjoint document by Hamming distance
    assert(dist(got(1L), got(2L)) < dist(got(1L), got(3L)))
  }

  test("word_shingles kernel agrees with the HOF formulation as a set") {
    val df = Seq("The quick Brown fox jumps over", "one two", "", "  spaced  out  words here  ")
      .toDF("t")
    val rows = df.select(
      graft.functions.Hashing.wordShingles(F.col("t"), 3).as("k"),
      F.array_distinct(TextFunctions.wordShingles(F.col("t"), 3)).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toSet === r.getSeq[String](1).toSet, r.toString)
    }
  }

  test("char_shingles kernel agrees with the HOF formulation as a set") {
    val df = Seq("the quick brown fox", "tiny", "", "aaaaaaa").toDF("t")
    val rows = df.select(
      graft.functions.Hashing.charShingles(
        F.regexp_replace(F.lower(F.trim(F.col("t"))), "\\s+", " "), 5).as("k"),
      TextFunctions.charShingles(F.col("t"), 5).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toSet === r.getSeq[String](1).toSet, r.toString)
    }
  }

  test("repetition_stats skips null elements like gram_stats") {
    val r = spark.sql(
      """SELECT repetition_stats(array('a', NULL, 'a', 'b')) AS r,
        |  gram_stats(array('a', NULL, 'a', 'b')) AS g,
        |  repetition_stats(array('x', CAST(NULL AS STRING))) AS s,
        |  repetition_stats(array(CAST(NULL AS STRING))) AS e""".stripMargin).head()
    // nulls filtered first: tokens [a,a,b], bigrams over the remaining
    // sequence ("a a", "a b")
    assert(r.getStruct(0).getLong(0) === 2L) // n_distinct_tok {a,b}
    assert(r.getStruct(0).getLong(1) === 2L) // 'a' twice
    assert(r.getStruct(0).getLong(2) === 1L) // no repeated bigram
    assert(r.getStruct(1).getLong(0) === 2L) // gram_stats agrees on distincts
    // fewer than 2 non-null tokens: whole-text-shingle convention
    assert(r.getStruct(2).getLong(2) === 1L)
    assert(r.getStruct(3).getLong(0) === 0L)
    assert(r.getStruct(3).getLong(2) === 1L)
  }

  test("tokenCount: empty and whitespace-heavy strings") {
    val df = Seq("", "   ", "one", "  two  words ", "a\tb\nc").toDF("t")
      .select(TextFunctions.tokenCount($"t").as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 1L, 2L, 3L))
  }

  test("scriptTokens: one token per CJK codepoint, whitespace elsewhere") {
    val cases = Seq(
      ("hello world", 2L, 2L),      // pure latin: rules agree
      ("日本語のテスト", 1L, 7L),   // unspaced CJK: 1 ws "token" vs 7 codepoints
      ("mixed 漢字 text", 3L, 4L),  // han chars split out of their ws token
      ("한국어", 1L, 3L),           // hangul syllables count individually
      ("", 0L, 0L))                 // blank guard holds for both rules
    val got = cases.map(_._1).toDF("t").select(
      F.col("t"),
      TextFunctions.tokenCount(F.col("t")).as("ws"),
      TextFunctions.tokenCountScript(F.col("t")).as("sc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cases.foreach { case (t, ws, sc) =>
      assert(got(t) === ((ws, sc)), s"token counts of '$t'")
    }
  }

  test("script_tokens kernel matches the regex formulation exactly") {
    // the compiled kernel must preserve every quirk of
    // pad-CJK -> trim(spaces only) -> split("\\s+", -1), including the
    // leading/trailing EMPTY tokens produced by untrimmable \t/\n edges
    val edges = Seq(
      "", " ", "   ", "\t", "\n", "\t\n", "a", " a ", "\ta", "a\t",
      "\ta\t", "a b  c", "  a  b  ", "\t a \t b \n", "中文abc", "中",
      " 中 ", "\t中", "中\t", "ab中cd日ef", "中中", "日本語テスト",
      "한국어 text", "a中 b日", " mixed  ws \r", "中 \t 日",
      " \t ", "中\n中")
    // deterministic fuzz over a ws/CJK/latin-heavy alphabet
    val alphabet = " \t\n\rab中日本語한aZ09."
    val rnd = new scala.util.Random(42)
    val fuzz = (1 to 300).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = (edges ++ fuzz).toDF("t").select(
      F.col("t"),
      TextFunctions.scriptTokens(F.col("t")).as("k"),
      TextFunctions.scriptTokensRegex(F.col("t")).as("r"))
      .collect()
    rows.foreach { row =>
      assert(row.getSeq[String](1) === row.getSeq[String](2),
        s"kernel != regex on ${row.getString(0).map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("stripMarkup removes tags and collapses whitespace; counts are exact") {
    val df = Seq(
      "<p>hello  <b>world</b></p> see https://a.b/c and http://d.e",
      "no markup here",
      "<br/><br/>").toDF("t")
    val got = df.select(
      TextFunctions.urlCount(F.col("t")).as("u"),
      TextFunctions.tagCount(F.col("t")).as("g"),
      TextFunctions.stripMarkup(F.col("t")).as("c")).collect()
    assert((got(0).getLong(0), got(0).getLong(1)) === ((2L, 4L)))
    assert(got(0).getString(2) === "hello world see https://a.b/c and http://d.e")
    assert((got(1).getLong(0), got(1).getLong(1), got(1).getString(2)) ===
      ((0L, 0L, "no markup here")))
    assert(got(2).getString(2) === "")
  }

  test("langId votes marker words with deterministic tie-break") {
    val df = Seq(
      "the cat and the dog is here",       // en
      "der hund und die katze ist nicht",  // de
      "el perro es que la casa los",       // es
      "le chien est dans les une maison",  // fr
      "xyzzy plugh"                        // zero hits -> en fallback
    ).toDF("t").select(TextFunctions.langId($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "es", "fr", "en"))
  }

  test("script_counts classifies mixed-script text by codepoint block") {
    import graft.functions.ScriptStatsF
    GraftFunctions.register(spark)
    val df = Seq(
      "Hello 世界",                 // 5 latin + 2 han, 1 space skipped
      "日本語のテキストです",         // han + hiragana + katakana
      "Привет мир 123",             // cyrillic + digits
      "한국어 텍스트",               // hangul
      "مرحبا",                      // arabic
      "",                           // all-zero
      "a😀b"              // surrogate-pair emoji -> other, not 2 chars
    ).toDF("t").select(ScriptStatsF.scriptCounts($"t").as("sc"))
    val rows = df.collect().map(_.getStruct(0))
    def g(i: Int, f: String) = rows(i).getAs[Long](f)
    assert(g(0, "latin") === 5L && g(0, "han") === 2L && g(0, "other") === 0L)
    assert(g(1, "han") === 3L && g(1, "hiragana") === 3L && g(1, "katakana") === 4L)
    assert(g(2, "cyrillic") === 9L && g(2, "digit") === 3L)
    assert(g(3, "hangul") === 6L)
    assert(g(4, "arabic") === 5L)
    assert(graft.functions.ScriptUtil.buckets.forall(b => g(5, b) === 0L))
    assert(g(6, "latin") === 2L && g(6, "other") === 1L)
  }

  test("nfc composes combining sequences; langIdScript covers non-latin scripts") {
    import graft.functions.ScriptStatsF
    GraftFunctions.register(spark)
    // decomposed e+U+0301: 1 latin + 1 other raw, but 1 latin after NFC
    val deco = Seq("e\u0301").toDF("t")
    val before = deco.select(ScriptStatsF.scriptCounts($"t").as("sc"))
      .collect().head.getStruct(0)
    val after = deco.select(ScriptStatsF.scriptCounts(ScriptStatsF.nfc($"t")).as("sc"))
      .collect().head.getStruct(0)
    assert(before.getAs[Long]("latin") === 1L && before.getAs[Long]("other") === 1L)
    assert(after.getAs[Long]("latin") === 1L && after.getAs[Long]("other") === 0L)
    val df = Seq(
      "漢字と仮名が混ざった文",   // kanji + kana -> ja (kana outranks han)
      "中文文本没有假名",         // pure han -> zh
      "한국어 문장입니다",         // ko
      "Русский текст",            // ru
      "نص عربي",                  // ar
      "Ελληνικά",                 // el
      "עברית",                    // he
      "हिन्दी",                    // hi
      "the plain english text"    // latin -> marker voting -> en
    ).toDF("t").select(TextFunctions.langIdScript($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("ja", "zh", "ko", "ru", "ar", "el", "he", "hi", "en"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello   World", "hello world", "hello  world ").toDF("t")
      .select(TextFunctions.fingerprint($"t").as("f"))
    val fps = df.collect().map(_.getString(0)).toSeq
    assert(fps.distinct.size === 1)
  }

  test("wordShingles produces n-grams; short docs yield one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3).as("s"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) === Seq("a b c", "b c d"))
    assert(rows(1) === Seq("a b"))
  }

  test("charShingles slides over normalized text") {
    val df = Seq("ab cd").toDF("t")
      .select(TextFunctions.charShingles($"t", 3).as("s"))
    assert(df.head().getSeq[String](0) === Seq("ab ", "b c", " cd"))
  }
}
