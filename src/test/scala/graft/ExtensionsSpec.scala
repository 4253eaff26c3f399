package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.TripPipelineDemo

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects all engine functions at session birth") {
    // a separate session in the same JVM, configured purely via extensions
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT week_of_month(DATE'2024-03-29') AS w,
          |  dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |  size(shingle_hashes('hello world', 5)) AS sh,
          |  simhash64(array('a','b')) <> 0 AS sim""".stripMargin).head()
      assert(r.getInt(0) === 5)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-9)
      assert(r.getInt(2) > 0)
      assert(r.getBoolean(3))
      val agg = s.sql(
        """SELECT topk_pairs(CAST(v AS DOUBLE), id, 2) AS top FROM VALUES
          |  (1.0, 10L), (3.0, 30L), (2.0, 20L) AS t(v, id)""".stripMargin).head()
      val top = agg.getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(_.getLong(1)) === Seq(30L, 20L))
      val r2 = s.sql(
        """SELECT dot_l(array(1L, 2L), array(3L, 4L)) AS dl,
          |  gram_stats(array('a', 'b', 'a')).max_freq AS gmax,
          |  repetition_stats(array('x', 'y', 'x', 'y')).max_bigram_freq AS bmax
          |""".stripMargin).head()
      assert(r2.getLong(0) === 11L)
      assert(r2.getLong(1) === 2L)
      assert(r2.getLong(2) === 2L) // "x y" appears twice
      val mk = s.sql(
        """SELECT min_k_ids(id, 2) AS ks FROM VALUES (5L), (1L), (9L), (3L) AS t(id)
          |""".stripMargin).head()
      assert(mk.getSeq[Long](0) === Seq(1L, 3L))
      val ws = s.sql(
        "SELECT word_shingles('A b c d', 3) AS w").head()
      assert(ws.getSeq[String](0) === Seq("a b c", "b c d"))
      val md = s.sql(
        """SELECT char_shingles('abcd', 3) AS cs,
          |  size(md5_minhash_sig('hello world', 5, 8)) AS ml,
          |  md5_simhash(array('a','b')).sim_hi AS sh""".stripMargin).head()
      assert(md.getSeq[String](0) === Seq("abc", "bcd"))
      assert(md.getInt(1) === 8)
      assert(md.getLong(2) >= 0L && md.getLong(2) < (1L << 32))
    } finally {
      // do not stop: other suites share the JVM-wide default session
    }
  }

  test("extension injection and imperative registration stay in sync") {
    // the two registration paths are maintained by hand; this pins that
    // neither grows a function the other lacks. getOrCreate() would
    // return the existing default session (ignoring extensions), making
    // the comparison vacuous — clear defaults to force a FRESH session
    // through the extension path, then restore.
    val imp = SparkSpec.session // GraftFunctions.register'd
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext =
      try SparkSession.builder()
        .master("local[2]").appName("graft-ext-parity")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(imp)
        SparkSession.setActiveSession(imp)
      }
    assert(ext ne imp, "parity test needs a distinct session")
    def graftFns(s: SparkSession): Set[String] = {
      val builtin = org.apache.spark.sql.catalyst.analysis
        .FunctionRegistry.builtin.listFunction().map(_.funcName).toSet
      s.sessionState.functionRegistry.listFunction()
        .map(_.funcName).filterNot(builtin).toSet
    }
    assert(graftFns(ext) === graftFns(imp),
      s"extension-injected=${graftFns(ext)} imperative=${graftFns(imp)}")
    assert(graftFns(imp).contains("word_shingles"))
  }
}
