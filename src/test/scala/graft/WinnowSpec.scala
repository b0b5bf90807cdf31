package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential + edge-case tests for the native `graft_winnow`
  * expression against the higher-order-function construction it
  * replaces (the q91 oracle re-derives the same values independently in
  * DuckDB, so the selection logic is triple-checked). */
class WinnowSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("native winnowing equals the HOF construction on the full fixture") {
    val native = graft.operators.TextAnalysisQueries.q91Winnowing(spark, sfDir).collect()
    val hof = graft.operators.TextAnalysisQueries.winnowingHof(spark, sfDir).collect()
    assert(native.toSeq === hof.toSeq)
  }

  private def sel(text: String, gram: Int = 4, window: Int = 5): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(expr(s"graft_winnow(t, $gram, $window)").as("s"))
      .head().getSeq[String](0)
  }

  test("selection edge cases") {
    // shorter than one full window of grams -> empty selection
    assert(sel("abcdefg") === Seq.empty) // 4 grams < window 5
    // exactly one window -> exactly one selected hash (the min of all 5)
    val one = sel("abcdefgh") // 5 grams, window 5
    assert(one.length === 1)
    // repeated text selects few distinct hashes
    assert(sel("abababababababab").toSet.size <= 2)
  }

  test("multi-byte text counts grams by code points, like substring()") {
    import spark.implicits._
    val text = "中文文本处理测试中文" // 10 CJK chars
    val viaExpr = Seq(text).toDF("t")
      .select(expr("graft_winnow(t, 4, 5)").as("s"),
        expr("transform(sequence(1, length(t) - 3), i -> md5(substring(t, i, 4)))").as("h"))
      .head()
    val hofSel = {
      val h = viaExpr.getSeq[String](1)
      h.sliding(5).map(_.min).toSeq.distinct
    }
    assert(viaExpr.getSeq[String](0) === hofSel)
  }

  test("non-positive gram or window is an analysis-time error, not a runtime crash") {
    import spark.implicits._
    for (bad <- Seq("graft_winnow(t, 0, 5)", "graft_winnow(t, 4, 0)",
                    "graft_winnow(t, -1, 5)")) {
      val e = intercept[Exception] {
        Seq("abcdefgh").toDF("t").select(expr(bad)).head()
      }
      assert(e.getMessage.contains("must be >= 1"), s"$bad: ${e.getMessage}")
    }
  }

  test("a foldable literal that throws on eval is a clean analysis error") {
    import spark.implicits._
    // cast('x' as int) is foldable but its eval throws under ANSI mode —
    // the typecheck must convert that into an analysis failure instead of
    // letting the raw cast exception escape the analyzer
    val e = intercept[Exception] {
      Seq("abcdefgh").toDF("t")
        .select(expr("graft_winnow(t, cast('x' as int), 5)")).head()
    }
    assert(e.getMessage.contains("failed to evaluate") ||
           e.getMessage.contains("DATATYPE_MISMATCH"),
      s"expected a clean analysis error, got: ${e.getMessage}")
  }

  test("property: native winnowing equals the HOF construction on randomized text and geometries") {
    import spark.implicits._
    // fixed-seed corpus: ascii letters/digits/spaces plus BMP CJK, with
    // lengths straddling every boundary (empty, < gram, < gram+window-1)
    val rnd = new scala.util.Random(42)
    def randString(): String = {
      val n = rnd.nextInt(60)
      (0 until n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar
          case 1 => ' '
          case 2 => ('0' + rnd.nextInt(10)).toChar
          case _ => (0x4e00 + rnd.nextInt(100)).toChar
        }
      }.mkString
    }
    val df = (1 to 300).map(_ => randString()).toDF("t")
    for ((g, w) <- Seq((4, 5), (2, 3), (1, 1), (3, 8))) {
      val minTerm = if (w == 1) "h[j-1]"
        else (0 until w).map(k => s"h[j-1+$k]").mkString("least(", ", ", ")")
      val both = df
        .withColumn("native", expr(s"graft_winnow(t, $g, $w)"))
        .withColumn("h", expr(
          s"transform(sequence(1, length(t) - ${g - 1}), i -> md5(substring(t, i, $g)))"))
      // sequence(1, n) DESCENDS when n < 1, so the HOF form is only
      // defined where a full window of grams exists
      val defined = both.filter(length(col("t")) >= g + w - 1)
        .withColumn("hof", expr(
          s"array_distinct(transform(sequence(1, size(h) - ${w - 1}), j -> $minTerm))"))
        .select("native", "hof").collect()
      assert(defined.nonEmpty)
      defined.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"geometry ($g, $w)")
      }
      both.filter(length(col("t")) < g + w - 1).select("native").collect()
        .foreach(r => assert(r.getSeq[String](0).isEmpty,
          s"sub-window text must select nothing at ($g, $w)"))
    }
  }

  test("property: positions-winnow equals the HOF struct construction on randomized text") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    def randString(): String = {
      val n = rnd.nextInt(60)
      (0 until n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar
          case 1 => ' '
          case 2 => ('0' + rnd.nextInt(10)).toChar
          case _ => (0x4e00 + rnd.nextInt(100)).toChar
        }
      }.mkString
    }
    val df = (1 to 300).map(_ => randString()).toDF("t")
    for ((g, w) <- Seq((4, 5), (2, 3), (1, 1), (3, 8))) {
      val minTerm = if (w == 1) "h[j-1]"
        else (0 until w).map(k => s"h[j-1+$k]").mkString("least(", ", ", ")")
      val both = df
        .withColumn("native", expr(s"graft_winnow_pos(t, $g, $w)"))
        .withColumn("h", expr(
          s"transform(sequence(1, length(t) - ${g - 1}), i -> md5(substring(t, i, $g)))"))
      val defined = both.filter(length(col("t")) >= g + w - 1)
        .withColumn("hof", expr(
          s"array_distinct(transform(sequence(1, size(h) - ${w - 1}), " +
            s"j -> struct($minTerm as print, " +
            s"cast(j - 1 + array_position(slice(h, j, $w), $minTerm) as bigint) as pos)))"))
        .select("native", "hof").collect()
      assert(defined.nonEmpty)
      defined.foreach { r =>
        val native = r.getSeq[Row](0).map(x => (x.getString(0), x.getLong(1)))
        val hof = r.getSeq[Row](1).map(x => (x.getString(0), x.getLong(1)))
        assert(native === hof, s"geometry ($g, $w)")
      }
      both.filter(length(col("t")) < g + w - 1).select("native").collect()
        .foreach(r => assert(r.getSeq[Row](0).isEmpty,
          s"sub-window text must select nothing at ($g, $w)"))
    }
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val r: Row = Seq(Option.empty[String]).toDF("t")
      .select(expr("graft_winnow(t, 4, 5)")).head()
    assert(r.isNullAt(0))
  }
}
