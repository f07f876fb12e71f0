package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{scalars, geometry}

/** Property tests the reference relies on implicitly:
  * encode∘decode within quantization (datasets.py:387-394),
  * normlogit∘inv = id (ensemble.py:60-78), rot90⁴ = flip² = id
  * (datasets.py:289-297). Inputs are seeded-random batches evaluated
  * THROUGH the engine (as columns), not a scala-side reimplementation.
  */
class ScalarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def samples(n: Int, lo: Double, hi: Double): Seq[Double] =
    Seq.fill(n)(lo + (hi - lo) * rnd.nextDouble())

  private def evalOn(xs: Seq[Double])(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Double] =
    xs.toDF("x").select(f(col("x")).as("y")).collect().map(_.getDouble(0)).toSeq

  test("decode is exact inverse of encode up to quantization") {
    val xs = samples(200, 0.0, 22000.0)
    val rt = evalOn(xs)(x =>
      scalars.minmaxDecode(scalars.minmaxEncode(scalars.minmaxDecode(x, 0, 22000), 0, 22000)
        .cast("double"), 0, 22000) * 22000)
    xs.zip(rt).foreach { case (x, y) => assert(math.abs(x - y) <= 0.5 + 1e-9, s"$x -> $y") }
  }

  test("invNormlogit . normlogit = id on the clipped domain") {
    val xs = samples(200, 0.004, 0.996)
    val rt = evalOn(xs)(x => scalars.invNormlogit(scalars.normlogit(x)))
    xs.zip(rt).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, s"$x -> $y") }
  }

  test("sigmoid is inverse of logit") {
    val xs = samples(200, 0.01, 0.99)
    val rt = evalOn(xs)(x => scalars.sigmoid(scalars.logit(x)))
    xs.zip(rt).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12, s"$x -> $y") }
  }

  test("clip bounds and blend weights") {
    val out = evalOn(Seq(-5.0, 0.5, 5.0))(x => scalars.clip(x, 0.0, 1.0))
    assert(out == Seq(0.0, 0.5, 1.0))
    val b = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
      .select(scalars.blend(Seq((col("a"), 0.2), (col("b"), 0.3), (col("c"), 0.5))).as("y"))
      .collect()(0).getDouble(0)
    assert(math.abs(b - (0.2 + 0.6 + 1.5)) < 1e-12)
  }

  test("rot90 applied 4 times is identity; flips are involutions") {
    val n = 8
    val grid = geometry.meshgrid(spark, n, n)
    val four = (1 to 4).foldLeft(grid) { (df, _) =>
      val (ri, rj) = geometry.rot90(col("i"), col("j"), n, 1)
      df.select(ri.as("i"), rj.as("j"))
    }
    assert(four.except(grid).count() == 0 && grid.except(four).count() == 0)
    val flip2 = grid.select(geometry.flipUd(geometry.flipUd(col("i"), n), n).as("i"), col("j"))
    assert(flip2.except(grid).count() == 0)
  }

  test("reflectIndex maps the padded window reflectively into range") {
    val m = spark.range(0, 20).toDF("o")
      .select(col("o"), geometry.reflectIndex(col("o"), 16, 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.values.forall(s => s >= 0 && s < 16))
    assert(m(0L) == 2L && m(1L) == 1L && m(2L) == 0L && m(19L) == 13L)
  }

  test("graft_normalize: native one-pass kernel == regex-composed twin, docs + edge strings") {
    import graft.functions.text
    // real corpus: every document must agree byte-for-byte
    val docs = sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val disagree = docs.select(
      text.normalize(col("text")).as("fast"),
      text.normalizeComposed(col("text")).as("slow"))
      .where(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull)
      .count()
    assert(disagree == 0L, s"$disagree documents normalize differently")
    // adversarial edges: unicode lowercase, CJK (fully stripped), space
    // runs, leading/trailing, digits, punctuation, empty, lone spaces
    val edges = Seq(
      "Hello,  World!", "  a  b  ", "ÀÉÎ õü ß", "日本語テキスト", "A1 b2 C3",
      "", "   ", "MiXeD-CaSe_under score", "tab\there", " nbsp ",
      "ẞ sharp", "İstanbul", "ǅungla", "x" * 500 + "  Y").toDF("text")
    val got = edges.select(
      text.normalize(col("text")).as("fast"),
      text.normalizeComposed(col("text")).as("slow")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"mismatch: fast='${r.getString(0)}' slow='${r.getString(1)}'"))
    // fingerprint single-md5 form == the two-branch original
    val fpOld = docs.select(md5(when(length(text.normalizeComposed(col("text"))) === 0,
      col("text")).otherwise(text.normalizeComposed(col("text")))).as("fp"))
    val fpNew = docs.select(text.fingerprint(col("text")).as("fp"))
    assert(fpNew.except(fpOld).count() == 0 && fpOld.except(fpNew).count() == 0)
  }

  test("graft_html_extract: one-pass kernel == regex-chain twin, edges + seeded fuzz") {
    import graft.functions.text
    val edges = Seq(
      "<html><body><p>Hello <b>world</b></p></body></html>",
      "<script>var x = '<p>not text</p>';</script>after",
      "<SCRIPT type=\"text/js\">x<1 && y>2</SCRIPT>ok",
      "<style>.a{color:red}</style>styled",
      "<!-- a comment with <tags> inside -->visible",
      "a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos; f&nbsp;g",
      "unterminated <script>never closed",
      "unterminated <!-- comment",
      "unterminated <div attr='x'",
      "self-closing <br/> here",
      "<scriptx>not a script tag</scriptx>kept",
      "<style>a<script>b</style>c</script>",     // nesting: left-to-right scan order
      "&amp;lt; stays literal once decoded",
      "&bogus; unknown entity",
      "&unclosed entity",
      "  lots\t of\n whitespace\r\n  ",
      "tag>no open", "", "plain text only",
      "<p>a</p><p>b</p>",
      "&#65;&#x42;c numeric handled by kernel only") // excluded from twin compare below
    // twin agreement on everything without numeric entities
    val df = edges.filterNot(_.contains("&#")).toDF("h")
    val got = df.select(text.htmlExtract(col("h")).as("fast"),
      text.htmlExtractComposed(col("h")).as("slow")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"mismatch: fast='${r.getString(0)}' slow='${r.getString(1)}'"))
    // numeric entities: kernel-only semantics pinned directly
    val num = Seq("&#65;&#x42;c &#x1F600; &#0; &#xZZ; &#999999999;").toDF("h")
      .select(text.htmlExtract(col("h"))).collect()(0).getString(0)
    assert(num == "ABc 😀 &#0; &#xZZ; &#999999999;", s"numeric: '$num'")
    // seeded fuzz: random compositions of tags/blocks/entities/text —
    // the kernel and the regex chain must agree on every sample
    val rnd = new scala.util.Random(42)
    val atoms = Vector("<p>", "</p>", "<div class='x'>", "</div>", "<script>",
      "</script>", "<style>", "</style>", "<!--", "-->", "&amp;", "&lt;", "&gt;",
      "&nbsp;", "&bogus;", "&", "<", ">", " ", "\n", "\t", "word", "a b",
      "x<1", "1>0", "<br/>", "<ScRiPt>", "</SCRIPT >", "text")
    val fuzz = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => atoms(rnd.nextInt(atoms.length))).mkString)
    val fgot = fuzz.toDF("h").select(col("h"),
      text.htmlExtract(col("h")).as("fast"),
      text.htmlExtractComposed(col("h")).as("slow")).collect()
    fgot.foreach(r => assert(r.getString(1) == r.getString(2),
      s"fuzz mismatch on '${r.getString(0)}': fast='${r.getString(1)}' slow='${r.getString(2)}'"))
  }

  test("graft_char_ngrams: one-pass gram list == composed substring twin, docs + edges") {
    // the composed form is what the DuckDB oracle runs for t_lm_score;
    // the native expression must match it element-for-element
    val composed =
      when(length(col("text")) >= 3,
        expr("transform(sequence(0, length(text) - 3), i -> substring(text, i + 1, 3))"))
        .otherwise(expr("CAST(array() AS array<string>)"))
    val docs = sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val disagree = docs.select(
      call_function("graft_char_ngrams", col("text"), lit(3)).as("fast"),
      composed.as("slow"))
      .where(not(col("fast") <=> col("slow"))).count()
    assert(disagree == 0L, s"$disagree documents gram differently")
    // multibyte boundaries, exact-n strings, shorter-than-n, empty
    val edges = Seq("日本語テキスト", "ÀÉÎõ", "abc", "ab", "", "ǅŸß x",
      "mixèd ascii ünïcode").toDF("text")
    val got = edges.select(
      call_function("graft_char_ngrams", col("text"), lit(3)).as("fast"),
      composed.as("slow")).collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch: fast=${r.getSeq[String](0)} slow=${r.getSeq[String](1)}")
    }
  }

  test("graft_char_ngrams: NULL / invalid n literal is an analysis error, not an NPE") {
    val docs = Seq("abc").toDF("text")
    val eNull = intercept[org.apache.spark.sql.AnalysisException](
      docs.select(call_function("graft_char_ngrams", col("text"),
        lit(null).cast("int"))).collect())
    assert(eNull.getMessage.contains("non-null"), s"got: ${eNull.getMessage}")
    val eZero = intercept[org.apache.spark.sql.AnalysisException](
      docs.select(call_function("graft_char_ngrams", col("text"), lit(0))).collect())
    assert(eZero.getMessage.contains(">= 1"), s"got: ${eZero.getMessage}")
  }

  test("fillToNull + clampMin semantics") {
    val df = Seq(0.0, -3.0, 7.0).toDF("x")
    val nulls = df.select(scalars.fillToNull(col("x"), lit(0.0)).as("y"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(nulls.toSeq == Seq(None, Some(-3.0), Some(7.0)))
    val clamped = evalOn(Seq(-3.0, 7.0))(x => scalars.clampMin(x))
    assert(clamped == Seq(0.0, 7.0))
  }
}
