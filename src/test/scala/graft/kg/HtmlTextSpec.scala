package graft.kg

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Freezes the byte-identical-text-per-url invariant: the Catalyst column
  * expression and the plain-Scala twin must agree byte-for-byte on every
  * fixture, and the goldens below must never change (any diff = broken
  * parity with previously extracted corpora).
  */
class HtmlTextSpec extends AnyFunSuite {

  val fixtures: Seq[(String, String)] = Seq(
    "<html><body><p>Hello world</p></body></html>" -> "Hello world",
    "<html><head><title>T</title><style>p{}</style></head><body>A  B\n\nC</body></html>" -> "A B C",
    "<body><script>var x = '<p>no</p>';</script>Kept</body>" -> "Kept",
    "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" -> "a & b <tag> \"q\" 's' end",
    "<!-- c1 --><div>X<!-- c2\nmultiline -->Y</div>" -> "X Y",
    "<p>&amp;lt;escaped&amp;gt;</p>" -> "&lt;escaped&gt;",
    "<SCRIPT>upper</SCRIPT><P>case</P>" -> "case",
    "" -> "",
    "plain text, no tags" -> "plain text, no tags",
    "<a href=\"x>y\">link</a> tail" -> "y\">link tail", // '>' inside attr: documented greedy-tag behavior
  )

  test("scala twin matches expected goldens") {
    fixtures.foreach { case (html, want) =>
      assert(HtmlText.extract(html) == want, s"for html: $html")
    }
  }

  test("column expression is byte-identical to the scala twin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = fixtures.map(_._1).toDF("html")
    val got = df.select(HtmlText.textOf(col("html"))).as[String].collect().toSeq
    val want = fixtures.map(f => HtmlText.extract(f._1))
    assert(got == want)
  }

  test("extractFast is byte-identical to extract on fixtures and corpus") {
    fixtures.foreach { case (html, _) =>
      assert(HtmlText.extractFast(html) == HtmlText.extract(html), s"for html: $html")
    }
    // whole synthetic corpus (sf0.001): every page byte-identical
    val spark = TestSpark.spark
    import spark.implicits._
    val htmls = Pages
      .corpus(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("html").cast("string"))
      .as[String]
      .collect()
    htmls.foreach { h =>
      assert(HtmlText.extractFast(h) == HtmlText.extract(h))
    }
    // entity corner cases
    Seq("&amp;amp;", "&&amp;", "&nb&nbsp;sp;", "a&unknown;b", "&", "x&gt", "&quot;&#39;&apos;")
      .foreach(s => assert(HtmlText.extractFast(s) == HtmlText.extract(s), s"for: $s"))
  }

  test("binary input (pages schema) round-trips through UTF-8") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = fixtures.map(_._1.getBytes("UTF-8")).toDF("html")
    val got = df.select(HtmlText.textOf(col("html"))).as[String].collect().toSeq
    assert(got == fixtures.map(f => HtmlText.extract(f._1)))
  }
}
