package graft

import org.apache.spark.sql.functions._

import graft.llm.WebText

class WebTextSpec extends SparkSpec {

  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(WebText.extractText(col("h"))).as[String].head()

  test("extractText drops boilerplate containers, strips tags, decodes entities") {
    val html = "<html><head><title>T</title><style>p{}</style></head><body>" +
      "<nav><a href=\"/\">home</a></nav><h1>Title</h1>" +
      "<p>alpha &amp; beta &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>" +
      "<script>var x = 1 && 2;</script><footer>&copy; rodape</footer></body></html>"
    assert(extract(html) == "Title alpha & beta <tag> \"q\" 's' end")
  }

  test("extractText survives multi-line pages and attribute-heavy tags") {
    val html = "<html>\n<head>\n<script type=\"text/javascript\" async>\n" +
      "var a = 1;\nvar b = 2;\n</script>\n</head>\n<body class=\"x\" id='y'>\n" +
      "<p style=\"color:red\">um\ndois</p>\n</body>\n</html>"
    assert(extract(html) == "um dois")
  }

  test("double-escaped entities decode one level only (amp last)") {
    assert(extract("<body>&amp;lt;nao-tag&amp;gt;</body>") == "&lt;nao-tag&gt;")
  }

  test("textDensity is the surviving-character fraction") {
    val got = Seq("<body>ab</body>").toDF("h")
      .select(WebText.textDensity(col("h"), WebText.extractText(col("h"))))
      .as[Double].head()
    assert(got == 2.0 / 15.0)
  }
}
