package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** URL canonicalization invariants (q139's frontier rule) and
  * containment-pair semantics (q140), over crafted inputs. */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: Seq[String]): Seq[String] = {
    val df = urls.toDF("u").select(T.urlCanonicalize(col("u")).as("c"))
    df.collect().map(_.getString(0)).toSeq
  }

  test("folding: scheme/host case, default ports, fragments, utm params") {
    val got = canon(Seq(
      "HTTP://Example.COM:80/a/b?x=1&utm_source=f&y=2#frag",
      "https://example.com:443/",
      "https://example.com",
      "http://example.com:8080/path/",
      "https://example.com/a?utm_a=1&utm_b=2"))
    assert(got == Seq(
      "http://example.com/a/b?x=1&y=2",
      "https://example.com/",
      "https://example.com/",
      "http://example.com:8080/path", // non-default port preserved
      "https://example.com/a"))      // all params dropped → no '?'
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTP://A.B:80/x/?utm_x=1&k=v#f",
      "https://c.d:443/e/f/",
      "http://g.h/i?j=k")
    val once = canon(urls)
    assert(canon(once) == once)
  }

  test("param ORDER is preserved for surviving params") {
    assert(canon(Seq("https://e.com/p?z=1&a=2&m=3")) ==
      Seq("https://e.com/p?z=1&a=2&m=3"))
  }

  test("containment: excerpt scores 1.0 where jaccard is far below threshold") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (1 to 12).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, excerpt), (2L, base)).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .containmentPairs(df, "doc_id", "text", threshold = 0.9)
      .collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("small") == 1L && r.getAs[Long]("large") == 2L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric measure misses this pair at the same bar
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(df, "doc_id", "text", threshold = 0.9)
    assert(jac.count() == 0)
  }

  test("containment ties (equal sizes) emit once, smaller id first") {
    val t = "alpha beta gamma delta epsilon zeta"
    val df = Seq((7L, t), (3L, t)).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .containmentPairs(df, "doc_id", "text", threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("small") == 3L)
    assert(pairs.head.getAs[Long]("large") == 7L)
  }
}
