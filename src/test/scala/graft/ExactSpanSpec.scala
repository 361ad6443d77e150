package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.col

/** Exact (suffix-array-grade) variable-length span dedup vs the
  * fixed-gram island approximation: the three behaviors that make
  * `exactDupSpans` "exact" — exact boundaries/lengths for long
  * verbatim runs, chimera SPLITTING where gram islands over-merge,
  * and capped-run suppression. */
class ExactSpanSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("a 60-token verbatim duplication reports as ONE exact span per occurrence") {
    val S = toks("s", 60)
    val a = (toks("a", 10) ++ S ++ toks("b", 10)).mkString(" ")
    val b = (toks("c", 7) ++ S ++ toks("d", 5)).mkString(" ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 50, cap = 200)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one span per doc, starting exactly where S starts, exactly 60 long
    assert(got.toSeq == Seq((1L, 10L, 60L), (2L, 7L, 60L)))
  }

  test("49-token duplication is below a minLen=50 threshold: no spans") {
    val S = toks("s", 49)
    val df = Seq(
      (1L, (toks("a", 5) ++ S ++ toks("b", 5)).mkString(" ")),
      (2L, (toks("c", 5) ++ S ++ toks("d", 5)).mkString(" "))).toDF("doc_id", "text")
    assert(Dedup.exactDupSpans(df, "doc_id", "text", minLen = 50, cap = 200)
      .count() == 0)
  }

  test("chimera: exact reports TWO adjacent repeats where gram islands merge to one") {
    // doc 1 carries S1 (6 toks, shared with doc 2) immediately followed
    // by S2 (7 toks, shared with doc 3). No 13-token substring repeats.
    val s1 = toks("s", 6); val s2 = toks("t", 7)
    val df = Seq(
      (1L, (toks("x", 2) ++ s1 ++ s2 ++ toks("y", 1)).mkString(" ")),
      (2L, (toks("z", 1) ++ s1 ++ toks("q", 2)).mkString(" ")),
      (3L, (toks("w", 1) ++ s2 ++ toks("v", 2)).mkString(" "))).toDF("doc_id", "text")
    val exact = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 5, cap = 50)
      .where(col("id") === 1).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // two maximal repeats with their true lengths — NOT one 13-span
    assert(exact.toSeq == Seq((2L, 6L), (8L, 7L)))
    val gram = Dedup.dupSpanRanges(df, "doc_id", "text", n = 5)
      .where(col("id") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // the island view welds the adjacent repeats into one 13-token span
    assert(gram.toSeq == Seq((2L, 13L)),
      "gram-island approximation over-merges the chimera")
  }

  test("within-document self-repeat reports both occurrences") {
    val S = toks("s", 8)
    val df = Seq(
      (1L, (S ++ toks("f", 3) ++ S).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 6, cap = 50)
      .orderBy("span_start").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 8L), (11L, 8L)))
  }

  test("plan: suffix rows shuffle once (h-keyed), no join, no self-pairing") {
    // range leaf so nothing constant-folds away; count AQE's final plan
    // exchanges: the dup test rides the same h-keyed window exchange as
    // the LCP chain, then one doc-keyed window — 3 total with the
    // initial repartition, and no Join node anywhere
    import org.apache.spark.sql.functions.{concat_ws, lit}
    val docs = spark.range(64).select(col("id").as("doc_id"),
      concat_ws(" ", lit("t1 t2 t3 t4 t5 t6"), col("id").cast("string")).as("text"))
    val plan = Dedup.exactDupSpans(docs, "doc_id", "text", minLen = 5, cap = 10,
        maxGroup = 0L)
      .queryExecution.executedPlan.toString
    val body = plan.split("\\+\\- == Initial Plan ==")(0)
    assert(!body.contains("Join"), "no join in the exact-span plan")
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(body).size
    assert(exchanges <= 3, s"expected ≤3 exchanges, got $exchanges:\n$body")
  }

  test("plan: hot-gram guard adds no join — InSet probe inside the one shuffle") {
    import org.apache.spark.sql.functions.{concat_ws, lit}
    // every doc shares the same 6-gram, so with maxGroup = 10 the
    // guard engages AND finds a hot set — the worst case for the plan
    val docs = spark.range(64).select(col("id").as("doc_id"),
      concat_ws(" ", lit("t1 t2 t3 t4 t5 t6"), col("id").cast("string")).as("text"))
    val plan = Dedup.exactDupSpans(docs, "doc_id", "text", minLen = 5, cap = 10,
        maxGroup = 10L)
      .queryExecution.executedPlan.toString
    val body = plan.split("\\+\\- == Initial Plan ==")(0)
    // the hot set rides a collected InSet predicate: no join of any
    // kind may appear — a shuffle join on h would re-create the very
    // skew the guard removes
    assert(!body.contains("Join"), s"guarded plan is join-free:\n$body")
    CacheRegistry.releaseAll()
  }

  test("hot-gram ceiling: a 150-fold gram skips the window but still reports") {
    // 150 docs all carrying the same 5-gram G at position 2, unique
    // filler elsewhere — with maxGroup = 50 the G-group (150 members)
    // must bypass the sorted window and report saturated heads.
    val G = toks("g", 5).mkString(" ")
    val dup = (1 to 150).map(i => (i.toLong, s"u${i}a u${i}b $G"))
    val df = dup.toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 5, cap = 12,
        maxGroup = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc reports exactly its G occurrence; d clamps to the 5
    // tokens actually available at the end of the doc
    assert(got.length == 150)
    assert(got.forall { case (_, s, l) => s == 2L && l == 5L }, got.take(5).toSeq)
    // the same corpus below the ceiling reports identically (G groups
    // are measured exactly and G's true run length IS 5)
    val exact = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 5, cap = 12,
        maxGroup = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(exact.sorted.toSeq == got.sorted.toSeq,
      "ceiling-saturated output matches the exact measurement for a pure gram")
    CacheRegistry.releaseAll()
  }

  test("hot-gram ceiling: removal excises exactly the boilerplate region") {
    // G sits mid-document: hot positions saturate to d = minLen, so the
    // interval union covers exactly G — no overshoot into unique tail
    val G = toks("g", 5)
    val dup = (1 to 120).map(i =>
      (i.toLong, (Seq(s"u${i}a", s"u${i}b") ++ G ++ Seq(s"v${i}a", s"v${i}b")).mkString(" ")))
    val df = dup.toDF("doc_id", "text")
    val got = Dedup.exactRemoveDupSpans(df, "doc_id", "text", minLen = 5, cap = 12,
        maxGroup = 40L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 120)
    got.foreach { case (id, nTok, nRem, clean) =>
      assert(nTok == 9L && nRem == 5L, s"doc $id: ($nTok, $nRem)")
      assert(clean == s"u${id}a u${id}b v${id}a v${id}b", s"doc $id: '$clean'")
    }
    CacheRegistry.releaseAll()
  }

  test("hot-gram ceiling: contamination reports bench-shared hot grams only") {
    val G = toks("g", 6)  // hot, bench-shared
    val H = toks("h", 6)  // hot, corpus-only
    val corpus = (1 to 100).map(i =>
      (i.toLong, (Seq(s"u$i") ++ G ++ Seq(s"m$i") ++ H ++ Seq(s"v$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq((900L, (Seq("e1", "e2") ++ G).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactContaminationSpans(corpus, bench, "doc_id", "text",
        minLen = 6, cap = 20, maxGroup = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each corpus doc flags its G occurrence (position 1); the corpus-
    // only hot gram H has no bench witness and must NOT report
    assert(got.length == 100, s"got ${got.length}")
    assert(got.forall { case (_, s, _) => s == 1L }, got.take(5).toSeq)
    CacheRegistry.releaseAll()
  }

  test("TokenLcp: whole-token prefix semantics, interpreted == codegen") {
    import org.apache.spark.sql.graftvec.VectorExpressions.tokenLcp
    val cases = Seq(
      ("a b c", "a b d", 2), ("a b", "a b", 2), ("", "", 0),
      ("", "a", 0), ("a", "a b", 1), ("ab", "abc", 0), ("ab c", "ab d", 1),
      ("x ⋯y z", "x ⋯y w", 2), // multi-byte inside a token
      ("s1 s2 s3", "s1 s2 s3", 3), ("q", "r", 0))
    val df = cases.toDF("a", "b", "want")
    // codegen path (projection over a DataFrame)
    val got = df.select(col("want"), tokenLcp(col("a"), col("b")).as("got"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))
    // interpreted path (direct eval)
    cases.foreach { case (a, b, want) =>
      val e = org.apache.spark.sql.graftvec.TokenLcp(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(a),
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(b),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null) == want, s"eval('$a','$b')")
    }
  }

  test("removal: excises exactly the covered tokens, exact even past cap") {
    // 30-token duplication with cap 12: the span REPORT saturates at 12,
    // but removal unions every position's interval, so all 30 tokens go
    val S = toks("s", 30)
    val df = Seq(
      (1L, (toks("a", 3) ++ S ++ toks("b", 2)).mkString(" ")),
      (2L, (toks("c", 2) ++ S ++ toks("d", 3)).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactRemoveDupSpans(df, "doc_id", "text", minLen = 5, cap = 12)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 35L, 30L, (toks("a", 3) ++ toks("b", 2)).mkString(" ")),
      (2L, 35L, 30L, (toks("c", 2) ++ toks("d", 3)).mkString(" "))))
    // a clean doc passes through untouched
    val clean = Seq((9L, toks("u", 8).mkString(" "))).toDF("doc_id", "text")
    val u = Dedup.exactRemoveDupSpans(clean, "doc_id", "text", minLen = 5, cap = 12)
      .collect().head
    assert(u.getLong(2) == 0L && u.getString(3) == toks("u", 8).mkString(" "))
    CacheRegistry.releaseAll()
  }

  test("contamination: corpus-vs-bench exact spans; corpus-corpus dups ignored") {
    val S = toks("s", 12)   // shared corpus↔bench run
    val Q = toks("q", 15)   // shared corpus↔corpus run (no bench copy)
    val corpus = Seq(
      (1L, (toks("a", 4) ++ S ++ toks("b", 3) ++ Q).mkString(" ")),
      (2L, (toks("c", 2) ++ Q ++ toks("d", 4)).mkString(" "))).toDF("doc_id", "text")
    val bench = Seq(
      (90L, (toks("e", 5) ++ S ++ toks("f", 2)).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactContaminationSpans(corpus, bench, "doc_id", "text",
      minLen = 6, cap = 40)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ONLY the bench-shared run reports — the 15-token corpus-corpus
    // duplication is exactDupSpans' business, not contamination — and
    // the bench doc itself never appears in the output
    assert(got.toSeq == Seq((1L, 4L, 12L)))
  }

  test("a run longer than cap reports once, saturated at cap") {
    val S = toks("s", 30)
    val df = Seq(
      (1L, (toks("a", 3) ++ S ++ toks("b", 3)).mkString(" ")),
      (2L, (toks("c", 3) ++ S ++ toks("d", 3)).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactDupSpans(df, "doc_id", "text", minLen = 5, cap = 12)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 12L), (2L, 3L, 12L)))
  }
}
