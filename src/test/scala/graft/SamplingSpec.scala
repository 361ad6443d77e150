package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic hash sampling: run-invariant membership, stratified
  * fractions that land near target, disjoint/exhaustive splits, salt
  * independence, and growth stability (a row's fate never changes when
  * the corpus around it does).
  */
class SamplingSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.01", "documents")

  test("membership is a pure function of the key — identical re-runs") {
    val a = Sampling.sampleByKey(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByKey(docs.repartition(13), col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "partitioning must not affect membership")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.05, s"got ${a.size / n}")
  }

  test("stratified fractions land near target per stratum") {
    val sampled = Sampling.sampleStratified(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
    val got = sampled.groupBy("lang").agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(got("en").toDouble / tot("en") - 0.5) < 0.1)
    assert(math.abs(got("de").toDouble / tot("de") - 0.25) < 0.1)
  }

  test("split is disjoint and exhaustive; salt gives independent draws") {
    val (train, holdout) = Sampling.split(docs, col("doc_id"), 0.2)
    val (tIds, hIds) = (
      train.select("doc_id").collect().map(_.getLong(0)).toSet,
      holdout.select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(tIds.intersect(hIds).isEmpty)
    assert(tIds.size + hIds.size == docs.count())

    val s1 = Sampling.sampleByKey(docs, col("doc_id"), 0.3, salt = "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.sampleByKey(docs, col("doc_id"), 0.3, salt = "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 != s2, "different salts must draw different samples")
    // independent draws overlap at ~fraction² of the corpus, not ~fraction
    val overlap = s1.intersect(s2).size / docs.count().toDouble
    assert(overlap < 0.2, s"overlap $overlap suggests correlated draws")
  }

  test("growth stability: a row's fate is independent of the corpus") {
    val small = docs.where(col("doc_id") < 200)
    val fromSmall = Sampling.sampleByKey(small, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fromFull = Sampling.sampleByKey(docs, col("doc_id"), 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromSmall == fromFull.filter(_ < 200),
      "growing the corpus must not flip earlier rows' membership")
  }

  test("mixToTarget: binding source kept whole, kept mass tracks target shares") {
    import graft.functions.{Text => T}
    val d = docs.select(col("doc_id"), col("source"),
      T.tokenCount(col("text")).cast("long").as("n_tokens"))
    val mixed = Sampling.mixToTarget(d, "doc_id", "source", "n_tokens",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
    val fr = mixed.groupBy("source").agg(first("frac").as("f")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // shares ≈ equal masses → src0 (largest demand/mass ratio) binds
    assert(fr("src0") == 1.0, s"binding source must keep everything: $fr")
    assert(fr("src1") < 1.0 && fr("src2") < fr("src1"), s"$fr")
    // unlisted sources drop entirely
    assert(fr("src3") == 0.0 && mixed.where(col("source") === "src3")
      .where(col("keep")).count() == 0)
    // achieved mass of kept rows approximates share_s·T (hash sampling
    // is exact in expectation; tolerance covers per-doc mass variance
    // on 25-doc strata)
    val m = mixed.where(col("keep")).groupBy("source")
      .agg(sum("n_tokens").as("kept")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = m.values.sum.toDouble
    assert(math.abs(m("src0") / total - 0.5) < 0.12, s"$m")
    assert(math.abs(m("src1") / total - 0.3) < 0.12, s"$m")
  }

  test("mixToTarget plan: fractions broadcast onto the corpus, no corpus shuffle") {
    import graft.functions.{Text => T}
    val d = docs.select(col("doc_id"), col("source"),
      T.tokenCount(col("text")).cast("long").as("n_tokens"))
    val plan = Sampling.mixToTarget(d, "doc_id", "source", "n_tokens",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
      .queryExecution.executedPlan.toString
    // the 100 TB side takes exactly one scan + a broadcast hash probe;
    // only the tiny per-source aggregate may exchange
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side shuffle join in:\n$plan")
  }

  test("mixToTarget: a zero-mass targeted source neither binds nor NaNs") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", 100L), (2L, "a", 100L),
      (3L, "b", 50L),
      (4L, "z", 0L) // targeted but nothing to supply
    ).toDF("doc_id", "source", "mass")
    val got = Sampling.mixToTarget(d, "doc_id", "source", "mass",
      Map("a" -> 0.5, "b" -> 0.3, "z" -> 0.2))
    val fr = got.groupBy("source").agg(first("frac").as("f")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // z excluded from the min: T = min(200/0.5, 50/0.3) = 166.67 →
    // a keeps 83.3/200, b binds at 1.0, z gets frac 0 (not NaN)
    assert(fr("b") == 1.0, s"$fr")
    assert(math.abs(fr("a") - (0.5 * (50.0 / 0.3) / 200.0)) < 1e-9, s"$fr")
    assert(fr("z") == 0.0 && !fr.values.exists(_.isNaN), s"$fr")
    // keep column stays a total boolean (no null poisoning)
    assert(got.where(col("keep").isNull).count() == 0)
  }

  test("quotaPerKey: caps over-quota keys, passes the rest untouched") {
    import spark.implicits._
    // key a: 7 rows (over quota 3), key b: 3 (at), key c: 1 (under)
    val df = ((1 to 7).map(i => ("a", i.toLong)) ++
      (1 to 3).map(i => ("b", 100L + i)) :+ ("c", 999L))
      .toDF("k", "ord")
    val out = Sampling.quotaPerKey(df, col("k"), col("ord"), 3)
    val byKey = out.groupBy("k").agg(count(lit(1)).as("n"),
      collect_list("ord").as("kept")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](2).sorted).toMap
    assert(byKey("a") == Seq(1L, 2L, 3L), "keeps FIRST quota rows by order")
    assert(byKey("b") == Seq(101L, 102L, 103L) && byKey("c") == Seq(999L))
    // schema preserved (no helper columns leak)
    assert(out.columns.toSeq == df.columns.toSeq)
  }

  test("quotaPerKey is partitioning-invariant and deterministic") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"k${i % 5}", i.toLong)).toDF("k", "ord")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.quotaPerKey(d, col("k"), col("ord"), 7)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run(df) == run(df.repartition(17)))
    assert(run(df).size == 35)
  }

  test("quotaPerKey: pathological hot key ranks through the salted path, " +
      "exactly matching a full rank") {
    import spark.implicits._
    // one 100k-row host + healthy keys — the straggler scenario: the
    // hot key's rank must NOT land on a single window partition
    val df = ((1 to 100000).map(i => ("hot.example", i.toLong * 7 % 100001)) ++
      (1 to 50).map(i => (s"small$i", i.toLong))).toDF("k", "ord")
    val out = Sampling.quotaPerKey(df, col("k"), col("ord"), 25)
    // plan-assert the salted pre-trim: the over-quota branch windows by
    // (key, salt) before the final per-key rank
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"expected salted window in plan:\n$plan")
    val got = out.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // exact equivalence with the naive single full rank
    val naive = df.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("ord")))
      .where(col("rn") <= 25).drop("rn")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got == naive)
    assert(got("hot.example").size == 25)
    assert(got("small1") == Seq(1L))
  }

  test("quotaPerKey: over-quota NULL-key group is capped (null-safe join)") {
    import spark.implicits._
    val df = ((1 to 9).map(i => (Option.empty[String], i.toLong)) ++
      (1 to 2).map(i => (Some("a"), 100L + i))).toDF("k", "ord")
    val out = Sampling.quotaPerKey(df, col("k"), col("ord"), 3).collect()
    val nullRows = out.filter(_.isNullAt(0)).map(_.getLong(1)).sorted.toSeq
    assert(nullRows == Seq(1L, 2L, 3L), s"NULL key must be capped: $nullRows")
    assert(out.count(!_.isNullAt(0)) == 2)
  }

  test("quotaPerKey: caller columns named like internals do not collide") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("a", i.toLong, s"u$i", i, 0, 0))
      .toDF("k", "ord", "__qk", "__rn", "__salt", "__over")
    val out = Sampling.quotaPerKey(df, col("k"), col("ord"), 4)
    assert(out.columns.toSeq == df.columns.toSeq, "schema must be preserved")
    assert(out.count() == 4)
    // caller's __qk values survive untouched
    assert(out.select("__qk").collect().forall(_.getString(0).startsWith("u")))
  }

  test("temperatureMix: T=1 is natural (all kept); T<1 upweights the small source") {
    import spark.implicits._
    // source big: 9 docs × 10 tokens = 90; source small: 1 doc × 10 = 10
    val docs = ((1 to 9).map(i => (i.toLong, "big", 10L)) :+ (100L, "small", 10L))
      .toDF("doc_id", "source", "n_tokens")
    // T = 1: shares are the natural proportions, so every source binds
    // simultaneously and everything is kept whole
    val nat = Sampling.temperatureMix(docs, "doc_id", "source", "n_tokens",
      temperature = 1.0)
    assert(nat.where(!col("keep")).count() == 0)
    assert(nat.select("frac").collect().forall(_.getDouble(0) == 1.0))
    // T = 0.5: w = (sqrt(90), sqrt(10)) → shares (0.75, 0.25); the small
    // source binds (10/0.25 = 40 < 90/0.75 = 120) and is kept whole;
    // the big source downsamples to 0.25·40/90·... = share·t/m = 1/3
    val cool = Sampling.temperatureMix(docs, "doc_id", "source", "n_tokens",
      temperature = 0.5)
    val fracs = cool.select("source", "frac").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fracs("small") == 1.0, s"binding source must keep whole: $fracs")
    assert(math.abs(fracs("big") - 1.0 / 3.0) < 1e-12, s"big frac: $fracs")
  }

  test("temperatureMix: binding-source frac is the LITERAL 1.0 even when " +
      "the naive share·t/m round-trip would land at 0.999…") {
    import spark.implicits._
    // masses 2 and 10 at T = 0.5 are a verified IEEE hazard: computing
    // share·t/m for the binding source in doubles yields
    // 0.9999999999999999, which floor(frac · Buckets) turns into a
    // silent ~1-bucket loss of the source that must be kept WHOLE.
    // First prove the fixture exercises the hazard…
    val (ma, mb) = (2.0, 10.0)
    val (wa, wb) = (math.sqrt(ma), math.sqrt(mb))
    val z = wa + wb
    val (sa, sb) = (wa / z, wb / z)
    val bindShare = if (ma / sa <= mb / sb) sa else sb
    val bindM = if (ma / sa <= mb / sb) ma else mb
    val t = math.min(ma / sa, mb / sb)
    assert(bindShare * t / bindM != 1.0,
      "fixture no longer exercises the round-trip hazard — pick new masses")
    // …then assert the engine pins it structurally (ts === t compare)
    val docs = Seq((1L, "tiny", 2L), (2L, "big", 10L))
      .toDF("doc_id", "source", "n_tokens")
    val fr = Sampling.temperatureMix(docs, "doc_id", "source", "n_tokens",
        temperature = 0.5)
      .select("source", "frac").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fr("tiny") == 1.0, s"binding source frac must be exactly 1.0: $fr")
    assert(fr("big") < 1.0, s"$fr")
  }

  test("urlRegisteredDomain: PSL subset, www strip, single-label passthrough") {
    import spark.implicits._
    import graft.functions.{Text => T}
    val hosts = Seq("www.news.co.uk", "a.b.example.com", "site1.de",
      "www.site1.de", "localhost", "", "x.com.cn").toDF("h")
    val got = hosts.select(T.urlRegisteredDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("news.co.uk", "example.com", "site1.de", "site1.de",
      "localhost", "", "x.com.cn"))
  }
}
