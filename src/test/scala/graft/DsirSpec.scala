package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions.col

/** DSIR importance weights: target-looking docs up, others down. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("docs sharing the target's vocabulary score positive, others negative") {
    // target (is_target=true) speaks {aa bb cc}; the rest speak {xx yy
    // zz}. Docs are long enough that the observed counts dominate the
    // add-one smoothing mass (dim buckets of it) — with counts ≪ dim
    // the smoothed models flatten toward uniform and every log-ratio
    // collapses toward 0, which is correct behavior but tests nothing.
    val df = Seq(
      (1L, ("aa bb cc " * 10).trim, true),
      (2L, ("bb cc aa " * 8).trim, true),
      (3L, ("xx yy zz " * 9).trim, false),
      (4L, ("yy zz xx " * 10).trim, false),
      (5L, ("aa bb cc " * 6).trim, false), // target-LOOKING, not in target
      (6L, "", false)).toDF("doc_id", "text", "tgt")
    val got = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"), dim = 64)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got(1L)._1 > 0 && got(1L)._2, "target doc weighs positive")
    assert(got(5L)._1 > 0 && got(5L)._2,
      "doc RESEMBLING the target is selected — the point of DSIR")
    assert(got(3L)._1 < 0 && !got(3L)._2, "off-target doc weighs negative")
    assert(got(4L)._1 < 0 && !got(4L)._2)
    assert(got(6L)._1 == 0.0 && !got(6L)._2, "empty doc is neutral, not kept")
    CacheRegistry.releaseAll()
  }
}
