package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence data generator: builds an sf1-equivalent dataset
  * (10× sf0.1) so the heavy dedup/ANN queries can be timed at two
  * scales and their growth checked against the plans' O(n)/O(n log n)
  * claims (judge r4 "Next #6").
  *
  * Scaling is NOT naive replication. `copies` shifted copies of
  * `documents`/`embeddings` are written, where copy 0 is the original
  * and copy c > 0 is content-perturbed:
  *
  *  - documents: every token gets a copy-specific suffix
  *    (`regexp_replace(text, "(\\S+)", "$1⋯c")`). Within-copy shingle
  *    structure — and therefore every within-copy near-dup pair — is
  *    preserved exactly (a bijection on the token vocabulary), while
  *    NO shingle matches across copies. A naive 10× replication would
  *    instead give every document 10 exact clones: pair counts grow
  *    quadratically and the "10× data" run would measure a corpus
  *    with 90% duplicate mass, which is not what 10× of a real corpus
  *    looks like (its dup RATE is roughly scale-invariant).
  *  - embeddings: copy c > 0 multiplies each element by a
  *    deterministic ±1 pattern keyed by (dimension, c) (murmur3).
  *    A shared sign-flip is an isometry: all within-copy dot products,
  *    norms, and cosines are unchanged — every cell/cluster/neighbor
  *    structure replicates exactly — while cross-copy cosines collapse
  *    toward 0 (random sign agreement), so cells don't merge across
  *    copies.
  *
  * `events`/`orders`/`lineitem` scale by key-shifted copies (ids
  * shifted, timestamps and attributes untouched — "10× the users over
  * the same period"), so the behavioral/event query family (q184–q195)
  * has a measurable growth story too; dimension keys (part, supplier,
  * customer) are deliberately NOT shifted — a bigger fact table joins
  * the same catalog, which is exactly the 100 TB shape. The five
  * dimension tables are byte-copied unchanged. Output layout mirrors
  * /root/testdata/sf*, so `SPARK_GRAFT_SF_DIR=<dst> runMain
  * graft.Bench` works as-is.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "data/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val shift = 10000000L
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dst))

    val docs = Tables(spark, src, "documents")
    // The copy suffix separator must be a character that normalizeText
    // preserves (non-whitespace, case-stable) and that CANNOT appear in
    // a source token — a bare "c$c" suffix was only injective within a
    // copy (an original token literally ending in "c1" equals copy 1's
    // suffixed form of its prefix), letting cross-copy near-dup pairs
    // leak into the scale measurements. '⋯' (U+22EF) satisfies both;
    // the one-scan guard makes the assumption loud instead of silent.
    val sep = "⋯"
    require(docs.where(col("text").contains(sep)).isEmpty,
      s"source corpus contains the copy separator '$sep'; " +
        "pick a different separator for this corpus")
    (0 until copies).map { c =>
      if (c == 0) docs
      else docs.select(
        (col("doc_id") + lit(c * shift)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1" + s"$sep$c").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = Tables(spark, src, "embeddings")
    (0 until copies).map { c =>
      if (c == 0) emb
      else emb.select(
        (col("vec_id") + lit(c * shift)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * when(pmod(hash(i, lit(c)), lit(2)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // Event/behavioral tables scale by KEY-SHIFTED copies — "10× the
    // users over the same period", which is what a larger deployment
    // actually looks like: per-window masses (hopping windows, burst
    // detection) grow 10×, while per-user/per-customer structure
    // (paths, attribution, RFM) replicates exactly, so the q184–q195
    // family measures real growth, not a rescaled clock. Timestamps
    // and non-key attributes are untouched.
    val events = Tables(spark, src, "events")
    (0 until copies).map { c =>
      if (c == 0) events
      else events
        .withColumn("event_id", col("event_id") + lit(c * shift))
        .withColumn("user_id", col("user_id") + lit(c * shift))
    }.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/events.parquet")

    val orders = Tables(spark, src, "orders")
    (0 until copies).map { c =>
      if (c == 0) orders
      else orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(c * shift))
        .withColumn("o_custkey", col("o_custkey") + lit(c * shift))
    }.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/orders.parquet")

    val lineitem = Tables(spark, src, "lineitem")
    (0 until copies).map { c =>
      if (c == 0) lineitem
      else lineitem
        .withColumn("l_orderkey", col("l_orderkey") + lit(c * shift))
    }.reduce(_ unionByName _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")

    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val from = Paths.get(src, s"$t.parquet")
      val to = Paths.get(dst, s"$t.parquet")
      if (Files.isRegularFile(from))
        Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
      else { // directory table: copy the part files
        Files.createDirectories(to)
        scala.util.Using.resource(Files.list(from)) { s =>
          s.forEach(p => Files.copy(p, to.resolve(p.getFileName),
            StandardCopyOption.REPLACE_EXISTING))
        }
      }
    }
    val nd = spark.read.parquet(s"$dst/documents.parquet").count()
    val ne = spark.read.parquet(s"$dst/embeddings.parquet").count()
    println(s"SCALEGEN dst=$dst documents=$nd embeddings=$ne copies=$copies")
    spark.stop()
  }
}
