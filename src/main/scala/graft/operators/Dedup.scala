package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Deduplication operators for the training-data pipeline extensions:
  * exact (hash group-by), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (the point is 100 TB, not 500 rows):
  *  - Signatures are narrow per-row projections (no shuffle).
  *  - Candidate generation shuffles on *bucket hashes*, never on raw
  *    text: the only wide exchanges move (bucket, id) pairs.
  *  - Verification joins are self-equi-joins on bucket/id keys — AQE
  *    handles skewed hot buckets; a salting pass can be added per-bucket
  *    if one bucket exceeds a partition.
  *  - All hashes are md5 (identical in Spark and DuckDB) so the oracle
  *    can recompute every signature exactly.
  */
object Dedup {

  /** Exact dedup: group rows by normalized-text fingerprint, keep the
    * minimum id as the canonical representative. One shuffle keyed by
    * the 128-bit fingerprint — uniform by construction, no skew.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), T.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Distinct word-shingle set of a document (the unit of Jaccard). */
  def shingleSet(textCol: Column, shingleN: Int): Column =
    array_distinct(T.wordShingles(T.tokens(T.normalizeText(textCol)), shingleN))

  /** MinHash signature from a shingle-set column: `k` independent
    * permutations approximated by seeded md5s; signature element i is
    * the lexicographic-min md5 of the shingles under seed i. Pure
    * projection, no shuffle.
    */
  def minhashSigFromShingles(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles,
        s => md5(concat(i.cast("string"), lit("|"), s)))))

  def minhashSignature(textCol: Column, k: Int, shingleN: Int): Column =
    minhashSigFromShingles(shingleSet(textCol, shingleN), k)

  /** LSH band buckets over a MinHash signature: `bands` buckets, each
    * hashing r = k/bands consecutive signature elements. The band index
    * is mixed into the hash input, so bucket values are globally unique
    * per band and candidate joins need only the single bucket column.
    */
  def lshBuckets(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat(b.cast("string"), lit("#"),
        concat_ws(",", slice(sig, b * r + lit(1), lit(r))))))
  }

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** MinHash-LSH near-duplicate pairs: signature → band buckets →
    * bucket-join for candidates → exact-Jaccard verification.
    *
    * Plan shape: one explode (docs × bands rows), one shuffle on the
    * bucket hash for the self-join, one distinct on (a, b), then a
    * verification join back to the shingle sets. Raw text never
    * shuffles; only ids, buckets, and shingle arrays for surviving
    * candidates.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val shingled = df.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("shingles"))
    val sigs = shingled
      .select(col("id"),
        explode(lshBuckets(minhashSigFromShingles(col("shingles"), k), k, bands))
          .as("bucket"))
    val candidates = sigs.as("x").join(sigs.as("y"), Seq("bucket"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    candidates
      .join(shingled.withColumnRenamed("id", "a")
        .withColumnRenamed("shingles", "sa"), Seq("a"))
      .join(shingled.withColumnRenamed("id", "b")
        .withColumnRenamed("shingles", "sb"), Seq("b"))
      .withColumn("jaccard", jaccard(col("sa"), col("sb")))
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** N-gram Jaccard dedup with cheap prefix blocking: documents are
    * blocked on the md5 of their first `prefixTokens` normalized tokens;
    * only within-block pairs are scored. Blocking bounds the candidate
    * set without an all-pairs cross join (at 100 TB an all-pairs scoring
    * pass is impossible; a block key — prefix, URL host, length bucket —
    * is what makes pairwise verification tractable).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, prefixTokens: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      md5(concat_ws(" ",
        slice(T.tokens(T.normalizeText(col(textCol))), 1, prefixTokens)))
        .as("block"),
      array_distinct(T.wordShingles(T.tokens(T.normalizeText(col(textCol))),
        shingleN)).as("shingles"))
    base.as("x").join(base.as("y"), Seq("block"))
      .where(col("x.id") < col("y.id"))
      .withColumn("jaccard", jaccard(col("x.shingles"), col("y.shingles")))
      .where(col("jaccard") >= threshold)
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(col("jaccard"), 6).as("jaccard"))
  }
}
