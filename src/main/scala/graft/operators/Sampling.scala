package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducibility primitive a
  * training-data pipeline mixes sources with. `df.sample()` draws from
  * a seeded RNG whose outcome depends on partitioning, so re-runs and
  * engines disagree; hashing a stable KEY makes inclusion a pure
  * function of the row — the same rows are chosen on every run, every
  * engine, every partition layout, and a row's fate never changes when
  * the corpus around it grows (the property that keeps train/test
  * splits stable across dataset versions).
  *
  * The hash is md5 (identical in Spark and DuckDB, like every other
  * signature in this engine), folded to a uniform bucket in [0, 1e6):
  * narrow codegen'd projection, no shuffle, no RNG anywhere.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from a key column; salt derives
    * independent samples from the same keys (different salt → an
    * unrelated, equally-uniform assignment). */
  def hashBucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Keep a deterministic `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.where(hashBucket(key, salt) < (fraction * Buckets).toLong)

  /** Stratified deterministic sampling: per-stratum fractions (data
    * mixing), with a default for unlisted strata. The whole predicate
    * is one codegen'd CASE over the stratum column — a single narrow
    * scan, no per-stratum jobs. */
  def sampleStratified(df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, f)) => acc.when(stratum === s, (f * Buckets).toLong)
    }.otherwise((defaultFraction * Buckets).toLong)
    df.where(hashBucket(key, salt) < threshold)
  }

  /** Disjoint deterministic train/holdout split: the same hash with
    * one threshold, so membership is exclusive and exhaustive. */
  def split(df: DataFrame, key: Column, holdoutFraction: Double,
      salt: String = ""): (DataFrame, DataFrame) = {
    val cut = (holdoutFraction * Buckets).toLong
    val b = hashBucket(key, salt)
    (df.where(b >= cut), df.where(b < cut))
  }

  /** Domain-mixture reweighting: down-sample each source so the KEPT
    * corpus's mass (tokens) matches `targets`' shares — the mixing
    * step (à la The Pile / DoReMi weights) that turns "we want 50%
    * web, 30% books, 20% code" into per-source sampling rates given
    * whatever mass each source actually has.
    *
    * The achievable total is T = min over targeted sources of
    * m_s / share_s (the binding source is kept whole; every other
    * source down-samples to share_s·T). Unlisted sources get share 0
    * and drop entirely. Sampling is the same md5 hash membership as
    * every split in this engine — deterministic, partition-stable,
    * growth-stable.
    *
    * Plan shape: one tiny per-source aggregate (|sources| rows), a
    * scalar min, and a broadcast join of the resulting fractions back
    * onto the corpus — the 100 TB side is touched by exactly one
    * narrow pass + one broadcast hash probe; nothing ever collects to
    * the driver.
    *
    * Returns the input rows + (share, frac, keep); expected kept mass
    * per source is share_s·T (hash sampling is exact in expectation —
    * per-doc mass variance is what a production run reports via the
    * observed-mass audit, one more tiny agg over this output).
    */
  def mixToTarget(df: DataFrame, keyCol: String, sourceCol: String,
      massCol: String, targets: Map[String, Double],
      salt: String = ""): DataFrame = {
    val share = targets.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) {
        case (acc, (s, w)) => acc.when(col(sourceCol) === s, lit(w))
      }.otherwise(lit(0.0))
    val bySrc = df.groupBy(col(sourceCol))
      .agg(sum(col(massCol)).cast("double").as("m"))
      .withColumn("share", share)
    // a targeted source with ZERO observed mass is excluded from the
    // min — it can supply nothing, and letting it bind would collapse
    // T (and every fraction) to 0; its own frac is 0 (nothing to keep)
    // rather than the 0/0 NaN the raw formula would produce
    val t = bySrc.where(col("share") > 0 && col("m") > 0)
      .agg(min(col("m") / col("share")).as("t"))
    val fracs = bySrc.join(broadcast(t))
      .withColumn("frac",
        when(col("share") > 0 && col("m") > 0,
          least(lit(1.0), col("share") * col("t") / col("m")))
          .otherwise(lit(0.0)))
      .select(col(sourceCol), col("share"), col("frac"))
    df.join(broadcast(fracs), Seq(sourceCol))
      .withColumn("keep",
        hashBucket(col(keyCol), salt) < floor(col("frac") * Buckets))
  }

  /** Temperature-scaled source mixing (the GPT-3 / The Pile / mT5
    * sampling rule): target share of source s is mₛ^T / Σ mₜ^T for
    * observed token masses m and temperature T ∈ (0, 1] — T = 1 keeps
    * natural proportions, T < 1 upweights small sources (mT5 uses
    * T ≈ 0.3–0.7, GPT-3's reweighting is the same shape). Unlike
    * [[mixToTarget]] the shares come from the DATA, not a driver map,
    * so the whole frame — masses, powers, normalizer, binding-source
    * scale, fractions — stays distributed: two tiny per-source aggs +
    * one broadcast of |sources| fractions back onto the corpus, same
    * one-narrow-pass + one-broadcast-probe contract at 100 TB.
    * Selection is the engine-standard deterministic md5 bucket, so an
    * oracle can replay the exact kept set. Returns input rows +
    * (share, frac, keep); the binding (relatively smallest after
    * temperature) source is kept whole — EXACTLY whole: its frac is
    * pinned to the literal 1.0 by comparing each source's scale bound
    * m/share against the min (the min is taken over those very
    * values, so equality is IEEE-exact for the argmin), rather than
    * trusting share·t/m to round-trip through division back to 1.0
    * (it can land at 0.999…, silently dropping ~1e-6 of the binding
    * source's rows through the floor'd bucket gate). */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
      massCol: String, temperature: Double, salt: String = ""): DataFrame = {
    val bySrc = df.groupBy(col(sourceCol))
      .agg(sum(col(massCol)).cast("double").as("m"))
      .withColumn("w", when(col("m") > 0, pow(col("m"), lit(temperature)))
        .otherwise(lit(0.0)))
    val z = bySrc.agg(sum(col("w")).as("z"))
    val shared = bySrc.join(broadcast(z))
      .withColumn("share", when(col("z") > 0, col("w") / col("z"))
        .otherwise(lit(0.0)))
      // per-source scale bound: the corpus-wide scale t is the min of
      // exactly these values (null for degenerate sources; min skips
      // nulls), so `ts === t` identifies the binding source(s) exactly
      .withColumn("ts",
        when(col("share") > 0 && col("m") > 0, col("m") / col("share")))
    val t = shared.agg(min(col("ts")).as("t"))
    val fracs = shared.join(broadcast(t))
      .withColumn("frac",
        when(col("ts") === col("t"), lit(1.0))
          .when(col("ts").isNotNull,
            least(lit(1.0), col("share") * col("t") / col("m")))
          .otherwise(lit(0.0)))
      .select(col(sourceCol), col("share"), col("frac"))
    df.join(broadcast(fracs), Seq(sourceCol))
      .withColumn("keep",
        hashBucket(col(keyCol), salt) < floor(col("frac") * Buckets))
  }

  /** Per-key document quota — cap rows per group (the C4/FineWeb
    * per-domain cap that stops a handful of giant hosts dominating a
    * corpus), keeping the first `quota` rows by `order` within each
    * `key` group, deterministically.
    *
    * Scale shape: the naive single window over every group sorts the
    * ENTIRE corpus inside group partitions — and the whole point of a
    * quota is that some groups are pathologically large, exactly the
    * rows a WindowExec partition cannot skew-split. So it runs two
    * phases: a map-side-combining count finds the (few) over-quota
    * keys, under-quota rows pass through UNTOUCHED (no sort, no
    * window — at a healthy cap that is almost all the data), and only
    * the over-quota slice pays the rank. The broadcast of over-quota
    * keys is bounded by distinct-heavy-key count, orders of magnitude
    * smaller than the corpus (if it were not, the quota would be
    * removing nearly everything).
    *
    * Even within the over-quota slice, a single pathological key (one
    * host with 10⁸ rows) must not land its whole rank on one window
    * task. So the rank runs in two exact phases: rows of over-quota
    * keys are salted into `salts` buckets by a hash of the ORDER value
    * (order-ties stay together, so results are stable), ranked within
    * (key, salt) keeping at most `quota` per bucket — every window
    * partition is ~n/salts rows — then the ≤ salts·quota survivors per
    * key pay the final exact rank (a constant-bounded partition). The
    * pre-trim is lossless: a row among the true first `quota` of its
    * key has < quota rows ahead of it overall, hence < quota ahead in
    * its own salt bucket, so its in-bucket rank ≤ quota. Results are
    * identical to a single full rank whenever `order` is a total order
    * within each key (the same uniqueness row_number already needed
    * for determinism).
    *
    * NULL keys group together (null-safe join mark), so an over-quota
    * NULL-key group is capped like any other. Internal column names
    * are freshened against the input schema — a caller column named
    * `__qk`/`__rn` cannot collide.
    */
  def quotaPerKey(df: DataFrame, key: Column, order: Column,
      quota: Int, salts: Int = 64): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    require(salts > 0, s"salts must be positive, got $salts")
    val taken = df.columns.toSet
    def fresh(base: String): String = {
      var nm = base
      while (taken(nm)) nm += "_"
      nm
    }
    val qk = fresh("__qk")
    val qn = fresh("__qn")
    val mark = fresh("__over")
    val slt = fresh("__salt")
    val rn = fresh("__rn")
    val over = df.groupBy(key.as(qk))
      .agg(count(lit(1)).as(qn))
      .where(col(qn) > quota)
      .select(col(qk), lit(1).as(mark))
    val marked = df.join(broadcast(over), key <=> col(qk), "left")
    val pass = marked.where(col(mark).isNull).drop(qk, mark)
    val w1 = Window.partitionBy(key, col(slt)).orderBy(order)
    val w2 = Window.partitionBy(key).orderBy(order)
    val trimmed = marked.where(col(mark).isNotNull).drop(qk, mark)
      .withColumn(slt, pmod(hash(order), lit(salts)))
      .withColumn(rn, row_number().over(w1))
      .where(col(rn) <= quota)
      .drop(rn)
      .withColumn(rn, row_number().over(w2))
      .where(col(rn) <= quota)
      .drop(rn, slt)
    pass.unionByName(trimmed)
  }
}
