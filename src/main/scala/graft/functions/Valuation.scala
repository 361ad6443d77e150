package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Valuation thresholds, mirroring the reference's frozen dataclass
  * (`/root/reference/one_one_one_rule/transform_valuation.py:33-39`) with
  * the defaults of `/root/reference/config/.env.example:10-20`.
  */
final case class ValuationThresholds(
    undervalued: Double = 0.90,
    overvalued: Double = 1.10,
    pegMax: Double = 1.0,
    peSectorMaxMult: Double = 1.0,
    marginOfSafetyMin: Double = 0.0)

/** The reference's scalar expression library (SURVEY.md §2.7, E1–E12),
  * re-expressed as native Catalyst `Column` builders. Everything here is
  * whole-stage-codegen friendly: no UDFs, no closures — a `when` ladder
  * compiles to branch-free generated Java and survives constant folding,
  * predicate pushdown and column pruning untouched.
  *
  * Null convention (SURVEY.md §1.3): the reference carries missing
  * numerics as NaN/±inf; this engine normalizes them to SQL `null` at
  * ingestion ([[safeDouble]]) so Spark's null-skipping aggregates match
  * pandas' NaN-skipping ones exactly.
  */
object Valuation {

  /** E1 — safe numeric cast: any → double, null on failure/NaN/±inf.
    * Reference: `_safe_float` (`transform_valuation.py:12-19`) plus the
    * `replace([inf,-inf], nan)` repair (`transform_valuation.py:140`).
    * `try_cast`, not `cast`: Spark 4 runs ANSI mode by default, where a
    * plain cast *throws* on malformed input — one bad row would kill a
    * 100 TB job. try_cast yields null, matching pandas' NaN-on-failure.
    */
  def safeDouble(c: Column): Column = {
    val d = c.try_cast(org.apache.spark.sql.types.DoubleType)
    when(isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity,
      lit(null).cast("double")).otherwise(d)
  }

  /** E10 — ticker normalization: strip → upper → '.'→'-' (literal).
    * Reference: `transform_valuation.py:105-111`, `extract_tickers.py:12-18`.
    */
  def normalizeTicker(c: Column): Column = translate(upper(trim(c)), ".", "-")

  /** E2 — Graham number: sqrt(22.5·eps·bvps) iff eps>0 ∧ bvps>0, else null.
    * Reference: `_compute_graham_value` (`transform_valuation.py:181-187`).
    * Null operands make the `>` predicate null → falls through → null.
    */
  def grahamValue(eps: Column, bvps: Column): Column =
    when(eps > 0 && bvps > 0, sqrt(lit(22.5) * eps * bvps))

  /** E4 (value) — PEG ratio: reported if >0; else trailing_pe/growth%
    * when both >0. Growth-unit heuristic: growth ≤ 1 is a fraction,
    * scaled ×100 (`transform_valuation.py:199`).
    * Reference: `_compute_peg_ratio` (`transform_valuation.py:190-203`).
    */
  def pegValue(reported: Column, trailingPe: Column, growth: Column): Column = {
    val growthPct = when(growth <= 1, growth * 100).otherwise(growth)
    when(reported > 0, reported)
      .when(trailingPe > 0 && growth > 0, trailingPe / growthPct)
  }

  /** E4 (source tag) — same ladder as [[pegValue]], byte-identical
    * conditions (SURVEY.md §7.3 risk 5). */
  def pegSource(reported: Column, trailingPe: Column, growth: Column): Column =
    when(reported > 0, lit("reported"))
      .when(trailingPe > 0 && growth > 0, lit("derived"))
      .otherwise(lit("missing"))

  /** E3 (value) — fair-value selection, 4-way prioritized ladder.
    * Reference: `_select_fair_value` (`transform_valuation.py:152-178`).
    * `peMedianUsed`/`fpeMedianUsed` are the sector medians with overall
    * fallback already applied (J1+J2), matching the reference's probe
    * order (sector → overall).
    */
  def fairValue(graham: Column, targetMeanPrice: Column,
      trailingEps: Column, peMedianUsed: Column,
      forwardEps: Column, fpeMedianUsed: Column): Column =
    when(graham > 0, graham)
      .when(targetMeanPrice > 0, targetMeanPrice)
      .when(trailingEps > 0 && peMedianUsed > 0, trailingEps * peMedianUsed)
      .when(forwardEps > 0 && fpeMedianUsed > 0, forwardEps * fpeMedianUsed)

  /** E3 (source tag) — same ladder as [[fairValue]]. */
  def fairValueSource(graham: Column, targetMeanPrice: Column,
      trailingEps: Column, peMedianUsed: Column,
      forwardEps: Column, fpeMedianUsed: Column): Column =
    when(graham > 0, lit("graham_value"))
      .when(targetMeanPrice > 0, lit("target_mean_price"))
      .when(trailingEps > 0 && peMedianUsed > 0, lit("sector_median_trailing_pe"))
      .when(forwardEps > 0 && fpeMedianUsed > 0, lit("sector_median_forward_pe"))
      .otherwise(lit("missing"))

  /** E5 — margin of safety: (graham − price)/graham iff graham>0.
    * Null price propagates to null (matches np.where + NaN arithmetic,
    * `transform_valuation.py:254-258`).
    */
  def marginOfSafety(graham: Column, price: Column): Column =
    when(graham > 0, (graham - price) / graham)

  /** E6 — tri-state check: !valid → "unknown"; cond → "pass"; else "fail".
    * Reference: `_pass_fail_unknown` (`transform_valuation.py:206-210`).
    * `valid` must be a non-null boolean (build it from `isNotNull`
    * conjunctions); `cond` is only consulted when `valid` is true.
    */
  def passFailUnknown(valid: Column, cond: Column): Column =
    when(!valid, lit("unknown")).when(cond, lit("pass")).otherwise(lit("fail"))

  /** E6 instance — peg_pass (`transform_valuation.py:260-264`). */
  def pegPass(peg: Column, th: ValuationThresholds): Column =
    passFailUnknown(peg.isNotNull && peg > 0, peg < th.pegMax)

  /** E6 instance — pe_vs_sector_pass (`transform_valuation.py:266-273`). */
  def peVsSectorPass(trailingPe: Column, peMedianUsed: Column,
      th: ValuationThresholds): Column =
    passFailUnknown(trailingPe.isNotNull && peMedianUsed.isNotNull,
      trailingPe <= peMedianUsed * th.peSectorMaxMult)

  /** E6 instance — margin_of_safety_pass (`transform_valuation.py:275-279`). */
  def marginOfSafetyPass(mos: Column, th: ValuationThresholds): Column =
    passFailUnknown(mos.isNotNull, mos >= th.marginOfSafetyMin)

  /** E7 — hunter 3-of-3 combiner: any unknown → unknown; all pass → pass;
    * else fail. Reference: `hunter_classify` (`transform_valuation.py:281-293`).
    */
  def valuationHunter(c1: Column, c2: Column, c3: Column): Column =
    when(c1 === "unknown" || c2 === "unknown" || c3 === "unknown", lit("unknown"))
      .when(c1 === "pass" && c2 === "pass" && c3 === "pass", lit("pass"))
      .otherwise(lit("fail"))

  /** E8 — under/over/fair classifier. Reference: `classify`
    * (`transform_valuation.py:295-306`).
    */
  def classifyValuation(price: Column, fair: Column,
      th: ValuationThresholds): Column =
    when(price.isNull || fair.isNull || fair <= 0, lit("unknown"))
      .when(price <= fair * th.undervalued, lit("undervalued"))
      .when(price >= fair * th.overvalued, lit("overvalued"))
      .otherwise(lit("fair"))

  /** E9 — percent difference (price − fair)/fair, unguarded like the
    * reference (`transform_valuation.py:307`); null fair → null (pandas
    * NaN → our null). try_divide: ANSI division by a literal 0 would
    * throw; pandas yields ±inf which our convention normalizes to null.
    */
  def pctDiff(price: Column, fair: Column): Column = try_divide(price - fair, fair)

  /** E12 — downstream Looker calculated fields
    * (`/root/reference/README.md:255-285`): guarded price/fair ratios and
    * the 4-bucket margin-of-safety CASE.
    */
  def discountToFairPct(price: Column, fair: Column): Column =
    when(fair > 0, lit(100) * (fair - price) / fair)

  def premiumToFairPct(price: Column, fair: Column): Column =
    when(fair > 0, lit(100) * (price - fair) / fair)

  def priceToFair(price: Column, fair: Column): Column =
    when(fair > 0, price / fair)

  def priceToGraham(price: Column, graham: Column): Column =
    when(graham > 0, price / graham)

  /** mos_bucket 4-bucket CASE (`README.md:272-279`). */
  def mosBucket(mos: Column): Column =
    when(mos.isNull, lit("unknown"))
      .when(mos >= 0.25, lit(">=25%"))
      .when(mos >= 0.10, lit("10-25%"))
      .when(mos >= 0, lit("0-10%"))
      .otherwise(lit("<0%"))

  /** valuation_hunter_flag (`README.md:281-286`). */
  def hunterFlag(hunter: Column): Column =
    when(hunter === "pass", lit("PASS"))
      .when(hunter === "fail", lit("FAIL"))
      .otherwise(lit("UNKNOWN"))
}
