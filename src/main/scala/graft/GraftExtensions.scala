package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftvec.{DotProduct, JaroWinkler, NfcNormalize, TokenLcp}

/** SparkSessionExtensions entry point: registers the engine's custom
  * codegen expressions as SQL FUNCTIONS, so a pure-SQL consumer (the
  * `spark.sql(...)` surface q65 exercises, a JDBC notebook, a
  * `spark-sql` shell) reaches them without touching the Scala API —
  * the standard extension-library arrangement
  * (`spark.sql.extensions=graft.GraftExtensions`), or programmatic
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * Registered:
  *  - `graft_dot(array<double>, array<double>)` — the codegen'd
  *    sequential-fold dot product ([[org.apache.spark.sql.graftvec.DotProduct]]);
  *    identical IEEE semantics to `aggregate(zip_with(a,b,(x,y)->x*y),
  *    0D, (s,x)->s+x)` at a fraction of the cost (HOFs don't codegen).
  *  - `graft_token_lcp(string, string)` — number of complete leading
  *    tokens two space-joined strings share (the exact-span family's
  *    LCP primitive).
  *  - `graft_jw(string, string)` — Jaro–Winkler record-linkage
  *    similarity, bit-identical to DuckDB's
  *    `jaro_winkler_similarity` on ASCII (pinned conventions in
  *    [[org.apache.spark.sql.graftvec.StringSim]]).
  *  - `graft_nfc(string)` — NFC normalization + astral strip (the
  *    cross-engine Unicode cleaner).
  *
  * Each function is injected into the session's FunctionRegistry at
  * analysis time; the expressions themselves are unchanged, so plans
  * built from SQL and plans built from the Scala API are literally
  * the same operators.
  *
  * Also injected: the [[graft.plans.RangeJoinRewrite]] optimizer rule
  * — BETWEEN-predicate joins become bucketized equi-joins when
  * `spark.graft.rangeJoin.bucketWidth` is set (off by default, so an
  * extended session plans identically to a stock one until the user
  * opts in).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite())
    // aggregate navigation over a materialized summary (off unless
    // spark.graft.summary.{base,path} are both set)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite())
    // uniqueness-aware DISTINCT elimination (off unless
    // spark.graft.unique.{path,cols} are both set)
    ext.injectOptimizerRule(_ => graft.plans.UniqueKeyDistinctElim())
    // referential-integrity join elimination (off unless all four
    // spark.graft.fk.{factPath,factCol,dimPath,dimCol} are set)
    ext.injectOptimizerRule(_ => graft.plans.FkJoinElim())
    // eager aggregation: partial-agg pushdown below a PK-FK join
    // (off unless spark.graft.eagerAgg.enabled + the fk declaration)
    ext.injectOptimizerRule(_ => graft.plans.EagerAggregation())
    // count(DISTINCT long) -> exact bitmap aggregate (off unless
    // spark.graft.bitmapDistinct.enabled)
    ext.injectOptimizerRule(_ => graft.plans.DistinctToBitmap())
    // whole-operator extension: the AS-OF JOIN logical node plans to
    // its merge-based physical operator (AsOfJoinExec)
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftexec.AsOfJoinStrategy)
    // (className, db = null, name, usage, extended = "") — the 5-arg
    // overload is the one that surfaces usage in DESCRIBE FUNCTION
    def info(name: String, usage: String): ExpressionInfo =
      new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
        usage, "")

    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product over array<double>"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot takes 2 arguments")
        DotProduct(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_token_lcp"),
      info("graft_token_lcp", "whole-token common prefix bytes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_token_lcp takes 2 arguments")
        TokenLcp(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_jw"),
      info("graft_jw", "Jaro-Winkler similarity (DuckDB parity)"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_jw takes 2 arguments")
        JaroWinkler(children.head, children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "NFC normalize + astral strip"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc takes 1 argument")
        NfcNormalize(children.head)
      }))

    // custom AGGREGATE function (TypedImperativeAggregate): the
    // analyzer wraps a bare AggregateFunction from a registry builder
    // into its AggregateExpression, same as the built-in entries
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      info("graft_hll", "HyperLogLog (m=256) distinct estimate over " +
        "a 60-bit hash column"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_hll takes 1 argument")
        org.apache.spark.sql.graftagg.HllAgg(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_bitmap_distinct"),
      info("graft_bitmap_distinct", "EXACT distinct count of a " +
        "non-negative long key via a mergeable dense bitmap " +
        "(set-bit / OR / popcount)"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_bitmap_distinct takes 1 argument")
        org.apache.spark.sql.graftagg.BitmapDistinctAgg(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      info("graft_cms", "Count-min sketch (d=4, w=256) over a " +
        "non-negative long key -> flat row-major counter table " +
        "array<bigint>; probe with least(element_at(...))"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_cms takes 1 argument")
        org.apache.spark.sql.graftagg.CountMinAgg(children.head)
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_mg"),
      info("graft_mg", "Misra-Gries heavy-hitter summary (item, k) " +
        "-> 'item:est' pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_mg takes 2 arguments")
        org.apache.spark.sql.graftagg.MisraGriesAgg(children.head,
          children(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_kll"),
      info("graft_kll", "KLL quantile summary (value, k, phis) -> " +
        "'n=..,err=..,q<phi_ppm>=<value>' pairs"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_kll takes 3 arguments")
        org.apache.spark.sql.graftagg.KllAgg(children.head,
          children(1), children(2))
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      info("graft_topk", "bounded-heap grouped top-k (value, id, k) " +
        "-> rank-ordered 'id@value' pairs; no Window, no corpus Sort"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_topk takes 3 arguments")
        org.apache.spark.sql.graftagg.TopKAgg(children.head,
          children(1), children(2))
      }))

    // custom GENERATOR function (UDTF): lazy character n-grams
    ext.injectFunction((
      FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams", "lazy character n-gram generator"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_char_ngrams takes 2 arguments")
        org.apache.spark.sql.graftgen.CharNgrams(children.head,
          children(1))
      }))
  }
}
