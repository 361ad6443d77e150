package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the custom codegen expressions: a
  * session configured with graft.GraftExtensions reaches graft_dot /
  * graft_token_lcp / graft_nfc from pure SQL, with results identical
  * to the built-in formulations (the same operator classes run
  * underneath the SQL names). */
class GraftExtensionsSpec extends SparkSpec {

  /** A NEW SparkSession (reusing the shared SparkContext) with the
    * extensions applied — getOrCreate only applies extensions at
    * session creation, so the active/default session is cleared
    * first and restored after. */
  private def withExtSession[T](f: SparkSession => T): T = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(sess)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("graft_dot from SQL equals the HOF fold bit for bit") {
    withExtSession { sess =>
      val row = sess.sql("""
        SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 0.5D, 2.0D))
          AS d,
          aggregate(zip_with(array(1.0D, 2.0D, 3.0D),
                             array(4.0D, 0.5D, 2.0D), (x, y) -> x * y),
            0D, (s, x) -> s + x) AS ref
      """).head()
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(0) == 11.0)
    }
  }

  test("graft_token_lcp and graft_nfc from SQL") {
    withExtSession { sess =>
      val r = sess.sql("""
        SELECT graft_token_lcp('alpha beta gamma', 'alpha beta delta') AS l,
               graft_nfc('café') AS n
      """).head()
      assert(r.getInt(0) == 2) // two complete shared tokens
      // decomposed e + COMBINING ACUTE collapses to the composed char
      assert(r.getString(1) == "café")
    }
  }

  test("graft_jw from SQL matches the DuckDB-pinned kernel values") {
    withExtSession { sess =>
      val r = sess.sql("""
        SELECT graft_jw('MARTHA', 'MARHTA') AS a,
               graft_jw('CRATE', 'TRACE') AS b,
               graft_jw('', '') AS c
      """).head()
      assert(r.getDouble(0) == 0.9611111111111111)
      assert(r.getDouble(1) == 0.7333333333333334) // no prefix → no boost
      assert(r.getDouble(2) == 0.0) // DuckDB convention: both-empty → 0
    }
  }

  test("extension functions are session-scoped: registered in the " +
      "extended session's registry, NEVER in the global builtin one") {
    // The shared test session installs GraftExtensions (it mirrors the
    // driver harness since round 15), so "un-extended session errors"
    // can no longer be asserted on it; the scoping contract that
    // matters is that injectFunction touches the SESSION registry, not
    // FunctionRegistry.builtin — a builtin mutation would leak the
    // functions into every session of the JVM, extended or not.
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
    for (fn <- Seq("graft_dot", "graft_jw", "graft_nfc", "graft_token_lcp")) {
      assert(!FunctionRegistry.builtin.functionExists(FunctionIdentifier(fn)),
        s"$fn leaked into the GLOBAL builtin registry")
      assert(spark.sessionState.catalog.functionExists(FunctionIdentifier(fn)) ||
        spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(fn)),
        s"$fn missing from the extended session registry")
    }
  }
}
