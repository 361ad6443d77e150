package graft

import org.apache.spark.sql.functions._

/** Spark 4 VARIANT semantics the q278 oracle can't see: schema
  * inference over the binary encoding, JSON-null vs missing-path
  * distinction, and type-mismatch behavior of try_variant_get. */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  private def v1 = Seq("""{"a": 1, "b": {"c": "x"}, "d": [1.5, 2], "n": null}""")
    .toDF("j").select(parse_json(col("j")).as("v"))

  test("schema_of_variant sees through the binary encoding") {
    val s = v1.select(expr("schema_of_variant(v)")).head().getString(0)
    assert(s.contains("OBJECT") && s.contains("a: BIGINT") &&
      s.contains("c: STRING"), s)
  }

  test("JSON null is a present variant-null; missing path is SQL NULL") {
    val r = v1.select(
      expr("is_variant_null(variant_get(v, '$.n'))"),
      expr("variant_get(v, '$.n', 'bigint')"),
      expr("try_variant_get(v, '$.zzz', 'bigint')"),
      expr("is_variant_null(variant_get(v, '$.a'))")).head()
    assert(r.getBoolean(0))       // $.n exists and is variant-null
    assert(r.isNullAt(1))         // typed read of variant-null → NULL
    assert(r.isNullAt(2))         // missing path → NULL, no error
    assert(!r.getBoolean(3))      // real value is not variant-null
  }

  test("try_variant_get on a type mismatch yields NULL, not an error") {
    val r = v1.select(
      expr("try_variant_get(v, '$.b', 'bigint')"),
      expr("try_variant_get(v, '$.d[0]', 'bigint')"),
      expr("variant_get(v, '$.d[1]', 'bigint')")).head()
    assert(r.isNullAt(0))         // object as bigint → NULL
    // fractional → bigint follows Spark's decimal cast: TRUNCATE
    // toward zero (1.5 → 1), not round and not NULL
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 2L)    // exact integral narrows fine
  }

  test("double shortest-repr round trip through variant is bit-exact") {
    val xs = Seq(173665.47, 1.0 / 3.0, 2.5e-17, 9007199254740993.0, 0.1)
    val df = xs.toDF("x")
      .select(col("x"), expr(
        "variant_get(parse_json(to_json(named_struct('x', x))), " +
          "'$.x', 'double')").as("y"))
    df.collect().foreach(r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString))
  }
}
