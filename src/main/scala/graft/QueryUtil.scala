package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

object QueryUtil {
  /** Round every double column to `scale` decimals. The DuckDB oracle
    * applies the identical `round(c, scale)`, so engine-vs-oracle hash
    * comparison is insensitive to sub-ulp differences from differing
    * aggregation orders (floating-point sums/medians are the only
    * non-IEEE-reproducible ops in the query set).
    */
  def roundDoubles(df: DataFrame, scale: Int = 6): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), scale).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
}
