package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the
  * driver uses as a differential oracle at sf0.01. Column names/types and
  * row order are mirrored exactly on both sides; float aggregates are
  * rounded identically (QueryUtil.roundDoubles) so the hash compare is
  * insensitive to summation order.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
