package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** TPC-H-shaped multi-join analytical queries — the canonical plan-
  * quality benchmarks (selective filters pushed to scans, broadcast
  * dims, single agg shuffle, top-k without global sort).
  */
object Benchmarkish {

  /** q70 — TPC-H Q3 shape: shipping priority. Filters push into all
    * three scans; the two big joins shuffle on their keys; final
    * top-10 is TakeOrderedAndProject. */
  val q70 = QuerySpec("q70_shipping_priority",
    (s, dir) => {
      val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").where(col("o_orderdate") < "1995-03-15")
      val l = Tables(s, dir, "lineitem").where(col("l_shipdate") > "1995-03-15")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("orderdate"), asc("l_orderkey"))
        .limit(10)
    },
    Some("""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10
"""))

  /** q71 — TPC-H Q5 shape: local-supplier revenue per nation. Two
    * broadcast dims + three shuffle joins + one agg. */
  val q71 = QuerySpec("q71_local_supplier_volume",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      val l = Tables(s, dir, "lineitem")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region").where(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    },
    Some("""
SELECT n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""))

  /** q72 — TPC-H Q18 shape: large-volume customers via a semi join on
    * an aggregated subquery. */
  val q72 = QuerySpec("q72_large_orders",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
      val big = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("total_qty"))
        .where(col("total_qty") > 150)
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(big, col("o_orderkey") === big("l_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(20)
    },
    Some("""
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""))

  val all: Seq[QuerySpec] = Seq(q70, q71, q72)
}
