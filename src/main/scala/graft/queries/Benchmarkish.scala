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

  /** q81 — TPC-H Q10 shape: returned-item revenue per customer in a
    * date window. Selective order-date + returnflag filters push to
    * the scans; nation broadcasts; top-20 by lost revenue. */
  val q81 = QuerySpec("q81_returned_items",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= "1996-10-01" &&
          col("o_orderdate") < "1997-10-01")
      val l = Tables(s, dir, "lineitem").where(col("l_returnflag") === "R")
      val n = Tables(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)
    },
    Some("""
SELECT c_custkey, c_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""))

  /** q82 — TPC-H Q14 shape: promo revenue share in a month. One
    * conditional aggregate over the part join — the ratio of two sums
    * in a single pass. */
  val q82 = QuerySpec("q82_promo_share",
    (s, dir) => {
      val l = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= "1996-09-01" &&
          col("l_shipdate") < "1996-10-01")
      val p = Tables(s, dir, "part")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))) /
            sum(rev), 4).as("promo_pct"),
          count(lit(1)).as("n_items"))
    },
    Some("""
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
    THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-09-01' AND l_shipdate < DATE '1996-10-01'
"""))

  val all: Seq[QuerySpec] = Seq(q70, q71, q72, q81, q82)
}
