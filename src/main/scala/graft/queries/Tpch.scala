package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}
import graft.queries.Relational._

/** The TPC-H-shaped analytical suite (Q1-Q22 minus the ids the driver
  * schema cannot express), split out of [[Relational]]. Shares the
  * exact-DECIMAL sum discipline ([[Relational.dsum]]) and the total-
  * ORDER-BY determinism convention documented on the
  * [[Relational]] header.
  */
object Tpch {

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // A1 + A6 — grouped COUNT + exact SUM (partial/final agg = the
    // reference's child-proof merge tree). TPC-H Q1 shape.
    QueryDef(
      "q1_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true,
    ),

    // P5 + P6 — selective predicate folded ahead of a scalar aggregate
    // (TPC-H Q6 shape; the reference's owner-filter + block-range filter).
    QueryDef(
      "q6_filter",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            col("l_discount").cast(DecimalType(18, 2)))
          .cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      headline = true,
    ),

    // ------------------------------------------------------------------
    // J3 — multi-way equi-join binding fact to two dimensions (the
    // reference's storage⋈account⋈header linking). nation is tiny →
    // broadcast; customer⋈orders shuffles on the fk.
    QueryDef(
      "q3_join_agg",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val n = Tables.nation(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      headline = true,
    ),

    // TPC-H Q4 shape: EXISTS subquery as a semi-join feeding a grouped
    // count.
    QueryDef(
      "q4_order_priority",
      (s, d) => {
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d).filter(col("l_discount") > 0.06)
        o.filter(year(col("o_orderdate")) === 1996)
          .join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE year(o_orderdate) = 1996 AND EXISTS (
             |  SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ),

    // TPC-H Q5 shape: 5-way join through the full dimension chain, two
    // broadcasts (nation, region) and fk shuffles for the rest.
    QueryDef(
      "q5_local_suppliers",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .join(sup, li("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      headline = true,
    ),

    // TPC-H Q7 shape: fact joined through two different dimension
    // paths (customer nation × supplier nation), grouped on the pair.
    QueryDef(
      "q7_nation_volume",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val n1 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        val n2 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(sup, li("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(n1), c("c_nationkey") === n1("c_nk"))
          .join(broadcast(n2), sup("s_nationkey") === n2("s_nk"))
          .filter(col("cust_nation") =!= col("supp_nation"))
          .groupBy("cust_nation", "supp_nation")
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("volume"))
          .orderBy("cust_nation", "supp_nation")
      },
      Some("""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation, count(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |WHERE n1.n_name <> n2.n_name
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),

    // TPC-H Q10 shape: returned-item top customers (filter + 3-way
    // join + grouped revenue + top-k).
    QueryDef(
      "q10_returned_items",
      (s, d) => {
        val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy("c_custkey", "c_name")
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    ),

    // TPC-H Q17 shape: correlated scalar aggregate (per-part average
    // quantity), decorrelated into a grouped join — rows below 0.2×
    // their part's average contribute to the total.
    QueryDef(
      "q17_small_quantity",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val avgq = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"))
        li.join(avgq, li("l_partkey") === avgq("ap_partkey"))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      },
      Some("""WITH avgq AS (
             |  SELECT l_partkey AS ap_partkey,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
             |  FROM lineitem GROUP BY l_partkey)
             |SELECT count(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM lineitem JOIN avgq ON l_partkey = ap_partkey
             |WHERE l_quantity < 0.2 * avg_qty""".stripMargin),
    ),

    // TPC-H Q19 shape: disjunction of conjunctive range predicates —
    // the optimizer must still push the common join key and fold the
    // OR branches into the scan.
    QueryDef(
      "q19_disjunctive",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30)))
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
    ),

    // TPC-H Q12 shape: conditional aggregation (CASE inside SUM).
    QueryDef(
      "q12_shipmode",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    ),

    // TPC-H Q14 shape: ratio of conditional to total aggregate — two
    // decimal sums in one pass, one double division at the end.
    QueryDef(
      "q14_promo_share",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"),
            col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("promo"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("total"))
        .select((col("promo") / col("total")).as("promo_share")),
      Some("""WITH t AS (SELECT
             |  CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
             |FROM lineitem JOIN part ON l_partkey = p_partkey)
             |SELECT promo / total AS promo_share FROM t""".stripMargin),
    ),

    // ------------------------------------------------------------------
    // TPC-H Q8 shape: national market share — 6-table snowflake join,
    // conditional aggregation (share = national volume / total). The
    // dims (nation, region, part-filter) broadcast; the one shuffle is
    // the grouped year aggregation.
    QueryDef(
      "q8_market_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val cu = Tables.customer(s, d)
        val su = Tables.supplier(s, d)
        val p = Tables.part(s, d).filter(col("p_type") === "STANDARD")
        val n1 = Tables.nation(s, d).select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
        val n2 = Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
        val vol = (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cu, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          // exact decimal sums; the ratio is taken in IEEE double on
          // both engines (decimal-division rounding rules differ)
          .agg((sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0).cast(DecimalType(18, 2))))
            .cast("double") / sum(vol).cast("double")).as("mkt_share"))
          .orderBy("o_year")
      },
      Some("""SELECT year(o_orderdate) AS o_year,
             |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
             |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // TPC-H Q9 shape (adapted: the corpus has no partsupp, so profit
    // is revenue-only): per-nation per-year revenue over a part-name
    // subset — the classic "profit" rollup join tree.
    QueryDef(
      "q9_nation_profit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val su = Tables.supplier(s, d)
        val p = Tables.part(s, d).filter(col("p_name").contains("a"))
        val n = Tables.nation(s, d)
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(su, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, year(o_orderdate) AS o_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
    ),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join (zero-order customers must appear), two-level aggregation.
    QueryDef(
      "q13_order_distribution",
      (s, d) => {
        val cu = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        cu.join(o, cu("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
    ),

    // TPC-H Q15 shape: top supplier — revenue CTE consumed twice (per-
    // supplier revenue ⋈ its global max); the max side is a 1-row
    // broadcast, no correlated re-evaluation.
    QueryDef(
      "q15_top_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")) === 2000)
        val rev = li.groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .as("total_revenue_d"))
        val top = rev.agg(max("total_revenue_d").as("max_rev"))
        val su = Tables.supplier(s, d)
        rev.join(broadcast(top), col("total_revenue_d") === col("max_rev"))
          .join(su, col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_revenue_d").cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
             |  SELECT l_suppkey AS supplier_no,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue_d
             |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name, CAST(total_revenue_d AS DOUBLE) AS total_revenue
             |FROM revenue JOIN supplier ON supplier_no = s_suppkey
             |WHERE total_revenue_d = (SELECT MAX(total_revenue_d) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin),
    ),

    // TPC-H Q18 shape: large-volume customers — grouped HAVING on the
    // fact, then semi-joined back through orders/customer. The HAVING
    // side is tiny after aggregation → broadcast.
    QueryDef(
      "q18_large_orders",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val cu = Tables.customer(s, d)
        val big = li.groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"))
          .filter(col("sum_qty") > 150)
        cu.join(o, cu("c_custkey") === o("o_custkey"))
          .join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            col("sum_qty").cast("double").as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |  CAST(o_totalprice AS DOUBLE) AS o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150) big
             |  ON o_orderkey = big.l_orderkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    ),

    // TPC-H Q21 shape (adapted: no commit/receipt dates in the corpus,
    // "late" := shipped >90 days after the order date): suppliers who
    // were the ONLY late supplier on a multi-supplier order — the
    // classic EXISTS + NOT EXISTS double self-correlation, decorrelated
    // to a semi-join plus an anti-join on the same grouped frame.
    QueryDef(
      "q21_waiting_supplier",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        val su = Tables.supplier(s, d)
        val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .withColumn("is_late", col("l_shipdate") > date_add(col("o_orderdate"), 90))
        val l1 = late.filter(col("is_late"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        // another supplier exists on the order (late or not)
        val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        // no OTHER supplier was late
        val otherLate = late.filter(col("is_late"))
          .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
        l1.join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
          .join(otherLate, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
          .join(su, col("sk") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
             |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
             |                    AND o3.o_orderstatus = 'F'
             |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
    ),

    // TPC-H Q22 shape (adapted: no phone column — country buckets come
    // from c_nationkey): positive-balance customers above the average
    // balance with no orders — scalar subquery broadcast + anti-join.
    QueryDef(
      "q22_global_sales",
      (s, d) => {
        val cu = Tables.customer(s, d).filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        val o = Tables.orders(s, d)
        // exact threshold compare: bal > sum/cnt ⇔ bal·cnt > sum —
        // no decimal division, so both engines agree bit-for-bit
        val avgBal = cu.filter(col("c_acctbal") > 0.0)
          .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal_sum"),
            count(lit(1)).as("bal_cnt"))
        cu.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal").cast(DecimalType(18, 2)) * col("bal_cnt") > col("bal_sum"))
          .join(o, cu("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double").as("totacctbal"))
          .orderBy("cntrycode")
      },
      Some("""WITH eligible AS (
             |  SELECT * FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13)),
             |threshold AS (
             |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum, COUNT(*) AS bal_cnt
             |  FROM eligible WHERE c_acctbal > 0.0)
             |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
             |FROM eligible, threshold
             |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
    ),

    // TPC-H Q11 shape: important stock — per-part inventory value for
    // one nation's suppliers vs a fraction of the nation total (HAVING
    // against a scalar subquery → 1-row broadcast, exact decimal
    // compare, no division). The corpus has no partsupp table, so the
    // part-supplier relation is DERIVED deterministically from
    // lineitem (availqty = 10 lines supplied, supplycost = the
    // supplier's min extended price) — both engines compute the same
    // derivation, so the oracle still gates every row. At 100 TB the
    // derivation is one map-side-combined shuffle on (part, supp) and
    // the nation filter reaches it through two broadcast dims.
    QueryDef(
      "q11_important_stock",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ps = li.groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
          .agg((count(lit(1)) * 10).as("ps_availqty"),
            min(col("l_extendedprice").cast(DecimalType(18, 2))).as("ps_supplycost"))
        val su = Tables.supplier(s, d)
        val na = Tables.nation(s, d).filter(col("n_name") === "NATION_7")
        val nps = ps.join(su, col("ps_suppkey") === col("s_suppkey"))
          .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
          .select(col("ps_partkey"), (col("ps_supplycost") * col("ps_availqty")).as("v"))
        val tot = nps.agg(sum(col("v")).as("tot"))
        nps.groupBy("ps_partkey").agg(sum(col("v")).as("value_d"))
          .crossJoin(broadcast(tot))
          .filter(col("value_d") * 1000 > col("tot"))
          .select(col("ps_partkey"), col("value_d").cast("double").as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             |         count(*) * 10 AS ps_availqty,
             |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
             |  FROM lineitem GROUP BY 1, 2),
             |nps AS (
             |  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
             |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7')
             |SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
             |FROM nps GROUP BY ps_partkey
             |HAVING SUM(v) * 1000 > (SELECT SUM(v) FROM nps)
             |ORDER BY value DESC, ps_partkey""".stripMargin),
    ),

    // TPC-H Q16 shape: parts/supplier relationship — COUNT(DISTINCT)
    // under a grouped rollup with an exclusion anti-join (the corpus
    // has no s_comment, so "complaint suppliers" := negative account
    // balance). The distinct-count shuffles once on the group keys
    // with (key, suppkey) partial dedup map-side; the exclusion list
    // is a broadcast anti-join.
    QueryDef(
      "q16_parts_supplier",
      (s, d) => {
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
          .distinct()
        val p = Tables.part(s, d).filter(col("p_brand") =!= "Brand#3" &&
          col("p_type") =!= "MEDIUM" && col("p_size").isin(1, 3, 5, 7, 9))
        val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
        ps.join(p, col("ps_partkey") === col("p_partkey"))
          .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
             |SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
             |FROM ps JOIN part ON p_partkey = ps_partkey
             |WHERE p_brand <> 'Brand#3' AND p_type <> 'MEDIUM' AND p_size IN (1,3,5,7,9)
             |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1,2,3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    ),

    // TPC-H Q20 shape: potential part promotion — suppliers holding
    // excess stock (availqty > 2× a year's shipped quantity) of
    // selected parts in selected nations. The classic correlated
    // IN/scalar subquery decorrelates to a grouped shipped-quantity
    // frame joined back on (part, supp): one shuffle each side, the
    // part-name selection a broadcast semi-join, the qualifying
    // supplier set a broadcast semi-join into the dimension.
    QueryDef(
      "q20_potential_promotion",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ps = li.groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
          .agg((count(lit(1)) * 10).as("ps_availqty"))
        val redParts = Tables.part(s, d).filter(col("p_name").startsWith("red"))
          .select("p_partkey")
        val shipped = li.filter(year(col("l_shipdate")) === 2000)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
        val qualifying = ps
          .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"), "left_semi")
          .join(shipped, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
          .filter(col("ps_availqty") > col("qty") * 2)
          .select(col("ps_suppkey"))
        val na = Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_3", "NATION_5", "NATION_7", "NATION_9"))
        Tables.supplier(s, d)
          .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(qualifying), col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal").cast("double").as("s_acctbal"))
          .orderBy("s_suppkey")
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, count(*) * 10 AS ps_availqty
             |  FROM lineitem GROUP BY 1, 2),
             |shipped AS (
             |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
             |  FROM lineitem WHERE year(l_shipdate) = 2000 GROUP BY 1, 2)
             |SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_3','NATION_5','NATION_7','NATION_9')
             |  AND s_suppkey IN (
             |    SELECT ps_suppkey FROM ps
             |    JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
             |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
             |      AND ps_availqty > 2 * qty)
             |ORDER BY s_suppkey""".stripMargin),
    ),
  )
}
