package graft.ops

import graft.{Cols, OracleSql => O, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, TimestampType}

/** The remaining TPC-H classics expressible over the fixture schema
  * (no partsupp table, no l_receiptdate/l_commitdate/c_phone/o_comment
  * columns — Q2/Q9/Q11/Q16/Q20 are out of reach; Q21/Q22/Q13/Q17 use
  * adapted predicates with the same plan shape). Together with
  * RelationalOps' Q1/Q3/Q4/Q5/Q12/Q14/Q15/Q18/Q19 flavors this covers
  * every benchmark query the schema can express.
  *
  * Determinism rules are the same as RelationalOps: money aggregates
  * accumulate in decimal (Cols.dsum/rsum, order-independent under
  * shuffle), thresholds derived from averages are exact-decimal sums
  * divided once, and every top-k carries a unique tie-break key.
  */
object TpchOps {

  private def ts(s: String) = lit(s).cast(TimestampType)

  /** One SQL text for q22_idle_rich, valid in both Spark SQL and DuckDB
    * (the dialect-neutral subset), parameterized only by table names so
    * the Spark plan and the oracle cannot drift.
    */
  private def q22Sql(customer: String, orders: String): String =
    s"""SELECT c_nationkey, count(*) AS numcust,
       |  ${O.dsum("c_acctbal")} AS totacctbal
       |FROM $customer c
       |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
       |  AND c_acctbal > (
       |    SELECT ${O.davg("c_acctbal")} FROM $customer
       |    WHERE c_acctbal > 0.0
       |      AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
       |  AND NOT EXISTS (SELECT 1 FROM $orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
       |GROUP BY c_nationkey""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── forecasting revenue change (TPC-H Q6) ───────────────────────
    // Pure scan-side filter + one global agg: every predicate reaches
    // the parquet scan (PushedFilters on date/discount/quantity), the
    // sum is map-side-combinable, and nothing shuffles but 32 partial
    // rows. The canonical "the scan IS the query" shape — at 100 TB
    // this is bounded by I/O alone, and min/max row-group stats prune
    // whole files on l_shipdate.
    Q("q6_forecast",
      s"""SELECT count(*) AS n_lines,
         |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |                * CAST(l_discount AS DECIMAL(12,2))) AS STRING) AS DOUBLE)
         |    AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24.0""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24.0)
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
            col("l_discount").cast(DecimalType(12, 2)))
            .cast(DoubleType).as("revenue"))
    },

    // ── bilateral volume shipping (TPC-H Q7) ────────────────────────
    // Revenue flowing between two nations, by supplier-side nation,
    // customer-side nation and ship year. The two 25-row nation dims
    // are pre-filtered to the pair (pushed to their scans) and
    // broadcast, so each big-table join stays a hash join keyed on its
    // own fk; the residual supp<>cust disjunction filters after the
    // joins. lineitem⋈orders is the only shuffle pair that scales.
    Q("q7_volume",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  ${O.rsum("l_extendedprice", "l_discount")} AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |         l_extendedprice, l_discount
         |  FROM lineitem
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
         |    AND n2.n_name IN ('NATION_1', 'NATION_2')
         |    AND n1.n_name <> n2.n_name) shipping
         |GROUP BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.load(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(broadcast(Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(Cols.rsum(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },

    // ── national market share (TPC-H Q8) ────────────────────────────
    // NATION_7's share of ECONOMY-part revenue sold into EUROPE-region
    // customers, per order year. Numerator and denominator are both
    // exact decimal sums surfaced as doubles, so the share division is
    // one deterministic IEEE op. Dims (part-filtered, supplier, both
    // nation roles, region) broadcast; the two fact joins
    // (lineitem⋈orders, ⋈customer) shuffle on their keys.
    Q("q8_market_share",
      s"""SELECT o_year,
         |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_7'
         |        THEN ${O.revenue("l_extendedprice", "l_discount")}
         |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS STRING) AS DOUBLE)
         |    / ${O.rsum("l_extendedprice", "l_discount")} AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |         l_extendedprice, l_discount, n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
         |GROUP BY o_year""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
      val euroNations = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("n1_key"))
      val natRev = sum(when(col("supp_nation") === "NATION_7",
          Cols.revenue(col("l_extendedprice"), col("l_discount")))
        .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType)
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(euroNations), col("c_nationkey") === col("n1_key"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg((natRev / Cols.rsum(col("l_extendedprice"), col("l_discount")))
          .as("mkt_share"))
    },

    // ── returned-item reporting (TPC-H Q10) ─────────────────────────
    // Top 20 customers by revenue lost to returns in one quarter.
    // Scale shape: the revenue aggregation keys on o_custkey BELOW the
    // customer join (shuffle lineitem once, join only the aggregated
    // per-customer rows), nation broadcasts, and the top-20 is a
    // TakeOrdered with (revenue DESC, c_custkey) tie-break — exact and
    // deterministic, never a sort of the full relation.
    Q("q10_returns",
      s"""WITH rev AS (
         |  SELECT o_custkey,
         |         ${O.rsum("l_extendedprice", "l_discount")} AS revenue
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1996-07-01'
         |    AND o_orderdate < TIMESTAMP '1996-10-01'
         |    AND l_returnflag = 'R'
         |  GROUP BY o_custkey)
         |SELECT c_custkey, c_name, revenue, c_acctbal, n_name
         |FROM rev
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val rev = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
        .select("o_orderkey", "o_custkey")
        .join(Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(Cols.rsum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      rev
        .join(Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ── customer order-count distribution (TPC-H Q13) ───────────────
    // How many customers placed 0, 1, 2, … qualifying orders. The left
    // outer join keeps order-less customers (their count is 0 — the
    // bucket an inner join would silently drop); the priority predicate
    // filters the orders side BEFORE the join (pushed to its scan),
    // which is what the ON-clause placement in the classic query means.
    // Two hash aggs, each keyed finer→coarser; nothing broadcasts
    // because both sides scale.
    Q("q13_custdist",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").select("c_custkey")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },

    // ── small-quantity-order revenue (TPC-H Q17) ────────────────────
    // Revenue from lines whose quantity is under 20% of their part's
    // average — the correlated-scalar-average query. The per-part
    // average is computed ONCE as a hash agg over the part-filtered
    // lines (the correlation target never needs lines of other parts)
    // and joined back on partkey: two shuffles of the filtered subset,
    // not a per-row subquery. The 0.2×avg threshold is an exact decimal
    // sum divided once, so the < comparison is bit-identical in both
    // engines.
    Q("q17_small_qty",
      s"""WITH lp AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'),
         |a AS (
         |  SELECT l_partkey AS a_partkey, ${O.davg("l_quantity")} AS avg_qty
         |  FROM lp GROUP BY l_partkey)
         |SELECT count(*) AS n_lines,
         |  ${O.dsum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lp JOIN a ON l_partkey = a_partkey
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
        .select("p_partkey")
      val lp = Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val avg = lp.groupBy(col("l_partkey").as("a_partkey"))
        .agg((Cols.dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"))
      lp.join(avg, col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(count(lit(1)).as("n_lines"),
          (Cols.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // ── suppliers who kept orders waiting (TPC-H Q21, adapted) ──────
    // The fixture has no l_receiptdate/l_commitdate, so "late" is
    // l_shipdate > o_orderdate + 60 days; numwait counts finished
    // multi-supplier orders where a supplier was the ONLY late one.
    // The classic EXISTS/NOT-EXISTS pair over sibling lines becomes
    // two hash aggs on the natural keys — per (order, supplier) late
    // flags, then per-order supplier/late counts — followed by one
    // filter; this aggregates-then-joins shape shuffles lineitem twice
    // and never self-joins it row-to-row.
    Q("q21_waiting",
      """WITH ls AS (
        |  SELECT l_orderkey, l_suppkey,
        |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                  THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |st AS (
        |  SELECT l_orderkey, count(*) AS nsupp, sum(late) AS nlate
        |  FROM ls GROUP BY l_orderkey)
        |SELECT s_name, count(*) AS numwait
        |FROM ls
        |JOIN st USING (l_orderkey)
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE ls.late = 1 AND st.nsupp > 1 AND st.nlate = 1
        |GROUP BY s_name""".stripMargin) { (s, dir) =>
      val ls = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0)).as("late"))
      val st = ls.groupBy(col("l_orderkey").as("st_orderkey"))
        .agg(count(lit(1)).as("nsupp"), sum("late").as("nlate"))
      ls.join(st, col("l_orderkey") === col("st_orderkey"))
        .filter(col("late") === 1 && col("nsupp") > 1 && col("nlate") === 1)
        .join(broadcast(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
    },

    // ── global sales opportunity (TPC-H Q22, adapted) ───────────────
    // The fixture has no c_phone, so the country-code prefix becomes a
    // nation-key set; and because every fixture customer has SOME order,
    // "never ordered" is adapted to "no order since 2000-01-01" (lapsed
    // customers) so the anti-join path is actually exercised. Both the
    // average (a Catalyst ScalarSubquery — executes once, injected into
    // the filter, no join in the plan) and the NOT EXISTS (a left ANTI
    // hash join on custkey, its date predicate pushed to the orders
    // scan) keep their classic plan shapes; the threshold is an exact
    // decimal sum divided once so the > comparison cannot drift between
    // engines.
    Q("q22_idle_rich", {
      q22Sql("customer", "orders")
    }) { (s, dir) =>
      Tables.load(s, dir, "customer").createOrReplaceTempView("graft_customer_q22")
      Tables.load(s, dir, "orders").createOrReplaceTempView("graft_orders_q22")
      s.sql(q22Sql("graft_customer_q22", "graft_orders_q22"))
    },
  )
}
