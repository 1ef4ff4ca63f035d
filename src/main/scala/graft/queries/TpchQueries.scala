package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The 12 TPC-H query shapes not already covered by
  * [[CompositeQueries]]/[[ExtendedQueries]] (q1/3/5/6/10/14/15/16/18/22),
  * completing the full 22-query suite. Each is adapted to the driver
  * fixture schema (no `partsupp` table; `lineitem` lacks
  * commit/receipt dates and ship modes; `part` lacks containers), the
  * same convention the existing shapes use: the *relational structure*
  * of the query — correlated mins, EXISTS / NOT-EXISTS double
  * correlation, left-join histograms, scalar-subquery thresholds,
  * OR-of-conjuncts pushdown — is preserved; absent columns are replaced
  * by fixture columns with the same role.
  *
  * Scale notes (100 TB): only fixed-cardinality dims (nation=25,
  * region=5) and single-row scalar aggregates are explicitly
  * `broadcast()`; part/supplier/customer grow with SF, so their joins
  * stay shuffle joins that AQE can re-plan. Decimal-sum discipline per
  * [[Q.dsum]] (order-independent, DuckDB-hash-exact).
  */
object TpchQueries {

  private val Dec = DecimalType(18, 4)

  /** extendedprice·(1−discount) in exact decimal (scale-4 lossless). */
  private def rev =
    col("l_extendedprice").cast(Dec) * (lit(1).cast(Dec) - col("l_discount").cast(Dec))

  /** DuckDB mirror of [[rev]]. */
  private val RevSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  /** DuckDB mirror of `sum(rev).cast(Dec).cast("double")` — reduce the
    * scale-8 product sum to DECIMAL(18,4) (exact, < 2^53 scale units)
    * BEFORE the double cast so int128→double rounding can't diverge.
    */
  private def sumRevSql(inner: String = RevSql) =
    s"CAST(CAST(SUM($inner) AS DECIMAL(18,4)) AS DOUBLE)"

  val all: Seq[Q] = Seq(

    // TPC-H Q2 shape (min-cost supplier): the correlated-min subquery.
    // With no partsupp, the part↔supplier relation derives from
    // lineitem (DISTINCT pairs) and min supply cost becomes min
    // supplier balance among that part's EUROPE suppliers; the result
    // re-joins on equality with the min, keeping all tied rows.
    Q(
      "q_tpch_q2",
      (spark, dir) => {
        val pairs = Q.t(spark, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val esup = Q.t(spark, dir, "supplier")
          .join(broadcast(Q.t(spark, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Q.t(spark, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val joined = pairs.join(esup, col("l_suppkey") === col("s_suppkey"))
        val minbal = joined.groupBy(col("l_partkey").as("mb_partkey"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        Q.t(spark, dir, "part")
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .join(joined, col("p_partkey") === col("l_partkey"))
          .join(minbal,
            col("l_partkey") === col("mb_partkey") && col("s_acctbal") === col("min_bal"))
          .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
            col("s_name"), col("n_name"), col("s_acctbal"))
      },
      Some(
        """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
          |esup AS (
          |  SELECT s_suppkey, s_name, s_acctbal, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey
          |  WHERE r_name = 'EUROPE')
          |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, s_acctbal
          |FROM part JOIN ps ON p_partkey = l_partkey JOIN esup ON l_suppkey = s_suppkey
          |WHERE p_type = 'STANDARD' AND p_size <= 10
          |  AND s_acctbal = (SELECT min(s2.s_acctbal)
          |                   FROM ps ps2 JOIN esup s2 ON ps2.l_suppkey = s2.s_suppkey
          |                   WHERE ps2.l_partkey = p_partkey)""".stripMargin
      )
    ),

    // TPC-H Q4 shape (order priority checking): EXISTS-correlated
    // semi join. "Late" = shipped more than 30 days after the order
    // date (fixture has no commit/receipt dates).
    Q(
      "q_tpch_q4",
      (spark, dir) => {
        val orders = Q.t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        val li = Q.t(spark, dir, "lineitem")
        orders
          .join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      Some(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
          |GROUP BY o_orderpriority""".stripMargin
      )
    ),

    // TPC-H Q7 shape (volume shipping): the two-nation-role join — the
    // same dim table joined twice under different roles, symmetric
    // pair predicate, revenue by (supp_nation, cust_nation, year).
    Q(
      "q_tpch_q7",
      (spark, dir) => {
        val n1 = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        Q.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(Q.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Q.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(Q.t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(rev).cast(Dec).cast("double").as("revenue"))
      },
      Some(
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS INT) AS l_year, ${sumRevSql()} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           |GROUP BY 1, 2, 3""".stripMargin
      )
    ),

    // TPC-H Q8 shape (national market share): conditional-share ratio
    // per year — numerator and denominator summed in one pass over the
    // six-table join, divided as doubles at the end (q14 discipline).
    Q(
      "q_tpch_q8",
      (spark, dir) => {
        val suppNation = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        Q.t(spark, dir, "lineitem")
          .join(Q.t(spark, dir, "part").filter(col("p_type") === "ECONOMY"),
            col("l_partkey") === col("p_partkey"))
          .join(Q.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Q.t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Q.t(spark, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Q.t(spark, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .join(Q.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0).cast(Dec)))
              .cast(Dec).cast("double") /
              sum(rev).cast(Dec).cast("double")).as("mkt_share"))
      },
      Some(
        s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           |  ${sumRevSql(s"CASE WHEN n1.n_name = 'NATION_5' THEN $RevSql ELSE CAST(0 AS DECIMAL(18,4)) END")}
           |  / ${sumRevSql()} AS mkt_share
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |JOIN region ON n2.n_regionkey = r_regionkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
           |GROUP BY 1""".stripMargin
      )
    ),

    // TPC-H Q9 shape (product type profit): profit = revenue − cost,
    // with retailprice·quantity·0.1 standing in for
    // ps_supplycost·quantity (no partsupp). Exact decimal throughout;
    // LIKE-filtered part name.
    Q(
      "q_tpch_q9",
      (spark, dir) => {
        val amount = rev -
          col("p_retailprice").cast(Dec) * lit(0.1).cast(Dec) * col("l_quantity").cast(Dec)
        Q.t(spark, dir, "lineitem")
          .join(Q.t(spark, dir, "part").filter(col("p_name").like("%red%")),
            col("l_partkey") === col("p_partkey"))
          .join(Q.t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(Q.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Q.t(spark, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
          .agg(sum(amount).cast(Dec).cast("double").as("sum_profit"))
      },
      Some(
        s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
           |  ${sumRevSql(s"$RevSql - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))")} AS sum_profit
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |WHERE p_name LIKE '%red%'
           |GROUP BY 1, 2""".stripMargin
      )
    ),

    // TPC-H Q11 shape (important stock): grouped value vs a scalar
    // fraction-of-total threshold (the HAVING > SELECT pattern).
    // Value = revenue per part from NATION_3 suppliers (no partsupp
    // availqty·supplycost). The one-row total is broadcast.
    Q(
      "q_tpch_q11",
      (spark, dir) => {
        val base = Q.t(spark, dir, "lineitem")
          .join(Q.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Q.t(spark, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .filter(col("n_name") === "NATION_3")
        val perPart = base.groupBy(col("l_partkey"))
          .agg(sum(rev).cast(Dec).cast("double").as("value"))
        val total = base.agg(sum(rev).cast(Dec).cast("double").as("total"))
        perPart.crossJoin(broadcast(total))
          .filter(col("value") > lit(0.001) * col("total"))
          .select(col("l_partkey"), col("value"))
      },
      Some(
        s"""WITH base AS (
           |  SELECT l_partkey, $RevSql AS r
           |  FROM lineitem
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey
           |  WHERE n_name = 'NATION_3'),
           |v AS (SELECT l_partkey, ${sumRevSql("r")} AS value FROM base GROUP BY 1)
           |SELECT l_partkey, value FROM v
           |WHERE value > 0.001 * (SELECT ${sumRevSql("r")} FROM base)""".stripMargin
      )
    ),

    // TPC-H Q12 shape (shipping mode priority): two conditional counts
    // in one pass; "late" = shipped >30 days after order date, grouped
    // by returnflag (no l_shipmode in the fixture).
    Q(
      "q_tpch_q12",
      (spark, dir) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Q.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(Q.t(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      },
      Some(
        """SELECT l_returnflag,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          |GROUP BY 1""".stripMargin
      )
    ),

    // TPC-H Q13 shape (customer order distribution): left outer join
    // with the filter in the JOIN condition (customers with zero
    // qualifying orders must survive with count 0), then a histogram
    // of the counts — the double-aggregation pattern.
    Q(
      "q_tpch_q13",
      (spark, dir) => {
        val orders = Q.t(spark, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
        Q.t(spark, dir, "customer")
          .join(orders, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some(
        """SELECT c_count, COUNT(*) AS custdist
          |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |      FROM customer LEFT OUTER JOIN orders
          |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          |      GROUP BY c_custkey)
          |GROUP BY c_count""".stripMargin
      )
    ),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // per-part average — lineitems below half their part's mean
    // quantity, for one brand. The per-part averages of a single brand
    // are a tiny relation (broadcast). avg via Q.davg discipline so
    // the half-mean threshold is the same double in both engines.
    Q(
      "q_tpch_q17",
      (spark, dir) => {
        val brandParts = Q.t(spark, dir, "part")
          .filter(col("p_brand") === "Brand#7")
          .select(col("p_partkey"))
        val li = Q.t(spark, dir, "lineitem")
        val avgQ = li.join(brandParts, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey").as("aq_partkey"))
          .agg(Q.davg(col("l_quantity")).as("avg_qty"))
        li.join(broadcast(avgQ),
            col("l_partkey") === col("aq_partkey") &&
              col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg((Q.dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      },
      Some(
        """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#7'),
          |av AS (SELECT l_partkey AS aq_partkey,
          |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
          |       FROM lineitem JOIN bp ON l_partkey = p_partkey
          |       GROUP BY 1)
          |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
          |FROM lineitem JOIN av ON l_partkey = aq_partkey
          |WHERE l_quantity < 0.5 * avg_qty""".stripMargin
      )
    ),

    // TPC-H Q19 shape (discounted revenue): disjunction of three
    // (brand, size-range, quantity-range) conjuncts — the
    // OR-of-conjuncts predicate the optimizer must keep pushable on
    // the join.
    Q(
      "q_tpch_q19",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .join(Q.t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#12" && col("p_size").between(1, 25) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#21" && col("p_size").between(1, 35) &&
                col("l_quantity").between(20, 30)))
          .agg(sum(rev).cast(Dec).cast("double").as("revenue")),
      Some(
        s"""SELECT ${sumRevSql()} AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin
      )
    ),

    // TPC-H Q20 shape (potential part promotion): the nested semi-join
    // chain — suppliers whose 1996 shipped quantity of 'red%' parts
    // exceeds a threshold (stand-in for availqty > half shipped).
    // Quantity sums are integer-valued doubles; summed in decimal.
    Q(
      "q_tpch_q20",
      (spark, dir) => {
        val redParts = Q.t(spark, dir, "part")
          .filter(col("p_name").like("red%"))
          .select(col("p_partkey"))
        val bigShippers = Q.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(redParts, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(Q.dsum(col("l_quantity")).as("ship_qty"))
          .filter(col("ship_qty") > 200.0)
        Q.t(spark, dir, "supplier")
          .join(bigShippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
      },
      Some(
        """SELECT s_suppkey, s_name
          |FROM supplier
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_name LIKE 'red%'
          |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  GROUP BY l_suppkey
          |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 200.0)""".stripMargin
      )
    ),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // EXISTS + NOT-EXISTS double correlation on the same fact table —
    // late lineitems (shipped >60 days after order date, fixture's
    // stand-in for receipt>commit) in multi-supplier finished orders
    // where no OTHER supplier was late. Semi join then anti join, both
    // on orderkey with a supplier inequality.
    Q(
      "q_tpch_q21",
      (spark, dir) => {
        val li = Q.t(spark, dir, "lineitem")
        val late = li
          .join(Q.t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), col("o_orderdate"))
        val l2 = li.select(col("l_orderkey").as("l2_orderkey"), col("l_suppkey").as("l2_suppkey"))
        val l3 = late.select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey"))
        late
          .join(l2,
            col("l_orderkey") === col("l2_orderkey") &&
              col("l_suppkey") =!= col("l2_suppkey"),
            "left_semi")
          .join(l3,
            col("l_orderkey") === col("l3_orderkey") &&
              col("l_suppkey") =!= col("l3_suppkey"),
            "left_anti")
          .join(Q.t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
      },
      Some(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM lineitem l1
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |JOIN supplier ON l1.l_suppkey = s_suppkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |                    AND o3.o_orderstatus = 'F'
          |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s_name""".stripMargin
      )
    )
  )
}
