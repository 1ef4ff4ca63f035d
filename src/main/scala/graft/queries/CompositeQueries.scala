package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Composite / analytic coverage: bucketized range join, pivot,
  * percentiles, and a TPC-H-Q3-style multi-join aggregation with top-k —
  * the "whole engine at once" queries.
  */
object CompositeQueries {

  val all: Seq[Q] = Seq(

    // Bucketized range join: lineitem prices into 5k-wide price bands.
    Q(
      "q_range_join",
      (spark, dir) => {
        val bands = spark.range(0, 22).select(
          col("id").as("band_id"),
          (col("id") * 5000.0).as("lo"),
          ((col("id") + 1) * 5000.0).as("hi"))
        RangeJoin.pointInInterval(
          Q.t(spark, dir, "lineitem"), bands,
          "l_extendedprice", "lo", "hi", width = 5000.0)
          .groupBy(col("band_id"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("l_extendedprice")).as("total"))
      },
      Some(
        """SELECT band_id, COUNT(*) AS n,
          |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM (SELECT i AS band_id, i * 5000.0 AS lo, (i + 1) * 5000.0 AS hi
          |      FROM generate_series(0, 21) t(i)) b
          |JOIN lineitem ON l_extendedprice >= lo AND l_extendedprice < hi
          |GROUP BY band_id""".stripMargin
      )
    ),

    // Pivot: per-user revenue by event type (wide output, null when the
    // user never produced the event type — both engines agree).
    Q(
      "q_pivot",
      (spark, dir) =>
        Q.events(spark, dir)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(Q.dsum(col("value"))),
      Some(
        """SELECT user_id,
          |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
          |  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error,
          |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
          |  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
          |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS view
          |FROM events GROUP BY user_id""".stripMargin
      )
    ),

    // Exact percentiles: quartiles of the integer-valued quantity —
    // dyadic fractions interpolate exactly in both engines.
    Q(
      "q_percentile",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.25)").as("p25"),
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.75)").as("p75")),
      Some(
        """SELECT l_returnflag,
          |       quantile_cont(l_quantity, 0.25) AS p25,
          |       quantile_cont(l_quantity, 0.5) AS p50,
          |       quantile_cont(l_quantity, 0.75) AS p75
          |FROM lineitem GROUP BY l_returnflag""".stripMargin
      )
    ),

    // Approximate percentile (the scale path for quantiles) checked
    // in-engine against the exact value, like q_approx_distinct.
    Q(
      "q_approx_quantile",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("approx_percentile(l_quantity, 0.5, 10000)").as("p50_approx"))
          .select(col("l_returnflag"), col("p50"),
            (abs(col("p50_approx") - col("p50")) <= lit(1.0)).as("approx_ok")),
      Some(
        """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
          |       TRUE AS approx_ok
          |FROM lineitem GROUP BY l_returnflag""".stripMargin
      )
    ),

    // TPC-H Q5 shape: 6-table join (fact + 5 dims), same-nation
    // customer/supplier constraint, region filter, revenue per nation.
    Q(
      "q_tpch_q5",
      (spark, dir) => {
        val customer = Q.t(spark, dir, "customer")
        val orders = Q.t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val lineitem = Q.t(spark, dir, "lineitem")
        val supplier = Q.t(spark, dir, "supplier")
        val nation = Q.t(spark, dir, "nation")
        val region = Q.t(spark, dir, "region").filter(col("r_name") === "ASIA")
        lineitem
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(supplier, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(nation, col("s_nationkey") === col("n_nationkey"))
          .join(region, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("decimal(18,4)").cast("double").as("revenue"))
      },
      Some(
        """SELECT n_name,
          |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
          |                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |GROUP BY n_name""".stripMargin
      )
    ),

    // Part dimension coverage: per-brand price stats over a type filter.
    Q(
      "q_part_stats",
      (spark, dir) =>
        Q.t(spark, dir, "part")
          .filter(col("p_size") >= 20)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_parts"),
            Q.dsum(col("p_retailprice")).as("total_price"),
            max(col("p_size")).as("max_size")),
      Some(
        """SELECT p_brand, COUNT(*) AS n_parts,
          |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
          |       MAX(p_size) AS max_size
          |FROM part WHERE p_size >= 20 GROUP BY p_brand""".stripMargin
      )
    ),

    // TPC-H Q3 shape: 3-way join, filtered both sides of a date cutoff,
    // grouped revenue, deterministic top-10.
    Q(
      "q_tpch_q3",
      (spark, dir) => {
        val cust = Q.t(spark, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val orders = Q.t(spark, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        val line = Q.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        line
          .join(orders, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))))
            .cast("decimal(18,4)").cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
          |                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |  AND l_shipdate > TIMESTAMP '1997-01-01'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey ASC
          |LIMIT 10""".stripMargin
      )
    )
  )
}
