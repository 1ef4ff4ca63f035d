package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Standard relational coverage over the TPC-H-ish star schema — the
  * operator classes the reference lacks entirely (SURVEY.md §2 "categories
  * the reference does NOT implement") but that arrive with Spark SQL:
  * aggregation, joins of every flavor, sort/limit, set ops, rollup/cube,
  * analytic window functions, distinct, scalar functions.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // Partial+final hash aggregation with a pushed-down scan filter
    // (TPC-H Q1 shape).
    Q(
      "q1_agg",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1997-09-02 00:00:00").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Q.dsum(col("l_quantity")).as("sum_qty"),
            Q.dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(
              col("l_extendedprice").cast("decimal(18,4)") *
                (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
            ).cast("decimal(18,4)").cast("double").as("sum_disc_price"),
            Q.davg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order")
          ),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
          |  COUNT(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
      )
    ),

    // Broadcast-joined dimension chain: region ⋈ nation ⋈ customer.
    // Both dims are tiny → two BroadcastHashJoins, zero shuffles besides
    // the final aggregation.
    Q(
      "q_join_broadcast",
      (spark, dir) => {
        val region = Q.t(spark, dir, "region")
        val nation = Q.t(spark, dir, "nation")
        val cust = Q.t(spark, dir, "customer")
        cust
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_cust"),
            Q.dsum(col("c_acctbal")).as("sum_bal")
          )
      },
      Some(
        """SELECT r_name, n_name, COUNT(*) AS n_cust,
          |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name""".stripMargin
      )
    ),

    // Fact-to-fact shuffle join on the orderkey; revenue per priority.
    Q(
      "q_join_shuffle",
      (spark, dir) => {
        val li = Q.t(spark, dir, "lineitem")
        val o = Q.t(spark, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(
              col("l_extendedprice").cast("decimal(18,4)") *
                (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
            ).cast("decimal(18,4)").cast("double").as("revenue")
          )
      },
      Some(
        """SELECT o_orderpriority, COUNT(*) AS n_items,
          |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
          |           (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin
      )
    ),

    // The co-located join: both sides land bucketed on the join key
    // (bucketBy + sortBy — the pre-shuffle-once layout for 100 TB fact
    // tables), broadcast forbidden, and the join is REQUIREd to run as
    // a sort-merge with ZERO exchanges in its subtree — joining again
    // tomorrow moves no data. The gate materializes under the pinned
    // conf to scratch; oracle is the plain relational join.
    Q(
      "q_bucketed_join",
      (spark, dir) => {
        val tag = s"g${math.abs(dir.hashCode).toString.take(6)}"
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          // dropManagedTable (not bare DROP TABLE): a warehouse dir left
          // by a PREVIOUS JVM is invisible to this session's in-memory
          // catalog and kills saveAsTable with LOCATION_ALREADY_EXISTS
          Q.dropManagedTable(spark, s"orders_bk_$tag")
          Q.dropManagedTable(spark, s"customer_bk_$tag")
          Q.t(spark, dir, "orders")
            .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .mode("overwrite").saveAsTable(s"orders_bk_$tag")
          Q.t(spark, dir, "customer")
            .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .mode("overwrite").saveAsTable(s"customer_bk_$tag")
          val out = spark.table(s"orders_bk_$tag")
            .join(spark.table(s"customer_bk_$tag"),
              col("o_custkey") === col("c_custkey"))
            .groupBy(col("c_mktsegment"))
            .agg(
              count(lit(1)).as("n_orders"),
              Q.dsum(col("o_totalprice")).as("sum_price"))
          Q.requireColocatedJoin(out)
          val scratch = Q.scratch("bktjoin")
          out.write.mode("overwrite").parquet(scratch)
          spark.read.parquet(scratch)
        } finally {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
          // leave no warehouse state behind: the result is already
          // materialized to scratch, and a leftover dir is exactly the
          // cross-session orphan the pre-clean above defends against
          Q.dropManagedTable(spark, s"orders_bk_$tag")
          Q.dropManagedTable(spark, s"customer_bk_$tag")
        }
      },
      Some(
        """SELECT c_mktsegment, COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin
      )
    ),

    // Semi join: customers with at least one order (EXISTS).
    Q(
      "q_semi_join",
      (spark, dir) => {
        val cust = Q.t(spark, dir, "customer")
        val orders = Q.t(spark, dir, "orders")
        cust
          .join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
      },
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
      )
    ),

    // Anti join: customers with no large order (NOT EXISTS with a
    // pushed-down build-side filter; non-empty at every SF).
    Q(
      "q_anti_join",
      (spark, dir) => {
        val cust = Q.t(spark, dir, "customer")
        val bigOrders = Q.t(spark, dir, "orders")
          .filter(col("o_totalprice") > 300000)
        cust
          .join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some(
        """SELECT c_custkey, c_name FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin
      )
    ),

    // Left outer join preserving order-less customers with a zero count.
    Q(
      "q_outer_join",
      (spark, dir) => {
        val cust = Q.t(spark, dir, "customer")
        val orders = Q.t(spark, dir, "orders")
        cust
          .join(orders, cust("c_custkey") === orders("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
      },
      Some(
        """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
          |GROUP BY c_custkey""".stripMargin
      )
    ),

    // Top-k: global sort + limit with a deterministic tie-break.
    Q(
      "q_topk",
      (spark, dir) =>
        Q.t(spark, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice")),
      Some(
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin
      )
    ),

    // Analytic window: top-3 orders per customer by price (rank ≤ k).
    Q(
      "q_window_rank",
      (spark, dir) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Q.t(spark, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some(
        """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |         ROW_NUMBER() OVER (PARTITION BY o_custkey
          |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          |  FROM orders) t
          |WHERE rn <= 3""".stripMargin
      )
    ),

    // Analytic window: running sum per supplier in shipdate order
    // (exact decimal running total, cast to double).
    Q(
      "q_window_running",
      (spark, dir) => {
        // the fixture generator does NOT keep (l_orderkey, l_linenumber)
        // unique; l_quantity as the last tie-break makes the running
        // values order-invariant even for fully-tied sort keys
        val w = Window
          .partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
            col("l_linenumber").asc, col("l_quantity").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Q.t(spark, dir, "lineitem")
          .withColumn(
            "running_qty",
            sum(col("l_quantity").cast("decimal(18,4)")).over(w).cast("double")
          )
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
      },
      Some(
        """SELECT l_suppkey, l_orderkey, l_linenumber,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
          |    PARTITION BY l_suppkey
          |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
          |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
          |FROM lineitem""".stripMargin
      )
    ),

    // Distinct (grouped deduplication of a projection).
    Q(
      "q_distinct",
      (spark, dir) =>
        Q.t(spark, dir, "customer")
          .select(col("c_mktsegment"), col("c_nationkey"))
          .distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer")
    ),

    // Set operations over aligned projections.
    Q(
      "q_union",
      (spark, dir) =>
        Q.t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .union(Q.t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .groupBy(col("nationkey")).agg(count(lit(1)).as("n")),
      Some(
        """SELECT nationkey, COUNT(*) AS n FROM (
          |  SELECT c_nationkey AS nationkey FROM customer
          |  UNION ALL
          |  SELECT s_nationkey AS nationkey FROM supplier) t
          |GROUP BY nationkey""".stripMargin
      )
    ),
    Q(
      "q_intersect",
      (spark, dir) =>
        Q.t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(Q.t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some(
        """SELECT c_nationkey AS nationkey FROM customer
          |INTERSECT
          |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin
      )
    ),
    Q(
      "q_except",
      (spark, dir) =>
        Q.t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(Q.t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some(
        """SELECT c_nationkey AS nationkey FROM customer
          |EXCEPT
          |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin
      )
    ),

    // Hierarchical aggregates: rollup and cube.
    Q(
      "q_rollup",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(Q.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          |  COUNT(*) AS n
          |FROM lineitem
          |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin
      )
    ),
    Q(
      "q_cube",
      (spark, dir) =>
        Q.t(spark, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("sum_price")),
      Some(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
          |FROM orders
          |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin
      )
    ),

    // Scalar function library over part.
    Q(
      "q_scalar_funcs",
      (spark, dir) =>
        Q.t(spark, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_upper"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            (col("p_size") % 7).as("size_mod"),
            abs(col("p_size") - 25).as("size_dev")
          ),
      Some(
        """SELECT p_partkey,
          |  UPPER(p_brand) AS brand_upper,
          |  CAST(LENGTH(p_name) AS INT) AS name_len,
          |  SUBSTRING(p_type, 1, 5) AS type_prefix,
          |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
          |  p_size % 7 AS size_mod,
          |  ABS(p_size - 25) AS size_dev
          |FROM part""".stripMargin
      )
    ),

    // Date/time function coverage over orders.
    Q(
      "q_date_funcs",
      (spark, dir) =>
        Q.t(spark, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("order_year"),
            month(col("o_orderdate")).as("order_month"),
            dayofmonth(col("o_orderdate")).as("order_day"),
            date_trunc("month", col("o_orderdate")).as("month_start")
          ),
      Some(
        """SELECT o_orderkey,
          |  CAST(YEAR(o_orderdate) AS INT) AS order_year,
          |  CAST(MONTH(o_orderdate) AS INT) AS order_month,
          |  CAST(DAY(o_orderdate) AS INT) AS order_day,
          |  DATE_TRUNC('month', o_orderdate) AS month_start
          |FROM orders""".stripMargin
      )
    ),

    // Correlated scalar-subquery shape: customers whose balance exceeds
    // their nation's average (decorrelates to an aggregate + join).
    Q(
      "q_subquery",
      (spark, dir) => {
        val cust = Q.t(spark, dir, "customer")
        val natAvg = cust
          .groupBy(col("c_nationkey").as("nk"))
          .agg(Q.davg(col("c_acctbal")).as("avg_bal"))
        cust
          .join(broadcast(natAvg), cust("c_nationkey") === natAvg("nk"))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select(col("c_custkey"), col("c_acctbal"))
      },
      Some(
        """SELECT c_custkey, c_acctbal FROM customer c
          |JOIN (SELECT c_nationkey AS nk,
          |             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
          |      FROM customer GROUP BY c_nationkey) a
          |  ON c.c_nationkey = a.nk
          |WHERE c.c_acctbal > a.avg_bal""".stripMargin
      )
    ),

    // Grouped min/max/count/count-distinct (exact).
    Q(
      "q_agg_stats",
      (spark, dir) =>
        Q.t(spark, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("n"),
            countDistinct(col("l_partkey")).as("n_parts")
          ),
      Some(
        """SELECT l_returnflag,
          |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
          |  COUNT(*) AS n, COUNT(DISTINCT l_partkey) AS n_parts
          |FROM lineitem GROUP BY l_returnflag""".stripMargin
      )
    )
  )
}
