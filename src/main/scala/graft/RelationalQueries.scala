package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage queries (SURVEY.md §2.3): the TPC-H-style constructs
  * from the reference's query corpus, built entirely from Catalyst
  * built-ins — scan/filter/agg, multi-way joins (broadcast for dims),
  * semi/anti joins, window functions, conditional aggregation, date
  * functions, top-k. Aggregates are kept in integer domains so the DuckDB
  * oracle hash-compare is exact (floating sums differ in final ulps across
  * engines; documented choice).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** q1-flavored pricing summary (scan → filter → group → agg → sort). */
  def aggSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("count_order"),
        sum(col("l_quantity")).cast("bigint").as("sum_qty"),
        sum(floor(col("l_extendedprice"))).cast("bigint").as("sum_base_floor"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Join + top-k (broadcast dim, TakeOrderedAndProject). */
  def joinTopK(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), col("c_custkey"))
      .limit(10)
  }

  /** EXISTS → left_semi. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers_with_orders"))

  /** NOT EXISTS → left_anti (+ broadcast nation dim). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_customers_without_orders"))

  /** Window function: first 3 events per user by time. */
  def windowFirstEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_type"))
  }

  /** Conditional aggregation (CASE WHEN inside agg). */
  def caseAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        count(lit(1)).as("n_total"))

  /** Date functions: events per (year, month, hour-of-day bucket). */
  def dateAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"),
        hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))

  /** Scalar subquery: parts priced above the global average, per type. */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val avgPrice = part.agg(avg(col("p_retailprice")).as("avg_price"))
    part.crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .groupBy(col("p_type")).agg(count(lit(1)).as("n_above_avg"))
  }

  /** q13 shape: LEFT OUTER JOIN with a NOT LIKE predicate in the join
    * condition (not WHERE — that would make it inner), then the
    * orders-per-customer distribution (/root/reference/queries/tpc-h/q13.sql).
    */
  def leftOuterDist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          !col("o_orderpriority").like("%URGENT%"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** q16 shape: count(DISTINCT suppkey) per part group with NOT-equal /
    * NOT LIKE dimension filters (/root/reference/queries/tpc-h/q16.sql:5).
    */
  def countDistinctSuppliers(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%"))
      .join(t(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rel_left_outer" -> (leftOuterDist _),
    "q_rel_count_distinct" -> (countDistinctSuppliers _),
    "q_rel_agg_summary" -> (aggSummary _),
    "q_rel_join_topk" -> (joinTopK _),
    "q_rel_semi_join" -> (semiJoin _),
    "q_rel_anti_join" -> (antiJoin _),
    "q_rel_window" -> (windowFirstEvents _),
    "q_rel_case_agg" -> (caseAgg _),
    "q_rel_date_agg" -> (dateAgg _),
    "q_rel_scalar_subquery" -> (scalarSubquery _)
  )

  val oracles: Map[String, String] = Map(
    "q_rel_left_outer" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q_rel_count_distinct" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
        |GROUP BY p_brand, p_size""".stripMargin,
    "q_rel_agg_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(floor(l_extendedprice)) AS BIGINT) AS sum_base_floor,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_join_topk" ->
      """SELECT c_custkey, c_mktsegment, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY n_orders DESC, c_custkey LIMIT 10""".stripMargin,
    "q_rel_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_with_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_rel_anti_join" ->
      """SELECT n_name, count(*) AS n_customers_without_orders FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name""".stripMargin,
    "q_rel_window" ->
      """SELECT user_id, rn, event_type FROM (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,
    "q_rel_case_agg" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  count(*) AS n_total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_rel_date_agg" ->
      """SELECT CAST(extract(year FROM ts) AS INT) AS y, CAST(extract(month FROM ts) AS INT) AS m,
        |  CAST(extract(hour FROM ts) AS INT) AS h, count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_rel_scalar_subquery" ->
      """SELECT p_type, count(*) AS n_above_avg FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |GROUP BY p_type""".stripMargin
  )
}
