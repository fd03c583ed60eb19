package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish tables: aggregate,
  * multi-way join, window, sort/limit, set ops.
  *
  * Money arithmetic uses integer cents (per-row `round(x*100)` then BIGINT
  * sum) — exact, order-independent, engine-portable; never sum raw doubles
  * whose total depends on partial-aggregation order.
  */
object Relational {

  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** TPC-H Q1-style aggregate (pruned to available columns). */
  def q1(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("long")).as("sum_qty"),
      sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
      sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_cents"))

  /** 3-way join + group + sort + limit (TPC-H Q3 shape). */
  def q3(cust: DataFrame, orders: DataFrame, li: DataFrame): DataFrame =
    cust.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
      .limit(10)

  /** Window: each customer's top order by totalprice (deterministic
    * tie-break on orderkey).
    */
  def topOrderPerCustomer(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"))
  }

  /** Set op: nations with suppliers but no customers. */
  def supplierOnlyNations(supplier: DataFrame, customer: DataFrame): DataFrame =
    supplier.select(col("s_nationkey").as("nationkey")).distinct()
      .except(customer.select(col("c_nationkey").as("nationkey")).distinct())

  /** Rollup aggregate (grouping-sets family): per (flag, status), per flag,
    * and grand total in one pass.
    */
  def q1Rollup(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("long")).as("sum_qty"))

  /** Set op: nations with both suppliers and customers. */
  def sharedNations(supplier: DataFrame, customer: DataFrame): DataFrame =
    supplier.select(col("s_nationkey").as("nationkey")).distinct()
      .intersect(customer.select(col("c_nationkey").as("nationkey")).distinct())
}
