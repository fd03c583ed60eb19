package graft.packs

import graft.relational.Relational
import org.apache.spark.sql.functions._

/** Relational coverage (aggregate / join / window / sort-limit / set op)
  * over the TPC-H-ish tables, integer-cent money math (see
  * [[graft.relational.Relational]]).
  */
object RelationalPack extends QueryPack {

  private def cents(e: String): String = s"CAST(round($e * 100, 0) AS BIGINT)"

  def queries = Map(
    "q1_agg" -> ((s, dir) => Relational.q1(tbl("lineitem")(s, dir))),
    "q1_rollup" -> ((s, dir) => Relational.q1Rollup(tbl("lineitem")(s, dir))),
    "q3_join_topk" -> ((s, dir) =>
      Relational.q3(tbl("customer")(s, dir), tbl("orders")(s, dir), tbl("lineitem")(s, dir))),
    "w1_top_order" -> ((s, dir) => Relational.topOrderPerCustomer(tbl("orders")(s, dir))),
    "set_supplier_only_nations" -> ((s, dir) =>
      Relational.supplierOnlyNations(tbl("supplier")(s, dir), tbl("customer")(s, dir))),
    "set_shared_nations" -> ((s, dir) =>
      Relational.sharedNations(tbl("supplier")(s, dir), tbl("customer")(s, dir)))
  )

  def oracleSql = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          CAST(sum(${cents("l_extendedprice")}) AS BIGINT) AS sum_price_cents,
          CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_price_cents
          FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q1_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "q3_join_topk" ->
      s"""SELECT o_orderkey,
          CAST(sum(${cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_cents
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderkey
          ORDER BY revenue_cents DESC, o_orderkey ASC
          LIMIT 10""",

    "w1_top_order" ->
      """SELECT o_custkey, o_orderkey FROM (
           SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn = 1""",

    "set_supplier_only_nations" ->
      """SELECT DISTINCT s_nationkey AS nationkey FROM supplier
         EXCEPT
         SELECT DISTINCT c_nationkey AS nationkey FROM customer""",

    "set_shared_nations" ->
      """SELECT DISTINCT s_nationkey AS nationkey FROM supplier
         INTERSECT
         SELECT DISTINCT c_nationkey AS nationkey FROM customer"""
  )
}
