package graft

import graft.operators.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {
  test("q1_top_rated returns a single deterministic top row") {
    val rows = RelationalQueries.q1TopRated(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.schema.fieldNames.toSeq ==
      Seq("custkey", "name", "avg_price", "order_count"))
    assert(r.getAs[Long]("order_count") > 0)
    assert(r.getAs[Double]("avg_price") > 0.0)
    // stable across reruns
    val again = RelationalQueries.q1TopRated(spark, sf).collect().head
    assert(r == again)
  }
}
