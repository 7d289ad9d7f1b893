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

  test("q2_top_genres returns 5 nations ordered by avg_price desc") {
    val rows = RelationalQueries.q2TopGenres(spark, sf).collect()
    assert(rows.length == 5)
    val avgs = rows.map(_.getAs[Double]("avg_price"))
    assert(avgs.sameElements(avgs.sortBy(-_)))
    assert(rows.forall(_.getAs[Long]("customer_count") > 0))
  }

  test("q3_group_concat concatenates sorted names for top nation") {
    val r = RelationalQueries.q3GroupConcat(spark, sf).collect().head
    val names = r.getAs[String]("customers").split(", ").toSeq
    assert(names.length == r.getAs[Long]("customer_count"))
    assert(names == names.sorted)
  }

  test("q4_by_year sorts years descending with positive counts") {
    val rows = RelationalQueries.q4ByYear(spark, sf).collect()
    assert(rows.nonEmpty)
    val years = rows.map(_.getAs[Int]("order_year"))
    assert(years.sameElements(years.sorted.reverse))
    assert(rows.forall(_.getAs[Long]("line_count") >= 1L))
  }
}
