package graft

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row at-or-before, per key") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (1L, 5L, "t0"),
      (2L, 7L, "t3")).toDF("k", "ts", "trade")
    val quotes = Seq((1L, 8L, 100.0), (1L, 10L, 110.0), (1L, 20L, 120.0),
      (3L, 1L, 999.0)).toDF("k", "ts", "px")

    val out = AsofJoin.asof(trades, quotes, "k", "ts", Seq("px"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ts"),
        r.getAs[String]("trade"),
        if (r.isNullAt(r.fieldIndex("px"))) -1.0 else r.getAs[Double]("px")))
      .toSeq
    assert(out == Seq(
      (1L, 5L, "t0", -1.0),    // before any quote
      (1L, 10L, "t1", 110.0),  // equal ts counts ("at-or-before")
      (1L, 25L, "t2", 120.0),
      (2L, 7L, "t3", -1.0)))   // key with no quotes at all
  }

  test("duplicate right timestamps reduce deterministically before the join") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 3L, 1L))
      .toDF("k", "ts", "rid")
    val out = AsofJoin.asof(l, r, "k", "ts", Seq("rid")).collect()
    assert(out.length == 1 && out.head.getAs[Long]("rid") == 9L)
  }

  test("q45 output covers every purchase exactly once") {
    val n = AsofJoin.q45AsofJoin(spark, sf).count()
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter("event_type = 'purchase'").count()
    assert(n == purchases)
  }
}
