package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.EtlOps
import graft.sources.{Sinks, SqlScriptRunner}

class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("explodeTokens trims, drops empties and the sentinel") {
    val df = Seq((1, "Adventure| Animation ||(no genres listed)|Comedy"),
      (2, "(no genres listed)")).toDF("movie_id", "genres")
    val out = EtlOps.explodeTokens(df, $"movie_id", $"genres")
      .as[(Int, String)].collect().toSet
    assert(out == Set((1, "Adventure"), (1, "Animation"), (1, "Comedy")))
  }

  test("dictionaryEncode assigns dense sorted ids") {
    val toks = Seq("b", "a", "c", "a", "b").toDF("token")
    val dim = EtlOps.dictionaryEncode(toks).as[(Long, String)].collect().toSeq
    assert(dim == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("junction dedups composite keys through the dictionary") {
    val exploded = Seq((10, "a"), (10, "a"), (10, "b"), (20, "b"))
      .toDF("id", "token")
    val out = EtlOps.junction(exploded, EtlOps.dictionaryEncode(exploded))
      .as[(Int, Long)].collect().toSet
    assert(out == Set((10, 1L), (10, 2L), (20, 2L)))
  }

  test("latestByKey keeps the newest version per key") {
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("k", "ver", "v")
    val out = EtlOps.latestByKey(df, Seq("k"), Seq($"ver".desc))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "new"), (2, "only")))
  }

  test("latestByKeyAgg equals the window form, including on a hot key") {
    // skewed fixture: key 1 holds 10k of 10.2k rows — the shape that
    // pins a row_number window to one reducer; the aggregate form must
    // return identical winners while reducing map-side
    val skewed = spark.range(10000)
      .selectExpr("1 AS k", "id AS ver", "concat('p', id) AS v")
      .unionAll(spark.range(200)
        .selectExpr("CAST(2 + id % 50 AS BIGINT) AS k", "id AS ver",
          "concat('q', id) AS v"))
      .repartition(8)
    val win = EtlOps.latestByKey(skewed, Seq("k"),
        Seq($"ver".desc, $"v".desc))
      .select("k", "ver", "v").as[(Long, Long, String)].collect().toSet
    val agg = EtlOps.latestByKeyAgg(skewed, Seq("k"), Seq("ver", "v"))
      .select("k", "ver", "v").as[(Long, Long, String)].collect().toSet
    assert(agg == win)
    assert(agg.exists { case (k, ver, _) => k == 1L && ver == 9999L })
    // the aggregate plan must partially reduce BEFORE the key shuffle
    // (struct max runs as SortAggregate; the map-side partial_max is what
    // makes it hot-key-immune) and must not contain a window at all
    val plan = EtlOps.latestByKeyAgg(skewed, Seq("k"), Seq("ver", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") && !plan.contains("Window"), plan)
  }

  test("upsertByKey parquet round-trip is last-write-wins and idempotent") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/t"
    val v1 = Seq((1, 1L, "a"), (2, 1L, "b")).toDF("k", "ver", "v")
    val v2 = Seq((2, 2L, "b2"), (3, 1L, "c")).toDF("k", "ver", "v")
    Sinks.upsertByKey(spark, dir, v1, Seq("k"), Seq("ver"))
    Sinks.upsertByKey(spark, dir, v2, Seq("k"), Seq("ver"))
    Sinks.upsertByKey(spark, dir, v2, Seq("k"), Seq("ver")) // idempotent re-run
    val out = spark.read.parquet(dir).select("k", "v")
      .as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (2, "b2"), (3, "c")))
  }

  test("insertIfAbsent appends only new keys") {
    val dir = Files.createTempDirectory("graft_ioa").toString + "/t"
    Sinks.insertIfAbsent(spark, dir, Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    Sinks.insertIfAbsent(spark, dir, Seq((2, "XX"), (3, "c"), (3, "c")).toDF("k", "v"), Seq("k"))
    val out = spark.read.parquet(dir).as[(Int, String)].collect().toSet
    assert(out == Set((1, "a"), (2, "b"), (3, "c")))
  }

  test("appendIfEmpty only loads into an empty target") {
    val dir = Files.createTempDirectory("graft_aie").toString + "/t"
    Sinks.appendIfEmpty(spark, dir, Seq(1, 2, 3).toDF("x"))
    Sinks.appendIfEmpty(spark, dir, Seq(9, 9).toDF("x"))
    assert(spark.read.parquet(dir).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("compact rewrites a fragmented directory into budgeted files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // simulate incremental-append fragmentation: 64 tiny files
    (1 to 2000).map(i => (i.toLong, s"row $i")).toDF("k", "v")
      .repartition(64).write.mode("overwrite").parquet(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files = fs.listStatus(p).count(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    assert(files == 64)
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted
    val (b, a) = Sinks.compact(spark, dir) // default 128 MB target -> 1 file
    assert(b == 64 && a == 1, s"before=$b after=$a")
    assert(files == 1)
    // content unchanged
    val after = spark.read.parquet(dir).as[(Long, String)].collect().sorted
    assert(after.toSeq == before.toSeq)
    // a tiny byte budget splits into multiple files instead
    val (_, many) = Sinks.compact(spark, dir, targetBytes = 8 * 1024)
    assert(many > 1)
    assert(spark.read.parquet(dir).count() == 2000)
  }

  test("SqlScriptRunner splits on ; and renders NULL like the reference") {
    Seq((1, Option("x")), (2, None)).toDF("id", "v")
      .createOrReplaceTempView("script_t")
    val results = SqlScriptRunner.run(spark,
      "SELECT id, v FROM script_t ORDER BY id; SELECT COUNT(*) AS n FROM script_t;")
    assert(results.length == 2)
    val rendered = SqlScriptRunner.render(results.head._2)
    assert(rendered.contains("id | v"))
    assert(rendered.contains("2 | NULL"))
    assert(results(1)._2.collect().head.getLong(0) == 2L)
  }

  test("enforceCheck aborts on a violating row, passes clean data") {
    val clean = Seq(("a", 1.0), ("b", 5.0)).toDF("g", "rating")
    val ok = EtlOps.enforceCheck(clean,
      $"rating" >= 0.0 && $"rating" <= 5.0, "rating in [0,5]")
    assert(ok.count() == 2)
    val dirty = Seq(("a", 1.0), ("b", 5.5)).toDF("g", "rating")
    val ex = intercept[Exception] {
      EtlOps.enforceCheck(dirty,
        $"rating" >= 0.0 && $"rating" <= 5.0, "rating in [0,5]").count()
    }
    assert(ex.getMessage.contains("CHECK violated") ||
      Option(ex.getCause).exists(_.getMessage.contains("CHECK violated")))
  }

  test("dictionaryEncode rejects fact-scale domains loudly") {
    val toks = Seq("a", "b", "c").toDF("token")
    assert(EtlOps.dictionaryEncode(toks, maxDomain = 3).collect().length == 3)
    // collect(), not count(): the guard lives in the token_id column, and
    // a bare count legally prunes unused columns before evaluation
    val ex = intercept[Exception] {
      EtlOps.dictionaryEncode(toks, maxDomain = 2).collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("")
    assert(msg(ex).contains("dimension-only") ||
      Option(ex.getCause).exists(c => msg(c).contains("dimension-only")))
  }

  test("deleteWhere keeps NULL-predicate rows (SQL three-valued DELETE)") {
    val df = Seq((1, Option("F")), (2, Option("O")), (3, None))
      .toDF("k", "status")
    val out = EtlOps.deleteWhere(df, $"status" === "F")
      .select("k").as[Int].collect().toSet
    assert(out == Set(2, 3))
  }

  test("cascadeChildren drops exactly the orphaned child rows") {
    val parent = Seq((1, "keep"), (2, "del"), (3, "keep")).toDF("pk", "st")
    val child = Seq((10, 1), (11, 2), (12, 2), (13, 3), (14, 99))
      .toDF("ck", "fk")
    val surviving = EtlOps.deleteWhere(parent, $"st" === "del")
    val out = EtlOps.cascadeChildren(child, "fk", surviving, "pk")
      .select("ck").as[Int].collect().toSet
    // children of deleted parent 2 cascade away; 14's FK never resolved
    // (no parent 99), so it goes too — the semi-join enforces integrity
    assert(out == Set(10, 13))
  }

  test("checkViolations counts out-of-range rows per group") {
    val df = Seq(("a", 1.0), ("a", -1.0), ("b", 5.5), ("b", 3.0))
      .toDF("g", "rating")
    val out = EtlOps.checkViolations(df, "g", $"rating" >= 0.0 && $"rating" <= 5.0)
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 2L, 1L), ("b", 2L, 1L)))
  }
}
