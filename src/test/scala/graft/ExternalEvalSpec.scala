package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, EvalSets}
import graft.sources.JsonlTables

/** External benchmark ingestion: registry rows that carry a JSONL path,
  * read through the corrupt-line-routing reader, shingled into the same
  * `eval_shingles` index as the residue sets — plus the routing
  * behavior itself on a crafted corrupt file.
  */
class ExternalEvalSpec extends SparkSpec {

  test("corrupt lines route to rejects; externalDocs refuses a partial benchmark") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-exteval").toFile
    val f = new java.io.File(tmp, "broken.jsonl")
    try {
      java.nio.file.Files.write(f.toPath,
        ("""{"item_id": 0, "text": "alpha beta"}""" + "\n" +
          """{"item_id": 1, "text": "gamma delta""" + "\n" + // unterminated
          """{"item_id": 2, "text": "epsilon zeta"}""" + "\n").getBytes("UTF-8"))
      val (clean, rejects) = JsonlTables.readRouted(
        spark, f.getAbsolutePath, EvalSets.ExternalItemSchema)
      assert(clean.count() == 2)
      assert(rejects.count() == 1)
      assert(rejects.head.getAs[String]("raw_line").contains("gamma delta"))
      // the registry loader refuses a file with rejects — a benchmark
      // with silently-missing items is a broken decontam screen
      val bad = EvalSets.ExternalEvalSet("broken", 1, f.getAbsolutePath)
      val e = intercept[IllegalArgumentException] {
        EvalSets.externalDocs(spark, bad).collect()
      }
      assert(e.getMessage.contains("corrupt"))
    } finally {
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("external shingle rows equal a local replay, in the reserved negative id space") {
    val all = EvalSets.externalShingleRows(spark).collect()
    assert(all.map(_.getAs[String]("set_id")).toSet ==
      EvalSets.ExternalRegistry.map(_.setId).toSet,
      "every registered suite must contribute shingle rows")
    assert(all.forall(_.getAs[Long]("doc_id") < 0),
      "benchmark rows must live in the reserved negative id space")
    for (set <- EvalSets.ExternalRegistry) {
      val got = all.filter(_.getAs[String]("set_id") == set.setId)
      assert(got.forall(_.getAs[Int]("set_version") == set.version))
      // local replay: distinct 8-gram shingles per item, doc_id = -item-1
      val expected = scala.io.Source.fromFile(set.file).getLines().map { line =>
        val item = line.split("\"item_id\": ")(1).split(",")(0)
          .stripSuffix("}").trim.toLong
        val text = line.split("\"text\": \"")(1)
          .split("\", \"embedding\"")(0).stripSuffix("\"}")
        val toks = text.split("\\s+", -1)
        val shs =
          if (toks.length < 8) Set.empty[String]
          else toks.sliding(8).map(_.mkString(" ")).toSet
        (-item - 1) -> shs
      }.toMap
      val gotBy = got.groupBy(_.getAs[Long]("doc_id")).view
        .mapValues(_.map(_.getAs[String]("sh")).toSet).toMap
      // items shorter than the shingle width produce no rows
      assert(gotBy == expected.filter(_._2.nonEmpty), set.setId)
    }
    Checkpoints.releaseAll()
  }

  test("embedding-less items screen lexically only; suite verdicts do not collapse") {
    val y = EvalSets.ExternalRegistry.find(_.setId == "external_y").get
    // the vector side carries ONLY the items that ship an embedding —
    // external_y's leaked items are embedding-less by construction
    val vecs = EvalSets.externalVectors(spark).collect()
      .filter(_.getAs[String]("set_id") == y.setId)
    assert(vecs.length == 1,
      "external_y must ship exactly one embedded item (the paraphrase)")
    // …and its lexical leaks (docs ≡ 11 mod 100 copied verbatim) are
    // still flagged by the 8-gram screen — the lexical-only contract
    val q124 = EvalSets.q124EvalDecontam(spark, sf).collect()
    val yFlagged = q124.filter(_.getAs[String]("set_id") == y.setId)
      .map(_.getAs[Long]("doc_id")).toSet
    val leaked = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(100)) === 11 &&
        !EvalSets.inAnySet(col("doc_id")) &&
        size(split(col("text"), "\\s+")) >= 8)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    assert(leaked.nonEmpty)
    assert(leaked.subsetOf(yFlagged),
      s"embedding-less leaks missed: ${leaked -- yFlagged}")
    // the semantic screen catches the paraphrase stand-in (novel text,
    // corpus-copied vector): the source vector scores cosine 1.0
    val sem = graft.operators.SemanticOps.q142SemDecontam(spark, sf)
      .collect().filter(_.getAs[String]("set_id") == y.setId)
    assert(sem.map(_.getAs[Long]("vec_id")).contains(11L),
      "the copied-embedding source vector must be semantically flagged")
    // and per-suite verdicts stay distinct: x and y flag different docs
    val xFlagged = q124.filter(_.getAs[String]("set_id") == "external_x")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(xFlagged != yFlagged, "suite verdicts collapsed")
    Checkpoints.releaseAll()
  }

  test("q124 and q145 cover the external set: leaked docs flagged on both screens") {
    val q124 = EvalSets.q124EvalDecontam(spark, sf).collect()
    val ext = q124.filter(_.getAs[String]("set_id") ==
      EvalSets.ExternalRegistry.head.setId)
    assert(ext.nonEmpty, "external set must flag the leaked documents")
    // every corpus doc whose text was copied into the benchmark
    // (doc_id ≡ 3 mod 100, ≥ 8 tokens, not itself a residue-set member)
    // must be flagged — it shares all of its shingles
    val leaked = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(100)) === 3 &&
        !EvalSets.inAnySet(col("doc_id")) &&
        size(split(col("text"), "\\s+")) >= 8)
      .select("doc_id").collect().map(_.getAs[Long]("doc_id")).toSet
    val flagged = ext.map(_.getAs[Long]("doc_id")).toSet
    assert(leaked.subsetOf(flagged),
      s"missing leaked docs: ${leaked -- flagged}")
    // the release gate carries the external row, flagged on BOTH
    // screens: the leaked items ship their source docs' embeddings, so
    // the semantic screen sees cosine-1.0 within the source's own cell
    val gate = EvalSets.q145ReleaseGate(spark, sf).collect()
      .map(r => r.getAs[String]("set_id") -> r).toMap
    val row = gate(EvalSets.ExternalRegistry.head.setId)
    assert(row.getAs[Int]("set_version") ==
      EvalSets.ExternalRegistry.head.version)
    assert(row.getAs[Long]("n_lex_flagged") > 0)
    assert(row.getAs[Long]("n_sem_flagged") > 0)
    assert(row.getAs[Long]("n_dropped") >=
      math.max(row.getAs[Long]("n_lex_flagged"),
        row.getAs[Long]("n_sem_flagged")))
    Checkpoints.releaseAll()
  }
}
