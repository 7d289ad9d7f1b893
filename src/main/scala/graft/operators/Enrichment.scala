package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Plug-in point for the reference's LIVE enrichment path (SURVEY.md §2.2
  * S3): the reference walks each movie's candidate list against a
  * rate-limited HTTP API until the first hit (`etl.py:116-152`,
  * `requests.get` at `etl.py:133`). This sandbox has no egress, so the
  * production-shaped seam is a trait: `fetch` resolves one candidate,
  * `open`/`close` bracket a partition (connection pools, auth, rate
  * limiters live there). A real deployment implements it with an HTTP
  * client; [[EnrichmentClient.offline]] is the default implementation,
  * backed by the same broadcast dictionary the declarative join uses.
  *
  * When the dictionary is available as a table, prefer
  * [[CandidateJoin.resolve]] — a declarative broadcast join Catalyst can
  * optimize. [[Enrichment.resolveLive]] exists for sources that are only
  * reachable per-key (external APIs): `mapPartitions` with one client per
  * partition, candidates tried in priority order, first hit wins — the
  * reference's loop, distributed.
  */
trait EnrichmentClient extends Serializable {

  /** Resolve one candidate key to a payload (column name → value), or
    * None on miss. Called on executors, in candidate-priority order;
    * the first Some wins and later candidates are not fetched.
    */
  def fetch(candidate: String): Option[Map[String, String]]

  /** Called once per partition before any fetch — open connections,
    * start rate limiters.
    */
  def open(): Unit = ()

  /** Called once per partition after the last row is consumed. */
  def close(): Unit = ()
}

object EnrichmentClient {

  /** The offline default: a dimension-sized lookup table collected once
    * and broadcast — each executor resolves candidates against the same
    * dictionary the [[CandidateJoin.resolve]] broadcast join would ship.
    * Payload values are rendered as strings (the live path's wire format);
    * `CandidateJoinSpec` proves the two paths agree hit-for-hit.
    *
    * Guarded: the collect below is driver-side by design (the dictionary
    * is broadcast to every executor), so a fact-scale table here is a
    * silent OOM waiting for a bigger input — same contract as
    * `EtlOps.dictionaryEncode`'s guard. Fails loudly above `maxRows`;
    * `limit(n+1).count()` bounds the check itself, so the probe never
    * scans more than the threshold.
    */
  def offline(lookup: DataFrame, keyCol: String,
      maxRows: Long = 1000000L): EnrichmentClient = {
    // the probe rides limit(), which is Int-typed — a threshold at or
    // above 2^31 cannot be checked, and clamping would let an oversized
    // table pass silently; refuse loudly instead
    require(maxRows > 0 && maxRows < Int.MaxValue,
      s"EnrichmentClient.offline: maxRows must be in (0, 2^31) — got " +
        s"$maxRows; a dictionary that large should not be collected at all")
    val probed = lookup.limit(maxRows.toInt + 1).count()
    require(probed <= maxRows,
      s"EnrichmentClient.offline: lookup exceeds $maxRows rows — " +
        "this is a dimension-only client (the dictionary is collected to " +
        "the driver and broadcast); resolve fact-scale lookups with the " +
        "declarative CandidateJoin.resolve join instead")
    val payloadCols = lookup.columns.filterNot(_ == keyCol)
    val dict: Map[String, Map[String, String]] = lookup.collect().map { r =>
      r.getAs[String](keyCol) ->
        payloadCols.map(c => c -> Option(r.getAs[Any](c)).map(_.toString).orNull).toMap
    }.toMap
    val bc = lookup.sparkSession.sparkContext.broadcast(dict)
    new EnrichmentClient {
      override def fetch(candidate: String): Option[Map[String, String]] =
        bc.value.get(candidate)
    }
  }
}

object Enrichment {

  /** The live-path twin of [[CandidateJoin.resolve]]: walk each probe
    * row's candidates (highest priority first) through `client.fetch`
    * until the first hit. One client per partition, closed when the
    * partition's iterator is exhausted; fetches happen lazily inside the
    * task, so rate limiting composes with Spark's own parallelism (tune
    * partition count to tune aggregate request rate).
    *
    * @return (idCol, matched_priority, payload) — priority/payload null
    *         on miss (J4 left-outer semantics, reference `etl.py:118-121`)
    */
  def resolveLive(probe: DataFrame, idCol: String, candidatesCol: String,
      client: EnrichmentClient): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    probe.select(col(idCol).cast("long"), col(candidatesCol))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        client.open()
        new Iterator[(Long, Option[Int], Option[Map[String, String]])] {
          private var closed = false
          override def hasNext: Boolean = {
            val more = rows.hasNext
            if (!more && !closed) { client.close(); closed = true }
            more
          }
          override def next(): (Long, Option[Int], Option[Map[String, String]]) = {
            val (id, cands) = rows.next()
            var i = 0
            var hit: Option[(Int, Map[String, String])] = None
            while (hit.isEmpty && i < cands.length) {
              hit = client.fetch(cands(i)).map(p => (i, p))
              i += 1
            }
            (id, hit.map(_._1), hit.map(_._2))
          }
        }
      }
      .toDF(idCol, "matched_priority", "payload")
  }
}
