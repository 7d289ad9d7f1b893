package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The tokenization seam for every token-mass operator in the library
  * (token counting, curation yield, sequence packing, mixture weights,
  * length quantiles). The first thing a real pretraining user swaps in is
  * their model's tokenizer; this trait makes that one implementation
  * instead of five operator edits — the same seam pattern as
  * `EnrichmentClient` (offline default, production implementation plugs
  * in).
  *
  * Implementations return a COLUMN EXPRESSION (`Array<String>`), not a
  * per-row closure: tokenization stays inside whole-stage codegen and the
  * operator plans are unchanged by swapping tokenizers. A tokenizer that
  * genuinely needs external state (a merges file, a sentencepiece model)
  * still fits — express the vocab as a literal/broadcast inside the
  * expression, or fall back to a mapPartitions-backed column on the
  * operator's input before the seam.
  */
trait Tokenizer extends Serializable {

  /** Tokens of a text column, as an `Array<String>` expression. */
  def tokens(text: Column): Column

  /** Token count of a text column. Defaults to `size(tokens(text))`;
    * override when counting is cheaper than materializing (the common
    * case for BPE estimators that only need lengths).
    */
  def count(text: Column): Column = size(tokens(text))

  /** Stable identifier keying tokenizer-derived corpus state — the
    * token-count artifact commits under a path containing this id, so
    * one tokenizer's standing counts can never be served to another.
    * The default derives from the concrete class name (stable across
    * sessions for a NAMED implementation) and refuses anonymous
    * classes/lambdas outright: `$$anon$N` names are compiler-ordered,
    * so after a refactor a DIFFERENT tokenizer could inherit the same
    * id and silently resolve the other's committed counts — exactly the
    * cross-tokenizer leak the id exists to prevent. Production
    * tokenizers should override with an explicit VERSIONED id (e.g.
    * "llama3_bpe_v1") — any change to counting semantics must change
    * the id, or stale counts would keep resolving.
    */
  def id: String = {
    val n = getClass.getName
    require(!n.contains("$$anon") && !n.contains("$Lambda"),
      "anonymous Tokenizer implementations must override id with a " +
        "stable identifier (class-name-derived ids are compiler-ordered " +
        "for anonymous classes and can collide across refactors)")
    n.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_").stripSuffix("_")
  }

  /** Whether this tokenizer can return ZERO tokens for some input.
    * Token-mass operators whose pruning math assumes every document
    * costs at least one token (`Curation.tokenBudgetBanded`'s band-0
    * rank cap) consult this to route zero-token rows around the capped
    * path instead of silently dropping them. Defaults to `true` — the
    * safe assumption for an unknown implementation; tokenizers with a
    * provable ≥ 1 floor (whitespace `split` always yields at least one
    * element) override to `false` and keep the lean single-branch plan.
    */
  def zeroTokenCapable: Boolean = true
}

object Tokenizer {

  /** The library default: whitespace runs delimit tokens. This is the
    * variant every DuckDB oracle mirrors (`string_split_regex(text,
    * '\s+')`), so operators run under it stay hash-checkable.
    */
  object Whitespace extends Tokenizer {
    override def tokens(text: Column): Column = split(text, "\\s+")
    override def id: String = "ws"
    // split() yields at least one element for any non-null input
    override def zeroTokenCapable: Boolean = false
  }

  /** BPE-ish pre-tokenizer: letter runs, digit runs, or punctuation runs
    * (ASCII-safe; identical semantics in Java regex and RE2). The
    * pre-merge segmentation step of byte-pair tokenizers — a closer
    * "what will this cost in tokens" estimate than whitespace, since
    * punctuation and numbers tokenize separately.
    */
  object BpePre extends Tokenizer {
    private val Re = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"
    override def tokens(text: Column): Column =
      regexp_extract_all(text, lit(Re), lit(0))
    override def id: String = "bpe_pre"
  }

  /** Real byte-pair encoding against a merges table ([[BpeEncode]], the
    * published GPT-2-style greedy rank-ordered algorithm): [[BpePre]]'s
    * pre-token runs, each decomposed to code points and re-merged by
    * rank until no adjacent pair is in the table. A production user
    * constructs this from their model's merges file
    * (`Bpe(lines.map(l => (a, b)))`); [[BpeFixture]] is the
    * deterministic in-repo vocabulary the specs pin.
    */
  final case class Bpe(merges: Seq[(String, String)]) extends Tokenizer {
    override def tokens(text: Column): Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        BpeEncode(org.apache.spark.sql.GraftSqlBridge.expression(text), merges))
    // id digests the merges table: two Bpe instances count identically
    // iff their merges match, and a changed vocabulary changes the id
    override val id: String = "bpe_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(merges.map(m => m._1 + " " + m._2).mkString("\n")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** The TRAINED whitespace-grain encoder: whitespace tokens, each
    * re-encoded by replaying a q135-trained merge table in rank order
    * as plain string replaces over the space-wrapped symbol form — for
    * the vocabulary the merges were trained on this is EXACTLY the
    * training loop's final state (`TextAnalysis.q153`'s
    * encoding-by-construction argument), so token counts under the
    * just-trained table are bit-reproducible from the training chain
    * cross-engine. [[Bpe]]/`BpeEncode` is the production encoder for a
    * SHIPPED model merges file (letter/digit/punct pre-tokenization — a
    * different segmentation); this one closes the in-engine
    * train → tokenize → budget → pack loop. The whole encode is one
    * codegen'd column expression (a replace fold inside a `transform`
    * lambda), so token-mass operators keep their plans under it.
    */
  final case class TrainedWs(merges: Seq[(String, String)]) extends Tokenizer {
    override def tokens(text: Column): Column =
      flatten(transform(split(text, "\\s+"), w => {
        val wrapped = regexp_replace(w, "(.)", " $1 ")
        val enc = merges.foldLeft(wrapped) { case (c, (a, b)) =>
          org.apache.spark.sql.functions.replace(
            c, lit(s" $a  $b "), lit(s" $a$b "))
        }
        split(trim(enc), "  ")
      }))
    // one symbol array per whitespace token, each non-empty; whitespace
    // split itself yields ≥ 1 element — so ≥ 1 token for any non-null text
    override def zeroTokenCapable: Boolean = false
    // id digests the trained merges (the Bpe discipline): counts under
    // two different training runs can never resolve each other's artifact
    override val id: String = "trained_ws_" + java.security.MessageDigest
      .getInstance("MD5")
      .digest(merges.map(m => m._1 + " " + m._2).mkString("\n")
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** Fixture merges table: high-frequency English digraph/trigraph
    * merges in a fixed priority order — small enough to reason about in
    * specs, real enough that common words ("the", "and", "her") merge
    * to single tokens while rare words stay multi-token.
    */
  val FixtureMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "u", "a" -> "t",
    "e" -> "n", "o" -> "r", "s" -> "t", "a" -> "r", "e" -> "s",
    "h" -> "er", "in" -> "g", "and" -> "s", "1" -> "0", "2" -> "0")

  /** [[Bpe]] over [[FixtureMerges]]. */
  val BpeFixture: Bpe = Bpe(FixtureMerges)
}
