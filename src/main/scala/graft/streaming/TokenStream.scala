package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming token accounting — the live "tokens ingested per source"
  * meter a training-data pipeline keeps while a corpus lands: each arriving
  * document explodes to whitespace words (narrow), stream-static-joins the
  * trained BPE dictionary (word → n_sym — stateless broadcast join, the
  * EnrichStream contract), and feeds a complete-mode per-source aggregate.
  * `source` is a bounded dimension (sites / domains / datasets), so the
  * complete-mode state is a handful of rows at any ingest volume — this is
  * the token-budget dashboard shape, not a per-doc result.
  *
  * The dictionary is the APPLY side of `operators.Bpe` at its dictionary-
  * encode shape: training ran once, in batch; the stream never executes
  * the merge chain, it only joins the (word, n_sym) map. At 100 TB the
  * map is the corpus's distinct-word table — broadcast when it fits, a
  * key-partitioned stream-static shuffle join when it does not; nothing
  * else in the plan changes.
  */
object TokenStream {

  /** (source, n_ws, n_bpe): per-source whitespace-token and trained-BPE
    * token totals. `wordLens` must be a STATIC (word, n_sym) frame; the
    * integer sums are associative, so complete-mode state equals the batch
    * aggregate regardless of micro-batch boundaries (no distinct
    * aggregates — streaming forbids them, and the meter doesn't need one).
    * Works identically on a stream or a batch frame — the parity contract
    * every `graft.streaming` transform carries.
    *
    * No broadcast hint on the dictionary join (r7 ADVICE): a hint is
    * honored at ANY size, which would pin an over-threshold distinct-word
    * table into executor heap; unhinted, Spark broadcasts while the stats
    * say it fits and degrades to the key-partitioned stream-static shuffle
    * join when they don't — the documented 100 TB shape. */
  def tokenTotals(docs: DataFrame, wordLens: DataFrame): DataFrame =
    docs.selectExpr("source", s"explode(${graft.operators.Dedup.TokExpr}) AS word")
      .join(wordLens, Seq("word"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_ws"), sum("n_sym").as("n_bpe"))
}
