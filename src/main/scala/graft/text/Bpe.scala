package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding merge LEARNING over a weighted vocabulary — the
 * training half of the tokenizer story (tx10 only consumes a fixed
 * token pattern; this induces the merge table a real tokenizer ships).
 *
 * Scale shape: the corpus is touched exactly once, by the caller's
 * (word, cnt) aggregate — the classic BPE trick that all merge rounds
 * operate on the VOCABULARY (distinct words weighted by frequency),
 * which at 100 TB is ~10^7 rows where the corpus is ~10^11. Each round
 * is then: one narrow (a, b, n) pair aggregate over the vocab (map-side
 * combine; pairs explode from adjacent symbols), a 1-row argmax, and a
 * map-only re-fold of the vocab against the broadcast winner. No round
 * ever shuffles symbol sequences — only (pair, count) rows cross the
 * wire. Intermediate vocabularies persist through a bounded PlanCache
 * so round r+1 re-folds round r's frame instead of replaying the whole
 * chain from the source scan.
 *
 * Determinism: the winner is (max total count, then lexicographically
 * smallest pair) — a total order, so the learned table is unique; the
 * greedy left-to-right application below is the standard BPE merge
 * semantics and is reproduced verbatim by the DuckDB oracle's
 * list_reduce fold (tx44's oracle re-LEARNS the merges independently —
 * selection and application are both checked).
 */
object Bpe {

  // vocab frames for the active learning chain: the base vocabulary
  // plus one per completed round (rounds is a small model constant)
  private val vocabCache = new graft.util.PlanCache(maxEntries = 4)

  /**
   * Greedy left-to-right application of one merge (a, b) to a symbol
   * array, as a single fold: symbols accumulate into a space-joined
   * string, and whenever the accumulator ends with symbol `a` and the
   * incoming symbol is `b`, the pair collapses to `ab`. The space
   * delimiter makes the suffix test symbol-exact (merged symbols never
   * contain spaces), and the fold's "merged symbol can immediately
   * merge again with the NEXT incoming symbol" behavior is exactly
   * BPE's non-overlapping left-to-right scan ("a a a a" under (a,a)
   * becomes "aa aa", not "aa a a").
   */
  private def applyMerge(syms: Column, a: Column, b: Column): Column = {
    val folded = aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      element_at(syms, 1),
      (acc, x) =>
        when(x === b && (acc === a || acc.endsWith(concat(lit(" "), a))),
          concat(acc.substr(lit(1), length(acc) - length(a)), a, b))
          .otherwise(concat(acc, lit(" "), x)))
    split(folded, " ")
  }

  /** The round's winning adjacent pair: max summed count, ties to the
    * lexicographically smallest (a, b) — a total order, so `limit(1)`
    * is deterministic. One narrow (a, b, n) hash aggregate. */
  private def bestPair(vocab: DataFrame): DataFrame =
    vocab
      .select(explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("cnt"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(1)

  /** The training chain: the base symbol vocabulary plus, per round,
    * the winning pair and the merged vocabulary — shared by
    * [[learnMerges]] (which reports the winners) and
    * [[compressionCurve]] (which reports the fold). Every vocab frame
    * persists through the bounded cache so each is built once. */
  private def chain(words: DataFrame, rounds: Int)
      : (Seq[DataFrame], Seq[DataFrame]) = {
    var vocab = vocabCache.persisted(
      words.select(
        // split("") emits a trailing empty token under Spark's -1
        // limit; drop zero-length symbols so the fold sees chars only
        filter(split(col("word"), ""), s => length(s) > 0).as("syms"),
        col("cnt")))
    val vocabs = scala.collection.mutable.ArrayBuffer(vocab)
    val bests = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to rounds) {
      val best = bestPair(vocab)
      bests += best
      vocab = vocabCache.persisted(
        vocab.crossJoin(broadcast(best))
          .select(applyMerge(col("syms"), col("a"), col("b")).as("syms"),
            col("cnt")))
      vocabs += vocab
    }
    (vocabs.toSeq, bests.toSeq)
  }

  /**
   * Learn `rounds` merges from a weighted vocabulary of (word, cnt).
   * Returns the merge table: (round, left_sym, right_sym, merged,
   * pair_n), one row per round — the model artifact, so the output is
   * model-sized by construction. Fully lazy: the winners ride as
   * broadcast 1-row frames, never a driver collect.
   */
  def learnMerges(words: DataFrame, rounds: Int): DataFrame =
    chain(words, rounds)._2.zipWithIndex.map { case (best, i) =>
      best.select(lit(i + 1).as("round"), col("a").as("left_sym"),
        col("b").as("right_sym"), concat(col("a"), col("b")).as("merged"),
        col("n").as("pair_n"))
    }.reduce(_.unionByName(_))

  /**
   * The INFERENCE side of the merge table: apply the learned merges
   * and report the weighted compression curve — total symbols across
   * the corpus and floor-scaled average symbols per word occurrence,
   * one row per round 0..rounds. Integer-exact (Σ cnt·|syms| and a
   * ppm floor division), so the gate is cell-exact; the corpus still
   * pays only the caller's one word-count scan.
   */
  def compressionCurve(words: DataFrame, rounds: Int): DataFrame =
    chain(words, rounds)._1.zipWithIndex.map { case (v, r) =>
      v.agg(sum(col("cnt") * size(col("syms"))).as("total_syms"),
          sum(col("cnt")).as("total_words"))
        .select(lit(r).as("round"), col("total_syms"),
          expr("total_syms * 1000000 div total_words").as("avg_syms_ppm"))
    }.reduce(_.unionByName(_))

  /**
   * The ENCODER — the stage a training-data pipeline runs nightly and
   * the missing link between [[learnMerges]] (the model artifact) and
   * sequence packing (which needs REAL token counts, not whitespace
   * proxies): apply the FIXED learned merge table to every document
   * and emit a token-id array per document.
   *
   * Semantics: per document, the `^[a-z]+$` words (the same eligible-
   * word contract the learner trains on) each start as their char
   * sequence and fold through the merge table IN RANK ORDER — apply
   * merge 1 greedily left-to-right, then merge 2, then merge 3 — which
   * is exactly how the learner re-folds its vocabulary, so encode and
   * training segment identically by construction. Token ids are
   * positional: single chars 'a'..'z' map to 0..25 and the round-r
   * merged symbol to 25+r (multi-char symbols are merge outputs by
   * construction; with ≤`rounds` merges from a char alphabet no two
   * rounds can emit the same merged STRING, and `array_position`'s
   * first-match tie-break is the declared order if a deeper table ever
   * could). Per-word sequences concatenate in document word order.
   *
   * Scale shape: the merge table rides as ONE broadcast row (a
   * rank-sorted struct array — model-sized, a few thousand entries in
   * a real tokenizer, 3 here), so encoding is a MAP-ONLY pass over the
   * corpus: no shuffle, no driver collect, every fold inside one
   * codegen'd projection. The training chain it reads is the same
   * cached [[chain]] the learner uses — corpus scanned once for the
   * word counts, vocab-sized work per round.
   *
   * Returns `docs` plus a `token_ids` array<int> column.
   */
  def encode(docs: DataFrame, textCol: Column, trainWords: DataFrame,
             rounds: Int): DataFrame = {
    val merges = chain(trainWords, rounds)._2.zipWithIndex
      .map { case (b, i) => b.select(lit(i + 1).as("rnd"), col("a"), col("b")) }
      .reduce(_.unionByName(_))
    encodeWithTable(docs, textCol, merges)
  }

  /** [[encode]] against an EXPLICIT (rnd, a, b) merge table — the seam
    * the spec uses to exercise table shapes the learner cannot emit
    * (duplicate merged strings, where the declared first-match
    * tie-break must hold). Production callers go through [[encode]],
    * which derives the table from the training chain. */
  private[text] def encodeWithTable(docs: DataFrame, textCol: Column,
                                    mergeRows: DataFrame): DataFrame = {
    val merges = mergeRows
      // sort_array on struct(rnd, a, b) orders by the leading rnd
      // field: the array IS the rank order, independent of union
      // evaluation order
      .agg(sort_array(collect_list(struct(col("rnd"), col("a"), col("b"))))
        .as("__ms"))
    val words = filter(split(textCol, " "), w => w.rlike("^[a-z]+$"))
    def chars(w: Column): Column = filter(split(w, ""), s => length(s) > 0)
    def encodeWord(w: Column): Column =
      aggregate(col("__ms"), chars(w),
        (syms, m) => applyMerge(syms, m.getField("a"), m.getField("b")))
    // array_position returns 0 (not null) for a symbol absent from the
    // merge table; unguarded, 25 + 0 would silently collide with 'z'.
    // Unreachable by construction (every multi-char symbol IS a merge
    // output), so the guard converts "impossible" into a loud error
    // instead of a corrupted id if that invariant ever breaks.
    def idOf(s: Column): Column =
      when(length(s) === 1, ascii(s) - 97)
        .otherwise(lit(25) + coalesce(
          nullif(array_position(
            transform(col("__ms"),
              m => concat(m.getField("a"), m.getField("b"))), s), lit(0L)),
          raise_error(concat(lit("BPE symbol not in merge table: "), s))
            .cast("long")))
        .cast("int")
    docs.crossJoin(broadcast(merges))
      .withColumn("token_ids",
        flatten(transform(words, w => transform(encodeWord(w), s => idOf(s)))))
      .drop("__ms")
  }
}
