package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.sources.Tables
import graft.text.TextAnalysis

/** Text-analysis and deduplication queries over the `documents` table. */
object TextQueries {

  // ---- tx01: token counting ----
  private def tx01(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val nTok = TextAnalysis.tokenCount(col("text"))
    d.select(
      col("doc_id"), col("lang"), col("n_chars"),
      nTok.as("n_tokens"),
      ((col("n_chars") - (nTok - lit(1))).cast(DoubleType) / nTok).as("avg_token_len"))
  }

  private val tx01Oracle =
    """SELECT doc_id, lang, n_chars,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  CAST(n_chars - (len(str_split(text, ' ')) - 1) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len
      |FROM documents""".stripMargin

  // ---- tx02: quality scoring (stopword/diversity ratios) ----
  private def tx02(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
      TextAnalysis.uniqueRatio(col("text")).as("uniq_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"))

  private val tx02Oracle =
    """SELECT doc_id,
      |  CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(str_split(text, ' ')) AS stop_ratio,
      |  CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')) AS uniq_ratio,
      |  (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')))
      |    * (1.0 - CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(str_split(text, ' '))) AS quality_score
      |FROM documents""".stripMargin

  // ---- tx03: content fingerprint ----
  private def tx03(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))

  private val tx03Oracle =
    """SELECT doc_id, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      |FROM documents""".stripMargin

  // ---- tx04: exact dedup groups ----
  private def tx04(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(spark, dir), "doc_id", "text")

  private val tx04Oracle =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_hash,
      |  COUNT(*) AS n_copies, MIN(doc_id) AS keeper
      |FROM documents GROUP BY 1""".stripMargin

  // ---- tx05: heuristic language-ID. The oracle is generated from the
  //      SAME marker lists as the Spark expression; the (score, lang)
  //      lexicographic-max tie-break becomes a CASE that tests languages
  //      in descending name order. ----
  private def tx05(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      TextAnalysis.langId(col("text")).as("predicted_lang"),
      TextAnalysis.langIdScored(col("text")).getField("score").as("marker_hits"))

  private val tx05Oracle: String = {
    val markers = TextAnalysis.LangMarkers
    val scoreCols = markers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(str_split(text, ' '), t -> t IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val greatest = markers.map { case (lang, _) => s"s_$lang" }.mkString("greatest(", ", ", ")")
    // ties resolve to the lexicographically largest language name —
    // mirroring array_max over struct(score, lang)
    val byNameDesc = markers.map(_._1).sorted(Ordering[String].reverse)
    val winner = byNameDesc.init.map(l => s"WHEN s_$l = m THEN '$l'")
      .mkString("CASE ", " ", s" ELSE '${byNameDesc.last}' END")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM documents)
       |SELECT doc_id, lang, $winner AS predicted_lang, m AS marker_hits
       |FROM (SELECT *, $greatest AS m FROM s) t""".stripMargin
  }

  // ---- tx06: MinHash-LSH near-duplicate pairs — oracle-gated. DuckDB
  //      cannot compute xxhash64 signatures, so the banded (id, band,
  //      band_hash) rows render as VALUES literals derived by
  //      [[ReferenceHashes.minhashBandKeys]] — an INDEPENDENT
  //      tokenize → shingle → MinHash → band-key implementation
  //      sharing no code with the Catalyst expressions under test
  //      (ReferenceHashesSpec pins the equivalence). DuckDB then runs
  //      the ENTIRE downstream plan itself: bucket sizing, the
  //      maxBucket cap, the banded self-join, candidate dedup, and
  //      exact STRING-shingle Jaccard verification (tx13's machinery)
  //      — so a drifted join shape, a cap that silently fires, or a
  //      wrong verification threshold all break the hash. ----
  private def tx06(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairs(Tables.documents(spark, dir), "doc_id", "text",
      minJaccard = 0.7)

  private def tx06OracleGen(spark: SparkSession, dir: String): String = {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .flatMap(r => ReferenceHashes.minhashBandKeys(r.getString(1)).toSeq
        .flatMap(_.map { case (band, key) => s"(${r.getLong(0)}, $band, $key)" }))
      .mkString(", ")
    val banded = OracleSql.valuesOrEmpty(rows,
      "(CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS BIGINT))")
    s"""WITH banded(id, band, band_hash) AS ($banded),
       |sizes AS (
       |  SELECT band, band_hash, COUNT(*) AS bsz
       |  FROM banded GROUP BY band, band_hash),
       |capped AS (
       |  SELECT b.id, b.band, b.band_hash FROM banded b
       |  JOIN sizes s ON s.band = b.band AND s.band_hash = b.band_hash
       |  WHERE s.bsz <= 1000),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM capped a
       |  JOIN capped b ON a.band = b.band AND a.band_hash = b.band_hash
       |    AND a.id < b.id),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
       |  FROM documents),
       |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |  FROM cand c
       |  JOIN f a ON a.doc_id = c.id_a
       |  JOIN f b ON b.doc_id = c.id_b) t
       |WHERE jaccard >= 0.7""".stripMargin
  }

  // ---- tx07: SimHash fingerprints — oracle-gated against an
  //      INDEPENDENT implementation. DuckDB cannot compute xxhash64,
  //      so the oracle embeds fingerprints as VALUES literals; what
  //      makes that a real gate (not the pipeline agreeing with
  //      itself) is that the literals come from
  //      [[ReferenceHashes.simhash64]] — a from-spec XXH64 and a fresh
  //      tokenize/vote loop, driver-side over the raw text, sharing no
  //      code with the native SimHash expression under test. ----
  private def tx07(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      Dedup.simHash64(col("text")).as("simhash"))

  private def tx07OracleGen(spark: SparkSession, dir: String): String = {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => s"(${r.getLong(0)}, ${ReferenceHashes.simhash64(r.getString(1))})")
      .mkString(", ")
    val vals = OracleSql.valuesOrEmpty(rows,
      "(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))")
    s"""SELECT doc_id, simhash
       |FROM ($vals) v(doc_id, simhash)""".stripMargin
  }

  // ---- tx08: n-gram Jaccard between consecutive doc ids — validates
  //      the shingle/Jaccard machinery against an independent
  //      implementation (DuckDB list functions). Exact: int sizes →
  //      one double division, bit-identical on both engines. ----
  private def tx08(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val a = d.select(col("doc_id").as("id_a"),
      Dedup.shingleSet(col("text")).as("sh_a"))
    val b = d.select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"),
      Dedup.shingleSet(col("text")).as("sh_b"))
    a.join(b, Seq("id_a"))
      .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  private val tx08Oracle =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
      |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
      |WHERE len(a.s) > 0 AND len(b.s) > 0""".stripMargin

  // ---- tx10: BPE-style token accounting. Whitespace counts undercount
  //      punctuation-heavy text; the regex pre-tokenizer measures the
  //      budget a subword tokenizer would actually see. ----
  private def tx10(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.bpeTokens(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).as("n_ws_tokens"),
      size(toks).as("n_bpe_tokens"),
      size(filter(toks, t => t.rlike("^[^A-Za-z0-9]"))).as("n_punct_tokens"),
      (length(array_join(toks, "")).cast(DoubleType) /
        nullif(size(toks), lit(0)).cast(DoubleType)).as("avg_bpe_len"))
  }

  private val tx10Oracle = {
    // the pattern embeds verbatim: backslash is not an escape character
    // in a standard SQL single-quoted literal
    val re = s"'${TextAnalysis.BpePattern}'"
    s"""SELECT doc_id,
       |  len(str_split(text, ' ')) AS n_ws_tokens,
       |  len(regexp_extract_all(text, $re)) AS n_bpe_tokens,
       |  len(list_filter(regexp_extract_all(text, $re),
       |      t -> regexp_matches(t, '^[^A-Za-z0-9]'))) AS n_punct_tokens,
       |  CAST(length(array_to_string(regexp_extract_all(text, $re), '')) AS DOUBLE)
       |    / CAST(NULLIF(len(regexp_extract_all(text, $re)), 0) AS DOUBLE) AS avg_bpe_len
       |FROM documents""".stripMargin
  }

  // ---- tx11: bigram repetition ratio (the Gopher/RefinedWeb-style
  //      boilerplate signal: high duplicate-n-gram mass → low quality) ----
  private def tx11(spark: SparkSession, dir: String): DataFrame = {
    val all2 = Dedup.shingles(col("text"), 2)
    val uniq2 = Dedup.shingleSet(col("text"), 2)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(all2).as("n_bigrams"),
      size(uniq2).as("n_distinct_bigrams"),
      (lit(1.0) - size(uniq2).cast(DoubleType) /
        nullif(size(all2), lit(0)).cast(DoubleType)).as("dup_bigram_ratio"))
  }

  private val tx11Oracle =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(str_split(text, ' '))),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1]) AS bigrams
      |  FROM documents)
      |SELECT doc_id, len(bigrams) AS n_bigrams,
      |  len(list_distinct(bigrams)) AS n_distinct_bigrams,
      |  1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
      |    / CAST(NULLIF(len(bigrams), 0) AS DOUBLE) AS dup_bigram_ratio
      |FROM g""".stripMargin

  // ---- tx12: TF-IDF top terms per document (keyword extraction). The
  //      corpus statistics are one extra aggregation + a join on the
  //      term — the document-frequency table is vocabulary-sized
  //      (natural-language vocabularies plateau in the low millions of
  //      terms ≈ tens of MB of (term, count) rows, far under the
  //      broadcast ceiling even at 100 TB of corpus), so the broadcast
  //      is pinned explicitly rather than left to AQE stats; the tf
  //      side — the corpus-sized one — never shuffles for this join.
  //      Scores are rounded before ranking (the same reproducibility
  //      rule as cosine similarity) and ties break on the term. ----
  private def tx12(spark: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n"))
    val scored = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n").cast(DoubleType) / col("df")), 4).as("tfidf"))
    graft.ops.Relational.topKPerGroup(scored, Seq("doc_id"),
      Seq(col("tfidf").desc, col("term")), 3, rankName = "rank")
      .select("doc_id", "term", "tfidf", "rank")
  }

  private val tx12Oracle =
    """WITH t AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |    ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tfidf, rank FROM (
      |  SELECT doc_id, term, tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
      |  FROM scored) z
      |WHERE rank <= 3""".stripMargin

  // ---- tx13: EXACT near-duplicate ground truth — every pair with
  //      3-gram Jaccard ≥ 0.7, all-pairs (the quadratic exactness
  //      anchor for tx06, like sim04 for sim06). With this row under
  //      the oracle gate, tx06's recall becomes a measured number
  //      (TextDedupSpec prints and asserts it) instead of an S-curve
  //      formula. The Spark side runs the inverted-index plan; the
  //      oracle brute-forces all pairs and derives |A∪B| =
  //      |A|+|B|−|A∩B| (sets are distinct), so both engines divide
  //      the same two integers. ----
  private def tx13(spark: SparkSession, dir: String): DataFrame =
    Dedup.allPairsJaccard(Tables.documents(spark, dir), "doc_id", "text",
      minJaccard = 0.7)

  private val tx13Oracle =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
      |  FROM documents),
      |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
      |z AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.l AS la, b.l AS lb,
      |    len(list_intersect(a.s, b.s)) AS li
      |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT id_a, id_b,
      |    CAST(li AS DOUBLE) / CAST(la + lb - li AS DOUBLE) AS jaccard
      |  FROM z) t
      |WHERE jaccard >= 0.7""".stripMargin

  // ---- tx14: the composed corpus-preparation pass a training-data
  //      pipeline actually runs — quality gate → exact dedup → near-dup
  //      prune → best-quality-first token-budget fill — as ONE
  //      oracle-backed query. The near-dup stage uses the
  //      exactness-anchored pair enumeration (tx13's machinery) so the
  //      whole pass stays under the hash gate; at scale the enumeration
  //      swaps to Dedup.nearDupPairs, whose equivalence to the exact
  //      pairs is the measured claim of the recall spec. The budget
  //      fill runs on the narrow survivor METADATA via the distributed
  //      prefix sum (Relational.runningTotal) — no global
  //      single-partition window anywhere. ----
  private def tx14(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"),
        size(TextAnalysis.bpeTokens(col("text"))).as("n_tokens"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .filter(col("quality_score") >= 0.5)
    val kept = scored
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper", "fp")
    val dupIds = Dedup.allPairsJaccard(kept, "doc_id", "text")
      .select(col("id_b").as("doc_id")).distinct()
    val unique = kept.join(dupIds, Seq("doc_id"), "left_anti")
    graft.ops.Relational.runningTotal(
        unique.select(col("doc_id"), col("quality_score"), col("n_tokens")),
        order = Seq(col("quality_score").desc, col("doc_id")),
        value = col("n_tokens"), outName = "cum_tokens")
      .filter(col("cum_tokens") <= 20000)
  }

  private val tx14Oracle = {
    val re = s"'${TextAnalysis.BpePattern}'"
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')))
       |      * (1.0 - CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(str_split(text, ' '))) AS quality_score,
       |    len(regexp_extract_all(text, $re)) AS n_tokens,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM documents),
       |filt AS (SELECT * FROM scored WHERE quality_score >= 0.5),
       |kept AS (
       |  SELECT doc_id, text, quality_score, n_tokens FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM filt) k
       |  WHERE doc_id = keeper),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
       |  FROM kept),
       |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
       |dup AS (
       |  SELECT DISTINCT id_b FROM (
       |    SELECT b.doc_id AS id_b,
       |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |    FROM f a JOIN f b ON a.doc_id < b.doc_id) z
       |  WHERE jaccard >= 0.7),
       |uniq AS (
       |  SELECT doc_id, quality_score, n_tokens FROM kept
       |  WHERE doc_id NOT IN (SELECT id_b FROM dup))
       |SELECT doc_id, quality_score, n_tokens, cum_tokens FROM (
       |  SELECT doc_id, quality_score, n_tokens,
       |    CAST(SUM(n_tokens) OVER (
       |      ORDER BY quality_score DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM uniq) t
       |WHERE cum_tokens <= 20000""".stripMargin
  }

  // ---- tx15: the LSH cap witness — tx06's recall claim made honest.
  //      One row: how many LSH buckets exceeded maxBucket (and how many
  //      banded rows that discarded), alongside the verified pair count.
  //      The oracle pins capped/dropped to ZERO as constants and
  //      recomputes the pair count with tx13's brute-force machinery —
  //      so "recall 1.000" ships with a hash-gated "0 buckets capped"
  //      witness, and a corpus where the cap silently fires (or LSH
  //      misses a pair) breaks the gate instead of hiding. ----
  private def tx15(spark: SparkSession, dir: String): DataFrame = {
    val (pairs, stats) = Dedup.nearDupPairsWithStats(
      Tables.documents(spark, dir), "doc_id", "text", minJaccard = 0.7)
    stats.crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_pairs"))))
      .select("capped_buckets", "dropped_rows", "n_pairs")
  }

  private val tx15Oracle =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
      |  FROM documents),
      |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
      |z AS (
      |  SELECT CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |    / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
      |  FROM f a JOIN f b ON a.doc_id < b.doc_id)
      |SELECT 0 AS capped_buckets, 0 AS dropped_rows,
      |  COUNT(*) AS n_pairs FROM z WHERE jaccard >= 0.7""".stripMargin

  // ---- tx16: SimHash exact Hamming ground truth — tx13's role for the
  //      SimHash path. All pairs at Hamming ≤ 6, brute-forced over the
  //      64-bit fingerprints (the declared all-pairs exactness anchor;
  //      production uses the banded tx09). DuckDB cannot reproduce
  //      xxhash64, so the fingerprints render as data-fitted VALUES
  //      literals (the sim05-centroid recipe) and the oracle
  //      INDEPENDENTLY re-derives the pair set with its own xor +
  //      bit_count arithmetic — verified to match Java's
  //      two's-complement Long.bitCount exactly. Because bit-band LSH
  //      is pigeonhole-EXHAUSTIVE for d < bands (a theorem, not an
  //      S-curve), tx09's banded pair set equals this ground truth and
  //      carries the same oracle — both now hash-gated. ----
  private def tx16(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.simHash64(col("text")).as("sh"))
    val a = base.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.HashExpressions.hamming64(col("sh_a"), col("sh_b"))
          .as("hamming"))
      .filter(col("hamming") <= 6)
  }

  private def simhashHammingOracleGen(spark: SparkSession, dir: String): String = {
    // fingerprint literals from the INDEPENDENT from-spec
    // implementation (not the SimHash expression under test), so the
    // gate cross-checks two implementations end-to-end — then DuckDB
    // re-derives the pair set with its own xor + bit_count arithmetic
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => s"(${r.getLong(0)}, ${ReferenceHashes.simhash64(r.getString(1))})")
      .mkString(", ")
    val vals = OracleSql.valuesOrEmpty(rows,
      "(CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))")
    s"""WITH sh(doc_id, h) AS ($vals)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) <= 6""".stripMargin
  }

  // ---- tx17: benchmark decontamination — the training-data hygiene
  //      pass every LLM pipeline runs before the quality/dedup stages:
  //      drop (here: flag) training documents that share long n-grams
  //      with the evaluation set, so benchmark answers don't leak into
  //      the corpus. The eval set is a deterministic held-out slice
  //      (doc_id % 50 = 0); contamination = any shared 5-gram shingle.
  //      Scale shape: the eval n-gram set is benchmark-sized (thousands
  //      of prompts, not a corpus) → broadcast; the training side is
  //      map-only explode + broadcast semi-join, so the corpus itself
  //      NEVER shuffles — only the matched (doc_id, gram) rows (rare by
  //      construction) reach the count aggregation, and the per-doc hit
  //      table joins back broadcast. ----
  private def tx17(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isEval = pmod(col("doc_id"), lit(50)) === 0
    val evalGrams = docs.filter(isEval)
      .select(explode(Dedup.shingleSet(col("text"), 5)).as("gram")).distinct()
    val train = docs.filter(!isEval)
      .select(col("doc_id"), Dedup.shingleSet(col("text"), 5).as("grams"))
    val hits = train.select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_eval_grams"))
    train.select(col("doc_id"), size(col("grams")).as("n_grams"))
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_eval_grams"), lit(0L)).as("n_eval_grams"),
        (coalesce(col("n_eval_grams"), lit(0L)) > 0).as("contaminated"))
  }

  private val tx17Oracle =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 3),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2] || ' ' || str_split(text, ' ')[i+3] || ' ' || str_split(text, ' ')[i+4])) AS grams,
      |    doc_id % 50 = 0 AS is_eval
      |  FROM documents),
      |eg AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE is_eval),
      |hits AS (
      |  SELECT t.doc_id, COUNT(*) AS n_eval_grams
      |  FROM (SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE NOT is_eval) t
      |  JOIN eg USING (gram) GROUP BY 1)
      |SELECT tr.doc_id, len(tr.grams) AS n_grams,
      |  COALESCE(h.n_eval_grams, 0) AS n_eval_grams,
      |  COALESCE(h.n_eval_grams, 0) > 0 AS contaminated
      |FROM g tr LEFT JOIN hits h USING (doc_id)
      |WHERE NOT tr.is_eval""".stripMargin

  // ---- tx18: per-language token-budget mixture fill — the data-mixing
  //      step that turns "one global budget" (tx14) into a TARGET
  //      MIXTURE: each language independently takes its best-quality
  //      documents until its own token budget fills. Semantically
  //      SUM OVER (PARTITION BY lang ORDER BY quality DESC), but a
  //      plain lang-partitioned window is a straggler at scale (a
  //      handful of languages ⇒ one task per language holding a 100 TB
  //      corpus's biggest slice); [[graft.ops.Relational.
  //      groupedRunningTotal]] range-partitions on (lang, quality,
  //      id) so a single language spans many tasks, and only the
  //      per-(partition, language) subtotals converge. ----
  private def tx18(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"),
      size(TextAnalysis.bpeTokens(col("text"))).as("n_tokens"))
    graft.ops.Relational.groupedRunningTotal(scored, Seq("lang"),
        Seq(col("quality_score").desc, col("doc_id")), col("n_tokens"),
        "cum_tokens")
      .filter(col("cum_tokens") <= 4000)
      .select("doc_id", "lang", "quality_score", "n_tokens", "cum_tokens")
  }

  private val tx18Oracle = {
    val re = s"'${TextAnalysis.BpePattern}'"
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')))
       |      * (1.0 - CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(str_split(text, ' '))) AS quality_score,
       |    len(regexp_extract_all(text, $re)) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, lang, quality_score, n_tokens, cum_tokens FROM (
       |  SELECT doc_id, lang, quality_score, n_tokens,
       |    CAST(SUM(n_tokens) OVER (
       |      PARTITION BY lang ORDER BY quality_score DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM s) t
       |WHERE cum_tokens <= 4000""".stripMargin
  }

  // ---- tx19: deterministic train/valid/test split assignment — stable
  //      holdout sets need a split that is a pure function of the
  //      document identity, NOT of row position or sampling state (a
  //      re-run, a repartition, or new data must never move an old doc
  //      across splits). Bucket = first 16 bits of md5("split:" ||
  //      doc_id) mod 100 → 98/1/1. Pure map-side codegen'd projection:
  //      no shuffle, no state, identical on any cluster size. md5 keeps
  //      the oracle independent (DuckDB computes its own). ----
  private def tx19(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(lit("split:"),
          col("doc_id").cast(StringType))), 1, 4), 16, 10).cast(IntegerType),
          lit(100)))
      .withColumn("split",
        when(col("bucket") < 98, lit("train"))
          .when(col("bucket") === 98, lit("valid"))
          .otherwise(lit("test")))
      .select("doc_id", "bucket", "split")

  private val tx19Oracle =
    """WITH b AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 98 THEN 'train' WHEN bucket = 98 THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM b""".stripMargin

  // ---- tx20: duplicate-cluster canonicalization — pairs are not
  //      enough: A~B and B~C must collapse to ONE keeper even when A~C
  //      never surfaced as a pair, so the near-dup pair graph needs its
  //      transitive closure. [[Dedup.connectedComponents]] runs
  //      Pregel-shaped min-label propagation (one distributed
  //      join+agg per round, rounds ≤ component diameter — a few for
  //      dup clusters; only a 1-row changed-count converges to the
  //      driver). The pair source is the exactness-anchored tx13 set,
  //      so the oracle can re-derive it and then compute reachability
  //      with its own recursive CTE — two independent transitive
  //      closures agreeing cell-exact. ----
  private def tx20(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
        Dedup.allPairsJaccard(Tables.documents(spark, dir), "doc_id", "text",
          minJaccard = 0.7),
        "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")

  /** The exact near-dup transitive closure as DuckDB CTEs — tx20's
    * oracle core, shared with tx50's cluster-keyed split (both must
    * close the IDENTICAL pair graph). */
  private val dupClosureCtes =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
      |  FROM documents),
      |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
      |pairs AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |        / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
      |    FROM f a JOIN f b ON a.doc_id < b.doc_id) t
      |  WHERE jaccard >= 0.7),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach(id, r) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst)""".stripMargin

  private val tx20Oracle =
    s"""WITH RECURSIVE $dupClosureCtes
       |SELECT id AS doc_id, MIN(r) AS cluster,
       |  MIN(r) = id AS is_canonical
       |FROM reach GROUP BY id""".stripMargin

  // ---- tx21: deterministic per-language sample — eval-set and
  //      human-review draws need a sample that is uniform-ish yet
  //      REPRODUCIBLE and stable under corpus growth: rank documents
  //      per language by md5("sample:" || doc_id) (an identity-keyed
  //      pseudo-random order, same trick as tx19's split) and keep the
  //      first k. Languages are FEW and huge, so the ranking runs
  //      through [[graft.ops.Relational.topKPerGroupScalable]]: local
  //      top-k per (input partition, lang) first — no one-task-per-
  //      language window ever sees the corpus; only ≤ partitions × k
  //      survivors per language meet in the final tiny window. ----
  private def tx21(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      md5(concat(lit("sample:"), col("doc_id").cast(StringType))).as("draw"))
    graft.ops.Relational.topKPerGroupScalable(keyed, Seq("lang"),
        Seq(col("draw"), col("doc_id")), 5, rankName = "sample_rank")
      .select("doc_id", "lang", "sample_rank")
  }

  private val tx21Oracle =
    """SELECT doc_id, lang, sample_rank FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      |  FROM documents) t
      |WHERE sample_rank <= 5""".stripMargin

  // ---- tx22: incremental near-dup probe — the steady-state dedup
  //      shape: a small newly-arrived delta (here doc_id % 10 = 7)
  //      checked against the existing corpus without re-clustering.
  //      The corpus never shuffles (delta band keys broadcast, then
  //      the verified-candidate frame broadcasts into the corpus
  //      shingle scan — PlanShapeSpec pins no-SortMergeJoin). The
  //      oracle renders the SAME independent from-spec band keys as
  //      tx06 (ReferenceHashes), splits them delta/corpus in SQL, and
  //      re-runs candidate generation + exact-Jaccard verification
  //      itself. ----
  private def tx22(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isDelta = pmod(col("doc_id"), lit(10)) === 7
    Dedup.incrementalNearDups(
      docs.filter(!isDelta), docs.filter(isDelta), "doc_id", "text",
      minJaccard = 0.7)
  }

  private[queries] def tx22OracleGen(spark: SparkSession, dir: String): String = {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .flatMap(r => ReferenceHashes.minhashBandKeys(r.getString(1)).toSeq
        .flatMap(_.map { case (band, key) => s"(${r.getLong(0)}, $band, $key)" }))
      .mkString(", ")
    val banded = OracleSql.valuesOrEmpty(rows,
      "(CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS BIGINT))")
    s"""WITH banded(id, band, band_hash) AS ($banded),
       |cand AS (
       |  SELECT DISTINCT d.id AS delta_id, c.id AS corpus_id
       |  FROM banded d
       |  JOIN banded c ON d.band = c.band AND d.band_hash = c.band_hash
       |  WHERE d.id % 10 = 7 AND c.id % 10 <> 7),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
       |  FROM documents),
       |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0)
       |SELECT delta_id, corpus_id, jaccard FROM (
       |  SELECT cand.delta_id, cand.corpus_id,
       |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |      / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |  FROM cand
       |  JOIN f a ON a.doc_id = cand.delta_id
       |  JOIN f b ON b.doc_id = cand.corpus_id) t
       |WHERE jaccard >= 0.7""".stripMargin
  }

  // ---- tx23: balanced shard assignment — the last step before the
  //      trainer reads the corpus: N output shards of EQUAL row count
  //      (hash-mod sharding balances only in expectation; stragglers
  //      on the fat shards stall the data loader). shard =
  //      floor((rank − 1) · N / total) where rank is the document's
  //      position under an identity-keyed md5 draw — computed by the
  //      distributed prefix sum, so there is NO one-task global
  //      ROW_NUMBER anywhere; the total is one broadcast scalar. The
  //      assignment is a pure function of the id SET, reproducible
  //      across cluster sizes. ----
  private def tx23(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 8
    val keyed = Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(concat(lit("shard:"), col("doc_id").cast(StringType))).as("draw"))
    val ranked = graft.ops.Relational.runningTotal(keyed,
      order = Seq(col("draw"), col("doc_id")), value = lit(1L), outName = "rank")
    ranked
      .crossJoin(broadcast(Tables.documents(spark, dir)
        .agg(count(lit(1)).as("total"))))
      .select(col("doc_id"), col("rank"),
        floor((col("rank") - 1) * nShards / col("total")).as("shard"))
  }

  private val tx23Oracle =
    """WITH r AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (
      |      ORDER BY md5('shard:' || CAST(doc_id AS VARCHAR)), doc_id) AS rank,
      |    COUNT(*) OVER () AS total
      |  FROM documents)
      |SELECT doc_id, rank,
      |  CAST(FLOOR((rank - 1) * 8 / total) AS BIGINT) AS shard
      |FROM r""".stripMargin

  // ---- tx24: deterministic domain upsampling — data mixing's other
  //      half: tx18 DOWN-samples rich languages to a budget; scarce
  //      high-value domains get UP-sampled by repeating documents a
  //      fractional number of times (e.g. 2.25× = every doc twice,
  //      every fourth doc once more). n_copies = floor(w) + (1 if the
  //      identity-keyed hash bucket < frac(w)·100) — reproducible,
  //      stable under corpus growth, and pure map-side: explode of a
  //      per-row sequence, no shuffle, no sampler state. ----
  private def tx24(spark: SparkSession, dir: String): DataFrame = {
    // per-source target weights: a scarce high-value tier upsampled
    // 2.25x, a bulk tier at 1x, the rest 1.5x
    val weight = when(col("source").isin("src0", "src1", "src2", "src3", "src4"),
        lit(2.25))
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), lit(1.0))
      .otherwise(lit(1.5))
    val bucket = pmod(conv(substring(md5(concat(lit("upsample:"),
      col("doc_id").cast(StringType))), 1, 4), 16, 10).cast(IntegerType),
      lit(100))
    val nCopies = (floor(weight) +
      when(bucket < round((weight - floor(weight)) * 100).cast(IntegerType), 1)
        .otherwise(0)).cast(IntegerType)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), nCopies.as("n_copies"))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
  }

  private val tx24Oracle =
    """WITH w AS (
      |  SELECT doc_id, source,
      |    CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 2.25
      |         WHEN source IN ('src5','src6','src7','src8','src9') THEN 1.0
      |         ELSE 1.5 END AS wt,
      |    CAST(('0x' || substr(md5('upsample:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bucket
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    CAST(FLOOR(wt) + (CASE WHEN bucket < CAST(ROUND((wt - FLOOR(wt)) * 100, 0) AS INTEGER) THEN 1 ELSE 0 END) AS INTEGER) AS n_copies
      |  FROM w)
      |SELECT doc_id, source, n_copies,
      |  CAST(UNNEST(range(1, n_copies + 1)) AS INTEGER) AS copy_idx
      |FROM c""".stripMargin

  // ---- tx25: the Gopher/RefinedWeb-style rule battery — the standard
  //      keep/drop filter set a pre-training pipeline applies before
  //      any model-based scoring: token-count bounds, mean-word-length
  //      bounds, required distinct stopwords (naturalness), and
  //      vocabulary diversity. Pure map-side flags (codegen'd array
  //      ops, no shuffle); each rule surfaces as a column so a filter
  //      sweep can be tuned from ONE pass over the corpus. ----
  private def tx25(spark: SparkSession, dir: String): DataFrame = {
    val nTok = TextAnalysis.tokenCount(col("text"))
    val meanLen = (col("n_chars") - (nTok - lit(1))).cast(DoubleType) / nTok
    val nStop = TextAnalysis.distinctStopwords(col("text"))
    val uniq = TextAnalysis.uniqueRatio(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      meanLen.as("mean_word_len"),
      nStop.as("n_stop_distinct"),
      uniq.as("uniq_ratio"),
      (nTok.between(20, 1000) && meanLen.between(2.0, 12.0) &&
        (nStop >= 2) && (uniq >= 0.3)).as("keep"))
  }

  private val tx25Oracle =
    """SELECT doc_id,
      |  len(str_split(text, ' ')) AS n_tokens,
      |  CAST(n_chars - (len(str_split(text, ' ')) - 1) AS DOUBLE)
      |    / len(str_split(text, ' ')) AS mean_word_len,
      |  len(list_intersect(list_distinct(str_split(text, ' ')),
      |      ['the','a','of','and','to','in'])) AS n_stop_distinct,
      |  CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
      |    / len(str_split(text, ' ')) AS uniq_ratio,
      |  (len(str_split(text, ' ')) BETWEEN 20 AND 1000)
      |    AND (CAST(n_chars - (len(str_split(text, ' ')) - 1) AS DOUBLE)
      |           / len(str_split(text, ' ')) BETWEEN 2.0 AND 12.0)
      |    AND len(list_intersect(list_distinct(str_split(text, ' ')),
      |          ['the','a','of','and','to','in'])) >= 2
      |    AND (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
      |           / len(str_split(text, ' ')) >= 0.3) AS keep
      |FROM documents""".stripMargin

  // ---- tx26: corpus preparation v2 — the WHOLE pipeline, composed:
  //      benchmark decontamination (tx17's broadcast semi-join) →
  //      rule battery (tx25) → exact dedup (min-id per fingerprint) →
  //      near-dup CLUSTER canonicalization (tx20's connected
  //      components — transitive, unlike tx14's pairwise drop) →
  //      per-language token-budget mixture fill (tx18's grouped
  //      prefix sum). Every stage keeps its individually-gated scale
  //      shape; what tx26 adds is the evidence that they COMPOSE into
  //      one lazily-planned DAG under a single end-to-end oracle. ----
  /** tx26's composed pipeline, exposed so tx29 can pack its output —
    * the delivered corpus is the input to sequence packing in a real
    * deployment, and the composition should be the same lazy DAG. */
  private def corpusPrepV2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val isEval = pmod(col("doc_id"), lit(50)) === 0
    // 1. decontamination
    val evalGrams = docs.filter(isEval)
      .select(explode(Dedup.shingleSet(col("text"), 5)).as("gram")).distinct()
    val train = docs.filter(!isEval)
    val contaminated = train
      .select(col("doc_id"), explode(Dedup.shingleSet(col("text"), 5)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .select("doc_id").distinct()
    val clean = train.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
    // 2. rule battery
    val nTokWs = TextAnalysis.tokenCount(col("text"))
    val meanLen = (col("n_chars") - (nTokWs - lit(1))).cast(DoubleType) / nTokWs
    val keepRule = nTokWs.between(20, 1000) && meanLen.between(2.0, 12.0) &&
      (TextAnalysis.distinctStopwords(col("text")) >= 2) &&
      (TextAnalysis.uniqueRatio(col("text")) >= 0.3)
    val kept = clean.filter(keepRule)
      .select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.qualityScore(col("text")).as("quality_score"),
        size(TextAnalysis.bpeTokens(col("text"))).as("n_tokens"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    // 3. exact dedup: min id per fingerprint
    val exact = kept
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper", "fp")
    // 4. near-dup cluster canonicalization
    val nonCanonical = Dedup.connectedComponents(
        Dedup.allPairsJaccard(exact, "doc_id", "text", minJaccard = 0.7),
        "id_a", "id_b")
      .filter(!col("is_canonical"))
      .select(col("id").as("doc_id"))
    val unique = exact.join(broadcast(nonCanonical), Seq("doc_id"), "left_anti")
    // 5. per-language token-budget fill
    graft.ops.Relational.groupedRunningTotal(
        unique.select(col("doc_id"), col("lang"), col("quality_score"),
          col("n_tokens")),
        Seq("lang"), Seq(col("quality_score").desc, col("doc_id")),
        col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= 4000)
      .select("doc_id", "lang", "quality_score", "n_tokens", "cum_tokens")
  }

  /** tx26's oracle CTE chain (through `uniq`), shared with tx29. */
  private val corpusPrepV2Ctes = {
    val re = s"'${TextAnalysis.BpePattern}'"
    s"""WITH RECURSIVE g5 AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 3),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2] || ' ' || str_split(text, ' ')[i+3] || ' ' || str_split(text, ' ')[i+4])) AS grams,
       |    doc_id % 50 = 0 AS is_eval
       |  FROM documents),
       |eg AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g5 WHERE is_eval),
       |contam AS (
       |  SELECT DISTINCT t.doc_id
       |  FROM (SELECT doc_id, UNNEST(grams) AS gram FROM g5 WHERE NOT is_eval) t
       |  JOIN eg USING (gram)),
       |clean AS (
       |  SELECT d.* FROM documents d
       |  WHERE d.doc_id % 50 <> 0
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)),
       |kept AS (
       |  SELECT doc_id, lang, text,
       |    (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) / len(str_split(text, ' ')))
       |      * (1.0 - CAST(len(list_filter(str_split(text, ' '), t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) / len(str_split(text, ' '))) AS quality_score,
       |    len(regexp_extract_all(text, $re)) AS n_tokens,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
       |  FROM clean
       |  WHERE (len(str_split(text, ' ')) BETWEEN 20 AND 1000)
       |    AND (CAST(n_chars - (len(str_split(text, ' ')) - 1) AS DOUBLE)
       |           / len(str_split(text, ' ')) BETWEEN 2.0 AND 12.0)
       |    AND len(list_intersect(list_distinct(str_split(text, ' ')),
       |          ['the','a','of','and','to','in'])) >= 2
       |    AND (CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
       |           / len(str_split(text, ' ')) >= 0.3)),
       |exact AS (
       |  SELECT doc_id, lang, text, quality_score, n_tokens FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM kept) k
       |  WHERE doc_id = keeper),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
       |  FROM exact),
       |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |    FROM f a JOIN f b ON a.doc_id < b.doc_id) t
       |  WHERE jaccard >= 0.7),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst),
       |noncanon AS (
       |  SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(r) <> id),
       |uniq AS (
       |  SELECT doc_id, lang, quality_score, n_tokens FROM exact
       |  WHERE doc_id NOT IN (SELECT doc_id FROM noncanon))""".stripMargin
  }

  private val corpusPrepV2Select =
    """SELECT doc_id, lang, quality_score, n_tokens, cum_tokens FROM (
      |  SELECT doc_id, lang, quality_score, n_tokens,
      |    CAST(SUM(n_tokens) OVER (
      |      PARTITION BY lang ORDER BY quality_score DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM uniq) t
      |WHERE cum_tokens <= 4000""".stripMargin

  private val tx26Oracle = s"$corpusPrepV2Ctes\n$corpusPrepV2Select"

  private def tx26(spark: SparkSession, dir: String): DataFrame =
    corpusPrepV2(spark, dir)

  // ---- tx29: corpus DELIVERY — the last hop: tx26's prepared corpus
  //      packed into fixed-token training sequences, composed as the
  //      same lazy DAG (prep never materializes to disk between the
  //      stages). Reproducible identity-keyed order, offsets via the
  //      distributed prefix sum over the SURVIVORS' metadata; the
  //      oracle reuses tx26's entire CTE chain and re-derives the
  //      packing with a window cumsum — one end-to-end gate from raw
  //      documents to sequence ids. ----
  private def tx29(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 512
    val survivors = corpusPrepV2(spark, dir).select(
      col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
      md5(concat(lit("pack:"), col("doc_id").cast(StringType))).as("draw"))
    graft.ops.Relational.runningTotal(survivors,
        order = Seq(col("draw"), col("doc_id")), value = col("n_tokens"),
        outName = "cum")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_offset"),
        floor((col("cum") - col("n_tokens")) / seqLen).as("seq_id"))
  }

  private val tx29Oracle =
    s"""$corpusPrepV2Ctes,
       |delivered AS ($corpusPrepV2Select),
       |r AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (
       |      ORDER BY md5('pack:' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM delivered)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
       |  CAST(FLOOR((cum - n_tokens) / 512) AS BIGINT) AS seq_id
       |FROM r""".stripMargin

  // ---- tx28: training sequence packing — the step between a
  //      prepared corpus and the trainer's data loader: documents
  //      concatenate in a reproducible shuffled order (identity-keyed
  //      md5 draw, like tx19/tx21/tx23 — stable under re-runs and
  //      cluster resizes) into fixed-token-budget sequences, and each
  //      document's sequence id is the bucket its START offset falls
  //      in. The offset is the distributed prefix sum — no one-task
  //      global window ever sees the corpus; packing 100 TB costs one
  //      range exchange of (id, draw, n_tokens) metadata, never the
  //      text. Token budget here is the whitespace proxy (this query
  //      gates the packing MACHINERY at the deep tiers, where its
  //      oracle stays a plain window sum); tx49 is the same packing
  //      re-pointed at REAL BPE token ids from [[Bpe.encode]]. ----
  private def tx28(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 2048
    val keyed = Tables.documents(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
      md5(concat(lit("pack:"), col("doc_id").cast(StringType))).as("draw"))
    graft.ops.Relational.runningTotal(keyed,
        order = Seq(col("draw"), col("doc_id")), value = col("n_tokens"),
        outName = "cum_tokens")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum_tokens") - col("n_tokens")).as("start_offset"),
        floor((col("cum_tokens") - col("n_tokens")) / seqLen).as("seq_id"))
  }

  private val tx28Oracle =
    """WITH r AS (
      |  SELECT doc_id,
      |    len(str_split(text, ' ')) AS n_tokens,
      |    SUM(len(str_split(text, ' '))) OVER (
      |      ORDER BY md5('pack:' || CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
      |  CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id
      |FROM r""".stripMargin

  // ---- tx27: corpus n-gram statistics — top-10 bigrams and trigrams
  //      by frequency. The corpus-health readout every pipeline keeps
  //      (boilerplate phrases, template artifacts, and benchmark
  //      contamination all surface as over-represented n-grams long
  //      before any per-document filter sees them). One pass over the
  //      corpus: both gram sizes render as struct arrays inside the
  //      same projection and explode together, the hash aggregate
  //      collapses map-side partial counts before the (tiny, vocab²-
  //      bounded) shuffle, and the per-size top-10 runs through the
  //      straggler-free grouped top-k — no global sort, no one-task-
  //      per-size window over the full gram table. ----

  private def tx27(spark: SparkSession, dir: String): DataFrame = {
    // gram construction is the native tokenShingles expression (one
    // tight loop per row — the same reason MinHash shingling went
    // native); only the light size-tagging transform stays a lambda
    def tagged(n: Int): Column =
      transform(Dedup.shingles(col("text"), w = n),
        g => struct(lit(n).as("n"), g.as("gram")))
    val counts = Tables.documents(spark, dir)
      .select(explode(concat(tagged(2), tagged(3))).as("g"))
      .select(col("g.n").as("n"), col("g.gram").as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy(col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    graft.ops.Relational.topKPerGroupScalable(counts, Seq("n"),
      Seq(col("cnt").desc, col("gram")), 10, rankName = "rank")
      .select("n", "gram", "cnt", "rank")
  }

  private val tx27Oracle =
    """WITH toks AS (SELECT str_split(text, ' ') AS ts FROM documents),
      |g AS (
      |  SELECT 2 AS n, UNNEST(list_transform(range(1, len(ts)),
      |    i -> ts[i] || ' ' || ts[i+1])) AS gram FROM toks
      |  UNION ALL
      |  SELECT 3 AS n, UNNEST(list_transform(range(1, len(ts) - 1),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gram FROM toks),
      |c AS (SELECT n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2)
      |SELECT n, gram, cnt, rank FROM (
      |  SELECT n, gram, cnt,
      |    ROW_NUMBER() OVER (PARTITION BY n ORDER BY cnt DESC, gram) AS rank
      |  FROM c) z
      |WHERE rank <= 10""".stripMargin

  // ---- tx30: overlapping context-window chunking — the step between
  //      a prepared corpus and a RAG / long-context loader: each
  //      document splits into fixed-width token windows (W = 64) with
  //      stride S = 48, so consecutive chunks share W − S = 16 tokens
  //      of overlap and no token is more than S away from a chunk
  //      start. Chunk count and boundaries are pure functions of the
  //      document's own token count — map-side sequence explode, zero
  //      shuffles, embarrassingly parallel at any corpus size. The
  //      chunk content is gated as md5 of the exact token slice, which
  //      both engines derive independently from the raw text. ----
  private val ChunkW = 64
  private val ChunkS = 48

  private def tx30(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nChunks = when(col("n_tok") <= ChunkW, lit(1)).otherwise(
      ceil((col("n_tok") - ChunkW).cast(DoubleType) / ChunkS).cast(IntegerType) + 1)
    val start = col("chunk_id") * ChunkS
    val len = least(col("n_tok") - start, lit(ChunkW))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"), size(toks).as("n_tok"))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        start.as("start_tok"),
        len.as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), start + 1, len))).as("chunk_hash"))
  }

  private val tx30Oracle =
    s"""WITH d AS (
       |  SELECT doc_id, str_split(text, ' ') AS toks,
       |    CAST(len(str_split(text, ' ')) AS INT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, toks, n_tok,
       |    CASE WHEN n_tok <= $ChunkW THEN 1
       |         ELSE CAST(CEIL(CAST(n_tok - $ChunkW AS DOUBLE) / $ChunkS) AS INT) + 1
       |    END AS n_chunks
       |  FROM d),
       |e AS (
       |  SELECT doc_id, toks, n_tok,
       |    CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id
       |  FROM c)
       |SELECT doc_id, chunk_id,
       |  chunk_id * $ChunkS AS start_tok,
       |  LEAST(n_tok - chunk_id * $ChunkS, $ChunkW) AS n_chunk_tokens,
       |  md5(array_to_string(list_slice(toks, chunk_id * $ChunkS + 1,
       |    chunk_id * $ChunkS + LEAST(n_tok - chunk_id * $ChunkS, $ChunkW)), ' '))
       |    AS chunk_hash
       |FROM e""".stripMargin

  // ---- tx31: bigram-rarity quality scoring — the in-engine stand-in
  //      for LM-perplexity filtering: a document whose bigrams are all
  //      corpus-rare is likely gibberish / OCR noise, one whose
  //      bigrams are all corpus-common is likely boilerplate. The
  //      "language model" is the corpus's own bigram frequency table,
  //      built in one hash aggregate (map-side partial counts; the
  //      shuffled gram table is vocab²-bounded, orders of magnitude
  //      smaller than the corpus), then joined back to each document's
  //      bigrams on the gram key. Scoring is pure integer/rational
  //      arithmetic — counts, a min, and two int64/int64 divisions —
  //      deliberately NOT ln()-based perplexity, because libm log
  //      differs across engines in the last ulp and would break the
  //      cell-exact gate; the rational statistics carry the same
  //      filtering signal. Documents under 2 tokens have no bigrams
  //      and drop out in both engines (inner-join semantics). ----

  private def tx31(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), w = 2)).as("gram"))
    val lm = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
    grams.join(lm, "gram")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        min(col("cnt")).as("min_freq"),
        (sum(col("cnt")).cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("mean_freq"),
        (sum(when(col("cnt") === 1, 1L).otherwise(0L)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("novel_rate"))
  }

  private val tx31Oracle =
    """WITH toks AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
      |g AS (SELECT doc_id, UNNEST(list_transform(range(1, len(ts)),
      |        i -> ts[i] || ' ' || ts[i+1])) AS gram FROM toks),
      |lm AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1)
      |SELECT g.doc_id, COUNT(*) AS n_bigrams, MIN(cnt) AS min_freq,
      |  CAST(SUM(cnt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_freq,
      |  CAST(COUNT(*) FILTER (WHERE cnt = 1) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS novel_rate
      |FROM g JOIN lm USING (gram) GROUP BY 1""".stripMargin

  // ---- tx32: character-level fuzzy dedup — blocking + verify, the
  //      record-linkage classic that complements the token-set LSH
  //      family: MinHash (tx06) keys on shingle SETS, so it misses
  //      character-level corruption (OCR noise, truncation, joined
  //      words) that edit distance catches. Candidate pairs come from
  //      ONE equi-join on a short deterministic blocking key (the
  //      first 12 characters) — never an all-pairs expand; block
  //      sizes are data-bounded, and a hot block would take the q20
  //      salting treatment. Verification is codegen'd levenshtein
  //      over a 256-char prefix: bounded per-pair cost, a declared
  //      approximation for megabyte documents (the prefix IS the
  //      blocking-stage contract; a full-text verify would be a
  //      second, rarer pass downstream). ----
  private def tx32(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), substring(col("text"), 1, 12).as("blk"),
        substring(col("text"), 1, 256).as("pre"))
    val a = docs.select(col("doc_id").as("id_a"), col("blk"),
      col("pre").as("pre_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("blk"),
      col("pre").as("pre_b"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("pre_a"), col("pre_b")).cast(LongType)
          .as("edit_distance"))
      .filter(col("edit_distance") <= 64)
  }

  private val tx32Oracle =
    """WITH b AS (SELECT doc_id, substr(text, 1, 12) AS blk,
      |             substr(text, 1, 256) AS pre FROM documents)
      |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
      |  levenshtein(a.pre, c.pre) AS edit_distance
      |FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
      |WHERE levenshtein(a.pre, c.pre) <= 64""".stripMargin

  // ---- tx33: multi-term retrieval — the search-side consumer of the
  //      tx12 statistics: rank documents containing ALL query terms by
  //      summed tf-idf. The term list is a literal (broadcast-sized by
  //      nature), so the corpus explode filters to query terms
  //      MAP-SIDE before any aggregation — the per-doc frame that
  //      shuffles carries at most |terms| rows per matching doc, and
  //      the df/N statistics for three terms are single-digit rows.
  //      Per-term scores scale to exact integers (×10⁴, the cosine
  //      rounding rule) BEFORE the per-doc sum, so the sum is
  //      order-free integer math and the final score a single exact
  //      division — no float fold order anywhere. AND semantics via
  //      matched-term count; top-10 with doc_id tiebreak. ----
  private val Tx33Terms = Seq("spark", "window", "join")

  private def tx33(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term").isin(Tx33Terms: _*))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"),
        round(col("tf") * log(col("n").cast(DoubleType) / col("df")) * 10000)
          .cast(LongType).as("s"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_i"))
      .filter(col("n_terms") === Tx33Terms.size)
      .select(col("doc_id"),
        (col("score_i").cast(DoubleType) / 10000.0).as("score"))
    graft.ops.Relational.topKPerGroup(
      perDoc.withColumn("__g", lit(1)), Seq("__g"),
      Seq(col("score").desc, col("doc_id")), 10, rankName = "rank")
      .select("doc_id", "score", "rank")
  }

  private val tx33Oracle =
    """WITH t AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
      |f AS (SELECT doc_id, term FROM t WHERE term IN ('spark', 'window', 'join')),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM f GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM f GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000) AS BIGINT) AS s
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_terms, SUM(s) AS score_i
      |  FROM scored GROUP BY 1)
      |SELECT doc_id, score, rank FROM (
      |  SELECT doc_id, CAST(score_i AS DOUBLE) / 10000.0 AS score,
      |    ROW_NUMBER() OVER (ORDER BY CAST(score_i AS DOUBLE) / 10000.0 DESC, doc_id) AS rank
      |  FROM agg WHERE n_terms = 3) z
      |WHERE rank <= 10""".stripMargin

  // ---- tx34: PII redaction — the scrub-at-ingest step of a training
  //      pipeline: detect and mask email / IPv4 / phone spans with
  //      typed placeholders, reporting per-class hit counts. The
  //      synthetic corpus carries no PII, so the query first PLANTS
  //      deterministic doc_id-derived spans (every doc an email, every
  //      2nd an IP, every 3rd a phone — the oracle plants the same
  //      spans in SQL), then runs the real operator: codegen'd
  //      regexp_count / regexp_replace column expressions, zero
  //      shuffles, and the exact redacted TEXT is what gates. The
  //      regexes are dialect-portable (java.util.regex here, RE2 in
  //      DuckDB — char classes, bounded repeats, \b only). ----
  private def tx34(spark: SparkSession, dir: String): DataFrame =
    graft.text.Scrub.piiScrubReport(Tables.documents(spark, dir))

  private[queries] val tx34Oracle =
    """WITH aug AS (
      |  SELECT doc_id, lang,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
      |    || CASE WHEN doc_id % 2 = 0 THEN ' from 10.'
      |         || CAST(doc_id % 200 + 1 AS VARCHAR) || '.'
      |         || CAST(doc_id % 250 + 1 AS VARCHAR) || '.'
      |         || CAST((doc_id * 7) % 250 + 1 AS VARCHAR) ELSE '' END
      |    || CASE WHEN doc_id % 3 = 0 THEN ' call (555) '
      |         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      |         || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    AS text
      |  FROM documents)
      |SELECT doc_id, lang,
      |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
      |  len(regexp_extract_all(text, '\(555\) \d{3}-\d{4}')) AS n_phone,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |      '\(555\) \d{3}-\d{4}', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
      |FROM aug""".stripMargin

  // ---- tx35: corpus-level duplicate-segment removal — the CCNet /
  //      RefinedWeb boilerplate strike (Lee et al. 2022): 2-token
  //      segments repeating corpus-wide above docs/25 occurrences are
  //      struck from every document. The gate compares the exact
  //      rebuilt text. Plan shape: ONE exchange total (the narrow
  //      segment-count aggregate); the boilerplate set collapses to a
  //      single broadcast row and every document rebuilds map-side —
  //      the corpus itself never shuffles. See [[graft.text.Scrub]]. ----
  private def tx35(spark: SparkSession, dir: String): DataFrame =
    graft.text.Scrub.segmentDedup(
      Tables.documents(spark, dir), "doc_id", "text",
      width = 2, thresholdDiv = 25.0)

  private[queries] val tx35Oracle =
    """WITH segd AS (
      |  SELECT doc_id,
      |    list_transform(range(0, CAST(ceil(len(str_split(text,' '))/2.0) AS INT)),
      |      i -> array_to_string((str_split(text,' '))[i*2+1:i*2+2], ' ')) AS segs
      |  FROM documents),
      |expl AS (SELECT doc_id, UNNEST(segs) AS seg FROM segd),
      |cnt AS (SELECT seg, COUNT(*) AS c FROM expl GROUP BY 1),
      |bl AS (SELECT coalesce(list(seg), []) AS bl_list FROM cnt
      |       WHERE c > (SELECT COUNT(*) FROM documents)/25.0)
      |SELECT d.doc_id,
      |  len(d.segs) AS n_segments,
      |  len(list_filter(d.segs, s -> list_contains(bl_list, s))) AS n_dropped,
      |  array_to_string(list_filter(d.segs, s -> NOT list_contains(bl_list, s)), ' ') AS clean_text
      |FROM segd d CROSS JOIN bl""".stripMargin

  // ---- tx36: BM25 ranked retrieval — tx33's tf-idf consumer upgraded
  //      to the Okapi/Lucene scoring that production search actually
  //      runs: idf = ln((N - df + 0.5)/(df + 0.5) + 1), term score =
  //      idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) with
  //      k1 = 1.2, b = 0.75 — tf saturation plus document-length
  //      normalization, which plain tf-idf lacks. Scale shape is
  //      tx33's: the literal term list filters the corpus explode
  //      MAP-SIDE before any aggregation; df/N/avgdl are single-row
  //      broadcast stats; doc length joins from a narrow (doc_id, dl)
  //      aggregate on the same exploded frame. Cross-engine float
  //      discipline: every per-term score is an identical IEEE-double
  //      expression tree on both engines (same literals, same
  //      parenthesization), rounded to a ×10⁴ integer BEFORE the
  //      per-doc sum — the only float fold is per-term, never across
  //      terms, so the gate is cell-exact. AND semantics; top-10. ----
  private def tx36(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(
      col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
    val dl = docs.select(
      col("doc_id"), TextAnalysis.tokenCount(col("text")).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n"),
      sum(TextAnalysis.tokenCount(col("text"))).as("total_dl"))
    val terms = toks.filter(col("term").isin(Tx33Terms: _*))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), {
        val nD = col("n").cast(DoubleType)
        val dfD = col("df").cast(DoubleType)
        val tfD = col("tf").cast(DoubleType)
        val dlD = col("dl").cast(DoubleType)
        val avgdl = col("total_dl").cast(DoubleType) / nD
        val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
        val num = tfD * lit(2.2)
        val den = tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (dlD / avgdl))
        round(idf * (num / den) * 10000).cast(LongType).as("s")
      })
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s")).as("score_i"))
      .filter(col("n_terms") === Tx33Terms.size)
      .select(col("doc_id"),
        (col("score_i").cast(DoubleType) / 10000.0).as("score"))
    graft.ops.Relational.topKPerGroup(
      perDoc.withColumn("__g", lit(1)), Seq("__g"),
      Seq(col("score").desc, col("doc_id")), 10, rankName = "rank")
      .select("doc_id", "score", "rank")
  }

  private val tx36Oracle =
    """WITH t AS (SELECT doc_id, UNNEST(str_split(text, ' ')) AS term FROM documents),
      |dl AS (SELECT doc_id, len(str_split(text, ' ')) AS dl FROM documents),
      |stats AS (SELECT COUNT(*) AS n, SUM(len(str_split(text, ' '))) AS total_dl
      |          FROM documents),
      |f AS (SELECT doc_id, term FROM t WHERE term IN ('spark', 'window', 'join')),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM f GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM f GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(
      |      ln((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
      |          / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
      |      * ((CAST(tf.tf AS DOUBLE) * 2.2)
      |         / (CAST(tf.tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
      |                                    / (CAST(s.total_dl AS DOUBLE)
      |                                       / CAST(s.n AS DOUBLE))))))
      |      * 10000) AS BIGINT) AS s
      |  FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
      |  CROSS JOIN stats s),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_terms, SUM(s) AS score_i
      |  FROM scored GROUP BY 1)
      |SELECT doc_id, score, rank FROM (
      |  SELECT doc_id, CAST(score_i AS DOUBLE) / 10000.0 AS score,
      |    ROW_NUMBER() OVER (ORDER BY CAST(score_i AS DOUBLE) / 10000.0 DESC, doc_id) AS rank
      |  FROM agg WHERE n_terms = 3) z
      |WHERE rank <= 10""".stripMargin

  // ---- tx37: exact duplicated-substring removal — ExactSubstr from
  //      Lee et al. 2022, the span-level complement of tx35's aligned
  //      segments: any 30-char window occurring elsewhere in the
  //      corpus is struck except its corpus-wide first (min (doc,
  //      pos)) occurrence; overlapping duplicate windows merge into
  //      one covered span before removal. The gate compares the exact
  //      rebuilt text. The per-window stats are one skew-tolerant
  //      hash aggregate (count + min-carrier — never a
  //      row_number-over-window sort), the occurrences join back on
  //      the reused (win) exchange, and the span merge walks each
  //      document's sorted dup positions inside a higher-order
  //      `aggregate` map-side. The oracle re-derives coverage
  //      char-by-char — a deliberately different (quadratic-ish)
  //      formulation, so the interval walk is gated against an
  //      independent definition of "covered". ----
  private def tx37(spark: SparkSession, dir: String): DataFrame =
    graft.text.Scrub.substringDedup(
      Tables.documents(spark, dir), "doc_id", "text", width = 30)

  private[queries] val tx37Oracle =
    """WITH wins AS (
      |  SELECT doc_id, text, UNNEST(range(0, len(text) - 30 + 1)) AS p
      |  FROM documents WHERE len(text) >= 30),
      |w2 AS (SELECT doc_id, p, substr(text, CAST(p AS INT) + 1, 30) AS win
      |       FROM wins),
      |occ AS (SELECT doc_id, p,
      |          ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, p) AS rn,
      |          COUNT(*) OVER (PARTITION BY win) AS c
      |        FROM w2),
      |dup AS (SELECT doc_id, p FROM occ WHERE c >= 2 AND rn >= 2),
      |chars AS (SELECT doc_id, text, UNNEST(range(0, len(text))) AS i
      |          FROM documents),
      |cov AS (SELECT DISTINCT c.doc_id, c.i
      |        FROM chars c JOIN dup d
      |        ON d.doc_id = c.doc_id AND c.i >= d.p AND c.i < d.p + 30),
      |clean AS (
      |  SELECT c.doc_id,
      |    string_agg(CASE WHEN v.i IS NULL THEN substr(c.text, CAST(c.i AS INT) + 1, 1)
      |               ELSE '' END, '' ORDER BY c.i) AS clean_text,
      |    SUM(CASE WHEN v.i IS NULL THEN 0 ELSE 1 END) AS n_removed
      |  FROM chars c LEFT JOIN cov v ON v.doc_id = c.doc_id AND v.i = c.i
      |  GROUP BY c.doc_id)
      |SELECT d.doc_id, len(d.text) AS n_chars,
      |  CAST(cl.n_removed AS BIGINT) AS n_removed, cl.clean_text
      |FROM documents d JOIN clean cl ON cl.doc_id = d.doc_id""".stripMargin

  // ---- tx38: shingle-containment pairs — the quote/inclusion axis of
  //      dedup (|A∩B| / min(|A|,|B|)): a short document embedded in a
  //      long one scores ~1 here while its Jaccard (tx13) stays low.
  //      Intersections come from the inverted-index shingle self-join
  //      under a df ≤ 20 cap (declared semantics — boilerplate
  //      shingles drop from the intersection; the cap is what bounds
  //      the join fanout at corpus scale). The oracle applies the
  //      identical cap in SQL, so containment gates cell-exact. ----
  private def tx38(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(spark, dir), "doc_id", "text",
      minContainment = 0.8)

  private val tx38Oracle =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
      |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
      |  FROM documents),
      |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
      |tok AS (SELECT doc_id, UNNEST(s) AS g FROM f),
      |dfc AS (SELECT g, COUNT(*) AS df FROM tok GROUP BY 1),
      |capped AS (SELECT t.doc_id, t.g FROM tok t JOIN dfc d ON d.g = t.g
      |           WHERE d.df <= 20),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS li
      |  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, containment FROM (
      |  SELECT s.id_a, s.id_b,
      |    CAST(s.li AS DOUBLE) / CAST(least(fa.l, fb.l) AS DOUBLE) AS containment
      |  FROM shared s
      |  JOIN f fa ON fa.doc_id = s.id_a
      |  JOIN f fb ON fb.doc_id = s.id_b) t
      |WHERE containment >= 0.8""".stripMargin

  // ---- tx39: collocation mining — the top word PAIRS whose
  //      co-occurrence beats chance, ranked by a scaled-integer PMI
  //      (pointwise mutual information): score = c_ab·T·10^6 div
  //      (c_a·c_b), the PMI's operand before the log — monotone in
  //      PMI, so the RANKING is identical, and pure int64 arithmetic,
  //      so the gate is cell-exact where ln() would differ in the
  //      last ulp across engines (the tx31 rationale). Tokenization
  //      and bigram construction carry tx27's exact conventions.
  //      Overflow bound (declared): c_ab·T·10^6 needs c_ab·T < 9.2e12
  //      — holds through the 10× tier (T ≈ 6e6); a 100 TB corpus
  //      would lift the intermediate to DECIMAL(38,0), same plan.
  //      Scale shape: one corpus scan explodes unigrams and tagged
  //      bigram-head/tail structs together; both count aggregates are
  //      vocab-bounded map-side partials; the unigram table broadcasts
  //      twice into the bigram frame (vocab-sized — the tx12
  //      broadcast-vocab premise); min-support c_ab ≥ 5 prunes the
  //      noise floor BEFORE the joins; top-20 rides the straggler-free
  //      grouped top-k. ----
  private def tx39(spark: SparkSession, dir: String): DataFrame = {
    val ts = split(col("text"), " ")
    val docs = Tables.documents(spark, dir)
    val uni = docs.select(explode(ts).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("t"))
    // sequence(0, size-2) DESCENDS when size < 2 — guard to empty
    val pairs = when(size(ts) >= 2,
      transform(sequence(lit(0), size(ts) - 2), i =>
        struct(element_at(ts, i + 1).as("a"), element_at(ts, i + 2).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val bc = docs.select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 5)
    val scored = bc
      .join(broadcast(uc).withColumnRenamed("w", "a").withColumnRenamed("c", "ca"), "a")
      .join(broadcast(uc).withColumnRenamed("w", "b").withColumnRenamed("c", "cb"), "b")
      .crossJoin(broadcast(tot))
      .select(concat_ws(" ", col("a"), col("b")).as("gram"), col("cab"),
        expr("cab * t * 1000000 div (ca * cb)").as("pmi_scaled"))
    graft.ops.Relational.topKPerGroupScalable(
        scored.withColumn("__g", lit(1)), Seq("__g"),
        Seq(col("pmi_scaled").desc, col("gram")), 20, rankName = "rank")
      .select("gram", "cab", "pmi_scaled", "rank")
  }

  private val tx39Oracle =
    """WITH toks AS (SELECT str_split(text, ' ') AS ts FROM documents),
      |uni AS (SELECT UNNEST(ts) AS w FROM toks),
      |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS t FROM uni),
      |big AS (
      |  SELECT UNNEST(list_transform(range(1, len(ts)),
      |    i -> struct_pack(a := ts[i], b := ts[i+1]))) AS p
      |  FROM toks),
      |bc AS (
      |  SELECT p.a AS a, p.b AS b, COUNT(*) AS cab
      |  FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      |sc AS (
      |  SELECT bc.a || ' ' || bc.b AS gram, bc.cab,
      |    (bc.cab * t.t * 1000000) // (ua.c * ub.c) AS pmi_scaled
      |  FROM bc CROSS JOIN tot t
      |  JOIN uc ua ON ua.w = bc.a
      |  JOIN uc ub ON ub.w = bc.b)
      |SELECT gram, CAST(cab AS BIGINT) AS cab,
      |  CAST(pmi_scaled AS BIGINT) AS pmi_scaled, rank
      |FROM (
      |  SELECT gram, cab, pmi_scaled,
      |    ROW_NUMBER() OVER (ORDER BY pmi_scaled DESC, gram) AS rank
      |  FROM sc) z
      |WHERE rank <= 20""".stripMargin

  // ---- tx40: per-source boilerplate profile — CCNet's actual strike
  //      granularity: boilerplate is DOMAIN-local (every site repeats
  //      its own footer), so the counters and the threshold both live
  //      per source, where tx35's global strike would miss a template
  //      that floods one domain but stays corpus-rare. Per source:
  //      distinct boilerplate segments (> docs_in_source/10
  //      occurrences WITHIN the source), their total occurrence mass,
  //      and the heaviest segment (count desc, ties to the LAST
  //      segment in byte order — the struct-max total order). Scale
  //      shape: ONE (source, seg) hash aggregate
  //      (narrow rows, map-side combine), a broadcast per-source doc
  //      count, and a (source)-grain argmax — the corpus never
  //      shuffles. Segment construction carries tx35's exact
  //      conventions (2-token aligned segments). ----
  private def tx40(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val segCounts = docs
      .select(col("source"),
        explode(graft.text.Scrub.segments(col("text"), 2)).as("seg"))
      .groupBy(col("source"), col("seg")).agg(count(lit(1)).as("n"))
    val srcDocs = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    segCounts.join(broadcast(srcDocs), "source")
      .filter(col("n") > col("n_docs") / 10.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_boiler_segments"),
        sum(col("n")).as("boiler_occurrences"),
        max(struct(col("n"), col("seg"))).as("__top"))
      .select(col("source"), col("n_boiler_segments"),
        col("boiler_occurrences"),
        col("__top.seg").as("top_segment"), col("__top.n").as("top_n"))
  }

  private val tx40Oracle =
    """WITH segd AS (
      |  SELECT source,
      |    UNNEST(list_transform(range(0, CAST(ceil(len(str_split(text,' '))/2.0) AS INT)),
      |      i -> array_to_string((str_split(text,' '))[i*2+1:i*2+2], ' '))) AS seg
      |  FROM documents),
      |cnt AS (SELECT source, seg, COUNT(*) AS n FROM segd GROUP BY 1, 2),
      |sd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |bl AS (
      |  SELECT c.source, c.seg, c.n FROM cnt c JOIN sd ON sd.source = c.source
      |  WHERE c.n > sd.n_docs / 10.0),
      |top AS (
      |  SELECT source, seg, n,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, seg DESC) AS rn
      |  FROM bl)
      |SELECT b.source, COUNT(*) AS n_boiler_segments,
      |  CAST(SUM(b.n) AS BIGINT) AS boiler_occurrences,
      |  MIN(t.seg) AS top_segment, CAST(MIN(t.n) AS BIGINT) AS top_n
      |FROM bl b JOIN (SELECT * FROM top WHERE rn = 1) t ON t.source = b.source
      |GROUP BY b.source""".stripMargin

  // ---- tx41: dedup quality evaluation — the report a pipeline owner
  //      actually reads before trusting a near-dup config: the banded
  //      LSH's predicted pairs (tx06's production machinery) scored
  //      against the exact all-pairs ground truth (tx13's quadratic
  //      exactness anchor) as tp/fp/fn and floor-scaled integer
  //      precision/recall/F1 — pure int64 arithmetic end-to-end, so
  //      the gate is cell-exact (the tx33 rationale: counts and
  //      int64/int64 divisions, no float fold anywhere). The truth
  //      side inherits tx13's declared quadratic cost model (an EVAL
  //      harness is run on a sample/fixture corpus, not the 100 TB
  //      feed; the prediction side keeps tx06's banded scale shape).
  //      The oracle re-derives BOTH sides itself: banded VALUES
  //      literals from the independent ReferenceHashes pipeline for
  //      the prediction, the list-intersect brute force for the
  //      truth, then the same outer-join scoring — so a drifted cap,
  //      threshold, or join shape on either side breaks the hash. ----
  private def tx41(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pred = Dedup.nearDupPairs(docs, "doc_id", "text", minJaccard = 0.7)
      .select(col("id_a"), col("id_b"))
    val truth = Dedup.allPairsJaccard(docs, "doc_id", "text", minJaccard = 0.7)
      .select(col("id_a"), col("id_b"))
    val scored = pred.withColumn("p", lit(1L))
      .join(truth.withColumn("t", lit(1L)), Seq("id_a", "id_b"), "full_outer")
    scored.agg(
        sum(when(col("p").isNotNull && col("t").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("p").isNotNull && col("t").isNull, 1L).otherwise(0L)).as("fp"),
        sum(when(col("p").isNull && col("t").isNotNull, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp = 0 THEN NULL ELSE tp * 1000000 div (tp + fp) END").as("precision_ppm"),
        expr("CASE WHEN tp + fn = 0 THEN NULL ELSE tp * 1000000 div (tp + fn) END").as("recall_ppm"),
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE 2 * tp * 1000000 div (2 * tp + fp + fn) END").as("f1_ppm"))
  }

  private def tx41OracleGen(spark: SparkSession, dir: String): String = {
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect()
      .flatMap(r => ReferenceHashes.minhashBandKeys(r.getString(1)).toSeq
        .flatMap(_.map { case (band, key) => s"(${r.getLong(0)}, $band, $key)" }))
      .mkString(", ")
    val banded = OracleSql.valuesOrEmpty(rows,
      "(CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS BIGINT))")
    s"""WITH banded(id, band, band_hash) AS ($banded),
       |sizes AS (
       |  SELECT band, band_hash, COUNT(*) AS bsz
       |  FROM banded GROUP BY band, band_hash),
       |capped AS (
       |  SELECT b.id, b.band, b.band_hash FROM banded b
       |  JOIN sizes s ON s.band = b.band AND s.band_hash = b.band_hash
       |  WHERE s.bsz <= 1000),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM capped a
       |  JOIN capped b ON a.band = b.band AND a.band_hash = b.band_hash
       |    AND a.id < b.id),
       |sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(range(1, len(str_split(text, ' ')) - 1),
       |      i -> str_split(text, ' ')[i] || ' ' || str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2])) AS s
       |  FROM documents),
       |f AS (SELECT doc_id, s, len(s) AS l FROM sh WHERE len(s) > 0),
       |pred AS (
       |  SELECT c.id_a, c.id_b FROM (
       |    SELECT c.id_a, c.id_b,
       |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |    FROM cand c
       |    JOIN f a ON a.doc_id = c.id_a
       |    JOIN f b ON b.doc_id = c.id_b) c
       |  WHERE jaccard >= 0.7),
       |truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |        / CAST(a.l + b.l - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |    FROM f a JOIN f b ON a.doc_id < b.doc_id) z
       |  WHERE jaccard >= 0.7),
       |j AS (
       |  SELECT COALESCE(p.one, 0) AS p, COALESCE(t.one, 0) AS t
       |  FROM (SELECT id_a, id_b, 1 AS one FROM pred) p
       |  FULL OUTER JOIN (SELECT id_a, id_b, 1 AS one FROM truth) t
       |    ON p.id_a = t.id_a AND p.id_b = t.id_b),
       |agg AS (
       |  SELECT CAST(SUM(CASE WHEN p = 1 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN p = 1 AND t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN p = 0 AND t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM j)
       |SELECT tp, fp, fn,
       |  CASE WHEN tp + fp = 0 THEN NULL ELSE (tp * 1000000) // (tp + fp) END AS precision_ppm,
       |  CASE WHEN tp + fn = 0 THEN NULL ELSE (tp * 1000000) // (tp + fn) END AS recall_ppm,
       |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f1_ppm
       |FROM agg""".stripMargin
  }

  // the confusion-cell frame feeds both the per-lang totals and the
  // output join; persist so the corpus scan runs once
  private val evalCache = new graft.util.PlanCache(maxEntries = 2)

  // ---- tx42: language-ID evaluation — tx41's harness discipline
  //      applied to the classifier: the full confusion matrix of
  //      tx05's heuristic predictions against the labeled lang
  //      column, one row per (true, predicted) cell with exact
  //      counts, the true-language total, and a floor-scaled ppm
  //      share — per-language accuracy IS the diagonal rows. Pure
  //      int64 arithmetic, so the gate is cell-exact. The matrix is
  //      langs² rows from ONE corpus scan (map-side classify →
  //      cell aggregate; totals re-aggregate the persisted cell
  //      frame and broadcast back). The oracle re-derives the
  //      predictions from the same marker lists tx05's oracle uses
  //      — classifier drift anywhere breaks a cell count. ----
  private def tx42(spark: SparkSession, dir: String): DataFrame = {
    val cells = evalCache.persisted(
      Tables.documents(spark, dir)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("predicted_lang"))
        .groupBy(col("lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n")))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_lang"))
    cells.join(broadcast(totals), "lang")
      .select(col("lang"), col("predicted_lang"), col("n"), col("n_lang"),
        expr("n * 1000000 div n_lang").as("cell_ppm"),
        (col("lang") === col("predicted_lang")).as("is_correct"))
  }

  private val tx42Oracle: String = {
    val markers = TextAnalysis.LangMarkers
    val scoreCols = markers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(str_split(text, ' '), t -> t IN ($inList))) AS s_$lang"
    }.mkString(",\n    ")
    val greatest = markers.map { case (lang, _) => s"s_$lang" }.mkString("greatest(", ", ", ")")
    val byNameDesc = markers.map(_._1).sorted(Ordering[String].reverse)
    val winner = byNameDesc.init.map(l => s"WHEN s_$l = m THEN '$l'")
      .mkString("CASE ", " ", s" ELSE '${byNameDesc.last}' END")
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM documents),
       |p AS (
       |  SELECT lang, $winner AS predicted_lang
       |  FROM (SELECT *, $greatest AS m FROM s) t),
       |cells AS (
       |  SELECT lang, predicted_lang, COUNT(*) AS n
       |  FROM p GROUP BY 1, 2),
       |tot AS (
       |  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
       |  FROM cells GROUP BY 1)
       |SELECT c.lang, c.predicted_lang, c.n, t.n_lang,
       |  (c.n * 1000000) // t.n_lang AS cell_ppm,
       |  c.lang = c.predicted_lang AS is_correct
       |FROM cells c JOIN tot t ON c.lang = t.lang""".stripMargin
  }

  // ---- tx43: char-mass repetition signals — the other two Gopher/
  //      MassiveText repetition filters, complementing tx11's
  //      distinct-vs-total ratio with CHARACTER-WEIGHTED coverage:
  //      (a) the share of a document's characters covered by its
  //      single most-repeated bigram (mode by count, ties broken on
  //      the gram — a run of one repeated phrase scores high even
  //      when the rest of the doc is unique), and (b) the share
  //      covered by ALL 5-grams occurring at least twice (long-span
  //      templating). Both floor-scaled to ppm on integer math and
  //      capped at 1e6 (overlapping grams can nominally exceed the
  //      doc's length). Plan: one explode per gram width into a
  //      (doc_id, gram) count with map-side combine — keys are
  //      doc-scoped so no key can ever be hot — then a per-doc
  //      min(struct) mode pick / conditional sum, and a per-lang
  //      roll-up. Linear in corpus size, no window, no driver state:
  //      the shape survives 100 TB unchanged. ----
  private def tx43(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("total_chars"), col("text"))
    def gramCounts(n: Int) = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), n)).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    // deterministic mode: highest count, then lexicographically
    // smallest gram — min over (−cnt, gram) struct ordering
    val top2 = gramCounts(2)
      .groupBy("doc_id")
      .agg(min(struct((-col("cnt")).as("neg"), col("gram").as("gram"))).as("m"))
      .select(col("doc_id"),
        ((-col("m.neg")) * length(col("m.gram")).cast("long")).as("cov2"))
    val dup5 = gramCounts(5)
      .groupBy("doc_id")
      .agg(sum(when(col("cnt") >= 2,
        col("cnt") * length(col("gram")).cast("long"))).as("cov5"))
    docs.drop("text")
      .join(top2, Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("lang"),
        least(lit(1000000L),
          expr("coalesce(cov2, 0L) * 1000000L div total_chars")).as("top2_ppm"),
        least(lit(1000000L),
          expr("coalesce(cov5, 0L) * 1000000L div total_chars")).as("dup5_ppm"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("top2_ppm") > 200000, 1L).otherwise(0L)).as("flagged_top2"),
        sum(when(col("dup5_ppm") > 300000, 1L).otherwise(0L)).as("flagged_dup5"),
        expr("sum(top2_ppm) div count(1)").as("avg_top2_ppm"),
        expr("sum(dup5_ppm) div count(1)").as("avg_dup5_ppm"))
  }

  private val tx43Oracle =
    """WITH d AS (
      |  SELECT doc_id, lang, length(text) AS total_chars,
      |    str_split(text, ' ') AS ts
      |  FROM documents),
      |g2 AS (
      |  SELECT doc_id, UNNEST(list_transform(range(1, len(ts)),
      |    i -> ts[i] || ' ' || ts[i+1])) AS gram FROM d),
      |c2 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2),
      |t2 AS (
      |  SELECT doc_id, cnt * length(gram) AS cov2 FROM (
      |    SELECT doc_id, gram, cnt, ROW_NUMBER() OVER (
      |      PARTITION BY doc_id ORDER BY cnt DESC, gram) AS rn
      |    FROM c2) z
      |  WHERE rn = 1),
      |g5 AS (
      |  SELECT doc_id, UNNEST(list_transform(range(1, len(ts) - 3),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]
      |      || ' ' || ts[i+4])) AS gram FROM d),
      |c5 AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g5 GROUP BY 1, 2),
      |u5 AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) END) AS BIGINT) AS cov5
      |  FROM c5 GROUP BY 1),
      |p AS (
      |  SELECT d.lang,
      |    LEAST(1000000, COALESCE(t2.cov2, 0) * 1000000 // d.total_chars) AS top2_ppm,
      |    LEAST(1000000, COALESCE(u5.cov5, 0) * 1000000 // d.total_chars) AS dup5_ppm
      |  FROM d LEFT JOIN t2 USING (doc_id) LEFT JOIN u5 USING (doc_id))
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN top2_ppm > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_top2,
      |  CAST(SUM(CASE WHEN dup5_ppm > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_dup5,
      |  CAST(SUM(top2_ppm) AS BIGINT) // COUNT(*) AS avg_top2_ppm,
      |  CAST(SUM(dup5_ppm) AS BIGINT) // COUNT(*) AS avg_dup5_ppm
      |FROM p GROUP BY lang""".stripMargin

  // ---- tx44: BPE merge learning — vocabulary induction, the training
  //      step the tokenizer surface was missing (tx10 APPLIES a fixed
  //      token pattern; this LEARNS the merge table a subword
  //      tokenizer ships). Three merge rounds over the weighted word
  //      vocabulary: corpus touched once by the (word, cnt) aggregate;
  //      every round after that is vocabulary-sized (see
  //      [[graft.text.Bpe]] for the full scale argument). The oracle
  //      independently re-LEARNS the merges — per-round pair counting,
  //      argmax tie-break, and the greedy left-to-right application
  //      (as a list_reduce fold) are all unrolled in SQL, so drift in
  //      either selection or application breaks the gate. ----
  private def bpeWords(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def tx44(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.learnMerges(bpeWords(spark, dir), rounds = 3)

  /** The shared tx44/tx46 oracle chain: the weighted word vocabulary,
    * the char-level v0, and per round r the pair counts (p_r), the
    * argmax winner (b_r), and the greedily re-folded vocabulary
    * (v_r) — the oracle LEARNS the merges independently. */
  private val bpeOracleCtes: String = {
    def round(r: Int) =
      s"""p$r AS (SELECT pair[1] AS a, pair[2] AS b, SUM(cnt) AS n FROM (
         |  SELECT unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)]))
         |    AS pair, cnt
         |  FROM v${r - 1} WHERE len(syms) > 1) GROUP BY 1, 2),
         |b$r AS (SELECT a, b, n FROM p$r ORDER BY n DESC, a, b LIMIT 1),
         |v$r AS (SELECT str_split(list_reduce(syms, (acc, x) -> CASE
         |    WHEN x = b$r.b AND (acc = b$r.a OR ends_with(acc, ' ' || b$r.a))
         |    THEN left(acc, length(acc) - length(b$r.a)) || b$r.a || b$r.b
         |    ELSE acc || ' ' || x END), ' ') AS syms, cnt
         |  FROM v${r - 1}, b$r)""".stripMargin
    s"""w AS (
       |  SELECT word, COUNT(*) AS cnt
       |  FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents)
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1),
       |v0 AS (SELECT regexp_split_to_array(word, '') AS syms, cnt FROM w),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  private val tx44Oracle: String = {
    def row(r: Int) =
      s"""SELECT CAST($r AS INT) AS round, a AS left_sym, b AS right_sym,
         |  a || b AS merged, CAST(n AS BIGINT) AS pair_n FROM b$r""".stripMargin
    s"""WITH $bpeOracleCtes
       |${row(1)}
       |UNION ALL
       |${row(2)}
       |UNION ALL
       |${row(3)}""".stripMargin
  }

  // ---- tx46: the merge table APPLIED — the weighted compression
  //      curve over rounds 0..3 (total corpus symbols and the
  //      floor-scaled average per word occurrence). The inference
  //      half of tx44's training: proves the learned merges actually
  //      shrink the corpus, round by round, with the oracle re-folding
  //      every vocabulary itself. Integer-exact throughout. ----
  private def tx46(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.compressionCurve(bpeWords(spark, dir), rounds = 3)

  private val tx46Oracle: String = {
    def row(r: Int) =
      s"""SELECT CAST($r AS INT) AS round,
         |  CAST(SUM(cnt * len(syms)) AS BIGINT) AS total_syms,
         |  CAST(SUM(cnt * len(syms)) * 1000000 // SUM(cnt) AS BIGINT)
         |    AS avg_syms_ppm FROM v$r""".stripMargin
    s"""WITH $bpeOracleCtes
       |${row(0)}
       |UNION ALL
       |${row(1)}
       |UNION ALL
       |${row(2)}
       |UNION ALL
       |${row(3)}""".stripMargin
  }

  // the (source, word) count frame feeds four downstream aggregates
  // (per-word totals, per-source totals, the corpus total, and the
  // per-pair terms); persist so the corpus scan runs once
  private val driftCache = new graft.util.PlanCache(maxEntries = 2)

  // ---- tx45: per-source token-distribution drift — the "anomalous
  //      source" screen a corpus pipeline runs before a source's docs
  //      enter the mix: for each source, the total variation distance
  //      between ITS token distribution and the REST of the corpus
  //      (leave-one-out, so a big source can't hide inside its own
  //      baseline). dq17 monitors event-value drift between identity
  //      cohorts; this monitors the corpus itself, per source. Exact
  //      and order-free the repo's standard way: the numerator
  //      Σ|o·(T−c) − (t−o)·c| is pure int64 over the common
  //      denominator (absent-word mass folded in closed form:
  //      + c·(T−B) with B = Σ_{w∈s} t_w), and the single double
  //      division happens once per source from exact integers. Scale
  //      shape: the corpus pays ONE (source, word) count aggregate
  //      (persisted); everything after is vocabulary-sized — the
  //      word-keyed totals join, a broadcast 20-row source-totals
  //      frame, and a 1-row corpus total. No row-scale shuffle
  //      anywhere past the first aggregate. ----
  private def tx45(spark: SparkSession, dir: String): DataFrame = {
    val o = driftCache.persisted(
      Tables.documents(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("o")))
    val tw = o.groupBy("word").agg(sum(col("o")).as("tw"))
    val c = o.groupBy("source").agg(sum(col("o")).as("c"))
    val tot = o.agg(sum(col("o")).as("tt"))
    val terms = o.join(tw, "word")
      .join(broadcast(c), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(
        sum(abs(col("o") * (col("tt") - col("c"))
          - (col("tw") - col("o")) * col("c"))).as("a"),
        sum(col("tw")).as("b"))
    terms.join(broadcast(c), "source").crossJoin(broadcast(tot))
      .select(col("source"), col("c").as("n_tokens"),
        (col("a") + col("c") * (col("tt") - col("b"))).as("tvd_num"),
        (lit(2L) * col("c") * (col("tt") - col("c"))).as("tvd_den"),
        ((col("a") + col("c") * (col("tt") - col("b"))).cast(DoubleType) /
          (lit(2L) * col("c") * (col("tt") - col("c"))).cast(DoubleType))
          .as("tvd"))
  }

  private val tx45Oracle =
    """WITH tok AS (
      |  SELECT source, unnest(str_split(text, ' ')) AS word FROM documents),
      |o AS (SELECT source, word, COUNT(*) AS o FROM tok GROUP BY 1, 2),
      |t AS (SELECT word, SUM(o) AS tw FROM o GROUP BY 1),
      |c AS (SELECT source, SUM(o) AS c FROM o GROUP BY 1),
      |tot AS (SELECT SUM(o) AS tt FROM o),
      |terms AS (
      |  SELECT o.source,
      |    SUM(ABS(o.o * (tot.tt - c.c) - (t.tw - o.o) * c.c)) AS a,
      |    SUM(t.tw) AS b
      |  FROM o JOIN t USING (word) JOIN c USING (source) CROSS JOIN tot
      |  GROUP BY 1)
      |SELECT terms.source, CAST(c.c AS BIGINT) AS n_tokens,
      |  CAST(a + c.c * (tot.tt - b) AS BIGINT) AS tvd_num,
      |  CAST(2 * c.c * (tot.tt - c.c) AS BIGINT) AS tvd_den,
      |  CAST(CAST(a + c.c * (tot.tt - b) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(2 * c.c * (tot.tt - c.c) AS BIGINT) AS DOUBLE) AS tvd
      |FROM terms JOIN c USING (source) CROSS JOIN tot""".stripMargin

  // ---- tx47: vocabulary-growth (Heaps' law) curve — the is-more-data-
  //      still-worth-ingesting readout: partition the corpus into ten
  //      deterministic identity-keyed slices (the tx19 md5 trick, so
  //      the curve is a pure function of document identity, stable
  //      under reruns and repartitioning), and count how many DISTINCT
  //      bigrams appear for the FIRST time in each slice. A healthy
  //      growing corpus keeps minting new vocabulary (Heaps' law,
  //      n_new ~ K·N^beta); a saturated or template-dominated one goes
  //      flat — the curve is the standard value-of-data diagnostic
  //      before paying for another crawl. Bigram grain, not word
  //      grain: the fixtures draw words from a closed lexicon, so the
  //      word curve saturates in slice 0 by construction, while the
  //      combinatorial bigram space keeps growing — exactly the
  //      template-vs-novelty contrast the curve exists to show (and
  //      the same grain tx27's corpus-health n-grams use). Scale
  //      shape: shingling is the native map-side expression;
  //      first-slice-per-bigram is ONE vocabulary-grain exchange
  //      (groupBy gram, MIN slice — map-side partial min collapses
  //      each partition to its distinct grams first); the per-slice
  //      counts, the ten-row spine (slices with zero new vocabulary
  //      stay on the curve as explicit zeros), and the cumulative sum
  //      all run over TEN rows. Nothing corpus-sized shuffles. ----
  private def tx47(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = Tables.documents(spark, dir)
      .select(
        pmod(conv(substring(md5(concat(lit("growth:"),
          col("doc_id").cast(StringType))), 1, 4), 16, 10).cast(IntegerType),
          lit(10)).as("slice"),
        explode(Dedup.shingles(col("text"), w = 2)).as("gram"))
      .filter(col("gram").isNotNull)
    val first = grams.groupBy(col("gram")).agg(min(col("slice")).as("slice"))
    val perSlice = first.groupBy(col("slice")).agg(count(lit(1)).as("n"))
    spark.range(0, 10).select(col("id").cast(IntegerType).as("slice"))
      .join(perSlice, Seq("slice"), "left")
      .select(col("slice"), coalesce(col("n"), lit(0L)).as("new_grams"))
      .withColumn("cum_vocab",
        sum(col("new_grams")).over(
          Window.orderBy(col("slice")).rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
  }

  private val tx47Oracle =
    """WITH b AS (
      |  SELECT CAST(('0x' || substr(md5('growth:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 10 AS slice,
      |    str_split(text, ' ') AS ts
      |  FROM documents),
      |g AS (SELECT slice, UNNEST(list_transform(range(1, len(ts)),
      |        i -> ts[i] || ' ' || ts[i+1])) AS gram FROM b),
      |f AS (SELECT gram, MIN(slice) AS slice FROM g GROUP BY 1),
      |p AS (SELECT slice, COUNT(*) AS n FROM f GROUP BY 1),
      |s AS (SELECT UNNEST(generate_series(0, 9)) AS slice),
      |c AS (SELECT CAST(s.slice AS INTEGER) AS slice,
      |        CAST(COALESCE(p.n, 0) AS BIGINT) AS new_grams
      |      FROM s LEFT JOIN p ON p.slice = s.slice)
      |SELECT slice, new_grams,
      |  CAST(SUM(new_grams) OVER (ORDER BY slice ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS cum_vocab
      |FROM c""".stripMargin

  // ---- tx48: BPE ENCODE — the learned merge table applied to every
  //      document, emitting token ids (chars 'a'..'z' → 0..25, the
  //      round-r merged symbol → 25+r), surfaced per document as exact
  //      integer invariants of the id sequence: count, sum, and the
  //      position-weighted dot Σ i·id_i (order-sensitive, so a correct
  //      multiset in the wrong order still fails). The one tokenizer
  //      stage a training run cannot skip, and the link between tx44's
  //      learner and tx49's packing. The oracle is fully independent:
  //      it re-LEARNS the three merges (the shared tx44 chain) and
  //      re-APPLIES them per word with the same nested list_reduce
  //      fold, so drift in selection, application order, or the id
  //      mapping all break the gate. Scale shape: the merge table is
  //      ONE broadcast row; encoding is map-only (see [[Bpe.encode]]).
  //      ----
  private def tx48(spark: SparkSession, dir: String): DataFrame =
    graft.text.Bpe.encode(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        col("text"), bpeWords(spark, dir), rounds = 3)
      .select(col("doc_id"),
        size(col("token_ids")).cast(LongType).as("n_tokens"),
        aggregate(col("token_ids"), lit(0L),
          (acc, x) => acc + x.cast(LongType)).as("token_sum"),
        when(size(col("token_ids")) === 0, lit(0L))
          .otherwise(aggregate(
            zip_with(col("token_ids"),
              sequence(lit(1L), size(col("token_ids")).cast(LongType)),
              (x, i) => x.cast(LongType) * i),
            lit(0L), (acc, x) => acc + x)).as("token_dot"))

  /** The shared tx48/tx49 oracle chain: tx44's re-learned merges b1..b3
    * plus the per-document encode — every eligible word's char array
    * folded through the three merges in rank order (the same
    * list_reduce fold the learner's v_r CTEs use, nested inline), then
    * mapped to ids. CASE order mirrors the engine's first-match id
    * tie-break. */
  private val bpeEncodeCtes: String = {
    def fold(r: Int, inner: String) =
      s"""str_split(list_reduce($inner, (acc, x) -> CASE
         |    WHEN x = b$r.b AND (acc = b$r.a OR ends_with(acc, ' ' || b$r.a))
         |    THEN left(acc, length(acc) - length(b$r.a)) || b$r.a || b$r.b
         |    ELSE acc || ' ' || x END), ' ')""".stripMargin
    val encWord = fold(3, fold(2, fold(1, "regexp_split_to_array(w, '')")))
    s"""$bpeOracleCtes,
       |enc AS (
       |  SELECT doc_id, flatten(list_transform(
       |    list_filter(str_split(text, ' '), w -> regexp_matches(w, '^[a-z]+$$')),
       |    w -> list_transform($encWord, s -> CASE
       |      WHEN length(s) = 1 THEN ascii(s) - 97
       |      WHEN s = b1.a || b1.b THEN 26
       |      WHEN s = b2.a || b2.b THEN 27
       |      ELSE 28 END))) AS ids
       |  FROM documents, b1, b2, b3)""".stripMargin
  }

  private val tx48Oracle =
    s"""WITH $bpeEncodeCtes
       |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(list_sum(ids), 0) AS BIGINT) AS token_sum,
       |  CAST(COALESCE(list_sum(list_transform(
       |    list_zip(ids, range(1, len(ids) + 1)), p -> p[1] * p[2])), 0)
       |    AS BIGINT) AS token_dot
       |FROM enc""".stripMargin

  // ---- tx49: sequence packing on REAL token ids — tx28's packing
  //      re-pointed at the encoder: documents concatenate in the same
  //      reproducible identity-keyed order, but each document's budget
  //      contribution is len(token_ids) from tx48's BPE encode, not
  //      the whitespace proxy. Same distributed prefix sum; only
  //      (id, draw, n_tokens) metadata ever shuffles — the encode
  //      itself is map-only, so packing 100 TB still costs one range
  //      exchange. ----
  private def tx49(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 2048
    val keyed = graft.text.Bpe.encode(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        col("text"), bpeWords(spark, dir), rounds = 3)
      .select(col("doc_id"),
        size(col("token_ids")).cast(LongType).as("n_tokens"),
        md5(concat(lit("pack:"), col("doc_id").cast(StringType))).as("draw"))
    graft.ops.Relational.runningTotal(keyed,
        order = Seq(col("draw"), col("doc_id")), value = col("n_tokens"),
        outName = "cum_tokens")
      .select(col("doc_id"), col("n_tokens"),
        (col("cum_tokens") - col("n_tokens")).as("start_offset"),
        floor((col("cum_tokens") - col("n_tokens")) / seqLen).as("seq_id"))
  }

  private val tx49Oracle =
    s"""WITH $bpeEncodeCtes,
       |r AS (
       |  SELECT doc_id, len(ids) AS n_tokens,
       |    SUM(len(ids)) OVER (
       |      ORDER BY md5('pack:' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM enc)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
       |  CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id
       |FROM r""".stripMargin

  // ---- tx50: leakage-safe (dedup-aware) train/test split — tx19's
  //      identity-keyed split has a blind spot a training pipeline
  //      cannot afford: near-duplicate documents hash to independent
  //      buckets, one twin lands in train and the other in test, and
  //      the eval set silently leaks (the GPT-3-style decontamination
  //      problem, but self-inflicted at split time). The fix: hash the
  //      CLUSTER, not the document — close the exact near-dup pairs
  //      into clusters (tx20's min-label propagation), treat unpaired
  //      docs as singleton clusters (cluster = own id), and derive the
  //      bucket from md5("csplit:" || cluster), so every member of a
  //      cluster moves together by construction, in any engine, under
  //      any repartition. Scale shape: the assignment is linear — one
  //      doc-grain left join of the dup-docs-only cluster frame onto
  //      the corpus (unhinted: AQE broadcasts it while dup clusters
  //      are small, falls back to a shuffle join on a dup-heavy crawl)
  //      plus a map-side hash. Pair DISCOVERY cost belongs to the
  //      dedup operators (bucketed tx06/nearDupPairs at scale); the
  //      gated source is the tx13 exactness anchor so DuckDB closes
  //      the identical graph with its own recursive CTE. ----
  private def tx50(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.connectedComponents(
        Dedup.allPairsJaccard(Tables.documents(spark, dir), "doc_id", "text",
          minJaccard = 0.7),
        "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster").as("__cl"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("__cl"), col("doc_id")))
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(lit("csplit:"),
          col("cluster").cast(StringType))), 1, 4), 16, 10).cast(IntegerType),
          lit(100)))
      .withColumn("split",
        when(col("bucket") < 98, lit("train"))
          .when(col("bucket") === 98, lit("valid"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("cluster"), col("bucket"), col("split"))
  }

  private val tx50Oracle =
    s"""WITH RECURSIVE $dupClosureCtes,
       |cl AS (SELECT id AS doc_id, MIN(r) AS cluster FROM reach GROUP BY id),
       |a AS (
       |  SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
       |b AS (
       |  SELECT doc_id, cluster,
       |    CAST(('0x' || substr(md5('csplit:' || CAST(cluster AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bucket
       |  FROM a)
       |SELECT doc_id, cluster, bucket,
       |  CASE WHEN bucket < 98 THEN 'train' WHEN bucket = 98 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM b""".stripMargin

  // ---- tx51: reference-LM perplexity filtering — the CCNet recipe
  //      tx31 deliberately stopped short of: train an add-one-smoothed
  //      bigram LM on a REFERENCE slice (the `en` documents — the
  //      "wikipedia" of this corpus), score EVERY document's
  //      cross-entropy against it, and flag documents whose mean NLL
  //      sits above 1.25× the reference slice's own mean — the
  //      "perplexity band" filter, which doubles as language ID here
  //      (non-en word salad is maximally surprising to an en LM).
  //      tx31's caution about ln() (libm last-ulp divergence breaking
  //      cell-exact gates) is answered, not ignored: each bigram's
  //      log-probability is scaled and rounded to an INTEGER
  //      (round(-1e4·ln P), half-away-from-zero in both engines)
  //      BEFORE any accumulation, so the per-document sum is exact
  //      64-bit arithmetic — order-free across partitions — and the
  //      only cross-engine surface is whether a single bigram's
  //      1e4-scaled log sits within ~1e-10 of a rounding boundary
  //      (probability ~2e-10 per distinct bigram, and a hit fails the
  //      gate loudly rather than silently). Scale shape: the LM
  //      tables are vocabulary-bounded (tx12's broadcast argument —
  //      c1 derives from c2, so prefix totals are structurally
  //      consistent), the corpus joins them map-side, and the only
  //      corpus-sized exchange is the one doc-grain aggregate; the
  //      reference band is a 1-row broadcast. The band itself is
  //      RANK-relative, not moment-relative (the fixture's languages
  //      share a vocabulary, so a 1.25×-mean band never fires; CCNet's
  //      head/middle/tail cut is rank-based for the same reason):
  //      flagged = mean NLL above the reference slice's own exact p95,
  //      computed with dq07's percentile machinery — per-value counts,
  //      one range exchange, MIN(value | cum ≥ ceil(0.95·n)) — so the
  //      threshold is a COPY of an input rational, never a float
  //      accumulation. ----
  private val lmCache = new graft.util.PlanCache(maxEntries = 2)

  private def tx51(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(Dedup.shingles(col("text"), w = 2)).as("gram"))
    val c2 = grams.filter(col("lang") === "en")
      .groupBy("gram").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("gram"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val vocab = docs.filter(col("lang") === "en")
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // No broadcast hints on c2/c1: bigram TYPE counts grow roughly
    // linearly with corpus size (unlike a unigram lexicon), so a
    // static hint is the same latent OOM the r16 applyChangeFeed fix
    // removed from the CDC join — at THIS fixture's vocabulary AQE
    // upgrades both joins to broadcasts at runtime (pinned on the
    // finalized plan in PlanShapeSpec), and at a 100-TB vocabulary it
    // degrades to a shuffle join instead of killing the driver.
    val perDoc = lmCache.persisted(grams
      .join(c2, Seq("gram"), "left")
      .withColumn("w1", substring_index(col("gram"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("lang"),
        round(lit(-10000.0) * log(
          (coalesce(col("c2"), lit(0L)) + 1L).cast(DoubleType) /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)))
          .cast(LongType).as("s"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("total_nll"))
      .withColumn("mean_nll",
        col("total_nll").cast(DoubleType) / col("n_bigrams").cast(DoubleType)))
    val refCounts = perDoc.filter(col("lang") === "en")
      .groupBy(col("mean_nll")).agg(count(lit(1)).as("cnt"))
    val refN = refCounts.agg(sum(col("cnt")).as("n"))
    val thr = graft.ops.Relational.runningTotal(refCounts,
        Seq(col("mean_nll")), col("cnt"), "cum")
      .crossJoin(broadcast(refN))
      .agg(min(when(col("cum") >=
          ceil(lit(0.95) * col("n").cast(DoubleType)).cast(LongType),
        col("mean_nll"))).as("ref_p95"))
    perDoc.crossJoin(broadcast(thr))
      .withColumn("flagged", col("mean_nll") > col("ref_p95"))
  }

  private val tx51Oracle =
    """WITH toks AS (SELECT doc_id, lang, str_split(text, ' ') AS ts FROM documents),
      |g AS (SELECT doc_id, lang, UNNEST(list_transform(range(1, len(ts)),
      |        i -> ts[i] || ' ' || ts[i+1])) AS gram FROM toks),
      |c2 AS (SELECT gram, COUNT(*) AS c2 FROM g WHERE lang = 'en' GROUP BY 1),
      |c1 AS (SELECT str_split(gram, ' ')[1] AS w1, SUM(c2) AS c1 FROM c2 GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT w) AS v FROM (
      |        SELECT UNNEST(ts) AS w FROM toks WHERE lang = 'en') t),
      |s AS (
      |  SELECT g.doc_id, g.lang,
      |    CAST(ROUND(-10000.0 * ln(
      |      CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)
      |        / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE))) AS BIGINT) AS s
      |  FROM g LEFT JOIN c2 USING (gram)
      |    LEFT JOIN c1 ON c1.w1 = str_split(g.gram, ' ')[1]
      |    CROSS JOIN v),
      |d AS (
      |  SELECT doc_id, lang, COUNT(*) AS n_bigrams,
      |    CAST(SUM(s) AS BIGINT) AS total_nll
      |  FROM s GROUP BY 1, 2),
      |rc AS (
      |  SELECT CAST(total_nll AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS mean_nll,
      |    COUNT(*) AS cnt
      |  FROM d WHERE lang = 'en' GROUP BY 1),
      |rn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM rc),
      |cu AS (
      |  SELECT mean_nll,
      |    CAST(SUM(cnt) OVER (ORDER BY mean_nll
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM rc),
      |thr AS (
      |  SELECT MIN(CASE WHEN cu.cum >=
      |      CAST(CEIL(0.95 * CAST(rn.n AS DOUBLE)) AS BIGINT)
      |    THEN cu.mean_nll END) AS ref_p95
      |  FROM cu, rn)
      |SELECT d.doc_id, d.lang, d.n_bigrams, d.total_nll,
      |  CAST(d.total_nll AS DOUBLE) / CAST(d.n_bigrams AS DOUBLE) AS mean_nll,
      |  thr.ref_p95,
      |  CAST(d.total_nll AS DOUBLE) / CAST(d.n_bigrams AS DOUBLE)
      |    > thr.ref_p95 AS flagged
      |FROM d, thr""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("tx01_token_stats", tx01, Some(tx01Oracle)),
    GraftQuery("tx02_text_quality", tx02, Some(tx02Oracle), headline = true),
    GraftQuery("tx03_fingerprint", tx03, Some(tx03Oracle)),
    GraftQuery("tx04_dedup_exact", tx04, Some(tx04Oracle)),
    GraftQuery("tx05_langid", tx05, Some(tx05Oracle)),
    GraftQuery("tx06_near_dup_pairs", tx06, None, headline = true,
      oracleGen = Some(tx06OracleGen)),
    GraftQuery("tx07_simhash", tx07, None, oracleGen = Some(tx07OracleGen)),
    GraftQuery("tx08_ngram_jaccard", tx08, Some(tx08Oracle)),
    GraftQuery("tx09_simhash_near_dup",
      // count-adaptive banding: grouped pairs over 2^16 keys at the
      // gate tiers, triples/quadruples over >= 2^21 keys past ~66k
      // docs (output is banding-independent; see hammingNearDupsAuto)
      (s, d) => Dedup.simHashNearDupsAuto(Tables.documents(s, d), "doc_id",
        "text", maxHamming = 6),
      None, oracleGen = Some(simhashHammingOracleGen)),
    GraftQuery("tx10_bpe_tokens", tx10, Some(tx10Oracle)),
    GraftQuery("tx11_repetition", tx11, Some(tx11Oracle)),
    GraftQuery("tx12_tfidf_terms", tx12, Some(tx12Oracle)),
    GraftQuery("tx13_jaccard_ground_truth", tx13, Some(tx13Oracle)),
    GraftQuery("tx14_corpus_prep", tx14, Some(tx14Oracle), headline = true),
    GraftQuery("tx15_lsh_cap_witness", tx15, Some(tx15Oracle)),
    GraftQuery("tx16_simhash_truth", tx16, None,
      oracleGen = Some(simhashHammingOracleGen)),
    GraftQuery("tx17_decontam", tx17, Some(tx17Oracle)),
    GraftQuery("tx18_mixture_fill", tx18, Some(tx18Oracle)),
    GraftQuery("tx19_split_assign", tx19, Some(tx19Oracle)),
    GraftQuery("tx20_dedup_clusters", tx20, Some(tx20Oracle)),
    GraftQuery("tx21_stratified_sample", tx21, Some(tx21Oracle)),
    GraftQuery("tx22_incremental_neardup", tx22, None,
      oracleGen = Some(tx22OracleGen)),
    GraftQuery("tx23_balanced_shards", tx23, Some(tx23Oracle)),
    GraftQuery("tx24_upsample", tx24, Some(tx24Oracle)),
    GraftQuery("tx25_filter_battery", tx25, Some(tx25Oracle)),
    GraftQuery("tx26_corpus_prep_v2", tx26, Some(tx26Oracle)),
    GraftQuery("tx27_ngram_stats", tx27, Some(tx27Oracle)),
    GraftQuery("tx28_sequence_pack", tx28, Some(tx28Oracle)),
    GraftQuery("tx29_corpus_delivery", tx29, Some(tx29Oracle)),
    GraftQuery("tx30_context_chunks", tx30, Some(tx30Oracle)),
    GraftQuery("tx31_bigram_rarity", tx31, Some(tx31Oracle)),
    GraftQuery("tx32_fuzzy_dedup", tx32, Some(tx32Oracle)),
    GraftQuery("tx33_search_rank", tx33, Some(tx33Oracle)),
    GraftQuery("tx34_pii_redaction", tx34, Some(tx34Oracle)),
    GraftQuery("tx35_segment_dedup", tx35, Some(tx35Oracle), headline = true),
    GraftQuery("tx36_bm25_rank", tx36, Some(tx36Oracle)),
    GraftQuery("tx37_substring_dedup", tx37, Some(tx37Oracle)),
    GraftQuery("tx38_containment_pairs", tx38, Some(tx38Oracle)),
    GraftQuery("tx39_collocations", tx39, Some(tx39Oracle)),
    GraftQuery("tx40_source_boilerplate", tx40, Some(tx40Oracle)),
    GraftQuery("tx41_dedup_eval", tx41, None,
      oracleGen = Some(tx41OracleGen)),
    GraftQuery("tx42_langid_eval", tx42, Some(tx42Oracle)),
    GraftQuery("tx43_char_repetition", tx43, Some(tx43Oracle)),
    GraftQuery("tx44_bpe_merges", tx44, Some(tx44Oracle)),
    GraftQuery("tx45_source_drift", tx45, Some(tx45Oracle), headline = true),
    GraftQuery("tx46_bpe_compression", tx46, Some(tx46Oracle)),
    GraftQuery("tx47_vocab_growth", tx47, Some(tx47Oracle)),
    GraftQuery("tx48_bpe_encode", tx48, Some(tx48Oracle)),
    GraftQuery("tx49_token_pack", tx49, Some(tx49Oracle)),
    GraftQuery("tx50_cluster_split", tx50, Some(tx50Oracle)),
    GraftQuery("tx51_lm_score", tx51, Some(tx51Oracle)))

}
