package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.similarity.Similarity
import graft.sources.Tables

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). Query set = vec_id < 10 (fixed, so results are stable
  * across scale factors for the same ids). */
object SimilarityQueries {

  private val Dim = 64

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).filter(col("id") < 10)

  // ---- sim01: exact brute-force cosine top-5 ----
  private def sim01(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(emb(spark, dir), queriesDf(spark, dir), k = 5)
      .select("query_id", "cand_id", "cosine", "rank")

  private val sim01Oracle =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
      |  GROUP BY query_id, cand_id),
      |scored AS (
      |  SELECT p.query_id, p.cand_id,
      |    ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
      |  FROM pairs p
      |  JOIN norms nq ON nq.vec_id = p.query_id
      |  JOIN norms nc ON nc.vec_id = p.cand_id)
      |SELECT query_id, cand_id, cosine, rank FROM (
      |  SELECT query_id, cand_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  /**
   * DuckDB SQL computing the same seeded hyperplane bucket as
   * [[Similarity.hyperplaneSignature]]: each ±1 plane renders as an
   * explicit +/- term chain over the double-cast elements, so the
   * addition order matches the native DotProduct's sequential fold
   * bit-for-bit (x·(+1.0)=x and a+(−x)=a−x are exact in IEEE).
   */
  private def sigCte(bits: Int): String =
    s"sig AS (SELECT vec_id, (${sigSql(Similarity.hyperplanes(Dim, bits), embTerms(Dim))}) AS bucket FROM embeddings)"

  /** The ±1-plane sign-chain renderer behind [[sigCte]], generalized
    * over the per-dimension element SQL (so the augmented-MIPS and
    * prefix-funnel oracles hash exactly the vectors the engine hashes).
    * `terms` shorter than the planes truncates the chain — the
    * augmented-query case, where the appended coordinate is 0 and a
    * ±0.0 term can never change a signature bit. */
  private def sigSql(planes: Seq[Array[Double]], terms: Seq[String]): String =
    planes.zipWithIndex.map { case (h, i) =>
      val chain = h.zip(terms).map { case (w, t) =>
        val sign = if (w > 0) "+" else "-"
        s" $sign $t"
      }.mkString
      s"CASE WHEN (0.0$chain) > 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")

  private def embTerms(n: Int): Seq[String] =
    (0 until n).map(j => s"CAST(embedding[${j + 1}] AS DOUBLE)")

  private val normsCte =
    """norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id)""".stripMargin

  // ---- sim02: LSH-bucketed approximate top-3; the oracle recomputes
  //      the identical seeded signatures from generated plane literals ----
  private def sim02(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(emb(spark, dir), queriesDf(spark, dir), k = 3, dim = Dim,
      bits = 6)
      .select("query_id", "cand_id", "cosine", "rank")

  private val sim02Oracle =
    s"""WITH ${sigCte(6)},
       |$normsCte,
       |pairs AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM embeddings q
       |    JOIN sig sq ON sq.vec_id = q.vec_id
       |    JOIN sig sc ON sc.bucket = sq.bucket
       |    JOIN embeddings c ON c.vec_id = sc.vec_id
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
       |  GROUP BY query_id, cand_id),
       |scored AS (
       |  SELECT p.query_id, p.cand_id, ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
       |  FROM pairs p
       |  JOIN norms nq ON nq.vec_id = p.query_id
       |  JOIN norms nc ON nc.vec_id = p.cand_id)
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 3""".stripMargin

  // ---- sim03: per-label vector statistics ----
  private def sim03(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"),
        Similarity.l2Norm(Similarity.toDoubleVec(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("nrm")), 4).as("avg_norm"),
        round(min(col("nrm")), 4).as("min_norm"),
        round(max(col("nrm")), 4).as("max_norm"))

  private val sim03Oracle =
    """WITH norms AS (
      |  SELECT vec_id, label, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, label, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id, label)
      |SELECT label, COUNT(*) AS n_vecs,
      |  ROUND(AVG(nrm), 4) AS avg_norm,
      |  ROUND(MIN(nrm), 4) AS min_norm,
      |  ROUND(MAX(nrm), 4) AS max_norm
      |FROM norms GROUP BY label""".stripMargin

  // ---- sim04: embedding-cosine near-duplicate pairs (exact mode —
  //      oracle-checkable; the LSH-bucketed mode is sim02's machinery) ----
  private def sim04(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(spark, dir), threshold = 0.3, dim = Dim)

  private val sim04Oracle =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT id_a, id_b, SUM(xa * xb) AS dot FROM (
      |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |      CAST(UNNEST(a.embedding) AS DOUBLE) AS xa,
      |      CAST(UNNEST(b.embedding) AS DOUBLE) AS xb
      |    FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) z
      |  GROUP BY id_a, id_b)
      |SELECT p.id_a, p.id_b, ROUND(p.dot / (na.nrm * nb.nrm), 4) AS cosine
      |FROM pairs p
      |JOIN norms na ON na.vec_id = p.id_a
      |JOIN norms nb ON nb.vec_id = p.id_b
      |WHERE ROUND(p.dot / (na.nrm * nb.nrm), 4) >= 0.3""".stripMargin

  // ---- sim06: the sub-quadratic near-dup SCALE path (bucketed mode of
  //      the same function behind sim04): pairs restricted to a shared
  //      4-bit hyperplane bucket before scoring — O(Σ bucket²) instead
  //      of O(n²). The oracle recomputes the identical buckets, so this
  //      entry is exact, not rows-only. ----
  private def sim06(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(spark, dir), threshold = 0.3, dim = Dim, bits = 4)

  private val sim06Oracle =
    s"""WITH ${sigCte(4)},
       |$normsCte,
       |pairs AS (
       |  SELECT id_a, id_b, SUM(xa * xb) AS dot FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |      CAST(UNNEST(a.embedding) AS DOUBLE) AS xa,
       |      CAST(UNNEST(b.embedding) AS DOUBLE) AS xb
       |    FROM embeddings a
       |    JOIN sig sa ON sa.vec_id = a.vec_id
       |    JOIN sig sb ON sb.bucket = sa.bucket
       |    JOIN embeddings b ON b.vec_id = sb.vec_id
       |    WHERE a.vec_id < b.vec_id) z
       |  GROUP BY id_a, id_b)
       |SELECT p.id_a, p.id_b, ROUND(p.dot / (na.nrm * nb.nrm), 4) AS cosine
       |FROM pairs p
       |JOIN norms na ON na.vec_id = p.id_a
       |JOIN norms nb ON nb.vec_id = p.id_b
       |WHERE ROUND(p.dot / (na.nrm * nb.nrm), 4) >= 0.3""".stripMargin

  /**
   * sim05 oracle — the sim02 literal-rendering trick applied to FITTED
   * parameters: the IVF quantizer is deterministic (seeded sample,
   * seeded k-means, fixed iterations), so the centroids fitted from the
   * data at `dir` render as double literals (Java shortest round-trip
   * repr → DuckDB parses back the identical bits) and the whole IVF
   * path — cell assignment, nProbe probing, cosine scoring, top-k —
   * becomes plain SQL.
   *
   * Exactness: the squared-distance chains are rendered left-assoc
   * `0.0 + t1 + t2 + …`, matching the Spark side's sequential
   * `aggregate(zip_with(...))` fold bit-for-bit; dot/norm reuse the
   * sim01 machinery. A pair meeting in several probed cells scores
   * identically in each, so Spark's max-over-cells equals the oracle's
   * DISTINCT meeting set.
   */
  /** The fitted-centroid cell CTEs shared by sim05/io03's oracle and
    * io04's: `dists → ranked → cand_cell → probe → meet` — nearest-cell
    * assignment, 4-cell probing, and the DISTINCT probed-pair set,
    * rendered from the memoized deterministic quantizer. */
  private def ivfMeetCtes(spark: SparkSession, dir: String): String = {
    val cents = graft.similarity.Similarity.fitCentroids(emb(spark, dir))
    // Double.toString is the shortest decimal that round-trips; wrap in
    // parens so negative literals survive the surrounding arithmetic
    val distBranches = cents.zipWithIndex.map { case (c, cell) =>
      val chain = c.zipWithIndex.map { case (w, j) =>
        s" + (CAST(embedding[${j + 1}] AS DOUBLE) - ($w)) * (CAST(embedding[${j + 1}] AS DOUBLE) - ($w))"
      }.mkString
      s"SELECT vec_id, $cell AS cell, (0.0$chain) AS dist FROM embeddings"
    }.mkString("\n  UNION ALL ")
    s"""dists AS (
       |  $distBranches),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |  FROM dists),
       |cand_cell AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
       |probe AS (SELECT vec_id, cell FROM ranked WHERE rn <= 4 AND vec_id < 10),
       |meet AS (
       |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS cand_id
       |  FROM probe p JOIN cand_cell c ON c.cell = p.cell AND c.vec_id <> p.vec_id)""".stripMargin
  }

  private[queries] def sim05OracleGen(spark: SparkSession, dir: String): String = {
    s"""WITH ${ivfMeetCtes(spark, dir)},
       |$normsCte,
       |pairs AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
       |    SELECT m.query_id, m.cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM meet m
       |    JOIN embeddings q ON q.vec_id = m.query_id
       |    JOIN embeddings c ON c.vec_id = m.cand_id) z
       |  GROUP BY query_id, cand_id),
       |scored AS (
       |  SELECT p.query_id, p.cand_id, ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
       |  FROM pairs p
       |  JOIN norms nq ON nq.vec_id = p.query_id
       |  JOIN norms nc ON nc.vec_id = p.cand_id)
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  /**
   * io04 oracle — the composed quantized IVF store: [[ivfMeetCtes]]
   * picks the probed (query, candidate) pairs exactly as sim05/io03,
   * then sim08's quantized CTEs (per-vector int8 codes, bigint squared
   * norms, bigint dot) score them. Every quantized partial is an
   * integer ≪ 2^53, so the scoring is exact regardless of summation
   * order — the composed oracle inherits determinism from both parents
   * with no new caveats.
   */
  private[queries] def io04OracleGen(spark: SparkSession, dir: String): String = {
    s"""WITH ${ivfMeetCtes(spark, dir)},
       |s AS (
       |  SELECT vec_id,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |  FROM embeddings),
       |q AS (
       |  SELECT e.vec_id,
       |    list_transform(e.embedding, x -> CASE WHEN s.scale = 0 THEN 0
       |      ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS INT) END) AS qv
       |  FROM embeddings e JOIN s ON s.vec_id = e.vec_id),
       |n2 AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS DOUBLE) AS n2
       |  FROM q),
       |qpairs AS (
       |  SELECT query_id, cand_id, CAST(SUM(CAST(xa AS BIGINT) * xb) AS DOUBLE) AS dotq
       |  FROM (
       |    SELECT m.query_id, m.cand_id, UNNEST(a.qv) AS xa, UNNEST(b.qv) AS xb
       |    FROM meet m
       |    JOIN q a ON a.vec_id = m.query_id
       |    JOIN q b ON b.vec_id = m.cand_id) z
       |  GROUP BY query_id, cand_id),
       |scored AS (
       |  SELECT p.query_id, p.cand_id,
       |    ROUND(p.dotq / SQRT(na.n2 * nb.n2), 4) AS cosine
       |  FROM qpairs p
       |  JOIN n2 na ON na.vec_id = p.query_id
       |  JOIN n2 nb ON nb.vec_id = p.cand_id)
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  // ---- sim07: int8 scalar quantization — the 4× storage compression
  //      every web-scale vector corpus applies before ANN. Per-vector
  //      summary (scale + integer stats) so the whole quantization is
  //      cell-exact under the oracle: integer outputs, and the scale's
  //      derivation uses only exact ops (max of |x|, one division). ----
  private def sim07(spark: SparkSession, dir: String): DataFrame = {
    val q = Similarity.quantizeInt8(col("embedding"))
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      q.getField("scale").as("scale"),
      aggregate(q.getField("q"), lit(0L), (a, x) => a + x).as("q_sum"),
      array_min(q.getField("q")).as("q_min"),
      array_max(q.getField("q")).as("q_max"))
  }

  private val sim07Oracle =
    """WITH s AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT e.vec_id, s.scale,
      |    list_transform(e.embedding, x -> CASE WHEN s.scale = 0 THEN 0
      |      ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS INT) END) AS qv
      |  FROM embeddings e JOIN s ON s.vec_id = e.vec_id)
      |SELECT vec_id, scale,
      |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
      |  list_min(qv) AS q_min,
      |  list_max(qv) AS q_max
      |FROM q""".stripMargin

  // ---- sim08: ANN over the QUANTIZED vectors. The elegant property:
  //      per-vector scales cancel in the cosine (cos = dotq /
  //      √(Σqa²·Σqb²)), so scoring is pure integer arithmetic promoted
  //      to double — exact regardless of summation order (every
  //      partial ≪ 2^53), hence bit-identical across engines with no
  //      sequential-fold caveat at all. ----
  private def sim08(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val base = emb(spark, dir).select(col("id"),
        Similarity.quantizeInt8(col("vec")).getField("q").as("q"))
      .withColumn("qd", transform(col("q"), _.cast(DoubleType)))
      .withColumn("n2", Similarity.dot(col("qd"), col("qd")))
    val cand = base.select(col("id").as("cand_id"), col("qd").as("cq"), col("n2").as("cn2"))
    val qs = base.filter(col("id") < 10)
      .select(col("id").as("query_id"), col("qd").as("qq"), col("n2").as("qn2"))
    val scored = cand.join(broadcast(qs), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Similarity.dot(col("qq"), col("cq")) / sqrt(col("qn2") * col("cn2")), 4)
          .as("cosine"))
    graft.ops.Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("cand_id")), 5, rankName = "rank")
      .select("query_id", "cand_id", "cosine", "rank")
  }

  private val sim08Oracle =
    """WITH s AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      |  FROM embeddings),
      |q AS (
      |  SELECT e.vec_id,
      |    list_transform(e.embedding, x -> CASE WHEN s.scale = 0 THEN 0
      |      ELSE CAST(floor(CAST(x AS DOUBLE) / s.scale + 0.5) AS INT) END) AS qv
      |  FROM embeddings e JOIN s ON s.vec_id = e.vec_id),
      |n2 AS (
      |  SELECT vec_id,
      |    CAST(list_sum(list_transform(qv, x -> CAST(x AS BIGINT) * x)) AS DOUBLE) AS n2
      |  FROM q),
      |pairs AS (
      |  SELECT query_id, cand_id, CAST(SUM(CAST(xa AS BIGINT) * xb) AS DOUBLE) AS dotq
      |  FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
      |      UNNEST(a.qv) AS xa, UNNEST(b.qv) AS xb
      |    FROM q a JOIN q b ON b.vec_id <> a.vec_id
      |    WHERE a.vec_id < 10) z
      |  GROUP BY query_id, cand_id),
      |scored AS (
      |  SELECT p.query_id, p.cand_id,
      |    ROUND(p.dotq / SQRT(na.n2 * nb.n2), 4) AS cosine
      |  FROM pairs p
      |  JOIN n2 na ON na.vec_id = p.query_id
      |  JOIN n2 nb ON nb.vec_id = p.cand_id)
      |SELECT query_id, cand_id, cosine, rank FROM (
      |  SELECT query_id, cand_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  // ---- sim09: metadata-filtered ANN — cosine top-5 restricted to
  //      candidates sharing the query's label (the tenant/category
  //      predicate of production vector search). The filter rides the
  //      broadcast join condition, so ineligible candidates never
  //      reach the scoring expression or the per-query heap; the
  //      oracle is sim01's with the same label-equality predicate. ----
  private def sim09(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    Similarity.filteredTopK(e, e.filter(col("id") < 10), "label", k = 5)
      .select("query_id", "cand_id", "cosine", "rank")
  }

  private val sim09Oracle =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
      |      AND c.label = q.label) z
      |  GROUP BY query_id, cand_id),
      |scored AS (
      |  SELECT p.query_id, p.cand_id,
      |    ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
      |  FROM pairs p
      |  JOIN norms nq ON nq.vec_id = p.query_id
      |  JOIN norms nc ON nc.vec_id = p.cand_id)
      |SELECT query_id, cand_id, cosine, rank FROM (
      |  SELECT query_id, cand_id, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  // ---- sim10: semantic deduplication — the SemDeDup-shaped PRUNE on
  //      top of sim06's bucketed pair search: any vector with a
  //      smaller-id embedding-cosine near-duplicate drops, and the
  //      surviving corpus (id + label) is the output. The dup-id set is
  //      pair-bounded (≪ corpus), so the prune is a broadcast anti-join
  //      — the corpus scan never shuffles. Cosine determinism is
  //      sim04's contract (ROUND to 4 dp before the threshold). ----
  private def sim10(spark: SparkSession, dir: String): DataFrame = {
    val dups = Similarity
      .nearDupPairs(emb(spark, dir), threshold = 0.3, dim = Dim, bits = 4)
      .select(col("id_b").as("vec_id")).distinct()
    Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
      .join(broadcast(dups), Seq("vec_id"), "left_anti")
  }

  private val sim10Oracle =
    s"""WITH ${sigCte(4)},
       |$normsCte,
       |pairs AS (
       |  SELECT id_a, id_b, SUM(xa * xb) AS dot FROM (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |      CAST(UNNEST(a.embedding) AS DOUBLE) AS xa,
       |      CAST(UNNEST(b.embedding) AS DOUBLE) AS xb
       |    FROM embeddings a
       |    JOIN sig sa ON sa.vec_id = a.vec_id
       |    JOIN sig sb ON sb.bucket = sa.bucket
       |    JOIN embeddings b ON b.vec_id = sb.vec_id
       |    WHERE a.vec_id < b.vec_id) z
       |  GROUP BY id_a, id_b),
       |dup AS (
       |  SELECT DISTINCT p.id_b FROM pairs p
       |  JOIN norms na ON na.vec_id = p.id_a
       |  JOIN norms nb ON nb.vec_id = p.id_b
       |  WHERE ROUND(p.dot / (na.nrm * nb.nrm), 4) >= 0.3)
       |SELECT e.vec_id, e.label FROM embeddings e
       |WHERE e.vec_id NOT IN (SELECT id_b FROM dup)""".stripMargin

  // ---- sim11: ANN recall@5 — the index-quality report that closes
  //      the ANN loop: how much of the exact top-5 does the IVF probe
  //      recover, per query? In-engine it is [[Similarity.recallAtK]]
  //      over the two already-gated result sets (sim01's exact truth,
  //      sim05's IVF probe); the oracle re-derives BOTH pipelines in
  //      one query — brute-force CTEs from sim01, fitted-centroid
  //      meet CTEs from sim05 — and counts the overlap, so the recall
  //      number is gated end-to-end, not against the engine's own
  //      intermediate dumps. ----
  private def sim11(spark: SparkSession, dir: String): DataFrame =
    Similarity.recallAtK(
      Similarity.bruteForceTopK(emb(spark, dir), queriesDf(spark, dir), k = 5),
      Similarity.ivfTopK(emb(spark, dir), queriesDf(spark, dir), k = 5),
      k = 5)

  private[queries] def sim11OracleGen(spark: SparkSession, dir: String): String = {
    s"""WITH ${ivfMeetCtes(spark, dir)},
       |$normsCte,
       |allp AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM embeddings q, embeddings c
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
       |  GROUP BY query_id, cand_id),
       |exact5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT p.query_id, p.cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.query_id
       |        ORDER BY ROUND(p.dot / (nq.nrm * nc.nrm), 4) DESC, p.cand_id) AS rank
       |    FROM allp p
       |    JOIN norms nq ON nq.vec_id = p.query_id
       |    JOIN norms nc ON nc.vec_id = p.cand_id) t
       |  WHERE rank <= 5),
       |apairs AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
       |    SELECT m.query_id, m.cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM meet m
       |    JOIN embeddings q ON q.vec_id = m.query_id
       |    JOIN embeddings c ON c.vec_id = m.cand_id) z
       |  GROUP BY query_id, cand_id),
       |approx5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT p.query_id, p.cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.query_id
       |        ORDER BY ROUND(p.dot / (nq.nrm * nc.nrm), 4) DESC, p.cand_id) AS rank
       |    FROM apairs p
       |    JOIN norms nq ON nq.vec_id = p.query_id
       |    JOIN norms nc ON nc.vec_id = p.cand_id) t
       |  WHERE rank <= 5)
       |SELECT e.query_id, COUNT(a.cand_id) AS n_hit,
       |  COUNT(a.cand_id) / 5.0 AS recall
       |FROM exact5 e
       |LEFT JOIN approx5 a
       |  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
       |GROUP BY e.query_id""".stripMargin
  }

  // ---- sim12: product-quantization ANN — the storage-side ANN
  //      compression (Jégou et al.): 4 subspace codebooks of 16
  //      entries make every vector a 4-byte code, and queries score
  //      candidates by ADC table lookups, never touching the vectors.
  //      The fitted codebooks are deterministic, so the oracle renders
  //      them as literals and re-derives the ENTIRE path in SQL —
  //      per-subspace nearest-code assignment (same (dist, code)
  //      tie-break as the NearestCells expression), the per-query
  //      lookup tables as left-assoc dot chains, the 4-term ADC sum
  //      and literal reconstruction norms — so the approximate cosine
  //      itself gates cell-exact, not just the ranks. ----
  private val PqSub = 4
  private val PqCodes = 16

  private def sim12(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(emb(spark, dir), queriesDf(spark, dir), k = 5,
      dim = Dim, subspaces = PqSub, nCodes = PqCodes)
      .select("query_id", "cand_id", "cosine", "rank")

  private[queries] def sim12OracleGen(spark: SparkSession, dir: String): String = {
    val cbs = Similarity.fitPqCodebooks(emb(spark, dir), Dim, PqSub, PqCodes)
    val subDim = Dim / PqSub
    // per-(subspace, code) assignment distances: left-assoc squared
    // chains matching NearestCells' sequential accumulation
    val distBranches = (for {
      m <- 0 until PqSub; c <- 0 until PqCodes
    } yield {
      val chain = cbs(m)(c).zipWithIndex.map { case (w, j) =>
        val x = s"CAST(embedding[${m * subDim + j + 1}] AS DOUBLE)"
        s" + ($x - ($w)) * ($x - ($w))"
      }.mkString
      s"SELECT vec_id, $m AS m, $c AS code, (0.0$chain) AS dist FROM embeddings"
    }).mkString("\n  UNION ALL ")
    // per-(subspace, code) query lookup values: left-assoc dot chains
    val lutBranches = (for {
      m <- 0 until PqSub; c <- 0 until PqCodes
    } yield {
      val chain = cbs(m)(c).zipWithIndex.map { case (w, j) =>
        s" + CAST(embedding[${m * subDim + j + 1}] AS DOUBLE) * ($w)"
      }.mkString
      s"SELECT vec_id AS query_id, $m AS m, $c AS code, (0.0$chain) AS v FROM embeddings WHERE vec_id < 10"
    }).mkString("\n  UNION ALL ")
    // literal reconstruction squared norms per (subspace, code)
    val n2Rows = (for {
      m <- 0 until PqSub; c <- 0 until PqCodes
    } yield {
      val n2 = cbs(m)(c).foldLeft(0.0)((a, w) => a + w * w)
      s"($m, $c, CAST($n2 AS DOUBLE))"
    }).mkString(", ")
    val codePivot = (0 until PqSub).map(m =>
      s"MAX(CASE WHEN m = $m THEN code END) AS c$m").mkString(", ")
    val lutJoins = (0 until PqSub).map(m =>
      s"JOIN luts l$m ON l$m.query_id = q.query_id AND l$m.m = $m AND l$m.code = cd.c$m")
      .mkString("\n       |  ")
    val n2Joins = (0 until PqSub).map(m =>
      s"JOIN cn2 v$m ON v$m.m = $m AND v$m.code = cd.c$m").mkString("\n       |  ")
    val adcChain = (0 until PqSub).foldLeft("0.0")((s, m) => s"($s + l$m.v)")
    val rn2Chain = (0 until PqSub).foldLeft("0.0")((s, m) => s"($s + v$m.n2)")
    s"""WITH dists AS (
       |  $distBranches),
       |ranked AS (
       |  SELECT vec_id, m, code,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
       |  FROM dists),
       |codes AS (
       |  SELECT vec_id, $codePivot FROM ranked WHERE rn = 1 GROUP BY vec_id),
       |cn2(m, code, n2) AS (VALUES $n2Rows),
       |luts AS (
       |  $lutBranches),
       |$normsCte,
       |scored AS (
       |  SELECT q.query_id, cd.vec_id AS cand_id,
       |    ROUND($adcChain / (nq.nrm * sqrt($rn2Chain)), 4) AS cosine
       |  FROM codes cd
       |  CROSS JOIN (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 10) q
       |  $lutJoins
       |  $n2Joins
       |  JOIN norms nq ON nq.vec_id = q.query_id
       |  WHERE cd.vec_id <> q.query_id)
       |SELECT query_id, cand_id, cosine, rank FROM (
       |  SELECT query_id, cand_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 5""".stripMargin
  }

  // ---- sim13: k-NN label classification — the consumer that turns
  //      similarity search into a labeler: each query vector takes the
  //      majority label of its 10 exact nearest neighbors (the
  //      weak-supervision / data-curation primitive — label new data
  //      by its labeled neighbors). Vote ties break to the SMALLEST
  //      label (declared, total). Scale shape: the expensive part IS
  //      sim01's scan-bound brute-force top-k (queries broadcast,
  //      codegen'd dot); the label attach then broadcasts the
  //      queries×k result frame into the corpus-sized label table —
  //      the corpus never shuffles — and the vote is a queries×labels
  //      aggregate. Swapping the top-k stage for the IVF/PQ variants
  //      changes recall, not this consumer. ----
  private def sim13(spark: SparkSession, dir: String): DataFrame = {
    val topk = Similarity.bruteForceTopK(emb(spark, dir), queriesDf(spark, dir),
      k = 10).select("query_id", "cand_id")
    val labels = Tables.embeddings(spark, dir)
      .filter(col("label").isNotNull)
      .select(col("vec_id").as("cand_id"), col("label"))
    val votes = labels.join(broadcast(topk), "cand_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    graft.ops.Relational.topKPerGroup(votes, Seq("query_id"),
        Seq(col("votes").desc, col("label")), 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }

  private val sim13Oracle =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
      |  GROUP BY query_id, cand_id),
      |scored AS (
      |  SELECT p.query_id, p.cand_id,
      |    ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
      |  FROM pairs p
      |  JOIN norms nq ON nq.vec_id = p.query_id
      |  JOIN norms nc ON nc.vec_id = p.cand_id),
      |topk AS (
      |  SELECT query_id, cand_id FROM (
      |    SELECT query_id, cand_id,
      |      ROW_NUMBER() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, cand_id) AS rank
      |    FROM scored) t
      |  WHERE rank <= 10),
      |votes AS (
      |  SELECT t.query_id, e.label, COUNT(*) AS votes
      |  FROM topk t JOIN embeddings e ON e.vec_id = t.cand_id
      |  WHERE e.label IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT query_id, label AS predicted_label, CAST(votes AS BIGINT) AS votes
      |FROM (
      |  SELECT query_id, label, votes,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY votes DESC, label) AS rn
      |  FROM votes) z
      |WHERE rn = 1""".stripMargin

  // ---- sim14: one Lloyd (k-means) update step, gated end-to-end —
  //      the clustering primitive behind embedding-space curation
  //      (topic balancing, cluster-based dedup, SemDeDup's buckets).
  //      sim05 gates ASSIGNMENT against fitted centroids; this gates
  //      the UPDATE: from 8 deterministic init centroids (the first 8
  //      vectors), every vector assigns map-side via the native
  //      NearestCells expression (the sim05 fold order, reproduced
  //      literally in SQL), and the new per-cell mean numerators
  //      accumulate as QUANTIZED integers — Σ floor(x·2²⁰ + 0.5) per
  //      (cell, dim) — so the distributed sum is fold-order-free and
  //      cell-exact where a double mean would be partitioning-
  //      dependent. Scale shape: assignment is map-only; the update is
  //      one (cell, dim)-grain hash aggregate with map-side partials
  //      (the 64× posexplode collapses to K×64 rows per partition
  //      before the shuffle). Dividing sum_q by n_members · 2²⁰
  //      yields the iterated centroid downstream. ----
  private def initCentroids(spark: SparkSession, dir: String): Seq[Array[Double]] =
    emb(spark, dir).filter(col("id") < 8).orderBy(col("id"))
      .select(Similarity.toDoubleVec(col("vec")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq

  private def sim14(spark: SparkSession, dir: String): DataFrame = {
    val cents = initCentroids(spark, dir)
    emb(spark, dir)
      .withColumn("cvec", Similarity.toDoubleVec(col("vec")))
      .withColumn("cell", explode(
        graft.expressions.VectorExpressions.nearestCells(col("cvec"), cents, 1)))
      .select(col("cell"), posexplode(col("cvec")).as(Seq("dim", "x")))
      .withColumn("q", floor(col("x") * 1048576.0 + 0.5).cast("long"))
      .groupBy(col("cell"), col("dim"))
      .agg(count(lit(1)).as("n_members"), sum(col("q")).as("sum_q"))
      .select(col("cell").cast("int").as("cell"), col("dim").cast("int").as("dim"),
        col("n_members"), col("sum_q"))
  }

  private[queries] def sim14OracleGen(spark: SparkSession, dir: String): String = {
    val cents = initCentroids(spark, dir)
    val distBranches = cents.zipWithIndex.map { case (c, cell) =>
      val chain = c.zipWithIndex.map { case (w, j) =>
        s" + (CAST(embedding[${j + 1}] AS DOUBLE) - ($w)) * (CAST(embedding[${j + 1}] AS DOUBLE) - ($w))"
      }.mkString
      s"SELECT vec_id, $cell AS cell, (0.0$chain) AS dist FROM embeddings"
    }.mkString("\n  UNION ALL ")
    s"""WITH dists AS (
       |  $distBranches),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |  FROM dists),
       |assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
       |el AS (
       |  SELECT vec_id, UNNEST(list_transform(range(1, len(embedding) + 1),
       |    i -> struct_pack(d := i - 1, x := CAST(embedding[i] AS DOUBLE)))) AS e
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id, e.d AS dim,
       |    CAST(FLOOR(e.x * 1048576.0 + 0.5) AS BIGINT) AS q
       |  FROM el)
       |SELECT CAST(a.cell AS INT) AS cell, CAST(q.dim AS INT) AS dim,
       |  COUNT(*) AS n_members, CAST(SUM(q.q) AS BIGINT) AS sum_q
       |FROM q JOIN assigned a ON a.vec_id = q.vec_id
       |GROUP BY 1, 2""".stripMargin
  }

  // ---- sim15: cosine radius search — the "all sufficiently similar"
  //      contract top-k cannot express (match counts per query are
  //      unknown a priori: contamination screens, near-dup sweeps).
  //      The threshold replaces the per-query heap in the same
  //      broadcast + codegen'd-dot plan as sim01, so the predicate
  //      evaluates map-side and NOTHING shuffles; scores round to 4dp
  //      before the threshold (the sim01 convention), making the
  //      boundary engine-reproducible. ----
  private def sim15(spark: SparkSession, dir: String): DataFrame =
    Similarity.radiusSearch(emb(spark, dir), queriesDf(spark, dir),
      minCosine = 0.2)

  private val sim15Oracle =
    """WITH norms AS (
      |  SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) z
      |  GROUP BY vec_id),
      |pairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
      |  GROUP BY query_id, cand_id)
      |SELECT query_id, cand_id, cosine FROM (
      |  SELECT p.query_id, p.cand_id,
      |    ROUND(p.dot / (nq.nrm * nc.nrm), 4) AS cosine
      |  FROM pairs p
      |  JOIN norms nq ON nq.vec_id = p.query_id
      |  JOIN norms nc ON nc.vec_id = p.cand_id) t
      |WHERE cosine >= 0.2""".stripMargin

  // ---- sim16: maximum-inner-product top-5 — the recommender/reward
  //      scoring where magnitude is signal and cosine's normalization
  //      would erase it. sim01's broadcast + bounded-heap plan minus
  //      the norms; ranks on the 4dp-rounded dot (tie → cand_id), the
  //      sim01 reproducibility convention. Exactness anchor for the
  //      norm-augmented bucketed MIPS path (see Similarity.dotTopK). ----
  private def sim16(spark: SparkSession, dir: String): DataFrame =
    Similarity.dotTopK(emb(spark, dir), queriesDf(spark, dir), k = 5)

  private val sim16Oracle =
    """WITH pairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
      |  GROUP BY query_id, cand_id),
      |scored AS (
      |  SELECT query_id, cand_id, ROUND(dot, 4) AS dot FROM pairs)
      |SELECT query_id, cand_id, dot, rank FROM (
      |  SELECT query_id, cand_id, dot,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, cand_id) AS rank
      |  FROM scored) t
      |WHERE rank <= 5""".stripMargin

  // ---- sim17: embedding-space label audit — the mislabel/corruption
  //      screen an embedding pipeline runs before vectors enter
  //      training: each vector's squared distance to its OWN label
  //      centroid, top-3 farthest per label. Exact and order-free via
  //      the sim14 fixed-point recipe: q = ⌊x·2²⁰ + ½⌋ per dim, the
  //      centroid stays the integer pair (n, Σq), and the distance
  //      numerator Σ_d (q·n − Σq)² accumulates in DECIMAL(38) —
  //      associative, partitioning-independent (the diff fits int64 at
  //      every tier: |q|·n ≤ 2²⁰·2×10⁴ ≈ 2×10¹⁰); the single
  //      double division by n²·2⁴⁰ is a fixed expression both engines
  //      evaluate identically. Scale shape: the per-(label, dim)
  //      centroid frame is labels×64 rows — broadcast into the
  //      map-side distance fold; the only vector-scale exchange is the
  //      per-vector partial-agg collapse (64 dims combine map-side),
  //      and the top-3 rides topKPerGroupScalable, never a
  //      one-task-per-label window. ----
  private def sim17(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val qd = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(Similarity.toDoubleVec(col("embedding"))).as(Seq("dim", "x")))
      .withColumn("q", floor(col("x") * 1048576.0 + 0.5).cast("long"))
    val cent = qd.groupBy("label", "dim")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
    val diff = (col("q") * col("n") - col("s")).cast(DecimalType(20, 0))
    val d2 = qd.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(diff * diff).as("num"), min(col("n")).as("n"))
    Relational.topKPerGroupScalable(d2, Seq("label"),
        Seq(col("num").desc, col("vec_id")), k = 3, rankName = "rank")
      .select(col("label"), col("rank"), col("vec_id"),
        col("n").as("n_label"),
        (col("num").cast(DoubleType) /
          (col("n").cast(DoubleType) * col("n").cast(DoubleType)
            * lit(1099511627776.0))).as("d2"))
  }

  private val sim17Oracle =
    """WITH el AS (
      |  SELECT vec_id, label, UNNEST(list_transform(range(1, len(embedding) + 1),
      |    i -> struct_pack(d := i - 1, x := CAST(embedding[i] AS DOUBLE)))) AS e
      |  FROM embeddings),
      |q AS (
      |  SELECT vec_id, label, e.d AS dim,
      |    CAST(FLOOR(e.x * 1048576.0 + 0.5) AS BIGINT) AS q
      |  FROM el),
      |cent AS (
      |  SELECT label, dim, COUNT(*) AS n, SUM(q) AS s
      |  FROM q GROUP BY 1, 2),
      |d2 AS (
      |  SELECT q.vec_id, q.label,
      |    SUM(CAST(q.q * cent.n - cent.s AS HUGEINT)
      |      * CAST(q.q * cent.n - cent.s AS HUGEINT)) AS num,
      |    MIN(cent.n) AS n
      |  FROM q JOIN cent ON cent.label = q.label AND cent.dim = q.dim
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT label, vec_id, n, num,
      |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY num DESC, vec_id) AS rn
      |  FROM d2)
      |SELECT label, CAST(rn AS INT) AS rank, vec_id, CAST(n AS BIGINT) AS n_label,
      |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1099511627776.0) AS d2
      |FROM ranked WHERE rn <= 3""".stripMargin

  // ---- sim18: two-stage prefix-dimension retrieval (Matryoshka /
  //      funnel search) — stage 1 shortlists 20 per query on the FIRST
  //      16 of 64 dims (4× less vector IO/FLOPs at the corpus-wide
  //      pass), stage 2 reranks only the shortlist with the exact
  //      full-dim cosine. `pre_rank` in the output exposes how far the
  //      prefix ordering had each survivor, so the funnel's recall
  //      cost audits against sim01's exact anchor. The oracle unrolls
  //      BOTH stages (prefix-dim sums, shortlist ROW_NUMBER, full-dim
  //      rerank). All-pairs stage 1 puts it with the sim01 family in
  //      the sf0.01 gate; the scale path is the same funnel with the
  //      prefix stage bucketed (sim02/sim05 machinery, unchanged —
  //      the truncated frame is just another vector column). ----
  private def sim18(spark: SparkSession, dir: String): DataFrame =
    Similarity.prefixRerankTopK(emb(spark, dir), queriesDf(spark, dir),
      prefixDim = 16, shortlist = 20, k = 5)

  private val sim18Oracle =
    """WITH pre AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
      |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id, u.d,
      |      CAST(q.embedding[u.d] AS DOUBLE) AS qx,
      |      CAST(c.embedding[u.d] AS DOUBLE) AS cx
      |    FROM embeddings q, embeddings c,
      |      (SELECT UNNEST(range(1, 17)) AS d) u
      |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
      |  GROUP BY query_id, cand_id),
      |short AS (
      |  SELECT query_id, cand_id, pre_rank FROM (
      |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
      |      PARTITION BY query_id
      |      ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS pre_rank
      |    FROM pre) t
      |  WHERE pre_rank <= 20),
      |full_s AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
      |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
      |    SELECT s.query_id, s.cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM short s
      |    JOIN embeddings q ON q.vec_id = s.query_id
      |    JOIN embeddings c ON c.vec_id = s.cand_id) z
      |  GROUP BY query_id, cand_id)
      |SELECT f.query_id, f.cand_id, f.cosine, f.rank,
      |  CAST(s.pre_rank AS INT) AS pre_rank FROM (
      |  SELECT query_id, cand_id, ROUND(dot / (qn * cn), 4) AS cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS INT) AS rank
      |  FROM full_s) f
      |JOIN short s ON s.query_id = f.query_id AND s.cand_id = f.cand_id
      |WHERE f.rank <= 5""".stripMargin

  // ---- sim19: the bucketed MIPS scale path — sim16's raw-dot ranking
  //      through the LSH machinery via norm-augmentation (append
  //      sqrt(M² − ‖x‖²) to candidates, 0 to queries; augmented-cosine
  //      order = raw-dot order, so hyperplane buckets admit by
  //      inner-product affinity). Scoring inside a bucket is the exact
  //      64-dim dot, so this is sim16 minus bucket misses and sim20
  //      measures exactly that. The oracle re-derives EVERYTHING:
  //      ‖x‖² as the engine's left-assoc fold, M² as an order-free
  //      MAX, the augmented 65-dim signatures from the same rendered
  //      ±1 planes (the sim02 trick, one dimension wider), then
  //      bucket-mate raw-dot top-5 — cell-exact, no fitted params. ----
  private val MipsBits = 4
  private val MipsTables = 12

  private def sim19(spark: SparkSession, dir: String): DataFrame =
    Similarity.mipsLshTopK(emb(spark, dir), queriesDf(spark, dir), k = 5,
      dim = Dim, bits = MipsBits, tables = MipsTables)

  private val n2Cte =
    s"""n2 AS (
       |  SELECT vec_id, (0.0 + ${embTerms(Dim).map(t => s"$t * $t").mkString(" + ")}) AS n2
       |  FROM embeddings)""".stripMargin

  /** The augmented multi-table signatures + OR-admission: one UNION ALL
    * branch per plane family (seed 42+t — exactly the engine's
    * [[Similarity]] multi-table seeds), candidates hashed with the
    * appended `SQRT(m2 − n2)` coordinate, queries with their raw 64
    * terms (the appended 0's ±0.0 terms can never flip a signature
    * bit, so they render omitted). */
  private def augSigCtes(bits: Int, tables: Int): String = {
    def planes(t: Int) = Similarity.hyperplanes(Dim + 1, bits, 42L + t)
    val candTerms = embTerms(Dim) :+ "SQRT(mx.m2 - n2.n2)"
    val cBranches = (0 until tables).map { t =>
      s"""SELECT e.vec_id, $t AS tab, (${sigSql(planes(t), candTerms)}) AS bucket
         |  FROM embeddings e JOIN n2 ON n2.vec_id = e.vec_id CROSS JOIN mx""".stripMargin
    }.mkString("\n  UNION ALL ")
    val qBranches = (0 until tables).map { t =>
      s"""SELECT vec_id, $t AS tab, (${sigSql(planes(t), embTerms(Dim))}) AS bucket
         |  FROM embeddings WHERE vec_id < 10""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""$n2Cte,
       |mx AS (SELECT MAX(n2) AS m2 FROM n2),
       |csig AS (
       |  $cBranches),
       |qsig AS (
       |  $qBranches),
       |adm AS (
       |  SELECT DISTINCT sq.vec_id AS query_id, sc.vec_id AS cand_id
       |  FROM qsig sq
       |  JOIN csig sc ON sc.tab = sq.tab AND sc.bucket = sq.bucket
       |  WHERE sc.vec_id <> sq.vec_id)""".stripMargin
  }

  private val mipsBucketPairsCte =
    """bpairs AS (
      |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
      |    SELECT a.query_id, a.cand_id,
      |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
      |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
      |    FROM adm a
      |    JOIN embeddings q ON q.vec_id = a.query_id
      |    JOIN embeddings c ON c.vec_id = a.cand_id) z
      |  GROUP BY query_id, cand_id)""".stripMargin

  private val sim19Oracle =
    s"""WITH ${augSigCtes(MipsBits, MipsTables)},
       |$mipsBucketPairsCte
       |SELECT query_id, cand_id, dot, rank FROM (
       |  SELECT query_id, cand_id, ROUND(dot, 4) AS dot,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ROUND(dot, 4) DESC, cand_id) AS rank
       |  FROM bpairs) t
       |WHERE rank <= 5""".stripMargin

  // ---- sim20: MIPS recall@5 — the sim11-shaped report that closes
  //      the norm-augmentation loop: how much of sim16's exact raw-dot
  //      top-5 does the bucketed path recover, per query? The oracle
  //      re-derives BOTH pipelines (all-pairs exact MIPS + the
  //      augmented-signature bucketed one) and counts the overlap, so
  //      the recall number gates end-to-end against an independent
  //      engine, not the engine's own dumps. ----
  private def sim20(spark: SparkSession, dir: String): DataFrame =
    Similarity.recallAtK(
      Similarity.dotTopK(emb(spark, dir), queriesDf(spark, dir), k = 5),
      Similarity.mipsLshTopK(emb(spark, dir), queriesDf(spark, dir), k = 5,
        dim = Dim, bits = MipsBits, tables = MipsTables),
      k = 5)

  private val sim20Oracle =
    s"""WITH ${augSigCtes(MipsBits, MipsTables)},
       |$mipsBucketPairsCte,
       |allp AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM embeddings q, embeddings c
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
       |  GROUP BY query_id, cand_id),
       |exact5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ROUND(dot, 4) DESC, cand_id) AS rank
       |    FROM allp) t
       |  WHERE rank <= 5),
       |approx5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ROUND(dot, 4) DESC, cand_id) AS rank
       |    FROM bpairs) t
       |  WHERE rank <= 5)
       |SELECT e.query_id, COUNT(a.cand_id) AS n_hit,
       |  COUNT(a.cand_id) / 5.0 AS recall
       |FROM exact5 e
       |LEFT JOIN approx5 a
       |  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
       |GROUP BY e.query_id""".stripMargin

  // ---- sim21: the bucketed funnel — sim18 with stage 1 restricted to
  //      prefix-LSH bucket-mates (4-bit seeded hyperplanes over the
  //      16-dim prefix), stage 2 the SAME exact full-width rerank.
  //      At 100 TB stage 1 is prefix-width AND sub-quadratic; stage 2
  //      still touches full vectors only for shortlisted ids
  //      (PlanShapeSpec pins the shortlist broadcast). The oracle
  //      unrolls prefix signatures, bucket-mate prefix cosine,
  //      shortlist, and the exact rerank. ----
  private val PrefixBits = 4
  private val PrefixTables = 9
  private val PrefixDim = 16

  private def sim21(spark: SparkSession, dir: String): DataFrame =
    Similarity.prefixRerankLshTopK(emb(spark, dir), queriesDf(spark, dir),
      prefixDim = PrefixDim, shortlist = 20, k = 5, bits = PrefixBits,
      tables = PrefixTables)

  /** Multi-table prefix-vector signatures + OR-admission: the sim02
    * rendering over the FIRST `PrefixDim` element terms, one UNION ALL
    * branch per `PrefixDim`-dim plane family (seed 42+t). */
  private def prefixSigCtes(bits: Int, tables: Int): String = {
    val branches = (0 until tables).map { t =>
      s"""SELECT vec_id, $t AS tab, (${sigSql(
        Similarity.hyperplanes(PrefixDim, bits, 42L + t),
        embTerms(PrefixDim))}) AS bucket FROM embeddings""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""psig AS (
       |  $branches),
       |padm AS (
       |  SELECT DISTINCT sq.vec_id AS query_id, sc.vec_id AS cand_id
       |  FROM psig sq
       |  JOIN psig sc ON sc.tab = sq.tab AND sc.bucket = sq.bucket
       |  WHERE sq.vec_id < 10 AND sc.vec_id <> sq.vec_id)""".stripMargin
  }

  /** sim21's stage-1 + shortlist + exact-rerank CTE chain (shared by
    * the sim21 gate and sim22's recall oracle): `lshort` is the
    * bucket-admitted prefix shortlist, `lfull` the reranked scores. */
  private val prefixLshFunnelCtes =
    s"""lpre AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
       |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
       |    SELECT a.query_id, a.cand_id,
       |      CAST(q.embedding[u.d] AS DOUBLE) AS qx,
       |      CAST(c.embedding[u.d] AS DOUBLE) AS cx
       |    FROM padm a
       |    JOIN embeddings q ON q.vec_id = a.query_id
       |    JOIN embeddings c ON c.vec_id = a.cand_id,
       |      (SELECT UNNEST(range(1, ${PrefixDim + 1})) AS d) u) z
       |  GROUP BY query_id, cand_id),
       |lshort AS (
       |  SELECT query_id, cand_id, pre_rank FROM (
       |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id
       |      ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS pre_rank
       |    FROM lpre) t
       |  WHERE pre_rank <= 20),
       |lfull AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
       |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
       |    SELECT s.query_id, s.cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM lshort s
       |    JOIN embeddings q ON q.vec_id = s.query_id
       |    JOIN embeddings c ON c.vec_id = s.cand_id) z
       |  GROUP BY query_id, cand_id)""".stripMargin

  private val sim21Oracle =
    s"""WITH ${prefixSigCtes(PrefixBits, PrefixTables)},
       |$prefixLshFunnelCtes
       |SELECT f.query_id, f.cand_id, f.cosine, f.rank,
       |  CAST(s.pre_rank AS INT) AS pre_rank FROM (
       |  SELECT query_id, cand_id, ROUND(dot / (qn * cn), 4) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS INT) AS rank
       |  FROM lfull) f
       |JOIN lshort s ON s.query_id = f.query_id AND s.cand_id = f.cand_id
       |WHERE f.rank <= 5""".stripMargin

  // ---- sim22: funnel recall@5 — the bucketed funnel (sim21) scored
  //      against the exact funnel (sim18): how many of the exact
  //      funnel's top-5 survive when stage 1 admits only prefix-LSH
  //      bucket-mates? The oracle re-derives BOTH funnels end-to-end
  //      (exact prefix stage + rerank; bucketed prefix stage + rerank)
  //      and counts the overlap. ----
  private def sim22(spark: SparkSession, dir: String): DataFrame =
    Similarity.recallAtK(
      Similarity.prefixRerankTopK(emb(spark, dir), queriesDf(spark, dir),
        prefixDim = PrefixDim, shortlist = 20, k = 5),
      Similarity.prefixRerankLshTopK(emb(spark, dir), queriesDf(spark, dir),
        prefixDim = PrefixDim, shortlist = 20, k = 5, bits = PrefixBits,
        tables = PrefixTables),
      k = 5)

  private val sim22Oracle =
    s"""WITH ${prefixSigCtes(PrefixBits, PrefixTables)},
       |$prefixLshFunnelCtes,
       |epre AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
       |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |      CAST(q.embedding[u.d] AS DOUBLE) AS qx,
       |      CAST(c.embedding[u.d] AS DOUBLE) AS cx
       |    FROM embeddings q, embeddings c,
       |      (SELECT UNNEST(range(1, ${PrefixDim + 1})) AS d) u
       |    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id) z
       |  GROUP BY query_id, cand_id),
       |eshort AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id, ROW_NUMBER() OVER (
       |      PARTITION BY query_id
       |      ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS pre_rank
       |    FROM epre) t
       |  WHERE pre_rank <= 20),
       |efull AS (
       |  SELECT query_id, cand_id, SUM(qx * cx) AS dot,
       |    SQRT(SUM(qx * qx)) AS qn, SQRT(SUM(cx * cx)) AS cn FROM (
       |    SELECT s.query_id, s.cand_id,
       |      CAST(UNNEST(q.embedding) AS DOUBLE) AS qx,
       |      CAST(UNNEST(c.embedding) AS DOUBLE) AS cx
       |    FROM eshort s
       |    JOIN embeddings q ON q.vec_id = s.query_id
       |    JOIN embeddings c ON c.vec_id = s.cand_id) z
       |  GROUP BY query_id, cand_id),
       |exact5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS rank
       |    FROM efull) t
       |  WHERE rank <= 5),
       |approx5 AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY ROUND(dot / (qn * cn), 4) DESC, cand_id) AS rank
       |    FROM lfull) t
       |  WHERE rank <= 5)
       |SELECT e.query_id, COUNT(a.cand_id) AS n_hit,
       |  COUNT(a.cand_id) / 5.0 AS recall
       |FROM exact5 e
       |LEFT JOIN approx5 a
       |  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
       |GROUP BY e.query_id""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("sim01_ann_cosine", sim01, Some(sim01Oracle), headline = true),
    GraftQuery("sim02_lsh_ann", sim02, Some(sim02Oracle), headline = true),
    GraftQuery("sim03_label_stats", sim03, Some(sim03Oracle)),
    GraftQuery("sim04_embedding_near_dup", sim04, Some(sim04Oracle)),
    GraftQuery("sim05_ivf_ann",
      (s, d) => Similarity.ivfTopK(emb(s, d), queriesDf(s, d), k = 5)
        .select("query_id", "cand_id", "cosine", "rank"),
      None, headline = true, oracleGen = Some(sim05OracleGen)),
    GraftQuery("sim06_bucketed_near_dup", sim06, Some(sim06Oracle)),
    GraftQuery("sim07_quantize", sim07, Some(sim07Oracle)),
    GraftQuery("sim08_quantized_ann", sim08, Some(sim08Oracle)),
    GraftQuery("sim09_filtered_ann", sim09, Some(sim09Oracle)),
    GraftQuery("sim10_semantic_dedup", sim10, Some(sim10Oracle)),
    GraftQuery("sim11_ann_recall", sim11, None, oracleGen = Some(sim11OracleGen)),
    GraftQuery("sim12_pq_ann", sim12, None, oracleGen = Some(sim12OracleGen)),
    GraftQuery("sim13_knn_label", sim13, Some(sim13Oracle)),
    GraftQuery("sim14_kmeans_step", sim14, None,
      oracleGen = Some(sim14OracleGen)),
    GraftQuery("sim15_radius_search", sim15, Some(sim15Oracle)),
    GraftQuery("sim16_mips_topk", sim16, Some(sim16Oracle)),
    GraftQuery("sim17_label_outliers", sim17, Some(sim17Oracle)),
    GraftQuery("sim18_prefix_rerank", sim18, Some(sim18Oracle)),
    GraftQuery("sim19_mips_lsh", sim19, Some(sim19Oracle)),
    GraftQuery("sim20_mips_recall", sim20, Some(sim20Oracle)),
    GraftQuery("sim21_prefix_lsh", sim21, Some(sim21Oracle)),
    GraftQuery("sim22_funnel_recall", sim22, Some(sim22Oracle)))
}
