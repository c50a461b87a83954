package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/**
 * Benchmark main: times the headline queries on
 * `SPARK_GRAFT_SF_DIR` and prints one JSON line
 * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
 *
 * Each query is forced with `.count()` (full plan execution, no result
 * materialization on the driver). A small warmup query runs first so
 * JIT/codegen compilation of the session isn't billed to the first
 * measured query.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Idle-gate: round-over-round deltas are dominated by whatever
    // else the box is doing (r9/r10 both started at loadavg > 4 and no
    // trusted number existed since the one exclusive run). Wait — capped
    // so a never-idle box still benches — for the 1-min load to decay
    // below 1.5 before taking ANY measurement, and capture the start
    // load BEFORE the warmup so it documents foreign load, not the
    // bench's own warmup spike.
    val loadPre = loadavg()
    var idleWaited = 0
    while (loadavg() > 1.5 && idleWaited < 90) {
      Thread.sleep(5000); idleWaited += 5
    }
    val loadStart = loadavg()

    // Warmup: run every headline query once at the smallest scale factor.
    // Spark's codegen cache is keyed by generated source, which is
    // identical across scale factors for the same plan shape — so the
    // timed runs below measure steady-state compiled execution, not
    // first-query JIT/codegen compilation.
    val headline = Registry.all.filter(_.headline)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      headline.foreach(q =>
        try q.run(spark, warmDir).count()
        catch { case _: Throwable => () })
    }
    // Median of 5 samples per query: a single sample can't distinguish
    // a real regression from machine jitter (round-over-round deltas up
    // to 1.37× were observed on identical code, and median-of-3 still
    // left sub-second queries' 10× ratios swinging ±25-45% between two
    // idle-box runs). The per-query MIN is also kept: sustained
    // concurrent load (another sbt/spark process on the box) inflates
    // every sample, so the median absorbs it — r7's 10× sweep read
    // 13.6 s for a query that times 2.1 s on an idle machine. min +
    // the loadavg fields below make a contaminated run self-
    // documenting instead of masquerading as a regression.
    val samples = 5
    val mins = scala.collection.mutable.Map.empty[String, Double]
    def time(q: graft.queries.GraftQuery, dir: String): Double = {
      val ts = Seq.fill(samples) {
        val t0 = System.nanoTime()
        try { q.run(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name}: $e"); Double.NaN }
      }
      // a failed sample must not masquerade as a fast run: any failure
      // marks the query -1 instead of feeding its time-to-exception in
      if (ts.exists(_.isNaN)) -1.0
      else { mins(q.name) = ts.min; ts.sorted.apply(samples / 2) }
    }
    val results = headline.map(q => q.name -> time(q, sfDir))
    // captured right after the headline timings: the idle gate bounds
    // the START load only — a decaying foreign process can contaminate
    // the first timed queries and be gone by the end (observed once in
    // round 11: first query 34×, tapering to 1.0×). start/mid/end
    // make that profile visible in the record.
    val loadMid = loadavg()
    // SNAPSHOT the headline-run minima now: time() keeps writing to
    // `mins` during the sf0.01 sweep and 10× blow-up below, and a
    // min taken at a different scale is not a contamination witness
    // for the sf0.1 medians (r8 shipped exactly that bug).
    val headlineMins: Map[String, Double] = mins.toMap

    // Scale-sweep guard: time the same queries one scale factor down and
    // report the per-query scaling ratio. Data grows ~10× between the
    // dirs (docs/embeddings sublinearly), so a ratio far above 10 means
    // super-linear work — the accidental quadratic that a 100× scale-up
    // would turn into an outage. Flag ratio > 15 once above the noise
    // floor (both medians meaningful, the larger ≥ 0.5 s).
    // Scaling ratios are computed MIN/MIN, not median/median: two
    // idle-box runs showed per-query minima reproduce within ±12%
    // while sub-second medians swing ±45%, turning ratio deltas into
    // pure noise. The min is the natural cost estimate for scaling
    // diagnostics (anything above it is scheduler/GC jitter, which
    // does not scale with the data).
    val sweepDir = "/root/testdata/sf0.01"
    val sweep: Map[String, Double] =
      if (new java.io.File(sweepDir).isDirectory && sweepDir != sfDir)
        headline.map(q => q.name -> time(q, sweepDir)).toMap
      else Map.empty
    val sweepMins: Map[String, Double] = mins.toMap
    val ratios = headlineMins.toSeq.sortBy(_._1).flatMap { case (name, t) =>
      sweepMins.get(name).collect {
        case s if s > 0 && t > 0 && sweep.get(name).exists(_ > 0) => name -> t / s
      }
    }
    val resMap = results.toMap
    val flagged = ratios.collect {
      case (name, r) if r > 15.0 && resMap(name) >= 0.5 => name
    }

    // Third scaling point: a deterministic 10× blow-up of the
    // documents/embeddings corpora plus key-shifted replicas of
    // lineitem/orders/customer/events, timed for the text/similarity
    // AND relational headliners. One decade more exposes super-linear
    // terms the sf0.01→sf0.1 step hides; the blow-up is built once
    // per machine and reused.
    val tenxQueries = Seq("sim01_ann_cosine", "sim02_lsh_ann", "sim05_ivf_ann",
      "tx02_text_quality", "tx06_near_dup_pairs", "tx14_corpus_prep",
      "mm02_media_ann", "mm09_image_phash_dedup",
      // relational decade point: key-shifted lineitem/orders/customer/
      // events replicas (q26 carries the steepest sf0.01→sf0.1 ratio)
      "q01_pricing_summary", "q15_latest_events", "q26_shipping_priority",
      // streaming decade point: state-store growth (watermark-bounded
      // window state over 10× the keys) is the one axis the batch
      // blow-up queries never exercise
      "st01_stream_hourly")
    var blowUpInfo: String = "null"
    val tenx: Seq[(String, Double)] =
      if (sfDir.endsWith("sf0.1"))
        try {
          val dir10 = BenchData.ensureBlowUp(spark, sfDir, factor = 10)
          blowUpInfo = BenchData.blowUpIdentity(dir10)
          headline.filter(q => tenxQueries.contains(q.name))
            .map(q => q.name -> time(q, dir10))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] 10x blow-up skipped: $e"); Seq.empty }
      else Seq.empty
    val tenxMins: Map[String, Double] = mins.toMap
    val ratios10 = tenx.flatMap { case (name, t) =>
      (headlineMins.get(name), tenxMins.get(name)) match {
        case (Some(b), Some(t10)) if b > 0 && t10 > 0 && t > 0 =>
          Some(name -> t10 / b)
        case _ => None
      }
    }
    // All times at 4 decimals (0.1 ms — below measurement noise).
    // Locale.ROOT: the f"" interpolator is locale-sensitive and would
    // emit comma decimal separators (unparseable JSON) under de_DE-
    // style default locales.
    def s4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def s2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def jmap(kvs: Iterable[(String, String)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val tenxJson = jmap(tenx.map { case (k, v) => k -> s4(v) })
    val ratio10Json = jmap(ratios10.map { case (k, v) => k -> s2(v) })
    val qs = jmap(results.map { case (k, v) => k -> s4(v) })
    val ratioJson = jmap(ratios.map { case (k, v) => k -> s2(v) })
    val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val minJson = jmap(results.flatMap { case (k, _) =>
      headlineMins.get(k).map(v => k -> s4(v))
    })
    val total = results.map(_._2).filter(_ >= 0).sum
    val loadEnd = loadavg()
    // The driver captures only the last 2,000 chars of stdout; r8 and
    // r9 both shipped parsed:null because the full map set overran it.
    // stdout gets the slim line (headline medians + scaling verdict);
    // the diagnostic maps (minima, sweeps, 10× points) go to
    // bench_out.json only.
    // sfDir comes from the environment: escape it so a path containing
    // a quote/backslash can't make the JSON unparseable
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val core = s""""metric":"total","value":${s4(total)},"unit":"sec","queries":$qs,"sf":${jstr(sfDir)},"samples":$samples,"loadavg_pre":${s4(loadPre)},"idle_waited_sec":$idleWaited,"loadavg_start":${s4(loadStart)},"loadavg_mid":${s4(loadMid)},"loadavg_end":${s4(loadEnd)},"scaling_flagged":$flaggedJson"""
    val line = s"""{$core,"detail":"bench_out.json"}"""
    val full = s"""{$core,"queries_min":$minJson,"scaling_vs_sf0.01":$ratioJson,"queries_10x":$tenxJson,"scaling_10x_vs_sf0.1":$ratio10Json,"blowup":$blowUpInfo}"""
    // full diagnostics as a file, immune to tail capture — written FIRST
    // so an oversized stdout line can never lose a completed run
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    // the driver captures only the last 2,000 chars of stdout; if the
    // slim line ever outgrows that, degrade to a minimal-but-parseable
    // line instead of asserting away the whole run's results
    if (line.length < 1900) println(line)
    else {
      System.err.println(
        s"[bench] stdout line is ${line.length} chars; emitting fallback")
      println(s"""{"metric":"total","value":${s4(total)},"unit":"sec","queries":{},"sf":${jstr(sfDir)},"truncated":true,"detail":"bench_out.json"}""")
    }
    spark.stop()
  }
}
