package graft.marketpulse

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The pluggable fetch stage (S1's second half): the reference walks a
 * symbol list, GETs one JSON document per symbol from the provider,
 * skips responses without the daily-series key, and sleeps a fixed
 * interval between calls to respect the provider's rate limit
 * (`dags/get_stock.py:53-71,110-115`).
 *
 * The HTTP transport is an external boundary (this container has no
 * egress), so it hides behind [[DocumentFetcher]] the same way the
 * media decode hides behind `Multimodal.MediaDecoder`: a real
 * deployment binds an HTTP client here; tests and offline runs bind
 * [[StubFetcher]]. Everything downstream — validity filtering, alias
 * canonicalization, the raw landing shape — is the already-tested
 * ingest path.
 *
 * The fetch loop itself is deliberately driver-side and sequential: a
 * rate-limited provider API serializes the calls no matter how many
 * executors exist (the reference's 15 s sleep makes one fetch cycle
 * minutes long for a handful of symbols). Scale lives downstream of
 * landing, not in the fetch.
 */
object Fetch {

  /** The provider-transport boundary: one raw JSON document text per
    * PROVIDER symbol, or None when the provider has nothing (HTTP
    * error, unknown ticker). */
  trait DocumentFetcher {
    def fetch(providerSymbol: String): Option[String]
  }

  /** Offline stand-in: serves documents from a map, recording the
    * provider symbols it was asked for (so specs can assert the alias
    * mapping crossed the boundary correctly). */
  final class StubFetcher(docs: Map[String, String]) extends DocumentFetcher {
    val requested = scala.collection.mutable.ArrayBuffer.empty[String]
    override def fetch(providerSymbol: String): Option[String] = {
      requested += providerSymbol
      docs.get(providerSymbol)
    }
  }

  /**
   * Fetch `symbols` (canonical form) through `fetcher` and parse the
   * results into the rawTable shape. Mirrors the reference loop:
   * canonical → provider alias before the call (`get_stock.py:57`),
   * invalid documents dropped (the series-key check lives in
   * `Ingest.valid`, applied during parse — `get_stock.py:64-68`), and
   * `rateLimitMillis` of sleep between consecutive calls
   * (`get_stock.py:115`; 15 000 in the reference, 0 for tests).
   */
  def fetchDocuments(spark: SparkSession, symbols: Seq[String],
                     fetcher: DocumentFetcher,
                     rateLimitMillis: Long = 0L): DataFrame = {
    val docs = symbols.zipWithIndex.flatMap { case (canonical, i) =>
      if (i > 0 && rateLimitMillis > 0) Thread.sleep(rateLimitMillis)
      fetcher.fetch(Schemas.symbolAliases.getOrElse(canonical, canonical))
    }
    Ingest.parseDocuments(spark, docs)
  }
}
