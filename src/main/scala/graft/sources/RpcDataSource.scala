package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.{ChainClient, Fetch, HeightChunk}

/** HTTP transport contract for the source. Implementations need a
  * no-arg constructor (or be a Scala `object`) so executors can
  * instantiate them from the class name carried in the scan options —
  * closures can't ride through DataSourceV2. */
trait RpcFetcher extends Serializable {
  def fetch(url: String): String
}

/** Production transport: plain blocking java.net.http. Retries are
  * bounded (Spark task retry is the outer loop, unlike the reference's
  * infinite sleep-retry, extract.py:352-370). */
final class JavaHttpFetcher extends RpcFetcher {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    // bounded, always: the JDK defaults are INFINITE, and a node that
    // accepts the connection but never answers would hang the task (or
    // a driver-side tip probe) forever — a hang never fails, so neither
    // task retry nor the stream's restart policy ever gets a chance
    .connectTimeout(java.time.Duration.ofSeconds(15))
    .build()

  override def fetch(url: String): String = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(JavaHttpFetcher.escapeUrl(url)))
      .timeout(java.time.Duration.ofSeconds(60))
      .GET().build()
    val rsp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(rsp.statusCode() == 200, s"HTTP ${rsp.statusCode()} for $url")
    rsp.body()
  }
}

object JavaHttpFetcher {
  /** Percent-encode every character java.net.URI rejects in a query
    * string. The URL builders (Fetch.txSearchUrl etc.) deliberately emit
    * the reference's human-readable format verbatim (literal spaces,
    * quotes, comparison operators — extract.py:150): that string is the
    * cross-transport contract, and test fetchers pattern-match it raw;
    * escaping is each HTTP transport's job. '%' is encoded too — the
    * builders never emit escapes, so a literal '%' must not be
    * misread as one. '#' is encoded too: the builders never need a raw
    * fragment delimiter, and an unescaped '#' inside a query value would
    * make java.net.URI silently truncate the query at the fragment. */
  def escapeUrl(url: String): String = {
    val keep = ((('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')) ++
      "-._~!$&'()*+,;=:@/?").toSet
    url.flatMap { c =>
      if (keep(c)) c.toString
      else c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    }
  }
}

/** DataSourceV2 batch source for Tendermint RPC page scans
  * (SURVEY §2.1 S1/S4 as a first-class `spark.read.format(...)`):
  *
  * {{{
  * spark.read.format("tendermint-rpc")
  *   .option("url", "http://node:26657").option("kind", "txs")
  *   .option("start", 100).option("end", 10000)
  *   .option("chunk", 1000).option("perPage", 100)
  *   .load()          // one Spark input partition per height chunk
  * }}}
  *
  * Output: one row per fetched page `(start, end, page, per_page, body,
  * quarantined)`. The height-range predicate is pushed down by
  * construction — each partition IS a range predicate (the reference
  * embeds it in the URL, extract.py:150). Adaptive per-page degrade and
  * quarantine run inside the partition reader via Fetch.fetchChunk.
  */
class RpcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tendermint-rpc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RpcDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // DSv2 options are case-INsensitive by convention (the engine hands
    // scan builders a CaseInsensitiveStringMap); normalizing once here
    // keeps every downstream lookup honest — a miscased .option("Start",
    // ...) used to fall back to its default silently
    new RpcTable(properties.asScala.toMap.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v })
}

object RpcDataSource {
  val schema: StructType = StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("end", LongType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("per_page", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("quarantined", BooleanType, nullable = false)))

  private[sources] def instantiateFetcher(className: String): RpcFetcher =
    if (className.endsWith("$"))
      Class.forName(className).getField("MODULE$").get(null).asInstanceOf[RpcFetcher]
    else
      Class.forName(className).getDeclaredConstructor().newInstance().asInstanceOf[RpcFetcher]
}

final class RpcTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"tendermint-rpc(${options.getOrElse("url", "?")})"
  override def schema(): StructType = RpcDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new RpcScanBuilder(options)
}

final class RpcScanBuilder(options: Map[String, String]) extends ScanBuilder with Scan with Batch {
  private def opt(key: String): String = options.getOrElse(key,
    throw new IllegalArgumentException(s"tendermint-rpc: missing option '$key'"))

  override def build(): Scan = this
  override def readSchema(): StructType = RpcDataSource.schema
  // must not throw: streaming reads have no "end" option, and the
  // engine renders description() in explain/UI/event-log for every
  // micro-batch plan
  override def description(): String =
    s"tendermint-rpc scan heights [${options.getOrElse("start", "1")}, " +
      s"${options.getOrElse("end", "unbounded")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val chunkSize = options.getOrElse("chunk", "1000").toLong
    Fetch.chunks(opt("start").toLong, opt("end").toLong, chunkSize)
      .map(c => RpcInputPartition(c.start, c.end): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RpcReaderFactory(
      opt("url"),
      options.getOrElse("kind", "txs"),
      options.getOrElse("perpage", options.getOrElse("perPage", "100")).toInt,
      options.getOrElse("fetcher", classOf[JavaHttpFetcher].getName))

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RpcMicroBatchStream(options)
}

/** Stream offset = highest height the stream has planned (inclusive). */
final case class RpcOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

/** Streaming upgrade of the reference's sync loop (SURVEY §2.9): the
  * pipeline's "poll tip → extract [last+1, min(tip, last+num_blocks)]"
  * batch iteration (pipelines/pipeline.py:115-131) becomes a
  * MicroBatchStream whose offset is the last planned block height —
  * checkpointed by Structured Streaming, which replaces the reference's
  * hand-rolled metadata.json watermark with exactly-once offset
  * tracking:
  *
  * {{{
  * spark.readStream.format("tendermint-rpc")
  *   .option("url", ...).option("kind", "txs")
  *   .option("start", 100)            // first height on a fresh checkpoint
  *   .option("maxBlocksPerBatch", 10000)  // reference num_blocks
  *   .load()
  * }}}
  *
  * Each micro-batch fans the admitted height window out as one input
  * partition per `chunk` heights (same reader as the batch path, same
  * adaptive per-page degrade + quarantine). An empty window (tip not
  * advanced) yields no batch.
  */
final class RpcMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  private def opt(key: String): String = options.getOrElse(key,
    throw new IllegalArgumentException(s"tendermint-rpc: missing option '$key'"))

  private val url = opt("url")
  private val chunkSize = options.getOrElse("chunk", "1000").toLong
  private val maxPerBatch = // reference sync batch: num_blocks = 10000
    options.getOrElse("maxblocksperbatch",
      options.getOrElse("maxBlocksPerBatch", "10000")).toLong
  private val fetcherClass = options.getOrElse("fetcher", classOf[JavaHttpFetcher].getName)
  @transient private lazy val fetcher = RpcDataSource.instantiateFetcher(fetcherClass)

  // DRIVER-side probe: there is no task-retry outer loop up here, and
  // latestOffset runs once per micro-batch — a single transient 502 on
  // /abci_info would otherwise kill a long-running stream. Bounded
  // linear-backoff retry, then rethrow (the stream's restart policy is
  // the next layer, not an infinite in-place loop).
  private def tip(): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return ChainClient.parseTip(fetcher.fetch(Fetch.abciInfoUrl(url)))
      catch {
        case e: Exception if attempt < 3 => Thread.sleep(500L * attempt)
      }
    }
    sys.error("unreachable")
  }

  // Trigger.AvailableNow: pin the tip once at query start; the engine
  // then drains [last, pinnedTip] in maxBlocksPerBatch-capped batches
  // and stops — the reference's one-shot `make pipeline` sync, with
  // streaming's checkpointed exactly-once bookkeeping.
  @volatile private var pinnedTip: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = pinnedTip = Some(tip())

  // "last planned height" before anything is planned = start - 1
  override def initialOffset(): Offset =
    RpcOffset(options.getOrElse("start", "1").toLong - 1)

  /** Admission control is where the batch cap belongs: the admitted end
    * offset is what the engine commits, so capping anywhere later (e.g.
    * partition planning) would silently skip the un-planned heights.
    * min(tip, last + maxBlocksPerBatch) — exactly the reference's
    * `determine_sync_range` arithmetic, with catch-up across batches. */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val last = startOffset.asInstanceOf[RpcOffset].height
    // never below `last`: a lagging node behind a load balancer (or a
    // rolled-back chain) can answer with a tip BELOW the committed
    // offset; writing that regressed offset to the log would make the
    // next advance re-plan already-fetched heights — duplicates in the
    // sink. Hold position until the tip catches up instead.
    RpcOffset(math.max(last, math.min(pinnedTip.getOrElse(tip()), last + maxPerBatch)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Un-capped tip, for progress reporting. */
  override def reportLatestOffset(): Offset = RpcOffset(tip())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[RpcOffset].height + 1
    val hi = end.asInstanceOf[RpcOffset].height
    if (hi < lo) Array.empty
    else Fetch.chunks(lo, hi, chunkSize)
      .map(c => RpcInputPartition(c.start, c.end): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RpcReaderFactory(
      url,
      options.getOrElse("kind", "txs"),
      options.getOrElse("perpage", options.getOrElse("perPage", "100")).toInt,
      fetcherClass)

  override def deserializeOffset(json: String): Offset = RpcOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class RpcInputPartition(start: Long, end: Long) extends InputPartition

final class RpcReaderFactory(url: String, kind: String, perPage: Int,
    fetcherClass: String) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RpcInputPartition]
    val fetcher = RpcDataSource.instantiateFetcher(fetcherClass)
    val urlOf: (Long, Long, Int, Int) => String =
      if (kind == "blocks") Fetch.blockSearchUrl(url, _, _, _, _)
      else Fetch.txSearchUrl(url, _, _, _, _)
    val results = Fetch.fetchChunk(
      HeightChunk(p.start, p.end), perPage, fetcher.fetch, urlOf,
      ChainClient.parseTotalCount).iterator

    new PartitionReader[InternalRow] {
      private var current: graft.ingest.FetchResult = _
      override def next(): Boolean = {
        if (!results.hasNext) return false
        current = results.next(); true
      }
      override def get(): InternalRow = InternalRow(
        current.start, current.end, current.page, current.perPage,
        current.body.map(UTF8String.fromString).orNull,
        current.quarantined)
      override def close(): Unit = ()
    }
  }
}
