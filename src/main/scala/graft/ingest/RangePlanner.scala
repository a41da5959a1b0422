package graft.ingest

/** Pure range-planning arithmetic for the sync / backfill / gap-fill
  * protocol (reference pipelines/pipeline.py:16-62, 99-109, 115-131).
  * Heights are inclusive on both ends everywhere, matching the RPC query
  * `tx.height>={start} AND tx.height<={end}`.
  *
  * Driver-side only: these decide *what* to fetch; the fetch itself fans
  * out as Spark tasks (see [[ChainClient]] / SURVEY §2.1 S1-S4).
  */
object RangePlanner {

  /** Sync the most recent window (pipeline.py:20-41):
    * end = node tip; start = max(tip − numBlocks, maxIngested + 1,
    * chainFloor) — never refetch what's ingested, never below the
    * node's pruning floor.
    *
    * Intended-semantics repair: the reference guards on the MIN ingested
    * height (pipeline.py:31,39 uses get_min_height_from_files), so any
    * run where the tip advanced by less than numBlocks re-fetches and
    * re-ingests the entire already-ingested window above that minimum —
    * duplicate rows in the parsed zone on every incremental sync. The
    * correct clip for "don't refetch" is the MAX ingested height + 1
    * (pinned by IngestSpec/PropertySpec). */
  def syncRange(tip: Long, chainFloor: Long, maxIngested: Long, numBlocks: Long): (Long, Long) =
    (Seq(tip - numBlocks, maxIngested + 1, chainFloor).max, tip)

  /** Backfill backwards from the oldest ingested block
    * (pipeline.py:44-62): end = minIngested − 1;
    * start = max(end − numBlocks + 1, chainFloor). */
  def backfillRange(chainFloor: Long, minIngested: Long, numBlocks: Long): (Long, Long) = {
    val end = minIngested - 1
    (math.max(end - numBlocks + 1, chainFloor), end)
  }

  /** The chunked backfill loop (pipeline.py:126-128): emit
    * `(start, min(start + numBlocks, end))` then advance by
    * numBlocks + 1 (each chunk spans numBlocks + 1 inclusive heights).
    *
    * Intended-semantics repair: the reference loops `while start < end`,
    * which silently drops the last height whenever the final remainder is
    * exactly one block (start == end) — and then re-plans and re-drops it
    * on every subsequent run. We loop `while s <= end` so chunks always
    * cover [start, end] exactly (pinned by PropertySpec). */
  def backfillChunks(start: Long, end: Long, numBlocks: Long): Seq[(Long, Long)] = {
    // numBlocks = -1 would advance s by zero each loop: hang + OOM
    require(numBlocks >= 0, s"numBlocks must be >= 0, got $numBlocks")
    val out = Seq.newBuilder[(Long, Long)]
    var s = start
    while (s <= end) {
      out += ((s, math.min(s + numBlocks, end)))
      s += numBlocks + 1
    }
    out.result()
  }

  /** Gap-fill planning from quarantined heights
    * (pipeline.py:99-109: one height per line in
    * errors/error_heights.txt): collapse sorted distinct heights into
    * inclusive contiguous ranges. */
  def gapFillRanges(errorHeights: Seq[Long]): Seq[(Long, Long)] = {
    val hs = errorHeights.distinct.sorted
    if (hs.isEmpty) Nil
    else hs.tail.foldLeft(List((hs.head, hs.head))) {
      case ((s, e) :: acc, h) if h == e + 1 => (s, h) :: acc
      case (acc, h)                         => (h, h) :: acc
    }.reverse
  }
}
