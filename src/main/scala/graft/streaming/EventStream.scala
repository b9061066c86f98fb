package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A13: Structured Streaming surface — the reference processor's
  * incremental channel building (append mode, base.py:146-221) re-expressed
  * as a watermarked streaming pipeline.
  *
  * At scale this is the live-ingest path: `readStream` over a file/queue
  * source with the same schema, watermark bounds state, and the gap
  * sessionizer carries exactly one open chunk per channel in state —
  * state size is O(channels), not O(samples).
  */
object EventStream {

  /** One sample event on the stream (ts = event time). */
  final case class Event(eventId: Long, ts: java.sql.Timestamp, userId: Long,
                         eventType: String, value: Double)

  /** A closed contiguous chunk (the streaming analogue of
    * TimeSeries.tsGapChunks output).
    */
  final case class Chunk(channel: String, startUs: Long, endUs: Long, nSamples: Long)

  /** Streaming state: the one open chunk per channel. */
  final case class OpenChunk(startUs: Long, lastUs: Long, n: Long)


  /** Full-precision µs from a Timestamp (getTime alone is ms-granular). */
  private def tsToUs(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L

  /** Watermarked windowed channel aggregation (downsample-on-ingest):
    * the streaming twin of TimeSeries.tsResample. Late data beyond the
    * watermark is dropped; state is bounded by (channels x open windows).
    */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
                  win: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win).as("w"), col("eventType"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
      .select(col("w.start").as("bucket_start"), col("eventType"), col("n"),
        col("avg_value"), col("min_value"), col("max_value"))

  /** A spike detected on the stream (streaming twin of TimeSeries.tsSpike). */
  final case class Spike(channel: String, tsUs: Long, value: Double)

  /** Streaming state for spike detection: the last sample per channel. */
  final case class LastSample(us: Long, value: Double)

  /** Incremental threshold-crossing detection: state = last sample per
    * channel, so crossings are detected across microbatch boundaries.
    */
  def spikeDetect(events: Dataset[Event], threshold: Double): Dataset[Spike] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[LastSample, Spike](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (channel: String, batch: Iterator[Event], state: GroupState[LastSample]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var last = state.getOption
          val out = Seq.newBuilder[Spike]
          sorted.foreach { e =>
            val us = tsToUs(e.ts)
            last.foreach { p =>
              if (p.value < threshold && e.value >= threshold)
                out += Spike(channel, us, e.value)
            }
            last = Some(LastSample(us, e.value))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** A document arriving on the ingest stream. */
  final case class Doc(docId: Long, text: String)

  /** A first-seen document surviving streaming dedup. */
  final case class Kept(docId: Long, contentHash: String)

  /** The same whitespace-lowercase normalization + md5 as the batch
    * dedup (TextAnalysis.dedupExact), computed executor-side.
    */
  private def contentHash(text: String): String = {
    val norm = text.replaceAll("\\s+", " ").trim.toLowerCase(java.util.Locale.ROOT)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Streaming exact dedup: state = first-seen doc id per content hash,
    * so a duplicate arriving in ANY later microbatch is dropped (the
    * incremental twin of TextAnalysis.dedupExact; same normalization,
    * same lowest-id-wins keep rule within a batch). State is keyed by
    * the 128-bit hash — O(distinct documents), the same bound as
    * Spark's own streaming dropDuplicates; bound it further with a
    * watermarked key expiry when the dedup horizon is finite.
    */
  def streamingDedup(docs: Dataset[Doc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs
      .map(d => (d.docId, contentHash(d.text)))
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, Kept](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, batch: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val first = batch.map(_._1).min
            state.update(first)
            Iterator(Kept(first, hash))
          }
      }
  }

  /** A timestamped document on the ingest stream (event time drives the
    * dedup horizon).
    */
  final case class TimedDoc(docId: Long, ts: java.sql.Timestamp, text: String)

  /** Streaming dedup with a BOUNDED horizon: duplicates are dropped only
    * within the watermark window, and Spark expires the per-hash state
    * beyond it — the engine-native `dropDuplicatesWithinWatermark` path,
    * for infinite streams where O(distinct docs) state (C20's exact
    * variant) is not acceptable. Same content-hash key as the batch and
    * exact-streaming dedups.
    */
  def streamingDedupWindowed(docs: Dataset[TimedDoc], watermark: String = "10 minutes"): DataFrame =
    docs
      .map(d => (d.docId, d.ts, contentHash(d.text)))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.TIMESTAMP,
          org.apache.spark.sql.Encoders.STRING))
      .toDF("docId", "ts", "contentHash")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("contentHash")

  /** One (band_idx, band_hash) membership of an arriving document. */
  final case class BandArrival(docId: Long, ts: java.sql.Timestamp, bandIdx: Int, bandHash: Long)

  /** Streaming state per live LSH bucket: the first document that claimed
    * it, and when the claim lapses (newest arrival + horizon).
    */
  final case class BandBucket(firstDocId: Long, expiresAtMs: Long)

  /** An arriving document flagged as a near-duplicate of an earlier one
    * (they collided on MinHash band `bandIdx`).
    */
  final case class NearDupFlag(docId: Long, firstDocId: Long, bandIdx: Int, bandHash: Long)

  /** C20c: streaming FUZZY dedup — the live-ingest twin of the batch
    * MinHash-LSH near-dup pipeline (Dedup.dedupMinhash), extending exact
    * streaming dedup (C20) the way fuzzy decontamination (C23c) extended
    * exact (C23). Each arriving document explodes to its LSH band
    * hashes (the SAME native graft_minhash_bands kernel as batch, so
    * stream and batch bucket identically); state lives per ACTIVE bucket
    * via `flatMapGroupsWithState` keyed by (band_idx, band_hash), holding
    * only the first claiming doc id — a doc landing in a claimed bucket
    * is flagged against that first document.
    *
    * State is watermark-BOUNDED: each bucket's event-time timeout sits
    * `watermark` past its newest arrival, so the state size is
    * O(buckets live in the horizon), not O(corpus) — the infinite-stream
    * answer. A near-dup of a document older than the horizon is NOT
    * flagged (its buckets expired); that is the documented semantic,
    * exactly like `streamingDedupWindowed` for the exact variant.
    *
    * Parity (StreamingSpec): on an id-ordered timely stream the distinct
    * flagged doc ids equal the batch pipeline's higher-id pair members.
    */
  def streamingNearDupLsh(docs: Dataset[TimedDoc], k: Int = 3, nBands: Int = 8,
                          rowsPerBand: Int = 4,
                          watermarkMs: Long = 600000L): Dataset[NearDupFlag] = {
    import docs.sparkSession.implicits._
    val arrivals = docs.toDF()
      .withWatermark("ts", s"$watermarkMs milliseconds")
      .select(col("docId"), col("ts"),
        posexplode(expr(s"graft_minhash_bands(graft_shingle_hashes(text, $k), $nBands, $rowsPerBand)"))
          .as(Seq("bandIdx", "bandHash")))
      .as[BandArrival]
    arrivals
      .groupByKey(a => (a.bandIdx, a.bandHash))
      .flatMapGroupsWithState[BandBucket, NearDupFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, bandHash), batch, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // a lapsed claim must not flag new arrivals even when the
            // engine could not fire the timeout yet (a group receiving
            // data in the same batch its timeout passes is invoked
            // NORMALLY, with stale state) — so expiry is also enforced
            // here, from the expiry stamp carried in the state
            val wm = state.getCurrentWatermarkMs()
            var first = state.getOption.filter(_.expiresAtMs > wm).map(_.firstDocId)
            // deterministic within-batch order: event time, then doc id
            val rows = batch.toSeq.sortBy(a => (tsToUs(a.ts), a.docId))
            var maxTsMs = Long.MinValue
            val out = Seq.newBuilder[NearDupFlag]
            rows.foreach { a =>
              maxTsMs = math.max(maxTsMs, a.ts.getTime)
              first match {
                case Some(f) if f != a.docId =>
                  out += NearDupFlag(a.docId, f, bandIdx, bandHash)
                case None => first = Some(a.docId)
                case _ => ()
              }
            }
            // a late (in-watermark) batch whose arrivals are older than
            // the bucket's newest must not PULL the claim's expiry
            // backwards — expiry is max over all arrivals + horizon (a
            // lapsed claim's stamp is ≤ watermark, so it never wins)
            val expires = math.max(maxTsMs + watermarkMs,
              state.getOption.map(_.expiresAtMs).getOrElse(Long.MinValue))
            first.foreach(f => state.update(BandBucket(f, expires)))
            // engine-side cleanup: fire once the watermark passes the
            // claim (never at/below the current watermark — API contract)
            state.setTimeoutTimestamp(math.max(expires, wm + 1))
            out.result().iterator
          }
      }
  }

  /** A media fingerprint arriving on the live ingest (C74/C74c output). */
  final case class TimedMediaHash(mediaId: Long, ts: java.sql.Timestamp, phash: Long)

  /** Streaming state per live perceptual-hash band bucket: the claiming
    * media's id AND full 64-bit hash (the Hamming verify needs it), plus
    * the claim's expiry stamp.
    */
  final case class PhashBucket(firstId: Long, firstPhash: Long, expiresAtMs: Long)

  /** An arriving media item flagged as a near-duplicate of an earlier one
    * (band collision + exact Hamming verify against the claim).
    */
  final case class PhashFlag(mediaId: Long, firstId: Long, hamming: Int, bandIdx: Int)

  /** C74e: streaming media near-dup detection — the live-ingest twin of
    * the batch banded perceptual-hash kernel (Multimodal.hashBandDedup,
    * shared by image C74b and audio C74d: after the fingerprint pass
    * modality is gone, so ONE stream operator serves both). Arrivals
    * explode to the same 4×16-bit bands as batch; state lives per ACTIVE
    * bucket via `flatMapGroupsWithState`, and — unlike C20c's
    * candidate-only MinHash buckets — the claim carries the full 64-bit
    * fingerprint so the batch kernel's EXACT popcount verify runs inline:
    * a band collision beyond `maxHamming` neither flags nor steals the
    * claim. A flagged pair can surface once per shared band (bandIdx is
    * in the output, C20c's contract) — Append mode cannot dedupe across
    * band groups; consumers key by (mediaId, firstId).
    *
    * Same watermark-bounded state story as C20c: each bucket expires
    * `watermark` past its newest arrival (stale-state expiry enforced
    * in-handler too), so state is O(buckets live in the horizon) on an
    * infinite stream, and a re-encode of media older than the horizon is
    * NOT flagged — the documented semantic.
    */
  def streamingPhashDedup(hashes: Dataset[TimedMediaHash], maxHamming: Int = 6,
                          watermarkMs: Long = 600000L): Dataset[PhashFlag] = {
    import hashes.sparkSession.implicits._
    val bandArr = expr("array(" +
      (0 until 4).map(i => s"shiftright(phash, ${i * 16}) & 65535").mkString(", ") + ")")
    val arrivals = hashes.toDF()
      .withWatermark("ts", s"$watermarkMs milliseconds")
      .select(col("mediaId"), col("ts"), col("phash"),
        posexplode(bandArr).as(Seq("bandIdx", "bandHash")))
      .as[(Long, java.sql.Timestamp, Long, Int, Long)]
    arrivals
      .groupByKey(a => (a._4, a._5))
      .flatMapGroupsWithState[PhashBucket, PhashFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, _), batch, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            var claim = state.getOption.filter(_.expiresAtMs > wm)
              .map(b => (b.firstId, b.firstPhash))
            val rows = batch.toSeq.sortBy(a => (tsToUs(a._2), a._1))
            var maxTsMs = Long.MinValue
            val out = Seq.newBuilder[PhashFlag]
            rows.foreach { case (id, ts, ph, _, _) =>
              maxTsMs = math.max(maxTsMs, ts.getTime)
              claim match {
                case Some((fid, fph)) if fid != id =>
                  val d = java.lang.Long.bitCount(ph ^ fph)
                  if (d <= maxHamming) out += PhashFlag(id, fid, d, bandIdx)
                case None => claim = Some((id, ph))
                case _ => ()
              }
            }
            val expires = math.max(maxTsMs + watermarkMs,
              state.getOption.map(_.expiresAtMs).getOrElse(Long.MinValue))
            claim.foreach { case (fid, fph) => state.update(PhashBucket(fid, fph, expires)) }
            state.setTimeoutTimestamp(math.max(expires, wm + 1))
            out.result().iterator
          }
      }
  }

  /** C20b: STREAM-STATIC decontamination — the live-ingest twin of
    * TextAnalysis.decontaminate. Each arriving document's k-gram shingle
    * hashes join against a STATIC benchmark hash relation (the classic
    * Structured Streaming stream-static join: the static side is
    * broadcast and needs no watermark or stream-stream state), emitting
    * (docId, n_shared_grams) for contaminated arrivals in Update mode.
    * The join is inner, so CLEAN documents never reach the aggregation:
    * streaming state is O(flagged docs) — the contamination hit list
    * itself, not the corpus. Same shingle kernel AND same corpus
    * boundary as the batch operator (benchmark members re-arriving on
    * the stream — docId < benchMaxId — are excluded, exactly like the
    * batch side's corpus filter), so batch and stream flag identical
    * documents.
    */
  def streamingDecontaminate(docs: Dataset[Doc], benchHashes: DataFrame, k: Int = 5,
                             benchMaxId: Long = 25L): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .filter(col("docId") >= benchMaxId)
      .select(col("docId"), explode(expr(s"graft_shingle_hashes(text, $k)")).as("h"))
      .join(broadcast(benchHashes.select(col("h")).distinct()), Seq("h"))
      // the shingle kernel emits DISTINCT hashes per doc and the bench
      // side is deduplicated, so within ONE arrival the joined (docId, h)
      // pairs are unique — but an at-least-once source can re-deliver a
      // contaminated document in a later micro-batch, and Update-mode
      // counts accumulate across batches. Dedup the flagged pairs before
      // counting: redelivery becomes idempotent, and because this sits
      // AFTER the inner join the dedup state is still O(flagged grams) —
      // the contamination hit list, not the corpus. count(*) then IS the
      // distinct count (streaming forbids count_distinct).
      //
      // State-lifetime caveat: this dedup state is NEVER evicted (no
      // event time on [[Doc]]), so on a long-running query it grows with
      // the all-time contamination hit list — unlike the sibling
      // operators' watermark-bounded state. Fine when the benchmark (and
      // so the maximum possible hit list) is small; for an unbounded run
      // use the [[TimedDoc]] overload below, whose dedup state evicts
      // with the watermark.
      .dropDuplicates("docId", "h")
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Watermark-bounded deployment form of [[streamingDecontaminate]]:
    * identical flagging semantics, but the redelivery-idempotence dedup
    * runs `dropDuplicatesWithinWatermark`, so its state holds only the
    * flagged grams inside the event-time horizon instead of the all-time
    * hit list. A redelivery WITHIN the watermark dedups exactly; one
    * arriving later than the watermark delay re-counts (the standard
    * within-watermark trade — at-least-once sources re-deliver promptly,
    * so the horizon is the right bound). The per-doc count aggregation
    * state remains O(flagged docs), the output relation itself.
    */
  def streamingDecontaminate(docs: Dataset[TimedDoc], benchHashes: DataFrame, k: Int,
                             benchMaxId: Long, watermark: String): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .withWatermark("ts", watermark)
      .filter(col("docId") >= benchMaxId)
      .select(col("docId"), col("ts"), explode(expr(s"graft_shingle_hashes(text, $k)")).as("h"))
      .join(broadcast(benchHashes.select(col("h")).distinct()), Seq("h"))
      .dropDuplicatesWithinWatermark("docId", "h")
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Streaming heavy hitters: the Misra–Gries token summary (C30's
    * `graft_heavy_hitters` TypedImperativeAggregate) over tumbling
    * event-time windows — a mergeable sketch is exactly what a
    * streaming aggregation needs, so the SAME native aggregate serves
    * batch and stream: partial buffers merge across microbatches in the
    * window state (O(capacity) per window), and each window's final
    * summary emits once its watermark passes. The per-window trending
    * vocabulary a live ingest dashboard shows.
    */
  def streamingHeavyHitters(docs: Dataset[TimedDoc], capacity: Int = 64,
                            windowLen: String = "10 minutes",
                            watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(expr("split(trim(lower(text)), '\\\\s+')")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"graft_heavy_hitters(token, $capacity)").as("top"))
      .select(col("window.start").as("window_start"), explode(col("top")).as("e"))
      .select(col("window_start"), col("e.item").as("token"), col("e.count").as("cnt"))
  }

  /** C65b: streaming distinct-token sketch — per-window vocabulary-size
    * estimates through the native `graft_hll` aggregate (C65's batch
    * twin). The sketch's register-max merge is associative, commutative
    * and IDEMPOTENT, which is exactly what a streaming aggregate's
    * incremental state update needs: each microbatch merges its partial
    * registers into the window's state, and the estimate after any
    * arrival order / microbatch split equals the batch estimate over
    * the same rows (StreamingSpec asserts stream == batch exactly).
    * State per open window is one 2^p-byte register array — bounded by
    * (open windows), independent of token volume.
    */
  def streamingDistinct(docs: Dataset[TimedDoc], p: Int = 12,
                        windowLen: String = "10 minutes",
                        watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    docs.toDF()
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(expr("split(trim(lower(text)), '\\\\s+')")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_tokens"), expr(s"graft_hll(token, $p)").as("est_distinct"))
      .select(col("window.start").as("window_start"), col("n_tokens"), col("est_distinct"))
  }

  /** C38c: streaming DSIR quality gate — score arriving documents
    * against a batch-fitted [[graft.operators.TextAnalysis.DsirModel]]
    * and keep those at or above `minLogw`. The live-ingest twin of the
    * C38 batch scorer, and the simplest kind of streaming operator
    * there is: the bounded model rides inside the plan as a literal map
    * Column, so scoring is a STATELESS narrow projection — no state
    * store, no watermark, no shuffle, and exact batch==stream parity by
    * construction (same scoring expression, same fold order). Arrivals
    * with unseen feature buckets score through the model's add-α
    * fallback, exactly like held-out batch scoring.
    */
  def streamingDsirScore(docs: Dataset[Doc],
                         model: graft.operators.TextAnalysis.DsirModel,
                         minLogw: Double = Double.NegativeInfinity): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    import graft.functions.roundHalfUp
    docs.toDF()
      .select(col("docId"), TextAnalysis.dsirNFeats(model).as("n_feats"),
        roundHalfUp(TextAnalysis.dsirScoreCol(model), 3).as("logw"))
      .filter(col("logw") >= minLogw)
  }

  /** A consecutive-pair transition observed on the event stream. */
  final case class Transition(userId: Long, fromType: String, toType: String, us: Long)

  /** Streaming state for transition mining: the user's last event. */
  final case class LastEvent(us: Long, eventId: Long, eventType: String)

  /** B24b: streaming transition mining — the live-ingest twin of
    * EventAnalytics.eventTransitions. State = the LAST event per user
    * (one tiny row), so consecutive pairs are detected across microbatch
    * boundaries exactly as the batch lead-window sees them; the emitted
    * transition stream feeds the same type²-cardinality count the batch
    * op runs (stream==batch parity asserted in the spec). In-batch
    * events sort by (event time, event_id) — the batch op's exact tie
    * rule. State is O(users) regardless of stream length, the same
    * bound the B17 sessionizer carries; nothing per-event is retained.
    */
  def streamingTransitions(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (tsToUs(e.ts), e.eventId))
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            val us = tsToUs(e.ts)
            last.foreach(p => out += Transition(user, p.eventType, e.eventType, us))
            last = Some(LastEvent(us, e.eventId, e.eventType))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** An upserted latest-state row (the streaming analogue of
    * EventAnalytics.latestState output, emitted per touched key per
    * microbatch — the changelog an upsert sink consumes).
    */
  final case class StateRow(userId: Long, eventType: String, tsUs: Long,
                            eventId: Long, value: Double, nVersions: Long)

  /** Streaming state: the winning (us, event_id, value) version + count. */
  final case class LatestVersion(us: Long, eventId: Long, value: Double, n: Long)

  /** B18b: streaming latest-per-key compaction — the live-ingest twin of
    * EventAnalytics.latestState. State = ONE row per (user, type): the
    * version winning the batch op's exact max-struct order (us, then
    * event_id — value never decides), plus the version count; a LATE
    * arrival (older timestamp landing in a later microbatch) counts
    * toward n_versions but can never displace the newer state, exactly
    * as the batch max over the full changelog behaves. Each microbatch
    * emits the updated compaction row for every touched key, so after
    * any prefix of the stream the last emission per key IS the batch
    * answer over the events so far (spec-asserted stream==batch parity).
    * State is O(live keys), independent of changelog length.
    */
  def streamingLatestState(events: Dataset[Event]): Dataset[StateRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.userId, e.eventType))
      .flatMapGroupsWithState[LatestVersion, StateRow](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), batch: Iterator[Event], state: GroupState[LatestVersion]) =>
          var st = state.getOption
          var touched = false
          batch.foreach { e =>
            touched = true
            val us = tsToUs(e.ts)
            st = Some(st match {
              case Some(s) =>
                val newer = us > s.us || (us == s.us && e.eventId > s.eventId)
                if (newer) LatestVersion(us, e.eventId, e.value, s.n + 1) else s.copy(n = s.n + 1)
              case None => LatestVersion(us, e.eventId, e.value, 1L)
            })
          }
          if (!touched) Iterator.empty
          else {
            val s = st.get
            state.update(s)
            Iterator.single(StateRow(key._1, key._2, s.us, s.eventId, s.value, s.n))
          }
      }
  }

  /** One clamped-balance ledger row on the live stream (the streaming
    * twin of EventAnalytics.runningBalance output).
    */
  final case class BalanceRow(userId: Long, eventId: Long, tsUs: Long,
                              deltaCents: Long, balanceCents: Long, clamped: Boolean)

  /** B37b: streaming clamped running balance — the live-ingest twin of
    * EventAnalytics.runningBalance: b = max(0, b + Δ) per user, exact
    * integer cents, the clamp's non-associativity handled the only way
    * a stream can — one long of state per user carried across
    * microbatches. In-batch events sort by (event time, event_id), the
    * batch tie rule, so a replay of the whole stream emits row-for-row
    * the batch operator's output (spec-asserted parity). Untracked
    * event types are filtered BEFORE the shuffle.
    */
  def streamingBalance(events: Dataset[Event],
                       creditTypes: Set[String] = Set("purchase", "signup"),
                       debitTypes: Set[String] = Set("click", "error")): Dataset[BalanceRow] = {
    import events.sparkSession.implicits._
    require(creditTypes.intersect(debitTypes).isEmpty, "credit/debit types must be disjoint")
    events
      .filter(e => creditTypes.contains(e.eventType) || debitTypes.contains(e.eventType))
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Long, BalanceRow](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val sorted = batch.toSeq.sortBy(e => (tsToUs(e.ts), e.eventId))
          var bal = state.getOption.getOrElse(0L)
          val out = sorted.map { e =>
            val c = math.floor(e.value * 100.0 + 0.5).toLong
            val d = if (creditTypes.contains(e.eventType)) c else -c
            val raw = bal + d
            val clamped = raw < 0L
            bal = if (clamped) 0L else raw
            BalanceRow(user, e.eventId, tsToUs(e.ts), d, bal, clamped)
          }
          state.update(bal)
          out.iterator
      }
  }

  /** An annotation arriving on its own stream (the live twin of A10's
    * annotation relation: channel + instant + label).
    */
  final case class Anno(aType: String, ats: java.sql.Timestamp, label: String)

  /** A36: watermarked STREAM-STREAM interval join — samples and
    * annotations arrive on independent live streams and every sample
    * joins the annotations of its channel within the trailing
    * `tolUs` window (A10's batch annotation join, live on both sides).
    * The capability class none of the single-stream stateful ops cover:
    * Spark buffers BOTH sides in watermark-bounded state, so a sample
    * can match an annotation that arrives microbatches later, and
    * state for instants older than the watermark is reclaimed — the
    * time-range join predicate is exactly what makes that cleanup
    * provable for the engine.
    *
    * Scale shape: state is bounded by watermark × arrival rate per
    * side (never stream length); the join itself hash-partitions on
    * the channel key. Late annotations beyond the watermark drop.
    */
  def streamingAnnotate(samples: Dataset[Event], annos: Dataset[Anno],
                        watermark: String = "10 minutes",
                        tolUs: Long = 300L * 1000000): DataFrame = {
    val s = samples.toDF().withWatermark("ts", watermark)
    val a = annos.toDF().withWatermark("ats", watermark)
    s.join(a,
      col("eventType") === col("aType") &&
        col("ats") >= col("ts") - expr(s"INTERVAL $tolUs MICROSECONDS") &&
        col("ats") <= col("ts"))
      .select(col("eventType"), col("eventId"),
        expr("unix_micros(ts)").as("ts_us"), col("value"),
        expr("unix_micros(ats)").as("anno_us"), col("label"))
  }

  /** An outlier flagged on the live stream against the channel's own
    * PAST (never its future — the honest streaming semantics).
    */
  final case class OutlierOut(channel: String, tsUs: Long, eventId: Long,
                              value: Double, z: Double)

  /** Streaming state for [[streamingOutlier]]: exact integer running
    * moments of every sample seen so far — n, Σcents, Σcents². Two longs
    * and a count, independent of stream length; Σc² stays inside int64
    * up to ~10¹⁰ samples per channel at 4-digit values.
    */
  final case class RunningMoments(n: Long, s: Long, q: Long)

  /** A19b: streaming outlier detection — the live-ingest twin of
    * TimeSeries.tsOutlier. The batch op scores against the WHOLE
    * record's mean/σ; a stream cannot know its future, so the honest
    * twin is the expanding z-score: each sample scores against the
    * running mean/σ of all PRIOR samples of its channel (Welford-style,
    * here as exact integer moments), and the first `minPrior` samples
    * only warm the state. Cross-microbatch state makes the flag
    * identical to a single-pass replay of the whole stream; in-batch
    * events sort by (event time, event_id) — the batch tie rule.
    *
    * Determinism: moments are EXACT longs (cents), so μ/σ² are the same
    * fixed-order double expressions the batch operators use —
    * bit-reproducible across microbatch boundaries and replays; the
    * cut applies to the ROUNDED z (A19's discipline). State is O(channels).
    */
  def streamingOutlier(events: Dataset[Event], zCut: Double = 3.0,
                       minPrior: Long = 30L): Dataset[OutlierOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[RunningMoments, OutlierOut](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (channel: String, batch: Iterator[Event], state: GroupState[RunningMoments]) =>
          val sorted = batch.toSeq.sortBy(e => (tsToUs(e.ts), e.eventId))
          var st = state.getOption.getOrElse(RunningMoments(0L, 0L, 0L))
          val out = Seq.newBuilder[OutlierOut]
          sorted.foreach { e =>
            val c = math.floor(e.value * 100.0 + 0.5).toLong
            if (st.n >= minPrior) {
              val mu = st.s.toDouble / st.n / 100.0
              val variance =
                (st.q.toDouble - st.s.toDouble * st.s.toDouble / st.n) / (st.n - 1) / 10000.0
              if (variance > 0.0) {
                val z = math.floor((e.value - mu) / math.sqrt(variance) * 1000.0 + 0.5) / 1000.0
                if (math.abs(z) >= zCut)
                  out += OutlierOut(channel, tsToUs(e.ts), e.eventId, e.value, z)
              }
            }
            st = RunningMoments(st.n + 1, st.s + c, st.q + c * c)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** A closed user session (the streaming analogue of
    * EventAnalytics.userSessions output).
    */
  final case class SessionOut(userId: Long, sessionId: Long, startUs: Long,
                              endUs: Long, nEvents: Long, nTypes: Long)

  /** Streaming state: the one open session per user. The distinct-type
    * set is bounded by event-TYPE cardinality (a product catalog of
    * event names), never by session length.
    */
  final case class OpenSession(sessionId: Long, startUs: Long, lastUs: Long,
                               n: Long, types: Set[String])

  /** B17b: streaming gap sessionization per user — the live-ingest twin
    * of EventAnalytics.userSessions. One open session per user lives in
    * GroupState (O(users) state, independent of stream length); an
    * event beyond `gapUs` of the session's last activity CLOSES it —
    * emitting the same (session_id, start, end, n_events, n_types) row
    * the batch window pipeline derives — and opens the next with the
    * batch op's 1-based session numbering. In-batch events sort by
    * (event time, event_id), the batch tie rule, so stream==batch
    * parity holds row-for-row on closed sessions (spec-asserted); the
    * final still-open session per user is intentionally unemitted —
    * on a live stream it is not over yet.
    */
  def streamingSessions(events: Dataset[Event],
                        gapUs: Long = 1800L * 1000000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, SessionOut](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (tsToUs(e.ts), e.eventId))
          var open = state.getOption
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val us = tsToUs(e.ts)
            open match {
              case Some(s) if us - s.lastUs > gapUs =>
                out += SessionOut(user, s.sessionId, s.startUs, s.lastUs, s.n, s.types.size.toLong)
                open = Some(OpenSession(s.sessionId + 1, us, us, 1, Set(e.eventType)))
              case Some(s) =>
                open = Some(s.copy(lastUs = us, n = s.n + 1, types = s.types + e.eventType))
              case None =>
                open = Some(OpenSession(1L, us, us, 1, Set(e.eventType)))
            }
          }
          open.foreach(state.update)
          out.result().iterator
      }
  }

  /** Stateful gap sessionization: one open chunk per channel lives in
    * GroupState; a gap > gapUs closes and emits the chunk. Mirrors
    * discontinuous_chunks (reference base.py:322-342) incrementally.
    */
  def gapSessionize(events: Dataset[Event], gapUs: Long): Dataset[Chunk] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[OpenChunk, Chunk](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (channel: String, batch: Iterator[Event], state: GroupState[OpenChunk]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime) // per-channel per-microbatch, bounded
          var open = state.getOption
          val closed = Seq.newBuilder[Chunk]
          sorted.foreach { e =>
            val us = tsToUs(e.ts)
            open match {
              case Some(oc) if us - oc.lastUs > gapUs =>
                closed += Chunk(channel, oc.startUs, oc.lastUs, oc.n)
                open = Some(OpenChunk(us, us, 1))
              case Some(oc) =>
                open = Some(oc.copy(lastUs = us, n = oc.n + 1))
              case None =>
                open = Some(OpenChunk(us, us, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
