package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.math.RoundingMode
import java.sql.Timestamp

/** Custom streaming state operators (`KeyValueGroupedDataset
  * .flatMapGroupsWithState`) — the API tier for session logic the
  * declarative `session_window()` cannot express (per-session custom
  * fields, early emission, business rules on close).
  *
  * State scale: one [[StatefulOps.OpenSession]] (4 numeric fields) per
  * ACTIVE key — closed sessions are emitted and dropped, so state size
  * tracks concurrent users, not history. The shuffle partitions by the
  * group key, the same hashing the equivalent batch aggregation uses.
  */
object StatefulOps extends Serializable {

  /** One event of the sessionization input. */
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session state: timestamps in epoch micros; the value total in
    * cents (decimal(18,2) semantics, matching Cols.dsum's
    * order-independent exact accumulation).
    */
  final case class OpenSession(
      startMicros: Long, lastMicros: Long, n: Long, totalCents: Long)

  /** A closed session, shaped exactly like EventWindows.session's
    * output rows.
    */
  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total: Double)

  private def micros(ts: Timestamp): Long =
    // floorDiv, not truncating /: getNanos is always NON-negative, so
    // for a pre-1970 instant the truncated millis-to-seconds division
    // would round toward zero and misplace the event by a full second
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  private def fromMicros(m: Long): Timestamp = {
    val t = new Timestamp(m / 1000000L * 1000L)
    t.setNanos((m % 1000000L).toInt * 1000)
    t
  }

  /** value -> cents with decimal(18,2) HALF_UP rounding — the identical
    * per-element rounding `cast(value AS DECIMAL(18,2))` applies, so
    * totals match Cols.dsum bit-for-bit after the final /100.
    */
  private def toCents(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Gap-based sessionization with explicit state: events extend the
    * open session while they arrive < gap after its last event;
    * otherwise the open session closes (end = last ts + gap, the
    * `session_window` convention) and a new one opens. Closed sessions
    * are emitted; the open session stays in state for the next batch.
    *
    * In-batch event-time disorder is handled by sorting each group's
    * batch slice, which buffers that key's slice of the CURRENT
    * micro-batch in executor memory — bounded by rows-per-key-per-
    * trigger, not by history (the checkpointed STATE is one
    * OpenSession per active key). A pathologically hot key in a huge
    * batch is the limit of this approach; shorten the trigger interval
    * or pre-bucket such keys. Cross-batch disorder is subject to the
    * stream's watermark discipline, as with any event-time stateful
    * operator.
    *
    * `flushOpen`: in BATCH execution there is no later trigger, so an
    * open session left in state would simply be dropped — pass true to
    * emit it as closed at end-of-group (the gaps-and-islands batch
    * semantics, oracle-checked by `q_session_stateful`). Leave false in
    * streaming, where the open session must survive in state.
    *
    * `watermarkDelay`: in a LONG-RUNNING stream, pass the watermark
    * delay (e.g. "10 minutes") — the input gets `withWatermark` and
    * the operator uses an event-time TIMEOUT: when the watermark
    * passes an idle session's gap deadline, the session is emitted as
    * closed and its state row is EVICTED. Without it (None), an idle
    * user's open session is never emitted and never evicted — state
    * then grows with every user ever seen, which is only acceptable
    * for bounded test streams and batch runs.
    */
  def sessionize(
      events: Dataset[Ev],
      gapMinutes: Int = 30,
      flushOpen: Boolean = false,
      watermarkDelay: Option[String] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def close(user: Long, s: OpenSession): SessionOut =
      SessionOut(user, fromMicros(s.startMicros),
        fromMicros(s.lastMicros + gapMicros), s.n, s.totalCents / 100.0)

    val src = watermarkDelay
      .map(d => events.withWatermark("ts", d).as[Ev])
      .getOrElse(events)
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    src.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf) {
      (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // watermark passed lastMicros + gap: the session can no longer
          // be extended by any non-late event — close it and DROP the
          // state row (this eviction is what keeps state ~ active keys)
          val out = state.getOption.map(close(user, _)).iterator
          state.remove()
          out
        } else {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          it.toIndexedSeq.sortBy(e => micros(e.ts)).foreach { e =>
            val m = micros(e.ts)
            val cents = toCents(e.value)
            cur match {
              case Some(s) if m - s.lastMicros < gapMicros =>
                cur = Some(s.copy(
                  lastMicros = math.max(m, s.lastMicros),
                  n = s.n + 1,
                  totalCents = s.totalCents + cents))
              case Some(s) =>
                out += close(user, s)
                cur = Some(OpenSession(m, m, 1L, cents))
              case None =>
                cur = Some(OpenSession(m, m, 1L, cents))
            }
          }
          if (flushOpen) cur.foreach(s => out += close(user, s))
          else cur.foreach { s =>
            state.update(s)
            if (watermarkDelay.isDefined)
              // round the micro deadline UP to millis: truncation could
              // fire the timeout up to 1 ms early, closing a session an
              // in-gap event would still have extended
              state.setTimeoutTimestamp((s.lastMicros + gapMicros + 999L) / 1000L)
          }
          out.iterator
        }
    }
  }

  /** One record of the unioned as-of enrichment stream: a left (probe)
    * event or a right (state) update, tagged by `is_right`. The union
    * envelope is the standard two-streams-one-operator shape — a
    * stateful operator keys ONE input, so both sides ride the same
    * type and split inside the state function. Field names match the
    * q_asof_native fixture (clicks enriched with purchases).
    */
  final case class AsOfRec(user_id: Long, ts: Timestamp, is_right: Boolean,
      event_id: Long, purchase_id: Long)

  /** One enriched left event: the latest right row at-or-before its
    * time (backward-inclusive as-of), or None.
    */
  final case class AsOfMatch(event_id: Long, user_id: Long, ts: Timestamp,
      purchase_id: Option[Long], purchase_ts: Option[Timestamp])

  /** Per-key as-of state: right postings (micros -> id, time-sorted),
    * left events still inside the watermark window, and the key's last
    * event-time activity (for idle-TTL eviction). The lists are
    * BOUNDED by the watermark discipline, not by history: lefts drain
    * as the watermark passes them, and rights older than the watermark
    * are compacted to the single latest one (the only backward
    * candidate any future left can need).
    */
  final case class AsOfBuf(rights: List[(Long, Long)], lefts: List[(Long, Long)],
      lastSeenMicros: Long)

  /** STREAMING AS-OF JOIN — the streaming twin of the native batch
    * operator (`graft.plans.AsOfJoinPlan`): enrich an event stream
    * with the latest at-or-before state update per key, the
    * "attach the config/price/model version that was live when this
    * event happened" shape every training-data ingest needs.
    *
    * Correctness under disorder: a left event at time t is matched
    * only once the watermark has passed t — no on-time right row at
    * or before t can still arrive (later arrivals below the watermark
    * are late-beyond-watermark by contract). Until then the left row
    * WAITS IN STATE; an event-time timeout at the earliest waiting
    * left's instant guarantees emission even if the key receives no
    * further records. Output is therefore append-mode exact over
    * non-late data.
    *
    * State scale: per key, the compacted right postings (everything
    * newer than the watermark plus ONE latest-at-watermark row) and
    * the waiting lefts (a watermark-delay-wide window) — both bounded
    * by stream rate x delay, never by history.
    *
    * `flush`: batch-mode dial (same convention as [[sessionize]]'s
    * `flushOpen`): treat the watermark as +infinity and emit every
    * left — the gate `q_asof_stream` runs this against the SAME
    * DuckDB ASOF oracle as the three batch implementations (composed
    * window, sort-merge exec, broadcast exec), making the streaming
    * state machine the FOURTH independently-certified formulation.
    *
    * Surface: backward-inclusive only, deliberately — the streaming
    * enrichment shape. Forward/nearest need FUTURE state (the match
    * is unknown until the watermark passes t + tolerance), turning
    * the operator into a delay line; batch callers who need those
    * dials have the native operator's full surface.
    *
    * `idleTtlMinutes`: without it, a key that stops receiving records
    * holds its one compacted posting FOREVER — at production key
    * cardinality that is state growth by distinct-keys-ever. With it,
    * a key idle (no records, event time) past the TTL is EVICTED on
    * the watermark clock; a later probe of an evicted key degrades to
    * no-match, the documented trade of bounding state by ACTIVE keys.
    */
  def asofStream(recs: Dataset[AsOfRec], flush: Boolean = false,
      watermarkDelay: Option[String] = None,
      idleTtlMinutes: Option[Long] = None): Dataset[AsOfMatch] = {
    // flush=false with no watermark would never emit: the watermark
    // stays 0 so every left waits forever under NoTimeout and state
    // grows without bound — reject the combination at entry instead
    // of producing a silently-empty stream
    require(flush || watermarkDelay.isDefined,
      "asofStream with flush=false requires a watermarkDelay (without " +
        "one the watermark never advances, no left ever emits, and " +
        "state grows unboundedly)")
    import recs.sparkSession.implicits._
    val src = watermarkDelay
      .map(d => recs.withWatermark("ts", d).as[AsOfRec])
      .getOrElse(recs)
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    src.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf) {
      (user: Long, it: Iterator[AsOfRec], state: GroupState[AsOfBuf]) =>
        val wm =
          if (flush) Long.MaxValue
          else state.getCurrentWatermarkMs() * 1000L // millis -> micros
        val prior = state.getOption.getOrElse(AsOfBuf(Nil, Nil, 0L))
        val batch = it.toIndexedSeq
        val (rIn, lIn) = batch.partition(_.is_right)
        // postings stay time-sorted; ties keep the larger id (the
        // fixture dedups per (key, time), so ties only appear if the
        // caller skipped that — make the choice deterministic anyway)
        val rights = (prior.rights ++ rIn.map(r => (micros(r.ts), r.purchase_id)))
          .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).max) }
          .toArray.sortBy(_._1)
        val lefts = prior.lefts ++ lIn.map(l => (micros(l.ts), l.event_id))
        val (ready, waiting) = lefts.partition(_._1 <= wm)
        val times = rights.map(_._1)
        val out = ready.sortBy(l => (l._1, l._2)).map { case (t, eid) =>
          // binary search: greatest right time <= t (backward inclusive)
          var lo = 0; var hi = times.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (ans >= 0)
            AsOfMatch(eid, user, fromMicros(t),
              Some(rights(ans)._2), Some(fromMicros(rights(ans)._1)))
          else AsOfMatch(eid, user, fromMicros(t), None, None)
        }
        if (flush) {
          // batch semantics: nothing survives the single invocation
          state.remove()
        } else {
          val lastSeen = (prior.lastSeenMicros +: batch.map(r => micros(r.ts))).max
          val idleDeadline = idleTtlMinutes.map(m => lastSeen + m * 60L * 1000000L)
          if (waiting.isEmpty && idleDeadline.exists(_ <= wm)) {
            // idle past the TTL on the event-time clock and nothing
            // pending: evict — state stays bounded by ACTIVE keys
            state.remove()
          } else {
            // compact rights: keep everything a FUTURE left (t > wm)
            // can still need — all postings after the watermark plus
            // the single latest at-or-before it
            val cut = {
              var lo = 0; var hi = times.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= wm) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              math.max(ans, 0)
            }
            val kept = rights.drop(cut).toList
            state.update(AsOfBuf(kept, waiting, lastSeen))
            // arm the event-time timeout (only meaningful — and only
            // LEGAL — under EventTimeTimeout, i.e. with a watermark):
            // the earlier of "flush the earliest waiting left" and
            // "idle-TTL eviction", rounded UP to millis so neither can
            // fire a micro early, and always strictly past the current
            // watermark as the API requires
            if (watermarkDelay.isDefined) {
              val flushAt = waiting.map(_._1).minOption
              val deadline = (flushAt.toSeq ++ idleDeadline.toSeq)
                .map(m => (m + 999L) / 1000L).minOption
              deadline.foreach(d =>
                state.setTimeoutTimestamp(math.max(d, state.getCurrentWatermarkMs() + 1L)))
            }
          }
        }
        out.iterator
    }
  }

  /** One live count-min cell snapshot: hash row j, bucket, running
    * count.
    */
  final case class CmsCell(j: Int, bucket: Long, n: Long)

  /** The batch CMS bucket hash (Cols.hex60 of "cms{j}|{token}" mod
    * width) via the shared scalar twin [[graft.Cols.hex60Scalar]] —
    * byte-identical md5 semantics, so the streaming grid lands tokens
    * in exactly the cells the batch q_sketch_cms grid uses, at
    * per-record cost (thread-local digest, no hex-string round trip).
    */
  def cmsBucket(token: String, j: Int, width: Int): Long =
    graft.Cols.hex60Scalar(s"cms$j|$token") % width

  /** Streaming count-min monitor — the ingestion-time face of the batch
    * `q_sketch_cms` operator: each token increments its `depth` grid
    * cells; every trigger re-emits the touched cells' running counts.
    * State is one long per cell, bounded by depth x width FOREVER
    * (3 x 1024 by default) regardless of stream volume — the defining
    * property of a sketch, preserved verbatim in streaming form. A
    * downstream consumer estimates any token's frequency as the min
    * over its cells, identically to the batch probe
    * (StreamingCmsSpec asserts grid equality).
    */
  def cmsMonitor(
      tokens: Dataset[String], width: Int = 1024, depth: Int = 3): Dataset[CmsCell] = {
    import tokens.sparkSession.implicits._
    require(width > 0 && depth > 0, s"invalid grid ${depth}x$width")
    tokens
      .flatMap(t => (0 until depth).map(j => (j, cmsBucket(t, j, width))))
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[(Int, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          Iterator(CmsCell(key._1, key._2, n))
      }
  }

  /** One packing-input document: its token count plus the (lang, shard)
    * stream it packs into.
    */
  final case class DocTok(doc_id: Long, lang: String, shard: Long, n_tokens: Long)

  /** A packed document: the bin its tokens start in and the offset
    * there.
    */
  final case class PackedDoc(
      doc_id: Long, lang: String, shard: Long,
      n_tokens: Long, bin_id: Long, bin_off: Long)

  /** Streaming sequence packing — the continuous-ingestion face of the
    * batch `text_seq_pack` operator: documents are appended to their
    * (lang, shard) token stream as they arrive and cut into
    * `budget`-token bins (bin = cumulative-tokens-before / budget).
    *
    * State per key is ONE long — the stream's running token count — so
    * total state is bounded by langs x shards FOREVER; no watermark or
    * timeout is ever needed, unlike time-keyed state. In-batch disorder
    * is handled by sorting each group's trigger slice on doc_id; across
    * triggers the packing order is arrival order (the streaming
    * contract — identical to the batch doc_id order whenever ingestion
    * is id-ordered, which the equivalence spec drives).
    */
  def packStream(docs: Dataset[DocTok], budget: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    docs.groupByKey(d => (d.lang, d.shard)).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (_: (String, Long), it: Iterator[DocTok], state: GroupState[Long]) =>
        var cum = state.getOption.getOrElse(0L)
        val out = it.toIndexedSeq.sortBy(_.doc_id).map { d =>
          val before = cum
          cum += d.n_tokens
          PackedDoc(d.doc_id, d.lang, d.shard, d.n_tokens,
            before / budget, before % budget)
        }
        state.update(cum)
        out.iterator
    }
  }

  /** One mixture-monitor input: a document's language and token count. */
  final case class LangTok(lang: String, n_tokens: Long)

  /** A running per-language snapshot of the ingested corpus mixture. */
  final case class MixSnapshot(lang: String, n_docs: Long, n_tokens: Long)

  /** Streaming domain-mixture monitor — the ingestion-time face of the
    * batch `q_mix_weights` operator: per language, the running document
    * and token totals, re-emitted after every trigger that touches the
    * language. Downstream alerting divides by the cross-language total
    * to watch the mixture drift DURING ingestion instead of auditing it
    * after. State is two longs per language — bounded by the domain
    * vocabulary forever. The final snapshot per language equals the
    * batch aggregation exactly (integer counts; StreamingMixtureSpec).
    */
  def mixtureMonitor(docs: Dataset[LangTok]): Dataset[MixSnapshot] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.lang).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (lang: String, it: Iterator[LangTok], state: GroupState[(Long, Long)]) =>
        var (d, t) = state.getOption.getOrElse((0L, 0L))
        it.foreach { x => d += 1; t += x.n_tokens }
        state.update((d, t))
        Iterator(MixSnapshot(lang, d, t))
    }
  }

  /** Arrival-order exact dedup over an UNBOUNDED horizon: the first
    * record per key is emitted, every later arrival is dropped. State
    * is one boolean per key EVER seen — use this when the dedup horizon
    * really is "forever" (content-digest dedup of a curated corpus,
    * where a duplicate a year later is still a duplicate); when a time
    * horizon is acceptable, [[dedupWithinWatermark]] keeps state
    * bounded instead. Within one trigger, "first" follows the group
    * iterator; across triggers it is arrival order — the
    * backfill-then-incremental ingestion contract
    * (StreamingCurateSpec drives originals before copies and gets the
    * batch min-id keeper exactly).
    */
  def keepFirstByKey[T, K](
      docs: Dataset[T], key: T => K)(
      implicit et: org.apache.spark.sql.Encoder[T],
      ek: org.apache.spark.sql.Encoder[K]): Dataset[T] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (_: K, it: Iterator[T], state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          it.take(1)
        }
    }
  }

  /** One live HLL register snapshot: group, register index, max rank. */
  final case class HllRegister(group: String, bucket: Long, mj: Long)

  /** The batch `q_sketch_hll` register function via the shared scalar
    * md5 twin: 60-bit hash -> (low-8-bit register, leading-zero rank of
    * the 52-bit remainder). Bit-identical to the SQL pair
    * (hex60 % 256, 53 - length(bin(hex60 >> 8))).
    */
  def hllRegister(key: String): (Long, Long) = {
    val h = graft.Cols.hex60Scalar(key)
    val rem = h >>> 8
    val rho = if (rem == 0L) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (h % 256, rho)
  }

  /** Streaming HyperLogLog monitor — the ingestion-time face of the
    * batch `q_sketch_hll` operator: each (group, key) arrival folds
    * into its register via max(rho); every trigger re-emits the touched
    * registers. State is one long per (group, register) — bounded by
    * groups x 256 FOREVER, the defining sketch property — and max() is
    * idempotent, so replays and duplicates cannot corrupt a register.
    * A downstream consumer turns any snapshot into the estimate with
    * the batch query's exact-integer harmonic sum; final registers
    * equal the batch registers exactly (StreamingHllSpec).
    */
  def hllMonitor(keyed: Dataset[(String, String)]): Dataset[HllRegister] = {
    import keyed.sparkSession.implicits._
    keyed
      .map { case (g, k) => val (b, r) = hllRegister(k); (g, b, r) }
      .groupByKey { case (g, b, _) => (g, b) }
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: (String, Long), it: Iterator[(String, Long, Long)],
         state: GroupState[Long]) =>
          val mj = it.foldLeft(state.getOption.getOrElse(0L)) {
            case (acc, (_, _, rho)) => math.max(acc, rho)
          }
          state.update(mj)
          Iterator(HllRegister(key._1, key._2, mj))
      }
  }

  /** One live KMV sketch snapshot: group, occupancy, kth-minimum hash. */
  final case class KmvSketch(group: String, n_k: Long, kth: Long)

  /** Streaming k-minimum-values monitor — the ingestion-time face of
    * batch `q_sketch_kmv`: per group keep the k smallest DISTINCT
    * member hashes (state bounded by k FOREVER, the sketch property);
    * every trigger emits the refreshed (n_k, kth) snapshot, from which
    * a consumer forms the identical (k-1)·M/kth estimate the batch
    * query pins (StreamingKmvSpec). The fold is set-union + truncate —
    * idempotent, so replays and duplicate members cannot corrupt the
    * sketch. Snapshots collapse deterministically across triggers:
    * n_k is monotone non-decreasing, and once the sketch is full kth
    * only improves (decreases), so the final state is the max-n_k /
    * then-min-kth emission.
    */
  def kmvMonitor(keyed: Dataset[(String, String)], k: Int = 64): Dataset[KmvSketch] = {
    import keyed.sparkSession.implicits._
    keyed
      .map { case (g, key) => (g, graft.Cols.hex60Scalar(key), key) }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long, String)],
         state: GroupState[Seq[(Long, String)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              it.map { case (_, hv, key) => (hv, key) })
            .distinct.sorted.take(k)
          state.update(merged)
          if (merged.isEmpty) Iterator.empty
          else Iterator(KmvSketch(g, merged.size.toLong, merged.last._1))
      }
  }

  /** One embedding arrival for the drift monitor. */
  final case class VecArrival(vec_id: Long, emb: Seq[Double])

  /** Per-dimension drift snapshot: cohort counts, means, and the
    * mean shift (new minus old).
    */
  final case class DimDrift(
      dim: Long, n_a: Long, n_b: Long,
      mean_a: Double, mean_b: Double, shift: Double)

  /** Streaming twin of the batch `sim_dim_drift` monitor: per
    * embedding dimension, the running mean under the old (vec_id
    * even) vs new (odd) ingestion cohort and the shift between them,
    * re-emitted as arrivals land. State per dimension is four longs —
    * the cohort counts and the cohort sums of the SAME floor(x·1e9)
    * int64 quantization the batch query aggregates — so the fold is
    * integer addition: exactly commutative and associative, which is
    * what makes the final snapshot equal the batch answer
    * double-for-double regardless of arrival order or trigger
    * splitting (StreamingDriftSpec pins both). A dimension stays
    * silent until BOTH cohorts have arrivals — a drift number against
    * an empty cohort is noise, not signal. Snapshots collapse
    * deterministically: n_a + n_b is monotone non-decreasing, so the
    * final state is the max-total emission per dimension.
    */
  def dimDriftMonitor(vecs: Dataset[VecArrival]): Dataset[DimDrift] = {
    import vecs.sparkSession.implicits._
    vecs
      .flatMap { v =>
        val cohort = v.vec_id % 2
        v.emb.iterator.zipWithIndex.map { case (x, i) =>
          (i + 1L, cohort, math.floor(x * 1000000000.0).toLong)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (dim: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          var (na, sa, nb, sb) = state.getOption.getOrElse((0L, 0L, 0L, 0L))
          it.foreach { case (_, cohort, qx) =>
            if (cohort == 0L) { na += 1; sa += qx } else { nb += 1; sb += qx }
          }
          state.update((na, sa, nb, sb))
          if (na == 0 || nb == 0) Iterator.empty
          else {
            val meanA = sa.toDouble / (na * 1000000000.0)
            val meanB = sb.toDouble / (nb * 1000000000.0)
            Iterator(DimDrift(dim, na, nb, meanA, meanB, meanB - meanA))
          }
      }
  }

  /** One LSH-bucketed vector arrival: the bucket key and the vector id. */
  final case class BucketedVec(bucket: Long, vec_id: Long)

  /** One emitted near-dup candidate pair (a < b by construction). */
  final case class CandidatePair(bucket: Long, a: Long, b: Long)

  /** Streaming LSH candidate generation — the ingestion-time face of
    * the batch embedding near-dup / sim_pair_hist pair join: each
    * arriving vector pairs with every vector already seen in its
    * bucket, then joins the bucket's member list. Downstream scores
    * the candidates (cosine + threshold) exactly as the batch path
    * does; emission here IS the batch bucket self-join, produced
    * incrementally.
    *
    * State per bucket is the member-id list — the incremental-index
    * pattern: it grows with the corpus (like [[keepFirstByKey]]'s
    * forever horizon), because a near-dup a year later is still a
    * near-dup. The LSH contract keeps individual buckets small
    * (corpus / 2^planes on uniform data); a bucket that reaches
    * `capPerBucket` stops ADMITTING members (existing members keep
    * emitting against nothing new). Saturation is surfaced, not
    * silent: the first admission that fills a bucket logs a WARN with
    * the bucket key and cap — recall loss past that point is an
    * operator-visible event, not something to infer from missing
    * pairs. Each trigger slice is sorted on vec_id before admission
    * (the transitionStream discipline): flatMapGroupsWithState's
    * within-trigger group iterator order is unspecified, so an
    * unsorted fold would make the admitted set near the cap
    * nondeterministic across runs of the same input; with the sort
    * the admitted set is a pure function of the trigger slices. A
    * replayed vec_id is ignored (no self-pairs, no re-emission), so
    * duplicate ingestion cannot corrupt the candidate set; below the
    * cap the emitted pair SET equals the batch bucket self-join
    * regardless of arrival order (the equivalence spec's contract).
    */
  def lshCandidates(
      vecs: Dataset[BucketedVec],
      capPerBucket: Int = 1024): Dataset[CandidatePair] = {
    import vecs.sparkSession.implicits._
    require(capPerBucket > 1, s"capPerBucket must be > 1, got $capPerBucket")
    vecs.groupByKey(_.bucket).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (bucket: Long, it: Iterator[BucketedVec], state: GroupState[List[Long]]) =>
        var members = state.getOption.getOrElse(Nil)
        var count = members.size // once per trigger, then O(1) upkeep
        val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
        it.toIndexedSeq.sortBy(_.vec_id).foreach { v =>
          if (count < capPerBucket && !members.contains(v.vec_id)) {
            members.foreach { m =>
              out += CandidatePair(bucket, math.min(m, v.vec_id), math.max(m, v.vec_id))
            }
            members = v.vec_id :: members
            count += 1
            if (count == capPerBucket)
              org.slf4j.LoggerFactory.getLogger("graft.streaming.StatefulOps")
                .warn(s"lshCandidates bucket $bucket reached capPerBucket=" +
                  s"$capPerBucket — further arrivals in this bucket will " +
                  "not generate candidate pairs (recall loss)")
          }
        }
        state.update(members)
        out.iterator
    }
  }

  /** One transition-counting input event. */
  final case class TypedEv(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

  /** One observed (from -> to) transition in a user's event chain. */
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming event-type transition extraction — the continuous face
    * of the batch `q_events_markov` operator: per user, each arriving
    * event pairs with that user's PREVIOUS event to emit one
    * (from, to) transition; a downstream count by (from, to) is the
    * running transition matrix.
    *
    * State per user is ONE string — the chain tail's event type — so
    * state tracks the user population, never event history. In-batch
    * disorder is handled by sorting the trigger slice on
    * (ts, event_id), the same deterministic order the batch lead()
    * window uses; across triggers the chain follows ARRIVAL order (no
    * cross-trigger reordering or late-event guard — a late event
    * chains after whatever arrived before it), which equals the batch
    * order whenever ingestion is time-ordered per key — the
    * equivalence spec's contract, as with packStream.
    */
  def transitionStream(events: Dataset[TypedEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (user: Long, it: Iterator[TypedEv], state: GroupState[String]) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
        var prev = state.getOption
        it.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
          prev.foreach(t => out += Transition(user, t, e.event_type))
          prev = Some(e.event_type)
        }
        prev.foreach(state.update)
        out.iterator
    }
  }

  /** One LSH band arrival of the streaming near-dup screen: a document
    * observed under one of its minhash band keys.
    */
  final case class BandArrival(band_key: Long, doc_id: Long, ts: Timestamp)

  /** One per-band verdict: whether the document is the first (lowest
    * doc_id) its band bucket has seen.
    */
  final case class BandVerdict(doc_id: Long, band_key: Long, first_in_band: Boolean)

  /** Streaming MinHash-band near-dup screen — the ingestion-time face
    * of the batch minhash/LSH family (`dedup_minhash_lsh`): each
    * arriving document is checked, per band bucket, against the
    * bucket's remembered minimum doc_id; a document whose EVERY band
    * says "first" has no earlier near-dup candidate and passes the
    * screen (the caller reduces the per-band verdicts with bool-and by
    * doc). This is the screen semantics — a shared band is treated as
    * a near-dup hit without the exact-Jaccard verify, the standard
    * cheap first line an ingest pipeline runs before admitting a
    * document to the expensive path.
    *
    * State per band bucket is TWO longs (min doc_id, last event-time
    * seen). Verdicts emit on ARRIVAL (append mode, no watermark wait);
    * the watermark exists to bound state: with `idleTtlMinutes`, a
    * bucket idle past the TTL on the event-time clock is EVICTED, so
    * state tracks buckets touched within the horizon, not buckets ever
    * seen — a document arriving after its bucket's eviction re-admits
    * as "first", the same within-horizon trade dedupWithinWatermark
    * documents. Determinism: each trigger slice is sorted on doc_id
    * (the transitionStream discipline), and the verdict is
    * `doc_id == min-after-folding` — idempotent under replay (a
    * re-delivered document re-derives its own verdict rather than
    * demoting itself), so at-least-once delivery cannot corrupt the
    * kept set. With time-monotone (doc_id-ordered) arrival and no
    * eviction mid-run, the kept set equals the batch rule "doc is the
    * minimum of every band bucket it occupies" — the DuckDB oracle of
    * q_stream_neardup.
    */
  def bandFirstScreen(bands: Dataset[BandArrival],
      watermarkDelay: Option[String] = None,
      idleTtlMinutes: Option[Long] = None): Dataset[BandVerdict] = {
    import bands.sparkSession.implicits._
    val src = watermarkDelay
      .map(d => bands.withWatermark("ts", d).as[BandArrival])
      .getOrElse(bands)
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src.groupByKey(_.band_key).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf) {
      (band: Long, it: Iterator[BandArrival], state: GroupState[(Long, Long)]) =>
        if (state.hasTimedOut) {
          // idle past the TTL: evict — state stays bounded by buckets
          // ACTIVE within the horizon
          state.remove()
          Iterator.empty
        } else {
          var (m, lastSeen) = state.getOption.getOrElse((Long.MaxValue, 0L))
          val out = it.toIndexedSeq.sortBy(_.doc_id).map { a =>
            if (a.doc_id < m) m = a.doc_id
            lastSeen = math.max(lastSeen, micros(a.ts))
            BandVerdict(a.doc_id, band, a.doc_id == m)
          }
          state.update((m, lastSeen))
          if (watermarkDelay.isDefined) idleTtlMinutes.foreach { ttl =>
            // rounded UP to millis; always strictly past the current
            // watermark as the API requires (the asofStream convention)
            val deadline = (lastSeen + ttl * 60L * 1000000L + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(deadline, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
        }
    }
  }

  /** Streaming exact dedup with BOUNDED state: first occurrence per key
    * combination is emitted; duplicate arrivals within the watermark
    * horizon are dropped, and key state older than the watermark is
    * evicted (`dropDuplicatesWithinWatermark`). This is the streaming
    * face of the batch exact-dedup operator: at 100 TB/day the state
    * holds one digest per key seen within the horizon, not per key
    * ever seen.
    */
  def dedupWithinWatermark(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
