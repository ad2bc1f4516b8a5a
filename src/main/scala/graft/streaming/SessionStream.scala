package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.{Exact, RelationalQueries}

/** Streaming twin of the batch gap-based sessionization
  * (graft.queries.RelationalQueries.sessions, rel_q11): the same
  * 12h-inactivity session semantics computed incrementally with
  * `flatMapGroupsWithState` — the engine's custom-state streaming
  * surface (KeyValueGroupedDataset, SURVEY §1.3 "Structured Streaming
  * over the same DataFrame model").
  *
  * Semantics: one state record per user holding the OPEN session
  * (seq, start, end, n, cents). Events extend the open session or —
  * after a >gap jump — close it (emit) and open the next. A session
  * is also closed by event-time timeout once the watermark passes
  * `end + gap`: exactly the point after which no in-watermark event
  * could extend it. Emitted sessions are therefore FINAL (append
  * mode), and `session_seq` numbers a user's sessions in time order —
  * identical to the batch window formulation.
  *
  * Ordering: events are sorted within each micro-batch; cross-batch
  * reordering is bounded by the watermark delay, as in any event-time
  * pipeline. At 100 TB-scale rates the state size is
  * O(active users × one open session) — bounded, tiny — and the only
  * shuffle per micro-batch is the hash exchange on user_id.
  */
object SessionStream {

  val gapUs: Long = RelationalQueries.sessionGapUs

  /** Open-session record: seq is 1-based per user in time order. */
  case class OpenSession(
      seq: Long, start: Long, end: Long, n: Long, cents: Long)

  /** Per-user state. `nextSeq` survives timeout-closes — removing the
    * state entirely would restart session numbering at 1 for the
    * user's next session. After a timeout the state shrinks to just
    * the counter (no open session, no pending timeout): O(users seen)
    * longs, the price of stable per-user sequence numbers. */
  case class UserSessions(nextSeq: Long, open: Option[OpenSession])

  /** Closed-session output — same columns as the batch rel_q11. */
  case class Session(
      user_id: Long, session_seq: Long, n_events: Long,
      start_us: Long, end_us: Long, duration_us: Long, sum_value: Double)

  private def close(user: Long, o: OpenSession): Session =
    Session(user, o.seq, o.n, o.start, o.end, o.end - o.start,
      o.cents.toDouble / 100.0)

  /** Exact µs since epoch from a java.sql.Timestamp (getTime is ms;
    * getNanos carries the full fractional second) — matches the batch
    * side's `unix_micros`. */
  private def micros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def step(
      user: Long,
      events: Iterator[(Long, java.sql.Timestamp, Long)],
      state: GroupState[UserSessions]): Iterator[Session] =
    if (state.hasTimedOut) {
      val st = state.get
      val out = st.open.map(close(user, _)).iterator
      state.update(UserSessions(st.nextSeq, None)) // keep the counter
      out
    } else {
      val sorted = events.map { case (u, ts, c) => (u, micros(ts), c) }
        .toSeq.sortBy(_._2)
      val emitted = Seq.newBuilder[Session]
      var st = state.getOption.getOrElse(UserSessions(1L, None))
      sorted.foreach { case (_, tsUs, cents) =>
        st = st.open match {
          case Some(o) if tsUs - o.end > gapUs =>
            emitted += close(user, o)
            UserSessions(o.seq + 2,
              Some(OpenSession(o.seq + 1, tsUs, tsUs, 1L, cents)))
          case Some(o) =>
            // min/max, not assignment: a within-watermark late event
            // (flatMapGroupsWithState does NOT pre-filter late rows)
            // must never move the session end backwards — that would
            // shorten end_us/duration_us vs the batch twin and re-arm
            // the timeout too early
            st.copy(open = Some(o.copy(
              start = math.min(o.start, tsUs),
              end = math.max(o.end, tsUs),
              n = o.n + 1, cents = o.cents + cents)))
          case None =>
            UserSessions(st.nextSeq + 1,
              Some(OpenSession(st.nextSeq, tsUs, tsUs, 1L, cents)))
        }
      }
      state.update(st)
      // fire once no in-watermark event can extend the open session
      st.open.foreach(o =>
        state.setTimeoutTimestamp(o.end / 1000 + gapUs / 1000 + 1))
      emitted.result().iterator
    }

  /** Sessionize a streaming (or batch) events DataFrame with columns
    * (user_id long, ts timestamp, value double). Emits only CLOSED
    * sessions (append mode). */
  def sessionize(events: DataFrame): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // the watermarked `ts` attribute must survive up to the
      // stateful operator (projecting it away would detach the
      // event-time column), so µs conversion happens in `step`
      .select(col("user_id"), col("ts"),
        Exact.cents(col("value")).as("cents"))
      .withWatermark("ts", "1 second")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
