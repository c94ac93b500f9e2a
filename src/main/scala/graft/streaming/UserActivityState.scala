package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY.md §2.2 Streaming row:
  * `mapGroupsWithState` for state the built-in windows can't express):
  * a per-user running activity profile maintained across micro-batches.
  *
  * State is one small case class per user key — bounded by user
  * cardinality, not event volume, so it holds on an unbounded stream.
  */
object UserActivityState {

  final case class Event(user_id: Long, event_type: String, value: Double)

  final case class UserProfile(
      user_id: Long,
      n_events: Long,
      n_purchases: Long,
      total_value: Double)

  def updateProfile(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[UserProfile]): UserProfile = {
    val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0L, 0.0))
    val next = events.foldLeft(prev) { (p, e) =>
      p.copy(
        n_events = p.n_events + 1,
        n_purchases = p.n_purchases + (if (e.event_type == "purchase") 1 else 0),
        total_value = p.total_value + e.value)
    }
    state.update(next)
    next
  }

  /** Streaming per-user profile over an events stream (Update mode:
    * one refreshed profile row per user per micro-batch).
    */
  def profiles(events: Dataset[Event]): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
  }

  /** Adapter from the raw streaming events DataFrame. */
  def fromRaw(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    EventsStreaming.readEvents(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }
}
