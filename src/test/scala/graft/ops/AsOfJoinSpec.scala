package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right row at or before each left ts, per key") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00")), // before any right row for key 2
      (103L, 3L, ts("2024-01-01 10:00:00"))  // key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2024-01-01 09:30:00"), "view"),
      (201L, 1L, ts("2024-01-01 11:00:00"), "click"),
      (202L, 1L, ts("2024-01-01 12:00:00"), "scroll"), // equal ts: inclusive
      (203L, 2L, ts("2024-01-01 09:30:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")

    val got = AsOfJoin.backward(left, right, key = "user_id", ts = "ts",
        rightPayload = Map("event_id" -> "prior_id", "event_type" -> "prior_type"),
        tiebreak = "event_id")
      .select("event_id", "prior_id", "prior_type")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(got(100L) == ((Some(200L), Some("view"))))
    assert(got(101L) == ((Some(202L), Some("scroll")))) // ts equality matches (inclusive >=)
    assert(got(102L) == ((None, None)))                 // nothing at or before
    assert(got(103L) == ((None, None)))                 // unmatched key: left row kept
  }

  test("tiebreak makes equal-(key,ts) right rows deterministic") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (50L, 1L, ts("2024-01-01 10:00:00"), "a"),
      (51L, 1L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = AsOfJoin.backward(left, right, "user_id", "ts",
        Map("event_id" -> "prior_id"), tiebreak = "event_id")
      .select("prior_id").collect()(0).getLong(0)
    assert(got == 51L) // highest tiebreak wins (last in carry-forward order)
  }

  test("forward as-of: earliest right row at or after each left ts, per key") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")), // equal ts: inclusive
      (102L, 1L, ts("2024-01-01 13:00:00")), // after every right row for key 1
      (103L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2024-01-01 09:30:00"), "view"),
      (201L, 1L, ts("2024-01-01 11:00:00"), "click"),
      (202L, 1L, ts("2024-01-01 12:00:00"), "scroll"),
      (203L, 2L, ts("2024-01-01 09:30:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")

    val got = AsOfJoin.forward(left, right, key = "user_id", ts = "ts",
        rightPayload = Map("event_id" -> "next_id", "event_type" -> "next_type"),
        tiebreak = "event_id")
      .select("event_id", "next_id", "next_type")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(got(100L) == ((Some(201L), Some("click")))) // nearest FOLLOWING, not 202
    assert(got(101L) == ((Some(202L), Some("scroll")))) // ts equality matches
    assert(got(102L) == ((None, None)))                 // nothing at or after
    assert(got(103L) == ((Some(203L), Some("view"))))
  }

  test("NULL left ts matches nothing in either direction (SQL comparison semantics)") {
    val left = Seq((1L, 1L, null.asInstanceOf[Timestamp]))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((50L, 1L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    for (dir <- Seq("backward", "forward")) {
      val join = if (dir == "backward") AsOfJoin.backward _ else AsOfJoin.forward _
      val r = join(left, right, "user_id", "ts",
        Map("event_id" -> "match_id"), "event_id").select("match_id").collect()
      assert(r.length == 1 && r(0).isNullAt(0),
        s"$dir matched a NULL-ts left row: ${r.mkString}")
    }
  }

  test("nearest as-of: closer side wins, exact tie prefers backward, one-sided and unmatched rows behave") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")), // back 09:57 (3m), fwd 10:02 (2m) -> forward
      (101L, 1L, ts("2024-01-01 12:00:00")), // back 11:58 (2m), fwd 12:02 (2m) -> tie -> backward
      (102L, 2L, ts("2024-01-01 09:00:00")), // only forward exists
      (103L, 3L, ts("2024-01-01 09:00:00")), // only backward exists
      (104L, 4L, ts("2024-01-01 09:00:00"))  // no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts("2024-01-01 09:57:00"), "a"),
      (201L, 1L, ts("2024-01-01 10:02:00"), "b"),
      (202L, 1L, ts("2024-01-01 11:58:00"), "c"),
      (203L, 1L, ts("2024-01-01 12:02:00"), "d"),
      (204L, 2L, ts("2024-01-01 09:30:00"), "e"),
      (205L, 3L, ts("2024-01-01 08:30:00"), "f")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = AsOfJoin.nearest(left, right, "user_id", "ts",
        Map("event_id" -> "near_id", "event_type" -> "near_type"),
        tiebreak = "event_id", leftId = "event_id")
      .select("event_id", "near_id", "near_type")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got(100L) == ((Some(201L), Some("b"))), s"got ${got(100L)}")
    assert(got(101L) == ((Some(202L), Some("c"))), s"got ${got(101L)}")
    assert(got(102L) == ((Some(204L), Some("e"))), s"got ${got(102L)}")
    assert(got(103L) == ((Some(205L), Some("f"))), s"got ${got(103L)}")
    assert(got(104L) == ((None, None)), s"got ${got(104L)}")
  }
}
