package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Sessionize

/** Property-based session invariants (SURVEY.md §5): for arbitrary event
  * sets —
  *   - denied counts are positive (zero-count sessions suppressed);
  *   - per-user session windows are separated by more than the gap
  *     (gap-transitive merging: anything closer would have merged);
  *   - window bounds span their events (start ≤ every event <
  *     end = last + gap);
  *   - the total denied weight is preserved across sessionization;
  *   - users with only allowed events never appear.
  */
class SessionPropertySpec extends SparkSpec {

  import spark.implicits._

  private val GapSec = 600L
  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private val eventGen = for {
    user <- Gen.choose(1, 4)
    offsetSec <- Gen.choose(0L, 6 * 3600L)
    denied <- Gen.oneOf(true, false)
    weight <- Gen.choose(1, 20)
  } yield (user.toLong, new Timestamp(base + offsetSec * 1000), denied, weight.toLong)

  private val eventsGen = Gen.nonEmptyListOf(eventGen)

  /** Drive the generator directly (no scalatest-scalacheck bridge in the
    * offline dependency set): 15 deterministic samples.
    */
  private def forAllSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(v) => body(v)
        case None => ()
      }
    }

  test("session invariants hold for arbitrary event sets") {
    forAllSamples(eventsGen, 15) { evs =>
      val df = evs.toDF("user_id", "ts", "denied", "weight")
      val out = Sessionize
        .deniedCounts(df, "ts", "user_id", s"$GapSec seconds",
          denied = col("denied"), weight = col("weight"))
        .collect()

      // positive counts only
      assert(out.forall(_.getAs[Long]("denies") > 0))

      // totals preserved: sum of session counts == total denied weight
      val totalDenied = evs.filter(_._3).map(_._4).sum
      assert(out.map(_.getAs[Long]("denies")).sum == totalDenied)

      // users with only allowed events never appear
      val deniedUsers = evs.filter(_._3).map(_._1).toSet
      assert(out.forall(r => deniedUsers.contains(r.getAs[Long]("user_id"))))

      // windows: disjoint and separated by > gap per user; bounds span
      // the user's events that fall inside them
      out.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
        val wins = rows
          .map(r => (r.getAs[Timestamp]("session_start").getTime,
            r.getAs[Timestamp]("session_end").getTime))
          .sortBy(_._1)
        wins.sliding(2).foreach { pair =>
          if (pair.length == 2) {
            val (_, e1) = pair(0)
            val (s2, _) = pair(1)
            // end = last event + gap, so next start must be >= end
            // (events closer than gap would have merged)
            assert(s2 >= e1, s"user $u: sessions overlap or violate gap")
          }
        }
        val userEvents = evs.filter(_._1 == u).map(_._2.getTime)
        wins.foreach { case (s, e) =>
          val contained = userEvents.filter(t => t >= s && t < e)
          assert(contained.nonEmpty, s"user $u: empty session window")
          assert(e == contained.max + GapSec * 1000,
            s"user $u: end != last event + gap")
        }
      }
    }
  }
}
