package graft.stream

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties}

/** Split-invariance of the shared session fold (pure logic, no Spark):
  * folding a user's events in ANY batch partitioning — threading the
  * open session through, closing the tail at the end — yields exactly
  * the sessions of a single whole-stream fold. This is the algebraic
  * property that makes the streaming machines correct under arbitrary
  * chunking AND stop/restart: micro-batch boundaries (and checkpoint
  * restarts) are just splits.
  */
object SessionFoldProperties extends Properties("SessionFold") {

  private val GapUs = 30L * 60 * 1000000

  private val genEvents: Gen[List[SessionClose.Event]] = for {
    n <- Gen.choose(0, 40)
    // minute-scale offsets spanning multiples of the gap, micro jitter
    offs <- Gen.listOfN(n, Gen.choose(0L, 48L * 3600 * 1000000))
  } yield offs.sorted.map(us =>
    SessionClose.Event(1L, new Timestamp(1700000000000L + us / 1000), us.toDouble))

  private def foldAll(evs: List[SessionClose.Event],
      splits: List[Int]): List[SessionClose.Closed] = {
    // split evs into consecutive batches at the given cut points
    val cuts = (0 :: splits.filter(_ < evs.size).sorted.distinct) :+ evs.size
    val batches = cuts.zip(cuts.tail).map { case (a, b) => evs.slice(a, b) }
      .filter(_.nonEmpty)
    var open: Option[SessionClose.Open] = None
    val closed = batches.flatMap { b =>
      val (c, s) = SessionClose.foldBatch(1L, open, b.iterator, GapUs)
      open = Some(s)
      c
    }
    closed ++ open.map(SessionClose.emit(1L, _)).toList
  }

  property("any batch split yields the single-fold sessions") =
    Prop.forAll(genEvents, Gen.listOf(Gen.choose(0, 40))) { (evs, splits) =>
      evs.isEmpty || foldAll(evs, splits) == foldAll(evs, Nil)
    }

  property("session count = gap exceedances + 1") =
    Prop.forAll(genEvents) { evs =>
      evs.isEmpty || {
        val sessions = foldAll(evs, Nil)
        val us = evs.map(e => SessionClose.toMicros(e.ts))
        val breaks = us.zip(us.tail).count { case (a, b) => b - a > GapUs }
        sessions.size == breaks + 1 &&
          sessions.map(_.n_events).sum == evs.size
      }
    }
}
