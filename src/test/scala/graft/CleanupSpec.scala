package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Cleanup registry's thread isolation: drain() must only
  * unpersist what the CALLING thread registered — a concurrent query on
  * another thread keeps its checkpoint blocks (unpersisting a
  * localCheckpoint is unrecoverable, not a recompute).
  */
class CleanupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("drain() is scoped to the calling thread's registrations") {
    Cleanup.drain() // start clean on this thread
    val mine = Cleanup.register(Seq(1, 2, 3).toDF("x").localCheckpoint())
    assert(Cleanup.pendingCount == 1)

    @volatile var otherPendingBefore = -1
    @volatile var otherPendingAfterOwnDrain = -1
    val worker = new Thread(() => {
      Cleanup.register(Seq(4, 5).toDF("y").localCheckpoint())
      otherPendingBefore = Cleanup.pendingCount
      Cleanup.drain()
      otherPendingAfterOwnDrain = Cleanup.pendingCount
    })
    worker.start()
    worker.join()

    assert(otherPendingBefore == 1, "worker thread sees only its own registration")
    assert(otherPendingAfterOwnDrain == 0)
    // the worker's drain must NOT have touched this thread's registration:
    // the checkpointed data is still materialized and usable
    assert(Cleanup.pendingCount == 1)
    assert(mine.count() == 3)
    Cleanup.drain()
    assert(Cleanup.pendingCount == 0)
  }
}
