package graft.io

/** Submit independent snapshot-building tasks as CONCURRENT Spark jobs.
  *
  * Spark's scheduler (local or cluster) interleaves stages of jobs
  * submitted from different driver threads, so the single-threaded tail
  * of one build (its write / footer pass) overlaps the scan of the next —
  * the same overlap a multi-tenant cluster scheduler provides. Safe only
  * for tasks whose OUTPUT tables are disjoint: SnapshotStore has no
  * shared mutable state (versions and pointers are per-table files), and
  * concurrent readers of the same source snapshot are read-only.
  */
object Concurrent {

  /** Test hook: force every group sequential (the SPARK_GRAFT_SEQ=1 code
    * path) so suites can compare a concurrent schedule against the same
    * schedule run serial within one JVM.
    */
  @volatile private[graft] var forceSequential: Boolean = false

  def runAll(tasks: Seq[() => Unit]): Unit =
    if (tasks.sizeIs <= 1 || forceSequential || sys.env.get("SPARK_GRAFT_SEQ").contains("1")) tasks.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
      try {
        // take results in COMPLETION order: a fast failure must not sit
        // unobserved behind a slow sibling's get()
        val ecs = new java.util.concurrent.ExecutorCompletionService[Unit](pool)
        val futures = tasks.map { t =>
          ecs.submit(new java.util.concurrent.Callable[Unit] { def call(): Unit = t() })
        }
        def cancelAndDrain(): Unit = {
          // don't let siblings keep writing while the caller unwinds:
          // cancel what hasn't run, interrupt in-flight tasks, and WAIT
          futures.foreach(_.cancel(true))
          pool.shutdownNow()
          pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
        }
        try (1 to tasks.size).foreach(_ => ecs.take().get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            cancelAndDrain()
            throw e.getCause
          case e: InterruptedException =>
            // outer cancellation while blocked in take(): same discipline —
            // siblings must not commit past the caller's unwind
            cancelAndDrain()
            Thread.currentThread().interrupt()
            throw e
        }
      } finally pool.shutdown()
    }
}
