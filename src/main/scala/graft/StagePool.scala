package graft

/** Shared small thread pool for overlapping INDEPENDENT Spark job chains
  * inside one operator invocation (guide §2.6: actions are only
  * sequential because driver code calls them sequentially; 2–3 jobs in
  * flight fills the task tail without fighting for executors). Job
  * descriptions are thread-local, so each chain labels itself. Daemon
  * threads: the pool must never pin a JVM that stopped its session. */
object StagePool {
  lazy val ec: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(3,
        (r: Runnable) => {
          val t = new Thread(r, "graft-stage-pool")
          t.setDaemon(true)
          t
        }))
}
