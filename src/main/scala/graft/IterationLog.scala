package graft

/** Round counts of iterative operators (connected components, k-means),
  * recorded per operator name on each run. Scale probes and Bench read
  * this to put convergence behavior in the evidence log — at 100 TB the
  * iteration count IS the cost model for these operators, so it must be
  * observable, not guessed from wall time.
  *
  * Sentinel: -1 means the operator short-circuited to a driver-local
  * path (e.g. dedup_clusters' small-graph union-find gate) — no
  * distributed rounds ran, which is NOT the same as converging in 0
  * rounds. Artifact readers comparing convergence across rounds should
  * treat -1 as "gated", not as a round count.
  */
object IterationLog {
  private val rounds = new java.util.concurrent.ConcurrentHashMap[String, Int]()

  def record(name: String, n: Int): Unit = { rounds.put(name, n); () }

  /** Snapshot of operator → rounds recorded since JVM start (last run wins). */
  def snapshot: Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    rounds.asScala.toMap
  }
}
