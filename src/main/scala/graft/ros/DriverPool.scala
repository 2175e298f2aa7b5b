package graft.ros

/** Bounded driver-side pool for plan-time per-file metadata fan-out —
  * the shared shape behind RosbagIO.scanIndexes / Db3IO.scanMetas /
  * the pruning probes: 32 readers saturate any filesystem's metadata
  * path, results keep input order, the ORIGINAL failure surfaces (not
  * the pool's ExecutionException), and teardown is shutdownNow so a
  * failure does not drain thousands of queued scans.
  */
private[ros] object DriverPool {
  def parMap[A, B](items: Seq[A], par: Int = 32)(f: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    if (items.size == 1) return items.map(f)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(par, items.size))
    try {
      val futs = items.map(a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        }))
      futs.map { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally { pool.shutdownNow(); () }
  }

  /** Total byte size of `files` (driver-side, parallel stat calls) —
    * the `estimateStatistics` input for the container sources.
    */
  private[ros] def totalBytes(files: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Long =
    parMap(files) { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
}
