package graft.sources

/** Test-visible forwarding for `private[sources]` capability probes
  * (the spec package is `graft`, not `graft.sources`). */
object ShardStatsSourceTestHook {
  def rowsAfterRuntimeFilter(path: String, gs: Set[String]): Long =
    ShardStatsSource.rowsAfterRuntimeFilter(path, gs)
}
