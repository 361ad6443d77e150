package graft.streaming

import java.nio.file.{Files, Path}
import scala.util.Using

/** Teardown for per-run streaming residue. The r2 bench showed a
  * completed AvailableNow query is not free: its checkpoint directory
  * stays on disk, its memory-sink rows stay referenced, and the
  * executor-global state-store maintenance thread keeps cycling over
  * unloaded providers — enough to inflate a LATER streamed query ~5×
  * in a packed 65-query session. Every drained stream releases all
  * three before handing its result back.
  */
object StreamingResidue {

  /** Delete a checkpoint tree and stop state-store maintenance. Safe
    * while other BATCH queries run; the next streaming query lazily
    * restarts maintenance on first state-store load.
    */
  def release(checkpointDir: Path): Unit = {
    deleteRecursively(checkpointDir)
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Using.resource(Files.walk(p)) { stream =>
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
}
