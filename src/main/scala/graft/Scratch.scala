package graft

import java.nio.file.{Files, Path, Paths}

/** Per-run scratch directories for ephemeral harness state: streaming
  * checkpoints/offset logs, fixture staging, per-query catalog
  * warehouses. All of it is created, consumed, and deleted inside one
  * query's execution — durability across a crash buys nothing, but
  * every micro-batch pays an fsync into the offset/commit log and the
  * state store, so the DEVICE under these directories is a direct
  * multiplier on the streaming tier's floor (guide §6 I/O; r20
  * verdict item 4: "checkpoint/offset-log on an in-memory or
  * local-FS-backed store").
  *
  * Base resolution, in order:
  *  1. `SPARK_GRAFT_SCRATCH_DIR` env — production knob: point it at
  *     the fast local device (NVMe scratch, ramdisk) the deployment
  *     provisions for ephemeral state;
  *  2. `/dev/shm` when present and writable (Linux tmpfs — RAM-backed,
  *     fsync is a no-op; the data is MBs of fixture state, never a
  *     memory hazard);
  *  3. `java.io.tmpdir` — the previous behaviour, and the fallback on
  *     platforms without a tmpfs.
  *
  * This changes WHERE ephemeral state lives, never WHAT is computed:
  * every query still computes from its parquet inputs each run, and
  * nothing under the scratch base outlives its query (Bench/Verify
  * release residue per query exactly as before).
  */
object Scratch {
  lazy val base: Path = {
    val pick = sys.env.get("SPARK_GRAFT_SCRATCH_DIR").map(Paths.get(_))
      .orElse {
        val shm = Paths.get("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
        else None
      }
      .getOrElse(Paths.get(sys.props("java.io.tmpdir")))
    val root = pick.resolve("graft-scratch")
    Files.createDirectories(root)
    root
  }

  /** Drop-in replacement for `Files.createTempDirectory(prefix)`. */
  def dir(prefix: String): Path = Files.createTempDirectory(base, prefix)
}
