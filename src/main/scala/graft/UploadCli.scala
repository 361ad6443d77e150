package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.sources.LocalDrive

/** The reference's standalone upload CLI
  * (`/root/reference/scripts/upload_drive.py:16-56`) against the
  * LocalDrive analog: settings come from the environment (.env file +
  * process env, override=False), the name defaults to the source
  * file's own, a missing source file is created with placeholder
  * content (the script's self-test behavior), and the resulting stable
  * file id is printed.
  *
  * Usage: `sbt "runMain graft.UploadCli <driveRoot> <file> [fileName]"`
  * Env: `DRIVE_FOLDER_ID` (optional target folder id),
  *      `DRIVE_CONVERT_TO_SHEETS` (default true, reference
  *      `settings.py:81`), `GRAFT_ENV_FILE` (.env path, default
  *      `config/.env`), plus the standard Settings keys.
  */
object UploadCli {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try println(run(spark, args, sys.env))
    finally spark.stop()
  }

  /** Effectful core, env injected for testability. Returns the line
    * the script prints. */
  def run(spark: SparkSession, args: Array[String],
      procEnv: Map[String, String]): String = {
    require(args.length >= 2, "usage: UploadCli <driveRoot> <file> [fileName]")
    val root = Paths.get(args(0))
    val file = Paths.get(args(1))
    if (!Files.exists(file)) { // self-test file, like the script
      Files.createDirectories(file.toAbsolutePath.getParent)
      Files.writeString(file, "upload self-test placeholder")
    }
    val fileName = args.lift(2).filter(_.nonEmpty)
      .getOrElse(file.getFileName.toString)
    // config/.env + process env, override=False — like the script's
    // dotenv-backed settings load (`scripts/upload_drive.py:16-20`)
    val env = Settings.envWithDotEnv(Paths.get(
      procEnv.getOrElse("GRAFT_ENV_FILE", "config/.env")), procEnv)
    val convert = env.get("DRIVE_CONVERT_TO_SHEETS")
      .forall(v => Set("1", "true", "yes", "y", "on")
        .contains(v.trim.toLowerCase(java.util.Locale.ROOT)))
    val folderId = env.get("DRIVE_FOLDER_ID").filter(_.nonEmpty)
    val id = LocalDrive.uploadCsv(spark, file, root, fileName,
      folderId = folderId, convertToSheets = convert)
    s"Uploaded $fileName (ID: $id)"
  }
}
