package graft.sources

import java.io.{InputStream, OutputStream}

import scala.jdk.CollectionConverters._

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionCodecFactory,
  CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** Hadoop `CompressionCodec` for Zstandard (`.zst`), backed by the
  * zstd-jni streams Spark already ships for shuffle/parquet
  * compression — no new dependency, no native hadoop lib required
  * (Hadoop's own `ZStandardCodec` needs libhadoop built with zstd,
  * which most Spark-only deployments don't have).
  *
  * Registering this codec (see [[Zstd.register]]) makes `.zst`
  * transparent to EVERY Hadoop-text-based reader and writer — the
  * JSONL/WET sources, `spark.read.text/json/csv`, and compressed text
  * sinks via `option("compression", Zstd.codecName)` — exactly how
  * `.gz` already behaves. That matters because modern public corpora
  * (Dolma, RedPajama, FineWeb) ship as `.jsonl.zst` shards.
  *
  * Scale shape: like gzip, a plain zstd stream is not seekable, so the
  * codec is non-splittable and parallelism is per FILE — corpora ship
  * as many ~100 MB–1 GB shards and the scan parallelizes across them
  * (the under-shard guard in [[Sources]] warns when it can't).
  * Concatenated frames (the common shard-append layout) decode
  * transparently: zstd-jni continues into the next frame at each
  * frame boundary.
  *
  * The codec advertises no pooled `Compressor`/`Decompressor` (zstd-jni
  * manages its native contexts inside the streams); Hadoop's
  * `CodecPool` handles the null type by constructing streams through
  * the codec directly, which is the path below.
  */
final class ZstdHadoopCodec extends CompressionCodec {

  override def getDefaultExtension: String = ".zst"

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdHadoopCodec.ZstdIn(in)

  override def createInputStream(in: InputStream,
      decompressor: Decompressor): CompressionInputStream =
    createInputStream(in) // no pooled decompressors (see class doc)

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdHadoopCodec.ZstdOut(out)

  override def createOutputStream(out: OutputStream,
      compressor: Compressor): CompressionOutputStream =
    createOutputStream(out) // no pooled compressors (see class doc)

  override def getCompressorType: Class[_ <: Compressor] = null
  override def createCompressor(): Compressor = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def createDecompressor(): Decompressor = null
}

object ZstdHadoopCodec {

  private final class ZstdIn(raw: InputStream)
      extends CompressionInputStream(raw) {
    private var zin = new ZstdInputStream(raw)

    override def read(): Int = zin.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      zin.read(b, off, len)
    override def available(): Int = zin.available()

    /** Restart decoding from the (re-positioned) underlying stream —
      * only ever called at a file start, since the codec is
      * non-splittable. */
    override def resetState(): Unit = {
      zin.close()
      zin = new ZstdInputStream(in)
    }

    override def close(): Unit =
      try zin.close() // closes the underlying stream too
      finally super.close()
  }

  private final class ZstdOut(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val zout = new ZstdOutputStream(raw)
    private var closed = false

    override def write(b: Int): Unit = zout.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      zout.write(b, off, len)

    /** End the current frame but keep the underlying stream open (the
      * Hadoop contract for record writers that interleave codec and
      * raw output). The next write starts a fresh frame; concatenated
      * frames decode transparently. */
    override def finish(): Unit = {
      zout.setCloseFrameOnFlush(true)
      zout.flush()
      zout.setCloseFrameOnFlush(false)
    }

    override def flush(): Unit = zout.flush()
    override def resetState(): Unit = () // next write opens a new frame

    override def close(): Unit = if (!closed) {
      closed = true
      zout.close() // finishes the frame and closes the underlying stream
    }
  }
}

/** Registration + naming helpers for [[ZstdHadoopCodec]]. */
object Zstd {

  /** Codec class name — pass as `option("compression", Zstd.codecName)`
    * on any text-based writer for `.zst` output. */
  val codecName: String = classOf[ZstdHadoopCodec].getName

  /** Idempotently append [[ZstdHadoopCodec]] to the Hadoop
    * `io.compression.codecs` list, preserving whatever codecs are
    * already effective (setting the key REPLACES Hadoop's
    * ServiceLoader defaults, so the current effective list is read
    * back first and ours appended). */
  def register(conf: Configuration): Unit = Zstd.synchronized {
    val key = "io.compression.codecs"
    val current = Option(conf.get(key))
    if (!current.exists(_.contains(codecName))) {
      val effective = CompressionCodecFactory.getCodecClasses(conf)
        .asScala.map(_.getName)
      conf.set(key, (effective :+ codecName).distinct.mkString(","))
    }
  }
}
