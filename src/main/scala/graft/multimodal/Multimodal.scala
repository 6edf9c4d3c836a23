package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: payload as an opaque binary column + typed
  * metadata — the columnar layout for multimodal corpora (images,
  * audio, video frames) in a training-data pipeline. */
case class MediaRecord(
    media_id: Long,
    kind: String,           // "image" | "audio" | "video"
    bytes: Array[Byte],
    format: String,         // container/codec tag, e.g. "png", "wav"
    width: Int, height: Int, // 0 when not applicable
    duration_ms: Long)       // 0 for stills

case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    byte_entropy: Double,
    feature: Array[Float])  // fixed-dim embedding-shaped output

/** Integer-exact feature surface for cross-engine verification: DOUBLE
  * entropy / FLOAT features can't hash-match across engines, so the
  * oracle-checked query emits only integers derivable from the payload
  * bytes — byte-value histogram quartile counts, byte sum, and one
  * fold bucket (count of bytes ≡ 0 mod 16, the d=0 cell of
  * [[Multimodal.decodeStub]]'s folded histogram feature). */
case class MediaIntFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    byte_sum: Long,
    hist_q0: Long, hist_q1: Long, hist_q2: Long, hist_q3: Long,
    fold_mod16_0: Long)

/** Multimodal column plumbing (additive — BASELINE.json north star).
  *
  * The Spark-side mechanics are real and tested: binary payload
  * columns with typed metadata, partition-parallel batch decode via
  * `mapPartitions` over a typed Dataset (the Scala-native analogue of
  * Python's `mapInPandas` batches — one decoder instantiation per
  * partition, not per row), deterministic frame sampling as a
  * generator. ONLY the codec step is stubbed: this container ships no
  * image/audio libraries, so [[decodeStub]] derives features from the
  * raw bytes deterministically where a real implementation would call
  * into a decoder (marked below).
  *
  * Scale notes: payloads ride the same parquet scan as everything else
  * (binary column pages are only read when the decode stage needs
  * them — column pruning applies to blobs too); decode is pure
  * map-side work, no shuffle; frame sampling multiplies rows BEFORE
  * feature extraction so the expensive stage parallelizes across
  * frames, not videos.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic synthetic corpus (no media libs in the container —
    * payload bytes are seeded pseudo-random, sized like thumbnails). */
  def syntheticCorpus(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (i * 37 % 512).toInt
      val bytes = Array.tabulate(len)(j => ((i * 131 + j * 7) % 256).toByte)
      MediaRecord(i, kind,
        bytes,
        Seq("png", "wav", "mp4")((i % 3).toInt),
        if (kind == "audio") 0 else 64, if (kind == "audio") 0 else 64,
        if (kind == "image") 0L else 1000L + i % 9000)
    }
  }

  /** Batch feature extraction. A production build would decode
    * `r.bytes` with an image/audio codec here; the container has none,
    * so the stub derives a deterministic feature vector from the raw
    * payload (byte histogram folded to FeatureDim) — the surrounding
    * plumbing (typed batches, per-partition execution, output schema)
    * is exactly what the real decoder would plug into. */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init — where a real codec/ONNX session would be
      // constructed once and reused across the batch:
      it.map { r =>
        val hist = new Array[Long](256)
        r.bytes.foreach(b => hist(b & 0xff) += 1)
        val total = math.max(r.bytes.length, 1).toDouble
        val entropy = -hist.filter(_ > 0).map { c =>
          val p = c / total; p * math.log(p) / math.log(2)
        }.sum
        val feature = Array.tabulate(FeatureDim) { d =>
          // real impl: decoded-pixel / spectrogram features (??? in
          // spirit — deterministic fake so tests can assert exact
          // values without a codec)
          (0 until 256 by FeatureDim).map(k => hist(k + d)).sum.toFloat / total.toFloat
        }
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          entropy, feature)
      }
    }
  }

  /** Where the shared multimodal fixture lands so the DuckDB oracle can
    * read the IDENTICAL payload bytes Spark processes (testdata is
    * read-only; target/ is the repo's gitignored scratch space, and an
    * absolute path keeps Spark and DuckDB agreeing regardless of cwd). */
  val CorpusPath = "/root/repo/target/graft_fixtures/multimodal_corpus.parquet"

  /** Materialize the deterministic synthetic corpus as parquet and read
    * it back — both engines consume the same file, so the comparison
    * checks the decode math, not corpus generation. Overwrite is cheap
    * (single small file) and keeps the fixture fresh across runs. */
  def corpusParquet(spark: SparkSession, n: Int,
                    path: String = CorpusPath): Dataset[MediaRecord] = {
    import spark.implicits._
    syntheticCorpus(spark, n).coalesce(1)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path).as[MediaRecord]
  }

  /** Integer-exact batch feature extraction (oracle-checked variant of
    * [[decodeStub]]): same mapPartitions plumbing — per-partition batch
    * stage over binary payloads, where a real codec would sit — but the
    * emitted features are integers DuckDB reproduces bit-for-bit from
    * `hex(bytes)` (see SparkEntry.oracleSql q_multimodal_features). */
  def decodeIntFeatures(media: Dataset[MediaRecord]): Dataset[MediaIntFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        var sum = 0L
        val hist = new Array[Long](4)
        var mod16 = 0L
        r.bytes.foreach { b =>
          val v = b & 0xff
          sum += v
          hist(v >> 6) += 1
          if (v % 16 == 0) mod16 += 1
        }
        MediaIntFeatures(r.media_id, r.kind, r.bytes.length.toLong, sum,
          hist(0), hist(1), hist(2), hist(3), mod16)
      }
    }
  }

  /** "Resize" stage stub: a real implementation decodes, scales to
    * `side`×`side`, re-encodes. Without a codec, the stub
    * deterministically subsamples the payload to side*side bytes
    * (stride sampling) and rewrites the metadata — exercising the real
    * plumbing (binary in, binary out, metadata update, map-side only).
    */
  def resizeStub(media: Dataset[MediaRecord], side: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val n = side * side
      val out =
        if (r.bytes.length <= n) r.bytes
        else Array.tabulate(n)(i => r.bytes((i.toLong * r.bytes.length / n).toInt))
      r.copy(bytes = out, width = math.min(r.width, side),
             height = math.min(r.height, side))
    }
  }

  /** Deterministic frame sampling for videos: one row per sampled
    * frame at `everyMs` intervals (generator shape — rows multiply
    * before the expensive per-frame stage). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"),
              // real impl: seek+decode the frame; stub keeps plumbing
              substring(col("bytes"), 1, 64).as("frame_bytes"))
}
