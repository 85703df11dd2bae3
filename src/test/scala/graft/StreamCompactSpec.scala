package graft

import org.apache.spark.sql.Row

/** The streaming-compaction contract (round-10, VERDICT item 4): a drain
  * with compaction interleaved after every 2nd micro-batch must answer
  * row-for-row like the uncompacted q_stream_absorb drain (compaction is
  * semantically invisible MID-STREAM, not just between sessions), and the
  * final index table pair must hold at most ONE file per bucket — the
  * small-files problem the maintenance schedule exists to solve. */
class StreamCompactSpec extends SparkSpec {

  test("interleaved compaction: drain output row-equal to q_stream_absorb; ≤1 file per bucket") {
    var digestFiles: Array[String] = null
    var bucketFiles: Array[String] = null
    val compacted = engine.Streaming.streamClassifyAbsorbDrain(
      spark, sf, compactEvery = 2,
      inspectFinal = Some { name =>
        digestFiles = spark.table(s"${name}_digests").inputFiles
        bucketFiles = spark.table(s"${name}_buckets").inputFiles
        // last compaction ran after the final batch, so the pair the
        // drain ends on is freshly compacted
        assert(name.endsWith("_c3"), s"final table should be the batch-3 compaction, got $name")
      }).collect().toSeq
    val plain = engine.Streaming.qStreamAbsorb(spark, sf).collect().toSeq
    assert(compacted == plain,
      s"compacted drain diverged: ${compacted.size} vs ${plain.size} rows")

    // one file per bucket: bucketed part files encode the bucket id as
    // the _NNNNN suffix before the codec extension — each id at most once
    def bucketIds(files: Array[String]): Seq[String] =
      files.map { f =>
        val base = f.substring(f.lastIndexOf('/') + 1)
        val m = "_(\\d{5})\\.".r.findFirstMatchIn(base)
        assert(m.isDefined, s"unexpected bucketed file name $base")
        m.get.group(1)
      }.toSeq
    Seq("digests" -> digestFiles, "buckets" -> bucketFiles).foreach {
      case (which, files) =>
        assert(files != null && files.nonEmpty, s"$which: no files captured")
        val ids = bucketIds(files)
        assert(ids.distinct.size == ids.size,
          s"$which: a bucket holds >1 file after compaction: $ids")
    }
  }
}
