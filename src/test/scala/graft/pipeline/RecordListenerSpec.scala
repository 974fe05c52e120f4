package graft.pipeline

import graft.SparkSuite
import java.nio.file.Files

/** Scheduler-bus write metrics (the reference's SparkRecordListener):
  * records committed by writer tasks, counted with no extra job. */
class RecordListenerSpec extends SparkSuite {

  test("counts records committed by a parquet write, detaches cleanly") {
    val s = spark
    val out = Files.createTempDirectory("graft_reclisten").toString
    val (_, rec) = RecordListener.around(s) {
      s.range(0, 12345, 1, 4).write.mode("overwrite").parquet(s"$out/t")
    }
    assert(rec.recordsWritten == 12345L, s"recordsWritten=${rec.recordsWritten}")
    assert(rec.tasks.size >= 4, s"tasks=${rec.tasks.size}")
    assert(rec.recordsPerSec > 0.0)
    // detached: a later write adds nothing to this listener
    s.range(0, 100).write.mode("overwrite").parquet(s"$out/u")
    Thread.sleep(200)
    assert(rec.recordsWritten == 12345L)
  }
}
