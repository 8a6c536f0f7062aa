package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.sinks.EvolvingTableSink

/** Model-based randomized check of the r13 sink lifecycle: a seeded
  * stream of writes / backfills / compactions / expirations — with
  * sidecar-rewind CRASHES injected before a third of the commits — is
  * replayed against a driver-side model of what each snapshot should
  * contain. After every operation the spec asserts:
  *
  *   - `read` returns exactly the model's visible rows (crashed,
  *     uncommitted work — including an uncommitted compaction's
  *     `replaces` — never shows);
  *   - `readAsOf(latest)` equals `read`;
  *   - a RETAINED historical snapshot still returns the rows the model
  *     recorded when that snapshot committed (compaction does not
  *     rewrite history);
  *   - an EXPIRED snapshot throws rather than answering wrong.
  *
  * The deterministic EvolvingTableSinkSpec covers each behavior once;
  * this spec covers their INTERLEAVINGS, which is where the r12 crash
  * windows actually lived.
  */
class SinkLifecyclePropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.engine.Sessions.local(4, "graft-test")

  private val schema = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("event_timestamp", TimestampType, nullable = false)))

  private def df(keys: Seq[Int]) = spark.createDataFrame(
    java.util.Arrays.asList(keys.map(k => Row(Integer.valueOf(k),
      java.sql.Timestamp.valueOf(s"2024-01-0${1 + k % 9} 10:00:00"))): _*),
    schema)

  test("random write/backfill/compact/expire interleavings with crash injection") {
    // fixed seed for CI determinism; GRAFT_FUZZ_SEED explores other
    // interleavings in local shake-out runs
    val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260815L)
    val rng = new scala.util.Random(seed)
    val dir = Files.createTempDirectory("graft_sink_prop").toString + "/bronze"
    val sink = new EvolvingTableSink(dir)
    val sidecar = java.nio.file.Paths.get(dir, "_graft_meta.json")

    var nextKey = 0
    var nextBatchId = 0L
    var visible = Set.empty[Int]
    // committed snapshot history the sink must preserve: (seq, keys)
    var history = Vector.empty[(Long, Set[Int])]
    var expiredBefore = 1L // earliest retained seq (seqs below threw away)

    def readKeys(): Set[Int] =
      sink.read(spark).select("k").collect().map(_.getInt(0)).toSet
    def asOfKeys(seq: Long): Set[Int] =
      sink.readAsOf(spark, seq).select("k").collect().map(_.getInt(0)).toSet
    def latestSeq: Long = history.lastOption.map(_._1).getOrElse(0L)

    def checkInvariants(): Unit = {
      if (!Files.exists(sidecar)) return // nothing committed yet
      assert(readKeys() == visible, "read != model")
      if (history.nonEmpty) {
        assert(asOfKeys(Long.MaxValue) == visible, "asOf(latest) != read")
        val (seq, keys) = history(rng.nextInt(history.size))
        assert(asOfKeys(seq) == keys, s"asOf($seq) rewrote history")
      }
      if (expiredBefore > 1) {
        val e = intercept[IllegalStateException] {
          sink.readAsOf(spark, expiredBefore - 1)
        }
        assert(e.getMessage.contains("expired"))
      }
    }

    def freshKeys(n: Int): Seq[Int] = {
      val ks = (nextKey until nextKey + n).toSeq
      nextKey += n
      ks
    }

    // a commit op with optional crash-before-sidecar injection: run
    // `op`, rewind the sidecar (the crash), assert NOTHING changed,
    // then run `op` again (the replay) and apply the model update
    def committing(crash: Boolean)(op: () => Unit)(apply: () => Unit): Unit = {
      if (crash) {
        val pre = Files.readAllBytes(sidecar)
        op()
        Files.write(sidecar, pre)
        assert(readKeys() == visible, "crashed op leaked rows")
        if (history.nonEmpty)
          assert(asOfKeys(Long.MaxValue) == visible, "crashed op leaked into asOf")
      }
      op()
      apply()
    }

    for (step <- 1 to 40) {
      val crash = rng.nextInt(3) == 0 && Files.exists(sidecar)
      rng.nextInt(10) match {
        case r if r <= 4 => // streaming write
          val ks = freshKeys(1 + rng.nextInt(3))
          val id = nextBatchId
          committing(crash)(() => assert(sink.write(df(ks), batchId = id))) { () =>
            nextBatchId += 1
            visible ++= ks
            history :+= ((latestSeq + (if (crash) 2 else 1), visible))
          }
          // a replayed (already committed) id must be skipped
          assert(!sink.write(df(freshKeys(1)), batchId = id))
        case r if r <= 6 => // backfill
          val ks = freshKeys(1 + rng.nextInt(2))
          committing(crash)(() => assert(sink.write(df(ks)))) { () =>
            visible ++= ks
            history :+= ((latestSeq + (if (crash) 2 else 1), visible))
          }
        case r if r <= 8 && history.size >= 2 => // compact everything visible
          var res: Option[Long] = None
          committing(crash)(() => res = sink.compactBatches(spark)) { () =>
            res.foreach(seq => history :+= ((seq, visible)))
          }
        case _ if history.size >= 2 => // expire
          val keep = 1 + rng.nextInt(2)
          sink.expireSnapshots(keepLast = keep)
          if (history.size > keep) {
            history = history.takeRight(keep)
            expiredBefore = history.head._1
          }
        case _ => () // not enough history yet for compact/expire
      }
      checkInvariants()
    }
    // end state sanity: the model saw real traffic and at least one
    // maintenance op survived the gauntlet
    assert(visible.nonEmpty && nextKey > 10)
    assert(readKeys() == visible)
  }
}
