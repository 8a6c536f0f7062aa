package graft

import java.nio.file.Paths

import graft.fixtures.EventGen

/** Producer entrypoint mirroring the reference CLI
  * (reference: src/producer/__main__.py:23-101): generates fault-injected
  * JSON-array batch files on an interval until interrupted.
  *
  * Flags (same names/semantics as the reference):
  *   --data-sink stdout|local      (s3 exists in the reference; the
  *                                  object store is not reachable in this
  *                                  build env)
  *   --output-path DIR             (local sink)
  *   --events-per-batch N          default 100
  *   --batch-interval SECONDS      default 10
  *   --corruption-chance P         default 0.0
  *   --invalid-schema-chance P     default 0.0
  *   --duplicate-chance P          default 0.0
  *   --seed N                      default 42
  *   --batches N                   stop after N batches (0 = forever);
  *                                 extension for bounded runs
  */
object ProducerApp {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val sink = opts.getOrElse("--data-sink", "stdout")
    val perBatch = opts.getOrElse("--events-per-batch", "100").toInt
    val intervalS = opts.getOrElse("--batch-interval", "10").toDouble
    val nBatches = opts.getOrElse("--batches", "0").toInt
    val gen = new EventGen(
      seed = opts.getOrElse("--seed", "42").toLong,
      corruptionChance = opts.getOrElse("--corruption-chance", "0.0").toDouble,
      invalidSchemaChance = opts.getOrElse("--invalid-schema-chance", "0.0").toDouble,
      duplicateChance = opts.getOrElse("--duplicate-chance", "0.0").toDouble)

    var produced = 0
    while (nBatches == 0 || produced < nBatches) {
      sink match {
        case "local" =>
          val dir = Paths.get(opts.getOrElse("--output-path", "producer-out"))
          val p = gen.writeBatchFiles(dir, 1, perBatch).head
          System.err.println(s"[producer] wrote $p")
        case _ => println(gen.nextBatch(perBatch))
      }
      produced += 1
      if (nBatches == 0 || produced < nBatches)
        Thread.sleep((intervalS * 1000).toLong)
    }
  }
}
