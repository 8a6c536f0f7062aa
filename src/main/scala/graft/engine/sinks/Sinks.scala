package graft.engine.sinks

import org.apache.spark.sql.DataFrame

/** S3/S4: plain parquet append sink, one call per micro-batch
  * (reference: src/consumer/data_sinks.py:23-65; the S3 variant differs
  * only in the s3a path string).
  */
final class ParquetAppendSink(val path: String) {
  def write(df: DataFrame): Unit =
    df.write.mode("append").parquet(path)
}
