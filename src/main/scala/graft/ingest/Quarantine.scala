package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corrupt-record routing for semi-structured ingestion: parse a JSON
  * string column PERMISSIVE-style (`from_json` → null on malformed
  * input) and tag each row `ok` / `quarantined` instead of failing the
  * job — Spark 4 runs ANSI mode, so an unguarded cast pipeline would
  * throw on the first bad record at hour 9 of a 10-hour run.
  *
  * The split is a single projection (no second scan, no filter+union):
  * downstream writers fan out by the `status` column, e.g.
  * `.write.partitionBy("status")`, so good rows and the quarantine
  * land in one pass.
  */
object Quarantine {

  /** Parse `jsonCol` into `parsed` (struct of `schema`) and add
    * `status`: quarantined when the probe field (first schema field)
    * is null after parsing — for envelopes with a mandatory field,
    * that is exactly "malformed or missing-required". */
  def parseJson(df: DataFrame, jsonCol: Column, schema: StructType): DataFrame = {
    val probe = schema.fieldNames.head
    df.withColumn("parsed", from_json(jsonCol, schema))
      .withColumn("status",
        when(col("parsed").getField(probe).isNull, "quarantined")
          .otherwise("ok"))
  }
}
