package graft

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

/** TEST-ONLY stand-in for the `kafka` streaming source. The sandbox has
  * no spark-sql-kafka connector jar and no broker, so round 3 could
  * validate only the option MAP ([[graft.streaming.WeatherPipeline
  * .kafkaOptions]]) — `.load()` itself was never executed. This double
  * registers the same `kafka` short name through the same ServiceLoader
  * seam the real connector uses (META-INF/services/…DataSourceRegister
  * on the TEST classpath only), exposes the real connector's 7-column
  * output schema, and records the options Spark hands the provider — so
  * a test can drive `kafkaSource(...).load()` through actual source
  * resolution and assert the validated options survive the trip. The
  * source itself never produces data (`getOffset` = None): queries
  * start, run zero batches, and stop cleanly.
  */
class FakeKafkaProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "kafka"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    FakeKafkaProvider.record(parameters)
    ("kafka-test-double", FakeKafkaProvider.kafkaSchema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    FakeKafkaProvider.record(parameters)
    new Source {
      override def schema: StructType = FakeKafkaProvider.kafkaSchema
      override def getOffset: Option[Offset] = None // never has data
      override def getBatch(start: Option[Offset], end: Offset): DataFrame =
        throw new UnsupportedOperationException(
          "kafka test double never reports an offset, so no batch is ever requested")
      override def stop(): Unit = ()
    }
  }
}

object FakeKafkaProvider {
  /** The real connector's fixed output schema (Kafka source contract). */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Options as Spark delivered them, keys lowercased (Spark wraps
    * source options case-insensitively; the original casing is not
    * contractual).
    */
  @volatile var lastOptions: Map[String, String] = Map.empty

  private def record(parameters: Map[String, String]): Unit =
    lastOptions = parameters.map { case (k, v) => k.toLowerCase -> v }
}
