package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka IO façade — Beam's `KafkaIO` (reference:
  * sdks/java/io/kafka/src/main/java/org/apache/beam/sdk/io/kafka/
  * KafkaIO.java:598 `read()` / :906 `write()`) re-expressed onto Spark
  * Structured Streaming's `format("kafka")` source/sink, which is the
  * 1:1 public equivalent (spark-sql-kafka connector).
  *
  * INTEGRATION-UNTESTED: the kafka connector jars are absent from this
  * container, so [[Read.load]] / [[Write.save]] cannot run here. What
  * IS tested (KafkaIoSpec) is the option-surface translation — the
  * part that holds the Beam→Spark semantic mapping:
  *
  *  - `withBootstrapServers` → `kafka.bootstrap.servers`
  *  - `withTopics` → `subscribe` (comma-joined);
  *    `withTopicPartitions` → `assign` (JSON `{"topic":[0,1]}`);
  *    topic regex → `subscribePattern`. Exactly one must be set —
  *    same exclusivity KafkaIO enforces at expand() time.
  *  - `withStartReadTime(t)` → `startingTimestamp` (millis);
  *    otherwise `startingOffsets` earliest/latest. Beam's default is
  *    latest (consumer `auto.offset.reset`); this façade defaults to
  *    "latest" to match.
  *  - `withMaxNumRecords` has no bounded-read analog in a Spark stream;
  *    the rate-limit mapping is `maxOffsetsPerTrigger` (records per
  *    micro-batch across partitions) — documented, not equivalent.
  *  - `commitOffsetsInFinalize` → nothing: Spark tracks offsets in its
  *    own checkpoint (groupId commits are cosmetic); callers that need
  *    lag monitoring pass consumer group via `kafka.group.id`.
  *  - timestamp policy (`withCreateTime` / `withLogAppendTime` /
  *    `withProcessingTime`, KafkaIO's TimestampPolicyFactory): Spark
  *    surfaces the broker record timestamp as the `timestamp` column
  *    with `timestampType` (0=CreateTime, 1=LogAppendTime) — event
  *    time is CHOSEN DOWNSTREAM via `withWatermark("timestamp", …)`,
  *    so create-time vs append-time is a per-record column pick, not a
  *    source config. Processing time = `current_timestamp()`.
  *  - key/value Deserializers → none: the Spark source always yields
  *    `key`/`value` as BINARY; decode declaratively downstream
  *    (`cast("string")`, from_json, from_avro) — the Catalyst-visible
  *    (pushdown/codegen-friendly) form of Beam's Deserializer plug.
  *
  * Scale: Spark maps Kafka partitions to tasks 1:1 (`minPartitions`
  * can oversubscribe); a 1000-partition topic fans out across the
  * cluster with no extra shuffle before the first stateful op.
  */
object KafkaIO {

  /** Builder for the read side — mirrors `KafkaIO.read()`'s fluent
    * surface, resolves to Spark reader options via [[options]]. */
  final case class Read(
      bootstrapServers: String,
      topics: Seq[String] = Nil,
      topicPattern: Option[String] = None,
      /** (topic, partition) pairs — KafkaIO.withTopicPartitions. */
      topicPartitions: Seq[(String, Int)] = Nil,
      /** "earliest" | "latest" — consumer auto.offset.reset analog. */
      startingOffsets: String = "latest",
      /** KafkaIO.withStartReadTime — epoch millis; overrides
        * startingOffsets. */
      startReadTimeMs: Option[Long] = None,
      /** records per micro-batch (rate limit; see scaladoc re
        * withMaxNumRecords). */
      maxOffsetsPerTrigger: Option[Long] = None,
      /** fail the query on deleted topics / compacted-away offsets.
        * Default true — both Spark's own default and Beam KafkaIO's
        * behavior (data loss surfaces as a read error); set false to
        * explicitly opt into skipping lost ranges. */
      failOnDataLoss: Boolean = true,
      /** raw consumer properties (KafkaIO.withConsumerConfigUpdates) —
        * passed through with the `kafka.` prefix Spark requires. */
      consumerConfig: Map[String, String] = Map.empty) {

    def options: Map[String, String] = {
      require(bootstrapServers.nonEmpty, "bootstrapServers is required")
      val subscriptions = Seq(
        topics.nonEmpty, topicPattern.isDefined, topicPartitions.nonEmpty)
      require(subscriptions.count(identity) == 1,
        "exactly one of topics / topicPattern / topicPartitions must be " +
          "set (KafkaIO enforces the same at expand())")
      require(Set("earliest", "latest").contains(startingOffsets),
        s"startingOffsets must be earliest|latest: $startingOffsets")
      val subscription: (String, String) =
        if (topics.nonEmpty) "subscribe" -> topics.mkString(",")
        else if (topicPattern.isDefined) "subscribePattern" -> topicPattern.get
        else "assign" -> topicPartitions.groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (t, ps) =>
            s""""$t":[${ps.map(_._2).sorted.mkString(",")}]"""
          }.mkString("{", ",", "}")
      val start: (String, String) = startReadTimeMs match {
        case Some(ms) => "startingTimestamp" -> ms.toString
        case None => "startingOffsets" -> startingOffsets
      }
      Map("kafka.bootstrap.servers" -> bootstrapServers,
        subscription, start,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        consumerConfig.map { case (k, v) => s"kafka.$k" -> v }
    }

    /** `spark.readStream.format("kafka")` with the resolved options —
      * requires the spark-sql-kafka connector on the classpath
      * (integration-untested in this container; see object scaladoc).
      * Output schema: key/value BINARY, topic, partition, offset,
      * timestamp, timestampType. */
    def load(spark: SparkSession): DataFrame =
      spark.readStream.format("kafka").options(options).load()
  }

  /** Builder for the write side — `KafkaIO.write()`. The input frame
    * must carry `value` (BINARY or STRING) and optionally `key` /
    * `topic` / `partition` / `headers` columns — Spark's contract,
    * which is also how Beam's `KafkaRecord`-per-element write maps. */
  final case class Write(
      bootstrapServers: String,
      /** default topic; omit when a per-row `topic` column routes
        * records (Beam's `withTopic` vs dynamic destinations). */
      topic: Option[String] = None,
      /** producer properties (KafkaIO.withProducerConfigUpdates). */
      producerConfig: Map[String, String] = Map.empty) {

    def options: Map[String, String] = {
      require(bootstrapServers.nonEmpty, "bootstrapServers is required")
      Map("kafka.bootstrap.servers" -> bootstrapServers) ++
        topic.map("topic" -> _) ++
        producerConfig.map { case (k, v) => s"kafka.$k" -> v }
    }

    /** `df.writeStream.format("kafka")` with the resolved options
      * (integration-untested here; see object scaladoc). */
    def save(df: DataFrame, checkpointLocation: String)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      df.writeStream.format("kafka")
        .option("checkpointLocation", checkpointLocation)
        .options(options)
  }
}
