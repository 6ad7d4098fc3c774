package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaIO

/** Option-surface spec for the KafkaIO façade — the connector jars are
  * absent from this container, so these tests pin the Beam→Spark
  * option TRANSLATION (the semantic mapping), not broker IO. */
class KafkaIoSpec extends AnyFunSuite {

  test("read: topics → subscribe, defaults match KafkaIO (latest, strict)") {
    val o = KafkaIO.Read("b1:9092,b2:9092",
      topics = Seq("clicks", "views")).options
    assert(o("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(o("subscribe") == "clicks,views")
    assert(o("startingOffsets") == "latest")
    // data loss is an error by default (Spark's and Beam KafkaIO's
    // shared behavior); tolerance is an explicit opt-in
    assert(o("failOnDataLoss") == "true")
    val tolerant = KafkaIO.Read("b1:9092", topics = Seq("t"),
      failOnDataLoss = false).options
    assert(tolerant("failOnDataLoss") == "false")
    assert(!o.contains("assign") && !o.contains("subscribePattern"))
  }

  test("read: topicPartitions → assign JSON; pattern → subscribePattern") {
    val o = KafkaIO.Read("b:9092",
      topicPartitions = Seq(("t2", 1), ("t1", 0), ("t2", 0))).options
    assert(o("assign") == """{"t1":[0],"t2":[0,1]}""")
    val p = KafkaIO.Read("b:9092", topicPattern = Some("logs-.*")).options
    assert(p("subscribePattern") == "logs-.*")
  }

  test("read: startReadTime overrides startingOffsets (withStartReadTime)") {
    val o = KafkaIO.Read("b:9092", topics = Seq("t"),
      startReadTimeMs = Some(1723500000000L),
      maxOffsetsPerTrigger = Some(50000L)).options
    assert(o("startingTimestamp") == "1723500000000")
    assert(!o.contains("startingOffsets"))
    assert(o("maxOffsetsPerTrigger") == "50000")
  }

  test("read: consumer config rides with the kafka. prefix; exclusivity enforced") {
    val o = KafkaIO.Read("b:9092", topics = Seq("t"),
      consumerConfig = Map("group.id" -> "graft", "fetch.min.bytes" -> "1024"))
      .options
    assert(o("kafka.group.id") == "graft")
    assert(o("kafka.fetch.min.bytes") == "1024")
    // zero subscriptions and two subscriptions both fail at build time
    intercept[IllegalArgumentException] { KafkaIO.Read("b:9092").options }
    intercept[IllegalArgumentException] {
      KafkaIO.Read("b:9092", topics = Seq("t"),
        topicPattern = Some("x.*")).options
    }
    intercept[IllegalArgumentException] {
      KafkaIO.Read("b:9092", topics = Seq("t"),
        startingOffsets = "bogus").options
    }
  }

  test("write: topic + producer config; per-row routing needs no topic") {
    val o = KafkaIO.Write("b:9092", topic = Some("out"),
      producerConfig = Map("acks" -> "all")).options
    assert(o("topic") == "out")
    assert(o("kafka.acks") == "all")
    val dynamic = KafkaIO.Write("b:9092").options
    assert(!dynamic.contains("topic")) // per-row `topic` column routes
  }
}
