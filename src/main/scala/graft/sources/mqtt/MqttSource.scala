package graft.sources.mqtt

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.MqttTopicMatches

/** DataSource V2 streaming MQTT source (SURVEY §2.1 S1).
  *
  * The reference subscribes a paho client to N topic filters and processes
  * messages via callbacks (/root/reference/mqtt2sql.py:737-787). Here the
  * driver-side client buffers received messages into [[MqttBroker]] (an
  * in-process stand-in for the network client — the seam where a real
  * paho-equivalent would sit, since this container has no broker), and the
  * engine consumes them through real MicroBatchStream mechanics:
  *
  *  - offsets = positions in the receive buffer; each trigger drains
  *    [start, end) exactly once, checkpointable and replayable — already a
  *    delivery upgrade over the reference's QoS-0 at-most-once;
  *  - subscription topic filters (`+`/`#`) are applied AT THE SOURCE
  *    (broker-side pushdown in the reference, mqtt2sql.py:757) via the same
  *    [[MqttTopicMatches]] compilation the engine exposes as a predicate;
  *  - rows are emitted in arrival order with receipt timestamps
  *    (mqtt2sql.py:522 semantics).
  *
  * Usage:
  * {{{
  *   MqttBroker.publish("b1", "tele/dev/SENSOR", bytes)
  *   spark.readStream.format("graft.sources.mqtt.MqttSourceProvider")
  *     .option("broker", "b1").option("subscribe", "tele/+/SENSOR").load()
  * }}}
  */
object MqttSchema {
  val schema: StructType = StructType(Seq(
    StructField("msg_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("qos", IntegerType, nullable = false),
    StructField("retain", IntegerType, nullable = false)))
}

/** In-process receive buffer: the stand-in for the driver-side network
  * client. `publish` is what the paho on_message callback would do.
  */
object MqttBroker {
  final case class Received(msgId: Long, tsMicros: Long, topic: String,
      value: Array[Byte], qos: Int, retain: Boolean)

  private val buffers = new ConcurrentHashMap[String, ArrayBuffer[Received]]()

  def publish(broker: String, topic: String, value: Array[Byte],
      qos: Int = 0, retain: Boolean = false,
      tsMicros: Long = System.currentTimeMillis() * 1000L): Unit = {
    val buf = buffers.computeIfAbsent(broker, _ => ArrayBuffer.empty)
    buf.synchronized { buf += Received(buf.size.toLong, tsMicros, topic, value, qos, retain) }
  }

  def size(broker: String): Int = {
    val buf = buffers.get(broker)
    if (buf == null) 0 else buf.synchronized(buf.size)
  }

  def slice(broker: String, from: Int, until: Int): Seq[Received] = {
    val buf = buffers.get(broker)
    if (buf == null) Seq.empty else buf.synchronized(buf.slice(from, until).toVector)
  }

  def clear(broker: String): Unit = buffers.remove(broker)
}

class MqttSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MqttSchema.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttTable(properties.asScala.toMap)
}

class MqttTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"mqtt:${props.getOrElse("broker", "default")}"
  override def schema(): StructType = MqttSchema.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new MqttScan(
      options.getOrDefault("broker", "default"),
      Option(options.get("subscribe")).map(_.split(',').toSeq).getOrElse(Seq("#")))
}

class MqttScan(broker: String, patterns: Seq[String]) extends Scan {
  override def readSchema(): StructType = MqttSchema.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MqttMicroBatchStream(broker, patterns)
}

case class MqttOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class MqttMicroBatchStream(broker: String, patterns: Seq[String]) extends MicroBatchStream {
  override def initialOffset(): Offset = MqttOffset(0L)
  override def latestOffset(): Offset = MqttOffset(MqttBroker.size(broker).toLong)
  override def deserializeOffset(json: String): Offset = MqttOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[MqttOffset].pos.toInt
    val until = end.asInstanceOf[MqttOffset].pos.toInt
    // subscription filter applied at the source — the engine never sees
    // non-matching messages (broker-side pushdown parity)
    val compiled = patterns.map(MqttTopicMatches.compile)
    val msgs = MqttBroker.slice(broker, from, until)
      .filter(m => compiled.exists(_.matcher(m.topic).matches()))
    // chunk for parallel consumption; order within a chunk is arrival order
    msgs.grouped(1024).map(chunk => MqttInputPartition(chunk.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new MqttReaderFactory
}

case class MqttInputPartition(msgs: Array[MqttBroker.Received]) extends InputPartition

class MqttReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val msgs = partition.asInstanceOf[MqttInputPartition].msgs
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < msgs.length }
      override def get(): InternalRow = {
        val m = msgs(i)
        InternalRow(m.msgId, m.tsMicros, UTF8String.fromString(m.topic),
          m.value, m.qos, if (m.retain) 1 else 0)
      }
      override def close(): Unit = ()
    }
  }
}
