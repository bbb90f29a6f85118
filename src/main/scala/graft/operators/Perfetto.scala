package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perfetto trace export: span tables → binary protobuf trace chunks.
  *
  * The reference streams one process's telemetry as Perfetto
  * `TracePacket`s — a process track descriptor, per-thread track
  * descriptors, then SliceBegin/SliceEnd track events with interned
  * names/categories/source-locations — framed as `Trace.packet`
  * (field 1) records and cut into ~8 KB chunks (reference:
  * rust/analytics/src/lakehouse/perfetto_trace_execution_plan.rs:1,
  * rust/perfetto/src/streaming_writer.rs:1, chunk_sender.rs:1).
  *
  * This is the same writer re-expressed for Spark: the protobuf wire
  * format is encoded by hand (varint + length-delimited framing — the
  * format is a public protocol, field numbers below are from
  * perfetto's trace.proto), and the per-process packet stream is
  * produced inside `groupByKey(process).flatMapGroups`, so every
  * process encodes in parallel and no executor ever holds more than
  * one process's spans — the same process-scoped bound the reference
  * gets from its per-process table function. Field order within a
  * packet is canonical ascending field number (protobuf encoders may
  * emit fields in any order; ascending is the conventional canonical
  * choice — consumers must accept any order, and our decoder does).
  *
  * Writer protocol mirrored from the reference:
  *  - process descriptor packet: sequence_flags=3,
  *    first_packet_on_sequence=true, then an explicit chunk flush;
  *  - each thread / async track descriptor packet: own chunk flush;
  *  - spans in begin order: SliceBegin + SliceEnd packets per span,
  *    chunk flush every 10 spans, 8 KB auto-flush in between;
  *  - names, categories and (file,line) source locations interned at
  *    first use (iids dense in order of first appearance), the new
  *    dictionary entries riding in that packet's `interned_data`.
  */
object Perfetto {

  /** One input span; `track` 0 = thread track, 1 = async track. */
  final case class PSpan(key: Long, track: Int, spanId: Long, name: String,
      depth: Long, beginMs: Long, endMs: Long)

  /** One output chunk (chunk_data kept alongside its accounting). */
  final case class PChunk(user_id: Long, chunk_id: Int, n_packets: Long,
      n_bytes: Long, chunk_md5: String, chunk_data: Array[Byte])

  // ---------------------------------------------------------------
  // protobuf wire primitives
  // ---------------------------------------------------------------

  def varint(v: Long): Array[Byte] = {
    val out = mutable.ArrayBuffer[Byte]()
    var x = v
    while ((x & ~0x7fL) != 0) { out += ((x & 0x7f) | 0x80).toByte; x >>>= 7 }
    out += (x & 0x7f).toByte
    out.toArray
  }

  private def key(field: Int, wire: Int): Array[Byte] = varint((field.toLong << 3) | wire)

  /** varint-typed field (wire type 0). */
  def vint(field: Int, v: Long): Array[Byte] = key(field, 0) ++ varint(v)

  /** length-delimited field (wire type 2). */
  def ld(field: Int, payload: Array[Byte]): Array[Byte] =
    key(field, 2) ++ varint(payload.length.toLong) ++ payload

  def pstr(field: Int, s: String): Array[Byte] = ld(field, s.getBytes(UTF_8))

  // ---------------------------------------------------------------
  // packet builders (field numbers: perfetto trace.proto, public)
  // ---------------------------------------------------------------

  // TracePacket: timestamp=8, trusted_packet_sequence_id=10,
  //   track_event=11, interned_data=12, sequence_flags=13,
  //   track_descriptor=60, first_packet_on_sequence=87
  // TrackDescriptor: uuid=1, name=2, process=3, thread=4, parent_uuid=5
  // ProcessDescriptor: pid=1, process_name=6
  // ThreadDescriptor: pid=1, tid=2, thread_name=5
  // TrackEvent: category_iids=3 (repeated, unpacked), type=9
  //   (SLICE_BEGIN=1, SLICE_END=2), name_iid=10, track_uuid=11,
  //   source_location_iid=34
  // InternedData: event_categories=1, event_names=2, source_locations=4
  // EventCategory / EventName: iid=1, name=2
  // SourceLocation: iid=1, file_name=2, line_number=4

  def processDescriptorPacket(uuid: Long, pid: Int, name: String): Array[Byte] = {
    val proc = vint(1, pid.toLong) ++ pstr(6, name)
    val track = vint(1, uuid) ++ ld(3, proc)
    vint(10, 1L) ++ ld(60, track) ++ vint(13, 3L) ++ vint(87, 1L)
  }

  def threadDescriptorPacket(uuid: Long, parentUuid: Long, pid: Int,
      tid: Int, name: String): Array[Byte] = {
    val thr = vint(1, pid.toLong) ++ vint(2, tid.toLong) ++ pstr(5, name)
    val track = vint(1, uuid) ++ ld(4, thr) ++ vint(5, parentUuid)
    vint(10, 1L) ++ ld(60, track) ++ vint(13, 2L)
  }

  def asyncTrackDescriptorPacket(uuid: Long, parentUuid: Long,
      name: String): Array[Byte] = {
    val track = vint(1, uuid) ++ pstr(2, name) ++ vint(5, parentUuid)
    vint(10, 1L) ++ ld(60, track) ++ vint(13, 2L)
  }

  /** New interned-dictionary entries introduced by one packet. */
  final case class NewInterned(
      names: Seq[(Long, String)] = Nil,
      cats: Seq[(Long, String)] = Nil,
      srcs: Seq[(Long, String, Long)] = Nil) {
    def isEmpty: Boolean = names.isEmpty && cats.isEmpty && srcs.isEmpty
  }

  def trackEventPacket(tsNs: Long, trackUuid: Long, sliceType: Int,
      nameIid: Long, catIid: Long, srcIid: Long, interned: NewInterned): Array[Byte] = {
    val ev = vint(3, catIid) ++ vint(9, sliceType.toLong) ++ vint(10, nameIid) ++
      vint(11, trackUuid) ++ vint(34, srcIid)
    val dict =
      if (interned.isEmpty) Array.emptyByteArray
      else {
        val cats = interned.cats.map { case (iid, n) => ld(1, vint(1, iid) ++ pstr(2, n)) }
        val names = interned.names.map { case (iid, n) => ld(2, vint(1, iid) ++ pstr(2, n)) }
        val srcs = interned.srcs.map { case (iid, f, line) =>
          ld(4, vint(1, iid) ++ pstr(2, f) ++ vint(4, line))
        }
        ld(12, (cats ++ names ++ srcs).fold(Array.emptyByteArray)(_ ++ _))
      }
    vint(8, tsNs) ++ vint(10, 1L) ++ ld(11, ev) ++ dict ++ vint(13, 2L)
  }

  // ---------------------------------------------------------------
  // deterministic ids (md5-based, SQL-reproducible: the oracle
  // computes the same value as CAST('0x'||substr(md5(s),1,14) AS BIGINT))
  // ---------------------------------------------------------------

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString

  /** First 14 hex digits of md5 → 56-bit non-negative Long. */
  def uuid56(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(14), 16)

  def processUuid(key: Long): Long = uuid56(s"process-$key")
  def threadUuid(key: Long): Long = uuid56(s"thread-$key")
  def asyncUuid(key: Long): Long = uuid56(s"async-$key")

  // ---------------------------------------------------------------
  // the writer: one process's packet stream → chunks
  // ---------------------------------------------------------------

  private final class ChunkBuffer(threshold: Int) {
    private val chunks = mutable.ArrayBuffer[(Array[Byte], Long)]()
    private val buf = new java.io.ByteArrayOutputStream(threshold + 256)
    private var packets = 0L

    /** Frame one packet as Trace.packet (field 1) and buffer it. */
    def write(packet: Array[Byte]): Unit = {
      val framed = ld(1, packet)
      buf.write(framed, 0, framed.length)
      packets += 1
      if (buf.size >= threshold) flush()
    }

    def flush(): Unit = if (buf.size > 0) {
      chunks += ((buf.toByteArray, packets))
      buf.reset() // toByteArray copied; reuse the backing array
      packets = 0L
    }

    def result(): Seq[(Array[Byte], Long)] = { flush(); chunks.toSeq }
  }

  /** Encode one process's spans. `thread` spans go on the thread
    * track nested (the caller guarantees stack nesting); `async`
    * spans go on the flat async track. Both sorted by (begin, id).
    */
  def encodeProcess(pkey: Long, thread: Seq[PSpan], async: Seq[PSpan],
      chunkBytes: Int = 8 * 1024): Seq[(Array[Byte], Long)] = {
    val pUuid = processUuid(pkey)
    val pid = pkey.toInt
    val buf = new ChunkBuffer(chunkBytes)
    val names = mutable.LinkedHashMap[String, Long]()
    val cats = mutable.LinkedHashMap[String, Long]()
    val srcs = mutable.LinkedHashMap[(String, Long), Long]()

    buf.write(processDescriptorPacket(pUuid, pid, s"user-$pkey"))
    buf.flush()
    if (thread.nonEmpty) {
      buf.write(threadDescriptorPacket(threadUuid(pkey), pUuid, pid, pid, s"user-$pkey-main"))
      buf.flush()
    }
    if (async.nonEmpty) {
      buf.write(asyncTrackDescriptorPacket(asyncUuid(pkey), pUuid, "Async Operations"))
      buf.flush()
    }

    def intern[K](m: mutable.LinkedHashMap[K, Long], k: K): (Long, Boolean) =
      m.get(k) match {
        case Some(iid) => (iid, false)
        case None => val iid = m.size + 1L; m(k) = iid; (iid, true)
      }

    def emitSpans(spans: Seq[PSpan], trackUuid: Long, cat: String,
        file: PSpan => String, line: PSpan => Long): Unit = {
      var count = 0
      spans.sortBy(s => (s.beginMs, s.spanId)).foreach { s =>
        // begin and end share the same interned entries; any new ones
        // ride in the begin packet (the reference does the same: both
        // events resolve through the writer's shared dictionaries).
        val (nameIid, newName) = intern(names, s.name)
        val (catIid, newCat) = intern(cats, cat)
        val (srcIid, newSrc) = intern(srcs, (file(s), line(s)))
        val dict = NewInterned(
          names = if (newName) Seq(nameIid -> s.name) else Nil,
          cats = if (newCat) Seq(catIid -> cat) else Nil,
          srcs = if (newSrc) Seq((srcIid, file(s), line(s))) else Nil)
        buf.write(trackEventPacket(s.beginMs * 1000000L, trackUuid, 1, nameIid, catIid, srcIid, dict))
        buf.write(trackEventPacket(s.endMs * 1000000L, trackUuid, 2, nameIid, catIid, srcIid, NewInterned()))
        count += 1
        if (count % 10 == 0) buf.flush()
      }
    }

    emitSpans(thread, threadUuid(pkey), "thread", s => s"span/${s.name}", _.depth + 1)
    emitSpans(async, asyncUuid(pkey), "async", s => s"async/${s.name}", _ => 1L)
    buf.result()
  }

  /** Distributed chunk generation over a union of thread (`track`=0)
    * and async (`track`=1) span rows. One group = one process = one
    * independent Perfetto trace, encoded in parallel across
    * executors; per-group state is that process's spans only (the
    * reference holds the same: its table function is per-process).
    */
  def traceChunks(spans: Dataset[PSpan],
      numPartitions: Option[Int] = None): Dataset[PChunk] = {
    val s = spans.sparkSession
    import s.implicits._
    numPartitions match {
      case Some(n) =>
        // Explicit hash repartition by process key: a user-specified
        // partition count is exempt from AQE partition coalescing, so
        // the encode stage keeps its parallelism even though its input
        // exchange is tiny in BYTES but dense in CPU — under the
        // default 1 MB coalesce floor the groupByKey exchange ran the
        // whole per-process protobuf encode on 2-3 of 32 cores (r15
        // StageProfile). The in-partition sort makes each process's
        // rows contiguous; per-task state stays bounded to one
        // process's spans, exactly like flatMapGroups. encodeProcess
        // sorts spans itself, so group order is irrelevant.
        spans.repartition(n, col("key")).sortWithinPartitions("key")
          .mapPartitions { it =>
            val in = it.buffered
            new Iterator[Iterator[PChunk]] {
              def hasNext: Boolean = in.hasNext
              def next(): Iterator[PChunk] = {
                val k = in.head.key
                val grp = mutable.ArrayBuffer[PSpan]()
                while (in.hasNext && in.head.key == k) grp += in.next()
                encodeGroup(k, grp.toSeq)
              }
            }.flatten
          }
      case None =>
        spans.groupByKey(_.key).flatMapGroups(
          (k: Long, it: Iterator[PSpan]) => encodeGroup(k, it.toSeq))
    }
  }

  /** One process's spans → its chunk rows (shared by both execution
    * shapes above so the encode semantics cannot drift between them).
    */
  private def encodeGroup(k: Long, all: Seq[PSpan]): Iterator[PChunk] = {
    val chunks = encodeProcess(k,
      thread = all.filter(_.track == 0), async = all.filter(_.track == 1))
    chunks.zipWithIndex.map { case ((bytes, nPackets), i) =>
      PChunk(k, i, nPackets, bytes.length.toLong, md5hex0(bytes), bytes)
    }.iterator
  }

  private def md5hex0(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map(x => f"$x%02x").mkString

  /** DataFrame front door: spans columns (key, span_id, name, depth,
    * begin_ms, end_ms); async spans optional second table.
    */
  def traceChunksDf(spark: SparkSession, threadSpans: DataFrame, keyCol: String,
      asyncSpans: Option[DataFrame] = None,
      numPartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    def shape(df: DataFrame, track: Int): Dataset[PSpan] =
      df.select(col(keyCol).cast("long").as("key"), lit(track).as("track"),
          col("span_id").cast("long").as("spanId"), col("name"),
          col("depth").cast("long").as("depth"), col("begin_ms").cast("long").as("beginMs"),
          col("end_ms").cast("long").as("endMs"))
        .as[PSpan]
    val in = asyncSpans match {
      case Some(a) => shape(threadSpans, 0).unionAll(shape(a, 1))
      case None => shape(threadSpans, 0)
    }
    traceChunks(in, numPartitions).toDF()
  }
}
