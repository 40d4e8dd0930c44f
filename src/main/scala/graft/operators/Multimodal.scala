package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata
  * extraction via batch `mapPartitions`.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake media dimensions from the
  * payload bytes. Everything around it — the binary column schema, the
  * typed Dataset, per-partition batch iteration (the shape a real codec
  * UDF needs: amortize codec init across a partition), and the metadata
  * schema — is real and oracle-checked.
  *
  * Scale: payloads stay opaque and partition-local; metadata extraction is
  * a narrow map (no shuffle); a real pipeline would fuse decode +
  * feature-extract in the same partition pass.
  */
object Multimodal {

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Meta(doc_id: Long, byte_len: Long, width: Long, height: Long,
    frames: Long, decode_status: String)

  /** The deterministic stand-in for a codec: byte length → fake dims. */
  def decodeStub(docId: Long, bytes: Array[Byte]): Meta = {
    val n = bytes.length.toLong
    Meta(docId, n,
      width = 64L + n % 193L,
      height = 64L + (n * 31L) % 157L,
      frames = 1L + docId % 8L,
      decode_status = "stubbed")
  }

  /** documents.text encoded to a binary payload column, decoded per
    * partition. The mapPartitions iterator is the real batch shape —
    * codec state would be initialized once per partition here.
    */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"))
      .as[Payload]
      .mapPartitions { rows =>
        // per-partition init point (codec handle in a real pipeline)
        rows.map(p => decodeStub(p.doc_id, p.payload))
      }
      .toDF()
  }

  val metaSql: String = """
    SELECT doc_id,
      octet_length(encode(text)) AS byte_len,
      64 + octet_length(encode(text)) % 193 AS width,
      64 + (octet_length(encode(text)) * 31) % 157 AS height,
      1 + doc_id % 8 AS frames,
      'stubbed' AS decode_status
    FROM documents"""
}
