package graft.core

import org.apache.spark.sql.types._

/** IPFIX flow-record schema — the engine's streaming input contract.
  *
  * Field inventory derived from the reference's consumed keys (SURVEY.md §1.1;
  * reference: the applications spark apps, e.g. host_stats.py:149-152,
  * dns_statistics.py:169-219, tls_classification.py:202-206). One Kafka
  * message = one JSON object = one unidirectional flow. All fields nullable:
  * the reference tests key presence per record, which maps to isNotNull here.
  */
object FlowSchema {

  /** Flat column names (the `ipfix.` prefix of the reference JSON keys is
    * dropped; `from_json` field mapping restores it on ingest). */
  object F {
    val srcIp4    = "src_ip4"
    val dstIp4    = "dst_ip4"
    val srcIp6    = "src_ip6"
    val dstIp6    = "dst_ip6"
    val protocol  = "protocol"
    val srcPort   = "src_port"
    val dstPort   = "dst_port"
    val packets   = "packets"
    val bytes     = "bytes"
    val tcpFlags  = "tcp_flags"
    val startMs   = "start_ms"
    val endMs     = "end_ms"
    val httpHost  = "http_host"
    val dnsName   = "dns_name"
    val dnsQtype  = "dns_qtype"
    val dnsFlags  = "dns_flags"
    val dnsCrrType = "dns_crr_type"
    val dnsCrrName = "dns_crr_name"
    val dnsRdata  = "dns_rdata"
    val dnsRdataLen = "dns_rdata_len"
    val tlsCipherSuites = "tls_cipher_suites"
  }

  /** JSON key (reference wire format) → engine column name. */
  val jsonFieldMap: Seq[(String, String)] = Seq(
    "ipfix.sourceIPv4Address"        -> F.srcIp4,
    "ipfix.destinationIPv4Address"   -> F.dstIp4,
    "ipfix.sourceIPv6Address"        -> F.srcIp6,
    "ipfix.destinationIPv6Address"   -> F.dstIp6,
    "ipfix.protocolIdentifier"       -> F.protocol,
    "ipfix.sourceTransportPort"      -> F.srcPort,
    "ipfix.destinationTransportPort" -> F.dstPort,
    "ipfix.packetDeltaCount"         -> F.packets,
    "ipfix.octetDeltaCount"          -> F.bytes,
    "ipfix.tcpControlBits"           -> F.tcpFlags,
    "ipfix.flowStartMilliseconds"    -> F.startMs,
    "ipfix.flowEndMilliseconds"      -> F.endMs,
    "ipfix.HTTPRequestHost"          -> F.httpHost,
    "ipfix.DNSName"                  -> F.dnsName,
    "ipfix.DNSQType"                 -> F.dnsQtype,
    "ipfix.DNSFlagsCodes"            -> F.dnsFlags,
    "ipfix.DNSCrrType"               -> F.dnsCrrType,
    "ipfix.DNSCrrName"               -> F.dnsCrrName,
    "ipfix.DNSRData"                 -> F.dnsRdata,
    "ipfix.DNSRDataLength"           -> F.dnsRdataLen,
    "ipfix.TLSClientCipherSuites"    -> F.tlsCipherSuites,
  )

  private def typeOf(col: String): DataType = col match {
    case F.srcIp4 | F.dstIp4 | F.srcIp6 | F.dstIp6 | F.httpHost |
         F.dnsName | F.dnsCrrName | F.dnsRdata | F.tlsCipherSuites => StringType
    case F.protocol | F.srcPort | F.dstPort | F.tcpFlags |
         F.dnsQtype | F.dnsFlags | F.dnsCrrType | F.dnsRdataLen => IntegerType
    case F.packets | F.bytes | F.startMs | F.endMs => LongType
    case other => throw new IllegalArgumentException(other)
  }

  /** Engine-internal flow schema (flat column names). */
  val schema: StructType =
    StructType(jsonFieldMap.map { case (_, c) => StructField(c, typeOf(c)) })

  /** Wire schema with the reference's `ipfix.*` JSON keys, for
    * `from_json` over raw Kafka/text payloads. */
  val wireSchema: StructType =
    StructType(jsonFieldMap.map { case (k, c) => StructField(k, typeOf(c)) })
}

/** Typed view of a flow record for Dataset[Flow] detection logic. */
case class Flow(
    src_ip4: Option[String],
    dst_ip4: Option[String],
    src_ip6: Option[String],
    dst_ip6: Option[String],
    protocol: Option[Int],
    src_port: Option[Int],
    dst_port: Option[Int],
    packets: Option[Long],
    bytes: Option[Long],
    tcp_flags: Option[Int],
    start_ms: Option[Long],
    end_ms: Option[Long],
    http_host: Option[String],
    dns_name: Option[String],
    dns_qtype: Option[Int],
    dns_flags: Option[Int],
    dns_crr_type: Option[Int],
    dns_crr_name: Option[String],
    dns_rdata: Option[String],
    dns_rdata_len: Option[Int],
    tls_cipher_suites: Option[String])
