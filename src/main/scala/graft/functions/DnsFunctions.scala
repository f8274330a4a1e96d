package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DNS decode helpers (SURVEY.md §2.8 X5, X6, X9).
  *
  * Reference semantics: dns_statistics.py:118-149 (qtype/rcode name maps),
  * DNSResponseConverter.py:30-72 (hex rdata → IPv4/IPv6/ASCII).
  * Lookup maps become literal map expressions (`element_at` + default) —
  * constant-folded, no broadcast needed at this size.
  */
object DnsFunctions {

  /** RR-type code → name (reference get_query_type, 70 entries). */
  val qtypeNames: Map[Int, String] = Map(
    1 -> "A", 2 -> "NS", 3 -> "MD", 4 -> "MF", 5 -> "CNAME", 6 -> "SOA",
    7 -> "MB", 8 -> "MG", 9 -> "MR", 10 -> "NULL", 11 -> "WKS", 12 -> "PTR",
    13 -> "HINFO", 14 -> "MINFO", 15 -> "MX", 16 -> "TXT", 17 -> "RP",
    18 -> "AFSDB", 19 -> "X25", 20 -> "ISDN", 21 -> "RT", 22 -> "NSAP",
    23 -> "NSAP-PTR", 24 -> "SIG", 25 -> "KEY", 26 -> "PX", 27 -> "GPOS",
    28 -> "AAAA", 29 -> "LOC", 30 -> "NXT", 31 -> "EID", 32 -> "NIMLOC",
    33 -> "SRV", 34 -> "ATMA", 35 -> "NAPTR", 36 -> "KX", 37 -> "CERT",
    38 -> "A6", 39 -> "DNAME", 40 -> "SINK", 41 -> "OPT", 42 -> "APL",
    43 -> "DS", 44 -> "SSHFP", 45 -> "IPSECKEY", 46 -> "RRSIG", 47 -> "NSEC",
    48 -> "DNSKEY", 49 -> "DHCID", 50 -> "NSEC3", 51 -> "NSEC3PARAM",
    52 -> "TLSA", 53 -> "SMIMEA", 55 -> "HIP", 56 -> "NINFO", 57 -> "RKEY",
    58 -> "TALINK", 59 -> "CDS", 60 -> "CDNSKEY", 61 -> "OPENPGPKEY",
    62 -> "CSYNC", 99 -> "SPF", 100 -> "UINFO", 101 -> "UID", 102 -> "GID",
    103 -> "UNSPEC", 104 -> "NID", 105 -> "L32", 106 -> "L64", 107 -> "LP",
    108 -> "EUI48", 109 -> "EUI64", 249 -> "TKEY", 250 -> "TSIG",
    251 -> "IXFR", 252 -> "AXFR", 255 -> "ANY", 256 -> "URI", 257 -> "CAA")

  /** rcode → name (reference get_response_code, 15 entries). */
  val rcodeNames: Map[Int, String] = Map(
    0 -> "NoError", 1 -> "FormErr", 2 -> "ServFail", 3 -> "NXDomain",
    4 -> "NotImp", 5 -> "Refused", 6 -> "YXDomain", 7 -> "YXRRSet",
    8 -> "NXRRSet", 9 -> "NotAuth", 10 -> "NotZone", 16 -> "BADSIG",
    17 -> "BADKEY", 18 -> "BADTIME", 19 -> "BADMODE")

  private def mapLookup(m: Map[Int, String], key: Column, default: String): Column = {
    val entries = m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    coalesce(element_at(map(entries: _*), key.cast("int")), lit(default))
  }

  /** qtype code → RR type name, default "OTHER". */
  def qtypeName(qtype: Column): Column = mapLookup(qtypeNames, qtype, "OTHER")

  /** rcode → name, default "Unknown". */
  def rcodeName(rcode: Column): Column = mapLookup(rcodeNames, rcode, "Unknown")

  /** Hex rdata ("0x..." octetArray) → dotted-quad IPv4. Reference takes the
    * first 10 chars incl. the 0x prefix = 4 octets
    * (DNSResponseConverter.py:45-52). Built-in composite: conv per octet. */
  def rdataToIpv4(rdata: Column): Column = {
    val body = substring(rdata, 3, 8)
    concat_ws(".",
      (0 until 4).map(i => conv(substring(body, 1 + 2 * i, 2), 16, 10)): _*)
  }

  /** Hex rdata → IPv6: first 34 chars incl. prefix = 8 colon groups
    * (DNSResponseConverter.py:55-62; non-canonical, reference keeps
    * leading zeros — we match). */
  def rdataToIpv6(rdata: Column): Column = {
    val body = substring(rdata, 3, 32)
    concat_ws(":", (0 until 8).map(i => substring(body, 1 + 4 * i, 4)): _*)
  }

  /** Hex rdata → ASCII payload after a 2-hex-char length prefix
    * (CNAME/NS/TXT path, DNSResponseConverter.py:65-72). */
  def rdataToAscii(rdata: Column): Column =
    decode(unhex(substring(rdata, 5, 1 << 20)), "UTF-8")

  /** Reference dispatch: rrtype 1→IPv4, 28→IPv6, else ASCII decode. */
  def rdataDecode(rdata: Column, rrtype: Column): Column =
    when(rrtype === 1, rdataToIpv4(rdata))
      .when(rrtype === 28, rdataToIpv6(rdata))
      .otherwise(rdataToAscii(rdata))
}
