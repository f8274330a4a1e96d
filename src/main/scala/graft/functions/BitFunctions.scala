package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-level flag helpers (SURVEY.md §2.8 X3-X4).
  *
  * Reference semantics: host_stats.py:54-71 (tcp flag vector),
  * ports_scan.py:176-177 (pure-SYN test),
  * dns_statistics.py:184-207 (DNS response/rcode bits).
  */
object BitFunctions {

  /** TCP control-bit names, LSB→MSB order of the low 8 bits. */
  val tcpFlagNames: Seq[String] = Seq("FIN", "SYN", "RST", "PSH", "ACK", "URG", "ECE", "CRW")

  /** 0/1 extraction of bit `k` (as long, summable). */
  def bit(c: Column, k: Int): Column = shiftright(c, k).bitwiseAND(1).cast("long")

  /** name → 0/1 column for each of the 8 TCP flags. */
  def tcpFlagCols(tcpFlags: Column): Seq[(String, Column)] =
    tcpFlagNames.zipWithIndex.map { case (n, i) => n -> bit(tcpFlags, i) }

  /** Pure-SYN predicate: (bits & 31) == 2 — reference ports_scan.py:177
    * masks the low 5 flag bits and requires SYN alone. */
  def pureSyn(tcpFlags: Column): Column = tcpFlags.bitwiseAND(31) === 2

  /** DNS header flags: bit 15 = response (dns_statistics.py:184-185). */
  def dnsIsResponse(dnsFlags: Column): Column =
    shiftright(dnsFlags, 15).bitwiseAND(1) === 1

  /** DNS rcode = low 4 bits (dns_statistics.py:192-207). */
  def dnsRcode(dnsFlags: Column): Column = dnsFlags.bitwiseAND(15)
}
