package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, when}

/** Byte-for-byte repair of the city names the reference fixes with a
  * 9-branch CASE chain, duplicated verbatim at
  * `/root/reference/processing/retreat_process.py:122-132` and
  * `/root/reference/processing/service_process.py:75-85`. The source
  * patterns contain the literal U+FFFD replacement char (SURVEY §7.4).
  */
object Mojibake {

  val Repairs: Seq[(String, String)] = Seq(
    "Bogota" -> "Bogotá D.C.",
    "Bagad�" -> "Bagadó",
    "Facatativ�" -> "Facatativá",
    "Jamund�" -> "Jamundí",
    "Medellin" -> "Medellín",
    "Monter�a" -> "Montería",
    "Nuqu�" -> "Nuquí",
    "Quibd�" -> "Quibdó",
    "Valpara�so" -> "Valparaíso")

  /** CASE chain over `c`; unmatched values pass through unchanged. */
  def repairCity(c: Column): Column =
    Repairs.foldLeft(None: Option[Column]) { case (acc, (bad, good)) =>
      Some(acc.fold(when(c === bad, good))(_.when(c === bad, good)))
    }.get.otherwise(c)

  def repairMunicipio: Column = repairCity(col("municipio"))
}
