package graft.sources

import scala.xml.{Elem, XML}

/** Station record matching the reference's live-feed fields
  * (`/root/reference/airflow/dags/ingest_bike_data.py:232`: id, name,
  * terminalName, lat, long — we keep the identity fields). */
case class Station(id: Long, name: String, terminalName: String)

/** XML station-feed source (ref S7:
  * `/root/reference/airflow/dags/ingest_bike_data.py:208-257` — ElementTree
  * extraction of `<station>` elements from the TfL live feed).
  *
  * Re-expressed with scala.xml (on the Spark classpath) for the bounded
  * driver-side parse: a live feed is a single small document fetched at
  * ingest, so parsing happens before the data enters a DataFrame, exactly
  * as the reference does it in plain Python. The distributed path (a
  * directory of XML files at scale) would wrap the same element extraction
  * in `spark.read.text` + a per-partition parse.
  */
object XmlStations {

  def render(stations: Seq[Station]): String = {
    val body = stations.map { st =>
      s"<station><id>${st.id}</id><name>${escape(st.name)}</name>" +
        s"<terminalName>${escape(st.terminalName)}</terminalName></station>"
    }.mkString
    s"<stations>$body</stations>"
  }

  def parse(xml: String): Seq[Station] = {
    val root: Elem = XML.loadString(xml)
    (root \\ "station").map { st =>
      Station(
        id = (st \ "id").text.trim.toLong,
        name = (st \ "name").text,
        terminalName = (st \ "terminalName").text)
    }
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
