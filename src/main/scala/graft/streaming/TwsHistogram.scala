package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

final case class SourcedDoc(source: String, lang: String)

final case class SourceLangCount(source: String, lang: String, n: Long)

/** Per-source language histogram on transformWithState MAP state —
  * the third state shape of the Spark 4 API (NearDupStream uses
  * ListState, TwsSessions ValueState + timers): one MapState[lang →
  * count] per source key, updated in place and re-emitted for the
  * langs touched this batch (Update mode). State is O(sources ×
  * langs-per-source) FOREVER — the mixture monitor a 100 TB/day
  * multilingual ingest keeps running to drive q184-style resampling,
  * without re-aggregating history. MapState beats a ValueState[Map]
  * here because RocksDB updates/reads single map entries — a hot
  * source with a wide histogram does not rewrite its whole map each
  * batch. */
class SourceLangProcessor
    extends StatefulProcessor[String, SourcedDoc, SourceLangCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[SourcedDoc],
      timerValues: TimerValues): Iterator[SourceLangCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { d =>
      val cur = if (counts.containsKey(d.lang)) counts.getValue(d.lang) else 0L
      counts.updateValue(d.lang, cur + 1L)
      touched += d.lang
    }
    touched.iterator.map(l => SourceLangCount(key, l, counts.getValue(l)))
  }
}

object TwsHistogram {

  /** Update-mode stream of (source, lang, running n) — the latest
    * emission per (source, lang) IS the count so far. Requires the
    * RocksDB provider (NearDupStream.RocksProvider). */
  def sourceLangCounts(docs: Dataset[SourcedDoc]): Dataset[SourceLangCount] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new SourceLangProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
