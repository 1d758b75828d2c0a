package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.extract.CalendarExtract
import graft.model.Schemas
import graft.operators.LoadOps

/** The calendar pipelines (`earnings-calendar-transform-load.rkt:40-157`,
  * `dividend-calendar-transform-load.rkt`):
  *
  * 1. K4 — retract the whole future slice (`date >= folder_date`) because
  *    estimated dates shift;
  * 2. U8 — parse the noisy JSON payloads into typed rows;
  * 3. K5 — per-symbol 7-day slide-forward retraction ("the event moved");
  * 4. K1 — ON-CONFLICT-DO-NOTHING append;
  * 5. J2 — collapse superseded estimated dates onto the newest entry per
  *    (symbol, quarter window) derived from statement snapshot dates
  *    (earnings only).
  *
  * Everything is a pure DataFrame rewrite of the stored table — "delete"
  * never mutates in place, the pipeline emits the next snapshot.
  */
object CalendarPipeline {

  /** Earnings: payloads must carry `raw` + `event_date` (see
    * [[graft.sources.RawZone.scanCalendarPayloads]]); `stmtDates` is the
    * balance-sheet-assets (symbol, date) history J2 derives windows from. */
  def runEarnings(existing: DataFrame, payloads: DataFrame,
                  folderDate: java.sql.Date,
                  stmtDates: DataFrame): DataFrame = {
    // Multi-consumer intermediates use a LAZY localCheckpoint rather than
    // cache(): same materialize-once behavior on first action, but the
    // storage is plain RDD blocks the ContextCleaner frees once the plan is
    // garbage-collected — a cache() here pins cache-manager storage for the
    // session, which in a daily loop over date folders accumulates until
    // eviction thrash (the caller would have to know to unpersist a plan it
    // never built).
    val fresh = CalendarExtract
      .earningsRows(payloads, col("raw"), col("event_date"))
      .filter(col("act_symbol").isNotNull && col("date").isNotNull)
      // consumed by K5's retraction probe AND K1's insert
      .localCheckpoint(eager = false)
    val afterK4 = existing.filter(col("date") < lit(folderDate))
    // K1 consumes `existing` twice (PK anti-join probe + the union) — for a
    // stored-table input that is two cheap pruned scans, but here the
    // existing side is the derived K4∘K5 plan: materialize it once
    val retracted =
      LoadOps.slideForwardRetract(afterK4, fresh, "act_symbol", "date")
        .localCheckpoint(eager = false)
    val loaded = LoadOps.dedupAppend(retracted, fresh,
      Schemas.primaryKeys("earnings_calendar"))
    LoadOps.supersededCleanup(loaded, stmtDates)
  }

  /** Dividends: same shape minus the J2 cleanup; PK is (act_symbol,
    * ex_date) and the slide-forward window runs on `ex_date`. */
  def runDividends(existing: DataFrame, payloads: DataFrame,
                   folderDate: java.sql.Date): DataFrame = {
    val fresh = CalendarExtract.dividendRows(payloads, col("raw"))
      .filter(col("act_symbol").isNotNull && col("ex_date").isNotNull &&
        col("amount").isNotNull)
      // K5 probe + K1 insert; lazy checkpoint, not cache — see runEarnings
      .localCheckpoint(eager = false)
    val afterK4 = existing.filter(col("ex_date") < lit(folderDate))
    val retracted =
      LoadOps.slideForwardRetract(afterK4, fresh, "act_symbol", "ex_date")
        // K1 reads the derived existing side twice
        .localCheckpoint(eager = false)
    LoadOps.dedupAppend(retracted, fresh,
      Schemas.primaryKeys("dividend_calendar"))
  }
}
