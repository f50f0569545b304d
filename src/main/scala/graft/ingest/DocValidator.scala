package graft.ingest

import graft.core.{Doc, QuarantineRow}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Ingest validation + quarantine (SURVEY.md S2/X1/S9).
  *
  * The reference validates each shard eagerly — every `.ann` must pair with
  * a `.txt` (large_scale_prediction_pipeline_tf.py:293-322), span text must
  * reconstruct exactly (brat_json_converter.py:228-242) — and skips bad
  * documents into `.err.log` side files rather than failing the run
  * (tf.py:418-424). The engine keeps that contract: structurally invalid
  * rows are diverted to a quarantine table; valid rows pass through with
  * their span sequence untouched (the BASELINE per-row invariant: kind,
  * text, media_ref, order).
  *
  * Checks per row:
  *  - non-null, non-empty doc_id;
  *  - spans non-empty; kind ∈ {text, media};
  *  - text spans carry text and empty media_ref; media spans carry a
  *    media_ref and empty text;
  *  - offsets strictly increasing and consistent with text lengths
  *    (offset_{i+1} ≥ offset_i + max(len(text_i), 1)).
  */
object DocValidator extends Serializable {

  def validate(doc: Doc): Option[String] = {
    if (doc.doc_id == null || doc.doc_id.isEmpty) return Some("empty doc_id")
    if (doc.spans == null || doc.spans.isEmpty) return Some("no spans")
    var prevEnd = 0 // offsets are document positions: the first span must sit at >= 0
    var i = 0
    for (sp <- doc.spans) {
      sp.kind match {
        case "text" =>
          if (sp.text == null) return Some(s"span $i: null text")
          if (sp.media_ref != null && sp.media_ref.nonEmpty)
            return Some(s"span $i: text span with media_ref")
        case "media" =>
          if (sp.media_ref == null || sp.media_ref.isEmpty)
            return Some(s"span $i: media span without media_ref")
          if (sp.text != null && sp.text.nonEmpty)
            return Some(s"span $i: media span with text")
        case k => return Some(s"span $i: unknown kind '$k'")
      }
      if (sp.offset < prevEnd) return Some(s"span $i: offsets not increasing")
      prevEnd = sp.offset + math.max(if (sp.text == null) 0 else sp.text.length, 1)
      i += 1
    }
    None
  }

  /** Split docs into (valid passthrough, quarantine). The passthrough is a
    * pure filter — span sequences are never rebuilt, so the per-row span
    * invariant holds trivially (property-tested in SpanInvariantSpec). */
  def split(docs: Dataset[Doc])(implicit spark: SparkSession)
      : (Dataset[Doc], Dataset[QuarantineRow]) = {
    import spark.implicits._
    val good = docs.filter((d: Doc) => validate(d).isEmpty)
    val bad = docs.flatMap(d => validate(d).map(r => QuarantineRow(d.doc_id, r)))
    (good, bad)
  }
}
