package graft.ingest

import graft.core.{Doc, GoldMention, GoldRelation, QuarantineRow, Span}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{Dataset, SparkSession}

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

/** Real brat shard ingestion: `.tar.gz` archives of `.ann`+`.txt` pairs —
  * the reference's unit of work, error isolation and resume
  * (large_scale_prediction_pipeline_tf.py:199-330) — into the engine's
  * typed Doc table plus gold mention/relation tables.
  *
  * Physical shape: `binaryFile` scans the shard directory (one task per
  * shard — the same parallel unit as the reference's one-SLURM-job-per-
  * folder), tar extraction and brat parsing run inside the map, and
  * everything downstream is the ordinary Dataset pipeline. A shard is at
  * most a few MB compressed (525 docs / 7.3 MB text in the shipped sample),
  * so whole-archive rows are comfortably within task memory at any corpus
  * scale — scale lives in the NUMBER of shards, which is exactly what a
  * file-source scan parallelizes.
  *
  * Fault isolation mirrors the reference's skip-and-continue
  * (tf.py:273-286, :418-424): a doc whose .ann fails to parse, or whose
  * .ann/.txt twin is missing (the S2/X1 member-integrity check,
  * tf.py:308-322), lands in the quarantine output with its error — never
  * fails the shard, never silently disappears.
  */
object ShardReader {

  /** One extracted archive member. `shard` is the archive path. */
  case class ShardMember(shard: String, name: String, content: String)

  /** One raw brat document (both members present). */
  case class RawBratDoc(shard: String, doc_id: String, ann: String, txt: String)

  /** Parsed shard output: the input-table Doc shape + gold tables +
    * quarantine. All five views share ONE cached parse pass; call
    * `unpersist()` after materializing the outputs to release it. */
  case class ShardDocs(docs: Dataset[Doc],
                       goldMentions: Dataset[GoldMention],
                       goldRelations: Dataset[GoldRelation],
                       multiSpan: Dataset[(String, String)],
                       quarantine: Dataset[QuarantineRow],
                       private val cached: Option[Dataset[_]] = None) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  /** Every file member of every `*.tar.gz` under `dir`. */
  def readMembers(spark: SparkSession, dir: String): Dataset[ShardMember] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar.gz")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val tin = new TarArchiveInputStream(
          new GZIPInputStream(new ByteArrayInputStream(bytes)))
        val out = Seq.newBuilder[ShardMember]
        var entry = tin.getNextEntry
        while (entry != null) {
          if (!entry.isDirectory) {
            // a TarArchiveInputStream bounds read() to the current entry
            val body = new String(tin.readAllBytes(), UTF_8)
            val name = entry.getName.stripPrefix("./")
            out += ShardMember(path, name, body)
          }
          entry = tin.getNextEntry
        }
        out.result()
      }
  }

  /** Pair `.ann`/`.txt` members into raw docs; a member without its twin
    * becomes a quarantine row (the reference HALTS the shard on this,
    * tf.py:308-322 — the engine isolates the doc instead, keeping the
    * shard's remaining docs). */
  /** Paired (shard, stem, ann?, txt?) rows — the single extraction +
    * grouping pass that both pairMembers and parseShardDir derive from. */
  def pairedMembers(members: Dataset[ShardMember])
  : Dataset[(String, String, Option[String], Option[String])] = {
    val spark = members.sparkSession
    import spark.implicits._
    val keyed = members.flatMap { m =>
      val dot = m.name.lastIndexOf('.')
      if (dot < 0) None
      else {
        val (stem, ext) = (m.name.substring(0, dot), m.name.substring(dot + 1))
        if (ext == "ann" || ext == "txt") Some((m.shard, stem, ext, m.content))
        else None
      }
    }
    keyed.groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, String), rows: Iterator[(String, String, String, String)]) =>
        var ann: Option[String] = None
        var txt: Option[String] = None
        rows.foreach { r =>
          if (r._3 == "ann") ann = Some(r._4) else txt = Some(r._4)
        }
        (key._1, key._2, ann, txt)
      }
  }

  /** The single missing-twin classifier both pairMembers and parseShardDir
    * quarantine with — one place for the error strings. */
  def twinError(ann: Option[String], txt: Option[String]): Option[String] =
    if (ann.isEmpty) Some("missing .ann for .txt")
    else if (txt.isEmpty) Some("missing .txt for .ann")
    else None

  def pairMembers(members: Dataset[ShardMember])
  : (Dataset[RawBratDoc], Dataset[QuarantineRow]) = {
    val spark = members.sparkSession
    import spark.implicits._
    val grouped = pairedMembers(members)
    val docs = grouped.flatMap { case (shard, stem, ann, txt) =>
      for (a <- ann; t <- txt) yield RawBratDoc(shard, stem, a, t)
    }
    val quarantine = grouped.flatMap { case (_, stem, ann, txt) =>
      twinError(ann, txt).map(QuarantineRow(stem, _))
    }
    (docs, quarantine)
  }

  /** Parse raw docs through BratParser into the engine's tables. Parse
    * failures (span-text mismatch, dangling relation args — the reference's
    * program_halt conditions) quarantine the DOC with the error message. */
  def parseShardDir(spark: SparkSession, dir: String): ShardDocs = {
    import spark.implicits._
    // ONE extraction + grouping + parse pass, cached: the missing-twin
    // check folds into the same tagged map as parse failures, so the
    // quarantine output no longer re-extracts every tar.gz a second time,
    // and every downstream view (docs, gold tables, quarantine) reads the
    // cache. The caller releases it with ShardDocs.unpersist().
    val parsed = pairedMembers(readMembers(spark, dir)).map {
      case (_, stem, annOpt, txtOpt) =>
        twinError(annOpt, txtOpt) match {
          case Some(err) =>
            (stem, "", Seq.empty[GoldMention], Seq.empty[GoldRelation],
              Seq.empty[String], err)
          case None =>
            try {
              val p = BratParser.parse(stem, annOpt.get, txtOpt.get)
              (stem, txtOpt.get, p.mentions, p.relations,
                p.multiSpanIds.toSeq.sorted, "")
            } catch {
              case e: Exception =>
                (stem, txtOpt.get, Seq.empty[GoldMention], Seq.empty[GoldRelation],
                  Seq.empty[String], Option(e.getMessage).getOrElse(e.toString))
            }
        }
    }.persist()
    val ok = parsed.filter(_._6.isEmpty)
    val docs = ok.map { case (id, txt, _, _, _, _) =>
      Doc(id, Seq(Span("text", txt, "", 0)))
    }
    val goldMentions = ok.flatMap(_._3)
    val goldRelations = ok.flatMap(_._4)
    val multiSpan = ok.flatMap { case (id, _, _, _, multi, _) =>
      multi.map(tid => (id, tid))
    }
    val quarantine = parsed.filter(_._6.nonEmpty)
      .map { case (id, _, _, _, _, err) => QuarantineRow(id, err) }
    ShardDocs(docs, goldMentions, goldRelations, multiSpan, quarantine,
      cached = Some(parsed))
  }
}
