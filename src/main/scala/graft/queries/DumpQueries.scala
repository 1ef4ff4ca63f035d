package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{DumpDecode, Multimodal, TarShard, TextAnalysis}

/** Published-dump ingest gates: the bzip2/xz multistream decode layer
  * ([[graft.operators.DumpDecode]]), the tar-shard sample reader
  * ([[graft.operators.TarShard]]), and the XML-dump → wikitext page
  * pipeline ([[graft.operators.XmlDump]]) — the source family for
  * corpora that arrive as published dumps (Wikipedia, mirrored
  * re-compressions, WebDataset shards) rather than crawl archives.
  * Fixtures are closed-form from table keys, so every gate's DuckDB
  * oracle re-derives the expected rows arithmetically.
  */
object DumpQueries {

  val all: Seq[Q] = Seq(

    // The bzip2 MULTISTREAM ingest — Wikipedia's dump layout:
    // byte-aligned concatenated streams, decoded member-wise by the
    // classpath reference implementation under this layer's bomb caps
    // and completed-prefix contract (DumpDecodeSpec certifies against
    // real-CLI golden bytes; THIS gate certifies the distributed
    // plumbing stays map-only and deterministic under Verify). The
    // middle member is EMPTY — a legal zero-block stream whose member
    // row must still appear, or downstream member_idx alignment against
    // a dump's offset index silently shifts.
    Q(
      "q_bz2_decode",
      (spark, dir) => {
        import spark.implicits._
        val mk = udf((k: Long) => {
          val m0 = (s"w${k % 7}x " * (5 + k % 4).toInt + s"end$k").getBytes("US-ASCII")
          val m2 = ("abacad" * (3 + (k % 3)).toInt).getBytes("US-ASCII")
          DumpDecode.bz2Member(m0) ++ DumpDecode.bz2Member(Array.emptyByteArray) ++
            DumpDecode.bz2Member(m2)
        })
        val out = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").cast("long").as("media_id"))
          .withColumn("payload", mk(col("media_id")))
          .as[(Long, Array[Byte])]
          .flatMap { case (id, p) =>
            DumpDecode.bz2Members(p).zipWithIndex.map {
              case (m, i) => (id, i, new String(m, "US-ASCII"))
            }
          }
          .toDF("media_id", "member_idx", "text")
        Q.requireNoShuffle(out)
        out
      },
      Some(
        """SELECT CAST(n_nationkey AS BIGINT) AS media_id, CAST(i AS INT) AS member_idx,
          |  CASE CAST(i AS INT)
          |    WHEN 0 THEN repeat('w' || CAST(n_nationkey % 7 AS VARCHAR) || 'x ',
          |                       CAST(5 + n_nationkey % 4 AS INT))
          |                || 'end' || CAST(n_nationkey AS VARCHAR)
          |    WHEN 1 THEN ''
          |    ELSE repeat('abacad', CAST(3 + n_nationkey % 3 AS INT))
          |  END AS text
          |FROM nation, UNNEST(generate_series(0, 2)) AS u(i)""".stripMargin
      )
    ),

    // The xz twin — same logical members under the other dump
    // compression (mirrors re-ship .bz2 dumps as .xz), sharing the
    // bz2 gate's oracle shape so the compression format is provably
    // invisible to the member layer. The torn tail (half of the
    // second stream, keyed on parity) exercises the completed-prefix
    // contract UNDER THE ORACLE: those members simply don't appear.
    Q(
      "q_xz_decode",
      (spark, dir) => {
        import spark.implicits._
        val mk = udf((k: Long) => {
          val m0 = (s"w${k % 7}x " * (5 + k % 4).toInt + s"end$k").getBytes("US-ASCII")
          val m1 = ("abacad" * (3 + (k % 3)).toInt).getBytes("US-ASCII")
          val s1 = DumpDecode.xzMember(m1)
          DumpDecode.xzMember(m0) ++
            (if (k % 2 == 0) s1 else s1.take(s1.length / 2))
        })
        val out = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").cast("long").as("media_id"))
          .withColumn("payload", mk(col("media_id")))
          .as[(Long, Array[Byte])]
          .flatMap { case (id, p) =>
            DumpDecode.xzMembers(p).zipWithIndex.map {
              case (m, i) => (id, i, new String(m, "US-ASCII"))
            }
          }
          .toDF("media_id", "member_idx", "text")
        Q.requireNoShuffle(out)
        out
      },
      Some(
        """SELECT CAST(n_nationkey AS BIGINT) AS media_id, CAST(i AS INT) AS member_idx,
          |  CASE CAST(i AS INT)
          |    WHEN 0 THEN repeat('w' || CAST(n_nationkey % 7 AS VARCHAR) || 'x ',
          |                       CAST(5 + n_nationkey % 4 AS INT))
          |                || 'end' || CAST(n_nationkey AS VARCHAR)
          |    ELSE repeat('abacad', CAST(3 + n_nationkey % 3 AS INT))
          |  END AS text
          |FROM nation, UNNEST(generate_series(0, 1)) AS u(i)
          |WHERE i = 0 OR n_nationkey % 2 = 0""".stripMargin
      )
    ),

    // The tar-shard member INVENTORY — the measurement pass over a
    // WebDataset shard before any sample assembly: one row per member
    // with name/typeflag/size, checksum-verified headers, the GNU
    // long-name arm in-gate (every k%5==0 shard carries a >100-char
    // path that must resolve through the 'L' entry). Map-only.
    Q(
      "q_tar_entries",
      (spark, dir) => {
        val mk = udf((k: Long) => {
          val n = (2 + k % 3).toInt
          val files = Seq((s"shard$k/", "5", Array.emptyByteArray)) ++
            (0 until n).flatMap { i =>
              Seq(
                (f"shard$k/$i%06d.txt", "0", s"cap $k item $i".getBytes("US-ASCII")),
                (f"shard$k/$i%06d.cls", "0", s"${(k + i) % 10}".getBytes("US-ASCII")))
            } ++
            (if (k % 5 == 0)
              Seq((s"shard$k/" + "L" * 95 + "/x.json", "0", "{}".getBytes("US-ASCII")))
            else Seq.empty)
          TarShard.tar(files)
        })
        val out = TarShard.entryRows(
          Q.t(spark, dir, "nation")
            .select(col("n_nationkey").cast("long").as("media_id"))
            .withColumn("payload", mk(col("media_id"))),
          "media_id", "payload")
        Q.requireNoShuffle(out)
        out
      },
      Some(
        """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
          |items AS (SELECT k, CAST(i AS INT) AS i FROM n,
          |          UNNEST(generate_series(0, 4)) u(i) WHERE i < 2 + k % 3)
          |SELECT k AS media_id, CAST(0 AS INT) AS entry_idx,
          |  'shard' || k || '/' AS name, '5' AS typeflag, CAST(0 AS BIGINT) AS size
          |FROM n
          |UNION ALL
          |SELECT k, CAST(1 + 2 * i AS INT),
          |  'shard' || k || '/' || lpad(CAST(i AS VARCHAR), 6, '0') || '.txt', '0',
          |  CAST(length('cap ' || k || ' item ' || i) AS BIGINT)
          |FROM items
          |UNION ALL
          |SELECT k, CAST(2 + 2 * i AS INT),
          |  'shard' || k || '/' || lpad(CAST(i AS VARCHAR), 6, '0') || '.cls', '0',
          |  CAST(1 AS BIGINT)
          |FROM items
          |UNION ALL
          |SELECT k, CAST(5 + 2 * (k % 3) AS INT),
          |  'shard' || k || '/' || repeat('L', 95) || '/x.json', '0', CAST(2 AS BIGINT)
          |FROM n WHERE k % 5 = 0""".stripMargin
      )
    ),

    // WebDataset SAMPLE assembly: consecutive same-stem members fold
    // into one sample inside the per-shard walk (`000007.txt` +
    // `000007.cls` = one record), so the reader is map-only — a sample
    // never spans shards, so no shuffle exists at any scale. The
    // long-name member forms its own single-part sample; the dot-less
    // contract and run-break laws are pinned in TarShardSpec.
    Q(
      "q_tar_samples",
      (spark, dir) => {
        val mk = udf((k: Long) => {
          val n = (2 + k % 3).toInt
          val files = (0 until n).flatMap { i =>
            Seq(
              (f"shard$k/$i%06d.txt", "0", s"cap $k item $i".getBytes("US-ASCII")),
              (f"shard$k/$i%06d.cls", "0", s"${(k + i) % 10}".getBytes("US-ASCII")))
          } ++
            (if (k % 5 == 0)
              Seq((s"shard$k/" + "L" * 95 + "/x.json", "0", "{}".getBytes("US-ASCII")))
            else Seq.empty)
          TarShard.tar(files)
        })
        val out = TarShard.sampleRows(
          Q.t(spark, dir, "nation")
            .select(col("n_nationkey").cast("long").as("media_id"))
            .withColumn("payload", mk(col("media_id"))),
          "media_id", "payload")
          .withColumn("content", col("data").cast("string"))
          .drop("data")
        Q.requireNoShuffle(out)
        out
      },
      Some(
        """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
          |items AS (SELECT k, CAST(i AS INT) AS i FROM n,
          |          UNNEST(generate_series(0, 4)) u(i) WHERE i < 2 + k % 3)
          |SELECT k AS media_id, i AS sample_idx,
          |  'shard' || k || '/' || lpad(CAST(i AS VARCHAR), 6, '0') AS sample_key,
          |  'txt' AS ext, 'cap ' || k || ' item ' || i AS content
          |FROM items
          |UNION ALL
          |SELECT k, i, 'shard' || k || '/' || lpad(CAST(i AS VARCHAR), 6, '0'),
          |  'cls', CAST((k + i) % 10 AS VARCHAR)
          |FROM items
          |UNION ALL
          |SELECT k, CAST(2 + k % 3 AS INT),
          |  'shard' || k || '/' || repeat('L', 95) || '/x', 'json', '{}'
          |FROM n WHERE k % 5 = 0""".stripMargin
      )
    ),

    // The multimodal WebDataset pipeline CLOSED: shard → samples →
    // pair each sample's image part with its caption part → decode the
    // image (the real BMP decoder from the media layer) → caption
    // token count. One flatMap does shard-to-features; the only
    // columns that survive are the training-table ones. Map-only.
    Q(
      "q_tar_pipeline",
      (spark, dir) => {
        import spark.implicits._
        val mk = udf((k: Long) => {
          val n = (2 + k % 2).toInt
          TarShard.tar((0 until n).flatMap { i =>
            Seq(
              (f"$i%06d.bmp", "0",
                Multimodal.syntheticBmp(k * 7 + i, (3 + (k + i) % 4).toInt, (2 + (k + 2 * i) % 3).toInt)),
              (f"$i%06d.txt", "0", ("tok " * (2 + i) + "end").getBytes("US-ASCII")))
          })
        })
        val shards = Q.t(spark, dir, "nation")
          .select(col("n_nationkey").cast("long").as("media_id"))
          .withColumn("payload", mk(col("media_id")))
        val out = shards
          .as[(Long, Array[Byte])]
          .flatMap { case (id, p) =>
            TarShard.samples(TarShard.entries(p)).flatMap { s =>
              val img = s.parts.collectFirst { case ("bmp", d) => d }
              val cap = s.parts.collectFirst { case ("txt", d) => new String(d, "US-ASCII") }
              for {
                bytes <- img
                (w, h, _) <- Multimodal.decodeBmp(bytes)
                text <- cap
              } yield (id, s.key, w, h, text)
            }
          }
          .toDF("media_id", "sample_key", "width", "height", "caption")
          .select(col("media_id"), col("sample_key"), col("width"), col("height"),
            TextAnalysis.tokenCount(col("caption")).as("caption_tokens"))
        Q.requireNoShuffle(out)
        out
      },
      Some(
        """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
          |items AS (SELECT k, CAST(i AS INT) AS i FROM n,
          |          UNNEST(generate_series(0, 3)) u(i) WHERE i < 2 + k % 2)
          |SELECT k AS media_id, lpad(CAST(i AS VARCHAR), 6, '0') AS sample_key,
          |  CAST(3 + (k + i) % 4 AS INT) AS width,
          |  CAST(2 + (k + 2 * i) % 3 AS INT) AS height,
          |  CAST(3 + i AS INT) AS caption_tokens
          |FROM items""".stripMargin
      )
    )
  )
}
