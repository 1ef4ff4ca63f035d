package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.DumpDecode

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
    )
  )
}
