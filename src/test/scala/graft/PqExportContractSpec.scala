package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Pq}

/** The persisted-PQ and clustered-IVF parquet artifacts are VERSIONED
  * EXPORT CONTRACTS (r15 verdict next #5 — the HnswExportContractSpec
  * convention extended to the compressed and clustered families): an
  * external serving engine (FAISS / Milvus — reference README:257
  * delegates online serving there) consumes them, so their layouts must
  * not drift silently. This spec pins the exact on-disk schemas, the
  * no-version-column-on-codes economics decision, and the refusal
  * paths. */
class PqExportContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val path: String = {
    val p = TmpDirs.wiped("pq_contract_spec")
    Pq.buildAndWriteIndex(Tables(spark, dir, "embeddings"), p,
      numSub = 8, subDim = 8, numCodes = 64)
    p
  }

  test("codebook on-disk schema is exactly the documented contract (version-gated)") {
    val schema = spark.read.parquet(s"$path/codebook").schema
    val expected = Map(
      "m" -> IntegerType,
      "code" -> LongType,
      "cw" -> ArrayType(DoubleType, containsNull = false),
      "schema_version" -> IntegerType)
    val actual = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(actual.keySet === expected.keySet,
      s"column drift: ${actual.keySet} vs contract ${expected.keySet}")
    expected.foreach { case (name, dt) =>
      def erase(t: DataType): DataType = t match {
        case ArrayType(e, _) => ArrayType(erase(e), containsNull = false)
        case o => o
      }
      assert(erase(actual(name)) === erase(dt), s"type drift on $name")
    }
    assert(Pq.SchemaVersion === 1, "SchemaVersion bumped: update this " +
      "spec's expected layout and the scaladoc contract together")
  }

  test("code table stays vec_id + M code columns — no version column by design") {
    // the 8 B/row economics: vintage rides on the codebook written under
    // the same path root, never on the corpus-sized table
    val codes = spark.read.parquet(s"$path/codes")
    assert(codes.columns.toSeq === ("vec_id" +: (0 until 8).map(m => s"code_$m")))
    assert(codes.count() === Tables(spark, dir, "embeddings").count())
  }

  test("a mismatched codebook schema_version is refused loudly") {
    val bad = TmpDirs.wiped("pq_contract_bad")
    spark.read.parquet(s"$path/codes").write.parquet(s"$bad/codes")
    spark.read.parquet(s"$path/codebook").withColumn("schema_version", lit(99))
      .write.parquet(s"$bad/codebook")
    val e = intercept[IllegalArgumentException] {
      Pq.searchPersisted(spark, bad, Tables(spark, dir, "embeddings"),
        qid = 9, k = 10, numSub = 8, subDim = 8, shortlist = 100).collect()
    }
    assert(e.getMessage.contains("schema_version"), e.getMessage)
  }

  test("a pre-versioning codebook (no version column) is refused loudly") {
    val bad = TmpDirs.wiped("pq_contract_nover")
    spark.read.parquet(s"$path/codes").write.parquet(s"$bad/codes")
    spark.read.parquet(s"$path/codebook").drop("schema_version")
      .write.parquet(s"$bad/codebook")
    val e = intercept[IllegalArgumentException] {
      Pq.searchPersisted(spark, bad, Tables(spark, dir, "embeddings"),
        qid = 9, k = 10, numSub = 8, subDim = 8, shortlist = 100).collect()
    }
    assert(e.getMessage.contains("schema_version"), e.getMessage)
  }

  test("a consumer reproduces a serve from the artifacts alone — no graft restore path, no re-encode") {
    // the A52 contract from the consumer side, in-process: plain
    // spark.read.parquet over the two artifacts (exactly what an external
    // engine sees), the documented consumer recipe — vintage-gate the
    // codebook, derive the query's ADC table from the STORED codewords,
    // rank the STORED codes, rerank the shortlist — must land on
    // searchPersisted's rows bit-for-bit
    val emb = Tables(spark, dir, "embeddings")
    val qid = 9L
    val expected = Pq.searchPersisted(spark, path, emb, qid = 9, k = 10,
        numSub = 8, subDim = 8, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cb = spark.read.parquet(s"$path/codebook")
    // consumer-side vintage gate: every row must carry the expected version
    assert(cb.filter(col("schema_version") =!= Pq.SchemaVersion).count() === 0L)
    val codes = spark.read.parquet(s"$path/codes")
    val qv = emb.filter(col("vec_id") === qid)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    // ADC table from the STORED codewords (m, code, cw) × the query
    val td = cb.crossJoin(qv).selectExpr("m", "code",
      """CAST(floor(aggregate(
        |  zip_with(slice(qv, m * 8 + 1, 8), cw, (a, b) -> (a - b) * (a - b)),
        |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) * 10000.0) AS BIGINT) AS td"""
        .stripMargin)
    // unpivot the stored code table and rank by summed ADC — never
    // touching raw vectors until the rerank page-in
    val stackCols = (0 until 8).map(m => s"$m, code_$m").mkString(", ")
    val short = codes.filter(col("vec_id") =!= qid)
      .selectExpr("vec_id", s"stack(8, $stackCols) AS (m, code)")
      .join(td, Seq("m", "code"))
      .groupBy("vec_id").agg(sum("td").as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc).limit(100)
      .select("vec_id")
    val consumer = emb.join(short, "vec_id").crossJoin(qv)
      .selectExpr("vec_id",
        """CAST(floor(sqrt(aggregate(
          |  zip_with(CAST(embedding AS ARRAY<DOUBLE>), qv, (a, b) -> (a - b) * (a - b)),
          |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)) * 10000 + 0.5) AS BIGINT) AS score"""
          .stripMargin)
      .orderBy(col("score").asc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(consumer === expected)
    // tampered vintage: the consumer's gate DETECTS it (the refusal path
    // an engine without graft code still has)
    val tampered = cb.withColumn("schema_version", lit(99))
    assert(tampered.filter(col("schema_version") =!= Pq.SchemaVersion).count() > 0L)
  }

  test("clustered layout writes the sidecar meta; readers validate version and column") {
    val emb = Tables(spark, dir, "embeddings")
    val p = TmpDirs.wiped("ivf_contract_spec")
    Ivf.writeClustered(emb, p)
    // the underscore-prefixed sidecar is invisible to corpus readers —
    // the row schema and count are exactly the written frame's
    val all = spark.read.parquet(p)
    assert(!all.columns.contains("schema_version"))
    assert(all.count() === emb.count())
    // probed read ≡ a filtered full read (pruning changes IO, not rows)
    val probed = Ivf.readProbed(spark, p, Seq(3, 7))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = emb.filter(col("label").isin(3, 7))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed === expect && probed.nonEmpty)
    // probing a column the layout was not partitioned by is refused
    val e1 = intercept[IllegalArgumentException] {
      Ivf.readProbed(spark, p, Seq(3), clusterCol = "part")
    }
    assert(e1.getMessage.contains("partitioned by"), e1.getMessage)
    // a foreign vintage is refused
    val s2 = spark
    import s2.implicits._
    Seq((99, "label")).toDF("schema_version", "cluster_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$p/_graft_meta")
    val e2 = intercept[IllegalArgumentException] {
      Ivf.readProbed(spark, p, Seq(3))
    }
    assert(e2.getMessage.contains("schema_version"), e2.getMessage)
    assert(Ivf.SchemaVersion === 1)
  }

  test("clustered sidecar refusals name the contract, not a raw IO error (ADVICE r16)") {
    val emb = Tables(spark, dir, "embeddings")
    val s2 = spark
    import s2.implicits._
    // (a) a pre-contract layout — clustered parquet, NO sidecar at all —
    // must refuse with the rebuild instruction, not surface the reader's
    // raw path-does-not-exist AnalysisException
    val p1 = TmpDirs.wiped("ivf_contract_nosidecar")
    emb.write.partitionBy("label").parquet(p1)
    val e1 = intercept[IllegalArgumentException] {
      Ivf.readProbed(spark, p1, Seq(3))
    }
    assert(e1.getMessage.contains("writeClustered"), e1.getMessage)
    // (b) a column-reordered / foreign sidecar must hit the by-name
    // column pin, never a positional ClassCastException or a silent
    // misread of (cluster_col, schema_version) as (version, column)
    val p2 = TmpDirs.wiped("ivf_contract_reordered")
    Ivf.writeClustered(emb, p2)
    Seq(("label", Ivf.SchemaVersion)).toDF("cluster_col", "schema_version")
      .coalesce(1).write.mode("overwrite").parquet(s"$p2/_graft_meta")
    val e2 = intercept[IllegalArgumentException] {
      Ivf.readProbed(spark, p2, Seq(3))
    }
    assert(e2.getMessage.contains("contract writes schema_version,cluster_col"),
      e2.getMessage)
    // (c) right names, foreign types (a string version from a hand-rolled
    // sidecar) — refused by the type pin
    val p3 = TmpDirs.wiped("ivf_contract_badtypes")
    Ivf.writeClustered(emb, p3)
    Seq(("1", "label")).toDF("schema_version", "cluster_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$p3/_graft_meta")
    val e3 = intercept[IllegalArgumentException] {
      Ivf.readProbed(spark, p3, Seq(3))
    }
    assert(e3.getMessage.contains("(int, string)"), e3.getMessage)
  }
}
