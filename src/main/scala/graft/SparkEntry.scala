package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator ↔ query map. */
object SparkEntry {

  /** Deterministic total order for oracle compare: sort by every output
    * column (asc, nulls first — matches DuckDB `ORDER BY ALL NULLS FIRST`).
    * The testdata does not guarantee key uniqueness, so partial-key sorts
    * are not reproducible across engines.
    */
  private[graft] def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc_nulls_first): _*)

  /** Scratch dir for the index/layout queries (q130/q136/q178) that must
    * WRITE before they read. Deleted recursively on JVM exit — the read
    * is lazy (materialized by the caller after the query function
    * returns), so an eager post-read cleanup isn't possible; the exit
    * hook keeps repeated bench invocations from accreting parquet
    * versions in /tmp.
    */
  private def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try {
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Throwable => () } // best-effort: scratch only
    }))
    dir.toString
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_predicate_filter")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 row 8 — condicoes_pa-style predicate disjunction
    // (config_painel_sm.py:67): startswith / regex / isin / equality
    // disjuncts as one scan-level Catalyst predicate.
    "q08_predicate_filter" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      ordered(o.filter(Filters.anyOf(Seq(
        col("o_orderpriority").startsWith("1"),
        col("o_orderpriority").rlike("^3-ME"),
        col("o_orderstatus").isin("P"),
        col("o_orderpriority") === "5-LOW" && col("o_orderstatus") === "F",
      ))))
    },

    // §2 row 9 — two-column membership against one dim key set
    // (siasus_procedimentos_ambulatoriais.py:206-209), as OR'd broadcast
    // match flags instead of a driver-collected literal list.
    "q09_semijoin_filter" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val activeIds = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 0).select("s_suppkey")
      ordered(Filters.filterMemberOfAny(li, Seq("l_suppkey", "l_partkey"), activeIds))
    },

    // §2 row 7 — de-para column rename (DE_PARA_PA pattern, ×6 ETLs).
    "q07_depara_rename" -> { (s, dir) =>
      ordered(Renames.dePara(Tables.lineitem(s, dir), Map(
        "l_orderkey" -> "pedido_id", "l_partkey" -> "item_id",
        "l_suppkey" -> "fornecedor_id", "l_linenumber" -> "linha_numero",
        "l_quantity" -> "quantidade_apresentada",
        "l_extendedprice" -> "valor_apresentado", "l_discount" -> "desconto",
        "l_tax" -> "imposto", "l_returnflag" -> "devolucao_status",
        "l_linestatus" -> "linha_status", "l_shipdate" -> "envio_data",
      )))
    },

    // §2 row 10 — AAAAMM → timestamp with coerce (invalids → null).
    "q10_aaaamm_parse" -> { (s, dir) =>
      val k = col("o_orderkey")
      val raw = when(k % 11 === 0, lit("BAD999"))
        .when(k % 13 === 0, lit(""))
        .otherwise(date_format(col("o_orderdate"), "yyyyMM"))
      ordered(Tables.orders(s, dir).select(
        k,
        raw.as("competencia_aaaamm"),
        Dates.parseAaaamm(raw).as("competencia_data"),
      ))
    },

    // §2 row 11 — AAAAMMDD robust parse (blank-padded digits, junk → null).
    "q11_aaaammdd_parse" -> { (s, dir) =>
      val k = col("l_orderkey")
      val s8 = date_format(col("l_shipdate"), "yyyyMMdd")
      val blankPadded =
        when(substring(s8, 7, 1) === "0",
          concat(substring(s8, 1, 6), lit(" "), substring(s8, 8, 1))).otherwise(s8)
      val raw = when(k % 17 === 0, lit("ABCDEFGH"))
        .when(k % 3 === 0, blankPadded)
        .otherwise(s8)
      ordered(Tables.lineitem(s, dir).select(
        k, col("l_linenumber"),
        raw.as("data_aaaammdd"),
        Dates.parseAaaammdd(raw).as("data_parseada"),
      ))
    },

    // §2 row 12 — null-normalization pack ('' / all-zeros / all-9s / '999').
    "q12_null_rules" -> { (s, dir) =>
      val k = col("o_orderkey")
      val codigoA = when(k % 5 === 0, lit("")).otherwise(col("o_orderstatus"))
      val codigoB = when(k % 4 === 0, lit("0000")).when(k % 9 === 0, lit(""))
        .otherwise(col("o_custkey").cast("string"))
      val codigoC = when(k % 6 === 0, lit("999999"))
        .when(k % 7 === 0, lit(null).cast("string"))
        .otherwise(lpad((col("o_custkey") % 1000).cast("string"), 6, "0"))
      val idade = when(k % 8 === 0, lit("999")).otherwise((k % 120).cast("string"))
      ordered(Tables.orders(s, dir).select(
        k,
        NullRules.emptyToNull(codigoA).as("codigo_a"),
        NullRules.allZerosToNull(codigoB).as("codigo_b"),
        NullRules.allNinesToNull(codigoC).as("codigo_c"),
        NullRules.sentinelToNull(idade, "999").as("usuario_idade"),
      ))
    },

    // §2 row 13 — '0'/'1' → bool (else null), 'M' → mantido.
    "q13_bool_coercion" -> { (s, dir) =>
      val k = col("l_orderkey")
      val flag01 = when(k % 10 === 0, lit("2"))
        .when(k % 15 === 0, lit(null).cast("string"))
        .otherwise((col("l_linenumber") % 2).cast("string"))
      val mantidoRaw = when(col("l_returnflag") === "R", lit("M")).otherwise(col("l_returnflag"))
      ordered(Tables.lineitem(s, dir).select(
        k, col("l_linenumber"),
        flag01.as("flag_bruta"),
        Booleans.zeroOne(flag01).as("obito"),
        mantidoRaw.as("mantido_bruto"),
        Booleans.isM(mantidoRaw).as("estabelecimento_mantido"),
      ))
    },

    // §2 row 14 — null out dependent columns when desfecho is null.
    "q14_conditional_nullout" -> { (s, dir) =>
      val desfecho = when(col("l_returnflag") === "N", lit(null).cast("string"))
        .otherwise(col("l_returnflag"))
      val base = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        desfecho.as("desfecho_motivo"),
        (col("l_linenumber") % 2 === 0).as("obito"),
        (col("l_quantity") > 25).as("alta"),
      )
      ordered(NullRules.nullOutWhen(base, col("desfecho_motivo").isNull, Seq("obito", "alta")))
    },

    // §2 row 15 — positional code split cod[:3] / cod[3:].
    "q15_string_slice" -> { (s, dir) =>
      val code = concat(
        lpad((col("p_partkey") % 900).cast("string"), 3, "0"),
        lpad(col("p_size").cast("string"), 4, "0"))
      ordered(Tables.part(s, dir).select(
        col("p_partkey"),
        Strings.slicePrefix(code, 3).as("servico_id"),
        Strings.sliceFrom(code, 3).as("servico_classificacao_id"),
      ))
    },

    // §2 row 16 — Roman numeral → integer string, invalid passthrough.
    "q16_roman_numeral" -> { (s, dir) =>
      val romano = Strings.intToRoman(col("n_nationkey") + 1)
      ordered(Tables.nation(s, dir).select(
        col("n_nationkey"),
        romano.as("regiao_romana"),
        Strings.romanToInt(romano).as("regiao_numero"),
        Strings.romanToInt(col("n_name")).as("nome_passthrough"),
      ))
    },

    // §2 row 17 — deterministic sha2 surrogate id (vs reference uuid7).
    "q17_surrogate_id" -> { (s, dir) =>
      ordered(Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        Ids.surrogateId(Seq(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        )).as("id"),
      ))
    },

    // §2 row 20 — audit timestamps (frozen clock for determinism) + source
    // constant column.
    "q20_audit_constants" -> { (s, dir) =>
      val frozenNow = lit("2026-08-01 00:00:00").cast("timestamp_ntz")
      ordered(Tables.nation(s, dir).select(
        col("n_nationkey"), col("n_name"),
        frozenNow.as("criacao_data"),
        frozenNow.as("atualizacao_data"),
        lit("PASP2408").as("ftp_arquivo_nome"),
      ))
    },

    // §2 row 23 — schema-map casts with per-value try_cast semantics.
    "q23_schema_casts" -> { (s, dir) =>
      val cast0 = Casts.castWithSchema(Tables.events(s, dir), Map(
        "user_id" -> "string",
        "value" -> "decimal(18,3)",
        "props" -> "int",
        "ts" -> "date",
      ))
      ordered(cast0.select(
        col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("double").as("valor"),
        col("props").as("props_numerico"),
        col("ts").as("dia"),
      ))
    },

    // §2 row 24 — non-null validation gates as an aggregate (not applymap).
    "q24_validation_gates" -> { (s, dir) =>
      val base = Tables.lineitem(s, dir).withColumn(
        "flag_opcional",
        when(col("l_orderkey") % 50 === 0, lit(null).cast("string"))
          .otherwise(col("l_returnflag")))
      ordered(Casts.nullViolations(base, Seq("l_quantity", "l_shipdate", "flag_opcional")))
    },

    // §2 row 1 — batched record ingestion: source arrives as tagged record
    // batches; one distributed scan, lote derived, recombined downstream.
    "q01_batch_ingest" -> { (s, dir) =>
      val batches = (0 until 4).map { b =>
        Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 4 === b)
          .withColumn("lote", lit(b))
      }
      ordered(Rollup.unionBatches(batches)
        .groupBy("lote")
        .agg(
          count(lit(1L)).as("registros"),
          sum(col("l_quantity").cast("decimal(28,3)")).cast("double").as("quantidade_total"),
        ))
    },

    // §2 row 2 — listing-line regex parse + 8-char name slicing.
    "q02_listing_parse" -> { (s, dir) =>
      val ufs = array(lit("SP"), lit("BA"), lit("CE"), lit("MG"), lit("PR"))
      val nome = concat(
        lit("PA"), element_at(ufs, (col("o_custkey") % 5 + 1).cast("int")),
        date_format(col("o_orderdate"), "yyMM"),
        when(col("o_orderkey") % 4 === 0, lit("b")).otherwise(lit("")),
        lit(".dbc"))
      val linha = concat_ws(" ",
        date_format(col("o_orderdate"), "MM-dd-yy"), lit("09:15AM"),
        (col("o_totalprice").cast("long")).cast("string"), nome)
      val lines = Tables.orders(s, dir).select(col("o_orderkey"), linha.as("linha"))
      val parsed = Listing.splitName(Listing.parseLines(lines, "linha"), "nome_completo")
      ordered(parsed.select(
        col("o_orderkey"), col("tipo"), col("sigla_uf"), col("ano"), col("mes"),
        col("particao"), col("nome"), col("tamanho"),
        Listing.modificationTs(col("data_modificacao"), col("hora"))
          .as("timestamp_modificacao"),
        Dates.parseAaaamm(concat(lit("20"), col("ano"), col("mes")))
          .as("processamento_periodo_data_inicio"),
      ))
    },

    // §2 row 3 — report-body parse: header/footer trim, decimal-comma +
    // thousands-dot numerals, Unnamed spill column dropped.
    "q03_report_csv" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val cents = round(col("o_totalprice") * 100).cast("long")
      val digits9 = lpad((cents / lit(100L)).cast("long").cast("string"), 9, "0")
      val valorTxt = concat(
        substring(digits9, 1, 3), lit("."), substring(digits9, 4, 3), lit("."),
        substring(digits9, 7, 3), lit(","), lpad((cents % 100).cast("string"), 2, "0"))
      val report = o.select(
        col("o_orderkey").as("linha_numero"),
        lpad((col("o_custkey") % 999999).cast("string"), 6, "0").as("Ibge"),
        valorTxt.as("valor_txt"),
        lit("").as("Unnamed: 3"),
        (col("o_orderkey") % 100 === 99).as("marcador_fonte"),
      )
      val body = ReportCsv.dropUnnamed(ReportCsv.trimHeaderFooter(
        report, "linha_numero", 3, col("marcador_fonte")))
      ordered(body.select(
        col("linha_numero"), col("Ibge"),
        ReportCsv.parseDecimalComma(col("valor_txt")).as("quantidade_aprovada"),
      ))
    },

    // §2 row 4 — staged storage roundtrip (schema-preserving).
    "q04_stage_roundtrip" -> { (s, dir) =>
      val staged = Staging.stageRoundtrip(
        s, Tables.orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
        s"${GraftSession.scratchRoot}/graft-stage/orders")
      ordered(staged.groupBy("o_orderstatus").agg(
        count(lit(1L)).as("pedidos"),
        sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("valor_total"),
        max(col("o_orderdate")).as("ultima_data"),
      ))
    },

    // §2 row 5 — chunked COPY-style bulk load through the pluggable Sink
    // (chunk = write partition; swap ParquetSink for JdbcSink to hit a DB).
    "q05_bulk_load" -> { (s, dir) =>
      val sink = new ParquetSink(
        s"${GraftSession.scratchRoot}/graft-stage", Some("chunk"))
      val chunked = Tables.orders(s, dir)
        .withColumn("chunk", (col("o_orderkey") % 8).cast("int"))
      sink.overwrite(chunked, "orders_chunked")
      ordered(sink.read(s, "orders_chunked").groupBy("chunk").agg(
        count(lit(1L)).as("registros"),
        sum(col("o_totalprice").cast("decimal(28,2)")).cast("double").as("valor_total"),
      ))
    },

    // §2 row 6 — delete-conflicts upsert through the pluggable Sink:
    // incoming batch wins on key (JdbcSink runs the same call as batched
    // DELETEs + distributed append; exercised in SinkSpec against Derby).
    "q06_upsert" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val target = o.filter(col("o_orderkey") % 3 =!= 0)
      val incoming = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      val sink = new ParquetSink(s"${GraftSession.scratchRoot}/graft-sink")
      sink.overwrite(target, "orders_upsert")
      sink.upsert(s, incoming, "orders_upsert", Seq("o_orderkey"))
      ordered(sink.read(s, "orders_upsert"))
    },

    // §2 row 18 — period dimension lookup. The reference's period calendar
    // is exactly monthly competences, so the range predicate collapses to a
    // month equi-join (BroadcastHashJoin, O(n)) — the generic nested-loop
    // range join probed every period per row (~5× slower, and growing with
    // |periods|). Non-aligned ranges go through q44's bucketed range join.
    "q18_period_range_join" -> { (s, dir) =>
      val periods = Tables.orders(s, dir).select(
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("data_inicio"))
        .distinct()
        .select(
          col("data_inicio"),
          date_format(col("data_inicio"), "yyyyMM").as("periodo_codigo"))
      val joined = DimJoins.periodLookupMonthAligned(
        Tables.lineitem(s, dir), col("l_shipdate"), periods, "data_inicio")
      ordered(joined.select(
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("periodo_codigo")))
    },

    // §2 row 44 — NON-month-aligned period lookup (periods run 15th→14th):
    // bucketed range join — periods exploded into overlapped months,
    // BroadcastHashJoin on the month bucket, range kept as residual. The
    // per-row probe count stays constant instead of scaling with |periods|.
    "q44_bucketed_range_join" -> { (s, dir) =>
      val periods = Tables.orders(s, dir).select(
        to_date(date_trunc("MONTH", col("o_orderdate"))).as("m"))
        .distinct()
        .select(
          date_add(col("m"), 14).as("data_inicio"),
          date_add(add_months(col("m"), 1), 13).as("data_fim"),
          date_format(date_add(col("m"), 14), "yyyyMMdd").as("periodo_codigo"))
      val joined = DimJoins.periodLookupBucketed(
        Tables.lineitem(s, dir), to_date(col("l_shipdate")),
        periods, "data_inicio", "data_fim")
      ordered(joined.select(
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("periodo_codigo")))
    },

    // §2 row 19 — geography id equi-join (BroadcastHashJoin).
    "q19_geo_equi_join" -> { (s, dir) =>
      val dim = Tables.nation(s, dir).select(
        col("n_nationkey"),
        col("n_name").as("unidade_geografica_nome"),
        Ids.surrogateId(Seq(lit("geo"), col("n_nationkey"))).as("unidade_geografica_id"))
      val joined = DimJoins.dimLookup(Tables.customer(s, dir), "c_nationkey", dim, "n_nationkey")
      ordered(joined.select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("unidade_geografica_nome"), col("unidade_geografica_id")))
    },

    // §2 row 21 — the transform chain applied per batch, recombined with
    // unionByName (the reference's per-lote transformar_pa + concat).
    "q21_batch_union" -> { (s, dir) =>
      val activeIds = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 0).select("s_suppkey")
      def transformBatch(b: Int): DataFrame = {
        val lote = Tables.lineitem(s, dir).filter(col("l_orderkey") % 3 === b)
        val selecionado = Filters.filterMemberOfAny(lote, Seq("l_suppkey", "l_partkey"), activeIds)
          .filter(Filters.anyOf(Seq(
            col("l_returnflag") === "R",
            col("l_linestatus") === "O" && col("l_quantity") > 40,
          )))
        Renames.dePara(selecionado, Map(
          "l_quantity" -> "quantidade_apresentada",
          "l_extendedprice" -> "valor_apresentado",
          "l_shipdate" -> "realizacao_data"))
          .withColumn("id", Ids.surrogateId(Seq(
            col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
          .withColumn("criacao_data", lit("2026-08-01 00:00:00").cast("timestamp_ntz"))
          .withColumn("ftp_arquivo_nome", concat(lit("PASP24"), lpad(lit(b.toString), 2, "0")))
      }
      ordered(Rollup.unionBatches((0 until 3).map(transformBatch)))
    },

    // §2 row 22 — partitioned-metadata roll-up with trailing-months filter.
    "q22_metadata_rollup" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val trailing = Rollup.keepTrailingMonths(li, Seq("l_returnflag"), "l_shipdate", 13)
      ordered(Rollup.rollupPartitions(
        trailing.withColumn("grupo", (col("l_orderkey") % 10).cast("int"))
          .withColumn("particao", col("l_linenumber").cast("string")),
        Seq("l_returnflag", "l_linestatus", "grupo"),
        "particao", "l_quantity", "l_shipdate"))
    },
    // §2 row 25 — exact dedup: content-hash groupBy keep-min-id, one
    // shuffle with map-side combine (no window, no join-back).
    "q25_exact_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val dupes = docs.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
      ordered(llm.Dedup.exactDedup(docs.unionByName(dupes), "text", "doc_id"))
    },

    // §2 row 26 — MinHash-LSH near-dup: banded buckets, pairs only within
    // buckets, exact-Jaccard verify. The graded query uses the portable md5
    // hash family so the FULL pipeline is DuckDB-oracle-checked; the
    // xxhash64 production path stays covered by the scalatest recall +
    // equivalence specs.
    "q26_minhash_lsh" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      ordered(llm.Dedup.minhashNearDupsPortable(
        docs.unionByName(variants), "doc_id", "text", threshold = 0.5))
    },

    // §2 row 27 — SimHash near-dup: 16-bit chunk blocking + Hamming verify.
    // Portable md5 token hash → DuckDB-oracle-checked end-to-end; xxhash64
    // path covered by scalatest.
    "q27_simhash" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      ordered(llm.Dedup.simhashPairsPortable(
        docs.unionByName(variants), "doc_id", "text", maxHamming = 3))
    },

    // §2 row 28 — blocked exact n-gram Jaccard (deterministic blocks →
    // SQL-oracle-checkable candidate scoring).
    "q28_ngram_jaccard" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", concat(col("text"), lit(" zz9")))
      ordered(llm.Dedup.blockedJaccard(docs.unionByName(variants), "doc_id", "text"))
    },

    // §2 row 31 — language-ID: marker-vocabulary scores + argmax.
    "q31_lang_id" -> { (s, dir) =>
      val toks = llm.TextAnalysis.tokens(col("text"))
      val (scores, pred) = llm.TextAnalysis.langId(toks)
      // Spread: the marker-score lambdas are interpreted (higher-order) —
      // keep them parallel on narrow scans.
      ordered(llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id") +:
          scores.map { case (lang, sc) => sc.cast("long").as(s"score_$lang") } :+
          pred.as("lang_pred"): _*))
    },

    // §2 row 32 — quality scoring from length/punct/digit/stopword ratios.
    "q32_quality_score" -> { (s, dir) =>
      ordered(llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        llm.TextAnalysis.qualityScore(col("text")).as("qualidade")))
    },

    // §2 row 33 — token counting: whitespace, BPE-ish regex, chars/4.
    "q33_token_count" -> { (s, dir) =>
      ordered(llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        llm.TextAnalysis.wsTokenCount(col("text")).as("tokens_ws"),
        llm.TextAnalysis.bpeTokenCount(col("text")).as("tokens_bpe"),
        llm.TextAnalysis.estTokenCount(col("text")).as("tokens_est"),
      ))
    },

    // §2 row 34 — document fingerprint: min-md5 over word 3-shingles.
    // Explode form: md5 runs as a codegen'd projection over shingle rows
    // (inside a higher-order `transform` it would be interpreted —
    // CodegenFallback); the groupBy collapses map-side to one row per doc
    // since each doc's shingles never span partitions.
    "q34_fingerprint" -> { (s, dir) =>
      // Spread: parallelism floor for the CPU-bound shingle/md5 map side;
      // native word_shingles keeps the whole projection codegen'd.
      val exploded = llm.Spread(Tables.documents(s, dir).select("doc_id", "text"))
        .select(col("doc_id"),
          explode_outer(llm.TextAnalysis.shingleSetSorted(
            llm.TextAnalysis.tokens(col("text")), 3)).as("shingle"))
      ordered(exploded.groupBy("doc_id").agg(
        min(md5(col("shingle").cast("binary"))).as("impressao_digital"),
        count(col("shingle")).as("n_shingles"),
      ))
    },
    // §2 row 29 — brute-force cosine top-k: broadcast query set, decimal
    // -exact dot products, per-query window top-k.
    "q29_cosine_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // the fixed 32-row batch is a global sort-limit; persist it so the
      // probe/scoring joins downstream don't each recompute the sort
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10))
    },

    // §2 row 30 — LSH-bucketed ANN: hyperplane buckets, equi-join, exact
    // rerank (rows-only; recall spec in scalatest).
    "q30_ann_lsh" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Similarity.annTopK(emb, queries, "vec_id", "embedding", 10, planes = 4))
    },

    // §2 row 35 — multimodal binary column + typed metadata (decode kernel
    // stubbed; Spark-side plumbing in llm.Multimodal.decodeBatches).
    "q35_multimodal_meta" -> { (s, dir) =>
      val blobbed = llm.Multimodal.withBlob(
        Tables.documents(s, dir), "text", "payload")
      val meta = llm.Multimodal.blobMeta(col("payload"))
      ordered(blobbed.select(
        col("doc_id") +: col("lang") +: meta.map { case (n, c) => c.as(n) }: _*))
    },

    // §2 row 36 — tumbling-window aggregate over events (batch form of the
    // streaming windowed agg; streaming twin exercised in scalatest).
    "q36_windowed_agg" -> { (s, dir) =>
      ordered(streaming.Events.tumblingAgg(Tables.events(s, dir)))
    },

    // §2 row 37 — gap-based sessionization (batch window form; streaming
    // flatMapGroupsWithState twin exercised in scalatest).
    "q37_sessionize" -> { (s, dir) =>
      ordered(streaming.Events.sessionize(Tables.events(s, dir)))
    },

    // §2 row 38 — embedding-cosine near-dup dedup: planted co-directional
    // vectors (float doubling is exact), label-blocked pair generation,
    // decimal-exact cosine threshold.
    "q38_embedding_dedup" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val variants = emb.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000)
        .withColumn("embedding", transform(col("embedding"), x => x + x))
      ordered(llm.Dedup.embeddingNearDups(
        emb.unionByName(variants), "vec_id", "embedding", "label", threshold = 0.99))
    },

    // §2 row 39 — ingestion dedup: one event per (user, type), earliest
    // (ts, event_id) wins; single min_by groupBy (streaming twin:
    // dropDuplicatesWithinWatermark, exercised in scalatest).
    "q39_ingest_dedup" -> { (s, dir) =>
      ordered(streaming.Events.ingestDedup(
        Tables.events(s, dir), Seq("user_id", "event_type")))
    },

    // §2 row 40 — incremental staleness detection (verificar_e_executar):
    // consumed-ts null or older than produced-ts.
    "q40_stale_detect" -> { (s, dir) =>
      val k = col("o_orderkey")
      val meta = Tables.orders(s, dir).select(
        k.as("item_id"),
        col("o_orderdate").as("ts_producao"),
        when(k % 3 === 0, lit(null).cast("timestamp"))
          .when(k % 5 === 0, col("o_orderdate") - expr("INTERVAL 2 DAYS"))
          .otherwise(col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts_consumo"))
      ordered(Incremental.needsRefresh(meta, "ts_producao", "ts_consumo"))
    },

    // §2 row 41 — wide→long report verticalization (melt/unpivot) + PT
    // MES/AAAA competence parse, fillna(0) int cast.
    "q41_melt_report" -> { (s, dir) =>
      val k = col("o_orderkey")
      val wide = Tables.orders(s, dir).select(
        k.as("municipio_linha"),
        lpad((col("o_custkey") % 999999).cast("string"), 6, "0").as("Ibge"),
        when(k % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_totalprice").cast("long")).as("JAN/2026"),
        (col("o_custkey") % 100).as("FEV/2026"),
        when(k % 11 === 0, lit(null).cast("long"))
          .otherwise(k % 50).as("MAR/2026"))
      val long = ReportCsv.meltReport(
        wide, Seq("municipio_linha", "Ibge"),
        Seq("JAN/2026", "FEV/2026", "MAR/2026"),
        "competencia", "quantidade_aprovada")
      ordered(long.withColumn("periodo_data_inicio",
        ReportCsv.parsePtCompetencia(col("competencia"))))
    },

    // §2 row 43 — the full reference ETL chain composed end-to-end
    // (pipelines.Procedures): one declarative plan, broadcast dims, no
    // intermediate materialization.
    "q43_full_pipeline" -> { (s, dir) =>
      ordered(pipelines.Procedures.run(s, dir))
    },

    // §2 row 42 — IVF ANN: k-means cells, nProbe nearest cells per query,
    // exact-cosine rerank inside probed cells (rows-only; recall spec in
    // scalatest).
    "q42_ann_ivf" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = llm.CacheScope.persistTracked(emb.orderBy("vec_id").limit(32))
      ordered(llm.Ivf.ivfTopK(emb, queries, "vec_id", "embedding", 10))
    },

    // REAL image decode round-trip: solid-color PNGs are encoded from
    // documents columns (ImageIO.write), then decoded by the pure-JDK
    // ImageIO kernel through the batched harness. The oracle predicts the
    // decoded width/height/channels/means from the SAME source columns, so
    // a decode that lies about dimensions or pixel content hash-mismatches.
    "q45_image_decode" -> { (s, dir) =>
      // Spread: the encode/decode kernels are pure CPU per row — a single
      // byte-split input would serialize them.
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        (pmod(col("doc_id"), lit(16)) + 1).cast("int").as("larg"),
        (pmod(col("n_chars").cast("long"), lit(16)) + 1).cast("int").as("alt"),
        pmod(col("doc_id"), lit(256)).cast("int").as("r"),
        pmod(col("doc_id") * 7, lit(256)).cast("int").as("g"),
        pmod(col("n_chars").cast("long"), lit(256)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodePng(
        src, "larg", "alt", "r", "g", "b", "payload")
      val decoded = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.decodeImage)
      // Graded contract flattens the feature vector to scalar columns: the
      // driver's row-compare sorts via pandas, which cannot hash array cells
      // (the library API keeps the array form for real feature pipelines).
      ordered(decoded.select(
        col("doc_id"), col("alt_px"), col("larg_px"), col("canais"),
        element_at(col("recursos"), 1).as("media_r"),
        element_at(col("recursos"), 2).as("media_g"),
        element_at(col("recursos"), 3).as("media_b"),
        element_at(col("recursos"), 4).as("media_luma")))
    },

    // REAL binary .dbc round-trip (the full DATASUS container): genuine
    // dBase III bytes PKWare-imploded one file per partition, read back
    // through the binaryFile-source reader with per-file header parse +
    // implode decompression (sources/PkImplode). The oracle predicts every
    // decoded value from the source columns.
    "q46_dbf_roundtrip" -> { (s, dir) =>
      val src = Tables.documents(s, dir).select(
        col("doc_id").cast("string").as("DOC_ID"),
        col("lang").as("LANG"),
        col("source").as("SOURCE"),
        col("n_chars").cast("string").as("N_CHARS"))
      val out = s"${GraftSession.scratchRoot}/graft-dbf/documents"
      Dbf.writeDbc(src, out)
      // directory, not a glob: readDbc filters by extension itself, and a
      // glob path makes Spark's FileStreamSink metadata probe log a benign
      // but alarming FileNotFoundException trace on every run
      ordered(Dbf.readDbc(s, out))
    },

    // Native session_window sessionization (the Spark-idiomatic twin of
    // q37's window/cumsum form; streaming variant in streaming/Events).
    "q47_session_window" -> { (s, dir) =>
      ordered(streaming.Events.sessionWindowAgg(Tables.events(s, dir)))
    },

    // Sequence packing for pretraining batches: per-language running token
    // offsets → fixed-budget bin assignment (one window cumsum), plus the
    // per-bin fill summary.
    "q48_seq_packing" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        llm.TextAnalysis.estTokenCount(col("text")).as("tokens_est"))
      val packed = llm.Curation.packSequences(docs, "doc_id", "lang", "tokens_est", 2048L)
      ordered(llm.Curation.packingStats(packed, "lang", "tokens_est", 2048L))
    },

    // Deterministic stratified sampling: per-language keep rates via the
    // portable md5 percent-hash — same doc always in or out, any engine.
    "q49_stratified_sample" -> { (s, dir) =>
      ordered(llm.Curation.stratifiedSample(
        Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 37, "pt" -> 81), defaultRate = 55))
    },

    // REAL audio decode round-trip: square-wave PCM WAVs are encoded from
    // documents columns (genuine RIFF containers, real 16-bit samples),
    // then decoded by the zero-dependency RIFF/PCM parser through the
    // batched harness. Every |sample| equals the amplitude, so the oracle
    // predicts the full decode — rate/channels/frames/peak/mean — from the
    // SAME source columns; a parser that mis-reads the container or the
    // sample bytes hash-mismatches.
    "q50_audio_decode" -> { (s, dir) =>
      // Spread: encode/decode are pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        ((pmod(col("doc_id"), lit(3)) + 1) * 8000).cast("int").as("taxa"),
        (pmod(col("n_chars").cast("long"), lit(100)) + 50).cast("int").as("quadros"),
        (pmod(col("doc_id"), lit(2)) + 1).cast("int").as("can"),
        (pmod(col("doc_id") * 13, lit(30000)) + 100).cast("int").as("amp"),
        (pmod(col("n_chars").cast("long"), lit(7)) + 1).cast("int").as("meio_periodo"))
      val blobbed = llm.Multimodal.encodeWav(
        src, "taxa", "quadros", "can", "amp", "meio_periodo", "payload")
      val decoded = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.decodeWav,
        decodedSchema = llm.Multimodal.DecodedAudioSchema)
      ordered(decoded.select(
        col("doc_id"), col("taxa_hz"), col("canais"), col("bits"),
        col("n_amostras"), col("pico"), col("media_abs")))
    },

    // REAL video frame sampling round-trip: uncompressed RIFF-AVI
    // containers are encoded from documents columns (one solid-color DIB
    // frame per index, color shifted by frame number), then every 2nd
    // frame is extracted by the zero-dependency chunk-tree walker and its
    // pixel rows decoded to exact channel means. The frame-shifted colors
    // prove the right frame BYTES were extracted, not just counted; the
    // oracle reproduces the fan-out with a lateral generate_series.
    "q51_video_frames" -> { (s, dir) =>
      // Spread: encode/decode are pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)).select(
        col("doc_id"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("larg"),
        (pmod(col("n_chars").cast("long"), lit(8)) + 1).cast("int").as("alt"),
        (pmod(col("doc_id"), lit(10)) + 1).cast("int").as("quadros"),
        pmod(col("doc_id"), lit(256)).cast("int").as("r"),
        pmod(col("doc_id") * 7, lit(256)).cast("int").as("g"),
        pmod(col("n_chars").cast("long"), lit(256)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodeAvi(
        src, "larg", "alt", "quadros", "r", "g", "b", "payload")
      ordered(llm.Multimodal.sampleFramesAvi(blobbed, "payload", stride = 2)
        .select(col("doc_id"), col("frame_indice"), col("alt_px"), col("larg_px"),
          col("media_r"), col("media_g"), col("media_b")))
    },

    // Near-dup pairs → duplicate CLUSTERS: distributed connected
    // components (alternating large/small-star, aggregate-join form — see
    // llm/Components) over a deterministic edge graph with real transitive
    // structure (overlapping chains + in-run cycle bridges + cross-run
    // bridges), singletons unioned back in. The oracle recomputes the
    // same components by recursive-CTE transitive closure.
    "q52_dup_clusters" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      val edges = o.filter(col("k") % 25 < 10)
        .select(col("k").as("a"), (col("k") + 1).as("b"))
        .unionAll(o.filter(col("k") % 25 === 3)
          .select(col("k").as("a"), (col("k") + 7).as("b")))
        .unionAll(o.filter(col("k") % 100 === 50)
          .select(col("k").as("a"), (col("k") + 25).as("b")))
      val labels = llm.Components.connectedComponents(edges, "a", "b")
      val singles = o.join(labels, o("k") === labels("doc_id"), "left_anti")
        .select(col("k").as("doc_id"), col("k").as("cluster_id"))
      ordered(labels.unionByName(singles))
    },

    // Overlapping token-window chunking (context-length shaping for
    // retrieval corpora / fixed-context pretraining): 40-token windows
    // advancing by 30 — a scan-level explode of deterministic array
    // slices, no shuffle, short tail chunks kept.
    "q53_text_chunking" -> { (s, dir) =>
      ordered(llm.Curation.chunkTokens(
        Tables.documents(s, dir).select("doc_id", "text"), "text",
        window = 40, overlap = 10)
        .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens"))
    },

    // Symmetric int8 embedding quantization (4x storage compression for
    // embedding stores). Graded contract emits exact SCALAR witnesses of
    // the quantized array — the integer sum of squares pins every q_i
    // exactly, the max reconstruction error pins the dequantization —
    // because the driver's row-compare cannot hash array cells (q45
    // lesson). Rounding is floor(x/s + 0.5): IEEE-exact, so DuckDB
    // reproduces the ints bit-for-bit where round()'s half convention
    // would diverge.
    "q54_embedding_quantize" -> { (s, dir) =>
      val q = llm.Similarity.quantizeInt8(
        Tables.embeddings(s, dir).select("vec_id", "embedding"), "embedding")
      ordered(q.select(
        col("vec_id"), col("escala"),
        aggregate(col("q"), lit(0L),
          (a, x) => a + x.cast("long") * x.cast("long")).as("soma_q2"),
        array_max(zip_with(col("q"), col("embedding"),
          (qi, xi) => abs(qi.cast("double") * col("escala") - xi.cast("double"))))
          .as("erro_max")))
    },

    // Corpus-relative token frequency scoring: two passes (vocabulary
    // aggregation, then the instance join back through it) — the
    // rare-token quality signal. Exact end-to-end: counts are longs, the
    // mean is one IEEE division of two exact longs.
    "q55_token_frequency" -> { (s, dir) =>
      ordered(llm.TextAnalysis.tokenFrequencyScore(
        Tables.documents(s, dir), "doc_id", "text"))
    },

    // JSF form-state parse (the parse half of the reference's SISAB report
    // flow): synthetic pages are assembled from order columns — hidden
    // ViewState input + a select box with 3 options — then the scan-level
    // regex extraction recovers the state token and explodes the options.
    // The oracle predicts every extracted value from the same columns.
    "q56_form_parse" -> { (s, dir) =>
      val vs = concat(lit("vs-"), md5(col("o_orderkey").cast("string")))
      val options = concat_ws("", (1 to 3).map(i =>
        concat(lit(s"""<option value="co-"""),
          ((col("o_orderkey") + i) % 997).cast("string"),
          lit(s"""">Opcao $i </option>"""))): _*)
      val page = Tables.orders(s, dir).select(
        col("o_orderkey"),
        concat(
          lit("""<html><body><form id="f"><input type="hidden" """),
          lit("""id="javax.faces.ViewState" value=""""), vs,
          lit(""""/><select id="unidade">"""), options,
          lit("""</select></form></body></html>""")).as("html"))
      // view_state extracted BEFORE the option explode: below the Generate
      // it runs once per page; above it, once per option row (3x the regex
      // work — measured ~30% of the query at sf1)
      val withState = page.withColumn("view_state", HtmlForm.viewState(col("html")))
      val parsed = HtmlForm.selectOptions(withState, "html", "unidade")
      ordered(parsed.select(
        col("o_orderkey"), col("view_state"),
        col("opcao_codigo"), col("opcao_descricao")))
    },

    // REAL compressed-video (MJPEG) frame sampling: AVI containers whose
    // frames are genuine JPEG images (ImageIO.write) assembled from
    // documents columns, decoded back by the same chunk walker + ImageIO.
    // JPEG is lossy, so the graded contract checks the EXACT parts of the
    // decode — the frame fan-out and the per-frame dimensions, which
    // survive compression bit-for-bit; color accuracy is bounded in
    // scalatest (OperatorSpec) where tolerance assertions are possible.
    "q57_video_mjpeg" -> { (s, dir) =>
      // Spread: JPEG encode/decode is pure CPU per row (see q45)
      val src = llm.Spread(Tables.documents(s, dir)
          .filter(col("doc_id") % 5 === 0)) // CPU-heavy: sample the corpus
        .select(
          col("doc_id"),
          (pmod(col("doc_id"), lit(6)) + 1).cast("int").as("larg"),
          (pmod(col("n_chars").cast("long"), lit(6)) + 1).cast("int").as("alt"),
          (pmod(col("doc_id"), lit(6)) + 1).cast("int").as("quadros"),
          pmod(col("doc_id"), lit(200)).cast("int").as("r"),
          pmod(col("doc_id") * 7, lit(200)).cast("int").as("g"),
          pmod(col("n_chars").cast("long"), lit(200)).cast("int").as("b"))
      val blobbed = llm.Multimodal.encodeAviMjpeg(
        src, "larg", "alt", "quadros", "r", "g", "b", "payload")
      ordered(llm.Multimodal.sampleFramesAvi(blobbed, "payload", stride = 2)
        .select(col("doc_id"), col("frame_indice"), col("alt_px"), col("larg_px")))
    },

    // PII redaction: emails / BR phones / IPv4 masked with typed
    // placeholders, per-kind counts from the source text. The corpus has
    // no PII, so it is INJECTED deterministically from document columns —
    // the oracle rebuilds the same dirty text and replays the same
    // RE2/Java-compatible rewrites byte-for-byte.
    "q58_pii_redact" -> { (s, dir) =>
      val d4 = lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
      val dirty = concat(
        col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contato: user"), col("doc_id").cast("string"),
            lit("@ex"), pmod(col("doc_id"), lit(10)).cast("string"),
            lit(".com.br"))).otherwise(lit("")),
        when(col("doc_id") % 9 === 0, lit(" cc admin@site.org")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" tel ("),
            lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
            lit(") 9"), d4, lit("-"), d4)).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" ip "), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(100)).cast("string"),
            lit(".1"))).otherwise(lit("")))
      val base = Tables.documents(s, dir).select(col("doc_id"), dirty.as("texto"))
      ordered(llm.Privacy.redactPii(base, "texto")
        .select("doc_id", "texto_limpo", "n_emails", "n_telefones", "n_ips"))
    },

    // Gopher-style n-gram repetition quality signals: top token / top
    // bigram / duplicated-trigram coverage per document.
    "q59_repetition" -> { (s, dir) =>
      ordered(llm.TextAnalysis.ngramRepetition(
        Tables.documents(s, dir), "doc_id", "text"))
    },

    // Benchmark decontamination: corpus docs sharing any word trigram with
    // the benchmark set (docs with id % 97 == 0 stand in for an eval
    // suite) are flagged with their shared-shingle count.
    "q60_decontam" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      ordered(llm.Curation.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3))
    },

    // Event-time as-of join: every non-error event picks up the ts/value
    // of the SAME user's latest error at-or-before it (config-at-event
    // lookup). DuckDB's native ASOF LEFT JOIN is the oracle.
    "q61_asof_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val dim = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      val fact = ev.filter(col("event_type") =!= "error")
      ordered(AsOf.asOfJoin(fact, dim, "user_id", "ts", Seq("value"), "cfg_"))
    },

    // Canonical text normalization: NFC (native codegen'd kernel) +
    // control-char strip + whitespace collapse. Decomposed accents, tabs,
    // double spaces and a BEL are injected so the pass has real work;
    // DuckDB's nfc_normalize + the same rewrites predict the output.
    "q62_normalize" -> { (s, dir) =>
      val mess = concat(substring(col("text"), 1, 40),
        lit(" é  tab\there "), lit(""), lit(" fim"))
      val base = Tables.documents(s, dir).select(col("doc_id"), mess.as("texto"))
      ordered(base.select(
          col("doc_id"),
          length(col("texto")).cast("long").as("n_antes"),
          llm.Privacy.normalizeText(col("texto")).as("texto_norm"))
        .withColumn("n_depois", length(col("texto_norm")).cast("long")))
    },

    // Deterministic training-shard packing: md5-hash shard assignment
    // (stable under re-runs/partitioning) + the per-shard manifest.
    "q63_shard_pack" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(
        col("doc_id"),
        llm.TextAnalysis.estTokenCount(col("text")).as("tokens_est"))
      ordered(llm.Curation.shardStats(docs, "doc_id", "tokens_est", nShards = 32))
    },

    // Source-level domain blocklist: URLs synthesized from document
    // columns (two planted spam domains), domain extracted at scan level,
    // blocklist applied as a broadcast anti-join DATASET (web-scale
    // blocklists are tables, not literals).
    "q64_domain_filter" -> { (s, dir) =>
      val url = concat(lit("https://"),
        when(col("doc_id") % 13 === 0, lit("spam-mill.example"))
          .when(col("doc_id") % 13 === 1, lit("seo-farm.example"))
          .otherwise(concat(col("source"), lit("-site.example"))),
        lit("/art/"), col("doc_id").cast("string"))
      val docs = Tables.documents(s, dir).select(col("doc_id"), url.as("url"))
      val bl = {
        import s.implicits._
        Seq("spam-mill.example", "seo-farm.example", "unused.example").toDF("dominio")
      }
      ordered(llm.Curation.dropBlockedDomains(docs, "url", bl))
    },

    // Bigram language-model quality scoring (the CCNet-perplexity-class
    // filter in exact form): mean add-one-smoothed bigram probability per
    // document — corpus unigram/bigram counts, instance joins back through
    // them, decimal-exact per-doc sum. Arithmetic mean (not log/geometric)
    // keeps every step IEEE-reproducible in the oracle.
    "q65_bigram_lm" -> { (s, dir) =>
      ordered(llm.TextAnalysis.bigramLmScore(
        Tables.documents(s, dir), "doc_id", "text"))
    },

    // Mixture rebalancing: cap each language at ~80 docs in expectation
    // (en is 3x the others in the corpus — exactly the skew data mixing
    // exists to fix). Integer keep-rates from one tiny count aggregate,
    // membership by the deterministic md5 percent-hash.
    "q66_mixture_cap" -> { (s, dir) =>
      ordered(llm.Curation.rebalanceToCap(
        Tables.documents(s, dir).select("doc_id", "lang", "source"),
        "doc_id", "lang", cap = 80))
    },

    // Main-text extraction from raw HTML: pages synthesized from document
    // columns (head/style/nav/script/footer boilerplate + entities around
    // the real text), then the scan-level regex extractor recovers the
    // display text. The oracle replays the identical rewrite chain.
    "q67_html_extract" -> { (s, dir) =>
      val page = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{margin:0}</style></head><body>"),
        lit("""<nav><a href="/">home</a> | <a href="/d">docs</a></nav>"""),
        lit("<h1>artigo "), col("doc_id").cast("string"), lit("</h1><p>"),
        col("text"), lit(" a &amp; b &lt;ok&gt;</p>"),
        lit("<script>var x = 1 &amp;&amp; 2;</script>"),
        lit("<footer>&copy; 2026 rodape</footer></body></html>"))
      val pages = Tables.documents(s, dir)
        .select(col("doc_id"), page.as("html"))
      ordered(pages.select(
          col("doc_id"),
          length(col("html")).cast("long").as("n_chars_html"),
          col("html"),
          llm.WebText.extractText(col("html")).as("texto"))
        .withColumn("n_chars_texto", length(col("texto")).cast("long"))
        .withColumn("densidade",
          llm.WebText.textDensity(col("html"), col("texto")))
        .drop("html"))
    },

    // Per-language exact discrete-quantile length trimming: drop each
    // language's shortest/longest 5% of documents by token count, with
    // integer-rank cut points (no interpolated floats) so the filter is
    // engine-exact.
    "q68_quantile_filter" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        llm.TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
      ordered(llm.Curation.quantileFilter(d, "n_tokens", "lang", 0.05, 0.95))
    },

    // k-anonymity suppression: quasi-identifiers (lang, size decile) —
    // rows in equivalence classes smaller than k=12 are dropped, class
    // size appended.
    "q69_k_anonymity" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        floor(col("n_chars") / lit(100)).cast("long").as("faixa_tamanho"))
      ordered(llm.Privacy.kAnonymize(d, Seq("lang", "faixa_tamanho"), k = 12))
    },

    // Global n-gram heavy hitters: exact top-25 trigrams by occurrence
    // (ties broken lexicographically), with document frequencies —
    // per-partition top-k heaps, no global sort.
    "q70_heavy_hitters" -> { (s, dir) =>
      ordered(llm.TextAnalysis.topNgrams(
        Tables.documents(s, dir), "doc_id", "text", n = 3, k = 25))
    },

    // C4-style repeated-span removal: a 10-token licence boilerplate is
    // planted at the head of every 7th document; chunking + global
    // first-occurrence dedup strips it everywhere but its first sighting
    // and rebuilds the cleaned text.
    "q71_chunk_purge" -> { (s, dir) =>
      val boiler = "este conteudo esta licenciado sob os termos da licenca publica"
      val seeded = Tables.documents(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(lit(boiler + " "), col("text")))
          .otherwise(col("text")).as("texto"))
      ordered(llm.Curation.purgeRepeatedChunks(seeded, "doc_id", "texto",
        window = 10))
    },

    // JSONL staging roundtrip: the corpus written as distributed JSONL
    // shards (the LLM interchange format) and read back under the
    // explicit schema — values and types must survive exactly.
    "q72_jsonl_roundtrip" -> { (s, dir) =>
      ordered(Staging.jsonlRoundtrip(
        s, Tables.documents(s, dir),
        s"${GraftSession.scratchRoot}/graft-jsonl/documents"))
    },

    // SemDeDup semantic deduplication: scaled-copy duplicates are planted
    // (the q38 seeding — same direction, doubled magnitude, +1M ids);
    // unit-direction k-means cells bound the candidate space, within-cell
    // exact cosine >= 0.99 marks duplicates, lowest id survives per
    // neighbourhood — every planted variant must vanish. k-means is not
    // SQL-reproducible -> rows-only; DedupSpec carries the planted-
    // duplicate correctness (like the q30/q42 ANN paths).
    "q73_semantic_dedup" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val variants = emb.filter(col("vec_id") % 5 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000)
        .withColumn("embedding", transform(col("embedding"), x => x + x))
      ordered(llm.Dedup.semanticDedup(
        emb.unionByName(variants), "vec_id", "embedding",
        nCells = 0, threshold = 0.99) // corpus-sized cells (floor 8)
        .select("vec_id", "label"))
    },

    // Per-group top-k via the bounded-heap graft_top_k_by aggregate
    // (ObjectHashAggregate with partial merge: the shuffle carries <= k
    // pairs per group per map partition, never the whole table like the
    // window row_number form): top-3 customers per nation by balance,
    // ties broken on the smaller custkey.
    "q74_group_topk" -> { (s, dir) =>
      ordered(TopK.groupTopK(
        Tables.customer(s, dir), "c_nationkey", "c_acctbal", "c_custkey",
        k = 3))
    },

    // ORC staging roundtrip (the Hive-lake columnar format): distributed
    // write + explicit-schema re-read, then a filtered pruned read whose
    // predicate reaches the ORC scan (plan-asserted in PlanShapeSpec) —
    // values must survive the format change exactly.
    "q75_orc_roundtrip" -> { (s, dir) =>
      val rt = Staging.orcRoundtrip(s, Tables.documents(s, dir),
        s"${GraftSession.scratchRoot}/graft-orc/documents")
      ordered(rt.filter(col("lang") === "en")
        .select("doc_id", "lang", "source", "n_chars"))
    },

    // SCD type-2 history maintenance: an incoming supplier batch (some
    // changed balances, some no-ops, some brand-new keys) closes the
    // superseded open versions at the effective date and appends new open
    // ones — history never shuffles, both probes broadcast the batch.
    "q76_scd2_history" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_acctbal"), col("s_nationkey"))
      val open = sup.select(
        col("s_suppkey"), col("s_acctbal"), col("s_nationkey"),
        lit("2026-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
      val closedHist = sup.filter(col("s_suppkey") % 4 === 0).select(
        col("s_suppkey"), (col("s_acctbal") - 50).as("s_acctbal"),
        col("s_nationkey"),
        lit("2025-01-01").cast("date").as("valid_from"),
        lit("2026-01-01").cast("date").as("valid_to"),
        lit(false).as("is_current"))
      val history = open.unionByName(closedHist)
      val incoming = sup.filter(col("s_suppkey") % 3 === 0)
        .select(col("s_suppkey"), (col("s_acctbal") + 100).as("s_acctbal"),
          col("s_nationkey"))
        .unionByName(sup.filter(col("s_suppkey") % 3 === 1))
        .unionByName(sup.filter(col("s_suppkey") % 5 === 0)
          .select((col("s_suppkey") + 10000).as("s_suppkey"),
            (col("s_acctbal") * 2).as("s_acctbal"), col("s_nationkey")))
        .withColumn("effective", lit("2026-08-01").cast("date"))
      ordered(Scd.scd2Apply(history, incoming,
        Seq("s_suppkey"), Seq("s_acctbal", "s_nationkey"), "effective"))
    },

    // Per-label embedding centroid: posexplode fan-out + one map-side-
    // combinable (label, position) aggregation, DECIMAL(38,18)-exact sums
    // with a single IEEE division — the mean-pooling / class-prototype
    // step of an embedding pipeline.
    "q77_embedding_pool" -> { (s, dir) =>
      ordered(llm.Similarity.groupCentroid(
        Tables.embeddings(s, dir), "label", "embedding"))
    },

    // Attribution interval join: each click pairs with the same user's
    // purchases within 30 minutes after it — an equi-join on the user key
    // with the time bound as residual predicate (one shuffle per side,
    // pair space bounded per user; never a time-bucket cross product).
    // StreamingSpec runs the watermark-bounded stream-stream twin.
    "q78_interval_join" -> { (s, dir) =>
      ordered(streaming.Events.intervalJoin(
        Tables.events(s, dir), "click", "purchase", boundMinutes = 30))
    },

    // Hive-layout partition pruning: the corpus written partitioned by
    // lang, re-read with a lang filter — the filter must become a
    // PartitionFilter (directory pruning, plan-asserted in
    // PlanShapeSpec), not a row filter over every file.
    "q79_partition_prune" -> { (s, dir) =>
      val rt = Staging.bulkLoadRoundtrip(s, Tables.documents(s, dir), "lang",
        s"${GraftSession.scratchRoot}/graft-part/documents")
      ordered(rt.filter(col("lang") === "en")
        .select("doc_id", "lang", "n_chars"))
    },

    // Trailing-5-events rolling mean per user: one window shuffle+sort,
    // row-bounded frame, DECIMAL(28,6)-exact sums with one IEEE division.
    "q80_rolling_agg" -> { (s, dir) =>
      ordered(streaming.Events.rollingAgg(Tables.events(s, dir), n = 5))
    },

    // Wide pivot with EXPLICIT values (no extra distinct pass over the
    // corpus): per-user event counts, one column per event type.
    "q81_pivot" -> { (s, dir) =>
      ordered(Rollup.pivotCounts(Tables.events(s, dir), "user_id",
        "event_type", Seq("click", "error", "purchase", "signup", "view")))
    },

    // Explicit skew salting: the fact side scatters each supplier key over
    // 8 deterministic salt groups, the dimension replicates 8×, and the
    // result must equal the plain join exactly (the salt is
    // expression-derived, never rand() — task retries stay idempotent).
    "q82_skew_join" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
      val dim = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"), col("s_acctbal"))
      ordered(Skew.saltedJoin(li, dim, "l_suppkey",
        Seq("l_orderkey", "l_linenumber"), salt = 8))
    },

    // OLAP rollup (GROUPING SETS): per-(lang, source) doc counts and char
    // sums with lang-level and grand totals in ONE map-side-combinable
    // pass — the panel's summary views without one job per level.
    "q83_rollup_agg" -> { (s, dir) =>
      ordered(Tables.documents(s, dir)
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1L)).as("docs"), sum(col("n_chars")).as("chars"),
          grouping_id().cast("int").as("nivel")))
    },

    // Small-file compaction: the corpus fragmented into 64 tiny files,
    // rewritten as 4 range-clustered files sorted on doc_id (disjoint
    // min/max ranges -> file skipping; spec asserts the layout). Content
    // must survive identically.
    "q84_compaction" -> { (s, dir) =>
      val root = s"${GraftSession.scratchRoot}/graft-compact"
      val frag = Staging.stageRoundtrip(
        s, Tables.documents(s, dir).repartition(64), s"$root/frag")
      ordered(Staging.compact(s, frag, "doc_id", 4, s"$root/compacted"))
    },

    // Snapshot reconciliation: a rebuilt orders table (every 11th row
    // dropped, every 7th repriced) diffed against the previous snapshot —
    // multiset exceptAll both ways, modified rows surface as one
    // removida + one adicionada.
    "q85_table_diff" -> { (s, dir) =>
      val old = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val neu = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      ordered(Diff.diffSnapshots(old, neu))
    },

    // Ordered funnel view→click→purchase: per-user first-timestamps per
    // stage via conditional min, depth folded from the ordering chain —
    // one map-side-combinable aggregation, no window, no self-join.
    "q86_funnel" -> { (s, dir) =>
      ordered(streaming.Events.funnelDepth(
        Tables.events(s, dir), Seq("view", "click", "purchase")))
    },

    // One-pass long-format profile (nulls planted in lang): counts, exact
    // distincts, min/max per column — one Expand aggregation, one scan.
    "q87_profile" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        col("doc_id"),
        when(col("doc_id") % 9 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        col("source"), col("n_chars"))
      ordered(Profile.profile(d, Seq("doc_id", "lang", "source", "n_chars")))
    },

    // Incremental view maintenance: a per-customer count/sum rollup built
    // from 2/3 of orders, then the remaining third folded in as a delta
    // batch — the materialized side never shuffles (broadcast delta
    // aggregate + semi-pruned key slice), and DECIMAL sums make the fold
    // bit-identical to the full recompute the oracle runs.
    "q88_incr_aggregate" -> { (s, dir) =>
      val base = Tables.orders(s, dir).filter(col("o_orderkey") % 3 =!= 0)
      val delta = Tables.orders(s, dir).filter(col("o_orderkey") % 3 === 0)
      val matAgg = base.groupBy(col("o_custkey")).agg(
        count(lit(1L)).as("pedidos"),
        sum(col("o_totalprice").cast("decimal(28,6)"))
          .cast("decimal(28,6)").as("total"))
      val merged = Incremental.mergeAggregate(
        matAgg, delta.withColumnRenamed("o_totalprice", "total"),
        Seq("o_custkey"), "pedidos", Map("total" -> "decimal(28,6)"))
      ordered(merged.select(col("o_custkey"), col("pedidos"),
        col("total").cast("double").as("total")))
    },

    // The composed RAG ingestion pipeline, end-to-end and ORACLE-EXACT:
    // chunk the corpus (q53's operator) → embed each chunk with a
    // deterministic md5 feature hash (portable, so DuckDB replays the
    // "model" bit-for-bit — a real encoder slots into the same column) →
    // exact cosine top-3 retrieval (q29's operator) for a query subset.
    // The embedded corpus is a persisted branch point: both the corpus
    // and query sides of the pair join consume it, and CollapseProject
    // would otherwise re-chunk + re-hash per consumer (SURVEY §4).
    "q89_rag_retrieval" -> { (s, dir) =>
      val dims = 4
      val chunks = llm.Curation.chunkTokens(
        Tables.documents(s, dir).select("doc_id", "text"), "text",
        window = 30, overlap = 0)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      val emb = transform(sequence(lit(0), lit(dims - 1)),
        i => conv(substring(md5(concat(i.cast("string"), lit(":"),
          col("chunk_text")).cast("binary")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0d)
      val corpus = llm.CacheScope.persistTracked(
        chunks.select(col("chunk_id"), emb.as("embedding")))
      // a FIXED query batch (deterministic first-32 by id): real retrieval
      // serves a constant query load against a growing corpus — a
      // corpus-proportional query set (the old % filter) made this bench
      // O(corpus²) and it blew up 60x at sf1
      val queries = llm.CacheScope.persistTracked(
        corpus.orderBy("chunk_id").limit(32))
      ordered(llm.Similarity.bruteForceTopK(
        corpus, queries, "chunk_id", "embedding", k = 3))
    },

    // Anti-entropy checksum: one (rows, order-independent md5-sum) row
    // replaces shipping the table to compare replicas/rebuilds — exact
    // DECIMAL sum of portable per-row hashes, null-sentinel'd columns.
    "q90_table_checksum" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_orderkey") % 19 === 0, lit(null).cast("string"))
          .otherwise(col("l_returnflag")).as("l_returnflag"),
        col("l_shipdate"))
      ordered(Diff.tableChecksum(li,
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")))
    },

    // q61's as-of join through the custom Catalyst operator
    // (AsOfJoinNode -> AsOfJoinStrategy -> sort-merge AsOfJoinExec): same
    // semantics and oracle, but one forward merge pass with a single held
    // dim row instead of the union + running-window plan.
    "q91_asof_native" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val dim = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value")
      val fact = ev.filter(col("event_type") =!= "error")
      ordered(AsOf.asOfJoinNative(fact, dim, "user_id", "ts", Seq("value"), "cfg_"))
    },

    // Generalized bounded-heap per-group top-k (arbitrary payload types —
    // strings, dates — not just q74's primitive score/id pairs): top-5
    // lineitem rows per return flag. The sort key spans every payload
    // column so exact-duplicate rows are interchangeable and the result
    // is deterministic under any partitioning.
    "q92_group_topk_rows" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      ordered(TopK.groupTopKRows(li, Seq("l_returnflag"),
        Seq(("l_quantity", false), ("l_orderkey", true),
          ("l_linenumber", true), ("l_shipdate", true)), 5))
    },

    // Incremental SCD2 (q76's batch against the same synthetic history)
    // as a DELTA: only the closed and newly-opened versions, never a
    // rewrite of the full history — the only history pass is a
    // bloom+is_current-pruned scan, then broadcast joins.
    "q93_scd2_delta" -> { (s, dir) =>
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_acctbal"), col("s_nationkey"))
      val open = sup.select(
        col("s_suppkey"), col("s_acctbal"), col("s_nationkey"),
        lit("2026-01-01").cast("date").as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
      val closedHist = sup.filter(col("s_suppkey") % 4 === 0).select(
        col("s_suppkey"), (col("s_acctbal") - 50).as("s_acctbal"),
        col("s_nationkey"),
        lit("2025-01-01").cast("date").as("valid_from"),
        lit("2026-01-01").cast("date").as("valid_to"),
        lit(false).as("is_current"))
      val history = open.unionByName(closedHist)
      val incoming = sup.filter(col("s_suppkey") % 3 === 0)
        .select(col("s_suppkey"), (col("s_acctbal") + 100).as("s_acctbal"),
          col("s_nationkey"))
        .unionByName(sup.filter(col("s_suppkey") % 3 === 1))
        .unionByName(sup.filter(col("s_suppkey") % 5 === 0)
          .select((col("s_suppkey") + 10000).as("s_suppkey"),
            (col("s_acctbal") * 2).as("s_acctbal"), col("s_nationkey")))
        .withColumn("effective", lit("2026-08-01").cast("date"))
      ordered(Scd.scd2Delta(history, incoming,
        Seq("s_suppkey"), Seq("s_acctbal", "s_nationkey"), "effective"))
    },

    // Deterministic per-group sampling (k docs per language) through the
    // same bounded heap: "first k by md5(id)" is a uniform-ish,
    // partition-independent, oracle-replayable sample — no full sort, no
    // rand() seed state, map-side capped like every TopKRows use.
    "q94_group_sample" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h", md5(col("doc_id").cast("string")))
      ordered(TopK.groupTopKRows(docs, Seq("lang"),
        Seq(("h", true), ("doc_id", true)), 3))
    },

    // q68's trim through the percentile_approx sketch — the 100 TB path
    // when exact cut points are not worth sorting every group (one
    // map-side-combinable aggregation, no window sort). Sketch internals
    // are engine-specific, so rows-only; CurationSpec pins its bounds
    // within one rank of the exact integer-rank form.
    "q96_quantile_approx" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        llm.TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
      ordered(llm.Curation.quantileFilterApprox(d, "n_tokens", "lang", 0.05, 0.95))
    },

    // Full-frame window aggregates (the share-of-group annotation idiom).
    // GraftSession's WindowAggRewrite replans these as a per-group
    // aggregation broadcast-joined back (no full-table sort); the DuckDB
    // oracle computes the WINDOW natively, so the hash check proves the
    // rewrite is value-exact, not merely plausible.
    "q97_window_agg" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_suppkey")
      ordered(Tables.lineitem(s, dir)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("grp_qty",
          sum(col("l_quantity").cast("decimal(28,3)")).over(w).cast("double"))
        .withColumn("grp_n", count(lit(1L)).over(w)))
    },

    // Z-order (Morton) clustering value over (o_custkey, o_orderkey):
    // exact BIGINT min-max scaling + bit interleave, the multi-column
    // file-pruning layout key. Layout.zorderLayout writes the clustered
    // files; the oracle replays the arithmetic bit-for-bit.
    "q95_zorder" -> { (s, dir) =>
      val ords = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      ordered(Layout.zorderValue(ords, Seq("o_custkey", "o_orderkey")))
    },

    // Keyword/BM25 retrieval — the lexical twin of q89's embedding RAG:
    // inverted postings (one scan-level tokenize→explode→combine), the
    // fixed 8-query batch BROADCAST onto the postings (the corpus never
    // shuffles for candidate generation), log-free idf so every score op
    // is correctly-rounded IEEE arithmetic DuckDB replays bit-for-bit,
    // bounded-heap top-5 per query.
    // maxDfFraction is lifted to 1.0 here: the synthetic corpus draws from
    // a ~31-word vocabulary, so every term exceeds the 0.5 near-stopword
    // default (which is the right default against a real Zipf vocabulary).
    "q99_bm25_retrieval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text", k = 5,
        maxDfFraction = 1.0))
    },

    // Pseudo-relevance-feedback expansion: BM25 -> mine top-3 terms from
    // each query's top-5 docs (bounded heap, deterministic ties) ->
    // append -> BM25 again. The whole two-pass chain replays in the
    // oracle; the corpus never shuffles in either pass.
    "q169_prf_expansion" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.prfExpand(docs, queries, "doc_id", "text",
        k = 5, kDocs = 5, mTerms = 3, maxDfFraction = 1.0))
    },

    // CDC changelog apply: orders replayed as a change log onto the
    // customer snapshot — the LATEST change per customer wins (o_orderkey
    // is the unique sequence), final status F deletes the row, anything
    // else replaces it with the change's row image. Winner via the
    // bounded-heap TopKRows aggregate; snapshot probed with a broadcast
    // anti join (never shuffled).
    "q98_cdc_apply" -> { (s, dir) =>
      val target = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
      val changes = Tables.orders(s, dir).select(
        col("o_custkey").as("c_custkey"),
        concat(lit("upd_"), col("o_orderkey")).as("c_name"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))
      ordered(Cdc.applyChangelog(target, changes, Seq("c_custkey"), "seq", "op"))
    },

    // Hybrid retrieval: BM25 (q99's lexical path, k=20) and embedding
    // cosine top-k (q89's dense path over whole docs, k=20) fused with
    // reciprocal-rank fusion — rank-based, so the two retrievers' score
    // scales never need calibrating. Both rank lists are tiny (8 queries
    // × ≤20 rows); the fuse is one map-side-combinable agg + bounded-heap
    // top-5, exact through DECIMAL per-retriever contributions.
    "q100_hybrid_rrf" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val bm25 = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 20, maxDfFraction = 1.0)
        .select("query_id", "doc_id", "posicao")
      val emb = transform(sequence(lit(0), lit(3)),
        i => conv(substring(md5(concat(i.cast("string"), lit(":"),
          col("text")).cast("binary")), 1, 8), 16, 10)
          .cast("double") / 4294967296.0d)
      val corpus = llm.CacheScope.persistTracked(
        docs.select(col("doc_id"), emb.as("embedding")))
      val qemb = llm.CacheScope.persistTracked(
        corpus.orderBy("doc_id").limit(8))
      val knn = llm.Similarity.bruteForceTopK(
        corpus, qemb, "doc_id", "embedding", k = 20)
        .select(col("query_id"), col("corpus_id").as("doc_id"),
          col("rank").as("posicao"))
      ordered(llm.Retrieval.rrfFuse(Seq(bm25, knn), k = 5))
    },

    // Boilerplate-span purge (C4/RefinedWeb document-frequency rule):
    // 5-token spans occurring in MORE than 2 documents are dropped from
    // every document that carries them (vs q71's keep-first dedup); docs
    // rebuilt from the surviving spans in order.
    "q101_span_purge" -> { (s, dir) =>
      ordered(llm.Curation.purgeFrequentSpans(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", window = 5, maxDocs = 2))
    },

    // Temperature-flattened language rebalancing (subsample-only α=0.5
    // mixture): head languages downsampled toward the sqrt-flattened
    // share, keep decision per doc via the deterministic md5 uniform.
    "q102_temperature_sample" -> { (s, dir) =>
      ordered(llm.Curation.temperatureResample(
        Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
        "doc_id", "lang", targetFraction = 0.5))
    },

    // The full LLM curation chain in ONE plan (the text twin of q43):
    // exact dedup -> quality floor (0.19 ~ corpus median) -> frequent-
    // span purge -> temperature resample. Every stage is the validated
    // operator behind q25/q32/q101/q102; the oracle replays the whole
    // five-operator chain bit-for-bit.
    "q103_curation_pipeline" -> { (s, dir) =>
      ordered(pipelines.TextCuration.run(
        Tables.documents(s, dir), "doc_id", "text", "lang",
        minQuality = 0.19, spanWindow = 5, spanMaxDocs = 2,
        targetFraction = 0.5))
    },

    // BPE vocabulary induction (Sennrich 2016): ONE corpus pass builds
    // the weighted word vocabulary, then every merge iteration is
    // vocab-linear with a single-row argmax (k-means collect
    // discipline). Iterative driver loop over aggregations -> not
    // SQL-reproducible in one query: rows-only here; BpeSpec proves the
    // merge table equals an independent single-node replay and the
    // textbook sequence on the canonical corpus.
    "q104_bpe_train" -> { (s, dir) =>
      ordered(llm.Bpe.train(
        Tables.documents(s, dir).select("text"), "text", numMerges = 12))
    },

    // q103's curation chain with the fuzzy-dedup stage switched on:
    // exact dedup -> MinHash-LSH near-dup removal (q26's portable
    // operator, greedy keep-lowest-id over verified pairs) -> quality
    // floor -> span purge -> temperature resample, still ONE plan.
    // Near-dups are planted the q26 way (drop-first-token variants at
    // id+1000000) so the fuzzy stage demonstrably removes them; the
    // oracle replays the entire six-operator chain bit-for-bit.
    "q105_curation_fuzzy" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      ordered(pipelines.TextCuration.run(
        docs.unionByName(variants), "doc_id", "text", "lang",
        minQuality = 0.19, spanWindow = 5, spanMaxDocs = 2,
        targetFraction = 0.5, fuzzyThreshold = Some(0.5)))
    },

    // Landing-zone fetch worklist (the engine side of the reference's
    // FTP retrieval loop): remote catalog LEFT-JOINed against the
    // landing state; absent files and size mismatches come back as
    // (file, reason) fetch work. The graded query derives both sides
    // deterministically from orders (every third file landed, every
    // ninth landed at the wrong size); LandingSpec runs the REAL
    // binaryFile landing scan + out-of-band copy + dbc decode offline.
    "q106_landing_worklist" -> { (s, dir) =>
      val cat = Tables.orders(s, dir).select(
        concat(lit("PA"), col("o_orderkey"), lit(".dbc")).as("nome_completo"),
        col("o_totalprice").cast("long").as("tamanho"),
        col("o_orderkey"))
      val landed = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 3 === 0)
        .select(
          concat(lit("PA"), col("o_orderkey"), lit(".dbc")).as("nome_completo"),
          (col("o_totalprice").cast("long") +
            when(col("o_orderkey") % 9 === 0, 1L).otherwise(0L)).as("tamanho"))
      ordered(sources.Landing.fetchWorklist(cat, landed))
    },

    // Sliding-window boilerplate purge: q101's document-frequency rule
    // with stride 2 < window 5, so boilerplate at DIFFERENT offsets in
    // different documents still meets the threshold (fixed chunking only
    // counts alignment-sharing spans); every token covered by a frequent
    // span occurrence is dropped and the doc rebuilt in order.
    "q107_span_purge_sliding" -> { (s, dir) =>
      ordered(llm.Curation.purgeFrequentSpansSliding(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", window = 5, stride = 2, maxDocs = 2))
    },

    // Run-ledger dispatch worklist (the reference's orchestration loop
    // re-expressed engine-side): jobs = (priority, status) source
    // partitions with produced = max order date; the append-only ledger
    // samples every 50th order as a run (every 7th of those failed). The
    // latest run folds through the bounded-heap k=1 aggregate and
    // broadcasts onto the catalog; jobs that never ran, failed last, or
    // are stale come back as (job, motivo) dispatch work.
    "q108_dispatch_worklist" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val catalog = o.groupBy(
          col("o_orderpriority").as("tipo"), col("o_orderstatus").as("situacao"))
        .agg(max(col("o_orderdate")).as("produzido_em"),
          count(lit(1)).as("tamanho"))
      val ledger = o.filter(col("o_orderkey") % 50 === 0).select(
        col("o_orderpriority").as("tipo"), col("o_orderstatus").as("situacao"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 7 === 0, "erro").otherwise("ok").as("status"),
        col("o_orderdate").as("fim"),
        col("o_totalprice").cast("long").as("linhas"))
      ordered(RunLog.dispatchWorklist(catalog, ledger,
        Seq("tipo", "situacao"), "produzido_em", "seq", "status", "fim"))
    },

    // Hashed linear classifier inference (fastText-style quality filter):
    // unigram+bigram features md5-hashed into 1024 buckets, weights a
    // broadcast (bucket -> fixed-point milli-weight) table derived
    // deterministically from md5 so the oracle rebuilds the same model;
    // per-doc margin is an exact BIGINT sum, label its sign.
    "q109_quality_classifier" -> { (s, dir) =>
      val buckets = 1024
      val weights = s.range(buckets).select(
        col("id").as("bucket"),
        (conv(substring(md5(concat(lit("w:"), col("id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("long") % 2001 - 1000)
          .as("w_milli"))
      ordered(llm.TextAnalysis.linearTextScore(
        Tables.documents(s, dir).select("doc_id", "text"),
        weights, "doc_id", "text", buckets))
    },

    // Containment near-dup: planted PREFIX documents (first ~40% of
    // tokens at id+1000000) have Jaccard ~0.4 against their source —
    // invisible to q26's threshold — but containment 1.0. Bottom-8
    // md5-hash sketch buckets generate candidates, exact sorted-merge
    // intersection verifies |A∩B|/min(|A|,|B|) ≥ 0.9.
    "q110_containment_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val toks = llm.TextAnalysis.tokens(col("text"))
      val variants = docs.filter(col("doc_id") % 4 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", concat_ws(" ",
          slice(toks, lit(1),
            greatest(lit(3), floor(size(toks) * 2 / 5)).cast("int"))))
      ordered(llm.Dedup.containmentNearDups(
        docs.unionByName(variants), "doc_id", "text", threshold = 0.9))
    },

    // Cluster-representative selection: the full dedup→cluster→survive
    // composition — q26's verified near-dup pairs, q52's connected
    // components, then keep the HIGHEST-quality member per cluster (ties
    // → min id) via one struct-max aggregation; singletons survive as
    // their own cluster. The oracle replays pairs (md5 LSH), closure
    // (recursive CTE) and the argmax end-to-end.
    "q111_cluster_best" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      val corpus = llm.CacheScope.persistTracked(docs.unionByName(variants))
      val pairs = llm.Dedup.minhashNearDupsPortable(
        corpus, "doc_id", "text", threshold = 0.5)
      val scored = corpus.select(col("doc_id"),
        llm.TextAnalysis.qualityScore(col("text")).as("qualidade"))
      ordered(llm.Components.keepBestPerCluster(
        pairs.select("id_a", "id_b"), scored, "doc_id", "qualidade"))
    },

    // Leakage-safe train/val split: the split key hashes the GROUP
    // (source), not the doc, so near-duplicate pages — which cluster
    // within a site — can never straddle the eval boundary. Scan-level
    // deterministic assignment (zero shuffles), then one mixture-stats
    // aggregation per (split, lang). The oracle replays the md5 group
    // hash and the token sums bit-for-bit.
    "q112_leakage_split" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val split = llm.Curation.leakageSafeSplit(
        docs, "source", valPct = 25, salt = "v1")
      ordered(split.groupBy("split", "lang").agg(
        count(lit(1)).as("n_docs"),
        sum(llm.TextAnalysis.wsTokenCount(col("text"))).as("n_tokens"),
        count_distinct(col("source")).as("n_fontes")))
    },

    // The RELEASE-GATED curation chain: q103's five stages + benchmark
    // decontamination (5-gram overlap with an eval suite derived from
    // every 41st doc's first 24 tokens -> dropped) + PII redaction
    // (emails/IPs planted on every 7th doc are masked LAST, with
    // per-kind counts for the release audit). Still ONE plan; the
    // oracle replays all eight operators end-to-end bit-for-bit.
    "q113_curation_release" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contato"), col("doc_id"),
            lit("@exemplo.com 10.0.0."), col("doc_id") % 256))
          .otherwise(col("text")))
      val bench = docs.filter(col("doc_id") % 41 === 0)
        .select(concat_ws(" ",
          slice(llm.TextAnalysis.tokens(col("text")), 1, 24)).as("text"))
      ordered(pipelines.TextCuration.runFull(
        docs, "doc_id", "text", "lang",
        minQuality = 0.19, spanWindow = 5, spanMaxDocs = 2,
        targetFraction = 0.5, benchmark = bench, decontamN = 5))
    },

    // Embedding-space outlier gate: every vector scored by cosine to its
    // OWN label's centroid (mislabeled/off-topic/garbage-encoding
    // detection). Centroids broadcast, corpus never shuffles; all sums
    // DECIMAL-exact so scores and flags replay bit-for-bit.
    "q114_centroid_outliers" -> { (s, dir) =>
      ordered(llm.Similarity.centroidOutliers(
        Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        minCos = 0.0))
    },

    // Token-budget mixture planner (water-filling): one corpus
    // aggregation -> |sources| availability rows, then the closed-form
    // level: small sources taken whole, large ones capped at the common
    // λ so allocations sum to the budget. At sf0.01 the 26000 budget
    // lands λ between the source sizes, exercising both branches.
    "q115_mixture_plan" -> { (s, dir) =>
      ordered(llm.Curation.mixturePlan(
        Tables.documents(s, dir), "source",
        llm.TextAnalysis.wsTokenCount(col("text")), budget = 26000L))
    },

    // Hard-negative mining: per query, the 5 most-similar vectors with a
    // DIFFERENT label (the contrastive near-misses). Broadcast queries,
    // cross-label predicate before any dot product, per-query top-k.
    // FIXED 20-query batch (the §4 retrieval discipline: a constant
    // query load against a growing corpus — modulus selection would
    // grow the batch with the corpus and turn the bench quadratic).
    "q116_hard_negatives" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      ordered(llm.Similarity.hardNegatives(
        emb, emb.orderBy("vec_id").limit(20),
        "vec_id", "embedding", "label", k = 5))
    },

    // Incremental ingestion gate: a new batch (exact copies at +3M,
    // drop-first-token near-dups at +1M, token-reversed fresh docs at
    // +2M) checked against the EXISTING corpus — exact content-hash
    // semi-join + cross-corpus banded MinHash near-dups; candidates
    // form only across the batch/corpus boundary, so pair volume is
    // batch-bounded, never corpus². Oracle replays both checks.
    "q117_ingest_gate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val toks = llm.TextAnalysis.tokens(col("text"))
      val batch = docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat_ws(" ", slice(toks, 2, 100000)).as("text")))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat_ws(" ", reverse(toks)).as("text")))
      ordered(llm.Dedup.ingestGate(batch, docs, "doc_id", "text",
        threshold = 0.5))
    },

    // Reference-LM cross-scoring (CCNet's actual filter design): the
    // bigram model fits on the 'en' slice (the clean reference) and
    // scores every OTHER document — unseen grams fall back to the
    // smoothing floor, so out-of-domain text scores low. The model
    // tables are reference-only aggregations, reusable across batches.
    "q118_lm_cross_score" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      ordered(llm.TextAnalysis.bigramLmCrossScore(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"),
        "doc_id", "text"))
    },

    // Deterministic epoch reshuffle: shard membership fixed (files never
    // move), within-shard read order re-derived per epoch from
    // md5(epoch:id) — zero RNG state, reproducible on any worker/engine.
    // Two epochs emitted side by side; the oracle replays both orders.
    "q119_epoch_order" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val e0 = llm.Curation.epochOrder(docs.select("doc_id"), "doc_id",
        epoch = 0, nShards = 8).withColumn("epoca", lit(0))
      val e1 = llm.Curation.epochOrder(docs.select("doc_id"), "doc_id",
        epoch = 1, nShards = 8).withColumn("epoca", lit(1))
      ordered(e0.unionByName(e1))
    },

    // T5 span corruption: 5-token blocks masked at 15% by the portable
    // (id, block) percent-hash; input keeps one <extra_id_k> sentinel
    // per masked block, target carries the sentinel-prefixed spans.
    // Pure array expressions — scan-level, zero shuffles.
    "q120_span_corrupt" -> { (s, dir) =>
      ordered(llm.Curation.spanCorrupt(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", blockLen = 5, maskPct = 15))
    },

    // DSIR importance resampling (Xie et al. 2023): the 'en' slice is
    // the target distribution, everything else the raw pool; hashed
    // unigram+bigram bucket counts on both sides, per-doc mean of the
    // smoothed p_target/p_raw bucket ratios (log-free, DECIMAL-exact),
    // selecionado = more target-like than raw-like. The model is two
    // 1024-row count tables — fit once, reusable across batches.
    "q121_dsir_select" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      ordered(llm.Curation.dsirScore(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"),
        "doc_id", "text", buckets = 1024))
    },

    // Dictionary/taxonomy tagging: a phrase→label table (multi-word
    // phrases match as contiguous bigrams) broadcast-joined against one
    // scan-level 1..2-gram fan-out, one (doc, label) aggregation.
    // Neutral demo taxonomy over the synthetic corpus vocabulary.
    "q122_dict_tagging" -> { (s, dir) =>
      import s.implicits._
      val dict = Seq(
        ("hash join", "joins"), ("merge join", "joins"), ("join", "joins"),
        ("table scan", "scans"), ("scan", "scans"),
        ("stream", "streaming"), ("window", "streaming"),
        ("group", "olap"), ("agg", "olap"), ("sort", "olap"),
      ).toDF("frase", "etiqueta")
      ordered(llm.TextAnalysis.tagByDictionary(
        Tables.documents(s, dir).select("doc_id", "text"),
        dict, "doc_id", "text", maxN = 2))
    },

    // Distributed classifier TRAINING (q109's fit half): 3 full-batch
    // perceptron epochs over hashed unigram+bigram features, label
    // +1 = 'en'. All-integer algebra — the oracle replays every epoch
    // as an unrolled CTE chain, bit-for-bit. The corpus shuffles once
    // (feature build); epochs move only bucket-level partials.
    "q123_perceptron_train" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      ordered(llm.TextAnalysis.trainPerceptron(
        docs, "doc_id", "text", "y", buckets = 256, epochs = 3))
    },

    // Perceptual-hash image dedup, oracle-exact END-TO-END through real
    // PNG bytes: md5-pattern images (one per doc + a one-block-edited
    // variant per doc_id%7) are ImageIO-encoded, decoded by the dHash56
    // kernel, and near-dup'd by 14-bit pigeonhole bands + exact
    // bit_count(xor) verify. The oracle predicts every hash bit from the
    // same (seed, delta) columns — a kernel that mis-decodes one pixel
    // block hash-mismatches.
    "q124_image_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(8).as("delta")))
      val blobbed = llm.Multimodal.encodePatternPng(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.dHash56,
        decodedSchema = llm.Multimodal.DHashSchema)
      ordered(llm.Dedup.hammingNearDups(
        hashed.select("doc_id", "dhash"), "doc_id", "dhash", maxDist = 4))
    },

    // Train→apply in ONE plan: the q123 perceptron's fitted weights feed
    // q109's inference join over the whole corpus — the self-contained
    // quality-filter loop (fit on the labeled slice, gate everything).
    // The trained model is a ≤256-row broadcast; the corpus pays one
    // feature fan-out per side.
    "q125_selftrain_gate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val w = llm.TextAnalysis.trainPerceptron(
        docs.select(col("doc_id"), col("text"),
          when(col("lang") === "en", 1L).otherwise(-1L).as("y")),
        "doc_id", "text", "y", buckets = 256, epochs = 3)
      ordered(llm.TextAnalysis.linearTextScore(
        docs.select("doc_id", "text"),
        w.select(col("bucket"), col("w").as("w_milli")),
        "doc_id", "text", buckets = 256))
    },

    // Audio near-dup through REAL WAV bytes: md5-pattern loudness
    // envelopes (57 DC segments), the Haitsma-Kalker-family energy
    // difference hash, pigeonhole bands + bit_count verify — every
    // envelope bit oracle-predicted from (seed, delta) through genuine
    // RIFF encode→parse. delta re-masters segment 0 (≤1 bit moves).
    "q129_audio_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(777).as("delta")))
      val blobbed = llm.Multimodal.encodeWavPattern(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.audioHash56,
        decodedSchema = llm.Multimodal.AudioHashSchema)
      ordered(llm.Dedup.hammingNearDups(
        hashed.select("doc_id", "ahash"), "doc_id", "ahash", maxDist = 4))
    },

    // Video near-dup through REAL AVI bytes: 4 md5-pattern DIB frames
    // per doc (+ a per-frame one-block-edited variant per doc_id%9),
    // per-frame dHash56 fingerprints, frame-vote aggregation — ≥3 of 4
    // frames within 4 bits. Every frame hash is oracle-predicted from
    // (seed, delta) through genuine encode→chunk-walk→decode.
    "q128_video_phash_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).select(col("doc_id"))
      val src = base
        .select(col("doc_id"), col("doc_id").cast("string").as("seed"),
          lit(0).as("delta"))
        .unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            col("doc_id").cast("string").as("seed"), lit(8).as("delta")))
      val blobbed = llm.Multimodal.encodeAviPattern(
        llm.Spread(src), "seed", "delta", "payload", nFrames = 4)
      val hashed = llm.Multimodal.frameHashesAvi(blobbed, "payload", stride = 1)
      ordered(llm.Dedup.videoNearDups(
        hashed.select("doc_id", "frame_indice", "dhash"),
        "doc_id", "frame_indice", "dhash", maxDist = 4, minFrames = 3))
    },

    // Signature-only near-dup estimation (Broder's estimator): q26's
    // planted corpus and band buckets, but the verify never rejoins the
    // shingle sets — per pair it folds two 20-long signatures (the
    // 100 TB audit shortcut: re-runs touch no corpus text).
    "q127_minhash_estimate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      ordered(llm.Dedup.estimatedJaccardPairs(
        docs.unionByName(variants), "doc_id", "text", threshold = 0.5))
    },

    // q127's audit replayed from a PERSISTED SignatureIndex: the closure
    // builds the index once (signatures + band buckets, ~200 bytes/doc),
    // then the pair scan reads ONLY the index — the scoring plan contains
    // no document text at all (plan-asserted in DedupSpec). This is the
    // recurring-audit shape at 100 TB: hash at ingest, every later
    // similarity sweep costs index-scan time. Oracle: identical SQL to
    // q127 — the parquet roundtrip is an identity over the signatures.
    "q130_minhash_index_audit" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text",
          concat_ws(" ", slice(llm.TextAnalysis.tokens(col("text")), 2, 100000)))
      val idxDir = scratchDir("graft-sigindex")
      llm.Dedup.writeSignatureIndex(
        docs.unionByName(variants), "doc_id", "text", idxDir)
      llm.CacheScope.releaseAll()
      ordered(llm.Dedup.estimatedJaccardPairsIndexed(
        llm.Dedup.readSignatureIndex(s, idxDir), threshold = 0.5))
    },

    // TF-IDF cosine retrieval, SMART lnc.ltc (Salton & Buckley) — the
    // second lexical ranker next to q99's BM25: document vectors carry
    // tf only (so the doc norm folds off the postings in one combinable
    // aggregation — no vocabulary join), query vectors carry tf·(N/df)
    // with the LOG-FREE idf; every score op is correctly-rounded IEEE
    // (sqrt included) so DuckDB replays the cosine bit-for-bit.
    // maxDfFraction lifted to 1.0 for the ~31-word synthetic vocabulary
    // (same note as q99).
    "q131_tfidf_retrieval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.tfidfTopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0))
    },

    // Mergeable count-min frequency sketch (Cormode–Muthukrishnan) over
    // token bigrams: ≤ depth·width (4×256) rows of state no matter the
    // corpus size — exact n-gram counts need vocabulary-sized state; the
    // sketch builds in ONE combinable aggregation and merges across
    // shards by cell addition (spec-proven equal to the whole-corpus
    // build). Heavy hitters = broadcast-probe estimates (min over 4
    // cells) joined to exact counts: est ≥ cnt always, collisions only
    // add. The portable-md5 hash family keeps the sketch replayable in
    // any engine — the oracle rebuilds every cell and probe bit-for-bit.
    "q132_countmin_bigrams" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val bigrams = docs
        .select(llm.TextAnalysis.tokens(col("text")).as("__toks"))
        .select(explode(llm.TextAnalysis.shingles(col("__toks"), 2))
          .as("bigram"))
      val sketch = operators.Incremental.cmsBuild(
        bigrams, "bigram", depth = 4, width = 256)
      val exact = bigrams.groupBy("bigram").agg(count(lit(1L)).as("cnt"))
      ordered(operators.Incremental
        .cmsEstimate(sketch, exact, "bigram", depth = 4, width = 256)
        .join(exact, "bigram")
        .filter(col("est") >= 50)
        .select(col("bigram"), col("cnt"), col("est")))
    },

    // Content-defined chunking + chunk-hash dedup (the LBFS/Venti
    // storage-dedup discipline on text): boundaries where the local
    // 3-token shingle hash ≡ 0 mod 16, so an inserted PREFIX only
    // perturbs the first chunk and the chunking re-synchronizes —
    // planted prefix-shifted twins share most chunks with their
    // originals, which whole-doc exact dedup and fixed-offset windows
    // both miss. Per doc: chunk count, chunks also present in another
    // doc, duplicated fraction. Oracle replays shingle hashes, the
    // cumulative boundary window and the hash spread exactly.
    "q133_cdc_chunk_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val prefixed = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(lit("prefixo deslocador inserido aqui "), col("text"))
            .as("text"))
      ordered(llm.Dedup.cdcSharedStats(
        llm.Dedup.cdcChunks(docs.unionByName(prefixed), "doc_id", "text"),
        "doc_id"))
    },

    // Calibration/reliability audit of the self-trained gate: q125's
    // train→score pipeline, then per (sign, margin-magnitude) bin the
    // population, observed positive rate and mean margin — the
    // reliability-diagram table that says WHERE the classifier's scores
    // can be trusted as a curation threshold. Bins are scan-level
    // (sign × decimal digit count — exact in any engine), never a
    // global ntile sort. Oracle chains the full training replay into
    // the binning.
    "q134_calibration_audit" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val labeled = docs.select(col("doc_id"), col("text"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      val w = llm.TextAnalysis.trainPerceptron(
        labeled, "doc_id", "text", "y", buckets = 256, epochs = 3)
      val scoredDocs = llm.TextAnalysis.linearTextScore(
        docs.select("doc_id", "text"),
        w.select(col("bucket"), col("w").as("w_milli")),
        "doc_id", "text", buckets = 256)
      ordered(llm.TextAnalysis.calibrationAudit(
        scoredDocs.join(labeled.select("doc_id", "y"), "doc_id"),
        "margem_milli", "y"))
    },

    // Cross-modal consistency audit (paired text+image curation, the
    // LAION discipline) — oracle-exact END-TO-END through real PNG
    // bytes: every doc gets an md5-pattern image keyed by its TEXT;
    // %6 plants are true multimodal duplicates (same text, same image),
    // %9 plants are caption-dup/image-mismatch rows (same text, an
    // unrelated pattern). Pairs form only within exact-text groups; the
    // verdict is one bit_count(xor) per pair. The oracle predicts every
    // image hash from the seed algebra and replays the text grouping.
    "q135_crossmodal_audit" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      def withSeed(d: DataFrame, shift: Long, seedSuffix: String) =
        d.select((col("doc_id") + shift).as("doc_id"), col("text"),
          concat(md5(col("text").cast("binary")), lit(seedSuffix)).as("seed"),
          lit(0).as("delta"))
      val src = withSeed(docs, 0L, "")
        .unionByName(withSeed(docs.filter(col("doc_id") % 6 === 0), 1000000L, ""))
        .unionByName(withSeed(docs.filter(col("doc_id") % 9 === 0), 2000000L, "x"))
      val blobbed = llm.Multimodal.encodePatternPng(
        llm.Spread(src), "seed", "delta", "payload")
      val hashed = llm.Multimodal.decodeBatches(
        blobbed, "payload", kernel = llm.Multimodal.dHash56,
        decodedSchema = llm.Multimodal.DHashSchema)
      val paired = hashed.select("doc_id", "dhash")
        .join(src.select("doc_id", "text"), "doc_id")
      ordered(llm.Dedup.crossModalConsistency(
        paired, "doc_id", "text", "dhash", maxDist = 4))
    },

    // q99's BM25 replayed from a PERSISTED postings index built in TWO
    // appends: write half the corpus, fold the other half in
    // (postings append + exact-integer stats merge), query off the
    // index alone — no tokenization in the scoring plan, scores
    // bit-identical to the from-scratch path. Oracle: q99's SQL verbatim.
    "q136_bm25_indexed" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val idxDir = scratchDir("graft-postidx")
      llm.Retrieval.writePostingsIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", idxDir)
      llm.Retrieval.appendPostingsIndex(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idxDir)
      val queries = docs.orderBy("doc_id").limit(8)
      ordered(llm.Retrieval.bm25TopKIndexed(
        llm.Retrieval.readPostingsIndex(s, idxDir), queries,
        "doc_id", "text", k = 5, maxDfFraction = 1.0))
    },

    // Per-group trend fitting: OLS slope/intercept of order value over
    // time per market segment — grouped regression as ONE combinable
    // aggregation of exact-DECIMAL sufficient statistics (the only
    // shape grouped model fitting can take at 100 TB; collect-and-solve
    // caps at executor memory). The closed form runs per group ROW in
    // IEEE doubles over the exact sums — DuckDB replays it bit-for-bit.
    "q137_group_linear_fit" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")),
            to_date(lit("1992-01-01"))).as("x"),
          col("o_totalprice").as("y"))
      val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
      ordered(operators.Stats.groupLinearFit(
        o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
        Seq("c_mktsegment"), "x", "y"))
    },

    // Johnson-Lindenstrauss random projection (Achlioptas ±1 signs from
    // portable md5 — no stored matrix, engine-identical, append-
    // consistent): the cheap distance-preserving screen in front of
    // exact cosine. DECIMAL-accumulated per (id, output dim) so the
    // projected space is partition-independent; the oracle rebuilds
    // every sign and sum exactly.
    "q138_random_projection" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") % 50 === 0)
      ordered(llm.Similarity.randomProject(emb, "vec_id", "embedding",
        outDims = 8))
    },

    // The two-stage ANN q138's projection exists for: screen all pairs
    // in 8 projected dims (8× less pair work than full-dim), bounded-
    // heap keep 50 candidates per query, exact-decimal cosine re-rank
    // the survivors only. Deterministic end to end, so the oracle
    // replays BOTH stages — projections, screen ranks, and the exact
    // re-rank — bit-for-bit. Recall vs brute force is the JL trade
    // (spec-measured); self matches always survive.
    "q139_screened_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.orderBy("vec_id").limit(32)
      ordered(llm.Similarity.screenedTopK(emb, q, "vec_id", "embedding",
        k = 10, outDims = 8, screen = 50))
    },

    // PageRank over the supplier->part->customer supply graph (3 fixed
    // power iterations, damping 0.85, dangling mass redistributed) —
    // the graph-centrality signal web curation weights crawl priors by
    // (Common Crawl's per-host centrality). Per iteration: one edge join
    // + one combinable DECIMAL mass sum; state = one row per node. The
    // oracle unrolls the iterations as CTEs and replays every rank
    // bit-for-bit (the q123 discipline for iterative fitting).
    "q140_pagerank" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val e1 = li.select((-col("l_suppkey")).as("src"),
        col("l_partkey").as("dst"))
      val e2 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("src"),
          (col("o_custkey") + 1000000000L).as("dst"))
      ordered(llm.Components.pageRank(
        e1.unionByName(e2), "src", "dst", iters = 3))
    },

    // Retrieval evaluation in-engine: q99's BM25 ranking scored against
    // an exact-duplicate relevance set (every doc sharing the query's
    // text is relevant — including the query itself, which a sane
    // lexical ranker must retrieve). Per query: relevant count, hits,
    // recall@5 and reciprocal rank — the offline gate a retriever
    // change passes before production. Oracle nests q99's replay as a
    // CTE and replays the eval arithmetic exactly.
    "q141_retrieval_eval" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val ranking = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0)
      val rel = queries.select(col("doc_id").as("query_id"), col("text"))
        .join(docs, "text")
        .select("query_id", "doc_id")
      ordered(llm.Retrieval.evalRanking(ranking, rel, k = 5))
    },

    // Average precision @5 over the same BM25 ranking + duplicate-text
    // relevance as q141 — every relevant doc contributes precision at
    // its own rank, folded in rank order; MAP-ready per-query rows.
    "q211_avg_precision" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val queries = docs.orderBy("doc_id").limit(8)
      val ranking = llm.Retrieval.bm25TopK(docs, queries, "doc_id", "text",
        k = 5, maxDfFraction = 1.0)
      val rel = queries.select(col("doc_id").as("query_id"), col("text"))
        .join(docs, "text")
        .select("query_id", "doc_id")
      ordered(llm.Retrieval.evalAveragePrecision(ranking, rel, k = 5))
    },

    // Blocked fuzzy record linkage: planted one-char-deletion typo
    // variants of customer names matched back by exact Levenshtein ≤ 1,
    // restricted to pairs sharing the numeric suffix-4 (id-like names
    // make every other key degenerate — all 150k share "customer#000…";
    // the planted deletion, before the last 5 chars, always preserves
    // the suffix). SAME result set as the original fuzzyPairs suffix-4
    // pass (spec-pinned), but candidates come from the FastSS deletion-
    // neighborhood join STRATIFIED by the suffix instead of suffix-key
    // collision blocks: suffix-4 keys SATURATE as the corpus outgrows
    // the 10⁴ key space (measured ×9.1 wall at ×10 data, candidate
    // volume ×181 from block² growth), while deletion-variant collisions
    // track true near-dup density — the §4 entropy discipline made
    // structural. Edits INSIDE the suffix still escape — the documented
    // blocking-coverage trade; the spec demonstrates the multi-pass
    // prefix+suffix fuzzyPairs form on human-like names. Oracle replays
    // normalization, the suffix restriction and the exact edit distance.
    "q142_fuzzy_linkage" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 12),
            substring(col("c_name"), 14, 100000)).as("c_name"))
      val base = c.unionByName(variants)
        .select(col("c_custkey"), lower(trim(col("c_name"))).as("nome"))
      ordered(operators.Linkage.editJoinDeletes(
        base, "c_custkey", "nome", maxDist = 1,
        strata = Some(nm => substring(nm, -4, 4))))
    },

    // MMR diversified re-rank (Carbonell-Goldstein): brute-force cosine
    // top-20 candidates per query, then 5 greedy rounds of
    // λ·rel − (1−λ)·max-sim-to-selected — the de-redundancy step
    // between retrieval and a RAG context window. k is constant, so the
    // loop is k engine rounds (broadcast join + bounded-heap argmax),
    // all queries advancing in parallel; the oracle unrolls the rounds
    // as CTEs and replays every selection exactly.
    "q143_mmr_diversify" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = emb.orderBy("vec_id").limit(8)
      val cand = llm.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("corpus_id"), col("cosine").as("rel"))
      ordered(llm.Similarity.mmrSelect(
        cand, emb, "vec_id", "embedding", k = 5, lambda = 0.7))
    },

    // Calendar gap-fill + forward-fill: per-customer monthly order
    // totals with every month of each customer's span PRESENT (absent
    // months get null value + presence flag + the carried last value) —
    // the panel normalization the reference's per-competencia tables
    // assume upstream. Per-group calendars explode from per-group
    // bounds (rows = group spans, never groups × global calendar); the
    // carry is one running ignore-nulls window per group. Oracle
    // replays the calendar, the join and the carry exactly.
    "q144_gap_fill" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"),
          to_date(date_trunc("MONTH", col("o_orderdate"))).as("mes"),
          col("o_totalprice"))
        .groupBy("o_custkey", "mes")
        .agg(sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
          .as("valor"))
      ordered(operators.Timeseries.gapFillMonthly(
        o, Seq("o_custkey"), "mes", "valor"))
    },

    // Cohort retention matrix: customers grouped by first-order month,
    // activity counted per (cohort, month offset) — the longitudinal
    // panel question (of month-X entrants, how many are active at
    // X+k?). One min-aggregation, one entity-keyed join, one exact
    // distinct count per cell; the month offset is exactly integral on
    // truncated dates. Oracle replays all three steps.
    "q145_cohort_retention" -> { (s, dir) =>
      val a = Tables.orders(s, dir)
        .select(col("o_custkey"),
          to_date(date_trunc("MONTH", col("o_orderdate"))).as("mes"))
      ordered(operators.Timeseries.cohortRetention(a, "o_custkey", "mes"))
    },

    // Per-vertex triangle counting over the supplier co-supply graph
    // (suppliers sharing a part; parts sampled %20 to bound wedge
    // volume — Σdeg² grows quadratically in supplier degree, the
    // declared skew lever): canonical a<b<c wedges from two edge
    // self-joins — each
    // triangle generated exactly once — then one combinable per-vertex
    // count. Completes the graph trio (components, PageRank,
    // triangles). Oracle replays edge building and both joins.
    "q146_triangle_count" -> { (s, dir) =>
      val ps = Tables.lineitem(s, dir).filter(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sup"))
        .distinct()
      val edges = ps.select(col("p"), col("sup").as("s1"))
        .join(ps.select(col("p"), col("sup").as("s2")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .select(col("s1").as("src"), col("s2").as("dst")).distinct()
      ordered(llm.Components.triangleCount(edges, "src", "dst"))
    },

    // ABC/Pareto classification: customers ranked by total spend within
    // their market segment, cumulative DECIMAL share of the segment
    // total, classic A/B/C bands — the prioritization table operational
    // reports end in. Runs over grouped aggregates (entities, not
    // facts), so the per-group sort is entity-bounded. Oracle replays
    // the running share and band cuts bit-for-bit.
    "q147_pareto_abc" -> { (s, dir) =>
      val spend = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .select("c_custkey", "c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
          .as("gasto"))
      ordered(operators.Stats.paretoClass(
        spend, Seq("c_mktsegment"), "o_custkey", "gasto"))
    },

    // Contiguous dense ids in a total order WITHOUT the global-window
    // single-partition collapse: range-repartition + per-partition sort
    // + the two-phase zipWithIndex offset — ids are a pure function of
    // the total order, identical under any partitioning. Oracle: the
    // naive row_number()-1 (fine for DuckDB, the exact plan Spark must
    // NOT use at 100 TB).
    "q148_contiguous_ids" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      ordered(operators.Ids.contiguousIds(o, Seq(("o_orderkey", true))))
    },

    // Right-to-erasure propagation audit (the LGPD/GDPR cascade the
    // reference's subject data would owe): per registered table, one
    // broadcast-probe pass counting rows the erasure touches and rows
    // remaining — the before/after proof a deletion job ships. Oracle
    // replays both table probes.
    "q149_erasure_audit" -> { (s, dir) =>
      val keys = Tables.customer(s, dir)
        .filter(col("c_custkey") % 13 === 0).select("c_custkey")
      ordered(llm.Privacy.erasureReport(Seq(
        ("customer", Tables.customer(s, dir), "c_custkey"),
        ("orders", Tables.orders(s, dir), "o_custkey")),
        keys, "c_custkey"))
    },

    // Per-group z-score anomaly detection: μ/σ from exact DECIMAL
    // sufficient statistics broadcast back onto the scan (the fact
    // table never shuffles), rows flagged at |x−μ| > 3σ. Flags are
    // partition-independent by construction; the oracle replays the
    // statistics and every flag bit-for-bit.
    "q150_zscore_anomalies" -> { (s, dir) =>
      val e = Tables.events(s, dir).select("event_id", "event_type", "value")
      ordered(operators.Stats.zScoreFlags(e, Seq("event_type"), "value")
        .filter(col("atipico"))
        .select("event_id", "event_type", "value", "media", "desvio",
          "z_score"))
    },

    // Golden-record construction (MDM survivorship) — the full record-
    // linkage deliverable in one engine: q142's blocking + exact
    // Levenshtein pairs → connected components → one canonical row per
    // entity (longest name survives with deterministic ties, best
    // balance wins, canonical id = cluster minimum). Oracle replays the
    // blocking and the DP, closes the clusters by recursive CTE (the
    // q52 pattern) and ranks the survivorship deterministically.
    "q151_golden_record" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select("c_custkey", "c_name", "c_acctbal")
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("c_name"), 1, 12),
            substring(col("c_name"), 14, 100000)).as("c_name"),
          (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
      val rec = c.unionByName(variants)
      val pairs = operators.Linkage.fuzzyPairs(rec, "c_custkey", "c_name",
        maxDist = 1, blockKeys = Seq(nm => substring(nm, -4, 4)))
      val labels = llm.Components.connectedComponents(pairs, "id_a", "id_b")
      val labeled = rec.join(labels,
          rec("c_custkey") === labels("doc_id"), "left")
        .select(coalesce(col("cluster_id"), col("c_custkey"))
            .as("cluster_id"),
          col("c_custkey"), col("c_name"), col("c_acctbal"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id")
        .orderBy(length(col("c_name")).desc, col("c_name").desc,
          col("c_custkey").asc)
      ordered(labeled
        .withColumn("__r", row_number().over(w))
        .groupBy("cluster_id")
        .agg(
          count(lit(1L)).as("membros"),
          min(col("c_custkey")).as("id_canonico"),
          max(when(col("__r") === 1, col("c_name"))).as("nome_canonico"),
          max(col("c_acctbal")).as("saldo_max")))
    },

    // Market-basket association rules over order line items (parts
    // bucketed into 100 pseudo-categories so co-occurrence is dense
    // enough to rank): support/confidence/lift per ordered category
    // pair, candidates only WITHIN a basket (never catalog²), rare
    // pairs cut before the metric math. All three metrics are exact
    // integer ratios — the oracle replays every one.
    "q152_basket_rules" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("pedido"),
          pmod(col("l_partkey"), lit(100)).as("categoria"))
      ordered(operators.Basket.pairRules(li, "pedido", "categoria",
        minPairs = 5L))
    },

    // PPS systematic sampling: n selection points along the cumulative
    // weight axis of an md5-shuffled corpus — inclusion probability
    // proportional to n_chars, sample size hit deterministically (a
    // Bernoulli keep only matches the target in expectation). The
    // global cumulative decomposes into 256 order-prefix buckets
    // (bounded windows + a broadcast offset table — never a
    // single-partition sort); DECIMAL cumsums and one IEEE
    // multiply/divide/floor per interval end make the kept set and each
    // row's point multiplicity engine-exact.
    "q153_pps_sample" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      ordered(llm.Curation.ppsSample(d, "doc_id", "n_chars", n = 60))
    },

    // PMI collocation extraction: adjacent token pairs that co-occur far
    // beyond their unigram frequencies — ranked by the exact PMI RATIO
    // (log-free: integer DECIMAL products + one IEEE division), support
    // cut applied to the counted bigram table before any join. Feeds
    // the q122 phrase-table tagger.
    "q154_collocations" -> { (s, dir) =>
      ordered(llm.TextAnalysis.collocations(
        Tables.documents(s, dir), "doc_id", "text", minCount = 8L))
    },

    // Time-constrained funnel: view -> click -> purchase where each
    // stage must land within 2 days of the prior — k-1 fixed rounds of
    // one user-keyed join + one combinable min each; a null prior stage
    // nulls everything after it.
    "q176_funnel_within" -> { (s, dir) =>
      ordered(streaming.Events.funnelWithin(
        Tables.events(s, dir), Seq("view", "click", "purchase"),
        within = "2 days"))
    },

    // Misra–Gries heavy hitters GRADED end-to-end: the native bounded-
    // state aggregate proposes candidates (k=28 counters against a
    // 31-token vocabulary — eviction pressure is real), an exact recount
    // confirms, and the integer guard `cnt·(k+1) > N` keeps exactly the
    // over-threshold set. The oracle computes that set directly — if MG
    // ever dropped a guaranteed item, the join would LOSE a row and the
    // compare goes red, so the retention guarantee itself is what's
    // graded. Two scans by design (sketch pass + confirm pass): at
    // 100 TB the candidate set (≤k rows) is what makes the second pass
    // a cheap semi-joined recount instead of a full vocabulary sort.
    "q177_mg_confirm" -> { (s, dir) =>
      val k = 28
      val toks = Tables.documents(s, dir)
        .select(explode(llm.TextAnalysis.tokens(col("text"))).as("item"))
      val cand = operators.Incremental.heavyHitters(toks, "item", k)
        .select(col("item"))
      val exact = toks.groupBy("item").agg(count(lit(1L)).as("ocorrencias"))
      val total = toks.agg(count(lit(1L)).as("__n"))
      ordered(cand.join(exact, "item")
        .crossJoin(broadcast(total))
        .filter(col("ocorrencias") * (k + 1) > col("__n"))
        .select(col("item"), col("ocorrencias")))
    },

    // Versioned layout + time travel GRADED: three deterministic commits
    // into a fresh table dir, then a version-2 read — the oracle replays
    // v2's defining transform straight against the source table, so the
    // layout's snapshot isolation (v3 must not leak into a v2 read) is
    // what's hash-checked.
    "q178_time_travel" -> { (s, dir) =>
      val base = Tables.documents(s, dir)
        .select("doc_id", "lang", "source", "n_chars")
      val tdir = scratchDir("graft-timetravel") + "/tabela"
      sources.Versioned.commitVersion(
        base.filter(col("doc_id") % 2 === 0), tdir) // v1
      sources.Versioned.commitVersion(
        base.filter(col("doc_id") % 3 === 0)
          .withColumn("n_chars", col("n_chars") + lit(1L)), tdir) // v2
      sources.Versioned.commitVersion(
        base.filter(col("doc_id") % 5 === 0), tdir) // v3 (head)
      ordered(sources.Versioned.readVersion(s, tdir, Some(2)))
    },

    // EXACT global set-similarity self-join via prefix filtering
    // (AllPairs/PPJoin): every 5-gram-set pair with Jaccard >= 3/5
    // over the whole corpus — no caller blocking (q28's contract), no
    // probabilistic recall (q26/q27's trade). Candidates only where
    // df-ordered prefixes intersect (a provable superset), length
    // filter, exact merge-walk verify with the threshold decided in
    // INTEGERS. 5-grams, not q28's trigrams: the prefix filter's cost
    // follows SET-ELEMENT entropy (candidates ~ Σ prefix-df²), and this
    // synthetic corpus's 31-token vocabulary saturates trigram space at
    // scale (df ~230 at sf1 → ×22 wall at ×10 data, measured) while
    // 5-grams stay near-unique — the same entropy-is-the-lever rule as
    // q142's blocking keys, here exercised at the right operating point.
    "q181_exact_jaccard_join" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val variants = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("text", concat(col("text"), lit(" zz9")))
      ordered(llm.SetJoin.jaccardJoinPrefix(
        docs.unionByName(variants), "doc_id", "text",
        thresholdNum = 3, thresholdDen = 5, shingleN = 5))
    },

    // EXACT edit-distance self-join via FastSS deletion neighborhoods
    // (no caller-chosen blocking keys — q142's recall trade removed): a
    // pair within Levenshtein d must share a <=d-deletion variant (the
    // alignment's matched subsequence — a theorem, not a heuristic), so
    // candidates = variant collisions, then one exact DP per survivor.
    // Same planted variants as q142; the output is the COMPLETE
    // distance-1 pair set.
    "q183_edit_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), lower(trim(col("c_name"))).as("nome"))
      val variants = c.filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(substring(col("nome"), 1, 12),
            substring(col("nome"), 14, 100000)).as("nome"))
      ordered(operators.Linkage.editJoinDeletes(
        c.unionByName(variants), "c_custkey", "nome", maxDist = 1))
    },

    // Multinomial Naive Bayes language ID, fit on the %3!=0 train split
    // and applied to the WHOLE corpus in one plan — the generative
    // counterpart of q123/q125. Every model term is one IEEE op chain
    // from exact integer counts; apply-side sums accumulate in
    // DECIMAL(38,18) so the scores are order-independent, and the
    // argmax ties break on the class name.
    "q184_naive_bayes" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
      val model = llm.TextAnalysis.naiveBayesFit(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", "lang")
      ordered(llm.TextAnalysis.naiveBayesApply(docs, "doc_id", "text", model)
        .join(docs.select("doc_id", "lang"), Seq("doc_id")))
    },

    // Chi-squared token-class feature selection over the documents
    // corpus (class = lang, doc-level presence, min df 5): the
    // chi2 >= 3.84 (p ~ 0.05, df 1) selection is decided in exact
    // integers
    // (den*N*(ad-bc)^2 >= num*margins), the reported chi2 is one IEEE
    // division.
    "q188_chi2_features" -> { (s, dir) =>
      ordered(llm.TextAnalysis.chiSquaredFeatures(
        Tables.documents(s, dir).select("doc_id", "text", "lang"),
        "doc_id", "text", "lang",
        minDf = 5L, threshNum = 384L, threshDen = 100L))
    },

    // Lag-1..7 autocorrelation of the daily event-value series: the
    // corpus collapses to one row per day FIRST (combinable sum), so
    // the windows/self-join walk 30 buckets; sufficient statistics are
    // exact DECIMAL, the edge is a fixed double parenthesization + one
    // division per lag.
    "q189_autocorrelation" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.autocorrelation(
        daily, "dia", "total", maxLag = 7, scale = 2))
    },

    // CUSUM changepoint scan over the same daily series: the recursive
    // max(0, .) statistic via its closed running-extremum form, n-scaled
    // exact decimals end to end, the alarm an exact decimal gate and
    // each reported statistic one IEEE division.
    "q190_cusum" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.cusumChangepoints(
        daily, "dia", "total", slack = "500", threshold = "2000",
        scale = 2))
    },

    // Multi-source BFS hop levels over the supplier-part bipartite
    // graph (suppliers negated, the q140 vertex-space trick): frontier
    // expansion, one adjacency join + one visited anti-join per round,
    // depth-capped so the recursive-CTE oracle replays the exact
    // semantics.
    "q191_bfs_levels" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val edges = li.select((-col("l_suppkey")).as("src"),
        col("l_partkey").as("dst")).distinct()
      val seeds = li.filter(col("l_partkey") % 500 === 0)
        .select(col("l_partkey").as("seed"))
      ordered(llm.Components.bfsLevels(
        edges, "src", "dst", seeds, "seed", maxDepth = 3))
    },

    // CART decision stump: best Gini split per feature, the argmax
    // decided by one IEEE division of exact DECIMAL(38,0) integer
    // products (ties on the smaller threshold) — the corpus collapses
    // to (value, class) counts first, every window walks distinct
    // values only.
    "q192_gini_stump" -> { (s, dir) =>
      ordered(operators.Stats.giniStump(
        Tables.lineitem(s, dir), Seq("l_quantity", "l_discount"),
        "l_returnflag"))
    },

    // Spearman rank correlation, engine-exact: tie-averaged ranks as
    // doubled integers from distinct-value collapses, DECIMAL(38,0)
    // sufficient statistics, a fixed sqrt/division IEEE edge per pair.
    "q193_spearman" -> { (s, dir) =>
      ordered(operators.Stats.spearmanCorr(
        Tables.lineitem(s, dir), Seq(
          ("l_quantity", "l_extendedprice"),
          ("l_quantity", "l_discount"),
          ("l_extendedprice", "l_discount"))))
    },

    // Two-proportion z-test on per-user conversion (arms by user-id
    // parity): the corpus collapses to one row per user, counts come
    // from ONE conditional aggregation, z is a fixed IEEE chain from
    // exact BIGINTs.
    "q194_ab_test" -> { (s, dir) =>
      val users = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(col("event_type") === "purchase" && col("value") > 90.0)
          .as("converteu"))
        .withColumn("braco",
          when(col("user_id") % 2 === 0, "par").otherwise("impar"))
      ordered(operators.Stats.proportionZTest(
        users, "braco", "converteu", "par", "impar"))
    },

    // Kruskal-Wallis H across return-flag groups on extended price:
    // doubled tie-averaged ranks from the distinct-value collapse,
    // exact tie term, per-group divisions folded through
    // DECIMAL(38,18).
    "q195_kruskal_wallis" -> { (s, dir) =>
      ordered(operators.Stats.kruskalWallis(
        Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice"))
    },

    // Vocabulary coverage / OOV audit: top-20 unigram vocabulary fit
    // on the doc_id%3==0 training slice (count desc, token asc - the
    // deterministic q70 top-k; 20 of the corpus's 31 types, so real
    // OOV mass), broadcast onto the full corpus's token
    // stream; exact counts, one division per doc.
    "q196_vocab_coverage" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val vocab = llm.TextAnalysis.topNgrams(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        n = 1, k = 20)
      ordered(llm.TextAnalysis.vocabCoverage(
        docs, "doc_id", "text", vocab, "ngram"))
    },

    // Classical additive decomposition of the daily event-value series
    // (weekly period): centered 7-point trend with honest null edges,
    // per-position seasonal means routed through DECIMAL(38,18),
    // value = trend + seasonal + residual on every interior day.
    "q197_seasonal_decomp" -> { (s, dir) =>
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("dia"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("total"))
      ordered(operators.Timeseries.classicalDecomposition(
        daily, "dia", "total", period = 7, scale = 2))
    },

    // Item-item cosine recommendations from order co-purchases:
    // within-basket pair counts (never catalog^2), minPairs=2 noise
    // cut, fixed sqrt/division cosine, bounded-heap top-5 per item.
    "q198_item_cosine" -> { (s, dir) =>
      ordered(operators.Basket.itemCosineTopK(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        k = 5, minPairs = 2L))
    },

    // TextRank corpus keywords: scan-level adjacency explode ->
    // mirrored co-occurrence edges -> the q140 decimal-exact PageRank
    // -> one TakeOrdered top-20 with the (rank desc, token asc)
    // tie-break.
    "q199_textrank" -> { (s, dir) =>
      ordered(llm.TextAnalysis.textRankKeywords(
        Tables.documents(s, dir), "text", iters = 3, k = 20))
    },

    // Exact-substring dedup, keep-first (Lee et al. 2022 ExactSubstr):
    // every duplicated 6-token sliding span (stride 1 — the paper's
    // every-position semantics) keeps only its globally-first
    // (doc, start) occurrence; tokens covered by any LATER occurrence
    // drop and the document is rebuilt in order.
    "q200_exact_substr_dedup" -> { (s, dir) =>
      ordered(llm.Curation.dedupExactSubstrings(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", window = 6, stride = 1))
    },

    // Two-sample Kolmogorov-Smirnov per order priority: open ('O') vs
    // closed totalprice distributions. D's numerator is a pure-BIGINT
    // max of ECDF gaps scaled by n_a*n_b (the value-collapse
    // discipline), d one IEEE division, the Numerical-Recipes lambda a
    // fixed parenthesization on top.
    "q201_ks_test" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("grupo"),
        col("o_totalprice").cast("double").as("valor"),
        (col("o_orderstatus") === "O").as("aberto"))
      ordered(operators.Stats.ksTest(o, Seq("grupo"), "valor", "aberto"))
    },

    // Jaro-Winkler name linkage: suffix-4-blocked candidates over
    // customer names + planted one-char mid-name substitutions (suffix
    // preserved, so blocking finds every plant), scored by the native
    // codegen expression. The oracle's jaro_winkler_similarity is
    // DuckDB's own INDEPENDENT kernel — this row cross-checks the
    // similarity arithmetic itself, not a replay of it.
    "q202_jaro_winkler" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey").as("id"), lower(trim(col("c_name"))).as("nome"))
      val v = c.filter(col("id") % 9 === 0).select(
        (col("id") + 1000000L).as("id"),
        concat(substring(col("nome"), 1, 11), lit("x"),
          substring(col("nome"), 13, 100000)).as("nome"))
      ordered(operators.Linkage.jaroWinklerPairs(
        c.unionByName(v), "id", "nome", minSim = 0.937,
        blockKeys = Seq(nm => substring(nm, -4, 4))))
    },

    // Welch's unequal-variance t-test on the same open-vs-closed
    // totalprice comparison as q201 (KS asks "did the SHAPE move",
    // Welch asks "did the MEAN move") — exact decimal sufficient
    // statistics, fixed-parenthesization double edge.
    "q203_welch_ttest" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("grupo"),
        col("o_totalprice").cast("double").as("valor"),
        (col("o_orderstatus") === "O").as("aberto"))
      ordered(operators.Stats.welchTTest(o, Seq("grupo"), "valor", "aberto"))
    },

    // Mann-Kendall monotone-trend test per event type over the daily
    // value series: S and the tie-corrected 18*Var in pure BIGINT over
    // the calendar-bounded collapsed series, one sqrt/division edge,
    // three-way trend call at z = +/-1.96.
    "q204_mann_kendall" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(
        col("event_type").as("grupo"), to_date(col("ts")).as("dia"),
        col("value"))
      ordered(operators.Timeseries.mannKendall(
        e, Seq("grupo"), "dia", "value"))
    },

    // Per-document lexical diversity: token entropy via the
    // deterministic token-sorted fold, type-token and hapax ratios as
    // single divisions; empty docs emit n=0 with null ratios.
    "q205_lexical_diversity" -> { (s, dir) =>
      ordered(llm.TextAnalysis.lexicalDiversity(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text"))
    },

    // Chi-squared independence + Cramer's V between order priority and
    // status per order-year: integer cell algebra (n*nab - na*nb
    // squared in DECIMAL(38,0)), one IEEE division per cell, the
    // deterministic (a,b)-sorted fold, dof-gated outputs.
    "q207_cramers_v" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        year(col("o_orderdate")).cast("long").as("ano"),
        col("o_orderpriority").as("prioridade"),
        col("o_orderstatus").as("situacao"))
      ordered(operators.Stats.cramersV(
        o, Seq("ano"), "prioridade", "situacao"))
    },

    // Exact decile lift / cumulative gains of the purchase-vs-rest
    // ranking per day (q182 ranks the model, q187 picks the threshold,
    // this answers "contact the top k decils, capture what fraction"):
    // deterministic (score DESC, id ASC) ranking, integer buckets,
    // single-division capture/rate/lift.
    "q215_lift_table" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(
        to_date(col("ts")).as("dia"), col("event_id"), col("value"),
        (col("event_type") === "purchase").as("compra"))
      ordered(operators.Stats.liftTable(
        ev, Seq("dia"), "event_id", "value", "compra", buckets = 10))
    },

    // Theil-Sen robust trend per event type over the daily value
    // series (the quantifier next to q204's detector): exact medians of
    // pairwise slopes and point residuals via value-collapse +
    // conditional middle-rank lookups, calendar-bounded pair space.
    "q214_theil_sen" -> { (s, dir) =>
      val e = Tables.events(s, dir).select(
        col("event_type").as("grupo"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .as("dia_num"),
        col("value"))
      ordered(operators.Timeseries.theilSen(
        e, Seq("grupo"), "dia_num", "value"))
    },

    // Canonical-URL dedup: every doc's URL plus a deliberately messy
    // refetch variant for doc_id % 3 = 0 (upper-cased scheme/host,
    // explicit :443, www., trailing slash, reordered + tracking params,
    // fragment) — canonicalization must collapse each messy pair to ONE
    // row keeping the smallest id.
    "q213_url_dedup" -> { (s, dir) =>
      val clean = concat(lit("https://www."), col("source"),
        lit("-site.example/art/"), col("doc_id").cast("string"),
        lit("?a=1&b=2"))
      val messy = concat(lit("HTTPS://"), upper(col("source")),
        lit("-SITE.EXAMPLE:443/art/"), col("doc_id").cast("string"),
        lit("/?b=2&utm_campaign=x&a=1#top"))
      val docs = Tables.documents(s, dir)
      val urls = docs.select(col("doc_id"), clean.as("url"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), messy.as("url")))
      ordered(llm.Curation.dedupByCanonicalUrl(urls, "doc_id", "url"))
    },

    // Revenue per priority THROUGH the co-bucketed catalog tables
    // (write both sides bucketed+sorted on the join key, join with no
    // shuffle on either side — PlanShapeSpec proves the zero-Exchange
    // plan; this query grades the RESULT against the plain-join oracle).
    "q212_bucketed_join" -> { (s, dir) =>
      val li = sources.Staging.bucketedTable(s,
        Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
        "graft_q212_li", "l_orderkey", 8)
      val o = sources.Staging.bucketedTable(s,
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        "graft_q212_ord", "o_orderkey", 8)
      ordered(li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority").as("prioridade"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            .as("receita"),
          count(lit(1L)).as("n_itens")))
    },

    // Bloom file-skipping manifest, GRADED the q212 way (r11 VERDICT
    // #2): the manifest changes WHICH FILES are opened, never the
    // result. Orders land range-clustered on o_custkey, a per-file
    // Bloom manifest is written in one aggregation pass, and the point
    // lookup reads ONLY bloom-matching files (file names collected,
    // bloom bytes never reach the driver) — the answer is graded
    // against the plain full-scan oracle. The real IN predicate still
    // applies after pruning (manifest pruning is sound, not complete).
    "q216_bloom_pruned_read" -> { (s, dir) =>
      val root = s"${GraftSession.scratchRoot}/graft-q216"
      Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .repartitionByRange(8, col("o_custkey"))
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(root)
      operators.Layout.writeBloomManifest(s, root, "o_custkey")
      val keys = Seq(7L, 42L, 99L, 123L)
      ordered(operators.Layout.bloomPrunedRead(s, root, "o_custkey", keys)
        .filter(col("o_custkey").isin(keys: _*))
        .groupBy("o_custkey")
        .agg(count(lit(1L)).as("n_pedidos"),
          sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
            .as("total")))
    },

    // Z-order compaction + unified manifest, GRADED (r11 VERDICT #2):
    // one zorderCompact rewrite (curve clustering, compaction and the
    // per-key bloom+bounds manifest sharing a single shuffle), then the
    // combined range+point manifest-pruned read — bounding boxes prune
    // the o_orderkey RANGE on curve-compact files, blooms prune the
    // o_custkey POINT probes, zero parquet footers opened. Result is
    // graded against the plain-scan oracle (layout never changes the
    // answer); the real predicate applies after pruning.
    "q217_zorder_manifest_read" -> { (s, dir) =>
      val root = s"${GraftSession.scratchRoot}/graft-q217"
      val ords = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      operators.Layout.zorderCompact(
        s, ords, Seq("o_custkey", "o_orderkey"), 8, root)
      val keys = Seq(7L, 42L, 99L, 123L)
      ordered(operators.Layout.manifestPrunedRead(s, root,
          ranges = Map("o_orderkey" -> (100L, 5000L)),
          points = Map("o_custkey" -> keys))
        .filter(col("o_orderkey").between(100L, 5000L) &&
          col("o_custkey").isin(keys: _*))
        .groupBy("o_orderstatus")
        .agg(count(lit(1L)).as("n"),
          sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
            .as("total")))
    },

    // Mutual information + NMI on the same priority-x-status pair as
    // q207 (chi2 asks "statistically surprising?", MI asks "how many
    // nats does A tell you about B"): observed-cell terms with exact
    // integer ln arguments, deterministic sorted folds for MI and both
    // marginal entropies.
    "q210_mutual_info" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        year(col("o_orderdate")).cast("long").as("ano"),
        col("o_orderpriority").as("prioridade"),
        col("o_orderstatus").as("situacao"))
      ordered(operators.Stats.mutualInfo(
        o, Seq("ano"), "prioridade", "situacao"))
    },

    // Gini concentration of order totalprice per priority: exact
    // sorted-rank algebra over the value-collapsed cent-scaled table,
    // two integer divisions at the edge.
    "q208_gini" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("grupo"),
        col("o_totalprice").as("valor"))
      ordered(operators.Stats.giniIndex(o, Seq("grupo"), "valor",
        scale = 2))
    },

    // CUPED variance-reduced readout of a deterministic pseudo-
    // experiment: units = customers, y = 1996+ spend, x = pre-1996
    // spend (both exact decimal folds per unit), arms = custkey parity,
    // grouped per market segment; theta/x-bar fit arm-blind.
    "q209_cuped" -> { (s, dir) =>
      val post = sum(when(col("o_orderdate") >= "1996-01-01",
          col("o_totalprice").cast("decimal(38,6)"))
        .otherwise(lit(0).cast("decimal(38,6)")))
      val pre = sum(when(col("o_orderdate") < "1996-01-01",
          col("o_totalprice").cast("decimal(38,6)"))
        .otherwise(lit(0).cast("decimal(38,6)")))
      val perCust = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("id"))
        .agg(post.cast("double").as("y"), pre.cast("double").as("x"))
      val units = perCust.join(
        Tables.customer(s, dir).select(col("c_custkey").as("id"),
          col("c_mktsegment").as("segmento")), Seq("id"))
        .withColumn("braco", col("id") % 2)
      ordered(operators.Stats.cupedAdjust(
        units, Seq("segmento"), "braco", "y", "x"))
    },

    // Product-quantization ANN through the FULL IVFADC composition —
    // the architecture that ships at scale: IVF cells bound the scan
    // set, PQ codes bound per-vector cost, ADC shortlist, exact refine
    // (rows-only: ADC is approximate by construction; SimilaritySpec
    // pins recall 0.44 raw / 0.96 refined / 0.76 IVFADC vs exact L2
    // and code determinism).
    "q206_pq_ann" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") % 200 === 0)
      val model = llm.Pq.fit(emb, "vec_id", "embedding", m = 8, k = 16,
        samplePct = 30)
      val idx = llm.Ivf.index(emb, "vec_id", "embedding", nCells = 16,
        samplePct = 30)
      ordered(llm.Pq.ivfAdcTopK(
        idx, model, llm.Pq.encode(emb, "vec_id", "embedding", model),
        emb, q, "vec_id", "embedding", k = 10, nProbe = 6,
        shortlist = 100))
    },

    // Exact per-day precision-recall curve of the same purchase-vs-rest
    // ranking as q182: one row per distinct value threshold, integer
    // tp/fp/fn cumulatives over the value-collapsed table, each ratio a
    // single IEEE division (f1 via 2tp/(2tp+fp+fn)).
    "q187_pr_curve" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(
        to_date(col("ts")).as("dia"), col("value"),
        (col("event_type") === "purchase").as("compra"))
      ordered(operators.Stats.prCurve(ev, Seq("dia"), "value", "compra"))
    },

    // Fellegi–Sunter probabilistic linkage: supervised m/u weights from
    // labeled pairs (planted variants = matches, distant-id pairs =
    // non-matches), then the three-way log-likelihood-ratio decision.
    // Candidates come from the NATION-STRATIFIED FastSS deletion-
    // neighborhood join (the q142 cure, r11 VERDICT #1): the complete
    // same-nation Levenshtein ≤ 2 pair set — a theorem-bounded filter
    // whose candidate volume tracks true near-name density (LINEAR in
    // the corpus: each id has a bounded digit-neighborhood), where the
    // old fixed suffix-3 key saturated block² (measured ×188 candidates
    // at ×10 data). The name agreement falls out of the join for free
    // (nome_igual = dist ≤ 1 — the planted one-deletion variants agree,
    // two-edit digit neighbors disagree); the balance-band field is
    // mangled on a third of the variants.
    "q186_fellegi_sunter" -> { (s, dir) =>
      val c = Tables.customer(s, dir).select(
        col("c_custkey").as("id"), lower(trim(col("c_name"))).as("nome"),
        col("c_nationkey").as("nacao"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("faixa"),
        col("c_mktsegment").as("seg"))
      val v = c.filter(col("id") % 7 === 0).select(
        (col("id") + 10000000L).as("id"),
        concat(substring(col("nome"), 1, 12),
          substring(col("nome"), 14, 100000)).as("nome"),
        col("nacao"),
        when(col("id") % 3 === 0, lit(-1L)).otherwise(col("faixa"))
          .as("faixa"),
        col("seg"))
      def side(df: DataFrame, sfx: String) = df.select(
        col("id").as(s"id_$sfx"), col("nome").as(s"nome_$sfx"),
        col("faixa").as(s"faixa_$sfx"), col("seg").as(s"seg_$sfx"))
      def agreed(p: DataFrame) = p.select(
        col("id_a"), col("id_b"),
        (levenshtein(col("nome_a"), col("nome_b")) <= 1).as("nome_igual"),
        (col("faixa_a") === col("faixa_b")).as("faixa_igual"),
        (col("seg_a") === col("seg_b")).as("seg_igual"))
      val matches = agreed(side(c, "a").join(side(v, "b"),
          col("id_b") === col("id_a") + 10000000L))
        .withColumn("eh_par", lit(true))
      val nonMatches = agreed(side(c, "a").join(side(c, "b"),
          col("id_b") === col("id_a") + 11111L))
        .withColumn("eh_par", lit(false))
      val all = c.unionByName(v)
      val attrs = all.select("id", "faixa", "seg")
      val cands = operators.Linkage.editJoinDeletesOn(
          all, "id", "nome", "nacao", maxDist = 2)
        .join(attrs.select(col("id").as("id_a"),
          col("faixa").as("faixa_a"), col("seg").as("seg_a")), "id_a")
        .join(attrs.select(col("id").as("id_b"),
          col("faixa").as("faixa_b"), col("seg").as("seg_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("dist") <= 1L).as("nome_igual"),
          (col("faixa_a") === col("faixa_b")).as("faixa_igual"),
          (col("seg_a") === col("seg_b")).as("seg_igual"))
      ordered(operators.Linkage.fellegiSunterScore(
          cands, matches.unionByName(nonMatches),
          Seq("nome_igual", "faixa_igual", "seg_igual"), "eh_par",
          upper = 1.0, lower = -1.0)
        .select("id_a", "id_b", "nome_igual", "faixa_igual", "seg_igual",
          "pontuacao", "classificacao"))
    },

    // Kaplan–Meier time-to-conversion: signup→first-purchase durations
    // per user, right-censored at the corpus horizon, cohorted by
    // signup week. Survival accumulates per-factor lns in
    // DECIMAL(38,18) over the collapsed duration table.
    "q185_kaplan_meier" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val t0 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("__t0"))
      val tp = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id"))
        .filter(col("ts") >= col("__t0"))
        .groupBy("user_id").agg(min(col("ts")).as("__tp"))
      val horizon = ev.agg(max(col("ts")).as("__hz"))
      val subjects = t0.join(tp, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          to_date(date_trunc("WEEK", col("__t0"))).as("coorte"),
          datediff(to_date(coalesce(col("__tp"), col("__hz"))),
            to_date(col("__t0"))).cast("long").as("dur"),
          col("__tp").isNotNull.as("converteu"))
      ordered(operators.Timeseries.kaplanMeier(
        subjects, Seq("coorte"), "dur", "converteu"))
    },

    // Exact per-day ROC-AUC of "does event value rank purchases above
    // other events": the Mann–Whitney form over value-collapsed score
    // counts — U₂ accumulates in exact longs (ties at half credit stay
    // integral), ONE IEEE division per group. Closes the classifier
    // loop (train q123, apply q109, calibrate q134, EVALUATE here).
    "q182_roc_auc" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select(
        to_date(col("ts")).as("dia"), col("value"),
        (col("event_type") === "purchase").as("compra"))
      ordered(operators.Stats.rocAuc(ev, Seq("dia"), "value", "compra"))
    },

    // Driver-hash CANARY, core types: literal rows of every output type
    // the engine's report queries rely on (BIGINT/INT/SMALLINT/DOUBLE/
    // VARCHAR/DATE/TIMESTAMP/BOOLEAN, plus nulls in the two types green
    // queries already emit nulls for). If the correctness gate's hash
    // has a representation blind spot, this isolates it in one tiny
    // deterministic row set instead of a debug cycle per real query.
    "q179_canary_core" -> { (s, _) =>
      ordered(s.sql(
        """SELECT * FROM VALUES
          |  (CAST(1 AS BIGINT), CAST(2 AS INT), CAST(3 AS SMALLINT),
          |   CAST(1.5 AS DOUBLE), 'alfa', DATE'2024-01-15',
          |   TIMESTAMP'2024-01-15 12:34:56', true),
          |  (CAST(-4611686018427387904 AS BIGINT), CAST(-2147483647 AS INT),
          |   CAST(-32767 AS SMALLINT), CAST(-0.125 AS DOUBLE), '',
          |   DATE'1970-01-01', TIMESTAMP'1970-01-01 00:00:00', false),
          |  (CAST(7 AS BIGINT), CAST(8 AS INT), CAST(9 AS SMALLINT),
          |   CAST(NULL AS DOUBLE), CAST(NULL AS STRING), DATE'2030-12-31',
          |   TIMESTAMP'1999-12-31 23:59:59', true)
          |AS t(c_bigint, c_int, c_smallint, c_double, c_varchar, c_date,
          |     c_ts, c_bool)""".stripMargin))
    },

    // The decimal canary (ex-q180) RAN its experiment in round 10 and is
    // retired: the driver's gate marked it hash_match:false with
    // rows+schema green, CONFIRMING that DECIMAL output columns are
    // unhashable in the gate (pyarrow Decimal objects vs DuckDB float64).
    // The literal matrix now lives in OperatorSpec ("decimal canary"),
    // and the engine-wide rule — report queries emit only BIGINT/DOUBLE/
    // VARCHAR/DATE/TIMESTAMP/BOOLEAN — is recorded in SURVEY §3.
    // q179 stays as the standing green sentinel for the safe type set.

    // Trend-adjusted robust anomalies: q137's OLS fit + q168's
    // median/MAD outliers composed — residuals from each priority
    // class's price trend, robustly flagged. Drift cannot fool it; a
    // wild value cannot drag it.
    "q175_trend_anomalies" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(pmod(col("o_orderkey"), lit(50)) === 0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          datediff(col("o_orderdate").cast("date"),
            lit("1992-01-01").cast("date")).cast("double").as("x"),
          col("o_totalprice").as("y"))
      ordered(operators.Stats.trendAnomalies(
        o, Seq("o_orderpriority"), "x", "y", c = 2.5))
    },

    // Benford first-digit audit over order totals: first significant
    // digit from the value's string image (never a libm log), expected
    // shares as literal constants, one combinable count — the
    // fabricated-figures screen auditors run on financial columns.
    "q174_benford" -> { (s, dir) =>
      ordered(operators.Stats.benfordAudit(
        Tables.orders(s, dir), "o_totalprice"))
    },

    // Most-common opening paths: each user's first 3 events (bounded
    // heap, never a history sort) joined into a path string, top-10 by
    // user count with deterministic ties.
    "q173_common_paths" -> { (s, dir) =>
      ordered(streaming.Events.commonPaths(
        Tables.events(s, dir), steps = 3, topN = 10))
    },

    // Quantile binning fit/apply: exact equal-population bucket edges at
    // integer ranks (no interpolated floats), edges broadcast back,
    // edge-valued rows fall in the LOWER bin by the strict-below count.
    "q170_quantile_binning" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      val edges = operators.Stats.quantileBinFit(o, "o_totalprice", k = 4)
      ordered(operators.Stats.quantileBinApply(o, edges, "o_totalprice"))
    },

    // Frequency encoding with rare-category collapse: brands under the
    // support floor fold into __outros__ at FIT time (unseen categories
    // land there at apply time too — the leakage-safe default); apply is
    // one broadcast left join.
    "q171_freq_encoding" -> { (s, dir) =>
      val p = Tables.part(s, dir).select("p_partkey", "p_brand")
      val model = operators.Stats.freqEncodeFit(p, "p_brand", minCount = 70L)
      ordered(operators.Stats.freqEncodeApply(p, model, "p_brand"))
    },

    // Leave-one-out target encoding: per-category DECIMAL label sums,
    // each row's own label subtracted before the single IEEE division —
    // the leakage term removed exactly, singletons null.
    "q172_loo_target" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      ordered(operators.Stats.looTargetEncode(c, "c_mktsegment", "c_acctbal"))
    },

    // Distribution-drift report: orders before/after mid-1995 as the
    // base/current snapshots, bucketed by priority — exact counts,
    // exact-product drift ratios, per-bucket chi-square contributions
    // (no cross-bucket double sum: per-bucket IS the alarm).
    "q167_drift_report" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val cut = lit("1995-06-17 00:00:00").cast("timestamp_ntz")
      ordered(operators.Stats.driftReport(
        o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        "o_orderpriority"))
    },

    // Robust per-group outliers via median/MAD (the heavy-tail-safe
    // twin of q150): two exact lower-median passes, medians broadcast
    // back, flags a fixed IEEE chain. Restricted to one order's-worth
    // of groups via pmod to keep output bounded.
    "q168_mad_outliers" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .filter(pmod(col("l_orderkey"), lit(100)) === 0)
        .select("l_orderkey", "l_linenumber", "l_returnflag",
          "l_extendedprice")
      ordered(operators.Stats.madOutliers(
        li, Seq("l_returnflag"), "l_extendedprice", c = 2.0))
    },

    // Recency-weighted engagement: per-user decayed activity score at a
    // reference day, halving per elapsed week — every term an exact
    // scaled-integer product (value is 2-dp fixed-point, the weight is
    // the integer 2^(18-wk)), summed in BIGINT, ONE final IEEE division
    // so the report column is a plain driver-hashable DOUBLE. One
    // combinable aggregation.
    "q164_decayed_engagement" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dia"), col("value"))
      ordered(operators.Timeseries.decayedScoreScaled(
        ev, "user_id", "dia", "value", refDay = "2024-02-01",
        valueScale = 2))
    },

    // First-order event transition matrix (the Markov what-happens-after
    // table): one per-user lead window, one combinable pair count, row
    // totals broadcast back, each probability one IEEE division of
    // exact longs.
    "q165_transitions" -> { (s, dir) =>
      ordered(streaming.Events.transitionMatrix(Tables.events(s, dir)))
    },

    // Feature scaling as offline-fit/online-apply (the train/serve-skew
    // guard): per-column sufficient statistics in ONE pass, model
    // broadcast back, z-score and min-max features each two
    // correctly-rounded IEEE ops. Degenerate columns scale to null.
    "q166_feature_scaling" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      val model = operators.Stats.scalerFit(
        li, Seq("l_quantity", "l_extendedprice"))
      ordered(operators.Stats.scalerApply(
        li, model, Seq("l_quantity", "l_extendedprice")))
    },

    // Pre-join skew/cost diagnostics: per-side key counts, hottest keys
    // (per-partition heaps, no global sort) and the EXACT join output
    // cardinality sum(c_l*c_r) — the report the q146 wedge join should
    // be sized from before it runs. Diagnoses the lineitem×lineitem
    // self-join on l_partkey (the co-purchase pair volume).
    "q163_join_diagnostics" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      ordered(operators.Profile.joinDiagnostics(
        li, li, "l_partkey", "l_partkey", topK = 5))
    },

    // Exact per-group weighted median: smallest value whose DECIMAL
    // cumulative weight reaches half the group total — equal values
    // collapse before the window so the per-group sort runs on the
    // reduced table, and the halfway test is pure DECIMAL (no division,
    // no doubles).
    "q162_weighted_median" -> { (s, dir) =>
      ordered(operators.Stats.weightedMedian(
        Tables.lineitem(s, dir), Seq("l_returnflag"), "l_extendedprice",
        "l_quantity"))
    },

    // k-core decomposition of the supplier co-supply graph: iterative
    // peeling to the exact fixpoint (cascades included) — one degree
    // aggregation + two semi-joins per round. Not SQL-expressible
    // (non-monotone fixpoint) -> rows-only; KCore spec pins cascades
    // and K4-with-pendants by hand.
    "q161_kcore" -> { (s, dir) =>
      // parts co-purchased within an order: sparse enough (degrees
      // 42-206 at sf0.01) that k=82 peels a quarter of the graph with
      // real cascades while the core survives (the collapse threshold
      // sits at ~84 - quasi-random graphs die sharply)
      val ps = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = ps.select(col("o"), col("p").as("p1"))
        .join(ps.select(col("o"), col("p").as("p2")), Seq("o"))
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("src"), col("p2").as("dst")).distinct()
      ordered(llm.Components.kCore(edges, "src", "dst", k = 82))
    },

    // First/last-touch conversion attribution: one user-keyed interval
    // join (lookback-bounded, per-user pair space) + one combinable
    // struct-min/max aggregation per conversion — no per-conversion
    // window sort. Unattributed conversions kept with null credit.
    "q159_attribution" -> { (s, dir) =>
      ordered(streaming.Events.attribution(
        Tables.events(s, dir), convType = "purchase",
        touchTypes = Seq("view", "click"), lookback = "2 days"))
    },

    // Exact rolling active users (DAU + trailing-7-day window): distinct
    // counts don't decompose over sliding windows, so activity dedups to
    // (user, day) first, then each deduped row fans out to the 7 window
    // ends it feeds — constant fan-out of the DEDUPED volume, two
    // combinable distinct counts, no window sort.
    "q160_active_users" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("dia"))
      ordered(operators.Timeseries.rollingActive(ev, "user_id", "dia",
        window = 7))
    },

    // SCD2 point-in-time lookup: which dimension version was true when
    // the fact happened — ONE native as-of pass (history keyed on
    // valid_from), then already-expired matches nulled so history gaps
    // yield nulls instead of stale versions. Customers %10==0 have no
    // second version: their post-1995 orders exercise the gap path.
    "q158_scd2_lookup" -> { (s, dir) =>
      val cust = Tables.customer(s, dir)
      // o_orderdate reads as TIMESTAMP_NTZ from parquet; the synthetic
      // versions match that type so the as-of sides agree
      val v1 = cust.select(col("c_custkey"),
        concat(lit("OLD:"), col("c_mktsegment")).as("segmento"),
        lit("1992-01-01 00:00:00").cast("timestamp_ntz").as("valid_from"),
        lit("1995-06-17 00:00:00").cast("timestamp_ntz").as("valid_to"))
      val v2 = cust.filter(pmod(col("c_custkey"), lit(10)) =!= 0)
        .select(col("c_custkey"), col("c_mktsegment").as("segmento"),
          lit("1995-06-17 00:00:00").cast("timestamp_ntz").as("valid_from"),
          lit(null).cast("timestamp_ntz").as("valid_to"))
      val facts = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate"))
      ordered(operators.Scd.scd2Lookup(
        facts, v1.unionByName(v2), Seq("c_custkey"), "o_orderdate",
        Seq("segmento")))
    },

    // Changelog extraction (q98's inverse): two full snapshots reduce
    // through multiset exceptAll FIRST, so the insert/delete/update
    // classification join runs at churn volume, never table volume —
    // the "generate a change feed from full reloads" path full-dump
    // sources (the reference's FTP extracts) need.
    "q157_cdc_extract" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val oldSnap = base.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      val newSnap = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .withColumn("o_totalprice",
          when(pmod(col("o_orderkey"), lit(3)) === 0,
            col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
      ordered(operators.Cdc.extractChangelog(
        oldSnap, newSnap, Seq("o_orderkey")))
    },

    // Exact phrase search over positional postings: a k-term phrase
    // matches at position p iff term_i sits at p+i for all i — one
    // broadcast of the exploded phrase terms onto the positional
    // posting scan, one combinable per-(doc, phrase, start) count
    // equal to the phrase length, one count per (phrase, doc). The
    // primitive the term-bag rankers (q99/q131) cannot express.
    "q156_phrase_search" -> { (s, dir) =>
      import s.implicits._
      val phrases = Seq("hash join", "table scan", "sort merge", "the row")
        .toDF("frase")
      ordered(llm.Retrieval.phraseSearch(
        Tables.documents(s, dir), "doc_id", "text", phrases, "frase"))
    },

    // Declarative data-contract validation (the reference's validar_pa
    // generalized to a dbt-test-style suite): all row-local checks fold
    // into ONE conditional-count scan, uniqueness is one combinable
    // groupBy, referential integrity one broadcast left-join pass
    // counting probes and misses together. One report row per check.
    "q155_expectations" -> { (s, dir) =>
      import operators.Expectations._
      ordered(operators.Expectations.validate(Tables.orders(s, dir), Seq(
        NotNull("o_custkey"),
        Accepted("o_orderstatus", Seq("F", "O")),
        InRange("o_totalprice", 1000.0, 300000.0),
        Unique(Seq("o_orderkey")),
        RefIntegrity("o_custkey", Tables.customer(s, dir), "c_custkey"))))
    },

    // Vocabulary-coverage / OOV audit: the tokenizer-fit sanity pass —
    // vocab = the distinct tokens of the 'en' slice (the fit corpus),
    // every other doc audited for out-of-vocabulary rate via one
    // broadcast probe + one combinable aggregation. Runs the single
    // unified vocabCoverage form (token + type OOV, null rate on
    // empty docs) q196 also uses.
    "q126_vocab_coverage" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val vocab = docs.filter(col("lang") === "en")
        .select(explode(llm.TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "").distinct()
      ordered(llm.TextAnalysis.vocabCoverage(
        docs.filter(col("lang") =!= "en"), "doc_id", "text",
        vocab, "token"))
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "q08_predicate_filter" ->
      """SELECT * FROM orders
        |WHERE o_orderpriority LIKE '1%'
        |   OR regexp_matches(o_orderpriority, '^3-ME')
        |   OR o_orderstatus IN ('P')
        |   OR (o_orderpriority = '5-LOW' AND o_orderstatus = 'F')
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q09_semijoin_filter" ->
      """SELECT * FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |   OR l_partkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q07_depara_rename" ->
      """SELECT l_orderkey AS pedido_id, l_partkey AS item_id,
        |  l_suppkey AS fornecedor_id, l_linenumber AS linha_numero,
        |  l_quantity AS quantidade_apresentada,
        |  l_extendedprice AS valor_apresentado, l_discount AS desconto,
        |  l_tax AS imposto, l_returnflag AS devolucao_status,
        |  l_linestatus AS linha_status, l_shipdate AS envio_data
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,

    "q10_aaaamm_parse" ->
      """SELECT o_orderkey, competencia_aaaamm,
        |  try_strptime(competencia_aaaamm, '%Y%m') AS competencia_data
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'BAD999'
        |         WHEN o_orderkey % 13 = 0 THEN ''
        |         ELSE strftime(o_orderdate, '%Y%m') END AS competencia_aaaamm
        |  FROM orders)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q11_aaaammdd_parse" ->
      """SELECT l_orderkey, l_linenumber, data_aaaammdd,
        |  try_strptime(
        |    lpad(trim(substr(data_aaaammdd, 1, 4)), 4, '0') ||
        |    lpad(trim(substr(data_aaaammdd, 5, 2)), 2, '0') ||
        |    lpad(trim(substr(data_aaaammdd, 7, 2)), 2, '0'),
        |    '%Y%m%d') AS data_parseada
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 17 = 0 THEN 'ABCDEFGH'
        |         WHEN l_orderkey % 3 = 0 AND substr(s8, 7, 1) = '0'
        |           THEN substr(s8, 1, 6) || ' ' || substr(s8, 8, 1)
        |         ELSE s8 END AS data_aaaammdd
        |  FROM (SELECT *, strftime(l_shipdate, '%Y%m%d') AS s8 FROM lineitem))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q12_null_rules" ->
      """SELECT o_orderkey,
        |  CASE WHEN codigo_a = '' THEN NULL ELSE codigo_a END AS codigo_a,
        |  CASE WHEN regexp_matches(codigo_b, '^0*$') THEN NULL ELSE codigo_b END AS codigo_b,
        |  CASE WHEN regexp_matches(codigo_c, '^9+$') THEN NULL ELSE codigo_c END AS codigo_c,
        |  CASE WHEN usuario_idade = '999' THEN NULL ELSE usuario_idade END AS usuario_idade
        |FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE o_orderstatus END AS codigo_a,
        |    CASE WHEN o_orderkey % 4 = 0 THEN '0000'
        |         WHEN o_orderkey % 9 = 0 THEN ''
        |         ELSE CAST(o_custkey AS VARCHAR) END AS codigo_b,
        |    CASE WHEN o_orderkey % 6 = 0 THEN '999999'
        |         WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE lpad(CAST(o_custkey % 1000 AS VARCHAR), 6, '0') END AS codigo_c,
        |    CASE WHEN o_orderkey % 8 = 0 THEN '999'
        |         ELSE CAST(o_orderkey % 120 AS VARCHAR) END AS usuario_idade
        |  FROM orders)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q13_bool_coercion" ->
      """SELECT l_orderkey, l_linenumber, flag_bruta,
        |  CASE WHEN flag_bruta = '1' THEN true
        |       WHEN flag_bruta = '0' THEN false END AS obito,
        |  mantido_bruto,
        |  CASE WHEN mantido_bruto = 'M' THEN true ELSE false END AS estabelecimento_mantido
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 10 = 0 THEN '2'
        |         WHEN l_orderkey % 15 = 0 THEN NULL
        |         ELSE CAST(l_linenumber % 2 AS VARCHAR) END AS flag_bruta,
        |    CASE WHEN l_returnflag = 'R' THEN 'M' ELSE l_returnflag END AS mantido_bruto
        |  FROM lineitem)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q14_conditional_nullout" ->
      """SELECT l_orderkey, l_linenumber, desfecho_motivo,
        |  CASE WHEN desfecho_motivo IS NULL THEN NULL ELSE obito END AS obito,
        |  CASE WHEN desfecho_motivo IS NULL THEN NULL ELSE alta END AS alta
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END AS desfecho_motivo,
        |    l_linenumber % 2 = 0 AS obito,
        |    l_quantity > 25 AS alta
        |  FROM lineitem)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q15_string_slice" ->
      """SELECT p_partkey,
        |  substr(code, 1, 3) AS servico_id,
        |  substr(code, 4) AS servico_classificacao_id
        |FROM (
        |  SELECT p_partkey,
        |    lpad(CAST(p_partkey % 900 AS VARCHAR), 3, '0') ||
        |    lpad(CAST(p_size AS VARCHAR), 4, '0') AS code
        |  FROM part)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q16_roman_numeral" ->
      """SELECT n_nationkey,
        |  ['','X','XX','XXX'][((n_nationkey + 1) // 10) + 1] ||
        |  ['','I','II','III','IV','V','VI','VII','VIII','IX'][((n_nationkey + 1) % 10) + 1]
        |    AS regiao_romana,
        |  CAST(n_nationkey + 1 AS VARCHAR) AS regiao_numero,
        |  n_name AS nome_passthrough
        |FROM nation ORDER BY ALL NULLS FIRST""".stripMargin,

    "q17_surrogate_id" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  sha256(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS id
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,

    "q20_audit_constants" ->
      """SELECT n_nationkey, n_name,
        |  TIMESTAMP '2026-08-01 00:00:00' AS criacao_data,
        |  TIMESTAMP '2026-08-01 00:00:00' AS atualizacao_data,
        |  'PASP2408' AS ftp_arquivo_nome
        |FROM nation ORDER BY ALL NULLS FIRST""".stripMargin,

    "q23_schema_casts" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS user_id, event_type,
        |  CAST(CAST(value AS DECIMAL(18,3)) AS DOUBLE) AS valor,
        |  TRY_CAST(props AS INT) AS props_numerico,
        |  CAST(ts AS DATE) AS dia
        |FROM events ORDER BY ALL NULLS FIRST""".stripMargin,

    "q01_batch_ingest" ->
      """SELECT CAST(l_orderkey % 4 AS INT) AS lote, count(*) AS registros,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,3))) AS DOUBLE) AS quantidade_total
        |FROM lineitem GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q02_listing_parse" ->
      """SELECT o_orderkey, 'PA' AS tipo, uf AS sigla_uf,
        |  substr(yymm, 1, 2) AS ano, substr(yymm, 3, 2) AS mes,
        |  NULLIF(partic, '') AS particao,
        |  'PA' || uf || yymm AS nome,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS tamanho,
        |  make_timestamp(2000 + CAST(substr(yymm, 1, 2) AS INT),
        |    CAST(strftime(o_orderdate, '%m') AS INT),
        |    CAST(strftime(o_orderdate, '%d') AS INT), 9, 15, 0.0)
        |    AS timestamp_modificacao,
        |  try_strptime('20' || yymm, '%Y%m') AS processamento_periodo_data_inicio
        |FROM (
        |  SELECT o_orderkey, o_orderdate, o_totalprice,
        |    ['SP','BA','CE','MG','PR'][CAST(o_custkey % 5 AS INT) + 1] AS uf,
        |    strftime(o_orderdate, '%y%m') AS yymm,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 'b' ELSE '' END AS partic
        |  FROM orders)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q03_report_csv" ->
      """WITH f AS (
        |  SELECT min(o_orderkey) AS fs FROM orders WHERE o_orderkey % 100 = 99),
        |b AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey AS linha_numero,
        |  lpad(CAST(o_custkey % 999999 AS VARCHAR), 6, '0') AS "Ibge",
        |  CAST(lpad(CAST(cents // 100 AS VARCHAR), 9, '0') || '.' ||
        |       lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS DOUBLE)
        |    AS quantidade_aprovada
        |FROM b CROSS JOIN f
        |WHERE o_orderkey > 3 AND (fs IS NULL OR o_orderkey < fs)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q04_stage_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS pedidos,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS valor_total,
        |  max(o_orderdate) AS ultima_data
        |FROM orders GROUP BY o_orderstatus ORDER BY ALL NULLS FIRST""".stripMargin,

    "q05_bulk_load" ->
      """SELECT CAST(o_orderkey % 8 AS INT) AS chunk, count(*) AS registros,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS valor_total
        |FROM orders GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q06_upsert" ->
      """SELECT * FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q18_period_range_join" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, p.periodo_codigo
        |FROM lineitem l LEFT JOIN (
        |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS data_inicio,
        |    strftime(date_trunc('month', o_orderdate), '%Y%m') AS periodo_codigo
        |  FROM orders) p
        |ON CAST(date_trunc('month', l_shipdate) AS DATE) = p.data_inicio
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q44_bucketed_range_join" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, p.periodo_codigo
        |FROM lineitem l LEFT JOIN (
        |  SELECT DISTINCT
        |    CAST(date_trunc('month', o_orderdate) AS DATE) + 14 AS data_inicio,
        |    CAST(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS DATE) + 13
        |      AS data_fim,
        |    strftime(CAST(date_trunc('month', o_orderdate) AS DATE) + 14, '%Y%m%d')
        |      AS periodo_codigo
        |  FROM orders) p
        |ON CAST(l_shipdate AS DATE) >= p.data_inicio
        |  AND CAST(l_shipdate AS DATE) <= p.data_fim
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q19_geo_equi_join" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  n_name AS unidade_geografica_nome,
        |  sha256(concat_ws('|', 'geo', n_nationkey)) AS unidade_geografica_id
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q21_batch_union" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |  l_quantity AS quantidade_apresentada,
        |  l_extendedprice AS valor_apresentado,
        |  l_discount, l_tax, l_returnflag, l_linestatus,
        |  l_shipdate AS realizacao_data,
        |  sha256(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS id,
        |  TIMESTAMP '2026-08-01 00:00:00' AS criacao_data,
        |  'PASP24' || lpad(CAST(l_orderkey % 3 AS VARCHAR), 2, '0') AS ftp_arquivo_nome
        |FROM lineitem
        |WHERE (l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |    OR l_partkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0))
        |  AND (l_returnflag = 'R' OR (l_linestatus = 'O' AND l_quantity > 40))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q22_metadata_rollup" ->
      """WITH t AS (
        |  SELECT l.*, CAST(l_orderkey % 10 AS INT) AS grupo,
        |    CAST(l_linenumber AS VARCHAR) AS particao
        |  FROM lineitem l
        |  JOIN (SELECT l_returnflag AS rf,
        |          CAST(date_trunc('month', max(l_shipdate)) AS DATE)
        |            - INTERVAL 13 MONTH AS cutoff
        |        FROM lineitem GROUP BY 1) c
        |    ON l.l_returnflag = c.rf AND CAST(l.l_shipdate AS DATE) >= c.cutoff)
        |SELECT l_returnflag, l_linestatus, grupo,
        |  string_agg(particao, ',' ORDER BY particao) AS particoes,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,3))) AS DOUBLE) AS tamanho_total,
        |  max(l_shipdate) AS ts_max, min(l_shipdate) AS ts_min,
        |  count(*) AS num_particoes
        |FROM t GROUP BY 1, 2, 3 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q25_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT * FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 3 = 0),
        |k AS (SELECT text, min(doc_id) AS keep FROM all_docs GROUP BY text)
        |SELECT a.* FROM all_docs a
        |JOIN k ON a.text = k.text AND a.doc_id = k.keep
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Full portable-MinHash pipeline replayed in DuckDB: same md5 hash
    // family h_s = (h1 + s·h2) mod 4294967291, same 5×4 banding (bhash =
    // the comma-joined signature slice), same exact-Jaccard verify. Every
    // intermediate stays < 2^37, so BIGINT arithmetic is exact on both
    // engines.
    "q26_minhash_lsh" -> {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0) s"SELECT id, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id,
        |    $mins
        |  FROM shrows GROUP BY id),
        |buckets AS (
        |  $bands),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT p.id_a, p.id_b,
        |    CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE) /
        |    (CAST(len(ka.sh) AS DOUBLE) + CAST(len(kb.sh) AS DOUBLE)
        |     - CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE)) AS jaccard
        |  FROM pairs p JOIN k ka ON p.id_a = ka.id JOIN k kb ON p.id_b = kb.id)
        |WHERE jaccard >= 0.5
        |ORDER BY ALL NULLS FIRST""".stripMargin
    },

    // Portable SimHash replayed in DuckDB: 4×16-bit md5 chunks, 64 signed
    // bit-sums per doc, chunk values as both signature and blocking key,
    // Hamming ≤ 3 verify over the 4-way chunk XOR.
    "q27_simhash" -> {
      val bitsums = (for (j <- 0 until 4; b <- 0 until 16) yield
        s"sum(CASE WHEN (c$j & ${1 << b}) != 0 THEN 1 ELSE -1 END) AS s${j}_$b")
        .mkString(",\n|    ")
      val chunkVals = (0 until 4).map { j =>
        (0 until 16).map(b =>
          s"CASE WHEN s${j}_$b > 0 THEN ${1 << b} ELSE 0 END").mkString("(", " + ", s") AS v$j")
      }.mkString(",\n|    ")
      val hamming = (0 until 4).map(j =>
        s"bit_count(xor(CAST(a.v$j AS BIGINT), CAST(b.v$j AS BIGINT)))").mkString(" +\n|         ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |tokrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 4)) AS INT) AS c0,
        |             CAST(('0x' || substring(m, 5, 4)) AS INT) AS c1,
        |             CAST(('0x' || substring(m, 9, 4)) AS INT) AS c2,
        |             CAST(('0x' || substring(m, 13, 4)) AS INT) AS c3
        |  FROM (SELECT doc_id AS id,
        |          md5(unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+')))) AS m
        |        FROM all_docs)),
        |bitsums AS (
        |  SELECT id,
        |    $bitsums
        |  FROM tokrows GROUP BY id),
        |sigs AS (
        |  SELECT id,
        |    $chunkVals
        |  FROM bitsums),
        |chunked AS (
        |  SELECT id, v0, v1, v2, v3, 0 AS band, v0 AS bhash FROM sigs
        |  UNION ALL SELECT id, v0, v1, v2, v3, 1, v1 FROM sigs
        |  UNION ALL SELECT id, v0, v1, v2, v3, 2, v2 FROM sigs
        |  UNION ALL SELECT id, v0, v1, v2, v3, 3, v3 FROM sigs)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    CAST($hamming AS INTEGER) AS hamming
        |  FROM chunked a JOIN chunked b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id)
        |WHERE hamming <= 3
        |ORDER BY ALL NULLS FIRST""".stripMargin
    },

    "q28_ngram_jaccard" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' zz9'
        |  FROM documents WHERE doc_id % 7 = 0),
        |t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT doc_id,
        |    array_to_string(tk[1:2], ' ') AS block,
        |    list_distinct(CASE WHEN len(tk) >= 3
        |      THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
        |      ELSE [] END) AS sh
        |  FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) /
        |  (CAST(len(a.sh) AS DOUBLE) + CAST(len(b.sh) AS DOUBLE)
        |   - CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE))
        |    AS jaccard
        |FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
        |WHERE len(a.sh) > 0 AND len(b.sh) > 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q31_lang_id" ->
      """SELECT doc_id,
        |  len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))) AS score_en,
        |  len(list_filter(tk, t -> t IN ('data','value','batch','row'))) AS score_pt,
        |  len(list_filter(tk, t -> t IN ('query','scan','merge'))) AS score_es,
        |  CASE
        |    WHEN len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))) >= greatest(
        |        len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))),
        |        len(list_filter(tk, t -> t IN ('data','value','batch','row'))),
        |        len(list_filter(tk, t -> t IN ('query','scan','merge'))))
        |      AND len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))) > 0
        |      THEN 'en'
        |    WHEN len(list_filter(tk, t -> t IN ('data','value','batch','row'))) >= greatest(
        |        len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))),
        |        len(list_filter(tk, t -> t IN ('data','value','batch','row'))),
        |        len(list_filter(tk, t -> t IN ('query','scan','merge'))))
        |      AND len(list_filter(tk, t -> t IN ('data','value','batch','row'))) > 0
        |      THEN 'pt'
        |    WHEN len(list_filter(tk, t -> t IN ('query','scan','merge'))) >= greatest(
        |        len(list_filter(tk, t -> t IN ('the','a','fast','slow','small'))),
        |        len(list_filter(tk, t -> t IN ('data','value','batch','row'))),
        |        len(list_filter(tk, t -> t IN ('query','scan','merge'))))
        |      AND len(list_filter(tk, t -> t IN ('query','scan','merge'))) > 0
        |      THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |      FROM documents)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q32_quality_score" ->
      """SELECT doc_id,
        |  0.4 * (CAST(len(list_filter(tk, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |         / greatest(CAST(len(tk) AS DOUBLE), 1.0)) +
        |  0.3 * least(1.0,
        |    (CAST(list_aggregate(list_transform(tk, t -> len(t)), 'sum') AS DOUBLE)
        |     / greatest(CAST(len(tk) AS DOUBLE), 1.0)) / 8.0) -
        |  0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0)) -
        |  0.1 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0))
        |    AS qualidade
        |FROM (SELECT doc_id, text,
        |        string_split_regex(trim(lower(text)), '\s+') AS tk
        |      FROM documents)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q33_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS tokens_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |    AS tokens_bpe,
        |  CAST(ceil(CAST(len(text) AS DOUBLE) / 4.0) AS BIGINT) AS tokens_est
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    "q34_fingerprint" ->
      """SELECT doc_id,
        |  list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS impressao_digital,
        |  len(list_distinct(sh)) AS n_shingles
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN len(tk) >= 3
        |      THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
        |      ELSE [] END AS sh
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |        FROM documents))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q29_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 32) q
        |  CROSS JOIN embeddings c),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.vec_id
        |  JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 10 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q35_multimodal_meta" ->
      """SELECT doc_id, lang,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
        |  sha256(text) AS conteudo_sha256
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    "q36_windowed_agg" ->
      """SELECT date_trunc('hour', ts) AS janela_inicio,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS janela_fim,
        |  event_type, count(*) AS eventos,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS valor_total
        |FROM events GROUP BY 1, 2, 3 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q37_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS novo
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |    CAST(sum(novo) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sessao
        |    , ts
        |  FROM e)
        |SELECT user_id, sessao, count(*) AS eventos,
        |  min(ts) AS inicio, max(ts) AS fim
        |FROM s GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q38_embedding_dedup" ->
      """WITH all_e AS (
        |  SELECT vec_id, label, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, label, list_transform(embedding, x -> x + x)
        |  FROM embeddings WHERE vec_id % 5 = 0),
        |n AS (
        |  SELECT vec_id,
        |    sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)) AS nrm
        |  FROM all_e),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
        |    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM all_e a JOIN all_e b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, label, cosine FROM (
        |  SELECT id_a, id_b, label, p.dot / (na.nrm * nb.nrm) AS cosine
        |  FROM p JOIN n na ON p.id_a = na.vec_id JOIN n nb ON p.id_b = nb.vec_id)
        |WHERE cosine >= 0.99 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q39_ingest_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q40_stale_detect" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS item_id, o_orderdate AS ts_producao,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |         WHEN o_orderkey % 5 = 0 THEN o_orderdate - INTERVAL 2 DAY
        |         ELSE o_orderdate + INTERVAL 1 DAY END AS ts_consumo
        |  FROM orders)
        |WHERE ts_consumo IS NULL OR ts_producao > ts_consumo
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q41_melt_report" ->
      """WITH wide AS (
        |  SELECT o_orderkey AS municipio_linha,
        |    lpad(CAST(o_custkey % 999999 AS VARCHAR), 6, '0') AS "Ibge",
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE CAST(trunc(o_totalprice) AS BIGINT) END AS jan,
        |    o_custkey % 100 AS fev,
        |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |         ELSE o_orderkey % 50 END AS mar
        |  FROM orders),
        |long AS (
        |  SELECT municipio_linha, "Ibge", 'JAN/2026' AS competencia,
        |    CAST(coalesce(jan, 0) AS INT) AS quantidade_aprovada FROM wide
        |  UNION ALL
        |  SELECT municipio_linha, "Ibge", 'FEV/2026',
        |    CAST(coalesce(fev, 0) AS INT) FROM wide
        |  UNION ALL
        |  SELECT municipio_linha, "Ibge", 'MAR/2026',
        |    CAST(coalesce(mar, 0) AS INT) FROM wide)
        |SELECT *,
        |  make_date(CAST(substr(competencia, 5, 4) AS INT),
        |    CASE substr(competencia, 1, 3)
        |      WHEN 'JAN' THEN 1 WHEN 'FEV' THEN 2 WHEN 'MAR' THEN 3
        |      WHEN 'ABR' THEN 4 WHEN 'MAI' THEN 5 WHEN 'JUN' THEN 6
        |      WHEN 'JUL' THEN 7 WHEN 'AGO' THEN 8 WHEN 'SET' THEN 9
        |      WHEN 'OUT' THEN 10 WHEN 'NOV' THEN 11 WHEN 'DEZ' THEN 12 END,
        |    1) AS periodo_data_inicio
        |FROM long ORDER BY ALL NULLS FIRST""".stripMargin,

    "q43_full_pipeline" ->
      """WITH active AS (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0),
        |base AS (
        |  SELECT l.*,
        |    CASE WHEN l_orderkey % 9 = 0 THEN ''
        |         ELSE lpad(CAST(l_partkey % 9999 AS VARCHAR), 7, '0') END AS codigo
        |  FROM lineitem l
        |  WHERE (l_suppkey IN (SELECT s_suppkey FROM active)
        |      OR l_partkey IN (SELECT s_suppkey FROM active))
        |    AND (l_returnflag = 'R' OR (l_linestatus = 'O' AND l_quantity > 45))),
        |geo AS (
        |  SELECT s_suppkey AS geo_suppkey, n_name AS unidade_geografica_nome
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        |periods AS (
        |  SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS data_inicio,
        |    strftime(date_trunc('month', o_orderdate), '%Y%m') AS periodo_codigo
        |  FROM orders)
        |SELECT
        |  sha256(concat_ws('|', l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS id,
        |  l_orderkey AS pedido_id, l_linenumber AS linha_numero,
        |  l_quantity AS quantidade_apresentada,
        |  l_extendedprice AS valor_apresentado,
        |  l_shipdate AS realizacao_data,
        |  try_strptime(strftime(l_shipdate, '%Y%m'), '%Y%m') AS competencia_data,
        |  NULLIF(codigo, '') AS condicao_codigo,
        |  CASE WHEN l_linenumber % 2 = 1 THEN true
        |       WHEN l_linenumber % 2 = 0 THEN false END AS obito,
        |  substr(codigo, 1, 3) AS servico_id,
        |  substr(codigo, 4) AS servico_classificacao_id,
        |  unidade_geografica_nome,
        |  p.periodo_codigo,
        |  TIMESTAMP '2026-08-01 00:00:00' AS criacao_data,
        |  'PASP2408' AS ftp_arquivo_nome
        |FROM base b
        |LEFT JOIN geo g ON b.l_suppkey = g.geo_suppkey
        |LEFT JOIN periods p
        |  ON CAST(date_trunc('month', b.l_shipdate) AS DATE) = p.data_inicio
        |WHERE l_quantity IS NOT NULL
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q24_validation_gates" ->
      """WITH base AS (
        |  SELECT *, CASE WHEN l_orderkey % 50 = 0 THEN NULL
        |                 ELSE l_returnflag END AS flag_opcional
        |  FROM lineitem),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN flag_opcional IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM base)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS coluna, n1 AS nulos, total FROM c
        |  UNION ALL SELECT 'l_shipdate', n2, total FROM c
        |  UNION ALL SELECT 'flag_opcional', n3, total FROM c)
        |WHERE nulos > 0 ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the ImageIO encode→decode round-trip from the source
    // columns: solid-color PNGs must decode to exactly the encoded
    // dimensions, 3 RGB components, and integer channel means.
    "q45_image_decode" ->
      """SELECT doc_id,
        |  CAST(1 + n_chars % 16 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 16 AS INT) AS larg_px,
        |  CAST(3 AS INT) AS canais,
        |  CAST(doc_id % 256 AS REAL) AS media_r,
        |  CAST((doc_id * 7) % 256 AS REAL) AS media_g,
        |  CAST(n_chars % 256 AS REAL) AS media_b,
        |  CAST((doc_id % 256 + (doc_id * 7) % 256 + n_chars % 256) / 3.0 AS REAL)
        |    AS media_luma
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    "q46_dbf_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) AS DOC_ID, lang AS LANG,
        |  source AS SOURCE, CAST(n_chars AS VARCHAR) AS N_CHARS
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    // session_window boundary semantics match q37's cumsum form: a new
    // session starts only when the gap EXCEEDS the threshold (verified
    // empirically — exactly-gap spacing merges).
    "q47_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS novo
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |    CAST(sum(novo) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sessao
        |    , ts
        |  FROM e)
        |SELECT user_id, eventos, inicio, fim FROM (
        |  SELECT user_id, sessao, count(*) AS eventos,
        |    min(ts) AS inicio, max(ts) AS fim
        |  FROM s GROUP BY 1, 2)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q48_seq_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tokens_est
        |  FROM documents),
        |o AS (
        |  SELECT lang, tokens_est,
        |    coalesce(sum(tokens_est) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM d)
        |SELECT lang, CAST(floor(off / 2048) AS BIGINT) AS bin,
        |  count(*) AS docs, CAST(sum(tokens_est) AS BIGINT) AS tokens,
        |  round(CAST(sum(tokens_est) AS DOUBLE) / 2048.0, 6) AS preenchimento
        |FROM o GROUP BY 1, 2 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q49_stratified_sample" ->
      """SELECT * FROM documents
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |  < CASE lang WHEN 'en' THEN 37 WHEN 'pt' THEN 81 ELSE 55 END
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the WAV encode→decode round-trip from the source columns: a
    // square wave at amplitude A has every |sample| = A, so peak and mean
    // absolute sample must both decode to exactly A, and the container
    // must yield exactly the encoded rate/channels/frame count.
    "q50_audio_decode" ->
      """SELECT doc_id,
        |  CAST((doc_id % 3 + 1) * 8000 AS INT) AS taxa_hz,
        |  CAST(doc_id % 2 + 1 AS INT) AS canais,
        |  CAST(16 AS INT) AS bits,
        |  CAST(n_chars % 100 + 50 AS BIGINT) AS n_amostras,
        |  CAST((doc_id * 13) % 30000 + 100 AS INT) AS pico,
        |  CAST((doc_id * 13) % 30000 + 100 AS DOUBLE) AS media_abs
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the AVI encode→sample round-trip: sampled frame indices are
    // 0,2,… below the frame count, dimensions echo the encode columns, and
    // frame f's solid color means are the base color shifted by f mod 256.
    "q51_video_frames" ->
      """SELECT d.doc_id,
        |  CAST(u.f AS INT) AS frame_indice,
        |  CAST(1 + n_chars % 8 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 8 AS INT) AS larg_px,
        |  CAST((doc_id % 256 + u.f) % 256 AS DOUBLE) AS media_r,
        |  CAST(((doc_id * 7) % 256 + u.f) % 256 AS DOUBLE) AS media_g,
        |  CAST((n_chars % 256 + u.f) % 256 AS DOUBLE) AS media_b
        |FROM documents d, LATERAL unnest(generate_series(0, CAST(doc_id % 10 AS INT), 2)) u(f)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Recomputes the duplicate clusters by brute-force transitive closure
    // (recursive CTE): cluster = min id reachable over the symmetric edge
    // set; edge-less order keys are their own singleton clusters.
    "q52_dup_clusters" ->
      """WITH RECURSIVE e AS (
        |  SELECT o_orderkey AS a, o_orderkey + 1 AS b FROM orders WHERE o_orderkey % 25 < 10
        |  UNION ALL
        |  SELECT o_orderkey, o_orderkey + 7 FROM orders WHERE o_orderkey % 25 = 3
        |  UNION ALL
        |  SELECT o_orderkey, o_orderkey + 25 FROM orders WHERE o_orderkey % 100 = 50),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(n, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a)
        |SELECT n AS doc_id, LEAST(n, MIN(r)) AS cluster_id FROM reach GROUP BY n
        |UNION ALL
        |SELECT o_orderkey, o_orderkey FROM orders
        |WHERE o_orderkey NOT IN (SELECT a FROM sym)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Reproduces the token-window fan-out: same whitespace tokenization,
    // 1-based inclusive list slices of 40 tokens every 30, short tail kept.
    "q53_text_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk, len(tk) AS n,
        |    1 + CAST(ceil(greatest(len(tk) - 40, 0) / 30.0) AS INT) AS nch
        |  FROM t)
        |SELECT doc_id,
        |  CAST(u.i AS INT) AS chunk_idx,
        |  array_to_string(tk[u.i * 30 + 1 : u.i * 30 + 40], ' ') AS chunk_text,
        |  CAST(least(n - u.i * 30, 40) AS INT) AS chunk_tokens
        |FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Reproduces the quantization exactly: same max-abs/127 scale (greatest
    // is order-independent), same IEEE-exact floor(x/s + 0.5) rounding, so
    // the integer sum of squares and the double reconstruction error match
    // bit-for-bit.
    "q54_embedding_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding AS e,
        |    greatest(list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0 AS escala
        |  FROM embeddings)
        |SELECT vec_id, escala,
        |  CAST(list_sum(list_transform(e,
        |    x -> floor(CAST(x AS DOUBLE) / escala + 0.5) ** 2)) AS BIGINT) AS soma_q2,
        |  list_max(list_transform(e,
        |    x -> abs(floor(CAST(x AS DOUBLE) / escala + 0.5) * escala
        |             - CAST(x AS DOUBLE)))) AS erro_max
        |FROM s ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same two passes: vocabulary counts, instance join, per-doc fold.
    // sum() goes through CAST AS BIGINT (DuckDB HUGEINT -> float64
    // otherwise — the q48 lesson); the mean divides the same exact longs.
    "q55_token_frequency" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |  FROM documents),
        |vocab AS (SELECT t, count(*) AS freq FROM tok GROUP BY t)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(min(freq) AS BIGINT) AS freq_min,
        |  CAST(sum(freq) AS BIGINT) AS freq_soma,
        |  CAST(sum(freq) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS freq_media
        |FROM tok JOIN vocab USING (t)
        |GROUP BY doc_id ORDER BY ALL NULLS FIRST""".stripMargin,

    // Predicts the form-state round-trip from the same columns: the
    // ViewState token and the three option code/description pairs per
    // order, fanned out with a lateral generate_series.
    "q56_form_parse" ->
      """SELECT o_orderkey,
        |  'vs-' || md5(CAST(o_orderkey AS VARCHAR)) AS view_state,
        |  'co-' || CAST((o_orderkey + u.i) % 997 AS VARCHAR) AS opcao_codigo,
        |  'Opcao ' || CAST(u.i AS VARCHAR) || ' ' AS opcao_descricao
        |FROM orders, LATERAL unnest(generate_series(1, 3)) u(i)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The lossless half of the MJPEG round-trip: sampled frame indices and
    // per-frame dimensions survive JPEG compression exactly.
    "q57_video_mjpeg" ->
      """SELECT doc_id,
        |  CAST(u.f AS INT) AS frame_indice,
        |  CAST(1 + n_chars % 6 AS INT) AS alt_px,
        |  CAST(1 + doc_id % 6 AS INT) AS larg_px
        |FROM documents d, LATERAL unnest(generate_series(0, CAST(doc_id % 6 AS INT), 2)) u(f)
        |WHERE doc_id % 5 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Rebuilds the same PII-injected text, replays the same three rewrites
    // (email → phone → IP) and counts matches on the source text. The
    // patterns are restricted to syntax with identical Java-regex/RE2
    // semantics.
    "q58_pii_redact" ->
      """WITH d AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' contato: user' || CAST(doc_id AS VARCHAR)
        |         || '@ex' || CAST(doc_id % 10 AS VARCHAR) || '.com.br' ELSE '' END
        |    || CASE WHEN doc_id % 9 = 0 THEN ' cc admin@site.org' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN ' tel ('
        |         || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ') 9'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' ip ' || CAST(doc_id % 256 AS VARCHAR)
        |         || '.0.' || CAST(doc_id % 100 AS VARCHAR) || '.1' ELSE '' END
        |    AS texto
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(texto,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\(\d{2}\)\s?\d{4,5}-\d{4}', '<TELEFONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS texto_limpo,
        |  CAST(len(regexp_extract_all(texto,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(texto,
        |    '\(\d{2}\)\s?\d{4,5}-\d{4}')) AS BIGINT) AS n_telefones,
        |  CAST(len(regexp_extract_all(texto,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
        |FROM d ORDER BY ALL NULLS FIRST""".stripMargin,

    // Unigram/bigram/trigram counts per doc via list comprehensions (the
    // q28 shingle idiom, multiplicity KEPT), folded to the same max /
    // dup-sum signals; fractions are the same single exact-long divisions.
    "q59_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens, tk,
        |    CASE WHEN len(tk) >= 2
        |      THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |      ELSE [] END AS bi,
        |    CASE WHEN len(tk) >= 3
        |      THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
        |      ELSE [] END AS tri
        |  FROM t),
        |uc AS (SELECT doc_id, max(c) AS top_token FROM (
        |  SELECT doc_id, u, count(*) AS c
        |  FROM (SELECT doc_id, unnest(tk) AS u FROM g) GROUP BY 1, 2) GROUP BY 1),
        |bc AS (SELECT doc_id, max(c) AS top_bigrama FROM (
        |  SELECT doc_id, b, count(*) AS c
        |  FROM (SELECT doc_id, unnest(bi) AS b FROM g) GROUP BY 1, 2) GROUP BY 1),
        |tc AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_trigramas
        |  FROM (SELECT doc_id, tr, count(*) AS c
        |  FROM (SELECT doc_id, unnest(tri) AS tr FROM g) GROUP BY 1, 2) GROUP BY 1)
        |SELECT g.doc_id, g.n_tokens,
        |  CAST(coalesce(uc.top_token, 0) AS BIGINT) AS top_token,
        |  CAST(coalesce(bc.top_bigrama, 0) AS BIGINT) AS top_bigrama,
        |  CAST(coalesce(tc.dup_trigramas, 0) AS BIGINT) AS dup_trigramas,
        |  CASE WHEN g.n_tokens >= 1 THEN CAST(coalesce(uc.top_token, 0) AS DOUBLE)
        |    / CAST(g.n_tokens AS DOUBLE) ELSE 0.0 END AS frac_top_token,
        |  CASE WHEN g.n_tokens >= 2 THEN CAST(coalesce(bc.top_bigrama, 0) AS DOUBLE)
        |    / CAST(g.n_tokens - 1 AS DOUBLE) ELSE 0.0 END AS frac_top_bigrama,
        |  CASE WHEN g.n_tokens >= 3 THEN CAST(coalesce(tc.dup_trigramas, 0) AS DOUBLE)
        |    / CAST(g.n_tokens - 2 AS DOUBLE) ELSE 0.0 END AS frac_dup_trigramas
        |FROM g LEFT JOIN uc USING (doc_id) LEFT JOIN bc USING (doc_id)
        |  LEFT JOIN tc USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Distinct-trigram overlap of each corpus doc against the benchmark
    // slice's union of trigrams — the count of a doc's own distinct
    // shingles that appear anywhere in the benchmark.
    "q60_decontam" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3
        |    THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
        |    ELSE [] END) AS sh
        |  FROM t),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM k WHERE doc_id % 97 = 0),
        |hits AS (SELECT doc_id, count(*) AS n FROM
        |  (SELECT doc_id, unnest(sh) AS s FROM k WHERE doc_id % 97 <> 0) c
        |  JOIN bench USING (s) GROUP BY 1)
        |SELECT k.doc_id,
        |  CAST(coalesce(hits.n, 0) AS BIGINT) AS n_compartilhados,
        |  coalesce(hits.n, 0) > 0 AS contaminado
        |FROM k LEFT JOIN hits USING (doc_id)
        |WHERE k.doc_id % 97 <> 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the oracle for the union-merge
    // as-of implementation (same at-or-before, latest-dim-row semantics).
    "q61_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events),
        |dim AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'error'),
        |fact AS (SELECT * FROM ev WHERE event_type <> 'error')
        |SELECT f.event_id, f.ts, f.user_id, f.event_type, f.value,
        |  d.ts AS cfg_ts, d.value AS cfg_value
        |FROM fact f ASOF LEFT JOIN dim d
        |  ON f.user_id = d.user_id AND f.ts >= d.ts
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same dirty text (decomposed accent via chr(769), tab, double spaces,
    // BEL), normalized by DuckDB's own nfc_normalize + the same two
    // rewrites; lengths count Unicode code points in both engines.
    "q62_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(text, 1, 40) || ' e' || chr(769) || '  tab' || chr(9)
        |      || 'here ' || chr(7) || ' fim' AS texto
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, length(texto) AS n_antes,
        |    trim(regexp_replace(regexp_replace(nfc_normalize(texto),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '\s+', ' ', 'g')) AS texto_norm
        |  FROM d)
        |SELECT doc_id, CAST(n_antes AS BIGINT) AS n_antes, texto_norm,
        |  CAST(length(texto_norm) AS BIGINT) AS n_depois
        |FROM n ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same md5 shard hash (first 32 bits mod 32) and manifest aggregates.
    "q63_shard_pack" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS tokens_est
        |  FROM documents)
        |SELECT
        |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32
        |    AS shard,
        |  count(*) AS docs, CAST(sum(tokens_est) AS BIGINT) AS tokens,
        |  min(doc_id) AS id_min, max(doc_id) AS id_max
        |FROM d GROUP BY 1 ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same synthesized URLs; domain via the same regex; blocklist as a
    // NOT IN over the same three domains.
    "q64_domain_filter" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 13 = 0 THEN 'spam-mill.example'
        |                       WHEN doc_id % 13 = 1 THEN 'seo-farm.example'
        |                       ELSE source || '-site.example' END
        |      || '/art/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1) AS dominio
        |  FROM d)
        |SELECT * FROM x
        |WHERE dominio NOT IN ('spam-mill.example', 'seo-farm.example', 'unused.example')
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same corpus counts, same instance joins, same add-one-smoothed IEEE
    // division per bigram, same DECIMAL(38,18)-exact per-doc sum and final
    // double mean.
    "q65_bigram_lm" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |uni AS (SELECT u AS w, count(*) AS cu
        |  FROM (SELECT unnest(tk) AS u FROM t) GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM uni),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    ELSE [] END) AS g
        |  FROM t),
        |cb AS (SELECT g, count(*) AS cb FROM bg GROUP BY 1),
        |p AS (SELECT doc_id,
        |    CAST(cb.cb + 1 AS DOUBLE) / CAST(uni.cu + v.v AS DOUBLE) AS p
        |  FROM bg JOIN cb USING (g)
        |  JOIN uni ON split_part(bg.g, ' ', 1) = uni.w
        |  CROSS JOIN v),
        |sc AS (SELECT doc_id, count(*) AS n_bigramas,
        |    sum(CAST(p AS DECIMAL(38,18))) AS psum
        |  FROM p GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(coalesce(sc.n_bigramas, 0) AS BIGINT) AS n_bigramas,
        |  coalesce(CAST(sc.psum AS DOUBLE) / CAST(sc.n_bigramas AS DOUBLE), 0.0)
        |    AS lm_score
        |FROM t LEFT JOIN sc USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same integer keep-rates (floor of the identical IEEE division) and
    // the same md5 percent-hash membership.
    "q66_mixture_cap" ->
      """WITH r AS (
        |  SELECT lang, least(100, CAST(floor(8000.0 / count(*)) AS BIGINT)) AS taxa_pct
        |  FROM documents GROUP BY 1)
        |SELECT d.lang, d.doc_id, d.source, r.taxa_pct
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |  < r.taxa_pct
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Rebuilds the same page and replays the identical extraction chain:
    // five container drops, tag strip, entity decode (amp last), collapse.
    "q67_html_extract" ->
      """WITH pg AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><style>p{margin:0}</style></head><body>'
        |    || '<nav><a href="/">home</a> | <a href="/d">docs</a></nav>'
        |    || '<h1>artigo ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
        |    || text || ' a &amp; b &lt;ok&gt;</p>'
        |    || '<script>var x = 1 &amp;&amp; 2;</script>'
        |    || '<footer>&copy; 2026 rodape</footer></body></html>' AS html
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<head[^>]*>.*?</head>', ' ', 'g'),
        |              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |              '(?is)<nav[^>]*>.*?</nav>', ' ', 'g'),
        |              '(?is)<footer[^>]*>.*?</footer>', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |        '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS texto
        |  FROM pg)
        |SELECT doc_id,
        |  CAST(length(html) AS BIGINT) AS n_chars_html,
        |  texto,
        |  CAST(length(texto) AS BIGINT) AS n_chars_texto,
        |  CAST(length(texto) AS DOUBLE)
        |    / CAST(greatest(length(html), 1) AS DOUBLE) AS densidade
        |FROM x ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same integer-rank discrete quantiles (rank = max(1, ceil(p*n)) in
    // each language's sorted order) and the same inclusive bounds filter.
    "q68_quantile_filter" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |r AS (SELECT doc_id, lang, n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM d),
        |b AS (SELECT lang,
        |    min(CASE WHEN rn >= greatest(1,
        |      CAST(ceil(0.05 * CAST(n AS DOUBLE)) AS BIGINT)) THEN n_tokens END) AS lo,
        |    min(CASE WHEN rn >= greatest(1,
        |      CAST(ceil(0.95 * CAST(n AS DOUBLE)) AS BIGINT)) THEN n_tokens END) AS hi
        |  FROM r GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_tokens, b.lo, b.hi
        |FROM d JOIN b USING (lang)
        |WHERE n_tokens >= lo AND n_tokens <= hi
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same equivalence classes (lang x size decile), same k>=12 gate.
    "q69_k_anonymity" ->
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(n_chars // 100 AS BIGINT) AS faixa_tamanho
        |  FROM documents),
        |c AS (SELECT lang, faixa_tamanho, count(*) AS grupo_n
        |  FROM d GROUP BY 1, 2 HAVING count(*) >= 12)
        |SELECT d.lang, d.faixa_tamanho, d.doc_id,
        |  CAST(c.grupo_n AS BIGINT) AS grupo_n
        |FROM d JOIN c USING (lang, faixa_tamanho)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same trigram multiset, same exact counts, same deterministic
    // (count DESC, gram ASC) top-25 cut.
    "q70_heavy_hitters" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |    THEN [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]
        |    ELSE [] END) AS ngram
        |  FROM t)
        |SELECT * FROM (
        |  SELECT ngram,
        |    CAST(count(*) AS BIGINT) AS ocorrencias,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM g GROUP BY 1
        |  ORDER BY ocorrencias DESC, ngram LIMIT 25)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same seeded boilerplate, same 10-token non-overlapping chunk
    // fan-out, same global first-occurrence keep, same ordered rebuild.
    "q71_chunk_purge" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN 'este conteudo esta licenciado sob os termos da licenca publica '
        |        || text
        |      ELSE text END AS texto
        |  FROM documents),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(texto)), '\s+') AS tk
        |  FROM d),
        |c AS (SELECT doc_id, tk, len(tk) AS n,
        |    1 + CAST(ceil(greatest(len(tk) - 10, 0) / 10.0) AS INT) AS nch
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(tk[u.i * 10 + 1 : u.i * 10 + 10], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |k AS (SELECT *, row_number()
        |    OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
        |  FROM ch),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS texto_limpo
        |  FROM k WHERE rn = 1 GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1)
        |SELECT tot.doc_id,
        |  coalesce(reb.texto_limpo, '') AS texto_limpo,
        |  CAST(tot.n_chunks AS BIGINT) AS n_chunks,
        |  CAST(tot.n_chunks - coalesce(reb.kept, 0) AS BIGINT) AS n_removidos
        |FROM tot LEFT JOIN reb USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // A faithful JSONL roundtrip returns the table unchanged.
    "q72_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The bounded-heap aggregate must agree with the ANSI window form:
    // rank by (balance DESC, custkey ASC) within each nation, keep 3.
    "q74_group_topk" ->
      """SELECT c_nationkey, CAST(rn AS INT) AS posicao,
        |  c_custkey, c_acctbal
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // A faithful ORC roundtrip returns the filtered projection unchanged.
    "q75_orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en'
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // SCD2 replay: close matched-and-changed open rows at the effective
    // date, append new versions for changed attrs and brand-new keys.
    "q76_scd2_history" ->
      """WITH sup AS (SELECT s_suppkey, s_acctbal, s_nationkey FROM supplier),
        |hist AS (
        |  SELECT s_suppkey, s_acctbal, s_nationkey,
        |    DATE '2026-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |    TRUE AS is_current
        |  FROM sup
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal - 50, s_nationkey,
        |    DATE '2025-01-01', DATE '2026-01-01', FALSE
        |  FROM sup WHERE s_suppkey % 4 = 0),
        |incoming AS (
        |  SELECT s_suppkey, s_acctbal + 100 AS s_acctbal, s_nationkey
        |  FROM sup WHERE s_suppkey % 3 = 0
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal, s_nationkey
        |  FROM sup WHERE s_suppkey % 3 = 1
        |  UNION ALL
        |  SELECT s_suppkey + 10000, s_acctbal * 2, s_nationkey
        |  FROM sup WHERE s_suppkey % 5 = 0),
        |cur AS (SELECT * FROM hist WHERE is_current),
        |hist_out AS (
        |  SELECT h.s_suppkey, h.s_acctbal, h.s_nationkey, h.valid_from,
        |    CASE WHEN h.is_current AND i.s_suppkey IS NOT NULL
        |              AND (h.s_acctbal IS DISTINCT FROM i.s_acctbal
        |                   OR h.s_nationkey IS DISTINCT FROM i.s_nationkey)
        |         THEN DATE '2026-08-01' ELSE h.valid_to END AS valid_to,
        |    CASE WHEN h.is_current AND i.s_suppkey IS NOT NULL
        |              AND (h.s_acctbal IS DISTINCT FROM i.s_acctbal
        |                   OR h.s_nationkey IS DISTINCT FROM i.s_nationkey)
        |         THEN FALSE ELSE h.is_current END AS is_current
        |  FROM hist h LEFT JOIN incoming i ON h.s_suppkey = i.s_suppkey),
        |new_rows AS (
        |  SELECT i.s_suppkey, i.s_acctbal, i.s_nationkey,
        |    DATE '2026-08-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |    TRUE AS is_current
        |  FROM incoming i LEFT JOIN cur c ON i.s_suppkey = c.s_suppkey
        |  WHERE c.s_suppkey IS NULL
        |     OR i.s_acctbal IS DISTINCT FROM c.s_acctbal
        |     OR i.s_nationkey IS DISTINCT FROM c.s_nationkey)
        |SELECT * FROM hist_out UNION ALL SELECT * FROM new_rows
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Decimal-exact per-coordinate means (posexplode ↔ unnest+subscripts).
    "q77_embedding_pool" ->
      """SELECT label, CAST(posicao AS INT) AS posicao,
        |  CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS valor
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS posicao,
        |    unnest(embedding) AS v
        |  FROM embeddings)
        |GROUP BY label, posicao
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same-user click→purchase pairs within [0, 30] minutes.
    "q78_interval_join" ->
      """SELECT c.user_id, c.event_id AS gatilho_id, p.event_id AS conversao_id,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS atraso_s
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) - epoch_us(c.ts) >= 0
        |  AND epoch_us(p.ts) - epoch_us(c.ts) <= 30 * 60 * 1000000
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // A pruned partitioned read returns the filtered projection unchanged.
    "q79_partition_prune" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en'
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Trailing-5 rolling mean: decimal-exact running sums, one division.
    "q80_rolling_agg" ->
      """SELECT user_id, event_id, ts,
        |  CAST(cnt AS BIGINT) AS eventos_janela,
        |  CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS media_movel
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    count(*) OVER w AS cnt,
        |    sum(CAST(value AS DECIMAL(28,6))) OVER w AS s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Conditional counts reproduce the explicit-values pivot.
    "q81_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The salted join must equal the plain join.
    "q82_skew_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, l.l_quantity,
        |  s.s_name, s.s_acctbal
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // ROLLUP grouping sets with the (lang, source) grouping bit vector.
    "q83_rollup_agg" ->
      """SELECT lang, source,
        |  CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(GROUPING(lang, source) AS INT) AS nivel
        |FROM documents
        |GROUP BY ROLLUP(lang, source)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Compaction only changes layout; content is the identity.
    "q84_compaction" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // EXCEPT ALL both ways reproduces the multiset snapshot diff.
    "q85_table_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |neu AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT *, 'adicionada' AS mudanca
        |FROM (SELECT * FROM neu EXCEPT ALL SELECT * FROM old)
        |UNION ALL
        |SELECT *, 'removida'
        |FROM (SELECT * FROM old EXCEPT ALL SELECT * FROM neu)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // First-timestamp-per-stage funnel depth.
    "q86_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(CASE WHEN t0 IS NULL THEN 0
        |            WHEN t1 IS NULL OR t1 < t0 THEN 1
        |            WHEN t2 IS NULL OR t2 < t1 THEN 2
        |            ELSE 3 END AS INT) AS etapas
        |FROM f ORDER BY ALL NULLS FIRST""".stripMargin,

    // Per-column UNION ALL replays the one-pass profile.
    "q87_profile" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN NULL ELSE lang END AS lang,
        |    source, n_chars
        |  FROM documents)
        |SELECT 'doc_id' AS coluna, CAST(count(doc_id) AS BIGINT) AS nao_nulos,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS distintos,
        |  CAST(min(doc_id) AS VARCHAR) AS minimo,
        |  CAST(max(doc_id) AS VARCHAR) AS maximo FROM d
        |UNION ALL
        |SELECT 'lang', CAST(count(lang) AS BIGINT),
        |  CAST(count(DISTINCT lang) AS BIGINT),
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM d
        |UNION ALL
        |SELECT 'source', CAST(count(source) AS BIGINT),
        |  CAST(count(DISTINCT source) AS BIGINT),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM d
        |UNION ALL
        |SELECT 'n_chars', CAST(count(n_chars) AS BIGINT),
        |  CAST(count(DISTINCT n_chars) AS BIGINT),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM d
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The folded view must equal the from-scratch aggregate.
    "q88_incr_aggregate" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS pedidos,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DECIMAL(28,6))
        |    AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Chunk (q53 idiom) → md5 feature-hash embed → decimal-exact cosine
    // top-3 (q29 idiom): the whole retrieval pipeline replayed in SQL.
    "q89_rag_retrieval" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk, len(tk) AS n,
        |    1 + CAST(ceil(greatest(len(tk) - 30, 0) / 30.0) AS INT) AS nch
        |  FROM t),
        |ch AS (
        |  SELECT doc_id * 1000 + u.i AS chunk_id,
        |    array_to_string(tk[u.i * 30 + 1 : u.i * 30 + 30], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |e AS (
        |  SELECT chunk_id,
        |    list_transform(generate_series(0, 3),
        |      d -> CAST(CAST(('0x' || substring(md5(
        |        CAST(d AS VARCHAR) || ':' || chunk_text), 1, 8)) AS BIGINT)
        |        AS DOUBLE) / 4294967296.0) AS emb
        |  FROM ch),
        |n AS (
        |  SELECT chunk_id, sqrt(CAST(list_aggregate(list_transform(emb,
        |    x -> CAST(x * x AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm
        |  FROM e),
        |p AS (
        |  SELECT q.chunk_id AS query_id, cdf.chunk_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.emb, cdf.emb),
        |      z -> CAST(z[1] * z[2] AS DECIMAL(38,18))), 'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM e ORDER BY chunk_id LIMIT 32) q
        |  CROSS JOIN e cdf),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.chunk_id
        |  JOIN n nc ON p.corpus_id = nc.chunk_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 3 ORDER BY ALL NULLS FIRST""".stripMargin,

    // The checksum is a plain commutative sum — SQL replays it directly:
    // per-column md5 tokens (null → 32 'n's), row digest over their
    // concatenation, two 32-bit halves recombined into a 64-bit addend.
    "q90_table_checksum" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 19 = 0 THEN NULL ELSE l_returnflag END
        |      AS l_returnflag,
        |    l_shipdate
        |  FROM lineitem),
        |h AS (
        |  SELECT md5(
        |    coalesce(md5(CAST(l_orderkey AS VARCHAR)), repeat('n', 32)) ||
        |    coalesce(md5(CAST(l_linenumber AS VARCHAR)), repeat('n', 32)) ||
        |    coalesce(md5(l_returnflag), repeat('n', 32)) ||
        |    coalesce(md5(CAST(l_shipdate AS VARCHAR)), repeat('n', 32)))
        |    AS d
        |  FROM li)
        |SELECT CAST(count(*) AS BIGINT) AS linhas,
        |  CAST(sum(
        |    CAST(CAST(('0x' || substring(d, 1, 8)) AS BIGINT) AS HUGEINT)
        |      * 4294967296 +
        |    CAST(CAST(('0x' || substring(d, 9, 8)) AS BIGINT) AS HUGEINT))
        |    AS VARCHAR) AS soma_verificacao
        |FROM h
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q91_asof_native" ->
      """WITH ev AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events),
        |dim AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'error'),
        |fact AS (SELECT * FROM ev WHERE event_type <> 'error')
        |SELECT f.event_id, f.ts, f.user_id, f.event_type, f.value,
        |  d.ts AS cfg_ts, d.value AS cfg_value
        |FROM fact f ASOF LEFT JOIN dim d
        |  ON f.user_id = d.user_id AND f.ts >= d.ts
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q92_group_topk_rows" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, l_shipdate,
        |    CAST(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity DESC, l_orderkey, l_linenumber, l_shipdate)
        |      AS INTEGER) AS posicao
        |  FROM lineitem)
        |SELECT * FROM ranked WHERE posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q93_scd2_delta" ->
      """WITH sup AS (SELECT s_suppkey, s_acctbal, s_nationkey FROM supplier),
        |hist AS (
        |  SELECT s_suppkey, s_acctbal, s_nationkey,
        |    DATE '2026-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |    TRUE AS is_current
        |  FROM sup
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal - 50, s_nationkey,
        |    DATE '2025-01-01', DATE '2026-01-01', FALSE
        |  FROM sup WHERE s_suppkey % 4 = 0),
        |incoming AS (
        |  SELECT s_suppkey, s_acctbal + 100 AS s_acctbal, s_nationkey
        |  FROM sup WHERE s_suppkey % 3 = 0
        |  UNION ALL
        |  SELECT s_suppkey, s_acctbal, s_nationkey
        |  FROM sup WHERE s_suppkey % 3 = 1
        |  UNION ALL
        |  SELECT s_suppkey + 10000, s_acctbal * 2, s_nationkey
        |  FROM sup WHERE s_suppkey % 5 = 0),
        |cur AS (SELECT * FROM hist WHERE is_current),
        |m AS (
        |  SELECT i.s_suppkey, i.s_acctbal AS in_acctbal,
        |    i.s_nationkey AS in_nationkey, c.s_acctbal AS cur_acctbal,
        |    c.s_nationkey AS cur_nationkey, c.valid_from AS cur_valid_from,
        |    c.s_suppkey IS NOT NULL AS has_cur,
        |    (c.s_suppkey IS NOT NULL AND
        |      (c.s_acctbal IS DISTINCT FROM i.s_acctbal
        |       OR c.s_nationkey IS DISTINCT FROM i.s_nationkey)) AS mudou
        |  FROM incoming i LEFT JOIN cur c ON i.s_suppkey = c.s_suppkey)
        |SELECT s_suppkey, cur_acctbal AS s_acctbal,
        |  cur_nationkey AS s_nationkey, cur_valid_from AS valid_from,
        |  DATE '2026-08-01' AS valid_to, FALSE AS is_current,
        |  'fechar' AS acao
        |FROM m WHERE mudou
        |UNION ALL
        |SELECT s_suppkey, in_acctbal, in_nationkey, DATE '2026-08-01',
        |  CAST(NULL AS DATE), TRUE, 'abrir'
        |FROM m WHERE NOT has_cur OR mudou
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q94_group_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY h, doc_id) AS INTEGER) AS posicao
        |  FROM d)
        |SELECT * FROM ranked WHERE posicao <= 3
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q95_zorder" -> zorderOracle,

    "q97_window_agg" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,3)))
        |    OVER (PARTITION BY l_suppkey) AS DOUBLE) AS grp_qty,
        |  count(*) OVER (PARTITION BY l_suppkey) AS grp_n
        |FROM lineitem ORDER BY ALL NULLS FIRST""".stripMargin,

    // BM25 replayed exactly: same tokenization as q55, df from the
    // candidate set, one-row corpus stats, and the identical double
    // expression tree (constants combined IN the engine — `1.2 + 1.0`
    // mirrors Spark's lit(k1) + lit(1.0)); per-term contributions sum in
    // DECIMAL(38,18) on both sides.
    "q99_bm25_retrieval" -> bm25Sql,
    "q169_prf_expansion" -> prfSql,

    "q98_cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |         'upd_' || o_orderkey AS c_name,
        |         o_totalprice AS c_acctbal,
        |         o_orderkey AS seq,
        |         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        |  FROM orders),
        |w AS (
        |  SELECT * FROM (
        |    SELECT ch.*, row_number() OVER (PARTITION BY c_custkey
        |                                    ORDER BY seq DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM w WHERE w.c_custkey = c.c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM w WHERE op <> 'D'
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // RRF hybrid: q99's BM25 replay (k=20) + q89's md5-embedding cosine
    // replay over whole docs (k=20), contributions 1/(60+rank) summed in
    // DECIMAL(38,18) — both rank lists and the fuse are replayed exactly.
    "q100_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(dl) AS HUGEINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8)),
        |cand AS (
        |  SELECT q.query_id, q.term, p.doc_id, p.tf, d.dl
        |  FROM q JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |dfreq AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand GROUP BY term),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand JOIN dfreq USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id),
        |bm AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, doc_id) AS posicao
        |  FROM scored QUALIFY posicao <= 20),
        |e AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 3),
        |      d -> CAST(CAST(('0x' || substring(md5(
        |        CAST(d AS VARCHAR) || ':' || text), 1, 8)) AS BIGINT)
        |        AS DOUBLE) / 4294967296.0) AS emb
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, sqrt(CAST(list_aggregate(list_transform(emb,
        |    x -> CAST(x * x AS DECIMAL(38,18))), 'sum') AS DOUBLE)) AS nrm
        |  FROM e),
        |p AS (
        |  SELECT qe.doc_id AS query_id, ce.doc_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(qe.emb, ce.emb),
        |      z -> CAST(z[1] * z[2] AS DECIMAL(38,18))), 'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM e ORDER BY doc_id LIMIT 8) qe
        |  CROSS JOIN e ce),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.doc_id
        |  JOIN n nc ON p.corpus_id = nc.doc_id),
        |kn AS (
        |  SELECT query_id, corpus_id AS doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, corpus_id) AS posicao
        |  FROM s QUALIFY posicao <= 20),
        |contrib AS (
        |  SELECT query_id, doc_id,
        |    CAST(1.0 / (60.0 + CAST(posicao AS DOUBLE)) AS DECIMAL(38,18)) AS c
        |  FROM bm
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(1.0 / (60.0 + CAST(posicao AS DOUBLE)) AS DECIMAL(38,18)) AS c
        |  FROM kn),
        |f AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(c) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM contrib GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM f
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Span purge replay: q71's chunk fan-out at window 5, frequent set =
    // spans in > 2 distinct docs, every instance of a frequent span
    // dropped, ordered rebuild per doc.
    "q101_span_purge" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, tk,
        |    1 + CAST(ceil(greatest(len(tk) - 5, 0) / 5.0) AS INT) AS nch
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(tk[u.i * 5 + 1 : u.i * 5 + 5], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |f AS (SELECT chunk_text, true AS hit FROM ch
        |  GROUP BY chunk_text HAVING count(DISTINCT doc_id) > 2),
        |k AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text, f.hit
        |  FROM ch LEFT JOIN f USING (chunk_text)),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS texto_limpo
        |  FROM k WHERE hit IS NULL GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1)
        |SELECT tot.doc_id,
        |  coalesce(reb.texto_limpo, '') AS texto_limpo,
        |  CAST(tot.n_chunks AS BIGINT) AS n_chunks,
        |  CAST(tot.n_chunks - coalesce(reb.kept, 0) AS BIGINT) AS n_removidos
        |FROM tot LEFT JOIN reb USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Temperature resample replay: per-language counts, sqrt weights
    // summed in DECIMAL(38,12), left-associative probability chain and
    // the md5-uniform keep test — identical IEEE op sequence both sides.
    "q102_temperature_sample" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS cd
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, cd, sqrt(CAST(cd AS DOUBLE)) AS wd FROM c),
        |t AS (SELECT CAST(sum(cd) AS HUGEINT) AS n,
        |    CAST(CAST(sum(CAST(wd AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |      AS DOUBLE) AS wsum
        |  FROM w),
        |p AS (
        |  SELECT lang,
        |    least(1.0, wd / wsum * 0.5 * CAST(n AS DOUBLE) / CAST(cd AS DOUBLE))
        |      AS p_keep
        |  FROM w, t)
        |SELECT d.doc_id, d.lang, d.source, d.n_chars, p.p_keep
        |FROM documents d JOIN p USING (lang)
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) AS DOUBLE) / 4294967296.0 < p_keep
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Whole-chain replay: q25's dedup, q32's quality arithmetic, q101's
    // span purge and q102's resample composed in one WITH chain — every
    // fragment individually hash-validated, the composition exact too.
    "q103_curation_pipeline" ->
      """WITH kmin AS (SELECT text, min(doc_id) AS keep FROM documents GROUP BY text),
        |dd AS (SELECT d.doc_id, d.lang, d.text FROM documents d
        |  JOIN kmin ON d.text = kmin.text AND d.doc_id = kmin.keep),
        |sc AS (SELECT doc_id, lang, text,
        |  0.4 * (CAST(len(list_filter(tk, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |         / greatest(CAST(len(tk) AS DOUBLE), 1.0)) +
        |  0.3 * least(1.0,
        |    (CAST(list_aggregate(list_transform(tk, t -> len(t)), 'sum') AS DOUBLE)
        |     / greatest(CAST(len(tk) AS DOUBLE), 1.0)) / 8.0) -
        |  0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0)) -
        |  0.1 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0))
        |    AS qualidade
        |  FROM (SELECT doc_id, lang, text,
        |          string_split_regex(trim(lower(text)), '\s+') AS tk
        |        FROM dd)),
        |qf AS (SELECT * FROM sc WHERE qualidade >= 0.19),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM qf),
        |c AS (SELECT doc_id, tk,
        |    1 + CAST(ceil(greatest(len(tk) - 5, 0) / 5.0) AS INT) AS nch
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(tk[u.i * 5 + 1 : u.i * 5 + 5], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |f AS (SELECT chunk_text, true AS hit FROM ch
        |  GROUP BY chunk_text HAVING count(DISTINCT doc_id) > 2),
        |kk AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text, f.hit
        |  FROM ch LEFT JOIN f USING (chunk_text)),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS texto_limpo
        |  FROM kk WHERE hit IS NULL GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1),
        |pg AS (SELECT tot.doc_id,
        |    coalesce(reb.texto_limpo, '') AS texto_limpo,
        |    CAST(tot.n_chunks - coalesce(reb.kept, 0) AS BIGINT) AS n_removidos
        |  FROM tot LEFT JOIN reb USING (doc_id)),
        |j AS (SELECT qf.doc_id, qf.lang, qf.qualidade, pg.texto_limpo,
        |    pg.n_removidos
        |  FROM qf JOIN pg USING (doc_id)),
        |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS cd FROM j GROUP BY lang),
        |w AS (SELECT lang, cd, sqrt(CAST(cd AS DOUBLE)) AS wd FROM cnt),
        |tt AS (SELECT CAST(sum(cd) AS HUGEINT) AS n,
        |    CAST(CAST(sum(CAST(wd AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |      AS DOUBLE) AS wsum
        |  FROM w),
        |p AS (SELECT lang,
        |    least(1.0, wd / wsum * 0.5 * CAST(n AS DOUBLE) / CAST(cd AS DOUBLE))
        |      AS p_keep
        |  FROM w, tt)
        |SELECT j.doc_id, j.lang, j.qualidade, j.texto_limpo, j.n_removidos,
        |  p.p_keep
        |FROM j JOIN p USING (lang)
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(j.doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) AS DOUBLE) / 4294967296.0 < p_keep
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q103's chain with the fuzzy stage on: q26's full portable-MinHash
    // replay runs on the exact-deduped set, verified pairs drop their
    // greater id, and the quality/purge/resample chain continues from
    // the survivors — all six operators in one WITH chain, bit-for-bit.
    "q105_curation_fuzzy" -> {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0) s"SELECT id, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |kmin AS (SELECT text, min(doc_id) AS keep FROM all_docs GROUP BY text),
        |dd AS (SELECT d.doc_id, d.lang, d.text FROM all_docs d
        |  JOIN kmin ON d.text = kmin.text AND d.doc_id = kmin.keep),
        |t AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM dd),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id,
        |    $mins
        |  FROM shrows GROUP BY id),
        |buckets AS (
        |  $bands),
        |prs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id),
        |vp AS (
        |  SELECT p.id_a, p.id_b
        |  FROM prs p JOIN k ka ON p.id_a = ka.id JOIN k kb ON p.id_b = kb.id
        |  WHERE CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE) /
        |    (CAST(len(ka.sh) AS DOUBLE) + CAST(len(kb.sh) AS DOUBLE)
        |     - CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE)) >= 0.5),
        |fd AS (SELECT * FROM dd
        |  WHERE doc_id NOT IN (SELECT id_b FROM vp)),
        |sc AS (SELECT doc_id, lang, text,
        |  0.4 * (CAST(len(list_filter(tk2, t2 -> t2 IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |         / greatest(CAST(len(tk2) AS DOUBLE), 1.0)) +
        |  0.3 * least(1.0,
        |    (CAST(list_aggregate(list_transform(tk2, t2 -> len(t2)), 'sum') AS DOUBLE)
        |     / greatest(CAST(len(tk2) AS DOUBLE), 1.0)) / 8.0) -
        |  0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0)) -
        |  0.1 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0))
        |    AS qualidade
        |  FROM (SELECT doc_id, lang, text,
        |          string_split_regex(trim(lower(text)), '\\s+') AS tk2
        |        FROM fd)),
        |qf AS (SELECT * FROM sc WHERE qualidade >= 0.19),
        |tq AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM qf),
        |c AS (SELECT doc_id, tk,
        |    1 + CAST(ceil(greatest(len(tk) - 5, 0) / 5.0) AS INT) AS nch
        |  FROM tq),
        |ch AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(tk[u.i * 5 + 1 : u.i * 5 + 5], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |f AS (SELECT chunk_text, true AS hit FROM ch
        |  GROUP BY chunk_text HAVING count(DISTINCT doc_id) > 2),
        |kk AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text, f.hit
        |  FROM ch LEFT JOIN f USING (chunk_text)),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS texto_limpo
        |  FROM kk WHERE hit IS NULL GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1),
        |pg AS (SELECT tot.doc_id,
        |    coalesce(reb.texto_limpo, '') AS texto_limpo,
        |    CAST(tot.n_chunks - coalesce(reb.kept, 0) AS BIGINT) AS n_removidos
        |  FROM tot LEFT JOIN reb USING (doc_id)),
        |j AS (SELECT qf.doc_id, qf.lang, qf.qualidade, pg.texto_limpo,
        |    pg.n_removidos
        |  FROM qf JOIN pg USING (doc_id)),
        |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS cd FROM j GROUP BY lang),
        |w AS (SELECT lang, cd, sqrt(CAST(cd AS DOUBLE)) AS wd FROM cnt),
        |tt AS (SELECT CAST(sum(cd) AS HUGEINT) AS n,
        |    CAST(CAST(sum(CAST(wd AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |      AS DOUBLE) AS wsum
        |  FROM w),
        |p AS (SELECT lang,
        |    least(1.0, wd / wsum * 0.5 * CAST(n AS DOUBLE) / CAST(cd AS DOUBLE))
        |      AS p_keep
        |  FROM w, tt)
        |SELECT j.doc_id, j.lang, j.qualidade, j.texto_limpo, j.n_removidos,
        |  p.p_keep
        |FROM j JOIN p USING (lang)
        |WHERE CAST(CAST(('0x' || substring(md5(CAST(j.doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) AS DOUBLE) / 4294967296.0 < p_keep
        |ORDER BY ALL NULLS FIRST""".stripMargin
    },

    "q106_landing_worklist" ->
      """WITH cat AS (
        |  SELECT 'PA' || o_orderkey || '.dbc' AS nome_completo,
        |    CAST(trunc(o_totalprice) AS BIGINT) AS tamanho, o_orderkey
        |  FROM orders),
        |land AS (
        |  SELECT 'PA' || o_orderkey || '.dbc' AS nome_completo,
        |    CAST(trunc(o_totalprice) AS BIGINT) +
        |      CASE WHEN o_orderkey % 9 = 0 THEN 1 ELSE 0 END AS t_local
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT nome_completo, tamanho, o_orderkey, motivo FROM (
        |  SELECT c.nome_completo, c.tamanho, c.o_orderkey,
        |    CASE WHEN l.t_local IS NULL THEN 'ausente'
        |         WHEN l.t_local != c.tamanho THEN 'tamanho_diferente'
        |    END AS motivo
        |  FROM cat c LEFT JOIN land l USING (nome_completo))
        |WHERE motivo IS NOT NULL
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Sliding spans replayed: starts every 2 tokens (full 5-windows
    // only), doc-frequency > 2 over distinct docs, covered positions
    // from hit spans, token-stream left join, ordered rebuild.
    "q107_span_purge_sliding" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS s,
        |    array_to_string(tk[u.i + 1 : u.i + 5], ' ') AS span
        |  FROM t, LATERAL unnest(generate_series(0, len(tk) - 5, 2)) u(i)
        |  WHERE len(tk) >= 5),
        |f AS (SELECT span FROM sp GROUP BY span
        |      HAVING count(DISTINCT doc_id) > 2),
        |h AS (
        |  SELECT DISTINCT sp.doc_id, CAST(u.p AS INT) AS pos
        |  FROM sp JOIN f USING (span),
        |    LATERAL unnest(generate_series(sp.s, sp.s + 4)) u(p)),
        |tok AS (
        |  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, tk[CAST(u.i AS INT)] AS tok
        |  FROM t, LATERAL unnest(generate_series(1, len(tk))) u(i)),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.tok, h2.cov
        |  FROM tok LEFT JOIN (SELECT doc_id, pos, true AS cov FROM h) h2
        |    USING (doc_id, pos))
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN cov IS NULL THEN tok END, ' '
        |    ORDER BY pos), '') AS texto_limpo,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cov IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_removidos
        |FROM kept GROUP BY doc_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Ledger fold replayed with a window (the oracle may sort; the engine
    // may not): latest run per job by seq, left-joined onto the catalog,
    // reason cascade identical.
    "q108_dispatch_worklist" ->
      """WITH catalog AS (
        |  SELECT o_orderpriority AS tipo, o_orderstatus AS situacao,
        |         max(o_orderdate) AS produzido_em,
        |         count(*) AS tamanho
        |  FROM orders GROUP BY 1, 2),
        |ledger AS (
        |  SELECT o_orderpriority AS tipo, o_orderstatus AS situacao,
        |         o_orderkey AS seq,
        |         CASE WHEN o_orderkey % 7 = 0 THEN 'erro' ELSE 'ok' END AS status,
        |         o_orderdate AS fim
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |latest AS (
        |  SELECT tipo, situacao, seq, status, fim FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY tipo, situacao ORDER BY seq DESC) AS rn
        |    FROM ledger) WHERE rn = 1)
        |SELECT tipo, situacao, produzido_em, tamanho,
        |  seq AS ultima_execucao, status AS ultimo_status, motivo
        |FROM (
        |  SELECT c.*, l.seq, l.status,
        |    CASE WHEN l.seq IS NULL THEN 'nunca_executado'
        |         WHEN l.status <> 'ok' THEN 'falha_anterior'
        |         WHEN c.produzido_em > l.fim THEN 'desatualizado' END AS motivo
        |  FROM catalog c LEFT JOIN latest l USING (tipo, situacao))
        |WHERE motivo IS NOT NULL
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The hashed model replayed: same md5 bucket hash, same md5-derived
    // milli-weight table, same exact integer margin.
    "q109_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, unnest(tk) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
        |                         for i in range(1, len(tk))]) AS g
        |  FROM t WHERE len(tk) >= 2),
        |b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 1024 AS bucket
        |  FROM feats WHERE g <> ''),
        |w AS (
        |  SELECT CAST(range AS BIGINT) AS bucket,
        |    CAST(('0x' || substring(md5('w:' || range), 1, 8)) AS BIGINT)
        |      % 2001 - 1000 AS w_milli
        |  FROM range(1024)),
        |s AS (
        |  SELECT doc_id, count(*) AS n_feats,
        |    sum(coalesce(w_milli, 0)) AS margem_milli
        |  FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
        |  CAST(coalesce(s.margem_milli, 0) AS BIGINT) AS margem_milli,
        |  coalesce(s.margem_milli, 0) > 0 AS aprovado
        |FROM documents d LEFT JOIN s USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Bottom-k sketch + exact containment replayed: same md5 word, same
    // bottom-8 per doc (row_number here, the bounded heap there), same
    // intersection-over-smaller-set verify.
    "q110_containment_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string(
        |      tk[1:CAST(greatest(3, floor(len(tk) * 2.0 / 5.0)) AS INT)], ' ')
        |  FROM base WHERE doc_id % 4 = 0),
        |t AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ')
        |                   for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |bottom AS (
        |  SELECT id, h FROM (
        |    SELECT id, h, row_number() OVER (PARTITION BY id ORDER BY h) AS rn
        |    FROM shrows) WHERE rn <= 8),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bottom a JOIN bottom b ON a.h = b.h AND a.id < b.id)
        |SELECT id_a, id_b, contencao FROM (
        |  SELECT p.id_a, p.id_b,
        |    CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE) /
        |    least(CAST(len(ka.sh) AS DOUBLE), CAST(len(kb.sh) AS DOUBLE))
        |      AS contencao
        |  FROM pairs p JOIN k ka ON p.id_a = ka.id JOIN k kb ON p.id_b = kb.id)
        |WHERE contencao >= 0.9
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The whole composition replayed: q26's md5-LSH verified pairs, the
    // recursive-CTE transitive closure, per-doc quality, and the
    // per-cluster argmax (window here, struct-max aggregation there).
    "q111_cluster_best" -> {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0) s"SELECT id, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      s"""WITH RECURSIVE all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (
        |  SELECT doc_id AS id, text,
        |    string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id,
        |    $mins
        |  FROM shrows GROUP BY id),
        |buckets AS (
        |  $bands),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id),
        |vp AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT c.id_a, c.id_b,
        |      CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE) /
        |      (CAST(len(ka.sh) AS DOUBLE) + CAST(len(kb.sh) AS DOUBLE)
        |       - CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE)) AS jaccard
        |    FROM cand c JOIN k ka ON c.id_a = ka.id JOIN k kb ON c.id_b = kb.id)
        |  WHERE jaccard >= 0.5),
        |sym AS (SELECT id_a AS a, id_b AS b FROM vp
        |        UNION SELECT id_b, id_a FROM vp),
        |reach(n, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |labels AS (
        |  SELECT n AS id, LEAST(n, MIN(r)) AS cluster_id FROM reach GROUP BY n),
        |q AS (
        |  SELECT id,
        |    0.4 * (CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |           / greatest(CAST(len(tk) AS DOUBLE), 1.0)) +
        |    0.3 * least(1.0,
        |      (CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum') AS DOUBLE)
        |       / greatest(CAST(len(tk) AS DOUBLE), 1.0)) / 8.0) -
        |    0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
        |           / greatest(CAST(len(text) AS DOUBLE), 1.0)) -
        |    0.1 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |           / greatest(CAST(len(text) AS DOUBLE), 1.0)) AS qualidade
        |  FROM t),
        |j AS (
        |  SELECT q.id, coalesce(l.cluster_id, q.id) AS cluster_id, q.qualidade
        |  FROM q LEFT JOIN labels l ON q.id = l.id)
        |SELECT cluster_id, doc_id, qualidade, membros FROM (
        |  SELECT cluster_id, id AS doc_id, qualidade,
        |    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS membros,
        |    row_number() OVER (
        |      PARTITION BY cluster_id ORDER BY qualidade DESC, id) AS rn
        |  FROM j) WHERE rn = 1
        |ORDER BY ALL NULLS FIRST""".stripMargin
    },

    // Group-hash split + per-(split, lang) mixture stats; the md5 percent
    // hash is the pctHash contract (first 32 md5 bits mod 100).
    "q112_leakage_split" ->
      """WITH s AS (
        |  SELECT *,
        |    CASE WHEN CAST(('0x' || substring(md5(source || 'v1'), 1, 8)) AS BIGINT) % 100 < 25
        |         THEN 'val' ELSE 'train' END AS split
        |  FROM documents)
        |SELECT split, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_fontes
        |FROM s GROUP BY split, lang
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q103's five-operator replay + decontamination (5-gram overlap vs
    // the every-41st-doc eval suite) + PII redaction with counts from
    // the pre-redaction text — the full eight-operator release chain.
    "q113_curation_release" ->
      """WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contato' || CAST(doc_id AS VARCHAR) ||
        |           '@exemplo.com 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      ELSE text END AS text, lang
        |  FROM documents),
        |kmin AS (SELECT text, min(doc_id) AS keep FROM src GROUP BY text),
        |dd AS (SELECT d.doc_id, d.lang, d.text FROM src d
        |  JOIN kmin ON d.text = kmin.text AND d.doc_id = kmin.keep),
        |sc AS (SELECT doc_id, lang, text,
        |  0.4 * (CAST(len(list_filter(tk, t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |         / greatest(CAST(len(tk) AS DOUBLE), 1.0)) +
        |  0.3 * least(1.0,
        |    (CAST(list_aggregate(list_transform(tk, t -> len(t)), 'sum') AS DOUBLE)
        |     / greatest(CAST(len(tk) AS DOUBLE), 1.0)) / 8.0) -
        |  0.2 * (CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0)) -
        |  0.1 * (CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
        |         / greatest(CAST(len(text) AS DOUBLE), 1.0))
        |    AS qualidade
        |  FROM (SELECT doc_id, lang, text,
        |          string_split_regex(trim(lower(text)), '\s+') AS tk
        |        FROM dd)),
        |qf AS (SELECT * FROM sc WHERE qualidade >= 0.19),
        |t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM qf),
        |c AS (SELECT doc_id, tk,
        |    1 + CAST(ceil(greatest(len(tk) - 5, 0) / 5.0) AS INT) AS nch
        |  FROM t),
        |ch AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
        |    array_to_string(tk[u.i * 5 + 1 : u.i * 5 + 5], ' ') AS chunk_text
        |  FROM c, LATERAL unnest(generate_series(0, nch - 1)) u(i)),
        |f AS (SELECT chunk_text, true AS hit FROM ch
        |  GROUP BY chunk_text HAVING count(DISTINCT doc_id) > 2),
        |kk AS (SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text, f.hit
        |  FROM ch LEFT JOIN f USING (chunk_text)),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |    string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS texto_limpo
        |  FROM kk WHERE hit IS NULL GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1),
        |pg AS (SELECT tot.doc_id,
        |    coalesce(reb.texto_limpo, '') AS texto_limpo,
        |    CAST(tot.n_chunks - coalesce(reb.kept, 0) AS BIGINT) AS n_removidos
        |  FROM tot LEFT JOIN reb USING (doc_id)),
        |j AS (SELECT qf.doc_id, qf.lang, qf.qualidade, pg.texto_limpo,
        |    pg.n_removidos
        |  FROM qf JOIN pg USING (doc_id)),
        |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS cd FROM j GROUP BY lang),
        |w AS (SELECT lang, cd, sqrt(CAST(cd AS DOUBLE)) AS wd FROM cnt),
        |tt AS (SELECT CAST(sum(cd) AS HUGEINT) AS n,
        |    CAST(CAST(sum(CAST(wd AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |      AS DOUBLE) AS wsum
        |  FROM w),
        |p AS (SELECT lang,
        |    least(1.0, wd / wsum * 0.5 * CAST(n AS DOUBLE) / CAST(cd AS DOUBLE))
        |      AS p_keep
        |  FROM w, tt),
        |fin AS (SELECT j.doc_id, j.lang, j.qualidade, j.texto_limpo,
        |    j.n_removidos, p.p_keep
        |  FROM j JOIN p USING (lang)
        |  WHERE CAST(CAST(('0x' || substring(md5(CAST(j.doc_id AS VARCHAR)), 1, 8))
        |          AS BIGINT) AS DOUBLE) / 4294967296.0 < p_keep),
        |bsh AS (SELECT DISTINCT s FROM (
        |  SELECT unnest(CASE WHEN len(btk) >= 5
        |    THEN [array_to_string(btk[i:i+4], ' ') for i in range(1, len(btk) - 3)]
        |    ELSE [] END) AS s
        |  FROM (SELECT string_split_regex(trim(lower(
        |          array_to_string(tk[1:24], ' '))), '\s+') AS btk
        |        FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |              FROM src WHERE doc_id % 41 = 0)))),
        |dsh AS (SELECT doc_id, list_distinct(CASE WHEN len(ck) >= 5
        |    THEN [array_to_string(ck[i:i+4], ' ') for i in range(1, len(ck) - 3)]
        |    ELSE [] END) AS sh
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(lower(texto_limpo)), '\s+') AS ck
        |        FROM fin)),
        |hits AS (SELECT doc_id, count(*) AS n FROM
        |  (SELECT doc_id, unnest(sh) AS s FROM dsh) cc JOIN bsh USING (s)
        |  GROUP BY 1),
        |dec AS (SELECT fin.doc_id, fin.lang, fin.qualidade, fin.n_removidos,
        |    fin.p_keep, fin.texto_limpo AS tl
        |  FROM fin LEFT JOIN hits USING (doc_id)
        |  WHERE coalesce(hits.n, 0) = 0)
        |SELECT doc_id, lang, qualidade, n_removidos, p_keep,
        |  regexp_replace(regexp_replace(regexp_replace(tl,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\(\d{2}\)\s?\d{4,5}-\d{4}', '<TELEFONE>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |    AS texto_limpo,
        |  CAST(len(regexp_extract_all(tl,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(tl,
        |    '\(\d{2}\)\s?\d{4,5}-\d{4}')) AS BIGINT) AS n_telefones,
        |  CAST(len(regexp_extract_all(tl,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips
        |FROM dec
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Per-label centroid (q77's DECIMAL-exact mean), per-vector decimal
    // dot and norms — the q38 idiom — then cosine-to-centroid + flag.
    "q114_centroid_outliers" ->
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS posicao,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |c AS (SELECT label, posicao,
        |    CAST(sum(CAST(v AS DECIMAL(38,18))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS valor
        |  FROM e GROUP BY label, posicao),
        |nv AS (SELECT vec_id,
        |    sqrt(CAST(sum(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
        |  FROM e GROUP BY vec_id),
        |nc AS (SELECT label,
        |    sqrt(CAST(sum(CAST(valor * valor AS DECIMAL(38,18))) AS DOUBLE)) AS nrm
        |  FROM c GROUP BY label),
        |d AS (SELECT e.vec_id, e.label,
        |    CAST(sum(CAST(e.v * c.valor AS DECIMAL(38,18))) AS DOUBLE) AS dot
        |  FROM e JOIN c USING (label, posicao) GROUP BY 1, 2)
        |SELECT d.vec_id, d.label,
        |  d.dot / (nv.nrm * nc.nrm) AS cos_centroide,
        |  d.dot / (nv.nrm * nc.nrm) < 0.0 AS atipico
        |FROM d JOIN nv USING (vec_id) JOIN nc ON d.label = nc.label
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Water-filling replay: ascending availability order, whole-prefix
    // test, then the common level for the capped tail.
    "q115_mixture_plan" ->
      """WITH a AS (SELECT source,
        |    CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS c
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, c,
        |    row_number() OVER (ORDER BY c, source) AS rk,
        |    coalesce(sum(c) OVER (ORDER BY c, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
        |    count(*) OVER () AS n
        |  FROM a),
        |f AS (SELECT *, c * (n - rk + 1) + prefix <= 26000 AS inteiro FROM r),
        |l AS (SELECT sum(CASE WHEN inteiro THEN c ELSE 0 END) AS wsum,
        |    sum(CASE WHEN inteiro THEN 1 ELSE 0 END) AS k FROM f)
        |SELECT source, c AS tokens_disponiveis, inteiro,
        |  CASE WHEN inteiro THEN CAST(c AS DOUBLE)
        |    ELSE CAST(26000 - l.wsum AS DOUBLE) / CAST(f.n - l.k AS DOUBLE)
        |    END AS tokens_alocados,
        |  least(1.0, CASE WHEN inteiro THEN 1.0
        |    ELSE (CAST(26000 - l.wsum AS DOUBLE) / CAST(f.n - l.k AS DOUBLE))
        |         / CAST(c AS DOUBLE) END) AS taxa
        |FROM f, l
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q29's decimal-exact pair scoring restricted to CROSS-label pairs.
    "q116_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 20) q
        |  JOIN embeddings c ON q.label <> c.label),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p
        |  JOIN n nq ON p.query_id = nq.vec_id
        |  JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 5 ORDER BY ALL NULLS FIRST""".stripMargin,

    // q26's portable-MinHash replay with candidates restricted to the
    // batch×corpus boundary, plus the exact text-membership check.
    "q117_ingest_gate" -> {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0)
          s"SELECT id, side, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, side, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      s"""WITH tok AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM documents),
        |batch AS (
        |  SELECT doc_id + 3000000 AS id, text FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, array_to_string(tk[2:], ' ')
        |  FROM tok WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, array_to_string(list_reverse(tk), ' ')
        |  FROM tok WHERE doc_id % 7 = 0),
        |alld AS (
        |  SELECT id, text, 'n' AS side FROM batch
        |  UNION ALL
        |  SELECT doc_id, text, 'e' FROM documents),
        |t AS (
        |  SELECT id, side, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM alld),
        |k AS (
        |  SELECT id, side,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, side, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, side, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id, side,
        |    $mins
        |  FROM shrows GROUP BY id, side),
        |buckets AS (
        |  $bands),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_novo, b.id AS id_existente
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash
        |   AND a.side = 'n' AND b.side = 'e'),
        |vp AS (
        |  SELECT id_novo, id_existente FROM (
        |    SELECT c.id_novo, c.id_existente,
        |      CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE) /
        |      (CAST(len(ka.sh) AS DOUBLE) + CAST(len(kb.sh) AS DOUBLE)
        |       - CAST(len(list_intersect(ka.sh, kb.sh)) AS DOUBLE)) AS jaccard
        |    FROM cand c
        |    JOIN k ka ON c.id_novo = ka.id AND ka.side = 'n'
        |    JOIN k kb ON c.id_existente = kb.id AND kb.side = 'e')
        |  WHERE jaccard >= 0.5),
        |near AS (SELECT id_novo, CAST(count(*) AS BIGINT) AS n
        |  FROM vp GROUP BY 1)
        |SELECT batch.id AS doc_id,
        |  batch.text IN (SELECT text FROM documents) AS exato,
        |  coalesce(near.n, 0) AS n_quase_dups,
        |  NOT batch.text IN (SELECT text FROM documents)
        |    AND coalesce(near.n, 0) = 0 AS mantido
        |FROM batch LEFT JOIN near ON batch.id = near.id_novo
        |ORDER BY ALL NULLS FIRST""".stripMargin
    },

    // q65's add-one bigram model with fit (reference = 'en') and apply
    // (target = the rest) split; unseen grams coalesce to 0 counts.
    "q118_lm_cross_score" ->
      """WITH rt AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE lang = 'en'),
        |tt AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents WHERE lang <> 'en'),
        |uni AS (SELECT u AS w, count(*) AS cu
        |  FROM (SELECT unnest(tk) AS u FROM rt) GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM uni),
        |cb AS (SELECT g, count(*) AS cb FROM (
        |  SELECT unnest(CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    ELSE [] END) AS g
        |  FROM rt) GROUP BY 1),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    ELSE [] END) AS g
        |  FROM tt),
        |p AS (SELECT doc_id,
        |    CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE) /
        |    CAST(coalesce(uni.cu, 0) + v.v AS DOUBLE) AS p
        |  FROM bg LEFT JOIN cb USING (g)
        |  LEFT JOIN uni ON split_part(bg.g, ' ', 1) = uni.w
        |  CROSS JOIN v),
        |sc AS (SELECT doc_id, count(*) AS n_bigramas,
        |    sum(CAST(p AS DECIMAL(38,18))) AS psum
        |  FROM p GROUP BY 1)
        |SELECT tt.doc_id,
        |  CAST(coalesce(sc.n_bigramas, 0) AS BIGINT) AS n_bigramas,
        |  coalesce(CAST(sc.psum AS DOUBLE) / CAST(sc.n_bigramas AS DOUBLE), 0.0)
        |    AS lm_score
        |FROM tt LEFT JOIN sc USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Fixed shard hash + per-epoch md5(epoch:id) order, ties by id.
    "q119_epoch_order" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
        |      AS shard
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, shard, 0 AS epoca,
        |    CAST(('0x' || substring(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, shard, 1,
        |    CAST(('0x' || substring(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  FROM d)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY epoca, shard
        |    ORDER BY h, doc_id) AS BIGINT) AS posicao,
        |  epoca
        |FROM e
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same (id, block) percent-hash mask, sentinel numbering by prefix
    // count of masked blocks, block slices identical on both sides.
    "q120_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk,
        |    CAST(ceil(len(string_split_regex(trim(lower(text)), '\s+')) / 5.0) AS INT)
        |      AS nb
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, tk, greatest(nb, 1) AS nb,
        |    [CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 15
        |     for b in range(0, greatest(nb, 1))] AS masked
        |  FROM t)
        |SELECT doc_id,
        |  array_to_string(
        |    [CASE WHEN masked[b + 1]
        |       THEN '<extra_id_' ||
        |            CAST(len(list_filter(masked[1:b], x -> x)) AS VARCHAR) || '>'
        |       ELSE array_to_string(tk[b * 5 + 1 : b * 5 + 5], ' ') END
        |     for b in range(0, nb)], ' ') AS entrada,
        |  coalesce(array_to_string(
        |    ['<extra_id_' ||
        |       CAST(len(list_filter(masked[1:b], x -> x)) AS VARCHAR) || '> ' ||
        |       array_to_string(tk[b * 5 + 1 : b * 5 + 5], ' ')
        |     for b in range(0, nb) if masked[b + 1]], ' '), '') AS alvo,
        |  CAST(nb AS BIGINT) AS n_blocos,
        |  CAST(len(list_filter(masked, x -> x)) AS BIGINT) AS n_mascarados
        |FROM m
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same hashed unigram+bigram buckets as q109, same log-free ratio
    // arithmetic: exact integer products, one IEEE division per bucket,
    // DECIMAL(38,18) per-doc sum, one final mean division.
    "q121_dsir_select" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, unnest(tk) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id, lang, unnest([array_to_string(tk[i:i+1], ' ')
        |                               for i in range(1, len(tk))]) AS g
        |  FROM t WHERE len(tk) >= 2),
        |b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 1024 AS bucket
        |  FROM feats WHERE g <> ''),
        |ct AS (SELECT bucket, count(*) AS c_t FROM b WHERE lang = 'en'
        |       GROUP BY bucket),
        |cr AS (SELECT bucket, count(*) AS c_r FROM b WHERE lang <> 'en'
        |       GROUP BY bucket),
        |tot AS (SELECT (SELECT CAST(sum(c_t) AS BIGINT) FROM ct) AS n_t,
        |               (SELECT CAST(sum(c_r) AS BIGINT) FROM cr) AS n_r),
        |ratio AS (
        |  SELECT cr.bucket,
        |    CAST((coalesce(ct.c_t, 0) + 1) * (tot.n_r + 1024) AS DOUBLE) /
        |    CAST((cr.c_r + 1) * (tot.n_t + 1024) AS DOUBLE) AS r
        |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tot),
        |s AS (
        |  SELECT doc_id, count(*) AS n_feats,
        |    sum(CAST(r AS DECIMAL(38,18))) AS rsum
        |  FROM b JOIN ratio USING (bucket)
        |  WHERE lang <> 'en'
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
        |  coalesce(CAST(s.rsum AS DOUBLE) / CAST(s.n_feats AS DOUBLE), 0.0)
        |    AS dsir_score,
        |  coalesce(CAST(s.rsum AS DOUBLE) / CAST(s.n_feats AS DOUBLE), 0.0) > 1.0
        |    AS selecionado
        |FROM documents d LEFT JOIN s USING (doc_id)
        |WHERE d.lang <> 'en'
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same 1..2-gram fan-out as q109/q121, inline VALUES dictionary.
    "q122_dict_tagging" ->
      """WITH dict(frase, etiqueta) AS (VALUES
        |  ('hash join', 'joins'), ('merge join', 'joins'), ('join', 'joins'),
        |  ('table scan', 'scans'), ('scan', 'scans'),
        |  ('stream', 'streaming'), ('window', 'streaming'),
        |  ('group', 'olap'), ('agg', 'olap'), ('sort', 'olap')),
        |t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(tk) AS gr FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
        |                         for i in range(1, len(tk))]) AS gr
        |  FROM t WHERE len(tk) >= 2)
        |SELECT doc_id, etiqueta,
        |  CAST(count(*) AS BIGINT) AS n_matches,
        |  CAST(count(DISTINCT frase) AS BIGINT) AS n_frases
        |FROM grams JOIN dict ON grams.gr = dict.frase AND gr <> ''
        |GROUP BY doc_id, etiqueta
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q123_perceptron_train" -> perceptronOracle(buckets = 256, epochs = 3),

    // Every dHash bit predicted from the same md5 block pattern the PNGs
    // were painted with; same 4×14-bit bands, same bit_count verify.
    "q124_image_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 8
        |  FROM documents WHERE doc_id % 7 = 0),
        |blocks AS (
        |  SELECT doc_id,
        |    flatten([[
        |      (CAST(('0x' || substring(md5(seed || ':' || CAST(bx AS VARCHAR)
        |         || ':' || CAST(by AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |       + CASE WHEN bx = 0 AND by = 0 THEN delta ELSE 0 END) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM blocks),
        |banded AS (
        |  SELECT doc_id, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM hashes, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q125_selftrain_gate" -> selfTrainOracle(buckets = 256, epochs = 3),

    // The 57-segment envelope algebra replayed: segment levels from the
    // same md5, equal segment lengths so "louder" is a direct compare.
    "q129_audio_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 777
        |  FROM documents WHERE doc_id % 11 = 0),
        |env AS (
        |  SELECT doc_id,
        |    [CAST(('0x' || substring(md5(seed || ':' || CAST(s AS VARCHAR)),
        |       1, 8)) AS BIGINT) % 16384
        |     + CASE WHEN s = 0 THEN delta ELSE 0 END
        |     for s in range(0, 57)] AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id,
        |    CAST(list_sum([
        |      CASE WHEN v[s + 1] > v[s + 2]
        |           THEN (CAST(1 AS BIGINT) << s) ELSE 0 END
        |      for s in range(0, 56)]) AS BIGINT) AS h
        |  FROM env),
        |banded AS (
        |  SELECT doc_id, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM hashes, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.h AS ha, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS dist
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q124's block algebra with a frame key folded into the md5; same
    // bands, same bit_count verify, one frame-vote aggregation on top.
    "q128_video_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) AS seed, 0 AS delta
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, CAST(doc_id AS VARCHAR), 8
        |  FROM documents WHERE doc_id % 9 = 0),
        |fv AS (
        |  SELECT doc_id, f,
        |    flatten([[
        |      (CAST(('0x' || substring(md5(seed || ':' || CAST(f AS VARCHAR)
        |         || ':' || CAST(bx AS VARCHAR) || ':' || CAST(by AS VARCHAR)),
        |         1, 8)) AS BIGINT) % 256
        |       + CASE WHEN bx = 0 AND by = 0 THEN delta ELSE 0 END) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids, (SELECT unnest(range(0, 4)) AS f)),
        |fh AS (
        |  SELECT doc_id, f,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM fv),
        |banded AS (
        |  SELECT doc_id, f, h, band, (h >> (band * 14)) % 16384 AS bhash
        |  FROM fh, (SELECT unnest(range(0, 4)) AS band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, a.f AS fa, a.h AS ha,
        |    b.doc_id AS id_b, b.f AS fb, b.h AS hb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(count(DISTINCT fa) AS BIGINT) AS n_frames_casados
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 4
        |GROUP BY id_a, id_b HAVING count(DISTINCT fa) >= 3
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q26's signature/bucket CTEs verbatim; the verify swaps the exact
    // shingle intersection for per-component signature agreement / 20.
    "q127_minhash_estimate" -> minhashEstimateSql,

    // identical audit through the persisted signature index — the index
    // roundtrip is an identity, so the oracle is q127's SQL verbatim
    "q130_minhash_index_audit" -> minhashEstimateSql,

    // lnc.ltc replay: tf-only doc norms, query-side log-free idf N/df,
    // DECIMAL-accumulated dot products and norms, IEEE sqrt/÷ exact
    "q131_tfidf_retrieval" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |dnorm AS (
        |  SELECT doc_id,
        |    sqrt(CAST(CAST(sum(CAST(CAST(tf AS DOUBLE) * CAST(tf AS DOUBLE)
        |      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE)) AS dnorm
        |  FROM post GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |qpost AS (
        |  SELECT query_id, term, CAST(count(*) AS BIGINT) AS qtf
        |  FROM (SELECT doc_id AS query_id,
        |          unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |        FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8))
        |  GROUP BY query_id, term),
        |dfreq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qpost) GROUP BY term),
        |qw AS (
        |  SELECT query_id, term,
        |    CAST(qtf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS wq
        |  FROM qpost JOIN dfreq USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)),
        |qnorm AS (
        |  SELECT query_id,
        |    sqrt(CAST(CAST(sum(CAST(wq * wq AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS DOUBLE)) AS qnorm
        |  FROM qw GROUP BY query_id),
        |scored AS (
        |  SELECT query_id, p.doc_id,
        |    CAST(CAST(sum(CAST(CAST(p.tf AS DOUBLE) * wq AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) / (qnorm * dnorm) AS score
        |  FROM qw JOIN post p USING (term) JOIN dnorm d ON p.doc_id = d.doc_id
        |       JOIN qnorm USING (query_id)
        |  GROUP BY query_id, p.doc_id, qnorm, dnorm)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM scored
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // the sketch replayed cell-for-cell: same md5 h1/h2 split as q127,
    // rows i=0..3 via a cross-joined range, j = ((h1+i·h2) mod P) mod 256
    "q132_countmin_bigrams" ->
      """WITH tk AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT unnest([tk[i] || ' ' || tk[i+1]
        |                 for i in range(1, len(tk))]) AS bigram
        |  FROM tk),
        |h AS (
        |  SELECT bigram,
        |    CAST(('0x' || substring(md5(bigram), 1, 8)) AS BIGINT) AS h1,
        |    CAST(('0x' || substring(md5(bigram), 9, 8)) AS BIGINT) AS h2
        |  FROM bg),
        |cells AS (
        |  SELECT u.i, ((h1 + u.i * h2) % 4294967291) % 256 AS j
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 4)) AS i) u),
        |sketch AS (
        |  SELECT i, j, CAST(count(*) AS BIGINT) AS c
        |  FROM cells GROUP BY i, j),
        |exact AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        |  FROM bg GROUP BY bigram),
        |probes AS (
        |  SELECT e.bigram, u.i,
        |    ((CAST(('0x' || substring(md5(e.bigram), 1, 8)) AS BIGINT) +
        |      u.i * CAST(('0x' || substring(md5(e.bigram), 9, 8)) AS BIGINT))
        |     % 4294967291) % 256 AS j
        |  FROM exact e CROSS JOIN (SELECT unnest(range(0, 4)) AS i) u),
        |est AS (
        |  SELECT bigram, min(coalesce(c, 0)) AS est
        |  FROM probes p LEFT JOIN sketch s ON p.i = s.i AND p.j = s.j
        |  GROUP BY bigram)
        |SELECT bigram, cnt, est
        |FROM est JOIN exact USING (bigram)
        |WHERE est >= 50
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // boundary after token p (p>=3) iff md5-h1 of the 3-shingle ending at
    // p is = 0 mod 16; chunk id = exclusive running boundary count; chunk
    // text reassembled in position order, spread counted by content hash
    "q133_cdc_chunk_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    'prefixo deslocador inserido aqui ' || text
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM all_docs),
        |rows_ AS (
        |  SELECT doc_id,
        |    unnest(range(1, len(tk) + 1)) AS pos,
        |    unnest(tk) AS tok,
        |    unnest([p >= 3 AND
        |        (CAST(('0x' || substring(
        |           md5(array_to_string(tk[p-2:p], ' ')), 1, 8)) AS BIGINT)
        |         % 16) = 0
        |      for p in range(1, len(tk) + 1)]) AS b
        |  FROM t),
        |cid AS (
        |  SELECT doc_id, pos, tok,
        |    coalesce(sum(CASE WHEN b THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
        |  FROM rows_),
        |chunks AS (
        |  SELECT doc_id, chunk,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        |  FROM cid GROUP BY doc_id, chunk),
        |spread AS (
        |  SELECT chunk_hash, count(DISTINCT doc_id) AS docs FROM chunks
        |  GROUP BY chunk_hash)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_compartilhados,
        |  CAST(CAST(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
        |    AS frac_compartilhada
        |FROM chunks JOIN spread USING (chunk_hash)
        |GROUP BY doc_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q125's training replay chained into the sign×digit-count binning
    "q134_calibration_audit" -> calibrationOracle(buckets = 256, epochs = 3),

    // q124's dHash block algebra (delta = 0), seeds derived from md5 of
    // the TEXT; pairs from exact-text groups, verdict = bit_count(xor)
    "q135_crossmodal_audit" ->
      """WITH ids AS (
        |  SELECT doc_id, text, md5(text) AS seed FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, md5(text)
        |  FROM documents WHERE doc_id % 6 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, md5(text) || 'x'
        |  FROM documents WHERE doc_id % 9 = 0),
        |blocks AS (
        |  SELECT doc_id, text,
        |    flatten([[
        |      CAST(('0x' || substring(md5(seed || ':' || CAST(bx AS VARCHAR)
        |         || ':' || CAST(by AS VARCHAR)), 1, 8)) AS BIGINT) % 256
        |      for bx in range(0, 8)] for by in range(0, 8)]) AS v
        |  FROM ids),
        |hashes AS (
        |  SELECT doc_id, text,
        |    CAST(list_sum(flatten([[
        |      CASE WHEN v[by * 8 + bx + 1] > v[by * 8 + bx + 2]
        |           THEN (CAST(1 AS BIGINT) << (by * 7 + bx)) ELSE 0 END
        |      for bx in range(0, 7)] for by in range(0, 8)])) AS BIGINT) AS h
        |  FROM blocks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS dist,
        |  bit_count(xor(a.h, b.h)) <= 4 AS consistente
        |FROM hashes a JOIN hashes b ON a.text = b.text AND a.doc_id < b.doc_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // the persisted-index roundtrip is score-identical — q99's replay
    "q136_bm25_indexed" -> bm25Sql,

    // OLS closed form over exact DECIMAL sufficient statistics; the
    // doubles divide in the same order as the Spark expression
    "q137_group_linear_fit" ->
      """WITH j AS (
        |  SELECT c_mktsegment,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS INT) AS x,
        |    o_totalprice AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |agg AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sy,
        |    CAST(sum(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS sxy,
        |    CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |      AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxx
        |  FROM j GROUP BY c_mktsegment),
        |d AS (
        |  SELECT c_mktsegment, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd
        |  FROM agg)
        |SELECT c_mktsegment, n,
        |  CASE WHEN n >= 2 AND (nd * sxxd - sxd * sxd) <> 0.0
        |       THEN (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
        |  END AS inclinacao,
        |  CASE WHEN n >= 2 AND (nd * sxxd - sxd * sxd) <> 0.0
        |       THEN (syd - ((nd * sxyd - sxd * syd) /
        |                    (nd * sxxd - sxd * sxd)) * sxd) / nd
        |  END AS intercepto
        |FROM d
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // every ±1 sign from md5(i:j), element casts and the DECIMAL sum
    // replayed exactly; parallel unnests zip (pos, value)
    "q138_random_projection" ->
      """WITH sub AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
        |el AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS i,
        |    unnest(embedding) AS x
        |  FROM sub),
        |c AS (
        |  SELECT vec_id, CAST(jt.j AS INT) AS j,
        |    CAST(CAST(x AS DOUBLE) *
        |      (CASE WHEN CAST(('0x' || substring(
        |           md5(CAST(i AS VARCHAR) || ':' || CAST(jt.j AS VARCHAR)),
        |           1, 8)) AS BIGINT) % 2 = 0
        |            THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18)) AS c
        |  FROM el CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jt)
        |SELECT vec_id, j,
        |  CAST(CAST(sum(c) AS DECIMAL(38,18)) AS DOUBLE) AS valor
        |FROM c GROUP BY vec_id, j
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // both stages replayed: unit-normalize (guarded norm), project with
    // md5 signs, screen rank at 50, exact decimal cosine re-rank at 10
    "q139_screened_topk" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    greatest(sqrt(CAST(list_aggregate(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE)), 1e-12) AS nrm
        |  FROM embeddings),
        |u AS (
        |  SELECT e.vec_id,
        |    list_transform(e.embedding, x -> CAST(x AS DOUBLE) / nrm) AS u
        |  FROM embeddings e JOIN n USING (vec_id)),
        |qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 32),
        |el AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(u))) AS i,
        |    unnest(u) AS x
        |  FROM u),
        |proj AS (
        |  SELECT vec_id, jt.j,
        |    CAST(CAST(sum(CAST(x * (CASE WHEN CAST(('0x' || substring(
        |        md5(CAST(i AS VARCHAR) || ':' || CAST(jt.j AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) AS valor
        |  FROM el CROSS JOIN (SELECT unnest(range(0, 8)) AS j) jt
        |  GROUP BY vec_id, jt.j),
        |dots AS (
        |  SELECT qp.vec_id AS query_id, cp.vec_id AS corpus_id,
        |    CAST(CAST(sum(CAST(qp.valor * cp.valor AS DECIMAL(38,18)))
        |      AS DECIMAL(38,18)) AS DOUBLE) AS screen
        |  FROM proj qp JOIN proj cp USING (j)
        |  WHERE qp.vec_id IN (SELECT vec_id FROM qids)
        |  GROUP BY query_id, corpus_id),
        |cand AS (
        |  SELECT query_id, corpus_id FROM (
        |    SELECT query_id, corpus_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY screen DESC, corpus_id ASC) AS r
        |    FROM dots) WHERE r <= 50),
        |p AS (
        |  SELECT c.query_id, c.corpus_id,
        |    CAST(list_aggregate(list_transform(list_zip(qe.embedding, ce.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) AS dot
        |  FROM cand c
        |  JOIN embeddings qe ON c.query_id = qe.vec_id
        |  JOIN embeddings ce ON c.corpus_id = ce.vec_id),
        |s AS (
        |  SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine
        |  FROM p JOIN n nq ON p.query_id = nq.vec_id
        |         JOIN n nc ON p.corpus_id = nc.vec_id)
        |SELECT * FROM (
        |  SELECT query_id, corpus_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, corpus_id ASC) AS BIGINT) AS rank
        |  FROM s)
        |WHERE rank <= 10 ORDER BY ALL NULLS FIRST""".stripMargin,

    "q140_pagerank" -> pageRankOracle(iters = 3),

    // q99's replay nested as a CTE (ORDER BY stripped), exact-duplicate
    // relevance, integer-ratio eval arithmetic
    "q141_retrieval_eval" ->
      s"""WITH ranked AS (
${bm25Sql.replace("ORDER BY ALL NULLS FIRST", "")}),
rel AS (
  SELECT q.doc_id AS query_id, d.doc_id
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8) q
  JOIN documents d ON d.text = q.text),
relcount AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevantes
  FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, r.doc_id, r.posicao,
    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM ranked r LEFT JOIN rel
    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE r.posicao <= 5),
per AS (
  SELECT query_id,
    CAST(sum(h) AS BIGINT) AS n_acertos,
    min(CASE WHEN h = 1 THEN posicao END) AS first_rel
  FROM hits GROUP BY query_id)
SELECT rc.query_id, rc.n_relevantes,
  CAST(coalesce(p.n_acertos, 0) AS BIGINT) AS n_acertos,
  CAST(CAST(coalesce(p.n_acertos, 0) AS BIGINT) AS DOUBLE) /
    CAST(rc.n_relevantes AS DOUBLE) AS recall,
  coalesce(1.0 / CAST(p.first_rel AS DOUBLE), 0.0) AS rr
FROM relcount rc LEFT JOIN per p USING (query_id)
ORDER BY ALL NULLS FIRST""",

    // Same ranked/rel CTEs as q141; replays the cumulative-hit window
    // and the rank-ordered precision fold.
    "q211_avg_precision" ->
      s"""WITH ranked AS (
${bm25Sql.replace("ORDER BY ALL NULLS FIRST", "")}),
rel AS (
  SELECT q.doc_id AS query_id, d.doc_id
  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8) q
  JOIN documents d ON d.text = q.text),
relcount AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevantes
  FROM rel GROUP BY query_id),
hits AS (
  SELECT r.query_id, r.posicao,
    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM ranked r LEFT JOIN rel
    ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
  WHERE r.posicao <= 5),
ch AS (
  SELECT query_id, posicao, h,
    CAST(sum(h) OVER (PARTITION BY query_id ORDER BY posicao
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM hits),
ap AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS n_acertos,
    0.0 + list_reduce(
      list(CAST(c AS DOUBLE) / CAST(posicao AS DOUBLE) ORDER BY posicao),
      (acc, x) -> acc + x) AS apsum
  FROM ch WHERE h = 1 GROUP BY query_id)
SELECT rc.query_id, rc.n_relevantes,
  CAST(coalesce(a.n_acertos, 0) AS BIGINT) AS n_acertos,
  coalesce(a.apsum, 0.0) / CAST(rc.n_relevantes AS DOUBLE) AS ap
FROM relcount rc LEFT JOIN ap a USING (query_id)
ORDER BY ALL NULLS FIRST""",

    // normalization, the two blocking passes and the exact edit
    // distance replayed; Spark's substring(-n) = DuckDB len(nm)-n+1
    "q142_fuzzy_linkage" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nm FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    lower(trim(substring(c_name, 1, 12) || substring(c_name, 14)))
        |  FROM customer WHERE c_custkey % 7 = 0),
        |keys AS (
        |  SELECT id, nm, 0 AS pass, substring(nm, len(nm) - 3, 4) AS key
        |  FROM base),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |    a.nm AS nm_a, b.nm AS nm_b
        |  FROM keys a JOIN keys b
        |    ON a.pass = b.pass AND a.key = b.key AND a.id < b.id
        |  WHERE a.key IS NOT NULL AND a.key <> '')
        |SELECT id_a, id_b, CAST(levenshtein(nm_a, nm_b) AS BIGINT) AS dist
        |FROM cand
        |WHERE levenshtein(nm_a, nm_b) <= 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q143_mmr_diversify" -> mmrOracle(k = 5),

    // each group's own month calendar, the left join back and the
    // running ignore-nulls carry replayed exactly
    "q144_gap_fill" ->
      """WITH m AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS valor
        |  FROM orders GROUP BY o_custkey, mes),
        |b AS (
        |  SELECT o_custkey, min(mes) AS mn, max(mes) AS mx
        |  FROM m GROUP BY o_custkey),
        |cal AS (
        |  SELECT o_custkey,
        |    CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE) AS mes
        |  FROM b)
        |SELECT cal.o_custkey, cal.mes, m.valor,
        |  m.valor IS NOT NULL AS presente,
        |  last_value(m.valor IGNORE NULLS) OVER (
        |    PARTITION BY cal.o_custkey ORDER BY cal.mes
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS valor_carregado
        |FROM cal LEFT JOIN m ON cal.o_custkey = m.o_custkey AND cal.mes = m.mes
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q145_cohort_retention" ->
      """WITH a AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mes
        |  FROM orders),
        |c AS (SELECT o_custkey, min(mes) AS cohorte FROM a GROUP BY o_custkey)
        |SELECT cohorte,
        |  CAST(date_diff('month', cohorte, mes) AS INT) AS offset_meses,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS entidades_ativas
        |FROM a JOIN c USING (o_custkey)
        |GROUP BY cohorte, offset_meses
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q146_triangle_count" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
        |  FROM lineitem WHERE l_partkey % 20 = 0),
        |e AS (
        |  SELECT DISTINCT a.sup AS a, b.sup AS b
        |  FROM ps a JOIN ps b ON a.p = b.p AND a.sup < b.sup),
        |wedge AS (
        |  SELECT e1.a, e1.b AS m, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a),
        |tri AS (
        |  SELECT w.a, w.m AS b, w.c
        |  FROM wedge w JOIN e ON w.a = e.a AND w.c = e.b)
        |SELECT vertice, CAST(count(*) AS BIGINT) AS triangulos FROM (
        |  SELECT a AS vertice FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |GROUP BY vertice
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q147_pareto_abc" ->
      """WITH spend AS (
        |  SELECT c_mktsegment, o_custkey,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS DOUBLE) AS gasto
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_custkey),
        |s AS (
        |  SELECT c_mktsegment, o_custkey, gasto,
        |    CAST(CAST(sum(CAST(gasto AS DECIMAL(38,6))) OVER (
        |      PARTITION BY c_mktsegment ORDER BY gasto DESC, o_custkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,6)) AS DOUBLE) /
        |    CAST(CAST(sum(CAST(gasto AS DECIMAL(38,6))) OVER (
        |      PARTITION BY c_mktsegment) AS DECIMAL(38,6)) AS DOUBLE)
        |      AS share_acumulada
        |  FROM spend)
        |SELECT c_mktsegment, o_custkey, gasto, share_acumulada,
        |  CASE WHEN share_acumulada <= 0.8 THEN 'A'
        |       WHEN share_acumulada <= 0.95 THEN 'B'
        |       ELSE 'C' END AS classe
        |FROM s
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q148_contiguous_ids" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS seq_id
        |FROM orders ORDER BY ALL NULLS FIRST""".stripMargin,

    "q149_erasure_audit" ->
      """WITH k AS (
        |  SELECT DISTINCT c_custkey AS kk FROM customer
        |  WHERE c_custkey % 13 = 0),
        |c AS (
        |  SELECT 'customer' AS tabela, CAST(count(*) AS BIGINT) AS n_linhas,
        |    CAST(sum(CASE WHEN kk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_apagar
        |  FROM customer LEFT JOIN k ON c_custkey = kk),
        |o AS (
        |  SELECT 'orders', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN kk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders LEFT JOIN k ON o_custkey = kk)
        |SELECT tabela, n_linhas, n_apagar,
        |  n_linhas - n_apagar AS n_restantes
        |FROM (SELECT * FROM c UNION ALL SELECT * FROM o)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q150_zscore_anomalies" ->
      """WITH s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
        |    CAST(sum(CAST(value * value AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS sxx
        |  FROM events GROUP BY event_type),
        |st AS (
        |  SELECT event_type,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS media,
        |    sqrt(greatest(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) -
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)) AS desvio
        |  FROM s)
        |SELECT event_id, event_type, value, media, desvio,
        |  CASE WHEN desvio > 0.0 THEN abs(value - media) / desvio
        |       ELSE 0.0 END AS z_score
        |FROM events JOIN st USING (event_type)
        |WHERE (CASE WHEN desvio > 0.0 THEN abs(value - media) / desvio
        |            ELSE 0.0 END) > 3.0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // q142's blocking+DP, q52's recursive closure, deterministic
    // survivorship rank — the whole golden-record path replayed
    "q151_golden_record" ->
      """WITH RECURSIVE base AS (
        |  SELECT c_custkey AS id, c_name AS nome, c_acctbal AS saldo
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    substring(c_name, 1, 12) || substring(c_name, 14),
        |    c_acctbal + 100.0
        |  FROM customer WHERE c_custkey % 7 = 0),
        |keyed AS (SELECT id, lower(trim(nome)) AS nm FROM base),
        |e AS (
        |  SELECT DISTINCT a.id AS a, b.id AS b
        |  FROM keyed a JOIN keyed b
        |    ON substring(a.nm, len(a.nm) - 3, 4) =
        |       substring(b.nm, len(b.nm) - 3, 4)
        |   AND a.id < b.id
        |  WHERE levenshtein(a.nm, b.nm) <= 1),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |reach(n, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.n, sym.b FROM reach JOIN sym ON reach.r = sym.a),
        |lab AS (SELECT n AS id, LEAST(n, MIN(r)) AS cluster_id
        |        FROM reach GROUP BY n),
        |full_ AS (
        |  SELECT coalesce(lab.cluster_id, base.id) AS cluster_id,
        |    base.id, base.nome, base.saldo
        |  FROM base LEFT JOIN lab ON base.id = lab.id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY len(nome) DESC, nome DESC, id ASC) AS r
        |  FROM full_)
        |SELECT cluster_id,
        |  CAST(count(*) AS BIGINT) AS membros,
        |  min(id) AS id_canonico,
        |  max(CASE WHEN r = 1 THEN nome END) AS nome_canonico,
        |  max(saldo) AS saldo_max
        |FROM rk GROUP BY cluster_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    "q152_basket_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey % 100 AS i
        |  FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM items),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS ni
        |        FROM items GROUP BY i),
        |pairs AS (
        |  SELECT a.i AS item_a, b.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ambos
        |  FROM items a JOIN items b ON a.b = b.b AND a.i <> b.i
        |  GROUP BY item_a, item_b
        |  HAVING count(*) >= 5)
        |SELECT item_a, item_b, n_ambos,
        |  CAST(n_ambos AS DOUBLE) / CAST(n AS DOUBLE) AS suporte,
        |  CAST(n_ambos AS DOUBLE) / CAST(sa.ni AS DOUBLE) AS confianca,
        |  (CAST(n_ambos AS DOUBLE) / CAST(sa.ni AS DOUBLE)) /
        |    (CAST(sb.ni AS DOUBLE) / CAST(n AS DOUBLE)) AS lift
        |FROM pairs
        |JOIN sup sa ON pairs.item_a = sa.i
        |JOIN sup sb ON pairs.item_b = sb.i, nb
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the systematic-PPS walk globally (the engine's 256
    // order-prefix buckets reassemble exactly this order): DECIMAL
    // cumulative weights over (md5(id), id), selection points at
    // k·(W/60) via the identical double multiply/divide/floor per
    // interval end.
    "q153_pps_sample" ->
      """WITH w AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(n_chars AS DECIMAL(38,6)) AS wd
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_chars, wd,
        |    SUM(wd) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(wd) OVER () AS tot
        |  FROM w)
        |SELECT doc_id, lang, n_chars,
        |  CAST(floor(CAST(cum AS DOUBLE) * 60 / CAST(tot AS DOUBLE)) -
        |       floor(CAST(cum - wd AS DOUBLE) * 60 / CAST(tot AS DOUBLE))
        |    AS BIGINT) AS pontos
        |FROM c
        |WHERE floor(CAST(cum AS DOUBLE) * 60 / CAST(tot AS DOUBLE)) >
        |      floor(CAST(cum - wd AS DOUBLE) * 60 / CAST(tot AS DOUBLE))
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays tokenize -> unigram/bigram counts -> support cut -> the
    // exact DECIMAL PMI-ratio products and the single IEEE division.
    "q154_collocations" ->
      """WITH t AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(tk) AS w FROM t)
        |  WHERE w <> '' GROUP BY 1),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bg AS (
        |  SELECT unnest(CASE WHEN len(tk) >= 2
        |    THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    ELSE [] END) AS g
        |  FROM t),
        |cb AS (SELECT g, CAST(count(*) AS BIGINT) AS n_par
        |       FROM bg GROUP BY 1),
        |nb AS (SELECT CAST(sum(n_par) AS BIGINT) AS b FROM cb)
        |SELECT split_part(g, ' ', 1) AS token_a,
        |  split_part(g, ' ', 2) AS token_b,
        |  n_par, ua.c AS n_a, ub.c AS n_b,
        |  CAST(CAST(n_par AS DECIMAL(38,0)) * n * n AS DOUBLE) /
        |    CAST(CAST(b AS DECIMAL(38,0)) * ua.c * ub.c AS DOUBLE) AS lift
        |FROM cb
        |JOIN uni ua ON split_part(g, ' ', 1) = ua.w
        |JOIN uni ub ON split_part(g, ' ', 2) = ub.w, nt, nb
        |WHERE n_par >= 8
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // One row per declared expectation: row-local checks from one
    // conditional-count pass, uniqueness from grouped counts, RI from a
    // left join over non-null FKs.
    "q155_expectations" ->
      """WITH loc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_nn,
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('F','O') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v_av,
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND (o_totalprice < 1000.0 OR o_totalprice > 300000.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_ir
        |  FROM orders),
        |uq AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0)
        |      AS BIGINT) AS v,
        |    CAST(coalesce(sum(n), 0) AS BIGINT) AS total
        |  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)),
        |ri AS (
        |  SELECT
        |    CAST(coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1
        |      ELSE 0 END), 0) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS total
        |  FROM orders o
        |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON o.o_custkey = c.c_custkey
        |  WHERE o.o_custkey IS NOT NULL)
        |SELECT 'not_null:o_custkey' AS verificacao, v_nn AS violacoes,
        |  total FROM loc
        |UNION ALL SELECT 'accepted_values:o_orderstatus', v_av, total
        |  FROM loc
        |UNION ALL SELECT 'in_range:o_totalprice', v_ir, total FROM loc
        |UNION ALL SELECT 'unique:o_orderkey', v, total FROM uq
        |UNION ALL SELECT 'ref_integrity:o_custkey', v, total FROM ri
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays positional postings (lateral generate_series = the
    // posexplode), the phrase-term fan-out, candidate starts and both
    // exact counts.
    "q156_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, tk[g.i] AS term, g.i - 1 AS pos
        |  FROM t, LATERAL unnest(generate_series(1, len(tk))) g(i)
        |  WHERE tk[g.i] <> ''),
        |phl AS (
        |  SELECT frase, string_split_regex(trim(lower(frase)), '\s+') AS ptk
        |  FROM (VALUES ('hash join'), ('table scan'), ('sort merge'),
        |        ('the row')) p(frase)),
        |ph AS (
        |  SELECT frase, ptk[g.i] AS term, g.i - 1 AS i
        |  FROM phl, LATERAL unnest(generate_series(1, len(ptk))) g(i)
        |  WHERE ptk[g.i] <> ''),
        |pl AS (SELECT frase, CAST(count(*) AS BIGINT) AS len
        |       FROM ph GROUP BY 1),
        |cand AS (
        |  SELECT post.doc_id, ph.frase, post.pos - ph.i AS s, pl.len
        |  FROM post JOIN ph ON post.term = ph.term JOIN pl USING (frase)),
        |hit AS (
        |  SELECT doc_id, frase
        |  FROM cand GROUP BY doc_id, frase, s, len
        |  HAVING count(*) = len AND s >= 0)
        |SELECT frase, doc_id, CAST(count(*) AS BIGINT) AS ocorrencias
        |FROM hit GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the staged min-resolution chain with the same window
    // bounds.
    "q176_funnel_within" ->
      """WITH s0 AS (
        |  SELECT user_id, min(ts) AS ts_0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT s0.user_id, ts_0, min(e.ts) AS ts_1
        |  FROM s0 LEFT JOIN events e
        |    ON e.user_id = s0.user_id AND e.event_type = 'click'
        |    AND e.ts >= ts_0 AND e.ts <= ts_0 + INTERVAL 2 DAY
        |  GROUP BY 1, 2),
        |s2 AS (
        |  SELECT s1.user_id, ts_0, ts_1, min(e.ts) AS ts_2
        |  FROM s1 LEFT JOIN events e
        |    ON e.user_id = s1.user_id AND e.event_type = 'purchase'
        |    AND e.ts >= ts_1 AND e.ts <= ts_1 + INTERVAL 2 DAY
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, ts_0, ts_1, ts_2,
        |  CAST(CASE WHEN ts_2 IS NOT NULL THEN 3
        |            WHEN ts_1 IS NOT NULL THEN 2
        |            ELSE 1 END AS INT) AS etapas
        |FROM s2
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Computes the over-threshold token set DIRECTLY (no sketch): any
    // guaranteed item the MG candidate pass dropped would surface as a
    // missing row on the Spark side.
    "q177_mg_confirm" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
        |    AS item
        |  FROM documents),
        |c AS (SELECT item, CAST(count(*) AS BIGINT) AS ocorrencias
        |      FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT item, ocorrencias FROM c, n WHERE ocorrencias * 29 > n
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays version 2's defining transform straight off the source
    // table — the snapshot the time-travel read must reproduce exactly.
    "q178_time_travel" ->
      """SELECT doc_id, lang, source,
        |  CAST(n_chars + 1 AS BIGINT) AS n_chars
        |FROM documents WHERE doc_id % 3 = 0
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Brute-force all-pairs over the same shingle sets with the same
    // integer threshold gate — the prefix filter must lose NOTHING.
    "q181_exact_jaccard_join" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' zz9'
        |  FROM documents WHERE doc_id % 7 = 0),
        |t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 5
        |    THEN [array_to_string(tk[i:i+4], ' ') for i in range(1, len(tk) - 3)]
        |    ELSE [] END) AS sh
        |  FROM t),
        |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM k
        |       WHERE len(sh) > 0),
        |e AS (SELECT doc_id, unnest(sh) AS s FROM k),
        |inter AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b,
        |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sz na ON ia = na.doc_id
        |JOIN sz nb ON ib = nb.doc_id
        |WHERE 5 * c >= 3 * (na.n + nb.n - c)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Brute-force all-pairs Levenshtein with the same normalization —
    // the deletion-neighborhood filter must lose NOTHING.
    "q183_edit_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nm FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 10000000,
        |    lower(trim(substring(c_name, 1, 12) || substring(c_name, 14)))
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
        |FROM c a JOIN c b
        |  ON a.id < b.id AND abs(len(a.nm) - len(b.nm)) <= 1
        |WHERE levenshtein(a.nm, b.nm) <= 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays fit (smoothed log-counts, priors, denominators) and apply
    // (decimal-accumulated posteriors, argmax with class-name
    // tie-break) end-to-end from the raw text.
    "q184_naive_bayes" ->
      """WITH tokall AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |    FROM documents) WHERE t <> ''),
        |doctok AS (SELECT doc_id, t, count(*) AS n FROM tokall GROUP BY 1, 2),
        |docn AS (SELECT doc_id, sum(n) AS n_doc FROM doctok GROUP BY 1),
        |trdoc AS (SELECT doc_id, lang FROM documents WHERE doc_id % 3 <> 0),
        |trtok AS (SELECT d.lang AS classe, t.t, count(*) AS cnt
        |          FROM tokall t JOIN trdoc d USING (doc_id) GROUP BY 1, 2),
        |cls AS (SELECT lang AS classe, count(*) AS dc FROM trdoc GROUP BY 1),
        |tot AS (SELECT count(*) AS td FROM trdoc),
        |voc AS (SELECT count(DISTINCT t) AS v FROM trtok),
        |nc AS (SELECT classe, sum(cnt) AS n_c FROM trtok GROUP BY 1),
        |ctbl AS (SELECT c.classe,
        |    ln(CAST(c.dc AS DOUBLE) / CAST(t.td AS DOUBLE)) AS l_prior,
        |    ln(CAST(n.n_c + voc.v AS DOUBLE)) AS l_denom
        |  FROM cls c, tot t, voc, nc n WHERE n.classe = c.classe),
        |mtok AS (SELECT classe, t, ln(CAST(cnt + 1 AS DOUBLE)) AS l_cnt
        |  FROM trtok),
        |m AS (SELECT d.doc_id, mt.classe,
        |    sum(CAST(CAST(d.n AS DOUBLE) * mt.l_cnt AS DECIMAL(38,18))) AS s
        |  FROM doctok d JOIN mtok mt USING (t) GROUP BY 1, 2),
        |sc AS (SELECT dd.doc_id, dd.lang, c.classe,
        |    CAST(c.l_prior AS DECIMAL(38,18))
        |      - CAST(CAST(COALESCE(dn.n_doc, 0) AS DOUBLE) * c.l_denom
        |          AS DECIMAL(38,18))
        |      + COALESCE(m.s, CAST(0 AS DECIMAL(38,18))) AS sc
        |  FROM documents dd
        |  CROSS JOIN ctbl c
        |  LEFT JOIN docn dn ON dn.doc_id = dd.doc_id
        |  LEFT JOIN m ON m.doc_id = dd.doc_id AND m.classe = c.classe)
        |SELECT doc_id, classe AS classe_prevista,
        |  CAST(sc AS DOUBLE) AS pontuacao, lang
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY sc DESC, classe DESC) AS rn
        |  FROM sc)
        |WHERE rn = 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays presence, marginals, the integer selection gate and the
    // edge division.
    "q188_chi2_features" ->
      """WITH pres AS (SELECT DISTINCT doc_id, lang AS classe, t FROM (
        |    SELECT doc_id, lang,
        |      unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        |    FROM documents) WHERE t <> ''),
        |ntot AS (SELECT count(*) AS nn FROM documents),
        |bycls AS (SELECT lang AS classe, count(*) AS nc FROM documents
        |  GROUP BY 1),
        |bytok AS (SELECT t, count(*) AS nt FROM pres GROUP BY 1
        |  HAVING count(*) >= 5),
        |byboth AS (SELECT classe, t, count(*) AS a FROM pres GROUP BY 1, 2),
        |tab AS (SELECT cl.classe, tk.t AS token,
        |    COALESCE(bb.a, 0) AS a, cl.nc - COALESCE(bb.a, 0) AS b,
        |    tk.nt - COALESCE(bb.a, 0) AS c,
        |    nt2.nn - cl.nc - tk.nt + COALESCE(bb.a, 0) AS d
        |  FROM bytok tk CROSS JOIN bycls cl
        |  LEFT JOIN byboth bb ON bb.classe = cl.classe AND bb.t = tk.t
        |  CROSS JOIN ntot nt2),
        |x AS (SELECT *,
        |    CAST(a * d - b * c AS DECIMAL(38,0)) * (a * d - b * c)
        |      * (a + b + c + d) AS num,
        |    CAST((a + b) * (c + d) AS DECIMAL(38,0))
        |      * ((a + c) * (b + d)) AS den
        |  FROM tab)
        |SELECT classe, token, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS qui2
        |FROM x WHERE den > 0 AND num * 100 >= den * 384
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the bounded lag self-join, the exact
    // decimal sufficient statistics and the fixed double edge formula.
    "q189_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY dia) AS t,
        |    CAST(total AS DECIMAL(18,2)) AS x FROM daily),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
        |    sum(x) AS s, sum(x * x) AS ss FROM idx),
        |par AS (SELECT CAST(b.t - a.t AS BIGINT) AS defasagem,
        |    CAST(count(*) AS BIGINT) AS n_pares,
        |    sum(a.x * b.x) AS sxy, sum(a.x) AS sa, sum(b.x) AS sb
        |  FROM idx a JOIN idx b ON b.t > a.t AND b.t <= a.t + 7
        |  GROUP BY 1)
        |SELECT defasagem, n_pares,
        |  (nd * nd * CAST(sxy AS DOUBLE) - nd * CAST(s AS DOUBLE) *
        |    (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) +
        |   CAST(n_pares AS DOUBLE) * CAST(s AS DOUBLE) *
        |     CAST(s AS DOUBLE)) /
        |  (nd * nd * CAST(ss AS DOUBLE) - nd * CAST(s AS DOUBLE) *
        |    CAST(s AS DOUBLE)) AS acf
        |FROM par, tot
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the n-scaled deviations, both cumulative windows, the
    // running-extremum closed form and the exact decimal alarm gate.
    "q190_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |base AS (SELECT dia, CAST(total AS DECIMAL(18,2)) AS x FROM daily),
        |st AS (SELECT CAST(count(*) AS DECIMAL(10,0)) AS n, sum(x) AS s
        |  FROM base),
        |d AS (SELECT dia, x, n,
        |    n * x - s - n * CAST('500' AS DECIMAL(18,2)) AS dup,
        |    n * x - s + n * CAST('500' AS DECIMAL(18,2)) AS ddn
        |  FROM base, st),
        |c AS (SELECT dia, x, n,
        |    sum(dup) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cup,
        |    sum(ddn) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdn
        |  FROM d),
        |r AS (SELECT dia, x, n, cup, cdn,
        |    least(min(cup) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      CAST(0 AS DECIMAL(18,2))) AS mn,
        |    greatest(max(cdn) OVER (ORDER BY dia
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      CAST(0 AS DECIMAL(18,2))) AS mx
        |  FROM c)
        |SELECT dia, CAST(x AS DOUBLE) AS valor,
        |  CAST(cup - mn AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_alta,
        |  CAST(mx - cdn AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_baixa,
        |  ((cup - mn) > n * CAST('2000' AS DECIMAL(18,2)) OR
        |   (mx - cdn) > n * CAST('2000' AS DECIMAL(18,2))) AS alarme
        |FROM r
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the undirected closure with a depth-capped recursive CTE:
    // min(d) over the distinct (vertex, depth) walk IS the BFS level.
    "q191_bfs_levels" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT -l_suppkey AS a, l_partkey AS b FROM lineitem),
        |adj AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |seeds AS (SELECT DISTINCT l_partkey AS v FROM lineitem
        |  WHERE l_partkey % 500 = 0),
        |walk(v, d) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT adj.b, d + 1 FROM walk JOIN adj ON walk.v = adj.a
        |  WHERE d < 3)
        |SELECT v AS vertice, CAST(min(d) AS BIGINT) AS nivel
        |FROM walk GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the value-collapse, the per-class cumulative grid, the
    // exact HUGEINT products and the (score DESC, threshold ASC) argmax
    // for each feature.
    "q192_gini_stump" ->
      """WITH src AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_discount AS DOUBLE) AS d, l_returnflag AS c
        |  FROM lineitem),
        |cq AS (SELECT q AS limiar, c, CAST(count(*) AS BIGINT) AS n
        |  FROM src WHERE q IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2),
        |gq AS (SELECT v.limiar, cl.c, cl.tot, COALESCE(k.n, 0) AS n
        |  FROM (SELECT DISTINCT limiar FROM cq) v
        |  CROSS JOIN (SELECT c, CAST(sum(n) AS BIGINT) AS tot FROM cq
        |    GROUP BY 1) cl
        |  LEFT JOIN cq k ON k.limiar = v.limiar AND k.c = cl.c),
        |uq AS (SELECT limiar, tot, sum(n) OVER (PARTITION BY c
        |    ORDER BY limiar ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM gq),
        |tq AS (SELECT limiar, CAST(sum(cum) AS BIGINT) AS n_esq,
        |    sum(CAST(cum AS HUGEINT) * cum) AS sl,
        |    sum(CAST(tot - cum AS HUGEINT) * (tot - cum)) AS sr,
        |    CAST(sum(tot) AS BIGINT) AS ntot
        |  FROM uq GROUP BY 1),
        |sq AS (SELECT 'l_quantity' AS atributo, limiar, n_esq,
        |    ntot - n_esq AS n_dir,
        |    CAST(CAST(n_esq AS HUGEINT) * n_esq - sl AS DOUBLE) /
        |      CAST(CAST(n_esq AS HUGEINT) * n_esq AS DOUBLE) AS gini_esq,
        |    CAST(CAST(ntot - n_esq AS HUGEINT) * (ntot - n_esq) - sr
        |      AS DOUBLE) / CAST(CAST(ntot - n_esq AS HUGEINT) *
        |      (ntot - n_esq) AS DOUBLE) AS gini_dir,
        |    CAST(sl * (ntot - n_esq) + sr * n_esq AS DOUBLE) /
        |      CAST(CAST(n_esq AS HUGEINT) * (ntot - n_esq) AS DOUBLE)
        |      AS pontuacao
        |  FROM tq WHERE ntot - n_esq > 0),
        |bq AS (SELECT * FROM sq ORDER BY pontuacao DESC, limiar ASC
        |  LIMIT 1),
        |cd AS (SELECT d AS limiar, c, CAST(count(*) AS BIGINT) AS n
        |  FROM src WHERE d IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2),
        |gd AS (SELECT v.limiar, cl.c, cl.tot, COALESCE(k.n, 0) AS n
        |  FROM (SELECT DISTINCT limiar FROM cd) v
        |  CROSS JOIN (SELECT c, CAST(sum(n) AS BIGINT) AS tot FROM cd
        |    GROUP BY 1) cl
        |  LEFT JOIN cd k ON k.limiar = v.limiar AND k.c = cl.c),
        |ud AS (SELECT limiar, tot, sum(n) OVER (PARTITION BY c
        |    ORDER BY limiar ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS cum FROM gd),
        |td AS (SELECT limiar, CAST(sum(cum) AS BIGINT) AS n_esq,
        |    sum(CAST(cum AS HUGEINT) * cum) AS sl,
        |    sum(CAST(tot - cum AS HUGEINT) * (tot - cum)) AS sr,
        |    CAST(sum(tot) AS BIGINT) AS ntot
        |  FROM ud GROUP BY 1),
        |sd AS (SELECT 'l_discount' AS atributo, limiar, n_esq,
        |    ntot - n_esq AS n_dir,
        |    CAST(CAST(n_esq AS HUGEINT) * n_esq - sl AS DOUBLE) /
        |      CAST(CAST(n_esq AS HUGEINT) * n_esq AS DOUBLE) AS gini_esq,
        |    CAST(CAST(ntot - n_esq AS HUGEINT) * (ntot - n_esq) - sr
        |      AS DOUBLE) / CAST(CAST(ntot - n_esq AS HUGEINT) *
        |      (ntot - n_esq) AS DOUBLE) AS gini_dir,
        |    CAST(sl * (ntot - n_esq) + sr * n_esq AS DOUBLE) /
        |      CAST(CAST(n_esq AS HUGEINT) * (ntot - n_esq) AS DOUBLE)
        |      AS pontuacao
        |  FROM td WHERE ntot - n_esq > 0),
        |bd AS (SELECT * FROM sd ORDER BY pontuacao DESC, limiar ASC
        |  LIMIT 1)
        |SELECT atributo, limiar, n_esq, n_dir, gini_esq, gini_dir,
        |  pontuacao FROM (SELECT * FROM bq UNION ALL SELECT * FROM bd)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the adjacency zip, the mirrored distinct edge set, three
    // damped PageRank rounds and the tie-broken top-20.
    "q199_textrank" -> (pageRankSqlBody(
      """tok AS (SELECT string_split_regex(trim(lower(text)), '\s+')
        |    AS l FROM documents),
        |pr0 AS (SELECT l[i] AS a, l[i + 1] AS b
        |  FROM tok, LATERAL (SELECT unnest(generate_series(1,
        |    len(l) - 1)) AS i) g),
        |pf AS (SELECT a, b FROM pr0
        |  WHERE a <> '' AND b <> '' AND a <> b),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT a AS src, b AS dst FROM pf
        |  UNION ALL
        |  SELECT b, a FROM pf))""".stripMargin, 3) +
      """
        |SELECT token, rank FROM (
        |  SELECT n AS token, r AS rank FROM r3
        |  ORDER BY rank DESC, token ASC LIMIT 20)
        |ORDER BY ALL NULLS FIRST""".stripMargin),

    // Replays tokenization, the stride-1 span fan-out, the global
    // keep-first rank per span text, later-occurrence coverage and the
    // ordered rebuild.
    "q200_exact_substr_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS s,
        |    array_to_string(tk[u.i + 1 : u.i + 6], ' ') AS span
        |  FROM t, LATERAL unnest(generate_series(0, len(tk) - 6, 1)) u(i)
        |  WHERE len(tk) >= 6),
        |r AS (
        |  SELECT doc_id, s, row_number() OVER (
        |    PARTITION BY span ORDER BY doc_id, s) AS rn
        |  FROM sp),
        |h AS (
        |  SELECT DISTINCT r.doc_id, CAST(u.p AS INT) AS pos
        |  FROM r, LATERAL unnest(generate_series(r.s, r.s + 5)) u(p)
        |  WHERE r.rn > 1),
        |tok AS (
        |  SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, tk[CAST(u.i AS INT)] AS tok
        |  FROM t, LATERAL unnest(generate_series(1, len(tk))) u(i)),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.tok, h2.cov
        |  FROM tok LEFT JOIN (SELECT doc_id, pos, true AS cov FROM h) h2
        |    USING (doc_id, pos))
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN cov IS NULL THEN tok END, ' '
        |    ORDER BY pos), '') AS texto_limpo,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN cov IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_removidos
        |FROM kept GROUP BY doc_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the value collapse, both row-inclusive cumulatives, the
    // integer supremum and the two-division edge.
    "q201_ks_test" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS grupo,
        |    CAST(o_totalprice AS DOUBLE) AS valor,
        |    (o_orderstatus = 'O') AS aberto
        |  FROM orders),
        |bv AS (
        |  SELECT grupo, valor,
        |    CAST(sum(CASE WHEN aberto THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN aberto THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM o WHERE valor IS NOT NULL AND aberto IS NOT NULL
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT grupo, a, b,
        |    sum(a) OVER (PARTITION BY grupo ORDER BY valor
        |      ROWS UNBOUNDED PRECEDING) AS ca,
        |    sum(b) OVER (PARTITION BY grupo ORDER BY valor
        |      ROWS UNBOUNDED PRECEDING) AS cb,
        |    sum(a) OVER (PARTITION BY grupo) AS na,
        |    sum(b) OVER (PARTITION BY grupo) AS nb
        |  FROM bv),
        |pg AS (
        |  SELECT grupo, CAST(max(na) AS BIGINT) AS n_a,
        |    CAST(max(nb) AS BIGINT) AS n_b,
        |    CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num
        |  FROM c GROUP BY grupo)
        |SELECT grupo, n_a, n_b, d_num, d,
        |  CASE WHEN d IS NOT NULL
        |    THEN (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d END AS ks_lambda
        |FROM (
        |  SELECT grupo, n_a, n_b, d_num,
        |    CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(d_num AS DOUBLE) /
        |      (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END AS d,
        |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
        |      (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS ne
        |  FROM pg)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays normalization, the planted substitution, suffix-4
    // blocking and the threshold — but the similarity itself is
    // DuckDB's OWN jaro_winkler_similarity kernel, an implementation
    // independent of the engine's native expression.
    "q202_jaro_winkler" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, lower(trim(c_name)) AS nome
        |  FROM customer),
        |v AS (
        |  SELECT id + 1000000 AS id,
        |    substring(nome, 1, 11) || 'x' || substring(nome, 13) AS nome
        |  FROM c WHERE id % 9 = 0),
        |allr AS (SELECT * FROM c UNION ALL SELECT * FROM v),
        |k AS (SELECT id, nome, right(nome, 4) AS key FROM allr),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    a.nome AS nome_a, b.nome AS nome_b
        |  FROM k a JOIN k b ON a.key = b.key AND a.id < b.id)
        |SELECT id_a, id_b, jaro_winkler_similarity(nome_a, nome_b) AS sim
        |FROM cand
        |WHERE jaro_winkler_similarity(nome_a, nome_b) >= 0.937
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the six exact-decimal conditional sums and the fixed
    // double-edge algebra (means, guarded variances, t, Welch df).
    "q203_welch_ttest" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS grupo,
        |    CAST(o_totalprice AS DOUBLE) AS valor,
        |    (o_orderstatus = 'O') AS aberto
        |  FROM orders),
        |ag AS (
        |  SELECT grupo,
        |    CAST(sum(CASE WHEN aberto THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN aberto THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN aberto THEN CAST(valor AS DECIMAL(38,12))
        |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS sa,
        |    sum(CASE WHEN aberto THEN CAST(valor * valor AS DECIMAL(38,12))
        |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS saa,
        |    sum(CASE WHEN NOT aberto THEN CAST(valor AS DECIMAL(38,12))
        |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS sb,
        |    sum(CASE WHEN NOT aberto THEN CAST(valor * valor AS DECIMAL(38,12))
        |      ELSE CAST(0 AS DECIMAL(38,12)) END) AS sbb
        |  FROM o WHERE valor IS NOT NULL AND aberto IS NOT NULL
        |  GROUP BY grupo),
        |alg AS (
        |  SELECT grupo, n_a, n_b,
        |    CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
        |    greatest((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) *
        |        CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)) /
        |      (CAST(n_a AS DOUBLE) - 1.0), 0.0) / CAST(n_a AS DOUBLE) AS va,
        |    greatest((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) *
        |        CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |      (CAST(n_b AS DOUBLE) - 1.0), 0.0) / CAST(n_b AS DOUBLE) AS vb
        |  FROM ag)
        |SELECT grupo, n_a, n_b,
        |  CASE WHEN n_a > 0 THEN ma END AS media_a,
        |  CASE WHEN n_b > 0 THEN mb END AS media_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND va + vb > 0
        |    THEN (ma - mb) / sqrt(va + vb) END AS t,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND va + vb > 0
        |    THEN (va + vb) * (va + vb) /
        |      (va * va / (CAST(n_a AS DOUBLE) - 1.0) +
        |       vb * vb / (CAST(n_b AS DOUBLE) - 1.0)) END AS gl
        |FROM alg
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily decimal collapse, the time-ordered pair signs,
    // the tie-corrected integer variance and the +/-1 continuity edge.
    "q204_mann_kendall" ->
      """WITH e AS (
        |  SELECT event_type AS grupo, CAST(ts AS DATE) AS dia, value
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |ser AS (
        |  SELECT grupo, dia,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(38,12)))
        |      AS DECIMAL(38,12)) AS DOUBLE) AS v
        |  FROM e GROUP BY 1, 2),
        |pares AS (
        |  SELECT a.grupo,
        |    CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s
        |  FROM ser a JOIN ser b ON a.grupo = b.grupo AND b.dia > a.dia
        |  GROUP BY 1),
        |tv AS (SELECT grupo, v, CAST(count(*) AS BIGINT) AS tk
        |  FROM ser GROUP BY 1, 2),
        |tie AS (SELECT grupo, CAST(sum(tk) AS BIGINT) AS n,
        |    CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tcorr
        |  FROM tv GROUP BY 1),
        |j AS (SELECT tie.grupo, n, coalesce(pares.s, 0) AS s,
        |    CAST(n * (n - 1) * (2 * n + 5) - tcorr AS BIGINT) AS var18
        |  FROM tie LEFT JOIN pares ON pares.grupo = tie.grupo),
        |zt AS (SELECT grupo, n, CAST(s AS BIGINT) AS s, var18,
        |    CASE WHEN var18 > 0 THEN
        |      CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |        WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) /
        |          sqrt(CAST(var18 AS DOUBLE) / 18.0)
        |        ELSE 0.0 END END AS z
        |  FROM j)
        |SELECT grupo, n, s, var18, z,
        |  CASE WHEN var18 > 0 THEN
        |    CASE WHEN z > 1.96 THEN 'alta' WHEN z < -1.96 THEN 'baixa'
        |      ELSE 'estavel' END END AS tendencia
        |FROM zt
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the cell counts, margins, the DECIMAL(38,0) squared
    // numerator per cell, the (a,b)-sorted fold and the dof gates.
    "q207_cramers_v" ->
      """WITH o AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
        |    o_orderpriority AS a, o_orderstatus AS b
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (SELECT ano, a, b, CAST(count(*) AS BIGINT) AS nab
        |  FROM o GROUP BY 1, 2, 3),
        |rm AS (SELECT ano, a, CAST(sum(nab) AS BIGINT) AS na
        |  FROM cells GROUP BY 1, 2),
        |cm AS (SELECT ano, b, CAST(sum(nab) AS BIGINT) AS nb
        |  FROM cells GROUP BY 1, 2),
        |tot AS (SELECT ano, CAST(sum(nab) AS BIGINT) AS n,
        |    CAST(count(DISTINCT a) AS BIGINT) AS r,
        |    CAST(count(DISTINCT b) AS BIGINT) AS c
        |  FROM cells GROUP BY 1),
        |grid AS (
        |  SELECT rm.ano, a, b, na, nb, coalesce(nab, 0) AS nab
        |  FROM rm JOIN cm USING (ano)
        |  LEFT JOIN cells USING (ano, a, b)),
        |terms AS (
        |  SELECT grid.ano, a, b,
        |    CAST(CAST(n * nab - na * nb AS DECIMAL(38,0)) *
        |      CAST(n * nab - na * nb AS DECIMAL(38,0)) AS DOUBLE) /
        |    CAST(CAST(n AS DECIMAL(38,0)) * na * nb AS DOUBLE) AS t
        |  FROM grid JOIN tot USING (ano)),
        |fold AS (
        |  SELECT ano, 0.0 + list_reduce(list(t ORDER BY a, b),
        |    (acc, x) -> acc + x) AS chi2
        |  FROM terms GROUP BY ano)
        |SELECT tot.ano, n, r, c, (r - 1) * (c - 1) AS gl,
        |  CASE WHEN (r - 1) * (c - 1) > 0 THEN chi2 END AS chi2,
        |  CASE WHEN (r - 1) * (c - 1) > 0 THEN
        |    sqrt(chi2 / (CAST(n AS DOUBLE) *
        |      CAST(least(r - 1, c - 1) AS DOUBLE))) END AS cramers_v
        |FROM tot JOIN fold USING (ano)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the deterministic ranking, the integer bucket formula and
    // the cumulative/total windows.
    "q215_lift_table" ->
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS dia, event_id, value,
        |    (event_type = 'purchase') AS compra
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (
        |  SELECT dia, compra,
        |    CAST(row_number() OVER (PARTITION BY dia
        |      ORDER BY value DESC, event_id ASC) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY dia) AS BIGINT) AS n
        |  FROM e),
        |b AS (SELECT dia, CAST((rk - 1) * 10 // n AS BIGINT) + 1 AS decil,
        |    compra FROM r),
        |pb AS (SELECT dia, decil, CAST(count(*) AS BIGINT) AS n_linhas,
        |    CAST(sum(CASE WHEN compra THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_eventos
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT dia, decil, n_linhas, n_eventos,
        |    CAST(sum(n_linhas) OVER (PARTITION BY dia ORDER BY decil
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cr,
        |    CAST(sum(n_eventos) OVER (PARTITION BY dia ORDER BY decil
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ce,
        |    CAST(sum(n_linhas) OVER (PARTITION BY dia) AS BIGINT) AS tr,
        |    CAST(sum(n_eventos) OVER (PARTITION BY dia) AS BIGINT) AS te
        |  FROM pb)
        |SELECT dia, decil, n_linhas, n_eventos,
        |  CASE WHEN te > 0 THEN CAST(ce AS DOUBLE) / CAST(te AS DOUBLE)
        |    END AS captura,
        |  CAST(ce AS DOUBLE) / CAST(cr AS DOUBLE) AS taxa_acumulada,
        |  CASE WHEN te > 0 THEN CAST(ce * tr AS DOUBLE) /
        |    CAST(cr * te AS DOUBLE) END AS lift
        |FROM c
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the pairwise slopes, both exact
    // value-collapsed medians with the floor'd middle-rank lookups and
    // the residual pass.
    "q214_theil_sen" ->
      """WITH e AS (
        |  SELECT event_type AS grupo,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DOUBLE) AS x,
        |    value
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |ser AS (
        |  SELECT grupo, x, CAST(CAST(sum(CAST(value AS DECIMAL(38,12)))
        |    AS DECIMAL(38,12)) AS DOUBLE) AS v
        |  FROM e GROUP BY 1, 2),
        |sl AS (
        |  SELECT a.grupo, (b.v - a.v) / (b.x - a.x) AS s
        |  FROM ser a JOIN ser b ON a.grupo = b.grupo AND b.x > a.x),
        |byv AS (SELECT grupo, s, CAST(count(*) AS BIGINT) AS c
        |  FROM sl GROUP BY 1, 2),
        |cumv AS (SELECT grupo, s, c,
        |    CAST(sum(c) OVER (PARTITION BY grupo ORDER BY s
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grupo) AS BIGINT) AS tot
        |  FROM byv),
        |med AS (SELECT grupo, CAST(max(tot) AS BIGINT) AS n_pares,
        |    (min(CASE WHEN cum >= CAST(floor((tot + 1) / 2.0) AS BIGINT)
        |        THEN s END) +
        |     min(CASE WHEN cum >= CAST(floor(tot / 2.0) AS BIGINT) + 1
        |        THEN s END)) / 2.0 AS inclinacao
        |  FROM cumv GROUP BY 1),
        |res AS (SELECT ser.grupo, v - inclinacao * x AS r
        |  FROM ser JOIN med USING (grupo)),
        |byr AS (SELECT grupo, r, CAST(count(*) AS BIGINT) AS c
        |  FROM res GROUP BY 1, 2),
        |cumr AS (SELECT grupo, r, c,
        |    CAST(sum(c) OVER (PARTITION BY grupo ORDER BY r
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(c) OVER (PARTITION BY grupo) AS BIGINT) AS tot
        |  FROM byr),
        |medr AS (SELECT grupo,
        |    (min(CASE WHEN cum >= CAST(floor((tot + 1) / 2.0) AS BIGINT)
        |        THEN r END) +
        |     min(CASE WHEN cum >= CAST(floor(tot / 2.0) AS BIGINT) + 1
        |        THEN r END)) / 2.0 AS intercepto
        |  FROM cumr GROUP BY 1),
        |pontos AS (SELECT grupo, CAST(count(*) AS BIGINT) AS n
        |  FROM ser GROUP BY 1)
        |SELECT pontos.grupo, n, n_pares, inclinacao, intercepto
        |FROM pontos LEFT JOIN med USING (grupo)
        |LEFT JOIN medr USING (grupo)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the messy-variant synthesis and the seven-rule canonical
    // algebra (fragment, case, ports, www, slashes, tracking params,
    // param sort) step for step.
    "q213_url_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id, 'https://www.' || source || '-site.example/art/'
        |    || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'HTTPS://' || upper(source)
        |    || '-SITE.EXAMPLE:443/art/' || CAST(doc_id AS VARCHAR)
        |    || '/?b=2&utm_campaign=x&a=1#top'
        |  FROM documents WHERE doc_id % 3 = 0),
        |st AS (
        |  SELECT doc_id,
        |    regexp_replace(trim(url), '#.*', '', 'g') AS nofrag
        |  FROM urls),
        |parts AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(
        |      lower(regexp_extract(nofrag,
        |        '(?i)^[a-z][a-z0-9+.-]*://[^/?]*')),
        |      '^(http://.*):80$', '\1'),
        |      '^(https://.*):443$', '\1'),
        |      '^([a-z0-9+.-]*://)www\.', '\1') AS head,
        |    regexp_replace(nofrag,
        |      '(?i)^[a-z][a-z0-9+.-]*://[^/?]*', '') AS tail
        |  FROM st),
        |canon AS (
        |  SELECT doc_id,
        |    head || regexp_replace(regexp_extract(tail, '^[^?]*'),
        |      '/+$', '') ||
        |    CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS url_canonico
        |  FROM (
        |    SELECT doc_id, head, tail,
        |      array_to_string(list_sort(list_filter(
        |        string_split(regexp_extract(tail, '\?(.*)$', 1), '&'),
        |        p -> p <> '' AND NOT regexp_matches(p,
        |          '(?i)^(utm_[^=]*|gclid|fbclid|ref)(=|$)'))), '&') AS qc
        |    FROM parts))
        |SELECT url_canonico, CAST(min(doc_id) AS BIGINT) AS doc_id,
        |  CAST(count(*) AS BIGINT) AS n_copias
        |FROM canon GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The bucketed layout changes the PLAN, never the answer: the
    // oracle is the plain join + decimal-summed rollup.
    "q212_bucketed_join" ->
      """SELECT o_orderpriority AS prioridade,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS receita,
        |  CAST(count(*) AS BIGINT) AS n_itens
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The layout contract: pruning changes which files are opened,
    // never the answer — the oracle is the plain full-scan query.
    "q216_bloom_pruned_read" ->
      """SELECT o_custkey, count(*) AS n_pedidos,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS total
        |FROM orders WHERE o_custkey IN (7, 42, 99, 123)
        |GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Same contract for the combined range+point manifest read.
    "q217_zorder_manifest_read" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
        |    AS DECIMAL(38,6)) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderkey BETWEEN 100 AND 5000
        |  AND o_custkey IN (7, 42, 99, 123)
        |GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the observed-cell MI terms with integer ln arguments and
    // the three (a,b)/(a)/(b)-sorted folds.
    "q210_mutual_info" ->
      """WITH o AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS ano,
        |    o_orderpriority AS a, o_orderstatus AS b
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (SELECT ano, a, b, CAST(count(*) AS BIGINT) AS nab
        |  FROM o GROUP BY 1, 2, 3),
        |rm AS (SELECT ano, a, CAST(sum(nab) AS BIGINT) AS na
        |  FROM cells GROUP BY 1, 2),
        |cm AS (SELECT ano, b, CAST(sum(nab) AS BIGINT) AS nb
        |  FROM cells GROUP BY 1, 2),
        |tot AS (SELECT ano, CAST(sum(nab) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |mi AS (
        |  SELECT ano, 0.0 + list_reduce(list(
        |      (CAST(nab AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln(CAST(CAST(n AS DECIMAL(38,0)) * nab AS DOUBLE) /
        |         CAST(CAST(na AS DECIMAL(38,0)) * nb AS DOUBLE))
        |      ORDER BY a, b), (acc, x) -> acc + x) AS mi
        |  FROM cells JOIN rm USING (ano, a) JOIN cm USING (ano, b)
        |  JOIN tot USING (ano) GROUP BY ano),
        |ha AS (
        |  SELECT ano, ln(CAST(n AS DOUBLE)) - (0.0 + list_reduce(
        |      list(CAST(na AS DOUBLE) * ln(CAST(na AS DOUBLE)) ORDER BY a),
        |      (acc, x) -> acc + x)) / CAST(n AS DOUBLE) AS h_a
        |  FROM rm JOIN tot USING (ano) GROUP BY ano, n),
        |hb AS (
        |  SELECT ano, ln(CAST(n AS DOUBLE)) - (0.0 + list_reduce(
        |      list(CAST(nb AS DOUBLE) * ln(CAST(nb AS DOUBLE)) ORDER BY b),
        |      (acc, x) -> acc + x)) / CAST(n AS DOUBLE) AS h_b
        |  FROM cm JOIN tot USING (ano) GROUP BY ano, n)
        |SELECT tot.ano, n, mi, h_a, h_b,
        |  CASE WHEN h_a > 0 AND h_b > 0 THEN mi / sqrt(h_a * h_b) END AS nmi
        |FROM tot JOIN mi USING (ano) JOIN ha USING (ano) JOIN hb USING (ano)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the cent scaling, value collapse, tie-invariant rank-sum
    // blocks and the two exact-integer divisions.
    "q208_gini" ->
      """WITH v AS (
        |  SELECT o_orderpriority AS grupo,
        |    CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100
        |      AS DECIMAL(38,0)) AS x
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |bv AS (SELECT grupo, x, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
        |  FROM v GROUP BY 1, 2),
        |cum AS (SELECT grupo, x, c, neg,
        |    CAST(coalesce(sum(c) OVER (PARTITION BY grupo ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |  FROM bv),
        |pg AS (SELECT grupo, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(neg) AS BIGINT) AS n_neg,
        |    CAST(sum(x * CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t,
        |    CAST(sum(x * (CAST(c AS DECIMAL(38,0)) *
        |        CAST(below AS DECIMAL(38,0)) +
        |        CAST((c * (c + 1)) // 2 AS DECIMAL(38,0))))
        |      AS DECIMAL(38,0)) AS s
        |  FROM cum GROUP BY 1)
        |SELECT grupo, n, CAST(t AS DOUBLE) / 100.0 AS total,
        |  CASE WHEN n_neg = 0 AND t > 0 THEN
        |    2.0 * CAST(s AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) -
        |    (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END AS gini
        |FROM pg
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the per-unit decimal folds, the pooled arm-blind
    // sufficient statistics, theta/1-rho2 and the algebraic per-arm
    // adjusted mean.
    "q209_cuped" ->
      """WITH pc AS (
        |  SELECT o_custkey AS id,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
        |      THEN CAST(o_totalprice AS DECIMAL(38,6))
        |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS y,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01'
        |      THEN CAST(o_totalprice AS DECIMAL(38,6))
        |      ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS x
        |  FROM orders GROUP BY 1),
        |u AS (
        |  SELECT c_mktsegment AS segmento, pc.id % 2 AS braco, y, x
        |  FROM pc JOIN customer ON c_custkey = pc.id),
        |pooled AS (
        |  SELECT segmento, CAST(count(*) AS BIGINT) AS pn,
        |    sum(CAST(x AS DECIMAL(38,12))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,12))) AS sy,
        |    sum(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM u GROUP BY 1),
        |st AS (
        |  SELECT segmento,
        |    CAST(sx AS DOUBLE) / CAST(pn AS DOUBLE) AS mx,
        |    CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
        |        CAST(sx AS DOUBLE) / CAST(pn AS DOUBLE) > 0 THEN
        |      (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |        CAST(sy AS DOUBLE) / CAST(pn AS DOUBLE)) /
        |      (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
        |        CAST(sx AS DOUBLE) / CAST(pn AS DOUBLE)) END AS theta,
        |    CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
        |        CAST(sx AS DOUBLE) / CAST(pn AS DOUBLE) > 0
        |      AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
        |        CAST(sy AS DOUBLE) / CAST(pn AS DOUBLE) > 0 THEN
        |      1.0 - ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |          CAST(sy AS DOUBLE) / CAST(pn AS DOUBLE)) *
        |        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) *
        |          CAST(sy AS DOUBLE) / CAST(pn AS DOUBLE))) /
        |      ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) *
        |          CAST(sx AS DOUBLE) / CAST(pn AS DOUBLE)) *
        |        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) *
        |          CAST(sy AS DOUBLE) / CAST(pn AS DOUBLE)))
        |      END AS fator_variancia
        |  FROM pooled),
        |arms AS (
        |  SELECT segmento, braco, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS DECIMAL(38,12))) AS asy,
        |    sum(CAST(x AS DECIMAL(38,12))) AS asx
        |  FROM u GROUP BY 1, 2)
        |SELECT segmento, braco, n,
        |  CAST(asy AS DOUBLE) / CAST(n AS DOUBLE) AS media_y,
        |  CAST(asy AS DOUBLE) / CAST(n AS DOUBLE) - theta *
        |    (CAST(asx AS DOUBLE) / CAST(n AS DOUBLE) - mx) AS media_y_adj,
        |  theta, fator_variancia
        |FROM arms JOIN st USING (segmento)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the blank-token drop, the (doc, type) counts and the
    // token-sorted entropy fold; empty docs come back through the
    // distinct-id left join with n=0 and null ratios.
    "q205_lexical_diversity" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
        |cnt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok WHERE tok <> '' GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_tipos,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax,
        |    0.0 + list_reduce(
        |      list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY tok),
        |      (acc, x) -> acc + x) AS clnc
        |  FROM cnt GROUP BY doc_id),
        |ids AS (SELECT DISTINCT doc_id FROM documents)
        |SELECT ids.doc_id,
        |  coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(n_tipos, 0) AS n_tipos,
        |  coalesce(n_hapax, 0) AS n_hapax,
        |  CASE WHEN n_tokens > 0 THEN CAST(n_tipos AS DOUBLE) /
        |    CAST(n_tokens AS DOUBLE) END AS ttr,
        |  CASE WHEN n_tokens > 0 THEN CAST(n_hapax AS DOUBLE) /
        |    CAST(n_tokens AS DOUBLE) END AS razao_hapax,
        |  CASE WHEN n_tokens > 0 THEN ln(CAST(n_tokens AS DOUBLE)) -
        |    clnc / CAST(n_tokens AS DOUBLE) END AS entropia
        |FROM ids LEFT JOIN pd USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the within-basket pairs, the minPairs cut, the fixed
    // cosine chain and the (score DESC, item ASC) per-item top-5.
    "q198_item_cosine" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem),
        |sup AS (SELECT i, CAST(count(*) AS BIGINT) AS n FROM it
        |  GROUP BY 1),
        |pr AS (SELECT a.i AS item_a, c.i AS item_b,
        |    CAST(count(*) AS BIGINT) AS n_ambos
        |  FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |sc AS (SELECT item_a, item_b, n_ambos,
        |    CAST(n_ambos AS DOUBLE) / (sqrt(CAST(sa.n AS DOUBLE)) *
        |      sqrt(CAST(sb.n AS DOUBLE))) AS cosseno
        |  FROM pr JOIN sup sa ON sa.i = item_a
        |  JOIN sup sb ON sb.i = item_b),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY item_a
        |    ORDER BY cosseno DESC, item_b ASC) AS posicao FROM sc)
        |SELECT item_a, CAST(posicao AS INT) AS posicao, item_b, cosseno,
        |  n_ambos
        |FROM rk WHERE posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the daily collapse, the centered window with null edges,
    // the decimal-routed seasonal means and the fixed recomposition.
    "q197_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS dia,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |b AS (SELECT dia, CAST(total AS DECIMAL(18,2)) AS x,
        |    CAST((row_number() OVER (ORDER BY dia) - 1) % 7 AS BIGINT)
        |      AS posicao,
        |    CASE WHEN count(*) OVER w7 = 7 THEN
        |      CAST(sum(CAST(total AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
        |        / 7.0 END AS tendencia
        |  FROM daily
        |  WINDOW w7 AS (ORDER BY dia
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT dia, x, posicao, tendencia,
        |    CAST(x AS DOUBLE) - tendencia AS detr FROM b),
        |pp AS (SELECT posicao,
        |    CAST(sum(CAST(detr AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(count(detr) AS DOUBLE) AS s_bruto
        |  FROM d GROUP BY 1),
        |ct AS (SELECT
        |    CAST(sum(CAST(s_bruto AS DECIMAL(38,18))) AS DOUBLE) /
        |      CAST(count(s_bruto) AS DOUBLE) AS m FROM pp)
        |SELECT dia, CAST(x AS DOUBLE) AS valor, posicao, tendencia,
        |  s_bruto - m AS sazonal, detr - (s_bruto - m) AS residuo
        |FROM d JOIN pp USING (posicao) CROSS JOIN ct
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the training-slice vocabulary fit (multiplicity counts,
    // count-desc token-asc top-20), the marked token stream and the
    // per-doc exact counts + single division.
    "q196_vocab_coverage" ->
      """WITH tr AS (SELECT text FROM documents WHERE doc_id % 3 = 0),
        |ttok AS (SELECT unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS t FROM tr),
        |voc AS (SELECT t FROM (SELECT t, count(*) AS c FROM ttok
        |  GROUP BY 1 ORDER BY c DESC, t ASC LIMIT 20)),
        |atok AS (SELECT doc_id, unnest(string_split_regex(
        |    trim(lower(text)), '\s+')) AS t FROM documents),
        |m AS (SELECT f.doc_id, f.t, (v.t IS NOT NULL) AS dentro
        |  FROM (SELECT doc_id, t FROM atok WHERE t <> '') f
        |  LEFT JOIN (SELECT DISTINCT t FROM voc) v ON f.t = v.t),
        |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (NOT dentro) AS BIGINT) AS n_oov,
        |    CAST(count(DISTINCT t) AS BIGINT) AS n_tipos,
        |    CAST(count(DISTINCT t) FILTER (NOT dentro) AS BIGINT)
        |      AS n_tipos_oov
        |  FROM m GROUP BY 1)
        |SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
        |  COALESCE(n_oov, 0) AS n_oov, COALESCE(n_tipos, 0) AS n_tipos,
        |  COALESCE(n_tipos_oov, 0) AS n_tipos_oov,
        |  CASE WHEN COALESCE(n_tokens, 0) > 0 THEN
        |    CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |  END AS taxa_oov
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN ag USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the per-user collapse, the one-pass conditional counts
    // and the fixed pooled-variance IEEE chain.
    "q194_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(event_type = 'purchase' AND value > 90.0) AS converteu,
        |    CASE WHEN user_id % 2 = 0 THEN 'par' ELSE 'impar' END
        |      AS braco
        |  FROM events GROUP BY user_id),
        |c AS (SELECT
        |    CAST(count(*) FILTER (braco = 'par') AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (braco = 'par' AND converteu)
        |      AS BIGINT) AS x_a,
        |    CAST(count(*) FILTER (braco = 'impar') AS BIGINT) AS n_b,
        |    CAST(count(*) FILTER (braco = 'impar' AND converteu)
        |      AS BIGINT) AS x_b
        |  FROM u WHERE braco IN ('par', 'impar'))
        |SELECT n_a, x_a, n_b, x_b,
        |  CASE WHEN n_a > 0 THEN CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    END AS taxa_a,
        |  CASE WHEN n_b > 0 THEN CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    END AS taxa_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND x_a + x_b > 0
        |      AND x_a + x_b < n_a + n_b THEN
        |    (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |     CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
        |    sqrt(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) *
        |      (1.0 - CAST(x_a + x_b AS DOUBLE) /
        |        CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
        |  END AS z
        |FROM c
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the doubled ranks, the exact tie term, the per-group
    // divisions through DECIMAL(38,18) and the fixed H / correction
    // edge.
    "q195_kruskal_wallis" ->
      """WITH b AS (SELECT CAST(l_returnflag AS VARCHAR) AS g,
        |    CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM b
        |  GROUP BY 1),
        |rk AS (SELECT v, 2 * COALESCE(sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + cnt + 1 AS r2,
        |    CAST(cnt AS HUGEINT) * cnt * cnt - cnt AS t FROM cv),
        |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS n_grupo,
        |    sum(CAST(r2 AS HUGEINT)) AS rg2
        |  FROM b JOIN rk USING (v) GROUP BY 1),
        |tt AS (SELECT sum(t) AS st FROM rk),
        |tot AS (SELECT CAST(sum(n_grupo) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    0.0 + list_reduce(
        |      list(CAST(rg2 * rg2 AS DOUBLE) / CAST(n_grupo AS DOUBLE)
        |        ORDER BY g), (acc, x) -> acc + x) AS s2
        |  FROM pg)
        |SELECT g AS grupo, n_grupo,
        |  CAST(rg2 AS DOUBLE) / (2.0 * CAST(n_grupo AS DOUBLE))
        |    AS posto_medio,
        |  k - 1 AS gl,
        |  (3.0 * s2) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) -
        |    3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
        |  CASE WHEN st < CAST(n AS HUGEINT) * n * n - n THEN
        |    ((3.0 * s2) /
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) -
        |      3.0 * (CAST(n AS DOUBLE) + 1.0)) /
        |    (1.0 - CAST(st AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
        |        CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
        |  END AS h_corr
        |FROM pg, tot, tt
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the doubled tie-averaged ranks from distinct-value
    // collapses, the HUGEINT statistics and the fixed sqrt/÷ edge.
    "q193_spearman" -> spearmanOracle(Seq(
      ("l_quantity", "l_extendedprice"),
      ("l_quantity", "l_discount"),
      ("l_extendedprice", "l_discount"))),

    // Replays the value-collapse, both cumulative directions and the
    // single-division ratios.
    "q187_pr_curve" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS dia, value AS limiar,
        |    (event_type = 'purchase') AS compra FROM events
        |  WHERE value IS NOT NULL),
        |c AS (SELECT dia, limiar,
        |    sum(CASE WHEN compra THEN 1 ELSE 0 END) AS p,
        |    sum(CASE WHEN compra THEN 0 ELSE 1 END) AS n
        |  FROM e GROUP BY 1, 2),
        |k AS (SELECT dia, limiar,
        |    sum(p) OVER wd AS tp, sum(n) OVER wd AS fp,
        |    sum(p) OVER (PARTITION BY dia) - sum(p) OVER wd AS fn
        |  FROM c WINDOW wd AS (PARTITION BY dia ORDER BY limiar DESC
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT dia, limiar, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precisao,
        |  CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS revocacao,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
        |    END AS f1
        |FROM k ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays variants, labeled pairs, the smoothed m/u weights and the
    // left-associated log-likelihood sum with its three-way decision;
    // candidates = the COMPLETE same-nation Levenshtein ≤ 2 pair set
    // (brute-force here; the engine reaches it via stratified FastSS).
    "q186_fellegi_sunter" ->
      """WITH c AS (SELECT c_custkey AS id, lower(trim(c_name)) AS nome,
        |    c_nationkey AS nacao,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS tel3,
        |    c_mktsegment AS seg FROM customer),
        |v AS (SELECT id + 10000000 AS id,
        |    substring(nome, 1, 12) || substring(nome, 14) AS nome, nacao,
        |    CASE WHEN id % 3 = 0 THEN -1 ELSE tel3 END AS tel3, seg
        |  FROM c WHERE id % 7 = 0),
        |pares AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    levenshtein(a.nome, b.nome) <= 1 AS nome_igual,
        |    a.tel3 = b.tel3 AS faixa_igual, a.seg = b.seg AS seg_igual,
        |    TRUE AS eh_par
        |  FROM c a JOIN v b ON b.id = a.id + 10000000
        |  UNION ALL
        |  SELECT a.id, b.id, levenshtein(a.nome, b.nome) <= 1,
        |    a.tel3 = b.tel3, a.seg = b.seg, FALSE
        |  FROM c a JOIN c b ON b.id = a.id + 11111),
        |w AS (SELECT
        |    sum(CASE WHEN eh_par THEN 1 ELSE 0 END) AS nm,
        |    sum(CASE WHEN eh_par THEN 0 ELSE 1 END) AS nu,
        |    sum(CASE WHEN eh_par AND nome_igual THEN 1 ELSE 0 END) AS m_nome,
        |    sum(CASE WHEN NOT eh_par AND nome_igual THEN 1 ELSE 0 END) AS u_nome,
        |    sum(CASE WHEN eh_par AND faixa_igual THEN 1 ELSE 0 END) AS m_faixa,
        |    sum(CASE WHEN NOT eh_par AND faixa_igual THEN 1 ELSE 0 END) AS u_faixa,
        |    sum(CASE WHEN eh_par AND seg_igual THEN 1 ELSE 0 END) AS m_seg,
        |    sum(CASE WHEN NOT eh_par AND seg_igual THEN 1 ELSE 0 END) AS u_seg
        |  FROM pares),
        |pesos AS (SELECT
        |    ln(CAST((m_nome + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_nome + 1) * (nm + 2) AS DOUBLE)) AS wa_nome,
        |    ln(CAST((nm + 1 - m_nome) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_nome) * (nm + 2) AS DOUBLE)) AS wd_nome,
        |    ln(CAST((m_faixa + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_faixa + 1) * (nm + 2) AS DOUBLE)) AS wa_faixa,
        |    ln(CAST((nm + 1 - m_faixa) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_faixa) * (nm + 2) AS DOUBLE)) AS wd_faixa,
        |    ln(CAST((m_seg + 1) * (nu + 2) AS DOUBLE) /
        |       CAST((u_seg + 1) * (nm + 2) AS DOUBLE)) AS wa_seg,
        |    ln(CAST((nm + 1 - m_seg) * (nu + 2) AS DOUBLE) /
        |       CAST((nu + 1 - u_seg) * (nm + 2) AS DOUBLE)) AS wd_seg
        |  FROM w),
        |todos AS (SELECT * FROM c UNION ALL SELECT * FROM v),
        |cand AS (SELECT a.id AS id_a, b.id AS id_b,
        |    levenshtein(a.nome, b.nome) <= 1 AS nome_igual,
        |    a.tel3 = b.tel3 AS faixa_igual, a.seg = b.seg AS seg_igual
        |  FROM todos a JOIN todos b
        |    ON a.nacao = b.nacao AND a.id < b.id
        |      AND abs(length(a.nome) - length(b.nome)) <= 2
        |      AND levenshtein(a.nome, b.nome) <= 2),
        |sc AS (SELECT id_a, id_b, nome_igual, faixa_igual, seg_igual,
        |    (CASE WHEN nome_igual THEN wa_nome ELSE wd_nome END)
        |      + (CASE WHEN faixa_igual THEN wa_faixa ELSE wd_faixa END)
        |      + (CASE WHEN seg_igual THEN wa_seg ELSE wd_seg END)
        |      AS pontuacao
        |  FROM cand CROSS JOIN pesos)
        |SELECT id_a, id_b, nome_igual, faixa_igual, seg_igual, pontuacao,
        |  CASE WHEN pontuacao >= 1.0 THEN 'match'
        |       WHEN pontuacao <= -1.0 THEN 'nao_match'
        |       ELSE 'possivel' END AS classificacao
        |FROM sc ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays subjects (durations + censoring), the reverse at-risk
    // cumulative, and the decimal-accumulated survival product.
    "q185_kaplan_meier" ->
      """WITH t0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |tp AS (SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN t0 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= t0.t0 GROUP BY 1),
        |hz AS (SELECT max(ts) AS hz FROM events),
        |subj AS (SELECT CAST(date_trunc('week', t0.t0) AS DATE) AS coorte,
        |    CAST(datediff('day', CAST(t0.t0 AS DATE),
        |      CAST(COALESCE(tp.tp, hz.hz) AS DATE)) AS BIGINT) AS dur,
        |    tp.tp IS NOT NULL AS conv
        |  FROM t0 LEFT JOIN tp USING (user_id) CROSS JOIN hz),
        |coll AS (SELECT coorte, dur,
        |    sum(CASE WHEN conv THEN 1 ELSE 0 END) AS eventos,
        |    count(*) AS a
        |  FROM subj GROUP BY 1, 2),
        |r AS (SELECT coorte, dur, eventos,
        |    sum(a) OVER (PARTITION BY coorte ORDER BY dur DESC
        |      ROWS UNBOUNDED PRECEDING) AS em_risco
        |  FROM coll),
        |lterm AS (SELECT *,
        |    CASE WHEN em_risco = eventos THEN CAST(0 AS DECIMAL(38,18))
        |      ELSE CAST(ln(CAST(em_risco - eventos AS DOUBLE) /
        |        CAST(em_risco AS DOUBLE)) AS DECIMAL(38,18)) END AS l,
        |    CASE WHEN em_risco = eventos THEN 1 ELSE 0 END AS z
        |  FROM r),
        |srv AS (SELECT coorte, dur, em_risco, eventos,
        |    CASE WHEN max(z) OVER w = 1 THEN 0.0
        |      ELSE exp(CAST(sum(l) OVER w AS DOUBLE)) END AS sobrevivencia
        |  FROM lterm WINDOW w AS (PARTITION BY coorte ORDER BY dur ASC
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT coorte, dur, CAST(em_risco AS BIGINT) AS em_risco,
        |  CAST(eventos AS BIGINT) AS eventos, sobrevivencia
        |FROM srv WHERE eventos > 0 ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the value-collapse, the strictly-below cumulative and the
    // exact U₂ roll-up with its single division.
    "q182_roc_auc" ->
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS dia, value AS s,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |bs AS (
        |  SELECT dia, s,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
        |    CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |w AS (
        |  SELECT dia, s, p, n,
        |    coalesce(sum(n) OVER (PARTITION BY dia ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS nb
        |  FROM bs)
        |SELECT dia, CAST(sum(p) AS BIGINT) AS n_pos,
        |  CAST(sum(n) AS BIGINT) AS n_neg,
        |  CASE WHEN sum(p) > 0 AND sum(n) > 0 THEN
        |    CAST(sum(p * (2 * nb + n)) AS DOUBLE) /
        |    CAST(2 * sum(p) * sum(n) AS DOUBLE) END AS auc
        |FROM w GROUP BY dia
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // The same literal rows, typed the same way (core type canary).
    "q179_canary_core" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(2 AS INTEGER), CAST(3 AS SMALLINT),
        |   CAST(1.5 AS DOUBLE), 'alfa', DATE '2024-01-15',
        |   TIMESTAMP '2024-01-15 12:34:56', true),
        |  (CAST(-4611686018427387904 AS BIGINT), CAST(-2147483647 AS INTEGER),
        |   CAST(-32767 AS SMALLINT), CAST(-0.125 AS DOUBLE), '',
        |   DATE '1970-01-01', TIMESTAMP '1970-01-01 00:00:00', false),
        |  (CAST(7 AS BIGINT), CAST(8 AS INTEGER), CAST(9 AS SMALLINT),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), DATE '2030-12-31',
        |   TIMESTAMP '1999-12-31 23:59:59', true))
        |AS t(c_bigint, c_int, c_smallint, c_double, c_varchar, c_date,
        |     c_ts, c_bool)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the OLS closed form, the residual chain and both exact
    // lower medians of the MAD pass.
    "q175_trend_anomalies" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS DOUBLE) AS x,
        |    o_totalprice AS y
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |agg AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS sxx
        |  FROM o GROUP BY 1),
        |cf AS (
        |  SELECT o_orderpriority,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS inclinacao,
        |    n, sx, sy
        |  FROM agg),
        |cf2 AS (
        |  SELECT o_orderpriority, inclinacao,
        |    (CAST(sy AS DOUBLE) - inclinacao * CAST(sx AS DOUBLE)) /
        |      CAST(n AS DOUBLE) AS intercepto
        |  FROM cf),
        |r AS (
        |  SELECT o.o_orderkey, o.o_orderpriority, o.x, o.y,
        |    y - (intercepto + inclinacao * x) AS residuo
        |  FROM o JOIN cf2 USING (o_orderpriority)),
        |m1 AS (
        |  SELECT o_orderpriority, v AS med FROM (
        |    SELECT o_orderpriority, v,
        |      SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(w) OVER (PARTITION BY o_orderpriority) AS tot
        |    FROM (SELECT o_orderpriority, residuo AS v,
        |            CAST(count(*) AS DECIMAL(38,6)) AS w
        |          FROM r GROUP BY 1, 2))
        |  WHERE cum * 2 >= tot
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY v) = 1),
        |dev AS (
        |  SELECT r.*, abs(residuo - med) AS desvio
        |  FROM r JOIN m1 USING (o_orderpriority)),
        |m2 AS (
        |  SELECT o_orderpriority, v AS mad FROM (
        |    SELECT o_orderpriority, v,
        |      SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(w) OVER (PARTITION BY o_orderpriority) AS tot
        |    FROM (SELECT o_orderpriority, desvio AS v,
        |            CAST(count(*) AS DECIMAL(38,6)) AS w
        |          FROM dev GROUP BY 1, 2))
        |  WHERE cum * 2 >= tot
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY v) = 1)
        |SELECT dev.o_orderkey, dev.o_orderpriority, dev.x, dev.y,
        |  dev.residuo, dev.desvio,
        |  (mad > 0.0 AND desvio > 2.5 * mad) AS atipico
        |FROM dev JOIN m2 USING (o_orderpriority)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the string-image digit extraction, the counts and the
    // literal expected shares.
    "q174_benford" ->
      """WITH d AS (
        |  SELECT CAST(substring(regexp_replace(
        |    CAST(abs(o_totalprice) AS VARCHAR), '[^1-9]', '', 'g'),
        |    1, 1) AS INT) AS digito
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
        |    AND regexp_replace(CAST(abs(o_totalprice) AS VARCHAR),
        |      '[^1-9]', '', 'g') <> ''),
        |cnt AS (SELECT digito, CAST(count(*) AS BIGINT) AS observado
        |        FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(observado) AS BIGINT) AS n FROM cnt),
        |e AS (SELECT digito, CAST(esperado AS DOUBLE) AS esperado
        |  FROM (VALUES
        |  (1, 0.301029995664), (2, 0.176091259056), (3, 0.124938736608),
        |  (4, 0.096910013008), (5, 0.079181246048), (6, 0.066946789631),
        |  (7, 0.057991946978), (8, 0.051152522447), (9, 0.045757490561))
        |  v(digito, esperado))
        |SELECT e.digito, coalesce(observado, 0) AS observado,
        |  CAST(coalesce(observado, 0) AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS participacao,
        |  esperado,
        |  (CAST(coalesce(observado, 0) AS DOUBLE) / CAST(n AS DOUBLE))
        |    / esperado AS razao
        |FROM e LEFT JOIN cnt USING (digito), t
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the first-3 ranking, the ordered path join and the
    // deterministic top-10 cut.
    "q173_common_paths" ->
      """SELECT * FROM (
        |  WITH rk AS (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS r
        |    FROM events),
        |  p AS (
        |    SELECT user_id, string_agg(event_type, '>' ORDER BY r) AS caminho
        |    FROM rk WHERE r <= 3 GROUP BY user_id),
        |  c AS (SELECT caminho, CAST(count(*) AS BIGINT) AS usuarios
        |        FROM p GROUP BY 1)
        |  SELECT caminho, usuarios FROM c
        |  ORDER BY usuarios DESC, caminho LIMIT 10)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the integer-rank edges and the strict-below bin count.
    "q170_quantile_binning" ->
      """WITH bv AS (
        |  SELECT o_totalprice AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |cum AS (
        |  SELECT v, SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
        |    SUM(c) OVER () AS n
        |  FROM bv),
        |edges AS (
        |  SELECT i, min(v) AS borda
        |  FROM cum, LATERAL unnest([1, 2, 3]) e(i)
        |  WHERE cm * 4 >= n * i GROUP BY i)
        |SELECT o_orderkey, o_totalprice,
        |  CAST(1 + (SELECT count(*) FROM edges
        |            WHERE borda < o_totalprice) AS INT) AS bin
        |FROM orders
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the collapse rule, the frequency division and the
    // broadcast-left-join apply.
    "q171_freq_encoding" ->
      """WITH cnt AS (
        |  SELECT p_brand AS categoria, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cnt),
        |model AS (
        |  SELECT categoria, CAST(sum(n) AS BIGINT) AS n
        |  FROM (SELECT CASE WHEN n >= 70 THEN categoria
        |               ELSE '__outros__' END AS categoria, n FROM cnt)
        |  GROUP BY 1),
        |mf AS (SELECT categoria, n,
        |         CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS freq
        |       FROM model, t)
        |SELECT p_partkey, p_brand,
        |  CASE WHEN mf.categoria IS NOT NULL AND mf.categoria <> '__outros__'
        |       THEN mf.categoria ELSE '__outros__' END AS p_brand_cat,
        |  CASE WHEN mf.categoria IS NOT NULL AND mf.categoria <> '__outros__'
        |       THEN mf.freq
        |       ELSE (SELECT freq FROM mf WHERE categoria = '__outros__') END
        |    AS p_brand_freq
        |FROM part LEFT JOIN mf ON part.p_brand = mf.categoria
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the per-category DECIMAL sums, the own-label subtraction
    // and the single division; singletons null.
    "q172_loo_target" ->
      """WITH st AS (
        |  SELECT c_mktsegment AS cat,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sy,
        |    CAST(count(*) AS BIGINT) AS nc
        |  FROM customer GROUP BY 1)
        |SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CASE WHEN nc > 1 THEN
        |    CAST(sy - CAST(c_acctbal AS DECIMAL(38,6)) AS DOUBLE) /
        |    CAST(nc - 1 AS DOUBLE) END AS c_mktsegment_loo
        |FROM customer JOIN st ON c_mktsegment = st.cat
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays both snapshot counts, the exact-product ratio and the
    // chi-square chain per bucket.
    "q167_drift_report" ->
      """WITH b AS (
        |  SELECT o_orderpriority AS bucket, CAST(count(*) AS BIGINT) AS n_base
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-06-17'
        |  GROUP BY 1),
        |c AS (
        |  SELECT o_orderpriority AS bucket, CAST(count(*) AS BIGINT) AS n_atual
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-06-17'
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(b.bucket, c.bucket) AS bucket,
        |    coalesce(n_base, 0) AS n_base, coalesce(n_atual, 0) AS n_atual
        |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
        |t AS (SELECT CAST(sum(n_base) AS BIGINT) AS nt,
        |             CAST(sum(n_atual) AS BIGINT) AS mt FROM j)
        |SELECT bucket, n_base, n_atual,
        |  CASE WHEN n_base > 0 THEN
        |    CAST(CAST(n_atual AS DECIMAL(38,0)) * nt AS DOUBLE) /
        |    CAST(CAST(n_base AS DECIMAL(38,0)) * mt AS DOUBLE) END AS razao,
        |  CASE WHEN n_base > 0 THEN
        |    (CAST(n_atual AS DOUBLE) -
        |      CAST(mt AS DOUBLE) * CAST(n_base AS DOUBLE) / CAST(nt AS DOUBLE)) *
        |    (CAST(n_atual AS DOUBLE) -
        |      CAST(mt AS DOUBLE) * CAST(n_base AS DOUBLE) / CAST(nt AS DOUBLE)) /
        |    (CAST(mt AS DOUBLE) * CAST(n_base AS DOUBLE) / CAST(nt AS DOUBLE))
        |  END AS qui2,
        |  n_base = 0 AS nova_categoria
        |FROM j, t
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays both exact lower medians and the flag chain.
    "q168_mad_outliers" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 100 = 0),
        |m1 AS (
        |  SELECT l_returnflag, v AS med FROM (
        |    SELECT l_returnflag, v,
        |      SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |    FROM (SELECT l_returnflag, l_extendedprice AS v,
        |            CAST(count(*) AS DECIMAL(38,6)) AS w
        |          FROM li GROUP BY 1, 2))
        |  WHERE cum * 2 >= tot
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) = 1),
        |dev AS (
        |  SELECT li.*, abs(l_extendedprice - med) AS desvio
        |  FROM li JOIN m1 USING (l_returnflag)),
        |m2 AS (
        |  SELECT l_returnflag, v AS mad FROM (
        |    SELECT l_returnflag, v,
        |      SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |    FROM (SELECT l_returnflag, desvio AS v,
        |            CAST(count(*) AS DECIMAL(38,6)) AS w
        |          FROM dev GROUP BY 1, 2))
        |  WHERE cum * 2 >= tot
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) = 1)
        |SELECT dev.l_orderkey, dev.l_linenumber, dev.l_returnflag,
        |  dev.l_extendedprice, dev.desvio,
        |  (mad > 0.0 AND desvio > 2.0 * mad) AS atipico
        |FROM dev JOIN m2 USING (l_returnflag)
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the week binning, the exact 1/(1<<w) weights and the
    // DECIMAL term sum.
    "q164_decayed_engagement" ->
      """WITH e AS (
        |  SELECT user_id, value,
        |    greatest(CAST(floor(date_diff('day', CAST(ts AS DATE),
        |      DATE '2024-02-01') / 7.0) AS INT), 0) AS wk
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS atividade,
        |  CAST(coalesce(sum(CASE WHEN wk > 18 THEN 0
        |    ELSE CAST(round(value * 100) AS BIGINT) *
        |      (1::BIGINT << (18 - wk)) END), 0) AS DOUBLE)
        |    / 26214400.0 AS score_decaido
        |FROM e GROUP BY user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the per-user lead, the pair counts and the single IEEE
    // division per probability.
    "q165_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type AS de,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS para
        |  FROM events),
        |cnt AS (
        |  SELECT de, para, CAST(count(*) AS BIGINT) AS transicoes
        |  FROM nxt WHERE para IS NOT NULL GROUP BY de, para),
        |tot AS (SELECT de, CAST(sum(transicoes) AS BIGINT) AS t
        |        FROM cnt GROUP BY de)
        |SELECT cnt.de, para, transicoes,
        |  CAST(transicoes AS DOUBLE) / CAST(t AS DOUBLE) AS probabilidade
        |FROM cnt JOIN tot ON cnt.de = tot.de
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the one-pass DECIMAL statistics and both transforms.
    "q166_feature_scaling" ->
      """WITH st AS (
        |  SELECT
        |    CAST(count(l_quantity) AS DOUBLE) AS nq,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,6)) *
        |      CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qq,
        |    CAST(min(l_quantity) AS DOUBLE) AS loq,
        |    CAST(max(l_quantity) AS DOUBLE) AS hiq,
        |    CAST(count(l_extendedprice) AS DOUBLE) AS ne,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS se,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)) *
        |      CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS qe,
        |    CAST(min(l_extendedprice) AS DOUBLE) AS loe,
        |    CAST(max(l_extendedprice) AS DOUBLE) AS hie
        |  FROM lineitem),
        |m AS (
        |  SELECT sq / nq AS muq, sqrt(greatest(qq / nq - (sq/nq)*(sq/nq), 0.0)) AS sdq,
        |    loq, hiq,
        |    se / ne AS mue, sqrt(greatest(qe / ne - (se/ne)*(se/ne), 0.0)) AS sde,
        |    loe, hie
        |  FROM st)
        |SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  CASE WHEN sdq > 0.0 THEN (l_quantity - muq) / sdq END AS l_quantity_z,
        |  CASE WHEN hiq > loq THEN (l_quantity - loq) / (hiq - loq) END
        |    AS l_quantity_mm,
        |  CASE WHEN sde > 0.0 THEN (l_extendedprice - mue) / sde END
        |    AS l_extendedprice_z,
        |  CASE WHEN hie > loe THEN (l_extendedprice - loe) / (hie - loe) END
        |    AS l_extendedprice_mm
        |FROM lineitem, m
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays per-side counts, the top-5 hottest keys with the
    // (count DESC, key ASC) tie-break, and the exact product-sum join
    // cardinality.
    "q163_join_diagnostics" ->
      """WITH cl AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS chave,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |summ AS (
        |  SELECT 'linhas_esq' AS metrica, CAST(NULL AS VARCHAR) AS chave,
        |    CAST(sum(c) AS BIGINT) AS valor FROM cl
        |  UNION ALL
        |  SELECT 'chaves_esq', NULL, CAST(count(*) AS BIGINT) FROM cl
        |  UNION ALL
        |  SELECT 'linhas_dir', NULL, CAST(sum(c) AS BIGINT) FROM cl
        |  UNION ALL
        |  SELECT 'chaves_dir', NULL, CAST(count(*) AS BIGINT) FROM cl
        |  UNION ALL
        |  SELECT 'linhas_juncao', NULL,
        |    CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS BIGINT) FROM cl),
        |hot AS (
        |  SELECT chave, c FROM cl ORDER BY c DESC, chave LIMIT 5)
        |SELECT metrica, chave, valor FROM summ
        |UNION ALL
        |SELECT 'quente_esq', chave, c FROM hot
        |UNION ALL
        |SELECT 'quente_dir', chave, c FROM hot
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the value-collapse, the DECIMAL cumulative, the 2·cum >=
    // tot test and both aggregates.
    "q162_weighted_median" ->
      """WITH bv AS (
        |  SELECT l_returnflag, l_extendedprice AS v,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(38,6)))
        |      AS DECIMAL(38,6)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, v, w,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM bv)
        |SELECT l_returnflag, min(v) AS mediana_ponderada,
        |  CAST(CAST(min(tot) AS BIGINT) AS DOUBLE) AS peso_total
        |FROM c WHERE cum * 2 >= tot GROUP BY 1
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the lookback interval join and picks first/last touch by
    // the same (ts, id, type) ordering (window form — the engine's
    // struct-min/max is the sort-free equivalent).
    "q159_attribution" ->
      """WITH conv AS (
        |  SELECT event_id AS conversao_id, user_id, ts AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id AS tuid, ts AS tts, event_id AS tid,
        |    event_type AS ttype
        |  FROM events WHERE event_type IN ('view', 'click')),
        |pairs AS (
        |  SELECT c.conversao_id, c.user_id, t.tts, t.tid, t.ttype
        |  FROM conv c LEFT JOIN touch t
        |    ON c.user_id = t.tuid AND t.tts < c.cts
        |    AND t.tts >= c.cts - INTERVAL 2 DAY),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY conversao_id
        |      ORDER BY tts ASC, tid ASC) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY conversao_id
        |      ORDER BY tts DESC, tid DESC) AS rl
        |  FROM pairs)
        |SELECT conversao_id, user_id,
        |  CAST(count(tid) AS BIGINT) AS n_toques,
        |  max(CASE WHEN rf = 1 THEN tid END) AS primeiro_id,
        |  max(CASE WHEN rf = 1 THEN ttype END) AS primeiro_tipo,
        |  max(CASE WHEN rl = 1 THEN tid END) AS ultimo_id,
        |  max(CASE WHEN rl = 1 THEN ttype END) AS ultimo_tipo
        |FROM rk GROUP BY conversao_id, user_id
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the (user, day) dedup, the 7-window fan-out and both
    // distinct counts.
    "q160_active_users" ->
      """WITH ed AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |daily AS (
        |  SELECT d AS dia, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS ativos_dia
        |  FROM ed GROUP BY 1),
        |win AS (
        |  SELECT g.dia, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS ativos_janela
        |  FROM ed, LATERAL unnest(generate_series(d, d + 6,
        |    INTERVAL 1 DAY)) g(dia)
        |  GROUP BY 1)
        |SELECT daily.dia, ativos_dia, ativos_janela
        |FROM daily JOIN win ON daily.dia = win.dia
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays the synthetic two-version history, DuckDB's native ASOF
    // LEFT JOIN on valid_from, and the expiry null-out for gap keys.
    "q158_scd2_lookup" ->
      """WITH v1 AS (
        |  SELECT c_custkey, 'OLD:' || c_mktsegment AS segmento,
        |    TIMESTAMP '1992-01-01' AS valid_from,
        |    TIMESTAMP '1995-06-17' AS valid_to
        |  FROM customer),
        |v2 AS (
        |  SELECT c_custkey, c_mktsegment AS segmento,
        |    TIMESTAMP '1995-06-17' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer WHERE c_custkey % 10 <> 0),
        |hist AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
        |f AS (SELECT o_orderkey, o_custkey AS c_custkey, o_orderdate
        |      FROM orders)
        |SELECT f.o_orderkey, f.c_custkey, f.o_orderdate,
        |  CASE WHEN h.valid_to IS NOT NULL AND f.o_orderdate >= h.valid_to
        |       THEN NULL ELSE h.segmento END AS dim_segmento
        |FROM f ASOF LEFT JOIN hist h
        |  ON f.c_custkey = h.c_custkey AND f.o_orderdate >= h.valid_from
        |ORDER BY ALL NULLS FIRST""".stripMargin,

    // Replays both snapshot derivations, the two EXCEPT ALL reductions
    // and the churn-volume classification join.
    "q157_cdc_extract" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |oldt AS (SELECT * FROM base WHERE o_orderkey % 10 <> 0),
        |newt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 <> 0),
        |rem AS (
        |  SELECT o_orderkey, 1 AS was FROM
        |    (SELECT * FROM oldt EXCEPT ALL SELECT * FROM newt)),
        |add_ AS (
        |  SELECT *, 1 AS isnew FROM
        |    (SELECT * FROM newt EXCEPT ALL SELECT * FROM oldt))
        |SELECT coalesce(rem.o_orderkey, add_.o_orderkey) AS o_orderkey,
        |  CASE WHEN rem.was IS NULL THEN 'I'
        |       WHEN add_.isnew IS NULL THEN 'D'
        |       ELSE 'U' END AS op,
        |  add_.o_custkey, add_.o_orderstatus, add_.o_totalprice
        |FROM rem FULL OUTER JOIN add_ ON rem.o_orderkey = add_.o_orderkey
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  ) ++ oracleSqlRest

  /** MMR unrolled: q29's brute-force CTEs produce the candidate pool,
    * then one (max-sim, argmax) CTE pair per greedy round — same IEEE op
    * order as the engine (0.7·rel − (1.0 − 0.7)·ms).
    */
  private def mmrOracle(k: Int): String = {
    val pairCos =
      """CAST(list_aggregate(list_transform(list_zip(ec.embedding, es.embedding),
        |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
        |      'sum') AS DOUBLE) / (nc.nrm * ns.nrm)""".stripMargin
    val base = """WITH n AS (
      |  SELECT vec_id,
      |    sqrt(CAST(list_aggregate(list_transform(embedding,
      |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,18))),
      |      'sum') AS DOUBLE)) AS nrm
      |  FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
      |    CAST(list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
      |      z -> CAST(CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE) AS DECIMAL(38,18))),
      |      'sum') AS DOUBLE) AS dot
      |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8) q
      |  CROSS JOIN embeddings c),
      |cand AS (
      |  SELECT query_id, corpus_id, cosine AS rel FROM (
      |    SELECT query_id, corpus_id, p.dot / (nq.nrm * nc.nrm) AS cosine,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY p.dot / (nq.nrm * nc.nrm) DESC, corpus_id ASC) AS r
      |    FROM p JOIN n nq ON p.query_id = nq.vec_id
      |           JOIN n nc ON p.corpus_id = nc.vec_id)
      |  WHERE r <= 20),
      |su1 AS (
      |  SELECT query_id, corpus_id, 1 AS ordem FROM (
      |    SELECT query_id, corpus_id,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY rel DESC, corpus_id ASC) AS r
      |    FROM cand) WHERE r = 1)""".stripMargin
    val rounds = (2 to k).map { t =>
      s""",
         |ms$t AS (
         |  SELECT c.query_id, c.corpus_id, c.rel,
         |    max($pairCos) AS ms
         |  FROM cand c
         |  JOIN su${t - 1} s ON c.query_id = s.query_id
         |  JOIN embeddings ec ON c.corpus_id = ec.vec_id
         |  JOIN embeddings es ON s.corpus_id = es.vec_id
         |  JOIN n nc ON c.corpus_id = nc.vec_id
         |  JOIN n ns ON s.corpus_id = ns.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM su${t - 1} x
         |    WHERE x.query_id = c.query_id AND x.corpus_id = c.corpus_id)
         |  GROUP BY c.query_id, c.corpus_id, c.rel),
         |su$t AS (
         |  SELECT * FROM su${t - 1}
         |  UNION ALL
         |  SELECT query_id, corpus_id, $t FROM (
         |    SELECT query_id, corpus_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY (0.7 * rel - (1.0 - 0.7) * ms) DESC,
         |                 corpus_id ASC) AS r
         |    FROM ms$t) WHERE r = 1)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |SELECT query_id, corpus_id, CAST(ordem AS INT) AS ordem
         |FROM su$k ORDER BY ALL NULLS FIRST""".stripMargin
  }

  /** PageRank unrolled: iteration k = a dangling scalar, a per-dest
    * DECIMAL contribution sum, the damped update — same IEEE op order as
    * the engine expression.
    */
  /** One doubled-rank Pearson replay per pair, UNION ALL'd — mirrors
    * `Stats.spearmanCorr` token for token at the IEEE edge.
    */
  private def spearmanOracle(pairs: Seq[(String, String)]): String = {
    val blocks = pairs.map { case (xc, yc) =>
      s"""SELECT * FROM (
         |WITH b AS (SELECT CAST($xc AS DOUBLE) AS x, CAST($yc AS DOUBLE)
         |    AS y FROM lineitem
         |  WHERE $xc IS NOT NULL AND $yc IS NOT NULL),
         |cx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt FROM b
         |  GROUP BY 1),
         |rx AS (SELECT v, 2 * COALESCE(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS r2 FROM cx),
         |cy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt FROM b
         |  GROUP BY 1),
         |ry AS (SELECT v, 2 * COALESCE(sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    + cnt + 1 AS r2 FROM cy),
         |j AS (SELECT CAST(rx.r2 AS HUGEINT) AS rxv,
         |    CAST(ry.r2 AS HUGEINT) AS ryv
         |  FROM b JOIN rx ON b.x = rx.v JOIN ry ON b.y = ry.v),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(rxv) AS sx,
         |    sum(ryv) AS sy, sum(rxv * rxv) AS sxx, sum(ryv * ryv) AS syy,
         |    sum(rxv * ryv) AS sxy FROM j)
         |SELECT '$xc' AS coluna_x, '$yc' AS coluna_y, n,
         |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
         |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |  END AS rho
         |FROM st)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY ALL NULLS FIRST")
  }

  private def pageRankOracle(iters: Int): String =
    pageRankSqlBody(
      """e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT -l_suppkey AS src, l_partkey AS dst FROM lineitem
        |    UNION ALL
        |    SELECT l_partkey, 1000000000 + o_custkey
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey))""".stripMargin,
      iters) +
      s"""
         |SELECT n AS vertice, r AS rank FROM r$iters
         |ORDER BY ALL NULLS FIRST""".stripMargin

  /** The damped-iteration replay shared by every PageRank-family
    * oracle: caller supplies the CTE chain whose LAST member is
    * `e(src, dst)`, gets back `WITH <e>, ..., r<iters>` ready for a
    * final SELECT over `r<iters>(n, outd, r)`.
    */
  private def pageRankSqlBody(edgesCte: String, iters: Int): String = {
    val base = "WITH " + edgesCte + """,
      |v AS (SELECT DISTINCT n FROM
      |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)),
      |deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS outd
      |        FROM e GROUP BY src),
      |base AS (
      |  SELECT v.n, coalesce(deg.outd, 0) AS outd
      |  FROM v LEFT JOIN deg USING (n)),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM base),
      |r0 AS (SELECT n, outd, 1.0 / n_nodes AS r FROM base, nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s""",
         |d$k AS (
         |  SELECT coalesce(CAST(sum(CAST(r AS DECIMAL(38,18)))
         |    AS DECIMAL(38,18)), CAST(0 AS DECIMAL(38,18))) AS dang
         |  FROM r${k - 1} WHERE outd = 0),
         |c$k AS (
         |  SELECT e.dst AS n,
         |    CAST(sum(CAST(p.r / CAST(p.outd AS DOUBLE) AS DECIMAL(38,18)))
         |      AS DECIMAL(38,18)) AS cin
         |  FROM r${k - 1} p JOIN e ON p.n = e.src
         |  WHERE p.outd > 0 GROUP BY e.dst),
         |r$k AS (
         |  SELECT base.n, base.outd,
         |    ((1.0 - 0.85) / n_nodes) + 0.85 *
         |      (CAST(coalesce(cin, CAST(0 AS DECIMAL(38,18))) AS DOUBLE) +
         |       CAST(dang AS DOUBLE) / n_nodes) AS r
         |  FROM base LEFT JOIN c$k USING (n), d$k, nn)""".stripMargin
    }.mkString
    base + rounds
  }

  // q99's BM25 replay, shared with q136 (the persisted postings
  // index scores bit-identically to tokenizing from scratch)
  private lazy val bm25Sql: String =
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(dl) AS HUGEINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8)),
        |cand AS (
        |  SELECT q.query_id, q.term, p.doc_id, p.tf, d.dl
        |  FROM q JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |dfreq AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand GROUP BY term),
        |scored AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand JOIN dfreq USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM scored
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin

  // q169's two-pass PRF replay: q99's scoring CTEs, the feedback-term
  // mining (top-3 by summed tf, term-ASC ties), the distinct term-union
  // expansion, and the second scoring pass
  private lazy val prfSql: String =
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |         FROM tok GROUP BY term, doc_id),
        |stats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(dl) AS HUGEINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        |  FROM dl),
        |q AS (
        |  SELECT doc_id AS query_id,
        |    unnest(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS term
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 8)),
        |cand1 AS (
        |  SELECT q.query_id, q.term, p.doc_id, p.tf, d.dl
        |  FROM q JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |df1 AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand1 GROUP BY term),
        |sc1 AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand1 JOIN df1 USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id),
        |r1 AS (
        |  SELECT query_id, doc_id FROM (
        |    SELECT query_id, doc_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS r
        |    FROM sc1) WHERE r <= 5),
        |fb AS (
        |  SELECT query_id, term, CAST(sum(tf) AS BIGINT) AS w
        |  FROM r1 JOIN post USING (doc_id) GROUP BY 1, 2),
        |ft AS (
        |  SELECT query_id, term FROM (
        |    SELECT query_id, term,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY w DESC, term) AS r
        |    FROM fb) WHERE r <= 3),
        |q2 AS (
        |  SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, term FROM q
        |    UNION ALL SELECT query_id, term FROM ft)),
        |cand2 AS (
        |  SELECT q2.query_id, q2.term, p.doc_id, p.tf, d.dl
        |  FROM q2 JOIN post p USING (term) JOIN dl d USING (doc_id)),
        |df2 AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM cand2 GROUP BY term),
        |sc2 AS (
        |  SELECT query_id, doc_id,
        |    CAST(CAST(sum(CAST(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
        |       (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |         (CAST(tf AS DOUBLE) +
        |          1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl)))
        |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS score
        |  FROM cand2 JOIN df2 USING (term), stats
        |  WHERE CAST(df AS DOUBLE) <= 1.0 * CAST(n_docs AS DOUBLE)
        |  GROUP BY query_id, doc_id)
        |SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |                          ORDER BY score DESC, doc_id) AS INT) AS posicao
        |FROM sc2
        |QUALIFY posicao <= 5
        |ORDER BY ALL NULLS FIRST""".stripMargin

  private def calibrationOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s""",
         |s AS (
         |  SELECT doc_id, CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS m
         |  FROM fc LEFT JOIN w$epochs USING (bucket) GROUP BY doc_id),
         |lbl AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
         |  FROM documents),
         |sm AS (
         |  SELECT lbl.doc_id, CAST(coalesce(s.m, 0) AS BIGINT) AS m, y
         |  FROM lbl LEFT JOIN s USING (doc_id))
         |SELECT
         |  CAST(CASE WHEN m > 0 THEN 1 WHEN m < 0 THEN -1 ELSE 0 END AS INT)
         |    AS sinal,
         |  CAST(CASE WHEN m = 0 THEN 0
         |            ELSE length(CAST(abs(m) AS VARCHAR)) END AS INT) AS ordem,
         |  CAST(CASE WHEN m = 0 THEN 0
         |            ELSE CAST(substring(CAST(abs(m) AS VARCHAR), 1, 1) AS INT)
         |       END AS INT) AS primeiro_digito,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS taxa_pos,
         |  CAST(CAST(sum(CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |    AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE)
         |    AS margem_media
         |FROM sm GROUP BY sinal, ordem, primeiro_digito
         |ORDER BY ALL NULLS FIRST""".stripMargin

  private lazy val minhashEstimateSql: String = {
      val mins = (0 until 20).map(s =>
        s"min((h1 + $s*h2) % 4294967291) AS s$s").mkString(",\n|    ")
      val bands = (0 until 5).map { b =>
        val cols = (0 until 4).map(r => s"s${b * 4 + r}").mkString(", ")
        if (b == 0) s"SELECT id, 0 AS band, concat_ws(',', $cols) AS bhash FROM sigs"
        else s"UNION ALL SELECT id, $b, concat_ws(',', $cols) FROM sigs"
      }.mkString("\n|  ")
      val matches = (0 until 20)
        .map(s => s"(CASE WHEN a.s$s = b.s$s THEN 1 ELSE 0 END)")
        .mkString(" +\n|      ")
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    array_to_string((string_split_regex(trim(lower(text)), '\\s+'))[2:], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |t AS (
        |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS tk
        |  FROM all_docs),
        |k AS (
        |  SELECT id,
        |    list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]) AS sh
        |  FROM t WHERE len(tk) >= 3),
        |shrows AS (
        |  SELECT id, CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS h1,
        |             CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h2
        |  FROM (SELECT id, md5(unnest(sh)) AS m FROM k)),
        |sigs AS (
        |  SELECT id,
        |    $mins
        |  FROM shrows GROUP BY id),
        |buckets AS (
        |  $bands),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id)
        |SELECT id_a, id_b, jaccard_est FROM (
        |  SELECT p.id_a, p.id_b,
        |    CAST($matches AS DOUBLE) / 20.0 AS jaccard_est
        |  FROM pairs p JOIN sigs a ON p.id_a = a.id JOIN sigs b ON p.id_b = b.id)
        |WHERE jaccard_est >= 0.5
        |ORDER BY ALL NULLS FIRST""".stripMargin
  }

  private lazy val oracleSqlRest: Map[String, String] = Map(

    "q126_vocab_coverage" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents),
        |vocab AS (
        |  SELECT DISTINCT unnest(tk) AS w FROM t WHERE lang = 'en'),
        |words AS (
        |  SELECT doc_id, unnest(tk) AS w FROM t WHERE lang <> 'en'),
        |m AS (
        |  SELECT f.doc_id, f.w, (v.w IS NOT NULL) AS dentro
        |  FROM (SELECT doc_id, w FROM words WHERE w <> '') f
        |  LEFT JOIN (SELECT w FROM vocab WHERE w <> '') v USING (w)),
        |s AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (NOT dentro) AS BIGINT) AS n_oov,
        |    CAST(count(DISTINCT w) AS BIGINT) AS n_tipos,
        |    CAST(count(DISTINCT w) FILTER (NOT dentro) AS BIGINT)
        |      AS n_tipos_oov
        |  FROM m GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(s.n_tokens, 0) AS n_tokens,
        |  COALESCE(s.n_oov, 0) AS n_oov,
        |  COALESCE(s.n_tipos, 0) AS n_tipos,
        |  COALESCE(s.n_tipos_oov, 0) AS n_tipos_oov,
        |  CASE WHEN COALESCE(s.n_tokens, 0) > 0 THEN
        |    CAST(s.n_oov AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
        |  END AS taxa_oov
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE lang <> 'en') d
        |LEFT JOIN s USING (doc_id)
        |ORDER BY ALL NULLS FIRST""".stripMargin,
  )

  /** q123's oracle, generated: each perceptron epoch unrolled as one CTE
    * block — margins from the previous weight table, gradient over the
    * misclassified docs, full-join accumulate. All-BIGINT algebra, so
    * the chain replays the Spark training loop bit-for-bit.
    */
  private def perceptronOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s"\nSELECT bucket, w FROM w$epochs ORDER BY ALL NULLS FIRST"

  /** q125's oracle: the q123 training chain, then the trained weight
    * table applied back over the SAME feature counts — n_feats counts
    * feature INSTANCES (Σc, matching linearTextScore's per-gram count),
    * the margin is Σ c·w, approval is its sign.
    */
  private def selfTrainOracle(buckets: Int, epochs: Int): String =
    perceptronCtes(buckets, epochs) +
      s""",
         |s AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
         |    CAST(sum(c * coalesce(w, 0)) AS BIGINT) AS margem_milli
         |  FROM fc LEFT JOIN w$epochs USING (bucket) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(s.margem_milli, 0) AS BIGINT) AS margem_milli,
         |  coalesce(s.margem_milli, 0) > 0 AS aprovado
         |FROM documents d LEFT JOIN s USING (doc_id)
         |ORDER BY ALL NULLS FIRST""".stripMargin

  private def perceptronCtes(buckets: Int, epochs: Int): String = {
    val base = """WITH t AS (
      |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
      |    string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, y, unnest(tk) AS g FROM t
      |  UNION ALL
      |  SELECT doc_id, y, unnest([array_to_string(tk[i:i+1], ' ')
      |                            for i in range(1, len(tk))]) AS g
      |  FROM t WHERE len(tk) >= 2),
      |fc AS (
      |  SELECT doc_id, y,
      |    CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % {B} AS bucket,
      |    count(*) AS c
      |  FROM feats WHERE g <> '' GROUP BY ALL),
      |w1 AS (SELECT bucket, CAST(sum(y * c) AS BIGINT) AS w
      |       FROM fc GROUP BY bucket)""".stripMargin
      .replace("{B}", buckets.toString)
    val chain = (2 to epochs).map { e =>
      s""",
         |m$e AS (
         |  SELECT doc_id, y, sum(c * coalesce(w, 0)) AS margin
         |  FROM fc LEFT JOIN w${e - 1} USING (bucket) GROUP BY doc_id, y),
         |g$e AS (
         |  SELECT bucket, CAST(sum(y * c) AS BIGINT) AS g FROM fc
         |  JOIN (SELECT doc_id FROM m$e WHERE y * margin <= 0) mm
         |    USING (doc_id)
         |  GROUP BY bucket),
         |w$e AS (
         |  SELECT coalesce(pw.bucket, pg.bucket) AS bucket,
         |    CAST(coalesce(pw.w, 0) + coalesce(pg.g, 0) AS BIGINT) AS w
         |  FROM w${e - 1} pw FULL JOIN g$e pg ON pw.bucket = pg.bucket)"""
        .stripMargin
    }.mkString
    base + chain
  }

  /** q95's oracle, generated: the same 16-bit min-max scale (exact
    * wide-integer product and integral floor division — HUGEINT here,
    * DECIMAL(38,0) on the Spark side, identical for any BIGINT domain)
    * and the same 32 interleave terms the Spark expression builds —
    * column j's bit i lands at position i*2+j.
    */
  private def zorderOracle: String = {
    def scaleSql(c: String, j: Int) =
      s"""CASE WHEN mx$j - mn$j <= 0 THEN 0
         |      ELSE COALESCE(CAST((CAST($c AS HUGEINT) - mn$j) * 65535
         |                    // (CAST(mx$j AS HUGEINT) - mn$j)
         |                    AS BIGINT), 0) END AS s$j""".stripMargin
    val terms = (for { i <- 0 until 16; j <- 0 until 2 }
      yield s"(((s$j >> $i) & 1) << ${i * 2 + j})").mkString(" + ")
    s"""WITH stats AS (
       |  SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
       |         min(o_orderkey) AS mn1, max(o_orderkey) AS mx1
       |  FROM orders),
       |s AS (
       |  SELECT o_orderkey, o_custkey,
       |    ${scaleSql("o_custkey", 0)},
       |    ${scaleSql("o_orderkey", 1)}
       |  FROM orders, stats)
       |SELECT o_orderkey, o_custkey, $terms AS zorder FROM s
       |ORDER BY ALL NULLS FIRST""".stripMargin
  }
}
