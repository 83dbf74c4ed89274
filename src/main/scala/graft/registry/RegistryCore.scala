package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Dbf, HtmlForm, Listing, ParquetSink, ReportCsv, Staging, Tables}
import graft.operators._

/** Reference-ETL core: ingestion, parsing, cleaning, dim joins, the 12-stage chain.
  *
  * Registry shard of [[SparkEntry]] — entries moved verbatim; see SURVEY.md §2
  * for the operator-row mapping.
  */
private[graft] trait RegistryCore extends RegistryBase {

  protected def queriesCore: Map[String, (SparkSession, String) => DataFrame] = Map(

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
  )

  protected def oraclesCore: Map[String, String] = Map(

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

    "q46_dbf_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) AS DOC_ID, lang AS LANG,
        |  source AS SOURCE, CAST(n_chars AS VARCHAR) AS N_CHARS
        |FROM documents ORDER BY ALL NULLS FIRST""".stripMargin,

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
  )
}
