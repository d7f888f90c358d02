package graft.ops

import graft.{Decl, Pack, Tables}
import graft.Dsl.d4
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.2 "Scalar functions") — one
  * declared query per family, each exercising several functions.
  *
  * Cross-engine alignment notes (verified against DuckDB 1.0):
  *  - regexp_replace: Spark replaces all matches, DuckDB needs 'g'
  *  - date_trunc returns timestamp in Spark, DATE in DuckDB → cast
  *  - ceil/floor return BIGINT in Spark, DOUBLE in DuckDB → cast
  *  - double→int casts: Spark truncates, DuckDB rounds → use floor/trunc
  *  - transcendentals (exp/ln/pow/sqrt) can differ in the last ulp
  *    between libm implementations → ROUND(…, 6) on both sides
  */
object ScalarFns extends Pack {

  def decls: Seq[Decl] = Seq(

    Decl("q_fn_string", (spark, dir) =>
      Tables(spark, dir, "part")
        .select(
          col("p_partkey"),
          concat(col("p_name"), lit("_"), col("p_brand")).as("cat"),
          upper(col("p_name")).as("up"),
          lower(col("p_type")).as("lo"),
          substring(col("p_name"), 1, 4).as("sub4"),
          length(col("p_name")).as("len"),
          element_at(split(col("p_name"), " "), 1).as("word1"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"),
          expr("replace(p_name, ' ', '-')").as("dashed"),
          instr(col("p_name"), "wid").as("pos_wid"),
          lpad(col("p_brand"), 10, "*").as("padded"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("p_partkey").asc_nulls_first, col("cat").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  p_name || '_' || p_brand AS cat,
          |  upper(p_name) AS up,
          |  lower(p_type) AS lo,
          |  substring(p_name, 1, 4) AS sub4,
          |  length(p_name) AS len,
          |  string_split(p_name, ' ')[1] AS word1,
          |  regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
          |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel,
          |  replace(p_name, ' ', '-') AS dashed,
          |  strpos(p_name, 'wid') AS pos_wid,
          |  lpad(p_brand, 10, '*') AS padded,
          |  trim('  x  ') AS trimmed
          |FROM part
          |ORDER BY p_partkey ASC NULLS FIRST, cat ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_date", (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("MONTH", col("o_orderdate")).cast("date").as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
          last_day(col("o_orderdate").cast("date")).as("eom"),
          expr("extract(QUARTER FROM o_orderdate)").cast("int").as("qtr"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("made"),
          col("o_orderdate").cast("date").as("as_date"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("yr").asc_nulls_first),
      Some(
        """SELECT o_orderkey,
          |  CAST(year(o_orderdate) AS INT) AS yr,
          |  CAST(month(o_orderdate) AS INT) AS mo,
          |  CAST(day(o_orderdate) AS INT) AS dom,
          |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          |  CAST(o_orderdate AS DATE) + 30 AS plus30,
          |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
          |  last_day(CAST(o_orderdate AS DATE)) AS eom,
          |  CAST(extract(QUARTER FROM o_orderdate) AS INT) AS qtr,
          |  make_date(CAST(year(o_orderdate) AS BIGINT), CAST(month(o_orderdate) AS BIGINT), 1) AS made,
          |  CAST(o_orderdate AS DATE) AS as_date
          |FROM orders
          |ORDER BY o_orderkey ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_math", (spark, dir) =>
      Tables(spark, dir, "part")
        .select(
          col("p_partkey"),
          d4(abs(col("p_retailprice") - 1000)).as("abs_diff"),
          ceil(col("p_retailprice")).as("ceiled"),
          floor(col("p_retailprice")).as("floored"),
          pow(col("p_size"), 2).cast("long").as("size_sq"),
          round(sqrt(col("p_size")), 6).cast("decimal(18,6)").cast("double").as("size_sqrt"),
          round(exp(col("p_size") / 100.0), 6).cast("decimal(18,6)").cast("double").as("e_small"),
          round(log(col("p_retailprice")), 6).cast("decimal(18,6)").cast("double").as("ln_price"),
          round(log10(col("p_retailprice")), 6).cast("decimal(18,6)").cast("double").as("log10_price"),
          pmod(col("p_partkey"), lit(7)).as("key_mod"),
          signum(col("p_retailprice") - 1000).cast("int").as("sgn"),
          greatest(col("p_size"), lit(10)).as("gr"),
          least(col("p_size"), lit(10)).as("ls"))
        .orderBy(col("p_partkey").asc_nulls_first, col("abs_diff").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  D4(abs(p_retailprice - 1000)) AS abs_diff,
          |  CAST(ceil(p_retailprice) AS BIGINT) AS ceiled,
          |  CAST(floor(p_retailprice) AS BIGINT) AS floored,
          |  CAST(pow(p_size, 2) AS BIGINT) AS size_sq,
          |  D6(sqrt(p_size)) AS size_sqrt,
          |  D6(exp(p_size / 100.0)) AS e_small,
          |  D6(ln(p_retailprice)) AS ln_price,
          |  D6(log10(p_retailprice)) AS log10_price,
          |  ((p_partkey % 7) + 7) % 7 AS key_mod,
          |  CAST(sign(p_retailprice - 1000) AS INT) AS sgn,
          |  greatest(p_size, 10) AS gr,
          |  least(p_size, 10) AS ls
          |FROM part
          |ORDER BY p_partkey ASC NULLS FIRST, abs_diff ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_cond", (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 250000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          when(col("o_orderpriority") === "1-URGENT", lit(1)).otherwise(lit(0)).as("is_urgent"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("band").asc_nulls_first),
      Some(
        """SELECT o_orderkey,
          |  CASE WHEN o_totalprice > 250000 THEN 'big'
          |       WHEN o_totalprice > 100000 THEN 'mid'
          |       ELSE 'small' END AS band,
          |  coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
          |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
          |FROM orders
          |ORDER BY o_orderkey ASC NULLS FIRST, band ASC NULLS FIRST""".stripMargin)),

    // Casts that behave identically in both engines (double→int would
    // not: Spark truncates, DuckDB rounds — use floor explicitly).
    Decl("q_fn_cast", (spark, dir) =>
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          col("o_orderkey").cast("double").as("key_dbl"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_dec_str"),
          col("o_orderdate").cast("date").as("od"),
          col("o_orderdate").cast("date").cast("string").as("od_str"),
          lit("12345").cast("long").as("parsed_int"),
          lit("1.5").cast("double").as("parsed_dbl"))
        .orderBy(col("o_orderkey").asc_nulls_first, col("key_str").asc_nulls_first),
      Some(
        """SELECT o_orderkey,
          |  CAST(o_orderkey AS VARCHAR) AS key_str,
          |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
          |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
          |  CAST(o_orderdate AS DATE) AS od,
          |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_str,
          |  CAST('12345' AS BIGINT) AS parsed_int,
          |  CAST('1.5' AS DOUBLE) AS parsed_dbl
          |FROM orders
          |ORDER BY o_orderkey ASC NULLS FIRST, key_str ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_array", (spark, dir) =>
      Tables(spark, dir, "part")
        .withColumn("arr", sequence(lit(1L), (pmod(col("p_size"), lit(10)) + 3).cast("long")))
        .select(
          col("p_partkey"),
          to_json(col("arr")).as("arr"),
          size(col("arr")).as("n"),
          array_contains(col("arr"), 5).as("has5"),
          to_json(sort_array(array_distinct(concat(col("arr"), col("arr"))))).as("dedup"),
          to_json(slice(col("arr"), 2, 3)).as("sl"),
          to_json(flatten(array(col("arr"), array(lit(99L))))).as("flat"),
          to_json(transform(col("arr"), x => x * 2)).as("doubled"),
          to_json(filter(col("arr"), x => x > 4)).as("big"),
          aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("total"))
        .orderBy(col("p_partkey").asc_nulls_first, col("n").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  CAST(to_json(arr) AS VARCHAR) AS arr, len(arr) AS n,
          |  list_contains(arr, 5) AS has5,
          |  CAST(to_json(list_sort(list_distinct(arr || arr))) AS VARCHAR) AS dedup,
          |  CAST(to_json(arr[2:4]) AS VARCHAR) AS sl,
          |  CAST(to_json(flatten([arr, [99]])) AS VARCHAR) AS flat,
          |  CAST(to_json(list_transform(arr, x -> x * 2)) AS VARCHAR) AS doubled,
          |  CAST(to_json(list_filter(arr, x -> x > 4)) AS VARCHAR) AS big,
          |  CAST(list_sum(arr) AS BIGINT) AS total
          |FROM (SELECT p_partkey, generate_series(1, ((p_size % 10) + 10) % 10 + 3) AS arr FROM part)
          |ORDER BY p_partkey ASC NULLS FIRST, n ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_map", (spark, dir) =>
      Tables(spark, dir, "part")
        .withColumn("m", map(lit("size"), col("p_size"), lit("twice"), col("p_size") * 2))
        .select(
          col("p_partkey"),
          to_json(map_keys(col("m"))).as("ks"),
          to_json(map_values(col("m"))).as("vs"),
          element_at(col("m"), "size").as("v_size"),
          element_at(col("m"), "twice").as("v_twice"),
          size(col("m")).as("card"))
        .orderBy(col("p_partkey").asc_nulls_first, col("v_size").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  CAST(to_json(map_keys(m)) AS VARCHAR) AS ks,
          |  CAST(to_json(map_values(m)) AS VARCHAR) AS vs,
          |  m['size'][1] AS v_size,
          |  m['twice'][1] AS v_twice,
          |  CAST(cardinality(m) AS INT) AS card
          |FROM (SELECT p_partkey,
          |        map_from_entries([('size', p_size), ('twice', p_size * 2)]) AS m
          |      FROM part)
          |ORDER BY p_partkey ASC NULLS FIRST, v_size ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_json", (spark, dir) =>
      Tables(spark, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_int"))
        .orderBy(col("event_id").asc_nulls_first, col("k_str").asc_nulls_first),
      Some(
        """SELECT event_id,
          |  json_extract_string(props, '$.k') AS k_str,
          |  CAST(json_extract(props, '$.k') AS INT) AS k_int
          |FROM events
          |ORDER BY event_id ASC NULLS FIRST, k_str ASC NULLS FIRST""".stripMargin)),

    // Regex surface: extract / replace-all / match predicate — the
    // workhorse trio of any text-cleaning pipeline. Narrow codegen'd
    // projection; both engines use '' for a no-match extract.
    Decl("q_fn_regexp", (spark, dir) =>
      Tables(spark, dir, "documents")
        .filter(col("doc_id") < 300)
        .select(col("doc_id"),
          regexp_extract(col("text"), "[a-z]*an[a-z]*", 0).as("first_an_word"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("novowel_len"),
          col("text").rlike("scan .*join").as("has_scan_join"))
        .orderBy(col("doc_id").asc_nulls_first),
      Some(
        """SELECT doc_id,
          |  regexp_extract(text, '[a-z]*an[a-z]*', 0) AS first_an_word,
          |  len(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
          |  regexp_matches(text, 'scan .*join') AS has_scan_join
          |FROM documents WHERE doc_id < 300
          |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_hash", (spark, dir) =>
      Tables(spark, dir, "part")
        .select(
          col("p_partkey"),
          md5(col("p_name").cast("binary")).as("name_md5"),
          sha2(col("p_name").cast("binary"), 256).as("name_sha256"),
          length(sha2(col("p_name").cast("binary"), 512)).as("sha512_len"))
        .orderBy(col("p_partkey").asc_nulls_first, col("name_md5").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  md5(p_name) AS name_md5,
          |  sha256(p_name) AS name_sha256,
          |  128 AS sha512_len
          |FROM part
          |ORDER BY p_partkey ASC NULLS FIRST, name_md5 ASC NULLS FIRST""".stripMargin)),

    // Spark-specific hash fns (seeded xxhash64 / crc32 / Murmur3):
    // raw per-row values are engine-defined so DuckDB can't recompute
    // them — instead the oracle pins PUBLIC known-answer vectors
    // (xxHash64 seed 42, CRC-32, Murmur3 seed 42 of five fixed
    // strings: literal constants either engine can state) plus three
    // corpus relations measured in-query over `part`: xxhash64 has no
    // 64-bit collision on this fixture (distinct hashes == distinct
    // names, an exact fact of the data), crc32 stays inside its
    // unsigned-32-bit range contract, and Murmur3 collisions are rare
    // (distinct > half of names — 32-bit space vs thousands of keys).
    // `n` carries DuckDB's exact count(*) so the row isn't pure TRUEs.
    // OpsSpec additionally asserts raw-value determinism run-to-run.
    Decl("q_fn_hash_engine", (spark, dir) => {
      import spark.implicits._
      val ka = Seq(
        ("ka_empty", "", -7444071767201028348L, 0L, 142593372),
        ("ka_abc", "abc", 1423657621850124518L, 891568578L, 1322437556),
        ("ka_fox", "The quick brown fox", -3617261401988713833L, 3074782430L, 1217302703),
        ("ka_graft", "graft", -4815631219266125053L, 31255620L, -1930494102),
        ("ka_sql", "Spark SQL", -8514049625603843977L, 2521631539L, 1516360745))
        .toDF("tag", "s", "xxh_expect", "crc_expect", "mm3_expect")
        .select(col("tag"),
          (xxhash64(col("s")) === col("xxh_expect")).as("xxh_ok"),
          (crc32(col("s").cast("binary")) === col("crc_expect")).as("crc_ok"),
          (hash(col("s")) === col("mm3_expect")).as("mm3_ok"),
          lit(0L).as("n"))
      val corpus = Tables(spark, dir, "part")
        .agg(
          (countDistinct(xxhash64(col("p_name"))) === countDistinct(col("p_name")))
            .as("xxh_ok"),
          (min(crc32(col("p_name").cast("binary"))) >= 0L &&
            max(crc32(col("p_name").cast("binary"))) <= 4294967295L).as("crc_ok"),
          (countDistinct(hash(col("p_name"))) * 2 > countDistinct(col("p_name")))
            .as("mm3_ok"),
          count(lit(1)).as("n"))
        .select(lit("zz_corpus").as("tag"), col("xxh_ok"), col("crc_ok"),
          col("mm3_ok"), col("n"))
      ka.unionByName(corpus).orderBy(col("tag").asc_nulls_first)
    }, Some(
      """SELECT * FROM (
        |  SELECT 'ka_empty' AS tag, TRUE AS xxh_ok, TRUE AS crc_ok,
        |         TRUE AS mm3_ok, CAST(0 AS BIGINT) AS n
        |  UNION ALL SELECT 'ka_abc', TRUE, TRUE, TRUE, 0
        |  UNION ALL SELECT 'ka_fox', TRUE, TRUE, TRUE, 0
        |  UNION ALL SELECT 'ka_graft', TRUE, TRUE, TRUE, 0
        |  UNION ALL SELECT 'ka_sql', TRUE, TRUE, TRUE, 0
        |  UNION ALL SELECT 'zz_corpus', TRUE, TRUE, TRUE,
        |    (SELECT COUNT(*) FROM part))
        |ORDER BY tag ASC NULLS FIRST""".stripMargin)),

    Decl("q_fn_struct", (spark, dir) =>
      Tables(spark, dir, "part")
        .withColumn("s", struct(col("p_partkey").as("key"), col("p_name").as("nm"),
          struct(col("p_size").as("sz")).as("deep")))
        .select(
          col("p_partkey"),
          col("s").getField("nm").as("s_name"),
          col("s").getField("deep").getField("sz").as("s_size"),
          to_json(col("s")).as("s"))
        .orderBy(col("p_partkey").asc_nulls_first, col("s_name").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  s.nm AS s_name,
          |  s.deep.sz AS s_size,
          |  CAST(to_json(s) AS VARCHAR) AS s
          |FROM (SELECT p_partkey,
          |        struct_pack(key := p_partkey, nm := p_name,
          |          deep := struct_pack(sz := p_size)) AS s
          |      FROM part)
          |ORDER BY p_partkey ASC NULLS FIRST, s_name ASC NULLS FIRST""".stripMargin)),

    // Bitwise surface: &, |, xor, shifts, bit_count, complement — all
    // codegen'd long arithmetic, pushable projections. Operand values
    // are bounded (p_partkey small, shift distances fixed) so no
    // overflow-wrap divergence between engines.
    Decl("q_fn_bitwise", (spark, dir) =>
      Tables(spark, dir, "part")
        .select(
          col("p_partkey"),
          (col("p_partkey").cast("long") % 256L).as("b"),
          ((col("p_partkey").cast("long") % 256L)
            .bitwiseAND(lit(170L))).as("b_and"),
          ((col("p_partkey").cast("long") % 256L)
            .bitwiseOR(lit(12L))).as("b_or"),
          ((col("p_partkey").cast("long") % 256L)
            .bitwiseXOR(lit(255L))).as("b_xor"),
          shiftleft(col("p_partkey").cast("long") % 256L, 3).as("b_shl"),
          shiftright(col("p_partkey").cast("long"), 2).as("b_shr"),
          bit_count(col("p_partkey").cast("long") % 256L).cast("int").as("b_pop"))
        .orderBy(col("p_partkey").asc_nulls_first),
      Some(
        """SELECT p_partkey,
          |  CAST(p_partkey % 256 AS BIGINT) AS b,
          |  CAST((p_partkey % 256) & 170 AS BIGINT) AS b_and,
          |  CAST((p_partkey % 256) | 12 AS BIGINT) AS b_or,
          |  CAST(xor(p_partkey % 256, 255) AS BIGINT) AS b_xor,
          |  CAST((p_partkey % 256) << 3 AS BIGINT) AS b_shl,
          |  CAST(p_partkey >> 2 AS BIGINT) AS b_shr,
          |  CAST(bit_count(p_partkey % 256) AS INT) AS b_pop
          |FROM part
          |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin)),
  )
}
